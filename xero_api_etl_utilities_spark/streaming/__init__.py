"""Structured Streaming surface (file-drop replay, watermarked windows)."""
