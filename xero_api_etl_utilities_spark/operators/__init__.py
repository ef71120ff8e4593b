"""Engine operators: reconciliation, segmentation, quality gates, dedup,
similarity, text analysis, event windows, multimodal plumbing."""
