"""Core relational operator catalog (SURVEY.md §2.2-2.10). Populated incrementally."""
