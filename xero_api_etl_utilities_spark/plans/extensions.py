"""Extension operator catalog (SURVEY.md §2.12). Populated incrementally."""
