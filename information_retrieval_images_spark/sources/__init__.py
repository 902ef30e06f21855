"""Sources: corpus readers/generators (S1-S7 in SURVEY.md §2.1)."""
