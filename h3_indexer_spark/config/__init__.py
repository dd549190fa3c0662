"""Job configuration models (SURVEY.md §1)."""
