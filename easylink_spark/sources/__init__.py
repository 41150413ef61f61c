"""Readers/writers + stage checkpointing (SURVEY.md §2.1)."""
