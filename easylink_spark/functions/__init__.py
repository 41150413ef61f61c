"""Scalar comparator functions (SURVEY.md §2.8 F6-F11)."""
