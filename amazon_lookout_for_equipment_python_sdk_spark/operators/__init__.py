"""Relational + time-series operators (SURVEY.md §2 inventory)."""
