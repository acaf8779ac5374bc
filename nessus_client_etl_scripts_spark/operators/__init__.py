"""Relational and pipeline operators (SURVEY.md §2)."""
