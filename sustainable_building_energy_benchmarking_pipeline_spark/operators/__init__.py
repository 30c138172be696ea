"""Reusable relational/time-series operators (SURVEY.md §2)."""
