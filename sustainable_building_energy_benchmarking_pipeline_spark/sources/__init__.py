"""Readers, writers, and synthetic data generators (SURVEY.md §2.1)."""
