"""ML integration (SURVEY §2.9 M3-M6)."""
