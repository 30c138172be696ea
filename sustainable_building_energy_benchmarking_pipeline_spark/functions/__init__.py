"""Column-expression helper functions (SURVEY.md §2.8) — all JVM-side."""
