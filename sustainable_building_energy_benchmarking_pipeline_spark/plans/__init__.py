"""End-to-end query plans and pipelines."""
