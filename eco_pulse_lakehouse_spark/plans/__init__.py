"""End-to-end query plans (flagship pipelines)."""
