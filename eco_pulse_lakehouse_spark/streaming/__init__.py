"""Structured Streaming pipelines (SURVEY.md §2.9)."""
