"""Structured Streaming mode (SURVEY.md §2.8)."""
