"""Structured Streaming capabilities (SURVEY.md §2.15 — additive)."""
