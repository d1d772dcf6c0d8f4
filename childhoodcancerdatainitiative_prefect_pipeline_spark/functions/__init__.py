"""Scalar function packs (SURVEY.md §2.10, F1-F21)."""
