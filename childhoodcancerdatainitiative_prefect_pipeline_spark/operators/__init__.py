"""Operator packs mapping SURVEY.md §2 onto Spark DataFrame transforms."""
