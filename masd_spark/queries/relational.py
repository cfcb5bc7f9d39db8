"""Relational query coverage over the star schema (joins, sorts, set ops,
grouping sets, window functions) — absent from the reference (SURVEY.md
§2.3/2.5/2.6/2.7) but required by the harness. Filled in incrementally.
"""
