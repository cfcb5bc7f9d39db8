"""Deduplication queries over the documents table. Filled in incrementally."""
