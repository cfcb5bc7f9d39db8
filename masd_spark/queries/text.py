"""Text-analysis queries over the documents table. Filled in incrementally."""
