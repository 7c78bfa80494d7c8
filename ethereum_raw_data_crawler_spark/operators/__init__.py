"""Custom operators (SURVEY.md §2.3/§2.5/§2.7): priority-queue pop with
per-host politeness, scalable global sequence assignment, Bloom-filtered
seen-set, plus the training-data operators (dedup, similarity, text
analysis) over the documents/embeddings tables."""
