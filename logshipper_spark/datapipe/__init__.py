"""Training-data pipeline operators: dedup, similarity search, text
analysis, multimodal plumbing — the operations a large-scale
training-data pipeline needs on top of the log-pipeline core."""
