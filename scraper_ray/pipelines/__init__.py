"""Ray Data pipelines: relational ops, dedup, text analysis, ANN, media."""
