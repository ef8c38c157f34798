"""Training-data-pipeline operators: text analysis, deduplication,
similarity search, multimodal columns — the operations a 100 TB corpus
pipeline needs on top of the reference's social-graph analytics."""
