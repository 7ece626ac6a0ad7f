"""Training-data pipeline operators: deduplication, similarity search,
text analysis, multimodal plumbing — first-class components alongside the
search engine (see repo README)."""
