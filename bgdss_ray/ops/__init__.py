"""Large-scale training-data operators: dedup, similarity, text analysis,
multimodal plumbing — first-class components alongside the crawl engine."""
