"""Engine operators: snippetization, dedup, similarity, text analysis."""
