"""Engine operators: snippetization, dedup (exact / MinHash-LSH /
SimHash / n-gram / embedding-cosine / SemDeDup / incremental),
similarity (cosine top-k, batch k-NN, LSH ANN, IVF, PQ), k-means,
PageRank, connected components, text analysis, global ranking, packing,
as-of / range joins, skew salting, materialization control."""
