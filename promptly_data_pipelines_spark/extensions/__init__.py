"""North-star LLM-pipeline extensions (SURVEY.md §2j): deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard), vector similarity
search, text analysis, and multimodal column plumbing — designed for
100 TB (built-ins + Arrow-batched pandas where unavoidable, never
row-at-a-time Python)."""
