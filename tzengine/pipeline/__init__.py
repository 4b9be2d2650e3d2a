"""Training-data pipeline operators over documents/embeddings/images.

Large-scale dataset-curation ops the engine provides beyond the
reference's geospatial surface: deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard, embedding near-dup), similarity search
(brute-force + IVF), text analysis (lang-id, quality, tokens,
fingerprints), and multimodal column processing.
"""
