"""Large-scale training-data pipeline operators.

Beyond the reference's own surface, these are the operations a 100 TB
web-corpus training pipeline needs (driver mandate): deduplication
(exact, MinHash-LSH, SimHash, n-gram Jaccard), similarity search over
embeddings, text analysis (language-ID, quality scoring, token stats,
fingerprinting), and multimodal binary-column plumbing.
"""
