"""Deduplication operators for large-scale training-data pipelines.

Filled in M5: exact hash dedup, normalized-fingerprint dedup, MinHash+LSH,
SimHash, n-gram Jaccard.
"""
