"""Similarity search over embedding columns.

Filled in M5: brute-force cosine top-k, LSH-bucketed ANN.
"""
