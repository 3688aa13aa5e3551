"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.

Filled in M5.
"""
