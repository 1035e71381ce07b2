"""LLM-data-pipeline extension operators (SURVEY.md §2.6).

Beyond the reference's relational surface: the operations a 100 TB
training-data pipeline needs — text analysis, content-level dedup
(exact, MinHash-LSH, SimHash), embedding similarity search, and
multimodal binary-column plumbing. All registered in the same
operator registry as the relational ops.
"""

from . import classify, dedup, multimodal, similarity, sketch, text, tokenize  # noqa: F401
