"""Evaluation: cosine-similarity distribution sink + PDF/CDF, LFW protocol."""

from .cosine import (  # noqa: F401
    CosineSimilaritySink,
    read_similarity_csv,
    pdf_cdf,
)
