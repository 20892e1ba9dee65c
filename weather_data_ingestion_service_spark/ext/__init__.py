"""Mandated large-scale training-data-pipeline extensions
(SURVEY.md §2.J): deduplication, similarity search, text analysis,
multimodal columns.  No reference analog — these are the operators a
100 TB LLM-data pipeline needs on top of the reference's surface.
"""
