"""Operators: load/verify (reference surface) + relational breadth and
LLM-data-pipeline extensions (dedup, similarity, text, multimodal)."""
