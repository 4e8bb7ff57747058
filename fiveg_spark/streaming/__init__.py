"""Structured Streaming surface (SURVEY §2 B6, A5)."""
