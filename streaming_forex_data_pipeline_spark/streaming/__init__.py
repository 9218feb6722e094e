"""Structured Streaming surface (SURVEY §2.12 ST-series)."""
