"""Streaming layer: replay source + windowed KPI queries (SURVEY §2.8)."""
