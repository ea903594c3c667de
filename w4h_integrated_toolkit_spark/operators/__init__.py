"""Operator library — each module re-expresses a family from SURVEY §2."""
