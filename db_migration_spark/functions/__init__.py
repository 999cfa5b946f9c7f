"""Scalar expression helpers (SURVEY §2.8), text analysis, vector math."""
