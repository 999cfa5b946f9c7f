"""Operator library: relational slice, EAV transforms, dedup, similarity."""
