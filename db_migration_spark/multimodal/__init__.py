"""Multimodal binary-column plumbing (decode kernels stubbed)."""
