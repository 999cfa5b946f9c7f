"""Structured Streaming: datom-log import, late-patch merge, windowed aggs."""
