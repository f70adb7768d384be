"""Structured Streaming operators: stateful sliding-window SAX."""

from .sliding import sliding_sax_stream

__all__ = ["sliding_sax_stream"]
