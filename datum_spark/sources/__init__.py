"""Source/sink registry."""

from .registry import load_table, write_table, SUPPORTED_FORMATS

__all__ = ["load_table", "write_table", "SUPPORTED_FORMATS"]
