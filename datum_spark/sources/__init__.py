"""Source/sink registry."""

from .registry import load_table, write_table, SUPPORTED_FORMATS
from .snapshots import CommitConflict, SnapshotTable

__all__ = ["load_table", "write_table", "SUPPORTED_FORMATS",
           "SnapshotTable", "CommitConflict"]
