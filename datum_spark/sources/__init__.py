"""Source/sink registry."""

from .registry import load_table, write_table, SUPPORTED_FORMATS
from .snapshots import ChangeFeedCursor, CommitConflict, SnapshotTable

__all__ = ["load_table", "write_table", "SUPPORTED_FORMATS",
           "SnapshotTable", "CommitConflict", "ChangeFeedCursor"]
