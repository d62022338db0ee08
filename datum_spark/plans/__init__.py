"""Plan inspection helpers (scale hygiene checks)."""

from .inspect import explain_str, assert_pushed_filters, scan_columns

__all__ = ["explain_str", "assert_pushed_filters", "scan_columns"]
