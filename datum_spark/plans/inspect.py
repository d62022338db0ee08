"""Physical-plan inspection: the feedback loop for scale hygiene.

Used by tests to ASSERT (not eyeball) that filters reach the Parquet scan
and that scans read only the projected columns — the two properties that
decide whether a plan survives a 100× scale-up.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode)


def assert_pushed_filters(df: DataFrame, *column_names: str) -> None:
    """Assert every named column appears in the scan's PushedFilters."""
    plan = explain_str(df)
    # greedy to the last ] on the line: filters like In(c, [A,R]) nest
    # brackets inside the list
    m = re.search(r"PushedFilters: \[(.*)\]", plan)
    pushed = m.group(1) if m else ""
    missing = [c for c in column_names if c not in pushed]
    if missing:
        raise AssertionError(
            f"filters not pushed to scan for columns {missing}; "
            f"PushedFilters: [{pushed}]")


def scan_columns(df: DataFrame) -> list[str]:
    """Columns actually read by the (first) Parquet scan (ReadSchema)."""
    plan = explain_str(df)
    m = re.search(r"ReadSchema: struct<(.*?)>", plan)
    if not m:
        return []
    return [part.split(":")[0].strip() for part in m.group(1).split(",") if part]
