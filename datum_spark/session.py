"""SparkSession factory tuned for the engine.

Single place where session-level performance policy lives, so tests, the
driver entry point and ``bench.py`` all get identical, scale-aware settings:

- AQE on (runtime re-planning, skew-join splitting, partition coalescing);
- shuffle partitions sized to the local core count rather than the 200
  default (on a real cluster this would be ~2-3× total executor cores —
  callers can override via ``spark.sql.shuffle.partitions``);
- UTC session timezone (cross-engine determinism vs. the DuckDB oracle);
- Arrow enabled for the Python boundary (pandas UDFs, createDataFrame).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet scans: keep row-group/page-level filter pushdown on (default,
    # but pinned here because the correctness of limit/filter pushdown in
    # Table.read depends on it).
    "spark.sql.parquet.filterPushdown": "true",
    # The driver-generated `events` table stores TIMESTAMP(NANOS), which
    # Spark's vectorized Parquet reader rejects outright; read nanos as
    # BIGINT and convert to microsecond timestamps JVM-side at load
    # (sources.registry.read_parquet_normalized) — keeps the scan
    # distributed instead of bouncing through a driver-side Arrow load.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # write micros (not legacy INT96) so other engines (DuckDB/pyarrow)
    # read our timestamps without surprises
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    "spark.ui.enabled": "false",
}


def default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        try:
            return max(1, int(cpus))
        except ValueError:
            pass
    return os.cpu_count() or 8


def get_session(app_name: str = "datum_spark", master: str | None = None,
                extra_conf: dict | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession."""
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    # Python workers (pandas UDF / mapInPandas) unpickle functions by module
    # reference; make the package importable in them regardless of where the
    # driver script runs from.  On a real cluster this would be --py-files.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root)
    cores = default_parallelism()
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cores}]")
    conf = dict(_DEFAULTS)
    conf.setdefault("spark.sql.shuffle.partitions", str(cores))
    conf.setdefault("spark.driver.memory",
                    os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
