"""Shared registry + fixture loaders for the extension-query package.

Every domain module registers its entries into ``EXTENSIONS`` through
the ``x`` decorator at import time; the package ``__init__`` imports
the modules in the historical declaration order so dict order (and
therefore driver-cap ordering semantics) is unchanged from the
single-file era.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..tierb import load
from ..util import ensure_parallelism


def load_emb(spark: SparkSession, sf: str) -> DataFrame:
    """The embeddings fixture fanned out to all cores (signature /
    block-GEMM pandas UDFs are compute-bound; no-op on multi-split
    inputs)."""
    return ensure_parallelism(load(spark, sf, "embeddings"))


def load_docs(spark: SparkSession, sf: str) -> DataFrame:
    """The documents fixture, fanned out to all cores: its text-heavy
    consumers (shingling, n-grams, quality UDFs) are compute-bound, and the
    small fixture file arrives as a single split (util.ensure_parallelism
    is a no-op on real multi-split inputs)."""
    return ensure_parallelism(load(spark, sf, "documents"))


def load_par(spark: SparkSession, sf: str, name: str) -> DataFrame:
    """``load`` + fan-out for entries whose per-row work dominates the
    scan (md5 coins, edit distance, percentile buffers): the fixture
    tables are single-row-group parquet files, so the scan — and every
    map-side expression and partial aggregate fused into it — would
    otherwise run as ONE task regardless of core count (r13
    measurement: the Poisson-bootstrap md5 chain spent 6.2 of its
    6.5 s single-threaded).  Same no-op-at-scale contract as
    ``load_docs``/``load_emb``; only applied to entries whose
    aggregates survive a reordered partial fold (verified per entry
    against the DuckDB oracle at every SF)."""
    return ensure_parallelism(load(spark, sf, name))


EXTENSIONS: dict[str, tuple[Callable[[SparkSession, str], DataFrame],
                            str | None]] = {}

# Size gate for the rank queries' physical choice (x40/x42): inputs whose
# Catalyst size estimate is below this take the plain window (one job);
# above it, the distributed prefix sum (no task ever sees a whole window
# partition).  512 MB ≈ one comfortably-in-memory task; tests force the
# distributed path by monkeypatching the PACKAGE attribute
# ``extensions._RANK_SMALL_BYTES`` to 0 (read at call time via
# ``rank_sampling._rank_small_bytes``).
_RANK_SMALL_BYTES = 512 << 20


def x(name: str, oracle: str | None):
    def deco(fn):
        EXTENSIONS[name] = (fn, oracle)
        return fn
    return deco


def kmeans_cte_parts(k: int, iters: int, dim: int):
    """DuckDB CTEs replaying the deterministic-trajectory Lloyd fit of
    ``operators.clustering.kmeans_verifiable`` (first-k init, dist² and
    centers quantized to 1e-6, cid tie-break) — shared by the x108 /
    x57 / x58 oracles.  Returns ``(parts, d2_expr)`` where ``parts``
    are the WITH clauses ``v, c0 .. c{iters}`` and ``d2_expr`` the
    rounded squared distance between ``v.e`` and ``c.c``."""
    d2 = ("ROUND(list_sum(list_transform(list_zip(v.e, c.c), "
          "x -> (x[1]-x[2])*(x[1]-x[2]))), 6)")
    parts = ["""v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
  WHERE embedding IS NOT NULL
)""", f"""c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
         e AS c
  FROM (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT {k})
)"""]
    for t in range(1, iters + 1):
        parts.append(f"""a{t} AS (
  SELECT vec_id, e, cid FROM (
    SELECT v.vec_id, v.e, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {d2}, c.cid) AS rn
    FROM v CROSS JOIN c{t-1} c) WHERE rn = 1
)""")
        parts.append(f"""c{t} AS (
  SELECT p.cid, COALESCE(n.c, p.c) AS c
  FROM c{t-1} p LEFT JOIN (
    SELECT cid, list(m ORDER BY i) AS c FROM (
      SELECT cid, i, ROUND(avg(e[i]), 6) AS m
      FROM a{t}, generate_series(1, {dim}) AS t(i) GROUP BY cid, i)
    GROUP BY cid) n ON p.cid = n.cid
)""")
    return parts, d2
