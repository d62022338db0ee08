"""Tier-B relational variants (set ops, cube, percentiles, pivot) and multimodal plumbing entries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from ..operators import asof as asof_mod  # noqa: F401
from ..operators import dedup as dedup_mod  # noqa: F401
from ..operators import similarity as sim_mod  # noqa: F401
from ..operators import text as text_mod  # noqa: F401
from ..tierb import load  # noqa: F401
from ..util import ensure_parallelism  # noqa: F401

from ._shared import load_docs, load_emb, x  # noqa: F401


# ---------------------------------------------------------------------------
# Tier-B variants beyond the declared 31 (set ops, cube, percentiles, pivot)

@x("x22_union_all_agg", """
SELECT k, COUNT(*) AS n FROM (
  SELECT c_nationkey AS k FROM customer
  UNION ALL
  SELECT s_nationkey AS k FROM supplier)
GROUP BY k ORDER BY k""")
def x22(spark, sf):
    """UNION ALL (bag semantics) + group count — complements Q21 INTERSECT."""
    c = load(spark, sf, "customer").select(F.col("c_nationkey").alias("k"))
    s = load(spark, sf, "supplier").select(F.col("s_nationkey").alias("k"))
    return (c.unionAll(s).groupBy("k")
            .agg(F.count(F.lit(1)).alias("n")).orderBy("k"))


@x("x23_except", """
SELECT o_custkey AS k FROM orders
EXCEPT
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
ORDER BY k""")
def x23(spark, sf):
    """EXCEPT (set difference, distinct semantics) via subtract."""
    o = load(spark, sf, "orders").select(F.col("o_custkey").alias("k"))
    rich = (load(spark, sf, "customer")
            .filter(F.col("c_acctbal") > 5000)
            .select(F.col("c_custkey").alias("k")))
    return o.subtract(rich).orderBy("k")


@x("x24_cube", """
SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
       COUNT(*) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus) ORDER BY rf, ls""")
def x24(spark, sf):
    """CUBE grouping sets (all 4 combinations) — complements Q14 ROLLUP."""
    li = load(spark, sf, "lineitem")
    return (li.cube("l_returnflag", "l_linestatus")
              .agg(F.count(F.lit(1)).alias("n"))
              .select(F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
                      F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
                      "n")
              .orderBy("rf", "ls"))


@x("x25_percentiles", """
SELECT l_returnflag,
       ROUND(quantile_cont(l_quantity, 0.25), 4) AS p25,
       ROUND(quantile_cont(l_quantity, 0.75), 4) AS p75
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
def x25(spark, sf):
    """Exact interpolated percentiles (Spark `percentile` and DuckDB
    `quantile_cont` share linear interpolation) — complements Q16 median."""
    li = load(spark, sf, "lineitem")
    return (li.groupBy("l_returnflag")
              .agg(F.round(F.expr("percentile(l_quantity, 0.25)"), 4)
                   .alias("p25"),
                   F.round(F.expr("percentile(l_quantity, 0.75)"), 4)
                   .alias("p75"))
              .orderBy("l_returnflag"))


@x("x26_pivot", """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS st_f,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS st_o,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS st_p
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")
def x26(spark, sf):
    """Pivot (status → columns); the oracle spells it as FILTERed counts."""
    o = load(spark, sf, "orders")
    piv = (o.groupBy("o_orderpriority")
            .pivot("o_orderstatus", ["F", "O", "P"]).count())
    return (piv.select("o_orderpriority",
                       F.coalesce("F", F.lit(0)).alias("st_f"),
                       F.coalesce("O", F.lit(0)).alias("st_o"),
                       F.coalesce("P", F.lit(0)).alias("st_p"))
               .orderBy("o_orderpriority"))


# ---------------------------------------------------------------------------
# Multimodal plumbing

@x("x17_media_metadata", """
SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes
FROM documents ORDER BY doc_id""")
def x17(spark, sf):
    """Binary-column metadata: documents' text re-encoded as an opaque
    binary payload, byte length computed without decoding (the cheap
    map-side pass every multimodal pipeline starts with).  Expression
    inlined per the r4 re-measure: the 2× gap vs baseline was per-call
    DataFrame-build (py4j) latency, not execution — the executed job is
    0.07 s at sf0.1 (BASELINE.md §5 note) — so the query keeps the
    minimum op count; `attach_media_metadata` remains the API surface
    (x18 and unit tests exercise it)."""
    docs = load(spark, sf, "documents")
    return (docs.select("doc_id",
                        F.octet_length(F.encode("text", "UTF-8"))
                         .cast("int").alias("n_bytes"))
            .orderBy("doc_id"))


@x("x18_image_features", """
WITH h AS (
  SELECT doc_id,
         CAST(('0x' || rpad(hex(encode(substring(text, 1, 8))), 16, '0'))
              AS UBIGINT) AS hv
  FROM documents
)
SELECT doc_id,
       CAST(16 + hv % 1024 AS INT) AS width,
       CAST(16 + (hv // 1024) % 1024 AS INT) AS height
FROM h ORDER BY doc_id""")
def x18(spark, sf):
    """Image decode plumbing with the deterministic fake decoder: binary →
    mapInPandas → width/height columns (Arrow batch shape is the real
    contract being exercised).  PROMOTED to oracle-checked: the fake
    decoder is a pure function of the first 8 payload bytes
    (big-endian int → width/height buckets), so DuckDB re-derives the
    identical values via hex(encode(substring(text,1,8))) rpad-ded to 16
    hex chars — mirroring the decoder's RIGHT zero-padding of payloads
    shorter than 8 bytes (content[:8].ljust(8, b'\\0'); empty → 0), and
    UBIGINT so a first byte >= 0x80 cannot overflow — the plumbing's
    output is verified value-for-value, not just row-counted."""
    from ..operators.multimodal import extract_image_features

    docs = (load(spark, sf, "documents")
            .select("doc_id", F.encode("text", "UTF-8").alias("content")))
    return (extract_image_features(docs, "content", fake_decode=True)
            .orderBy("doc_id"))


