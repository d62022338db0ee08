"""SQL-surface completions, event analytics, profiling, sketches and round-5 dedup variants."""

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
# SQL-surface completions: correlated subqueries, quantified comparison,
# conditional aggregation, IGNORE NULLS windows.

@x("x73_exists_subquery", """
SELECT c_custkey, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
ORDER BY c_custkey""")
def x73(spark, sf):
    """Correlated EXISTS — in Spark the declarative spelling is a LEFT
    SEMI join on the correlation key; Catalyst plans the same for SQL
    EXISTS, so both engines run one semi hash join."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").filter(F.col("o_totalprice") > 300000)
    return (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
             .select("c_custkey", "c_mktsegment")
             .orderBy("c_custkey"))


@x("x74_quantified_all", """
SELECT s_suppkey, s_nationkey FROM supplier
WHERE s_acctbal > ALL (SELECT AVG(c_acctbal) FROM customer
                       GROUP BY c_nationkey)
ORDER BY s_suppkey""")
def x74(spark, sf):
    """Quantified > ALL (subquery): algebraically > MAX of the subquery —
    one tiny aggregate broadcast into the filter, no join explosion."""
    s = load(spark, sf, "supplier")
    c = load(spark, sf, "customer")
    mx = (c.groupBy("c_nationkey").agg(F.avg("c_acctbal").alias("a"))
           .agg(F.max("a").alias("mx")))
    return (s.join(F.broadcast(mx))
             .filter(F.col("s_acctbal") > F.col("mx"))
             .select("s_suppkey", "s_nationkey")
             .orderBy("s_suppkey"))


@x("x75_conditional_agg", """
SELECT l_returnflag,
       COUNT(*) AS n_all,
       COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
       CAST(ROUND(SUM(l_extendedprice)
                  FILTER (WHERE l_discount > 0.05), 2) AS DOUBLE)
         AS disc_rev,
       CAST(ROUND(AVG(CASE WHEN l_tax > 0.04 THEN l_extendedprice END), 2)
            AS DOUBLE) AS taxed_avg
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
def x75(spark, sf):
    """Conditional aggregation (SQL FILTER clause): one pass over
    lineitem, partial+final combine; the filters live inside the
    aggregate expressions, not as separate scans."""
    li = load(spark, sf, "lineitem")
    return (li.groupBy("l_returnflag").agg(
                F.count(F.lit(1)).alias("n_all"),
                F.count(F.when(F.col("l_quantity") > 25, 1))
                 .alias("n_big"),
                F.round(F.sum(F.when(F.col("l_discount") > 0.05,
                                     F.col("l_extendedprice"))), 2)
                 .cast("double").alias("disc_rev"),
                F.round(F.avg(F.when(F.col("l_tax") > 0.04,
                                     F.col("l_extendedprice"))), 2)
                 .cast("double").alias("taxed_avg"))
            .orderBy("l_returnflag"))


@x("x76_ignore_nulls_window", """
SELECT event_id, user_id,
       LAST_VALUE(CASE WHEN event_type = 'purchase' THEN event_id END
                  IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id) AS last_purchase
FROM events
QUALIFY user_id < 30
ORDER BY event_id""")
def x76(spark, sf):
    """Running 'most recent purchase id per user' — LAST_VALUE IGNORE
    NULLS over event time (the standard gap-filling / last-observation-
    carried-forward spelling).  Spark: F.last(ignorenulls=True)."""
    ev = load(spark, sf, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    marked = F.when(F.col("event_type") == "purchase", F.col("event_id"))
    return (ev.withColumn("last_purchase",
                          F.last(marked, ignorenulls=True).over(w))
              .filter(F.col("user_id") < 30)
              .select("event_id", "user_id", "last_purchase")
              .orderBy("event_id"))


@x("x77_approx_aggregates", """
WITH a AS (
  SELECT o_orderpriority,
         approx_count_distinct(o_custkey) AS ad,
         COUNT(DISTINCT o_custkey) AS xd,
         approx_quantile(o_totalprice, 0.5) AS aq,
         median(o_totalprice) AS xq
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority,
       CAST(ROUND(CAST(ad AS DOUBLE) / xd, 1) AS DOUBLE) AS distinct_ratio,
       CAST(ROUND(aq / xq, 1) AS DOUBLE) AS median_ratio
FROM a ORDER BY o_orderpriority""")
def x77(spark, sf):
    """Approximate aggregates — the sketches a 100 TB pipeline actually
    runs (HLL distinct counts, quantile sketches: one pass, mergeable,
    bounded memory; exact DISTINCT/median need a full shuffle).  Sketch
    internals differ per engine, so the oracle checks the ACCURACY
    CONTRACT instead of sketch equality: approx/exact rounds to 1.0 on
    both engines (HLL rsd 5%, quantile within rounding) — a real value
    check that fails if either approximation degrades."""
    o = load(spark, sf, "orders")
    # keep COUNT(DISTINCT) in its OWN aggregation: mixing it with the
    # sketch aggregates makes Spark's distinct-rewrite run the percentile
    # partials keyed by (priority, custkey) — one quantile digest per
    # distinct pair (measured 6 s vs 0.3 s at sf0.1).  Two cheap aggs +
    # a 5-row join beat one slow one.
    sk = o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("ad"),
        F.percentile_approx("o_totalprice", 0.5).alias("aq"),
        F.expr("median(o_totalprice)").alias("xq"))
    xd = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("xd"))
    return (sk.join(xd, "o_orderpriority")
              .select("o_orderpriority",
                      F.round(F.col("ad") / F.col("xd"), 1)
                       .cast("double").alias("distinct_ratio"),
                      F.round(F.col("aq") / F.col("xq"), 1)
                       .cast("double").alias("median_ratio"))
              .orderBy("o_orderpriority"))


@x("x78_posexplode", """
SELECT doc_id, CAST(u.pos AS INTEGER) AS pos, u.word FROM (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws) + 1),
                i -> struct_pack(pos := i - 1, word := ws[i]))) AS u
  FROM (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'),
                       t -> t <> '') AS ws
    FROM documents WHERE doc_id < 40
  )
)
ORDER BY doc_id, pos""")
def x78(spark, sf):
    """Positional explode (LATERAL unnest WITH ORDINALITY): tokenization
    that keeps token order — the shape sequence-labeling features need.
    Map-side generator in whole-stage codegen, no shuffle before the
    consumer."""
    docs = load(spark, sf, "documents").filter(F.col("doc_id") < 40)
    ws = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
    return (docs.select("doc_id", F.posexplode(ws).alias("pos", "word"))
                .orderBy("doc_id", "pos"))


@x("x79_union_by_name", """
SELECT k, src, v FROM (
  SELECT c_custkey AS k, 'cust' AS src, c_acctbal AS v FROM customer
  UNION ALL BY NAME
  SELECT s_acctbal AS v, 's' || 'upp' AS src, s_suppkey AS k FROM supplier
)
WHERE k <= 100 ORDER BY src, k""")
def x79(spark, sf):
    """Schema-aligned union (unionByName): columns match by NAME across
    differently-ordered inputs — the safe spelling for federating
    heterogeneous sources (positional UNION would silently mis-bind)."""
    c = load(spark, sf, "customer").select(
        F.col("c_custkey").alias("k"), F.lit("cust").alias("src"),
        F.col("c_acctbal").alias("v"))
    s = load(spark, sf, "supplier").select(
        F.col("s_acctbal").alias("v"), F.lit("supp").alias("src"),
        F.col("s_suppkey").alias("k"))
    return (c.unionByName(s).filter(F.col("k") <= 100)
             .select("k", "src", "v").orderBy("src", "k"))


@x("x80_share_of_total", """
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(l_extendedprice), 2) AS DOUBLE) AS rev,
       CAST(ROUND(SUM(l_extendedprice) * 100.0
                  / SUM(SUM(l_extendedprice)) OVER (), 4) AS DOUBLE)
         AS pct_total,
       CAST(ROUND(SUM(l_extendedprice) * 100.0
                  / SUM(SUM(l_extendedprice))
                    OVER (PARTITION BY l_returnflag), 4) AS DOUBLE)
         AS pct_flag
FROM lineitem GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus""")
def x80(spark, sf):
    """Share-of-total (ratio_to_report): aggregate first, THEN window over
    the tiny aggregate — the window never sees fact-table rows, so the
    'global' OVER () is a handful of rows, not a single-partition sort of
    the input."""
    li = load(spark, sf, "lineitem")
    agg = (li.groupBy("l_returnflag", "l_linestatus")
             .agg(F.sum("l_extendedprice").alias("r")))
    w_all = Window.partitionBy()
    w_flag = Window.partitionBy("l_returnflag")
    return (agg.select(
                "l_returnflag", "l_linestatus",
                F.round("r", 2).cast("double").alias("rev"),
                F.round(F.col("r") * 100.0 / F.sum("r").over(w_all), 4)
                 .cast("double").alias("pct_total"),
                F.round(F.col("r") * 100.0 / F.sum("r").over(w_flag), 4)
                 .cast("double").alias("pct_flag"))
            .orderBy("l_returnflag", "l_linestatus"))


@x("x81_resample_ffill", """
WITH u AS (
  SELECT user_id,
         CAST(date_trunc('hour', MIN(ts)) AS TIMESTAMP) AS t0,
         CAST(date_trunc('hour', MAX(ts)) AS TIMESTAMP) AS t1
  FROM events WHERE user_id < 20 GROUP BY user_id
), grid AS (
  SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 6 HOUR)) AS slot
  FROM u
), obs AS (
  SELECT user_id,
         CAST(to_timestamp(
           CAST(floor(date_part('epoch', ts) / 21600) * 21600 AS BIGINT))
           AS TIMESTAMP) AS slot,
         CAST(ROUND(AVG(value), 3) AS DOUBLE) AS v
  FROM events WHERE user_id < 20
  GROUP BY 1, 2
)
SELECT g.user_id, g.slot,
       LAST_VALUE(o.v IGNORE NULLS)
         OVER (PARTITION BY g.user_id ORDER BY g.slot) AS v_filled
FROM grid g LEFT JOIN obs o USING (user_id, slot)
ORDER BY user_id, slot""")
def x81(spark, sf):
    """Time-series resampling to a regular 6-hour grid with forward fill
    (gap filling / last-observation-carried-forward): per-user slot grid
    from sequence(), observed slot means joined on, LAST IGNORE NULLS to
    fill.  The grid explode is map-side codegen; the only exchanges are
    the slot aggregation and the grid join — no per-row Python, no
    driver-side date arithmetic."""
    ev = load(spark, sf, "events").filter(F.col("user_id") < 20)
    slot = F.timestamp_seconds(
        (F.floor(F.unix_timestamp("ts") / 21600) * 21600).cast("long"))
    u = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"))
    grid = u.select(
        "user_id",
        F.explode(F.sequence("t0", "t1",
                             F.expr("INTERVAL 6 HOURS"))).alias("slot"))
    obs = (ev.withColumn("slot", slot)
             .groupBy("user_id", "slot")
             .agg(F.round(F.avg("value"), 3).cast("double").alias("v")))
    w = (Window.partitionBy("user_id").orderBy("slot")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (grid.join(obs, ["user_id", "slot"], "left")
                .withColumn("v_filled",
                            F.last("v", ignorenulls=True).over(w))
                .select("user_id", "slot", "v_filled")
                .orderBy("user_id", "slot"))


@x("x82_paragraph_dedup", """
WITH p AS (
  SELECT doc_id, trim(par) AS par
  FROM (SELECT doc_id, unnest(string_split(text, '.')) AS par
        FROM documents)
  WHERE trim(par) <> ''
), d AS (
  SELECT array_to_string(list_slice(
           string_split_regex(lower(par), '\\s+'), 1, 5), ' ') AS k,
         COUNT(*) AS n_occ,
         COUNT(DISTINCT doc_id) AS n_docs, MIN(doc_id) AS first_doc
  FROM p GROUP BY 1
)
SELECT k, n_occ, n_docs, first_doc FROM d
WHERE n_occ > 1 ORDER BY n_occ DESC, k LIMIT 100""")
def x82(spark, sf):
    """Sentence-level boilerplate detection (the pass corpus pipelines run
    before document near-dup): explode sentences, fingerprint each by its
    normalized 5-word prefix, count repeats across the corpus with the
    earliest carrier doc.  Map-side explode in codegen + one partial+final
    count; top-k via TakeOrdered."""
    docs = load_docs(spark, sf)
    pars = (docs.select("doc_id",
                        F.explode(F.split("text", r"\.")).alias("par"))
                .withColumn("par", F.trim("par"))
                .filter(F.col("par") != ""))
    k = F.concat_ws(" ", F.slice(F.split(F.lower("par"), r"\s+"), 1, 5))
    return (pars.groupBy(k.alias("k"))
                .agg(F.count(F.lit(1)).alias("n_occ"),
                     F.countDistinct("doc_id").alias("n_docs"),
                     F.min("doc_id").alias("first_doc"))
                .filter(F.col("n_occ") > 1)
                .orderBy(F.col("n_occ").desc(), "k").limit(100))


@x("x86_expectations", """
WITH a AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CASE WHEN NOT COALESCE(doc_id IS NOT NULL, FALSE)
                  THEN 1 ELSE 0 END) AS BIGINT) AS v1,
         CAST(SUM(CASE WHEN NOT COALESCE(doc_id >= 0, FALSE)
                  THEN 1 ELSE 0 END) AS BIGINT) AS v2,
         CAST(SUM(CASE WHEN NOT COALESCE(length(text) > 0, FALSE)
                  THEN 1 ELSE 0 END) AS BIGINT) AS v3,
         CAST(SUM(CASE WHEN NOT COALESCE(lang IN ('en','de','fr','es','zh'),
                  FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v4,
         CAST(SUM(CASE WHEN NOT COALESCE(n_chars >= 200, FALSE)
                  THEN 1 ELSE 0 END) AS BIGINT) AS v5
  FROM documents
)
SELECT rule, n_violations, ROUND(n_violations / n, 6) AS violation_rate
FROM (
  SELECT n, 'doc_id_not_null' AS rule, v1 AS n_violations FROM a
  UNION ALL SELECT n, 'doc_id_nonneg', v2 FROM a
  UNION ALL SELECT n, 'text_nonempty', v3 FROM a
  UNION ALL SELECT n, 'lang_known', v4 FROM a
  UNION ALL SELECT n, 'min_length_200', v5 FROM a
) ORDER BY rule""")
def x86(spark, sf):
    """Ingest-gate data-quality report: N declarative rules over the
    documents batch in ONE aggregation pass (operators/expectations.py).
    min_length_200 genuinely fails for short docs, so the oracle checks a
    non-zero violation_rate, not just the all-green path."""
    from ..operators.expectations import check_expectations

    docs = load(spark, sf, "documents")
    return check_expectations(docs, {
        "doc_id_not_null": "doc_id IS NOT NULL",
        "doc_id_nonneg": "doc_id >= 0",
        "text_nonempty": "length(text) > 0",
        "lang_known": "lang IN ('en', 'de', 'fr', 'es', 'zh')",
        "min_length_200": "n_chars >= 200",
    })


@x("x87_doc_chunking", """
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
  FROM documents WHERE doc_id < 300
), c AS (
  SELECT doc_id,
         CAST((s - 1) // 30 AS INTEGER) AS chunk_idx,
         array_to_string(ws[s:s+39], ' ') AS chunk_text,
         CAST(len(ws[s:s+39]) AS INTEGER) AS chunk_tokens
  FROM w, UNNEST(generate_series(1, greatest(len(ws), 1), 30)) AS t(s)
)
SELECT doc_id, chunk_idx, chunk_text, chunk_tokens
FROM c WHERE chunk_tokens > 0 ORDER BY doc_id, chunk_idx""")
def x87(spark, sf):
    """Fixed token-window chunking with overlap (40-token chunks,
    10-token overlap → stride 30): the context-window prep step of a
    pretraining/RAG pipeline.  Map-only sequence+slice+explode in
    whole-stage codegen — see operators/chunking.py."""
    from ..operators.chunking import chunk_documents

    docs = load(spark, sf, "documents").filter(F.col("doc_id") < 300)
    return (chunk_documents(docs, "doc_id", "text",
                            chunk_size=40, overlap=10)
            .select("doc_id", "chunk_idx", "chunk_text", "chunk_tokens")
            .orderBy("doc_id", "chunk_idx"))


@x("x88_column_profile", """
WITH a AS (
  SELECT COUNT(*) AS n,
         COUNT(o_custkey) AS nn1, COUNT(DISTINCT o_custkey) AS nd1,
         CAST(MIN(o_custkey) AS VARCHAR) AS mi1,
         CAST(MAX(o_custkey) AS VARCHAR) AS ma1,
         ROUND(AVG(o_custkey), 4) AS av1,
         COUNT(o_totalprice) AS nn2, COUNT(DISTINCT o_totalprice) AS nd2,
         CAST(MIN(o_totalprice) AS VARCHAR) AS mi2,
         CAST(MAX(o_totalprice) AS VARCHAR) AS ma2,
         ROUND(AVG(o_totalprice), 4) AS av2,
         COUNT(o_orderstatus) AS nn3, COUNT(DISTINCT o_orderstatus) AS nd3,
         CAST(MIN(o_orderstatus) AS VARCHAR) AS mi3,
         CAST(MAX(o_orderstatus) AS VARCHAR) AS ma3,
         CAST(NULL AS DOUBLE) AS av3
  FROM orders
)
SELECT * FROM (
  SELECT 'o_custkey' AS col_name, n AS n_rows, n - nn1 AS n_nulls,
         nd1 AS n_distinct, mi1 AS min_str, ma1 AS max_str,
         av1 AS avg_num FROM a
  UNION ALL
  SELECT 'o_totalprice', n, n - nn2, nd2, mi2, ma2, av2 FROM a
  UNION ALL
  SELECT 'o_orderstatus', n, n - nn3, nd3, mi3, ma3, av3 FROM a
) ORDER BY col_name""")
def x88(spark, sf):
    """One-pass column profiling (rows/nulls/distinct/min/max/mean
    stacked long) — operators/profile.py.  Exact distinct here for the
    oracle; ``approx=True`` is the 100 TB spelling (HLL, no Expand)."""
    from ..operators.profile import profile_columns

    orders = ensure_parallelism(load(spark, sf, "orders"))
    prof = profile_columns(
        orders, ["o_custkey", "o_totalprice", "o_orderstatus"])
    return (prof.select(F.col("column").alias("col_name"),
                        "n_rows", "n_nulls", "n_distinct",
                        "min_str", "max_str",
                        F.round("avg_num", 4).alias("avg_num"))
                .orderBy("col_name"))


@x("x89_robust_outliers", """
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS INTEGER) AS n_tokens
  FROM documents
), s AS (
  SELECT median(CAST(n_tokens AS DOUBLE)) AS med FROM t
), m AS (
  SELECT median(abs(CAST(n_tokens AS DOUBLE) - s.med)) AS mad
  FROM t CROSS JOIN s
)
SELECT doc_id, n_tokens,
       ROUND(s.med, 4) AS med, ROUND(m.mad, 4) AS mad
FROM t CROSS JOIN s CROSS JOIN m
WHERE abs(CAST(n_tokens AS DOUBLE) - s.med) > 1.5 * m.mad
ORDER BY doc_id""")
def x89(spark, sf):
    """Median/MAD outlier hunt over token counts (robust to the very
    tail being hunted; k=1.5).  Two single-row aggregates broadcast back —
    no shuffle of the data itself (operators/text.py
    ``robust_outliers``)."""
    docs = text_mod.with_token_count(
        load(spark, sf, "documents"), "text", "n_tokens")
    flagged = text_mod.robust_outliers(docs, "n_tokens", k=1.5)
    return (flagged.filter("is_outlier")
            .select("doc_id", "n_tokens",
                    F.round("__med", 4).alias("med"),
                    F.round("__mad", 4).alias("mad"))
            .orderBy("doc_id"))


@x("x91_bpe_tokens", """
SELECT doc_id,
       CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> '')) AS INTEGER) AS ws_tokens,
       CAST(len(regexp_extract_all(lower(text),
            '([a-z]{1,4}|[0-9]+|[^a-z0-9\\s])', 1)) AS INTEGER) AS bpe_tokens,
       ROUND(len(regexp_extract_all(lower(text),
            '([a-z]{1,4}|[0-9]+|[^a-z0-9\\s])', 1))
            / greatest(len(list_filter(string_split_regex(lower(text),
                       '\\s+'), x -> x <> '')), 1), 4) AS fertility
FROM documents ORDER BY doc_id""")
def x91(spark, sf):
    """Tokenizer cost estimation: whitespace vs BPE-ish subword counts
    per doc plus fertility (subwords per word) — the budget metric that
    decides packing/chunking sizes.  Both counters are single JVM regex
    expressions (operators/text.py ``token_count``), map-only."""
    docs = load(spark, sf, "documents")
    out = (text_mod.with_token_count(docs, "text", "ws_tokens")
           .withColumn("bpe_tokens",
                       text_mod.token_count(F.col("text"), mode="bpe")))
    return (out.select(
        "doc_id", "ws_tokens", "bpe_tokens",
        F.round(F.col("bpe_tokens")
                / F.greatest(F.col("ws_tokens"), F.lit(1)), 4)
         .alias("fertility"))
        .orderBy("doc_id"))


@x("x92_substring_dedup", """
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS ws
  FROM documents
), pos AS (
  SELECT doc_id,
         md5(array_to_string(ws[s:s+7], ' ')) AS h
  FROM w, UNNEST(generate_series(1, greatest(len(ws) - 7, 1))) AS t(s)
), dps AS (
  SELECT h, COUNT(*) AS n_docs
  FROM (SELECT DISTINCT doc_id, h FROM pos) GROUP BY h
)
SELECT doc_id,
       COUNT(*) AS n_spans,
       CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_spans,
       ROUND(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END)
             / COUNT(*), 4) AS dup_ratio
FROM pos JOIN dps USING (h)
GROUP BY doc_id ORDER BY doc_id""")
def x92(spark, sf):
    """Exact-substring duplication stats: fraction of rolling word
    8-gram positions whose span recurs in another document (Lee et al.
    2022's span-level dedup signal; catches templated boilerplate that
    document-level near-dup misses).  Spans travel as md5 hashes — the
    same portable-hash discipline as x59–x65, so DuckDB re-derives them
    value-for-value (operators/dedup.py ``duplicated_span_stats``)."""
    docs = load_docs(spark, sf)
    return (dedup_mod.duplicated_span_stats(docs, "doc_id", "text", n=8)
            .orderBy("doc_id"))


@x("x93_length_histogram", """
WITH b AS (
  SELECT CAST(CASE WHEN n_chars < 0 THEN 0
              WHEN n_chars >= 1000 THEN 11
              ELSE n_chars // 100 + 1 END AS BIGINT) AS bucket
  FROM documents
)
SELECT bucket,
       CAST(bucket * 100 - 100 AS BIGINT) AS lo,
       CAST(bucket * 100 AS BIGINT) AS hi,
       COUNT(*) AS n_docs
FROM b GROUP BY bucket ORDER BY bucket""")
def x93(spark, sf):
    """Corpus length histogram: fixed-width ``width_bucket`` binning of
    n_chars (10 buckets over [0, 1000), clamped ends) — the profiling
    companion to x88.  One partial-aggregating exchange of at most
    12 rows per task; the same JVM ``width_bucket`` powers the Z-order
    clustering (functions/zorder.py)."""
    docs = load(spark, sf, "documents")
    bucket = (F.when(F.col("n_chars") < 0, 0)
               .when(F.col("n_chars") >= 1000, 11)
               .otherwise(F.width_bucket("n_chars", F.lit(0), F.lit(1000),
                                         F.lit(10))))
    return (docs.select(bucket.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .select("bucket",
                    (F.col("bucket") * 100 - 100).cast("long").alias("lo"),
                    (F.col("bucket") * 100).cast("long").alias("hi"),
                    "n_docs")
            .orderBy("bucket"))


@x("x96_session_stats", """
WITH d AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE OR
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM events
), g AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM d
), s AS (
  SELECT user_id, sid, COUNT(*) AS n_events,
         epoch(MAX(ts)) - epoch(MIN(ts)) AS dur_s
  FROM g GROUP BY user_id, sid
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       ROUND(AVG(n_events), 4) AS avg_events,
       ROUND(AVG(dur_s), 4) AS avg_dur_s,
       ROUND(median(dur_s), 4) AS p50_dur_s,
       ROUND(quantile_cont(dur_s, 0.9), 4) AS p90_dur_s
FROM s""")
def x96(spark, sf):
    """Session-duration distribution: the x15 sessionizer's output rolled
    into corpus-level engagement stats (count / mean events / mean and
    p50/p90 duration).  Exact percentiles over the SESSION table — tiny
    relative to events — so the sort-based percentile is cheap at any
    scale; the only wide exchange is x15's window on user_id."""
    from ..streaming.windows import session_agg

    ev = load(spark, sf, "events")
    s = session_agg(ev, gap="30 minutes")
    # session_window.end = last event + gap; active duration is max-min,
    # so subtract the 30-minute gap back out
    dur = (F.col("session_end").cast("double")
           - F.col("session_start").cast("double") - F.lit(1800.0))
    return (s.select(F.col("n_events").cast("long").alias("n_events"),
                     dur.alias("dur_s"))
            .agg(F.count(F.lit(1)).alias("n_sessions"),
                 F.round(F.avg("n_events"), 4).alias("avg_events"),
                 F.round(F.avg("dur_s"), 4).alias("avg_dur_s"),
                 F.round(F.expr("percentile(dur_s, 0.5)"), 4)
                  .alias("p50_dur_s"),
                 F.round(F.expr("percentile(dur_s, 0.9)"), 4)
                  .alias("p90_dur_s")))


@x("x97_char_entropy", """
WITH c AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ''), ch -> ch <> '') AS cs
  FROM documents WHERE doc_id < 200
)
SELECT doc_id,
       ROUND(COALESCE(-list_aggregate(
         list_transform(list_distinct(cs),
           ch -> (CAST(len(list_filter(cs, x -> x = ch)) AS DOUBLE) / len(cs))
                 * log2(CAST(len(list_filter(cs, x -> x = ch)) AS DOUBLE)
                        / len(cs))), 'sum'), 0.0), 6) AS entropy
FROM c ORDER BY doc_id""")
def x97(spark, sf):
    """Character-entropy quality proxy (Shannon bits of the char unigram
    distribution): gibberish and padding floods score low, prose ~4 bits
    — the cheap perplexity stand-in a filter pipeline runs before any
    model-based scoring.  Map-only JVM expressions
    (operators/text.py ``char_entropy``); both engines round to 6
    decimals, well above log2 ulp differences."""
    docs = load_docs(spark, sf).filter(F.col("doc_id") < 200)
    return (text_mod.with_char_entropy(docs, "text", "__h")
            .select("doc_id", F.round("__h", 6).alias("entropy"))
            .orderBy("doc_id"))


@x("x98_novelty", """
WITH w AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(ws) - 1, 1)),
           i -> coalesce(array_to_string(ws[i:i+1], ' '), ''))) AS gs
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS ws
        FROM documents)
), pos AS (
  SELECT doc_id, unnest(gs) AS g FROM w
), f AS (
  SELECT g, MIN(doc_id) AS first_doc FROM pos GROUP BY g
)
SELECT pos.doc_id,
       COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN pos.doc_id = f.first_doc THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       ROUND(SUM(CASE WHEN pos.doc_id = f.first_doc THEN 1 ELSE 0 END)
             / COUNT(*), 4) AS novelty
FROM pos JOIN f USING (g)
GROUP BY pos.doc_id ORDER BY pos.doc_id""")
def x98(spark, sf):
    """Per-doc bigram novelty: fraction of a doc's distinct bigrams no
    earlier doc contains — the cheapest "what does this add" curation
    signal (two count shuffles, no pair generation;
    operators/dedup.py ``novelty_scores``)."""
    docs = load_docs(spark, sf)
    return (dedup_mod.novelty_scores(docs, "doc_id", "text", n=2)
            .orderBy("doc_id"))


@x("x94_variant_json", """
SELECT event_type,
       COUNT(*) AS n,
       CAST(MIN(CAST(props->>'$.k' AS INTEGER)) AS INT) AS min_k,
       CAST(MAX(CAST(props->>'$.k' AS INTEGER)) AS INT) AS max_k,
       ROUND(AVG(CAST(props->>'$.k' AS INTEGER)), 4) AS avg_k
FROM events GROUP BY event_type ORDER BY event_type""")
def x94(spark, sf):
    """Semi-structured VARIANT path (Spark 4): ``parse_json`` once into
    the binary VARIANT encoding, then typed ``variant_get`` extraction —
    the modern engine spelling for schema-on-read event properties
    (x30's get_json_object twin; VARIANT avoids re-parsing the JSON text
    per extracted field)."""
    ev = load(spark, sf, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (ev.select("event_type", k.alias("__k"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("__k").alias("min_k"),
                 F.max("__k").alias("max_k"),
                 F.round(F.avg("__k"), 4).alias("avg_k"))
            .orderBy("event_type"))


@x("x95_recursive_calendar", """
WITH RECURSIVE cal(d, dmax) AS (
  SELECT MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE)) FROM events
  UNION ALL
  SELECT d + INTERVAL 1 DAY, dmax FROM cal WHERE d < dmax
), p AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT CAST(cal.d AS DATE) AS day, CAST(COALESCE(p.n, 0) AS BIGINT) AS n
FROM cal LEFT JOIN p ON cal.d = p.day ORDER BY day""")
def x95(spark, sf):
    """Gap-filled daily counts via a RECURSIVE CTE calendar (Spark 4's
    WITH RECURSIVE; UNION ALL anchor+step, acyclic, bounded by the data's
    date span) — the SQL-native twin of x81's sequence()+explode grid.
    Days with zero purchases appear with n=0 instead of vanishing.
    The stop bound rides the recursion as a COLUMN (anchor computes
    MIN+MAX once); a scalar subquery in the step re-evaluates per
    iteration — measured 4.4 s → 1.2 s at 30 days."""
    ev = load(spark, sf, "events")
    ev.createOrReplaceTempView("__x95_events")
    return spark.sql("""
      WITH RECURSIVE cal(d, dmax) AS (
        SELECT MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE))
        FROM __x95_events
        UNION ALL
        SELECT date_add(d, 1), dmax FROM cal WHERE d < dmax
      ), p AS (
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
        FROM __x95_events WHERE event_type = 'purchase' GROUP BY 1
      )
      SELECT cal.d AS day, COALESCE(p.n, CAST(0 AS BIGINT)) AS n
      FROM cal LEFT JOIN p ON cal.d = p.day ORDER BY day""")


@x("x90_event_debounce", """
WITH d AS (
  SELECT user_id, event_type,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER
                     (PARTITION BY user_id, event_type ORDER BY ts)) > 600
                   OR LAG(ts) OVER
                     (PARTITION BY user_id, event_type ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS opener
  FROM events
)
SELECT user_id, event_type,
       COUNT(*) AS n_total,
       CAST(SUM(opener) AS BIGINT) AS n_kept
FROM d GROUP BY user_id, event_type ORDER BY user_id, event_type""")
def x90(spark, sf):
    """Burst debounce: keep only the opener of each gap-delimited burst
    per (user, event_type) (10-min gap) — instrumentation dedup for
    click/retry logs.  One window shuffle; counts are tie-order
    invariant (operators/events.py ``debounce``)."""
    from ..operators.events import debounce

    ev = load(spark, sf, "events")
    kept = (debounce(ev, ["user_id", "event_type"], "ts", within_s=600)
            .groupBy("user_id", "event_type")
            .agg(F.count(F.lit(1)).alias("n_kept")))
    totals = (ev.groupBy("user_id", "event_type")
                .agg(F.count(F.lit(1)).alias("n_total")))
    return (totals.join(kept, ["user_id", "event_type"])
            .select("user_id", "event_type", "n_total", "n_kept")
            .orderBy("user_id", "event_type"))


@x("x85_sketch_rollup", """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
       CAST(ROUND(CAST(approx_count_distinct(user_id) AS DOUBLE)
                  / COUNT(DISTINCT user_id), 1) AS DOUBLE) AS users_ratio
FROM events GROUP BY event_type ORDER BY event_type""")
def x85(spark, sf):
    """Mergeable-sketch rollup — THE 100 TB distinct-count pattern: build
    one HLL sketch per (day, event_type) partition, then union sketches
    up to per-type totals WITHOUT touching raw data again.  At scale the
    daily sketches are KB-sized table properties; re-aggregation windows
    (7d/30d/all-time) become sketch unions instead of fact-table scans.
    Native Spark ``hll_sketch_agg`` / ``hll_union_agg`` — JVM-side,
    partial-aggregating.  Sketch bytes are engine-specific, so the
    oracle checks the ACCURACY CONTRACT (x77's pattern): the
    union-of-daily-sketches estimate over the exact distinct count
    rounds to 1.0, as does DuckDB's own HLL over the same data — a real
    value check that fails if the sketch rollup degrades."""
    ev = load(spark, sf, "events")
    daily = (ev.groupBy(F.to_date("ts").alias("day"), "event_type")
               .agg(F.hll_sketch_agg("user_id").alias("sk"),
                    F.count(F.lit(1)).alias("n_events")))
    rolled = (daily.groupBy("event_type")
              .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                    .alias("__approx"),
                   F.sum("n_events").alias("n_events"),
                   F.count(F.lit(1)).alias("n_days")))
    exact = (ev.groupBy("event_type")
               .agg(F.countDistinct("user_id").alias("__exact")))
    return (rolled.join(exact, "event_type")
            .select("event_type", "n_events", "n_days",
                    F.round(F.col("__approx").cast("double")
                            / F.col("__exact"), 1).cast("double")
                     .alias("users_ratio"))
            .orderBy("event_type"))


@x("x84_fuzzy_dedup", """
WITH w AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     t -> t <> '') AS ws
  FROM documents WHERE doc_id < 300
), g AS (
  SELECT doc_id, text,
         list_distinct(list_transform(
           range(0, greatest(len(ws) - 3, 0) + 1),
           i -> array_to_string(list_slice(ws, i + 1, i + 3), ' '))) AS gs
  FROM w
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.gs, b.gs)) AS common,
         len(a.gs) AS na, len(b.gs) AS nb,
         levenshtein(a.text, b.text) AS edit_dist
  FROM g a JOIN g b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       ROUND(common / (na + nb - common), 6) AS jaccard, edit_dist
FROM pairs
WHERE common / (na + nb - common) >= 0.3 AND edit_dist <= 200
ORDER BY id_a, id_b""")
def x84(spark, sf):
    """Edit-distance near-dups: q-gram inverted-index candidates (x03's
    machinery) verified with JVM-side levenshtein — the scale-shaped
    fuzzy join (no all-pairs, no Python boundary).  The DuckDB oracle
    re-derives the same 3-gram Jaccard floor + levenshtein verify as an
    all-pairs join (fine at sf0.01; the Spark plan stays sub-quadratic —
    a pair with jaccard > 0 necessarily shares an n-gram, so the
    inverted-index candidate set is lossless above the floor)."""
    docs = load_docs(spark, sf).filter(F.col("doc_id") < 300)
    out = dedup_mod.fuzzy_near_dups(docs, "doc_id", "text",
                                    max_dist=200, n=3,
                                    candidate_threshold=0.3)
    return (out.select("id_a", "id_b",
                       F.round("jaccard", 6).alias("jaccard"),
                       # DuckDB levenshtein is BIGINT; match it exactly
                       # (the driver's schema check is width-sensitive)
                       F.col("edit_dist").cast("long").alias("edit_dist"))
               .orderBy("id_a", "id_b"))


def _pagerank_oracle_sql(iters: int = 10) -> str:
    """DuckDB twin of x83: the bigram-Jaccard pair graph (x84's gram
    derivation) symmetrized, then ``iters`` power-iteration steps
    UNROLLED as chained CTEs — possible because x83 pins ``tol=0`` so
    the Spark side runs exactly the same fixed iteration count.  The
    symmetrized graph has no dangling nodes (every dst is also a src),
    so the dangling-mass term is identically zero on both engines and
    is omitted here."""
    step = """r{j} AS (
  SELECT n.node,
         CAST(0.15 AS DOUBLE) / nn.n
           + CAST(0.85 AS DOUBLE) * COALESCE(c.contrib, 0) AS rank
  FROM nodes n CROSS JOIN nn
  LEFT JOIN (SELECT e.dst, SUM(r.rank / d.deg) AS contrib
             FROM e JOIN r{i} r ON e.src = r.node
                    JOIN deg d ON d.src = e.src
             GROUP BY e.dst) c ON n.node = c.dst
)"""
    chain = ",\n".join(step.format(i=i, j=i + 1) for i in range(iters))
    return f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS ws
  FROM documents WHERE doc_id < 500
), g AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(ws) - 1, 1)),
           i -> coalesce(array_to_string(ws[i:i+1], ' '), ''))) AS gs
  FROM w
), p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM g a JOIN g b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.gs, b.gs))
        / (len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs))) >= 0.5
), e AS (
  SELECT id_a AS src, id_b AS dst FROM p
  UNION
  SELECT id_b AS src, id_a AS dst FROM p
), nodes AS (
  SELECT DISTINCT src AS node FROM e
), nn AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes
), deg AS (
  SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg FROM e GROUP BY src
), r0 AS (
  SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn
),
{chain}
SELECT node, ROUND(rank, 8) AS rank FROM r{iters}
ORDER BY rank DESC, node LIMIT 50"""


@x("x187_skew_report", """
WITH c AS (
  SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
), t AS (
  SELECT string_agg(CAST(k AS VARCHAR) || '=' || CAST(n AS VARCHAR), ','
                    ORDER BY n DESC, k ASC) AS top_keys
  FROM (SELECT k, n FROM c ORDER BY n DESC, k ASC LIMIT 10)
)
SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(MAX(n) AS BIGINT) AS max_n,
       ROUND(AVG(n), 4) AS mean_n,
       ROUND(quantile_cont(n, 0.99), 4) AS p99_n,
       ROUND(MAX(n) / AVG(n), 4) AS skew_ratio,
       CAST(LEAST(CEIL(MAX(n) / AVG(n)), 64) AS INT) AS salt_factor,
       (SELECT top_keys FROM t) AS top_keys
FROM c""")
def x187(spark, sf):
    """Hot-key diagnosis of the orders→customer join key: the
    pre-flight a 100 TB pipeline runs BEFORE a join/groupBy to decide
    whether AQE suffices or :func:`operators.salted_join` is needed
    (skew_ratio ≫ 1 → one task's input outweighs its peers; the
    suggested salt factor feeds straight into salted_join).  One
    map-combined count shuffle over the key — the same exchange the
    diagnosed join would do, carrying (key, count) rows — then a tiny
    summary agg plus a TakeOrderedAndProject for the heaviest keys."""
    from ..operators.skew import skew_report

    return skew_report(load(spark, sf, "orders"), "o_custkey", top=10)


@x("x83_pagerank", _pagerank_oracle_sql(10))
def x83(spark, sf):
    """PageRank over the x03 near-dup pair graph: centrality-based
    canonical-document selection (the 'which mirror do we keep' policy a
    min-id rule can't express).  One shuffle per iteration, lineage
    checkpoint-truncated, dangling mass redistributed — see
    operators/graph.py.  ``tol=0`` pins exactly 10 iterations (no
    convergence probe, no driver action inside the loop) so the DuckDB
    oracle can unroll the identical fixed-point computation."""
    from ..operators.graph import pagerank

    docs = load_docs(spark, sf).filter(F.col("doc_id") < 500)
    pairs = dedup_mod.ngram_jaccard_pairs(docs, "doc_id", "text",
                                          n=2, threshold=0.5)
    ranks = pagerank(pairs.select("id_a", "id_b"), max_iter=10, tol=0.0)
    return (ranks.select("node",
                         F.round("rank", 8).cast("double").alias("rank"))
                 .orderBy(F.col("rank").desc(), "node").limit(50))



