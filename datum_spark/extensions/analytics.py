"""Analytics band x99–x150: survivorship, drift, CDC/SCD2, BPE, graph census, experiment/forensic statistics."""

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
# asymmetric containment dedup (round 5)

@x("x99_containment", """
WITH w0 AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> '') AS ws
  FROM documents WHERE doc_id < 200
), w AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(ws) - 2, 1)),
           i -> array_to_string(ws[i:i+2], ' '))) AS gs
  FROM w0
), pairs AS (
  SELECT a.doc_id AS src_id, b.doc_id AS dst_id,
         len(list_intersect(a.gs, b.gs)) AS common, len(a.gs) AS ns
  FROM w a JOIN w b ON a.doc_id <> b.doc_id
  WHERE len(a.gs) > 0
)
SELECT src_id, dst_id, ROUND(common / ns, 4) AS containment
FROM pairs WHERE common / ns >= 0.7
ORDER BY src_id, dst_id""")
def x99(spark, sf):
    """Directional trigram containment ≥ 0.7 — the near-SUPERSET dedup
    case (short doc quoted whole inside a longer one) that symmetric
    Jaccard structurally misses (J = |A∩B|/|A∪B| ≈ |A|/|B| → 0 while
    C(A→B) → 1).  Spark side generates candidates with the asymmetric
    PPJoin prefix index of ``ngram_containment_pairs`` (lossless; the
    oracle's all-pairs join verifies the pruning drops nothing)."""
    docs = load_docs(spark, sf).filter(F.col("doc_id") < 200)
    pairs = dedup_mod.ngram_containment_pairs(docs, "doc_id", "text",
                                              n=3, threshold=0.7)
    return (pairs.select("src_id", "dst_id",
                         F.round("containment", 4).alias("containment"))
                 .orderBy("src_id", "dst_id"))



@x("x100_golden_record", """
WITH RECURSIVE w AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> '')) AS ws
  FROM documents WHERE doc_id < 300
), p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM w a JOIN w b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.ws, b.ws))
        / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) >= 0.8
), sym AS (
  SELECT id_a AS u, id_b AS v FROM p
  UNION SELECT id_b, id_a FROM p
), reach(u, v) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM sym)
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
), comp AS (
  SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach GROUP BY u
), m AS (
  SELECT c.cluster_id, d.doc_id, d.source, d.n_chars
  FROM comp c JOIN documents d ON c.doc_id = d.doc_id
)
SELECT cluster_id,
       arg_max(doc_id, n_chars * 10000000 - doc_id) AS rep_id,
       count(*) AS n_members,
       array_to_string(list_sort(list_distinct(list(source))), ',') AS sources,
       CAST(sum(n_chars) AS BIGINT) AS total_n_chars
FROM m GROUP BY cluster_id HAVING count(*) >= 2
ORDER BY cluster_id""")
def x100(spark, sf):
    """Golden-record survivorship: near-dup clusters (the x51 components)
    collapsed to one merged survivor each — representative = longest
    text (tie: lowest id), provenance = sorted distinct sources, plus
    total characters absorbed.  One groupBy on the cluster key after the
    clustering; the oracle re-derives clusters by recursive-CTE closure
    and the same keep policy via an encoded arg_max (n_chars·10^7 − id
    ranks exactly like (n_chars DESC, doc_id ASC) at fixture scale)."""
    from ..operators.components import dup_clusters
    from ..operators.dedup import golden_records

    docs = load(spark, sf, "documents").filter(F.col("doc_id") < 300)
    pairs = dedup_mod.ngram_jaccard_pairs(docs, "doc_id", "text",
                                          n=1, threshold=0.8)
    comp = dup_clusters(pairs.select("id_a", "id_b"))
    members = (comp.select(F.col("node").alias("doc_id"),
                           F.col("component").alias("__cluster"))
                   .join(docs.select("doc_id", "source", "n_chars"),
                         "doc_id"))
    return (golden_records(members, "doc_id", "__cluster", "n_chars",
                           collect_cols=("source",),
                           sum_cols=("n_chars",))
            .filter(F.col("n_members") >= 2)
            .select("cluster_id", "rep_id", "n_members",
                    # scalar provenance: the driver's canonicalizer
                    # (pandas sort_values) cannot hash array cells, so
                    # the query-level contract is complex-type-free.
                    F.array_join("sources", ",").alias("sources"),
                    "total_n_chars")
            .orderBy("cluster_id"))



@x("x101_weighted_sample", """
WITH kk AS (
  SELECT source, doc_id, n_chars,
         ln((CAST(('0x' || substring(md5('wsample-' || CAST(doc_id AS VARCHAR)),
                                     1, 8)) AS BIGINT) + 0.5) / 4294967296.0)
           / n_chars AS k
  FROM documents WHERE n_chars > 0
), r AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY k DESC, doc_id) AS rn
  FROM kk
)
SELECT source, doc_id, n_chars FROM r WHERE rn <= 5
ORDER BY source, doc_id""")
def x101(spark, sf):
    """Stratified weighted sampling without replacement (5 docs per
    source, probability ∝ n_chars) via the Efraimidis–Spirtes key
    ln(u)/w with u derived from the portable md5 bucket — the draw is a
    pure function of (doc_id, salt): reproducible across engines,
    partitionings and cluster sizes, which is why the DuckDB oracle can
    re-derive the exact member set (a rand()-based sample never could)."""
    from ..operators.sampling import weighted_sample

    docs = (load(spark, sf, "documents")
            .filter(F.col("n_chars") > 0)
            .select("source", "doc_id", "n_chars"))
    return (weighted_sample(docs, 5, "n_chars", "doc_id",
                            group_col="source")
            .select("source", "doc_id", "n_chars")
            .orderBy("source", "doc_id"))



@x("x102_source_drift", """
WITH b AS (
  SELECT CAST(CASE WHEN n_chars < 0 THEN 0
              WHEN n_chars >= 600 THEN 11
              ELSE n_chars // 60 + 1 END AS BIGINT) AS bucket,
         source
  FROM documents WHERE source IN ('src0', 'src1')
), c AS (
  SELECT bucket,
         CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT)
           AS ca,
         CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT)
           AS cb
  FROM b GROUP BY bucket
), t AS (
  SELECT bucket, ca, cb,
         (ca + 0.5) / (sum(ca) OVER () + 6.0) AS pa,
         (cb + 0.5) / (sum(cb) OVER () + 6.0) AS pb
  FROM c
)
SELECT bucket, ca AS n_a, cb AS n_b,
       ROUND(pa, 6) AS pa, ROUND(pb, 6) AS pb,
       ROUND((pa - pb) * ln(pa / pb), 6) AS psi
FROM t ORDER BY bucket""")
def x102(spark, sf):
    """Population Stability Index of the length distribution between two
    corpus sources — the snapshot-drift monitor (PSI > 0.25 = shifted).
    Fixed x93-style width_bucket bins (identical across engines/scales,
    unlike quantile bins), +0.5 Laplace smoothing so empty bins stay
    finite; per-bucket contributions sum to the index.  Nothing
    data-proportional leaves the mappers: the groupBy ships ≤ 12 rows
    per task and the totals ride a window over that bounded table."""
    from ..operators.profile import distribution_psi

    docs = load(spark, sf, "documents")
    out = distribution_psi(docs, "n_chars", "source", "src0", "src1",
                           lo=0.0, hi=600.0, buckets=10)
    return (out.select("bucket",
                       F.col("__ca").alias("n_a"),
                       F.col("__cb").alias("n_b"),
                       F.round("pa", 6).alias("pa"),
                       F.round("pb", 6).alias("pb"),
                       F.round("psi", 6).alias("psi"))
               .orderBy("bucket"))



@x("x103_centroid_outliers", """
WITH v AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
), n AS (
  SELECT vec_id, label,
         list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS u
  FROM v WHERE list_dot_product(e, e) > 0
), p AS (
  SELECT label, i, ROUND(avg(u[i]), 6) AS c
  FROM n, generate_series(1, 64) AS t(i)
  GROUP BY label, i
), cent AS (
  SELECT label, list(c ORDER BY i) AS cv FROM p GROUP BY label
)
SELECT n.vec_id, n.label,
       ROUND(list_dot_product(n.u, cent.cv)
             / sqrt(list_dot_product(cent.cv, cent.cv)), 4) AS cos_centroid
FROM n JOIN cent ON n.label = cent.label
ORDER BY cos_centroid, vec_id LIMIT 100""")
def x103(spark, sf):
    """Per-label embedding coherence: cosine of each vector to its
    label's (quantized) centroid, worst 100 first — the mislabeled /
    off-topic outlier signal.  Shuffles carry only labels × dim partial
    sums; the 1e-6 centroid quantization pins the one place float
    summation order could differ between engines, making the score a
    pure function of the data (see centroid_cosines).  The oracle
    hardcodes the fixture dim (64) because DuckDB cannot lateral-join
    generate_series on a list column."""
    from ..operators.similarity import centroid_cosines

    emb = load_emb(spark, sf)
    out = centroid_cosines(emb, "vec_id", "embedding", "label")
    return (out.select("vec_id", "label",
                       F.round("cos_centroid", 4).alias("cos_centroid"))
               .orderBy("cos_centroid", "vec_id").limit(100))



@x("x104_cms_heavy_hitters", """
WITH w AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> '')) AS word
  FROM documents
), exact AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS exact_n FROM w GROUP BY word
  ORDER BY exact_n DESC, word LIMIT 15
), cells AS (
  SELECT j, CAST(('0x' || substring(md5('cms-' || j || '-' || word), 1, 8))
                 AS BIGINT) % 1024 AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM w, generate_series(0, 3) AS t(j)
  GROUP BY 1, 2
), probe AS (
  SELECT e.word, e.exact_n, j,
         CAST(('0x' || substring(md5('cms-' || j || '-' || e.word), 1, 8))
              AS BIGINT) % 1024 AS bucket
  FROM exact e, generate_series(0, 3) AS t(j)
), est AS (
  SELECT p.word, p.exact_n,
         MIN(COALESCE(c.n, 0)) AS est_n
  FROM probe p LEFT JOIN cells c ON p.j = c.j AND p.bucket = c.bucket
  GROUP BY p.word, p.exact_n
)
SELECT word, exact_n, est_n,
       ROUND(CAST(est_n AS DOUBLE) / exact_n, 4) AS ratio
FROM est ORDER BY exact_n DESC, word""")
def x104(spark, sf):
    """Count-min sketch heavy hitters: a 4×1024 re-aggregable counter
    table over ALL word occurrences, probed for the exact top-15 terms —
    est ≥ exact always (one-sided CMS error), ratio shows the overcount.
    Portable md5 bucket hashing makes the whole sketch reproducible in
    the oracle cell-for-cell (x59/x62 discipline applied to a sketch);
    building ships ≤ 4096 combiner cells per task no matter the corpus
    size, and estimation broadcast-joins the tiny counter table."""
    from ..operators.sketches import cms_build, cms_estimate
    from ..util import retain_cache

    docs = load_docs(spark, sf)
    words = retain_cache(docs.select(
        F.explode(F.filter(F.split(F.lower("text"), r"\s+"),
                           lambda t: t != "")).alias("word")))
    counters = cms_build(words, "word", depth=4, width=1024)
    top = (words.groupBy("word").agg(F.count(F.lit(1)).alias("exact_n"))
                .orderBy(F.col("exact_n").desc(), "word").limit(15))
    est = cms_estimate(counters, top, "word", depth=4, width=1024)
    return (est.select("word", "exact_n", "est_n",
                       F.round(F.col("est_n").cast("double")
                               / F.col("exact_n"), 4).alias("ratio"))
               .orderBy(F.col("exact_n").desc(), "word"))



@x("x105_radius_join", """
WITH c AS (
  SELECT c_custkey, abs(c_acctbal) % 100 AS x,
         CAST(c_custkey % 100 AS DOUBLE) AS y
  FROM customer
), s AS (
  SELECT s_suppkey, abs(s_acctbal) % 100 AS x,
         CAST(s_suppkey % 100 AS DOUBLE) AS y
  FROM supplier
)
SELECT c.c_custkey, s.s_suppkey,
       ROUND(sqrt((c.x - s.x)*(c.x - s.x) + (c.y - s.y)*(c.y - s.y)), 4)
         AS dist
FROM c, s
WHERE (c.x - s.x)*(c.x - s.x) + (c.y - s.y)*(c.y - s.y) <= 2.25
ORDER BY c_custkey, s_suppkey""")
def x105(spark, sf):
    """ST_DWithin as a JOIN STRATEGY: all (customer, supplier) point
    pairs within planar distance 1.5, via the uniform-grid cell join of
    operators/spatial.py — one equi-join on snapped cell keys with a 3×3
    neighborhood expansion on one side, never a cross join (the oracle's
    all-pairs form IS the naive translation this operator exists to
    avoid).  Points are derived deterministically from acctbal/key so
    both engines see identical coordinates; distances compare as plain
    multiplications (same IEEE ops everywhere)."""
    from ..operators.spatial import radius_join

    cust = (load(spark, sf, "customer")
            .select("c_custkey",
                    (F.abs(F.col("c_acctbal")) % 100).alias("cx"),
                    (F.col("c_custkey") % 100).cast("double").alias("cy")))
    supp = (load(spark, sf, "supplier")
            .select("s_suppkey",
                    (F.abs(F.col("s_acctbal")) % 100).alias("sx"),
                    (F.col("s_suppkey") % 100).cast("double").alias("sy")))
    out = radius_join(cust, supp, "cx", "cy", "sx", "sy", 1.5)
    return (out.select("c_custkey", "s_suppkey",
                       F.round("dist", 4).alias("dist"))
               .orderBy("c_custkey", "s_suppkey"))



@x("x106_unpivot", """
WITH long AS (
  SELECT l_returnflag, 'discount' AS measure, l_discount AS v FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'price', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'quantity', l_quantity FROM lineitem
)
SELECT l_returnflag, measure,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(v), 4) AS avg_v,
       ROUND(SUM(v), 2) AS sum_v
FROM long GROUP BY l_returnflag, measure
ORDER BY l_returnflag, measure""")
def x106(spark, sf):
    """Wide→long UNPIVOT (melt) via Spark's native ``unpivot`` operator —
    ONE scan produces all three measure rows per input row (the oracle's
    UNION ALL form reads the table three times; at 100 TB that's the
    difference), then a plain partial-aggregated rollup per measure."""
    li = (load(spark, sf, "lineitem")
          .select("l_returnflag",
                  F.col("l_quantity").alias("quantity"),
                  F.col("l_extendedprice").alias("price"),
                  F.col("l_discount").alias("discount")))
    long = li.unpivot(["l_returnflag"], ["discount", "price", "quantity"],
                      "measure", "v")
    return (long.groupBy("l_returnflag", "measure")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.round(F.avg("v"), 4).alias("avg_v"),
                     F.round(F.sum("v"), 2).alias("sum_v"))
                .orderBy("l_returnflag", "measure"))



@x("x107_regression_aggs", """
SELECT l_returnflag,
       ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
       ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
       CAST(count_if(l_extendedprice > 50000) AS BIGINT) AS n_big
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
def x107(spark, sf):
    """Per-group least-squares aggregates (regr_slope / regr_intercept /
    regr_r2) + count_if — single-pass JVM aggregates (no window, no
    second scan; the moments fold map-side like any partial agg)."""
    li = load(spark, sf, "lineitem")
    return (li.groupBy("l_returnflag")
              .agg(F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4)
                    .alias("slope"),
                   F.round(F.regr_intercept("l_extendedprice",
                                            "l_quantity"), 4).alias("icept"),
                   F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6)
                    .alias("r2"),
                   F.count_if(F.col("l_extendedprice") > 50000)
                    .alias("n_big"))
              .orderBy("l_returnflag"))



def _kmeans_oracle_sql(k: int = 4, iters: int = 3, dim: int = 64) -> str:
    """Unrolled Lloyd iterations as DuckDB CTEs (the _pagerank_oracle_sql
    discipline) — CTE body shared with the x57/x58 oracles via
    ``_shared.kmeans_cte_parts``."""
    from ._shared import kmeans_cte_parts

    parts, d2 = kmeans_cte_parts(k, iters, dim)
    final = f"""SELECT vec_id, cid AS cluster FROM (
  SELECT v.vec_id, c.cid,
         row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY {d2}, c.cid) AS rn
  FROM v CROSS JOIN c{iters} c) WHERE rn = 1
ORDER BY vec_id"""
    return "WITH " + ",\n".join(parts) + "\n" + final


@x("x108_kmeans_verified", _kmeans_oracle_sql(4, 3, 64))
def x108(spark, sf):
    """Hash-VERIFIED distributed k-means (k=4, 3 Lloyd iterations): the
    deterministic-trajectory variant (first-k init, dist² and centers
    quantized to 1e-6, cid tie-break) lets DuckDB replay the identical
    iteration path and match every assignment — the x83 fixed-iteration
    discipline applied to clustering.  The Arrow/NumPy kmeans (x55)
    stays as the raw-throughput twin; this entry proves the algorithm's
    semantics value-for-value."""
    from ..operators.clustering import kmeans_verifiable

    emb = load_emb(spark, sf)
    return (kmeans_verifiable(emb, "vec_id", "embedding", k=4, iters=3)
            .orderBy("vec_id"))



@x("x109_incremental_dedup", """
WITH d AS (
  SELECT doc_id, lower(text) AS t FROM documents
), hs AS (
  SELECT doc_id,
         list_transform(
           list_transform(range(1, greatest(length(t) - 4, 1) + 1),
                          i -> substring(t, i, 5)),
           s -> CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT)) AS hv
  FROM d
), sig AS (
  SELECT doc_id,
         list_transform(range(0, 16), i -> list_min(
           list_transform(hv,
             h -> (h * (2*i + 1) + 7919*i) % 2305843009213693951))) AS sg
  FROM hs
)
SELECT a.doc_id AS delta_id, b.doc_id AS corpus_id,
       list_sum(list_transform(range(1, 17),
         i -> CASE WHEN a.sg[i] = b.sg[i] THEN 1 ELSE 0 END)) / 16.0
         AS est_jaccard
FROM sig a JOIN sig b ON a.doc_id >= 400 AND b.doc_id < 400
WHERE (list_slice(a.sg, 1, 4) = list_slice(b.sg, 1, 4)
    OR list_slice(a.sg, 5, 8) = list_slice(b.sg, 5, 8)
    OR list_slice(a.sg, 9, 12) = list_slice(b.sg, 9, 12)
    OR list_slice(a.sg, 13, 16) = list_slice(b.sg, 13, 16))
  AND list_sum(list_transform(range(1, 17),
        i -> CASE WHEN a.sg[i] = b.sg[i] THEN 1 ELSE 0 END)) / 16.0 >= 0.5
ORDER BY delta_id, corpus_id""")
def x109(spark, sf):
    """Incremental dedup: docs ≥ 400 are "today's delta", docs < 400 the
    standing corpus — near-dups are found delta-vs-corpus ONLY (the
    broadcast banded delta probes the corpus scan map-side; corpus
    buckets nobody probes never shuffle), which is how dedup actually
    runs against a 100 TB lake.  Portable md5 MinHash family → the
    oracle re-derives every signature, band collision and estimate."""
    from ..operators.dedup import incremental_near_dups_md5

    docs = load_docs(spark, sf)
    delta = docs.filter(F.col("doc_id") >= 400)
    corpus = docs.filter(F.col("doc_id") < 400)
    return (incremental_near_dups_md5(delta, corpus, "doc_id", "text",
                                      threshold=0.5)
            .orderBy("delta_id", "corpus_id"))


@x("x110_rolling_distinct", """
WITH r AS (
  SELECT user_id,
         COUNT(DISTINCT event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS w_nd
  FROM events
)
SELECT user_id,
       CAST(MAX(w_nd) AS BIGINT) AS max_window_types,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM r GROUP BY user_id ORDER BY user_id""")
def x110(spark, sf):
    """Rolling DISTINCT count over a bounded row window — Spark has no
    COUNT(DISTINCT) OVER, so it's spelled ``size(collect_set() over w)``:
    the frame is ROWS-bounded (≤10 elements of state per row, never the
    whole partition) and the window is keyed by user_id, so the single
    hash exchange is on the natural key and the per-task state is O(frame).
    The same exchange is reused by the groupBy that follows (same key)."""
    ev = load(spark, sf, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-9, 0))
    return (ev.withColumn("w_nd", F.size(F.collect_set("event_type").over(w)))
              .groupBy("user_id")
              .agg(F.max("w_nd").cast("long").alias("max_window_types"),
                   F.count(F.lit(1)).alias("n_events"))
              .orderBy("user_id"))


@x("x111_decayed_engagement", """
WITH mx AS (SELECT MAX(ts) AS m FROM events)
SELECT user_id,
       ROUND(SUM(value * exp(-((epoch_us(m) - epoch_us(ts)) / 86400e6)
                             / 7.0)), 4) AS decayed_score,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events, mx
GROUP BY user_id ORDER BY user_id""")
def x111(spark, sf):
    """Time-decayed engagement score: weight = exp(-age/7 days) relative
    to the corpus max timestamp.  The reference point is ONE scalar
    (broadcast cross join of a 1-row aggregate — the PageRank dangling-
    mass pattern), ages are exact integer microsecond diffs (unix_micros
    ↔ DuckDB epoch_us), and the rest is a single map-side-combined
    groupBy.  No window, no second scan of the fact table at scale."""
    ev = load(spark, sf, "events")
    mx = ev.agg(F.max("ts").alias("m"))
    return (ev.crossJoin(F.broadcast(mx))
              .groupBy("user_id")
              .agg(F.round(F.sum(
                      F.col("value") * F.exp(
                          -((F.unix_micros("m") - F.unix_micros("ts"))
                            / F.lit(86400e6)) / F.lit(7.0))), 4)
                    .alias("decayed_score"),
                   F.count(F.lit(1)).alias("n_events"))
              .orderBy("user_id"))


@x("x112_cdc_apply", """
WITH ch AS (
  SELECT user_id AS c_custkey, ts, event_id,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         ROUND(value * 100, 2) AS c_acctbal
  FROM events
), eff AS (
  SELECT c_custkey, op, c_acctbal,
         row_number() OVER (PARTITION BY c_custkey
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM ch
), e1 AS (SELECT * FROM eff WHERE rn = 1)
SELECT COALESCE(e.c_custkey, c.c_custkey) AS c_custkey,
       ROUND(CASE WHEN e.c_custkey IS NOT NULL THEN e.c_acctbal
                  ELSE c.c_acctbal END, 2) AS c_acctbal
FROM customer c FULL JOIN e1 e USING (c_custkey)
WHERE e.op IS NULL OR e.op <> 'D'
ORDER BY c_custkey""")
def x112(spark, sf):
    """CDC changelog apply (Delta-style MERGE / APPLY CHANGES on raw
    parquet): events become a keyed changelog (error = delete, anything
    else = upsert of the latest value), reduced last-wins per key by
    (ts, event_id), then full-outer resolved onto the customer snapshot.
    Both shuffles hash on c_custkey, so the exchange from the last-wins
    window is reused by the join; the changelog side broadcasts under AQE
    when small.  operators/cdc.py::apply_changes."""
    from ..operators.cdc import apply_changes

    snap = (load(spark, sf, "customer")
            .select("c_custkey", F.round("c_acctbal", 2).alias("c_acctbal")))
    ch = (load(spark, sf, "events")
          .select(F.col("user_id").alias("c_custkey"), "ts", "event_id",
                  F.when(F.col("event_type") == "error", F.lit("D"))
                   .otherwise(F.lit("U")).alias("op"),
                  F.round(F.col("value") * 100, 2).alias("c_acctbal")))
    nxt = apply_changes(snap, ch, keys=["c_custkey"],
                        seq_cols=["ts", "event_id"], op_col="op")
    return (nxt.select("c_custkey", F.round("c_acctbal", 2)
                       .alias("c_acctbal"))
               .orderBy("c_custkey"))


@x("x113_interval_join", """
WITH a AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         MIN(epoch_us(ts)) AS a_s, MAX(epoch_us(ts)) AS a_e
  FROM events GROUP BY user_id, CAST(ts AS DATE)
), b AS (
  SELECT event_id, epoch_us(ts) - 1800000000 AS b_s,
         epoch_us(ts) + 1800000000 AS b_e
  FROM events WHERE event_type = 'error'
)
SELECT a.user_id,
       CAST(COUNT(DISTINCT a.d) AS BIGINT) AS n_days_hit,
       CAST(COUNT(*) AS BIGINT) AS n_overlaps
FROM a JOIN b ON a.a_s <= b.b_e AND b.b_s <= a.a_e
GROUP BY a.user_id ORDER BY a.user_id""")
def x113(spark, sf):
    """Interval overlap join at scale: per-user daily activity spans ×
    ±30 min incident windows around error events.  The oracle writes the
    inequality join directly (DuckDB plans IEJoin); Spark would plan a
    BroadcastNestedLoopJoin for that, so the engine uses the bucketized
    equi-join instead — explode to 1 h buckets, hash-join on the bucket,
    exact predicate re-check, canonical-bucket emission (no distinct).
    operators/intervals.py::interval_overlap_join."""
    from ..operators.intervals import interval_overlap_join

    ev = load(spark, sf, "events").withColumn("__us", F.unix_micros("ts"))
    a = (ev.groupBy("user_id", F.to_date("ts").alias("d"))
           .agg(F.min("__us").alias("a_s"), F.max("__us").alias("a_e")))
    b = (ev.filter(F.col("event_type") == "error")
           .select("event_id", (F.col("__us") - 1_800_000_000).alias("b_s"),
                   (F.col("__us") + 1_800_000_000).alias("b_e")))
    pairs = interval_overlap_join(a, b, "a_s", "a_e", "b_s", "b_e")
    return (pairs.groupBy("user_id")
                 .agg(F.countDistinct("d").alias("n_days_hit"),
                      F.count(F.lit(1)).alias("n_overlaps"))
                 .orderBy("user_id"))


def _bpe_oracle_sql(iters: int = 5) -> str:
    """Unrolled BPE merge iterations as DuckDB CTEs (the _kmeans_oracle_sql
    discipline): pair counts from the word-frequency table, argmax with
    (count DESC, pair-key) tie-break, and the same 2-pass delimited-string
    replace the engine uses (operators/bpe.py documents the exact merge
    semantics, including the self-pair variant)."""
    parts = _bpe_cte_parts(iters)
    final = "\nUNION ALL\n".join(
        f"SELECT {t} AS it, a AS sym_a, b AS sym_b, CAST(c AS BIGINT) AS freq "
        f"FROM t{t}" for t in range(1, iters + 1))
    return "WITH " + ",\n".join(parts) + "\n" + final + "\nORDER BY it"


def _bpe_cte_parts(iters: int, skip_w: bool = False) -> list[str]:
    """Shared CTE chain: word freqs → delimited char sequences → per-
    iteration (pair counts, argmax pair, 2-pass merge).  The word column
    rides along so the encode oracle (x119) can map word → tokens.
    ``skip_w`` omits the ``w`` CTE so the chain can share another
    builder's word table (x205 composes both tokenizer chains over the
    unigram builder's length-capped ``w``)."""
    parts = [] if skip_w else ["""w AS (
  SELECT word, COUNT(*) AS cnt
  FROM (SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS word
        FROM documents)
  WHERE word <> '' GROUP BY word
)"""]
    parts.append("""s0 AS (
  SELECT word, cnt,
         chr(30) || array_to_string(
           list_transform(range(1, length(word) + 1),
                          i -> substr(word, i, 1)), chr(30)) || chr(30) AS s
  FROM w
)""")
    for t in range(1, iters + 1):
        parts.append(f"""c{t} AS (
  SELECT p, SUM(cnt) AS c FROM (
    SELECT cnt, unnest(list_transform(range(1, len(l)),
                       i -> l[i] || chr(31) || l[i+1])) AS p
    FROM (SELECT cnt, list_filter(string_split(s, chr(30)),
                                  x -> x <> '') AS l FROM s{t-1})
  ) GROUP BY p
)""")
        parts.append(f"""t{t} AS (
  SELECT string_split(p, chr(31))[1] AS a, string_split(p, chr(31))[2] AS b,
         c
  FROM c{t} ORDER BY c DESC, p LIMIT 1
)""")
        parts.append(f"""s{t} AS (
  SELECT word, cnt,
         replace(replace(s, chr(30) || a || chr(30) || b || chr(30),
                            chr(30) || a || b || chr(30)),
                 chr(30) || a || chr(30) || b || chr(30),
                 chr(30) || a || b || chr(30)) AS s
  FROM s{t - 1}, t{t}
)""")
    return parts


@x("x114_bpe_train", _bpe_oracle_sql(5))
def x114(spark, sf):
    """BPE merge training: one corpus-wide word-frequency pass, then
    the merge loop runs DRIVER-SIDE over the collected vocabulary-sized
    table (Sennrich's in-memory regime — a real 32k-merge vocab would
    otherwise be 32k sequential Spark jobs; VERDICT r8).  Bit-equal to
    the distributed iteration (operators/bpe.py::learn_bpe_merges, the
    property-tested twin), so the oracle — which replays the identical
    deterministic trajectory — hashes unchanged.
    operators/bpe.py::learn_bpe_merges_local."""
    from ..operators.bpe import bpe_merge_table_local

    docs = load_docs(spark, sf)
    return bpe_merge_table_local(spark, docs, iters=5).orderBy("it")


@x("x115_audio_features", """
WITH a AS (
  SELECT doc_id, octet_length(encode(text)) AS n,
         hex(encode(substring(text, 1, 64))) AS hx
  FROM documents
), b AS (
  SELECT doc_id, n,
         least(n, 64) AS l64,
         COALESCE(list_sum(list_transform(range(1, least(n, 64) + 1),
                  i -> CAST(('0x' || substr(hx, 2*i - 1, 2)) AS INT))), 0)
           AS s64
  FROM a
)
SELECT doc_id,
       CAST((n // 2) * 1000 // 16000 AS INT) AS duration_ms,
       CAST(n // 2 AS INT) AS n_samples,
       CASE WHEN n = 0 THEN 0.0
            ELSE round_even(s64 / (CASE WHEN l64 < 1 THEN 1 ELSE l64 END)
                            / 255.0, 6) END AS rms
FROM b ORDER BY doc_id""")
def x115(spark, sf):
    """Audio feature plumbing with the deterministic fake decoder:
    binary → mapInPandas → (duration_ms, n_samples, rms).  Oracle-checked
    the x18 way: the fake features are pure functions of the payload
    BYTES (length and first-64-byte mean), which DuckDB re-derives from
    hex(encode(...)) byte-exactly — so the Arrow-batch plumbing's output
    is verified value-for-value.  round_even matches Python's banker's
    rounding.  operators/multimodal.py::extract_audio_features."""
    from ..operators.multimodal import extract_audio_features

    docs = (load(spark, sf, "documents")
            .select("doc_id", F.encode("text", "UTF-8").alias("content")))
    return (extract_audio_features(docs, "content", fake_decode=True)
            .orderBy("doc_id"))


@x("x116_video_frames", """
SELECT doc_id, CAST(f AS INT) AS frame_idx,
       CAST(f * 1000 AS INT) AS frame_ts_ms
FROM (SELECT doc_id, octet_length(encode(text)) % 10 + 1 AS nf
      FROM documents),
     unnest(range(0, nf)) AS t(f)
ORDER BY doc_id, frame_idx""")
def x116(spark, sf):
    """Video frame-sampling plumbing: one row per sampled frame
    (explode of a per-payload frame count — the real partition-expansion
    shape; the decode itself is the documented deterministic stub).
    operators/multimodal.py::sample_video_frames."""
    from ..operators.multimodal import sample_video_frames

    docs = (load(spark, sf, "documents")
            .select("doc_id", F.encode("text", "UTF-8").alias("content")))
    return (sample_video_frames(docs, "content", every_n_ms=1000)
            .select("doc_id", F.col("frame_idx").cast("int"),
                    F.col("frame_ts_ms").cast("int"))
            .orderBy("doc_id", "frame_idx"))


@x("x117_copurchase", """
WITH it AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS p1, b.l_partkey AS p2,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM it a JOIN it b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY a.l_partkey, b.l_partkey
ORDER BY n_orders DESC, p1, p2 LIMIT 20""")
def x117(spark, sf):
    """Market-basket co-occurrence mining: part pairs ordered together.
    The self-join is keyed on l_orderkey (one hash shuffle, reused by
    both sides), and the per-order pair blowup is bounded by the max
    basket size squared — never corpus-quadratic.  Top-k with full
    deterministic tie-break."""
    it = (load(spark, sf, "lineitem")
          .select("l_orderkey", "l_partkey").distinct())
    a = it.alias("a")
    b = it.alias("b")
    pairs = a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                   & (F.col("a.l_partkey") < F.col("b.l_partkey")))
    return (pairs.groupBy(F.col("a.l_partkey").alias("p1"),
                          F.col("b.l_partkey").alias("p2"))
                 .agg(F.count(F.lit(1)).alias("n_orders"))
                 .orderBy(F.desc("n_orders"), "p1", "p2").limit(20))


@x("x118_impute", """
WITH base AS (
  SELECT user_id, event_type, value,
         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
  FROM events
), med AS (
  SELECT user_id, ROUND(median(v), 4) AS m
  FROM base WHERE v IS NOT NULL GROUP BY user_id
)
SELECT b.user_id,
       CAST(COUNT(*) FILTER (WHERE b.v IS NULL) AS BIGINT) AS n_imputed,
       ROUND(SUM(COALESCE(b.v, m.m)), 4) AS total_after,
       ROUND(MAX(m.m), 4) AS fill_value
FROM base b JOIN med m ON b.user_id = m.user_id
GROUP BY b.user_id ORDER BY b.user_id""")
def x118(spark, sf):
    """Missing-value imputation: error events' values are treated as
    missing and filled with the per-user EXACT median of the rest.  The
    median table is one aggregate over the fact (exact `median`, a JVM
    sort-based agg per group), broadcast back onto the fact under AQE —
    the standard fill-from-group-statistic cleaning pass.  Both the join
    and the final rollup hash on user_id (exchange reuse)."""
    ev = load(spark, sf, "events").select(
        "user_id", "event_type", "value",
        F.when(F.col("event_type") == "error", F.lit(None))
         .otherwise(F.col("value")).alias("v"))
    med = (ev.filter(F.col("v").isNotNull())
             .groupBy("user_id")
             .agg(F.round(F.median("v"), 4).alias("m")))
    return (ev.join(med, "user_id")
              .groupBy("user_id")
              .agg(F.count_if(F.col("v").isNull()).alias("n_imputed"),
                   F.round(F.sum(F.coalesce("v", "m")), 4)
                    .alias("total_after"),
                   F.round(F.max("m"), 4).alias("fill_value"))
              .orderBy("user_id"))


def _bpe_encode_oracle_sql(iters: int = 5) -> str:
    parts = _bpe_cte_parts(iters)
    parts.append(f"""tok AS (
  SELECT word,
         len(list_filter(string_split(s, chr(30)), x -> x <> ''))
           AS n_tokens
  FROM s{iters}
)""")
    parts.append("""dw AS (
  SELECT lang, word FROM (
    SELECT lang, unnest(regexp_split_to_array(lower(text), '[^a-z]+'))
           AS word
    FROM documents)
  WHERE word <> ''
)""")
    return ("WITH " + ",\n".join(parts) + """
SELECT dw.lang,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(tok.n_tokens) AS BIGINT) AS n_tokens,
       ROUND(SUM(tok.n_tokens) * 1.0 / COUNT(*), 6) AS tokens_per_word
FROM dw JOIN tok ON dw.word = tok.word
GROUP BY dw.lang ORDER BY dw.lang""")


@x("x119_bpe_encode", _bpe_encode_oracle_sql(5))
def x119(spark, sf):
    """BPE corpus encoding with the x114-learned merges: the merge chain
    compiles to ONE static JVM replace expression over the VOCAB (map-
    only, whole-stage codegen), and the corpus is tokenized by size-gated-
    broadcast-joining exploded words onto that (word → n_tokens) table —
    broadcast while the vocab is megabytes, shuffle join past the gate
    (web-corpus distinct words run 10⁷–10⁸ rows).
    operators/bpe.py::bpe_encode_vocab."""
    from ..operators.bpe import (bpe_encode_vocab,
                                 learn_bpe_merges_local,
                                 word_frequencies)
    from ..util import gated_broadcast

    docs = load_docs(spark, sf)
    words = word_frequencies(docs)
    merges = learn_bpe_merges_local(words, iters=5)
    tok = bpe_encode_vocab(words.select("word"), merges)
    dw = (docs.select("lang", F.explode(F.split(F.lower("text"),
                                                "[^a-z]+")).alias("word"))
              .filter(F.col("word") != ""))
    # the (word → n_tokens) table is corpus-VOCABULARY-sized (10⁷–10⁸
    # distinct words on a web corpus) — size-gated, not unconditional;
    # size evidence from the plain word table (estimating tok would
    # re-optimize the merge-chain replace expression per call)
    return (dw.join(gated_broadcast(tok, probe=words.select("word")),
                    "word")
              .groupBy("lang")
              .agg(F.count(F.lit(1)).alias("n_words"),
                   F.sum("n_tokens").alias("n_tokens"),
                   F.round(F.sum("n_tokens") / F.count(F.lit(1)), 6)
                    .alias("tokens_per_word"))
              .orderBy("lang"))


@x("x120_assoc_rules", """
WITH it AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n_ord AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM lineitem),
sup AS (SELECT l_partkey, COUNT(*) AS n_p FROM it GROUP BY l_partkey),
pairs AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_pair
  FROM it a JOIN it b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= 2
)
SELECT p.p1 AS antecedent, p.p2 AS consequent,
       CAST(p.n_pair AS BIGINT) AS support,
       ROUND(p.n_pair * 1.0 / s1.n_p, 6) AS confidence,
       ROUND((p.n_pair * 1.0 / s1.n_p) / (s2.n_p * 1.0 / n_ord.n), 6)
         AS lift
FROM pairs p
JOIN sup s1 ON p.p1 = s1.l_partkey
JOIN sup s2 ON p.p2 = s2.l_partkey, n_ord
ORDER BY lift DESC, support DESC, antecedent, consequent LIMIT 15""")
def x120(spark, sf):
    """Association rules from co-purchase pairs: support / confidence /
    lift with a min-support prune BEFORE the metric joins (the Apriori
    candidate cut).  Directional pairs come from the same order-keyed
    self-join as x117; the per-part support table and the 1-row order
    count are broadcast.  Deterministic multi-key tie-break."""
    it = (load(spark, sf, "lineitem")
          .select("l_orderkey", "l_partkey").distinct())
    n_ord = it.select("l_orderkey").distinct().count()
    sup = it.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_p"))
    a, b = it.alias("a"), it.alias("b")
    pairs = (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                    & (F.col("a.l_partkey") != F.col("b.l_partkey")))
             .groupBy(F.col("a.l_partkey").alias("p1"),
                      F.col("b.l_partkey").alias("p2"))
             .agg(F.count(F.lit(1)).alias("n_pair"))
             .filter(F.col("n_pair") >= 2))
    s1 = F.broadcast(sup.select(F.col("l_partkey").alias("p1"),
                                F.col("n_p").alias("n_p1")))
    s2 = F.broadcast(sup.select(F.col("l_partkey").alias("p2"),
                                F.col("n_p").alias("n_p2")))
    conf = F.col("n_pair") / F.col("n_p1")
    return (pairs.join(s1, "p1").join(s2, "p2")
            .select(F.col("p1").alias("antecedent"),
                    F.col("p2").alias("consequent"),
                    F.col("n_pair").alias("support"),
                    F.round(conf, 6).alias("confidence"),
                    F.round(conf / (F.col("n_p2") / F.lit(n_ord)), 6)
                     .alias("lift"))
            .orderBy(F.desc("lift"), F.desc("support"),
                     "antecedent", "consequent").limit(15))


@x("x121_decile_lift", """
WITH sp AS (
  SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS spend
  FROM orders GROUP BY o_custkey
), r AS (
  SELECT spend,
         row_number() OVER (ORDER BY spend DESC, o_custkey) - 1 AS rk,
         COUNT(*) OVER () AS n
  FROM sp
), agg AS (
  SELECT CAST(rk * 10 // n + 1 AS INT) AS decile,
         COUNT(*) AS n_cust, SUM(spend) AS rev
  FROM r GROUP BY 1
)
SELECT decile, CAST(n_cust AS BIGINT) AS n_customers,
       ROUND(rev, 2) AS revenue,
       ROUND(rev / SUM(rev) OVER (), 6) AS rev_share,
       ROUND(SUM(rev) OVER (ORDER BY decile) / SUM(rev) OVER (), 6)
         AS cum_share
FROM agg ORDER BY decile""")
def x121(spark, sf):
    """Decile lift / gains table (model-eval analytics): customers ranked
    by total spend, cut into population deciles, per-decile revenue share
    and cumulative share.  The global rank is the x42 distributed prefix
    sum (range partition + per-partition offsets — never a single-
    partition window over the customer table); deciles use the explicit
    floor(rank*10/n) cut on BOTH engines (NTILE's uneven-remainder rule
    is avoided).  The only ordered windows run on the 10-row decile
    aggregate."""
    from ..operators.curriculum import _global_position

    sp = (load(spark, sf, "orders")
          .groupBy("o_custkey")
          .agg(F.round(F.sum("o_totalprice"), 2).alias("spend")))
    r = _global_position(sp, [F.col("spend").desc(), F.col("o_custkey")],
                         "rk", size_col="n")
    agg = (r.withColumn("decile", (F.floor(F.col("rk") * 10 / F.col("n"))
                                   + 1).cast("int"))
            .groupBy("decile")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.sum("spend").alias("rev")))
    w_all = Window.partitionBy()                       # 10-row aggregate
    w_cum = (Window.partitionBy().orderBy("decile")    # 10-row aggregate
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (agg.select("decile", "n_customers",
                       F.round("rev", 2).alias("revenue"),
                       F.round(F.col("rev") / F.sum("rev").over(w_all), 6)
                        .alias("rev_share"),
                       F.round(F.sum("rev").over(w_cum)
                               / F.sum("rev").over(w_all), 6)
                        .alias("cum_share"))
               .orderBy("decile"))


@x("x122_winsorize", """
WITH q AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.10) AS lo,
         quantile_cont(l_extendedprice, 0.90) AS hi
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       ROUND(AVG(l.l_extendedprice), 4) AS mean_raw,
       ROUND(AVG(LEAST(GREATEST(l.l_extendedprice, q.lo), q.hi)), 4)
         AS mean_winsorized,
       CAST(COUNT(*) FILTER (WHERE l.l_extendedprice < q.lo
                                OR l.l_extendedprice > q.hi) AS BIGINT)
         AS n_clipped
FROM lineitem l JOIN q ON l.l_returnflag = q.l_returnflag
GROUP BY l.l_returnflag ORDER BY l.l_returnflag""")
def x122(spark, sf):
    """Winsorization (outlier clipping at exact p10/p90 per group): the
    quantile table is one exact-percentile aggregate (Spark `percentile`
    == DuckDB quantile_cont, both linear interpolation), broadcast back
    onto the fact; clip + re-aggregate is map-side.  The standard robust-
    statistics cleaning pass, same fill-from-group-statistic shape as
    x118."""
    li = load(spark, sf, "lineitem")
    q = (li.groupBy("l_returnflag")
           .agg(F.expr("percentile(l_extendedprice, 0.10)").alias("lo"),
                F.expr("percentile(l_extendedprice, 0.90)").alias("hi")))
    clipped = F.least(F.greatest(F.col("l_extendedprice"), F.col("lo")),
                      F.col("hi"))
    return (li.join(F.broadcast(q), "l_returnflag")
              .groupBy("l_returnflag")
              .agg(F.round(F.avg("l_extendedprice"), 4).alias("mean_raw"),
                   F.round(F.avg(clipped), 4).alias("mean_winsorized"),
                   F.count_if((F.col("l_extendedprice") < F.col("lo"))
                              | (F.col("l_extendedprice") > F.col("hi")))
                    .alias("n_clipped"))
              .orderBy("l_returnflag"))


@x("x123_scd2", """
SELECT user_id, ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       ROUND(value, 2) AS value,
       CAST(CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END AS INT)
         AS is_current
FROM events
WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, valid_from""")
def x123(spark, sf):
    """Slowly-changing-dimension Type 2 build: each profile update
    (purchase event) becomes a versioned row with a [valid_from,
    valid_to) interval from lead() over the per-key change sequence —
    one window shuffle keyed by user_id, the standard warehouse
    versioning pass.  Pairs with x112: CDC apply materializes current
    state, SCD2 keeps the full history."""
    ev = load(spark, sf, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (ev.select("user_id", F.col("ts").alias("valid_from"),
                      F.lead("ts").over(w).alias("valid_to"),
                      F.round("value", 2).alias("value"),
                      F.when(F.lead("ts").over(w).isNull(), 1)
                       .otherwise(0).cast("int").alias("is_current"))
              .orderBy("user_id", "valid_from"))


@x("x124_activity_streaks", """
WITH d AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), g AS (
  SELECT user_id, d,
         d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                  AS INT) AS anchor
  FROM d
), s AS (
  SELECT user_id, anchor, COUNT(*) AS len FROM g GROUP BY user_id, anchor
)
SELECT user_id,
       CAST(SUM(len) AS BIGINT) AS n_active_days,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(MAX(len) AS BIGINT) AS max_streak
FROM s GROUP BY user_id ORDER BY user_id""")
def x124(spark, sf):
    """Gaps-and-islands: consecutive-day activity streaks per user via
    the date-minus-rank anchor trick — the window, the island rollup and
    the final aggregate all hash on user_id (one exchange, reused).
    Classic engagement analytics shape (longest streak / streak count)."""
    ev = load(spark, sf, "events")
    d = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    g = d.withColumn("anchor",
                     F.date_sub("d", F.row_number().over(w)))
    s = g.groupBy("user_id", "anchor").agg(F.count(F.lit(1)).alias("len"))
    return (s.groupBy("user_id")
             .agg(F.sum("len").alias("n_active_days"),
                  F.count(F.lit(1)).alias("n_streaks"),
                  F.max("len").alias("max_streak"))
             .orderBy("user_id"))


@x("x125_snapshot_diff", """
WITH ch AS (
  SELECT user_id AS c_custkey, ts, event_id,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         ROUND(value * 100, 2) AS c_acctbal
  FROM events
), eff AS (
  SELECT c_custkey, op, c_acctbal,
         row_number() OVER (PARTITION BY c_custkey
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM ch
), e1 AS (SELECT * FROM eff WHERE rn = 1),
nxt AS (
  SELECT COALESCE(e.c_custkey, c.c_custkey) AS c_custkey,
         ROUND(CASE WHEN e.c_custkey IS NOT NULL THEN e.c_acctbal
                    ELSE c.c_acctbal END, 2) AS c_acctbal
  FROM customer c FULL JOIN e1 e USING (c_custkey)
  WHERE e.op IS NULL OR e.op <> 'D'
), old AS (
  SELECT c_custkey, ROUND(c_acctbal, 2) AS c_acctbal FROM customer
)
SELECT CAST(COUNT(*) FILTER (WHERE o.c_custkey IS NULL) AS BIGINT)
         AS n_added,
       CAST(COUNT(*) FILTER (WHERE n.c_custkey IS NULL) AS BIGINT)
         AS n_removed,
       CAST(COUNT(*) FILTER (WHERE o.c_custkey IS NOT NULL
              AND n.c_custkey IS NOT NULL
              AND o.c_acctbal <> n.c_acctbal) AS BIGINT) AS n_changed,
       CAST(COUNT(*) FILTER (WHERE o.c_custkey IS NOT NULL
              AND n.c_custkey IS NOT NULL
              AND o.c_acctbal = n.c_acctbal) AS BIGINT) AS n_unchanged
FROM old o FULL JOIN nxt n USING (c_custkey)""")
def x125(spark, sf):
    """Snapshot diff / reconciliation audit: the x112 CDC-applied state
    vs the original snapshot, classified into added / removed / changed /
    unchanged by ONE key-partitioned full-outer join folded straight into
    conditional counts (no materialized diff rows; at 100 TB the answer
    is 4 numbers, not a third table)."""
    from ..operators.cdc import apply_changes

    snap = (load(spark, sf, "customer")
            .select("c_custkey", F.round("c_acctbal", 2).alias("c_acctbal")))
    ch = (load(spark, sf, "events")
          .select(F.col("user_id").alias("c_custkey"), "ts", "event_id",
                  F.when(F.col("event_type") == "error", F.lit("D"))
                   .otherwise(F.lit("U")).alias("op"),
                  F.round(F.col("value") * 100, 2).alias("c_acctbal")))
    nxt = (apply_changes(snap, ch, keys=["c_custkey"],
                         seq_cols=["ts", "event_id"], op_col="op")
           .select("c_custkey", F.round("c_acctbal", 2).alias("nb")))
    old = snap.select("c_custkey", F.col("c_acctbal").alias("ob"))
    j = old.join(nxt, "c_custkey", "full_outer")
    both = F.col("ob").isNotNull() & F.col("nb").isNotNull()
    return j.agg(
        F.count_if(F.col("ob").isNull()).alias("n_added"),
        F.count_if(F.col("nb").isNull()).alias("n_removed"),
        F.count_if(both & (F.col("ob") != F.col("nb"))).alias("n_changed"),
        F.count_if(both & (F.col("ob") == F.col("nb")))
         .alias("n_unchanged"))


@x("x126_ref_integrity", """
SELECT 'orders.o_custkey->customer' AS fk,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT)
         AS n_orphans
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
UNION ALL
SELECT 'lineitem.l_orderkey->orders',
       CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) FILTER (WHERE od.o_orderkey IS NULL) AS BIGINT)
FROM lineitem l LEFT JOIN orders od ON l.l_orderkey = od.o_orderkey
UNION ALL
SELECT 'lineitem.l_partkey->part',
       CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) FILTER (WHERE p.p_partkey IS NULL) AS BIGINT)
FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
ORDER BY fk""")
def x126(spark, sf):
    """Referential-integrity audit: orphan counts for three FK edges via
    left joins folded into conditional counts.  Each parent key set is a
    broadcast-eligible dimension (AQE decides); the fact tables stream
    through map-side — the whole audit is one pass per edge with a 1-row
    result, the shape that survives a 100 TB fact table."""
    def edge(fact, fk, dim, pk, label):
        d = dim.select(F.col(pk).alias("__pk")).distinct()
        return (fact.join(F.broadcast(d), F.col(fk) == F.col("__pk"),
                          "left")
                .agg(F.count(F.lit(1)).alias("n_rows"),
                     F.count_if(F.col("__pk").isNull()).alias("n_orphans"))
                .select(F.lit(label).alias("fk"), "n_rows", "n_orphans"))
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    p = load(spark, sf, "part")
    return (edge(o, "o_custkey", c, "c_custkey",
                 "orders.o_custkey->customer")
            .unionAll(edge(li, "l_orderkey", o, "o_orderkey",
                           "lineitem.l_orderkey->orders"))
            .unionAll(edge(li, "l_partkey", p, "p_partkey",
                           "lineitem.l_partkey->part"))
            .orderBy("fk"))


@x("x127_ohlc_bars", """
SELECT event_type,
       CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bar,
       ROUND(arg_min(value, printf('%020d-%012d', epoch_us(ts), event_id)),
             2) AS open,
       ROUND(MAX(value), 2) AS high,
       ROUND(MIN(value), 2) AS low,
       ROUND(arg_max(value, printf('%020d-%012d', epoch_us(ts), event_id)),
             2) AS close,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY event_type, date_trunc('hour', ts)
HAVING COUNT(*) >= 3
ORDER BY event_type, bar LIMIT 500""")
def x127(spark, sf):
    """OHLC candle bars (time-series downsampling): open/close via
    min_by/max_by over a deterministic zero-padded (µs, event_id) sort
    key (portable across engines — DuckDB's arg_min rejects struct keys),
    high/low plain MIN/MAX — ONE partial-aggregating pass, no window, no
    sort of the fact table; the classic market-data rollup every metrics
    store implements."""
    ev = load(spark, sf, "events")
    seq = F.format_string("%020d-%012d", F.unix_micros("ts"),
                          F.col("event_id"))
    return (ev.groupBy("event_type",
                       F.date_trunc("hour", "ts").alias("bar"))
              .agg(F.round(F.min_by("value", seq), 2).alias("open"),
                   F.round(F.max("value"), 2).alias("high"),
                   F.round(F.min("value"), 2).alias("low"),
                   F.round(F.max_by("value", seq), 2).alias("close"),
                   F.count(F.lit(1)).alias("n"))
              .filter(F.col("n") >= 3)
              .orderBy("event_type", "bar").limit(500))


@x("x128_topk_ties", """
SELECT c_mktsegment, c_custkey, ROUND(c_acctbal, 2) AS bal,
       CAST(rnk AS INT) AS rnk
FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         rank() OVER (PARTITION BY c_mktsegment
                      ORDER BY ROUND(c_acctbal, 2) DESC) AS rnk
  FROM customer
) WHERE rnk <= 3
ORDER BY c_mktsegment, rnk, c_custkey""")
def x128(spark, sf):
    """Top-k per group KEEPING ties (RANK, not ROW_NUMBER — a different
    result set when balances collide at the cut line): the tie-aware
    variant of x34's per-group top-k.  Ranking over the rounded value so
    tie semantics are identical across engines' float formatting."""
    c = load(spark, sf, "customer")
    w = (Window.partitionBy("c_mktsegment")
         .orderBy(F.round("c_acctbal", 2).desc()))
    return (c.withColumn("rnk", F.rank().over(w))
             .filter(F.col("rnk") <= 3)
             .select("c_mktsegment", "c_custkey",
                     F.round("c_acctbal", 2).alias("bal"),
                     F.col("rnk").cast("int"))
             .orderBy("c_mktsegment", "rnk", "c_custkey"))


def _lpa_oracle_sql(iters: int = 3) -> str:
    """DuckDB twin of x129: the x83 bigram-Jaccard pair graph, then
    ``iters`` synchronous label-propagation rounds unrolled (argmax
    neighbor label, count DESC then label ASC — exactly
    operators/graph.py::label_propagation's tie rule)."""
    step = """s{j} AS (
  SELECT e.dst AS node, l.label, COUNT(*) AS c
  FROM e JOIN l{i} l ON e.src = l.node GROUP BY e.dst, l.label
), l{j} AS (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node
                              ORDER BY c DESC, label ASC) AS rn
    FROM s{j}) WHERE rn = 1
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
), l0 AS (
  SELECT DISTINCT src AS node, src AS label FROM e
),
{chain}
SELECT label AS community,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       MIN(node) AS min_node
FROM l{iters} GROUP BY label
ORDER BY n_members DESC, community LIMIT 50"""


@x("x129_communities", _lpa_oracle_sql(3))
def x129(spark, sf):
    """Label-propagation communities over the x83 near-dup graph —
    coarser than x51's connected components (a bridge node joins one
    dense blob instead of merging both).  Fixed synchronous iterations
    with the count-then-min-label tie rule make the trajectory exactly
    replayable; one shuffle per round, lazy checkpoints, no driver data.
    operators/graph.py::label_propagation."""
    from ..operators.graph import label_propagation

    docs = load_docs(spark, sf).filter(F.col("doc_id") < 500)
    pairs = dedup_mod.ngram_jaccard_pairs(docs, "doc_id", "text",
                                          n=2, threshold=0.5)
    labels = label_propagation(pairs.select("id_a", "id_b"), iters=3)
    return (labels.groupBy(F.col("label").alias("community"))
            .agg(F.count(F.lit(1)).alias("n_members"),
                 F.min("node").alias("min_node"))
            .orderBy(F.desc("n_members"), "community").limit(50))


@x("x130_transitions", """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
), t AS (
  SELECT prev, event_type AS next, COUNT(*) AS n
  FROM seq WHERE prev IS NOT NULL GROUP BY prev, event_type
)
SELECT prev, next, CAST(n AS BIGINT) AS n,
       ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY prev), 6) AS p
FROM t ORDER BY n DESC, prev, next LIMIT 25""")
def x130(spark, sf):
    """Event-path analysis: the first-order Markov transition matrix of
    per-user event sequences — lag over the user-keyed window (one hash
    exchange), then a transition rollup whose row-count is bounded by
    |event_type|², so the probability window runs on a 25-row table.
    The clickstream-path building block (next-step prediction, funnel
    discovery)."""
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = (ev.withColumn("prev", F.lag("event_type").over(w))
           .filter(F.col("prev").isNotNull())
           .groupBy("prev", F.col("event_type").alias("next"))
           .agg(F.count(F.lit(1)).alias("n")))
    wp = Window.partitionBy("prev")     # ≤ |event_type|² rows here
    return (t.select("prev", "next", "n",
                     F.round(F.col("n") / F.sum("n").over(wp), 6)
                      .alias("p"))
             .orderBy(F.desc("n"), "prev", "next").limit(25))


@x("x131_survival", """
WITH su AS (
  SELECT user_id, MIN(epoch_us(ts)) AS s_us
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), pu AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us
  FROM events e JOIN su ON e.user_id = su.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > su.s_us
  GROUP BY e.user_id
), mx AS (SELECT MAX(epoch_us(ts)) AS m_us FROM events),
durs AS (
  SELECT su.user_id,
         CAST((COALESCE(pu.p_us, mx.m_us) - su.s_us) // 86400000000
              AS BIGINT) AS dur,
         CASE WHEN pu.p_us IS NULL THEN 0 ELSE 1 END AS ev
  FROM su LEFT JOIN pu ON su.user_id = pu.user_id, mx
), hist AS (
  SELECT dur, SUM(ev) AS d, COUNT(*) AS c FROM durs GROUP BY dur
), km AS (
  SELECT dur, d,
         SUM(c) OVER (ORDER BY dur DESC) AS n_risk
  FROM hist
)
SELECT dur AS day, CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS n_events,
       ROUND(CASE WHEN MIN(1 - d * 1.0 / n_risk) OVER w = 0 THEN 0.0
             ELSE exp(SUM(ln(NULLIF(1 - d * 1.0 / n_risk, 0))) OVER w)
             END, 6) AS survival
FROM km WHERE d > 0
WINDOW w AS (ORDER BY dur)
ORDER BY day""")
def x131(spark, sf):
    """Kaplan–Meier survival: signup → first-purchase time-to-event with
    right-censoring at the corpus horizon.  The heavy work is two
    user-keyed aggregates (first signup, first qualifying purchase) and
    one groupBy(duration); the KM product-limit estimator then runs as
    exp(Σ ln(1−d/n)) windows over the DAY HISTOGRAM (≤ observation-window
    days, here ≤31 rows) — never a window over users.  Survival analysis
    for conversion/retention at 100 TB in three bounded aggregates."""
    ev = load(spark, sf, "events").withColumn("__us", F.unix_micros("ts"))
    su = (ev.filter(F.col("event_type") == "signup")
            .groupBy("user_id").agg(F.min("__us").alias("s_us")))
    pu = (ev.filter(F.col("event_type") == "purchase")
            .join(su, "user_id")
            .filter(F.col("__us") > F.col("s_us"))
            .groupBy("user_id").agg(F.min("__us").alias("p_us")))
    mx = ev.agg(F.max("__us").alias("m_us"))
    durs = (su.join(pu, "user_id", "left").crossJoin(F.broadcast(mx))
            .select(F.floor((F.coalesce("p_us", "m_us") - F.col("s_us"))
                            / F.lit(86_400_000_000)).alias("dur"),
                    F.when(F.col("p_us").isNull(), 0).otherwise(1)
                     .alias("ev")))
    hist = durs.groupBy("dur").agg(F.sum("ev").alias("d"),
                                   F.count(F.lit(1)).alias("c"))
    w_desc = (Window.orderBy(F.desc("dur"))        # ≤31-row histogram
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_asc = (Window.orderBy("dur")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    km = hist.withColumn("n_risk", F.sum("c").over(w_desc))
    term = 1 - F.col("d") / F.col("n_risk")
    # final-day survival can be exactly 0 (everyone at risk converts):
    # ln(0) is out of range, so zero terms go through NULLIF (ignored by
    # the sum — Spark's log(0) is null anyway) and a min-term guard pins
    # the curve to 0.0 from that day on.
    surv = F.when(F.min(term).over(w_asc) == 0, F.lit(0.0)) \
            .otherwise(F.exp(F.sum(F.log(F.nullif(term, F.lit(0))))
                             .over(w_asc)))
    return (km.filter(F.col("d") > 0)
              .select(F.col("dur").alias("day"),
                      F.col("n_risk").cast("long"),
                      F.col("d").cast("long").alias("n_events"),
                      F.round(surv, 6).alias("survival"))
              .orderBy("day"))


@x("x132_bigram_lm", """
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                     x -> x <> '') AS ws
  FROM documents
), uni AS (
  SELECT word, COUNT(*) AS c
  FROM (SELECT unnest(ws) AS word FROM w) GROUP BY word
), v AS (SELECT COUNT(*) AS nv FROM uni),
bi AS (
  SELECT w1, w2, COUNT(*) AS c FROM (
    SELECT ws[i] AS w1, ws[i+1] AS w2
    FROM w, unnest(range(1, len(ws))) AS t(i)
  ) GROUP BY w1, w2
), scored AS (
  SELECT d.doc_id,
         AVG(ln((COALESCE(bi.c, 0) + 1.0) / (uni.c + v.nv))) AS lp,
         COUNT(*) AS n_bi
  FROM (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
        FROM w, unnest(range(1, len(ws))) AS t(i)) d
  JOIN uni ON d.w1 = uni.word
  LEFT JOIN bi ON d.w1 = bi.w1 AND d.w2 = bi.w2, v
  GROUP BY d.doc_id
)
SELECT doc_id, ROUND(lp, 6) AS avg_logprob,
       CAST(n_bi AS BIGINT) AS n_bigrams
FROM scored ORDER BY doc_id""")
def x132(spark, sf):
    """Bigram language-model quality score: add-one-smoothed
    P(w2|w1) trained on the corpus itself, per-doc mean log-probability —
    the statistical-LM quality filter that complements char-entropy (x97)
    and n-gram novelty (x98).  The unigram/bigram count tables are
    corpus-bounded aggregates joined back BY KEY (no broadcast
    assumption: at 100 TB the bigram table is itself large, and the join
    hashes on w1/w2); the vocab size rides as one broadcast scalar."""
    docs = load_docs(spark, sf)
    ws = F.filter(F.split(F.lower("text"), "[^a-z]+"),
                  lambda x: x != F.lit(""))
    w = docs.select("doc_id", ws.alias("ws"))
    pairs = (w.select("doc_id", "ws",
                      F.posexplode(F.slice("ws", 1,
                                           F.greatest(F.size("ws") - 1,
                                                      F.lit(0))))
                      .alias("i", "w1"))
             .select("doc_id", "w1",
                     F.element_at("ws", F.col("i") + 2).alias("w2")))
    uni = (w.select(F.explode("ws").alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("uc")))
    nv = uni.agg(F.count(F.lit(1)).alias("nv"))
    bi = (pairs.groupBy(F.col("w1").alias("b1"), F.col("w2").alias("b2"))
               .agg(F.count(F.lit(1)).alias("bc")))
    scored = (pairs
              .join(uni, pairs.w1 == uni.word)
              .join(bi, (pairs.w1 == bi.b1) & (pairs.w2 == bi.b2), "left")
              .crossJoin(F.broadcast(nv))
              .groupBy("doc_id")
              .agg(F.round(F.avg(F.log(
                      (F.coalesce("bc", F.lit(0)) + 1.0)
                      / (F.col("uc") + F.col("nv")))), 6)
                    .alias("avg_logprob"),
                   F.count(F.lit(1)).alias("n_bigrams")))
    return scored.orderBy("doc_id")


@x("x133_quantization_error", """
WITH q AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         GREATEST(list_max(list_transform(embedding::DOUBLE[],
                                          x -> abs(x))), 1e-12) AS s
  FROM embeddings WHERE embedding IS NOT NULL
), r AS (
  SELECT vec_id,
         list_max(list_transform(
           list_zip(e, list_transform(e,
             x -> round(x / s * 127) / 127.0 * s)),
           p -> abs(p[1] - p[2]))) AS max_err,
         s
  FROM q
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
       ROUND(AVG(max_err), 8) AS mean_max_err,
       ROUND(MAX(max_err), 8) AS worst_err,
       ROUND(MAX(max_err / s), 8) AS worst_rel_err
FROM r""")
def x133(spark, sf):
    """Int8 symmetric quantization audit for the embedding lake: each
    vector quantized with its own scale (max-abs / 127), then the
    per-vector max reconstruction error and the corpus-level error stats
    — the 4× storage-reduction sanity check run before swapping a 100 TB
    float32 embedding store to int8.  Pure array-lambda JVM expressions,
    map-only, one final 1-row aggregate."""
    emb = load_emb(spark, sf).filter(F.col("embedding").isNotNull())
    e = F.transform("embedding", lambda x: x.cast("double"))
    q = emb.select(
        "vec_id", e.alias("e"),
        F.greatest(F.array_max(F.transform(e, F.abs)), F.lit(1e-12))
         .alias("s"))
    rec = F.transform("e", lambda x:
                      F.round(x / F.col("s") * 127) / 127.0 * F.col("s"))
    r = q.select(
        "s",
        F.array_max(F.zip_with("e", rec,
                               lambda a, b: F.abs(a - b))).alias("max_err"))
    return r.agg(F.count(F.lit(1)).alias("n_vectors"),
                 F.round(F.avg("max_err"), 8).alias("mean_max_err"),
                 F.round(F.max("max_err"), 8).alias("worst_err"),
                 F.round(F.max(F.col("max_err") / F.col("s")), 8)
                  .alias("worst_rel_err"))


@x("x134_k_anonymity", """
WITH g AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS sz
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(COUNT(*) FILTER (WHERE sz < 5) AS BIGINT) AS classes_lt_k,
       CAST(COALESCE(SUM(sz) FILTER (WHERE sz < 5), 0) AS BIGINT)
         AS rows_at_risk,
       CAST(MIN(sz) AS BIGINT) AS min_class_size
FROM g""")
def x134(spark, sf):
    """k-anonymity audit (k=5) over the quasi-identifier pair
    (nation, market segment): equivalence-class sizes from ONE keyed
    aggregate, then a 1-row risk summary — classes smaller than k and
    the row count they expose.  The privacy gate a training-data release
    runs before shipping; the class table is |QI-combinations|-bounded,
    never row-bounded."""
    c = load(spark, sf, "customer")
    g = (c.groupBy("c_nationkey", "c_mktsegment")
          .agg(F.count(F.lit(1)).alias("sz")))
    lt = F.col("sz") < 5
    return g.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.count_if(lt).alias("classes_lt_k"),
        F.coalesce(F.sum(F.when(lt, F.col("sz"))), F.lit(0))
         .cast("long").alias("rows_at_risk"),
        F.min("sz").cast("long").alias("min_class_size"))


def _copurchase_edges(spark, sf, min_support: int = 2) -> DataFrame:
    """Canonical (p1 < p2) co-purchase part graph from lineitem: the
    x117 pair generator with a support threshold — one hash shuffle on
    l_orderkey, per-order fan-out bounded by basket size squared."""
    from ..util import retain_cache

    # compute-once: the self-join's two sides are the SAME distinct
    # subtree — uncached, the scan + distinct exchange executed twice
    # per build (r14)
    it = retain_cache(load(spark, sf, "lineitem")
                      .select("l_orderkey", "l_partkey").distinct())
    a, b = it.alias("a"), it.alias("b")
    return (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                   & (F.col("a.l_partkey") < F.col("b.l_partkey")))
             .groupBy(F.col("a.l_partkey").alias("p1"),
                      F.col("b.l_partkey").alias("p2"))
             .agg(F.count(F.lit(1)).alias("n"))
             .filter(F.col("n") >= min_support)
             .select("p1", "p2"))


_COPURCHASE_EDGE_SQL = """
it AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
ec AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2 FROM it a JOIN it b
       ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       GROUP BY 1, 2 HAVING COUNT(*) >= 2)"""


@x("x135_triangle_count", f"""
WITH {_COPURCHASE_EDGE_SQL},
deg AS (
  SELECT v, COUNT(*) AS d FROM (
    SELECT p1 AS v FROM ec UNION ALL SELECT p2 AS v FROM ec) GROUP BY v),
tri AS (
  SELECT COUNT(*) AS n_tri
  FROM ec e1 JOIN ec e2 ON e2.p1 = e1.p2
             JOIN ec e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2)
SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_vertices,
       CAST((SELECT COUNT(*) FROM ec) AS BIGINT) AS n_edges,
       CAST(n_tri AS BIGINT) AS n_triangles,
       ROUND(3.0 * n_tri
             / NULLIF((SELECT SUM(d * (d - 1) / 2) FROM deg), 0), 6)
         AS clustering_coeff
FROM tri""")
def x135(spark, sf):
    """Triangle census + global clustering coefficient of the
    co-purchase part graph (support ≥ 2): cohesion audit of a
    similarity/co-occurrence graph before community detection (x129) —
    a near-zero coefficient means the LSH/co-occurrence edges are noise,
    not clusters.  graph.triangle_stats uses degree-ordered orientation
    (O(m^1.5) node-iterator), so the count survives celebrity vertices
    at 100 TB; the DuckDB twin counts the same triangles via the
    canonical p1<p2 three-way join."""
    from ..operators.graph import triangle_stats
    return triangle_stats(_copurchase_edges(spark, sf))


@x("x136_reachability", f"""
WITH RECURSIVE {_COPURCHASE_EDGE_SQL},
e AS (SELECT p1 AS src, p2 AS dst FROM ec
      UNION ALL SELECT p2, p1 FROM ec),
r(node, hop) AS (
  SELECT DISTINCT src AS node, 0 AS hop FROM e WHERE src <= 25
  UNION ALL
  SELECT e.dst, r.hop + 1 FROM r JOIN e ON e.src = r.node WHERE r.hop < 3)
SELECT node AS part_id, CAST(MIN(hop) AS BIGINT) AS hops
FROM r GROUP BY node ORDER BY hops, part_id""")
def x136(spark, sf):
    """3-hop BFS reachability from seed parts (ids ≤ 25) over the
    co-purchase graph: min-hop distance per reached node — the blast
    radius query behind contaminated-source spread and recommendation
    candidate generation.  graph.bfs_min_hops expands a frontier with
    one keyed join + anti-join per level (never re-expanding visited
    nodes), depth-bounded not data-bounded; the oracle replays it with a
    recursive CTE and MIN(hop)."""
    from ..operators.graph import bfs_min_hops
    from ..util import retain_cache

    # compute-once: the edge list feeds BOTH the seed derivation and
    # the BFS's own symmetrize checkpoint — uncached, the co-purchase
    # self-join built twice (r14)
    edges = retain_cache(_copurchase_edges(spark, sf))
    seeds = (edges.select(F.col("p1").alias("node"))
             .union(edges.select(F.col("p2").alias("node")))
             .filter(F.col("node") <= 25).distinct())
    return (bfs_min_hops(edges, seeds, max_hops=3)
            .select(F.col("node").alias("part_id"), "hops")
            .orderBy("hops", "part_id"))


@x("x137_rolling_corr", """
SELECT l_partkey, l_orderkey, l_linenumber,
       ROUND(corr(l_quantity, l_discount) OVER (
         PARTITION BY l_partkey
         ORDER BY l_shipdate, l_orderkey, l_linenumber
         ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 4) + 0.0 AS roll_corr
FROM lineitem WHERE l_partkey < 200
ORDER BY l_partkey, l_orderkey, l_linenumber""")
def x137(spark, sf):
    """Trailing 10-row Pearson correlation between quantity and discount
    per part, ordered by ship date with a full deterministic tie-break —
    the rolling co-movement feature behind drift monitors and pairs
    signals.  The window is partitioned by l_partkey (bounded per-key
    history, never a global sort) and the frame is ROWS-bounded, so
    state per task is 10 rows.  Spelled as covar_pop / (σx·σy) with
    try_divide rather than `F.corr`: under ANSI mode Spark's corr raises
    DIVIDE_BY_ZERO on degenerate frames (1 row / zero variance) where
    DuckDB yields NULL — the explicit ratio gives the NULL semantics
    while staying a JVM window aggregate.  Both sides add +0.0 after the
    round to collapse IEEE -0.0 into 0.0 for hash parity."""
    li = load(spark, sf, "lineitem").filter(F.col("l_partkey") < 200)
    w = (Window.partitionBy("l_partkey")
         .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
         .rowsBetween(-9, 0))
    corr = F.try_divide(
        F.covar_pop("l_quantity", "l_discount").over(w),
        F.nullif(F.stddev_pop("l_quantity").over(w)
                 * F.stddev_pop("l_discount").over(w), F.lit(0.0)))
    return (li.select(
                "l_partkey", "l_orderkey", "l_linenumber",
                (F.round(corr, 4) + 0.0).alias("roll_corr"))
              .orderBy("l_partkey", "l_orderkey", "l_linenumber"))


@x("x138_attribution", """
WITH t AS (
  SELECT user_id, event_type, value,
         LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
  FROM events)
SELECT COALESCE(channel, 'direct') AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       ROUND(SUM(value), 4) AS revenue
FROM t WHERE event_type = 'purchase'
GROUP BY 1 ORDER BY 1""")
def x138(spark, sf):
    """Last-touch marketing attribution: each purchase's value credited
    to the user's most recent preceding non-purchase event type
    ('direct' when none), then revenue by channel.  One window keyed on
    user_id (per-user history, no global order) using
    `last(..., ignorenulls=True)` over an unbounded-preceding frame that
    EXCLUDES the current row, then a tiny keyed aggregate — the
    standard attribution shape that at 100 TB rides a single hash
    exchange on user_id."""
    ev = load(spark, sf, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    ch = F.last(F.when(F.col("event_type") != "purchase",
                       F.col("event_type")), ignorenulls=True).over(w)
    return (ev.withColumn("channel", ch)
              .filter(F.col("event_type") == "purchase")
              .groupBy(F.coalesce("channel", F.lit("direct"))
                        .alias("channel"))
              .agg(F.count(F.lit(1)).alias("n_purchases"),
                   F.round(F.sum("value"), 4).alias("revenue"))
              .orderBy("channel"))


@x("x139_ab_test", """
WITH u AS (
  SELECT user_id,
         CAST(('0x' || substring(md5('ab-' || CAST(user_id AS VARCHAR)),
                                 1, 8)) AS BIGINT) % 2 AS v,
         CASE WHEN COUNT(*) FILTER (WHERE event_type = 'purchase') >= 13
              THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY user_id
), s AS (
  SELECT CAST(COUNT(*) FILTER (WHERE v = 0) AS BIGINT) AS n_a,
         CAST(COUNT(*) FILTER (WHERE v = 1) AS BIGINT) AS n_b,
         CAST(SUM(conv) FILTER (WHERE v = 0) AS BIGINT) AS conv_a,
         CAST(SUM(conv) FILTER (WHERE v = 1) AS BIGINT) AS conv_b
  FROM u
)
SELECT n_a, n_b, conv_a, conv_b,
       ROUND(conv_a * 1.0 / n_a, 6) AS rate_a,
       ROUND(conv_b * 1.0 / n_b, 6) AS rate_b,
       ROUND((conv_a * 1.0 / n_a - conv_b * 1.0 / n_b)
             / sqrt((conv_a + conv_b) * 1.0 / (n_a + n_b)
                    * (1 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b)), 6) AS z_score
FROM s""")
def x139(spark, sf):
    """Two-proportion z-test over a deterministic 50/50 user split:
    variant from the portable md5 bucket (the x59 discipline — any
    engine reproduces the assignment), conversion = 13+ purchases (mid-
    range rate at the test SF, so the variance term is live), then the
    pooled z-score in one row; try_divide keeps a degenerate pool
    (p ∈ {0,1}) a NULL z instead of an ANSI error.  Experiment readout shape: one
    keyed aggregate per user then a single global reduce — no windows,
    no shuffle beyond the user_id hash."""
    from ..operators.sampling import md5_bucket

    u = (load(spark, sf, "events")
         .groupBy("user_id")
         .agg(F.when(F.count_if(F.col("event_type") == "purchase")
                     >= 13, 1).otherwise(0).alias("conv"))
         .withColumn("v", md5_bucket(F.col("user_id"), "ab") % 2))
    s = u.agg(
        F.count_if(F.col("v") == 0).alias("n_a"),
        F.count_if(F.col("v") == 1).alias("n_b"),
        F.sum(F.when(F.col("v") == 0, F.col("conv"))).alias("conv_a"),
        F.sum(F.when(F.col("v") == 1, F.col("conv"))).alias("conv_b"))
    ra = F.col("conv_a") / F.col("n_a")
    rb = F.col("conv_b") / F.col("n_b")
    p = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    z = F.try_divide(
        ra - rb,
        F.nullif(F.sqrt(p * (1 - p)
                        * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))),
                 F.lit(0.0)))
    return s.select("n_a", "n_b", "conv_a", "conv_b",
                    F.round(ra, 6).alias("rate_a"),
                    F.round(rb, 6).alias("rate_b"),
                    F.round(z, 6).alias("z_score"))


@x("x140_gini", """
WITH rev AS (
  SELECT c_custkey, c_nationkey,
         ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS r
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY 1, 2
), rk AS (
  SELECT c_nationkey, r,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY r, c_custkey) AS i
  FROM rev
)
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(SUM(r), 2) AS total_rev,
       ROUND(2.0 * SUM(i * r) / NULLIF(COUNT(*) * SUM(r), 0)
             - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
FROM rk JOIN nation ON n_nationkey = c_nationkey
GROUP BY n_name ORDER BY n_name""")
def x140(spark, sf):
    """Per-nation Gini coefficient of customer revenue (inequality /
    concentration audit — the fairness twin of the x121 gains table).
    Rank-within-nation comes from curriculum.grouped_global_position
    (range partition + broadcast offsets), NOT Window.partitionBy(nation)
    — 25 nations over billions of customers would funnel each nation
    through one window task; zero-revenue customers kept via the left
    join so the coefficient covers the whole population."""
    from ..operators.curriculum import grouped_global_position

    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    rev = (cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
               .groupBy("c_custkey", "c_nationkey")
               # round before the rank: keeps the order-sensitive
               # sum(i*r) term identical across engines (see oracle)
               .agg(F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)),
                            2).alias("r")))
    rk = grouped_global_position(
        rev, ["c_nationkey"], [F.col("r"), F.col("c_custkey")], "rk0")
    nation = load(spark, sf, "nation")
    g = (rk.withColumn("i", F.col("rk0") + 1)
           .groupBy("c_nationkey")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("r").alias("sr"),
                F.sum(F.col("i") * F.col("r")).alias("sir")))
    gini = (2.0 * F.col("sir") / F.nullif(F.col("n") * F.col("sr"),
                                          F.lit(0))
            - (F.col("n") + 1.0) / F.col("n"))
    return (g.join(F.broadcast(nation),
                   g.c_nationkey == nation.n_nationkey)
             .select("n_name",
                     F.col("n").alias("n_customers"),
                     F.round("sr", 2).alias("total_rev"),
                     F.round(gini, 6).alias("gini"))
             .orderBy("n_name"))


@x("x141_benford", """
WITH d AS (
  SELECT CAST(FLOOR(o_totalprice
              / POWER(10, FLOOR(LOG10(o_totalprice)))) AS BIGINT) AS digit
  FROM orders WHERE o_totalprice > 0
), c AS (
  SELECT digit, COUNT(*) AS n, SUM(COUNT(*)) OVER () AS total
  FROM d GROUP BY digit
)
SELECT digit, CAST(n AS BIGINT) AS n,
       ROUND(n * 1.0 / total, 6) AS obs_freq,
       ROUND(LOG10(1 + 1.0 / digit), 6) AS exp_freq,
       ROUND(POWER(n * 1.0 / total - LOG10(1 + 1.0 / digit), 2)
             / LOG10(1 + 1.0 / digit) * total, 4) AS chi2_contrib
FROM c ORDER BY digit""")
def x141(spark, sf):
    """Benford's-law first-digit audit of order totals: observed vs
    expected log-distribution frequency per leading digit and the
    chi-square contribution — the forensic data-quality screen for
    fabricated or truncated numeric columns.  First digit extracted
    arithmetically (floor(x / 10^floor(log10 x)) — no string casts), one
    9-group aggregate; the OVER () total rides the 9-row result, not the
    fact table."""
    o = (load(spark, sf, "orders")
         .filter(F.col("o_totalprice") > 0)
         .select(F.floor(F.col("o_totalprice")
                         / F.pow(10, F.floor(F.log10("o_totalprice"))))
                 .cast("long").alias("digit")))
    c = o.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    total = F.sum("n").over(Window.partitionBy())   # 9-row result
    obs = F.col("n") / total
    exp = F.log10(1 + 1.0 / F.col("digit"))
    return (c.select("digit", "n",
                     F.round(obs, 6).alias("obs_freq"),
                     F.round(exp, 6).alias("exp_freq"),
                     F.round(F.pow(obs - exp, 2) / exp * total, 4)
                      .alias("chi2_contrib"))
             .orderBy("digit"))


@x("x142_hhi", """
WITH rev AS (
  SELECT n_name, l_suppkey,
         SUM(l_extendedprice * (1 - l_discount)) AS r
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  GROUP BY 1, 2
), tot AS (
  SELECT n_name, SUM(r) AS t, COUNT(*) AS n_suppliers FROM rev GROUP BY 1
)
SELECT rev.n_name, CAST(n_suppliers AS BIGINT) AS n_suppliers,
       ROUND(SUM(POWER(r / t, 2)), 6) AS hhi
FROM rev JOIN tot ON rev.n_name = tot.n_name
GROUP BY rev.n_name, n_suppliers ORDER BY rev.n_name""")
def x142(spark, sf):
    """Herfindahl–Hirschman concentration index of supplier revenue per
    nation: Σ share² over each nation's suppliers — the market-/source-
    concentration audit (a training corpus dominated by one source scores
    near 1).  Two keyed aggregates; the per-nation totals table is
    nation-cardinality-bounded and broadcast back — no windows over the
    fact."""
    li = load(spark, sf, "lineitem")
    sup = load(spark, sf, "supplier")
    nat = load(spark, sf, "nation")
    rev = (li.join(sup, li.l_suppkey == sup.s_suppkey)
             .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
             .groupBy("n_name", "l_suppkey")
             .agg(F.sum(F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))).alias("r")))
    tot = (rev.groupBy("n_name")
              .agg(F.sum("r").alias("t"),
                   F.count(F.lit(1)).alias("n_suppliers")))
    return (rev.join(F.broadcast(tot), "n_name")
               .groupBy("n_name", "n_suppliers")
               .agg(F.round(F.sum(F.pow(F.col("r") / F.col("t"), 2)), 6)
                    .alias("hhi"))
               .select("n_name", "n_suppliers", "hhi")
               .orderBy("n_name"))


@x("x143_pmi_phrases", r"""
WITH w AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z]+'),
                             x -> x <> '') AS ws
  FROM documents
), uni AS (
  SELECT u.w AS word, COUNT(*) AS uc
  FROM w, UNNEST(ws) AS u(w) GROUP BY 1
), tot AS (SELECT SUM(uc) AS n FROM uni),
allbi AS (
  SELECT ws[i] AS w1, ws[i+1] AS w2, COUNT(*) AS bc
  FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS g(i)
  GROUP BY 1, 2
), tb AS (SELECT SUM(bc) AS nb FROM allbi),
bi AS (SELECT * FROM allbi WHERE bc >= 5)
SELECT w1, w2, CAST(bc AS BIGINT) AS n_pair,
       ROUND(LOG2((bc * 1.0 / nb)
                  / ((u1.uc * 1.0 / n) * (u2.uc * 1.0 / n))), 4) AS pmi
FROM bi, tot, tb
JOIN uni u1 ON u1.word = w1
JOIN uni u2 ON u2.word = w2
ORDER BY pmi DESC, w1, w2 LIMIT 20""")
def x143(spark, sf):
    """Pointwise mutual information over corpus bigrams (min count 5):
    the collocation / phrase-mining score that upgrades raw bigram
    counts (x63) into 'these words belong together' — the tokenizer-
    vocabulary and stop-phrase discovery pass of a text pipeline.
    Unigram and bigram tables are corpus-bounded keyed aggregates; the
    two totals ride as broadcast 1-row scalars, and the unigram
    probabilities join back BY KEY onto the count-thresholded bigram
    table (at 100 TB both tables are large: hash join, no broadcast
    assumption).  Deterministic top-20 with full tie-break."""
    docs = load_docs(spark, sf)
    ws = F.filter(F.split(F.lower("text"), "[^a-z]+"),
                  lambda x: x != F.lit(""))
    w = docs.select("doc_id", ws.alias("ws"))
    uni = (w.select(F.explode("ws").alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("uc")))
    tot = uni.agg(F.sum("uc").alias("n"))
    pairs = (w.select(F.posexplode(F.slice(
                 "ws", 1, F.greatest(F.size("ws") - 1, F.lit(0))))
                 .alias("i", "w1"),
                 "ws")
              .select("w1", F.element_at("ws", F.col("i") + 2).alias("w2")))
    allbi = (pairs.groupBy("w1", "w2")
                  .agg(F.count(F.lit(1)).alias("bc")))
    tb = allbi.agg(F.sum("bc").alias("nb"))
    bi = allbi.filter(F.col("bc") >= 5)
    u1 = uni.select(F.col("word").alias("w1"), F.col("uc").alias("uc1"))
    u2 = uni.select(F.col("word").alias("w2"), F.col("uc").alias("uc2"))
    pmi = F.log2((F.col("bc") / F.col("nb"))
                 / ((F.col("uc1") / F.col("n"))
                    * (F.col("uc2") / F.col("n"))))
    return (bi.join(u1, "w1").join(u2, "w2")
              .crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(tb))
              .select("w1", "w2", F.col("bc").alias("n_pair"),
                      F.round(pmi, 4).alias("pmi"))
              .orderBy(F.desc("pmi"), "w1", "w2").limit(20))


@x("x144_readability", r"""
WITH t AS (
  SELECT doc_id,
         GREATEST(len(list_filter(
           string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')), 1)
           AS n_words,
         GREATEST(len(list_filter(
           string_split_regex(text, '[.!?]+'),
           x -> trim(x) <> '')), 1) AS n_sents,
         GREATEST(len(list_filter(
           string_split_regex(lower(text), '[^aeiouy]+'), x -> x <> '')),
           1) AS n_syl
  FROM documents
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_sents AS BIGINT) AS n_sents,
       ROUND(206.835 - 1.015 * (n_words * 1.0 / n_sents)
             - 84.6 * (n_syl * 1.0 / n_words), 4) AS flesch
FROM t ORDER BY doc_id""")
def x144(spark, sf):
    """Flesch reading-ease per document with a vowel-group syllable
    proxy: words/sentence + syllables/word, the classic readability
    filter a curriculum builder buckets on (x69 takes quality, this
    takes difficulty).  Pure JVM regex splits — map-only, no shuffle,
    no UDF; the syllable proxy (maximal [aeiouy]+ runs) is engine-
    portable so the oracle replays it exactly."""
    docs = load_docs(spark, sf)

    def runs(col, pattern):
        return F.greatest(F.size(F.filter(
            F.split(col, pattern),
            lambda x: F.trim(x) != F.lit(""))), F.lit(1))

    t = docs.select(
        "doc_id",
        runs(F.lower("text"), "[^a-z]+").alias("n_words"),
        runs(F.col("text"), "[.!?]+").alias("n_sents"),
        runs(F.lower("text"), "[^aeiouy]+").alias("n_syl"))
    flesch = (206.835
              - 1.015 * (F.col("n_words") / F.col("n_sents"))
              - 84.6 * (F.col("n_syl") / F.col("n_words")))
    return (t.select("doc_id",
                     F.col("n_words").cast("long").alias("n_words"),
                     F.col("n_sents").cast("long").alias("n_sents"),
                     F.round(flesch, 4).alias("flesch"))
             .orderBy("doc_id"))


@x("x145_seasonality", """
WITH h AS (
  SELECT event_type, EXTRACT(hour FROM ts) AS hour, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), t AS (
  SELECT event_type, SUM(n) AS tot FROM h GROUP BY 1
)
SELECT h.event_type, CAST(hour AS BIGINT) AS hour, CAST(n AS BIGINT) AS n,
       ROUND(n * 24.0 / tot, 4) AS lift_vs_uniform
FROM h JOIN t ON h.event_type = t.event_type
ORDER BY h.event_type, hour""")
def x145(spark, sf):
    """Hour-of-day seasonality profile per event type: activity count
    and lift against the uniform-hour expectation — the traffic-shape
    fingerprint behind anomaly baselines and send-time optimization.
    One keyed aggregate to a (type × 24)-bounded table; the per-type
    totals join is against that bounded table, never the fact."""
    ev = load(spark, sf, "events")
    h = (ev.groupBy("event_type", F.hour("ts").alias("hour"))
           .agg(F.count(F.lit(1)).alias("n")))
    t = h.groupBy("event_type").agg(F.sum("n").alias("tot"))
    return (h.join(F.broadcast(t), "event_type")
             .select("event_type", F.col("hour").cast("long").alias("hour"),
                     "n",
                     F.round(F.col("n") * 24.0 / F.col("tot"), 4)
                      .alias("lift_vs_uniform"))
             .orderBy("event_type", "hour"))


@x("x146_weighted_median", """
WITH b AS (
  SELECT l_partkey AS p, l_extendedprice AS v, l_quantity AS wt,
         l_orderkey, l_linenumber
  FROM lineitem WHERE l_partkey < 500
), c AS (
  SELECT p, v, wt,
         SUM(wt) OVER (PARTITION BY p
                       ORDER BY v, l_orderkey, l_linenumber
                       ROWS UNBOUNDED PRECEDING) AS cumw,
         SUM(wt) OVER (PARTITION BY p) AS tot
  FROM b
)
SELECT p AS l_partkey,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       ROUND(MAX(tot), 2) AS total_weight,
       MIN(CASE WHEN cumw >= tot / 2.0 THEN v END) AS weighted_median
FROM c GROUP BY p ORDER BY p""")
def x146(spark, sf):
    """Quantity-weighted median price per part (lower weighted median:
    the smallest value whose cumulative weight reaches half the total) —
    the robust center for weighted distributions where plain median
    ignores volume.  The cumulative-weight window is keyed on l_partkey
    (bounded per-key history; at 100 TB part cardinality scales with the
    data, so the windows stay small) and the prefix order is total
    (value, orderkey, linenumber), making the running sum bit-identical
    across engines; the median is an actual data value, so no float
    synthesis."""
    b = (load(spark, sf, "lineitem")
         .filter(F.col("l_partkey") < 500)
         .select(F.col("l_partkey").alias("p"),
                 F.col("l_extendedprice").alias("v"),
                 F.col("l_quantity").alias("wt"),
                 "l_orderkey", "l_linenumber"))
    wc = (Window.partitionBy("p")
          .orderBy("v", "l_orderkey", "l_linenumber")
          .rowsBetween(Window.unboundedPreceding, 0))
    wt = Window.partitionBy("p")
    c = b.select("p", "v",
                 F.sum("wt").over(wc).alias("cumw"),
                 F.sum("wt").over(wt).alias("tot"))
    return (c.groupBy(F.col("p").alias("l_partkey"))
             .agg(F.count(F.lit(1)).alias("n_lines"),
                  F.round(F.max("tot"), 2).alias("total_weight"),
                  F.min(F.when(F.col("cumw") >= F.col("tot") / 2.0,
                               F.col("v"))).alias("weighted_median"))
             .orderBy("l_partkey"))


@x("x147_centroid_distances", """
WITH v AS (
  SELECT label, embedding::DOUBLE[] AS e FROM embeddings
  WHERE embedding IS NOT NULL
), p AS (
  SELECT label, i, ROUND(avg(e[i]), 6) AS c
  FROM v, generate_series(1, 64) AS t(i)
  GROUP BY label, i
), cent AS (
  SELECT label, list(c ORDER BY i) AS cv FROM p GROUP BY label
)
SELECT a.label AS label_a, b.label AS label_b,
       ROUND(list_dot_product(a.cv, b.cv)
             / (sqrt(list_dot_product(a.cv, a.cv))
                * sqrt(list_dot_product(b.cv, b.cv))), 4) AS cos_sim
FROM cent a JOIN cent b ON a.label < b.label
ORDER BY label_a, label_b""")
def x147(spark, sf):
    """Inter-class centroid similarity matrix: per-label mean embedding,
    then pairwise cosine between the label centroids — the class-
    separability / label-noise screen run before training a classifier
    (two labels with cos ≈ 1 are aliases).  Centroids come from ONE
    posexplode + keyed aggregate (vectors never shuffled whole), rounded
    to 6 dp BEFORE the cosine so both engines compute from identical
    centroids (the x103 parity discipline); the pairwise join is over
    the label-bounded centroid table, |labels|² rows, never the fact."""
    emb = (load_emb(spark, sf)
           .filter(F.col("embedding").isNotNull())
           .select("label",
                   F.posexplode(F.col("embedding").cast("array<double>"))
                    .alias("i", "x")))
    p = (emb.groupBy("label", "i")
            .agg(F.round(F.avg("x"), 6).alias("c")))
    cent = (p.groupBy("label")
             .agg(F.array_sort(F.collect_list(F.struct("i", "c")))
                   .alias("sc"))
             .select("label",
                     F.transform("sc", lambda s: s["c"]).alias("cv")))
    dot = lambda u, v: F.aggregate(       # noqa: E731
        F.zip_with(u, v, lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x)
    a = cent.select(F.col("label").alias("label_a"),
                    F.col("cv").alias("ca"))
    b = cent.select(F.col("label").alias("label_b"),
                    F.col("cv").alias("cb"))
    pair = a.join(b, F.col("label_a") < F.col("label_b"))
    cos = (dot(F.col("ca"), F.col("cb"))
           / (F.sqrt(dot(F.col("ca"), F.col("ca")))
              * F.sqrt(dot(F.col("cb"), F.col("cb")))))
    return (pair.select("label_a", "label_b",
                        F.round(cos, 4).alias("cos_sim"))
                .orderBy("label_a", "label_b"))


@x("x148_chi2_independence", """
WITH o AS (
  SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2
), m AS (
  SELECT lang, source, n,
         SUM(n) OVER (PARTITION BY lang) AS rt,
         SUM(n) OVER (PARTITION BY source) AS ct,
         SUM(n) OVER () AS tot
  FROM o
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST((COUNT(DISTINCT lang) - 1)
            * (COUNT(DISTINCT source) - 1) AS BIGINT) AS dof,
       ROUND(SUM(POWER(n - rt * ct * 1.0 / tot, 2)
                 / (rt * ct * 1.0 / tot)), 4) AS chi2
FROM m""")
def x148(spark, sf):
    """Chi-square independence test between document language and
    source: the contingency-table screen for 'is the corpus mix
    confounded' (a source that only ships one language skews any
    per-language metric).  One keyed aggregate to a |lang|×|source|-
    bounded cell table; the marginal windows run on that bounded table,
    never the corpus."""
    o = (load_docs(spark, sf)
         .groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n")))
    m = o.select(
        "lang", "source", "n",
        F.sum("n").over(Window.partitionBy("lang")).alias("rt"),
        F.sum("n").over(Window.partitionBy("source")).alias("ct"),
        F.sum("n").over(Window.partitionBy()).alias("tot"))
    e = F.col("rt") * F.col("ct") / F.col("tot")
    return m.agg(
        F.count(F.lit(1)).alias("n_cells"),
        ((F.count_distinct("lang") - 1)
         * (F.count_distinct("source") - 1)).alias("dof"),
        F.round(F.sum(F.pow(F.col("n") - e, 2) / e), 4).alias("chi2"))


@x("x149_interarrival", """
WITH g AS (
  SELECT event_type,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT event_type, CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
       ROUND(quantile_cont(gap_us, 0.5) / 1e6, 3) AS median_gap_s,
       ROUND(quantile_cont(gap_us, 0.9) / 1e6, 3) AS p90_gap_s
FROM g WHERE gap_us IS NOT NULL
GROUP BY event_type ORDER BY event_type""")
def x149(spark, sf):
    """Inter-arrival gap distribution per event type: each event's gap
    to the SAME user's previous event (any type), then exact median and
    p90 per type — the idle-time fingerprint behind session-timeout
    tuning (x15's 30-minute cut) and bot detection (machine-regular
    gaps).  Gaps in integer microseconds (unix_micros / epoch_us) so
    both engines difference identical integers; one user-keyed window
    then a type-bounded aggregate with interpolating percentiles."""
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    g = (ev.select("event_type",
                   (us - F.lag(us).over(w)).alias("gap_us"))
           .filter(F.col("gap_us").isNotNull()))
    return (g.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n_gaps"),
                  F.round(F.percentile("gap_us", F.lit(0.5)) / 1e6, 3)
                   .alias("median_gap_s"),
                  F.round(F.percentile("gap_us", F.lit(0.9)) / 1e6, 3)
                   .alias("p90_gap_s"))
             .orderBy("event_type"))


@x("x150_cohort_ltv", """
WITH f AS (
  SELECT user_id,
         CAST(FLOOR(MIN(epoch_us(ts)) / 604800e6) AS BIGINT) AS cw
  FROM events GROUP BY user_id
), sz AS (
  SELECT cw, COUNT(*) AS n_users FROM f GROUP BY cw
), r AS (
  SELECT f.cw,
         CAST(FLOOR(epoch_us(e.ts) / 604800e6) AS BIGINT) - f.cw AS wk,
         SUM(e.value) AS rev
  FROM events e JOIN f ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase'
  GROUP BY 1, 2
)
SELECT CAST(to_timestamp(r.cw * 604800) AS TIMESTAMP) AS cohort_start,
       CAST(wk AS BIGINT) AS week_offset,
       CAST(n_users AS BIGINT) AS n_users,
       ROUND(SUM(rev) OVER (PARTITION BY r.cw ORDER BY wk
                            ROWS UNBOUNDED PRECEDING), 2) AS cum_rev,
       ROUND(SUM(rev) OVER (PARTITION BY r.cw ORDER BY wk
                            ROWS UNBOUNDED PRECEDING) / n_users, 4)
         AS ltv_per_user
FROM r JOIN sz ON sz.cw = r.cw
ORDER BY cohort_start, week_offset""")
def x150(spark, sf):
    """Cohort lifetime-value curve: users bucketed by the epoch-week of
    their first event, cumulative purchase revenue per cohort by week
    offset, divided by cohort size — the LTV payback readout that pairs
    with x72's retention triangle.  Week buckets are pure integer
    arithmetic on microseconds (no engine-specific week-truncation
    rules); the cumulative window runs over the cohort×offset-bounded
    rollup, and the only fact-sized operations are two user-keyed
    hash joins/aggregates."""
    ev = load(spark, sf, "events")
    us = F.unix_micros("ts")
    f = (ev.groupBy("user_id")
           .agg(F.floor(F.min(us) / F.lit(604800e6))
                 .cast("long").alias("cw")))
    sz = f.groupBy("cw").agg(F.count(F.lit(1)).alias("n_users"))
    r = (ev.filter(F.col("event_type") == "purchase")
           .join(f, "user_id")
           .groupBy("cw",
                    (F.floor(us / F.lit(604800e6)).cast("long")
                     - F.col("cw")).alias("wk"))
           .agg(F.sum("value").alias("rev")))
    wcum = (Window.partitionBy("cw").orderBy("wk")
            .rowsBetween(Window.unboundedPreceding, 0))
    cum = F.sum("rev").over(wcum)
    return (r.join(sz, "cw")
             .select(F.to_timestamp(F.col("cw") * 604800)
                      .alias("cohort_start"),
                     F.col("wk").cast("long").alias("week_offset"),
                     "n_users",
                     F.round(cum, 2).alias("cum_rev"),
                     F.round(cum / F.col("n_users"), 4)
                      .alias("ltv_per_user"))
             .orderBy("cohort_start", "week_offset"))




@x("x180_bloom_prejoin", """
WITH dim AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
), pos AS (
  SELECT CAST(('0x' || substring(md5('bf-' || j || '-' || c_custkey),
                                 1, 8)) AS BIGINT) % 4096 AS p
  FROM dim, generate_series(0, 1) AS t(j)
), words AS (
  SELECT (p // 32) AS w, bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT))
           AS bits
  FROM pos GROUP BY 1
), probe AS (
  SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
         (SELECT BOOL_AND(COALESCE(
             ((w.bits >> CAST(q.p % 32 AS INT)) & 1) = 1, FALSE))
          FROM (SELECT CAST(('0x' || substring(
                     md5('bf-' || j || '-' || o.o_custkey), 1, 8))
                     AS BIGINT) % 4096 AS p
                FROM generate_series(0, 1) AS t(j)) q
          LEFT JOIN words w ON w.w = (q.p // 32)) AS bloom_pass
  FROM orders o
), exact AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM dim)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bloom_pass,
       CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS n_exact,
       ROUND(CAST(SUM(CASE WHEN bloom_pass
                            AND o_orderkey NOT IN
                                (SELECT o_orderkey FROM exact)
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / (COUNT(*) - (SELECT COUNT(*) FROM exact)), 4) AS fp_rate,
       ROUND(SUM(CASE WHEN o_orderkey IN (SELECT o_orderkey FROM exact)
                      THEN o_totalprice ELSE 0 END), 2) AS revenue_exact
FROM probe""")
def x180(spark, sf):
    """Bloom-filter join pruning, measured: a 4 096-bit / 2-hash filter
    over the BUILDING customers rides the plan as a 128-word literal
    and pre-filters orders MAP-SIDE before the exact semi-join — the
    100 TB pattern that keeps the fact-table exchange proportional to
    matches (plus the false-positive share this query makes
    observable) instead of table size.  Portable md5 bit positions make
    the FP SET itself deterministic: the oracle re-derives the same
    words and the same per-row verdicts, so n_bloom_pass / fp_rate are
    value-checked, not asserted."""
    from ..operators.sketches import bloom_build, bloom_might_contain

    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    dim = cust.filter(F.col("c_mktsegment") == "BUILDING") \
              .select("c_custkey")
    words = bloom_build(dim, "c_custkey", n_bits=4096, n_hashes=2)
    passed = bloom_might_contain(F.col("o_custkey"), words,
                                 n_bits=4096, n_hashes=2)
    exact = F.col("c_custkey").isNotNull()
    probe = (orders.withColumn("__bloom", passed)
                   .join(F.broadcast(dim),
                         orders["o_custkey"] == dim["c_custkey"], "left")
                   .withColumn("__exact", exact))
    return probe.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("__bloom").cast("long")).alias("n_bloom_pass"),
        F.sum(F.col("__exact").cast("long")).alias("n_exact"),
        F.round(F.sum((F.col("__bloom") & ~F.col("__exact"))
                      .cast("double"))
                / F.sum((~F.col("__exact")).cast("long")), 4)
         .alias("fp_rate"),
        F.round(F.sum(F.when(F.col("__exact"), F.col("o_totalprice"))
                       .otherwise(F.lit(0.0))), 2)
         .alias("revenue_exact"))


def _sssp_oracle_sql(rounds: int) -> str:
    parts = ["""p AS (
  SELECT c_custkey AS id, abs(c_acctbal) % 100 AS x,
         CAST(c_custkey % 100 AS DOUBLE) AS y FROM customer
), e AS (
  SELECT a.id AS src, b.id AS dst,
         sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)) AS w
  FROM p a JOIN p b ON a.id <> b.id
   AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 9.0
), d0 AS (
  SELECT id AS node, CAST(0 AS DOUBLE) AS dist FROM p WHERE id <= 10
)"""]
    for t in range(1, rounds + 1):
        parts.append(f"""d{t} AS (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM d{t-1}
    UNION ALL
    SELECT e.dst AS node, d{t-1}.dist + e.w AS dist
    FROM d{t-1} JOIN e ON d{t-1}.node = e.src) GROUP BY node
)""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT node, ROUND(dist, 6) AS dist FROM d{rounds} "
              "ORDER BY node")


@x("x183_shortest_paths", _sssp_oracle_sql(6))
def x183(spark, sf):
    """Weighted single-source-set shortest paths (bounded Bellman–Ford,
    6 relaxation rounds) over the customer proximity graph — service-
    coverage distance from the seed facilities, the weighted sibling of
    x136's hop-count BFS.  Engine: grid radius join builds the edge
    list (never all-pairs), each round is one hash join + map-combined
    MIN; relaxation is a fixed add-then-min fold, so the oracle replays
    the rounds bit-exactly as chained CTEs over the all-pairs edge
    derivation (the x108 trajectory-replay discipline on a graph
    loop)."""
    from ..operators.graph import shortest_paths
    from ..operators.spatial import radius_join

    cust = (load(spark, sf, "customer")
            .select("c_custkey",
                    (F.abs(F.col("c_acctbal")) % 100).alias("x"),
                    (F.col("c_custkey") % 100).cast("double").alias("y")))
    a = cust.select(F.col("c_custkey").alias("ia"),
                    F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = cust.select(F.col("c_custkey").alias("ib"),
                    F.col("x").alias("xb"), F.col("y").alias("yb"))
    edges = (radius_join(a, b, "xa", "ya", "xb", "yb", 3.0,
                         dist_col="w")
             .filter(F.col("ia") < F.col("ib"))
             .select("ia", "ib", "w"))
    seeds = cust.filter(F.col("c_custkey") <= 10) \
                .select("c_custkey")
    out = shortest_paths(edges, "w", seeds, rounds=6)
    return (out.select(F.col("node"), F.round("dist", 6).alias("dist"))
               .orderBy("node"))
