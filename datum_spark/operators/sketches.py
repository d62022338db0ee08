"""Count-min sketch — a fixed-size, re-aggregable frequency summary.

At 100 TB you cannot keep exact counts for an unbounded term universe,
but a CMS counter table is ``depth × width`` cells REGARDLESS of corpus
size, merges by cell-wise addition (shards/days/sources sum into one
sketch — the same re-aggregability contract as the HLL rollup in
extensions.py), and answers point frequency queries with a one-sided
error: estimates never undercount, and overshoot by at most
``e·N/width`` with probability ``1 − e^−depth``.

Hashing is the portable md5 bucket (``int(md5(salt-j-term)[:8],16)``)
rather than xxhash64 so the ENTIRE sketch — counters and estimates — is
a pure function of the data, reproducible bit-for-bit in any engine
with ``md5`` (the x59/x62 auditable-membership discipline applied to a
sketch; DuckDB re-derives it in the x104 oracle).

Plan shape: building is one partial-aggregated ``groupBy`` whose keys
are at most ``depth × width`` values — each task emits a bounded
combiner table, nothing data-proportional shuffles.  Estimation
broadcast-joins the tiny counter table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cms_bucket(term, j: int, width: int, salt: str):
    s = F.concat_ws("-", F.lit(salt), F.lit(str(j)), term)
    return (F.conv(F.substring(F.md5(s), 1, 8), 16, 10)
             .cast("long") % width)


def cms_build(df: DataFrame, term_col: str,
              depth: int = 4, width: int = 1024,
              salt: str = "cms", weight_col: str | None = None) -> DataFrame:
    """Counter table ``(row, bucket, n)`` from one occurrence per input
    row (or ``weight_col`` occurrences).  Merge sketches by unioning
    counter tables and re-grouping (cell-wise sum)."""
    t = F.col(term_col)
    w = F.col(weight_col) if weight_col else F.lit(1)
    cells = F.array(*[
        F.struct(F.lit(j).alias("row"),
                 _cms_bucket(t, j, width, salt).alias("bucket"))
        for j in range(depth)])
    return (df.select(F.explode(cells).alias("c"), w.alias("__w"))
              .groupBy(F.col("c.row").alias("row"),
                       F.col("c.bucket").alias("bucket"))
              .agg(F.sum("__w").cast("long").alias("n")))


def cms_estimate(counters: DataFrame, terms: DataFrame, term_col: str,
                 depth: int = 4, width: int = 1024,
                 salt: str = "cms", out_col: str = "est_n") -> DataFrame:
    """Point estimates for each term in ``terms``: min over the sketch
    rows of the counter at that term's bucket (absent cell = 0).  The
    counter table is broadcast — estimation is map-side on the term
    set."""
    t = F.col(term_col)
    probes = terms.select(
        "*", F.explode(F.array(*[
            F.struct(F.lit(j).alias("row"),
                     _cms_bucket(t, j, width, salt).alias("bucket"))
            for j in range(depth)])).alias("p"))
    joined = (probes.join(F.broadcast(counters),
                          (F.col("p.row") == F.col("row"))
                          & (F.col("p.bucket") == F.col("bucket")),
                          "left")
                    .withColumn("__n", F.coalesce(F.col("n"), F.lit(0))))
    keys = [c for c in terms.columns]
    return (joined.groupBy(*keys)
                  .agg(F.min("__n").alias(out_col)))

# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch
# ---------------------------------------------------------------------------
#
# The bottom-k sketch: keep the k SMALLEST 48-bit hashes of the distinct
# elements of a set.  If the kth smallest hash is h_k, the set held
# roughly (k-1) · 2^48 / h_k distinct elements (the k points are uniform
# order statistics on [0, 2^48)); with fewer than k distinct elements
# the sketch IS the set and the count is exact.  Unlike HLL the sample
# supports SET ALGEBRA: the k smallest hashes of A ∪ B are computable
# from the two sketches alone, and the fraction of that merged sample
# present in both sketches estimates Jaccard — so union / intersection
# cardinalities come from sketch pairs without touching raw data
# (Beyer et al., "On Synopses for Distinct-Value Estimation Under
# Multiset Operations", SIGMOD 2007).
#
# Hashing is the portable 12-hex-digit (48-bit) md5 prefix — exact in a
# BIGINT and in an IEEE double, so every estimate is a pure function of
# the data reproducible bit-for-bit in any engine with md5 (the x59/x62
# auditable-membership discipline; DuckDB replays it in the x178/x179
# oracles).
#
# Plan shape: build dedups (group, element) — one map-side-combined
# shuffle — then prunes each scan partition to its LOCAL bottom-k per
# group before the single ranking window (top_k_per_group), so the
# group-key exchange carries ≤ k × partitions rows per group no matter
# the corpus size.  The sketch itself is a ≤ k-element array per group;
# merge/estimate are pure Catalyst array expressions over those arrays.

_KMV_SPACE = float(1 << 48)


def kmv_hash(col, salt: str = "kmv"):
    """Portable 48-bit hash: BIGINT of the first 12 hex digits of
    ``md5(salt || '-' || value)`` — uniform on [0, 2^48), exactly
    representable in BIGINT and DOUBLE."""
    s = F.concat_ws("-", F.lit(salt), col)
    return F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("long")


def kmv_build(df: DataFrame, term_col: str, group_cols: list[str],
              k: int = 128, salt: str = "kmv") -> DataFrame:
    """Bottom-k sketch per group: ``group_cols… , kmv array<long>
    (ascending, ≤ k), kmv_n int``.  Input rows may repeat elements —
    the build dedups first."""
    from .topk import top_k_per_group

    h = (df.select(*group_cols, kmv_hash(F.col(term_col), salt)
                   .alias("__h"))
           .distinct())
    kept = top_k_per_group(h, group_cols, F.col("__h").asc(), k,
                           keep_rank=False)
    return (kept.groupBy(*group_cols)
                .agg(F.sort_array(F.collect_list("__h")).alias("kmv"),
                     F.count(F.lit(1)).cast("int").alias("kmv_n")))


def kmv_distinct_est(kmv_col, k: int):
    """Distinct-count estimate from a sketch array: exact when the
    sketch holds the whole set (fewer than k values), else the
    order-statistic estimator (k-1) · 2^48 / h_k."""
    n = F.size(kmv_col)
    return F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(_KMV_SPACE)
        / F.element_at(kmv_col, k).cast("double"))


def kmv_merge(kmv_a, kmv_b, k: int):
    """Sketch of A ∪ B from two sketches: the k smallest distinct
    hashes of the concatenation (ascending array)."""
    return F.slice(F.array_sort(F.array_distinct(
        F.concat(kmv_a, kmv_b))), 1, k)


def kmv_set_estimates(kmv_a, kmv_b, k: int):
    """``struct(union_est, intersect_est, jaccard_est)`` from two
    sketches.  The merged bottom-k sample K estimates |A ∪ B|; the
    fraction of K present in BOTH input sketches estimates Jaccard;
    their product estimates |A ∩ B| (Beyer et al. 2007)."""
    merged = kmv_merge(kmv_a, kmv_b, k)
    union_est = kmv_distinct_est(merged, k)
    in_both = F.size(F.filter(
        merged, lambda h: F.array_contains(kmv_a, h)
        & F.array_contains(kmv_b, h)))
    jac = in_both.cast("double") / F.size(merged).cast("double")
    return F.struct(union_est.alias("union_est"),
                    (jac * union_est).alias("intersect_est"),
                    jac.alias("jaccard_est"))


# ---------------------------------------------------------------------------
# Bloom-filter join pruning
# ---------------------------------------------------------------------------
#
# The 100 TB semi-join pattern: when a huge fact table joins a selective
# dimension, shuffle NOTHING until the fact side has been pre-filtered
# by a bitset of the dimension's keys.  The filter is bits, not keys —
# a few KB broadcast as a plan literal — and the pass is map-only, so
# the exchange that follows carries matches (plus the measured false-
# positive share) instead of the whole fact table.  Spark's runtime
# row-level filtering does this opportunistically; this operator makes
# it explicit, deterministic (portable md5 bit positions, so the FP set
# itself is reproducible in the x180 oracle), and observable.
#
# Words are 32-bit (stored in BIGINT) so every ``bit_or`` / shift /
# mask stays far from sign trouble in any engine.

def _bloom_pos(col, j: int, n_bits: int, salt: str):
    s = F.concat_ws("-", F.lit(salt), F.lit(str(j)), col)
    return (F.conv(F.substring(F.md5(s), 1, 8), 16, 10)
             .cast("long") % n_bits)


def bloom_build(df: DataFrame, key_col: str, n_bits: int = 4096,
                n_hashes: int = 2, salt: str = "bf") -> list[int]:
    """Build the filter over ``df``'s keys; returns the dense word
    list (``n_bits / 32`` ints — KBs, a driver-side literal by design:
    the whole point is that the filter rides the plan, not a join)."""
    pos = F.explode(F.array(*[
        _bloom_pos(F.col(key_col), j, n_bits, salt)
        for j in range(n_hashes)])).alias("p")
    # bit = 2^(p mod 32) via pow — exact in a double below 2^53, and
    # portable (pyspark's shiftleft only takes a literal shift count)
    bit = F.pow(F.lit(2.0), (F.col("p") % 32).cast("double")) \
           .cast("long")
    rows = (df.select(pos)
              .groupBy(F.floor(F.col("p") / 32).cast("int").alias("w"))
              .agg(F.bit_or(bit).alias("bits"))
              .collect())
    words = [0] * ((n_bits + 31) // 32)
    for r in rows:
        words[r["w"]] = r["bits"]
    return words


def bloom_might_contain(col, words: list[int], n_bits: int = 4096,
                        n_hashes: int = 2, salt: str = "bf"):
    """Boolean Column: every hash position's bit is set.  ``words`` is
    embedded as an array literal — the probe is a pure map-side
    expression, no join, no shuffle."""
    arr = F.array(*[F.lit(int(w)) for w in words])
    cond = F.lit(True)
    for j in range(n_hashes):
        p = _bloom_pos(col, j, n_bits, salt)
        word = F.element_at(arr, F.floor(p / 32).cast("int") + 1)
        down = F.floor(word.cast("double")
                       / F.pow(F.lit(2.0), (p % 32).cast("double")))
        cond = cond & (down % 2 == 1)
    return cond


def mg_heavy_hitters(df: DataFrame, term_col: str, k: int = 16):
    """Misra–Gries frequent-items sketch (Misra & Gries 1982), the
    deterministic heavy-hitter guarantee in O(k) space: one
    ``mapInPandas`` pass builds a k-counter summary PER PARTITION
    (bounded memory however large the key space — the regime where
    the exact groupBy's shuffle is the problem), the driver merges
    the ≤ k·partitions summary rows by counter addition and one final
    MG reduction.

    Returns ``(items, n_total)``: ``items`` = list of ``(term,
    est)`` with ``est ≤ true_count`` and ``true_count − est ≤
    n_total/(k+1)`` — so every term with true frequency >
    n_total/(k+1) is GUARANTEED present (the classic MG bound,
    preserved under summary merging per Agarwal et al. 2013).
    Estimates depend on partitioning (the sketch is order-sensitive);
    the GUARANTEE does not — x225 self-grades it against exact
    counts.

    Driver traffic: ≤ k rows per partition — never the key space."""
    import pandas as pd

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            for v in pdf[term_col].astype(str):
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    dead = [t for t in counters
                            if counters[t] == 1]
                    for t in counters:
                        counters[t] -= 1
                    for t in dead:
                        del counters[t]
        yield pd.DataFrame({"term": list(counters),
                            "cnt": list(counters.values())})

    n_total = df.filter(F.col(term_col).isNotNull()).count()
    rows = (df.select(F.col(term_col))
              .filter(F.col(term_col).isNotNull())
              .mapInPandas(summarize, "term string, cnt long")
              .collect())
    merged: dict = {}
    for r in rows:
        merged[r["term"]] = merged.get(r["term"], 0) + int(r["cnt"])
    if len(merged) > k:
        # MG reduction of the merged summary: subtract the (k+1)-th
        # largest count, drop non-positives (Agarwal 2013 §3.1)
        cut = sorted(merged.values(), reverse=True)[k]
        merged = {t: c - cut for t, c in merged.items() if c - cut > 0}
    items = sorted(merged.items(), key=lambda tc: (-tc[1], tc[0]))
    return items, int(n_total)
