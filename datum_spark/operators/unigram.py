"""Unigram-LM (SentencePiece-style) tokenizer: seed + hard-EM training
and Viterbi encoding.

The reference has no tokenizer at all (its 1,390 lines are SQL
assembly over a backend RDBMS — `/root/reference/datum/table.py`);
this is a §2-C training-data-pipeline extension, the second tokenizer
family next to BPE (`operators/bpe.py`).  Kudo (2018)'s unigram model
scores a segmentation by the sum of piece costs (negative
log-probabilities) and trains by EM; this implementation uses the
deterministic HARD-EM variant (Viterbi counts), which makes the whole
trajectory exactly replayable in SQL — the x200 oracle re-runs seed
construction, every Viterbi DP and every M-step re-normalization
value-for-value in DuckDB.

Scale posture (the learn_bpe_merges_local discipline, VERDICT r8/r9):

- TRAINING touches the corpus exactly once — the word-frequency pass.
  EM then runs driver-side over the collected vocabulary-sized table
  (~10⁷ rows at 100 TB corpus scale, Kudo's own in-memory regime):
  per EM iteration one Python Viterbi sweep over the vocab, state =
  the piece table.  A distributed spelling would be one Spark job per
  EM iteration of pure DP — all constant factors, no data-parallel
  win, because the input is the vocab, not the corpus.
- ENCODING is the corpus-scale path and stays fully distributed and
  JVM-side: the piece-cost map is built at runtime from a one-row
  aggregated DataFrame (map_from_entries over collect_list) and
  broadcast-cross-joined — NOT inlined as a create_map literal, so a
  32k-piece vocab adds ~0 bytes to the plan tree (the r8 fit-plan
  lesson) — and the Viterbi DP itself is ONE Catalyst `aggregate`
  expression over character positions (whole-stage codegen, no UDF):
  map-only, no shuffle, linear in corpus size.

Determinism: a DP state is packed into one sortable ASCII string
``%013.6f`` (score) ``%03d`` (token count) ``\\x1e``-joined pieces, and
the transition takes the STRING MINIMUM over candidates — so the
objective is lexicographic (min score, then fewest tokens, then the
\\x1e-least segmentation; ties compare equal-length strings since an
equal score+count fixes the segmentation string length).  Scores are
re-rounded half-away to 6 dp at every addition, keeping float noise
~1e-16 far from the 5e-7 rounding boundary — Python, Spark and DuckDB
produce bit-identical state strings (property-tested three ways in
tests/test_unigram.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .similarity import _round_half_away

D = "\x1e"          # segmentation delimiter inside a packed DP state
_MAX_WORD = 999     # %03d token count / %013.6f score stay exact below


def _fmt(score: float, ntok: int, seg: str) -> str:
    return f"{score:013.6f}{ntok:03d}{seg}"


def _parse(v: str) -> tuple[float, int, str]:
    return float(v[:13]), int(v[13:16]), v[16:]


def viterbi_state(word: str, cost: dict[str, float],
                  max_piece_len: int = 4) -> str:
    """Packed DP state of the best segmentation of ``word`` (min cost,
    then fewest pieces, then \\x1e-least) — the driver-side reference
    spelling of the Catalyst expression in :func:`unigram_encode`.

    Words longer than 999 characters are rejected: the packed state's
    ``%03d`` token-count field (and the 6-integer-digit score field,
    given trained costs ≤ ``ln(2^63) ≈ 43.7``) is exact only below
    1,000 pieces — beyond it the field widths shift and the sortable
    encoding silently corrupts.  The Catalyst twin returns NULL for
    such words instead."""
    if len(word) > _MAX_WORD:
        raise ValueError(
            f"word longer than {_MAX_WORD} chars overflows the packed "
            f"DP state; pre-split or drop it (the corpus trainers cap "
            f"at max_word_len)")
    acc = [_fmt(0.0, 0, "")]
    for m in range(1, len(word) + 1):
        cands = []
        for ln in range(1, min(max_piece_len, m) + 1):
            piece = word[m - ln:m]
            c = cost.get(piece)
            if c is not None:
                s, n, seg = _parse(acc[m - ln])
                cands.append(_fmt(_round_half_away(s + c, 6), n + 1,
                                  seg + D + piece))
        # coverage: training seeds EVERY character, so a trained vocab
        # always yields a candidate; an out-of-vocabulary character is
        # a caller error (the Catalyst twin returns NULL there)
        acc.append(min(cands))
    return acc[len(word)]


def _mstep(counts: dict[str, int]) -> dict[str, float]:
    """Piece costs from counts: ``round(-ln(c / total), 6)``."""
    total = sum(counts.values())
    return {p: _round_half_away(-math.log(c / total), 6)
            for p, c in counts.items()}


def _seed_counts(word_counts: list[tuple[str, int]],
                 max_piece_len: int, seed_multi: int) -> dict[str, int]:
    """Seed vocabulary counts: every single character plus the
    ``seed_multi`` most frequent substrings of length 2..max_piece_len
    (count DESC, piece ASC)."""
    sub: dict[str, int] = {}
    for w, cnt in word_counts:
        for i in range(len(w)):
            for ln in range(1, max_piece_len + 1):
                if i + ln <= len(w):
                    p = w[i:i + ln]
                    sub[p] = sub.get(p, 0) + cnt
    chars = {p: c for p, c in sub.items() if len(p) == 1}
    multi = sorted((p for p in sub if len(p) > 1),
                   key=lambda p: (-sub[p], p))[:seed_multi]
    counts = dict(chars)
    counts.update({p: sub[p] for p in multi})
    return counts


def _em_counts(word_counts: list[tuple[str, int]],
               cost: dict[str, float],
               max_piece_len: int) -> dict[str, int]:
    """One hard-EM count step: Viterbi-segment every word under
    ``cost``, count piece usage weighted by word frequency, floor
    unused single characters at 1 (coverage), drop unused multis."""
    usage: dict[str, int] = {}
    for w, cnt in word_counts:
        seg = _parse(viterbi_state(w, cost, max_piece_len))[2]
        for p in seg.split(D):
            if p:
                usage[p] = usage.get(p, 0) + cnt
    counts: dict[str, int] = {}
    for p in cost:
        c = usage.get(p, 1 if len(p) == 1 else 0)
        if c > 0:
            counts[p] = c
    return counts


def prune_schedule(seed_multi: int, target_multi: int,
                   shrink: float = 0.75) -> list[int]:
    """The deterministic multi-piece keep schedule (Kudo 2018 §4's
    shrinking factor): ``K₀ = seed_multi``,
    ``Kᵣ = max(target, ceil(Kᵣ₋₁ · shrink))`` until it reaches
    ``target_multi``.  The schedule depends only on the PARAMETERS —
    never on how many pieces actually survive a round — so the DuckDB
    oracle can unroll exactly the same rounds (x206).  The schedule is
    STRICTLY decreasing: at small k ``ceil(k·shrink)`` can equal k
    (e.g. ceil(2·0.75) = 2), which would stall the loop forever — the
    step is clamped to k−1 there, so the tail always walks down to the
    target."""
    if not 0.0 < shrink < 1.0:
        raise ValueError("shrink must be in (0, 1)")
    ks: list[int] = []
    k = seed_multi
    while k > target_multi:
        k = max(target_multi, min(k - 1, math.ceil(k * shrink)))
        ks.append(k)
    return ks


def unigram_train_pruned(word_counts: list[tuple[str, int]],
                         target_multi: int = 24, seed_multi: int = 96,
                         shrink: float = 0.75, final_iters: int = 1,
                         max_piece_len: int = 4,
                         ) -> list[tuple[str, int, float]]:
    """Vocabulary-size-targeted unigram training (Kudo 2018 §4 in the
    deterministic hard-EM spelling): seed a LARGE candidate set
    (``seed_multi`` multis), then per prune round run one hard-EM
    iteration and keep only the top-``Kᵣ`` multi-char pieces by
    likelihood contribution — ``round(cnt × cost, 6)`` DESC, piece
    ASC, the nats the corpus currently pays through the piece (the
    standard prune proxy: removing a high-contribution piece forces
    its occurrences onto strictly costlier segmentations) — with
    ``Kᵣ`` following :func:`prune_schedule` down to ``target_multi``;
    single characters are never pruned (coverage).  ``final_iters``
    plain EM iterations settle the costs.  Every round's usage counts,
    contribution ranks and re-normalizations are exactly replayable in
    SQL (the x206 oracle).  Returns ``(piece, cnt, cost)`` sorted by
    piece: ``len(chars) + target_multi`` rows when ≥ target_multi
    multis survive their usage floor."""
    counts = _seed_counts(word_counts, max_piece_len, seed_multi)
    cost = _mstep(counts)
    for k in prune_schedule(seed_multi, target_multi, shrink):
        counts = _em_counts(word_counts, cost, max_piece_len)
        cost = _mstep(counts)
        multis = [p for p in counts if len(p) > 1]
        kept = sorted(
            multis,
            key=lambda p: (-_round_half_away(counts[p] * cost[p], 6), p)
        )[:k]
        keep = set(kept)
        counts = {p: c for p, c in counts.items()
                  if len(p) == 1 or p in keep}
        cost = _mstep(counts)
    for _ in range(max(0, final_iters)):
        counts = _em_counts(word_counts, cost, max_piece_len)
        cost = _mstep(counts)
    return sorted((p, counts[p], cost[p]) for p in counts)


def unigram_train_local(word_counts: list[tuple[str, int]],
                        iters: int = 2, max_piece_len: int = 4,
                        seed_multi: int = 40,
                        ) -> list[tuple[str, int, float]]:
    """Seed + hard-EM unigram training over a (word, cnt) vocabulary.

    Seed = every single character plus the ``seed_multi`` most frequent
    substrings of length 2..max_piece_len (count DESC, piece ASC).
    Each EM iteration: Viterbi-segment every word under the current
    costs, count piece usage weighted by word frequency, floor unused
    single characters at count 1 (coverage must survive), drop unused
    multi-character pieces, re-normalize.  Returns the final
    ``(piece, cnt, cost)`` rows sorted by piece — vocabulary-sized
    driver state, every number replayable (the x200 oracle)."""
    counts = _seed_counts(word_counts, max_piece_len, seed_multi)
    cost = _mstep(counts)
    for _ in range(iters):
        counts = _em_counts(word_counts, cost, max_piece_len)
        cost = _mstep(counts)
    return sorted((p, counts[p], cost[p]) for p in counts)


def unigram_trained_vocab(docs: DataFrame, iters: int = 2,
                          max_piece_len: int = 4, seed_multi: int = 40,
                          max_word_len: int = 16,
                          text_col: str = "text"):
    """The ONE training recipe every consumer shares (x200/x201/x204/
    x205 and :func:`unigram_vocab_table`): word-frequency pass →
    ``max_word_len`` cap → collect → :func:`unigram_train_local`.
    Returns ``(words_df, vocab_list)`` — the words frame is cached in
    the bounded operator ring (it feeds both the training collect and
    the callers' encode branches).  Keeping the recipe in one place is
    what keeps the four entries' trajectories — and their DuckDB
    oracles — from silently diverging."""
    from ..util import retain_cache
    from .bpe import word_frequencies

    words = retain_cache(word_frequencies(docs, text_col)
                         .filter(F.length("word") <= max_word_len))
    rows = [(r["word"], int(r["cnt"])) for r in words.collect()]
    vocab = unigram_train_local(rows, iters=iters,
                                max_piece_len=max_piece_len,
                                seed_multi=seed_multi)
    return words, vocab


def unigram_pruned_vocab(docs: DataFrame, target_multi: int = 24,
                         seed_multi: int = 96, shrink: float = 0.75,
                         final_iters: int = 1, max_piece_len: int = 4,
                         max_word_len: int = 16, text_col: str = "text"):
    """The pruned-training twin of :func:`unigram_trained_vocab` —
    SAME corpus recipe (one word-frequency pass, ``max_word_len`` cap,
    vocabulary collected once), then :func:`unigram_train_pruned`
    driver-side.  Returns ``(words_df, vocab_list)``; the x206 oracle
    replays the whole schedule."""
    from ..util import retain_cache
    from .bpe import word_frequencies

    words = retain_cache(word_frequencies(docs, text_col)
                         .filter(F.length("word") <= max_word_len))
    rows = [(r["word"], int(r["cnt"])) for r in words.collect()]
    vocab = unigram_train_pruned(rows, target_multi=target_multi,
                                 seed_multi=seed_multi, shrink=shrink,
                                 final_iters=final_iters,
                                 max_piece_len=max_piece_len)
    return words, vocab


def unigram_vocab_table(spark: SparkSession, docs: DataFrame,
                        iters: int = 2, max_piece_len: int = 4,
                        seed_multi: int = 40, max_word_len: int = 16,
                        text_col: str = "text") -> DataFrame:
    """Train on a corpus: ONE word-frequency pass (the only corpus
    touch), vocabulary collected once, EM driver-side.  Words longer
    than ``max_word_len`` are excluded (tail noise for a subword
    vocabulary; also bounds the oracle's DP unroll)."""
    _words, vocab = unigram_trained_vocab(
        docs, iters=iters, max_piece_len=max_piece_len,
        seed_multi=seed_multi, max_word_len=max_word_len,
        text_col=text_col)
    return spark.createDataFrame(vocab,
                                 "piece string, cnt bigint, cost double")


def unigram_encode(words: DataFrame, vocab: list[tuple[str, int, float]],
                   word_col: str = "word",
                   max_piece_len: int = 4) -> DataFrame:
    """Distributed Viterbi encoding: adds ``score`` / ``n_tokens`` /
    ``seg`` (``|``-joined pieces) for every row's ``word_col``.

    The piece-cost map is aggregated into ONE runtime row and
    broadcast (zero plan-tree growth for any vocab size); the DP is a
    single Catalyst ``aggregate`` over character positions — map-only,
    codegen'd, no UDF, no shuffle.  Bit-equal to
    :func:`viterbi_state` (tested).  Words over 999 chars (or with an
    out-of-vocabulary character) yield NULL score/n_tokens/seg — the
    packed state is exact only below 1,000 pieces; costs ≥ 1000 are
    rejected for the same field-width reason (trained costs are
    ≤ ln(2^63) ≈ 43.7)."""
    if any(c >= 1000.0 for _p, _n, c in vocab):
        raise ValueError("piece cost >= 1000 overflows the packed "
                         "score field")
    spark = words.sparkSession
    vocab_df = spark.createDataFrame(
        [(p, float(c)) for p, _n, c in vocab], "piece string, cost double")
    cm = vocab_df.agg(F.map_from_entries(
        F.collect_list(F.struct("piece", "cost"))).alias("__cm"))
    prev = f"element_at(acc, m - l + 1)"
    piece = f"substring({word_col}, m - l + 1, l)"
    dp = f"""aggregate(
      sequence(1, length({word_col})),
      array(concat(printf('%013.6f', 0.0d), printf('%03d', 0), '')),
      (acc, m) -> array_append(acc, array_min(filter(
        transform(sequence(1, least({max_piece_len}, m)), l ->
          CASE WHEN element_at(__cm, {piece}) IS NOT NULL THEN concat(
            printf('%013.6f', round(
              cast(substring({prev}, 1, 13) AS double)
              + element_at(__cm, {piece}), 6)),
            printf('%03d', cast(substring({prev}, 14, 3) AS int) + 1),
            substring({prev}, 17, 2147483647), chr(30), {piece})
          ELSE NULL END),
        x -> x IS NOT NULL))),
      acc -> element_at(acc, length({word_col}) + 1))"""
    dp = (f"CASE WHEN length({word_col}) > {_MAX_WORD} THEN NULL "
          f"ELSE {dp} END")
    return (words.crossJoin(F.broadcast(cm))
            .withColumn("__v", F.expr(dp))
            .withColumn("score",
                        F.substring("__v", 1, 13).cast("double"))
            .withColumn("n_tokens",
                        F.substring("__v", 14, 3).cast("int"))
            .withColumn("seg", F.array_join(
                F.filter(F.split(F.substring("__v", 17, 2147483647),
                                 D), lambda x: x != F.lit("")), "|"))
            .drop("__v", "__cm"))


# distinct quantized score values below this: collect the histogram
# and walk it driver-side; above: distributed boundary join (both
# paths equality-tested in tests/test_unigram.py)
_HIST_FAST_PATH_ROWS = 200_000


def _round6_half_up(x: float) -> float:
    """Spark's ``round(x, 6)`` on a double: shortest-repr decimal,
    setScale(6, HALF_UP) — replicated bit-for-bit (Python's ``repr``
    is the same shortest round-trip string as ``Double.toString``)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(float(x)))
                 .quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP))


def _tercile_cuts(scores: DataFrame, group_cols: list[str],
                  value_col: str = "nats_per_token",
                  ps: tuple[float, ...] = (1.0 / 3, 2.0 / 3),
                  ) -> dict[tuple, list[float]]:
    """Exact interpolated percentiles per group WITHOUT the exact-
    ``percentile`` aggregation buffer (r12, VERDICT item 6).

    Spark's exact ``percentile`` materializes every distinct
    (value, count) pair of a group inside ONE aggregation buffer in
    one task — bounded here by the 6-dp quantization of
    ``nats_per_token`` (~10⁷ distinct worst case), but still a
    single-task memory spike the repo avoids everywhere else.  This
    spelling derives the SAME cuts from an explicit histogram:

    1. ``groupBy(group, value)`` count — the only corpus-sized
       exchange, bounded by distinct quantized values, spread across
       tasks (no per-group buffer).
    2. Distributed cumulative counts (the curriculum prefix-sum
       shape): range partition on (group, value), per-(partition,
       group) sums to the driver (bounded by partitions × groups),
       broadcast offsets back, within-partition running sum.
    3. Only the ≤ 2×|ps| BOUNDARY rows per group — the distinct
       values whose cumulative span covers floor/ceil of each rank
       ``p × (N−1)`` — survive a broadcast theta-join and are
       collected (≤ 4 rows per group).  SIZE-GATED fast path (the
       rank_sampling small-input pattern): the offsets pass already
       counts the histogram rows, and when the whole histogram is
       small (≤ ``2×10⁵`` distinct quantized values) the persisted
       histogram collects directly and the cumulative walk runs
       driver-side — same cuts, none of the window/join jobs; the
       distributed spelling is the ≥ 10⁷-distinct-values path.
    4. Driver-side linear interpolation replicating Spark's
       ``Percentile.getPercentile`` expression order
       ``(hi−pos)·v_lo + (pos−lo)·v_hi`` and its HALF_UP 6-dp round,
       so the cuts are bit-identical to the exact aggregate (and to
       DuckDB's ``quantile_cont`` at 6 dp — the x208/x210 oracles).

    Returns ``{group_key_tuple: [cut per p]}``; groups with zero
    non-null scores are absent (the ADVICE r12 empty-corpus guard —
    callers emit an empty frame instead of ``float(None)``)."""
    import math as _math

    from pyspark.sql.types import LongType, StructField, StructType

    from ..session import default_parallelism

    spark = scores.sparkSession
    gcols = [F.col(c) for c in group_cols]
    hist = (scores.filter(F.col(value_col).isNotNull())
                  .groupBy(*gcols, F.col(value_col).alias("__v"))
                  .agg(F.count(F.lit(1)).alias("__cnt")))
    n = default_parallelism()
    d = (hist.repartitionByRange(n, *gcols, F.col("__v"))
             .withColumn("__pid", F.spark_partition_id())
             .persist())
    try:
        pairs = (d.groupBy("__pid", *group_cols)
                  .agg(F.sum("__cnt").alias("__c"),
                       F.count(F.lit(1)).alias("__nh")).collect())
        n_hist = sum(int(r["__nh"]) for r in pairs)
        by_group: dict[tuple, list] = {}
        for r in pairs:
            key = tuple(r[c] for c in group_cols)
            by_group.setdefault(key, []).append((r["__pid"],
                                                 int(r["__c"])))
        totals: dict[tuple, int] = {}
        off_rows = []
        for key, lst in by_group.items():
            acc = 0
            for pid, c in sorted(lst):
                off_rows.append((*key, pid, acc))
                acc += c
            totals[key] = acc
        if not totals:
            return {}
        # ranks each group needs: floor/ceil of every p × (N−1)
        need: dict[tuple, set[int]] = {}
        poss: dict[tuple, list[float]] = {}
        for key, total in totals.items():
            ks: set[int] = set()
            pp = []
            for p in ps:
                pos = p * (total - 1)
                ks.add(_math.floor(pos))
                ks.add(_math.ceil(pos))
                pp.append(pos)
            poss[key] = pp
            need[key] = ks
        val_at: dict[tuple, dict[int, float]] = {}
        if n_hist <= _HIST_FAST_PATH_ROWS:
            # small-histogram fast path: the persisted histogram fits
            # on the driver — one collect, a sorted cumulative walk,
            # zero window/join jobs.  Identical cuts by construction.
            by_key: dict[tuple, list] = {}
            for r in d.select(*group_cols, "__v", "__cnt").collect():
                key = tuple(r[c] for c in group_cols)
                by_key.setdefault(key, []).append(
                    (float(r["__v"]), int(r["__cnt"])))
            for key, vs in by_key.items():
                vs.sort()
                ks = need[key]
                cum = 0
                out_k = val_at.setdefault(key, {})
                for v, cnt in vs:
                    for k in ks:
                        if cum <= k < cum + cnt:
                            out_k[k] = v
                    cum += cnt
        else:
            # distributed boundary path — driver-built frames carry
            # RENAMED key columns (__g{i}) so every join condition is
            # unambiguous by name
            spec_rows = [(*key, int(k)) for key in sorted(
                             need, key=str)
                         for k in sorted(need[key])]
            gnames = [f"__g{i}" for i in range(len(group_cols))]
            gfields = [StructField(gn, d.schema[c].dataType)
                       for gn, c in zip(gnames, group_cols)]
            off = spark.createDataFrame(off_rows, StructType(
                gfields + [StructField("__opid", LongType()),
                           StructField("__off", LongType())]))
            spec = spark.createDataFrame(spec_rows, StructType(
                gfields + [StructField("__k", LongType())]))
            w = Window.partitionBy("__pid", *group_cols).orderBy("__v")
            gmatch = [F.col(c).eqNullSafe(F.col(gn))
                      for c, gn in zip(group_cols, gnames)]
            dd = (d.join(F.broadcast(off),
                         [F.col("__pid").cast("long")
                          == F.col("__opid")] + gmatch)
                   .drop("__opid", *gnames)
                   .withColumn("__cum", F.col("__off")
                               + F.sum("__cnt").over(w))
                   .withColumn("__cumprev", F.col("__cum")
                               - F.col("__cnt")))
            boundary = dd.join(
                F.broadcast(spec),
                gmatch + [F.col("__k") >= F.col("__cumprev"),
                          F.col("__k") < F.col("__cum")])
            for r in boundary.select(*group_cols, "__k",
                                     "__v").collect():
                key = tuple(r[c] for c in group_cols)
                val_at.setdefault(key, {})[int(r["__k"])] = \
                    float(r["__v"])
    finally:
        d.unpersist()
    out: dict[tuple, list[float]] = {}
    for key, pp in poss.items():
        cuts = []
        for pos in pp:
            lo, hi = _math.floor(pos), _math.ceil(pos)
            vlo = val_at[key][lo]
            if lo == hi:
                cuts.append(_round6_half_up(vlo))
            else:
                vhi = val_at[key][hi]
                cuts.append(_round6_half_up(
                    (hi - pos) * vlo + (pos - lo) * vhi))
        out[key] = cuts
    return out


def ccnet_buckets(docs: DataFrame, vocab: list[tuple[str, int, float]],
                  id_col: str = "doc_id", text_col: str = "text",
                  group_col: str = "source",
                  max_word_len: int = 16) -> DataFrame:
    """CCNet's head/middle/tail perplexity bucketing (Wenzek et al.
    2020 §4.3): documents split into TERCILES of the unigram-LM
    ``nats_per_token`` signal — "head" trains as-is, "tail" is the
    filter candidate, "middle" is the judgement call.  Returns one row
    per (``group_col``, bucket): ``(group_col, bucket, n_docs,
    mean_nats)``.

    Scale shape: NO global sort — the tercile cuts come from the
    histogram of the 6-dp-quantized score (:func:`_tercile_cuts`,
    r12: distinct-value groupBy + distributed cumulative counts +
    ≤ 4 collected boundary rows; bit-identical to Spark's exact
    ``percentile`` but with NO single-task aggregation buffer at any
    corpus size), then bucketing is a map-only CASE and the output is
    a ≤ (groups × 3)-row count shuffle.  The per-doc scores reuse
    :func:`unigram_doc_scores` (Viterbi once per distinct word;
    corpus never meets the DP).  Zero scored docs (all texts empty /
    OOV / over-long) → an EMPTY (group, bucket) frame with the output
    schema, not a NULL-cut TypeError (ADVICE r12).  The per-doc score
    frame rides the bounded operator cache ring — the cut derivation
    and the final bucket aggregation share ONE computation of the
    Viterbi chain instead of re-deriving it per consumer."""
    from ..util import retain_cache

    scores = retain_cache(unigram_doc_scores(docs, vocab,
                                             id_col=id_col,
                                             text_col=text_col,
                                             max_word_len=max_word_len))
    cutmap = _tercile_cuts(scores, [])
    if not cutmap:
        scores = scores.filter(F.lit(False))
        c1 = c2 = 0.0
    else:
        c1, c2 = cutmap[()]
    bucket = (F.when(F.col("nats_per_token") <= c1, "head")
               .when(F.col("nats_per_token") <= c2, "middle")
               .otherwise("tail"))
    return (scores.join(docs.select(F.col(id_col),
                                    F.col(group_col)), id_col)
            .groupBy(F.col(group_col), bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 # round the SUM before dividing: a raw AVG's float
                 # summation order can straddle the 6-dp boundary and
                 # flip the last digit between engines (the x202
                 # ADVICE failure mode); the sum of 6-dp values is
                 # stable to ~1e-13, so round(sum)/n is deterministic
                 F.round(F.round(F.sum("nats_per_token"), 6)
                         / F.count(F.lit(1)), 6).alias("mean_nats"))
            .orderBy(group_col, "bucket"))


def ccnet_buckets_by_group(docs: DataFrame,
                           vocab: list[tuple[str, int, float]],
                           id_col: str = "doc_id",
                           text_col: str = "text",
                           group_col: str = "lang",
                           max_word_len: int = 16) -> DataFrame:
    """CCNet's bucketing AS PUBLISHED (Wenzek et al. 2020 §4.3):
    head/middle/tail terciles computed WITHIN each group — the paper
    buckets per LANGUAGE, because perplexity scales differ across
    languages and a global cut would classify whole languages as
    "tail".  Returns ``(group_col, bucket, n_docs, mean_nats, c1,
    c2)`` — the per-group cut points ride along so the thresholds a
    serving filter would pin are part of the audited output.

    Scale shape: the per-group cuts come from the histogram of the
    6-dp-quantized score (:func:`_tercile_cuts`, r12 — bit-identical
    to the grouped exact ``percentile`` but with no per-group
    single-task aggregation buffer; the grouped percentile buffers
    every distinct (value, count) pair of a LANGUAGE in one task,
    which at 100 TB is exactly the spike the repo avoids elsewhere),
    broadcast back as a groups × 2-double table; bucketing is a
    map-only CASE after a broadcast equi-join on the group — still no
    global sort, and the only corpus-sized exchanges are the per-doc
    score aggregation and the final ≤ groups×3-row count.  Groups
    with zero non-null scores contribute no rows (ADVICE r12: never
    ``float(None)`` on NULL cuts)."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    from ..util import retain_cache

    scores = unigram_doc_scores(docs, vocab, id_col=id_col,
                                text_col=text_col,
                                max_word_len=max_word_len)
    # cache the (score ⋈ group) frame: the cut histogram and the final
    # bucket aggregation share one Viterbi-chain computation
    g = retain_cache(
        scores.join(docs.select(F.col(id_col), F.col(group_col)),
                    id_col))
    cutmap = _tercile_cuts(g, [group_col])
    cuts = docs.sparkSession.createDataFrame(
        [(k[0], cc[0], cc[1]) for k, cc in sorted(
            cutmap.items(), key=lambda kv: str(kv[0]))
         if k[0] is not None],
        StructType([g.schema[group_col],
                    StructField("c1", DoubleType()),
                    StructField("c2", DoubleType())]))
    bucket = (F.when(F.col("nats_per_token") <= F.col("c1"), "head")
               .when(F.col("nats_per_token") <= F.col("c2"), "middle")
               .otherwise("tail"))
    return (g.join(F.broadcast(cuts), group_col)
             .groupBy(group_col, bucket.alias("bucket"),
                      "c1", "c2")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  # round-sum-then-divide: engine-stable 6-dp mean
                  F.round(F.round(F.sum("nats_per_token"), 6)
                          / F.count(F.lit(1)), 6)
                  .alias("mean_nats"))
             .select(group_col, "bucket", "n_docs", "mean_nats",
                     "c1", "c2")
             .orderBy(group_col, "bucket"))


def unigram_doc_scores(docs: DataFrame,
                       vocab: list[tuple[str, int, float]],
                       id_col: str = "doc_id", text_col: str = "text",
                       max_word_len: int = 16) -> DataFrame:
    """Per-document unigram-LM cost — the CCNet-style learned quality
    signal: documents whose words the LM finds cheap (low
    ``nats_per_token``) look like the training distribution; expensive
    ones are gibberish/boilerplate/wrong-language candidates for a
    threshold filter.

    Returns ``(id_col, n_words, n_tokens, total_cost,
    nats_per_token)`` where ``total_cost`` sums the Viterbi
    segmentation costs of the doc's words (lowercase alpha, length ≤
    ``max_word_len``; longer words and words with out-of-vocabulary
    characters are excluded from both sums).

    Scale shape: the Viterbi DP runs ONCE PER DISTINCT WORD
    (vocabulary-sized — :func:`unigram_encode`'s map-only expression),
    then joins onto the exploded corpus words; the only corpus-sized
    exchange is the final per-doc aggregation.  At 100 TB the corpus
    never meets the DP — only the vocab does.  The join is
    SIZE-GATED (:func:`~datum_spark.util.gated_broadcast`): the
    distinct-word table is 10⁷–10⁸ rows on a web corpus, where an
    unconditional broadcast hint is an executor OOM — below the gate
    it broadcasts, above it the planner shuffles on ``word`` (both
    paths equality-tested in tests/test_unigram.py)."""
    from ..util import gated_broadcast

    words = (docs.select(F.col(id_col),
                         F.explode(F.split(F.lower(F.col(text_col)),
                                           "[^a-z]+")).alias("word"))
                 .filter((F.col("word") != "")
                         & (F.length("word") <= max_word_len)))
    dw = words.select("word").distinct()
    scored = (unigram_encode(dw, vocab)
              .filter(F.col("score").isNotNull())
              .select("word", "score", "n_tokens"))
    # size evidence from the PLAIN distinct-word plan: estimating the
    # encoded frame would re-optimize the Viterbi aggregate expression
    # (~200 ms per call, measured) for the same row count
    return (words.join(gated_broadcast(scored, probe=dw), "word")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum("n_tokens").cast("long").alias("n_tokens"),
                 F.round(F.sum("score"), 6).alias("total_cost"),
                 F.round(F.sum("score") / F.sum("n_tokens"), 6)
                 .alias("nats_per_token")))
