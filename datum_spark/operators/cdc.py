"""Change-data-capture apply: materialize a changelog (insert / update /
delete rows with a sequence order) onto a keyed snapshot.

This is the batch half of keeping a 100 TB corpus current from an ingest
feed — the shape of Delta/Hudi `MERGE`/`APPLY CHANGES`, expressed as plain
DataFrame ops so it works on raw parquet:

  1. last-wins reduction of the changelog per key (one hash shuffle on
     the key; ``row_number`` over (key, seq DESC) with a deterministic
     tie-break — never a global window);
  2. full-outer join of the reduced changelog onto the snapshot on the
     SAME key (Catalyst reuses the hash partitioning from step 1, so the
     changelog side is not re-shuffled);
  3. resolve: key only in snapshot → keep; effective op D → drop;
     otherwise the changelog row wins.

Scale posture: both shuffles are keyed by the join key; the changelog is
typically ≪ snapshot, so AQE turns step 2 into a broadcast when it fits.
No driver-side state, no global ordering.

Reference parity: the reference's write path exposes truncate+bulk insert
only (/root/reference/datum/postgis/table.py); CDC apply is part of the
"beyond the reference" pipeline surface, alongside Table.upsert (which it
generalizes: upsert = apply_changes with all ops = U and no deletes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def last_wins(changes: DataFrame, keys: list[str], seq_cols: list[str],
              ) -> DataFrame:
    """Reduce a changelog to one effective row per key: the row with the
    greatest ``seq_cols`` (compared in order, descending) wins.

    ``seq_cols`` must be a deterministic total order within each key
    (e.g. ``["ts", "event_id"]``); otherwise the winner is undefined.
    """
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in seq_cols])
    return (changes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def apply_changes(snapshot: DataFrame, changes: DataFrame,
                  keys: list[str], seq_cols: list[str],
                  op_col: str = "op", delete_op: str = "D") -> DataFrame:
    """Apply a changelog onto ``snapshot``. ``changes`` must carry the key
    columns, ``op_col`` (whose value ``delete_op`` means delete; anything
    else is an upsert), ``seq_cols``, and the same payload columns as the
    snapshot. Returns the next snapshot with the snapshot's schema.

    Semantics (matching SQL MERGE with last-wins source dedup):
      * key untouched by the changelog → snapshot row kept;
      * effective (latest) op is delete → row absent, even if the key was
        never in the snapshot;
      * effective op is upsert → changelog payload, inserting if new.
    """
    payload = [c for c in snapshot.columns if c not in keys]
    # the op marker joins under a reserved name so a snapshot payload
    # column that happens to be named ``op_col`` (e.g. an 'op' field in
    # the data) cannot collide with it in the full-outer join
    eff = last_wins(changes, keys, seq_cols).select(
        *keys, F.col(op_col).alias("__cdc_op"),
        *[F.col(c).alias(f"__ch_{c}") for c in payload])
    joined = snapshot.join(eff, on=keys, how="full_outer")
    alive = joined.filter(
        F.col("__cdc_op").isNull() | (F.col("__cdc_op") != F.lit(delete_op)))
    cols = [F.col(k) for k in keys] + [
        F.when(F.col("__cdc_op").isNotNull(), F.col(f"__ch_{c}"))
         .otherwise(F.col(c)).alias(c)
        for c in payload]
    return alive.select(*cols)


def rollup_fold(prev: DataFrame | None, changes: DataFrame,
                keys: list[str], sum_cols: list[str],
                op_col: str = "op") -> DataFrame:
    """Incremental MAINTENANCE of an additive rollup (count + sums per
    key) from a change batch — the materialized-aggregate update that
    lets a 100 TB warehouse keep its rollups fresh WITHOUT
    re-aggregating the fact table: additive aggregates are abelian
    under insert/delete, so folding ``+row`` / ``−row`` deltas into
    the previous rollup equals a full recompute over the net row set,
    batch by batch, in any order of batching.

    ``changes`` carries ``op_col`` ∈ {'I', 'D'} (an update is D+I —
    the :func:`apply_changes` convention); ``prev`` is the previous
    rollup (``None`` bootstraps from an empty one).  Returns the new
    rollup ``(keys..., n, sum_<col>...)`` with zero-count keys
    DROPPED (a fully-deleted key leaves the rollup, exactly like the
    recompute).

    Scale shape: one partial-aggregated exchange over the CHANGE
    batch (delta-sized, never fact-sized), one keyed outer merge with
    the previous rollup (rollup-sized).  Non-additive aggregates
    (min/max, distinct) are out of contract — they need the fact
    table or a sketch (KMV) on delete."""
    sgn = F.when(F.col(op_col) == "I", F.lit(1)) \
           .when(F.col(op_col) == "D", F.lit(-1))
    d = (changes.groupBy(*keys)
         .agg(F.sum(sgn).alias("__dn"),
              *[F.sum(sgn * F.col(c)).alias(f"__ds_{c}")
                for c in sum_cols]))
    if prev is None:
        out = d.select(
            *keys, F.col("__dn").alias("n"),
            *[F.col(f"__ds_{c}").alias(f"sum_{c}")
              for c in sum_cols])
        return out.filter(F.col("n") != 0)
    merged = prev.join(d, keys, "full_outer")
    n = (F.coalesce(F.col("n"), F.lit(0))
         + F.coalesce(F.col("__dn"), F.lit(0)))
    sums = [(F.coalesce(F.col(f"sum_{c}"), F.lit(0.0))
             + F.coalesce(F.col(f"__ds_{c}"), F.lit(0.0)))
            .alias(f"sum_{c}") for c in sum_cols]
    return (merged.select(*keys, n.alias("n"), *sums)
                  .filter(F.col("n") != 0))
