"""One-pass pipeline metrics via Spark's Observation API.

A 100 TB pipeline cannot afford a second scan just to know how many rows
it wrote, how many nulls it filled, or what range a column spanned —
`df.count()` after `df.write` doubles the job. `Observation` attaches
aggregate metrics to the SAME action that materializes the data: the
metrics are folded map-side alongside the real work and surface on the
driver when the action finishes, at zero extra passes.

Usage::

    df, obs = observe(df, rows=F.count(F.lit(1)),
                      null_vals=F.count_if(F.col("value").isNull()))
    df.write.parquet(path)          # one job
    obs.get                        # {'rows': ..., 'null_vals': ...}
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation


def observe(df: DataFrame, **metrics) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to ``df``'s next action.

    ``metrics`` are aggregate Columns (count/sum/min/max/count_if...).
    Returns (df, observation); read ``observation.get`` AFTER the first
    action on the returned df. Metrics ride the action's own pass —
    no extra scan, no extra shuffle.
    """
    if not metrics:
        raise ValueError("observe() needs at least one named metric")
    obs = Observation()
    out = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    return out, obs
