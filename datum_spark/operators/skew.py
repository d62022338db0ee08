"""Skew-mitigation join: salt-and-replicate for hot keys.

AQE's skew-join splitting (enabled in session defaults) handles most skew at
runtime, but only for sort-merge joins it can observe; explicit salting is
the standing technique when a hot key would otherwise pin one task: the big
(probe) side scatters each row to one of ``salt`` sub-keys, the small
(build) side replicates every row to ALL sub-keys, and the join key becomes
(key, salt) — a hot key's rows now spread over ``salt`` tasks.

Cost model: build side inflates ×salt (choose salt ≈ hottest-key-share ×
shuffle-partitions, not more), probe side is unchanged. Result set is
identical to the unsalted join (verified by test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, on: list[str] | str,
                how: str = "inner", salt: int = 8) -> DataFrame:
    """Equi-join with the build side replicated over ``salt`` sub-keys.

    ``big``'s salt is derived from a hash of its whole row (deterministic,
    partitioning-independent) — any uniform distribution works because the
    salt only spreads rows, it never changes match semantics.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    keys = [on] if isinstance(on, str) else list(on)
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                         F.lit(salt)).cast("int"))
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = big_s.join(small_s, keys + ["__salt"], how)
    return out.drop("__salt")
