"""North-star extension queries (SURVEY §2-C): dedup, similarity search,
text analysis, as-of/sessionization, multimodal plumbing, analytics,
corpus curation and spatial predicates — each wired as a driver-checkable
query over the documents/embeddings/events fixtures.

Oracle parity notes: where DuckDB can express the same computation
(list lambdas, ASOF JOIN, window functions), the entry carries oracle SQL
and is hash-checked; operators whose hashes are engine-specific (xxhash64
in MinHash/SimHash/fingerprint) are declared without an oracle → the driver
records a rows-only check, and unit tests cover their semantics instead.

Split into one module per domain in round 7 (the single file had grown
to ~5,800 lines); public surface is unchanged — ``EXTENSIONS``,
``queries()``, ``oracle_sql()``, ``load_docs``/``load_emb`` and the
monkeypatchable ``_RANK_SMALL_BYTES`` all live on this package exactly
as they lived on the module.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ._shared import (  # noqa: F401  — public re-exports
    _RANK_SMALL_BYTES,
    EXTENSIONS,
    load_docs,
    load_emb,
    x,
)

# registration side effects, in the historical declaration order (dict
# order feeds the driver-cap priority sort in __spark_entry__)
from . import dedup_sim_text  # noqa: E402,F401
from . import relational_multimodal  # noqa: E402,F401
from . import rank_sampling  # noqa: E402,F401
from . import sql_surface_profiling  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import corpus_curation  # noqa: E402,F401
from . import spatial  # noqa: E402,F401


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Oracle-checked queries first: the driver hash-verifies queries in
    dict order up to a cap, so rows-only entries (engine-specific hashes)
    must not displace hash-checkable ones from the verified set."""
    ordered = ([n for n, (_, sql) in EXTENSIONS.items() if sql is not None]
               + [n for n, (_, sql) in EXTENSIONS.items() if sql is None])
    return {name: EXTENSIONS[name][0] for name in ordered}


def oracle_sql() -> dict[str, str]:
    return {name: " ".join(sql.split())
            for name, (_, sql) in EXTENSIONS.items() if sql is not None}
