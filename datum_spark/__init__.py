"""datum_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of CityOfPhiladelphia/datum.

The reference (read-only at /root/reference/) is a client-side SQL-assembly
library over PostGIS / Oracle ST_Geometry (``datum/__init__.py:3-8``,
``datum/database.py:7-20``).  This engine re-expresses the same API surface —
``connect(url) -> Database -> Table`` with read/write/count/delete/DDL/views —
as Catalyst logical plans over Parquet (or any Spark source), so every
operator runs distributed instead of in the client process.

Entry points mirror the reference exactly (``datum/__init__.py:3-8``)::

    import datum_spark as datum
    db = datum.connect("file:///root/testdata/sf0.001")
    rows = db.table("lineitem").read(where="l_quantity > 30", limit=10)
"""

from __future__ import annotations

from .database import Database
from .table import Table

__version__ = "0.1.0"

__all__ = ["connect", "db", "Database", "Table", "__version__"]


def connect(url: str, spark=None, conf: dict | None = None) -> Database:
    """Connect to a data source URL and return a :class:`Database`.

    Reference: ``datum/__init__.py:3-5``.  Unlike the reference (which opens a
    DBAPI socket eagerly), the Spark engine is lazy — no cluster work happens
    until an action.

    Supported schemes:

    - ``file:///path/to/dir`` or a bare path — a directory of
      ``<table>.parquet`` files/directories (the engine's native format).
    - ``memory://`` — an empty in-memory catalog (temp views only).
    - ``jdbc:...`` — routed to ``spark.read.format("jdbc")`` per-table.

    ``conf`` is extra Spark config applied when THIS call creates the
    session (ignored if ``spark`` is passed or a session is already
    active — Spark sessions are process-wide).  The 100 TB deployment
    posture is ``connect(url, conf=session.cluster_profile(...))``.
    """
    if spark is None and conf:
        from .session import get_session

        spark = get_session(extra_conf=conf)
    return Database(url, spark=spark)


def db(url: str, spark=None) -> Database:
    """Alias of :func:`connect` (reference: ``datum/__init__.py:7-8``)."""
    return connect(url, spark=spark)
