"""SQL-gateway parity: the declared Tier-B queries are dialect-neutral SQL
strings — the same text the DuckDB oracle runs must also run through
``Database.sql`` (Spark's parser + the dialect shim) and produce exactly
the DataFrame builder's rows.  This closes the loop: a reference user who
pasted their SQL into ``db.execute`` gets the engine's native results.
"""

import pytest

from datum_spark import tierb

SF = "/root/testdata/sf0.001"

# DuckDB spells JSON extraction differently (SURVEY §2-B.1 note on Q30):
# the single function-name shim the harness applies.
_SHIMS = {"json_extract_string": "get_json_object"}

# Q29's oracle wraps the cast in numeric trunc() because DuckDB's
# double→BIGINT cast ROUNDS while Spark's truncates; Spark has no 1-arg
# trunc, so that SQL text is inherently engine-split. The DataFrame builder
# is the Spark spelling and diff_runner proves the cross-engine match.
_ENGINE_SPLIT = {"q29_casts"}


def _spark_sql_text(oracle: str) -> str:
    for old, new in _SHIMS.items():
        oracle = oracle.replace(old, new)
    return oracle


@pytest.mark.parametrize("name", sorted(tierb.QUERIES))
def test_declared_sql_runs_through_gateway(spark, smoke_db, name):
    fn, oracle = tierb.QUERIES[name]
    if oracle is None:
        pytest.skip("no declared SQL")
    if name in _ENGINE_SPLIT:
        pytest.skip("oracle SQL text is engine-specific by design")
    via_sql = smoke_db.sql(_spark_sql_text(oracle))
    via_df = fn(spark, SF)
    rows_sql = [tuple(r) for r in via_sql.collect()]
    rows_df = [tuple(r) for r in via_df.collect()]
    assert rows_sql == rows_df, (name, rows_sql[:2], rows_df[:2])


def test_gateway_text_functions(smoke_db):
    """normalize_text / token_count are callable from execute() SQL and
    agree with the Column implementations."""
    from pyspark.sql import functions as F

    from datum_spark.operators.text import normalize_text, token_count

    rows = smoke_db.execute(
        "SELECT doc_id, normalize_text(text) AS n, "
        "token_count(text) AS tc FROM documents WHERE doc_id < 5 "
        "ORDER BY doc_id")
    df = (smoke_db["documents"].query()
          .filter(F.col("doc_id") < 5)
          .select("doc_id", normalize_text(F.col("text")).alias("n"),
                  token_count(F.col("text")).alias("tc"))
          .orderBy("doc_id").collect())
    assert [(r["doc_id"], r["n"], r["tc"]) for r in df] \
        == [(r["doc_id"], r["n"], r["tc"]) for r in rows]
