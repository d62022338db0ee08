"""Dialect shim unit tests (pure string level, no Spark session needed)."""

from datum_spark.functions.dialect import translate_predicate, translate_sql


def test_pg_cast():
    assert translate_sql("a::int > 3") == "CAST(a AS int) > 3"


def test_pg_cast_number_literal():
    assert translate_sql("1.5::double") == "CAST(1.5 AS double)"


def test_pg_multiword_and_mapped_types():
    assert (translate_sql("a::double precision + b::text")
            == "CAST(a AS double) + CAST(b AS string)")
    assert translate_sql("a::int8 = 1") == "CAST(a AS bigint) = 1"


def test_nvl():
    assert translate_sql("NVL(a, 0) = 0") == "coalesce(a, 0) = 0"
    assert translate_sql("nvl(a, 0) = 0") == "coalesce(a, 0) = 0"


def test_sysdate_and_now():
    assert translate_sql("ts < SYSDATE") == "ts < current_timestamp()"
    assert translate_sql("ts < NOW()") == "ts < current_timestamp()"


def test_literals_untouched():
    # rewrites must not fire inside string literals
    sql = "name = 'NVL(x)::int NOW() SYSDATE'"
    assert translate_sql(sql) == sql


def test_escaped_quote_literal():
    sql = "note = 'it''s a::b' AND a::int = 1"
    assert translate_sql(sql) == "note = 'it''s a::b' AND CAST(a AS int) = 1"


def test_bare_varchar_to_string():
    assert (translate_sql("CAST(a AS VARCHAR) = b")
            == "CAST(a AS STRING) = b")
    assert (translate_sql("CAST(a AS VARCHAR(10)) = b")
            == "CAST(a AS VARCHAR(10)) = b")


def test_pg_regex_operators():
    assert (translate_sql("name ~ '^A.*' AND name !~ 'x$'")
            == "name RLIKE '^A.*' AND name NOT RLIKE 'x$'")


def test_predicate_passthrough():
    p = "a BETWEEN 1 AND 2 AND b IN ('x','y') AND c IS NOT NULL"
    assert translate_predicate(p) == p
