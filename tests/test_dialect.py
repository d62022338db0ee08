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


# ---------------------------------------------------------------------------
# Reference-parity idiom enumeration: the reference forwards ``where=``
# fragments and whole statements verbatim to psycopg2/cx_Oracle
# (datum/postgis/database.py:43-55, datum/postgis/table.py:157-163), so
# these are the pg/oracle spellings an existing user's predicates carry.
# Each test documents one SUPPORTED idiom; together they enumerate the
# shim's contract surface.

def test_pg_idiom_ilike_passthrough():
    """ILIKE is native Spark SQL (3.3+): must pass through untouched."""
    p = "name ILIKE '%market%' AND city NOT ILIKE 'phila%'"
    assert translate_predicate(p) == p


def test_pg_idiom_numeric_cast_with_precision():
    assert (translate_predicate("total::numeric(10,2) > 5")
            == "CAST(total AS decimal(10,2)) > 5")
    assert (translate_predicate("total::numeric > 5")
            == "CAST(total AS decimal) > 5")


def test_pg_idiom_double_quoted_identifiers():
    """pg spells case-sensitive identifiers with double quotes; Spark
    reads double quotes as string literals, so they become backticks."""
    assert (translate_predicate('"MixedCase" = 3')
            == "`MixedCase` = 3")
    assert (translate_predicate('"odd name" IS NOT NULL')
            == "`odd name` IS NOT NULL")
    # pg-escaped embedded quote "" unescapes
    assert translate_predicate('"a""b" = 1') == '`a"b` = 1'


def test_pg_idiom_quoted_identifier_cast():
    assert (translate_predicate('"Total"::int8 > 0')
            == "CAST(`Total` AS bigint) > 0")


def test_pg_idiom_double_quotes_inside_string_literal_kept():
    sql = "note = 'he said \"hi\"' AND \"Col\" = 2"
    assert (translate_sql(sql)
            == "note = 'he said \"hi\"' AND `Col` = 2")


def test_pg_idiom_concat_and_position_passthrough():
    """|| concat and ANSI POSITION(x IN y) are native Spark SQL."""
    p = "first_name || ' ' || last_name = 'A B'"
    assert translate_predicate(p) == p
    p2 = "POSITION('x' IN name) > 0"
    assert translate_predicate(p2) == p2


def test_pg_idiom_temporal_passthrough():
    """EXTRACT / date_trunc / CURRENT_DATE are native Spark SQL."""
    p = ("EXTRACT(YEAR FROM ts) = 2024 AND date_trunc('month', ts) >= "
         "CURRENT_DATE")
    assert translate_predicate(p) == p


def test_oracle_idiom_functions_passthrough():
    """SUBSTR / LENGTH / TO_DATE exist in Spark SQL: pass through."""
    p = ("SUBSTR(name, 1, 3) = 'PHL' AND LENGTH(name) > 3 AND "
         "d >= TO_DATE('2024-01-02', 'yyyy-MM-dd')")
    assert translate_predicate(p) == p


def test_idioms_compose_in_one_predicate():
    got = translate_predicate(
        "\"Total\"::numeric(12,2) > NVL(floor_, 0) AND name ~ '^A' "
        "AND ts < NOW() AND tag ILIKE 'x%'")
    assert got == ("CAST(`Total` AS decimal(12,2)) > coalesce(floor_, 0) "
                   "AND name RLIKE '^A' AND ts < current_timestamp() "
                   "AND tag ILIKE 'x%'")


# ---------------------------------------------------------------------------
# property tests (pure string level — no Spark session, so examples are cheap)

from hypothesis import given, settings
from hypothesis import strategies as st

_ident = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,10}", fullmatch=True)
_literal_text = st.text(
    alphabet=st.characters(blacklist_characters="'", max_codepoint=0x7E),
    max_size=20)


@given(_ident, _literal_text)
@settings(max_examples=50, deadline=None)
def test_property_single_quoted_literals_never_rewritten(ident, body):
    """Whatever appears inside a single-quoted literal — including ::,
    NVL(, NOW(), double quotes, ~ — must survive translation verbatim."""
    lit = "'" + body.replace('"', '""') + "'"
    sql = f"{ident} = {lit}"
    out = translate_sql(sql)
    assert lit in out


@given(_ident)
@settings(max_examples=50, deadline=None)
def test_property_double_quoted_ident_roundtrips_to_backticks(ident):
    assert translate_sql(f'"{ident}" IS NOT NULL') \
        == f"`{ident}` IS NOT NULL"


@given(_ident, st.sampled_from(["int", "bigint", "double", "text",
                                "numeric(10,2)", "int8", "varchar"]))
@settings(max_examples=50, deadline=None)
def test_property_cast_always_produces_cast(ident, typ):
    out = translate_sql(f"{ident}::{typ} > 0")
    assert out.startswith(f"CAST({ident} AS "), out
    assert "::" not in out
