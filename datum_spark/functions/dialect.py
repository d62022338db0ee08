"""Dialect shim: Postgres/Oracle SQL fragments → Spark SQL.

The reference forwards ``where=`` / ``sort=`` fragments and whole
``execute()`` statements verbatim to its backend
(``datum/postgis/table.py:157-163``, ``datum/oracle_stgeom/table.py:247-250``,
``datum/postgis/database.py:43-55``).  Users therefore write Postgres or
Oracle dialect.  Spark SQL is the contract here; this module best-effort
rewrites the common pg/oracle idioms so existing predicates keep working.

Scope (SURVEY §4 custom-work item 1): parser-level string rewriting only —
no Catalyst rule needed.  Rewrites are applied outside of string literals.
"""

from __future__ import annotations

import re

# pg type names (incl. multiword) → Spark SQL types; multiword names must
# be matched explicitly or the regex can't tell a type from the next keyword
_PG_TYPE_MAP = {
    "double precision": "double",
    "character varying": "string",
    "timestamp without time zone": "timestamp",
    "timestamp with time zone": "timestamp",
    "text": "string",
    "int4": "int",
    "int8": "bigint",
    "float8": "double",
    "numeric": "decimal",
}
_MULTIWORD_TYPES = "|".join(
    t.replace(" ", r"\s+") for t in _PG_TYPE_MAP if " " in t)


def _map_type(name: str) -> str:
    # split optional precision args: numeric(10,2) -> decimal(10,2)
    base, paren, args = name.partition("(")
    mapped = _PG_TYPE_MAP.get(" ".join(base.lower().split()), base.strip())
    return mapped + paren + args if paren else mapped


# (pattern, replacement) applied outside single-quoted literals.
_RULES: list[tuple[re.Pattern, str]] = [
    # pg :: casts  ->  CAST(expr AS type). Handles simple operand on the left:
    # identifier, number, or a parenthesized/function expression is left to
    # the explicit-CAST fallback below.
    (re.compile(r"(\b[A-Za-z_][A-Za-z0-9_.]*|\d+(?:\.\d+)?"
                r"|\"(?:[^\"]|\"\")+\")\s*::\s*"
                rf"({_MULTIWORD_TYPES}|[A-Za-z_][A-Za-z0-9_]*"
                r"(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)",
                re.IGNORECASE),
     lambda m: f"CAST({m.group(1)} AS {_map_type(m.group(2))})"),
    # Oracle NVL -> coalesce
    (re.compile(r"\bNVL\s*\(", re.IGNORECASE), "coalesce("),
    # pg regex-match operators (binary, spaced): a !~ 'p' / a ~ 'p'
    (re.compile(r"\s+!~\s+"), " NOT RLIKE "),
    (re.compile(r"\s+~\s+"), " RLIKE "),
    # length-less VARCHAR (pg/duckdb allow it; Spark demands a length):
    # map to STRING. VARCHAR(n) stays as-is.
    (re.compile(r"\bVARCHAR\b(?!\s*\()", re.IGNORECASE), "STRING"),
    # Oracle SYSDATE / pg NOW() -> current_timestamp
    (re.compile(r"\bSYSDATE\b", re.IGNORECASE), "current_timestamp()"),
    (re.compile(r"\bNOW\s*\(\s*\)", re.IGNORECASE), "current_timestamp()"),
    # pg double-quoted identifiers -> backticks (Spark reads "..." as a
    # string literal by default); pg can't spell string literals with
    # double quotes, so outside single-quoted literals this is safe.
    # Embedded "" unescapes to a literal double quote per the pg rule.
    (re.compile(r'"((?:[^"]|"")+)"'),
     lambda m: "`" + m.group(1).replace('""', '"') + "`"),
    # pg string concat with || is supported by Spark SQL natively: no-op.
    # Oracle SUBSTR/LENGTH/TO_DATE exist in Spark: no-op.
    # pg TRUE/FALSE literals exist in Spark: no-op.
]

_LITERAL_SPLIT = re.compile(r"('(?:[^']|'')*')")


def _rewrite_outside_literals(sql: str, fn) -> str:
    parts = _LITERAL_SPLIT.split(sql)
    return "".join(p if p.startswith("'") else fn(p) for p in parts)


def translate_predicate(where: str) -> str:
    """Rewrite a raw WHERE fragment into Spark SQL.

    Spark supports ILIKE, BETWEEN, IN, IS [NOT] NULL, LIKE, AND/OR/NOT
    natively, so most reference-era predicates pass through unchanged.
    """
    return translate_sql(where)


def translate_sql(sql: str) -> str:
    """Rewrite a full statement (the ``db.execute`` gateway)."""

    def apply_rules(fragment: str) -> str:
        out = fragment
        for pat, repl in _RULES:
            out = pat.sub(repl, out)
        return out

    return _rewrite_outside_literals(sql, apply_rules)
