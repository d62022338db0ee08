"""Driver-contract hygiene: properties of queries()/oracle_sql() that the
diff harness silently depends on."""

import re

import __spark_entry__ as entry


def test_every_oracle_has_a_query():
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(os_) <= set(qs), set(os_) - set(qs)


def test_oracle_sql_has_no_line_comments():
    # the harness collapses whitespace (" ".join(sql.split())), so a `--`
    # comment would swallow the rest of the statement
    for name, sql in entry.oracle_sql().items():
        assert "--" not in sql, f"{name}: line comment would break collapse"


def test_query_names_are_well_formed():
    for name in entry.queries():
        assert re.fullmatch(r"[qx]\d{2,3}_[a-z0-9_]+", name), name


def test_all_callables():
    assert all(callable(fn) for fn in entry.queries().values())
