"""Property-based guard tests (hypothesis): the validator never crashes
with an unexpected exception type, benign generated queries pass through
unchanged, and forbidden constructs are always rejected — an extension of
the reference's example-based matrix (SURVEY.md §5 rebuild plan (a))."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from gfw_data_api_spark.sql import QueryGuardError, scrutinize_sql
from gfw_data_api_spark.sql.tokenizer import TokenizeError, tokenize

ident = st.text(alphabet=string.ascii_lowercase + "_", min_size=1, max_size=12).filter(
    lambda s: s.upper()
    not in {
        "SELECT", "FROM", "WHERE", "GROUP", "ORDER", "BY", "LIMIT", "OFFSET",
        "AND", "OR", "NOT", "AS", "JOIN", "ON", "UNION", "WITH", "HAVING",
        "USER", "IN", "IS", "NULL", "LIKE", "BETWEEN", "CASE", "END", "FOR",
        "TABLE", "VALUES", "FETCH", "WINDOW", "INTERSECT", "EXCEPT", "ALL",
        "DISTINCT", "LEFT", "RIGHT", "INNER", "FULL", "CROSS", "NATURAL",
        "LATERAL", "ASC", "DESC",
    }
    and not s.startswith(("pg_", "_", "postgis"))
    and s.lower() not in {"current_date", "current_time", "version", "user"}
)


@given(
    cols=st.lists(ident, min_size=1, max_size=4, unique=True),
    table=ident,
    where_col=ident,
    value=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=200, deadline=None)
def test_benign_queries_pass_through(cols, table, where_col, value):
    sql = f"SELECT {', '.join(cols)} FROM {table} WHERE {where_col} = {value}"
    out = scrutinize_sql("ds", "v1", None, sql)
    assert out == sql.replace(f"FROM {table}", "FROM ds.v1")


@given(garbage=st.text(max_size=60))
@settings(max_examples=300, deadline=None)
def test_arbitrary_text_never_crashes(garbage):
    """Any input either validates or raises QueryGuardError — never an
    unexpected exception type."""
    try:
        scrutinize_sql("ds", "v1", None, garbage)
    except QueryGuardError:
        pass


@given(table_a=ident, table_b=ident)
@settings(max_examples=50, deadline=None)
def test_joins_always_rejected(table_a, table_b):
    for sql, detail in [
        (
            f"SELECT * FROM {table_a} JOIN {table_b} ON x = y",
            "Unexpected FROM clause structure.",
        ),
        (
            f"SELECT * FROM {table_a}, {table_b}",
            "Must list exactly one table in FROM clause.",
        ),
        (
            f"SELECT a FROM {table_a} UNION SELECT a FROM {table_b}",
            "Must list exactly one table in FROM clause.",
        ),
    ]:
        try:
            scrutinize_sql("ds", "v1", None, sql)
            raise AssertionError(f"accepted: {sql}")
        except QueryGuardError as exc:
            assert exc.detail == detail


@given(fn=ident)
@settings(max_examples=50, deadline=None)
def test_pg_prefixed_functions_always_rejected(fn):
    for name in (f"pg_{fn}", f"_{fn}", f"postgis{fn}"):
        try:
            scrutinize_sql("ds", "v1", None, f"SELECT {name}(x) FROM t")
            raise AssertionError(f"accepted function {name}")
        except QueryGuardError as exc:
            assert exc.detail == "Use of admin, system or private functions is not allowed."


@given(text=st.text(max_size=80))
@settings(max_examples=300, deadline=None)
def test_tokenizer_total(text):
    """The tokenizer either tokenizes or raises TokenizeError."""
    try:
        tokenize(text)
    except TokenizeError:
        pass
