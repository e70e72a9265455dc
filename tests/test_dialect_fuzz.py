"""Property-based tests for the round-6 dialect translations: on any
tokenizable input, ``to_spark_sql`` either returns a string or raises a
clean ValueError/TokenizeError — never an IndexError/AttributeError
crash — and SQL without PG-only surface passes through byte-identical.
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from gfw_data_api_spark.sql.dialect import to_spark_sql
from gfw_data_api_spark.sql.tokenizer import TokenizeError

_PG_TOKENS = [
    "^", "~", "~*", "!~", "!~*", "::numeric", "::text",
    "SIMILAR TO", "BETWEEN SYMMETRIC", "DISTINCT ON",
    "EXTRACT(DOW FROM", "EXTRACT(EPOCH FROM", "EXTRACT(ISODOW FROM",
    "to_char(", "starts_with(", "string_to_array(",
    "FETCH FIRST", "ROWS ONLY",
]

_soup_atom = st.one_of(
    st.sampled_from(_PG_TOKENS),
    st.sampled_from(["SELECT", "FROM", "WHERE", "ORDER BY", "AND", "(", ")",
                     ",", "a", "b", "tv", "1", "2", "'x'", "''", "*", "+",
                     "-", "NOT", "CASE", "WHEN", "THEN", "END", "LIMIT"]),
    st.text(alphabet=string.ascii_lowercase + string.digits, min_size=1, max_size=6),
)


@given(parts=st.lists(_soup_atom, min_size=1, max_size=25))
@settings(max_examples=400, deadline=None)
def test_dialect_never_crashes_on_token_soup(parts):
    sql = " ".join(parts)
    try:
        out = to_spark_sql(sql)
        assert isinstance(out, str)
    except (ValueError, TokenizeError):
        pass  # loud, typed rejection is the contract


ident = st.text(alphabet=string.ascii_lowercase + "_", min_size=1, max_size=10).filter(
    lambda s: s.upper()
    not in {
        "SELECT", "FROM", "WHERE", "ORDER", "BY", "AND", "OR", "NOT", "AS",
        "GROUP", "HAVING", "LIMIT", "OFFSET", "BETWEEN", "IS", "IN", "LIKE",
        "CASE", "WHEN", "THEN", "ELSE", "END", "DISTINCT", "ON", "SIMILAR",
        "TO", "EXTRACT", "TO_CHAR", "STARTS_WITH", "STRING_TO_ARRAY",
        "FETCH", "ROWS", "ONLY", "FIRST", "ASC", "DESC",
    }
)


@given(
    cols=st.lists(ident, min_size=1, max_size=4, unique=True),
    table=ident,
    value=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=200, deadline=None)
def test_plain_ansi_sql_passes_through_unchanged(cols, table, value):
    """No PG-only surface → byte-identical output: the translations must
    never rewrite SQL that is already Spark-valid. (ORDER BY is covered
    separately — PG NULL-ordering defaults are made explicit there.)"""
    sql = f"SELECT {', '.join(cols)} FROM {table} WHERE {cols[0]} = {value} LIMIT 7"
    assert to_spark_sql(sql) == sql


@given(
    cols=st.lists(ident, min_size=2, max_size=4, unique=True),
    table=ident,
)
@settings(max_examples=100, deadline=None)
def test_order_by_gains_exactly_pg_null_defaults(cols, table):
    """ORDER BY items gain PG's explicit NULL ordering and nothing else:
    ASC → NULLS LAST, DESC → NULLS FIRST, explicit NULLS untouched."""
    sql = (
        f"SELECT {', '.join(cols)} FROM {table} "
        f"ORDER BY {cols[0]}, {cols[1]} DESC LIMIT 7"
    )
    assert to_spark_sql(sql) == (
        f"SELECT {', '.join(cols)} FROM {table} "
        f"ORDER BY {cols[0]} NULLS LAST, {cols[1]} DESC NULLS FIRST LIMIT 7"
    )
