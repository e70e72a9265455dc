"""Postgres-dialect → Spark-SQL translation for the guarded query surface.

The reference executes the guarded SQL on Postgres; we execute on Spark.
The guarded dialect is small (single-table SELECT), so the translation is
a short list of surface fixes, applied token-wise on the validated SQL:

- ``expr::type`` casts → ``CAST(expr AS type)`` with a PG→Spark type map
- ``ILIKE`` is native in Spark; most scalar functions and predicates in
  the dialect (Q2-Q11 in SURVEY.md §2.1) are ANSI and shared.

PG functions with no Spark builtin (ST_*) are registered as session UDFs
by :mod:`gfw_data_api_spark.functions.geo_udfs`, so injected spatial
predicates execute verbatim.
"""

from __future__ import annotations

import re

from gfw_data_api_spark.sql.tokenizer import tokenize

PG_TO_SPARK_TYPES: dict[str, str] = {
    "text": "STRING",
    "varchar": "STRING",
    "char": "STRING",
    "bpchar": "STRING",
    "name": "STRING",
    "uuid": "STRING",
    "json": "STRING",
    "jsonb": "STRING",
    "xml": "STRING",
    "int2": "SMALLINT",
    "smallint": "SMALLINT",
    "int4": "INT",
    "int": "INT",
    "integer": "INT",
    "int8": "BIGINT",
    "bigint": "BIGINT",
    "oid": "BIGINT",
    "float4": "FLOAT",
    "real": "FLOAT",
    "float8": "DOUBLE",
    "double": "DOUBLE",
    "numeric": "DECIMAL(38,10)",
    "decimal": "DECIMAL(38,10)",
    "money": "DECIMAL(38,2)",
    "bool": "BOOLEAN",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "timestamptz": "TIMESTAMP",
    "time": "STRING",
}


def translate_pg_casts(sql: str) -> str:
    """Rewrite every ``operand::type`` into ``CAST(operand AS type)``.

    The operand is resolved backwards from the ``::`` token: a literal, a
    (possibly qualified) identifier, or a balanced parenthesized group with
    an optional preceding function name.
    """
    while True:
        tokens = tokenize(sql)
        cast_at = None
        for i, tok in enumerate(tokens):
            if tok.kind == "OP" and tok.value == "::":
                cast_at = i
                break
        if cast_at is None or cast_at == 0 or cast_at + 1 >= len(tokens):
            return sql

        type_tok = tokens[cast_at + 1]
        if type_tok.kind != "IDENT":
            return sql
        type_end_idx = cast_at + 1
        type_name = type_tok.value.lower()
        # two-word types: double precision / timestamp with(out) time zone
        if type_name == "double" and type_end_idx + 1 < len(tokens) and tokens[
            type_end_idx + 1
        ].value.lower() == "precision":
            type_end_idx += 1
        elif type_name in ("timestamp", "time") and type_end_idx + 1 < len(tokens):
            j = type_end_idx + 1
            words = []
            while j < len(tokens) and tokens[j].kind == "IDENT" and tokens[j].value.lower() in (
                "with",
                "without",
                "time",
                "zone",
            ):
                words.append(tokens[j].value.lower())
                j += 1
            if words[:1] in (["with"], ["without"]) and words[-1:] == ["zone"]:
                type_end_idx = j - 1
        spark_type = PG_TO_SPARK_TYPES.get(type_name, type_name.upper())

        # resolve operand start, walking backwards
        k = cast_at - 1
        prev = tokens[k]
        if prev.kind in ("NUMBER", "STRING", "QIDENT"):
            start = prev.start
        elif prev.kind == "IDENT":
            start = prev.start
            while k >= 2 and tokens[k - 1].kind == "PUNCT" and tokens[k - 1].value == "." and tokens[
                k - 2
            ].kind in ("IDENT", "QIDENT"):
                k -= 2
                start = tokens[k].start
        elif prev.kind == "PUNCT" and prev.value == ")":
            depth = 0
            j = k
            while j >= 0:
                if tokens[j].kind == "PUNCT" and tokens[j].value == ")":
                    depth += 1
                elif tokens[j].kind == "PUNCT" and tokens[j].value == "(":
                    depth -= 1
                    if depth == 0:
                        break
                j -= 1
            if j < 0:
                return sql
            if j > 0 and tokens[j - 1].kind == "IDENT":
                j -= 1  # function call: include the name
            start = tokens[j].start
        else:
            return sql

        operand = sql[start : prev.end]
        end = tokens[type_end_idx].end
        sql = f"{sql[:start]}CAST({operand} AS {spark_type}){sql[end:]}"


_FETCH_RE = re.compile(
    r"(?:OFFSET\s+(\d+)\s+(?:ROWS?\s+)?)?"
    r"FETCH\s+(?:FIRST|NEXT)\s+(?:(\d+)\s+)?ROWS?\s+ONLY",
    re.IGNORECASE,
)
_OFFSET_ROWS_RE = re.compile(r"OFFSET\s+(\d+)\s+ROWS?\b", re.IGNORECASE)


def _outside_string_literals(sql: str, fn):
    """Apply ``fn`` to the chunks of ``sql`` outside '...' literals."""
    out, i, n = [], 0, len(sql)
    while i < n:
        q = sql.find("'", i)
        if q < 0:
            out.append(fn(sql[i:]))
            break
        out.append(fn(sql[i:q]))
        j = q + 1
        while j < n:
            if sql[j] == "'":
                if j + 1 < n and sql[j + 1] == "'":
                    j += 2
                    continue
                break
            j += 1
        out.append(sql[q : j + 1])
        i = j + 1
    return "".join(out)


def translate_fetch_first(sql: str) -> str:
    """PG/ANSI ``[OFFSET m [ROWS]] FETCH FIRST n ROWS ONLY`` → Spark's
    ``LIMIT n [OFFSET m]`` (Spark requires LIMIT before OFFSET; the
    reference's FROM-rewrite explicitly preserves FETCH tails,
    query_helpers.py:424-429, so the dialect must accept them)."""

    def fix(chunk: str) -> str:
        def repl(m):
            off, count = m.group(1), m.group(2) or "1"
            return f"LIMIT {count}" + (f" OFFSET {off}" if off else "")

        chunk = _FETCH_RE.sub(repl, chunk)
        return _OFFSET_ROWS_RE.sub(lambda m: f"OFFSET {m.group(1)}", chunk)

    return _outside_string_literals(sql, fix)


def to_spark_sql(sql: str) -> str:
    """All PG→Spark surface translations."""
    return translate_fetch_first(translate_pg_casts(sql))
