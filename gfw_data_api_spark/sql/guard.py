"""Validation + rewrite for the guarded read-only single-table SQL surface.

Reference parity: ``app/routes/datasets/utils/query_helpers.py`` —
``scrutinize_sql`` (query_helpers.py:274-381) and its validation passes:

- exactly one statement            (query_helpers.py:81-85)
- SELECT statements only           (query_helpers.py:88-90)
- no WITH clause                   (query_helpers.py:93-97)
- exactly one table in FROM        (query_helpers.py:100-109; set-ops land
                                    here too because a set-op statement has
                                    no FROM clause of its own)
- no subqueries in FROM            (query_helpers.py:112-118)
- no admin/system/private functions(query_helpers.py:121-142 + denylist)
- no SQL value functions           (query_helpers.py:229-235)
- plain table reference (no JOIN)  (query_helpers.py:351-353)

plus optional geometry-filter injection (query_helpers.py:238-266) and the
conservative FROM-target rewrite (query_helpers.py:384-437).

The reference parses with pglast (a C Postgres parser); here a token-level
analysis implements the same observable behavior, including error texts,
so the endpoint rejects exactly what the reference rejects.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from typing import Any
from urllib.parse import unquote

from gfw_data_api_spark.sql.blocklist import (
    SQL_VALUE_FUNCTIONS,
    is_forbidden_function,
)
from gfw_data_api_spark.sql.tokenizer import Token, TokenizeError, tokenize


class QueryGuardError(Exception):
    """Validation failure; maps to HTTP 400 in the API layer."""

    def __init__(self, detail: str, status_code: int = 400):
        super().__init__(detail)
        self.detail = detail
        self.status_code = status_code


_NON_SELECT_STARTERS = frozenset(
    """INSERT UPDATE DELETE CREATE DROP ALTER TRUNCATE GRANT REVOKE VACUUM
    ANALYZE ANALYSE EXPLAIN SET RESET SHOW COPY BEGIN START COMMIT END
    ROLLBACK ABORT SAVEPOINT RELEASE DECLARE PREPARE EXECUTE DEALLOCATE CALL
    DO MERGE REFRESH LOCK COMMENT REINDEX CLUSTER CHECKPOINT DISCARD FETCH
    MOVE LISTEN NOTIFY UNLISTEN IMPORT TABLE VALUES""".split()
)

_CLAUSE_BOUNDARY = frozenset(
    "WHERE GROUP HAVING ORDER LIMIT OFFSET FETCH WINDOW FOR".split()
)
_SET_OPS = frozenset("UNION INTERSECT EXCEPT".split())
_JOIN_FAMILY = frozenset("JOIN INNER LEFT RIGHT FULL CROSS NATURAL LATERAL".split())

# keywords that may legally be followed by "(" without being a function call
_NOT_FUNCTIONS = frozenset(
    """AND OR NOT WHERE SELECT FROM IN ON JOIN CASE WHEN THEN ELSE END EXISTS
    BETWEEN LIKE ILIKE SIMILAR IS NULL ANY ALL SOME AS BY GROUP ORDER HAVING
    LIMIT OFFSET DISTINCT UNION INTERSECT EXCEPT VALUES OVER PARTITION ROWS
    RANGE GROUPS INTERVAL ARRAY ROW FILTER WITHIN ASC DESC USING CROSS
    NATURAL INNER LEFT RIGHT FULL THEN ESCAPE COLLATE""".split()
)


@dataclass
class ValidatedQuery:
    """Outcome of validation: the cleaned SQL plus structural spans used for
    surgical text edits (geometry filter injection, FROM rewrite)."""

    sql: str
    tokens: list[Token]
    from_table: str  # table reference exactly as written (may be qualified)
    alias: str | None
    alias_quoted: bool
    from_span: tuple[int, int]  # text span of the table ref incl. any alias
    where_span: tuple[int, int] | None  # text span of the WHERE *expression*
    tail_start: int  # text offset where GROUP/ORDER/... tail begins (== len if none)
    where_has_top_level_or: bool
    # spans of NESTED `FROM <same table>` references (scalar subqueries in
    # the SELECT list / WHERE — the only subquery form the reference's
    # guard admits, query_helpers.py:112-118). Its global-regex rewrite
    # rebinds these too, so bind_from must replace them for parity.
    nested_from_spans: tuple[tuple[int, int], ...] = ()


def _syntax_error(token: Token) -> QueryGuardError:
    return QueryGuardError(
        f'syntax error at or near "{token.value}", at index {token.start}'
    )


def validate_sql(sql: str) -> ValidatedQuery:
    """Run the full validation matrix; raise QueryGuardError on violation."""
    cleaned = unquote(sql).strip()
    try:
        tokens = tokenize(cleaned)
    except TokenizeError as exc:
        raise QueryGuardError(f"syntax error: {exc}, at index {exc.index}") from exc

    if not tokens:
        raise QueryGuardError('syntax error at or near "", at index 0')

    # exactly one statement: split on semicolons
    statements: list[list[Token]] = [[]]
    for tok in tokens:
        if tok.kind == "PUNCT" and tok.value == ";":
            statements.append([])
        else:
            statements[-1].append(tok)
    statements = [stmt for stmt in statements if stmt]
    if len(statements) != 1:
        raise QueryGuardError("Must use exactly one SQL statement.")
    tokens = statements[0]
    # trim surrounding semicolons/whitespace on BOTH sides; re-tokenize so
    # every recorded span is an offset into the returned sql
    if tokens[0].start > 0 or tokens[-1].end < len(cleaned):
        cleaned = cleaned[tokens[0].start : tokens[-1].end]
        tokens = tokenize(cleaned)

    first = tokens[0]
    if first.kind != "IDENT":
        raise _syntax_error(first)
    if first.upper == "WITH":
        raise QueryGuardError("Must not have WITH clause.")
    if first.upper in _NON_SELECT_STARTERS:
        raise QueryGuardError("Must use SELECT statements only.")
    if first.upper != "SELECT":
        raise _syntax_error(first)

    # depth-0 landmark scan
    depth = 0
    from_idx: int | None = None
    where_idx: int | None = None
    tail_idx: int | None = None  # first depth-0 GROUP/HAVING/ORDER/... token
    for i, tok in enumerate(tokens):
        if tok.kind == "PUNCT":
            if tok.value == "(":
                depth += 1
            elif tok.value == ")":
                depth -= 1
            continue
        if depth != 0 or tok.kind != "IDENT":
            continue
        kw = tok.upper
        if kw in _SET_OPS:
            # a set-op statement has no single FROM table (query_helpers.py:106-109)
            raise QueryGuardError("Must list exactly one table in FROM clause.")
        if kw == "FROM" and from_idx is None:
            from_idx = i
        elif kw == "WHERE" and where_idx is None and from_idx is not None:
            where_idx = i
        elif (
            kw in ("GROUP", "HAVING", "ORDER", "LIMIT", "OFFSET", "FETCH", "WINDOW", "FOR")
            and tail_idx is None
            and from_idx is not None
            and (where_idx is None or i > where_idx)
        ):
            tail_idx = i

    if from_idx is None:
        raise QueryGuardError("Must list exactly one table in FROM clause.")

    # --- FROM clause structure ---------------------------------------------
    i = from_idx + 1
    if i >= len(tokens):
        raise QueryGuardError("Must list exactly one table in FROM clause.")
    if tokens[i].kind == "PUNCT" and tokens[i].value == "(":
        raise QueryGuardError("Must not use sub queries.")

    structure_error: QueryGuardError | None = None
    from_table = ""
    alias: str | None = None
    alias_quoted = False
    from_span = (tokens[i].start, tokens[i].end)
    if tokens[i].kind not in ("IDENT", "QIDENT"):
        structure_error = QueryGuardError("Unexpected FROM clause structure.")
    else:
        # qualified name: part (. part)*
        name_start = tokens[i].start
        name_end = tokens[i].end
        i += 1
        while (
            i + 1 < len(tokens)
            and tokens[i].kind == "PUNCT"
            and tokens[i].value == "."
            and tokens[i + 1].kind in ("IDENT", "QIDENT")
        ):
            name_end = tokens[i + 1].end
            i += 2
        from_table = cleaned[name_start:name_end]
        from_span = (name_start, name_end)

        if i < len(tokens) and tokens[i].kind == "PUNCT" and tokens[i].value == "(":
            # table function (RangeFunction) — not a plain RangeVar
            structure_error = QueryGuardError("Unexpected FROM clause structure.")
        elif i < len(tokens) and tokens[i].kind in ("IDENT", "QIDENT"):
            kw = tokens[i].upper if tokens[i].kind == "IDENT" else None
            if kw == "AS":
                i += 1
                if i < len(tokens) and tokens[i].kind in ("IDENT", "QIDENT"):
                    alias = tokens[i].value
                    alias_quoted = tokens[i].kind == "QIDENT"
                    from_span = (name_start, tokens[i].end)
                    i += 1
                else:
                    structure_error = QueryGuardError("Unexpected FROM clause structure.")
            elif kw in _JOIN_FAMILY:
                structure_error = QueryGuardError("Unexpected FROM clause structure.")
            elif kw not in _CLAUSE_BOUNDARY and kw not in _SET_OPS:
                alias = tokens[i].value
                alias_quoted = tokens[i].kind == "QIDENT"
                from_span = (name_start, tokens[i].end)
                i += 1

        if structure_error is None and i < len(tokens):
            tok = tokens[i]
            if tok.kind == "PUNCT" and tok.value == ",":
                raise QueryGuardError("Must list exactly one table in FROM clause.")
            if tok.kind == "IDENT" and tok.upper in _JOIN_FAMILY:
                structure_error = QueryGuardError("Unexpected FROM clause structure.")
            elif not (tok.kind == "IDENT" and (tok.upper in _CLAUSE_BOUNDARY)):
                structure_error = QueryGuardError("Unexpected FROM clause structure.")

    # --- function denylist (checked before structure, per reference order) --
    for j, tok in enumerate(tokens):
        if tok.kind not in ("IDENT", "QIDENT") or (
            tok.kind == "IDENT" and tok.upper in _NOT_FUNCTIONS
        ):
            continue
        nxt = tokens[j + 1] if j + 1 < len(tokens) else None
        if nxt is not None and nxt.kind == "PUNCT" and nxt.value == "(":
            # function call; quoted names count too (pglast normalizes
            # "pg_read_file"(...) to the same FuncCall the reference blocks)
            if is_forbidden_function(tok.value):
                raise QueryGuardError(
                    "Use of admin, system or private functions is not allowed."
                )
        elif tok.kind == "IDENT" and tok.value.lower() in SQL_VALUE_FUNCTIONS:
            prev = tokens[j - 1] if j > 0 else None
            # skip when used as a qualified-name part (x.user) or alias target
            if not (
                prev is not None
                and (
                    (prev.kind == "PUNCT" and prev.value == ".")
                    or (prev.kind == "IDENT" and prev.upper == "AS")
                )
            ):
                raise QueryGuardError("Use of sql value functions is not allowed.")

    if structure_error is not None:
        raise structure_error

    # --- spans for text surgery ---------------------------------------------
    tail_start = tokens[tail_idx].start if tail_idx is not None else len(cleaned)
    where_span: tuple[int, int] | None = None
    where_has_or = False
    if where_idx is not None:
        expr_start = tokens[where_idx].end
        expr_end = tail_start
        where_span = (expr_start, expr_end)
        d = 0
        for tok in tokens[where_idx + 1 :]:
            if tok.start >= expr_end:
                break
            if tok.kind == "PUNCT":
                if tok.value == "(":
                    d += 1
                elif tok.value == ")":
                    d -= 1
            elif d == 0 and tok.kind == "IDENT" and tok.upper == "OR":
                where_has_or = True

    # nested `FROM <table>` occurrences (depth > 0 — scalar subqueries)
    # whose table text matches the outer FROM table: recorded as spans so
    # bind_from rebinds them like the reference's global regex does.
    # String literals are STRING tokens, never IDENTs, so `from x` inside
    # a literal can never be captured here (the hazard the reference's
    # regex has and this span pass does not).
    nested_spans: list[tuple[int, int]] = []
    for i, tok in enumerate(tokens):
        if i == from_idx or tok.kind != "IDENT" or tok.upper != "FROM":
            continue
        j = i + 1
        if j >= len(tokens) or tokens[j].kind not in ("IDENT", "QIDENT"):
            continue
        ns, ne = tokens[j].start, tokens[j].end
        j += 1
        while (
            j + 1 < len(tokens)
            and tokens[j].kind == "PUNCT"
            and tokens[j].value == "."
            and tokens[j + 1].kind in ("IDENT", "QIDENT")
        ):
            ne = tokens[j + 1].end
            j += 2
        if cleaned[ns:ne].lower() == from_table.lower():
            nested_spans.append((ns, ne))

    return ValidatedQuery(
        sql=cleaned,
        tokens=tokens,
        from_table=from_table,
        alias=alias,
        alias_quoted=alias_quoted,
        from_span=from_span,
        where_span=where_span,
        tail_start=tail_start,
        where_has_top_level_or=where_has_or,
        nested_from_spans=tuple(nested_spans),
    )


def bind_from(validated: ValidatedQuery, target: str, keep_alias: bool = True) -> str:
    """Rebind the FROM target by token span — immune to 'from ...' text in
    string literals or scalar subqueries (unlike the reference's regex,
    kept only in :func:`replace_from_clause` for output parity). The
    user's alias is re-emitted, backtick-quoted for Spark when the
    original was a quoted identifier."""
    start, end = validated.from_span
    alias_sql = ""
    if keep_alias and validated.alias:
        if validated.alias_quoted:
            alias_sql = " AS `" + validated.alias.replace("`", "``") + "`"
        else:
            alias_sql = f" AS {validated.alias}"
    # outer FROM plus any nested same-table references (scalar
    # subqueries), replaced back-to-front so earlier spans stay valid
    edits = [(start, end, target + alias_sql)] + [
        (s0, e0, target) for s0, e0 in validated.nested_from_spans
    ]
    out = validated.sql
    for s0, e0, repl in sorted(edits, reverse=True):
        out = out[:s0] + repl + out[e0:]
    return out


def quote_ident(ident: str) -> str:
    """Postgres-style identifier quoting (query_helpers.py:269-271)."""
    return '"' + ident.replace('"', '""') + '"'


def geometry_filter_sql(geometry: dict[str, Any] | str, geom_column: str = "geom") -> str:
    """The spatial predicate the reference ANDs into WHERE
    (query_helpers.py:238-266); serialized lowercase like pglast RawStream.

    Single quotes in the serialized GeoJSON are doubled — a crafted
    geometry must stay inside the string literal, not splice SQL after
    validation already ran."""
    geojson = geometry if isinstance(geometry, str) else json.dumps(geometry)
    escaped = geojson.replace("'", "''")
    return (
        f"st_intersects({geom_column}, "
        f"st_setsrid(st_geomfromgeojson('{escaped}'), 4326))"
    )


def inject_geometry_filter(validated: ValidatedQuery, geometry: dict[str, Any] | str) -> str:
    """AND the spatial predicate into the statement's WHERE clause."""
    sql = validated.sql
    predicate = geometry_filter_sql(geometry)
    if validated.where_span is not None:
        start, end = validated.where_span
        existing = sql[start:end].strip()
        if validated.where_has_top_level_or:
            existing = f"({existing})"
        new_where = f" {existing} AND {predicate}"
        return sql[:start] + new_where + (" " if end < len(sql) else "") + sql[end:]
    tail_start = validated.tail_start
    head = sql[:tail_start].rstrip()
    tail = sql[tail_start:]
    clause = f" WHERE {predicate}"
    return head + clause + (" " + tail if tail else "")


# Conservative FROM-target replacement (query_helpers.py:384-437): replace
# only the table identifier (and optional alias) immediately after FROM,
# stopping at common clause boundaries.
_FROM_KEYWORDS = r"WHERE|JOIN|ON|GROUP|HAVING|ORDER|LIMIT|OFFSET|FETCH|WINDOW|UNION|FOR"
_FROM_PATTERN = re.compile(
    r"from\s+"
    r'[\w\."]+'
    # optional alias — must NOT be a clause keyword (else `FROM t WHERE
    # on_ = 0` would swallow WHERE as the alias), and every keyword in
    # the boundary lookahead needs \b (else ON prefix-matches a column
    # like `on_`) — both found by the hypothesis fuzzer
    rf"(?:\s+(?:AS\s+)?(?!(?:{_FROM_KEYWORDS})\b)\w+)?"
    rf"(?=\s*(?:(?:{_FROM_KEYWORDS})\b|;|\)|$))",
    re.IGNORECASE,
)


def replace_from_clause(from_part: str, sql_in: str) -> str:
    return _FROM_PATTERN.sub(f"FROM {from_part}", sql_in, count=1)


def scrutinize_sql(
    dataset: str,
    version: str,
    geometry: dict[str, Any] | str | None,
    sql: str,
) -> str:
    """Validate, constrain, and rewrite a user query to target exactly
    ``dataset.version`` — reference parity with query_helpers.py:274-381."""
    validated = validate_sql(sql)

    alias_sql = ""
    if validated.alias:
        alias = quote_ident(validated.alias) if validated.alias_quoted else validated.alias
        alias_sql = f" AS {alias}"

    sql_out = validated.sql
    if geometry is not None:
        sql_out = inject_geometry_filter(validated, geometry)

    if "." in version:
        from_part = f"{quote_ident(dataset)}.{quote_ident(version)}{alias_sql}"
    else:
        from_part = f"{dataset}.{version}{alias_sql}"

    return replace_from_clause(from_part, sql_out)
