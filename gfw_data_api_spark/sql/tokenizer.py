"""A small SQL tokenizer.

The reference uses pglast (libpg_query bindings) to parse queries; that
library is not available here, and the validation matrix only needs
token-level structure (statement splitting, clause boundaries, function
call sites), so a hand-rolled tokenizer is sufficient and dependency-free.

Token kinds:
- IDENT   : bare identifier / keyword (normalized access via ``upper``)
- QIDENT  : double-quoted identifier, value excludes quotes ("" unescaped)
- STRING  : single-quoted literal, value excludes quotes ('' unescaped)
- NUMBER  : numeric literal
- OP      : operator (multi-char first: ::, <=, >=, <>, !=, ||, ...)
- PUNCT   : ( ) , ; .
- PARAM   : $n positional parameter

Comments (``--`` and ``/* */``) and whitespace are skipped but positions
are preserved so the guard can do surgical text edits on the original SQL.
"""

from __future__ import annotations

from dataclasses import dataclass

_MULTI_OPS = (
    "::", "<=", ">=", "<>", "!=", "||", "->>", "->", "#>>", "#>",
    "~*", "!~*", "!~", "?|", "?&", "@>", "<@",
)
_SINGLE_OPS = set("+-*/%<>=~^&|#?@!")
_PUNCT = set("(),;.[]:")


class TokenizeError(ValueError):
    def __init__(self, message: str, index: int):
        super().__init__(message)
        self.index = index


@dataclass(frozen=True)
class Token:
    kind: str
    value: str
    start: int  # offset into original SQL
    end: int  # exclusive

    @property
    def upper(self) -> str:
        return self.value.upper()


def tokenize(sql: str) -> list[Token]:
    tokens: list[Token] = []
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch.isspace():
            i += 1
            continue
        if ch == "-" and sql.startswith("--", i):
            nl = sql.find("\n", i)
            i = n if nl < 0 else nl + 1
            continue
        if ch == "/" and sql.startswith("/*", i):
            close = sql.find("*/", i + 2)
            if close < 0:
                raise TokenizeError("unterminated comment", i)
            i = close + 2
            continue
        if ch == "'":
            j = i + 1
            buf = []
            while True:
                if j >= n:
                    raise TokenizeError("unterminated string literal", i)
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        buf.append("'")
                        j += 2
                        continue
                    break
                buf.append(sql[j])
                j += 1
            tokens.append(Token("STRING", "".join(buf), i, j + 1))
            i = j + 1
            continue
        if ch in ('"', "`"):
            # double quotes: PG-style quoted identifier; backticks: the
            # Spark form (appears after bind_from re-emits quoted aliases)
            quote = ch
            j = i + 1
            buf = []
            while True:
                if j >= n:
                    raise TokenizeError("unterminated quoted identifier", i)
                if sql[j] == quote:
                    if j + 1 < n and sql[j + 1] == quote:
                        buf.append(quote)
                        j += 2
                        continue
                    break
                buf.append(sql[j])
                j += 1
            tokens.append(Token("QIDENT", "".join(buf), i, j + 1))
            i = j + 1
            continue
        if ch == "$":
            j = i + 1
            while j < n and sql[j].isdigit():
                j += 1
            if j > i + 1:
                tokens.append(Token("PARAM", sql[i:j], i, j))
                i = j
                continue
            raise TokenizeError("dollar-quoting is not supported", i)
        if ch.isdigit() or (ch == "." and i + 1 < n and sql[i + 1].isdigit()):
            j = i
            seen_e = False
            while j < n and (
                sql[j].isdigit()
                or sql[j] == "."
                or (sql[j] in "eE" and not seen_e)
                or (sql[j] in "+-" and j > i and sql[j - 1] in "eE")
            ):
                if sql[j] in "eE":
                    seen_e = True
                j += 1
            tokens.append(Token("NUMBER", sql[i:j], i, j))
            i = j
            continue
        if ch.isalpha() or ch == "_":
            j = i
            while j < n and (sql[j].isalnum() or sql[j] in "_$"):
                j += 1
            tokens.append(Token("IDENT", sql[i:j], i, j))
            i = j
            continue
        matched = False
        for op in _MULTI_OPS:
            if sql.startswith(op, i):
                tokens.append(Token("OP", op, i, i + len(op)))
                i += len(op)
                matched = True
                break
        if matched:
            continue
        if ch in _PUNCT:
            tokens.append(Token("PUNCT", ch, i, i + 1))
            i += 1
            continue
        if ch in _SINGLE_OPS:
            tokens.append(Token("OP", ch, i, i + 1))
            i += 1
            continue
        raise TokenizeError(f"unexpected character {ch!r}", i)
    return tokens
