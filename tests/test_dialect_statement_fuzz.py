"""STATEMENT-level differential fuzz for the guarded PG surface.

The expression fuzz (test_dialect_value_fuzz.py) evaluates constant
expressions; gate q50 pins one hand-written composition. This harness
closes the remaining gap: seeded random single-table SELECT statements
— projection + WHERE + ORDER BY (+LIMIT) with COLUMN-bearing
translated expressions — run through the REAL guarded path
(``execute_on_dataframe``: validation, FROM-binding, the full 25-pass
translation, the literal contract) against driver testdata, and
compared row-for-row against DuckDB evaluating independently derived
twins over the same parquet. Column atoms thread actual data through
the constructs, so per-row semantics (regex over real text, casts
over real ids, jsonb over built strings) are exercised, not just
constant folding.
"""

from __future__ import annotations

import os
import random

import duckdb
import pytest

from tests.test_dialect_value_fuzz import Gen, _same

N_STATEMENTS = 40
SEED = 977

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_T1", "/root/testdata/sf0.001")

NUM_COLS = ["doc_id", "n_chars"]
STR_COLS = ["lang", "text"]


def _statements(rng: random.Random):
    gen = Gen(rng, num_cols=NUM_COLS, str_cols=STR_COLS)
    for i in range(N_STATEMENTS):
        w_pg, w_dk, _, _ = gen.boolean(2)
        if rng.random() < 0.3:
            # grouped-aggregate form: translated expressions inside
            # aggregates and FILTER clauses, grouped on a real column
            n_pg, n_dk, _, nx = gen.num(1)
            f_pg, f_dk, _, _ = gen.boolean(1)
            pg_sql = (
                f"SELECT lang, count(*) AS n, "
                f"CAST(sum(doc_id % 97) AS BIGINT) AS s, "
                f"count(*) FILTER (WHERE {f_pg}) AS nf, "
                f"min(({n_pg})) AS mn FROM data "
                f"WHERE {w_pg} GROUP BY lang ORDER BY lang"
            )
            dk_sql = (
                f"SELECT lang, count(*) AS n, "
                f"CAST(sum(doc_id % 97) AS BIGINT) AS s, "
                f"count(*) FILTER (WHERE {f_dk}) AS nf, "
                f"min(({n_dk})) AS mn FROM documents "
                f"WHERE {w_dk} GROUP BY lang ORDER BY lang"
            )
            yield i, pg_sql, dk_sql, [True, True, True, nx]
            continue
        items_pg, items_dk = [], []
        kinds = []
        for j in range(rng.randint(1, 3)):
            pg, dk, kind, exact = (
                gen.num(2) if rng.random() < 0.5 else gen.string(2)
            )
            items_pg.append(f"({pg}) AS c{j}")
            items_dk.append(f"({dk}) AS c{j}")
            kinds.append(exact)
        w_pg, w_dk, _, _ = gen.boolean(2)
        limit = " LIMIT 120" if rng.random() < 0.3 else ""
        pg_sql = (
            f"SELECT doc_id, {', '.join(items_pg)} FROM data "
            f"WHERE {w_pg} ORDER BY doc_id{limit}"
        )
        dk_sql = (
            f"SELECT doc_id, {', '.join(items_dk)} FROM documents "
            f"WHERE {w_dk} ORDER BY doc_id{limit}"
        )
        yield i, pg_sql, dk_sql, kinds


def test_statement_fuzz_guarded_path_vs_duckdb(spark):
    from gfw_data_api_spark.operators.query import execute_on_dataframe
    from gfw_data_api_spark.sources.tabular import load_table

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    rng = random.Random(SEED)
    failures = []
    for i, pg_sql, dk_sql, exact in _statements(rng):
        try:
            srows = execute_on_dataframe(spark, docs, pg_sql).collect()
            drows = con.sql(dk_sql).fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append(f"#{i} ERRORED {type(exc).__name__}: "
                            f"{str(exc)[:160]}\n  PG: {pg_sql}\n  DK: {dk_sql}")
            continue
        if len(srows) != len(drows):
            failures.append(
                f"#{i} row count {len(srows)} vs {len(drows)}\n"
                f"  PG: {pg_sql}\n  DK: {dk_sql}"
            )
            continue
        for sr, dr in zip(srows, drows):
            ok = all(
                _same(sv, dv, ex)
                for sv, dv, ex in zip(
                    tuple(sr), dr, [True] + list(exact)
                )
            )
            if not ok:
                failures.append(
                    f"#{i} row diverges at doc_id={sr[0]}: "
                    f"{tuple(sr)!r} vs {dr!r}\n  PG: {pg_sql}\n  DK: {dk_sql}"
                )
                break
        if len(failures) > 10:
            break
    assert not failures, (
        f"{len(failures)} divergent statements of {N_STATEMENTS}:\n"
        + "\n---\n".join(failures[:10])
    )
