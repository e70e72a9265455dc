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

N_STATEMENTS = 200  # + N_API_STATEMENTS routed through the WSGI app
N_API_STATEMENTS = 26
SEED = 977

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_T1", "/root/testdata/sf0.001")

NUM_COLS = ["doc_id", "n_chars"]
STR_COLS = ["lang", "text"]


def _statements(rng: random.Random):
    """Nine statement shapes (VERDICT r7 #5, r8 #6, r9 #5):
    projection+WHERE+ORDER, grouped aggregate (with a HAVING arm),
    window functions over a WINDOW clause, typed int division
    (plain + windowed), PG FETCH/OFFSET pagination, SRF×typed
    composition, math-domain assert-CASEs inside FILTER aggregates +
    gcd under typed division, date_trunc units feeding GROUP BY with
    make_interval consumed in WHERE, containment-inside-CASE, and —
    in the separate API test below — the projection shape routed
    through the WSGI query endpoint."""
    gen = Gen(rng, num_cols=NUM_COLS, str_cols=STR_COLS)
    for i in range(N_STATEMENTS):
        w_pg, w_dk, _, _ = gen.boolean(2)
        shape = rng.random()
        if shape < 0.22:
            # grouped-aggregate form: translated expressions inside
            # aggregates and FILTER clauses, grouped on a real column,
            # with a HAVING arm half the time
            n_pg, n_dk, _, nx = gen.num(1)
            f_pg, f_dk, _, _ = gen.boolean(1)
            having = ""
            if rng.random() < 0.5:
                having = f" HAVING count(*) > {rng.randint(1, 60)}"
            pg_sql = (
                f"SELECT lang, count(*) AS n, "
                f"CAST(sum(doc_id % 97) AS BIGINT) AS s, "
                f"count(*) FILTER (WHERE {f_pg}) AS nf, "
                f"min(({n_pg})) AS mn FROM data "
                f"WHERE {w_pg} GROUP BY lang{having} ORDER BY lang"
            )
            dk_sql = (
                f"SELECT lang, count(*) AS n, "
                f"CAST(sum(doc_id % 97) AS BIGINT) AS s, "
                f"count(*) FILTER (WHERE {f_dk}) AS nf, "
                f"min(({n_dk})) AS mn FROM documents "
                f"WHERE {w_dk} GROUP BY lang{having} ORDER BY lang"
            )
            yield i, pg_sql, dk_sql, [True, True, True, nx]
            continue
        if shape < 0.40:
            # window-function form: translated expressions next to (and
            # inside lag over) a shared WINDOW clause; doc_id is unique
            # per partition so every function is deterministic
            p_pg, p_dk, _, px = (
                gen.num(1) if rng.random() < 0.5 else gen.string(1)
            )
            win = (
                "WINDOW w AS (PARTITION BY lang ORDER BY doc_id)"
            )
            items = (
                "CAST(row_number() OVER w AS BIGINT) AS rn, "
                "CAST(sum(doc_id % 13) OVER w AS BIGINT) AS cum, "
            )
            pg_sql = (
                f"SELECT doc_id, {items}lag(({p_pg})) OVER w AS prev "
                f"FROM data WHERE {w_pg} {win} ORDER BY doc_id"
            )
            dk_sql = (
                f"SELECT doc_id, {items}lag(({p_dk})) OVER w AS prev "
                f"FROM documents WHERE {w_dk} {win} ORDER BY doc_id"
            )
            yield i, pg_sql, dk_sql, [True, True, px]
            continue
        if shape < 0.52 and rng.random() < 0.45:
            # round-8 TYPED shape: int/int division through the guarded
            # path's schema-aware pass (doc_id/n_chars are BIGINT) —
            # the DuckDB twin spells PG's toward-zero rule exactly
            dv = rng.choice(["7", "13", "(doc_id % 5 + 2)"])
            num = rng.choice(["n_chars", "doc_id", "(n_chars - 40)"])
            win = ""
            expr_pg = f"{num} / {dv}"
            expr_dk = f"(({num}) - (({num}) % ({dv}))) // ({dv})"
            if rng.random() < 0.4:
                # windowed running ratio (OVER-clause typing). NB the
                # summed expression is CAST to int4: PG's sum(int8) is
                # NUMERIC (exact division + half-away cast — the first
                # draft's int8 twin was WRONG and this fuzz caught it;
                # the dialect had it right), sum(int4) is int8 and
                # truncates
                win = " WINDOW w AS (PARTITION BY lang ORDER BY doc_id)"
                s = "sum(CAST(doc_id % 50 AS INT)) OVER w"
                expr_pg = f"{s} / count(*) OVER w"
                expr_dk = (
                    f"({s} - ({s} % count(*) OVER w)) // count(*) OVER w"
                )
            pg_sql = (
                f"SELECT doc_id, CAST({expr_pg} AS BIGINT) AS c0 "
                f"FROM data WHERE {w_pg}{win} ORDER BY doc_id"
            )
            dk_sql = (
                f"SELECT doc_id, CAST({expr_dk} AS BIGINT) AS c0 "
                f"FROM documents WHERE {w_dk}"
                f"{win.replace(' WINDOW w AS', ' WINDOW w AS')} "
                f"ORDER BY doc_id"
            )
            yield i, pg_sql, dk_sql, [True]
            continue
        if shape < 0.52:
            # PG pagination spellings: OFFSET n ROWS FETCH FIRST k ROWS
            # ONLY (translate_fetch_first) vs plain LIMIT/OFFSET
            e_pg, e_dk, _, ex = gen.num(2)
            off = rng.randint(0, 40)
            k = rng.randint(1, 50)
            if rng.random() < 0.5:
                tail_pg = f" OFFSET {off} ROWS FETCH FIRST {k} ROWS ONLY"
            else:
                tail_pg = f" LIMIT {k} OFFSET {off}"
            pg_sql = (
                f"SELECT doc_id, ({e_pg}) AS c0 FROM data "
                f"WHERE {w_pg} ORDER BY doc_id{tail_pg}"
            )
            dk_sql = (
                f"SELECT doc_id, ({e_dk}) AS c0 FROM documents "
                f"WHERE {w_dk} ORDER BY doc_id LIMIT {k} OFFSET {off}"
            )
            yield i, pg_sql, dk_sql, [ex]
            continue
        if shape < 0.64:
            # round-9 SRF×typed interaction shape (VERDICT r8 #6): a
            # set-returning item NEXT TO typed int division in one
            # statement — the typed pass runs first on the PG text, the
            # SRF pass after; both must compose. Two arms:
            if rng.random() < 0.5:
                # generate_series beside a typed ratio; empty series
                # (doc_id % 3 = 0) drops the row in BOTH engines
                dv = rng.choice(["7", "11", "(doc_id % 5 + 2)"])
                pg_sql = (
                    f"SELECT doc_id, n_chars / {dv} AS c0, "
                    f"generate_series(1, CAST(doc_id % 3 AS INT)) AS g "
                    f"FROM data WHERE {w_pg} ORDER BY doc_id, g"
                )
                dk_sql = (
                    f"SELECT doc_id, ((n_chars - (n_chars % ({dv}))) // "
                    f"({dv})) AS c0, "
                    f"unnest(generate_series(1, CAST(doc_id % 3 AS INT))) "
                    f"AS g "
                    f"FROM documents WHERE {w_dk} ORDER BY doc_id, g"
                )
                yield i, pg_sql, dk_sql, [True, True]
            else:
                # unnest WITH ORDINALITY over a planted 2-element array
                # beside typed division; the duck twin replays the two
                # positions as a union (langs carry no '-')
                pg_sql = (
                    f"SELECT doc_id, doc_id / 13 AS c0, "
                    f"unnest(string_to_array(lang || '-' "
                    f"|| CAST(doc_id % 7 AS VARCHAR), '-')) "
                    f"WITH ORDINALITY "
                    f"FROM data WHERE {w_pg} ORDER BY doc_id, ordinality"
                )
                dk_sql = (
                    f"SELECT doc_id, ((doc_id - (doc_id % 13)) // 13) "
                    f"AS c0, u AS unnest, o AS ordinality FROM ("
                    f"SELECT doc_id, lang AS u, CAST(1 AS BIGINT) AS o "
                    f"FROM documents WHERE {w_dk} "
                    f"UNION ALL "
                    f"SELECT doc_id, CAST(doc_id % 7 AS VARCHAR) AS u, "
                    f"CAST(2 AS BIGINT) AS o "
                    f"FROM documents WHERE {w_dk}) "
                    f"ORDER BY doc_id, ordinality"
                )
                yield i, pg_sql, dk_sql, [True, True, True]
            continue
        if shape < 0.70:
            # round-10 shape (VERDICT r9 #5a): math-domain assert-CASE
            # emissions INSIDE windowed and FILTER aggregates — the
            # translate_math_domain raise arms must neither const-fold
            # away nor raise spuriously when the domain is guarded, and
            # gcd under typed division must truncate like PG (the
            # _FN_CATEGORY entry added this round).
            g = rng.choice(["18", "24", "(doc_id % 30 + 1)"])
            dv = rng.choice(["3", "5"])
            thr = rng.randint(2, 6)
            flt = (
                f"count(*) FILTER (WHERE sqrt(CAST(doc_id % 50 AS "
                f"DOUBLE)) > {thr}) AS nf, "
            )
            ml = "max(ln(CAST(n_chars + 1 AS DOUBLE)))"
            pg_sql = (
                f"SELECT lang, {flt}"
                f"CAST(sum(gcd(doc_id % 48, {g}) / {dv}) AS BIGINT) "
                f"AS sg, "
                f"round(CAST({ml} AS NUMERIC), 6) AS ml "
                f"FROM data WHERE {w_pg} GROUP BY lang ORDER BY lang"
            )
            gg = f"gcd(doc_id % 48, {g})"
            dk_sql = (
                f"SELECT lang, {flt}"
                f"CAST(sum(({gg} - ({gg} % {dv})) // {dv}) AS BIGINT) "
                f"AS sg, "
                f"round(CAST({ml} AS DECIMAL(38, 10)), 6) AS ml "
                f"FROM documents WHERE {w_dk} GROUP BY lang ORDER BY lang"
            )
            yield i, pg_sql, dk_sql, [True, True, False]
            continue
        if shape < 0.74:
            # round-10 shape (VERDICT r9 #5b): date_trunc's round-9
            # units feeding GROUP BY, with make_interval CONSUMED in
            # the WHERE clause (ts + make_dt_interval < ts — the typed
            # constructors must compose with comparisons and grouping).
            unit = rng.choice(["decade", "century", "year"])
            nd = rng.randint(10, 40)
            span = rng.choice(["3000", "9000"])
            bucket_pg = (
                f"CAST(date_trunc('{unit}', date '1961-03-01' + "
                f"CAST(doc_id % {span} AS INT)) AS DATE)"
            )
            if unit == "century":
                # PG centuries start at xxx1; DuckDB's at xx00 —
                # replay PG's rule (the q57 oracle recipe)
                d = (
                    f"(date '1961-03-01' + CAST(doc_id % {span} AS INT))"
                )
                bucket_dk = (
                    f"make_date(CAST(floor((year({d}) - 1) / 100) * 100 "
                    f"+ 1 AS INT), 1, 1)"
                )
            else:
                bucket_dk = bucket_pg
            mi_pg = (
                f"timestamp '2001-01-01 00:00:00' + "
                f"make_interval(days => CAST(doc_id % {nd} AS INT), "
                f"hours => 3)"
            )
            mi_dk = (
                f"timestamp '2001-01-01 00:00:00' + "
                f"to_days(CAST(doc_id % {nd} AS INT)) + to_hours(3)"
            )
            cut = f"timestamp '2001-01-{rng.randint(10, 28)} 00:00:00'"
            pg_sql = (
                f"SELECT {bucket_pg} AS b, count(*) AS n "
                f"FROM data WHERE {w_pg} AND {mi_pg} < {cut} "
                f"GROUP BY 1 ORDER BY 1"
            )
            dk_sql = (
                f"SELECT {bucket_dk} AS b, count(*) AS n "
                f"FROM documents WHERE {w_dk} AND {mi_dk} < {cut} "
                f"GROUP BY 1 ORDER BY 1"
            )
            yield i, pg_sql, dk_sql, [True]
            continue
        if shape < 0.80:
            # round-9 containment-inside-CASE shape: nested @> probes as
            # CASE predicates (q53 pins fixed samples; this walks the
            # space). DuckDB's json_contains shares PG's recursive
            # containment rules (probed in round 8).
            hay = (
                "('{\"k\": ' || CAST(doc_id % 5 AS VARCHAR) "
                "|| ', \"tags\": [1, {\"lvl\": ' "
                "|| CAST(doc_id % 3 AS VARCHAR) || '}]}')"
            )
            needles = [
                '{"k": %d}' % rng.randint(0, 5),
                '{"tags": [1]}',
                '{"tags": [{"lvl": %d}]}' % rng.randint(0, 3),
                '{"k": %d, "tags": [{"lvl": %d}]}'
                % (rng.randint(0, 4), rng.randint(0, 2)),
            ]
            n1, n2 = rng.sample(needles, 2)
            pg_sql = (
                f"SELECT doc_id, CASE "
                f"WHEN {hay} @> '{n1}' THEN 'first' "
                f"WHEN {hay} @> '{n2}' THEN 'second' "
                f"ELSE 'none' END AS c0 "
                f"FROM data WHERE {w_pg} ORDER BY doc_id"
            )
            dk_sql = (
                f"SELECT doc_id, CASE "
                f"WHEN json_contains({hay}, '{n1}') THEN 'first' "
                f"WHEN json_contains({hay}, '{n2}') THEN 'second' "
                f"ELSE 'none' END AS c0 "
                f"FROM documents WHERE {w_dk} ORDER BY doc_id"
            )
            yield i, pg_sql, dk_sql, [True]
            continue
        if shape < 0.85:
            # round-11 shape (VERDICT r10 #6a): epoch of year-month
            # intervals (the 365.25-day-year fix) over mixed spellings
            # beside AT TIME ZONE — chained, POSIX/abbrev/IANA zones —
            # feeding date_trunc + GROUP BY. DuckDB twins are all
            # NATIVE (to_months epoch, ICU timezone round trips).
            months = f"CAST(doc_id % 30 - {rng.randint(3, 8)} AS INT)"
            ep_lit_pg, ep_lit_dk = rng.choice(
                [
                    ("'14 months'", "to_months(14)"),
                    ("'2 years 3 mons'", "interval '2 years 3 months'"),
                    ("'400 days ago'", "-to_days(400)"),
                    ("'36 hours'", "to_hours(36)"),
                ]
            )
            ts_pg = (
                "(timestamp '2024-03-01 00:00:00' + "
                "make_interval(hours => CAST(doc_id % 96 AS INT)))"
            )
            ts_dk = (
                "(timestamp '2024-03-01 00:00:00' + "
                "to_hours(CAST(doc_id % 96 AS INT)))"
            )
            if rng.random() < 0.4:
                attz_pg = f"({ts_pg} AT TIME ZONE 'UTC') AT TIME ZONE 'Japan'"
                attz_dk = f"timezone('Japan', timezone('UTC', {ts_dk}))"
            else:
                zone_pg, dk_zone = rng.choice(
                    [
                        ("'Asia/Kolkata'", "Asia/Kolkata"),
                        ("'UTC+5'", "Etc/GMT+5"),
                        ("'PST'", "Etc/GMT+8"),
                    ]
                )
                attz_pg = f"{ts_pg} AT TIME ZONE {zone_pg}"
                attz_dk = f"timezone('UTC', timezone('{dk_zone}', {ts_dk}))"
            pg_sql = (
                f"SELECT CAST(date_trunc('day', {attz_pg}) AS DATE) AS b, "
                f"count(*) AS n, "
                f"CAST(sum(extract(epoch from make_interval(months => "
                f"{months}))) AS BIGINT) AS se, "
                f"CAST(min(extract(epoch from {ep_lit_pg}::interval)) "
                f"AS BIGINT) AS me "
                f"FROM data WHERE {w_pg} GROUP BY 1 ORDER BY 1"
            )
            dk_sql = (
                f"SELECT CAST(date_trunc('day', {attz_dk}) AS DATE) AS b, "
                f"count(*) AS n, "
                f"CAST(sum(extract(epoch from to_months({months}))) "
                f"AS BIGINT) AS se, "
                f"CAST(min(extract(epoch from {ep_lit_dk})) AS BIGINT) "
                f"AS me "
                f"FROM documents WHERE {w_dk} GROUP BY 1 ORDER BY 1"
            )
            yield i, pg_sql, dk_sql, [True, True, True]
            continue
        if shape < 0.90:
            # round-11 shape (VERDICT r10 #6b): date_bin with sources
            # BEFORE the origin (floor toward -infinity, not toward
            # zero) and DST-free odd origins; DuckDB's time_bucket
            # implements PG's rule including odd origins (probed r10).
            stride = rng.choice(["45 minutes", "90 seconds", "7 hours"])
            origin = rng.choice(
                [
                    "2001-01-01 00:07:30",
                    "1999-12-31 23:59:00",
                    "2024-02-29 01:02:03",
                ]
            )
            base = rng.choice(
                ["2000-12-25 00:00:00", "2024-03-01 12:00:00"]
            )
            src_pg = (
                f"(timestamp '{base}' + make_interval(mins => "
                f"CAST(doc_id % 5000 AS INT)))"
            )
            src_dk = (
                f"(timestamp '{base}' + to_minutes("
                f"CAST(doc_id % 5000 AS INT)))"
            )
            pg_sql = (
                f"SELECT date_bin('{stride}', {src_pg}, "
                f"timestamp '{origin}') AS b, count(*) AS n "
                f"FROM data WHERE {w_pg} GROUP BY 1 ORDER BY 1"
            )
            dk_sql = (
                f"SELECT time_bucket(INTERVAL '{stride}', {src_dk}, "
                f"timestamp '{origin}') AS b, count(*) AS n "
                f"FROM documents WHERE {w_dk} GROUP BY 1 ORDER BY 1"
            )
            yield i, pg_sql, dk_sql, [True]
            continue
        if shape < 0.93:
            # round-11 shape: GROUPING SETS / ROLLUP / CUBE with
            # grouping()/grouping_id bitmasks and translated
            # expressions inside the aggregates — Spark-native
            # machinery, DuckDB twin identical modulo the grouping
            # rename and explicit NULLS placement
            n_pg, n_dk, _, nx = gen.num(1)
            form = rng.choice(
                [
                    "GROUPING SETS ((lang, doc_id % 3), (lang), ())",
                    "ROLLUP (lang, doc_id % 3)",
                    "CUBE (lang, doc_id % 3)",
                ]
            )
            # the OR arm keeps the filtered input NON-empty: over an
            # empty input PG (and DuckDB) still emit the ()-set row
            # where Spark emits nothing — the documented
            # empty-input-grouping-sets residual (PARITY; pinned in
            # TestGroupingSetsAndFrames)
            pg_sql = (
                f"SELECT lang, doc_id % 3 AS p3, "
                f"CAST(grouping(lang, doc_id % 3) AS INT) AS g, "
                f"count(*) AS n, min(({n_pg})) AS mn FROM data "
                f"WHERE ({w_pg}) OR doc_id = 0 GROUP BY {form} "
                f"ORDER BY lang, p3, g"
            )
            dk_sql = (
                f"SELECT lang, doc_id % 3 AS p3, "
                f"CAST(grouping(lang, doc_id % 3) AS INT) AS g, "
                f"count(*) AS n, min(({n_dk})) AS mn FROM documents "
                f"WHERE ({w_dk}) OR doc_id = 0 GROUP BY {form} "
                f"ORDER BY lang NULLS LAST, p3 NULLS LAST, g"
            )
            yield i, pg_sql, dk_sql, [True, True, True, nx]
            continue
        if shape < 0.95:
            # round-11 shape (VERDICT r10 #6c): the q60 keyset-
            # pagination surface as a fuzz shape — row-constructor
            # comparisons with NULL-bearing elements in WHERE and a
            # projected three-valued truth-table arm; the DuckDB twin
            # spells PG's lexicographic expansion explicitly.
            lang_lit = rng.choice(["de", "en", "fr", "ja", "pt"])
            k = rng.randint(0, 6)
            thr = rng.randint(0, 4)
            na = f"nullif(doc_id % 7, {k})"
            m5, m3 = rng.randint(0, 4), rng.randint(0, 2)
            pg_sql = (
                f"SELECT doc_id, CASE "
                f"WHEN (lang, {na}) < ('{lang_lit}', {thr}) THEN 1 "
                f"WHEN NOT ((lang, {na}) < ('{lang_lit}', {thr})) THEN 0 "
                f"ELSE -1 END AS tv, "
                f"CASE WHEN (doc_id % 5, doc_id % 3) IN "
                f"(({m5}, {m3}), (1, 2)) THEN 1 ELSE 0 END AS inr "
                f"FROM data "
                f"WHERE (lang, {na}) >= ('{lang_lit}', {thr}) "
                f"AND {w_pg} ORDER BY doc_id"
            )
            lt = (
                f"(lang < '{lang_lit}' OR (lang = '{lang_lit}' "
                f"AND {na} < {thr}))"
            )
            dk_sql = (
                f"SELECT doc_id, CASE WHEN {lt} THEN 1 "
                f"WHEN NOT {lt} THEN 0 ELSE -1 END AS tv, "
                f"CASE WHEN (doc_id % 5 = {m5} AND doc_id % 3 = {m3}) "
                f"OR (doc_id % 5 = 1 AND doc_id % 3 = 2) "
                f"THEN 1 ELSE 0 END AS inr "
                f"FROM documents "
                f"WHERE (lang > '{lang_lit}' OR (lang = '{lang_lit}' "
                f"AND {na} >= {thr})) "
                f"AND {w_dk} ORDER BY doc_id"
            )
            yield i, pg_sql, dk_sql, [True, True]
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


def test_statement_fuzz_through_api_layer(spark, tmp_path):
    """Route fuzzed statements through the FULL API surface
    (api/app.py query endpoint: auth hooks, guard, dialect, literal
    contract, watchdog-capped collect, JSON serialization) — VERDICT
    r7 #5's end-to-end arm. The dataset is a CSV ingest of the
    documents table's scalar columns, so the endpoint exercises the
    same ingest → registry → query path a real deployment runs."""
    import csv as csvmod
    import urllib.parse

    import pyarrow.parquet as pq

    from gfw_data_api_spark.api import create_app
    from gfw_data_api_spark.catalog.registry import Registry
    from gfw_data_api_spark.sources.pipeline import ingest_tabular
    from tests.test_api import call

    tbl = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    ).to_pylist()
    csv_path = str(tmp_path / "docs.csv")
    with open(csv_path, "w", newline="") as fh:
        w = csvmod.writer(fh)
        w.writerow(["doc_id", "lang", "n_chars"])
        for r in tbl:
            w.writerow([r["doc_id"], r["lang"], r["n_chars"]])
    registry = Registry(str(tmp_path / "cat"))
    ingest_tabular(registry, spark, "fuzz_docs", "v1", csv_path)
    app = create_app(spark, registry)

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT doc_id, lang, n_chars FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    rng = random.Random(SEED + 1)
    gen = Gen(rng, num_cols=["doc_id", "n_chars"], str_cols=["lang"])
    failures = []
    for i in range(N_API_STATEMENTS):
        e_pg, e_dk, _, ex = gen.num(2) if rng.random() < 0.5 else gen.string(2)
        w_pg, w_dk, _, _ = gen.boolean(2)
        # round-9 (VERDICT r8 #6): every third statement carries a
        # NON-ASCII literal through the whole URL → WSGI → guard →
        # literal contract → JSON response path (UTF-8 must survive
        # percent-encoding and the ensure_ascii-free serializer)
        if i % 3 == 0:
            na = rng.choice(["Łódź", "café", "naïve→20°"])
            e_pg = f"lang || '-{na}'"
            e_dk = f"lang || '-{na}'"
            ex = True
        pg_sql = (
            f"SELECT doc_id, ({e_pg}) AS c0 FROM data "
            f"WHERE {w_pg} ORDER BY doc_id LIMIT 80"
        )
        dk_sql = (
            f"SELECT doc_id, ({e_dk}) AS c0 FROM documents "
            f"WHERE {w_dk} ORDER BY doc_id LIMIT 80"
        )
        out = call(
            app,
            "GET",
            "/dataset/fuzz_docs/v1/query/json",
            query="sql=" + urllib.parse.quote(pg_sql),
        )
        if out["status"] != 200:
            failures.append(f"#{i} HTTP {out['status']}: {out['body']}\n  PG: {pg_sql}")
            continue
        srows = out["body"]["data"]
        drows = con.sql(dk_sql).fetchall()
        if len(srows) != len(drows):
            failures.append(
                f"#{i} row count {len(srows)} vs {len(drows)}\n"
                f"  PG: {pg_sql}\n  DK: {dk_sql}"
            )
            continue
        for sr, dr in zip(srows, drows):
            if not (
                _same(sr["doc_id"], dr[0], True) and _same(sr["c0"], dr[1], ex)
            ):
                failures.append(
                    f"#{i} row diverges: {sr!r} vs {dr!r}\n"
                    f"  PG: {pg_sql}\n  DK: {dk_sql}"
                )
                break
        if len(failures) > 8:
            break
    assert not failures, (
        f"{len(failures)} divergent API statements of {N_API_STATEMENTS}:\n"
        + "\n---\n".join(failures[:8])
    )
