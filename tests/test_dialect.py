"""Round-6 PG→Spark dialect breadth (sql/dialect.py; VERDICT r5 #7).

The reference passes any single-table PG SELECT through to Postgres
(``app/crud/queries.py``), so PG-isms that Spark parses differently —
or not at all — need surface translation. Translation-level tests are
pure string checks; value semantics are pinned by the q31-q33 gates
against DuckDB.
"""

import pytest

from gfw_data_api_spark.sql.dialect import (
    run_pg_sql,
    to_spark_sql,
    translate_between_symmetric,
    translate_caret_power,
    translate_extract,
    translate_pg_functions,
    translate_regex_ops,
    translate_similar_to,
)


class TestCaretPower:
    def test_simple(self):
        assert (
            translate_caret_power("SELECT a ^ 2 FROM t")
            == "SELECT POWER(a, 2) FROM t"
        )

    def test_left_associative_chain(self):
        # PG: a ^ b ^ c … historically documented left-assoc in the
        # guarded dialect; either way the rewrite must nest, not drop
        assert (
            translate_caret_power("SELECT 2 * a ^ 2 ^ 3 FROM t")
            == "SELECT 2 * POWER(POWER(a, 2), 3) FROM t"
        )

    def test_unary_minus_binds_tighter_than_caret(self):
        # PG precedence: unary +/- sits ABOVE ^ → -2 ^ 2 = 4
        assert (
            translate_caret_power("SELECT -2 ^ 2 AS p FROM t")
            == "SELECT POWER(-2, 2) AS p FROM t"
        )

    def test_binary_minus_stays_binary(self):
        assert (
            translate_caret_power("SELECT a - 2 ^ 2 FROM t")
            == "SELECT a - POWER(2, 2) FROM t"
        )

    def test_paren_and_function_operands(self):
        assert (
            translate_caret_power("SELECT (x + 1) ^ abs(y) FROM t")
            == "SELECT POWER((x + 1), abs(y)) FROM t"
        )

    def test_function_name_included(self):
        assert (
            translate_caret_power("SELECT LEFT(f, 2) ^ 2 FROM t")
            == "SELECT POWER(LEFT(f, 2), 2) FROM t"
        )


class TestRegexOps:
    def test_tilde(self):
        assert (
            translate_regex_ops("SELECT * FROM t WHERE f ~ '^N'")
            == "SELECT * FROM t WHERE (f RLIKE '^N')"
        )

    def test_case_insensitive(self):
        assert (
            translate_regex_ops("SELECT * FROM t WHERE f ~* 'air'")
            == "SELECT * FROM t WHERE (f RLIKE CONCAT('(?i)', 'air'))"
        )

    def test_negated(self):
        assert (
            translate_regex_ops("SELECT * FROM t WHERE f !~ 'x' AND g !~* 'y'")
            == "SELECT * FROM t WHERE (NOT (f RLIKE 'x')) AND (NOT (g RLIKE CONCAT('(?i)', 'y')))"
        )

    def test_unary_bitwise_not_untouched(self):
        assert translate_regex_ops("SELECT ~5 FROM t") == "SELECT ~5 FROM t"
        assert (
            translate_regex_ops("SELECT a + ~5 FROM t") == "SELECT a + ~5 FROM t"
        )


class TestBetweenSymmetric:
    def test_simple(self):
        got = translate_between_symmetric(
            "SELECT * FROM t WHERE x BETWEEN SYMMETRIC 10 AND 5"
        )
        # bounds are NULL-guarded (PG: a NULL bound makes the BETWEEN
        # NULL; least/greatest alone would skip the NULL)
        assert got == (
            "SELECT * FROM t WHERE x BETWEEN "
            "CASE WHEN (10) IS NULL OR (5) IS NULL THEN NULL ELSE least(10, 5) END "
            "AND CASE WHEN (10) IS NULL OR (5) IS NULL THEN NULL ELSE greatest(10, 5) END"
        )

    def test_arithmetic_bounds_and_following_clause(self):
        got = translate_between_symmetric(
            "SELECT * FROM t WHERE x BETWEEN SYMMETRIC a + 1 AND b * 2 AND y = 3"
        )
        assert "least(a + 1, b * 2) END" in got
        assert "greatest(a + 1, b * 2) END" in got
        assert got.endswith("AND y = 3")

    def test_plain_between_untouched(self):
        sql = "SELECT * FROM t WHERE x BETWEEN 1 AND 2"
        assert translate_between_symmetric(sql) == sql


class TestExtract:
    def test_dow_is_pg_sunday_zero(self):
        assert (
            translate_extract("SELECT EXTRACT(DOW FROM d) FROM t")
            == "SELECT (EXTRACT(DAYOFWEEK FROM d) - 1) FROM t"
        )

    def test_isodow_and_isoyear(self):
        assert (
            translate_extract("SELECT EXTRACT(ISODOW FROM d), EXTRACT(ISOYEAR FROM d) FROM t")
            == "SELECT EXTRACT(DAYOFWEEK_ISO FROM d), EXTRACT(YEAROFWEEK FROM d) FROM t"
        )

    def test_epoch(self):
        assert (
            translate_extract("SELECT EXTRACT(EPOCH FROM d) FROM t")
            == "SELECT CAST(CAST((d) AS TIMESTAMP) AS DOUBLE) FROM t"
        )

    def test_native_fields_untouched(self):
        sql = "SELECT EXTRACT(YEAR FROM d), EXTRACT(QUARTER FROM d) FROM t"
        assert translate_extract(sql) == sql


class TestSimilarTo:
    def test_percent_and_underscore(self):
        got = translate_similar_to("SELECT * FROM t WHERE f SIMILAR TO 'A_C%'")
        assert got == "SELECT * FROM t WHERE (f RLIKE '\\A(?:A.C.*)\\z')"

    def test_not_similar(self):
        got = translate_similar_to("SELECT * FROM t WHERE f NOT SIMILAR TO 'N%'")
        assert got == "SELECT * FROM t WHERE (NOT (f RLIKE '\\A(?:N.*)\\z'))"

    def test_literal_dot_is_escaped_alternation_kept(self):
        got = translate_similar_to("SELECT * FROM t WHERE f SIMILAR TO '(a|b)%.x'")
        assert "(a|b).*\\.x" in got

    def test_dynamic_pattern_raises(self):
        with pytest.raises(ValueError, match="string-literal pattern"):
            translate_similar_to("SELECT * FROM t WHERE f SIMILAR TO g")


class TestPgFunctions:
    def test_starts_with(self):
        assert (
            translate_pg_functions("SELECT starts_with(f, 'N') FROM t")
            == "SELECT startswith(f, 'N') FROM t"
        )

    def test_string_to_array_literal_quoted(self):
        got = translate_pg_functions("SELECT string_to_array(f, '.') FROM t")
        assert "split(f, '\\Q.\\E')" in got
        # PG returns an EMPTY array for '' where split returns ['']
        assert "CASE WHEN (f) = '' THEN CAST(array() AS array<string>)" in got

    def test_string_to_array_dynamic_delimiter_raises(self):
        with pytest.raises(ValueError, match="string-literal delimiter"):
            translate_pg_functions("SELECT string_to_array(f, g) FROM t")


def test_to_spark_sql_composes_all(spark):
    """End-to-end through Spark: every translated construct parses and
    computes PG semantics (values pinned against hand-computed PG
    results; cross-engine value parity is the q31-q33 gates' job)."""
    rows = run_pg_sql(
        spark, (
            "SELECT -2 ^ 2 AS p, "
            "EXTRACT(DOW FROM DATE'1995-01-01') AS sun_dow, "
            "EXTRACT(ISODOW FROM DATE'1995-01-01') AS sun_isodow, "
            "EXTRACT(EPOCH FROM DATE'1995-01-02') AS ep, "
            "('NAB' ~ '^N') AS m, ('nab' ~* '^N') AS mi, "
            "('abc' SIMILAR TO 'a%') AS sim, "
            "('a.b' SIMILAR TO 'a.b') AS sim_dot, "
            "(7 BETWEEN SYMMETRIC 10 AND 5) AS sym, "
            "starts_with('NAB', 'N') AS sw, "
            "string_to_array('a.b', '.') AS arr, "
            "string_to_array('', '.') AS empty_arr"
        )
    ).collect()[0]
    assert rows.p == 4.0  # PG: unary minus binds tighter than ^
    assert rows.sun_dow == 0  # PG: Sunday = 0
    assert rows.sun_isodow == 7  # PG: Sunday = 7 (ISO)
    assert rows.ep == 789004800.0  # UTC midnight epoch
    assert rows.m is True and rows.mi is True
    assert rows.sim is True and rows.sim_dot is True  # '.' literal in SIMILAR TO
    assert rows.sym is True
    assert rows.sw is True
    assert rows.arr == ["a", "b"]
    assert rows.empty_arr == []


class TestDistinctOn:
    def test_basic_rewrite(self):
        from gfw_data_api_spark.sql.dialect import translate_distinct_on

        got = translate_distinct_on(
            "SELECT DISTINCT ON (a) a, b FROM tv ORDER BY a, b DESC"
        )
        assert got == (
            "SELECT a, b FROM (SELECT *, row_number() OVER ("
            "PARTITION BY a ORDER BY b DESC) AS __gfw_rn FROM tv) "
            "__gfw_don WHERE __gfw_rn = 1 ORDER BY a, b DESC"
        )

    def test_function_keys_where_and_limit(self):
        from gfw_data_api_spark.sql.dialect import translate_distinct_on

        got = translate_distinct_on(
            "SELECT DISTINCT ON (date_trunc('day', ts), k) k, v FROM tv "
            "WHERE v > 0 ORDER BY date_trunc('day', ts), k, v DESC LIMIT 3"
        )
        assert "PARTITION BY date_trunc('day', ts), k ORDER BY v DESC" in got
        assert got.rstrip().endswith("LIMIT 3")
        assert "WHERE v > 0" in got

    def test_loud_failures(self):
        from gfw_data_api_spark.sql.dialect import translate_distinct_on

        with pytest.raises(ValueError, match="requires ORDER BY"):
            translate_distinct_on("SELECT DISTINCT ON (a) a, b FROM tv")
        with pytest.raises(ValueError, match="bare \\*"):
            translate_distinct_on("SELECT DISTINCT ON (a) * FROM tv ORDER BY a")
        with pytest.raises(ValueError, match="does not match key"):
            translate_distinct_on("SELECT DISTINCT ON (a) a FROM tv ORDER BY b")

    def test_plain_distinct_untouched(self):
        from gfw_data_api_spark.sql.dialect import translate_distinct_on

        sql = "SELECT DISTINCT a, b FROM tv ORDER BY a"
        assert translate_distinct_on(sql) == sql

    def test_executes_with_pg_semantics(self, spark):
        df = spark.createDataFrame(
            [("r", 1, 10), ("r", 2, 30), ("r", 3, 30), ("g", 4, 5)],
            "flag string, id int, qty int",
        )
        df.createOrReplaceTempView("tv_don")
        rows = run_pg_sql(
            spark, (
                "SELECT DISTINCT ON (flag) flag, id, qty FROM tv_don "
                "ORDER BY flag, qty DESC, id"
            )
        ).collect()
        # per flag: highest qty, id as tiebreaker (PG keeps the FIRST row
        # of each key group in ORDER BY order)
        assert [(r.flag, r.id, r.qty) for r in rows] == [("g", 4, 5), ("r", 2, 30)]


class TestToChar:
    def test_date_templates(self):
        from gfw_data_api_spark.sql.dialect import translate_to_char

        assert (
            translate_to_char("SELECT to_char(d, 'YYYY-MM-DD') FROM tv")
            == "SELECT date_format(d, 'yyyy-MM-dd') FROM tv"
        )
        assert (
            translate_to_char("SELECT to_char(ts, 'HH12:MI AM') FROM tv")
            == "SELECT date_format(ts, 'hh:mm a') FROM tv"
        )

    def test_numeric_and_dynamic_templates_raise(self):
        from gfw_data_api_spark.sql.dialect import translate_to_char

        with pytest.raises(ValueError, match="outside the supported subset"):
            translate_to_char("SELECT to_char(x, '999.99') FROM tv")
        with pytest.raises(ValueError, match="string-literal template"):
            translate_to_char("SELECT to_char(x, fmt) FROM tv")

    def test_executes(self, spark):
        row = run_pg_sql(
            spark, ("SELECT to_char(TIMESTAMP'1995-07-04 13:05:09', "
                         "'YYYY-MM-DD HH24:MI:SS') AS t")
        ).collect()[0]
        assert row.t == "1995-07-04 13:05:09"


class TestReviewRegressionsRound6:
    """Fixes from the round-6 review pass over the dialect additions."""

    def test_case_expression_operands(self):
        from gfw_data_api_spark.sql.dialect import translate_caret_power

        assert translate_caret_power(
            "SELECT CASE WHEN a THEN 1 ELSE 2 END ^ 2 FROM t"
        ) == "SELECT POWER(CASE WHEN a THEN 1 ELSE 2 END, 2) FROM t"
        assert translate_caret_power(
            "SELECT x ^ CASE WHEN a THEN 1 ELSE 2 END FROM t"
        ) == "SELECT POWER(x, CASE WHEN a THEN 1 ELSE 2 END) FROM t"

    def test_concat_chain_left_of_regex_op(self):
        from gfw_data_api_spark.sql.dialect import translate_regex_ops

        # PG: || and ~ share one left-assoc tier → (a || b) ~ 'p'
        assert translate_regex_ops(
            "SELECT * FROM t WHERE a || b ~ 'p'"
        ) == "SELECT * FROM t WHERE (a || b RLIKE 'p')"

    def test_similar_to_backslash_escapes_are_literal(self, spark):
        # translated SQL follows the LITERAL CONTRACT — parse it with
        # run_pg_sql, which also exercises the contract end-to-end
        row = run_pg_sql(
            spark, "SELECT ('adb' SIMILAR TO 'a\\db') AS m"
        ).collect()[0]
        assert row.m is True  # PG: \d is a literal d, not a digit class
        row2 = run_pg_sql(
            spark, "SELECT ('a5b' SIMILAR TO 'a\\db') AS m"
        ).collect()[0]
        assert row2.m is False

    def test_between_symmetric_null_bound_yields_null(self, spark):
        row = run_pg_sql(
            spark, (
                "SELECT (5 BETWEEN SYMMETRIC CAST(NULL AS INT) AND 5) AS a, "
                "(5 BETWEEN SYMMETRIC 3 AND 7) AS b"
            )
        ).collect()[0]
        assert row.a is None  # PG: NULL bound → NULL, not TRUE
        assert row.b is True

    def test_string_to_array_empty_delimiter(self, spark):
        row = run_pg_sql(
            spark, (
                "SELECT string_to_array('abc', '') AS one, "
                "string_to_array('', '') AS zero"
            )
        ).collect()[0]
        assert row.one == ["abc"]  # PG: whole string as a single element
        assert row.zero == []

    def test_to_char_ssss_rejected(self):
        from gfw_data_api_spark.sql.dialect import translate_to_char

        with pytest.raises(ValueError, match="outside the supported subset"):
            translate_to_char("SELECT to_char(ts, 'SSSS') FROM t")

    def test_nested_distinct_on_raises_instead_of_corrupting(self):
        from gfw_data_api_spark.sql.dialect import translate_distinct_on

        with pytest.raises(ValueError, match="inside a subquery"):
            translate_distinct_on(
                "SELECT a, (SELECT DISTINCT ON (k) v FROM t ORDER BY k "
                "LIMIT 1) AS q FROM t"
            )

    def test_distinct_on_alias_tiebreaker_resolves(self, spark):
        df = spark.createDataFrame(
            [("r", 1, 10), ("r", 2, 30)], "flag string, id int, qty int"
        )
        df.createOrReplaceTempView("tv_alias")
        rows = run_pg_sql(
            spark, (
                "SELECT DISTINCT ON (flag) flag, qty AS q FROM tv_alias "
                "ORDER BY flag, q DESC"
            )
        ).collect()
        assert [(r.flag, r.q) for r in rows] == [("r", 30)]

    def test_distinct_on_null_tiebreaker_pg_ordering(self, spark):
        # PG ASC = NULLS LAST: the smallest non-NULL v survives, never
        # the NULL row (Spark's native default would pick NULL first)
        df = spark.createDataFrame(
            [("k", None), ("k", 7), ("k", 3)], "g string, v int"
        )
        df.createOrReplaceTempView("tv_nulls")
        rows = run_pg_sql(
            spark, (
                "SELECT DISTINCT ON (g) g, v FROM tv_nulls ORDER BY g, v"
            )
        ).collect()
        assert [(r.g, r.v) for r in rows] == [("k", 3)]

    def test_statement_order_by_gets_pg_null_defaults(self, spark):
        df = spark.createDataFrame([(None,), (2,), (1,)], "v int")
        df.createOrReplaceTempView("tv_ord")
        asc = run_pg_sql(spark, ("SELECT v FROM tv_ord ORDER BY v")).collect()
        assert [r.v for r in asc] == [1, 2, None]  # PG: NULLS LAST on ASC
        desc = run_pg_sql(
            spark, ("SELECT v FROM tv_ord ORDER BY v DESC")
        ).collect()
        assert [r.v for r in desc] == [None, 2, 1]  # PG: NULLS FIRST on DESC


class TestAggOrderBy:
    def test_string_agg_moves_to_within_group(self):
        from gfw_data_api_spark.sql.dialect import translate_agg_order_by

        assert translate_agg_order_by(
            "SELECT string_agg(v, ',' ORDER BY k DESC) FROM t"
        ) == "SELECT string_agg(v, ',') WITHIN GROUP (ORDER BY k DESC) FROM t"

    def test_plain_calls_untouched(self):
        from gfw_data_api_spark.sql.dialect import translate_agg_order_by

        sql = "SELECT string_agg(v, ','), array_agg(v) FROM t"
        assert translate_agg_order_by(sql) == sql

    def test_array_agg_rewrites_to_sorted_structs(self):
        from gfw_data_api_spark.sql.dialect import translate_agg_order_by

        out = translate_agg_order_by("SELECT array_agg(v ORDER BY k) FROM t")
        assert "array_sort(array_agg(named_struct(" in out
        assert "'n0', (k) IS NULL" in out  # PG ASC default = NULLS LAST
        assert "transform(" in out and "s -> s.v" in out
        assert "reverse(" not in out

    def test_array_agg_desc_reverses_and_flips_flag(self):
        from gfw_data_api_spark.sql.dialect import translate_agg_order_by

        out = translate_agg_order_by(
            "SELECT array_agg(v ORDER BY k DESC NULLS LAST) FROM t"
        )
        # DESC NULLS LAST = reverse of ASC NULLS FIRST
        assert "reverse(array_sort(" in out
        assert "'n0', (k) IS NOT NULL" in out

    def test_mixed_directions_raise(self):
        from gfw_data_api_spark.sql.dialect import translate_agg_order_by

        with pytest.raises(ValueError, match="mixed ASC/DESC"):
            translate_agg_order_by(
                "SELECT array_agg(v ORDER BY a, b DESC) FROM t"
            )

    def test_distinct_raises(self):
        from gfw_data_api_spark.sql.dialect import translate_agg_order_by

        with pytest.raises(ValueError, match="DISTINCT"):
            translate_agg_order_by(
                "SELECT string_agg(DISTINCT v, ',' ORDER BY v) FROM t"
            )

    def test_value_semantics_null_placement(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 5), (3, None, 7), (4, "d", None)],
            "k int, v string, o int",
        )
        df.createOrReplaceTempView("tv_aob")
        row = run_pg_sql(
            spark, (
                "SELECT string_agg(v, ',' ORDER BY o) AS sa, "
                "array_agg(v ORDER BY o) AS aa, "
                "array_agg(v ORDER BY o DESC) AS ad "
                "FROM tv_aob"
            )
        ).collect()[0]
        # string_agg skips NULL values; NULL keys sort last on ASC (PG)
        assert row.sa == "b,a,d"
        # array_agg keeps NULL values; DESC default is NULLS FIRST (PG)
        assert row.aa == ["b", None, "a", "d"]
        assert row.ad == ["d", "a", None, "b"]

    def test_array_to_string_renamed(self, spark):
        from gfw_data_api_spark.sql.dialect import translate_pg_functions

        out = translate_pg_functions(
            "SELECT array_to_string(array_agg(v), ',') FROM t"
        )
        # round-11: bare array_agg routes through the NULL-keeping
        # struct wrapper (PG keeps NULL elements; Spark's drops them)
        assert out == (
            "SELECT array_join(transform(array_agg(named_struct('v', "
            "(v))), __ag -> __ag.v), ',') FROM t"
        )


class TestParameterizedCasts:
    def test_numeric_precision_scale(self):
        from gfw_data_api_spark.sql.dialect import translate_pg_casts

        assert (
            translate_pg_casts("SELECT x::numeric(10,2) FROM t")
            == "SELECT CAST(x AS DECIMAL(10,2)) FROM t"
        )
        assert (
            translate_pg_casts("SELECT x::numeric(10) FROM t")
            == "SELECT CAST(x AS DECIMAL(10,0)) FROM t"
        )

    def test_varchar_truncates_char_pads(self):
        from gfw_data_api_spark.sql.dialect import translate_pg_casts

        assert (
            translate_pg_casts("SELECT c::varchar(5) FROM t")
            == "SELECT substring(CAST(c AS STRING), 1, 5) FROM t"
        )
        assert (
            translate_pg_casts("SELECT c::char(3) FROM t")
            == "SELECT rpad(substring(CAST(c AS STRING), 1, 3), 3, ' ') FROM t"
        )

    def test_float_width_selection(self):
        from gfw_data_api_spark.sql.dialect import translate_pg_casts

        out = translate_pg_casts("SELECT x::float(10) AS f, x::float(40) AS d FROM t")
        assert out == "SELECT CAST(x AS FLOAT) AS f, CAST(x AS DOUBLE) AS d FROM t"

    def test_unsupported_parameterized_type_raises(self):
        from gfw_data_api_spark.sql.dialect import translate_pg_casts

        with pytest.raises(ValueError, match="outside the translatable subset"):
            translate_pg_casts("SELECT x::time(3) FROM t")

    def test_unparameterized_types_unchanged(self):
        from gfw_data_api_spark.sql.dialect import translate_pg_casts

        assert (
            translate_pg_casts("SELECT x::numeric, y::int FROM t")
            == "SELECT CAST(x AS DECIMAL(38,10)), CAST(round(CAST(y AS DECIMAL(38,10)), 0) AS INT) FROM t"
        )

    def test_select_keyword_not_swallowed_into_operand(self):
        # regression: the backward operand walk treated ANY preceding
        # IDENT as a function name, so SELECT (a+b)::int emitted
        # CAST(SELECT (a+b) AS INT)
        from gfw_data_api_spark.sql.dialect import translate_pg_casts

        assert (
            translate_pg_casts("SELECT (a + b)::int FROM t")
            == "SELECT CAST(round(CAST((a + b) AS DECIMAL(38,10)), 0) AS INT) FROM t"
        )
        assert (
            translate_pg_casts("SELECT x FROM t WHERE (a)::int > 1 AND (b)::int < 2")
            == "SELECT x FROM t WHERE CAST(round(CAST((a) AS DECIMAL(38,10)), 0) AS INT) > 1 AND CAST(round(CAST((b) AS DECIMAL(38,10)), 0) AS INT) < 2"
        )

    def test_paren_args_that_are_not_ints_left_alone(self):
        from gfw_data_api_spark.sql.dialect import translate_pg_casts

        # '(' after the type that is NOT an int list belongs to the
        # surrounding expression, not the type
        assert (
            translate_pg_casts("SELECT x::int + (y) FROM t")
            == "SELECT CAST(round(CAST(x AS DECIMAL(38,10)), 0) AS INT) + (y) FROM t"
        )


class TestArrayAnyAll:
    def test_array_literal_simple_and_nested(self):
        from gfw_data_api_spark.sql.dialect import translate_array_literal

        assert (
            translate_array_literal("SELECT ARRAY[1, 2 + 3] FROM t")
            == "SELECT array(1, 2 + 3) FROM t"
        )
        assert (
            translate_array_literal("SELECT ARRAY[ARRAY[1], ARRAY[2]] FROM t")
            == "SELECT array(array(1), array(2)) FROM t"
        )

    def test_bare_array_identifier_untouched(self):
        from gfw_data_api_spark.sql.dialect import translate_array_literal

        sql = "SELECT array(1, 2) FROM t"
        assert translate_array_literal(sql) == sql

    def test_any_becomes_exists(self):
        from gfw_data_api_spark.sql.dialect import to_spark_sql

        out = to_spark_sql("SELECT k FROM t WHERE s = ANY(ARRAY['O','X'])")
        assert "exists(array('O','X'), __gfw_e -> (s) = __gfw_e)" in out

    def test_all_becomes_forall_with_function_lhs(self):
        from gfw_data_api_spark.sql.dialect import to_spark_sql

        out = to_spark_sql("SELECT k FROM t WHERE upper(s) <> ALL(ARRAY['F'])")
        assert "forall(array('F'), __gfw_e -> (upper(s)) <> __gfw_e)" in out

    def test_subquery_any_raises_with_in_hint(self):
        from gfw_data_api_spark.sql.dialect import translate_any_all

        with pytest.raises(ValueError, match="IN \\(SELECT"):
            translate_any_all("SELECT k FROM t WHERE s = ANY(SELECT s FROM u)")

    def test_three_valued_logic_matches_pg(self, spark):
        df = spark.createDataFrame(
            [(1, "O", 25), (2, "F", 5), (3, "X", 15), (4, None, 30)],
            "k int, s string, q int",
        )
        df.createOrReplaceTempView("tv_anyall")
        from gfw_data_api_spark.sql.dialect import to_spark_sql

        rows = run_pg_sql(
            spark, (
                "SELECT k FROM tv_anyall WHERE s = ANY(ARRAY['O','X']) "
                "ORDER BY k"
            )
        ).collect()
        assert [r.k for r in rows] == [1, 3]  # NULL s row excluded
        rows = run_pg_sql(
            spark, (
                "SELECT k FROM tv_anyall WHERE s <> ALL(ARRAY['F']) ORDER BY k"
            )
        ).collect()
        assert [r.k for r in rows] == [1, 3]  # NULL comparison → NULL → out


class TestAnsiCastTypeNames:
    def test_text_maps_through_colon_path(self):
        from gfw_data_api_spark.sql.dialect import to_spark_sql

        assert (
            to_spark_sql("SELECT CAST(x AS TEXT) FROM t")
            == "SELECT CAST((x) AS STRING) FROM t"
        )

    def test_varchar_n_truncates_like_pg(self):
        from gfw_data_api_spark.sql.dialect import to_spark_sql

        assert (
            to_spark_sql("SELECT CAST(c AS varchar(3)) FROM t")
            == "SELECT substring(CAST((c) AS STRING), 1, 3) FROM t"
        )

    def test_spark_native_type_untouched(self):
        from gfw_data_api_spark.sql.dialect import translate_cast_type_names

        sql = "SELECT CAST(x AS STRING), CAST(y AS ARRAY<INT>) FROM t"
        assert translate_cast_type_names(sql) == sql

    def test_nested_casts_both_rewritten(self):
        from gfw_data_api_spark.sql.dialect import to_spark_sql

        assert (
            to_spark_sql("SELECT CAST(CAST(x AS text) AS int) FROM t")
            == "SELECT CAST(round(CAST((CAST((x) AS STRING)) AS DECIMAL(38,10)), 0) AS INT) FROM t"
        )

    def test_bare_float_is_pg_float8(self):
        from gfw_data_api_spark.sql.dialect import to_spark_sql

        assert (
            to_spark_sql("SELECT x::float FROM t")
            == "SELECT CAST(x AS DOUBLE) FROM t"
        )

    def test_between_symmetric_cast_bound_interaction(self, spark):
        # regression: the rewritten (NULL)::INT bound must not swallow
        # the SYMMETRIC keyword as a function name in the operand walk
        from gfw_data_api_spark.sql.dialect import to_spark_sql

        row = run_pg_sql(
            spark, (
                "SELECT (5 BETWEEN SYMMETRIC CAST(NULL AS INT) AND 5) AS a"
            )
        ).collect()[0]
        assert row.a is None


class TestReviewRegressionsRound6b:
    def test_any_lhs_absorbs_concat_chain(self, spark):
        # review: `c1 || c2 = ANY(...)` must compare the concatenation,
        # not split at c2 (PG gives = lower precedence than ||)
        from gfw_data_api_spark.sql.dialect import to_spark_sql

        spark.createDataFrame([("a", "b"), ("c", "d")], "c1 string, c2 string"
                              ).createOrReplaceTempView("tv_anylhs")
        rows = run_pg_sql(
            spark, (
                "SELECT c1 FROM tv_anylhs WHERE c1 || c2 = ANY(ARRAY['ab'])"
            )
        ).collect()
        assert [r.c1 for r in rows] == ["a"]

    def test_any_lhs_absorbs_cast_and_arithmetic(self):
        from gfw_data_api_spark.sql.dialect import to_spark_sql

        out = to_spark_sql("SELECT k FROM t WHERE x::text = ANY(ARRAY['1'])")
        assert "exists(array('1'), __gfw_e -> (CAST(x AS STRING)) = __gfw_e)" in out
        out = to_spark_sql("SELECT k FROM t WHERE a + b * c = ANY(ARRAY[5])")
        assert "(a + b * c) = __gfw_e" in out

    def test_any_signed_lhs_raises_loudly(self):
        from gfw_data_api_spark.sql.dialect import translate_any_all

        with pytest.raises(ValueError, match="parenthesize"):
            translate_any_all("SELECT -x = ANY(array(1)) AS r FROM t")

    def test_bare_char_cast_is_char1(self, spark):
        # review: PG 'abc'::char = 'a' (bare char means char(1))
        from gfw_data_api_spark.sql.dialect import to_spark_sql

        row = run_pg_sql(
            spark, ("SELECT 'abc'::char AS a, CAST('' AS char) AS b")
        ).collect()[0]
        assert row.a == "a"
        assert row.b == " "  # truncate AND pad

    def test_agg_order_by_array_literal_argument(self, spark):
        # review: commas inside ARRAY[...] are not argument separators
        from gfw_data_api_spark.sql.dialect import to_spark_sql

        spark.createDataFrame([(1, 2, 3), (4, 5, 1)], "a int, b int, k int"
                              ).createOrReplaceTempView("tv_aggarr")
        row = run_pg_sql(
            spark, (
                "SELECT array_agg(ARRAY[a, b] ORDER BY k) AS r FROM tv_aggarr"
            )
        ).collect()[0]
        assert row.r == [[4, 5], [1, 2]]


class TestRegexpReplace:
    def test_first_only_default_matches_pg(self, spark):
        from gfw_data_api_spark.sql.dialect import to_spark_sql

        row = run_pg_sql(
            spark, (
                "SELECT regexp_replace('aaa', 'a', 'b') AS f, "
                "regexp_replace('aaa', 'a', 'b', 'g') AS g, "
                "regexp_replace('aAa', 'a', 'b', 'gi') AS gi, "
                "regexp_replace('aAa', 'A', 'b', 'i') AS ci"
            )
        ).collect()[0]
        assert (row.f, row.g, row.gi, row.ci) == ("baa", "bbb", "bbb", "bAa")

    def test_backref_conversion_and_shift(self, spark):
        from gfw_data_api_spark.sql.dialect import to_spark_sql

        row = run_pg_sql(
            spark, (
                "SELECT regexp_replace('x1y2', '([0-9])', '[\\1]', 'g') AS g, "
                "regexp_replace('x1y2', '([0-9])', '[\\1]') AS f, "
                "regexp_replace('cost $5 now', 'now', 'later') AS dollar, "
                "regexp_replace('ab', 'b', '\\&\\&') AS amp"
            )
        ).collect()[0]
        assert row.g == "x[1]y[2]"
        assert row.f == "x[1]y2"  # first-only with shifted group number
        assert row.dollar == "cost $5 later"  # literal $ survives
        assert row.amp == "abb"  # \& = whole match

    def test_dot_crosses_newlines_like_pg(self, spark):
        from gfw_data_api_spark.sql.dialect import to_spark_sql

        row = run_pg_sql(
            spark, ("SELECT regexp_replace('a\nb c', 'b.c', 'Z') AS r")
        ).collect()[0]
        assert row.r == "a\nZ"  # PG: . matches newline by default

    def test_loud_rejections(self):
        from gfw_data_api_spark.sql.dialect import translate_regexp_replace

        with pytest.raises(ValueError, match="flags"):
            translate_regexp_replace(
                "SELECT regexp_replace(t, 'a', 'b', 'x') FROM d"
            )
        with pytest.raises(ValueError, match="string-literal"):
            translate_regexp_replace(
                "SELECT regexp_replace(t, col_pat, 'b') FROM d"
            )
        with pytest.raises(ValueError, match="backreferences"):
            translate_regexp_replace(
                "SELECT regexp_replace(t, '(a)\\1', 'b') FROM d"
            )
        with pytest.raises(ValueError, match="lone backslash"):
            translate_regexp_replace(
                "SELECT regexp_replace(t, 'a', 'b\\') FROM d"
            )

    def test_nested_calls_both_translate(self, spark):
        from gfw_data_api_spark.sql.dialect import to_spark_sql

        row = run_pg_sql(
            spark, (
                "SELECT regexp_replace(regexp_replace('aa bb', 'a', 'x'), "
                "'b', 'y') AS r"
            )
        ).collect()[0]
        assert row.r == "xa yb"  # each layer replaces first-only


class TestTemplateParse:
    def test_to_date_templates_convert(self):
        from gfw_data_api_spark.sql.dialect import translate_to_char

        assert (
            translate_to_char("SELECT to_date(s, 'YYYY-MM-DD') FROM t")
            == "SELECT to_date(s, 'yyyy-MM-dd') FROM t"
        )
        assert (
            translate_to_char("SELECT to_timestamp(s, 'DD.MM.YYYY HH24:MI:SS') FROM t")
            == "SELECT to_timestamp(s, 'dd.MM.yyyy HH:mm:ss') FROM t"
        )

    def test_epoch_to_timestamp_passes_through(self):
        from gfw_data_api_spark.sql.dialect import translate_to_char

        sql = "SELECT to_timestamp(1720000000) FROM t"
        assert translate_to_char(sql) == sql

    def test_mixed_to_char_and_to_date_both_translate(self):
        from gfw_data_api_spark.sql.dialect import translate_to_char

        out = translate_to_char(
            "SELECT to_char(to_date(s, 'YYYY-MM-DD'), 'DD.MM.YYYY') FROM t"
        )
        assert out == (
            "SELECT date_format(to_date(s, 'yyyy-MM-dd'), 'dd.MM.yyyy') FROM t"
        )

    def test_parse_values_match_pg(self, spark):
        from gfw_data_api_spark.sql.dialect import to_spark_sql

        row = run_pg_sql(
            spark, (
                "SELECT to_date('05.02.2024', 'DD.MM.YYYY') AS d, "
                "to_char(to_timestamp('2021-07-04 09:30:15', "
                "'YYYY-MM-DD HH24:MI:SS'), 'HH24-MI-SS') AS h"
            )
        ).collect()[0]
        assert str(row.d) == "2024-02-05"
        assert row.h == "09-30-15"


class TestJsonOperators:
    def test_text_and_json_modes(self, spark):
        from gfw_data_api_spark.sql.dialect import to_spark_sql

        row = run_pg_sql(
            spark, (
                """SELECT '{"s": "x", "n": 5}' ->> 's' AS t,
                '{"s": "x", "n": 5}' -> 's' AS j,
                '{"s": "x", "n": 5}' -> 'n' AS n,
                '{"k": 1}' ->> 'missing' AS m"""
            )
        ).collect()[0]
        assert row.t == "x"  # text mode: unquoted
        assert row.j == '"x"'  # json mode: quotes kept (PG ->)
        assert row.n == "5"
        assert row.m is None

    def test_paths_indexes_and_chains(self, spark):
        from gfw_data_api_spark.sql.dialect import to_spark_sql

        row = run_pg_sql(
            spark, (
                """SELECT '{"o": {"b": [1,2]}}' #>> '{o,b,1}' AS p,
                '[10,20,30]' ->> 1 AS i,
                '{"a": {"b": "q"}}' -> 'a' ->> 'b' AS c"""
            )
        ).collect()[0]
        assert (row.p, row.i, row.c) == ("2", "20", "q")

    def test_loud_rejections(self):
        from gfw_data_api_spark.sql.dialect import translate_json_ops

        with pytest.raises(ValueError, match="plain keys"):
            translate_json_ops("SELECT p ->> 'we.ird' FROM t")
        with pytest.raises(ValueError, match="string key or integer"):
            translate_json_ops("SELECT p ->> col FROM t")
        with pytest.raises(ValueError, match="text-array path"):
            translate_json_ops("SELECT p #>> 2 FROM t")
        with pytest.raises(ValueError, match="look like"):
            translate_json_ops("SELECT p #>> 'o,b' FROM t")

    def test_runs_before_lambda_emitting_passes(self):
        # an agg ORDER BY rewrite emits `s -> s.v`; json ops in the
        # same statement must already be gone by then
        from gfw_data_api_spark.sql.dialect import to_spark_sql

        out = to_spark_sql(
            "SELECT array_agg(p ->> 'k' ORDER BY id) AS a FROM t"
        )
        assert "get_json_object(p, '$.k')" in out
        assert "array_sort(array_agg(named_struct(" in out


class TestJsonKeyExists:
    def test_existence_semantics(self, spark):
        from gfw_data_api_spark.sql.dialect import to_spark_sql

        row = run_pg_sql(
            spark, (
                """SELECT '{"k": null, "b": 1}' ? 'k' AS nullkey,
                '{"b": 1}' ? 'k' AS missing,
                '{"a": 1, "b": 2}' ?| ARRAY['x', 'b'] AS any_hit,
                '{"a": 1}' ?| ARRAY['x'] AS any_miss,
                '{"a": 1, "b": 2}' ?& ARRAY['a', 'b'] AS all_hit,
                '{"a": 1}' ?& ARRAY['a', 'b'] AS all_miss"""
            )
        ).collect()[0]
        assert row.nullkey is True  # PG: null-valued key still exists
        assert row.missing is False
        assert (row.any_hit, row.any_miss) == (True, False)
        assert (row.all_hit, row.all_miss) == (True, False)

    def test_loud_rejections(self):
        from gfw_data_api_spark.sql.dialect import translate_json_exists

        with pytest.raises(ValueError, match="string-literal key"):
            translate_json_exists("SELECT p ? col FROM t")
        with pytest.raises(ValueError, match="ARRAY"):
            translate_json_exists("SELECT p ?| 'k' FROM t")
        with pytest.raises(ValueError, match="string literals"):
            translate_json_exists("SELECT p ?& ARRAY[col] FROM t")


class TestJsonContainment:
    def test_containment_semantics(self, spark):
        from gfw_data_api_spark.sql.dialect import to_spark_sql

        row = run_pg_sql(
            spark, (
                """SELECT '{"k": 5, "s": "a"}' @> '{"k": 5}' AS hit,
                '{"k": 5.0}' @> '{"k": 5}' AS numeric_eq,
                '{"k": "5"}' @> '{"k": 5}' AS string_vs_number,
                '{"k": 5}' @> '{"x": 5}' AS missing,
                '{"b": true, "n": null}' @> '{"b": true, "n": null}' AS kinds,
                '{"k": 1}' <@ '{"k": 1, "z": 2}' AS flipped"""
            )
        ).collect()[0]
        assert row.hit is True
        assert row.numeric_eq is True  # jsonb numbers compare numerically
        assert row.string_vs_number is False  # "5" is not 5
        assert row.missing is False  # two-valued, never NULL
        assert row.kinds is True
        assert row.flipped is True

    def test_loud_rejections(self):
        from gfw_data_api_spark.sql.dialect import translate_json_contains

        with pytest.raises(ValueError, match="string-literal JSON needle"):
            translate_json_contains("SELECT a @> b FROM t")
        with pytest.raises(ValueError, match="JSON OBJECT"):
            translate_json_contains("SELECT a @> '5' FROM t")
        # nested object/array needles TRANSLATE since round 8
        # (TestNestedJsonbContainment) — only depth > 4 rejects
        with pytest.raises(ValueError, match="container levels"):
            translate_json_contains(
                "SELECT a @> '{\"k\": {\"n\": {\"m\": {\"o\": [1]}}}}' FROM t"
            )
        with pytest.raises(ValueError, match="not valid JSON"):
            translate_json_contains("SELECT a @> '{oops' FROM t")

    def test_array_needle_containment(self, spark):
        """Round-7 widening (VERDICT r6 #3): array needles of scalars."""
        from gfw_data_api_spark.sql.dialect import to_spark_sql

        row = run_pg_sql(
            spark, (
                """SELECT '["foo", "bar"]' @> '["foo"]' AS tag_hit,
                '["foo"]' @> '["foo", "bar"]' AS needs_all,
                '[1, 2.0]' @> '[2]' AS numeric_eq,
                '["5"]' @> '[5]' AS string_vs_number,
                '[true]' @> '[1]' AS bool_vs_number,
                '[true, null]' @> '[true, null]' AS kinds,
                '[1, 2]' @> '[]' AS empty_needle,
                '{"a": 1}' @> '[]' AS object_haystack,
                '["x"]' <@ '["x", "y"]' AS flipped"""
            )
        ).collect()[0]
        assert row.tag_hit is True
        assert row.needs_all is False  # every needle element required
        assert row.numeric_eq is True  # jsonb numbers compare numerically
        assert row.string_vs_number is False
        assert row.bool_vs_number is False  # true never matches 1
        assert row.kinds is True
        assert row.empty_needle is True  # any array contains []
        assert row.object_haystack is False  # haystack must be an array
        assert row.flipped is True


class TestSubstringRegex:
    def test_group_rule_and_null_on_no_match(self, spark):
        from gfw_data_api_spark.sql.dialect import to_spark_sql

        row = run_pg_sql(
            spark, (
                "SELECT substring('abc123def' FROM '[0-9]+') AS whole, "
                "substring('a1b2' FROM '([a-z])[0-9]') AS grp, "
                "substring('a1b2' FROM '(?:[a-z])([0-9])') AS noncap, "
                "substring('abc' FROM 'z+') AS miss, "
                "substring('abc123', '[0-9]+') AS comma_form"
            )
        ).collect()[0]
        assert row.whole == "123"
        assert row.grp == "a"  # first CAPTURE group, PG rule
        assert row.noncap == "1"  # (?:...) is not a capture group
        assert row.miss is None  # PG: NULL, not ''
        assert row.comma_form == "123"

    def test_positional_form_untouched(self, spark):
        from gfw_data_api_spark.sql.dialect import to_spark_sql

        sql = "SELECT substring('abcdef' FROM 2 FOR 3) AS r"
        assert to_spark_sql(sql) == sql
        assert spark.sql(sql).collect()[0].r == "bcd"


class TestConcatPrecedenceAbsorption:
    """PG puts || in the same left-assoc tier as SIMILAR TO and the
    json operators (round-7 ADVICE): the whole concatenation is the
    operand, not just the rightmost primary."""

    def test_similar_to_absorbs_concat_chain(self, spark):
        from gfw_data_api_spark.sql.dialect import to_spark_sql

        row = run_pg_sql(
            spark, (
                "SELECT 'a' || 'b' || 'c' SIMILAR TO 'a%c' AS hit, "
                "'a' || 'b' SIMILAR TO 'a' AS anchored_miss, "
                "'a' || 'b' NOT SIMILAR TO 'a' AS neg"
            )
        ).collect()[0]
        # PG: true / false / true — a string||boolean select list
        # would instead fail or silently concatenate
        assert (row.hit, row.anchored_miss, row.neg) == (True, False, True)

    def test_json_ops_absorb_concat_chain(self, spark):
        from gfw_data_api_spark.sql.dialect import to_spark_sql

        row = run_pg_sql(
            spark, (
                """SELECT '{"k":' || ' 5}' ->> 'k' AS t,
                '{"k":' || ' "v"}' -> 'k' AS j,
                '{"a":' || ' {"b": 2}}' #>> '{a,b}' AS p"""
            )
        ).collect()[0]
        assert (row.t, row.j, row.p) == ("5", '"v"', "2")

    def test_json_exists_and_contains_absorb_concat(self, spark):
        from gfw_data_api_spark.sql.dialect import to_spark_sql

        row = run_pg_sql(
            spark, (
                """SELECT '{"k":' || ' 1}' ? 'k' AS ex,
                '{"a": 1,' || ' "b": 2}' ?& ARRAY['a', 'b'] AS all_hit,
                '{"k":' || ' 5}' @> '{"k": 5}' AS cont"""
            )
        ).collect()[0]
        assert (row.ex, row.all_hit, row.cont) == (True, True, True)

    def test_translation_shape(self):
        from gfw_data_api_spark.sql.dialect import (
            translate_json_ops,
            translate_similar_to,
        )

        out = translate_json_ops("SELECT a || b ->> 'k' FROM t")
        assert "get_json_object(a || b, '$.k')" in out
        out = translate_similar_to("SELECT a || b SIMILAR TO 'x%' FROM t")
        assert out.startswith("SELECT (a || b RLIKE ")


class TestToCharDayOfYear:
    def test_ddd_zero_pads_like_pg(self, spark):
        from gfw_data_api_spark.sql.dialect import to_spark_sql

        row = run_pg_sql(
            spark, (
                "SELECT to_char(DATE '2024-02-01', 'YYYY-DDD') AS f, "
                "to_date('2024032', 'YYYYDDD') AS p"
            )
        ).collect()[0]
        assert row.f == "2024-032"  # PG pads day-of-year to 3 digits
        assert str(row.p) == "2024-02-01"

    def test_lone_d_stays_out_of_subset(self):
        import pytest

        from gfw_data_api_spark.sql.dialect import translate_to_char

        with pytest.raises(ValueError, match="outside the supported"):
            translate_to_char("SELECT to_char(d, 'D') FROM t")


class TestSubstrPositionalClamp:
    """PG counts substring positions on the number line; Spark treats
    negative starts as from-the-end (round-7 silent-divergence fix)."""

    def test_values_match_pg(self, spark):
        row = run_pg_sql(
            spark, (
                "SELECT substr('abc', 0 - 1, 2) AS a, "
                "substr('abcdef', 0 - 2, 4) AS b, "
                "substr('abc', 0, 2) AS c, "
                "substr('abcdef', 0 - 1) AS d, "
                "substring('abcdef' FROM 0 - 1 FOR 4) AS e, "
                "substr('abc', CAST(NULL AS INT), 2) AS n"
            )
        ).collect()[0]
        assert (row.a, row.b, row.c, row.d, row.e) == (
            "", "a", "a", "abcdef", "ab"
        )
        assert row.n is None  # CASE keeps NULL; greatest would eat it

    def test_safe_literals_untouched(self):
        from gfw_data_api_spark.sql.dialect import translate_substr_positional

        for sql in (
            "SELECT substr(x, 2, 5) FROM t",
            "SELECT substring(x, 1) FROM t",
            "SELECT substring('abcdef' FROM 2 FOR 3) AS r",
        ):
            assert translate_substr_positional(sql) == sql

    def test_literal_negative_length_raises_like_pg(self):
        from gfw_data_api_spark.sql.dialect import translate_substr_positional

        with pytest.raises(ValueError, match="negative substring length"):
            translate_substr_positional("SELECT substr(x, 1, -2) FROM t")


class TestLeftRightNegative:
    def test_values_match_pg(self, spark):
        row = run_pg_sql(
            spark, (
                "SELECT left('abcdef', 0 - 2) AS l, "
                "right('abcdef', 0 - 2) AS r, "
                "right('abcdef', 0 - 9) AS r_all_cut, "
                "right('abc', 1 + 9) AS r_long, "
                "left('abc', CAST(NULL AS INT)) AS ln, "
                "right('abc', CAST(NULL AS INT)) AS rn, "
                "right(left('abcdef', 0 - 1), 0 - 1) AS nested"
            )
        ).collect()[0]
        assert (row.l, row.r) == ("abcd", "cdef")  # all-but-last/first 2
        assert (row.r_all_cut, row.r_long) == ("", "abc")
        assert row.ln is None and row.rn is None
        assert row.nested == "bcde"

    def test_safe_literals_untouched(self):
        from gfw_data_api_spark.sql.dialect import translate_left_right

        sql = "SELECT left(x, 3), right(x, 4) FROM t"
        assert translate_left_right(sql) == sql


class TestIntCastRounding:
    def test_pg_rounds_half_away_where_spark_truncates(self, spark):
        row = run_pg_sql(
            spark, (
                "SELECT 2.5::int AS a, (0 - 2.5)::int AS b, "
                "2.4999::smallint AS c, CAST(3.5 AS INT) AS d, "
                "'9007199254740999'::bigint AS big, "
                "7::int AS ident"
            )
        ).collect()[0]
        assert (row.a, row.b, row.c, row.d) == (3, -3, 2, 4)
        # the DECIMAL(38,10) route keeps >2^53 integer strings exact
        assert row.big == 9007199254740999
        assert row.ident == 7


class TestDatePart:
    def test_field_map_matches_pg(self, spark):
        row = run_pg_sql(
            spark,
            "SELECT date_part('dow', DATE '2024-03-17') AS dow, "
            "date_part('isodow', DATE '2024-03-17') AS iso, "
            "date_part('epoch', DATE '2024-03-17') AS ep, "
            "date_part('year', DATE '2024-03-17') AS y",
        ).collect()[0]
        # PG: Sunday dow=0 (Spark's own date_part says 1 — the silent
        # off-by-one this pass exists for), isodow=7, epoch works on dates
        assert (row.dow, row.iso, row.y) == (0, 7, 2024)
        assert row.ep == 1710633600.0

    def test_dynamic_field_raises(self):
        from gfw_data_api_spark.sql.dialect import translate_date_part

        with pytest.raises(ValueError, match="string-literal field"):
            translate_date_part("SELECT date_part(f, d) FROM t")


class TestNegativeJsonIndex:
    def test_pg_from_end_indexing(self, spark):
        row = run_pg_sql(
            spark,
            "SELECT '[10,20,30]' ->> -1 AS last, "
            "'[10,20,30]' -> -2 AS mid, "
            "'[10,20]' ->> -5 AS oor, "
            "'{\"a\":1}' ->> -1 AS on_object",
        ).collect()[0]
        assert (row.last, row.mid) == ("30", "20")
        assert row.oor is None and row.on_object is None  # PG: NULL


class TestJsonbConcatMerge:
    def test_object_merge_right_wins_jsonb_key_order(self, spark):
        row = run_pg_sql(
            spark,
            "SELECT ('{\"a\": 1, \"bb\": 2}'::jsonb || "
            "'{\"a\": 9, \"c\": 3}'::jsonb) ->> 'a' AS a, "
            "('{\"bb\": 2}'::jsonb || '{\"a\": 1}'::jsonb) AS ordered, "
            "('{\"x\": 1}'::jsonb || '{\"y\": 2}'::jsonb || "
            "'{\"x\": 7}'::jsonb) ->> 'x' AS chained",
        ).collect()[0]
        assert row.a == "9"  # right operand wins per key
        assert row.ordered == '{"a":1,"bb":2}'  # length-then-bytes order
        assert row.chained == "7"  # left-assoc chain reduces pairwise

    def test_non_object_raises_at_runtime(self, spark):
        with pytest.raises(Exception, match="object"):
            run_pg_sql(spark, "SELECT '[1]'::jsonb || '[2]'::jsonb AS x").collect()

    def test_plain_string_concat_untouched(self):
        from gfw_data_api_spark.sql.dialect import translate_jsonb_concat

        sql = "SELECT a || b, 'x' || 'y' FROM t"
        assert translate_jsonb_concat(sql) == sql


def test_negative_path_element_rejects_loudly():
    # '$.-1' would silently probe an object key named "-1" where PG
    # indexes the array from the end — loud beats silent
    from gfw_data_api_spark.sql.dialect import translate_json_ops

    with pytest.raises(ValueError, match="negative json path element"):
        translate_json_ops("SELECT p #>> '{a,-1}' FROM t")


def test_initcap_pg_word_boundaries(spark):
    """PG initcap breaks words at EVERY non-alphanumeric char; Spark's
    native initcap only at whitespace — round-7 rewrite to a per-char
    fold (translate_pg_functions)."""
    row = run_pg_sql(
        spark,
        "SELECT initcap('hello-world x2y 3abc') AS a, "
        "initcap('') AS e, initcap(CAST(NULL AS VARCHAR)) AS n",
    ).collect()[0]
    assert row.a == "Hello-World X2y 3abc"  # Spark native: 'Hello-world'
    assert row.e == "" and row.n is None


class TestFourthDialectWave:
    def test_extract_century_decade_millennium(self, spark):
        row = run_pg_sql(
            spark,
            "SELECT EXTRACT(DECADE FROM DATE '1995-07-16') AS dec, "
            "EXTRACT(CENTURY FROM DATE '2000-12-31') AS c2000, "
            "EXTRACT(CENTURY FROM DATE '2001-01-01') AS c2001, "
            "EXTRACT(MILLENNIUM FROM DATE '2001-01-01') AS mil, "
            "date_part('decade', DATE '1989-01-01') AS dp",
        ).collect()[0]
        # PG: centuries/millennia count from year 1 — 2000 closes the
        # 20th century, 2001 opens the 21st
        assert (row.dec, row.c2000, row.c2001, row.mil, row.dp) == (
            199, 20, 21, 3, 198,
        )

    def test_to_hex_lowercase(self, spark):
        row = run_pg_sql(
            spark, "SELECT to_hex(255) AS a, to_hex(3735928559) AS b"
        ).collect()[0]
        assert (row.a, row.b) == ("ff", "deadbeef")  # Spark hex() is upper

    def test_trunc_toward_zero(self, spark):
        row = run_pg_sql(
            spark,
            "SELECT trunc(2.77) AS a, trunc(0 - 2.77) AS b, "
            "trunc(2.777, 2) AS c, trunc(0 - 2.777, 2) AS d, "
            "trunc(123.4, -1) AS e",
        ).collect()[0]
        assert [float(v) for v in (row.a, row.b, row.c, row.d, row.e)] == [
            2, -2, 2.77, -2.77, 120,
        ]

    def test_trunc_dynamic_scale_raises(self):
        from gfw_data_api_spark.sql.dialect import translate_pg_functions

        with pytest.raises(ValueError, match="integer-literal scale"):
            translate_pg_functions("SELECT trunc(x, n) FROM t")

    def test_like_any_all_over_arrays(self, spark):
        row = run_pg_sql(
            spark,
            "SELECT ('abc' LIKE ANY(ARRAY['a%', 'z%'])) AS la, "
            "('abc' LIKE ALL(ARRAY['a%', '%c'])) AS lall, "
            "('ABC' ILIKE ANY(ARRAY['a%'])) AS il, "
            "('abc' NOT LIKE ALL(ARRAY['z%', 'q%'])) AS nl",
        ).collect()[0]
        assert (row.la, row.lall, row.il, row.nl) == (True, True, True, True)


class TestCastSuffixedJsonOperands:
    """Round-7 review find: `props::jsonb ->> 'k'` resolved its lhs
    primary as the TYPE ident, emitting unparseable SQL; `<@ x::jsonb`
    left the cast dangling on the rewritten boolean. Both operand
    walks now absorb ::type suffixes (and chains)."""

    def test_casted_lhs_all_json_ops(self, spark):
        row = run_pg_sql(
            spark,
            """SELECT '{"k": 7}'::jsonb ->> 'k' AS a,
            '{"k": 7}'::jsonb ? 'k' AS b,
            '{"k": 7}'::jsonb @> '{"k": 7}' AS c,
            '{"k": 7}' <@ '{"k": 7, "z": 1}'::jsonb AS d,
            '{"k": 7}'::text::jsonb ->> 'k' AS chained""",
        ).collect()[0]
        assert row.a == "7" and row.chained == "7"
        assert (row.b, row.c, row.d) == (True, True, True)

    def test_concat_then_cast_merges_like_pg(self, spark):
        # all three ops share one left-assoc tier: (a || b::jsonb) ->> k
        # is a jsonb MERGE then an extraction in PG
        row = run_pg_sql(
            spark,
            "SELECT ('{\"a\": 1}' || '{\"k\": 9}'::jsonb) ->> 'k' AS v",
        ).collect()[0]
        assert row.v == "9"


class TestFifthDialectWave:
    def test_ltrim_rtrim_two_arg_pg_order(self, spark):
        """Spark's 2-arg ltrim/rtrim are (trimStr, str) — REVERSED from
        PG — so untranslated calls silently trimmed the wrong operand.
        The rewrite goes through TRIM syntax (shared semantics)."""
        row = run_pg_sql(
            spark,
            "SELECT ltrim('xxab', 'x') AS l2, rtrim('abxx', 'x') AS r2, "
            "ltrim('  ab  ') AS l1, rtrim('  ab  ') AS r1, "
            "btrim('xxabxx', 'x') AS b2",
        ).collect()[0]
        assert (row.l2, row.r2) == ("ab", "ab")  # Spark native: '' / ''
        assert (row.l1, row.r1) == ("ab  ", "  ab")
        assert row.b2 == "ab"  # btrim is (str, trimStr) in BOTH engines

    def test_format_to_format_string(self, spark):
        row = run_pg_sql(
            spark, "SELECT format('%s-%s %%ok', 'a', 7) AS f"
        ).collect()[0]
        assert row.f == "a-7 %ok"

    def test_format_loud_rejections(self):
        from gfw_data_api_spark.sql.dialect import translate_pg_functions

        with pytest.raises(ValueError, match="outside the translatable"):
            translate_pg_functions("SELECT format('%I', x) FROM t")
        with pytest.raises(ValueError, match="string-literal template"):
            translate_pg_functions("SELECT format(tpl, x) FROM t")

    def test_div_is_native_toward_zero(self, spark):
        # Spark's div() already truncates toward zero like PG — pinned
        # here so a regression would be loud
        row = run_pg_sql(spark, "SELECT div(7, 2) AS a, div(-7, 2) AS b").collect()[0]
        assert (row.a, row.b) == (3, -3)


def test_regex_match_quantifiers(spark):
    """PG quantifies the regex operators too: x ~ ANY(patterns)
    (untranslated this emitted RLIKE ANY(array(...)) — a parse error)."""
    row = run_pg_sql(
        spark,
        "SELECT ('abc123' ~ ANY(ARRAY['^z', '[0-9]+'])) AS a, "
        "('abc' ~ ALL(ARRAY['^a', 'c$'])) AS b, "
        "('ABC' ~* ANY(ARRAY['b'])) AS c, "
        "('abc' !~ ALL(ARRAY['z', 'q'])) AS d, "
        "('abc' !~* ANY(ARRAY['B'])) AS e",
    ).collect()[0]
    assert (row.a, row.b, row.c, row.d, row.e) == (
        True, True, True, True, False,
    )


def test_posix_bracket_classes_translate(spark):
    """PG/POSIX [[:alpha:]]-style classes work on PG and DuckDB but
    are a Java-regex parse error — spliced to \\p{...} twins in every
    literal-pattern consumer (regex ops, regexp_replace,
    substring-from-regex, SIMILAR TO)."""
    row = run_pg_sql(
        spark,
        "SELECT ('ab1' ~ '^[[:alpha:]]+[[:digit:]]$') AS a, "
        "('a_b' ~ '^[[:word:]]+$') AS w, "
        "regexp_replace('a1b2', '[[:digit:]]', '#', 'g') AS r, "
        "substring('ab 12' FROM '[[:digit:]]+') AS s, "
        "('abc' SIMILAR TO '[[:alpha:]]+') AS sim, "
        "('AB' ~* '[[:lower:]]') AS ci",
    ).collect()[0]
    assert (row.a, row.w, row.sim, row.ci) == (True, True, True, True)
    assert row.r == "a#b#" and row.s == "12"


def test_unknown_posix_class_raises():
    from gfw_data_api_spark.sql.dialect import _translate_posix_classes

    with pytest.raises(ValueError, match="POSIX class"):
        _translate_posix_classes("[[:bogus:]]")


class TestRound7AdviceRegressions:
    """The four ADVICE r7 findings: literal-conf race, non-ASCII json
    comparison literals, chained-cast jsonb ||, SIMILAR-TO-escape
    substring form."""

    def test_non_ascii_json_keys_and_needles(self, spark):
        # json.dumps' default \uXXXX escaping never matches Spark's
        # raw-UTF-8 to_json output — x ? 'café' and @> '["Łódź"]'
        # were silently FALSE
        row = run_pg_sql(
            spark,
            "SELECT ('{\"café\": \"Łódź\"}' ? 'café') AS haskey, "
            "('[\"Łódź\"]' @> '[\"Łódź\"]') AS arr, "
            "('{\"café\": \"Łódź\"}' @> '{\"café\": \"Łódź\"}') AS obj, "
            "('{\"café\": 1}' ->> 'café') AS val, "
            "('[\"café\"]' @> '[\"cafe\"]') AS neg",
        ).collect()[0]
        assert (row.haskey, row.arr, row.obj, row.neg) == (
            True,
            True,
            True,
            False,
        )
        assert row.val == "1"

    def test_jsonb_concat_chained_casts(self, spark):
        # a::text::jsonb || b::jsonb used to emit malformed SQL
        # (the left operand landed on the inner type ident)
        row = run_pg_sql(
            spark,
            "SELECT ('{\"a\": 1}'::text::jsonb || "
            "'{\"b\": 2}'::jsonb) ->> 'b' AS b",
        ).collect()[0]
        assert row.b == "2"

    def test_jsonb_concat_mixed_final_cast_rejects(self):
        from gfw_data_api_spark.sql.dialect import translate_jsonb_concat

        with pytest.raises(ValueError, match="non-jsonb"):
            translate_jsonb_concat("SELECT a::jsonb::text || b::jsonb FROM t")
        with pytest.raises(ValueError, match="non-jsonb"):
            translate_jsonb_concat("SELECT a::jsonb || b::int FROM t")

    def test_substring_similar_escape_form_rejects(self):
        # substring(s FROM 'pat' FOR 'esc') treated as positional would
        # CAST('pat' AS INT) → silent NULLs
        with pytest.raises(ValueError, match="SIMILAR"):
            to_spark_sql("SELECT substring(s FROM 'a#%' FOR '#') FROM t")
        with pytest.raises(ValueError, match="SIMILAR"):
            to_spark_sql("SELECT substring(s, 'a#%', '#') FROM t")

    def test_literal_conf_refcount_nesting(self, spark):
        from gfw_data_api_spark.sql.dialect import (
            _ESCAPED_LITERALS_CONF,
            pg_literal_parsing,
        )

        old = spark.conf.get(_ESCAPED_LITERALS_CONF)
        with pg_literal_parsing(spark):
            assert spark.conf.get(_ESCAPED_LITERALS_CONF) == "true"
            with pg_literal_parsing(spark):
                assert spark.conf.get(_ESCAPED_LITERALS_CONF) == "true"
            # inner exit must NOT restore while the outer window is open
            assert spark.conf.get(_ESCAPED_LITERALS_CONF) == "true"
        assert spark.conf.get(_ESCAPED_LITERALS_CONF) == old

    def test_literal_conf_concurrent_windows(self, spark):
        """Overlapping windows from two threads: the conf must stay
        'true' until the LAST window closes (the r7 race restored it
        mid-parse)."""
        import threading as th

        from gfw_data_api_spark.sql.dialect import (
            _ESCAPED_LITERALS_CONF,
            pg_literal_parsing,
        )

        old = spark.conf.get(_ESCAPED_LITERALS_CONF)
        a_open = th.Event()
        b_done = th.Event()
        seen = {}

        def holder():
            with pg_literal_parsing(spark):
                a_open.set()
                b_done.wait(timeout=30)
                seen["during"] = spark.conf.get(_ESCAPED_LITERALS_CONF)

        def flipper():
            a_open.wait(timeout=30)
            with pg_literal_parsing(spark):
                pass  # enter+exit fully inside holder's window
            b_done.set()

        t1, t2 = th.Thread(target=holder), th.Thread(target=flipper)
        t1.start(); t2.start(); t1.join(); t2.join()
        assert seen["during"] == "true"
        assert spark.conf.get(_ESCAPED_LITERALS_CONF) == old


class TestTypedOps:
    """Round-8 schema-aware typing (VERDICT r7 #1): with the bound
    table's column types, the last everyday SILENT divergences close —
    int/int division (PG truncates, Spark promoted to DOUBLE),
    date - date (PG integer days, Spark INTERVAL), bool::int (raised),
    and float8→int rounding (PG half-EVEN)."""

    CT = {
        "a": "int", "b": "bigint", "s": "smallint", "d1": "date",
        "d2": "date", "x": "double", "f": "float", "dec": "decimal",
        "bl": "bool", "ts": "timestamp", "txt": "string",
    }

    def t(self, sql):
        from gfw_data_api_spark.sql.dialect import translate_typed_ops

        return translate_typed_ops(sql, self.CT)

    def test_int_division_to_div(self):
        assert "div" in self.t("SELECT a / b FROM t")
        assert "div" in self.t("SELECT 7 / 2 FROM t")
        assert "div" in self.t("SELECT sum(a) / count(*) FROM t")
        assert "div" in self.t("SELECT (a + b) / 2 FROM t")
        assert "div" in self.t("SELECT t.a / t.b FROM t")

    def test_non_integral_division_untouched(self):
        # PG numeric/float division is EXACT — rewriting would be wrong
        for sql in (
            "SELECT x / a FROM t",
            "SELECT a / x FROM t",
            "SELECT avg(a) / 2 FROM t",
            "SELECT sum(b) / count(*) FROM t",  # PG sum(int8) → numeric
            "SELECT extract(year from d1) / 10 FROM t",
            "SELECT dec / 2 FROM t",
            "SELECT unknown_col / 2 FROM t",
        ):
            assert self.t(sql) == sql

    def test_division_chain_left_assoc(self):
        assert (
            self.t("SELECT a / b / 2 FROM t")
            == "SELECT a  div  b  div  2 FROM t"
        )
        # one non-integral element poisons the whole chain
        assert self.t("SELECT x * a / b FROM t") == "SELECT x * a / b FROM t"

    def test_date_minus_date(self):
        assert self.t("SELECT d1 - d2 FROM t") == "SELECT datediff(d1, d2) FROM t"
        assert (
            self.t("SELECT d1 + 1 - d2 FROM t")
            == "SELECT datediff(d1 + 1, d2) FROM t"
        )
        assert (
            self.t("SELECT DATE '2024-01-05' - d2 FROM t")
            == "SELECT datediff(DATE '2024-01-05', d2) FROM t"
        )
        assert (
            self.t("SELECT max(d1) - min(d2) FROM t")
            == "SELECT datediff(max(d1), min(d2)) FROM t"
        )

    def test_date_minus_int_untouched(self):
        # PG date - int is a date — Spark agrees natively
        assert self.t("SELECT d1 - 3 FROM t") == "SELECT d1 - 3 FROM t"
        assert self.t("SELECT ts - ts FROM t") == "SELECT ts - ts FROM t"

    def test_composed_weeks_since(self):
        assert (
            self.t("SELECT (d1 - d2) / 7 FROM t")
            == "SELECT (datediff(d1, d2))  div  7 FROM t"
        )

    def test_typed_int_casts(self):
        assert self.t("SELECT bl::int FROM t") == "SELECT CAST(bl AS INT) FROM t"
        assert (
            self.t("SELECT x::int FROM t")
            == "SELECT CAST(rint(x) AS INT) FROM t"
        )
        assert (
            self.t("SELECT f::bigint FROM t")
            == "SELECT CAST(rint(f) AS BIGINT) FROM t"
        )
        assert (
            self.t("SELECT CAST(x AS INT) FROM t")
            == "SELECT CAST(rint(x) AS INT) FROM t"
        )
        assert (
            self.t("SELECT CAST(dec AS BIGINT) FROM t")
            == "SELECT CAST(round(dec, 0) AS BIGINT) FROM t"
        )

    def test_casts_left_for_generic_route(self):
        # decimal ::int keeps the generic DECIMAL half-away route;
        # integral/string casts stay native
        for sql in (
            "SELECT dec::int FROM t",
            "SELECT CAST(a AS BIGINT) FROM t",
            "SELECT CAST(txt AS INT) FROM t",
        ):
            assert self.t(sql) == sql

    def test_no_types_is_identity(self):
        from gfw_data_api_spark.sql.dialect import translate_typed_ops

        sql = "SELECT a / b, d1 - d2, x::int FROM t"
        assert translate_typed_ops(sql, None) == sql

    def test_values_through_guarded_path(self, spark):
        """End-to-end: execute_on_dataframe derives the type map from the
        DataFrame schema; values must be PG's."""
        from gfw_data_api_spark.operators.query import execute_on_dataframe

        df = spark.sql(
            "SELECT CAST(-7 AS INT) AS a, CAST(2 AS BIGINT) AS b, "
            "DATE '2024-03-01' AS d1, DATE '2024-01-05' AS d2, "
            "CAST(2.5 AS DOUBLE) AS x, CAST(3.5 AS DOUBLE) AS y, "
            "true AS bl"
        )
        row = execute_on_dataframe(
            spark,
            df,
            "SELECT a / b AS q, d1 - d2 AS days, x::int AS xi, "
            "y::int AS yi, bl::int AS bi, (d1 - d2) / 7 AS weeks "
            "FROM t",
        ).collect()[0]
        # PG: -7/2 = -3 (toward zero); 2024-03-01 - 2024-01-05 = 56;
        # 2.5::int = 2 and 3.5::int = 4 (float8 half-EVEN); true::int = 1
        assert (row.q, row.days, row.xi, row.yi, row.bi, row.weeks) == (
            -3, 56, 2, 4, 1, 8,
        )

    def test_schema_type_categories(self, spark):
        from gfw_data_api_spark.sql.dialect import schema_type_categories

        df = spark.sql(
            "SELECT CAST(1 AS INT) AS i, CAST(1 AS BIGINT) AS l, "
            "CAST(1 AS SMALLINT) AS sm, CAST(1.0 AS DOUBLE) AS d, "
            "CAST(1.0 AS FLOAT) AS fl, CAST(1 AS DECIMAL(10,2)) AS de, "
            "true AS bo, DATE '2024-01-01' AS dt, "
            "TIMESTAMP '2024-01-01 00:00:00' AS ts, 'x' AS st, "
            "array(1) AS arr"
        )
        cats = schema_type_categories(df.schema)
        assert cats == {
            "i": "int", "l": "bigint", "sm": "smallint", "d": "double",
            "fl": "float", "de": "decimal", "bo": "bool", "dt": "date",
            "ts": "timestamp", "st": "string", "arr": "unknown",
        }


class TestSetReturningFunctions:
    """Round-8 SRF subset (VERDICT r7 #4): unnest / generate_series /
    jsonb_array_elements(_text) as bare top-level SELECT items; loud
    rejection outside the subset."""

    def test_translations(self):
        out = to_spark_sql("SELECT unnest(ARRAY['a','b']) FROM t")
        assert "explode((array('a','b'))) AS unnest" in out
        out = to_spark_sql("SELECT generate_series(1, 5) FROM t")
        assert "sequence((1), (5))" in out and "AS generate_series" in out
        out = to_spark_sql("SELECT jsonb_array_elements(j) AS e FROM t")
        assert "array<variant>" in out and "to_json" in out

    def test_rejections(self):
        import pytest as _pt

        # NB: multiple consecutive unnests (lockstep) and dynamic
        # generate_series steps TRANSLATE since the round-8 widenings —
        # see TestSrfRound8Widenings
        for bad in (
            "SELECT 1 + unnest(a) FROM t",
            "SELECT a FROM t WHERE unnest(b) = 1",
            "SELECT abs(unnest(a)) FROM t",
            "SELECT (SELECT unnest(a) FROM t) FROM t",
            "SELECT unnest(a) FROM t GROUP BY unnest(a)",
        ):
            with _pt.raises(ValueError):
                to_spark_sql(bad)

    def test_values(self, spark):
        # PG: unnest of empty/NULL → zero rows; order preserved
        rows = run_pg_sql(
            spark,
            "SELECT unnest(ARRAY['x','y','z']) AS u",
        ).collect()
        assert [r.u for r in rows] == ["x", "y", "z"]
        # generate_series: forward, EMPTY reverse (PG), negative step
        assert [
            r.generate_series
            for r in run_pg_sql(spark, "SELECT generate_series(2, 5)").collect()
        ] == [2, 3, 4, 5]
        assert (
            run_pg_sql(spark, "SELECT generate_series(5, 2)").count() == 0
        )
        assert [
            r.g
            for r in run_pg_sql(
                spark, "SELECT generate_series(10, 1, -4) AS g"
            ).collect()
        ] == [10, 6, 2]
        assert (
            run_pg_sql(spark, "SELECT generate_series(1, 10, -2)").count()
            == 0
        )
        # jsonb_array_elements: jsonb mode keeps quoting; text mode
        # unquotes and maps json null → SQL NULL
        assert [
            r.value
            for r in run_pg_sql(
                spark,
                "SELECT jsonb_array_elements('[\"a\", 1, true, null]')",
            ).collect()
        ] == ['"a"', "1", "true", "null"]
        assert [
            r.v
            for r in run_pg_sql(
                spark,
                "SELECT jsonb_array_elements_text('[\"a\", 1, true, null]') AS v",
            ).collect()
        ] == ["a", "1", "true", None]


class TestNestedJsonbContainment:
    """Round-8 nested @>/<@ (VERDICT r7 #8): recursive needle expansion
    into typed variant probes, bounded at 4 container levels. The
    expectations below are PG's documented recursive containment rules
    (and DuckDB's json_contains agrees on every one — the q53 oracle)."""

    CASES = [
        ('{"a": {"b": 1, "c": 2}}', '{"a": {"b": 1}}', True),
        ('{"a": {"b": 1}}', '{"a": {"b": 2}}', False),
        ('{"a": [1, 2]}', '{"a": [2]}', True),
        ('[{"x": 1, "y": 2}]', '[{"x": 1}]', True),
        ('[{"x": 1}]', '[{"x": 2}]', False),
        ('[[1, 2], [3]]', '[[2]]', True),
        # scalar needle vs array value: the array-contains-scalar
        # exception is TOP-LEVEL-ONLY in PG — nested is equality
        ('{"a": [1, 2]}', '{"a": 1}', False),
        ('{"a": {"b": 1}}', '{"a": {}}', True),
        ('{"a": 1}', '{"a": {}}', False),
        ('{"a": [1, 2]}', '{"a": []}', True),
        ('{"a": {"b": [1, {"z": 5}]}}', '{"a": {"b": [{"z": 5}]}}', True),
        ('{"a": {"b": [1, {"z": 5}]}}', '{"a": {"b": [{"z": 6}]}}', False),
        ('{"a": {"b": "x"}, "c": 3}', '{"c": 3.0, "a": {"b": "x"}}', True),
        ('{"a": {"b": "5"}}', '{"a": {"b": 5}}', False),
        ('{"a": {"café": "Łódź"}}', '{"a": {"café": "Łódź"}}', True),
    ]

    def test_pg_recursive_rules(self, spark):
        items = ", ".join(
            f"('{h}' @> '{n}') AS r{i}" for i, (h, n, _) in enumerate(self.CASES)
        )
        row = run_pg_sql(spark, f"SELECT {items}").collect()[0]
        got = [row[f"r{i}"] for i in range(len(self.CASES))]
        assert got == [w for _, _, w in self.CASES]

    def test_flipped_orientation(self, spark):
        row = run_pg_sql(
            spark,
            "SELECT ('{\"a\": {\"b\": 1}}' <@ "
            "'{\"a\": {\"b\": 1, \"c\": 2}, \"d\": 4}') AS r",
        ).collect()[0]
        assert row.r is True

    def test_depth_bound_rejects(self):
        import pytest as _pt

        with _pt.raises(ValueError, match="container levels"):
            to_spark_sql(
                "SELECT ('{}' @> "
                "'{\"a\": {\"b\": {\"c\": {\"d\": [1]}}}}') AS r"
            )

    def test_differential_vs_duckdb_json_contains(self, spark):
        """Seeded nested haystack/needle pairs: the dialect's expansion
        vs DuckDB's json_contains (probed to share PG's recursive
        rules). Needles derive from the haystack by projection +
        mutation so TRUE and FALSE both occur."""
        import copy
        import json
        import random

        import duckdb

        rng = random.Random(20260816)
        scalars = [1, 2, 5.0, "x", "café", True, None]
        keys = ["a", "b", "k", "café"]

        def build(depth):
            if depth >= 3 or rng.random() < 0.35:
                return rng.choice(scalars)
            if rng.random() < 0.5:
                return {
                    k: build(depth + 1)
                    for k in rng.sample(keys, rng.randint(1, 3))
                }
            return [build(depth + 1) for _ in range(rng.randint(1, 3))]

        def project(v):
            """A (maybe mutated) sub-structure of v."""
            if isinstance(v, dict) and v:
                out = {
                    k: project(val)
                    for k, val in v.items()
                    if rng.random() < 0.7
                }
                return out if out else {}
            if isinstance(v, list) and v:
                return [project(e) for e in v if rng.random() < 0.6]
            if rng.random() < 0.25:
                return rng.choice(scalars)  # mutation → likely FALSE
            return v

        con = duckdb.connect()
        pairs = []
        while len(pairs) < 60:
            h = build(0)
            if not isinstance(h, (dict, list)):
                continue
            n = project(copy.deepcopy(h))
            if not isinstance(n, (dict, list)) or n == {}:
                continue
            ht = json.dumps(h, ensure_ascii=False)
            nt = json.dumps(n, ensure_ascii=False)
            if "'" in ht or "'" in nt:
                continue
            pairs.append((ht, nt))
        items = ", ".join(
            f"('{h}' @> '{n}') AS r{i}" for i, (h, n) in enumerate(pairs)
        )
        row = run_pg_sql(spark, f"SELECT {items}").collect()[0]
        mism = []
        for i, (h, n) in enumerate(pairs):
            want = con.execute(
                "SELECT json_contains(?, ?)", [h, n]
            ).fetchone()[0]
            if bool(row[f"r{i}"]) != bool(want):
                mism.append(f"{h} @> {n}: spark={row[f'r{i}']} duck={want}")
        assert not mism, "\n".join(mism[:10])


class TestTypedOpsCaseInference:
    """Round-8 follow-on: CASE…END types from its THEN/ELSE arms, so
    the conditional-ratio idiom sum(CASE WHEN … THEN 1 ELSE 0 END) /
    count(*) gets PG's truncating division."""

    CT = {"a": "int", "b": "bigint", "x": "double", "bl": "bool",
          "d1": "date", "d2": "date"}

    def t(self, sql):
        from gfw_data_api_spark.sql.dialect import translate_typed_ops

        return translate_typed_ops(sql, self.CT)

    def test_conditional_ratio_rewrites(self):
        out = self.t(
            "SELECT sum(CASE WHEN bl THEN 1 ELSE 0 END) / count(*) FROM t"
        )
        assert "div" in out

    def test_case_arm_folding(self):
        assert "div" in self.t("SELECT CASE WHEN bl THEN a ELSE b END / 2 FROM t")
        assert "div" in self.t("SELECT CASE WHEN bl THEN 1 END / 2 FROM t")
        assert "div" in self.t(
            "SELECT CASE WHEN bl THEN a ELSE NULL END / 2 FROM t"
        )
        assert "div" in self.t("SELECT CASE a WHEN 1 THEN 2 ELSE 3 END / 2 FROM t")
        # nested CASE arms fold too
        assert "div" in self.t(
            "SELECT CASE WHEN bl THEN CASE WHEN a > 1 THEN 1 ELSE 2 END "
            "ELSE 3 END / 2 FROM t"
        )

    def test_mixed_arms_stay_untouched(self):
        sql = "SELECT CASE WHEN bl THEN a ELSE x END / 2 FROM t"
        assert self.t(sql) == sql

    def test_date_case_minus(self):
        out = self.t("SELECT CASE WHEN bl THEN d1 ELSE d2 END - d2 FROM t")
        assert out == "SELECT datediff(CASE WHEN bl THEN d1 ELSE d2 END, d2) FROM t"

    def test_conditional_ratio_value(self, spark):
        from gfw_data_api_spark.operators.query import execute_on_dataframe

        df = spark.sql(
            "SELECT explode(sequence(1, 10)) AS k"
        ).selectExpr("k", "k % 3 = 0 AS hit")
        row = execute_on_dataframe(
            spark,
            df,
            "SELECT sum(CASE WHEN hit THEN 1 ELSE 0 END) / count(*) AS frac "
            "FROM t",
        ).collect()[0]
        # PG: 3/10 with int8 division = 0 (truncating), not 0.3
        assert row.frac == 0


class TestSrfRound8Widenings:
    """Lockstep multi-unnest (PG ≥10: rows = longest, null-padded —
    arrays_zip + inline) and dynamic generate_series steps (runtime
    sign guard; step 0 raises like PG)."""

    def test_lockstep_translation(self):
        out = to_spark_sql(
            "SELECT unnest(ARRAY[1,2,3]) AS u, unnest(ARRAY['a','b']) AS v FROM t"
        )
        assert "inline(arrays_zip(" in out and "AS (u, v)" in out

    def test_lockstep_values_null_pad(self, spark):
        rows = run_pg_sql(
            spark,
            "SELECT unnest(ARRAY[1,2,3]) AS u, unnest(ARRAY['a','b']) AS v",
        ).collect()
        assert [(r.u, r.v) for r in rows] == [(1, "a"), (2, "b"), (3, None)]

    def test_lockstep_rejections(self):
        import pytest as _pt

        for bad in (
            "SELECT unnest(a), x, unnest(b) FROM t",      # scattered
            "SELECT unnest(a), generate_series(1, 3) FROM t",  # mixed
            "SELECT unnest(a, b), unnest(c) FROM t",      # multi-arg
        ):
            with _pt.raises(ValueError):
                to_spark_sql(bad)

    def test_dynamic_step_values(self, spark):
        spark.sql("SELECT explode(sequence(1, 6)) AS n").createOrReplaceTempView(
            "gfw_dynstep_t"
        )
        rows = run_pg_sql(
            spark, "SELECT n, generate_series(1, n, n) AS g FROM gfw_dynstep_t"
        ).collect()
        assert sorted((r.n, r.g) for r in rows) == [
            (1, 1), (2, 1), (3, 1), (4, 1), (5, 1), (6, 1)
        ]
        # wrong-sign dynamic → PG's zero rows (Spark sequence would raise)
        assert (
            run_pg_sql(
                spark, "SELECT generate_series(5, 1, n) AS g FROM gfw_dynstep_t"
            ).count()
            == 0
        )

    def test_zero_step_raises_at_runtime(self, spark):
        import pytest as _pt

        spark.sql("SELECT 1 AS n").createOrReplaceTempView("gfw_zstep_t")
        with _pt.raises(Exception, match="step must not be zero"):
            run_pg_sql(
                spark,
                "SELECT generate_series(1, 3, n - n) AS g FROM gfw_zstep_t",
            ).collect()


class TestTypedOpsFilterClause:
    """Round-8 follow-on: `agg(…) FILTER (WHERE …)` types as the
    aggregate, so filtered-count ratios get PG's truncating division."""

    CT = {"a": "int", "bl": "bool", "x": "double", "d1": "date", "d2": "date"}

    def t(self, sql):
        from gfw_data_api_spark.sql.dialect import translate_typed_ops

        return translate_typed_ops(sql, self.CT)

    def test_filter_ratio_rewrites(self):
        assert "div" in self.t(
            "SELECT count(*) FILTER (WHERE bl) / count(*) FROM t"
        )
        assert "div" in self.t("SELECT sum(a) FILTER (WHERE bl) / 2 FROM t")

    def test_filter_avg_stays(self):
        sql = "SELECT avg(a) FILTER (WHERE bl) / 2 FROM t"
        assert self.t(sql) == sql

    def test_filter_date_minus_both_sides(self):
        assert (
            self.t("SELECT max(d1) FILTER (WHERE bl) - min(d2) FROM t")
            == "SELECT datediff(max(d1) FILTER (WHERE bl), min(d2)) FROM t"
        )
        assert (
            self.t("SELECT d1 - max(d2) FILTER (WHERE bl) FROM t")
            == "SELECT datediff(d1, max(d2) FILTER (WHERE bl)) FROM t"
        )

    def test_values(self, spark):
        from gfw_data_api_spark.operators.query import execute_on_dataframe

        df = spark.sql("SELECT explode(sequence(1, 10)) AS k").selectExpr(
            "k", "k % 3 = 0 AS hit", "DATE '2024-01-01' + k AS d"
        )
        row = execute_on_dataframe(
            spark,
            df,
            "SELECT count(*) FILTER (WHERE hit) / count(*) AS frac, "
            "CAST(max(d) FILTER (WHERE hit) - min(d) AS BIGINT) AS span "
            "FROM t",
        ).collect()[0]
        # PG: 3/10 truncates to 0; dates 2024-01-10 (k=9 hit) - 2024-01-02
        assert row.frac == 0
        assert row.span == 8


def test_typed_div_respects_caret_precedence():
    """PG ^ (float8 power) binds tighter than / — power-adjacent
    operands must keep float division (the ^ translation to POWER runs
    in a LATER pass, so the typed pass sees the raw operator)."""
    from gfw_data_api_spark.sql.dialect import translate_typed_ops

    ct = {"a": "int", "b": "bigint"}
    for sql in (
        "SELECT a ^ 2 / b FROM t",
        "SELECT a / b ^ 2 FROM t",
        "SELECT a ^ 2 * 3 / b FROM t",
    ):
        assert translate_typed_ops(sql, ct) == sql
    assert "div" in translate_typed_ops("SELECT 3 * a / b FROM t", ct)


class TestOverlapsAndNullCounters:
    """Round-8 breadth: SQL-standard (s1,e1) OVERLAPS (s2,e2) — Spark's
    parser rejects the row form — and PG's num_nonnulls/num_nulls.
    Expectations are PG's documented half-open/point rules."""

    def test_overlaps_documented_examples(self, spark):
        cases = [
            ("(DATE '2001-02-16', DATE '2001-12-21') OVERLAPS "
             "(DATE '2001-10-30', DATE '2002-10-30')", True),
            ("(DATE '2001-02-16', DATE '2001-12-21') OVERLAPS "
             "(DATE '2002-10-30', DATE '2002-10-31')", False),
            # half-open: shared endpoint does not overlap
            ("(DATE '2001-10-29', DATE '2001-10-30') OVERLAPS "
             "(DATE '2001-10-30', DATE '2001-10-31')", False),
            # a point at an interval's START overlaps; at its END not
            ("(DATE '2001-10-30', DATE '2001-10-30') OVERLAPS "
             "(DATE '2001-10-30', DATE '2001-10-31')", True),
            ("(DATE '2001-10-30', DATE '2001-10-30') OVERLAPS "
             "(DATE '2001-10-29', DATE '2001-10-30')", False),
            # pairs normalize (swap) like PG
            ("(DATE '2001-12-21', DATE '2001-02-16') OVERLAPS "
             "(DATE '2001-10-30', DATE '2002-10-30')", True),
        ]
        items = ", ".join(f"({e}) AS r{i}" for i, (e, _) in enumerate(cases))
        row = run_pg_sql(spark, f"SELECT {items}").collect()[0]
        assert [row[f"r{i}"] for i in range(len(cases))] == [w for _, w in cases]

    def test_null_counters(self, spark):
        row = run_pg_sql(
            spark,
            "SELECT num_nonnulls(1, NULL, 'x') AS a, "
            "num_nulls(1, NULL, 3) AS b, num_nonnulls(NULL) AS c",
        ).collect()[0]
        assert (row.a, row.b, row.c) == (2, 1, 0)

    def test_through_guarded_path(self, spark):
        from gfw_data_api_spark.operators.query import execute_on_dataframe

        df = spark.sql(
            "SELECT explode(sequence(1, 5)) AS k"
        ).selectExpr("k", "DATE '2024-01-01' + k AS d")
        rows = execute_on_dataframe(
            spark,
            df,
            "SELECT k, (d, d + 10) OVERLAPS "
            "(DATE '2024-01-08', DATE '2024-01-09') AS hit, "
            "num_nonnulls(nullif(k, 3), d) AS nn "
            "FROM t ORDER BY k",
        ).collect()
        assert [(r.k, r.hit, r.nn) for r in rows] == [
            (1, True, 2), (2, True, 2), (3, True, 1), (4, True, 2),
            (5, True, 2),
        ]

    def test_malformed_overlaps_rejects(self):
        import pytest as _pt

        with _pt.raises(ValueError, match="OVERLAPS"):
            to_spark_sql("SELECT a OVERLAPS (c, d) FROM t")
        with _pt.raises(ValueError, match="pairs"):
            to_spark_sql("SELECT (a, b, x) OVERLAPS (c, d) FROM t")


def test_dynamic_negative_substring_length_raises(spark):
    """Round-8: a runtime-computed negative LENGTH raises like PG
    (was a documented ''-divergence); clamp-derived empty strings and
    NULL lengths keep PG's values."""
    import pytest as _pt

    spark.sql(
        "SELECT 2 AS n, -3 AS m, CAST(NULL AS INT) AS nl"
    ).createOrReplaceTempView("gfw_substr_t")
    row = run_pg_sql(
        spark,
        "SELECT substr('abc', 0, n) AS a, substr('abcdef', n, 3) AS b, "
        "substr('abc', -1, 1) AS c, substr('abc', 1, nl) AS d "
        "FROM gfw_substr_t",
    ).collect()[0]
    assert (row.a, row.b, row.c, row.d) == ("a", "bcd", "", None)
    with _pt.raises(Exception, match="negative substring length"):
        run_pg_sql(
            spark, "SELECT substr('abc', 1, m) AS x FROM gfw_substr_t"
        ).collect()


def test_overlaps_function_call_left_rejects():
    import pytest as _pt

    with _pt.raises(ValueError, match="row constructors"):
        to_spark_sql("SELECT foo(a, b) OVERLAPS (c, d) FROM t")


class TestTypedOpsWindowClause:
    """Round-8 follow-on: `fn(…) OVER (… | name)` types as the function
    (PG window-fn return types included), so running-ratio idioms like
    sum(x) OVER w / count(*) OVER w get PG's truncating division."""

    CT = {"a": "int", "b": "bigint", "bl": "bool", "d1": "date",
          "d2": "date", "x": "double"}

    def t(self, sql):
        from gfw_data_api_spark.sql.dialect import translate_typed_ops

        return translate_typed_ops(sql, self.CT)

    def test_running_ratio_rewrites(self):
        assert "div" in self.t(
            "SELECT sum(a) OVER w / count(*) OVER w FROM t "
            "WINDOW w AS (PARTITION BY b)"
        )
        assert "div" in self.t(
            "SELECT sum(a) OVER (PARTITION BY b) / "
            "count(*) OVER (PARTITION BY b) FROM t"
        )
        assert "div" in self.t(
            "SELECT row_number() OVER w / 2 FROM t WINDOW w AS (ORDER BY a)"
        )
        assert "div" in self.t(
            "SELECT count(*) FILTER (WHERE bl) OVER w / count(*) OVER w "
            "FROM t WINDOW w AS (PARTITION BY b)"
        )

    def test_non_integral_window_stays(self):
        for sql in (
            "SELECT avg(a) OVER w / 2 FROM t WINDOW w AS (ORDER BY a)",
            "SELECT sum(x) OVER w / 2 FROM t WINDOW w AS (ORDER BY a)",
        ):
            assert self.t(sql) == sql

    def test_windowed_date_minus(self):
        assert "datediff" in self.t(
            "SELECT max(d1) OVER w - min(d2) OVER w FROM t "
            "WINDOW w AS (PARTITION BY b)"
        )
        assert "datediff" in self.t(
            "SELECT lag(d1) OVER w - d2 FROM t WINDOW w AS (ORDER BY a)"
        )

    def test_values(self, spark):
        from gfw_data_api_spark.operators.query import execute_on_dataframe

        df = spark.sql("SELECT explode(sequence(1, 9)) AS k").selectExpr(
            "k", "k % 2 AS grp"
        )
        rows = execute_on_dataframe(
            spark,
            df,
            "SELECT k, sum(k) OVER w / count(*) OVER w AS run_mean "
            "FROM t WINDOW w AS (PARTITION BY grp ORDER BY k) ORDER BY k",
        ).collect()
        # PG: running sum / running count with int8 division truncates
        got = [(r.k, r.run_mean) for r in rows]
        # odd ks: 1,3,5,7,9 cumulative means 1,2,3,4,5; even: 2,3,4,5
        assert got == [
            (1, 1), (2, 2), (3, 2), (4, 3), (5, 3), (6, 4), (7, 4),
            (8, 5), (9, 5),
        ]


class TestAvgDatePartReturnTypes:
    """Round-9 (r8-ADVICE medium): avg types structurally like sum —
    avg(float4/float8) is DOUBLE PRECISION in PG, so CAST(avg(dbl) AS
    INT) must take the half-even rint route, not HALF_UP round.
    date_part returns double precision (only extract is numeric in
    PG >= 14)."""

    CT = {"a": "int", "b": "bigint", "x": "double", "f": "float",
          "dec": "decimal", "d1": "date"}

    def t(self, sql):
        from gfw_data_api_spark.sql.dialect import translate_typed_ops

        return translate_typed_ops(sql, self.CT)

    def test_avg_double_casts_half_even(self):
        out = self.t("SELECT CAST(avg(x) AS INT) FROM t")
        assert "rint(avg(x))" in out and "round(" not in out
        out = self.t("SELECT avg(f)::int FROM t")
        assert "rint(avg(f))" in out
        # integral/decimal args keep the numeric HALF_UP route
        out = self.t("SELECT CAST(avg(a) AS INT) FROM t")
        assert "round(avg(a), 0)" in out
        out = self.t("SELECT CAST(avg(dec) AS INT) FROM t")
        assert "round(avg(dec), 0)" in out

    def test_date_part_casts_half_even(self):
        out = self.t("SELECT CAST(date_part('epoch', d1) AS BIGINT) FROM t")
        assert "rint(" in out and "round(" not in out
        # extract stays numeric (PG >= 14) → HALF_UP round route
        out = self.t("SELECT CAST(extract(epoch FROM d1) AS BIGINT) FROM t")
        assert "round(" in out and "rint(" not in out

    def test_avg_division_still_untouched(self):
        # avg never yields an integral category — / never rewrites
        for sql in (
            "SELECT avg(a) / 2 FROM t",
            "SELECT avg(x) / 2 FROM t",
        ):
            assert self.t(sql) == sql

    def test_values_half_even(self, spark):
        # PG: avg of (2,3) = 2.5 float8 → ::int gives 2 (half-even),
        # while numeric 2.5 → 3 (half-away). Both in one statement.
        from gfw_data_api_spark.operators.query import execute_on_dataframe

        df = spark.sql("SELECT * FROM VALUES (2, 2.0D), (3, 3.0D) t(a, x)")
        row = execute_on_dataframe(
            spark,
            df,
            "SELECT avg(x)::int AS fe, avg(a)::int AS ne, "
            "date_part('epoch', DATE '1970-01-02')::int AS ep FROM t",
        ).collect()[0]
        assert row.fe == 2       # float8 half-even
        assert row.ne == 3       # numeric half-away
        assert row.ep == 86400


class TestJsonbArrayElementsNonArrayRaises:
    """Round-9 (VERDICT r8 #4): PG errors on jsonb_array_elements of a
    non-array ('cannot extract elements from a scalar/an object'); the
    former translation silently dropped the row. Now an assert_true
    lazy-CASE arm raises at runtime; SQL NULL keeps PG's zero rows."""

    def _run(self, spark, view_rows, sql):
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        vals = ", ".join(f"({v})" for v in view_rows)
        spark.sql(f"SELECT * FROM VALUES {vals} t(j)").createOrReplaceTempView(
            "jsrf_t"
        )
        return run_pg_sql(spark, sql).collect()

    def test_arrays_still_explode_null_drops(self, spark):
        rows = self._run(
            spark,
            ["'[1,2]'", "'[\"a\"]'", "CAST(NULL AS STRING)"],
            "SELECT jsonb_array_elements_text(j) FROM jsrf_t",
        )
        assert [r[0] for r in rows] == ["1", "2", "a"]

    def test_object_scalar_and_json_null_raise(self, spark):
        import pytest

        for bad in ["'{\"a\":1}'", "'5'", "'\"s\"'", "'null'"]:
            with pytest.raises(Exception, match="json array"):
                self._run(
                    spark, [bad],
                    "SELECT jsonb_array_elements(j) FROM jsrf_t",
                )

    def test_raise_is_lazy_no_false_trigger(self, spark):
        # all-array inputs must not evaluate the raising arm
        rows = self._run(
            spark,
            ["'[1]'", "'[2,3]'"],
            "SELECT jsonb_array_elements(j) AS e FROM jsrf_t",
        )
        assert sorted(r[0] for r in rows) == ["1", "2", "3"]


class TestOverlapsNullTruthTable:
    """Round-9 (r8-ADVICE): OVERLAPS with NULL endpoints follows PG's
    timestamp_overlaps decision table — determinate TRUE when a known
    endpoint settles it, NULL only when it genuinely cannot."""

    def _o(self, spark, a, b, c, d):
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        f = lambda v: "CAST(NULL AS INT)" if v is None else str(v)
        return run_pg_sql(
            spark,
            f"SELECT ({f(a)}, {f(b)}) OVERLAPS ({f(c)}, {f(d)}) AS o",
        ).collect()[0][0]

    def test_determinate_true_with_null_end(self, spark):
        assert self._o(spark, 5, None, 2, 8) is True
        assert self._o(spark, None, 5, 2, 8) is True  # null start swaps
        assert self._o(spark, 2, 8, 5, None) is True  # symmetric

    def test_null_when_undecidable(self, spark):
        assert self._o(spark, 5, None, 6, 8) is None
        assert self._o(spark, 2, None, 5, 8) is None
        assert self._o(spark, 5, None, 5, 8) is None   # equal starts
        assert self._o(spark, None, None, 1, 5) is None
        assert self._o(spark, 1, 5, None, None) is None

    def test_non_null_regression(self, spark):
        assert self._o(spark, 1, 5, 4, 8) is True
        assert self._o(spark, 1, 4, 4, 8) is False     # half-open
        assert self._o(spark, 3, 3, 1, 5) is True      # instant inside
        assert self._o(spark, 1, 5, 5, 5) is False     # instant at end
        assert self._o(spark, 5, 1, 8, 4) is True      # unsorted pairs


class TestSrfOrdinalityAndMultiArg:
    """Round-9 SRF breadth (VERDICT r8 #9): WITH ORDINALITY and
    multi-array unnest(a, b) — PG's FROM-clause spellings admitted as
    SELECT-list extensions (PG rejects them in a select list, so no
    PG-valid query changes meaning; PARITY.md round-9)."""

    def test_translations(self):
        out = to_spark_sql("SELECT unnest(a) WITH ORDINALITY FROM t")
        assert "inline(transform((a)" in out
        # the +1 cast may route through the generic DECIMAL cast pass
        # (exact for integers) — assert the column, not the spelling
        assert "AS ordinality" in out and "__gfw_i + 1" in out
        out = to_spark_sql("SELECT unnest(a) WITH ORDINALITY AS v FROM t")
        assert "AS v" in out and "AS ordinality" in out
        out = to_spark_sql("SELECT unnest(a, b) FROM t")
        assert "inline(arrays_zip((a), (b))) AS (unnest, unnest_1)" in out

    def test_rejections(self):
        import pytest as _pt

        with _pt.raises(ValueError, match="ORDINALITY"):
            to_spark_sql("SELECT unnest(a, b) WITH ORDINALITY FROM t")
        with _pt.raises(ValueError, match="alias"):
            to_spark_sql("SELECT unnest(a, b) AS x FROM t")

    def test_values(self, spark):
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql(
            "SELECT array(10, 20, 30) AS a, array('x', 'y') AS b"
        ).createOrReplaceTempView("srf_ord_t")
        rows = run_pg_sql(
            spark, "SELECT unnest(a) WITH ORDINALITY FROM srf_ord_t"
        ).collect()
        assert [tuple(r) for r in rows] == [(10, 1), (20, 2), (30, 3)]
        rows = run_pg_sql(
            spark, "SELECT unnest(a, b) FROM srf_ord_t"
        ).collect()
        # lockstep: shorter array null-pads to the longest
        assert [tuple(r) for r in rows] == [
            (10, "x"), (20, "y"), (30, None),
        ]
        rows = run_pg_sql(
            spark,
            "SELECT generate_series(5, 7) WITH ORDINALITY FROM srf_ord_t",
        ).collect()
        assert [tuple(r) for r in rows] == [(5, 1), (6, 2), (7, 3)]


class TestArrayFunctionSurface:
    """Round-9 array/string surface: translations that fix SILENT
    divergences in functions Spark shares by name (array_position
    0-vs-NULL) plus PG names Spark lacks (strpos, array_length,
    array_cat, gen_random_uuid)."""

    def test_translations(self):
        out = to_spark_sql("SELECT array_position(a, 5) FROM t")
        assert "nullif(array_position((a), (5)), 0)" in out
        out = to_spark_sql("SELECT strpos(s, 'x') FROM t")
        assert "locate(('x'), (s))" in out
        out = to_spark_sql("SELECT array_length(a, 1) FROM t")
        assert "nullif(size((a)), 0)" in out
        out = to_spark_sql("SELECT array_cat(a, b) FROM t")
        assert "concat((a), (b))" in out and "IS NULL" in out
        out = to_spark_sql("SELECT gen_random_uuid() FROM t")
        assert "uuid()" in out

    def test_rejections(self):
        import pytest as _pt

        with _pt.raises(ValueError, match="start index"):
            to_spark_sql("SELECT array_position(a, 5, 2) FROM t")
        with _pt.raises(ValueError, match="literal"):
            to_spark_sql("SELECT array_length(a, d) FROM t")
        # literal dim != 1 is exact parity: PG returns NULL on 1-D arrays
        out = to_spark_sql("SELECT array_length(a, 2) FROM t")
        assert "CAST(NULL AS INT)" in out

    def test_values(self, spark):
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql(
            "SELECT array(1, 2, 3) AS arr, "
            "CAST(array() AS array<int>) AS emp, "
            "CAST(NULL AS array<int>) AS na, 'abcbc' AS s"
        ).createOrReplaceTempView("arr_fn_t")
        row = run_pg_sql(
            spark,
            "SELECT array_position(arr, 9) AS p_miss, "
            "array_position(arr, 2) AS p_hit, "
            "array_length(arr, 1) AS l3, "
            "array_length(emp, 1) AS l_empty, "
            "array_length(na, 1) AS l_null, "
            "strpos(s, 'bc') AS sp, strpos(s, 'zz') AS sp0, "
            "array_to_string(array_cat(na, arr), ',') AS cat_l, "
            "array_to_string(array_cat(arr, na), ',') AS cat_r "
            "FROM arr_fn_t",
        ).collect()[0]
        assert row.p_miss is None and row.p_hit == 2     # PG NULL-on-absent
        assert row.l3 == 3 and row.l_empty is None and row.l_null is None
        assert row.sp == 2 and row.sp0 == 0
        assert row.cat_l == "1,2,3" and row.cat_r == "1,2,3"


class TestLogAndTypedRound:
    """Round-9 silent-divergence fixes in the shared-name surface:
    PG log(x) is BASE 10 (Spark: natural) and PG round(float8) is
    HALF-EVEN (the classic numeric-vs-float8 PG gotcha; Spark rounds
    HALF_UP for every type)."""

    def test_log_translation(self):
        assert "log10(x)" in to_spark_sql("SELECT log(x) FROM t")
        # 2-arg log agrees in both engines — untouched
        out = to_spark_sql("SELECT log(2, x) FROM t")
        assert "log(2, x)" in out and "log10" not in out
        # ln stays natural
        assert "ln(x)" in to_spark_sql("SELECT ln(x) FROM t")

    def test_typed_round_translation(self):
        from gfw_data_api_spark.sql.dialect import translate_typed_ops

        CT = {"xf": "double", "dc": "decimal", "ia": "int"}
        assert translate_typed_ops("SELECT round(xf) FROM t", CT) == (
            "SELECT rint(xf) FROM t"
        )
        # numeric operand keeps HALF_UP round (PG numeric is half-away)
        assert translate_typed_ops("SELECT round(dc) FROM t", CT) == (
            "SELECT round(dc) FROM t"
        )
        # 2-arg round untouched (PG has no round(float8, int))
        assert translate_typed_ops("SELECT round(xf, 2) FROM t", CT) == (
            "SELECT round(xf, 2) FROM t"
        )
        # aggregate return types flow through (avg(double) is double)
        assert "rint(avg(xf))" in translate_typed_ops(
            "SELECT round(avg(xf)) FROM t", CT
        )

    def test_values(self, spark):
        from gfw_data_api_spark.operators.query import execute_on_dataframe

        df = spark.sql(
            "SELECT CAST(2.5 AS DOUBLE) AS xf, "
            "CAST(2.5 AS DECIMAL(5,1)) AS dc, 100 AS ia"
        )
        row = execute_on_dataframe(
            spark,
            df,
            "SELECT round(xf) AS fe, round(dc) AS na, log(ia) AS lg, "
            "ln(ia) AS nat FROM data",
        ).collect()[0]
        assert row.fe == 2.0      # float8: half-even
        assert int(row.na) == 3   # numeric: half-away
        assert row.lg == 2.0      # PG log = base 10
        assert abs(row.nat - 4.605170185988092) < 1e-12


class TestConcatNullSkip:
    """Round-9: PG concat() SKIPS NULL arguments; Spark's NULL-poisons.
    Translated to concat_ws('') BEFORE the passes that emit Spark
    concat( themselves (json ops, array_cat) so emissions keep Spark
    semantics."""

    def test_translation(self):
        assert to_spark_sql("SELECT concat(a, b) FROM t") == (
            "SELECT concat_ws('', CAST((a) AS STRING), "
            "CAST((b) AS STRING)) FROM t"
        )
        # concat_ws passes through; emitted concat( survives:
        out = to_spark_sql("SELECT array_cat(a, b) FROM t")
        assert "concat((a), (b))" in out

    def test_values(self, spark):
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql(
            "SELECT 'a' AS s, CAST(NULL AS STRING) AS ns, 3 AS n"
        ).createOrReplaceTempView("concat_t")
        row = run_pg_sql(
            spark,
            "SELECT concat(s, ns, 'z') AS a, concat(n, ns, s) AS b, "
            "concat(ns, ns) AS c, s || ns AS d FROM concat_t",
        ).collect()[0]
        assert row.a == "az" and row.b == "3a" and row.c == ""
        assert row.d is None  # the || operator NULL-poisons in BOTH


class TestJsonIntrospectionSurface:
    """Round-9 breadth batch 2: regexp_split_to_array, jsonb_typeof,
    jsonb/json_array_length (PG raise on non-array), the object-keys
    SRFs (jsonb_ in canonical length-then-byte order), encode/decode
    hex. All were loud UNRESOLVED before — no silent risk — and the
    emissions that previously used Spark's native json_object_keys/
    json_array_length spellings (jsonb ||, ? operators, @> guards) now
    use from_json probes so these passes own the PG names."""

    def test_values(self, spark):
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql(
            "SELECT '{\"bb\": 1, \"a\": 2}' AS j, '[3,1,2]' AS ja, "
            "'a-b--c-' AS s, unhex('00ff10') AS hx"
        ).createOrReplaceTempView("jintro_t")
        row = run_pg_sql(
            spark,
            "SELECT array_to_string(regexp_split_to_array(s, '-+'), '/') "
            "AS sp, jsonb_typeof(j) AS tj, jsonb_typeof(ja) AS ta, "
            "jsonb_typeof('-4.5') AS tn, jsonb_typeof('true') AS tb, "
            "jsonb_array_length(ja) AS al, encode(hx, 'hex') AS hex, "
            "length(decode('00ff10', 'hex')) AS dl FROM jintro_t",
        ).collect()[0]
        assert row.sp == "a/b/c/"   # trailing empty kept, like PG
        assert (row.tj, row.ta, row.tn, row.tb) == (
            "object", "array", "number", "boolean"
        )
        assert row.al == 3 and row.hex == "00ff10" and row.dl == 3

    def test_object_keys_srf(self, spark):
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql(
            "SELECT '{\"bb\": 1, \"a\": 2, \"ccc\": 3}' AS j"
        ).createOrReplaceTempView("jkeys_t")
        rows = run_pg_sql(
            spark, "SELECT jsonb_object_keys(j) FROM jkeys_t"
        ).collect()
        # jsonb canonical order: length first, then bytewise
        assert [r[0] for r in rows] == ["a", "bb", "ccc"]
        rows = run_pg_sql(
            spark, "SELECT json_object_keys(j) FROM jkeys_t"
        ).collect()
        assert [r[0] for r in rows] == ["bb", "a", "ccc"]  # document order
        rows = run_pg_sql(
            spark,
            "SELECT jsonb_object_keys(j) WITH ORDINALITY FROM jkeys_t",
        ).collect()
        assert [tuple(r) for r in rows] == [("a", 1), ("bb", 2), ("ccc", 3)]

    def test_raises_like_pg(self, spark):
        import pytest as _pt

        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql("SELECT '[1]' AS ja, '5' AS js").createOrReplaceTempView(
            "jraise_t"
        )
        with _pt.raises(Exception, match="non-array"):
            run_pg_sql(
                spark, "SELECT jsonb_array_length('{\"a\":1}') FROM jraise_t"
            ).collect()
        with _pt.raises(Exception, match="json object"):
            run_pg_sql(
                spark, "SELECT jsonb_object_keys(ja) FROM jraise_t"
            ).collect()
        with _pt.raises(ValueError, match="hex"):
            run_pg_sql(spark, "SELECT encode(ja, 'base64') FROM jraise_t")


class TestMathDomainErrors:
    """Round-9: PG RAISES on math domain errors where Spark silently
    yields NaN/NULL/Infinity — sqrt(-1), ln(0), log(-1), acos(2),
    power(0, -1), negative^fractional (the caret pass emits power, so
    ^ shares the rules), log base 1, chr(0), chr beyond ASCII
    (Spark chr folds mod 256; PG chr is the Unicode code point)."""

    def _run(self, spark, sql):
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql(
            "SELECT -1.0 AS neg, 0.0 AS zero, 2.0 AS two, 4.0 AS four"
        ).createOrReplaceTempView("math_t")
        return run_pg_sql(spark, sql).collect()

    def test_domain_errors_raise(self, spark):
        import pytest as _pt

        for sql, msg in [
            ("SELECT sqrt(neg) FROM math_t", "square root"),
            ("SELECT ln(zero) FROM math_t", "logarithm"),
            ("SELECT log(neg) FROM math_t", "logarithm"),
            ("SELECT acos(two) FROM math_t", "out of range"),
            ("SELECT power(zero, -2) FROM math_t", "negative power"),
            ("SELECT (0 - two) ^ 0.5 FROM math_t", "complex"),
            ("SELECT log(1, four) FROM math_t", "division by zero"),
            ("SELECT chr(0) FROM math_t", "null character"),
        ]:
            with _pt.raises(Exception, match=msg):
                self._run(spark, sql)

    def test_valid_domain_untouched(self, spark):
        rows = self._run(
            spark,
            "SELECT sqrt(four) AS a, sqrt(sqrt(16.0)) AS b, "
            "power(neg, 2) AS c, log(2, 8.0) AS d, acos(1.0) AS e, "
            "sqrt(CAST(NULL AS DOUBLE)) AS f, two ^ 3 AS g, "
            "chr(955) AS h FROM math_t",
        )
        r = rows[0]
        assert (r.a, r.b, r.c, r.d, r.e) == (2.0, 2.0, 1.0, 3.0, 0.0)
        assert r.f is None and r.g == 8.0 and r.h == "λ"


class TestDateTruncWidening:
    """Round-9: Spark date_trunc returns NULL SILENTLY for unknown
    units — PG's decade/century/millennium (and PG's plural
    microseconds/milliseconds spellings) were silent NULLs, and
    PG-invalid units silently NULLed instead of raising."""

    def test_values(self, spark):
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql(
            "SELECT timestamp '2024-03-17 10:30:45.123456' AS ts, "
            "timestamp '2000-06-01 00:00:00' AS y2k"
        ).createOrReplaceTempView("dtr_t")
        row = run_pg_sql(
            spark,
            "SELECT date_trunc('decade', ts) AS de, "
            "date_trunc('century', ts) AS ce, "
            "date_trunc('century', y2k) AS ce2, "
            "date_trunc('millennium', ts) AS mi, "
            "date_trunc('milliseconds', ts) AS ms FROM dtr_t",
        ).collect()[0]
        import datetime as dt

        assert row.de == dt.datetime(2020, 1, 1)
        assert row.ce == dt.datetime(2001, 1, 1)   # 21st century
        assert row.ce2 == dt.datetime(1901, 1, 1)  # 2000 is the 20th!
        assert row.mi == dt.datetime(2001, 1, 1)
        assert row.ms.microsecond == 123000

    def test_unknown_units_raise(self, spark):
        import pytest as _pt

        from gfw_data_api_spark.sql.dialect import to_spark_sql

        for bad in ("bogus", "mon", "yyyy", "dd"):
            with _pt.raises(ValueError, match="not recognized"):
                to_spark_sql(f"SELECT date_trunc('{bad}', ts) FROM t")


class TestGcdLcmQuoteLiteral:
    """Round-9: PG gcd/lcm (Spark lacks both) as a bounded Euclid
    aggregate fold — 92 iterations cover the 64-bit Fibonacci worst
    case, short-circuiting once b = 0; lcm multiplies under ANSI so
    overflow raises exactly where PG raises. quote_literal doubles
    embedded quotes; NULL in, NULL out."""

    def test_values(self, spark):
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql(
            "SELECT 12 AS a, 18 AS b, CAST(NULL AS INT) AS n, "
            "'O''Hara' AS s"
        ).createOrReplaceTempView("gcd_t")
        row = run_pg_sql(
            spark,
            "SELECT gcd(a, b) AS g1, gcd(0, 0) AS g0, gcd(-a, b) AS gn, "
            "gcd(b, gcd(a, 30)) AS gg, lcm(4, 6) AS l1, lcm(0, 5) AS l0, "
            "lcm(-4, 6) AS ln2, gcd(n, b) AS gnull, "
            "quote_literal(s) AS ql, quote_literal(42) AS qn, "
            "quote_literal(n) AS qnull FROM gcd_t",
        ).collect()[0]
        assert (row.g1, row.g0, row.gn, row.gg) == (6, 0, 6, 6)
        assert (row.l1, row.l0, row.ln2) == (12, 0, 12)
        assert row.gnull is None and row.qnull is None
        assert row.ql == "'O''Hara'" and row.qn == "'42'"

    def test_lcm_overflow_raises(self, spark):
        import pytest as _pt

        from gfw_data_api_spark.sql.dialect import run_pg_sql

        with _pt.raises(Exception):
            run_pg_sql(
                spark,
                "SELECT lcm(9223372036854775807, 9223372036854775806) AS x",
            ).collect()


class TestMakeIntervalNamedArgs:
    """Round-9/10: PG make_interval (named or positional; identical
    7-slot signature, Spark rejects named args) → the typed Spark
    constructors make_dt_interval / make_ym_interval, so a BARE
    projection is collectible (Spark's own make_interval returns the
    legacy CalendarIntervalType which dies at PySpark collection with
    [NOT_IMPLEMENTED] fromInternal — round-9 probe finding). Mixed
    year-month + day-time slots reject loudly (the two ANSI interval
    families cannot combine in one value)."""

    def test_translation(self):
        out = to_spark_sql(
            "SELECT make_interval(days => 3, hours => 2) FROM t"
        )
        assert "make_dt_interval(3, 2, 0, 0)" in out
        out = to_spark_sql("SELECT make_interval(1, 2) FROM t")
        assert "make_ym_interval(1, 2)" in out
        out = to_spark_sql("SELECT make_interval(weeks => 1, days => 2) FROM t")
        assert "make_dt_interval((1) * 7 + (2), 0, 0, 0)" in out

    def test_values(self, spark):
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql("SELECT 1 AS x").createOrReplaceTempView("mi_t")
        row = run_pg_sql(
            spark,
            "SELECT timestamp '2024-01-01' + make_interval(days => 3) "
            "AS d, CAST(make_interval(hours => 5, mins => 30) "
            "AS STRING) AS s FROM mi_t",
        ).collect()[0]
        import datetime as dt

        assert row.d == dt.datetime(2024, 1, 4)
        # Spark's ANSI day-time interval rendering (PG text rendering
        # happens in the serializers; docs/PARITY.md)
        assert row.s == "INTERVAL '0 05:30:00' DAY TO SECOND"

    def test_bare_projection_collects(self, spark):
        """The round-9 defect: a PG-valid bare make_interval projection
        crashed at PySpark collection."""
        import datetime as dt

        from gfw_data_api_spark.compat import YearMonthInterval
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql("SELECT 1 AS x").createOrReplaceTempView("mi_t")
        row = run_pg_sql(
            spark,
            "SELECT make_interval(days => 2, hours => 3) AS dt_iv, "
            "make_interval(years => 1, months => 2) AS ym_iv, "
            "make_interval(secs => 1.5) AS frac FROM mi_t",
        ).collect()[0]
        assert row.dt_iv == dt.timedelta(days=2, hours=3)
        assert row.ym_iv == YearMonthInterval(14)
        assert row.frac == dt.timedelta(seconds=1.5)

    def test_bare_projection_renders_pg_style(self, spark):
        """Through the real serializers: rows_to_csv + the API's
        _row_value render PG IntervalStyle text."""
        from gfw_data_api_spark.api.app import _row_value
        from gfw_data_api_spark.operators.downloads import rows_to_csv
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql("SELECT 1 AS x").createOrReplaceTempView("mi_t")
        df = run_pg_sql(
            spark,
            "SELECT make_interval(days => 2, hours => 3) AS a, "
            "make_interval(years => 1, months => 2) AS b, "
            "make_interval(years => -1) AS c, "
            "make_interval() AS z FROM mi_t",
        )
        csv_text = rows_to_csv(df)
        assert '"2 days 03:00:00","1 year 2 mons","-1 years","00:00:00"' in csv_text
        row = df.collect()[0]
        assert _row_value(row.b) == "1 year 2 mons"
        assert _row_value(row.z) == "00:00:00"

    def test_mixed_families_reject(self):
        import pytest as _pt

        with _pt.raises(ValueError, match="make_interval mixing"):
            to_spark_sql(
                "SELECT make_interval(years => 1, days => 2) FROM t"
            )

    def test_named_after_positional_rejects(self):
        import pytest as _pt

        with _pt.raises(ValueError, match="make_interval"):
            to_spark_sql("SELECT make_interval(days => 2, 3) FROM t")

    def test_unknown_named_arg_rejects(self):
        import pytest as _pt

        with _pt.raises(ValueError, match="unknown named argument"):
            to_spark_sql("SELECT make_interval(decades => 1) FROM t")


class TestRound10DefectBatch:
    """Round-10 probe-found defects + r9 ADVICE items, value-pinned.

    - unknown PG cast types reject loudly naming the vocabulary
      (previously CAST(x AS REGCLASS) fell through to an opaque Spark
      ParseException) — reference passes casts through to PG
      (app/utils/query_helpers.py pass-through casts);
    - ::bytea maps to BINARY with PG's bytea INPUT semantics (hex
      \\x form → unhex; plain text → UTF-8; escape sequences loud);
    - chr(NULL) is strict NULL (format_string rendered 'null');
    - quote_literal doubles backslashes and emits E'...' like PG;
    - user-written nullif(array_position(a, v), X != 0) still gets
      the inner 0→NULL rewrite (the rescan terminator used to skip
      ANY nullif-enclosed call).
    """

    def test_unknown_cast_rejects_named(self):
        import pytest as _pt

        with _pt.raises(ValueError, match="::regclass cast outside"):
            to_spark_sql("SELECT n::regclass FROM t")
        with _pt.raises(ValueError, match="supported cast targets"):
            to_spark_sql("SELECT 'abc'::point FROM t")

    def test_bytea_literal_translations(self):
        out = to_spark_sql("SELECT '\\x41 42'::bytea FROM t")
        assert "unhex('4142')" in out
        out = to_spark_sql("SELECT 'abc'::bytea FROM t")
        assert "CAST('abc' AS BINARY)" in out
        import pytest as _pt

        with _pt.raises(ValueError, match="invalid hexadecimal"):
            to_spark_sql("SELECT '\\x4G'::bytea FROM t")
        with _pt.raises(ValueError, match="escape-format"):
            to_spark_sql("SELECT 'a\\000b'::bytea FROM t")

    def test_bytea_values(self, spark):
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql(
            "SELECT 'plain' AS txt, 'a' || chr(92) || 'b' AS bs, "
            "concat(chr(92), 'x4142') AS hx"
        ).createOrReplaceTempView("bytea_t")
        row = run_pg_sql(
            spark,
            "SELECT encode('abc'::bytea, 'hex') AS a, "
            "encode('\\x41 42'::bytea, 'hex') AS b, "
            "encode(txt::bytea, 'hex') AS c, "
            "encode(hx::bytea, 'hex') AS d, "
            "encode(CAST('abc' AS BYTEA), 'hex') AS e FROM bytea_t",
        ).collect()[0]
        assert row.a == "616263"
        assert row.b == "4142"
        assert row.c == "706c61696e"
        assert row.d == "4142"  # runtime \x form through the CASE
        assert row.e == "616263"  # ANSI CAST spelling routes the same

    def test_bytea_runtime_escape_raises(self, spark):
        import pytest as _pt

        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql(
            "SELECT 'a' || chr(92) || 'b' AS bs"
        ).createOrReplaceTempView("bytea_e_t")
        with _pt.raises(Exception, match="escape-format"):
            run_pg_sql(spark, "SELECT bs::bytea FROM bytea_e_t").collect()

    def test_bytea_hex_whitespace_and_odd_digits(self, spark):
        """Round-11 (ADVICE r10): PG's hex_decode skips ANY whitespace
        between digits (even mid-pair: '\\xF F' is 0x0F) and raises on
        an odd TOTAL digit count — Spark's bare unhex would silently
        left-pad instead."""
        import pytest as _pt

        from gfw_data_api_spark.sql.dialect import run_pg_sql

        # literal arms
        out = to_spark_sql("SELECT '\\x41\t4 2'::bytea FROM t")
        assert "unhex('4142')" in out
        out = to_spark_sql("SELECT '\\xF F'::bytea FROM t")
        assert "unhex('FF')" in out
        with _pt.raises(ValueError, match="odd number of digits"):
            to_spark_sql("SELECT '\\x414'::bytea FROM t")
        # runtime arms
        spark.sql(
            "SELECT concat(chr(92), 'x41', chr(9), '42') AS ws, "
            "concat(chr(92), 'xF') AS odd"
        ).createOrReplaceTempView("bytea_w_t")
        row = run_pg_sql(
            spark, "SELECT encode(ws::bytea, 'hex') AS w FROM bytea_w_t"
        ).collect()[0]
        assert row.w == "4142"
        with _pt.raises(Exception, match="odd number of digits"):
            run_pg_sql(
                spark, "SELECT odd::bytea FROM bytea_w_t"
            ).collect()

    def test_chr_null_strict(self, spark):
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql(
            "SELECT CAST(NULL AS INT) AS n"
        ).createOrReplaceTempView("chrn_t")
        row = run_pg_sql(
            spark, "SELECT chr(n) AS c, chr(65) AS a FROM chrn_t"
        ).collect()[0]
        assert row.c is None and row.a == "A"

    def test_quote_literal_backslash(self, spark):
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql(
            "SELECT 'a' || chr(92) || 'b' AS bs, "
            "'O' || chr(39) || chr(92) || 'x' AS both"
        ).createOrReplaceTempView("ql_t")
        row = run_pg_sql(
            spark,
            "SELECT quote_literal(bs) AS a, quote_literal('plain') AS b, "
            "quote_literal(both) AS c FROM ql_t",
        ).collect()[0]
        assert row.a == "E'a\\\\b'"  # PG: quote_literal('a\b') = E'a\\b'
        assert row.b == "'plain'"
        assert row.c == "E'O''\\\\x'"  # quotes doubled too

    def test_concat_array_not_flattened(self, spark):
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql(
            "SELECT array('p', 'q') AS arr"
        ).createOrReplaceTempView("cat_arr_t")
        row = run_pg_sql(
            spark, "SELECT concat(arr, 'z') AS c FROM cat_arr_t"
        ).collect()[0]
        # Spark's array rendering ('[p, q]'), NOT element flattening
        # 'pqz'. Residual vs PG's '{p,q}' documented in PARITY.
        assert row.c == "[p, q]z"

    def test_user_nullif_array_position(self, spark):
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        out = to_spark_sql("SELECT nullif(array_position(a, v), 2) FROM t")
        assert "nullif(nullif(array_position((a), (v)), 0), 2)" in out
        spark.sql(
            "SELECT array('p', 'q') AS arr"
        ).createOrReplaceTempView("nap_t")
        row = run_pg_sql(
            spark,
            "SELECT nullif(array_position(arr, 'zz'), 2) AS missing, "
            "nullif(array_position(arr, 'q'), 2) AS hit2, "
            "nullif(array_position(arr, 'p'), 0) AS user0 FROM nap_t",
        ).collect()[0]
        # PG: absent → array_position NULL → nullif NULL (Spark used
        # to leak 0 here); found-at-2 → nullif(2,2) = NULL; user's
        # explicit nullif(..., 0) keeps working.
        assert row.missing is None
        assert row.hit2 is None
        assert row.user0 == 1

    def test_array_length_dim_values(self, spark):
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql(
            "SELECT array(1, 2) AS arr"
        ).createOrReplaceTempView("ald_t")
        row = run_pg_sql(
            spark,
            "SELECT array_length(arr, 1) AS l1, "
            "array_length(arr, 2) AS l2, "
            "array_length(arr, -1) AS lm FROM ald_t",
        ).collect()[0]
        assert row.l1 == 2 and row.l2 is None and row.lm is None


class TestIntervalLiteralCast:
    """Round-10: '2 days 03:00:00'::interval (and bare CAST(x AS
    INTERVAL)) parse AT TRANSLATION into the typed constructors —
    collectible and comparable, PG word-form units incl. 'mons',
    fractional day-time spill-down, trailing 'ago'. Mixed families,
    ISO-8601 'P...', fractional months, unknown units, and computed
    operands all reject loudly."""

    def test_translation(self):
        out = to_spark_sql("SELECT '2 days 03:00:00'::interval FROM t")
        assert "make_dt_interval(2, 0, 0, 10800.000000)" in out
        out = to_spark_sql("SELECT '1 year 2 mons'::interval FROM t")
        assert "make_ym_interval(0, 14)" in out
        out = to_spark_sql("SELECT CAST('45 minutes' AS INTERVAL) FROM t")
        assert "make_dt_interval(0, 0, 0, 2700.000000)" in out
        # qualified ANSI interval types pass through untouched
        out = to_spark_sql(
            "SELECT CAST(ts - ts AS INTERVAL DAY TO SECOND) FROM t"
        )
        assert "INTERVAL DAY TO SECOND" in out

    def test_values(self, spark):
        import datetime as dt

        from gfw_data_api_spark.compat import YearMonthInterval
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql("SELECT 1 AS x").createOrReplaceTempView("ivl_t")
        row = run_pg_sql(
            spark,
            "SELECT timestamp '2024-01-01' + '2 days 03:00:00'::interval "
            "AS a, '90 minutes'::interval AS b, "
            "'1.5 days'::interval AS c, '2 days ago'::interval AS d, "
            "'1 year 2 mons'::interval AS e, "
            "'-01:30:00'::interval AS f, "
            "CASE WHEN '36 hours'::interval > '1 day'::interval "
            "THEN 1 ELSE 0 END AS g FROM ivl_t",
        ).collect()[0]
        assert row.a == dt.datetime(2024, 1, 3, 3)
        assert row.b == dt.timedelta(minutes=90)
        assert row.c == dt.timedelta(days=1, hours=12)
        assert row.d == dt.timedelta(days=-2)
        assert row.e == YearMonthInterval(14)
        assert row.f == dt.timedelta(minutes=-90)
        assert row.g == 1

    def test_rejections(self):
        import pytest as _pt

        with _pt.raises(ValueError, match="mixing year/month"):
            to_spark_sql("SELECT '1 year 2 days'::interval FROM t")
        with _pt.raises(ValueError, match="ISO-8601"):
            to_spark_sql("SELECT 'P1Y2M'::interval FROM t")
        with _pt.raises(ValueError, match="fractional month"):
            to_spark_sql("SELECT '1.5 years'::interval FROM t")
        with _pt.raises(ValueError, match="unknown unit"):
            to_spark_sql("SELECT '3 fortnights'::interval FROM t")
        with _pt.raises(ValueError, match="literal strings"):
            to_spark_sql("SELECT (s || ' days')::interval FROM t")

    def test_bytea_serializes_pg_style(self, spark):
        """PG's bytea text OUTPUT is hex with the \\x prefix — through
        the API _row_value and the CSV writer."""
        from gfw_data_api_spark.api.app import _row_value
        from gfw_data_api_spark.operators.downloads import rows_to_csv
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql("SELECT 1 AS x").createOrReplaceTempView("byser_t")
        df = run_pg_sql(spark, "SELECT 'ab'::bytea AS b FROM byser_t")
        row = df.collect()[0]
        assert _row_value(row.b) == "\\x6162"
        assert '"\\x6162"' in rows_to_csv(df)


class TestTokenizerRegexEquivalence:
    """Round-10: tokenize() became a compiled-regex scanner (the
    per-char loop was 97% of translation latency). Token-for-token
    differential against the retained reference implementation over
    every gate SQL plus edge corpora."""

    def _corpus(self):
        from gfw_data_api_spark import inventory

        sqls = []
        for spec in inventory._SPECS:
            for cell in getattr(spec.spark_fn, "__closure__", None) or ():
                v = cell.cell_contents
                if isinstance(v, str) and v.lstrip().upper().startswith(
                    "SELECT"
                ):
                    sqls.append(v)
        sqls += [
            "SELECT 'it''s' || '\\x41' AS s, \"we\"\"ird\" FROM t",
            "SELECT a::numeric(10,2), b ->> 'k', c #>> '{a,0}' FROM t",
            "SELECT x !~* 'pat', y ?| array['a'], z <@ w, 1.2.3e4.5 FROM t",
            "SELECT a ~~ 'x%', b !~~ 'y_', c ~~* 'Z%', d !~~* 'w%' FROM t",
            "SELECT $1, $23, _id$x, café, 1e, 1e+, .5, 5., -- line\n 7",
            "SELECT /* block\ncomment */ `back``tick`, a[2], b:c FROM t",
            "SELECT 1<=2, 3>=4, 5<>6, 7!=8, a||b, j->'k', j#>'{p}' FROM t",
            "",
            "   ",
        ]
        return sqls

    def test_differential(self):
        from gfw_data_api_spark.sql.tokenizer import (
            _tokenize_reference,
            tokenize,
        )

        for sql in self._corpus():
            # round-11: tokenize returns a memoized TUPLE
            assert list(tokenize(sql)) == _tokenize_reference(sql), sql

    def test_error_parity(self):
        import pytest as _pt

        from gfw_data_api_spark.sql.tokenizer import (
            TokenizeError,
            _tokenize_reference,
            tokenize,
        )

        for bad in ["'open", '"open', "`open", "$", "/* open", "SELECT \x00"]:
            with _pt.raises(TokenizeError) as e_new:
                tokenize(bad)
            with _pt.raises(TokenizeError) as e_ref:
                _tokenize_reference(bad)
            assert str(e_new.value) == str(e_ref.value), bad
            assert e_new.value.index == e_ref.value.index, bad


class TestTimestampGenerateSeries:
    """Round-10: generate_series(ts, ts, '1 day'::interval) — the
    date-spine idiom. A literal-interval step classifies at
    translation (sign + family known), bounds CAST to TIMESTAMP (PG's
    date overload also returns timestamps), stop-inclusive like PG."""

    def test_values(self, spark):
        import datetime as dt

        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql("SELECT 1 AS x").createOrReplaceTempView("gs_t")
        rows = run_pg_sql(
            spark,
            "SELECT generate_series(timestamp '2024-01-01', "
            "timestamp '2024-01-04', '1 day'::interval) AS d FROM gs_t",
        ).collect()
        assert [r.d for r in rows] == [
            dt.datetime(2024, 1, 1) + dt.timedelta(days=i) for i in range(4)
        ]
        rows = run_pg_sql(
            spark,
            "SELECT generate_series(timestamp '2024-01-10', "
            "timestamp '2024-01-08', INTERVAL '-1 day') AS d FROM gs_t",
        ).collect()
        assert len(rows) == 3 and rows[-1].d == dt.datetime(2024, 1, 8)
        # month step is calendar-aware; date bounds promote to ts
        rows = run_pg_sql(
            spark,
            "SELECT generate_series(date '2024-01-31', "
            "date '2024-04-30', '1 mon'::interval) AS d FROM gs_t",
        ).collect()
        assert [r.d for r in rows] == [
            dt.datetime(2024, 1, 31),
            dt.datetime(2024, 2, 29),
            dt.datetime(2024, 3, 31),
            dt.datetime(2024, 4, 30),
        ]
        # wrong-sign bounds -> zero rows (PG)
        rows = run_pg_sql(
            spark,
            "SELECT generate_series(timestamp '2024-01-05', "
            "timestamp '2024-01-01', '1 day'::interval) AS d FROM gs_t",
        ).collect()
        assert rows == []
        # 30-minute sub-day step
        rows = run_pg_sql(
            spark,
            "SELECT generate_series(timestamp '2024-01-01 00:00:00', "
            "timestamp '2024-01-01 01:00:00', '30 minutes'::interval) "
            "AS d FROM gs_t",
        ).collect()
        assert len(rows) == 3

    def test_rejections(self):
        import pytest as _pt

        with _pt.raises(ValueError, match="must not be zero"):
            to_spark_sql(
                "SELECT generate_series(timestamp '2024-01-01', "
                "timestamp '2024-01-02', '0 days'::interval) FROM t"
            )
        with _pt.raises(ValueError, match="mixing"):
            to_spark_sql(
                "SELECT generate_series(timestamp '2024-01-01', "
                "timestamp '2024-06-02', '1 mon 1 day'::interval) FROM t"
            )


class TestDateBin:
    """Round-10: PG 14 date_bin(stride, source, origin) — stride-width
    buckets aligned at origin, floored toward -infinity. Values are
    PostgreSQL's own documentation examples."""

    def test_values(self, spark):
        import datetime as dt

        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql("SELECT 1 AS x").createOrReplaceTempView("db_t")
        row = run_pg_sql(
            spark,
            "SELECT date_bin('15 minutes', timestamp '2020-02-11 "
            "15:44:17', timestamp '2001-01-01') AS a, "
            "date_bin('15 minutes', timestamp '2020-02-11 15:44:17', "
            "timestamp '2001-01-01 00:02:30') AS b, "
            # pre-origin source must floor toward -infinity
            "date_bin('1 day'::interval, timestamp '2000-12-30 23:00:00', "
            "timestamp '2001-01-01') AS c FROM db_t",
        ).collect()[0]
        assert row.a == dt.datetime(2020, 2, 11, 15, 30)
        assert row.b == dt.datetime(2020, 2, 11, 15, 32, 30)
        assert row.c == dt.datetime(2000, 12, 30)

    def test_rejections(self):
        import pytest as _pt

        with _pt.raises(ValueError, match="months or years"):
            to_spark_sql(
                "SELECT date_bin('1 mon', ts, timestamp '2001-01-01') FROM t"
            )
        with _pt.raises(ValueError, match="greater than zero"):
            to_spark_sql(
                "SELECT date_bin('0 hours', ts, timestamp '2001-01-01') FROM t"
            )
        with _pt.raises(ValueError, match="literal interval"):
            to_spark_sql(
                "SELECT date_bin(s, ts, timestamp '2001-01-01') FROM t"
            )

    def test_user_concat_ws_array_not_flattened(self, spark):
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql(
            "SELECT array('p', 'q') AS arr, CAST(NULL AS STRING) AS ns"
        ).createOrReplaceTempView("cws_t")
        row = run_pg_sql(
            spark,
            "SELECT concat_ws('-', arr, 'z') AS a, "
            "concat_ws('-', 'x', ns, 'y') AS b FROM cws_t",
        ).collect()[0]
        # without the CAST wrap Spark flattens: 'p-q-z'
        assert row.a == "[p, q]-z"
        assert row.b == "x-y"  # NULL-skip agrees in both engines


class TestLikeOperatorSpellings:
    """Round-10: PG's LIKE-operator spellings ~~ / !~~ / ~~* / !~~*
    (previously an opaque Spark ParseException; keyword substitution
    is exact — shared precedence, shared backslash escape)."""

    def test_values(self, spark):
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql("SELECT 'abc' AS s").createOrReplaceTempView("lk_t")
        row = run_pg_sql(
            spark,
            "SELECT s ~~ 'a%' AS a, s !~~ 'a%' AS b, "
            "s ~~* 'A%' AS c, s !~~* 'A%' AS d, "
            "s ~~ '_b_' AS e FROM lk_t",
        ).collect()[0]
        assert (row.a, row.b, row.c, row.d, row.e) == (
            True, False, True, False, True,
        )

    def test_does_not_shadow_regex_ops(self, spark):
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql("SELECT 'abc' AS s").createOrReplaceTempView("lk2_t")
        row = run_pg_sql(
            spark,
            "SELECT s ~ '^a' AS a, s !~ '^b' AS b, s ~* '^A' AS c "
            "FROM lk2_t",
        ).collect()[0]
        assert (row.a, row.b, row.c) == (True, True, True)


class TestArrayLiteralCast:
    """Round-10: PG array-literal casts '{a,b}'::type[] — the
    everyday `= ANY('{en,fr}'::text[])` idiom. Literal operands parse
    PG's array INPUT format at translation (quoted elements with
    backslash escapes, whitespace rules, bare NULL); computed operands
    (ARRAY[...], columns, string_to_array) get an element-wise
    transform cast. Per-element semantics come from the rescan of the
    normal ::type translation (numeric rounding, varchar truncation,
    bytea, interval)."""

    def test_values(self, spark):
        from decimal import Decimal

        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql("SELECT 'en' AS lang").createOrReplaceTempView("al_t")
        row = run_pg_sql(
            spark,
            "SELECT array_to_string('{en, fr, \"x y\"}'::text[], '/') "
            "AS a, "
            "'{1, 2, 3}'::int[] AS b, "
            "'{2.5, 3.5}'::numeric(10,1)[] AS c, "
            "'{1, NULL, 3}'::int[] AS d, "
            "array_length('{}'::int[], 1) AS e, "
            "lang = ANY('{en,fr}'::text[]) AS f, "
            "ARRAY[1, 2]::text[] AS g, "
            "string_to_array('1-2', '-')::int[] AS h FROM al_t",
        ).collect()[0]
        assert row.a == "en/fr/x y"
        assert row.b == [1, 2, 3]
        assert row.c == [Decimal("2.5"), Decimal("3.5")]
        assert row.d == [1, None, 3]
        assert row.e is None  # PG: array_length of empty = NULL
        assert row.f is True
        assert row.g == ["1", "2"]
        assert row.h == [1, 2]

    def test_parser_escapes(self):
        from gfw_data_api_spark.sql.dialect import _parse_pg_array_literal

        assert _parse_pg_array_literal('{"a\\"b", "c\\\\d"}') == [
            'a"b', "c\\d"
        ]
        assert _parse_pg_array_literal('{ x , "y z" }') == ["x", "y z"]
        assert _parse_pg_array_literal("{NULL, null, \"NULL\"}") == [
            None, None, "NULL"
        ]

    def test_rejections(self):
        import pytest as _pt

        # round-11: uniform multidim literals now PARSE; ragged,
        # scalar-mixed, and empty-sub-array shapes stay loud (PG
        # errors on the first two as well)
        out = to_spark_sql("SELECT '{{1},{2}}'::int[] FROM t")
        assert out.count("array(array(") == 1
        with _pt.raises(ValueError, match="matching dimensions"):
            to_spark_sql("SELECT '{{1,2},{3}}'::int[] FROM t")
        with _pt.raises(ValueError, match="matching dimensions"):
            to_spark_sql("SELECT '{1,{2}}'::int[] FROM t")
        with _pt.raises(ValueError, match="empty sub-arrays"):
            to_spark_sql("SELECT '{{}}'::int[] FROM t")
        with _pt.raises(ValueError, match="empty unquoted"):
            to_spark_sql("SELECT '{a,,b}'::text[] FROM t")
        with _pt.raises(ValueError, match="unterminated quoted"):
            to_spark_sql("SELECT '{\"a}'::text[] FROM t")
        with _pt.raises(ValueError, match="junk adjacent"):
            to_spark_sql("SELECT '{x\"a\"}'::text[] FROM t")
        with _pt.raises(ValueError, match="brace-delimited"):
            to_spark_sql("SELECT 'nope'::text[] FROM t")


class TestRowComparisons:
    """Round-10: PG row-constructor comparisons (keyset pagination).
    Spark's struct ordering is nulls-FIRST and its struct equality
    null-insensitive — probed silent divergences: (1,NULL) < (1,3) is
    TRUE in Spark / NULL in PG; (1,NULL) = (1,3) FALSE / NULL. The
    translation expands to PG's own lexicographic definition."""

    def test_values(self, spark):
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql(
            "SELECT 1 AS a, 3 AS b, CAST(NULL AS INT) AS n"
        ).createOrReplaceTempView("rowcmp_t")
        row = run_pg_sql(
            spark,
            "SELECT (a, b) < (2, 1) AS t1, "
            "(a, n) < (1, 3) AS tie_null, "
            "(a, n) < (2, 3) AS decided, "
            "(a, n) = (1, 3) AS eq_null, "
            "(a, n) <> (2, 3) AS ne_decided, "
            "ROW(a, b) <= ROW(1, 3) AS rowkw, "
            "(a, b) IN ((9, 9), (1, 3)) AS inr, "
            "(a, n) IN ((1, 3)) AS in_null, "
            "(a, b) NOT IN ((9, 9)) AS notin, "
            "(a, b, a) < (1, 3, 2) AS three, "
            "a IN (1, 2) AS scalar_in, "
            "nullif(a, b) = 1 AS fn_args, "
            "(a) < (b) AS scalar_paren FROM rowcmp_t",
        ).collect()[0]
        assert row.t1 is True
        assert row.tie_null is None      # PG: NULL (Spark alone: True)
        assert row.decided is True
        assert row.eq_null is None       # PG: NULL (Spark alone: False)
        assert row.ne_decided is True
        assert row.rowkw is True
        assert row.inr is True
        assert row.in_null is None
        assert row.notin is True
        assert row.three is True
        assert row.scalar_in is True     # scalar forms untouched
        assert row.fn_args is True
        assert row.scalar_paren is True

    def test_translation_shape(self):
        out = to_spark_sql("SELECT (a, b) < (c, d) FROM t")
        assert "OR ((a) = (c) AND ((b) < (d)))" in out
        out = to_spark_sql("SELECT (a, b) = (c, d) FROM t")
        assert "(a) = (c) AND (b) = (d)" in out
        # function calls and subqueries are never mistaken for rows
        out = to_spark_sql("SELECT nullif(a, b) = 1 FROM t")
        assert "nullif(a, b) = 1" in out


class TestAtTimeZoneAndIntervalEpoch:
    """Round-10: AT TIME ZONE (previously an opaque ParseException)
    and extract(epoch FROM interval) (previously an opaque analysis
    error). Session is pinned UTC: timestamp AT TIME ZONE z is the
    UTC instant of the z-local wall time (to_utc_timestamp); applied
    to our own timestamptz emission (a chain) it is the z-local wall
    time (from_utc_timestamp) — PG's left-associative typing."""

    def test_values(self, spark):
        import datetime as dt

        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql(
            "SELECT timestamp '2024-01-01 12:00:00' AS ts"
        ).createOrReplaceTempView("attz_t")
        row = run_pg_sql(
            spark,
            "SELECT ts AT TIME ZONE 'America/New_York' AS a, "
            "timestamp '2024-06-01 00:00:00' AT TIME ZONE "
            "'Europe/Paris' AS b, "
            "ts AT TIME ZONE 'UTC' AT TIME ZONE 'Asia/Tokyo' AS c, "
            "(ts + make_interval(hours => 1)) AT TIME ZONE 'UTC' AS d, "
            "extract(epoch from '1 day 1 hour'::interval) AS e, "
            "extract(epoch from '1.5 seconds'::interval) AS f, "
            "extract(epoch from '2 mons'::interval) AS g, "
            "extract(epoch from '1 year'::interval) AS h, "
            "extract(epoch from '14 months'::interval) AS i, "
            "extract(epoch from '14 months ago'::interval) AS j, "
            "extract(epoch from '25 months'::interval) AS k "
            "FROM attz_t",
        ).collect()[0]
        assert row.a == dt.datetime(2024, 1, 1, 17)   # NY winter = UTC-5
        assert row.b == dt.datetime(2024, 5, 31, 22)  # Paris DST = UTC+2
        assert row.c == dt.datetime(2024, 1, 1, 21)   # Tokyo wall time
        assert row.d == dt.datetime(2024, 1, 1, 13)
        assert row.e == 90000.0
        assert row.f == 1.5
        assert row.g == 5184000.0  # residual months count 30 days
        # PG interval_part DTK_EPOCH: whole years at 365.25 days +
        # residual months at 30 days, C-truncating division for the
        # split (DuckDB's native extract(epoch from interval) agrees
        # on every one of these values).
        assert row.h == 31557600.0
        assert row.i == 36741600.0
        assert row.j == -36741600.0
        assert row.k == 65707200.0

    def test_zone_rejection(self):
        import pytest as _pt

        with _pt.raises(ValueError, match="zone expression"):
            to_spark_sql("SELECT ts AT TIME ZONE + FROM t")

    def test_zone_spelling_matrix(self, spark):
        """Round-11 (verdict #2 + ADVICE): PG's zone-string spelling
        conventions. POSIX 'UTC+5' is WEST-positive in PG, east in
        Java → sign flips; abbreviations come from PG's fixed-offset
        Default table, never Java SHORT_IDS (whose PST is DST-aware
        Los Angeles); bare ISO offsets agree (PG≥16 rule); IANA and
        legacy tzdb names pass through."""
        import datetime as dt

        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql(
            "SELECT timestamp '2024-06-01 12:00:00' AS ts"
        ).createOrReplaceTempView("attz_m")
        row = run_pg_sql(
            spark,
            "SELECT ts AT TIME ZONE 'UTC+5' AS posix_e, "
            "ts AT TIME ZONE 'GMT-3:30' AS posix_w, "
            # June: a DST-aware PST (Java SHORT_IDS → LA) would give
            # -7; PG's abbrev table is fixed -8
            "ts AT TIME ZONE 'PST' AS abbr_pst, "
            "ts AT TIME ZONE 'est' AS abbr_ci, "
            "ts AT TIME ZONE 'Asia/Kolkata' AS iana, "
            "(ts AT TIME ZONE 'UTC') AT TIME ZONE 'Asia/Tokyo' "
            "AS paren_chain, "
            "ts AT TIME ZONE 'Japan' AS legacy "
            "FROM attz_m",
        ).collect()[0]
        assert row.posix_e == dt.datetime(2024, 6, 1, 17)   # west -5
        assert row.posix_w == dt.datetime(2024, 6, 1, 8, 30)  # east +3:30
        assert row.abbr_pst == dt.datetime(2024, 6, 1, 20)  # fixed -8
        assert row.abbr_ci == dt.datetime(2024, 6, 1, 17)   # fixed -5
        assert row.iana == dt.datetime(2024, 6, 1, 6, 30)
        # PG treats the parenthesized chain like the bare chain:
        # outer application reads the timestamptz → Tokyo wall time
        assert row.paren_chain == dt.datetime(2024, 6, 1, 21)
        assert row.legacy == dt.datetime(2024, 6, 1, 3)     # JST +9

        import pytest as _pt

        with _pt.raises(ValueError, match="abbreviation 'XYZT'"):
            to_spark_sql("SELECT ts AT TIME ZONE 'XYZT' FROM t")
        with _pt.raises(ValueError, match="SHORT_IDS"):
            # MET: dynamic in PG's table, SHORT_IDS-adjacent shape —
            # outside the verified subset, loud by policy
            to_spark_sql("SELECT ts AT TIME ZONE 'MET' FROM t")


class TestAge:
    """Round-11 (VERDICT r10 #4): two-argument age() renders PG's
    justified interval as postgres-style text. The differential
    oracle is DuckDB's native age() — it implements PG's
    timestamp_age algorithm — normalized for the two spelling
    differences (DuckDB 'month(s)' vs PG 'mon(s)'; DuckDB pluralizes
    by |value|, PG by value != 1, so '-1 year' → '-1 years')."""

    @staticmethod
    def _pairs():
        import datetime as dt

        bases = [
            dt.datetime(2024, 2, 29, 12, 0, 0),
            dt.datetime(2024, 3, 1, 0, 0, 0),
            dt.datetime(2023, 12, 31, 23, 59, 59),
            dt.datetime(2024, 1, 31, 6, 30, 15),
            dt.datetime(2023, 2, 28, 13, 30, 45),
            dt.datetime(2000, 2, 29, 0, 0, 1),
            dt.datetime(1999, 12, 31, 23, 0, 0),
            dt.datetime(2024, 5, 31, 10, 0, 0, 500000),
            dt.datetime(2024, 4, 30, 10, 0, 0, 123450),
            dt.datetime(2021, 7, 4, 1, 2, 3),
        ]
        offsets = [
            dt.timedelta(0),
            dt.timedelta(seconds=1),
            dt.timedelta(days=1),
            dt.timedelta(days=28),
            dt.timedelta(days=31, hours=5),
            dt.timedelta(days=365),
            dt.timedelta(days=366, hours=23, minutes=59),
            dt.timedelta(days=400, microseconds=250000),
            dt.timedelta(days=1461),
            dt.timedelta(days=59, seconds=86399),
        ]
        pairs = []
        for b in bases:
            for o in offsets:
                pairs.append((b + o, b))
                pairs.append((b, b + o))
        return pairs

    def test_differential_vs_duckdb(self, spark):
        import duckdb
        import pandas as pd

        from gfw_data_api_spark.sql.dialect import run_pg_sql

        pairs = self._pairs()
        pdf = pd.DataFrame(
            {
                "pid": range(len(pairs)),
                "t1": [p[0] for p in pairs],
                "t2": [p[1] for p in pairs],
            }
        )
        spark.createDataFrame(pdf).createOrReplaceTempView("age_t")
        got = {
            r.pid: r.a
            for r in run_pg_sql(
                spark, "SELECT pid, age(t1, t2) AS a FROM age_t"
            ).collect()
        }
        con = duckdb.connect()
        con.register("age_t", pdf)
        want = {
            pid: a
            for pid, a in con.sql(
                "SELECT pid, regexp_replace(replace(CAST(age(t1, t2) "
                "AS VARCHAR), ' month', ' mon'), "
                "'-1 (year|mon|day)( |$)', '-1 \\1s\\2', 'g') AS a "
                "FROM age_t"
            ).fetchall()
        }
        assert len(got) == len(pairs)
        mismatches = {
            k: (got[k], want[k]) for k in want if got[k] != want[k]
        }
        assert not mismatches, mismatches

    def test_one_arg_is_loud(self):
        import pytest as _pt

        with _pt.raises(ValueError, match="one-argument"):
            to_spark_sql("SELECT age(ts) FROM t")


class TestRound11ArraysAndIntervalText:
    """Round-11 stretches (verdict r10 #8/#9) plus the probe-found
    subscript divergence: PG array subscripts are 1-based with NULL
    for zero/negative/out-of-range (Spark's a[i] is 0-based and
    element_at(-1) counts from the END — both silent)."""

    def test_subscript_values(self, spark):
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql("SELECT 'a-b-c' AS s, 2 AS i").createOrReplaceTempView(
            "sub_t"
        )
        row = run_pg_sql(
            spark,
            "SELECT string_to_array(s, '-')[1] AS one, "
            "string_to_array(s, '-')[i] AS dyn, "
            "string_to_array(s, '-')[0] AS zero, "
            "string_to_array(s, '-')[-1] AS negidx, "
            "string_to_array(s, '-')[9] AS oob, "
            "('{{10,20},{30,40}}'::int[][])[2][1] AS md FROM sub_t",
        ).collect()[0]
        assert row.one == "a"
        assert row.dyn == "b"
        assert row.zero is None     # PG: subscript 0 → NULL
        assert row.negidx is None   # PG: negative subscript → NULL
        assert row.oob is None
        assert row.md == 30

    def test_slice_is_loud(self):
        import pytest as _pt

        with _pt.raises(ValueError, match="slice"):
            to_spark_sql("SELECT a[1:3] FROM t")

    def test_string_to_array_null_delimiter(self, spark):
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql(
            "SELECT 'abc' AS s, '' AS e, CAST(NULL AS STRING) AS n"
        ).createOrReplaceTempView("stan_t")
        row = run_pg_sql(
            spark,
            "SELECT string_to_array(s, NULL) AS chars, "
            "string_to_array(e, NULL) AS empty, "
            "string_to_array(n, NULL) AS isnull FROM stan_t",
        ).collect()[0]
        assert row.chars == ["a", "b", "c"]
        assert row.empty == []
        assert row.isnull is None

    def test_multidim_literal_values(self, spark):
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql("SELECT 1 AS one").createOrReplaceTempView("md_t")
        row = run_pg_sql(
            spark,
            "SELECT '{{1,2},{3,4}}'::int[][] AS m, "
            "'{{\"a b\", NULL}, {\"c\", d}}'::text[][] AS s FROM md_t",
        ).collect()[0]
        assert row.m == [[1, 2], [3, 4]]
        assert row.s == [["a b", None], ["c", "d"]]

    def test_interval_text_rendering(self, spark):
        """Pins PG's postgres-style interval_out for the constructor-
        typed subset; values cross-checked against PG's rendering
        rules (EncodeInterval) — '1 day' with no time part, trailing-
        zero-trimmed fractions, per-component signs, '00:00:00' zero,
        and the documented ≥24h normalization residual."""
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql("SELECT 1 AS one").createOrReplaceTempView("ivtx_t")
        row = run_pg_sql(
            spark,
            "SELECT '2 days 3 hours'::interval::text AS a, "
            "'90 minutes ago'::interval::text AS b, "
            "'14 months'::interval::text AS c, "
            "'14 months ago'::interval::text AS d, "
            "'0 days'::interval::text AS e, "
            "'26 hours'::interval::text AS f, "
            "'1 day'::interval::text AS g, "
            "'1.5 seconds ago'::interval::text AS h, "
            "make_interval(months => 12)::text AS i, "
            "CAST('2 days'::interval AS TEXT) AS j FROM ivtx_t",
        ).collect()[0]
        assert row.a == "2 days 03:00:00"
        assert row.b == "-01:30:00"
        assert row.c == "1 year 2 mons"
        assert row.d == "-1 years -2 mons"
        assert row.e == "00:00:00"
        assert row.f == "1 day 02:00:00"  # normalized (PARITY residual)
        assert row.g == "1 day"
        assert row.h == "-00:00:01.5"
        assert row.i == "1 year"
        assert row.j == "2 days"


class TestRound11Breadth:
    """format() NULL rule, justify family, isfinite, timeofday."""

    def test_format_null_renders_empty(self, spark):
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql(
            "SELECT CAST(NULL AS INT) AS n"
        ).createOrReplaceTempView("fmt_t")
        row = run_pg_sql(
            spark,
            "SELECT format('%s|%s', n, 'a') AS a, "
            "format('x%%y') AS b FROM fmt_t",
        ).collect()[0]
        assert row.a == "|a"   # PG: NULL under %s is EMPTY, not 'null'
        assert row.b == "x%y"

    def test_justify_and_isfinite(self, spark):
        import pytest as _pt

        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql(
            "SELECT timestamp '2024-01-01' AS ts, CAST(NULL AS INT) AS n"
        ).createOrReplaceTempView("jst_t")
        row = run_pg_sql(
            spark,
            "SELECT justify_hours('27 hours'::interval)::text AS a, "
            "justify_hours(make_interval(hours => 50))::text AS b, "
            "CASE WHEN justify_hours('25 hours'::interval) = "
            "'1 day 1 hour'::interval THEN 1 ELSE 0 END AS c, "
            "isfinite(ts) AS f, isfinite(n + NULL) AS fn FROM jst_t",
        ).collect()[0]
        assert row.a == "1 day 03:00:00"
        assert row.b == "2 days 02:00:00"
        assert row.c == 1
        assert row.f is True
        assert row.fn is None
        with _pt.raises(ValueError, match="families"):
            to_spark_sql("SELECT justify_days('35 days'::interval) FROM t")
        with _pt.raises(ValueError, match="families"):
            to_spark_sql(
                "SELECT justify_interval('1 mon -1 hour'::interval) FROM t"
            )
        with _pt.raises(ValueError, match="wall clock"):
            to_spark_sql("SELECT timeofday() FROM t")


class TestRound11Aggregates:
    """array_agg/json_agg NULL retention (PG keeps NULLs; Spark's
    native collect drops them — probe-found silent divergence), the
    json_agg family, and POSIX classes in named regex functions."""

    @staticmethod
    def _view(spark):
        spark.sql(
            "SELECT * FROM VALUES (1,'b',2),(2,'a',4),(3,'c',6),"
            "(4,NULL,8) AS t(id, s, v)"
        ).createOrReplaceTempView("r11agg_t")

    def test_array_agg_keeps_nulls(self, spark):
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        self._view(spark)
        row = run_pg_sql(
            spark,
            "SELECT array_agg(s ORDER BY id) AS o, "
            "array_agg(s) FILTER (WHERE v > 2) AS f, "
            "array_agg(DISTINCT v % 4) AS d FROM r11agg_t",
        ).collect()[0]
        assert row.o == ["b", "a", "c", None]
        # element order of an UNORDERED aggregate is unspecified in
        # both engines — compare as a multiset
        assert sorted(row.f, key=lambda x: (x is None, x)) == [
            "a", "c", None,
        ]
        assert sorted(row.d) == [0, 2]

    def test_array_agg_window_keeps_nulls(self, spark):
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        self._view(spark)
        rows = run_pg_sql(
            spark,
            "SELECT id, array_agg(s) OVER (ORDER BY id) AS w "
            "FROM r11agg_t ORDER BY id",
        ).collect()
        assert rows[-1].w == ["b", "a", "c", None]

    def test_json_agg_family(self, spark):
        import pytest as _pt

        from gfw_data_api_spark.sql.dialect import run_pg_sql

        self._view(spark)
        row = run_pg_sql(
            spark,
            "SELECT json_agg(s) AS a, "
            "json_agg(v ORDER BY v DESC) AS o, "
            "jsonb_agg(s) FILTER (WHERE s IS NOT NULL) AS f "
            "FROM r11agg_t",
        ).collect()[0]
        # compact Spark JSON (the documented jsonb text convention);
        # NULL elements survive as json null
        assert sorted(row.a[1:-1].split(",")) == sorted(
            ['"b"', '"a"', '"c"', "null"]
        )
        assert row.o == "[8,6,4,2]"
        assert sorted(row.f[1:-1].split(",")) == ['"a"', '"b"', '"c"']
        with _pt.raises(ValueError, match="duplicate keys"):
            to_spark_sql("SELECT json_object_agg(s, v) FROM t")

    def test_named_regex_posix_classes(self, spark):
        import pytest as _pt

        from gfw_data_api_spark.sql.dialect import run_pg_sql

        self._view(spark)
        row = run_pg_sql(
            spark,
            "SELECT regexp_like('ab', '[[:alpha:]]+') AS a, "
            "regexp_count('a1b22c', '[[:digit:]]+') AS c, "
            "regexp_instr('aXb', 'X') AS i, "
            "regexp_substr('a12b', '[[:digit:]]+') AS s, "
            "regexp_substr('ab', '[0-9]') AS miss FROM r11agg_t "
            "LIMIT 1",
        ).collect()[0]
        assert row.a is True
        assert row.c == 2
        assert row.i == 2
        assert row.s == "12"
        assert row.miss is None
        with _pt.raises(ValueError, match="2-argument"):
            to_spark_sql("SELECT regexp_count(x, 'y', 3) FROM t")


class TestGroupingSetsAndFrames:
    """Round-11: GROUPING SETS/ROLLUP/CUBE are Spark-native with PG
    semantics; multi-arg grouping() renames to grouping_id (same
    MSB-first bitmask, DuckDB concurring); GROUPS frames and frame
    EXCLUDE get named rejections instead of opaque parser errors."""

    def test_rollup_cube_grouping(self, spark):
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql(
            "SELECT * FROM VALUES ('a',1),('a',2),('b',1) AS t(k, p)"
        ).createOrReplaceTempView("gsr_t")
        rows = run_pg_sql(
            spark,
            "SELECT k, p, CAST(grouping(k, p) AS INT) AS g, "
            "count(*) AS n FROM gsr_t GROUP BY CUBE (k, p) "
            "ORDER BY g, k, p",
        ).collect()
        # g=0 detail rows, g=1 p-subtotals, g=2 k-subtotals, g=3 total
        by_g = {}
        for r in rows:
            by_g.setdefault(r.g, []).append(r)
        assert len(by_g[0]) == 3
        assert len(by_g[1]) == 2
        assert len(by_g[2]) == 2
        assert by_g[3][0].n == 3
        rows2 = run_pg_sql(
            spark,
            "SELECT k, count(*) AS n FROM gsr_t "
            "GROUP BY ROLLUP (k) ORDER BY k",
        ).collect()
        assert len(rows2) == 3  # a, b, grand total

    def test_empty_input_residual_pinned(self, spark):
        """Fuzz-found residual (PARITY): PG emits the ()-set row with
        count 0 over an EMPTY input; Spark emits nothing. Pinned so a
        future Spark version closing the gap is noticed."""
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql("SELECT 1 AS x WHERE false").createOrReplaceTempView(
            "gse_t"
        )
        rows = run_pg_sql(
            spark,
            "SELECT x, count(*) AS n FROM gse_t GROUP BY CUBE (x)",
        ).collect()
        assert rows == []  # PG would return [(NULL, 0)]

    def test_frame_rejections(self):
        import pytest as _pt

        with _pt.raises(ValueError, match="GROUPS window frame"):
            to_spark_sql(
                "SELECT sum(v) OVER (ORDER BY k GROUPS BETWEEN 1 "
                "PRECEDING AND CURRENT ROW) FROM t"
            )
        with _pt.raises(ValueError, match="EXCLUDE"):
            to_spark_sql(
                "SELECT sum(v) OVER (ORDER BY k ROWS BETWEEN 1 "
                "PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) FROM t"
            )
        # columns merely named like the keywords stay fine
        out = to_spark_sql("SELECT groups, exclude FROM t WHERE groups BETWEEN 1 AND 2")
        assert "groups" in out


class TestUnaryMathOps:
    """Round-11: PG's prefix operator spellings @ (abs), |/ (sqrt),
    ||/ (cbrt) — previously opaque parse errors. String || stays
    untouched (a completed operand precedes it)."""

    def test_values(self, spark):
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql(
            "SELECT -5 AS m, 'a' AS s, 'b' AS t"
        ).createOrReplaceTempView("umo_t")
        row = run_pg_sql(
            spark,
            "SELECT @ m AS a, @ (-7.5) AS a2, |/ 25 AS sq, "
            "||/ 27 AS cb, |/ (m * m) AS sq2, "
            "s || t AS cc, s || '-' || t AS cc2 FROM umo_t",
        ).collect()[0]
        assert row.a == 5
        assert float(row.a2) == 7.5
        assert row.sq == 5.0
        assert row.cb == 3.0
        assert row.sq2 == 5.0
        assert row.cc == "ab"
        assert row.cc2 == "a-b"

    def test_sqrt_domain_raises(self, spark):
        import pytest as _pt

        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql("SELECT -5 AS m").createOrReplaceTempView("umo2_t")
        with _pt.raises(Exception, match="square root"):
            run_pg_sql(spark, "SELECT |/ (m) FROM umo2_t").collect()


class TestDegreeTrigAndSha:
    def test_values(self, spark):
        from gfw_data_api_spark.sql.dialect import run_pg_sql

        spark.sql("SELECT 1 AS one").createOrReplaceTempView("dts_t")
        row = run_pg_sql(
            spark,
            "SELECT sind(30) AS a, cosd(60) AS b, tand(45) AS c, "
            "atand(1) AS d, atan2d(1, 1) AS e, asind(1) AS f, "
            "encode(sha256('abc'), 'hex') AS h256, "
            "encode(sha512('abc'::bytea), 'hex') AS h512, "
            "encode(sha224('abc'), 'hex') AS h224 FROM dts_t",
        ).collect()[0]
        # radians-composition residual: last-ulp neighbors at exact
        # anchors (PG special-cases these to 0.5 etc. — PARITY)
        assert abs(row.a - 0.5) < 1e-15
        assert abs(row.b - 0.5) < 1e-15
        assert abs(row.c - 1.0) < 1e-15
        assert row.d == 45.0
        assert row.e == 45.0
        assert row.f == 90.0
        # FIPS 180 known-answer values (PG returns the same bytea)
        assert row.h256 == (
            "ba7816bf8f01cfea414140de5dae2223"
            "b00361a396177a9cb410ff61f20015ad"
        )
        assert row.h224.startswith("23097d22")
        assert row.h512.startswith("ddaf35a1")

    def test_arity_loud(self):
        import pytest as _pt

        with _pt.raises(ValueError, match="exactly 1"):
            to_spark_sql("SELECT sind(1, 2) FROM t")
        with _pt.raises(ValueError, match="exactly 2"):
            to_spark_sql("SELECT atan2d(1) FROM t")


class TestFullTextSearchRejection:
    """Round-11 (verdict r10 #7): the tsvector/tsquery family gets a
    NAMED rejection instead of Spark's opaque unresolved-function
    error — the reference admits FTS via PG pass-through, so the
    no-go must be explicit and actionable."""

    def test_named_rejection(self):
        import pytest as _pt

        for q in (
            "SELECT to_tsvector('english', body) FROM t",
            "SELECT plainto_tsquery('tree cover') FROM t",
            "SELECT body_tsv @@ to_tsquery('a & b') FROM t",
            "SELECT x @@ y FROM t",
            "SELECT ts_rank(v, q) FROM t",
        ):
            with _pt.raises(ValueError, match="full-text search"):
                to_spark_sql(q)

    def test_no_false_positives(self):
        # a column merely NAMED like an FTS function, and the @>
        # containment operator, are untouched
        assert "to_tsvector" in to_spark_sql("SELECT to_tsvector FROM t")
        out = to_spark_sql('SELECT j @> \'{"a": 1}\' FROM t')
        assert "@@" not in out
