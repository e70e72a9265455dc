"""The declared operator inventory: every SURVEY.md §2 row exercised as a
concrete (Spark query, DuckDB oracle SQL) pair over the driver's testdata.

Each entry is a :class:`QuerySpec`; ``__spark_entry__.py`` re-exports them
in the driver contract shape. Cross-engine determinism rules used
throughout (so order-insensitive value hashes match bit-for-bit):

- money/metric sums go through DECIMAL (exact, order-independent), then
  CAST to DOUBLE for a dtype both engines share;
- derived ints are CAST to BIGINT (Spark's year()/length() return INT32,
  DuckDB's BIGINT);
- double→int conversions always use floor() first (DuckDB's CAST rounds,
  Spark's truncates);
- averages are written sum/count, never avg() (per-engine accumulation
  orders differ on DOUBLE);
- no raw TIMESTAMP columns in result sets — project dates as text.

Queries tagged "guarded" run through the full guard+rewrite+Spark path
(sql/guard.py → operators/query.py), proving the reference's query plane;
join/dedup/similarity entries use the DataFrame API (the reference's
internal operators, SURVEY.md §2.3, and the LLM-pipeline extensions §2.8).
"""

from __future__ import annotations

import math
import os
import tempfile
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gfw_data_api_spark.operators.query import execute_on_dataframe
from gfw_data_api_spark.sources.tabular import load_table

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    spark_fn: SparkQuery
    oracle: str | None  # DuckDB SQL; None → rows-only check
    survey_ref: str  # SURVEY.md §2 row(s) this exercises


def _guarded(table: str, sql: str, fanout: bool | None = None) -> SparkQuery:
    """Run ``sql`` through the guarded single-table path against ``table``.

    ``fanout=True`` pre-repartitions the single-row-group testdata file so
    compute-heavy queries (percentile state, CUBE's 4× Expand) use every
    core — see sources.tabular._FANOUT_TABLES.
    """

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return execute_on_dataframe(
            spark, load_table(spark, sf_dir, table, fanout=fanout), sql
        )

    return fn


def _same(
    table: str, sql: str, survey_ref: str, name: str, fanout: bool | None = None
) -> QuerySpec:
    """Guarded query whose text is valid, semantically identical DuckDB SQL."""
    return QuerySpec(
        name=name, spark_fn=_guarded(table, sql, fanout), oracle=sql, survey_ref=survey_ref
    )


# ---------------------------------------------------------------------------
# Q-series: the guarded single-table SQL dialect (SURVEY §2.1)
# ---------------------------------------------------------------------------

_SPECS: list[QuerySpec] = []

_SPECS.append(
    _same(
        "lineitem",
        "SELECT l_orderkey, l_linenumber, l_quantity, "
        "l_extendedprice * (1 - l_discount) AS revenue "
        "FROM lineitem WHERE l_orderkey < 100",
        "Q1,Q2 scan+projection (query_helpers.py:349-381)",
        "q01_scan_projection",
    )
)

_SPECS.append(
    _same(
        "part",
        "SELECT p_partkey, p_name, p_size, "
        "CASE WHEN p_size > 25 THEN 'big' WHEN p_size > 10 THEN 'mid' ELSE 'small' END AS size_class "
        "FROM part "
        "WHERE p_size BETWEEN 5 AND 45 AND p_retailprice IS NOT NULL "
        "AND (p_type LIKE '%a%' OR p_size IN (7, 11, 13)) AND NOT p_size = 8",
        "Q3 filter surface: BETWEEN/IN/LIKE/IS NULL/AND-OR-NOT/CASE",
        "q02_filter_predicates",
    )
)

_SPECS.append(
    _same(
        "lineitem",
        "SELECT count(*) AS cnt, "
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, "
        "CAST(min(l_extendedprice) AS DOUBLE) AS min_price, "
        "CAST(max(l_extendedprice) AS DOUBLE) AS max_price, "
        "count(DISTINCT l_partkey) AS n_parts "
        "FROM lineitem",
        "Q5 global aggregation (test_query.py:65,88,677)",
        "q03_agg_global",
    )
)

_SPECS.append(
    _same(
        "lineitem",
        "SELECT l_returnflag, l_linestatus, "
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, "
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price, "
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price, "
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty, "
        "count(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
        "GROUP BY l_returnflag, l_linestatus",
        "Q5,Q6 grouped aggregation — TPC-H Q1 shape (datamart land.py:85)",
        "q04_pricing_summary",
    )
)

_SPECS.append(
    _same(
        "lineitem",
        "SELECT l_partkey, count(*) AS cnt, "
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty "
        "FROM lineitem GROUP BY l_partkey HAVING count(*) > 35",
        "Q7 HAVING (allowed-through, query_helpers.py:341-347)",
        "q05_having",
    )
)

_SPECS.append(
    _same(
        "lineitem",
        "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
        "Q8 DISTINCT",
        "q06_distinct",
    )
)

_SPECS.append(
    _same(
        "orders",
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 10",
        "Q9 ORDER BY / LIMIT / OFFSET (query_helpers.py:424-429)",
        "q07_order_limit_offset",
    )
)

_SPECS.append(
    _same(
        "orders",
        "SELECT o_orderkey, o_custkey, "
        "CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn, "
        "CAST(lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS prev_price "
        "FROM orders",
        "Q10 window functions (not in forbidden list → allowed)",
        "q08_window",
    )
)

_SPECS.append(
    _same(
        "orders",
        "SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, "
        "CAST(month(o_orderdate) AS BIGINT) AS o_month, count(*) AS cnt, "
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total "
        "FROM orders GROUP BY 1, 2",
        "Q11,R6 date functions (features.py:131-137)",
        "q09_date_functions",
    )
)

_SPECS.append(
    _same(
        "customer",
        "SELECT c_custkey, upper(c_name) AS name_upper, "
        "CAST(length(c_name) AS BIGINT) AS name_len, "
        "substr(c_mktsegment, 1, 3) AS seg3, md5(c_name) AS name_md5 "
        "FROM customer WHERE lower(c_mktsegment) LIKE '%i%'",
        "Q11 string functions + md5 (crud/geostore.py:120)",
        "q10_string_functions",
    )
)

_SPECS.append(
    _same(
        "orders",
        "SELECT o_orderkey, "
        "CASE WHEN o_totalprice > 300000 THEN 'high' "
        "WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS price_band "
        "FROM orders WHERE o_orderstatus IN ('F', 'O')",
        "Q3 CASE expression in projection",
        "q11_case_expr",
    )
)

_SPECS.append(
    _same(
        "lineitem",
        "SELECT t.l_orderkey AS k, count(*) AS items, "
        "CAST(max(t.l_linenumber) AS BIGINT) AS max_line "
        "FROM lineitem AS t GROUP BY t.l_orderkey",
        "Q1 alias preservation (test_query_helpers.py:190-197)",
        "q12_alias_table",
    )
)


def _q13_jsonb(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = (
        "SELECT event_id, CAST(get_json_object(props, '$.k') AS BIGINT) AS prop_k "
        "FROM events WHERE event_type = 'click'"
    )
    return execute_on_dataframe(spark, load_table(spark, sf_dir, "events"), sql)


_SPECS.append(
    QuerySpec(
        name="q13_jsonb_extract",
        spark_fn=_q13_jsonb,
        oracle=(
            "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k "
            "FROM events WHERE event_type = 'click'"
        ),
        survey_ref="Q11 jsonb access (pg_types.py jsonb → JSON path)",
    )
)

_SPECS.append(
    QuerySpec(
        name="q14_pg_casts",
        spark_fn=_guarded(
            "orders",
            "SELECT o_orderkey::text AS key_str, "
            "(o_orderdate::date)::text AS order_day, "
            "o_orderkey::bigint AS key_big "
            "FROM orders WHERE o_orderkey < 200",
        ),
        oracle=(
            "SELECT CAST(o_orderkey AS TEXT) AS key_str, "
            "CAST(CAST(o_orderdate AS DATE) AS TEXT) AS order_day, "
            "CAST(o_orderkey AS BIGINT) AS key_big "
            "FROM orders WHERE o_orderkey < 200"
        ),
        survey_ref="Q11 ::type casts (sql/dialect.py translation)",
    )
)

# ---------------------------------------------------------------------------
# I-series: internal relational operators (SURVEY §2.3 — these DO join)
# ---------------------------------------------------------------------------


def _i01(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    grouped = (
        region.join(nation, region.r_regionkey == nation.n_regionkey, "left")
        .groupBy("r_name")
        .agg(
            F.count("n_nationkey").alias("n_nations"),
            F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations"),
        )
    )
    return grouped


_SPECS.append(
    QuerySpec(
        name="i01_group_join_agg",
        spark_fn=_i01,
        oracle=(
            "SELECT r_name, count(n_nationkey) AS n_nations, "
            "coalesce(string_agg(n_name, ',' ORDER BY n_name), '') AS nations "
            "FROM region LEFT JOIN nation ON n_regionkey = r_regionkey GROUP BY r_name"
        ),
        survey_ref="I1 left join + grouped array agg (orm/queries/datasets.py:3-30)",
    )
)


def _i02(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_cust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("total_bal"),
        )
    )


_SPECS.append(
    QuerySpec(
        name="i02_three_way_join",
        spark_fn=_i02,
        oracle=(
            "SELECT r_name, count(*) AS n_cust, "
            "CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
        ),
        survey_ref="I2 3-way registry join, broadcast dims (orm/queries/raster_assets.py:1-21)",
    )
)

def _i06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I6 pagination through the real operator: page slice via
    offset/limit plus a separate distributed count() stamped as a
    literal — not count(*) OVER (), whose empty partition spec would
    serialize the whole table through one task."""
    from gfw_data_api_spark.operators.pagination import paginate_df

    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return paginate_df(customer, page=3, size=10, order_by=["c_custkey"])


_SPECS.append(
    QuerySpec(
        name="i06_pagination",
        spark_fn=_i06,
        oracle=(
            "SELECT c_custkey, c_name, CAST(count(*) OVER () AS BIGINT) AS total_rows "
            "FROM customer ORDER BY c_custkey LIMIT 10 OFFSET 20"
        ),
        survey_ref="I6 pagination: LIMIT size OFFSET (page-1)*size + count "
        "(utils/paginate.py:42-81; operators/pagination.py)",
    )
)

_SPECS.append(
    _same(
        "nation",
        "SELECT n_nationkey, n_name, lower(n_name) AS name_normalized "
        "FROM nation WHERE lower(n_name) LIKE 'nation#_1%' ESCAPE '#'",
        "I4,I5 LIKE-pattern + normalized-name lookup (political/id_lookup.py:99-126)",
        "i05_normalized_lookup",
    )
)

# ---------------------------------------------------------------------------
# E-series: ingestion/ETL operators expressed over testdata (SURVEY §2.2)
# ---------------------------------------------------------------------------


def _e01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 CSV roundtrip: export a slice to CSV, re-ingest with schema
    inference + declared overrides, aggregate — must equal the oracle run
    directly over the parquet."""
    import pandas as pd

    from gfw_data_api_spark.sources.tabular import FieldType, read_tabular_source

    pdf = pd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"))
    pdf = pdf[pdf.l_orderkey <= 100][
        ["l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_returnflag"]
    ]
    tmp = tempfile.mkdtemp(prefix="gfw_e01_")
    csv_path = os.path.join(tmp, "lineitem_slice.csv")
    pdf.to_csv(csv_path, index=False)
    df = read_tabular_source(
        spark,
        csv_path,
        delimiter=",",
        table_schema=[FieldType("l_quantity", "double precision")],
    )
    return df.agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
        F.count_distinct("l_returnflag").alias("n_flags"),
    )


_SPECS.append(
    QuerySpec(
        name="e01_csv_inference_roundtrip",
        spark_fn=_e01,
        oracle=(
            "SELECT count(*) AS cnt, "
            "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, "
            "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price, "
            "count(DISTINCT l_returnflag) AS n_flags "
            "FROM lineitem WHERE l_orderkey <= 100"
        ),
        survey_ref="E1 CSV scan + inference + type overrides (create_tabular_schema.sh)",
    )
)


def _e03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 idempotent append: the anti-join that implements ON CONFLICT DO
    NOTHING. Orders already having lineitems are 'conflicts'; the result is
    the orders that would actually append."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    existing = lineitem.select(F.col("l_orderkey").alias("o_orderkey")).distinct()
    return orders.join(existing, "o_orderkey", "left_anti").select("o_orderkey", "o_orderstatus")


_SPECS.append(
    QuerySpec(
        name="e03_append_antijoin",
        spark_fn=_e03,
        oracle=(
            "SELECT o_orderkey, o_orderstatus FROM orders o "
            "WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)"
        ),
        survey_ref="E3 idempotent append anti-join (load_tabular_data.sh COPY+ON CONFLICT)",
    )
)

_SPECS.append(
    _same(
        "events",
        "SELECT user_id, event_type, min(event_id) AS first_event_id, count(*) AS n_events "
        "FROM events GROUP BY user_id, event_type",
        "E10 unique-constraint dedup key semantics (creation_options.py:59-71)",
        "e10_groupwise_dedup",
    )
)

_SPECS.append(
    _same(
        "orders",
        "SELECT CASE WHEN o_orderstatus = 'O' THEN 'open' "
        "WHEN o_orderstatus = 'F' THEN 'finished' ELSE 'default' END AS part_key, "
        "count(*) AS cnt FROM orders GROUP BY 1",
        "E2 list-partition mapping (creation_options.py:73-110, create_partitions.py)",
        "e02_partition_mapping",
    )
)

# ---------------------------------------------------------------------------
# R-series: the raster zonal-statistics dialect over events-as-pixels
# (SURVEY §2.4; the true tile engine lives in gfw_data_api_spark.raster)
# ---------------------------------------------------------------------------

_SPECS.append(
    _same(
        "events",
        "SELECT event_type, "
        "CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value, "
        "count(*) AS alert_count "
        "FROM events GROUP BY event_type",
        "R1,R2,R5 sum()/count(*) GROUP BY layer (analysis.py:112-147)",
        "r01_zonal_sum_groupby",
    )
)

_SPECS.append(
    _same(
        "events",
        "SELECT count(*) AS alert_count FROM events "
        "WHERE value >= 100 AND event_type != 'error'",
        "R4 threshold + meaning filters (analysis.py:115-133)",
        "r04_threshold_filter",
    )
)


def _r06(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = (
        "SELECT CAST(weekofyear(ts) AS BIGINT) AS iso_week, count(*) AS alert_count "
        "FROM events GROUP BY 1"
    )
    return execute_on_dataframe(spark, load_table(spark, sf_dir, "events"), sql)


_SPECS.append(
    QuerySpec(
        name="r06_isoweek",
        spark_fn=_r06,
        oracle="SELECT CAST(week(ts) AS BIGINT) AS iso_week, count(*) AS alert_count FROM events GROUP BY 1",
        survey_ref="R6 isoweek(date_layer) (analysis.py:143-147)",
    )
)

_SPECS.append(
    _same(
        "events",
        "SELECT CAST(floor((CAST(floor(value * 100) AS BIGINT) + 20000) / 10000) AS BIGINT) AS confidence, "
        "(CAST(floor(value * 100) AS BIGINT) + 20000) % 10000 AS day_code, "
        "count(*) AS n "
        "FROM events GROUP BY 1, 2",
        "R8 date_conf derived-layer calc: A % 10000, floor(A/10000) (queries.py:721-760)",
        "r08_derived_layer_calc",
    )
)

# ---------------------------------------------------------------------------
# LLM-pipeline operators (SURVEY §7.8): text analysis, dedup, similarity
# ---------------------------------------------------------------------------

_SPECS.append(
    QuerySpec(
        name="t01_token_count",
        spark_fn=_guarded(
            "documents",
            "SELECT doc_id, CAST(size(split(trim(text), '\\s+')) AS BIGINT) AS n_tokens FROM documents",
        ),
        oracle=(
            "SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens "
            "FROM documents"
        ),
        survey_ref="text analysis: whitespace token counting",
    )
)

_SPECS.append(
    _same(
        "documents",
        "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_measured, "
        "CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_nonspace, "
        "CAST((length(text) - length(replace(text, ' the ', ''))) / 5 AS BIGINT) AS n_the "
        "FROM documents",
        "text analysis: quality-score raw signals (length/space/stopword counts)",
        "t02_quality_signals",
    )
)

_SPECS.append(
    _same(
        "documents",
        "SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars, "
        "CAST(min(n_chars) AS BIGINT) AS min_chars, CAST(max(n_chars) AS BIGINT) AS max_chars "
        "FROM documents GROUP BY lang",
        "text analysis: language distribution profile",
        "t03_lang_profile",
    )
)

_SPECS.append(
    _same(
        "documents",
        "SELECT md5(text) AS text_hash, min(doc_id) AS keeper_id, count(*) AS copies "
        "FROM documents GROUP BY 1",
        "dedup: exact content-hash dedup (hash-groupBy)",
        "d01_exact_dedup",
    )
)

_SPECS.append(
    QuerySpec(
        name="d02_prefix_fingerprint",
        spark_fn=_guarded(
            "documents",
            "SELECT doc_id, md5(array_join(slice(split(trim(text), '\\s+'), 1, 5), ' ')) AS fingerprint "
            "FROM documents",
        ),
        oracle=(
            "SELECT doc_id, md5(array_to_string(regexp_split_to_array(trim(text), '\\s+')[1:5], ' ')) AS fingerprint "
            "FROM documents"
        ),
        survey_ref="dedup: document fingerprinting (first-k-token signature)",
    )
)


def _cosine_cols(emb_col: F.Column, query: list[float]) -> tuple[F.Column, F.Column]:
    qlit = F.array(*[F.lit(float(x)) for x in query])
    cast = emb_col.cast("array<double>")
    dot = F.aggregate(
        F.zip_with(cast, qlit, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = F.sqrt(
        F.aggregate(F.zip_with(cast, cast, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    )
    return dot, norm


def _s01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-k cosine similarity against vec_id=0 (the baseline
    ANN path; LSH-bucketed variant in llmops.similarity)."""
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    qnorm = math.sqrt(sum(float(x) * float(x) for x in query))
    dot, norm = _cosine_cols(F.col("embedding"), query)
    return (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(dot / (norm * F.lit(qnorm)), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
    )


_SPECS.append(
    QuerySpec(
        name="s01_cosine_topk",
        spark_fn=_s01,
        oracle=(
            "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0) "
            "SELECT e.vec_id, round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe) / "
            "(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) * "
            "sqrt(list_dot_product(q.qe, q.qe))), 6) AS cosine "
            "FROM embeddings e, q WHERE e.vec_id != 0 "
            "ORDER BY cosine DESC, e.vec_id LIMIT 10"
        ),
        survey_ref="similarity search: brute-force cosine top-k over embeddings",
    )
)


def _s02(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cast = F.col("embedding").cast("array<double>")
    norm = F.sqrt(
        F.aggregate(F.zip_with(cast, cast, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    )
    return emb.select(
        "vec_id",
        F.col("label").cast("int").alias("label"),
        F.round(norm, 6).alias("l2_norm"),
        F.size("embedding").cast("bigint").alias("dim"),
    )


_SPECS.append(
    QuerySpec(
        name="s02_embedding_norms",
        spark_fn=_s02,
        oracle=(
            "SELECT vec_id, label, "
            "round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))), 6) AS l2_norm, "
            "CAST(len(embedding) AS BIGINT) AS dim FROM embeddings"
        ),
        survey_ref="similarity plumbing: vector norms + dims as columns",
    )
)


def _d03(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.llmops.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), shingle_n=3, threshold=0.12
    )


_SPECS.append(
    QuerySpec(
        name="d03_ngram_jaccard_pairs",
        spark_fn=_d03,
        oracle=(
            "WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents), "
            "sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t)-1), "
            "i -> array_to_string(t[i:i+2], ' ')))) AS s FROM toks), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), "
            "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared "
            "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT id_a, id_b, CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) AS jaccard "
            "FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b "
            "WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.12"
        ),
        survey_ref="dedup: exact n-gram Jaccard pairs via inverted shingle index",
    )
)


def _d04(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.llmops.dedup import minhash_lsh_candidates_portable

    pairs = minhash_lsh_candidates_portable(
        load_table(spark, sf_dir, "documents"), num_hashes=64, bands=16
    )
    return pairs.filter(F.col("est_jaccard") >= 0.5).select(
        "id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard")
    )


def _portable_minhash_oracle(cand_sql: str, id_a: str, id_b: str) -> str:
    """Shared DuckDB replica of the portable MinHash pipeline — md5-60bit
    base hash mod 2³¹−1, 64 inlined affine permutations, 16 band keys of
    4 comma-joined values — parameterized on the candidate-arm SQL so
    d04 (one-shot) and d13 (incremental state/batch) gate the SAME
    replica and can never drift. The (a_i, b_i) literals come from
    llmops/dedup.portable_hash_params for the same reason."""
    from gfw_data_api_spark.llmops.dedup import _PORTABLE_P, portable_hash_params

    mins = ", ".join(
        f"min(({a} * h + {b}) % {_PORTABLE_P})"
        for a, b in portable_hash_params(64)
    )
    return (
        "WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents), "
        "sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t)-1), "
        "i -> array_to_string(t[i:i+2], ' ')))) AS s FROM toks), "
        "h AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT "
        f"% {_PORTABLE_P} AS h FROM sh), "
        f"sig AS (SELECT doc_id, list_value({mins}) AS sig FROM h GROUP BY doc_id), "
        "bands AS (SELECT doc_id, b, array_to_string(sig[b*4+1 : b*4+4], ',') AS key "
        "FROM sig, unnest(range(0, 16)) AS u(b)), "
        f"cand AS ({cand_sql}) "
        f"SELECT {id_a}, {id_b}, round(CAST(len(list_filter(range(1, 65), "
        "i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / 64, 6) AS est_jaccard "
        f"FROM cand JOIN sig sa ON sa.doc_id = {id_a} JOIN sig sb ON sb.doc_id = {id_b} "
        "WHERE CAST(len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / 64 >= 0.5"
    )


def _d04_oracle() -> str:
    return _portable_minhash_oracle(
        "SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b "
        "FROM bands a JOIN bands b ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id",
        "id_a",
        "id_b",
    )


_SPECS.append(
    QuerySpec(
        name="d04_minhash_lsh_neardups",
        spark_fn=_d04,
        oracle=_d04_oracle(),
        survey_ref="dedup: MinHash+LSH banded candidates (portable "
        "md5-affine family → full oracle; xxhash64 variant remains the "
        "throughput default, cross-checked in tests)",
    )
)


def _d05(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.llmops.dedup import simhash_near_dups_portable

    return simhash_near_dups_portable(
        load_table(spark, sf_dir, "documents"), max_hamming=8, bands=4
    )


def _d05_oracle() -> str:
    """DuckDB replica of the portable 60-bit SimHash pipeline: md5-60bit
    token hash, per-bit majority, packed fingerprint, 15-bit pigeonhole
    band join, bit_count(xor) verify — generated so the bit arithmetic
    cannot drift from simhash_portable."""
    bit_sums = ", ".join(f"sum((h >> {b}) & 1) AS b{b}" for b in range(60))
    packed = " + ".join(
        f"(CASE WHEN b{b} * 2 > n THEN (1::BIGINT << {b}) ELSE 0 END)"
        for b in range(60)
    )
    return (
        "WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t "
        "FROM documents), "
        "h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok), "
        f"cnt AS (SELECT doc_id, {bit_sums}, count(*) AS n FROM h GROUP BY doc_id), "
        f"sim AS (SELECT doc_id, {packed} AS sh FROM cnt), "
        "bands AS (SELECT doc_id, sh, b, (sh >> (b * 15)) & 32767 AS chunk "
        "FROM sim, unnest(range(0, 4)) AS u(b)), "
        "pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, "
        "a.sh AS sha, b.sh AS shb "
        "FROM bands a JOIN bands b ON a.b = b.b AND a.chunk = b.chunk "
        "AND a.doc_id < b.doc_id) "
        "SELECT id_a, id_b, CAST(bit_count(xor(sha, shb)) AS INT) AS hamming "
        "FROM pairs WHERE bit_count(xor(sha, shb)) <= 8"
    )


_SPECS.append(
    QuerySpec(
        name="d05_simhash_neardups",
        spark_fn=_d05,
        oracle=_d05_oracle(),
        survey_ref="dedup: SimHash near-dup pairs (portable 60-bit md5 "
        "family → full oracle; xxhash64 64-bit variant remains available)",
    )
)


def _t04(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.llmops.text import language_id

    df = language_id(load_table(spark, sf_dir, "documents"))
    return df.groupBy("lang", "lang_pred").agg(F.count("*").alias("n"))


def _t04_oracle() -> str:
    """DuckDB replica of language_id: although the Spark argmax chain
    compares float ratios, every comparison shares the token-count
    denominator, so the whole classifier reduces to integer hit
    arithmetic — the floor `score > 0.015` is `hits*1000 > 15*n`, the
    chain's strict-greater update makes ties go to the EARLIEST
    language in STOPWORDS order, and the zh short-circuit is
    `cjk_chars*20 > len`. Generated from llmops.text.STOPWORDS so the
    word lists can never drift."""
    from gfw_data_api_spark.llmops.text import STOPWORDS

    langs = list(STOPWORDS)  # dict order == Spark chain order
    hit_cols = ", ".join(
        "len(list_filter(list_transform(regexp_split_to_array(trim(text), '\\s+'), "
        "t -> lower(t)), t -> t IN ("
        + ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        + f"))) AS h_{lang}"
        for lang in langs
    )
    m = "greatest(" + ", ".join(f"h_{lang}" for lang in langs) + ")"
    argmax = " ".join(
        f"WHEN h_{lang} = {m} THEN '{lang}'" for lang in langs[:-1]
    )
    return (
        f"WITH sig AS (SELECT doc_id, lang, {hit_cols}, "
        "greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1) AS n, "
        "length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS cjk, "
        "greatest(length(text), 1) AS nchars FROM documents), "
        "pred AS (SELECT doc_id, lang, CASE "
        "WHEN cjk * 20 > nchars THEN 'zh' "
        f"WHEN {m} * 1000 <= 15 * n THEN 'unknown' "
        f"{argmax} ELSE '{langs[-1]}' END AS lang_pred FROM sig) "
        "SELECT lang, lang_pred, count(*) AS n FROM pred GROUP BY lang, lang_pred"
    )


_SPECS.append(
    QuerySpec(
        name="t04_language_id_confusion",
        spark_fn=_t04,
        oracle=_t04_oracle(),
        survey_ref="text analysis: n-gram language-ID heuristic "
        "(integer-reduced argmax → full oracle since round 3)",
    )
)

_SPECS.append(
    QuerySpec(
        name="t05_quality_ratios",
        spark_fn=_guarded(
            "documents",
            # the 'g' flag is semantic since round 6: PG (and now the
            # dialect) replaces only the FIRST match without it
            "SELECT doc_id, "
            "CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) AS alpha_ratio, "
            "CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE) / length(text) AS space_ratio "
            "FROM documents WHERE length(text) > 0",
        ),
        oracle=(
            "SELECT doc_id, "
            "CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) AS alpha_ratio, "
            "CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE) / length(text) AS space_ratio "
            "FROM documents WHERE length(text) > 0"
        ),
        survey_ref="text analysis: quality-score character-class ratios",
    )
)


def _s03(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.llmops.similarity import ann_topk

    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    out = ann_topk(
        emb.filter(F.col("vec_id") != 0),
        [float(x) for x in query],
        k=10,
        planes=10,
    )
    return out.select("vec_id", F.round("cosine", 6).alias("cosine"))


def _s03_oracle() -> str:
    """DuckDB replica of sign-random-projection ANN: the 10 hyperplanes
    (seeded numpy, inlined as literals with exact round-trip reprs) give
    each vector a sign-bit bucket; the probe set {hamming ≤ 1 of the
    query bucket} is equivalently the filter bit_count(xor) ≤ 1; exact
    cosine top-k over the candidates mirrors s01. Generated from the
    same _hyperplanes(64, 10, 42) the Spark path uses."""
    from gfw_data_api_spark.llmops.similarity import _hyperplanes

    hp = _hyperplanes(64, 10, 42)

    def bucket_expr(vec_sql: str) -> str:
        return " + ".join(
            f"(CASE WHEN list_dot_product({vec_sql}, ["
            + ", ".join(repr(float(x)) for x in plane)
            + f"]) >= 0 THEN {1 << i} ELSE 0 END)"
            for i, plane in enumerate(hp)
        )

    cosine = (
        "list_dot_product(CAST(b.embedding AS DOUBLE[]), q.qe) / "
        "(sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), "
        "CAST(b.embedding AS DOUBLE[]))) * sqrt(list_dot_product(q.qe, q.qe)))"
    )
    return (
        "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0), "
        f"b AS (SELECT vec_id, embedding, {bucket_expr('CAST(embedding AS DOUBLE[])')} AS bucket "
        "FROM embeddings WHERE vec_id != 0), "
        f"qb AS (SELECT {bucket_expr('qe')} AS qbucket FROM q) "
        f"SELECT vec_id, round({cosine}, 6) AS cosine "
        "FROM b, q, qb WHERE bit_count(xor(b.bucket::BIGINT, qb.qbucket::BIGINT)) <= 1 "
        f"ORDER BY {cosine} DESC, vec_id LIMIT 10"
    )


_SPECS.append(
    QuerySpec(
        name="s03_ann_lsh_topk",
        spark_fn=_s03,
        oracle=_s03_oracle(),
        survey_ref="similarity search: hyperplane-LSH ANN top-k "
        "(inlined-plane oracle since round 3; recall vs brute force in tests)",
    )
)


def _m01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing on synthetic payloads (text bytes as media)."""
    from gfw_data_api_spark.llmops.multimodal import media_dedup_keys

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    keyed = media_dedup_keys(docs)
    return keyed.select(
        "doc_id",
        F.col("media_key").alias("content_sha256"),
        F.length("payload").cast("bigint").alias("n_bytes"),
    )


_SPECS.append(
    QuerySpec(
        name="m01_media_content_keys",
        spark_fn=_m01,
        oracle=(
            "SELECT doc_id, sha256(text) AS content_sha256, "
            "CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes FROM documents"
        ),
        survey_ref="multimodal: binary payload plumbing + exact media dedup keys",
    )
)


def _i08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 5-way join: revenue by nation within a region —
    the full internal-join surface with broadcast dimension tables."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(nation, supplier.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (1 - F.col("l_discount").cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


_SPECS.append(
    QuerySpec(
        name="i08_multiway_join_revenue",
        spark_fn=_i08,
        oracle=(
            "SELECT n_name, "
            "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue, "
            "count(*) AS n_items "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'ASIA' GROUP BY n_name"
        ),
        survey_ref="I1/I2 generalization: multiway registry-style join, broadcast dims",
    )
)

_SPECS.append(
    _same(
        "orders",
        "SELECT o_orderkey, o_custkey, "
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER "
        "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_3, "
        "CAST(lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS next_key "
        "FROM orders",
        "Q10 window frames: ROWS BETWEEN + lead",
        "q15_window_frame",
    )
)

_SPECS.append(
    _same(
        "supplier",
        "SELECT s_suppkey, s_name, CAST(s_acctbal AS DOUBLE) AS acctbal "
        "FROM supplier WHERE s_suppkey = 3",
        "I7 exact-id lookup (wdpa_pid = :id, crud/geostore.py:281-299)",
        "i07_exact_id_lookup",
    )
)

_SPECS.append(
    _same(
        "lineitem",
        "SELECT l_returnflag, l_linestatus, count(*) AS cnt "
        "FROM lineitem WHERE l_shipdate BETWEEN TIMESTAMP '1994-01-01 00:00:00' "
        "AND TIMESTAMP '1996-12-31 00:00:00' "
        "GROUP BY l_returnflag, l_linestatus HAVING count(*) > 100 "
        "ORDER BY l_returnflag, l_linestatus LIMIT 10",
        "Q3+Q6+Q7+Q9 combined: date BETWEEN (features.py:131-137) through ORDER/LIMIT",
        "q16_date_between_pipeline",
    )
)


def _st01(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.streaming.windows import tumbling_window_counts

    events = load_table(spark, sf_dir, "events")
    out = tumbling_window_counts(events, "1 hour", group_cols=["event_type"])
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


_SPECS.append(
    QuerySpec(
        name="st01_tumbling_window",
        spark_fn=_st01,
        oracle=(
            "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start, "
            "event_type, count(*) AS n_events, "
            "CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value "
            "FROM events GROUP BY 1, 2"
        ),
        survey_ref="streaming: event-time tumbling windows (batch/stream shared code)",
    )
)


def _st02(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.streaming.windows import session_window_stats

    events = load_table(spark, sf_dir, "events")
    out = session_window_stats(events, gap="30 minutes")
    return out.select(
        "user_id",
        F.unix_micros("session_start").alias("session_start_us"),
        "n_events",
        "sum_value",
    )


_SPECS.append(
    QuerySpec(
        name="st02_session_windows",
        spark_fn=_st02,
        oracle=(
            # gaps-and-islands replica of session_window semantics
            "WITH o AS (SELECT user_id, ts, value, "
            "CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL "
            "OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE "
            "THEN 1 ELSE 0 END AS new_sess FROM events), "
            "s AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts "
            "ROWS UNBOUNDED PRECEDING) AS sess FROM o) "
            "SELECT user_id, epoch_us(min(ts)) AS session_start_us, count(*) AS n_events, "
            "CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value "
            "FROM s GROUP BY user_id, sess"
        ),
        survey_ref="streaming: session windows (inactivity gap; F.session_window)",
    )
)


def _s04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine near-dup pairs with label blocking (the verification
    stage LSH/IVF candidates feed into). The pair space is quadratic in
    the BLOCK — the operator enforces a max_block_size bound so an
    unbounded block at corpus scale fails fast instead of launching a
    5·10¹¹-pair join (see llmops/similarity.blocked_cosine_pairs)."""
    from gfw_data_api_spark.llmops.similarity import blocked_cosine_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = blocked_cosine_pairs(emb, threshold=0.35, guard="plan")
    return pairs.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


_SPECS.append(
    QuerySpec(
        name="s04_blocked_cosine_pairs",
        spark_fn=_s04,
        oracle=(
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
            "round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) / "
            "(sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) * "
            "sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) AS cosine "
            "FROM embeddings a JOIN embeddings b "
            "ON a.label = b.label AND a.vec_id < b.vec_id "
            "WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) / "
            "(sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) * "
            "sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) >= 0.35"
        ),
        survey_ref="similarity: exact blocked cosine pair verification stage",
    )
)


def _s05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN through the FULL oracle gate (round-8 conversion of
    the last rows-only similarity entries, VERDICT r7 #3): with
    ``nprobe = nlist`` the probed cells cover the whole corpus, so
    IVF-Flat is PROVABLY equal to brute force regardless of what the
    k-means state looks like — the train/assign/probe/merge machinery
    all still runs (cell pruning included; it just prunes nothing).
    DuckDB recomputes the exact cosine top-k. The genuinely
    approximate partial-probe path keeps its own driver row through
    s08_ivf_recall_gate (planted-recall booleans) and pytest recall
    assertions."""
    from gfw_data_api_spark.llmops import ivf

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = ivf.train_ivf(emb, nlist=8, iters=3)
    indexed = ivf.build_ivf_index(emb, centroids)
    query = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    # r9 (r8-ADVICE): rank the GATE on the ROUNDED cosine with a vec_id
    # tiebreak, identically to the oracle — a pair of vectors agreeing
    # to 6dp but differing at ~1e-7 between the two engines' summation
    # orders must not flip the LIMIT boundary. Fetch 20 through the
    # production path, then deterministically keep 10.
    out = ivf.ivf_topk(
        indexed.filter(F.col("vec_id") != 0), centroids, query, k=20, nprobe=8
    )
    return (
        out.select("vec_id", F.round("cosine", 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


_SPECS.append(
    QuerySpec(
        name="s05_ivf_topk",
        spark_fn=_s05,
        oracle=(
            "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe "
            "FROM embeddings WHERE vec_id = 0) "
            "SELECT e.vec_id, "
            "round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe) / "
            "(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), "
            "CAST(e.embedding AS DOUBLE[]))) * sqrt(list_dot_product(q.qe, q.qe))), 6) "
            "AS cosine "
            "FROM embeddings e, q WHERE e.vec_id != 0 "
            # rank on the ROUNDED cosine + vec_id, same as the gate —
            # unrounded cross-engine 1e-7 noise must not flip the LIMIT
            "ORDER BY round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe) / "
            "(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), "
            "CAST(e.embedding AS DOUBLE[]))) * sqrt(list_dot_product(q.qe, q.qe))), 6) "
            "DESC, e.vec_id LIMIT 10"
        ),
        survey_ref="similarity: IVF-Flat ANN (k-means cells + nprobe "
        "search; llmops/ivf.py) — full-probe arm is exactly brute force, "
        "partial-probe recall gated by s08",
    )
)


_SPECS.append(
    _same(
        "lineitem",
        "SELECT coalesce(l_returnflag, 'ALL') AS flag, "
        "coalesce(l_linestatus, 'ALL') AS status, count(*) AS cnt, "
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty "
        "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)",
        "beyond-reference (SURVEY §2.7): ROLLUP grouping sets — absent in the "
        "reference dialect, free on Catalyst",
        "q17_rollup",
    )
)


def _d06(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.llmops.dedup import winnowing_fingerprints

    return winnowing_fingerprints(
        load_table(spark, sf_dir, "documents"), k=5, window=4, use_md5=True
    )


_SPECS.append(
    QuerySpec(
        name="d06_winnowing_fingerprints",
        spark_fn=_d06,
        oracle=(
            # same winnowing pipeline in SQL: k-gram md5-hashes, min over
            # each 4-window (following rows), distinct per doc
            "WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents), "
            "grams AS (SELECT doc_id, i AS pos, "
            "CAST(concat('0x', substring(md5(array_to_string(t[i:i+4], ' ')), 1, 15)) AS BIGINT) AS h "
            "FROM toks, unnest(range(1, greatest(len(t)-3, 1))) AS u(i)) "
            "SELECT DISTINCT doc_id, "
            "min(h) OVER (PARTITION BY doc_id ORDER BY pos "
            "ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fingerprint "
            "FROM grams"
        ),
        survey_ref="dedup: winnowing document fingerprints (rolling k-gram window minima)",
    )
)


def _ts01(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.operators.timeseries import asof_join

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_event_id"), F.col("value").alias("view_value")
    )
    out = asof_join(
        purchases, views, on="ts", by=["user_id"], values=["view_event_id", "view_value"]
    )
    return out.select(
        "event_id",
        "user_id",
        "view_event_id",
        F.round(F.col("view_value"), 6).alias("view_value"),
    )


_SPECS.append(
    QuerySpec(
        name="ts01_asof_join",
        spark_fn=_ts01,
        oracle=(
            # attribution: each purchase matched to the user's most recent
            # at-or-before view (null when none) — DuckDB native ASOF
            "SELECT p.event_id, p.user_id, v.event_id AS view_event_id, "
            "round(v.value, 6) AS view_value "
            "FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p "
            "ASOF LEFT JOIN (SELECT event_id, user_id, ts, value FROM events "
            "WHERE event_type = 'view') v "
            "ON p.user_id = v.user_id AND p.ts >= v.ts"
        ),
        survey_ref="beyond-reference (SURVEY §2.7): as-of join — union-merge, one shuffle",
    )
)


def _ts02(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.operators.timeseries import interval_join

    events = load_table(spark, sf_dir, "events")
    incidents = events.filter(
        (F.col("event_type") == "error") & (F.col("event_id") % 101 == 0)
    ).select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("inc_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("inc_end"),
    )
    pairs = interval_join(
        events.select("event_id", "ts", "value"),
        incidents,
        ts_col="ts",
        start_col="inc_start",
        end_col="inc_end",
        bucket_s=3600,
    )
    return pairs.groupBy("incident_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


_SPECS.append(
    QuerySpec(
        name="ts02_interval_join",
        spark_fn=_ts02,
        oracle=(
            # overlapping 2h incident windows (no equi key) enriched with
            # every contained event — DuckDB runs the range join natively
            "WITH incidents AS (SELECT event_id AS incident_id, ts AS inc_start, "
            "ts + INTERVAL 2 HOUR AS inc_end FROM events "
            "WHERE event_type = 'error' AND event_id % 101 = 0) "
            "SELECT i.incident_id, count(*) AS n_events, "
            "CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value "
            "FROM incidents i JOIN events e "
            "ON e.ts >= i.inc_start AND e.ts <= i.inc_end "
            "GROUP BY i.incident_id"
        ),
        survey_ref="beyond-reference (SURVEY §2.7): interval/range join via time-grid equi-join",
    )
)


def _ts03(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.operators.timeseries import resample_locf

    events = load_table(spark, sf_dir, "events")
    out = resample_locf(
        events, ["event_type"], ts_col="ts", value_col="value",
        order_col="event_id", unit="hour",
    )
    return out.select(
        "event_type",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        "value",
        "filled",
    )


_SPECS.append(
    QuerySpec(
        name="ts03_resample_locf",
        spark_fn=_ts03,
        oracle=(
            # hourly gap-fill + last-observation-carried-forward per type;
            # values are raw doubles carried through untouched (hash-safe)
            "WITH obs AS (SELECT event_type, date_trunc('hour', ts) AS bucket, "
            "arg_max(value, event_id) AS o FROM events GROUP BY 1, 2), "
            "spans AS (SELECT event_type, min(bucket) AS mn, max(bucket) AS mx "
            "FROM obs GROUP BY 1), "
            "grid AS (SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket "
            "FROM spans), "
            "j AS (SELECT g.event_type, g.bucket, o.o FROM grid g "
            "LEFT JOIN obs o ON o.event_type = g.event_type AND o.bucket = g.bucket) "
            "SELECT event_type, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_ts, "
            "last_value(o IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY bucket "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value, "
            "o IS NULL AS filled FROM j"
        ),
        survey_ref="beyond-reference (SURVEY §2.7): gap-fill resample + LOCF "
        "(TimescaleDB time_bucket_gapfill/locf analog)",
    )
)


def _ts05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap fill (the ts03 grid with the other
    Timescale fill mode). Fractions come from grid ROW POSITIONS — exact
    small integers — so the interpolation is three IEEE double ops in a
    pinned order and the raw doubles hash-match across engines with no
    epoch/timezone arithmetic anywhere."""
    from gfw_data_api_spark.operators.timeseries import resample_interpolate

    events = load_table(spark, sf_dir, "events")
    out = resample_interpolate(
        events, ["event_type"], ts_col="ts", value_col="value",
        order_col="event_id", unit="hour",
    )
    return out.select(
        "event_type",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        "value",
        "filled",
    )


_SPECS.append(
    QuerySpec(
        name="ts05_resample_interpolate",
        spark_fn=_ts05,
        oracle=(
            "WITH obs AS (SELECT event_type, date_trunc('hour', ts) AS bucket, "
            "arg_max(value, event_id) AS o FROM events GROUP BY 1, 2), "
            "spans AS (SELECT event_type, min(bucket) AS mn, max(bucket) AS mx "
            "FROM obs GROUP BY 1), "
            "grid AS (SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket "
            "FROM spans), "
            "j AS (SELECT g.event_type, g.bucket, o.o FROM grid g "
            "LEFT JOIN obs o ON o.event_type = g.event_type AND o.bucket = g.bucket), "
            "j2 AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY bucket) - 1 AS i FROM j), "
            "w AS (SELECT event_type, bucket, o, i, "
            "last_value(o IGNORE NULLS) OVER back AS pv, "
            "last_value(CASE WHEN o IS NOT NULL THEN i END IGNORE NULLS) OVER back AS pi, "
            "first_value(o IGNORE NULLS) OVER fwd AS nv, "
            "first_value(CASE WHEN o IS NOT NULL THEN i END IGNORE NULLS) OVER fwd AS ni "
            "FROM j2 WINDOW "
            "back AS (PARTITION BY event_type ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), "
            "fwd AS (PARTITION BY event_type ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) "
            "SELECT event_type, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_ts, "
            "CASE WHEN o IS NOT NULL THEN o "
            "WHEN pv IS NULL OR nv IS NULL THEN NULL "
            "ELSE pv + (nv - pv) * (CAST(i - pi AS DOUBLE) / CAST(ni - pi AS DOUBLE)) END AS value, "
            "o IS NULL AS filled FROM w"
        ),
        survey_ref="beyond-reference (SURVEY §2.7): gap-fill resample + "
        "linear interpolation (TimescaleDB interpolate analog; "
        "position-based fractions, bit-stable doubles)",
    )
)


_SPECS.append(
    QuerySpec(
        name="q30_filter_clause_breadth",
        spark_fn=_guarded(
            "lineitem",
            "SELECT l_returnflag, "
            "count(*) FILTER (WHERE l_quantity > 25) AS n_big, "
            "count(*) FILTER (WHERE l_discount = 0.0) AS n_nodisc, "
            "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) "
            "FILTER (WHERE l_returnflag = 'R') AS DOUBLE) AS returned_price, "
            "greatest(max(l_tax), max(l_discount)) AS g, "
            "least(min(l_tax), min(l_discount)) AS l, "
            "coalesce(nullif(min(l_linestatus), 'O'), 'fallback') AS status_c "
            "FROM data GROUP BY l_returnflag "
            "ORDER BY l_returnflag NULLS LAST",
        ),
        oracle=(
            "SELECT l_returnflag, "
            "count(*) FILTER (WHERE l_quantity > 25) AS n_big, "
            "count(*) FILTER (WHERE l_discount = 0.0) AS n_nodisc, "
            "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) "
            "FILTER (WHERE l_returnflag = 'R') AS DOUBLE) AS returned_price, "
            "greatest(max(l_tax), max(l_discount)) AS g, "
            "least(min(l_tax), min(l_discount)) AS l, "
            "coalesce(nullif(min(l_linestatus), 'O'), 'fallback') AS status_c "
            "FROM lineitem GROUP BY l_returnflag "
            "ORDER BY l_returnflag NULLS LAST"
        ),
        survey_ref="Q11/Q5 dialect breadth: aggregate FILTER clause "
        "(PostgreSQL syntax the reference's engine accepts), "
        "greatest/least, nullif/coalesce, NULLS LAST ordering — all "
        "through the guarded query path",
    )
)


def _t23(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality signal inside the hard gate (the
    a01/a02 envelope-boolean pattern for implementation-specific
    numbers): odd-residue docs are replaced by repeated-char runs of
    the same length, even docs keep natural text; zlib sizes are
    implementation-specific so the gate pins exact byte lengths, the
    degenerate verdict per residue, and measured-envelope ratio bounds
    (natural ≥ 0.38, repeated ≤ 0.28 at every test SF — thresholds
    0.33 both ways with margin)."""
    from gfw_data_api_spark.llmops.text import compression_signals

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 1, F.repeat(F.lit("a"), F.col("n_chars").cast("int"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    out = compression_signals(planted)
    return out.select(
        "doc_id",
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
        "is_degenerate",
        (F.col("compress_ratio") > 0.0).alias("ratio_positive"),
        (F.col("compress_ratio") < 2.0).alias("ratio_sane"),
    )


_SPECS.append(
    QuerySpec(
        name="t23_compression_ratio",
        spark_fn=_t23,
        oracle=(
            "SELECT doc_id, "
            "CAST(CASE WHEN doc_id % 2 = 1 THEN n_chars "
            "ELSE strlen(text) END AS BIGINT) AS n_bytes, "
            "doc_id % 2 = 1 AS is_degenerate, "
            "TRUE AS ratio_positive, TRUE AS ratio_sane "
            "FROM documents WHERE doc_id < 400"
        ),
        survey_ref="LLM pipeline: compression-ratio quality signal "
        "(llmops/text.py compression_signals — zlib DEFLATE ratio flags "
        "degenerate/templated text; Arrow-batched, no shuffle; "
        "envelope-boolean oracle, thresholds measured per-SF)",
    )
)


_SPECS.append(
    QuerySpec(
        name="q18_percentiles",
        spark_fn=_guarded(
            "lineitem",
            "SELECT l_returnflag, "
            "round(percentile(l_quantity, 0.25), 6) AS q25, "
            "round(percentile(l_quantity, 0.5), 6) AS median_qty, "
            "round(percentile(l_quantity, 0.75), 6) AS q75, "
            "round(percentile(l_extendedprice, 0.9), 6) AS p90_price "
            "FROM lineitem GROUP BY l_returnflag",
            fanout=True,
        ),
        oracle=(
            "SELECT l_returnflag, "
            "round(quantile_cont(l_quantity, 0.25), 6) AS q25, "
            "round(quantile_cont(l_quantity, 0.5), 6) AS median_qty, "
            "round(quantile_cont(l_quantity, 0.75), 6) AS q75, "
            "round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price "
            "FROM lineitem GROUP BY l_returnflag"
        ),
        survey_ref="Q5/Q11: exact interpolated percentiles (PG percentile_cont "
        "pass-through surface), grouped",
    )
)


_SPECS.append(
    _same(
        "lineitem",
        "SELECT coalesce(l_returnflag, 'ALL') AS flag, "
        "coalesce(l_linestatus, 'ALL') AS status, "
        "CAST(grouping(l_returnflag) AS BIGINT) AS g_flag, "
        "CAST(grouping(l_linestatus) AS BIGINT) AS g_status, "
        "count(*) AS cnt, "
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price "
        "FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)",
        "beyond-reference (SURVEY §2.7): CUBE grouping sets + GROUPING() flags",
        "q19_cube_grouping",
        fanout=True,
    )
)


def _st03(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.streaming.windows import sliding_window_counts

    events = load_table(spark, sf_dir, "events")
    out = sliding_window_counts(events, "1 hour", "15 minutes", group_cols=["event_type"])
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


_SPECS.append(
    QuerySpec(
        name="st03_sliding_window",
        spark_fn=_st03,
        oracle=(
            # each event belongs to the 4 slide-aligned windows covering it
            # (duration 1h = 4 × 15min slide); replicate with an explicit
            # 0..3 hop explode off the slide-floor bucket
            "SELECT strftime(time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE, "
            "'%Y-%m-%d %H:%M:%S') AS window_start, "
            "event_type, count(*) AS n_events, "
            "CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value "
            "FROM events, unnest(range(0, 4)) AS t(k) "
            "GROUP BY 1, 2"
        ),
        survey_ref="streaming: sliding/hopping windows (F.window with slide)",
    )
)


def _d07(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.llmops.similarity import embedding_near_dups

    emb = load_table(spark, sf_dir, "embeddings")
    # synthetic embeddings top out near cosine 0.55 (no planted dups), so
    # the gate threshold sits below that to exercise non-empty output
    out = embedding_near_dups(emb, threshold=0.35, planes=4)
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


def _d07_oracle() -> str:
    """DuckDB replica of the LSH-bucketed near-dup pairs: 4 inlined
    hyperplanes give sign-bit buckets (cf. _s03_oracle), candidates are
    within-bucket pairs, verified by exact cosine ≥ 0.35."""
    from gfw_data_api_spark.llmops.similarity import _hyperplanes

    hp = _hyperplanes(64, 4, 42)
    bucket = " + ".join(
        "(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), ["
        + ", ".join(repr(float(x)) for x in plane)
        + f"]) >= 0 THEN {1 << i} ELSE 0 END)"
        for i, plane in enumerate(hp)
    )
    cos = (
        "list_dot_product(a.e, b.e) / "
        "(sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))"
    )
    return (
        f"WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, {bucket} AS bucket "
        "FROM embeddings) "
        f"SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({cos}, 6) AS cosine "
        "FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id "
        f"WHERE {cos} >= 0.35"
    )


_SPECS.append(
    QuerySpec(
        name="d07_embedding_neardups",
        spark_fn=_d07,
        oracle=_d07_oracle(),
        survey_ref="dedup: embedding-cosine near-dup pairs (LSH buckets + "
        "exact verify; inlined-plane oracle since round 3)",
    )
)


_SPECS.append(
    _same(
        "events",
        "SELECT event_type, "
        "CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_value, "
        "CAST(min(value) AS DOUBLE) AS min_value, "
        "CAST(max(value) AS DOUBLE) AS max_value, "
        "count(*) AS n_pixels "
        "FROM events WHERE value > 0 GROUP BY event_type",
        "R3 avg/min/max layer aggregates over the zonal dialect surface "
        "(lambda pass-through, SURVEY §2.4)",
        "r03_zonal_avg_min_max",
    )
)


def _q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.operators.skew import salted_groupby

    li = load_table(spark, sf_dir, "lineitem")
    return salted_groupby(
        li.filter(F.col("l_quantity") > 10),
        keys=["l_returnflag"],
        aggs={
            "cnt": ("count", None),
            "sum_qty": ("sum_decimal", "l_quantity"),
            "min_tax": ("min", "l_tax"),
            "max_price": ("max", "l_extendedprice"),
        },
        salt_buckets=8,
    )


_SPECS.append(
    QuerySpec(
        name="q20_salted_skew_agg",
        spark_fn=_q20,
        oracle=(
            # the salted two-phase plan must be value-identical to the
            # plain aggregation
            "SELECT l_returnflag, count(*) AS cnt, "
            "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, "
            "CAST(min(l_tax) AS DOUBLE) AS min_tax, "
            "CAST(max(l_extendedprice) AS DOUBLE) AS max_price "
            "FROM lineitem WHERE l_quantity > 10 GROUP BY l_returnflag"
        ),
        survey_ref="scale: salted two-phase aggregation for skewed keys "
        "(3 distinct values over 600k rows is the pathological-skew shape)",
    )
)


def _t06(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.llmops.text import tfidf_top_terms

    return tfidf_top_terms(load_table(spark, sf_dir, "documents"), top_k=3)


_SPECS.append(
    QuerySpec(
        name="t06_tfidf_top_terms",
        spark_fn=_t06,
        oracle=(
            # integer-tf ranking keeps membership exact; only the reported
            # score is float (rounded in both engines)
            "WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term "
            "FROM documents), "
            "tf AS (SELECT doc_id, term, count(*) AS tf FROM tok WHERE term != '' GROUP BY 1, 2), "
            "docfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1), "
            "ranked AS (SELECT doc_id, term, tf, "
            "row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, term ASC) AS rank FROM tf) "
            "SELECT r.doc_id, r.term, r.tf, d.df, "
            "round(r.tf * ln((SELECT CAST(count(*) AS DOUBLE) FROM documents) / d.df), 6) AS tfidf, "
            "CAST(r.rank AS BIGINT) AS rank "
            "FROM ranked r JOIN docfreq d USING (term) WHERE r.rank <= 3"
        ),
        survey_ref="text analysis: TF-IDF top terms per document (explode + "
        "two hash aggs + broadcast df join + per-doc window)",
    )
)


def _st04(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.streaming.stateful import first_occurrence

    events = load_table(spark, sf_dir, "events")
    out = first_occurrence(events, key_col="user_id")
    return out.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("first_ts_us"),
    )


_SPECS.append(
    QuerySpec(
        name="st04_stream_first_occurrence",
        spark_fn=_st04,
        oracle=(
            # the stateful operator's batch twin: first event per user
            "SELECT user_id, event_id, event_type, epoch_us(ts) AS first_ts_us "
            "FROM (SELECT *, row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS rn FROM events) WHERE rn = 1"
        ),
        survey_ref="streaming: custom stateful operator (applyInPandasWithState "
        "first-occurrence dedup; bounded per-key state)",
    )
)


_SPECS.append(
    _same(
        "orders",
        "SELECT coalesce(o_orderstatus, 'ALL') AS status, "
        "coalesce(o_orderpriority, 'ALL') AS priority, count(*) AS cnt, "
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total "
        "FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())",
        "beyond-reference (SURVEY §2.7): explicit GROUPING SETS "
        "(disjoint marginals in one pass)",
        "q21_grouping_sets",
    )
)

def _q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DataFrame API, not guarded SQL: the rank-then-filter needs a
    # subquery, which the guarded dialect rejects by design (Q16)
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 200)
    w = Window.partitionBy("l_partkey").orderBy(
        F.desc("l_extendedprice"), "l_orderkey", "l_linenumber"
    )
    return (
        li.select(
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            F.col("l_extendedprice").cast("double").alias("price"),
            F.row_number().over(w).cast("bigint").alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


_SPECS.append(
    QuerySpec(
        name="q22_topk_per_group",
        spark_fn=_q22,
        oracle=(
            "SELECT * FROM (SELECT l_partkey, l_orderkey, l_linenumber, "
            "CAST(l_extendedprice AS DOUBLE) AS price, "
            "CAST(row_number() OVER (PARTITION BY l_partkey "
            "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS BIGINT) AS rk "
            "FROM lineitem WHERE l_partkey < 200) WHERE rk <= 3"
        ),
        survey_ref="Q10 composition: per-group top-k (rank window + filter — "
        "the QUALIFY pattern; internal DataFrame op, Q16 blocks it as user SQL)",
    )
)


def _a01(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The HLL sketch VALUE is engine-specific, so the gated output is the
    # exact count plus a boolean asserting the sketch landed inside its
    # published error envelope (rsd 0.05 default → 3σ ≈ 15%; 5% observed
    # in practice, gate at 10%) — deterministic, hence fully oracle-able
    # while still executing the approximate path.
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("_approx"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("_approx") - F.col("exact_parts"))
                <= 0.10 * F.col("exact_parts")
            ).alias("approx_within_10pct"),
        )
    )


_SPECS.append(
    QuerySpec(
        name="a01_approx_count_distinct",
        spark_fn=_a01,
        oracle=(
            "SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts, "
            "TRUE AS approx_within_10pct FROM lineitem GROUP BY l_returnflag"
        ),
        survey_ref="beyond-reference (SURVEY §2.7): approximate aggregates "
        "(HyperLogLog++ distinct counts gated by their error envelope "
        "beside the exact)",
    )
)


def _a02(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GK-sketch values are engine-specific, so the gated columns are the
    # exact interpolated percentiles plus booleans pinning each sketch
    # inside a rank-error bracket: approx_percentile's guarantee is a
    # rank within ±eps·n of the target (eps = 1/accuracy = 1e-4 at the
    # default), checked as exact-quantile(q−δ) ≤ approx ≤ quantile(q+δ)
    # with δ = 0.01, a 100× margin over the published bound.
    from gfw_data_api_spark.operators.percentiles import grouped_percentiles

    li = load_table(spark, sf_dir, "lineitem", fanout=True)
    approx = grouped_percentiles(
        li,
        ["l_returnflag"],
        {
            "p50_qty": ("l_quantity", 0.5),
            "p90_price": ("l_extendedprice", 0.9),
        },
    )
    exact = grouped_percentiles(
        li,
        ["l_returnflag"],
        {
            "x50_qty": ("l_quantity", 0.5),
            "x90_price": ("l_extendedprice", 0.9),
            "_lo50": ("l_quantity", 0.49),
            "_hi50": ("l_quantity", 0.51),
            "_lo90": ("l_extendedprice", 0.89),
            "_hi90": ("l_extendedprice", 0.91),
        },
        exact=True,
    )
    return (
        approx.join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            F.round("x50_qty", 6).cast("double").alias("x50_qty"),
            F.round("x90_price", 6).cast("double").alias("x90_price"),
            F.col("p50_qty").between(F.col("_lo50"), F.col("_hi50")).alias(
                "p50_in_rank_bracket"
            ),
            F.col("p90_price").between(F.col("_lo90"), F.col("_hi90")).alias(
                "p90_in_rank_bracket"
            ),
        )
    )


_SPECS.append(
    QuerySpec(
        name="a02_approx_percentile",
        spark_fn=_a02,
        oracle=(
            "SELECT l_returnflag, "
            "round(quantile_cont(l_quantity, 0.5), 6) AS x50_qty, "
            "round(quantile_cont(l_extendedprice, 0.9), 6) AS x90_price, "
            "TRUE AS p50_in_rank_bracket, TRUE AS p90_in_rank_bracket "
            "FROM lineitem GROUP BY l_returnflag"
        ),
        survey_ref="beyond-reference (SURVEY §2.7): approx_percentile "
        "sketch default gated by its rank-error bracket beside the exact "
        "opt-in (operators/percentiles.py — the 100 TB path for grouped "
        "quantiles)",
    )
)


def _t07(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.llmops.text import repetition_signals

    return repetition_signals(load_table(spark, sf_dir, "documents"))


_SPECS.append(
    QuerySpec(
        name="t07_repetition_signals",
        spark_fn=_t07,
        oracle=(
            "WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents), "
            "w AS (SELECT doc_id, unnest(t) AS w FROM toks), "
            "wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2), "
            "ws AS (SELECT doc_id, max(c) AS top_word, sum(c) AS n_words FROM wc GROUP BY 1), "
            "bg AS (SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS b FROM toks), "
            "bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2), "
            "bs AS (SELECT doc_id, max(c) AS top_bigram, sum(c) AS n_bigrams FROM bc GROUP BY 1) "
            "SELECT ws.doc_id, CAST(n_words AS BIGINT) AS n_words, "
            "round(top_word / n_words, 6) AS top_word_frac, "
            "round(coalesce(top_bigram / n_bigrams, 0), 6) AS top_bigram_frac "
            "FROM ws LEFT JOIN bs ON ws.doc_id = bs.doc_id"
        ),
        survey_ref="LLM ops: Gopher-style repetition quality signals "
        "(top-word / top-bigram token fractions; llmops/text.py)",
    )
)


def _c01(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.llmops.text import chunk_documents

    return chunk_documents(
        load_table(spark, sf_dir, "documents"), window=64, stride=48
    )


_SPECS.append(
    QuerySpec(
        name="c01_token_chunks",
        spark_fn=_c01,
        oracle=(
            "WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents), "
            "starts AS (SELECT doc_id, t, unnest(range(0, len(t), 48)) AS s FROM toks WHERE len(t) > 0) "
            "SELECT doc_id, CAST(s // 48 AS BIGINT) AS chunk_id, "
            "CAST(len(t[s+1 : s+64]) AS BIGINT) AS chunk_tokens, "
            "array_to_string(t[s+1 : s+64], ' ') AS chunk_text FROM starts"
        ),
        survey_ref="LLM ops: training-sequence chunking — overlapping token "
        "windows, pure narrow ops (llmops/text.py chunk_documents)",
    )
)


def _c02(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.llmops.clean import pii_counts, redact_col

    docs = load_table(spark, sf_dir, "documents")
    # deterministic synthetic PII (the corpus itself is clean): computed
    # identically in the oracle so redaction is exercised for real
    aug = F.concat(
        F.substring("text", 1, 80),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-123-4567 at 192.168."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".1"),
    )
    return docs.select(
        "doc_id", *pii_counts(aug), redact_col(aug).alias("redacted")
    )


_SPECS.append(
    QuerySpec(
        name="c02_pii_redaction",
        spark_fn=_c02,
        oracle=(
            "WITH aug AS (SELECT doc_id, substr(text, 1, 80) || ' contact user' || "
            "CAST(doc_id AS VARCHAR) || '@example.com or 555-123-4567 at 192.168.' || "
            "CAST(doc_id % 256 AS VARCHAR) || '.1' AS a FROM documents) "
            "SELECT doc_id, "
            "CAST(len(regexp_extract_all(a, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email, "
            "CAST(len(regexp_extract_all(a, '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b')) AS BIGINT) AS n_phone, "
            "CAST(len(regexp_extract_all(a, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS n_ip, "
            "regexp_replace(regexp_replace(regexp_replace(a, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
            "'\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '<PHONE>', 'g'), "
            "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g') AS redacted "
            "FROM aug"
        ),
        survey_ref="LLM ops: PII scrubbing — RE2-compatible regex detect + "
        "redact, pure codegen map stage (llmops/clean.py)",
    )
)


def _s06(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.llmops.quantize import quantization_report

    return quantization_report(load_table(spark, sf_dir, "embeddings"))


_SPECS.append(
    QuerySpec(
        name="s06_int8_quantization",
        spark_fn=_s06,
        oracle=(
            "WITH m AS (SELECT vec_id, "
            "list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS absmax "
            "FROM embeddings), "
            "s AS (SELECT vec_id, CASE WHEN absmax = 0 THEN 1.0 ELSE absmax / 127 END AS scale FROM m), "
            "q AS (SELECT e.vec_id, s.scale, "
            "list_transform(e.embedding, x -> floor(CAST(x AS DOUBLE) / s.scale + 0.5)) AS qv, "
            "e.embedding AS emb FROM embeddings e JOIN s ON e.vec_id = s.vec_id) "
            "SELECT vec_id, round(scale, 6) AS scale, "
            "CAST(list_sum(list_transform(qv, v -> v * v)) AS BIGINT) AS qnorm_sq, "
            "round(list_max(list_transform(list_zip(emb, qv), "
            "p -> abs(CAST(p[1] AS DOUBLE) - p[2] * scale))), 6) AS recon_err "
            "FROM q"
        ),
        survey_ref="LLM ops: per-vector symmetric int8 embedding "
        "quantization (FAISS-SQ8 recipe) — scale/||q||2/reconstruction "
        "error, all native higher-order fns (llmops/quantize.py)",
    )
)


def _u01(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.llmops.clean import canonicalize_url_col

    docs = load_table(spark, sf_dir, "documents")
    # deterministic synthetic URLs (corpus has no url column); identical
    # construction in the oracle so normalization is exercised for real
    url = F.concat(
        F.lit("HTTPS://WWW.Example"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".COM:443/Path"),
        (F.col("doc_id") % 3).cast("string"),
        F.lit("/sub?utm_source=feed&id="),
        F.col("doc_id").cast("string"),
        F.lit("&ref=tw#frag"),
    )
    return docs.select(
        "doc_id",
        url.alias("raw_url"),
        canonicalize_url_col(url).alias("canonical_url"),
    )


_SPECS.append(
    QuerySpec(
        name="u01_url_canonicalization",
        spark_fn=_u01,
        oracle=(
            "WITH u AS (SELECT doc_id, 'HTTPS://WWW.Example' || CAST(doc_id % 7 AS VARCHAR) || "
            "'.COM:443/Path' || CAST(doc_id % 3 AS VARCHAR) || '/sub?utm_source=feed&id=' || "
            "CAST(doc_id AS VARCHAR) || '&ref=tw#frag' AS raw_url FROM documents), "
            "c1 AS (SELECT doc_id, raw_url, "
            "lower(regexp_extract(raw_url, '^([a-zA-Z]+://[^/?#]*)', 1)) || "
            "regexp_replace(raw_url, '^[a-zA-Z]+://[^/?#]*', '') AS x FROM u), "
            "c2 AS (SELECT doc_id, raw_url, regexp_replace(x, '#.*$', '') AS x FROM c1), "
            "c3 AS (SELECT doc_id, raw_url, regexp_replace(x, '(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*', '', 'g') AS x FROM c2), "
            "c4 AS (SELECT doc_id, raw_url, "
            "regexp_replace(regexp_replace(x, '^(http://[^/?#]*):80(/|\\?|$)', '\\1\\2'), "
            "'^(https://[^/?#]*):443(/|\\?|$)', '\\1\\2') AS x FROM c3), "
            "c5 AS (SELECT doc_id, raw_url, "
            "regexp_replace(regexp_replace(regexp_replace(x, '\\?&+', '?', 'g'), "
            "'[?&]+$', ''), '&&+', '&', 'g') AS x FROM c4) "
            "SELECT doc_id, raw_url, "
            "regexp_replace(x, '^([a-z]+://[^/?#]+)/$', '\\1') AS canonical_url FROM c5"
        ),
        survey_ref="LLM ops: URL canonicalization for web-corpus dedup "
        "keys — lowercase host, strip fragment/tracking params/default "
        "ports (llmops/clean.py canonicalize_url_col)",
    )
)


def _p01(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.llmops.curate import curate_corpus

    docs = load_table(spark, sf_dir, "documents")
    benchmark = docs.filter(F.col("doc_id") % 17 == 0)
    corpus = docs.filter(F.col("doc_id") % 17 != 0)
    return curate_corpus(
        corpus,
        benchmark,
        keep_langs=("en", "de"),
        min_tokens=10,
        max_top_word_frac=0.2,
    )


_SPECS.append(
    QuerySpec(
        name="p01_curate_corpus",
        spark_fn=_p01,
        oracle=(
            "WITH base AS (SELECT doc_id, text, lang, source, n_chars, "
            "regexp_split_to_array(trim(text), '\\s+') AS t "
            "FROM documents WHERE doc_id % 17 != 0), "
            "tok AS (SELECT *, CAST(len(t) AS BIGINT) AS n_tokens FROM base "
            "WHERE len(t) BETWEEN 10 AND 100000), "
            "wc AS (SELECT doc_id, unnest(t) AS w FROM tok), "
            "topw AS (SELECT doc_id, max(c) AS top FROM "
            "(SELECT doc_id, w, count(*) AS c FROM wc GROUP BY 1, 2) GROUP BY 1), "
            "q AS (SELECT tok.*, round(topw.top / tok.n_tokens, 6) AS top_word_frac "
            "FROM tok JOIN topw USING (doc_id) "
            "WHERE round(topw.top / tok.n_tokens, 6) <= 0.2 AND lang IN ('en', 'de')), "
            "dedup AS (SELECT * EXCLUDE (rk) FROM "
            "(SELECT q.*, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rk FROM q) "
            "WHERE rk = 1), "
            "bgrams AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS g FROM "
            "(SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t "
            "FROM documents WHERE doc_id % 17 = 0) b, "
            "unnest(range(1, greatest(len(t) - 3, 1))) AS u(i)), "
            "cgrams AS (SELECT DISTINCT d.doc_id, array_to_string(d.t[i:i+4], ' ') AS g "
            "FROM dedup d, unnest(range(1, greatest(len(d.t) - 3, 1))) AS u(i)), "
            "flagged AS (SELECT cgrams.doc_id FROM cgrams JOIN bgrams USING (g) "
            "GROUP BY cgrams.doc_id, bgrams.doc_id HAVING count(*) >= 2) "
            "SELECT doc_id, text, lang, source, n_chars, n_tokens, top_word_frac "
            "FROM dedup WHERE doc_id NOT IN (SELECT doc_id FROM flagged)"
        ),
        survey_ref="LLM pipeline FLAGSHIP: composed curation — token-count "
        "+ repetition filters -> language filter -> exact dedup -> "
        "benchmark decontamination, ONE lazy Catalyst plan "
        "(llmops/curate.py)",
    )
)


def _ca01(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.streaming.continuous_agg import ContinuousAggregate

    events = load_table(spark, sf_dir, "events")
    store = tempfile.mkdtemp(prefix="gfw_ca01_")
    ca = ContinuousAggregate(
        os.path.join(store, "rollup"), "1 hour", keys=["event_type"]
    )
    # three incremental refreshes must equal one direct aggregation
    for lo, hi in ((0, 3000), (3000, 7000), (7000, 1 << 60)):
        ca.refresh(
            spark, events.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
        )
    return ca.read(spark).select(
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        "event_type",
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
    )


_SPECS.append(
    QuerySpec(
        name="ca01_continuous_aggregate",
        spark_fn=_ca01,
        oracle=(
            # the incrementally-maintained rollup must match the direct
            # one-shot aggregation bit-for-bit (DECIMAL partials merge
            # exactly regardless of slice boundaries)
            "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_start, "
            "event_type, count(*) AS n_events, "
            "round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value "
            "FROM events GROUP BY 1, 2"
        ),
        survey_ref="beyond-reference: continuous aggregate / hypertable rollup "
        "(incremental refresh rewrites only affected partitions)",
    )
)


def _d08(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.llmops.decontaminate import contamination_matches

    docs = load_table(spark, sf_dir, "documents")
    benchmark = docs.filter(F.col("doc_id") % 17 == 0)
    corpus = docs.filter(F.col("doc_id") % 17 != 0)
    return contamination_matches(corpus, benchmark, shingle_n=5, min_shared=2)


_SPECS.append(
    QuerySpec(
        name="d08_benchmark_decontamination",
        spark_fn=_d08,
        oracle=(
            # same split + inverted 5-gram index, DuckDB-side
            "WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents), "
            "grams AS (SELECT DISTINCT doc_id, "
            "array_to_string(t[i:i+4], ' ') AS g "
            "FROM toks, unnest(range(1, greatest(len(t)-3, 1))) AS u(i)), "
            "pairs AS (SELECT c.doc_id AS corpus_id, b.doc_id AS bench_id, count(*) AS n_shared "
            "FROM (SELECT * FROM grams WHERE doc_id % 17 != 0) c "
            "JOIN (SELECT * FROM grams WHERE doc_id % 17 = 0) b USING (g) "
            "GROUP BY 1, 2) "
            "SELECT corpus_id, bench_id, n_shared FROM pairs WHERE n_shared >= 2"
        ),
        survey_ref="LLM pipeline: benchmark decontamination (cross-set n-gram "
        "overlap via the inverted shingle index)",
    )
)


def _d09(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.llmops.components import dedup_clusters
    from gfw_data_api_spark.llmops.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.12)
    return dedup_clusters(docs, pairs)


_SPECS.append(
    QuerySpec(
        name="d09_dedup_clusters",
        spark_fn=_d09,
        oracle=(
            # d03's exact-Jaccard pair graph, resolved to components via
            # recursive min-label reachability (graph is tiny at sf0.01;
            # the Spark side uses the O(log n) alternating algorithm)
            "WITH RECURSIVE "
            "toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents), "
            "sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t)-1), "
            "i -> array_to_string(t[i:i+2], ' ')))) AS s FROM toks), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), "
            "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared "
            "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2), "
            "pairs AS (SELECT id_a, id_b FROM inter "
            "JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b "
            "WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.12), "
            "edges AS (SELECT id_a AS a, id_b AS b FROM pairs "
            "UNION SELECT id_b, id_a FROM pairs), "
            "reach(node, lbl) AS (SELECT a, a FROM edges "
            "UNION SELECT e.a, r.lbl FROM edges e JOIN reach r ON r.node = e.b), "
            "comp AS (SELECT node, min(lbl) AS c FROM reach GROUP BY node) "
            "SELECT d.doc_id, COALESCE(comp.c, d.doc_id) AS component, "
            "COALESCE(comp.c, d.doc_id) = d.doc_id AS keep "
            "FROM documents d LEFT JOIN comp ON comp.node = d.doc_id"
        ),
        survey_ref="LLM pipeline: near-dup pair graph → dedup clusters "
        "(alternating large-star/small-star connected components)",
    )
)


def _t07(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.llmops.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    return hash_split(docs, eval_fraction=0.1, seed=42).select("doc_id", "split")


_SPECS.append(
    QuerySpec(
        name="t08_hash_split",
        spark_fn=_t07,
        oracle=(
            # the md5-bucket split is engine-portable by design: DuckDB
            # derives the identical per-document assignment
            "SELECT doc_id, CASE WHEN "
            "('0x' || substr(md5(CAST(doc_id AS VARCHAR) || chr(31) || '42'), 1, 15))::BIGINT "
            "% 1000 < 100 THEN 'eval' ELSE 'train' END AS split FROM documents"
        ),
        survey_ref="LLM pipeline: reproducible hash-bucket train/eval split "
        "(zero-shuffle, append-stable)",
    )
)


def _t08(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.llmops.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        docs, "lang", {"en": 0.5, "de": 0.25}, default_fraction=0.1, seed=7
    ).select("doc_id", "lang")


_SPECS.append(
    QuerySpec(
        name="t09_stratified_sample",
        spark_fn=_t08,
        oracle=(
            "SELECT doc_id, lang FROM documents WHERE "
            "('0x' || substr(md5(CAST(doc_id AS VARCHAR) || chr(31) || lang || chr(31) || '7'), 1, 15))::BIGINT "
            "% 1000 < CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 250 ELSE 100 END"
        ),
        survey_ref="LLM pipeline: deterministic per-stratum corpus downsampling "
        "(single narrow filter at any scale)",
    )
)


def _t10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.llmops.text import bigram_lm_scores

    docs = load_table(spark, sf_dir, "documents")
    return bigram_lm_scores(docs).select(
        "doc_id", "n_bigrams", "df_sum", "avg_bigram_df"
    )


_SPECS.append(
    QuerySpec(
        name="t10_bigram_lm",
        spark_fn=_t10,
        oracle=(
            # corpus-trained bigram frequencies; integer sums + one final
            # division keep the hash deterministic (avg_logprob, a float
            # aggregation, is test-verified instead — see test_llmops)
            "WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents), "
            "occ AS (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS bg "
            "FROM toks, unnest(range(1, len(t))) AS u(i)), "
            "bgc AS (SELECT bg, count(*) AS c2 FROM occ GROUP BY bg) "
            "SELECT doc_id, count(*) AS n_bigrams, "
            "CAST(sum(c2) AS BIGINT) AS df_sum, "
            "CAST(sum(c2) AS DOUBLE) / count(*) AS avg_bigram_df "
            "FROM occ JOIN bgc USING (bg) GROUP BY doc_id"
        ),
        survey_ref="LLM pipeline: corpus-trained bigram LM quality scoring "
        "(CCNet/Gopher-style typicality filter)",
    )
)


def _d10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.llmops.clean import remove_repeated_segments

    docs = load_table(spark, sf_dir, "documents")
    return remove_repeated_segments(docs, segment_tokens=3, max_count=4)


_SPECS.append(
    QuerySpec(
        name="d10_repeated_segment_removal",
        spark_fn=_d10,
        oracle=(
            # 3-token non-overlapping segments; any segment seen >4 times
            # corpus-wide is dropped from every document
            "WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents), "
            "segs AS (SELECT doc_id, i, array_to_string(t[i:i+2], ' ') AS s "
            "FROM toks, unnest(range(1, greatest(len(t), 1) + 1, 3)) AS u(i)), "
            "counts AS (SELECT s, count(*) AS c FROM segs GROUP BY s), "
            "kept AS (SELECT doc_id, i, s FROM segs JOIN counts USING (s) WHERE c <= 4), "
            "built AS (SELECT doc_id, string_agg(s, ' ' ORDER BY i) AS cleaned "
            "FROM kept GROUP BY doc_id) "
            "SELECT d.doc_id, COALESCE(built.cleaned, '') AS cleaned "
            "FROM documents d LEFT JOIN built USING (doc_id)"
        ),
        survey_ref="LLM pipeline: corpus-level repeated-segment removal "
        "(C4/MassiveText line-dedup pass, token-window segmentation)",
    )
)


def _e04(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.operators.merge import merge_upsert

    orders = load_table(spark, sf_dir, "orders")
    base = orders.selectExpr(
        "o_orderkey",
        "CAST(o_totalprice AS DECIMAL(18,2)) AS price",
        "o_orderstatus AS status",
    )
    updates = orders.filter("o_orderkey % 7 = 0").selectExpr(
        "o_orderkey",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DECIMAL(18,2)) AS price",
        "'U' AS status",
    )
    # decimal arithmetic keeps the merge exact; surface as DOUBLE for the
    # cross-engine compare (2-decimal values are float-exact)
    return merge_upsert(base, updates, "o_orderkey").selectExpr(
        "o_orderkey", "CAST(price AS DOUBLE) AS price", "status"
    )


_SPECS.append(
    QuerySpec(
        name="e04_merge_upsert",
        spark_fn=_e04,
        oracle=(
            # identical latest-wins reduction: updates (pri 1) beat base (pri 0)
            "WITH base AS (SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price, "
            "o_orderstatus AS status, 0 AS pri FROM orders), "
            "upd AS (SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DECIMAL(18,2)) AS price, "
            "'U' AS status, 1 AS pri FROM orders WHERE o_orderkey % 7 = 0), "
            "u AS (SELECT * FROM base UNION ALL SELECT * FROM upd), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY pri DESC) AS rn FROM u) "
            "SELECT o_orderkey, CAST(price AS DOUBLE) AS price, status FROM r WHERE rn = 1"
        ),
        survey_ref="ETL: keyed merge/upsert (ON CONFLICT DO UPDATE analog; "
        "operators/merge.py latest-wins window)",
    )
)


def _t11(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.llmops.mixture import domain_mixture_stats

    docs = load_table(spark, sf_dir, "documents")
    return domain_mixture_stats(docs, "source", "text")


_SPECS.append(
    QuerySpec(
        name="t11_domain_mixture",
        spark_fn=_t11,
        oracle=(
            "WITH tok AS (SELECT source AS domain, "
            "CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS nt FROM documents), "
            "agg AS (SELECT domain, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens "
            "FROM tok GROUP BY domain), "
            "tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total, count(*) AS nd FROM agg) "
            "SELECT domain, n_docs, n_tokens, "
            "CAST(n_tokens AS DOUBLE) / total AS token_frac, "
            "(CAST(total AS DOUBLE) / nd) / n_tokens AS sample_weight "
            "FROM agg, tot"
        ),
        survey_ref="LLM pipeline: domain-mixture measurement + resampling "
        "weights (The Pile / DoReMi recipe; llmops/mixture.py)",
    )
)


def _w01(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.llmops.importance import hashed_count_features

    docs = load_table(spark, sf_dir, "documents", fanout=True)
    return hashed_count_features(
        docs, F.col("lang") == "en", num_buckets=256
    )


_SPECS.append(
    QuerySpec(
        name="w01_importance_weights",
        spark_fn=_w01,
        oracle=(
            # engine-exact integer core of the DSIR importance score: the
            # md5-bucket assignment is reproduced bit-for-bit (cf. t08)
            "WITH tok AS (SELECT doc_id, lang, "
            "('0x' || substr(md5(t.tok), 1, 15))::BIGINT % 256 AS bucket "
            "FROM documents, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t(tok)), "
            "raw AS (SELECT bucket, count(*) AS rc FROM tok GROUP BY bucket), "
            "tgt AS (SELECT bucket, count(*) AS tc FROM tok WHERE lang = 'en' GROUP BY bucket), "
            "j AS (SELECT tok.doc_id, raw.rc, COALESCE(tgt.tc, 0) AS tc "
            "FROM tok JOIN raw USING (bucket) LEFT JOIN tgt USING (bucket)) "
            "SELECT doc_id, count(*) AS n_tokens, "
            "CAST(sum(tc) AS BIGINT) AS sum_target, CAST(sum(rc) AS BIGINT) AS sum_raw, "
            "(CAST(1 AS DOUBLE) + CAST(sum(tc) AS BIGINT)) / (CAST(1 AS DOUBLE) + CAST(sum(rc) AS BIGINT)) AS target_ratio "
            "FROM j GROUP BY doc_id"
        ),
        survey_ref="LLM pipeline: DSIR hashed-ngram importance weighting "
        "(llmops/importance.py; log-ratio variant test-verified)",
    )
)


def _b01(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.llmops.bpe import char_pair_stats

    docs = load_table(spark, sf_dir, "documents", fanout=True)
    return char_pair_stats(docs, "text", top_k=200)


_SPECS.append(
    QuerySpec(
        name="b01_bpe_pair_stats",
        spark_fn=_b01,
        oracle=(
            # range(1, length) = positions 1..length-1 (start of each pair)
            "WITH pairs AS (SELECT substr(text, CAST(g.i AS INTEGER), 2) AS pair "
            "FROM documents, unnest(range(1, length(text))) AS g(i) "
            "WHERE length(text) >= 2) "
            "SELECT pair, count(*) AS cnt FROM pairs GROUP BY pair "
            "ORDER BY cnt DESC, pair ASC LIMIT 200"
        ),
        survey_ref="LLM pipeline: BPE merge-candidate pair counting "
        "(tokenizer training inner loop; llmops/bpe.py)",
    )
)


def _st05(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.streaming.enrich import stream_static_enrich

    events = load_table(spark, sf_dir, "events")
    # static dimension: per-type average value (DECIMAL-exact sum, one
    # float division — engine-portable; same convention as st01/st02)
    dim = events.groupBy("event_type").agg(
        (
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
            / F.count("*")
        ).alias("type_avg")
    )
    return stream_static_enrich(events, dim, "event_type").select(
        "event_id", "event_type", "value", "type_avg"
    )


_SPECS.append(
    QuerySpec(
        name="st05_stream_static_enrich",
        spark_fn=_st05,
        oracle=(
            "WITH dim AS (SELECT event_type, "
            "CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS type_avg "
            "FROM events GROUP BY event_type) "
            "SELECT e.event_id, e.event_type, e.value, d.type_avg "
            "FROM events e LEFT JOIN dim d USING (event_type)"
        ),
        survey_ref="streaming: stream-static broadcast enrichment join "
        "(streaming/enrich.py; stream==batch asserted in tests)",
    )
)


def _s07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ADC top-k through the FULL oracle gate (round-8 conversion,
    VERDICT r7 #3 — the t26 envelope pattern): snap every vector to its
    PQ reconstruction (decode(encode(x)) — each subvector becomes an
    exact codepoint), take the query from the snapped corpus, and ADC
    becomes PROVABLY exact: the per-subspace table entry for a
    codepoint IS its squared distance, so Σ_j table[j][code_j] equals
    the true squared L2 between query and snapped vector, whatever the
    trained codebooks look like. The envelope pins the provable facts:
    k results, the query's own clone at rank 1 with distance exactly
    0.0 (the code-0 table entries are (q_sub − q_sub)² = 0), and
    |ADC − exact| < 1e-9 on every returned row (summation-order ulps
    only). DuckDB recomputes the envelope from the planting rule as
    constants. The real-data recall path stays gated by s10 and
    pytest; the full encode → ADC-scan → TakeOrdered machinery runs
    here unchanged."""
    import numpy as np

    from gfw_data_api_spark.llmops.pq import encode_pq, pq_topk, train_pq

    emb = load_table(spark, sf_dir, "embeddings", fanout=True)
    books = train_pq(emb, m=8, ksub=16, seed=42).astype(np.float64)
    m, ksub, dsub = books.shape
    enc = encode_pq(emb, books)
    blit = F.array(
        *[
            F.array(
                *[
                    F.array(*[F.lit(float(v)) for v in books[j][c]])
                    for c in range(ksub)
                ]
            )
            for j in range(m)
        ]
    )
    snap_col = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda j: F.element_at(
                F.element_at(blit, j + 1),
                F.element_at(F.col("pq_codes"), j + 1) + 1,
            ),
        )
    )
    # the snapped row KEEPS its pq_codes: re-encoding a snapped vector
    # provably returns the same code (each subvector IS a codebook entry,
    # so its nearest entry is itself at distance 0; duplicate entries
    # would yield an identical ADC table row either way), so the second
    # full-corpus encode pass the old ``encode_pq(snapped, books)`` paid
    # was a no-op Arrow round-trip (optimization round 13, guide §4.1 —
    # ArrowEvalPython 2→1 in the plan). The encode machinery under test
    # still runs: ``enc`` above is the production encode of the corpus.
    snapped = enc.select("vec_id", "pq_codes", snap_col.alias("embedding"))
    query = [
        float(v)
        for v in snapped.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    # carry the snapped embedding through the TakeOrdered (k=10 rows)
    # instead of re-joining ``snapped`` by id — the join re-ran the
    # whole encode+snap subtree (a full-corpus Arrow pass) just to
    # fetch 10 winners' vectors (optimization round 12, guide §4.1)
    out = pq_topk(snapped, books, query, k=10, carry_cols=["embedding"])
    qlit = F.array(*[F.lit(v) for v in query])
    exact = F.aggregate(
        F.zip_with(F.col("embedding"), qlit, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    rows = out.select("vec_id", "adc_dist", exact.alias("exact_dist"))
    # top-1 facts fold into the same aggregation (struct min is the
    # (dist, id) lexicographic rank-1) — one agg, no 1-row join
    best = F.min(F.struct("adc_dist", "vec_id"))
    return rows.agg(
        F.count("*").cast("bigint").alias("n_results"),
        (
            F.max(F.abs(F.col("adc_dist") - F.col("exact_dist")))
            < F.lit(1e-9)
        ).alias("adc_exact_on_snapped"),
        (best.getField("vec_id") == 0).alias("top1_id_zero"),
        (best.getField("adc_dist") == 0.0).alias("top1_dist_zero"),
    )


_SPECS.append(
    QuerySpec(
        name="s07_pq_topk",
        spark_fn=_s07,
        oracle=(
            "SELECT CAST(10 AS BIGINT) AS n_results, "
            "TRUE AS adc_exact_on_snapped, "
            "TRUE AS top1_id_zero, TRUE AS top1_dist_zero"
        ),
        survey_ref="similarity: product-quantization ADC top-k "
        "(llmops/pq.py; FAISS PQ recipe, 8-byte codes) — snapped-corpus "
        "envelope proves ADC equals exact distance on codepoints",
    )
)


def _e05(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.operators.scd import scd2_history

    events = load_table(spark, sf_dir, "events")
    return scd2_history(
        events, "user_id", "event_type", ts_col="ts", tiebreak_col="event_id"
    )


_SPECS.append(
    QuerySpec(
        name="e05_scd2_intervals",
        spark_fn=_e05,
        oracle=(
            # identical gaps-and-islands collapse: change flag → running
            # group id → per-run interval; event_id breaks ts ties
            "WITH flagged AS (SELECT user_id, event_type, ts, event_id, "
            "CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type "
            "THEN 1 ELSE 0 END AS chg "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "grouped AS (SELECT *, sum(chg) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS grp "
            "FROM flagged), "
            "runs AS (SELECT user_id, grp, event_type, min(ts) AS valid_from, "
            "count(*) AS n_events FROM grouped GROUP BY user_id, grp, event_type) "
            "SELECT user_id, event_type, valid_from, "
            "lead(valid_from) OVER (PARTITION BY user_id ORDER BY grp) AS valid_to, "
            "n_events FROM runs"
        ),
        survey_ref="ETL: SCD-2 validity-interval builder (gaps-and-islands; "
        "operators/scd.py; feeds the ts01 as-of join)",
    )
)


def _st06(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.streaming.join import stream_stream_interval_join

    events = load_table(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    joined = stream_stream_interval_join(
        views, purchases, keys="user_id", upper="30 minutes"
    )
    return joined.select(
        "user_id",
        F.col("event_id").alias("view_event_id"),
        F.col("right_event_id").alias("purchase_event_id"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        F.date_format("right_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
    )


_SPECS.append(
    QuerySpec(
        name="st06_stream_stream_join",
        spark_fn=_st06,
        oracle=(
            "SELECT a.user_id, a.event_id AS view_event_id, "
            "b.event_id AS purchase_event_id, "
            "strftime(a.ts, '%Y-%m-%d %H:%M:%S') AS view_ts, "
            "strftime(b.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts "
            "FROM events a JOIN events b ON a.user_id = b.user_id "
            "AND a.event_type = 'view' AND b.event_type = 'purchase' "
            "AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE"
        ),
        survey_ref="streaming: watermarked stream-stream interval join "
        "(streaming/join.py; batch path is the oracle twin)",
    )
)


def _t12(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.llmops.text import gopher_quality_rules

    docs = load_table(spark, sf_dir, "documents")
    out = gopher_quality_rules(docs, min_words=30)
    return out.select(
        "doc_id",
        "n_words",
        F.round("mean_word_chars", 6).alias("mean_word_chars"),
        F.round("symbol_word_ratio", 6).alias("symbol_word_ratio"),
        F.round("alpha_word_fraction", 6).alias("alpha_word_fraction"),
        "stopword_hits",
        F.col("keep").cast("int").alias("keep"),
    )


_SPECS.append(
    QuerySpec(
        name="t12_gopher_rules",
        spark_fn=_t12,
        oracle=(
            # keep must mirror EVERY Spark rule, including the line-level
            # bullet/ellipsis caps — omitting them is a latent gate break
            # the moment a fixture document trips one
            "WITH sig AS (SELECT doc_id, "
            "len(regexp_split_to_array(trim(text), '\\s+')) AS n_words, "
            "len(regexp_split_to_array(text, '\\n')) AS n_lines, "
            "length(regexp_replace(text, '\\s', '', 'g')) AS nonspace, "
            "len(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS symbol_hits, "
            "len(list_filter(regexp_split_to_array(text, '\\n'), "
            "l -> regexp_matches(trim(l), '^([•‣▪-]|\\*)\\s'))) AS bullet_lines, "
            "len(list_filter(regexp_split_to_array(text, '\\n'), "
            "l -> regexp_matches(trim(l), '(\\.\\.\\.|…)$'))) AS ellipsis_lines, "
            "len(list_filter(regexp_split_to_array(trim(text), '\\s+'), "
            "t -> regexp_matches(t, '[A-Za-z]'))) AS alpha_words, "
            "len(list_distinct(list_filter(list_transform("
            "regexp_split_to_array(trim(text), '\\s+'), t -> lower(t)), "
            "t -> t IN ('the','be','to','of','and','that','have','with')))) AS stopword_hits "
            "FROM documents) "
            "SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, "
            "round(CAST(nonspace AS DOUBLE) / greatest(n_words, 1), 6) AS mean_word_chars, "
            "round(CAST(symbol_hits AS DOUBLE) / greatest(n_words, 1), 6) AS symbol_word_ratio, "
            "round(CAST(alpha_words AS DOUBLE) / greatest(n_words, 1), 6) AS alpha_word_fraction, "
            "CAST(stopword_hits AS BIGINT) AS stopword_hits, "
            "CAST(n_words >= 30 AND n_words <= 100000 "
            "AND CAST(nonspace AS DOUBLE) / greatest(n_words, 1) >= 3.0 "
            "AND CAST(nonspace AS DOUBLE) / greatest(n_words, 1) <= 10.0 "
            "AND CAST(symbol_hits AS DOUBLE) / greatest(n_words, 1) <= 0.1 "
            "AND CAST(bullet_lines AS DOUBLE) / greatest(n_lines, 1) <= 0.9 "
            "AND CAST(ellipsis_lines AS DOUBLE) / greatest(n_lines, 1) <= 0.3 "
            "AND CAST(alpha_words AS DOUBLE) / greatest(n_words, 1) >= 0.8 "
            "AND stopword_hits >= 2 AS INTEGER) AS keep "
            "FROM sig"
        ),
        survey_ref="LLM pipeline: Gopher rule-battery quality filter "
        "(Rae et al. 2021 §A1.1; llmops/text.py gopher_quality_rules)",
    )
)


def _t13(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.llmops.dedup import ngram_containment_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_containment_pairs(docs, shingle_n=3, threshold=0.2)
    return pairs.select(
        "id_a",
        "id_b",
        F.round("containment", 6).alias("containment"),
        F.round("containment_a", 6).alias("containment_a"),
        F.round("containment_b", 6).alias("containment_b"),
    )


_SPECS.append(
    QuerySpec(
        name="t13_containment_pairs",
        spark_fn=_t13,
        oracle=(
            "WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents), "
            "sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t)-1), "
            "i -> array_to_string(t[i:i+2], ' ')))) AS s FROM toks), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), "
            "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared "
            "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT id_a, id_b, "
            "round(CAST(shared AS DOUBLE) / least(sa.n, sb.n), 6) AS containment, "
            "round(CAST(shared AS DOUBLE) / sa.n, 6) AS containment_a, "
            "round(CAST(shared AS DOUBLE) / sb.n, 6) AS containment_b "
            "FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b "
            "WHERE CAST(shared AS DOUBLE) / least(sa.n, sb.n) >= 0.2"
        ),
        survey_ref="dedup: exact n-gram containment pairs (Broder containment; "
        "asymmetric quote/subset detection, llmops/dedup.py)",
    )
)


def _w02(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.llmops.mixture import temperature_mixture_weights

    docs = load_table(spark, sf_dir, "documents", fanout=True)
    out = temperature_mixture_weights(docs, domain_col="lang", alpha=0.3)
    return out.select(
        "domain",
        "n_docs",
        "n_tokens",
        F.round("token_frac", 6).alias("token_frac"),
        F.round("temp_frac", 6).alias("temp_frac"),
        F.round("sample_weight", 6).alias("sample_weight"),
    )


_SPECS.append(
    QuerySpec(
        name="w02_temperature_mixture",
        spark_fn=_w02,
        oracle=(
            "WITH agg AS (SELECT lang AS domain, count(*) AS n_docs, "
            "CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS n_tokens "
            "FROM documents GROUP BY lang), "
            "tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM agg), "
            "fr AS (SELECT domain, n_docs, n_tokens, "
            "CAST(n_tokens AS DOUBLE) / total AS token_frac FROM agg, tot), "
            "z AS (SELECT sum(pow(token_frac, 0.3)) AS z FROM fr) "
            "SELECT domain, n_docs, n_tokens, round(token_frac, 6) AS token_frac, "
            "round(pow(token_frac, 0.3) / z, 6) AS temp_frac, "
            "round((pow(token_frac, 0.3) / z) / token_frac, 6) AS sample_weight "
            "FROM fr, z"
        ),
        survey_ref="LLM pipeline: temperature-scaled domain mixture "
        "(mBERT/XLM-R exponential smoothing; llmops/mixture.py)",
    )
)


def _d11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup through the FULL oracle gate (round-8 conversion,
    VERDICT r7 #3 — the d15 planting pattern applied to the operator's
    own output): every vec_id with ``vec_id % 10 == 7`` gets its
    embedding REPLACED by the embedding of ``vec_id - 7`` (an exact
    duplicate of a decile anchor). Identical vectors land in the same
    k-means cell no matter what the centroids are (identical rows →
    identical argmin), their cosine is 1.0, and every other pair in
    this corpus tops out near 0.55 (cf. d07) — so at threshold 0.99
    the removal set is EXACTLY the planted clones, and the keep rule
    (lowest id survives) makes the survivor set closed-form:
    ``vec_id % 10 != 7``. DuckDB recomputes it from the planting rule.
    The real-threshold behavior keeps its envelope through
    d15_semantic_dedup_envelope and the exact-twin recall assertions
    in test_llmops.py."""
    from gfw_data_api_spark.llmops.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings", fanout=True)
    anchors = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 7).alias("vec_id"),
        F.col("embedding").alias("clone_embedding"),
    )
    planted = emb.join(anchors, "vec_id", "left").select(
        "vec_id",
        F.coalesce("clone_embedding", "embedding").alias("embedding"),
        "label",
    )
    survivors = semantic_dedup(planted, threshold=0.99, nlist=8)
    return survivors.select("vec_id", F.col("label").cast("int").alias("label"))


_SPECS.append(
    QuerySpec(
        name="d11_semantic_dedup",
        spark_fn=_d11,
        oracle=(
            "SELECT vec_id, CAST(label AS INTEGER) AS label "
            "FROM embeddings WHERE vec_id % 10 <> 7"
        ),
        survey_ref="dedup: SemDeDup embedding-cluster near-dup removal "
        "(Abbas et al. 2023; llmops/similarity.py semantic_dedup) — "
        "planted exact-clone clusters make the survivor set closed-form",
    )
)


def _q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
        )
        .select(
            "l_linestatus",
            F.col("A").alias("qty_a"),
            F.col("N").alias("qty_n"),
            F.col("R").alias("qty_r"),
        )
    )


_SPECS.append(
    QuerySpec(
        name="q23_pivot_conditional_agg",
        spark_fn=_q23,
        oracle=(
            "SELECT l_linestatus, "
            "CAST(sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_a, "
            "CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_n, "
            "CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_r "
            "FROM lineitem GROUP BY l_linestatus"
        ),
        survey_ref="query plane: PIVOT / conditional aggregation "
        "(explicit value list — no extra distinct-scan pass)",
    )
)


def _q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.operators.skew import skew_hybrid_join

    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    # hot keys pinned (the production path: yesterday's stats); the
    # union of broadcast-hot + shuffled-cold must equal the plain join
    joined = skew_hybrid_join(li, supp, keys="l_suppkey", hot_keys=[1, 2, 3])
    return joined.groupBy("s_name").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
    )


_SPECS.append(
    QuerySpec(
        name="q24_skew_hybrid_join",
        spark_fn=_q24,
        oracle=(
            "SELECT s_name, count(*) AS n_items, "
            "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty "
            "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
            "GROUP BY s_name"
        ),
        survey_ref="scale: skew-split hybrid join (hot keys broadcast, cold "
        "keys shuffled; operators/skew.py skew_hybrid_join)",
    )
)


def _q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.operators.linkage import blocked_fuzzy_match

    # fanout: the verify stage (native levenshtein inside the block
    # join) is compute-bound and the single-row-group parquet would
    # otherwise run it as ONE task — the probe side of the broadcast
    # block join keeps the scan's partitioning, so the repartition buys
    # full-core parallelism (guide §2.5 input skew / §6 split sizing)
    supp = load_table(spark, sf_dir, "supplier", fanout=True)
    return blocked_fuzzy_match(supp, "s_suppkey", "s_name", max_distance=1).select(
        "id_a", "id_b", "distance"
    )


_SPECS.append(
    QuerySpec(
        name="q25_blocked_fuzzy_match",
        spark_fn=_q25,
        oracle=(
            # identical block-then-verify semantics: normalized 2-prefix +
            # length/4 band blocking, exact Levenshtein within blocks
            "WITH k AS (SELECT s_suppkey AS id, s_name AS t, "
            "substr(lower(regexp_replace(s_name, '[^A-Za-z0-9]', '', 'g')), 1, 2) "
            "|| '|' || CAST(CAST(floor(length(lower(regexp_replace(s_name, "
            "'[^A-Za-z0-9]', '', 'g'))) / 4.0) AS INT) AS VARCHAR) AS bk "
            "FROM supplier) "
            "SELECT a.id AS id_a, b.id AS id_b, "
            "CAST(levenshtein(a.t, b.t) AS INT) AS distance "
            "FROM k a JOIN k b ON a.bk = b.bk AND a.id < b.id "
            "WHERE levenshtein(a.t, b.t) <= 1"
        ),
        survey_ref="record linkage: blocked fuzzy match (block+verify, native "
        "levenshtein; operators/linkage.py)",
    )
)


def _dq01(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.operators.quality import (
        audit,
        check_accepted_values,
        check_not_null,
        check_range,
    )

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return audit(
        li,
        checks=[
            check_not_null("l_orderkey"),
            check_range("l_quantity", 1, 50),
            check_range("l_discount", 0.0, 0.05),  # deliberately tight: real violations
            check_accepted_values("l_returnflag", ["A", "N", "R"]),
        ],
        unique_keys=[["l_orderkey", "l_linenumber"]],
        foreign_keys=[(["l_orderkey"], orders, ["o_orderkey"])],
    )


_SPECS.append(
    QuerySpec(
        name="dq01_constraint_audit",
        spark_fn=_dq01,
        oracle=(
            "WITH t AS (SELECT count(*) AS total, "
            "sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS c0, "
            "sum(CASE WHEN l_quantity IS NOT NULL AND (l_quantity < 1 OR l_quantity > 50) THEN 1 ELSE 0 END) AS c1, "
            "sum(CASE WHEN l_discount IS NOT NULL AND (l_discount < 0.0 OR l_discount > 0.05) THEN 1 ELSE 0 END) AS c2, "
            "sum(CASE WHEN l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS c3 "
            "FROM lineitem), "
            "u AS (SELECT COALESCE(sum(n - 1), 0) AS v FROM "
            "(SELECT count(*) AS n FROM lineitem WHERE l_orderkey IS NOT NULL "
            "AND l_linenumber IS NOT NULL GROUP BY l_orderkey, l_linenumber) d WHERE n > 1), "
            "fk AS (SELECT count(*) AS v FROM lineitem l WHERE l_orderkey IS NOT NULL "
            "AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) "
            "SELECT * FROM ("
            "SELECT 'not_null(l_orderkey)' AS \"check\", CAST(c0 AS BIGINT) AS violations, CAST(total AS BIGINT) AS total_rows, CAST(c0 = 0 AS INT) AS passed FROM t "
            "UNION ALL SELECT 'range(l_quantity)', CAST(c1 AS BIGINT), CAST(total AS BIGINT), CAST(c1 = 0 AS INT) FROM t "
            "UNION ALL SELECT 'range(l_discount)', CAST(c2 AS BIGINT), CAST(total AS BIGINT), CAST(c2 = 0 AS INT) FROM t "
            "UNION ALL SELECT 'accepted_values(l_returnflag)', CAST(c3 AS BIGINT), CAST(total AS BIGINT), CAST(c3 = 0 AS INT) FROM t "
            "UNION ALL SELECT 'unique(l_orderkey, l_linenumber)', CAST(u.v AS BIGINT), CAST(total AS BIGINT), CAST(u.v = 0 AS INT) FROM u, t "
            "UNION ALL SELECT 'foreign_key(l_orderkey)', CAST(fk.v AS BIGINT), CAST(total AS BIGINT), CAST(fk.v = 0 AS INT) FROM fk, t)"
        ),
        survey_ref="pipeline contracts: declarative constraint audit "
        "(deequ/dbt-test analog; operators/quality.py, one-pass row checks)",
    )
)


def _st07(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.streaming.dedup import dedup_events

    events = load_table(spark, sf_dir, "events")
    # user_id × event_type as the logical event key: keep each user's
    # FIRST event of each type (ties broken by event_id)
    out = dedup_events(
        events, ["user_id", "event_type"], ts_col="ts", tiebreak_col="event_id"
    )
    return out.select(
        "user_id",
        "event_type",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
    )


_SPECS.append(
    QuerySpec(
        name="st07_stream_dedup",
        spark_fn=_st07,
        oracle=(
            "SELECT user_id, event_type, event_id, "
            "strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts "
            "FROM (SELECT *, row_number() OVER "
            "(PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn "
            "FROM events) WHERE rn = 1"
        ),
        survey_ref="streaming: bounded-state event dedup "
        "(dropDuplicatesWithinWatermark; streaming/dedup.py)",
    )
)


def _t14(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.llmops.sampling import group_cap_sample

    docs = load_table(spark, sf_dir, "documents")
    return group_cap_sample(docs, "lang", max_per_group=40, seed=7).select(
        "doc_id", "lang"
    )


_SPECS.append(
    QuerySpec(
        name="t14_group_cap_sample",
        spark_fn=_t14,
        oracle=(
            # identical md5 rank order (cf. t08's bit-identical buckets)
            "SELECT doc_id, lang FROM ("
            "SELECT doc_id, lang, row_number() OVER ("
            "PARTITION BY lang ORDER BY md5(doc_id || chr(31) || '7'), doc_id"
            ") AS rk FROM documents) WHERE rk <= 40"
        ),
        survey_ref="LLM pipeline: deterministic per-group document cap "
        "(hard-limit sibling of stratified_sample; llmops/sampling.py)",
    )
)


def _ts04(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gfw_data_api_spark.operators.timeseries import interarrival_stats

    events = load_table(spark, sf_dir, "events")
    out = interarrival_stats(events, "user_id", tiebreak_col="event_id")
    return out.select(
        "user_id",
        "n_events",
        F.round("min_gap_s", 6).alias("min_gap_s"),
        F.round("max_gap_s", 6).alias("max_gap_s"),
        F.round("mean_gap_s", 6).alias("mean_gap_s"),
    )


_SPECS.append(
    QuerySpec(
        name="ts04_interarrival_stats",
        spark_fn=_ts04,
        oracle=(
            # integer-microsecond gaps; mean = (Σgap/count)/1e6 in the
            # same association as the Spark expression
            "WITH g AS (SELECT user_id, epoch_us(ts) - lag(epoch_us(ts)) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS gap_us FROM events) "
            "SELECT user_id, count(*) AS n_events, "
            "round(CAST(min(gap_us) / 1000000 AS DOUBLE), 6) AS min_gap_s, "
            "round(CAST(max(gap_us) / 1000000 AS DOUBLE), 6) AS max_gap_s, "
            "round(CAST((CAST(sum(gap_us) AS DOUBLE) / count(gap_us)) / 1000000 AS DOUBLE), 6) AS mean_gap_s "
            "FROM g GROUP BY user_id"
        ),
        survey_ref="time series: per-key inter-arrival gap statistics "
        "(exchange-reused single shuffle; operators/timeseries.py)",
    )
)


def _p02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-3 composition: Gopher rule filter → containment dedup
    (drop the higher id of each ≥0.5-containment pair) → per-language
    survivor counts with temperature-smoothed mixture weights. One
    lazy plan end to end."""
    from gfw_data_api_spark.llmops.dedup import _persist_replacing, ngram_containment_pairs
    from gfw_data_api_spark.llmops.mixture import temperature_mixture_weights
    from gfw_data_api_spark.llmops.text import gopher_quality_rules

    docs = load_table(spark, sf_dir, "documents")
    # the synthetic corpus contains no canonical English stopwords, so
    # the stopword-presence rule is relaxed to keep the pipeline flowing
    # (every other rule stays active). The filtered battery output is
    # pinned: the containment index, the anti-join probe side, and the
    # mixture totals all consume it, and unpinned each branch re-runs
    # the whole rule battery over the corpus (plan audit: 5 scans).
    kept = _persist_replacing(
        gopher_quality_rules(docs, min_words=30, min_stopword_hits=0)
        .filter(F.col("keep"))
        .select("doc_id", "text", "lang"),
        "p02_kept",
    )
    dups = (
        ngram_containment_pairs(kept, shingle_n=3, threshold=0.5)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    # no broadcast hint on the unbounded dup-id set; AQE decides
    survivors = kept.join(dups, "doc_id", "left_anti")
    out = temperature_mixture_weights(survivors, domain_col="lang", alpha=0.5)
    return out.select(
        "domain",
        "n_docs",
        "n_tokens",
        F.round("token_frac", 6).alias("token_frac"),
        F.round("temp_frac", 6).alias("temp_frac"),
        F.round("sample_weight", 6).alias("sample_weight"),
    )


def _p02_oracle() -> str:
    """Composition of the t12/t13/w02 oracle fragments over one WITH
    chain — proving the operators compose relationally, not just
    individually."""
    return (
        # t12 keep (full rule battery)
        "WITH sig AS (SELECT doc_id, text, lang, "
        "len(regexp_split_to_array(trim(text), '\\s+')) AS n_words, "
        "len(regexp_split_to_array(text, '\\n')) AS n_lines, "
        "length(regexp_replace(text, '\\s', '', 'g')) AS nonspace, "
        "len(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS symbol_hits, "
        "len(list_filter(regexp_split_to_array(text, '\\n'), "
        "l -> regexp_matches(trim(l), '^([•‣▪-]|\\*)\\s'))) AS bullet_lines, "
        "len(list_filter(regexp_split_to_array(text, '\\n'), "
        "l -> regexp_matches(trim(l), '(\\.\\.\\.|…)$'))) AS ellipsis_lines, "
        "len(list_filter(regexp_split_to_array(trim(text), '\\s+'), "
        "t -> regexp_matches(t, '[A-Za-z]'))) AS alpha_words, "
        "len(list_distinct(list_filter(list_transform("
        "regexp_split_to_array(trim(text), '\\s+'), t -> lower(t)), "
        "t -> t IN ('the','be','to','of','and','that','have','with')))) AS stopword_hits "
        "FROM documents), "
        "kept AS (SELECT doc_id, text, lang FROM sig WHERE "
        "n_words >= 30 AND n_words <= 100000 "
        "AND CAST(nonspace AS DOUBLE) / greatest(n_words, 1) >= 3.0 "
        "AND CAST(nonspace AS DOUBLE) / greatest(n_words, 1) <= 10.0 "
        "AND CAST(symbol_hits AS DOUBLE) / greatest(n_words, 1) <= 0.1 "
        "AND CAST(bullet_lines AS DOUBLE) / greatest(n_lines, 1) <= 0.9 "
        "AND CAST(ellipsis_lines AS DOUBLE) / greatest(n_lines, 1) <= 0.3 "
        "AND CAST(alpha_words AS DOUBLE) / greatest(n_words, 1) >= 0.8), "
        # t13 containment over the kept set
        "toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM kept), "
        "sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t)-1), "
        "i -> array_to_string(t[i:i+2], ' ')))) AS s FROM toks), "
        "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), "
        "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared "
        "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2), "
        "dups AS (SELECT DISTINCT id_b AS doc_id FROM inter "
        "JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b "
        "WHERE CAST(shared AS DOUBLE) / least(sa.n, sb.n) >= 0.5), "
        "surv AS (SELECT k.* FROM kept k WHERE k.doc_id NOT IN (SELECT doc_id FROM dups)), "
        # w02 temperature mixture at alpha 0.5
        "agg AS (SELECT lang AS domain, count(*) AS n_docs, "
        "CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS n_tokens "
        "FROM surv GROUP BY lang), "
        "tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM agg), "
        "fr AS (SELECT domain, n_docs, n_tokens, "
        "CAST(n_tokens AS DOUBLE) / total AS token_frac FROM agg, tot), "
        "z AS (SELECT sum(pow(token_frac, 0.5)) AS z FROM fr) "
        "SELECT domain, n_docs, n_tokens, round(token_frac, 6) AS token_frac, "
        "round(pow(token_frac, 0.5) / z, 6) AS temp_frac, "
        "round((pow(token_frac, 0.5) / z) / token_frac, 6) AS sample_weight "
        "FROM fr, z"
    )


_SPECS.append(
    QuerySpec(
        name="p02_curate_round3",
        spark_fn=_p02,
        oracle=_p02_oracle(),
        survey_ref="LLM pipeline: round-3 composition — Gopher filter → "
        "containment dedup → temperature mixture in one lazy plan",
    )
)


_P03_STOP_TAIL = " the be to of and that have with"


def _p03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 composition with the UNRELAXED Gopher battery: the
    synthetic corpus has no canonical English stopwords, so p02 had to
    relax ``min_stopword_hits`` to keep its pipeline flowing; here half
    the corpus (even doc ids) gets a deterministic stopword tail so the
    stopword rule genuinely bisects the corpus and its PASS branch is
    driver-gated. Stages: stopword enrichment → full rule battery
    (defaults incl. min_stopword_hits=2) → deterministic per-language
    cap (group_cap_sample, seed 11) → per-language corpus report."""
    from gfw_data_api_spark.llmops.sampling import group_cap_sample
    from gfw_data_api_spark.llmops.text import gopher_quality_rules, tokens_col

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.when(
            F.col("doc_id") % 2 == 0, F.concat(F.col("text"), F.lit(_P03_STOP_TAIL))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    kept = (
        gopher_quality_rules(docs, min_words=30)
        .filter(F.col("keep"))
        .select("doc_id", "lang", "text", "stopword_hits")
    )
    capped = group_cap_sample(kept, "lang", max_per_group=60, seed=11)
    return (
        capped.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(tokens_col(F.col("text")))).cast("bigint").alias("n_tokens"),
            F.round(F.avg("stopword_hits"), 6).alias("avg_stopword_hits"),
        )
    )


def _p03_oracle() -> str:
    return (
        "WITH enriched AS (SELECT doc_id, lang, "
        f"CASE WHEN doc_id % 2 = 0 THEN text || '{_P03_STOP_TAIL}' "
        "ELSE text END AS text FROM documents), "
        "sig AS (SELECT doc_id, lang, text, "
        "len(regexp_split_to_array(trim(text), '\\s+')) AS n_words, "
        "len(regexp_split_to_array(text, '\\n')) AS n_lines, "
        "length(regexp_replace(text, '\\s', '', 'g')) AS nonspace, "
        "len(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS symbol_hits, "
        "len(list_filter(regexp_split_to_array(text, '\\n'), "
        "l -> regexp_matches(trim(l), '^([•‣▪-]|\\*)\\s'))) AS bullet_lines, "
        "len(list_filter(regexp_split_to_array(text, '\\n'), "
        "l -> regexp_matches(trim(l), '(\\.\\.\\.|…)$'))) AS ellipsis_lines, "
        "len(list_filter(regexp_split_to_array(trim(text), '\\s+'), "
        "t -> regexp_matches(t, '[A-Za-z]'))) AS alpha_words, "
        "len(list_distinct(list_filter(list_transform("
        "regexp_split_to_array(trim(text), '\\s+'), t -> lower(t)), "
        "t -> t IN ('the','be','to','of','and','that','have','with')))) AS stopword_hits "
        "FROM enriched), "
        "kept AS (SELECT doc_id, lang, text, stopword_hits, n_words FROM sig WHERE "
        "n_words >= 30 AND n_words <= 100000 "
        "AND CAST(nonspace AS DOUBLE) / greatest(n_words, 1) >= 3.0 "
        "AND CAST(nonspace AS DOUBLE) / greatest(n_words, 1) <= 10.0 "
        "AND CAST(symbol_hits AS DOUBLE) / greatest(n_words, 1) <= 0.1 "
        "AND CAST(bullet_lines AS DOUBLE) / greatest(n_lines, 1) <= 0.9 "
        "AND CAST(ellipsis_lines AS DOUBLE) / greatest(n_lines, 1) <= 0.3 "
        "AND CAST(alpha_words AS DOUBLE) / greatest(n_words, 1) >= 0.8 "
        "AND stopword_hits >= 2), "
        "capped AS (SELECT * FROM (SELECT *, row_number() OVER ("
        "PARTITION BY lang ORDER BY md5(doc_id || chr(31) || '11'), doc_id"
        ") AS rk FROM kept) WHERE rk <= 60) "
        "SELECT lang, count(*) AS n_docs, "
        "CAST(sum(n_words) AS BIGINT) AS n_tokens, "
        "round(avg(stopword_hits), 6) AS avg_stopword_hits "
        "FROM capped GROUP BY lang"
    )


_SPECS.append(
    QuerySpec(
        name="p03_curate_round4",
        spark_fn=_p03,
        oracle=_p03_oracle(),
        survey_ref="LLM pipeline: round-4 composition — stopword-bearing "
        "fixture → UNRELAXED Gopher battery → deterministic group cap → "
        "per-language report (closes the relaxed-stopword gap in p02)",
    )
)


# ---------------------------------------------------------------------------
# public registry
# ---------------------------------------------------------------------------

# The driver's correctness snapshot records the FIRST 50 dict entries of
# ``queries()`` only.  Order the registry so every one of those 50 slots is
# a full-oracle entry (hash-compared against DuckDB), with the entries the
# driver has not yet checked at the front; rows-only entries (no oracle by
# design — xxhash64/approx families) go last so no capped slot is spent on
# a weaker rows-only row.
_DRIVER_FRONT: list[str] = [
    # round-11 rotation (VERDICT r10 #3): the driver snapshot records
    # the first 50 queries() entries. This front = the three rows with
    # NO driver evidence yet (q59/q60 landed after the r10 snapshot;
    # q61 is new this round), the three r6-stale rows round 9 spilled
    # (ts04/ts05/w03), all 40 rows last checked in round 7 — the
    # oldest staleness anywhere (union of all CORRECTNESS_r0*) — and
    # the first four r8-stale rows in r8-snapshot order. Every slot
    # is full-oracle.
    # --- never driver-checked ---
    "q59_timestamp_series",
    "q60_row_comparisons",
    "q61_interval_epoch_zones",
    "q62_age_function",
    "q63_breadth_round11",
    "q64_agg_breadth",
    "q65_grouping_sets",
    # --- r6-checked rows (the last three) ---
    "ts04_interarrival_stats",
    "ts05_resample_interpolate",
    "w03_weighted_sample",
    # --- r7-checked rows (all 40; sorted) ---
    "b01_bpe_pair_stats",
    "c01_token_chunks",
    "c02_pii_redaction",
    "ca01_continuous_aggregate",
    "d04_minhash_lsh_neardups",
    "d08_benchmark_decontamination",
    "d09_dedup_clusters",
    "d10_repeated_segment_removal",
    "dq01_constraint_audit",
    "e04_merge_upsert",
    "e05_scd2_intervals",
    "e20_byte_budget_shards",
    "m04_perceptual_neardups",
    "m06_video_remux_dedup",
    "m12_mpeg_matrix_inventory",
    "p01_curate_corpus",
    "p02_curate_round3",
    "q18_percentiles",
    "q20_salted_skew_agg",
    "q22_topk_per_group",
    "q23_pivot_conditional_agg",
    "q24_skew_hybrid_join",
    "q25_blocked_fuzzy_match",
    "q45_json_array_containment",
    "q46_backslash_literals",
    "q47_datepart_negidx_jsonb_merge",
    "q48_dialect_fourth_wave",
    "q49_dialect_fifth_wave",
    "q50_composed_dialect",
    "s06_int8_quantization",
    "t06_tfidf_top_terms",
    "t07_repetition_signals",
    "t08_hash_split",
    "t09_stratified_sample",
    "t10_bigram_lm",
    "t17_kneser_ney_lm",
    "t26_lr_quality_envelope",
    "u01_url_canonicalization",
    "w01_importance_weights",
    "w02_temperature_mixture",
]


def _q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-radius lookup with NATIVE haversine math (the I3
    features-by-location predicate re-expressed as codegen column math
    over a point table — geometry semantics inside the hard gate, no
    WKB/UDF path needed). Point coordinates derive deterministically
    from customer keys so both engines compute the identical corpus."""
    from gfw_data_api_spark.operators.features import points_within_radius

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 7 % 1600) / 10.0 - 80.0).alias("lat"),
        ((F.col("c_custkey") * 13 % 3600) / 10.0 - 180.0).alias("lon"),
    )
    out = points_within_radius(cust, lat=10.0, lng=20.0, radius_km=2500.0)
    return out.select("c_custkey", F.round("distance_km", 6).alias("distance_km"))


_SPECS.append(
    QuerySpec(
        name="q26_point_radius_haversine",
        spark_fn=_q26,
        oracle=(
            "WITH pts AS (SELECT c_custkey, "
            "(c_custkey * 7 % 1600) / 10.0 - 80.0 AS lat, "
            "(c_custkey * 13 % 3600) / 10.0 - 180.0 AS lon FROM customer), "
            "d AS (SELECT c_custkey, "
            "2.0 * 6371.0088 * asin(sqrt(pow(sin(radians(lat - 10.0) / 2), 2) "
            "+ cos(radians(10.0)) * cos(radians(lat)) "
            "* pow(sin(radians(lon - 20.0) / 2), 2))) AS distance_km "
            "FROM pts WHERE lat BETWEEN 10.0 - 2500.0/111.32 AND 10.0 + 2500.0/111.32 "
            "AND lon BETWEEN 20.0 - 2500.0/(111.32*cos(radians(10.0))) "
            "AND 20.0 + 2500.0/(111.32*cos(radians(10.0)))) "
            "SELECT c_custkey, round(distance_km, 6) AS distance_km "
            "FROM d WHERE distance_km <= 2500.0"
        ),
        survey_ref="I3 point-radius lookup semantics as native column math "
        "(operators/features.py points_within_radius; bbox pre-filter + "
        "exact haversine — the first geometry-semantics entry inside the "
        "full-oracle gate)",
    )
)


def _s08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF recall gate: the a01-pattern applied to ANN — the approximate
    structure (driver-trained centroids) can't reproduce in SQL, but its
    QUALITY CONTRACT can: for each of 5 query vectors, the exact top-1
    neighbor (SQL-expressible) plus a boolean pinning IVF recall@10 at
    ≥0.5 (measured 0.6-1.0 at nprobe=5 across test SFs; chance is
    ~k/n ≈ 2%). A silent ANN regression — wrong cell assignment, broken
    probe ordering, degenerate training — flips the boolean and fails
    the driver gate.

    Round-5 shape: BOTH sides are single batched plans (the R10
    batch-list pattern): the exact ranking nested-loop-joins a bounded
    5-row query table onto one corpus scan (window top-10 per query),
    and the approximate side is one ivf_topk_batch probe — O(1) scans
    regardless of query count, where the r4 version paid O(Q) plans."""
    from pyspark.sql import Window

    from gfw_data_api_spark.llmops import ivf
    from gfw_data_api_spark.llmops.dedup import _persist_replacing

    emb = _persist_replacing(load_table(spark, sf_dir, "embeddings"), "s08_emb")
    centroids = ivf.train_ivf(emb, nlist=8, iters=3)
    indexed = _persist_replacing(ivf.build_ivf_index(emb, centroids), "s08_index")
    qrows = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 5).collect()
    }
    queries = [(qid, qrows[qid]) for qid in sorted(qrows)]

    qdf = spark.createDataFrame(
        [(qid, vec, math.sqrt(sum(x * x for x in vec))) for qid, vec in queries],
        "query_id bigint, _qvec array<double>, _qnorm double",
    )
    cast = F.col("embedding").cast("array<double>")
    dot = F.aggregate(
        F.zip_with(cast, F.col("_qvec"), lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    norm = F.sqrt(
        F.aggregate(F.zip_with(cast, cast, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    )
    scored = (
        emb.crossJoin(F.broadcast(qdf))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", (dot / (norm * F.col("_qnorm"))).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    exact = _persist_replacing(
        scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 10),
        "s08_exact",
    )
    top1 = exact.filter(F.col("rk") == 1).select(
        "query_id",
        F.col("vec_id").alias("top1_id"),
        F.round("cosine", 6).alias("top1_cosine"),
    )
    approx = ivf.ivf_topk_batch(
        indexed, centroids, queries, k=10, nprobe=5, exclude_query_id=True
    ).select("query_id", "vec_id")
    hits = exact.join(approx, ["query_id", "vec_id"]).groupBy("query_id").agg(
        F.count("*").alias("_hits")
    )
    return top1.join(hits, "query_id", "left").select(
        "query_id",
        "top1_id",
        "top1_cosine",
        (F.coalesce(F.col("_hits"), F.lit(0)) / 10.0 >= 0.5).alias("recall_ok"),
    )


_SPECS.append(
    QuerySpec(
        name="s08_ivf_recall_gate",
        spark_fn=_s08,
        oracle=(
            "WITH qs AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe "
            "FROM embeddings WHERE vec_id < 5), "
            "scored AS (SELECT q.query_id, e.vec_id, "
            "list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe) / "
            "(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) * "
            "sqrt(list_dot_product(q.qe, q.qe))) AS cosine "
            "FROM embeddings e, qs q WHERE e.vec_id != q.query_id), "
            "ranked AS (SELECT query_id, vec_id, cosine, row_number() OVER ("
            "PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk FROM scored) "
            "SELECT query_id, vec_id AS top1_id, round(cosine, 6) AS top1_cosine, "
            "TRUE AS recall_ok FROM ranked WHERE rk = 1"
        ),
        survey_ref="similarity: IVF quality contract inside the hard gate "
        "(exact top-1 + recall@10 error-envelope boolean; llmops/ivf.py)",
    )
)


def _s10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFPQ+refine recall gate: the s08 quality-contract pattern
    applied to the compressed read path (llmops/pq.py). The PQ
    structure (driver-trained codebooks, 8-byte codes) can't reproduce
    in SQL, but its deployment contract can: for each of 5 query
    vectors, the exact cosine top-1 (SQL-expressible) plus a boolean
    pinning ADC-candidates→exact-refine recall@10 at ≥0.3 (measured
    0.5-0.9 at nprobe=5/refine_factor=10 across sf0.001/0.01/0.1;
    candidate-set chance is ~5% at sf0.1). A silent regression — a
    broken codebook, mis-ordered ADC table, wrong subspace slicing —
    drops recall to the raw-scan floor and flips the boolean.

    Plan shape: both sides are single batched plans — the exact ranking
    nested-loop-joins a bounded 5-row query table onto one corpus scan,
    and the approximate side is one ivfpq_topk_refined_batch probe
    (codes-only ADC scan → bounded candidate refine join); O(1) scans
    regardless of query count."""
    from pyspark.sql import Window

    from gfw_data_api_spark.llmops import ivf
    from gfw_data_api_spark.llmops.dedup import _persist_replacing
    from gfw_data_api_spark.llmops.pq import encode_pq, ivfpq_topk_refined_batch, train_pq
    from gfw_data_api_spark.llmops.similarity import norm_col

    emb = _persist_replacing(load_table(spark, sf_dir, "embeddings"), "s10_emb")
    centroids = ivf.train_ivf(emb, nlist=8, iters=3)
    books = train_pq(emb, m=8, ksub=16, seed=42)
    indexed = _persist_replacing(
        encode_pq(ivf.build_ivf_index(emb, centroids), books), "s10_index"
    )
    qrows = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 5).collect()
    }
    queries = [(qid, qrows[qid]) for qid in sorted(qrows)]

    qdf = spark.createDataFrame(
        [(qid, vec, math.sqrt(sum(x * x for x in vec))) for qid, vec in queries],
        "query_id bigint, _qvec array<double>, _qnorm double",
    )
    cast = F.col("embedding").cast("array<double>")
    dot = F.aggregate(
        F.zip_with(cast, F.col("_qvec"), lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    scored = (
        emb.crossJoin(F.broadcast(qdf))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (dot / (norm_col(F.col("embedding")) * F.col("_qnorm"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    exact = _persist_replacing(
        scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 10),
        "s10_exact",
    )
    top1 = exact.filter(F.col("rk") == 1).select(
        "query_id",
        F.col("vec_id").alias("top1_id"),
        F.round("cosine", 6).alias("top1_cosine"),
    )
    approx = ivfpq_topk_refined_batch(
        indexed, emb, centroids, books, queries, k=10, nprobe=5,
        refine_factor=10, exclude_query_id=True,
    ).select("query_id", "vec_id")
    hits = exact.join(approx, ["query_id", "vec_id"]).groupBy("query_id").agg(
        F.count("*").alias("_hits")
    )
    return top1.join(hits, "query_id", "left").select(
        "query_id",
        "top1_id",
        "top1_cosine",
        (F.coalesce(F.col("_hits"), F.lit(0)) / 10.0 >= 0.3).alias("recall_ok"),
    )


_SPECS.append(
    QuerySpec(
        name="s10_pq_recall_gate",
        spark_fn=_s10,
        oracle=(
            "WITH qs AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe "
            "FROM embeddings WHERE vec_id < 5), "
            "scored AS (SELECT q.query_id, e.vec_id, "
            "list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe) / "
            "(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) * "
            "sqrt(list_dot_product(q.qe, q.qe))) AS cosine "
            "FROM embeddings e, qs q WHERE e.vec_id != q.query_id), "
            "ranked AS (SELECT query_id, vec_id, cosine, row_number() OVER ("
            "PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk FROM scored) "
            "SELECT query_id, vec_id AS top1_id, round(cosine, 6) AS top1_cosine, "
            "TRUE AS recall_ok FROM ranked WHERE rk = 1"
        ),
        survey_ref="similarity: IVFPQ+refine quality contract inside the hard "
        "gate (exact top-1 + recall@10 error-envelope boolean; llmops/pq.py "
        "ivfpq_topk_refined_batch — the batched ADC deployment read path)",
    )
)


def _t15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 ranked retrieval over the documents corpus (the
    text-search operator a curation pipeline uses for targeted corpus
    probes). Float determinism: every scalar constant the Spark side
    computes in Python (k1+1, avgdl is re-derived by the oracle from
    the same integer totals) appears in the oracle SQL with identical
    IEEE parenthesization, so scores agree to the last ulp before the
    shared round(6)."""
    from gfw_data_api_spark.llmops.text import bm25_search

    docs = load_table(spark, sf_dir, "documents")
    return bm25_search(docs, ["spark", "join", "vector"], top_k=20)


def _t15_oracle() -> str:
    k1, b = 1.2, 0.75
    toks = "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x <> '')"
    return (
        f"WITH base AS (SELECT doc_id, len({toks}) AS dl, {toks} AS toks FROM documents), "
        "stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, "
        "CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM base), "
        "tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM "
        "(SELECT doc_id, dl, unnest(toks) AS term FROM base) "
        "WHERE term IN ('spark', 'join', 'vector') GROUP BY doc_id, dl, term), "
        "docfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
        "scored AS (SELECT tf.doc_id, "
        "ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * "
        f"((tf.tf * {k1 + 1.0!r}) / (tf.tf + {k1!r} * ({1.0 - b!r} + {b!r} * (tf.dl / s.avgdl)))) AS sc "
        "FROM tf JOIN docfreq d USING (term), stats s) "
        "SELECT doc_id, round(sum(sc), 6) AS bm25 FROM scored "
        "GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 20"
    )


_SPECS.append(
    QuerySpec(
        name="t15_bm25_search",
        spark_fn=_t15,
        oracle=_t15_oracle(),
        survey_ref="text analysis: Okapi BM25 ranked retrieval "
        "(llmops/text.py bm25_search) — map-side term filter, no full-corpus "
        "shuffle, TakeOrdered top-k",
    )
)


def _m02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAV audio decode inside the hard gate, bit-exactly oracled.

    Per selected document a WAV payload is synthesized executor-side
    (float32 PCM, samples k/128 with integer k in [-100, 100] — exactly
    representable in float32, so decode returns the analytic signal
    bit-for-bit), then decoded back by llmops/audio.extract_audio_features.
    Every emitted feature (rms, peak, zero-crossing rate, silence ratio)
    is therefore an exact closed form of (doc_id, i) that DuckDB
    recomputes from generate_series: squared samples are multiples of
    2^-14 summing below 2^10, so the float64 sum is exact in any order —
    no tolerance needed. The FFT-based spectral centroid stays out of
    the gate (covered by unit tests) since it is the one
    order-sensitive float reduction."""
    from gfw_data_api_spark.llmops.audio import encode_wav, extract_audio_features

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id")
    )

    def synth(batches):
        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 400 + d % 7 * 80
                i = np.arange(n, dtype=np.int64)
                k = (i * 37 + d) % 201 - 100
                payloads.append(bytearray(encode_wav(k / 128.0, 8000, bits=-32)))
            pdf = pdf.copy()
            pdf["payload"] = payloads
            yield pdf

    wav = docs.mapInPandas(synth, schema="doc_id bigint, payload binary")
    return extract_audio_features(wav).select(
        "doc_id",
        "sample_rate",
        "n_samples",
        "audio_duration_ms",
        "rms",
        "peak",
        "zero_crossing_rate",
        "silence_ratio",
    )


_SPECS.append(
    QuerySpec(
        name="m02_audio_wav_features",
        spark_fn=_m02,
        oracle=(
            # k(i) = (i*37 + doc_id) % 201 - 100; sample v = k/128 stored
            # as float32 (exact). kp is the previous sample's k for the
            # zero-crossing pair test (signbit == v < 0 here: no -0.0).
            "WITH d AS (SELECT doc_id, 400 + (doc_id % 7) * 80 AS n "
            "FROM documents WHERE doc_id % 10 = 0), "
            "s AS (SELECT d.doc_id, d.n, g.i, "
            "((g.i * 37 + d.doc_id) % 201 - 100) AS k, "
            "((g.i - 1) * 37 + d.doc_id) % 201 - 100 AS kp, "
            "CAST(((g.i * 37 + d.doc_id) % 201 - 100) / 128.0 AS REAL) AS v "
            "FROM d, generate_series(0, 879) AS g(i) WHERE g.i < d.n), "
            "agg AS (SELECT doc_id, n, sum(pow(v, 2)) AS ss, "
            "CAST(max(abs(v)) AS DOUBLE) AS peak, "
            "sum(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS silent, "
            "sum(CASE WHEN i >= 1 AND ((k < 0) <> (kp < 0)) THEN 1 ELSE 0 END) AS crossings "
            "FROM s GROUP BY doc_id, n) "
            "SELECT doc_id, 8000 AS sample_rate, CAST(n AS INTEGER) AS n_samples, "
            "1000.0 * n / 8000.0 AS audio_duration_ms, "
            "sqrt(ss / CAST(n AS DOUBLE)) AS rms, peak, "
            "CAST(crossings AS DOUBLE) / (n - 1) AS zero_crossing_rate, "
            "CAST(silent AS DOUBLE) / n AS silence_ratio FROM agg"
        ),
        survey_ref="multimodal audio: WAV decode + signal features "
        "(llmops/audio.py) — bit-exact analytic oracle",
    )
)


def _m03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MJPEG-AVI video frame sampling inside the hard gate.

    Executor-side, each selected document becomes an AVI of flat 8x8
    grayscale MJPEG frames (level = (doc_id*11 + i*31) % 200 + 20), then
    llmops/video.decode_sampled_frames re-parses the container, decodes
    every 2nd frame through the JPEG codec, and the query emits the
    exact sampled index set + frame dims plus an error-envelope boolean
    (decoded mean luma within 4 levels of the encoded flat value — a
    q95 flat block quantizes only the DC coefficient, so the bound has
    wide margin). DuckDB recomputes the sampled indices from
    generate_series and checks the booleans as literal TRUE — the a01/
    a02 error-bound-gate pattern applied to lossy codec output."""
    from gfw_data_api_spark.llmops.video import decode_sampled_frames, encode_avi_mjpeg

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 20 == 0)
        .select("doc_id")
    )

    def synth(batches):
        import numpy as np

        from gfw_data_api_spark.llmops.jpeg import encode_jpeg

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                frames = [
                    encode_jpeg(
                        np.full((8, 8), (d * 11 + i * 31) % 200 + 20, dtype=np.uint8),
                        quality=95,
                    )
                    for i in range(2 + d % 5)
                ]
                payloads.append(bytearray(encode_avi_mjpeg(frames, 10.0, 8, 8)))
            pdf = pdf.copy()
            pdf["payload"] = payloads
            yield pdf

    avi = docs.mapInPandas(synth, schema="doc_id bigint, payload binary")
    frames = decode_sampled_frames(avi, every_nth=2)
    expected = (F.col("doc_id") * 11 + F.col("frame_index") * 31) % 200 + 20
    return frames.select(
        "doc_id",
        "frame_index",
        "frame_width",
        "frame_height",
        (F.abs(F.col("frame_mean_luma") - expected) <= F.lit(4.0)).alias("luma_ok"),
    )


_SPECS.append(
    QuerySpec(
        name="m03_video_frame_sampling",
        spark_fn=_m03,
        oracle=(
            "WITH d AS (SELECT doc_id, 2 + doc_id % 5 AS nf "
            "FROM documents WHERE doc_id % 20 = 0) "
            "SELECT d.doc_id, CAST(g.i AS INTEGER) AS frame_index, "
            "8 AS frame_width, 8 AS frame_height, TRUE AS luma_ok "
            "FROM d, generate_series(0, 6) AS g(i) "
            "WHERE g.i < d.nf AND g.i % 2 = 0"
        ),
        survey_ref="multimodal video: AVI container parse + sampled MJPEG "
        "frame decode (llmops/video.py) — index-exact oracle with "
        "error-envelope luma booleans",
    )
)


# Decoration wrapped around each document for the c03 normalization gate:
# curly quotes, em dash, combining accent (e +  ́ → é under NFC), NBSP
# runs, a BEL control, zero-width chars, prime marks — every class the
# normalizer handles, exercised on real corpus text.
_C03_PREFIX = "\u201cQu\u2019oted\u201d \u2014 cafe\u0301\u00a0\u00a0 \x07 "
_C03_SUFFIX = " \u200bzero\u200bwidth \u2013 end\u2032  "


def _a03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra–Gries heavy hitters (operators/sketches.py): the candidate
    shuffle carries ≤ batches×capacity rows however large the value
    cardinality — the 100 TB answer to top-k over billion-distinct
    columns. The MG bounds are deterministic (never overcounts;
    undercount ≤ n/(capacity+1); every value heavier than that bound
    survives), so the gate pins them as booleans beside exact counts —
    the a01/a02 error-envelope pattern for a provable sketch."""
    from gfw_data_api_spark.operators.sketches import heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    capacity = 64
    # n (for the n // (capacity+1) undercount bound) folds in-plan as a
    # 1-row aggregate crossJoin (the t18/t19 convention) instead of a
    # serial count() action — the bound stays exact integer arithmetic
    # (`div`), and the only driver action left is the query itself
    nrow = docs.filter(F.col("lang").isNotNull()).agg(F.count("*").alias("_n"))
    out = heavy_hitters(docs, "lang", capacity=capacity, top_k=10)
    return (
        out.crossJoin(F.broadcast(nrow))
        .select(
            F.col("value").alias("lang"),
            "exact_count",
            (F.col("est_count") <= F.col("exact_count")).alias("never_overcounts"),
            (
                F.col("exact_count") - F.col("est_count")
                <= F.expr(f"_n div {capacity + 1}")
            ).alias("undercount_in_bound"),
        )
        .orderBy(F.desc("exact_count"), F.asc("lang"))
    )


_SPECS.append(
    QuerySpec(
        name="a03_heavy_hitters",
        spark_fn=_a03,
        oracle=(
            "SELECT lang, count(*) AS exact_count, TRUE AS never_overcounts, "
            "TRUE AS undercount_in_bound FROM documents WHERE lang IS NOT NULL "
            "GROUP BY lang ORDER BY exact_count DESC, lang LIMIT 10"
        ),
        survey_ref="beyond-reference (SURVEY §2.7): Misra–Gries heavy-hitter "
        "sketch, candidate-bounded shuffle, provable-bound booleans",
    )
)


def _c03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode + typographic normalization (llmops/clean.normalize_text):
    translate-map quotes/dashes/spaces, delete zero-width, strip
    controls, collapse whitespace, NFC — mirrored function-for-function
    in DuckDB (translate / regexp_replace 'g' / trim / nfc_normalize),
    so the normalized text hash-compares exactly across engines."""
    from gfw_data_api_spark.llmops.clean import normalize_text_col

    docs = load_table(spark, sf_dir, "documents")
    decorated = F.concat(F.lit(_C03_PREFIX), F.col("text"), F.lit(_C03_SUFFIX))
    norm = normalize_text_col(decorated)
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(norm).cast("bigint").alias("n_chars_norm"),
    )


def _c03_norm_sql() -> str:
    """The DuckDB expression mirroring normalize_text_col over the
    decorated document text — shared by the c03 and p04 oracles."""
    from gfw_data_api_spark.llmops.clean import (
        _CONTROL_RE,
        _TRANSLATE_FROM,
        _TRANSLATE_TO,
    )

    sql_to = _TRANSLATE_TO.replace("'", "''")
    pre = _C03_PREFIX.replace("'", "''")
    suf = _C03_SUFFIX.replace("'", "''")
    return (
        "nfc_normalize(trim(regexp_replace(regexp_replace("
        f"translate('{pre}' || text || '{suf}', '{_TRANSLATE_FROM}', '{sql_to}'), "
        f"'{_CONTROL_RE}', '', 'g'), '\\s+', ' ', 'g')))"
    )


def _c03_oracle() -> str:
    norm = _c03_norm_sql()
    return (
        f"SELECT doc_id, {norm} AS norm_text, "
        f"CAST(length({norm}) AS BIGINT) AS n_chars_norm FROM documents"
    )


_SPECS.append(
    QuerySpec(
        name="c03_text_normalization",
        spark_fn=_c03,
        oracle=_c03_oracle(),
        survey_ref="text cleaning: Unicode NFC + typographic normalization "
        "(llmops/clean.normalize_text) — JVM translate/regexp stages, "
        "Arrow-batched NFC",
    )
)


def _gain_group_wav_synth(batches):
    """Shared m05/st08 fixture: per doc a float32 WAV whose waveform
    depends only on doc_id % 25 (three group-seeded sinusoids + noise)
    times a per-doc gain (0.5 + d%5*0.1). BOTH gates' oracles assume
    exactly this construction (gain-invariance verified exhaustively for
    it) — one builder so they can never silently diverge."""
    import numpy as np

    from gfw_data_api_spark.llmops.audio import encode_wav

    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            rng = np.random.default_rng(d % 25 * 7919 + 3)
            n, rate = 4096, 8000
            t = np.arange(n) / rate
            freqs = rng.uniform(100, 3500, 3)
            amps = rng.uniform(0.2, 0.5, 3)
            sig = sum(a * np.sin(2 * np.pi * f * t) for a, f in zip(amps, freqs))
            sig += 0.05 * rng.standard_normal(n)
            sig = sig / np.max(np.abs(sig)) * 0.6
            payloads.append(bytearray(encode_wav((0.5 + d % 5 * 0.1) * sig, rate, bits=-32)))
        pdf = pdf.copy()
        pdf["payload"] = payloads
        yield pdf


def _m05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual AUDIO near-dup detection inside the hard gate — the
    audio twin of m04. Each selected document becomes a float32 WAV
    whose waveform depends only on its group (doc_id % 25: three
    group-seeded sinusoids + noise) times a per-doc gain: bytes differ,
    sha-dedup cannot pair them, but the Haitsma–Kalker fingerprint's
    energy-difference signs are gain-invariant (multiplying every band
    energy by g² preserves every comparison; verified exhaustively for
    these deterministic fixtures, cross-group Hamming ≥21). Expected
    pair set = within-group pairs at Hamming 0 — pure group arithmetic
    for DuckDB. The pair machinery is the SAME SimHash pigeonhole band
    join the text and image families use."""
    from gfw_data_api_spark.llmops.audio import audio_fingerprints, encode_wav
    from gfw_data_api_spark.llmops.dedup import _persist_replacing
    from gfw_data_api_spark.llmops.phash import perceptual_neardup_pairs

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id")
    )

    wavs = docs.mapInPandas(_gain_group_wav_synth, schema="doc_id bigint, payload binary")
    fps = _persist_replacing(
        audio_fingerprints(wavs).select("doc_id", "afp"),
        "m05_fps",
    )
    pairs = perceptual_neardup_pairs(fps, "afp", id_col="doc_id")
    return pairs.select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


_SPECS.append(
    QuerySpec(
        name="m05_audio_neardups",
        spark_fn=_m05,
        oracle=(
            "WITH d AS (SELECT doc_id, doc_id % 25 AS grp "
            "FROM documents WHERE doc_id % 10 = 0) "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "CAST(0 AS INTEGER) AS hamming "
            "FROM d a JOIN d b ON a.grp = b.grp AND a.doc_id < b.doc_id"
        ),
        survey_ref="multimodal dedup: gain-invariant perceptual audio "
        "fingerprints (llmops/audio.audio_fingerprint64) — banded "
        "pigeonhole join, exact planted-group oracle",
    )
)


def _m06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remux-invariant video dedup inside the hard gate: per selected
    document an MJPEG-AVI is synthesized whose FRAME BYTES depend only
    on its group (doc_id % 25) while the CONTAINER differs per doc
    (fps = 5 + doc_id % 7) — byte-level sha keys differ on every row,
    but llmops/video.video_content_keys hashes the decoded pixels, so
    group members collapse to one key. The gate emits the exact
    within-group pair set (dedup groupBy on the content key → pair
    self-join of a tiny table), which DuckDB recomputes from group
    arithmetic. Deterministic: the key never leaves Spark; only its
    EQUALITY structure is compared."""
    from gfw_data_api_spark.llmops.video import encode_avi_mjpeg, video_content_keys

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id")
    )

    def synth(batches):
        import numpy as np

        from gfw_data_api_spark.llmops.jpeg import encode_jpeg

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                rng = np.random.default_rng(d % 25 * 6151 + 13)
                frames = [
                    encode_jpeg(rng.integers(0, 256, (8, 8)).astype(np.uint8), quality=90)
                    for _ in range(3)
                ]
                payloads.append(
                    bytearray(encode_avi_mjpeg(frames, 5.0 + d % 7, 8, 8))
                )
            pdf = pdf.copy()
            pdf["payload"] = payloads
            yield pdf

    from gfw_data_api_spark.llmops.dedup import _persist_replacing

    avis = docs.mapInPandas(synth, schema="doc_id bigint, payload binary")
    # pin: both sides of the pair self-join read the decoded keys
    keyed = _persist_replacing(
        video_content_keys(avis).select("doc_id", "video_key"), "m06_keys"
    )
    pairs = (
        keyed.alias("a")
        .join(
            keyed.alias("b"),
            (F.col("a.video_key") == F.col("b.video_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    return pairs


_SPECS.append(
    QuerySpec(
        name="m06_video_remux_dedup",
        spark_fn=_m06,
        oracle=(
            "WITH d AS (SELECT doc_id, doc_id % 25 AS grp "
            "FROM documents WHERE doc_id % 10 = 0) "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b "
            "FROM d a JOIN d b ON a.grp = b.grp AND a.doc_id < b.doc_id"
        ),
        survey_ref="multimodal dedup: remux-invariant video content keys "
        "(llmops/video.video_content_keys) — decoded-pixel hash collapses "
        "container variants byte-level sha misses",
    )
)


def _d12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin prefix-filtered EXACT Jaccard pairs (llmops/dedup.
    ppjoin_pairs): the no-knob exact alternative to d03's df-capped
    inverted index — prefixes are dominated by RARE shingles, so hot
    phrases never drive the join while the result stays the true
    Jaccard relation, which DuckDB recomputes directly (same oracle
    family as d03, no cap clause). Threshold 0.8: prefix length is
    (1−t)·n+1, so prefix filtering is the HIGH-threshold algorithm —
    at t=0.8 each doc indexes ~20% of its shingles. Shingle order 4
    matters just as much on THIS corpus: its tiny word vocabulary makes
    every bigram corpus-hot (df≈100 — prefix filtering, which lives on
    long-tail vocabularies, degenerates to an all-pairs join, measured
    4.4M candidates), while 4-gram cardinality restores the long tail
    the algorithm is built for."""
    from gfw_data_api_spark.llmops.dedup import ppjoin_pairs

    docs = load_table(spark, sf_dir, "documents", fanout=True)
    return ppjoin_pairs(docs, shingle_n=4, threshold=0.8)


_SPECS.append(
    QuerySpec(
        name="d12_ppjoin_pairs",
        spark_fn=_d12,
        oracle=(
            "WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t "
            "FROM documents), "
            "sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 2), "
            "i -> array_to_string(t[i:i+3], ' ')))) AS s FROM toks), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), "
            "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared "
            "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT id_a, id_b, CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) AS jaccard "
            "FROM inter JOIN sizes sa ON sa.doc_id = id_a "
            "JOIN sizes sb ON sb.doc_id = id_b "
            "WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.8"
        ),
        survey_ref="dedup: PPJoin prefix-filtered exact Jaccard join "
        "(Xiao et al. 2008) — rare-shingle prefixes bound the join with "
        "no df-cap approximation",
    )
)


def _st08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-media dedup composition, batch-twin gated: synthesized
    WAV payloads (m05's gain-scaled groups — every byte stream differs)
    are fingerprinted (llmops/audio) and deduplicated on the
    PERCEPTUAL key with streaming/dedup.dedup_events — the same call
    that runs dropDuplicatesWithinWatermark on a live stream runs the
    deterministic first-occurrence relation on this batch twin (test
    proves stream==batch; st04/st06 pattern). Survivors are exactly one
    doc per gain-group: min doc_id, which DuckDB recomputes from group
    arithmetic."""
    from gfw_data_api_spark.llmops.audio import audio_fingerprints
    from gfw_data_api_spark.streaming.dedup import dedup_events

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id")
    )

    wavs = docs.mapInPandas(_gain_group_wav_synth, schema="doc_id bigint, payload binary")
    keyed = audio_fingerprints(wavs).select("doc_id", "afp")
    survivors = dedup_events(keyed, keys=["afp"], ts_col="doc_id")
    return survivors.select("doc_id").orderBy("doc_id")


_SPECS.append(
    QuerySpec(
        name="st08_media_stream_dedup",
        spark_fn=_st08,
        oracle=(
            "WITH d AS (SELECT doc_id, doc_id % 25 AS grp "
            "FROM documents WHERE doc_id % 10 = 0) "
            "SELECT min(doc_id) AS doc_id FROM d GROUP BY grp ORDER BY doc_id"
        ),
        survey_ref="streaming × multimodal: perceptual-key media dedup "
        "(audio fingerprints + bounded-state stream dedup; batch twin "
        "oracled, stream==batch pinned in tests)",
    )
)


def _t19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary statistics (llmops/text.vocabulary_stats): totals,
    hapax legomena, type-token ratio, Zipf-head share — exact integers
    plus two single divisions, one explode + one frequency aggregation
    with a TakeOrdered head (no global sort)."""
    from gfw_data_api_spark.llmops.text import vocabulary_stats

    return vocabulary_stats(load_table(spark, sf_dir, "documents", fanout=True))


_SPECS.append(
    QuerySpec(
        name="t19_vocabulary_stats",
        spark_fn=_t19,
        oracle=(
            "WITH tok AS (SELECT unnest(list_filter(regexp_split_to_array("
            "lower(trim(text)), '\\s+'), x -> x <> '')) AS t FROM documents), "
            "freq AS (SELECT t, count(*) AS c FROM tok GROUP BY t), "
            "totals AS (SELECT CAST(sum(c) AS BIGINT) AS total_tokens, "
            "count(*) AS distinct_tokens, "
            "CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_count "
            "FROM freq), "
            "top10 AS (SELECT CAST(sum(c) AS BIGINT) AS top10_tokens FROM "
            "(SELECT c, t FROM freq ORDER BY c DESC, t LIMIT 10)) "
            "SELECT total_tokens, distinct_tokens, hapax_count, "
            "round(distinct_tokens / CAST(total_tokens AS DOUBLE), 6) AS type_token_ratio, "
            "round(top10_tokens / CAST(total_tokens AS DOUBLE), 6) AS top10_share "
            "FROM totals, top10"
        ),
        survey_ref="text analysis: vocabulary statistics (Heaps/Zipf corpus "
        "metrics — hapax share, type-token ratio, head concentration)",
    )
)


def _t18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card corpus report (llmops/text.corpus_report): doc/token
    volumes, exact interpolated length percentiles, language makeup +
    Shannon entropy — two aggregations, long (metric, value) output,
    1-row-broadcast total for the entropy fractions (no unpartitioned
    window)."""
    from gfw_data_api_spark.llmops.text import corpus_report

    docs = load_table(spark, sf_dir, "documents")
    return corpus_report(docs).select("metric", F.round("value", 6).alias("value"))


_SPECS.append(
    QuerySpec(
        name="t18_corpus_report",
        spark_fn=_t18,
        oracle=(
            "WITH base AS (SELECT doc_id, CAST(len(list_filter("
            "regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS DOUBLE) AS nt, "
            "CAST(length(text) AS DOUBLE) AS nc, lang FROM documents), "
            "doc AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, sum(nt) AS total_tokens, "
            "sum(nt) / count(*) AS mean_tokens, quantile_cont(nt, 0.5) AS p50_tokens, "
            "quantile_cont(nt, 0.95) AS p95_tokens, min(nt) AS min_tokens, "
            "max(nt) AS max_tokens, sum(nc) / sum(nt) AS chars_per_token FROM base), "
            "langc AS (SELECT lang, count(*) AS c FROM base GROUP BY lang), "
            "tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM langc), "
            "langs AS (SELECT CAST(count(*) AS DOUBLE) AS distinct_langs, "
            "max(c) / max(t) AS top_lang_share, "
            "-sum((c / t) * ln(c / t)) AS lang_entropy FROM langc, tot) "
            "SELECT 'n_docs' AS metric, round(n_docs, 6) AS value FROM doc "
            "UNION ALL SELECT 'total_tokens', round(total_tokens, 6) FROM doc "
            "UNION ALL SELECT 'mean_tokens', round(mean_tokens, 6) FROM doc "
            "UNION ALL SELECT 'p50_tokens', round(p50_tokens, 6) FROM doc "
            "UNION ALL SELECT 'p95_tokens', round(p95_tokens, 6) FROM doc "
            "UNION ALL SELECT 'min_tokens', round(min_tokens, 6) FROM doc "
            "UNION ALL SELECT 'max_tokens', round(max_tokens, 6) FROM doc "
            "UNION ALL SELECT 'chars_per_token', round(chars_per_token, 6) FROM doc "
            "UNION ALL SELECT 'distinct_langs', round(distinct_langs, 6) FROM langs "
            "UNION ALL SELECT 'top_lang_share', round(top_lang_share, 6) FROM langs "
            "UNION ALL SELECT 'lang_entropy', round(lang_entropy, 6) FROM langs"
        ),
        survey_ref="LLM pipeline: dataset-card corpus report (volumes, exact "
        "percentiles, language entropy) in two aggregations",
    )
)


def _t17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram LM self-scoring
    (llmops/text.kneser_ney_bigram_scores). All model quantities are
    integer counts; P is the same IEEE double expression in both
    engines (the oracle writes 0.75e0 so DuckDB stays in DOUBLE, not
    DECIMAL); the one order-sensitive float sum is gated after
    round(·, 4) with ~1e9× error margin."""
    from gfw_data_api_spark.llmops.text import kneser_ney_bigram_scores

    docs = load_table(spark, sf_dir, "documents")
    out = kneser_ney_bigram_scores(docs)
    return out.select(
        "doc_id",
        "n_bigrams",
        "distinct_bigrams",
        F.round("kn_avg_logprob", 4).alias("kn_avg_logprob"),
    )


_SPECS.append(
    QuerySpec(
        name="t17_kneser_ney_lm",
        spark_fn=_t17,
        oracle=(
            "WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t "
            "FROM documents), "
            "occ AS (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS bg "
            "FROM toks, unnest(range(1, len(t))) AS u(i)), "
            "tf AS (SELECT doc_id, bg, count(*) AS tf FROM occ GROUP BY doc_id, bg), "
            "bgc AS (SELECT bg, count(*) AS c2 FROM occ GROUP BY bg), "
            "nt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM bgc), "
            "lft AS (SELECT split_part(bg, ' ', 1) AS w1, sum(c2) AS c1, "
            "count(*) AS n1fw FROM bgc GROUP BY 1), "
            "rgt AS (SELECT split_part(bg, ' ', 2) AS w2, count(*) AS n1bw "
            "FROM bgc GROUP BY 1), "
            "model AS (SELECT bg, (c2 - 0.75e0) / c1 + 0.75e0 * n1fw / c1 * (n1bw / nt.n) AS p "
            "FROM bgc JOIN lft ON split_part(bg, ' ', 1) = lft.w1 "
            "JOIN rgt ON split_part(bg, ' ', 2) = rgt.w2, nt) "
            "SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams, "
            "count(*) AS distinct_bigrams, "
            "round(sum(tf * ln(p)) / sum(tf), 4) AS kn_avg_logprob "
            "FROM tf JOIN model USING (bg) GROUP BY doc_id"
        ),
        survey_ref="LLM pipeline: interpolated Kneser–Ney bigram LM quality "
        "scoring (continuation-count smoothing; one persisted occurrence "
        "explode, vocabulary-sized model tables)",
    )
)


def _t16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch training-order shuffle
    (llmops/sampling.epoch_shuffle): md5(seed:id) ordering is a
    reproducible permutation per epoch, identical across engines,
    cluster sizes, and reruns — the resumable-training property
    random() cannot give. Plan: one range-partitioned sort, no global
    window."""
    from gfw_data_api_spark.llmops.sampling import epoch_shuffle

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return epoch_shuffle(docs, seed=3).limit(200)


_SPECS.append(
    QuerySpec(
        name="t16_epoch_shuffle",
        spark_fn=_t16,
        oracle=(
            "SELECT doc_id, md5('3:' || CAST(doc_id AS VARCHAR)) AS shuffle_key "
            "FROM documents ORDER BY shuffle_key, doc_id LIMIT 200"
        ),
        survey_ref="training-data ops: deterministic epoch shuffle "
        "(reproducible md5 permutation, range-partitioned sort)",
    )
)


def _p04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 composed curation: Unicode normalization → token-count
    floor → exact dedup ON THE NORMALIZED TEXT (the realistic dedup key:
    byte-different docs that normalize identically collapse) → per-
    language survivor report. One lazy plan across three round-4/earlier
    operators; every stage is SQL-expressible, so the whole composition
    has a full oracle — the p01/p02/p03 pattern extended to the
    normalization family."""
    from gfw_data_api_spark.llmops.clean import normalize_text_col
    from gfw_data_api_spark.llmops.text import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    decorated = F.concat(F.lit(_C03_PREFIX), F.col("text"), F.lit(_C03_SUFFIX))
    base = docs.select(
        "doc_id", "lang", normalize_text_col(decorated).alias("norm_text")
    )
    n_tokens = F.size(
        F.filter(tokens_col(F.col("norm_text")), lambda t: t != F.lit(""))
    ).cast("bigint")
    filtered = base.withColumn("n_tokens", n_tokens).filter(F.col("n_tokens") >= 30)
    kept = filtered.groupBy("norm_text").agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by("lang", "doc_id").alias("lang"),
        F.min_by("n_tokens", "doc_id").alias("n_tokens"),
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("lang")
    )


_SPECS.append(
    QuerySpec(
        name="p04_curate_normalized",
        spark_fn=_p04,
        oracle=(
            "WITH norm AS (SELECT doc_id, lang, "
            + _c03_norm_sql()
            + " AS norm_text FROM documents), "
            "tok AS (SELECT doc_id, lang, norm_text, "
            "CAST(len(list_filter(regexp_split_to_array(trim(norm_text), '\\s+'), "
            "x -> x <> '')) AS BIGINT) AS n_tokens FROM norm), "
            "filt AS (SELECT * FROM tok WHERE n_tokens >= 30), "
            "kept AS (SELECT min(doc_id) AS doc_id, min_by(lang, doc_id) AS lang, "
            "min_by(n_tokens, doc_id) AS n_tokens FROM filt GROUP BY norm_text) "
            "SELECT lang, count(*) AS n_docs, "
            "CAST(sum(n_tokens) AS BIGINT) AS total_tokens "
            "FROM kept GROUP BY lang ORDER BY lang"
        ),
        survey_ref="composed curation over the round-4 normalization family: "
        "normalize → token floor → normalized-text dedup → language report, "
        "one lazy plan, full oracle",
    )
)


def _m04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup detection inside the hard gate.

    Each selected document becomes a PNG whose pixels depend only on its
    group (doc_id % 25) plus a per-doc uniform brightness shift — bytes
    differ, so sha-based exact dedup CANNOT pair them, but dHash (bit =
    adjacent-column comparison) and pHash (AC coefficients + AC median)
    are exactly invariant to uniform shifts (resize uses half-up
    rounding, so integer shifts commute through the whole pipeline).
    The expected pair set is therefore EXACTLY the within-group pairs at
    Hamming 0 on both hashes; cross-group fingerprints are ≥18 bits
    apart (deterministic images, verified constants). DuckDB recomputes
    the pair set from the group arithmetic alone."""
    from gfw_data_api_spark.llmops.phash import (
        perceptual_hashes,
        perceptual_neardup_pairs,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id")
    )

    def synth(batches):
        import numpy as np

        from gfw_data_api_spark.llmops.multimodal import encode_png

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                rng = np.random.default_rng(d % 25 * 9973 + 7)
                base = rng.integers(30, 221, (8, 9)).astype(np.uint8)
                payloads.append(bytearray(encode_png(base + d % 7)))
            pdf = pdf.copy()
            pdf["payload"] = payloads
            yield pdf

    from gfw_data_api_spark.llmops.dedup import _persist_replacing

    imgs = docs.mapInPandas(synth, schema="doc_id bigint, payload binary")
    # persist the hashed table: the banded self-join + two phash joins
    # consume it from EIGHT plan branches, and without pinning each one
    # re-runs the Python decode+hash stage (plan-audit finding)
    hashed = _persist_replacing(
        imgs.transform(perceptual_hashes).select(
            "doc_id", "dhash", "phash"
        ),
        "m04_hashes",
    )
    pairs = perceptual_neardup_pairs(hashed, "dhash", id_col="doc_id")
    ph = hashed.select("doc_id", "phash")
    return (
        pairs.join(ph.withColumnRenamed("doc_id", "id_a"), "id_a")
        .withColumnRenamed("phash", "_ph_a")
        .join(ph.withColumnRenamed("doc_id", "id_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.col("hamming").cast("int").alias("hamming"),
            F.bit_count(F.col("_ph_a").bitwiseXOR(F.col("phash")))
            .cast("int")
            .alias("phash_hamming"),
        )
    )


_SPECS.append(
    QuerySpec(
        name="m04_perceptual_neardups",
        spark_fn=_m04,
        oracle=(
            "WITH d AS (SELECT doc_id, doc_id % 25 AS grp "
            "FROM documents WHERE doc_id % 10 = 0) "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "CAST(0 AS INTEGER) AS hamming, CAST(0 AS INTEGER) AS phash_hamming "
            "FROM d a JOIN d b ON a.grp = b.grp AND a.doc_id < b.doc_id"
        ),
        survey_ref="multimodal dedup: dHash/pHash perceptual near-dups "
        "(llmops/phash.py) — banded pigeonhole join, exact planted-group oracle",
    )
)


# ---------------------------------------------------------------------------
# Round-5: geometry family hard gates (planted analytic fixtures — the
# m02/m05 pattern applied to Q4/E5/E7/R9: closed-form planted geometry
# whose expected output is exact arithmetic an independent engine can
# recompute; libm bit-identity between CPython and DuckDB in this
# container is probed by tests/test_geometry_gates.py)
# ---------------------------------------------------------------------------


def _q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 spatial filter through the FULL guarded path: planted WKB points
    (coordinates are exact dyadic rationals derived from customer keys,
    never within 0.25° of the query box boundary) + a gfw_bbox column, an
    axis-aligned Polygon query geometry, execute_on_dataframe with
    geometry= — the same injection the reference performs in
    queries.py:238-266 (ST_Intersects(geom, ...)). The surviving id set
    is pure rational arithmetic for the oracle; both the JVM bbox
    prefilter and the exact pandas-UDF intersects predicate run."""
    from gfw_data_api_spark.functions.geo_udfs import make_point_wkb

    pts = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 13 % 720) / 2.0 - 180.0 + 0.25).alias("lon"),
        ((F.col("c_custkey") * 7 % 360) / 2.0 - 90.0 + 0.25).alias("lat"),
    )
    pts = pts.withColumn("geom", make_point_wkb(F.col("lon"), F.col("lat"))).withColumn(
        "gfw_bbox", F.array("lon", "lat", "lon", "lat")
    )
    box = {
        "type": "Polygon",
        "coordinates": [
            [[-30.0, -20.0], [40.0, -20.0], [40.0, 25.0], [-30.0, 25.0], [-30.0, -20.0]]
        ],
    }
    return execute_on_dataframe(
        spark, pts, "SELECT c_custkey, lon, lat FROM pts", geometry=box
    )


_SPECS.append(
    QuerySpec(
        name="q27_spatial_filter_box",
        spark_fn=_q27,
        oracle=(
            "WITH pts AS (SELECT c_custkey, "
            "(c_custkey * 13 % 720) / 2.0 - 180.0 + 0.25 AS lon, "
            "(c_custkey * 7 % 360) / 2.0 - 90.0 + 0.25 AS lat FROM customer) "
            "SELECT c_custkey, lon, lat FROM pts "
            "WHERE lon > -30.0 AND lon < 40.0 AND lat > -20.0 AND lat < 25.0"
        ),
        survey_ref="Q4 spatial filter injection inside the hard gate "
        "(sql/guard.py + operators/query.py filter_by_geometry: bbox "
        "prefilter + exact intersects UDF; reference queries.py:238-266)",
    )
)


def _e11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 gfw-field derivation inside the hard gate: planted lat-band
    rectangles (integer-degree corners from supplier keys) built as
    GeoJSON in-plan, pushed through the REAL add_gfw_fields path
    (st_area_ha spherical ring formula + st_bbox). A rectangle's
    Chamberlain–Duquette area reduces to two nonzero edge terms whose
    float evaluation the oracle mirrors op-for-op:
    abs((radians(w)·((2+sin φ₁)+sin φ₁) + radians(−w)·((2+sin φ₂)+sin φ₂))
    · R · R / 2) / 10⁴ — sin/radians are bit-identical across CPython and
    DuckDB here (shared libm; probed in tests)."""
    from gfw_data_api_spark.functions.geo_udfs import st_geomfromgeojson
    from gfw_data_api_spark.sources.vector import add_gfw_fields

    rect = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 11 % 340) - 170).alias("l1"),
        (1 + F.col("s_suppkey") % 7).alias("w"),
        ((F.col("s_suppkey") * 17 % 150) - 80).alias("p1"),
        (1 + F.col("s_suppkey") % 5).alias("h"),
    )
    rect = rect.withColumn("l2", F.col("l1") + F.col("w")).withColumn(
        "p2", F.col("p1") + F.col("h")
    )
    gj = F.format_string(
        '{"type": "Polygon", "coordinates": '
        "[[[%d, %d], [%d, %d], [%d, %d], [%d, %d], [%d, %d]]]}",
        "l1", "p1", "l2", "p1", "l2", "p2", "l1", "p2", "l1", "p1",
    )
    out = add_gfw_fields(rect.withColumn("geom", st_geomfromgeojson(gj)))
    return out.select(
        "s_suppkey",
        F.round("gfw_area__ha", 4).alias("area_ha"),
        F.element_at("gfw_bbox", 1).alias("xmin"),
        F.element_at("gfw_bbox", 2).alias("ymin"),
        F.element_at("gfw_bbox", 3).alias("xmax"),
        F.element_at("gfw_bbox", 4).alias("ymax"),
    )


_SPECS.append(
    QuerySpec(
        name="e11_gfw_area_geodesic",
        spark_fn=_e11,
        oracle=(
            "WITH p AS (SELECT s_suppkey, "
            "CAST((s_suppkey * 11 % 340) - 170 AS DOUBLE) AS l1, "
            "CAST(1 + s_suppkey % 7 AS DOUBLE) AS w, "
            "CAST((s_suppkey * 17 % 150) - 80 AS DOUBLE) AS p1, "
            "CAST(1 + s_suppkey % 5 AS DOUBLE) AS h FROM supplier) "
            "SELECT s_suppkey, "
            "round(abs(((radians(w) * ((2.0 + sin(radians(p1))) + sin(radians(p1)))) "
            "+ (radians(-w) * ((2.0 + sin(radians(p1 + h))) + sin(radians(p1 + h))))) "
            "* 6371008.8 * 6371008.8 / 2.0) / 10000.0, 4) AS area_ha, "
            "l1 AS xmin, p1 AS ymin, l1 + w AS xmax, p1 + h AS ymax FROM p"
        ),
        survey_ref="E5 gfw_area__ha + gfw_bbox derivation inside the hard "
        "gate (sources/vector.py add_gfw_fields, functions/geometry.py "
        "geodesic_area_ha; reference batch/scripts/_fill_gfw_fields_sql.sh "
        "ST_Area(geom::geography)/10000)",
    )
)


def _e12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 web-mercator reprojection inside the hard gate: planted points
    spanning ±89.75° latitude (so the ±85.05112878° clip executes on
    real rows), projected by the REAL wkb_to_web_mercator pandas UDF.
    The oracle mirrors the forward formula op-for-op:
    x = R·radians(λ), y = R·ln(tan(π/4 + radians(clip(φ))/2))."""
    from gfw_data_api_spark.functions.geo_udfs import make_point_wkb, st_x, st_y
    from gfw_data_api_spark.sources.vector import wkb_to_web_mercator

    pts = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 19 % 720) / 2.0 - 180.0 + 0.25).alias("lon"),
        ((F.col("c_custkey") * 7 % 360) / 2.0 - 90.0 + 0.25).alias("lat"),
    )
    wm = pts.withColumn(
        "geom_wm", wkb_to_web_mercator(make_point_wkb(F.col("lon"), F.col("lat")))
    )
    return wm.select(
        "c_custkey",
        F.round(st_x(F.col("geom_wm")), 3).alias("x_m"),
        F.round(st_y(F.col("geom_wm")), 3).alias("y_m"),
    )


_SPECS.append(
    QuerySpec(
        name="e12_web_mercator_forward",
        spark_fn=_e12,
        oracle=(
            "WITH pts AS (SELECT c_custkey, "
            "(c_custkey * 19 % 720) / 2.0 - 180.0 + 0.25 AS lon, "
            "(c_custkey * 7 % 360) / 2.0 - 90.0 + 0.25 AS lat FROM customer), "
            "c AS (SELECT c_custkey, lon, "
            "greatest(least(lat, 85.05112878), -85.05112878) AS latc FROM pts) "
            "SELECT c_custkey, round(6378137.0 * radians(lon), 3) AS x_m, "
            "round(6378137.0 * ln(tan(pi() / 4.0 + radians(latc) / 2.0)), 3) AS y_m "
            "FROM c"
        ),
        survey_ref="E7 reproject+clip web-mercator inside the hard gate "
        "(sources/vector.py wkb_to_web_mercator; reference "
        "batch/scripts/clip_and_reproject_geom.sh ST_Transform to 3857 "
        "with ±85.05° clip)",
    )
)


def _r09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R9 geometry clip inside the hard gate: a planted 10°/40px tile set
    (pixel centers are exact dyadic rationals derived from event ids over
    four tiles) masked by an axis-aligned Polygon through the REAL
    _geometry_mask — one tile takes the full-tile fast path (all corners
    inside, no edge crossing), two take the partial path's bbox+pip
    pandas UDF, and the 9-tile bbox overlap includes pixel-free tiles.
    Pixel membership is strict-inequality rational arithmetic for the
    oracle (centers sit on the x.125/x.375 grid, the box on x.5)."""
    from gfw_data_api_spark.functions import geometry as geo
    from gfw_data_api_spark.raster.grid import Grid
    from gfw_data_api_spark.raster.pixels import with_pixel_coordinates
    from gfw_data_api_spark.raster.zonal import _geometry_mask

    grid = Grid.parse("10/40")
    tiles4 = F.array(
        F.lit("10N_000E"), F.lit("10N_010E"), F.lit("20N_000E"), F.lit("20N_010E")
    )
    ev = load_table(spark, sf_dir, "events").select(
        F.element_at(tiles4, (F.col("event_id") % 4).cast("int") + 1).alias("tile_id"),
        # multiplicative spread so every tile row/col band is populated
        # even at the smallest SF's id range
        (F.col("event_id") * 7 % 1600).alias("pixel_id"),
    )
    px = with_pixel_coordinates(ev, grid)
    geometry = {
        "type": "Polygon",
        "coordinates": [
            [[-0.5, -0.5], [15.5, -0.5], [15.5, 10.5], [-0.5, 10.5], [-0.5, -0.5]]
        ],
    }
    tiles = grid.tiles_overlapping(geo.bbox(geometry))
    out = _geometry_mask(px, geometry, grid, tiles)
    return out.groupBy("tile_id").agg(
        F.count("*").alias("n_pixels"),
        F.sum("pixel_id").alias("sum_pixel_id"),
        F.min("latitude").alias("min_lat"),
        F.max("latitude").alias("max_lat"),
        F.min("longitude").alias("min_lon"),
        F.max("longitude").alias("max_lon"),
    )


_SPECS.append(
    QuerySpec(
        name="r09_geometry_clip",
        spark_fn=_r09,
        oracle=(
            "WITH px AS (SELECT "
            "CASE event_id % 4 WHEN 0 THEN '10N_000E' WHEN 1 THEN '10N_010E' "
            "WHEN 2 THEN '20N_000E' ELSE '20N_010E' END AS tile_id, "
            "event_id * 7 % 1600 AS pixel_id FROM events), "
            "c AS (SELECT tile_id, pixel_id, "
            "(CASE WHEN tile_id IN ('10N_000E', '10N_010E') THEN 10.0 ELSE 20.0 END) "
            "- (CAST(floor(pixel_id / 40) AS BIGINT) + 0.5) * 0.25 AS latitude, "
            "(CASE WHEN tile_id IN ('10N_000E', '20N_000E') THEN 0.0 ELSE 10.0 END) "
            "+ ((pixel_id % 40) + 0.5) * 0.25 AS longitude FROM px) "
            "SELECT tile_id, count(*) AS n_pixels, "
            "CAST(sum(pixel_id) AS BIGINT) AS sum_pixel_id, "
            "min(latitude) AS min_lat, max(latitude) AS max_lat, "
            "min(longitude) AS min_lon, max(longitude) AS max_lon FROM c "
            "WHERE longitude > -0.5 AND longitude < 15.5 "
            "AND latitude > -0.5 AND latitude < 10.5 GROUP BY tile_id"
        ),
        survey_ref="R9 geometry clip inside the hard gate (raster/zonal.py "
        "_geometry_mask: full-tile fast path + partial-tile bbox/pip; "
        "raster/pixels.py coordinate math; reference raster query mask)",
    )
)


# Geodesic pixel-area constant mirrored into the r07 oracle: the EXACT
# double Spark's area_ha_col folds into the plan (EARTH_RADIUS_M² · Δλ),
# embedded via repr so DuckDB parses the identical bit pattern.
def _r07_area_const() -> float:
    import numpy as np

    from gfw_data_api_spark.functions.geometry import EARTH_RADIUS_M

    return EARTH_RADIUS_M**2 * float(np.radians(0.25))


def _r07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R7 reserved-column math inside the hard gate: planted pixels over
    three tiles (N/E, S/W, and a high-latitude tile so the sin band gets
    small) through the REAL with_pixel_coordinates — latitude/longitude
    are exact dyadic rationals, area__ha is the spherical-strip formula
    the oracle mirrors op-for-op (round-4dp per pixel, DECIMAL sum so
    accumulation order cannot matter). Reference queries.py:138-143
    (reserved area__ha/latitude/longitude virtual columns)."""
    from gfw_data_api_spark.raster.grid import Grid
    from gfw_data_api_spark.raster.pixels import with_pixel_coordinates

    grid = Grid.parse("10/40")
    tiles3 = F.array(F.lit("10N_000E"), F.lit("20S_010W"), F.lit("80N_170W"))
    ev = load_table(spark, sf_dir, "events").select(
        F.element_at(tiles3, (F.col("event_id") % 3).cast("int") + 1).alias("tile_id"),
        (F.col("event_id") * 7 % 1600).alias("pixel_id"),
    )
    px = with_pixel_coordinates(ev, grid)
    area_r = F.round("area__ha", 4)
    return px.groupBy("tile_id").agg(
        F.count("*").alias("n_pixels"),
        F.sum(area_r.cast("decimal(18,4)")).cast("double").alias("sum_area_ha"),
        F.min(area_r).alias("min_area_ha"),
        F.max(area_r).alias("max_area_ha"),
        F.min("latitude").alias("min_lat"),
        F.max("longitude").alias("max_lon"),
    )


_SPECS.append(
    QuerySpec(
        name="r07_pixel_area",
        spark_fn=_r07,
        oracle=(
            "WITH px AS (SELECT "
            "CASE event_id % 3 WHEN 0 THEN '10N_000E' WHEN 1 THEN '20S_010W' "
            "ELSE '80N_170W' END AS tile_id, "
            "event_id * 7 % 1600 AS pixel_id FROM events), "
            "c AS (SELECT tile_id, "
            "(CASE tile_id WHEN '10N_000E' THEN 10.0 WHEN '20S_010W' THEN -20.0 "
            "ELSE 80.0 END) - (CAST(floor(pixel_id / 40) AS BIGINT) + 0.5) * 0.25 AS latitude, "
            "(CASE tile_id WHEN '10N_000E' THEN 0.0 WHEN '20S_010W' THEN -10.0 "
            "ELSE -170.0 END) + ((pixel_id % 40) + 0.5) * 0.25 AS longitude FROM px), "
            f"a AS (SELECT tile_id, latitude, longitude, round(abs({_r07_area_const()!r} "
            "* (sin(radians(latitude + 0.125)) - sin(radians(latitude - 0.125)))) "
            "/ 10000.0, 4) AS area_ha FROM c) "
            "SELECT tile_id, count(*) AS n_pixels, "
            "CAST(sum(CAST(area_ha AS DECIMAL(18,4))) AS DOUBLE) AS sum_area_ha, "
            "min(area_ha) AS min_area_ha, max(area_ha) AS max_area_ha, "
            "min(latitude) AS min_lat, max(longitude) AS max_lon FROM a GROUP BY tile_id"
        ),
        survey_ref="R7 reserved area__ha/latitude/longitude virtual columns "
        "inside the hard gate (raster/pixels.py with_pixel_coordinates, "
        "area_ha_col spherical strip; reference queries.py:138-143)",
    )
)


def _r10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R10 batch list query inside the hard gate: a planted 40×40 tile
    (value = (row·40+col)·7 % 97 + 1, never no_data) ingested through the
    REAL registry/ingest path, then ONE batch_query over two overlapping
    axis-aligned boxes — the union-extent assembly, per-feature bbox+pip
    tagging (a pixel inside both boxes yields two tagged rows), and the
    feature_id GROUP BY injection all execute. Planted centers sit on the
    x.125 grid, boxes on x.5, so membership is strict-inequality rational
    arithmetic for the oracle. Reference queries.py:300-427 (POST
    /query/batch fan-out, re-expressed as one Spark job)."""
    import numpy as np

    from gfw_data_api_spark.catalog.registry import Registry
    from gfw_data_api_spark.raster.batch import batch_query
    from gfw_data_api_spark.raster.grid import Grid
    from gfw_data_api_spark.raster.ingest import ingest_raster_tiles

    grid = Grid.parse("10/40")
    idx = np.arange(1600, dtype=np.int64).reshape(40, 40)
    vals = (idx * 7 % 97 + 1).astype(np.float64)
    registry = Registry(tempfile.mkdtemp(prefix="gfw_r10_"))
    ingest_raster_tiles(
        registry, spark, "planted", "v1", grid, "year", {"10N_000E": vals}
    )
    features = [
        {
            "type": "Polygon",
            "coordinates": [
                [[0.5, 0.5], [4.5, 0.5], [4.5, 3.5], [0.5, 3.5], [0.5, 0.5]]
            ],
        },
        {
            "type": "Polygon",
            "coordinates": [
                [[3.5, 2.5], [9.5, 2.5], [9.5, 9.5], [3.5, 9.5], [3.5, 2.5]]
            ],
        },
    ]
    sql = (
        "SELECT count(*) AS n_pixels, CAST(sum(planted__year) AS BIGINT) AS sum_val, "
        "CAST(min(planted__year) AS BIGINT) AS min_val, "
        "CAST(max(planted__year) AS BIGINT) AS max_val FROM data"
    )
    result, failed = batch_query(spark, registry, "planted", "v1", sql, features)
    assert failed == []
    return result


_SPECS.append(
    QuerySpec(
        name="r10_batch_list_query",
        spark_fn=_r10,
        oracle=(
            "WITH f AS (SELECT * FROM (VALUES (0, 0.5, 0.5, 4.5, 3.5), "
            "(1, 3.5, 2.5, 9.5, 9.5)) AS t(feature_id, x0, y0, x1, y1)), "
            "px AS (SELECT ((i % 40) + 0.5) * 0.25 AS lon, "
            "10.0 - (CAST(floor(i / 40) AS BIGINT) + 0.5) * 0.25 AS lat, "
            "(i * 7) % 97 + 1 AS v FROM range(0, 1600) t(i)), "
            "m AS (SELECT feature_id, v FROM f JOIN px "
            "ON lon > x0 AND lon < x1 AND lat > y0 AND lat < y1) "
            "SELECT feature_id, count(*) AS n_pixels, "
            "CAST(sum(v) AS BIGINT) AS sum_val, CAST(min(v) AS BIGINT) AS min_val, "
            "CAST(max(v) AS BIGINT) AS max_val FROM m GROUP BY feature_id"
        ),
        survey_ref="R10 batch list query inside the hard gate "
        "(raster/batch.py batch_query: one job over N features; reference "
        "queries.py:300-427 POST /query/batch)",
    )
)


def _r11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R11 version overrides inside the hard gate: the aux dataset is
    ingested at v1 AND v2 (different planted values, latest → v2); the
    same batch zonal query runs twice through the REAL data-environment
    resolution — once with version_overrides={'aux': 'v1'}, once
    defaulting to latest — and the two arms must aggregate DIFFERENT
    closed-form sums. Reference query param `x-version-override`
    (data_environment construction, app/routes/datasets/queries.py)."""
    import numpy as np

    from gfw_data_api_spark.catalog.registry import Registry
    from gfw_data_api_spark.raster.batch import batch_query
    from gfw_data_api_spark.raster.grid import Grid
    from gfw_data_api_spark.raster.ingest import ingest_raster_tiles

    grid = Grid.parse("10/40")
    idx = np.arange(1600, dtype=np.int64).reshape(40, 40)
    registry = Registry(tempfile.mkdtemp(prefix="gfw_r11_"))
    ingest_raster_tiles(
        registry, spark, "planted", "v1", grid, "year",
        {"10N_000E": (idx * 7 % 97 + 1).astype(np.float64)},
    )
    ingest_raster_tiles(
        registry, spark, "aux", "v1", grid, "year",
        {"10N_000E": (idx % 31 + 1).astype(np.float64)},
    )
    ingest_raster_tiles(
        registry, spark, "aux", "v2", grid, "year",
        {"10N_000E": (idx % 17 + 3).astype(np.float64)},
    )
    feature = {
        "type": "Polygon",
        "coordinates": [
            [[0.5, 0.5], [6.5, 0.5], [6.5, 7.5], [0.5, 7.5], [0.5, 0.5]]
        ],
    }
    sql = (
        "SELECT count(*) AS n_pixels, CAST(sum(aux__year) AS BIGINT) AS sum_aux "
        "FROM data"
    )
    overridden, f1 = batch_query(
        spark, registry, "planted", "v1", sql, [feature],
        version_overrides={"aux": "v1"},
    )
    latest, f2 = batch_query(spark, registry, "planted", "v1", sql, [feature])
    assert f1 == [] and f2 == []
    return overridden.withColumn("arm", F.lit("v1_override")).unionByName(
        latest.withColumn("arm", F.lit("latest_v2"))
    )


_SPECS.append(
    QuerySpec(
        name="r11_version_overrides",
        spark_fn=_r11,
        oracle=(
            "WITH px AS (SELECT ((i % 40) + 0.5) * 0.25 AS lon, "
            "10.0 - (CAST(floor(i / 40) AS BIGINT) + 0.5) * 0.25 AS lat, "
            "(i % 31) + 1 AS v1, (i % 17) + 3 AS v2 FROM range(0, 1600) t(i)), "
            "m AS (SELECT v1, v2 FROM px WHERE lon > 0.5 AND lon < 6.5 "
            "AND lat > 0.5 AND lat < 7.5) "
            "SELECT 0 AS feature_id, count(*) AS n_pixels, "
            "CAST(sum(v1) AS BIGINT) AS sum_aux, 'v1_override' AS arm FROM m "
            "UNION ALL "
            "SELECT 0 AS feature_id, count(*) AS n_pixels, "
            "CAST(sum(v2) AS BIGINT) AS sum_aux, 'latest_v2' AS arm FROM m"
        ),
        survey_ref="R11 version overrides inside the hard gate "
        "(raster/data_environment.py build_data_environment overrides + "
        "raster/batch.py; reference x-version-override query param)",
    )
)


def _r13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster query paths are deliberately TYPE-BLIND (float division):
    the reference ships raster SQL out-of-process to a NumPy evaluator
    (queries.py:586-597) where ``/`` is NumPy true division — float —
    while the tabular path evaluates in Postgres with typed (truncating
    int/int) division. This gate pins the asymmetry end-to-end through
    the REAL zonal path (registry → ingest → query_raster): an
    integer-coded layer's ``sum(layer)/count(*)`` AND ``count(*)/2``
    over an ODD pixel count (221) must both keep their fractional part.
    docs/PARITY.md 'typed semantics' section records the decision."""
    import numpy as np

    from gfw_data_api_spark.catalog.registry import Registry
    from gfw_data_api_spark.raster.grid import Grid
    from gfw_data_api_spark.raster.ingest import ingest_raster_tiles
    from gfw_data_api_spark.raster.zonal import query_raster

    grid = Grid.parse("10/40")
    idx = np.arange(1600, dtype=np.int64).reshape(40, 40)
    vals = (idx * 7 % 97 + 1).astype(np.float64)
    registry = Registry(tempfile.mkdtemp(prefix="gfw_r13_"))
    ingest_raster_tiles(
        registry, spark, "planted", "v1", grid, "code", {"10N_000E": vals}
    )
    geometry = {
        "type": "Polygon",
        "coordinates": [
            [[0.5, 0.5], [4.75, 0.5], [4.75, 3.75], [0.5, 3.75], [0.5, 0.5]]
        ],
    }
    sql = (
        "SELECT count(*) AS n_pixels, "
        "sum(planted__code) / count(*) AS mean_code, "
        "count(*) / 2 AS half_n FROM data"
    )
    return query_raster(spark, registry, "planted", "v1", sql, geometry)


_SPECS.append(
    QuerySpec(
        name="r13_raster_float_division",
        spark_fn=_r13,
        oracle=(
            # pixel centers on the x.125 grid, box corners on x.25/x.75 —
            # strict-inequality membership is exact rational arithmetic;
            # DuckDB's `/` on integers is float division, same as NumPy
            "WITH px AS (SELECT ((i % 40) + 0.5) * 0.25 AS lon, "
            "10.0 - (CAST(floor(i / 40) AS BIGINT) + 0.5) * 0.25 AS lat, "
            "(i * 7) % 97 + 1 AS v FROM range(0, 1600) t(i)), "
            "m AS (SELECT v FROM px WHERE lon > 0.5 AND lon < 4.75 "
            "AND lat > 0.5 AND lat < 3.75) "
            "SELECT count(*) AS n_pixels, "
            "CAST(sum(v) AS DOUBLE) / count(*) AS mean_code, "
            "CAST(count(*) AS DOUBLE) / 2 AS half_n FROM m"
        ),
        survey_ref="Raster dialect float-division semantics pinned "
        "(raster/zonal.py query_raster type-blind by design; reference "
        "queries.py:586-597 ships SQL to the NumPy Lambda where / is "
        "true division — deliberate asymmetry vs the typed tabular path)",
    )
)


def _pr01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 rasterize inside the hard gate: 25 planted axis-aligned
    rectangles (corners on the 0.5° grid, derived from nation keys) burned
    onto the 10°/40px grid through the REAL rasterize_vector — BOTH burn
    modes drive the gate: method='count' (overlap counting) and
    method='value' with order='desc' (paint order: descending sort means
    the smallest value lands last, so the painted value is the MIN over
    covering features). Pixel-center membership is strict-inequality
    rational arithmetic for the oracle. Reference
    batch/python/pixetl-style rasterization (SURVEY §2.5 P1)."""
    from gfw_data_api_spark.functions.geo_udfs import st_geomfromgeojson
    from gfw_data_api_spark.raster.grid import Grid
    from gfw_data_api_spark.raster.rasterize import rasterize_vector

    grid = Grid.parse("10/40")
    rect = load_table(spark, sf_dir, "nation").select(
        "n_nationkey",
        ((F.col("n_nationkey") * 3 % 12) / 2.0).alias("x0"),
        ((F.col("n_nationkey") * 7 % 12) / 2.0).alias("y0"),
        (F.col("n_nationkey") + 1).cast("double").alias("v"),
    )
    rect = rect.withColumn(
        "x1", F.col("x0") + 0.5 + (F.col("n_nationkey") % 4)
    ).withColumn("y1", F.col("y0") + 0.5 + (F.col("n_nationkey") % 3))
    gj = F.format_string(
        '{"type": "Polygon", "coordinates": '
        "[[[%.1f, %.1f], [%.1f, %.1f], [%.1f, %.1f], [%.1f, %.1f], [%.1f, %.1f]]]}",
        "x0", "y0", "x1", "y0", "x1", "y1", "x0", "y1", "x0", "y0",
    )
    from gfw_data_api_spark.llmops.dedup import _persist_replacing

    # both burn modes consume the same feature set — pin it so the gate
    # doesn't scan (and re-run the geometry UDF over) nation twice
    feats = _persist_replacing(
        rect.select(
            "v",
            st_geomfromgeojson(gj).alias("geom"),
            F.array("x0", "y0", "x1", "y1").alias("gfw_bbox"),
        ),
        "pr01_feats",
    )
    counts = rasterize_vector(spark, feats, grid, method="count")
    painted = rasterize_vector(
        spark, feats, grid, value_col="v", order="desc", method="value"
    )
    return counts.select(
        "tile_id", "pixel_id", F.col("value").cast("bigint").alias("n_overlaps")
    ).join(
        painted.select(
            "tile_id", "pixel_id", F.col("value").cast("bigint").alias("painted")
        ),
        ["tile_id", "pixel_id"],
    )


_SPECS.append(
    QuerySpec(
        name="pr01_rasterize_modes",
        spark_fn=_pr01,
        oracle=(
            "WITH r AS (SELECT n_nationkey, (n_nationkey * 3 % 12) / 2.0 AS x0, "
            "(n_nationkey * 7 % 12) / 2.0 AS y0 FROM nation), "
            "rr AS (SELECT n_nationkey, x0, y0, x0 + 0.5 + (n_nationkey % 4) AS x1, "
            "y0 + 0.5 + (n_nationkey % 3) AS y1 FROM r), "
            "px AS (SELECT i, ((i % 40) + 0.5) * 0.25 AS lon, "
            "10.0 - (CAST(floor(i / 40) AS BIGINT) + 0.5) * 0.25 AS lat "
            "FROM range(0, 1600) t(i)) "
            "SELECT '10N_000E' AS tile_id, i AS pixel_id, "
            "count(*) AS n_overlaps, CAST(min(n_nationkey + 1) AS BIGINT) AS painted "
            "FROM px JOIN rr ON lon > x0 AND lon < x1 AND lat > y0 AND lat < y1 "
            "GROUP BY i"
        ),
        survey_ref="P1 rasterize vector→grid inside the hard gate "
        "(raster/rasterize.py rasterize_vector: count + value/order burn "
        "modes; SURVEY §2.5 P1)",
    )
)


def _pr02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 band algebra inside the hard gate: two planted tile sets (band B
    sparse so the inner join's intersection semantics execute) through the
    REAL band_algebra — registry asset creation, the multi-band F.expr
    calc, the no_data output filter, and the tile-set write/re-read all
    run. Values are small integers, so every float is exact. Reference
    batch raster calc (SURVEY §2.5 P2)."""
    from gfw_data_api_spark.catalog.registry import Registry
    from gfw_data_api_spark.raster.grid import Grid
    from gfw_data_api_spark.raster.transform import band_algebra

    grid = Grid.parse("10/40")
    base = (
        load_table(spark, sf_dir, "events")
        .select((F.col("event_id") * 7 % 1600).alias("pixel_id"))
        .distinct()
    )
    a = base.select(
        F.lit("10N_000E").alias("tile_id"),
        "pixel_id",
        (F.col("pixel_id") % 97 + 1).cast("double").alias("value"),
    )
    b = base.filter(F.col("pixel_id") % 13 != 0).select(
        F.lit("10N_000E").alias("tile_id"),
        "pixel_id",
        (F.col("pixel_id") % 13).cast("double").alias("value"),
    )
    tmp = tempfile.mkdtemp(prefix="gfw_pr02_")
    pa, pb = os.path.join(tmp, "band_a"), os.path.join(tmp, "band_b")
    a.write.mode("overwrite").parquet(pa)
    b.write.mode("overwrite").parquet(pb)
    registry = Registry(os.path.join(tmp, "catalog"))
    out = band_algebra(
        spark,
        registry,
        "planted_calc",
        "v1",
        grid,
        "calc",
        calc="A + B - 3",
        input_uris={"A": pa, "B": pb},
        no_data=0,
    )
    return out.select(
        "tile_id", "pixel_id", F.col("value").cast("bigint").alias("value")
    )


_SPECS.append(
    QuerySpec(
        name="pr02_band_algebra",
        spark_fn=_pr02,
        oracle=(
            "WITH base AS (SELECT DISTINCT event_id * 7 % 1600 AS pixel_id FROM events), "
            "v AS (SELECT pixel_id, (pixel_id % 97 + 1) + (pixel_id % 13) - 3 AS value "
            "FROM base WHERE pixel_id % 13 <> 0) "
            "SELECT '10N_000E' AS tile_id, pixel_id, CAST(value AS BIGINT) AS value "
            "FROM v WHERE value <> 0"
        ),
        survey_ref="P2 band algebra inside the hard gate "
        "(raster/transform.py band_algebra: multi-band join + calc + "
        "no_data filter + registry write; SURVEY §2.5 P2)",
    )
)


def _pr04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 resample inside the hard gate: planted pixels (duplicates
    included — the aggregation must fold every row) downsampled 4× with
    method='sum' through the REAL downsample — the row-major parent-id
    integer math and the block aggregation both execute, all values exact
    integers. Reference overview/pyramid resampling (SURVEY §2.5 P4)."""
    from gfw_data_api_spark.raster.grid import Grid
    from gfw_data_api_spark.raster.transform import downsample

    grid = Grid.parse("10/40")
    ev = load_table(spark, sf_dir, "events").select(
        F.lit("10N_000E").alias("tile_id"),
        (F.col("event_id") * 11 % 1600).alias("pixel_id"),
        (F.col("event_id") % 50 + 1).cast("double").alias("value"),
    )
    out = downsample(ev, grid, factor=4, method="sum")
    return out.select(
        "tile_id", "pixel_id", F.col("value").cast("bigint").alias("value")
    )


_SPECS.append(
    QuerySpec(
        name="pr04_downsample_pyramid",
        spark_fn=_pr04,
        oracle=(
            "WITH px AS (SELECT event_id * 11 % 1600 AS pixel_id, "
            "event_id % 50 + 1 AS value FROM events), "
            "p AS (SELECT CAST(floor(floor(pixel_id / 40) / 4) * 10 "
            "+ floor((pixel_id % 40) / 4) AS BIGINT) AS pixel_id, value FROM px) "
            "SELECT '10N_000E' AS tile_id, pixel_id, "
            "CAST(sum(value) AS BIGINT) AS value FROM p GROUP BY pixel_id"
        ),
        survey_ref="P4 resample pyramid level inside the hard gate "
        "(raster/transform.py downsample: row-major block parent math; "
        "SURVEY §2.5 P4)",
    )
)


def _pr06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 symbology inside the hard gate: BOTH colormap kinds through the
    REAL apply_colormap — discrete exact-match CASE channels and gradient
    linear interpolation (breakpoints chosen so fractions are exact
    dyadics; round-half-up agrees across engines on positives). Reference
    symbology.py:52-123 (SURVEY §2.5 P6)."""
    from gfw_data_api_spark.llmops.dedup import _persist_replacing
    from gfw_data_api_spark.raster.transform import apply_colormap

    # both colormap kinds consume the same planted values — pin them so
    # the gate doesn't scan events twice
    ev = _persist_replacing(
        load_table(spark, sf_dir, "events").select(
            (F.col("event_id") % 5).cast("double").alias("value")
        ),
        "pr06_values",
    )
    disc = apply_colormap(
        ev,
        {0.0: (255, 0, 0), 1.0: (0, 200, 40), 2.0: (0, 0, 255),
         3.0: (250, 250, 5), 4.0: (128, 64, 32)},
        kind="discrete",
    )
    grad = apply_colormap(ev, {0.0: (0, 0, 0), 4.0: (255, 255, 255)}, kind="gradient")
    d = disc.groupBy("value").agg(
        F.count("*").alias("n_pixels"),
        F.min("r").alias("dr"),
        F.min("g").alias("dg"),
        F.min("b").alias("db"),
        F.min("rgb_int").alias("d_rgb"),
    )
    g = grad.groupBy("value").agg(
        F.min("r").alias("gr"), F.min("rgb_int").alias("g_rgb")
    )
    return (
        d.join(g, "value")
        .select(F.col("value").cast("bigint").alias("value"),
                "n_pixels", "dr", "dg", "db", "d_rgb", "gr", "g_rgb")
    )


_SPECS.append(
    QuerySpec(
        name="pr06_colormap_symbology",
        spark_fn=_pr06,
        oracle=(
            "WITH v AS (SELECT event_id % 5 AS value FROM events), "
            "d AS (SELECT value, count(*) AS n_pixels FROM v GROUP BY value), "
            "c AS (SELECT value, n_pixels, "
            "CAST(CASE value WHEN 0 THEN 255 WHEN 1 THEN 0 WHEN 2 THEN 0 "
            "WHEN 3 THEN 250 ELSE 128 END AS INT) AS dr, "
            "CAST(CASE value WHEN 0 THEN 0 WHEN 1 THEN 200 WHEN 2 THEN 0 "
            "WHEN 3 THEN 250 ELSE 64 END AS INT) AS dg, "
            "CAST(CASE value WHEN 0 THEN 0 WHEN 1 THEN 40 WHEN 2 THEN 255 "
            "WHEN 3 THEN 5 ELSE 32 END AS INT) AS db, "
            "CAST(round((value - 0.0) / 4.0 * 255.0) AS INT) AS gr FROM d) "
            "SELECT value, n_pixels, dr, dg, db, "
            "CAST(dr * 65536 + dg * 256 + db AS INT) AS d_rgb, gr, "
            "CAST(gr * 65536 + gr * 256 + gr AS INT) AS g_rgb FROM c"
        ),
        survey_ref="P6 colormap/symbology inside the hard gate "
        "(raster/transform.py apply_colormap discrete + gradient; "
        "reference symbology.py:52-123)",
    )
)


def _pr07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 exact histogram inside the hard gate: planted values spanning
    the closed range (including the top edge, so the last-bin clamp
    executes) through the REAL histogram floor-binning — one aggregation,
    explicit bounds so no driver collect. Reference merges per-tile
    histograms approximately (app/utils/stats.py:38-89); exact is free on
    Spark (SURVEY §2.5 P7)."""
    from gfw_data_api_spark.raster.transform import histogram

    ev = load_table(spark, sf_dir, "events").select(
        (F.col("event_id") % 101).cast("double").alias("value")
    )
    return histogram(ev, bins=10, value_min=0.0, value_max=100.0)


_SPECS.append(
    QuerySpec(
        name="pr07_exact_histogram",
        spark_fn=_pr07,
        oracle=(
            "WITH v AS (SELECT CAST(least(floor((event_id % 101) / 10.0), 9) AS INT) "
            "AS bucket FROM events) "
            "SELECT bucket, count(*) AS count, "
            "0.0 + bucket * 10.0 AS low, 0.0 + (bucket + 1) * 10.0 AS high "
            "FROM v GROUP BY bucket"
        ),
        survey_ref="P7 stats/histogram inside the hard gate "
        "(raster/transform.py histogram exact floor-binning; reference "
        "app/utils/stats.py:38-89 approximate merge)",
    )
)


def _pr03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 mercator warp inside the hard gate: planted pixels through the
    REAL reproject_to_mercator at zoom 2 (target coarser than the 0.25°
    source, the pyramid use case) with method='sum' — slippy placement,
    per-cell pixel-id math, and the resampling aggregate all execute.
    The oracle mirrors the forward transform op-for-op; the only libm
    calls (ln/tan/radians) are the e12-proven set, and values are exact
    integers so the sum is order-independent. Reference
    batch/scripts/unify_projection.sh + resample.py (gdalwarp to 3857)."""
    from gfw_data_api_spark.raster.grid import Grid
    from gfw_data_api_spark.raster.warp import reproject_to_mercator

    grid = Grid.parse("10/40")
    tiles3 = F.array(F.lit("10N_000E"), F.lit("20S_010W"), F.lit("80N_170W"))
    ev = load_table(spark, sf_dir, "events").select(
        F.element_at(tiles3, (F.col("event_id") % 3).cast("int") + 1).alias("tile_id"),
        (F.col("event_id") * 7 % 1600).alias("pixel_id"),
        (F.col("event_id") % 23 + 1).cast("double").alias("value"),
    )
    return reproject_to_mercator(ev, grid, zoom=2, tile_px=256, method="sum")


_SPECS.append(
    QuerySpec(
        name="pr03_mercator_warp",
        spark_fn=_pr03,
        oracle=(
            "WITH px AS (SELECT "
            "CASE event_id % 3 WHEN 0 THEN '10N_000E' WHEN 1 THEN '20S_010W' "
            "ELSE '80N_170W' END AS tile_id, "
            "event_id * 7 % 1600 AS p, event_id % 23 + 1 AS v FROM events), "
            "c AS (SELECT (CASE tile_id WHEN '10N_000E' THEN 10.0 "
            "WHEN '20S_010W' THEN -20.0 ELSE 80.0 END) "
            "- (CAST(floor(p / 40) AS BIGINT) + 0.5) * 0.25 AS lat, "
            "(CASE tile_id WHEN '10N_000E' THEN 0.0 WHEN '20S_010W' THEN -10.0 "
            "ELSE -170.0 END) + ((p % 40) + 0.5) * 0.25 AS lon, v FROM px), "
            "g AS (SELECT least(CAST(floor((lon + 180.0) / 360.0 * 1024.0) AS BIGINT), 1023) AS gx, "
            "least(CAST(floor((1.0 - ln(tan(pi() / 4.0 + radians(lat) / 2.0)) / pi()) "
            "/ 2.0 * 1024.0) AS BIGINT), 1023) AS gy, v FROM c) "
            "SELECT CAST(floor(gx / 256.0) AS INT) AS tile_x, "
            "CAST(floor(gy / 256.0) AS INT) AS tile_y, "
            "(gy % 256) * 256 + (gx % 256) AS pixel_id, "
            "CAST(sum(v) AS DOUBLE) AS value FROM g GROUP BY 1, 2, 3"
        ),
        survey_ref="P3 reproject to web-mercator inside the hard gate "
        "(raster/warp.py reproject_to_mercator: slippy placement + "
        "resampling aggregate, no UDF; reference unify_projection.sh)",
    )
)


def _s09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval inside the hard gate: BM25 lexical top-50 (t15's
    proven scoring) fused with brute-force cosine semantic top-50 (s01's)
    by Reciprocal Rank Fusion — the two candidate lists share the 0..499
    id space, so documents surfaced by both retrievers genuinely fuse
    (n_sources=2 rows exist). Ranks are per-source windows over the
    bounded lists; the fused sum adds ≤2 identical doubles, so the oracle
    matches bit-for-bit before the shared round(9)."""
    from gfw_data_api_spark.llmops.similarity import reciprocal_rank_fusion
    from gfw_data_api_spark.llmops.text import bm25_search

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lexical = bm25_search(docs, ["spark", "join", "vector"], top_k=50)
    query = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    qnorm = math.sqrt(sum(float(x) * float(x) for x in query))
    dot, norm = _cosine_cols(F.col("embedding"), query)
    semantic = (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(dot / (norm * F.lit(qnorm)), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(50)
    )
    return reciprocal_rank_fusion(
        [("bm25", lexical, "doc_id", "bm25"), ("cos", semantic, "vec_id", "cosine")],
        rrf_k=60,
        top_k=10,
    )


def _s09_oracle() -> str:
    k1, b = 1.2, 0.75
    toks = "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x <> '')"
    return (
        f"WITH base AS (SELECT doc_id, len({toks}) AS dl, {toks} AS toks FROM documents), "
        "stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, "
        "CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM base), "
        "tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM "
        "(SELECT doc_id, dl, unnest(toks) AS term FROM base) "
        "WHERE term IN ('spark', 'join', 'vector') GROUP BY doc_id, dl, term), "
        "docfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
        "scored AS (SELECT tf.doc_id, "
        "ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * "
        f"((tf.tf * {k1 + 1.0!r}) / (tf.tf + {k1!r} * ({1.0 - b!r} + {b!r} * (tf.dl / s.avgdl)))) AS sc "
        "FROM tf JOIN docfreq d USING (term), stats s), "
        "lex AS (SELECT doc_id, round(sum(sc), 6) AS s FROM scored "
        "GROUP BY doc_id ORDER BY s DESC, doc_id LIMIT 50), "
        "q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0), "
        "sem AS (SELECT e.vec_id AS doc_id, "
        "round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe) / "
        "(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) * "
        "sqrt(list_dot_product(q.qe, q.qe))), 6) AS s "
        "FROM embeddings e, q WHERE e.vec_id != 0 ORDER BY s DESC, e.vec_id LIMIT 50), "
        "u AS (SELECT 'bm25' AS src, doc_id, s FROM lex "
        "UNION ALL SELECT 'cos' AS src, doc_id, s FROM sem), "
        "r AS (SELECT doc_id, row_number() OVER "
        "(PARTITION BY src ORDER BY s DESC, doc_id) AS rnk FROM u) "
        "SELECT doc_id, round(sum(1.0 / (60.0 + rnk)), 9) AS rrf_score, "
        "count(*) AS n_sources FROM r GROUP BY doc_id "
        "ORDER BY rrf_score DESC, doc_id LIMIT 10"
    )


_SPECS.append(
    QuerySpec(
        name="s09_hybrid_rrf_search",
        spark_fn=_s09,
        oracle=_s09_oracle(),
        survey_ref="similarity search: hybrid BM25+cosine retrieval with "
        "Reciprocal Rank Fusion (llmops/similarity.py "
        "reciprocal_rank_fusion; Cormack et al. 2009)",
    )
)


def _e13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E13 1×1-grid export inside the hard gate: planted rectangles
    (nation keys; many cross the equator/meridian so every N/S/E/W id
    branch formats) PLUS right triangles (region keys) whose bbox claims
    a 3×3 cell block but whose hypotenuse excludes the three far-corner
    cells — so the exact-intersects UDF genuinely PRUNES candidates, not
    just confirms them. All coordinates sit on the x.25 grid and the
    hypotenuse line x+y = x0+y0+2 never meets a candidate-corner sum, so
    cell membership is strict-inequality rational arithmetic for the
    oracle: a cell [cx,cx+1]×[cy,cy+1] meets the triangle iff
    max(cx,x0)+max(cy,y0) < x0+y0+2. Reference export_1x1_grid.py:309-451
    (per-tile asyncpg loop → one Spark explode+filter)."""
    from gfw_data_api_spark.functions.geo_udfs import st_geomfromgeojson
    from gfw_data_api_spark.operators.downloads import export_grid_1x1

    rect = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("fid"),
        ((F.col("n_nationkey") * 5 % 24) - 12 + 0.25).alias("x0"),
        ((F.col("n_nationkey") * 9 % 16) - 8 + 0.25).alias("y0"),
        (0.5 + (F.col("n_nationkey") % 3)).alias("w"),
        (0.5 + (F.col("n_nationkey") % 2)).alias("h"),
    )
    rect = rect.withColumn("x1", F.col("x0") + F.col("w")).withColumn(
        "y1", F.col("y0") + F.col("h")
    )
    rect_gj = F.format_string(
        '{"type": "Polygon", "coordinates": '
        "[[[%.2f, %.2f], [%.2f, %.2f], [%.2f, %.2f], [%.2f, %.2f], [%.2f, %.2f]]]}",
        "x0", "y0", "x1", "y0", "x1", "y1", "x0", "y1", "x0", "y0",
    )
    rects = rect.select(
        "fid",
        st_geomfromgeojson(rect_gj).alias("geom"),
        F.array("x0", "y0", "x1", "y1").alias("gfw_bbox"),
    )
    tri = load_table(spark, sf_dir, "region").select(
        (F.col("r_regionkey") + 100).cast("long").alias("fid"),
        ((F.col("r_regionkey") * 7 % 20) - 10 + 0.25).alias("x0"),
        ((F.col("r_regionkey") * 3 % 10) - 5 + 0.25).alias("y0"),
    )
    tri_gj = F.format_string(
        '{"type": "Polygon", "coordinates": '
        "[[[%.2f, %.2f], [%.2f, %.2f], [%.2f, %.2f], [%.2f, %.2f]]]}",
        "x0", "y0",
        (F.col("x0") + 2.0), "y0",
        "x0", (F.col("y0") + 2.0),
        "x0", "y0",
    )
    tris = tri.select(
        "fid",
        st_geomfromgeojson(tri_gj).alias("geom"),
        F.array(
            "x0", "y0", F.col("x0") + 2.0, F.col("y0") + 2.0
        ).alias("gfw_bbox"),
    )
    out = export_grid_1x1(spark, rects.unionByName(tris))
    return out.select("fid", "gfw_grid_1x1_id")


_SPECS.append(
    QuerySpec(
        name="e13_grid_1x1_export",
        spark_fn=_e13,
        oracle=(
            "WITH r AS (SELECT CAST(n_nationkey AS BIGINT) AS fid, "
            "(n_nationkey * 5 % 24) - 12 + 0.25 AS x0, "
            "(n_nationkey * 9 % 16) - 8 + 0.25 AS y0, "
            "0.5 + (n_nationkey % 3) AS w, 0.5 + (n_nationkey % 2) AS h FROM nation), "
            "rc AS (SELECT fid, cx, cy FROM r, "
            "unnest(generate_series(CAST(floor(x0) AS BIGINT), CAST(floor(x0 + w) AS BIGINT))) AS tx(cx), "
            "unnest(generate_series(CAST(floor(y0) AS BIGINT), CAST(floor(y0 + h) AS BIGINT))) AS ty(cy)), "
            "t AS (SELECT CAST(r_regionkey + 100 AS BIGINT) AS fid, "
            "(r_regionkey * 7 % 20) - 10 + 0.25 AS x0, "
            "(r_regionkey * 3 % 10) - 5 + 0.25 AS y0 FROM region), "
            "tc AS (SELECT fid, cx, cy FROM t, "
            "unnest(generate_series(CAST(floor(x0) AS BIGINT), CAST(floor(x0 + 2.0) AS BIGINT))) AS tx(cx), "
            "unnest(generate_series(CAST(floor(y0) AS BIGINT), CAST(floor(y0 + 2.0) AS BIGINT))) AS ty(cy) "
            "WHERE greatest(CAST(cx AS DOUBLE), x0) + greatest(CAST(cy AS DOUBLE), y0) "
            "< x0 + y0 + 2.0), "
            "cells AS (SELECT fid, cx, cy FROM rc UNION ALL SELECT fid, cx, cy FROM tc) "
            "SELECT fid, concat(CAST(abs(cy + 1) AS VARCHAR), "
            "CASE WHEN cy + 1 >= 0 THEN 'N' ELSE 'S' END, '_', "
            "CAST(abs(cx) AS VARCHAR), CASE WHEN cx >= 0 THEN 'E' ELSE 'W' END) "
            "AS gfw_grid_1x1_id FROM cells"
        ),
        survey_ref="E13 1×1 grid export inside the hard gate "
        "(operators/downloads.py export_grid_1x1: native candidate-cell "
        "explode + exact intersects prune; reference "
        "export_1x1_grid.py:309-451)",
    )
)


_SPECS.append(
    QuerySpec(
        name="q29_scalar_subquery",
        spark_fn=_guarded(
            "lineitem",
            "SELECT l_returnflag, count(*) AS n_at_max FROM data "
            "WHERE l_quantity = (SELECT max(l_quantity) FROM data) "
            "GROUP BY l_returnflag",
        ),
        oracle=(
            "SELECT l_returnflag, count(*) AS n_at_max FROM lineitem "
            "WHERE l_quantity = (SELECT max(l_quantity) FROM lineitem) "
            "GROUP BY l_returnflag"
        ),
        survey_ref="Q16 boundary: scalar subqueries over the query table "
        "execute through the guarded path (the reference admits them — "
        "_no_subqueries rejects only FROM-clause RangeSubselect, and its "
        "global FROM rewrite rebinds the inner reference; "
        "sql/guard.py nested_from_spans)",
    )
)


def _a04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count–Min sketch point queries inside the hard gate (the a01/a03
    pattern: exact values + guarantee booleans the oracle pins TRUE).
    997 distinct keys hash into 512 buckets, so collisions are certain
    and the sketch genuinely estimates. ``never_undercounts`` is the
    deterministic CMS guarantee; ``err_bound_ok`` pins the observed
    error inside 4·N/width (the classic εN envelope at these params),
    with N folded in-plan as a 1-row broadcast (t19 convention)."""
    from gfw_data_api_spark.operators.sketches import (
        count_min_estimate,
        count_min_table,
    )

    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 997).alias("uid")
    )
    cms = count_min_table(ev, "uid", width=512, depth=4)
    probe = spark.range(10).select(F.col("id").alias("uid"))
    est = count_min_estimate(cms, probe, "uid", width=512, depth=4)
    exact = (
        ev.filter(F.col("uid") < 10).groupBy("uid").agg(F.count("*").alias("exact_count"))
    )
    total = ev.agg(F.count("*").alias("_n"))
    return (
        est.join(exact, "uid")
        .crossJoin(F.broadcast(total))
        .select(
            "uid",
            "exact_count",
            (F.col("cms_est") >= F.col("exact_count")).alias("never_undercounts"),
            (
                (F.col("cms_est") - F.col("exact_count")) * F.lit(512)
                <= F.col("_n") * F.lit(4)
            ).alias("err_bound_ok"),
        )
    )


_SPECS.append(
    QuerySpec(
        name="a04_count_min_sketch",
        spark_fn=_a04,
        oracle=(
            "SELECT user_id % 997 AS uid, count(*) AS exact_count, "
            "TRUE AS never_undercounts, TRUE AS err_bound_ok "
            "FROM events WHERE user_id % 997 < 10 GROUP BY 1"
        ),
        survey_ref="approximate aggregates: Count–Min sketch point "
        "frequencies (operators/sketches.py count_min_table/_estimate — "
        "bounded d×w shuffle at any cardinality; Cormode & Muthukrishnan "
        "2005)",
    )
)


def _q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 window-function breadth through the FULL guarded path: lag,
    lead, row_number, ntile, percent_rank, cume_dist, first_value in ONE
    partitioned window (never unpartitioned — the plan gate's rule).
    o_orderkey is unique within each customer partition, so every
    function is deterministic; percent_rank/cume_dist are exact small
    rationals both engines compute with one division."""
    sql = (
        "SELECT o_orderkey, o_custkey, "
        "lag(o_totalprice) OVER w AS prev_price, "
        "lead(o_totalprice) OVER w AS next_price, "
        "CAST(row_number() OVER w AS BIGINT) AS rn, "
        "CAST(ntile(4) OVER w AS BIGINT) AS quartile, "
        "percent_rank() OVER w AS pct_rank, "
        "cume_dist() OVER w AS cdist, "
        "first_value(o_orderkey) OVER w AS first_key "
        "FROM orders "
        "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)"
    )
    return execute_on_dataframe(spark, load_table(spark, sf_dir, "orders"), sql)


_SPECS.append(
    QuerySpec(
        name="q28_window_breadth",
        spark_fn=_q28,
        oracle=(
            "SELECT o_orderkey, o_custkey, "
            "lag(o_totalprice) OVER w AS prev_price, "
            "lead(o_totalprice) OVER w AS next_price, "
            "CAST(row_number() OVER w AS BIGINT) AS rn, "
            "CAST(ntile(4) OVER w AS BIGINT) AS quartile, "
            "percent_rank() OVER w AS pct_rank, "
            "cume_dist() OVER w AS cdist, "
            "first_value(o_orderkey) OVER w AS first_key "
            "FROM orders "
            "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)"
        ),
        survey_ref="Q10 window-function breadth (lag/lead/row_number/"
        "ntile/percent_rank/cume_dist/first_value in one partitioned "
        "window through the guarded path; reference queries.py window "
        "allowlist)",
    )
)


def _m08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF animation decode inside the hard gate (the m07 pattern): per
    selected document, two planted frames (deterministic ≤8-color
    palettes) are encoded by the fixture-twin writer and decoded by the
    REAL decode_gif — LZW is lossless, so the decoded canvases must equal
    the planted arrays BIT-FOR-BIT and the per-frame delays must round-
    trip; both pinned as oracle booleans/ints."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 25 == 0)
        .select("doc_id")
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        from gfw_data_api_spark.llmops.gif import decode_gif, encode_gif

        for pdf in batches:
            rows = {
                "doc_id": [], "n_frames": [], "h": [], "w": [],
                "delay0": [], "delay1": [], "frames_exact": [],
            }
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                h, w = 7 + d % 4, 9 + d % 3
                yy, xx = np.mgrid[0:h, 0:w]
                f0 = ((yy * 3 + xx * 5 + d) % 8 * 32).astype(np.uint8)
                f1 = ((yy * 7 + xx * 2 + d) % 8 * 32).astype(np.uint8)
                frames = [np.stack([f0, f0, f0], axis=-1),
                          np.stack([f1, f1, f1], axis=-1)]
                delays = [40, 80 + d % 5 * 10]
                out_frames, out_delays = decode_gif(encode_gif(frames, delays))
                rows["doc_id"].append(d)
                rows["n_frames"].append(len(out_frames))
                rows["h"].append(int(out_frames[0].shape[0]))
                rows["w"].append(int(out_frames[0].shape[1]))
                rows["delay0"].append(int(out_delays[0]))
                rows["delay1"].append(int(out_delays[1]))
                rows["frames_exact"].append(
                    bool(
                        np.array_equal(out_frames[0], frames[0])
                        and np.array_equal(out_frames[1], frames[1])
                    )
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        synth,
        schema="doc_id bigint, n_frames bigint, h bigint, w bigint, "
        "delay0 bigint, delay1 bigint, frames_exact boolean",
    )


_SPECS.append(
    QuerySpec(
        name="m08_gif_decode_contract",
        spark_fn=_m08,
        oracle=(
            "SELECT doc_id, 2 AS n_frames, 7 + doc_id % 4 AS h, "
            "9 + doc_id % 3 AS w, 40 AS delay0, "
            "80 + doc_id % 5 * 10 AS delay1, TRUE AS frames_exact "
            "FROM documents WHERE doc_id % 25 = 0"
        ),
        survey_ref="multimodal: GIF animation decode contract "
        "(llmops/gif.py LZW + compositing; lossless roundtrip pinned as "
        "oracle booleans, the m07 pattern)",
    )
)


# Mel-tone gate constants (sr=8000, frame_len=256 → 129 rFFT bins,
# n_mels=16): for tone bin k = 4 + doc_id % 24, the mel band holding the
# peak triangular weight and that weight as the EXACT small-integer
# fraction the filterbank computes ((j-lo)/(mid-lo) etc. — identical
# IEEE divisions both engines). Derived once from
# llmops/audio.mel_filterbank and pinned in
# tests/test_media_codecs.py::test_m09_band_map_matches_filterbank.
_M09_BANDS = [1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 5, 6, 6, 6, 6]
_M09_WEIGHTS = [
    "2.0/3.0", "1.0", "2.0/3.0", "2.0/3.0", "1.0", "3.0/4.0", "1.0/2.0",
    "3.0/4.0", "1.0", "3.0/4.0", "1.0/2.0", "3.0/4.0", "1.0", "4.0/5.0",
    "3.0/5.0", "3.0/5.0", "4.0/5.0", "1.0", "4.0/5.0", "3.0/5.0",
    "3.0/5.0", "4.0/5.0", "1.0", "5.0/6.0",
]


def _m09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mel-filterbank FFT inside the hard gate — the one audio surface
    m02 left out ("the order-sensitive float reduction"), closed with
    the planted-pure-tone analytic pattern: per selected document a WAV
    is synthesized executor-side as ONE tone frame (A·sin(2πkj/256),
    integer bin k) tiled across all 8 analysis frames, so (a) every
    frame's FFT input is bitwise identical — frame consistency is EXACT
    equality on the emitted float32 grid, and (b) the power spectrum is
    analytic: all energy lands in bin k with |X[k]|² = (A·128)², making
    the peak mel band and its log-energy closed forms of doc_id that
    both engines recompute from the pinned band/weight tables
    (expected_mel is real cross-engine arithmetic, not a TRUE literal;
    the measured float32 grid stays Spark-side behind tolerance
    booleans — 1e-3 absorbs float32 storage, measured deviation ~1e-8).

    Scale shape: synth + decode + FFT are one mapInPandas pass (no
    shuffle); the checks are pure column math over the mel array."""
    from gfw_data_api_spark.llmops.audio import encode_wav, extract_mel_features

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 3)
        .select("doc_id")
    )

    def synth(batches):
        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                k = 4 + d % 24
                amp = (1 + d % 5) / 8.0
                frame = amp * np.sin(2.0 * np.pi * k * np.arange(256) / 256.0)
                payloads.append(bytearray(encode_wav(np.tile(frame, 8), 8000, bits=-32)))
            pdf = pdf.copy()
            pdf["payload"] = payloads
            yield pdf

    wav = docs.mapInPandas(synth, schema="doc_id bigint, payload binary")
    mel = extract_mel_features(wav, n_mels=16, n_frames=8)

    band_arr = F.array(*[F.lit(b) for b in _M09_BANDS])
    weight_arr = F.array(*[F.expr(w) for w in _M09_WEIGHTS])
    k_bin = (F.lit(4) + F.col("doc_id") % 24).cast("int")
    amp = (F.lit(1) + F.col("doc_id") % 5) / F.lit(8.0)
    band = F.element_at(band_arr, k_bin - F.lit(3))
    weight = F.element_at(weight_arr, k_bin - F.lit(3))
    # tolerance boolean only — JVM Math.log is 1 ulp off libm on some
    # inputs, so the EMITTED expected_mel comes from the pre-rounded
    # Python-literal table both engines index (repr-literal recipe)
    expected = F.log(weight * ((amp * 128.0) * (amp * 128.0)) + F.lit(1e-10))
    expected_lit = F.element_at(
        F.array(*[F.lit(v) for v in _m09_expected_table()]),
        ((k_bin - F.lit(4)) * 5 + (F.col("doc_id") % 5).cast("int") + F.lit(1)),
    )
    frame0 = F.slice("mel", 1, 16)
    frames_ok = F.forall(
        F.sequence(F.lit(1), F.lit(7)),
        lambda f: F.slice("mel", f * 16 + 1, 16) == frame0,
    )
    measured = F.element_at(frame0, band + F.lit(1)).cast("double")
    peak_ok = F.array_position(frame0, F.array_max(frame0)) == (band + F.lit(1)).cast("bigint")
    return mel.select(
        "doc_id",
        k_bin.alias("k_bin"),
        band.alias("band"),
        expected_lit.alias("expected_mel"),
        frames_ok.alias("frames_ok"),
        peak_ok.alias("peak_ok"),
        (F.abs(measured - expected) < 1e-3).alias("energy_ok"),
    )


def _m09_expected_table() -> list[float]:
    """round(ln(w·(A·128)²+1e-10), 6) for (k, amp) row-major — Python
    floats both engines consume as literals (JVM Math.log is 1 ulp off
    libm on some of these inputs, so neither engine's ln is emitted)."""
    out = []
    for i in range(24):
        w = eval(_M09_WEIGHTS[i])  # noqa: S307 — fixed fraction strings above
        for a5 in range(5):
            amp = (1 + a5) / 8.0
            out.append(round(math.log(w * ((amp * 128.0) * (amp * 128.0)) + 1e-10), 6))
    return out


def _m09_oracle() -> str:
    bands = ", ".join(str(b) for b in _M09_BANDS)
    expect = ", ".join(repr(v) for v in _m09_expected_table())
    return (
        "WITH d AS (SELECT doc_id, CAST(4 + doc_id % 24 AS INT) AS k_bin "
        "FROM documents WHERE doc_id % 10 = 3) "
        f"SELECT doc_id, k_bin, list_extract([{bands}], k_bin - 3) AS band, "
        f"list_extract([{expect}], "
        "(k_bin - 4) * 5 + CAST(doc_id % 5 AS INT) + 1) AS expected_mel, "
        "TRUE AS frames_ok, TRUE AS peak_ok, TRUE AS energy_ok FROM d"
    )


_SPECS.append(
    QuerySpec(
        name="m09_mel_tone_gate",
        spark_fn=_m09,
        oracle=_m09_oracle(),
        survey_ref="multimodal: mel-filterbank acoustic features inside "
        "the hard gate (llmops/audio.py mel_log_energies /"
        " extract_mel_features; planted pure tones at integer FFT bins — "
        "analytic band + log-energy recomputed by both engines, frame "
        "consistency exact on tiled frames)",
    )
)


def _d13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup-vs-state inside the hard gate: even doc_ids are
    the persisted corpus state (signed once with the portable md5-affine
    family), odd doc_ids arrive as the new batch — the REAL
    incremental_minhash_candidates probes new-vs-state AND new-vs-new
    band buckets without re-reading the state corpus. The oracle is the
    d04 replica with parity predicates on the two join arms, so the
    incremental screen is proven to find exactly the pairs the one-shot
    run would (restricted to arms involving the batch)."""
    from gfw_data_api_spark.llmops.dedup import minhash_signatures_portable
    from gfw_data_api_spark.llmops.incremental import incremental_minhash_candidates

    docs = load_table(spark, sf_dir, "documents", fanout=True)
    state_sigs = minhash_signatures_portable(docs.filter(F.col("doc_id") % 2 == 0))
    pairs, _new_sigs = incremental_minhash_candidates(
        docs.filter(F.col("doc_id") % 2 == 1), state_sigs, portable=True
    )
    return pairs.filter(F.col("est_jaccard") >= 0.5).select(
        "id_new", "id_old", F.round("est_jaccard", 6).alias("est_jaccard")
    )


def _d13_oracle() -> str:
    """The shared portable replica with the state/batch parity split:
    the new-vs-old arm joins odd ids to even ids, the new-vs-new arm
    joins odd to earlier odd."""
    return _portable_minhash_oracle(
        "SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_old "
        "FROM bands a JOIN bands b ON a.b = b.b AND a.key = b.key "
        "AND a.doc_id % 2 = 1 AND b.doc_id % 2 = 0 "
        "UNION "
        "SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_old "
        "FROM bands a JOIN bands b ON a.b = b.b AND a.key = b.key "
        "AND a.doc_id % 2 = 1 AND b.doc_id % 2 = 1 AND a.doc_id > b.doc_id",
        "id_new",
        "id_old",
    )


_SPECS.append(
    QuerySpec(
        name="d13_incremental_dedup",
        spark_fn=_d13,
        oracle=_d13_oracle(),
        survey_ref="dedup: incremental near-dup screen of a new batch "
        "against persisted MinHash state (llmops/incremental.py "
        "incremental_minhash_candidates, portable family — state corpus "
        "is never re-read)",
    )
)


def _t20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (head/middle/tail by KN LM score
    against fixed thresholds) aggregated per bucket — composes the t17
    LM with the map-side threshold assignment a 100 TB curation pass
    uses (no global sort; thresholds are corpus constants, as in CCNet
    where they come from a reference-corpus fit)."""
    from gfw_data_api_spark.llmops.text import perplexity_buckets

    docs = load_table(spark, sf_dir, "documents", fanout=True)
    out = perplexity_buckets(docs)
    return out.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bigrams").alias("sum_bigrams"),
        F.min("score_r").alias("min_score"),
        F.max("score_r").alias("max_score"),
    )


_SPECS.append(
    QuerySpec(
        name="t20_perplexity_buckets",
        spark_fn=_t20,
        oracle=(
            "WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t "
            "FROM documents), "
            "occ AS (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS bg "
            "FROM toks, unnest(range(1, len(t))) AS u(i)), "
            "tf AS (SELECT doc_id, bg, count(*) AS tf FROM occ GROUP BY doc_id, bg), "
            "bgc AS (SELECT bg, count(*) AS c2 FROM occ GROUP BY bg), "
            "nt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM bgc), "
            "lft AS (SELECT split_part(bg, ' ', 1) AS w1, sum(c2) AS c1, "
            "count(*) AS n1fw FROM bgc GROUP BY 1), "
            "rgt AS (SELECT split_part(bg, ' ', 2) AS w2, count(*) AS n1bw "
            "FROM bgc GROUP BY 1), "
            "model AS (SELECT bg, (c2 - 0.75e0) / c1 + 0.75e0 * n1fw / c1 * (n1bw / nt.n) AS p "
            "FROM bgc JOIN lft ON split_part(bg, ' ', 1) = lft.w1 "
            "JOIN rgt ON split_part(bg, ' ', 2) = rgt.w2, nt), "
            "scores AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams, "
            "round(sum(tf * ln(p)) / sum(tf), 4) AS score_r "
            "FROM tf JOIN model USING (bg) GROUP BY doc_id), "
            "bucketed AS (SELECT n_bigrams, score_r, "
            "CASE WHEN score_r > -3.37 THEN 'head' "
            "WHEN score_r > -3.40 THEN 'middle' ELSE 'tail' END AS bucket FROM scores) "
            "SELECT bucket, count(*) AS n_docs, "
            "CAST(sum(n_bigrams) AS BIGINT) AS sum_bigrams, "
            "min(score_r) AS min_score, max(score_r) AS max_score "
            "FROM bucketed GROUP BY bucket"
        ),
        survey_ref="LLM pipeline: CCNet-style perplexity head/middle/tail "
        "bucketing (llmops/text.py perplexity_buckets; fixed-threshold "
        "map-side assignment over the t17 Kneser–Ney LM)",
    )
)


def _t21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing inside the hard gate (llmops/packing.py was
    property-tested only). The FFD bin assignment itself is driver-free
    Python inside applyInPandas and not SQL-expressible, but the gate
    pins everything around it with REAL cross-engine arithmetic:
    the md5 bucket assignment is portable (t08's bit-identical bucket
    recipe), so per-bucket member counts AND the token-conservation
    identity are exact integer columns both engines recompute —
    ``raw_tokens`` = sum(n_tokens) − sep·(members − sequences) must
    equal the oracle's independent sum of whitespace token counts per
    bucket. A lost doc, double-pack, or separator miscount breaks the
    hash match; capacity violations and a sequence count outside
    [⌈raw/cap⌉, members] flip the envelope booleans."""
    from gfw_data_api_spark.llmops.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    packed = pack_sequences(docs, max_tokens=512, buckets=8, sep_tokens=1, seed=0)
    cap_ok = F.bool_and(
        F.when(F.col("n_docs") > 1, F.col("n_tokens") <= 512).otherwise(F.lit(True))
    )
    agg = packed.groupBy("pack_bucket").agg(
        F.sum("n_docs").alias("n_docs_total"),
        (F.sum("n_tokens") - (F.sum("n_docs") - F.count("*"))).alias("raw_tokens"),
        F.count("*").alias("_n_seqs"),
        cap_ok.alias("capacity_ok"),
    )
    lb = F.floor((F.col("raw_tokens") + 511) / 512)
    return agg.select(
        "pack_bucket",
        "n_docs_total",
        "raw_tokens",
        "capacity_ok",
        ((F.col("_n_seqs") >= F.greatest(lb, F.lit(1)))
         & (F.col("_n_seqs") <= F.col("n_docs_total"))).alias("seqs_in_bounds"),
    )


_SPECS.append(
    QuerySpec(
        name="t21_sequence_packing",
        spark_fn=_t21,
        oracle=(
            "WITH d AS (SELECT doc_id, "
            "CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS nt, "
            "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || chr(31) || '0'), 1, 15))"
            "::BIGINT % 8 AS INT) AS pack_bucket FROM documents) "
            "SELECT pack_bucket, count(*) AS n_docs_total, "
            "CAST(sum(nt) AS BIGINT) AS raw_tokens, "
            "TRUE AS capacity_ok, TRUE AS seqs_in_bounds "
            "FROM d GROUP BY pack_bucket"
        ),
        survey_ref="LLM pipeline: training-sequence packing (bucketed "
        "parallel FFD, llmops/packing.py pack_sequences; portable-bucket "
        "member counts + token conservation as exact cross-engine "
        "integers, FFD quality as envelope booleans)",
    )
)


def _g01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank inside the hard gate, full-arithmetic oracle: the
    planted graph is 64 nodes (customer key residues — all residues
    present at every test SF) with three affine out-arms per node, so
    BOTH engines regenerate the identical edge set from id arithmetic
    and the oracle unrolls the same 10 damped supersteps as chained
    CTEs (no recursive-aggregate needed). Every IEEE constant the Spark
    side uses ((1-d)/n, 1/n, d) appears in the oracle with identical
    parenthesization; cross-engine float drift is last-ulp sum ordering
    over ≤6 in-neighbors, far inside the shared round(6).

    The affine arms provably admit no self-loops (u·a+b ≡ u mod 64 has
    even≡odd parity on all three arms), so the dangling set is empty —
    the operator still computes its 1-row dangling share in-plan (the
    allowlisted broadcast), which is exactly +0.0 on both sides."""
    from gfw_data_api_spark.llmops.graph import pagerank

    nodes = (
        load_table(spark, sf_dir, "customer")
        .select((F.col("c_custkey") % 64).alias("u"))
        .distinct()
    )
    arms = nodes.select(
        "u",
        F.explode(
            F.array(
                (F.col("u") * 5 + 7) % 64,
                (F.col("u") * 11 + 3) % 64,
                (F.col("u") * 17 + 29) % 64,
            )
        ).alias("dst"),
    )
    edges = arms.filter(F.col("u") != F.col("dst")).select(F.col("u").alias("src"), "dst")
    pr = pagerank(edges, damping=0.85, iters=10)
    return pr.select("node", F.round("rank", 6).alias("pr_rank"))


def _g01_oracle() -> str:
    parts = [
        "WITH nodes AS (SELECT DISTINCT c_custkey % 64 AS u FROM customer), "
        "arms AS (SELECT u, (u*5+7) % 64 AS v FROM nodes "
        "UNION ALL SELECT u, (u*11+3) % 64 FROM nodes "
        "UNION ALL SELECT u, (u*17+29) % 64 FROM nodes), "
        "e AS (SELECT DISTINCT u AS src, v AS dst FROM arms WHERE u != v), "
        "deg AS (SELECT src, count(*) AS dg FROM e GROUP BY src), "
        "r0 AS (SELECT u AS node, 1.0/64 AS r FROM nodes)"
    ]
    for t in range(10):
        parts.append(
            f", r{t + 1} AS (SELECT n.u AS node, "
            "(1.0-0.85)/64 + 0.85 * coalesce(c.s, 0.0) AS r "
            f"FROM nodes n LEFT JOIN (SELECT e.dst AS v, sum(r{t}.r / deg.dg) AS s "
            f"FROM e JOIN deg ON e.src = deg.src JOIN r{t} ON r{t}.node = e.src "
            "GROUP BY e.dst) c ON c.v = n.u)"
        )
    parts.append(" SELECT node, round(r, 6) AS pr_rank FROM r10")
    return "".join(parts)


_SPECS.append(
    QuerySpec(
        name="g01_pagerank",
        spark_fn=_g01,
        oracle=_g01_oracle(),
        survey_ref="LLM pipeline: link-graph centrality for web-corpus "
        "weighting (llmops/graph.py pagerank — damped supersteps with "
        "in-plan dangling redistribution, superstep localCheckpoint "
        "lineage truncation; full 10-iteration arithmetic oracle)",
    )
)


def _e14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL ingestion inside the hard gate (the e01 fixture pattern):
    export a documents slice as NDJSON with a NESTED metadata struct,
    append 7 deliberately malformed lines, then re-ingest through the
    engine's JSONL source (sources/jsonl.py — declared schema,
    PERMISSIVE corrupt capture, recursive struct flattening) and
    aggregate per flattened language. The oracle recomputes the same
    integer aggregates straight from the parquet and pins the corrupt
    count as a planted constant — every number is an exact integer, so
    the comparison is bit-stable across engines."""
    import json

    import pandas as pd

    from gfw_data_api_spark.sources.jsonl import read_jsonl

    pdf = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    pdf = pdf[pdf.doc_id < 200].sort_values("doc_id")
    tmp = tempfile.mkdtemp(prefix="gfw_e14_")
    path = os.path.join(tmp, "docs.jsonl")
    with open(path, "w", encoding="utf-8") as fh:
        for row in pdf.itertuples(index=False):
            fh.write(
                json.dumps(
                    {
                        "doc_id": int(row.doc_id),
                        "meta": {"lang": row.lang, "source": row.source},
                        "n_chars": int(row.n_chars),
                    }
                )
                + "\n"
            )
        for i in range(7):
            fh.write('{"doc_id": %d, "meta": {truncated line\n' % (9000 + i))
    df = read_jsonl(
        spark,
        path,
        schema="doc_id bigint, meta struct<lang:string, source:string>, n_chars bigint",
        mode="PERMISSIVE",
        flatten=True,
    )
    # Single-pass grouped aggregate (corrupt rows fold into a reserved
    # group) — one scan, no union, and the plan references data columns
    # alongside _corrupt_record, which Spark requires on raw JSON scans
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN).
    bad = F.col("_corrupt_record").isNotNull()
    return (
        df.groupBy(
            F.when(bad, F.lit("__corrupt__")).otherwise(F.col("meta_lang")).alias("lang")
        ).agg(
            F.count("*").alias("n_docs"),
            F.coalesce(F.sum(F.when(~bad, F.col("n_chars"))), F.lit(0)).alias("sum_chars"),
            F.count_distinct(F.when(~bad, F.col("meta_source"))).alias("n_sources"),
        )
    )


_SPECS.append(
    QuerySpec(
        name="e14_jsonl_ingest",
        spark_fn=_e14,
        oracle=(
            "SELECT lang, count(*) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars, "
            "count(DISTINCT source) AS n_sources "
            "FROM documents WHERE doc_id < 200 GROUP BY lang "
            "UNION ALL SELECT '__corrupt__', CAST(7 AS BIGINT), "
            "CAST(0 AS BIGINT), CAST(0 AS BIGINT)"
        ),
        survey_ref="LLM pipeline: JSON-Lines corpus ingestion "
        "(sources/jsonl.py — declared-schema single-pass scan, PERMISSIVE "
        "_corrupt_record quarantine, nested-struct flattening; engine "
        "extension beyond the reference's delimited-text loader)",
    )
)


def _d14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document paragraph dedup inside the hard gate: 40 synthetic
    documents of 3 paragraphs each, where paragraph (g, j) is the text of
    source document (g*3+j) mod 53 — residues 0-13 recur three times and
    14-52 twice, so duplicates scatter across documents AND positions and
    the global-first-occurrence rule (min (id, pos), which equals min
    3g+j here) is fully exercised, including documents that lose every
    paragraph. The oracle rebuilds the same id-arithmetic corpus and
    replays the keep rule with integer keys — every compared value is an
    exact integer or an md5 of byte-identical text."""
    from gfw_data_api_spark.llmops.dedup import paragraph_dedup

    docs = load_table(spark, sf_dir, "documents")
    g = docs.filter(F.col("doc_id") < 40).select(F.col("doc_id").alias("g")).distinct()
    paras = g.select(
        "g", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("j")
    ).withColumn("src", (F.col("g") * 3 + F.col("j")) % 53)
    joined = paras.join(
        docs.select(F.col("doc_id").alias("src"), F.col("text").alias("para")), "src"
    )
    assembled = (
        joined.groupBy("g")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "para"))),
                    lambda x: x.getField("para"),
                ),
                "\n",
            ).alias("text")
        )
        .withColumnRenamed("g", "doc_id")
    )
    out = paragraph_dedup(assembled)
    return out.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.col("n_paras_kept").cast("bigint").alias("n_paras_kept"),
        F.col("n_paras_dropped").cast("bigint").alias("n_paras_dropped"),
    )


_SPECS.append(
    QuerySpec(
        name="d14_paragraph_dedup",
        spark_fn=_d14,
        oracle=(
            "WITH g AS (SELECT DISTINCT doc_id AS g FROM documents WHERE doc_id < 40), "
            "j AS (SELECT 0 AS j UNION ALL SELECT 1 UNION ALL SELECT 2), "
            "paras AS (SELECT g.g, j.j, d.text AS para FROM g CROSS JOIN j "
            "JOIN documents d ON d.doc_id = (g.g*3 + j.j) % 53), "
            "keep AS (SELECT para, min(g*3 + j) AS k FROM paras GROUP BY para), "
            "kept AS (SELECT p.g, p.j, p.para FROM paras p JOIN keep "
            "ON keep.para = p.para AND keep.k = p.g*3 + p.j), "
            "agg AS (SELECT g, string_agg(para, chr(10) ORDER BY j) AS text, "
            "count(*) AS n_kept FROM kept GROUP BY g) "
            "SELECT g.g AS doc_id, md5(coalesce(agg.text, '')) AS text_md5, "
            "CAST(coalesce(agg.n_kept, 0) AS BIGINT) AS n_paras_kept, "
            "CAST(3 - coalesce(agg.n_kept, 0) AS BIGINT) AS n_paras_dropped "
            "FROM g LEFT JOIN agg ON agg.g = g.g"
        ),
        survey_ref="LLM pipeline: cross-document paragraph-level dedup "
        "(llmops/dedup.py paragraph_dedup — the Dolma/RefinedWeb pass; "
        "global first-occurrence keep via partial-aggregatable min(struct), "
        "no skewed window, reassembly in original order)",
    )
)


def _c04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML text extraction inside the hard gate: wrap every document's
    text in a crawl-shaped HTML template (head/title/style, nav, script
    with markup-lookalike string literals, entity-bearing footer — all
    boilerplate the extractor must DROP) plus an entity-bearing content
    paragraph it must DECODE. The oracle recomputes the expected
    extraction from the raw text column by pure string concatenation, so
    the md5 comparison pins the whole contract; lengths are exact ints.
    Documents are pre-filtered (identically on both sides) to texts
    without markup metacharacters so wrap→extract is exactly invertible."""
    from gfw_data_api_spark.llmops.html import strip_html_col

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 300)
        & ~F.col("text").contains("<")
        & ~F.col("text").contains("&")
        & ~F.col("text").contains(">")
    )
    html = F.concat(
        F.lit(
            "<html><!-- crawl snapshot --><head><title>SEO bait</title>"
            "<style>body { margin: 0; }</style></head><body>"
            '<nav><a href="/">Home</a> | <a href="/about">About</a></nav>'
            "<h1>Doc "
        ),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit(
            '</p><p>Tom &amp; Jerry &lt;3</p><script type="text/javascript">'
            'var n = 1; if (n < 99) { alert("x & y <b>bold</b>"); }</script>'
            "<footer>(c) corp &amp; partners</footer></body></html>"
        ),
    )
    return docs.select(
        "doc_id",
        strip_html_col(html).alias("extracted"),
    ).select(
        "doc_id",
        F.md5("extracted").alias("text_md5"),
        F.length("extracted").cast("bigint").alias("n_chars_extracted"),
    )


_SPECS.append(
    QuerySpec(
        name="c04_html_extract",
        spark_fn=_c04,
        oracle=(
            "SELECT doc_id, "
            "md5('Doc ' || CAST(doc_id AS VARCHAR) || ' ' || text || "
            "' Tom & Jerry <3') AS text_md5, "
            "CAST(length('Doc ' || CAST(doc_id AS VARCHAR) || ' ' || text || "
            "' Tom & Jerry <3') AS BIGINT) AS n_chars_extracted "
            "FROM documents WHERE doc_id < 300 "
            "AND text NOT LIKE '%<%' AND text NOT LIKE '%&%' AND text NOT LIKE '%>%'"
        ),
        survey_ref="LLM pipeline: HTML boilerplate removal / text "
        "extraction (llmops/html.py strip_html_col — pure Catalyst "
        "regexp chain: comments, non-content blocks, tags, entity "
        "decode, whitespace collapse; zero shuffle, zero Python)",
    )
)


# Fixed analytic merge list for the b02 gate (learned once from the
# documents vocabulary, embedded as constants so BOTH engines replay the
# identical replace chain; merge symbols are rank-ordered pairs).
_B02_MERGES: list[tuple[str, str]] = [
    ("e", "r"),
    ("i", "n"),
    ("o", "r"),
    ("o", "w"),
    ("s", "t"),
    ("a", "l"),
    ("a", "r"),
    ("a", "t"),
    ("m", "er"),
    ("p", "ar"),
    ("u", "p"),
    ("a", "b"),
]


def _b02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-side BPE encoding inside the hard gate: apply a fixed
    12-merge list to real text with apply_bpe_catalyst (pure chained
    native replace — zero Python) and emit md5(sep-joined tokens) +
    token counts. The oracle replays the IDENTICAL replace chain in
    DuckDB (string replace is non-overlapping left-to-right in both
    engines), so the comparison pins every merge application
    byte-for-byte; equality of this chain with true BPE on this
    vocabulary is pinned separately in tests/test_bpe_catalyst.py."""
    from gfw_data_api_spark.llmops.bpe import apply_bpe_catalyst

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 400) & F.col("text").rlike(r"\A[a-z]+( [a-z]+)*\z")
    )
    out = apply_bpe_catalyst(docs, _B02_MERGES)
    return out.select(
        "doc_id",
        F.md5(F.array_join("bpe_tokens", "\x1f")).alias("enc_md5"),
        F.size("bpe_tokens").cast("bigint").alias("n_tokens"),
    )


def _bpe_chain_sql(select_keys: str, text_expr: str, from_clause: str) -> str:
    """DuckDB CTE fragment replaying the _B02_MERGES replace chain on
    ``text_expr``: yields relations s0..fin where ``fin`` carries
    ``(select_keys, t)`` with ``t`` the sep-joined token string."""
    sep = "chr(31)"
    parts = [
        f"s0 AS (SELECT {select_keys}, "
        f"{sep} || regexp_replace({text_expr}, '(.)', '\\1' || {sep}, 'g') AS s "
        f"FROM {from_clause})"
    ]
    prev = "s0"
    for i, (a, b) in enumerate(_B02_MERGES):
        cur = f"m{i}"
        parts.append(
            f"{cur} AS (SELECT {select_keys}, replace(s, "
            f"{sep}||'{a}'||{sep}||'{b}'||{sep}, {sep}||'{a}{b}'||{sep}) AS s "
            f"FROM {prev})"
        )
        prev = cur
    parts.append(
        f"fin AS (SELECT {select_keys}, "
        f"trim(replace(s, {sep}||' '||{sep}, {sep}), {sep}) AS t FROM {prev})"
    )
    return ", ".join(parts)



def _p05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 composed curation — the full crawl-to-corpus shape as ONE
    lazy plan over the new operator families: WARC container read (with
    planted 404s the status filter must drop) → HTTP split → HTML text
    extraction (with a planted Cyrillic paragraph in every third page
    that the script-profile filter must drop) → language recovered from
    the page's own ``<html lang>`` attribute → pure-Catalyst BPE token
    counts → per-language corpus report. Every stage is deterministic,
    so the oracle replays the whole composition: the survivor set is
    residue arithmetic, the extraction is string concatenation, and the
    token counts are the b02 replace chain."""
    from gfw_data_api_spark.llmops.bpe import apply_bpe_catalyst
    from gfw_data_api_spark.llmops.html import strip_html_col
    from gfw_data_api_spark.llmops.text import script_signals
    from gfw_data_api_spark.sources.warc import http_response_payload, read_warc, write_warc
    import pandas as pd

    pdf = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    pdf = pdf[
        (pdf.doc_id < 200)
        & ~pdf.text.str.contains("<", regex=False)
        & ~pdf.text.str.contains("&", regex=False)
        & ~pdf.text.str.contains(">", regex=False)
    ].sort_values("doc_id")
    tmp = tempfile.mkdtemp(prefix="gfw_p05_")
    path = os.path.join(tmp, "crawl.warc.gz")
    records = []
    for r in pdf.itertuples(index=False):
        did = int(r.doc_id)
        cyr = "<p>привет мир</p>" if did % 3 == 1 else ""
        records.append(
            {
                "warc_type": "response",
                "target_uri": f"http://example.com/doc/{did}",
                "content_type": "application/http; msgtype=response",
                "payload": http_response_payload(
                    f'<html lang="{r.lang}"><head><title>t</title></head><body>'
                    f"<nav>Home</nav><p>Doc {did} {r.text}</p>{cyr}"
                    "<script>var a = 1;</script></body></html>",
                    status=404 if did % 5 == 0 else 200,
                ),
            }
        )
    write_warc(path, records)
    pages = (
        read_warc(spark, path, record_types=("response",))
        .filter(F.col("http_status") == 200)
        .select(
            F.regexp_extract("target_uri", r"/doc/(\d+)$", 1).cast("bigint").alias("doc_id"),
            F.regexp_extract(F.col("payload").cast("string"), r'<html lang="([a-z]+)"', 1).alias("lang"),
            strip_html_col(F.col("payload").cast("string")).alias("text"),
        )
    )
    clean = script_signals(pages).filter(F.col("n_cyrillic") == 0)
    toks = apply_bpe_catalyst(clean.select("doc_id", "lang", "text"), _B02_MERGES)
    return (
        toks.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size("bpe_tokens").cast("bigint")).alias("total_tokens"),
        )
        .orderBy("lang")
    )


_SPECS.append(
    QuerySpec(
        name="p05_curate_crawl",
        spark_fn=_p05,
        oracle=(
            "WITH src AS (SELECT doc_id, lang, "
            "'Doc ' || CAST(doc_id AS VARCHAR) || ' ' || text AS ext "
            "FROM documents WHERE doc_id < 200 AND doc_id % 5 != 0 "
            "AND doc_id % 3 != 1 "
            "AND text NOT LIKE '%<%' AND text NOT LIKE '%&%' AND text NOT LIKE '%>%'), "
            + _bpe_chain_sql("doc_id, lang", "ext", "src")
            + " SELECT lang, count(*) AS n_docs, "
            "CAST(sum(length(t) - length(replace(t, chr(31), '')) + 1) AS BIGINT) "
            "AS total_tokens FROM fin GROUP BY lang ORDER BY lang"
        ),
        survey_ref="LLM pipeline: composed crawl curation (WARC read → "
        "HTTP status filter → HTML extraction → script-profile filter → "
        "Catalyst BPE token report — one lazy plan across the round-5 "
        "source and operator families)",
    )
)


def _st09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming JSONL ingest monitor, batch-twin gated (st04/st06/st08
    pattern): the SAME ingest_monitor_by_source aggregation that runs on
    a live readStream landing directory (test_jsonl.py proves
    stream==batch on a real availableNow stream with per-file
    micro-batches) runs here on the batch twin — a JSONL fixture with 5
    planted malformed shard lines. The oracle recomputes the per-source
    integer counts from parquet and pins the corrupt row."""
    import json

    import pandas as pd

    from gfw_data_api_spark.sources.jsonl import ingest_monitor_by_source, read_jsonl

    pdf = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    pdf = pdf[pdf.doc_id < 250].sort_values("doc_id")
    tmp = tempfile.mkdtemp(prefix="gfw_st09_")
    path = os.path.join(tmp, "landed.jsonl")
    with open(path, "w", encoding="utf-8") as fh:
        for row in pdf.itertuples(index=False):
            fh.write(
                json.dumps(
                    {
                        "doc_id": int(row.doc_id),
                        "source": row.source,
                        "n_chars": int(row.n_chars),
                    }
                )
                + "\n"
            )
        for i in range(5):
            fh.write('{"doc_id": %d, "source": "s' % i + "\n")
    df = read_jsonl(
        spark, path, schema="doc_id bigint, source string, n_chars bigint"
    )
    return ingest_monitor_by_source(df)


_SPECS.append(
    QuerySpec(
        name="st09_jsonl_stream_monitor",
        spark_fn=_st09,
        oracle=(
            "SELECT source, count(*) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars "
            "FROM documents WHERE doc_id < 250 GROUP BY source "
            "UNION ALL SELECT '__corrupt__', CAST(5 AS BIGINT), CAST(0 AS BIGINT)"
        ),
        survey_ref="streaming × ingestion: continuous JSONL landing "
        "monitor (sources/jsonl.py stream_jsonl + "
        "ingest_monitor_by_source — one shared aggregation for stream "
        "and batch; stream==batch pinned on a real readStream in tests)",
    )
)


def _c05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt compliance inside the hard gate: per-host robots
    bodies and URLs are both planted by id arithmetic — each host's
    body contains a DECOY agent group (megabot) that must be ignored
    for '*', a disallow prefix, and a longer allow prefix beneath it,
    so the gate exercises agent-group selection, longest-match
    precedence, and the no-match default in one pass. Spark REALLY
    parses the bodies (Arrow UDF) and joins rules to URLs; the oracle
    knows every verdict in closed form (residue CASE arithmetic)."""
    from gfw_data_api_spark.llmops.robots import parse_robots, robots_filter

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 350)
    h = F.col("doc_id") % 7
    hosts = (
        docs.select(h.alias("_h"))
        .distinct()
        .select(
            F.concat(F.lit("host"), F.col("_h").cast("string"), F.lit(".example")).alias(
                "host"
            ),
            F.concat(
                F.lit("User-agent: megabot\nDisallow: /m"),
                F.col("_h").cast("string"),
                F.lit("/\n\nUser-agent: *\nDisallow: /p"),
                (F.col("_h") % 3).cast("string"),
                F.lit("/\nAllow: /p"),
                (F.col("_h") % 3).cast("string"),
                F.lit("/ok/\n"),
            ).alias("robots_txt"),
        )
    )
    r = F.col("doc_id") % 4
    sid = F.col("doc_id").cast("string")
    p = (h % 3).cast("string")
    urls = docs.select(
        "doc_id",
        F.concat(F.lit("host"), h.cast("string"), F.lit(".example")).alias("host"),
        F.when(r == 0, F.concat(F.lit("/p"), p, F.lit("/x"), sid))
        .when(r == 1, F.concat(F.lit("/p"), p, F.lit("/ok/x"), sid))
        .when(r == 2, F.concat(F.lit("/q/x"), sid))
        .otherwise(F.concat(F.lit("/m"), h.cast("string"), F.lit("/x"), sid))
        .alias("path"),
    )
    rules = parse_robots(hosts)
    return robots_filter(urls, rules).select("doc_id", "path", "robots_allowed")


_SPECS.append(
    QuerySpec(
        name="c05_robots_filter",
        spark_fn=_c05,
        oracle=(
            "SELECT doc_id, "
            "CASE doc_id % 4 "
            "WHEN 0 THEN '/p' || CAST((doc_id % 7) % 3 AS VARCHAR) || '/x' || CAST(doc_id AS VARCHAR) "
            "WHEN 1 THEN '/p' || CAST((doc_id % 7) % 3 AS VARCHAR) || '/ok/x' || CAST(doc_id AS VARCHAR) "
            "WHEN 2 THEN '/q/x' || CAST(doc_id AS VARCHAR) "
            "ELSE '/m' || CAST(doc_id % 7 AS VARCHAR) || '/x' || CAST(doc_id AS VARCHAR) END AS path, "
            "doc_id % 4 != 0 AS robots_allowed "
            "FROM documents WHERE doc_id < 350"
        ),
        survey_ref="LLM pipeline: robots.txt compliance filtering "
        "(llmops/robots.py — RFC 9309 agent-group selection, "
        "longest-match precedence with allow-wins ties, wildcard/anchor "
        "paths; host-keyed rule join + combine-friendly max_by winner)",
    )
)


def _b02_oracle() -> str:
    sep = "chr(31)"
    return (
        "WITH "
        + _bpe_chain_sql(
            "doc_id",
            "text",
            "documents WHERE doc_id < 400 "
            "AND regexp_matches(text, '^[a-z]+( [a-z]+)*$')",
        )
        + " SELECT doc_id, md5(t) AS enc_md5, "
        f"CAST(length(t) - length(replace(t, {sep}, '')) + 1 AS BIGINT) AS n_tokens "
        "FROM fin"
    )


_SPECS.append(
    QuerySpec(
        name="b02_bpe_encode",
        spark_fn=_b02,
        oracle=_b02_oracle(),
        survey_ref="LLM pipeline: BPE tokenizer application in pure "
        "Catalyst (llmops/bpe.py apply_bpe_catalyst — chained native "
        "replace in merge-rank order; sequential replace-all == exact "
        "BPE outside repeated-pair runs, documented; pandas-UDF twin "
        "apply_bpe pinned equal on this vocabulary in pytest)",
    )
)


def _e19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset shard export inside the hard gate: documents are
    written to real tar shards (deterministic md5-bucket sharding,
    id-sorted members, zeroed tar metadata), read BACK through the tar
    scanner, and the reassembled samples (text member + parsed JSON
    metadata member) must reproduce the parquet rows — the full
    export→loader roundtrip a training pipeline depends on."""
    from gfw_data_api_spark.llmops.export import read_webdataset, write_webdataset

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    out_dir = os.path.join(tempfile.mkdtemp(prefix="gfw_e19_"), "wds")
    write_webdataset(
        docs, out_dir, meta_cols=["lang", "n_chars"], n_shards=6
    ).collect()
    back = read_webdataset(spark, out_dir)
    texts = back.filter(F.col("ext") == "txt").select(
        F.col("key").cast("bigint").alias("doc_id"),
        F.md5(F.col("payload").cast("string")).alias("text_md5"),
    )
    metas = back.filter(F.col("ext") == "json").select(
        F.col("key").cast("bigint").alias("doc_id"),
        F.from_json(
            F.col("payload").cast("string"), "lang string, n_chars bigint"
        ).alias("m"),
    ).select("doc_id", F.col("m.lang").alias("lang"), F.col("m.n_chars").alias("n_chars"))
    return texts.join(metas, "doc_id")


_SPECS.append(
    QuerySpec(
        name="e19_webdataset_roundtrip",
        spark_fn=_e19,
        oracle=(
            "SELECT doc_id, md5(text) AS text_md5, lang, n_chars "
            "FROM documents WHERE doc_id < 300"
        ),
        survey_ref="LLM pipeline: WebDataset tar shard export/import "
        "(llmops/export.py — deterministic md5-bucket sharding, "
        "bit-reproducible shard bytes, tarfile scan in Arrow batches; "
        "gated as a full write→read→reassemble roundtrip)",
    )
)


def _e20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-budget shard assignment inside the hard gate (round 7,
    llmops/export.py assign_byte_shards): documents bin into ~50 KB
    shards by the prefix-bin rule over exact octet lengths. The Spark
    side computes the prefix sum the DISTRIBUTED way (per-bucket
    partials → driver prefix over the small bucket table → broadcast
    offsets + bucket-partitioned window — no unpartitioned window
    anywhere); the oracle recomputes the same shard ids with DuckDB's
    single global window, so the two-level scan is proven equal to the
    textbook one."""
    from gfw_data_api_spark.llmops.export import assign_byte_shards

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = assign_byte_shards(docs, target_bytes=50_000)
    return out.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.octet_length("text")).alias("shard_bytes"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


_SPECS.append(
    QuerySpec(
        name="e20_byte_budget_shards",
        spark_fn=_e20,
        oracle=(
            "WITH c AS (SELECT doc_id, octet_length(encode(text)) AS b, "
            "sum(octet_length(encode(text))) OVER (ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum "
            "FROM documents) "
            "SELECT CAST((cum - b) // 50000 AS BIGINT) AS shard_id, "
            "CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(b) AS BIGINT) AS shard_bytes, "
            "min(doc_id) AS first_doc, max(doc_id) AS last_doc "
            "FROM c GROUP BY 1"
        ),
        survey_ref="LLM pipeline: byte-budget shard assignment "
        "(llmops/export.py assign_byte_shards — two-level distributed "
        "prefix sum: bucket partials, driver prefix, partitioned window; "
        "the DuckDB oracle is the single-window textbook form)",
    )
)


def _w03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ES weighted sampling inside the hard gate: weights are residue
    arithmetic, the uniform is the engine's portable 60-bit md5
    integer, and the oracle draws the IDENTICAL sample by replaying
    key = ln((h+1)/2^60)/w and taking the same top-k — JVM ln and
    DuckDB ln agree bit-for-bit on these inputs (probed for the
    geometry gates), and md5-distinct uniforms make boundary ties
    impossible."""
    from gfw_data_api_spark.llmops.sampling import weighted_sample_without_replacement

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", ((F.col("c_custkey") % 7 + 1).cast("double")).alias("w")
    )
    out = weighted_sample_without_replacement(
        cust, k=60, weight_col="w", id_col="c_custkey", seed=0
    )
    return out.select("c_custkey", F.col("w").cast("bigint").alias("weight"))


_SPECS.append(
    QuerySpec(
        name="w03_weighted_sample",
        spark_fn=_w03,
        oracle=(
            "WITH t AS (SELECT c_custkey, (c_custkey % 7 + 1) AS w, "
            "CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || chr(31) || '0'), "
            "1, 15)) AS BIGINT) AS h FROM customer) "
            "SELECT c_custkey, CAST(w AS BIGINT) AS weight FROM t "
            "ORDER BY ln((h + 1) / 1152921504606846976.0) / w DESC LIMIT 60"
        ),
        survey_ref="LLM pipeline: deterministic weighted sampling "
        "without replacement (llmops/sampling.py "
        "weighted_sample_without_replacement — Efraimidis-Spirakis A-ES "
        "keys over the portable md5 uniform; TakeOrdered top-k, no "
        "global sort, partitioning/engine-stable draws)",
    )
)


def _c08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aho-Corasick blocklist screening inside the hard gate — c06's
    planted truth pushed through the SCALE path: the blocklist is the
    two planted terms plus 3000 decoys that never occur (far past the
    regexp alternation's 20k-char guard), so the automaton's O(text)
    scan is what produces the counts. Verdicts are the same closed-form
    residue constants as c06."""
    from gfw_data_api_spark.llmops.clean import keyword_blocklist_signals_ac

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 400)
        & ~F.lower("text").contains("badword")
        & ~F.lower("text").contains("evilterm")
    )
    r = F.col("doc_id") % 4
    aug = docs.select(
        "doc_id",
        F.when(r == 1, F.concat("text", F.lit(" badword")))
        .when(r == 2, F.concat(F.lit("badword start "), "text", F.lit(" BadWord evilterm")))
        .when(r == 3, F.concat("text", F.lit(" badwordly")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    blocklist = ["badword", "evilterm"] + [f"zqdecoy{i:05d}" for i in range(3000)]
    out = keyword_blocklist_signals_ac(aug, blocklist)
    return out.select("doc_id", "n_blocklist_hits", "is_blocked")


_SPECS.append(
    QuerySpec(
        name="c08_blocklist_aho_corasick",
        spark_fn=_c08,
        oracle=(
            "SELECT doc_id, "
            "CAST(CASE doc_id % 4 WHEN 1 THEN 1 WHEN 2 THEN 3 ELSE 0 END AS BIGINT) "
            "AS n_blocklist_hits, "
            "doc_id % 4 IN (1, 2) AS is_blocked "
            "FROM documents WHERE doc_id < 400 "
            "AND lower(text) NOT LIKE '%badword%' "
            "AND lower(text) NOT LIKE '%evilterm%'"
        ),
        survey_ref="LLM pipeline: large-blocklist screening at scale "
        "(llmops/clean.py AhoCorasick + keyword_blocklist_signals_ac — "
        "O(text) automaton scan independent of keyword count, Arrow "
        "batches; FlashText word-edge semantics pinned equal to the "
        "regexp path in tests)",
    )
)


def _c07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mojibake repair inside the hard gate: per-residue planted
    UTF-8-read-as-cp1252 sequences (built by the module's own
    _cp1252ish mangler at gate time, so the fixture is real mojibake
    bytes) appended to clean ascii text; after repair_mojibake the
    oracle's expected strings are pure concatenations with the REPAIRED
    unicode literals — md5 plus character length pin the fix exactly,
    and the residue-0 rows pin that clean text passes through
    untouched."""
    from gfw_data_api_spark.llmops.clean import _cp1252ish, repair_mojibake

    moji_cafe = _cp1252ish(" café".encode("utf-8"))
    moji_dash = _cp1252ish(" — “quoted” …".encode("utf-8"))
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 400) & F.col("text").rlike(r"\A[a-z ]+\z")
    )
    r = F.col("doc_id") % 3
    mangled = docs.select(
        "doc_id",
        F.when(r == 1, F.concat("text", F.lit(moji_cafe)))
        .when(r == 2, F.concat("text", F.lit(moji_dash)))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    out = repair_mojibake(mangled)
    return out.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.length("text").cast("bigint").alias("n_chars_repaired"),
    )


_SPECS.append(
    QuerySpec(
        name="c07_mojibake_repair",
        spark_fn=_c07,
        oracle=(
            "WITH fixed AS (SELECT doc_id, text || CASE doc_id % 3 "
            "WHEN 1 THEN ' café' WHEN 2 THEN ' — “quoted” …' ELSE '' END AS t "
            "FROM documents WHERE doc_id < 400 AND regexp_matches(text, '^[a-z ]+$')) "
            "SELECT doc_id, md5(t) AS text_md5, "
            "CAST(length(t) AS BIGINT) AS n_chars_repaired FROM fixed"
        ),
        survey_ref="LLM pipeline: mojibake repair (llmops/clean.py "
        "repair_mojibake — ftfy core case, UTF-8-as-cp1252 double "
        "encoding undone by longest-first literal replaces; pure "
        "codegen, zero shuffle)",
    )
)


def _b03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE token-id encoding inside the hard gate: ids come from the
    merge-derived vocabulary (GPT-2 construction — alphabet ids then
    merge outputs in rank order, llmops/bpe.bpe_vocab), so the oracle
    can map every token WITHOUT any vocab exchange: single chars are
    ascii(tok)-97 and merge outputs are 26+rank. The Spark side is the
    full production path (replace-chain encode + literal create_map
    lookup, zero shuffle/Python); the comparison pins the id SEQUENCE
    per document (md5 of comma-joined ids) plus exact sums/counts."""
    from gfw_data_api_spark.llmops.bpe import encode_token_ids

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 400) & F.col("text").rlike(r"\A[a-z]+( [a-z]+)*\z")
    )
    out = encode_token_ids(docs, _B02_MERGES)
    ids = F.col("token_ids")
    return out.select(
        "doc_id",
        F.size(ids).cast("bigint").alias("n_tokens"),
        F.aggregate(ids, F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias("sum_ids"),
        F.md5(F.array_join(F.transform(ids, lambda x: x.cast("string")), ",")).alias(
            "ids_md5"
        ),
    )


def _b03_oracle() -> str:
    case = " ".join(
        f"WHEN '{a}{b}' THEN {26 + i}" for i, (a, b) in enumerate(_B02_MERGES)
    )
    return (
        "WITH "
        + _bpe_chain_sql(
            "doc_id",
            "text",
            "documents WHERE doc_id < 400 "
            "AND regexp_matches(text, '^[a-z]+( [a-z]+)*$')",
        )
        + ", tok AS (SELECT doc_id, unnest(string_split(t, chr(31))) AS tok, "
        "generate_subscripts(string_split(t, chr(31)), 1) AS ord FROM fin), "
        "ids AS (SELECT doc_id, ord, CASE WHEN length(tok) = 1 "
        f"THEN ascii(tok) - 97 ELSE CASE tok {case} END END AS id FROM tok) "
        "SELECT doc_id, count(*) AS n_tokens, "
        "CAST(sum(id) AS BIGINT) AS sum_ids, "
        "md5(string_agg(CAST(id AS VARCHAR), ',' ORDER BY ord)) AS ids_md5 "
        "FROM ids GROUP BY doc_id"
    )


_SPECS.append(
    QuerySpec(
        name="b03_token_id_encoding",
        spark_fn=_b03,
        oracle=_b03_oracle(),
        survey_ref="LLM pipeline: BPE token-id encoding "
        "(llmops/bpe.py bpe_vocab + encode_token_ids — merge-derived id "
        "space, literal create_map lookup; zero shuffle, zero Python, "
        "no vocab exchange between pipelines)",
    )
)


def _e15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC ingestion inside the hard gate, end-to-end crawl shape: wrap
    every document's text in an HTML page, the page in an HTTP/1.1
    response, the response in a per-record-gzipped WARC file (the real
    Common Crawl layout, via the module's own writer — byte-exactness of
    writer+reader is pinned separately in tests), then run the engine
    pipeline: read_warc → HTTP split → strip_html_col → md5. The oracle
    recomputes the expected extraction from the raw text column by pure
    concatenation (the c04 pattern), plus the constant HTTP status the
    parser must recover."""
    import pandas as pd

    from gfw_data_api_spark.llmops.html import strip_html_col
    from gfw_data_api_spark.sources.warc import http_response_payload, read_warc, write_warc

    pdf = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    pdf = pdf[
        (pdf.doc_id < 150)
        & ~pdf.text.str.contains("<", regex=False)
        & ~pdf.text.str.contains("&", regex=False)
        & ~pdf.text.str.contains(">", regex=False)
    ].sort_values("doc_id")
    tmp = tempfile.mkdtemp(prefix="gfw_e15_")
    path = os.path.join(tmp, "crawl.warc.gz")
    records = [
        {
            "warc_type": "warcinfo",
            "payload": "software: gfw-fixture\r\n",
            "content_type": "application/warc-fields",
        }
    ] + [
        {
            "warc_type": "response",
            "target_uri": f"http://example.com/doc/{int(r.doc_id)}",
            "content_type": "application/http; msgtype=response",
            "payload": http_response_payload(
                "<html><head><title>t</title></head><body><nav>Home | About</nav>"
                f"<p>Doc {int(r.doc_id)} {r.text}</p>"
                "<script>var a = 1;</script></body></html>"
            ),
        }
        for r in pdf.itertuples(index=False)
    ]
    write_warc(path, records)
    df = read_warc(spark, path, record_types=("response",))
    return df.select(
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1).cast("bigint").alias("doc_id"),
        F.md5(strip_html_col(F.col("payload").cast("string"))).alias("text_md5"),
        F.col("http_status").cast("bigint").alias("http_status"),
    )


_SPECS.append(
    QuerySpec(
        name="e15_warc_ingest",
        spark_fn=_e15,
        oracle=(
            "SELECT doc_id, "
            "md5('Doc ' || CAST(doc_id AS VARCHAR) || ' ' || text) AS text_md5, "
            "CAST(200 AS BIGINT) AS http_status "
            "FROM documents WHERE doc_id < 150 "
            "AND text NOT LIKE '%<%' AND text NOT LIKE '%&%' AND text NOT LIKE '%>%'"
        ),
        survey_ref="LLM pipeline: WARC/Common-Crawl container ingestion "
        "(sources/warc.py — per-record-gzip member parse, HTTP response "
        "split, executor-side mapInPandas; composed with llmops/html "
        "extraction end-to-end)",
    )
)


def _e18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E12 vector export inside the hard gate: features assembled from
    customer rows (canonical point GeoJSON via the e16 arithmetic) are
    exported through the REAL export_ndjson_features writer (native
    to_json feature assembly, geometry spliced as raw text), the NDJSON
    files are read BACK with Spark's JSON reader, and the reparsed
    properties/geometry must reproduce the source rows — a full
    write→parse roundtrip, with the oracle recomputing everything from
    the parquet. gfw_geojson/geom columns must be excluded from
    properties by the writer's own rule."""
    from gfw_data_api_spark.operators.downloads import export_ndjson_features

    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 150)
    feats = cust.select(
        "c_custkey",
        "c_name",
        F.concat(
            F.lit('{"type": "Point", "coordinates": ['),
            (F.col("c_custkey") % 19).cast("string"),
            F.lit(", "),
            (F.col("c_custkey") % 7).cast("string"),
            F.lit("]}"),
        ).alias("gfw_geojson"),
    )
    tmp = tempfile.mkdtemp(prefix="gfw_e18_")
    path = os.path.join(tmp, "export")
    export_ndjson_features(feats, path)
    back = spark.read.schema(
        "type string, properties struct<c_custkey:bigint, c_name:string>, "
        "geometry struct<type:string, coordinates:array<bigint>>"
    ).json(path)
    return back.select(
        F.col("properties.c_custkey").alias("c_custkey"),
        F.col("properties.c_name").alias("c_name"),
        F.col("type").alias("feature_type"),
        F.col("geometry.type").alias("geom_type"),
        F.col("geometry.coordinates")[0].alias("x"),
        F.col("geometry.coordinates")[1].alias("y"),
    )


_SPECS.append(
    QuerySpec(
        name="e18_vector_export_roundtrip",
        spark_fn=_e18,
        oracle=(
            "SELECT c_custkey, c_name, 'Feature' AS feature_type, "
            "'Point' AS geom_type, "
            "CAST(c_custkey % 19 AS BIGINT) AS x, "
            "CAST(c_custkey % 7 AS BIGINT) AS y "
            "FROM customer WHERE c_custkey < 150"
        ),
        survey_ref="E12 vector export (operators/downloads.py "
        "export_ndjson_features — native to_json Feature assembly, raw "
        "geometry splice, geom/gfw_* property exclusion; gated as a "
        "full write→reparse roundtrip)",
    )
)


def _e17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E14 feature-info selection inside the hard gate: a registered
    version whose table carries BOTH feature-info columns and excluded
    ones (a ``geom``-prefixed geometry and an underscore-prefixed
    internal hash — the reference's is_feature_info rule,
    app/utils/fields.py), field metadata harvested from the real
    schema by set_asset_fields, then three exact-id lookups through
    feature_by_id (I7 path) whose projection must drop the excluded
    columns. The driver's schema comparison enforces the exclusion:
    a leaked geom/_ column fails the column-name match."""
    from gfw_data_api_spark.catalog.registry import Registry
    from gfw_data_api_spark.operators.features import feature_by_id

    registry = Registry(tempfile.mkdtemp(prefix="gfw_e17_"))
    tbl = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 120).select(
        "c_custkey",
        "c_name",
        "c_acctbal",
        F.concat(F.lit("POINT("), (F.col("c_custkey") % 19).cast("string"), F.lit(" 0)")).alias(
            "geom_wkt"
        ),
        F.md5("c_name").alias("_row_hash"),
    )
    registry.ensure_dataset("vec")
    registry.create_version("vec", "v1")
    asset = registry.create_asset("vec", "v1", "geo_database_table", is_default=True)
    tbl.write.mode("overwrite").parquet(asset.asset_uri)
    registry.set_asset_fields(asset.asset_id, tbl)
    registry.set_asset_status(asset.asset_id, "saved")
    registry.set_version_status("vec", "v1", "saved", "e17 fixture")
    parts = [
        feature_by_id(spark, registry, "vec", "v1", "c_custkey", k) for k in (5, 17, 46)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_SPECS.append(
    QuerySpec(
        name="e17_feature_info_selection",
        spark_fn=_e17,
        oracle=(
            "SELECT c_custkey, c_name, c_acctbal FROM customer "
            "WHERE c_custkey IN (5, 17, 46)"
        ),
        survey_ref="E14 feature-info selection + I7 exact-id lookup "
        "(catalog/registry.py set_asset_fields/feature_info_fields — "
        "is_feature_info excludes geom*/_-prefixed columns like the "
        "reference's fields harvest; operators/features.py "
        "feature_by_id projects to the selected set)",
    )
)


def _c06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-blocklist screening inside the hard gate: planted
    occurrences by residue — residue 1 appends one blocked term,
    residue 2 appends three (two of one term + one of another, one
    embedded mid-sentence), residue 3 appends a SUPERSTRING of a
    blocked term ('badwordly') that whole-word matching must NOT
    count. Texts are pre-filtered (identically both sides) to exclude
    accidental occurrences, so every count is a closed-form residue
    constant the oracle emits directly."""
    from gfw_data_api_spark.llmops.clean import keyword_blocklist_signals

    # exclusion must be case-INsensitive like the matcher it guards —
    # a corpus 'Badword' would otherwise break the closed-form counts
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 400)
        & ~F.lower("text").contains("badword")
        & ~F.lower("text").contains("evilterm")
    )
    r = F.col("doc_id") % 4
    aug = docs.select(
        "doc_id",
        F.when(r == 1, F.concat("text", F.lit(" badword")))
        .when(r == 2, F.concat(F.lit("badword start "), "text", F.lit(" BadWord evilterm")))
        .when(r == 3, F.concat("text", F.lit(" badwordly")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    out = keyword_blocklist_signals(aug, ["badword", "evilterm"])
    return out.select("doc_id", "n_blocklist_hits", "is_blocked")


_SPECS.append(
    QuerySpec(
        name="c06_keyword_blocklist",
        spark_fn=_c06,
        oracle=(
            "SELECT doc_id, "
            "CAST(CASE doc_id % 4 WHEN 1 THEN 1 WHEN 2 THEN 3 ELSE 0 END AS BIGINT) "
            "AS n_blocklist_hits, "
            "doc_id % 4 IN (1, 2) AS is_blocked "
            "FROM documents WHERE doc_id < 400 "
            "AND lower(text) NOT LIKE '%badword%' "
            "AND lower(text) NOT LIKE '%evilterm%'"
        ),
        survey_ref="LLM pipeline: keyword-blocklist screening "
        "(llmops/clean.py keyword_blocklist_signals — one compiled "
        "longest-first alternation via native regexp_count, whole-word "
        "boundaries, case folding; zero shuffle)",
    )
)


def _e16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E11 geostore inheritance inside the hard gate: two REAL
    geo_database_table versions are registered in a scratch catalog,
    their rows built natively (content-addressed gfw_geostore_id =
    dash-formatted md5 of the canonical GeoJSON — reference
    crud/geostore.py:82-134), and the REAL Geostore.inherited_view
    union is what the gate returns. The oracle recomputes every id
    with DuckDB's own md5 over the identical canonical string, so the
    content-addressing contract (not just row plumbing) is pinned
    cross-engine. Customers with residue 2 are registered in NEITHER
    version and must be absent."""
    from gfw_data_api_spark.catalog.geostore import Geostore
    from gfw_data_api_spark.catalog.registry import Registry

    registry = Registry(tempfile.mkdtemp(prefix="gfw_e16_"))
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 90)
    x = (F.col("c_custkey") % 19).cast("string")
    y = (F.col("c_custkey") % 7).cast("string")
    gj = F.concat(
        F.lit('{"type": "Point", "coordinates": ['), x, F.lit(", "), y, F.lit("]}")
    )
    h = F.md5(gj)
    gid = F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )
    feats = cust.select(
        (F.col("c_custkey") % 3).alias("_r"),
        gid.alias("gfw_geostore_id"),
        gj.alias("gfw_geojson"),
        F.lit(0.0).alias("gfw_area__ha"),
        F.array(
            (F.col("c_custkey") % 19).cast("double"),
            (F.col("c_custkey") % 7).cast("double"),
            (F.col("c_custkey") % 19).cast("double"),
            (F.col("c_custkey") % 7).cast("double"),
        ).alias("gfw_bbox"),
    )
    for version, residue in (("v1", 0), ("v2", 1)):
        registry.ensure_dataset("vec")
        registry.create_version("vec", version)
        asset = registry.create_asset("vec", version, "geo_database_table", is_default=True)
        feats.filter(F.col("_r") == residue).drop("_r").write.mode("overwrite").parquet(
            asset.asset_uri
        )
        registry.set_asset_status(asset.asset_id, "saved")
        registry.set_version_status("vec", version, "saved", "e16 fixture")
    union = Geostore(registry).inherited_view(spark)
    return union.select("gfw_geostore_id", "gfw_geojson")


_SPECS.append(
    QuerySpec(
        name="e16_geostore_inheritance",
        spark_fn=_e16,
        oracle=(
            "WITH f AS (SELECT c_custkey, "
            "'{\"type\": \"Point\", \"coordinates\": [' || "
            "CAST(c_custkey % 19 AS VARCHAR) || ', ' || "
            "CAST(c_custkey % 7 AS VARCHAR) || ']}' AS gj "
            "FROM customer WHERE c_custkey < 90 AND c_custkey % 3 IN (0, 1)), "
            "h AS (SELECT gj, md5(gj) AS hx FROM f) "
            "SELECT substr(hx, 1, 8) || '-' || substr(hx, 9, 4) || '-' || "
            "substr(hx, 13, 4) || '-' || substr(hx, 17, 4) || '-' || "
            "substr(hx, 21, 12) AS gfw_geostore_id, gj AS gfw_geojson FROM h"
        ),
        survey_ref="E11 geostore inheritance (catalog/geostore.py "
        "inherited_view — content-addressed ids over a lazily-unioned "
        "registry of geo versions; reference inherit_geostore.sh + "
        "crud/geostore.py md5-uuid addressing)",
    )
)


def _t22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode script profiling inside the hard gate: append a planted
    multi-script suffix chosen by doc_id residue (Cyrillic / CJK /
    Greek+digits) to real latin-only text, run script_signals, and emit
    the COUNTS (exact integers — ratios stay pytest-only because
    round(float) near representable halves is a cross-engine hazard).
    The oracle never parses Unicode at all: base latin/space counts come
    from length arithmetic on the raw text (pre-filtered identically to
    '^[a-z ]+$' on both sides) and each suffix contributes per-residue
    constants."""
    from gfw_data_api_spark.llmops.text import script_signals

    suffixes = {
        1: " привет мир",  # " привет мир"
        2: " 中文文本",  # " 中文文本"
        3: " αβγ 123",  # " αβγ 123"
    }
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 400) & F.col("text").rlike(r"\A[a-z ]+\z")
    )
    r = F.col("doc_id") % 4
    aug = docs.withColumn(
        "text",
        F.concat(
            "text",
            F.when(r == 1, F.lit(suffixes[1]))
            .when(r == 2, F.lit(suffixes[2]))
            .when(r == 3, F.lit(suffixes[3]))
            .otherwise(F.lit("")),
        ),
    )
    return script_signals(aug).select(
        "doc_id",
        "n_latin",
        "n_cyrillic",
        "n_greek",
        "n_cjk",
        "n_hangul",
        "n_digit",
        "n_space",
        "n_other",
        "dominant_script",
    )


_SPECS.append(
    QuerySpec(
        name="t22_script_signals",
        spark_fn=_t22,
        oracle=(
            "SELECT doc_id, "
            "CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_latin, "
            "CAST(CASE WHEN doc_id % 4 = 1 THEN 9 ELSE 0 END AS BIGINT) AS n_cyrillic, "
            "CAST(CASE WHEN doc_id % 4 = 3 THEN 3 ELSE 0 END AS BIGINT) AS n_greek, "
            "CAST(CASE WHEN doc_id % 4 = 2 THEN 4 ELSE 0 END AS BIGINT) AS n_cjk, "
            "CAST(0 AS BIGINT) AS n_hangul, "
            "CAST(CASE WHEN doc_id % 4 = 3 THEN 3 ELSE 0 END AS BIGINT) AS n_digit, "
            "CAST(length(text) - length(replace(text, ' ', '')) + "
            "CASE doc_id % 4 WHEN 1 THEN 2 WHEN 2 THEN 1 WHEN 3 THEN 2 "
            "ELSE 0 END AS BIGINT) AS n_space, "
            "CAST(0 AS BIGINT) AS n_other, "
            "'latin' AS dominant_script "
            "FROM documents WHERE doc_id < 400 AND regexp_matches(text, '^[a-z ]+$')"
        ),
        survey_ref="LLM pipeline: Unicode script profiling for "
        "mixed-script filtering (llmops/text.py script_signals — "
        "per-block counts via codegen length/regexp_replace arithmetic, "
        "deterministic dominant-script argmax; zero shuffle)",
    )
)


def _m07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Progressive JPEG decode inside the hard gate (the m03 pattern:
    exact planted ints + error-envelope booleans the oracle pins TRUE).

    Per selected document, a deterministic gradient image is encoded
    BOTH baseline (SOF0) and progressive (SOF2 — spectral selection +
    successive approximation, llmops/jpeg.py Annex G path) and both
    streams are decoded by the real decoder. ``decode_match`` pins the
    bit-identity contract (the progressive encoder emits the same
    quantized coefficients, so any defect in EOB runs, refinement
    correction bits, or band assembly breaks equality); ``mean_err_ok``
    pins the lossy envelope against the source pixels. Everything runs
    executor-side in one mapInPandas — no shuffle, no join."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 20 == 0)
        .select("doc_id")
    )

    def synth(batches):
        import numpy as np

        from gfw_data_api_spark.llmops.jpeg import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        for pdf in batches:
            rows = {"doc_id": [], "h": [], "w": [], "decode_match": [], "mean_err_ok": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                h, w = 8 + d % 5, 9 + d % 3
                rng = np.random.default_rng(d * 31 + 3)
                img = rng.integers(20, 236, (h, w, 3)).astype(np.uint8)
                base = decode_jpeg(encode_jpeg(img, quality=88, subsampling="444"))
                prog = decode_jpeg(
                    encode_jpeg_progressive(img, quality=88, dc_al=1, ac_al=1)
                )
                err = float(np.mean(np.abs(base.astype(np.int64) - img.astype(np.int64))))
                rows["doc_id"].append(d)
                rows["h"].append(h)
                rows["w"].append(w)
                rows["decode_match"].append(bool((base == prog).all()))
                # noise images at quality 88 measure mean-abs error 7–8.4
                # across the sf0.01 id range; a broken decode (wrong IDCT,
                # desynced scan) lands at 40+ — 12 separates them with
                # margin on BOTH sides
                rows["mean_err_ok"].append(err <= 12.0)
            import pandas as pd

            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        synth,
        schema="doc_id bigint, h bigint, w bigint, decode_match boolean, mean_err_ok boolean",
    )


_SPECS.append(
    QuerySpec(
        name="m07_progressive_jpeg_decode",
        spark_fn=_m07,
        oracle=(
            "SELECT doc_id, 8 + doc_id % 5 AS h, 9 + doc_id % 3 AS w, "
            "TRUE AS decode_match, TRUE AS mean_err_ok "
            "FROM documents WHERE doc_id % 20 = 0"
        ),
        survey_ref="multimodal: progressive (SOF2) JPEG decode contract "
        "(llmops/jpeg.py T.81 Annex G — spectral selection + successive "
        "approximation; bit-identity vs the baseline decode pinned as an "
        "oracle boolean)",
    )
)


def _d15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup quality-envelope gate (VERDICT r5 #3): the k-means
    structure inside semantic_dedup (llmops/similarity.py, Abbas et al.
    2023) can't reproduce in SQL, but its KEEP/DROP contract on a
    planted corpus can — exactly the s08/s10 rescue pattern.

    Fixture: reals = embeddings with vec_id < 200; every 5th real gets
    an EXACT copy planted at vec_id + 10000. Identical vectors have
    identical centroid distances, so k-means puts each copy in its
    original's cell regardless of how training converged, and the
    in-cell pair scores cosine 1.0 ≥ 0.95 while the loudest natural
    pair measures ≤ 0.48 across every test SF (probed) — so the exact
    survivor set is determined: the lower id of each planted pair
    (the original) survives, the copy drops, and every unpaired real
    survives. A silent regression anywhere — degenerate training,
    wrong cell assignment, broken pair threshold, inverted keep
    policy — flips booleans and fails the hash compare."""
    from gfw_data_api_spark.llmops.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    dups = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding").unionByName(dups)
    kept = semantic_dedup(corpus, threshold=0.95, nlist=8).select(
        "vec_id", F.lit(True).alias("survived")
    )
    return (
        corpus.select("vec_id")
        .join(kept, "vec_id", "left")
        .select("vec_id", F.coalesce("survived", F.lit(False)).alias("survived"))
    )


_SPECS.append(
    QuerySpec(
        name="d15_semantic_dedup_envelope",
        spark_fn=_d15,
        oracle=(
            "SELECT vec_id, TRUE AS survived FROM embeddings WHERE vec_id < 200 "
            "UNION ALL "
            "SELECT vec_id + 10000 AS vec_id, FALSE AS survived "
            "FROM embeddings WHERE vec_id < 200 AND vec_id % 5 = 0"
        ),
        survey_ref="LLM pipeline: SemDeDup keep/drop contract on planted "
        "exact-copy clusters (llmops/similarity.py semantic_dedup; "
        "companion full oracle to rows-only d11)",
    )
)


# ---------------------------------------------------------------------------
# round-6 dialect breadth gates (VERDICT r5 #7): the reference passes any
# single-table PG SELECT through to Postgres (app/crud/queries.py), so the
# engine must compute PG semantics for PG-isms Spark parses differently or
# not at all. sql/dialect.py round-6 translations under test: ~ / ~* / !~
# regex operators, SIMILAR TO, BETWEEN SYMMETRIC, ^ (PG exponentiation —
# Spark's ^ is XOR, silently wrong before this round), EXTRACT
# DOW/ISODOW/EPOCH (PG DOW is Sunday=0; Spark's is Sunday=1), and the PG
# function names starts_with / string_to_array.
# ---------------------------------------------------------------------------

_SPECS.append(
    QuerySpec(
        name="q31_dialect_pg_operators",
        spark_fn=_guarded(
            "lineitem",
            "SELECT l_returnflag, "
            "count(*) FILTER (WHERE l_linestatus ~ '^O') AS n_tilde, "
            "count(*) FILTER (WHERE l_linestatus ~* 'o') AS n_tilde_ci, "
            "count(*) FILTER (WHERE l_linestatus !~ 'O|X') AS n_not_tilde, "
            "count(*) FILTER (WHERE l_linestatus SIMILAR TO '(O|F)') AS n_similar, "
            "count(*) FILTER (WHERE l_quantity BETWEEN SYMMETRIC 30 AND 20) AS n_sym, "
            "CAST(sum(l_linenumber ^ 2) AS BIGINT) AS sum_sq "
            "FROM data GROUP BY l_returnflag ORDER BY l_returnflag",
        ),
        oracle=(
            # DuckDB's SIMILAR TO is plain-regex (no % wildcard), it has
            # no BETWEEN SYMMETRIC, and its ~ IS PG's — mirror with
            # equivalents where the surfaces diverge
            "SELECT l_returnflag, "
            "count(*) FILTER (WHERE l_linestatus ~ '^O') AS n_tilde, "
            "count(*) FILTER (WHERE regexp_matches(l_linestatus, '(?i)o')) AS n_tilde_ci, "
            "count(*) FILTER (WHERE NOT regexp_matches(l_linestatus, 'O|X')) AS n_not_tilde, "
            "count(*) FILTER (WHERE regexp_matches(l_linestatus, '^(?:(O|F))$')) AS n_similar, "
            "count(*) FILTER (WHERE l_quantity BETWEEN 20 AND 30) AS n_sym, "
            "CAST(sum(l_linenumber ^ 2) AS BIGINT) AS sum_sq "
            "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
        ),
        survey_ref="Q11 dialect breadth: PG regex operators, SIMILAR TO, "
        "BETWEEN SYMMETRIC, ^ exponentiation (sql/dialect.py "
        "translate_regex_ops/translate_similar_to/"
        "translate_between_symmetric/translate_caret_power)",
    )
)


_SPECS.append(
    QuerySpec(
        name="q32_dialect_extract_fields",
        spark_fn=_guarded(
            "lineitem",
            "SELECT CAST(EXTRACT(DOW FROM l_shipdate) AS BIGINT) AS dow, "
            "CAST(EXTRACT(ISODOW FROM l_shipdate) AS BIGINT) AS isodow, "
            "CAST(EXTRACT(QUARTER FROM l_shipdate) AS BIGINT) AS qtr, "
            "count(*) AS n, "
            "CAST(EXTRACT(EPOCH FROM min(l_shipdate)) AS BIGINT) AS min_epoch "
            "FROM data GROUP BY 1, 2, 3 ORDER BY 1, 2, 3",
        ),
        oracle=(
            "SELECT CAST(extract(dow FROM l_shipdate) AS BIGINT) AS dow, "
            "CAST(extract(isodow FROM l_shipdate) AS BIGINT) AS isodow, "
            "CAST(extract(quarter FROM l_shipdate) AS BIGINT) AS qtr, "
            "count(*) AS n, "
            "CAST(extract(epoch FROM min(l_shipdate)) AS BIGINT) AS min_epoch "
            "FROM lineitem GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"
        ),
        survey_ref="Q11 dialect breadth: EXTRACT DOW (PG Sunday=0 vs Spark "
        "Sunday=1), ISODOW, EPOCH (sql/dialect.py translate_extract; "
        "UTC-session epoch)",
    )
)


_SPECS.append(
    QuerySpec(
        name="q33_dialect_string_breadth",
        spark_fn=_guarded(
            "lineitem",
            "SELECT l_returnflag, l_linestatus, count(*) AS n, "
            "POSITION('N' IN l_returnflag) AS pos_n, "
            "SUBSTRING(l_linestatus FROM 1 FOR 1) AS sub_ff, "
            "TRIM(BOTH 'N' FROM l_returnflag) AS trim_both, "
            "OVERLAY(l_linestatus PLACING 'xx' FROM 1 FOR 1) AS ovl, "
            "LEFT(l_returnflag, 1) AS lft, "
            "split_part(l_returnflag, ' ', 1) AS sp, "
            "initcap(lower(l_returnflag)) AS ic, "
            "btrim(l_returnflag, 'N') AS bt, "
            "count(*) FILTER (WHERE starts_with(l_linestatus, 'O')) AS n_sw, "
            "count(*) FILTER (WHERE l_linestatus ILIKE 'o%') AS n_ilike, "
            "count(*) FILTER (WHERE l_returnflag IS DISTINCT FROM 'N') AS n_dist, "
            "CAST(width_bucket(l_quantity, 0, 50, 5) AS BIGINT) AS wb "
            "FROM data GROUP BY l_returnflag, l_linestatus, wb "
            "ORDER BY l_returnflag, l_linestatus, wb",
        ),
        oracle=(
            # DuckDB lacks overlay/initcap/width_bucket — mirrored with
            # concat-substr, upper (single-char flags), and PG's
            # width_bucket arithmetic (x >= max lands in bucket count+1)
            "SELECT l_returnflag, l_linestatus, count(*) AS n, "
            "position('N' IN l_returnflag) AS pos_n, "
            "substring(l_linestatus FROM 1 FOR 1) AS sub_ff, "
            "trim(BOTH 'N' FROM l_returnflag) AS trim_both, "
            "'xx' || substr(l_linestatus, 2) AS ovl, "
            "left(l_returnflag, 1) AS lft, "
            "split_part(l_returnflag, ' ', 1) AS sp, "
            "upper(l_returnflag) AS ic, "
            "trim(l_returnflag, 'N') AS bt, "
            "count(*) FILTER (WHERE starts_with(l_linestatus, 'O')) AS n_sw, "
            "count(*) FILTER (WHERE l_linestatus ILIKE 'o%') AS n_ilike, "
            "count(*) FILTER (WHERE l_returnflag IS DISTINCT FROM 'N') AS n_dist, "
            "CAST(CASE WHEN l_quantity >= 50 THEN 6 WHEN l_quantity < 0 THEN 0 "
            "ELSE floor(l_quantity / 10) + 1 END AS BIGINT) AS wb "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus, wb "
            "ORDER BY l_returnflag, l_linestatus, wb"
        ),
        survey_ref="Q11 dialect breadth: PG string-function surface "
        "(POSITION IN, SUBSTRING FROM FOR, TRIM BOTH, OVERLAY PLACING, "
        "LEFT, split_part, initcap, btrim, starts_with→startswith, ILIKE, "
        "IS DISTINCT FROM, width_bucket) — native in Spark or mapped by "
        "sql/dialect.py translate_pg_functions",
    )
)


_SPECS.append(
    QuerySpec(
        name="q34_dialect_distinct_on",
        spark_fn=_guarded(
            "lineitem",
            "SELECT DISTINCT ON (l_returnflag) l_returnflag, l_orderkey, "
            "l_linenumber, l_quantity, "
            "to_char(l_shipdate, 'YYYY-MM-DD') AS ship_day "
            "FROM data "
            "ORDER BY l_returnflag, l_quantity DESC, l_orderkey, l_linenumber",
            # fanout: the DISTINCT ON rewrite's map-side Sort +
            # WindowGroupLimit(partial) run on the scan's partitioning —
            # one task on the single-row-group testdata file (r12
            # profile: the 600k-row sort IS the query). 32 map tasks
            # each keep ≤1 row per group, so the final window sees ≤96
            # rows; ties are impossible (orderkey, linenumber) is the
            # table key, so the kept row is partitioning-independent.
            fanout=True,
        ),
        oracle=(
            # DuckDB implements PG's DISTINCT ON natively — the oracle
            # exercises the construct itself, not a workaround; to_char's
            # template maps to strftime
            "SELECT DISTINCT ON (l_returnflag) l_returnflag, l_orderkey, "
            "l_linenumber, l_quantity, "
            "strftime(l_shipdate, '%Y-%m-%d') AS ship_day "
            "FROM lineitem "
            "ORDER BY l_returnflag, l_quantity DESC, l_orderkey, l_linenumber"
        ),
        survey_ref="Q11 dialect breadth: PG DISTINCT ON → ranked-subquery "
        "rewrite + to_char date templates → date_format (sql/dialect.py "
        "translate_distinct_on/translate_to_char; round 6)",
    )
)


_SPECS.append(
    QuerySpec(
        name="q35_ordered_set_aggs",
        spark_fn=_guarded(
            "lineitem",
            # quantities cast to BIGINT and quarter fractions keep
            # percentile interpolation exactly representable in binary,
            # so the double compares bit-for-bit cross-engine; the mode
            # argument plants a ~50%-frequency dominant value (0) so the
            # engines' differing tie policies can never be exercised
            "SELECT l_returnflag, "
            "percentile_cont(0.25) WITHIN GROUP "
            "(ORDER BY CAST(l_quantity AS BIGINT)) AS p25, "
            "percentile_cont(0.5) WITHIN GROUP "
            "(ORDER BY CAST(l_quantity AS BIGINT)) AS p50, "
            "CAST(percentile_disc(0.75) WITHIN GROUP "
            "(ORDER BY CAST(l_quantity AS BIGINT)) AS BIGINT) AS p75d, "
            "CAST(mode() WITHIN GROUP (ORDER BY CASE WHEN l_quantity <= 25 "
            "THEN 0 ELSE l_partkey % 100 END) AS BIGINT) AS md "
            "FROM data GROUP BY l_returnflag ORDER BY l_returnflag",
            fanout=True,
        ),
        oracle=(
            "SELECT l_returnflag, "
            "percentile_cont(0.25) WITHIN GROUP "
            "(ORDER BY CAST(l_quantity AS BIGINT)) AS p25, "
            "percentile_cont(0.5) WITHIN GROUP "
            "(ORDER BY CAST(l_quantity AS BIGINT)) AS p50, "
            "CAST(percentile_disc(0.75) WITHIN GROUP "
            "(ORDER BY CAST(l_quantity AS BIGINT)) AS BIGINT) AS p75d, "
            "CAST(mode() WITHIN GROUP (ORDER BY CASE WHEN l_quantity <= 25 "
            "THEN 0 ELSE l_partkey % 100 END) AS BIGINT) AS md "
            "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
        ),
        survey_ref="Q11 dialect breadth: PG ordered-set aggregates "
        "(percentile_cont/percentile_disc/mode WITHIN GROUP) pass through "
        "the guard to Spark 4's native inverse-distribution syntax; "
        "translate_order_nulls covers the WITHIN GROUP clause too",
    )
)


_SPECS.append(
    QuerySpec(
        name="q36_agg_order_by",
        spark_fn=_guarded(
            "lineitem",
            # (l_orderkey*10 + l_linenumber) is unique (linenumber 1..7),
            # so every aggregate's internal order is total — no
            # tie-policy dependence cross-engine
            "SELECT l_returnflag, "
            "string_agg(l_linestatus, ',' "
            "ORDER BY l_orderkey * 10 + l_linenumber) AS sa, "
            "string_agg(l_linestatus, ';' "
            "ORDER BY l_orderkey * 10 + l_linenumber DESC) AS sad, "
            "array_to_string(array_agg(CAST(l_orderkey * 10 + l_linenumber "
            "AS BIGINT) ORDER BY l_orderkey * 10 + l_linenumber DESC), ',') AS aad "
            "FROM data WHERE l_orderkey < 300 "
            "GROUP BY l_returnflag ORDER BY l_returnflag",
        ),
        oracle=(
            # DuckDB implements PG's aggregate-internal ORDER BY natively
            # — the oracle exercises the construct itself
            "SELECT l_returnflag, "
            "string_agg(l_linestatus, ',' "
            "ORDER BY l_orderkey * 10 + l_linenumber) AS sa, "
            "string_agg(l_linestatus, ';' "
            "ORDER BY l_orderkey * 10 + l_linenumber DESC) AS sad, "
            "array_to_string(array_agg(CAST(l_orderkey * 10 + l_linenumber "
            "AS BIGINT) ORDER BY l_orderkey * 10 + l_linenumber DESC), ',') AS aad "
            "FROM lineitem WHERE l_orderkey < 300 "
            "GROUP BY l_returnflag ORDER BY l_returnflag"
        ),
        survey_ref="Q11 dialect breadth: PG aggregate-internal ORDER BY — "
        "string_agg → Spark-native WITHIN GROUP, array_agg → "
        "array_sort-over-structs rewrite with PG null placement, plus the "
        "array_to_string → array_join rename (sql/dialect.py "
        "translate_agg_order_by/translate_pg_functions)",
    )
)


def _t24(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed-linear quality scoring inside the hard
    gate (llmops/classifier.py): unigram+bigram features of the
    lowercased text hash through the repo's canonical 60-bit md5
    bucket into a 1024-bucket table of INTEGER milli-weights, and the
    document score is the exact integer sum — order- and
    partition-independent, so the oracle replays the ENTIRE pipeline
    (tokenize, bigram join, bucket hash, pseudo-weight derivation,
    integer sum) in DuckDB and the hashes must agree bit-for-bit.
    The Spark side is one map-only projection: zero shuffles, zero
    Python, zero explodes (plan-pinned in tests/test_classifier.py)."""
    from gfw_data_api_spark.llmops.classifier import hashed_linear_score

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return hashed_linear_score(docs, dim=1024, seed=0).select(
        "doc_id",
        "n_features",
        "score_milli",
        (F.col("score_milli") > 0).alias("quality"),
    )


_SPECS.append(
    QuerySpec(
        name="t24_quality_classifier",
        spark_fn=_t24,
        oracle=(
            "WITH toks AS (SELECT doc_id, "
            "regexp_split_to_array(trim(lower(text)), '\\s+') AS t FROM documents), "
            "uni AS (SELECT doc_id, unnest(t) AS f FROM toks), "
            "bi AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS f FROM "
            "(SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i "
            "FROM toks WHERE len(t) >= 2)), "
            "feats AS (SELECT doc_id, f FROM uni UNION ALL SELECT doc_id, f FROM bi), "
            "sc AS (SELECT doc_id, "
            "('0x' || substr(md5(f || chr(31) || '0'), 1, 15))::BIGINT % 1024 AS b "
            "FROM feats), "
            "w AS (SELECT doc_id, "
            "(('0x' || substr(md5('w:' || b || chr(31) || '0'), 1, 15))::BIGINT "
            "% 2001) - 1000 AS wm FROM sc) "
            "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_features, "
            "CAST(sum(wm) AS BIGINT) AS score_milli, sum(wm) > 0 AS quality "
            "FROM w GROUP BY doc_id"
        ),
        survey_ref="LLM pipeline: hashed-n-gram linear quality classifier "
        "scoring (llmops/classifier.py — fastText architecture, Joulin et "
        "al. 2016; canonical md5 bucketing, exact integer milli-weight "
        "sums, map-only plan)",
    )
)


_SPECS.append(
    QuerySpec(
        name="q37_parameterized_casts",
        spark_fn=_guarded(
            "lineitem",
            # PG semantics under test: numeric(p,s) rounds HALF-UP
            # (Spark's DECIMAL cast matches; DuckDB's own cast
            # TRUNCATES, so the oracle compensates with round());
            # varchar(n) TRUNCATES on explicit cast; char(n) truncates
            # AND pads. Decimal sums leave as x10 BIGINTs so the
            # engines' different sum-precision inference (DECIMAL(20,1)
            # vs DECIMAL(38,1)) never reaches the schema compare.
            # one arm per family uses the ANSI CAST(x AS pg_type) form
            # (translate_cast_type_names) and one the :: form, so both
            # spellings of every PG type semantics are driver-checked
            "SELECT CAST(l_returnflag AS char(3)) AS rf3, "
            "(l_returnflag || l_linestatus || 'xyz')::varchar(4) AS rl4, "
            "count(*) AS n, "
            "CAST(sum(CAST(l_extendedprice AS numeric(12,1))) * 10 "
            "AS BIGINT) AS sp1_x10, "
            "CAST(sum((l_tax * 10)::numeric(10,0)) AS BIGINT) AS st0, "
            "CAST(min(l_extendedprice::float(40)) AS DOUBLE) AS minp "
            "FROM data GROUP BY 1, 2 ORDER BY rf3, rl4",
        ),
        oracle=(
            "SELECT rpad(left(l_returnflag, 3), 3, ' ') AS rf3, "
            "left(l_returnflag || l_linestatus || 'xyz', 4) AS rl4, "
            "count(*) AS n, "
            "CAST(sum(CAST(round(l_extendedprice, 1) AS DECIMAL(12,1))) * 10 "
            "AS BIGINT) AS sp1_x10, "
            "CAST(sum(CAST(round(l_tax * 10, 0) AS DECIMAL(10,0))) AS BIGINT) AS st0, "
            "CAST(min(CAST(l_extendedprice AS DOUBLE)) AS DOUBLE) AS minp "
            "FROM lineitem GROUP BY 1, 2 ORDER BY rf3, rl4"
        ),
        survey_ref="Q11 dialect breadth: parameterized ::casts — "
        "numeric(p,s) HALF-UP rounding, varchar(n) truncation, char(n) "
        "truncate+pad, float(n) width selection (sql/dialect.py "
        "translate_pg_casts; DuckDB oracle compensates its own "
        "truncating decimal cast with round())",
    )
)


_SPECS.append(
    QuerySpec(
        name="q38_array_any_all",
        spark_fn=_guarded(
            "lineitem",
            # PG semantics under test: ARRAY[...] constructors, and
            # op ANY / op ALL over arrays with three-valued logic
            # (Spark's exists/forall higher-order twins share it,
            # probed with NULL elements)
            "SELECT l_returnflag, "
            "count(*) FILTER (WHERE l_linestatus = ANY(ARRAY['O', 'X'])) AS n_any, "
            "count(*) FILTER (WHERE l_quantity > ALL(ARRAY[10, 20])) AS n_all, "
            "count(*) FILTER (WHERE l_linestatus <> ALL(ARRAY['F'])) AS n_notall, "
            "array_to_string(ARRAY[min(l_linenumber)::text, "
            "max(l_linenumber)::text], '-') AS mm "
            "FROM data GROUP BY l_returnflag ORDER BY l_returnflag",
        ),
        oracle=(
            # DuckDB's op ANY/ALL over lists is native with the same
            # three-valued semantics — the oracle exercises the
            # construct itself
            "SELECT l_returnflag, "
            "count(*) FILTER (WHERE l_linestatus = ANY(['O', 'X'])) AS n_any, "
            "count(*) FILTER (WHERE l_quantity > ALL([10, 20])) AS n_all, "
            "count(*) FILTER (WHERE l_linestatus <> ALL(['F'])) AS n_notall, "
            "array_to_string([CAST(min(l_linenumber) AS TEXT), "
            "CAST(max(l_linenumber) AS TEXT)], '-') AS mm "
            "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
        ),
        survey_ref="Q11 dialect breadth: PG ARRAY[...] constructors and "
        "op ANY / op ALL array comparisons → array()/exists()/forall() "
        "with matching three-valued logic (sql/dialect.py "
        "translate_array_literal/translate_any_all)",
    )
)


def _s11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive retrieval training inside
    the hard gate (llmops/similarity.py hard_negative_mining — the DPR
    mining recipe): 8 corpus vectors are the queries, each query's
    planted positive is doc (q*7+3) % 200, candidates come from ONE
    batched IVF probe with nprobe = nlist (probing every cell makes
    the ANN structure EXACT, so the driver-trained centroids cannot
    leak approximation into the compare), and mining anti-joins the
    positives then ranks the top 5. Cosines round to 6dp on both
    engines before ranking; the top-30 adjacent-cosine gap measures
    ≥4.6e-6 at every test SF, so rounding cannot create ties and the
    (cosine desc, vec_id) order is total."""
    import math  # noqa: F401  (parity with the s08 pattern)

    from gfw_data_api_spark.llmops import ivf
    from gfw_data_api_spark.llmops.dedup import _persist_replacing
    from gfw_data_api_spark.llmops.similarity import hard_negative_mining

    emb = _persist_replacing(load_table(spark, sf_dir, "embeddings"), "s11_emb")
    centroids = ivf.train_ivf(emb, nlist=8, iters=3)
    indexed = _persist_replacing(ivf.build_ivf_index(emb, centroids), "s11_index")
    qrows = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 8).collect()
    }
    queries = [(qid, qrows[qid]) for qid in sorted(qrows)]
    cands = ivf.ivf_topk_batch(
        indexed, centroids, queries, k=25, nprobe=8, exclude_query_id=True
    ).select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"))
    positives = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        ((F.col("vec_id") * 7 + 3) % 200).alias("vec_id"),
    )
    mined = hard_negative_mining(cands, positives, k=5)
    return mined.select(
        "query_id", "vec_id", "cosine", F.col("rank").cast("bigint").alias("rank")
    )


_SPECS.append(
    QuerySpec(
        name="s11_hard_negatives",
        spark_fn=_s11,
        oracle=(
            "WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe "
            "FROM embeddings WHERE vec_id < 8), "
            "sc AS (SELECT q.query_id, e.vec_id, "
            "round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe) / "
            "(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), "
            "CAST(e.embedding AS DOUBLE[]))) * sqrt(list_dot_product(q.qe, q.qe))), 6) "
            "AS cosine FROM embeddings e, q WHERE e.vec_id <> q.query_id), "
            "nopos AS (SELECT * FROM sc "
            "WHERE vec_id <> (query_id * 7 + 3) % 200), "
            "rk AS (SELECT query_id, vec_id, cosine, row_number() OVER "
            "(PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank FROM nopos) "
            "SELECT query_id, vec_id, cosine, rank FROM rk WHERE rank <= 5"
        ),
        survey_ref="similarity search: hard-negative mining for contrastive "
        "retrieval training (llmops/similarity.py hard_negative_mining — "
        "bounded candidates from one batched IVF probe, anti-join "
        "positives, per-query ranked window; DPR recipe)",
    )
)


_SPECS.append(
    QuerySpec(
        name="q39_regexp_replace_pg",
        spark_fn=_guarded(
            "documents",
            # PG semantics under test: regexp_replace WITHOUT the g
            # flag replaces only the FIRST match (Spark's native call
            # always replaces every match — silent divergence before
            # round 6's translate_regexp_replace); \1 backrefs in the
            # replacement; i / gi flag folding
            "SELECT doc_id, "
            "md5(regexp_replace(text, '[aeiou]', '*')) AS first_only, "
            "md5(regexp_replace(text, '[aeiou]', '*', 'g')) AS all_g, "
            "md5(regexp_replace(text, 'the', '#', 'i')) AS first_ci, "
            "md5(regexp_replace(text, '([a-z])([a-z])', '\\2\\1', 'g')) AS swap_g, "
            "md5(regexp_replace(text, '([A-Z])', '<\\1>')) AS bref_first "
            "FROM documents",
        ),
        oracle=(
            # DuckDB's regexp_replace IS PG's surface here: first-only
            # by default, g/i flags, \n replacement backrefs
            "SELECT doc_id, "
            "md5(regexp_replace(text, '[aeiou]', '*')) AS first_only, "
            "md5(regexp_replace(text, '[aeiou]', '*', 'g')) AS all_g, "
            "md5(regexp_replace(text, 'the', '#', 'i')) AS first_ci, "
            "md5(regexp_replace(text, '([a-z])([a-z])', '\\2\\1', 'g')) AS swap_g, "
            "md5(regexp_replace(text, '([A-Z])', '<\\1>')) AS bref_first "
            "FROM documents"
        ),
        survey_ref="Q11 dialect breadth: PG regexp_replace semantics — "
        "first-match-only default via the anchored-lazy rewrite, g/i "
        "flags, PG-to-Java replacement backref conversion "
        "(sql/dialect.py translate_regexp_replace)",
    )
)


_SPECS.append(
    QuerySpec(
        name="q40_template_parse",
        spark_fn=_guarded(
            "lineitem",
            # PG semantics under test: to_date/to_timestamp take PG
            # templates (YYYY/DD/HH24...) — Java reads Y as week-year
            # and D as day-of-year, so untranslated templates would
            # parse to silently different dates. Round-trips through
            # to_char keep every output DATE/STRING so no
            # timestamp-zone types reach the schema compare.
            "SELECT l_orderkey, l_linenumber, "
            "to_date(to_char(l_shipdate, 'YYYY-MM-DD'), 'YYYY-MM-DD') AS d1, "
            "to_date(to_char(l_shipdate, 'DD.MM.YYYY'), 'DD.MM.YYYY') AS d2, "
            "to_char(to_timestamp('2021-07-04 09:30:15', "
            "'YYYY-MM-DD HH24:MI:SS'), 'HH24-MI-SS') AS hms "
            "FROM data WHERE l_orderkey < 50 "
            "ORDER BY l_orderkey, l_linenumber",
        ),
        oracle=(
            # DuckDB's PG-template to_date doesn't exist; strftime /
            # strptime express the identical round-trips
            "SELECT l_orderkey, l_linenumber, "
            "CAST(strptime(strftime(l_shipdate, '%Y-%m-%d'), '%Y-%m-%d') "
            "AS DATE) AS d1, "
            "CAST(strptime(strftime(l_shipdate, '%d.%m.%Y'), '%d.%m.%Y') "
            "AS DATE) AS d2, "
            "strftime(strptime('2021-07-04 09:30:15', '%Y-%m-%d %H:%M:%S'), "
            "'%H-%M-%S') AS hms "
            "FROM lineitem WHERE l_orderkey < 50 "
            "ORDER BY l_orderkey, l_linenumber"
        ),
        survey_ref="Q11 dialect breadth: PG to_date/to_timestamp template "
        "parsing — PG template codes convert to Java patterns before "
        "Spark parses (sql/dialect.py translate_to_char extended; Y/D "
        "would be week-year/day-of-year untranslated)",
    )
)


def _q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = (
        # PG semantics under test: ->> / #>> return TEXT (unquoted
        # scalars); -> keeps JSON quoting ("x" for strings) via the
        # variant route; integer right operands index arrays; chains
        # associate left. Object-valued -> arms stay out of the gate:
        # whitespace in object serialization is engine-specific.
        "SELECT event_id, "
        "props ->> 'k' AS k_text, "
        "props -> 'k' AS k_json, "
        "props #>> '{k}' AS k_path, "
        "'{\"s\": \"x\", \"o\": {\"b\": [7, 8]}}' -> 's' AS s_json, "
        "'{\"s\": \"x\", \"o\": {\"b\": [7, 8]}}' #>> '{o,b,1}' AS ob_text, "
        "'[10,20,30]' ->> 1 AS arr_text "
        "FROM data WHERE event_type = 'click' ORDER BY event_id"
    )
    return execute_on_dataframe(spark, load_table(spark, sf_dir, "events"), sql)


_SPECS.append(
    QuerySpec(
        name="q41_json_operators",
        spark_fn=_q41,
        oracle=(
            # DuckDB's -> returns the JSON type (cast to VARCHAR for
            # the schema compare); ->> and json_extract_string are the
            # text mode; #>> has no DuckDB spelling, so the path form
            # mirrors through json_extract_string
            "SELECT event_id, "
            "props ->> 'k' AS k_text, "
            "CAST(props -> 'k' AS VARCHAR) AS k_json, "
            "json_extract_string(props, '$.k') AS k_path, "
            "CAST(json_extract('{\"s\": \"x\", \"o\": {\"b\": [7, 8]}}', "
            "'$.s') AS VARCHAR) AS s_json, "
            "json_extract_string('{\"s\": \"x\", \"o\": {\"b\": [7, 8]}}', "
            "'$.o.b[1]') AS ob_text, "
            "json_extract_string('[10,20,30]', '$[1]') AS arr_text "
            "FROM events WHERE event_type = 'click' ORDER BY event_id"
        ),
        survey_ref="Q11 dialect breadth: PG json(b) operators -> ->> #> #>> "
        "— text mode via get_json_object, json mode via "
        "parse_json/try_variant_get/to_json preserving JSON quoting "
        "(sql/dialect.py translate_json_ops; runs first, before any pass "
        "emits lambda arrows)",
    )
)


def _q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = (
        # PG semantics under test: ? lists null-valued keys as present
        # (json_object_keys matches); ?| is any-key, ?& is every-key
        "SELECT event_id, "
        "props ? 'k' AS has_k, "
        "props ? 'zz' AS has_zz, "
        "'{\"a\": 1, \"b\": null}' ? 'b' AS null_key, "
        "props ?| ARRAY['zz', 'k'] AS any_k, "
        "props ?& ARRAY['k', 'zz'] AS all_k "
        "FROM data WHERE event_type = 'view' ORDER BY event_id"
    )
    return execute_on_dataframe(spark, load_table(spark, sf_dir, "events"), sql)


_SPECS.append(
    QuerySpec(
        name="q42_json_key_exists",
        spark_fn=_q42,
        oracle=(
            # DuckDB has no ? operators; json_keys list algebra
            # expresses the identical checks
            "SELECT event_id, "
            "list_contains(json_keys(props), 'k') AS has_k, "
            "list_contains(json_keys(props), 'zz') AS has_zz, "
            "list_contains(json_keys('{\"a\": 1, \"b\": null}'), 'b') "
            "AS null_key, "
            "len(list_intersect(json_keys(props), ['zz', 'k'])) > 0 AS any_k, "
            "len(list_intersect(json_keys(props), ['k', 'zz'])) = 2 AS all_k "
            "FROM events WHERE event_type = 'view' ORDER BY event_id"
        ),
        survey_ref="Q11 dialect breadth: PG jsonb key-existence operators "
        "? ?| ?& over json_object_keys (null-valued keys count as "
        "present, like PG; objects-only scope documented) — "
        "sql/dialect.py translate_json_exists",
    )
)


def _q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = (
        # PG semantics under test: @> containment with a literal
        # needle (numbers compare NUMERICALLY — 5.0 contains 5 — and a
        # JSON string "5" never matches the number 5), the flipped
        # '<@' orientation, and missing keys giving FALSE, not NULL
        "SELECT event_id, "
        "props @> '{\"k\": 69}' AS c69, "
        "'{\"k\": 1}' <@ props AS rev1, "
        "props @> '{\"k\": 69, \"zz\": 1}' AS c_missing "
        "FROM data WHERE event_type = 'click' ORDER BY event_id"
    )
    return execute_on_dataframe(spark, load_table(spark, sf_dir, "events"), sql)


_SPECS.append(
    QuerySpec(
        name="q43_json_containment",
        spark_fn=_q43,
        oracle=(
            # DuckDB has no @>; numeric-compare probes express the
            # same per-key containment checks
            "SELECT event_id, "
            "coalesce(try_cast(json_extract_string(props, '$.k') AS DOUBLE) "
            "= 69, false) AS c69, "
            "coalesce(try_cast(json_extract_string(props, '$.k') AS DOUBLE) "
            "= 1, false) AS rev1, "
            "coalesce(try_cast(json_extract_string(props, '$.k') AS DOUBLE) "
            "= 69, false) AND "
            "coalesce(try_cast(json_extract_string(props, '$.zz') AS DOUBLE) "
            "= 1, false) AS c_missing "
            "FROM events WHERE event_type = 'click' ORDER BY event_id"
        ),
        survey_ref="Q11 dialect breadth: PG jsonb containment @> / <@ with "
        "literal needles — per-key jsonb-equality conjunction (numeric "
        "kind-checked equality, missing keys FALSE) — sql/dialect.py "
        "translate_json_contains",
    )
)


_SPECS.append(
    QuerySpec(
        name="q44_substring_regex",
        spark_fn=_guarded(
            "documents",
            # PG semantics under test: substring-from-regex returns the
            # first CAPTURE GROUP when the pattern has one, the whole
            # match otherwise, and NULL (never '') when nothing matches
            "SELECT doc_id, "
            "substring(text FROM '[0-9]+') AS first_num, "
            "substring(text FROM '([A-Z][a-z]+) ') AS first_cap_word, "
            "substring(text, 'q[a-z]*') AS q_word "
            "FROM data",
        ),
        oracle=(
            # DuckDB regexp_extract returns '' on no match where PG is
            # NULL — the regexp_matches guard restores PG's contract
            "SELECT doc_id, "
            "CASE WHEN regexp_matches(text, '[0-9]+') "
            "THEN regexp_extract(text, '[0-9]+') END AS first_num, "
            "CASE WHEN regexp_matches(text, '([A-Z][a-z]+) ') "
            "THEN regexp_extract(text, '([A-Z][a-z]+) ', 1) END "
            "AS first_cap_word, "
            "CASE WHEN regexp_matches(text, 'q[a-z]*') "
            "THEN regexp_extract(text, 'q[a-z]*') END AS q_word "
            "FROM documents"
        ),
        survey_ref="Q11 dialect breadth: PG substring-from-regex — "
        "first-capture-group rule, NULL on no match via the RLIKE guard "
        "(sql/dialect.py translate_substring_regex; positional FROM/FOR "
        "stays native)",
    )
)


def _q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = (
        # PG semantics under test (round-7 widening, VERDICT r6 #3):
        # @> with ARRAY needles — the tags @> '["foo"]' idiom. Every
        # needle element must match some haystack element with jsonb
        # equality (numbers numerically; "5" never matches 5; true
        # never matches 1); [] is contained in any ARRAY; a non-array
        # haystack (props is an object) gives FALSE, not NULL
        "SELECT event_id, "
        "('[\"' || event_type || '\", ' || CAST(event_id % 7 AS VARCHAR) "
        "|| ']') @> '[\"click\"]' AS has_click, "
        "('[\"' || event_type || '\", ' || CAST(event_id % 7 AS VARCHAR) "
        "|| ']') @> '[3]' AS has_three, "
        "('[\"' || event_type || '\", ' || CAST(event_id % 7 AS VARCHAR) "
        "|| ']') @> '[\"click\", 3.0]' AS has_both, "
        "('[' || CAST(event_id % 7 AS VARCHAR) || ']') @> '[]' "
        "AS empty_needle, "
        "props @> '[\"click\"]' AS object_haystack "
        "FROM data WHERE event_type IN ('click', 'view') ORDER BY event_id"
    )
    # fanout: five variant-parse containment probes per row are
    # compute-bound, and the single-row-group events parquet would run
    # them as ONE task (guide §2.5/§6)
    return execute_on_dataframe(
        spark, load_table(spark, sf_dir, "events", fanout=True), sql
    )


_Q45_ELEMS = (
    "list_transform(range(CAST(json_array_length({hay}) AS BIGINT)), "
    "__i -> CAST(json_extract({hay}, '$[' || __i || ']') AS VARCHAR))"
)


def _q45_oracle() -> str:
    hay = (
        "('[\"' || event_type || '\", ' || CAST(event_id % 7 AS VARCHAR) "
        "|| ']')"
    )
    elems = _Q45_ELEMS.format(hay=hay)
    # DuckDB's json_array_length is 0 (not NULL) for objects, so the
    # is-array guard spells json_type = 'ARRAY'
    is_arr = f"json_type({hay}) = 'ARRAY'"
    click = f"list_contains({elems}, '\"click\"')"
    three = (
        f"len(list_filter({elems}, __e -> try_cast(__e AS DOUBLE) = 3 AND "
        "substring(__e, 1, 1) IN "
        "('-','0','1','2','3','4','5','6','7','8','9'))) > 0"
    )
    props_elems = _Q45_ELEMS.format(hay="props")
    return (
        "SELECT event_id, "
        f"({is_arr} AND {click}) AS has_click, "
        f"({is_arr} AND {three}) AS has_three, "
        f"({is_arr} AND {click} AND {three}) AS has_both, "
        "json_type('[' || CAST(event_id % 7 AS VARCHAR) || ']') = 'ARRAY' "
        "AS empty_needle, "
        f"(json_type(props) = 'ARRAY' AND "
        f"list_contains({props_elems}, '\"click\"')) AS object_haystack "
        "FROM events WHERE event_type IN ('click', 'view') ORDER BY event_id"
    )


def _t26(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib LR quality-classifier envelope (VERDICT r6 #6): the
    learned twin of the t24 hashed scorer finally gets a driver gate.
    Model weights are driver-trained state no SQL engine can replay,
    so the gate pins the ENVELOPE on planted perfectly-separable data:
    even doc_ids keep their real text (good), odd doc_ids get a
    constant junk string (bad) — LR (llmops/classifier.py, LBFGS,
    deterministic) must separate the classes completely, so the
    booleans and counts are exact and the DuckDB oracle recomputes
    them from the planting rule alone."""
    from gfw_data_api_spark.llmops.classifier import (
        score_quality,
        train_quality_classifier,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 400)
    )
    planted = (
        docs.withColumn("label", (F.col("doc_id") % 2 == 0).cast("double"))
        .withColumn(
            "text",
            F.when(F.col("label") == 1.0, F.col("text")).otherwise(
                F.lit("$$$ !!! @@ $$ !! @@ $$ !! $$$ !!! zzz zzz zzz")
            ),
        )
        # LBFGS runs one job per iteration over this tiny seed — pin it
        # small and cached so the gate times the model, not scheduling
        .coalesce(2)
        .cache()
    )
    model = train_quality_classifier(planted, max_iter=8)
    scored = score_quality(model, planted).select("doc_id", "label", "quality_prob")
    agg = scored.agg(
        F.count("*").alias("n_docs"),
        F.sum("label").cast("bigint").alias("n_good"),
        F.min(F.when(F.col("label") == 1.0, F.col("quality_prob"))).alias("_min_good"),
        F.max(F.when(F.col("label") == 0.0, F.col("quality_prob"))).alias("_max_bad"),
    )
    return agg.select(
        "n_docs",
        "n_good",
        # perfect separation on separable data == AUC 1.0 (the verdict's
        # AUC floor, stated rank-wise: every good outscores every bad)
        (F.col("_min_good") > F.col("_max_bad")).alias("separated"),
        (F.col("_min_good") > F.lit(0.5)).alias("good_above_half"),
        (F.col("_max_bad") < F.lit(0.5)).alias("bad_below_half"),
    )


_SPECS.append(
    QuerySpec(
        name="t26_lr_quality_envelope",
        spark_fn=_t26,
        oracle=(
            "SELECT CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_good, "
            "TRUE AS separated, TRUE AS good_above_half, "
            "TRUE AS bad_below_half "
            "FROM documents WHERE doc_id < 400"
        ),
        survey_ref="LLM pipeline: MLlib logistic-regression quality filter "
        "(llmops/classifier.py train_quality_classifier/score_quality — "
        "the CCNet/fastText-style learned filter beside the t24 hashed "
        "scorer); envelope oracle on planted separable classes",
    )
)


_SPECS.append(
    QuerySpec(
        name="q46_backslash_literals",
        spark_fn=_guarded(
            "documents",
            # PG semantics under test (round-7 LITERAL CONTRACT): PG
            # string literals are VERBATIM — '\s' keeps its backslash
            # into the regex engine, '\n' is backslash-n (2 chars),
            # and regexp character classes \d/\w work from plain
            # literals. Spark's default parser would eat every one of
            # these silently; the guarded path parses with
            # escapedStringLiterals=true.
            "SELECT doc_id, "
            "(text ~ '\\d') AS has_digit, "
            "regexp_replace(text, '\\s+', '_', 'g') AS squashed, "
            "substring(text FROM '\\w+') AS first_word, "
            "length('a\\nb') AS backslash_n_len, "
            "split_part('x\\y', '\\', 2) AS after_backslash "
            "FROM data",
        ),
        oracle=(
            # DuckDB literals are standard-conforming like PG
            "SELECT doc_id, "
            "regexp_matches(text, '\\d') AS has_digit, "
            "regexp_replace(text, '\\s+', '_', 'g') AS squashed, "
            "CASE WHEN regexp_matches(text, '\\w+') "
            "THEN regexp_extract(text, '\\w+') END AS first_word, "
            "length('a\\nb') AS backslash_n_len, "
            "split_part('x\\y', '\\', 2) AS after_backslash "
            "FROM documents"
        ),
        survey_ref="Q11 dialect breadth: PG-verbatim string literals "
        "(standard_conforming_strings) — guarded SQL parses under "
        "spark.sql.parser.escapedStringLiterals=true so backslashes in "
        "regex patterns and plain literals survive "
        "(sql/dialect.py LITERAL CONTRACT, operators/query.py)",
    )
)


def _q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = (
        # PG semantics under test (round-7 third dialect wave):
        # date_part is EXTRACT's function spelling with PG field
        # numbering (Spark's own date_part says Sunday=1 and rejects
        # epoch-of-date); negative json indexes count from the end;
        # ::jsonb || ::jsonb merges objects right-wins in jsonb key
        # order (length, then bytes) — probed via extraction and full
        # text on flat objects
        "SELECT event_id, "
        "CAST(date_part('dow', ts) AS BIGINT) AS dow, "
        "CAST(date_part('isodow', ts) AS BIGINT) AS isodow, "
        "date_part('epoch', CAST(ts AS DATE)) AS day_epoch, "
        "('[' || CAST(event_id % 5 AS VARCHAR) || ', '"
        " || CAST(event_id % 7 AS VARCHAR) || ', 9]') ->> -1 AS last_el, "
        "('[' || CAST(event_id % 5 AS VARCHAR) || ', '"
        " || CAST(event_id % 7 AS VARCHAR) || ', 9]') ->> -2 AS mid_el, "
        "props ->> -1 AS neg_on_object, "
        "(('{\"k\": ' || CAST(event_id % 3 AS VARCHAR) || '}')::jsonb "
        "|| '{\"zz\": 1}'::jsonb) AS merged "
        "FROM data WHERE event_type = 'click' ORDER BY event_id"
    )
    # fanout: per-row jsonb merge/extract + date_part over the
    # single-row-group events scan is compute-bound (the q45 finding)
    return execute_on_dataframe(
        spark, load_table(spark, sf_dir, "events", fanout=True), sql
    )


_SPECS.append(
    QuerySpec(
        name="q47_datepart_negidx_jsonb_merge",
        spark_fn=_q47,
        oracle=(
            # DuckDB: date_part shares PG's numbering; negative JSON
            # indexes are native; the merge is recomputed as literal
            # text from the planting rule (flat objects, known keys —
            # 'k' sorts before 'zz' on length)
            "SELECT event_id, "
            "CAST(date_part('dow', ts) AS BIGINT) AS dow, "
            "CAST(date_part('isodow', ts) AS BIGINT) AS isodow, "
            "date_part('epoch', CAST(ts AS DATE)) AS day_epoch, "
            "json_extract_string('[' || CAST(event_id % 5 AS VARCHAR) "
            "|| ', ' || CAST(event_id % 7 AS VARCHAR) || ', 9]', '$[-1]') "
            "AS last_el, "
            "json_extract_string('[' || CAST(event_id % 5 AS VARCHAR) "
            "|| ', ' || CAST(event_id % 7 AS VARCHAR) || ', 9]', '$[-2]') "
            "AS mid_el, "
            "json_extract_string(props, '$[-1]') AS neg_on_object, "
            "'{\"k\":' || CAST(event_id % 3 AS VARCHAR) || ',\"zz\":1}' "
            "AS merged "
            "FROM events WHERE event_type = 'click' ORDER BY event_id"
        ),
        survey_ref="Q11 dialect breadth (round-7 third wave): date_part → "
        "EXTRACT field map, negative json array indexes via dynamic "
        "JSONPath, ::jsonb || object merge with PG storage key order "
        "(sql/dialect.py translate_date_part / translate_json_ops / "
        "translate_jsonb_concat)",
    )
)


_SPECS.append(
    QuerySpec(
        name="q48_dialect_fourth_wave",
        spark_fn=_guarded(
            "lineitem",
            # PG semantics under test (round-7 fourth wave): EXTRACT
            # DECADE/CENTURY (count from year 1 — 2000 is the 20th
            # century), to_hex LOWERCASE output (Spark hex() is
            # upper), trunc-toward-zero on numerics (Spark's trunc is
            # date-only), and [NOT] LIKE/ILIKE quantified over arrays
            "SELECT l_orderkey, l_linenumber, "
            "EXTRACT(DECADE FROM l_shipdate) AS dec, "
            "EXTRACT(CENTURY FROM l_shipdate) AS cen, "
            "to_hex(l_orderkey * 1000 + l_linenumber) AS hx, "
            "CAST(trunc(l_extendedprice, 1) * 10 AS BIGINT) AS tp_x10, "
            "CAST(trunc(l_extendedprice * -1, 1) * 10 AS BIGINT) AS tpn_x10, "
            "(l_returnflag LIKE ANY(ARRAY['A%', 'N%'])) AS fast, "
            "(l_returnflag NOT LIKE ALL(ARRAY['R%', 'X%'])) "
            "AS not_ground "
            "FROM data WHERE l_orderkey < 200 "
            "ORDER BY l_orderkey, l_linenumber",
        ),
        oracle=(
            # DuckDB: DECADE/CENTURY native PG semantics; to_hex is
            # UPPERCASE there (lower() compensates); no 2-arg trunc —
            # the floor/ceil arithmetic IS the independent recomputation
            "SELECT l_orderkey, l_linenumber, "
            "CAST(EXTRACT(DECADE FROM l_shipdate) AS BIGINT) AS dec, "
            "CAST(EXTRACT(CENTURY FROM l_shipdate) AS BIGINT) AS cen, "
            "lower(to_hex(l_orderkey * 1000 + l_linenumber)) AS hx, "
            "CAST(floor(l_extendedprice * 10) AS BIGINT) AS tp_x10, "
            "CAST(ceiling(l_extendedprice * -10) AS BIGINT) AS tpn_x10, "
            "len(list_filter(['A%', 'N%'], "
            "__p -> l_returnflag LIKE __p)) > 0 AS fast, "
            "len(list_filter(['R%', 'X%'], "
            "__p -> l_returnflag NOT LIKE __p)) = 2 AS not_ground "
            "FROM lineitem WHERE l_orderkey < 200 "
            "ORDER BY l_orderkey, l_linenumber"
        ),
        survey_ref="Q11 dialect breadth (round-7 fourth wave): EXTRACT "
        "CENTURY/DECADE/MILLENNIUM year arithmetic, to_hex lowercase, "
        "numeric trunc-toward-zero via exact decimal floor/ceil, "
        "LIKE/ILIKE ANY/ALL over arrays → exists/forall "
        "(sql/dialect.py translate_extract / translate_pg_functions / "
        "translate_any_all)",
    )
)


_SPECS.append(
    QuerySpec(
        name="q49_dialect_fifth_wave",
        spark_fn=_guarded(
            "documents",
            # PG semantics under test (round-7 fifth wave): 2-arg
            # ltrim/rtrim take (str, characters) — Spark's natives are
            # REVERSED (trimStr, str), so untranslated calls silently
            # trim the wrong operand; format() is printf-%s; div()
            # truncates toward zero (Spark's div agrees — pinned)
            "SELECT doc_id, "
            "ltrim(lang || text, lang) AS l2, "
            "rtrim(text || 'xx', 'x') AS r2, "
            "btrim('x' || text || 'x', 'x') AS b2, "
            "format('%s:%s', lang, doc_id % 7) AS fmt, "
            "div(doc_id, 7) AS d, div(0 - doc_id, 7) AS dn "
            "FROM data",
        ),
        oracle=(
            # DuckDB shares PG's (str, chars) trim order; no div() —
            # (a - a%b)//b is the exact toward-zero recomputation
            "SELECT doc_id, "
            "ltrim(lang || text, lang) AS l2, "
            "rtrim(text || 'xx', 'x') AS r2, "
            "trim('x' || text || 'x', 'x') AS b2, "
            "format('{}:{}', lang, doc_id % 7) AS fmt, "
            "CAST((doc_id - (doc_id % 7)) // 7 AS BIGINT) AS d, "
            "CAST((-doc_id - (-doc_id % 7)) // 7 AS BIGINT) AS dn "
            "FROM documents"
        ),
        survey_ref="Q11 dialect breadth (round-7 fifth wave): 2-arg "
        "ltrim/rtrim PG argument order via TRIM syntax, format() → "
        "format_string for the %s subset, div() toward-zero pinned "
        "(sql/dialect.py translate_pg_functions)",
    )
)


def _q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = (
        # Pass-INTERACTION stress (round 7): one statement threading a
        # dozen translated constructs through every clause — WHERE
        # mixes regex ops, quantifiers, BETWEEN SYMMETRIC and jsonb
        # containment; SELECT mixes casts, date_part, to_char, trunc,
        # FILTER and ordered aggregates; ORDER BY exercises the PG
        # null-ordering defaults. The 22+ sequential token passes are
        # individually gated; this pins their COMPOSITION.
        "SELECT "
        "EXTRACT(DECADE FROM o_orderdate) AS dec, "
        "count(*) FILTER (WHERE o_orderpriority SIMILAR TO '_-HIGH%') "
        "AS n_high, "
        "count(*) FILTER (WHERE o_orderpriority ~* ANY(ARRAY['high', 'low'])) "
        "AS n_flagged, "
        "CAST(sum(trunc(o_totalprice, 0)) AS BIGINT) AS sum_trunc, "
        "CAST(avg(o_totalprice)::numeric(18,2) * 100 AS BIGINT) AS avg_x100, "
        "(min(o_orderstatus) || '-' || max(o_orderstatus)) AS statuses, "
        "to_char(min(o_orderdate), 'YYYY-DDD') AS first_day, "
        "max(ltrim(o_orderpriority, '12345-')) AS pri_tail "
        "FROM data "
        "WHERE o_orderkey BETWEEN SYMMETRIC 4000 AND 1 "
        "AND o_custkey % 10 <> ALL(ARRAY[3, 7]) "
        "AND ('{\"p\": ' || CAST(o_orderkey % 2 AS VARCHAR) || '}') "
        "@> '{\"p\": 0}' "
        "GROUP BY 1 ORDER BY dec"
    )
    return execute_on_dataframe(spark, load_table(spark, sf_dir, "orders"), sql)


_SPECS.append(
    QuerySpec(
        name="q50_composed_dialect",
        spark_fn=_q50,
        oracle=(
            # DuckDB twin: SIMILAR TO is plain-regex there (anchored
            # manually), ~* via regexp_matches 'i', trunc via floor
            # (o_totalprice > 0), ltrim shares PG order natively
            "SELECT "
            "CAST(EXTRACT(DECADE FROM o_orderdate) AS BIGINT) AS dec, "
            "count(*) FILTER (WHERE regexp_full_match(o_orderpriority, "
            "'.-HIGH.*')) AS n_high, "
            "count(*) FILTER (WHERE len(list_filter(['high', 'low'], "
            "__p -> regexp_matches(o_orderpriority, __p, 'i'))) > 0) AS n_flagged, "
            "CAST(sum(floor(o_totalprice)) AS BIGINT) AS sum_trunc, "
            "CAST(round(avg(o_totalprice), 2) * 100 AS BIGINT) AS avg_x100, "
            "(min(o_orderstatus) || '-' || max(o_orderstatus)) AS statuses, "
            "strftime(min(o_orderdate), '%Y-%j') AS first_day, "
            "max(ltrim(o_orderpriority, '12345-')) AS pri_tail "
            "FROM orders "
            "WHERE o_orderkey BETWEEN least(4000, 1) AND greatest(4000, 1) "
            "AND len(list_filter([3, 7], __e -> o_custkey % 10 = __e)) = 0 "
            "AND o_orderkey % 2 = 0 "
            "GROUP BY 1 ORDER BY dec"
        ),
        survey_ref="Q11 dialect composition: one statement threading "
        "SIMILAR TO, regex quantifiers, BETWEEN SYMMETRIC, jsonb "
        "containment on built strings, parameterized casts, trunc, "
        "date_part/EXTRACT, FILTER, DISTINCT string_agg with internal "
        "ORDER BY, to_char templates and 2-arg ltrim through every "
        "clause — pins the 22-pass translation pipeline's COMPOSITION, "
        "not just its parts",
    )
)


def _q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-8 schema-aware typed semantics inside the hard gate
    (VERDICT r7 #1 — sql/dialect.py translate_typed_ops): the guarded
    path derives column types from the bound DataFrame schema, closing
    the last everyday SILENT divergences — int/int division truncates
    toward zero (PG int4/int4; Spark promoted to DOUBLE), sum(int4)/
    count(*) truncates (PG int8/int8) via a scalar subquery,
    date - date returns integer days, bool::int gives 0/1, float8→int
    rounds HALF-EVEN in both cast spellings, and a float-division
    negative control stays exact float math. The oracle spells out
    each PG rule independently in DuckDB: exact toward-zero integer
    arithmetic ((a - a%b) // b), native date-date (DuckDB shares PG's
    integer days), round_even."""
    o = load_table(spark, sf_dir, "orders")
    df = o.select(
        "o_orderkey",
        (F.col("o_orderkey") % 97 - 48).cast("int").alias("lk"),
        (F.col("o_custkey") % 11 - 5).cast("smallint").alias("sm"),
        F.col("o_orderdate").cast("date").alias("od"),
        F.date_sub(
            F.col("o_orderdate").cast("date"),
            (F.col("o_orderkey") % 300).cast("int"),
        ).alias("sd"),
        (F.col("o_orderpriority") == F.lit("1-URGENT")).alias("is_urgent"),
        F.col("o_totalprice").alias("price"),
    )
    sql = (
        "SELECT o_orderkey, "
        "CAST(lk / 7 AS BIGINT) AS div7, "
        "CAST(lk / (-5) AS BIGINT) AS divneg, "
        "CAST(sm / 3 AS BIGINT) AS divsm, "
        "CAST(od - sd AS BIGINT) AS span_days, "
        "CAST((od - sd) / 7 AS BIGINT) AS span_weeks, "
        "is_urgent::int AS urgent_i, "
        "price::bigint AS price_rint, "
        "CAST(price AS INT) AS price_rint2, "
        "price / 4 AS quarter, "
        "CAST((SELECT sum(lk) / count(*) FROM data) AS BIGINT) "
        "AS corpus_mean, "
        # round-8 follow-ons: CASE arms, FILTER clauses, and OVER
        # windows all type through to PG's truncating division
        "CAST(CASE WHEN is_urgent THEN lk ELSE sm END / 5 AS BIGINT) "
        "AS case_div, "
        # (Spark cannot execute FILTER+OVER combined; the CASE-sum
        # spelling is PG-identical for a filtered count)
        "CAST(sum(CASE WHEN is_urgent THEN 1 ELSE 0 END) OVER w "
        "/ count(*) OVER w AS BIGINT) AS urgent_frac, "
        "CAST(sum(lk) OVER w / count(*) OVER w AS BIGINT) AS run_mean "
        "FROM data WINDOW w AS (PARTITION BY sm ORDER BY o_orderkey) "
        "ORDER BY o_orderkey"
    )
    return execute_on_dataframe(spark, df, sql)


_SPECS.append(
    QuerySpec(
        name="q51_typed_semantics",
        spark_fn=_q51,
        oracle=(
            "WITH d AS (SELECT o_orderkey, "
            "CAST(o_orderkey % 97 - 48 AS INTEGER) AS lk, "
            "CAST(o_custkey % 11 - 5 AS SMALLINT) AS sm, "
            "CAST(o_orderdate AS DATE) AS od, "
            "CAST(o_orderdate AS DATE) - CAST(o_orderkey % 300 AS INTEGER) "
            "AS sd, "
            "o_orderpriority = '1-URGENT' AS is_urgent, "
            "o_totalprice AS price FROM orders), "
            "w AS (SELECT *, "
            "sum(CASE WHEN is_urgent THEN 1 ELSE 0 END) OVER win AS uf_n, "
            "count(*) OVER win AS n_w, sum(lk) OVER win AS s_w "
            "FROM d WINDOW win AS (PARTITION BY sm ORDER BY o_orderkey)) "
            "SELECT o_orderkey, "
            "CAST((lk - (lk % 7)) // 7 AS BIGINT) AS div7, "
            "CAST((lk - (lk % (-5))) // (-5) AS BIGINT) AS divneg, "
            "CAST((sm - (sm % 3)) // 3 AS BIGINT) AS divsm, "
            "CAST(od - sd AS BIGINT) AS span_days, "
            "CAST(((od - sd) - ((od - sd) % 7)) // 7 AS BIGINT) "
            "AS span_weeks, "
            "CAST(is_urgent AS INTEGER) AS urgent_i, "
            "CAST(round_even(price, 0) AS BIGINT) AS price_rint, "
            "CAST(round_even(price, 0) AS INTEGER) AS price_rint2, "
            "price / 4 AS quarter, "
            "(SELECT CAST((sum(lk) - (sum(lk) % count(*))) // count(*) "
            "AS BIGINT) FROM w) AS corpus_mean, "
            "CAST(((CASE WHEN is_urgent THEN lk ELSE sm END) - "
            "((CASE WHEN is_urgent THEN lk ELSE sm END) % 5)) // 5 "
            "AS BIGINT) AS case_div, "
            "CAST((uf_n - (uf_n % n_w)) // n_w AS BIGINT) AS urgent_frac, "
            "CAST((s_w - (s_w % n_w)) // n_w AS BIGINT) AS run_mean "
            "FROM w ORDER BY o_orderkey"
        ),
        survey_ref="Q11 typed dialect semantics: schema-aware int/int "
        "truncating division, date - date integer days, bool::int, "
        "float8→int half-even (sql/dialect.py translate_typed_ops; the "
        "reference gets PG typing for free by pass-through — "
        "query_helpers.py validates, PG evaluates)",
    )
)


def _q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-8 set-returning functions inside the hard gate (VERDICT r7
    #4 — sql/dialect.py translate_set_returning): the reference's
    pass-through surface includes SRFs (only pg_* names are blocked,
    query_helpers.py), so unnest / generate_series /
    jsonb_array_elements(_text) must expand rows like PG. Four guarded
    statements, one per SRF, union post-hoc (plumbing only — each
    statement runs the full guard+dialect path):

    - unnest over string_to_array (order preserved);
    - generate_series(1, event_id % 4) — PG drops rows where the
      series is EMPTY (bound < start), the semantics Spark's
      descending sequence() would silently break;
    - jsonb_array_elements over a planted [num, "str", null] array
      (jsonb mode keeps quoting; numbers via to_json);
    - jsonb_array_elements_text — strings unquoted, json null → SQL
      NULL (probed: Spark variant→STRING cast is PG's text mode).

    The oracle recomputes every arm in DuckDB: native unnest/
    generate_series (DuckDB shares PG's empty-series rule) and the
    planted array elements replayed from the construction rule."""
    ev = load_table(spark, sf_dir, "events")

    r1 = execute_on_dataframe(
        spark,
        ev,
        "SELECT 'unnest' AS arm, event_id, "
        "unnest(string_to_array(event_type || '-x' "
        "|| CAST(event_id % 3 AS VARCHAR), '-')) AS val "
        "FROM data WHERE event_id % 20 = 0",
    )
    r2 = execute_on_dataframe(
        spark,
        ev,
        "SELECT 'series' AS arm, event_id, "
        "generate_series(1, event_id % 4) AS val "
        "FROM data WHERE event_id % 25 = 0",
    ).withColumn("val", F.col("val").cast("string"))
    planted = (
        "'[' || CAST(event_id % 5 AS VARCHAR) || ', \"' "
        "|| event_type || '\", null]'"
    )
    r3 = execute_on_dataframe(
        spark,
        ev,
        f"SELECT 'jsonb' AS arm, event_id, "
        f"jsonb_array_elements({planted}) AS val "
        "FROM data WHERE event_id % 30 = 0",
    )
    r4 = execute_on_dataframe(
        spark,
        ev,
        f"SELECT 'text' AS arm, event_id, "
        f"jsonb_array_elements_text({planted}) AS val "
        "FROM data WHERE event_id % 30 = 0",
    )
    # round-8 widenings: PG ≥10 LOCKSTEP for multiple unnests (rows =
    # longest, shorter null-padded — arrays_zip + inline), and DYNAMIC
    # generate_series steps (sign checked at runtime)
    r5 = execute_on_dataframe(
        spark,
        ev,
        "SELECT 'lockstep' AS arm, event_id, "
        "unnest(string_to_array(event_type || '-x' "
        "|| CAST(event_id % 3 AS VARCHAR), '-')) AS a1, "
        "unnest(string_to_array(CAST(event_id % 5 AS VARCHAR), '-')) AS a2 "
        "FROM data WHERE event_id % 40 = 0",
    ).select(
        "arm",
        "event_id",
        F.concat_ws(
            "/", F.coalesce("a1", F.lit("~")), F.coalesce("a2", F.lit("~"))
        ).alias("val"),
    )
    r6 = execute_on_dataframe(
        spark,
        ev,
        "SELECT 'dynstep' AS arm, event_id, "
        "generate_series(1, 6, CAST(event_id % 3 AS INT) + 1) AS val "
        "FROM data WHERE event_id % 45 = 0",
    ).withColumn("val", F.col("val").cast("string"))
    return r1.union(r2).union(r3).union(r4).union(r5).union(r6)


_SPECS.append(
    QuerySpec(
        name="q52_set_returning",
        spark_fn=_q52,
        oracle=(
            "SELECT 'unnest' AS arm, event_id, "
            "unnest(string_split(event_type || '-x' "
            "|| CAST(event_id % 3 AS VARCHAR), '-')) AS val "
            "FROM events WHERE event_id % 20 = 0 "
            "UNION ALL "
            "SELECT 'series' AS arm, event_id, CAST(g AS VARCHAR) AS val "
            "FROM (SELECT event_id, "
            "unnest(generate_series(1, event_id % 4)) AS g "
            "FROM events WHERE event_id % 25 = 0) "
            "UNION ALL "
            "SELECT 'jsonb' AS arm, event_id, v AS val FROM (SELECT "
            "event_id, CAST(event_id % 5 AS VARCHAR) AS e0, "
            "'\"' || event_type || '\"' AS e1, 'null' AS e2 "
            "FROM events WHERE event_id % 30 = 0), "
            "unnest([e0, e1, e2]) AS u(v) "
            "UNION ALL "
            "SELECT 'text' AS arm, event_id, v AS val FROM (SELECT "
            "event_id, CAST(event_id % 5 AS VARCHAR) AS e0, "
            "event_type AS e1, CAST(NULL AS VARCHAR) AS e2 "
            "FROM events WHERE event_id % 30 = 0), "
            "unnest([e0, e1, e2]) AS u(v) "
            "UNION ALL "
            # lockstep replay from the planting rule: row 0 pairs the
            # event type with the single-element second array; row 1
            # pairs 'xN' with the null pad
            "SELECT 'lockstep' AS arm, event_id, "
            "event_type || '/' || CAST(event_id % 5 AS VARCHAR) AS val "
            "FROM events WHERE event_id % 40 = 0 "
            "UNION ALL "
            "SELECT 'lockstep' AS arm, event_id, "
            "'x' || CAST(event_id % 3 AS VARCHAR) || '/~' AS val "
            "FROM events WHERE event_id % 40 = 0 "
            "UNION ALL "
            "SELECT 'dynstep' AS arm, event_id, CAST(g AS VARCHAR) AS val "
            "FROM (SELECT event_id, "
            "unnest(generate_series(1, 6, event_id % 3 + 1)) AS g "
            "FROM events WHERE event_id % 45 = 0)"
        ),
        survey_ref="Q11 set-returning functions: unnest → explode, "
        "generate_series → guarded sequence (empty on wrong-sign "
        "bounds like PG), jsonb_array_elements(_text) → explode over "
        "array<variant> (sql/dialect.py translate_set_returning; the "
        "reference passes SRFs through to PG, query_helpers.py blocks "
        "only pg_* names)",
    )
)


def _q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-9 SRF breadth (VERDICT r8 #9): WITH ORDINALITY and the
    multi-array lockstep ``unnest(a, b)`` spelling. Both are PG's
    FROM-clause forms admitted as SELECT-list extensions (PG rejects
    the select-list spelling outright, so accepting them cannot
    silently change a PG-valid query — docs/PARITY.md round-9):

    - unnest(arr) WITH ORDINALITY → 1-based BIGINT `ordinality` after
      the value column (inline over an indexed transform);
    - generate_series(a, b) WITH ORDINALITY — ordinality differs from
      the value (series starts at 3);
    - jsonb_array_elements_text(j) WITH ORDINALITY over a planted
      [num, "str", null] array;
    - unnest(a, b) (single call, two arrays) → lockstep null-padding
      to the longest array via arrays_zip.

    DuckDB replays each arm with a range() subscript join — list
    indexing past the end yields NULL, which IS the lockstep pad."""
    ev = load_table(spark, sf_dir, "events")

    r1 = execute_on_dataframe(
        spark,
        ev,
        "SELECT 'ord' AS arm, event_id, "
        "unnest(string_to_array(event_type || '-x' "
        "|| CAST(event_id % 3 AS VARCHAR), '-')) WITH ORDINALITY "
        "FROM data WHERE event_id % 20 = 0",
    ).selectExpr(
        "arm", "event_id", "CAST(unnest AS STRING) AS val", "ordinality AS ord"
    )
    r2 = execute_on_dataframe(
        spark,
        ev,
        "SELECT 'gsord' AS arm, event_id, "
        "generate_series(3, 3 + event_id % 3) WITH ORDINALITY "
        "FROM data WHERE event_id % 25 = 0",
    ).selectExpr(
        "arm", "event_id", "CAST(generate_series AS STRING) AS val",
        "ordinality AS ord",
    )
    planted = (
        "'[' || CAST(event_id % 5 AS VARCHAR) || ', \"' "
        "|| event_type || '\", null]'"
    )
    r3 = execute_on_dataframe(
        spark,
        ev,
        f"SELECT 'jord' AS arm, event_id, "
        f"jsonb_array_elements_text({planted}) WITH ORDINALITY "
        "FROM data WHERE event_id % 30 = 0",
    ).selectExpr("arm", "event_id", "value AS val", "ordinality AS ord")
    r4 = execute_on_dataframe(
        spark,
        ev,
        "SELECT 'multi' AS arm, event_id, "
        "unnest(string_to_array(event_type || '-x' "
        "|| CAST(event_id % 3 AS VARCHAR), '-'), "
        "string_to_array(CAST(event_id % 5 AS VARCHAR), '-')) "
        "FROM data WHERE event_id % 40 = 0",
    ).selectExpr(
        "arm", "event_id",
        "concat_ws('/', coalesce(unnest, '~'), coalesce(unnest_1, '~')) AS val",
        "CAST(0 AS BIGINT) AS ord",
    )
    return r1.union(r2).union(r3).union(r4)


_SPECS.append(
    QuerySpec(
        name="q55_srf_ordinality",
        spark_fn=_q55,
        oracle=(
            "SELECT 'ord' AS arm, event_id, a[CAST(i AS INT)] AS val, "
            "i AS ord FROM (SELECT event_id, string_split(event_type "
            "|| '-x' || CAST(event_id % 3 AS VARCHAR), '-') AS a "
            "FROM events WHERE event_id % 20 = 0), "
            "range(1, 3) t(i) WHERE i <= len(a) "
            "UNION ALL "
            "SELECT 'gsord' AS arm, event_id, "
            "CAST(2 + i AS VARCHAR) AS val, i AS ord "
            "FROM events, range(1, 4) t(i) "
            "WHERE event_id % 25 = 0 AND i <= 1 + event_id % 3 "
            "UNION ALL "
            "SELECT 'jord' AS arm, event_id, v AS val, ord FROM (SELECT "
            "event_id, CAST(event_id % 5 AS VARCHAR) AS e0, "
            "event_type AS e1, CAST(NULL AS VARCHAR) AS e2 "
            "FROM events WHERE event_id % 30 = 0), "
            "(VALUES (1), (2), (3)) p(ord), "
            "LATERAL (SELECT CASE ord WHEN 1 THEN e0 WHEN 2 THEN e1 "
            "ELSE e2 END AS v) "
            "UNION ALL "
            "SELECT 'multi' AS arm, event_id, "
            "coalesce(a[CAST(i AS INT)], '~') || '/' || "
            "coalesce(b[CAST(i AS INT)], '~') AS val, CAST(0 AS BIGINT) AS ord "
            "FROM (SELECT event_id, string_split(event_type || '-x' "
            "|| CAST(event_id % 3 AS VARCHAR), '-') AS a, "
            "string_split(CAST(event_id % 5 AS VARCHAR), '-') AS b "
            "FROM events WHERE event_id % 40 = 0), "
            "range(1, 3) t(i) WHERE i <= greatest(len(a), len(b))"
        ),
        survey_ref="Q11 SRF breadth round-9: WITH ORDINALITY (1-based "
        "bigint, value column first) + multi-array lockstep unnest(a, b) "
        "(sql/dialect.py translate_set_returning; PG restricts both "
        "spellings to the FROM clause — admitted here as documented "
        "SELECT-list extensions, PARITY.md round-9)",
    )
)


_Q56_SQL = (
    # Round-9 array-function surface (silent-divergence fixes):
    # array_position absent -> NULL (Spark/DuckDB both say 0 —
    # nullif'd on both sides), array_length of an EMPTY array ->
    # NULL (PG rule; size/len give 0), array_cat with a NULL side
    # keeps the other side (PG; concat is NULL-poisoning), strpos
    # is locate with reversed args. Arrays planted from event_type.
    "SELECT event_id, "
    "array_position(string_to_array(event_type || '-x', '-'), 'x') "
    "AS pos_hit, "
    "array_position(string_to_array(event_type || '-x', '-'), 'zz') "
    "AS pos_miss, "
    "array_length(string_to_array(event_type, '-'), 1) AS len_one, "
    "array_length(string_to_array('', '-'), 1) AS len_empty, "
    "array_to_string(array_cat("
    "CASE WHEN event_id % 5 = 0 THEN NULL "
    "ELSE string_to_array(event_type, '-') END, "
    "string_to_array('x-y', '-')), '/') AS cat_null_arm, "
    "strpos(event_type, 'ck') AS sp_hit, "
    "strpos(event_type, 'zz') AS sp_miss, "
    # concat() skips NULL args in PG (and DuckDB) — Spark's NULL-
    # poisoning concat is rewritten to concat_ws('')
    "concat(CASE WHEN event_id % 2 = 0 THEN NULL ELSE 'L-' END, "
    "event_type) AS cc, "
    # gcd/lcm (bounded Euclid fold) + quote_literal (doubled quotes)
    "gcd(event_id % 48, 18) AS g, lcm(event_id % 7 + 1, 6) AS l, "
    "quote_literal(event_type || '_q') AS ql, "
    # round-10: PG LIKE-operator spellings
    "event_type ~~ 'c%' AS lk, event_type ~~* 'C%' AS ilk, "
    "event_type !~~ '%out' AS nlk, "
    # round-10: array-literal casts (the ANY('{...}'::text[]) idiom)
    "array_to_string('{L, M, \"x y\"}'::text[], '.') AS arrlit, "
    "array_position('{10,20,30}'::int[], CAST(event_id % 40 AS INT)) "
    "AS arrpos, "
    "CASE WHEN event_type = ANY('{click, view}'::text[]) "
    "THEN 1 ELSE 0 END AS arrany, "
    # round-11 (verdict r10 #8/#9 + probe-found subscripts):
    # NULL-delimiter per-char split, multidim literal + 1-based
    # subscripting (PG: 0/negative/out-of-range → NULL), and
    # interval→text postgres-style rendering
    "array_to_string(string_to_array(event_type, NULL), '.') AS chars, "
    "('{{10,20},{30,40}}'::int[][])[2][1] AS md, "
    "string_to_array(event_type || '-z', '-')"
    "[CAST(event_id % 4 AS INT)] AS sub, "
    # hours stay < 24: PG/DuckDB render '30 hours' un-normalized
    # ('30:00:00') where DayTimeIntervalType normalizes — the
    # documented PARITY residual; the sub-day subset matches exactly
    "make_interval(hours => CAST(event_id % 24 AS INT), "
    "mins => CAST(event_id % 50 AS INT))::text AS ivtx, "
    "make_interval(days => 2, hours => 3)::text AS ivdt, "
    "'14 months ago'::interval::text AS ymtx "
    "FROM events WHERE event_id % 15 = 0"
)

_SPECS.append(
    QuerySpec(
        name="q56_array_functions",
        spark_fn=_guarded("events", _Q56_SQL),
        oracle=(
            "SELECT event_id, "
            "CAST(nullif(list_position(string_split(event_type || '-x', "
            "'-'), 'x'), 0) AS BIGINT) AS pos_hit, "
            "CAST(nullif(list_position(string_split(event_type || '-x', "
            "'-'), 'zz'), 0) AS BIGINT) AS pos_miss, "
            "CAST(nullif(len(string_split(event_type, '-')), 0) "
            "AS BIGINT) AS len_one, "
            "CAST(NULL AS BIGINT) AS len_empty, "
            "array_to_string(list_concat("
            "CASE WHEN event_id % 5 = 0 THEN NULL "
            "ELSE string_split(event_type, '-') END, "
            "string_split('x-y', '-')), '/') AS cat_null_arm, "
            "CAST(strpos(event_type, 'ck') AS BIGINT) AS sp_hit, "
            "CAST(strpos(event_type, 'zz') AS BIGINT) AS sp_miss, "
            "concat(CASE WHEN event_id % 2 = 0 THEN NULL ELSE 'L-' END, "
            "event_type) AS cc, "
            "gcd(event_id % 48, 18) AS g, "
            "lcm(event_id % 7 + 1, 6) AS l, "
            "chr(39) || replace(event_type || '_q', chr(39), "
            "chr(39) || chr(39)) || chr(39) AS ql, "
            "event_type LIKE 'c%' AS lk, event_type ILIKE 'C%' AS ilk, "
            "event_type NOT LIKE '%out' AS nlk, "
            "array_to_string(['L', 'M', 'x y'], '.') AS arrlit, "
            "CAST(nullif(list_position([10, 20, 30], "
            "CAST(event_id % 40 AS INT)), 0) AS BIGINT) AS arrpos, "
            "CASE WHEN event_type IN ('click', 'view') "
            "THEN 1 ELSE 0 END AS arrany, "
            # DuckDB: string_split on '' is per-char; nested list
            # literals index 1-based with NULL OOB (zero guarded —
            # DuckDB [0] is NULL like PG, negatives are python-style
            # so the arm avoids them); native interval rendering
            # normalized for the two spelling gaps (months→mons,
            # -1 plural)
            "array_to_string(string_split(event_type, ''), '.') "
            "AS chars, "
            "[[10,20],[30,40]][2][1] AS md, "
            "CASE WHEN event_id % 4 < 1 THEN NULL ELSE "
            "string_split(event_type || '-z', '-')"
            "[CAST(event_id % 4 AS INT)] END AS sub, "
            "CAST(to_hours(CAST(event_id % 24 AS INT)) "
            "+ to_minutes(CAST(event_id % 50 AS INT)) AS VARCHAR) "
            "AS ivtx, "
            "CAST(to_days(2) + to_hours(3) AS VARCHAR) AS ivdt, "
            "regexp_replace(replace(CAST(to_months(-14) AS VARCHAR), "
            "' month', ' mon'), '-1 (year|mon|day)( |$)', "
            "'-1 \\1s\\2', 'g') AS ymtx "
            "FROM events WHERE event_id % 15 = 0"
        ),
        survey_ref="Q11 round-9 array/string surface: array_position "
        "NULL-on-absent, array_length NULL-on-empty, null-aware "
        "array_cat, strpos (sql/dialect.py translate_pg_functions "
        "round-9 loop)",
    )
)


_Q57_SQL = (
    # Round-9 breadth batch 2: regexp_split_to_array (regex split with
    # PG's kept trailing empties), jsonb_typeof over every kind, and
    # jsonb_array_length — planted json text derives from event fields
    "SELECT event_id, "
    "array_to_string(regexp_split_to_array("
    "event_type || '-' || CAST(event_id % 100 AS VARCHAR) || '-x', "
    "'[-0-9]+'), '/') AS sp, "
    "jsonb_typeof(CASE event_id % 5 "
    "WHEN 0 THEN '{\"k\": ' || CAST(event_id % 7 AS VARCHAR) || '}' "
    "WHEN 1 THEN '[1, 2]' WHEN 2 THEN '\"' || event_type || '\"' "
    "WHEN 3 THEN CAST(event_id % 9 AS VARCHAR) ELSE 'true' END) AS jt, "
    "jsonb_array_length('[' || CAST(event_id % 4 AS VARCHAR) || ', 7]') "
    "AS jl, "
    # PG date_trunc units Spark lacks; centuries start at xxx1 in PG
    "date_trunc('decade', ts) AS dec_t, "
    "date_trunc('century', ts) AS cen_t "
    "FROM events WHERE event_id % 15 = 0"
)

_SPECS.append(
    QuerySpec(
        name="q57_json_introspection",
        spark_fn=_guarded("events", _Q57_SQL),
        oracle=(
            "SELECT event_id, "
            "array_to_string(regexp_split_to_array("
            "event_type || '-' || CAST(event_id % 100 AS VARCHAR) "
            "|| '-x', '[-0-9]+'), '/') AS sp, "
            # DuckDB json_type names -> PG jsonb_typeof names
            "CASE json_type(CASE event_id % 5 "
            "WHEN 0 THEN '{\"k\": ' || CAST(event_id % 7 AS VARCHAR) || '}' "
            "WHEN 1 THEN '[1, 2]' WHEN 2 THEN '\"' || event_type || '\"' "
            "WHEN 3 THEN CAST(event_id % 9 AS VARCHAR) ELSE 'true' END) "
            "WHEN 'OBJECT' THEN 'object' WHEN 'ARRAY' THEN 'array' "
            "WHEN 'VARCHAR' THEN 'string' WHEN 'BOOLEAN' THEN 'boolean' "
            "WHEN 'NULL' THEN 'null' ELSE 'number' END AS jt, "
            "CAST(json_array_length('[' || CAST(event_id % 4 AS VARCHAR) "
            "|| ', 7]') AS INT) AS jl, "
            # DuckDB decade agrees with PG; DuckDB centuries start at
            # xx00 (PG: xx01) so the oracle replays PG's documented rule
            "CAST(date_trunc('decade', ts) AS TIMESTAMP) AS dec_t, "
            "make_timestamp(CAST(floor((year(ts) - 1) / 100) * 100 + 1 "
            "AS BIGINT), 1, 1, 0, 0, 0) AS cen_t "
            "FROM events WHERE event_id % 15 = 0"
        ),
        survey_ref="Q11 round-9 batch 2: regexp_split_to_array, "
        "jsonb_typeof, jsonb_array_length (sql/dialect.py "
        "translate_pg_functions; emissions that used Spark's native "
        "json_* spellings now use from_json probes)",
    )
)


_Q58_SQL = (
    # Round-10 defect batch (VERDICT r9 #1 + ADVICE): ::bytea with
    # PG's INPUT-parser semantics (text → UTF-8 octets, \x hex
    # literal → unhex; unknown cast types now reject loudly — the
    # negative arm is unit-tested), strict chr(NULL), quote_literal
    # backslash doubling + E'...' form, make_interval through the
    # typed Spark constructors (collectible AND comparable), and
    # array_length(a, dim != 1) = NULL exact parity.
    "SELECT event_id, "
    "encode(event_type::bytea, 'hex') AS name_hex, "
    "encode('\\x41 42'::bytea, 'hex') AS hexlit, "
    "quote_literal(event_type || '_q') AS ql, "
    "quote_literal(chr(92) || event_type) AS qlb, "
    "chr(CASE WHEN event_id % 4 = 0 THEN NULL "
    "ELSE 65 + CAST(event_id % 26 AS INT) END) AS chr_arm, "
    "array_length(string_to_array(event_type, '-'), 2) AS len_dim2, "
    "CASE WHEN make_interval(days => 2, hours => 3) = "
    "make_interval(hours => 51) THEN 1 ELSE 0 END AS mi_eq, "
    "CASE WHEN make_interval(years => 1) > "
    "make_interval(months => CAST(event_id % 14 AS INT)) "
    "THEN 1 ELSE 0 END AS mi_ym, "
    "CASE WHEN make_interval(mins => CAST(event_id % 90 AS INT)) > "
    "make_interval(hours => 1) THEN 1 ELSE 0 END AS mi_dt, "
    # '...'::interval literals parse at translation into the typed
    # constructors (round-10 follow-up; PG word form incl. 'mons')
    "CASE WHEN '36 hours'::interval > make_interval(days => 1) "
    "THEN 1 ELSE 0 END AS ivl, "
    "CASE WHEN '14 mons'::interval = "
    "make_interval(years => 1, months => 2) THEN 1 ELSE 0 END AS ivm "
    "FROM events WHERE event_id % 15 = 0"
)

_SPECS.append(
    QuerySpec(
        name="q58_round10_defects",
        spark_fn=_guarded("events", _Q58_SQL),
        oracle=(
            "SELECT event_id, "
            "lower(hex(encode(event_type))) AS name_hex, "
            # replayed constant: PG encode('\x41 42'::bytea,'hex')
            "'4142' AS hexlit, "
            "chr(39) || replace(event_type || '_q', chr(39), "
            "chr(39) || chr(39)) || chr(39) AS ql, "
            # input contains a backslash -> E'...' with backslashes
            # doubled (event_type has no quotes/backslashes itself)
            "'E' || chr(39) || chr(92) || chr(92) || event_type "
            "|| chr(39) AS qlb, "
            "CASE WHEN event_id % 4 = 0 THEN NULL "
            "ELSE chr(CAST(65 + event_id % 26 AS INT)) END AS chr_arm, "
            "CAST(NULL AS INT) AS len_dim2, "
            "CASE WHEN to_days(2) + to_hours(3) = to_hours(51) "
            "THEN 1 ELSE 0 END AS mi_eq, "
            "CASE WHEN to_years(1) > "
            "to_months(CAST(event_id % 14 AS INT)) "
            "THEN 1 ELSE 0 END AS mi_ym, "
            "CASE WHEN to_minutes(CAST(event_id % 90 AS INT)) > "
            "to_hours(1) THEN 1 ELSE 0 END AS mi_dt, "
            "CASE WHEN INTERVAL '36 hours' > to_days(1) "
            "THEN 1 ELSE 0 END AS ivl, "
            "CASE WHEN INTERVAL '14 months' = "
            "to_years(1) + to_months(2) THEN 1 ELSE 0 END AS ivm "
            "FROM events WHERE event_id % 15 = 0"
        ),
        survey_ref="Q11 round-10 defect batch: bytea casts, unknown-"
        "cast rejection, chr NULL strictness, quote_literal backslash "
        "rule, make_interval typed constructors, array_length dim!=1 "
        "(sql/dialect.py translate_pg_casts/_bytea_cast_sql + "
        "make_interval classify; compat.py YearMonthInterval shim)",
    )
)


_Q59_SQL = (
    # Round-10: the date-spine idiom — generate_series over timestamps
    # with a literal-interval step (classified at translation: sign +
    # family known, bounds CAST to TIMESTAMP, stop-inclusive like PG).
    "SELECT event_id, generate_series("
    "date_trunc('day', ts), "
    "date_trunc('day', ts) + make_interval(days => "
    "CAST(event_id % 2 + 1 AS INT)), "
    "'12 hours'::interval) AS spine, "
    # PG 14 date_bin: 45-minute buckets aligned at a non-midnight
    # origin (floors toward -infinity; exact integer micros)
    "date_bin('45 minutes', ts, timestamp '2001-01-01 00:07:30') "
    "AS bucket, "
    # AT TIME ZONE on a named fixed-offset IANA zone (round-11: the
    # r10 '+05:30' arm replayed its own arithmetic in the oracle;
    # DuckDB's ICU timezone() is an independent engine) + epoch of an
    # interval literal with DuckDB's NATIVE extract(epoch) as twin
    "ts AT TIME ZONE 'Asia/Kolkata' AS utc_of_local, "
    "extract(epoch from '90 minutes'::interval) AS ep_iv "
    "FROM events WHERE event_id % 40 = 0"
)

_SPECS.append(
    QuerySpec(
        name="q59_timestamp_series",
        spark_fn=_guarded("events", _Q59_SQL),
        oracle=(
            "SELECT event_id, unnest(generate_series("
            "date_trunc('day', ts), "
            "date_trunc('day', ts) + to_days(CAST(event_id % 2 + 1 "
            "AS INT)), "
            "INTERVAL '12 hours')) AS spine, "
            "time_bucket(INTERVAL '45 minutes', ts, "
            "timestamp '2001-01-01 00:07:30') AS bucket, "
            "timezone('UTC', timezone('Asia/Kolkata', ts)) "
            "AS utc_of_local, "
            "extract(epoch from to_minutes(90)) AS ep_iv "
            "FROM events WHERE event_id % 40 = 0"
        ),
        survey_ref="Q11 round-10: timestamp generate_series with "
        "literal-interval steps (sql/dialect.py "
        "translate_set_returning 3-arg interval branch)",
    )
)


_Q60_SQL = (
    # Round-10: PG row-constructor comparisons — the keyset-pagination
    # WHERE shape plus projected three-valued arms (a NULL pair before
    # a deciding pair yields NULL, PG's rule; Spark's native struct
    # ordering is nulls-first and diverges silently).
    "SELECT event_id, event_type, "
    "CASE WHEN (event_type, event_id % 7) < ('purchase', 3) "
    "THEN 1 ELSE 0 END AS lt, "
    "CASE WHEN (event_id % 5, event_id % 3) IN ((0, 0), (1, 2), (4, 1)) "
    "THEN 1 ELSE 0 END AS inr, "
    "CASE WHEN (nullif(event_id % 4, 2), event_id % 3) < (1, 9) "
    "THEN 1 WHEN NOT ((nullif(event_id % 4, 2), event_id % 3) < (1, 9)) "
    "THEN 0 ELSE -1 END AS ltnull "
    "FROM events "
    "WHERE (event_type, event_id % 10) >= ('click', 4) "
    "AND event_id % 15 = 0 ORDER BY event_id"
)

_SPECS.append(
    QuerySpec(
        name="q60_row_comparisons",
        spark_fn=_guarded("events", _Q60_SQL),
        oracle=(
            # the oracle spells PG's lexicographic expansion explicitly
            "SELECT event_id, event_type, "
            "CASE WHEN event_type < 'purchase' OR (event_type = "
            "'purchase' AND event_id % 7 < 3) THEN 1 ELSE 0 END AS lt, "
            "CASE WHEN (event_id % 5 = 0 AND event_id % 3 = 0) "
            "OR (event_id % 5 = 1 AND event_id % 3 = 2) "
            "OR (event_id % 5 = 4 AND event_id % 3 = 1) "
            "THEN 1 ELSE 0 END AS inr, "
            "CASE WHEN nullif(event_id % 4, 2) < 1 OR "
            "(nullif(event_id % 4, 2) = 1 AND event_id % 3 < 9) "
            "THEN 1 WHEN NOT (nullif(event_id % 4, 2) < 1 OR "
            "(nullif(event_id % 4, 2) = 1 AND event_id % 3 < 9)) "
            "THEN 0 ELSE -1 END AS ltnull "
            "FROM events "
            "WHERE (event_type > 'click' OR (event_type = 'click' "
            "AND event_id % 10 >= 4)) "
            "AND event_id % 15 = 0 ORDER BY event_id"
        ),
        survey_ref="Q11 round-10: row-constructor comparisons with "
        "PG three-valued lexicographic semantics "
        "(sql/dialect.py translate_row_comparisons)",
    )
)


_Q61_SQL = (
    # Round-11 (verdict #1/#2): epoch of year-month intervals under
    # PG's interval_part rule — whole years at 365.25 days, residual
    # months at 30, C-truncating split for negatives — and the zone-
    # spelling convention matrix for AT TIME ZONE. Every oracle arm
    # below is the NATIVE DuckDB engine (extract(epoch from interval),
    # ICU timezone()), never a replay of our own arithmetic.
    "SELECT event_id, "
    "extract(epoch from make_interval(months => "
    "CAST(event_id % 30 - 5 AS INT))) AS ep_dyn, "
    "extract(epoch from '2 years 3 mons'::interval) AS ep_y, "
    "extract(epoch from '14 months ago'::interval) AS ep_ago, "
    # POSIX spelling: PG reads 'UTC+5' WEST-positive (the translation
    # flips the sign for Java); twin = tzdb's Etc/GMT+5, which keeps
    # the POSIX convention in both engines
    "ts AT TIME ZONE 'UTC+5' AS tz_posix, "
    # abbreviation: PG's Default table is FIXED -8 for PST year-round;
    # both Java SHORT_IDS and DuckDB's own ICU 'PST' are DST-aware
    # Los Angeles, so the twin is the equivalent fixed zone Etc/GMT+8
    "ts AT TIME ZONE 'PST' AS tz_abbr, "
    # parenthesized chain (ADVICE r10): PG types it identically to the
    # bare chain — outer application must read the inner timestamptz
    "(ts AT TIME ZONE 'UTC') AT TIME ZONE 'Japan' AS tz_chain "
    "FROM events WHERE event_id % 40 = 0"
)

_SPECS.append(
    QuerySpec(
        name="q61_interval_epoch_zones",
        spark_fn=_guarded("events", _Q61_SQL),
        oracle=(
            "SELECT event_id, "
            "extract(epoch from to_months(CAST(event_id % 30 - 5 "
            "AS INT))) AS ep_dyn, "
            "extract(epoch from interval '2 years 3 months') AS ep_y, "
            "extract(epoch from to_months(-14)) AS ep_ago, "
            "timezone('UTC', timezone('Etc/GMT+5', ts)) AS tz_posix, "
            "timezone('UTC', timezone('Etc/GMT+8', ts)) AS tz_abbr, "
            "timezone('Japan', timezone('UTC', ts)) AS tz_chain "
            "FROM events WHERE event_id % 40 = 0"
        ),
        survey_ref="Q11 round-11: PG epoch-of-interval 365.25-day-year "
        "rule + AT TIME ZONE zone-spelling matrix (sql/dialect.py "
        "translate_extract epoch arm, _pg_zone_to_spark; native "
        "DuckDB twins, no replayed arithmetic)",
    )
)


_Q62_SQL = (
    # Round-11 (verdict #4): two-argument age() — PG's justified
    # year-month/day/time decomposition rendered postgres-style.
    # Arms cover both directions (sign), a month-end borrow over the
    # lesser operand's month length, microsecond time parts with
    # trailing-zero trimming, and the zero interval.
    "SELECT event_id, "
    "age(ts, timestamp '2023-06-15 12:30:45') AS fwd, "
    "age(timestamp '2023-06-15 12:30:45', ts) AS rev, "
    "age(date_trunc('day', ts), ts) AS tod, "
    "age(ts, ts) AS zero "
    "FROM events WHERE event_id % 40 = 0"
)

# DuckDB's native age() implements PG's timestamp_age algorithm; the
# twin normalizes only the two rendering spellings that differ:
# 'month(s)' → 'mon(s)', and DuckDB's |value|-pluralization → PG's
# value != 1 rule ('-1 year' → '-1 years').
_Q62_NORM = (
    "regexp_replace(replace(CAST(age({a}, {b}) AS VARCHAR), "
    "' month', ' mon'), '-1 (year|mon|day)( |$)', '-1 \\1s\\2', 'g')"
)

_SPECS.append(
    QuerySpec(
        name="q62_age_function",
        spark_fn=_guarded("events", _Q62_SQL),
        oracle=(
            "SELECT event_id, "
            + _Q62_NORM.format(a="ts", b="timestamp '2023-06-15 12:30:45'")
            + " AS fwd, "
            + _Q62_NORM.format(a="timestamp '2023-06-15 12:30:45'", b="ts")
            + " AS rev, "
            + _Q62_NORM.format(a="date_trunc('day', ts)", b="ts")
            + " AS tod, "
            + _Q62_NORM.format(a="ts", b="ts")
            + " AS zero "
            "FROM events WHERE event_id % 40 = 0"
        ),
        survey_ref="Q11 round-11: age() two-argument translation "
        "(sql/dialect.py _age_sql; DuckDB native age() twin, "
        "spelling-normalized only)",
    )
)


_Q63_SQL = (
    # Round-11 breadth batch: format() with PG's NULL-renders-empty
    # rule (probe-found: Java's Formatter printed literal 'null' —
    # the chr() trap again), justify_hours (identity on the
    # total-micros representation, rendered PG-style through ::text),
    # isfinite, split_part incl. PG 14 negative positions,
    # width_bucket (Spark-native, PG-compatible), and
    # to_timestamp(epoch seconds).
    "SELECT event_id, "
    "format('%s|%s', nullif(event_id % 4, 2), event_type) AS fmt, "
    "justify_hours(make_interval(hours => "
    "CAST(event_id % 60 AS INT)))::text AS jh, "
    "isfinite(ts) AS fin, "
    "split_part(event_type, 'c', 2) AS sp, "
    "split_part(event_type || '-x-y', '-', -1) AS spn, "
    "CAST(width_bucket(CAST(event_id % 23 AS DOUBLE), 0, 20, 4) "
    "AS INT) AS wb, "
    "to_timestamp(1700000000 + event_id % 1000) AS tts, "
    # round-11 batch 2: degree trig (radians composition; float
    # column → tolerant compare) and the PG 11 core SHA digests
    "sind(CAST(event_id % 360 AS DOUBLE)) AS snd, "
    "atan2d(CAST(event_id % 7 AS DOUBLE), 2) AS at2, "
    "encode(sha256(event_type), 'hex') AS sh "
    "FROM events WHERE event_id % 40 = 0"
)

_SPECS.append(
    QuerySpec(
        name="q63_breadth_round11",
        spark_fn=_guarded("events", _Q63_SQL),
        oracle=(
            "SELECT event_id, "
            # format %s: PG renders NULL as '' — spelled as concat
            # with coalesce (a rendering shim, not a replay of the
            # engine's arithmetic)
            "concat(coalesce(CAST(nullif(event_id % 4, 2) AS VARCHAR), "
            "''), '|', event_type) AS fmt, "
            # justified hours: native DuckDB rendering of the
            # explicitly-justified value (DuckDB has no justify_hours;
            # its interval keeps 50h un-normalized)
            "CAST(to_days(CAST(event_id % 60 AS INT) // 24) "
            "+ to_hours(CAST(event_id % 60 AS INT) % 24) AS VARCHAR) "
            "AS jh, "
            "isfinite(ts) AS fin, "
            "split_part(event_type, 'c', 2) AS sp, "
            "split_part(event_type || '-x-y', '-', -1) AS spn, "
            # width_bucket: DuckDB lacks it — PG's formula (lo < hi,
            # in-range floor((x-lo)/(hi-lo)*n)+1, below → 0,
            # at-or-above hi → n+1)
            "CASE WHEN event_id % 23 >= 20 THEN 5 "
            "WHEN event_id % 23 < 0 THEN 0 "
            "ELSE CAST(floor((event_id % 23) / 20.0 * 4) + 1 AS INT) "
            "END AS wb, "
            "timezone('UTC', to_timestamp(1700000000 + event_id % "
            "1000)) AS tts, "
            "sin(radians(CAST(event_id % 360 AS DOUBLE))) AS snd, "
            "degrees(atan2(CAST(event_id % 7 AS DOUBLE), 2)) AS at2, "
            "sha256(event_type) AS sh "
            "FROM events WHERE event_id % 40 = 0"
        ),
        survey_ref="Q11 round-11 breadth: format NULL rule, "
        "justify_hours, isfinite, split_part negatives, width_bucket, "
        "to_timestamp epoch (sql/dialect.py translate_pg_functions "
        "round-11 loop)",
    )
)


_Q64_SQL = (
    # Round-11 aggregate breadth: array_agg/json_agg KEEP NULLs (PG;
    # Spark's native collect silently drops them — probe-found, fixed
    # via the struct wrapper), json_agg ordered + FILTER forms,
    # bool/bit reductions, corr, and string_agg's null-skipping with
    # an internal ORDER BY.
    "SELECT event_type, "
    "json_agg(nullif(event_id % 7, 3) ORDER BY event_id) AS ja, "
    "json_agg(event_id % 11 ORDER BY event_id DESC) "
    "FILTER (WHERE event_id % 3 = 0) AS jf, "
    "bool_and(event_id % 2 = 0) AS ba, "
    "bool_or(event_id % 97 = 0) AS bo, "
    "CAST(bit_and(event_id % 16) AS BIGINT) AS bnd, "
    "CAST(bit_or(event_id % 16) AS BIGINT) AS bor, "
    "CAST(round(CAST(corr(event_id % 50, event_id % 30) AS NUMERIC), 6) "
    "AS DOUBLE PRECISION) AS cr, "
    "string_agg(nullif(CAST(event_id % 5 AS VARCHAR), '3'), '|' "
    "ORDER BY event_id) AS sa "
    "FROM events WHERE event_id % 37 = 0 "
    "GROUP BY event_type ORDER BY event_type"
)

_SPECS.append(
    QuerySpec(
        name="q64_agg_breadth",
        spark_fn=_guarded("events", _Q64_SQL),
        oracle=(
            "SELECT event_type, "
            # DuckDB's json_group_array is a macro (no ORDER BY /
            # FILTER modifiers) — render the compact json text from
            # the native list() aggregate instead
            "'[' || array_to_string(list_transform("
            "list(nullif(event_id % 7, 3) ORDER BY event_id), "
            "__e -> coalesce(CAST(__e AS VARCHAR), 'null')), ',') "
            "|| ']' AS ja, "
            "'[' || array_to_string(list_transform("
            "list(event_id % 11 ORDER BY event_id DESC) "
            "FILTER (WHERE event_id % 3 = 0), "
            "__e -> coalesce(CAST(__e AS VARCHAR), 'null')), ',') "
            "|| ']' AS jf, "
            "bool_and(event_id % 2 = 0) AS ba, "
            "bool_or(event_id % 97 = 0) AS bo, "
            "CAST(bit_and(event_id % 16) AS BIGINT) AS bnd, "
            "CAST(bit_or(event_id % 16) AS BIGINT) AS bor, "
            "CAST(round(CAST(corr(event_id % 50, event_id % 30) "
            "AS DECIMAL(38,10)), 6) AS DOUBLE) AS cr, "
            "string_agg(nullif(CAST(event_id % 5 AS VARCHAR), '3'), "
            "'|' ORDER BY event_id) AS sa "
            "FROM events WHERE event_id % 37 = 0 "
            "GROUP BY event_type ORDER BY event_type"
        ),
        survey_ref="Q11 round-11 aggregate breadth: array_agg/json_agg "
        "NULL retention, bool_/bit_ reductions, corr, ordered "
        "string_agg (sql/dialect.py translate_json_agg + the "
        "array_agg struct wrapper)",
    )
)


_Q65_SQL = (
    # Round-11: GROUPING SETS — Spark-native with identical semantics
    # (probed: ROLLUP/CUBE sugar too); PG's multi-argument
    # grouping(a, b) bitmask maps to Spark's grouping_id (MSB-first
    # in both, DuckDB concurring). Subtotal rows carry NULL keys,
    # exercising the NULLS-placement translation in ORDER BY.
    "SELECT event_type, event_id % 3 AS p3, "
    "CAST(grouping(event_type, event_id % 3) AS INT) AS g, "
    "CAST(grouping(event_type) AS INT) AS g1, "
    "count(*) AS n, "
    "CAST(sum(event_id % 7) AS BIGINT) AS s "
    "FROM events WHERE event_id % 21 = 0 "
    "GROUP BY GROUPING SETS ((event_type, event_id % 3), "
    "(event_type), ()) "
    "ORDER BY event_type, p3, g"
)

_SPECS.append(
    QuerySpec(
        name="q65_grouping_sets",
        spark_fn=_guarded("events", _Q65_SQL),
        oracle=(
            "SELECT event_type, event_id % 3 AS p3, "
            "CAST(grouping(event_type, event_id % 3) AS INT) AS g, "
            "CAST(grouping(event_type) AS INT) AS g1, "
            "count(*) AS n, "
            "CAST(sum(event_id % 7) AS BIGINT) AS s "
            "FROM events WHERE event_id % 21 = 0 "
            "GROUP BY GROUPING SETS ((event_type, event_id % 3), "
            "(event_type), ()) "
            "ORDER BY event_type NULLS LAST, p3 NULLS LAST, g"
        ),
        survey_ref="Q6 round-11: GROUPING SETS + grouping()/"
        "grouping_id bitmask (native Spark; sql/dialect.py "
        "multi-arg grouping rename)",
    )
)


def _q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = (
        # PG semantics under test (round-8, VERDICT r7 #8): NESTED @>
        # containment — object-in-object partial match, arrays at keys
        # (every needle element contained in SOME haystack element),
        # array-of-objects needles, empty-object needles (contained in
        # any object), and the top-level-only scalar exception staying
        # OFF at nested levels ({"mod": [..]} never contains a scalar)
        "SELECT event_id, "
        "('{\"meta\": {\"type\": \"' || event_type || '\", \"mod\": ' "
        "|| CAST(event_id % 5 AS VARCHAR) || ', \"tags\": [1, {\"lvl\": ' "
        "|| CAST(event_id % 3 AS VARCHAR) || '}]}}') "
        "@> '{\"meta\": {\"type\": \"click\"}}' AS is_click, "
        "('{\"meta\": {\"type\": \"' || event_type || '\", \"mod\": ' "
        "|| CAST(event_id % 5 AS VARCHAR) || ', \"tags\": [1, {\"lvl\": ' "
        "|| CAST(event_id % 3 AS VARCHAR) || '}]}}') "
        "@> '{\"meta\": {\"mod\": 2.0}}' AS mod_two, "
        "('{\"meta\": {\"type\": \"' || event_type || '\", \"mod\": ' "
        "|| CAST(event_id % 5 AS VARCHAR) || ', \"tags\": [1, {\"lvl\": ' "
        "|| CAST(event_id % 3 AS VARCHAR) || '}]}}') "
        "@> '{\"meta\": {\"tags\": [{\"lvl\": 1}]}}' AS lvl_one, "
        "('{\"meta\": {\"type\": \"' || event_type || '\", \"mod\": ' "
        "|| CAST(event_id % 5 AS VARCHAR) || ', \"tags\": [1, {\"lvl\": ' "
        "|| CAST(event_id % 3 AS VARCHAR) || '}]}}') "
        "@> '{\"meta\": {\"tags\": [1], \"type\": {}}}' AS tag_one_objtype "
        "FROM data WHERE event_id % 15 = 0 ORDER BY event_id"
    )
    return execute_on_dataframe(spark, load_table(spark, sf_dir, "events"), sql)


_SPECS.append(
    QuerySpec(
        name="q53_nested_containment",
        spark_fn=_q53,
        oracle=(
            # DuckDB's json_contains shares PG's recursive containment
            # rules (probed: partial object match, per-element array
            # containment, kind-guarded equality, nested scalar
            # exception OFF) — the independent twin
            "WITH j AS (SELECT event_id, "
            "'{\"meta\": {\"type\": \"' || event_type || '\", \"mod\": ' "
            "|| CAST(event_id % 5 AS VARCHAR) || ', \"tags\": [1, {\"lvl\": ' "
            "|| CAST(event_id % 3 AS VARCHAR) || '}]}}' AS doc "
            "FROM events WHERE event_id % 15 = 0) "
            "SELECT event_id, "
            "json_contains(doc, '{\"meta\": {\"type\": \"click\"}}') "
            "AS is_click, "
            "json_contains(doc, '{\"meta\": {\"mod\": 2.0}}') AS mod_two, "
            "json_contains(doc, '{\"meta\": {\"tags\": [{\"lvl\": 1}]}}') "
            "AS lvl_one, "
            "json_contains(doc, "
            "'{\"meta\": {\"tags\": [1], \"type\": {}}}') AS tag_one_objtype "
            "FROM j ORDER BY event_id"
        ),
        survey_ref="Q11 nested jsonb containment: recursive @> needle "
        "expansion into typed variant probes, bounded at 4 container "
        "levels (sql/dialect.py _variant_containment_probe; the "
        "reference passes @> through to PG)",
    )
)


def _q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-8 breadth: SQL-standard (s1,e1) OVERLAPS (s2,e2) — PG
    evaluates it, Spark's parser rejects the row form — plus PG's
    num_nonnulls/num_nulls. The translation spells out the standard's
    half-open rule (pairs normalize; equal endpoints mean that single
    instant; otherwise s1 < e2 AND s2 < e1); the oracle recomputes the
    SAME documented rule independently in DuckDB (which has no
    OVERLAPS), with derived per-row intervals so all three CASE arms
    fire across the corpus."""
    o = load_table(spark, sf_dir, "orders")
    df = o.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("od"),
        F.date_add(
            F.col("o_orderdate").cast("date"),
            (F.col("o_orderkey") % 90).cast("int"),
        ).alias("ed"),
        "o_orderpriority",
    )
    sql = (
        "SELECT o_orderkey, "
        "(od, ed) OVERLAPS (DATE '1995-01-01', DATE '1996-01-01') AS in95, "
        "(ed, od) OVERLAPS (DATE '1996-06-01', DATE '1997-06-01') AS swapped, "
        "(od, od) OVERLAPS (od, ed) AS self_point, "
        "num_nonnulls(nullif(o_orderkey % 3, 0), o_orderpriority, NULL) "
        "AS nn, "
        "num_nulls(nullif(o_orderkey % 7, 1), od) AS nnl "
        "FROM data ORDER BY o_orderkey"
    )
    return execute_on_dataframe(spark, df, sql)


_SPECS.append(
    QuerySpec(
        name="q54_overlaps_null_counters",
        spark_fn=_q54,
        oracle=(
            "WITH d AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od, "
            "CAST(o_orderdate AS DATE) + CAST(o_orderkey % 90 AS INTEGER) "
            "AS ed, o_orderpriority FROM orders) "
            "SELECT o_orderkey, "
            # ed >= od by construction; [od, ed) vs [s, e) half-open,
            # point when od = ed (the standard's rule, spelled out)
            "CASE WHEN od = ed THEN DATE '1995-01-01' <= od "
            "AND od < DATE '1996-01-01' "
            "ELSE od < DATE '1996-01-01' AND DATE '1995-01-01' < ed END "
            "AS in95, "
            "CASE WHEN od = ed THEN DATE '1996-06-01' <= od "
            "AND od < DATE '1997-06-01' "
            "ELSE od < DATE '1997-06-01' AND DATE '1996-06-01' < ed END "
            "AS swapped, "
            # a point at the start of [od, ed) overlaps, and two equal
            # points coincide — provably TRUE for every row
            "TRUE AS self_point, "
            "CAST(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 2 END AS INTEGER) "
            "AS nn, "
            "CAST(CASE WHEN o_orderkey % 7 = 1 THEN 1 ELSE 0 END AS INTEGER) "
            "AS nnl "
            "FROM d ORDER BY o_orderkey"
        ),
        survey_ref="Q11 dialect breadth: SQL-standard OVERLAPS row "
        "predicate (half-open + point rules spelled out; "
        "sql/dialect.py translate_row_overlaps) and PG "
        "num_nonnulls/num_nulls (translate_null_counters)",
    )
)


_SPECS.append(
    QuerySpec(
        name="q45_json_array_containment",
        spark_fn=_q45,
        oracle=_q45_oracle(),
        survey_ref="Q11 dialect breadth: PG jsonb @> with ARRAY needles — "
        "per-element exists over from_json(col, 'array<variant>') with an "
        "is-array guard and kind-checked numeric equality "
        "(sql/dialect.py _array_containment_conditions; reference passes "
        "jsonb ops through to PG via app/crud/queries.py)",
    )
)


def _t25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle transformation inside the hard gate
    (llmops/fim.py, Bavarian et al. 2022): a deterministic 60% of
    documents rearrange PSM — <PRE> prefix <SUF> suffix <MID> middle —
    with both cut points and the apply/skip decision derived from the
    repo's canonical portable 60-bit md5 hash, so the oracle replays
    selection, codepoint cut arithmetic, and reassembly in DuckDB and
    the md5 of every transformed document must agree byte-for-byte.
    The whole pass is one projection (map-only; plan-pinned in
    tests/test_fim.py)."""
    from gfw_data_api_spark.llmops.fim import fim_transform

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = fim_transform(docs, rate_pct=60, seed=7)
    return out.select(
        "doc_id",
        "fim_applied",
        F.length("fim_text").cast("bigint").alias("n_chars_fim"),
        F.md5("fim_text").alias("fim_md5"),
    )


_SPECS.append(
    QuerySpec(
        name="t25_fim_transform",
        spark_fn=_t25,
        oracle=(
            "WITH h AS (SELECT doc_id, text, length(text) AS n, "
            "('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':1' || chr(31) "
            "|| '7'), 1, 15))::BIGINT % (length(text) + 1) AS c1, "
            "('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':2' || chr(31) "
            "|| '7'), 1, 15))::BIGINT % (length(text) + 1) AS c2, "
            "('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':fim' || chr(31) "
            "|| '7'), 1, 15))::BIGINT % 100 < 60 AS sel FROM documents), "
            "f AS (SELECT doc_id, sel, CASE WHEN sel THEN "
            "'<PRE>' || substr(text, 1, least(c1, c2)) || "
            "'<SUF>' || substr(text, greatest(c1, c2) + 1, n - greatest(c1, c2)) || "
            "'<MID>' || substr(text, least(c1, c2) + 1, "
            "greatest(c1, c2) - least(c1, c2)) "
            "ELSE text END AS ft FROM h) "
            "SELECT doc_id, sel AS fim_applied, "
            "CAST(length(ft) AS BIGINT) AS n_chars_fim, md5(ft) AS fim_md5 FROM f"
        ),
        survey_ref="LLM pipeline: fill-in-the-middle transformation "
        "(llmops/fim.py — PSM rearrangement with canonical-hash cut "
        "points and rate selection; map-only plan)",
    )
)


def _d16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-doc exact-substring dedup (Lee et al. 2022 ExactSubstr)
    inside the hard gate: every doc with doc_id % 9 == 3 gets the SAME
    10-token passage appended, so all planted docs share a run longer
    than the 8-token window at arbitrary alignment. The global first
    occurrence keeps its copy; every other planted doc loses exactly
    those 10 tokens (straddling windows mix unique neighbor tokens and
    must not widen the cut). The oracle replays the ENTIRE pipeline —
    sliding windows, keep-first by (doc_id, position), span union,
    reassembly — over window STRINGS in DuckDB, so the xxhash64
    bucketing on the Spark side is cross-checked against collision-free
    string grouping, and any natural duplicate runs in the corpus are
    replayed identically."""
    from gfw_data_api_spark.llmops.dedup import exact_substring_dedup

    planted = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 9 == 3,
            F.concat(F.col("text"), F.lit(" q0 q1 q2 q3 q4 q5 q6 q7 q8 q9")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    out = exact_substring_dedup(planted, window=8)
    return out.select(
        "doc_id",
        "n_tokens_before",
        "n_tokens_after",
        F.md5("text_dedup").alias("text_md5"),
    )


_SPECS.append(
    QuerySpec(
        name="d16_exact_substring_dedup",
        spark_fn=_d16,
        oracle=(
            "WITH base AS (SELECT doc_id, CASE WHEN doc_id % 9 = 3 "
            "THEN text || ' q0 q1 q2 q3 q4 q5 q6 q7 q8 q9' ELSE text END AS text "
            "FROM documents), "
            "toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM base), "
            "widx AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i "
            "FROM toks WHERE len(t) >= 8), "
            "wins AS (SELECT doc_id, i, array_to_string(t[i:i+7], chr(31)) AS w FROM widx), "
            "rn AS (SELECT doc_id, i, "
            "row_number() OVER (PARTITION BY w ORDER BY doc_id, i) AS rk FROM wins), "
            "removed AS (SELECT DISTINCT doc_id, unnest(generate_series(i, i + 7)) AS j "
            "FROM rn WHERE rk >= 2), "
            "tidx AS (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS j FROM toks), "
            "tokpos AS (SELECT doc_id, j, t[j] AS tok FROM tidx), "
            "kept AS (SELECT k.doc_id, k.j, k.tok FROM tokpos k "
            "LEFT JOIN removed r ON k.doc_id = r.doc_id AND k.j = r.j "
            "WHERE r.doc_id IS NULL), "
            "agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens_after, "
            "md5(string_agg(tok, ' ' ORDER BY j)) AS text_md5 FROM kept GROUP BY doc_id) "
            "SELECT toks.doc_id, CAST(len(toks.t) AS BIGINT) AS n_tokens_before, "
            "coalesce(agg.n_tokens_after, 0) AS n_tokens_after, "
            "coalesce(agg.text_md5, md5('')) AS text_md5 "
            "FROM toks LEFT JOIN agg ON toks.doc_id = agg.doc_id"
        ),
        survey_ref="LLM pipeline: exact-substring dedup at arbitrary "
        "alignment (llmops/dedup.py exact_substring_dedup — Lee et al. "
        "2022 keep-first semantics; hashes shuffle, never window text)",
    )
)


def _m10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP3 frame-layer triage inside the hard gate (llmops/mp3.py,
    VERDICT r5 #8): per selected doc, a planted MPEG-1 Layer III
    stream is synthesized from doc_id arithmetic (frame count, sample
    rate, VBR bitrate cycle, padding pattern, CRC, Xing count, ID3
    tags) and parsed back by mp3_stream_info. The oracle recomputes
    every output — INCLUDING the per-frame byte accounting
    ``144000*kbps // rate + pad`` — as DuckDB arithmetic over the same
    planted parameters, so the frame-length formula and the frame walk
    are cross-checked by an independent engine, not round-trip alone.
    PCM decode stays the documented Huffman-table seam (decode_mp3)."""
    from gfw_data_api_spark.llmops.mp3 import build_mp3, mp3_stream_info

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 7 == 2)
        .select("doc_id")
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "payload": []}
            for d in pdf["doc_id"]:
                d = int(d)
                n = 3 + d % 4
                rate = (44100, 48000, 32000)[d % 3]
                vbr = d % 2 == 0
                kbps = [(64, 128, 192, 256)[(d + j) % 4] if vbr else 128 for j in range(n)]
                pads = [1 if (d + j) % 3 == 0 else 0 for j in range(n)]
                rows["doc_id"].append(d)
                rows["payload"].append(
                    bytearray(
                        build_mp3(
                            kbps,
                            sample_rate=rate,
                            mono=not vbr,
                            pad_mask=pads,
                            with_crc=d % 5 == 0,
                            xing_count=n if vbr else None,
                            id3v2_bytes=10 * (d % 11),
                            id3v1=d % 4 == 0,
                            fill_seed=d,
                        )
                    )
                )
            yield pd.DataFrame(rows)

    payloads = docs.mapInPandas(synth, "doc_id bigint, payload binary")
    info = mp3_stream_info(payloads)
    return info.select(
        "doc_id",
        "n_frames",
        "duration_us",
        "sample_rate",
        "channel_mode",
        "is_vbr",
        "sum_kbps",
        "audio_bytes",
        F.when(F.col("is_vbr"), F.col("xing_frames") == F.col("n_frames"))
        .otherwise(F.col("xing_frames").isNull())
        .alias("xing_ok"),
    )


_SPECS.append(
    QuerySpec(
        name="m10_mp3_frame_inventory",
        spark_fn=_m10,
        oracle=(
            "WITH sel AS (SELECT doc_id, 3 + doc_id % 4 AS n, "
            "CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END AS rate, "
            "doc_id % 2 = 0 AS vbr FROM documents WHERE doc_id % 7 = 2), "
            "fr AS (SELECT doc_id, n, rate, vbr, "
            "unnest(generate_series(0, n - 1)) AS j FROM sel), "
            "k AS (SELECT doc_id, n, rate, vbr, "
            "CASE WHEN vbr THEN CASE (doc_id + j) % 4 "
            "WHEN 0 THEN 64 WHEN 1 THEN 128 WHEN 2 THEN 192 ELSE 256 END "
            "ELSE 128 END AS kbps, "
            "CASE WHEN (doc_id + j) % 3 = 0 THEN 1 ELSE 0 END AS pad FROM fr), "
            "agg AS (SELECT doc_id, any_value(n) AS n, any_value(rate) AS rate, "
            "any_value(vbr) AS vbr, CAST(sum(kbps) AS BIGINT) AS sum_kbps, "
            "CAST(sum(144000 * kbps // rate + pad) AS BIGINT) AS audio_bytes "
            "FROM k GROUP BY doc_id) "
            "SELECT doc_id, CAST(n AS BIGINT) AS n_frames, "
            "CAST(n * 1152 * 1000000 // rate AS BIGINT) AS duration_us, "
            "CAST(rate AS BIGINT) AS sample_rate, "
            "CASE WHEN vbr THEN 'stereo' ELSE 'mono' END AS channel_mode, "
            "vbr AS is_vbr, sum_kbps, audio_bytes, TRUE AS xing_ok FROM agg"
        ),
        survey_ref="multimodal: MP3 frame-layer triage (llmops/mp3.py — "
        "MPEG-1 Layer III header walk, ID3v1/v2 + Xing/VBRI handling, "
        "exact byte/duration accounting; PCM decode stays the documented "
        "ISO-11172-3 Huffman-table seam)",
    )
)


def _m13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-8 free-format MP3 inside the hard gate (VERDICT r7 #9
    stretch — llmops/mp3.py): per selected doc, a planted FREE-FORMAT
    stream (bitrate index 0 — the header signals no length; the walker
    derives the constant frame size from the first next-sync scan,
    the standard decoder recipe). Profiles cover Layer III (MPEG-1/2/
    2.5) and Layer I's 4-byte padding slots; per-doc base length,
    frame count, padding pattern, and ID3 tags all derive from doc_id
    arithmetic, so the oracle recomputes every output — including the
    padding-slot byte accounting — in DuckDB from the planting rule."""
    from gfw_data_api_spark.llmops.mp3 import build_mp3, mp3_stream_info

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 9 == 4)
        .select("doc_id")
    )
    profiles = [
        ("1", 3, 44100),
        ("1", 1, 32000),
        ("2", 3, 16000),
        ("2.5", 3, 11025),
    ]

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "payload": []}
            for d in pdf["doc_id"]:
                d = int(d)
                version, layer, rate = profiles[d % 4]
                n = 3 + d % 4
                base = 150 + (d % 7) * 30
                pads = [(d + j) % 2 for j in range(n)]
                rows["doc_id"].append(d)
                rows["payload"].append(
                    bytearray(
                        build_mp3(
                            [0] * n,
                            sample_rate=rate,
                            version=version,
                            layer=layer,
                            mono=True,
                            pad_mask=pads,
                            free_frame_len=base,
                            id3v2_bytes=25 if d % 2 else 0,
                            id3v1=d % 3 == 0,
                            fill_seed=d,
                        )
                    )
                )
            yield pd.DataFrame(rows)

    payloads = docs.mapInPandas(synth, "doc_id bigint, payload binary")
    info = mp3_stream_info(payloads)
    return info.select(
        "doc_id",
        "mpeg_version",
        "layer",
        "n_frames",
        "free_frame_bytes",
        "audio_bytes",
        "duration_us",
        (F.col("sum_kbps") == 0).alias("sum_kbps_zero"),
        (~F.col("is_vbr")).alias("constant_rate"),
    )


_SPECS.append(
    QuerySpec(
        name="m13_free_format_mp3",
        spark_fn=_m13,
        oracle=(
            "WITH sel AS (SELECT doc_id, 3 + doc_id % 4 AS n, "
            "doc_id % 4 AS p, 150 + (doc_id % 7) * 30 AS base "
            "FROM documents WHERE doc_id % 9 = 4) "
            "SELECT doc_id, "
            "CASE p WHEN 0 THEN '1' WHEN 1 THEN '1' WHEN 2 THEN '2' "
            "ELSE '2.5' END AS mpeg_version, "
            "CAST(CASE p WHEN 1 THEN 1 ELSE 3 END AS BIGINT) AS layer, "
            "CAST(n AS BIGINT) AS n_frames, "
            "CAST(base AS BIGINT) AS free_frame_bytes, "
            # padding slots: (d+j)%2 over j<n sets floor(n/2) + odd-n
            # correction when d is odd; Layer I slots are 4 bytes
            "CAST(n * base + (CASE p WHEN 1 THEN 4 ELSE 1 END) * "
            "(n // 2 + (n % 2) * (doc_id % 2)) AS BIGINT) AS audio_bytes, "
            "CAST(n * (CASE p WHEN 0 THEN 1152 WHEN 1 THEN 384 "
            "ELSE 576 END) * 1000000 // (CASE p WHEN 0 THEN 44100 "
            "WHEN 1 THEN 32000 WHEN 2 THEN 16000 ELSE 11025 END) "
            "AS BIGINT) AS duration_us, "
            "TRUE AS sum_kbps_zero, TRUE AS constant_rate "
            "FROM sel"
        ),
        survey_ref="multimodal audio: free-format MP3 frame walking "
        "(llmops/mp3.py _free_format_base_length — next-sync length "
        "derivation, padding-slot accounting; closes the last common "
        "loud-reject in wild audio)",
    )
)


def _m12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-7 MP3 matrix extension inside the hard gate (VERDICT r6
    #7 stretch): per selected doc, a planted stream from the FULL
    MPEG version×layer grid — MPEG-1 Layers I/II, MPEG-2 Layers
    II/III, MPEG-2.5 Layer III (m10 already pins MPEG-1 Layer III) —
    with per-frame bitrate alternation and padding. The oracle
    recomputes the per-profile byte accounting (Layer I 4-byte slots,
    the 72-factor 576-sample MPEG-2 Layer III arithmetic) in DuckDB
    from the same planted parameters."""
    from gfw_data_api_spark.llmops.mp3 import build_mp3, mp3_stream_info

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 7 == 5)
        .select("doc_id")
    )
    profiles = [
        ("1", 1, 44100, (128, 256)),
        ("1", 2, 48000, (64, 192)),
        ("2", 3, 22050, (32, 64)),
        ("2.5", 3, 8000, (16, 40)),
        ("2", 2, 24000, (48, 96)),
    ]

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "payload": []}
            for d in pdf["doc_id"]:
                d = int(d)
                version, layer, rate, pair = profiles[d % 5]
                n = 2 + d % 3
                cbr = d % 4 == 1
                kbps = [pair[0] if cbr else pair[(d + j) % 2] for j in range(n)]
                pads = [(d + j) % 2 for j in range(n)]
                rows["doc_id"].append(d)
                rows["payload"].append(
                    bytearray(
                        build_mp3(
                            kbps,
                            sample_rate=rate,
                            version=version,
                            layer=layer,
                            mono=True,
                            pad_mask=pads,
                            fill_seed=d,
                        )
                    )
                )
            yield pd.DataFrame(rows)

    payloads = docs.mapInPandas(synth, "doc_id bigint, payload binary")
    info = mp3_stream_info(payloads)
    return info.select(
        "doc_id",
        "mpeg_version",
        "layer",
        "n_frames",
        "total_samples",
        "duration_us",
        "sample_rate",
        "is_vbr",
        "sum_kbps",
        "audio_bytes",
        F.col("xing_frames").isNull().alias("no_xing"),
    )


_SPECS.append(
    QuerySpec(
        name="m12_mpeg_matrix_inventory",
        spark_fn=_m12,
        oracle=(
            "WITH sel AS (SELECT doc_id, 2 + doc_id % 3 AS n, "
            "doc_id % 5 AS p, doc_id % 4 = 1 AS cbr FROM documents "
            "WHERE doc_id % 7 = 5), "
            "prof AS (SELECT doc_id, n, cbr, "
            "CASE p WHEN 0 THEN '1' WHEN 1 THEN '1' WHEN 2 THEN '2' "
            "WHEN 3 THEN '2.5' ELSE '2' END AS version, "
            "CASE p WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 3 "
            "WHEN 3 THEN 3 ELSE 2 END AS layer, "
            "CASE p WHEN 0 THEN 44100 WHEN 1 THEN 48000 WHEN 2 THEN 22050 "
            "WHEN 3 THEN 8000 ELSE 24000 END AS rate, "
            "CASE p WHEN 0 THEN 128 WHEN 1 THEN 64 WHEN 2 THEN 32 "
            "WHEN 3 THEN 16 ELSE 48 END AS k0, "
            "CASE p WHEN 0 THEN 256 WHEN 1 THEN 192 WHEN 2 THEN 64 "
            "WHEN 3 THEN 40 ELSE 96 END AS k1 FROM sel), "
            "fr AS (SELECT *, unnest(generate_series(0, n - 1)) AS j "
            "FROM prof), "
            "k AS (SELECT doc_id, version, layer, rate, n, cbr, "
            "CASE WHEN cbr OR (doc_id + j) % 2 = 0 THEN k0 ELSE k1 END "
            "AS kbps, (doc_id + j) % 2 AS pad FROM fr), "
            "lens AS (SELECT *, CASE WHEN layer = 1 "
            "THEN (12000 * kbps // rate + pad) * 4 "
            "WHEN layer = 2 THEN 144000 * kbps // rate + pad "
            "ELSE 72000 * kbps // rate + pad END AS flen, "
            "CASE WHEN layer = 1 THEN 384 WHEN layer = 2 THEN 1152 "
            "ELSE 576 END AS spf FROM k), "
            "agg AS (SELECT doc_id, any_value(version) AS version, "
            "any_value(layer) AS layer, any_value(n) AS n, "
            "any_value(rate) AS rate, any_value(cbr) AS cbr, "
            "any_value(spf) AS spf, "
            "CAST(sum(kbps) AS BIGINT) AS sum_kbps, "
            "CAST(sum(flen) AS BIGINT) AS audio_bytes FROM lens "
            "GROUP BY doc_id) "
            "SELECT doc_id, version AS mpeg_version, "
            "CAST(layer AS BIGINT) AS layer, CAST(n AS BIGINT) AS n_frames, "
            "CAST(n * spf AS BIGINT) AS total_samples, "
            "CAST(n * spf * 1000000 // rate AS BIGINT) AS duration_us, "
            "CAST(rate AS BIGINT) AS sample_rate, "
            "NOT cbr AS is_vbr, sum_kbps, audio_bytes, "
            "TRUE AS no_xing FROM agg"
        ),
        survey_ref="multimodal: full MPEG audio matrix triage "
        "(llmops/mp3.py — MPEG-1/2/2.5 × Layers I/II/III bitrate and "
        "sample-rate tables, Layer I 4-byte-slot and MPEG-2 Layer III "
        "576-sample frame arithmetic; VERDICT r6 #7)",
    )
)


def _m11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AAC ADTS frame-layer triage inside the hard gate (llmops/aac.py
    — the MP3 gate's companion, closing the audio-container seam for
    the other ubiquitous format): per selected doc, a planted AAC-LC
    ADTS stream is synthesized from doc_id arithmetic (frame count,
    sampling-frequency index, channel config, CRC slots, VBR
    buffer-fullness escape, multi-raw-data-block frames, ID3v2 tag)
    and parsed back by adts_stream_info. The oracle recomputes every
    output — INCLUDING the per-frame byte accounting ``7 + crc +
    payload`` and the per-block 1024-sample duration math — as DuckDB
    arithmetic over the same planted parameters, so the 13-bit
    frame-length packing and the block walk are cross-checked by an
    independent engine, not round-trip alone. PCM decode stays the
    documented Huffman-codebook seam (decode_aac)."""
    from gfw_data_api_spark.llmops.aac import adts_stream_info, build_adts

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 7 == 4)
        .select("doc_id")
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "payload": []}
            for d in pdf["doc_id"]:
                d = int(d)
                n = 2 + d % 5
                rate = (48000, 44100, 32000, 24000, 16000)[d % 5]
                rows["doc_id"].append(d)
                rows["payload"].append(
                    bytearray(
                        build_adts(
                            [40 + (d * 3 + j * 11) % 50 for j in range(n)],
                            sample_rate=rate,
                            channels=1 + d % 3,
                            with_crc=d % 5 == 1,
                            vbr=d % 3 == 0,
                            blocks_per_frame=[1 + (d + j) % 2 for j in range(n)],
                            id3v2_bytes=10 * (d % 7),
                            fill_seed=d,
                        )
                    )
                )
            yield pd.DataFrame(rows)

    payloads = docs.mapInPandas(synth, "doc_id bigint, payload binary")
    return adts_stream_info(payloads).select(
        "doc_id",
        "n_frames",
        "n_blocks",
        "total_samples",
        "duration_us",
        "sample_rate",
        "channel_config",
        "profile",
        "is_vbr",
        "audio_bytes",
    )


_SPECS.append(
    QuerySpec(
        name="m11_adts_frame_inventory",
        spark_fn=_m11,
        oracle=(
            "WITH sel AS (SELECT doc_id, 2 + doc_id % 5 AS n, "
            "CASE doc_id % 5 WHEN 0 THEN 48000 WHEN 1 THEN 44100 "
            "WHEN 2 THEN 32000 WHEN 3 THEN 24000 ELSE 16000 END AS rate, "
            "doc_id % 3 = 0 AS vbr, "
            "CASE WHEN doc_id % 5 = 1 THEN 2 ELSE 0 END AS crc, "
            "1 + doc_id % 3 AS ch FROM documents WHERE doc_id % 7 = 4), "
            "fr AS (SELECT doc_id, n, rate, vbr, crc, ch, "
            "unnest(generate_series(0, n - 1)) AS j FROM sel), "
            "k AS (SELECT doc_id, n, rate, vbr, ch, "
            "7 + crc + 40 + (doc_id * 3 + j * 11) % 50 AS flen, "
            "1 + (doc_id + j) % 2 AS blocks FROM fr), "
            "agg AS (SELECT doc_id, any_value(n) AS n, any_value(rate) AS rate, "
            "any_value(vbr) AS vbr, any_value(ch) AS ch, "
            "CAST(sum(blocks) AS BIGINT) AS n_blocks, "
            "CAST(sum(flen) AS BIGINT) AS audio_bytes FROM k GROUP BY doc_id) "
            "SELECT doc_id, CAST(n AS BIGINT) AS n_frames, n_blocks, "
            "n_blocks * 1024 AS total_samples, "
            "n_blocks * 1024 * 1000000 // rate AS duration_us, "
            "CAST(rate AS BIGINT) AS sample_rate, "
            "CAST(ch AS BIGINT) AS channel_config, 'lc' AS profile, "
            "vbr AS is_vbr, audio_bytes FROM agg"
        ),
        survey_ref="multimodal: AAC ADTS frame-layer triage (llmops/aac.py "
        "— ISO 13818-7 §6.2 header walk, 13-bit length packing, "
        "multi-raw-data-block sample accounting, VBR fullness escape; "
        "PCM decode stays the documented Huffman-codebook seam)",
    )
)


def _registry_order(specs: list[QuerySpec]) -> list[QuerySpec]:
    by_name = {s.name: s for s in specs}
    front = [by_name[n] for n in _DRIVER_FRONT]
    rest_oracle = [
        s for s in specs if s.name not in _DRIVER_FRONT and s.oracle is not None
    ]
    rows_only = [
        s for s in specs if s.oracle is None and s.name not in _DRIVER_FRONT
    ]
    return front + rest_oracle + rows_only


SPECS: dict[str, QuerySpec] = {spec.name: spec for spec in _registry_order(_SPECS)}


def queries() -> dict[str, SparkQuery]:
    return {name: spec.spark_fn for name, spec in SPECS.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in SPECS.items() if spec.oracle is not None}


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary through the guarded engine."""
    return SPECS["q04_pricing_summary"].spark_fn(spark, sf_dir)
