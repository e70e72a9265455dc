"""Regression tests for the round-1 security/correctness review findings
(guard bypasses, FROM-binding bypasses, injection, alias handling)."""

import pandas as pd
import pytest

from gfw_data_api_spark.functions import geometry as geo
from gfw_data_api_spark.operators.query import execute_on_dataframe
from gfw_data_api_spark.sql import QueryGuardError, scrutinize_sql
from gfw_data_api_spark.sql.guard import bind_from, validate_sql


def test_spark_reflection_builtins_blocked():
    for sql in (
        "SELECT reflect('java.lang.System','getenv','PATH') FROM data",
        "SELECT java_method('java.lang.System','exit',1) FROM data",
    ):
        with pytest.raises(QueryGuardError) as exc:
            validate_sql(sql)
        assert exc.value.detail == "Use of admin, system or private functions is not allowed."


def test_quoted_forbidden_function_blocked():
    with pytest.raises(QueryGuardError):
        validate_sql('SELECT "pg_read_file"(\'/etc/passwd\') FROM t')
    with pytest.raises(QueryGuardError):
        validate_sql('SELECT "reflect"(a, b) FROM t')


def test_bind_from_ignores_from_in_string_literal():
    validated = validate_sql("SELECT 'from x where', col FROM data WHERE col > 1")
    bound = bind_from(validated, "the_view")
    assert bound == "SELECT 'from x where', col FROM the_view WHERE col > 1"


def test_bind_from_ignores_scalar_subquery_from():
    validated = validate_sql("SELECT (SELECT max(v) FROM other) AS m FROM data")
    bound = bind_from(validated, "the_view")
    assert bound == "SELECT (SELECT max(v) FROM other) AS m FROM the_view"


def test_bind_from_preserves_quoted_alias(spark):
    # the quoted alias is re-emitted backtick-quoted (Spark identifier
    # syntax) so the view binds instead of silently keeping the old table
    validated = validate_sql('SELECT x FROM data AS "a b" WHERE x = 1')
    bound = bind_from(validated, "the_view")
    assert bound == "SELECT x FROM the_view AS `a b` WHERE x = 1"
    # and a quoted alias that needs no quoting still executes end to end
    df = spark.createDataFrame([(1,), (2,)], "x int")
    rows = execute_on_dataframe(
        spark, df, 'SELECT t.x FROM data AS "t" WHERE t.x = 1'
    ).collect()
    assert [r["x"] for r in rows] == [1]


def test_geometry_injection_neutralized():
    import json

    from gfw_data_api_spark.sql.tokenizer import tokenize

    hostile = {"type": "Polygon') OR 1=1 --", "coordinates": []}
    out = scrutinize_sql("ds", "v1", hostile, "SELECT x FROM data")
    # the whole payload must sit inside ONE balanced string literal —
    # tokenizing the output yields exactly one STRING token whose value
    # is the full canonical GeoJSON (nothing escaped into SQL position)
    strings = [t.value for t in tokenize(out) if t.kind == "STRING"]
    assert strings == [json.dumps(hostile)]


def test_leading_semicolon_trimmed(spark):
    df = spark.createDataFrame([(1,), (2,)], "x int")
    rows = execute_on_dataframe(spark, df, "; SELECT count(*) AS c FROM data").collect()
    assert rows[0]["c"] == 2


def test_execute_with_literal_containing_from(spark):
    df = spark.createDataFrame([(1,), (2,)], "x int")
    rows = execute_on_dataframe(
        spark, df, "SELECT 'from secret_table where' AS s, count(*) AS c FROM data"
    ).collect()
    assert rows[0]["c"] == 2 and rows[0]["s"] == "from secret_table where"


def test_zonal_alias_preserved(spark, tmp_path):
    import numpy as np

    from gfw_data_api_spark.catalog import Registry
    from gfw_data_api_spark.raster.grid import Grid
    from gfw_data_api_spark.raster.ingest import ingest_raster_tiles
    from gfw_data_api_spark.raster.zonal import query_raster

    registry = Registry(str(tmp_path / "cat"))
    grid = Grid(1.0, 20)
    ingest_raster_tiles(
        registry, spark, "layer", "v1", grid, "year",
        {"01N_010E": np.ones((20, 20)) * 2000},
    )
    aoi = {
        "type": "Polygon",
        "coordinates": [[[10.1, 0.1], [10.9, 0.1], [10.9, 0.9], [10.1, 0.9], [10.1, 0.1]]],
    }
    rows = query_raster(
        spark, registry, "layer", "v1",
        "SELECT t.layer__year AS y, count(*) AS n FROM data t GROUP BY t.layer__year",
        aoi,
    ).collect()
    assert rows[0]["y"] == 2000.0 and rows[0]["n"] > 0


def test_unspaced_subtraction_still_references_layer(spark, tmp_path):
    import numpy as np

    from gfw_data_api_spark.catalog import Registry
    from gfw_data_api_spark.raster.grid import Grid
    from gfw_data_api_spark.raster.ingest import ingest_raster_tiles
    from gfw_data_api_spark.raster.zonal import query_raster

    registry = Registry(str(tmp_path / "cat2"))
    grid = Grid(1.0, 20)
    ingest_raster_tiles(
        registry, spark, "tcl", "v1", grid, "year",
        {"01N_010E": np.ones((20, 20)) * 2010},
    )
    aoi = {
        "type": "Polygon",
        "coordinates": [[[10.1, 0.1], [10.9, 0.1], [10.9, 0.9], [10.1, 0.9], [10.1, 0.1]]],
    }
    rows = query_raster(
        spark, registry, "tcl", "v1",
        "SELECT sum(tcl__year-2000) AS s FROM data", aoi,  # no spaces around '-'
    ).collect()
    assert rows[0]["s"] > 0
