"""Schema-drift classification and batch alignment (operators/evolve.py)."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from dwh_etl_ods_spark_jobs_spark.operators.evolve import (
    align_schema,
    diff_schemas,
)

TARGET = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("amount", LongType()),
    ]
)


def test_diff_schemas_classifies(spark):
    batch = spark.createDataFrame(
        [(1, "a", "10", "extra")],
        "id int, name string, amount string, debug string",
    )
    d = diff_schemas(batch.schema, TARGET)
    assert d.added == ("debug",)
    assert d.missing == ()
    assert d.retyped == (
        ("amount", "string", "bigint"),
        ("id", "int", "bigint"),
    )
    assert not d.is_clean
    clean = spark.createDataFrame([], TARGET)
    assert diff_schemas(clean.schema, TARGET).is_clean


def test_align_schema_conforms_order_types_and_fills(spark):
    # batch: wrong order, extra column, missing 'name', string amount
    batch = spark.createDataFrame(
        [("12", 1, "x"), ("oops", 2, "y")], "amount string, id int, debug string"
    )
    out = align_schema(batch, TARGET)
    assert [f.name for f in out.schema.fields] == ["id", "name", "amount"]
    assert out.schema == TARGET
    rows = {r.id: r for r in out.collect()}
    assert rows[1].amount == 12
    assert rows[2].amount is None  # try_cast: malformed -> NULL, not crash
    assert rows[1].name is None    # missing column -> typed NULL fill


def test_align_schema_error_policies(spark):
    batch = spark.createDataFrame([(1, "a", 1, "x")], "id long, name string, amount long, debug string")
    with pytest.raises(ValueError, match="unexpected columns.*debug"):
        align_schema(batch, TARGET, on_added="error")
    missing = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="missing columns"):
        align_schema(missing, TARGET, on_missing="error")
    retyped = spark.createDataFrame([(1, "a", "10")], "id long, name string, amount string")
    with pytest.raises(ValueError, match="retyped.*amount"):
        align_schema(retyped, TARGET, on_retyped="error")
    with pytest.raises(ValueError, match="on_added must be"):
        align_schema(batch, TARGET, on_added="ignore")


def test_align_schema_clean_batch_is_identity(spark):
    df = spark.createDataFrame([(1, "a", 5)], TARGET)
    out = align_schema(df, TARGET)
    assert out.schema == TARGET
    assert out.collect() == df.collect()
    # zero shuffle: pure projection
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
