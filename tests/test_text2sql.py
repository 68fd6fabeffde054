"""text2sql executable-filter + component-classifier tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataflow_spark.core.stage import get_operator
from dataflow_spark.operators.text2sql import (
    sql_difficulty,
    sql_executability_filter,
)

STMTS = [
    ("a", "SELECT 1 AS x"),
    ("b", "SELECT count(*) FROM t WHERE v > 3"),
    ("c", "SELEC 1"),  # typo -> parse error
    ("d", "SELECT * FROM missing_table"),  # binder error (no such table)
    ("e", "SELECT t.v, count(*) FROM t JOIN t AS u ON t.v = u.v GROUP BY t.v ORDER BY 2"),
]
SETUP = "CREATE TABLE t (v INTEGER)"


def test_sql_executability_filter(spark):
    df = spark.createDataFrame(STMTS, ["id", "sql"])
    kept = {r.id for r in sql_executability_filter(df, setup_sql=SETUP).collect()}
    assert kept == {"a", "b", "e"}


def test_sql_injection_rejected(spark):
    # Multi-statement payloads must label 0 (never execute the tail), and the
    # shared per-partition connection must stay intact for later rows.
    rows = [
        ("ok1", "SELECT count(*) FROM t"),
        ("inj", "SELECT 1; DROP TABLE t"),
        ("ok2", "SELECT v FROM t"),  # would fail if the DROP had executed
        ("ext", "COPY (SELECT 1) TO '/tmp/_sqlinj_probe.csv'"),
    ]
    df = spark.createDataFrame(rows, ["id", "sql"]).coalesce(1)
    kept = {r.id for r in sql_executability_filter(df, setup_sql=SETUP).collect()}
    assert kept == {"ok1", "ok2"}
    import os

    assert not os.path.exists("/tmp/_sqlinj_probe.csv")


def test_sql_executability_stage_labels(spark):
    df = spark.createDataFrame(STMTS, ["id", "sql"])
    out = get_operator("SQLExecutabilityFilter", setup_sql=SETUP).apply(df)
    assert set(out.columns) >= {"id", "sql", "sql_ok"}
    assert out.where(F.col("sql_ok") != 1).count() == 0  # survivors all labeled 1


def test_sql_component_classifier(spark):
    df = spark.createDataFrame(STMTS, ["id", "sql"])
    out = {r.id: r for r in get_operator("SQLComponentClassifier").apply(df).collect()}
    assert out["e"].n_joins == 1
    assert out["e"].n_group_by == 1
    assert out["e"].n_order_by == 1
    assert out["e"].n_aggs == 1
    assert out["a"].sql_difficulty == "easy"
    assert out["e"].sql_difficulty == "hard"
    assert out["b"].sql_difficulty == "medium"


def test_difficulty_expression_matches_stage(spark):
    df = spark.createDataFrame(STMTS, ["id", "sql"])
    a = {r.id: r.d for r in df.select("id", sql_difficulty("sql").alias("d")).collect()}
    b = {
        r.id: r.sql_difficulty
        for r in get_operator("SQLComponentClassifier").apply(df).collect()
    }
    assert a == b
