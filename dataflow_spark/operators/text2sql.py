"""text2sql operators — the executable subset of the reference's 12-op domain.

The reference's text2sql pipeline generates SQL with an LLM and then
*executes* it against a DB pool to keep only runnable statements
(dataflow/operators/text2sql: SQLExecutionFilter / SQLExecutabilityFilter,
pool at dataflow/utils/db_pool/).  The LLM generation side is a non-goal
(external service), but the execution-filter side is implementable for real:
DuckDB ships in-process, so each executor validates statements against its
own embedded engine inside ``mapInPandas`` — the same per-executor-resource
pattern the reference uses for its pooled connections.

``SQLComponentClassifier`` (clause counting -> difficulty bucket) is a pure
Catalyst expression.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataflow_spark.core.stage import Stage, register


def sql_executability(
    df: DataFrame, sql_col: str = "sql", out_col: str = "sql_ok", setup_sql: str | None = None
) -> DataFrame:
    """Label each row 1/0 by whether its SQL statement parses+plans in an
    embedded DuckDB (EXPLAIN — no data needed beyond ``setup_sql`` schema).
    One connection per partition, vectorized batches, never per-row Python
    process spawning.

    Hardened against untrusted (LLM-generated) SQL — this operator's whole
    input domain: (a) multi-statement payloads are rejected outright
    (``'SELECT 1; DROP TABLE t'`` would otherwise become
    ``EXPLAIN SELECT 1; DROP TABLE t`` and *execute* the trailing DROP,
    mutating the shared per-partition connection and flipping labels for
    later rows), and (b) the connection disables external access so ATTACH /
    COPY TO file / INSTALL cannot reach the executor filesystem or network.
    """
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.IntegerType())]
    )

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import duckdb

        con = duckdb.connect(config={"enable_external_access": "false"})
        if setup_sql:
            con.execute(setup_sql)
        for pdf in it:
            oks = []
            for stmt in pdf[sql_col]:
                try:
                    if len(duckdb.extract_statements(stmt)) != 1:
                        oks.append(0)
                        continue
                    con.execute(f"EXPLAIN {stmt}")
                    oks.append(1)
                except Exception:
                    oks.append(0)
            yield pdf.assign(**{out_col: oks})

    return df.mapInPandas(fn, out_schema)


def sql_executability_filter(
    df: DataFrame, sql_col: str = "sql", setup_sql: str | None = None
) -> DataFrame:
    """SQLExecutabilityFilter: keep only rows whose SQL runs (label column on
    survivors is always 1 — the reference's uniform filter semantics)."""
    labeled = sql_executability(df, sql_col, "sql_ok", setup_sql)
    return labeled.where(F.col("sql_ok") == 1)


@register("SQLExecutabilityFilter")
def sql_exec_filter_stage(input_key: str = "sql", setup_sql: str | None = None) -> Stage:
    return Stage(
        "SQLExecutabilityFilter",
        lambda df: sql_executability_filter(df, input_key, setup_sql),
        (input_key,),
        ("sql_ok",),
        "filter",
    )


_COMPONENTS = {
    "n_joins": r"(?i)\bjoin\b",
    "n_where": r"(?i)\bwhere\b",
    "n_group_by": r"(?i)\bgroup\s+by\b",
    "n_order_by": r"(?i)\border\s+by\b",
    "n_aggs": r"(?i)\b(count|sum|avg|min|max)\s*\(",
    "n_subqueries": r"(?i)\(\s*select\b",
}


def sql_components(sql_col) -> list[Column]:
    c = F.col(sql_col) if isinstance(sql_col, str) else sql_col
    return [
        F.regexp_count(c, F.lit(pat)).cast("int").alias(name)
        for name, pat in _COMPONENTS.items()
    ]


def sql_difficulty(sql_col) -> Column:
    """SQLComponentClassifier (text2sql/eval): component count -> difficulty
    bucket (easy <2, medium <4, hard otherwise)."""
    c = F.col(sql_col) if isinstance(sql_col, str) else sql_col
    total = None
    for pat in _COMPONENTS.values():
        cnt = F.regexp_count(c, F.lit(pat))
        total = cnt if total is None else total + cnt
    return (
        F.when(total < 2, F.lit("easy"))
        .when(total < 4, F.lit("medium"))
        .otherwise(F.lit("hard"))
    )


@register("SQLComponentClassifier")
def sql_component_stage(input_key: str = "sql") -> Stage:
    def fn(df: DataFrame) -> DataFrame:
        out = df
        for name, pat in _COMPONENTS.items():
            out = out.withColumn(
                name, F.regexp_count(F.col(input_key), F.lit(pat)).cast("int")
            )
        return out.withColumn("sql_difficulty", sql_difficulty(input_key))

    return Stage(
        "SQLComponentClassifier",
        fn,
        (input_key,),
        tuple(_COMPONENTS) + ("sql_difficulty",),
        "eval",
    )
