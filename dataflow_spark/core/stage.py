"""Stage / Pipeline core — the engine's analogue of the reference's
OperatorABC + PipelineABC.

Reference semantics being re-expressed (citations into /root/reference):

* every operator is a class with ``run(storage, input_key, output_key, ...)``
  registered in ``OPERATOR_REGISTRY`` (dataflow/core/operator.py:5-15,
  dataflow/utils/registry.py:34-259);
* ``pipeline.compile()`` records the op sequence without executing, builds an
  op/key DAG, and validates every input key against the accumulated schema,
  raising ``KeyError`` with diagnostics (dataflow/pipeline/Pipeline.py:43-196,
  key check at 103-135);
* execution then materializes the full table to disk between steps
  (dataflow/utils/storage.py:512-524) — the one thing we deliberately do NOT
  reproduce: a Pipeline here composes ONE lazy DataFrame expression, so a chain
  of 20 filters is a single Catalyst stage with zero intermediate I/O.

A ``Stage`` declares its input/output columns so the Pipeline can fail fast on
missing columns exactly like the reference's compile-time key validation, but
against ``df.schema`` instead of accumulated pandas keys.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame


@dataclass
class Stage:
    """One pipeline step: a named, declared DataFrame -> DataFrame transform.

    kind: 'filter' (drops rows, adds 0/1 label col), 'refine' (rewrites a
    column in place), 'eval' (adds a score column), 'generate' (adds new
    columns) — mirrors the reference's four operator kinds (SURVEY.md §2).
    """

    name: str
    fn: Callable[[DataFrame], DataFrame]
    input_cols: tuple[str, ...] = ()
    output_cols: tuple[str, ...] = ()
    kind: str = "transform"
    params: dict = field(default_factory=dict)

    def apply(self, df: DataFrame) -> DataFrame:
        missing = [c for c in self.input_cols if c not in df.columns]
        if missing:
            raise KeyError(
                f"stage '{self.name}' requires column(s) {missing}; "
                f"available: {df.columns}"
            )
        return self.fn(df)

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.apply(df)


class Pipeline:
    """Compose stages into one lazy DataFrame expression.

    ``validate(schema_cols)`` replays the reference's compile-time key check
    (Pipeline.py:103-135): walk stages in order, track the column set, raise
    KeyError naming the offending stage before any execution happens.
    """

    def __init__(self, stages: list[Stage] | None = None):
        self.stages: list[Stage] = list(stages or [])

    def add(self, stage: Stage) -> "Pipeline":
        self.stages.append(stage)
        return self

    def validate(self, input_cols: list[str]) -> list[str]:
        cols = list(input_cols)
        for st in self.stages:
            missing = [c for c in st.input_cols if c not in cols]
            if missing:
                raise KeyError(
                    f"pipeline validation failed at stage '{st.name}': "
                    f"missing input column(s) {missing}; available {cols}"
                )
            for c in st.output_cols:
                if c not in cols:
                    cols.append(c)
        return cols

    def run(self, df: DataFrame) -> DataFrame:
        self.validate(df.columns)
        for st in self.stages:
            df = st.apply(df)
        return df

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.run(df)


# Registry keyed by the reference operator names so a reference pipeline config
# maps 1:1 onto engine stages (analogue of dataflow/utils/registry.py:34-259 +
# get_operator(name, args) at dataflow/core/operator.py:17-28).
OPERATOR_REGISTRY: dict[str, Callable[..., Stage]] = {}


def register(name: str):
    def deco(factory: Callable[..., Stage]):
        OPERATOR_REGISTRY[name] = factory
        return factory

    return deco


def get_operator(name: str, **params) -> Stage:
    if not OPERATOR_REGISTRY:
        # lazy registration (analogue of the reference's LazyLoader,
        # registry.py:261+): operator modules self-register on import
        import dataflow_spark.operators  # noqa: F401

    if name not in OPERATOR_REGISTRY:
        raise KeyError(
            f"unknown operator '{name}'; known: {sorted(OPERATOR_REGISTRY)}"
        )
    return OPERATOR_REGISTRY[name](**params)
