"""Sources & sinks — the FileStorage/MyScaleDBStorage surface, Spark-first.

The reference reads/writes json/jsonl/csv/parquet/pickle/xlsx via pandas
(dataflow/utils/storage.py:566-698, format dispatch 683-696) plus hub
prefixes ``hf:``/``ms:`` (storage.py:595-621) and a ClickHouse table
(storage.py:753-929).  Here each becomes a Spark reader/writer:

* jsonl/json/csv/parquet -> native distributed sources (predicate pushdown &
  column pruning for parquet);
* pickle -> pandas pickle via the driver (inherently single-file; the
  reference's own pickle path is single-process too, storage.py:551);
* xlsx -> from-scratch OOXML reader/writer on stdlib zipfile+ElementTree
  (openpyxl absent from sandbox; the SpreadsheetML subset used — shared
  strings, inline strings, numeric cells — is ECMA-376 public spec);
* ``hf:``/``ms:`` -> network + datasets lib stubbed behind import-try, BUT a
  local ``datasets.save_to_disk`` directory (Arrow IPC stream files +
  state.json, a public on-disk layout) is read natively & distributed via
  pyarrow inside mapInPandas — one task per .arrow shard;
* ClickHouse/MyScale -> JDBC reader/writer stub (jar not in sandbox) with the
  same system-column contract (pipeline_id/task_id/raw_data_id lineage).

``read_any``/``write_any`` dispatch on extension exactly like the reference's
cache_type dispatch, so pipeline configs port 1:1.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_READERS = {
    "jsonl": lambda sp, p, schema: _json(sp, p, schema),
    "json": lambda sp, p, schema: _json(sp, p, schema),
    "csv": lambda sp, p, schema: sp.read.option("header", "true")
    .schema(schema)
    .csv(p)
    if schema
    else sp.read.option("header", "true").option("inferSchema", "true").csv(p),
    "parquet": lambda sp, p, schema: sp.read.parquet(p),
    "pkl": lambda sp, p, schema: read_pickle(sp, p),
    "pickle": lambda sp, p, schema: read_pickle(sp, p),
    "xlsx": lambda sp, p, schema: read_xlsx(sp, p),
}


def _json(spark: SparkSession, path: str, schema):
    r = spark.read
    if schema:
        r = r.schema(schema)
    return r.json(path)  # Spark's json source reads JSONL natively


def read_any(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Extension-dispatch read (storage.py:683-696 analogue).  ``hf:``/``ms:``
    prefixes raise with guidance unless the datasets lib is importable."""
    if path.startswith(("hf:", "ms:")):
        return read_hub(spark, path)
    ext = os.path.splitext(path)[1].lstrip(".").lower() or "parquet"
    if ext not in _READERS:
        raise ValueError(
            f"unsupported format {ext!r}; use "
            "jsonl/json/csv/parquet/pickle/xlsx"
        )
    return _READERS[ext](spark, path, schema)


def write_any(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    ext = os.path.splitext(path)[1].lstrip(".").lower() or "parquet"
    w = df.write.mode(mode)
    if ext in ("jsonl", "json"):
        w.json(path)
    elif ext == "csv":
        w.option("header", "true").csv(path)
    elif ext == "parquet":
        # engine-wide parquet encoding (measured: streaming/pipeline.py
        # SINK_PARQUET_OPTIONS — zstd + plain is 4.2x smaller than
        # snappy+dict at equal encode speed on token-array payloads)
        from dataflow_spark.streaming.pipeline import SINK_PARQUET_OPTIONS

        for k, v in SINK_PARQUET_OPTIONS.items():
            w = w.option(k, v)
        w.parquet(path)
    elif ext in ("pkl", "pickle"):
        write_pickle(df, path)
    elif ext == "xlsx":
        write_xlsx(df, path)
    else:
        raise ValueError(f"unsupported format {ext!r}")


# ---------------------------------------------------------------------------
# Driver-side single-file formats: pickle & xlsx (storage.py:551-552)
# ---------------------------------------------------------------------------
# Both are inherently one-file / one-process formats — the reference reads
# them through pandas on a single machine.  Mirroring that is the honest
# Spark mapping: materialize on the driver, guarded by a row cap so a 100 TB
# table can never be silently funneled through this path.

_DRIVER_FORMAT_MAX_ROWS = 5_000_000


def _driver_cap(df: DataFrame, fmt: str) -> None:
    n = df.limit(_DRIVER_FORMAT_MAX_ROWS + 1).count()
    if n > _DRIVER_FORMAT_MAX_ROWS:
        raise ValueError(
            f"{fmt} is a single-file driver-side format; dataset exceeds "
            f"{_DRIVER_FORMAT_MAX_ROWS} rows — write parquet instead"
        )


def read_pickle(spark: SparkSession, path: str) -> DataFrame:
    """Pandas-pickle source (storage.py:551 pd.read_pickle analogue)."""
    import pandas as pd

    pdf = pd.read_pickle(path)
    return spark.createDataFrame(pdf)


def write_pickle(df: DataFrame, path: str) -> None:
    _driver_cap(df, "pickle")
    df.toPandas().to_pickle(path)


# Minimal SpreadsheetML (ECMA-376) support on the stdlib.  Scope: one
# worksheet, header row, shared/inline strings, numeric cells — exactly the
# subset pandas.read_excel/to_excel exercises for flat tables.

_XLSX_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _col_index(cell_ref: str) -> int:
    """'BC12' -> 0-based column 54."""
    idx = 0
    for ch in cell_ref:
        if ch.isalpha():
            idx = idx * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return idx - 1


def _col_letter(idx: int) -> str:
    s = ""
    idx += 1
    while idx:
        idx, r = divmod(idx - 1, 26)
        s = chr(65 + r) + s
    return s


def read_xlsx(spark: SparkSession, path: str) -> DataFrame:
    """From-scratch xlsx reader (first worksheet, row 1 = header), stdlib
    zipfile + ElementTree; numeric-looking columns come back as double/long
    like csv inferSchema."""
    import xml.etree.ElementTree as ET
    import zipfile

    import pandas as pd

    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_XLSX_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_XLSX_NS}t")))
        sheet_name = next(
            n for n in z.namelist()
            if n.startswith("xl/worksheets/") and n.endswith(".xml")
        )
        root = ET.fromstring(z.read(sheet_name))
        rows: list[dict[int, object]] = []
        for row_el in root.iter(f"{_XLSX_NS}row"):
            row: dict[int, object] = {}
            for c in row_el.findall(f"{_XLSX_NS}c"):
                ref, typ = c.get("r", ""), c.get("t")
                v_el = c.find(f"{_XLSX_NS}v")
                if typ == "inlineStr":
                    is_el = c.find(f"{_XLSX_NS}is")
                    val = "".join(
                        t.text or "" for t in (is_el.iter(f"{_XLSX_NS}t") if is_el is not None else [])
                    )
                elif v_el is None or v_el.text is None:
                    val = None
                elif typ == "s":
                    val = shared[int(v_el.text)]
                elif typ == "str":
                    val = v_el.text
                elif typ == "b":
                    val = v_el.text == "1"
                else:  # numeric
                    f = float(v_el.text)
                    val = int(f) if f.is_integer() and "e" not in v_el.text.lower() and "." not in v_el.text else f
                row[_col_index(ref)] = val
            rows.append(row)
    if not rows:
        raise ValueError(f"xlsx {path!r}: empty sheet")
    header_cells, data = rows[0], rows[1:]
    ncols = max(header_cells) + 1 if header_cells else 0
    names = [str(header_cells.get(i, f"col{i}")) for i in range(ncols)]
    pdf = pd.DataFrame(
        [[r.get(i) for i in range(ncols)] for r in data], columns=names
    )
    return spark.createDataFrame(pdf)


def write_xlsx(df: DataFrame, path: str, sheet: str = "Sheet1") -> None:
    """From-scratch xlsx writer: inline strings + numeric cells, one sheet."""
    import zipfile
    from xml.sax.saxutils import escape

    _driver_cap(df, "xlsx")
    cols = df.columns
    it = [cols] + [[row[c] for c in cols] for row in df.collect()]
    sheet_rows = []
    for ri, vals in enumerate(it, start=1):
        cells = []
        for ci, v in enumerate(vals):
            ref = f"{_col_letter(ci)}{ri}"
            if v is None:
                continue
            if ri > 1 and isinstance(v, bool):
                cells.append(f'<c r="{ref}" t="b"><v>{int(v)}</v></c>')
            elif ri > 1 and isinstance(v, (int, float)):
                cells.append(f'<c r="{ref}"><v>{v!r}</v></c>')
            else:
                cells.append(
                    f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                    f"{escape(str(v))}</t></is></c>"
                )
        sheet_rows.append(f'<row r="{ri}">{"".join(cells)}</row>')
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rel_ns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    pkg_rel_ns = "http://schemas.openxmlformats.org/package/2006/relationships"
    ct = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{pkg_rel_ns}">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{ns}" xmlns:r="{rel_ns}"><sheets>'
        f'<sheet name="{escape(sheet)}" sheetId="1" r:id="rId1"/>'
        "</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{pkg_rel_ns}">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{ns}"><sheetData>{"".join(sheet_rows)}</sheetData></worksheet>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", ct)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)


def parse_hub_spec(path: str) -> dict[str, str | None]:
    """Parse ``hf:dataset[:config][:split]`` / ``ms:dataset[:split]``
    (storage.py:595-621 semantics)."""
    scheme, _, rest = path.partition(":")
    parts = rest.split(":")
    spec = {"hub": scheme, "dataset": parts[0], "config": None, "split": None}
    if scheme == "hf":
        if len(parts) == 2:
            spec["split"] = parts[1]
        elif len(parts) >= 3:
            spec["config"], spec["split"] = parts[1], parts[2]
    else:
        if len(parts) >= 2:
            spec["split"] = parts[1]
    return spec


def read_hub(spark: SparkSession, path: str) -> DataFrame:
    """HuggingFace/ModelScope hub source (storage.py:595-621 analogue).

    Local ``datasets.save_to_disk`` directories are read natively (no
    `datasets` lib needed — see :func:`read_dataset_dir`); remote hub specs
    need network + the `datasets` library, absent from this sandbox."""
    spec = parse_hub_spec(path)
    local = spec["dataset"]
    if local and os.path.isdir(local):
        sub = os.path.join(local, spec["split"] or "")
        return read_dataset_dir(spark, sub if os.path.isdir(sub) else local)
    try:
        import datasets  # type: ignore  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            f"hub source {path!r} parsed as {spec} but the `datasets` library "
            "is not installed in this environment"
        ) from e
    ds = datasets.load_dataset(
        spec["dataset"], spec["config"], split=spec["split"] or "train"
    )
    return spark.createDataFrame(ds.to_pandas())


def read_dataset_dir(spark: SparkSession, path: str) -> DataFrame:
    """Distributed reader for a ``datasets.save_to_disk`` directory — the
    public on-disk layout is Arrow IPC stream shards (``data-*-of-*.arrow``)
    plus ``state.json``/``dataset_info.json``.  No `datasets` dependency:
    each shard is decoded by pyarrow inside ``mapInPandas``, one task per
    shard, so a many-shard dump scales out like any file source.  Schema
    comes from the first shard's IPC header (a driver-side metadata read,
    not a data read)."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.ipc  # noqa: F401
    from pyspark.sql.pandas.types import from_arrow_schema

    shards = sorted(_glob.glob(os.path.join(path, "*.arrow")))
    if not shards:
        raise ValueError(f"{path!r}: no .arrow shards (not a save_to_disk dir?)")
    with pa.ipc.open_stream(shards[0]) as rd:
        arrow_schema = rd.schema
    spark_schema = from_arrow_schema(arrow_schema)

    def _read_shards(batches):
        import pyarrow as pa

        for pdf in batches:
            for shard in pdf["shard"]:
                with pa.ipc.open_stream(shard) as rd:
                    for batch in rd:
                        yield batch.to_pandas()

    paths_df = spark.createDataFrame(
        [(s,) for s in shards], T.StructType([T.StructField("shard", T.StringType())])
    ).repartition(len(shards))
    return paths_df.mapInPandas(_read_shards, schema=spark_schema)


# ---------------------------------------------------------------------------
# ClickHouse/MyScale-style system-column table (JDBC)
# ---------------------------------------------------------------------------

SYSTEM_COLUMNS = ("pipeline_id", "task_id", "raw_data_id")


def with_lineage(
    df: DataFrame, pipeline_id: str, task_id: str, id_col: str = "doc_seq"
) -> DataFrame:
    """Attach the MyScaleDBStorage system columns (storage.py:880-901):
    pipeline/task lineage + stable per-row id."""
    return (
        df.withColumn("pipeline_id", F.lit(pipeline_id))
        .withColumn("task_id", F.lit(task_id))
        .withColumn("raw_data_id", F.col(id_col).cast("long"))
    )


def _is_missing_jdbc_driver(e: Exception) -> bool:
    """True only for the 'driver jar missing' Py4J failures; every other
    JDBC error (auth, DNS, bad table/SQL, bounds probe) is a real error and
    must propagate unchanged."""
    msg = str(e)
    return any(
        s in msg
        for s in (
            "ClassNotFoundException",
            "No suitable driver",
            "JDBC_NO_SUITABLE_DRIVER",
            "Failed to load class",
        )
    )


def jdbc_source(
    spark: SparkSession,
    url: str,
    table: str,
    partition_col: str = "raw_data_id",
    lower_bound: int = 0,
    upper_bound: int | None = None,
    num_partitions: int = 32,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Paged JDBC reader — the Spark-idiomatic analogue of the reference's
    LIMIT/OFFSET page loop (MyScaleDBStorage.read paging, storage.py:833):
    instead of sequential OFFSET pages through one connection, Spark issues
    ``num_partitions`` range-predicate queries on ``partition_col`` in
    parallel (predicate pushdown into ClickHouse), one connection per task.
    ``upper_bound=None`` probes max(partition_col) first, as the reference's
    count query does.  Driver jar not in sandbox — raises with the launch
    flag; the partitioning contract is documented here and the option
    construction is unit-tested."""
    try:
        r = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("dbtable", table)
            .option("partitionColumn", partition_col)
            .option("numPartitions", str(num_partitions))
        )
        if upper_bound is None:
            probe = (
                spark.read.format("jdbc")
                .option("url", url)
                .option(
                    "dbtable",
                    f"(SELECT max({partition_col}) AS hi FROM {table}) t",
                )
                .load()
            )
            upper_bound = int(probe.first()["hi"] or 0) + 1
        r = r.option("lowerBound", str(lower_bound)).option(
            "upperBound", str(upper_bound)
        )
        for k, v in (options or {}).items():
            r = r.option(k, v)
        return r.load()
    except NotImplementedError:
        raise
    except Exception as e:
        if _is_missing_jdbc_driver(e):  # pragma: no cover - jar absent in sandbox
            raise NotImplementedError(
                "JDBC driver jar not on classpath; launch with "
                "spark-submit --jars clickhouse-jdbc.jar (or add "
                "spark.jars.packages=com.clickhouse:clickhouse-jdbc)"
            ) from e
        raise  # auth / network / bad-SQL errors propagate as themselves


def jdbc_sink(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    options: dict[str, str] | None = None,
) -> None:
    """JDBC writer (ClickHouse/MyScale target).  Driver jar not in sandbox —
    raises with the exact spark-submit flag needed; the DataFrame-side
    contract (lineage columns, append semantics) is what's tested."""
    try:
        w = df.write.format("jdbc").option("url", url).option("dbtable", table)
        for k, v in (options or {}).items():
            w = w.option(k, v)
        w.mode(mode).save()
    except Exception as e:
        if _is_missing_jdbc_driver(e):  # pragma: no cover - jar absent in sandbox
            raise NotImplementedError(
                "JDBC driver jar not on classpath; launch with "
                "spark-submit --jars clickhouse-jdbc.jar (or add "
                "spark.jars.packages=com.clickhouse:clickhouse-jdbc)"
            ) from e
        raise
