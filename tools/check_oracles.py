"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at a given sf, compare
row-count + schema-insensitive sorted value hash."""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(rows, cols):
    cols_sorted = sorted(cols)
    canon = sorted(
        tuple(str(r[c]) for c in cols_sorted) for r in rows
    )
    h = hashlib.md5()
    for row in canon:
        h.update("|".join(row).encode())
    return h.hexdigest()


def main(sf_dir="/root/testdata/sf0.01", only=None):
    import __spark_entry__ as entrymod
    from dataflow_spark.session import get_spark

    spark = get_spark(app_name="oracle_check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [r.asDict() for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            ddf = con.execute(oracles[name]).fetch_arrow_table()
            drows = [
                {c: row[i] for i, c in enumerate(ddf.column_names)}
                for row in zip(*[col.to_pylist() for col in ddf.columns])
            ] if ddf.num_rows else []
            dcols = ddf.column_names
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error {str(e)[:300]}")
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema {sorted(scols)} vs {sorted(dcols)}")
        elif value_hash(srows, scols) != value_hash(drows, dcols):
            problems.append("value-hash mismatch")
            # show a sample diff
            sset = {tuple(str(r[c]) for c in sorted(scols)) for r in srows}
            dset = {tuple(str(r[c]) for c in sorted(dcols)) for r in drows}
            so = list(sset - dset)[:3]
            do = list(dset - sset)[:3]
            problems.append(f"spark-only={so} duck-only={do}")
        if problems:
            failures.append((name, "; ".join(p for p in problems)))
            print(f"FAIL {name}: {'; '.join(str(p)[:400] for p in problems)}")
        else:
            print(f"ok   {name}: {len(srows)} rows match")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} ok")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    only = set(sys.argv[2:]) or None
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01", only))
