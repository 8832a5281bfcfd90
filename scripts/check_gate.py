"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at the given sf, compare row count,
column names, and an order-insensitive value hash."""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod  # noqa: E402
from graph500_bfs_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(repr(r[i]) for i in order) for r in rows
    )
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def norm(v):
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None)
    return v


def main(sf_dir: str, only: set[str] | None = None):
    spark = get_spark(app_name="check_gate")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(norm(v) for v in r) for r in sdf.collect()]
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"  {name}: rows-only check, {len(srows)} rows ({t_spark:.1f}s)")
            continue
        t0 = time.time()
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = [tuple(norm(v) for v in r) for r in res.fetchall()]
        t_duck = time.time() - t0
        ok_count = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        ok_hash = value_hash(srows, scols) == value_hash(orows, ocols)
        status = "OK" if (ok_count and ok_cols and ok_hash) else "FAIL"
        print(
            f"  {name}: {status} rows={len(srows)}/{len(orows)} cols={scols}/{ocols} "
            f"hash_match={ok_hash} (spark {t_spark:.1f}s, duck {t_duck:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            sset, oset = set(srows), set(orows)
            print("    spark-only:", list(sset - oset)[:3])
            print("    duck-only:", list(oset - sset)[:3])
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all gate queries match")


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
        set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None,
    )
