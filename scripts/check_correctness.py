"""Driver-mimicking correctness harness: run every queries() entry on Spark
and its oracle_sql() on DuckDB, compare row count + column names +
order-insensitive value hash. Usage:

    python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

sys.path.insert(0, ".")


def canon_value(v) -> str:
    if v is None:
        return "<null>"
    if hasattr(v, "item"):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def frame_hash(pdf) -> tuple[int, list[str], str]:
    cols = sorted(pdf.columns)
    rows = sorted(
        "\x1f".join(canon_value(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )
    h = hashlib.md5("\n".join(rows).encode()).hexdigest()
    return len(pdf), cols, h


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from pdf_parser_spark.session import get_spark

    spark = get_spark(cores=8, app_name="check_correctness", shuffle_partitions=16)
    qs, osql = entrymod.queries(), entrymod.oracle_sql()

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        sql = osql.get(name)
        if sql is None:
            print(f"rows-only {name}: {len(got)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            continue
        gn, gc, gh = frame_hash(got)
        wn, wc, wh = frame_hash(want)
        ok = (gn, gc, gh) == (wn, wc, wh)
        status = "ok  " if ok else "FAIL"
        print(
            f"{status} {name}: spark {gn} rows / duck {wn} rows, "
            f"cols {'=' if gc == wc else f'{gc} vs {wc}'}, hash "
            f"{'=' if gh == wh else f'{gh[:8]} vs {wh[:8]}'} ({time.time()-t0:.1f}s)"
        )
        if not ok:
            failures.append(name)

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
