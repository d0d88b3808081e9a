"""One-shot probe: for every registry query, compare the DuckDB oracle's
bound output types (DESCRIBE, no execution) against the Spark plan's
schema, and flag the dtype classes that caused the round-3 driver hash
mismatches (HUGEINT / DECIMAL on the oracle side, unmatched numeric
classes across engines). Findings feed tests/test_oracle_dtypes.py."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.001"

# DuckDB logical type -> comparison class
ORACLE_CLASS = {
    "BIGINT": "int",
    "INTEGER": "int",
    "SMALLINT": "int",
    "TINYINT": "int",
    "UBIGINT": "int",
    "UINTEGER": "int",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "DOUBLE": "float",
    "FLOAT": "float",
    "DATE": "date",
    "TIMESTAMP": "ts",
    "HUGEINT": "FORBIDDEN:HUGEINT",
    "UHUGEINT": "FORBIDDEN:UHUGEINT",
}

SPARK_CLASS = {
    "bigint": "int",
    "int": "int",
    "smallint": "int",
    "tinyint": "int",
    "string": "str",
    "boolean": "bool",
    "double": "float",
    "float": "float",
    "date": "date",
    "timestamp": "ts",
    "timestamp_ntz": "ts",
}


def oracle_class(t: str) -> str:
    if t.startswith("DECIMAL"):
        return "FORBIDDEN:" + t
    return ORACLE_CLASS.get(t, "UNKNOWN:" + t)


def spark_class(t: str) -> str:
    if t.startswith("decimal"):
        return "FORBIDDEN:" + t
    return SPARK_CLASS.get(t, "UNKNOWN:" + t)


def main():
    import duckdb

    import __spark_entry__ as entry
    from pdf_parser_spark.session import get_spark

    spark = get_spark(cores=8, app_name="audit_dtypes", shuffle_partitions=8)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, osql = entry.queries(), entry.oracle_sql()
    problems = []
    for name, fn in qs.items():
        sql = osql.get(name)
        try:
            sdf = fn(spark, SF_DIR)
            stypes = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
        except Exception as e:
            problems.append((name, f"spark build error: {type(e).__name__}: {e}"))
            continue
        if sql is None:
            continue
        try:
            desc = con.sql("DESCRIBE " + sql).fetchall()
        except Exception as e:
            problems.append((name, f"duckdb describe error: {type(e).__name__}: {e}"))
            continue
        otypes = {row[0]: row[1] for row in desc}
        if set(otypes) != set(stypes):
            problems.append(
                (name, f"column-name mismatch: spark-only "
                       f"{sorted(set(stypes)-set(otypes))}, oracle-only "
                       f"{sorted(set(otypes)-set(stypes))}")
            )
            continue
        for col, ot in otypes.items():
            oc, sc = oracle_class(ot), spark_class(stypes[col])
            if oc.startswith(("FORBIDDEN", "UNKNOWN")):
                problems.append((name, f"oracle col {col}: {ot} ({oc})"))
            if sc.startswith(("FORBIDDEN", "UNKNOWN")):
                problems.append((name, f"spark col {col}: {stypes[col]} ({sc})"))
            if not oc.startswith(("F", "U")) and not sc.startswith(("F", "U")) and oc != sc:
                problems.append(
                    (name, f"class mismatch col {col}: oracle {ot} vs "
                           f"spark {stypes[col]}")
                )

    print(f"\n=== {len(problems)} problems across {len(qs)} queries ===")
    for name, msg in problems:
        print(f"{name}: {msg}")


if __name__ == "__main__":
    main()
