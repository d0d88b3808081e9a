"""Registry-wide output-dtype audit (round-3 verdict task 2).

The three round-3 driver hash mismatches (volume_shipping,
returned_top_customers, referential_integrity) were all caused by
version-sensitive dtype canonicalization, not engine semantics: an
uncast DuckDB aggregate yields HUGEINT (whose pandas conversion differs
across DuckDB releases), and raw-double output columns expose
half-up/half-even drift. This audit makes that whole divergence class a
suite failure:

* every oracle's BOUND output types (``DESCRIBE <sql>`` — binder only,
  no execution) must avoid HUGEINT / UHUGEINT / DECIMAL entirely;
* every Spark plan's output schema must avoid DECIMAL;
* per column, the oracle's type class must equal the Spark type class
  (int-like vs string vs boolean vs float vs date vs timestamp), so the
  driver's pandas canonicalization sees the same dtype family from both
  engines regardless of library version.

Only one DuckDB build ships in this sandbox (1.0.0 — a second version
cannot be installed), so cross-version execution is not testable here;
binding-level type hygiene is the enforceable superset: the dtypes that
varied across versions are exactly the ones this audit forbids.
"""

from __future__ import annotations

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# DuckDB logical type -> comparison class. Anything absent (HUGEINT,
# UHUGEINT, DECIMAL(...), LIST, STRUCT, ...) is a failure.
_ORACLE_CLASS = {
    "BIGINT": "int",
    "INTEGER": "int",
    "SMALLINT": "int",
    "TINYINT": "int",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "DOUBLE": "float",
    "FLOAT": "float",
    "DATE": "date",
    "TIMESTAMP": "ts",
}

_SPARK_CLASS = {
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


@pytest.fixture(scope="module")
def registry(spark):
    import __spark_entry__ as entry

    return entry.queries(), entry.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def test_registry_output_dtypes_aligned(spark, registry, duck):
    qs, osql = registry
    problems: list[str] = []
    for name, fn in qs.items():
        sql = osql.get(name)
        stypes = {
            f.name: f.dataType.simpleString()
            for f in fn(spark, SF_DIR).schema.fields
        }
        for col, st in stypes.items():
            if st not in _SPARK_CLASS:
                problems.append(f"{name}: spark col {col} has dtype {st}")
        if sql is None:
            continue
        otypes = dict(
            (row[0], row[1]) for row in duck.sql("DESCRIBE " + sql).fetchall()
        )
        if set(otypes) != set(stypes):
            problems.append(
                f"{name}: column names differ — spark-only "
                f"{sorted(set(stypes) - set(otypes))}, oracle-only "
                f"{sorted(set(otypes) - set(stypes))}"
            )
            continue
        for col, ot in otypes.items():
            if ot not in _ORACLE_CLASS:
                problems.append(
                    f"{name}: oracle col {col} binds to {ot} "
                    f"(version-sensitive pandas dtype — cast it)"
                )
            elif _ORACLE_CLASS[ot] != _SPARK_CLASS.get(stypes[col]):
                problems.append(
                    f"{name}: col {col} class mismatch — oracle {ot} vs "
                    f"spark {stypes[col]}"
                )
    assert not problems, "\n".join(problems)
