"""pdf_parser_spark — a PySpark-native reimplementation of the extraction
semantics of MayankNinaniya725/PDF_Parser (reference at /root/reference).

The engine reads an Iceberg/parquet table of interleaved text+media documents
``documents(doc_id string, vendor string, file_hash string,
spans array<struct<kind,text,media_ref,offset>>)`` and emits ordered span
sequences plus the reference's reporting tables, all as DataFrame ops +
Arrow-vectorized UDFs (zero per-row Python at the Spark API level).

Layout:
  configs      — the five vendor extraction "programs" (declarative regex configs)
  kernel       — pure-Python per-page extraction semantics (single source of
                 truth, shared by the Arrow UDF and the pytest oracle)
  corpus       — deterministic synthetic corpus generator (seeded)
  oracle       — pure-Python corpus-level reference implementation
  extraction/  — the Spark pipeline (explode → page agg → kernel UDF →
                 fan-out/dedup/unpivot/stats/master-log)
  analytics/   — corpus analytics + training-data ops (dedup, similarity,
                 text quality) with DuckDB-checkable SQL oracles
"""

__version__ = "0.1.0"
