"""URL-level crawl operators: canonicalization, URL dedup, blocklist gate.

A web-crawl corpus keys documents by URL, and three URL-level stages run
before any text processing (CCNet/C4/RefinedWeb all apply them):

  * ``url_canonicalize`` — normalize each fetched URL to its canonical
    form: strip the fragment, lowercase scheme+host, drop the leading
    ``www.``, drop default ports (http:80 / https:443), collapse
    trailing slashes, remove tracking parameters (``utm_*``, ``fbclid``,
    ``gclid``) and sort the remaining query parameters so two fetches of
    the same resource compare equal as strings.
  * ``url_dedup``        — keep exactly one fetch per canonical URL
    (earliest fetch_ts wins, doc_id tiebreak): the refetch-collapse
    every crawl snapshot runs before content dedup ever sees the bytes.
  * ``url_host_gate``    — broadcast blocklist join on the canonical
    host (the UT1/robots-style domain filter).

Reference analog: the upload path's duplicate-file admission and
filename normalization (reference ``extractor/views/core.py:630-644``,
``utils/helpers.py`` sanitize) — the same admit-once-by-key semantics,
re-expressed over crawl URLs, which is what the key IS in a web corpus.

Cross-engine design: every rule is structural string surgery —
``split_part`` / ``lower`` / HOF filter+sort over the split query
string — with IDENTICAL semantics in Spark and DuckDB (both define
``split_part`` as 1-based with '' for a missing part; both sort string
arrays bytewise), so the oracle recomputes canonicalization from raw
URLs independently. The one regex used (``'/+$'`` trailing-slash strip)
means the same thing under Java regex and RE2.

Scale shape (100 TB):

  * ``url_canonicalize`` is an embarrassingly parallel scan — one
    whole-stage-codegen projection, no shuffle, no UDF, no join.
  * ``url_dedup`` shuffles the slim (canon_url, fetch_ts, doc_id) frame
    once for a min-struct hash aggregate (map-side partial), then joins
    the winner set back by the same key so AQE reuses the exchange —
    the H3/paragraph_dedup shape, NOT a window over canon_url (a viral
    URL refetched billions of times would serialize into one task).
  * ``url_host_gate`` broadcasts the blocklist (a few MB for even the
    full UT1 set) — zero shuffle on the corpus side.

Fixture: URLs are generated deterministically from canonical specs and
then "messed up" (case, ports, www, fragments, tracking params, param
order), so canonicalization provably inverts the messing transform and
``url_dedup`` has real refetch groups — no vacuous green.
"""

from __future__ import annotations

import os
import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .datapipe import CACHE_DIR

URL_VER = "u2"

TRACKING_EXACT = ("fbclid", "gclid")
# utm_* is matched by prefix in both engines.

_HOST_NAMES = (
    "steelworks", "millreports", "certarchive", "batchdata", "qualitylab",
    "alloyinfo", "spamlinkfarm", "adspamhub", "plateindex", "tensiledb",
)
_BLOCKED_MARK = "spam"  # hosts whose name contains this are blocklisted
_TLDS = (".example.com", ".example.org", ".example.net")
_SEGS = ("reports", "certs", "batch", "2024", "archive", "mill", "q3", "data")
_REAL_PARAMS = ("id", "page", "q", "lang", "rev")
_TRACK_PARAMS = ("utm_source", "utm_medium", "utm_campaign", "fbclid", "gclid")


def _canon_spec(rnd: random.Random) -> dict:
    """One canonical URL spec: scheme, host (no www, lowercase), path
    segments, sorted real query params."""
    scheme = rnd.choice(("http", "https"))
    host = rnd.choice(_HOST_NAMES) + str(rnd.randrange(40)) + rnd.choice(_TLDS)
    segs = [rnd.choice(_SEGS) for _ in range(rnd.randint(0, 3))]
    params = sorted(
        f"{p}={rnd.randrange(100)}"
        for p in rnd.sample(_REAL_PARAMS, rnd.randint(0, 3))
    )
    return {"scheme": scheme, "host": host, "segs": segs, "params": params}


def canon_of(spec: dict) -> str:
    """The canonical string for a spec — the form the operator must emit."""
    path = "".join("/" + s for s in spec["segs"])
    q = "&".join(spec["params"])
    return (
        spec["scheme"] + "://" + spec["host"] + path + (("?" + q) if q else "")
    )


def _mess_up(spec: dict, rnd: random.Random) -> str:
    """A raw fetched URL for a spec: canonical content + crawl noise."""
    scheme, host = spec["scheme"], spec["host"]
    if rnd.random() < 0.25:
        scheme = scheme.upper() if rnd.random() < 0.5 else scheme.capitalize()
    if rnd.random() < 0.3:
        host = "www." + host
    if rnd.random() < 0.25:
        host = "".join(
            c.upper() if rnd.random() < 0.4 else c for c in host
        )
    port = ""
    if rnd.random() < 0.2:
        port = ":80" if spec["scheme"] == "http" else ":443"
    path = "".join("/" + s for s in spec["segs"])
    if rnd.random() < 0.3:
        path += "/" * rnd.randint(1, 2)
    params = list(spec["params"])
    for _ in range(rnd.randint(0, 2)):
        p = rnd.choice(_TRACK_PARAMS)
        val = (
            f"{p}={rnd.randrange(1000)}" if not p.startswith("utm_")
            else f"{p}=src{rnd.randrange(50)}"
        )
        params.insert(rnd.randrange(len(params) + 1), val)
    rnd.shuffle(params)
    q = "&".join(params)
    frag = f"#sec{rnd.randrange(9)}" if rnd.random() < 0.25 else ""
    return scheme + "://" + host + port + path + (("?" + q) if q else "") + frag


def gen_url_doc(i: int, n_specs: int, seed: int = 37) -> dict:
    """One fixture row. Spec choice is skewed (i % n_specs on a squared
    draw) so some canonical URLs collect many refetches. Returns the
    canonical form too for tests; only (doc_id, url, fetch_ts) is written."""
    rnd = random.Random((seed << 32) ^ i)
    spec_id = int((rnd.random() ** 2) * n_specs)  # skew toward low ids
    spec = _canon_spec(random.Random((seed << 16) ^ spec_id))
    return {
        "doc_id": f"U{i:06d}",
        "url": _mess_up(spec, rnd),
        "fetch_ts": 1_700_000_000 + ((i * 2654435761) % 10_000_000),
        "canon": canon_of(spec),
    }


def url_docs_for_sf(sf: float) -> int:
    return max(120, int(round(sf * 40000)))


def url_path(sf: str) -> str:
    return str(CACHE_DIR / f"urldocs_{URL_VER}_sf{sf}.parquet")


def blocklist_path(sf: str) -> str:
    return str(CACHE_DIR / f"urlblock_{URL_VER}_sf{sf}.parquet")


def ensure_url_corpus(sf: str) -> None:
    CACHE_DIR.mkdir(exist_ok=True)
    if os.path.exists(url_path(sf)) and os.path.exists(blocklist_path(sf)):
        return
    import pandas as pd

    n = url_docs_for_sf(float(sf))
    n_specs = max(30, n // 3)  # ~3 fetches per canonical URL on average
    docs = [gen_url_doc(i, n_specs) for i in range(n)]
    pd.DataFrame(docs)[["doc_id", "url", "fetch_ts"]].to_parquet(
        url_path(sf), index=False
    )
    hosts = sorted(
        {
            d["canon"].split("://")[1].split("/")[0].split("?")[0]
            for d in docs
        }
    )
    blocked = [h for h in hosts if _BLOCKED_MARK in h]
    pd.DataFrame({"host": blocked}).to_parquet(blocklist_path(sf), index=False)


def _urls(spark, sf_dir: str) -> DataFrame:
    from .driver_contract import sf_of

    sf = sf_of(sf_dir)
    ensure_url_corpus(sf)
    return spark.read.parquet(url_path(sf)).repartition(
        spark.sparkContext.defaultParallelism
    )


def _with_canon(df: DataFrame) -> DataFrame:
    """Add (canon_url, host) to a frame carrying a raw `url` column.

    Staged projections, the q_simhash device: each intermediate alias is
    non-cheap and referenced more than once downstream, so CollapseProject
    keeps the stage barriers — the split chains are computed ONCE per row
    and the whole-stage-codegen unit stays small (a single collapsed
    projection here inlines every split chain 3-4x, which costs ~7 s of
    Janino compile on first run and bloats per-row work if any subtree
    escapes runtime CSE). Unused stages column-prune away for consumers
    that only need `host`."""
    u = F.split_part(F.col("url"), F.lit("#"), F.lit(1))  # strip fragment
    s1 = df.select("*", u.alias("_u"))
    s2 = s1.select(
        "*",
        F.lower(F.split_part(F.col("_u"), F.lit("://"), F.lit(1))).alias(
            "_scheme"
        ),
        F.split_part(F.col("_u"), F.lit("://"), F.lit(2)).alias("_rest"),
    )
    # authority ends at the first '/' OR '?' (a query can follow the host
    # directly, with no path: http://host?q=1)
    hostport = F.split_part(
        F.split_part(F.col("_rest"), F.lit("/"), F.lit(1)),
        F.lit("?"),
        F.lit(1),
    )
    s3 = s2.select("*", hostport.alias("_hp"))
    s4 = s3.select(
        "*",
        F.substring(F.col("_rest"), F.length("_hp") + 1, 1_000_000).alias(
            "_pathq"
        ),
        F.lower(F.split_part(F.col("_hp"), F.lit(":"), F.lit(1))).alias(
            "_host0"
        ),
        F.split_part(F.col("_hp"), F.lit(":"), F.lit(2)).alias("_port"),
    )
    host = F.when(
        F.col("_host0").startswith("www."),
        F.substring("_host0", 5, 1_000_000),
    ).otherwise(F.col("_host0"))
    keep_port = ~(
        (F.col("_port") == "")
        | ((F.col("_scheme") == "http") & (F.col("_port") == "80"))
        | ((F.col("_scheme") == "https") & (F.col("_port") == "443"))
    )
    portpart = F.when(
        keep_port, F.concat(F.lit(":"), F.col("_port"))
    ).otherwise(F.lit(""))
    path = F.regexp_replace(
        F.split_part(F.col("_pathq"), F.lit("?"), F.lit(1)), "/+$", ""
    )
    qs = F.split_part(F.col("_pathq"), F.lit("?"), F.lit(2))
    kept = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "")
            & ~F.split_part(p, F.lit("="), F.lit(1)).startswith("utm_")
            & ~F.split_part(p, F.lit("="), F.lit(1)).isin(*TRACKING_EXACT),
        )
    )
    s5 = s4.select(
        "*",
        host.alias("host"),
        portpart.alias("_portpart"),
        path.alias("_path"),
        kept.alias("_kept"),
    )
    qpart = F.when(
        F.size("_kept") > 0,
        F.concat(F.lit("?"), F.array_join("_kept", "&")),
    ).otherwise(F.lit(""))
    canon = F.concat(
        F.col("_scheme"), F.lit("://"), F.col("host"), F.col("_portpart"),
        F.col("_path"), qpart,
    )
    return s5.select("*", canon.alias("canon_url")).drop(
        "_u", "_scheme", "_rest", "_hp", "_pathq", "_host0", "_port",
        "_portpart", "_path", "_kept",
    )


def q_url_canonicalize(spark, sf_dir):
    """Canonical URL per fetch: one no-shuffle whole-stage-codegen scan."""
    docs = _with_canon(_urls(spark, sf_dir))
    return docs.select(
        "doc_id",
        "url",
        "canon_url",
        "host",
        (F.col("canon_url") != F.col("url")).alias("changed"),
    )


def _sql_canon_exprs() -> tuple[str, str]:
    """DuckDB expressions (canon_url, host) over column `url` — the same
    structural surgery, written in DuckDB's list/HOF dialect."""
    u = "split_part(url, '#', 1)"
    scheme = f"lower(split_part({u}, '://', 1))"
    rest = f"split_part({u}, '://', 2)"
    hostport = f"split_part(split_part({rest}, '/', 1), '?', 1)"
    pathq = f"substr({rest}, length({hostport}) + 1)"
    host0 = f"lower(split_part({hostport}, ':', 1))"
    host = (
        f"CASE WHEN starts_with({host0}, 'www.') "
        f"THEN substr({host0}, 5) ELSE {host0} END"
    )
    port = f"split_part({hostport}, ':', 2)"
    portpart = (
        f"CASE WHEN {port} = '' OR ({scheme} = 'http' AND {port} = '80') "
        f"OR ({scheme} = 'https' AND {port} = '443') "
        f"THEN '' ELSE ':' || {port} END"
    )
    path = f"regexp_replace(split_part({pathq}, '?', 1), '/+$', '')"
    qs = f"split_part({pathq}, '?', 2)"
    kept = (
        f"list_sort(list_filter(string_split({qs}, '&'), "
        f"p -> p <> '' AND NOT starts_with(split_part(p, '=', 1), 'utm_') "
        f"AND split_part(p, '=', 1) NOT IN "
        f"({', '.join(repr(t) for t in TRACKING_EXACT)})))"
    )
    qpart = (
        f"CASE WHEN len({kept}) > 0 "
        f"THEN '?' || array_to_string({kept}, '&') ELSE '' END"
    )
    canon = f"{scheme} || '://' || {host} || {portpart} || {path} || {qpart}"
    return canon, host


def _sql_url_canonicalize(sf: str) -> str:
    ensure_url_corpus(sf)
    canon, host = _sql_canon_exprs()
    return f"""
SELECT doc_id, url,
       {canon} AS canon_url,
       {host} AS host,
       ({canon} <> url) AS changed
FROM read_parquet('{url_path(sf)}')
"""


def q_url_dedup(spark, sf_dir):
    """Refetch collapse: one winner per canonical URL (min fetch_ts,
    doc_id tiebreak); every fetch carries its winner + kept flag.

    Scale shape: min-STRUCT hash aggregate on canon_url (map-side
    partial combine — a billion-refetch viral URL collapses inside each
    map task first), then an equi-join back on the same key; never a
    window over canon_url."""
    c = _with_canon(_urls(spark, sf_dir)).select(
        "doc_id", "fetch_ts", "canon_url"
    )
    winners = c.groupBy("canon_url").agg(
        F.min(F.struct("fetch_ts", "doc_id")).alias("w")
    )
    return (
        c.join(winners, "canon_url")
        .select(
            "doc_id",
            "canon_url",
            F.col("w.doc_id").alias("winner_doc"),
            (F.col("doc_id") == F.col("w.doc_id")).alias("kept"),
        )
    )


def _sql_url_dedup(sf: str) -> str:
    ensure_url_corpus(sf)
    canon, _host = _sql_canon_exprs()
    return f"""
WITH c AS (
  SELECT doc_id, fetch_ts, {canon} AS canon_url
  FROM read_parquet('{url_path(sf)}')
), w AS (
  SELECT canon_url, doc_id AS winner_doc
  FROM (
    SELECT canon_url, doc_id,
           row_number() OVER (PARTITION BY canon_url
                              ORDER BY fetch_ts, doc_id) AS rn
    FROM c
  ) WHERE rn = 1
)
SELECT c.doc_id, c.canon_url, w.winner_doc,
       (c.doc_id = w.winner_doc) AS kept
FROM c JOIN w USING (canon_url)
"""


def q_url_host_gate(spark, sf_dir):
    """Blocklist gate: canonical host joined against the broadcast
    blocklist; emits the keep/block decision per fetch. Zero corpus-side
    shuffle — the blocklist (UT1-scale: a few MB) ships to every task."""
    from .driver_contract import sf_of

    docs = _urls(spark, sf_dir)
    block = spark.read.parquet(blocklist_path(sf_of(sf_dir))).withColumn(
        "blocked", F.lit(True)
    )
    return (
        _with_canon(docs).select("doc_id", "host")
        .join(F.broadcast(block), "host", "left")
        .select(
            "doc_id",
            "host",
            F.coalesce("blocked", F.lit(False)).alias("blocked"),
        )
    )


def _sql_url_host_gate(sf: str) -> str:
    ensure_url_corpus(sf)
    _canon, host = _sql_canon_exprs()
    return f"""
WITH d AS (
  SELECT doc_id, {host} AS host
  FROM read_parquet('{url_path(sf)}')
)
SELECT d.doc_id, d.host,
       (b.host IS NOT NULL) AS blocked
FROM d LEFT JOIN read_parquet('{blocklist_path(sf)}') b USING (host)
"""


URL_QUERIES = {
    "url_canonicalize": (q_url_canonicalize, _sql_url_canonicalize),
    "url_dedup": (q_url_dedup, _sql_url_dedup),
    "url_host_gate": (q_url_host_gate, _sql_url_host_gate),
}
