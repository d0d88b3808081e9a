"""HTML boilerplate strip / DOM-heuristic main-content extraction.

The north rule's pipeline is "HTML boilerplate strip, PDF/layout parse,
DOM heuristics"; the reference repo covers only the PDF half
(/root/reference/extractor/ — pdfplumber-based), so this module supplies
the HTML half from published work: the densitometric text-block
classifier of Kohlschütter, Fankhauser & Nejdl, *Boilerplate Detection
using Shallow Text Features* (WSDM 2010) — the decision tree known as
boilerpipe's ``NumWordsRulesClassifier``, which labels each text block
content/boilerplate from (word count, link density) of the block and its
two neighbors. The rule constants (0.333333 / 0.555556 / 16 / 15 / 4 /
40 / 17) are the paper's; both implementations here are written from
that spec, no third-party code.

Input: ``html_docs(doc_id string, html string)``.

Two implementations, differentially checked:

  * ``py_blocks`` / ``py_main_text`` — pure-Python spec (the oracle;
    materialized to parquet for the driver's DuckDB compare);
  * ``spark_blocks`` / ``spark_main_text`` — the engine: 100% JVM
    expressions (``split`` on block tags → ``posexplode`` →
    regexp/HOF feature columns → one window partitioned by doc) — no
    Python UDF anywhere on this path.

DOM model (documented tokenizer contract, shared by both sides):

  * Block segmentation splits on block-level open/close tags
    (p/div/h1..h6/li/ul/ol/table/tr/td/th/header/footer/nav/aside/
    article/section/blockquote/br). Inline markup (``a``/``b``/``i``/
    ``span``/``em``) stays inside its block.
  * Attribute values must not contain ``>`` (true of the generator; a
    production ingest normalizes or pre-parses first — the classifier is
    agnostic to how blocks were produced).
  * Entities: only ``&lt; &gt; &amp;`` are decoded.
  * Blocks with zero words after tag-stripping are segmentation
    artifacts and are dropped before sequencing (boilerpipe likewise
    never emits empty blocks).

Scale shape (100 TB): tokenize/feature columns are per-row JVM work
fused into the scan; the only exchange is one hash partition by
``doc_id`` feeding the neighbor window + the per-doc reassembly
aggregate. Window/aggregate state is bounded by blocks-per-document
(pages × paragraphs, thousands at worst), so the giant-document tail is
bounded the same way the extraction pipeline's page salt bounds it —
and the block rows of a giant doc still fan out across cores for the
feature stage before converging for its window.
"""

from __future__ import annotations

import os
import random
import re
from pathlib import Path

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CACHE_DIR = Path(__file__).resolve().parent.parent / ".cache"

# Bump to invalidate the cached corpus + expected outputs.
HTML_VER = "h1"

BLOCK_SPLIT_RE = (
    r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|header|footer|nav|"
    r"aside|article|section|blockquote|br)(?:\s[^>]*)?/?>"
)
ANCHOR_RE = r"(?is)<a\b[^>]*>(.*?)</a>"
TAG_RE = r"<[^>]+>"

_PY_BLOCK_SPLIT = re.compile(BLOCK_SPLIT_RE)
_PY_ANCHOR = re.compile(ANCHOR_RE)
_PY_TAG = re.compile(TAG_RE)


# --- shared spec: cleaning + word counting -----------------------------------


def _py_clean(s: str) -> str:
    """Strip tags, decode the 3 entities, collapse whitespace."""
    s = _PY_TAG.sub(" ", s)
    s = s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")
    return " ".join(s.split())


def _py_wc(s: str) -> int:
    return len(s.split())


def _clean_col(c):
    c = F.regexp_replace(c, TAG_RE, " ")
    c = F.regexp_replace(c, "&lt;", "<")
    c = F.regexp_replace(c, "&gt;", ">")
    c = F.regexp_replace(c, "&amp;", "&")
    return F.array_join(F.split(F.trim(c), r"\s+"), " ")


def _wc_col(clean):
    """Word count of an already-cleaned (single-spaced) string column."""
    return F.when(clean == "", F.lit(0)).otherwise(F.size(F.split(clean, " ")))


# --- the WSDM'10 classifier ---------------------------------------------------


def _py_classify(prev_w, prev_ld, cur_w, cur_ld, next_w) -> bool:
    """NumWordsRulesClassifier (Kohlschütter et al., WSDM 2010, §6)."""
    if cur_ld > 0.333333:
        return False
    if prev_ld <= 0.555556:
        if cur_w <= 16:
            if next_w <= 15:
                return prev_w > 4
            return True
        return True
    if cur_w <= 40:
        return next_w > 17
    return True


def _classify_col(prev_w, prev_ld, cur_w, cur_ld, next_w):
    return (
        F.when(cur_ld > 0.333333, F.lit(False))
        .when(
            prev_ld <= 0.555556,
            F.when(
                cur_w <= 16,
                F.when(next_w <= 15, prev_w > 4).otherwise(F.lit(True)),
            ).otherwise(F.lit(True)),
        )
        .otherwise(F.when(cur_w <= 40, next_w > 17).otherwise(F.lit(True)))
    )


# --- pure-Python oracle -------------------------------------------------------


def py_blocks(docs: list[dict]) -> list[dict]:
    """(doc_id, seq, words, link_words, link_density, label, text) rows."""
    rows = []
    for doc in sorted(docs, key=lambda d: d["doc_id"]):
        feats = []
        for raw in _PY_BLOCK_SPLIT.split(doc["html"]):
            text = _py_clean(raw)
            words = _py_wc(text)
            if words == 0:
                continue
            # One clean+count over the space-joined anchor bodies: the join
            # can't merge tokens (space-separated) or form new tags (raw '<'
            # only opens tags on this input — entities carry literal '<').
            link_words = _py_wc(_py_clean(" ".join(_PY_ANCHOR.findall(raw))))
            feats.append((words, link_words, link_words / words, text))
        for i, (words, link_words, ld, text) in enumerate(feats):
            pw, pld = (feats[i - 1][0], feats[i - 1][2]) if i > 0 else (0, 0.0)
            nw = feats[i + 1][0] if i + 1 < len(feats) else 0
            is_content = _py_classify(pw, pld, words, ld, nw)
            rows.append(
                {
                    "doc_id": doc["doc_id"],
                    "seq": i + 1,
                    "words": words,
                    "link_words": link_words,
                    "link_density": ld,
                    "label": "content" if is_content else "boilerplate",
                    "text": text,
                }
            )
    return rows


def py_main_text(docs: list[dict]) -> list[dict]:
    """(doc_id, main_text, content_blocks, content_words, total_blocks)."""
    by_doc: dict[str, list[dict]] = {}
    for r in py_blocks(docs):
        by_doc.setdefault(r["doc_id"], []).append(r)
    out = []
    for doc_id in sorted(by_doc):
        blocks = sorted(by_doc[doc_id], key=lambda r: r["seq"])
        content = [b for b in blocks if b["label"] == "content"]
        out.append(
            {
                "doc_id": doc_id,
                "main_text": "\n".join(b["text"] for b in content),
                "content_blocks": len(content),
                "content_words": sum(b["words"] for b in content),
                "total_blocks": len(blocks),
            }
        )
    return out


# --- Spark engine -------------------------------------------------------------


def spark_blocks(html_docs: DataFrame) -> DataFrame:
    """Block features + WSDM'10 labels, all-JVM.

    One narrow exchange: the window partitioned by doc_id (row_number for
    the post-drop sequence, then lag/lead neighbor features over the same
    partitioning — Spark plans a single shuffle for both)."""
    raw_blocks = html_docs.select(
        "doc_id",
        F.posexplode(F.split("html", BLOCK_SPLIT_RE)).alias("bidx", "raw"),
    )
    # F.regexp_extract_all (not F.expr): a SQL string literal would eat the
    # pattern's backslashes ('\b' → backspace).
    anchor_arr = F.regexp_extract_all(F.col("raw"), F.lit(ANCHOR_RE), F.lit(1))
    feat = (
        raw_blocks.withColumn("text", _clean_col(F.col("raw")))
        .withColumn("words", _wc_col(F.col("text")))
        .where(F.col("words") > 0)
        .withColumn("link_words", _wc_col(_clean_col(F.array_join(anchor_arr, " "))))
        .withColumn("link_density", F.col("link_words").cast("double") / F.col("words"))
        .drop("raw")
    )
    w = Window.partitionBy("doc_id").orderBy("bidx")
    labeled = (
        feat.withColumn("seq", F.row_number().over(w))
        .withColumn("prev_w", F.lag("words", 1, 0).over(w))
        .withColumn("prev_ld", F.lag("link_density", 1, 0.0).over(w))
        .withColumn("next_w", F.lead("words", 1, 0).over(w))
        .withColumn(
            "label",
            F.when(
                _classify_col(
                    F.col("prev_w"),
                    F.col("prev_ld"),
                    F.col("words"),
                    F.col("link_density"),
                    F.col("next_w"),
                ),
                F.lit("content"),
            ).otherwise(F.lit("boilerplate")),
        )
    )
    return labeled.select(
        "doc_id",
        F.col("seq").cast("long").alias("seq"),
        F.col("words").cast("long").alias("words"),
        F.col("link_words").cast("long").alias("link_words"),
        "link_density",
        "label",
        "text",
    )


def spark_main_text(html_docs: DataFrame) -> DataFrame:
    """Per-doc boilerplate-stripped text: ordered concat of content blocks.

    The reassembly groupBy reuses the doc_id partitioning of the block
    window (no second shuffle of the text payload)."""
    arr = F.sort_array(
        F.collect_list(
            F.struct(
                F.col("seq").alias("seq"),
                (F.col("label") == "content").alias("is_c"),
                F.col("words").alias("words"),
                F.col("text").alias("text"),
            )
        )
    )
    content = F.filter(F.col("arr"), lambda x: x["is_c"])
    return (
        spark_blocks(html_docs)
        .groupBy("doc_id")
        .agg(arr.alias("arr"))
        .select(
            "doc_id",
            F.array_join(F.transform(content, lambda x: x["text"]), "\n").alias(
                "main_text"
            ),
            F.size(content).cast("long").alias("content_blocks"),
            F.aggregate(
                content, F.lit(0).cast("long"), lambda acc, x: acc + x["words"]
            ).alias("content_words"),
            F.size("arr").cast("long").alias("total_blocks"),
        )
    )


# --- deterministic HTML corpus ------------------------------------------------

_NAV_WORDS = (
    "home", "news", "about", "contact", "archive", "topics", "login",
    "register", "search", "sitemap", "privacy", "terms", "careers", "press",
)
_CONTENT_WORDS = (
    "steel", "plate", "furnace", "rolling", "mill", "certificate", "batch",
    "tensile", "strength", "carbon", "alloy", "inspection", "report",
    "quality", "standard", "thickness", "surface", "treatment", "shipment",
    "order", "supplier", "customer", "analysis", "measured", "value",
    "process", "heat", "number", "grade", "delivered", "条款", "质量", "报告",
)


def _words(rnd: random.Random, lo: int, hi: int) -> str:
    return " ".join(rnd.choice(_CONTENT_WORDS) for _ in range(rnd.randint(lo, hi)))


def _nav_links(rnd: random.Random, n: int, word_hi: int = 3) -> str:
    return " ".join(
        f'<a href="/{rnd.choice(_NAV_WORDS)}">'
        + " ".join(rnd.choice(_NAV_WORDS) for _ in range(rnd.randint(1, word_hi)))
        + "</a>"
        for _ in range(n)
    )


def gen_html_doc(i: int, seed: int = 7) -> dict:
    """One synthetic page: header/nav + sidebar link lists + article
    paragraphs (long/medium/short mix, occasional inline links and inline
    markup, entities, <br/>) + comments + footer. Pure function of
    (seed, i)."""
    rnd = random.Random((seed << 32) ^ i)
    parts = [
        f"<header><h1>Site {rnd.randrange(40)} &amp; Co</h1>"
        f"<nav>{_nav_links(rnd, rnd.randint(3, 8))}</nav></header>"
    ]
    if rnd.random() < 0.8:
        items = "".join(
            f'<li><a href="#s{j}">{_words(rnd, 1, 4)}</a></li>'
            for j in range(rnd.randint(3, 7))
        )
        parts.append(f"<aside><ul>{items}</ul></aside>")
    parts.append("<article>")
    for _ in range(rnd.randint(3, 12)):
        r = rnd.random()
        if r < 0.45:
            body = _words(rnd, 17, 60)
        elif r < 0.75:
            body = _words(rnd, 5, 16)
        else:
            body = _words(rnd, 1, 4)
        if rnd.random() < 0.25:
            body += f' see <a href="/ref">{_words(rnd, 1, 3)}</a>'
        if rnd.random() < 0.2:
            body = body.replace(" ", " <b>measured</b> ", 1)
        if rnd.random() < 0.15:
            body += "<br/>" + _words(rnd, 1, 8)
        if rnd.random() < 0.1:
            body += " tolerance &lt; 3mm &amp; &gt; 1mm"
        parts.append(f"<p>{body}</p>")
    parts.append("</article>")
    if rnd.random() < 0.5:
        for _ in range(rnd.randint(1, 4)):
            parts.append(f"<div class=\"comment\">{_words(rnd, 3, 25)}</div>")
    parts.append(f"<footer>{_nav_links(rnd, rnd.randint(2, 6))}</footer>")
    return {"doc_id": f"H{i:07d}", "html": "".join(parts)}


def gen_html_corpus(n_docs: int, seed: int = 7) -> list[dict]:
    return [gen_html_doc(i, seed) for i in range(n_docs)]


def html_docs_for_sf(sf: float) -> int:
    return max(60, int(round(sf * 40000)))


def spark_gen_html(spark, n_docs: int, seed: int = 7, partitions: int | None = None):
    """Distributed generator for benchmark scale (docs are pure functions
    of (seed, index); no driver funnel)."""
    import pandas as pd

    def build(batches):
        for pdf in batches:
            rows = [gen_html_doc(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(
                {"doc_id": [r["doc_id"] for r in rows], "html": [r["html"] for r in rows]}
            )

    parts = partitions or max(8, n_docs // 512)
    return spark.range(0, n_docs, numPartitions=parts).mapInPandas(
        build, "doc_id string, html string"
    )


# --- driver-contract wiring ---------------------------------------------------

_EXPECTED = ("boilerplate_blocks", "boilerplate_main_text")


def corpus_path(sf: str) -> str:
    return str(CACHE_DIR / f"html_{HTML_VER}_sf{sf}.parquet")


def expected_path(sf: str, name: str) -> str:
    return str(CACHE_DIR / f"html_expected_{HTML_VER}_sf{sf}_{name}.parquet")


def ensure_html_corpus(sf: str, with_expected: bool = True) -> None:
    CACHE_DIR.mkdir(exist_ok=True)
    paths = [corpus_path(sf)]
    if with_expected:
        paths += [expected_path(sf, n) for n in _EXPECTED]
    if all(os.path.exists(p) for p in paths):
        return
    import pandas as pd

    docs = gen_html_corpus(html_docs_for_sf(float(sf)))
    if not os.path.exists(corpus_path(sf)):
        pd.DataFrame(docs).to_parquet(corpus_path(sf), index=False)
    if not with_expected:
        return
    pd.DataFrame(py_blocks(docs)).to_parquet(
        expected_path(sf, "boilerplate_blocks"), index=False
    )
    pd.DataFrame(py_main_text(docs)).to_parquet(
        expected_path(sf, "boilerplate_main_text"), index=False
    )


def _read_html(spark, sf_dir: str) -> DataFrame:
    from .driver_contract import sf_of

    sf = sf_of(sf_dir)
    ensure_html_corpus(sf, with_expected=False)
    # The cached corpus is one small parquet file → one scan partition, but
    # the downstream cost is regex CPU per document, not bytes: spread the
    # doc rows across the session's cores before the tokenize stage (on a
    # real corpus the scan itself is already wide; this mirrors tuning
    # files.maxPartitionBytes down for CPU-heavy columns).
    return spark.read.parquet(corpus_path(sf)).repartition(
        spark.sparkContext.defaultParallelism
    )


def q_boilerplate_blocks(spark, sf_dir: str) -> DataFrame:
    return spark_blocks(_read_html(spark, sf_dir))


def q_boilerplate_main_text(spark, sf_dir: str) -> DataFrame:
    return spark_main_text(_read_html(spark, sf_dir))


def _sql_expected(name: str):
    def make(sf: str) -> str:
        ensure_html_corpus(sf)
        return f"SELECT * FROM read_parquet('{expected_path(sf, name)}')"

    return make


BOILERPLATE_QUERIES = {
    "boilerplate_blocks": (q_boilerplate_blocks, _sql_expected("boilerplate_blocks")),
    "boilerplate_main_text": (
        q_boilerplate_main_text,
        _sql_expected("boilerplate_main_text"),
    ),
}
