"""HTML boilerplate strip (north rule: 'HTML boilerplate strip … DOM
heuristics'): the WSDM'10 NumWordsRules classifier tree, the block
tokenizer contract, and Spark-vs-pure-Python differential equality on the
deterministic HTML corpus plus hand-built edge documents."""

from __future__ import annotations

import pandas as pd

from pdf_parser_spark import boilerplate as bp

BLOCK_COLS = ["doc_id", "seq", "words", "link_words", "link_density", "label", "text"]
MAIN_COLS = ["doc_id", "main_text", "content_blocks", "content_words", "total_blocks"]


def _cmp(spark, docs, fn_spark, fn_py, cols):
    sdf = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "html"]))
    got = (
        fn_spark(sdf)
        .toPandas()[cols]
        .sort_values(cols)
        .reset_index(drop=True)
        .astype(str)
    )
    want = (
        pd.DataFrame(fn_py(docs), columns=cols)
        .sort_values(cols)
        .reset_index(drop=True)
        .astype(str)
    )
    pd.testing.assert_frame_equal(got, want)


def test_classifier_tree_paths():
    # curr link-dense → boilerplate regardless of anything else
    assert not bp._py_classify(100, 0.0, 10, 0.5, 100)
    # plain prev, short curr, short next: prev length decides
    assert not bp._py_classify(4, 0.0, 10, 0.0, 10)
    assert bp._py_classify(5, 0.0, 10, 0.0, 10)
    # short curr but long next → content
    assert bp._py_classify(0, 0.0, 10, 0.0, 16)
    # long curr → content
    assert bp._py_classify(0, 0.0, 17, 0.0, 0)
    # link-dense prev: medium curr needs a long next
    assert not bp._py_classify(3, 0.6, 40, 0.0, 17)
    assert bp._py_classify(3, 0.6, 40, 0.0, 18)
    assert bp._py_classify(3, 0.6, 41, 0.0, 0)


def test_py_blocks_tokenizer():
    docs = [
        {
            "doc_id": "a",
            "html": '<p>one two three four five</p><nav><a href="/x">home page</a></nav>'
            "<p>tol &lt; 3 &amp; &gt; 1</p>",
        }
    ]
    rows = bp.py_blocks(docs)
    assert [r["words"] for r in rows] == [5, 2, 6]
    assert rows[1]["link_words"] == 2 and rows[1]["link_density"] == 1.0
    assert rows[2]["text"] == "tol < 3 & > 1"
    # inline markup stays in-block; <br/> splits
    rows2 = bp.py_blocks(
        [{"doc_id": "b", "html": "<p>alpha <b>beta</b> gamma<br/>delta</p>"}]
    )
    assert [r["text"] for r in rows2] == ["alpha beta gamma", "delta"]


def test_empty_and_link_only_docs():
    docs = [
        {"doc_id": "empty", "html": ""},
        {"doc_id": "tagsonly", "html": "<div><p></p></div>"},
        {"doc_id": "links", "html": '<p><a href="/">x y</a></p>'},
    ]
    rows = bp.py_blocks(docs)
    assert {r["doc_id"] for r in rows} == {"links"}
    assert rows[0]["label"] == "boilerplate"
    main = bp.py_main_text(docs)
    assert len(main) == 1 and main[0]["main_text"] == ""


def test_corpus_has_both_labels_and_main_text():
    docs = bp.gen_html_corpus(120)
    rows = bp.py_blocks(docs)
    labels = {r["label"] for r in rows}
    assert labels == {"content", "boilerplate"}
    # headers/navs are overwhelmingly boilerplate, long article text content
    main = bp.py_main_text(docs)
    assert sum(1 for m in main if m["content_words"] > 0) > 100


def test_spark_blocks_equals_spec(spark):
    docs = bp.gen_html_corpus(150)
    _cmp(spark, docs, bp.spark_blocks, bp.py_blocks, BLOCK_COLS)


def test_spark_main_text_equals_spec(spark):
    docs = bp.gen_html_corpus(150)
    _cmp(spark, docs, bp.spark_main_text, bp.py_main_text, MAIN_COLS)


def test_spark_edge_docs_equal_spec(spark):
    docs = [
        {"doc_id": "tagsonly", "html": "<div><p></p></div>"},
        {"doc_id": "links", "html": '<p><a href="/">x y</a></p>'},
        {"doc_id": "mixed", "html": "<p>alpha <b>beta</b> gamma<br/>delta</p>"},
        {"doc_id": "ent", "html": "<p>tol &lt; 3 &amp; &gt; 1</p>"},
        {"doc_id": "one", "html": "plain untagged text with several words here"},
    ]
    _cmp(spark, docs, bp.spark_blocks, bp.py_blocks, BLOCK_COLS)
    _cmp(spark, docs, bp.spark_main_text, bp.py_main_text, MAIN_COLS)


def test_distributed_generator_matches(spark):
    got = (
        bp.spark_gen_html(spark, 40)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(bp.gen_html_corpus(40)).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
