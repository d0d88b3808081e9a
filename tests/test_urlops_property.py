"""Property-based Spark-vs-DuckDB equality for URL canonicalization.

The canonicalizer is structural string surgery over an edge-case-rich
grammar (empty paths, host-adjacent queries, multi-slash tails, port
variants, parameter soup). Hypothesis drives BOTH engines over random
structured URLs — every example is a full two-engine differential on
`_with_canon` vs `_sql_canon_exprs`, independent of the fixture
generator's noise distribution. Shapes the fixture never produces are
deliberately included: empty query values, '=' -less params, uppercase
TLDs, ports on https without path, 'www.' as the WHOLE host."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pdf_parser_spark import urlops as up

_HOSTWORD = st.sampled_from(
    ["Steel", "MILL", "www", "cert", "spamX", "a1", "B2"]
)
_SEG = st.sampled_from(["reports", "q3", "2024", "Batch", "x"])
_PNAME = st.sampled_from(
    ["id", "page", "utm_source", "utm_x", "fbclid", "gclid", "q", "rev"]
)


@st.composite
def url_st(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https"]))
    host = ".".join(
        draw(st.lists(_HOSTWORD, min_size=1, max_size=3))
    ) + draw(st.sampled_from([".com", ".ORG", ".net", ""]))
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    segs = draw(st.lists(_SEG, min_size=0, max_size=3))
    path = "".join("/" + s for s in segs) + draw(
        st.sampled_from(["", "/", "//"])
    )
    params = [
        p + draw(st.sampled_from(["=1", "=", "=x%20y", ""]))
        for p in draw(st.lists(_PNAME, min_size=0, max_size=4))
    ]
    q = ("?" + "&".join(params)) if params else draw(
        st.sampled_from(["", "?"])
    )
    frag = draw(st.sampled_from(["", "#top", "#a?b"]))
    return f"{scheme}://{host}{port}{path}{q}{frag}"


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(url_st(), min_size=1, max_size=24))
def test_canon_two_engine_differential(spark, urls):
    rows = [(f"D{i}", u) for i, u in enumerate(urls)]
    sdf = spark.createDataFrame(rows, "doc_id string, url string")
    got = (
        up._with_canon(sdf)
        .select("doc_id", "canon_url", "host")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    canon, host = up._sql_canon_exprs()
    con = duckdb.connect()
    con.register("u", pd.DataFrame(rows, columns=["doc_id", "url"]))
    want = con.execute(
        f"SELECT doc_id, {canon} AS canon_url, {host} AS host FROM u "
        "ORDER BY doc_id"
    ).fetchdf().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
