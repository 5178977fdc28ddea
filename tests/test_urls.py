"""URL canonicalization: Spark Column-tree normalizer vs the
independent urllib.parse twin, edge-case fixtures, and the
no-Python-UDF plan guarantee."""

import pyspark.sql.functions as F

from geospark.goldens import (
    _messy_variant_py,
    url_normalize_py,
    url_normalize_stats,
)
from geospark.urls import messy_variant, url_normalize

# (raw, canonical) fixtures — every rule exercised at least once
FIXTURES = [
    # lowercase scheme + host, keep path case
    ("HTTPS://WWW.Example.COM/A/B", "https://www.example.com/A/B"),
    # default ports stripped, non-default kept
    ("http://a.example.com:80/x", "http://a.example.com/x"),
    ("https://a.example.com:443/x", "https://a.example.com/x"),
    ("https://a.example.com:8443/x", "https://a.example.com:8443/x"),
    ("http://a.example.com:443/x", "http://a.example.com:443/x"),
    # fragment dropped
    ("https://a.example.com/x#sec-2", "https://a.example.com/x"),
    # tracking params dropped, rest sorted; empty query tail removed
    ("https://a.example.com/x?utm_source=t&b=2&a=1",
     "https://a.example.com/x?a=1&b=2"),
    ("https://a.example.com/x?gclid=abc&fbclid=def&msclkid=g&utm_=1",
     "https://a.example.com/x"),
    # duplicate slashes, index.html, trailing slash
    ("https://a.example.com//x///y", "https://a.example.com/x/y"),
    ("https://a.example.com/x/index.html", "https://a.example.com/x"),
    ("https://a.example.com/index.html", "https://a.example.com/"),
    ("https://a.example.com/x/", "https://a.example.com/x"),
    # empty path -> /
    ("https://a.example.com", "https://a.example.com/"),
    ("https://a.example.com?b=2&a=1", "https://a.example.com/?a=1&b=2"),
    # idempotence input (already canonical)
    ("https://a.example.com/x?a=1", "https://a.example.com/x?a=1"),
]


def test_python_twin_fixtures():
    for raw, want in FIXTURES:
        assert url_normalize_py(raw) == want, raw


def test_spark_matches_twin_on_fixtures(spark):
    df = spark.createDataFrame([(r,) for r, _ in FIXTURES], "url string")
    got = dict(
        df.select("url", url_normalize("url").alias("n")).collect()
    )
    for raw, want in FIXTURES:
        assert got[raw] == want, raw


def test_idempotent(spark):
    df = spark.createDataFrame([(r,) for r, _ in FIXTURES], "url string")
    once = df.select(url_normalize("url").alias("u"))
    twice = once.select("u", url_normalize("u").alias("u2"))
    assert all(r.u == r.u2 for r in twice.collect())


def test_messy_variant_parity_and_collapse(spark):
    """Spark messy_variant == python twin on every branch, and
    branches 0-4 canonicalize back to the clean url while branch 5
    (scheme change) does NOT."""
    clean = [f"https://site{i}.example.com/page/{i}" for i in range(12)]
    df = spark.createDataFrame(
        [(u, i) for i, u in enumerate(clean)], "url string, b long"
    )
    rows = df.select(
        "url", "b",
        messy_variant(F.col("url"), F.col("b")).alias("messy"),
        url_normalize(
            messy_variant(F.col("url"), F.col("b"))).alias("norm"),
    ).collect()
    for r in rows:
        assert r.messy == _messy_variant_py(r.url, r.b), r.b
        assert r.norm == url_normalize_py(r.messy), r.b
        if r.b % 6 == 5:
            assert r.norm != r.url and r.norm.startswith("http://")
        else:
            assert r.norm == r.url, (r.b, r.messy, r.norm)


def test_driver_query_matches_golden(spark):
    import __spark_entry__ as E

    got = sorted(
        (r.url_norm, r.n_raw, r.n_distinct_raw)
        for r in E.queries()["pages_url_normalize"](
            spark, "/root/testdata/sf0.001").collect()
    )
    assert got == url_normalize_stats(2000)


def test_plan_is_pure_codegen(spark):
    """The normalizer must never fall back to Python execution."""
    df = spark.createDataFrame([("https://A.example.com:443/x/",)],
                               "url string")
    plan = df.select(
        url_normalize("url").alias("u")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
