"""Count-Min sketch + Bloom filter property tests (geospark/sketch.py).

The contracts that make the sketches safe at 100 TB:
  CMS:   est >= true always; est == true when w is collision-free;
         merge(sum) of partition sketches == sketch of the union.
  Bloom: a present item is ALWAYS maybe (zero false negatives);
         absent items are maybe at ~ the analytic fpr; bit-set union
         == filter of the union.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geospark import sketch as SK


def _stream(spark, n_items=300, reps=5):
    """Deterministic skewed stream: item i appears (i % reps) + 1
    times, plus item 0 appears 50 extra times (the heavy hitter)."""
    rows = []
    for i in range(n_items):
        rows += [(f"item-{i}",)] * ((i % reps) + 1)
    rows += [("item-0",)] * 50
    return spark.createDataFrame(rows, "item string")


def test_cms_never_underestimates_and_exact_when_wide(spark):
    df = _stream(spark)
    exact = {r["item"]: r["c"] for r in
             df.groupBy("item").agg(F.count("*").alias("c")).collect()}

    # tight sketch: collisions possible, but never an underestimate
    sk = SK.cms_table(df, [], "item", d=3, w=64)
    est = {r["item"]: r["est_cnt"] for r in
           SK.cms_lookup(sk, df.distinct(), [], "item", d=3, w=64)
           .collect()}
    assert set(est) == set(exact)
    for it, c in exact.items():
        assert est[it] >= c, f"{it}: est {est[it]} < true {c}"

    # wide sketch: w >> NDV so every estimate is exact
    skw = SK.cms_table(df, [], "item", d=3, w=1 << 14)
    estw = {r["item"]: r["est_cnt"] for r in
            SK.cms_lookup(skw, df.distinct(), [], "item", d=3,
                          w=1 << 14).collect()}
    assert estw == exact


def test_cms_merge_equals_sketch_of_union(spark):
    df = _stream(spark, n_items=200)
    half_a = df.filter(F.crc32(F.col("item")) % 2 == 0)
    half_b = df.filter(F.crc32(F.col("item")) % 2 == 1)
    full = SK.cms_table(df, [], "item", d=4, w=128)
    merged = SK.cms_merge(
        SK.cms_table(half_a, [], "item", d=4, w=128).unionAll(
            SK.cms_table(half_b, [], "item", d=4, w=128)), [])
    assert sorted(map(tuple, full.collect())) == \
        sorted(map(tuple, merged.collect()))


def test_cms_absent_item_estimates_small(spark):
    df = _stream(spark, n_items=100)
    sk = SK.cms_table(df, [], "item", d=4, w=1 << 12)
    probes = spark.createDataFrame(
        [(f"never-{i}",) for i in range(20)], "item string")
    est = SK.cms_lookup(sk, probes, [], "item", d=4, w=1 << 12).collect()
    n = df.count()
    bound = SK.cms_error_bound(1 << 12, n)
    assert all(r["est_cnt"] <= bound for r in est)


def test_bloom_no_false_negatives_and_fpr(spark):
    present = spark.range(0, 400).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("h"))
    absent = spark.range(10_000, 12_000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("h"))
    k, m = 7, 1 << 13
    bits = SK.bloom_bits(present, "h", k=k, mbits=m)

    hits = SK.bloom_probe(bits, present, "h", k=k, mbits=m).collect()
    assert all(r["bloom_maybe"] == 1 for r in hits), \
        "false negative — breaks the Bloom contract"

    miss = SK.bloom_probe(bits, absent, "h", k=k, mbits=m).collect()
    fp = sum(r["bloom_maybe"] for r in miss) / len(miss)
    # analytic fpr ~ (1 - e^(-7*400/8192))^7 ~ 2e-4; allow 50x slack
    assert fp <= 50 * SK.bloom_fpr(k, m, 400) + 1e-9


def test_bloom_union_merge(spark):
    a = spark.range(0, 200).select(
        F.concat(F.lit("a-"), F.col("id")).alias("h"))
    b = spark.range(0, 200).select(
        F.concat(F.lit("b-"), F.col("id")).alias("h"))
    k, m = 5, 1 << 12
    merged = SK.bloom_bits(a, "h", k=k, mbits=m).unionAll(
        SK.bloom_bits(b, "h", k=k, mbits=m)).distinct()
    direct = SK.bloom_bits(a.unionAll(b), "h", k=k, mbits=m)
    assert sorted(r["bit"] for r in merged.collect()) == \
        sorted(r["bit"] for r in direct.collect())


def test_kmv_exact_when_small_and_estimate_when_large(spark):
    k = 128
    small = spark.range(0, 50).select(
        F.concat(F.lit("s-"), F.col("id")).alias("item"))
    est = SK.kmv_estimate(SK.kmv_sketch(small, [], "item", k), [], k) \
        .collect()[0]
    assert est["n_sk"] == 50 and est["est_ndv"] == 50.0

    big = spark.range(0, 20_000).select(
        F.concat(F.lit("b-"), F.col("id")).alias("item"))
    est = SK.kmv_estimate(SK.kmv_sketch(big, [], "item", k), [], k) \
        .collect()[0]
    # rse ~ 1/sqrt(k-2) ~ 8.9%; allow 4 sigma
    assert abs(est["est_ndv"] - 20_000) < 4 * 20_000 * SK.kmv_std_error(k)


def test_kmv_merge_equals_sketch_of_union(spark):
    k = 64
    a = spark.range(0, 3000).select(
        F.concat(F.lit("x-"), F.col("id")).alias("item"))
    b = spark.range(2000, 5000).select(
        F.concat(F.lit("x-"), F.col("id")).alias("item"))
    merged = SK.kmv_merge(
        SK.kmv_sketch(a, [], "item", k).unionAll(
            SK.kmv_sketch(b, [], "item", k)), [], k)
    direct = SK.kmv_sketch(a.unionAll(b), [], "item", k)
    assert sorted(r["h"] for r in merged.collect()) == \
        sorted(r["h"] for r in direct.collect())


def test_kmv_jaccard_tracks_exact_overlap(spark):
    k = 256
    # |A| = |B| = 4000, |A ∩ B| = 2000 -> J = 2000/6000 = 1/3
    a = spark.range(0, 4000).select(
        F.concat(F.lit("x-"), F.col("id")).alias("item"))
    b = spark.range(2000, 6000).select(
        F.concat(F.lit("x-"), F.col("id")).alias("item"))
    j = SK.kmv_jaccard(SK.kmv_sketch(a, [], "item", k),
                       SK.kmv_sketch(b, [], "item", k), k).collect()[0]
    assert j["k_u"] == k
    assert abs(j["est_jaccard"] - 1 / 3) < 0.12  # binomial(k, J) noise

    # disjoint sets -> 0 exactly (no hash can be in both sketches)
    c = spark.range(10_000, 14_000).select(
        F.concat(F.lit("x-"), F.col("id")).alias("item"))
    j0 = SK.kmv_jaccard(SK.kmv_sketch(a, [], "item", k),
                        SK.kmv_sketch(c, [], "item", k), k).collect()[0]
    assert j0["est_jaccard"] == 0.0


def test_kmv_keyed_sketch_is_per_group(spark):
    k = 32
    df = spark.range(0, 2000).select(
        (F.col("id") % 4).cast("int").alias("grp"),
        F.concat(F.lit("i-"), F.col("id")).alias("item"))
    sk = SK.kmv_sketch(df, ["grp"], "item", k)
    per = {r["grp"]: r["c"] for r in
           sk.groupBy("grp").agg(F.count("*").alias("c")).collect()}
    assert per == {0: k, 1: k, 2: k, 3: k}
    est = SK.kmv_estimate(sk, ["grp"], k)
    for r in est.collect():
        assert abs(r["est_ndv"] - 500) < 4 * 500 * SK.kmv_std_error(k)


def test_cms_keyed_sketch(spark):
    """Per-key sketches stay independent: estimates within a key group
    match that group's exact counts when w is collision-free."""
    df = _stream(spark, n_items=60).withColumn(
        "grp", (F.crc32("item") % 3).cast("int"))
    sk = SK.cms_table(df, ["grp"], "item", d=3, w=1 << 13)
    est = SK.cms_lookup(sk, df.select("grp", "item").distinct(),
                        ["grp"], "item", d=3, w=1 << 13)
    exact = df.groupBy("grp", "item").agg(F.count("*").alias("c"))
    diff = est.join(exact, ["grp", "item"]) \
        .filter(F.col("est_cnt") != F.col("c"))
    assert diff.count() == 0


# --------------------------------------------------------------------
# HDR-histogram quantile sketch: bounded-error quantiles the exact
# percentile can't give for unbounded domains.  Contracts:
#   bucket(x) <= x, deterministic relative error < 2^(1-B);
#   merge(shard sketches) == sketch(union), bit-identical;
#   values < 2^B bucket to themselves -> quantiles exact.
# --------------------------------------------------------------------

def _hdr_bucket_py(x: int, sig_bits: int = 5) -> int:
    s = max(x.bit_length() - sig_bits, 0)
    return (x >> s) << s


def _hdr_vals(spark):
    """Deterministic values spanning ~7 orders of magnitude (incl. 0
    and sub-2^B values), keyed into two groups."""
    vals = [0, 1, 3, 17, 31] + [
        ((i * i * 2654435761) % 9_999_991) + 1 for i in range(2000)
    ]
    return spark.createDataFrame(
        [(i % 2, v) for i, v in enumerate(vals)], "grp int, v long"
    ), vals


def test_hdr_merge_equals_sketch_of_union(spark):
    df, _ = _hdr_vals(spark)
    whole = SK.hdr_sketch(df, ["grp"], "v")
    sharded = df.withColumn("shard", (F.col("v") % 4).cast("int"))
    child = SK.hdr_sketch(sharded, ["grp", "shard"], "v")
    merged = SK.hdr_merge(child.drop("shard"), ["grp"])
    a = sorted(map(tuple, whole.collect()))
    b = sorted(map(tuple, merged.collect()))
    assert a == b and len(a) > 0


def test_hdr_quantile_is_bucket_of_true_order_stat(spark):
    """The sketch quantile is EXACTLY bucket(true order statistic):
    <= the true value, within relative error 2^(1-B) for x >= 2^B."""
    df, vals = _hdr_vals(spark)
    sk = SK.hdr_sketch(df, ["grp"], "v")
    qs = [500000, 900000, 990000]
    out = {r["grp"]: r for r in
           SK.hdr_quantiles(sk, ["grp"], qs).collect()}
    by_grp = {0: [], 1: []}
    for i, v in enumerate(vals):
        by_grp[i % 2].append(v)
    for g, gv in by_grp.items():
        gv.sort()
        n = len(gv)
        assert out[g]["n"] == n
        for q in qs:
            rank = (n * q + 999999) // 1000000
            true = gv[rank - 1]
            est = out[g][f"q_{q}"]
            assert est == _hdr_bucket_py(true)
            assert est <= true
            if true >= 32:
                assert true - est <= true * SK.hdr_error_bound(5)


def test_hdr_small_values_exact_and_state_bounded(spark):
    df = spark.createDataFrame(
        [(v,) for v in [1, 2, 2, 3, 5, 8, 13, 21, 31]], "v long")
    sk = SK.hdr_sketch(df, [], "v")
    # every value < 2^5 is its own bucket -> p50 is the exact median
    out = SK.hdr_quantiles(sk, [], [500000]).collect()[0]
    assert out["q_500000"] == 5
    # state growth is logarithmic: <= 16 buckets per octave
    big, _ = _hdr_vals(spark)
    n_buckets = SK.hdr_sketch(big, [], "v").count()
    assert n_buckets <= 16 * 24


def test_hdr_sketch_streams_incrementally(spark, tmp_path):
    """The sketch is a pure groupBy-sum, so it runs UNCHANGED as a
    streaming aggregation: file-source micro-batches in complete mode
    must converge to exactly the batch sketch — the persisted-rollup
    contract (per-day sketch + merge == rescan) exercised through
    Structured Streaming itself."""
    df, _ = _hdr_vals(spark)
    src = str(tmp_path / "src")
    # three in-order drops = three micro-batches
    for i in range(3):
        df.filter(F.col("v") % 3 == i).coalesce(1).write.mode(
            "append").parquet(src)
    stream = spark.readStream.schema("grp int, v long") \
        .option("maxFilesPerTrigger", 1).parquet(src)
    sk = SK.hdr_sketch(stream, ["grp"], "v")
    q = (
        sk.writeStream.format("memory").queryName("hdr_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql(
        "SELECT grp, b, cnt FROM hdr_stream").collect()))
    want = sorted(map(tuple, SK.hdr_sketch(df, ["grp"], "v").collect()))
    assert got == want and len(got) > 0
