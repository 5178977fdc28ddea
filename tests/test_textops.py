"""Dedup / text-analysis operators: constructed fixtures + invariants
against exact recomputation."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from geospark import textops as T

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),        # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat"),        # near dup
    (3, "completely different text about spark engines here"),
    (4, "der schnelle braune fuchs und die faule katze ist"),
    (5, "a b"),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(spark):
    got = {r["doc_id"]: r for r in T.exact_dedup(_docs_df(spark)).collect()}
    assert got[0]["canonical_id"] == 0 and got[0]["group_size"] == 2
    assert got[1]["canonical_id"] == 0 and got[1]["group_size"] == 2
    assert got[2]["canonical_id"] == 2 and got[2]["group_size"] == 1


def test_token_stats(spark):
    got = {r["doc_id"]: r for r in T.token_stats(_docs_df(spark)).collect()}
    assert got[0]["n_tokens"] == 9
    assert got[5]["n_tokens"] == 2
    assert got[0]["n_chars"] == len(DOCS[0][1])


def test_quality_and_lang(spark):
    q = {r["doc_id"]: r for r in T.quality_score(_docs_df(spark)).collect()}
    assert 0.0 <= q[0]["quality"] <= 1.0
    assert q[0]["stop_ratio"] > q[3]["stop_ratio"]  # 'the' x2 vs none
    lang = {r["doc_id"]: r["lang_pred"] for r in T.lang_id(_docs_df(spark)).collect()}
    assert lang[0] == "en"
    assert lang[4] == "de"


def test_jaccard_pairs_exact(spark):
    pairs = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in T.jaccard_pairs(_docs_df(spark), threshold=0.3).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0  # identical
    assert (0, 2) in pairs and 0.4 < pairs[(0, 2)] < 1.0  # near dup
    assert (0, 3) not in pairs


def test_minhash_lsh_finds_near_dups(spark):
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in T.minhash_neardup_pairs(_docs_df(spark), threshold=0.3).collect()
    }
    # identical docs always collide in every band; verified jaccard exact
    assert got[(0, 1)] == 1.0
    # every reported pair's jaccard matches the exact operator
    exact = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in T.jaccard_pairs(_docs_df(spark), threshold=0.0).collect()
    }
    for pair, j in got.items():
        assert exact[pair] == j


def test_simhash_properties(spark):
    sig = {r["doc_id"]: r["simhash"] for r in T.simhash(_docs_df(spark)).collect()}
    assert sig[0] == sig[1]  # identical text -> identical signature
    pairs = {
        (r["doc_id_a"], r["doc_id_b"]): r["hamming"]
        for r in T.simhash_pairs(_docs_df(spark), max_hamming=16).collect()
    }
    assert pairs[(0, 1)] == 0
    if (0, 2) in pairs:
        assert pairs[(0, 2)] <= 16


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "gamma beta alpha"), (2, "alpha beta gamma")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in T.fingerprint(df).collect()}
    assert fp[0] == fp[2]
    assert fp[0] != fp[1]  # same tokens, different order


def test_shingles(spark):
    sh = (
        T.shingles(_docs_df(spark).filter(F.col("doc_id") == 0), n=3)
        .collect()
    )
    got = {r["shingle"] for r in sh}
    assert "the quick brown" in got
    assert "the lazy dog" in got
    assert len(got) == 7  # 9 tokens -> 7 trigrams, all distinct


def test_xxhash64_fast_path_semantics(spark):
    """hash_fn='xxhash64' (the production fast path) must keep the
    operators' semantics: near-dup pairs still carry exact Jaccard
    values; simhash stays a positive 60-bit signature; fingerprints
    stay order-sensitive."""
    docs = _docs_df(spark)
    pairs = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in T.minhash_neardup_pairs(
            docs, threshold=0.3, hash_fn="xxhash64"
        ).collect()
    }
    exact = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in T.jaccard_pairs(docs, threshold=0.3).collect()
    }
    assert pairs  # the duplicate docs collide in some band
    for k, v in pairs.items():
        assert exact[k] == v  # refine stage reports the exact value

    sigs = {r["doc_id"]: r["simhash"]
            for r in T.simhash(docs, hash_fn="xxhash64").collect()}
    assert all(0 <= s < (1 << 60) for s in sigs.values())

    fps = {r["doc_id"]: r["fingerprint"]
           for r in T.fingerprint(docs, hash_fn="xxhash64").collect()}
    assert fps[0] == fps[1]  # identical docs, identical fingerprints
    assert len(set(fps.values())) > 1

def test_simhash_pairs_full_recall_at_radius(spark):
    """Recall GUARANTEE: banding into max_hamming+1 chunks must surface
    every pair within the radius (pigeonhole), not just pairs agreeing
    on a coarse band. Oracle = exact all-pairs hamming over the same
    signatures."""
    import random

    rng = random.Random(17)
    words = [f"w{i:03d}" for i in range(60)]
    docs = []
    base = rng.sample(words, 25)
    for d in range(30):
        toks = list(base)
        # mutate 0..6 tokens -> a spread of hamming distances incl. 4..8
        for _ in range(rng.randint(0, 6)):
            toks[rng.randrange(len(toks))] = rng.choice(words)
        rng.shuffle(toks)
        docs.append((d, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sig = T.simhash(df)
    exact = {
        (r["doc_id_a"], r["doc_id_b"]): r["hamming"]
        for r in sig.alias("a").crossJoin(sig.alias("b"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= 8)
        .collect()
    }
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["hamming"]
        for r in T.simhash_pairs(df, max_hamming=8).collect()
    }
    assert got == exact
    # the fixture must actually exercise the radius-4..8 regime the old
    # 4x16 banding could drop
    assert any(4 <= h <= 8 for h in exact.values()), sorted(exact.values())
    # every point of the multi-index family must find the SAME exact
    # set: classic contiguous banding (9 bands, t=0), the corpus-scale
    # multi-flip plans (3x20-bit/1-flip-per-side, 2x30-bit/2+2 flips),
    # and an asymmetric split (4 bands, t=2 -> t1=1, t2=1)
    for nb in (9, 4, 3, 2):
        got_nb = {
            (r["doc_id_a"], r["doc_id_b"]): r["hamming"]
            for r in T.simhash_pairs(df, max_hamming=8, n_bands=nb).collect()
        }
        assert got_nb == exact, f"n_bands={nb}"


def test_mih_plan_recall_invariants():
    """Whatever the cost model picks, the (m, t1, t2) triple must
    satisfy the pigeonhole recall guarantee m*(t1+t2+1) >= r+1."""
    for r in (0, 1, 2, 3, 4, 8, 12, 16, 24):
        for n in (None, 1000, 5_000_000, 10**9, 10**12):
            m, t1, t2 = T.mih_plan(r, n_docs=n)
            assert m * (t1 + t2 + 1) >= r + 1, (r, n, m, t1, t2)
            assert t1 + t2 == r // m
    # radius 8 at corpus scale must choose a multi-flip plan (fewer,
    # wider bands), not the 9-band contiguous one
    m, t1, t2 = T.mih_plan(8, n_docs=5_000_000)
    assert m < 9 and t1 + t2 >= 1


def test_flip_masks_complete():
    masks = T._flip_masks(5, 2)
    assert len(masks) == 1 + 5 + 10
    assert len(set(masks)) == len(masks)
    assert all(bin(m).count("1") <= 2 and m < 32 for m in masks)


def test_simhash_bands_cover_signature(spark):
    bands = T.simhash_bands(9)
    assert sum(w for _, w in bands) == T.SIMHASH_BITS
    assert len(bands) == 9
    offs = [o for o, _ in bands]
    assert offs == sorted(offs) and offs[0] == 0
    assert max(w for _, w in bands) - min(w for _, w in bands) <= 1


def test_split_assign_stable_and_partition_independent(spark):
    from geospark.textops import split_assign

    docs = spark.createDataFrame([(i,) for i in range(400)], "doc_id long")
    a = {r["doc_id"]: (r["bucket"], r["split"])
         for r in split_assign(docs).collect()}
    b = {r["doc_id"]: (r["bucket"], r["split"])
         for r in split_assign(docs.repartition(7)).collect()}
    assert a == b
    # appending new docs never moves existing ones
    more = spark.createDataFrame([(i,) for i in range(600)], "doc_id long")
    c = {r["doc_id"]: (r["bucket"], r["split"])
         for r in split_assign(more).collect()}
    assert all(c[k] == v for k, v in a.items())
    # all three splits populated, ordered train > val ~ test
    from collections import Counter

    n = Counter(s for _, s in a.values())
    assert set(n) == {"train", "val", "test"}
    assert n["train"] > n["val"] + n["test"]


def test_split_assign_custom_weights_validated(spark):
    import pytest as _pytest

    from geospark.textops import split_assign

    docs = spark.createDataFrame([(1,)], "doc_id long")
    with _pytest.raises(ValueError, match="align"):
        split_assign(docs, weights=(1, 2), names=("x",))
    row = split_assign(docs, weights=(1,), names=("all",)).collect()[0]
    assert (row["bucket"], row["split"]) == (0, "all")


def test_chunk_documents_coverage_and_overlap(spark):
    """Every token lands in >=1 chunk; windows start at multiples of
    stride; the last window reaches the end; short docs -> one chunk."""
    docs = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(10))),   # 10 tokens
         (1, "a b c"),                                 # shorter than chunk
         (2, "")],                                     # empty -> no chunks
        "doc_id long, text string",
    )
    out = T.chunk_documents(docs, chunk_size=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: starts 0,3,6 (ceil((10-4)/3)*3 = 6); chunks 4,4,4 tokens
    got0 = sorted((r["start_pos"], r["n_tokens"], r["chunk_text"])
                  for r in by_doc[0])
    assert got0 == [(0, 4, "t0 t1 t2 t3"), (3, 4, "t3 t4 t5 t6"),
                    (6, 4, "t6 t7 t8 t9")]
    # coverage: union of [start, start+n) == [0, 10)
    covered = set()
    for s, n, _ in got0:
        covered |= set(range(s, s + n))
    assert covered == set(range(10))
    assert [(r["start_pos"], r["n_tokens"], r["chunk_text"])
            for r in by_doc[1]] == [(0, 3, "a b c")]
    assert 2 not in by_doc


def test_chunk_documents_tail_not_multiple_of_stride(spark):
    """n=9, chunk=4, stride=3: last start must be ceil(5/3)*3 = 6 so
    the final window [6,9) reaches the end (a naive floor would stop
    at 3 and orphan tokens 7-8)."""
    docs = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(9)))], "doc_id long, text string"
    )
    rows = sorted(
        (r["start_pos"], r["n_tokens"])
        for r in T.chunk_documents(docs, chunk_size=4, stride=3).collect()
    )
    assert rows == [(0, 4), (3, 4), (6, 3)]


def test_tfidf_top_terms_exact(spark):
    """Hand-checked corpus: df-1 terms outrank corpus-wide terms; ties
    break on token asc; scores equal tf * ln(N/df)."""
    import math

    docs = spark.createDataFrame(
        [(0, "x x y"), (1, "x z"), (2, "x w w")],
        "doc_id long, text string",
    )
    rows = T.tfidf_top_terms(docs, k=2).collect()
    got = {(r["doc_id"], r["rnk"]): (r["token"], r["tf"], r["df"],
                                     r["score_r"]) for r in rows}
    ln3 = round(math.log(3.0), 6)
    # doc 0: y (1*ln3) beats x (2*ln(3/3)=0)
    assert got[(0, 1)] == ("y", 1, 1, ln3)
    assert got[(0, 2)] == ("x", 2, 3, 0.0)
    # doc 2: w tf=2 df=1 -> 2*ln3
    assert got[(2, 1)] == ("w", 2, 1, round(2 * math.log(3.0), 6))


def test_quantize_int8_roundtrip_and_zero_vector(spark):
    """Max-|x| element maps to ±127 exactly; dequant error bounded by
    scale/2; the all-zero vector yields scale 0 and zero codes."""
    from geospark.embeddings import quantize_int8

    emb = spark.createDataFrame(
        [(0, [1.0, -2.0, 0.5]), (1, [0.0, 0.0, 0.0]), (2, [-0.003,])],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r for r in quantize_int8(emb).collect()}
    assert got[0]["q"] == [64, -127, 32]     # round(1/2*127)=64 (half up)
    assert abs(got[0]["scale"] - 2.0 / 127.0) < 1e-12
    for x, q in zip([1.0, -2.0, 0.5], got[0]["q"]):
        assert abs(x - q * got[0]["scale"]) <= got[0]["scale"] / 2 + 1e-12
    assert got[1]["scale"] == 0.0 and got[1]["q"] == [0, 0, 0]
    assert got[2]["q"] == [-127]


def test_repetition_stats_exact(spark):
    """Hand-computed repetition signals; the heavy-repetition doc is
    flagged by low distinct_frac / high top fractions."""
    docs = spark.createDataFrame(
        [(0, "spam spam spam spam"),            # 1 distinct, bigram 'spam spam' x3
         (1, "a b a b a"),                      # top tok a:3/5; 'a b' 2/4
         (2, "unique tokens only here"),        # all distinct
         (3, "solo")],                          # 1 token: bigram frac 0
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in T.repetition_stats(docs).collect()}
    assert got[0]["n_tokens"] == 4
    assert got[0]["distinct_frac"] == 0.25
    assert got[0]["top_token_frac"] == 1.0
    assert got[0]["top_bigram_frac"] == 1.0
    assert got[1]["top_token_frac"] == 0.6
    assert got[1]["top_bigram_frac"] == 0.5
    assert got[2]["distinct_frac"] == 1.0 and got[2]["top_token_frac"] == 0.25
    assert got[3]["n_tokens"] == 1 and got[3]["top_bigram_frac"] == 0.0


def test_line_dedup_stats_keep_first(spark):
    """Corpus-wide keep-first line dedup at 2-token lines; later
    occurrences (even within the same doc) are dropped."""
    docs = spark.createDataFrame(
        [(0, "a b a b c d"),   # "a b" twice in-doc: keep idx 0 only
         (1, "a b c d x y"),   # "a b"/"c d" already owned by doc 0
         (2, "x y"),           # owned by doc 1
         (3, "q")],            # short final chunk still a line
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r
           for r in T.line_dedup_stats(docs, line_tokens=2).collect()}
    assert (got[0]["n_lines"], got[0]["n_kept"]) == (3, 2)
    assert (got[1]["n_lines"], got[1]["n_kept"]) == (3, 1)
    assert (got[2]["n_lines"], got[2]["n_kept"]) == (1, 0)
    assert (got[3]["n_lines"], got[3]["n_kept"]) == (1, 1)
    assert got[1]["kept_frac"] == 0.333333


def test_incremental_dedup_content_level(spark):
    """The anti-join drops by CONTENT hash, not by id: a new doc whose
    text equals a seen doc's text drops even with a fresh doc_id; a
    lang-less table works (column is optional)."""
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma"), (2, "alpha beta"), (3, "delta")],
        "doc_id long, text string",
    )
    seen = docs.filter("doc_id = 0").selectExpr("md5(text) AS content_md5")
    got = sorted(
        r["doc_id"]
        for r in T.incremental_dedup(docs, seen).collect()
    )
    assert got == [1, 3]  # 0 seen; 2 dropped by content despite new id


def test_cap_per_group_tie_break_deterministic(spark):
    """Top-k per group prefers longer text; equal lengths break on
    doc_id ascending — the full expected set, not just counts."""
    docs = spark.createDataFrame(
        [(0, "aaaa", "en"), (1, "bbbb", "en"), (2, "cc", "en"),
         (3, "ddddd", "en"), (4, "e", "de")],
        "doc_id long, text string, lang string",
    )
    got = {(r["grp"], r["doc_id"], r["rank"])
           for r in T.cap_per_group(docs, 2).collect()}
    assert got == {("en", 3, 1), ("en", 0, 2), ("de", 4, 1)}


def test_pii_scrub_counts_and_redaction(spark):
    rows = [
        (0, "mail me at a.b+c@mail.example.org today"),
        (1, "call +44-123-456-7890 or +1-555-000-0199 now"),
        (2, "no pii here at all"),
        (3, "x@y.io and +1-222-333-4444 mixed"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in T.pii_scrub(df).collect()}
    assert got[0]["n_emails"] == 1 and got[0]["n_phones"] == 0
    assert got[1]["n_phones"] == 2 and got[1]["n_emails"] == 0
    assert got[2]["n_emails"] == 0 and got[2]["n_phones"] == 0
    assert got[3]["n_emails"] == 1 and got[3]["n_phones"] == 1
    # redaction really replaced the matches (length changed to the
    # fixed-token form) and is deterministic
    assert got[2]["n_chars_scrubbed"] == len(rows[2][1])
    assert got[3]["n_chars_scrubbed"] == len("<EMAIL> and <PHONE> mixed")


def test_stratified_sample_exact_quota_and_stability(spark):
    rows = [(i, f"text {i}", "en" if i % 3 else "de") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = T.stratified_sample(df, 4).collect()
    by_stratum = {}
    for r in got:
        by_stratum.setdefault(r["stratum"], set()).add(r["doc_id"])
    assert len(by_stratum["en"]) == 4 and len(by_stratum["de"]) == 4
    # pure function of ids: same sample under a different partitioning
    got2 = T.stratified_sample(df.repartition(7), 4).collect()
    assert {(r["doc_id"], r["stratum"]) for r in got} == {
        (r["doc_id"], r["stratum"]) for r in got2
    }
    # quota larger than the stratum keeps everything
    assert T.stratified_sample(df, 100).count() == 30


def test_mixture_epochs_copies_match_weight(spark):
    rows = [(i, f"s{i % 4}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = T.mixture_epochs(df).collect()
    import math

    by_doc = {}
    weights = {}
    for r in out:
        by_doc[r["doc_id"]] = max(by_doc.get(r["doc_id"], 0), r["epoch"])
        weights[r["source"]] = r["weight"]
        assert r["n_copies"] == len(
            [x for x in out if x["doc_id"] == r["doc_id"]]
        )
    # every doc's copy count is floor(w) or ceil(w)
    for r in out:
        w = weights[r["source"]]
        assert r["n_copies"] in (math.floor(w), math.ceil(w))
    # the mean copy count per source approaches the weight (50 docs per
    # source; hash fractions are uniform-ish — allow a wide band)
    from collections import defaultdict

    per_src = defaultdict(list)
    for d, _s in rows:
        src = f"s{d % 4}"
        per_src[src].append(by_doc.get(d, 0))
    for src, counts in per_src.items():
        mean = sum(counts) / len(counts)
        assert abs(mean - weights[src]) < 0.35, (src, mean, weights[src])


def test_mixture_epochs_custom_weight_expr(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, source string"
    )
    out = T.mixture_epochs(df, weight_expr="2.0D").collect()
    assert sorted((r["doc_id"], r["epoch"]) for r in out) == [
        (1, 1), (1, 2), (2, 1), (2, 2),
    ]


def test_weighted_sample_matches_scalar_twin_and_is_stable(spark):
    """The ES order-sample equals a from-scratch Python derivation of
    the same keys, and is invariant under re-sharding (pure function
    of the ids)."""
    import hashlib
    import math

    rows = [(i, 10 + (i * 37) % 991) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = sorted(r.doc_id for r in T.weighted_sample(df, 50).collect())
    got2 = sorted(
        r.doc_id
        for r in T.weighted_sample(df.repartition(7), 50).collect()
    )
    assert got == got2  # re-shard stable

    def key(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        u = (h + 0.5) / float(1 << 60)
        return math.log(u) / max(float(w), 1.0)

    want = sorted(
        i for i, _ in sorted(rows, key=lambda t: (-key(*t), t[0]))[:50]
    )
    assert got == want


def test_weighted_sample_favors_heavy_rows(spark):
    """10x-weighted rows are selected far more often than 1x rows —
    the ES inclusion-probability property, checked in aggregate."""
    rows = [(i, 1000 if i % 2 == 0 else 100) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    sel = [r.doc_id for r in T.weighted_sample(df, 200).collect()]
    heavy = sum(1 for i in sel if i % 2 == 0)
    assert len(sel) == 200
    # E[heavy] ~ 183 of 200 for w-ratio 10; require a clear majority
    assert heavy > 150


def test_decontaminate_semantics(spark):
    """Eval 5-grams flag exactly the docs that contain them: a full
    copy is 100% contaminated, a doc embedding the snippet mid-text
    partially, an unrelated doc 0; docs shorter than n carry no
    evidence (n_grams=0, kept)."""
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),   # superset of eval
            (1, "prefix words alpha beta gamma delta epsilon then suffix"),
            (2, "totally unrelated content about something else entirely x"),
            (3, "too short"),                              # < n tokens
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [("alpha beta gamma delta epsilon",)], "text string"
    )
    got = {r["doc_id"]: r for r in
           T.decontaminate(docs, ev, n=5).collect()}
    # doc 0: 2 distinct 5-grams, 1 hit (the eval snippet itself)
    assert (got[0]["n_grams"], got[0]["n_hit"]) == (2, 1)
    assert got[0]["contam_ppm"] == 500_000 and got[0]["keep"] == 0
    # doc 1: 5 distinct 5-grams, exactly one matches
    assert (got[1]["n_grams"], got[1]["n_hit"]) == (5, 1)
    assert got[1]["contam_ppm"] == 200_000 and got[1]["keep"] == 0
    # doc 2: clean
    assert got[2]["n_hit"] == 0 and got[2]["keep"] == 1
    # doc 3: no 5-grams at all — kept, zero evidence
    assert (got[3]["n_grams"], got[3]["n_hit"]) == (0, 0)
    assert got[3]["keep"] == 1


def test_decontaminate_threshold_and_dup_grams(spark):
    """max_contam_ppm gates keep; repeated n-grams in a doc count
    once (distinct semantics), so a doc made of one repeated eval
    phrase is 100% contaminated."""
    docs = spark.createDataFrame(
        [(0, "a b c d e a b c d e a b c d e")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([("a b c d e",)], "text string")
    rows = T.decontaminate(docs, ev, n=5).collect()
    # 15 tokens -> 11 positions but few DISTINCT 5-grams (cycle of 5)
    assert rows[0]["n_grams"] == 5
    assert rows[0]["n_hit"] == 1  # only 'a b c d e' matches
    assert rows[0]["contam_ppm"] == 200_000
    # loose threshold keeps it
    loose = T.decontaminate(docs, ev, n=5, max_contam_ppm=300_000).collect()
    assert loose[0]["keep"] == 1


def test_dup_span_stats_cross_doc_only(spark):
    """Shared 12-token run between two docs marks exactly its 10-gram
    windows; within-doc repetition alone marks nothing; short docs
    report 0/0/0."""
    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 s11 s12"   # 12 tokens
    docs = spark.createDataFrame(
        [
            (0, shared + " u1 u2 u3 u4 u5 u6 u7 u8"),    # 20 tokens
            (1, "v1 v2 v3 v4 v5 v6 v7 v8 " + shared),    # 20 tokens
            (2, "r1 r2 r3 r4 r5 r1 r2 r3 r4 r5 r1 r2 r3 r4 r5 r1 r2 r3 r4 r5"),
            (3, "x1 x2 x3"),                              # < n tokens
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           T.dup_span_stats(docs, n=10).collect()}
    # 20 tokens -> 11 windows each; the shared run contributes 3
    # all-shared windows at its start/end of each doc
    assert got[0]["n_positions"] == 11 and got[0]["n_dup_positions"] == 3
    assert got[1]["n_positions"] == 11 and got[1]["n_dup_positions"] == 3
    assert got[0]["dup_ppm"] == 3 * 1_000_000 // 11
    # doc 2: heavy SELF repetition, no cross-doc grams
    assert got[2]["n_dup_positions"] == 0
    assert (got[3]["n_positions"], got[3]["dup_ppm"]) == (0, 0)


def test_dup_span_stats_exact_copy(spark):
    """A full duplicate pair is 100% duplicated spans."""
    t = " ".join(f"w{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(0, t), (1, t)], "doc_id long, text string"
    )
    rows = T.dup_span_stats(docs, n=10).collect()
    for r in rows:
        assert r["n_positions"] == 21
        assert r["n_dup_positions"] == 21
        assert r["dup_ppm"] == 1_000_000


def test_scrub_dup_spans_keep_one(spark):
    """The keeper (lowest doc_id holding a gram) keeps its span; the
    other doc loses the covered union of its duplicated windows;
    self-repetition and short docs pass through verbatim."""
    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 s11 s12"   # 12 tokens
    d0 = shared + " u1 u2 u3 u4 u5 u6 u7 u8"
    d1 = "v1 v2 v3 v4 v5 v6 v7 v8 " + shared
    d2 = "r1 r2 r3 r4 r5 " * 4
    docs = spark.createDataFrame(
        [(0, d0), (1, d1), (2, d2.strip()), (3, "x1 x2 x3")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in T.scrub_dup_spans(docs, n=10).collect()}
    assert got[0]["text"] == d0 and got[0]["n_removed"] == 0
    # doc 1: dup windows start at 8,9,10 -> covered tokens [8,20) = the
    # whole shared run
    assert got[1]["text"] == "v1 v2 v3 v4 v5 v6 v7 v8"
    assert got[1]["n_removed"] == 12 and got[1]["n_tokens"] == 20
    assert got[2]["text"] == d2.strip() and got[2]["n_removed"] == 0
    assert got[3]["text"] == "x1 x2 x3" and got[3]["n_tokens"] == 3


def test_scrub_dup_spans_full_copies(spark):
    """Exact duplicate docs: the lowest id survives intact, every
    other copy scrubs to empty."""
    t = " ".join(f"w{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(0, t), (1, t), (2, t)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in T.scrub_dup_spans(docs, n=10).collect()}
    assert got[0]["text"] == t and got[0]["n_removed"] == 0
    for i in (1, 2):
        assert got[i]["text"] == "" and got[i]["n_removed"] == 30


def test_scrub_dup_spans_matches_python_twin(spark):
    """Parity vs an independent scalar twin on a deterministic corpus
    with partial overlaps, chained sharing, and unique docs."""
    n = 5
    words = [f"t{i}" for i in range(40)]
    texts = {
        0: " ".join(words[0:20]),
        1: " ".join(words[30:40] + words[5:15]),       # shares 5..14 with 0
        2: " ".join(words[10:25]),                     # shares 10..19 w/ 0, 10..14 w/ 1
        3: " ".join(f"z{i}" for i in range(12)),       # unique
        4: " ".join(words[0:6]),                       # shares 0..5 with 0
    }

    def twin():
        toks = {d: t.split() for d, t in texts.items()}
        holders: dict[tuple, list] = {}
        for d, ts in toks.items():
            for i in range(len(ts) - n + 1):
                holders.setdefault(tuple(ts[i:i + n]), []).append(d)
        out = {}
        for d, ts in toks.items():
            cov = set()
            for i in range(len(ts) - n + 1):
                hs = holders[tuple(ts[i:i + n])]
                if len(set(hs)) > 1 and d != min(hs):
                    cov.update(range(i, i + n))
            kept = [t for j, t in enumerate(ts) if j not in cov]
            out[d] = (" ".join(kept), len(ts), len(cov))
        return out

    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed"])
           for r in T.scrub_dup_spans(docs, n=n).collect()}
    assert got == twin()


def test_bm25_topk_matches_python_twin(spark):
    """bm25_topk vs an independent scalar twin: exact BIGINT scores
    and ranking on a corpus with repeated terms, varied doc lengths,
    and one doc matching nothing."""
    import math

    corpus = [
        (0, "spark join fast spark spark table"),
        (1, "join fast"),
        (2, "window agg sort window table row scan value key agg"),
        (3, "the a of and or but"),          # matches nothing
        (4, "fast fast fast fast join spark window"),
    ]
    queries = [(1, ["spark", "join", "fast"]), (2, ["window", "agg"])]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        (r["query_id"], r["rn"]): (r["doc_id"], r["score_q"])
        for r in T.bm25_topk(docs, queries, k=3).collect()
    }

    toks = {d: t.split() for d, t in corpus}
    n = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    want = {}
    for qid, terms in queries:
        scores = {}
        for d, t in toks.items():
            s = 0
            for term in terms:
                tf = t.count(term)
                if not tf:
                    continue
                idf = math.log(
                    1.0 + (n - df[term] + 0.5) / (df[term] + 0.5)
                )
                norm = (tf * (T.BM25_K1 + 1.0)) / (
                    tf + T.BM25_K1
                    * (1.0 - T.BM25_B + T.BM25_B * len(t) / avgdl)
                )
                s += math.floor(1000.0 * idf) * math.floor(1000.0 * norm)
            if s or any(term in t for term in terms):
                scores[d] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        for rn, (d, s) in enumerate(ranked[:3], 1):
            want[(qid, rn)] = (d, s)
    assert got == want


def test_lm_score_hand_computed(spark):
    """Add-0.5 bigram LM on a tiny 'en' reference; every nll term
    hand-derivable: uni = {a:3, b:2}, V=2, bi = {(a,b):1, (b,a):2}."""
    import math

    docs = spark.createDataFrame(
        [
            (0, "a b a", "en"),   # ref: bigrams (a,b), (b,a)
            (1, "b a", "en"),     # ref: bigram (b,a)
            (2, "a b", "xx"),     # scored: seen bigram
            (3, "z z", "xx"),     # scored: fully OOV
            (4, "a", "xx"),       # scored: <2 tokens -> 0/0
        ],
        "doc_id long, text string, lang string",
    )
    got = {r["doc_id"]: r for r in T.lm_score(docs, "en").collect()}

    def nll(c12, c1, v=2):
        return math.floor(-math.log((c12 + 0.5) / (c1 + 0.5 * v)) * 1e6)

    # doc 2: (a,b) -> (1+.5)/(3+1)
    assert (got[2]["n_bigrams"], got[2]["nll_micro"]) == (1, nll(1, 3))
    # doc 3: (z,z) OOV -> (0+.5)/(0+1) = 0.5
    assert (got[3]["n_bigrams"], got[3]["nll_micro"]) == (1, nll(0, 0))
    # doc 4: single token survives with zeros
    assert (got[4]["n_bigrams"], got[4]["nll_micro"]) == (0, 0)
    # reference docs are scored too; doc 1 = one (b,a) hit: (2+.5)/(2+1)
    assert (got[1]["n_bigrams"], got[1]["nll_micro"]) == (1, nll(2, 2))
    # doc 0: (a,b) + (b,a)
    assert got[0]["nll_micro"] == nll(1, 3) + nll(2, 2)
    # low-perplexity ordering: in-distribution doc 1 beats OOV doc 3
    assert got[1]["nll_micro"] < got[3]["nll_micro"]


def test_bpe_train_matches_classic(spark):
    """Relational BPE fold == classic dict BPE (the Sennrich 2016
    worked example: est</w> assembles in 3 merges at count 9) — and
    the overlapping-run merge is left-to-right non-overlapping."""
    from geospark.goldens import bpe_merges

    corpus = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6
              + ["widest"] * 3)
    docs = spark.createDataFrame(
        [(0, " ".join(corpus))], "doc_id long, text string")
    got = [(r["rank"], r["lhs"], r["rhs"], r["pair_count"])
           for r in T.bpe_train(docs, n_merges=5).collect()]
    want = bpe_merges([("low", 5), ("lower", 2), ("newest", 6),
                       ("widest", 3)], 5)
    assert got == want
    assert got[:3] == [(1, "e", "s", 9), (2, "es", "t", 9),
                       (3, "est", "</w>", 9)]

    # overlapping pair run: 'aaaa' counts 3 adjacent (a,a) positions
    # but merges to exactly two 'aa' symbols (left-to-right)
    docs2 = spark.createDataFrame(
        [(0, "aaaa aaaa aaaa")], "doc_id long, text string")
    got2 = [(r["rank"], r["lhs"], r["rhs"], r["pair_count"])
            for r in T.bpe_train(docs2, n_merges=2).collect()]
    assert got2 == bpe_merges([("aaaa", 3)], 2)
    assert got2[0] == (1, "a", "a", 9)   # 3 positions x freq 3
    # round 2 ties (aa,aa) with (aa,</w>) at 3; '<' sorts before 'a'
    assert got2[1] == (2, "aa", "</w>", 3)


def test_bpe_encode_matches_classic(spark):
    """Train->apply roundtrip: bpe_encode replaying bpe_train's rules
    == the classic dict twin (goldens.bpe_encode_py) on the Sennrich
    corpus; 'newest'/'widest' share the 'est</w>' token after 3
    merges (n_words=2, count=9)."""
    from geospark.goldens import bpe_encode_py, bpe_merges

    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    corpus = [w for w, f in wf for _ in range(f)]
    docs = spark.createDataFrame(
        [(0, " ".join(corpus))], "doc_id long, text string")
    merges = [(l, r) for _, l, r, _ in bpe_merges(wf, 5)]
    got = sorted(
        (r["token"], r["n_words"], r["count"])
        for r in T.bpe_encode(docs, merges).collect()
    )
    assert got == bpe_encode_py(wf, merges)
    assert ("est</w>", 2, 9) in got


# --------------------------------------------------------------------
# Sequence packing (textops.pack_sequences): concat-and-chunk spans.
# --------------------------------------------------------------------

def _pack_py(docs, L):
    """Sequential golden: [(doc_id, seq_id, doc_off, seq_off, len)]."""
    out, cum = [], 0
    for doc_id, text in sorted(docs):
        n = len(text.split(" ")) if text else 1
        s, e = cum, cum + n
        cum = e
        for seq in range(s // L, (e - 1) // L + 1):
            a = max(s, seq * L)
            b = min(e, (seq + 1) * L)
            out.append((doc_id, seq, a - s, a - seq * L, b - a))
    return sorted(out)


def _pack_docs():
    rng = np.random.default_rng(11)
    return [(i, " ".join("w" * 3 for _ in range(int(rng.integers(1, 40)))))
            for i in range(60)]


def test_pack_sequences_matches_sequential_golden(spark):
    from geospark.textops import pack_sequences

    docs = _pack_docs()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(map(tuple, pack_sequences(df, seq_len=16,
                                           n_shards=7).collect()))
    assert got == _pack_py(docs, 16)


def test_pack_sequences_shard_invariance_and_conservation(spark):
    from geospark.textops import pack_sequences

    docs = _pack_docs()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(map(tuple, pack_sequences(df, seq_len=16,
                                         n_shards=1).collect()))
    b = sorted(map(tuple, pack_sequences(df, seq_len=16,
                                         n_shards=32).collect()))
    assert a == b
    # conservation: every token of every doc lands in exactly one span
    per_doc = {}
    per_seq = {}
    for doc_id, seq_id, doc_off, seq_off, ln in a:
        per_doc[doc_id] = per_doc.get(doc_id, 0) + ln
        per_seq[seq_id] = per_seq.get(seq_id, 0) + ln
    for doc_id, text in docs:
        assert per_doc[doc_id] == len(text.split(" "))
    full = sorted(per_seq)[:-1]
    assert all(per_seq[s] == 16 for s in full)   # zero padding


def test_importance_resample_matches_scalar_twin(spark):
    """DSIR importance resampling vs an independent scalar twin: exact
    BIGINT milli-weights and ranking on a corpus where 'en' docs share
    vocabulary (positive weights) and 'de' docs don't (negative), with
    a doc mixing both and one empty doc (excluded: no features)."""
    import hashlib
    import math

    corpus = [
        (0, "en", "data model spark data"),
        (1, "en", "spark table data"),
        (2, "de", "der die das der"),
        (3, "de", "und oder das"),
        (4, "en", "data der spark das"),   # mixed vocabulary
        (5, "en", "   "),                  # no tokens -> excluded
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, lang string, text string")
    got = [tuple(r) for r in T.importance_resample(
        docs, k=5, n_buckets=64).collect()]

    B, a = 64, 0.5

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % B

    counts_raw, counts_t = {}, {}
    for _, lang, text in corpus:
        for tok in text.split():
            b = bucket(tok)
            counts_raw[b] = counts_raw.get(b, 0) + 1
            if lang == "en":
                counts_t[b] = counts_t.get(b, 0) + 1
    tot_raw = sum(counts_raw.values())
    tot_t = sum(counts_t.values())

    def lp(c, tot):
        return math.floor(1000.0 * math.log((c + a) / (tot + a * B)))

    want = []
    for did, lang, text in corpus:
        toks = text.split()
        if not toks:
            continue
        wgt = sum(
            lp(counts_t.get(bucket(t), 0), tot_t)
            - lp(counts_raw[bucket(t)], tot_raw) for t in toks)
        want.append((did, len(toks), wgt))
    want.sort(key=lambda r: (-r[2], r[0]))
    want = [(i + 1, *r) for i, r in enumerate(want[:5])]
    assert got == want
    # the en-only docs must outrank the de-only docs
    rank = {d: rn for rn, d, _, _ in got}
    assert max(rank[0], rank[1]) < min(rank[2], rank[3])


def test_lm_score_kn_hand_computed(spark):
    """Interpolated KN on a hand-derivable 'en' reference:
    bi = {(a,b):1, (b,a):2, (a,c):1}, ctx a:(2,2) b:(2,1),
    cont a/b/c: 1 each, N1+(**)=3, V=3 -> pc(seen)=1.5/5,
    pc(unseen)=0.5/5. Covers: seen bigram, unseen bigram under a
    seen context, and an unseen context backing off to pc."""
    import math

    docs = spark.createDataFrame(
        [
            (0, "en", "a b a c"),
            (1, "en", "b a"),
            (2, "de", "a b x"),     # (a,b) seen; (b,x) unseen cont.
            (3, "de", "x a"),       # unseen context -> pc(a)
            (4, "de", "solo"),      # <2 tokens -> 0 bigrams
        ],
        "doc_id long, lang string, text string",
    )
    got = {r["doc_id"]: (r["n_bigrams"], r["nll_micro"])
           for r in T.lm_score_kn(docs, "en").collect()}

    def q(p):
        return math.floor((0.0 - math.log(p)) * 1000000.0)

    pc_seen = (1 + 0.5) / (3 + 0.5 * (3 + 1.0))
    pc_unseen = (0 + 0.5) / (3 + 0.5 * (3 + 1.0))
    p_ab = (1 - 0.75) / 2 + 0.75 * 2 / 2 * pc_seen
    p_bx = 0.0 + 0.75 * 1 / 2 * pc_unseen
    p_ba = (2 - 0.75) / 2 + 0.75 * 1 / 2 * pc_seen
    p_ac = (1 - 0.75) / 2 + 0.75 * 2 / 2 * pc_seen
    assert got[2] == (2, q(p_ab) + q(p_bx))
    assert got[3] == (1, q(pc_seen))           # x unseen context -> pc(a)
    assert got[4] == (0, 0)
    assert got[0] == (3, q(p_ab) + q(p_ba) + q(p_ac))
    assert got[1] == (1, q(p_ba))
    # KN ordering sanity: a seen bigram scores far better than an
    # unseen continuation under the same context
    assert q(p_ab) < q(p_bx)


def test_importance_sample_gumbel_properties(spark):
    """sample=True draws a DIFFERENT set than arg-top-k (the Gumbel
    noise matters), is deterministic across invocations, prefers
    high-weight docs in aggregate, and returns dense ranks."""
    corpus = [
        (i, "en" if i % 2 == 0 else "de",
         ("data spark model " if i % 2 == 0 else "der das und ") * 4)
        for i in range(60)
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, lang string, text string")
    top = T.importance_resample(docs, k=20, n_buckets=64)
    smp = T.importance_resample(docs, k=20, n_buckets=64, sample=True)
    t1 = [tuple(r) for r in top.collect()]
    s1 = [tuple(r) for r in smp.collect()]
    s2 = [tuple(r) for r in T.importance_resample(
        docs, k=20, n_buckets=64, sample=True).collect()]
    assert s1 == s2                       # deterministic draw
    assert [r[0] for r in s1] == list(range(1, 21))  # dense ranks
    # with en-vocab weights >> de-vocab weights, the softmax draw
    # keeps a clear en majority, but the exact set differs from the
    # deterministic arg-top-k (all-en) because Gumbel noise reorders
    en = sum(1 for r in s1 if r[1] % 2 == 0)
    assert en >= 14
    assert {r[1] for r in s1} != {r[1] for r in t1}
