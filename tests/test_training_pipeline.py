"""End-to-end training-data rehearsal: extract -> dedup(x2) ->
decontaminate -> pii_scrub -> split -> pack through runtime.Pipeline
snapshot commits, with crash-resume bit-identity."""

from __future__ import annotations

import hashlib
import shutil
import tempfile

from pyspark.sql import functions as F

from geospark.pages import synth_documents
from geospark.runtime import Pipeline
from geospark.training import (
    stage_extract,
    synth_corpus_pages,
    training_stages,
)

N = 3000


def _hash_df(df) -> str:
    rows = sorted(tuple(r) for r in df.collect())
    return hashlib.md5(repr(rows).encode()).hexdigest()


def _stages(spark):
    eval_texts = synth_documents(spark, 50)
    return training_stages(eval_texts, seq_len=128, pack_shards=4)


def test_extract_byte_identity(spark):
    """North-rule invariant: the extract stage reproduces the original
    text byte-for-byte per doc (modulo the deterministic PII payload
    the corpus generator appends for the scrub stage)."""
    pages = synth_corpus_pages(spark, 500)
    got = stage_extract(pages)
    orig = synth_documents(spark, 500).select(
        "doc_id", F.col("text").alias("orig"))
    joined = got.join(orig, "doc_id")
    mism = joined.filter(
        ~F.col("text").startswith(F.col("orig"))
    ).count()
    assert mism == 0
    # PII payload present where the generator put it
    assert joined.filter(
        (F.col("doc_id") % 97 == 0) & ~F.col("text").contains("@example.com")
    ).count() == 0


def test_training_pipeline_stages_shrink_and_scrub(spark):
    tmp = tempfile.mkdtemp(prefix="geospark_train_a_")
    try:
        pipe = Pipeline(spark, tmp)
        final = pipe.run(synth_corpus_pages(spark, N), _stages(spark))
        # every stage committed + lineage rows for each
        stages_seen = {
            r["stage"] for r in pipe.lineage().select("stage").distinct().collect()
        }
        assert stages_seen == {
            "extract", "exact_dedup", "neardup_dedup", "decontaminate",
            "pii_scrub", "split", "pack",
        }
        rows = {
            s: pipe.table(s).current()["rows"]
            for s in ["_source", "extract", "exact_dedup", "neardup_dedup",
                      "decontaminate", "pii_scrub", "split"]
        }
        assert rows["_source"] == rows["extract"] == N
        # the dup-structured corpus must actually shrink at each dedup
        assert rows["exact_dedup"] < N
        assert rows["neardup_dedup"] < rows["exact_dedup"]
        assert rows["decontaminate"] < rows["neardup_dedup"]
        assert rows["pii_scrub"] == rows["decontaminate"]
        # scrub really redacted the injected payloads
        scrubbed = pipe.table("pii_scrub").read()
        assert scrubbed.filter(F.col("text").contains("@example.com")).count() == 0
        assert scrubbed.filter(F.col("n_emails") > 0).count() > 0
        assert scrubbed.filter(F.col("n_phones") > 0).count() > 0
        # packing produced spans for the train split only
        assert final.count() > 0
        assert {r["split"] for r in pipe.table("split").read()
                .select("split").distinct().collect()} == {
            "train", "val", "test"}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_training_pipeline_crash_resume_bit_identical(spark):
    """Kill after stage N, resume, and the final packed output hashes
    identical to an uninterrupted run (snapshot commits make each
    stage's output deterministic state, not recomputation)."""
    a = tempfile.mkdtemp(prefix="geospark_train_full_")
    b = tempfile.mkdtemp(prefix="geospark_train_crash_")
    try:
        full = Pipeline(spark, a).run(
            synth_corpus_pages(spark, N), _stages(spark))
        want = _hash_df(full)

        # crashed run: only the first 3 stages commit, then the
        # process dies (new Pipeline object = new process)
        Pipeline(spark, b).run(synth_corpus_pages(spark, N), _stages(spark)[:3])

        resume = Pipeline(spark, b)
        final = resume.run(synth_corpus_pages(spark, N), _stages(spark))
        assert _hash_df(final) == want
        # the resumed run did NOT re-run the committed stages: its
        # run_id only stamped the post-crash stages
        redone = {
            r["stage"]
            for r in resume.lineage()
            .filter(f"run_id = '{resume.run_id}'")
            .select("stage").distinct().collect()
        }
        assert redone == {"decontaminate", "pii_scrub", "split", "pack"}
    finally:
        shutil.rmtree(a, ignore_errors=True)
        shutil.rmtree(b, ignore_errors=True)
