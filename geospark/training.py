"""End-to-end training-data rehearsal (VERDICT r03 task #7).

The full pre-training data pipeline over a crawl-pages table, every
stage committed through :class:`geospark.runtime.Pipeline` /
``SnapshotTable`` so a crashed run resumes from the last good
snapshot and replays to a BIT-IDENTICAL final output:

    pages --extract--> docs --exact_dedup--> --neardup_dedup-->
    --decontaminate--> --pii_scrub--> --split--> --pack--> sequences

Stage shapes (each one scale-audited elsewhere in the repo):
- extract: Arrow-batched html->text (pages.extract_text_from_html,
  byte-identical per url — the north-rule invariant), pure map;
- exact_dedup: one shuffle on md5(text) (textops.exact_dedup);
- neardup_dedup: MinHash-LSH pairs + connected-components keep-one
  closure (textops.minhash_neardup_pairs + graph.neardup_dedup);
- decontaminate: broadcast eval-shingle anti-overlap
  (textops.decontaminate);
- pii_scrub: two codegen regexp passes, narrow (textops.pii_scrub);
- split: id-hash train/val/test, narrow (textops.split_assign);
- pack: two-level prefix-scan concat-and-chunk packing
  (textops.pack_sequences) over the train split.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import geospark.textops as T
from geospark.graph import neardup_dedup
from geospark.runtime import Stage


def synth_corpus_pages(spark: SparkSession, n_docs: int,
                       partitions: int | None = None) -> DataFrame:
    """Deterministic crawl-pages input for the rehearsal: the
    dup-structured synth_documents corpus (15% of docs are 0-3-token
    mutations of a 5% canonical pool) wrapped in the reference html
    shape, with a deterministic PII payload on a slice of docs
    (email on doc_id%97==0, E.164 phone on doc_id%131==0) so the
    scrub stage has real work. Columns: (doc_id, html binary, lang).
    """
    from geospark.pages import synth_documents

    docs = synth_documents(spark, n_docs, partitions=partitions)
    text = F.col("text")
    text = F.when(
        F.col("doc_id") % 97 == 0,
        F.concat(text, F.lit(" contact: user"),
                 F.col("doc_id").cast("string"), F.lit("@example.com")),
    ).otherwise(text)
    text = F.when(
        F.col("doc_id") % 131 == 0,
        F.concat(text, F.lit(" tel: +1-415-555-"),
                 F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")),
    ).otherwise(text)
    html = F.encode(
        F.concat(F.lit("<html><head><title>p</title></head><body><p>"),
                 text, F.lit("</p></body></html>")),
        "utf-8",
    )
    lang = F.element_at(
        F.array(*[F.lit(code) for code in ("en", "de", "fr", "es", "pt")]),
        (F.col("doc_id") % 5 + 1).cast("int"),
    )
    return docs.select("doc_id", html.alias("html"), lang.alias("lang"))


def stage_extract(pages: DataFrame) -> DataFrame:
    """html -> text with the reference extractor, Arrow-batched
    (python loop is per page over already-decoded batch lists — the
    extraction itself is two byte-searches; no per-row UDF overhead).
    """
    import pyarrow as pa

    from geospark.pages import extract_text_from_html

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            tbl = pa.Table.from_batches([b])
            texts = [
                extract_text_from_html(h).decode("utf-8")
                for h in tbl.column("html").to_pylist()
            ]
            yield pa.record_batch(
                [
                    tbl.column("doc_id").combine_chunks(),
                    pa.array(texts, pa.string()),
                    tbl.column("lang").combine_chunks(),
                    pa.array([len(t) for t in texts], pa.int32()),
                ],
                names=["doc_id", "text", "lang", "n_chars"],
            )

    return pages.mapInArrow(
        run, "doc_id long, text string, lang string, n_chars int"
    )


def stage_exact_dedup(docs: DataFrame) -> DataFrame:
    dd = T.exact_dedup(docs)
    keep = dd.filter(F.col("doc_id") == F.col("canonical_id")).select("doc_id")
    return docs.join(keep, "doc_id")


def stage_neardup_dedup(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    pairs = T.minhash_neardup_pairs(docs, threshold=threshold)
    dd = neardup_dedup(docs, pairs)
    keep = dd.filter(F.col("is_dup") == 0).select("doc_id")
    return docs.join(keep, "doc_id")


def stage_decontaminate(docs: DataFrame, eval_texts: DataFrame,
                        n: int = 5) -> DataFrame:
    flags = T.decontaminate(docs, eval_texts, n=n)
    keep = flags.filter(F.col("keep") == 1).select("doc_id")
    return docs.join(keep, "doc_id")


def stage_pii_scrub(docs: DataFrame) -> DataFrame:
    scr = T.pii_scrub(docs, with_text=True)
    return scr.join(docs.select("doc_id", "lang"), "doc_id").select(
        "doc_id", "text", "lang",
        F.col("n_chars_scrubbed").alias("n_chars"),
        "n_emails", "n_phones",
    )


def stage_split(docs: DataFrame) -> DataFrame:
    return T.split_assign(docs)


def stage_pack(docs: DataFrame, seq_len: int = 2048,
               n_shards: int = 32) -> DataFrame:
    return T.pack_sequences(
        docs.filter(F.col("split") == "train"),
        seq_len=seq_len, n_shards=n_shards,
    )


def training_stages(eval_texts: DataFrame, seq_len: int = 2048,
                    pack_shards: int = 32,
                    neardup_threshold: float = 0.5) -> list[Stage]:
    """The canonical stage chain for runtime.Pipeline.run."""
    return [
        Stage("extract", stage_extract),
        Stage("exact_dedup", stage_exact_dedup),
        Stage("neardup_dedup",
              lambda d: stage_neardup_dedup(d, neardup_threshold)),
        Stage("decontaminate", lambda d: stage_decontaminate(d, eval_texts)),
        Stage("pii_scrub", stage_pii_scrub),
        Stage("split", stage_split),
        Stage("pack", lambda d: stage_pack(d, seq_len, pack_shards)),
    ]
