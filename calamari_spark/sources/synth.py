"""Deterministic synthetic interleaved-document corpus.

Produces the engine's primary input shape (BASELINE.json input_hint):

  documents(doc_id string,
            spans array<struct<kind string, text string,
                               media_ref string, offset int>>)
  line_images(media_ref string, png binary, gt string,
              width int, height int)

Everything is a pure function of (doc index, corpus name): seeded by
sha256, no wall-clock, no global RNG — identical output under Spark task
retries. Mirrors FIXTURES.md §1-2 and the reference's own synthetic
line-data approach (reference: generated_line_dataset/line_generator.py,
dataset.py).

Generation is distributed: a range of doc indices is fanned out with
mapInPandas so a 10^12-doc corpus would materialize in parallel without a
driver loop.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, List, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from calamari_spark.sources.font import render_line
from calamari_spark.sources.pngio import encode_png

# words drawn only from the default codec charset
WORDS = (
    "the problem simplified for our purposes is set up as spark line data "
    "scan merge sort join order table filter group query batch value text "
    "image model vote fold char word page doc span media offset kind"
).split()

# boilerplate noise injected into text spans: targets of strip/regularizer
NOISE_PREFIX = ["", "  ", "\n ", "   \n"]
NOISE_INFIX = [" ", "  ", "   "]
NOISE_QUOTES = [("", ""), ("“", "”"), ("'", "'")]

SPANS_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("kind", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("media_ref", T.StringType()),
            T.StructField("offset", T.IntegerType()),
        ]
    )
)

DOCUMENTS_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.StringType()), T.StructField("spans", SPANS_SCHEMA)]
)

LINE_IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("png", T.BinaryType()),
        T.StructField("gt", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def _rng(*keys) -> np.random.RandomState:
    h = hashlib.sha256("|".join(str(k) for k in keys).encode()).digest()
    return np.random.RandomState(np.frombuffer(h[:4], dtype=np.uint32)[0])


def make_sentence(rng: np.random.RandomState, n_words: int) -> str:
    return " ".join(WORDS[rng.randint(0, len(WORDS))] for _ in range(n_words))


def gen_document(doc_idx: int, corpus: str = "main", skew_tail: bool = True,
                 with_media: bool = True) -> Tuple[str, List[dict], List[dict]]:
    """One document: (doc_id, spans, media_rows).

    ~1% of docs get 500-2000 spans (skew tail exercising salted
    reassembly, FIXTURES.md §1); others 3-40 spans. ``with_media=False``
    skips the (expensive) rendering but draws the identical RNG sequence,
    so the spans pass and the media pass stay in lockstep.
    """
    rng = _rng(corpus, doc_idx)
    doc_id = f"doc_{doc_idx:09d}"
    if skew_tail and rng.rand() < 0.01:
        n_spans = int(rng.randint(500, 2001))
    else:
        n_spans = int(rng.randint(3, 41))
    spans, media_rows = [], []
    for off in range(n_spans):
        if rng.rand() < 0.45:  # media span
            ref = f"{doc_id}_m{off:05d}"
            gt = make_sentence(rng, int(rng.randint(2, 7)))
            warp = float(rng.rand() * 3.0)
            freq = 0.01 + 0.02 * rng.rand()
            height = int(rng.randint(30, 50))
            if with_media:
                img = render_line(gt, warp_amp=warp, warp_freq=freq, height=height)
                media_rows.append(
                    {
                        "media_ref": ref,
                        "png": encode_png(img),
                        "gt": gt,
                        "width": int(img.shape[1]),
                        "height": int(img.shape[0]),
                    }
                )
            spans.append({"kind": "media", "text": None, "media_ref": ref, "offset": off})
        else:  # text span with boilerplate noise
            core = make_sentence(rng, int(rng.randint(3, 12)))
            q0, q1 = NOISE_QUOTES[rng.randint(0, len(NOISE_QUOTES))]
            sep = NOISE_INFIX[rng.randint(0, len(NOISE_INFIX))]
            pre = NOISE_PREFIX[rng.randint(0, len(NOISE_PREFIX))]
            suf = NOISE_PREFIX[rng.randint(0, len(NOISE_PREFIX))]
            noisy = pre + q0 + core.replace(" ", sep) + q1 + suf
            spans.append({"kind": "text", "text": noisy, "media_ref": None, "offset": off})
    return doc_id, spans, media_rows


def generate_corpus(spark: SparkSession, n_docs: int, corpus: str = "main",
                    skew_tail: bool = True, partitions: int | None = None
                    ) -> Tuple[DataFrame, DataFrame]:
    """Distributed generation: (documents_df, line_images_df)."""
    partitions = partitions or max(8, n_docs // 256)
    idx = spark.range(n_docs).repartition(partitions)

    def gen_docs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i in b["id"]:
                doc_id, spans, _ = gen_document(int(i), corpus, skew_tail,
                                                with_media=False)
                rows.append({"doc_id": doc_id, "spans": spans})
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    def gen_media(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i in b["id"]:
                _, _, media = gen_document(int(i), corpus, skew_tail)
                rows.extend(media)
            yield pd.DataFrame(rows, columns=["media_ref", "png", "gt", "width", "height"])

    docs = idx.mapInPandas(gen_docs, schema=DOCUMENTS_SCHEMA)
    media = idx.mapInPandas(gen_media, schema=LINE_IMAGES_SCHEMA)
    return docs, media


def write_corpus(spark: SparkSession, out_dir: str, n_docs: int,
                 corpus: str = "main", skew_tail: bool = True) -> None:
    docs, media = generate_corpus(spark, n_docs, corpus, skew_tail)
    docs.write.mode("overwrite").parquet(f"{out_dir}/documents_spans.parquet")
    media.write.mode("overwrite").parquet(f"{out_dir}/line_images.parquet")
    write_vocab(spark, out_dir)


def write_vocab(spark: SparkSession, out_dir: str) -> None:
    """The offline LM-training step: word -> count over the corpus ground
    truth, persisted next to the corpus as ``vocab.json``. Dictionary
    decoders (word-beam / token-passing / word-LM) load this MODEL CONSTANT
    instead of running a corpus-wide distinct().collect() per query — the
    same shipped-artifact pattern as the IVF centroids. Runs once per
    corpus materialization; the aggregate's output is bounded by the
    vocabulary (closed by construction here; at a real corpus this job is
    the LM-training pipeline and ships its artifact the same way)."""
    import json
    import os

    media = spark.read.parquet(f"{out_dir}/line_images.parquet")
    counts = (
        media.select(F.explode(F.split("gt", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .count()
        .collect()
    )
    vocab = {r["w"]: int(r["count"]) for r in counts}
    tmp = os.path.join(out_dir, "vocab.json.tmp")
    with open(tmp, "w") as f:
        json.dump(vocab, f, sort_keys=True, indent=0)
    os.replace(tmp, os.path.join(out_dir, "vocab.json"))

    # bigram counts over per-line adjacency (lines are the LM's sentence
    # units — no cross-line pairs), keyed "w1 w2"; the model constant the
    # count-aware WordLM.from_counts consumes for bigram rescoring
    words = media.select(F.split("gt", " ").alias("ws")).filter(
        F.size("ws") >= 2  # sequence(0, size-2) would DESCEND for 1-word lines
    )
    pairs = (
        words.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("ws") - 2),
                    lambda i: F.concat_ws(" ", F.col("ws")[i], F.col("ws")[i + 1]),
                )
            ).alias("pair")
        )
        .filter(~F.col("pair").contains("  ") & (F.col("pair") != ""))
        .groupBy("pair")
        .count()
        .collect()
    )
    bigrams = {r["pair"]: int(r["count"]) for r in pairs if " " in r["pair"].strip()}
    tmp = os.path.join(out_dir, "vocab_bigrams.json.tmp")
    with open(tmp, "w") as f:
        json.dump(bigrams, f, sort_keys=True, indent=0)
    os.replace(tmp, os.path.join(out_dir, "vocab_bigrams.json"))


def expected_text_output(noisy: str) -> str:
    """The golden output of the text-span path (strip + NFC + spaces/quotes
    regularization) — used by fixture builders."""
    from calamari_spark.functions.text import regularize_str

    return regularize_str(noisy, rulesets=["quotes", "spaces"])
