"""Signature build: the zero-shuffle featurize-and-hash path.

Plan shape (SURVEY.md §3.1 Spark mapping):

    scan web.pages → filter (pushed down) → mapInPandas(fused fly kernel)
    → write web.signatures

No shuffle anywhere on this path; throughput is bound by the per-batch BLAS
matmul, exactly like the reference's 2000-row chunks
(ref: fruit_fly/hash.py:121,136). Vocab weights and the projection matrix ride
to executors as Spark broadcast variables (the reference's module-global dicts,
fruit_fly/hash.py:196-198, become broadcasts).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pears_fruit_fly_spark.config import FlyConfig
from pears_fruit_fly_spark.functions.fly import (
    featurize_batch,
    featurize_counts,
    make_projection_matrix,
)
from pears_fruit_fly_spark.functions.tokenizer import whitespace_tokenize
from pears_fruit_fly_spark.functions.vocab import Vocab

SIGNATURE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("sig", ArrayType(LongType())),
        StructField("keywords", ArrayType(IntegerType())),
        StructField("doclen", LongType()),
    ]
)


def build_signatures(
    spark: SparkSession,
    pages: DataFrame,
    vocab: Vocab,
    cfg: FlyConfig,
    text_col: str = "text",
    projection: np.ndarray | None = None,
) -> DataFrame:
    """pages(url, text, ...) → (url, sig array<long>, keywords, doclen).

    doclen = number of in-vocabulary tokens (the BM25 dl statistic).
    """
    if projection is None:
        projection = make_projection_matrix(
            vocab.size, cfg.kc_size, cfg.proj_size, cfg.seed
        )
    sc = spark.sparkContext
    b_proj = sc.broadcast(projection.astype(np.float32))
    b_weights = sc.broadcast(vocab.weights.astype(np.float32))
    b_terms = sc.broadcast(list(vocab.terms))
    top_words, wta_percent = cfg.top_words, cfg.wta_percent

    def _hash_batches(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        proj = b_proj.value
        weights = b_weights.value
        # term -> id via Arrow index_in against the terms array: ids ARE
        # list positions (Vocab.term_to_id = enumerate(terms)), so this is
        # bit-identical to the old dict map — r4: Arrow split+lookup on
        # contiguous buffers replaced pandas explode + Series.map, the
        # same kernel swap profiled 7x in postings.tokenize_batch_kernel
        # (parity pinned by tests/test_signatures.py vs featurize_batch).
        # r6: mapInArrow — texts stay Arrow buffers end to end (the
        # mapInPandas form materialized every text as a Python str on the
        # way in and re-encoded the output through pandas; measured ~25%
        # of the stage)
        vocab_pa = pa.array(b_terms.value, type=pa.string())
        pn_size = proj.shape[1]
        sig_words = proj.shape[0] // 64 + (1 if proj.shape[0] % 64 else 0)
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            texts_pa = pc.fill_null(
                rb.column(rb.schema.get_field_index(text_col)).cast(
                    pa.string()
                ),
                "",
            )
            split = pc.split_pattern(
                pc.replace_substring(texts_pa, "\n", " "), " "
            )
            lens = pc.list_value_length(split).to_numpy().astype(np.int64)
            flat = pc.list_flatten(split)
            ids = pc.index_in(flat, value_set=vocab_pa).fill_null(
                -1
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            rows_all = np.repeat(np.arange(n, dtype=np.int64), lens)
            ok = ids >= 0  # OOV and "" split artifacts both miss the vocab
            rows_idx = rows_all[ok]
            id_arr = ids[ok]
            doclen = np.bincount(rows_idx, minlength=n).astype(np.int64)
            counts = (
                np.bincount(rows_idx * pn_size + id_arr, minlength=n * pn_size)
                .reshape(n, pn_size)
                .astype(np.float32)
            )
            sigs, keywords = featurize_counts(
                counts, weights, proj, top_words, wta_percent
            )
            sig_arr = pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.reshape(-1), type=pa.int64()), sig_words
            ).cast(pa.list_(pa.int64()))
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(rb.schema.get_field_index("url")),
                    sig_arr,
                    pa.array(keywords, type=pa.list_(pa.int32())),
                    pa.array(doclen, type=pa.int64()),
                ],
                ["url", "sig", "keywords", "doclen"],
            )

    return pages.select("url", text_col).mapInArrow(_hash_batches, SIGNATURE_SCHEMA)


def featurize_query(text: str, vocab: Vocab, cfg: FlyConfig,
                    projection: np.ndarray | None = None) -> np.ndarray:
    """Driver-side single-text signature (the serving path featurizes the
    query once on the driver, SURVEY.md §3.3)."""
    if projection is None:
        projection = make_projection_matrix(
            vocab.size, cfg.kc_size, cfg.proj_size, cfg.seed
        )
    tokens = [vocab.encode(whitespace_tokenize(text.replace("\n", " ")))]
    sigs, _ = featurize_batch(
        tokens, vocab.weights.astype(np.float32), projection.astype(np.float32),
        cfg.top_words, cfg.wta_percent,
    )
    return sigs[0]


def hamming_topk(
    signatures: DataFrame, query_sig: np.ndarray, k: int = 10
) -> DataFrame:
    """Hamming nearest-neighbour top-k over packed signatures, pure Spark SQL.

    dist = sum over words of bit_count(sig[i] XOR q[i]) — the packed-long
    equivalent of the reference's hamming_cdist query
    (ref: web_map/umap/utils.py:139-142). Stays entirely inside whole-stage
    codegen (zip_with + aggregate + bit_count are JVM expressions); the global
    top-k compiles to TakeOrderedAndProject, i.e. per-partition heaps + a
    k-row gather — no full sort, no wide shuffle.

    Ties broken by url asc for rank determinism (SURVEY.md §7 hard parts).
    """
    q = F.array(*[F.lit(int(w)) for w in query_sig])
    dist = F.aggregate(
        F.zip_with(F.col("sig"), q, lambda a, b: F.bit_count(a.bitwiseXOR(b))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    ).alias("hamming")
    return (
        signatures.select("url", dist)
        .orderBy(F.asc("hamming"), F.asc("url"))
        .limit(k)
    )
