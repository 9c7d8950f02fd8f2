"""SentencePiece piece-encoding as a Spark column transform.

The reference's production featurize path hashes SPM pieces, not raw words
(ref: fruit_fly/hash.py:248 ``sp.encode_as_pieces(doc)`` feeding the
CountVectorizer space of hash.py:198). This operator reproduces that stage:
raw text column → pieces joined by single spaces — after it, the engine's
existing whitespace-token paths (build_signatures, build_postings) consume
pieced text unchanged, exactly like the reference's downstream.

Plan shape: one Arrow-batched pandas UDF (no shuffle, no per-row Python at
the exchange layer); the piece scores ride to executors as ONE broadcast of
the {piece: logprob} dict and the Viterbi tokenizer is rebuilt per executor
from it (cheap: a dict + two scalars).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from pears_fruit_fly_spark.functions.spm import UnigramTokenizer


def piece_encode(
    df: DataFrame,
    scores: dict[str, float],
    text_col: str = "text",
    out_col: str | None = None,
) -> DataFrame:
    """Add/replace a column with the SPM-unigram piece encoding of text_col
    (pieces joined by " "). out_col defaults to text_col (in-place shape,
    mirroring the reference pipeline where pieced text replaces raw text).
    """
    out_col = out_col or text_col
    # Re-spread to full parallelism when the upstream plan funnels into
    # fewer partitions than cores (e.g. a .limit() sample collapses to ONE
    # partition, so the whole Viterbi stage would run on one task — guide
    # §2.5 input skew). Values are per-row, so the repartition cannot
    # change them; at real scale the input is many splits and this branch
    # is a no-op.
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    b_scores = df.sparkSession.sparkContext.broadcast(scores)
    tok_holder: list[UnigramTokenizer] = []

    @F.pandas_udf(StringType())
    def _encode(texts: pd.Series) -> pd.Series:
        if not tok_holder:  # once per python worker
            tok_holder.append(UnigramTokenizer(b_scores.value))
        tok = tok_holder[0]
        # vectorized batch Viterbi (NumPy DP across the Arrow batch) —
        # parity-tested against the scalar path (VERDICT r2 #4)
        pieces = tok.encode_batch(texts.fillna("").tolist())
        return pd.Series([" ".join(p) for p in pieces], index=texts.index)

    return df.withColumn(out_col, _encode(F.col(text_col)))
