"""Driver-side fly hyperparameter sweep + projection store + feature scaling.

Covers the reference's meta-operators at the semantics level, distributed:

* sweep_fly_configs — the hyperparameter-search harness shape
  (fruit_fly/hyperparam_search.py:122-158 wraps the hash pipeline in a
  driver loop; Bayesian/GA optimizers are out of scope per SURVEY.md §2.10 —
  this is the evaluation loop they would drive). The corpus is cached once
  and re-hashed per config (the reference re-reads .sp files per trial).

* build_projection_store — per-doc top-k keyword ids as candidate
  projections (ref: projection_store/create_projection_store.py:24-54);
  F1-F4 run distributed, the store itself is collected (small by design).

* l2_normalize / minmax_scale — F12 feature scaling
  (ref: dense_fruit_fly/vectorizer.py:54-57 Normalizer/MinMaxScaler).
"""

from __future__ import annotations

from dataclasses import asdict

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pears_fruit_fly_spark.config import FlyConfig
from pears_fruit_fly_spark.functions.vocab import Vocab
from pears_fruit_fly_spark.operators.evaluate import hamming_prec_at_k
from pears_fruit_fly_spark.operators.signatures import build_signatures


def sweep_fly_configs(
    spark: SparkSession,
    pages_with_labels: DataFrame,
    vocab: Vocab,
    configs: list[FlyConfig],
    k: int = 5,
) -> pd.DataFrame:
    """Evaluate prec@k for each fly config; returns a driver-side frame
    (config fields + prec) sorted best-first. pages_with_labels:
    (url, text, label)."""
    cached = pages_with_labels.persist()
    cached.count()
    rows = []
    for cfg in configs:
        sigs = build_signatures(spark, cached, vocab, cfg)
        labeled = sigs.join(cached.select("url", "label"), "url")
        prec = hamming_prec_at_k(labeled, k=k)
        rows.append({**asdict(cfg), "prec_at_k": prec})
    cached.unpersist()
    out = pd.DataFrame(rows).sort_values("prec_at_k", ascending=False)
    return out.reset_index(drop=True)


def build_projection_store(
    signatures: DataFrame, vocab: Vocab, size: int = 5
) -> pd.DataFrame:
    """Candidate projections from per-doc keywords: the first `size` keyword
    ids of each doc form one candidate row (ids + resolved words), deduped.

    The distributed part (featurize + keyword extraction) already happened in
    build_signatures; the store is intentionally small → driver collect
    (ref: projection_store/create_projection_store.py writes `ids :: words`
    lines)."""
    cands = (
        signatures.select(F.slice("keywords", 1, size).alias("ids"))
        .filter(F.size("ids") >= size)
        .distinct()
        .collect()
    )
    rows = []
    for r in cands:
        ids = sorted(int(i) for i in r["ids"])
        rows.append(
            {"pn_ids": ids, "words": [vocab.terms[i] for i in ids]}
        )
    rows.sort(key=lambda x: x["pn_ids"])
    return pd.DataFrame(rows, columns=["pn_ids", "words"])


def l2_normalize(df: DataFrame, vec_col: str, out_col: str) -> DataFrame:
    """L2-normalize an array<double> column (F12, Normalizer(norm='l2'))."""
    v = F.col(vec_col)
    norm = F.sqrt(
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    return df.withColumn(
        out_col,
        F.when(norm > 0, F.transform(v, lambda x: x / norm)).otherwise(v),
    )


def minmax_scale(df: DataFrame, num_col: str, out_col: str) -> DataFrame:
    """Min-max scale a numeric column to [0,1] (F12, MinMaxScaler semantics);
    one global agg + broadcast of two scalars."""
    row = df.agg(F.min(num_col).alias("mn"), F.max(num_col).alias("mx")).collect()[0]
    mn, mx = float(row["mn"]), float(row["mx"])
    span = (mx - mn) or 1.0
    return df.withColumn(out_col, (F.col(num_col) - mn) / span)
