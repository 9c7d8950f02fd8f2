"""Hyperparameter sweep, projection store, scaling utils, pod keywords."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pears_fruit_fly_spark.config import FlyConfig
from pears_fruit_fly_spark.functions.vocab import Vocab
from pears_fruit_fly_spark.operators.signatures import build_signatures
from pears_fruit_fly_spark.operators.tuning import (
    build_projection_store,
    l2_normalize,
    minmax_scale,
    sweep_fly_configs,
)


@pytest.fixture(scope="module")
def labeled(spark):
    rng = np.random.default_rng(29)
    a = [f"alpha{i}" for i in range(20)]
    b = [f"beta{i}" for i in range(20)]
    rows = []
    for i in range(60):
        pool = a if i % 2 == 0 else b
        rows.append((f"u{i}",
                     " ".join(pool[int(rng.integers(0, 20))] for _ in range(50)),
                     "A" if i % 2 == 0 else "B"))
    return spark.createDataFrame(rows, "url string, text string, label string").persist()


@pytest.fixture(scope="module")
def tvocab():
    terms = [f"alpha{i}" for i in range(20)] + [f"beta{i}" for i in range(20)]
    return Vocab(terms=terms, logprobs=np.log(np.full(40, 1 / 40)))


def test_sweep_fly_configs(spark, labeled, tvocab):
    configs = [
        FlyConfig(pn_size=40, kc_size=64, proj_size=4, top_words=10, wta_percent=10.0),
        FlyConfig(pn_size=40, kc_size=32, proj_size=2, top_words=5, wta_percent=20.0),
    ]
    out = sweep_fly_configs(spark, labeled, tvocab, configs, k=3)
    assert len(out) == 2
    assert out["prec_at_k"].iloc[0] >= out["prec_at_k"].iloc[1]
    assert out["prec_at_k"].iloc[0] > 0.8  # disjoint vocab: easy separation
    assert {"kc_size", "proj_size", "prec_at_k"} <= set(out.columns)


def test_projection_store(spark, labeled, tvocab):
    cfg = FlyConfig(pn_size=40, kc_size=64, proj_size=4, top_words=10,
                    wta_percent=10.0)
    sigs = build_signatures(spark, labeled, tvocab, cfg)
    store = build_projection_store(sigs, tvocab, size=3)
    assert len(store) > 0
    for _, row in store.iterrows():
        assert len(row["pn_ids"]) == 3
        assert row["words"] == [tvocab.terms[i] for i in row["pn_ids"]]
    # deterministic
    store2 = build_projection_store(sigs, tvocab, size=3)
    assert store.equals(store2)


def test_l2_and_minmax(spark):
    df = spark.createDataFrame(
        [(0, [3.0, 4.0], 10.0), (1, [0.0, 0.0], 20.0), (2, [1.0, 0.0], 30.0)],
        "id long, v array<double>, x double",
    )
    out = l2_normalize(df, "v", "vn").collect()
    by_id = {r["id"]: r["vn"] for r in out}
    np.testing.assert_allclose(by_id[0], [0.6, 0.8])
    assert by_id[1] == [0.0, 0.0]  # zero vector untouched
    mm = {r["id"]: r["xs"] for r in minmax_scale(df, "x", "xs").collect()}
    assert mm == {0: 0.0, 1: 0.5, 2: 1.0}


def test_pod_keyword_stats(spark, labeled, tvocab, tmp_path_factory):
    from pears_fruit_fly_spark.operators.pods import (
        build_pod_signatures,
        pod_keyword_stats,
    )

    cfg = FlyConfig(pn_size=40, kc_size=64, proj_size=4, top_words=10,
                    wta_percent=10.0)
    d = str(tmp_path_factory.mktemp("podkw"))
    build_pod_signatures(
        spark, labeled.withColumnRenamed("label", "pod"), tvocab, cfg, d
    )
    stats = pod_keyword_stats(spark, d, top_n=5).collect()
    pods = {r["pod"] for r in stats}
    assert pods == {"A", "B"}
    # pod A docs only contain alpha terms (ids 0..19)
    a_kws = [r["kw"] for r in stats if r["pod"] == "A"]
    assert all(k < 20 for k in a_kws)
    b_kws = [r["kw"] for r in stats if r["pod"] == "B"]
    assert all(k >= 20 for k in b_kws)
