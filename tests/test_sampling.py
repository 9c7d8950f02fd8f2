"""Deterministic mixture sampling (operators/sampling.py)."""

from __future__ import annotations

import numpy as np

from pears_fruit_fly_spark.operators.sampling import (
    _MOD,
    _MULT,
    _salt_word,
    hash_uniform,
    mixture_take,
    stratified_sample,
)


def _u(key: int, salt: int = 0) -> float:
    k = (key ^ (key >> 32)) % _MOD  # high-word fold, mirrored engine-side
    h1 = k * _MULT % _MOD
    return (h1 ^ _salt_word(salt)) * _MULT % _MOD / _MOD


def _mk(spark, n=2000):
    rows = [(i, ["cc", "books", "code", "wiki"][i % 4]) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, source string"), rows


def test_hash_uniform_matches_python_and_is_uniform(spark):
    df, rows = _mk(spark)
    got = {r["doc_id"]: r["u"] for r in df.select(
        "doc_id", hash_uniform(df.doc_id).alias("u")).collect()}
    for i, _ in rows:
        assert abs(got[i] - _u(i)) < 1e-12
    us = np.array(list(got.values()))
    assert 0.0 <= us.min() and us.max() < 1.0
    # equidistribution sanity: each decile holds 10% +- 3%
    hist, _ = np.histogram(us, bins=10, range=(0, 1))
    assert (np.abs(hist / len(us) - 0.1) < 0.03).all()


def test_stratified_sample_exact_and_append_stable(spark):
    df, rows = _mk(spark)
    fr = {"cc": 0.25, "books": 1.0, "code": 0.5}
    got = {r["doc_id"] for r in
           stratified_sample(df, "source", fr, "doc_id").collect()}
    want = {i for i, s in rows if _u(i) < fr.get(s, 0.0)}
    assert got == want
    assert not any(s == "wiki" for i, s in rows if i in got)  # default 0.0
    # append stability: the decision for existing docs never changes
    df2, _ = _mk(spark, 4000)
    got2 = {r["doc_id"] for r in
            stratified_sample(df2, "source", fr, "doc_id").collect()}
    assert got2 & set(range(2000)) == got


def test_stratified_sample_salt_decorrelates(spark):
    """Different salts must behave like independent p=0.5 draws: overlap
    ~50%, and for MANY salts, not just a lucky one (the additive-salt bug
    this guards against gave 96.6% overlap at salt=13 — a pure rotation
    of u-space; the xor-between-rounds hash re-mixes)."""
    df, _ = _mk(spark)
    a = {r["doc_id"] for r in stratified_sample(
        df, "source", {"cc": 0.5}, "doc_id", salt=0).collect()}
    for salt in (1, 7, 13, 1000):
        b = {r["doc_id"] for r in stratified_sample(
            df, "source", {"cc": 0.5}, "doc_id", salt=salt).collect()}
        overlap = len(a & b) / max(1, len(a))
        assert 0.3 < overlap < 0.7, (salt, overlap)


def test_mixture_take_exact_quotas(spark):
    df, rows = _mk(spark)
    q = {"cc": 37, "books": 5000, "code": 0}
    out = mixture_take(df, "source", q, "doc_id").collect()
    by_src: dict[str, list[int]] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    assert len(by_src.get("cc", [])) == 37
    assert len(by_src.get("books", [])) == 500  # quota > stratum size
    assert "code" not in by_src and "wiki" not in by_src
    # exactly the hash-smallest keys per stratum (ties impossible: u injective
    # on < 2^32 keys with an odd multiplier)
    cc = sorted((i for i, s in rows if s == "cc"), key=lambda i: (_u(i), i))
    assert sorted(by_src["cc"]) == sorted(cc[:37])


def test_hash_uniform_no_2pow32_aliasing(spark):
    """Regression (ADVICE r3): ids differing by a multiple of 2^32 must
    NOT hash identically (the old mod-before-mix reduction aliased them
    for every salt). The high-word fold is the identity below 2^32, so
    small-key samples are pinned unchanged."""
    base = [7, 123456, 2**31 + 5]
    rows = [(k + (m << 32),) for k in base for m in (0, 1, 2, 977)]
    df = spark.createDataFrame(rows, "doc_id long")
    for salt in (0, 13):
        got = {r["doc_id"]: r["u"] for r in df.select(
            "doc_id", hash_uniform(df.doc_id, salt).alias("u")).collect()}
        # python replica agrees at every id, including > 2^32
        for (i,) in rows:
            assert abs(got[i] - _u(i, salt)) < 1e-12
        # aliased ids now de-correlate: all 4 lifts of each base differ
        for k in base:
            lifted = {round(got[k + (m << 32)], 12) for m in (0, 1, 2, 977)}
            assert len(lifted) == 4, (salt, k, lifted)
