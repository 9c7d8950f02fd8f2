"""Dedup operator tests: exact, MinHash-LSH, SimHash, Jaccard, embedding."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pears_fruit_fly_spark.operators.dedup import (
    duplicate_groups,
    embedding_cosine_dup_pairs,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_lsh_dedup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and runs through the green field "
        "while birds sing in the tall trees near the old river bank every morning"
    )
    rows = [
        (0, base),
        (1, base),                                        # exact dup of 0
        (2, base.replace("quick", "speedy")),             # near dup of 0
        (3, base.replace("morning", "evening") + " extra tail words here"),  # near dup
        (4, "completely different text about spark query engines and distributed joins "
            "with columnar storage formats and vectorized execution kernels"),
        (5, "another unrelated document mentioning inverted indexes bm25 scoring "
            "wand pruning posting lists compression and top k retrieval"),
        (6, ""),                                          # empty
    ]
    return spark.createDataFrame(rows, "id long, text string").persist()


def test_exact_dedup_and_groups(spark, docs):
    kept = exact_dedup(docs, ["text"], keep_by="id")
    ids = sorted(r["id"] for r in kept.collect())
    assert 0 in ids and 1 not in ids  # winner = min id
    assert len(ids) == docs.count() - 1
    groups = duplicate_groups(docs, ["text"], "id").collect()
    assert len(groups) == 1
    assert groups[0]["ids"] == [0, 1] and groups[0]["n_dups"] == 2


def test_minhash_identical_docs_identical_sigs(spark, docs):
    sigs = {r["id"]: r["minhash"] for r in minhash_signatures(docs, "id", "text").collect()}
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[4]
    assert 6 not in sigs  # empty doc has no shingles → filtered
    # near-dup shares most minhashes
    agree = sum(a == b for a, b in zip(sigs[0], sigs[2]))
    assert agree >= len(sigs[0]) // 2


def test_minhash_lsh_dedup_pairs(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_dedup_pairs(
            docs, "id", "text", jaccard_threshold=0.5
        ).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.8 <= pairs[(0, 2)] < 1.0
    assert not any({a, b} & {4, 5} and {a, b} & {0, 1, 2, 3} for a, b in pairs)


def test_simhash_properties(spark, docs):
    sh = {r["id"]: r["simhash"] for r in simhash(docs, "id", "text").collect()}
    assert sh[0] == sh[1]
    d_near = bin(sh[0] ^ sh[2]).count("1")
    d_far = bin(sh[0] ^ sh[4]).count("1")
    assert d_near < d_far
    assert all(v >= 0 for v in sh.values())  # fits in signed long


def test_simhash_near_pairs(spark, docs):
    sh = simhash(docs, "id", "text")
    pairs = {(r["id_a"], r["id_b"]) for r in simhash_near_pairs(sh, max_hamming=3).collect()}
    assert (0, 1) in pairs
    assert (0, 4) not in pairs


def test_ngram_jaccard_pairs(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "id", "text", n=2, threshold=0.3).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs
    assert (4, 5) not in pairs


def test_ngram_jaccard_max_df_guard(spark, docs):
    # with max_ngram_df=1, every shared shingle is dropped → no pairs at all
    got = ngram_jaccard_pairs(docs, "id", "text", n=2, threshold=0.01, max_ngram_df=1)
    assert got.count() == 0


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(11)
    base = rng.standard_normal(16)
    rows = []
    for i in range(40):
        if i < 3:
            v = base + rng.standard_normal(16) * 0.01  # near-dups of each other
        else:
            v = rng.standard_normal(16)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "id long, v array<double>").persist()


def test_embedding_cosine_brute_force(spark, vecs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in embedding_cosine_dup_pairs(
            vecs, "id", "v", threshold=0.95, brute_force=True
        ).collect()
    }
    assert {(0, 1), (0, 2), (1, 2)} <= pairs


def test_embedding_cosine_lsh_finds_brute_force_pairs(spark, vecs):
    bf = {
        (r["id_a"], r["id_b"])
        for r in embedding_cosine_dup_pairs(vecs, "id", "v", 0.95, brute_force=True).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in embedding_cosine_dup_pairs(vecs, "id", "v", 0.95, n_planes=6).collect()
    }
    assert lsh <= bf  # LSH never invents pairs (verify step is exact)
    assert {(0, 1), (0, 2), (1, 2)} <= lsh  # ~parallel vectors share buckets


def test_ngram_contamination(spark):
    """GPT-3-style benchmark decontamination: overlap counts exact, short
    docs can never be contaminated, broadcast join plan."""
    from pears_fruit_fly_spark.operators.dedup import ngram_contamination

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),   # contains bench gram
            (1, "alpha beta gamma other words here"),     # shares 3-gram prefix
            (2, "totally different content entirely now"),
            (3, "alpha beta"),                            # shorter than n
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("alpha beta gamma delta filler filler",)], "text string"
    )
    out = ngram_contamination(docs, "doc_id", "text", bench, n=3)
    got = {r["id"]: (r["n_hits"], r["contaminated"]) for r in out.collect()}
    # doc0 shares 'alpha beta gamma' and 'beta gamma delta' -> 2 hits
    assert got[0] == (2, True)
    assert got[1] == (1, True)
    assert got[2] == (0, False)
    assert got[3] == (0, False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_duplicate_clusters_and_keep_canonical(spark):
    """Connected components over dup pairs: chains merge into one cluster
    labelled by the minimum member id; keep-canonical drops every
    non-minimum member and leaves unpaired docs alone."""
    from pears_fruit_fly_spark.operators.dedup import (
        dedup_keep_canonical,
        duplicate_clusters,
    )

    # components: {1,2,3,4} (a chain), {10,11}, {20,21,22} (a triangle)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    got = {r["id"]: r["cluster_id"]
           for r in duplicate_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in [1, 2, 3, 4, 10, 11, 20, 21, 22, 99]],
        "doc_id long, text string",
    )
    kept = {r["doc_id"]
            for r in dedup_keep_canonical(docs, pairs, "doc_id").collect()}
    assert kept == {1, 10, 20, 99}  # canonical members + the unpaired doc


def test_duplicate_clusters_long_chain_converges(spark):
    """A chain of diameter 60 — beyond any plausible propagation-only
    round budget (the old code silently returned split clusters past 20
    rounds — review finding). Pointer jumping must reach the fixpoint in
    O(log diameter) rounds and return ONE cluster."""
    from pears_fruit_fly_spark.operators.dedup import duplicate_clusters

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30, 90)], "id_a long, id_b long"
    )
    got = {r["id"]: r["cluster_id"]
           for r in duplicate_clusters(chain).collect()}
    assert set(got.values()) == {30}
    assert len(got) == 61


def test_lsh_bucket_cap_boilerplate(spark):
    """Adversarial web-boilerplate fixture (VERDICT r4 #1): 10k docs with
    IDENTICAL minhash signatures (parked domains / templated pages) land in
    one bucket per band. Uncapped, the band join emits |bucket|^2/2 rows;
    with the cap each oversized bucket emits O(bucket) star pairs anchored
    at the min-id representative, preserving connectivity for
    duplicate_clusters."""
    n = 10_000
    sig = F.array(*[F.lit(7 + j) for j in range(32)]).cast("array<bigint>")
    boiler = spark.range(n).select("id", sig.alias("minhash"))
    pairs = lsh_candidate_pairs(boiler, n_bands=8, max_bucket=100)
    assert pairs.count() == n - 1           # star, not n*(n-1)/2 = 50M
    assert pairs.filter(F.col("id_a") != 0).count() == 0  # anchored at min id
    # connectivity preserved: one component under the cluster operator
    from pears_fruit_fly_spark.operators.dedup import duplicate_clusters

    labels = duplicate_clusters(pairs.limit(500))
    assert labels.select("cluster_id").distinct().count() == 1


def test_lsh_bucket_cap_small_buckets_unaffected(spark, docs):
    """Buckets at-or-under the cap keep full pairwise candidates: the real
    corpus fixture produces identical results capped vs uncapped."""
    sigs = minhash_signatures(docs, "id", "text")
    capped = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(sigs, 8, max_bucket=10).collect()
    }
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(sigs, 8, max_bucket=None).collect()
    }
    assert capped == uncapped  # no bucket exceeds 10 docs in a 7-doc corpus
    # and the uncapped quadratic shape is real: a 60-row identical-sig
    # bucket yields exactly 60*59/2 pairs without the guard
    sig = F.array(*[F.lit(3 + j) for j in range(32)]).cast("array<bigint>")
    b60 = spark.range(60).select("id", sig.alias("minhash"))
    assert lsh_candidate_pairs(b60, 8, max_bucket=None).count() == 60 * 59 // 2


def test_simhash_bucket_cap_boilerplate(spark):
    """Boilerplate fixture for the SimHash sibling of the LSH cap: 5k docs
    with IDENTICAL fingerprints share every chunk bucket. Capped, each
    oversized bucket emits O(bucket) star pairs (all at Hamming 0, so the
    exact verify keeps them); the pair set stays n-1, not |bucket|^2/2."""
    from pears_fruit_fly_spark.operators.dedup import simhash_near_pairs

    n = 5_000
    boiler = spark.range(n).select("id", F.lit(12345).cast("long").alias("simhash"))
    pairs = simhash_near_pairs(boiler, max_hamming=3, max_bucket=100)
    rows = pairs.collect()
    assert len(rows) == n - 1
    assert all(r["id_a"] == 0 and r["hamming"] == 0 for r in rows)


def test_simhash_cap_small_buckets_unaffected(spark, docs):
    sh = simhash(docs, "id", "text")
    capped = {(r["id_a"], r["id_b"])
              for r in simhash_near_pairs(sh, 3, max_bucket=10).collect()}
    uncapped = {(r["id_a"], r["id_b"])
                for r in simhash_near_pairs(sh, 3, max_bucket=None).collect()}
    assert capped == uncapped


def test_embedding_cosine_bucket_cap_boilerplate(spark):
    """Boilerplate embeddings (one repeated vector => one sign bucket):
    capped LSH emits star pairs to the min-id rep, all passing the exact
    cosine verify at 1.0."""
    n = 3_000
    v = F.array(*[F.lit(float(j % 5 + 1)) for j in range(8)])
    boiler = spark.range(n).select("id", v.alias("v"))
    pairs = embedding_cosine_dup_pairs(
        boiler, "id", "v", threshold=0.95, dim=8, max_bucket=50
    ).collect()
    assert len(pairs) == n - 1
    assert all(r["id_a"] == 0 and r["cosine"] >= 0.999 for r in pairs)


def test_embedding_cosine_cap_small_buckets_unaffected(spark, vecs):
    capped = {(r["id_a"], r["id_b"])
              for r in embedding_cosine_dup_pairs(
                  vecs, "id", "v", 0.95, n_planes=6, max_bucket=5).collect()}
    uncapped = {(r["id_a"], r["id_b"])
                for r in embedding_cosine_dup_pairs(
                    vecs, "id", "v", 0.95, n_planes=6,
                    max_bucket=None).collect()}
    assert capped == uncapped


def test_duplicate_clusters_reliable_checkpoint_identical(spark, tmp_path):
    """checkpoint_dir switches every round to reliable checkpoint();
    clusters must be byte-identical to the localCheckpoint path on the
    long-chain convergence case, and superseded rounds' checkpoint files
    must be cleaned up (VERDICT r5 #4 done-criterion)."""
    import os

    from pears_fruit_fly_spark.operators.dedup import duplicate_clusters

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "id_a long, id_b long"
    )
    local = {(r["id"], r["cluster_id"])
             for r in duplicate_clusters(chain).collect()}
    ckdir = str(tmp_path / "cc_ck")
    reliable = {(r["id"], r["cluster_id"])
                for r in duplicate_clusters(
                    chain, checkpoint_dir=ckdir).collect()}
    assert reliable == local
    assert all(cid == 0 for _, cid in reliable)
    # superseded rounds freed: only a handful of live checkpoint RDD dirs
    # remain (the final labels + at most the last round's intermediates)
    live = [
        d for root, dirs, files in os.walk(ckdir) for d in dirs
        if d.startswith("rdd-")
    ]
    assert len(live) <= 4, live
