"""Pods, evaluation harness, LDA topic filter, vocab-from-corpus tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pears_fruit_fly_spark.config import FlyConfig
from pears_fruit_fly_spark.functions.vocab import Vocab, build_vocab_from_corpus
from pears_fruit_fly_spark.operators.pods import (
    append_pod_signatures,
    build_pod_signatures,
    kc_usage,
    pod_hamming_topk,
    pod_stats,
    read_pods,
)
from pears_fruit_fly_spark.operators.signatures import build_signatures, featurize_query


@pytest.fixture(scope="module")
def labeled_corpus(spark):
    """Two clearly-separated topics so NN structure is non-trivial."""
    rng = np.random.default_rng(17)
    a_terms = [f"alpha{i}" for i in range(30)]
    b_terms = [f"beta{i}" for i in range(30)]
    rows = []
    for i in range(120):
        pod = "sports" if i % 2 == 0 else "science"
        pool = a_terms if pod == "sports" else b_terms
        toks = [pool[int(rng.integers(0, 30))] for _ in range(80)]
        rows.append((f"u{i}", " ".join(toks), pod))
    return spark.createDataFrame(rows, "url string, text string, pod string").persist()


@pytest.fixture(scope="module")
def topic_vocab():
    terms = [f"alpha{i}" for i in range(30)] + [f"beta{i}" for i in range(30)]
    probs = np.full(60, 1 / 60)
    return Vocab(terms=terms, logprobs=np.log(probs))


@pytest.fixture(scope="module")
def topic_cfg():
    return FlyConfig(pn_size=60, kc_size=64, proj_size=4, top_words=20,
                     wta_percent=15.0, seed=3)


def test_pod_build_append_query(spark, labeled_corpus, topic_vocab, topic_cfg, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pods"))
    first = labeled_corpus.filter(F.col("url").isin([f"u{i}" for i in range(100)]))
    rest = labeled_corpus.filter(~F.col("url").isin([f"u{i}" for i in range(100)]))
    build_pod_signatures(spark, first, topic_vocab, topic_cfg, d)
    assert read_pods(spark, d).count() == 100
    append_pod_signatures(spark, rest, topic_vocab, topic_cfg, d)
    assert read_pods(spark, d).count() == 120

    stats = {r["pod"]: r["n_docs"] for r in pod_stats(spark, d).collect()}
    assert stats == {"sports": 60, "science": 60}

    # query restricted to one pod returns only that pod's docs,
    # and the parquet scan is partition-pruned to that directory
    q = featurize_query(" ".join(f"alpha{i}" for i in range(10)), topic_vocab, topic_cfg)
    res = pod_hamming_topk(spark, d, q, k=5, pods=["sports"])
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(pod" in plan or "pod#" in plan
    rows = res.collect()
    assert len(rows) == 5
    sports_urls = {r["url"] for r in labeled_corpus.filter("pod = 'sports'").collect()}
    assert all(r["url"] in sports_urls for r in rows)


def test_kc_usage(spark, labeled_corpus, topic_vocab, topic_cfg):
    sigs = build_signatures(spark, labeled_corpus, topic_vocab, topic_cfg).persist()
    usage = kc_usage(sigs, topic_cfg.kc_size).collect()
    # total fires == total bits set across all signatures
    total_bits = sigs.select(
        F.sum(
            F.aggregate(
                F.transform("sig", lambda w: F.bit_count(w)),
                F.lit(0),
                lambda a, x: a + x,
            )
        )
    ).collect()[0][0]
    assert sum(r["n_used"] for r in usage) == total_bits
    assert all(0 <= r["kc_id"] < 64 for r in usage)
    # sorted desc
    vals = [r["n_used"] for r in usage]
    assert vals == sorted(vals, reverse=True)


def test_hamming_prec_at_k_separates_topics(spark, labeled_corpus, topic_vocab, topic_cfg):
    from pears_fruit_fly_spark.operators.evaluate import hamming_prec_at_k

    sigs = build_signatures(spark, labeled_corpus, topic_vocab, topic_cfg)
    labeled = sigs.join(
        labeled_corpus.select("url", F.col("pod").alias("label")), "url"
    )
    prec = hamming_prec_at_k(labeled, k=5)
    assert prec > 0.9  # two disjoint vocabularies → near-perfect NN labels


def test_signature_classification(spark, labeled_corpus, topic_vocab, topic_cfg):
    from pears_fruit_fly_spark.operators.evaluate import (
        signature_classification_accuracy,
    )

    sigs = build_signatures(spark, labeled_corpus, topic_vocab, topic_cfg)
    labeled = sigs.join(
        labeled_corpus.select("url", F.col("pod").alias("label")), "url"
    )
    acc = signature_classification_accuracy(labeled, topic_cfg.kc_size)
    assert acc > 0.85


def test_topic_filter(spark, labeled_corpus):
    from pears_fruit_fly_spark.operators.topicfilter import train_topic_filter

    model = train_topic_filter(labeled_corpus, n_topics=2, vocab_size=100,
                               max_iter=30)
    dist = model.topic_distribution(labeled_corpus)
    assert "topicDistribution" in dist.columns

    # find which topic dominates 'sports' docs, ban it, verify sports culled
    from pyspark.ml.functions import vector_to_array

    probs = dist.select(
        "url",
        vector_to_array("topicDistribution").alias("p"),
    ).join(labeled_corpus.select("url", "pod"), "url")
    mean_p0 = {
        r["pod"]: r["m"]
        for r in probs.groupBy("pod").agg(F.avg(F.col("p")[0]).alias("m")).collect()
    }
    sports_topic = 0 if mean_p0["sports"] > mean_p0["science"] else 1
    kept = model.filter_banned(labeled_corpus, {sports_topic: 0.5})
    kept_pods = {r["pod"] for r in kept.select("pod").distinct().collect()}
    assert kept.count() > 0
    assert "sports" not in kept_pods


def test_build_vocab_from_corpus(spark, labeled_corpus):
    from pears_fruit_fly_spark.operators.dedup import tokens_array

    toks = labeled_corpus.select(F.explode(tokens_array("text")).alias("term"))
    vdf = build_vocab_from_corpus(toks, max_terms=40)
    assert len(vdf) == 40
    assert (vdf["logprob"] < 0).all()
    # most frequent term first, deterministic tie order
    cfs = vdf["cf"].tolist()
    assert cfs == sorted(cfs, reverse=True)


def test_topic_filter_decision_contract(spark):
    """Behavioral contract vs the reference's classify_removal
    (common_crawl_processor/LDAmodel.py:16-25) + keep rule
    (filter_documents.py:75-80): identical hand-set topic matrix must yield
    identical drop decisions — strict > on banned thresholds, first
    exceedance drops, non-banned topics ignored (VERDICT r1 #9)."""
    import numpy as np
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from pears_fruit_fly_spark.operators.topicfilter import keep_condition

    def classify_removal_reference(tops: list[float],
                                   topics: dict[int, float]) -> int:
        # transcription of LDAmodel.py:16-25 (gensim get_document_topics
        # with minimum_probability=0 returns every (topic_id, prob) pair)
        label = 0
        for tid, prob in enumerate(tops):
            if tid in topics.keys():
                if prob > topics[tid]:
                    label = 1
                    break
        return label

    banned = {0: 0.5, 2: 0.3}
    rng = np.random.default_rng(42)
    rows = []
    # hand-set edge rows: exactly-at-threshold (kept: strict >), just-above
    # (dropped), banned-below + non-banned-high (kept)
    fixed = [
        [0.5, 0.2, 0.3],     # t0 == thr, t2 == thr -> kept
        [0.50001, 0.2, 0.1], # t0 just above -> dropped
        [0.1, 0.0, 0.30001], # t2 just above -> dropped
        [0.2, 0.9, 0.1],     # only non-banned topic high -> kept
        [0.0, 1.0, 0.0],     # kept
    ]
    for v in fixed:
        rows.append(v)
    for _ in range(40):
        v = rng.dirichlet([0.7, 0.7, 0.7]).tolist()
        rows.append(v)
    df = spark.createDataFrame(
        [(i, r) for i, r in enumerate(rows)], "doc_id long, dist array<double>"
    ).withColumn("topicDistribution", array_to_vector("dist"))

    kept_spark = {
        r["doc_id"] for r in df.filter(keep_condition(banned)).collect()
    }
    kept_ref = {
        i for i, v in enumerate(rows) if classify_removal_reference(v, banned) != 1
    }
    assert kept_spark == kept_ref
    assert 0 in kept_spark and 3 in kept_spark and 4 in kept_spark
    assert 1 not in kept_spark and 2 not in kept_spark
