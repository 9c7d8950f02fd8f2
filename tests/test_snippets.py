"""Snippet extraction over the positional index (operators/snippets.py).

Oracle = a pure-Python window sweep over the raw token streams with the
same idf weights, independent of the codec/cluster/kernel paths.
"""

from __future__ import annotations

import numpy as np
import pytest

from pears_fruit_fly_spark.config import PostingsConfig
from pears_fruit_fly_spark.operators.bm25 import idf
from pears_fruit_fly_spark.operators.postings import build_postings
from pears_fruit_fly_spark.operators.snippets import snippet_spans, snippets

DOCS = [
    (0, "t1 t9 t9 t9 t9 t9 t9 t9 t9 t9 t9 t9 t1 t2 t3"),  # best window at 12
    (1, "t2 t4 t4 t4"),
    (2, "t3  t1 t2"),        # DOUBLE space: must NOT shift positions
    (3, "t5 t5 t5 t5"),      # no query terms -> no span
    (4, "t1\nt2 t3 t4 " * 5),
    (5, "t9 " * 30 + "t1 t2 t3 " + "t9 " * 30),
]


def _toks(text):
    # positions are ordinals among NON-EMPTY tokens (Lucene increments)
    return [t for t in text.replace("\n", " ").split(" ") if t]


def _oracle_spans(query_terms, weights, window):
    out = {}
    for doc_id, text in DOCS:
        toks = _toks(text)
        hits = [(i, weights[t]) for i, t in enumerate(toks)
                if t in query_terms]
        if not hits:
            continue
        best = None
        for i, (p, _) in enumerate(hits):
            score = sum(w for q, w in hits if p <= q < p + window)
            if best is None or score > best[1] + 1e-12:
                best = (p, score)
        out[doc_id] = best
    return out


@pytest.fixture(scope="module")
def snip_index(spark, vocab, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("snipidx") / "idx")
    build_postings(
        spark, spark.createDataFrame(DOCS, "doc_id long, text string"),
        vocab, d,
        cfg=PostingsConfig(num_partitions=4, block_size=8,
                           store_positions=True),
    )
    return d


def test_snippet_spans_match_python_oracle(spark, vocab, snip_index):
    from pears_fruit_fly_spark.plans import commitlog as cl
    from pears_fruit_fly_spark.plans import manifest as mf

    info = mf.read_build_info(cl.resolve(snip_index))
    query = "t1 t2 t3"
    qterms = set(query.split())
    # df per query term over DOCS (engine df = docs containing the term)
    dfs = {t: sum(1 for _, txt in DOCS if t in _toks(txt)) for t in qterms}
    weights = {t: idf(info["n_docs"], dfs[t]) for t in qterms}
    want = _oracle_spans(qterms, weights, window=5)

    cand = spark.createDataFrame([(i,) for i, _ in DOCS], "doc_id long")
    got = {r["doc_id"]: (r["snip_start"], r["snip_score"])
           for r in snippet_spans(spark, snip_index, query, vocab, cand,
                                  window=5).collect()}
    assert set(got) == set(want)
    for doc in want:
        assert got[doc][0] == want[doc][0], (doc, got[doc], want[doc])
        assert np.isclose(got[doc][1], want[doc][1], atol=1e-9), doc


def test_snippets_text_slice_aligns_with_positions(spark, vocab, snip_index):
    """The extracted snippet must be exactly the window's tokens — in
    particular for doc 2, whose DOUBLE space must NOT shift the window
    (both sides skip empty split artifacts)."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r for r in snippets(
        spark, snip_index, "t1 t2 t3", vocab, docs, k=6, window=5).collect()}
    for doc_id, r in got.items():
        toks = _toks(dict(DOCS)[doc_id])
        s = r["snip_start"]
        assert r["snippet"] == " ".join(toks[s : s + 5]), doc_id
    assert 2 in got  # the double-space doc made it and aligned
    assert 3 not in got  # no query terms


def test_snippets_requires_positional_build(spark, vocab, tmp_path):
    d = str(tmp_path / "nopos")
    build_postings(
        spark, spark.createDataFrame(DOCS[:3], "doc_id long, text string"),
        vocab, d, cfg=PostingsConfig(num_partitions=2),
    )
    cand = spark.createDataFrame([(0,)], "doc_id long")
    with pytest.raises(ValueError, match="store_positions"):
        snippet_spans(spark, d, "t1", vocab, cand).collect()


def test_snippet_spans_huge_doc_ids(spark, vocab, tmp_path):
    """Regression (ADVICE r3): the best-window kernel's composite key was
    (doc_id << 32) | pos, which overflows int64 at doc_id >= 2^31 and
    aliases distinct docs at doc_id >= 2^32. Ids straddling both limits —
    including a pair that collides mod 2^32 — must keep separate windows
    identical to the small-id result."""
    big_docs = [
        (2**31 - 1, DOCS[0][1]),
        (2**31, DOCS[1][1]),
        (2**32 - 1, DOCS[4][1]),
        (2**32, DOCS[5][1]),          # collides with doc 0 mod 2^32
        (2**33 + 7, DOCS[2][1]),
    ]
    d = str(tmp_path / "hugeidx")
    build_postings(
        spark, spark.createDataFrame(big_docs, "doc_id long, text string"),
        vocab, d,
        cfg=PostingsConfig(num_partitions=4, block_size=8,
                           store_positions=True),
    )
    query = "t1 t2 t3"
    cand = spark.createDataFrame([(i,) for i, _ in big_docs], "doc_id long")
    got = {r["doc_id"]: (r["snip_start"], round(r["snip_score"], 6))
           for r in snippet_spans(spark, d, query, vocab, cand,
                                  window=5).collect()}

    # oracle over the SAME texts, keyed by the huge ids
    toks_by_id = {i: _toks(t) for i, t in big_docs}
    qterms = ("t1", "t2", "t3")
    dfs = {t: sum(1 for toks in toks_by_id.values() if t in toks)
           for t in qterms}
    weights = {t: idf(len(big_docs), dfs[t]) for t in qterms}
    for doc_id, toks in toks_by_id.items():
        hits = [(i, weights[t]) for i, t in enumerate(toks) if t in weights]
        if not hits:
            assert doc_id not in got
            continue
        best = None
        for p, _ in hits:
            score = sum(w for q, w in hits if p <= q < p + 5)
            if best is None or score > best[1] + 1e-12:
                best = (p, score)
        assert doc_id in got, doc_id
        assert got[doc_id][0] == best[0], doc_id
        assert got[doc_id][1] == pytest.approx(best[1], abs=1e-5)
