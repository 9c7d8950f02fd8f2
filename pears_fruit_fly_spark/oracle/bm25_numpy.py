"""Pinned single-process BM25 oracle (SURVEY.md scope note).

The reference has no BM25 (its ranking is Hamming NN), so rank identity for
the new engine is defined against THIS oracle: Okapi BM25, k1=1.2, b=0.75,
idf = ln((N - df + 0.5) / (df + 0.5) + 1)  [the Lucene/ATIRE non-negative
variant], dl = in-vocab token count, ties broken by doc_id ascending.
Float64 throughout; the Spark engine must match scores to 1e-9 and ranks
exactly (tests/test_bm25.py).
"""

from __future__ import annotations

import math

import numpy as np

from pears_fruit_fly_spark.functions.tokenizer import whitespace_tokenize
from pears_fruit_fly_spark.functions.vocab import Vocab


class BM25Oracle:
    def __init__(self, docs: list[tuple[int, str]], vocab: Vocab,
                 k1: float = 1.2, b: float = 0.75):
        """docs: (doc_id, text) pairs. Tokenization identical to the engine's
        index path (whitespace over newline-flattened text, vocab-filtered)."""
        self.k1, self.b = k1, b
        self.vocab = vocab
        self.doc_ids: list[int] = []
        self.doc_terms: list[dict[int, int]] = []
        self.df: dict[int, int] = {}
        dls = []
        for doc_id, text in docs:
            ids = vocab.encode(whitespace_tokenize((text or "").replace("\n", " ")))
            counts: dict[int, int] = {}
            for t in ids:
                counts[t] = counts.get(t, 0) + 1
            self.doc_ids.append(doc_id)
            self.doc_terms.append(counts)
            dls.append(len(ids))
            for t in counts:
                self.df[t] = self.df.get(t, 0) + 1
        self.dl = np.asarray(dls, dtype=np.float64)
        self.n_docs = len(self.doc_ids)
        self.avgdl = float(self.dl.sum() / max(1, self.n_docs))

    def idf(self, term_id: int) -> float:
        df = self.df.get(term_id, 0)
        return math.log((self.n_docs - df + 0.5) / (df + 0.5) + 1.0)

    def score_query(self, query_text: str) -> np.ndarray:
        """Dense scores over all docs. Query terms weighted by query tf
        (a duplicated query term contributes twice — pinned semantics)."""
        q_ids = self.vocab.encode(
            whitespace_tokenize(query_text.replace("\n", " "))
        )
        scores = np.zeros(self.n_docs, dtype=np.float64)
        if not q_ids:
            return scores
        qcounts: dict[int, int] = {}
        for t in q_ids:
            qcounts[t] = qcounts.get(t, 0) + 1
        for t, qtf in qcounts.items():
            idf = self.idf(t)
            for i, counts in enumerate(self.doc_terms):
                tf = counts.get(t)
                if tf:
                    denom = tf + self.k1 * (1 - self.b + self.b * self.dl[i] / self.avgdl)
                    scores[i] += qtf * idf * tf * (self.k1 + 1) / denom
        return scores

    def topk(self, query_text: str, k: int) -> list[tuple[int, float]]:
        """[(doc_id, score)] — score desc, doc_id asc; zero-score docs excluded."""
        scores = self.score_query(query_text)
        nz = [i for i in range(self.n_docs) if scores[i] > 0.0]
        order = sorted(nz, key=lambda i: (-scores[i], self.doc_ids[i]))[:k]
        return [(self.doc_ids[i], float(scores[i])) for i in order]
