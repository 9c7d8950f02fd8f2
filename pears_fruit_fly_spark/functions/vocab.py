"""Vocabulary (PN-layer) handling.

The reference reads a SentencePiece `.vocab` file (tab-separated
`piece\\tlogprob`), skipping duplicates/empties, and weights each piece with
(-logprob)**3 (ref: fruit_fly/hash.py:36-53; file format spm/spmcc.vocab).
SentencePiece is not available in this sandbox, so the tokenizer is an
interface: a pinned deterministic whitespace tokenizer over a frozen vocab for
tests, SPM pluggable in production (SURVEY.md §7 hard-parts note).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


@dataclass
class Vocab:
    """Frozen vocabulary: term -> id, plus per-id weights."""

    terms: list[str]
    logprobs: np.ndarray  # negative floats (SPM convention)
    power: float = 3.0

    def __post_init__(self) -> None:
        self.term_to_id = {t: i for i, t in enumerate(self.terms)}

    @property
    def size(self) -> int:
        return len(self.terms)

    @property
    def weights(self) -> np.ndarray:
        """weight_i = (-logprob_i) ** power (ref: fruit_fly/hash.py:45,51)."""
        return (-self.logprobs) ** self.power

    def encode(self, tokens: list[str]) -> list[int]:
        """Map tokens to ids, dropping out-of-vocabulary tokens."""
        t2i = self.term_to_id
        return [t2i[t] for t in tokens if t in t2i]


def parse_vocab_lines(lines: list[str], power: float = 3.0) -> Vocab:
    """Parse SPM-format `piece\\tlogprob` lines.

    Reference reader semantics (fruit_fly/hash.py:36-53): iterate in file
    order, skip empty pieces and duplicates, ids assigned densely in order of
    first appearance.
    """
    terms: list[str] = []
    logprobs: list[float] = []
    seen: set[str] = set()
    for line in lines:
        line = line.rstrip("\n")
        if not line:
            continue
        parts = line.split("\t")
        piece = parts[0]
        if piece == "" or piece in seen:
            continue
        seen.add(piece)
        terms.append(piece)
        logprobs.append(float(parts[1]))
    return Vocab(terms=terms, logprobs=np.asarray(logprobs, dtype=np.float64), power=power)


def load_vocab(path: str, power: float = 3.0) -> Vocab:
    with open(path, encoding="utf-8") as f:
        return parse_vocab_lines(f.readlines(), power=power)


def vocab_to_df(spark: SparkSession, vocab: Vocab) -> DataFrame:
    """Vocabulary as a small broadcast-able dimension table
    (term_id int, term string, logprob double, weight double)."""
    pdf = pd.DataFrame(
        {
            "term_id": np.arange(vocab.size, dtype=np.int32),
            "term": vocab.terms,
            "logprob": vocab.logprobs,
            "weight": vocab.weights,
        }
    )
    return spark.createDataFrame(pdf)


def build_vocab_from_corpus(
    tokens_df: DataFrame, max_terms: int = 20_000
) -> pd.DataFrame:
    """Derive a corpus-driven vocabulary: the max_terms most frequent tokens,
    with unigram logprobs (SPM-style, natural log of corpus probability).

    Distributed: one hash-agg shuffle over tokens, then a driver-side top-k
    collect of at most max_terms rows. Ordering pinned (count desc, term asc).
    """
    from pyspark.sql import functions as F

    counts = tokens_df.groupBy("term").agg(F.count("*").alias("cf"))
    top = counts.orderBy(F.desc("cf"), F.asc("term")).limit(max_terms).toPandas()
    total = float(top["cf"].sum())
    top["logprob"] = np.log(top["cf"] / total)
    top["term_id"] = np.arange(len(top), dtype=np.int32)
    return top[["term_id", "term", "cf", "logprob"]]
