"""Tokenization interface.

Two tokenizers, both deterministic:

* ``whitespace_tokenize`` — split on single spaces, the exact semantic of the
  reference's CountVectorizer(token_pattern='[^ ]+', lowercase=False) over
  pre-SentencePieced text (ref: fruit_fly/hash.py:198). Used by the fly
  featurizer where input text is already piece-encoded.
* ``word_tokenize`` — lowercase + split on non-alphanumeric runs; the
  analytics-path tokenizer (language ID, quality scoring, dedup shingles),
  mirroring the reference's preprocessing regex
  (ref: common_crawl_processor/LDAmodel.py:6-14 — lowercase, \\w+, drop
  numerics / 1-char tokens is applied separately by callers).

SentencePiece, when available, plugs in behind ``sp_tokenize`` (import-gated:
the lib is absent in this sandbox, SURVEY.md §7).
"""

from __future__ import annotations

import re

_WORD_RE = re.compile(r"[a-z0-9]+")


def whitespace_tokenize(text: str) -> list[str]:
    """Tokens = maximal runs of non-space chars (CountVectorizer '[^ ]+')."""
    return [t for t in text.split(" ") if t]


def word_tokenize(text: str) -> list[str]:
    """Lowercased alphanumeric-run tokens."""
    return _WORD_RE.findall(text.lower())


# SQL fragments that MUST stay in lockstep with word_tokenize(): the Spark
# DataFrame queries and the DuckDB oracle SQL both tokenize with this pattern.
SPARK_TOKEN_SPLIT_PATTERN = "[^a-z0-9]+"


def sp_tokenize_factory(model_path: str, vocab_path: str | None = None):
    """Return a SentencePiece ``encode_as_pieces`` callable.

    Production path (ref: fruit_fly/hash.py:32-33,248 loads spm/spmcc.model).
    When the sentencepiece lib is absent and a ``.vocab`` export is given
    (the reference ships one next to every .model), falls back to the pure-
    Python unigram Viterbi inference in functions/spm.py — same segmentation
    semantics, no binary-protobuf dependency.
    """
    try:
        import sentencepiece as spm  # noqa: PLC0415 — optional dependency

        sp = spm.SentencePieceProcessor()
        sp.load(model_path)

        def _tok(text: str) -> list[str]:
            return sp.encode_as_pieces(text)

        return _tok
    except ImportError:
        if vocab_path is None:
            raise
        from pears_fruit_fly_spark.functions.spm import load_unigram_tokenizer

        return load_unigram_tokenizer(vocab_path).encode_as_pieces
