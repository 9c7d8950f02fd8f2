"""Phrase and boolean queries over the positional inverted index.

Not in the reference (PeARS-fruit-fly serves signature search only —
dense_fruit_fly/fly_search.py:124-127 ranks by Hamming-similarity argsort);
this is the standard fulltext-engine surface (Lucene PhraseQuery /
BooleanQuery) the north_rule's index family implies, built on the
`store_positions` posting layout (operators/codec.py, operators/postings.py).

Execution shape — 100 TB first:

* Phrase match ships COMPRESSED position payloads, not exploded rows: the
  partition-pruned posting blocks of the phrase terms are split into
  per-posting rows (doc_id, term_id, tf, dl, pos-bytes) WITHOUT decoding
  (codec.slice_position_stream — varbyte terminators locate boundaries),
  hash-clustered by doc_id in ONE exchange whose volume is the compressed
  position bytes (~1-2 B/token occurrence), then matched by a vectorized
  NumPy kernel per partition: decode all positions in one pass, form
  (doc, start = pos - off, off) triples, lexsort, and count runs covering
  every distinct phrase offset. No per-block Python loop, no exploded-row
  shuffle, no second aggregation exchange — for head-term phrases this is
  ~10x less exchange volume than the naive (doc,start) groupBy form.
* Phrase BM25 treats the phrase as a pseudo-term: tf = occurrence count in
  the doc, df = number of matching docs (computed on the result itself via
  a broadcast 1-row aggregate — no driver hop, no single-partition window),
  dl travels in the posting blocks as always. Rank = score desc, doc asc.
* Boolean queries compose existing primitives: must = posting-list
  intersection (groupBy doc HAVING count(distinct term) = n), must_not =
  left_anti join, phrases = phrase_match, scoring = the block-max WAND
  top-k with the candidate set COGROUPED into the scatter
  (bm25.bm25_topk_wand(candidate_df=...) — the scale path, no driver
  materialization).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from pears_fruit_fly_spark.functions.tokenizer import whitespace_tokenize
from pears_fruit_fly_spark.functions.vocab import Vocab
from pears_fruit_fly_spark.operators.bm25 import idf, open_index

MATCH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("phrase_tf", LongType()),
        StructField("dl", LongType()),
    ]
)


def _phrase_offsets(phrase_text: str, vocab: Vocab) -> dict[int, list[int]] | None:
    """Ordered phrase tokens → {term_id: [offsets]}. None when any token is
    OOV: an unindexed word can never satisfy its slot, so the phrase matches
    nothing (Lucene semantics for a required position with no postings)."""
    toks = whitespace_tokenize(phrase_text.replace("\n", " "))
    if not toks:
        return None
    offsets: dict[int, list[int]] = {}
    for off, tok in enumerate(toks):
        tid = vocab.term_to_id.get(tok)
        if tid is None:
            return None
        offsets.setdefault(tid, []).append(off)
    return offsets


def phrase_match(
    spark: SparkSession,
    index_dir: str,
    phrase_text: str,
    vocab: Vocab,
) -> DataFrame:
    """Docs containing the exact phrase → (doc_id, phrase_tf, dl).

    Positions are full-token-stream ordinals (OOV words advance positions —
    postings.tokens_long), so adjacency means adjacency in the original
    text's token sequence. Requires a store_positions build; raises
    otherwise. Tombstoned docs are masked (driver-size sets inside the
    decode UDF, larger sets via distributed anti-join)."""
    info, postings, term_stats, driver_stats, tombstones, tomb_count, tomb_df = (
        open_index(spark, index_dir)
    )
    if not info.get("store_positions", False):
        raise ValueError(
            f"index at {index_dir} was built without store_positions=True — "
            "phrase queries need the positional posting layout "
            "(PostingsConfig(store_positions=True))"
        )
    offsets = _phrase_offsets(phrase_text, vocab)
    if offsets is None:
        return spark.createDataFrame([], MATCH_SCHEMA)
    n_offsets = sum(len(v) for v in offsets.values())
    term_ids = sorted(offsets)

    if driver_stats is not None:
        buckets = sorted(
            {driver_stats[t][1] for t in term_ids if t in driver_stats}
        )
        missing = [t for t in term_ids if t not in driver_stats]
    else:
        rows = (
            term_stats.filter(F.col("term_id").isin(term_ids))
            .select("term_id", "term_bucket").collect()
        )
        found = {int(r["term_id"]): int(r["term_bucket"]) for r in rows}
        buckets = sorted(set(found.values()))
        missing = [t for t in term_ids if t not in found]
    if missing:
        # a phrase term with zero postings can never fill its slot
        return spark.createDataFrame([], MATCH_SCHEMA)

    # partition-pruned scan of exactly the phrase terms' buckets
    blocks = postings.filter(
        F.col("term_bucket").isin(buckets) & F.col("term_id").isin(term_ids)
    ).select("term_id", "n", "first_doc", "tfs", "doc_gaps", "dls", "positions")

    from pears_fruit_fly_spark.operators.postings import (
        POSTING_ROWS_POS_DDL,
        decode_posting_rows_with_positions,
        doc_complete_batches,
    )

    b_offsets = spark.sparkContext.broadcast(offsets)
    b_tomb = spark.sparkContext.broadcast(tombstones)

    def _pairs(batches):
        # position payloads travel COMPRESSED (shared decode body)
        return decode_posting_rows_with_positions(batches, excl=b_tomb.value)

    pairs = blocks.mapInPandas(_pairs, POSTING_ROWS_POS_DDL)
    if tomb_df is not None:
        # tombstone set too large for a broadcast array: distributed mask
        pairs = pairs.join(tomb_df, "doc_id", "left_anti")

    def _match(batches):
        """Vectorized phrase kernel over a doc-clustered, doc-sorted
        partition (doc_complete_batches keeps each doc's rows whole)."""
        offs = b_offsets.value

        def kernel(pdf: pd.DataFrame):
            from pears_fruit_fly_spark.operators.codec import decode_positions

            tf = pdf["tf"].to_numpy()
            flat, _ = decode_positions(
                b"".join(pdf["pos"]), tf
            )
            row = np.repeat(np.arange(len(pdf), dtype=np.int64), tf)
            p_doc = pdf["doc_id"].to_numpy()[row]
            p_term = pdf["term_id"].to_numpy()[row]
            p_dl = pdf["dl"].to_numpy()[row]
            # (doc, start, off) triples — one slice per distinct offset of
            # each term (phrase length is tiny, so this loop is O(L))
            docs_l, starts_l, offs_l, dl_l = [], [], [], []
            for tid, offlist in offs.items():
                sel = p_term == tid
                if not sel.any():
                    continue
                for off in offlist:
                    docs_l.append(p_doc[sel])
                    starts_l.append(flat[sel] - off)
                    offs_l.append(np.full(int(sel.sum()), off, dtype=np.int64))
                    dl_l.append(p_dl[sel])
            if not docs_l:
                return None
            d = np.concatenate(docs_l)
            s = np.concatenate(starts_l)
            o = np.concatenate(offs_l)
            dl = np.concatenate(dl_l)
            # (doc, start, off) triples are unique by construction, so the
            # run length of each (doc, start) IS its distinct-offset count
            order = np.lexsort((o, s, d))
            d, s, dl = d[order], s[order], dl[order]
            new = np.ones(d.size, dtype=bool)
            new[1:] = (d[1:] != d[:-1]) | (s[1:] != s[:-1])
            run_id = np.cumsum(new) - 1
            run_len = np.bincount(run_id)
            hit = run_len == n_offsets
            if not hit.any():
                return None
            rs = np.flatnonzero(new)  # run start index per run
            hit_docs = d[rs[hit]]
            hit_dls = dl[rs[hit]]
            uniq_docs, first_idx, counts = np.unique(
                hit_docs, return_index=True, return_counts=True
            )
            return pd.DataFrame({
                "doc_id": uniq_docs,
                "phrase_tf": counts.astype(np.int64),
                "dl": hit_dls[first_idx],
            })

        for pdf in doc_complete_batches(batches):
            out = kernel(pdf)
            if out is not None:
                yield out

    # ONE exchange, volume = compressed position bytes; local sort clusters
    # each doc's rows so the kernel sees complete docs. Numbered
    # repartition (r6): the keyed form is AQE-coalescible and a phrase's
    # few MB of position payloads coalesce to ONE partition, serializing
    # the match kernel into a single task.
    par = spark.sparkContext.defaultParallelism
    clustered = pairs.repartition(par, "doc_id").sortWithinPartitions(
        "doc_id"
    )
    return clustered.mapInPandas(_match, MATCH_SCHEMA)


def phrase_topk(
    spark: SparkSession,
    index_dir: str,
    phrase_text: str,
    vocab: Vocab,
    k: int = 10,
) -> DataFrame:
    """Top-k BM25 of the phrase-as-pseudo-term → (doc_id, score).

    score = idf(phrase_df) * impact(phrase_tf, dl) with the index's k1/b —
    exactly the single-term BM25 formula over the phrase's occurrence
    statistics. The match set is localCheckpointed once (review finding:
    referencing the lazy plan from both the phrase_df aggregate and the
    scoring branch re-ran the clustered sort + match kernel twice), so
    phrase_df becomes a driver scalar and scoring reads the materialized
    matches; top-k compiles to TakeOrderedAndProject."""
    info, *_ = open_index(spark, index_dir)
    n_docs, avgdl = info["n_docs"], info["avgdl"]
    k1, b = info["k1"], info["b"]
    matches = phrase_match(spark, index_dir, phrase_text, vocab)
    matches = matches.localCheckpoint(eager=True)
    phrase_df = matches.count()
    tf = F.col("phrase_tf").cast("double")
    dl = F.col("dl").cast("double")
    impact = (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    w = idf(n_docs, phrase_df)
    return (
        matches.select("doc_id", (F.lit(w) * impact).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# boolean query surface
# ---------------------------------------------------------------------------


def parse_query(query: str) -> dict:
    """Mini query-string grammar → structured clauses.

    ``+word`` must contain, ``-word`` must NOT contain, ``"a b c"`` exact
    phrase (must), ``-"a b"`` excluded phrase, bare words are should-terms
    (rank, don't filter). Example: ``+spark -flink "fruit fly" hashing``."""
    import re

    not_phrases = re.findall(r'-"([^"]*)"', query)
    rest = re.sub(r'-"[^"]*"', " ", query)
    phrases = re.findall(r'"([^"]*)"', rest)
    rest = re.sub(r'"[^"]*"', " ", rest)
    must, must_not, should = [], [], []
    for tok in whitespace_tokenize(rest.replace("\n", " ")):
        if tok.startswith("+") and len(tok) > 1:
            must.append(tok[1:])
        elif tok.startswith("-") and len(tok) > 1:
            must_not.append(tok[1:])
        else:
            should.append(tok)
    return {
        "must": must,
        "must_not": must_not,
        "phrases": [p for p in phrases if p.strip()],
        "not_phrases": [p for p in not_phrases if p.strip()],
        "should": should,
    }


def _docs_with_terms(
    spark: SparkSession, index_dir: str, term_ids: list[int], require_all: bool
) -> DataFrame | None:
    """doc_ids containing all (require_all) / any of the given terms —
    decoded ids only (no tf/dl/positions), partition-pruned. None when no
    term has postings and require_all is False."""
    info, postings, term_stats, driver_stats, *_ = open_index(spark, index_dir)
    if driver_stats is not None:
        found = {t: driver_stats[t][1] for t in term_ids if t in driver_stats}
    else:
        found = {
            int(r["term_id"]): int(r["term_bucket"])
            for r in term_stats.filter(F.col("term_id").isin(term_ids))
            .select("term_id", "term_bucket").collect()
        }
    if require_all and len(found) < len(set(term_ids)):
        return spark.createDataFrame([], "doc_id long")  # a term matches nothing
    if not found:
        return None
    buckets = sorted(set(found.values()))
    blocks = postings.filter(
        F.col("term_bucket").isin(buckets) & F.col("term_id").isin(list(found))
    ).select("term_id", "n", "first_doc", "tfs", "doc_gaps", "dls")

    def _ids(batches):
        from pears_fruit_fly_spark.operators.codec import decode_blocks_batch

        for pdf in batches:
            if pdf.empty:
                continue
            ids, _, _, rix = decode_blocks_batch(
                pdf["n"].to_numpy(), pdf["first_doc"].to_numpy(),
                pdf["doc_gaps"], pdf["tfs"], pdf["dls"],
            )
            yield pd.DataFrame({
                "doc_id": ids,
                "term_id": pdf["term_id"].to_numpy()[rix].astype(np.int32),
            })

    pairs = blocks.mapInPandas(_ids, "doc_id long, term_id int")
    if require_all:
        # countDistinct dedups (doc,term) repeats across blocks/segments
        # itself — no pre-dedup exchange needed
        n = len(set(term_ids) & set(found))
        return (
            pairs.groupBy("doc_id")
            .agg(F.countDistinct("term_id").alias("nt"))
            .filter(F.col("nt") == n)
            .select("doc_id")
        )
    return pairs.select("doc_id").distinct()


def _fused_candidates(
    spark: SparkSession,
    index_dir: str,
    must_ids: list[int],
    not_ids: list[int],
    any_ids: list[int],
) -> DataFrame | None:
    """Candidate doc_ids for (ALL must) / (ANY any, when no must) minus
    (ANY not) in ONE partition-pruned decode scan + ONE aggregate.

    Each term gets a bit; per doc a single bit_or collapses duplicate
    (doc, term) rows across blocks/segments, then a codegen'd mask test
    replaces the separate intersect aggregate, exclude-distinct and
    left_anti join of the unfused form (guide §2.4 — 3 exchanges → 1).
    Returns None when the caller should take the unfused path (mask baked
    for ≤60 required/optional terms; exclusion terms all share one bit)."""
    req = sorted(set(must_ids))
    opt = [] if req else sorted(set(any_ids))
    if len(req) + len(opt) > 60:
        return None
    excl = sorted(set(not_ids) - set(req) - set(opt))

    info, postings, term_stats, driver_stats, *_ = open_index(spark, index_dir)
    all_ids = sorted(set(req) | set(opt) | set(excl))
    if driver_stats is not None:
        found = {t: driver_stats[t][1] for t in all_ids if t in driver_stats}
    else:
        found = {
            int(r["term_id"]): int(r["term_bucket"])
            for r in term_stats.filter(F.col("term_id").isin(all_ids))
            .select("term_id", "term_bucket").collect()
        }
    empty = spark.createDataFrame([], "doc_id long")
    if req and any(t not in found for t in req):
        return empty  # a must-term with no postings matches nothing
    if not req and not any(t in found for t in opt):
        return empty  # no universe to subtract from
    buckets = sorted({found[t] for t in all_ids if t in found})
    scan_ids = [t for t in all_ids if t in found]
    blocks = postings.filter(
        F.col("term_bucket").isin(buckets) & F.col("term_id").isin(scan_ids)
    ).select("term_id", "n", "first_doc", "tfs", "doc_gaps", "dls")

    def _ids(batches):
        from pears_fruit_fly_spark.operators.codec import decode_blocks_batch

        for pdf in batches:
            if pdf.empty:
                continue
            ids, _, _, rix = decode_blocks_batch(
                pdf["n"].to_numpy(), pdf["first_doc"].to_numpy(),
                pdf["doc_gaps"], pdf["tfs"], pdf["dls"],
            )
            yield pd.DataFrame({
                "doc_id": ids,
                "term_id": pdf["term_id"].to_numpy()[rix].astype(np.int32),
            })

    pairs = blocks.mapInPandas(_ids, "doc_id long, term_id int")
    keep = req if req else opt
    bit = None
    for i, t in enumerate(keep):
        clause = F.when(F.col("term_id") == t, F.lit(1 << i))
        bit = clause if bit is None else bit.when(F.col("term_id") == t,
                                                 F.lit(1 << i))
    excl_bit = 1 << 62
    for t in excl:
        bit = bit.when(F.col("term_id") == t, F.lit(excl_bit))
    bit = bit.otherwise(F.lit(0))
    agg = pairs.groupBy("doc_id").agg(F.bit_or(bit).alias("m"))
    if req:
        want = (1 << len(req)) - 1
        cond = (F.col("m").bitwiseAND(F.lit(want)) == want)
    else:
        cond = (F.col("m").bitwiseAND(F.lit((1 << len(opt)) - 1)) != 0)
    cond = cond & (F.col("m").bitwiseAND(F.lit(excl_bit)) == 0)
    return agg.filter(cond).select("doc_id")


def search_boolean(
    spark: SparkSession,
    index_dir: str,
    query: str | dict,
    vocab: Vocab,
    k: int = 10,
) -> DataFrame:
    """Boolean retrieval + BM25 ranking → (doc_id, score), score desc/doc asc.

    Clause semantics (Lucene BooleanQuery): must/phrases FILTER the
    candidate set (posting intersection / positional match), must_not
    subtracts (left_anti), and ranking is BM25 over must+should terms via
    the block-max WAND top-k with the candidate set cogrouped into the
    scatter. A query with only should-terms and no filters degrades to
    plain WAND (no candidate set at all — the fast common case). Phrase
    clauses require a store_positions build."""
    from pears_fruit_fly_spark.operators.bm25 import bm25_topk_wand

    clauses = parse_query(query) if isinstance(query, str) else dict(query)
    must = clauses.get("must") or []
    must_not = clauses.get("must_not") or []
    phrases = clauses.get("phrases") or []
    not_phrases = clauses.get("not_phrases") or []
    should = clauses.get("should") or []

    def tid(tok: str):
        return vocab.term_to_id.get(tok)

    empty = spark.createDataFrame([], "doc_id long, score double")
    must_ids = [tid(t) for t in must]
    if any(t is None for t in must_ids):
        return empty  # an OOV must-term matches nothing
    not_ids = [t for t in (tid(x) for x in must_not) if t is not None]

    cand: DataFrame | None = None
    fused_not = False  # True when the NOT-terms rode inside the fused agg
    if must_ids:
        cand = _fused_candidates(spark, index_dir, must_ids, not_ids, [])
        if cand is not None:
            fused_not = True
        else:  # >60 must terms: unfused fallback
            cand = _docs_with_terms(spark, index_dir, must_ids,
                                    require_all=True)
    for p in phrases:
        # excluding NOT-docs before vs after the phrase intersect is
        # equivalent: (A \ E) ∩ P == (A ∩ P) \ E
        pm = phrase_match(spark, index_dir, p, vocab).select("doc_id")
        cand = pm if cand is None else cand.join(pm, "doc_id")
    if (not_ids or not_phrases) and cand is None:
        # NOT needs a set to subtract from: docs holding at least one
        # scoring term (the OR universe — exactly what would be scored)
        scoring = [t for t in (tid(x) for x in set(must + should))
                   if t is not None]
        if not scoring:
            return empty
        fc = _fused_candidates(spark, index_dir, [], not_ids, scoring)
        if fc is not None:
            cand = fc
            fused_not = True
        else:
            cand = _docs_with_terms(spark, index_dir, scoring,
                                    require_all=False)
            if cand is None:
                return empty
    if not_ids and not fused_not:
        exclude = _docs_with_terms(spark, index_dir, not_ids, require_all=False)
        if exclude is not None:
            cand = cand.join(exclude, "doc_id", "left_anti")
    for p in not_phrases:
        cand = cand.join(
            phrase_match(spark, index_dir, p, vocab).select("doc_id"),
            "doc_id", "left_anti",
        )

    score_text = " ".join(must + should)
    if not score_text:
        # pure filter query: every candidate "matches equally" — score 0,
        # deterministic doc_id order; deleted docs masked like every path
        if cand is None:
            return empty
        _, _, _, _, _, tomb_count, _ = open_index(spark, index_dir)
        if tomb_count > 0:
            from pears_fruit_fly_spark.operators.postings import (
                read_tombstones_df,
            )

            # always the anti-join form: a 100k-id isin list would degrade
            # the expression tree (ADVICE r2 class of bug)
            cand = cand.join(
                read_tombstones_df(spark, index_dir), "doc_id", "left_anti"
            )
        return (
            cand.select("doc_id", F.lit(0.0).alias("score"))
            .orderBy("doc_id").limit(k)
        )
    return bm25_topk_wand(
        spark, index_dir, score_text, vocab, k=k, candidate_df=cand
    )
