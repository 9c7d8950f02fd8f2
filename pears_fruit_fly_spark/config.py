"""Engine configuration dataclasses.

Hyperparameter defaults follow the reference's deployed production fly
(ref: web_map/pod_starter/fly/fly.m — kc_size=7076, wta=10, projection
7076x20000; loaded at web_map/pod_starter/hash_pod.py:132-134) and the pod
hashing CLI defaults (top_words=250 at web_map/pod_starter/hash_pod.py:42,
logprob power 3 at fruit_fly/hash.py:51). Test fixtures shrink KC to 64 so a
signature fits one 64-bit word.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class FlyConfig:
    """Fruit-fly hashing hyperparameters."""

    pn_size: int = 2000          # vocabulary size (PN layer); 20000 in prod
    kc_size: int = 64            # Kenyon-cell count; 7076 in prod
    proj_size: int = 8           # PNs wired into each KC
    top_words: int = 250         # doc-side WTA absolute k (hash_pod.py:42)
    wta_percent: float = 10.0    # KC-side WTA, percent of KCs kept
    logprob_power: float = 3.0   # weight = (-logprob) ** power (hash.py:51)
    seed: int = 7                # projection-matrix RNG seed

    @property
    def sig_words(self) -> int:
        """64-bit words per packed signature."""
        return (self.kc_size + 63) // 64

    @property
    def wta_k(self) -> int:
        """Absolute KC count kept by the KC-side WTA (hash.py:104)."""
        return max(1, int(self.wta_percent * self.kc_size / 100))


@dataclass(frozen=True)
class BM25Config:
    """Okapi BM25 parameters — pinned by BASELINE.json north_rule."""

    k1: float = 1.2
    b: float = 0.75


@dataclass(frozen=True)
class PostingsConfig:
    """Inverted-index layout parameters."""

    block_size: int = 128        # docs per block-max block
    num_partitions: int = 32     # term partitions (term_bucket count)
    skew_df_threshold: int = 100_000  # df above which a term is salted
    max_docs_per_subpartition: int = 1_000_000  # salt splitting granularity
    flat_staging_max_docs: int = 10_000  # below this corpus size the
    # staging write skips the per-bucket directory layout (64-4096 tiny
    # dirs cost more in commit overhead than they save): tokens land in a
    # few plain parquet files with term_bucket as a physical column, and
    # each encode task filters its bucket from the (small) whole staging.
    # Large builds keep the partitioned layout so tasks read ONLY their
    # bucket (flat mode re-reads the whole staging once per bucket task,
    # so it only pays while staging is a few MB — measured breakeven
    # ~10k web docs). Recorded in build_info so resume keeps the layout.
    encode_rows_per_task: int = 4_000_000  # encode-task size cap: a bucket
    # with more staged rows than this splits into hash-shards of whole
    # (term, salt) runs, so no single encode task holds a monster bucket
    # (output layout is shard-count independent)
    bucket_batch_size: int | None = None  # buckets encoded per Spark job;
    # None = all pending in one job (fastest); smaller = finer resume
    # granularity (checkpoint manifest rows are always per-bucket)
    jvm_tokenizer: bool = False  # False (default) = vectorized Arrow
    # mapInPandas path: tf AND dl computed narrowly, so the whole staging
    # write is a SINGLE exchange (the term_bucket repartition) — also the
    # only path for SentencePiece tokenization. True = all-JVM explode +
    # broadcast vocab join (one doc_id exchange before the bucket one);
    # use on clusters where Python workers are scarce.
    staging_filesystem: object | None = None  # optional picklable
    # pyarrow.fs.FileSystem for the worker-side staged-bucket reads of
    # the encode stage (operators/postings._bucket_encoder). On a real
    # cluster, object-store credentials often live in Hadoop/Spark conf
    # that pyarrow's URI resolution cannot see (e.g. assumed-role S3A
    # settings) — inject an S3FileSystem / PyFileSystem / SubTreeFileSystem
    # here and every bucket read resolves through it (scheme prefix is
    # stripped from paths before they are handed over). None (default):
    # pyarrow infers the filesystem from the staging path itself.
    staging_format: str = "auto"  # "auto" (default) resolves to "blobs"
    # whenever the build can use it (everything except jvm_tokenizer) and
    # "rows" otherwise. "rows" = staged tokens are
    # one parquet row per (doc, term) — the layout every tool can read.
    # "blobs" = the tokenize kernel packs each batch's tokens into ONE
    # binary cell per term bucket before they leave the Python worker
    # (operators/postings.pack_token_blobs), so the Arrow return, the
    # bucket exchange and the staging parquet move thousands of blob rows
    # instead of billions of token rows — the r4 BENCH_SCALING
    # decomposition showed the staging leg flat at 8->32 cores with
    # per-token rows purely from per-row machinery (UnsafeRow conversion,
    # exchange hashing, per-row parquet encode). Blocks/postings output is
    # byte-identical between the two (pinned by test). Positional builds
    # stage as blobs too (r6, PTB2 layout): the varbyte position runs ride
    # as one flat stream + per-run byte widths per blob, eliminating the
    # per-(doc,term) row machinery that dominated the positional build.
    store_positions: bool = False  # True = record token positions per
    # posting (the Lucene .pos analog; enables phrase queries,
    # operators/phrase.py). Positions are delta+varbyte encoded in the
    # narrow tokenize stage, so the build's one wide exchange ships
    # compressed bytes; index grows by ~1-2 bytes per token occurrence.
    # Forces the Arrow tokenizer (positions need the full token stream).


INGEST_MIN_CHARS = 1000  # ref: common_crawl_processor/cc_process_wet.py:77
