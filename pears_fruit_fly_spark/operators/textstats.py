"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All pure Column expressions (whole-stage codegen);
each has a 1:1 DuckDB-SQL oracle in __spark_entry__.py.

The language-ID heuristic replaces the reference's langdetect call
(common_crawl_processor/cc_process_wet.py:26-33) with a deterministic
stopword-vote model — same column contract (lang code or 'unk').
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pears_fruit_fly_spark.operators.dedup import tokens_array

# Small deterministic stopword lists (top function words per language).
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "of", "and", "to", "in", "is", "it", "that", "was", "for",
           "on", "are", "with", "as", "at", "this", "have", "from", "or", "a"],
    "de": ["der", "die", "das", "und", "ist", "ich", "nicht", "ein", "zu",
           "den", "mit", "von", "auf", "für", "im", "dem", "sich", "des", "er"],
    "fr": ["le", "la", "les", "de", "des", "et", "est", "un", "une", "du",
           "que", "qui", "dans", "pour", "pas", "sur", "au", "avec", "ce"],
    "es": ["el", "la", "los", "las", "de", "y", "es", "un", "una", "en",
           "que", "del", "se", "por", "con", "para", "no", "su", "al"],
}


def token_count(text_col: str | Column) -> Column:
    """Whitespace-ish token count (size of the alnum tokenization)."""
    return F.size(tokens_array(text_col))


def bpe_ish_piece_count(text_col: str | Column) -> Column:
    """Cheap BPE-proxy token count: alnum runs + punctuation marks each count
    as one piece (a deterministic stand-in for a subword tokenizer budget).
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    words = F.size(tokens_array(c))
    punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    return (words + punct).alias("pieces")


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pred_lang, votes): language with the most stopword token hits;
    'unk' when nothing matches. Ties broken by language code asc
    (deterministic). One explode + hash agg + ranking window."""
    spark = df.sparkSession
    sw = spark.createDataFrame(
        [(lang, w) for lang, ws in STOPWORDS.items() for w in ws],
        "cand_lang string, tok string",
    )
    toks = df.select(F.col(id_col).alias("id"), F.explode(tokens_array(text_col)).alias("tok"))
    votes = (
        toks.join(F.broadcast(sw), "tok")
        .groupBy("id", "cand_lang")
        .agg(F.count("*").alias("votes"))
    )
    w = Window.partitionBy("id").orderBy(F.desc("votes"), F.asc("cand_lang"))
    best = votes.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")
    all_ids = df.select(F.col(id_col).alias("id"))
    return (
        all_ids.join(best, "id", "left")
        .select(
            "id",
            F.coalesce("cand_lang", F.lit("unk")).alias("pred_lang"),
            F.coalesce("votes", F.lit(0)).alias("votes"),
        )
    )


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc quality signals, all codegen-able expressions:

    n_chars, n_tokens, mean_token_len, digit_ratio, punct_ratio,
    stopword_ratio (en), upper_ratio, and a composite quality_score in [0,1].
    """
    c = F.col(text_col)
    toks = tokens_array(text_col)
    n_chars = F.length(c)
    n_tokens = F.size(toks)
    alnum_chars = F.length(F.regexp_replace(c, r"[^A-Za-z0-9]", ""))
    digits = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    upper = F.length(F.regexp_replace(c, r"[^A-Z]", ""))
    sw = STOPWORDS["en"]
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(sw)))
    mean_tok = F.when(n_tokens > 0, alnum_chars / n_tokens).otherwise(F.lit(0.0))
    digit_ratio = F.when(n_chars > 0, digits / n_chars).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    upper_ratio = F.when(n_chars > 0, upper / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0))
    # composite: reward length & stopwords, punish digit/punct noise.
    score = (
        F.least(n_tokens / F.lit(200.0), F.lit(1.0)) * 0.35
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.25
        + (1 - F.least(digit_ratio * 5, F.lit(1.0))) * 0.2
        + (1 - F.least(punct_ratio * 5, F.lit(1.0))) * 0.2
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(mean_tok, 6).alias("mean_token_len"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(upper_ratio, 6).alias("upper_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


_FP_MOD = (1 << 31) - 1


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Order-sensitive document fingerprint over the token stream.

    fp = sum over positions p of ((xxhash64(token_p) mod M) * (p+1) mod M),
    all mod M = 2^31-1 — position-weighted so permuted docs differ. Kept in
    31-bit residues so per-term products (<2^31 * positions) and the running
    sum stay far from int64 overflow under ANSI mode. Pure Column algebra
    (posexplode + hash agg); the DuckDB oracle replaces xxhash64 with a rank
    dictionary (see __spark_entry__ q_fingerprint).
    """
    toks = df.select(
        F.col(id_col).alias("id"), F.posexplode(tokens_array(text_col)).alias("pos", "tok")
    )
    contrib = F.pmod(F.pmod(F.xxhash64("tok"), F.lit(_FP_MOD)) * (F.col("pos") + 1), F.lit(_FP_MOD))
    return toks.groupBy("id").agg(
        F.pmod(F.sum(contrib), F.lit(_FP_MOD)).alias("fingerprint")
    )


def repetition_metrics(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Within-document repetition detection — the Dolma/RedPajama-style
    quality gate that catches boilerplate/spam pages (not in the reference,
    mandated by the task's training-data-pipeline families):

      * dup_line_frac   — 1 - distinct_nonempty_lines / nonempty_lines
      * top_bigram_share — occurrences of the most frequent token bigram
                           over total bigram count

    Pure Column algebra (split/explode/window), no UDFs; one shuffle per
    aggregation keyed by doc id — scales like every other per-doc stat.
    """
    lines = df.select(
        F.col(id_col).alias("id"),
        F.filter(
            F.split(F.col(text_col), "\n"), lambda x: F.trim(x) != ""
        ).alias("ls"),
    )
    line_stats = lines.select(
        "id",
        F.size("ls").alias("n_lines"),
        F.size(F.array_distinct("ls")).alias("n_distinct"),
    ).select(
        "id",
        "n_lines",
        F.round(
            F.when(F.col("n_lines") > 0,
                   1.0 - F.col("n_distinct") / F.col("n_lines"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("dup_line_frac"),
    )

    from pears_fruit_fly_spark.operators.dedup import shingles_array

    bi = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles_array(text_col, 2)).alias("g"),
    )
    counts = bi.groupBy("id", "g").agg(F.count("*").alias("c"))
    per_doc = counts.groupBy("id").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("total_c")
    )
    bigram = per_doc.select(
        "id",
        F.round(F.col("top_c") / F.col("total_c"), 6).alias("top_bigram_share"),
    )
    return (
        line_stats.join(bigram, "id", "left")
        .select(
            F.col("id"),
            F.col("n_lines").cast("int").alias("n_lines"),
            "dup_line_frac",
            F.coalesce("top_bigram_share", F.lit(0.0)).alias("top_bigram_share"),
        )
    )
