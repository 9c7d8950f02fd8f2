"""Deterministic mixture sampling for training-data pipelines.

Web-scale corpus curation reweights domains ("sample Common Crawl at 0.3,
books at 2 epochs, code at 0.8 ..."): the sampler must be DETERMINISTIC
(same corpus -> same sample, for reproducible training runs and exact
resume), STABLE under appends (a doc's keep/drop decision never depends on
what else is in the corpus), and cheap (no shuffle for rate sampling).

Both operators key on a Knuth multiplicative hash of a NUMERIC key column
(doc_id) — pure integer arithmetic, so the DuckDB oracle reproduces the
exact sample, unlike rand(seed)/TABLESAMPLE whose streams are
engine-private. For string keys, assign ids first (operators/docids.py).

* ``stratified_sample(df, strata, fractions, key)`` — per-stratum Bernoulli
  by hash threshold: keep iff u(key) < fraction[stratum]. ZERO shuffle —
  a narrow filter that pushes into the scan; append-stable by construction.
* ``mixture_take(df, strata, quotas, key)`` — exact per-stratum quotas:
  the n_s docs with the smallest u(key) per stratum (ties: key asc) — the
  deterministic analog of "take N docs per domain". One shuffle on the
  stratum key (window rank); quotas beyond the stratum size return the
  whole stratum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Multiplicative-hash constants: odd, ~2^30.3 (golden-ratio family), chosen
# so (value mod 2^32) * A < 2^63 — every step stays EXACT in int64, in
# Spark and DuckDB alike (no wraparound, no ANSI overflow, no float
# rounding: 2^32 < 2^53).
_MULT = 1327217885
_MULT2 = 1073807359  # second-round mixer (odd)
_MOD = 1 << 32


def _salt_word(salt: int) -> int:
    """Salt pre-mixed to a full-width word (so salt=1 vs salt=2 differ in
    high bits too)."""
    return (int(salt) % _MOD) * _MULT2 % _MOD


def hash_uniform(key: Column, salt: int = 0) -> Column:
    """Deterministic uniform in [0, 1) from a NON-NEGATIVE integer key:
    two multiply rounds with the salt XORed in BETWEEN —
    ((key·A mod 2^32) xor mix(salt)) · A mod 2^32 — exact int64 arithmetic
    (cross-engine stable). The XOR between the rounds makes different
    salts genuine re-hashes; a purely additive salt would only ROTATE the
    u-space, leaving salted samples ~identical whenever salt·A mod 2^32 is
    small (review finding: salt=13 overlapped salt=0 by 96.6% at p=0.5).

    The high word is folded in first — key xor (key >> 32) — so ids
    differing by a multiple of 2^32 do NOT alias (ADVICE r3: beyond ~4.3B
    dense doc ids a bare mod-2^32 reduction made keep/drop decisions
    perfectly correlated across aliased ids, for every salt). For keys
    < 2^32 the fold is the identity, so existing samples are unchanged.
    The DuckDB oracles repeat the same fold (xor(key, key >> 32))."""
    k64 = key.cast("long")
    k = F.pmod(k64.bitwiseXOR(F.shiftright(k64, 32)), F.lit(_MOD))
    h1 = F.pmod(k * F.lit(_MULT), F.lit(_MOD))
    h2 = h1.bitwiseXOR(F.lit(_salt_word(salt)))
    return F.pmod(h2 * F.lit(_MULT), F.lit(_MOD)).cast("double") / float(_MOD)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    salt: int = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each row iff hash_uniform(key) < fractions[stratum]. Strata
    missing from the map get default_fraction (0.0 = drop — the explicit
    allowlist shape of corpus mixing configs). Narrow, shuffle-free."""
    frac = F.lit(float(default_fraction))
    for stratum, p in sorted(fractions.items()):
        frac = F.when(
            F.col(strata_col) == stratum, F.lit(float(p))
        ).otherwise(frac)
    return df.filter(hash_uniform(F.col(key_col), salt) < frac)


def mixture_take(
    df: DataFrame,
    strata_col: str,
    quotas: dict[str, int],
    key_col: str,
    salt: int = 0,
) -> DataFrame:
    """Exactly min(quota, |stratum|) rows per stratum: the quota-smallest
    hash_uniform values (ties broken by key asc — total order, so the
    result is unique). Strata without a quota are dropped."""
    qcol = F.lit(None).cast("int")
    for stratum, n in sorted(quotas.items()):
        qcol = F.when(
            F.col(strata_col) == stratum, F.lit(int(n))
        ).otherwise(qcol)
    u = hash_uniform(F.col(key_col), salt)
    w = Window.partitionBy(strata_col).orderBy(u.asc(), F.col(key_col).asc())
    # collision-free temp names: never clobber caller columns
    qc, rk = "__mixture_q", "__mixture_rk"
    while qc in df.columns or rk in df.columns:
        qc, rk = qc + "_", rk + "_"
    return (
        df.withColumn(qc, qcol)
        .filter(F.col(qc).isNotNull())
        .withColumn(rk, F.row_number().over(w))
        .filter(F.col(rk) <= F.col(qc))
        .drop(qc, rk)
    )
