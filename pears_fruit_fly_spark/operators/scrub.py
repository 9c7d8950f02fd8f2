"""Web-corpus scrubbing ops: URL canonicalization + PII detection/redaction.

Standard LLM-training-pipeline stages (not in the reference — mandated by
the task's training-data families): canonical urls collapse crawl
duplicates BEFORE content hashing (scheme/host case, default ports,
fragments, utm_* tracking params, trailing slashes), and PII scrubbing
redacts emails/phone numbers from text destined for training.

Everything is pure Column algebra (JVM regex, whole-stage codegen; no
UDFs). Regexes are restricted to the RE2-compatible subset (no
lookaround), so the DuckDB oracles run the IDENTICAL patterns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RE2-safe patterns, shared verbatim with the DuckDB oracles
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"
# anchored at a ?/& separator (kept via backreference) so a param whose name
# merely CONTAINS 'utm_' (e.g. ?xutm_source=1) is never mangled; the +
# swallows consecutive utm params in one match so single-pass replace-all
# semantics (shared by Spark and DuckDB) leave no orphaned fragments
_UTM_RE = r"([?&])(utm_[a-z]+=[^&#]*&?)+"


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form: lowercase scheme+host, strip the scheme's DEFAULT port
    only (:80 for http, :443 for https — :80 on https is a real distinct
    endpoint), drop #fragments and utm_* params, trim trailing '?', '&', '/'.
    """
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, r"#.*$", "")                  # fragment
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(host, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .otherwise(host)
    )
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    rest = F.regexp_replace(rest, _UTM_RE, r"$1")         # tracking params
    rest = F.regexp_replace(rest, r"[?&]+$", "")          # dangling ?/&
    rest = F.regexp_replace(rest, r"\?&", "?")            # ?&x -> ?x
    rest = F.regexp_replace(rest, r"/$", "")              # trailing slash
    return F.when(scheme == "", u).otherwise(
        F.concat(scheme, F.lit("://"), host, rest)
    )


def pii_scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_emails, n_phones, redacted): counts + text with emails/phones
    replaced by <EMAIL>/<PHONE> placeholders."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
        .cast("int").alias("n_emails"),
        F.size(
            F.regexp_extract_all(
                F.regexp_replace(t, EMAIL_RE, "<EMAIL>"),
                F.lit(PHONE_RE), F.lit(0),
            )
        ).cast("int").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ).alias("redacted"),
    )
