"""Deterministic synthetic web-page corpus (FIXTURES.md §1-4).

Generates the exact input-table shape mandated by BASELINE.json input_hint:
(url string, warc_ts timestamp, html binary, text string, lang string),
where html = UTF-8 bytes of ``title + "\\n" + text`` so the extraction UDF
must reproduce ``text`` byte-identically (title = first line, rest joined
with "\\n" — ref: common_crawl_processor/cc_process_wet.py:51-52).

Everything is seeded; the NumPy BM25 oracle, the Spark engine, and the DuckDB
oracle all see identical inputs. No external data.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

SEED = 42
BASE_TS = dt.datetime(2020, 11, 1, tzinfo=dt.timezone.utc)


def fixture_vocab_terms(v: int = 2000) -> list[str]:
    """Fixture vocabulary: t0..t{v-21} plus 20 multi-byte UTF-8 pieces."""
    multibyte = [
        "über", "straße", "café", "naïve", "søster", "日本語", "漢字", "汉字",
        "中文", "русский", "ελληνικά", "עברית", "العربية", "हिन्दी", "ไทย",
        "한국어", "😀emoji", "→arrow", "µmicro", "Ωomega",
    ]
    return [f"t{i}" for i in range(v - len(multibyte))] + multibyte


def zipf_probs(v: int, a: float = 1.3) -> np.ndarray:
    ranks = np.arange(1, v + 1, dtype=np.float64)
    p = ranks ** (-a)
    return p / p.sum()


def make_vocab_file_lines(v: int = 2000) -> list[str]:
    """SPM-format lines `piece\\tlogprob`, with one duplicate and one empty
    piece injected (reader-skip tests, ref: fruit_fly/hash.py:47-48)."""
    terms = fixture_vocab_terms(v)
    probs = zipf_probs(v)
    lines = [f"{t}\t{np.log(p):.6f}" for t, p in zip(terms, probs)]
    # injected bad rows: duplicate of first piece, and an empty piece
    lines.insert(5, f"{terms[0]}\t-1.0")
    lines.insert(9, "\t-2.0")
    return lines


def make_web_pages(n: int = 1000, v: int = 2000, seed: int = SEED) -> pd.DataFrame:
    """Synthetic corpus per FIXTURES.md §1.

    - text: Zipf(a=1.3) token draws, 50-3000 tokens/doc, newline every ~15
      tokens; ~5% of docs shorter than 1000 chars; lang en 95% / de+unk 5%.
    - ~1% of urls re-emitted with a later warc_ts (dedup-latest tests).
    - edge-case docs at fixed ids 0..6.
    """
    rng = np.random.default_rng(seed)
    terms = np.array(fixture_vocab_terms(v), dtype=object)
    probs = zipf_probs(v)

    urls, tss, texts, langs = [], [], [], []
    for i in range(n):
        n_tok = int(rng.integers(50, 3001))
        if rng.random() < 0.05:
            n_tok = int(rng.integers(5, 60))  # short-doc stratum (<1000 chars)
        ids = rng.choice(v, size=n_tok, p=probs)
        toks = terms[ids]
        parts = []
        for j in range(0, n_tok, 15):
            parts.append(" ".join(toks[j : j + 15]))
        text = "\n".join(parts)
        lang = "en" if rng.random() < 0.95 else ("de" if rng.random() < 0.5 else "unk")
        urls.append(f"https://site{i % 997}.example/{i}")
        tss.append(BASE_TS + dt.timedelta(seconds=i))
        texts.append(text)
        langs.append(lang)

    # edge cases at fixed ids (FIXTURES.md §1)
    edge = {
        0: "",  # empty text after title
        1: ("t0 " * 250)[:1000],  # exactly 1000 chars
        2: " ".join(["t7"] * 400),  # one repeated term
        3: " ".join(fixture_vocab_terms(v)),  # every vocab term once
        4: "über straße café 日本語 漢字 😀emoji t1 t2",  # non-ASCII
        5: "t1 t2\r\nt3 t4\r\nt5",  # CRLF line endings
        6: "  t1 t2  ",  # leading/trailing whitespace
    }
    for i, t in edge.items():
        if i < n:
            texts[i] = t
            langs[i] = "en"

    # ~1% re-crawls: duplicate url with later ts and (possibly) same text
    n_dup = max(1, n // 100)
    dup_src = rng.choice(n, size=n_dup, replace=False)
    for j, i in enumerate(dup_src):
        urls.append(urls[i])
        tss.append(BASE_TS + dt.timedelta(days=30, seconds=int(i)))
        texts.append(texts[i] + ("\nrecrawl" if j % 2 == 0 else ""))
        langs.append(langs[i])

    titles = [f"Title of page {u}" for u in urls]
    html = [(t + "\n" + x).encode("utf-8") for t, x in zip(titles, texts)]
    # one corrupt (non-UTF-8) payload for decode-failure semantics
    if n > 8:
        html[8] = b"\xff\xfe broken " + html[8]

    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": tss,
            "html": html,
            "text": texts,
            "lang": langs,
        }
    )


def make_queries(seed: int = SEED, v: int = 2000) -> pd.DataFrame:
    """Frozen query set (FIXTURES.md §4): 100 queries over head/mid/tail terms,
    a few with OOV terms and duplicate terms; k in {1, 10, 100}."""
    rng = np.random.default_rng(seed + 1)
    terms = fixture_vocab_terms(v)
    rows = []
    for qid in range(100):
        n_terms = int(rng.integers(1, 7))
        head_hi = max(2, v // 40)
        mid_hi = max(head_hi + 1, v // 4)
        if qid < 40:
            pool = range(0, head_hi)
        elif qid < 80:
            pool = range(head_hi, mid_hi)
        else:
            pool = range(mid_hi, v)
        picks = [terms[int(rng.choice(list(pool)))] for _ in range(n_terms)]
        if 90 <= qid < 95:
            picks.append("zz_oov_term")
        if 95 <= qid:
            picks.append(picks[0])  # duplicate term in query (tf>1)
        k = 10
        if qid % 25 == 0:
            k = 1
        elif qid % 25 == 1:
            k = 100
        rows.append((qid, " ".join(picks), k))
    return pd.DataFrame(rows, columns=["query_id", "query_text", "k"])
