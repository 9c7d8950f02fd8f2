"""SQL sugar: rewrite ``ORDER BY bm25(index, 'query') DESC LIMIT k`` into
the block-max WAND plan (SURVEY.md §4.2's declared stretch goal).

A true Catalyst extension (``spark.sql.extensions``) needs a compiled JVM
rule; this environment ships no Scala toolchain, so the sugar is a Python
front-end with the same contract: the user writes declarative SQL, the
engine substitutes the physical strategy (two-phase WAND top-k +
broadcast hit join) before Catalyst sees the query. Everything that is
NOT the bm25 pattern passes through to ``spark.sql`` untouched, so the
rewriter can front an entire SQL workload.

Supported shape (one bm25 call, top-level clauses)::

    SELECT <projection> FROM <table_or_view>
    ORDER BY bm25(<index_name>, '<query text>') DESC
    LIMIT <k>

- ``<index_name>`` is registered via :meth:`Bm25Sql.register_index`.
- ``<table_or_view>`` must expose a ``doc_id`` column aligned with the
  index's doc ids; rows absent from the top-k are dropped (top-k join).
- The projection may additionally reference ``bm25(<index>, '<same
  query>') AS <alias>`` to project the score itself.
- ``DESC`` is required: BM25 ascending would return the k WORST matches,
  which the WAND plan cannot serve (it prunes from the top); asking for
  it raises instead of silently scanning.

Reference parity note: the reference has no SQL surface at all (queries
go through fruit_fly/evals.py driver code); this is Spark-native sugar
over the same ranking semantics.
"""

from __future__ import annotations

import re
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from pears_fruit_fly_spark.functions.vocab import Vocab

_ORDER_RE = re.compile(
    r"ORDER\s+BY\s+bm25\(\s*(?P<index>\w+)\s*,\s*'(?P<query>[^']*)'\s*\)"
    r"\s*(?P<dir>ASC|DESC)?\s*"
    r"LIMIT\s+(?P<k>\d+)\s*;?\s*$",
    re.IGNORECASE,
)
_SELECT_RE = re.compile(
    r"^\s*SELECT\s+(?P<proj>.*?)\s+FROM\s+(?P<table>[\w.]+)\s*",
    re.IGNORECASE | re.DOTALL,
)
_PROJ_BM25_RE = re.compile(
    r"bm25\(\s*(?P<index>\w+)\s*,\s*'(?P<query>[^']*)'\s*\)"
    r"(\s+AS\s+(?P<alias>\w+))?",
    re.IGNORECASE,
)


@dataclass
class _Registered:
    index_dir: str
    vocab: Vocab


class Bm25Sql:
    """SQL front-end routing ``ORDER BY bm25(...) LIMIT k`` to WAND.

    >>> sqlf = Bm25Sql(spark)
    >>> sqlf.register_index("web", "/indexes/web", vocab)
    >>> sqlf.sql("SELECT url, bm25(web, 'solar power') AS score "
    ...          "FROM docs ORDER BY bm25(web, 'solar power') DESC "
    ...          "LIMIT 10")
    """

    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._indexes: dict[str, _Registered] = {}

    def register_index(self, name: str, index_dir: str, vocab: Vocab) -> None:
        self._indexes[name] = _Registered(index_dir, vocab)

    def sql(self, query: str) -> DataFrame:
        m = _ORDER_RE.search(query)
        if m is None:
            if re.search(r"bm25\s*\(", query, re.IGNORECASE):
                raise ValueError(
                    "bm25() is only supported as ORDER BY bm25(<index>, "
                    "'<query>') DESC LIMIT <k> (optionally projected AS a "
                    "score column); got: " + query.strip()
                )
            return self._spark.sql(query)
        if (m.group("dir") or "DESC").upper() == "ASC":
            raise ValueError(
                "ORDER BY bm25(...) ASC would return the k WORST matches; "
                "the WAND top-k plan prunes from the top and cannot serve "
                "ascending order"
            )
        sel = _SELECT_RE.match(query)
        if sel is None:
            raise ValueError(
                "bm25 rewrite needs the form SELECT <proj> FROM <table> "
                "ORDER BY bm25(...) DESC LIMIT <k>; got: " + query.strip()
            )
        # fail loud on anything between FROM <table> and ORDER BY: a WHERE /
        # GROUP BY / JOIN clause here would otherwise be silently dropped by
        # the rewrite and return wrong rows with no error
        gap = query[sel.end() : m.start()]
        if gap.strip():
            raise ValueError(
                "bm25 rewrite does not support a clause between FROM and "
                f"ORDER BY (got {gap.strip()!r}); filter the table into a "
                "temp view first, then ORDER BY bm25(...) over the view"
            )
        index_name, qtext, k = m.group("index"), m.group("query"), int(
            m.group("k")
        )
        reg = self._indexes.get(index_name)
        if reg is None:
            raise ValueError(
                f"unknown bm25 index '{index_name}' — register it with "
                f"register_index() first (known: {sorted(self._indexes)})"
            )

        from pears_fruit_fly_spark.operators.bm25 import bm25_topk_wand

        hits = bm25_topk_wand(
            self._spark, reg.index_dir, qtext, reg.vocab, k=k
        )
        tmp = "__bm25_hits_" + uuid.uuid4().hex[:12]
        hits.createOrReplaceTempView(tmp)

        # projection: swap any bm25(...) AS alias for the hit score
        def _swap(pm: re.Match) -> str:
            if pm.group("index") != index_name or pm.group("query") != qtext:
                raise ValueError(
                    "all bm25() calls in one statement must name the same "
                    "(index, query) pair"
                )
            alias = pm.group("alias") or "score"
            return f"{tmp}.score AS {alias}"

        proj = _PROJ_BM25_RE.sub(_swap, sel.group("proj"))
        table = sel.group("table")
        rewritten = (
            f"SELECT {proj} FROM {table} "
            f"JOIN {tmp} USING (doc_id) "
            f"ORDER BY {tmp}.score DESC, doc_id ASC LIMIT {k}"
        )
        try:
            return self._spark.sql(rewritten)
        finally:
            # the temp view fed the (lazy) plan already; dropping it here
            # would break later actions, so it stays for the session —
            # uuid-suffixed names cannot collide
            pass
