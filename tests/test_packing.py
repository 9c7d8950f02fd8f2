"""Sequence packing (operators/packing.py) vs a sequential Python oracle."""

from __future__ import annotations

import numpy as np

from pears_fruit_fly_spark.operators.packing import pack_sequences, packing_stats


def _oracle(rows, budget, range_width):
    """Literal next-fit walk (the DuckDB recursive-CTE rule)."""
    out = {}
    by_range: dict[int, list] = {}
    for i, n in sorted(rows):
        by_range.setdefault(i // range_width, []).append((i, n))
    for rid, docs in by_range.items():
        b, fill = 0, 0
        first = True
        for i, n in docs:
            if not first and fill + n > budget:
                b, fill = b + 1, 0
            out[i] = (rid, b)
            fill += n
            first = False
    return out


def test_pack_matches_sequential_oracle(spark):
    rng = np.random.default_rng(3)
    rows = [(int(i), int(rng.integers(1, 40))) for i in range(1000)]
    rows += [(2000, 500), (2001, 7), (2002, 9999)]  # oversized docs
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {r["doc_id"]: (r["range_id"], r["bin_in_range"])
           for r in pack_sequences(df, budget=100, range_width=256).collect()}
    assert got == _oracle(rows, 100, 256)


def test_pack_bins_respect_budget_and_appends(spark):
    rows = [(int(i), 30) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = pack_sequences(df, budget=100, range_width=128)
    fills = packed.groupBy("range_id", "bin_in_range").sum("n_tokens").collect()
    assert all(r["sum(n_tokens)"] <= 100 for r in fills)  # no oversize here
    # append stability: adding docs with HIGHER ids never reassigns old
    # ones — including ids 300-383, which EXTEND the partially-filled
    # range 2 (next-fit's prefix-only decisions are exactly what makes
    # this hold; a suffix-dependent packer would fail here)
    rows2 = rows + [(int(300 + i), 30) for i in range(84)]
    rows2 += [(int(500 + i), 30) for i in range(100)]
    df2 = spark.createDataFrame(rows2, "doc_id long, n_tokens long")
    got1 = {r["doc_id"]: (r["range_id"], r["bin_in_range"])
            for r in packed.collect()}
    got2 = {r["doc_id"]: (r["range_id"], r["bin_in_range"])
            for r in pack_sequences(df2, budget=100, range_width=128).collect()}
    assert {k: got2[k] for k in got1} == got1


def test_pack_rejects_negative_lengths(spark):
    import pytest

    df = spark.createDataFrame([(0, 10), (1, -1)], "doc_id long, n_tokens long")
    with pytest.raises(Exception, match="negative"):
        pack_sequences(df, budget=100).collect()


def test_pack_negative_ids_floor_range(spark):
    """range_id floors like Python // (and the DuckDB oracle), also for
    negative ids: -1 // 128 == -1, not 0."""
    df = spark.createDataFrame(
        [(-1, 5), (-129, 5), (0, 5)], "doc_id long, n_tokens long"
    )
    got = {r["doc_id"]: r["range_id"]
           for r in pack_sequences(df, budget=100, range_width=128).collect()}
    assert got == {-1: -1, -129: -2, 0: 0}


def test_packing_stats(spark):
    df = spark.createDataFrame(
        [(0, 60), (1, 60), (2, 200)], "doc_id long, n_tokens long"
    )
    s = packing_stats(pack_sequences(df, budget=100, range_width=10), 100)
    row = s.collect()[0]
    # bins: [60], [60], [200-oversized]
    assert row["n_bins"] == 3
    assert row["n_docs"] == 3
    assert row["total_tokens"] == 320
    assert row["oversized_bins"] == 1
