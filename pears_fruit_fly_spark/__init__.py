"""pears_fruit_fly_spark — a PySpark-native fulltext index + BM25 engine.

A from-scratch re-expression of the data-processing capabilities of
PeARSearch/PeARS-fruit-fly (reference at /root/reference, cited by file:line in
docstrings) as an idiomatic Spark engine:

* WET-style text extraction with byte-identical semantics
  (ref: common_crawl_processor/cc_process_wet.py:36-54)
* fruit-fly featurization: vocab weighting, doc-side winner-take-all, sparse
  binary random projection, KC-side WTA, binarized signatures
  (ref: fruit_fly/hash.py)
* term-partitioned inverted index with delta+varbyte posting compression and
  per-block block-max metadata (new; mandated by BASELINE.json north_rule)
* BM25 (k1=1.2, b=0.75) top-k with block-max WAND pruning and the fruit-fly
  Hamming-signature prefilter
* training-data pipeline operators: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding-cosine), similarity search, text analysis,
  multimodal column plumbing.

Design point is a 1000-executor cluster over ~10^12 docs; everything is
DataFrame-first so Catalyst handles pushdown/pruning/AQE, with vectorized
pandas/Arrow UDFs for the per-document math (no per-row Python UDFs).
"""

__version__ = "0.1.0"
