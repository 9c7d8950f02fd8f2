"""Storage-agnostic index trees (r5, VERDICT r4 missing-#1 / ADVICE r4).

Two surfaces:

* ``PostingsConfig.staging_filesystem`` — an injected picklable
  ``pyarrow.fs.PyFileSystem`` must carry the encode stage's worker-side
  bucket reads (the credential-injection hook for clusters whose
  object-store credentials live in Hadoop/Spark conf that pyarrow's
  URI resolution cannot see). Proven by REDIRECTION: staging is moved
  after the tokenize stage, and only a path-rewriting handler can find
  it — byte-identity against an uninterrupted plain build shows every
  bucket was read through the handler.
* ``scheme://`` index roots — all driver-side metadata I/O (commit
  pointers, manifest, build info, tombstone sidecars) resolves through
  plans/fsio; a ``file://`` root exercises the pyarrow.fs branch
  end-to-end (build → query → delete → count) where the r4 code
  open()'d the raw URI string and failed.
"""

from __future__ import annotations

import dataclasses

import pytest
from pyarrow import fs as pafs

from pears_fruit_fly_spark.config import PostingsConfig
from pears_fruit_fly_spark.operators.bm25 import bm25_topk_wand
from pears_fruit_fly_spark.operators.postings import (
    build_postings,
    delete_docs,
    read_postings,
    tombstone_count,
)
from pears_fruit_fly_spark.plans import fsio
from pears_fruit_fly_spark.plans import manifest as mf


def _make_redirect_handler():
    """Build the handler CLASS inside a function so cloudpickle serializes
    it by value — a module-level class in tests/ would pickle by reference
    to a module Spark's Python workers cannot import."""

    class RedirectHandler(pafs.FileSystemHandler):
        """Delegates to the local filesystem, rewriting one path prefix —
        the minimal stand-in for a credentialed/aliased production
        filesystem. Picklable (plain attrs), so it survives the trip into
        the mapInPandas encode tasks."""

        def __init__(self, src_prefix: str, dst_prefix: str):
            self.src, self.dst = src_prefix, dst_prefix

        def _m(self, path: str) -> str:
            if path.startswith(self.src):
                return self.dst + path[len(self.src):]
            return path

        def _unm(self, infos):
            # callers (pyarrow dataset discovery) expect listed paths back
            # in THEIR namespace, not the redirected one
            out = []
            for i in infos:
                p = i.path
                if p.startswith(self.dst):
                    p = self.src + p[len(self.dst):]
                out.append(pafs.FileInfo(
                    p, type=i.type,
                    size=(i.size if i.is_file else None),
                    mtime=i.mtime,
                ))
            return out

        def _local(self):
            return pafs.LocalFileSystem()

        def get_type_name(self):
            return "redirect-local"

        def normalize_path(self, path):
            return path

        def get_file_info(self, paths):
            return self._unm(
                self._local().get_file_info([self._m(p) for p in paths])
            )

        def get_file_info_selector(self, selector):
            sel = pafs.FileSelector(
                self._m(selector.base_dir),
                allow_not_found=selector.allow_not_found,
                recursive=selector.recursive,
            )
            return self._unm(self._local().get_file_info(sel))

        def open_input_stream(self, path):
            return self._local().open_input_stream(self._m(path))

        def open_input_file(self, path):
            return self._local().open_input_file(self._m(path))

        def open_output_stream(self, path, metadata):
            return self._local().open_output_stream(self._m(path))

        def open_append_stream(self, path, metadata):
            return self._local().open_append_stream(self._m(path))

        def create_dir(self, path, recursive):
            self._local().create_dir(self._m(path), recursive=recursive)

        def delete_dir(self, path):
            self._local().delete_dir(self._m(path))

        def delete_dir_contents(self, path, missing_dir_ok=False):
            self._local().delete_dir_contents(
                self._m(path), missing_dir_ok=missing_dir_ok
            )

        def delete_root_dir_contents(self):
            raise NotImplementedError

        def delete_file(self, path):
            self._local().delete_file(self._m(path))

        def move(self, src, dest):
            self._local().move(self._m(src), self._m(dest))

        def copy_file(self, src, dest):
            self._local().copy_file(self._m(src), self._m(dest))

    return RedirectHandler


def _dump(spark, d):
    rows = read_postings(spark, d).collect()
    return sorted(
        (r["term_id"], r["salt"], r["block_id"], r["n"], r["first_doc"],
         r["last_doc"], bytes(r["doc_gaps"]), bytes(r["tfs"]),
         bytes(r["dls"]), r["max_tf"], round(r["max_impact"], 12))
        for r in rows
    )


@pytest.fixture()
def pages_ids(spark, pages_df):
    from pears_fruit_fly_spark.operators.docids import assign_doc_ids
    from pears_fruit_fly_spark.sources.wet import dedup_latest

    clean = dedup_latest(pages_df)
    return clean.join(assign_doc_ids(clean, "url"), "url")


def test_injected_filesystem_carries_staging_reads(
    spark, pages_ids, vocab, tmp_path
):
    cfg = PostingsConfig(num_partitions=8, bucket_batch_size=1)
    ref_dir = str(tmp_path / "ref_idx")
    build_postings(spark, pages_ids, vocab, ref_dir, cfg=cfg)

    # interrupt a second build right after stage 0-2 (staging + stats
    # written, zero buckets encoded)
    d2 = str(tmp_path / "fs_idx")

    class Boom(Exception):
        pass

    import pears_fruit_fly_spark.operators.postings as P

    orig = mf.append_manifest_rows

    def exploding(spark_, dir_, rows):
        raise Boom()

    mf.append_manifest_rows = exploding
    P.mf.append_manifest_rows = exploding
    try:
        with pytest.raises(Boom):
            build_postings(spark, pages_ids, vocab, d2, cfg=cfg)
    finally:
        mf.append_manifest_rows = orig
        P.mf.append_manifest_rows = orig

    # move the staged tokens where only the redirecting handler can find
    # them: a resume that reads staging any way OTHER than the injected
    # filesystem sees an empty dir and yields an empty (different) index
    import shutil

    from pears_fruit_fly_spark.plans import commitlog as cl

    live = cl.resolve(d2)
    real_staging = live + "/_staging_tokens"
    moved = str(tmp_path / "moved_staging")
    shutil.move(real_staging, moved)

    handler = _make_redirect_handler()(real_staging, moved)
    cfg_fs = dataclasses.replace(
        cfg, staging_filesystem=pafs.PyFileSystem(handler)
    )
    build_postings(spark, pages_ids, vocab, d2, cfg=cfg_fs)  # resume

    assert _dump(spark, d2) == _dump(spark, ref_dir)


def test_file_scheme_index_root_end_to_end(spark, pages_ids, vocab, tmp_path):
    """file:// exercises the pyarrow.fs branch of every driver-side
    metadata touch with local semantics: build → WAND query → delete →
    sidecar count, all against a scheme'd root."""
    plain = str(tmp_path / "plain_idx")
    build_postings(spark, pages_ids, vocab, plain,
                   cfg=PostingsConfig(num_partitions=8))
    uri = "file://" + str(tmp_path / "uri_idx")
    build_postings(spark, pages_ids, vocab, uri,
                   cfg=PostingsConfig(num_partitions=8))

    want = [(r["doc_id"], round(r["score"], 10))
            for r in bm25_topk_wand(spark, plain, "t1 t2", vocab, k=5)
            .collect()]
    got = [(r["doc_id"], round(r["score"], 10))
           for r in bm25_topk_wand(spark, uri, "t1 t2", vocab, k=5)
           .collect()]
    assert got == want and len(got) == 5

    # manifest was really written/readable through the scheme'd path
    assert len(mf.completed_partitions(spark, uri)) > 0

    victims = [d for d, _ in want[:2]]
    n = delete_docs(spark, uri, victims)
    assert n == 2
    assert tombstone_count(spark, uri) == 2
    got2 = [r["doc_id"]
            for r in bm25_topk_wand(spark, uri, "t1 t2", vocab, k=5)
            .collect()]
    assert not set(victims) & set(got2)

    # fsio helpers see the same tree through both spellings
    assert fsio.exists(uri + "/_current")
    assert sorted(fsio.listdir(uri)) == sorted(
        fsio.listdir(str(tmp_path / "uri_idx"))
    )


def test_getmtime_scheme_and_plain(tmp_path):
    """fsio.getmtime keeps os.path.getmtime's contract on both spellings:
    a real float mtime for existing files (bm25's cache-version fallback
    feeds on it) and FileNotFoundError for missing ones."""
    p = tmp_path / "x.json"
    p.write_text("{}")
    import os as _os

    plain = fsio.getmtime(str(p))
    via_uri = fsio.getmtime("file://" + str(p))
    assert plain == pytest.approx(_os.path.getmtime(str(p)), abs=2.0)
    assert via_uri == pytest.approx(plain, abs=2.0)
    with pytest.raises(FileNotFoundError):
        fsio.getmtime(str(tmp_path / "missing.json"))
    with pytest.raises(FileNotFoundError):
        fsio.getmtime("file://" + str(tmp_path / "missing.json"))
