"""Crash-atomic artifact versioning: the Iceberg-snapshot-pointer analog.

VERDICT r2 next-round #2: the r2 merge/compact/rewrite swaps were
rename(live→backup); rename(tmp→live) — a crash between the renames left NO
live artifact. This module replaces every such swap with a commit-pointer
protocol that has no such window:

    <root>/
      _current          tiny text file naming the live version (atomic
                        os.replace of a fsync'd temp file)
      _v_00000001_ab12cd34/  full artifact tree (immutable once published)
      _v_00000002_9f00aa11/  next version, built in place, invisible to
                             readers until _current flips

Version directories are "_"-prefixed ON PURPOSE: Spark's file listing
skips underscore-prefixed children, so a version being built INSIDE a
still-flat root (a parquet table that predates its first versioned
rewrite) is invisible to readers of the flat layout — a crash mid-build
leaves the flat table fully readable instead of wedging partition
discovery with conflicting structures. Directly-addressed reads of the
version dir itself work normally (only child listing filters apply).

* ``resolve(root)``  — the directory readers should use. Roots without a
  pointer resolve to themselves (legacy flat layout stays readable).
* ``publish(root, version)`` — atomically flip the pointer. A reader sees
  either the old or the new version at every instant; there is no missing-
  artifact window at ANY crash point.
* ``gc(root)``       — remove every child except the pointer and the live
  version: old versions, crashed partial builds, and pre-pointer flat
  leftovers. Run from single-writer maintenance ops only; a multi-reader
  deployment would delay it by a grace period (Iceberg expire_snapshots).

Version names embed a monotonic counter (ordering) plus a content token
(usually a build-fingerprint hash) so an interrupted maintenance job that
re-runs targets the SAME version directory and resumes its partial work
instead of orphaning it.
"""

from __future__ import annotations

import os
import re

from pears_fruit_fly_spark.plans import fsio

CURRENT_FILE = "_current"
# The token suffix is arbitrary caller-chosen text ('purge', 'compact', a
# build-fingerprint hash, ...) — the pattern must accept ALL of them, not
# just lowercase hex: a token the regex rejects made version_name() restart
# the counter at 0 and return the CURRENT live version's own name, so the
# next commit_rewrite overwrote the directory it was reading (review
# finding — live table destroyed on the second 'purge' merge).
_VERSION_RE = re.compile(r"^_v_(\d{8})(?:_.+)?$")


def current_version(root: str) -> str | None:
    """Name of the live version, or None (legacy flat layout / fresh dir)."""
    try:
        name = fsio.read_text(os.path.join(root, CURRENT_FILE)).strip()
    except OSError:
        return None
    return name or None


def resolve(root: str) -> str:
    """Directory readers should use: root/<current> if a pointer exists,
    else root itself (flat layout)."""
    name = current_version(root)
    return os.path.join(root, name) if name else root


def version_name(root: str, token: str = "") -> str:
    """Deterministic next version name: counter = live version's + 1 (NOT
    max over children: a crashed later build must not bump the line), with
    an optional content token so re-running the same job resumes the same
    directory."""
    cur = current_version(root)
    n = 0
    if cur is not None:
        m = _VERSION_RE.match(cur)
        n = int(m.group(1)) + 1 if m else 0
    suffix = f"_{token}" if token else ""
    return f"_v_{n:08d}{suffix}"


def publish(root: str, version: str) -> None:
    """Atomically point root at version (fsync'd temp + os.replace + a
    directory-entry fsync — the POSIX equivalent of an Iceberg
    metadata-pointer swap).

    Durability note: this makes the POINTER flip itself power-loss durable;
    the version tree's data files are written by Spark tasks, whose
    durability is the filesystem/object-store's contract (on S3/HDFS a
    visible object IS durable; on a local fs a kernel crash immediately
    after a job can lose unflushed data regardless of any protocol here).
    Process-crash safety — the property the crash-point tests assert — is
    complete at every step either way. On object-store roots the pointer
    write is a single whole-object PUT — atomic by the store's own
    semantics (readers see the old or the new pointer, never a torn one),
    so the temp+rename dance is local-only (fsio.write_text_atomic)."""
    fsio.makedirs(root)
    fsio.write_text_atomic(os.path.join(root, CURRENT_FILE), version + "\n")
    if not fsio.has_scheme(root):
        try:  # persist the rename's directory entry (POSIX; no-op elsewhere)
            dfd = os.open(root, os.O_RDONLY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
        except OSError:
            pass


def gc(root: str, keep_previous: int = 0) -> None:
    """Remove everything except the pointer and the live version. No-op on
    unversioned roots (never destroys a flat layout without a pointer).

    keep_previous > 0 retains that many most-recent OLDER version dirs —
    the grace window for deployments where readers may still hold paths
    resolved before the pointer flip (the Iceberg expire_snapshots
    pattern); crashed partial builds and flat leftovers are removed either
    way. The single-writer maintenance jobs in this repo use the default."""
    cur = current_version(root)
    if cur is None:
        return
    keep = {CURRENT_FILE, cur}
    if keep_previous > 0:
        m = _VERSION_RE.match(cur)
        cur_n = int(m.group(1)) if m else -1
        older = sorted(
            (int(mm.group(1)), child)
            for child in fsio.listdir(root)
            if (mm := _VERSION_RE.match(child)) and int(mm.group(1)) < cur_n
        )
        keep.update(child for _, child in older[-keep_previous:])
    for child in fsio.listdir(root):
        if child in keep:
            continue
        fsio.remove_any(os.path.join(root, child))


def commit_rewrite(root: str, token: str, build_fn) -> str:
    """Full rewrite cycle: build_fn(target_dir) writes the new version,
    publish flips the pointer, gc reclaims the old one. Returns the new
    live directory. Crash-safe at every point: before publish the old
    version serves; re-running targets the same directory (token).

    Contract: build_fn must tolerate a partially-written target from a
    crashed earlier attempt — either overwrite it (Spark writers:
    mode("overwrite"), as every builder in this repo does) or resume it
    (the manifest-checkpointed index build)."""
    version = version_name(root, token)
    if version == current_version(root):
        # belt-and-braces: never build into the live version in place —
        # mode("overwrite") would truncate the only copy mid-read
        raise RuntimeError(
            f"commit_rewrite would target the LIVE version {version!r} of "
            f"{root} — version counter failed to advance"
        )
    target = os.path.join(root, version)
    build_fn(target)
    publish(root, version)
    gc(root)
    return target
