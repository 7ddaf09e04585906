"""Streaming segment GC (IndexConfig.gc_segments_during_merge).

Peak disk for a build is O(segments + shards) because the merge's
inputs and outputs coexist; with streaming GC each merge task releases
its own shard's bucket dirs the moment its checkpoint + outputs are
durable (the reference's deleter removes a merged segment's files the
same way once segments_N commits, c/src/index.c:3683-3860 — ours just
does it per-shard mid-build).  These tests pin:

1. byte-identity: GC on vs off produce identical shards/docs bytes;
2. the disk claim: no segment bucket dirs survive the merge, segGC
   markers do;
3. mid-merge-kill resume stays cheap: invert fragments still verify
   (via the markers) and are SKIPPED;
4. self-heal: losing shard outputs after GC (with or without their
   checkpoints) re-inverts and rebuilds byte-identically.
"""

import hashlib
import json
import os

import pytest


def _tree_hashes(d: str, prefixes=("shards/", "docs/")) -> dict[str, str]:
    out = {}
    for root, _, names in os.walk(d):
        for n in names:
            p = os.path.join(root, n)
            rel = os.path.relpath(p, d)
            if rel.startswith(prefixes):
                out[rel] = hashlib.sha256(
                    open(p, "rb").read()
                ).hexdigest()
    return out


@pytest.fixture(scope="module")
def corpus_path(tmp_path_factory):
    from ferret_ray.sources.corpus import generate_corpus

    p = tmp_path_factory.mktemp("corpus") / "code.parquet"
    generate_corpus(str(p), 600, rows_per_fragment=200)
    return str(p)


def _build(corpus_path, index_dir, gc: bool):
    from ferret_ray.pipelines.build import build_index
    from ferret_ray.schema import source_code_config

    cfg = source_code_config(num_shards=4)
    cfg.gc_segments_during_merge = gc
    return build_index(corpus_path, index_dir, cfg)


def _segment_files(idx: str) -> list[str]:
    seg = os.path.join(idx, "segments")
    out = []
    for root, _, names in os.walk(seg):
        out += [os.path.join(root, n) for n in names]
    return out


def test_gc_byte_identity_and_markers(ray_session, corpus_path, tmp_path):
    idx_gc = str(tmp_path / "gc")
    idx_keep = str(tmp_path / "keep")
    m1 = _build(corpus_path, idx_gc, gc=True)
    m2 = _build(corpus_path, idx_keep, gc=False)
    # same fingerprint: the flag is execution-only, not part of the
    # build identity (like invert_num_cpus)
    assert m1["fingerprint"] == m2["fingerprint"]
    assert _tree_hashes(idx_gc) == _tree_hashes(idx_keep)
    # GC'd build: no segment data files remain, markers exist
    assert _segment_files(idx_gc) == []
    assert len(_segment_files(idx_keep)) > 0
    markers = [
        n for n in os.listdir(os.path.join(idx_gc, "checkpoints"))
        if n.startswith("segGC-")
    ]
    assert markers, "merge wrote no segGC markers"
    rec = json.load(
        open(os.path.join(idx_gc, "checkpoints", markers[0]))
    )
    assert rec["fingerprint"] == m1["fingerprint"]


def test_resume_skips_inverts_after_gc(ray_session, corpus_path, tmp_path):
    """Mid-merge kill: manifest missing, shard checkpoints present,
    segments GC'd.  Resume must SKIP every invert fragment (markers
    cover the released outputs) and re-commit byte-identically."""
    idx = str(tmp_path / "idx")
    m1 = _build(corpus_path, idx, gc=True)
    h1 = _tree_hashes(idx)
    os.unlink(os.path.join(idx, "manifest.json"))

    m2 = _build(corpus_path, idx, gc=True)
    assert m2["metrics"]["fragments_skipped"] >= 1, \
        "invert re-ran: segGC markers did not cover the GC'd outputs"
    assert m2["metrics"]["segments_merged"] == 0, \
        "merge re-ran despite intact shard checkpoints"
    assert m2["metrics"]["docs_tokenized"] == m1["metrics"]["docs_tokenized"]
    assert _tree_hashes(idx) == h1


def test_repair_lost_shard_output(ray_session, corpus_path, tmp_path):
    """Shard outputs lost AFTER their segments were GC'd: the driver's
    repair pass drops the markers + broken checkpoints, re-inverts, and
    the rebuilt tree is byte-identical."""
    idx = str(tmp_path / "idx")
    _build(corpus_path, idx, gc=True)
    h1 = _tree_hashes(idx)
    os.unlink(os.path.join(idx, "manifest.json"))
    victims = sorted(
        n for n in os.listdir(os.path.join(idx, "shards"))
        if n.startswith("shard-00000002")
    )
    assert victims
    for v in victims:
        os.unlink(os.path.join(idx, "shards", v))

    m2 = _build(corpus_path, idx, gc=True)
    # repair forced a re-invert: nothing could be skipped
    assert m2["metrics"]["fragments_skipped"] == 0
    assert _tree_hashes(idx) == h1


def test_repair_orphaned_markers(ray_session, corpus_path, tmp_path):
    """Markers present but a shard checkpoint AND its outputs are gone
    (partial storage loss): repair re-inverts instead of silently
    committing a manifest without the shard."""
    idx = str(tmp_path / "idx")
    m1 = _build(corpus_path, idx, gc=True)
    h1 = _tree_hashes(idx)
    os.unlink(os.path.join(idx, "manifest.json"))
    ck = os.path.join(idx, "checkpoints")
    for n in os.listdir(ck):
        if n.startswith("shard-00000001"):
            os.unlink(os.path.join(ck, n))
    for n in os.listdir(os.path.join(idx, "shards")):
        if n.startswith("shard-00000001"):
            os.unlink(os.path.join(idx, "shards", n))

    m2 = _build(corpus_path, idx, gc=True)
    assert sorted(m2["shards"]) == sorted(m1["shards"])
    assert _tree_hashes(idx) == h1
