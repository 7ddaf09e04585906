"""Resume & determinism: the checkpoint/lineage criterion (BASELINE.md).

1. Build an index; record every output file's bytes.
2. Delete a subset of outputs + the manifest (simulating a mid-build kill);
   rebuild; all files must come back byte-identical.
3. A second full rebuild into a fresh directory is byte-identical too
   (docids are pure functions of (fragment, row)).
"""

import hashlib
import os
import shutil

import pytest


def _tree_hashes(d: str) -> dict[str, str]:
    out = {}
    for root, _, names in os.walk(d):
        for n in names:
            p = os.path.join(root, n)
            rel = os.path.relpath(p, d)
            out[rel] = hashlib.sha256(open(p, "rb").read()).hexdigest()
    return out


@pytest.fixture(scope="module")
def corpus_path(tmp_path_factory):
    from ferret_ray.sources.corpus import generate_corpus

    p = tmp_path_factory.mktemp("corpus") / "code.parquet"
    generate_corpus(str(p), 600, rows_per_fragment=200)
    return str(p)


def _build(corpus_path, index_dir):
    from ferret_ray.pipelines.build import build_index
    from ferret_ray.schema import source_code_config

    cfg = source_code_config(num_shards=4)
    # keep segments: this file pins the keep-intermediates semantics
    # (any lost output regenerates with everything else SKIPPED).  With
    # the default streaming GC a lost shard output instead self-heals
    # via full re-invert — that path is pinned in test_gc_segments.py.
    cfg.gc_segments_during_merge = False
    return build_index(corpus_path, index_dir, cfg)


def test_resume_and_determinism(ray_session, corpus_path, tmp_path):
    idx1 = str(tmp_path / "idx1")
    m1 = _build(corpus_path, idx1)
    assert m1["num_docs"] == 600
    h1 = _tree_hashes(idx1)
    assert any(k.startswith("shards/") for k in h1)
    assert any(k.startswith("docs/") for k in h1)

    # simulate kill: drop manifest + one docs part + one shard file
    os.unlink(os.path.join(idx1, "manifest.json"))
    victims = [
        k for k in h1
        if k.startswith(("docs/part-000001", "shards/"))
    ][:2]
    for v in victims:
        os.unlink(os.path.join(idx1, v))

    m1b = _build(corpus_path, idx1)
    h1b = _tree_hashes(idx1)
    assert set(h1b) == set(h1)
    # manifest.json carries wall-clock metrics; everything else (shards,
    # docs parts, checkpoints) must be byte-identical
    diffs = [
        k for k in h1 if h1[k] != h1b[k] and k != "manifest.json"
    ]
    assert diffs == [], f"files changed after resume: {diffs}"
    assert m1b["num_docs"] == m1["num_docs"]
    assert m1b["fingerprint"] == m1["fingerprint"]
    assert m1b["len_sums"] == m1["len_sums"]
    # resume skipped the surviving fragments
    assert m1b["metrics"]["fragments_skipped"] >= 1

    # full rebuild in a fresh dir is byte-identical too (docids are pure
    # functions of (fragment, row) — independent of scheduling)
    idx2 = str(tmp_path / "idx2")
    _build(corpus_path, idx2)
    h2 = _tree_hashes(idx2)
    diffs = [
        k for k in h1
        if h1[k] != h2.get(k) and k != "manifest.json"
    ]
    assert diffs == [], f"fresh rebuild differs: {diffs}"


def test_second_build_is_noop(ray_session, corpus_path, tmp_path):
    idx = str(tmp_path / "idx")
    _build(corpus_path, idx)
    m2 = _build(corpus_path, idx)  # manifest fingerprint matches -> no-op
    assert m2["fingerprint"]


def test_gc_build_intermediates(ray_session, corpus_path, tmp_path):
    """Post-commit GC removes segments/ + checkpoints/ (the resume
    intermediates, ~ the index's own size), serving is unaffected, and
    a same-fingerprint rebuild still short-circuits on the manifest."""
    from ferret_ray.pipelines.build import gc_build_intermediates
    from ferret_ray.search.query import TermQuery
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher

    idx = str(tmp_path / "idx")
    # uncommitted dir: refuses
    assert gc_build_intermediates(idx) == 0
    m1 = _build(corpus_path, idx)
    s = Searcher(IndexReader(idx))
    want = [(h.doc, h.score)
            for h in s.search(TermQuery("content", "int"), 0, 10).hits]
    freed = gc_build_intermediates(idx)
    assert freed > 0
    assert not os.path.exists(os.path.join(idx, "segments"))
    assert not os.path.exists(os.path.join(idx, "checkpoints"))
    # idempotent
    assert gc_build_intermediates(idx) == 0
    # serving still works (fresh reader, shards/docs only)
    s2 = Searcher(IndexReader(idx))
    got = [(h.doc, h.score)
           for h in s2.search(TermQuery("content", "int"), 0, 10).hits]
    assert got == want
    # same-fp rebuild short-circuits on the committed manifest
    m2 = _build(corpus_path, idx)
    assert m2["fingerprint"] == m1["fingerprint"]
    assert not os.path.exists(os.path.join(idx, "segments"))
