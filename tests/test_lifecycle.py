"""Incremental lifecycle: append deltas, geometric merge, upsert-by-key.

The acceptance bar from the reference semantics:
* searching N appended deltas (MultiReader) returns the same hits/scores
  as one from-scratch index over the concatenated corpus;
* add_indexes compaction produces shard files BYTE-IDENTICAL to that
  from-scratch build (iw_add_readers + SegmentMerger equivalence);
* the geometric policy (iw_maybe_merge_segments, c/src/index.c:6280-6309)
  bounds the delta count;
* upsert by key (c/src/ind.c:202-258, ruby/lib/ferret/index.rb:34-45):
  re-adding a doc with an existing key leaves ONE live doc.
"""

import hashlib
import os

import pyarrow.parquet as pq
import pytest


def _slices(tmp, n_slices=3, docs_per=200):
    from ferret_ray.sources.corpus import generate_corpus

    paths = []
    full = os.path.join(tmp, "full")
    os.makedirs(full, exist_ok=True)
    for i in range(n_slices):
        p = os.path.join(tmp, f"slice-{i}.parquet")
        generate_corpus(
            p, docs_per, seed=42 + i, rows_per_fragment=100
        )
        paths.append(p)
        # the "full corpus" = the same slices side by side (sorted file
        # order matches append order)
        os.link(p, os.path.join(full, f"slice-{i}.parquet"))
    return paths, full


def _cfg():
    from ferret_ray.schema import source_code_config

    return source_code_config(num_shards=8)


def _shard_hashes(d):
    out = {}
    for n in sorted(os.listdir(os.path.join(d, "shards"))):
        with open(os.path.join(d, "shards", n), "rb") as f:
            out[n] = hashlib.sha256(f.read()).hexdigest()
    return out


@pytest.fixture(scope="module")
def env(ray_session, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("lsm"))
    paths, full = _slices(tmp)
    from ferret_ray.pipelines.build import build_index

    full_dir = os.path.join(tmp, "full_idx")
    build_index(full, full_dir, _cfg())
    return tmp, paths, full_dir


def test_appended_deltas_match_full_index(env):
    from ferret_ray.pipelines.lifecycle import IncrementalIndex
    from ferret_ray.search.query import TermQuery
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher

    tmp, paths, full_dir = env
    inc = IncrementalIndex(os.path.join(tmp, "inc1"), _cfg(),
                           merge_factor=100)  # no auto-merge
    for p in paths:
        inc.append(p)
    assert len(inc.delta_dirs) == 3

    s_inc = inc.searcher()
    s_full = Searcher(IndexReader(full_dir))
    for term in ("int", "tok1", "tok77", "fn_12"):
        a = s_full.search(TermQuery("content", term), 0, 30)
        b = s_inc.search(TermQuery("content", term), 0, 30)
        assert a.total_hits == b.total_hits
        assert [(h.doc, h.score) for h in a.hits] == [
            (h.doc, h.score) for h in b.hits
        ]


def test_compaction_byte_identical_to_fresh_build(env):
    from ferret_ray.pipelines.lifecycle import IncrementalIndex

    tmp, paths, full_dir = env
    inc = IncrementalIndex(os.path.join(tmp, "inc2"), _cfg(),
                           merge_factor=100)
    for p in paths:
        inc.append(p)
    inc.optimize()
    assert len(inc.delta_dirs) == 1
    got = _shard_hashes(inc.delta_dirs[0])
    want = _shard_hashes(full_dir)
    assert got == want, "compacted shards differ from fresh build"
    # docs table equal too (modulo part file naming)
    import pandas as pd

    a = pq.read_table(os.path.join(inc.delta_dirs[0], "docs")).to_pandas()
    b = pq.read_table(os.path.join(full_dir, "docs")).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True),
    )


def test_geometric_merge_policy(ray_session, tmp_path):
    from ferret_ray.pipelines.lifecycle import IncrementalIndex
    from ferret_ray.sources.corpus import generate_corpus

    tmp = str(tmp_path)
    inc = IncrementalIndex(os.path.join(tmp, "inc"), _cfg(),
                           merge_factor=3)
    for i in range(5):
        p = os.path.join(tmp, f"s{i}.parquet")
        generate_corpus(p, 40, seed=100 + i, rows_per_fragment=40)
        inc.append(p)
        # the policy keeps fewer than merge_factor small deltas + tiers
        assert len(inc.delta_dirs) <= 3
    assert inc.num_docs() == 200
    # search still sees everything
    from ferret_ray.search.query import TermQuery

    td = inc.searcher().search(TermQuery("content", "int"), 0, 5)
    assert td.total_hits > 0


def test_upsert_by_key(ray_session, tmp_path):
    import pyarrow as pa

    from ferret_ray.pipelines.lifecycle import IncrementalIndex
    from ferret_ray.schema import FieldConfig, IndexConfig
    from ferret_ray.search.query import TermQuery

    cfg = IndexConfig(
        fields={
            "content": FieldConfig(analyzer="standard"),
            "path": FieldConfig(analyzer="keyword", positions=False),
        },
        num_shards=2,
    )
    tmp = str(tmp_path)

    def write(path, rows):
        pq.write_table(
            pa.table(
                {
                    "path": [r[0] for r in rows],
                    "content": [r[1] for r in rows],
                }
            ),
            path,
        )

    inc = IncrementalIndex(os.path.join(tmp, "inc"), cfg, merge_factor=100)
    p1 = os.path.join(tmp, "a.parquet")
    write(p1, [("src/a.c", "alpha beta"), ("src/b.c", "gamma delta")])
    inc.upsert(p1, "path")

    # re-add src/a.c with new content -> exactly one live doc for the key
    p2 = os.path.join(tmp, "b.parquet")
    write(p2, [("src/a.c", "alpha NEW epsilon")])
    inc.upsert(p2, "path")

    s = inc.searcher()
    td = s.search(TermQuery("path", "src/a.c"), 0, 10)
    assert td.total_hits == 1
    doc = s.reader.get_doc(td.hits[0].doc)
    assert "NEW" in doc["content"] or "epsilon" in doc["content"]
    # the old content no longer matches
    assert s.search(TermQuery("content", "beta"), 0, 10).total_hits == 0
    assert s.search(TermQuery("content", "epsilon"), 0, 10).total_hits == 1
    # gamma doc untouched
    assert s.search(TermQuery("content", "gamma"), 0, 10).total_hits == 1

    # compaction keeps the tombstones honored
    inc.optimize()
    s = inc.searcher()
    assert s.search(TermQuery("path", "src/a.c"), 0, 10).total_hits == 1
    assert s.search(TermQuery("content", "beta"), 0, 10).total_hits == 0


def test_auto_merge_buckets_and_cross_bucket_add(env):
    """merge_buckets=None sizes itself from the input (auto); indexes
    built with DIFFERENT bucket counts still combine via add_indexes —
    the bucket count is merge-task granularity only (shard files are one
    per term hash), so it is deliberately not a compat key."""
    from dataclasses import replace

    from ferret_ray.pipelines.build import build_index
    from ferret_ray.pipelines.lifecycle import add_indexes
    from ferret_ray.schema import auto_merge_buckets

    assert auto_merge_buckets(200) == 32
    assert auto_merge_buckets(200_000) == 32
    assert auto_merge_buckets(2_000_000) == 200
    assert auto_merge_buckets(10**9) == 4096

    tmp, paths, full_dir = env
    # default config (merge_buckets=None) resolves to an int before the
    # manifest is written
    m_full = __import__(
        "ferret_ray.state.manifest", fromlist=["read_manifest"]
    ).read_manifest(full_dir)
    assert m_full["config"]["merge_buckets"] == 32

    a_dir = os.path.join(tmp, "xb_a")
    b_dir = os.path.join(tmp, "xb_b")
    build_index(paths[0], a_dir, replace(_cfg(), merge_buckets=2))
    build_index(paths[1], b_dir, replace(_cfg(), merge_buckets=8))
    dest = os.path.join(tmp, "xb_dest")
    add_indexes(dest, [a_dir, b_dir])

    fresh = os.path.join(tmp, "xb_fresh")
    build_index([paths[0], paths[1]], fresh, _cfg())
    assert _shard_hashes(dest) == _shard_hashes(fresh)


def test_search_batch_over_lsm_root(env):
    """The actor-pool serving path accepts an IncrementalIndex root
    directly (gens.json -> MultiReader): results identical to serving
    the equivalent one-shot index."""
    from ferret_ray.pipelines.lifecycle import IncrementalIndex
    from ferret_ray.pipelines.search_pipeline import search_batch

    tmp, paths, full_dir = env
    root = os.path.join(tmp, "inc_serve")
    inc = IncrementalIndex(root, _cfg(), merge_factor=100)  # no merging
    for p in paths:
        inc.append(p)
    assert len(inc.delta_dirs) == 3  # still unmerged deltas

    queries = ["int", "return", "+int +return", '"int the"', "tok1*"]
    a = (
        search_batch(root, queries, k=10, concurrency=2)
        .to_pandas()
        .sort_values(["query", "rank"])
        .reset_index(drop=True)
    )
    b = (
        search_batch(full_dir, queries, k=10, concurrency=2)
        .to_pandas()
        .sort_values(["query", "rank"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_deferred_gc_keeps_serving_old_generation(env):
    """defer_gc=True: a reader opened before compaction keeps answering
    identically after the merge commits (old delta dirs stay on disk,
    listed as trash); gc() then removes them."""
    from ferret_ray.pipelines.lifecycle import IncrementalIndex
    from ferret_ray.search.query import TermQuery
    from ferret_ray.search.searcher import Searcher

    tmp, paths, full_dir = env
    root = os.path.join(tmp, "inc_gc")
    inc = IncrementalIndex(root, _cfg(), merge_factor=2, defer_gc=True)
    inc.append(paths[0], merge=False)
    inc.append(paths[1], merge=False)
    old_reader = inc.reader()
    old_searcher = Searcher(old_reader)
    before = [
        (h.doc, round(h.score, 6))
        for h in old_searcher.search(TermQuery("content", "int"), 0,
                                     10).hits
    ]
    old_dirs = list(inc.delta_dirs)

    inc.maybe_merge()  # compacts both deltas; trash, not delete
    assert len(inc.delta_dirs) == 1
    assert inc._state["trash"]
    for d in old_dirs:
        assert os.path.exists(d)  # still servable
    after = [
        (h.doc, round(h.score, 6))
        for h in old_searcher.search(TermQuery("content", "int"), 0,
                                     10).hits
    ]
    assert before == after
    # the new generation answers identically too
    new_hits = [
        (h.doc, round(h.score, 6))
        for h in Searcher(inc.reader()).search(
            TermQuery("content", "int"), 0, 10).hits
    ]
    assert new_hits == before

    assert inc.gc() == 2
    assert not any(os.path.exists(d) for d in old_dirs)
    assert inc._state["trash"] == []
    # reopening the root sees only the live generation
    inc2 = IncrementalIndex(root, _cfg(), merge_factor=2)
    assert len(inc2.delta_dirs) == 1


def test_deletes_through_lsm_batch_serving(ray_session, tmp_path):
    """Tombstones in different deltas are honored by the actor-pool
    serving path over the LSM root, before and after expunge+optimize."""
    import pyarrow as pa

    from ferret_ray.pipelines.deletes import delete_by_term
    from ferret_ray.pipelines.lifecycle import IncrementalIndex
    from ferret_ray.pipelines.search_pipeline import search_batch
    from ferret_ray.schema import FieldConfig, IndexConfig

    tmp = str(tmp_path)

    def w(name, texts, ids):
        p = os.path.join(tmp, name)
        pq.write_table(pa.table({"content": texts, "id": ids}), p)
        return p

    cfg = IndexConfig(
        fields={
            "content": FieldConfig(analyzer="whitespace"),
            "id": FieldConfig(analyzer="keyword", positions=False),
        },
        num_shards=2,
    )
    root = os.path.join(tmp, "r")
    inc = IncrementalIndex(root, cfg, merge_factor=100)
    inc.append(w("a.parquet", ["ray data", "ray core"], ["d0", "d1"]))
    inc.append(w("b.parquet", ["ray serve", "other"], ["d2", "d3"]))
    for d in inc.delta_dirs:
        delete_by_term(d, "id", "d1")
        delete_by_term(d, "id", "d2")
    df = search_batch(root, ["ray"], k=10, concurrency=2).to_pandas()
    assert sorted(df.doc_id.tolist()) == [0]
    inc.expunge_deletes()
    inc.optimize()
    df2 = search_batch(root, ["ray"], k=10, concurrency=2).to_pandas()
    assert inc.num_docs() == 2 and len(df2) == 1


def test_empty_delta_in_lsm(ray_session, tmp_path):
    """An empty append (zero-row input shard) must not break MultiReader
    serving or compaction."""
    import pyarrow as pa

    from ferret_ray.pipelines.lifecycle import IncrementalIndex
    from ferret_ray.schema import FieldConfig, IndexConfig
    from ferret_ray.search.query import TermQuery
    from ferret_ray.search.searcher import Searcher

    tmp = str(tmp_path)
    cfg = IndexConfig(
        fields={"content": FieldConfig(analyzer="standard")},
        num_shards=2,
    )

    def w(name, texts):
        p = os.path.join(tmp, name)
        pq.write_table(
            pa.table({"content": pa.array(texts, type=pa.string())}), p
        )
        return p

    inc = IncrementalIndex(os.path.join(tmp, "r"), cfg,
                           merge_factor=100)
    inc.append(w("a.parquet", ["hello world"]))
    inc.append(w("e.parquet", []))
    inc.append(w("b.parquet", ["hello ray"]))
    s = Searcher(inc.reader())
    td = s.search(TermQuery("content", "hello"), 0, 10)
    assert [h.doc for h in td.hits] == [0, 1] and td.total_hits == 2
    inc.optimize()
    s2 = Searcher(inc.reader())
    assert s2.search(TermQuery("content", "hello"), 0, 10).total_hits == 2
    assert inc.num_docs() == 2


def test_zero_delta_root_serves_empty(ray_session, tmp_path):
    """A gens.json with zero deltas (reachable: dynamic upsert key
    declaration commits before the first delta is built) must open as
    an empty index — no hits, no crash (ADVICE r3)."""
    from ferret_ray.pipelines.lifecycle import IncrementalIndex
    from ferret_ray.pipelines.search_pipeline import open_reader
    from ferret_ray.schema import FieldConfig, IndexConfig
    from ferret_ray.search.query import TermQuery
    from ferret_ray.search.searcher import Searcher

    root = os.path.join(str(tmp_path), "r")
    cfg = IndexConfig(
        fields={"content": FieldConfig(analyzer="standard")},
        num_shards=2,
    )
    inc = IncrementalIndex(root, cfg, merge_factor=100)
    inc._commit()  # zero-delta gens.json on disk
    r = open_reader(root)
    assert r.max_doc() == 0
    s = Searcher(r)
    td = s.search(TermQuery("content", "hello"), 0, 10)
    assert td.total_hits == 0 and td.hits == []
    r2 = inc.reader()
    assert r2.max_doc() == 0


def test_upsert_guard_rejects_tokenized_key(ray_session, tmp_path):
    """A delta whose key field was indexed with a tokenizing analyzer
    must fail the upsert guard loudly: delete_by_terms looks up the raw
    key as one exact term and would silently match nothing (ADVICE r3)."""
    import pyarrow as pa

    from ferret_ray.pipelines.lifecycle import IncrementalIndex
    from ferret_ray.schema import FieldConfig, IndexConfig

    tmp = str(tmp_path)

    def w(name, ids, texts):
        p = os.path.join(tmp, name)
        pq.write_table(
            pa.table({
                "id": pa.array(ids, type=pa.string()),
                "content": pa.array(texts, type=pa.string()),
            }), p
        )
        return p

    root = os.path.join(tmp, "r")
    # first build: key field tokenized (standard) — legal for append
    cfg_bad = IndexConfig(
        fields={
            "id": FieldConfig(analyzer="standard"),
            "content": FieldConfig(analyzer="standard"),
        },
        num_shards=2,
    )
    inc = IncrementalIndex(root, cfg_bad, merge_factor=100)
    inc.append(w("a.parquet", ["Doc-1"], ["hello world"]))
    # reopen with a keyword config for the same field; the on-disk delta
    # still says analyzer=standard, so upsert must refuse
    cfg_good = IndexConfig(
        fields={
            "id": FieldConfig(analyzer="keyword", positions=False),
            "content": FieldConfig(analyzer="standard"),
        },
        num_shards=2,
    )
    inc2 = IncrementalIndex(root, cfg_good, merge_factor=100)
    with pytest.raises(ValueError, match="keyword"):
        inc2.upsert(w("b.parquet", ["Doc-1"], ["new text"]), "id")
