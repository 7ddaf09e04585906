"""Lazy shard reader: dictionary-only open, bounded blob fetches.

Round-1's _Shard read the entire shard parquet (every posting blob) and
built a Python dict over all terms; at scale that is GBs + tens of
millions of objects per actor.  The rewrite loads only (field, term, df,
tf_sum) at open and fetches blobs by row-group range reads with a small
LRU.  These tests pin that behavior.
"""

import os

import pytest


@pytest.fixture(scope="module")
def code_index(ray_session, tmp_path_factory):
    from ferret_ray.pipelines.build import build_index
    from ferret_ray.schema import source_code_config
    from ferret_ray.sources.corpus import generate_corpus

    tmp = str(tmp_path_factory.mktemp("lazy"))
    corpus = os.path.join(tmp, "code.parquet")
    generate_corpus(corpus, 3000, rows_per_fragment=500)
    index_dir = os.path.join(tmp, "idx")
    build_index(corpus, index_dir, source_code_config(num_shards=8))
    return index_dir


def test_dictionary_only_open(code_index):
    from ferret_ray.search.reader import IndexReader, _post_rg_cache

    cache = _post_rg_cache()
    r = IndexReader(code_index)
    # doc_freq touches only the dictionary: no blob row-groups fetched
    # (_files populates lazily, so collect fids AFTER the queries)
    assert r.doc_freq("content", "tok1") > 0
    assert r.doc_freq("content", "int") > 0
    fids = {f._fid for f in r._files.values()}
    assert fids, "doc_freq must have opened shard files"
    assert not any(
        k[0] in fids for k in cache.map
    ), "doc_freq must not fetch blobs"

    # postings() fetches blobs through the process-wide byte-budgeted
    # LRU; the accounted bytes never exceed the budget
    p = r.postings("content", "tok1")
    assert p is not None and p.docs.size == r.doc_freq("content", "tok1")
    fids = {f._fid for f in r._files.values()}
    assert any(k[0] in fids for k in cache.map)
    assert cache.bytes <= cache.budget


def test_lazy_matches_full_decode(code_index):
    """Blob-by-blob fetch decodes identically to a full-file read."""
    import numpy as np

    from ferret_ray.search.reader import IndexReader
    from ferret_ray.state.fs import resolve_fs

    r = IndexReader(code_index)
    salt = r.manifest["shards"][0]
    sh = r._shard_for(salt)
    fs, root = resolve_fs(code_index)
    cfg = r.manifest["config"]
    # the logical table of THIS band (v8: one file per hash shard,
    # bands inside) — iter_shard_bands yields per-band tables
    from ferret_ray.stages.merge import iter_shard_bands

    full = dict(
        iter_shard_bands(
            fs, root, salt % r.num_shards, r.num_shards,
            int(cfg["salt_doc_range"]),
        )
    )[salt]
    n = full.num_rows
    for i in [0, 1, n // 2, n - 1]:
        deltas, freqs = sh.postings_row(i)
        assert deltas.tolist() == full.column("docs_list")[i].as_py()
        assert freqs.tolist() == full.column("freqs_list")[i].as_py()
        assert sh.term_at(i) == full.column("term")[i].as_py()
    # decoded postings agree end-to-end for a mid-dictionary term
    i = n // 2
    deltas, f1 = sh.postings_row(i)
    d1 = np.cumsum(deltas, dtype=np.int64)
    d2 = np.cumsum(
        np.asarray(full.column("docs_list")[i].as_py(), dtype=np.int64)
    )
    f2 = np.asarray(full.column("freqs_list")[i].as_py())
    assert np.array_equal(d1, d2) and np.array_equal(f1, f2)


def test_range_scans_still_work(code_index):
    from ferret_ray.search.reader import IndexReader

    r = IndexReader(code_index)
    pref = r.terms_with_prefix("content", "tok1")
    assert pref and all(t.startswith("tok1") for t in pref)
    rng = r.terms_in_range("content", "tok10", "tok11", True, False)
    assert "tok10" in rng and all("tok10" <= t < "tok11" for t in rng)
    wild = r.terms_matching("content", lambda t: t.endswith("77"),
                            prefix="tok7")
    assert "tok77" in wild


def test_postings_many_bulk_equals_per_term(code_index):
    """The bulk expansion path (one zero-copy gather + one VInt decode
    per shard stream, segmented cumsum) returns byte-identical postings
    to the per-term decode for every term of a wide prefix expansion —
    including multi-shard terms, absent terms, and positions."""
    import numpy as np

    from ferret_ray.search.reader import IndexReader

    r = IndexReader(code_index)
    terms = r.terms_with_prefix("content", "tok")
    assert len(terms) > 50
    got = r.postings_many("content", terms + ["zzz_absent"])
    assert "zzz_absent" not in got
    assert set(got) == set(terms)
    for t in terms[:40] + terms[-10:]:
        want = r.postings("content", t)
        p = got[t]
        assert np.array_equal(p.docs, want.docs), t
        assert np.array_equal(p.freqs, want.freqs), t
        assert p.docs.dtype == want.docs.dtype
        # deferred position blobs decode identically
        sel = np.arange(min(5, p.docs.size))
        g_pos = r.positions_for(p, sel)
        w_pos = r.positions_for(want, sel)
        assert len(g_pos) == len(w_pos)
        for a, b in zip(g_pos, w_pos):
            assert np.array_equal(a, b), t


def test_stats_sidecar_written_and_loaded(code_index):
    """Builds write the consolidated shards_stats.parquet; readers load
    it and skip footer parsing (no file handle until first data read)."""
    import pyarrow.parquet as pq

    from ferret_ray.search.reader import IndexReader

    sidecar = os.path.join(code_index, "shards_stats.parquet")
    assert os.path.exists(sidecar)
    t = pq.read_table(sidecar)
    r = IndexReader(code_index)
    assert set(r._shard_stats) == set(r.manifest["shards"])
    # rows sorted by (salt, rg) — determinism + contiguous-run loading
    pairs = list(zip(t.column("salt").to_pylist(),
                     t.column("rg").to_pylist()))
    assert pairs == sorted(pairs)
    # a stats-backed shard opens NO file handle until data is read
    salt = r.manifest["shards"][0]
    sh = r._shard_for(salt)
    assert sh._file._pf_obj is None
    assert r.doc_freq("content", "tok1") > 0  # triggers dict reads
    # per-band row counts in the sidecar sum to the real footer total
    sid = salt % r.num_shards
    full = pq.ParquetFile(
        os.path.join(code_index, f"shards/shard-{sid:08d}.parquet")
    )
    band_rows = sum(
        int(r._shard_stats[s][0].sum()) for s in r.manifest["shards"]
        if s % r.num_shards == sid
    )
    assert band_rows == full.metadata.num_rows


def test_sidecar_reader_matches_footer_reader(code_index):
    """Every dictionary access path returns identical results whether
    row-group stats come from the sidecar or the parquet footers."""
    from ferret_ray.search.reader import IndexReader

    r_side = IndexReader(code_index)
    assert r_side._shard_stats, "sidecar must be present for this test"
    r_foot = IndexReader(code_index)
    r_foot._shard_stats = {}
    r_foot._shards = {}
    r_foot._salt_spans = {}
    r_foot._files = {}

    for field, term in [("content", "tok1"), ("content", "int"),
                        ("content", "zzz_absent")]:
        assert r_side.doc_freq(field, term) == r_foot.doc_freq(field, term)
    assert (r_side.terms_with_prefix("content", "tok2")
            == r_foot.terms_with_prefix("content", "tok2"))
    assert (r_side.terms_in_range("content", "tok3", "tok5", True, False)
            == r_foot.terms_in_range("content", "tok3", "tok5", True, False))
    terms = r_side.terms_with_prefix("content", "tok7")
    dfs_s = r_side.doc_freq_many("content", terms)
    dfs_f = r_foot.doc_freq_many("content", terms)
    assert dfs_s == dfs_f

    import numpy as np

    pm_s = r_side.postings_many("content", terms)
    pm_f = r_foot.postings_many("content", terms)
    assert set(pm_s) == set(pm_f)
    for t in terms:
        assert np.array_equal(pm_s[t].docs, pm_f[t].docs)
        assert np.array_equal(pm_s[t].freqs, pm_f[t].freqs)


def test_write_shard_stats_deterministic(code_index, tmp_path):
    """Regenerating the sidecar produces byte-identical output."""
    import shutil

    from ferret_ray.stages.merge import write_shard_stats
    from ferret_ray.state.manifest import read_manifest

    m = read_manifest(code_index)
    dup = str(tmp_path / "dup")
    shutil.copytree(code_index, dup)
    write_shard_stats(
        dup, m["shards"], int(m["config"]["num_shards"]),
        int(m["config"]["salt_doc_range"]),
    )
    a = open(os.path.join(code_index, "shards_stats.parquet"), "rb").read()
    b = open(os.path.join(dup, "shards_stats.parquet"), "rb").read()
    assert a == b


def test_post_rg_cache_bounded_across_files(code_index, monkeypatch):
    """The postings row-group cache budget is PROCESS-WIDE: loading
    blobs from every shard file evicts older entries instead of
    holding per-file caps x num_files tables (the 200M-soak OOM
    shape)."""
    import ferret_ray.search.reader as rd

    tiny = rd._PostRGCache(64 * 1024)  # 64 KB — forces eviction
    monkeypatch.setattr(rd, "_POST_RG_CACHE", tiny)
    r = rd.IndexReader(code_index)
    for t in ("tok1", "int", "tok5", "tok17", "tok99", "tok999",
              "return", "class", "def", "tok3"):
        p = r.postings("content", t)
        assert p is None or p.docs.size >= 0
        assert tiny.bytes <= tiny.budget + 1_000_000  # one batch slack
    # repeat reads still DECODE correctly after eviction
    p1 = r.postings("content", "tok1")
    p2 = r.postings("content", "tok1")
    assert (p1.docs == p2.docs).all() and (p1.freqs == p2.freqs).all()
