"""Index storage through filesystem URIs (pyarrow.fs / fsspec).

The multi-node requirement: build and serve must work when the index
lives on shared storage addressed by URI, not a local os.path.  Two
round-trips:

* ``file://`` — the full distributed build pipeline (Ray tasks resolve
  the URI independently, like s3:// on a real cluster) + search.
* ``memory://`` (fsspec) — a single-process build+serve round-trip
  through the PyFileSystem/FSSpecHandler wrapper; proves no index I/O
  path touches os.* directly.  (fsspec memory is process-local, so the
  distributed exchange itself is exercised by the file:// variant.)
"""

import os

import pytest


def _corpus(tmp, n=400):
    from ferret_ray.sources.corpus import generate_corpus

    p = os.path.join(tmp, "code.parquet")
    generate_corpus(p, n, rows_per_fragment=100)
    return p


def _cfg():
    from ferret_ray.schema import source_code_config

    return source_code_config(num_shards=4)


def test_file_uri_build_and_search(ray_session, tmp_path):
    from ferret_ray.pipelines.build import build_index
    from ferret_ray.search.query import TermQuery
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher

    corpus = _corpus(str(tmp_path))
    index_uri = "file://" + str(tmp_path / "idx")
    m = build_index("file://" + corpus, index_uri, _cfg())
    assert m["num_docs"] == 400

    # plain-path build over the same input is byte-identical
    import hashlib

    plain = str(tmp_path / "idx2")
    build_index(corpus, plain, _cfg())

    def tree(d):
        out = {}
        for root, _, names in os.walk(d):
            for n in names:
                rel = os.path.relpath(os.path.join(root, n), d)
                out[rel] = hashlib.sha256(
                    open(os.path.join(root, n), "rb").read()
                ).hexdigest()
        return out

    a, b = tree(str(tmp_path / "idx")), tree(plain)
    assert {
        k: v for k, v in a.items()
        if k.startswith(("shards/", "docs/"))
    } == {
        k: v for k, v in b.items()
        if k.startswith(("shards/", "docs/"))
    }

    s = Searcher(IndexReader(index_uri))
    td = s.search(TermQuery("content", "int"), 0, 10)
    assert td.total_hits > 0
    doc = s.reader.get_doc(td.hits[0].doc)
    assert "repo" in doc


def test_memory_uri_roundtrip(ray_session, tmp_path):
    """Single-process: copy a built index into memory:// and serve it."""
    import fsspec

    from ferret_ray.pipelines.build import build_index
    from ferret_ray.search.query import PrefixQuery, TermQuery
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher

    corpus = _corpus(str(tmp_path), n=200)
    local = str(tmp_path / "idx")
    build_index(corpus, local, _cfg())

    mem = fsspec.filesystem("memory")
    for root, _, names in os.walk(local):
        for n in names:
            p = os.path.join(root, n)
            rel = os.path.relpath(p, local)
            with open(p, "rb") as f:
                mem.pipe_file("/memidx/" + rel, f.read())

    r = IndexReader("memory:///memidx")
    s = Searcher(r)
    base = Searcher(IndexReader(local))
    for q in (TermQuery("content", "int"),
              TermQuery("content", "tok7"),
              PrefixQuery("content", "tok1")):
        a = base.search(q, 0, 20)
        b = s.search(q, 0, 20)
        assert a.total_hits == b.total_hits
        assert [(h.doc, h.score) for h in a.hits] == [
            (h.doc, h.score) for h in b.hits
        ]
    assert r.get_doc(0)["doc_id"] == 0


def test_file_uri_lifecycle(ray_session, tmp_path):
    """IncrementalIndex over a file:// URI root: append, compact with
    defer_gc, gc, serve — every lifecycle fs op goes through the
    pyarrow.fs/fsspec layer (the object-store path at scale)."""
    import os

    from ferret_ray.pipelines.lifecycle import IncrementalIndex
    from ferret_ray.schema import source_code_config
    from ferret_ray.search.query import TermQuery
    from ferret_ray.search.searcher import Searcher
    from ferret_ray.sources.corpus import generate_corpus

    p1 = os.path.join(str(tmp_path), "a.parquet")
    p2 = os.path.join(str(tmp_path), "b.parquet")
    generate_corpus(p1, 200, seed=1, rows_per_fragment=100)
    generate_corpus(p2, 200, seed=2, rows_per_fragment=100)
    root = "file://" + str(tmp_path / "inc")
    inc = IncrementalIndex(
        root, source_code_config(num_shards=4),
        merge_factor=2, defer_gc=True,
    )
    inc.append(p1, merge=False)
    inc.append(p2, merge=False)
    inc.maybe_merge()
    assert len(inc.delta_dirs) == 1
    assert inc._state["trash"]
    assert inc.gc() == 2
    s = Searcher(inc.reader())
    td = s.search(TermQuery("content", "int"), 0, 10)
    assert td.total_hits > 0
    # reopen from the URI
    inc2 = IncrementalIndex(
        root, source_code_config(num_shards=4), merge_factor=2
    )
    assert inc2.num_docs() == 400
