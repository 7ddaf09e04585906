"""Dynamic FieldInfos (frt_fis_get_or_add_field, c/include/index.h:160):
fields discovered from input schemas at build time with index-wide
defaults; heterogeneous inputs; lifecycle append with a brand-new field.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ferret_ray.pipelines.build import build_index
from ferret_ray.schema import FieldConfig, IndexConfig
from ferret_ray.search.query import TermQuery
from ferret_ray.search.reader import IndexReader
from ferret_ray.search.searcher import Searcher


def _write(path, table):
    pq.write_table(table, path)
    return str(path)


@pytest.fixture()
def hetero_inputs(tmp_path):
    a = _write(
        tmp_path / "a.parquet",
        pa.table(
            {
                "id": [0, 1],
                "title": ["alpha bravo", "charlie alpha"],
            }
        ),
    )
    b = _write(
        tmp_path / "b.parquet",
        pa.table(
            {
                "id": [2, 3],
                "body": ["delta echo", "alpha foxtrot"],
                "views": [10, 20],
            }
        ),
    )
    return [a, b]


def _dyn_cfg() -> IndexConfig:
    return IndexConfig(
        fields={},
        id_columns=("id",),
        num_shards=4,
        dynamic=True,
        default_field=FieldConfig(analyzer="standard_nostop"),
    )


def test_dynamic_build_discovers_and_searches(
    ray_session, hetero_inputs, tmp_path
):
    idx = str(tmp_path / "idx")
    m = build_index(hetero_inputs, idx, _dyn_cfg())
    # manifest records the union: declared (none) + discovered sorted
    assert set(m["field_names"]) == {"body", "title", "views"}
    r = IndexReader(idx)
    s = Searcher(r)
    assert sorted(
        h.doc for h in s.search(TermQuery("title", "alpha"), 0, 10).hits
    ) == [0, 1]
    assert sorted(
        h.doc for h in s.search(TermQuery("body", "alpha"), 0, 10).hits
    ) == [3]
    # non-string column discovered as stored-only
    assert not r.manifest["config"]["fields"]["views"]["indexed"]
    # stored values survive per part; missing fields read as None
    d0 = r.get_doc(0)
    assert d0["title"] == "alpha bravo"
    d2 = r.get_doc(2)
    assert d2["body"] == "delta echo"
    assert d2["views"] == 10
    assert d2.get("title") is None


def test_dynamic_matches_declared_results(
    ray_session, hetero_inputs, tmp_path
):
    dyn_dir = str(tmp_path / "dyn")
    build_index(hetero_inputs, dyn_dir, _dyn_cfg())
    decl = IndexConfig(
        fields={
            "body": FieldConfig(analyzer="standard_nostop"),
            "title": FieldConfig(analyzer="standard_nostop"),
            "views": FieldConfig(
                indexed=False, stored=True, positions=False, norms=False
            ),
        },
        id_columns=("id",),
        num_shards=4,
    )
    decl_dir = str(tmp_path / "decl")
    build_index(hetero_inputs, decl_dir, decl)
    sd = Searcher(IndexReader(dyn_dir))
    sc = Searcher(IndexReader(decl_dir))
    for f in ("title", "body"):
        for t in ("alpha", "echo", "charlie"):
            hd = [(h.doc, h.score) for h in sd.search(
                TermQuery(f, t), 0, 10).hits]
            hc = [(h.doc, h.score) for h in sc.search(
                TermQuery(f, t), 0, 10).hits]
            assert hd == hc, (f, t)


def test_lifecycle_append_new_field(ray_session, hetero_inputs, tmp_path):
    """Append a delta whose schema adds a brand-new field; after
    optimize the compacted index answers like a one-shot dynamic build
    over both inputs."""
    from ferret_ray.pipelines.lifecycle import IncrementalIndex

    a, b = hetero_inputs
    inc = IncrementalIndex(str(tmp_path / "inc"), _dyn_cfg(),
                           merge_factor=4)
    inc.append(a)
    inc.append(b)  # introduces 'body' + 'views'
    inc.optimize()
    si = Searcher(inc.reader())

    oneshot = str(tmp_path / "one")
    build_index(hetero_inputs, oneshot, _dyn_cfg())
    so = Searcher(IndexReader(oneshot))

    for f, t in [("title", "alpha"), ("body", "alpha"),
                 ("body", "delta"), ("title", "charlie")]:
        hi = sorted(h.doc for h in si.search(TermQuery(f, t), 0, 10).hits)
        ho = sorted(h.doc for h in so.search(TermQuery(f, t), 0, 10).hits)
        assert hi == ho, (f, t)
    # stored fields for docs from both deltas
    ri = inc.reader()
    assert ri.get_doc(0)["title"] == "alpha bravo"
    assert ri.get_doc(3)["body"] == "alpha foxtrot"


def test_dynamic_upsert_expunge_optimize(ray_session, tmp_path):
    """Kitchen-sink interaction: dynamic config + upsert-by-key where the
    replacement delta introduces a NEW field, then physical tombstone
    purge (expunge_deletes) and optimize — the purged+compacted index
    must answer exactly like a fresh dynamic build of the survivors."""
    from ferret_ray.pipelines.lifecycle import IncrementalIndex

    inc = IncrementalIndex(str(tmp_path / "inc"), _dyn_cfg(),
                           merge_factor=4)
    a = _write(
        tmp_path / "a.parquet",
        pa.table(
            {
                "key": ["k0", "k1", "k2"],
                "title": ["alpha bravo", "charlie alpha", "delta old"],
            }
        ),
    )
    inc.upsert(a, "key")
    # replacement delta: k2 gets new content AND a brand-new field
    b = _write(
        tmp_path / "b.parquet",
        pa.table(
            {
                "key": ["k2"],
                "title": ["delta new"],
                "summary": ["fresh summary echo"],
            }
        ),
    )
    inc.upsert(b, "key")
    inc.expunge_deletes()
    inc.optimize()
    si = Searcher(inc.reader())

    # fresh dynamic build over the logical survivors
    surv = _write(
        tmp_path / "surv-a.parquet",
        pa.table(
            {
                "key": ["k0", "k1"],
                "title": ["alpha bravo", "charlie alpha"],
            }
        ),
    )
    surv2 = _write(
        tmp_path / "surv-b.parquet",
        pa.table(
            {
                "key": ["k2"],
                "title": ["delta new"],
                "summary": ["fresh summary echo"],
            }
        ),
    )
    fresh = str(tmp_path / "fresh")
    fresh_cfg = _dyn_cfg()
    # mirror the implicit keyword declaration the upsert made
    fresh_cfg.fields["key"] = FieldConfig(
        analyzer="keyword", positions=False
    )
    build_index([surv, surv2], fresh, fresh_cfg)
    so = Searcher(IndexReader(fresh))

    for f, t in [("title", "alpha"), ("title", "delta"),
                 ("title", "old"), ("summary", "echo"),
                 ("key", "k2")]:
        hi = [(h.doc, round(h.score, 6))
              for h in si.search(TermQuery(f, t), 0, 10).hits]
        ho = [(h.doc, round(h.score, 6))
              for h in so.search(TermQuery(f, t), 0, 10).hits]
        assert hi == ho, (f, t, hi, ho)
    assert si.search(TermQuery("title", "old"), 0, 10).total_hits == 0
    # stored docs line up (docids dense after purge)
    ri, ro = inc.reader(), IndexReader(fresh)
    assert ri.max_doc() == ro.max_doc() == 3
    for d in range(3):
        assert ri.get_doc(d)["title"] == ro.get_doc(d)["title"]
