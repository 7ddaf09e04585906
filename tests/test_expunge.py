"""expunge_deletes: physical purge == fresh build of survivors.

The reference's merges apply a doc_map that removes deleted docs and
renumbers survivors densely; after the merge, df/N (and so scores)
reflect the shrunken index.  Acceptance: purged shard files are
byte-identical to a from-scratch build over the corpus minus the
deleted rows, and searches agree on hits AND scores.
"""

import hashlib
import os

import pyarrow.parquet as pq
import pytest


def _shard_hashes(d):
    out = {}
    sd = os.path.join(d, "shards")
    for n in sorted(os.listdir(sd)):
        with open(os.path.join(sd, n), "rb") as f:
            out[n] = hashlib.sha256(f.read()).hexdigest()
    return out


def test_expunge_matches_fresh_build(ray_session, tmp_path):
    import pyarrow as pa

    from ferret_ray.pipelines.build import build_index
    from ferret_ray.pipelines.deletes import delete_docs
    from ferret_ray.pipelines.expunge import expunge_deletes
    from ferret_ray.schema import source_code_config
    from ferret_ray.search.query import BooleanQuery, TermQuery
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher
    from ferret_ray.sources.corpus import generate_corpus

    tmp = str(tmp_path)
    corpus = os.path.join(tmp, "c.parquet")
    generate_corpus(corpus, 500, rows_per_fragment=100)
    cfg = source_code_config(num_shards=4)

    full = os.path.join(tmp, "full")
    build_index(corpus, full, cfg)

    # tombstone a scattered subset
    deleted = [3, 4, 77, 120, 121, 122, 333, 499]
    delete_docs(full, deleted)

    purged = os.path.join(tmp, "purged")
    m = expunge_deletes(full, purged)
    assert m["num_docs"] == 500 - len(deleted)
    assert m["metrics"]["purged_docs"] == len(deleted)

    # fresh build over the surviving rows (same fragment layout: one
    # file, same row-group size, minus the deleted rows)
    t = pq.read_table(corpus)
    keep = [i for i in range(500) if i not in set(deleted)]
    survivors = os.path.join(tmp, "surv.parquet")
    pq.write_table(t.take(pa.array(keep)), survivors,
                   row_group_size=100)
    fresh = os.path.join(tmp, "fresh")
    build_index(survivors, fresh, cfg)

    assert _shard_hashes(purged) == _shard_hashes(fresh)
    rf = IndexReader(fresh)
    rp = IndexReader(purged)
    assert rp.num_docs == rf.num_docs
    assert rp.len_sums == rf.len_sums

    sf, sp = Searcher(rf), Searcher(rp)
    bq = BooleanQuery()
    bq.add(TermQuery("content", "int"))
    bq.add(TermQuery("content", "tok7"))
    for q in (TermQuery("content", "int"), bq,
              TermQuery("content", "tok0")):
        a = sf.search(q, 0, 20)
        b = sp.search(q, 0, 20)
        assert a.total_hits == b.total_hits
        assert [(h.doc, h.score) for h in a.hits] == [
            (h.doc, h.score) for h in b.hits
        ]

    # docs tables agree as content (partitioning may differ)
    import pandas as pd

    da = pq.read_table(os.path.join(purged, "docs")).to_pandas()
    db = pq.read_table(os.path.join(fresh, "docs")).to_pandas()
    pd.testing.assert_frame_equal(
        da.sort_values("doc_id").reset_index(drop=True),
        db.sort_values("doc_id").reset_index(drop=True),
    )

    # no tombstones carried into the purged index
    from ferret_ray.pipelines.deletes import load_deleted

    assert load_deleted(purged) == set()


def test_expunge_fully_tombstoned_part(ray_session, tmp_path):
    """Deleting every doc of one docs part must not leave a zero-row
    parquet file behind (get_doc indexes parts by first doc_id and
    would crash on an empty part)."""
    import os

    from ferret_ray.pipelines.build import build_index
    from ferret_ray.pipelines.deletes import delete_docs
    from ferret_ray.pipelines.expunge import expunge_deletes
    from ferret_ray.schema import source_code_config
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.sources.corpus import generate_corpus

    tmp = str(tmp_path)
    corpus = os.path.join(tmp, "c.parquet")
    generate_corpus(corpus, 300, rows_per_fragment=100)
    cfg = source_code_config(num_shards=2)
    full = os.path.join(tmp, "full")
    build_index(corpus, full, cfg)

    # tombstone the ENTIRE first fragment (docs 0..99) + a few others
    delete_docs(full, list(range(100)) + [150, 299])
    purged = os.path.join(tmp, "purged")
    m = expunge_deletes(full, purged)
    assert m["num_docs"] == 198

    r = IndexReader(purged)
    # every surviving doc is reachable, including across the part gap
    for did in (0, 97, 99, 197):
        doc = r.get_doc(did)
        assert doc["doc_id"] == did
    # no zero-row parts on disk
    for n in os.listdir(os.path.join(purged, "docs")):
        t = pq.read_table(os.path.join(purged, "docs", n))
        assert t.num_rows > 0


def test_expunge_fingerprint_distinguishes_sets(ray_session, tmp_path):
    """Two delete sets with identical (count, min, max) must produce
    different purge fingerprints — resumed checkpoints keyed on the fp
    must never reuse files purged with the wrong set."""
    import os

    from ferret_ray.pipelines.build import build_index
    from ferret_ray.pipelines.deletes import clear_deletes, delete_docs
    from ferret_ray.pipelines.expunge import expunge_deletes
    from ferret_ray.schema import source_code_config
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.sources.corpus import generate_corpus

    tmp = str(tmp_path)
    corpus = os.path.join(tmp, "c.parquet")
    generate_corpus(corpus, 50, rows_per_fragment=50)
    cfg = source_code_config(num_shards=2)
    full = os.path.join(tmp, "full")
    build_index(corpus, full, cfg)

    dest = os.path.join(tmp, "purged")
    delete_docs(full, [0, 5, 9])
    m1 = expunge_deletes(full, dest)
    clear_deletes(full)
    delete_docs(full, [0, 6, 9])  # same count/min/max, different set
    m2 = expunge_deletes(full, dest)
    assert m1["fingerprint"] != m2["fingerprint"]
    # the second purge really removed doc 6 (old id), kept old id 5
    r = IndexReader(dest)
    assert r.num_docs == 47
