"""Rebuilding into an existing index dir with a changed fingerprint
must not merge the previous build's leftover segment files (ADVICE r2:
ShardMerger merges every file it finds in a bucket dir)."""

import hashlib
import os

import pyarrow.parquet as pq


def _hashes(d):
    out = {}
    sd = os.path.join(d, "shards")
    for n in sorted(os.listdir(sd)):
        with open(os.path.join(sd, n), "rb") as f:
            out[n] = hashlib.sha256(f.read()).hexdigest()
    return out


def test_rebuild_clears_stale_segments(ray_session, tmp_path):
    from ferret_ray.pipelines.build import build_index
    from ferret_ray.schema import source_code_config
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.sources.corpus import generate_corpus

    tmp = str(tmp_path)
    c1 = os.path.join(tmp, "c1.parquet")
    c2 = os.path.join(tmp, "c2.parquet")
    generate_corpus(c1, 400, seed=1, rows_per_fragment=100)
    generate_corpus(c2, 300, seed=2, rows_per_fragment=100)
    cfg = source_code_config(num_shards=2)

    idx = os.path.join(tmp, "idx")
    build_index(c1, idx, cfg)          # first build
    m2 = build_index(c2, idx, cfg)     # REBUILD same dir, new corpus
    assert m2["num_docs"] == 300

    fresh = os.path.join(tmp, "fresh")
    build_index(c2, fresh, cfg)
    assert _hashes(idx) == _hashes(fresh)
    # docs tables identical too (no stale docs parts)
    da = pq.read_table(os.path.join(idx, "docs"))
    db = pq.read_table(os.path.join(fresh, "docs"))
    assert da.equals(db)
    assert IndexReader(idx).num_docs == 300
