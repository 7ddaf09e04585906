"""Execution-shape independence: the index depends only on the input.

Shard files must be byte-identical across task granularities
(``fragments_per_task``), and the docs table logically identical —
the property that makes results reproducible across cluster sizes
(docids and postings are pure functions of (fragment, row), and the
merge normalizes whatever row partitioning the invert tasks produced).
A cross-process 4-vs-32-cpu build of the same corpus was verified
byte-identical too (BASELINE.md); this in-process variant pins the
same invariant at test speed.
"""

import hashlib
import os

import pyarrow.parquet as pq


def _shard_hashes(d):
    out = {}
    sd = os.path.join(d, "shards")
    for n in sorted(os.listdir(sd)):
        with open(os.path.join(sd, n), "rb") as f:
            out[n] = hashlib.sha256(f.read()).hexdigest()
    return out


def test_shards_identical_across_task_granularity(ray_session, tmp_path):
    from ferret_ray.pipelines.build import build_index
    from ferret_ray.schema import source_code_config
    from ferret_ray.sources.corpus import generate_corpus

    tmp = str(tmp_path)
    corpus = os.path.join(tmp, "c.parquet")
    generate_corpus(corpus, 800, seed=7, rows_per_fragment=100)

    hashes = []
    docs = []
    for fpt in (1, 4):
        out = os.path.join(tmp, f"idx-fpt{fpt}")
        cfg = source_code_config(num_shards=4)
        cfg.fragments_per_task = fpt
        build_index(corpus, out, cfg)
        hashes.append(_shard_hashes(out))
        docs.append(
            pq.read_table(os.path.join(out, "docs")).sort_by("doc_id")
        )
    assert hashes[0] == hashes[1]
    assert docs[0].equals(docs[1])
