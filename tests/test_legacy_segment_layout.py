"""Resume compatibility with the pre-consolidation segment layout.

Before the per-bucket consolidation, invert tasks wrote one file per
(bucket, band): ``segments/bucket={b}/rng{r:06d}-seg-{tag}.parquet``.
A build checkpointed under that layout must still resume with the
current ShardMerger (which reads band membership from the filename for
``rng*`` files and from shard_salt row-group stats for ``seg-*``
files), producing byte-identical shard outputs.
"""

import hashlib
import json
import os

import pyarrow.parquet as pq


def _shard_hashes(d):
    out = {}
    sd = os.path.join(d, "shards")
    for n in sorted(os.listdir(sd)):
        with open(os.path.join(sd, n), "rb") as f:
            out[n] = hashlib.sha256(f.read()).hexdigest()
    return out


def test_resume_merges_legacy_rng_files(ray_session, tmp_path):
    from ferret_ray.pipelines.build import build_index
    from ferret_ray.schema import source_code_config
    from ferret_ray.sources.corpus import generate_corpus

    tmp = str(tmp_path)
    corpus = os.path.join(tmp, "c.parquet")
    generate_corpus(corpus, 600, seed=3, rows_per_fragment=100)
    cfg = source_code_config(num_shards=4)
    cfg.gc_segments_during_merge = False

    idx = os.path.join(tmp, "idx")
    build_index(corpus, idx, cfg)
    want = _shard_hashes(idx)

    # --- rewrite the shuffle intermediates into the LEGACY layout ----
    seg_root = os.path.join(idx, "segments")
    rel_map = {}  # new rel -> [old rels]
    for bdir in sorted(os.listdir(seg_root)):
        for n in sorted(os.listdir(os.path.join(seg_root, bdir))):
            if not (n.startswith("seg-") and n.endswith(".parquet")):
                continue
            path = os.path.join(seg_root, bdir, n)
            pf = pq.ParquetFile(path)
            tag = n[len("seg-"):-len(".parquet")]
            olds = []
            for i in range(pf.metadata.num_row_groups):
                t = pf.read_row_group(i)
                band = int(t.column("shard_salt")[0].as_py()) // 4
                old = f"rng{band:06d}-seg-{tag}.parquet"
                pq.write_table(
                    t, os.path.join(seg_root, bdir, old),
                    compression="lz4",
                )
                olds.append(f"segments/{bdir}/{old}")
            pf.close()
            os.remove(path)
            rel_map[f"segments/{bdir}/{n}"] = olds

    # --- point the invert checkpoints at the legacy rels -------------
    ckpt_dir = os.path.join(idx, "checkpoints")
    for n in os.listdir(ckpt_dir):
        if not n.startswith("frag-"):
            continue
        p = os.path.join(ckpt_dir, n)
        rec = json.load(open(p))
        outs = []
        for out in rec["outputs"]:
            outs.extend(rel_map.get(out, [out]))
        rec["outputs"] = outs
        json.dump(rec, open(p, "w"))

    # --- drop the merge outputs + checkpoints and resume -------------
    for n in os.listdir(ckpt_dir):
        if n.startswith("shard-"):
            os.remove(os.path.join(ckpt_dir, n))
    for n in os.listdir(os.path.join(idx, "shards")):
        os.remove(os.path.join(idx, "shards", n))
    os.remove(os.path.join(idx, "manifest.json"))

    build_index(corpus, idx, cfg)  # invert skips, merge re-runs on rng*
    assert _shard_hashes(idx) == want


def test_stale_inflight_legacy_files_are_ignored(ray_session, tmp_path):
    """A fragment re-inverted after a layout upgrade writes seg-{tag};
    stale UN-checkpointed legacy rng*-seg-{tag} files of the same tag
    must be skipped by the merge (merging both would double the
    fragment's postings)."""
    from ferret_ray.pipelines.build import build_index
    from ferret_ray.schema import source_code_config
    from ferret_ray.sources.corpus import generate_corpus

    tmp = str(tmp_path)
    corpus = os.path.join(tmp, "c.parquet")
    generate_corpus(corpus, 400, seed=5, rows_per_fragment=100)
    cfg = source_code_config(num_shards=2)
    cfg.gc_segments_during_merge = False

    idx = os.path.join(tmp, "idx")
    build_index(corpus, idx, cfg)
    want = _shard_hashes(idx)

    # duplicate every consolidated file's row groups as same-tag legacy
    # files WITHOUT touching checkpoints (the in-flight crash shape)
    seg_root = os.path.join(idx, "segments")
    for bdir in sorted(os.listdir(seg_root)):
        for n in sorted(os.listdir(os.path.join(seg_root, bdir))):
            if not (n.startswith("seg-") and n.endswith(".parquet")):
                continue
            pf = pq.ParquetFile(os.path.join(seg_root, bdir, n))
            tag = n[len("seg-"):-len(".parquet")]
            for i in range(pf.metadata.num_row_groups):
                t = pf.read_row_group(i)
                band = int(t.column("shard_salt")[0].as_py()) // 2
                pq.write_table(
                    t,
                    os.path.join(
                        seg_root, bdir,
                        f"rng{band:06d}-seg-{tag}.parquet",
                    ),
                    compression="lz4",
                )
            pf.close()

    # drop merge outputs + checkpoints, resume: the duplicates must
    # not change the merged shards
    ckpt_dir = os.path.join(idx, "checkpoints")
    for n in os.listdir(ckpt_dir):
        if n.startswith("shard-"):
            os.remove(os.path.join(ckpt_dir, n))
    for n in os.listdir(os.path.join(idx, "shards")):
        os.remove(os.path.join(idx, "shards", n))
    os.remove(os.path.join(idx, "manifest.json"))

    build_index(corpus, idx, cfg)
    assert _shard_hashes(idx) == want
