"""Physical tombstone purge: expunge_deletes.

The reference removes deleted docs for real during segment merges via a
``doc_map`` that renumbers surviving docids densely
(c/src/index.c:5729-5745, applied in sm_append_postings :5922-5974 and
sm_merge_fields/norms).  This is that operation as a Ray job: one task
per shard file rewrites postings (drop deleted docs, renumber, re-encode
deltas, rebuild skip/block-max), one task per docs part filters and
renumbers the stored rows, and the manifest commits the shrunken doc
count and per-field length sums.

With a single salt range (the common case), the purged shard files are
BYTE-IDENTICAL to a from-scratch build over the surviving corpus
(tested); with multiple ranges results are identical but salts retain
the original range layout.
"""

from __future__ import annotations

import hashlib
import json
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..codec.postings import SKIP_INTERVAL
from ..codec.vint import vint_decode, vint_encode
from ..state.fs import (
    fs_listdir,
    fs_makedirs,
    join as fs_join,
    resolve_fs,
)
from ..state.manifest import (
    checkpoint_done,
    read_manifest,
    write_checkpoint,
    write_manifest,
)


def _renumber(ids: np.ndarray, deleted: np.ndarray) -> np.ndarray:
    """doc_map: new id = old id - |deleted ids below it|."""
    return ids - np.searchsorted(deleted, ids, side="left")


def _purge_shard_table(
    t: pa.Table, deleted: np.ndarray
) -> pa.Table:
    """Drop deleted docs from every posting row; renumber; re-encode."""
    from ..stages.merge import SHARD_SCHEMA, _skip_blockmax

    cols = {name: [] for name in SHARD_SCHEMA.names}
    n = t.num_rows
    docs_list = t.column("docs_list")
    freqs_list = t.column("freqs_list")
    prx_enc = t.column("prx_enc")
    prx_lens_enc = t.column("prx_lens_enc")
    for i in range(n):
        d = np.cumsum(
            np.asarray(docs_list[i].as_py(), dtype=np.int64)
        )
        f = np.asarray(freqs_list[i].as_py(), dtype=np.int64)
        keep = ~np.isin(d, deleted)
        if not keep.any():
            continue  # term vanishes, like a fresh build without it
        nd = _renumber(d[keep], deleted)
        nf = f[keep]
        deltas = np.empty(nd.size, dtype=np.int64)
        deltas[0] = nd[0]
        np.subtract(nd[1:], nd[:-1], out=deltas[1:])
        prx_b = prx_enc[i].as_py()
        plens_b = prx_lens_enc[i].as_py()
        if prx_b:
            plens = vint_decode(plens_b)
            off = np.concatenate(([0], np.cumsum(plens)))
            parts = [
                prx_b[off[j]: off[j + 1]]
                for j in np.flatnonzero(keep)
            ]
            new_prx = b"".join(parts)
            new_plens = vint_encode(plens[keep])
        else:
            new_prx = b""
            new_plens = b""
        if nd.size > SKIP_INTERVAL:
            skip_b, bmax_b = _skip_blockmax(nd, nf, new_plens)
        else:
            skip_b, bmax_b = b"", b""
        cols["field"].append(t.column("field")[i].as_py())
        cols["term"].append(t.column("term")[i].as_py())
        cols["df"].append(int(nd.size))
        cols["tf_sum"].append(int(nf.sum()))
        cols["doc_min"].append(int(nd[0]))
        cols["doc_max"].append(int(nd[-1]))
        cols["max_tf"].append(int(nf.max()))
        cols["docs_list"].append(deltas.astype(np.int32))
        cols["freqs_list"].append(nf.astype(np.int32))
        cols["prx_enc"].append(new_prx)
        cols["prx_lens_enc"].append(new_plens)
        cols["skip_enc"].append(skip_b)
        cols["block_max_tf"].append(bmax_b)
    return pa.table(
        {k: pa.array(v, type=SHARD_SCHEMA.field(k).type)
         for k, v in cols.items()},
        schema=SHARD_SCHEMA,
    )


class _PurgeTask:
    def __init__(self, src: str, dest: str, fp: str,
                 deleted: list[int], docs_rg_size: int = 1024,
                 shards_rg_size: int = 1024,
                 docs_codec: dict[str, str] | None = None,
                 src_num_shards: int = 0,
                 src_salt_doc_range: int = 1):
        # per-field STORE_COMPRESS overrides from the manifest config —
        # purged docs parts must keep the source index's codecs so the
        # byte-identity-with-fresh-build invariant holds
        self.docs_codec = docs_codec or {}
        self.src = src
        self.dest = dest
        self.fp = fp
        self.deleted = np.asarray(sorted(deleted), dtype=np.int64)
        self.docs_rg_size = docs_rg_size
        self.shards_rg_size = shards_rg_size
        self.src_num_shards = src_num_shards
        self.src_salt_doc_range = src_salt_doc_range

    def __call__(self, batch: dict) -> dict:
        out = []
        for kind, rel in zip(batch["kind"], batch["rel"]):
            out.append(json.dumps(self._one(str(kind), str(rel))))
        return {"metrics": out}

    def _one(self, kind: str, rel: str) -> dict:
        key = rel.replace("/", "-")
        sfs, sroot = resolve_fs(self.src)
        dfs, droot = resolve_fs(self.dest)
        if checkpoint_done(self.dest, "purge", key, self.fp):
            from ..state.manifest import checkpoint_path, read_json

            rec = read_json(checkpoint_path(self.dest, "purge", key))
            return rec.get("metrics", {})
        metrics: dict = {}
        if kind == "shard":
            # format v8: one work item per shard FILE; purge its bands
            # one at a time and stream survivors through one writer
            from ..stages.merge import ShardFileWriter, iter_shard_bands

            shard_id = int(rel)
            fs_makedirs(dfs, fs_join(droot, "shards"))
            writer = ShardFileWriter(
                dfs, droot, shard_id, self.shards_rg_size
            )
            n_terms = n_posts = 0
            salts_out: list[int] = []
            for salt, t in iter_shard_bands(
                sfs, sroot, shard_id, self.src_num_shards,
                self.src_salt_doc_range,
            ):
                new = _purge_shard_table(t, self.deleted)
                if new.num_rows:
                    writer.append_band(salt, new)
                    salts_out.append(int(salt))
                    n_terms += new.num_rows
                    n_posts += int(
                        pa.compute.sum(new.column("df")).as_py()
                    )
            drel, prel, _sz = writer.close()
            outputs = [drel, prel] if salts_out else []
            if salts_out:
                metrics = {
                    "num_terms": n_terms,
                    "num_postings": n_posts,
                    "salts": salts_out,
                }
        else:  # docs part
            t = pq.read_table(fs_join(sroot, rel), filesystem=sfs)
            ids = t.column("doc_id").to_numpy()
            keep = ~np.isin(ids, self.deleted)
            new = t.filter(pa.array(keep))
            nids = _renumber(
                new.column("doc_id").to_numpy(), self.deleted
            )
            new = new.set_column(
                new.schema.get_field_index("doc_id"), "doc_id",
                pa.array(nids, type=pa.int64()),
            )
            metrics = {"num_docs": new.num_rows}
            if new.num_rows:
                # fully-tombstoned parts are dropped, like a fresh build
                # that never saw those docs (reader indexes parts by
                # first doc_id, so zero-row files must not exist)
                fs_makedirs(dfs, fs_join(droot, "docs"))
                comp = (
                    {c: self.docs_codec.get(c, "zstd")
                     for c in new.column_names}
                    if self.docs_codec else "zstd"
                )
                pq.write_table(
                    new, fs_join(droot, rel), compression=comp,
                    row_group_size=self.docs_rg_size, filesystem=dfs,
                )
                for c in new.column_names:
                    if c.startswith("len_"):
                        metrics[f"sum_{c}"] = int(
                            pa.compute.sum(new.column(c)).as_py() or 0
                        )
            outputs = [rel] if new.num_rows else []
        write_checkpoint(self.dest, "purge", key, self.fp, outputs,
                         metrics)
        return metrics


def expunge_deletes(
    src_dir: str, dest_dir: str, *, concurrency: int | None = None
) -> dict:
    """Rewrite ``src_dir`` into ``dest_dir`` with every tombstoned doc
    physically removed and docids renumbered densely (iw merge doc_map
    semantics).  Scores over the purged index reflect the shrunken
    df/N, exactly like a fresh build of the surviving corpus."""
    import ray.data

    from .deletes import load_deleted

    t0 = time.time()
    m = read_manifest(src_dir)
    if m is None:
        raise FileNotFoundError(f"no manifest in {src_dir}")
    deleted = sorted(load_deleted(src_dir))
    # fingerprint the FULL delete set: two different sets with equal
    # (count, min, max) must never collide, or resumed checkpoints
    # would reuse files purged with the wrong set
    del_hash = hashlib.sha256(
        np.asarray(deleted, dtype=np.int64).tobytes()
    ).hexdigest()[:16]
    fp = f"purge:{m['fingerprint']}:{len(deleted)}:{del_hash}"
    existing = read_manifest(dest_dir)
    if existing and existing.get("fingerprint") == fp:
        return existing
    _dfs, _droot = resolve_fs(dest_dir)
    fs_makedirs(_dfs, _droot)

    sfs, sroot = resolve_fs(src_dir)
    src_nshards = int(m["config"]["num_shards"])
    work = [
        {"kind": "shard", "rel": str(sid)}
        for sid in sorted({int(s) % src_nshards for s in m["shards"]})
    ] + [
        {"kind": "docs", "rel": f"docs/{n}"}
        for n in fs_listdir(sfs, fs_join(sroot, "docs"))
        if n.endswith(".parquet")
    ]
    rows = ray.data.from_items(
        work, override_num_blocks=max(1, len(work))
    ).map_batches(
        _PurgeTask(
            src_dir, dest_dir, fp, deleted,
            docs_rg_size=m["config"].get("docs_row_group_size", 1024),
            shards_rg_size=m["config"].get(
                "shards_row_group_size", 1024
            ),
            docs_codec={
                n: f["store_compression"]
                for n, f in m["config"].get("fields", {}).items()
                if f.get("stored") and f.get("store_compression")
            },
            src_num_shards=src_nshards,
            src_salt_doc_range=int(m["config"]["salt_doc_range"]),
        ),
        batch_size=4,
        concurrency=concurrency,
    ).take_all()
    parsed = [json.loads(r["metrics"]) for r in rows]
    shard_metrics = [p for p in parsed if "num_terms" in p]
    docs_metrics = [p for p in parsed if "num_docs" in p]

    num_docs = int(sum(p["num_docs"] for p in docs_metrics))
    len_sums = {}
    for f in m.get("len_sums", {}):
        len_sums[f] = int(
            sum(p.get(f"sum_len_{f}", 0) for p in docs_metrics)
        )
    from ..stages.merge import write_shard_stats

    num_shards = int(m["config"]["num_shards"])
    salt_doc_range = int(m["config"]["salt_doc_range"])
    write_shard_stats(
        dest_dir,
        [s for p in shard_metrics for s in p["salts"]],
        num_shards, salt_doc_range,
        concurrency=concurrency,
    )
    # manifest salts come from the committed SIDECAR, not the purge
    # tasks: renumbered docids can shift a band's doc range across a
    # salt_doc_range boundary, and the sidecar's (clamped-monotonic)
    # doc_min derivation is the single source of truth readers use for
    # band spans — manifest and sidecar must agree key-for-key
    import pyarrow.parquet as _pq

    from ..state.fs import join as _join

    _dfs, _droot = resolve_fs(dest_dir)
    sidecar = _pq.read_table(
        _join(_droot, "shards_stats.parquet"), columns=["salt"],
        filesystem=_dfs,
    )
    dest_salts = sorted(
        set(sidecar.column("salt").to_pylist())
    )
    manifest = dict(m)
    manifest.update(
        {
            "fingerprint": fp,
            "num_docs": num_docs,
            "len_sums": len_sums,
            "shards": dest_salts,
            "metrics": {
                "purged_docs": len(deleted),
                "terms_kept": int(
                    sum(p["num_terms"] for p in shard_metrics)
                ),
                "total_sec": time.time() - t0,
            },
            "lineage": {
                "kind": "expunge_deletes",
                "source_fingerprint": m["fingerprint"],
                "purged": len(deleted),
            },
        }
    )
    write_manifest(dest_dir, manifest)
    return manifest
