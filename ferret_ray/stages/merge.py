"""Shard merge: the term-hash shuffle's per-group writer.

The Ray analogue of SegmentMerger (c/src/index.c:5816-6159): where the
reference k-way-merges per-segment TermEnums under one mutex, we let Ray
Data shuffle posting fragments by ``shard_salt`` (salted term hash — see
stages/invert.py) and merge each group independently:

  segments ds -> groupby("shard_salt") -> map_groups(ShardWriter)

Within a group, fragments of the same (field, term) are concatenated in
``doc_base`` order (postings are doc-ordered, so concatenation is the exact
merge — the salting guarantees non-overlapping doc ranges per group), then
encoded once into the final layout: VInt-delta doc/freq/position streams,
Ferret-style skip entries every 16 docs, and block-max term-freq metadata
for WAND pruning.  Rows are sorted by (field, term): the shard parquet IS
the term dictionary (its zstd/dictionary encoding plays the role of the
reference's front-coded .tis blocks, c/src/index.c:2712-2869).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..codec.postings import encode_postings
from ..codec.vint import vint_decode
from ..state.manifest import checkpoint_done, write_checkpoint

SHARD_SCHEMA = pa.schema(
    [
        ("field", pa.int32()),
        ("term", pa.string()),
        ("df", pa.int64()),
        ("tf_sum", pa.int64()),
        ("doc_min", pa.int64()),
        ("doc_max", pa.int64()),
        ("max_tf", pa.int32()),
        ("docs_enc", pa.large_binary()),
        ("freqs_enc", pa.large_binary()),
        ("prx_enc", pa.large_binary()),
        ("prx_lens_enc", pa.large_binary()),
        ("skip_enc", pa.large_binary()),
        ("block_max_tf", pa.large_binary()),
    ]
)


def shard_file_name(shard_salt: int) -> str:
    return f"shards/shard-{shard_salt:08d}.parquet"


class ShardWriter:
    """map_groups UDF: one shard_salt group -> one shard parquet file."""

    def __init__(self, index_dir: str, input_fp: str):
        self.index_dir = index_dir
        self.input_fp = input_fp

    def __call__(self, group: pa.Table) -> pa.Table:
        shard_salt = int(group.column("shard_salt")[0].as_py())
        key = f"{shard_salt:08d}"
        rel = shard_file_name(shard_salt)
        metrics_schema = pa.schema(
            [
                ("shard_salt", pa.int64()),
                ("num_terms", pa.int64()),
                ("num_postings", pa.int64()),
                ("bytes", pa.int64()),
                ("skipped", pa.bool_()),
            ]
        )
        if checkpoint_done(self.index_dir, "shard", key, self.input_fp):
            return pa.table(
                {
                    "shard_salt": [shard_salt],
                    "num_terms": [0],
                    "num_postings": [0],
                    "bytes": [0],
                    "skipped": [True],
                },
                schema=metrics_schema,
            )

        # sort fragments by (field, term, doc_base) — concat order is exact
        group = group.sort_by(
            [("field", "ascending"), ("term", "ascending"),
             ("doc_base", "ascending")]
        )
        fields = group.column("field").to_numpy()
        terms = group.column("term").to_pylist()
        doc_bases = group.column("doc_base").to_numpy()
        dfs = group.column("df").to_numpy()
        tf_sums = group.column("tf_sum").to_numpy()
        docs_enc = group.column("docs_enc").to_pylist()
        freqs_enc = group.column("freqs_enc").to_pylist()
        prx_enc = group.column("prx_enc").to_pylist()
        prx_lens_enc = group.column("prx_lens_enc").to_pylist()

        out: dict[str, list] = {f.name: [] for f in SHARD_SCHEMA}
        n = len(terms)
        i = 0
        total_postings = 0
        while i < n:
            j = i
            f = fields[i]
            t = terms[i]
            while j < n and fields[j] == f and terms[j] == t:
                j += 1
            # merge fragments i..j (doc_base ascending, disjoint ranges)
            doc_arrs = []
            freq_arrs = []
            prx_parts = []
            for k in range(i, j):
                d = np.cumsum(vint_decode(docs_enc[k]))
                doc_arrs.append(d)
                freq_arrs.append(vint_decode(freqs_enc[k]))
                prx_parts.append(prx_enc[k])
            docs = np.concatenate(doc_arrs)
            freqs = np.concatenate(freq_arrs)
            has_prx = any(len(p) for p in prx_parts)
            if has_prx:
                # positions: per-doc blobs concatenate as-is; recompute
                # per-doc lens by concatenating the fragments' len streams
                plens = np.concatenate(
                    [vint_decode(prx_lens_enc[k]) for k in range(i, j)]
                )
                prx_blob = b"".join(prx_parts)
                enc = encode_postings(
                    docs, freqs, None, None, prx_lens_arr=plens
                )
                enc = enc._replace(prx=prx_blob)
            else:
                enc = encode_postings(docs, freqs, None, None)
            out["field"].append(int(f))
            out["term"].append(t)
            out["df"].append(int(docs.size))
            out["tf_sum"].append(int(tf_sums[i:j].sum()))
            out["doc_min"].append(enc.doc_min)
            out["doc_max"].append(enc.doc_max)
            out["max_tf"].append(enc.max_tf)
            out["docs_enc"].append(enc.docs)
            out["freqs_enc"].append(enc.freqs)
            out["prx_enc"].append(enc.prx)
            out["prx_lens_enc"].append(enc.prx_lens)
            out["skip_enc"].append(enc.skip)
            out["block_max_tf"].append(enc.block_max_tf)
            total_postings += int(docs.size)
            i = j

        table = pa.table(
            {k: pa.array(v, type=SHARD_SCHEMA.field(k).type)
             for k, v in out.items()},
            schema=SHARD_SCHEMA,
        )
        os.makedirs(os.path.join(self.index_dir, "shards"), exist_ok=True)
        path = os.path.join(self.index_dir, rel)
        pq.write_table(table, path, compression="zstd")
        size = os.path.getsize(path)
        write_checkpoint(
            self.index_dir, "shard", key, self.input_fp, [rel],
            {"num_terms": table.num_rows, "num_postings": total_postings},
        )
        return pa.table(
            {
                "shard_salt": [shard_salt],
                "num_terms": [table.num_rows],
                "num_postings": [total_postings],
                "bytes": [size],
                "skipped": [False],
            },
            schema=metrics_schema,
        )
