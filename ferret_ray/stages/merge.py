"""Shard merge: the term-hash shuffle's per-group writer.

The Ray analogue of SegmentMerger (c/src/index.c:5816-6159): where the
reference k-way-merges per-segment TermEnums under one mutex, we let Ray
Data shuffle posting fragments by ``shard_salt`` (salted term hash — see
stages/invert.py) and merge each group independently:

  segments ds -> groupby("shard_salt") -> map_groups(ShardWriter)

Within a group, fragments of the same (field, term) are concatenated in
``doc_base`` order (postings are doc-ordered and the salting guarantees
non-overlapping doc ranges per group, so concatenation IS the exact
merge).  The merge is fully vectorized: one global VInt decode of all doc
deltas, one global re-delta + encode (fragment-boundary deltas rewritten),
and pure byte concatenation for freqs / positions — only terms long enough
to need skip entries (df > 16) take a per-term path, mirroring how the
reference only writes skip data every SKIP_INTERVAL docs.

Rows are sorted by (field, term): the shard parquet IS the term dictionary
(its dictionary/zstd encoding plays the role of the front-coded .tis
blocks, c/src/index.c:2712-2869).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..codec.postings import SKIP_INTERVAL
from ..codec.vint import vint_byte_len, vint_decode, vint_encode
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

_METRICS_SCHEMA = pa.schema(
    [
        ("shard_salt", pa.int64()),
        ("num_terms", pa.int64()),
        ("num_postings", pa.int64()),
        ("bytes", pa.int64()),
        ("skipped", pa.bool_()),
    ]
)


def shard_file_name(shard_salt: int) -> str:
    return f"shards/shard-{shard_salt:08d}.parquet"


def _metrics(shard_salt, num_terms, num_postings, nbytes, skipped):
    return pa.table(
        {
            "shard_salt": [shard_salt],
            "num_terms": [num_terms],
            "num_postings": [num_postings],
            "bytes": [nbytes],
            "skipped": [skipped],
        },
        schema=_METRICS_SCHEMA,
    )


class ShardWriter:
    """map_groups UDF: one shard_salt group -> one shard parquet file."""

    def __init__(self, index_dir: str, input_fp: str):
        self.index_dir = index_dir
        self.input_fp = input_fp

    def __call__(self, group: pa.Table) -> pa.Table:
        shard_salt = int(group.column("shard_salt")[0].as_py())
        key = f"{shard_salt:08d}"
        rel = shard_file_name(shard_salt)
        if checkpoint_done(self.index_dir, "shard", key, self.input_fp):
            return _metrics(shard_salt, 0, 0, 0, True)

        group = group.sort_by(
            [("field", "ascending"), ("term", "ascending"),
             ("doc_base", "ascending")]
        )
        n_rows = group.num_rows
        fields = group.column("field").to_numpy()
        dfs = group.column("df").to_numpy()
        tf_sums = group.column("tf_sum").to_numpy()
        docs_enc = group.column("docs_enc").to_pylist()
        freqs_enc = group.column("freqs_enc").to_pylist()
        prx_enc = group.column("prx_enc").to_pylist()
        prx_lens_enc = group.column("prx_lens_enc").to_pylist()

        # term-run boundaries over rows (vectorized via dictionary codes)
        term_codes = pc.dictionary_encode(
            group.column("term")
        ).combine_chunks().indices.to_numpy()
        row_new = np.empty(n_rows, dtype=bool)
        row_new[0] = True
        np.logical_or(
            fields[1:] != fields[:-1],
            term_codes[1:] != term_codes[:-1],
            out=row_new[1:],
        )
        term_row_starts = np.flatnonzero(row_new)          # T terms
        term_row_ends = np.concatenate((term_row_starts[1:], [n_rows]))

        # ---- global doc-delta decode -> absolute -> re-delta -> encode --
        deltas = vint_decode(b"".join(docs_enc))
        m = deltas.size                                     # total postings
        row_off = np.concatenate(([0], np.cumsum(dfs)))     # posting offs
        c = np.cumsum(deltas)
        row_first = row_off[:-1]
        base_corr = c[row_first] - deltas[row_first]
        docs_all = c - np.repeat(base_corr, dfs)            # absolute ids
        # postings per term
        term_post_starts = row_off[term_row_starts]
        term_post_ends = row_off[term_row_ends]
        new_deltas = np.empty(m, dtype=np.int64)
        new_deltas[0] = docs_all[0]
        np.subtract(docs_all[1:], docs_all[:-1], out=new_deltas[1:])
        new_deltas[term_post_starts] = docs_all[term_post_starts]
        docs_buf = vint_encode(new_deltas)
        doc_blens = vint_byte_len(new_deltas)
        docs_off = np.concatenate(([0], np.cumsum(doc_blens)))

        freqs_all = vint_decode(b"".join(freqs_enc))
        term_df = (term_post_ends - term_post_starts).astype(np.int64)
        term_tf = np.add.reduceat(tf_sums, term_row_starts)
        term_max_tf = np.maximum.reduceat(freqs_all, term_post_starts)
        doc_mins = docs_all[term_post_starts]
        doc_maxs = docs_all[term_post_ends - 1]

        # ---- assemble rows (bytes concat for freqs/prx/prx_lens) --------
        out: dict[str, list] = {f.name: [] for f in SHARD_SCHEMA}
        da = docs_off[term_post_starts].tolist()
        db = docs_off[term_post_ends].tolist()
        trs = term_row_starts.tolist()
        tre = term_row_ends.tolist()
        need_skip = term_df > SKIP_INTERVAL
        total_postings = int(m)
        terms_list = group.column("term").to_pylist()
        for k in range(len(trs)):
            rs, re_ = trs[k], tre[k]
            out["field"].append(int(fields[rs]))
            out["term"].append(terms_list[rs])
            out["df"].append(int(term_df[k]))
            out["tf_sum"].append(int(term_tf[k]))
            out["doc_min"].append(int(doc_mins[k]))
            out["doc_max"].append(int(doc_maxs[k]))
            out["max_tf"].append(int(term_max_tf[k]))
            out["docs_enc"].append(docs_buf[da[k]: db[k]])
            out["freqs_enc"].append(
                freqs_enc[rs] if re_ == rs + 1
                else b"".join(freqs_enc[rs:re_])
            )
            out["prx_enc"].append(
                prx_enc[rs] if re_ == rs + 1 else b"".join(prx_enc[rs:re_])
            )
            out["prx_lens_enc"].append(
                prx_lens_enc[rs] if re_ == rs + 1
                else b"".join(prx_lens_enc[rs:re_])
            )
            if need_skip[k]:
                skip, bmax = _skip_blockmax(
                    docs_all[term_post_starts[k]: term_post_ends[k]],
                    freqs_all[term_post_starts[k]: term_post_ends[k]],
                    doc_blens[term_post_starts[k]: term_post_ends[k]],
                    out["prx_lens_enc"][-1],
                )
                out["skip_enc"].append(skip)
                out["block_max_tf"].append(bmax)
            else:
                out["skip_enc"].append(b"")
                out["block_max_tf"].append(b"")

        table = pa.table(
            {kk: pa.array(v, type=SHARD_SCHEMA.field(kk).type)
             for kk, v in out.items()},
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
        return _metrics(
            shard_salt, table.num_rows, total_postings, size, False
        )


def _skip_blockmax(
    docs: np.ndarray,
    freqs: np.ndarray,
    doc_blens: np.ndarray,
    prx_lens_enc: bytes,
) -> tuple[bytes, bytes]:
    """Ferret-style skip triples every 16 docs + per-block max tf
    (c/src/index.c:5275-5327; block-max is our WAND addition)."""
    n = docs.size
    frq_blens = vint_byte_len(freqs)
    frq_cum = np.cumsum(doc_blens + frq_blens)
    plens = vint_decode(prx_lens_enc)
    prx_cum = np.cumsum(plens) if plens.size == n else np.zeros(n, np.int64)
    pts = np.arange(SKIP_INTERVAL - 1, n, SKIP_INTERVAL)
    sd = np.diff(np.concatenate(([0], docs[pts])))
    sf = np.diff(np.concatenate(([0], frq_cum[pts])))
    sp = np.diff(np.concatenate(([0], prx_cum[pts])))
    tri = np.empty(pts.size * 3, dtype=np.int64)
    tri[0::3], tri[1::3], tri[2::3] = sd, sf, sp
    nblocks = (n + SKIP_INTERVAL - 1) // SKIP_INTERVAL
    pad = nblocks * SKIP_INTERVAL - n
    fpad = np.concatenate([freqs, np.zeros(pad, dtype=np.int64)])
    bmax = fpad.reshape(nblocks, SKIP_INTERVAL).max(axis=1)
    return vint_encode(tri), vint_encode(bmax)
