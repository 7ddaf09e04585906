"""Segment build: tokenize + invert one input fragment (stateless Ray task).

The Ray analogue of DocWriter's in-RAM inversion (dw_invert_field /
dw_add_posting, c/src/index.c:5520-5640) + segment flush (dw_flush,
c/src/index.c:5376-5454): each task reads one parquet row-group with column
pruning, tokenizes every indexed field, builds per-term postings with
positions, and writes

* ``segments/seg-{frag:06d}.parquet``  — posting fragments
  (field, term, shard_salt, doc_base, df, docs/freqs/prx/prx_lens VInt
  blobs), the input of the term-hash merge shuffle; and
* ``docs/part-{frag:06d}.parquet``     — the docs table (docid, stored
  columns, content sha256 for the per-row invariant, per-field token count
  and Ferret float8 norm byte, c/src/index.c:5676-5681).

Partition key: ``shard_salt = (doc_base // salt_doc_range) * num_shards +
crc32(field, term) % num_shards`` — a *skew-aware* salted term-hash: every
group covers a single doc range, so hot-term groups are bounded by the
range size and merged blocks concatenate in doc order exactly.

Determinism: docid = fragment doc_base + row index; outputs are pure
functions of (fragment bytes, config) — retries and resumes are exact.
"""

from __future__ import annotations

import hashlib
import os
import zlib
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..analysis import Analyzer
from ..codec.norms import encode_norms
from ..codec.vint import vint_byte_len, vint_encode
from ..schema import IndexConfig, analyzer_for
from ..sources.fragments import read_fragment
from ..state.manifest import checkpoint_done, write_checkpoint

F32 = np.float32

SEGMENT_SCHEMA = pa.schema(
    [
        ("field", pa.int32()),
        ("term", pa.string()),
        ("shard_salt", pa.int64()),
        ("doc_base", pa.int64()),
        ("df", pa.int64()),
        ("tf_sum", pa.int64()),
        ("docs_enc", pa.large_binary()),
        ("freqs_enc", pa.large_binary()),
        ("prx_enc", pa.large_binary()),
        ("prx_lens_enc", pa.large_binary()),
    ]
)


def term_shard(field_num: int, term: str, num_shards: int) -> int:
    return zlib.crc32(term.encode("utf-8", "surrogatepass"), field_num) % (
        num_shards
    )


def _invert_texts(
    analyzer: Analyzer,
    texts: list[str | None],
    max_field_length: int,
    with_positions: bool,
) -> tuple[dict[str, int], np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Invert a column of texts -> (term->tid, tid[], doc[], pos[], lens[]).

    Token-order arrays; ``lens`` is per-doc token count (for norms).
    """
    term_ids: dict[str, int] = {}
    tids: list[int] = []
    docs: list[int] = []
    poss: list[int] = []
    lens = np.zeros(len(texts), dtype=np.int32)
    get = term_ids.get
    for di, text in enumerate(texts):
        if not text:
            continue
        terms, positions = analyzer.terms_positions(text, max_field_length)
        lens[di] = len(terms)
        for t, p in zip(terms, positions):
            tid = get(t)
            if tid is None:
                tid = len(term_ids)
                term_ids[t] = tid
            tids.append(tid)
            docs.append(di)
            poss.append(p)
    return (
        term_ids,
        np.asarray(tids, dtype=np.int64),
        np.asarray(docs, dtype=np.int64),
        np.asarray(poss, dtype=np.int64),
        lens,
    )


def _encode_field_postings(
    field_num: int,
    term_ids: dict[str, int],
    tids: np.ndarray,
    docs: np.ndarray,
    poss: np.ndarray,
    doc_base: int,
    cfg: IndexConfig,
    with_positions: bool,
    out: dict[str, list],
) -> None:
    """Sort token stream by term (stable) and emit one fragment row/term."""
    if tids.size == 0:
        return
    order = np.argsort(tids, kind="stable")
    s_tid = tids[order]
    s_doc = docs[order]
    s_pos = poss[order]
    # term group boundaries
    tb = np.flatnonzero(np.diff(s_tid)) + 1
    t_starts = np.concatenate(([0], tb))
    t_ends = np.concatenate((tb, [s_tid.size]))
    id2term = sorted(term_ids, key=term_ids.get)
    num_shards = cfg.num_shards
    range_id = doc_base // cfg.salt_doc_range
    salt_base = range_id * num_shards

    for ts, te in zip(t_starts.tolist(), t_ends.tolist()):
        term = id2term[s_tid[ts]]
        g_doc = s_doc[ts:te]
        # run-length encode docs (already doc-ordered within the term)
        db = np.flatnonzero(np.diff(g_doc)) + 1
        d_starts = np.concatenate(([0], db))
        u_docs = g_doc[d_starts] + doc_base
        freqs = np.diff(np.concatenate((d_starts, [g_doc.size])))
        deltas = np.empty(u_docs.size, dtype=np.int64)
        deltas[0] = u_docs[0]
        np.subtract(u_docs[1:], u_docs[:-1], out=deltas[1:])
        if with_positions:
            g_pos = s_pos[ts:te]
            pdeltas = np.empty(g_pos.size, dtype=np.int64)
            pdeltas[0] = g_pos[0]
            np.subtract(g_pos[1:], g_pos[:-1], out=pdeltas[1:])
            pdeltas[d_starts] = g_pos[d_starts]  # restart per doc
            prx = vint_encode(pdeltas)
            plens = np.add.reduceat(vint_byte_len(pdeltas), d_starts)
            prx_lens = vint_encode(plens)
        else:
            prx = b""
            prx_lens = b""
        out["field"].append(field_num)
        out["term"].append(term)
        out["shard_salt"].append(
            salt_base + term_shard(field_num, term, num_shards)
        )
        out["doc_base"].append(doc_base)
        out["df"].append(int(u_docs.size))
        out["tf_sum"].append(int(g_doc.size))
        out["docs_enc"].append(vint_encode(deltas))
        out["freqs_enc"].append(vint_encode(freqs))
        out["prx_enc"].append(prx)
        out["prx_lens_enc"].append(prx_lens)


class InvertFragment:
    """map_batches UDF over fragment-descriptor rows (batch_size=1)."""

    def __init__(self, cfg: IndexConfig, index_dir: str, input_fp: str):
        self.cfg = cfg
        self.index_dir = index_dir
        self.input_fp = input_fp
        self._analyzers: dict[str, Analyzer] | None = None

    def _get_analyzers(self) -> dict[str, Analyzer]:
        if self._analyzers is None:
            self._analyzers = {
                name: analyzer_for(fc.analyzer)
                for name, fc in self.cfg.fields.items()
                if fc.indexed
            }
        return self._analyzers

    def __call__(self, batch: dict[str, np.ndarray]) -> dict[str, list]:
        keys = ["frag_id", "num_docs", "num_postings", "num_tokens",
                "skipped"] + [f"len_sum_{f}" for f in self.cfg.indexed_fields]
        metrics_rows: dict[str, list] = {k: [] for k in keys}
        for i in range(len(batch["frag_id"])):
            frag = {k: batch[k][i] for k in batch}
            m = self._process(frag)
            for k in keys:
                metrics_rows[k].append(m.get(k, 0))
        return metrics_rows

    def _process(self, frag: dict[str, Any]) -> dict[str, Any]:
        cfg = self.cfg
        frag_id = int(frag["frag_id"])
        doc_base = int(frag["doc_base"])
        key = f"{frag_id:06d}"
        fp = f"{self.input_fp}:{frag['num_rows']}:{doc_base}"
        seg_rel = f"segments/seg-{key}.parquet"
        docs_rel = f"docs/part-{key}.parquet"
        if checkpoint_done(self.index_dir, "frag", key, fp):
            from ..state.manifest import checkpoint_path, read_json

            rec = read_json(checkpoint_path(self.index_dir, "frag", key))
            m = dict(rec.get("metrics", {}))
            m.update({"frag_id": frag_id, "skipped": True})
            m.setdefault("num_docs", int(frag["num_rows"]))
            return m

        needed = set(cfg.indexed_fields) | set(cfg.id_columns)
        needed |= {n for n, fc in cfg.fields.items() if fc.stored}
        if cfg.boost_column:
            needed.add(cfg.boost_column)
        table = read_fragment(frag, columns=sorted(needed))
        n_rows = table.num_rows
        doc_ids = np.arange(doc_base, doc_base + n_rows, dtype=np.int64)

        seg_out: dict[str, list] = {f.name: [] for f in SEGMENT_SCHEMA}
        docs_cols: dict[str, Any] = {"doc_id": doc_ids}
        if cfg.boost_column and cfg.boost_column in table.column_names:
            doc_boosts = (
                table.column(cfg.boost_column).to_numpy().astype(np.float32)
            )
        else:
            doc_boosts = np.ones(n_rows, dtype=np.float32)

        analyzers = self._get_analyzers()
        total_tokens = 0
        field_names = list(cfg.fields)
        for fname, fc in cfg.fields.items():
            if fc.stored and fname in table.column_names:
                docs_cols[fname] = table.column(fname)
            if not fc.indexed or fname not in table.column_names:
                continue
            field_num = field_names.index(fname)
            texts = table.column(fname).to_pylist()
            term_ids, tids, docs, poss, lens = _invert_texts(
                analyzers[fname], texts, fc.max_field_length, fc.positions
            )
            total_tokens += int(tids.size)
            _encode_field_postings(
                field_num, term_ids, tids, docs, poss, doc_base,
                cfg, fc.positions, seg_out,
            )
            docs_cols[f"len_{fname}"] = lens
            if fc.norms:
                # boost chain in float32, C association order:
                # fi.boost * doc_boost * df_boost(1) * length_norm
                # (c/src/index.c:5676-5681)
                ln = np.zeros(n_rows, dtype=np.float32)
                nz = lens > 0
                ln[nz] = (1.0 / np.sqrt(lens[nz].astype(np.float64))).astype(
                    np.float32
                )
                boost = (F32(fc.boost) * doc_boosts) * ln
                docs_cols[f"norm_{fname}"] = encode_norms(boost)

        if "content" in table.column_names:
            docs_cols["content_sha256"] = [
                hashlib.sha256((t or "").encode()).hexdigest()
                for t in table.column("content").to_pylist()
            ]
        for c in cfg.id_columns:
            if c in table.column_names and c not in docs_cols:
                docs_cols[c] = table.column(c)

        os.makedirs(os.path.join(self.index_dir, "segments"), exist_ok=True)
        os.makedirs(os.path.join(self.index_dir, "docs"), exist_ok=True)
        seg_table = pa.table(
            {k: pa.array(v, type=SEGMENT_SCHEMA.field(k).type)
             for k, v in seg_out.items()},
            schema=SEGMENT_SCHEMA,
        )
        pq.write_table(
            seg_table,
            os.path.join(self.index_dir, seg_rel),
            compression="zstd",
        )
        pq.write_table(
            pa.table(docs_cols),
            os.path.join(self.index_dir, docs_rel),
            compression="zstd",
        )
        metrics = {
            "num_docs": n_rows,
            "num_postings": seg_table.num_rows,
            "num_tokens": total_tokens,
        }
        for fname in cfg.indexed_fields:
            col = f"len_{fname}"
            metrics[f"len_sum_{fname}"] = (
                int(docs_cols[col].sum()) if col in docs_cols else 0
            )
        write_checkpoint(
            self.index_dir, "frag", key, fp, [seg_rel, docs_rel], metrics
        )
        return {**metrics, "frag_id": frag_id, "skipped": False}
