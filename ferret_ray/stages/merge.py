"""Shard merge: bucketed map-side shuffle + per-bucket merge tasks.

The Ray analogue of SegmentMerger (c/src/index.c:5816-6159): where the
reference k-way-merges per-segment TermEnums under one mutex, we run a
classic map-side shuffle through shared storage:

  invert tasks write  segments/bucket={salt % B}/rng{r}-seg-{g}.parquet
  merge phase:        from_items(buckets) -> map_batches(BucketMerger)

Each merge task reads ONLY its bucket's files — no Ray all-to-all, no
sort: fragments of the same (shard_salt, field, term) concatenate in
``doc_base`` order (postings are doc-ordered and the salting guarantees
non-overlapping doc ranges per group, so concatenation IS the exact
merge).  This removes the sort-shuffle constant entirely and scales as
one independent task per bucket; memory per task is bounded by one
(bucket x salt-range) slice because files are grouped by their ``rng``
prefix before merging.

The vectorized core (:class:`_MergedGroups`) never turns postings into
Python objects — rows are permuted by Arrow C++ ``take`` and
group-merged by offset arithmetic over the raw Arrow buffers.  Format
v7 stores docs/freqs as int32 LIST columns (docs: absolute first id
then deltas; the serving path then decodes in parquet's C++ kernels);
segment rows store the delta values WITHOUT each row's first
(``docs_rest`` + the ``doc_first`` integer column), so re-deltaing a
merged run is one int32 scatter of per-row first deltas — no byte
splice at all.  Positions stay VInt byte streams (decoded only per
phrase query).

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
from ..state.fs import (
    fs_file_size,
    fs_listdir,
    fs_makedirs,
    join as fs_join,
    resolve_fs,
)
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
        # format v7: docs/freqs are int32 LIST columns (docs: absolute
        # first id then deltas; freqs: raw values) so the serving read
        # path decodes in parquet's C++ kernels — zero Python-side VInt
        # work on the scoring streams.  Doc ids are int32 by design,
        # matching the reference's C int docids (c/include/index.h) and
        # Lucene; an index holds < 2^31 docs (shard above that).
        # Positions stay VInt binary (decoded per phrase query only).
        ("docs_list", pa.large_list(pa.int32())),
        ("freqs_list", pa.large_list(pa.int32())),
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


def post_file_name(shard_salt: int) -> str:
    return f"shards/shard-{shard_salt:08d}-post.parquet"


# The shard is TWO row-aligned parquet files — the reference's
# .tis/.frq split (c/src/index.c TermInfosWriter vs FrqWriter):
# - the DICTIONARY file (shard_file_name): light per-term columns,
#   large row groups, term statistics on (footer stats drive range
#   pruning; a 1,280-file cold open parses ~20KB of footer per file
#   instead of ~140KB when the blob column metadata lived here too)
# - the POSTINGS file (post_file_name): the blob columns, SMALL row
#   groups (POST_RG_SIZE) and no statistics, so a range read over k
#   terms touches ~k/32 row groups of exactly the heavy bytes it needs
#   (measured: the same 256-term expansion read 1,606MB from a unified
#   1,024-row-group layout vs ~200MB split — row groups are the read
#   amplification unit for blob fetches)
POST_COLS = ("docs_list", "freqs_list", "prx_enc", "prx_lens_enc",
             "skip_enc")
POST_RG_SIZE = 32


def split_shard_table(table: pa.Table) -> tuple[pa.Table, pa.Table]:
    """(dictionary table, postings table), row-aligned."""
    dict_t = table.drop_columns(list(POST_COLS))
    post_t = table.select(list(POST_COLS))
    return dict_t, post_t


def read_shard_table(fs, root: str, rel: str) -> pa.Table:
    """The full logical shard (dictionary + blob columns) for wholesale
    consumers (LSM rebase, expunge) — reads both files and re-attaches
    the row-aligned blob columns."""
    dict_t = pq.read_table(fs_join(root, rel), filesystem=fs)
    post_rel = rel.replace(".parquet", "-post.parquet")
    post_t = pq.read_table(fs_join(root, post_rel), filesystem=fs)
    for name in POST_COLS:
        dict_t = dict_t.append_column(name, post_t.column(name))
    return dict_t


def write_shard_tables(
    table: pa.Table, fs, root: str, shard_salt: int,
    dict_rg_size: int,
) -> tuple[str, str, int]:
    """Write one logical shard as the dictionary/postings file pair;
    returns (dict rel, post rel, total bytes)."""
    dict_t, post_t = split_shard_table(table)
    rel = shard_file_name(shard_salt)
    post_rel = post_file_name(shard_salt)
    pq.write_table(
        dict_t, fs_join(root, rel), compression="zstd",
        row_group_size=dict_rg_size, filesystem=fs,
    )
    pq.write_table(
        post_t, fs_join(root, post_rel), compression="zstd",
        row_group_size=POST_RG_SIZE, filesystem=fs,
        write_statistics=False,
    )
    size = sum(
        fs_file_size(fs, fs_join(root, r))
        for r in (rel, post_rel)
    )
    return rel, post_rel, size


SHARD_STATS_SCHEMA = pa.schema(
    [
        ("salt", pa.int64()),
        ("rg", pa.int32()),
        ("rows", pa.int64()),
        ("fmin", pa.int64()),
        ("fmax", pa.int64()),
        ("tmin", pa.string()),
        ("tmax", pa.string()),
    ]
)


def _footer_stats_rows(fs, root: str, salt: int) -> dict:
    """Per-row-group (rows, field min/max, term min/max) of one shard
    file, read from its parquet footer — columns for one
    SHARD_STATS_SCHEMA slice."""
    from ..state.fs import open_parquet

    md = open_parquet(fs, fs_join(root, shard_file_name(salt))).metadata
    nrg = md.num_row_groups
    out = {
        "salt": [salt] * nrg, "rg": list(range(nrg)), "rows": [],
        "fmin": [], "fmax": [], "tmin": [], "tmax": [],
    }
    imin, imax = np.iinfo(np.int64).min, np.iinfo(np.int64).max
    for i in range(nrg):
        rg = md.row_group(i)
        out["rows"].append(rg.num_rows)
        fst = rg.column(0).statistics  # field (SHARD_SCHEMA col 0)
        tst = rg.column(1).statistics  # term  (SHARD_SCHEMA col 1)
        if fst is not None and fst.has_min_max:
            out["fmin"].append(int(fst.min))
            out["fmax"].append(int(fst.max))
        else:
            out["fmin"].append(imin)
            out["fmax"].append(imax)
        if tst is not None and tst.has_min_max:
            out["tmin"].append(tst.min)
            out["tmax"].append(tst.max)
        else:
            out["tmin"].append(None)
            out["tmax"].append(None)
    return out


class _ShardStatsTask:
    """map_batches UDF: shard salts -> SHARD_STATS_SCHEMA rows (one
    footer read per salt; distributed so a 100k-file index builds its
    sidecar in one short fan-out)."""

    def __init__(self, index_dir: str):
        self.fs, self.root = resolve_fs(index_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:
        parts = [
            _footer_stats_rows(self.fs, self.root, int(s))
            for s in batch.column("salt").to_pylist()
        ]
        cols = {
            name: sum((p[name] for p in parts), [])
            for name in SHARD_STATS_SCHEMA.names
        }
        return pa.table(cols, schema=SHARD_STATS_SCHEMA)


def write_shard_stats(
    index_dir: str, salts: list[int], concurrency: int | None = None
) -> None:
    """Write the consolidated ``shards_stats.parquet`` sidecar: one
    small file holding every shard file's per-row-group (field, term)
    min/max + row counts.  Readers load it in ONE read instead of
    parsing N-thousand footers (the .tix term-index analogue,
    c/src/index.c:2712-2770 — a sampled in-memory index over the
    on-disk dictionaries).  Deterministic: rows sorted by (salt, rg),
    derived from the (deterministic) shard files themselves."""
    fs, root = resolve_fs(index_dir)
    salts = sorted(int(s) for s in salts)
    if len(salts) > 2048:
        import ray

        ds = ray.data.from_items(
            [{"salt": s} for s in salts],
            override_num_blocks=max(1, len(salts) // 256),
        ).map_batches(
            _ShardStatsTask(index_dir),
            batch_size=256,
            batch_format="pyarrow",
            concurrency=concurrency,
        )
        t = pa.concat_tables(
            [pa.table(b, schema=SHARD_STATS_SCHEMA) if not
             isinstance(b, pa.Table) else b for b in ds.iter_batches(
                 batch_size=None, batch_format="pyarrow")]
        )
        t = t.sort_by([("salt", "ascending"), ("rg", "ascending")])
    else:
        from concurrent.futures import ThreadPoolExecutor

        nthreads = min(16, max(1, len(salts)))
        with ThreadPoolExecutor(nthreads) as ex:
            parts = list(
                ex.map(lambda s: _footer_stats_rows(fs, root, s), salts)
            )
        cols = {
            name: sum((p[name] for p in parts), [])
            for name in SHARD_STATS_SCHEMA.names
        }
        t = pa.table(cols, schema=SHARD_STATS_SCHEMA)
    pq.write_table(
        t, fs_join(root, "shards_stats.parquet"),
        compression="zstd", filesystem=fs,
    )


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


# --------------------------------------------------------------------------
# zero-object binary column machinery
# --------------------------------------------------------------------------

def _segmented_gather_idx(
    starts: np.ndarray, lens: np.ndarray, total: int
) -> np.ndarray:
    """Source indices for gathering segments [starts[k], starts[k]+
    lens[k]) back-to-back: a cumsum step function instead of
    np.repeat + np.arange (no per-byte segment-id array)."""
    if total == 0:
        return np.empty(0, dtype=np.int64)
    step = np.ones(total, dtype=np.int64)
    step[0] = starts[0]
    if starts.size > 1:
        bpos = np.cumsum(lens[:-1])
        # boundary step = jump + the default 1; add.at accumulates
        # collisions from zero-length segments (incl. leading empties)
        jumps = starts[1:] - starts[:-1] - lens[:-1]
        keep = bpos < total
        np.add.at(step, bpos[keep], jumps[keep])
    return np.cumsum(step)

def _bin_bufs(col) -> tuple[np.ndarray, np.ndarray]:
    """(offsets int64[n+1], data uint8[]) of a large_binary column."""
    arr = (
        col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    )
    if isinstance(arr, pa.ChunkedArray):  # zero-chunk edge
        arr = pa.concat_arrays(arr.chunks or [pa.array([], arr.type)])
    off_buf, data_buf = arr.buffers()[1], arr.buffers()[2]
    off = np.frombuffer(off_buf, dtype=np.int64,
                        count=len(arr) + 1, offset=arr.offset * 8)
    base = off[0]
    data = np.frombuffer(data_buf, dtype=np.uint8) if data_buf else (
        np.empty(0, dtype=np.uint8)
    )
    return off - base if base else off, data


def _list_bufs(col) -> tuple[np.ndarray, np.ndarray]:
    """(offsets int64[n+1], values int32[]) of a large_list<int32>
    column — the list twin of :func:`_bin_bufs`."""
    arr = (
        col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    )
    if isinstance(arr, pa.ChunkedArray):  # zero-chunk edge
        arr = pa.concat_arrays(arr.chunks or [pa.array([], arr.type)])
    off = np.frombuffer(arr.buffers()[1], dtype=np.int64,
                        count=len(arr) + 1, offset=arr.offset * 8)
    vals = arr.values
    v = vals.to_numpy(zero_copy_only=False)
    base = off[0]
    if base or off[-1] != v.size:
        v = v[base: off[-1]]
        off = off - base
    return off, v


def _list_col(offsets: np.ndarray, values: np.ndarray) -> pa.LargeListArray:
    """large_list<int32> from numpy offsets/values (zero-copy)."""
    return pa.LargeListArray.from_arrays(
        pa.array(np.ascontiguousarray(offsets, dtype=np.int64),
                 type=pa.int64()),
        pa.array(np.ascontiguousarray(values, dtype=np.int32),
                 type=pa.int32()),
    )


def _bin_from_group_offsets(
    byte_off: np.ndarray, data: np.ndarray, starts: np.ndarray,
    ends: np.ndarray,
) -> pa.LargeBinaryArray:
    """Build a large_binary array whose row i spans data[byte_off[starts
    [i]]:byte_off[ends[i]]] — group merge by offset arithmetic only.

    Requires the grouped rows to be contiguous (they are, post-sort)."""
    n = starts.size
    a = byte_off[starts]
    b = byte_off[ends]
    lens = b - a
    out_off = np.empty(n + 1, dtype=np.int64)
    out_off[0] = 0
    np.cumsum(lens, out=out_off[1:])
    total = int(out_off[-1])
    if total == int(byte_off[-1]) and (a[0] == 0):
        # groups cover the whole buffer contiguously -> reuse data as-is
        gathered = data[: total]
    else:
        gathered = data[_segmented_gather_idx(a, lens, total)]
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(out_off.tobytes()),
         pa.py_buffer(gathered.tobytes())],
    )


class _MergedGroups:
    """Vectorized merge of fragment rows sharing (shard_salt, field, term).

    Sorts rows by (salt, field, term, doc_base) and merges each run
    WITHOUT decoding postings: freqs/prx/prx_lens/docs-rest are
    byte-concatenated (Arrow ``take`` + offset arithmetic), and each
    row's first doc delta — absent from the stored rest-stream, its
    value lives in the ``doc_first`` column — is re-encoded as one tiny
    VInt (absolute for run leaders, delta from the previous row's
    ``doc_last`` for members) and stitched on with one Arrow
    element-wise join."""

    def __init__(self, batch: pa.Table):
        n_rows = batch.num_rows
        salts = batch.column("shard_salt").to_numpy()
        fields = batch.column("field").to_numpy()
        doc_bases = batch.column("doc_base").to_numpy()
        dfs = batch.column("df").to_numpy()
        tf_sums = batch.column("tf_sum").to_numpy()
        maxtfs = batch.column("max_tf").to_numpy()
        firsts = batch.column("doc_first").to_numpy()
        lasts = batch.column("doc_last").to_numpy()
        darr = pc.dictionary_encode(batch.column("term")).combine_chunks()
        codes = darr.indices.to_numpy().astype(np.int64)
        # dictionary codes are first-appearance order; remap to
        # lexicographic ranks so the shard dictionary sorts by term
        dict_order = pc.sort_indices(darr.dictionary).to_numpy()
        rank = np.empty(dict_order.size, dtype=np.int64)
        rank[dict_order] = np.arange(dict_order.size)
        term_codes = rank[codes]
        order = np.lexsort((doc_bases, term_codes, fields, salts))
        s_salt = salts[order]
        s_field = fields[order]
        s_code = term_codes[order]
        s_df = dfs[order]
        s_first = firsts[order]
        s_last = lasts[order]

        row_new = np.empty(n_rows, dtype=bool)
        row_new[0] = True
        row_new[1:] = (
            (s_salt[1:] != s_salt[:-1])
            | (s_field[1:] != s_field[:-1])
            | (s_code[1:] != s_code[:-1])
        )
        t_starts = np.flatnonzero(row_new)
        t_ends = np.concatenate((t_starts[1:], [n_rows]))

        # fixed columns per merged run
        self.num_runs = t_starts.size
        self.salt = s_salt[t_starts]
        self.field = s_field[t_starts]
        self.doc_base = doc_bases[order][t_starts]
        self.df = np.add.reduceat(s_df, t_starts)
        self.tf_sum = np.add.reduceat(tf_sums[order], t_starts)
        self.max_tf = np.maximum.reduceat(maxtfs[order], t_starts)
        self.doc_first = s_first[t_starts]
        self.doc_last = s_last[t_ends - 1]
        self.terms = pc.take(
            batch.column("term"), pa.array(order[t_starts])
        ).combine_chunks()
        self._t_starts = t_starts
        self._t_ends = t_ends

        # --- docs: rest values pass through like freqs -------------------
        # segment rows carry ``docs_rest`` (delta values minus each
        # row's first); the first delta of every row is computed here
        # from the doc_first/doc_last columns and scattered into the
        # merged values array — pure int32 offset arithmetic, no
        # byte-level splice at all (format v7)
        first_delta = s_first.copy()
        nonstart = ~row_new
        first_delta[nonstart] = (
            s_first[nonstart] - np.roll(s_last, 1)[nonstart]
        )
        self._first_delta = first_delta
        self._row_new = row_new
        order_arr = pa.array(order)
        dcol = batch.column("docs_rest")
        self._docs_rest_taken = pc.take(
            dcol.combine_chunks()
            if isinstance(dcol, pa.ChunkedArray) else dcol,
            order_arr,
        )
        self._docs_full: tuple | None = None

        # --- freqs: list<int32> concatenation -----------------------------
        # pc.take materializes child values contiguously in the sorted
        # row order, so the run merge is offset indexing alone
        fcol = batch.column("freqs_list")
        ftaken = pc.take(
            fcol.combine_chunks()
            if isinstance(fcol, pa.ChunkedArray) else fcol,
            order_arr,
        )
        fo, fv = _list_bufs(ftaken)
        self._freqs_vals = (fo, fv)
        self.freqs_list = _list_col(
            fo[np.append(t_starts, n_rows)], fv
        )

        # --- prx / prx_lens: byte concatenation (positions stay VInt) ----
        merged = {}
        self._gathered = {}
        for name in ("prx_enc", "prx_lens_enc"):
            col = batch.column(name)
            taken = pc.take(
                col.combine_chunks()
                if isinstance(col, pa.ChunkedArray) else col,
                order_arr,
            )
            go, gd = _bin_bufs(taken)
            merged[name] = _bin_from_group_offsets(go, gd, t_starts, t_ends)
            self._gathered[name] = (go, gd)
        self.prx_enc = merged["prx_enc"]
        self.prx_lens_enc = merged["prx_lens_enc"]
        self._docs_list_cache: pa.LargeListArray | None = None

    def _full_docs(self) -> tuple[np.ndarray, np.ndarray]:
        """(row value offsets int64[n+1], values int32) of the full
        per-row docs streams (absolute first doc, then deltas)."""
        if self._docs_full is None:
            ro, rv = _list_bufs(self._docs_rest_taken)
            n = ro.size - 1
            row_lens = (ro[1:] - ro[:-1]) + 1
            off = np.empty(n + 1, dtype=np.int64)
            off[0] = 0
            np.cumsum(row_lens, out=off[1:])
            total = int(off[-1])
            out = np.empty(total, dtype=np.int32)
            bpos = off[:-1]
            out[bpos] = self._first_delta  # docids < 2^31 by format
            mask = np.ones(total, dtype=bool)
            mask[bpos] = False
            out[mask] = rv
            self._docs_full = (off, out)
        return self._docs_full

    @property
    def docs_list(self) -> pa.LargeListArray:
        if self._docs_list_cache is None:
            off, vals = self._full_docs()
            self._docs_list_cache = _list_col(
                off[np.append(self._t_starts, off.size - 1)], vals
            )
        return self._docs_list_cache

    def run_docs_vals(self, k: int) -> np.ndarray:
        """Full delta values (first absolute) of merged run ``k``."""
        off, vals = self._full_docs()
        return vals[off[self._t_starts[k]]: off[self._t_ends[k]]]

    def run_freq_vals(self, k: int) -> np.ndarray:
        fo, fv = self._freqs_vals
        return fv[fo[self._t_starts[k]]: fo[self._t_ends[k]]]

    def run_bytes(self, name: str, k: int) -> bytes:
        go, gd = self._gathered[name]
        a = go[self._t_starts[k]]
        b = go[self._t_ends[k]]
        return gd[a:b].tobytes()

    def fragment_table(self, schema: pa.Schema) -> pa.Table:
        # rest-of-run values: leading rows contribute only their rest
        # (the run's first doc lives in doc_first), member rows
        # contribute their first delta + rest
        ro, rv = _list_bufs(self._docs_rest_taken)
        n = ro.size - 1
        member = ~self._row_new
        row_lens = (ro[1:] - ro[:-1]) + member
        off = np.empty(n + 1, dtype=np.int64)
        off[0] = 0
        np.cumsum(row_lens, out=off[1:])
        total = int(off[-1])
        out = np.empty(total, dtype=np.int32)
        bpos = off[:-1][member]
        out[bpos] = self._first_delta[member]
        mask = np.ones(total, dtype=bool)
        mask[bpos] = False
        out[mask] = rv
        docs_rest = _list_col(
            off[np.append(self._t_starts, n)], out
        )
        return pa.table(
            {
                "field": pa.array(self.field.astype(np.int32),
                                  type=pa.int32()),
                "term": self.terms,
                "shard_salt": pa.array(self.salt, type=pa.int64()),
                "doc_base": pa.array(self.doc_base, type=pa.int64()),
                "doc_first": pa.array(self.doc_first, type=pa.int64()),
                "doc_last": pa.array(self.doc_last, type=pa.int64()),
                "df": pa.array(self.df, type=pa.int64()),
                "tf_sum": pa.array(self.tf_sum, type=pa.int64()),
                "max_tf": pa.array(self.max_tf, type=pa.int64()),
                "docs_rest": docs_rest,
                "freqs_list": self.freqs_list,
                "prx_enc": self.prx_enc,
                "prx_lens_enc": self.prx_lens_enc,
            },
            schema=schema,
        )


def combine_fragment_rows(batch: pa.Table) -> pa.Table:
    """Pre-shuffle combiner: partial merge within one batch (semantically
    a no-op — the ShardWriter performs the same merge across batches)."""
    from ..stages.invert import SEGMENT_SCHEMA

    if batch.num_rows == 0:
        return batch
    mg = _MergedGroups(batch)
    if mg.num_runs == batch.num_rows:
        return batch
    return mg.fragment_table(SEGMENT_SCHEMA)


def write_bucketed_segments(
    seg_table: pa.Table, index_dir: str, tag: str, cfg
) -> list[str]:
    """Split SEGMENT_SCHEMA rows by (salt range, shuffle bucket) and write
    ``segments/bucket={b}/rng{r}-seg-{tag}.parquet`` files (the map side
    of the bucketed shuffle).  Returns the written rels."""
    num_buckets = cfg.resolved_merge_buckets
    salts = seg_table.column("shard_salt").to_numpy()
    ranges = salts // cfg.num_shards
    buckets = salts % num_buckets
    order = np.lexsort((salts, ranges, buckets))
    sorted_tbl = seg_table.take(pa.array(order))
    sb = buckets[order]
    sr = ranges[order]
    n = salts.size
    newf = np.empty(n, dtype=bool)
    if n:
        newf[0] = True
        newf[1:] = (sb[1:] != sb[:-1]) | (sr[1:] != sr[:-1])
    starts = np.flatnonzero(newf)
    ends = np.concatenate((starts[1:], [n]))
    fs, root = resolve_fs(index_dir)
    rels: list[str] = []
    made: set[str] = set()
    for s, e in zip(starts.tolist(), ends.tolist()):
        b, r = int(sb[s]), int(sr[s])
        rel = f"segments/bucket={b:04d}/rng{r:06d}-seg-{tag}.parquet"
        path = fs_join(root, rel)
        parent = fs_join(root, f"segments/bucket={b:04d}")
        if parent not in made:
            fs_makedirs(fs, parent)
            made.add(parent)
        pq.write_table(
            sorted_tbl.slice(s, e - s), path, compression="lz4",
            filesystem=fs,
        )
        rels.append(rel)
    return rels


def _strip_first_value(col) -> pa.LargeListArray:
    """Drop the FIRST value (the absolute first doc id) from every row
    of a docs list column — turns a shard row's full docs stream back
    into the segment format's rest values.  Replaces the doc-base byte
    splice of the reference's ``sm_append_postings``
    (c/src/index.c:5922-5974): with the first doc carried as an integer
    column, rebasing touches no posting values at all."""
    o, v = _list_bufs(col)
    n = o.size - 1
    starts = o[:-1] + 1
    lens = (o[1:] - o[:-1]) - 1
    out_off = np.empty(n + 1, dtype=np.int64)
    out_off[0] = 0
    np.cumsum(lens, out=out_off[1:])
    total = int(out_off[-1])
    stripped = v[_segmented_gather_idx(starts, lens, total)]
    return _list_col(out_off, stripped)


def rebase_shard_rows(
    shard_table: pa.Table,
    offset: int,
    field_map: np.ndarray,
    field_names: list[str],
    cfg,
) -> pa.Table:
    """Turn one source index's shard rows back into SEGMENT_SCHEMA
    fragment rows with every docid shifted by ``offset`` and field
    numbers remapped — the ``add_indexes``/``iw_add_readers`` doc-base +
    field-number remap (c/src/index.c:6530-6810), Ray-side.

    The docid shift touches no posting bytes: the segment format carries
    the first doc as the ``doc_first`` integer column, so only that
    column moves; the rest-stream (deltas after the first) is
    shift-invariant and passes through untouched along with freqs/prx."""
    from ..functions.dedup import crc32_batch

    doc_min = shard_table.column("doc_min").to_numpy()
    doc_max = shard_table.column("doc_max").to_numpy()
    old_fields = shard_table.column("field").to_numpy()
    new_fields = field_map[old_fields]
    new_first = doc_min + offset
    docs_rest = _strip_first_value(shard_table.column("docs_list"))
    # term_shard(field, term) = (crc32(term) ^ field_mix(field)) %
    # num_shards, batched: one column-sweep crc over the dictionary
    from .invert import field_mix

    crcs = crc32_batch(shard_table.column("term")).astype(np.int64)
    salts = ((crcs ^ field_mix(new_fields)) % cfg.num_shards) + (
        new_first // cfg.resolved_salt_doc_range
    ) * cfg.num_shards
    from .invert import SEGMENT_SCHEMA

    return pa.table(
        {
            "field": pa.array(new_fields.astype(np.int32),
                              type=pa.int32()),
            "term": shard_table.column("term"),
            "shard_salt": pa.array(salts, type=pa.int64()),
            # per-row doc_base = shifted first doc: orders same-term rows
            # from different sources/ranges correctly in the merge lexsort
            "doc_base": pa.array(new_first, type=pa.int64()),
            "doc_first": pa.array(new_first, type=pa.int64()),
            "doc_last": pa.array(doc_max + offset, type=pa.int64()),
            "df": shard_table.column("df"),
            "tf_sum": shard_table.column("tf_sum"),
            "max_tf": pa.array(
                shard_table.column("max_tf").to_numpy().astype(np.int64),
                type=pa.int64(),
            ),
            "docs_rest": docs_rest,
            "freqs_list": shard_table.column("freqs_list"),
            "prx_enc": shard_table.column("prx_enc"),
            "prx_lens_enc": shard_table.column("prx_lens_enc"),
        },
        schema=SEGMENT_SCHEMA,
    )


class BucketMerger:
    """map_batches UDF: one shuffle bucket -> all its shard files.

    Reads ``segments/bucket={b}/*.parquet`` (this bucket's slice of every
    invert task's output), merges per (salt-range, shard_salt) and writes
    one shard parquet per shard_salt — each with its own resumable
    checkpoint.  Files are processed one salt-range group at a time so a
    task's working set is one (bucket x range) slice, independent of the
    corpus size."""

    def __init__(
        self, index_dir: str, input_fp: str,
        shards_rg_size: int = 1024,
    ):
        self.index_dir = index_dir
        self.fs, self.root = resolve_fs(index_dir)
        self.input_fp = input_fp
        self.shards_rg_size = shards_rg_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        tables = [
            self._merge_bucket(int(b))
            for b in batch.column("bucket").to_pylist()
        ]
        tables = [t for t in tables if t is not None]
        if not tables:
            return _METRICS_SCHEMA.empty_table()
        return pa.concat_tables(tables)

    def _merge_bucket(self, bucket: int) -> pa.Table | None:
        bdir = fs_join(self.root, f"segments/bucket={bucket:04d}")
        names = [
            n for n in fs_listdir(self.fs, bdir)
            if n.endswith(".parquet")
        ]
        if not names:
            return None
        rows: list[pa.Table] = []
        from itertools import groupby as _groupby

        # names sort as rng{range:06d}-seg-{group:06d}: grouping by the
        # 9-char prefix batches one salt range at a time
        for _rng, grp in _groupby(names, key=lambda n: n[:9]):
            t = pa.concat_tables(
                [
                    pq.read_table(fs_join(bdir, n), filesystem=self.fs)
                    for n in grp
                ],
                promote_options="default",
            )
            if t.num_rows == 0:
                continue
            mg = _MergedGroups(t)
            salts = mg.salt
            uniq, starts = np.unique(salts, return_index=True)
            ends = np.append(starts[1:], mg.num_runs)
            for salt, i, j in zip(
                uniq.tolist(), starts.tolist(), ends.tolist()
            ):
                rows.append(self._write_shard(mg, int(salt), int(i), int(j)))
        return pa.concat_tables(rows) if rows else None

    def _write_shard(
        self, mg: "_MergedGroups", shard_salt: int, i: int, j: int
    ) -> pa.Table:
        key = f"{shard_salt:08d}"
        rel = shard_file_name(shard_salt)
        if checkpoint_done(self.index_dir, "shard", key, self.input_fp):
            from ..state.manifest import checkpoint_path, read_json

            rec = read_json(
                checkpoint_path(self.index_dir, "shard", key)
            ) or {}
            m = rec.get("metrics", {})
            return _metrics(
                shard_salt, m.get("num_terms", 0),
                m.get("num_postings", 0), 0, True,
            )

        n = j - i
        df = mg.df[i:j]
        # skip + block-max only where postings are long enough (the
        # reference likewise only writes skip data every SKIP_INTERVAL
        # docs) — batched over the whole slice, no per-term Python
        skip_col, bmax_col = _skip_blockmax_cols(mg, i, j)

        table = pa.table(
            {
                "field": pa.array(mg.field[i:j].astype(np.int32),
                                  type=pa.int32()),
                "term": mg.terms.slice(i, n),
                "df": pa.array(df, type=pa.int64()),
                "tf_sum": pa.array(mg.tf_sum[i:j], type=pa.int64()),
                "doc_min": pa.array(mg.doc_first[i:j], type=pa.int64()),
                "doc_max": pa.array(mg.doc_last[i:j], type=pa.int64()),
                "max_tf": pa.array(mg.max_tf[i:j].astype(np.int32),
                                   type=pa.int32()),
                "docs_list": mg.docs_list.slice(i, n),
                "freqs_list": mg.freqs_list.slice(i, n),
                "prx_enc": mg.prx_enc.slice(i, n),
                "prx_lens_enc": mg.prx_lens_enc.slice(i, n),
                "skip_enc": skip_col,
                "block_max_tf": bmax_col,
            },
            schema=SHARD_SCHEMA,
        )
        fs_makedirs(self.fs, fs_join(self.root, "shards"))
        # dictionary/postings file pair: large dict row groups for scan
        # + footer-stat pruning, tiny stat-less postings row groups to
        # bound blob range-read amplification (one rg ~ one .frq seek)
        rel, post_rel, size = write_shard_tables(
            table, self.fs, self.root, shard_salt, self.shards_rg_size
        )
        total_postings = int(df.sum())
        write_checkpoint(
            self.index_dir, "shard", key, self.input_fp,
            [rel, post_rel],
            {"num_terms": n, "num_postings": total_postings},
        )
        return _metrics(shard_salt, n, total_postings, size, False)


def _skip_blockmax_cols(
    mg: "_MergedGroups", i: int, j: int
) -> tuple[pa.LargeBinaryArray, pa.LargeBinaryArray]:
    """skip_enc + block_max_tf columns for runs [i, j) in ONE batch.

    Element-exact to :func:`_skip_blockmax` per run, but all qualifying
    runs (df > SKIP_INTERVAL) are read straight off the merged int32
    value arrays (v7), cumsummed segmented, and encoded with one
    `vint_encode` per column — no per-term Python."""
    df = mg.df[i:j]
    n = j - i

    def _empty_cols():
        zo = np.zeros(n + 1, dtype=np.int64)
        e = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), n,
            [None, pa.py_buffer(zo.tobytes()), pa.py_buffer(b"")],
        )
        return e, e

    sel0 = np.flatnonzero(df > SKIP_INTERVAL)  # local run indices
    if not sel0.size:
        return _empty_cols()

    # contiguous decode of ALL runs in [i, j): runs are consecutive row
    # ranges, so their concatenated streams are single buffer slices —
    # no per-byte gather indices (formerly the merge task's hot spot).
    # Segmentation happens on the decoded VALUE arrays via df cumsums.
    counts_all = df.astype(np.int64)
    m_all = int(counts_all.sum())
    seg_all = np.concatenate(([0], np.cumsum(counts_all[:-1])))
    rs = mg._t_starts[i]
    re_ = mg._t_ends[j - 1]

    go, gvals = mg._full_docs()
    deltas = gvals[go[rs]:go[re_]].astype(np.int64)
    fo, fv = mg._freqs_vals
    freqs = fv[fo[rs]:fo[re_]].astype(np.int64)
    po, pd_ = mg._gathered["prx_lens_enc"]
    dec_plens = vint_decode(pd_[po[rs]:po[re_]])

    # per-value prx lens: runs without positions (0 stored bytes)
    # contribute zeros, mirroring the scalar `plens.size == n` check
    plens = np.zeros(m_all, dtype=np.int64)
    if dec_plens.size:
        plens_blens = po[mg._t_ends[i:j]] - po[mg._t_starts[i:j]]
        has_pos = plens_blens > 0
        pos_counts = counts_all[has_pos]
        idx = (
            np.arange(int(pos_counts.sum()), dtype=np.int64)
            - np.repeat(
                np.concatenate(([0], np.cumsum(pos_counts[:-1]))),
                pos_counts,
            )
            + np.repeat(seg_all[has_pos], pos_counts)
        )
        plens[idx] = dec_plens

    # segmented cumsums over ALL runs (global cumsum minus seg prefix)
    docs_cs = np.cumsum(deltas)
    docs_abs = docs_cs - np.repeat(
        docs_cs[seg_all] - deltas[seg_all], counts_all
    )
    prx_cs = np.cumsum(plens)
    prx_cum = prx_cs - np.repeat(prx_cs[seg_all] - plens[seg_all],
                                 counts_all)

    # skip points, constructed directly per QUALIFYING segment (indices
    # into the all-runs value arrays)
    counts = counts_all[sel0]
    seg_starts_sel = seg_all[sel0]
    pts_per_seg = counts // SKIP_INTERVAL  # >= 1 (df > SKIP_INTERVAL)
    pt_starts = np.concatenate(([0], np.cumsum(pts_per_seg[:-1])))
    tot_pts = int(pts_per_seg.sum())
    within = (
        np.arange(tot_pts, dtype=np.int64)
        - np.repeat(pt_starts, pts_per_seg)
    )
    pts = (
        np.repeat(seg_starts_sel, pts_per_seg)
        + (within + 1) * SKIP_INTERVAL - 1
    )

    def _seg_diff(vals_at_pts):
        out = vals_at_pts.copy()
        out[1:] -= vals_at_pts[:-1]
        out[pt_starts] = vals_at_pts[pt_starts]  # first pt diffs vs 0
        return out

    # v7 skip entries are (docΔ, prx byteΔ) pairs every 16 docs: the
    # freq-stream byte offset of the unified format is meaningless for
    # list storage (a block's value offset is just 16·k), while prx
    # remains a VInt byte stream and keeps its skip component
    sd = _seg_diff(docs_abs[pts])
    sp = _seg_diff(prx_cum[pts])
    tri = np.empty(pts.size * 2, dtype=np.int64)
    tri[0::2], tri[1::2] = sd, sp
    tri_buf = vint_encode(tri)
    tri_lens = vint_byte_len(tri)
    skip_lens_sel = np.add.reduceat(tri_lens, pt_starts * 2)

    # block maxima: gather the qualifying runs' freqs into one compact
    # array (value-level, one fancy-index) so consecutive reduceat
    # blocks stay within their segment, then one reduceat at all
    # 16-aligned block starts
    m_sel = int(counts.sum())
    sel_exc = np.concatenate(([0], np.cumsum(counts[:-1])))
    gidx = (
        np.arange(m_sel, dtype=np.int64)
        - np.repeat(sel_exc, counts)
        + np.repeat(seg_starts_sel, counts)
    )
    freqs_sel = freqs[gidx]
    blocks_per_seg = (counts + SKIP_INTERVAL - 1) // SKIP_INTERVAL
    nb = int(blocks_per_seg.sum())
    blk_starts = (
        np.arange(nb, dtype=np.int64)
        - np.repeat(
            np.concatenate(([0], np.cumsum(blocks_per_seg[:-1]))),
            blocks_per_seg,
        )
    ) * SKIP_INTERVAL + np.repeat(sel_exc, blocks_per_seg)
    bmax = np.maximum.reduceat(freqs_sel, blk_starts)
    bmax_buf = vint_encode(bmax)
    bmax_lens = vint_byte_len(bmax)
    bmax_seg_starts = np.concatenate(([0],
                                      np.cumsum(blocks_per_seg[:-1])))
    bmax_lens_sel = np.add.reduceat(bmax_lens, bmax_seg_starts)

    def _col(buf: bytes, lens_sel: np.ndarray) -> pa.LargeBinaryArray:
        lens_full = np.zeros(n, dtype=np.int64)
        lens_full[sel0] = lens_sel
        off = np.empty(n + 1, dtype=np.int64)
        off[0] = 0
        np.cumsum(lens_full, out=off[1:])
        return pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), n,
            [None, pa.py_buffer(off.tobytes()), pa.py_buffer(buf)],
        )

    return _col(tri_buf, skip_lens_sel), _col(bmax_buf, bmax_lens_sel)


def _skip_blockmax(
    docs: np.ndarray,
    freqs: np.ndarray,
    prx_lens_enc: bytes,
) -> tuple[bytes, bytes]:
    """Ferret-style skip entries every 16 docs + per-block max tf
    (c/src/index.c:5275-5327; block-max is our WAND addition).  Under
    format v7 an entry is the (docΔ, prx byteΔ) pair — the freq-stream
    byte component of the reference's triple has no meaning for the
    int32-list docs/freqs storage, whose block offsets are just 16·k."""
    n = docs.size
    plens = vint_decode(prx_lens_enc)
    prx_cum = np.cumsum(plens) if plens.size == n else np.zeros(n, np.int64)
    pts = np.arange(SKIP_INTERVAL - 1, n, SKIP_INTERVAL)
    sd = np.diff(np.concatenate(([0], docs[pts])))
    sp = np.diff(np.concatenate(([0], prx_cum[pts])))
    tri = np.empty(pts.size * 2, dtype=np.int64)
    tri[0::2], tri[1::2] = sd, sp
    nblocks = (n + SKIP_INTERVAL - 1) // SKIP_INTERVAL
    pad = nblocks * SKIP_INTERVAL - n
    fpad = np.concatenate([freqs, np.zeros(pad, dtype=np.int64)])
    bmax = fpad.reshape(nblocks, SKIP_INTERVAL).max(axis=1)
    return vint_encode(tri), vint_encode(bmax)
