"""Shard merge: bucketed map-side shuffle + per-bucket merge tasks.

The Ray analogue of SegmentMerger (c/src/index.c:5816-6159): where the
reference k-way-merges per-segment TermEnums under one mutex, we run a
classic map-side shuffle through shared storage:

  invert tasks write  segments/bucket={b}/seg-{g}.parquet
                      (one file per touched bucket; row groups aligned
                      to salt-range slices, band recoverable from
                      shard_salt row-group stats)
  merge phase:        from_items(shards) -> map_batches(ShardMerger)

Each merge task reads ONLY its bucket's files — no Ray all-to-all, no
sort: fragments of the same (shard_salt, field, term) concatenate in
``doc_base`` order (postings are doc-ordered and the salting guarantees
non-overlapping doc ranges per group, so concatenation IS the exact
merge).  This removes the sort-shuffle constant entirely and scales as
one independent task per bucket; memory per task is bounded by one
(bucket x salt-range) slice because a band reads only its own row
groups of each file.

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


def shard_file_name(shard_id: int) -> str:
    """Dictionary file of one term-hash shard (format v8: ONE file per
    hash shard; doc bands are row-group RUNS inside it, ascending)."""
    return f"shards/shard-{shard_id:08d}.parquet"


def post_file_name(shard_id: int) -> str:
    return f"shards/shard-{shard_id:08d}-post.parquet"


def bucket_of(salts: np.ndarray, num_shards: int, num_buckets: int):
    """Segment shuffle bucket of each shard_salt.

    Format v8 keys buckets by (hash shard, band-group) —
    ``shard * K + band % K`` with ``K = max(1, B // S)`` — so ALL of a
    hash shard's segments land in its own contiguous K bucket dirs and
    one merge task can stream the shard's bands into a single shard
    file pair.  (v7's ``salt % B`` interleaved shards across buckets,
    forcing one FILE per salt — the per-file footer/open cost made a
    cold wide expansion touch thousands of files.)"""
    k = max(1, num_buckets // num_shards)
    return (salts % num_shards) * k + (salts // num_shards) % k


def band_buckets_of_shard(
    shard_id: int, num_shards: int, num_buckets: int
) -> range:
    """The contiguous bucket-dir range owned by one hash shard."""
    k = max(1, num_buckets // num_shards)
    return range(shard_id * k, (shard_id + 1) * k)


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


def _file_band_spans(
    fs, root: str, shard_id: int, num_shards: int, salt_doc_range: int
) -> list[tuple[int, int, int, int]]:
    """Per band of one shard file, ascending:
    ``(salt, row_start, row_count, dict_rg_start)``.

    Derived purely from the dictionary file's footer: each dict row
    group holds rows of exactly ONE band (the writer flushes groups at
    band boundaries), so the group's ``doc_min`` column statistics pin
    its band — ``salt = (doc_min.min // salt_doc_range) * num_shards +
    shard_id``.  No sidecar or extra metadata file needed."""
    from ..state.fs import open_parquet

    md = open_parquet(fs, fs_join(root, shard_file_name(shard_id))).metadata
    # the dict file drops POST_COLS but keeps column order otherwise
    dict_names = [n for n in SHARD_SCHEMA.names if n not in POST_COLS]
    dmin_ci = dict_names.index("doc_min")
    spans: list[tuple[int, int, int, int]] = []
    row = 0
    for i in range(md.num_row_groups):
        rg = md.row_group(i)
        st = rg.column(dmin_ci).statistics
        if st is None or not st.has_min_max:
            raise ValueError(
                f"shard {shard_id}: dict row group {i} lacks doc_min "
                "stats (format v8 requires them for band spans)"
            )
        salt = (int(st.min) // salt_doc_range) * num_shards + shard_id
        if spans and salt < spans[-1][0]:
            # monotonic clamp: an expunged index's renumbered docids can
            # dip below a band boundary mid-file; bands were WRITTEN
            # ascending, so never regress (adjacent bands may merge —
            # safe: doc ranges stay disjoint and ascending)
            salt = spans[-1][0]
        if spans and spans[-1][0] == salt:
            s, rs, rc, rgs = spans[-1]
            spans[-1] = (s, rs, rc + rg.num_rows, rgs)
        else:
            spans.append((salt, row, rg.num_rows, i))
        row += rg.num_rows
    return spans


def iter_shard_bands(
    fs, root: str, shard_id: int, num_shards: int, salt_doc_range: int
):
    """Yield ``(salt, logical shard table)`` per doc band of one shard
    file, ascending — the wholesale consumer path (LSM rebase, expunge,
    browser).  Reads one band at a time so a task's working set is one
    band, independent of the shard file's total size."""
    from ..state.fs import open_parquet

    spans = _file_band_spans(fs, root, shard_id, num_shards,
                             salt_doc_range)
    dict_pf = open_parquet(fs, fs_join(root, shard_file_name(shard_id)))
    post_pf = open_parquet(fs, fs_join(root, post_file_name(shard_id)))
    post_rg_base = 0
    for salt, _row_start, rows, rg_start in spans:
        nrg = 0
        got = 0
        while got < rows:
            got += dict_pf.metadata.row_group(rg_start + nrg).num_rows
            nrg += 1
        dict_t = dict_pf.read_row_groups(
            list(range(rg_start, rg_start + nrg))
        )
        n_post_rg = (rows + POST_RG_SIZE - 1) // POST_RG_SIZE
        post_t = post_pf.read_row_groups(
            list(range(post_rg_base, post_rg_base + n_post_rg))
        )
        post_rg_base += n_post_rg
        for name in POST_COLS:
            dict_t = dict_t.append_column(name, post_t.column(name))
        yield salt, dict_t


def read_shard_table(
    fs, root: str, shard_id: int, num_shards: int, salt_doc_range: int
) -> pa.Table:
    """The full logical shard file (all bands, dictionary + blob
    columns re-attached) — small-index/wholesale convenience."""
    parts = [
        t for _salt, t in iter_shard_bands(
            fs, root, shard_id, num_shards, salt_doc_range
        )
    ]
    return pa.concat_tables(parts)


class ShardFileWriter:
    """Streams one hash shard's doc bands (ascending) into the
    dictionary/postings parquet file pair.  Each band is appended as
    its own run of row groups — row groups never span bands, which is
    what lets readers derive band spans from footer stats alone."""

    def __init__(self, fs, root: str, shard_id: int, dict_rg_size: int):
        self.fs, self.root = fs, root
        self.rel = shard_file_name(shard_id)
        self.post_rel = post_file_name(shard_id)
        self.dict_rg_size = dict_rg_size
        self._w = None
        self._pw = None
        self.salts: list[int] = []
        self.rows: list[int] = []

    def append_band(self, salt: int, table: pa.Table) -> None:
        dict_t, post_t = split_shard_table(table)
        if self._w is None:
            # use_dictionary=False on both files: the term column is
            # all-unique (sorted dictionary) and the posting blobs are
            # high-entropy binary — parquet dictionary encoding is pure
            # hash/copy overhead for them (measured ~25% of the write
            # wall AND slightly larger files)
            self._w = pq.ParquetWriter(
                fs_join(self.root, self.rel), dict_t.schema,
                compression="zstd", use_dictionary=False,
                filesystem=self.fs,
            )
            self._pw = pq.ParquetWriter(
                fs_join(self.root, self.post_rel), post_t.schema,
                compression="zstd", write_statistics=False,
                use_dictionary=False, filesystem=self.fs,
            )
        self._w.write_table(dict_t, row_group_size=self.dict_rg_size)
        self._pw.write_table(post_t, row_group_size=POST_RG_SIZE)
        self.salts.append(int(salt))
        self.rows.append(table.num_rows)

    def close(self) -> tuple[str, str, int]:
        """Finish both files; returns (dict rel, post rel, bytes)."""
        if self._w is None:
            return self.rel, self.post_rel, 0
        self._w.close()
        self._pw.close()
        size = sum(
            fs_file_size(self.fs, fs_join(self.root, r))
            for r in (self.rel, self.post_rel)
        )
        return self.rel, self.post_rel, size


def write_shard_tables(
    table: pa.Table, fs, root: str, shard_salt: int,
    dict_rg_size: int, num_shards: int | None = None,
) -> tuple[str, str, int]:
    """Write ONE band as a complete shard file pair (single-band
    convenience for tests/tools; ``shard_salt`` maps to its file by
    ``% num_shards`` when given, else is used as the file id)."""
    sid = shard_salt % num_shards if num_shards else shard_salt
    w = ShardFileWriter(fs, root, sid, dict_rg_size)
    w.append_band(shard_salt, table)
    return w.close()


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


def _footer_stats_rows(
    fs, root: str, shard_id: int, num_shards: int, salt_doc_range: int
) -> dict:
    """Per-row-group (rows, field min/max, term min/max) of one shard
    FILE, split into its doc bands — SHARD_STATS_SCHEMA columns with
    the ``rg`` index LOCAL to each band's salt (the per-band _Shard
    view addresses row groups locally; its file-global base derives
    from the ascending salt order within the file)."""
    from ..state.fs import open_parquet

    md = open_parquet(
        fs, fs_join(root, shard_file_name(shard_id))
    ).metadata
    dict_names = [n for n in SHARD_SCHEMA.names if n not in POST_COLS]
    dmin_ci = dict_names.index("doc_min")
    nrg = md.num_row_groups
    out = {
        "salt": [], "rg": [], "rows": [],
        "fmin": [], "fmax": [], "tmin": [], "tmax": [],
    }
    imin, imax = np.iinfo(np.int64).min, np.iinfo(np.int64).max
    cur_salt, local = None, 0
    for i in range(nrg):
        rg = md.row_group(i)
        dst = rg.column(dmin_ci).statistics
        if dst is None or not dst.has_min_max:
            raise ValueError(
                f"shard {shard_id}: dict row group {i} lacks doc_min "
                "stats (format v8 requires them for band spans)"
            )
        salt = (
            int(dst.min) // salt_doc_range
        ) * num_shards + shard_id
        if cur_salt is not None and salt < cur_salt:
            # monotonic clamp — see _file_band_spans: expunged indexes'
            # renumbered docids may dip below a band boundary mid-file
            salt = cur_salt
        if salt != cur_salt:
            cur_salt, local = salt, 0
        out["salt"].append(salt)
        out["rg"].append(local)
        local += 1
        out["rows"].append(rg.num_rows)
        fst = rg.column(0).statistics  # field (dict col 0)
        tst = rg.column(1).statistics  # term  (dict col 1)
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
    """map_batches UDF: shard FILE ids -> SHARD_STATS_SCHEMA rows (one
    footer read per file; distributed so a 100k-file index builds its
    sidecar in one short fan-out)."""

    def __init__(self, index_dir: str, num_shards: int,
                 salt_doc_range: int):
        self.fs, self.root = resolve_fs(index_dir)
        self.num_shards = num_shards
        self.salt_doc_range = salt_doc_range

    def __call__(self, batch: pa.Table) -> pa.Table:
        parts = [
            _footer_stats_rows(self.fs, self.root, int(s),
                               self.num_shards, self.salt_doc_range)
            for s in batch.column("shard").to_pylist()
        ]
        cols = {
            name: sum((p[name] for p in parts), [])
            for name in SHARD_STATS_SCHEMA.names
        }
        return pa.table(cols, schema=SHARD_STATS_SCHEMA)


def write_shard_stats(
    index_dir: str, salts: list[int], num_shards: int,
    salt_doc_range: int, concurrency: int | None = None,
) -> None:
    """Write the consolidated ``shards_stats.parquet`` sidecar: one
    small file holding every shard file's per-row-group (field, term)
    min/max + row counts, split per doc band.  Readers load it in ONE
    read instead of parsing per-file footers (the .tix term-index
    analogue, c/src/index.c:2712-2770 — a sampled in-memory index over
    the on-disk dictionaries).  Deterministic: rows sorted by
    (salt, rg), derived from the (deterministic) shard files."""
    fs, root = resolve_fs(index_dir)
    shard_ids = sorted({int(s) % num_shards for s in salts})
    if len(shard_ids) > 2048:
        import ray

        ds = ray.data.from_items(
            [{"shard": s} for s in shard_ids],
            override_num_blocks=max(1, len(shard_ids) // 256),
        ).map_batches(
            _ShardStatsTask(index_dir, num_shards, salt_doc_range),
            batch_size=256,
            batch_format="pyarrow",
            concurrency=concurrency,
        )
        t = pa.concat_tables(
            [pa.table(b, schema=SHARD_STATS_SCHEMA) if not
             isinstance(b, pa.Table) else b for b in ds.iter_batches(
                 batch_size=None, batch_format="pyarrow")]
        )
    else:
        from concurrent.futures import ThreadPoolExecutor

        nthreads = min(16, max(1, len(shard_ids)))
        with ThreadPoolExecutor(nthreads) as ex:
            parts = list(
                ex.map(
                    lambda s: _footer_stats_rows(
                        fs, root, s, num_shards, salt_doc_range
                    ),
                    shard_ids,
                )
            )
        cols = {
            name: sum((p[name] for p in parts), [])
            for name in SHARD_STATS_SCHEMA.names
        }
        t = pa.table(cols, schema=SHARD_STATS_SCHEMA)
    t = t.sort_by([("salt", "ascending"), ("rg", "ascending")])
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
    one ``segments/bucket={b}/seg-{tag}.parquet`` file per touched
    bucket, row groups aligned to salt-range slices (the map side of
    the bucketed shuffle).  Returns the written rels."""
    num_buckets = cfg.resolved_merge_buckets
    salts = seg_table.column("shard_salt").to_numpy()
    ranges = salts // cfg.num_shards
    buckets = bucket_of(salts, cfg.num_shards, num_buckets)
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
    # ONE file per touched bucket, with row groups aligned to (salt
    # range) slices: the merge side recovers each row group's band from
    # its shard_salt footer stats (band = salt // num_shards), so this
    # replaces the old one-file-per-(bucket, band) layout — measured
    # ~1ms of writer setup per file, x256 files per invert task at
    # sf0.1 it was ~15% of the whole task
    writer = None
    cur_bucket = -1
    for s, e in zip(starts.tolist(), ends.tolist()):
        b = int(sb[s])
        if b != cur_bucket:
            if writer is not None:
                writer.close()
            rel = f"segments/bucket={b:04d}/seg-{tag}.parquet"
            parent = fs_join(root, f"segments/bucket={b:04d}")
            fs_makedirs(fs, parent)
            writer = pq.ParquetWriter(
                fs_join(root, rel), sorted_tbl.schema,
                compression="lz4", filesystem=fs,
            )
            rels.append(rel)
            cur_bucket = b
        # one write_table call per band slice -> its own row group(s)
        writer.write_table(sorted_tbl.slice(s, e - s))
    if writer is not None:
        writer.close()
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


class ShardMerger:
    """map_batches UDF: one HASH SHARD -> its single shard file pair.

    Format v8: reads the shard's contiguous bucket-dir range
    (``segments/bucket={shard*K .. shard*K+K-1}``), merges one doc band
    (salt range) at a time in ascending band order, and streams each
    band's merged rows into ONE dictionary/postings parquet pair as
    its own run of row groups.  A task's working set stays one band's
    slice (independent of corpus size), while readers get O(num_shards)
    files instead of O(num_shards x bands) — the per-file footer/open
    cost was the cold wide-expansion tail (VERDICT r4 #3: 2,560 files
    at 20M docs cost ~29 s first-touch; v8 keeps it at 2 files per
    hash shard)."""

    def __init__(
        self, index_dir: str, input_fp: str,
        shards_rg_size: int = 1024,
        num_shards: int = 0, num_buckets: int = 0,
        gc_segments: bool = False,
    ):
        self.index_dir = index_dir
        self.fs, self.root = resolve_fs(index_dir)
        self.input_fp = input_fp
        self.shards_rg_size = shards_rg_size
        self.num_shards = num_shards
        self.num_buckets = num_buckets
        self.gc_segments = gc_segments

    def _gc_shard_segments(self, shard: int) -> None:
        """Release this shard's segment bucket dirs (exclusively owned:
        bucket_of keys dirs shard*K..shard*K+K-1) once the shard's
        checkpoint + output files are durable.

        A segGC marker is written (atomic) BEFORE each dir is deleted so
        invert fragment checkpoints still verify on resume: a missing
        segment output whose bucket carries a marker counts as done
        (state/manifest.py:_gc_covers) — a mid-merge kill therefore
        resumes without re-inverting anything.  The one path that NEEDS
        the deleted bytes back — a shard output lost after its segments
        were GC'd — is repaired by the driver pre-merge
        (build.py:_repair_gc_orphans drops the markers, forcing a
        byte-identical re-invert).  Missing dirs are ignored."""
        from ..state.fs import fs_rmtree
        from ..state.manifest import atomic_write_json, seg_gc_marker_path

        for b in band_buckets_of_shard(
            shard, self.num_shards, self.num_buckets
        ):
            atomic_write_json(
                seg_gc_marker_path(self.index_dir, b),
                {"fingerprint": self.input_fp, "shard": shard},
            )
            fs_rmtree(self.fs, fs_join(self.root, f"segments/bucket={b:04d}"))

    def __call__(self, batch: pa.Table) -> pa.Table:
        tables = [
            self._merge_shard(int(s))
            for s in batch.column("shard").to_pylist()
        ]
        tables = [t for t in tables if t is not None]
        if not tables:
            return _METRICS_SCHEMA.empty_table()
        return pa.concat_tables(tables)

    def _merge_shard(self, shard: int) -> pa.Table | None:
        key = f"{shard:08d}"
        if checkpoint_done(self.index_dir, "shard", key, self.input_fp):
            from ..state.manifest import checkpoint_path, read_json

            if self.gc_segments:
                # resume after a kill between checkpoint and GC
                self._gc_shard_segments(shard)
            rec = read_json(
                checkpoint_path(self.index_dir, "shard", key)
            ) or {}
            m = rec.get("metrics", {})
            rows = [
                _metrics(int(s), int(nt), int(np_), 0, True)
                for s, nt, np_ in zip(
                    m.get("salts", ()), m.get("num_terms", ()),
                    m.get("num_postings", ()),
                )
            ]
            return pa.concat_tables(rows) if rows else None

        # (band -> [sources]) across this shard's bucket dirs.  Two
        # source shapes: consolidated per-bucket files (``seg-{tag}``,
        # one row-group run per band, band recovered from shard_salt
        # row-group stats) and the legacy per-band files
        # (``rng{range:06d}-seg-{tag}``, band in the name) so a build
        # checkpointed under the old layout still resumes.  Footers are
        # read ONCE here and the file is closed immediately (sources
        # carry (path, row-group ids)); the band loop reopens each file
        # for just its slice — fds stay bounded by one band's sources,
        # not the whole shard's file count.
        from ..state.fs import open_parquet

        by_band: dict[int, list] = {}
        for b in band_buckets_of_shard(
            shard, self.num_shards, self.num_buckets
        ):
            bdir = fs_join(self.root, f"segments/bucket={b:04d}")
            names = [
                n for n in fs_listdir(self.fs, bdir)
                if n.endswith(".parquet")
            ]
            # If a fragment was re-inverted after a layout upgrade, the
            # re-run wrote seg-{tag}.parquet but any stale in-flight
            # legacy rng*-seg-{tag}.parquet files (same tag, never
            # checkpointed) survive with different names — merging both
            # would duplicate the fragment's postings.  The new file is
            # authoritative: skip legacy files whose tag it covers.
            new_tags = {
                n[len("seg-"):-len(".parquet")]
                for n in names if n.startswith("seg-")
            }
            for n in names:
                path = fs_join(bdir, n)
                if n.startswith("rng"):
                    tag = n.split("-seg-", 1)[1][:-len(".parquet")]
                    if tag in new_tags:
                        continue
                    by_band.setdefault(int(n[3:9]), []).append(
                        ("file", path)
                    )
                    continue
                pf = open_parquet(self.fs, path)
                try:
                    md = pf.metadata
                    salt_leaf = next(
                        j for j in range(len(md.schema))
                        if md.schema.column(j).path == "shard_salt"
                    )
                    rg_bands: dict[int, list[int]] = {}
                    for i in range(md.num_row_groups):
                        st = md.row_group(i).column(
                            salt_leaf
                        ).statistics
                        band = int(st.min) // self.num_shards
                        if int(st.max) // self.num_shards != band:
                            raise ValueError(
                                f"segment file {n} row group {i} "
                                f"spans bands"
                            )
                        rg_bands.setdefault(band, []).append(i)
                finally:
                    pf.close()
                for band, rgs in rg_bands.items():
                    by_band.setdefault(band, []).append(
                        ("rgs", path, rgs)
                    )
        if not by_band:
            if self.gc_segments:
                from ..state.manifest import read_json, seg_gc_marker_path

                first = next(iter(band_buckets_of_shard(
                    shard, self.num_shards, self.num_buckets
                )), None)
                if first is not None and read_json(
                    seg_gc_marker_path(self.index_dir, first)
                ) is not None:
                    raise RuntimeError(
                        f"shard {shard}: segments were GC'd but no merge "
                        f"checkpoint survives — run build_index (its "
                        f"_repair_gc_orphans pass re-inverts) instead of "
                        f"calling ShardMerger directly"
                    )
            return None
        fs_makedirs(self.fs, fs_join(self.root, "shards"))
        writer = ShardFileWriter(
            self.fs, self.root, shard, self.shards_rg_size
        )
        out_rows: list[pa.Table] = []
        salts_w: list[int] = []
        terms_w: list[int] = []
        posts_w: list[int] = []
        def _read_source(src) -> pa.Table:
            if src[0] == "file":
                return pq.read_table(src[1], filesystem=self.fs)
            pf = open_parquet(self.fs, src[1])
            try:
                return pf.read_row_groups(src[2])
            finally:
                pf.close()

        for band in sorted(by_band):
            t = pa.concat_tables(
                [_read_source(src) for src in by_band[band]],
                promote_options="default",
            )
            if t.num_rows == 0:
                continue
            mg = _MergedGroups(t)
            salts = mg.salt
            uniq = np.unique(salts)
            if uniq.size != 1 or int(uniq[0]) % self.num_shards != shard:
                raise ValueError(
                    f"bucket mix-up: salts {uniq} in shard {shard}"
                )
            salt = int(uniq[0])
            writer.append_band(
                salt, self._band_table(mg, 0, mg.num_runs)
            )
            salts_w.append(salt)
            terms_w.append(mg.num_runs)
            posts_w.append(int(mg.df.sum()))
        rel, post_rel, size = writer.close()
        if not salts_w:
            return None
        write_checkpoint(
            self.index_dir, "shard", key, self.input_fp,
            [rel, post_rel],
            {"salts": salts_w, "num_terms": terms_w,
             "num_postings": posts_w},
        )
        if self.gc_segments:
            self._gc_shard_segments(shard)
        for k, (salt, nt, np_) in enumerate(
            zip(salts_w, terms_w, posts_w)
        ):
            # file bytes attributed to the first band's row: per-salt
            # byte split isn't tracked, sums stay exact
            out_rows.append(
                _metrics(salt, nt, np_, size if k == 0 else 0, False)
            )
        return pa.concat_tables(out_rows)

    def _band_table(
        self, mg: "_MergedGroups", i: int, j: int
    ) -> pa.Table:
        n = j - i
        df = mg.df[i:j]
        # skip + block-max only where postings are long enough (the
        # reference likewise only writes skip data every SKIP_INTERVAL
        # docs) — batched over the whole slice, no per-term Python
        skip_col, bmax_col = _skip_blockmax_cols(mg, i, j)
        return pa.table(
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
