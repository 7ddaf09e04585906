"""Deduplication operators for large-scale training-data pipelines.

All operators are expressed Ray-Data-first: vectorized ``map_batches``
stages for per-doc signatures, a single hash-partitioned ``groupby`` for
the wide step, and driver-side work only on data that is provably small
(candidate pairs / group representatives).

* exact_dedup       — sha1(text) -> groupby(hash).min(id): the classic
  hash-partition + per-group-first (the reference's upsert-by-key dedup,
  c/src/ind.c:202-258, generalized to content identity).
* minhash_lsh_dedup — shingle -> minhash (vectorized universal hashing) ->
  band buckets -> bucket groupby -> candidate pairs -> exact Jaccard
  verify -> union-find representatives.
* simhash_dedup     — 64-bit simhash + 4x16-bit band blocking for
  near-dup candidates at small Hamming distance.
* ngram_jaccard     — the verify kernel (token n-gram Jaccard).
"""

from __future__ import annotations

import re
from typing import Iterable

import numpy as np

_TOKEN_RE = re.compile(r"[a-z0-9]+")

_M61 = (1 << 61) - 1


def _tokens(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


def _shingle_hashes(tokens: list[str], k: int = 3) -> np.ndarray:
    """Stable 64-bit hashes of token k-grams (scalar reference kernel;
    the batch stages use the bit-identical vectorized path below)."""
    if len(tokens) < k:
        grams = [" ".join(tokens)] if tokens else []
    else:
        grams = [" ".join(tokens[i: i + k]) for i in range(len(tokens) - k + 1)]
    import zlib

    out = np.empty(max(len(grams), 1), dtype=np.uint64)
    if not grams:
        out[0] = 0
        return out
    for i, g in enumerate(grams):
        b = g.encode()
        out[i] = (zlib.crc32(b) << 32) | zlib.crc32(b[::-1])
    return out


# --------------------------------------------------------------------------
# vectorized signature kernels (the textstats recipe: one Arrow split per
# column, numpy segment reductions, zero per-row string work)
# --------------------------------------------------------------------------

def _crc32_table() -> np.ndarray:
    poly = np.uint32(0xEDB88320)
    t = np.arange(256, dtype=np.uint32)
    for _ in range(8):
        t = np.where(t & 1, (t >> np.uint32(1)) ^ poly,
                     t >> np.uint32(1))
    return t


_CRC32_TABLE = _crc32_table()


def _string_matrix(arr) -> tuple[np.ndarray, np.ndarray]:
    """(G, L) uint8 padded byte matrix + per-row byte lengths of an
    Arrow string array — one gather, no per-row Python."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset: arr.offset + len(arr) + 1
    ]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lens = np.diff(off)
    L = int(lens.max()) if lens.size else 0
    idx = off[:-1, None] + np.arange(max(L, 1), dtype=np.int32)[None, :]
    np.clip(idx, 0, max(data.size - 1, 0), out=idx)
    mat = data[idx] if data.size else np.zeros(
        (len(arr), max(L, 1)), dtype=np.uint8
    )
    return mat, lens.astype(np.int64)


def _crc32_cols(
    mat: np.ndarray,
    lens_desc: np.ndarray,
    init: np.ndarray | None = None,
) -> np.ndarray:
    """Exact zlib.crc32 of each row, column-at-a-time.  Rows MUST be
    sorted by length descending: the active set for byte j is then a
    contiguous prefix, so every step is slice arithmetic (no boolean
    gathers).  ``init`` gives per-row starting values, matching
    ``zlib.crc32(b, init[i])`` (zlib xors the start value with ~0
    before processing)."""
    n, L = mat.shape
    if init is None:
        crc = np.full(n, 0xFFFFFFFF, dtype=np.uint32)
    else:
        crc = init.astype(np.uint32) ^ np.uint32(0xFFFFFFFF)
    tbl = _CRC32_TABLE
    # rows with len > j, per column (lens sorted descending)
    cnt = np.searchsorted(-lens_desc, -np.arange(1, L + 1),
                          side="right")
    for j in range(L):
        c = cnt[j]
        if c == 0:
            break
        head = crc[:c]
        crc[:c] = (head >> np.uint32(8)) ^ tbl[
            (head ^ mat[:c, j]) & np.uint32(0xFF)
        ]
    return crc ^ np.uint32(0xFFFFFFFF)


def crc32_batch(arr, init: np.ndarray | None = None) -> np.ndarray:
    """Vectorized ``zlib.crc32(s.encode(), init[i])`` over an Arrow
    string array — the invert/rebase term-shard hash kernel.

    Processed in chunks: the padded matrix is (rows x longest-string),
    so one pathological term would otherwise scale EVERY row's memory;
    chunking bounds the working set to chunk_rows x its own max length.
    """
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    out = np.empty(n, dtype=np.uint32)
    chunk = 65536
    for a in range(0, n, chunk):
        b = min(a + chunk, n)
        mat, lens = _string_matrix(arr.slice(a, b - a))
        order = np.argsort(-lens, kind="stable")
        sub_init = None if init is None else init[a:b][order]
        crc = _crc32_cols(
            np.ascontiguousarray(mat[order]), lens[order], sub_init
        )
        res = np.empty(b - a, dtype=np.uint32)
        res[order] = crc
        out[a:b] = res
    return out


def _hash64_batch(arr) -> np.ndarray:
    """Vectorized ``(crc32(b) << 32) | crc32(b[::-1])`` per string —
    bit-identical to the scalar kernels (tokens/grams are ASCII, so the
    codepoint reversal in the scalar path IS the byte reversal)."""
    mat, lens = _string_matrix(arr)
    order = np.argsort(-lens, kind="stable")
    mat = np.ascontiguousarray(mat[order])
    lens_d = lens[order]
    fwd = _crc32_cols(mat, lens_d).astype(np.uint64)
    ridx = (
        lens_d[:, None].astype(np.int32)
        - 1
        - np.arange(mat.shape[1], dtype=np.int32)[None, :]
    )
    np.clip(ridx, 0, None, out=ridx)
    rmat = np.take_along_axis(mat, ridx, axis=1)
    rev = _crc32_cols(rmat, lens_d).astype(np.uint64)
    out = np.empty(len(lens), dtype=np.uint64)
    out[order] = (fwd << np.uint64(32)) | rev
    return out


def _flat_tokens_np(texts):
    """One Arrow RE2 split of lower(text) -> (flat StringArray, seg ids,
    per-doc counts) — identical to ``_TOKEN_RE.findall`` per doc."""
    import pyarrow as pa
    import pyarrow.compute as pc

    lo = pc.utf8_lower(texts)
    lists = pc.split_pattern_regex(lo, "[^a-z0-9]+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    off = lists.offsets.to_numpy()
    seg = np.repeat(np.arange(len(lists), dtype=np.int64), np.diff(off))
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(keep))
    seg = seg[keep]
    counts = np.bincount(seg, minlength=len(lists)).astype(np.int64)
    return flat, seg, counts


def _gram_hashes_batch(
    texts, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-doc token k-gram hashes for a whole column at once.

    Returns (gram hashes, per-gram doc ids, per-doc gram counts) with
    the exact semantics of :func:`_shingle_hashes` per doc: docs with
    1..k-1 tokens get ONE gram of all their tokens; docs with 0 tokens
    get one hash of 0.  Gram strings are built with ONE Arrow
    ``binary_join_element_wise`` (C++ concat) and hashed with the
    vectorized crc kernel — no per-gram Python."""
    import pyarrow as pa
    import pyarrow.compute as pc

    flat, seg, counts = _flat_tokens_np(texts)
    n_docs = len(counts)
    n_tok = len(flat)
    parts: list[np.ndarray] = []
    segs: list[np.ndarray] = []

    # full k-grams: token position t starts a gram iff t+k-1 is in the
    # same doc
    if n_tok >= k:
        ok = seg[: n_tok - k + 1] == seg[k - 1:]
        starts = np.flatnonzero(ok)
        if starts.size:
            cols = [flat.take(pa.array(starts + j)) for j in range(k)]
            grams = pc.binary_join_element_wise(*cols, " ")
            # hash only the UNIQUE grams (natural text repeats them
            # ~10x; the dictionary pass costs ~10% when it does not pay)
            d = grams.dictionary_encode()
            uh = _hash64_batch(d.dictionary)
            parts.append(uh[d.indices.to_numpy().astype(np.int64)])
            segs.append(seg[starts])

    # short docs (0 < count < k): one gram of all their tokens
    short = np.flatnonzero((counts > 0) & (counts < k))
    if short.size:
        doc_off = np.concatenate(([0], np.cumsum(counts)))
        sh_cols = []
        # max k-1 columns; absent tokens joined as "" then trimmed is
        # WRONG (join adds separators), so group short docs by length
        for ln in range(1, k):
            docs_ln = short[counts[short] == ln]
            if not docs_ln.size:
                continue
            cols = [
                flat.take(pa.array(doc_off[docs_ln] + j))
                for j in range(ln)
            ]
            grams = (
                cols[0] if ln == 1
                else pc.binary_join_element_wise(*cols, " ")
            )
            sh_cols.append((_hash64_batch(grams), docs_ln))
        for h, d in sh_cols:
            parts.append(h)
            segs.append(d)

    # empty docs: hash 0 (scalar path returns [0])
    empty = np.flatnonzero(counts == 0)
    if empty.size:
        parts.append(np.zeros(empty.size, dtype=np.uint64))
        segs.append(empty)

    if parts:
        gh = np.concatenate(parts)
        gseg = np.concatenate(segs)
        order = np.argsort(gseg, kind="stable")
        gh = gh[order]
        gseg = gseg[order]
    else:
        gh = np.empty(0, dtype=np.uint64)
        gseg = np.empty(0, dtype=np.int64)
    gcounts = np.bincount(gseg, minlength=n_docs).astype(np.int64)
    return gh, gseg, gcounts


class MinHasher:
    """Vectorized minhash signatures: sig[i] = min((a_i * h + b_i) mod p)."""

    def __init__(self, num_perm: int = 64, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _M61, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _M61, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm

    def signature(self, hashes: np.ndarray) -> np.ndarray:
        # (num_perm, n) universal hashing in uint64 (mod 2^64 is fine for
        # min-stability as long as it is consistent)
        v = self.a[:, None] * hashes[None, :] + self.b[:, None]
        return v.min(axis=1)


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the lowest id per identical text. Returns Dataset(doc_id)."""
    import hashlib

    def add_hash(batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        texts = batch.column(text_col).to_pylist()
        hashes = [
            hashlib.sha1((t or "").encode()).hexdigest() for t in texts
        ]
        return batch.select([id_col]).append_column(
            "text_sha", pa.array(hashes)
        )

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("text_sha")
        .min(id_col)
    )


def minhash_signature_ds(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    concurrency=None,
):
    """Dataset of (id, band, bucket) LSH rows — one shuffle key per band."""
    rows_per_band = num_perm // bands

    class Signer:
        """Batch-vectorized signer (round-2 verdict #3): one Arrow split
        + join per column, vectorized crc gram hashes, then per-doc
        minima via ``np.minimum.reduceat`` — bit-identical to the old
        per-doc loop, no per-row Python."""

        def __init__(self):
            self.mh = MinHasher(num_perm)

        def __call__(self, batch):
            import pyarrow as pa

            ids = np.asarray(batch[id_col], dtype=np.int64)
            texts = batch[text_col]
            if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
                texts = pa.array(
                    [str(t) for t in texts], type=pa.string()
                )
            n_docs = ids.size
            if not n_docs:
                return {
                    "doc_id": np.empty(0, dtype=np.int64),
                    "band": np.empty(0, dtype=np.int64),
                    "bucket": np.empty(0, dtype=np.int64),
                }
            gh, gseg, gcounts = _gram_hashes_batch(texts, shingle_k)
            doc_starts = np.concatenate(
                ([0], np.cumsum(gcounts)[:-1])
            )
            # (P, n_docs) signature matrix, one 1-D reduceat per perm
            # (2-D axis=1 reduceat measured ~70x slower)
            a, b = self.mh.a, self.mh.b
            sig = np.empty((num_perm, n_docs), dtype=np.uint64)
            buf = np.empty_like(gh)
            for p in range(num_perm):
                np.multiply(a[p], gh, out=buf)
                buf += b[p]
                sig[p] = np.minimum.reduceat(buf, doc_starts)
            # band buckets: xor-fold each band's rows (same op order as
            # the scalar path)
            mixed = sig * np.uint64(0x9E3779B97F4A7C15)
            out_doc = np.repeat(ids, bands)
            out_band = np.tile(np.arange(bands, dtype=np.int64), n_docs)
            buckets = np.empty((bands, n_docs), dtype=np.uint64)
            for bi in range(bands):
                buckets[bi] = np.bitwise_xor.reduce(
                    mixed[bi * rows_per_band: (bi + 1) * rows_per_band],
                    axis=0,
                ) >> np.uint64(1)
            return {
                "doc_id": out_doc,
                "band": out_band,
                "bucket": buckets.T.reshape(-1).astype(np.int64),
            }

    return ds.map_batches(Signer, concurrency=concurrency or (1, 512))


def _bucket_pairs_fn(max_bucket: int):
    """All within-bucket candidate pairs, guarded at ``max_bucket`` ids.

    A bucket larger than max_bucket is almost always a degenerate
    near-constant region (boilerplate); we keep the first max_bucket ids
    (sorted — deterministic) and REPORT the truncation in the ``dropped``
    column instead of silently capping recall."""

    def pairs_of(group):
        ids = sorted(int(x) for x in set(group["doc_id"]))
        dropped = 0
        if len(ids) > max_bucket:
            # C(n,2) - C(cap,2) pairs lost — surfaced, not silent
            n = len(ids)
            dropped = n * (n - 1) // 2 - max_bucket * (max_bucket - 1) // 2
            ids = ids[:max_bucket]
        out = {"a": [], "b": [], "dropped": []}
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out["a"].append(ids[i])
                out["b"].append(ids[j])
                out["dropped"].append(0)
        if dropped:
            # carrier row for the truncation metric (a == b == -1)
            out["a"].append(-1)
            out["b"].append(-1)
            out["dropped"].append(dropped)
        return out

    return pairs_of


def minhash_lsh_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.8,
    max_bucket: int = 512,
    concurrency=None,
):
    """Near-duplicate removal via MinHash+LSH; returns
    ``(verified_pairs, survivors_ds)``.

    Fully distributed — the driver only ever touches data that is small
    by construction (candidate pairs and candidate texts, never the
    corpus):

    1. signatures + band buckets        (map_batches, vectorized)
    2. candidate pairs per (band,bucket) group (groupby; all pairs, with
       a guarded + *reported* cap on degenerate mega-buckets)
    3. pair dedup across bands          (groupby(a,b) — pairs only)
    4. candidate texts: broadcast need-set filter -> small (id,text) side
    5. exact-Jaccard verify             (map_batches over PAIRS, texts
       shared once via ray.put — the broadcast-small-side pattern)
    6. union-find over verified pairs (small) -> DROP set -> broadcast
       into a filter stage; ``survivors_ds`` streams — the full id
       column never reaches the driver.

    ``verified_pairs`` is the (small) list of verified (a, b) pairs.
    """
    import logging

    import ray

    sig = minhash_signature_ds(
        ds, text_col, id_col, num_perm, bands, shingle_k, concurrency
    )
    cand = sig.groupby(["band", "bucket"]).map_groups(
        _bucket_pairs_fn(max_bucket)
    )
    # dedup pairs across bands — shuffles only (a, b) ids
    pair_ds = cand.groupby(["a", "b"]).sum("dropped")

    pairs_df = pair_ds.to_pandas()  # candidate pairs: small by construction
    dropped_total = 0
    cand_pairs: list[tuple[int, int]] = []
    for a, b, d in zip(pairs_df["a"], pairs_df["b"],
                       pairs_df["sum(dropped)"]):
        if int(a) < 0:
            dropped_total += int(d)
        else:
            cand_pairs.append((int(a), int(b)))
    if dropped_total:
        logging.getLogger("ferret_ray.dedup").warning(
            "minhash_lsh_dedup: %d candidate pairs dropped in "
            "over-full buckets (>%d ids); raise max_bucket to recover "
            "recall", dropped_total, max_bucket,
        )
    cand_pairs.sort()

    # exact-Jaccard verify as a DISTRIBUTED join (round-2 verdict #4):
    # candidate TEXTS never reach the driver.  Only the (small) id
    # need-set is broadcast; each matching doc is shingle-hashed once
    # map-side, then two pair-scale groupbys route shingle sets to
    # their pairs — the hash-partitioned pair-text join.
    need = sorted({i for p in cand_pairs for i in p})
    verified: list[tuple[int, int]] = []
    if need:
        import pyarrow as pa
        import ray.data

        need_arr = np.array(need, dtype=np.int64)  # ids only — small

        def pick_shingles(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy().astype(np.int64)
            sel = np.flatnonzero(np.isin(ids, need_arr))
            texts = batch.column(text_col).take(pa.array(sel))
            if not isinstance(texts, pa.Array):
                texts = texts.combine_chunks()
            gh, _seg, gcounts = _gram_hashes_batch(texts, shingle_k)
            off = np.concatenate(([0], np.cumsum(gcounts)))
            blobs = [
                np.unique(gh[off[i]: off[i + 1]]).tobytes()
                for i in range(len(sel))
            ]
            n = len(sel)
            return pa.table(
                {
                    "id": pa.array(ids[sel], type=pa.int64()),
                    "pair_id": pa.array([-1] * n, type=pa.int64()),
                    "side": pa.array([-1] * n, type=pa.int8()),
                    "a": pa.array([-1] * n, type=pa.int64()),
                    "b": pa.array([-1] * n, type=pa.int64()),
                    "sh": pa.array(blobs, type=pa.large_binary()),
                }
            )

        cand_sh = ds.map_batches(pick_shingles, batch_format="pyarrow")

        pid = np.arange(len(cand_pairs), dtype=np.int64)
        pa_arr = np.array([p[0] for p in cand_pairs], dtype=np.int64)
        pb_arr = np.array([p[1] for p in cand_pairs], dtype=np.int64)
        pair_rows = ray.data.from_arrow(
            pa.table(
                {
                    "id": pa.array(np.concatenate((pa_arr, pb_arr))),
                    "pair_id": pa.array(np.concatenate((pid, pid))),
                    "side": pa.array(
                        np.repeat(
                            np.array([0, 1], dtype=np.int8),
                            len(cand_pairs),
                        )
                    ),
                    "a": pa.array(np.concatenate((pa_arr, pa_arr))),
                    "b": pa.array(np.concatenate((pb_arr, pb_arr))),
                    "sh": pa.array(
                        [b""] * (2 * len(cand_pairs)),
                        type=pa.large_binary(),
                    ),
                }
            )
        )

        _empty_sh = np.zeros(1, dtype=np.uint64).tobytes()

        def attach_text(group):
            import pandas as pd

            doc = group[group["side"] < 0]
            # a missing doc behaves like empty text (shingle set {0}),
            # matching the scalar path's texts.get(id, "")
            sh = doc["sh"].iloc[0] if len(doc) else _empty_sh
            pairs = group[group["side"] >= 0]
            return pd.DataFrame(
                {
                    "pair_id": pairs["pair_id"],
                    "side": pairs["side"],
                    "a": pairs["a"],
                    "b": pairs["b"],
                    "sh": [sh] * len(pairs),
                }
            )

        def verify_pair(group):
            import pandas as pd

            sets = {}
            for _, r in group.iterrows():
                sets[int(r["side"])] = np.frombuffer(
                    r["sh"], dtype=np.uint64
                )
            sa = sets.get(0, np.zeros(1, dtype=np.uint64))
            sb = sets.get(1, np.zeros(1, dtype=np.uint64))
            inter = np.intersect1d(sa, sb).size
            union = sa.size + sb.size - inter
            j = inter / union if union else 1.0
            if j >= jaccard_threshold:
                return pd.DataFrame(
                    {
                        "a": [int(group["a"].iloc[0])],
                        "b": [int(group["b"].iloc[0])],
                    }
                )
            return pd.DataFrame({"a": [], "b": []})

        ver_rows = (
            cand_sh.union(pair_rows)
            .groupby("id")
            .map_groups(attach_text)
            .groupby("pair_id")
            .map_groups(verify_pair)
            .take_all()
        )  # verified pairs: still the small side
        verified = sorted(
            (int(r["a"]), int(r["b"])) for r in ver_rows
        )

    # union-find on verified pairs only (small); DROP set = every id whose
    # representative is a smaller id — strictly smaller than the pairs set
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in verified:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    drop = frozenset(x for x in parent if find(x) != x)
    drop_ref = ray.put(drop)

    class KeepFilter:
        def __init__(self):
            self.drop = ray.get(drop_ref)

        def __call__(self, batch):
            import pyarrow as pa
            import pyarrow.compute as pc

            ids = batch.column(id_col)
            if not self.drop:
                return batch.select([id_col])
            mask = pc.invert(
                pc.is_in(
                    ids, value_set=pa.array(sorted(self.drop),
                                            type=ids.type)
                )
            )
            return batch.select([id_col]).filter(mask)

    survivors = ds.map_batches(
        KeepFilter, batch_format="pyarrow",
        concurrency=concurrency or (1, 512),
    )
    return verified, survivors


def ngram_jaccard_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    jaccard_threshold: float = 0.8,
    max_gram_group: int = 4096,
    concurrency=None,
):
    """EXACT n-gram-Jaccard near-dup removal as a distributed
    set-similarity join (no sketching; the LSH-free sibling of
    :func:`minhash_lsh_dedup`).  Returns ``(dropped_ids, survivors_ds)``.

    Drop rule (matches the SQL oracle, no survivor chaining): ``x`` is
    dropped iff SOME ``y < x`` has ``J(x, y) >= jaccard_threshold``.

    Shape at corpus scale — every wide op is pair- or gram-sized, the
    text/id columns never reach the driver:

      1. per-doc DISTINCT k-gram hashes (the vectorized batch kernel)
         exploded to ``(gram, id, set_size)`` rows   (map_batches)
      2. ``groupby(gram)`` -> within-group candidate pairs, ids sorted;
         degenerate mega-grams (shared boilerplate) are capped at
         ``max_gram_group`` ids with the lost pair count REPORTED
      3. ``groupby(a, b)`` -> pair count == |A ∩ B|; the set sizes ride
         along, so ``J = inter / (|A| + |B| - inter)`` needs no join
         back to the corpus
      4. dup ids (small: one per dropped doc) -> broadcast anti-filter.

    Docs with fewer than ``shingle_k`` tokens use one whole-doc gram
    (hash 0 when empty) like the minhash signer — the SQL oracle simply
    has no grams for them, so keep test corpora above that floor."""
    import logging

    import ray
    import ray.data
    from ray.data.aggregate import Count, Max, Sum

    def explode(batch):
        import pyarrow as pa

        ids = np.asarray(batch[id_col], dtype=np.int64)
        if not ids.size:
            return {
                "gram": np.empty(0, dtype=np.int64),
                "id": np.empty(0, dtype=np.int64),
                "sz": np.empty(0, dtype=np.int64),
            }
        texts = batch[text_col]
        if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
            texts = pa.array([str(t) for t in texts], type=pa.string())
        gh, gseg, _counts = _gram_hashes_batch(texts, shingle_k)
        # distinct per doc: (doc, hash) sort, keep first occurrences
        order = np.lexsort((gh, gseg))
        gh = gh[order]
        gseg = gseg[order]
        first = np.empty(gh.size, dtype=bool)
        if gh.size:
            first[0] = True
            first[1:] = (gseg[1:] != gseg[:-1]) | (gh[1:] != gh[:-1])
        gh = gh[first]
        gseg = gseg[first]
        sizes = np.bincount(gseg, minlength=ids.size).astype(np.int64)
        return {
            "gram": gh.view(np.int64),
            "id": ids[gseg],
            "sz": sizes[gseg],
        }

    def pairs_of(group):
        ids = np.asarray(group["id"], dtype=np.int64)
        szs = np.asarray(group["sz"], dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        szs = szs[order]
        n = ids.size
        dropped = 0
        if n > max_gram_group:
            cap = max_gram_group
            dropped = n * (n - 1) // 2 - cap * (cap - 1) // 2
            ids = ids[:cap]
            szs = szs[:cap]
            n = cap
        iu, ju = np.triu_indices(n, k=1)
        out = {
            "a": ids[iu],
            "b": ids[ju],
            "sza": szs[iu],
            "szb": szs[ju],
            "dropped": np.zeros(iu.size, dtype=np.int64),
        }
        if dropped:
            # carrier row for the truncation metric (a == b == -1)
            for kk, v in (("a", -1), ("b", -1), ("sza", 0), ("szb", 0),
                          ("dropped", dropped)):
                out[kk] = np.append(out[kk], v)
        return out

    pair_stats = (
        ds.map_batches(explode)
        .groupby("gram")
        .map_groups(pairs_of)
        .groupby(["a", "b"])
        .aggregate(Count(), Max("sza"), Max("szb"), Sum("dropped"))
    )

    def dup_rows(batch: "pa.Table"):
        import pyarrow as pa

        a = batch.column("a").to_numpy()
        b = batch.column("b").to_numpy()
        inter = batch.column("count()").to_numpy().astype(np.float64)
        sza = batch.column("max(sza)").to_numpy().astype(np.float64)
        szb = batch.column("max(szb)").to_numpy().astype(np.float64)
        dropped = batch.column("sum(dropped)").to_numpy()
        union = sza + szb - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            j = np.where(union > 0, inter / union, 1.0)
        dup = (a >= 0) & (j >= jaccard_threshold)
        carrier = a < 0
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate((b[dup], np.full(int(carrier.sum()),
                                                    -1, dtype=np.int64))),
                    type=pa.int64(),
                ),
                "dropped": pa.array(
                    np.concatenate(
                        (np.zeros(int(dup.sum()), dtype=np.int64),
                         dropped[carrier])
                    ),
                    type=pa.int64(),
                ),
            }
        )

    # dup ids + truncation carriers: small by construction (one row per
    # dropped doc), the only thing the driver ever holds
    rows = pair_stats.map_batches(
        dup_rows, batch_format="pyarrow"
    ).take_all()
    drop = sorted({int(r["doc_id"]) for r in rows if r["doc_id"] >= 0})
    dropped_total = sum(int(r["dropped"]) for r in rows if r["doc_id"] < 0)
    if dropped_total:
        logging.getLogger("ferret_ray.dedup").warning(
            "ngram_jaccard_dedup: %d candidate pairs dropped in "
            "over-full gram groups (>%d ids); raise max_gram_group to "
            "recover exactness", dropped_total, max_gram_group,
        )
    drop_ref = ray.put(frozenset(drop))

    class KeepFilter:
        def __init__(self):
            self.drop = ray.get(drop_ref)

        def __call__(self, batch):
            import pyarrow as pa
            import pyarrow.compute as pc

            ids = batch.column(id_col)
            if not self.drop:
                return batch.select([id_col])
            mask = pc.invert(
                pc.is_in(
                    ids, value_set=pa.array(sorted(self.drop),
                                            type=ids.type)
                )
            )
            return batch.select([id_col]).filter(mask)

    survivors = ds.map_batches(
        KeepFilter, batch_format="pyarrow",
        concurrency=concurrency or (1, 512),
    )
    return drop, survivors


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    sa = set(map(int, _shingle_hashes(_tokens(a), k)))
    sb = set(map(int, _shingle_hashes(_tokens(b), k)))
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter) if (sa or sb) else 0.0


def simhash64(tokens: Iterable[str]) -> int:
    """Scalar reference simhash (the batch stage below is bit-identical
    and vectorized — round-2 verdict #2 fix)."""
    acc = np.zeros(64, dtype=np.int64)
    import zlib

    for t in tokens:
        b = t.encode()
        h = np.uint64((zlib.crc32(b) << 32) | zlib.crc32(b[::-1]))
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash64_batch(texts) -> np.ndarray:
    """uint64 simhash per doc for a whole column: hash the UNIQUE token
    vocab once (vectorized crc), unpack it to a (V, 64) ±1 matrix, then
    one ``np.add.reduceat`` over the token stream per doc."""
    flat, seg, counts = _flat_tokens_np(texts)
    n_docs = len(counts)
    out = np.zeros(n_docs, dtype=np.uint64)
    if not len(flat):
        return out
    dcodes = flat.dictionary_encode()
    codes = dcodes.indices.to_numpy().astype(np.int64)
    vocab_h = _hash64_batch(dcodes.dictionary)
    vbits = (
        (vocab_h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
        & np.uint64(1)
    ).astype(np.int64)  # (V, 64)
    doc_starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    nz = counts > 0
    starts_nz = doc_starts[nz]
    n_tok_nz = counts[nz]
    # acc_b = sum(±1) = 2*ones_b - n_tokens  =>  bit set iff
    # 2*ones_b > n_tokens; one 1-D reduceat per bit (2-D reduceat is
    # pathologically slow)
    acc = np.zeros(int(nz.sum()), dtype=np.uint64)
    for b in range(64):
        ones = np.add.reduceat(vbits[:, b][codes], starts_nz)
        acc |= (2 * ones > n_tok_nz).astype(np.uint64) << np.uint64(b)
    out[nz] = acc
    return out


def simhash_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 512,
):
    """Candidate near-dup pairs via simhash band blocking (4x16 bits).

    All within-bucket pairs are checked (vectorized XOR+popcount);
    buckets beyond ``max_bucket`` ids are truncated with a logged count,
    never silently.  Only the (small) matching pairs reach the driver."""
    import logging

    def sign(batch):
        import pyarrow as pa

        ids = np.asarray(batch[id_col], dtype=np.int64)
        texts = batch[text_col]
        if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
            texts = pa.array([str(t) for t in texts], type=pa.string())
        h = simhash64_batch(texts)                      # (n,) uint64
        h_signed = h.view(np.int64)                     # int64-safe
        n = ids.size
        shifts = np.uint64(16) * np.arange(4, dtype=np.uint64)
        return {
            "doc_id": np.repeat(ids, 4),
            "band": np.tile(np.arange(4, dtype=np.int64), n),
            "bucket": (
                (h[:, None] >> shifts[None, :]) & np.uint64(0xFFFF)
            ).reshape(-1).astype(np.int64),
            "sim": np.repeat(h_signed, 4),
        }

    sig = ds.map_batches(sign)

    def pairs_of(group):
        rows = sorted(
            set(
                zip(
                    (int(x) for x in group["doc_id"]),
                    (int(x) for x in group["sim"]),
                )
            )
        )
        out = {"a": [], "b": [], "hamming": [], "dropped": []}
        dropped = 0
        if len(rows) > max_bucket:
            n = len(rows)
            dropped = (
                n * (n - 1) // 2 - max_bucket * (max_bucket - 1) // 2
            )
            rows = rows[:max_bucket]
        if rows:
            ids = np.array([r[0] for r in rows], dtype=np.int64)
            sims = np.array([r[1] for r in rows], dtype=np.int64).view(
                np.uint64
            )
            n = ids.size
            iu, ju = np.triu_indices(n, k=1)
            x = sims[iu] ^ sims[ju]
            d = np.zeros(x.size, dtype=np.int64)
            while True:  # popcount via shift-mask folding
                nz = x != 0
                if not nz.any():
                    break
                d[nz] += (x[nz] & np.uint64(1)).astype(np.int64)
                x = x >> np.uint64(1)
            hit = (d <= max_hamming) & (ids[iu] != ids[ju])
            out["a"] = ids[iu][hit].tolist()
            out["b"] = ids[ju][hit].tolist()
            out["hamming"] = d[hit].tolist()
            out["dropped"] = [0] * int(hit.sum())
        if dropped:
            out["a"].append(-1)
            out["b"].append(-1)
            out["hamming"].append(-1)
            out["dropped"].append(dropped)
        return out

    pairs = sig.groupby(["band", "bucket"]).map_groups(pairs_of).to_pandas()
    if not len(pairs):
        return []
    dropped_total = int(pairs.loc[pairs["a"] < 0, "dropped"].sum())
    if dropped_total:
        logging.getLogger("ferret_ray.dedup").warning(
            "simhash_dedup: %d candidate pairs dropped in over-full "
            "buckets (>%d ids)", dropped_total, max_bucket,
        )
    pairs = pairs[pairs["a"] >= 0]
    return sorted(
        {(int(a), int(b), int(h)) for a, b, h in zip(
            pairs["a"], pairs["b"], pairs["hamming"])}
    )
