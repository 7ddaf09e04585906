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
    """Stable 64-bit hashes of token k-grams."""
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
):
    """Dataset of (id, band, bucket) LSH rows — one shuffle key per band."""
    rows_per_band = num_perm // bands

    class Signer:
        def __init__(self):
            self.mh = MinHasher(num_perm)

        def __call__(self, batch):
            ids = batch[id_col]
            out = {"doc_id": [], "band": [], "bucket": []}
            for i, text in enumerate(batch[text_col]):
                sig = self.mh.signature(
                    _shingle_hashes(_tokens(str(text)), shingle_k)
                )
                for b in range(bands):
                    chunk = sig[b * rows_per_band: (b + 1) * rows_per_band]
                    bucket = int(
                        np.bitwise_xor.reduce(
                            chunk * np.uint64(0x9E3779B97F4A7C15)
                        )
                        >> np.uint64(1)
                    )
                    out["doc_id"].append(int(ids[i]))
                    out["band"].append(b)
                    out["bucket"].append(bucket)
            return out

    return ds.map_batches(Signer, concurrency=(1, 4))


def minhash_lsh_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.8,
):
    """Near-duplicate groups via MinHash+LSH; returns (pairs, keep_ids).

    ``pairs`` is a list of verified (id_a, id_b) near-dup pairs;
    ``keep_ids`` the union-find representatives (min id per group).
    The verify step re-reads only candidate docs (small side).
    """
    sig = minhash_signature_ds(
        ds, text_col, id_col, num_perm, bands, shingle_k
    )
    # bucket groupby: emit candidate pairs per (band, bucket) group
    def pairs_of(group):
        ids = sorted(int(x) for x in group["doc_id"])
        out = {"a": [], "b": []}
        for i in range(len(ids)):
            for j in range(i + 1, min(i + 6, len(ids))):  # cap fanout
                out["a"].append(ids[i])
                out["b"].append(ids[j])
        return out

    cand = (
        sig.groupby(["band", "bucket"])
        .map_groups(pairs_of)
        .to_pandas()
    )
    cand_pairs = sorted(
        {(int(a), int(b)) for a, b in zip(cand["a"], cand["b"])}
    ) if len(cand) else []

    # verify with exact jaccard on the candidate doc texts (small side)
    need = sorted({i for p in cand_pairs for i in p})
    texts = {}
    if need:
        need_set = set(need)

        def pick(batch):
            sel = [
                (int(i), str(t))
                for i, t in zip(batch[id_col], batch[text_col])
                if int(i) in need_set
            ]
            return {
                "doc_id": [x[0] for x in sel],
                "text": [x[1] for x in sel],
            }

        picked = ds.map_batches(pick).to_pandas()
        texts = dict(zip(picked["doc_id"], picked["text"]))

    verified = [
        (a, b)
        for a, b in cand_pairs
        if ngram_jaccard(texts.get(a, ""), texts.get(b, ""), shingle_k)
        >= jaccard_threshold
    ]

    # union-find on verified pairs (pairs are small by construction)
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
    all_ids = [int(x) for x in ds.select_columns([id_col]).to_pandas()[id_col]]
    keep = sorted(i for i in all_ids if find(i) == i)
    return verified, keep


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    sa = set(map(int, _shingle_hashes(_tokens(a), k)))
    sb = set(map(int, _shingle_hashes(_tokens(b), k)))
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter) if (sa or sb) else 0.0


def simhash64(tokens: Iterable[str]) -> int:
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


def simhash_dedup(
    ds, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
):
    """Candidate near-dup pairs via simhash band blocking (4x16 bits)."""

    def sign(batch):
        out = {"doc_id": [], "band": [], "bucket": [], "sim": []}
        for i, text in enumerate(batch[text_col]):
            h = simhash64(_tokens(str(text)))
            h_signed = h - (1 << 64) if h >= (1 << 63) else h  # int64-safe
            for b in range(4):
                out["doc_id"].append(int(batch[id_col][i]))
                out["band"].append(b)
                out["bucket"].append((h >> (16 * b)) & 0xFFFF)
                out["sim"].append(h_signed)
        return out

    sig = ds.map_batches(sign)

    def pairs_of(group):
        rows = sorted(
            zip(
                (int(x) for x in group["doc_id"]),
                (int(x) for x in group["sim"]),
            )
        )
        out = {"a": [], "b": [], "hamming": []}
        mask = (1 << 64) - 1
        for i in range(len(rows)):
            for j in range(i + 1, min(i + 6, len(rows))):
                d = bin((rows[i][1] ^ rows[j][1]) & mask).count("1")
                if d <= max_hamming and rows[i][0] != rows[j][0]:
                    out["a"].append(rows[i][0])
                    out["b"].append(rows[j][0])
                    out["hamming"].append(d)
        return out

    pairs = sig.groupby(["band", "bucket"]).map_groups(pairs_of).to_pandas()
    return sorted(
        {(a, b, h) for a, b, h in zip(pairs["a"], pairs["b"],
                                      pairs["hamming"])}
    ) if len(pairs) else []
