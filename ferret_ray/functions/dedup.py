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
    concurrency=None,
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

    # candidate texts — the broadcast small side (need-set filter)
    need = sorted({i for p in cand_pairs for i in p})
    verified: list[tuple[int, int]] = []
    if need:
        need_set = frozenset(need)

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

        picked = ds.map_batches(pick).take_all()  # |candidates| rows only
        texts_ref = ray.put(
            {int(r["doc_id"]): r["text"] for r in picked}
        )

        class Verifier:
            """Jaccard verify per pair; texts fetched once per actor."""

            def __init__(self):
                self.texts = ray.get(texts_ref)

            def __call__(self, batch):
                texts = self.texts
                out_a, out_b = [], []
                for a, b in zip(batch["a"], batch["b"]):
                    a, b = int(a), int(b)
                    if a < 0:
                        continue
                    if ngram_jaccard(
                        texts.get(a, ""), texts.get(b, ""), shingle_k
                    ) >= jaccard_threshold:
                        out_a.append(a)
                        out_b.append(b)
                return {"a": out_a, "b": out_b}

        ver_rows = pair_ds.map_batches(
            Verifier, concurrency=concurrency or (1, 512)
        ).take_all()  # verified pairs: still the small side
        verified = sorted((int(r["a"]), int(r["b"])) for r in ver_rows)

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
