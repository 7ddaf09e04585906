"""IVF ANN: recall against brute force; exactness when probing all."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def emb(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    n, d = 3000, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    df = pd.DataFrame(
        {"vec_id": np.arange(n), "embedding": [v.tolist() for v in vecs]}
    )
    return ray.data.from_pandas(df), vecs


def test_ivf_full_probe_is_exact(emb):
    from ferret_ray.functions.ann import brute_force_topk, ivf_topk

    ds, vecs = emb
    q = vecs[7]
    exact = brute_force_topk(ds, q, k=10)[0]
    full = ivf_topk(ds, q, k=10, n_clusters=8, nprobe=8)[0]
    assert [v for _, v, _ in full] == [v for _, v, _ in exact]


def test_ivf_recall_reasonable(emb):
    from ferret_ray.functions.ann import brute_force_topk, ivf_topk

    ds, vecs = emb
    recalls = []
    for qi in (0, 100, 2500):
        q = vecs[qi]
        exact = {v for _, v, _ in brute_force_topk(ds, q, k=10)[0]}
        got = {v for _, v, _ in ivf_topk(
            ds, q, k=10, n_clusters=16, nprobe=6
        )[0]}
        recalls.append(len(exact & got) / 10)
    assert sum(recalls) / len(recalls) >= 0.5  # probing 6/16 clusters
    # the query's own vector is always found (it lives in the top probe)
    got = ivf_topk(ds, vecs[0], k=1, n_clusters=16, nprobe=1)[0]
    assert got and got[0][1] == 0


def test_embedding_dedup_drops_near_dups(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from ferret_ray.functions.ann import embedding_dedup

    rng = np.random.default_rng(9)
    base = rng.standard_normal((40, 16)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(40)]
    # near-dups of vec 3 and 7 (tiny noise), plus an exact copy of 0
    for j, src in enumerate([3, 7, 0]):
        v = base[src] + (0.001 * rng.standard_normal(16)).astype(np.float32)
        rows.append({"vec_id": 40 + j, "embedding": v.tolist()})
    ds = ray.data.from_items(rows)
    out = embedding_dedup(ds, threshold=0.95).to_pandas()
    keep = set(out["vec_id"])
    assert {40, 41, 42} & keep == set()   # all dups dropped
    assert {0, 3, 7} <= keep              # originals survive
    assert len(keep) == 40


def test_partitioned_ivf_index_matches_filter_variant(emb, tmp_path):
    """build_ivf_index + ivf_search (reads ONLY probed partitions)
    returns exactly what the in-memory filter variant returns: same
    deterministic quantizer, same candidate set, same ranking."""
    import os

    from ferret_ray.functions.ann import build_ivf_index, ivf_search, ivf_topk

    ds, vecs = emb
    d = str(tmp_path / "ivf_idx")
    ivf = build_ivf_index(ds, d, n_clusters=8)
    # hive layout: one directory per non-empty cluster + metadata
    parts = sorted(p for p in os.listdir(d) if p.startswith("ivf_cluster="))
    assert 1 <= len(parts) <= 8
    assert os.path.exists(os.path.join(d, "ivf_meta.json"))

    for qi in (7, 100):
        q = vecs[qi]
        got = ivf_search(d, q, k=10, nprobe=3)[0]
        want = ivf_topk(ds, q, k=10, n_clusters=8, nprobe=3)[0]
        assert got == want
    # full probe degenerates to exact search through the partitioned path
    from ferret_ray.functions.ann import brute_force_topk

    got = ivf_search(d, vecs[7], k=10, nprobe=8)[0]
    exact = brute_force_topk(ds, vecs[7], k=10)[0]
    assert [v for _, v, _ in got] == [v for _, v, _ in exact]


def test_embedding_dedup_strip_task_count(ray_session):
    """Exact mode runs O(n) tasks in blocks — balanced strips over the
    lower triangle, ceil(nb/2) tasks for nb blocks (VERDICT r3 #1) —
    and still finds every qualifying pair."""
    import ray.data

    from ferret_ray.functions.ann import embedding_dedup

    rng = np.random.default_rng(5)
    n = 200
    base = rng.standard_normal((n, 16)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": base[i].tolist()}
            for i in range(n)]
    rows.append({"vec_id": n, "embedding": base[1].tolist()})  # dup of 1
    ds = ray.data.from_items(rows)
    stats = {}
    out = embedding_dedup(
        ds, threshold=0.95, block_size=32, stats=stats
    ).to_pandas()
    nb = stats["blocks"]
    assert nb >= 6
    assert stats["strip_tasks"] == (nb + 1) // 2   # O(n) in blocks
    assert stats["tiles"] == nb * (nb + 1) // 2    # exact: all tiles
    keep = set(out["vec_id"])
    assert n not in keep and 1 in keep and len(keep) == n


def test_embedding_dedup_no_driver_block_staging(ray_session, monkeypatch):
    """VERDICT r4 #2: embedding blocks must never flow through the
    driver process.  iter_batches (the old staging loop) is banned
    inside the operator, and every driver-side collection stays
    O(candidates + train_sample), never O(corpus)."""
    import ray.data

    from ferret_ray.functions.ann import embedding_dedup

    rng = np.random.default_rng(3)
    n = 300
    base = rng.standard_normal((n, 16)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": base[i].tolist()}
            for i in range(n)]
    rows.append({"vec_id": n, "embedding": base[2].tolist()})
    ds = ray.data.from_items(rows)

    def banned_iter_batches(self, *a, **k):
        raise AssertionError(
            "embedding_dedup staged blocks through the driver "
            "(Dataset.iter_batches)"
        )

    real_take_all = ray.data.Dataset.take_all
    sizes = []

    def spy_take_all(self, *a, **k):
        out = real_take_all(self, *a, **k)
        sizes.append(len(out))
        return out

    monkeypatch.setattr(ray.data.Dataset, "take_all", spy_take_all)
    real_iter_batches = ray.data.Dataset.iter_batches

    for mode in ("exact", "ivf"):
        # the ban covers the operator body only (staging + strips run
        # eagerly inside it); consuming the returned lazy survivors
        # dataset legitimately uses iter_batches under to_pandas
        monkeypatch.setattr(
            ray.data.Dataset, "iter_batches", banned_iter_batches
        )
        survivors = embedding_dedup(
            ds, threshold=0.95, block_size=64, candidates=mode,
            train_sample=64,
        )
        monkeypatch.setattr(
            ray.data.Dataset, "iter_batches", real_iter_batches
        )
        keep = set(survivors.to_pandas()["vec_id"])
        assert n not in keep and 2 in keep
    assert sizes and max(sizes) <= 64 + 8, sizes  # train sample + drops


def test_embedding_dedup_ivf_blocks_prune_and_match_exact(ray_session):
    """IVF candidate mode on clusterable data (the realistic near-dup
    regime: tight clusters, high threshold): computes FEWER tiles than
    exact mode yet drops the identical id set."""
    import ray.data

    from ferret_ray.functions.ann import embedding_dedup

    rng = np.random.default_rng(11)
    # 4 well-separated cluster centers, 100 members each w/ small noise
    centers = rng.standard_normal((4, 32)).astype(np.float32) * 10
    rows = []
    vid = 0
    for c in range(4):
        for _ in range(100):
            v = centers[c] + rng.standard_normal(32).astype(np.float32)
            rows.append({"vec_id": vid, "embedding": v.tolist()})
            vid += 1
    # dups: exact copies of three vectors
    for src in (5, 150, 399):
        rows.append({"vec_id": vid,
                     "embedding": rows[src]["embedding"]})
        vid += 1
    ds = ray.data.from_items(rows)

    ex_stats, ivf_stats = {}, {}
    exact = embedding_dedup(
        ds, threshold=0.98, block_size=64, stats=ex_stats
    ).to_pandas()
    blocked = embedding_dedup(
        ds, threshold=0.98, block_size=64, stats=ivf_stats,
        candidates="ivf", n_clusters=4, probe_margin=0.05,
    ).to_pandas()
    assert sorted(exact["vec_id"]) == sorted(blocked["vec_id"])
    assert set(exact["vec_id"]) & {403, 404, 405} == set()
    # cluster-span pruning did real work
    assert ivf_stats["tiles"] < ex_stats["tiles"], (ivf_stats, ex_stats)
