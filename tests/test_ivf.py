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
