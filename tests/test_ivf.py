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
