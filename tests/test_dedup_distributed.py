"""MinHash-LSH dedup must never materialize the full corpus driver-side.

The round-1 implementation pulled every doc id to the driver and ran
union-find there; the rewrite broadcasts the (small) drop set into a
filter stage instead.  These tests assert both the unchanged semantics
(near-dup groups collapse to the min id) and the materialization bound:
every driver-side collection inside the operator must be O(candidates),
not O(corpus).
"""

import numpy as np
import pandas as pd
import pytest


def _corpus(n=400, dup_groups=12):
    rng = np.random.default_rng(5)
    rows = []
    vocab = [f"w{i}" for i in range(500)]
    for i in range(n):
        words = rng.choice(vocab, size=40).tolist()
        rows.append({"doc_id": i, "text": " ".join(words)})
    # make near-dup groups: copy an original with one word changed
    for g in range(dup_groups):
        base = rows[g * 3]["text"].split()
        base[5] = "CHANGED"
        rows.append({"doc_id": n + g, "text": " ".join(base)})
        rows.append({"doc_id": n + dup_groups + g, "text": rows[g * 3]["text"]})
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def dup_ds(ray_session):
    import ray.data

    return ray.data.from_pandas(_corpus()), _corpus()


def test_minhash_semantics(dup_ds):
    from ferret_ray.functions.dedup import minhash_lsh_dedup, ngram_jaccard

    ds, df = dup_ds
    pairs, survivors = minhash_lsh_dedup(ds)
    keep = sorted(int(r["doc_id"]) for r in survivors.take_all())
    n_docs = len(df)
    assert len(keep) < n_docs  # somebody was dropped
    # every verified pair really is a near-dup
    texts = dict(zip(df["doc_id"], df["text"]))
    for a, b in pairs:
        assert ngram_jaccard(texts[a], texts[b]) >= 0.8
    # exact copies always collapse to the smaller id
    for g in range(12):
        assert 400 + 12 + g not in keep  # the exact copy of doc g*3
        assert g * 3 in keep             # the original survives
    # survivors + dropped partition the id space
    dropped = set(df["doc_id"]) - set(keep)
    for d in dropped:
        assert any(d in p for p in pairs)


def test_minhash_no_corpus_materialization(dup_ds, monkeypatch):
    """Driver-side collections inside the operator are O(candidates)."""
    import ray.data

    ds, df = dup_ds
    n_docs = len(df)
    limit = n_docs // 2  # anything >= half the corpus is "materializing"

    real_to_pandas = ray.data.Dataset.to_pandas
    real_take_all = ray.data.Dataset.take_all
    sizes = []
    collected_cols: set[str] = set()

    def spy_to_pandas(self, *a, **k):
        out = real_to_pandas(self, *a, **k)
        sizes.append(len(out))
        collected_cols.update(map(str, out.columns))
        return out

    def spy_take_all(self, *a, **k):
        out = real_take_all(self, *a, **k)
        sizes.append(len(out))
        for r in out[:1]:
            collected_cols.update(map(str, r.keys()))
        return out

    monkeypatch.setattr(ray.data.Dataset, "to_pandas", spy_to_pandas)
    monkeypatch.setattr(ray.data.Dataset, "take_all", spy_take_all)

    from ferret_ray.functions.dedup import minhash_lsh_dedup

    _, survivors = minhash_lsh_dedup(ds)
    assert sizes, "expected some small-side collection"
    assert max(sizes) < limit, (
        f"driver materialized {max(sizes)} rows (corpus={n_docs}): "
        "dedup must only collect candidate pairs/texts"
    )
    # round-2 verdict #4: the verify join is distributed — candidate
    # TEXTS (or their shingle blobs) never reach the driver
    assert "text" not in collected_cols and "sh" not in collected_cols, (
        f"driver collected payload columns: {sorted(collected_cols)}"
    )
    # the survivors dataset itself still streams: consuming it is the
    # caller's choice
    assert survivors.count() <= n_docs


def test_bucket_cap_is_reported(ray_session, caplog):
    """Over-full buckets truncate loudly, never silently."""
    import logging

    import ray.data

    # 40 identical docs -> one bucket of 40 > max_bucket=10
    df = pd.DataFrame(
        {"doc_id": range(40), "text": ["same text here"] * 40}
    )
    ds = ray.data.from_pandas(df)
    from ferret_ray.functions.dedup import minhash_lsh_dedup

    with caplog.at_level(logging.WARNING, logger="ferret_ray.dedup"):
        pairs, survivors = minhash_lsh_dedup(ds, max_bucket=10)
    assert any("dropped" in r.message for r in caplog.records)
    # the kept ids still collapse the (capped) group to doc 0
    keep = sorted(int(r["doc_id"]) for r in survivors.take_all())
    assert 0 in keep and 1 not in keep


def test_ngram_jaccard_dedup_exact(dup_ds):
    """Survivors match brute-force all-pairs Jaccard with the
    drop-iff-any-smaller-id-similar rule (the SQL-oracle semantics)."""
    from ferret_ray.functions.dedup import (
        _shingle_hashes,
        _tokens,
        ngram_jaccard_dedup,
    )

    ds, df = dup_ds
    drop, surv = ngram_jaccard_dedup(ds, jaccard_threshold=0.8)
    got = sorted(int(r["doc_id"]) for r in surv.take_all())

    sets = {
        int(i): set(map(int, _shingle_hashes(_tokens(t), 3)))
        for i, t in zip(df["doc_id"], df["text"])
    }
    ids = sorted(sets)
    expect_drop = set()
    for i, b in enumerate(ids):
        for a in ids[:i]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if union and inter / union >= 0.8:
                expect_drop.add(b)
                break
    assert sorted(drop) == sorted(expect_drop)
    assert got == [i for i in ids if i not in expect_drop]
    assert len(expect_drop) > 0  # the corpus does contain near-dups


def test_ngram_gram_cap_is_reported(ray_session, caplog):
    import logging

    import ray.data

    from ferret_ray.functions.dedup import ngram_jaccard_dedup

    df = pd.DataFrame(
        {
            "doc_id": range(30),
            # one shared trigram ("common gram here") across all docs
            "text": [f"common gram here tail{i} x{i} y{i}" for i in range(30)],
        }
    )
    ds = ray.data.from_pandas(df)
    with caplog.at_level(logging.WARNING, logger="ferret_ray.dedup"):
        ngram_jaccard_dedup(ds, jaccard_threshold=0.99, max_gram_group=4)
    assert any("candidate pairs dropped" in r.message for r in caplog.records)
