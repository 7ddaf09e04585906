"""scrub_pii / chunk_text / line_dup_stats unit tests (edge cases; the
sf0.01 oracle equivalence runs in test_entry_oracle.py)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_scrub_pii_counts_and_text():
    from ferret_ray.functions.scrub import scrub_pii

    texts = [
        "mail a@b.co from 10.0.0.1 key deadbeef" + "0" * 24 + " end",
        "two e-mails: x@y.io, z.w+q@foo-bar.org",
        "9999.1.2.3 is not an ip boundary case 1.2.3.4 is",
        "",
        "short hex deadbeef stays",
    ]
    out = scrub_pii(
        pa.table({"doc_id": np.arange(len(texts)), "text": texts})
    )
    assert list(out["n_email"]) == [1, 2, 0, 0, 0]
    assert list(out["n_ipv4"]) == [1, 0, 1, 0, 0]
    assert list(out["n_hexkey"]) == [1, 0, 0, 0, 0]
    scrubbed = out["text"].to_pylist()
    assert scrubbed[0] == "mail [EMAIL] from [IP] key [KEY] end"
    assert "@" not in scrubbed[1]
    assert "1.2.3.4" not in scrubbed[2]
    assert scrubbed[4] == "short hex deadbeef stays"


def test_chunk_text_window_algebra():
    from ferret_ray.functions.chunk import chunk_text

    t = pa.table(
        {"doc_id": [0, 1, 2], "text": ["abcdefghij", "", "xy"]}
    )
    out = chunk_text(t, size=4, stride=3).to_pandas()
    d0 = out[out.doc_id == 0].sort_values("chunk_id")
    # windows [0:4) [3:7) [6:10) [9:13)
    assert list(d0.chunk) == ["abcd", "defg", "ghij", "j"]
    assert len(out[out.doc_id == 1]) == 0  # empty doc: no chunks
    assert list(out[out.doc_id == 2].chunk) == ["xy"]
    # full reconstruction invariant: concatenating stride-prefixes of
    # all chunks plus the last chunk's tail == original text
    rec = "".join(c[:3] for c in list(d0.chunk)[:-1]) + list(d0.chunk)[-1]
    assert rec == "abcdefghij"
    with pytest.raises(ValueError):
        chunk_text(t, size=0, stride=3)


def test_chunk_text_unicode_codepoints():
    from ferret_ray.functions.chunk import chunk_text

    t = pa.table({"doc_id": [0], "text": ["héllo wörld ünïcödé"]})
    out = chunk_text(t, size=5, stride=5).to_pandas()
    assert "".join(out.chunk) == "héllo wörld ünïcödé"
    con = duckdb.connect()
    for _, r in out.iterrows():
        exp = con.sql(
            "SELECT substring(?, CAST(? AS INT), 5)",
            params=["héllo wörld ünïcödé", int(r.chunk_id) * 5 + 1],
        ).fetchone()[0]
        assert r.chunk == exp


def test_line_dup_stats_within_and_across_docs(ray_session):
    import ray.data

    from ferret_ray.functions.linedup import line_dup_stats

    t = pa.table(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "license\ncode0",        # license dup across docs
                "license\ncode1",
                "same\nsame",            # dup within one doc
                "all\nunique\nlines",
            ],
        }
    )
    out = (
        line_dup_stats(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out.n_lines) == [2, 2, 2, 3]
    assert list(out.n_dup_lines) == [1, 1, 2, 0]


def test_url_domain_extraction():
    from ferret_ray.functions.urls import domain_partials, url_stats

    texts = [
        "see http://Example.com/a and https://sub.foo-bar.org:8080/x?q=1",
        "no urls here",
        "http://a.b http://a.b/path dup https://A.B",
        "",
    ]
    t = pa.table({"doc_id": np.arange(len(texts)), "text": texts})
    st = url_stats(t)
    assert list(st["n_urls"]) == [2, 0, 3, 0]
    part = domain_partials(t).to_pandas()
    got = dict(zip(part.domain, part.pcount))
    assert got == {"example.com": 1, "sub.foo-bar.org": 1, "a.b": 3}


def test_stratified_head(ray_session):
    import ray.data

    from ferret_ray.functions.sampling import stratified_head

    t = pa.table(
        {
            "doc_id": [9, 1, 5, 3, 7, 2, 8, 4, 6, 0],
            "grp": ["a", "a", "a", "b", "b", "b", "b", "c", "c", "c"],
        }
    )
    out = (
        stratified_head(
            ray.data.from_arrow(t).repartition(4), "grp", "doc_id", n=2
        )
        .to_pandas()
        .sort_values(["grp", "doc_id"])
        .reset_index(drop=True)
    )
    assert list(zip(out.grp, out.doc_id)) == [
        ("a", 1), ("a", 5), ("b", 2), ("b", 3), ("c", 0), ("c", 4),
    ]


def test_grouped_topk_exact_and_small_driver_side(ray_session, monkeypatch):
    """grouped_topk == full-sort head(k), and the driver only ever
    collects per-block top-k partials, never the full group cardinality
    (VERDICT r3 #2/#3)."""
    import ray.data

    from ferret_ray.functions.topk import grouped_topk

    rng = np.random.default_rng(7)
    n = 5000
    keys = [f"k{int(x):04d}" for x in rng.integers(0, 2000, n)]
    ds = ray.data.from_items(
        [{"domain": k, "n": int(v)} for k, v in
         zip(keys, rng.integers(1, 100, n))],
        override_num_blocks=8,
    )
    agg = ds.groupby("domain").sum("n")

    import pandas as pd
    truth = (
        agg.to_pandas()
        .sort_values(["sum(n)", "domain"], ascending=[False, True])
        .head(20)
        .reset_index(drop=True)
    )

    sizes = []
    real_to_pandas = ray.data.Dataset.to_pandas

    def spy(self, *a, **k):
        out = real_to_pandas(self, *a, **k)
        sizes.append(len(out))
        return out

    monkeypatch.setattr(ray.data.Dataset, "to_pandas", spy)
    got = grouped_topk(agg, by="sum(n)", key="domain", k=20)
    pd.testing.assert_frame_equal(got, truth)
    # full distinct-key cardinality is ~2000; driver merge must be far
    # smaller (k rows per groupby output block)
    assert max(sizes) < 500, sizes


def test_top_domains_streams(ray_session, monkeypatch):
    """top_domains: driver merges per-block top-k only."""
    import ray.data

    from ferret_ray.functions.urls import top_domains

    texts = [
        f"link http://site{i % 97}.example.org/x and http://hot.com/y"
        for i in range(3000)
    ]
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)],
        override_num_blocks=6,
    )
    sizes = []
    real_to_pandas = ray.data.Dataset.to_pandas

    def spy(self, *a, **k):
        out = real_to_pandas(self, *a, **k)
        sizes.append(len(out))
        return out

    monkeypatch.setattr(ray.data.Dataset, "to_pandas", spy)
    df = top_domains(ds, limit=5)
    assert df.domain.iloc[0] == "hot.com" and df.n.iloc[0] == 3000
    assert len(df) == 5
    assert max(sizes) < 98, sizes  # 97 distinct site domains + hot.com
