"""Event-time window operators (functions/windows.py)."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest


def _events(n=2000, seed=9):
    rng = np.random.default_rng(seed)
    base = dt.datetime(2024, 1, 1)
    ts = [
        base + dt.timedelta(seconds=int(s))
        for s in np.cumsum(rng.integers(1, 600, size=n))
    ]
    return pd.DataFrame(
        {
            "event_id": np.arange(n),
            "ts": ts,
            "user_id": rng.integers(0, 25, size=n),
            "event_type": rng.choice(["view", "click", "error"], size=n),
            "value": np.round(rng.uniform(0, 20, size=n), 2),
        }
    )


@pytest.fixture(scope="module")
def ev(ray_session):
    import ray.data

    df = _events()
    return ray.data.from_pandas(df), df


def test_tumbling_matches_pandas(ev):
    from ferret_ray.functions.windows import tumbling_window_agg

    ds, df = ev
    got = tumbling_window_agg(ds, window_sec=3600).to_pandas()
    got = got.rename(columns={"sum(n)": "n", "sum(cents)": "cents"})
    got = got.sort_values(["window_start", "event_type"]).reset_index(
        drop=True
    )

    ref = df.copy()
    ref["window_start"] = (
        ref["ts"].astype("int64") // 10**6 // 3600 * 3600
    )
    ref["cents"] = (ref["value"] * 100).round().astype("int64")
    want = (
        ref.groupby(["window_start", "event_type"])
        .agg(n=("event_id", "size"), cents=("cents", "sum"))
        .reset_index()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"n": "int64", "cents": "int64"}), want
    )
    # invariant: window totals == row totals
    assert got["n"].sum() == len(df)


def test_sliding_covers_every_slide(ev):
    from ferret_ray.functions.windows import sliding_window_agg

    ds, df = ev
    got = sliding_window_agg(
        ds, window_sec=3600, slide_sec=900
    ).to_pandas()
    got = got.rename(columns={"sum(n)": "n", "sum(cents)": "cents"})
    # every event is counted window/slide = 4 times (minus edge windows
    # clipped at t<0, none here since epoch >> window)
    assert got["n"].sum() == 4 * len(df)
    # each sliding window's count >= the tumbling window's at same start
    from ferret_ray.functions.windows import tumbling_window_agg

    tug = tumbling_window_agg(ds, window_sec=3600).to_pandas()
    tug = tug.rename(columns={"sum(n)": "n"})
    merged = got.merge(
        tug, on=["window_start", "event_type"], how="inner",
        suffixes=("_slide", "_tumble"),
    )
    assert (merged["n_slide"] >= merged["n_tumble"]).all()


def test_session_counts_match_reference(ev):
    from ferret_ray.functions.windows import session_counts

    ds, df = ev
    got = session_counts(ds, gap_sec=1800).to_pandas()
    got = got.sort_values("user_id").reset_index(drop=True)

    def count_sessions(g):
        us = np.sort(g["ts"].astype("int64").to_numpy())
        return 1 + int((np.diff(us) > 1800 * 10**6).sum())

    want = (
        df.groupby("user_id")
        .apply(count_sessions, include_groups=False)
        .rename("n_sessions")
        .reset_index()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64")
    )
