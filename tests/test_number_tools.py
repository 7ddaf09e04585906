"""Lex number/date encodings (ruby/lib/ferret/number_tools.rb parity).

The key property (the reference documents it as the contract): for any
two integers a < b, to_s_lex(a) < to_s_lex(b) as strings — so term
ranges over encoded fields behave like numeric ranges.
"""

import datetime as dt

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from ferret_ray.functions.number_tools import (
    date_to_s_lex,
    encode_int_column,
    encode_timestamp_column,
    to_i_lex,
    to_s_lex,
    to_s_pad,
)


@settings(max_examples=300)
@given(st.integers(-(10**30), 10**30), st.integers(-(10**30), 10**30))
def test_lex_order_preserved(a, b):
    sa, sb = to_s_lex(a), to_s_lex(b)
    assert (a < b) == (sa < sb)
    assert (a == b) == (sa == sb)


@settings(max_examples=200)
@given(st.integers(-(10**30), 10**30))
def test_lex_roundtrip(n):
    assert to_i_lex(to_s_lex(n)) == n


def test_ruby_examples():
    # documented examples from number_tools.rb
    assert to_s_pad(123, 5) == "  123"
    assert to_s_pad(-123, 5) == " -123"
    # spot values of the encoding itself
    assert to_s_lex(0) == "00010"
    assert to_s_lex(5) == "00015"
    assert to_s_lex(-5) == "-99995"


def test_date_lex():
    d = dt.date(2024, 3, 7)
    assert date_to_s_lex(d, "year") == "2024"
    assert date_to_s_lex(d, "month") == "2024-03"
    assert date_to_s_lex(d, "day") == "2024-03-07"
    t = dt.datetime(2024, 3, 7, 13, 5, 9)
    assert date_to_s_lex(t, "second") == "2024-03-07 13:05:09"
    # lexicographic == chronological at fixed precision
    assert date_to_s_lex(dt.date(2024, 3, 7)) < date_to_s_lex(
        dt.date(2024, 11, 2)
    )


def test_column_encoders():
    ints = pa.array([-120, -5, 0, 3, 3, 4007])
    enc = encode_int_column(ints).to_pylist()
    assert enc == sorted(enc)
    assert [to_i_lex(s) for s in enc] == [-120, -5, 0, 3, 3, 4007]

    ts = pa.array(
        np.array(
            ["2024-01-05T10:00:00", "2024-02-01T00:00:00"],
            dtype="datetime64[us]",
        )
    )
    assert encode_timestamp_column(ts, "day").to_pylist() == [
        "2024-01-05", "2024-02-01",
    ]
    assert encode_timestamp_column(ts, "month").to_pylist() == [
        "2024-01", "2024-02",
    ]
    assert encode_timestamp_column(ts, "second").to_pylist() == [
        "2024-01-05 10:00:00", "2024-02-01 00:00:00",
    ]


def test_range_query_over_encoded_field(ray_session, tmp_path):
    """End to end: index a lex-encoded numeric field, range-query it as
    terms (the reference's numeric-range idiom)."""
    import os

    import pyarrow.parquet as pq

    from ferret_ray.pipelines.build import build_index
    from ferret_ray.schema import FieldConfig, IndexConfig
    from ferret_ray.search.query import RangeQuery
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher

    prices = [-50, -3, 0, 7, 19, 120, 4007]
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table(
            {
                "name": [f"item{i}" for i in range(len(prices))],
                "price_lex": [to_s_lex(p) for p in prices],
            }
        ),
        corpus,
    )
    cfg = IndexConfig(
        fields={
            "name": FieldConfig(analyzer="keyword", positions=False),
            "price_lex": FieldConfig(analyzer="keyword",
                                     positions=False),
        },
        num_shards=2,
    )
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, cfg)
    s = Searcher(IndexReader(idx))
    q = RangeQuery("price_lex", to_s_lex(-10), to_s_lex(100), True, True)
    hits = sorted(h.doc for h in s.search(q, 0, 10).hits)
    assert hits == [1, 2, 3, 4]  # -3, 0, 7, 19
