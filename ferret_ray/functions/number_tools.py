"""Lexicographically-ordered number / date encodings.

The reference indexes only byte strings; its Ruby layer provides
order-preserving encodings so numeric and date fields sort and
range-query correctly as terms (ruby/lib/ferret/number_tools.rb).
These are the same algorithms: ``to_s_lex`` (length-prefixed decimal
with ten's-complement negatives), ``to_s_pad``, and the date/time
precision formats — plus vectorized Arrow column encoders for use
inside ``map_batches`` when preparing typed fields for indexing.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa

LEN_STR_SIZE = 4  # ruby/lib/ferret/number_tools.rb:16
NEG_LEN_MASK = 10 ** LEN_STR_SIZE

LEX_FORMAT = {
    "year": "%Y",
    "month": "%Y-%m",
    "day": "%Y-%m-%d",
    "hour": "%Y-%m-%d %H",
    "minute": "%Y-%m-%d %H:%M",
    "second": "%Y-%m-%d %H:%M:%S",
    "millisecond": "%Y-%m-%d %H:%M:%S",
}


def to_s_lex(n: int) -> str:
    """Integer#to_s_lex (number_tools.rb:23-37): lexicographic order ==
    numeric order for any mix of signs and magnitudes."""
    if n >= 0:
        num_str = str(n)
        return f"%0{LEN_STR_SIZE}d" % len(num_str) + num_str
    num = -n
    num_str = str(num)
    num_len = len(num_str)
    len_str = f"%0{LEN_STR_SIZE}d" % (NEG_LEN_MASK - num_len)
    comp = 10 ** num_len - num  # ten's complement
    return f"-{len_str}%0{num_len}d" % comp


def to_i_lex(s: str) -> int:
    """String#to_i_lex (number_tools.rb:104-111)."""
    if s.startswith("-"):
        return int(s[LEN_STR_SIZE + 1:]) - 10 ** (
            len(s) - LEN_STR_SIZE - 1
        )
    return int(s[LEN_STR_SIZE:])


def to_s_pad(n: int, width: int = 10) -> str:
    """Integer#to_s_pad (number_tools.rb:48-50)."""
    return f"%{width}d" % n


def date_to_s_lex(d, precision: str = "day") -> str:
    """Date/DateTime/Time#to_s_lex (number_tools.rb:55-97)."""
    return d.strftime(LEX_FORMAT[precision])


def to_date_lex(s: str) -> "_dt.date":
    """String#to_date_lex: parse back a year/month/day-precision term
    (missing parts default like the reference's strptime fallback)."""
    parts = [int(x) for x in s.replace(":", "-").replace(" ", "-").split("-")]
    parts += [1] * (3 - len(parts))
    return _dt.date(parts[0], parts[1], parts[2])


# ---- vectorized column encoders (map_batches-ready) -----------------------

def encode_int_column(col) -> pa.Array:
    """to_s_lex over an Arrow/numpy integer column (vectorized where it
    matters: one pass over values, Python formatting per distinct-ish
    value only through a memo)."""
    vals = (
        col.to_numpy(zero_copy_only=False)
        if hasattr(col, "to_numpy") else np.asarray(col)
    )
    memo: dict[int, str] = {}
    out = []
    for v in vals.tolist():
        s = memo.get(v)
        if s is None:
            s = to_s_lex(int(v))
            memo[v] = s
        out.append(s)
    return pa.array(out, type=pa.string())


def encode_timestamp_column(col, precision: str = "day") -> pa.Array:
    """Date-precision lex strings from an Arrow timestamp column using
    vectorized numpy datetime math (no per-row strftime for day/month/
    year precision)."""
    us = col.cast(pa.int64()).to_numpy()
    dt64 = us.astype("datetime64[us]")
    if precision == "year":
        return pa.array(
            np.datetime_as_string(dt64, unit="Y").tolist(),
            type=pa.string(),
        )
    if precision == "month":
        return pa.array(
            np.datetime_as_string(dt64, unit="M").tolist(),
            type=pa.string(),
        )
    if precision == "day":
        return pa.array(
            np.datetime_as_string(dt64, unit="D").tolist(),
            type=pa.string(),
        )
    fmt = LEX_FORMAT[precision]
    return pa.array(
        [
            _dt.datetime.utcfromtimestamp(u / 1e6).strftime(fmt)
            for u in us
        ],
        type=pa.string(),
    )
