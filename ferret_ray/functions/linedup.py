"""Per-document line-duplication stats — the standard boilerplate
signal for code/web corpora (docs whose lines mostly appear elsewhere
are license headers, generated files, templates).

Semantics: lines = ``text.split("\\n")`` verbatim (empty doc = one empty
line); a line occurrence is *duplicated* iff its exact content occurs
>= 2 times corpus-wide.  Reported per doc: ``n_lines`` and
``n_dup_lines``.

Scale shape (no join, no map_groups, no driver materialization):
``n_dup = n_lines - n_unique_owned`` where a globally-unique line
(count == 1) is *owned* by the single doc containing it.  So:

1. explode to (line, doc) with an IN-BATCH Arrow ``group_by`` partial
   aggregation (line -> partial count, min doc) — the combiner that
   shrinks the shuffle;
2. ONE ``groupby(line)`` sum/min — unique lines are count == 1 rows,
   whose ``min(doc_id)`` is their owner;
3. ``groupby(doc_id)`` count of owned-unique lines, unioned with the
   per-doc line totals (computed shuffle-free in pass 1's map) via the
   tag-column + sum trick instead of a join.

All three wide steps reduce hard; line text crosses the wire once.
SQL-oracle-exact (DuckDB ``string_split`` + the same set algebra).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _explode_partial(batch, text_col: str) -> pa.Table:
    """(line, partial_count, min_doc) per distinct line in the batch."""
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ids = batch.column("doc_id").to_numpy()
    lists = pc.split_pattern(col, "\n")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    off = lists.offsets.to_numpy()
    seg = np.repeat(ids, np.diff(off))
    t = pa.table({"line": flat, "doc_id": seg})
    part = t.group_by("line").aggregate(
        [("line", "count"), ("doc_id", "min")]
    )
    return pa.table(
        {
            "line": part.column("line"),
            "pcount": part.column("line_count"),
            "pmin_doc": part.column("doc_id_min"),
        }
    )


def _line_totals(batch, text_col: str) -> dict:
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = pc.add(
        pc.count_substring(col, "\n"), 1
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    return {
        "doc_id": batch.column("doc_id").to_numpy(),
        "n_lines": n,
        "n_unique_owned": np.zeros(len(n), dtype=np.int64),
    }


def line_dup_stats(ds, text_col: str = "text"):
    """Ray Dataset (doc_id, n_lines, n_dup_lines) for a docs Dataset."""
    from ray.data.aggregate import Count, Min, Sum

    lines = ds.map_batches(
        lambda b: _explode_partial(b, text_col), batch_format="pyarrow"
    )
    counts = lines.groupby("line").aggregate(
        Sum("pcount", alias_name="count"),
        Min("pmin_doc", alias_name="owner"),
    )
    uniq_owned = (
        counts.filter(expr="count == 1")
        .groupby("owner")
        .aggregate(Count(alias_name="n_unique_owned"))
        .map_batches(
            lambda b: {
                "doc_id": b.column("owner"),
                "n_lines": np.zeros(b.num_rows, dtype=np.int64),
                "n_unique_owned": b.column("n_unique_owned"),
            },
            batch_format="pyarrow",
        )
    )
    totals = ds.map_batches(
        lambda b: _line_totals(b, text_col), batch_format="pyarrow"
    )
    merged = (
        totals.union(uniq_owned)
        .groupby("doc_id")
        .aggregate(
            Sum("n_lines", alias_name="n_lines"),
            Sum("n_unique_owned", alias_name="n_unique_owned"),
        )
    )

    def finish(b):
        n_lines = b.column("n_lines").to_numpy()
        uniq = b.column("n_unique_owned").to_numpy()
        return {
            "doc_id": b.column("doc_id"),
            "n_lines": n_lines,
            "n_dup_lines": (n_lines - uniq).astype(np.int64),
        }

    return merged.map_batches(finish, batch_format="pyarrow")
