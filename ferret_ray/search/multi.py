"""MultiReader: several indexes searched as one (MultiSearcher semantics).

The reference's distributed-search precedent (c/src/search.c:1290-1750):
global df = Σ shard df, max_doc = Σ, weights computed once against the
global stats, sub-hits merged with doc-base offsets — guaranteeing
shard-count-invariant scores.  Our MultiReader implements the IndexReader
surface over N sub-readers so the ordinary Searcher produces BIT-IDENTICAL
scores to a single combined index (asserted by tests) — the correctness
backbone for doc-partitioned serving topologies.
"""

from __future__ import annotations

import numpy as np

from .reader import IndexReader, Postings


class MultiReader:
    def __init__(self, readers: list[IndexReader]):
        self.readers = readers
        self.bases = []
        base = 0
        for r in readers:
            self.bases.append(base)
            base += r.max_doc()
        self.num_docs = base
        # union of field names, first-seen order (field numbers per
        # sub-reader may differ; lookups go through names)
        self.field_names: list[str] = []
        for r in readers:
            for f in r.field_names:
                if f not in self.field_names:
                    self.field_names.append(f)
        # expose a merged config (similarity, per-field options) so
        # config-driven callers (CLI, analyzers, term vectors) work over
        # multi-delta indexes.  With dynamic schemas later deltas may
        # carry fields the first delta never saw, so union per-field
        # configs across sub-readers (first-seen wins, like add_indexes;
        # conflicting same-name configs are an error).  Tolerate an
        # empty reader list (reachable: a failed first upsert commits
        # gens.json before any delta exists) — empty index, no hits.
        if readers:
            base_cfg = dict(readers[0].manifest["config"])
            fields: dict = dict(base_cfg.get("fields", {}))
            for r in readers[1:]:
                for name, fc in r.manifest["config"].get(
                    "fields", {}
                ).items():
                    if name not in fields:
                        fields[name] = fc
                    elif fields[name] != fc:
                        raise ValueError(
                            f"conflicting configs for field {name!r} "
                            "across sub-readers"
                        )
            base_cfg["fields"] = fields
            self.manifest = {"config": base_cfg}
            self.index_dir = readers[0].index_dir  # deletes lookup only
        else:
            self.manifest = {"config": {"fields": {}}}
            self.index_dir = ""
        self.len_sums = {
            f: sum(r.len_sums.get(f, 0) for r in readers)
            for f in self.field_names
        }

    # ---- stats ----------------------------------------------------------

    def max_doc(self) -> int:
        return self.num_docs

    def match_all_docs(self) -> np.ndarray:
        """MatchAll doc universe: sub-reader universes with doc-base
        offsets (partition views compose — each delta contributes only
        its owned bands)."""
        parts = [
            r.match_all_docs() + base
            for r, base in zip(self.readers, self.bases)
        ]
        return (
            np.concatenate(parts)
            if parts else np.empty(0, dtype=np.int64)
        )

    def field_num(self, field: str) -> int:
        try:
            return self.field_names.index(field)
        except ValueError:
            return -1

    def is_indexed(self, field: str) -> bool:
        return any(r.is_indexed(field) for r in self.readers)

    def avg_doc_len(self, field: str) -> float:
        s = self.len_sums.get(field, 0)
        return s / self.num_docs if self.num_docs else 0.0

    def doc_freq(self, field: str, term: str) -> int:
        return sum(r.doc_freq(field, term) for r in self.readers)

    def doc_freq_many(self, field: str, terms: list[str]) -> dict[str, int]:
        out = {t: 0 for t in terms}
        for r in self.readers:
            if hasattr(r, "doc_freq_many"):
                for t, d in r.doc_freq_many(field, terms).items():
                    out[t] += d
            else:
                for t in terms:
                    out[t] += r.doc_freq(field, t)
        return out

    def deleted_docs(self) -> set[int]:
        """Union of sub-reader tombstones, shifted by doc bases."""
        out: set[int] = set()
        for r, base in zip(self.readers, self.bases):
            out.update(d + base for d in r.deleted_docs())
        return out

    # ---- postings -------------------------------------------------------

    def postings(self, field: str, term: str) -> Postings | None:
        docs_l, freqs_l, prx = [], [], []
        for r, base in zip(self.readers, self.bases):
            p = r.postings(field, term)
            if p is None:
                continue
            docs_l.append(p.docs + base)
            freqs_l.append(p.freqs)
            prx.extend(p.prx_parts)
        if not docs_l:
            return None
        return Postings(
            np.concatenate(docs_l), np.concatenate(freqs_l), prx
        )

    def postings_many(self, field: str, terms: list[str]):
        """Bulk fetch across sub-readers with doc-base offsets."""
        merged: dict[str, Postings] = {}
        partials: dict[str, list] = {}
        for r, base in zip(self.readers, self.bases):
            sub = (
                r.postings_many(field, terms)
                if hasattr(r, "postings_many")
                else {
                    t: p for t in terms
                    if (p := r.postings(field, t)) is not None
                }
            )
            for t, p in sub.items():
                partials.setdefault(t, []).append((p, base))
        for t, parts in partials.items():
            merged[t] = Postings(
                np.concatenate([p.docs + b for p, b in parts]),
                np.concatenate([p.freqs for p, _ in parts]),
                [pp for p, _ in parts for pp in p.prx_parts],
            )
        return merged

    def terms_with_prefix(self, field: str, prefix: str) -> list[str]:
        out: set[str] = set()
        for r in self.readers:
            out.update(r.terms_with_prefix(field, prefix))
        return sorted(out)

    def terms_in_range(self, field, lower, upper, il, iu) -> list[str]:
        out: set[str] = set()
        for r in self.readers:
            out.update(r.terms_in_range(field, lower, upper, il, iu))
        return sorted(out)

    def terms_matching(self, field, pred, prefix: str = "") -> list[str]:
        out: set[str] = set()
        for r in self.readers:
            out.update(r.terms_matching(field, pred, prefix))
        return sorted(out)

    # ---- norms / docs ---------------------------------------------------

    def norms(self, field: str) -> np.ndarray | None:
        parts = []
        for r in self.readers:
            n = r.norms(field)
            parts.append(
                n if n is not None
                else np.zeros(r.max_doc(), dtype=np.uint8)
            )
        return np.concatenate(parts)

    def doc_lens(self, field: str) -> np.ndarray | None:
        parts = []
        for r in self.readers:
            d = r.doc_lens(field)
            parts.append(
                d if d is not None
                else np.zeros(r.max_doc(), dtype=np.int32)
            )
        return np.concatenate(parts)

    def docs_column(self, col: str) -> np.ndarray | None:
        parts = []
        for r in self.readers:
            v = r.docs_column(col)
            if v is None:
                v = np.array([None] * r.max_doc(), dtype=object)
            parts.append(np.asarray(v, dtype=object))
        return np.concatenate(parts)

    def get_doc(
        self, doc_id: int, columns: list[str] | None = None
    ) -> dict:
        import bisect

        i = bisect.bisect_right(self.bases, doc_id) - 1
        return self.readers[i].get_doc(
            doc_id - self.bases[i], columns=columns
        )

    def term_vector(self, doc_id: int, field: str):
        import bisect

        i = bisect.bisect_right(self.bases, doc_id) - 1
        return self.readers[i].term_vector(doc_id - self.bases[i], field)


def multi_searcher(index_dirs: list[str], similarity: str | None = None):
    from .searcher import Searcher

    return Searcher(
        MultiReader([IndexReader(d) for d in index_dirs]),
        similarity=similarity,
    )
