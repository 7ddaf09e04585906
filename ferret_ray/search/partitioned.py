"""Shard-partitioned serving: each actor owns a doc-range SUBSET.

The distributed MultiSearcher (VERDICT r3 #1; reference precedent
c/src/search.c:1290-1548, the CachedDFSearcher that computes weights
once from summed global dfs and merges per-searcher top-k with the
hit_lt tie-break).  Unlike the replica pool
(pipelines/search_pipeline.py — every actor opens the WHOLE index), a
PartitionedSearcherPool gives actor ``a`` only the doc ranges
``ranges[a::n]`` of every term-hash shard (salt = range * num_shards +
shard), so per-actor dictionary/postings bytes shrink ~1/N — the shape
where no node has to hold the whole dictionary set.

Protocol per query batch (two actor rounds, dictionary-only phase 1):

1. **stats**: every actor runs the weight/rewrite machinery over its
   partition with a recording reader proxy, returning (a) local df per
   (field, term) it looked up and (b) every RAW dictionary enumeration
   it performed, keyed by the memo keys in searcher.py (``twp`` /
   ``wildraw`` / ``tir`` / ``typedrange`` — all uncapped sorted lists).
2. **merge (driver)**: global df = Σ local df; global enumeration =
   sorted union per key.  Both are exact because enumerations are pure
   dictionary scans (a term matches iff it exists in ≥1 partition) and
   a doc lives in exactly one partition.
3. **topk**: every actor re-runs the ordinary Searcher over an overlay
   proxy that answers doc_freq from the global map and expansion(key)
   from the merged lists — so weights, expansions, caps and boosts are
   computed from GLOBAL stats on every actor, while postings access
   stays partition-local.  Per-doc scores are then bit-identical to a
   single combined reader (each doc's postings live wholly in one
   partition).  The driver merges per-actor candidates with the
   (score desc, doc asc) hit_lt order and sums total_hits.

Raw Ray actors (not Dataset map_batches) are used deliberately: the
two-round broadcast/gather exchange per batch is shared-state
coordination the Dataset API cannot express.

Round 5 closes the former gaps: ``MatchAllQuery`` (each partition
reader now scores only its OWNED doc bands via ``match_all_docs``, so
every doc is scored exactly once), explicit ``sort=`` (partitions
ship per-hit sort-field VALUES and the driver merges on the values
through the Searcher's own key function — the FieldDoc merge of
``msea_search``, c/src/search.c:1550-1750), and ``post_filter``
(picklable (doc, score) -> factor callables ship by cloudpickle and
run against each partition's disjoint doc set, so filtered totals and
factor-scaled scores merge exactly).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..state.fs import (
    fs_exists,
    fs_file_size,
    join as fs_join,
    resolve_fs,
)
from ..state.manifest import read_json, read_manifest

#: expansion-key families whose values are raw, uncapped, sorted term
#: lists — the only ones exchanged/merged across partitions (capped /
#: boosted expansions are rebuilt deterministically from these)
RAW_KEYS = ("twp", "wildraw", "tir", "typedrange")


class _ReaderProxy:
    """Delegating reader wrapper; subclasses intercept doc_freq and
    expansion.  Everything else (postings, norms, manifest, enum...)
    passes through to the wrapped partition reader."""

    def __init__(self, base):
        self._base = base

    def __getattr__(self, name):
        return getattr(self._base, name)


class _Recorder(_ReaderProxy):
    """Phase-1 proxy: observes df lookups and raw enumerations.

    Recorded values double as a persistent memo (the dictionary is
    immutable per generation), and ``touched_*`` track the keys used by
    the current stats call so only those ship to the driver."""

    def __init__(self, base):
        super().__init__(base)
        self.df_memo: dict[tuple, int] = {}
        self.exp_memo: dict[tuple, list] = {}
        self.touched_df: set[tuple] = set()
        self.touched_exp: set[tuple] = set()

    def doc_freq(self, field: str, term: str) -> int:
        key = (field, term)
        v = self.df_memo.get(key)
        if v is None:
            v = self._base.doc_freq(field, term)
            self.df_memo[key] = v
        self.touched_df.add(key)
        return v

    def doc_freq_many(self, field: str, terms: list) -> dict:
        """Bulk df, recorded term-by-term so phase-1/phase-2 exchange
        still sees every key (the searcher's MultiTermWeight fast path
        would otherwise bypass the proxy via __getattr__)."""
        out: dict = {}
        missing = []
        for t in terms:
            v = self.df_memo.get((field, t))
            if v is None:
                missing.append(t)
            else:
                out[t] = v
        if missing:
            many = getattr(self._base, "doc_freq_many", None)
            got = (
                many(field, missing) if many is not None
                else {t: self._base.doc_freq(field, t) for t in missing}
            )
            for t, v in got.items():
                self.df_memo[(field, t)] = v
                out[t] = v
        for t in terms:
            self.touched_df.add((field, t))
        return out

    def expansion(self, key, build):
        if key[0] in RAW_KEYS:
            v = self.exp_memo.get(key)
            if v is None:
                v = build()
                self.exp_memo[key] = v
            self.touched_exp.add(key)
            return v
        # capped/boosted families: never memoize here (they'd capture
        # partition-local caps); rebuild — their raw inner scans hit
        # the memo above
        return build()


class _Overlay(_ReaderProxy):
    """Phase-2 proxy: global df + merged raw enumerations injected per
    batch; anything else delegates (and for keys outside the raw
    families the base reader's own memo builds from the overlaid raw
    lists, so cached boosted expansions are global too)."""

    def __init__(self, base):
        super().__init__(base)
        self.df_map: dict[tuple, int] = {}
        self.exp_map: dict[tuple, list] = {}

    def doc_freq(self, field: str, term: str) -> int:
        v = self.df_map.get((field, term))
        if v is not None:
            return v
        return self._base.doc_freq(field, term)

    def doc_freq_many(self, field: str, terms: list) -> dict:
        """Bulk df with the GLOBAL overlay applied per term (the
        searcher's MultiTermWeight fast path must not fall through to
        partition-local dfs via __getattr__)."""
        return {t: self.doc_freq(field, t) for t in terms}

    def expansion(self, key, build):
        v = self.exp_map.get(key)
        if v is not None:
            return v
        base_exp = getattr(self._base, "expansion", None)
        return base_exp(key, build) if base_exp is not None else build()


def _probe_scorer_enums(searcher, q) -> None:
    """Trigger the dictionary enumerations the SCORER will perform
    (weight() already triggers rewrite/df/span enums); reject query
    shapes partitioned serving cannot merge."""
    from .filters import QueryFilter, RangeFilter
    from .query import (
        BooleanQuery,
        ConstantScoreQuery,
        FilteredQuery,
        MatchAllQuery,
        RangeQuery,
    )
    from .searcher import range_expand

    if isinstance(q, MatchAllQuery):
        # supported since round 5: each partition reader scores only
        # its OWNED doc bands (reader.match_all_docs), so every doc is
        # scored in exactly one partition and the merged result equals
        # the single searcher's
        return
    if isinstance(q, RangeQuery):
        range_expand(searcher.reader, q)
    elif isinstance(q, BooleanQuery):
        for c in q.clauses:
            _probe_scorer_enums(searcher, c.query)
    elif isinstance(q, ConstantScoreQuery):
        _probe_filter(searcher, q.filter)
    elif isinstance(q, FilteredQuery):
        _probe_scorer_enums(searcher, q.query)
        _probe_filter(searcher, q.filter)


def _probe_filter(searcher, f) -> None:
    from .filters import QueryFilter, RangeFilter
    from .searcher import range_expand, rewrite

    if isinstance(f, RangeFilter):
        range_expand(searcher.reader, f.range)
    elif isinstance(f, QueryFilter):
        w = searcher.weight(f.query)
        _probe_scorer_enums(searcher, w.query)


def _owned_ranges(manifest: dict, part: int, n_parts: int) -> set[int]:
    """Round-robin split of ALL doc bands (0..n_bands-1), not just the
    bands that happen to have shard files: MatchAll doc ownership must
    cover every doc, including docs in a band with no postings (e.g.
    all-empty-text docs).  A shardless band carries no dictionary bytes,
    so the byte split is unchanged."""
    ns = manifest["config"]["num_shards"]
    band = int(manifest["config"]["salt_doc_range"])
    existing = {ss // ns for ss in manifest["shards"]}
    n_bands = max(
        -(-int(manifest["num_docs"]) // band) if band else 0,
        (max(existing) + 1) if existing else 0,
    )
    return set(range(n_bands)[part::n_parts])


def open_partition_reader(index_dir: str, part: int, n_parts: int):
    """Partition ``part``/``n_parts`` view of a plain index dir or an
    LSM root: each delta's doc ranges are split round-robin, so every
    actor holds ~1/N of every delta's dictionary + postings while
    global stats (num_docs, len_sums) stay exact."""
    from .multi import MultiReader
    from .reader import IndexReader

    fs, root = resolve_fs(index_dir)
    if fs_exists(fs, fs_join(root, "gens.json")):
        state = read_json(fs_join(index_dir, "gens.json"))
        dirs = [fs_join(index_dir, d) for d in state["deltas"]]
        subs = []
        for d in dirs:
            m = read_manifest(d)
            subs.append(
                IndexReader(d, owned_ranges=_owned_ranges(m, part, n_parts))
            )
        return MultiReader(subs)
    m = read_manifest(index_dir)
    if m is None:
        raise FileNotFoundError(f"no manifest in {index_dir}")
    return IndexReader(
        index_dir, owned_ranges=_owned_ranges(m, part, n_parts)
    )


class PartitionWorker:
    """One partition's searcher (wrapped by ray.remote in the pool; the
    class itself is plain Python so tests can drive it in-process)."""

    def __init__(self, index_dir: str, part: int, n_parts: int,
                 similarity: str | None = None):
        from .searcher import Searcher

        self.base = open_partition_reader(index_dir, part, n_parts)
        self._recorder = _Recorder(self.base)
        self._rec_searcher = Searcher(self._recorder, similarity)
        self._overlay = _Overlay(self.base)
        self.searcher = Searcher(self._overlay, similarity)

    def stats(self, queries: list) -> tuple[dict, dict]:
        """Local df + raw enumerations for a query batch."""
        import copy

        self._recorder.touched_df = set()
        self._recorder.touched_exp = set()
        for q in queries:
            # rewrite() mutates query trees in place (clauses replaced
            # by expanded MultiTermQueries) — never let the recording
            # pass bake PARTITION-LOCAL expansions into the caller's
            # objects, which phase 2 then searches
            w = self._rec_searcher.weight(copy.deepcopy(q))
            _probe_scorer_enums(self._rec_searcher, w.query)
        dfs = {
            k: self._recorder.df_memo[k]
            for k in self._recorder.touched_df
        }
        exps = {
            k: self._recorder.exp_memo[k]
            for k in self._recorder.touched_exp
        }
        return dfs, exps

    def topk(self, queries: list, df_map: dict, exp_map: dict,
             need: int, sort: list | None = None,
             post_filter=None) -> list[tuple]:
        """Per-query local top-``need`` with GLOBAL weights.

        With ``sort``, each entry additionally carries the hits' raw
        sort-field VALUES (one list per sort field; None for score/doc
        fields) — the FieldDoc values the driver's value-based merge
        re-ranks on (msea_search, c/src/search.c:1550-1750).  Local
        ranks are partition-relative but rank order IS value order, so
        the local top-``need`` is always a superset of this partition's
        contribution to the global top-``need``.

        ``post_filter`` (a picklable (doc, score) -> factor callable,
        shipped by cloudpickle) is applied locally: every doc lives in
        exactly one partition, so filtering + factor-scaling each
        partition's candidates before its local top-``need`` equals the
        single searcher's post-filtered candidate set restricted to
        this partition (sea_search_w post_filter,
        c/src/search.c:1029-1061)."""
        import copy

        self._overlay.df_map = df_map
        self._overlay.exp_map = exp_map
        out = []
        for q in queries:
            td = self.searcher.search(
                copy.deepcopy(q), 0, need, sort=sort,
                post_filter=post_filter,
            )
            docs = np.array([h.doc for h in td.hits], dtype=np.int64)
            vals = None
            if sort:
                vals = []
                for sf in sort:
                    if sf.type in ("score", "doc"):
                        vals.append(None)
                        continue
                    col = self.base.docs_column(sf.field)
                    vals.append(
                        [col[d] for d in docs] if col is not None
                        else None
                    )
            out.append((
                docs,
                np.array([h.score for h in td.hits], dtype=np.float32),
                td.total_hits,
                td.max_score,
                vals,
            ))
        return out

    def wand(self, field: str, terms: list[str], df_map: dict,
             k: int) -> tuple[list[tuple[int, float]], dict]:
        """Block-max WAND top-k over this partition's OWNED doc bands
        with GLOBAL term weights (df overlay).  Each doc lives in
        exactly one partition and wand_topk is exact per reader, so the
        driver's (score desc, doc asc) merge of per-partition top-k
        lists IS the global exact top-k — same result, 1/N of the
        postings decoded and pruned per actor."""
        from .wand import wand_topk

        self._overlay.df_map = df_map
        self._overlay.exp_map = {}
        r = wand_topk(self.searcher, field, terms, k)
        return r.hits, r.stats

    def dictionary_bytes(self) -> int:
        """Compressed dictionary+postings bytes of the doc bands this
        partition owns — the 1/N_actors memory-evidence metric.
        Format v8 packs every band of a hash shard into one file pair,
        so ownership is per ROW-GROUP RUN: sum the owned salts'
        row-group ``total_compressed_size`` from the two footers (reads
        metadata only — the data row groups themselves are never
        fetched for bands the partition doesn't own)."""
        from ..stages.merge import POST_RG_SIZE, _file_band_spans

        total = 0
        for r in getattr(self.base, "readers", [self.base]):
            owned = set(int(s) for s in r._shard_salts)
            cfg = r.manifest["config"]
            for sid in sorted({s % r.num_shards for s in owned}):
                spans = _file_band_spans(
                    r._fs, r._root, sid, r.num_shards,
                    int(cfg["salt_doc_range"]),
                )
                dmd = r._file_for(sid).pf.metadata
                pmd = r._file_for(sid).pf_post.metadata
                prg = 0
                for salt, _rs, rows, rg_start in spans:
                    ndrg = 0
                    got = 0
                    while got < rows:
                        got += dmd.row_group(rg_start + ndrg).num_rows
                        ndrg += 1
                    nprg = (rows + POST_RG_SIZE - 1) // POST_RG_SIZE
                    if salt in owned:
                        for i in range(rg_start, rg_start + ndrg):
                            rg = dmd.row_group(i)
                            total += sum(
                                rg.column(c).total_compressed_size
                                for c in range(rg.num_columns)
                            )
                        for i in range(prg, prg + nprg):
                            rg = pmd.row_group(i)
                            total += sum(
                                rg.column(c).total_compressed_size
                                for c in range(rg.num_columns)
                            )
                    prg += nprg
        return total


def merge_stats(
    per_actor: list[tuple[dict, dict]]
) -> tuple[dict, dict]:
    """Global df = Σ partition df; global enumeration = sorted union."""
    df_map: dict[tuple, int] = {}
    exp_sets: dict[tuple, set] = {}
    for dfs, exps in per_actor:
        for k, v in dfs.items():
            df_map[k] = df_map.get(k, 0) + int(v)
        for k, terms in exps.items():
            exp_sets.setdefault(k, set()).update(terms)
    exp_map = {k: sorted(s) for k, s in exp_sets.items()}
    return df_map, exp_map


def merge_topk(
    per_actor: list[tuple], first_doc: int, num_docs: int,
    sort: list | None = None,
) -> tuple[list[tuple[int, float]], int, float]:
    """hit_lt merge of per-partition candidates (score desc, doc asc),
    or — with ``sort`` — the FieldDoc-VALUE merge of msea_search
    (c/src/search.c:1550-1750): per-hit column values shipped by the
    partitions are re-keyed through the Searcher's own
    sort_key_from_values, so the merged order is identical to a single
    searcher's (ranks recomputed over the merged candidate set are
    order-isomorphic to ranks over the full corpus)."""
    docs = np.concatenate([p[0] for p in per_actor])
    scores = np.concatenate([p[1] for p in per_actor])
    total = int(sum(p[2] for p in per_actor))
    max_score = float(max((p[3] for p in per_actor), default=0.0))
    if sort:
        from .searcher import sort_key_from_values

        keys: list[np.ndarray] = [docs]
        for fi in reversed(range(len(sort))):
            sf = sort[fi]
            vals = None
            if sf.type not in ("score", "doc"):
                per = [p[4][fi] for p in per_actor]
                if any(v is not None for v in per):
                    vals = np.concatenate([
                        np.asarray(
                            v if v is not None else [None] * len(p[0]),
                            dtype=object,
                        )
                        for p, v in zip(per_actor, per)
                    ]) if docs.size else np.empty(0, dtype=object)
            keys.append(sort_key_from_values(sf, vals, docs, scores))
        order = np.lexsort(keys)
    else:
        order = np.lexsort((docs, -scores))
    sel = order[first_doc: first_doc + num_docs]
    return (
        [(int(docs[i]), float(scores[i])) for i in sel],
        total,
        max_score,
    )


class PartitionedSearcherPool:
    """N ray actors, each owning 1/N of every shard's doc ranges."""

    def __init__(self, index_dir: str, n_partitions: int = 4,
                 default_field: str = "content",
                 similarity: str | None = None,
                 num_cpus: float = 1.0):
        import ray

        from ..analysis import standard_analyzer
        from .fql import FQLParser

        self.n = n_partitions
        # The pool is gang-scheduled: every query batch ray.get()s all N
        # actors, so a reservation the cluster can't co-schedule hangs
        # forever (seen: n_partitions=3 x 1 CPU in a 2-CPU session).
        # Auto-fit the per-actor reservation, loudly.  Skipped when Ray
        # isn't up yet — the first .remote() call auto-initializes it,
        # and the fresh local session always fits the default 1.0.
        total_cpu = (
            float(ray.cluster_resources().get("CPU", 0) or 0)
            if ray.is_initialized()
            else 0.0
        )
        if total_cpu and num_cpus * n_partitions > total_cpu:
            import logging
            import math

            # floor to 0.01 granularity so n x fitted <= total_cpu holds
            # EXACTLY (ray rejects fractional reservations finer than
            # 1e-4; 0.01 keeps the arithmetic legible in logs)
            fitted = math.floor(100.0 * total_cpu / (n_partitions + 1)) / 100
            fitted = min(num_cpus, fitted)
            if fitted <= 0 or fitted * n_partitions > total_cpu:
                raise ValueError(
                    f"PartitionedSearcherPool: {n_partitions} partitions "
                    f"cannot co-schedule on {total_cpu:.0f} CPUs even at "
                    f"the minimum per-actor reservation; lower "
                    f"n_partitions or grow the cluster"
                )
            logging.getLogger(__name__).warning(
                "PartitionedSearcherPool: %d x num_cpus=%.2f exceeds the "
                "cluster's %.0f CPUs and would never co-schedule; "
                "lowering per-actor reservation to %.2f",
                n_partitions, num_cpus, total_cpu, fitted,
            )
            num_cpus = fitted
        worker_cls = ray.remote(num_cpus=num_cpus)(PartitionWorker)
        self.workers = [
            worker_cls.remote(index_dir, i, n_partitions, similarity)
            for i in range(n_partitions)
        ]
        # parser setup mirrors SearcherActor: indexed fields from the
        # manifest(s) — dictionary never touches the driver
        fields = self._indexed_fields(index_dir)
        self.parser = FQLParser(analyzer=standard_analyzer())
        for f in fields:
            self.parser.add_field(f, default=(f == default_field),
                                  tokenized=True)

    @staticmethod
    def _indexed_fields(index_dir: str) -> list[str]:
        fs, root = resolve_fs(index_dir)
        if fs_exists(fs, fs_join(root, "gens.json")):
            state = read_json(fs_join(index_dir, "gens.json"))
            dirs = [fs_join(index_dir, d) for d in state["deltas"]]
        else:
            dirs = [index_dir]
        out: list[str] = []
        for d in dirs:
            m = read_manifest(d)
            for f in m["field_names"]:
                fc = m["config"]["fields"].get(f)
                if fc and fc.get("indexed", True) and f not in out:
                    out.append(f)
        return out

    def search_queries(self, queries: list, first_doc: int = 0,
                       num_docs: int = 10,
                       sort: list | None = None,
                       post_filter=None) -> list[tuple]:
        """Parsed-query batch -> [(hits, total_hits, max_score)].

        ``sort`` (list[SortField]) applies to every query in the batch;
        per-partition candidates carry their sort-field values and the
        driver merges on the VALUES (msea_search semantics), so results
        are bit-identical to the single searcher for every sort type
        incl. string/byte fields.

        ``post_filter`` (applies to every query in the batch) must be a
        PICKLABLE (doc, score) -> factor callable — a module-level
        function or a lambda over plain data; Ray ships it to each
        partition actor by cloudpickle and it runs against the
        partition's disjoint doc set, so totals / factor-scaled scores
        merge exactly."""
        import ray

        need = first_doc + num_docs
        stats = ray.get([w.stats.remote(queries) for w in self.workers])
        df_map, exp_map = merge_stats(stats)
        # put the merged global maps ONCE — wide expansions (wildcard /
        # fuzzy batches) would otherwise be re-serialized into every
        # actor's task args, N copies per round
        df_ref, exp_ref = ray.put(df_map), ray.put(exp_map)
        results = ray.get([
            w.topk.remote(queries, df_ref, exp_ref, need, sort,
                          post_filter)
            for w in self.workers
        ])
        out = []
        for qi in range(len(queries)):
            out.append(
                merge_topk(
                    [r[qi] for r in results], first_doc, num_docs, sort
                )
            )
        return out

    def wand_topk(self, field: str, terms: list[str], k: int = 10):
        """Distributed block-max WAND: exact top-k of the coord-disabled
        SHOULD-disjunction of ``terms`` (same contract as
        wand.wand_topk on a whole-index reader, asserted identical by
        tests).  Phase 1 exchanges per-term df (TermQuery probes through
        the recorder); phase 2 runs per-partition WAND with the global
        weights; the driver merges N top-k lists by (score desc, doc
        asc) — exact because partitions' doc spaces are disjoint."""
        import ray

        from .query import TermQuery
        from .wand import WandResult

        probes = [TermQuery(field, t) for t in terms]
        stats = ray.get([w.stats.remote(probes) for w in self.workers])
        df_map, _ = merge_stats(stats)
        df_ref = ray.put(df_map)
        results = ray.get([
            w.wand.remote(field, terms, df_ref, k)
            for w in self.workers
        ])
        hits = [h for r in results for h in r[0]]
        hits.sort(key=lambda x: (-x[1], x[0]))
        agg: dict = {}
        for _, st in results:
            for key, v in st.items():
                agg[key] = agg.get(key, 0) + v
        return WandResult(hits[:k], agg.get("docs_scored", 0), agg)

    def search_batch(self, queries: list[str], k: int = 10):
        """FQL string batch -> pandas frame with the replica-pool
        schema (query, rank, doc_id, score, total_hits)."""
        import pandas as pd

        parsed, kept = [], []
        for qs in queries:
            q = self.parser.parse(str(qs))
            if q is not None:
                parsed.append(q)
                kept.append(str(qs))
        rows: dict[str, list] = {
            "query": [], "rank": [], "doc_id": [], "score": [],
            "total_hits": [],
        }
        if parsed:
            for qs, (hits, total, _mx) in zip(
                kept, self.search_queries(parsed, 0, k)
            ):
                for rank, (doc, score) in enumerate(hits):
                    rows["query"].append(qs)
                    rows["rank"].append(rank)
                    rows["doc_id"].append(doc)
                    rows["score"].append(score)
                    rows["total_hits"].append(total)
        return pd.DataFrame(rows)

    def dictionary_bytes(self) -> list[int]:
        import ray

        return ray.get(
            [w.dictionary_bytes.remote() for w in self.workers]
        )

    def shutdown(self) -> None:
        import ray

        for w in self.workers:
            ray.kill(w)
        self.workers = []
