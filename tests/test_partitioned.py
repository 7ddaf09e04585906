"""Shard-partitioned serving == single combined searcher, bit-exact.

Each PartitionWorker owns 1/N of every shard's doc ranges; global df and
raw dictionary enumerations are exchanged per batch (the CachedDFSearcher
pattern, c/src/search.c:1290-1548).  The acceptance bar (VERDICT r3 #1):
partitioned results bit-identical to the single/replica searcher, and
per-actor dictionary bytes ~ 1/N_actors.
"""

import dataclasses
import os

import numpy as np
import pytest

from ferret_ray.search.partitioned import (
    PartitionWorker,
    merge_stats,
    merge_topk,
)
from ferret_ray.search.query import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    ConstantScoreQuery,
    FuzzyQuery,
    PhraseQuery,
    PrefixQuery,
    RangeQuery,
    TermQuery,
    WildcardQuery,
)


@pytest.fixture(scope="module")
def multirange_index(ray_session, tmp_path_factory):
    """3000-doc code corpus indexed with salt_doc_range=512 so every
    shard splits into ~6 doc-range files — real partitioning."""
    from ferret_ray.pipelines.build import build_index
    from ferret_ray.schema import source_code_config
    from ferret_ray.sources.corpus import generate_corpus
    from ferret_ray.state.manifest import read_manifest

    tmp = str(tmp_path_factory.mktemp("part"))
    corpus = os.path.join(tmp, "c.parquet")
    generate_corpus(corpus, 3000, rows_per_fragment=500)
    idx = os.path.join(tmp, "idx")
    cfg = dataclasses.replace(
        source_code_config(num_shards=8), salt_doc_range=512
    )
    build_index(corpus, idx, cfg)
    m = read_manifest(idx)
    ranges = {ss // 8 for ss in m["shards"]}
    assert len(ranges) >= 4, ranges  # partitioning is real
    return idx


def _partitioned(idx, queries, n_parts, need=10, first=0, sort=None,
                 post_filter=None):
    workers = [PartitionWorker(idx, i, n_parts) for i in range(n_parts)]
    stats = [w.stats(queries) for w in workers]
    df_map, exp_map = merge_stats(stats)
    results = [w.topk(queries, df_map, exp_map, first + need, sort,
                      post_filter)
               for w in workers]
    return [
        merge_topk([r[qi] for r in results], first, need, sort)
        for qi in range(len(queries))
    ]


QUERIES = [
    TermQuery("content", "int"),
    TermQuery("content", "tok77"),
    BooleanQuery()
    .add(TermQuery("content", "int"), MUST)
    .add(TermQuery("content", "return"), MUST),
    BooleanQuery()
    .add(TermQuery("content", "int"), SHOULD)
    .add(TermQuery("content", "tok3"), SHOULD)
    .add(TermQuery("content", "tok999"), SHOULD),
    BooleanQuery()
    .add(TermQuery("content", "int"), MUST)
    .add(TermQuery("content", "tok5"), MUST_NOT),
    PhraseQuery("content").add_term("int").add_term("return"),
    PhraseQuery("content", slop=2).add_term("int").add_term("tok3"),
    PrefixQuery("content", "tok1"),
    WildcardQuery("content", "tok?7"),
    FuzzyQuery("content", "retrun", min_sim=0.6),
    RangeQuery("content", "tok10", "tok20", True, False),
]


def _hits_tuple(td):
    return (
        [(h.doc, np.float32(h.score)) for h in td.hits],
        td.total_hits,
        np.float32(td.max_score),
    )


@pytest.mark.parametrize("n_parts", [2, 3])
def test_partitioned_bit_identical(multirange_index, n_parts):
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher

    import copy

    s = Searcher(IndexReader(multirange_index))
    got = _partitioned(
        multirange_index, [copy.deepcopy(q) for q in QUERIES], n_parts,
        need=15,
    )
    for q, (hits, total, mx) in zip(QUERIES, got):
        td = s.search(copy.deepcopy(q), 0, 15)
        want_hits, want_total, want_mx = _hits_tuple(td)
        have = [(d, np.float32(sc)) for d, sc in hits]
        assert have == want_hits, q
        assert total == want_total, q
        assert np.float32(mx) == want_mx, q


def test_partitioned_spans_and_filters(multirange_index):
    import copy

    from ferret_ray.search.filters import RangeFilter
    from ferret_ray.search.query import FilteredQuery
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher
    from ferret_ray.search.spans import (
        SpanNearQuery,
        SpanPrefixQuery,
        SpanTermQuery,
    )

    queries = [
        SpanNearQuery(
            [SpanTermQuery("content", "int"),
             SpanTermQuery("content", "return")],
            slop=3,
            in_order=False,
        ),
        SpanPrefixQuery("content", "tok1"),
        ConstantScoreQuery(RangeFilter("content", "tok10", "tok30",
                                       True, True)),
        FilteredQuery(
            TermQuery("content", "int"),
            RangeFilter("content", "tok1", "tok5", True, True),
        ),
    ]
    s = Searcher(IndexReader(multirange_index))
    got = _partitioned(
        multirange_index, [copy.deepcopy(q) for q in queries], 3,
        need=12,
    )
    for q, (hits, total, mx) in zip(queries, got):
        td = s.search(copy.deepcopy(q), 0, 12)
        want_hits, want_total, want_mx = _hits_tuple(td)
        assert [(d, np.float32(sc)) for d, sc in hits] == want_hits, q
        assert total == want_total and np.float32(mx) == want_mx, q


@pytest.mark.parametrize("n_parts", [2, 3])
def test_partitioned_match_all(multirange_index, n_parts):
    """MatchAllQuery: every partition scores only its OWNED doc bands,
    so the merged result (hits, total) is bit-identical to the single
    searcher — no duplicates, no misses (round-5 closes the last
    MultiSearcher parity gap)."""
    import copy

    from ferret_ray.search.query import MatchAllQuery
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher

    s = Searcher(IndexReader(multirange_index))
    for first, need in [(0, 15), (7, 9)]:
        got = _partitioned(
            multirange_index, [MatchAllQuery()], n_parts,
            need=need, first=first,
        )[0]
        td = s.search(MatchAllQuery(), first, need)
        assert [(d, np.float32(sc)) for d, sc in got[0]] == [
            (h.doc, np.float32(h.score)) for h in td.hits
        ]
        assert got[1] == td.total_hits


def test_partitioned_sort_by_field(multirange_index):
    """Explicit sort=: partitions ship per-hit FieldDoc values; the
    driver's value-based merge equals the single searcher for every
    sort type — string (partition-relative ranks would be wrong here),
    integer-ish auto, score/doc, reversed, and paging."""
    import copy

    from ferret_ray.search.query import MatchAllQuery, TermQuery
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher, SortField

    s = Searcher(IndexReader(multirange_index))
    sorts = [
        [SortField("repo", "string")],
        [SortField("repo", "string", reverse=True)],
        [SortField("lang", "auto"), SortField.SCORE],
        [SortField("path", "byte")],
        [SortField.SCORE, SortField("repo", "string")],
        [SortField.DOC],
    ]
    queries = [TermQuery("content", "int"), MatchAllQuery()]
    for sort in sorts:
        for q in queries:
            for first, need in [(0, 12), (5, 7)]:
                got = _partitioned(
                    multirange_index, [copy.deepcopy(q)], 3,
                    need=need, first=first, sort=sort,
                )[0]
                td = s.search(copy.deepcopy(q), first, need, sort=sort)
                assert [(d, np.float32(sc)) for d, sc in got[0]] == [
                    (h.doc, np.float32(h.score)) for h in td.hits
                ], (sort, q, first)
                assert got[1] == td.total_hits


def _drop_every_third(doc, score):
    """Module-level post_filter: drop doc%3==0, halve doc%3==2."""
    return 0.0 if doc % 3 == 0 else (0.5 if doc % 3 == 2 else 1.0)


@pytest.mark.parametrize("n_parts", [2, 3])
def test_partitioned_post_filter(multirange_index, n_parts):
    """post_filter runs on each partition's disjoint doc set, so the
    merged (filtered totals, factor-scaled scores) equal the single
    searcher's — including paging over the reshaped score order."""
    import copy

    from ferret_ray.search.query import MatchAllQuery
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher

    s = Searcher(IndexReader(multirange_index))
    queries = [
        TermQuery("content", "int"),
        PrefixQuery("content", "tok1"),
        MatchAllQuery(),
    ]
    for q in queries:
        for first, need in [(0, 12), (4, 6)]:
            got = _partitioned(
                multirange_index, [copy.deepcopy(q)], n_parts,
                need=need, first=first, post_filter=_drop_every_third,
            )[0]
            td = s.search(copy.deepcopy(q), first, need,
                          post_filter=_drop_every_third)
            assert [(d, np.float32(sc)) for d, sc in got[0]] == [
                (h.doc, np.float32(h.score)) for h in td.hits
            ], (q, first)
            assert got[1] == td.total_hits
            assert np.float32(got[2]) == np.float32(td.max_score)


def test_partitioned_pool_post_filter_ships(ray_session, multirange_index):
    """Real ray actors: the post_filter callable (here a lambda over
    plain data) crosses the process boundary by cloudpickle."""
    import copy

    from ferret_ray.search.partitioned import PartitionedSearcherPool
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher

    cutoff = 100
    pf = lambda doc, score: 1.0 if doc >= cutoff else 0.0  # noqa: E731
    s = Searcher(IndexReader(multirange_index))
    q = TermQuery("content", "int")
    pool = PartitionedSearcherPool(multirange_index, n_partitions=3)
    try:
        hits, total, mx = pool.search_queries(
            [copy.deepcopy(q)], 0, 10, post_filter=pf
        )[0]
        td = s.search(copy.deepcopy(q), 0, 10, post_filter=pf)
        assert [(d, np.float32(sc)) for d, sc in hits] == [
            (h.doc, np.float32(h.score)) for h in td.hits
        ]
        assert total == td.total_hits
        assert all(d >= cutoff for d, _ in hits)
    finally:
        pool.shutdown()


@pytest.mark.parametrize("n_parts", [2, 3])
def test_partitioned_wand(multirange_index, n_parts):
    """Distributed block-max WAND == single-reader wand_topk, bit-exact:
    per-partition WAND with global df over disjoint doc bands, merged by
    (score desc, doc asc)."""
    from ferret_ray.search.partitioned import merge_stats
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher
    from ferret_ray.search.wand import wand_topk

    s = Searcher(IndexReader(multirange_index))
    term_sets = [
        ["int", "return", "void"],
        ["tok10", "tok11", "tok12", "tok13"],
        ["int"],
        ["zzz_absent", "int"],
    ]
    for terms in term_sets:
        want = wand_topk(s, "content", terms, k=10)
        workers = [
            PartitionWorker(multirange_index, i, n_parts)
            for i in range(n_parts)
        ]
        probes = [TermQuery("content", t) for t in terms]
        df_map, _ = merge_stats([w.stats(probes) for w in workers])
        per = [w.wand("content", terms, df_map, 10) for w in workers]
        hits = [h for r in per for h in r[0]]
        hits.sort(key=lambda x: (-x[1], x[0]))
        got = [(d, np.float32(sc)) for d, sc in hits[:10]]
        assert got == [
            (d, np.float32(sc)) for d, sc in want.hits
        ], terms


def test_partitioned_paging(multirange_index):
    import copy

    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher

    q = TermQuery("content", "int")
    s = Searcher(IndexReader(multirange_index))
    td = s.search(copy.deepcopy(q), 7, 9)
    got = _partitioned(
        multirange_index, [copy.deepcopy(q)], 3, need=9, first=7
    )[0]
    assert [(d, np.float32(sc)) for d, sc in got[0]] == [
        (h.doc, np.float32(h.score)) for h in td.hits
    ]
    assert got[1] == td.total_hits


def test_partitioned_pool_matches_replica_pool(
    ray_session, multirange_index
):
    """The ray-actor pool (FQL strings in, frame out) is bit-identical
    to the replica-per-actor pool on the same queries."""
    from ferret_ray.pipelines.search_pipeline import search_batch
    from ferret_ray.search.partitioned import PartitionedSearcherPool

    queries = [
        "int", "tok3", "+int +return", "+int -tok5",
        '"int return"', "tok1*", "int OR tok999 OR tok3",
        "content:tok77", "retrun~",
    ]
    replica = (
        search_batch(multirange_index, queries, k=8, concurrency=2)
        .to_pandas()
        .sort_values(["query", "rank"])
        .reset_index(drop=True)
    )
    pool = PartitionedSearcherPool(multirange_index, n_partitions=3)
    try:
        part = (
            pool.search_batch(queries, k=8)
            .sort_values(["query", "rank"])
            .reset_index(drop=True)
        )
        assert len(part) == len(replica)
        assert (part["query"].values == replica["query"].values).all()
        assert (part["doc_id"].values == replica["doc_id"].values).all()
        assert (part["total_hits"].values ==
                replica["total_hits"].values).all()
        assert np.allclose(
            part["score"].astype(np.float32),
            replica["score"].astype(np.float32),
            rtol=0, atol=0,
        )
    finally:
        pool.shutdown()


def test_partitioned_over_lsm_root(ray_session, tmp_path):
    """Partitioned serving over an IncrementalIndex root (MultiReader
    deltas x doc-range partitions) equals the in-process searcher."""
    import copy
    import dataclasses as dc

    import pyarrow.parquet as pq

    from ferret_ray.pipelines.lifecycle import IncrementalIndex
    from ferret_ray.schema import source_code_config
    from ferret_ray.search.searcher import Searcher
    from ferret_ray.sources.corpus import generate_corpus

    tmp = str(tmp_path)
    cfg = dc.replace(source_code_config(num_shards=4),
                     salt_doc_range=256)
    root = os.path.join(tmp, "r")
    inc = IncrementalIndex(root, cfg, merge_factor=100)
    for i in range(2):
        p = os.path.join(tmp, f"s{i}.parquet")
        generate_corpus(p, 600, seed=60 + i, rows_per_fragment=200)
        inc.append(p)
    s = Searcher(inc.reader())
    queries = [
        TermQuery("content", "int"),
        BooleanQuery()
        .add(TermQuery("content", "int"), SHOULD)
        .add(TermQuery("content", "tok3"), SHOULD),
        PrefixQuery("content", "tok2"),
    ]
    got = _partitioned(
        root, [copy.deepcopy(q) for q in queries], 2, need=10
    )
    for q, (hits, total, mx) in zip(queries, got):
        td = s.search(copy.deepcopy(q), 0, 10)
        assert [(d, np.float32(sc)) for d, sc in hits] == [
            (h.doc, np.float32(h.score)) for h in td.hits
        ], q
        assert total == td.total_hits


def test_single_fragment_input_still_splits(ray_session, tmp_path):
    """Format v5 (VERDICT r4 #1): salting by docid band means a corpus
    that arrives as ONE parquet row group still splits into real doc
    ranges — 1/N ownership must not depend on the input file layout."""
    import copy
    import dataclasses as dc

    from ferret_ray.pipelines.build import build_index
    from ferret_ray.schema import source_code_config
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher
    from ferret_ray.sources.corpus import generate_corpus
    from ferret_ray.state.manifest import read_manifest

    tmp = str(tmp_path)
    corpus = os.path.join(tmp, "one.parquet")
    # one fragment: rows_per_fragment = corpus size
    generate_corpus(corpus, 1500, rows_per_fragment=1500)
    idx = os.path.join(tmp, "idx")
    cfg = dc.replace(source_code_config(num_shards=8),
                     salt_doc_range=256)
    build_index(corpus, idx, cfg)
    m = read_manifest(idx)
    ranges = {ss // 8 for ss in m["shards"]}
    assert len(ranges) >= 5, ranges  # 1500 docs / 256-doc bands

    # ownership is a real split, not one owner with empty peers
    b3 = [PartitionWorker(idx, i, 3).dictionary_bytes() for i in range(3)]
    assert max(b3) <= 0.5 * sum(b3), b3

    # and results stay bit-identical to the single searcher
    s = Searcher(IndexReader(idx))
    got = _partitioned(
        idx, [copy.deepcopy(q) for q in QUERIES], 3, need=12
    )
    for q, (hits, total, mx) in zip(QUERIES, got):
        td = s.search(copy.deepcopy(q), 0, 12)
        want_hits, want_total, _ = _hits_tuple(td)
        assert [(d, np.float32(sc)) for d, sc in hits] == want_hits, q
        assert total == want_total, q


def test_auto_salt_doc_range_fit():
    """The default (salt_doc_range=None) auto-fits ~32 bands, power of
    two, floored/capped for tiny and 10^12-doc corpora."""
    from ferret_ray.schema import auto_salt_doc_range

    assert auto_salt_doc_range(0) == 1 << 11
    assert auto_salt_doc_range(500) == 1 << 11      # floor
    assert auto_salt_doc_range(200_000) == 1 << 13  # ~25 bands
    assert auto_salt_doc_range(20_000_000) == 1 << 20
    assert auto_salt_doc_range(10**12) == 1 << 30   # cap


def test_dictionary_bytes_scale_inverse(multirange_index):
    """Owning 1/N of the doc ranges means ~1/N of the shard bytes."""
    def per_actor(n):
        return [
            PartitionWorker(multirange_index, i, n).dictionary_bytes()
            for i in range(n)
        ]

    b1 = per_actor(1)
    b3 = per_actor(3)
    total = b1[0]
    assert sum(b3) == total          # exact partition of the files
    assert max(b3) < 0.55 * total    # no actor holds most of the index


def test_pool_autofits_oversubscribed_reservation(multirange_index):
    """A gang reservation the cluster can't co-schedule must not hang
    (the 2-CPU scaling level deadlocked on 3 x 1-CPU actors): the pool
    lowers the per-actor num_cpus loudly and still answers queries."""
    import ray

    from ferret_ray.search.partitioned import PartitionedSearcherPool

    total = float(ray.cluster_resources()["CPU"])
    pool = PartitionedSearcherPool(
        multirange_index, n_partitions=3, default_field="content",
        num_cpus=total,  # 3 x total can never co-schedule unfitted
    )
    try:
        df = pool.search_batch(["int"], k=5)
        assert len(df) == 5
    finally:
        pool.shutdown()


def test_pool_rejects_impossible_reservation(multirange_index):
    """When even the minimum 0.01-CPU reservation cannot co-schedule
    (n_partitions >> 100 x cluster CPUs), the pool errors loudly up
    front instead of hanging or over-reserving (ADVICE r4)."""
    import ray

    from ferret_ray.search.partitioned import PartitionedSearcherPool

    total = float(ray.cluster_resources()["CPU"])
    with pytest.raises(ValueError, match="cannot co-schedule"):
        PartitionedSearcherPool(
            multirange_index,
            n_partitions=int(total * 150),
            default_field="content",
        )
