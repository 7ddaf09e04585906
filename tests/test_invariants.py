"""Build invariants (SURVEY.md §5): per-row sha256 equality and
postings/df consistency between the index and a from-scratch recount."""

import hashlib
import os

import numpy as np
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from ferret_ray.pipelines.build import build_index
    from ferret_ray.schema import source_code_config
    from ferret_ray.sources.corpus import generate_corpus

    tmp = str(tmp_path_factory.mktemp("inv"))
    corpus = os.path.join(tmp, "c.parquet")
    generate_corpus(corpus, 800, rows_per_fragment=200)
    idx = os.path.join(tmp, "idx")
    manifest = build_index(corpus, idx, source_code_config(num_shards=8))
    return corpus, idx, manifest


def test_content_sha256_per_row(built):
    """The row invariant of BASELINE.json: sha256(content) carried from
    input to the docs table, equal for every row."""
    corpus, idx, _ = built
    src = pq.read_table(corpus, columns=["content"])
    want = [
        hashlib.sha256(t.encode()).hexdigest()
        for t in src.column("content").to_pylist()
    ]
    docs = pads.dataset(os.path.join(idx, "docs")).to_table(
        columns=["doc_id", "content_sha256"]
    ).sort_by("doc_id")
    got = docs.column("content_sha256").to_pylist()
    assert got == want


def test_df_and_postings_counts(built):
    """Σ df over the index == Σ per-doc distinct terms of a from-scratch
    recount; Σ tf == total token count."""
    corpus, idx, manifest = built
    from ferret_ray.schema import analyzer_for

    a = analyzer_for("standard")
    texts = pq.read_table(corpus, columns=["content"]).column(
        "content"
    ).to_pylist()
    total_distinct = 0
    total_tokens = 0
    for t in texts:
        terms, _ = a.terms_positions(t)
        total_distinct += len(set(terms))
        total_tokens += len(terms)

    # v6 layout: stats live in the dictionary files (the plain
    # shard-XXXXXXXX.parquet ones, not -post.parquet / .frq siblings)
    dict_files = sorted(
        os.path.join(idx, "shards", n)
        for n in os.listdir(os.path.join(idx, "shards"))
        if n.endswith(".parquet") and not n.endswith("-post.parquet")
    )
    shards = pads.dataset(dict_files).to_table(
        columns=["field", "df", "tf_sum"]
    )
    fn = manifest["field_names"].index("content")
    mask = np.asarray(shards.column("field")) == fn
    df_sum = int(np.asarray(shards.column("df"))[mask].sum())
    tf_sum = int(np.asarray(shards.column("tf_sum"))[mask].sum())
    assert df_sum == total_distinct
    assert tf_sum == total_tokens
    assert manifest["metrics"]["tokens"] >= total_tokens  # all fields


def test_doclen_matches_recount(built):
    corpus, idx, _ = built
    from ferret_ray.schema import analyzer_for

    a = analyzer_for("standard")
    texts = pq.read_table(corpus, columns=["content"]).column(
        "content"
    ).to_pylist()
    want = [len(a.terms_positions(t)[0]) for t in texts]
    docs = pads.dataset(os.path.join(idx, "docs")).to_table(
        columns=["doc_id", "len_content"]
    ).sort_by("doc_id")
    assert docs.column("len_content").to_pylist() == want


def test_empty_corpus_build_and_search(ray_session, tmp_path):
    """A zero-row input (an empty shard at scale) builds a valid empty
    index; every query path returns no hits instead of raising."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferret_ray.pipelines.build import build_index
    from ferret_ray.schema import FieldConfig, IndexConfig
    from ferret_ray.search.fql import FQLParser
    from ferret_ray.search.query import PrefixQuery, TermQuery
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher

    p0 = os.path.join(str(tmp_path), "empty.parquet")
    pq.write_table(
        pa.table({"content": pa.array([], type=pa.string())}), p0
    )
    cfg = IndexConfig(
        fields={"content": FieldConfig(analyzer="standard")},
        num_shards=2,
    )
    m = build_index(p0, os.path.join(str(tmp_path), "idx"), cfg)
    assert m["num_docs"] == 0
    r = IndexReader(os.path.join(str(tmp_path), "idx"))
    s = Searcher(r)
    assert s.search(TermQuery("content", "x"), 0, 10).total_hits == 0
    assert s.search(PrefixQuery("content", "x"), 0, 10).total_hits == 0
    p = FQLParser()
    p.add_field("content", default=True)
    assert s.search(p.parse("+a +b"), 0, 10).total_hits == 0
    assert r.max_doc() == 0
