"""The reference's 18-doc search conformance corpus.

Docs, boosts and the token-doubling analyzer replicate
/root/reference/c/test/test_search.c:160-229: fields date/field/cat/number,
doc boost = doc_id + 1, analyzer = whitespace tokenizer + DoubleFilter
(lowercase-starting tokens emitted lowercase at pos_inc 0 then uppercased
at pos_inc 1).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from .schema import FieldConfig, IndexConfig

SEARCH_TEST_DATA: list[tuple[str, str, str, str]] = [
    ("20050930", "word1", "cat1/", ".123"),
    ("20051001", "word1 word2 the quick brown fox the quick brown fox",
     "cat1/sub1", "0.0"),
    ("20051002", "word1 word3 one two one", "cat1/sub1/subsub1",
     "908.123434"),
    ("20051003", "word1 word3 one two", "cat1/sub2", "3999"),
    ("20051004", "word1 " + " ".join(["word2"] * 33),
     "cat1/sub2/subsub2", "+.3413"),
    ("20051005", "word1 one two x x x x x one two", "cat2/sub1", "-1.1298"),
    ("20051006", "word1 word3", "cat2/sub1", "2"),
    ("20051007", "word1", "cat2/sub1", "+8.894"),
    ("20051008", "word1 word2 word3 the fast brown fox", "cat2/sub1",
     "+84783.13747"),
    ("20051009", "word1", "cat3/sub1", "10.0"),
    ("20051010", "word1", "cat3/sub1", "1"),
    ("20051011", "word1 word3 the quick red fox", "cat3/sub1", "-12518419"),
    ("20051012", "word1", "cat3/sub1", "10"),
    ("20051013", "word1", "cat1/sub2", "15682954"),
    ("20051014", "word1 word3 the quick hairy fox", "cat1/sub1", "98132"),
    ("20051015", "word1", "cat1/sub2/subsub1", "-.89321"),
    ("20051016", "word1 the quick fox is brown and hairy and a little red",
     "cat1/sub1/subsub2", "-89"),
    ("20051017", "word1 the brown fox is quick and red", "cat1/", "-1.0"),
]


def conformance_config(num_shards: int = 4, **kw) -> IndexConfig:
    fc = lambda: FieldConfig(analyzer="whitespace_double")  # noqa: E731
    return IndexConfig(
        fields={"date": fc(), "field": fc(), "cat": fc(), "number": fc()},
        boost_column="boost",
        num_shards=num_shards,
        **kw,
    )


def write_conformance_corpus(path: str) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    t = pa.table(
        {
            "date": [d[0] for d in SEARCH_TEST_DATA],
            "field": [d[1] for d in SEARCH_TEST_DATA],
            "cat": [d[2] for d in SEARCH_TEST_DATA],
            "number": [d[3] for d in SEARCH_TEST_DATA],
            "boost": [float(i + 1) for i in range(len(SEARCH_TEST_DATA))],
        }
    )
    pq.write_table(t, path)
    return path


def build_conformance_index(tmp_dir: str, **cfg_kw) -> str:
    """Build the 18-doc index through the real Ray pipeline."""
    from .pipelines.build import build_index

    corpus = os.path.join(tmp_dir, "corpus18.parquet")
    write_conformance_corpus(corpus)
    index_dir = os.path.join(tmp_dir, "index18")
    build_index(corpus, index_dir, conformance_config(**cfg_kw))
    return index_dir
