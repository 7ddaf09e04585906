"""Multi-language Snowball StemFilter (c/src/analysis.c:1397-1470).

Goldens were produced by the reference's own libstemmer
(c/lib/libstemmer_c, compiled, UTF_8) over curated inflected words plus
seeded random fuzz strings — byte-exact parity required.
"""

import os

import pytest

GOLDENS = os.path.join(os.path.dirname(__file__))


def _check_goldens(lang, fn):
    bad = []
    with open(os.path.join(GOLDENS, f"goldens_stems_{lang}.tsv")) as f:
        for line in f:
            w, s = line.rstrip("\n").split("\t")
            if fn(w) != s:
                bad.append((w, s, fn(w)))
    assert not bad, bad[:10]


@pytest.mark.parametrize(
    "lang", ["german", "russian", "swedish", "danish", "norwegian",
             "spanish", "portuguese", "italian", "dutch", "porter", "french",
             "finnish", "hungarian", "romanian", "turkish"]
)
def test_snowball_goldens(lang):
    from ferret_ray.analysis.stemmer_multi import snowball_stem

    _check_goldens(lang, snowball_stem(lang))


def test_algorithm_registry():
    from ferret_ray.analysis.stemmer import stem as english
    from ferret_ray.analysis.stemmer_multi import snowball_stem

    assert snowball_stem("english") is english
    # case-insensitive names like the Ruby binding
    # (tc_token_stream.rb:490 'HunGarIaN')
    assert snowball_stem("GerMAN")("häuser") == "haus"
    assert snowball_stem("RUSSIAN")("красивая") == "красив"
    # unknown algorithm fails loudly (ArgumentError in the reference,
    # tc_token_stream.rb:492)
    with pytest.raises(ValueError, match="Jibberish"):
        snowball_stem("Jibberish")


def test_analyzer_spec_round_trip(ray_session, tmp_path):
    """'stem:german' flows: spec -> Analyzer -> manifest -> reopened
    reader -> search for the stemmed term."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferret_ray.pipelines.build import build_index
    from ferret_ray.schema import FieldConfig, IndexConfig, analyzer_for
    from ferret_ray.search.query import TermQuery
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher

    a = analyzer_for("stem:german")
    toks = [t.text for t in a.token_stream("die schönsten Häuser")]
    assert "haus" in toks and "schon" in toks  # -sten, umlauts stripped

    tmp = str(tmp_path)
    corpus = os.path.join(tmp, "c.parquet")
    pq.write_table(
        pa.table({"content": pa.array(
            ["die schönsten Häuser der Stadt", "ein kleines Haus"]
        )}), corpus,
    )
    idx = os.path.join(tmp, "idx")
    build_index(
        corpus, idx,
        IndexConfig(
            fields={"content": FieldConfig(analyzer="stem:german")},
            num_shards=2,
        ),
    )
    r = IndexReader(idx)
    assert r.manifest["config"]["fields"]["content"]["analyzer"] == \
        "stem:german"
    s = Searcher(r)
    td = s.search(TermQuery("content", "haus"), 0, 10)
    assert sorted(h.doc for h in td.hits) == [0, 1]

    with pytest.raises(ValueError):
        analyzer_for("stem:klingon")


def test_stemmers_total_over_arbitrary_text():
    """Every registered algorithm is total: arbitrary unicode input
    (symbols, combining marks, empty, huge) returns a str, never
    raises — analyzers feed stemmers whatever the tokenizer emits."""
    from hypothesis import given, settings, strategies as st

    from ferret_ray.analysis.stemmer_multi import snowball_stem

    algos = ["english", "porter", "german", "russian", "swedish",
             "danish", "norwegian", "spanish", "portuguese", "italian",
             "dutch", "french", "finnish", "hungarian", "romanian",
             "turkish"]
    fns = [snowball_stem(a) for a in algos]

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=40))
    def check(w):
        for fn in fns:
            out = fn(w)
            assert isinstance(out, str)

    check()
