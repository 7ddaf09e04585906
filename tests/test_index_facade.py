"""Index facade tests (patterns of ruby/test/unit/index/tc_index.rb)."""

import pytest

from ferret_ray.index import Index


@pytest.fixture
def idx(ray_session):
    ix = Index(default_field="field", analyzer="whitespace")
    yield ix
    ix.close()


def test_add_and_search(idx):
    idx << "one two three"
    idx << {"field": "one two", "title": "doc two"}
    idx << "three four five"
    assert idx.size() == 3
    td = idx.search("one")
    assert sorted(h.doc for h in td.hits) == [0, 1]
    td = idx.search("title:two")
    assert [h.doc for h in td.hits] == [1]
    td = idx.search("+three +five")
    assert [h.doc for h in td.hits] == [2]
    assert idx[1]["title"] == "doc two"


def test_upsert_by_key(ray_session):
    ix = Index(default_field="content", analyzer="whitespace", key="id")
    ix << {"id": "a", "content": "old text"}
    ix << {"id": "b", "content": "other text"}
    ix << {"id": "a", "content": "new text"}
    assert ix.size() == 2
    assert [h.doc for h in ix.search("new").hits] == [1]
    assert ix.search("old").total_hits == 0
    ix.delete("b")
    assert ix.size() == 1
    assert ix.search("other").total_hits == 0
    ix.close()


def test_dynamic_fields(idx):
    idx << {"a": "x"}
    idx << {"b": "y"}
    assert idx.search("a:x").total_hits == 1
    assert idx.search("b:y").total_hits == 1


def test_highlight(ray_session):
    ix = Index(default_field="field", analyzer="whitespace")
    ix << (
        "the words we are searching for are one and two also "
        "sometimes looking for them as a phrase like this; one "
        "two lets see how it goes"
    )
    res = ix.highlight("one", 0, excerpt_length=10, num_excerpts=2)
    assert res is not None and len(res) == 2
    assert all("<b>one</b>" in r for r in res)
    res = ix.highlight('"one two"', 0, excerpt_length=15, num_excerpts=1)
    assert res and "<b>one two</b>" in res[0]
    assert ix.highlight("one", 0, field="not_a_field") is None
    ix.close()


def test_explain_and_search_each(idx):
    idx << "apple banana"
    idx << "apple cherry"
    seen = list(idx.search_each("apple"))
    assert [d for d, _ in seen] == [0, 1] or [d for d, _ in seen] == [1, 0]
    e = idx.explain("apple", 0)
    assert e.value > 0
