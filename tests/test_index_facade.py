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


def test_scan_and_doc_by_id(ray_session):
    ix = Index(default_field="content", analyzer="whitespace")
    for i in range(20):
        ix << {"id": str(100 + i), "content": f"word{i % 4} common"}
    try:
        # unscored paging: first 3 matches from doc 0, then resume
        page1 = ix.scan("common", limit=3)
        assert page1 == [0, 1, 2]
        page2 = ix.scan("common", start_doc=page1[-1] + 1, limit=3)
        assert page2 == [3, 4, 5]
        assert len(ix.scan("word1", limit=None)) == 5
        # doc by id-field term / range / slice
        assert ix.doc("105")["content"] == "word1 common"
        assert ix["105"]["id"] == "105"
        assert [d["id"] for d in ix[2:5]] == ["102", "103", "104"]
        assert ix.doc("nope") is None
    finally:
        ix.close()


def test_query_delete_and_deletions(ray_session):
    ix = Index(default_field="content", analyzer="whitespace")
    for i in range(10):
        ix << {"id": str(i), "content": "keep" if i % 2 else "drop"}
    try:
        assert ix.search("drop").total_hits == 5
        assert not ix.has_deletions()
        ix.query_delete("drop")
        assert ix.has_deletions()
        assert ix.deleted(0) and ix.deleted(2) and not ix.deleted(1)
        assert ix.size() == 5
        assert ix.search("drop").total_hits == 0  # triggers rebuild
        assert ix.search("keep").total_hits == 5
        assert not ix.has_deletions()  # rebuild purged tombstones
    finally:
        ix.close()


def test_update_and_batch_update(ray_session):
    ix = Index(default_field="content", analyzer="whitespace")
    ix << {"id": "26", "title": "Babylon", "artist": "David Grey"}
    ix << {"id": "29", "title": "My Oh My", "artist": "David Grey"}
    try:
        # update by id-field term (index.rb:569)
        ix.update("26", {"id": "26", "title": "Babylon",
                         "artist": "David Gray"})
        assert ix.doc("26")["artist"] == "David Gray"
        assert ix.size() == 2
        # batch_update array form (index.rb:626: recommended)
        ix.batch_update([
            {"id": "26", "title": "Babylon", "artist": "X"},
            {"id": "29", "title": "My Oh My", "artist": "Y"},
            {"id": "31", "title": "New", "artist": "Z"},
        ])
        assert ix.size() == 3
        assert ix.doc("29")["artist"] == "Y"
        # hash form with docid keys
        ix.batch_update({0: {"id": "26", "title": "Babylon",
                             "artist": "XX"}})
        assert ix.doc("26")["artist"] == "XX"
        with pytest.raises(ValueError):
            ix.batch_update([{"title": "no id"}])
    finally:
        ix.close()


def test_query_update(ray_session):
    ix = Index(default_field="content", analyzer="whitespace")
    ix << {"id": "26", "content": "x", "artist": "Grey"}
    ix << {"id": "29", "content": "y", "artist": "Grey"}
    ix << {"id": "30", "content": "z", "artist": "Other"}
    try:
        ix.query_update("artist:Grey", {"artist": "Gray"})
        assert ix.doc("26")["artist"] == "Gray"
        assert ix.doc("29")["artist"] == "Gray"
        assert ix.doc("30")["artist"] == "Other"
        # string form replaces the default field
        ix.query_update("artist:Gray", "replaced")
        assert ix.doc("26")["content"] == "replaced"
        assert ix.doc("30")["content"] == "z"
    finally:
        ix.close()


def test_each_field_infos_persist(ray_session, tmp_path):
    ix = Index(default_field="content", analyzer="whitespace",
               term_vectors=True)
    ix << {"id": "1", "content": "alpha beta"}
    ix << {"id": "2", "content": "beta gamma"}
    try:
        docs = dict(ix.each())
        assert docs[0]["content"] == "alpha beta"
        ix.flush()
        fi = ix.field_infos()
        assert fi["content"]["term_vector"] is True
        tv = ix.term_vector(0, "content")
        assert [t[0] for t in tv] == ["alpha", "beta"]
        # persist to a real directory and keep searching
        ix.persist(str(tmp_path / "persisted"))
        assert ix.search("beta").total_hits == 2
        assert (tmp_path / "persisted").exists()
    finally:
        ix.close()
