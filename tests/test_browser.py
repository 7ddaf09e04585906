"""ferret-browser web UI (ruby/lib/ferret/browser.rb equivalent):
home / terms / doc / search views over a live index, HTML + JSON."""

import json
import threading
import urllib.request

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ferret_ray.browser import make_server
from ferret_ray.pipelines.build import build_index
from ferret_ray.schema import FieldConfig, IndexConfig


@pytest.fixture(scope="module")
def served_index(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("browser")
    corpus = tmp / "c.parquet"
    pq.write_table(
        pa.table(
            {
                "id": list(range(12)),
                "content": [
                    f"alpha bravo doc{i} " + ("common " * (i % 3))
                    for i in range(12)
                ],
            }
        ),
        corpus,
    )
    idx = str(tmp / "idx")
    build_index(
        str(corpus),
        idx,
        IndexConfig(
            fields={"content": FieldConfig()},
            id_columns=("id",),
            num_shards=4,
        ),
    )
    srv = make_server(idx, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()
    srv.server_close()


def _get(url: str) -> bytes:
    with urllib.request.urlopen(url, timeout=30) as r:
        assert r.status == 200
        return r.read()


def test_home_view(served_index):
    body = _get(served_index + "/").decode()
    assert "12 docs" in body and "content" in body
    data = json.loads(_get(served_index + "/?fmt=json"))
    assert data["num_docs"] == 12
    assert any(f["name"] == "content" for f in data["fields"])


def test_terms_view(served_index):
    data = json.loads(
        _get(served_index + "/terms?field=content&fmt=json&limit=5")
    )
    terms = {t["term"]: t["df"] for t in data["terms"]}
    assert terms.get("alpha") == 12
    assert terms.get("common") == 8  # docs with i % 3 != 0
    pref = json.loads(
        _get(served_index + "/terms?field=content&prefix=doc&fmt=json")
    )
    assert all(t["term"].startswith("doc") for t in pref["terms"])


def test_doc_view(served_index):
    data = json.loads(_get(served_index + "/doc?id=3&fmt=json"))
    assert "doc3" in data["fields"]["content"]
    html_body = _get(served_index + "/doc?id=3").decode()
    assert "doc3" in html_body


def test_search_view(served_index):
    data = json.loads(
        _get(served_index + "/search?q=doc3&fmt=json")
    )
    assert data["total_hits"] == 1
    assert data["hits"][0]["doc"] == 3
    boolean = json.loads(
        _get(served_index + "/search?q=%2Balpha%20%2Bcommon&fmt=json")
    )
    assert boolean["total_hits"] == 8


def test_missing_routes(served_index):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(served_index + "/nope")
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(served_index + "/doc")
    assert e.value.code == 400
