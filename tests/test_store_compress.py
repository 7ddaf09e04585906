"""Per-field stored-value compression — the STORE_COMPRESS flag
analogue (c/include/index.h:77).  A field may pin its docs-table
column codec ("none" for pre-compressed payloads); everything else
keeps the index default (zstd)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ferret_ray.pipelines.build import build_index
from ferret_ray.schema import FieldConfig, IndexConfig
from ferret_ray.search.reader import IndexReader


@pytest.fixture()
def corpus(tmp_path):
    path = tmp_path / "c.parquet"
    pq.write_table(
        pa.table(
            {
                "id": list(range(8)),
                "title": [f"alpha t{i}" for i in range(8)],
                "content": [f"bravo charlie c{i} alpha" for i in range(8)],
            }
        ),
        path,
    )
    return str(path)


def _codecs(docs_part: str) -> dict[str, str]:
    md = pq.ParquetFile(docs_part).metadata
    rg = md.row_group(0)
    return {
        rg.column(i).path_in_schema: rg.column(i).compression
        for i in range(md.num_columns)
    }


def test_per_field_store_compression(ray_session, corpus, tmp_path):
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(
        fields={
            "title": FieldConfig(),
            "content": FieldConfig(store_compression="none"),
        },
        id_columns=("id",),
        num_shards=4,
    )
    build_index(corpus, idx, cfg)
    import glob

    parts = sorted(glob.glob(f"{idx}/docs/part-*.parquet"))
    assert parts
    codecs = _codecs(parts[0])
    assert codecs["content"] == "UNCOMPRESSED"
    assert codecs["title"] == "ZSTD"
    assert codecs["doc_id"] == "ZSTD"
    # stored values still round-trip
    doc = IndexReader(idx).get_doc(3)
    assert doc["content"] == "bravo charlie c3 alpha"


def test_default_stays_single_codec(ray_session, corpus, tmp_path):
    idx = str(tmp_path / "idx2")
    cfg = IndexConfig(
        fields={"title": FieldConfig(), "content": FieldConfig()},
        id_columns=("id",),
        num_shards=4,
    )
    build_index(corpus, idx, cfg)
    import glob

    parts = sorted(glob.glob(f"{idx}/docs/part-*.parquet"))
    codecs = _codecs(parts[0])
    assert set(codecs.values()) == {"ZSTD"}
