"""Input inventory: distributed footer scan == serial, fingerprints
stable across both paths."""

import os

import pytest


@pytest.fixture(scope="module")
def many_files(ray_session, tmp_path_factory):
    from ferret_ray.sources.corpus import generate_corpus

    d = str(tmp_path_factory.mktemp("frags"))
    for i in range(5):
        generate_corpus(
            os.path.join(d, f"part-{i}.parquet"), 300,
            seed=7 + i, rows_per_fragment=100,
        )
    return d


def test_distributed_footer_scan_identical(many_files, monkeypatch):
    import ferret_ray.sources.fragments as fr

    serial_frags, serial_fp = fr.list_fragments(many_files)
    # force the Ray-task path (threshold 0) and a tiny chunk size
    monkeypatch.setattr(fr, "_DISTRIBUTED_FOOTER_THRESHOLD", 0)
    dist_frags, dist_fp = fr.list_fragments(many_files)
    assert dist_frags == serial_frags
    assert dist_fp == serial_fp
    assert len(serial_frags) == 15  # 5 files x 3 row groups
    # doc bases are cumulative over the sorted inventory
    assert [f["doc_base"] for f in serial_frags[:4]] == [0, 100, 200, 300]
