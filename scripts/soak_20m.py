#!/usr/bin/env python
"""20M-doc soak: one-shot build + serving at the next 10x scale.

Protocol (VERDICT r3 next-steps #7): generate a 20M-doc code corpus
(shorter docs than the bench default so corpus+index+intermediates fit
the sandbox disk), build with enough doc ranges that partitioned
serving owns real subsets (salt_doc_range = 2^21 -> 10 ranges), then
measure hot-term latency under the bounded-top-k default, replica-pool
batch qps, and the partitioned pool's per-actor dictionary bytes.

Prints one JSON line; deletes the trial index at the end (disk).

Usage: python scripts/soak_20m.py [num_docs]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    import ray

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    max_tokens = int(os.environ.get("SOAK_MAX_TOKENS", "400"))
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False)
    import numpy as np

    from ferret_ray.pipelines.build import build_index
    from ferret_ray.schema import source_code_config
    from ferret_ray.pipelines.search_pipeline import search_batch

    out: dict = {"metric": "soak20m", "num_docs": n_docs,
                 "num_cpus": num_cpus,
                 "load_avg_start": [round(x, 2) for x in os.getloadavg()]}

    # ---- corpus: parallel slice generation (40 Ray tasks) -------------
    slice_docs = 500_000
    n_slices = (n_docs + slice_docs - 1) // slice_docs
    corpus_dir = f"/tmp/ferret_ray_corpus/code{n_docs}-mt{max_tokens}"
    os.makedirs(corpus_dir, exist_ok=True)

    @ray.remote(num_cpus=1)
    def gen_slice(i: int) -> str:
        from ferret_ray.sources.corpus import generate_corpus

        docs = min(slice_docs, n_docs - i * slice_docs)
        path = os.path.join(corpus_dir, f"slice-{i:04d}.parquet")
        if not os.path.exists(path):
            tmp = path + ".tmp"
            generate_corpus(tmp, docs, seed=42 + i,
                            rows_per_fragment=2000,
                            max_tokens=max_tokens)
            os.replace(tmp, path)
        return path

    t0 = time.time()
    slices = ray.get([gen_slice.remote(i) for i in range(n_slices)])
    out["corpus_gen_sec"] = round(time.time() - t0, 1)
    out["corpus_bytes"] = sum(os.path.getsize(p) for p in slices)

    # ---- build ---------------------------------------------------------
    cfg = source_code_config()  # salt_doc_range auto-fits ~32 doc bands
    index_dir = f"/tmp/ferret_ray_soak/code-{n_docs}"
    shutil.rmtree(index_dir, ignore_errors=True)
    t0 = time.time()
    manifest = build_index(slices, index_dir, cfg)
    build_sec = time.time() - t0
    out["build_sec"] = round(build_sec, 1)
    out["docs_per_sec"] = round(n_docs / build_sec, 1)
    out["tokens"] = manifest["metrics"]["tokens"]
    out["invert_sec"] = round(manifest["metrics"]["invert_sec"], 1)
    out["merge_sec"] = round(manifest["metrics"]["merge_sec"], 1)
    du = subprocess.run(["du", "-sb"] + [
        os.path.join(index_dir, d) for d in ("shards", "segments", "docs")
    ], capture_output=True, text=True).stdout.split()
    out["shards_bytes"] = int(du[0])
    out["segments_bytes"] = int(du[2])
    out["docs_bytes"] = int(du[4])

    # post-commit GC: segments/ + checkpoints/ are resume-only
    from ferret_ray.pipelines.build import gc_build_intermediates

    out["gc_reclaimed_bytes"] = gc_build_intermediates(index_dir)

    # ---- serving: hot-term latency under the bounded-top-k default ----
    from ferret_ray.search.fql import FQLParser
    from ferret_ray.search.query import TermQuery
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher
    from ferret_ray.analysis import standard_analyzer
    import copy

    t0 = time.time()
    s = Searcher(IndexReader(index_dir))
    out["searcher_open_sec"] = round(time.time() - t0, 2)
    parser = FQLParser(analyzer=standard_analyzer())
    parser.add_field("content", default=True)
    queries = ["int", "return", "tok3", "tok55", "tok999", "tok12345",
               "+int +return", "+tok3 -tok5", "tok5 tok17 tok99",
               "tok1*", "+class +def -tok9"]
    parsed = [p for p in (parser.parse(q) for q in queries) if p]
    for p in parsed:
        s.search(copy.deepcopy(p), 0, 10)
    lat = []
    for _ in range(5):
        for p in parsed:
            t0 = time.perf_counter()
            s.search(copy.deepcopy(p), 0, 10)
            lat.append((time.perf_counter() - t0) * 1000)
    out["query_p50_ms"] = round(float(np.percentile(lat, 50)), 1)
    out["query_p95_ms"] = round(float(np.percentile(lat, 95)), 1)
    hot = {}
    for tkn in ("int", "return", "tok1"):
        q = TermQuery("content", tkn)
        td = s.search(q, 0, 10)
        t0 = time.perf_counter()
        for _ in range(3):
            td = s.search(q, 0, 10)
        hot[tkn] = {"total_hits": td.total_hits,
                    "ms": round((time.perf_counter() - t0) / 3 * 1000, 1)}
    out["hot_terms"] = hot
    del s

    # cold dictionary-expansion tail (VERDICT r4 #3): fresh reader,
    # first-touch wide prefix expansion, then the warm repeat
    import gc as _gc

    _gc.collect()
    s2 = Searcher(IndexReader(index_dir))
    pq = parser.parse("tok1*")
    t0 = time.perf_counter()
    td_cold = s2.search(copy.deepcopy(pq), 0, 10)
    cold_ms = (time.perf_counter() - t0) * 1000
    t0 = time.perf_counter()
    s2.search(copy.deepcopy(pq), 0, 10)
    warm_ms = (time.perf_counter() - t0) * 1000
    out["cold_expansion"] = {
        "query": "tok1*", "total_hits": td_cold.total_hits,
        "cold_ms": round(cold_ms, 1), "warm_ms": round(warm_ms, 1),
    }
    del s2

    # ---- replica batch pool --------------------------------------------
    batch_queries = queries * 10
    t0 = time.time()
    n_rows = search_batch(index_dir, batch_queries, k=10,
                          concurrency=4).count()
    out["batch_qps"] = round(len(batch_queries) / (time.time() - t0), 1)
    out["batch_rows"] = int(n_rows)

    # ---- partitioned pool: REAL ray actors (1/N doc ranges each) -------
    from ferret_ray.search.partitioned import PartitionedSearcherPool

    nparts = 5
    pool = PartitionedSearcherPool(index_dir, n_partitions=nparts)
    dict_bytes = pool.dictionary_bytes()
    out["partitioned"] = {
        "n_partitions": nparts,
        "per_actor_dictionary_bytes": dict_bytes,
        "total_bytes": sum(dict_bytes),
        "max_over_total": round(max(dict_bytes) / sum(dict_bytes), 3),
    }
    # cold wide expansion through the pool: each actor first-touches
    # only ITS doc bands' dictionaries+postings, in parallel — the
    # scale path for the cold-expansion tail (VERDICT r4 #3)
    pq_cold = parser.parse("tok1*")
    t0 = time.perf_counter()
    (hits_c, total_c, _mx) = pool.search_queries(
        [copy.deepcopy(pq_cold)], 0, 10
    )[0]
    out["partitioned"]["cold_expansion_ms"] = round(
        (time.perf_counter() - t0) * 1000, 1
    )
    t0 = time.perf_counter()
    pool.search_queries([copy.deepcopy(pq_cold)], 0, 10)
    out["partitioned"]["warm_expansion_ms"] = round(
        (time.perf_counter() - t0) * 1000, 1
    )
    assert total_c == td_cold.total_hits, "pool != single-reader hits"

    pq_queries = [parser.parse(q) for q in queries]
    pq_queries = [p for p in pq_queries if p]
    t0 = time.time()
    merged = pool.search_queries(
        [copy.deepcopy(p) for p in pq_queries], 0, 10
    )
    out["partitioned"]["batch_sec"] = round(time.time() - t0, 2)
    out["partitioned"]["rows"] = sum(len(m[0]) for m in merged)

    # distributed WAND across the same partitions == exact top-k
    wand_terms = ["int", "return", "tok3"]
    pool.wand_topk("content", wand_terms, 10)  # warm the postings
    t0 = time.perf_counter()
    wr = pool.wand_topk("content", wand_terms, 10)
    out["partitioned"]["wand_ms"] = round(
        (time.perf_counter() - t0) * 1000, 1
    )
    out["partitioned"]["wand_top"] = [int(d) for d, _ in wr.hits[:10]]
    pool.shutdown()

    shutil.rmtree(index_dir, ignore_errors=True)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
