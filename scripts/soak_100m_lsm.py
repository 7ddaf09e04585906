#!/usr/bin/env python
"""100M-doc soak: LSM build of a corpus BIGGER than scratch disk.

A one-shot 100M-doc build cannot fit this sandbox: corpus (~22 GB) +
segments (~50 GB) + docs must coexist at the end of invert, and the
effective disk is ~93 GB (the one-shot attempt ENOSPC'd at 99% full).
That is exactly the 100-TB operating condition — input plus
intermediates never fit at once — so this soak builds the index the
way a real pipeline would: two 50M-doc deltas through
``IncrementalIndex.append``, each half's corpus DELETED after its
delta commits, build intermediates GC'd per delta (streaming segment
GC releases each shard's inputs mid-merge; the post-commit pass
removes checkpoints).  Serving runs over the 2-delta LSM root — a
MultiReader with exact global stats, plus the shard-partitioned pool.

Prints one JSON line; deletes the index at the end (disk).

Usage: SOAK_MAX_TOKENS=100 python scripts/soak_100m_lsm.py [total_docs]
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

SLICE_DOCS = 500_000


def _free_gb() -> float:
    st = os.statvfs("/tmp")
    return round(st.f_bavail * st.f_frsize / 1e9, 1)


def _du_gb(path: str) -> float:
    out = subprocess.run(["du", "-sb", path], capture_output=True,
                         text=True).stdout.split()
    return round(int(out[0]) / 1e9, 2) if out else 0.0


def main() -> None:
    import ray

    total_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    # SOAK_DELTAS: number of equal LSM deltas (default 2).  More,
    # smaller deltas lower the per-delta disk peak — the knob that
    # takes the same corpus-bigger-than-disk pattern past what two
    # halves fit (e.g. 200M docs as 4 x 50M on this sandbox).
    n_deltas = int(os.environ.get("SOAK_DELTAS", "2"))
    half = total_docs // n_deltas
    max_tokens = int(os.environ.get("SOAK_MAX_TOKENS", "100"))
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False)
    import numpy as np

    from ferret_ray.pipelines.build import gc_build_intermediates
    from ferret_ray.pipelines.lifecycle import IncrementalIndex
    from ferret_ray.schema import source_code_config

    out: dict = {"metric": "soak100m_lsm", "num_docs": total_docs,
                 "n_deltas": int(os.environ.get("SOAK_DELTAS", "2")),
                 "num_cpus": num_cpus, "max_tokens": max_tokens,
                 "load_avg_start": [round(x, 2) for x in os.getloadavg()],
                 "disk_free_gb_start": _free_gb()}

    root = "/tmp/ferret_ray_soak/lsm100m"
    resume = os.environ.get("SOAK_RESUME") == "1"
    if not resume:
        shutil.rmtree(root, ignore_errors=True)
    inc = IncrementalIndex(root, source_code_config())

    @ray.remote(num_cpus=1)
    def gen_slice(corpus_dir: str, i: int, docs: int, seed: int) -> str:
        from ferret_ray.sources.corpus import generate_corpus

        path = os.path.join(corpus_dir, f"slice-{i:04d}.parquet")
        if not os.path.exists(path):
            tmp = path + ".tmp"
            generate_corpus(tmp, docs, seed=seed,
                            rows_per_fragment=2000,
                            max_tokens=max_tokens)
            os.replace(tmp, path)
        return path

    halves = []
    t_all = time.time()
    for h in range(n_deltas):
        rec: dict = {}
        if resume and len(inc.delta_dirs) > h:
            rec["skipped"] = True  # delta already committed
            halves.append(rec)
            continue
        corpus_dir = f"/tmp/ferret_ray_corpus/lsm100m-half{h}"
        os.makedirs(corpus_dir, exist_ok=True)
        n_slices = (half + SLICE_DOCS - 1) // SLICE_DOCS
        t0 = time.time()
        slices = ray.get([
            gen_slice.remote(corpus_dir, i,
                             min(SLICE_DOCS, half - i * SLICE_DOCS),
                             seed=42 + h * 100_000 + i)
            for i in range(n_slices)
        ])
        rec["corpus_gen_sec"] = round(time.time() - t0, 1)
        rec["corpus_gb"] = _du_gb(corpus_dir)
        rec["disk_free_gb_before_build"] = _free_gb()

        t0 = time.time()
        # merge=False: the soak serves the 2-delta generation set (the
        # steady state between scheduled compactions).  With merge on,
        # the geometric policy correctly compacts two 50M deltas at the
        # 10^8 tier — a 39 GB add_indexes this sandbox's disk can't
        # hold alongside both sources (it ENOSPC'd); on a real cluster
        # compaction runs with shared-storage headroom.
        m = inc.append(slices, merge=False)
        rec["append_sec"] = round(time.time() - t0, 1)
        rec["docs_per_sec"] = round(half / (time.time() - t0), 1)
        rec["tokens"] = m["metrics"]["tokens"]
        rec["invert_sec"] = round(m["metrics"]["invert_sec"], 1)
        rec["merge_sec"] = round(m["metrics"]["merge_sec"], 1)
        rec["disk_free_gb_after_build"] = _free_gb()

        delta_dir = inc.delta_dirs[-1]
        rec["gc_reclaimed_gb"] = round(
            gc_build_intermediates(delta_dir) / 1e9, 2
        )
        rec["delta_gb"] = _du_gb(delta_dir)
        # the 100-TB pattern: the input half is gone before the next
        # half lands — input + intermediates never coexist in full
        shutil.rmtree(corpus_dir, ignore_errors=True)
        rec["disk_free_gb_after_corpus_rm"] = _free_gb()
        halves.append(rec)
    out["halves"] = halves
    out["total_build_wall_sec"] = round(time.time() - t_all, 1)
    out["deltas"] = len(inc.delta_dirs)
    out["num_docs_indexed"] = inc.num_docs()
    built = [r for r in halves if not r.get("skipped")]
    out["tokens_total"] = sum(r["tokens"] for r in built)
    if built:
        out["docs_per_sec_builds_only"] = round(
            half * len(built) / sum(r["append_sec"] for r in built), 1
        )

    # ---- serving over the 2-delta LSM root ------------------------------
    from ferret_ray.analysis import standard_analyzer
    from ferret_ray.search.fql import FQLParser
    from ferret_ray.search.query import TermQuery
    import copy

    t0 = time.time()
    s = inc.searcher()
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

    # cold wide expansion: fresh MultiReader, first-touch
    import gc as _gc

    _gc.collect()
    s2 = inc.searcher()
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

    # ---- partitioned pool over the LSM root -----------------------------
    from ferret_ray.search.partitioned import PartitionedSearcherPool

    nparts = 5
    pool = PartitionedSearcherPool(root, n_partitions=nparts)
    dict_bytes = pool.dictionary_bytes()
    out["partitioned"] = {
        "n_partitions": nparts,
        "per_actor_dictionary_bytes": dict_bytes,
        "total_bytes": sum(dict_bytes),
        "max_over_total": round(max(dict_bytes) / sum(dict_bytes), 3),
    }
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

    wand_terms = ["int", "return", "tok3"]
    pool.wand_topk("content", wand_terms, 10)
    t0 = time.perf_counter()
    wr = pool.wand_topk("content", wand_terms, 10)
    out["partitioned"]["wand_ms"] = round(
        (time.perf_counter() - t0) * 1000, 1
    )
    pool.shutdown()

    shutil.rmtree(root, ignore_errors=True)
    out["disk_free_gb_end"] = _free_gb()
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
