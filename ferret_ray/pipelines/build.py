"""The index build pipeline (Ray Data, streaming, resumable).

Lifecycle (the Ray re-expression of the reference's add_doc -> flush ->
merge -> commit lifecycle, SURVEY.md §3.1):

1. driver lists input parquet fragments (footer metadata only) and assigns
   deterministic doc bases;
2. ``from_items(fragments) -> map_batches(InvertFragment)``  — stateless
   tokenize+invert tasks, one per fragment group, each writing its docs
   partition plus BUCKETED segment files (one per shard_salt %
   merge_buckets) and a checkpoint (skip on resume);
3. ``from_items(shards) -> map_batches(ShardMerger)``  — the shuffle is
   map-side through shared storage: each merge task reads only its own
   hash shard's bucket dirs and streams the shard's doc bands into ONE
   dictionary/postings file pair (skip on resume per shard).  No Ray
   all-to-all, no sort — the salted layout makes doc-ordered
   concatenation the exact merge;
4. driver commits ``manifest.json`` atomically (generation protocol) with
   global stats (N, per-field doc-length sums for BM25), per-stage metrics
   and lineage records.

Document text never leaves the invert tasks; only compressed posting
fragments flow between stages, via bucket files on shared storage.
"""

from __future__ import annotations

import os
import time

from ..schema import IndexConfig
from ..sources.fragments import list_fragments
from ..stages.invert import InvertFragment
from ..state.fs import (
    fs_exists,
    fs_listdir,
    fs_makedirs,
    fs_read_json,
    fs_rmtree,
    fs_write_json_atomic,
    join as fs_join,
    resolve_fs,
)
from ..state.manifest import read_manifest, write_manifest


def _clear_stale_build(index_dir: str, build_fp: str) -> None:
    """Rebuilding into a dir whose previous build had a DIFFERENT
    fingerprint must not leave that build's segment/shard/docs files
    behind — ShardMerger merges every file it finds in a bucket dir, so
    stale segments would silently pollute the new index.  A marker file
    records the in-progress fingerprint; same-fp reruns resume from
    checkpoints untouched."""
    fs, root = resolve_fs(index_dir)
    marker = fs_join(root, "build_fp.json")
    rec = fs_read_json(fs, marker)
    if rec is not None and rec.get("fingerprint") != build_fp:
        for sub in ("segments", "shards", "docs", "checkpoints"):
            p = fs_join(root, sub)
            if fs_exists(fs, p):
                fs_rmtree(fs, p)
    if rec is None or rec.get("fingerprint") != build_fp:
        fs_write_json_atomic(fs, marker, {"fingerprint": build_fp})


def _repair_gc_orphans(index_dir: str, build_fp: str) -> None:
    """Self-heal the one state streaming segment-GC cannot resume from:
    a shard checkpoint whose OUTPUT files are lost after its segment
    inputs were GC'd (e.g. a shard file deleted by hand, a partial
    storage loss).  Re-merging needs the segments back, and segments
    come from invert — so drop every segGC marker and the broken shard
    checkpoints: invert fragment verification then fails on the missing
    segment files and regenerates them byte-identically (docids are
    pure functions of (fragment, row)), after which the broken shards
    re-merge and healthy shards skip on their checkpoints.  No markers
    or no broken shards -> no-op (the normal resume fast path)."""
    fs, root = resolve_fs(index_dir)
    ck = fs_join(root, "checkpoints")
    if not fs_exists(fs, ck):
        return
    names = fs_listdir(fs, ck)
    markers = [n for n in names if n.startswith("segGC-")]
    if not markers:
        return
    from ..state.fs import fs_delete_file

    broken = []
    ck_shards: set[int] = set()
    for n in names:
        if not n.startswith("shard-") or not n.endswith(".json"):
            continue
        rec = fs_read_json(fs, fs_join(ck, n))
        if not rec or rec.get("fingerprint") != build_fp:
            continue
        ck_shards.add(int(n[len("shard-"):-len(".json")]))
        if any(
            not fs_exists(fs, fs_join(root, o))
            for o in rec.get("outputs", [])
        ):
            broken.append(n)
    # a marker whose shard has NO checkpoint at all (partial storage
    # loss) is equally unrecoverable without re-invert
    orphaned = any(
        (fs_read_json(fs, fs_join(ck, m)) or {}).get("shard")
        not in ck_shards
        for m in markers
    )
    if not broken and not orphaned:
        return
    for n in broken + markers:
        fs_delete_file(fs, fs_join(ck, n))


def gc_build_intermediates(index_dir: str) -> int:
    """Delete a COMMITTED index's build intermediates (``segments/`` +
    ``checkpoints/``) and return the bytes reclaimed.

    They exist only to resume an INTERRUPTED build; once the manifest
    is committed, ``build_index`` for the same inputs short-circuits on
    the fingerprint and never looks at them, while they weigh roughly
    as much as the index itself (the 20M-doc soak left ~20 GB).
    Serving reads only ``shards/`` + ``docs/`` + tombstones.  Refuses
    (returns 0) when no committed manifest exists — an in-flight build
    still needs its checkpoints."""
    if read_manifest(index_dir) is None:
        return 0
    fs, root = resolve_fs(index_dir)
    freed = 0
    for sub in ("segments", "checkpoints"):
        p = fs_join(root, sub)
        if not fs_exists(fs, p):
            continue
        sel = __import__("pyarrow.fs", fromlist=["FileSelector"])
        infos = fs.get_file_info(
            sel.FileSelector(p, recursive=True)
        )
        freed += sum(i.size or 0 for i in infos if i.size)
        fs_rmtree(fs, p)
    return freed


def write_norms_sidecar(index_dir: str) -> None:
    """Consolidate every docs part's ``norm_*``/``len_*`` columns into
    ONE ``norms.parquet`` in docid order (the reference keeps norms in
    a single per-field .f<n> stream for exactly this reason,
    c/src/index.c norms files): a cold query's first ``norms()`` call
    then reads one ~20MB column instead of paying footer + column reads
    across ~1.3k doc parts (measured 180MB / 3.4-5.6s at 20M docs).
    Written before the manifest commit; readers fall back to the parts
    when the sidecar is absent (expunge/rebase outputs)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..state.fs import fs_listdir, open_parquet

    fs, root = resolve_fs(index_dir)
    docs_dir = fs_join(root, "docs")
    parts = sorted(
        n for n in fs_listdir(fs, docs_dir) if n.endswith(".parquet")
    )
    if not parts:
        return

    def _one(name: str):
        pf = open_parquet(fs, fs_join(docs_dir, name))
        cols = [
            c for c in pf.schema_arrow.names
            if c.startswith(("norm_", "len_"))
        ]
        return pf.read(columns=cols), pf.metadata.num_rows

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(min(16, len(parts))) as ex:
        loaded = list(ex.map(_one, parts))   # order-preserving
    all_cols: dict[str, object] = {}
    for t, _n in loaded:
        for f in t.schema:
            all_cols.setdefault(f.name, f.type)
    arrays = {}
    for name, typ in sorted(all_cols.items()):
        chunks = []
        for t, n in loaded:
            if name in t.schema.names:
                chunks.append(t.column(name))
            else:   # part predates a dynamic field: zero-fill
                chunks.append(pa.chunked_array(
                    [pa.nulls(n, typ).fill_null(0)]
                ))
        arrays[name] = pa.concat_arrays(
            [c for ch in chunks for c in ch.chunks]
        )
    pq.write_table(
        pa.table(arrays), fs_join(root, "norms.parquet"),
        compression="zstd", row_group_size=1 << 22, filesystem=fs,
    )


def build_index(
    input_paths: str | list[str],
    index_dir: str,
    cfg: IndexConfig,
    *,
    concurrency: int | None = None,
) -> dict:
    """Build (or resume building) an index; returns the manifest."""
    import ray.data

    t_start = time.time()
    fragments, input_fp = list_fragments(input_paths)
    if cfg.dynamic:
        cfg = cfg.with_discovered(_input_schemas(fragments))
    if (cfg.merge_buckets is None or cfg.salt_doc_range is None
            or cfg.num_shards is None):
        # deterministic (functions of the input inventory), resolved
        # BEFORE fingerprinting so the manifest records the integers
        from dataclasses import replace

        from ..schema import (
            auto_merge_buckets,
            auto_num_shards,
            auto_salt_doc_range,
        )

        total_rows = sum(f["num_rows"] for f in fragments)
        cfg = replace(
            cfg,
            num_shards=(
                cfg.num_shards
                if cfg.num_shards is not None
                else auto_num_shards(total_rows)
            ),
            merge_buckets=(
                cfg.merge_buckets
                if cfg.merge_buckets is not None
                else auto_merge_buckets(total_rows)
            ),
            salt_doc_range=(
                cfg.salt_doc_range
                if cfg.salt_doc_range is not None
                else auto_salt_doc_range(total_rows)
            ),
        )
    cfg_fp = _config_fingerprint(cfg)
    build_fp = f"{input_fp}:{cfg_fp}"

    existing = read_manifest(index_dir)
    if existing and existing.get("fingerprint") == build_fp:
        return existing  # already committed for these exact inputs

    _fs, _root = resolve_fs(index_dir)
    fs_makedirs(_fs, _root)
    _clear_stale_build(index_dir, build_fp)
    _repair_gc_orphans(index_dir, build_fp)

    # ---- phase 1: tokenize + invert, one task per fragment GROUP --------
    # deterministic grouping (split at salt-range boundaries) => resumable
    # checkpoints + byte-identical outputs at any parallelism
    groups = _group_fragments(
        fragments, cfg.fragments_per_task, cfg.resolved_salt_doc_range
    )
    frag_ds = ray.data.from_items(groups, override_num_blocks=len(groups))
    # invert_num_cpus reserves CPUs per task (cfg knob; >1 caps per-node
    # concurrency for bandwidth-bound analyzers — unnecessary since the
    # memoized tokenizer, measured in BASELINE.md).
    # Task pool with a serialized UDF instance: measured FASTER than an
    # autoscaling actor pool here — actor ramp-up wastes several seconds
    # of a sub-minute stage, while per-task UDF deserialization is cheap
    # and the region-memo cache warms within each multi-fragment group.
    invert_ds = frag_ds.map_batches(
        InvertFragment(cfg, index_dir, build_fp),
        batch_size=1,
        num_cpus=cfg.invert_num_cpus,
        concurrency=concurrency,
    )
    invert_metrics = invert_ds.take_all()
    invert_stats = invert_ds.stats()
    t_invert = time.time()

    # ---- phase 2: per-shard merge (map-side shuffle, no all-to-all) ----
    from ..stages.merge import ShardMerger

    num_buckets = cfg.resolved_merge_buckets
    bucket_ds = ray.data.from_items(
        [{"shard": s} for s in range(cfg.num_shards)],
        override_num_blocks=cfg.num_shards,
    )
    shard_ds = bucket_ds.map_batches(
        ShardMerger(index_dir, build_fp, cfg.shards_row_group_size,
                    cfg.num_shards, num_buckets,
                    gc_segments=cfg.gc_segments_during_merge),
        batch_size=1,
        batch_format="pyarrow",
        num_cpus=cfg.merge_num_cpus,
        concurrency=concurrency,
    )
    shard_metrics = shard_ds.take_all()
    shard_stats = shard_ds.stats()
    t_merge = time.time()

    # consolidated per-row-group stats sidecar: readers load ONE small
    # file instead of parsing every band file's footer at open
    from ..stages.merge import write_shard_stats

    write_shard_stats(
        index_dir,
        [int(m["shard_salt"]) for m in shard_metrics],
        cfg.num_shards, cfg.resolved_salt_doc_range,
        concurrency=concurrency,
    )
    # consolidated norms/doc-lens sidecar (the .f<n> analogue): one
    # column read per field at serving, not ~1.3k doc-part reads
    write_norms_sidecar(index_dir)

    # ---- phase 3: stats + atomic manifest commit ------------------------
    num_docs = sum(m["num_docs"] for m in invert_metrics)
    field_names = list(cfg.fields)
    len_sums = {
        f: int(sum(m.get(f"len_sum_{f}", 0) for m in invert_metrics))
        for f in cfg.indexed_fields
    }
    manifest = {
        "version": 1,
        "format": INDEX_FORMAT_VERSION,
        "fingerprint": build_fp,
        "config": cfg.to_json(),
        "field_names": field_names,
        "num_docs": int(num_docs),
        "len_sums": len_sums,
        "num_fragments": len(fragments),
        "shards": sorted(
            int(m["shard_salt"]) for m in shard_metrics
        ),
        "metrics": {
            "docs_tokenized": int(num_docs),
            "tokens": int(sum(m["num_tokens"] for m in invert_metrics)),
            "postings_emitted": int(
                sum(m["num_postings"] for m in invert_metrics)
            ),
            "segments_merged": len(
                [m for m in shard_metrics if not m["skipped"]]
            ),
            "terms_merged": int(
                sum(m["num_terms"] for m in shard_metrics)
            ),
            "shard_bytes": int(sum(m["bytes"] for m in shard_metrics)),
            "fragments_skipped": len(
                [m for m in invert_metrics if m["skipped"]]
            ),
            "invert_sec": t_invert - t_start,
            "merge_sec": t_merge - t_invert,
            "total_sec": time.time() - t_start,
        },
        "lineage": {
            "input_fingerprint": input_fp,
            "config_fingerprint": cfg_fp,
            "inputs": sorted({os.path.basename(f["path"]) for f in fragments}),
        },
        # ray.data per-operator execution stats (remote wall/cpu, block
        # sizes, throughput) for the two distributed stages
        "ray_stats": {
            "invert": invert_stats[:4000],
            "merge": shard_stats[:4000],
        },
    }
    write_manifest(index_dir, manifest)
    return manifest


def _input_schemas(fragments: list[dict]) -> list:
    """Arrow schema per distinct input file (footer metadata only)."""
    from ..state.fs import open_parquet, resolve_fs

    seen: dict[str, object] = {}
    for f in fragments:
        p = f["path"]
        if p not in seen:
            fs, inner = resolve_fs(p)
            seen[p] = open_parquet(fs, inner).schema_arrow
    return list(seen.values())


def _group_fragments(
    fragments: list[dict], per_task: int, salt_doc_range: int
) -> list[dict]:
    """Chunk consecutive fragments into invert-task groups, never crossing
    a salt-doc-range boundary (preserves the disjoint-range invariant of
    the salted shuffle)."""
    groups: list[dict] = []
    cur: list[dict] = []
    cur_range = None
    for f in fragments:
        r = f["doc_base"] // salt_doc_range
        if cur and (len(cur) >= per_task or r != cur_range):
            groups.append({"group_id": len(groups), "frags": cur})
            cur = []
        cur_range = r
        cur.append(f)
    if cur:
        groups.append({"group_id": len(groups), "frags": cur})
    return groups


# Physical-layout version, part of every build fingerprint AND recorded
# in the manifest (checked by IndexReader): bump when a code change
# alters index bytes, placement, or manifest schema for the SAME config,
# so index dirs from older code can never be silently reused — resume
# would rebuild, and a reader fails loudly instead of returning 0 hits
# from the wrong shard.
# v3: field_mix XOR term-shard hash (was crc-init mixing).
# v4: manifest records "format" for the read-time guard.
# v5: salt by docid band inside invert (postings split at
#     doc // salt_doc_range run boundaries, not at the fragment-group
#     base) + salt_doc_range auto-fit default — 1/N range ownership no
#     longer depends on the input's row-group layout.
#  v6: dictionary/postings shard file split
#  v7: docs/freqs stored as int32 list columns (parquet C++ decode on
#      the serving path; no VInt work on scoring streams); skip entries
#      are (docΔ, prxΔ) pairs
INDEX_FORMAT_VERSION = 8


def _config_fingerprint(cfg: IndexConfig) -> str:
    import hashlib
    import json

    blob = json.dumps(cfg.to_json(), sort_keys=True)
    return hashlib.sha256(
        f"v{INDEX_FORMAT_VERSION}:{blob}".encode()
    ).hexdigest()[:16]
