"""Incremental index lifecycle: append, upsert-by-key, geometric merge.

The Ray re-expression of the reference's IndexWriter lifecycle:

* ``add_indexes``      — bulk append of existing indexes with doc-base
  and field-number remapping (``iw_add_readers``/``add_indexes``,
  c/src/index.c:6530-6810): a distributed rebase (shard rows -> shifted
  segment rows via a first-VInt byte splice) feeding the same bucketed
  merge as a fresh build.  Merged shard bytes are IDENTICAL to a
  from-scratch build over the concatenated corpus (tested).
* ``IncrementalIndex`` — an LSM of delta indexes under one root:
  ``append`` builds a new delta through the normal build pipeline,
  ``reader()`` serves all deltas as one (MultiReader — global df,
  doc-base offsets, bit-identical scores), and the geometric merge
  policy of ``iw_maybe_merge_segments`` (c/src/index.c:6280-6309)
  compacts runs of small deltas with ``add_indexes``.
* upsert-by-key        — ``Index#add_doc`` with ``:key``
  (c/src/ind.c:202-258, ruby/lib/ferret/index.rb:34-45): incoming keys
  tombstone matching docs in every existing delta, then the new docs
  append; compaction drops tombstoned docs for real.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import FieldConfig, IndexConfig
from ..state.fs import (
    fs_listdir,
    fs_makedirs,
    fs_rmtree,
    join as fs_join,
    resolve_fs,
)
from ..state.manifest import (
    atomic_write_json,
    checkpoint_done,
    read_json,
    read_manifest,
    write_checkpoint,
    write_manifest,
)

# merge_buckets is deliberately NOT a compat key: add_indexes reads the
# sources' per-term-hash SHARD files (never their bucketed segment
# layout) and re-buckets into the dest with the dest's own count, so
# indexes built at different sizes (auto merge_buckets) still combine.
_COMPAT_KEYS = ("num_shards", "salt_doc_range", "similarity")


def _cfg_from_manifest(m: dict) -> IndexConfig:
    c = m["config"]
    fields = {
        name: FieldConfig(
            indexed=fc["indexed"], stored=fc["stored"],
            positions=fc["positions"], norms=fc["norms"],
            boost=fc["boost"], analyzer=fc["analyzer"],
            max_field_length=fc["max_field_length"],
            term_vector=fc.get("term_vector", False),
        )
        for name, fc in c["fields"].items()
    }
    return IndexConfig(
        fields=fields,
        boost_column=c.get("boost_column"),
        id_columns=tuple(c.get("id_columns", ())),
        num_shards=c["num_shards"],
        fragments_per_task=c.get("fragments_per_task", 8),
        hot_df_per_fragment=c.get("hot_df_per_fragment", 4096),
        salt_doc_range=c["salt_doc_range"],
        similarity=c.get("similarity", "default"),
        merge_buckets=c.get("merge_buckets", 32),
        docs_row_group_size=c.get("docs_row_group_size", 1024),
        shards_row_group_size=c.get("shards_row_group_size", 1024),
    )


class _RebaseTask:
    """map_batches UDF over work rows: rebase one source shard file into
    dest bucket files, or renumber one source docs part."""

    def __init__(self, dest_dir: str, fp: str, cfg: IndexConfig,
                 field_names: list[str]):
        self.dest_dir = dest_dir
        self.fp = fp
        self.cfg = cfg
        self.field_names = field_names

    def __call__(self, batch: dict) -> dict:
        outs = []
        for i in range(len(batch["kind"])):
            outs.append(
                self._one(
                    str(batch["kind"][i]), str(batch["src"][i]),
                    str(batch["rel"][i]), int(batch["offset"][i]),
                    str(batch["tag"][i]),
                    json.loads(str(batch["field_map"][i])),
                )
            )
        return {"outputs": [json.dumps(o) for o in outs]}

    def _one(self, kind, src, rel, offset, tag, field_map_l) -> list[str]:
        from ..stages.merge import rebase_shard_rows, write_bucketed_segments

        key = f"{kind}-{tag}"
        if checkpoint_done(self.dest_dir, "rebase", key, self.fp):
            from ..state.manifest import checkpoint_path

            rec = read_json(checkpoint_path(self.dest_dir, "rebase", key))
            return rec.get("outputs", [])
        sfs, sroot = resolve_fs(src)
        if kind == "shard":
            # format v8: one file pair per hash shard; rebase one BAND
            # at a time so the working set stays one band's slice
            from ..stages.merge import iter_shard_bands

            src_m = read_manifest(src)
            shard_id = int(rel)
            rels = []
            for bi, (_salt, t) in enumerate(iter_shard_bands(
                sfs, sroot, shard_id,
                int(src_m["config"]["num_shards"]),
                int(src_m["config"]["salt_doc_range"]),
            )):
                seg = rebase_shard_rows(
                    t, offset, np.asarray(field_map_l, dtype=np.int64),
                    self.field_names, self.cfg,
                )
                rels += write_bucketed_segments(
                    seg, self.dest_dir, f"{tag}-b{bi:04d}", self.cfg
                )
        else:  # docs part
            t = pq.read_table(fs_join(sroot, rel), filesystem=sfs)
            ids = t.column("doc_id").to_numpy() + offset
            t = t.set_column(
                t.schema.get_field_index("doc_id"), "doc_id",
                pa.array(ids, type=pa.int64()),
            )
            # schema alignment (mirrors stages/invert.py's "fields
            # absent from THIS input" block): a source delta built
            # before a dynamic field existed lacks that field's
            # stored/len/norm columns; the reader requires every docs
            # part to share one logical schema (a missing norm column in
            # ANY part disables norms index-wide -> zero scores)
            from ..codec.norms import encode_norms

            n_rows = t.num_rows
            have = set(t.column_names)
            for fname, fc in self.cfg.fields.items():
                if fc.stored and fname not in have:
                    t = t.append_column(fname, pa.nulls(n_rows))
                if not fc.indexed:
                    continue
                if f"len_{fname}" not in have:
                    t = t.append_column(
                        f"len_{fname}",
                        pa.array(
                            np.zeros(n_rows, dtype=np.int32)
                        ),
                    )
                if fc.norms and f"norm_{fname}" not in have:
                    t = t.append_column(
                        f"norm_{fname}",
                        pa.array(
                            encode_norms(
                                np.zeros(n_rows, dtype=np.float32)
                            )
                        ),
                    )
            rels = [f"docs/part-{tag}.parquet"]
            dfs, droot = resolve_fs(self.dest_dir)
            fs_makedirs(dfs, fs_join(droot, "docs"))
            pq.write_table(
                t, fs_join(droot, rels[0]),
                compression=self.cfg.docs_compression(t.column_names),
                filesystem=dfs,
            )
        write_checkpoint(self.dest_dir, "rebase", key, self.fp, rels, {})
        return rels


def add_indexes(
    dest_dir: str,
    src_dirs: list[str],
    *,
    concurrency: int | None = None,
) -> dict:
    """Merge N source indexes into one (iw_add_readers semantics).

    Doc ids shift by cumulative source sizes; field numbers remap into
    the union schema; source tombstones carry forward shifted (like the
    per-segment .del a merge keeps honoring; a rebuild from a filtered
    corpus is the physical purge).  Distributed: one rebase task per
    source shard/docs file, then the standard bucketed merge.
    Byte-identical to a from-scratch build of the concatenated corpus
    when sources carry no tombstones (tested)."""
    import ray.data

    from ..pipelines.deletes import load_deleted
    from ..stages.merge import ShardMerger

    t_start = time.time()
    manifests = [read_manifest(d) for d in src_dirs]
    for d, m in zip(src_dirs, manifests):
        if m is None:
            raise FileNotFoundError(f"no manifest in {d}")
    base_cfg = manifests[0]["config"]
    for m in manifests[1:]:
        for k in _COMPAT_KEYS:
            if m["config"].get(k) != base_cfg.get(k):
                raise ValueError(
                    f"add_indexes: incompatible config {k!r}: "
                    f"{m['config'].get(k)} != {base_cfg.get(k)}"
                )
    # union field schema, first-seen order; same-name fields must agree
    field_names: list[str] = []
    fields_cfg: dict[str, dict] = {}
    for m in manifests:
        for name in m["field_names"]:
            fc = m["config"]["fields"].get(name)
            if name not in field_names:
                field_names.append(name)
                if fc:
                    fields_cfg[name] = fc
            elif fc and fields_cfg.get(name) != fc:
                raise ValueError(
                    f"add_indexes: field {name!r} config mismatch"
                )
    cfg = _cfg_from_manifest(
        {"config": {**base_cfg, "fields": fields_cfg}}
    )
    offsets = np.concatenate(
        ([0], np.cumsum([m["num_docs"] for m in manifests]))
    )
    from .build import INDEX_FORMAT_VERSION

    fp = f"addidx-v{INDEX_FORMAT_VERSION}:" + ":".join(
        f"{m['fingerprint']}@{int(o)}" for m, o in zip(manifests, offsets)
    )

    existing = read_manifest(dest_dir)
    if existing and existing.get("fingerprint") == fp:
        return existing
    _dfs, _droot = resolve_fs(dest_dir)
    fs_makedirs(_dfs, _droot)
    del_by_src = [sorted(load_deleted(d)) for d in src_dirs]

    work = []
    part_idx = 0
    for si, (src, m) in enumerate(zip(src_dirs, manifests)):
        fmap = [field_names.index(f) for f in m["field_names"]]
        src_nshards = int(m["config"]["num_shards"])
        for sid in sorted({int(s) % src_nshards for s in m["shards"]}):
            # format v8: one work item per source shard FILE (its bands
            # stream through rebase one at a time); "rel" carries the
            # shard id
            work.append(
                {
                    "kind": "shard", "src": src,
                    "rel": str(sid),
                    "offset": int(offsets[si]),
                    "tag": f"x{si:03d}-{sid:08d}",
                    "field_map": json.dumps(fmap),
                }
            )
        sfs, sroot = resolve_fs(src)
        for name in fs_listdir(sfs, fs_join(sroot, "docs")):
            if name.endswith(".parquet"):
                work.append(
                    {
                        "kind": "docs", "src": src,
                        "rel": f"docs/{name}",
                        "offset": int(offsets[si]),
                        "tag": f"{part_idx:06d}",
                        "field_map": "[]",
                    }
                )
                part_idx += 1

    rebase_ds = ray.data.from_items(
        work, override_num_blocks=max(1, len(work))
    ).map_batches(
        _RebaseTask(dest_dir, fp, cfg, field_names),
        batch_size=8,
        concurrency=concurrency,
    )
    rebase_ds.take_all()
    t_rebase = time.time()

    num_buckets = cfg.resolved_merge_buckets
    bucket_ds = ray.data.from_items(
        [{"shard": s} for s in range(cfg.num_shards)],
        override_num_blocks=cfg.num_shards,
    )
    shard_metrics = bucket_ds.map_batches(
        ShardMerger(dest_dir, fp, cfg.shards_row_group_size,
                    cfg.num_shards, num_buckets),
        batch_size=1,
        batch_format="pyarrow",
        concurrency=concurrency,
    ).take_all()
    from ..stages.merge import write_shard_stats

    write_shard_stats(
        dest_dir,
        [int(x["shard_salt"]) for x in shard_metrics],
        cfg.num_shards, cfg.resolved_salt_doc_range,
        concurrency=concurrency,
    )
    t_merge = time.time()

    num_docs = int(offsets[-1])
    len_sums = {
        f: int(sum(m.get("len_sums", {}).get(f, 0) for m in manifests))
        for f in cfg.indexed_fields
    }
    manifest = {
        "version": 1,
        "format": INDEX_FORMAT_VERSION,
        "fingerprint": fp,
        "config": cfg.to_json(),
        "field_names": field_names,
        "num_docs": num_docs,
        "len_sums": len_sums,
        "num_fragments": int(
            sum(m.get("num_fragments", 0) for m in manifests)
        ),
        "shards": sorted(int(x["shard_salt"]) for x in shard_metrics),
        "metrics": {
            "sources": len(src_dirs),
            "rebase_sec": t_rebase - t_start,
            "merge_sec": t_merge - t_rebase,
            "total_sec": time.time() - t_start,
            "terms_merged": int(
                sum(x["num_terms"] for x in shard_metrics)
            ),
        },
        "lineage": {
            "kind": "add_indexes",
            "sources": [
                {"dir": os.path.basename(d.rstrip("/")),
                 "fingerprint": m["fingerprint"],
                 "num_docs": m["num_docs"],
                 "doc_base": int(o)}
                for d, m, o in zip(src_dirs, manifests, offsets)
            ],
        },
    }
    write_manifest(dest_dir, manifest)
    # carry tombstones forward, shifted by each source's doc base
    from ..pipelines.deletes import delete_docs

    shifted = [
        int(d) + int(o)
        for ds_, o in zip(del_by_src, offsets)
        for d in ds_
    ]
    if shifted:
        delete_docs(dest_dir, shifted)
    return manifest


class IncrementalIndex:
    """LSM of delta indexes with the reference's geometric merge policy.

    Layout: ``root/gens.json`` lists delta dirs in doc order; each delta
    is a complete index built by the normal pipeline.  ``append`` adds a
    delta and runs ``maybe_merge`` (iw_maybe_merge_segments,
    c/src/index.c:6280-6309); ``optimize`` compacts to one delta
    (iw_optimize, :6439-6460).  Serving never stops: ``reader()`` is a
    MultiReader over the current generation set."""

    def __init__(self, root: str, cfg: IndexConfig,
                 merge_factor: int = 10,
                 max_merge_docs: int = 1 << 31,
                 defer_gc: bool = False):
        self.root = root
        self.cfg = cfg
        self.merge_factor = merge_factor
        self.max_merge_docs = max_merge_docs
        # defer_gc=True: merged-away / purged delta dirs are kept on
        # disk (listed in gens.json "trash") until an explicit gc() —
        # the distributed analogue of the reference's Deleter, which
        # only removes files once no reader references them
        # (c/src/index.c:3683-3860).  Long-lived SearcherActor pools
        # read row groups lazily per query, so eager deletion would
        # break in-flight serving of the previous generation.
        self.defer_gc = defer_gc
        rfs, rroot = resolve_fs(root)
        fs_makedirs(rfs, rroot)
        self._state = read_json(self._gens_path()) or {
            "deltas": [], "counter": 0,
        }
        # dynamic configs may have implicitly declared upsert key fields
        # (keyword, like the reference's untokenized :id convention);
        # reapply them so every reopen builds deltas with the same
        # FieldInfos
        for k in self._state.get("key_fields", []):
            if k not in self.cfg.fields:
                self.cfg.fields[k] = FieldConfig(
                    analyzer="keyword", positions=False
                )

    def _gens_path(self) -> str:
        return fs_join(self.root, "gens.json")

    def _commit(self) -> None:
        atomic_write_json(self._gens_path(), self._state)

    @property
    def delta_dirs(self) -> list[str]:
        return [fs_join(self.root, d) for d in self._state["deltas"]]

    def delta_doc_counts(self) -> list[int]:
        return [
            read_manifest(d)["num_docs"] for d in self.delta_dirs
        ]

    def num_docs(self) -> int:
        return sum(self.delta_doc_counts())

    # ---- writing --------------------------------------------------------

    def append(self, input_paths, *, merge: bool = True) -> dict:
        """Index new docs as a delta; maybe run geometric compaction."""
        from .build import build_index

        name = f"delta-{self._state['counter']:06d}"
        self._state["counter"] += 1
        m = build_index(
            input_paths, fs_join(self.root, name), self.cfg
        )
        self._state["deltas"].append(name)
        self._commit()
        if merge:
            self.maybe_merge()
        return m

    def upsert(self, input_paths, key_field: str,
               *, merge: bool = True) -> dict:
        """Index#add_doc with :key semantics (c/src/ind.c:202-258):
        tombstone every existing doc whose ``key_field`` matches an
        incoming key, then append the new docs as a delta."""
        from ..pipelines.deletes import delete_by_terms

        fc = self.cfg.fields.get(key_field)
        if fc is None and self.cfg.dynamic:
            # dynamic schema: declare the key field keyword on first use
            # (the reference's untokenized :id convention).  Only safe
            # before any delta could have discovered it as tokenized
            # text.
            if self._state["deltas"]:
                raise ValueError(
                    f"dynamic upsert key {key_field!r} must be declared "
                    "before the first append (existing deltas may have "
                    "indexed it tokenized)"
                )
            fc = FieldConfig(analyzer="keyword", positions=False)
            self.cfg.fields[key_field] = fc
            keys_declared = self._state.setdefault("key_fields", [])
            if key_field not in keys_declared:
                keys_declared.append(key_field)
                self._commit()
        if fc is None or fc.analyzer != "keyword":
            raise ValueError(
                f"upsert key field {key_field!r} must be a keyword field"
            )
        # every existing delta must have indexed the key field AS A
        # KEYWORD, else the tombstone pass silently matches nothing and
        # stale docs survive: a tokenizing analyzer splits/lowercases the
        # key at index time, but delete_by_terms looks up the raw key as
        # one exact term
        for d in self.delta_dirs:
            m = read_manifest(d)
            dfc = m["config"]["fields"].get(key_field)
            if dfc is None or not dfc.get("indexed", True):
                raise ValueError(
                    f"delta {d} was built without indexing key field "
                    f"{key_field!r}; upsert cannot tombstone its docs "
                    "(declare the key field before the first append)"
                )
            if dfc.get("analyzer", "standard") != "keyword":
                raise ValueError(
                    f"delta {d} indexed key field {key_field!r} with "
                    f"analyzer {dfc.get('analyzer', 'standard')!r}, not "
                    "'keyword'; exact-term tombstoning would silently "
                    "match nothing (rebuild or re-key the index)"
                )
        paths = (
            [input_paths] if isinstance(input_paths, str) else input_paths
        )
        keys: set[str] = set()
        for p in paths:
            pfs, pin = resolve_fs(p)
            t = pq.read_table(pin, columns=[key_field], filesystem=pfs)
            keys.update(
                x for x in t.column(key_field).to_pylist() if x
            )
        for d in self.delta_dirs:
            # one bulk dictionary pass per delta for ALL incoming keys
            delete_by_terms(d, key_field, sorted(keys))
        return self.append(input_paths, merge=merge)

    # ---- merge policy ---------------------------------------------------

    def maybe_merge(self) -> None:
        """Geometric policy, mirroring iw_maybe_merge_segments
        (c/src/index.c:6280-6309): walk size tiers from merge_factor
        upward; whenever the trailing run of deltas smaller than the
        tier target holds >= target docs, compact that run."""
        target = self.merge_factor
        while 0 < target <= self.max_merge_docs:
            counts = self.delta_doc_counts()
            min_seg = len(counts) - 1
            merge_docs = 0
            while min_seg >= 0 and counts[min_seg] < target:
                merge_docs += counts[min_seg]
                min_seg -= 1
            if merge_docs >= target:
                self._compact_from(min_seg + 1)
            elif min_seg <= 0:
                break
            target *= self.merge_factor

    def _compact_from(self, start: int) -> None:
        """Compact deltas[start:] into one (iw_merge_segments_from)."""
        srcs = self._state["deltas"][start:]
        if len(srcs) < 2:
            return
        name = f"delta-{self._state['counter']:06d}"
        self._state["counter"] += 1
        add_indexes(
            fs_join(self.root, name),
            [fs_join(self.root, s) for s in srcs],
        )
        self._state["deltas"] = self._state["deltas"][:start] + [name]
        # GC the merged-away deltas (the reference's Deleter removes
        # unreferenced segment files after the commit point; deferred
        # mode keeps them until gc() so open readers finish safely)
        self._gc_or_trash(srcs)

    def optimize(self) -> None:
        """iw_optimize: merge everything into a single delta."""
        if len(self._state["deltas"]) >= 2:
            self._compact_from(0)

    def expunge_deletes(self) -> None:
        """Physically purge tombstones from every delta (the doc_map
        remap of a reference merge; pipelines/expunge.py).  Scores then
        reflect the shrunken df/N, like a fresh build."""
        from .deletes import load_deleted
        from .expunge import expunge_deletes as _expunge

        for i, name in enumerate(list(self._state["deltas"])):
            src = fs_join(self.root, name)
            if not load_deleted(src):
                continue
            new = f"delta-{self._state['counter']:06d}"
            self._state["counter"] += 1
            _expunge(src, fs_join(self.root, new))
            self._state["deltas"][i] = new
            self._gc_or_trash([name])

    def _gc_or_trash(self, names: list[str]) -> None:
        """Commit the new generation set, then delete or defer."""
        if self.defer_gc:
            self._state.setdefault("trash", []).extend(names)
            self._commit()
            return
        self._commit()
        rfs, rroot = resolve_fs(self.root)
        for s in names:
            fs_rmtree(rfs, fs_join(rroot, s))

    def gc(self) -> int:
        """Delete deferred-GC delta dirs once no reader of the previous
        generation remains (operator-controlled grace, like the
        reference's Deleter release point).  Returns dirs removed."""
        trash = self._state.get("trash", [])
        if not trash:
            return 0
        rfs, rroot = resolve_fs(self.root)
        for s in trash:
            fs_rmtree(rfs, fs_join(rroot, s))
        n = len(trash)
        self._state["trash"] = []
        self._commit()
        return n

    # ---- reading --------------------------------------------------------

    def reader(self):
        from ..search.multi import MultiReader
        from ..search.reader import IndexReader

        dirs = self.delta_dirs
        if len(dirs) == 1:
            return IndexReader(dirs[0])
        return MultiReader([IndexReader(d) for d in dirs])

    def searcher(self, similarity: str | None = None):
        from ..search.searcher import Searcher

        return Searcher(self.reader(), similarity=similarity)
