"""Index schema / per-field options (FieldInfos equivalent).

The reference packs per-field flags (stored / indexed / tokenized /
positions / norms) into FieldInfo bits (c/include/index.h:73-165) with
dynamic field addition.  Ours is a small picklable config object serialized
as JSON into the index manifest.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any

from .analysis import Analyzer, standard_analyzer


@dataclass
class FieldConfig:
    indexed: bool = True
    stored: bool = True
    positions: bool = True
    norms: bool = True
    boost: float = 1.0
    # analyzer key: "standard" | "whitespace" | "whitespace_double" |
    # "letter" | "keyword" — resolved via analyzer_for(); custom Analyzer
    # instances may be passed directly (picklable).
    analyzer: str | Analyzer = "standard"
    max_field_length: int = 10_000  # c/src/index.c:36
    # store per-doc term vectors (positions + offsets) in the docs table
    # (TERM_VECTOR_WITH_POSITIONS_OFFSETS, c/include/index.h:544-566)
    term_vector: bool = False
    # per-field stored-value codec — the STORE_COMPRESS flag analogue
    # (c/include/index.h:77).  None = the index default (zstd); "none"
    # disables compression for this field's docs-table column (already-
    # compressed payloads, e.g. binary media), or pin "lz4"/"gzip"/...
    store_compression: str | None = None


@dataclass
class IndexConfig:
    """Index build configuration.

    Sizing at scale (10^9..10^12 docs): the index has one shard file per
    (salt range, term hash), so
    * ``num_shards``       ~ O(cluster cores) for merge parallelism and
      per-file size; a term's dictionary lookup touches one hash across
      all ranges;
    * ``salt_doc_range``   bounds the skew of any one merge group AND
      sets a term's file fan-in (= total_docs / salt_doc_range files per
      term at read time): raise it with corpus size, e.g. 2^30 at 10^12
      docs (~1k range files per term);
    * ``merge_buckets``    = merge task count; each task holds one
      (bucket x salt-range) slice in memory — raise with corpus size so
      slices stay in worker heap.
    All three are part of the manifest fingerprint; outputs are
    byte-identical at any parallelism for a fixed config."""

    fields: dict[str, FieldConfig]
    # column holding a per-document boost multiplier (test corpora);
    # doc_boost propagates into norms (c/src/index.c:5676-5681)
    boost_column: str | None = None
    # columns copied to the docs table but not indexed
    id_columns: tuple[str, ...] = ()
    # ``None`` = auto-fit from the corpus size in build_index
    # (:func:`auto_num_shards`); direct stage use requires an integer
    num_shards: int | None = 16
    # fragments (row-groups) per invert task: tokenized one-by-one (small
    # working set) but written as ONE segment — per-group vocab dedup
    # (8 x 500-row fragments ~ 4k docs/task: amortizes per-task overhead
    # while leaving enough tasks to fill the cluster)
    fragments_per_task: int = 8
    # skew handling: a term whose df within one input fragment exceeds
    # hot_df_per_fragment gets salted sub-groups of salt_doc_range docs
    hot_df_per_fragment: int = 4096
    # doc-band size of the salted shuffle: postings are split at
    # ``doc // salt_doc_range`` boundaries INSIDE invert (vectorized
    # run-boundary mask), so 1/N range ownership in partitioned serving
    # never depends on the input's file/row-group layout.  ``None``
    # (default) auto-fits from the corpus size at build time
    # (:func:`auto_salt_doc_range`, deterministic — the manifest records
    # the resolved integer, like ``merge_buckets``).
    salt_doc_range: int | None = None
    similarity: str = "default"  # "default" (Ferret TF-IDF) | "bm25"
    # map-side shuffle fan-out: invert tasks write one segment file per
    # bucket (= shard_salt % merge_buckets); the merge is one task per
    # bucket with NO Ray all-to-all.  Fixed by config (not by cluster
    # size) so outputs are byte-identical at any parallelism.  Each merge
    # task holds ~total_postings/merge_buckets in worker heap, so the
    # count must scale with the corpus: ``None`` (default) sizes it from
    # the input row count at build time (:func:`auto_merge_buckets`,
    # deterministic — part of the manifest after resolution).  Shard
    # files are one-per-term-hash regardless, so the bucket count never
    # changes output bytes, only task granularity.
    merge_buckets: int | None = None
    # CPUs reserved per invert task.  1.0 since the memoized tokenizer:
    # the stage is no longer memory-bandwidth-bound, so one task per core
    # wins (measured: invert 15.8s -> 9.2s at 32 cpus / 200k docs)
    invert_num_cpus: float = 1.0
    # CPUs reserved per merge (bucket) task — same knob for the merge
    # stage; >1 caps concurrency for bandwidth-emulation measurements
    merge_num_cpus: float = 1.0
    # Each merge task deletes its own shard's segment bucket dirs right
    # after writing that shard's durable checkpoint: peak disk drops
    # from O(segments + shards) to O(segments) because a shard's
    # intermediates are released the moment its output is committed
    # (measured: the 50M-doc soak's 31 GB of segments coexisted with
    # 19 GB of shards and bottomed the disk at 3.6 GB free).  Safe for
    # resume — a checkpoint-done shard never re-reads its segments —
    # and execution-only, so it is excluded from the build fingerprint
    # like the *_num_cpus knobs.
    gc_segments_during_merge: bool = True
    # parquet row-group size of the stored-docs parts: the unit of
    # point access for get_doc/highlight (FieldsReader .fdx analogue).
    # Smaller = finer fetches for doc display, larger = better scans.
    docs_row_group_size: int = 1024
    # parquet row-group size of the SHARD (dictionary+postings) files:
    # the unit of query-time range reads (one row group ~ one .frq
    # block seek).  A wide expansion matches a short contiguous dict
    # run per file, so the whole-row-group read amplification scales
    # with this value (measured 1.03 GB read for ~25 MB of needed
    # postings at 1024 on a 2M-doc corpus); smaller groups cut read
    # bytes at the cost of more footer metadata per file.  256 measured
    # best on the 2M-doc cold-expansion profile (1024 reads 2.9x the
    # bytes, 128 pays more in per-group metadata than it saves).
    shards_row_group_size: int = 256
    # dynamic FieldInfos (frt_fis_get_or_add_field, c/include/index.h:160
    # + fis_new defaults): fields present in the input schemas but not
    # declared are added at build time with a copy of ``default_field``
    # (string columns; indexed+stored) or as stored-only (other types).
    # Discovery is a driver-side metadata pass over the parquet footers,
    # so field numbering stays deterministic; the manifest records the
    # union, and add_indexes/lifecycle remap per delta.
    dynamic: bool = False
    default_field: FieldConfig | None = None

    def docs_compression(self, column_names) -> "str | dict[str, str]":
        """Parquet codec spec for one docs-table part.

        Honors per-field ``store_compression`` (STORE_COMPRESS analogue);
        when any field overrides, the spec must enumerate EVERY column
        (pyarrow leaves unlisted columns uncompressed)."""
        overrides = {
            n: fc.store_compression
            for n, fc in self.fields.items()
            if fc.stored and fc.store_compression
        }
        if not overrides:
            return "zstd"
        return {c: overrides.get(c, "zstd") for c in column_names}

    @property
    def resolved_salt_doc_range(self) -> int:
        """salt_doc_range with the ``None`` fallback for direct stage
        use (tests driving invert/merge without the build pipeline); the
        build pipeline resolves it from the input size first
        (:func:`auto_salt_doc_range`) so a manifest always records the
        integer."""
        return (
            1 << 22 if self.salt_doc_range is None else self.salt_doc_range
        )

    @property
    def resolved_merge_buckets(self) -> int:
        """merge_buckets clamped so every bucket holds >=1 term hash.

        ``None`` falls back to 32 here for direct stage use; the build
        pipeline resolves it from the input size first (build.py), so a
        manifest always records the resolved integer."""
        b = 32 if self.merge_buckets is None else self.merge_buckets
        return max(1, min(b, self.num_shards or b))

    def to_json(self) -> dict[str, Any]:
        return {
            "fields": {
                name: {
                    "indexed": fc.indexed,
                    "stored": fc.stored,
                    "positions": fc.positions,
                    "norms": fc.norms,
                    "boost": fc.boost,
                    "analyzer": fc.analyzer
                    if isinstance(fc.analyzer, str)
                    else "custom",
                    "max_field_length": fc.max_field_length,
                    "term_vector": fc.term_vector,
                    "store_compression": fc.store_compression,
                }
                for name, fc in self.fields.items()
            },
            "boost_column": self.boost_column,
            "id_columns": list(self.id_columns),
            "num_shards": self.num_shards,
            "fragments_per_task": self.fragments_per_task,
            "hot_df_per_fragment": self.hot_df_per_fragment,
            "salt_doc_range": self.salt_doc_range,
            "similarity": self.similarity,
            "merge_buckets": self.merge_buckets,
            "docs_row_group_size": self.docs_row_group_size,
            "shards_row_group_size": self.shards_row_group_size,
            "dynamic": self.dynamic,
        }

    @property
    def indexed_fields(self) -> list[str]:
        return [n for n, fc in self.fields.items() if fc.indexed]

    def with_discovered(self, schemas: list) -> "IndexConfig":
        """Extend a dynamic config with fields found in input schemas.

        New names are appended AFTER the declared fields in sorted order
        — field numbers are a pure function of (declared config, input
        schema union), deterministic at any parallelism."""
        import copy

        import pyarrow as pa

        new = copy.deepcopy(self)
        known = set(new.fields) | set(new.id_columns)
        if new.boost_column:
            known.add(new.boost_column)
        found: dict[str, Any] = {}
        for sch in schemas:
            for f in sch:
                if f.name not in known and f.name not in found:
                    found[f.name] = f.type
        base = self.default_field or FieldConfig()
        for name in sorted(found):
            t = found[name]
            is_texty = (
                pa.types.is_string(t)
                or pa.types.is_large_string(t)
                or (
                    (pa.types.is_list(t) or pa.types.is_large_list(t))
                    and pa.types.is_string(t.value_type)
                )
            )
            new.fields[name] = (
                copy.deepcopy(base)
                if is_texty
                else FieldConfig(
                    indexed=False, stored=True, positions=False,
                    norms=False,
                )
            )
        return new


def auto_salt_doc_range(num_docs: int) -> int:
    """Doc-band size sized from the corpus: ~32 bands (power of two,
    floor 2^11, cap 2^30) so partitioned serving always has real ranges
    to own (N actors each take ~32/N bands) while a term's read-time
    file fan-in (= num_docs / salt_doc_range range files) stays bounded
    — 2^30 at 10^12 docs ≈ 1k range files per term, matching the sizing
    note on :class:`IndexConfig`.  Deterministic function of the input
    row count; resolved before fingerprinting so retries/resumes agree."""
    import math

    if num_docs <= 0:
        return 1 << 11
    target = max(1, num_docs // 32)
    return 1 << min(30, max(11, math.ceil(math.log2(target))))


def auto_num_shards(num_docs: int) -> int:
    """Term-hash shard count sized from the corpus when the config
    leaves ``num_shards=None``: bounds the shard-FILE count (doc bands
    × shards) so a cold dictionary scan touches hundreds of files, not
    tens of thousands (~1ms fixed cost per file dominates wide
    expansions), while keeping hash spread for merge parallelism at
    scale.  ~1 shard per 500k docs, power of two, floor 16, cap 4096
    (10^12 docs with ~32 bands → ~128k files of ~50 MB).  Deterministic
    function of the input row count, resolved before fingerprinting."""
    import math

    if num_docs <= 0:
        return 16
    target = max(1, num_docs // 500_000)
    return 1 << min(12, max(4, math.ceil(math.log2(target))))


def auto_merge_buckets(num_docs: int) -> int:
    """Merge-task count sized from the corpus: ~10k docs (a few million
    postings at a few hundred tokens/doc) per task keeps every bucket's
    working set in worker heap and leaves enough tasks to balance
    stragglers.  Measured at 2M docs / 32 cpus: 32 buckets = 74s merge
    (heap-pressure cliff), 128 = 45s, 256 = 49s (BASELINE.md round 3)."""
    return max(32, min(num_docs // 10_000, 4096))


def analyzer_for(spec: str | Analyzer) -> Analyzer:
    if isinstance(spec, Analyzer):
        return spec
    from .analysis import (
        keyword_analyzer,
        letter_analyzer,
        whitespace_analyzer,
    )

    if spec == "standard":
        return standard_analyzer()
    if spec == "standard_nostop":
        return standard_analyzer(stop_words=None)
    if spec == "stem" or spec.startswith("stem:"):
        # "stem" = Snowball english (the reference default);
        # "stem:<algorithm>" selects the Snowball language, mirroring
        # StemFilter.new(ts, algorithm, charenc)
        # (c/src/analysis.c:1397-1470, ruby/ext/r_analysis.c) — the
        # spec string round-trips through the manifest unchanged
        from .analysis.stemmer_multi import snowball_stem

        alg = spec.partition(":")[2] or "english"
        snowball_stem(alg)  # validate loudly at config time
        a = standard_analyzer()
        a.stem = True if alg == "english" else alg
        return a
    if spec == "whitespace":
        return whitespace_analyzer()
    if spec == "whitespace_double":
        # the conformance corpus' token-doubling analyzer
        # (c/test/test_search.c:225-252): every lowercase-starting token is
        # emitted lowercase at pos_inc 0, then uppercased at pos_inc 1.
        from .analysis.analyzer import Analyzer as _A
        from .analysis.tokenizer import Token, WhitespaceTokenizer

        class _DoubleTok:
            _ws = WhitespaceTokenizer()

            def __call__(self, text):
                for tk in self._ws(text):
                    if tk.text[:1].islower():
                        yield Token(tk.text, tk.start, tk.end, 0)
                        yield Token(tk.text.upper(), tk.start, tk.end, 1)
                    else:
                        yield tk

        return _A(_DoubleTok(), lowercase=False, stop_words=None, hyphen=False)
    if spec == "legacy":
        from .analysis.legacy import legacy_standard_analyzer

        return legacy_standard_analyzer()
    if spec == "legacy_mb":
        from .analysis.legacy import legacy_standard_analyzer

        return legacy_standard_analyzer(mode="mb")
    if spec == "letter":
        return letter_analyzer()
    if spec == "alnum":
        from .analysis.analyzer import Analyzer as _A
        from .analysis.tokenizer import AlnumTokenizer

        return _A(AlnumTokenizer(), lowercase=True, stop_words=None,
                  hyphen=False)
    if spec == "keyword":
        return keyword_analyzer()
    raise ValueError(f"unknown analyzer spec: {spec!r}")


def source_code_config(num_shards: int | None = None) -> IndexConfig:
    """Config for the BASELINE.json corpus (repo,path,commit,lang,content).

    ``num_shards=None`` auto-fits from the corpus size inside
    build_index (:func:`auto_num_shards`); pass an explicit count to
    pin the physical layout."""
    return IndexConfig(
        fields={
            "content": FieldConfig(analyzer="standard", stored=False),
            "repo": FieldConfig(analyzer="keyword", positions=False),
            "path": FieldConfig(analyzer="keyword", positions=False),
            "lang": FieldConfig(analyzer="keyword", positions=False),
        },
        id_columns=("commit",),
        num_shards=num_shards,
    )
