"""CLI: build / search / inspect / browse an index.

    python -m ferret_ray build  <input.parquet...> <index_dir> \
        [--field content] [--analyzer standard] [--shards 64]
    python -m ferret_ray search <index_dir> "<FQL query>" \
        [--field content] [--k 10]
    python -m ferret_ray inspect <index_dir>
    python -m ferret_ray terms   <index_dir> [--field f] [--prefix p] \
        [--limit 20]          # term browser (df-ranked or prefix scan)
    python -m ferret_ray doc     <index_dir> <doc_id>   # stored fields
    python -m ferret_ray serve   <index_dir> [--port 8765]  # web UI

``terms``/``doc`` are the CLI equivalents of the reference's
ferret-browser views (ruby/lib/ferret/browser.rb: term list + document
view); ``serve`` is the web UI itself (ferret_ray/browser.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="ferret_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("inputs", nargs="+")
    b.add_argument("index_dir")
    b.add_argument("--field", default="content")
    b.add_argument("--analyzer", default="standard")
    b.add_argument("--shards", type=int, default=64)

    s = sub.add_parser("search")
    s.add_argument("index_dir")
    s.add_argument("query")
    s.add_argument("--field", default="content")
    s.add_argument("--k", type=int, default=10)

    i = sub.add_parser("inspect")
    i.add_argument("index_dir")

    tm = sub.add_parser("terms")
    tm.add_argument("index_dir")
    tm.add_argument("--field", default=None)
    tm.add_argument("--prefix", default="")
    tm.add_argument("--limit", type=int, default=20)

    dc = sub.add_parser("doc")
    dc.add_argument("index_dir")
    dc.add_argument("doc_id", type=int)

    sv = sub.add_parser("serve")  # ferret-browser web UI
    sv.add_argument("index_dir")
    sv.add_argument("--port", type=int, default=8765)
    sv.add_argument("--field", default=None)

    # LSM lifecycle (IncrementalIndex root)
    for name in ("append", "upsert"):
        lc = sub.add_parser(name)
        lc.add_argument("inputs", nargs="+")
        lc.add_argument("root")
        lc.add_argument("--field", default="content")
        lc.add_argument("--analyzer", default="standard")
        lc.add_argument("--shards", type=int, default=64)
        lc.add_argument("--merge-factor", type=int, default=10)
        lc.add_argument("--defer-gc", action="store_true")
        lc.add_argument("--key", required=(name == "upsert"),
                        default=None,
                        help="keyword key field (declare on append so "
                             "later upserts can tombstone)")
    for name in ("optimize", "expunge", "gc"):
        lc = sub.add_parser(name)
        lc.add_argument("root")
        lc.add_argument("--field", default="content")
        lc.add_argument("--analyzer", default="standard")
        lc.add_argument("--shards", type=int, default=64)
        lc.add_argument("--merge-factor", type=int, default=10)

    args = ap.parse_args(argv)
    import ray

    if not ray.is_initialized():
        # no explicit address: honors RAY_ADDRESS, so the same CLI works
        # as a `ray job submit` entrypoint on a cluster and standalone
        # locally (RAY_ADDRESS=local is preset in the sandbox)
        ray.init(include_dashboard=False, log_to_driver=False)
    try:
        if args.cmd == "build":
            from .pipelines.build import build_index
            from .schema import FieldConfig, IndexConfig

            cfg = IndexConfig(
                fields={args.field: FieldConfig(analyzer=args.analyzer)},
                num_shards=args.shards,
            )
            m = build_index(args.inputs, args.index_dir, cfg)
            print(json.dumps(
                {"num_docs": m["num_docs"], "metrics": m["metrics"]},
                indent=2, default=str,
            ))
        elif args.cmd == "search":
            from .pipelines.search_pipeline import open_reader
            from .schema import analyzer_for
            from .search.fql import FQLParser
            from .search.searcher import Searcher

            reader = open_reader(args.index_dir)
            searcher = Searcher(reader)
            p = FQLParser(
                analyzer=analyzer_for(
                    reader.manifest["config"]["fields"]
                    .get(args.field, {}).get("analyzer", "standard")
                )
            )
            for f in reader.field_names:
                if reader.is_indexed(f):
                    p.add_field(f, default=(f == args.field))
            q = p.parse(args.query)
            td = searcher.search(q, 0, args.k)
            print(json.dumps(
                {
                    "total_hits": td.total_hits,
                    "hits": [
                        {"doc": h.doc, "score": round(h.score, 6)}
                        for h in td.hits
                    ],
                }, indent=2,
            ))
        elif args.cmd == "terms":
            from .browser import top_terms
            from .pipelines.search_pipeline import open_reader

            reader = open_reader(args.index_dir)
            fields = (
                [args.field] if args.field
                else [f for f in reader.field_names
                      if reader.is_indexed(f)]
            )
            out = {
                f: top_terms(reader, f, args.prefix, args.limit)
                for f in fields
            }
            print(json.dumps(out, indent=2))
        elif args.cmd == "serve":
            from .browser import serve

            serve(args.index_dir, args.port, args.field)
        elif args.cmd in ("append", "upsert", "optimize", "expunge",
                          "gc"):
            from .pipelines.lifecycle import IncrementalIndex
            from .schema import FieldConfig, IndexConfig

            cfg = IndexConfig(
                fields={args.field: FieldConfig(analyzer=args.analyzer)},
                num_shards=args.shards,
            )
            if getattr(args, "key", None):
                cfg.fields[args.key] = FieldConfig(
                    analyzer="keyword", positions=False
                )
            inc = IncrementalIndex(
                args.root, cfg, merge_factor=args.merge_factor,
                defer_gc=getattr(args, "defer_gc", False),
            )
            if args.cmd == "append":
                inc.append(args.inputs)
            elif args.cmd == "upsert":
                inc.upsert(args.inputs, args.key)
            elif args.cmd == "optimize":
                inc.optimize()
            elif args.cmd == "expunge":
                inc.expunge_deletes()
            else:
                removed = inc.gc()
                print(json.dumps({"removed": removed}))
            if args.cmd != "gc":
                print(json.dumps(
                    {"deltas": len(inc.delta_dirs),
                     "num_docs": inc.num_docs()},
                ))
        elif args.cmd == "doc":
            from .pipelines.search_pipeline import open_reader

            reader = open_reader(args.index_dir)
            doc = reader.get_doc(args.doc_id)
            print(json.dumps(
                {k: (v if not isinstance(v, bytes) else f"<{len(v)}B>")
                 for k, v in doc.items()},
                indent=2, default=str,
            ))
        else:
            from .state.manifest import read_manifest

            m = read_manifest(args.index_dir)
            print(json.dumps(
                {k: m[k] for k in
                 ("num_docs", "num_fragments", "field_names", "metrics")},
                indent=2, default=str,
            ))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main(sys.argv[1:])
