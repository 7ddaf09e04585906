"""CLI: build / search / inspect an index.

    python -m ferret_ray build  <input.parquet...> <index_dir> \
        [--field content] [--analyzer standard] [--shards 64]
    python -m ferret_ray search <index_dir> "<FQL query>" \
        [--field content] [--k 10]
    python -m ferret_ray inspect <index_dir>
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

    args = ap.parse_args(argv)
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 log_to_driver=False)
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
            from .schema import analyzer_for
            from .search.fql import FQLParser
            from .search.reader import IndexReader
            from .search.searcher import Searcher

            reader = IndexReader(args.index_dir)
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
