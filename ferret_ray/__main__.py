"""CLI: build / search / inspect / browse an index.

    python -m ferret_ray build  <input.parquet...> <index_dir> \
        [--field content] [--analyzer standard] [--shards 64]
    python -m ferret_ray search <index_dir> "<FQL query>" \
        [--field content] [--k 10]
    python -m ferret_ray inspect <index_dir>
    python -m ferret_ray terms   <index_dir> [--field f] [--prefix p] \
        [--limit 20]          # term browser (df-ranked or prefix scan)
    python -m ferret_ray doc     <index_dir> <doc_id>   # stored fields

``terms``/``doc`` are the CLI equivalents of the reference's
ferret-browser views (ruby/lib/ferret/browser.rb: term list + document
view) — same data, no web server.
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
        elif args.cmd == "terms":
            from .search.reader import IndexReader

            reader = IndexReader(args.index_dir)
            fields = (
                [args.field] if args.field
                else [f for f in reader.field_names
                      if reader.is_indexed(f)]
            )
            out = {}
            for f in fields:
                fn = reader.field_num(f)
                rows = []
                for ss in reader._shard_salts:
                    sh = reader._shard_for(ss)
                    import numpy as _np

                    a = int(_np.searchsorted(sh.fields, fn, "left"))
                    b = int(_np.searchsorted(sh.fields, fn, "right"))
                    terms = sh.terms_slice(a, b)
                    dfs = sh.df[a:b]
                    for t, d in zip(terms, dfs):
                        if t.startswith(args.prefix):
                            rows.append((t, int(d)))
                # aggregate df across salt ranges, rank by df desc
                agg: dict[str, int] = {}
                for t, d in rows:
                    agg[t] = agg.get(t, 0) + d
                top = sorted(
                    agg.items(), key=lambda kv: (-kv[1], kv[0])
                )[: args.limit]
                out[f] = [{"term": t, "df": d} for t, d in top]
            print(json.dumps(out, indent=2))
        elif args.cmd == "doc":
            from .search.reader import IndexReader

            reader = IndexReader(args.index_dir)
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
