"""ferret-browser equivalent: a small stdlib web UI over an index.

The reference ships a WEBrick-based browser (ruby/bin/ferret-browser,
ruby/lib/ferret/browser.rb) with three views — index home, term list
per field, and a document viewer.  This is the same surface over the
Ray-side index: pure ``http.server`` (no extra dependencies, binds
localhost), HTML by default, ``?fmt=json`` for machine access.

Routes:
  GET /                       index overview (docs, fields, shards)
  GET /terms?field=f&prefix=p&limit=n    df-ranked term browser
  GET /doc?id=N               stored fields of one document
  GET /search?q=FQL&field=f&k=10         FQL search with scores

Reads go through :class:`IndexReader`'s lazy shard machinery (dictionary
columns + row-group blob fetches), so browsing a 100-TB index fetches
only the slices it renders.
"""

from __future__ import annotations

import html
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np


def top_terms(
    reader, field: str, prefix: str = "", limit: int = 20
) -> list[dict]:
    """df-ranked terms of one field (df aggregated across salt ranges),
    optionally restricted to a prefix — the browser's term-list query,
    also used by the ``terms`` CLI command."""
    agg: dict[str, int] = {}
    # MultiReader (LSM root): aggregate across sub-readers, resolving
    # the field number per delta (numbers may differ across schemas)
    for sub in getattr(reader, "readers", [reader]):
        if field not in sub.field_names:
            continue
        fn = sub.field_num(field)
        hi = prefix + "\U0010FFFF" if prefix else ""
        for ss in sub._shard_salts:
            sh = sub._shard_for(ss)
            if prefix:
                a = sh.term_bisect(fn, prefix)
                b = sh.term_bisect(fn, hi)
            else:
                a, b = sh.field_bounds(fn)
            terms = sh.terms_slice(a, b)
            dfs = sh.df_slice(a, b)
            for t, d in zip(terms, dfs):
                if t.startswith(prefix):
                    agg[t] = agg.get(t, 0) + int(d)
    top = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))[:limit]
    return [{"term": t, "df": d} for t, d in top]


class _App:
    """Request-independent state: one reader/searcher per server."""

    def __init__(self, index_dir: str, default_field: str | None = None):
        from .pipelines.search_pipeline import open_reader
        from .search.searcher import Searcher

        self.index_dir = index_dir
        self.reader = open_reader(index_dir)
        self.searcher = Searcher(self.reader)
        indexed = [
            f for f in self.reader.field_names if self.reader.is_indexed(f)
        ]
        self.default_field = default_field or (
            indexed[0] if indexed else ""
        )
        self._parsers: dict[str, object] = {}
        self._lock = threading.Lock()

    def parser(self, field: str):
        from .schema import analyzer_for
        from .search.fql import FQLParser

        with self._lock:
            p = self._parsers.get(field)
            if p is None:
                cfg = self.reader.manifest["config"]["fields"]
                p = FQLParser(
                    analyzer=analyzer_for(
                        cfg.get(field, {}).get("analyzer", "standard")
                    )
                )
                for f in self.reader.field_names:
                    if self.reader.is_indexed(f):
                        p.add_field(f, default=(f == field))
                self._parsers[field] = p
            return p

    # ---- views (dicts; the handler renders HTML or JSON) ---------------

    def home(self) -> dict:
        m = self.reader.manifest
        return {
            "index_dir": self.index_dir,
            "num_docs": m["num_docs"],
            "fields": [
                {
                    "name": f,
                    "indexed": self.reader.is_indexed(f),
                    "analyzer": m["config"]["fields"]
                    .get(f, {}).get("analyzer", ""),
                }
                for f in self.reader.field_names
            ],
            "num_shards": len(self.reader._shard_salts),
        }

    def terms(self, field: str, prefix: str, limit: int) -> dict:
        return {
            "field": field,
            "prefix": prefix,
            "terms": top_terms(self.reader, field, prefix, limit),
        }

    def doc(self, doc_id: int) -> dict:
        d = self.reader.get_doc(doc_id)
        return {
            "doc_id": doc_id,
            "fields": {
                k: (v if not isinstance(v, bytes) else f"<{len(v)}B>")
                for k, v in d.items()
            },
        }

    def search(self, q: str, field: str, k: int) -> dict:
        query = self.parser(field).parse(q)
        td = self.searcher.search(query, 0, k)
        return {
            "query": q,
            "total_hits": td.total_hits,
            "hits": [
                {"doc": h.doc, "score": round(float(h.score), 6)}
                for h in td.hits
            ],
        }


_STYLE = (
    "<style>body{font-family:monospace;margin:2em}"
    "table{border-collapse:collapse}td,th{border:1px solid #999;"
    "padding:2px 8px;text-align:left}</style>"
)


def _table(rows: list[dict]) -> str:
    if not rows:
        return "<p>(empty)</p>"
    cols = list(rows[0])
    out = ["<table><tr>"]
    out += [f"<th>{html.escape(str(c))}</th>" for c in cols]
    out.append("</tr>")
    for r in rows:
        out.append("<tr>")
        out += [f"<td>{html.escape(str(r[c]))}</td>" for c in cols]
        out.append("</tr>")
    out.append("</table>")
    return "".join(out)


def _render(path: str, data: dict) -> str:
    body = [f"<html><head>{_STYLE}<title>ferret_ray</title></head><body>"]
    body.append(
        '<p><a href="/">index</a> | <a href="/terms">terms</a></p>'
    )
    if path == "/":
        body.append(f"<h1>{html.escape(data['index_dir'])}</h1>")
        body.append(
            f"<p>{data['num_docs']} docs, {data['num_shards']} shards</p>"
        )
        body.append(_table(data["fields"]))
    elif path == "/terms":
        body.append(
            f"<h1>terms: {html.escape(data['field'])} "
            f"prefix={html.escape(data['prefix'])}</h1>"
        )
        body.append(_table(data["terms"]))
    elif path == "/doc":
        body.append(f"<h1>doc {data['doc_id']}</h1>")
        body.append(
            _table(
                [
                    {"field": k, "value": v}
                    for k, v in data["fields"].items()
                ]
            )
        )
    elif path == "/search":
        body.append(
            f"<h1>{data['total_hits']} hits: "
            f"{html.escape(data['query'])}</h1>"
        )
        body.append(
            _table(
                [
                    {
                        "doc": f'<a href="/doc?id={h["doc"]}">'
                               f'{h["doc"]}</a>',
                        "score": h["score"],
                    }
                    for h in data["hits"]
                ]
            ).replace("&lt;a href=", "<a href=").replace(
                "&quot;&gt;", '">'
            ).replace("&lt;/a&gt;", "</a>")
        )
    body.append("</body></html>")
    return "".join(body)


class _Handler(BaseHTTPRequestHandler):
    app: _App  # set by make_server

    def log_message(self, *args):  # quiet by default
        pass

    def do_GET(self):
        u = urlparse(self.path)
        qs = {k: v[0] for k, v in parse_qs(u.query).items()}
        try:
            if u.path == "/":
                data = self.app.home()
            elif u.path == "/terms":
                data = self.app.terms(
                    qs.get("field", self.app.default_field),
                    qs.get("prefix", ""),
                    int(qs.get("limit", "20")),
                )
            elif u.path == "/doc":
                data = self.app.doc(int(qs["id"]))
            elif u.path == "/search":
                data = self.app.search(
                    qs["q"],
                    qs.get("field", self.app.default_field),
                    int(qs.get("k", "10")),
                )
            else:
                self.send_error(404)
                return
        except KeyError as e:
            self.send_error(400, f"missing parameter: {e}")
            return
        except Exception as e:  # surface index errors as 500s
            self.send_error(500, str(e))
            return
        if qs.get("fmt") == "json":
            payload = json.dumps(data, default=str).encode()
            ctype = "application/json"
        else:
            payload = _render(u.path, data).encode()
            ctype = "text/html; charset=utf-8"
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


def make_server(
    index_dir: str, port: int = 0, default_field: str | None = None
) -> ThreadingHTTPServer:
    """Bind a browser server on localhost:``port`` (0 = ephemeral).
    Caller owns serve_forever/shutdown."""
    app = _App(index_dir, default_field)
    handler = type("BoundHandler", (_Handler,), {"app": app})
    return ThreadingHTTPServer(("127.0.0.1", port), handler)


def serve(index_dir: str, port: int = 8765, default_field=None) -> None:
    srv = make_server(index_dir, port, default_field)
    print(f"ferret_ray browser on http://127.0.0.1:{srv.server_port}/")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()
