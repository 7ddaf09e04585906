"""Index facade: the convenience API of the reference's Ruby `Index`
(ruby/lib/ferret/index.rb, c/src/ind.c) on top of the Ray pipeline.

Documents buffer in memory; the index (re)builds lazily through the real
build pipeline on first search after a modification — the facade is meant
for interactive / small-corpus use (tests, notebooks); large corpora use
``build_index`` directly.  Supports dynamic fields (added on first sight,
like frt_fis_get_or_add_field), upsert-by-key (ind.c:202-258), deletion,
FQL string queries, stored-doc access and highlighting.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

from .analysis import Analyzer
from .schema import FieldConfig, IndexConfig, analyzer_for
from .search.fql import FQLParser
from .search.query import Query


class Index:
    def __init__(
        self,
        path: str | None = None,
        default_field: str = "content",
        analyzer: str | Analyzer = "standard",
        key: str | None = None,
        num_shards: int = 2,
    ):
        self._dir = path or tempfile.mkdtemp(prefix="ferret_ray_index_")
        self._own_dir = path is None
        self.default_field = default_field
        self.analyzer_spec = analyzer
        self.key = key
        self.num_shards = num_shards
        self._docs: list[dict[str, Any]] = []
        self._dirty = True
        self._searcher = None
        self._generation = 0

    # ---- writing --------------------------------------------------------

    def add_document(self, doc: dict[str, Any] | str) -> "Index":
        if isinstance(doc, str):
            doc = {self.default_field: doc}
        doc = {k: "" if v is None else str(v) for k, v in doc.items()}
        if self.key is not None and self.key in doc:
            # upsert by key (ind.c:202-258): delete same-key docs first
            self._docs = [
                d for d in self._docs if d.get(self.key) != doc[self.key]
            ]
        self._docs.append(doc)
        self._dirty = True
        return self

    __lshift__ = add_document

    def delete(self, doc_or_key: int | str) -> "Index":
        """Delete by docid (int) or by key value (str, needs ``key``)."""
        if isinstance(doc_or_key, int):
            if 0 <= doc_or_key < len(self._docs):
                del self._docs[doc_or_key]
        elif self.key is not None:
            self._docs = [
                d for d in self._docs
                if d.get(self.key) != str(doc_or_key)
            ]
        self._dirty = True
        return self

    def size(self) -> int:
        return len(self._docs)

    # ---- building -------------------------------------------------------

    def _ensure_built(self):
        from .pipelines.build import build_index
        from .search.reader import IndexReader
        from .search.searcher import Searcher

        if not self._dirty and self._searcher is not None:
            return
        if not self._docs:
            self._searcher = None
            self._dirty = False
            return
        fields = sorted({k for d in self._docs for k in d})
        corpus = os.path.join(self._dir, f"corpus-{self._generation}.parquet")
        idx_dir = os.path.join(self._dir, f"gen-{self._generation}")
        self._generation += 1
        pq.write_table(
            pa.table(
                {f: [d.get(f, "") for d in self._docs] for f in fields}
            ),
            corpus,
        )
        cfg = IndexConfig(
            fields={
                f: FieldConfig(analyzer=self.analyzer_spec)
                for f in fields
            },
            num_shards=self.num_shards,
        )
        build_index(corpus, idx_dir, cfg)
        self._searcher = Searcher(IndexReader(idx_dir))
        self._fields = fields
        self._dirty = False
        # GC older generations (the reference's Deleter)
        for g in range(self._generation - 1):
            shutil.rmtree(os.path.join(self._dir, f"gen-{g}"),
                          ignore_errors=True)
            old = os.path.join(self._dir, f"corpus-{g}.parquet")
            if os.path.exists(old):
                os.unlink(old)

    @property
    def searcher(self):
        self._ensure_built()
        return self._searcher

    def parser(self) -> FQLParser:
        self._ensure_built()
        p = FQLParser(analyzer=analyzer_for(self.analyzer_spec))
        for f in getattr(self, "_fields", []):
            p.add_field(f, default=(f == self.default_field),
                        tokenized=True)
        return p

    # ---- reading --------------------------------------------------------

    def process_query(self, query: str | Query) -> Query | None:
        if isinstance(query, str):
            return self.parser().parse(query)
        return query

    def search(self, query: str | Query, **kw):
        from .search.searcher import TopDocs

        s = self.searcher
        if s is None:
            return TopDocs(0, [], 0.0)
        q = self.process_query(query)
        if q is None:
            return TopDocs(0, [], 0.0)
        return s.search(q, **kw)

    def search_each(self, query: str | Query, **kw):
        td = self.search(query, **kw)
        for hit in td.hits:
            yield hit.doc, hit.score

    def __getitem__(self, doc_id: int) -> dict[str, Any]:
        s = self.searcher
        if s is None:
            raise IndexError(doc_id)
        return s.reader.get_doc(doc_id)

    def explain(self, query: str | Query, doc: int):
        return self.searcher.explain(self.process_query(query), doc)

    def highlight(
        self,
        query: str | Query,
        doc: int,
        field: str | None = None,
        excerpt_length: int = 100,
        num_excerpts: int = 2,
        pre_tag: str = "<b>",
        post_tag: str = "</b>",
    ):
        from .search.highlight import highlight as _hl

        s = self.searcher
        q = self.process_query(query)
        if s is None or q is None:
            return None
        return _hl(
            s, q, doc, field or self.default_field,
            analyzer_for(self.analyzer_spec),
            excerpt_length=excerpt_length, num_excerpts=num_excerpts,
            pre_tag=pre_tag, post_tag=post_tag,
        )

    def close(self):
        if self._own_dir:
            shutil.rmtree(self._dir, ignore_errors=True)
        self._searcher = None
