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
        id_field: str = "id",
        term_vectors: bool = False,
    ):
        self._dir = path or tempfile.mkdtemp(prefix="ferret_ray_index_")
        self._own_dir = path is None
        self.default_field = default_field
        self.analyzer_spec = analyzer
        self.key = key
        self.num_shards = num_shards
        self.id_field = id_field
        self.term_vectors = term_vectors
        self._docs: list[dict[str, Any]] = []
        self._dirty = True
        self._searcher = None
        self._generation = 0
        # docids tombstoned since the last build (cleared on rebuild, the
        # facade's stand-in for Ferret's merge purging the .del bitvector);
        # _built_ids maps current list position -> built docid (None for
        # docs added after the build) so positions stay resolvable after
        # physical list deletes
        self._deleted_since_build: set[int] = set()
        self._built_ids: list[int | None] = []

    # ---- writing --------------------------------------------------------

    def add_document(self, doc: dict[str, Any] | str) -> "Index":
        if isinstance(doc, str):
            doc = {self.default_field: doc}
        doc = {k: "" if v is None else str(v) for k, v in doc.items()}
        if self.key is not None and self.key in doc:
            # upsert by key (ind.c:202-258): delete same-key docs first
            for i in reversed(
                [i for i, d in enumerate(self._docs)
                 if d.get(self.key) == doc[self.key]]
            ):
                self._drop_pos(i)
        self._docs.append(doc)
        self._built_ids.append(None)
        self._dirty = True
        return self

    __lshift__ = add_document

    def delete(self, doc_or_key: int | str) -> "Index":
        """Delete by docid (int) or by key/id value (str)."""
        if isinstance(doc_or_key, int):
            if 0 <= doc_or_key < len(self._docs):
                self._drop_pos(doc_or_key)
        else:
            kf = self.key or self.id_field
            val = str(doc_or_key)
            for i in reversed(
                [i for i, d in enumerate(self._docs) if d.get(kf) == val]
            ):
                self._drop_pos(i)
        self._dirty = True
        return self

    def _drop_pos(self, pos: int) -> None:
        del self._docs[pos]
        if pos < len(self._built_ids):
            built = self._built_ids.pop(pos)
            if built is not None:
                self._deleted_since_build.add(built)
        self._dirty = True

    def query_delete(self, query: "str | Query") -> "Index":
        """Delete every document matching ``query``
        (ruby/lib/ferret/index.rb:540-550)."""
        docids = self.scan(query, limit=None)
        # physical list deletes: descending order keeps indices valid
        for d in sorted(docids, reverse=True):
            self.delete(int(d))
        return self

    def update(self, id_: int | str, new_doc: dict[str, Any] | str) -> "Index":
        """Replace the doc addressed by docid (int) or id-field term (str)
        (ruby/lib/ferret/index.rb:569-582)."""
        self.delete(id_)
        return self.add_document(new_doc)

    def batch_update(
        self, docs: "list[dict[str, Any]] | dict[int | str, dict[str, Any]]"
    ) -> "Index":
        """Array form: every doc must carry the id field (deletes the old
        doc with that id first).  Hash form: keys are docids (int) or
        id-field terms (str) (ruby/lib/ferret/index.rb:626-672)."""
        if isinstance(docs, dict):
            # int keys are docids: delete in descending order so earlier
            # deletions don't shift later targets
            for k in sorted(
                docs, key=lambda x: (isinstance(x, int), x), reverse=True
            ):
                self.delete(k)
            new_docs = list(docs.values())
        elif isinstance(docs, list):
            for d in docs:
                if self.id_field not in d:
                    raise ValueError(
                        f"all documents must have an {self.id_field} "
                        "field when doing a batch update"
                    )
                self.delete(str(d[self.id_field]))
            new_docs = docs
        else:
            raise TypeError(f"must pass dict or list, not {type(docs)}")
        for d in new_docs:
            self.add_document(d)
        return self

    def query_update(
        self, query: "str | Query", new_val: dict[str, Any] | str
    ) -> "Index":
        """Merge ``new_val`` into every doc matching ``query`` (string =
        replace the default field; ruby/lib/ferret/index.rb:674-696)."""
        docids = self.scan(query, limit=None)
        updated = []
        for d in sorted(docids, reverse=True):
            doc = dict(self._docs[d])
            if isinstance(new_val, dict):
                doc.update({k: str(v) for k, v in new_val.items()})
            else:
                doc[self.default_field] = str(new_val)
            self._drop_pos(d)
            updated.append(doc)
        self._dirty = True
        for doc in reversed(updated):  # preserve original relative order
            self.add_document(doc)
        return self

    def deleted(self, n: int) -> bool:
        """True if docid ``n`` (of the last built generation) was deleted
        since that build — cleared when the next rebuild purges it, the
        facade analogue of the merge dropping ``.del`` tombstones."""
        return n in self._deleted_since_build

    def has_deletions(self) -> bool:
        return bool(self._deleted_since_build)

    def size(self) -> int:
        return len(self._docs)

    def __len__(self) -> int:
        return len(self._docs)

    def each(self):
        """Yield (docid, stored document) for every live doc
        (ruby/lib/ferret/index.rb:489)."""
        for i, d in enumerate(self._docs):
            yield i, dict(d)

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
                f: FieldConfig(
                    analyzer=self.analyzer_spec,
                    term_vector=self.term_vectors,
                )
                for f in fields
            },
            num_shards=self.num_shards,
        )
        build_index(corpus, idx_dir, cfg)
        self._searcher = Searcher(IndexReader(idx_dir))
        self._fields = fields
        self._dirty = False
        self._built_ids = list(range(len(self._docs)))
        self._deleted_since_build.clear()
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

    def scan(
        self,
        query: str | Query,
        start_doc: int = 0,
        limit: int | None = 50,
    ) -> list[int]:
        """Unscored matching docids from ``start_doc``, first ``limit``
        found — the cheap paging path (ruby/lib/ferret/index.rb:430-437,
        isea_search_unscored).  ``limit=None`` = ``:all``."""
        s = self.searcher
        q = self.process_query(query)
        if s is None or q is None:
            return []
        return s.search_unscored(q, start_doc=start_doc, limit=limit)

    def doc(self, *args) -> dict[str, Any] | list[dict[str, Any]] | None:
        """Int → stored doc by docid; slice/range → list of docs; str →
        first doc whose id field has that term
        (ruby/lib/ferret/index.rb:451-469)."""
        arg = args[0] if len(args) == 1 else args
        if isinstance(arg, slice):
            return [self[i] for i in range(*arg.indices(self.size()))]
        if isinstance(arg, range):
            return [self[i] for i in arg]
        if isinstance(arg, str):
            from .search.query import TermQuery

            kf = self.key or self.id_field
            hits = self.scan(TermQuery(kf, arg), limit=1)
            return self[hits[0]] if hits else None
        if isinstance(arg, tuple):
            return [self[i] for i in arg]
        return self[int(arg)]

    def term_vector(self, doc_id: int, field: str | None = None):
        """Stored term vector for a doc/field (needs
        ``term_vectors=True``; ruby/lib/ferret/index.rb:471-487)."""
        s = self.searcher
        if s is None:
            return None
        return s.reader.term_vector(doc_id, field or self.default_field)

    def field_infos(self) -> dict[str, Any]:
        """Per-field index options of the built generation
        (ruby/lib/ferret/index.rb:842-849)."""
        s = self.searcher
        if s is None:
            return {}
        return s.reader.manifest["config"]["fields"]

    def flush(self) -> "Index":
        """Make pending modifications searchable now (the lazy rebuild
        normally runs on first search)."""
        self._ensure_built()
        return self

    optimize = flush  # one generation == fully optimized

    def persist(self, directory: str) -> "Index":
        """Move the index to ``directory`` and keep using it from there
        (ruby/lib/ferret/index.rb:792-806)."""
        os.makedirs(directory, exist_ok=True)
        old_dir, was_own = self._dir, self._own_dir
        self._dir, self._own_dir = directory, False
        self._generation = 0
        self._dirty = True
        self._ensure_built()
        if was_own:
            shutil.rmtree(old_dir, ignore_errors=True)
        return self

    def __getitem__(self, doc_id: int | str) -> dict[str, Any]:
        if isinstance(doc_id, (str, slice, range)):
            return self.doc(doc_id)
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
