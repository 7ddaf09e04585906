"""ferret_ray — a Ray-Data-native full-text inverted-index build + query engine.

A from-scratch re-creation of the capabilities of dbalmain/ferret (a C
full-text IR library in the Lucene lineage), re-expressed Ray-Data-first:

- ``ferret_ray.analysis``  — StandardAnalyzer-equivalent tokenizer chain
  (semantics of /root/reference/c/src/scanner.in + analysis.c, re-implemented
  as compiled-regex longest-match scanning; NOT a port).
- ``ferret_ray.codec``     — VInt / postings / float8-norm codecs
  (byte-compatible with c/src/store.c:545-560 and c/src/helper.c:28-63).
- ``ferret_ray.pipelines`` — the index build: read_parquet -> map_batches
  (tokenize+invert) -> salted term-hash groupby -> shard writer, with
  per-partition checkpoints and an atomic manifest.
- ``ferret_ray.search``    — query AST, Ferret-default TF-IDF similarity in
  float32 (c/src/similarity.c:61-105) plus BM25, vectorized scorers, FQL
  query parser, and a Ray actor-pool batch searcher.
- ``ferret_ray.functions`` — large-scale training-data ops: dedup (exact,
  minhash-LSH, simhash), ANN search over embeddings, language id / quality
  scoring / token stats.
"""

__version__ = "0.1.0"
