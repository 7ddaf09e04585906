"""Similarities: Ferret-default (Lucene-classic TF-IDF) and BM25.

The default similarity replicates c/src/similarity.c:61-105 with the same
float32 rounding discipline as the C code (each function computes in double
then truncates to float on return; the idf division is done in float32
first, matching ``(float)num_docs / (float)(doc_freq+1)``):

    tf(freq)        = sqrt(freq)
    idf(df, N)      = log(N/(df+1)) + 1
    length_norm(n)  = 1/sqrt(n)
    query_norm(s)   = 1/sqrt(s)
    sloppy_freq(d)  = 1/(d+1)
    coord(o, m)     = o/m

BM25 is the scale-path alternative (the reference makes similarity a vtable,
c/include/similarity.h:49-67; we do the same).  Conformance tests pin the
default similarity; BM25 drives the throughput/latency benchmark narrative.
"""

from __future__ import annotations

import math

import numpy as np

F32 = np.float32


def tf(freq: float) -> np.float32:
    return F32(math.sqrt(freq))  # math.sqrt is double, matching the C


def tf_array(freqs: np.ndarray) -> np.ndarray:
    # C computes (float)sqrt((double)freq) — double sqrt, float32 result
    return np.sqrt(freqs.astype(np.float64)).astype(np.float32)


def idf(doc_freq: int, num_docs: int) -> np.float32:
    # (float)(log((float)num_docs/(float)(doc_freq+1)) + 1.0)
    ratio = F32(num_docs) / F32(doc_freq + 1)
    if ratio <= 0.0:
        # empty index (num_docs == 0): C's log(0) silently yields -inf;
        # there are no docs to score, so any finite weight is unused
        return F32(0.0)
    return F32(math.log(float(ratio)) + 1.0)


def length_norm(num_terms: int) -> np.float32:
    return F32(1.0 / math.sqrt(num_terms)) if num_terms > 0 else F32(0.0)


def query_norm(sum_of_squared_weights: float) -> np.float32:
    if sum_of_squared_weights <= 0.0:
        return F32(1.0)
    return F32(1.0 / math.sqrt(float(sum_of_squared_weights)))


def sloppy_freq(distance: int) -> np.float32:
    return F32(1.0 / (distance + 1))


def coord(overlap: int, max_overlap: int) -> np.float32:
    return F32(overlap / max_overlap) if max_overlap else F32(0.0)


class DefaultSimilarity:
    """Ferret's practical scoring function, float32-exact."""

    name = "default"

    tf = staticmethod(tf)
    tf_array = staticmethod(tf_array)
    idf = staticmethod(idf)
    length_norm = staticmethod(length_norm)
    query_norm = staticmethod(query_norm)
    sloppy_freq = staticmethod(sloppy_freq)
    coord = staticmethod(coord)


class BM25Similarity:
    """BM25 (k1/b) for the throughput path; plugs into the same scorer.

    score(t, d) = idf_bm25 * tf*(k1+1) / (tf + k1*(1-b + b*dl/avgdl))
    idf_bm25    = ln(1 + (N - df + 0.5)/(df + 0.5))
    """

    name = "bm25"

    def __init__(self, k1: float = 1.2, b: float = 0.75) -> None:
        self.k1 = k1
        self.b = b

    def idf(self, doc_freq: int, num_docs: int) -> np.float32:
        return F32(
            math.log(1.0 + (num_docs - doc_freq + 0.5) / (doc_freq + 0.5))
        )

    def doc_term_scores(
        self,
        freqs: np.ndarray,
        doc_lens: np.ndarray,
        avgdl: float,
        idf_val: float,
    ) -> np.ndarray:
        f = freqs.astype(np.float32)
        denom = f + self.k1 * (1.0 - self.b + self.b * doc_lens / avgdl)
        return (idf_val * f * (self.k1 + 1.0) / denom).astype(np.float32)
