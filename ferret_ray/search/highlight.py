"""Highlighter: reference-exact excerpt selection + ellipsis layout.

A faithful re-implementation of ``searcher_highlight``
(c/src/search.c:838-965) and its helpers:

* match ranges from the query's MatchVector (searcher.get_match_vector,
  position-exact, golden-tested), compacted with
  ``matchv_compact_with_breaks`` (c/src/search.c:576-598) — overlapping
  ranges merge and accumulate score;
* token offsets per position recovered by re-analyzing the stored text
  (replacing the reference's TERM_VECTOR_WITH_POSITIONS_OFFSETS data —
  same (start, end) pairs for any deterministic analyzer chain);
* candidate excerpts per compacted match, scored by the matches they
  cover, selected through a faithful port of the reference's 1-indexed
  binary PriorityQueue (c/src/priorityqueue.c:60-100 — pq_up/pq_down
  traversal order decides score ties, so the heap is replicated exactly)
  with the covered-match score zeroing + lazy rescore loop
  (c/src/search.c:896-911);
* short-field whole-text highlighting (``highlight_field``,
  c/src/search.c:787-836), excerpt merging, greedy expansion
  (``excerpt_expand``, c/src/search.c:698-730) and the exact ellipsis
  rules of ``excerpt_get_str`` (c/src/search.c:732-786).

Goldens: c/test/test_highlighter.c:358-532 (tests/test_highlight_ref.py).
"""

from __future__ import annotations

from ..analysis import Analyzer


class _Heap:
    """frt PriorityQueue (1-indexed binary heap), exact traversal order."""

    def __init__(self, lt):
        self.heap: list = [None]
        self.lt = lt

    @property
    def size(self) -> int:
        return len(self.heap) - 1

    def push(self, node) -> None:
        heap = self.heap
        heap.append(node)
        i = self.size
        j = i >> 1
        while j > 0 and self.lt(node, heap[j]):
            heap[i] = heap[j]
            i = j
            j >>= 1
        heap[i] = node

    def top(self):
        return self.heap[1] if self.size else None

    def down(self) -> None:
        heap = self.heap
        size = self.size
        i, j, k = 1, 2, 3
        node = heap[i]
        if k <= size and self.lt(heap[k], heap[j]):
            j = k
        while j <= size and self.lt(heap[j], node):
            heap[i] = heap[j]
            i = j
            j = i << 1
            k = j + 1
            if k <= size and self.lt(heap[k], heap[j]):
                j = k
        heap[i] = node

    def pop(self):
        if not self.size:
            return None
        top = self.heap[1]
        last = self.heap.pop()
        if self.size:
            self.heap[1] = last
            self.down()
        return top


class _Excerpt:
    __slots__ = ("start", "end", "start_pos", "end_pos",
                 "start_offset", "end_offset", "score")

    def __init__(self, start: int, end: int, score: float):
        self.start = start
        self.end = end
        self.score = score
        self.start_pos = 0
        self.end_pos = 0
        self.start_offset = 0
        self.end_offset = 0


def _compact_with_breaks(matches: list[list]) -> list[list]:
    """matchv_compact_with_breaks (c/src/search.c:576-598): sort by
    (start asc, end desc), merge overlaps, accumulate scores."""
    if not matches:
        return matches
    matches.sort(key=lambda m: (m[0], -m[1]))
    left = 0
    for right in range(len(matches)):
        if matches[right][0] > matches[left][1]:
            left += 1
            matches[left] = matches[right]
        elif matches[right][1] > matches[left][1]:
            matches[left][1] = matches[right][1]
            matches[left][2] += matches[right][2]
        elif right > left:
            matches[left][2] += matches[right][2]
    return matches[: left + 1]


def _offsets_from_spans(spans: dict[int, tuple[int, int]]) -> list[tuple]:
    """Per-position (start, end) offsets table with skipped positions
    filled forward (excerpt_expand's fill, c/src/search.c:704-713)."""
    if not spans:
        return []
    n = max(spans) + 1
    out: list[tuple] = []
    prev = (0, 0)
    for i in range(n):
        prev = spans.get(i, prev)
        out.append(prev)
    return out


def _merge_span(spans: dict, p: int, start: int, end: int) -> None:
    if p in spans:
        s, e = spans[p]
        spans[p] = (min(s, start), max(e, end))
    else:
        spans[p] = (start, end)


def _offsets_by_position(
    searcher, doc: int, field: str, analyzer: Analyzer, text: str
) -> list[tuple]:
    """Offsets table from the STORED term vector when the field was
    indexed with one (the reference's TermVector path), else by
    re-analyzing the text (equivalent for deterministic analyzers)."""
    spans: dict[int, tuple[int, int]] = {}
    tv = None
    tv_fn = getattr(searcher.reader, "term_vector", None)
    if tv_fn is not None:
        try:
            tv = tv_fn(doc, field)
        except (KeyError, FileNotFoundError):
            tv = None
    if tv:
        for _term, pos, start, end in tv:
            _merge_span(spans, pos, start, end)
    else:
        pos = -1
        for tk in analyzer.token_stream(text):
            pos += tk.pos_inc
            _merge_span(spans, max(pos, 0), tk.start, tk.end)
    return _offsets_from_spans(spans)


def _excerpt_expand(e: _Excerpt, length: int, offsets: list[tuple]) -> None:
    """excerpt_expand (c/src/search.c:698-730)."""
    offset_cnt = len(offsets)
    did = True
    while did:
        did = False
        if e.start_pos > 0 and (
            e.end_offset - offsets[e.start_pos - 1][0]
        ) < length:
            e.start_pos -= 1
            e.start_offset = offsets[e.start_pos][0]
            did = True
        if e.end_pos < offset_cnt - 1 and (
            offsets[e.end_pos + 1][1] - e.start_offset
        ) < length:
            e.end_pos += 1
            e.end_offset = offsets[e.end_pos][1]
            did = True


def _excerpt_str(
    e: _Excerpt, matches: list[list], text: str,
    pre_tag: str, post_tag: str, ellipsis: str,
) -> str:
    """excerpt_get_str (c/src/search.c:732-786), exact ellipsis rules."""
    parts: list[str] = []
    last = e.start_offset
    if e.start_offset > 0:
        parts.append(ellipsis)
    for i in range(e.start, e.end + 1):
        mr = matches[i]
        parts.append(text[last: mr[3]])
        parts.append(pre_tag)
        parts.append(text[mr[3]: mr[4]])
        parts.append(post_tag)
        last = mr[4]
    end_offset = e.end_offset
    if (len(text) - end_offset) <= len(ellipsis):
        # no point using ellipsis if it takes up more space
        end_offset = len(text)
    parts.append(text[last: end_offset])
    if end_offset < len(text):
        parts.append(ellipsis)
    return "".join(parts)


def _highlight_whole_field(
    matches: list[list], text: str, pre_tag: str, post_tag: str
) -> str:
    """highlight_field (c/src/search.c:787-836): tag everything."""
    if not matches:
        return text
    parts: list[str] = []
    last = 0
    for mr in matches:
        parts.append(text[last: mr[3]])
        parts.append(pre_tag)
        parts.append(text[mr[3]: mr[4]])
        parts.append(post_tag)
        last = mr[4]
    parts.append(text[last:])
    return "".join(parts)


def highlight(
    searcher,
    query,
    doc: int,
    field: str,
    analyzer: Analyzer,
    excerpt_length: int = 100,
    num_excerpts: int = 2,
    pre_tag: str = "<b>",
    post_tag: str = "</b>",
    ellipsis: str = "...",
    text: str | None = None,
) -> list[str] | None:
    """searcher_highlight (c/src/search.c:838-965), reference-exact.

    Returns None when the field is missing/unanalyzable or when a long
    field has no matches (the reference returns NULL then).  ``text``
    overrides the stored field (for indexes built with stored=False)."""
    if text is None:
        stored = searcher.reader.get_doc(doc, columns=[field])
        text = stored.get(field)
    if text is None:
        return None
    offsets = _offsets_by_position(searcher, doc, field, analyzer, text)
    if not offsets:
        return None

    mv = searcher.get_match_vector(query, doc, field)
    # MatchRange rows: [start_pos, end_pos, score, start_off, end_off]
    matches = [[p0, p1, 1.0, 0, 0] for p0, p1 in mv]

    field_len = len(text)
    if field_len < excerpt_length * num_excerpts:
        matches = _compact_with_breaks(matches)
        for m in matches:
            m[3] = offsets[m[0]][0]
            m[4] = offsets[m[1]][1]
        return [_highlight_whole_field(matches, text, pre_tag, post_tag)]
    if not matches:
        return None

    matches = _compact_with_breaks(matches)
    for m in matches:
        m[3] = offsets[m[0]][0]
        m[4] = offsets[m[1]][1]

    # all candidate excerpts -> reference heap (score ties resolved by
    # identical heap traversal)
    pq = _Heap(lambda a, b: a.score > b.score)
    e_end = 0
    running = 0.0
    for e_start in range(len(matches)):
        start_offset = matches[e_start][3]
        if e_start > e_end:
            running = 0.0
            e_end = e_start
        while e_end < len(matches) and (
            matches[e_end][4] <= start_offset + excerpt_length
        ):
            running += matches[e_end][2]
            e_end += 1
        pq.push(_Excerpt(e_start, e_end - 1, running))
        running -= matches[e_start][2]

    picked: list[_Excerpt] = []
    for i in range(num_excerpts):
        if not pq.size:
            break
        e = pq.pop()
        picked.append(e)
        if i < num_excerpts - 1:
            for j in range(e.start, e.end + 1):
                matches[j][2] = 0.0
            prev = None
            while prev is not pq.top() and pq.size:
                prev = pq.top()
                prev.score = sum(
                    matches[j][2]
                    for j in range(prev.start, prev.end + 1)
                )
                pq.down()

    picked.sort(key=lambda e: e.start)
    for e in picked:
        e.start_pos = matches[e.start][0]
        e.end_pos = matches[e.end][1]
        e.start_offset = offsets[e.start_pos][0]
        e.end_offset = offsets[e.end_pos][1]

    if len(picked) < num_excerpts:
        # pad at the START; these grow into one long leading excerpt
        pad = [
            _Excerpt(0, -1, 0.0)
            for _ in range(num_excerpts - len(picked))
        ]
        picked = pad + picked

    out: list[str] = []
    i = 0
    while i < num_excerpts:
        ei = picked[i]
        merged = 1
        for j in range(i + 1, num_excerpts):
            ej = picked[j]
            if (ej.end_offset - ei.start_offset) < (
                (j - i + 1) * excerpt_length
            ):
                ei.end = ej.end
                ei.end_pos = ej.end_pos
                ei.end_offset = ej.end_offset
                merged = j - i + 1
        _excerpt_expand(ei, merged * excerpt_length, offsets)
        out.append(
            _excerpt_str(ei, matches, text, pre_tag, post_tag, ellipsis)
        )
        i += merged
    return out
