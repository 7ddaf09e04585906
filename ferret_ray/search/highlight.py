"""Highlighter: excerpts with match tags (c/src/search.c:510-965).

The reference drives highlighting off stored term vectors; we re-analyze
the stored field text at highlight time (the analyzer chain is cheap for
one document) to recover token offsets, intersect them with the query's
match vector (searcher.get_match_vector — position-exact, golden-tested),
and pick excerpt windows that cover the most matches.
"""

from __future__ import annotations

from ..analysis import Analyzer


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
    """Best excerpts of (doc, field) with query matches tagged; None when
    the field is missing or the query cannot match it.  ``text`` overrides
    the stored field (for indexes built with stored=False)."""
    if text is None:
        stored = searcher.reader.get_doc(doc)
        text = stored.get(field)
    if text is None:
        return None
    mv = searcher.get_match_vector(query, doc, field)

    # token offsets by position (re-analysis replaces term vectors)
    pos = -1
    pos_spans: dict[int, tuple[int, int]] = {}
    for tk in analyzer.token_stream(text):
        pos += tk.pos_inc
        p = max(pos, 0)
        if p not in pos_spans:
            pos_spans[p] = (tk.start, tk.end)
        else:
            s, e = pos_spans[p]
            pos_spans[p] = (min(s, tk.start), max(e, tk.end))

    # match char ranges
    ranges: list[tuple[int, int]] = []
    for p0, p1 in mv:
        if p0 in pos_spans and p1 in pos_spans:
            ranges.append((pos_spans[p0][0], pos_spans[p1][1]))
    ranges.sort()

    if not ranges:
        # no matches: leading excerpt only
        if len(text) <= excerpt_length:
            return [text]
        cut = text.rfind(" ", 0, excerpt_length)
        cut = cut if cut > 0 else excerpt_length
        return [text[:cut] + ellipsis]

    # greedy excerpt windows around matches
    windows: list[tuple[int, int, list[tuple[int, int]]]] = []
    for r in ranges:
        placed = False
        for i, (ws, we, rs) in enumerate(windows):
            if r[1] <= ws + excerpt_length:
                windows[i] = (ws, max(we, r[1]), rs + [r])
                placed = True
                break
        if not placed and len(windows) < num_excerpts:
            ws = max(0, r[0] - excerpt_length // 4)
            windows.append((ws, r[1], [r]))
    out = []
    for ws, we, rs in windows[:num_excerpts]:
        we = min(len(text), max(we, ws + excerpt_length))
        # snap to whitespace
        if ws > 0:
            nxt = text.find(" ", ws)
            if 0 <= nxt < rs[0][0]:
                ws = nxt + 1
        if we < len(text):
            prev = text.rfind(" ", rs[-1][1], we)
            if prev > 0:
                we = prev
        chunk = []
        last = ws
        for a, b in rs:
            chunk.append(text[last:a])
            chunk.append(pre_tag + text[a:b] + post_tag)
            last = b
        chunk.append(text[last:we])
        s = "".join(chunk)
        if ws > 0:
            s = ellipsis + s
        if we < len(text):
            s = s + ellipsis
        out.append(s)
    return out
