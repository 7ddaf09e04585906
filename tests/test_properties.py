"""Hypothesis property tests for the vectorized-vs-scalar kernels and
parser contracts."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

# text with plenty of token-boundary structure: words, digits, unicode
# letters, punctuation, hyphens, apostrophes, whitespace runs
_texty = st.text(
    alphabet=st.characters(
        codec="utf-8",
        categories=(
            "Lu", "Ll", "Lo", "Nd", "Pd", "Po", "Zs", "Cc", "Sm",
        ),
    ),
    max_size=200,
)


@settings(max_examples=150, deadline=None)
@given(st.lists(_texty, max_size=8))
def test_batch_analyzer_equals_scalar_chain(texts):
    """batch_terms_positions == the sequential token_stream chain for
    arbitrary unicode input (terms AND positions)."""
    from ferret_ray.analysis import standard_analyzer

    a = standard_analyzer()
    tids, poss, lens, id2term = a.batch_terms_positions(texts, 10_000)
    terms = id2term.to_pylist()
    off = np.concatenate(([0], np.cumsum(lens)))
    for di, text in enumerate(texts):
        got = [
            (terms[tids[i]], int(poss[i]))
            for i in range(off[di], off[di + 1])
        ]
        exp = []
        pos = -1
        for tok in a.token_stream(text or ""):
            pos += tok.pos_inc
            exp.append((tok.text, pos))
        assert got == exp, (text, got, exp)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(_texty, min_size=1, max_size=5),
    st.integers(min_value=1, max_value=50),
    st.integers(min_value=1, max_value=50),
)
def test_chunk_reconstruction(texts, size, stride):
    """Chunks cover every codepoint: stride-prefixes of chunks 0..n-2
    plus the last chunk reassemble the doc exactly (when stride<=size);
    and chunk k always equals text[k*stride : k*stride+size]."""
    from ferret_ray.functions.chunk import chunk_text

    t = pa.table(
        {"doc_id": list(range(len(texts))), "text": texts}
    )
    out = chunk_text(t, size=size, stride=stride).to_pandas()
    for di, text in enumerate(texts):
        chunks = list(
            out[out.doc_id == di].sort_values("chunk_id").chunk
        )
        assert len(chunks) == (
            0 if not text else -(-len(text) // stride)
        )
        for k, c in enumerate(chunks):
            assert c == text[k * stride: k * stride + size]
        if chunks and stride <= size:
            rec = "".join(c[:stride] for c in chunks[:-1]) + chunks[-1]
            assert rec == text


def _balance(s: str):
    """(unescaped paren depth trace ok, unescaped quote parity) outside
    escapes — the qp_clean_str contract."""
    depth = 0
    quotes = 0
    esc = False
    in_q = False
    min_depth = 0
    for ch in s:
        if esc:
            esc = False
            continue
        if ch == "\\":
            esc = True
            continue
        if ch == '"':
            quotes += 1
            in_q = not in_q
            continue
        if in_q:
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            min_depth = min(min_depth, depth)
    return depth, min_depth, quotes % 2


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet='abc ()[]{}"\\<>|&:!+~^-=*?', max_size=60))
def test_clean_str_balances(raw):
    """After qp_clean_str: parens balanced (never negative depth),
    quotes even — the function's documented contract
    (q_parser.y:1208-1219).

    Reference quirk ported faithfully: the closing parens appended for
    unmatched '(' are written blindly after the last character
    (q_parser.y:1302-1304), so an input whose cleaned form ends with an
    unescaped backslash gets its first appended ')' escaped — e.g.
    '(\\\\' -> '(\\\\)'.  The balance contract holds for every input
    that does not end mid-escape."""
    from ferret_ray.search.fql import clean_str

    cleaned = clean_str(raw)
    trailing_esc = len(cleaned) - len(cleaned.rstrip("\\"))
    if trailing_esc % 2 == 1 or (
        ")" in cleaned and cleaned.split(")")[-2].endswith("\\")
        if cleaned.endswith(")") else False
    ):
        return  # ends mid-escape: the reference appends escaped closers
    def _ends_escaped(s: str) -> bool:
        # final char is a closer preceded by an odd backslash run —
        # i.e. the blindly-appended closer landed mid-escape
        if not s or s[-1] not in ')"':
            return False
        body = s[:-1]
        return (len(body) - len(body.rstrip("\\"))) % 2 == 1

    def _raw_backslash_escape_in_quotes(s: str) -> bool:
        # does the RAW input contain '\\' (an escaped backslash) inside
        # quotes?  That is the one collapse quirk below — any other
        # escaped quote in the OUTPUT must not bypass the assertion.
        in_q = False
        i = 0
        while i < len(s):
            ch = s[i]
            if ch == '"':
                in_q = not in_q
                i += 1
            elif ch == "\\" and i + 1 < len(s):
                if in_q and s[i + 1] == "\\":
                    return True
                i += 2
            else:
                i += 1
        return False

    depth, min_depth, quote_parity = _balance(cleaned)
    if depth != 0 or quote_parity != 0:
        # acceptable causes, both faithful reference quirks:
        # - an appended closer was escaped by a trailing backslash in
        #   the original (q_parser.y:1299-1304 appends closers blindly)
        # - a '\\' inside quotes collapses to one '\' (q_parser.y:1233-1239
        #   emits the escaped char bare when quote_open), which then
        #   escapes the very next '"' in the OUTPUT — e.g. '"\\\\":' ->
        #   '"\\":' — flipping quote parity as seen by a parser walk.
        #   qp_clean_str tracks quote state on the RAW input, so it never
        #   notices and appends no fix-up quote.  Gated on the RAW input
        #   actually containing the in-quote '\\' (ADVICE r4: any escaped
        #   quote in the output must not void the property).
        assert (
            _ends_escaped(cleaned)
            or "\\)" in cleaned
            or _raw_backslash_escape_in_quotes(raw)
        ), cleaned
        return
    assert min_depth >= 0


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet='abc ()[]{}"\\<>|&:!+~^-=*? \t', max_size=60))
def test_parser_never_raises_with_error_handling(raw):
    """handle_parse_errors=True must always return a Query or None,
    never raise (qp_parse contract: 'must either raise an error or
    return a query object' — with recovery on)."""
    from ferret_ray.analysis import letter_analyzer
    from ferret_ray.search.fql import FQLParser, to_s

    p = FQLParser(analyzer=letter_analyzer(lowercase=True))
    p.add_field("xx", default=True, tokenized=True)
    q = p.parse(raw)
    if q is not None:
        to_s(q, "xx")  # canonicalization must not raise either


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=200_000), max_size=400),
    st.booleans(),
)
def test_stable_argsort_ids_matches_numpy(ids, wide):
    """stable_argsort_ids (uint16 LSD radix) == np.argsort(stable) for
    any non-negative bounded ids, including >65535 keys and both input
    dtypes the invert path produces (int32 batch path, int64 fallback)."""
    from ferret_ray.stages.invert import stable_argsort_ids

    arr = np.asarray(ids, dtype=np.int64 if wide else np.int32)
    assert np.array_equal(
        stable_argsort_ids(arr), np.argsort(arr, kind="stable")
    )


def test_batch_vocab_ids_independent_of_worker_history():
    """Output term ids are first-appearance-in-batch order regardless of
    which batches the worker's persistent vocab table saw earlier —
    the property that makes shard bytes deterministic across runs."""
    from ferret_ray.analysis import standard_analyzer

    batch = ["gamma beta alpha", "beta delta"]
    fresh = standard_analyzer()
    t1 = fresh.batch_terms_positions(batch, 10_000)
    warmed = standard_analyzer()
    # warm the persistent table with a DIFFERENT batch first
    warmed.batch_terms_positions(
        ["zeta epsilon alpha", "delta omega"], 10_000
    )
    t2 = warmed.batch_terms_positions(batch, 10_000)
    assert np.array_equal(t1[0], t2[0])          # tids
    assert t1[3].to_pylist() == t2[3].to_pylist()  # term table order
