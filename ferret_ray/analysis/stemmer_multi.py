"""Multi-language Snowball stemmers (StemFilter algorithm parameter).

The reference's StemFilter takes a Snowball algorithm name + charenc
(sb_stemmer_new, c/src/analysis.c:1397-1470; Ruby surface
StemFilter.new(ts, algorithm, encoding), ruby/ext/r_analysis.c) and
supports every libstemmer language.  This module implements the
non-English algorithms we ship as pure-Python ports of the PUBLIC
Snowball algorithm definitions (snowballstem.org), validated byte-exact
against the reference's own compiled libstemmer on curated + fuzzed
golden word lists (tests/goldens_stems_*.tsv).

English ("english", the default) lives in stemmer.py (Porter2).
"""

from __future__ import annotations

# --------------------------------------------------------------------------
# German (Snowball german)
# --------------------------------------------------------------------------

_DE_VOWELS = set("aeiouyäöü")
_DE_S_END = set("bdfghklmnrt")
_DE_ST_END = set("bdfghklmnt")


def _de_preprocess(w: str) -> str:
    w = w.replace("ß", "ss")
    # u/y between vowels are consonants: mark uppercase
    out = list(w)
    for i in range(1, len(w) - 1):
        if w[i] in "uy" and w[i - 1] in _DE_VOWELS and \
                w[i + 1] in _DE_VOWELS:
            out[i] = w[i].upper()
    return "".join(out)


def _regions(w: str, vowels: set) -> tuple[int, int]:
    """Standard R1/R2: after the first non-vowel following a vowel."""
    n = len(w)
    r1 = n
    for i in range(1, n):
        if w[i] not in vowels and w[i - 1] in vowels:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if w[i] not in vowels and w[i - 1] in vowels:
            r2 = i + 1
            break
    return r1, r2


def german_stem(word: str) -> str:
    w = _de_preprocess(word)
    r1, r2 = _regions(w, _DE_VOWELS)
    # German adjustment: the region before R1 holds >= 3 letters
    if r1 < 3:
        r1 = 3

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # step 1: longest of (a) em ern er (b) e en es (c) s
    for suf in ("ern", "em", "er"):
        if w.endswith(suf):
            if in_r1(len(w) - len(suf)):
                w = w[: -len(suf)]
            break
    else:
        # (this libstemmer snapshot predates the later "niss -> nis"
        # refinement, so group (b) is a plain delete)
        for suf in ("en", "es", "e"):
            if w.endswith(suf):
                if in_r1(len(w) - len(suf)):
                    w = w[: -len(suf)]
                break
        else:
            if w.endswith("s") and in_r1(len(w) - 1) and \
                    len(w) >= 2 and w[-2] in _DE_S_END:
                w = w[:-1]

    # step 2: longest of (a) en er est (b) st
    for suf in ("est", "en", "er"):
        if w.endswith(suf):
            if in_r1(len(w) - len(suf)):
                w = w[: -len(suf)]
            break
    else:
        if w.endswith("st") and in_r1(len(w) - 2) and \
                len(w) >= 6 and w[-3] in _DE_ST_END:
            w = w[:-2]

    # step 3: d-suffixes
    for suf in ("end", "ung"):
        if w.endswith(suf):
            if in_r2(len(w) - len(suf)):
                w = w[: -len(suf)]
                if w.endswith("ig") and in_r2(len(w) - 2) and \
                        (len(w) < 3 or w[-3] != "e"):
                    w = w[:-2]
            break
    else:
        for suf in ("isch", "ik", "ig"):
            if w.endswith(suf):
                if in_r2(len(w) - len(suf)) and \
                        (len(w) < len(suf) + 1 or
                         w[-len(suf) - 1] != "e"):
                    w = w[: -len(suf)]
                break
        else:
            for suf in ("lich", "heit"):
                if w.endswith(suf):
                    if in_r2(len(w) - len(suf)):
                        w = w[: -len(suf)]
                        for pre in ("er", "en"):
                            if w.endswith(pre) and \
                                    in_r1(len(w) - 2):
                                w = w[:-2]
                                break
                    break
            else:
                if w.endswith("keit"):
                    if in_r2(len(w) - 4):
                        w = w[:-4]
                        for pre in ("lich", "ig"):
                            if w.endswith(pre) and \
                                    in_r2(len(w) - len(pre)):
                                w = w[: -len(pre)]
                                break

    # postprocess: unmark U/Y, strip umlauts
    return (
        w.replace("U", "u").replace("Y", "y")
        .replace("ä", "a").replace("ö", "o").replace("ü", "u")
    )


# --------------------------------------------------------------------------
# Russian (Snowball russian)
# --------------------------------------------------------------------------

_RU_VOWELS = set("аеиоуыэюя")

_RU_PGERUND_1 = ("вшись", "вши", "в")
_RU_PGERUND_2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
_RU_ADJ = (
    "ими", "ыми", "его", "ого", "ему", "ому",
    "ее", "ие", "ые", "ое", "ей", "ий", "ый", "ой", "ем", "им",
    "ым", "ом", "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею",
)
_RU_PART_1 = ("ем", "нн", "вш", "ющ", "щ")
_RU_PART_2 = ("ивш", "ывш", "ующ")
_RU_VERB_1 = (
    "ешь", "нно", "ете", "йте", "ла", "на", "ли", "ем", "ло",
    "но", "ет", "ют", "ны", "ть", "й", "л", "н",
)
_RU_VERB_2 = (
    "ейте", "уйте", "ила", "ыла", "ена", "ите", "или", "ыли",
    "ило", "ыло", "ено", "ует", "уют", "ены", "ить", "ыть",
    "ишь", "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ят",
    "ит", "ыт", "ую", "ю",
)
_RU_NOUN = (
    "иями", "ями", "ами", "ией", "иям", "ием", "иях",
    "ев", "ов", "ие", "ье", "еи", "ии", "ей", "ой", "ий",
    "ям", "ем", "ам", "ом", "ах", "ях", "ию", "ью", "ия", "ья",
    "а", "е", "и", "й", "о", "у", "ы", "ь", "ю", "я",
)


def _longest(w: str, sufs: tuple, rv: int,
             group1: bool = False) -> str | None:
    """Longest suffix of ``w`` from ``sufs`` that lies inside RV; for
    group1 suffixes the preceding letter must be а or я (and stays)."""
    best = None
    for s in sufs:
        if len(s) <= (0 if best is None else len(best)):
            continue
        if not w.endswith(s) or len(w) - len(s) < rv:
            continue
        if group1:
            # the preceding а/я must itself lie inside RV ("all tests
            # take place in RV")
            i = len(w) - len(s) - 1
            if i < rv or w[i] not in "ая":
                continue
        best = s
    return best


def russian_stem(word: str) -> str:
    w = word
    n = len(w)
    rv = n
    for i, c in enumerate(w):
        if c in _RU_VOWELS:
            rv = i + 1
            break
    _r1, r2 = _regions(w, _RU_VOWELS)

    # step 1: perfective gerund, else [reflexive] adjectival|verb|noun
    g2 = _longest(w, _RU_PGERUND_2, rv)
    g1 = _longest(w, _RU_PGERUND_1, rv, group1=True)
    g = g2 if g2 and (not g1 or len(g2) >= len(g1)) else g1
    if g:
        w = w[: -len(g)]
    else:
        for refl in ("ся", "сь"):
            if w.endswith(refl) and len(w) - 2 >= rv:
                w = w[:-2]
                break
        adj = _longest(w, _RU_ADJ, rv)
        if adj:
            w = w[: -len(adj)]
            p2 = _longest(w, _RU_PART_2, rv)
            p1 = _longest(w, _RU_PART_1, rv, group1=True)
            p = p2 if p2 and (not p1 or len(p2) >= len(p1)) else p1
            if p:
                w = w[: -len(p)]
        else:
            v2 = _longest(w, _RU_VERB_2, rv)
            v1 = _longest(w, _RU_VERB_1, rv, group1=True)
            v = v2 if v2 and (not v1 or len(v2) >= len(v1)) else v1
            if v:
                w = w[: -len(v)]
            else:
                nn = _longest(w, _RU_NOUN, rv)
                if nn:
                    w = w[: -len(nn)]

    # step 2: and-suffix и
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]

    # step 3: derivational ост/ость in R2
    for suf in ("ость", "ост"):
        if w.endswith(suf) and len(w) - len(suf) >= r2:
            w = w[: -len(suf)]
            break

    # step 4: undouble н / superlative / soft sign
    if w.endswith("нн") and len(w) - 1 >= rv:
        w = w[:-1]
    else:
        sup = _longest(w, ("ейше", "ейш"), rv)
        if sup:
            w = w[: -len(sup)]
            if w.endswith("нн") and len(w) - 1 >= rv:
                w = w[:-1]
        elif w.endswith("ь") and len(w) - 1 >= rv:
            w = w[:-1]
    return w


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

def snowball_stem(algorithm: str):
    """Callable stemmer for a Snowball ``algorithm`` name
    (case-insensitive, like the Ruby binding's StemFilter.new); raises
    ValueError for unknown names, matching the reference's
    ArgumentError (ruby/test/unit/analysis/tc_token_stream.rb:492)."""
    key = algorithm.lower()
    if key in ("english", "en", "porter2"):
        from .stemmer import stem

        return stem
    if key in ("german", "de"):
        return german_stem
    if key in ("russian", "ru"):
        return russian_stem
    if key in ("swedish", "sv"):
        return swedish_stem
    if key in ("danish", "da"):
        return danish_stem
    if key in ("norwegian", "no"):
        return norwegian_stem
    if key in ("spanish", "es"):
        return spanish_stem
    if key in ("portuguese", "pt"):
        return portuguese_stem
    if key in ("italian", "it"):
        return italian_stem
    if key in ("dutch", "nl"):
        return dutch_stem
    if key == "porter":
        return porter_stem
    if key in ("french", "fr"):
        return french_stem
    if key in ("finnish", "fi"):
        return finnish_stem
    if key in ("hungarian", "hu"):
        return hungarian_stem
    if key in ("romanian", "ro"):
        return romanian_stem
    if key in ("turkish", "tr"):
        return turkish_stem
    raise ValueError(
        f"unknown Snowball stemming algorithm: {algorithm!r} "
        "(supported: english, german, russian, swedish, danish, "
        "norwegian, spanish, portuguese, italian, dutch, porter, "
        "french, finnish, hungarian, romanian, turkish)"
    )


# --------------------------------------------------------------------------
# Scandinavian (Snowball swedish / danish / norwegian)
# --------------------------------------------------------------------------

def _scand_r1(w: str, vowels: set) -> int:
    """R1 with the Scandinavian adjustment: at least 3 letters before."""
    r1, _ = _regions(w, vowels)
    return max(r1, 3)


_SV_VOWELS = set("aeiouyäåö")
_SV_STEP1 = (
    "heterna", "hetens", "heten", "heter", "arnas", "ernas", "ornas",
    "andes", "andet", "arens", "arna", "erna", "orna", "ande", "arne",
    "aste", "aren", "ades", "erns", "ade", "are", "ern", "ens", "het",
    "ast", "ad", "en", "ar", "er", "or", "as", "es", "at", "a", "e",
)
_SV_S_END = set("bcdfghjklmnoprtvy")


def swedish_stem(word: str) -> str:
    w = word
    r1 = _scand_r1(w, _SV_VOWELS)
    # step 1: longest d-suffix, or s after a valid s-ending
    for suf in _SV_STEP1:
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            w = w[: -len(suf)]
            break
    else:
        if w.endswith("s") and len(w) - 1 >= r1 and len(w) >= 2 and \
                w[-2] in _SV_S_END:
            w = w[:-1]
    # step 2: shorten dd gd nn dt gt kt tt
    if len(w) >= r1 + 2 and w[-2:] in (
        "dd", "gd", "nn", "dt", "gt", "kt", "tt"
    ) and len(w) - 2 >= r1:
        w = w[:-1]
    # step 3
    for suf in ("lig", "els", "ig"):
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            w = w[: -len(suf)]
            break
    else:
        if w.endswith("löst") and len(w) - 4 >= r1 - 3 and \
                len(w) - 1 >= r1:
            # löst -> lös (replace applies when "löst" sits in R1:
            # the t being in R1 is the operative test)
            w = w[:-1]
        elif w.endswith("fullt") and len(w) - 1 >= r1:
            w = w[:-1]
    return w


_DA_VOWELS = set("aeiouyæåø")
_DA_STEP1 = (
    "erendes", "erende", "hedens", "ethed", "erede", "heden", "heder",
    "endes", "ernes", "erens", "erets", "ende", "enes", "eres", "eren",
    "erer", "heds", "enden", "ered", "ene", "erne", "ere", "en", "heder",
    "eret", "hed", "ens", "ers", "ets", "ede", "es", "et", "er", "e",
    "s",
)
_DA_S_END = set("abcdfghjklmnoprtvyzå")


def danish_stem(word: str) -> str:
    w = word
    r1 = _scand_r1(w, _DA_VOWELS)
    # step 1: longest match wins across the whole list; "s" requires a
    # valid s-ending immediately before
    best = None
    for suf in _DA_STEP1:
        if not w.endswith(suf) or len(w) - len(suf) < r1:
            continue
        if suf == "s" and (len(w) < 2 or w[-2] not in _DA_S_END):
            continue
        if best is None or len(suf) > len(best):
            best = suf
    if best:
        w = w[: -len(best)]
    # step 2: gd dt gt kt -> drop last letter
    if w[-2:] in ("gd", "dt", "gt", "kt") and len(w) - 2 >= r1:
        w = w[:-1]
    # step 3: igst; then ig lig elig els; løst -> løs
    if w.endswith("igst") and len(w) - 2 >= r1:
        w = w[:-2]
    for suf in ("elig", "lig", "els", "ig"):
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            w = w[: -len(suf)]
            # repeat step 2
            if w[-2:] in ("gd", "dt", "gt", "kt") and len(w) - 2 >= r1:
                w = w[:-1]
            break
    else:
        if w.endswith("løst") and len(w) - 1 >= r1:
            w = w[:-1]
    # step 4: undouble a final double consonant in R1
    if len(w) >= 2 and w[-1] == w[-2] and w[-1] not in _DA_VOWELS \
            and len(w) - 1 >= r1:
        w = w[:-1]
    return w


_NO_VOWELS = set("aeiouyæåø")
_NO_STEP1 = (
    "hetenes", "hetene", "hetens", "heten", "heter", "endes", "edes",
    "enes", "erte", "ande", "ende", "ane", "ene", "ede", "ens", "ers",
    "ets", "het", "ast", "ert", "en", "ar", "er", "as", "es", "et",
    "a", "e", "s",
)
_NO_S_END = set("bcdfghjlmnoprtvyz")


def norwegian_stem(word: str) -> str:
    w = word
    r1 = _scand_r1(w, _NO_VOWELS)
    best = None
    for suf in _NO_STEP1:
        if not w.endswith(suf) or len(w) - len(suf) < r1:
            continue
        if suf == "s":
            # valid s-ending, or k not preceded by a vowel
            i = len(w) - 2
            if i < 0:
                continue
            if w[i] not in _NO_S_END and not (
                w[i] == "k" and (i == 0 or w[i - 1] not in _NO_VOWELS)
            ):
                continue
        if best is None or len(suf) > len(best):
            best = suf
    if best in ("erte", "ert"):
        w = w[: -len(best)] + "er"
    elif best:
        w = w[: -len(best)]
    # step 2: dt vt -> drop last letter
    if w[-2:] in ("dt", "vt") and len(w) - 2 >= r1:
        w = w[:-1]
    # step 3
    for suf in ("hetslov", "slov", "elov", "lov", "eleg", "elig",
                "leg", "eig", "lig", "els", "ig"):
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            w = w[: -len(suf)]
            break
    return w


# --------------------------------------------------------------------------
# Spanish (Snowball spanish)
# --------------------------------------------------------------------------

_ES_VOWELS = set("aeiouáéíóúü")
_ES_DEACCENT = str.maketrans("áéíóú", "aeiou")

_ES_PRON = ("selas", "selos", "sela", "selo", "las", "les", "los",
            "nos", "me", "se", "la", "le", "lo")
_ES_PRE_A = ("iéndo", "ándo", "ár", "ér", "ír")
_ES_PRE_B = ("ando", "iendo", "ar", "er", "ir")

_ES_S1_DEL_R2 = (
    "amientos", "imientos", "amiento", "imiento", "anzas", "ismos",
    "ables", "ibles", "istas", "anza", "icos", "icas", "ismo", "able",
    "ible", "ista", "osos", "osas", "ico", "ica", "oso", "osa",
)
_ES_S1_ADOR = ("aciones", "adoras", "adores", "ancias", "adora",
               "ación", "antes", "ancia", "ador", "ante")
_ES_S1_IDAD = ("idades", "idad")
_ES_S1_IVA = ("ivas", "ivos", "iva", "ivo")
_ES_S2A = ("yeron", "yendo", "yamos", "yais", "yan", "yen", "yas",
           "yes", "ya", "ye", "yo", "yó")
_ES_S2B_GU = ("emos", "éis", "en", "es")
_ES_S2B = (
    "aríamos", "eríamos", "iríamos", "iéramos", "iésemos", "aríais",
    "aremos", "eríais", "eremos", "iríais", "iremos", "ierais",
    "ieseis", "asteis", "isteis", "ábamos", "áramos", "ásemos",
    "arían", "arías", "aríais"[:0] or "aréis", "erían", "erías",
    "eréis", "irían", "irías", "iréis", "ieran", "iesen", "ieron",
    "iendo", "ieras", "ieses", "abais", "arais", "aseis", "íamos",
    "arán", "arás", "aría", "erán", "erás", "ería", "irán", "irás",
    "iría", "iera", "iese", "aste", "iste", "aban", "aran", "asen",
    "aron", "ando", "ados", "idos", "amos", "imos", "ará", "aré", "erá",
    "eré", "irá", "iré", "aba", "ada", "ida", "ara", "ase", "ían",
    "ado", "ido", "ías", "áis", "ía", "ad", "ed", "id", "an", "ió",
    "ar", "er", "ir", "as", "ís",
)
_ES_S3 = ("os", "a", "o", "á", "í", "ó")


def _es_rv(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _ES_VOWELS:
        # next following vowel
        for i in range(2, n):
            if w[i] in _ES_VOWELS:
                return i + 1
        return n
    if w[0] in _ES_VOWELS and w[1] in _ES_VOWELS:
        # next following consonant
        for i in range(2, n):
            if w[i] not in _ES_VOWELS:
                return i + 1
        return n
    return 3  # consonant-vowel start


def spanish_stem(word: str) -> str:
    w = word
    rv = _es_rv(w)
    r1, r2 = _regions(w, _ES_VOWELS)

    # ---- step 0: attached pronoun
    for pron in _ES_PRON:
        if not w.endswith(pron):
            continue
        base = w[: -len(pron)]
        cut = len(base)
        done = False
        for pre in _ES_PRE_A:
            if base.endswith(pre) and cut - len(pre) >= 0 and \
                    cut >= rv and (cut - len(pre)) >= rv - 0 and \
                    len(base) - len(pre) >= rv - len(pre) and \
                    (len(w) - len(pron) - len(pre)) >= rv:
                w = base.translate(_ES_DEACCENT)
                done = True
                break
        if not done:
            for pre in _ES_PRE_B:
                if base.endswith(pre) and \
                        (len(base) - len(pre)) >= rv:
                    w = base
                    done = True
                    break
        if not done and base.endswith("yendo") and \
                len(base) >= 6 and base[-6] == "u":
            w = base
            done = True
        break
    rv = min(rv, len(w))

    # ---- step 1: standard suffixes
    n0 = len(w)

    def longest(sufs):
        best = None
        for s in sufs:
            if w.endswith(s) and (best is None or len(s) > len(best)):
                best = s
        return best

    removed = False
    cands = []
    for fam, sufs in (
        ("del", _ES_S1_DEL_R2), ("ador", _ES_S1_ADOR),
        ("logia", ("logías", "logía")), ("ucion", ("uciones", "ución")),
        ("encia", ("encias", "encia")), ("amente", ("amente",)),
        ("mente", ("mente",)), ("idad", _ES_S1_IDAD),
        ("iva", _ES_S1_IVA),
    ):
        s = longest(sufs)
        if s:
            cands.append((len(s), fam, s))
    if cands:
        _, fam, s = max(cands)
        pos = len(w) - len(s)
        if fam == "del" and pos >= r2:
            w = w[:pos]
        elif fam == "ador" and pos >= r2:
            w = w[:pos]
            if w.endswith("ic") and len(w) - 2 >= r2:
                w = w[:-2]
        elif fam == "logia" and pos >= r2:
            w = w[:pos] + "log"
        elif fam == "ucion" and pos >= r2:
            w = w[:pos] + "u"
        elif fam == "encia" and pos >= r2:
            w = w[:pos] + "ente"
        elif fam == "amente" and pos >= r1:
            w = w[:pos]
            if w.endswith("iv") and len(w) - 2 >= r2:
                w = w[:-2]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
            else:
                for pre in ("os", "ic", "ad"):
                    if w.endswith(pre) and len(w) - 2 >= r2:
                        w = w[:-2]
                        break
        elif fam == "mente" and pos >= r2:
            w = w[:pos]
            for pre in ("ante", "able", "ible"):
                if w.endswith(pre) and len(w) - len(pre) >= r2:
                    w = w[: -len(pre)]
                    break
        elif fam == "idad" and pos >= r2:
            w = w[:pos]
            for pre in ("abil", "ic", "iv"):
                if w.endswith(pre) and len(w) - len(pre) >= r2:
                    w = w[: -len(pre)]
                    break
        elif fam == "iva" and pos >= r2:
            w = w[:pos]
            if w.endswith("at") and len(w) - 2 >= r2:
                w = w[:-2]
    removed = len(w) != n0

    # ---- step 2a: verb suffixes beginning y (only if step 1 removed
    # nothing); the preceding u need not be in RV
    if not removed:
        n1 = len(w)
        best = None
        for s in _ES_S2A:
            if w.endswith(s) and len(w) - len(s) >= rv and \
                    (best is None or len(s) > len(best)):
                best = s
        if best and len(w) > len(best) and w[-len(best) - 1] == "u":
            w = w[: -len(best)]
        # ---- step 2b: only if 2a failed
        if len(w) == n1:
            best = None
            fam = None
            for s in _ES_S2B_GU:
                if w.endswith(s) and len(w) - len(s) >= rv and \
                        (best is None or len(s) > len(best)):
                    best, fam = s, "gu"
            for s in _ES_S2B:
                if w.endswith(s) and len(w) - len(s) >= rv and \
                        (best is None or len(s) > len(best)):
                    best, fam = s, "plain"
            if best:
                w = w[: -len(best)]
                if fam == "gu" and w.endswith("gu"):
                    w = w[:-1]

    # ---- step 3: residual suffix
    best = None
    for s in _ES_S3:
        if w.endswith(s) and len(w) - len(s) >= rv and \
                (best is None or len(s) > len(best)):
            best = s
    if best:
        w = w[: -len(best)]
    elif w.endswith(("e", "é")) and len(w) - 1 >= rv:
        w = w[:-1]
        if w.endswith("gu") and len(w) - 1 >= rv:
            w = w[:-1]

    return w.translate(_ES_DEACCENT)


# --------------------------------------------------------------------------
# Portuguese (Snowball portuguese — the libstemmer snapshot the reference
# vendors, which keeps accents and carries the early logía/ución entries)
# --------------------------------------------------------------------------

_PT_VOWELS = set("aeiouáéíóúâêô")

# (suffix, action-code) in the reference's among order; longest match
# wins and a failed region test fails the whole step (no fallback)
_PT_A5 = (
    ("ica", 1), ("ância", 1), ("ência", 4), ("ira", 9), ("adora", 1),
    ("osa", 1), ("ista", 1), ("iva", 8), ("eza", 1), ("logía", 2),
    ("idade", 7), ("ante", 1), ("mente", 6), ("amente", 5),
    ("ável", 1), ("ível", 1), ("ución", 3), ("ico", 1), ("ismo", 1),
    ("oso", 1), ("amento", 1), ("imento", 1), ("ivo", 8),
    ("aça~o", 1), ("ador", 1), ("icas", 1), ("ências", 4),
    ("iras", 9), ("adoras", 1), ("osas", 1), ("istas", 1),
    ("ivas", 8), ("ezas", 1), ("logías", 2), ("idades", 7),
    ("uciones", 3), ("adores", 1), ("antes", 1), ("aço~es", 1),
    ("icos", 1), ("ismos", 1), ("osos", 1), ("amentos", 1),
    ("imentos", 1), ("ivos", 8),
)
_PT_VERB = (
    "ada", "ida", "ia", "aria", "eria", "iria", "ara", "era", "ira",
    "ava", "asse", "esse", "isse", "aste", "este", "iste", "ei",
    "arei", "erei", "irei", "am", "iam", "ariam", "eriam", "iriam",
    "aram", "eram", "iram", "avam", "em", "arem", "erem", "irem",
    "assem", "essem", "issem", "ado", "ido", "ando", "endo", "indo",
    "ara~o", "era~o", "ira~o", "ar", "er", "ir", "as", "adas",
    "idas", "ias", "arias", "erias", "irias", "aras", "eras",
    "iras", "avas", "es", "ardes", "erdes", "irdes", "ares", "eres",
    "ires", "asses", "esses", "isses", "astes", "estes", "istes",
    "is", "ais", "eis", "areis", "ereis", "ireis", "áreis",
    "éreis", "íreis", "ásseis", "ésseis", "ísseis", "áveis",
    "íeis", "aríeis", "eríeis", "iríeis", "ados", "idos", "amos",
    "áramos", "éramos", "íramos", "ávamos", "íamos", "aríamos",
    "eríamos", "iríamos", "emos", "aremos", "eremos", "iremos",
    "ássemos", "êssemos", "íssemos", "imos", "armos", "ermos",
    "irmos", "ámos", "arás", "erás", "irás", "eu", "iu", "ou",
    "ará", "erá", "irá",
)
_PT_RESIDUAL = ("os", "a", "i", "o", "á", "í", "ó")


def _pt_rv_r1_r2(w: str) -> tuple[int, int, int]:
    n = len(w)
    if n < 3:
        rv = n
    elif w[1] not in _PT_VOWELS:
        rv = n
        for i in range(2, n):
            if w[i] in _PT_VOWELS:
                rv = i + 1
                break
    elif w[0] in _PT_VOWELS and w[1] in _PT_VOWELS:
        rv = n
        for i in range(2, n):
            if w[i] not in _PT_VOWELS:
                rv = i + 1
                break
    else:
        rv = 3
    r1, r2 = _regions(w, _PT_VOWELS)
    return rv, r1, r2


def portuguese_stem(word: str) -> str:
    w = word.replace("ã", "a~").replace("õ", "o~")
    rv, r1, r2 = _pt_rv_r1_r2(w)

    def try_del(sufs, bound):
        """Longest of ``sufs`` ending w and starting inside bound."""
        nonlocal w
        best = None
        for s in sufs:
            if w.endswith(s) and (best is None or len(s) > len(best)):
                best = s
        if best and len(w) - len(best) >= bound:
            w = w[: -len(best)]
            return True
        return False

    def standard_suffix() -> bool:
        nonlocal w
        best = None
        code = 0
        for s, c in _PT_A5:
            if w.endswith(s) and (best is None or len(s) > len(best)):
                best, code = s, c
        if best is None:
            return False
        pos = len(w) - len(best)
        if code == 1:
            if pos < r2:
                return False
            w = w[:pos]
        elif code == 2:
            if pos < r2:
                return False
            w = w[:pos] + "log"
        elif code == 3:
            if pos < r2:
                return False
            w = w[:pos] + "u"
        elif code == 4:
            if pos < r2:
                return False
            w = w[:pos] + "ente"
        elif code == 5:   # amente
            if pos < r1:
                return False
            w = w[:pos]
            best2 = None
            for s in ("ic", "ad", "os", "iv"):
                if w.endswith(s) and (best2 is None or
                                      len(s) > len(best2)):
                    best2 = s
            if best2 and len(w) - len(best2) >= r2:
                w = w[: -len(best2)]
                if best2 == "iv" and w.endswith("at") and \
                        len(w) - 2 >= r2:
                    w = w[:-2]
        elif code == 6:   # mente
            if pos < r2:
                return False
            w = w[:pos]
            try_del(("ante", "avel", "ível"), r2)
        elif code == 7:   # idade(s)
            if pos < r2:
                return False
            w = w[:pos]
            try_del(("ic", "abil", "iv"), r2)
        elif code == 8:   # iva ivo ivas ivos
            if pos < r2:
                return False
            w = w[:pos]
            try_del(("at",), r2)
        elif code == 9:   # ira iras -> ir, RV + preceded by e
            if pos < rv or pos < 1 or w[pos - 1] != "e":
                return False
            w = w[:pos] + "ir"
        return True

    def verb_suffix() -> bool:
        nonlocal w
        best = None
        for s in _PT_VERB:
            if w.endswith(s) and len(w) - len(s) >= rv and \
                    (best is None or len(s) > len(best)):
                best = s
        if best:
            w = w[: -len(best)]
            return True
        return False

    altered = standard_suffix() or verb_suffix()
    if altered:
        # final i preceded by c, in RV
        if w.endswith("ci") and len(w) - 1 >= rv:
            w = w[:-1]
    else:
        # residual suffix
        best = None
        for s in _PT_RESIDUAL:
            if w.endswith(s) and len(w) - len(s) >= rv and \
                    (best is None or len(s) > len(best)):
                best = s
        if best:
            w = w[: -len(best)]

    # residual form: e/é/ê in RV (then gu->g / ci->c u-i trim in RV),
    # or ç -> c
    if w[-1:] in ("e", "é", "ê"):
        if len(w) - 1 >= rv:
            w = w[:-1]
            if (w.endswith("gu") or w.endswith("ci")) and \
                    len(w) - 1 >= rv:
                w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")


# --------------------------------------------------------------------------
# Italian (Snowball italian)
# --------------------------------------------------------------------------

_IT_VOWELS = set("aeiouàèìòù")
_IT_PRON = (
    "gliela", "gliele", "glieli", "glielo", "gliene", "cela", "cele",
    "celi", "celo", "cene", "mela", "mele", "meli", "melo", "mene",
    "sene", "tela", "tele", "teli", "telo", "tene", "vela", "vele",
    "veli", "velo", "vene", "gli", "la", "le", "ne", "ci", "li",
    "mi", "si", "ti", "vi", "lo",
)
_IT_A6 = (
    ("ica", 1), ("logia", 3), ("osa", 1), ("ista", 1), ("iva", 9),
    ("anza", 1), ("enza", 5), ("ice", 1), ("atrice", 1), ("iche", 1),
    ("logie", 3), ("abile", 1), ("ibile", 1), ("usione", 4),
    ("azione", 2), ("uzione", 4), ("atore", 2), ("ose", 1),
    ("ante", 1), ("mente", 1), ("amente", 7), ("iste", 1),
    ("ive", 9), ("anze", 1), ("enze", 5), ("ici", 1), ("atrici", 1),
    ("ichi", 1), ("abili", 1), ("ibili", 1), ("ismi", 1),
    ("usioni", 4), ("azioni", 2), ("uzioni", 4), ("atori", 2),
    ("osi", 1), ("anti", 1), ("amenti", 6), ("imenti", 6),
    ("isti", 1), ("ivi", 9), ("ico", 1), ("ismo", 1), ("oso", 1),
    ("amento", 6), ("imento", 6), ("ivo", 9), ("ità", 8),
    ("istà", 1), ("istè", 1), ("istì", 1),
)
_IT_VERB = (
    "isca", "enda", "ata", "ita", "uta", "ava", "eva", "iva",
    "erebbe", "irebbe", "isce", "ende", "are", "ere", "ire", "asse",
    "ate", "avate", "evate", "ivate", "ete", "erete", "irete",
    "ite", "ereste", "ireste", "ute", "erai", "irai", "isci",
    "endi", "erei", "irei", "assi", "ati", "iti", "eresti",
    "iresti", "uti", "avi", "evi", "ivi", "isco", "ando", "endo",
    "Yamo", "iamo", "avamo", "evamo", "ivamo", "eremo", "iremo",
    "assimo", "ammo", "emmo", "eremmo", "iremmo", "immo", "ano",
    "iscano", "avano", "evano", "ivano", "eranno", "iranno", "ono",
    "iscono", "arono", "erono", "irono", "erebbero", "irebbero",
    "assero", "essero", "issero", "ato", "ito", "uto", "avo",
    "evo", "ivo", "ar", "ir", "erà", "irà", "erò", "irò",
)
_IT_ACUTE = str.maketrans("áéíóú", "àèìòù")


def italian_stem(word: str) -> str:
    # prelude: acute -> grave, qu -> qU, u/i between vowels -> U/I
    w = word.translate(_IT_ACUTE).replace("qu", "qU")
    # sequential scan: a just-marked U/I is a consonant for the next
    # pattern's left-vowel test (Snowball goto-v cursor semantics)
    out = list(w)
    for i in range(1, len(w) - 1):
        if w[i] in "ui" and out[i - 1] in _IT_VOWELS and \
                w[i + 1] in _IT_VOWELS:
            out[i] = w[i].upper()
    w = "".join(out)
    rv, r1, r2 = _it_regions(w)

    # ---- attached pronoun
    best = None
    for s in _IT_PRON:
        if w.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    if best:
        base = w[: -len(best)]
        m = None
        for pre, code in (("ando", 1), ("endo", 1), ("ar", 2),
                          ("er", 2), ("ir", 2)):
            if base.endswith(pre) and len(base) - len(pre) >= rv and \
                    (m is None or len(pre) > len(m[0])):
                m = (pre, code)
        if m:
            w = base if m[1] == 1 else base + "e"

    # ---- standard suffix, else verb suffix
    def standard_suffix() -> bool:
        nonlocal w
        best = None
        code = 0
        for s, c in _IT_A6:
            if w.endswith(s) and (best is None or len(s) > len(best)):
                best, code = s, c
        if best is None:
            return False
        pos = len(w) - len(best)
        if code == 1:
            if pos < r2:
                return False
            w = w[:pos]
        elif code == 2:  # azione/azioni/atore/atori (+ic)
            if pos < r2:
                return False
            w = w[:pos]
            if w.endswith("ic") and len(w) - 2 >= r2:
                w = w[:-2]
        elif code == 3:
            if pos < r2:
                return False
            w = w[:pos] + "log"
        elif code == 4:
            if pos < r2:
                return False
            w = w[:pos] + "u"
        elif code == 5:
            if pos < r2:
                return False
            w = w[:pos] + "ente"
        elif code == 6:  # amento/amenti/imento/imenti: RV
            if pos < rv:
                return False
            w = w[:pos]
        elif code == 7:  # amente: R1 (+ ic/abil/os/iv, iv+at)
            if pos < r1:
                return False
            w = w[:pos]
            best2 = None
            for s in ("ic", "abil", "os", "iv"):
                if w.endswith(s) and (best2 is None or
                                      len(s) > len(best2)):
                    best2 = s
            if best2 and len(w) - len(best2) >= r2:
                w = w[: -len(best2)]
                if best2 == "iv" and w.endswith("at") and \
                        len(w) - 2 >= r2:
                    w = w[:-2]
        elif code == 8:  # ità (+ ic/abil/iv)
            if pos < r2:
                return False
            w = w[:pos]
            best2 = None
            for s in ("ic", "abil", "iv"):
                if w.endswith(s) and (best2 is None or
                                      len(s) > len(best2)):
                    best2 = s
            if best2 and len(w) - len(best2) >= r2:
                w = w[: -len(best2)]
        elif code == 9:  # iva/ive/ivi/ivo (+at, then +ic)
            if pos < r2:
                return False
            w = w[:pos]
            if w.endswith("at") and len(w) - 2 >= r2:
                w = w[:-2]
                if w.endswith("ic") and len(w) - 2 >= r2:
                    w = w[:-2]
        return True

    if not standard_suffix():
        best = None
        for s in _IT_VERB:
            if w.endswith(s) and len(w) - len(s) >= rv and \
                    (best is None or len(s) > len(best)):
                best = s
        if best:
            w = w[: -len(best)]

    # ---- vowel suffix: final a/e/i/o/à/è/ì/ò in RV, then a further
    # final i in RV; then ch/gh -> c/g (final h after c/g in RV)
    if w[-1:] in "aeioàèìò" and len(w) - 1 >= rv:
        w = w[:-1]
        if w[-1:] == "i" and len(w) - 1 >= rv:
            w = w[:-1]
    # the consumed c/g must itself lie in RV (backwards-cursor test)
    if w[-1:] == "h" and w[-2:-1] in ("c", "g") and len(w) - 2 >= rv:
        w = w[:-1]

    return w.replace("I", "i").replace("U", "u")


def _it_regions(w: str) -> tuple[int, int, int]:
    n = len(w)
    if n < 3:
        rv = n
    elif w[1] not in _IT_VOWELS:
        rv = n
        for i in range(2, n):
            if w[i] in _IT_VOWELS:
                rv = i + 1
                break
    elif w[0] in _IT_VOWELS and w[1] in _IT_VOWELS:
        rv = n
        for i in range(2, n):
            if w[i] not in _IT_VOWELS:
                rv = i + 1
                break
    else:
        rv = 3
    r1, r2 = _regions(w, _IT_VOWELS)
    return rv, r1, r2


# --------------------------------------------------------------------------
# Dutch (Snowball dutch)
# --------------------------------------------------------------------------

_NL_VOWELS = set("aeiouyè")
_NL_UMLAUT = str.maketrans("äëïöüáéíóú", "aeiouaeiou")


def _nl_prelude(word: str) -> str:
    w = word.translate(_NL_UMLAUT)
    out = list(w)
    n = len(w)
    for i in range(n):
        c = out[i]
        if c == "y" and (i == 0 or out[i - 1] in _NL_VOWELS):
            out[i] = "Y"
        elif c == "i" and 0 < i < n - 1 and out[i - 1] in _NL_VOWELS \
                and w[i + 1] in _NL_VOWELS:
            out[i] = "I"
    return "".join(out)


def _nl_undouble(w: str) -> str:
    if w[-2:] in ("kk", "dd", "tt"):
        return w[:-1]
    return w


def dutch_stem(word: str) -> str:
    w = _nl_prelude(word)
    r1, r2 = _regions(w, _NL_VOWELS)
    # this libstemmer snapshot clamps the Dutch R1 at BYTE offset 3
    # (literal `I[0] = 3`, unlike the skip_utf8 char hop every other
    # language uses) — find the first char position at >= 3 bytes
    b = 0
    for i, ch in enumerate(w):
        if b >= 3:
            clamp = i
            break
        b += len(ch.encode())
    else:
        clamp = len(w) if b < 3 else len(w)
    if r1 < clamp:
        r1 = clamp

    e_removed = False

    # ---- step 1
    if w.endswith("heden"):
        if len(w) - 5 >= r1:
            w = w[:-5] + "heid"
    elif w.endswith("ene") or w.endswith("en"):
        ln = 3 if w.endswith("ene") else 2
        pos = len(w) - ln
        # valid en-ending: a non-vowel, and not the 'gem' exception
        if pos >= r1 and pos >= 1 and w[pos - 1] not in _NL_VOWELS \
                and w[max(0, pos - 3): pos] != "gem":
            w = _nl_undouble(w[:pos])
    elif w.endswith("se") or w.endswith("s"):
        ln = 2 if w.endswith("se") else 1
        pos = len(w) - ln
        if pos >= r1 and pos >= 1 and w[pos - 1] not in _NL_VOWELS \
                and w[pos - 1] != "j":
            w = w[:pos]

    # ---- step 2: final e after a non-vowel, in R1; undouble
    if w.endswith("e") and len(w) - 1 >= r1 and len(w) >= 2 and \
            w[-2] not in _NL_VOWELS:
        w = _nl_undouble(w[:-1])
        e_removed = True

    # ---- step 3a: heid (not preceded by c), then en-treatment
    if w.endswith("heid") and len(w) - 4 >= r2 and \
            (len(w) < 5 or w[-5] != "c"):
        w = w[:-4]
        if w.endswith("en"):
            pos = len(w) - 2
            if pos >= r1 and pos >= 1 and \
                    w[pos - 1] not in _NL_VOWELS and \
                    w[max(0, pos - 3): pos] != "gem":
                w = _nl_undouble(w[:pos])

    # ---- step 3b: d-suffixes
    if w.endswith("end") or w.endswith("ing"):
        if len(w) - 3 >= r2:
            w = w[:-3]
            if w.endswith("ig") and len(w) - 2 >= r2 and \
                    (len(w) < 3 or w[-3] != "e"):
                w = w[:-2]
            else:
                w = _nl_undouble(w)
    elif w.endswith("ig"):
        if len(w) - 2 >= r2 and (len(w) < 3 or w[-3] != "e"):
            w = w[:-2]
    elif w.endswith("lijk"):
        if len(w) - 4 >= r2:
            w = w[:-4]
            # repeat step 2
            if w.endswith("e") and len(w) - 1 >= r1 and \
                    len(w) >= 2 and w[-2] not in _NL_VOWELS:
                w = _nl_undouble(w[:-1])
    elif w.endswith("baar"):
        if len(w) - 4 >= r2:
            w = w[:-4]
    elif w.endswith("bar"):
        if len(w) - 3 >= r2 and e_removed:
            w = w[:-3]

    # ---- step 4: undouble vowel — C V V D with D a non-vowel != I
    if len(w) >= 4:
        c, v1, v2, d = w[-4], w[-3], w[-2], w[-1]
        if c not in _NL_VOWELS and v1 == v2 and \
                v1 in ("a", "e", "o", "u") and \
                d not in _NL_VOWELS and d != "I":
            w = w[:-2] + d

    return w.replace("Y", "y").replace("I", "i")


# --------------------------------------------------------------------------
# Porter (the classic Porter algorithm, Snowball "porter" variant with
# Y-marking of consonant y)
# --------------------------------------------------------------------------

def _po_is_vowel(w: str, i: int) -> bool:
    c = w[i]
    if c in "aeiou":
        return True
    # Snowball porter marks initial y and y-after-vowel as consonant Y;
    # so y is a vowel only when non-initial and after a consonant
    if c == "y":
        return i > 0 and not _po_is_vowel(w, i - 1)
    return False


def _po_measure(w: str, upto: int) -> int:
    """Number of VC sequences in w[:upto] (the Porter m)."""
    m = 0
    prev_v = False
    for i in range(upto):
        v = _po_is_vowel(w, i)
        if prev_v and not v:
            m += 1
        prev_v = v
    return m


def _po_has_vowel(w: str, upto: int) -> bool:
    return any(_po_is_vowel(w, i) for i in range(upto))


def _po_cvc(w: str, upto: int) -> bool:
    """*o: stem ends cvc where the last c is not w, x or y."""
    if upto < 3:
        return False
    return (
        not _po_is_vowel(w, upto - 3)
        and _po_is_vowel(w, upto - 2)
        and not _po_is_vowel(w, upto - 1)
        and w[upto - 1] not in "wxy"
    )


def _po_double_cons(w: str, upto: int) -> bool:
    return (
        upto >= 2 and w[upto - 1] == w[upto - 2]
        and not _po_is_vowel(w, upto - 1)
    )


_PO_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
    ("alli", "al"), ("entli", "ent"), ("eli", "e"),
    ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
    ("iviti", "ive"), ("biliti", "ble"),
)
_PO_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"),
    ("iciti", "ic"), ("ical", "ic"), ("ful", ""), ("ness", ""),
)
_PO_STEP4 = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant",
    "ement", "ment", "ent", "ou", "ism", "ate", "iti", "ous",
    "ive", "ize",
)


def porter_stem(word: str) -> str:
    w = word

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("s") and not w.endswith("ss"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _po_measure(w, len(w) - 3) > 0:
            w = w[:-1]
    else:
        hit = None
        for suf in ("ed", "ing"):
            if w.endswith(suf) and _po_has_vowel(w, len(w) - len(suf)):
                hit = suf
                break
        if hit:
            w = w[: -len(hit)]
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _po_double_cons(w, len(w)) and w[-1] in "bdfgmnprt":
                # snowball porter undoubles only these letters
                w = w[:-1]
            elif _po_measure(w, len(w)) == 1 and _po_cvc(w, len(w)):
                w += "e"

    # step 1c: y -> i when the stem has a vowel
    if w.endswith("y") and _po_has_vowel(w, len(w) - 1):
        w = w[:-1] + "i"

    # step 2
    for suf, rep in _PO_STEP2:
        if w.endswith(suf):
            if _po_measure(w, len(w) - len(suf)) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 3
    for suf, rep in _PO_STEP3:
        if w.endswith(suf):
            if _po_measure(w, len(w) - len(suf)) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 4 ("ion" additionally needs a preceding s or t)
    for suf in sorted(_PO_STEP4, key=len, reverse=True):
        if w.endswith(suf):
            if _po_measure(w, len(w) - len(suf)) > 1:
                w = w[: -len(suf)]
            break
    else:
        if w.endswith("ion") and len(w) >= 4 and w[-4] in "st" and \
                _po_measure(w, len(w) - 3) > 1:
            w = w[:-3]

    # step 5a
    if w.endswith("e"):
        m = _po_measure(w, len(w) - 1)
        if m > 1 or (m == 1 and not _po_cvc(w, len(w) - 1)):
            w = w[:-1]

    # step 5b
    if w.endswith("ll") and _po_measure(w, len(w)) > 1:
        w = w[:-1]

    return w


# --------------------------------------------------------------------------
# French (Snowball french)
# --------------------------------------------------------------------------

_FR_VOWELS = set("aeiouyàâèéêëîïôùû")
_FR_KEEP_S = set("aiosuè")

_FR_A4 = (
    ("iqUe", 1), ("atrice", 2), ("ance", 1), ("ence", 5),
    ("logie", 3), ("able", 1), ("isme", 1), ("euse", 11),
    ("iste", 1), ("ive", 8), ("if", 8), ("usion", 4), ("ation", 2),
    ("ution", 4), ("ateur", 2), ("iqUes", 1), ("atrices", 2),
    ("ances", 1), ("ences", 5), ("logies", 3), ("ables", 1),
    ("ismes", 1), ("euses", 11), ("istes", 1), ("ives", 8),
    ("ifs", 8), ("usions", 4), ("ations", 2), ("utions", 4),
    ("ateurs", 2), ("ments", 15), ("ements", 6), ("issements", 12),
    ("ités", 7), ("ment", 15), ("ement", 6), ("issement", 12),
    ("amment", 13), ("emment", 14), ("aux", 10), ("eaux", 9),
    ("eux", 1), ("ité", 7),
)
_FR_IVERB = (
    "issaIent", "issantes", "iraIent", "issante", "issants",
    "issions", "irions", "issais", "issait", "issant", "issent",
    "issiez", "issons", "irais", "irait", "irent", "iriez",
    "irons", "iront", "isses", "issez", "îmes", "îtes", "irai",
    "iras", "irez", "isse", "ira", "ies", "ir", "is", "it", "ie",
    "i", "ît", "irais"[:0] or "irais",
)
_FR_VERB2 = (
    "eraIent", "erions", "erais", "erait", "eriez", "erons",
    "eront", "erai", "eras", "erez", "èrent", "era", "ées", "iez",
    "ée", "és", "er", "ez", "é",
)
_FR_VERB3 = (
    "assions", "assiez", "assent", "asses", "antes", "aIent",
    "asse", "ante", "ants", "âmes", "âtes", "ais", "ait", "ant",
    "as", "ai", "ât", "a",
)


def _fr_prelude(word: str) -> str:
    out = list(word)
    n = len(out)
    i = 0
    while i < n:
        c = out[i]
        replaced = False
        if c in _FR_VOWELS and i + 1 < n:
            nxt = out[i + 1]
            if nxt == "u" and i + 2 < n and out[i + 2] in _FR_VOWELS:
                out[i + 1] = "U"
                replaced = True
            elif nxt == "i" and i + 2 < n and \
                    out[i + 2] in _FR_VOWELS:
                out[i + 1] = "I"
                replaced = True
            elif nxt == "y":
                out[i + 1] = "Y"
                replaced = True
        if not replaced and out[i] == "y" and i + 1 < n and \
                out[i + 1] in _FR_VOWELS:
            out[i] = "Y"
        elif not replaced and out[i] == "q" and i + 1 < n and \
                out[i + 1] == "u":
            out[i + 1] = "U"
        i += 1
    return "".join(out)


def _fr_regions(w: str) -> tuple[int, int, int]:
    n = len(w)
    rv = n
    if n >= 2 and w[0] in _FR_VOWELS and w[1] in _FR_VOWELS:
        rv = min(3, n)
    elif w[:3] in ("col", "par", "tap"):
        rv = 3
    else:
        for i in range(1, n):
            if w[i] in _FR_VOWELS:
                rv = i + 1
                break
    r1, r2 = _regions(w, _FR_VOWELS)
    return rv, r1, r2


def french_stem(word: str) -> str:
    w = _fr_prelude(word)
    rv, r1, r2 = _fr_regions(w)

    def std() -> bool:
        """standard_suffix: True = success; None = matched-but-fail
        (amment/emment/ment rewrites that continue to the verb steps);
        False = no match."""
        nonlocal w
        best, code = None, 0
        for s, c in _FR_A4:
            if w.endswith(s) and (best is None or len(s) > len(best)):
                best, code = s, c
        if best is None:
            return False
        pos = len(w) - len(best)
        if code == 1:
            if pos < r2:
                return False
            w = w[:pos]
        elif code == 2:
            if pos < r2:
                return False
            w = w[:pos]
            if w.endswith("ic"):
                if len(w) - 2 >= r2:
                    w = w[:-2]
                else:
                    w = w[:-2] + "iqU"
        elif code == 3:
            if pos < r2:
                return False
            w = w[:pos] + "log"
        elif code == 4:
            if pos < r2:
                return False
            w = w[:pos] + "u"
        elif code == 5:
            if pos < r2:
                return False
            w = w[:pos] + "ent"
        elif code == 6:   # ement(s): RV, then the a_2 sub-suffixes
            if pos < rv:
                return False
            w = w[:pos]
            for s2, c2 in (("iqU", 3), ("abl", 3), ("Ièr", 4),
                           ("ièr", 4), ("eus", 2), ("iv", 1)):
                if not w.endswith(s2):
                    continue
                p2 = len(w) - len(s2)
                if c2 == 1 and p2 >= r2:
                    w = w[:p2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                elif c2 == 2:
                    if p2 >= r2:
                        w = w[:p2]
                    elif p2 >= r1:
                        w = w[:p2] + "eux"
                elif c2 == 3 and p2 >= r2:
                    w = w[:p2]
                elif c2 == 4 and p2 >= rv:
                    w = w[:p2] + "i"
                break
        elif code == 7:   # ité(s): + abil/ic/iv
            if pos < r2:
                return False
            w = w[:pos]
            for s2 in ("abil", "ic", "iv"):
                if not w.endswith(s2):
                    continue
                p2 = len(w) - len(s2)
                if s2 == "abil":
                    w = w[:p2] if p2 >= r2 else w[:p2] + "abl"
                elif s2 == "ic":
                    w = w[:p2] if p2 >= r2 else w[:p2] + "iqU"
                elif p2 >= r2:
                    w = w[:p2]
                break
        elif code == 8:   # if/ive(s): + at (+ ic)
            if pos < r2:
                return False
            w = w[:pos]
            if w.endswith("at") and len(w) - 2 >= r2:
                w = w[:-2]
                if w.endswith("ic"):
                    if len(w) - 2 >= r2:
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
        elif code == 9:   # eaux -> eau
            w = w[:pos] + "eau"
        elif code == 10:  # aux -> al (R1)
            if pos < r1:
                return False
            w = w[:pos] + "al"
        elif code == 11:  # euse(s): R2 del or R1 -> eux
            if pos >= r2:
                w = w[:pos]
            elif pos >= r1:
                w = w[:pos] + "eux"
            else:
                return False
        elif code == 12:  # issement(s): R1 + preceded by non-vowel
            if pos < r1 or pos < 1 or w[pos - 1] in _FR_VOWELS:
                return False
            w = w[:pos]
        elif code == 13:  # amment -> ant (RV), then treat as verb
            if pos < rv:
                return False
            w = w[:pos] + "ant"
            return None
        elif code == 14:  # emment -> ent (RV), then treat as verb
            if pos < rv:
                return False
            w = w[:pos] + "ent"
            return None
        elif code == 15:  # ment(s) preceded by a vowel in RV
            if pos < 1 or w[pos - 1] not in _FR_VOWELS or \
                    pos - 1 < rv:
                return False
            w = w[:pos]
            return None
        return True

    def i_verb() -> bool:
        nonlocal w
        best = None
        for s in _FR_IVERB:
            if w.endswith(s) and len(w) - len(s) >= rv and \
                    (best is None or len(s) > len(best)):
                best = s
        if best:
            p = len(w) - len(best)
            if p - 1 >= rv and w[p - 1] not in _FR_VOWELS:
                w = w[:p]
                return True
        return False

    def verb() -> bool:
        nonlocal w
        best, code = None, 0
        if w.endswith("ions") and len(w) - 4 >= rv:
            best, code = "ions", 1
        for s in _FR_VERB2:
            if w.endswith(s) and len(w) - len(s) >= rv and \
                    (best is None or len(s) > len(best)):
                best, code = s, 2
        for s in _FR_VERB3:
            if w.endswith(s) and len(w) - len(s) >= rv and \
                    (best is None or len(s) > len(best)):
                best, code = s, 3
        if best is None:
            return False
        pos = len(w) - len(best)
        if code == 1:
            if pos < r2:
                return False
            w = w[:pos]
        elif code == 2:
            w = w[:pos]
        else:
            w = w[:pos]
            if w.endswith("e") and len(w) - 1 >= rv:
                w = w[:-1]
        return True

    res = std()
    altered = res is True
    if res is False:
        altered = i_verb() or verb()
    if altered or res is None:
        if res is None:
            # amment/emment/ment rewrites continue into the verb steps
            altered = i_verb() or verb() or True
        # post step: Y -> i, ç -> c
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # residual suffix
        if w.endswith("s") and len(w) >= 2 and \
                w[-2] not in _FR_KEEP_S:
            w = w[:-1]
        best, code = None, 0
        for s, c in (("Ière", 2), ("ière", 2), ("ion", 1), ("Ier", 2),
                     ("ier", 2), ("e", 3), ("ë", 4)):
            if w.endswith(s) and len(w) - len(s) >= rv and \
                    (best is None or len(s) > len(best)):
                best, code = s, c
        if best is not None:
            pos = len(w) - len(best)
            if code == 1:
                if pos >= r2 and pos >= 1 and w[pos - 1] in "st" and \
                        pos - 1 >= rv:
                    w = w[:pos]
            elif code == 2:
                w = w[:pos] + "i"
            elif code == 3:
                w = w[:pos]
            elif code == 4 and w.endswith("guë") and pos - 2 >= rv:
                w = w[:pos]

    # un_double: after ell/eill/enn/onn/ett drop the last letter
    for d in ("eill", "ell", "enn", "onn", "ett"):
        if w.endswith(d):
            w = w[:-1]
            break

    # un_accent: é/è followed by >=1 trailing non-vowels -> e
    i = len(w) - 1
    ncons = 0
    while i >= 0 and w[i] not in _FR_VOWELS:
        ncons += 1
        i -= 1
    if ncons >= 1 and i >= 0 and w[i] in ("é", "è"):
        w = w[:i] + "e" + w[i + 1:]

    return w.replace("I", "i").replace("U", "u").replace("Y", "y")


# --------------------------------------------------------------------------
# Finnish (Snowball finnish)
# --------------------------------------------------------------------------

_FI_V1 = set("aeiouyäö")
_FI_V2 = set("aeiouäö")
_FI_AEI = set("aeiä")
_FI_PARTICLE_END = set("aeinotuyäö")
_FI_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")
_FI_CASE_PLAIN = (
    "seen", "tten", "siin", "lla", "ssa", "lta", "sta", "lle",
    "ine", "ksi", "den", "llä", "ssä", "ltä", "stä", "na", "ta",
    "nä", "tä",
)
_FI_CASE_H = (("han", "a"), ("hen", "e"), ("hin", "i"), ("hon", "o"),
              ("hän", "ä"), ("hön", "ö"))


def finnish_stem(word: str) -> str:
    w = word
    r1, r2 = _regions(w, _FI_V1)
    ending_removed = False

    # ---- particle etc (within R1)
    best, code = None, 0
    for s, c in (("kaan", 1), ("kään", 1), ("sti", 2), ("han", 1),
                 ("kin", 1), ("hän", 1), ("pa", 1), ("ko", 1),
                 ("pä", 1), ("kö", 1)):
        if w.endswith(s) and len(w) - len(s) >= r1 and \
                (best is None or len(s) > len(best)):
            best, code = s, c
    if best:
        pos = len(w) - len(best)
        if code == 1:
            # condition chars are tested UNLIMITED: the setlimit in the
            # reference covers only the among match itself
            if pos >= 1 and w[pos - 1] in _FI_PARTICLE_END:
                w = w[:pos]
        elif pos >= r2:
            w = w[:pos]

    # ---- possessive (within R1)
    best, code = None, 0
    for s, c in (("nsa", 3), ("mme", 3), ("nne", 3), ("nsä", 3),
                 ("ni", 2), ("si", 1), ("an", 4), ("en", 6),
                 ("än", 5)):
        if w.endswith(s) and len(w) - len(s) >= r1 and \
                (best is None or len(s) > len(best)):
            best, code = s, c
    if best:
        pos = len(w) - len(best)
        if code == 1:
            if not (pos >= 1 and w[pos - 1] == "k"):
                w = w[:pos]
        elif code == 2:
            w = w[:pos]
            if w.endswith("kse"):
                w = w[:-3] + "ksi"
        elif code == 3:
            w = w[:pos]
        elif code == 4:
            if any(w[:pos].endswith(p) for p in
                   ("lla", "na", "ssa", "ta", "lta", "sta")):
                w = w[:pos]
        elif code == 5:
            if any(w[:pos].endswith(p) for p in
                   ("llä", "nä", "ssä", "tä", "ltä", "stä")):
                w = w[:pos]
        elif code == 6:
            if w[:pos].endswith(("lle", "ine")):
                w = w[:pos]

    # ---- case ending (suffix must FIT inside R1; among semantics:
    # longest fitting row wins, rows with a condition function (den/
    # seen/tten/siin) fall back to their parent row 'n' when the
    # condition fails, while switch-checked rows (vowel harmony, tta,
    # a/ä) fail the whole step)
    rows = [
        ("seen", "n", "LONG"), ("tten", "n", "VI"),
        ("siin", "n", "VI"), ("den", "n", "VI"),
        ("han", 1, None), ("hen", 2, None), ("hin", 3, None),
        ("hon", 4, None), ("hän", 5, None), ("hön", 6, None),
        ("lla", "plain", None), ("ssa", "plain", None),
        ("lta", "plain", None), ("sta", "plain", None),
        ("lle", "plain", None), ("ine", "plain", None),
        ("ksi", "plain", None), ("llä", "plain", None),
        ("ssä", "plain", None), ("ltä", "plain", None),
        ("stä", "plain", None), ("tta", 9, None), ("ttä", 9, None),
        ("na", "plain", None), ("ta", "plain", None),
        ("nä", "plain", None), ("tä", "plain", None),
        ("n", 7, None), ("a", 8, None), ("ä", 8, None),
    ]
    best = None
    for s, code, cond in rows:
        if w.endswith(s) and len(w) - len(s) >= r1 and \
                (best is None or len(s) > len(best[0])):
            best = (s, code, cond)
    if best:
        s, code, cond = best
        pos = len(w) - len(s)
        head = w[:pos]
        if cond == "VI" and not (
            head.endswith("i") and len(head) >= 2
            and head[-2] in _FI_V2
        ):
            s, code, cond = "n", 7, None
            pos = len(w) - 1
            head = w[:pos]
        elif cond == "LONG" and head[-2:] not in _FI_LONG:
            s, code, cond = "n", 7, None
            pos = len(w) - 1
            head = w[:pos]
        ok = False
        extra = 0
        if code == "plain" or cond in ("VI", "LONG"):
            ok = True
        elif code in (1, 2, 3, 4, 5, 6):
            pre = "aeioäö"[code - 1]
            ok = pos >= 1 and w[pos - 1] == pre
        elif code == 9:
            ok = pos >= 1 and w[pos - 1] == "e"
        elif code == 8:
            ok = (pos >= 2 and w[pos - 1] in _FI_V1
                  and w[pos - 2] not in _FI_V1)
        elif code == 7:
            ok = True
        if ok and code == 7:
            # n: if preceded by LONG or 'ie', delete one more char
            if head[-2:] in _FI_LONG or head.endswith("ie"):
                extra = 1
        if ok:
            w = w[: pos - extra]
            ending_removed = True

    # ---- other endings (within R2)
    best, code = None, 0
    for s, c in (("imma", -1), ("impa", -1), ("immi", -1),
                 ("impi", -1), ("immä", -1), ("impä", -1),
                 ("eja", -1), ("ejä", -1), ("mma", 1), ("mpa", 1),
                 ("mmi", 1), ("mpi", 1), ("mmä", 1), ("mpä", 1)):
        if w.endswith(s) and len(w) - len(s) >= r2 and \
                (best is None or len(s) > len(best)):
            best, code = s, c
    if best:
        pos = len(w) - len(best)
        if code == 1:
            if not w[:pos].endswith("po"):
                w = w[:pos]
        else:
            w = w[:pos]

    # ---- i/t plural
    if ending_removed:
        if w[-1:] in ("i", "j") and len(w) - 1 >= r1:
            w = w[:-1]
    else:
        # the V1 test before t is INSIDE the limit here (t_plural keeps
        # its setlimit across the test), so the vowel must sit >= r1
        if w.endswith("t") and len(w) - 2 >= r1 and \
                w[-2] in _FI_V1:
            w = w[:-1]
            # then mma/imma within R2 (not preceded by po for mma)
            if w.endswith("imma") and len(w) - 4 >= r2:
                w = w[:-4]
            elif w.endswith("mma") and len(w) - 3 >= r2 and \
                    not w[:-3].endswith("po"):
                w = w[:-3]

    # ---- tidy (within R1: both chars of each bigram test must sit
    # inside the limited region)
    if w[-2:] in _FI_LONG and len(w) - 2 >= r1:
        w = w[:-1]
    if w[-1:] in _FI_AEI and len(w) - 2 >= r1 and \
            w[-2] not in _FI_V1:
        w = w[:-1]
    if w.endswith(("oj", "uj")) and len(w) - 2 >= r1:
        w = w[:-1]
    if w.endswith("jo") and len(w) - 2 >= r1:
        w = w[:-1]
    # undouble: a double consonant before the trailing vowels loses one
    i = len(w) - 1
    while i >= 0 and w[i] in _FI_V1:
        i -= 1
    if i >= 1 and w[i] not in _FI_V1 and w[i - 1] == w[i]:
        w = w[:i] + w[i + 1:]
    return w


# --------------------------------------------------------------------------
# Hungarian (Snowball hungarian — this snapshot spells õ/û for ő/ű)
# --------------------------------------------------------------------------

_HU_V = set("aeiouáéíóõöúûü")
_HU_DIGRAPHS = ("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
_HU_DOUBLES = (
    "ccs", "ggy", "lly", "nny", "ssz", "tty", "zzs", "bb", "cc",
    "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn", "pp", "rr",
    "ss", "tt", "vv", "zz",
)
_HU_CASE = (
    "anként", "enként", "onként", "képpen", "ként", "képp", "ban",
    "ben", "nak", "nek", "val", "vel", "nál", "nél", "ból", "ról",
    "tól", "bõl", "rõl", "tõl", "hez", "hoz", "höz", "ért", "kor",
    "ba", "ra", "be", "re", "ig", "ul", "ül", "an", "en", "on",
    "ön", "at", "et", "ot", "öt", "vá", "vé", "n", "t",
)
_HU_OWNED = (
    ("áéi", "a"), ("ééi", "e"), ("éi", ""), ("aké", ""),
    ("eké", ""), ("oké", ""), ("áké", "a"), ("éké", "e"),
    ("öké", ""), ("éé", "e"), ("ké", ""), ("é", ""),
)
_HU_SING = (
    ("ájuk", "a"), ("éjük", "e"), ("unk", ""), ("ánk", "a"),
    ("énk", "e"), ("ünk", ""), ("juk", ""), ("jük", ""),
    ("ja", ""), ("je", ""), ("ad", ""), ("ed", ""), ("od", ""),
    ("ád", "a"), ("éd", "e"), ("öd", ""), ("nk", ""), ("uk", ""),
    ("ük", ""), ("am", ""), ("em", ""), ("om", ""), ("ám", "a"),
    ("ém", "e"), ("a", ""), ("d", ""), ("e", ""), ("m", ""),
    ("o", ""), ("á", "a"), ("é", "e"),
)
_HU_PLUR = (
    ("jaitok", ""), ("jeitek", ""), ("áitok", "a"), ("éitek", "e"),
    ("jaink", ""), ("jeink", ""), ("aitok", ""), ("eitek", ""),
    ("jaid", ""), ("jeid", ""), ("jaim", ""), ("jeim", ""),
    ("jai", ""), ("jei", ""), ("jaik", ""), ("jeik", ""),
    ("aink", ""), ("eink", ""), ("áink", "a"), ("éink", "e"),
    ("itek", ""), ("aid", ""), ("eid", ""), ("áid", "a"),
    ("éid", "e"), ("aik", ""), ("eik", ""), ("áik", "a"),
    ("éik", "e"), ("aim", ""), ("eim", ""), ("áim", "a"),
    ("éim", "e"), ("ink", ""), ("ai", ""), ("ei", ""),
    ("ái", "a"), ("éi", "e"), ("id", ""), ("ik", ""), ("im", ""),
    ("i", ""),
)
_HU_PLURAL = (
    ("ák", "a"), ("ék", "e"), ("ök", ""), ("ak", ""), ("ek", ""),
    ("ok", ""), ("k", ""),
)


def _hu_r1(w: str) -> int:
    n = len(w)
    if n and w[0] in _HU_V:
        # after the first consonant (or consonant digraph)
        i = 1
        while i < n and w[i] in _HU_V:
            i += 1
        if i >= n:
            return n
        for d in _HU_DIGRAPHS:
            if w.startswith(d, i):
                return i + len(d)
        return i + 1
    # starts with a consonant: after the first vowel
    for i in range(n):
        if w[i] in _HU_V:
            return i + 1
    return n


def hungarian_stem(word: str) -> str:
    w = word
    r1 = _hu_r1(w)

    def v_ending() -> None:
        nonlocal w
        if w[-1:] == "á" and len(w) - 1 >= r1:
            w = w[:-1] + "a"
        elif w[-1:] == "é" and len(w) - 1 >= r1:
            w = w[:-1] + "e"

    def ends_double(s: str) -> str | None:
        for d in _HU_DOUBLES:
            if s.endswith(d):
                return d
        return None

    def undouble() -> None:
        # delete the second-to-last character
        nonlocal w
        if len(w) >= 2:
            w = w[:-2] + w[-1]

    # instrum: al/el in R1, preceded by a double; delete + undouble
    # (no limit on the match: the longest matching row is chosen, then
    # the R1/double checks hard-fail the step)
    for suf in ("al", "el"):
        if w.endswith(suf):
            if len(w) - 2 >= r1 and ends_double(w[:-2]):
                w = w[:-2]
                undouble()
            break

    # case: longest a_4 suffix; R1 hard check -> delete, then v_ending
    best = None
    for s in _HU_CASE:
        if w.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    if best and len(w) - len(best) >= r1:
        w = w[: -len(best)]
        v_ending()

    # case_special: án/én/ánként -> a/e/a in R1
    for s, rep in (("ánként", "a"), ("án", "a"), ("én", "e")):
        if w.endswith(s):
            if len(w) - len(s) >= r1:
                w = w[: -len(s)] + rep
            break

    # case_other: stul/stül/astul/estül del; ástul->a éstül->e (R1)
    for s, rep in (("astul", ""), ("estül", ""), ("ástul", "a"),
                   ("éstül", "e"), ("stul", ""), ("stül", "")):
        if w.endswith(s):
            if len(w) - len(s) >= r1:
                w = w[: -len(s)] + rep
            break

    # factive: á/é in R1, preceded by a double; delete + undouble
    if w[-1:] in ("á", "é") and len(w) - 1 >= r1 and \
            ends_double(w[:-1]):
        w = w[:-1]
        undouble()

    # owned
    best = None
    for s, rep in _HU_OWNED:
        if w.endswith(s) and (best is None or len(s) > len(best[0])):
            best = (s, rep)
    if best and len(w) - len(best[0]) >= r1:
        w = w[: -len(best[0])] + best[1]

    # sing_owner
    best = None
    for s, rep in _HU_SING:
        if w.endswith(s) and (best is None or len(s) > len(best[0])):
            best = (s, rep)
    if best and len(w) - len(best[0]) >= r1:
        w = w[: -len(best[0])] + best[1]

    # plur_owner
    best = None
    for s, rep in _HU_PLUR:
        if w.endswith(s) and (best is None or len(s) > len(best[0])):
            best = (s, rep)
    if best and len(w) - len(best[0]) >= r1:
        w = w[: -len(best[0])] + best[1]

    # plural
    best = None
    for s, rep in _HU_PLURAL:
        if w.endswith(s) and (best is None or len(s) > len(best[0])):
            best = (s, rep)
    if best and len(w) - len(best[0]) >= r1:
        w = w[: -len(best[0])] + best[1]
    return w


# --------------------------------------------------------------------------
# Romanian (Snowball romanian — this snapshot spells ţ with cedilla)
# --------------------------------------------------------------------------

_RO_VOWELS = set("aeiouâîă")
_RO_STEP0 = (
    ("iilor", "i"), ("ilor", "i"), ("elor", "e"), ("ului", ""),
    ("iile", "i"), ("aţia", "aţi"), ("aţie", "aţi"), ("atei", "at"),
    ("aua", "a"), ("iua", "i"), ("iei", "i"), ("ele", "e"),
    ("ile", "i"), ("ii", "i"), ("ul", ""), ("ea", "e"),
)
_RO_COMBO = (
    ("abilitate", "abil"), ("abilitati", "abil"),
    ("abilităi", "abil"), ("abilităţi", "abil"),
    ("ibilitate", "ibil"),
    ("ivitate", "iv"), ("ivitati", "iv"), ("ivităi", "iv"),
    ("ivităţi", "iv"),
    ("icitate", "ic"), ("icitati", "ic"), ("icităi", "ic"),
    ("icităţi", "ic"), ("icatori", "ic"), ("icator", "ic"),
    ("icala", "ic"), ("icale", "ic"), ("icali", "ic"),
    ("icală", "ic"), ("iciva", "ic"), ("icive", "ic"),
    ("icivi", "ic"), ("icivă", "ic"), ("ical", "ic"), ("iciv", "ic"),
    ("aţiune", "at"), ("atoare", "at"), ("ătoare", "at"),
    ("ativa", "at"), ("ative", "at"), ("ativi", "at"),
    ("ativă", "at"), ("atori", "at"), ("ători", "at"),
    ("ativ", "at"), ("ator", "at"), ("ător", "at"),
    ("iţiune", "it"), ("itoare", "it"), ("itiva", "it"),
    ("itive", "it"), ("itivi", "it"), ("itivă", "it"),
    ("itori", "it"), ("itiv", "it"), ("itor", "it"),
)
_RO_STD_DEL = (
    "itate", "itati", "ităţi", "abila", "abile", "abili", "abilă",
    "ibila", "ibile", "ibili", "ibilă", "atori", "ităi", "abil",
    "ibil", "oasa", "oasă", "oase", "anta", "ante", "anti", "antă",
    "ator", "ica", "ice", "ici", "ică", "ata", "ată", "ati", "ate",
    "uta", "ută", "uti", "ute", "ita", "ită", "iti", "ite", "iva",
    "ive", "ivi", "ivă", "osi", "oşi", "ant", "ic", "at", "ut",
    "it", "os", "iv",
)
_RO_STD_IST = ("işti", "ista", "iste", "isti", "istă", "isme",
               "iuni", "ism", "ist", "iune")
_RO_VERB_COND = (
    # case-1 rows of a_4: delete when preceded (within RV) by a
    # non-vowel or u
    "aserăţi", "iserăţi", "userăţi", "âserăţi", "arăţi", "irăţi",
    "urăţi", "ârăţi", "aserăm", "iserăm", "userăm", "âserăm",
    "arăm", "irăm", "urăm", "ârăm", "aseră", "iseră", "useră",
    "âseră", "ară", "iră", "ură", "âră", "aseşi", "iseşi",
    "useşi", "âseşi", "ească", "eaţi", "iaţi", "eşte", "ăşte",
    "eşti", "ăşti", "indu", "ându", "ind", "ând", "are", "ere",
    "ire", "âre", "ase", "ise", "use", "âse", "eze", "ezi",
    "eai", "iai", "aşi", "işi", "uşi", "âşi", "eam", "iam",
    "asem", "isem", "usem", "âsem", "eau", "iau", "esc", "ăsc",
    "ează", "ea", "ia", "ai", "ui", "âi", "am", "au", "ez",
)
_RO_VERB_PLAIN = (
    # case-2 rows: plain delete within RV
    "seserăţi", "serăţi", "seserăm", "serăm", "seseşi", "seşi",
    "seseră", "seră", "sesem", "sese", "sei", "se", "aţi", "eţi",
    "iţi", "âţi", "em", "im", "ăm", "âm",
)


def _ro_prelude(word: str) -> str:
    out = list(word)
    n = len(out)
    for i in range(1, n - 1):
        if out[i] in "ui" and out[i - 1] in _RO_VOWELS and \
                word[i + 1] in _RO_VOWELS:
            out[i] = out[i].upper()
    return "".join(out)


def romanian_stem(word: str) -> str:
    w = _ro_prelude(word)
    n = len(w)
    if n < 3:
        rv = n
    elif w[1] not in _RO_VOWELS:
        rv = n
        for i in range(2, n):
            if w[i] in _RO_VOWELS:
                rv = i + 1
                break
    elif w[0] in _RO_VOWELS and w[1] in _RO_VOWELS:
        rv = n
        for i in range(2, n):
            if w[i] not in _RO_VOWELS:
                rv = i + 1
                break
    else:
        rv = 3
    r1, r2 = _regions(w, _RO_VOWELS)

    def longest(pairs):
        best = None
        for item in pairs:
            s = item[0] if isinstance(item, tuple) else item
            if w.endswith(s) and (best is None or
                                  len(s) > len(best[0])):
                best = (s, item[1] if isinstance(item, tuple) else None)
        return best

    # ---- step 0 (R1)
    b = longest(_RO_STEP0)
    if b and len(w) - len(b[0]) >= r1:
        s, rep = b
        if s == "ile" and w[: -3].endswith("ab"):
            pass  # 'ile' unless preceded by ab
        else:
            w = w[: -len(s)] + rep

    # ---- standard suffix: repeat combo, then a_3 in R2
    removed = False
    while True:
        b = longest(_RO_COMBO)
        if b and len(w) - len(b[0]) >= r1:
            w = w[: -len(b[0])] + b[1]
            removed = True
            continue
        break
    cands = []
    bd = longest([(s, None) for s in _RO_STD_DEL])
    if bd:
        cands.append((len(bd[0]), bd[0], "del"))
    bi = longest([(s, None) for s in _RO_STD_IST])
    if bi:
        cands.append((len(bi[0]), bi[0], "ist"))
    if w.endswith("iune") or w.endswith("iuni"):
        cands.append((4, w[-4:], "iune"))
    if cands:
        _, s, kind = max(cands)
        pos = len(w) - len(s)
        if pos >= r2:
            if kind == "del":
                w = w[:pos]
                removed = True
            elif kind == "ist":
                w = w[:pos] + "ist"
                removed = True
            elif kind == "iune" and pos >= 1 and w[pos - 1] == "ţ":
                w = w[: pos - 1] + "t"
                removed = True

    # ---- verb suffix (within RV) when no standard suffix was removed
    if not removed:
        best, kind = None, None
        for s in _RO_VERB_COND:
            if w.endswith(s) and len(w) - len(s) >= rv and \
                    (best is None or len(s) > len(best)):
                best, kind = s, "cond"
        for s in _RO_VERB_PLAIN:
            if w.endswith(s) and len(w) - len(s) >= rv and \
                    (best is None or len(s) > len(best)):
                best, kind = s, "plain"
        if best:
            pos = len(w) - len(best)
            if kind == "plain":
                w = w[:pos]
            else:
                # preceded (within RV) by a non-vowel or by u
                if pos - 1 >= rv and (w[pos - 1] not in _RO_VOWELS
                                      or w[pos - 1] == "u"):
                    w = w[:pos]

    # ---- vowel suffix: longest MATCH of a/e/i/ă/ie, then a hard RV
    # check (no setlimit here — a too-early 'ie' blocks the step)
    b = None
    for s in ("ie", "a", "e", "i", "ă"):
        if w.endswith(s) and (b is None or len(s) > len(b)):
            b = s
    if b and len(w) - len(b) >= rv:
        w = w[: -len(b)]

    return w.replace("I", "i").replace("U", "u")


# --------------------------------------------------------------------------
# Turkish (Snowball turkish, Evren Kapusuz Cilden's algorithm)
#
# Suffix-stripping over nominal verb suffixes then noun suffixes, gated
# by vowel harmony, with optional buffer consonants (y/n/s) and optional
# U vowels, a recursive suffix chain behind "ki", and a post-process
# that appends a harmony U to stems ending d/g and devoices the final
# consonant (b->p c->c, d->t g<breve>->k).  Reference behavior:
# c/lib/libstemmer_c/src_c/stem_UTF_8_turkish.c (validated byte-exact
# on the ~4.5k committed goldens in tests/goldens_stems_turkish.tsv
# plus ~140k ephemeral fuzz words checked against the compiled
# reference during development).
#
# Snowball backwards-mode cursor semantics: positions are saved as
# distance-from-end, which stays valid across suffix-side deletions
# (so a "restore" after a committed slice is a cursor no-op and the
# deletion sticks, exactly like the generated C).
# --------------------------------------------------------------------------

_TR_VOWELS = set("aeıioöuü")
_TR_U = set("ıiuü")
# vowel harmony: suffix vowel -> compatible earlier vowels
_TR_HARMONY = {
    "a": set("aıou"), "e": set("eiöü"), "ı": set("aı"), "i": set("ei"),
    "o": set("ou"), "ö": set("öü"), "u": set("ou"), "ü": set("öü"),
}


class _TrCursor:
    __slots__ = ("w", "c")

    def __init__(self, w: str):
        self.w = w
        self.c = len(w)

    def dist(self) -> int:
        return len(self.w) - self.c

    def restore(self, d: int) -> None:
        self.c = len(self.w) - d

    def ends(self, s: str) -> bool:
        if self.w[: self.c].endswith(s):
            self.c -= len(s)
            return True
        return False

    def among(self, sufs: tuple) -> bool:
        # find_among_b: longest match wins (sufs pre-sorted long-first)
        for s in sufs:
            if self.ends(s):
                return True
        return False

    def goto_vowel(self, group: set) -> bool:
        # backwards `goto G`: skip left over chars not in G; stop with
        # the G char adjacent (unconsumed); fail at the limit
        i = self.c
        w = self.w
        while i > 0 and w[i - 1] not in group:
            i -= 1
        if i == 0:
            return False
        self.c = i
        return True

    def delete_to(self, ket_dist: int) -> None:
        ket = len(self.w) - ket_dist
        self.w = self.w[: self.c] + self.w[ket:]


def _tr_first(t: _TrCursor, *marks) -> bool:
    d = t.dist()
    for m in marks:
        t.restore(d)
        if m(t):
            return True
    t.restore(d)
    return False


def _tr_harmony(t: _TrCursor) -> bool:
    # check_vowel_harmony: test-only (cursor restored)
    d = t.dist()
    ok = False
    if t.goto_vowel(_TR_VOWELS):
        pair = _TR_HARMONY.get(t.w[t.c - 1])
        if pair is not None:
            t.c -= 1
            ok = t.goto_vowel(pair)
    t.restore(d)
    return ok


def _tr_opt_cons(t: _TrCursor, ch: str) -> bool:
    # mark_suffix_with_optional_{n,s,y}_consonant: if the next char is
    # ch, consume it and require a vowel before; else require (without
    # consuming) that the char before the next one is a vowel
    w, c = t.w, t.c
    if c > 0 and w[c - 1] == ch:
        if c > 1 and w[c - 2] in _TR_VOWELS:
            t.c -= 1
            return True
        return False
    return c > 1 and w[c - 2] in _TR_VOWELS


def _tr_opt_U(t: _TrCursor) -> bool:
    # mark_suffix_with_optional_U_vowel: mirror image with U vowels and
    # a required NON-vowel one further in
    w, c = t.w, t.c
    if c > 0 and w[c - 1] in _TR_U:
        if c > 1 and w[c - 2] not in _TR_VOWELS:
            t.c -= 1
            return True
        return False
    return c > 1 and w[c - 2] not in _TR_VOWELS


_TR_POSS = ("miz", "niz", "muz", "nuz", "mız", "nız", "müz", "nüz", "m", "n")
_TR_YDU = (
    "dık", "dik", "duk", "dük", "tık", "tik", "tuk", "tük",
    "dım", "dim", "dum", "düm", "tım", "tim", "tum", "tüm",
    "dın", "din", "dun", "dün", "tın", "tin", "tun", "tün",
    "dı", "di", "du", "dü", "tı", "ti", "tu", "tü",
)
_TR_YSA = ("sak", "sek", "sam", "sem", "san", "sen", "sa", "se")


def _tr_mk_possessives(t):
    d = t.dist()
    if t.among(_TR_POSS) and _tr_opt_U(t):
        return True
    t.restore(d)
    return False


def _tr_mk_sU(t):
    d = t.dist()
    if _tr_harmony(t) and t.c > 0 and t.w[t.c - 1] in _TR_U:
        t.c -= 1
        if _tr_opt_cons(t, "s"):
            return True
    t.restore(d)
    return False


def _tr_mk_lArI(t):
    return t.among(("ları", "leri"))


def _tr_mk_yU(t):
    d = t.dist()
    if _tr_harmony(t) and t.c > 0 and t.w[t.c - 1] in _TR_U:
        t.c -= 1
        if _tr_opt_cons(t, "y"):
            return True
    t.restore(d)
    return False


def _tr_mk_nU(t):
    return _tr_harmony(t) and t.among(("nı", "ni", "nu", "nü"))


def _tr_mk_nUn(t):
    d = t.dist()
    if (_tr_harmony(t) and t.among(("ın", "in", "un", "ün"))
            and _tr_opt_cons(t, "n")):
        return True
    t.restore(d)
    return False


def _tr_mk_yA(t):
    d = t.dist()
    if _tr_harmony(t) and t.among(("a", "e")) and _tr_opt_cons(t, "y"):
        return True
    t.restore(d)
    return False


def _tr_mk_nA(t):
    return _tr_harmony(t) and t.among(("na", "ne"))


def _tr_mk_DA(t):
    return _tr_harmony(t) and t.among(("da", "de", "ta", "te"))


def _tr_mk_ndA(t):
    return _tr_harmony(t) and t.among(("nda", "nde"))


def _tr_mk_DAn(t):
    return _tr_harmony(t) and t.among(("dan", "den", "tan", "ten"))


def _tr_mk_ndAn(t):
    return _tr_harmony(t) and t.among(("ndan", "nden"))


def _tr_mk_ylA(t):
    d = t.dist()
    if _tr_harmony(t) and t.among(("la", "le")) and _tr_opt_cons(t, "y"):
        return True
    t.restore(d)
    return False


def _tr_mk_ki(t):
    return t.ends("ki")


def _tr_mk_ncA(t):
    d = t.dist()
    if _tr_harmony(t) and t.among(("ca", "ce")) and _tr_opt_cons(t, "n"):
        return True
    t.restore(d)
    return False


def _tr_mk_yUm(t):
    d = t.dist()
    if (_tr_harmony(t) and t.among(("ım", "im", "um", "üm"))
            and _tr_opt_cons(t, "y")):
        return True
    t.restore(d)
    return False


def _tr_mk_sUn(t):
    return _tr_harmony(t) and t.among(("sın", "sin", "sun", "sün"))


def _tr_mk_yUz(t):
    d = t.dist()
    if (_tr_harmony(t) and t.among(("ız", "iz", "uz", "üz"))
            and _tr_opt_cons(t, "y")):
        return True
    t.restore(d)
    return False


def _tr_mk_sUnUz(t):
    return t.among(("sınız", "siniz", "sunuz", "sünüz"))


def _tr_mk_lAr(t):
    return _tr_harmony(t) and t.among(("lar", "ler"))


def _tr_mk_nUz(t):
    return _tr_harmony(t) and t.among(("nız", "niz", "nuz", "nüz"))


def _tr_mk_DUr(t):
    return _tr_harmony(t) and t.among(
        ("dır", "dir", "dur", "dür", "tır", "tir", "tur", "tür"))


def _tr_mk_cAsInA(t):
    return t.among(("casına", "cesine"))


def _tr_mk_yDU(t):
    d = t.dist()
    if _tr_harmony(t) and t.among(_TR_YDU) and _tr_opt_cons(t, "y"):
        return True
    t.restore(d)
    return False


def _tr_mk_ysA(t):
    # NOTE: no harmony check (faithful to the reference)
    d = t.dist()
    if t.among(_TR_YSA) and _tr_opt_cons(t, "y"):
        return True
    t.restore(d)
    return False


def _tr_mk_ymUs(t):
    d = t.dist()
    if (_tr_harmony(t) and t.among(("mış", "miş", "muş", "müş"))
            and _tr_opt_cons(t, "y")):
        return True
    t.restore(d)
    return False


def _tr_mk_yken(t):
    d = t.dist()
    if t.ends("ken") and _tr_opt_cons(t, "y"):
        return True
    t.restore(d)
    return False


def _tr_nominal_verb(t: _TrCursor, flags: list) -> None:
    ket = t.dist()
    flags[0] = True
    d = t.dist()
    matched = False
    # (ymUs | yDU | ysA | yken)
    if _tr_first(t, _tr_mk_ymUs, _tr_mk_yDU, _tr_mk_ysA, _tr_mk_yken):
        matched = True
    if not matched:
        t.restore(d)
        # cAsInA (person-suffix)? ymUs
        if _tr_mk_cAsInA(t):
            _tr_first(t, _tr_mk_sUnUz, _tr_mk_lAr, _tr_mk_yUm, _tr_mk_sUn,
                      _tr_mk_yUz)
            if _tr_mk_ymUs(t):
                matched = True
    if not matched:
        t.restore(d)
        # lAr, delete, try(DUr|yDU|ysA|ymUs), stop noun stemming
        if _tr_mk_lAr(t):
            t.delete_to(ket)
            ket = t.dist()
            dd = t.dist()
            if not _tr_first(t, _tr_mk_DUr, _tr_mk_yDU, _tr_mk_ysA,
                             _tr_mk_ymUs):
                t.restore(dd)
            flags[0] = False
            matched = True
    if not matched:
        t.restore(d)
        # nUz (yDU | ysA)
        if _tr_mk_nUz(t) and _tr_first(t, _tr_mk_yDU, _tr_mk_ysA):
            matched = True
    if not matched:
        t.restore(d)
        # (sUnUz|yUz|sUn|yUm), delete, try(ymUs)
        if _tr_first(t, _tr_mk_sUnUz, _tr_mk_yUz, _tr_mk_sUn, _tr_mk_yUm):
            t.delete_to(ket)
            ket = t.dist()
            dd = t.dist()
            if not _tr_mk_ymUs(t):
                t.restore(dd)
            matched = True
    if not matched:
        t.restore(d)
        # DUr, delete, try((person)? ymUs)
        if _tr_mk_DUr(t):
            t.delete_to(ket)
            ket = t.dist()
            dd = t.dist()
            _tr_first(t, _tr_mk_sUnUz, _tr_mk_lAr, _tr_mk_yUm, _tr_mk_sUn,
                      _tr_mk_yUz)
            if not _tr_mk_ymUs(t):
                t.restore(dd)
            matched = True
    if matched:
        t.delete_to(ket)


def _tr_chain_ki(t: _TrCursor) -> bool:
    ket = t.dist()
    if not _tr_mk_ki(t):
        return False
    d = t.dist()
    # alt A: DA
    if _tr_mk_DA(t):
        t.delete_to(ket)
        dd = t.dist()
        ket2 = t.dist()
        if _tr_mk_lAr(t):
            t.delete_to(ket2)
            dd2 = t.dist()
            if not _tr_chain_ki(t):
                t.restore(dd2)
        else:
            t.restore(dd)
            if _tr_mk_possessives(t):
                t.delete_to(ket2)
                dd3 = t.dist()
                ket3 = t.dist()
                if _tr_mk_lAr(t):
                    t.delete_to(ket3)
                    if not _tr_chain_ki(t):
                        t.restore(dd3)
                else:
                    t.restore(dd3)
            else:
                t.restore(dd)
        return True
    t.restore(d)
    # alt B: nUn
    if _tr_mk_nUn(t):
        t.delete_to(ket)
        dd = t.dist()
        ket2 = t.dist()
        if _tr_mk_lArI(t):
            t.delete_to(ket2)
        else:
            t.restore(dd)
            if _tr_first(t, _tr_mk_possessives, _tr_mk_sU):
                t.delete_to(ket2)
                dd2 = t.dist()
                ket3 = t.dist()
                if _tr_mk_lAr(t):
                    t.delete_to(ket3)
                    if not _tr_chain_ki(t):
                        t.restore(dd2)
                else:
                    t.restore(dd2)
            else:
                t.restore(dd)
                if not _tr_chain_ki(t):
                    t.restore(dd)
        return True
    t.restore(d)
    # alt C: ndA (required)
    if _tr_mk_ndA(t):
        dd = t.dist()
        if _tr_mk_lArI(t):
            t.delete_to(ket)
            return True
        t.restore(dd)
        if _tr_mk_sU(t):
            t.delete_to(ket)
            dd2 = t.dist()
            ket2 = t.dist()
            if _tr_mk_lAr(t):
                t.delete_to(ket2)
                if not _tr_chain_ki(t):
                    t.restore(dd2)
            else:
                t.restore(dd2)
            return True
        t.restore(dd)
        return _tr_chain_ki(t)
    return False


def _tr_noun_suffixes(t: _TrCursor) -> None:
    d = t.dist()
    ket = t.dist()
    # 1: lAr, delete, try(chain)
    if _tr_mk_lAr(t):
        t.delete_to(ket)
        dd = t.dist()
        if not _tr_chain_ki(t):
            t.restore(dd)
        return
    t.restore(d)
    # 2: ncA, delete, try(lArI,del | (poss|sU),del,try(lAr,del,chain)
    #                     | lAr,del,chain)
    if _tr_mk_ncA(t):
        t.delete_to(ket)
        dd = t.dist()
        ket2 = t.dist()
        if _tr_mk_lArI(t):
            t.delete_to(ket2)
        else:
            t.restore(dd)
            if _tr_first(t, _tr_mk_possessives, _tr_mk_sU):
                t.delete_to(ket2)
                dd2 = t.dist()
                ket3 = t.dist()
                if _tr_mk_lAr(t):
                    t.delete_to(ket3)
                    if not _tr_chain_ki(t):
                        t.restore(dd2)
                else:
                    t.restore(dd2)
            else:
                t.restore(dd)
                if _tr_mk_lAr(t):
                    t.delete_to(ket2)
                    if not _tr_chain_ki(t):
                        t.restore(dd)
                else:
                    t.restore(dd)
        return
    t.restore(d)
    # 3: (ndA|nA) (lArI,del | sU,del,try(lAr,del,chain) | chain)
    if _tr_first(t, _tr_mk_ndA, _tr_mk_nA):
        dd = t.dist()
        if _tr_mk_lArI(t):
            t.delete_to(ket)
            return
        t.restore(dd)
        if _tr_mk_sU(t):
            t.delete_to(ket)
            dd2 = t.dist()
            ket2 = t.dist()
            if _tr_mk_lAr(t):
                t.delete_to(ket2)
                if not _tr_chain_ki(t):
                    t.restore(dd2)
            else:
                t.restore(dd2)
            return
        t.restore(dd)
        if _tr_chain_ki(t):
            return
    t.restore(d)
    # 4: (ndAn|nU) (sU,del,try(lAr,del,chain) | lArI (no delete —
    #    faithful to the generated C, which returns without slicing))
    if _tr_first(t, _tr_mk_ndAn, _tr_mk_nU):
        dd = t.dist()
        if _tr_mk_sU(t):
            t.delete_to(ket)
            dd2 = t.dist()
            ket2 = t.dist()
            if _tr_mk_lAr(t):
                t.delete_to(ket2)
                if not _tr_chain_ki(t):
                    t.restore(dd2)
            else:
                t.restore(dd2)
            return
        t.restore(dd)
        if _tr_mk_lArI(t):
            return
    t.restore(d)
    # 5: DAn, delete, try(poss,del,try(lAr,del,chain)
    #                     | lAr,del,try(chain) | chain)
    if _tr_mk_DAn(t):
        t.delete_to(ket)
        dd = t.dist()
        ket2 = t.dist()
        if _tr_mk_possessives(t):
            t.delete_to(ket2)
            dd2 = t.dist()
            ket3 = t.dist()
            if _tr_mk_lAr(t):
                t.delete_to(ket3)
                if not _tr_chain_ki(t):
                    t.restore(dd2)
            else:
                t.restore(dd2)
        else:
            t.restore(dd)
            if _tr_mk_lAr(t):
                t.delete_to(ket2)
                dd3 = t.dist()
                if not _tr_chain_ki(t):
                    t.restore(dd3)
            else:
                t.restore(dd)
                if not _tr_chain_ki(t):
                    t.restore(dd)
        return
    t.restore(d)
    # 6: (nUn|ylA), delete, try(lAr,del,chain(required)
    #                          | (poss|sU),del,try(lAr,del,chain) | chain)
    if _tr_first(t, _tr_mk_nUn, _tr_mk_ylA):
        t.delete_to(ket)
        dd = t.dist()
        ok = False
        ket2 = t.dist()
        if _tr_mk_lAr(t):
            t.delete_to(ket2)
            if _tr_chain_ki(t):
                ok = True
        if not ok:
            t.restore(dd)
            ket3 = t.dist()
            if _tr_first(t, _tr_mk_possessives, _tr_mk_sU):
                t.delete_to(ket3)
                dd2 = t.dist()
                ket4 = t.dist()
                if _tr_mk_lAr(t):
                    t.delete_to(ket4)
                    if not _tr_chain_ki(t):
                        t.restore(dd2)
                else:
                    t.restore(dd2)
                ok = True
        if not ok:
            t.restore(dd)
            if not _tr_chain_ki(t):
                t.restore(dd)
        return
    t.restore(d)
    # 7: lArI, delete
    if _tr_mk_lArI(t):
        t.delete_to(ket)
        return
    t.restore(d)
    # 8: the ki chain alone
    if _tr_chain_ki(t):
        return
    t.restore(d)
    # 9: (DA|yU|yA), delete, try(((poss,del,try(lAr)) | lAr), del,
    #                            chain(else restore))
    if _tr_first(t, _tr_mk_DA, _tr_mk_yU, _tr_mk_yA):
        t.delete_to(ket)
        dd = t.dist()
        ket2 = t.dist()
        matched = False
        ket_fin = ket2
        if _tr_mk_possessives(t):
            t.delete_to(ket2)
            dd2 = t.dist()
            ket_fin = t.dist()
            if not _tr_mk_lAr(t):
                t.restore(dd2)
            matched = True
        else:
            t.restore(dd)
            if _tr_mk_lAr(t):
                matched = True
            else:
                t.restore(dd)
        if matched:
            t.delete_to(ket_fin)
            dd3 = t.dist()
            if not _tr_chain_ki(t):
                t.restore(dd3)
        return
    t.restore(d)
    # 10: (poss|sU), delete, try(lAr,del,chain)
    if _tr_first(t, _tr_mk_possessives, _tr_mk_sU):
        t.delete_to(ket)
        dd = t.dist()
        ket2 = t.dist()
        if _tr_mk_lAr(t):
            t.delete_to(ket2)
            if not _tr_chain_ki(t):
                t.restore(dd)
        else:
            t.restore(dd)


def turkish_stem(word: str) -> str:
    if sum(ch in _TR_VOWELS for ch in word) < 2:
        return word
    t = _TrCursor(word)
    flags = [True]
    _tr_nominal_verb(t, flags)
    if not flags[0]:
        # a -lAr verb form was removed: skip noun suffixes AND postlude
        return t.w
    t.c = len(t.w)
    _tr_noun_suffixes(t)
    w = t.w
    # is_reserved_word guard (the generated C's length==limit check
    # reduces to these two exact words)
    if w in ("ad", "soyad"):
        return w
    # append_U_to_stems_ending_with_d_or_g
    if w and w[-1] in "dg":
        for ch in reversed(w):
            if ch in _TR_VOWELS:
                if ch in "aı":
                    w += "ı"
                elif ch in "ei":
                    w += "i"
                elif ch in "ou":
                    w += "u"
                else:
                    w += "ü"
                break
    # post_process_last_consonants
    if w:
        last = w[-1]
        if last == "b":
            w = w[:-1] + "p"
        elif last == "c":
            w = w[:-1] + "ç"
        elif last == "d":
            w = w[:-1] + "t"
        elif last == "ğ":
            w = w[:-1] + "k"
    return w
