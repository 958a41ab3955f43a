"""Text processing functions: the engine's boilerplate-strip layer.

Re-derives the reference's text-processor semantics as Catalyst-native
column expressions wherever possible (JVM-side, whole-stage-codegen'd):

* strip                  (reference: calamari_ocr/ocr/dataset/textprocessors/basic_text_processors.py:20-35)
* NFC unicode normalize  (reference: textprocessors/text_normalizer.py:24-28)
* bidi display reorder   (reference: textprocessors/basic_text_processors.py:61-67)
* regularizer rulesets   (reference: textprocessors/text_regularizer.py:47-137,
                          rule data: calamari_ocr/resources/rulesets/*.json,
                          groups:    calamari_ocr/resources/rulegroups.json)

Ruleset *data* below is re-typed from the reference's published JSON
resources (they are declarative data, cited above, not engine code) —
including the 132-rule archaic-glyph ruleset ``uvius`` (private-use-area
scribal abbreviations), so the full ``zpd`` group runs unabridged.

Each entry: (pattern, replacement, is_regex). Rules apply **in order**;
order matters (the reference composes them as a function chain).
"""

from __future__ import annotations

import re
import unicodedata
from typing import List, Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F

Rule = Tuple[str, str, bool]

RULESETS: dict[str, List[Rule]] = {
    # reference: resources/rulesets/spaces.json
    "spaces": [
        (r"\s+", " ", True),
        (r"\n", "", True),
        (r"^\s+", "", True),
        (r"\s+$", "", True),
    ],
    # reference: resources/rulesets/quotes.json
    "quotes": [
        ('"', "''", False),
        ("`", "'", False),
        ("\u201c", "''", False),   # “
        ("\u201d", "''", False),   # ”
        ("\u00b4", "'", False),    # ´
        ("\u2018", "'", False),    # ‘
        ("\u2019", "'", False),    # ’
        ("\u201e", ",,", False),   # „
        ("\u2026", "...", False),  # …
        ("\u2032", "'", False),    # ′
        ("\u2033", "''", False),   # ″
        ("\u2034", "'''", False),  # ‴
        ("\u3003", "''", False),   # 〃
    ],
    # reference: resources/rulesets/punctuation.json
    "punctuation": [
        (r"(\S)(\s*)([.,:;?!])(\s*)(\S)", r"\1\3 \5", True),
    ],
    # reference: resources/rulesets/various.json
    "various": [
        ("\u00b5", "\u03bc", False),  # µ -> μ
        ("\u2013", "-", False),       # –
        ("\u2014", "-", False),       # —
        ("\u00ac", "-", False),       # ¬
    ],
    # reference: resources/rulesets/roman_digits.json
    "roman_digits": [
        (c, r_, False)
        for c, r_ in list(
            zip(
                "\u2160\u2161\u2162\u2163\u2164\u2165\u2166\u2167\u2168\u2169\u216a\u216b\u216c\u216d\u216e\u216f",
                ["I", "II", "III", "IV", "V", "VI", "VII", "VIII", "IX", "X", "XI", "XII", "L", "C", "D", "M"],
            )
        )
        + list(
            zip(
                "\u2170\u2171\u2172\u2173\u2174\u2175\u2176\u2177\u2178\u2179\u217a\u217b\u217c\u217d\u217e\u217f",
                ["i", "ii", "iii", "iv", "v", "vi", "vii", "viii", "ix", "x", "xi", "xii", "l", "c", "d", "m"],
            )
        )
    ],
    # reference: resources/rulesets/ligatures_consonantal.json
    "ligatures_consonantal": [
        ("\ua738", "AV", False), ("\ua739", "av", False),
        ("\ua73a", "AV", False), ("\ua73b", "av", False),
        ("\ua73c", "AY", False), ("\ua73d", "ay", False),
        ("\U0001f670", "et", False),
        ("\ufb00", "ff", False), ("\ufb03", "ffi", False), ("\ufb04", "ffl", False),
        ("\ufb02", "fl", False), ("\ufb01", "fi", False),
        ("\ufb06", "st", False), ("\ufb05", "\u017ft", False),
        ("\ua728", "TZ", False), ("\ua729", "tz", False),
        ("\ua760", "VY", False), ("\ua761", "vy", False),
    ],
    # reference: resources/rulesets/uvius.json (132 raw rules, re-typed
    # mechanically from the published JSON; private-use-area scribal
    # abbreviations and medieval glyph normalizations for the UVius font
    # corpora — applied LAST within the zpd group, matching
    # resources/rulegroups.json order)
    "uvius": [
        ("''", "\"", False),
        ("\ua75b", "r", False),
        ("I", "J", False),
        ("\u2e0d", "/", False),
        ("q\u0308", "q\u1dd3", False),
        ("&c\u0308", "&c\u1dd3", False),
        ("\u1e21", "g\u1dd3", False),
        ("v\u0309", "v\u1de3", False),
        ("v\u1dce", "v\u1de3", False),
        ("b\u1dce", "b\u1de3", False),
        ("p\u1dce", "p\u1de3", False),
        ("d\u0309", "\u00f0", False),
        ("\ua75f", "v\u1de3", False),
        ("t\u1de3", "t\u1dd1", False),
        ("\u019e", "n", False),
        ("\ue066", "C\u0323", False),
        ("\ue1dc", "N\u0303", False),
        ("\ue282", "Q\u0307", False),
        ("\ue42c", "a\u0364", False),
        ("\ue491", "\u0111", False),
        ("\ue4e1", "e\u0363", False),
        ("\ue5b8", "m\u0303", False),
        ("\ue5d2", "m\u0303", False),
        ("\ue5dc", "\u00f1", False),
        ("\ue644", "o\u0364", False),
        ("\ue665", "p\u0303", False),
        ("\ue681", "q\u0303", False),
        ("\ue68b", "\ua757\u0303", False),
        ("\ue6e2", "t\u0301", False),
        ("\ue72b", "u\u0364", False),
        ("\ue72d", "\u016f", False),
        ("\ue73a", "v\u0301", False),
        ("\ue781", "y\u0364", False),
        ("\ue8b7", "\u00df", False),
        ("\ue8ba", "\ua75f", False),
        ("\ue8bf", "q;", False),
        ("\ueada", "\u017ft", False),
        ("\ueba2", "\u017fi", False),
        ("\ueba3", "\u017fl", False),
        ("\ueba5", "\u017fp", False),
        ("\ueba6", "\u017f\u017f", False),
        ("\ueba7", "\u017f\u017fi", False),
        ("\uebac", "\u00df", False),
        ("\uebe3", "j\u0308", False),
        ("\ueec4", "ck", False),
        ("\ueec5", "ct", False),
        ("\ueecb", "ft", False),
        ("\ueed6", "pp", False),
        ("\ueed7", "\ua753p", False),
        ("\ueedc", "tz", False),
        ("\uefa1", "\u00e6", False),
        ("q\uf02f", "q\u0365", False),
        ("\uf158", "\u204a", False),
        ("\uf159", "\u00f0", False),
        ("\uf160", "?", False),
        ("\uf161", ":", False),
        ("\uf1a5", "\ua770", False),
        ("\uf1a6", "\ua770", False),
        ("\uf1ac", ";", False),
        ("t\uf1cc", "t\u1dd1", False),
        ("\uf220", "i", False),
        ("\uf223", "m", False),
        ("\uf2ae", "\u2619", False),
        ("\uf2ea", "\u2114", False),
        ("\uf4f9", "ll", False),
        ("\uf4fc", "\u017fk", False),
        ("\uf4ff", "\u017f\u017ft", False),
        ("\uf500", "a\u0363", False),
        ("\uf501", "c\u0303", False),
        ("\uf502", "ch", False),
        ("\uf504", "g\u030a", False),
        ("\uf505", "g\u0303", False),
        ("\uf506", "h\u030a", False),
        ("\uf507", "p\u0303", False),
        ("\uf508", "q\u030a", False),
        ("\uf509", "q\u0303;", False),
        ("\uf50a", "d\\'", False),
        ("\uf50b", "l\\'", False),
        ("\uf50c", "q\u0301;", False),
        ("\uf50d", "q\u0301;", False),
        ("\uf50e", "q\u0301", False),
        ("\uf50f", "q\u0303", False),
        ("\uf510", "r\u0303", False),
        ("\uf511", "s\u0303", False),
        ("\uf512", "t\u1dd1", False),
        ("\uf513", "v\u0306", False),
        ("\uf514", "w\u0306", False),
        ("\uf515", "&", False),
        ("\uf516", "z\u0303", False),
        ("\uf517", "c\u0303", False),
        ("\uf518", "r\u0303", False),
        ("\uf519", "m\u0303", False),
        ("\uf51a", "\ua759\u1dd3", False),
        ("\uf51b", "\u00f0", False),
        ("\uf51d", "z\u1de3", False),
        ("\uf51e", "\u017f\u0142", False),
        ("\uf51f", "p\u1dd3", False),
        ("\uf520", "\u2184\u0308", False),
        ("\uf522", "c\u1dd3", False),
        ("\uf523", "q\u1dd3", False),
        ("\uf524", "b\u1de3", False),
        ("\uf525", "h\u1de3", False),
        ("\uf526", "p\u1de3", False),
        ("\uf527", "v\u1de3", False),
        ("\uf52a", "y\u1de3", False),
        ("\uf52b", "y\u036d", False),
        ("\uf52c", "sp", False),
        ("\uf52d", "\u2114", False),
        ("\uf52f", "q\u1dd3;", False),
        ("\uf530", "s\u1dd3", False),
        ("\uf531", "Ca", False),
        ("\uf532", "as", False),
        ("\uf533", "is", False),
        ("\uf534", "us", False),
        ("\uf535", "Qu", False),
        ("\uf536", "ra", False),
        ("\uf537", "ta", False),
        ("\uf538", "\u2235", False),
        ("\u0101", "a\u0303", False),
        ("\u0113", "\u1ebd", False),
        ("\u012b", "\u0129", False),
        ("\u014d", "\u00f5", False),
        ("\u016b", "\u0169", False),
        ("c\u0304", "c\u0303", False),
        ("q\u0304", "q\u0303", False),
        ("r\u0304", "r\u0303", False),
        ("z", "\u0292", False),
        ("Z", "\u01b7", False),
        ("a\u0364", "\u00e4", False),
        ("o\u0364", "\u00f6", False),
        ("u\u0364", "\u00fc", False),
        ("\u2737", "*", False),
    ],
    # reference: resources/rulesets/ligatures_vocal.json
    "ligatures_vocal": [
        ("\ua732", "AA", False), ("\ua733", "aa", False),
        ("\u00c6", "AE", False), ("\u00e6", "ae", False),
        ("\ua734", "AO", False), ("\ua735", "ao", False),
        ("\ua736", "AU", False), ("\ua737", "au", False),
        ("\u0152", "OE", False), ("\u0153", "oe", False),
        ("\ua74e", "OO", False), ("\ua74f", "oo", False),
        ("\u1d6b", "ue", False),
    ],
}

# reference: resources/rulegroups.json (full zpd incl. uvius)
RULEGROUPS: dict[str, List[str]] = {
    "no": [],
    "simple": ["spaces", "various"],
    "extended": ["quotes", "spaces", "roman_digits", "various"],
    "all": list(RULESETS.keys()),
    "zpd": ["quotes", "spaces", "roman_digits", "ligatures_consonantal", "various", "punctuation", "uvius"],
}


def _resolve(rulesets: List[str] | None, rulegroups: List[str] | None) -> List[Rule]:
    rules: List[Rule] = []
    for g in rulegroups or []:
        for name in RULEGROUPS[g]:
            rules.extend(RULESETS[name])
    for name in rulesets or []:
        if name == "*":
            for rs in RULESETS.values():
                rules.extend(rs)
        else:
            rules.extend(RULESETS[name])
    return rules


# ---------------------------------------------------------------------------
# Python-side (for UDF paths + unit tests; exact reference semantics)
# ---------------------------------------------------------------------------

def regularize_str(txt: str, rulesets: List[str] | None = None, rulegroups: List[str] | None = None) -> str:
    """Apply rulesets in order (reference: text_regularizer.py:69-74)."""
    if rulesets is None and rulegroups is None:
        rulesets = ["spaces"]
    for old, new, is_regex in _resolve(rulesets, rulegroups):
        if is_regex:
            txt = re.sub(old, new, txt)
        else:
            txt = txt.replace(old, new)
    return txt


def nfc_str(txt: str) -> str:
    """reference: text_normalizer.py:24-28 (unicodedata.normalize NFC)."""
    return unicodedata.normalize("NFC", txt)


def bidi_str(txt: str, direction: str = "auto") -> str:
    """Unicode bidi display reordering (reference wraps python-bidi,
    basic_text_processors.py:61-67; lib absent here). Minimal re-derivation
    of UAX#9 sufficient for L-dominant corpora: contiguous runs of
    strong-RTL characters (and embedded neutrals) are reversed; pure-LTR
    text is returned unchanged."""
    def is_rtl(ch: str) -> bool:
        return unicodedata.bidirectional(ch) in ("R", "AL", "AN")

    if not any(is_rtl(c) for c in txt):
        return txt
    out: List[str] = []
    run: List[str] = []
    for ch in txt:
        if is_rtl(ch) or (run and unicodedata.bidirectional(ch) in ("NSM", "ON", "CS", "ES")):
            run.append(ch)
        else:
            out.extend(reversed(run))
            run = []
            out.append(ch)
    out.extend(reversed(run))
    return "".join(out)


# ---------------------------------------------------------------------------
# Catalyst-side (JVM, codegen'd — the scale path; no Python in the loop)
# ---------------------------------------------------------------------------

def _java_repl(repl: str) -> str:
    """Python backrefs \\1 -> Java $1 for Spark regexp_replace."""
    return re.sub(r"\\(\d)", r"$\1", repl)


def regularize_column(col: Column, rulesets: List[str] | None = None,
                      rulegroups: List[str] | None = None) -> Column:
    """Chain of native regexp_replace/replace expressions — whole-stage
    codegen keeps this entirely JVM-side at 100 TB scale."""
    if rulesets is None and rulegroups is None:
        rulesets = ["spaces"]
    for old, new, is_regex in _resolve(rulesets, rulegroups):
        if is_regex:
            col = F.regexp_replace(col, old, _java_repl(new))
        else:
            col = F.replace(col, F.lit(old), F.lit(new))
    return col


def str_to_char_list(txt: str, charset: List[str]) -> List[str]:
    """Greedy longest-match tokenization of a string into (possibly
    multi-char) codec symbols (reference: textprocessors/str_to_char_list.py
    :20-41). Raises on unmatchable input like the reference."""
    by_len = sorted((c for c in charset if c), key=len, reverse=True)
    out: List[str] = []
    i = 0
    while i < len(txt):
        for sym in by_len:
            if txt.startswith(sym, i):
                out.append(sym)
                i += len(sym)
                break
        else:
            raise ValueError(f"no charset symbol matches {txt[i:]!r} at {i}")
    return out


def _sql_apply(expr: str, rules: List[Rule]) -> str:
    """Wrap `expr` in the ordered replace/regexp_replace chain for `rules`."""
    for old, new, is_regex in rules:
        # DuckDB string literals pass backslashes through to RE2
        # verbatim ('\s+' stays \s+); only quotes need escaping
        o = old.replace("'", "''")
        n = new.replace("'", "''")
        if is_regex:
            expr = f"regexp_replace({expr}, '{o}', '{n}', 'g')"
        else:
            expr = f"replace({expr}, '{o}', '{n}')"
    return expr


def regularize_sql(col_expr: str, rulesets: List[str] | None = None,
                   rulegroups: List[str] | None = None) -> str:
    """Render the same ordered rule chain as ANSI/DuckDB SQL — generated
    from the SAME rule data as the Spark/Python paths, so the three stay in
    lockstep by construction (this is the oracle side of the regularizer
    queries)."""
    if rulesets is None and rulegroups is None:
        rulesets = ["spaces"]
    return _sql_apply(col_expr, _resolve(rulesets, rulegroups))


def regularize_sql_chunks(col_name: str, rulesets: List[str] | None = None,
                          rulegroups: List[str] | None = None,
                          chunk: int = 60) -> List[str]:
    """The same ordered chain as a list of SQL expressions, each applying at
    most `chunk` rules to column `col_name`, for composition as successive
    CTE stages — DuckDB's expression binder caps nesting at 128 calls, which
    the full zpd group (~192 rules incl. uvius) exceeds in a single
    expression."""
    if rulesets is None and rulegroups is None:
        rulesets = ["spaces"]
    rules = _resolve(rulesets, rulegroups)
    return [
        _sql_apply(col_name, rules[i:i + chunk])
        for i in range(0, len(rules), chunk)
    ] or [col_name]


def strip_column(col: Column) -> Column:
    """reference: basic_text_processors.py:20-35 (str.strip)."""
    return F.regexp_replace(F.regexp_replace(col, r"^\s+", ""), r"\s+$", "")


# The spaces ruleset (reference: resources/rulesets/spaces.json) as applied
# by both engines, in order — the canonical definition shared by every
# plans module and its oracle SQL.
SPACES_RULES = [(r"\s+", " "), (r"^\s+", ""), (r"\s+$", "")]

REG_SPACES_SQL = (
    "regexp_replace(regexp_replace(regexp_replace(text, '\\s+', ' ', 'g'),"
    " '^\\s+', ''), '\\s+$', '')"
)


def regularized_spaces_col(col: Column) -> Column:
    for pat, rep in SPACES_RULES:
        col = F.regexp_replace(col, pat, rep)
    return col


def nfc_column(col: Column) -> Column:
    """NFC normalization. Spark has no native NFC; use a pandas UDF only
    when the corpus can contain decomposed sequences — for ASCII-clean
    corpora this is the identity and we keep it JVM-side."""
    from calamari_spark.functions.arrow import series_udf

    def _nfc(s):
        return s.map(lambda t: unicodedata.normalize("NFC", t) if t is not None else None)

    return series_udf(_nfc, "string")(col)


# ---------------------------------------------------------------------------
# HTML boilerplate strip (main-content extraction; the north rule's
# "HTML boilerplate strip / DOM heuristics" surface)
# ---------------------------------------------------------------------------

# Ordered regex rules, ONE list driving the Spark chain, the Python twin,
# and the DuckDB oracle (RE2-safe subset: no backreferences/lookarounds;
# inline (?is) = dotall + case-insensitive works in both engines). The DOM
# heuristic is the classic container blocklist: script/style/comments go
# first (their CONTENT is never text), then chrome containers
# (nav/header/footer/aside — boilerplate by role), then every remaining
# tag collapses to a space.
HTML_BOILERPLATE_RULES = [
    (r"(?is)<head\b[^>]*>.*?</head>", " "),
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?is)<!--.*?-->", " "),
    (r"(?is)<nav\b[^>]*>.*?</nav>", " "),
    (r"(?is)<header\b[^>]*>.*?</header>", " "),
    (r"(?is)<footer\b[^>]*>.*?</footer>", " "),
    (r"(?is)<aside\b[^>]*>.*?</aside>", " "),
    (r"(?s)<[^>]+>", " "),
]

# entity decode AFTER tag strip (so &lt;b&gt; stays literal text, the
# standard order); &amp; decodes LAST so "&amp;lt;" yields "&lt;", not "<"
HTML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

_WS_COLLAPSE = (r"\s+", " ")


def html_strip_str(html: str) -> str:
    """Python twin (unit tests / property tests)."""
    out = html
    for pat, rep in HTML_BOILERPLATE_RULES:
        out = re.sub(pat, rep, out)
    for ent, ch in HTML_ENTITIES:
        out = out.replace(ent, ch)
    out = re.sub(*_WS_COLLAPSE, out).strip()
    return out


def html_strip_col(col: Column) -> Column:
    """Native Catalyst chain — JVM regex, whole-stage-codegen'd, no Python
    in the loop (the same shape as the regularizer rulesets)."""
    for pat, rep in HTML_BOILERPLATE_RULES:
        col = F.regexp_replace(col, pat, rep)
    for ent, ch in HTML_ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    col = F.regexp_replace(col, *_WS_COLLAPSE)
    return F.trim(col)


def html_strip_sql(expr: str) -> str:
    """The identical chain as a DuckDB expression (regexp_replace needs the
    explicit 'g' option there — it replaces only the first match without)."""
    out = expr
    for pat, rep in HTML_BOILERPLATE_RULES:
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{rep}', 'g')"
    for ent, ch in HTML_ENTITIES:
        c = ch.replace("'", "''")
        out = f"replace({out}, '{ent}', '{c}')"
    return f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"
