"""Dialect-neutral SQL expressions for text analysis.

Shared by the Spark operators (via F.expr -> JVM codegen) and the DuckDB
oracles, so both engines compute identical metrics.  All expressions use
only arithmetic + length/replace/lower/substr/md5, which behave
identically in Spark SQL and DuckDB.
"""

from __future__ import annotations

SPARK = "spark"
DUCKDB = "duckdb"


def token_count_sql(text: str) -> str:
    """Whitespace token count as pure arithmetic: #spaces + 1 (0 for
    empty strings)."""
    return (
        f"(CASE WHEN length({text}) = 0 THEN 0 "
        f"ELSE length({text}) - length(replace({text}, ' ', '')) + 1 END)"
    )


def bpe_token_count_sql(text: str, dialect: str) -> str:
    """BPE-ish subword-unit count: alphabetic runs + digit runs + one
    token per ASCII punctuation character (the pre-tokenizer split every
    BPE implementation starts from).

    The punctuation class is explicit ASCII hex ranges — a negated class
    like [^A-Za-z0-9 ] would diverge between engines on astral-plane
    characters (Java regex counts UTF-16 code units, RE2 counts code
    points), so non-ASCII characters are counted by NEITHER engine.
    Verified identical for emoji / combining-accent inputs."""
    if dialect == SPARK:
        # Spark SQL string literals process backslash escapes: double them
        # so the regex engine receives \xNN
        pat = "[A-Za-z]+|[0-9]+|[\\\\x21-\\\\x2f\\\\x3a-\\\\x40\\\\x5b-\\\\x60\\\\x7b-\\\\x7e]"
        return f"size(regexp_extract_all({text}, '{pat}', 0))"
    pat = "[A-Za-z]+|[0-9]+|[\\x21-\\x2f\\x3a-\\x40\\x5b-\\x60\\x7b-\\x7e]"
    return f"len(regexp_extract_all({text}, '{pat}'))"


def bpe_word_extract_sql(text: str, dialect: str) -> str:
    """Lowercase alphabetic runs as an array — the word inventory BPE
    merge learning trains on.  Restricting to [a-z]+ keeps every symbol
    single-byte, so the spaced-symbol representation below is exact on
    both engines (no UTF-16 vs code-point divergence)."""
    if dialect == SPARK:
        return f"regexp_extract_all(lower({text}), '[a-z]+', 0)"
    return f"regexp_extract_all(lower({text}), '[a-z]+')"


def bpe_spaced_sql(word: str, dialect: str) -> str:
    """A word as its DOUBLE-space-separated symbol string with double
    leading/trailing spaces — '  h  e  l  l  o  '.  A merge pair is then
    the single-space-bounded substring ' l  r ' whose boundary spaces
    are the INNER space of each neighboring double separator, so
    replace() consuming its match still leaves one space on each side:
    consecutive occurrences stay matchable, and the result reproduces
    classic BPE's left-to-right non-overlapping merge order EXACTLY —
    including runs ('a a a a' with merge (a,a) -> 'aa aa', which a
    single-space representation gets wrong because the shared separator
    is consumed by the first match)."""
    if dialect == SPARK:
        return f"concat(' ', regexp_replace({word}, '(.)', ' $1 '), ' ')"
    return f"concat(' ', regexp_replace({word}, '(.)', ' \\1 ', 'g'), ' ')"


def bpe_merge_apply_sql(s: str, left: str, right: str) -> str:
    """Apply one learned merge to a double-spaced symbol string: replace
    every non-overlapping ' left  right ' (single boundary spaces,
    double inner) with ' leftright ' — the double-separator invariant is
    restored by the spaces the match did NOT consume.  left/right are
    SQL string expressions (usually quoted literals of [a-z]+ symbols).
    Identical text on both engines (concat/replace only)."""
    return (
        f"replace({s}, concat(' ', {left}, '  ', {right}, ' '), "
        f"concat(' ', {left}, {right}, ' '))"
    )


def spaced_symbol_count_sql(s: str, dialect: str) -> str:
    """Symbol count of a double-spaced symbol string '  a  b  ':
    (space count - 2) / 2 — pure arithmetic, both engines (the division
    is exact, but integer-DIV'd anyway to keep the type integral)."""
    n_sp = f"(length({s}) - length(replace({s}, ' ', '')))"
    return idiv_sql(f"({n_sp} - 2)", "2", dialect)


def char_count_sql(text: str, ch: str) -> str:
    """Occurrences of a single character."""
    return f"(length({text}) - length(replace({text}, '{ch}', '')))"


def word_occurrences_sql(text: str, word: str) -> str:
    """Non-overlapping occurrences of ' word ' in ' text ' (both engines
    use left-to-right non-overlapping replace)."""
    padded = f"concat(' ', {text}, ' ')"
    pat = f"' {word} '"
    return (
        f"((length({padded}) - length(replace({padded}, {pat}, ''))) "
        f"/ {len(word) + 2})"
    )


def quality_score_sql(text: str) -> str:
    """Deterministic quality heuristic scaled to millionths (BIGINT):
    length component, punctuation ratio and mean token length.  FLOOR into
    integer space — ROUND/CAST of doubles differ between engines
    (half-up vs half-even) at exact half-decimals, FLOOR never does."""
    toks = token_count_sql(text)
    punct = f"({char_count_sql(text, '.')} + {char_count_sql(text, ',')})"
    raw = (
        f"(LEAST(1.0, CAST({toks} AS DOUBLE) / 64.0) * 0.5 "
        f"+ LEAST(1.0, CAST({punct} AS DOUBLE) * 8.0 "
        f"/ (CAST({toks} AS DOUBLE) + 1.0)) * 0.2 "
        f"+ LEAST(1.0, (CAST(length({text}) AS DOUBLE) "
        f"/ (CAST({toks} AS DOUBLE) + 1.0)) / 8.0) * 0.3)"
    )
    return f"CAST(FLOOR({raw} * 1000000.0) AS BIGINT)"


_EN_MARKERS = ["the", "and", "of", "a", "to", "in"]


def langid_score_sql(text: str, markers=None) -> str:
    """English-marker token density x 1e6, as an integer (no float div
    ambiguity)."""
    markers = markers or _EN_MARKERS
    occ = " + ".join(word_occurrences_sql(f"lower({text})", m) for m in markers)
    toks = token_count_sql(text)
    return f"CAST(FLOOR((({occ}) * 1000000.0) / ({toks} + 1)) AS BIGINT)"


def md5_prefix_int_sql(s: str, dialect: str) -> str:
    """First 15 hex digits of md5 as a BIGINT (60 bits) — a deterministic
    cross-engine string hash / document fingerprint."""
    if dialect == SPARK:
        return f"CAST(conv(substr(md5({s}), 1, 15), 16, 10) AS BIGINT)"
    return f"CAST(concat('0x', substr(md5({s}), 1, 15)) AS BIGINT)"


# characters normalize_text_sql folds to a space: ASCII punctuation that
# commonly varies between near-identical documents, plus tab/newline/CR.
# Built from chr() codes so the generated SQL never needs quote escaping
# (' and \ are in the set).
_NORM_FOLD_CODES = [
    1, 2,  # the collapse-marker bytes — folding them FIRST makes the
    #        chr(1)chr(2) marker unreachable even in hostile input (a
    #        document containing raw \x01\x02 must not corrupt collapse)
    9, 10, 13,  # tab, LF, CR
    33, 34, 39, 40, 41, 44, 45, 46, 47,  # ! " ' ( ) , - . /
    58, 59, 63, 91, 92, 93, 123, 125,  # : ; ? [ \ ] { }
]


def normalize_text_sql(text: str) -> str:
    """Casefold + punctuation/control fold + whitespace collapse + trim,
    WITHOUT regex (Java regex and RE2 diverge on enough inputs that
    regexp_replace is banned from cross-engine paths).

    Whitespace collapse uses the classic 3-pass marker trick — every run
    of spaces collapses to one in exactly three left-to-right replaces,
    which Spark and DuckDB both implement non-overlapping left-to-right:
      1. ' '   -> ' M'   (M = chr(1)chr(2), unreachable in real text)
      2. 'M '  -> ''     (kills all but the last marker of a run)
      3. 'M'   -> ''
    Identical SQL text runs on both engines (translate/chr/repeat/replace
    agree everywhere)."""
    folded = "concat(" + ", ".join(f"chr({c})" for c in _NORM_FOLD_CODES) + ")"
    lowered = f"translate(lower({text}), {folded}, repeat(' ', {len(_NORM_FOLD_CODES)}))"
    m = "concat(chr(1), chr(2))"
    s1 = f"replace({lowered}, ' ', concat(' ', {m}))"
    s2 = f"replace({s1}, concat({m}, ' '), '')"
    s3 = f"replace({s2}, {m}, '')"
    return f"trim({s3})"


# ---------------------------------------------------------------------------
# PII redaction (r6): regex scrub of emails / SSNs / phones / IPv4s.
#
# Cross-engine regex discipline (the bpe_token_count_sql class): explicit
# ASCII character classes only — no \d/\w/\s shorthand (Unicode-scope
# differences), no \b (Java is Unicode-word-aware, RE2 is ASCII), no
# lookaround or backreferences (RE2 has neither).  Greedy quantifiers and
# alternation are leftmost-first in BOTH Java regex and RE2's Perl mode,
# so match extents agree.  Patterns apply IN ORDER, each to the output of
# the previous redaction — counts are per-step, so overlapping pattern
# families never double-count.
# ---------------------------------------------------------------------------

PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    ("phone", r"\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}", "<PHONE>"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
]


def _pii_lit(pat: str, dialect: str) -> str:
    """Regex pattern as a SQL string literal body: Spark literals process
    backslash escapes (double them so the regex engine sees \\.); DuckDB
    follows the SQL standard (backslash is literal)."""
    if "'" in pat:
        raise ValueError("PII patterns must not contain single quotes")
    return pat.replace("\\", "\\\\") if dialect == SPARK else pat


def _pii_patterns(patterns):
    pats = PII_PATTERNS if patterns is None else list(patterns)
    if not pats:
        raise ValueError("patterns must be non-empty")
    return pats


def redact_pii_sql(text: str, dialect: str, patterns=None) -> str:
    """The redacted text: patterns replaced by their tokens, applied in
    order (nested regexp_replace — Spark's 3-arg form is global; DuckDB
    needs the 'g' option)."""
    cur = text
    for _name, pat, tok in _pii_patterns(patterns):
        p = _pii_lit(pat, dialect)
        if dialect == SPARK:
            cur = f"regexp_replace({cur}, '{p}', '{tok}')"
        else:
            cur = f"regexp_replace({cur}, '{p}', '{tok}', 'g')"
    return cur


def pii_count_sql(text: str, dialect: str, patterns=None) -> str:
    """Total number of redacted matches (BIGINT): each pattern counted on
    the text AFTER all earlier patterns were redacted — the same
    left-to-right pipeline as redact_pii_sql, so count k is exactly the
    number of <token-k> insertions."""
    terms = []
    cur = text
    for _name, pat, tok in _pii_patterns(patterns):
        p = _pii_lit(pat, dialect)
        if dialect == SPARK:
            terms.append(f"regexp_count({cur}, '{p}')")
            cur = f"regexp_replace({cur}, '{p}', '{tok}')"
        else:
            terms.append(f"len(regexp_extract_all({cur}, '{p}'))")
            cur = f"regexp_replace({cur}, '{p}', '{tok}', 'g')"
    return "CAST((" + " + ".join(terms) + ") AS BIGINT)"


MINHASH_P = 2147483647
# (a, b) pairs for the universal-hash family h_k(x) = (a*x + b) mod p
MINHASH_COEFFS = [
    (1103515245, 12345),
    (214013, 2531011),
    (69069, 362437),
    (1664525, 1013904223),
]


def minhash_word_hash_sql(word: str, dialect: str) -> str:
    return f"({md5_prefix_int_sql(word, dialect)} % {MINHASH_P})"


def minhash_coeffs(k: int) -> list[tuple[int, int]]:
    """First k (a, b) pairs of the universal-hash family — the fixed 4
    above (gate-stable), then deterministic LCG-derived extras for any
    wider signature.  a*wh stays < 2^62 (both factors < 2^31), BIGINT-safe
    in Spark and DuckDB alike."""
    out = list(MINHASH_COEFFS[:k])
    x = 0x9E3779B9
    while len(out) < k:
        x = (x * 1664525 + 1013904223) & 0xFFFFFFFF
        a = (x % (MINHASH_P - 2)) + 1
        x = (x * 1664525 + 1013904223) & 0xFFFFFFFF
        b = x % MINHASH_P
        out.append((a, b))
    return out


def minhash_sigs_sql(wh: str, k: int = 4) -> list[str]:
    """k signature expressions over a word-hash column expression."""
    return [
        f"MIN(({a} * {wh} + {b}) % {MINHASH_P})" for a, b in minhash_coeffs(k)
    ]


# ---------------------------------------------------------------------------
# Line-level quality signals (r6): the Gopher/C4-style repetition filters
# over a document's LINES (duplicate-line fraction and the fraction of
# line characters inside duplicated lines).  Dialect-split only where the
# engines name things differently (size/len, array_/list_, sequence/
# generate_series, DIV///); every metric is pure integer arithmetic or
# adjacency over a SORTED line array, so both engines agree bit-for-bit.
# ---------------------------------------------------------------------------


def idiv_sql(num: str, den: str, dialect: str) -> str:
    """Integer division of non-negative BIGINT expressions.  Spark needs
    binary DIV (see text.py _floordiv_sql: unary minus would promote to
    DOUBLE, but all callers here are non-negative); DuckDB uses //."""
    op = "DIV" if dialect == SPARK else "//"
    return f"(({num}) {op} ({den}))"


def lines_array_sql(text: str, dialect: str) -> str:
    """Non-empty trimmed lines of a document as an array expression.
    Lines split on LF only (CRLF input leaves a trailing CR on each line
    — callers normalizing foreign line endings should translate CR away
    first); trim strips spaces only, per both engines' default trim."""
    if dialect == SPARK:
        return (
            f"filter(transform(split({text}, chr(10)), x -> trim(x)), "
            f"x -> length(x) > 0)"
        )
    return (
        f"list_filter(list_transform(string_split({text}, chr(10)), "
        f"x -> trim(x)), x -> length(x) > 0)"
    )


def dup_line_ppm_sql(lines: str, dialect: str) -> str:
    """1 - distinct_lines/total_lines as FLOOR-ppm over a lines-array
    expression (0 for documents with no non-empty lines).  Pure integer
    arithmetic: (n - nd) * 1e6 DIV n."""
    ln = "size" if dialect == SPARK else "len"
    dist = "array_distinct" if dialect == SPARK else "list_distinct"
    n = f"{ln}({lines})"
    nd = f"{ln}({dist}({lines}))"
    frac = idiv_sql(f"CAST(({n}) - ({nd}) AS BIGINT) * 1000000", n, dialect)
    return f"(CASE WHEN {n} >= 1 THEN {frac} ELSE 0 END)"


def line_chars_sql(lines: str, dialect: str) -> str:
    """Total characters across a lines-array expression (BIGINT, 0 for
    empty arrays)."""
    if dialect == SPARK:
        return f"aggregate({lines}, 0L, (acc, x) -> acc + length(x))"
    return (
        f"COALESCE(CAST(list_sum(list_transform({lines}, "
        f"x -> length(x))) AS BIGINT), 0)"
    )


def dup_line_chars_sql(srt: str, dialect: str) -> str:
    """Characters inside lines that occur >= 2 times, over a SORTED
    lines-array expression: a sorted element is part of a duplicate group
    iff it equals a neighbour.  O(L log L) via the sort, no self-join;
    the sort ORDER itself is irrelevant (any total order makes equal
    elements adjacent), so Spark/DuckDB collation differences cannot
    matter."""
    if dialect == SPARK:
        n = f"size({srt})"
        body = (
            f"aggregate(transform(sequence(1, {n}), "
            f"i -> CASE WHEN (i > 1 AND element_at({srt}, i) = "
            f"element_at({srt}, i-1)) OR (i < {n} AND element_at({srt}, i) "
            f"= element_at({srt}, i+1)) THEN length(element_at({srt}, i)) "
            f"ELSE 0 END), 0L, (acc, x) -> acc + x)"
        )
        # sequence(1, 0) steps DOWNWARD in Spark (see text.ngram_array) —
        # guard the empty-array case explicitly
        return f"(CASE WHEN {n} >= 1 THEN {body} ELSE 0L END)"
    n = f"len({srt})"
    return (
        f"COALESCE(CAST(list_sum(list_transform(generate_series(1, {n}), "
        f"i -> CASE WHEN (i > 1 AND {srt}[i] = {srt}[i-1]) OR "
        f"(i < {n} AND {srt}[i] = {srt}[i+1]) "
        f"THEN length({srt}[i]) ELSE 0 END)) AS BIGINT), 0)"
    )


def sort_array_sql(arr: str, dialect: str) -> str:
    return f"array_sort({arr})" if dialect == SPARK else f"list_sort({arr})"


# ---------------------------------------------------------------------------
# Markup stripping (r6): HTML/XML tag removal + minimal entity decode +
# whitespace collapse.  The tag regex <[^>]*> is a single-ASCII-char
# negated class — identical extents in Java regex and RE2 (leftmost
# greedy, no shorthand classes); unclosed trailing '<' survives on both.
# Entities decode AFTER tag strip, &amp; LAST (so '&amp;lt;' becomes the
# literal '&lt;', never '<').
# ---------------------------------------------------------------------------

_TAG_PATTERN = "<[^>]*>"

# (entity, chr codes of the replacement) — chr() composition keeps quotes
# and ampersands out of the generated SQL literals
MARKUP_ENTITIES = [
    ("&lt;", [60]),
    ("&gt;", [62]),
    ("&quot;", [34]),
    ("&#39;", [39]),
    ("&nbsp;", [32]),
    ("&amp;", [38]),  # must stay last
]


def collapse_ws_sql(expr: str) -> str:
    """Fold tab/LF/CR to spaces, collapse space runs to one, trim — the
    normalize_text_sql 3-pass marker trick, shared SQL text on both
    engines (see that docstring for why chr(1)chr(2) is unreachable)."""
    folded = f"translate({expr}, concat(chr(1), chr(2), chr(9), chr(10), chr(13)), repeat(' ', 5))"
    m = "concat(chr(1), chr(2))"
    s1 = f"replace({folded}, ' ', concat(' ', {m}))"
    s2 = f"replace({s1}, concat({m}, ' '), '')"
    s3 = f"replace({s2}, {m}, '')"
    return f"trim({s3})"


def strip_markup_sql(text: str, dialect: str) -> str:
    """The tag-stripped, entity-decoded, whitespace-collapsed text."""
    if dialect == SPARK:
        cur = f"regexp_replace({text}, '{_TAG_PATTERN}', ' ')"
    else:
        cur = f"regexp_replace({text}, '{_TAG_PATTERN}', ' ', 'g')"
    for ent, codes in MARKUP_ENTITIES:
        rep = "concat(" + ", ".join(f"chr({c})" for c in codes) + ")"
        if len(codes) == 1:
            rep = f"chr({codes[0]})"
        cur = f"replace({cur}, '{ent}', {rep})"
    return collapse_ws_sql(cur)


def tag_count_sql(text: str, dialect: str) -> str:
    """Number of markup tags removed (BIGINT)."""
    if dialect == SPARK:
        return f"CAST(regexp_count({text}, '{_TAG_PATTERN}') AS BIGINT)"
    return f"CAST(len(regexp_extract_all({text}, '{_TAG_PATTERN}')) AS BIGINT)"


# ---------------------------------------------------------------------------
# URL host extraction (r6): scheme-anchored host capture.  Explicit ASCII
# class (the PII/BPE discipline), capture group 1 — regexp_extract_all
# takes a group index with identical semantics on both engines.
# ---------------------------------------------------------------------------

URL_HOST_PATTERN = "https?://([A-Za-z0-9.-]+)"


def url_hosts_sql(text: str, dialect: str) -> str:
    """Array of URL hosts appearing in the text (with repeats — one entry
    per URL occurrence)."""
    if dialect == SPARK:
        return f"regexp_extract_all({text}, '{URL_HOST_PATTERN}', 1)"
    return f"regexp_extract_all({text}, '{URL_HOST_PATTERN}', 1)"


def domain_sql(host: str, dialect: str) -> str:
    """Registrable-ish domain: the last two dot-labels of a host (the
    host itself when it has fewer).  Public-suffix lists are out of scope
    (no external data); two labels is the standard approximation."""
    if dialect == SPARK:
        arr = f"split({host}, '[.]')"
        ln = f"size({arr})"
        l1 = f"element_at({arr}, -1)"
        l2 = f"element_at({arr}, -2)"
    else:
        arr = f"string_split({host}, chr(46))"
        ln = f"len({arr})"
        l1 = f"{arr}[-1]"
        l2 = f"{arr}[-2]"
    return (
        f"(CASE WHEN {ln} >= 2 THEN concat({l2}, chr(46), {l1}) "
        f"ELSE {host} END)"
    )
