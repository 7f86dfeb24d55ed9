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
