"""Text-analysis column expressions for large-scale training-data pipelines.

All builders return native Catalyst ``Column``s (JVM-side, whole-stage
codegen — no Python UDFs), so they run at scan speed over 100 TB of text.
Semantics are deliberately expressible in portable ANSI-ish SQL so every
operator has a DuckDB oracle (driver correctness gate).

Reference analogues: the reference's string surface (SURVEY.md §2.8 —
split / regex substring count / contains) generalized to document-quality
features; the per-survey substring counters (A11) become per-document token
and marker counters.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# language marker words: counts of these decide the n-gram-free heuristic
# language id. (The synthetic corpus is a shared-vocabulary soup, so the
# heuristic's *parity* is what tests assert, not its accuracy.)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "fast", "small"],
    "es": ["data", "row"],
    "de": ["table", "group"],
    "fr": ["key", "join"],
    "zh": ["spark", "query"],
}

# BPE-ish tokenizer regex: letter runs, digit runs, single non-space symbols
TOKEN_REGEX = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

STOPWORDS = ["the", "a", "of", "to", "and"]

# Unicode whitespace, shared by EVERY tokenization path — the Catalyst
# expressions here, the pandas shingle kernel, and the DuckDB oracle
# fragments (queries._sql_words/_sql_norm). Java's and RE2's ``\s`` are
# ASCII-only, so NBSP/ideographic-space words would stay glued together and
# silently change near-dup pair sets per engine path (the round-2 review's
# Unicode-parity gap). Class = ``\s`` + the remaining White_Space codepoints
# (NEL, NBSP, ogham, en/em/thin spaces, line/para sep, narrow NBSP, math
# space, ideographic space).
UNICODE_WS_EXTRAS = (
    "\u0085\u00a0\u1680\u2000-\u200a\u2028\u2029\u202f\u205f\u3000"
)
UNICODE_WS_RE = "[\\s" + UNICODE_WS_EXTRAS + "]+"


def words(text: Column) -> Column:
    """Whitespace tokens (Unicode whitespace class, see UNICODE_WS_RE);
    empty string -> empty array (not [''])."""
    return F.filter(F.split(F.trim(text), UNICODE_WS_RE), lambda w: w != F.lit(""))


def word_count(text: Column) -> Column:
    return F.size(words(text))


def bpe_token_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(TOKEN_REGEX))


def marker_count(text: Column, marker: str) -> Column:
    return F.size(F.filter(words(F.lower(text)), lambda w: w == F.lit(marker)))


def lang_scores(text: Column) -> dict[str, Column]:
    out = {}
    for lang, markers in LANG_MARKERS.items():
        s = None
        for m in markers:
            c = marker_count(text, m)
            s = c if s is None else s + c
        out[lang] = s
    return out


def predicted_lang(text: Column) -> Column:
    """Argmax of marker scores; ties break in LANG_MARKERS key order (the
    oracle SQL mirrors the same CASE chain)."""
    scores = lang_scores(text)
    best = None
    expr = None
    for lang, s in scores.items():
        if best is None:
            best, expr = s, F.lit(lang)
        else:
            expr = F.when(s > best, F.lit(lang)).otherwise(expr)
            best = F.greatest(best, s)
    return expr


def punct_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit("[^a-zA-Z0-9\\s]"))


def stopword_ratio(text: Column) -> Column:
    w = words(F.lower(text))
    stop = F.size(F.filter(w, lambda x: x.isin(STOPWORDS)))
    return F.when(F.size(w) > 0, stop / F.size(w)).otherwise(F.lit(0.0))


def mean_word_len(text: Column) -> Column:
    w = words(text)
    total = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
    return F.when(F.size(w) > 0, total.cast("double") / F.size(w)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length + punctuation + stopword signals.
    Weights are arbitrary but FIXED — the oracle replicates them digit for
    digit. Analogue of the reference's per-survey quality feature vector
    (features_engineering pipeline)."""
    n_words = word_count(text).cast("double")
    length_term = F.least(n_words / F.lit(50.0), F.lit(1.0))
    punct_term = F.greatest(
        F.lit(0.0), F.lit(1.0) - punct_count(text).cast("double") / F.greatest(n_words, F.lit(1.0))
    )
    stop_term = F.least(F.lit(1.0), stopword_ratio(text) * F.lit(5.0))
    return F.round((length_term + punct_term + stop_term) / F.lit(3.0), 6)


def normalized_text(text: Column) -> Column:
    # collapse BEFORE trim: Spark's trim strips only ' ' while DuckDB's
    # strips Unicode whitespace — trimming the collapsed string makes the
    # two trim semantics coincide (everything is ' ' by then)
    return F.lower(F.trim(F.regexp_replace(text, UNICODE_WS_RE, " ")))


# --- encoding-hygiene signals -------------------------------------------
# Corruption that transcript byte-EQUALITY cannot catch: when mojibake /
# replacement chars enter upstream of the reference split, BOTH copies carry
# them and the equality invariant passes — a dedicated content check is the
# only detector. All four signals are pure Catalyst string expressions
# (counts via length-difference under global replace, identical semantics in
# DuckDB, so the catalog entry is oracle-checkable). Pattern escapes are the
# Java-regex/RE2 COMMON SUBSET (`\xhh`, `\x{hhhh}`, literal chars), so one
# constant feeds both engines.

REPL_CHAR = "�"  # U+FFFD REPLACEMENT CHARACTER: a decoder already gave up
BOM_CHAR = "﻿"   # U+FEFF in-body: concatenation of BOM-prefixed files
# C0 controls except \t \n \r, plus DEL — never legitimate in a transcript
CTRL_CHAR_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
# UTF-8 bytes mis-decoded as latin-1/cp1252: lead bytes C3/C2 ('Ã'/'Â')
# followed by a continuation codepoint in U+0080–U+00BF, or the 3-byte
# punctuation signature 'â€' (U+00E2 U+20AC, from ’ “ ” …). Every branch
# matches exactly 2 chars, so count = length-difference / 2.
MOJIBAKE_RE = "(?:[ÃÂ][" + r"\x{0080}-\x{00BF}" + "]|â€)"


def _char_count(text: Column, ch: str) -> Column:
    return (F.length(text) - F.length(F.replace(text, F.lit(ch), F.lit("")))).cast("long")


def repl_char_count(text: Column) -> Column:
    return _char_count(text, REPL_CHAR)


def bom_char_count(text: Column) -> Column:
    return _char_count(text, BOM_CHAR)


def ctrl_char_count(text: Column) -> Column:
    return (
        F.length(text) - F.length(F.regexp_replace(text, CTRL_CHAR_RE, ""))
    ).cast("long")


def mojibake_count(text: Column) -> Column:
    diff = F.length(text) - F.length(F.regexp_replace(text, MOJIBAKE_RE, ""))
    return F.floor(diff / F.lit(2)).cast("long")


def fingerprint_md5(text: Column) -> Column:
    """Content fingerprint over normalized text (exact-dedup key)."""
    return F.md5(normalized_text(text))


def winnow_fingerprints(text: Column, k: int = 3, w: int = 4) -> Column:
    """Winnowing document fingerprints (the MOSS rolling-hash scheme,
    Schleimer/Wilkerson/Aiken 2003): hash every word k-gram of the
    normalized text, slide a window of ``w`` consecutive hashes, keep the
    minimum per window, dedupe. Guarantees any shared run of >= k+w-1 words
    between two documents shares a fingerprint — insertion-robust near-dup
    signatures, unlike the whole-document md5.

    Engine-parity design: the k-gram "hash" is the md5 hex STRING and the
    window minimum is lexicographic (array_min on strings) — both engines
    order ASCII hex identically, so fingerprints are bit-comparable (the
    same trick as the md5-lexicographic MinHash in operators/dedup.py). At
    production scale substitute xxhash64 for md5 (cheaper; no oracle to
    match) — the plan shape is unchanged.

    Fully native higher-order functions: transform/sequence/slice/array_min
    — no UDF, whole-stage codegen'd, O(n_words * w) per row.

    Degenerate rows mirror standard winnowing: fewer than ``k`` words ->
    empty; fewer than ``w`` k-grams -> one fingerprint (the global min).

    Evaluation-order note: Catalyst has no ``let`` — a subexpression named
    inside a lambda body is RE-EVALUATED for every array element, so writing
    ``transform(seq, j -> array_min(slice(grams, j, w)))`` re-hashes all m
    k-grams for each of the m windows (O(m^2) md5 calls/row; measured 170x
    slower at 500 docs). Each intermediate (token array, gram-hash array) is
    therefore bound ONCE as a lambda variable via the single-element-array
    ``transform`` idiom before the next stage iterates over it.
    """
    empty = F.array().cast("array<string>")

    def with_grams(g: Column) -> Column:
        nwin = F.size(g) - F.lit(w - 1)
        wins = F.when(
            nwin >= 1,
            F.transform(
                F.sequence(F.lit(1), nwin), lambda j: F.array_min(F.slice(g, j, w))
            ),
        )  # guarded: sequence(1, x<1) would run DESCENDING, not empty
        return (
            F.when(F.size(g) < 1, empty)
            .when(nwin < 1, F.array(F.array_min(g)))
            .otherwise(F.array_distinct(wins))
        )

    def with_ws(ws: Column) -> Column:
        m = F.size(ws) - F.lit(k - 1)
        grams = F.when(
            m >= 1,
            F.transform(
                F.sequence(F.lit(1), m),
                lambda i: F.md5(F.array_join(F.slice(ws, i, k), " ")),
            ),
        ).otherwise(empty)
        return F.element_at(F.transform(F.array(grams), with_grams), 1)

    return F.element_at(
        F.transform(F.array(words(normalized_text(text))), with_ws), 1
    )


_SHINGLE_UDFS: dict = {}


def shingles_fast(text: Column, n: int = 3) -> Column:
    """Arrow-vectorized shingle kernel, semantics identical to ``shingles``
    (lower -> whitespace split -> n-gram join -> distinct, first-seen order).

    Why a pandas UDF when a native expression exists: the native version
    composes higher-order array functions (filter/transform lambdas), which
    Catalyst evaluates INTERPRETED (no whole-stage codegen for lambda
    functions) — measured ~190 us core-time per shingle at sf0.1. CPython
    string ops over Arrow batches do the same work ~100x faster. The
    "UDFs are the slow path" rule applies to codegen'd expressions, not to
    interpreted lambda trees.

    Tokenization splits on the SAME Unicode whitespace class as the native
    path (UNICODE_WS_RE: Java ``\\s`` + NBSP & friends), and ``str.lower``
    matches Spark's ``lower()`` on the full-casing specials too (ß, final
    sigma, dotted-I — measured identical; tests/test_text_unicode.py holds
    the cross-path parity corpus). Byte-identical shingle sets via either
    path is the contract, ASCII or not.
    """
    import re

    from pyspark.sql.functions import pandas_udf

    if n not in _SHINGLE_UDFS:
        # Java \s is [ \t\n\x0b\f\r]; extras mirror UNICODE_WS_EXTRAS
        java_ws = re.compile("[ \t\n\x0b\f\r" + UNICODE_WS_EXTRAS + "]+")

        @pandas_udf("array<string>")
        def _sh(texts: pd.Series) -> pd.Series:
            nm1 = n - 1

            def f(t):
                if t is None:
                    return []
                w = [x for x in java_ws.split(t.lower()) if x]
                if len(w) < nm1 + 1:
                    return []
                return list(dict.fromkeys(" ".join(w[i : i + nm1 + 1]) for i in range(len(w) - nm1)))

            return texts.map(f)

        _SHINGLE_UDFS[n] = _sh
    return _SHINGLE_UDFS[n](text)


def ngrams(text: Column, n: int = 2) -> Column:
    """Word n-grams WITH multiplicity (``shingles`` is the distinct
    variant) — the repetition-analysis primitive: a document that repeats
    itself has many duplicate n-grams, which distinct shingling erases.

    The word array is bound ONCE as a lambda variable (single-element-array
    ``transform`` idiom — see winnow_fingerprints' evaluation-order note);
    naming it in the outer scope would re-tokenize the document for every
    gram position (O(m^2))."""

    def mk(w: Column) -> Column:
        m = F.size(w) - F.lit(n - 1)
        # NB Spark sequence(1, 0) yields a DESCENDING [1, 0], not empty — guard
        return F.when(
            m >= 1,
            F.transform(
                F.sequence(F.lit(1), m),
                lambda i: F.concat_ws(" ", F.slice(w, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(words(normalized_text(text))), mk), 1)


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams (space-joined), first-seen order."""
    return F.array_distinct(ngrams(text, n))
