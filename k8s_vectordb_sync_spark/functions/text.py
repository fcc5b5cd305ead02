"""Text-analysis functions for the training-data pipeline surface.

All JVM-side Column expressions (split/transform/aggregate/regexp) — no Python
UDFs in the hot path, so these run inside whole-stage codegen and scale to
100 TB of documents. Each has an exact ANSI-SQL equivalent for the DuckDB
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small, fixed stopword list (deterministic; mirrored in the SQL oracles).
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

# Marker words per language for the n-gram/marker language-ID heuristic.
LANG_MARKERS = {
    "en": ("the", "a", "and", "of", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "de", "que", "los"),
    "zh": ("de", "shi", "le", "bu", "wo"),
}

# BPE-ish token pattern: runs of letters, runs of digits, or single
# non-alphanumeric-non-space characters (mirrors how byte-pair pretokenizers
# split words / numbers / punctuation).
BPE_TOKEN_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def tokens(text: Column) -> Column:
    """Lowercased whitespace tokens, empties removed."""
    return F.filter(F.split(F.lower(text), "\\s+"), lambda t: t != F.lit(""))


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count: letter-runs + digit-runs + punctuation singletons."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), F.lit(0)))


def stopword_ratio(text: Column) -> Column:
    """Fraction of whitespace tokens that are stopwords.

    The token array is let-bound through a single-element transform (the
    shingles() rationale): `tokens(text)` is itself a higher-order filter,
    so the three references below would re-tokenize the row three times —
    HOF-containing expressions are CodegenFallback and get no
    subexpression elimination. Values are bit-identical."""
    toks = tokens(text)

    def _from(tk: Column) -> Column:
        stops = F.filter(tk, lambda t: t.isin(*STOPWORDS))
        return F.when(F.size(tk) > 0, F.size(stops) / F.size(tk)).otherwise(
            F.lit(0.0)
        )

    return F.element_at(F.transform(F.array(toks), _from), 1)


def punct_ratio(text: Column) -> Column:
    """Fraction of non-space characters that are not alphanumeric."""
    no_space = F.regexp_replace(text, "\\s+", "")
    punct = F.regexp_replace(no_space, "[a-zA-Z0-9]", "")
    return F.when(
        F.length(no_space) > 0, F.length(punct) / F.length(no_space)
    ).otherwise(F.lit(0.0))


def mean_word_length(text: Column) -> Column:
    # let-bound like stopword_ratio: three references, one tokenization
    toks = tokens(text)

    def _from(tk: Column) -> Column:
        total = F.aggregate(
            F.transform(tk, F.length), F.lit(0), lambda acc, x: acc + x
        )
        return F.when(
            F.size(tk) > 0, total.cast("double") / F.size(tk)
        ).otherwise(F.lit(0.0))

    return F.element_at(F.transform(F.array(toks), _from), 1)


def quality_score(text: Column) -> Column:
    """Composite quality score in [0, 1]: rewards moderate length, low
    punctuation density, and a natural-language stopword ratio. Deterministic
    arithmetic only so the oracle reproduces it bit-for-bit (after rounding).
    """
    length_component = F.least(F.length(text) / F.lit(500.0), F.lit(1.0))
    punct_component = F.lit(1.0) - F.least(punct_ratio(text) * F.lit(4.0), F.lit(1.0))
    stop_component = F.least(stopword_ratio(text) * F.lit(5.0), F.lit(1.0))
    return (length_component + punct_component + stop_component) / F.lit(3.0)


# --- exact-integer 4-dp emissions of the quality family -------------------
# The composite quality score and its component ratios are rationals over
# integer counts, so their ROUNDED forms ride the functions/exact.py
# integer half-away-from-zero discipline instead of round-on-double (which
# diverges cross-engine on 5e-5 boundaries). The unrounded Column forms
# above stay for comparisons/filters, where both engines compute the
# identical IEEE double. NULL text scores like empty text (counts coalesce
# to 0), mirrored in the oracle fragments.

QUALITY_COUNT_NAMES = ("q_nchars", "q_nt", "q_ns", "q_dp", "q_np", "q_chars")


def quality_4dp_from_counts() -> Column:
    """round(quality_score, 4) over the QUALITY_COUNT_NAMES columns, exact:
    quality = (min(L,500)/500 + (1 - min(4*np, dp)/dp) + min(5*ns, nt)/nt)/3
    = num / (1500 * dp' * nt') with dp'/nt' floored at 1 (the floored
    branch only fires when the corresponding numerator count is 0, so the
    component value is unchanged)."""
    from .exact import exact_ratio

    num = (
        "(least(q_nchars, 500) * greatest(q_dp, 1) * greatest(q_nt, 1)"
        " + (greatest(q_dp, 1) - least(4 * q_np, greatest(q_dp, 1)))"
        " * 500 * greatest(q_nt, 1)"
        " + least(5 * q_ns, greatest(q_nt, 1)) * 500 * greatest(q_dp, 1))"
    )
    den = "(1500 * greatest(q_dp, 1) * greatest(q_nt, 1))"
    return exact_ratio(num, den, 4)


def with_quality_counts(df, text_col: str = "text"):
    """Append the QUALITY_COUNT_NAMES columns with the token array and the
    no-space string each materialized ONCE per row: the six count
    expressions reference the pinned aliases instead of re-running the
    tokenizing regex / whitespace-strip per count (higher-order functions
    are CodegenFallback, so nothing eliminates the repeated subtrees —
    the stopword_ratio/shingles rationale). A non-cheap alias referenced
    more than once survives CollapseProject, so the pinning projection is
    not folded back into the count expressions. Values are bit-identical
    to the per-count tokenizing form (same expressions, same array)."""
    # ADVICE r13: the pinned internals and the emitted count columns are
    # reserved names — a caller frame already carrying one would produce
    # ambiguous columns downstream; fail loudly instead.
    clash = ({"__q_toks", "__q_nosp", *QUALITY_COUNT_NAMES}) & set(df.columns)
    if clash:
        raise ValueError(
            f"with_quality_counts: input already has reserved column(s) {sorted(clash)}"
        )
    pinned = df.select(
        "*",
        tokens(F.col(text_col)).alias("__q_toks"),
        F.regexp_replace(F.col(text_col), "\\s+", "").alias("__q_nosp"),
    )
    tk = F.col("__q_toks")
    ns = F.col("__q_nosp")
    return pinned.select(
        *df.columns,
        F.coalesce(F.length(F.col(text_col)), F.lit(0))
        .cast("bigint")
        .alias("q_nchars"),
        F.coalesce(F.size(tk), F.lit(0)).cast("bigint").alias("q_nt"),
        F.coalesce(
            F.size(F.filter(tk, lambda t: t.isin(*STOPWORDS))), F.lit(0)
        ).cast("bigint").alias("q_ns"),
        F.coalesce(F.length(ns), F.lit(0)).cast("bigint").alias("q_dp"),
        F.coalesce(
            F.length(F.regexp_replace(ns, "[a-zA-Z0-9]", "")), F.lit(0)
        ).cast("bigint").alias("q_np"),
        F.coalesce(
            F.aggregate(F.transform(tk, F.length), F.lit(0), lambda a, x: a + x),
            F.lit(0),
        ).cast("bigint").alias("q_chars"),
    )


def with_quality_4dp(df, text_col: str = "text", out_col: str = "quality"):
    """Append the exact-integer rounded composite quality column; the
    intermediate count columns are dropped. Two stacked projections, no
    shuffle — the inner one pins the token array (with_quality_counts)."""
    return (
        with_quality_counts(df, text_col)
        .withColumn(out_col, quality_4dp_from_counts())
        .drop(*QUALITY_COUNT_NAMES)
    )


def detect_language(text: Column) -> Column:
    """Language-ID heuristic: argmax of marker-hit counts, 'und' when all zero.

    Ties broken by language code order (deterministic; mirrored in the SQL
    oracle via a greatest/case chain).

    The token array and the 5-score array are each let-bound through a
    single-element transform (the shingles rationale): the previous
    when-chain referenced each score expression several times and every
    reference re-ran the tokenizing regex — HOF-containing expressions are
    CodegenFallback, so no subexpression elimination applies. The argmax
    form is value-identical to the strict-> chain over alphabetical
    language order: array_position returns the FIRST index of the max, so
    ties resolve to the alphabetically first language, and an all-zero (or
    NULL-token) row falls through to 'und'."""
    langs = sorted(LANG_MARKERS)
    toks = tokens(text)

    def _pick(sc: Column) -> Column:
        m = F.array_max(sc)
        return F.when(
            m > 0,
            F.element_at(
                F.array(*[F.lit(lang) for lang in langs]),
                F.array_position(sc, m).cast("int"),
            ),
        ).otherwise(F.lit("und"))

    def _from(tk: Column) -> Column:
        sc = F.array(
            *[
                F.size(F.filter(tk, lambda t: t.isin(*LANG_MARKERS[lang])))
                for lang in langs
            ]
        )
        return F.element_at(F.transform(F.array(sc), _pick), 1)

    return F.element_at(F.transform(F.array(toks), _from), 1)


def md5_prefix_long(s: Column, hexlen: int = 15) -> Column:
    """Deterministic 60-bit hash: first ``hexlen`` hex chars of md5 as BIGINT.

    Identical in DuckDB: CAST(('0x' || substring(md5(s), 1, 15)) AS BIGINT).
    Used for fingerprints / minhash shingle hashing so Spark and the oracle
    agree exactly (Spark's hash() is murmur3 and does not match DuckDB's).
    """
    return F.conv(F.substring(F.md5(s), 1, hexlen), 16, 10).cast("bigint")


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(text), "\\s+", " "))


# control characters except \t \n \r (those are whitespace, handled by the
# collapse step); RE2-compatible so the DuckDB oracle replays it exactly
CONTROL_CHARS_PATTERN = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"


def clean_text(text: Column) -> Column:
    """Cleaning normalization for crawled text: control chars -> space,
    collapse whitespace runs, trim. Preserves case (unlike normalize_text,
    which canonicalizes for fingerprints)."""
    stripped = F.regexp_replace(text, CONTROL_CHARS_PATTERN, " ")
    return F.trim(F.regexp_replace(stripped, "\\s+", " "))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: 60-bit hash of the normalized text (rolling-hash
    stand-in with exact oracle parity)."""
    return md5_prefix_long(normalize_text(text))


def shingles(text: Column, k: int = 3) -> Column:
    """Word k-shingles of the normalized text, as an array of strings.

    Built via sequence + transform + array_join over the token array —
    all JVM-side higher-order functions.
    """
    toks = F.split(normalize_text(text), " ")

    # Let-bind the token array through a single-element transform() so it is
    # computed ONCE per row: higher-order functions are interpreted and do
    # no subexpression elimination, so referencing `toks` inside the
    # per-index lambda re-ran normalize+split once per span position —
    # O(tokens^2) re-tokenization per document (measured 8x on the corpus
    # shingle explode). The lambda variable `tk` is the materialized array;
    # outputs are bit-identical.
    def _from(tk: Column) -> Column:
        n = F.size(tk)
        idx = F.sequence(F.lit(0), F.greatest(n - F.lit(k), F.lit(0)))
        sh = F.transform(idx, lambda i: F.array_join(F.slice(tk, i + 1, k), " "))
        return F.when(n >= k, F.array_distinct(sh)).otherwise(
            F.array_distinct(F.array(F.array_join(tk, " ")))
        )

    return F.element_at(F.transform(F.array(toks), _from), 1)


# PII patterns — RE2-compatible (no backreferences / lookaround), so Java
# regex (Spark) and RE2 (the DuckDB oracle) produce identical replacements.
PII_PATTERNS = (
    # (pattern, replacement)
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
)


def scrub_pii(text: Column) -> Column:
    """Redact common PII shapes (emails, NNN-NNN-NNNN phones, IPv4 addresses,
    SSNs) with typed placeholders — chained regexp_replace, all codegen.

    Order matters: emails first (an address containing digits must not be
    half-eaten by the numeric rules), then phone before SSN-like (the SSN
    rule would otherwise claim the middle of a phone number), IP before SSN
    (dotted quads). The same chain order is mirrored in the SQL oracle.
    """
    out = text
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def bigrams(text: Column) -> Column:
    """Adjacent token pairs ('w1 w2') of the lowercased whitespace tokens.

    zip_with over two shifted slices: each slice is evaluated once per row.
    (An index-based ``transform(sequence(...), i -> element_at(toks, i))``
    formulation re-evaluates the tokenization per ELEMENT in interpreted
    higher-order eval — 100x the regex work on a 50-token doc.)
    """
    toks = tokens(text)
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, n - F.lit(1)),
        F.slice(toks, 2, n - F.lit(1)),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.when(n >= 2, pairs).otherwise(F.array().cast("array<string>"))
