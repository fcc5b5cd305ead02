"""Rule-based document quality filtering (C4 / Gopher style).

The standard first-pass curation gate for web-scale training corpora:
hand-written per-document rules, each a cheap column expression, combined
into a keep/drop verdict. Unlike the scalar ``functions.text.quality_score``
(a soft composite), these are the hard rules a pipeline actually drops rows
with — and reporting each rule's flag separately is what makes the gate
auditable (which rule killed this document?).

Every rule is integer/IEEE-exact arithmetic over token arrays — identical in
Spark and DuckDB, so the boolean flags are oracle-checkable bit-for-bit. No
shuffle: the whole operator is a per-row projection that runs inside the
scan's WholeStageCodegen; at 100 TB it is scan-bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

# Thresholds (module constants so the SQL-oracle generator embeds the same
# literals). Tuned for the synthetic corpus: real C4/Gopher bounds are wider.
MIN_TOKENS = 30
MAX_TOKENS = 90
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 8.0
MIN_STOPWORD_RATIO = 0.05
MAX_DUP_TOKEN_RATIO = 0.6


def quality_rules(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document rule flags + keep verdict.

    Rules (a doc is kept iff ALL pass):
      r_len      token count in [MIN_TOKENS, MAX_TOKENS]       (Gopher 50..100k)
      r_wordlen  mean word length in [MIN.., MAX..]            (Gopher 3..10)
      r_stop     stopword ratio >= MIN_STOPWORD_RATIO          (Gopher ">=2 stopwords")
      r_dup      duplicate-token ratio <= MAX_DUP_TOKEN_RATIO  (Gopher repetition rules)
    """
    # The token array is materialized ONCE per row (a non-cheap alias
    # referenced many times survives CollapseProject): the rule flags below
    # reference the pinned column, not the tokenizing regex — the previous
    # form's physical plan held 29 copies of split(lower(text)) for this
    # operator (plan-verified, plans/r13/documents_quality_rules_before.txt;
    # HOF expressions are CodegenFallback, no subexpression elimination).
    # The per-rule arithmetic is byte-for-byte the mean_word_length /
    # stopword_ratio formulas over the same array, so every flag is
    # bit-identical.
    if "__toks" in docs.columns:  # reserved pin name (ADVICE r13)
        raise ValueError("quality_rules: input already has reserved column '__toks'")
    pinned = docs.select(F.col(id_col), T.tokens(F.col(text_col)).alias("__toks"))
    tk = F.col("__toks")
    n = F.size(tk)
    total_len = F.aggregate(
        F.transform(tk, F.length), F.lit(0), lambda acc, x: acc + x
    )
    mwl = F.when(n > 0, total_len.cast("double") / n).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n > 0, F.size(F.filter(tk, lambda t: t.isin(*T.STOPWORDS))) / n
    ).otherwise(F.lit(0.0))
    dup_ratio = F.when(
        n > 0, F.lit(1.0) - F.size(F.array_distinct(tk)) / n
    ).otherwise(F.lit(0.0))
    r_len = (n >= MIN_TOKENS) & (n <= MAX_TOKENS)
    r_wordlen = (mwl >= MIN_MEAN_WORD_LEN) & (mwl <= MAX_MEAN_WORD_LEN)
    r_stop = stop_ratio >= MIN_STOPWORD_RATIO
    r_dup = dup_ratio <= MAX_DUP_TOKEN_RATIO
    return pinned.select(
        F.col(id_col),
        n.cast("bigint").alias("n_tokens"),
        r_len.alias("r_len"),
        r_wordlen.alias("r_wordlen"),
        r_stop.alias("r_stop"),
        r_dup.alias("r_dup"),
        (r_len & r_wordlen & r_stop & r_dup).alias("keep"),
    )
