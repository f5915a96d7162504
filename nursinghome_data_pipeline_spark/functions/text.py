"""Text-analysis column expressions (all JVM-side, codegen-friendly).

Covers the reference's one scalar UDF — quarter normalization,
``/root/reference/calculate_metrics.py:28-36`` — re-expressed as a
native ``regexp_extract`` expression (no Python in the hot path), plus
the LLM-pipeline text operators (token counting, quality scoring,
language-ID heuristic, fingerprinting) that a training-data pipeline
needs at 100 TB. Everything here is a pure Column expression, so
Catalyst folds it into whole-stage codegen; there are no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: reference regex, calculate_metrics.py:30 — first "20xx" year then the
#: next digit anywhere after it (lazy gap). The gap is ``[^\n]`` rather
#: than ``.`` because Java's ``.`` excludes \r (a line terminator) while
#: Python's and RE2's exclude only \n; ``[^\n]`` behaves identically in
#: all three (hypothesis counterexample: "2000\r0").
#:
#: Unicode-digit divergence (deliberate, ADVICE r12): ``\d`` here is
#: Java-regex ASCII ``[0-9]``, and the DuckDB/RE2 oracle agrees — but
#: the upstream Python reference (calculate_metrics.py) uses Python
#: ``\d``, which also matches Unicode Nd digits (e.g. 𝟎 U+1D7CE). On
#: such inputs the reference returns a value while this product (and
#: the oracle) return NULL. The corpus is ASCII; the test spec pins
#: ``[0-9]`` (tests/test_text_functions.py).
QUARTER_PATTERN = r"(20\d{2})[^\n]*?(\d)"


def normalize_quarter_col(c: Column | str) -> Column:
    """``"2024Q1" / "2024 Q1" / "2024-1"`` → ``"2024-Q1"``; NULL on no match.

    Parity target: ``normalize_quarter`` at calculate_metrics.py:28-36
    (row-wise ``.apply`` in the reference; a single native expression here).
    """
    c = F.col(c) if isinstance(c, str) else c
    year = F.regexp_extract(c, QUARTER_PATTERN, 1)
    qtr = F.regexp_extract(c, QUARTER_PATTERN, 2)
    return F.when(year == "", F.lit(None).cast("string")).otherwise(
        F.concat(year, F.lit("-Q"), qtr)
    )


#: English stopword list for the ratio-based language heuristic — the
#: single owner; the registry's oracle-SQL literal derives from it.
STOPWORDS_EN = ("the", "and", "of", "to", "a", "in", "is", "it", "for", "on")


def english_stopword_filter(c: Column | str, *, min_ratio: float = 0.08) -> Column:
    """Heuristic language-ID predicate: TRUE when at least ``min_ratio``
    of whitespace tokens are English stopwords (and the text is
    non-empty). Pure Column expression; shared by the registry's
    corpus_build_docs twin and the corpus-build CLI so the two
    pipelines select the same documents."""
    c = F.col(c) if isinstance(c, str) else c
    toks = F.split(F.lower(F.trim(c)), " ")
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS_EN)))
    return (n_tok > 0) & (n_stop.cast("double") / n_tok >= min_ratio)


def token_count_col(c: Column | str) -> Column:
    """Whitespace token count; 0 for empty/blank strings.

    ``split`` on ``\\s+`` after trim; empty string yields one empty
    token in both Spark and DuckDB, so it is special-cased to 0.
    """
    c = F.col(c) if isinstance(c, str) else c
    t = F.trim(c)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def oracle_token_count(expr: str) -> str:
    """DuckDB SQL mirroring :func:`token_count_col`."""
    return (
        f"CASE WHEN TRIM({expr}) = '' THEN 0 "
        f"ELSE len(regexp_split_to_array(TRIM({expr}), '\\s+')) END"
    )


#: minimal deterministic sentiment lexicons (lexicon-based scoring is
#: the standard cheap pre-filter for corpus curation; swap in a real
#: lexicon — VADER/AFINN-style — without changing the plan shape)
POSITIVE_WORDS = (
    "good", "great", "excellent", "best", "love", "happy", "wonderful",
    "positive", "success", "improved",
)
NEGATIVE_WORDS = (
    "bad", "poor", "terrible", "worst", "hate", "sad", "awful",
    "negative", "failure", "decline",
)


def sentiment_score_col(c: Column | str) -> Column:
    """Lexicon sentiment in [-1, 1]: (pos - neg) / (pos + neg) token
    hits, 0.0 when no lexicon token occurs. Lower-cased whitespace
    tokens; pure filter/size expressions — map-only, no UDF.
    """
    c = F.col(c) if isinstance(c, str) else c
    toks = F.split(F.lower(F.trim(c)), r"\s+")

    def score(arr: Column) -> Column:
        p = F.size(F.filter(arr, lambda t: t.isin(*POSITIVE_WORDS)))
        n = F.size(F.filter(arr, lambda t: t.isin(*NEGATIVE_WORDS)))
        return F.when(p + n == 0, F.lit(0.0)).otherwise(
            (p - n).cast("double") / (p + n).cast("double")
        )

    # bind once: p and n each traverse the token array, which must not
    # re-split/re-lower the text per use (operators/dedup._bind)
    from ..operators.dedup import _bind

    return _bind(toks, score)


def oracle_sentiment(expr: str) -> str:
    """DuckDB SQL mirroring :func:`sentiment_score_col`."""
    pos = "(" + ",".join(f"'{w}'" for w in POSITIVE_WORDS) + ")"
    neg = "(" + ",".join(f"'{w}'" for w in NEGATIVE_WORDS) + ")"
    toks = f"regexp_split_to_array(lower(trim({expr})), '\\s+')"
    p = f"len(list_filter({toks}, t -> t IN {pos}))"
    n = f"len(list_filter({toks}, t -> t IN {neg}))"
    return (
        f"CASE WHEN ({p}) + ({n}) = 0 THEN 0.0 "
        f"ELSE CAST(({p}) - ({n}) AS DOUBLE) / CAST(({p}) + ({n}) AS DOUBLE) END"
    )


def quality_score_col(c: Column | str) -> Column:
    """Heuristic doc-quality score in [0,1] from cheap text statistics.

    Components (equal weight): non-trivial length, word-ish character
    ratio, moderate mean token length. All integer/double arithmetic in
    a fixed operation order so the oracle matches bit-for-bit.
    """
    c = F.col(c) if isinstance(c, str) else c
    n_chars = F.length(c)
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    n_tokens = token_count_col(c)
    len_ok = F.when((n_chars >= 50) & (n_chars <= 10000), 1.0).otherwise(0.0)
    alpha_ratio = F.when(n_chars == 0, 0.0).otherwise(
        n_alpha.cast("double") / n_chars.cast("double")
    )
    mean_tok = F.when(n_tokens == 0, 0.0).otherwise(
        n_chars.cast("double") / n_tokens.cast("double")
    )
    tok_ok = F.when((mean_tok >= 3.0) & (mean_tok <= 12.0), 1.0).otherwise(0.0)
    return (len_ok + alpha_ratio + tok_ok) / F.lit(3.0)


def oracle_quality_score(expr: str) -> str:
    """DuckDB SQL mirroring :func:`quality_score_col`."""
    n_chars = f"length({expr})"
    n_alpha = f"length(regexp_replace({expr}, '[^A-Za-z]', '', 'g'))"
    n_tokens = oracle_token_count(expr)
    len_ok = f"(CASE WHEN {n_chars} >= 50 AND {n_chars} <= 10000 THEN 1.0 ELSE 0.0 END)"
    alpha_ratio = (
        f"(CASE WHEN {n_chars} = 0 THEN 0.0 "
        f"ELSE CAST({n_alpha} AS DOUBLE) / CAST({n_chars} AS DOUBLE) END)"
    )
    mean_tok = (
        f"(CASE WHEN ({n_tokens}) = 0 THEN 0.0 "
        f"ELSE CAST({n_chars} AS DOUBLE) / CAST(({n_tokens}) AS DOUBLE) END)"
    )
    tok_ok = f"(CASE WHEN {mean_tok} >= 3.0 AND {mean_tok} <= 12.0 THEN 1.0 ELSE 0.0 END)"
    return f"(({len_ok} + {alpha_ratio} + {tok_ok}) / 3.0)"
