"""Text-analysis operators for training-data curation (task brief:
language-ID heuristic, quality scoring, token counting, document
fingerprinting). All JVM-side `pyspark.sql.functions` expressions —
whole-stage codegen, no Python — and deliberately expressible in ANSI
SQL so the DuckDB oracle can replay them exactly (__spark_entry__.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MOD_P = 1_000_000_007

# occurrence-count stopword probes per language (padded-substring counts
# — portable to any SQL engine via replace())
LANG_PROBES = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "de": [" der ", " und ", " die ", " das ", " ist "],
    "fr": [" le ", " la ", " et ", " les ", " est "],
    "es": [" el ", " la ", " y ", " los ", " es "],
}


def _tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(F.coalesce(text, F.lit(""))), r"\s+"),
                    lambda t: t != "")


def token_stats(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, n_tokens, n_unique_tokens, avg_token_len) — whitespace
    tokenization; avg_token_len = 0.0 for empty docs, rounded to 6."""
    toks = _tokens(F.col(text_col))
    total_len = F.aggregate(toks, F.lit(0).cast("long"),
                            lambda acc, t: acc + F.length(t))
    return docs.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.round(total_len.cast("double") /
                F.greatest(F.size(toks), F.lit(1)), 6).alias("avg_token_len"),
    )


def _count_occurrences(padded: Column, needle: str) -> Column:
    """Non-overlapping occurrence count via replace-and-measure — the
    portable SQL idiom (length(x) - length(replace(x, k, ''))) / len(k)."""
    return ((F.length(padded) - F.length(F.replace(padded, F.lit(needle))))
            / F.lit(len(needle))).cast("long")


def _padded(text: Column) -> Column:
    return F.concat(F.lit(" "), F.lower(F.coalesce(text, F.lit(""))), F.lit(" "))


def quality_stats(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Cheap quality signals: char/space/digit ratios + English-stopword
    density + a composite score. Pure codegen expressions."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n = F.length(t)
    n_spaces = n - F.length(F.replace(t, F.lit(" ")))
    n_digits = n - F.length(F.regexp_replace(t, "[0-9]", ""))
    padded = _padded(F.col(text_col))
    stop_hits = None
    for w in LANG_PROBES["en"]:
        c = _count_occurrences(padded, w)
        stop_hits = c if stop_hits is None else stop_hits + c
    toks = _tokens(F.col(text_col))
    n_tokens = F.size(toks)
    safe_n = F.greatest(n, F.lit(1)).cast("double")
    space_ratio = F.round(n_spaces / safe_n, 6)
    digit_ratio = F.round(n_digits / safe_n, 6)
    stop_density = F.round(stop_hits / F.greatest(n_tokens, F.lit(1)).cast("double"), 6)
    score = F.round(
        F.least(F.lit(1.0), n.cast("double") / F.lit(500.0)) * F.lit(0.4)
        + (F.lit(1.0) - digit_ratio) * F.lit(0.3)
        + F.least(F.lit(1.0), stop_density * F.lit(5.0)) * F.lit(0.3), 6)
    return docs.select(
        F.col(id_col), n.alias("n_chars_q"), n_tokens.alias("n_tokens"),
        space_ratio.alias("space_ratio"), digit_ratio.alias("digit_ratio"),
        stop_density.alias("stopword_density"), score.alias("quality_score"))


def lang_guess(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """n-gram-free language-ID heuristic: argmax of per-language stopword
    occurrence counts, ties broken in fixed language order, 'und'
    (undetermined) when all probes are zero."""
    padded = _padded(F.col(text_col))
    counts = {}
    for lang, probes in LANG_PROBES.items():
        c = None
        for w in probes:
            cc = _count_occurrences(padded, w)
            c = cc if c is None else c + cc
        counts[lang] = c
    best = F.greatest(*counts.values())
    expr = F.lit("und")
    # reversed so earlier languages win ties (chained when-otherwise)
    for lang in reversed(list(LANG_PROBES)):
        expr = F.when((counts[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    sel = [F.col(id_col), expr.alias("lang_guess")]
    sel += [counts[lang].alias(f"hits_{lang}") for lang in LANG_PROBES]
    return docs.select(*sel)


def fingerprint(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Rolling polynomial fingerprint of the lowercased text, mod
    1e9+7 — a portable document fingerprint (same arithmetic replayable
    in any SQL engine; engine-internal identity uses xxhash64 instead)."""
    chars = F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), "")
    fp = F.aggregate(
        chars, F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(31) + F.coalesce(F.ascii(ch), F.lit(0)))
        % F.lit(MOD_P))
    return docs.select(F.col(id_col), fp.alias("fingerprint"),
                       F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("fp_len"))
