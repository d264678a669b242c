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
    density + a composite score, all in EXACT integer micro-units (_e6,
    integer division) — float rounding of quantized ratios lands on
    half-ulp boundaries and diverges across engines; integers never do.
    Pure codegen expressions."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n = F.length(t).cast("long")
    n_spaces = (F.length(t) - F.length(F.replace(t, F.lit(" ")))).cast("long")
    n_digits = (F.length(t) - F.length(F.regexp_replace(t, "[0-9]", ""))).cast("long")
    padded = _padded(F.col(text_col))
    stop_hits = None
    for w in LANG_PROBES["en"]:
        c = _count_occurrences(padded, w)
        stop_hits = c if stop_hits is None else stop_hits + c
    toks = _tokens(F.col(text_col))
    n_tokens = F.size(toks).cast("long")
    base = docs.select(
        F.col(id_col), n.alias("n_chars_q"), n_tokens.alias("n_tokens"),
        n_spaces.alias("_sp"), n_digits.alias("_dg"), stop_hits.alias("_st"))
    return base.select(
        id_col, "n_chars_q", "n_tokens",
        F.expr("(_sp*1000000) div greatest(n_chars_q,1)").alias("space_ratio_e6"),
        F.expr("(_dg*1000000) div greatest(n_chars_q,1)").alias("digit_ratio_e6"),
        F.expr("(_st*1000000) div greatest(n_tokens,1)").alias("stopword_density_e6"),
        F.expr(
            "(least(1000000L, n_chars_q*2000)*4) div 10"
            " + ((1000000 - (_dg*1000000) div greatest(n_chars_q,1))*3) div 10"
            " + (least(1000000L, ((_st*1000000) div greatest(n_tokens,1))*5)*3) div 10"
        ).alias("quality_score_e6"))


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


def _word_ngrams(words: Column, n: int) -> Column:
    """Space-joined word n-grams (WITH multiplicity — repetition
    signals need counts, unlike decontam's distinct grams); empty
    array when the doc has < n words."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(words) - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(words, i, n), " "))
    return F.when(F.size(words) >= n, grams) \
            .otherwise(F.array().cast("array<string>"))


def repetition_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     ns: tuple[int, ...] = (2, 3, 4)) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    §A1.1 "repetition removal", adapted to word n-grams because this
    corpus has no line structure). Per document and per n in `ns`:

    - top{n}gram_count: multiplicity of the most frequent word n-gram
      (ties -> lexicographically smallest gram; 0 when < n words);
    - top{n}gram_frac_e6: characters covered by that gram's occurrences
      (count * len(gram), space-joined) over the NORMALIZED text length
      (tokens joined by single spaces — whitespace-run-invariant),
      integer micro-units;
    - dup{n}gram_frac_e6: fraction of n-gram instances that are repeats
      of an earlier instance, i.e. (total - distinct) / total.

    Scale shape: pure per-row array expressions — the most-frequent
    gram comes from one fold over the SORTED gram array (run-length
    max; strict > keeps the first = smallest max run), so there is NO
    explode, NO groupBy, NO shuffle: embarrassingly parallel over doc
    partitions at any corpus size, and Catalyst prunes the scan to
    (id, text). Exact integer micro-units so the DuckDB oracle
    (unnest + group + window argmax) matches value-for-value.
    """
    words = _tokens(F.col(text_col))
    n_chars_norm = F.length(F.array_join(words, " ")).cast("long")
    base = docs.select(F.col(id_col), words.alias("_w"),
                       n_chars_norm.alias("_nc"))
    sel = [F.col(id_col), F.size("_w").cast("long").alias("n_words")]
    for n in ns:
        grams = _word_ngrams(F.col("_w"), n)
        srt = F.array_sort(grams)
        zero = F.lit(0).cast("long")
        acc0 = F.struct(F.lit("").alias("prev"), zero.alias("run"),
                        zero.alias("best"), F.lit("").alias("bg"))
        def step(acc, g):
            run = F.when(g == acc["prev"], acc["run"] + 1) \
                   .otherwise(F.lit(1).cast("long"))
            better = run > acc["best"]
            return F.struct(
                g.alias("prev"), run.alias("run"),
                F.when(better, run).otherwise(acc["best"]).alias("best"),
                F.when(better, g).otherwise(acc["bg"]).alias("bg"))
        top = F.aggregate(srt, acc0, step)
        n_grams = F.size(grams).cast("long")
        n_dist = F.size(F.array_distinct(grams)).cast("long")
        sel += [
            top["best"].alias(f"_cnt{n}"),
            F.length(top["bg"]).cast("long").alias(f"_glen{n}"),
            n_grams.alias(f"_ng{n}"),
            n_dist.alias(f"_nd{n}"),
        ]
    mid = base.select(*sel, F.col("_nc"))
    # integer `div` (not float / + cast) so micro-unit ratios are exact
    # floor division, bit-identical to DuckDB's `//` on BIGINTs
    out = [F.col(id_col), F.col("n_words")]
    for n in ns:
        out += [
            F.col(f"_cnt{n}").alias(f"top{n}gram_count"),
            F.expr(f"(_cnt{n} * _glen{n} * 1000000) div greatest(_nc, 1)")
            .alias(f"top{n}gram_frac_e6"),
            F.expr(f"((_ng{n} - _nd{n}) * 1000000) div greatest(_ng{n}, 1)")
            .alias(f"dup{n}gram_frac_e6"),
        ]
    return mid.select(*out)
