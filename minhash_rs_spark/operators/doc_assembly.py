"""G1 — document assembly: turns -> per-conversation documents.

The reference merges *consecutive JSONL lines* sharing a concat_key tuple
with "\n".join (/root/reference/src/main.rs:499-521). Our input is a
columnar transcripts table (conv_id, turn_idx, role, text, tool, ts);
the same semantic is: group by conv_id, order by turn_idx (STABLE turn
ordering — the BASELINE per-row invariant), join texts with "\n".

Implementation is pure DataFrame (one shuffle, map-side partial
collect_list is not possible but the groupBy is key-balanced on conv_id):
collect_list(struct(turn_idx, text)) -> array_sort (sorts by struct
fields in order => by turn_idx) -> transform to texts -> array_join.
Catalyst prunes the scan to exactly (conv_id, turn_idx, text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# SlimPajama punctuation set (ref clean_text, src/main.rs:598-614)
_PUNCT = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"


def assemble_documents(turns: DataFrame,
                       conv_col: str = "conv_id",
                       order_col: str = "turn_idx",
                       text_col: str = "text") -> DataFrame:
    """Returns (conv_id, doc_text, n_turns) — one row per conversation."""
    pair = F.struct(F.col(order_col).alias("o"),
                    F.coalesce(F.col(text_col), F.lit("")).alias("t"))
    return (
        turns
        .select(F.col(conv_col).alias("conv_id"), pair.alias("p"))
        .groupBy("conv_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("p")), lambda x: x["t"]),
                "\n",
            ).alias("doc_text"),
            F.count(F.lit(1)).alias("n_turns"),
        )
    )


def turn_token_hashes(text_col, mode: str = "words") -> "F.Column":
    """Whole-stage-codegen clean + tokenize + hash of one turn's text:
    lower -> strip SlimPajama punctuation + non-ws C0 controls/DEL
    (translate; see kernel._C0_STRIP rationale) -> split CJK ideographs
    per character (UAX#29 word bounds, kernel.CJK_RANGES, via a
    lookaround split — no sentinel byte that payload could collide
    with) -> split on unicode whitespace -> drop empties -> xxhash64
    per token.

    mode="uniseg" additionally emits a single-space token between
    adjacent word segments — exactly uniseg::split_word_bounds on
    cleaned text (ref src/main.rs:352-358): CJK characters inside a
    word become their own segments with NO space token between them.

    Bit-identical to the Python kernel's same-mode tokenizer
    (kernel.tokenize uses the same xxHash64-seed-42 on UTF-8 bytes);
    parity is asserted in tests. The (?U) flag makes Java's \\s match
    unicode whitespace like Python's re.
    """
    from minhash_rs_spark.functions.kernel import _C0_STRIP, CJK_RANGES

    cleaned = F.translate(F.lower(F.coalesce(text_col, F.lit(""))),
                          _PUNCT + _C0_STRIP, "")
    if mode == "uniseg":
        # cleaned has single spaces (clean_text collapses whitespace
        # upstream in the assembled doc; raw turn text may not be
        # collapsed, so normalize here first)
        cleaned = F.trim(F.regexp_replace(cleaned, r"(?U)\s+", " "))
        words = F.split(cleaned, " ")
        # per word: CJK-aware sub-segments, no inter-segment spaces
        segs = F.transform(
            words,
            lambda w: F.filter(
                F.split(w, f"(?<=[{CJK_RANGES}])|(?=[{CJK_RANGES}])"),
                lambda t: t != ""))
        # intersperse the " " segment between words (not around CJK
        # splits), then drop the leading-empty-doc case
        parts = F.transform(
            segs,
            lambda x, i: F.when(i == F.lit(0), x)
                          .otherwise(F.concat(F.array(F.lit(" ")), x)))
        toks = F.flatten(parts)
        toks = F.when(F.length(cleaned) == 0, F.array().cast("array<string>")) \
                .otherwise(toks)
    else:
        cleaned = F.regexp_replace(cleaned, f"([{CJK_RANGES}])", r" $1 ")
        toks = F.filter(F.split(cleaned, r"(?U)\s+"), lambda t: t != "")
    return F.transform(toks, lambda t: F.xxhash64(t))


def assemble_token_docs(turns: DataFrame,
                        conv_col: str = "conv_id",
                        order_col: str = "turn_idx",
                        text_col: str = "text",
                        mode: str = "words") -> DataFrame:
    """(conv_id, token_hashes array<long>, n_turns) — the minhash path's
    document assembly, entirely JVM-side (codegen; no Python strings).

    Assembles the document STRING first (assemble_documents — plain
    collect_list of strings, which the aggregate machinery handles far
    better than nested arrays: tokenize-per-turn + collect_list of
    token arrays measured ~2x slower end-to-end), then runs the
    clean+tokenize+xxhash64 expression over the assembled text.
    """
    docs = assemble_documents(turns, conv_col, order_col, text_col)
    return docs.select(
        "conv_id",
        turn_token_hashes(F.col("doc_text"), mode).alias("token_hashes"),
        "n_turns")
