"""Deterministic synthetic multi-turn transcripts with planted duplicate
structure (FIXTURES.md F1/F2) — the test & bench corpus for the pipeline.

Shape follows BASELINE.json input_hint:
  (conv_id: string, turn_idx: int32, role: string, text: string,
   tool: string, ts: timestamp)

Planted structure per base conversation (all seeded, no wall clock):
  - exact duplicates          (kind="exact")
  - near-duplicates           (kind="near", word-substitution at a
                               controlled rate -> shingle-Jaccard ~level)
  - containment cases         (kind="containment", base text embedded in
                               a longer conversation — suffix-array path)
  - singletons, plus degenerate docs: empty text, sub-ngram short text,
    and a hot cluster of identical short conversations (LSH skew).

Rows are emitted in seeded-shuffled order so nothing can depend on input
ordering (doc assembly must re-establish turn order itself).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu apple banana cherry dragon elephant falcon guitar harbor "
    "island jungle kettle lantern meadow needle orbit puzzle quartz river stone "
    "tunnel umbrella valley window xylophone yonder zephyr anchor breeze canyon "
    "dusty ember forest glacier horizon indigo jasmine krypton lagoon marble"
).split()
_ROLES = ["user", "assistant"]
_TOOLS = ["search", "browser", "calculator", "editor", None, None, None]
_EPOCH = datetime(2024, 1, 1)


def _mk_text(rng: random.Random, n_words: int) -> str:
    words = [rng.choice(_WORDS) for _ in range(n_words)]
    # mixed case + punctuation to exercise the SlimPajama cleaner
    out = []
    for w in words:
        if rng.random() < 0.15:
            w = w.capitalize()
        if rng.random() < 0.10:
            w += rng.choice([",", ".", "!", "?", ";"])
        out.append(w)
    return " ".join(out)


def _perturb(rng: random.Random, text: str, sub_rate: float) -> str:
    """Substitute ~sub_rate of words — lowers shingle Jaccard smoothly."""
    words = text.split(" ")
    for i in range(len(words)):
        if rng.random() < sub_rate:
            words[i] = rng.choice(_WORDS) + "~"
    return " ".join(words)


def generate_transcripts(n_base: int = 200, seed: int = 0,
                         exact_dup_rate: float = 0.15,
                         near_dup_rate: float = 0.15,
                         containment_rate: float = 0.05,
                         hot_cluster_size: int = 12,
                         ) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (turns_df, expected_pairs_df).

    expected_pairs columns: conv_id_a < conv_id_b, kind, sub_rate.
    """
    rng = random.Random(seed)
    turns_rows: list[tuple] = []
    pair_rows: list[tuple] = []

    def emit_conv(conv_id: str, texts: list[str]) -> None:
        t0 = _EPOCH + timedelta(seconds=rng.randrange(10_000_000))
        for i, txt in enumerate(texts):
            turns_rows.append((
                conv_id, i, _ROLES[i % 2], txt,
                rng.choice(_TOOLS) if i % 2 == 1 else None,
                t0 + timedelta(minutes=i),
            ))

    def add_pair(a: str, b: str, kind: str, sub_rate: float = 0.0) -> None:
        a, b = (a, b) if a < b else (b, a)
        pair_rows.append((a, b, kind, sub_rate))

    for i in range(n_base):
        cid = f"c{i:06d}"
        n_turns = rng.randint(2, 12)
        texts = [_mk_text(rng, rng.randint(5, 40)) for _ in range(n_turns)]
        emit_conv(cid, texts)
        r = rng.random()
        if r < exact_dup_rate:
            dup = f"c{i:06d}x"
            emit_conv(dup, list(texts))
            add_pair(cid, dup, "exact")
        elif r < exact_dup_rate + near_dup_rate:
            # word-substitution at rate p -> 5-gram Jaccard ~ s/(2-s),
            # s=(1-p)^5: p=0.005 -> J~0.95, 0.015 -> J~0.86, 0.04 -> J~0.7
            sub_rate = rng.choice([0.005, 0.015, 0.04])
            dup = f"c{i:06d}n"
            new_texts = [_perturb(rng, t, sub_rate) for t in texts]
            if new_texts == texts:  # force a true near-dup, never exact
                w = new_texts[0].split(" ")
                w[0] = w[0] + "~"
                new_texts[0] = " ".join(w)
            emit_conv(dup, new_texts)
            add_pair(cid, dup, "near", sub_rate)
        elif r < exact_dup_rate + near_dup_rate + containment_rate:
            dup = f"c{i:06d}s"
            extra = [_mk_text(rng, rng.randint(5, 30)) for _ in range(2)]
            emit_conv(dup, texts + extra)  # base doc contained in longer doc
            add_pair(cid, dup, "containment")

    # degenerate docs (short-doc fallback + cleaner edge cases)
    emit_conv("d_empty", [""])
    emit_conv("d_punct", ["!!! ... ???"])
    emit_conv("d_short", ["alpha"])
    emit_conv("d_short2", ["alpha beta"])
    # hot cluster: many identical short conversations (LSH mega-bucket)
    for j in range(hot_cluster_size):
        emit_conv(f"hot{j:03d}", ["spam spam spam", "lovely spam wonderful spam"])
        if j > 0:
            add_pair("hot000", f"hot{j:03d}", "exact")

    turns = pd.DataFrame(turns_rows, columns=["conv_id", "turn_idx", "role",
                                              "text", "tool", "ts"])
    turns["turn_idx"] = turns["turn_idx"].astype(np.int32)
    # seeded shuffle: prove order-independence of assembly
    turns = turns.sample(frac=1.0, random_state=seed).reset_index(drop=True)
    pairs = pd.DataFrame(pair_rows, columns=["conv_id_a", "conv_id_b",
                                             "kind", "sub_rate"])
    return turns, pairs


def transcripts_spark(spark, n_base: int = 200, seed: int = 0, **kw):
    """Spark DataFrame version (Arrow createDataFrame), repartitioned so
    no partition boundary aligns with conversation boundaries."""
    pdf, pairs = generate_transcripts(n_base=n_base, seed=seed, **kw)
    df = spark.createDataFrame(pdf).repartition(8)
    return df, pairs


def transcripts_spark_distributed(spark, n_base: int, seed: int = 0,
                                  parallelism: int | None = None):
    """Cluster-side corpus generation for benchmark scale (millions of
    turns): numpy-vectorized text synthesis inside mapInPandas over
    spark.range — each conversation derives from its own
    np.random.default_rng([seed, i]), so output is deterministic per
    (n_base, seed) and independent of partitioning. Duplicate structure
    (exact ~15%, near ~15%) mirrors generate_transcripts; no
    ground-truth pairs table (bench doesn't score recall).
    """
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ])
    words = np.array(_WORDS)
    gen_seed = seed

    def gen(batches):
        for pdf in batches:
            conv_ids, turn_idx, texts = [], [], []
            for i in pdf["id"]:
                rng = np.random.default_rng([gen_seed, int(i)])
                n_turns = int(rng.integers(2, 13))
                lens = rng.integers(5, 41, n_turns)
                idx = rng.integers(0, len(words), int(lens.sum()))
                w = words[idx]
                bounds = np.cumsum(lens)[:-1]
                conv_texts = [" ".join(seg) for seg in np.split(w, bounds)]
                variants = [(f"c{i:09d}", conv_texts)]
                r = rng.random()
                if r < 0.15:
                    variants.append((f"c{i:09d}x", list(conv_texts)))
                elif r < 0.30:
                    sub = rng.choice([0.005, 0.015, 0.04])
                    near = []
                    for t in conv_texts:
                        ws = t.split(" ")
                        mask = rng.random(len(ws)) < sub
                        for j in np.nonzero(mask)[0]:
                            ws[j] = str(words[int(rng.integers(0, len(words)))]) + "~"
                        near.append(" ".join(ws))
                    variants.append((f"c{i:09d}n", near))
                for cid, ts_list in variants:
                    conv_ids.extend([cid] * len(ts_list))
                    turn_idx.extend(range(len(ts_list)))
                    texts.extend(ts_list)
            n = len(conv_ids)
            ti = np.array(turn_idx, dtype=np.int32)
            yield pd.DataFrame({
                "conv_id": conv_ids,
                "turn_idx": ti,
                "role": np.where(ti % 2 == 0, "user", "assistant"),
                "text": texts,
                "tool": pd.array([None] * n, dtype=object),
                "ts": pd.Series([_EPOCH] * n) + pd.to_timedelta(ti, unit="m"),
            })

    p = parallelism or spark.sparkContext.defaultParallelism
    return spark.range(0, n_base, 1, p).mapInPandas(gen, schema)
