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
