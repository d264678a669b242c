"""Suffix-array exact-substring (containment) dedup path — north-rule
addition; the reference has no substring pipeline (SURVEY §7.4).

Semantics: document A is "contained" in document B iff A's full cleaned
text occurs as a substring of B's cleaned text (equality counts). Output
edges (contained -> container) feed the shared CC/annotate/prune sinks.

Algorithm, per partition (mapInPandas):
  1. Concatenate the partition's cleaned texts with '\\x00' separators.
  2. Build the suffix array with a numpy prefix-doubling sort
     (Manber-Myers, O(n log^2 n), fully vectorized via np.lexsort).
  3. A doc's text t (len L>0) occurs somewhere else iff an SA-neighbor of
     the suffix starting at the doc's own offset also has t as prefix
     (the suffixes prefixed by t form a contiguous SA range containing
     the doc's own suffix, so range size >= 2 is visible at a neighbor).
     Walk the range in both directions to emit every (contained,
     container) pair; occurrences never span the '\\x00' separator
     because t contains none.

Scale note: detection is partition-local. `scope="global"` coalesces to
one partition (exact, small corpora); `scope="partition"` keeps the
input partitioning and finds within-partition containment only — at
cluster scale, pre-repartitioning by a content key (e.g. first shingle)
raises cross-partition recall. Documented bound, not a silent cap.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from minhash_rs_spark.functions.kernel import clean_text

EDGE_SCHEMA = T.StructType([
    T.StructField("src", T.StringType(), False),   # contained doc
    T.StructField("dst", T.StringType(), False),   # a container of it
])


def suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of a uint8/int array via prefix doubling.

    Returns `order`: positions sorted by suffix. Vectorized: each round
    lexsorts (rank[i], rank[i+k]) pairs and re-ranks.
    """
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.asarray(s, dtype=np.int64)
    tmp = np.empty(n, dtype=np.int64)
    k = 1
    while True:
        nxt = np.full(n, -1, dtype=np.int64)
        nxt[:n - k] = rank[k:]
        order = np.lexsort((nxt, rank))
        tmp[order[0]] = 0
        changed = (rank[order[1:]] != rank[order[:-1]]) | \
                  (nxt[order[1:]] != nxt[order[:-1]])
        tmp[order[1:]] = np.cumsum(changed)
        rank = tmp.copy()
        if rank[order[-1]] == n - 1:
            return order
        k *= 2


def _partition_containment(texts: list[str], ids: list[str]) -> list[tuple[str, str]]:
    """All (contained_id, container_id) pairs within one partition."""
    cleaned = [clean_text(t or "") for t in texts]
    # drop empty docs: "" is a substring of everything — not a useful edge
    keep = [i for i, t in enumerate(cleaned) if t]
    if len(keep) < 2:
        return []
    parts, offsets, lens = [], [], []
    pos = 0
    for i in keep:
        t = cleaned[i]
        offsets.append(pos)
        lens.append(len(t))
        parts.append(t)
        pos += len(t) + 1
    big = "\x00".join(parts)
    data = np.frombuffer(big.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    # offsets above are in characters; redo in bytes for non-ascii safety
    if len(data) != len(big):
        boff, p = [], 0
        for t in parts:
            boff.append(p)
            p += len(t.encode("utf-8")) + 1
        offsets = boff
        lens = [len(t.encode("utf-8")) for t in parts]
        bbytes = big.encode("utf-8")
    else:
        bbytes = big.encode("utf-8")
    sa = suffix_array(data)
    rank_of = np.empty(len(sa), dtype=np.int64)
    rank_of[sa] = np.arange(len(sa))
    starts = np.asarray(offsets, dtype=np.int64)
    edges: list[tuple[str, str]] = []
    for j, i_doc in enumerate(keep):
        off, L = offsets[j], lens[j]
        t = bbytes[off:off + L]
        r = rank_of[off]
        # expand the SA range of suffixes prefixed by t around rank r
        for step in (-1, 1):
            q = r + step
            while 0 <= q < len(sa):
                p = int(sa[q])
                if bbytes[p:p + L] != t:
                    break
                # map occurrence position -> containing doc
                d = int(np.searchsorted(starts, p, side="right")) - 1
                if keep[d] != i_doc:
                    edges.append((ids[i_doc], ids[keep[d]]))
                q += step
    return edges


def containment_edges(docs: DataFrame, scope: str = "global",
                      text_col: str = "doc_text") -> DataFrame:
    """(conv_id, doc_text) -> (src=contained, dst=container) edges."""
    src = docs.select("conv_id", text_col)
    if scope == "global":
        src = src.coalesce(1)
    elif scope != "partition":
        raise ValueError(f"unknown scope {scope!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids: list[str] = []
        texts: list[str] = []
        for pdf in batches:
            ids.extend(pdf["conv_id"].tolist())
            texts.extend(pdf[text_col].tolist())
        out = _partition_containment(texts, ids)
        yield pd.DataFrame(out, columns=["src", "dst"])

    return src.mapInPandas(fn, EDGE_SCHEMA).distinct()


def containment_cc(docs: DataFrame, scope: str = "global",
                   text_col: str = "doc_text") -> DataFrame:
    """Cluster docs connected by containment: (conv_id, cc_id)."""
    from minhash_rs_spark.operators.connected_components import connected_components

    edges = containment_edges(docs, scope, text_col)
    # canonical orientation for CC: (larger, smaller)
    from pyspark.sql import functions as F
    e = edges.select(F.greatest("src", "dst").alias("src"),
                     F.least("src", "dst").alias("dst"))
    return connected_components(e)
