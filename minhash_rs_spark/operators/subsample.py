"""Duplicate-aware subsampling
(ref: /root/reference/src/dup_aware_subsample.rs:70-185).

Semantics preserved exactly: whole components are kept or dropped
together (all-or-nothing), a component survives iff
    rand(seed) < subsample_rate  AND  cc_size <= max_cc_size,
evaluated ONCE per component (ref make_surviving_ccs :142-160), then a
semi-join keeps the member docs (ref :162-185).

Determinism: the reference draws from a global RNG in component-iteration
order (irreproducible across runs); we derive the draw from the cc_id
itself — r = (xxhash64(cc_id, seed) scaled to [0,1)) — so a given
(cc_id, seed) always makes the same decision, independent of
partitioning, cluster size, or row order. This is what makes the op
resumable / re-runnable with identical output (north rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _unit_uniform(col, seed: int, method: str = "xxhash"):
    """Deterministic pseudo-uniform in [0,1) from a column value + seed.

    method="xxhash" (default): low 48 bits of xxhash64 / 2^48 (48 bits
    keeps the int exact in a double); works on any column type.
    method="poly": Knuth multiplicative hash mod 1e9+7 — weaker, but
    replayable in any SQL engine (used by the DuckDB correctness
    oracle); requires a numeric-castable id.
    """
    if method == "xxhash":
        h = F.xxhash64(col, F.lit(seed))
        return (F.pmod(h, F.lit(2 ** 48)).cast("double") / F.lit(float(2 ** 48)))
    if method == "poly":
        h = ((col.cast("long") + F.lit(seed)) * F.lit(2654435761) + F.lit(seed)) \
            % F.lit(1_000_000_007)
        return h.cast("double") / F.lit(1_000_000_007.0)
    raise ValueError(f"unknown rand method {method!r}")


def surviving_components(assignments: DataFrame, subsample_rate: float,
                         max_cc_size: int | None = None,
                         seed: int = 0, method: str = "xxhash") -> DataFrame:
    """Distinct cc_ids that survive the Bernoulli draw + size gate."""
    ccs = assignments.select("cc_id", "cc_size").distinct()
    keep = _unit_uniform(F.col("cc_id"), seed, method) < F.lit(subsample_rate)
    if max_cc_size is not None:
        keep = keep & (F.col("cc_size") <= F.lit(max_cc_size))
    return ccs.where(keep).select("cc_id")


def dup_aware_subsample(assignments: DataFrame, subsample_rate: float,
                        max_cc_size: int | None = None,
                        seed: int = 0, method: str = "xxhash") -> DataFrame:
    """Filter the assignment table to members of surviving components.

    Returns (conv_id, cc_id, cc_size, cc_idx) — join back to turns with a
    left_semi on conv_id (same sink as prune_turns). The survivor set is
    usually small relative to docs -> broadcastable; left Catalyst/AQE
    decide (it broadcasts under the threshold automatically).
    """
    surv = surviving_components(assignments, subsample_rate, max_cc_size,
                                seed, method)
    return assignments.join(surv, "cc_id", "left_semi")
