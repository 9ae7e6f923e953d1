"""Deterministic corpus sampling / splitting for training-data pipelines.

``df.sample()`` is seed-stable only for a FIXED partitioning — a
repartition, AQE re-plan, or file-split change reshuffles which rows
the Bernoulli draw hits, so two runs of "the same 10% sample" diverge.
Training pipelines need content-addressed sampling: membership decided
by a pure function of the ROW KEY, independent of physical layout, so
a sample is reproducible across runs, engines, cluster sizes, and
incremental re-ingests (a new file never changes which OLD rows are
in-sample).

Mechanics: Park–Miller/Lehmer hash ``(key * 48271) % (2^31 - 1)``,
then a basis-point threshold.  Pure int64 arithmetic — exact in Spark
(ANSI-safe for keys < ~1.9e14) and in any SQL engine, which is what
makes the DuckDB oracle bit-exact.  The multiplier is a full-period
MLCG root, so consecutive keys land uniformly: per-stratum realized
rates converge to the requested basis points.

At 100 TB this is the cheapest possible operator: one scan, a filter
of two integer ops pushed into whole-stage codegen, no shuffle.
"""

from __future__ import annotations

from typing import Mapping, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LEHMER_MULT = 48271
LEHMER_MOD = 2_147_483_647  # 2^31 - 1, Park–Miller modulus
BPS_SCALE = 10_000


def sample_hash(key: Column) -> Column:
    """Layout-independent per-row draw in [0, 10000) from an integer
    key.  Keys must be non-negative and < ~1.9e14 (i64 overflow bound
    under ANSI mode — raise, never wrap silently)."""
    return (key.cast("long") * LEHMER_MULT) % LEHMER_MOD % BPS_SCALE


def dd_sample_hash(key: str) -> str:
    """DuckDB twin of :func:`sample_hash` (identical int arithmetic)."""
    return f"((({key} * {LEHMER_MULT}) % {LEHMER_MOD}) % {BPS_SCALE})"


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    rate_bps: int = 1000,
    strata_col: Optional[str] = None,
    strata_bps: Optional[Mapping[str, int]] = None,
) -> DataFrame:
    """Keep each row iff its key-hash draw falls under the rate.

    ``rate_bps``: flat rate in basis points (1000 = 10%).  With
    ``strata_col`` + ``strata_bps`` the rate is per stratum (e.g.
    downsample dominant languages harder: ``{"en": 500, "de": 2000}``),
    unlisted strata falling back to ``rate_bps`` — the standard
    rebalancing step before training-corpus assembly."""
    draw = sample_hash(F.col(key_col))
    if strata_col is None:
        return df.filter(draw < rate_bps)
    thr: Column = F.lit(rate_bps)
    for value, bps in sorted((strata_bps or {}).items()):
        thr = F.when(F.col(strata_col) == value, F.lit(bps)).otherwise(thr)
    return df.filter(draw < thr)


def dd_deterministic_sample(
    select_cols: str,
    from_table: str,
    key: str,
    rate_bps: int,
    strata_col: Optional[str] = None,
    strata_bps: Optional[Mapping[str, int]] = None,
) -> str:
    """DuckDB twin of :func:`deterministic_sample` as a full SELECT."""
    draw = dd_sample_hash(key)
    if strata_col is None:
        thr = str(rate_bps)
    else:
        whens = " ".join(
            f"WHEN {strata_col} = '{v}' THEN {b}"
            for v, b in sorted((strata_bps or {}).items())
        )
        thr = f"(CASE {whens} ELSE {rate_bps} END)"
    return f"SELECT {select_cols} FROM {from_table} WHERE {draw} < {thr}"


def train_test_split(
    df: DataFrame, key_col: str, test_bps: int = 1000
) -> tuple[DataFrame, DataFrame]:
    """Deterministic, leakage-free (train, test) split: the draw is a
    pure key function, so the same document can never migrate between
    splits across runs or repartitions (the property random splits
    lose the moment the pipeline is re-run on appended data)."""
    draw = sample_hash(F.col(key_col))
    return df.filter(draw >= test_bps), df.filter(draw < test_bps)
