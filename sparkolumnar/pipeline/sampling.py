"""Deterministic corpus sampling — the downsampling/rebalancing step of
a training-data pipeline, built so the SAME rows are selected on every
run, on any cluster size, and by any engine.

Spark's df.sample() draws from a per-partition RNG: the selected rows
change with the partitioning, a retried task can sample differently
than its first attempt, and no other engine can reproduce the set.
Hash-threshold sampling fixes all three: a row is kept iff
uniform_hash(salt, key) < fraction * 2^32 — a pure function of the
row's key, so the sample is stable under repartitioning, retries,
resumes, AND recomputable in SQL (the DuckDB oracle re-derives it
bit-for-bit). This is the standard trick for reproducible corpus
subsets (cf. TABLESAMPLE-by-hash in Hive/BigQuery).

All expressions are JVM-side (md5 + conv + comparisons) — zero Python
in the row path; the plan is a single Filter that whole-stage-codegens
into the scan.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_SPACE = 1 << 32


def sample_hash(key: Column, salt: str = "s0") -> Column:
    """Uniform 32-bit hash of a key column: the first 8 hex digits of
    md5(salt || key) as a bigint in [0, 2^32). md5 (not xxhash64)
    because every SQL engine has it with identical output — the
    cross-engine reproducibility contract."""
    return F.conv(F.substring(
        F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8),
        16, 10).cast("long")


def deterministic_sample(df: DataFrame, key_col: str, fraction: float,
                         salt: str = "s0") -> DataFrame:
    """Keep ~fraction of rows, selected by key hash — deterministic,
    partitioning-independent, engine-reproducible. Different salts give
    independent samples (held-out splits: salt='train' / salt='val')."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    thr = int(fraction * _HASH_SPACE)
    return df.where(sample_hash(F.col(key_col), salt) < F.lit(thr))


def stratified_sample(df: DataFrame, strata_col: str, key_col: str,
                      fractions: Dict[str, float],
                      default_fraction: float = 0.0,
                      salt: str = "s0") -> DataFrame:
    """Per-stratum hash-threshold sampling — the language/source
    REBALANCING step of a web-corpus pipeline (e.g. keep 10% of the
    dominant language, 100% of the rare ones). fractions maps stratum
    value -> keep fraction; unlisted strata keep default_fraction.
    Same determinism contract as deterministic_sample; the threshold
    lookup is a when()-chain, still one codegen'd Filter."""
    for k, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0, 1]")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError("default_fraction must be in [0, 1]")
    thr = F.lit(int(default_fraction * _HASH_SPACE))
    for k, f in sorted(fractions.items()):
        cond = F.col(strata_col) == F.lit(k)
        thr = F.when(cond, F.lit(int(f * _HASH_SPACE))).otherwise(thr)
    return df.where(sample_hash(F.col(key_col), salt) < thr)
