"""Skew-safe join strategies.

The north rule requires skew handled *explicitly*: a Zipf-hot key (one
conversation with 10^6 turns, one event_type carrying half the stream)
turns a shuffle join into a single straggler task. The engine's pipeline
handles its own hot spots (salted ingest repartition, assembly.py:23;
AQE skew-split elsewhere); this module exposes the same technique as a
first-class operator for user joins.

``skew_salted_join`` is the standard salting scheme: the BIG side gets a
deterministic per-row salt in [0, n_salts); the SMALL side is replicated
n_salts times; the join runs on (key, salt), splitting each hot key's
rows across n_salts tasks. Results are identical to the plain equi-join
(each big row still meets every matching small row exactly once), which
is what the DuckDB oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the big side salted.

    The salt is ``xxhash64(all big-side columns) mod n_salts`` —
    deterministic (re-runs and retries produce identical partition
    routing; no RNG), and uniform even when the join key itself is
    constant. The small side fans out ``n_salts``× via one in-row
    ``explode`` (no shuffle on the small side beyond the join's own).

    When to use: the small side is above the broadcast threshold (else
    just ``F.broadcast``) AND the big side's key histogram is skewed
    beyond what AQE's skew-split handles (AQE splits oversized
    *partitions*, but all rows of one key still hash to one partition —
    salting is the only way to split a single key). Cost: small side
    ×n_salts.
    """
    # right/full joins are NOT salting-safe: an unmatched small-side row
    # exists once per salt replica and would null-extend n_salts times
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower().replace("_", "") not in {
            h.replace("_", "") for h in allowed}:
        raise ValueError(
            f"skew_salted_join supports inner/left/semi/anti joins, got "
            f"{how!r} — a right/full join would duplicate unmatched "
            f"small-side rows once per salt replica")
    keys = [on] if isinstance(on, str) else list(on)
    salted_big = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
               F.lit(n_salts)).cast("int"),
    )
    salted_small = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")),
    )
    return (
        salted_big
        .join(salted_small, keys + ["_salt"], how)
        .drop("_salt")
    )
