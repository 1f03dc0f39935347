"""Skew-resistant equi-join via salting.

AQE's skew-join handles sort-merge splits at runtime, but broadcast-
ineligible joins against a HOT KEY (one key owning a large fraction of
rows) still pin a reducer. Salting fixes the partition math directly:

- fact rows get ``salt = xxhash64(row identity) % k`` — the hot key's
  rows spread over k partitions;
- the (smaller) build side is replicated k times, once per salt;
- join on (key, salt), then drop the salt.

Cost: build side × k (bounded, chosen by the caller), in exchange for
eliminating the straggler reducer. Deterministic — no rand() in the
plan, so retries/speculative tasks agree."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SALT = "__rs_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join left⋈right on left_on=right_on with the left (large,
    skewed) side salted and the right side replicated ``num_salts``×."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (replication breaks right/full outer)")
    l = left.withColumn(
        _SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(num_salts)).cast("int"),
    )
    r = right.withColumn(_SALT, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))))
    joined = l.join(r, (l[left_on] == r[right_on]) & (l[_SALT] == r[_SALT]), how)
    return joined.drop(_SALT)
