"""Skew-mitigation joins: the manual salting pattern for hot join keys.

The session enables AQE skew-join splitting (session.py), which handles
most skew at runtime by splitting oversized partitions of a sort-merge
join. Manual salting remains the answer when (a) the skew is known and
extreme (one key holding >1/shuffle-partitions of the table — AQE splits
the partition but every split still collides with the same right-side
rows), (b) the join must stay a hash join, or (c) the engine runs with AQE
off. The pattern: derive a deterministic salt on the BIG side spreading
each hot key across ``n_salts`` reducers, replicate the SMALL side once
per salt value, and equi-join on (key, salt). Replication multiplies the
small side by n_salts — use only when the small side is too big to
broadcast outright but n_salts copies still fit comfortably in the
shuffle.

`salted_join` is semantically identical to the plain equi-join for
inner/left-flavored joins (the oracle-gated query proves it
hash-for-hash); the salt column never leaks into the result. Right/full
outer flavors are REJECTED: the right side is replicated ``n_salts``×,
so every unmatched right row would be emitted once per salt value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` (big, possibly hot-keyed) with ``right`` (small
    but not broadcastable) on ``on``, spreading each left key across
    ``n_salts`` shuffle partitions.

    The salt derives from a hash of the left row's full column set —
    deterministic under retries (pure column function), uniform enough to
    split a hot key, and never requiring a row id. Right rows are
    replicated with explode over the literal salt range (no shuffle added;
    the replication rides the existing exchange).

    Only inner/left-flavored joins are equivalent to the plain join:
    unmatched RIGHT rows exist ``n_salts`` times after replication, so
    right/full (and right_semi/right_anti) would duplicate them — rejected.
    """
    allowed = {"inner", "left", "leftouter", "leftsemi", "semi",
               "leftanti", "anti"}
    if how.lower().replace("_", "") not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not salt-equivalent — the right "
            f"side is replicated {n_salts}x, so unmatched right rows would "
            "be duplicated. Use inner/left/left_semi/left_anti, or a plain "
            "join for right/full outer."
        )
    salt = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    lft = left.withColumn("__salt", salt)
    rgt = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return lft.join(rgt, [*on, "__salt"], how).drop("__salt")
