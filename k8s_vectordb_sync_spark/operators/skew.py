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

`salted_join` is semantically identical to the plain equi-join (the
oracle-gated query proves it hash-for-hash); the salt column never leaks
into the result.
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
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    lft = left.withColumn("__salt", salt)
    rgt = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return lft.join(rgt, [*on, "__salt"], how).drop("__salt")
