"""Skew-mitigation utilities: salted joins and two-stage per-key top-k.

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin``) handles most
sort-merge-join skew automatically; these helpers cover the cases it does
not: broadcast-ineligible dimension sides with a handful of pathological
hot keys, and window-function skew (rank/top-k over a key whose biggest
group holds a double-digit percentage of the table — AQE cannot split a
window partition).

* :func:`salted_join` — classic salting: the fact side gets a
  deterministic salt in [0, s), the dimension side is replicated s times,
  and the join key becomes (key, salt), spreading each hot key over s
  tasks.  Replication multiplies the dimension side, so s stays small
  (8–64) and the dimension side is the smaller input.
* :func:`top_k_per_key` — two-stage top-k: a first rank inside
  (key, salt) cuts every group to ≤ s·k candidate rows, the second rank
  over (key) finishes exactly.  Both windows see bounded partitions, so
  a billion-row hot key never lands in one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

__all__ = ["salted_join", "top_k_per_key"]


def _check_salt(salt: int) -> None:
    if salt < 1:
        raise ValueError(
            f"salt must be >= 1, got {salt}: pmod(hash, 0) is NULL and "
            f"sequence(0, -1) counts DOWN, so salt=0 silently matches "
            f"nothing instead of erroring")


def _salt_col(df: DataFrame, salt: int, seed: int) -> Column:
    """Per-row salt in [0, salt): xxhash64 over the whole row PLUS
    ``monotonically_increasing_id()``.  The row hash alone gave every
    FULLY-DUPLICATE row of a hot key the same salt — a deduplicated-less
    event log (the classic skew case) landed right back in one task.
    The id term disambiguates identical rows; its value can differ
    across task retries, but both consumers are salt-agnostic — a fact
    row joins exactly its key's (replicated) dimension rows whatever its
    salt, and stage-1 partial top-k is exact under ANY row partition —
    so correctness is unaffected (unlike ``rand()`` feeding a
    salt-SENSITIVE consumer)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns],
                             F.monotonically_increasing_id(),
                             F.lit(seed)), F.lit(salt)).cast("int")


def salted_join(fact: DataFrame, dim: DataFrame, on: list[str] | str,
                how: str = "inner", salt: int = 16,
                seed: int = 42) -> DataFrame:
    """Equi-join with the fact side salted and the dimension side
    replicated ``salt`` times — for hot join keys on a dimension side too
    big to broadcast.  Supported ``how``: inner, left (semantics
    preserved because every fact row carries exactly one salt and every
    (key, salt) pair exists on the replicated dimension side).

    Cost model: dimension side scans/shuffles ×salt; each hot fact key
    spreads over ``salt`` tasks.  Use AFTER checking AQE's skew-join did
    not already solve it, with the smallest salt that flattens the task
    histogram."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left' — other "
                         "join types change row semantics under "
                         "replication")
    _check_salt(salt)
    keys = [on] if isinstance(on, str) else list(on)
    overlap = (set(fact.columns) & set(dim.columns)) - set(keys)
    if overlap:
        raise ValueError(
            f"ambiguous non-key columns present on both sides: "
            f"{sorted(overlap)}; rename before salted_join")
    f_salted = fact.withColumn("__salt", _salt_col(fact, salt, seed))
    d_rep = dim.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0).cast("int"),
                             F.lit(salt - 1).cast("int"))))
    out = f_salted.join(d_rep, [*keys, "__salt"], how)
    return out.drop("__salt")


def top_k_per_key(df: DataFrame, keys: list[str] | str, order_col: str,
                  k: int, descending: bool = True,
                  salt: int = 32, seed: int = 42) -> DataFrame:
    """Exact top-k rows per key, skew-proof.

    ``row_number`` over a skewed key sends the whole hot group to one
    task; here stage 1 ranks inside (key, salt) and keeps ≤ k per salted
    group (any global top-k row is also top-k within its own salted
    subgroup, so nothing true is lost), stage 2 ranks the ≤ salt·k
    survivors per key exactly.  Output carries ``rank`` (1-based).
    Ties break deterministically on the remaining columns' hash."""
    _check_salt(salt)
    key_list = [keys] if isinstance(keys, str) else list(keys)
    oc = F.col(order_col)
    order = [oc.desc(), F.xxhash64(*[F.col(c) for c in df.columns]).asc()] \
        if descending else \
        [oc.asc(), F.xxhash64(*[F.col(c) for c in df.columns]).asc()]
    salted = df.withColumn("__salt", _salt_col(df, salt, seed))
    w1 = Window.partitionBy(*key_list, "__salt").orderBy(*order)
    stage1 = (salted.withColumn("__r1", F.row_number().over(w1))
              .where(F.col("__r1") <= k).drop("__r1", "__salt"))
    w2 = Window.partitionBy(*key_list).orderBy(*order)
    return (stage1.withColumn("rank", F.row_number().over(w2))
            .where(F.col("rank") <= k))
