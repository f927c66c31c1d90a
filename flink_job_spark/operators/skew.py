"""Skew mitigation: salting utilities for hot keys.

AQE's skew-join handles moderate runtime skew automatically (enabled in
session.py); these helpers are for the pathological cases a 100 TB corpus
produces structurally — stop-shingles in dedup, null-heavy join keys, a few
users emitting most events — where the fix belongs in the plan itself.

Two standard shapes:

- ``salted_agg``: two-phase aggregation — add a random-ish salt to the key,
  partially aggregate (key, salt) shards in a first shuffle, then merge the
  shards in a second, tiny shuffle. The salt here is deterministic
  (hash of a tiebreaker column mod N) so results are reproducible and
  oracle-checkable; functionally it spreads a hot key over N reducers exactly
  like a random salt.
- ``salted_broadcast_left``: replicate-broadcast join for a skewed LEFT key —
  explode the (small) right side N ways so the left side can join on
  (key, salt) without ever shuffling the big side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, tiebreak_col: str, n_salts: int,
              salt_col: str = "__salt") -> DataFrame:
    """Deterministic salt in [0, n_salts): xxhash of a per-row tiebreaker."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(F.col(tiebreak_col)), F.lit(n_salts))
    )


def salted_agg(df: DataFrame, key_cols: list[str], tiebreak_col: str,
               aggs: dict[str, Column], n_salts: int = 16) -> DataFrame:
    """Two-phase aggregation for skewed grouping keys.

    ``aggs`` maps output name → a partial-aggregable expression built on the
    INPUT columns; supported merge semantics: sums and counts (the associative
    cases — min/max would merge the same way; averages must be decomposed by
    the caller into sum+count).

    Phase 1 shuffles (key, salt) — a hot key fans out over ``n_salts``
    reducers; phase 2 shuffles only one row per (key, salt), i.e. ~n_salts
    rows per distinct key, regardless of input size.
    """
    salted = with_salt(df, tiebreak_col, n_salts)
    partial = salted.groupBy(*key_cols, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, expr in aggs.items()]
    )
    return partial.groupBy(*key_cols).agg(
        *[F.sum(f"__p_{name}").alias(name) for name in aggs]
    )


def hot_key_split_join(big: DataFrame, other: DataFrame, key: str,
                       hot_keys: list) -> DataFrame:
    """Hot-key isolation join for TWO sides too big to broadcast whole: the
    classic structural fix when AQE skew-join cannot apply (streaming joins,
    or plans where the skewed exchange is reused by another operator).

    Split on the known hot keys: the hot slice of ``other`` is tiny by
    definition (a handful of keys), so the hot slice of ``big`` — the 50% of
    rows AQE would funnel through one reducer — joins it with a BROADCAST
    and never shuffles; only the well-distributed cold remainder takes the
    ordinary shuffle join. Result = exact union of the two disjoint slices.
    Hot keys come from the caller (known stop-keys, nulls-as-key, or a
    pre-computed heavy-hitter sketch — q_heavy_hitters is the miner).

    NULL-keyed rows: ``isin`` evaluates to NULL for them, so the predicate
    is coalesced to false — NULL keys route to the COLD slice, where the
    ordinary join applies the engine's own NULL semantics (inner: dropped,
    identical to a plain join). Without the coalesce BOTH filters would
    drop NULL rows, silently losing them if this helper is ever extended
    to outer join types."""
    hot = F.coalesce(F.col(key).isin(hot_keys), F.lit(False))
    cold = big.filter(~hot).join(other.filter(~hot), key)
    hot_join = big.filter(hot).join(F.broadcast(other.filter(hot)), key)
    return cold.unionByName(hot_join)


def salted_broadcast_left(big: DataFrame, small: DataFrame, key: str,
                          tiebreak_col: str, n_salts: int = 16) -> DataFrame:
    """Join a skew-keyed big side to a broadcastable small side without
    shuffling the big side: salt the big rows, explode the small side across
    all salts, broadcast-join on (key, salt)."""
    salted_big = with_salt(big, tiebreak_col, n_salts)
    exploded_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_big.join(F.broadcast(exploded_small), [key, "__salt"])
    return out.drop("__salt")
