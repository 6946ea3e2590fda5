"""Join operators.

Parity targets (reference, /root/reference/):
- J1/J2 FK equi-joins via select_related (services/api/views/list_views.py:137-157;
  models.py:258,276,294) -> broadcast hash joins: the dimension side
  (stocks/exchanges/sectors ~ 20k rows) is orders of magnitude smaller than
  the fact (runs), so at 100 TB the fact never shuffles for these joins.
- J3 join-predicate filter through the FK (filters.py:131-132) -> left-semi.
- J4 null-safe composite merge key (queue_for_delta.py:736-746) -> eqNullSafe.
- J5 existence probe (list_views.py:233) -> left-semi / anti.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fk_join(fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str,
            how: str = "left", hint_broadcast: bool = True) -> DataFrame:
    """FK equi-join with the dimension broadcast (the select_related shape).
    AQE would usually pick broadcast on its own from stats; the explicit
    hint makes the plan deterministic."""
    d = F.broadcast(dim) if hint_broadcast else dim
    return fact.join(d, fact[fact_key] == d[dim_key], how)


def semi_join(df: DataFrame, other: DataFrame, on: Column | Sequence[str]) -> DataFrame:
    """EXISTS: keep df rows with a match in other (no columns from other)."""
    return df.join(other, on, "left_semi")


def anti_join(df: DataFrame, other: DataFrame, on: Column | Sequence[str]) -> DataFrame:
    """NOT EXISTS: keep df rows with no match in other."""
    return df.join(other, on, "left_anti")


def null_safe_key_condition(left: DataFrame, right: DataFrame,
                            keys: Sequence[str],
                            nullable_keys: Sequence[str] = ()) -> Column:
    """Composite-key equality with NULL = NULL on the nullable components —
    the reference's Delta MERGE predicate where metadata rows carry a null
    period_end_date (J4). eqNullSafe compiles to SQL's <=> and stays a
    hashable equi-join key, so the merge join is still a plain shuffle/
    broadcast hash join, not a nested loop."""
    cond = F.lit(True)
    for k in keys:
        cond = cond & (left[k] == right[k])
    for k in nullable_keys:
        cond = cond & left[k].eqNullSafe(right[k])
    return cond


# -- Bloom-filter join pruning -----------------------------------------------

BLOOM_PRIME = 2147483647  # 2^31 - 1; a*(key+1)+b stays well under 2^63
BLOOM_M = 16384           # bits
BLOOM_K = 3               # hash functions


def bloom_constants(k: int = BLOOM_K) -> list[tuple[int, int]]:
    """Deterministic universal-hash constants (a_i, b_i), shared verbatim
    by the SQL oracle generator (same scheme as dedup.minhash_constants,
    different index offsets so the families don't alias)."""
    p = BLOOM_PRIME
    return [(((2654435761 * (i + 3)) % p) | 1, (40503 * (i + 11)) % p)
            for i in range(k)]


def _bloom_positions(key: Column, m: int, k: int) -> Column:
    """Array of k bit positions for a non-negative integer key:
    pos_i = ((a_i*(key+1) + b_i) mod p) mod m — pure bigint arithmetic,
    portable to ANSI SQL (key+1 keeps key=0 off the all-b_i fixed point)."""
    p = BLOOM_PRIME
    return F.array(*[((F.lit(a) * (key + F.lit(1)) + F.lit(b))
                      % F.lit(p)) % F.lit(m)
                     for a, b in bloom_constants(k)])


def bloom_prune_report(build: DataFrame, probe: DataFrame,
                       key: str = "event_id", m: int = BLOOM_M,
                       k: int = BLOOM_K) -> DataFrame:
    """Build a Bloom filter over ``build``'s keys, probe it with
    ``probe``'s keys, and report the pruning quality in one row:
    (m, k_hashes, n_keys, bits_set, n_probed, n_pass, n_members,
    n_false_pos, fp_rate).

    This is the runtime-filter pattern Spark itself injects
    (spark.sql.optimizer.runtimeFilter.bloomFilter.enabled) re-expressed
    as explicit relational algebra so the false-positive economics are
    measurable: at 100 TB the build side aggregates to <= m rows of set
    bit positions (a broadcastable relation no matter how large the
    build input), and the probe is a broadcast join + all-positions-hit
    check — the probe relation never shuffles. A key passes iff ALL k
    of its bit positions are set; members always pass (no false
    negatives, by construction), and fp_rate = false_pos / non_members
    is the fraction of the probe side a semi-join downstream of the
    filter would still have to verify.
    """
    keys_b = build.select(F.col(key).alias("key")).distinct()
    keys_p = probe.select(F.col(key).alias("key")).distinct()
    # set bit positions: <= m rows regardless of build cardinality
    bits = (keys_b.select(F.explode(
        _bloom_positions(F.col("key"), m, k)).alias("pos"))
        .distinct())
    # distinct positions per probe key (two hashes may collide on a
    # position — membership needs every DISTINCT position set)
    ppos = (keys_p.select("key", F.explode(
        _bloom_positions(F.col("key"), m, k)).alias("pos"))
        .distinct())
    hitcnt = (ppos.join(F.broadcast(bits.withColumn("set", F.lit(1))),
                        "pos", "left")
              .groupBy("key")
              .agg((F.count(F.lit(1))
                    == F.sum(F.coalesce(F.col("set"), F.lit(0))))
                   .alias("pass")))
    member = keys_b.withColumn("is_member", F.lit(1))
    scored = hitcnt.join(F.broadcast(member.select("key", "is_member")),
                         "key", "left")
    nbits = bits.agg(F.count(F.lit(1)).cast("long").alias("bits_set"))
    nkeys = keys_b.agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
    passed = F.sum(F.when(F.col("pass"), 1).otherwise(0))
    members = F.sum(F.coalesce(F.col("is_member"), F.lit(0)))
    fpos = F.sum(F.when(F.col("pass")
                        & F.col("is_member").isNull(), 1).otherwise(0))
    nonmem = F.count(F.lit(1)) - members
    return (scored.agg(
        F.lit(m).cast("long").alias("m"),
        F.lit(k).cast("long").alias("k_hashes"),
        F.count(F.lit(1)).cast("long").alias("n_probed"),
        passed.cast("long").alias("n_pass"),
        members.cast("long").alias("n_members"),
        fpos.cast("long").alias("n_false_pos"),
        F.round(F.when(nonmem > 0, fpos / nonmem), 6).alias("fp_rate"))
        .crossJoin(F.broadcast(nkeys))
        .crossJoin(F.broadcast(nbits))
        .select("m", "k_hashes", "n_keys", "bits_set", "n_probed",
                "n_pass", "n_members", "n_false_pos", "fp_rate"))
