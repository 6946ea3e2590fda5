"""Incremental view maintenance (IVM) from a change feed.

At 100 TB a maintained rollup cannot re-aggregate its base table per
batch; the change feed between adjacent table versions is proportional to
the CHANGE SET, and sum/count-style aggregates are self-maintainable:
every CDF row carries a +1/-1 weight (insert/update_postimage add,
delete/update_preimage retract), the weighted per-group deltas are one
small aggregation, and a full-outer merge folds them into the maintained
state — groups whose count reaches zero drop out. This is the classical
counting algorithm of incremental view maintenance (Gupta/Mumick '95),
the same maintenance strategy streaming engines apply to retractable
aggregates (Flink's upsert streams).

Requires the CDF with preimages: ``ManagedTable.diff(...,
include_preimage=True)``. Maintainable measures here: count + SUM-based
(avg derives as sum/count downstream); min/max are NOT self-maintainable
under deletes (a retracted max needs the base table) — keep those in a
recompute rollup.

Shape: one combiner-friendly aggregation over the change set + one join
against the (group-cardinality-sized) aggregate — never touches the base
table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ADDS = ("insert", "update_postimage")


def rollup_delta(cdf: DataFrame, group_cols: Sequence[str],
                 sum_cols: Sequence[str],
                 count_col: str = "n") -> DataFrame:
    """Per-group (d_count, d_sum...) from a preimage-bearing change feed."""
    w = F.when(F.col("_change_type").isin(*_ADDS), F.lit(1)) \
         .otherwise(F.lit(-1))
    return (cdf.withColumn("_w", w)
            .groupBy(*group_cols)
            .agg(F.sum("_w").alias(f"_d_{count_col}"),
                 *[F.sum(F.col(c) * F.col("_w")).alias(f"_d_{c}")
                   for c in sum_cols]))


def apply_rollup_delta(agg: DataFrame, delta: DataFrame,
                       group_cols: Sequence[str], sum_cols: Sequence[str],
                       count_col: str = "n") -> DataFrame:
    """Fold the deltas into the maintained aggregate; groups reaching a
    zero count disappear (their sums are exactly retracted by then)."""
    joined = agg.join(delta, list(group_cols), "full_outer")
    zero = F.lit(0)
    out = joined.select(
        *group_cols,
        (F.coalesce(F.col(count_col), zero)
         + F.coalesce(F.col(f"_d_{count_col}"), zero)).alias(count_col),
        *[(F.coalesce(F.col(c), zero)
           + F.coalesce(F.col(f"_d_{c}"), zero)).alias(c)
          for c in sum_cols])
    return out.filter(F.col(count_col) > 0)


def incremental_rollup(agg: DataFrame, cdf: DataFrame,
                       group_cols: Sequence[str], sum_cols: Sequence[str],
                       count_col: str = "n") -> DataFrame:
    """Maintain ``agg`` (count + sums per group) under the change feed."""
    return apply_rollup_delta(
        agg, rollup_delta(cdf, group_cols, sum_cols, count_col),
        group_cols, sum_cols, count_col)


def streaming_maintain_rollup(stream: DataFrame, table,
                              group_cols: Sequence[str],
                              sum_cols: Sequence[str],
                              checkpoint: str,
                              count_col: str = "n"):
    """Maintain a rollup ManagedTable from a STREAM of change rows: each
    micro-batch's deltas fold into the table inside ``foreachBatch`` —
    the streaming face of incremental_rollup. The checkpoint gives
    exactly-once batch application across restarts (same contract as the
    foreachBatch MERGE ingest); the rollup table is group-cardinality
    sized, so the per-batch overwrite is dashboard-scale, not
    fact-scale. Returns the started query (caller awaits)."""
    def fold(batch_df: DataFrame, _bid: int) -> None:
        delta = rollup_delta(batch_df, group_cols, sum_cols, count_col)
        if table.exists():
            table.overwrite(apply_rollup_delta(
                table.read(), delta, group_cols, sum_cols, count_col))
        else:
            table.create(delta.select(
                *group_cols,
                F.col(f"_d_{count_col}").alias(count_col),
                *[F.col(f"_d_{c}").alias(c) for c in sum_cols])
                .filter(F.col(count_col) > 0))

    return (stream.writeStream.foreachBatch(fold)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start())


def _signed(cdf: DataFrame, cols: Sequence[str]) -> DataFrame:
    w = F.when(F.col("_change_type").isin(*_ADDS), F.lit(1)) \
         .otherwise(F.lit(-1))
    return cdf.select(*cols, w.alias("_w"))


def join_view_delta(dl: DataFrame, r_old: DataFrame,
                    l_new: DataFrame, dr: DataFrame,
                    on: Sequence[str],
                    view_cols: Sequence[str]) -> DataFrame:
    """Change set for a maintained INNER equi-join view V = L JOIN R.

    The sequential delta rule: apply the left change against the OLD
    right side, then the right change against the NEW left side —
    V2 = V0 + (dL >< R0) + (L1 >< dR) — exact for multisets when delta
    rows carry +1/-1 weights (insert/update_postimage add,
    delete/update_preimage retract; an update is a retraction plus an
    insertion, so moved keys re-join correctly). Both terms are
    change-set-sized joins: the base view and the big tables are never
    re-joined. Returns (view_cols..., _dw) with net weights."""
    on = list(on)
    view_cols = list(view_cols)
    d1 = (_signed(dl, [c for c in dl.columns if c != "_change_type"])
          .join(r_old, on))
    d2 = l_new.join(
        _signed(dr, [c for c in dr.columns if c != "_change_type"]), on)
    return (d1.select(*view_cols, "_w").unionByName(
                d2.select(*view_cols, "_w"))
            .groupBy(*view_cols).agg(F.sum("_w").alias("_dw"))
            .filter(F.col("_dw") != 0))


def apply_join_view_delta(view: DataFrame, delta: DataFrame,
                          view_cols: Sequence[str],
                          count_col: str = "_n") -> DataFrame:
    """Fold a join-view change set into the maintained weighted view
    (rows carry a multiplicity ``count_col``; weight-0 rows drop)."""
    view_cols = list(view_cols)
    joined = view.join(delta, view_cols, "full_outer")
    n = (F.coalesce(F.col(count_col), F.lit(0))
         + F.coalesce(F.col("_dw"), F.lit(0)))
    return (joined.select(*view_cols, n.alias(count_col))
            .filter(F.col(count_col) > 0))


def streaming_maintain_join_view(stream: DataFrame, table,
                                 right: DataFrame,
                                 on: Sequence[str],
                                 view_cols: Sequence[str],
                                 checkpoint: str,
                                 count_col: str = "_n"):
    """Maintain an inner-join view ManagedTable from a STREAM of
    left-side change rows against a static right side — the streaming
    face of join_view_delta (one-sided: dL >< R per micro-batch; for
    two-sided maintenance run batch join_view_delta over both CDFs).
    Each batch's signed delta folds into the weighted view inside
    ``foreachBatch``; the checkpoint makes batch application
    exactly-once across restarts. Per-batch work is change-set x R-key
    sized, never view-sized re-joins. Returns the started query."""
    on = list(on)
    view_cols = list(view_cols)

    def fold(batch_df: DataFrame, _bid: int) -> None:
        d = (_signed(batch_df,
                     [c for c in batch_df.columns if c != "_change_type"])
             .join(right, on)
             .groupBy(*view_cols).agg(F.sum("_w").alias("_dw"))
             .filter(F.col("_dw") != 0))
        if table.exists():
            table.overwrite(
                apply_join_view_delta(table.read(), d, view_cols,
                                      count_col))
        else:
            table.create(d.filter(F.col("_dw") > 0)
                         .withColumnRenamed("_dw", count_col))

    return (stream.writeStream.foreachBatch(fold)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start())


# ---------------------------------------------------------------------------
# Incremental OHLC bar maintenance (append-only tick feed).
#
# Unlike the retractable sum/count rollup above, OHLC bars fold an
# APPEND-ONLY stream (ticks are immutable facts), which makes every bar
# component associative: open/close carry their (ts, event_id) tie-break
# keys so partial bars from different micro-batches combine exactly —
# the classic partial-aggregate ("combiner") shape, persisted. At 100 TB
# the bars table is calendar x symbols sized, so each fold rewrites a
# dashboard-scale table while reading only the batch's ticks — never the
# tick history.
# ---------------------------------------------------------------------------

def ohlc_partial(events: DataFrame) -> DataFrame:
    """Associative partial OHLC per (event_type, hour): open/close via
    struct-keyed min_by/max_by, plus the first/last tie-break keys and
    sum_value so partials re-combine exactly (avg derives at read)."""
    key = F.struct("ts", "event_id")
    return (events
            .withColumn("hr", F.date_trunc("hour", F.col("ts")))
            .groupBy("event_type", "hr")
            .agg(F.min_by("value", key).alias("open"),
                 F.max("value").alias("high"),
                 F.min("value").alias("low"),
                 F.max_by("value", key).alias("close"),
                 F.count(F.lit(1)).alias("volume"),
                 F.sum("value").alias("sum_value"),
                 F.min(key).alias("_first"),
                 F.max(key).alias("_last"))
            .select("event_type", "hr", "open", "high", "low", "close",
                    "volume", "sum_value",
                    F.col("_first.ts").alias("first_ts"),
                    F.col("_first.event_id").alias("first_id"),
                    F.col("_last.ts").alias("last_ts"),
                    F.col("_last.event_id").alias("last_id")))


def combine_ohlc_partials(partials: DataFrame) -> DataFrame:
    """Re-combine partial bars that share (event_type, hr) — associative
    and commutative, so any batching of the tick stream folds to the
    same bars as a single-pass aggregate."""
    fkey = F.struct("first_ts", "first_id")
    lkey = F.struct("last_ts", "last_id")
    return (partials.groupBy("event_type", "hr")
            .agg(F.min_by("open", fkey).alias("open"),
                 F.max("high").alias("high"),
                 F.min("low").alias("low"),
                 F.max_by("close", lkey).alias("close"),
                 F.sum("volume").alias("volume"),
                 F.sum("sum_value").alias("sum_value"),
                 F.min(fkey).alias("_first"),
                 F.max(lkey).alias("_last"))
            .select("event_type", "hr", "open", "high", "low", "close",
                    "volume", "sum_value",
                    F.col("_first.first_ts").alias("first_ts"),
                    F.col("_first.first_id").alias("first_id"),
                    F.col("_last.last_ts").alias("last_ts"),
                    F.col("_last.last_id").alias("last_id")))


def read_ohlc_bars(table) -> DataFrame:
    """Finalize the maintained bars: round the carried raw sum to the
    0.01 tick grid (same grid as indicators.hourly_bars.total_value —
    a derived AVERAGE would sit on 6-dp rounding knife-edges for
    power-of-two volumes) and drop the combine-only tie-break keys."""
    return (table.read()
            .select("event_type", "hr", "open", "high", "low", "close",
                    "volume",
                    F.round(F.col("sum_value"), 2).alias("total_value")))


def streaming_maintain_ohlc(stream: DataFrame, table, checkpoint: str):
    """Maintain an OHLC bars ManagedTable from a live tick stream: each
    micro-batch folds its partial bars into the table inside
    ``foreachBatch``.

    Replay-safe (exactly-once effect): the epoch id commits ATOMICALLY
    with the fold (``overwrite(meta={'epoch': id})``); a replayed batch
    (foreachBatch is at-least-once after a crash) sees its own epoch in
    the latest commit meta and skips — folding is NOT idempotent
    (volume/sum would double-count), so the guard is load-bearing where
    the MERGE-based ingest can rely on key idempotency instead.

    Returns the started query (caller awaits)."""
    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if table.exists():
            last = table.commit_meta().get("epoch")
            if last is not None and epoch_id <= last:
                return  # replayed batch, already folded
        partial = ohlc_partial(batch_df)
        if table.exists():
            partial = combine_ohlc_partials(
                table.read().unionByName(partial))
        table.overwrite(partial, meta={"epoch": epoch_id})

    return (stream.writeStream.foreachBatch(fold)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start())
