"""Z-order file layout: interleaved-bit clustering keys for
multi-dimensional scan pruning.

A table queried by EITHER of two columns (reference access paths:
runs by stock AND by state; orders by customer AND by date) can only be
range-clustered on one of them — unless files are laid out along a
space-filling curve. ``zorder_key`` computes the classic Morton key:
each column is scaled to a ``bits``-wide integer rank against its own
min/max (a 1-row broadcast aggregate), and the ranks' bits are
interleaved. Sorting/partitioning by the key places rows close in ANY
of the dimensions into the same few files, so min/max footer stats
prune scans on every participating column, not just the first.

All plain Column arithmetic (subtract/divide/shift/mask) — portable,
deterministic, and engine-identical for integer inputs; the same
formula is the DuckDB oracle (``layout_zorder_orders``). OPTIMIZE
integration: ``ManagedTable.optimize`` already clusters within rewritten
files via ``cluster_by``; pass a ``zorder_key`` projection before the
write (or ``repartitionByRange`` on the key at 100 TB) to get the
curve across files.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Integer rank of ``col`` in [lo, hi] scaled to [0, 2^bits - 1].
    Integer arithmetic throughout (inputs are cast to long): identical
    in any engine, no float rounding at bucket boundaries."""
    span = F.greatest(hi - lo, F.lit(1)).cast("long")
    scaled = ((col.cast("long") - lo.cast("long"))
              * F.lit((1 << bits) - 1)) / span
    return F.floor(scaled).cast("long")


def zorder_key(df: DataFrame, cols: Sequence[str],
               bits: int = 8, out_col: str = "zkey") -> DataFrame:
    """Append the Morton (Z-order) key over ``cols`` as ``out_col``.

    Cost: one 1-row min/max aggregate (broadcast) + one projection —
    the key never shuffles anything by itself. Callers then
    ``repartitionByRange(out_col)`` + write, or hand the key to
    ``ManagedTable`` as ``cluster_by`` for within-file clustering."""
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    bounds = df.agg(*[f for c in cols
                      for f in (F.min(c).alias(f"_lo_{c}"),
                                F.max(c).alias(f"_hi_{c}"))])
    with_b = df.crossJoin(F.broadcast(bounds))
    ranks = [_bucket(F.col(c), F.col(f"_lo_{c}"), F.col(f"_hi_{c}"), bits)
             for c in cols]
    n = len(ranks)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, r in enumerate(ranks):
            # bit b of rank i lands at interleaved position b*n + i
            z = z + F.shiftleft(
                F.shiftright(r, b).bitwiseAND(F.lit(1)), b * n + i)
    return with_b.select(*df.columns, z.alias(out_col))


def compaction_bins(files: DataFrame, size_col: str, target: int,
                    group_col: str = "source",
                    id_col: str = "doc_id") -> DataFrame:
    """Small-file compaction plan: group input files into sequential
    target-sized rewrite bins per table partition — the maintenance op
    that keeps a 100 TB table's file count sane (thousands of tiny
    files per partition → scan-task explosion; the reference's nightly
    Delta OPTIMIZE fills the same role,
    /root/reference/services/workers/tasks/queue_for_delta.py).

    Strategy: files are laid end-to-end in deterministic (group, id)
    order and a bin boundary is cut every ``target`` cumulative bytes;
    a file belongs to the bin its START offset falls in, so every bin
    holds WHOLE files and a bin may overrun ``target`` by less than one
    file — the standard sequential coalesce heuristic (greedy first-fit
    needs per-row mutable state; the start-offset rule is
    window-expressible and within one file size of it).

    The running offset uses ``grouped_running_total`` — the hot-safe
    prefix-sum primitive — so one partition holding most of the bytes
    (the usual reason compaction is needed!) spans many range
    partitions instead of serializing into one window task. Emits one
    row per (group, bin): file count, bin bytes, and an undersized flag
    for tails worth deferring to the next compaction cycle.
    """
    from .windows import grouped_running_total
    sized = files.select(F.col(group_col).alias("source"),
                         F.col(id_col).alias("fid"),
                         F.col(size_col).cast("long").alias("bytes"))
    run = grouped_running_total(
        sized, ["source"], [F.col("fid")], "bytes", out="run")
    start = F.col("run") - F.col("bytes")
    return (run.select("source", "fid", "bytes",
                       F.floor(start / target).cast("long")
                       .alias("bin_id"))
            .groupBy("source", "bin_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_files"),
                 F.sum("bytes").cast("long").alias("bin_bytes"))
            .withColumn("undersized",
                        F.col("bin_bytes") < F.lit(target // 2)))
