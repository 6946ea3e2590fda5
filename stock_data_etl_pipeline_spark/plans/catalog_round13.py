"""Round-13 catalog entries (consolidation round — two targeted
deepenings the round-12 verdict named, nothing else):

* ANN index tuning — recall@k of the IVF index as a FUNCTION of the
  probe budget (`ann_recall_vs_nprobe`): the curve read before
  choosing nprobe, one exact-hash row per probe budget against the
  brute-force ground truth (extends catalog_text's single-point
  `ann_recall_at_k`).
* streaming interval-join twin — the live event stream probed against
  the STATIC session-interval table (point-in-interval stream-static
  join, broadcast per micro-batch) and counted per session
  (`streaming_interval_counts`): the streaming twin of
  catalog_streaming's batch `events_interval_join`.

Every entry follows the exact-integer oracle discipline (COVERAGE.md):
deterministic 6-dp-rounded cosine ranks with id tie-breaks, BIGINT
casts on every aggregate, single-division emits.

MUST import after the other catalog modules (see plans/__init__) so
the never-checked rotation ranks these behind anything still waiting
for a first driver window.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .catalog import register
from .catalog_text import _query_vec

ANN_SWEEP_NPROBES = (1, 2, 4, 8)
ANN_SWEEP_K = 10


def _ann_sweep_sql(nprobes: tuple = ANN_SWEEP_NPROBES,
                   k: int = ANN_SWEEP_K) -> str:
    """Oracle for the nprobe sweep, interpolating the SAME constants
    the Spark builder uses (the repo pattern — _coverage_sql /
    ACF_MAX_LAG): hardcoding them separately lets a constant tweak
    desync the two sides silently (round-13 review finding)."""
    # mirror ivf_recall_sweep's entry normalization (dedup + sort) so a
    # caller passing duplicates keeps both sides on one-row-per-nprobe
    nprobes = sorted({int(n) for n in nprobes})
    values = ", ".join(f"({n})" for n in nprobes)
    max_np = nprobes[-1]
    return f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
bf AS (SELECT vec_id FROM (
         SELECT vec_id,
                row_number() OVER (ORDER BY
                    round(list_cosine_similarity(e.embedding::DOUBLE[],
                                                 q.qv), 6) DESC,
                    vec_id) AS rank
         FROM embeddings e, q) WHERE rank <= {k}),
cent AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
         FROM embeddings WHERE vec_id % 40 = 0),
pranked AS (SELECT cid,
                   row_number() OVER (ORDER BY
                       round(list_cosine_similarity(cv, qv), 6) DESC,
                       cid) AS prank
            FROM cent, q QUALIFY prank <= {max_np}),
assigned AS (SELECT e.vec_id, c.cid, e.embedding::DOUBLE[] AS v,
                    row_number() OVER (PARTITION BY e.vec_id
                        ORDER BY round(list_cosine_similarity(
                                 e.embedding::DOUBLE[], c.cv), 6) DESC,
                                 c.cid) AS rn
             FROM embeddings e CROSS JOIN cent c),
cand AS (SELECT a.vec_id, p.prank,
                round(list_cosine_similarity(a.v, q.qv), 6) AS score
         FROM assigned a JOIN pranked p USING (cid), q WHERE a.rn = 1),
np AS (SELECT * FROM (VALUES {values}) AS t(nprobe)),
ivf AS (SELECT np.nprobe, c.vec_id,
               row_number() OVER (PARTITION BY np.nprobe
                                  ORDER BY c.score DESC, c.vec_id) AS rk
        FROM cand c JOIN np ON c.prank <= np.nprobe),
hits AS (SELECT nprobe, CAST(count(*) AS BIGINT) AS n_hits
         FROM ivf JOIN bf USING (vec_id) WHERE rk <= {k} GROUP BY nprobe)
SELECT CAST(np.nprobe AS BIGINT) AS nprobe, CAST({k} AS BIGINT) AS k,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(COALESCE(h.n_hits, 0) / {k}.0, 6) AS recall
FROM np LEFT JOIN hits h USING (nprobe) ORDER BY nprobe
"""


@register("ann_recall_vs_nprobe", _ann_sweep_sql())
def ann_recall_vs_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IVF recall-vs-nprobe tuning curve: one exact recall@10 row per
    # probe budget, sharing ONE assignment/scoring pass across the
    # sweep. Centroid probe ranks ride a distributed top-k (never a
    # data-scaled global window); the per-nprobe rank runs on the
    # ≤ max(nprobes)·k-row per-cell-top-k pool (a union's top-k is a
    # subset of the union of per-cell top-ks).
    from ..operators import similarity as SIM
    e = load_table(spark, sf_dir, "embeddings")
    centroids = (e.filter(F.col("vec_id") % 40 == 0)
                 .select(F.col("vec_id").alias("centroid_id"),
                         F.col("embedding").alias("centroid")))
    return SIM.ivf_recall_sweep(e, centroids, _query_vec(spark, sf_dir),
                                k=ANN_SWEEP_K, nprobes=ANN_SWEEP_NPROBES)


@register("streaming_interval_counts", """
WITH o AS (SELECT user_id, ts, event_id,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      AS prev
           FROM events),
m AS (SELECT user_id, ts, event_id,
             CASE WHEN prev IS NULL
                       OR date_diff('second', prev, ts) > 1800 THEN 1
                  ELSE 0 END AS is_new
      FROM o),
s AS (SELECT user_id, ts, event_id,
             CAST(sum(is_new) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS session_id
      FROM m)
SELECT user_id, session_id, min(ts) AS session_start,
       CAST(count(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, session_id
ORDER BY user_id, session_id
""")
def streaming_interval_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # streaming twin of events_interval_join: the LIVE event stream
    # probed against the static session-interval table (broadcast
    # point-in-interval join per micro-batch), counted per session.
    # Gap sessions partition each user's events, so the drained result
    # equals the batch sessionization's per-session counts exactly.
    from ..streaming.events import sessionize, streaming_interval_join_counts
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts")
    iv = sessionize(ev, gap_seconds=1800)
    return streaming_interval_join_counts(
        spark, os.path.join(sf_dir, "events.parquet"), iv)
