"""Session-lifetime registry for operator-internal persisted frames.

Several operators persist a shared subtree that feeds BOTH a small
control-plane action (partition counts, degree collect) AND the lazy
result plan they return (``distributed_ntile``'s range-partitioned
slice, ``adamic_adar``'s undirected edge set, ...). The persist is
mandatory — without it the subtree recomputes per consumer — but the
operator itself can never safely ``unpersist``: the caller has not
materialized the returned DataFrame yet.

Left alone, a long-lived driver session (the 239-query catalog run,
the external verification window, a full bench) accumulates one pinned
RDD per call — the round-5 finding ("CacheManager: Asked to cache
already cached data" spam + monotonically growing storage memory).

The contract here: operators register every such persist through
:func:`pin` or :func:`pin_checkpoint`, and every catalog entry point
releases ALL prior pins before building its own plan (wired into
``plans.catalog.register``). By the time query N+1 starts building,
query N's result has been fully materialized by the harness (driver
collect, oracle compare, bench timing loop), so its pins are dead
weight — releasing them is safe and bounds pinned storage to a single
query's working set.

Two pin flavors, chosen by what a RECOMPUTE of the subtree would do:

- :func:`pin` — plain ``persist``. For subtrees whose recompute is
  merely wasteful, never wrong: deterministic plans (shingle indexes,
  edge sets, tf tables) produce identical rows if Spark ever rebuilds
  them after a release. This is the default.
- :func:`pin_checkpoint` — EAGER ``localCheckpoint``. For subtrees
  whose recompute would be *silently wrong*: the prefix-sum operators
  (``distributed_ntile`` / ``distributed_running_total`` /
  ``grouped_running_total``) collect per-partition offsets keyed by
  ``spark_partition_id()`` over a ``repartitionByRange`` output whose
  boundaries are SAMPLED (RDD-id-seeded) — a recompute can resample,
  shifting rows across partition ids while the stale offsets still
  apply, corrupting every running total. Checkpointing materializes
  the partitioning as data and truncates lineage, so recompute is
  impossible: a consumer that re-executes the frame after a release
  raises ``CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND`` (verified on this
  Spark build) instead of silently returning corrupt rows. This turns
  the round-6 advisory's unenforced build-then-materialize contract
  into a fail-fast invariant.

Standalone callers (tests exercising operators directly, ad-hoc
sessions) can call :func:`release_pinned` themselves once results are
materialized; pins are also harmlessly dropped when the session stops.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

_log = logging.getLogger(__name__)

# (kind, frame-or-path): ("persist", DataFrame) | ("checkpoint",
# DataFrame) | ("cutfile", str parquet path)
_PINNED: list[tuple[str, DataFrame]] = []

# one-shot flag so a Spark upgrade that moves the private accessor logs
# ONCE instead of spamming every release (and instead of failing silent)
_warned_checkpoint_accessor = False


def pin(df: DataFrame) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK default) and register it for
    release at the next catalog entry-point invocation.

    Use ONLY for subtrees whose recompute is harmless (deterministic
    values); see :func:`pin_checkpoint` for offset-carrying frames.

    Idempotent across logically-identical plans: if the cache manager
    already holds this plan (a bench re-attempt, a repeated operator
    call on the same inputs), the existing entry is reused instead of
    re-persisting — that duplicate persist is exactly what produced the
    round-5 "CacheManager: Asked to cache already cached data" spam,
    and re-registering it would let a later release unpersist a frame
    an earlier caller still counts on."""
    try:
        lvl = df.storageLevel
        cached = lvl.useMemory or lvl.useDisk
    except Exception:  # noqa: BLE001 — treat lookup failure as uncached
        cached = False
    if not cached:
        df.persist()
        _PINNED.append(("persist", df))
    return df


def pin_checkpoint(df: DataFrame) -> DataFrame:
    """Eagerly ``localCheckpoint`` ``df`` and register the checkpoint
    for release; returns the checkpointed frame (a ``LogicalRDD`` leaf
    whose rows — including any ``spark_partition_id()`` column — are
    frozen data, not a recomputable plan).

    The correctness-load-bearing pin: offsets collected against this
    frame stay valid for its whole life, and once released the frame
    can only FAIL (checkpoint block not found), never recompute with
    fresh range-sample boundaries. Costs one materialization pass at
    build time — the same pass the control-plane collect was about to
    pay through a plain persist.

    Idempotent across logically-identical plans, like :func:`pin` and
    :func:`pin_cut` (round-14): a repeated build of the same subtree
    (a bench re-attempt, two operators sharing a prefix-sum kernel on
    the same inputs) returns the EXISTING checkpointed frame via
    ``sameResult`` on the analyzed source plans instead of sampling,
    materializing and registering a fresh checkpoint per call — the
    prefix-sum kernels (``distributed_ntile`` / ``*_running_total``)
    paid that rebuild on every bench attempt, so their queries never
    warmed up. Returning the first checkpoint is safe for exactly the
    reason the checkpoint exists: every downstream decision (offset
    collects keyed on ``spark_partition_id()``) is derived from the
    returned frame itself, so any one frozen materialization is
    self-consistent.

    CONTRACT (r14 advice): do not feed plans containing
    NONDETERMINISTIC expressions (rand/uuid/shuffle) through this memo
    — sameResult treats two such plans as equal and a caller expecting
    fresh draws would silently get the first materialization back. The
    repo-wide no-rand() rule makes this unreachable today; if that rule
    ever relaxes, route such frames through a plain eager
    localCheckpoint instead."""
    try:
        new_plan = df._jdf.queryExecution().analyzed()  # noqa: SLF001
        for src, cp in _CHECKPOINTS:
            # sameResult canonicalization strips aliases, so two
            # logically-equal plans differing only in OUTPUT NAMES
            # would hit the same entry and hand the caller a frame
            # with the wrong column names (r14 advice: the four
            # prefix-sum kernels differ only in their pid alias) —
            # guard the hit on the exact column-name list too
            if src.columns == df.columns and \
                    src._jdf.queryExecution().analyzed() \
                    .sameResult(new_plan):  # noqa: SLF001
                return cp
    except Exception:  # noqa: BLE001 — private accessor moved: no memo
        pass
    cp = df.localCheckpoint(eager=True)
    _PINNED.append(("checkpoint", cp))
    _CHECKPOINTS.append((df, cp))
    return cp


# (source frame, checkpointed frame) of live checkpoints — the
# sameResult reuse index; entries drop as release_pinned unpersists
# their checkpoint
_CHECKPOINTS: list[tuple[DataFrame, DataFrame]] = []


def pin_cut(df: DataFrame) -> DataFrame:
    """Materialize ``df`` to a session-temp PARQUET directory and return
    a re-read of it — plan-SIZE bounding, not recompute safety: a
    deterministic subtree referenced by N downstream branches appears N
    times in the ANALYZED tree, and when those branches nest (the
    triangle machinery: edges → adjacency → triangle list → three
    per-vertex credit unions) the tree grows multiplicatively —
    ``graph_closure_by_degree`` compiled a 56k-line / 6,528-scan
    executed plan (round-10 audit) whose Catalyst analysis cost driver
    CPU on every new consumer, even though EXECUTION was already
    bounded by :func:`pin`. The re-read replaces the subtree with a
    single vectorized parquet FileScan leaf.

    Why parquet-reread and not eager ``localCheckpoint`` (the first
    round-11 attempt): a checkpoint leaf is ``Scan ExistingRDD`` over
    deserialized InternalRows — row-based input that breaks columnar
    whole-stage input and re-pays deserialization per consumer;
    at sf0.1 it doubled the whole graph family's wall time
    (clustering 1.8→4.0 s, rich-club 1.8→3.4 s). The parquet roundtrip
    costs one write job but every consumer re-reads through the
    vectorized columnar reader, which is the same executor path the
    original scan used.

    The re-read carries ``df``'s explicit schema (names and types are
    never re-inferred; note Spark marks every file-source column
    nullable on read, so nullability — and only nullability — widens
    across the cut). Row
    ORDER across the roundtrip is partition-arbitrary — callers are
    aggregates/joins, never order-sensitive consumers. The files are
    deleted by :func:`release_pinned` under the same
    materialize-before-release contract as every other pin; a consumer
    re-executed after release fails loudly on the missing path rather
    than silently recomputing.

    Idempotent across logically-identical plans, like :func:`pin`: a
    repeated build of the same subtree (a bench re-attempt, two
    operators sharing a helper on the same inputs) reuses the existing
    cut via ``sameResult`` on the analyzed plans instead of re-writing
    — without this every attempt paid the write job again and the warm
    numbers measured materialization, not the query.

    Use when a pinned subtree has MORE than two downstream references
    or feeds another multiply-referenced subtree; plain :func:`pin` is
    cheaper (lazy, no write job) for the simple two-consumer case.

    EAGER: unlike :func:`pin`, calling this runs the parquet write job
    immediately, at DataFrame-CONSTRUCTION time — an operator built on
    pin_cut (k_core, bfs_distance, ktruss_peel_census, hits_bipartite,
    ...) executes one materialization job per cut the moment its
    builder is called, even if the returned frame is never collected.
    Callers composing plans without executing them pay that cost up
    front; it is the price of bounding Catalyst tree size.

    CLUSTER NOTE: the cut directory must be visible to BOTH the driver
    and every executor. On ``local[*]`` masters a process-temp dir
    works; on a real cluster set ``spark.stockDataEtl.pinCutDir`` to a
    shared filesystem path (HDFS/S3/NFS) — :func:`_cut_root` refuses
    driver-local tmp off-local and falls back to
    ``spark.sql.warehouse.dir`` (shared in any sane cluster deploy)."""
    import os
    import uuid

    try:
        new_plan = df._jdf.queryExecution().analyzed()  # noqa: SLF001
        for src, path in _CUTS:
            if src._jdf.queryExecution().analyzed() \
                    .sameResult(new_plan):  # noqa: SLF001
                return df.sparkSession.read.schema(df.schema).parquet(path)
    except Exception:  # noqa: BLE001 — private accessor moved: write fresh
        pass
    path = _join_uri(_cut_root(df.sparkSession), f"cut-{uuid.uuid4().hex}")
    df.write.mode("error").parquet(path)
    out = df.sparkSession.read.schema(df.schema).parquet(path)
    _CUTS.append((df, path))
    _PINNED.append(("cutfile", path))
    return out


# (source frame, parquet path) of live cuts — the sameResult reuse
# index; cleared alongside _PINNED by release_pinned
_CUTS: list[tuple[DataFrame, str]] = []


def _join_uri(root: str, leaf: str) -> str:
    """Join a child path onto a root that may be a plain local path or
    a scheme-qualified URI (hdfs://, s3a://, file:) — os.path.join would
    mangle the latter on non-POSIX separators."""
    return root.rstrip("/") + "/" + leaf


def _cut_root(spark) -> str:
    """Root directory for pin_cut parquet spills, resolved once per
    (pinCutDir conf, master) CONFIGURATION and removed at interpreter
    exit (release_pinned deletes individual cuts much earlier in
    normal operation). Keying the memo on the resolved config — not
    caching one root unconditionally per process — means a later
    session that sets ``spark.stockDataEtl.pinCutDir`` gets the
    directory it asked for instead of a silently-reused earlier root
    (round-12 advice).

    A cut is WRITTEN by executors and RE-READ by executors, so the root
    must live on storage every node sees. Resolution order:

    1. ``spark.stockDataEtl.pinCutDir`` — explicit operator conf; set
       this to a shared path (HDFS/S3/NFS) on any multi-node deploy.
    2. ``local[...]`` master — driver and executors share one machine
       and one filesystem, so a process-temp dir is safe and fastest.
       An ABSENT ``spark.master`` key (Spark Connect exposes no such
       conf) is treated as NON-local: assuming local here would hand a
       remote cluster a driver-local tempdir invisible to executors —
       exactly the partial-read failure this resolver exists to
       prevent (round-12 advice).
    3. Any other / unknown master — a driver-local tempdir would make
       executors write partitions to THEIR local disks and every
       downstream re-read fail or silently read partial data
       (round-11 advisory), so fall back to
       ``spark.sql.warehouse.dir`` (cluster-visible in any real
       deployment) and log the choice once.
    """
    import atexit

    conf_dir = spark.conf.get("spark.stockDataEtl.pinCutDir", None)
    try:
        master = spark.conf.get("spark.master", None)
    except Exception:  # noqa: BLE001 — Connect may refuse the key
        master = None
    key = (conf_dir, master)
    cached = _CUT_ROOTS.get(key)
    if cached is not None:
        return cached

    # every branch keeps the "spark-pin-cut-" marker in the root
    # name — tools/plan_audit.py counts cut re-reads by that
    # substring, and every branch registers best-effort exit
    # cleanup (round-12 review findings: the conf/warehouse
    # branches previously lost both)
    if conf_dir:
        import uuid

        root = _join_uri(conf_dir, f"spark-pin-cut-{uuid.uuid4().hex}")
    elif master is not None and master.startswith("local"):
        import tempfile

        root = tempfile.mkdtemp(prefix="spark-pin-cut-")
    else:
        import uuid

        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        root = _join_uri(
            warehouse, f"_pin_cut/spark-pin-cut-{uuid.uuid4().hex}")
        _log.warning(
            "pin_cut with master=%r and no "
            "spark.stockDataEtl.pinCutDir set — spilling cuts under "
            "the warehouse dir %s; set the conf to a shared "
            "filesystem path to control placement.", master, root)
    _CUT_ROOTS[key] = root
    atexit.register(_rm_cut_path, root)
    return root


def _rm_cut_path(path: str) -> None:
    """Delete a cut directory wherever it lives: plain/``file:`` paths
    via shutil, scheme-qualified URIs (hdfs://, s3a://, ...) via the
    Hadoop FileSystem of the active session. Never raises — cleanup is
    best-effort; an already-stopped session just leaves the directory
    for the storage layer's own retention."""
    try:
        if "://" not in path or path.startswith("file:"):
            import shutil

            local = path[5:] if path.startswith("file:") else path
            if local.startswith("//"):  # file:///tmp/x -> /tmp/x
                local = "/" + local.lstrip("/")
            shutil.rmtree(local, ignore_errors=True)
            return
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            return
        jvm = spark._jvm  # noqa: SLF001
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
        fs.delete(hpath, True)
    except Exception:  # noqa: BLE001 — best-effort cleanup
        pass


# (pinCutDir conf, master) -> resolved cut root; config-keyed so a
# session changing either conf gets a fresh, correctly-placed root
_CUT_ROOTS: dict[tuple[str | None, str | None], str] = {}


def _unpersist_checkpoint(df: DataFrame) -> None:
    """Drop a localCheckpoint's blocks via its LogicalRDD leaf.

    The accessor chain is a private JVM surface; if a Spark upgrade
    moves it, the blocks can only be reclaimed by ContextCleaner GC of
    the dropped Python reference — correct but unbounded in time.
    :func:`release_pinned` makes that degradation visible (a one-shot
    warning) instead of silently recreating the storage-growth problem
    this registry exists to prevent."""
    df._jdf.queryExecution().analyzed().rdd().unpersist(False)  # noqa: SLF001


def release_pinned() -> int:
    """Unpersist every registered frame (non-blocking); returns the
    number released. Never raises — a dead SparkContext just clears
    the registry; a LIVE context whose checkpoint accessor broke (a
    Spark upgrade moving the private surface) logs one warning so the
    resulting storage growth is visible, not silent."""
    global _warned_checkpoint_accessor
    n = 0
    while _PINNED:
        kind, df = _PINNED.pop()
        try:
            if kind == "checkpoint":
                _CHECKPOINTS[:] = [(s, c) for s, c in _CHECKPOINTS
                                   if c is not df]
                _unpersist_checkpoint(df)
            elif kind == "cutfile":  # df is the parquet path
                _CUTS[:] = [(s, p) for s, p in _CUTS if p != df]
                _rm_cut_path(df)
            else:
                df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — session may already be gone
            from pyspark import SparkContext
            alive = SparkContext._active_spark_context is not None  # noqa: SLF001
            if alive and kind == "checkpoint" \
                    and not _warned_checkpoint_accessor:
                _warned_checkpoint_accessor = True
                _log.warning(
                    "localCheckpoint block release failed on a live "
                    "SparkContext: the private queryExecution()."
                    "analyzed().rdd() accessor is unavailable on this "
                    "Spark build. Checkpoint blocks now free only via "
                    "ContextCleaner GC — pinned storage may grow "
                    "within a long session.", exc_info=True)
    return n
