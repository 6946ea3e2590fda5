"""Property-based tests (hypothesis): invariants the oracle can't state.

Strategy sizes are tiny because each example pays Spark job latency; the
point is randomized STRUCTURE (ragged arrays, weird values, random merge
batches), not volume.
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from stock_data_etl_pipeline_spark.operators.merge import merge_upsert
from stock_data_etl_pipeline_spark.plans.stock_transform import transform_stock_json

SLOW = settings(max_examples=8, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])

metric_value = st.one_of(
    st.integers(min_value=-10**12, max_value=10**12),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.sampled_from(["N/A", "na", " NULL ", "-", "none"]),
    st.none(),
)


@st.composite
def raw_doc(draw):
    n_periods = draw(st.integers(min_value=0, max_value=4))
    periods = [f"202{i}-0{(i % 9) + 1}" for i in range(n_periods)]
    metrics = draw(st.dictionaries(
        st.sampled_from(["revenue", "cogs", "eps", "fcf"]),
        st.lists(metric_value, min_size=0, max_size=n_periods + 2),
        max_size=3))
    quarterly = {"period_end_date": periods, **metrics}
    doc = {"data": {"financials": {"quarterly": quarterly},
                    "metadata": {"name": draw(st.sampled_from(["A", "B", None]))}}}
    if draw(st.booleans()):
        doc["data"]["financials"]["ttm"] = {
            "period_end_date": "TTM",
            **{k: draw(metric_value) for k in metrics}}
    return doc


@SLOW
@given(doc=raw_doc())
def test_transform_row_grain_invariants(spark, doc):
    raw = spark.createDataFrame([("T", json.dumps(doc))],
                                "ticker string, json_str string")
    out = transform_stock_json(raw).collect()
    n_periods = len(doc["data"]["financials"]["quarterly"]["period_end_date"])
    fin = [r for r in out if r["record_type"] == "financials"]
    ttm = [r for r in out if r["record_type"] == "ttm"]
    meta = [r for r in out if r["record_type"] == "metadata"]
    # one financials row per period, ttm only when periods exist, one meta
    assert len(fin) == n_periods
    assert len(ttm) == (1 if "ttm" in doc["data"]["financials"]
                        and n_periods > 0 else 0)
    assert len(meta) == 1
    if ttm:
        # TTM period substitution: equals the LAST quarterly period
        assert ttm[0]["period_end_date"] == \
            doc["data"]["financials"]["quarterly"]["period_end_date"][-1]
    # key invariant: (ticker, record_type, period) unique
    keys = [(r["ticker"], r["record_type"], r["period_end_date"]) for r in out]
    assert len(keys) == len(set(keys))


rows = st.lists(
    st.tuples(st.integers(0, 5),
              st.sampled_from(["x", "y", None]),
              st.floats(0, 100, allow_nan=False)),
    min_size=0, max_size=8)


@SLOW
@given(target=rows, source=rows)
def test_merge_upsert_properties(spark, target, source):
    schema = "k long, p string, v double"
    t = spark.createDataFrame(target, schema)
    s = spark.createDataFrame(source, schema).dropDuplicates(["k", "p"])
    merged = merge_upsert(t, s, ["k", "p"])
    got = {(r["k"], r["p"]): r["v"] for r in merged.collect()}
    # keys = union of both key sets (null-safe)
    tkeys = {(k, p) for k, p, _ in target}
    skeys = {(r["k"], r["p"]) for r in s.collect()}
    assert set(got) == tkeys | skeys
    # source wins on overlap
    for r in s.collect():
        assert got[(r["k"], r["p"])] == r["v"]
    # idempotency
    again = {(r["k"], r["p"]): r["v"]
             for r in merge_upsert(merged, s, ["k", "p"]).collect()}
    assert again == got


# -- corpus packing / repetition invariants ---------------------------------

pack_docs = st.lists(
    st.tuples(st.sampled_from(["s1", "s2", "s3"]),
              st.integers(min_value=0, max_value=40)),
    min_size=1, max_size=30)


@SLOW
@given(spec=pack_docs, budget=st.integers(min_value=1, max_value=64))
def test_pack_sequences_invariants(spark, spec, budget):
    from stock_data_etl_pipeline_spark.operators.corpus import pack_sequences
    rows = [(i, src, "w " * n) for i, (src, n) in enumerate(spec)]
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = pack_sequences(d, budget=budget).collect()
    assert len(out) == len(rows)
    by_src: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r["source"], r["doc_id"])):
        # offset always inside the pack
        assert 0 <= r["pack_offset"] < budget
        # global position is recoverable and strictly layout-consistent:
        # pack_id * budget + offset == sum of preceding docs' tokens
        pos = r["pack_id"] * budget + r["pack_offset"]
        expect = sum(x["n_tokens"] for x in by_src.get(r["source"], []))
        assert pos == expect
        by_src.setdefault(r["source"], []).append(r)


@SLOW
@given(texts=st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=12))
def test_repetition_metrics_bounds(spark, texts):
    from stock_data_etl_pipeline_spark.operators.corpus import (
        repetition_metrics,
    )
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    out = repetition_metrics(d, max_top_bigram_frac=0.5,
                             max_dup_word_frac=0.5).collect()
    assert len(out) == len(texts)
    for r in out:
        if r["top_bigram_frac"] is not None:
            assert 0.0 <= r["top_bigram_frac"] <= 1.0
        if r["dup_word_frac"] is not None:
            assert 0.0 <= r["dup_word_frac"] <= 1.0
        if r["keep"] is not None:
            assert r["keep"] == (r["top_bigram_frac"] <= 0.5
                                 and r["dup_word_frac"] <= 0.5)


@SLOW
@given(n=st.integers(min_value=0, max_value=120),
       size=st.integers(min_value=2, max_value=40),
       overlap_frac=st.floats(min_value=0.0, max_value=0.9))
def test_chunk_documents_covers_every_token_once_per_stride(
        spark, n, size, overlap_frac):
    from stock_data_etl_pipeline_spark.operators.corpus import chunk_documents
    overlap = min(int(size * overlap_frac), size - 1)
    toks = [f"t{i}" for i in range(n)]
    d = spark.createDataFrame([(0, " ".join(toks))],
                              "doc_id long, text string")
    chunks = sorted(chunk_documents(d, size=size, overlap=overlap).collect(),
                    key=lambda r: r["chunk_id"])
    if n == 0:
        assert chunks == []
        return
    # every token is covered; chunk starts advance by exactly the stride
    covered = set()
    stride = size - overlap
    for r in chunks:
        assert r["start_tok"] == r["chunk_id"] * stride
        assert 0 < r["n_tokens"] <= size
        got = r["chunk_text"].split()
        assert got == toks[r["start_tok"]:r["start_tok"] + r["n_tokens"]]
        covered.update(range(r["start_tok"], r["start_tok"] + r["n_tokens"]))
    assert covered == set(range(n))


@given(texts=st.lists(
    st.lists(st.sampled_from("abcde"), min_size=0, max_size=12)
    .map(lambda ws: " ".join(ws)),
    min_size=1, max_size=8),
    n=st.integers(min_value=2, max_value=4))
@SLOW
def test_span_dedup_equals_bruteforce(spark, texts, n):
    # tiny alphabet forces real span collisions; brute force counts every
    # n-token window occurrence corpus-wide in plain Python
    from collections import Counter

    from stock_data_etl_pipeline_spark.operators.corpus import (
        duplicate_span_stats,
    )
    toks = [[w for w in t.split(" ") if w] for t in texts]
    counts = Counter(tuple(ws[i:i + n])
                     for ws in toks for i in range(len(ws) - n + 1))
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    for r in duplicate_span_stats(d, n=n).collect():
        ws = toks[r["doc_id"]]
        spans = [tuple(ws[i:i + n]) for i in range(len(ws) - n + 1)]
        assert r["n_spans"] == len(spans)
        assert r["n_dup_spans"] == sum(1 for s in spans if counts[s] >= 2)


table_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=7),
              st.sampled_from(["a", "b", "c", None])),
    min_size=0, max_size=10).map(
    lambda rs: list({k: (k, v) for k, v in rs}.values()))  # unique keys


@given(v0=table_rows, v1=table_rows)
@SLOW
def test_cdf_replication_roundtrip(spark, tmp_path_factory, v0, v1):
    # replica.apply_cdf(src.diff(0,1)) must reproduce src v1 exactly,
    # for ANY pair of versions (random inserts/updates/deletes/nulls)
    from stock_data_etl_pipeline_spark.sources.managed_table import (
        ManagedTable,
    )
    base = tmp_path_factory.mktemp("cdfprop")
    schema = "k long, v string"
    src = ManagedTable(spark, str(base / "src"))
    if not v0:
        v0 = [(99, "seed")]  # empty create is rejected; seed one row
    src.create(spark.createDataFrame(v0, schema))
    src.overwrite(spark.createDataFrame(v1 or [(99, "seed")], schema))
    rep = ManagedTable(spark, str(base / "rep"))
    rep.create(src.read(0))
    rep.apply_cdf(src.diff(0, 1, keys=["k"]), keys=["k"])
    got = sorted(tuple(r) for r in rep.read().collect())
    want = sorted(tuple(r) for r in src.read(1).collect())
    assert got == want


@given(dim_rows=table_rows, upd_rows=table_rows)
@SLOW
def test_scd2_invariants(spark, dim_rows, upd_rows):
    import datetime

    from stock_data_etl_pipeline_spark.operators.merge import scd2_merge
    d0, d1 = datetime.date(2024, 1, 1), datetime.date(2024, 6, 1)
    dim = spark.createDataFrame(
        [(k, v, d0, None, True) for k, v in dim_rows] or [(99, "x", d0, None, True)],
        "k long, v string, effective_from date, effective_to date, "
        "is_current boolean")
    upd = spark.createDataFrame(upd_rows or [(99, "x")], "k long, v string")
    out = scd2_merge(dim, upd, ["k"], ["v"], d1).collect()
    cur = [r for r in out if r["is_current"]]
    # exactly one current row per key in dim ∪ updates
    keys = {r["k"] for r in out}
    assert sorted(r["k"] for r in cur) == sorted(keys)
    # current rows are open-ended; closed rows end at the change ts
    assert all(r["effective_to"] is None for r in cur)
    assert all(r["effective_to"] == d1
               for r in out if not r["is_current"])
    # every closed row has a successor version of the same key
    cur_keys = {r["k"] for r in cur}
    assert {r["k"] for r in out if not r["is_current"]} <= cur_keys


_table_op = st.one_of(
    st.tuples(st.just("merge"), table_rows),
    st.tuples(st.just("overwrite"), table_rows),
    st.tuples(st.just("optimize"), st.none()),
)


@given(ops=st.lists(_table_op, min_size=1, max_size=5))
@SLOW
def test_managed_table_matches_model(spark, tmp_path_factory, ops):
    # model-based storage test: replay a random op sequence against a
    # plain dict model; after every commit the table must equal the
    # model, every historical version must time-travel to its snapshot,
    # and optimize must be a pure no-op on content
    from stock_data_etl_pipeline_spark.sources.managed_table import (
        ManagedTable,
    )
    t = ManagedTable(spark, str(tmp_path_factory.mktemp("model") / "t"))
    schema = "k long, v string"
    model: dict = {99: "seed"}
    t.create(spark.createDataFrame(list(model.items()), schema))
    snapshots = [dict(model)]

    def table_state():
        return {r["k"]: r["v"] for r in t.read().collect()}

    for kind, rows in ops:
        if kind == "merge":
            if not rows:
                continue
            t.merge(spark.createDataFrame(rows, schema), ["k"])
            model.update(dict(rows))
        elif kind == "overwrite":
            new = dict(rows) or {99: "seed"}
            t.overwrite(spark.createDataFrame(list(new.items()), schema))
            model = dict(new)
        else:
            t.optimize()
        snapshots.append(dict(model))
        assert table_state() == model
    # time travel: each version reads back as its own snapshot
    assert t.latest_version() == len(snapshots) - 1
    for v, snap in enumerate(snapshots):
        got = {r["k"]: r["v"] for r in t.read(v).collect()}
        assert got == snap
    # history is one row per version, newest first
    hist = t.history().collect()
    assert [r["version"] for r in hist] == \
        list(range(len(snapshots) - 1, -1, -1))


@st.composite
def tick_batches(draw):
    """Random tick set randomly partitioned into 1-4 batches; ties in ts
    (same second) are common by construction to stress the (ts,
    event_id) tie-break."""
    n = draw(st.integers(min_value=1, max_value=18))
    ticks = []
    for i in range(n):
        ticks.append({
            "event_id": i,
            "sec": draw(st.integers(min_value=0, max_value=7200)),
            "event_type": draw(st.sampled_from(["A", "B"])),
            "value": round(draw(st.floats(min_value=0.01, max_value=500,
                                          allow_nan=False)), 2),
        })
    assignment = [draw(st.integers(min_value=0, max_value=3))
                  for _ in range(n)]
    return ticks, assignment


@SLOW
@given(spec=tick_batches())
def test_ohlc_partials_fold_like_single_pass(spark, spec):
    """THE bar-monoid law, randomized: partial OHLC bars computed per
    random batch and re-combined equal the single-pass aggregate over
    all ticks — for any batch assignment, tie-heavy timestamps
    included. This is what makes incremental maintenance and the
    daily rollup exact, so it gets the property treatment."""
    import datetime as dt

    from stock_data_etl_pipeline_spark.operators.incremental import (
        combine_ohlc_partials,
        ohlc_partial,
    )
    ticks, assignment = spec
    rows = [{"event_id": t["event_id"],
             "ts": dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t["sec"]),
             "event_type": t["event_type"], "value": t["value"]}
            for t in ticks]
    schema = "event_id long, ts timestamp, event_type string, value double"
    full = spark.createDataFrame(rows, schema)
    single = {(r["event_type"], r["hr"]): r
              for r in ohlc_partial(full).collect()}
    parts = []
    for b in set(assignment):
        batch = [r for r, a in zip(rows, assignment) if a == b]
        parts.append(ohlc_partial(spark.createDataFrame(batch, schema)))
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    folded = {(r["event_type"], r["hr"]): r
              for r in combine_ohlc_partials(union).collect()}
    assert set(folded) == set(single)
    for k, s in single.items():
        f = folded[k]
        for c in ("open", "high", "low", "close", "volume",
                  "first_ts", "first_id", "last_ts", "last_id"):
            assert f[c] == s[c], (k, c, f[c], s[c])
        assert abs(f["sum_value"] - s["sum_value"]) < 1e-9


@SLOW
@given(vals=st.lists(st.integers(min_value=-5000, max_value=5000),
                     min_size=1, max_size=120))
def test_exact_quantiles_match_sorted_list(spark, vals):
    """exact_quantiles_by_rank == the lower quantile_disc on the sorted
    list: value at index ceil(p*N)-1, for any multiset on the grid."""
    import math

    from pyspark.sql import Row

    from stock_data_etl_pipeline_spark.operators.aggregates import (
        exact_quantiles_by_rank)
    df = spark.createDataFrame(
        [Row(value=v / 100.0) for v in vals], "value double")
    r = exact_quantiles_by_rank(df, "value", grid=100).collect()[0]
    s = sorted(vals)
    want = {p: s[math.ceil(p * len(s)) - 1] / 100.0
            for p in (0.5, 0.9, 0.99)}
    assert r["n_values"] == len(vals)
    assert (r["q50"], r["q90"], r["q99"]) == (
        want[0.5], want[0.9], want[0.99])


@SLOW
@given(sizes=st.lists(st.integers(min_value=1, max_value=50),
                      min_size=1, max_size=60),
       target=st.integers(min_value=10, max_value=100))
def test_compaction_bins_conserve_files_and_bytes(spark, sizes, target):
    """Compaction bins always conserve the file count and total bytes,
    never split a file, and every non-tail bin starts within one file
    of the target boundary (start-offset rule)."""
    from pyspark.sql import Row

    from stock_data_etl_pipeline_spark.operators.layout import (
        compaction_bins)
    files = spark.createDataFrame(
        [Row(source="s", doc_id=i, bytes=b)
         for i, b in enumerate(sizes)],
        "source string, doc_id long, bytes long")
    out = compaction_bins(files, "bytes", target).collect()
    assert sum(r["n_files"] for r in out) == len(sizes)
    assert sum(r["bin_bytes"] for r in out) == sum(sizes)
    # bin ids are the start-offset chunks: recompute from the sizes
    import itertools
    starts = [0, *itertools.accumulate(sizes)][:-1]
    want_bins = {}
    for sz, st_off in zip(sizes, starts):
        b = st_off // target
        want_bins[b] = want_bins.get(b, 0) + sz
    assert {r["bin_id"]: r["bin_bytes"] for r in out} == want_bins


@SLOW
@given(closes=st.lists(st.integers(min_value=1, max_value=50000),
                       min_size=2, max_size=60))
def test_obv_equals_python_recurrence(spark, closes):
    """OBV == the textbook per-bar recurrence for any close path."""
    import datetime as dt

    from pyspark.sql import Row

    from stock_data_etl_pipeline_spark.operators.indicators import obv
    t0 = dt.datetime(2024, 1, 1)
    bars = spark.createDataFrame(
        [Row(event_type="A", hr=t0 + dt.timedelta(hours=i),
             open=c / 100.0, high=c / 100.0, low=c / 100.0,
             close=c / 100.0, volume=(i % 7) + 1)
         for i, c in enumerate(closes)],
        "event_type string, hr timestamp, open double, high double, "
        "low double, close double, volume long")
    got = [r["obv"] for r in sorted(obv(bars).collect(),
                                    key=lambda r: r["hr"])]
    acc, want = 0, []
    for i, c in enumerate(closes):
        if i > 0:
            sign = (c > closes[i - 1]) - (c < closes[i - 1])
            acc += sign * ((i % 7) + 1)
        want.append(acc)
    assert got == want
