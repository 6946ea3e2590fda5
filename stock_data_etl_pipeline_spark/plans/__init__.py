# NOTE: the catalog accessors are deliberately NOT re-exported here —
# `plans.queries` must unambiguously mean the queries.py submodule
# (control-plane query service); use plans.catalog.queries()/
# oracle_sql() for the catalog surface.
from .catalog import CATALOG  # noqa: F401
from . import catalog_text  # noqa: F401  (registers its entries on import)
from . import catalog_streaming  # noqa: F401
from . import catalog_ext  # noqa: F401
from . import catalog_tpch  # noqa: F401
from . import catalog_tpch_sub  # noqa: F401
from . import catalog_scalar  # noqa: F401
from . import catalog_corpus  # noqa: F401
from . import catalog_analytics  # noqa: F401
from . import catalog_stock  # noqa: F401
from . import catalog_select  # noqa: F401  (MUST import after the other
# catalog modules: its entries are round-6 additions whose registration
# index has to rank AFTER every family already waiting for a driver row,
# so the rotation keeps the waiting 34 inside the 50-query window)
from . import catalog_quant  # noqa: F401  (round-7 additions; with the
# whole catalog driver-green after r6, never-checked entries rank first
# in the rotation, so these land at the head of the round-7 window)
from . import catalog_round8  # noqa: F401  (round-8 additions; same
# deal — never-checked first, then greens cycle by staleness)
from . import catalog_round9  # noqa: F401  (round-9 additions;
# imports after round 8 so its never-checked entries rank behind the
# six round-8 entries still waiting for their first driver window)
from . import catalog_round10  # noqa: F401  (round-10 additions;
# imports after round 9 — with the whole catalog green after r9, these
# never-checked entries head the window right after the
# fingerprint-invalidated queries — five by round-10 end)
from . import catalog_round11  # noqa: F401  (round-11 additions;
# imports after round 10 so its never-checked entries rank behind any
# earlier family still waiting)
from . import catalog_round12  # noqa: F401  (round-12 additions;
# imports after round 11 so its never-checked entries rank behind any
# earlier family still waiting)
from . import catalog_round13  # noqa: F401  (round-13 additions;
# imports after round 12 so its entries rank behind any earlier
# family still waiting for a first check)
from . import catalog_round14  # noqa: F401  (round-14 additions;
# imports LAST — its rookies queue at the never-checked tail,
# interleaved with the changed tier in the next driver window)

# ---------------------------------------------------------------------------
# Driver verification window rotation. The external correctness gate checks
# only the FIRST 50 registered queries per round; with 141 entries the
# window must rotate so every family eventually gets an external oracle row.
# Round-3 window: the event/streaming family (red in r02 from the events-ts
# unit bug, fixed this round — the green rows prove the fix), the full
# TPC-H family and the corpus family (never driver-checked), plus the two
# ext queries carrying r1 fixes. Everything displaced has green r01/r02
# rows on record and stays covered by tools/check_oracle.py + pytest.
# ---------------------------------------------------------------------------
_ROUND3_WINDOW = [
    # fixed event-time family + the reworked streaming-dedup sink (9)
    "events_hourly", "streaming_events_hourly", "events_sessionization",
    "streaming_current_state", "events_interval_join",
    "streaming_purchase_view_join", "events_hourly_dense",
    "current_state_per_user", "streaming_dedup_survivors",
    # TPC-H, never driver-checked (22)
    "q1_pricing_summary_sql", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_priority_exists", "q5_local_supplier_volume", "q6_revenue_change",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q10_returned_items", "q11_important_parts", "q12_priority_classes",
    "q13_customer_distribution", "q14_promo_effect", "q15_top_supplier",
    "q16_supplier_counts", "q17_small_quantity_revenue",
    "q18_large_volume_customer", "q19_bracket_or", "q20_part_promotion",
    "q21_waiting_supplier", "q22_idle_customers",
    # ext entries carrying round-1 fixes, never driver-checked (2)
    "json_props_extract", "approx_distinct_and_quantiles",
    # corpus family, never driver-checked (17; corpus_curation_full is the
    # one omission — its subset corpus_curation has a green r02 row)
    "corpus_vocab_top_terms", "corpus_bigram_counts",
    "corpus_tfidf_top_terms", "corpus_deterministic_sample",
    "corpus_stratified_sample", "corpus_contamination_overlap",
    "corpus_pii_redact", "multimodal_frame_sample",
    "corpus_repetition_filter", "corpus_sequence_pack", "knn_join_blocked",
    "corpus_mixture_sample", "corpus_chunk_documents",
    "corpus_source_profile", "corpus_span_dedup", "corpus_lm_perplexity",
    "corpus_exact_n_per_stratum",
]


def _correctness_status(root: str | None = None,
                        with_rounds: bool = False):
    """(latest_round, name -> 'green'|'red') from the driver's
    CORRECTNESS_r*.json artifacts at the repo root; later rounds win.
    With ``with_rounds=True`` a third element is returned: name ->
    round of that query's most recent driver row (the rotation key —
    greens are re-checked oldest-verified first)."""
    import glob
    import json
    import os
    import re

    root = root or os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    latest, status = 0, {}
    last_round: dict[str, int] = {}
    # sort by ROUND NUMBER, not path: lexicographic order would put
    # r10 before r2 once rounds outgrow the zero-padding
    found = []
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            found.append((int(m.group(1)), path))
    for rnd, path in sorted(found):
        latest = max(latest, rnd)
        try:
            with open(path) as fh:
                data = json.load(fh)
        except Exception:  # noqa: BLE001 — a bad artifact must not break import
            continue
        for name, row in data.items():
            ok = (isinstance(row, dict) and row.get("rows_match")
                  and row.get("schema_match")
                  and row.get("hash_match", True) and not row.get("err"))
            status[name] = "green" if ok else "red"
            last_round[name] = rnd
    if with_rounds:
        return latest, status, last_round
    return latest, status


def _query_fingerprint(name: str, catalog=None) -> str:
    """Stable fingerprint of a catalog entry: sha256-16 over the
    registered oracle SQL + the builder's package-local call closure
    (builder source plus every package function/class transitively
    reachable from it — see ``plans.fingerprint``). A green
    CORRECTNESS row attests the (builder, oracle, helpers) triple AS
    OF the driver round that produced it; when any of them changes
    afterwards the fingerprint diverges from the one stamped in
    ``tools/QUERY_FINGERPRINTS.json`` and the rotation ranks the query
    just after the reds (the r9 gap: ``dedup_edit_distance``'s schema
    and ``events_robust_outliers``' plan changed, but their stale r8
    green rows kept them out of the window; the r10 residual gap: an
    edit buried in an operator helper needed a manual ``--invalidate``
    — closed by the closure walk, round 11).

    Memoized per process on the default catalog (source files do not
    change under a running session; ~360 closure walks per
    _window_order call otherwise). Explicit ``catalog`` bypasses the
    cache — the meta-tests pass synthetic catalogs."""
    from . import fingerprint as _fpmod

    if catalog is None and name in _FP_CACHE:
        return _FP_CACHE[name]
    fn, oracle = (catalog or CATALOG)[name]
    fp = _fpmod.fingerprint(fn, oracle)
    if catalog is None:
        _FP_CACHE[name] = fp
    return fp


_FP_CACHE: dict[str, str] = {}


def _fingerprint_manifest(root: str | None = None) -> dict[str, str]:
    """name -> stamped fingerprint from tools/QUERY_FINGERPRINTS.json
    (written by tools/stamp_fingerprints.py at each round start, after
    the driver's CORRECTNESS artifact lands and BEFORE any code edit).
    Missing/unreadable manifest -> {} (tier disabled, never a crash at
    import time)."""
    import json
    import os

    root = root or os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.join(root, "tools", "QUERY_FINGERPRINTS.json")
    try:
        with open(path) as fh:
            data = json.load(fh)
    except Exception:  # noqa: BLE001 — absent manifest must not break import
        return {}
    return {n: row.get("fp") for n, row in data.items()
            if isinstance(row, dict) and isinstance(row.get("fp"), str)}


def _window_order(root: str | None = None) -> list[str]:
    """Catalog ordering for the driver's 50-query window, derived from
    the CORRECTNESS artifacts under ``root`` (default: repo root).
    Pure — returns the ordered names without mutating CATALOG, so the
    meta-tests can pin both branches against tmp_path artifact sets."""
    latest, status, last_round = _correctness_status(root,
                                                     with_rounds=True)
    if latest <= 2:
        # round 3: the explicit window above (verdict-directed: prove the
        # events-ts fix, pull TPC-H + corpus into external verification)
        missing = [n for n in _ROUND3_WINDOW if n not in CATALOG]
        if missing:  # a rename would silently shrink the checked window
            raise KeyError(f"window names not in CATALOG: {missing}")
        head = list(_ROUND3_WINDOW)
    else:
        # later rounds, self-advancing: queries with a RED driver row
        # first (prove the fix), then a FAIR INTERLEAVE of greens
        # whose FINGERPRINT moved since their last green row (the
        # code the row attests no longer exists — r10 tier, see
        # _query_fingerprint) with never-driver-checked queries (in
        # registration order — earliest families have waited
        # longest; interleaved so neither tier can flood the fixed
        # 50-row window and starve the other, the r13 hazard), then
        # green, ranked by the
        # ROUND of their last green row, oldest-verified first. That
        # last key makes the 50-query window CYCLE through the whole
        # green catalog across rounds instead of re-checking the same
        # 50 oldest-registered queries forever — without it, a
        # testdata regeneration breaking a late-registered query would
        # never be externally re-caught (the round-2 failure mode).
        # No manual edit needed per round.
        reg_index = {n: i for i, n in enumerate(CATALOG)}
        manifest = _fingerprint_manifest(root)
        # one fingerprint pass per call (not per sort comparison, and
        # not per green query on every call — inspect.getsource reads
        # ~350 source files otherwise)
        live_fp = {n: _query_fingerprint(n) for n in manifest
                   if n in CATALOG}

        def cls(n: str) -> int:
            if status.get(n) == "red":
                return 0
            if n not in status:
                return 2
            if n in manifest and manifest[n] != live_fp.get(n):
                return 1  # green row attests code that no longer exists
            return 3

        def rank(n: str) -> tuple[int, int]:
            return (last_round.get(n, 0), reg_index[n])

        tiers: dict[int, list[str]] = {0: [], 1: [], 2: [], 3: []}
        for n in CATALOG:
            tiers[cls(n)].append(n)
        for t in tiers.values():
            t.sort(key=rank)
        # FAIR INTERLEAVE of the changed-attestation tier (1) and the
        # never-checked tier (2), changed first — neither may starve
        # the other out of the driver's fixed 50-row window. Strict
        # changed-before-never (the r10 ordering) let ONE edit to a
        # hub helper (round 13: the pin_cut root resolver, reachable
        # from 39 green queries' closures) flood the window and push
        # brand-new never-attested queries out for a round; strict
        # never-before-changed would let a rookie flood (27 new
        # queries in round 12 alone) starve re-attestation of changed
        # code the same way. Alternating guarantees each tier at
        # least ~half the window until exhausted, while every member
        # of both tiers still outranks every fresh green.
        mixed: list[str] = []
        ch, nv = tiers[1], tiers[2]
        for i in range(max(len(ch), len(nv))):
            if i < len(ch):
                mixed.append(ch[i])
            if i < len(nv):
                mixed.append(nv[i])
        head = tiers[0] + mixed + tiers[3]
    return head + [n for n in CATALOG if n not in set(head)]


def _rotate_window(root: str | None = None) -> None:
    ordered = {n: CATALOG[n] for n in _window_order(root)}
    CATALOG.clear()
    CATALOG.update(ordered)


_rotate_window()
