"""Driver-verification window rotation.

The external gate checks only the first 50 registered catalog queries;
plans/__init__ orders the catalog so every family eventually gets a
driver row. Rounds <=3 use an explicit list; later rounds self-advance
from the CORRECTNESS_r*.json artifacts (red first, never-checked next,
green last). Both branches are pinned here against tmp_path artifact
sets so the tests stay valid no matter which round artifacts exist at
the real repo root."""

from __future__ import annotations

import json

from stock_data_etl_pipeline_spark.plans import (_ROUND3_WINDOW, CATALOG,
                                                 _correctness_status,
                                                 _window_order)


def test_round3_branch_uses_explicit_window(tmp_path):
    # only r01/r02 artifacts present -> latest==2 -> explicit window
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "events_hourly": {"rows_match": False, "schema_match": True,
                          "hash_match": False}}))
    order = _window_order(str(tmp_path))
    assert order[:len(_ROUND3_WINDOW)] == _ROUND3_WINDOW
    assert sorted(order) == sorted(CATALOG)  # a permutation, no loss


def test_self_advancing_branch_red_then_unchecked_then_green(tmp_path):
    names = list(CATALOG)
    red, green = names[5], names[0]
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({
        red: {"rows_match": True, "schema_match": True, "hash_match": False},
        green: {"rows_match": True, "schema_match": True, "hash_match": True},
    }))
    order = _window_order(str(tmp_path))
    assert order[0] == red                      # reds lead the window
    assert order[-1] == green                   # greens wait at the back
    # never-checked queries keep registration order between them
    unchecked = [n for n in order if n not in (red, green)]
    assert unchecked == [n for n in names if n not in (red, green)]
    assert sorted(order) == sorted(CATALOG)


def test_rotation_applied_at_import_is_a_permutation():
    # whatever artifacts the real repo root holds, the import-time
    # rotation must never drop or duplicate a query
    assert len(CATALOG) == len(set(CATALOG))
    assert set(_window_order()) == set(CATALOG)
    assert list(CATALOG) == _window_order()


def test_correctness_classifier(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "a": {"rows_match": True, "schema_match": True, "hash_match": True},
        "b": {"rows_match": False, "schema_match": True, "hash_match": False},
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        # later round flips a -> red, b -> green
        "a": {"rows_match": True, "schema_match": True, "hash_match": False},
        "b": {"rows_match": True, "schema_match": True, "hash_match": True},
        # rows-only row (no oracle): hash_match absent counts as green
        "c": {"rows_match": True, "schema_match": True},
    }))
    latest, status = _correctness_status(str(tmp_path))
    assert latest == 2
    assert status == {"a": "red", "b": "green", "c": "green"}


def test_classifier_survives_bad_artifact(tmp_path):
    (tmp_path / "CORRECTNESS_r07.json").write_text("{not json")
    latest, status = _correctness_status(str(tmp_path))
    assert latest == 7 and status == {}


def test_green_requeue_cycles_oldest_verified_first(tmp_path):
    # greens rank by the round of their last driver row, oldest first:
    # the 50-query window then CYCLES through the green catalog across
    # rounds instead of re-checking the same oldest-REGISTERED queries
    # forever. g_r3 (last green in r3) must outrank g_r5 (green in r5)
    # even though g_r5 registered earlier.
    names = list(CATALOG)
    g_r5, g_r3, red = names[0], names[9], names[4]
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({
        g_r3: {"rows_match": True, "schema_match": True,
               "hash_match": True},
        g_r5: {"rows_match": True, "schema_match": True,
               "hash_match": True},
    }))
    (tmp_path / "CORRECTNESS_r05.json").write_text(json.dumps({
        g_r5: {"rows_match": True, "schema_match": True,
               "hash_match": True},
        red: {"rows_match": True, "schema_match": True,
              "hash_match": False},
    }))
    order = _window_order(str(tmp_path))
    assert order[0] == red                       # reds still lead
    assert order.index(g_r3) > order.index(names[1])  # behind unchecked
    assert order.index(g_r3) < order.index(g_r5)      # but r3 < r5 green
    assert sorted(order) == sorted(CATALOG)


def test_window_rotates_across_simulated_rounds(tmp_path):
    # simulate the driver loop: everything green in r04, then each
    # round re-greens whatever the window head showed. The set of
    # re-checked greens must ADVANCE (disjoint windows) until the
    # catalog wraps — the anti-starvation property itself.
    names = list(CATALOG)
    win = 50
    (tmp_path / "CORRECTNESS_r04.json").write_text(json.dumps({
        n: {"rows_match": True, "schema_match": True, "hash_match": True}
        for n in names}))
    seen: list[list[str]] = []
    for rnd in range(5, 8):
        head = _window_order(str(tmp_path))[:win]
        seen.append(head)
        (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(json.dumps({
            n: {"rows_match": True, "schema_match": True,
                "hash_match": True} for n in head}))
    # consecutive windows share nothing until the catalog wraps
    assert not set(seen[0]) & set(seen[1])
    assert not set(seen[1]) & set(seen[2])
    covered = set(seen[0]) | set(seen[1]) | set(seen[2])
    assert len(covered) == min(3 * win, len(names))


def test_lexicographic_round_sort_is_not_assumed(tmp_path):
    # r10 must beat r9 even though "r10" < "r9" lexicographically
    (tmp_path / "CORRECTNESS_r9.json").write_text(json.dumps({
        "a": {"rows_match": True, "schema_match": True,
              "hash_match": False}}))
    (tmp_path / "CORRECTNESS_r10.json").write_text(json.dumps({
        "a": {"rows_match": True, "schema_match": True,
              "hash_match": True}}))
    latest, status, rounds = _correctness_status(str(tmp_path),
                                                 with_rounds=True)
    assert latest == 10
    assert status == {"a": "green"}
    assert rounds == {"a": 10}


def test_fingerprint_mismatch_ranks_after_red_before_unchecked(tmp_path):
    # r10 tier: a green query whose live fingerprint no longer matches
    # the stamped one (code/oracle changed since the driver attested
    # it) must rank just after the reds and BEFORE never-checked
    # queries — its green row describes code that no longer exists.
    from stock_data_etl_pipeline_spark.plans import _query_fingerprint
    names = list(CATALOG)
    red, changed, fresh = names[3], names[7], names[1]
    (tmp_path / "CORRECTNESS_r05.json").write_text(json.dumps({
        red: {"rows_match": True, "schema_match": True,
              "hash_match": False},
        changed: {"rows_match": True, "schema_match": True,
                  "hash_match": True},
        fresh: {"rows_match": True, "schema_match": True,
                "hash_match": True},
    }))
    (tmp_path / "tools").mkdir()
    (tmp_path / "tools" / "QUERY_FINGERPRINTS.json").write_text(json.dumps({
        changed: {"fp": "0000deadbeef0000", "round": 5},
        fresh: {"fp": _query_fingerprint(fresh), "round": 5},
    }))
    order = _window_order(str(tmp_path))
    first_unchecked = next(n for n in order
                           if n not in (red, changed, fresh))
    assert order[0] == red                             # reds still lead
    assert order[1] == changed                         # then stale-attested
    assert order.index(changed) < order.index(first_unchecked)
    assert order[-1] == fresh or order.index(fresh) > order.index(
        first_unchecked)                               # fresh green waits
    assert sorted(order) == sorted(CATALOG)


def test_query_fingerprint_moves_with_oracle_and_source():
    # the fingerprint must change when EITHER the oracle SQL or the
    # builder source changes, and be stable across calls
    from stock_data_etl_pipeline_spark.plans import _query_fingerprint

    def build_a(spark, sf_dir):
        return None

    def build_b(spark, sf_dir):
        return 1

    cat1 = {"x": (build_a, "SELECT 1")}
    cat2 = {"x": (build_a, "SELECT 2")}
    cat3 = {"x": (build_b, "SELECT 1")}
    f1 = _query_fingerprint("x", cat1)
    assert f1 == _query_fingerprint("x", cat1)
    assert f1 != _query_fingerprint("x", cat2)
    assert f1 != _query_fingerprint("x", cat3)


def test_fingerprint_manifest_reader_survives_bad_file(tmp_path):
    from stock_data_etl_pipeline_spark.plans import _fingerprint_manifest
    assert _fingerprint_manifest(str(tmp_path)) == {}  # absent
    (tmp_path / "tools").mkdir()
    mf = tmp_path / "tools" / "QUERY_FINGERPRINTS.json"
    mf.write_text("{not json")
    assert _fingerprint_manifest(str(tmp_path)) == {}  # unreadable
    mf.write_text(json.dumps({"a": {"fp": "abc", "round": 3},
                              "b": "junk", "c": {"round": 4}}))
    assert _fingerprint_manifest(str(tmp_path)) == {"a": "abc"}


def test_register_rejects_duplicate_names():
    # a silent overwrite shadowed a query in round 10 — the decorator
    # must refuse duplicates at import time
    import pytest

    from stock_data_etl_pipeline_spark.plans.catalog import register
    existing = next(iter(CATALOG))
    with pytest.raises(ValueError, match="already registered"):
        @register(existing, None)
        def clash(spark, sf_dir):  # pragma: no cover
            return None


def test_stamp_fingerprints_modes(tmp_path, monkeypatch):
    # drive the manifest tool end to end against a tmp manifest and a
    # synthetic CORRECTNESS history: --init stamps greens at their
    # last-green round, default mode re-stamps only the latest round's
    # greens, --invalidate forces an entry stale
    import importlib
    import json
    import sys

    import tools.stamp_fingerprints as sf
    sf = importlib.reload(sf)
    manifest = tmp_path / "QUERY_FINGERPRINTS.json"
    monkeypatch.setattr(sf, "MANIFEST", str(manifest))

    from stock_data_etl_pipeline_spark import plans
    names = list(CATALOG)
    g_old, g_new = names[0], names[1]

    def fake_status(with_rounds=False):
        status = {g_old: "green", g_new: "green"}
        rounds = {g_old: 3, g_new: 9}
        return (9, status, rounds) if with_rounds else (9, status)

    monkeypatch.setattr(plans, "_correctness_status", fake_status)

    monkeypatch.setattr(sys, "argv", ["stamp_fingerprints.py", "--init"])
    assert sf.main() == 0
    m = json.loads(manifest.read_text())
    assert m[g_old]["round"] == 3 and m[g_new]["round"] == 9
    assert m[g_old]["fp"] == plans._query_fingerprint(g_old)

    # default mode: only the latest round's greens are re-stamped
    m[g_old]["fp"] = "stale"
    m[g_new]["fp"] = "stale"
    manifest.write_text(json.dumps(m))
    monkeypatch.setattr(sys, "argv", ["stamp_fingerprints.py"])
    assert sf.main() == 0
    m = json.loads(manifest.read_text())
    assert m[g_old]["fp"] == "stale"          # r3 green untouched
    assert m[g_new]["fp"] == plans._query_fingerprint(g_new)

    monkeypatch.setattr(sys, "argv",
                        ["stamp_fingerprints.py", "--invalidate", g_new])
    assert sf.main() == 0
    m = json.loads(manifest.read_text())
    assert m[g_new]["fp"] == "invalidated"

    # unknown name refuses
    monkeypatch.setattr(sys, "argv",
                        ["stamp_fingerprints.py", "--invalidate", "nope"])
    assert sf.main() == 1


def test_fingerprint_includes_helper_closure(tmp_path, monkeypatch):
    # r11: the fingerprint must hash the builder's package-local call
    # closure, so an edit buried in an operator helper the builder
    # calls (directly or transitively) moves the fingerprint without a
    # manual --invalidate (the r10 blind spot). Exercised against a
    # synthetic on-disk package so the file edit is real.
    import importlib
    import sys as _sys
    from stock_data_etl_pipeline_spark.plans import fingerprint as fpm

    pkg = tmp_path / "fp_probe_pkg"
    pkg.mkdir()
    (pkg / "__init__.py").write_text("")
    helper = pkg / "helpers.py"
    helper.write_text(
        "def deep():\n    return 1\n\n"
        "def shallow():\n    return deep()\n")
    (pkg / "builders.py").write_text(
        "from .helpers import shallow\n\n"
        "def build(spark, sf_dir):\n    return shallow()\n")
    monkeypatch.syspath_prepend(str(tmp_path))
    monkeypatch.setattr(fpm, "PKG_PREFIX", "fp_probe_pkg")
    builders = importlib.import_module("fp_probe_pkg.builders")

    srcs = fpm.closure_sources(builders.build)
    names = {qn for (_, qn) in srcs}
    assert {"build", "shallow", "deep"} <= names  # transitive closure
    fp1 = fpm.fingerprint(builders.build, "SELECT 1")

    # edit ONLY the transitively-called helper; builder source unchanged
    helper.write_text(
        "def deep():\n    return 2  # changed\n\n"
        "def shallow():\n    return deep()\n")
    import linecache
    linecache.clearcache()
    importlib.reload(_sys.modules["fp_probe_pkg.helpers"])
    builders = importlib.reload(builders)
    fp2 = fpm.fingerprint(builders.build, "SELECT 1")
    assert fp1 != fp2

    # re-editing back restores the original fingerprint (content-based,
    # not mtime/identity-based)
    helper.write_text(
        "def deep():\n    return 1\n\n"
        "def shallow():\n    return deep()\n")
    linecache.clearcache()
    importlib.reload(_sys.modules["fp_probe_pkg.helpers"])
    builders = importlib.reload(builders)
    assert fpm.fingerprint(builders.build, "SELECT 1") == fp1


def test_fingerprint_includes_module_attr_refs_and_consts(tmp_path,
                                                          monkeypatch):
    # module-attribute style (`from . import ops; ops.kernel(...)`) must
    # resolve per-used-attribute — editing the USED kernel moves the
    # fingerprint, while appending an UNUSED function to the same module
    # does not (whole-module hashing would flood the changed tier).
    # Immutable module-level constants the kernel references are hashed
    # too; mutable module-level caches are excluded.
    import importlib
    import sys as _sys
    from stock_data_etl_pipeline_spark.plans import fingerprint as fpm

    pkg = tmp_path / "fp_probe_pkg2"
    pkg.mkdir()
    (pkg / "__init__.py").write_text("")
    ops = pkg / "ops.py"
    ops.write_text(
        "THRESH = 5\n_CACHE = {}\n\n"
        "def kernel(x):\n    return x + THRESH\n")
    (pkg / "builders.py").write_text(
        "from . import ops\n\n"
        "def build(spark, sf_dir):\n    return ops.kernel(1)\n")
    monkeypatch.syspath_prepend(str(tmp_path))
    monkeypatch.setattr(fpm, "PKG_PREFIX", "fp_probe_pkg2")
    builders = importlib.import_module("fp_probe_pkg2.builders")

    srcs = fpm.closure_sources(builders.build)
    assert ("fp_probe_pkg2.ops", "kernel") in srcs
    assert ("fp_probe_pkg2.ops", "THRESH=const") in srcs
    assert not any(qn == "<module>" for (_, qn) in srcs)
    assert not any("_CACHE" in qn for (_, qn) in srcs)  # mutable cache out
    fp1 = fpm.fingerprint(builders.build, None)

    def _reload():
        import linecache
        linecache.clearcache()
        importlib.reload(_sys.modules["fp_probe_pkg2.ops"])
        return importlib.reload(_sys.modules["fp_probe_pkg2.builders"])

    # appending an unused function must NOT move the fingerprint
    ops.write_text(
        "THRESH = 5\n_CACHE = {}\n\n"
        "def kernel(x):\n    return x + THRESH\n\n"
        "def new_unused():\n    return 99\n")
    builders = _reload()
    assert fpm.fingerprint(builders.build, None) == fp1

    # changing the referenced immutable constant MUST move it
    ops.write_text(
        "THRESH = 6\n_CACHE = {}\n\n"
        "def kernel(x):\n    return x + THRESH\n")
    builders = _reload()
    assert fpm.fingerprint(builders.build, None) != fp1


def test_live_catalog_closures_reach_operator_helpers():
    # the real catalog: dedup_edit_distance's fingerprint must cover the
    # dedup operator function it delegates to, not just the thin builder
    from stock_data_etl_pipeline_spark.plans import fingerprint as fpm
    fn, _ = CATALOG["dedup_edit_distance"]
    mods = {m for (m, _qn) in fpm.closure_sources(fn)}
    assert "stock_data_etl_pipeline_spark.operators.dedup" in mods
