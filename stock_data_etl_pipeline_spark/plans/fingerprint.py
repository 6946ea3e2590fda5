"""Function-closure fingerprinting for the rotation's changed-since-green
tier (closes the round-10 helper blind spot, VERDICT r10 item 3).

The old fingerprint hashed only the builder callable's own source plus its
oracle SQL, so an edit buried in an operator helper the builder calls (the
round-9 ``dedup_edit_distance`` gap) did not move the fingerprint and the
stale green row kept the query out of the driver window; those edits needed
a manual ``stamp_fingerprints.py --invalidate``. This module hashes the
builder's full *package-local call closure* instead: the builder source,
plus the source of every function/class defined inside
``stock_data_etl_pipeline_spark`` that the builder references — directly,
via module attributes (``indicators.macd(df)``), via function-local
imports (``from ..operators.analytics import rich_club`` inside the
builder body — resolved by AST-walking the import statements, since they
never appear in ``__globals__``), via default arguments, via closure
cells, or transitively through other package functions — plus canonical
reprs of referenced immutable module-level constants.

Deliberately function-level, not module-level: the verdict's "simply hash
each imported operators/*.py file" alternative would move the fingerprint
of every stock_* query whenever a NEW indicator is appended to
``operators/indicators.py``, flooding the 50-query driver window with
hundreds of changed-tier rows and starving the rookies (changed-tier ranks
BEFORE never-checked in ``plans._window_order``). Closure hashing moves
only the queries whose reachable code actually changed.

Determinism: collected sources are sorted by (module, qualname) before
hashing; the walk itself is iterative with a visited set, so import cycles
and mutual recursion terminate.
"""

from __future__ import annotations

import hashlib
import inspect
import types

# Package prefix that marks "our" code. Tests monkeypatch this to point the
# walker at a synthetic temp package.
PKG_PREFIX = "stock_data_etl_pipeline_spark"


def _code_names(code) -> set:
    """All global/attribute names referenced by a code object, including
    names used inside nested code objects (comprehensions, lambdas,
    inner functions)."""
    names: set = set()
    stack = [code]
    while stack:
        c = stack.pop()
        if c is None:
            continue
        names.update(getattr(c, "co_names", ()))
        for const in getattr(c, "co_consts", ()):
            if isinstance(const, types.CodeType):
                stack.append(const)
    return names


def _is_pkg(obj) -> bool:
    mod = getattr(obj, "__module__", None) or ""
    return mod == PKG_PREFIX or mod.startswith(PKG_PREFIX + ".")


def _obj_key(obj):
    return (getattr(obj, "__module__", "") or "",
            getattr(obj, "__qualname__",
                    getattr(obj, "__name__", repr(obj))))


def _const_repr(val) -> str | None:
    """A canonical repr for a referenced module-level constant, or None
    if the value must not enter the fingerprint. Only *immutable*
    top-level types qualify: module-level dicts/lists/sets are routinely
    runtime-mutated caches (``registry._EVENTS_TS_UNIT``,
    ``pinned._PINNED``) whose repr depends on what already ran in the
    process — hashing them would make the fingerprint state-dependent.
    The cost is that an edit to a mutable module-level lookup table does
    not move dependents' fingerprints; code edits (the actual r9/r10
    gap) always do, via source hashing."""
    if not isinstance(val, (str, bytes, int, float, bool, type(None),
                            tuple, frozenset)):
        return None
    return _stable_repr(val)


def _stable_repr(val) -> str | None:
    """A canonical, process-stable repr of ``val``, or None if one cannot
    be built (custom objects would leak id()-based addresses; set
    iteration order varies under str-hash randomization, so sets are
    rendered sorted)."""
    if isinstance(val, (set, frozenset)):
        parts = [_stable_repr(v) for v in val]
        if any(p is None for p in parts):
            return None
        return "{" + ", ".join(sorted(parts)) + "}"
    if isinstance(val, (tuple, list)):
        parts = [_stable_repr(v) for v in val]
        if any(p is None for p in parts):
            return None
        l, r = ("(", ")") if isinstance(val, tuple) else ("[", "]")
        return l + ", ".join(parts) + r
    if isinstance(val, dict):  # insertion order is stable per source file
        items = []
        for k, v in val.items():
            rk, rv = _stable_repr(k), _stable_repr(v)
            if rk is None or rv is None:
                return None
            items.append(f"{rk}: {rv}")
        return "{" + ", ".join(items) + "}"
    if isinstance(val, (str, bytes, int, float, bool, type(None))):
        return repr(val)
    return None


def _const_name_ok(name: str) -> bool:
    """Only PUBLIC UPPER_CASE module globals are treated as constants.
    Immutability of the *object* does not make the *binding* constant —
    warn-once flags (``pinned._warned_checkpoint_accessor``) rebind a
    bool at runtime, which would make the fingerprint depend on what
    already ran in the process. The UPPER_CASE convention marks the
    bindings the codebase treats as frozen."""
    return bool(name) and not name.startswith("_") and name.isupper()


def _expand_module(mod, names, out, consts, _seen=None):
    """Per-attribute resolution of a referenced package module: every
    ``names`` entry the code object mentions is looked up on the module,
    so only the functions actually used enter the closure — hashing the
    whole module would move every stock_* fingerprint whenever a NEW
    indicator is appended. Package submodule attributes are expanded
    recursively (``from ..operators import indicators`` in a function
    body resolves the *module* by name) with a cycle guard."""
    mname = getattr(mod, "__name__", "")
    if not (mname == PKG_PREFIX or mname.startswith(PKG_PREFIX + ".")):
        return
    _seen = _seen if _seen is not None else set()
    if id(mod) in _seen:
        return
    _seen.add(id(mod))
    for attr_name in names:
        attr = getattr(mod, attr_name, None)
        if attr is None:
            continue
        if isinstance(attr, types.ModuleType):
            _expand_module(attr, names, out, consts, _seen)
        elif callable(attr):
            out.append(attr)
        elif consts is not None and _const_name_ok(attr_name):
            r = _const_repr(attr)
            if r is not None:
                consts[(mname, attr_name)] = r


def _local_imports(fn, names, out, consts):
    """Resolve function-LOCAL import statements (``from ..operators.x
    import y`` inside the body) by AST — they bind names locally at call
    time, so ``__globals__`` never sees them (the ``graph_rich_club``
    gap: its builder imports ``rich_club`` in-body and the globals-only
    walk missed the operator entirely). Relative levels resolve against
    the function's defining package; only package-internal modules are
    followed. Best-effort: unparsable source or unimportable module is
    skipped (the globals walk already covered everything else)."""
    import ast
    import importlib
    import importlib.util
    import textwrap

    try:
        src = textwrap.dedent(inspect.getsource(fn))
        tree = ast.parse(src)
    except (OSError, TypeError, SyntaxError, IndentationError):
        return
    own_mod = getattr(fn, "__module__", "") or ""
    pkg = own_mod.rsplit(".", 1)[0] if "." in own_mod else own_mod
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            target = "." * node.level + (node.module or "")
            try:
                resolved = importlib.util.resolve_name(target, pkg) \
                    if node.level else (node.module or "")
                if not (resolved == PKG_PREFIX
                        or resolved.startswith(PKG_PREFIX + ".")):
                    continue
                mod = importlib.import_module(resolved)
            except Exception:  # noqa: BLE001 — best-effort resolution
                continue
            for alias in node.names:
                if alias.name == "*":
                    _expand_module(mod, names, out, consts)
                    continue
                attr = getattr(mod, alias.name, None)
                if attr is None:
                    continue
                if isinstance(attr, types.ModuleType):
                    # `from ..operators import indicators` in-body:
                    # expand per-used-attribute, never whole-module
                    _expand_module(attr, names, out, consts)
                elif callable(attr):
                    out.append(attr)
                elif consts is not None and _const_name_ok(alias.name):
                    r = _const_repr(attr)
                    if r is not None:
                        consts[(resolved, alias.name)] = r
        elif isinstance(node, ast.Import):
            for alias in node.names:
                if not (alias.name == PKG_PREFIX
                        or alias.name.startswith(PKG_PREFIX + ".")):
                    continue
                try:
                    mod = importlib.import_module(alias.name)
                except Exception:  # noqa: BLE001
                    continue
                _expand_module(mod, names, out, consts)


# (id(obj), PKG_PREFIX) -> (obj, refs, consts). The strong ref on obj keeps
# its id from being reused; prefix in the key isolates the synthetic-package
# meta-tests (they monkeypatch PKG_PREFIX) from the real-catalog entries.
_REF_CACHE: dict = {}


def _referenced(obj, consts: dict | None = None):
    """Memoized wrapper over ``_referenced_uncached`` — shared helpers
    (``registry.load_table`` appears in every catalog closure) are walked
    once per process, not once per query."""
    key = (id(obj), PKG_PREFIX)
    ent = _REF_CACHE.get(key)
    if ent is None or ent[0] is not obj:
        local: dict = {}
        refs = _referenced_uncached(obj, local)
        ent = (obj, refs, local)
        _REF_CACHE[key] = ent
    if consts is not None:
        consts.update(ent[2])
    return ent[1]


def _referenced_uncached(obj, consts: dict | None = None):
    """Objects a function/class references that may belong to the package:
    resolved from the defining module's globals by code-object names,
    from function-local import statements (AST), plus default args and
    closure cells. For classes, walk the methods.

    A referenced *package module* (``from ..operators import indicators``
    then ``indicators.macd(df)``) is resolved per-attribute via
    ``_expand_module``. If ``consts`` is given, canonical reprs of
    referenced immutable module-level constants are recorded there keyed
    by (module, name)."""
    out = []
    if isinstance(obj, type):
        for attr in vars(obj).values():
            if isinstance(attr, (staticmethod, classmethod)):
                attr = attr.__func__
            if isinstance(attr, (types.FunctionType, property)):
                if isinstance(attr, property):
                    out.extend(f for f in (attr.fget, attr.fset, attr.fdel)
                               if f is not None)
                else:
                    out.append(attr)
        return out
    fn = inspect.unwrap(obj)
    code = getattr(fn, "__code__", None)
    if code is None:
        return out
    gl = getattr(fn, "__globals__", {})
    names = sorted(_code_names(code))
    own_mod = getattr(fn, "__module__", "") or ""
    for name in names:
        ref = gl.get(name)
        if ref is None:
            continue
        if isinstance(ref, types.ModuleType):
            _expand_module(ref, names, out, consts)
            continue
        if callable(ref):
            out.append(ref)
        elif consts is not None and _const_name_ok(name):
            r = _const_repr(ref)
            if r is not None:
                consts[(own_mod, name)] = r
    for ref in (getattr(fn, "__defaults__", None) or ()):
        out.append(ref)
    kwd = getattr(fn, "__kwdefaults__", None) or {}
    for ref in kwd.values():
        out.append(ref)
    for cell in (getattr(fn, "__closure__", None) or ()):
        try:
            out.append(cell.cell_contents)
        except ValueError:  # empty cell
            pass
    _local_imports(fn, names, out, consts)
    return out


def closure_sources(fn) -> dict:
    """(module, qualname) -> source for the builder plus every
    package-defined callable transitively reachable from it, plus
    ``(module, 'name=const') -> canonical repr`` pseudo-entries for
    referenced module-level constants. Package modules referenced
    attribute-style are resolved per-used-attribute inside
    ``_referenced``; a module only contributes a whole-module
    ``(module_name, '<module>')`` entry when it is reachable some other
    way (a default argument, a closure cell) where per-name resolution
    is impossible."""
    seen: dict = {}
    visited: set = set()
    consts: dict = {}
    stack = [fn]
    first = True
    while stack:
        obj = stack.pop()
        if isinstance(obj, types.ModuleType):
            name = getattr(obj, "__name__", "")
            if (name == PKG_PREFIX or name.startswith(PKG_PREFIX + ".")) \
                    and (name, "<module>") not in visited:
                visited.add((name, "<module>"))
                try:
                    seen[(name, "<module>")] = inspect.getsource(obj)
                except (OSError, TypeError):
                    seen[(name, "<module>")] = f"<no-source {name}>"
            continue
        if not callable(obj):
            continue
        try:
            obj = inspect.unwrap(obj)
        except ValueError:  # pathological __wrapped__ cycle
            pass
        key = _obj_key(obj)
        if key in visited:
            continue
        visited.add(key)
        in_pkg = _is_pkg(obj)
        is_root = first
        if is_root or in_pkg:
            try:
                seen[key] = inspect.getsource(obj)
            except (OSError, TypeError):
                # generated functions (dataclass __eq__/__repr__ etc.)
                # have no retrievable source; repr() would leak an
                # `at 0x…` address and break cross-process stability.
                # The generating class source is already in the closure,
                # so the name alone suffices here.
                seen[key] = f"<no-source {key[0]}.{key[1]}>"
        first = False
        if not in_pkg and not is_root:
            # outside the package and not the root builder: name alone
            # identifies it (pyspark/stdlib churn must not move our
            # fingerprints). Root-ness is tracked explicitly — the old
            # ``len(seen) > 1`` proxy depended on stack pop order and
            # could expand a pyspark-internal callable reached before
            # any package object landed in ``seen``, pulling
            # third-party module constants into the payload.
            continue
        stack.extend(_referenced(obj, consts))
    for (mod, name), r in consts.items():
        seen[(mod, f"{name}=const")] = r
    return seen


def fingerprint_payload(fn, oracle: str | None) -> str:
    parts = [oracle or ""]
    srcs = closure_sources(fn)
    for (mod, qn) in sorted(srcs):
        parts.append(f"## {mod}.{qn}\n{srcs[(mod, qn)]}")
    return "\n".join(parts)


def fingerprint(fn, oracle: str | None) -> str:
    """sha256-16 of the oracle SQL + the builder's package call closure."""
    return hashlib.sha256(
        fingerprint_payload(fn, oracle).encode()).hexdigest()[:16]
