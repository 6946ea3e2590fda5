"""Maintain tools/QUERY_FINGERPRINTS.json — the per-query attestation
manifest behind the rotation's changed-since-last-green tier.

Each entry records the fingerprint (oracle SQL + the builder's
package-local call closure — builder source plus transitively reachable
package helpers, ``plans._query_fingerprint`` / ``plans.fingerprint``)
a query had when the driver last greened it. The rotation compares the stamped fingerprint against the live one
and ranks mismatches just after the reds, so a query whose code or
oracle changed after its last green row is re-attested in the next
driver window instead of coasting on a row that describes dead code.

Usage (round-start checklist: run BEFORE any code edit, right after
committing the driver's CORRECTNESS artifact):

  python tools/stamp_fingerprints.py              # stamp greens of the
                                                  # LATEST driver round
  python tools/stamp_fingerprints.py --init       # bootstrap: stamp every
                                                  # green-anywhere query at
                                                  # its last-green round
  python tools/stamp_fingerprints.py --invalidate NAME [NAME ...]
                                                  # force a query to the
                                                  # window head (helper-level
                                                  # change the fingerprint
                                                  # can't see)

The default mode only touches queries checked in the newest
CORRECTNESS_r*.json: their green rows attest the round-end commit,
which equals the working tree as long as the stamp runs before edits.
Entries for queries that left the catalog are dropped.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MANIFEST = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "QUERY_FINGERPRINTS.json")


def main() -> int:
    from stock_data_etl_pipeline_spark.plans import (CATALOG,
                                                     _correctness_status,
                                                     _query_fingerprint)

    args = sys.argv[1:]
    try:
        with open(MANIFEST) as fh:
            manifest = json.load(fh)
    except Exception:  # noqa: BLE001 — first run bootstraps the file
        manifest = {}

    latest, status, last_round = _correctness_status(with_rounds=True)

    if args and args[0] == "--invalidate":
        names = args[1:]
        unknown = [n for n in names if n not in CATALOG]
        if unknown:
            print(f"not in catalog: {unknown}", file=sys.stderr)
            return 1
        for n in names:
            manifest[n] = {"fp": "invalidated",
                           "round": manifest.get(n, {}).get("round", 0)}
        stamped = names
    elif args and args[0] == "--init":
        stamped = []
        for n in CATALOG:
            if status.get(n) == "green":
                manifest[n] = {"fp": _query_fingerprint(n),
                               "round": last_round[n]}
                stamped.append(n)
    elif not args:
        stamped = []
        for n in CATALOG:
            if status.get(n) == "green" and last_round.get(n) == latest:
                manifest[n] = {"fp": _query_fingerprint(n),
                               "round": latest}
                stamped.append(n)
    else:
        print(__doc__, file=sys.stderr)
        return 1

    # drop entries for queries no longer registered
    dropped = [n for n in manifest if n not in CATALOG]
    for n in dropped:
        del manifest[n]

    with open(MANIFEST, "w") as fh:
        json.dump(dict(sorted(manifest.items())), fh, indent=1)
        fh.write("\n")
    print(f"stamped {len(stamped)}, dropped {len(dropped)}, "
          f"manifest {len(manifest)} entries (latest driver round "
          f"{latest})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
