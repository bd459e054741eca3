#!/usr/bin/env python3
"""Fold quiet bench recordings into bench_priors.json.

Usage: fold_priors.py run1.json [run2.json ...]

Each runN.json is a bench_result.json produced by a QUIET local run.
The priors file keeps:
  - queries: per-row floor = min over the existing floor and every
    supplied recording (Bench reads only this key);
  - recordings: provenance ledger — one entry per folded run with its
    label, elapsed, loadavg-max and per-row values, so the ">=N quiet
    recordings per row" guarantee is auditable instead of asserted.
New rows (present in a recording but not the floor) enter at their
recorded value.
"""
import json, sys, os

PRIORS = os.path.join(os.path.dirname(__file__), "..", "bench_priors.json")

def main(paths):
    with open(PRIORS) as f:
        pri = json.load(f)
    floor = dict(pri["queries"])
    ledger = pri.get("recordings", [])
    for path in paths:
        with open(path) as f:
            run = json.load(f)
        assert run.get("sf") == pri["sf"], f"sf mismatch in {path}"
        # a mid-run snapshot (rewritten after every row) is not a quiet
        # recording — folding it would put an incomplete row set into
        # the provenance ledger as if it were one
        assert not run.get("partial"), f"{path} is a partial run"
        label = os.path.basename(path)
        # re-folding the same file must replace its ledger entry, not
        # duplicate it — the ledger is the auditable recording count
        ledger = [e for e in ledger if e.get("label") != label]
        rows = run["queries"]
        meta = {
            "label": label,
            "elapsed_sec": run.get("elapsed_sec"),
            "stat": run.get("stat", "min"),
            "queries": rows,
        }
        la = [r.get("loadavg") for r in run.get("rows", {}).values()
              if isinstance(r, dict) and r.get("loadavg", -1) >= 0]
        if la:
            meta["loadavg_max"] = max(la)
        ledger.append(meta)
        for k, v in rows.items():
            if isinstance(v, (int, float)) and v > 0:
                floor[k] = min(floor.get(k, v), v)
    pri["queries"] = floor
    pri["recordings"] = ledger
    with open(PRIORS, "w") as f:
        json.dump(pri, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"folded {len(paths)} recording(s); {len(floor)} rows; "
          f"{len(ledger)} ledger entries")

if __name__ == "__main__":
    main(sys.argv[1:])
