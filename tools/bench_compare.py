#!/usr/bin/env python3
"""Compare two bench.json files with probe normalization (dev tool).

The container's background load moves whole-run totals by 1.5-2x with no
code change (BASELINE.md), so raw totals across runs are not comparable.
Each bench.json carries calib_s = [pre, post] probe timings of a fixed
trivial query; the steady-state probe scales ~linearly with contention,
so dividing per-query times by (probe / REF_PROBE) gives a first-order
contention-corrected comparison. REF_PROBE is the cleanest probe ever
recorded on this machine (0.14 s, BASELINE.md round-7 record).

Usage: tools/bench_compare.py OLD.json NEW.json [top_n]
Flags queries whose normalized time changed by more than 30% AND 0.15 s.
"""
import json
import sys

REF_PROBE = 0.14


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d:
        sys.exit(f"{path}: no 'queries' key — not a per-query bench record "
                 "(older-round files predate per-query timings)")
    # calib_s may be absent, empty, or all non-positive (a crashed probe
    # records -1): fall back to REF_PROBE, i.e. no normalization
    positives = [x for x in d.get("calib_s", []) if x > 0]
    probe = min(positives) if positives else REF_PROBE
    scale = probe / REF_PROBE
    return {k: v / scale for k, v in d["queries"].items()}, probe, d


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    old, op, od = load(old_path)
    new, np_, nd = load(new_path)
    print(f"old: {od['value']:.1f}s raw, probe {op:.2f}s, {len(old)} queries")
    print(f"new: {nd['value']:.1f}s raw, probe {np_:.2f}s, {len(new)} queries")
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print("added:", ", ".join(f"{q} ({new[q]:.2f}s norm)" for q in added))
    if removed:
        print("removed:", ", ".join(removed))
    common = sorted(set(old) & set(new), key=lambda q: new[q] - old[q])
    flagged = [q for q in common
               if abs(new[q] - old[q]) > 0.15
               and abs(new[q] - old[q]) > 0.3 * max(old[q], 1e-9)]
    print(f"\n{'query':30s} {'old~':>7s} {'new~':>7s} {'delta':>7s}  (probe-normalized)")
    shown = flagged if flagged else common[-top_n:]
    for q in sorted(shown, key=lambda q: old[q] - new[q]):
        mark = " <-- " if q in flagged else ""
        print(f"{q:30s} {old[q]:7.2f} {new[q]:7.2f} {new[q]-old[q]:+7.2f}{mark}")
    tot_o = sum(old[q] for q in common)
    tot_n = sum(new[q] for q in common)
    print(f"\ncommon-query normalized totals: {tot_o:.1f}s -> {tot_n:.1f}s "
          f"({tot_n - tot_o:+.1f}s)")


if __name__ == "__main__":
    main()
