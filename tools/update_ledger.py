#!/usr/bin/env python3
"""Fold a bench_detail.json sweep into BENCH_LEDGER.json (downward only).

The ledger is the per-query BEST KNOWN time at the fixed bench config
(sf0.1, 8 cpus, 8 shuffle partitions, best-of-2) plus the shuffle MB
observed at that best run. It exists to make regressions decidable in
one look: this host's intermittent starvation makes round-over-round
diffs noisy (documented 2-6x single-query stalls with untouched code),
so the round summary diffs against the ledger, not last round's
possibly-stalled artifact.

Usage:  python3 tools/update_ledger.py [bench_detail.json] [BENCH_LEDGER.json]

Prints the queries whose current time exceeds their ledger entry by
more than 2x (the re-measure-before-concluding watchlist) and any
shuffle_mb drifts (plan changes regardless of time), then writes the
ledger back with any NEW minima folded in.
"""
import json
import sys


def main() -> int:
    detail_path = sys.argv[1] if len(sys.argv) > 1 else "bench_detail.json"
    ledger_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_LEDGER.json"
    detail = json.load(open(detail_path))
    ledger = json.load(open(ledger_path))
    if detail.get("sf") != ledger["config"]["sf"]:
        print(f"refusing: sweep sf {detail.get('sf')} != ledger config "
              f"{ledger['config']['sf']}")
        return 1
    entries = ledger["queries"]
    slow, drift, lowered, new = [], [], 0, 0
    for q, t in sorted(detail["queries"].items()):
        sh = detail.get("shuffle_mb", {}).get(q)
        e = entries.get(q)
        if e is None:
            entries[q] = {"best_sec": t, "shuffle_mb": sh}
            new += 1
            continue
        # A shuffle change is a PLAN change: report it and reset the
        # floor — a best time recorded under the old plan is not a
        # valid target for the new one (in either direction).
        if sh is not None and e.get("shuffle_mb") is not None:
            base = max(e["shuffle_mb"], 0.01)
            if abs(sh - e["shuffle_mb"]) / base > 0.25 and \
                    abs(sh - e["shuffle_mb"]) > 0.25:
                drift.append((q, e["shuffle_mb"], sh))
                entries[q] = {"best_sec": t, "shuffle_mb": sh}
                continue
        if t < e["best_sec"]:
            entries[q] = {"best_sec": t, "shuffle_mb": sh}
            lowered += 1
        elif t > 2 * e["best_sec"] and t - e["best_sec"] > 1.0:
            slow.append((q, e["best_sec"], t))
    json.dump(ledger, open(ledger_path, "w"), indent=1)
    print(f"ledger: {len(entries)} queries, {new} new, {lowered} lowered")
    for q, b, t in sorted(slow, key=lambda x: -(x[2] - x[1])):
        print(f"  WATCH {q}: {t:.2f}s vs best-known {b:.2f}s "
              f"(re-measure standalone before concluding)")
    for q, b, s in drift:
        print(f"  PLAN-DRIFT {q}: shuffle {b:.3f} -> {s:.3f} MB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
