#!/usr/bin/env python3
"""Fold a bench_detail.json sweep into BENCH_LEDGER.json (downward only).

The ledger is the per-query BEST KNOWN time at the fixed bench config
(sf0.1, 8 cpus, 8 shuffle partitions, best-of-2) plus the shuffle MB
observed at that best run. It exists to make regressions decidable in
one look: this host's intermittent starvation makes round-over-round
diffs noisy (documented 2-6x single-query stalls with untouched code),
so the round summary diffs against the ledger, not last round's
possibly-stalled artifact.

Host-baseline annotation: a query whose floor was set in an anomalously
quiet window can sit at 2-3x that floor on every later sweep with
byte-identical shuffle and untouched code (the qd24 case, three+
consecutive standalone re-measures at 3.3-4.4 s vs a 1.64 s floor).
After K=3 CONSECUTIVE folds >= 2x floor with unchanged shuffle, the
entry gets `host_baseline_sec` = the best time observed during that
streak; WATCH thereafter fires against max(floor, host_baseline), so
the known host spread stops consuming a watchlist line every round
while the floor itself stays untouched (floors only reset on plan
change — the policy bias is preserved). A later fold at <= 1.2x floor
clears the annotation: the query demonstrated the floor is reachable
on this host again. The builder may also seed `host_baseline_sec`
directly after documented standalone re-measures (record the protocol
in ARCHITECTURE.md).

Usage:  python3 tools/update_ledger.py [bench_detail.json] [BENCH_LEDGER.json]

Prints the queries whose current time exceeds their effective baseline
by more than 2x (the re-measure-before-concluding watchlist) and any
shuffle_mb drifts (plan changes regardless of time), then writes the
ledger back with any NEW minima / annotations folded in.
"""
import json
import sys

STREAK_FOR_BASELINE = 3


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
    slow, drift, annotated, cleared, lowered, new = [], [], [], [], 0, 0
    for q, t in sorted(detail["queries"].items()):
        sh = detail.get("shuffle_mb", {}).get(q)
        e = entries.get(q)
        if e is None:
            entries[q] = {"best_sec": t, "shuffle_mb": sh}
            new += 1
            continue
        # A shuffle change is a PLAN change: report it and reset the
        # floor — a best time recorded under the old plan is not a
        # valid target for the new one (in either direction). The
        # host-baseline annotation dies with the old plan too.
        if sh is not None and e.get("shuffle_mb") is not None:
            base = max(e["shuffle_mb"], 0.01)
            if abs(sh - e["shuffle_mb"]) / base > 0.25 and \
                    abs(sh - e["shuffle_mb"]) > 0.25:
                drift.append((q, e["shuffle_mb"], sh))
                entries[q] = {"best_sec": t, "shuffle_mb": sh}
                continue
        if t < e["best_sec"]:
            e["best_sec"] = t
            e["shuffle_mb"] = sh
            lowered += 1
        if t <= 1.2 * e["best_sec"]:
            # the floor is demonstrably reachable on this host — the
            # annotation (and any in-progress streak) no longer holds
            if e.pop("host_baseline_sec", None) is not None:
                cleared.append(q)
            e.pop("slow_streak", None)
            e.pop("slow_min_sec", None)
        elif t > 2 * e["best_sec"] and t - e["best_sec"] > 1.0:
            # flat shuffle (the drift branch above already returned):
            # host-spread candidate, not a plan regression. An entry
            # already carrying a host baseline tracks no streak — the
            # annotation exists; accumulating streak keys beside it
            # would pollute the committed artifact forever.
            if e.get("host_baseline_sec") is None:
                e["slow_streak"] = e.get("slow_streak", 0) + 1
                e["slow_min_sec"] = min(t, e.get("slow_min_sec", t))
                if e["slow_streak"] >= STREAK_FOR_BASELINE:
                    e["host_baseline_sec"] = e.pop("slow_min_sec")
                    e.pop("slow_streak")
                    annotated.append(
                        (q, e["best_sec"], e["host_baseline_sec"]))
            baseline = max(e["best_sec"], e.get("host_baseline_sec", 0.0))
            if t > 2 * baseline and t - baseline > 1.0:
                slow.append((q, baseline, t))
        else:
            e.pop("slow_streak", None)
            e.pop("slow_min_sec", None)
    json.dump(ledger, open(ledger_path, "w"), indent=1)
    print(f"ledger: {len(entries)} queries, {new} new, {lowered} lowered")
    for q, b, t in sorted(slow, key=lambda x: -(x[2] - x[1])):
        print(f"  WATCH {q}: {t:.2f}s vs baseline {b:.2f}s "
              f"(re-measure standalone before concluding)")
    for q, b, s in drift:
        print(f"  PLAN-DRIFT {q}: shuffle {b:.3f} -> {s:.3f} MB")
    for q, b, h in annotated:
        print(f"  HOST-BASELINE {q}: annotated {h:.2f}s "
              f"(floor {b:.2f}s stays; {STREAK_FOR_BASELINE} consecutive "
              f"flat-shuffle folds >= 2x)")
    for q in cleared:
        print(f"  HOST-BASELINE {q}: cleared (floor reached again)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
