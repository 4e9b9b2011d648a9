#!/usr/bin/env python3
"""Diff two itemized bench records (BENCH_FULL.json shape, or lines of
BENCH_FULL_HISTORY.jsonl) and flag per-query regressions.

Usage:
  python3 tools/benchdiff.py OLD.json NEW.json [--threshold 2.0]
  python3 tools/benchdiff.py --history BENCH_FULL_HISTORY.jsonl   # last two lines

Per query: old s, new s, ratio. Flags ratio >= threshold (default 2x,
the round guard's bar) and ratio <= 1/threshold (improvements), skips
the sub-0.3s noise band, and reports added/removed queries and
pipeline-stage drift separately. Dev tool only — the engine is Scala.
"""
import argparse
import json
import sys

NOISE_SEC = 0.3


def load_pair(args):
    if args.history:
        lines = [json.loads(l) for l in open(args.history) if l.strip()]
        if len(lines) < 2:
            sys.exit("history has fewer than two runs")
        return lines[-2], lines[-1]
    return json.load(open(args.old)), json.load(open(args.new))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old", nargs="?")
    ap.add_argument("new", nargs="?")
    ap.add_argument("--history")
    ap.add_argument("--threshold", type=float, default=2.0)
    args = ap.parse_args()
    if not args.history and not (args.old and args.new):
        ap.error("need OLD NEW files or --history")
    old, new = load_pair(args)
    oq, nq = old.get("queries", {}), new.get("queries", {})

    both = sorted(set(oq) & set(nq))
    flagged = []
    for q in both:
        a, b = oq[q], nq[q]
        if max(a, b) < NOISE_SEC:
            continue
        ratio = b / a if a > 0 else float("inf")
        if ratio >= args.threshold or ratio <= 1 / args.threshold:
            flagged.append((q, a, b, ratio))
    flagged.sort(key=lambda t: -t[3])

    total_o = sum(oq[q] for q in both)
    total_n = sum(nq[q] for q in both)
    print(f"comparable queries: {len(both)}  "
          f"total {total_o:.1f}s -> {total_n:.1f}s ({total_n/total_o:.2f}x)")
    # environment sentinel: a run that flagged itself is not a regression
    # signal — say so before anything below gets over-read
    for label, rec in (("old", old), ("new", new)):
        if rec.get("env_suspect"):
            calib = rec.get("calibration", [])
            secs = [c["sec"] for c in calib]
            print(f"  !! {label} run flagged env_suspect "
                  f"(calibration {min(secs):.2f}-{max(secs):.2f}s over {len(secs)} samples)"
                  if secs else f"  !! {label} run flagged env_suspect")
    for q in sorted(set(nq) - set(oq)):
        print(f"  + added   {q:<28} {nq[q]:6.2f}s")
    for q in sorted(set(oq) - set(nq)):
        print(f"  - removed {q:<28} {oq[q]:6.2f}s")
    if not flagged:
        print(f"no query moved past {args.threshold}x (noise band {NOISE_SEC}s)")
    for q, a, b, r in flagged:
        tag = "REGRESSED" if r > 1 else "improved"
        rr = new.get("reruns", {}).get(q)
        extra = f"  reruns={rr}" if rr else ""
        print(f"  {tag:<9} {q:<28} {a:6.2f}s -> {b:6.2f}s ({r:.2f}x){extra}")

    op, np_ = old.get("pipeline") or {}, new.get("pipeline") or {}
    for st in sorted(set(op) & set(np_)):
        a, b = op[st], np_[st]
        if max(a, b) < NOISE_SEC:
            continue
        # a==0 means the old run failed/skipped this stage — mirror the
        # query path's guard instead of dying on ZeroDivisionError
        ratio = b / a if a > 0 else float("inf")
        if ratio >= args.threshold or ratio <= 1 / args.threshold:
            print(f"  pipeline  {st:<28} {a:6.2f}s -> {b:6.2f}s ({ratio:.2f}x)")

    # JVM first-run tax: where the re-run guard fired, [cold, warm] is
    # recorded; the gap is per-query-shape codegen/JIT that amortizes to
    # zero at 100 TB but reads as a regression in cold artifacts. Surface
    # it as a table so compile-heavy queries (q_d11-style) are documented
    # once instead of re-litigated every round.
    rr = new.get("reruns") or {}
    taxed = [(q, a, b, a - b) for q, (a, b) in rr.items() if b >= 0 and a > b]
    if taxed:
        print("jvm first-run tax (re-run guard fired; cold -> warm):")
        for q, a, b, tax in sorted(taxed, key=lambda t: -t[3]):
            print(f"  {q:<28} cold {a:6.2f}s  warm {b:6.2f}s  tax {tax:6.2f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
