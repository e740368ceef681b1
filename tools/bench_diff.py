#!/usr/bin/env python3
"""Diff two bench JSON artifacts (BENCH_MEDIANS.json / BENCH_FULL.json /
BENCH_r{N}.json) per query, flagging real movement vs noise.

Usage: python3 tools/bench_diff.py OLD.json NEW.json [threshold_ratio]

Single-shot artifacts swing wildly under machine load (round 5: 302s vs
88.7s median-of-3 on identical plans), so compare medians when you can;
this tool exists so a round-over-round "regression" can be localized to
the specific queries that moved instead of argued from totals.
"""
import json
import signal
import sys

signal.signal(signal.SIGPIPE, signal.SIG_DFL)  # survive `| head`


def load(path):
    """Accept either a Bench JSON line (BENCH_MEDIANS/BENCH_FULL) or the
    driver's wrapper artifact (BENCH_r{N}.json), whose `tail` embeds the
    Bench line(s) — the LAST '{"metric":...}' found wins there."""
    with open(path) as f:
        doc = json.loads(f.read().strip())
    if "queries" in doc:
        return doc
    best = None
    for line in doc.get("tail", "").split("\n"):
        i = line.find('{"metric"')
        if i == -1:
            continue
        try:
            cand = json.loads(line[i:])
        except ValueError:
            continue
        # prefer the line with the most queries (BENCH_FULL over the
        # budget-truncated slowest-first line, when both survive the tail)
        if best is None or len(cand.get("queries", {})) > len(best.get("queries", {})):
            best = cand
    return best or doc


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    oq, nq = old.get("queries", {}), new.get("queries", {})
    print(f"total: {old.get('value')}s ({len(oq)} queries, reps={old.get('reps', 1)})"
          f" -> {new.get('value')}s ({len(nq)} queries, reps={new.get('reps', 1)})")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"added ({len(added)}): " + ", ".join(
            f"{q}={nq[q]:.2f}s" for q in added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))
    moved = []
    for q in sorted(set(oq) & set(nq)):
        o, n = oq[q], nq[q]
        if o <= 0 or n <= 0:
            continue
        ratio = n / o
        # ignore sub-threshold absolute movement: 0.1s -> 0.2s is noise
        if (ratio >= thr or ratio <= 1 / thr) and abs(n - o) >= 0.5:
            moved.append((ratio, q, o, n))
    if not moved:
        print(f"no query moved beyond {thr}x (with >=0.5s absolute change)")
    for ratio, q, o, n in sorted(moved, key=lambda t: -t[0]):
        tag = "SLOWER" if ratio > 1 else "faster"
        print(f"  {tag} {ratio:5.2f}x  {q}: {o:.2f}s -> {n:.2f}s")


if __name__ == "__main__":
    main()
