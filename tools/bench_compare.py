#!/usr/bin/env python3
"""Per-round bench regression comparison — the judge's hand computation
(common-query sums, per-query ratios, alarm on >1.25x) as a committed,
repeatable script.

Usage:
    python3 tools/bench_compare.py OLD.json NEW.json [--alarm 1.25]

Both inputs are graft.Bench artifacts ({"queries": {name: sec, ...}, ...}).
Compares the COMMON query set (new/removed queries are listed, not
compared), prints the common-sum delta, the median ratio (the session
factor - a uniformly warmer/cooler box moves every query together), and
ranks per-query ratios with the session-normalized ratio alongside for
context. Exits 1 if any RAW ratio exceeds the alarm (the judge's
per-round method), ignoring sub-0.15s noise-class queries.
"""
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    qs = d.get("queries") or {}
    if not qs:
        sys.exit(f"{path}: no queries map")
    return {k: float(v) for k, v in qs.items()}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) != 2:
        sys.exit(__doc__)
    alarm = 1.25
    for a in sys.argv[1:]:
        if a.startswith("--alarm"):
            alarm = float(a.split("=", 1)[1]) if "=" in a else alarm
    old, new = load(args[0]), load(args[1])
    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if not common:
        sys.exit("no common queries")

    old_sum = sum(old[q] for q in common)
    new_sum = sum(new[q] for q in common)
    ratios = {q: new[q] / old[q] for q in common if old[q] > 0}
    session = statistics.median(ratios.values())
    print(f"common queries : {len(common)}")
    print(f"common sum     : {old_sum:.1f}s -> {new_sum:.1f}s "
          f"({(new_sum / old_sum - 1) * 100:+.1f}%)")
    print(f"median ratio   : {session:.3f} (the session factor)")
    if added:
        print(f"added          : {', '.join(added)} "
              f"(+{sum(new[q] for q in added):.1f}s, not compared)")
    if removed:
        print(f"removed        : {', '.join(removed)}")

    # raw-ratio regressions (the per-round alarm), ignoring queries
    # whose absolute times are both inside scheduler noise; the
    # session-normalized ratio is printed alongside for context
    noise_floor = 0.15
    regressions = {q for q in ratios
                   if ratios[q] > alarm and max(old[q], new[q]) > noise_floor}

    print(f"\nworst raw ratios (alarm {alarm}x; norm = /session factor):")
    ranked = sorted(((ratios[q], q) for q in ratios), reverse=True)
    for ratio, q in ranked[:8]:
        flag = " <-- REGRESSION" if q in regressions else ""
        print(f"  {ratio:5.2f}x (norm {ratio / session:4.2f}x)  {q}  "
              f"({old[q]:.2f}s -> {new[q]:.2f}s){flag}")

    if regressions:
        print(f"\n{len(regressions)} regression(s) beyond {alarm}x")
        sys.exit(1)
    print("\nno regressions beyond the alarm")


if __name__ == "__main__":
    main()
