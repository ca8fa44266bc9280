#!/usr/bin/env python3
"""Per-round bench regression comparison — the judge's hand computation
(common-query sums, per-query ratios, alarm on >1.25x) as a committed,
repeatable script.

Usage:
    python3 tools/bench_compare.py OLD.json NEW.json [--alarm 1.25]

Same-session A/B protocol (the box-weather control): when the raw
common sum moves >15%, do NOT adjudicate from the two artifacts alone
- re-run the OLD round's HEAD from a git worktree back-to-back in the
same session (git worktree add /tmp/oldhead <old-sha>; run graft.Bench
there with the same SPARK_GRAFT_SF_DIR) and compare old-head-now vs
new-head-now within the session. The --session-note flag records that
adjudication in the printed report so the committed evidence is
self-describing.

Both inputs are graft.Bench artifacts ({"queries": {name: sec, ...}, ...}).
Compares the COMMON query set (new/removed queries are listed, not
compared), prints the common-sum delta, the median ratio (the session
factor - a uniformly warmer/cooler box moves every query together), and
ranks per-query ratios with the session-normalized ratio alongside for
context. Exits 1 if any RAW ratio exceeds the alarm (the judge's
per-round method), ignoring sub-0.15s noise-class queries.
"""
import argparse
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
    # argparse so '--alarm 1.25' and '--alarm=1.25' both work and a
    # valueless '--alarm' is a loud error instead of a silently kept
    # default (a gate intending a tighter alarm must not run at 1.25x
    # unnoticed)
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("old_json")
    p.add_argument("new_json")
    p.add_argument("--alarm", type=float, default=1.25,
                   help="raw per-query ratio that fails the gate "
                        "(default 1.25)")
    p.add_argument("--session-note", default=None,
                   help="free-text adjudication note (e.g. the "
                        "same-session old-HEAD control result) echoed "
                        "into the report")
    ns = p.parse_args()
    alarm = ns.alarm
    old, new = load(ns.old_json), load(ns.new_json)
    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if not common:
        sys.exit("no common queries")

    old_sum = sum(old[q] for q in common)
    new_sum = sum(new[q] for q in common)
    ratios = {q: new[q] / old[q] for q in common if old[q] > 0}
    session = statistics.median(ratios.values())
    if ns.session_note:
        print(f"session note   : {ns.session_note}")
    print(f"common queries : {len(common)}")
    print(f"common sum     : {old_sum:.1f}s -> {new_sum:.1f}s "
          f"({(new_sum / old_sum - 1) * 100:+.1f}%)")
    print(f"median ratio   : {session:.3f} (the session factor)")
    if abs(new_sum / old_sum - 1) > 0.15 and not ns.session_note:
        print("NOTE: common sum moved >15% with no --session-note - run "
              "the same-session old-HEAD control (see the usage text) "
              "before adjudicating; a session factor alone cannot "
              "separate box weather from a real regression")
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
