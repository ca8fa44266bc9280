#!/usr/bin/env python3
"""Per-round bench regression comparison — the judge's hand computation
(common-query sums, per-query ratios, alarm on >1.25x) as a committed,
repeatable script.

Usage:
    python3 tools/bench_compare.py OLD.json NEW.json [--alarm 1.25]
        [--control SAME_CODE_A.json SAME_CODE_B.json]

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

A/A control (--control): two artifacts of the SAME code run twice band
each flagged query against same-code drift - the scripted form of the
r16 hand adjudication (5-run isolated probes with an accidental A/A
pair). Per flagged query, the session-normalized A/B ratio is compared
against the MAXIMUM normalized drift any non-noise query showed in the
control pair: a full sweep flags the extremes among ~122 queries, so
the only sound artifacts-alone test is "could a same-code sweep have
produced a value this extreme?" - i.e. the control sample's max, not a
mid quantile (p90/p95 are printed for context). A flag inside the band
is adjudicated "within same-code drift"; a flag beyond it is REAL as
far as the artifacts can tell, and the right next step is an isolated
multi-run probe of that one query (the r16 method) before reverting
code. The exit code reflects only the flags that survive adjudication.
The control pair should be same-box and same scale factor;
cross-session control pairs are fine (they band session weather too,
which is the point - a tighter same-session A/A gives a tighter band).
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
    p.add_argument("--control", nargs=2, metavar=("SAME_A", "SAME_B"),
                   default=None,
                   help="two artifacts of the SAME code run twice; "
                        "flagged queries inside the same-code drift "
                        "band are adjudicated as not-real")
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

    if regressions and ns.control:
        ca, cb = load(ns.control[0]), load(ns.control[1])
        cc = sorted(set(ca) & set(cb))
        cratios = {q: cb[q] / ca[q] for q in cc if ca[q] > 0}
        if not cratios:
            sys.exit("control pair shares no queries")
        csession = statistics.median(cratios.values())
        # normalized symmetric drift: how far one same-code run strays
        # from the other once each pair's session factor is divided out
        def drift(r, s):
            rn = r / s
            return max(rn, 1.0 / rn)
        cdrift = {q: drift(cratios[q], csession) for q in cratios
                  if max(ca[q], cb[q]) > noise_floor}
        ranked_drift = sorted(cdrift.values())
        band = ranked_drift[-1]
        p90 = ranked_drift[int(0.9 * (len(ranked_drift) - 1))]
        p95 = ranked_drift[int(0.95 * (len(ranked_drift) - 1))]
        print(f"\nA/A control    : {len(cdrift)} non-noise queries, "
              f"control session factor {csession:.3f}, normalized "
              f"drift p90 {p90:.3f}x / p95 {p95:.3f}x / max {band:.3f}x")
        survive = set()
        for q in sorted(regressions):
            norm = ratios[q] / session
            own = cdrift.get(q, float("nan"))
            if norm <= band:
                print(f"  {q}: norm {norm:.2f}x <= same-code max drift "
                      f"{band:.2f}x (own A/A {own:.2f}x) - within "
                      "same-code drift, NOT a real regression")
            else:
                survive.add(q)
                print(f"  {q}: norm {norm:.2f}x > ALL same-code drift "
                      f"in the control (max {band:.2f}x, own A/A "
                      f"{own:.2f}x) - REAL as far as the artifacts can "
                      "tell; confirm with an isolated multi-run probe "
                      "of this query before reverting code")
        if survive:
            print(f"\n{len(survive)} regression(s) survive the A/A "
                  "adjudication")
            sys.exit(1)
        print("\nall flags adjudicated within same-code drift - "
              "no real regressions")
        return

    if regressions:
        print(f"\n{len(regressions)} regression(s) beyond {alarm}x")
        sys.exit(1)
    print("\nno regressions beyond the alarm")


if __name__ == "__main__":
    main()
