#!/usr/bin/env python3
"""Per-query bench regression report vs the committed baseline.

The round-3 bench established the perf contract; round 5 made the
methodology trustworthy: graft.Bench now reports the per-query MIN of
>=3 timed repetitions after an un-timed warm-up pass, so a regression
flag means the code got slower, not that the machine was busy.

This diffs a fresh graft.Bench JSON line against tools/bench_baseline.json.
Totals are compared over the INTERSECTION of the two query sets only —
a newly added query must not read as a regression of the old ones.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
        2>&1 | grep '^{"metric"' > /tmp/bench_now.json
    python3 tools/bench_diff.py /tmp/bench_now.json [--threshold 1.5]

Exit code 1 if any common query regressed by more than --threshold x
AND by more than --floor seconds absolute (default 0.3 s) — sub-second
queries can't trip a flag on JIT/first-touch jitter; a ratio trip under
the floor is annotated as noise in the report instead.
"""
import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bench_json", help="file holding graft.Bench's JSON line")
    ap.add_argument("--baseline", default=os.path.join(HERE, "bench_baseline.json"))
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="flag queries slower than baseline*threshold (default 1.5x)")
    ap.add_argument("--floor", type=float, default=0.3,
                    help="absolute-delta floor in seconds: a ratio trip "
                         "below this is JIT/first-touch jitter on a "
                         "sub-second query, annotated as noise instead of "
                         "flagged (default 0.3)")
    args = ap.parse_args()

    with open(args.bench_json) as f:
        text = f.read()
    cand = [json.loads(l) for l in text.splitlines()
            if l.startswith('{"metric"')]
    if not cand:
        # The driver archives BENCH_r0N.json as a wrapper object
        # {"n","rc","tail","parsed"}: "parsed" holds the compact contract
        # line (which may carry an "omitted" count) and "tail" the last
        # ~2 KB of stdout, where complete {"metric"...} lines (ideally the
        # full-precision detail record) may still be recoverable.
        wrapper = json.loads(text)
        for line in wrapper.get("tail", "").splitlines():
            if line.startswith('{"metric"'):
                try:
                    cand.append(json.loads(line))
                except json.JSONDecodeError:
                    pass  # the tail window clips the oldest line mid-object
        if not cand and isinstance(wrapper.get("parsed"), dict):
            cand.append(wrapper["parsed"])
        if not cand:
            sys.exit(f"no bench record found in {args.bench_json}: neither "
                     "{\"metric\"...} lines nor a driver wrapper with "
                     "tail/parsed")
    # prefer the full-precision detail record (carries rep_totals); the
    # compact contract line is for the bounded-tail consumer
    now = next((c for c in cand if c.get("metric") == "detail"), cand[-1])
    if now.get("metric") != "detail":
        # graft.Bench also persists the detail record as a FILE
        # (BENCH_detail.json, repo root) precisely because the driver's
        # 2 KB stdout tail drops it — fall back to that so all queries
        # stay regressionable even from a compact-only record
        detail_path = os.path.join(HERE, "..", "BENCH_detail.json")
        if os.path.exists(detail_path):
            try:
                with open(detail_path) as f:
                    d = json.loads(f.read().strip())
                if d.get("metric") == "detail":
                    # staleness guards: the compact line and the detail
                    # record carry a shared run_id — when both sides have
                    # one, an exact match is required (and sufficient).
                    # Older records without run_id fall back to the sf +
                    # total-gap heuristic (a detail file committed from a
                    # PREVIOUS round has the right sf but a different
                    # total — silently diffing last round's timings would
                    # mask regressions).
                    total_gap = abs(float(d.get("value", -1))
                                    - float(now.get("value", -2)))
                    rid_now, rid_d = now.get("run_id"), d.get("run_id")
                    if rid_now and rid_d and rid_now != rid_d:
                        print(f"note: BENCH_detail.json run_id={rid_d} does "
                              f"not match the record's {rid_now} — stale "
                              "file from another run; ignoring it")
                    elif rid_now and rid_d:  # ids match: authoritative
                        print("note: using BENCH_detail.json for the full "
                              "per-query map (run_id match)")
                        now = d
                    elif d.get("sf") != now.get("sf"):
                        print(f"note: BENCH_detail.json sf={d.get('sf')} "
                              f"differs from record sf={now.get('sf')}; "
                              "ignoring the detail file")
                    elif total_gap > 0.05:
                        print(f"note: BENCH_detail.json total "
                              f"{d.get('value')} does not match the compact "
                              f"record's {now.get('value')} (gap "
                              f"{total_gap:.3f}s) — stale file from another "
                              "run; ignoring it")
                    else:
                        print("note: using BENCH_detail.json for the full "
                              "per-query map (stdout record was compact)")
                        now = d
            except (json.JSONDecodeError, OSError):
                pass
    if now.get("omitted"):
        print(f"note: compact record omits {now['omitted']} fastest queries "
              "(full-precision detail line unavailable); totals cover the "
              "reported subset only")
    with open(args.baseline) as f:
        base = json.load(f)

    common = set(now["queries"]) & set(base["queries"])
    gone = sorted(set(base["queries"]) - set(now["queries"]))

    regressions = []
    failures = []
    rows = []
    for name, t in sorted(now["queries"].items(), key=lambda kv: -kv[1]):
        b = base["queries"].get(name)
        # Bench records a broken query as a negative time; it must read as
        # a FAILURE, never as a fast query (delta vs a negative sentinel
        # can't trip the ratio threshold, so test explicitly).
        if t < 0 or (b is not None and b < 0):
            failures.append(name)
            rows.append((name, t, b, "FAILED (negative time, excluded from totals)"))
            continue
        if b is None:
            rows.append((name, t, None, "NEW (not in baseline, excluded from totals)"))
            continue
        delta = t - b
        flag = ""
        if t > b * args.threshold:
            if delta > args.floor:
                flag = f"REGRESSED >{args.threshold}x"
                regressions.append(name)
            else:
                # ratio tripped on a query where no actual seconds live —
                # say so explicitly instead of leaving the row for a
                # reader to mis-flag
                flag = (f"ratio {t / b:.1f}x but delta "
                        f"{delta * 1000:+.0f}ms < {args.floor}s floor "
                        "(noise, not flagged)")
        rows.append((name, t, b, f"{delta:+.2f}s {flag}".rstrip()))

    w = max(len(r[0]) for r in rows)
    print(f"{'query':{w}}  {'now':>7}  {'base':>7}  delta")
    for name, t, b, note in rows:
        bs = f"{b:7.2f}" if b is not None else "      -"
        print(f"{name:{w}}  {t:7.2f}  {bs}  {note}")

    ok_common = [q for q in common
                 if now["queries"][q] >= 0 and base["queries"][q] >= 0]
    now_common = sum(now["queries"][q] for q in ok_common)
    base_common = sum(base["queries"][q] for q in ok_common)
    print(f"\ncommon-query total ({len(ok_common)} queries): "
          f"{now_common:.2f}s  baseline: {base_common:.2f}s  "
          f"({now_common - base_common:+.2f}s)")
    if "rep_totals" in now:
        reps = now["rep_totals"]
        if reps and min(reps) > 0:
            spread = (max(reps) - min(reps)) / min(reps) * 100
            print(f"rep totals: {', '.join(f'{t:.1f}s' for t in reps)} "
                  f"(spread {spread:.0f}%)")
    if gone:
        print(f"queries in baseline but not in this run: {', '.join(gone)}")
    if failures:
        print(f"\nFAILED QUERIES: {', '.join(failures)}", file=sys.stderr)
    if regressions:
        print(f"\nREGRESSIONS: {', '.join(regressions)}", file=sys.stderr)
    if failures or regressions:
        sys.exit(1)


if __name__ == "__main__":
    main()
