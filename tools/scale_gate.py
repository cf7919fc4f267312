#!/usr/bin/env python3
"""The 2x-linear scale gate, as a committed command instead of a
hand-curated BASELINE.md section (VERDICT r13 ask #6).

Compares two graft Bench artifacts (the full-precision JSON lines that
graft.Bench writes via SPARK_GRAFT_OUT / BENCH_FULL_<sf>.json) taken at
two scale factors, and FAILS (exit 1) on any query whose wall grew more
than LIMIT x linear in the row ratio:

    t_scaled > LIMIT * rows_ratio * max(t_base, FLOOR)

The FLOOR (default 0.2 s) keeps fixed per-query overhead (session/job
setup, parquet footer reads) from tripping the gate on sub-100 ms
queries where a 20x "ratio" is pure constant cost, not a scaling
defect; every genuinely scale-bound query is far above it.

Usage:
    python3 tools/scale_gate.py BASE.json SCALED.json ROWS_RATIO \
        [--limit 2.0] [--floor 0.2] [--allow q1,q2]

    # the round ritual (10x and 100x rungs):
    python3 tools/scale_gate.py data/BENCH_sf01_rN.json data/BENCH_sf1_rN.json 10
    python3 tools/scale_gate.py data/BENCH_sf01_rN.json data/BENCH_sf10_rN.json 100

Queries present in only one artifact are reported (a silent exclusion
reads as "covered" when it isn't) but do not fail the gate; --allow
names documented exceptions, which are reported as such.

OUTPUT-BOUND queries (built-in, permanent): operators whose OUTPUT row
count grows faster than linearly in the input are graded against a bar
linear in their output instead — t_scaled > LIMIT * rows_ratio**exp *
max(t_base, FLOOR), where exp is the documented output-growth exponent.
Encoding the semantics here (instead of relying on margin under the
input-linear bar) keeps the gate deterministic across noisy draws
(VERDICT r14 ask #5: b6 sat at 196.4x vs the 200x input-linear bar —
one noisy draw from a false red despite a correct plan).
"""
import json
import sys

# query -> (output growth exponent in the row ratio, evidence). These are
# SEMANTIC exceptions, not tuning escapes: the committed r14 ladder shows
# the per-OUTPUT-row throughput IMPROVING with scale for each entry.
OUTPUT_BOUND = {
    # b6 joins events to banded value ranges: output rows grow ~ratio^2
    # (742M rows at sf10 vs ~74k at sf0.1 = 100x per 10x input). The plan
    # is the banded hash join (PlanSpec pins no BNLJ/Cartesian) and
    # per-output-row throughput improved 128x from sf0.1 to sf10 in the
    # r14 ladder; b8_range_agg_cdf is the shipped input-linear AGGREGATE
    # path (1.5x at 100x) for callers who don't need the pair set.
    "b6_join_range_theta": (2.0, "output rows ~ratio^2; rows/s improves 128x at 100x (r14 ladder)"),
}


def load(path):
    with open(path) as f:
        d = json.load(f)
    qs = {k: v for k, v in d.get("queries", {}).items() if v >= 0}
    errs = d.get("errors", [])
    return qs, errs


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=")[0].lstrip("-"): a.split("=", 1)[1]
            for a in sys.argv[1:] if a.startswith("--") and "=" in a}
    if len(args) != 3:
        print(__doc__)
        return 2
    base_path, scaled_path, rows_ratio = args[0], args[1], float(args[2])
    limit = float(opts.get("limit", "2.0"))
    floor = float(opts.get("floor", "0.2"))
    allow = set(filter(None, opts.get("allow", "").split(",")))

    base, base_errs = load(base_path)
    scaled, scaled_errs = load(scaled_path)

    violations, allowed, missing, output_bound = [], [], [], []
    for q in sorted(base):
        if q not in scaled:
            missing.append(q)
            continue
        exp = OUTPUT_BOUND.get(q, (1.0, None))[0]
        bar = limit * (rows_ratio ** exp) * max(base[q], floor)
        if q in OUTPUT_BOUND:
            ratio = scaled[q] / max(base[q], 1e-9)
            output_bound.append((q, base[q], scaled[q], ratio, bar,
                                 scaled[q] > bar))
        if scaled[q] > bar:
            ratio = scaled[q] / max(base[q], 1e-9)
            row = (q, base[q], scaled[q], ratio, bar)
            (allowed if q in allow else violations).append(row)

    only_scaled = sorted(set(scaled) - set(base))
    if base_errs or scaled_errs:
        print(f"note: errored queries — base {base_errs}, scaled {scaled_errs}")
    if missing:
        print(f"note: {len(missing)} queries missing from the scaled draw "
              f"(NOT covered by this gate): {', '.join(missing)}")
    if only_scaled:
        print(f"note: {len(only_scaled)} queries only in the scaled draw: "
              f"{', '.join(only_scaled)}")

    for q, b, s, r, bar, over in output_bound:
        print(f"OUTPUT-BOUND {q}: {b:.3f}s -> {s:.3f}s ({r:.1f}x vs "
              f"output-linear bar {bar:.2f}s{' — OVER' if over else ''}) "
              f"— {OUTPUT_BOUND[q][1]}")
    for q, b, s, r, bar in allowed:
        print(f"ALLOW {q}: {b:.3f}s -> {s:.3f}s ({r:.1f}x, bar {bar:.2f}s) "
              f"— documented exception")
    for q, b, s, r, bar in violations:
        print(f"FAIL  {q}: {b:.3f}s -> {s:.3f}s ({r:.1f}x vs {rows_ratio:.0f}x "
              f"rows, bar {bar:.2f}s)")

    n_checked = len([q for q in base if q in scaled])
    print(f"== scale gate {rows_ratio:.0f}x rows, limit {limit}x-linear: "
          f"{n_checked} checked, {len(violations)} over, "
          f"{len(allowed)} allowed, {len(missing)} missing ==")
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
