#!/usr/bin/env python3
"""Compose bench_quiet_ref.json per-key from MULTIPLE clean runs
(r19, VERDICT r18 missing #3).

A single-run quiet ref inherits one evening's box wobble: r18 chose
attempt B (zero suspects AND zero drift) at the documented cost of a
median per-key ratio ~1.08 vs attempt A's faster totals — honest, but
every round-over-round diff then carries that run's ambient offset.
The fix is per-key composition: each key's quiet value is the MINIMUM
of its medians across N calibration-clean, zero-suspect runs taken the
same session. The minimum is the right statistic for a QUIET reference
specifically because ambient load only ever ADDS wall time — the
smallest clean reading is the closest observation of the key's true
quiet wall this box produced (medians-of-3 within each run already
police per-run jitter; the cross-run min polices cross-run ambient
offset, which is exactly what a single snapshot cannot).

Usage:
  python3 tools/compose_quiet_ref.py run1.json run2.json [run3.json ...] \
      [-o bench_quiet_ref.json]

Each runN.json is a bench_detail.json SNAPSHOT (copied aside between
Bench runs — Bench overwrites the live file). Every input must be
load_contaminated:false and suspect_keys:[] at the SAME sf_dir and
calibration_cpus, and declare the same key set; violations abort.

Output: the same two-line (summary + detail) shape Bench writes and
Bench.parseQuietRef parses, with composed per-key queries/spread maps,
recomputed seed/inventory totals, and a `quiet_composition` metadata
field on the detail line recording the method, the input count, each
input's calibration probes, and per-key provenance (which input
supplied each key's minimum) — so a consumer can audit exactly where
every quiet number came from.

NOT part of the engine — dev harness only (driver-side python env).
"""
import sys, json, os

SEED_KEYS = ["q_agg_pricing", "q_join_topk", "q_join_regional",
             "q_join_semi", "q_join_anti", "q_window_topk", "q_agg_rollup",
             "q_agg_distinct", "q_sort_limit", "q_events_tumbling",
             "q_events_sessionize", "q_dedup_near", "q_json_extract",
             "q_cosine_topk"]


def load_run(path):
    with open(path) as f:
        lines = [json.loads(l) for l in f if l.strip()]
    summary = next(l for l in lines if l.get("metric") == "seed_total")
    detail = next(l for l in lines if l.get("metric") == "per_query")
    return summary, detail


def main():
    args = sys.argv[1:]
    out = "bench_quiet_ref.json"
    if "-o" in args:
        i = args.index("-o")
        out = args[i + 1]
        args = args[:i] + args[i + 2:]
    if len(args) < 2:
        sys.exit("need at least 2 clean runs to compose (got %d)" % len(args))

    runs = [load_run(p) for p in args]
    s0, d0 = runs[0]
    for p, (s, d) in zip(args, runs):
        if d["load_contaminated"]:
            sys.exit(f"{p}: load_contaminated — not a quiet run")
        if d["suspect_keys"]:
            sys.exit(f"{p}: suspect_keys nonempty {d['suspect_keys']}")
        if s["sf_dir"] != s0["sf_dir"] or \
           s["calibration_cpus"] != s0["calibration_cpus"]:
            sys.exit(f"{p}: sf_dir/cpus differ from {args[0]}")
        if set(d["queries"]) != set(d0["queries"]):
            sys.exit(f"{p}: key set differs from {args[0]} "
                     f"(±{set(d['queries']) ^ set(d0['queries'])})")
        if d["errors"]:
            sys.exit(f"{p}: errors nonempty {d['errors']}")

    composed, spread, provenance = {}, {}, {}
    for k in sorted(d0["queries"]):
        vals = [(runs[i][1]["queries"][k], i) for i in range(len(runs))]
        v, i = min(vals)
        composed[k] = v
        spread[k] = runs[i][1]["spread"].get(k, 0.0)
        provenance[k] = os.path.basename(args[i])

    meta = {
        "method": "per-key min across calibration-clean zero-suspect runs",
        "runs": [{"file": os.path.basename(p),
                  "calibration_sec": runs[i][1]["calibration_sec"],
                  "loadavg": runs[i][1].get("loadavg"),
                  "all_keys_sec": round(sum(runs[i][1]["queries"].values()), 4)}
                 for i, p in enumerate(args)],
        "provenance": provenance,
    }

    def fmt(m):
        return "{" + ",".join(f'"{k}":{v:.4f}' for k, v in m.items()) + "}"

    seed = {k: composed[k] for k in SEED_KEYS if k in composed}
    seed_total = sum(seed.values())
    all_total = sum(composed.values())

    # summary line: first run's fields, composed values spliced in
    summary = dict(s0)
    summary["value"] = round(seed_total, 4)
    summary["queries"] = seed
    summary["all_keys_sec"] = round(all_total, 4)
    # detail line: queries LAST (Bench's own tail-window field order),
    # quiet_composition before it
    detail = dict(d0)
    detail["spread"] = spread
    detail["quiet_composition"] = meta
    dq = detail.pop("queries", None)
    detail["queries"] = composed

    def dump(obj):
        # float maps formatted at 4dp like Bench's own writer
        parts = []
        for k, v in obj.items():
            if k in ("queries", "spread") and isinstance(v, dict):
                parts.append(f'"{k}":{fmt(v)}')
            else:
                parts.append(f'"{k}":{json.dumps(v)}')
        return "{" + ",".join(parts) + "}"

    with open(out, "w") as f:
        f.write(dump(summary) + "\n" + dump(detail) + "\n")
    print(f"composed {len(composed)} keys from {len(args)} runs -> {out}")
    print(f"  seed_total {seed_total:.4f}  all_keys {all_total:.4f}")
    mins = {}
    for k, src in provenance.items():
        mins[src] = mins.get(src, 0) + 1
    for src, n in sorted(mins.items()):
        print(f"  {n:4d} keys from {src}")


if __name__ == "__main__":
    main()
