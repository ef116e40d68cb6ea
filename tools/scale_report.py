"""Build the BENCH_SF1 scaling artifact from two bench_scale runs.

ratio = t(sf_hi) / t(sf_lo) for a 10x data step. Reading the ratios:

- ratio ≈ 1-3: fixed overhead dominates at the small SF (most of the
  registry at these absolute sizes) — scales better than linear.
- ratio ≈ 10: linear in data — the target shape for scans/aggs/joins.
- ratio >> 10: super-linear; either contract-quadratic semantics
  (all-pairs operators) or a scaling bug. Each one must be diagnosed
  in SCALE.md.

Usage: python tools/scale_report.py <lo.json> <hi.json> <out.json> <step>
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    lo = json.load(open(sys.argv[1]))
    hi = json.load(open(sys.argv[2]))
    out_path = sys.argv[3]
    step = float(sys.argv[4]) if len(sys.argv) > 4 else 10.0

    rlo, rhi = lo.get("rows_out", {}), hi.get("rows_out", {})
    rows = {}
    for name in sorted(set(lo["queries"]) | set(hi["queries"])):
        tl, th = lo["queries"].get(name), hi["queries"].get(name)
        rec = {"sf_lo_sec": tl, "sf_hi_sec": th, "ratio": None}
        if isinstance(tl, (int, float)) and isinstance(th, (int, float)) and tl > 0:
            rec["ratio"] = round(th / tl, 2)
        # output-normalized ratio (VERDICT r9 #8): for output-bound
        # operators whose result volume grows with the corpus BY
        # CONTRACT, sec-per-output-row is the honest scaling signal —
        # ratio_per_row ≈ 1 means each emitted row costs the same at
        # both SFs even when raw wall grows with the output.
        nl, nh = rlo.get(name), rhi.get(name)
        rec["rows_lo"], rec["rows_hi"] = nl, nh
        if (
            rec["ratio"] is not None
            and isinstance(nl, int) and isinstance(nh, int)
            and nl > 0 and nh > 0
        ):
            rec["rows_ratio"] = round(nh / nl, 2)
            rec["ratio_per_row"] = round((th / nh) / (tl / nl), 2)
        rows[name] = rec

    ratios = [r["ratio"] for r in rows.values() if r["ratio"] is not None]
    ratios.sort()
    summary = {
        "metric": "per_query_scaling_ratio",
        "data_step": step,
        "n_queries": len(rows),
        "n_measured": len(ratios),
        "ratio_median": ratios[len(ratios) // 2] if ratios else None,
        "ratio_p90": ratios[int(len(ratios) * 0.9)] if ratios else None,
        "ratio_max": ratios[-1] if ratios else None,
        "superlinear": sorted(
            (n for n, r in rows.items()
             if r["ratio"] is not None and r["ratio"] > step * 1.2),
            key=lambda n: -rows[n]["ratio"],
        ),
        "unmeasured": sorted(
            n for n, r in rows.items() if r["ratio"] is None
        ),
        "lo": {"sf_dir": lo["sf_dir"], "total_sec": round(sum(
            t for t in lo["queries"].values() if isinstance(t, (int, float))), 1)},
        "hi": {"sf_dir": hi["sf_dir"], "total_sec": round(sum(
            t for t in hi["queries"].values() if isinstance(t, (int, float))), 1)},
        "queries": rows,
    }
    with open(out_path, "w") as fh:
        json.dump(summary, fh, indent=1, sort_keys=True)
    print(json.dumps({k: summary[k] for k in (
        "n_measured", "ratio_median", "ratio_p90", "ratio_max", "superlinear",
        "unmeasured")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
