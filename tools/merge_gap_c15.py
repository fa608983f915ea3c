"""Fold the completed cell-15 gap sweep into GAP_FULLSPEC.json.

Usage: python tools/merge_gap_c15.py [--dir gap_fullspec_c15_full]

Reads the `mmw-dual-15-<eta*100>` CSV files written by
experiments/sim_all_mmw.py (rows come in (UB, LB) pairs per seed —
`sim_all_mmw.py:50-51`), computes the same per-series summary statistics as
the existing cells-{5,10} entries (final-iterate UB median/p90, LB median,
median per-seed gap), replaces the `mmw-dual-15-2_partial` stopgap entry,
updates the spec string, and re-renders the duality-gap figures with all
three cells.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def summarize(path):
    rows = []
    with open(path) as f:
        for line in f:
            vals = line.strip().split(",")
            if len(vals) < 3:
                continue
            rows.append(np.asarray([float(v) for v in vals[2:]]))
    # (UB, LB) row pairs per seed, appended in that order.
    n = len(rows) // 2
    ub_fin = np.array([rows[2 * i][-1] for i in range(n)])
    lb_fin = np.array([rows[2 * i + 1][-1] for i in range(n)])
    nit = max(r.size for r in rows)
    return {
        "n_seeds": n,
        "nit": nit,
        "ub_final_median": round(float(np.median(ub_fin)), 4),
        "ub_final_p90": round(float(np.percentile(ub_fin, 90)), 4),
        "lb_final_median": round(float(np.median(lb_fin)), 4),
        "gap_median": round(float(np.median(ub_fin - lb_fin)), 4),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="gap_fullspec_c15_full")
    p.add_argument("--json", default="GAP_FULLSPEC.json")
    args = p.parse_args()

    with open(args.json) as f:
        doc = json.load(f)

    merged = []
    for name in sorted(os.listdir(args.dir)):
        if not name.startswith("mmw-dual-15-"):
            continue
        s = summarize(os.path.join(args.dir, name))
        doc["series"][name] = s
        merged.append((name, s))
    if not merged:
        raise SystemExit(f"no mmw-dual-15-* series found in {args.dir}")
    doc["series"].pop("mmw-dual-15-2_partial", None)
    doc["spec"] = ("cells {5,10,15} x eta {0.02..0.10}, nit=ceil(1/eta^2), "
                   "20 seeds, oracle min-Z")
    with open(args.json, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    for name, s in merged:
        print(name, s)

    # Re-render the gap figures over the union of both sweep dirs.
    from sig_sdp_mmw_tpu.experiments.plot_results import (
        _read_metric_files, plot_gap, plot_gap_heatmap)
    data = _read_metric_files("gap_fullspec_c5c10")
    data.update(_read_metric_files(args.dir))
    plot_gap(data, args.dir)
    plot_gap_heatmap(data, args.dir)
    print("figures ->", args.dir)


if __name__ == "__main__":
    main()
