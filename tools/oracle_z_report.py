"""Summarize the matched-Z oracle experiment (sim_mmw_oracle_z) into
ORACLE_Z.md: decision-level agreement between the exact oracle and MMW at
the oracle's own Z (the reference's sim_mmw_scs.py validation)."""

import csv
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(path, name):
    rows = []
    with open(os.path.join(path, name)) as f:
        for r in csv.reader(f):
            vals = [float(x) for x in r]
            # [g_iteration, seed, Z, rem, bler...]
            rows.append((int(vals[1]), int(vals[2]), int(vals[3]),
                         np.asarray(vals[4:])))
    return {seed: (Z, rem, bler) for seed, Z, rem, bler in rows}


def main(run_dir, cell=10, tag="75"):
    scs = load(run_dir, f"scs-{cell}-{tag}")
    mmw = load(run_dir, f"mmw150-{cell}-{tag}")
    rnd = load(run_dir, f"rand-{cell}-{tag}")
    seeds = sorted(set(scs) & set(mmw) & set(rnd))
    n = len(seeds)

    Z = np.asarray([scs[s][0] for s in seeds])
    rem_o = np.asarray([scs[s][1] for s in seeds])
    rem_m = np.asarray([mmw[s][1] for s in seeds])
    rem_r = np.asarray([rnd[s][1] for s in seeds])

    def bstats(d):
        bm = np.asarray([d[s][2].mean() for s in seeds])
        bx = np.asarray([d[s][2].max() for s in seeds])
        return bm, bx

    bm_o, bx_o = bstats(scs)
    bm_m, bx_m = bstats(mmw)
    bm_r, bx_r = bstats(rnd)

    agree = int(np.sum((rem_o == 0) & (rem_m == 0)))
    lines = [
        "# ORACLE_Z — matched-Z oracle validation "
        "(`experiments/sim_mmw_oracle_z.py`)",
        "",
        f"Protocol of the reference journal's `sim_mmw_scs.py:20-60`: per "
        f"seed (cell={cell}, K={3*cell*cell}, rho=0.0075, {n} seeds), the "
        "exact SDP oracle (ADMM consensus, nit=500) drives the binary "
        "search to its min feasible Z; MMW (nit=150, eta=0.04) and the "
        "random baseline are then rounded AT THAT SAME Z.  This compares "
        "*decisions at matched Z* — the test that catches a systematically "
        "optimistic or pessimistic oracle.",
        "",
        f"- Oracle Z: mean {Z.mean():.2f} ± {Z.std():.2f} "
        f"(min {Z.min()}, max {Z.max()})",
        f"- Oracle feasible (rem=0): {np.mean(rem_o == 0)*100:.0f}%",
        f"- **MMW feasible at the oracle's Z: "
        f"{np.mean(rem_m == 0)*100:.0f}%** "
        f"({agree}/{n} seeds agree oracle-feasible AND MMW-feasible)",
        f"- rand feasible at the oracle's Z: {np.mean(rem_r == 0)*100:.0f}% "
        "(control: the Z is information-bearing, not trivially roundable)",
        "",
        "| method | mean BLER (avg over seeds) | median max-BLER |",
        "|---|---|---|",
        f"| oracle (ADMM) | {bm_o.mean():.2e} | {np.median(bx_o):.2e} |",
        f"| MMW-150       | {bm_m.mean():.2e} | {np.median(bx_m):.2e} |",
        f"| rand          | {bm_r.mean():.2e} | {np.median(bx_r):.2e} |",
        "",
        "Interpretation gates: MMW feasibility at the oracle Z near 100% "
        "and BLER within the oracle's range = the fast solver matches the "
        "exact solver's decisions; rand far worse = the comparison has "
        "teeth.  The decision-level cross-check on the fixture window "
        "(every oracle-infeasible Z carries an MMW certificate or rounding "
        "failure) is tests/test_baseline_solvers.py::"
        "test_admm_oracle_decisions_cross_checked.",
        "",
        f"Raw rows: `{os.path.relpath(run_dir, REPO)}/` "
        "(CSV: [g_it, seed, Z, rem, per-user BLER...]).",
    ]
    out = os.path.join(REPO, "ORACLE_Z.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.path.join(REPO, "oracle_z_run"))
