"""Cell-15 duality-gap sweep, seed-outer order (wall-clock-resilient).

Same experiment as experiments/sim_all_mmw.py (reference
``sim_script/journal_version/sim_all_mmw.py``) restricted to cell 15, but
with the seed loop OUTSIDE the eta loop: each completed seed contributes its
(UB, LB) rows to EVERY eta series, so an interrupted run still yields the
full eta grid at a uniform seed count.  The oracle min-Z is found once per
seed (eta-independent) and reused, exactly like the experiment script's
z_cache.  Series names and CSV row format are identical, so
tools/merge_gap_c15.py and the plot renderers consume the output unchanged.
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

print = functools.partial(print, flush=True)

CELL = 15
ETAS = [0.02, 0.04, 0.06, 0.08, 0.10]
RHO = 75e-4


def main(out="gap_fullspec_c15_full", nseeds=20):
    from sig_sdp_mmw_tpu.env import WirelessEnv
    from sig_sdp_mmw_tpu.models import (ADMMSDPSolver, BinarySearchRelaxation,
                                        MMW)
    from sig_sdp_mmw_tpu.utils.logging import CsvWriter

    log = CsvWriter(path=out)
    t_start = time.time()
    for seed in range(nseeds):
        t0 = time.time()
        e = WirelessEnv(cell_size=CELL, sta_density_per_1m2=RHO, seed=seed)
        st = e.generate_S_Q_hmax()

        bs = BinarySearchRelaxation()
        bs.feasibility_check_alg = ADMMSDPSolver(nit=1000)
        _, Z_fin, _ = bs.run(st)
        t_oracle = time.time() - t0

        for eta in ETAS:
            nit = math.ceil(1.0 / eta / eta)
            alg = MMW(nit=nit, eta=eta, log_gap=True, seed=seed)
            alg.run_with_state(0, Z_fin, st)
            gap = alg.LOGGED_NP_DATA["gap"]
            ub, lb = gap[:, 3], gap[:, 4]
            name = f"mmw-dual-{CELL}-{int(eta * 100)}"
            log.log_mul_scalar(name, seed, ub.tolist())
            log.log_mul_scalar(name, seed, lb.tolist())
        print(f"seed {seed}: Z={Z_fin} oracle {t_oracle:.0f}s "
              f"total {time.time()-t0:.0f}s elapsed {time.time()-t_start:.0f}s")
    log.close()


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["gap_fullspec_c15_full"]))
