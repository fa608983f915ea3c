"""Duality-gap telemetry sweep over eta, vs the exact-oracle Z.

Parity with ``sim_script/journal_version/sim_all_mmw.py``: the ADMM oracle
(SCS stand-in) finds Z_fin; MMW runs at that Z with nit = ceil(1/eta^2) and
LOG_GAP on; UB and LB rows are logged under ``mmw-dual-<cell>-<eta*100>``.
"""

import math

import numpy as np

from sig_sdp_mmw_tpu.experiments.common import experiment_args, make_log, setup


def main(argv=None):
    p = experiment_args(__doc__, repeat=20)
    p.add_argument("--etas", type=float, nargs="*",
                   default=[0.02, 0.04, 0.06, 0.08, 0.10])
    args = p.parse_args(argv)
    setup(args)
    if args.smoke:
        args.etas = [0.1]
    log, path = make_log(__file__, args.out)

    from sig_sdp_mmw_tpu.env import WirelessEnv
    from sig_sdp_mmw_tpu.models import ADMMSDPSolver, BinarySearchRelaxation, MMW

    z_cache = {}        # (cell, seed) -> Z_fin: the oracle's answer is
    #                     eta-independent, so hoist it out of the eta loop
    #                     (the reference re-searches per eta; same data).
    for cell in args.cells:
        for eta in args.etas:
            nit = math.ceil(1.0 / eta / eta)
            for seed in range(args.repeat):
                e = WirelessEnv(cell_size=cell, sta_density_per_1m2=args.rho,
                                seed=seed)
                st = e.generate_S_Q_hmax()

                if (cell, seed) not in z_cache:
                    bs = BinarySearchRelaxation()
                    bs.feasibility_check_alg = ADMMSDPSolver(nit=1000)
                    _, z_cache[(cell, seed)], _ = bs.run(st)
                Z_fin = z_cache[(cell, seed)]

                alg = MMW(nit=nit, eta=eta, log_gap=True, seed=seed)
                alg.run_with_state(0, Z_fin, st)
                gap = alg.LOGGED_NP_DATA["gap"]
                ub, lb = gap[:, 3], gap[:, 4]
                name = f"mmw-dual-{cell}-{int(eta * 100)}"
                log.log_mul_scalar(name, seed, ub.tolist())
                log.log_mul_scalar(name, seed, lb.tolist())
    log.close()
    return path


if __name__ == "__main__":
    main()
