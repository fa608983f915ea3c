"""BLER comparison: MMW vs rand/LP/heuristics at the MMW-found Z.

Parity with ``sim_script/journal_version/sim_all_bler.py``: for each
(cell_size, seed), binary-search+MMW finds Z_fin, every method is rounded at
that same Z, and the full per-user BLER vector is logged per method under the
reference's metric names (``mmw-<cell>-<rho*1e4>`` etc., values = [Z] + bler).
"""

import numpy as np

from sig_sdp_mmw_tpu.experiments.common import experiment_args, make_log, setup


def main(argv=None):
    args = experiment_args(__doc__, repeat=100).parse_args(argv)
    setup(args)
    log, path = make_log(__file__, args.out)

    from sig_sdp_mmw_tpu.env import WirelessEnv
    from sig_sdp_mmw_tpu.models import (
        MAX_ASSO, MAX_GAIN, MMW, BinarySearchRelaxation, LRPSolver,
        RandSDPSolver)

    from sig_sdp_mmw_tpu.utils.checkpoint import SweepCheckpoint

    RHO = args.rho
    tag = str(int(RHO * 10000))
    ck = SweepCheckpoint(path)

    for cell in args.cells:
        for seed in range(args.repeat):
            if ck.done(f"cell{cell}", seed):
                continue
            e = WirelessEnv(cell_size=cell, sta_density_per_1m2=RHO, seed=seed)
            st = e.generate_S_Q_hmax()

            bs = BinarySearchRelaxation()
            alg = MMW(nit=150, eta=0.04, seed=seed)
            bs.feasibility_check_alg = alg
            z_vec, Z_fin, rem = bs.run(st)
            bler = e.evaluate_bler(z_vec, Z_fin)
            log.log_mul_scalar(f"mmw-{cell}-{tag}", seed,
                               [Z_fin] + bler.tolist())

            rnd = RandSDPSolver(seed=seed)
            _, gX = rnd.run_with_state(0, Z_fin, st)
            z_vec, _, _ = rnd.rounding(Z_fin, gX, st)
            bler = e.evaluate_bler(z_vec, Z_fin)
            log.log_mul_scalar(f"rand-{cell}-{tag}", seed,
                               [Z_fin] + bler.tolist())

            lrp = LRPSolver(nit=100, seed=seed)
            _, P = lrp.run_with_state(0, Z_fin, st)
            z_vec, _, _ = lrp.rounding(Z_fin, P, st)
            bler = e.evaluate_bler(z_vec, Z_fin)
            log.log_mul_scalar(f"ladmm-{cell}-{tag}", seed,
                               [Z_fin] + bler.tolist())

            z_vec, _, _ = MAX_GAIN.run(Z_fin, st)
            bler = e.evaluate_bler(z_vec, Z_fin)
            log.log_mul_scalar(f"mgain-{cell}-{tag}", seed,
                               [Z_fin] + bler.tolist())

            z_vec, _, _ = MAX_ASSO.run(Z_fin, st)
            bler = e.evaluate_bler(z_vec, Z_fin)
            log.log_mul_scalar(f"masso-{cell}-{tag}", seed,
                               [Z_fin] + bler.tolist())
            ck.mark(f"cell{cell}", seed)
    ck.close()
    log.close()
    return path


if __name__ == "__main__":
    main()
