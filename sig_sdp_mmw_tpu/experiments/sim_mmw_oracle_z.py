"""Matched-Z oracle validation: exact-oracle search, MMW/rand at that Z.

Parity with ``sim_script/journal_version/sim_mmw_scs.py:20-60`` — the
journal's central validation.  For each (cell, seed):

1. the exact SDP oracle (ADMM consensus split, our SCS stand-in) drives the
   binary search to its min feasible Z (logged as ``scs-<cell>-<rho*1e4>``);
2. MMW (nit=150, eta=0.04) solves ONE probe at that same Z and rounds —
   comparing *decisions at matched Z*, the only test that catches a
   systematically optimistic or pessimistic oracle
   (logged as ``mmw150-<cell>-<rho*1e4>``);
3. the random baseline is rounded at that Z (``rand-<cell>-<rho*1e4>``).

Each CSV row holds ``[Z, rem] + per-user BLER`` (the reference logs
``[Z] + bler``; ``rem`` is prepended so the feasibility agreement between
oracle and MMW is recorded explicitly).
"""

from sig_sdp_mmw_tpu.experiments.common import experiment_args, make_log, setup


def main(argv=None):
    p = experiment_args(__doc__, repeat=100, cells=[10])
    p.add_argument("--oracle_nit", type=int, default=500)
    p.add_argument("--mmw_nit", type=int, default=150)
    args = p.parse_args(argv)
    setup(args)
    log, path = make_log(__file__, args.out)

    from sig_sdp_mmw_tpu.env import WirelessEnv
    from sig_sdp_mmw_tpu.models import (
        ADMMSDPSolver, MMW, BinarySearchRelaxation, RandSDPSolver)
    from sig_sdp_mmw_tpu.utils.checkpoint import SweepCheckpoint

    RHO = args.rho
    tag = str(int(RHO * 10000))
    ck = SweepCheckpoint(path)

    for cell in args.cells:
        for seed in range(args.repeat):
            if ck.done(f"cell{cell}", seed):
                continue
            e = WirelessEnv(cell_size=cell, sta_density_per_1m2=RHO,
                            seed=seed)
            st = e.generate_S_Q_hmax()

            bs = BinarySearchRelaxation()
            oracle = ADMMSDPSolver(nit=args.oracle_nit)
            bs.feasibility_check_alg = oracle
            z_vec, Z_orc, rem_orc = bs.run(st)
            bler = e.evaluate_bler(z_vec, Z_orc)
            log.log_mul_scalar(f"scs-{cell}-{tag}", seed,
                               [Z_orc, rem_orc] + bler.tolist())

            mm = MMW(nit=args.mmw_nit, eta=0.04, seed=seed)
            _, gX = mm.run_with_state(0, Z_orc, st)
            z_vec, _, rem_m = mm.rounding(Z_orc, gX, st)
            bler = e.evaluate_bler(z_vec, Z_orc)
            log.log_mul_scalar(f"mmw150-{cell}-{tag}", seed,
                               [Z_orc, rem_m] + bler.tolist())

            rnd = RandSDPSolver(seed=seed)
            _, gX = rnd.run_with_state(0, Z_orc, st)
            z_vec, _, rem_r = rnd.rounding(Z_orc, gX, st)
            bler = e.evaluate_bler(z_vec, Z_orc)
            log.log_mul_scalar(f"rand-{cell}-{tag}", seed,
                               [Z_orc, rem_r] + bler.tolist())
            ck.mark(f"cell{cell}", seed)
    ck.close()
    log.close()
    return path


if __name__ == "__main__":
    main()
