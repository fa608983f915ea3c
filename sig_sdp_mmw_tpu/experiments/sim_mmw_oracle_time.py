"""End-to-end solve time: MMW vs the exact oracle vs MMW without bounds.

Parity with ``sim_script/journal_version/sim_mmw_scs_iter_time.py`` (the
paper's headline wall-clock figure): for growing K, time binary-search
pipelines driven by (a) MMW-150, (b) the exact oracle (ADMM here, SCS in the
reference), (c) MMW with force_full_bound (no degree bounds).  Logs
``<name>-time-<cell>-<rho*1e4>`` rows [K, Z, wall_us].
"""

import numpy as np

from sig_sdp_mmw_tpu.experiments.common import experiment_args, make_log, setup


def main(argv=None):
    args = experiment_args(__doc__, repeat=3,
                           cells=list(range(5, 16, 2))).parse_args(argv)
    setup(args)
    log, path = make_log(__file__, args.out)

    from sig_sdp_mmw_tpu.env import WirelessEnv
    from sig_sdp_mmw_tpu.models import (ADMMSDPSolver, BinarySearchRelaxation,
                                        MMW)

    tag = str(int(args.rho * 10000))
    for cell in args.cells:
        for seed in range(args.repeat):
            e = WirelessEnv(cell_size=cell, sta_density_per_1m2=args.rho,
                            seed=seed)
            st = e.generate_S_Q_hmax()

            def timed_run(name, make_alg, force_full=False):
                bs = BinarySearchRelaxation()
                bs.force_full_bound = force_full
                alg = make_alg()
                bs.feasibility_check_alg = alg
                tic = bs._get_tic()
                z_vec, Z_fin, rem = bs.run(st)
                tim = bs._get_tim(tic)
                log.log_mul_scalar(f"{name}-time-{cell}-{tag}", seed,
                                   [st.K, Z_fin, tim])
                return Z_fin

            timed_run("mmw150", lambda: MMW(nit=150, eta=0.04, seed=seed))
            timed_run("oracle", lambda: ADMMSDPSolver(nit=500))
            timed_run("mmw150nb", lambda: MMW(nit=150, eta=0.04, seed=seed),
                      force_full=True)
    log.close()
    return path


if __name__ == "__main__":
    main()
