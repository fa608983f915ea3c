"""Solver base class: shared knobs + randomized rounding entry point.

Parity with the reference ``sdp_solver`` base (``sim_src/alg/sdp_solver.py:9-25``):
``nit`` / ``rank_radio`` / ``alpha`` knobs and a ``rounding`` method with up to
``nattempt`` retries.  The attempts themselves are batched on device
(:mod:`sig_sdp_mmw_tpu.models.rounding`) instead of retried serially.
"""

from __future__ import annotations

from typing import Optional

import jax

from sig_sdp_mmw_tpu.core.problem import SigState


class SDPSolverBase:
    def __init__(self, nit: int = 100, rank_radio: int = 2, alpha: float = 1.0):
        self.nit = nit
        self.rank_radio = rank_radio
        self.alpha = alpha  # objective scaling knob; unused (sdp_solver.py:13)
        self._round_key = jax.random.PRNGKey(1234)
        self._round_calls = 0

    def run_with_state(self, bs_iteration: int, Z: int, state: SigState):
        raise NotImplementedError

    def rounding(self, Z: int, gX, state: SigState, nattempt: int = 10):
        from sig_sdp_mmw_tpu.models.rounding import rounding

        self._round_calls += 1
        key = jax.random.fold_in(self._round_key, self._round_calls)
        return rounding(Z, gX, state, key, nattempt=nattempt)
