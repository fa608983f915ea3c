"""Mobility environment + closed-loop online controller.

Parity with ``sim_src/env/mob_env.py``:

* :class:`MobileEnv` — period-wise user mobility stepping (``mob_env.py:9-21``);
* :class:`Controller` — the "solve the next schedule while the current one
  runs" online loop that charges the solver's own wall-clock latency in slots
  (``mob_env.py:23-63``) — the reference's motivation for a fast solver and
  our staleness benchmark.
"""

from __future__ import annotations

import math

import numpy as np

from sig_sdp_mmw_tpu.env.env import WirelessEnv
from sig_sdp_mmw_tpu.utils.stats import StatsObject


class MobileEnv(WirelessEnv):
    def step_a_period(self, Z: int, mob_spd_meter_s: float) -> None:
        self.rand_user_mobility(mob_spd_meter_s, self.get_period_time_us(Z))

    def get_n_period(self, Z: int, time_us: float) -> int:
        return math.ceil(time_us / (Z * self.params.slot_time * 1e6))

    def get_period_time_us(self, Z: int) -> float:
        return Z * self.params.slot_time * 1e6

    def step_time(self, time_us: float, mob_spd_meter_s: float,
                  resolution_us: float = 100000.0) -> None:
        self.rand_user_mobility(mob_spd_meter_s, time_us, resolution_us=resolution_us)


class Controller(StatsObject):
    """Online scheduling loop (``mob_env.py:23-63``): evaluates the *current*
    schedule while the solver computes the *next* one; users move for the
    duration of the solve."""

    def __init__(self):
        self.env: MobileEnv = None
        self.alg = None

    def run(self, total_time_s: float, mob_spd_meter_s: float):
        past_time_us = 0.0
        process_time_us = []
        total_pck = 0
        total_packet_loss = 0

        tic = self._get_tic()
        z_vec, Z_fin, remainder = self.alg.run(self.env.generate_S_Q_hmax())
        tim_us = self._get_tim(tic)
        for _ in range(self.env.get_n_period(Z_fin, tim_us)):
            self.env.step_a_period(Z_fin, mob_spd_meter_s)

        while True:
            tic = self._get_tic()
            z_next, Z_next, rem_next = self.alg.run(self.env.generate_S_Q_hmax())
            tim_us = self._get_tim(tic)
            process_time_us.append(tim_us)

            for _ in range(self.env.get_n_period(Z_fin, tim_us)):
                pckl = self.env.evaluate_pckl(z_vec, Z_fin)
                total_packet_loss += int(np.sum(pckl))
                total_pck += self.env.n_sta
                self.env.step_a_period(Z_fin, mob_spd_meter_s)
                past_time_us += self.env.get_period_time_us(Z_fin)

            if total_time_s * 1e6 < past_time_us:
                break

            z_vec, Z_fin, remainder = z_next, Z_next, rem_next

        return total_packet_loss, total_pck, past_time_us, process_time_us
