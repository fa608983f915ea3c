"""Probe the batched-rounding capability boundary (VERDICT r3 weak #5).

``rounding_ell`` batches all nattempt attempts into one vmapped device
program below ``_BATCH_ATTEMPT_MAX_KP`` rows.  The r3 cap (16384) was
calibrated to a "tunneled TPU runtime worker crash" that had never been
isolated.  This tool reproduces the boundary with DATA: for increasing Kp
it runs the batched rounding in a SUBPROCESS (so a runtime crash cannot
take the probing session down) and records wall time and outcome; a
separate Z_pad axis separates execution-time-driven failures from
buffer-size-driven ones.

Writes BATCH_ROUNDING_PROBE.json.  Interpretation feeds the
``SIG_SDP_BATCH_ROUNDING_MAX_KP`` environment override in
models/rounding_ell.py.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, time
import jax
import numpy as np
sys.path.insert(0, {repo!r})
from sig_sdp_mmw_tpu.env.large import generate_large_state_csr
from sig_sdp_mmw_tpu.core.ell import ell_from_scipy
from sig_sdp_mmw_tpu.models.mmw_ell import mmw_solve_ell
from sig_sdp_mmw_tpu.models.rounding_ell import _rounding_batch_ell
from sig_sdp_mmw_tpu.ops.bcsr import bcsr_operands_from_state

cell, Z_pad, natt = {cell}, {z_pad}, {natt}
S, Q, h = generate_large_state_csr(cell, 75e-4, seed=0)
ell = jax.device_put(ell_from_scipy(S, Q, h))
lb = int(np.diff(Q.indptr).max()) + 1
Z = lb + 4
ops = bcsr_operands_from_state(S, Q, block=128)
out = jax.jit(lambda e, k, b: mmw_solve_ell(
    e, float(Z), nit=10, eta=0.05, D_pad=48, rank_pad=48, key=k,
    bcsr=b))(ell, jax.random.PRNGKey(0), jax.device_put(ops))
t0 = time.time()
z, rem = _rounding_batch_ell(ell, out.X_half, Z, jax.random.PRNGKey(1),
                             Z_pad=Z_pad, nattempt=natt)
rem = int(rem)
print("RESULT ok rem=%d wall=%.1f" % (rem, time.time()-t0), flush=True)
"""


def probe(cell, z_pad, natt, timeout_s=560):
    code = CHILD.format(repo=REPO, cell=cell, z_pad=z_pad, natt=natt)
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=timeout_s)
        wall = round(time.time() - t0, 1)
        tail = (r.stdout + r.stderr).strip().splitlines()[-3:]
        ok = "RESULT ok" in r.stdout
        return {"cell": cell, "z_pad": z_pad, "nattempt": natt,
                "outcome": "ok" if ok else "crash", "rc": r.returncode,
                "wall_s": wall, "tail": tail if not ok else tail[-1:]}
    except subprocess.TimeoutExpired:
        return {"cell": cell, "z_pad": z_pad, "nattempt": natt,
                "outcome": "timeout", "wall_s": round(time.time() - t0, 1)}


def main():
    rows = []
    # K = 3*cell^2: 48->6912, 74->16428, 105->33075, 148->65712
    for cell in (48, 74, 105, 148):
        row = probe(cell, z_pad=32, natt=10)
        print(json.dumps(row), flush=True)
        rows.append(row)
        if row["outcome"] != "ok":
            # Separate time-driven from byte-driven: same Kp, tiny attempts.
            row2 = probe(cell, z_pad=32, natt=2)
            print(json.dumps(row2), flush=True)
            rows.append(row2)
            break
    out = os.path.join(REPO, "BATCH_ROUNDING_PROBE.json")
    with open(out, "w") as f:
        json.dump({"rows": rows}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
