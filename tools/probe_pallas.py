"""Probe whether this image's TPU runtime can execute Pallas kernels yet.

SPMM_BENCH r3 finding: the tunneled axon runtime wedges on ANY
``pallas_call`` execution (a trivial add-one kernel hangs identically), so
``bcsr_spmm_pallas`` — compiled, lowered and interpret-exact — has never run
on hardware.  VERDICT r3 asks for a retry every round.  This tool probes in
a SUBPROCESS with a hard timeout (a wedged runtime cannot take the session
down) and, if the trivial kernel passes, times the real block-sparse kernel
vs the XLA path.

Writes PALLAS_PROBE.json.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TRIVIAL = r"""
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
def k(x_ref, o_ref):
    o_ref[...] = x_ref[...] + 1.0
x = jnp.zeros((128, 128), jnp.float32)
y = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((128, 128),
                                                     jnp.float32))(x)
print("TRIVIAL_OK", float(y.sum()), flush=True)
"""

SPMM = r"""
import sys, time
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp
import numpy as np
import scipy.sparse
from sig_sdp_mmw_tpu.ops.bcsr import (bcsr_from_csr, bcsr_spmm,
                                      bcsr_spmm_pallas)
M = scipy.sparse.random(8192, 8192, density=0.02, random_state=0,
                        format="csr")
bell = jax.device_put(bcsr_from_csr(M, block=(128, 128)))
V = jax.device_put(jnp.ones((bell.nrows, 128), jnp.float32))
want = float(jnp.sum(bcsr_spmm(bell, V)))
f = jax.jit(lambda b, v: jnp.sum(bcsr_spmm_pallas(b, v)))
got = float(f(bell, V))
assert abs(got - want) < 1e-3 * abs(want), (got, want)
ts = []
for _ in range(5):
    t0 = time.perf_counter(); float(f(bell, V))
    ts.append(time.perf_counter() - t0)
t0 = time.perf_counter()
for _ in range(5):
    float(jax.jit(lambda b, v: jnp.sum(bcsr_spmm(b, v)))(bell, V))
print("SPMM_OK pallas_ms=%.2f" % (1e3 * sorted(ts)[2]), flush=True)
"""


def run_child(code, timeout_s=120):
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=timeout_s)
        return {"rc": r.returncode, "wall_s": round(time.time() - t0, 1),
                "out": r.stdout.strip().splitlines()[-2:],
                "err": r.stderr.strip().splitlines()[-3:] if r.returncode
                else []}
    except subprocess.TimeoutExpired:
        return {"rc": None, "outcome": "timeout (runtime wedged)",
                "wall_s": round(time.time() - t0, 1)}


def main():
    rec = {"trivial": run_child(TRIVIAL)}
    trivial_ok = any("TRIVIAL_OK" in line
                     for line in rec["trivial"].get("out", []))
    rec["trivial"]["ok"] = trivial_ok
    if trivial_ok:
        rec["spmm"] = run_child(SPMM.format(repo=REPO), timeout_s=300)
        rec["spmm"]["ok"] = any("SPMM_OK" in line
                                for line in rec["spmm"].get("out", []))
    else:
        rec["conclusion"] = ("runtime still cannot execute pallas_call; "
                             "XLA fused block path remains the default")
    out = os.path.join(REPO, "PALLAS_PROBE.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
