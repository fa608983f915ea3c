"""Bisect the XLA temp memory of the block-native MMW solve at large K.

The K=750k attempt died with RESOURCE_EXHAUSTED and a 12.2 GB XLA temp
against a ~0.76 GB estimated working set (LARGEST_SINGLE_CHIP.json).  XLA's
``memory_analysis()`` needs only an AOT compile, which needs only abstract
shapes — so this tool compiles VARIANTS of the solver against
``jax.ShapeDtypeStruct`` inputs and attributes the temp to program phases:

* ``full``      — the program as shipped (loop + epilogue factorization);
* ``loop``      — ``factorize=False``: the nit-iteration loop only;
* ``epilogue``  — ``nit=0`` + factorization (the averaged-X scatter + rsvd);
* ``lanczos<m>``— loop with a different Krylov depth (isolates the [m,Kp,D]
  basis + reorth buffers);
* ``spmm``      — a single bcsr_spmm + transpose apply (the matvec floor).

Shapes come from a real state build (``--build``), which records every array
leaf's (shape, dtype) into a JSON; subsequent runs lower from that JSON in
seconds without touching the generator.

Usage:
  python tools/mem_bisect.py --build --cell 500 --block 64   # once
  python tools/mem_bisect.py --cell 500                      # bisect
"""

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

print = functools.partial(print, flush=True)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def shapes_path(cell, block):
    return os.path.join(REPO, f"tools/shapes_cell{cell}_b{block}.json")


def _leaf(x):
    if x is None:
        return None
    return [list(x.shape), str(x.dtype)]


def build_shapes(cell, rho, block, dtype_lean=True):
    import jax.numpy as jnp

    from sig_sdp_mmw_tpu.env.large import LargeEnv
    from sig_sdp_mmw_tpu.ops.bcsr import bcsr_operands_from_state

    env = LargeEnv(cell, rho, seed=0)
    S, Q, h = env.generate_state_csr()
    ell = env.generate_ell()
    kw = dict(dtype=jnp.bfloat16, weights_dtype=jnp.bfloat16) \
        if dtype_lean else {}
    ops = bcsr_operands_from_state(S, Q, block=block, store_transpose=False,
                                   **kw)
    import dataclasses

    rec = {"K": ell.K, "lb_cache": ell.lb_cache, "ub_cache": ell.ub_cache,
           "nrows": ops.s_blocks.nrows,
           "lb": int(__import__("numpy").diff(Q.indptr).max()) + 1,
           "ell": {}, "ops": {}}
    for f in dataclasses.fields(ell):
        v = getattr(ell, f.name)
        if hasattr(v, "shape"):
            rec["ell"][f.name] = _leaf(v)
    for name in ("bcols", "blocks"):
        rec["ops"]["s_blocks." + name] = _leaf(getattr(ops.s_blocks, name))
    rec["ops"]["st_blocks"] = None if ops.st_blocks is None else {
        name: _leaf(getattr(ops.st_blocks, name))
        for name in ("bcols", "blocks")}
    for name in ("g_src", "g_dst", "w_edge", "s_pos", "q_bcols", "q_pos",
                 "q_eidx"):
        rec["ops"][name] = _leaf(getattr(ops, name))
    return rec


def abstract_state(rec):
    import jax
    import jax.numpy as jnp

    from sig_sdp_mmw_tpu.core.ell import EllState
    from sig_sdp_mmw_tpu.ops.bcsr import BcsrOperands, BlockEll

    def sds(leaf):
        return jax.ShapeDtypeStruct(tuple(leaf[0]), jnp.dtype(leaf[1]))

    ell = EllState(K=rec["K"], lb_cache=rec["lb_cache"],
                   ub_cache=rec["ub_cache"],
                   **{k: sds(v) for k, v in rec["ell"].items()})
    sb = BlockEll(bcols=sds(rec["ops"]["s_blocks.bcols"]),
                  blocks=sds(rec["ops"]["s_blocks.blocks"]),
                  nrows=rec["nrows"])
    stb = rec["ops"]["st_blocks"]
    if stb is not None:
        stb = BlockEll(bcols=sds(stb["bcols"]), blocks=sds(stb["blocks"]),
                       nrows=rec["nrows"])
    ops = BcsrOperands(
        s_blocks=sb, st_blocks=stb,
        **{k: sds(rec["ops"][k]) for k in
           ("g_src", "g_dst", "w_edge", "s_pos", "q_bcols", "q_pos",
            "q_eidx")})
    return ell, ops


def compile_variant(name, fn, args, rec_out):
    import time

    import jax

    try:
        t0 = time.time()
        compiled = jax.jit(fn).lower(*args).compile()
        dt = time.time() - t0
        mem = compiled.memory_analysis()
        row = {"compile_s": round(dt, 1),
               "temp_gb": round(mem.temp_size_in_bytes / 2**30, 3),
               "arg_gb": round(mem.argument_size_in_bytes / 2**30, 3),
               "out_gb": round(mem.output_size_in_bytes / 2**30, 3)}
    except Exception as exc:  # noqa: BLE001
        row = {"error": f"{type(exc).__name__}: {exc}"[:300]}
    rec_out[name] = row
    print(f"  {name}: {row}")
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--build", action="store_true")
    ap.add_argument("--cell", type=int, default=500)
    ap.add_argument("--rho", type=float, default=75e-4)
    ap.add_argument("--block", type=int, default=64)
    ap.add_argument("--d-pad", type=int, default=None)
    ap.add_argument("--nit", type=int, default=3)
    ap.add_argument("--lanczos-m", type=int, default=8)
    ap.add_argument("--variants", type=str, default="")
    ap.add_argument("--out", type=str, default=None)
    a = ap.parse_args()

    sp = shapes_path(a.cell, a.block)
    if a.build:
        rec = build_shapes(a.cell, a.rho, a.block)
        with open(sp, "w") as f:
            json.dump(rec, f)
        print(f"wrote {sp}")
        return

    import jax

    from sig_sdp_mmw_tpu.models.mmw_ell import mmw_solve_ell
    from sig_sdp_mmw_tpu.ops.bcsr import bcsr_spmm, bcsr_spmm_transpose

    with open(sp) as f:
        rec = json.load(f)
    ell, ops = abstract_state(rec)
    Z = float(rec["lb"] + 4)
    D_pad = a.d_pad or ((int(Z) * 2 + 15) // 16) * 16
    key = jax.ShapeDtypeStruct((2,), jax.numpy.uint32)
    print(f"cell={a.cell} K={rec['K']} Kp={ell.Kp} Z={Z} D_pad={D_pad} "
          f"block rows={rec['nrows']}")

    out = {"config": vars(a), "K": rec["K"], "Z": Z, "D_pad": D_pad,
           "device": str(jax.devices()[0]).split(":")[0], "variants": {}}

    def solver(nit, lanczos_m, factorize, chunk=None):
        def fn(e, k, b):
            return mmw_solve_ell(e, Z, nit=nit, eta=0.05, D_pad=D_pad,
                                 rank_pad=D_pad, key=k, lanczos_m=lanczos_m,
                                 bcsr=b, factorize=factorize,
                                 spmm_row_chunk=chunk)
        return fn

    want = set(a.variants.split(",")) if a.variants else None

    def go(name, *fa):
        if want is None or name in want:
            compile_variant(name, *fa, out["variants"])

    go("full", solver(a.nit, a.lanczos_m, True), (ell, key, ops))
    go("loop", solver(a.nit, a.lanczos_m, False), (ell, key, ops))
    go("epilogue", solver(0, a.lanczos_m, True), (ell, key, ops))
    go("loop_m4", solver(a.nit, 4, False), (ell, key, ops))
    go("loop_m16", solver(a.nit, 16, False), (ell, key, ops))
    for ch in (1024, 2048, 4096):
        go(f"full_c{ch}", solver(a.nit, a.lanczos_m, True, ch),
           (ell, key, ops))
    go(f"loop_c2048", solver(a.nit, a.lanczos_m, False, 2048),
       (ell, key, ops))
    go(f"epilogue_c2048", solver(0, a.lanczos_m, True, 2048),
       (ell, key, ops))

    import jax.numpy as jnp

    def spmm_pair(chunk):
        def fn(e, b):
            V = jnp.zeros((b.s_blocks.nrows, D_pad), jnp.float32)
            t = bcsr_spmm(b.s_blocks, V, row_chunk=chunk)
            t = t + bcsr_spmm_transpose(b.s_blocks.bcols,
                                        b.s_blocks.blocks, V,
                                        row_chunk=chunk)
            return t
        return fn

    go("spmm", spmm_pair(None), (ell, ops))
    go("spmm_c2048", spmm_pair(2048), (ell, ops))

    # Segmented-execution programs (carry in/out, traced bounds) — the
    # million-link segmented path.
    def seg_first(e, k, b, i0):
        return mmw_solve_ell(e, Z, nit=a.nit, eta=0.05, D_pad=D_pad,
                             rank_pad=D_pad, key=k, lanczos_m=a.lanczos_m,
                             bcsr=b, spmm_row_chunk=2048, carry_in=None,
                             it_start=i0, num_steps=10, return_carry=True)

    i_sds = jax.ShapeDtypeStruct((), jax.numpy.int32)
    go("seg_first_c2048", seg_first, (ell, key, ops, i_sds))

    def seg_lean(chunk, m):
        def fn(e, k, b, i0):
            return mmw_solve_ell(e, Z, nit=a.nit, eta=0.05, D_pad=D_pad,
                                 rank_pad=D_pad, key=k, lanczos_m=m,
                                 bcsr=b, spmm_row_chunk=chunk, carry_in=None,
                                 it_start=i0, num_steps=10,
                                 return_carry=True)
        return fn

    go("seg_first_c1024", seg_lean(1024, a.lanczos_m), (ell, key, ops, i_sds))
    go("seg_first_c512_m6", seg_lean(512, 6), (ell, key, ops, i_sds))

    def seg_mid(e, k, b, c, i0):
        return mmw_solve_ell(e, Z, nit=a.nit, eta=0.05, D_pad=D_pad,
                             rank_pad=D_pad, key=k, lanczos_m=a.lanczos_m,
                             bcsr=b, spmm_row_chunk=2048, carry_in=c,
                             it_start=i0, num_steps=10, return_carry=True)

    if want is None or "seg_mid_c2048" in want:
        carry_sds = jax.eval_shape(seg_first, ell, key, ops, i_sds)
        compile_variant("seg_mid_c2048", seg_mid,
                        (ell, key, ops, carry_sds, i_sds), out["variants"])

    op = a.out or os.path.join(REPO, "MEM_BISECT.json")
    with open(op, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {op}")


if __name__ == "__main__":
    main()
