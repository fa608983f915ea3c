"""Multi-device tests on the 8-device virtual CPU mesh: batched scenario
solving, graph-axis sharding, speculative parallel-Z search."""

import pathlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sig_sdp_mmw_tpu.core.ell import ell_from_sig_state
from sig_sdp_mmw_tpu.core.problem import state_from_arrays
from sig_sdp_mmw_tpu.env.env import WirelessEnv
from sig_sdp_mmw_tpu.models.mmw import mmw_solve
from sig_sdp_mmw_tpu.models.mmw_ell import mmw_solve_ell
from sig_sdp_mmw_tpu.parallel import (ParallelProbeSearch, make_mesh,
                                      solve_scenarios_batched, stack_states)


@pytest.fixture(scope="module")
def fix():
    return dict(np.load(pathlib.Path(__file__).parent / "fixtures" / "mmw_small.npz"))


@pytest.fixture(scope="module")
def ref_state(fix):
    return state_from_arrays(fix["S"], fix["Q"], fix["h_max"], dtype=jnp.float32)


def test_mesh_construction():
    mesh = make_mesh(8)
    assert mesh.shape["batch"] * mesh.shape["graph"] == 8


def test_batched_solve_matches_single(ref_state):
    B = 4
    states = stack_states([ref_state] * B)
    key = jax.random.PRNGKey(0)
    mesh = make_mesh(8)
    out = solve_scenarios_batched(states, 8.0, nit=10, eta=0.05, D_pad=32,
                                  rank_pad=32, key=key, mesh=mesh)
    assert out.X_half.shape[0] == B

    keys = jax.random.split(key, B)
    single = jax.jit(lambda s, k: mmw_solve(s, 8.0, nit=10, eta=0.05,
                                            D_pad=32, rank_pad=32, key=k))
    for b in range(B):
        want = single(ref_state, keys[b])
        np.testing.assert_allclose(np.asarray(out.ub_final[b]),
                                   np.asarray(want.ub_final), atol=1e-4)


def test_graph_sharded_dense_solve(ref_state):
    """Row-sharding the state across the graph axis must not change the
    answer (GSPMD inserts the collectives)."""
    mesh = make_mesh(8, batch_size=1)
    shard = NamedSharding(mesh, P("graph", None))
    sharded = state_from_arrays(
        np.asarray(ref_state.S)[: ref_state.K, : ref_state.K],
        np.asarray(ref_state.Q)[: ref_state.K, : ref_state.K],
        np.asarray(ref_state.h_max)[: ref_state.K], pad_to=80)
    sharded = jax.tree.map(
        lambda x: jax.device_put(x, shard) if getattr(x, "ndim", 0) == 2
        else (jax.device_put(x, NamedSharding(mesh, P("graph")))
              if getattr(x, "ndim", 0) == 1 else x),
        sharded)
    key = jax.random.PRNGKey(5)
    fn = jax.jit(lambda s, k: mmw_solve(s, 8.0, nit=8, eta=0.05, D_pad=32,
                                        rank_pad=32, key=k))
    out_sharded = fn(sharded, key)
    out_plain = fn(ref_state, key)
    np.testing.assert_allclose(np.asarray(out_sharded.ub_final),
                               np.asarray(out_plain.ub_final), atol=1e-4)


def test_graph_sharded_ell_solve(ref_state):
    mesh = make_mesh(8, batch_size=1)
    ell = ell_from_sig_state(ref_state)
    row2 = NamedSharding(mesh, P("graph", None))
    row1 = NamedSharding(mesh, P("graph"))
    rep = NamedSharding(mesh, P())
    ell_sh = type(ell)(
        s_cols=jax.device_put(ell.s_cols, row2),
        s_vals=jax.device_put(ell.s_vals, row2),
        st_cols=jax.device_put(ell.st_cols, row2),
        st_vals=jax.device_put(ell.st_vals, row2),
        s_xw=jax.device_put(ell.s_xw, row2),
        st_xw=jax.device_put(ell.st_xw, row2),
        a_i=jax.device_put(ell.a_i, rep),
        a_j=jax.device_put(ell.a_j, rep),
        a_mask=jax.device_put(ell.a_mask, rep),
        q_cols=jax.device_put(ell.q_cols, row2),
        q_eidx=jax.device_put(ell.q_eidx, row2),
        q_mask=jax.device_put(ell.q_mask, row2),
        q_gain=jax.device_put(ell.q_gain, row2),
        diag_S=jax.device_put(ell.diag_S, row1),
        h_max=jax.device_put(ell.h_max, row1),
        mask=jax.device_put(ell.mask, row1),
        K=ell.K)
    key = jax.random.PRNGKey(7)
    fn = jax.jit(lambda e, k: mmw_solve_ell(e, 8.0, nit=8, eta=0.05, D_pad=32,
                                            rank_pad=32, key=k))
    a = fn(ell_sh, key)
    b = fn(ell, key)
    np.testing.assert_allclose(np.asarray(a.ub_final), np.asarray(b.ub_final),
                               atol=1e-4)


def test_graph_sharded_bcsr_solve(ref_state, fix):
    """The block-native (BCSR) solver path — the one that carries the 100k+
    workload — must give the same answer when its block arrays are sharded
    across the graph axis (GSPMD inserts collectives for the block gathers
    and the .at[].add edge accumulators)."""
    import scipy.sparse

    from sig_sdp_mmw_tpu.ops.bcsr import bcsr_operands_from_state

    mesh = make_mesh(8, batch_size=4)        # graph axis = 2
    K = ref_state.K
    S = scipy.sparse.csr_matrix(np.asarray(fix["S"], np.float64))
    Q = scipy.sparse.csr_matrix(np.asarray(fix["Q"], np.float64))
    ops = bcsr_operands_from_state(S, Q, block=(8, 8))
    Kbr = ops.s_blocks.Kb
    assert Kbr % 2 == 0, Kbr

    def shard_rows(x):
        # [Kbr, ...] arrays row-sharded, everything else replicated.
        if getattr(x, "ndim", 0) >= 2 and x.shape[0] == Kbr:
            return jax.device_put(
                x, NamedSharding(mesh, P("graph", *([None] * (x.ndim - 1)))))
        return jax.device_put(x, NamedSharding(mesh, P()))

    ops_sh = jax.tree.map(shard_rows, ops)

    # EllState padded to the BCSR row count so the two layouts line up.
    ell = ell_from_sig_state(ref_state)
    key = jax.random.PRNGKey(11)
    fn = jax.jit(lambda e, k, b: mmw_solve_ell(e, 8.0, nit=8, eta=0.05,
                                               D_pad=32, rank_pad=32, key=k,
                                               bcsr=b))
    a = fn(ell, key, ops_sh)
    b = fn(ell, key, ops)
    np.testing.assert_allclose(np.asarray(a.ub_final), np.asarray(b.ub_final),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.X_half), np.asarray(b.X_half),
                               atol=2e-4)


def test_parallel_probe_search(ref_state, fix):
    pp = ParallelProbeSearch(nit=80, eta=0.05, seed=0, max_probes=12)
    z_vec, Z, rem = pp.run(ref_state)
    assert rem == 0
    from sig_sdp_mmw_tpu.models.rounding import verify_assignment

    ok, ni, na = verify_assignment(ref_state, z_vec)
    assert ok
    assert abs(Z - int(fix["Z_fin"])) <= 1


def test_parallel_probe_search_ell(ref_state, fix):
    """Sparse speculative multi-section search: same answer as the
    sequential binary search on the ELL/BCSR backend, via waves of vmapped
    candidate-Z solves."""
    import scipy.sparse

    from sig_sdp_mmw_tpu.core.problem import state_to_scipy
    from sig_sdp_mmw_tpu.models.rounding_ell import verify_assignment_ell
    from sig_sdp_mmw_tpu.parallel import ParallelProbeSearchEll

    ell = ell_from_sig_state(ref_state)
    S, Q, h = state_to_scipy(ref_state)
    pp = ParallelProbeSearchEll(nit=80, eta=0.05, seed=0, wave=4,
                                use_bcsr=True).prepare(ell, S, Q, block=16)
    z_vec, Z, rem = pp.run(ell)
    assert rem == 0
    ok, ni, na = verify_assignment_ell(
        ell, jnp.asarray(np.pad(z_vec, (0, ell.Kp - ell.K))))
    assert ok, (ni, na)
    assert abs(Z - int(fix["Z_fin"])) <= 1

    # Non-BCSR backend too.
    pp2 = ParallelProbeSearchEll(nit=80, eta=0.05, seed=0, wave=3)
    z2, Z2, rem2 = pp2.run(ell)
    assert rem2 == 0 and abs(Z2 - int(fix["Z_fin"])) <= 1

    # Segmented wave solves (the bounded-execution-runtime mode) must give
    # the SAME search outcome as the single-shot wave (identical PRNG
    # streams via absolute iteration indices).
    pp3 = ParallelProbeSearchEll(nit=80, eta=0.05, seed=0, wave=4,
                                 use_bcsr=True,
                                 wave_segment=30).prepare(ell, S, Q,
                                                          block=16)
    z3, Z3, rem3 = pp3.run(ell)
    assert rem3 == 0 and Z3 == Z


def test_env_generation_vmaps():
    """Scenario generation is itself vmappable over seeds."""
    from sig_sdp_mmw_tpu.env.env import (EnvParams, ap_grid,
                                         rxpr_unthresholded, sample_sta_locs,
                                         state_arrays_from_rxpr,
                                         threshold_rxpr)

    p = EnvParams(cell_size=5, sta_density_per_1m2=0.0075)
    aps = ap_grid(p)

    def gen(key):
        sta = sample_sta_locs(key, p)
        rx = threshold_rxpr(rxpr_unthresholded(sta, aps, p), p)
        S, Q, h, _ = state_arrays_from_rxpr(rx, p)
        return S, Q, h

    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    S, Q, h = jax.jit(jax.vmap(gen))(keys)
    assert S.shape == (4, p.n_sta, p.n_sta)
    assert np.isfinite(np.asarray(S)).all()
    # Seeds differ -> scenarios differ.
    assert not np.allclose(np.asarray(S[0]), np.asarray(S[1]))
