"""Smoke tests: every experiment script runs end-to-end in --smoke mode and
produces parseable metric files + figures."""

import os

import pytest


@pytest.fixture(scope="module")
def smoke_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("exp")


def _run(mod, smoke_dir, name, extra=()):
    out = str(smoke_dir / name)
    path = mod.main(["--smoke", "--platform", "cpu", "--out", out, *extra])
    files = os.listdir(path)
    assert files, f"{name}: no metric files written"
    return path


def test_sim_graph_test(smoke_dir):
    from sig_sdp_mmw_tpu.experiments import sim_graph_test

    path = _run(sim_graph_test, smoke_dir, "graph")
    from sig_sdp_mmw_tpu.experiments import plot_results

    plot_results.main([path])
    assert any(f.endswith(".pdf") for f in os.listdir(path))


def test_sim_all_bler(smoke_dir):
    from sig_sdp_mmw_tpu.experiments import sim_all_bler

    path = _run(sim_all_bler, smoke_dir, "bler")
    from sig_sdp_mmw_tpu.experiments import plot_results

    plot_results.main([path])
    assert any(f.endswith(".pdf") for f in os.listdir(path))


def test_sim_all_mmw_gap(smoke_dir):
    from sig_sdp_mmw_tpu.experiments import sim_all_mmw

    _run(sim_all_mmw, smoke_dir, "gap")


def test_sim_mmw_time(smoke_dir):
    from sig_sdp_mmw_tpu.experiments import sim_mmw_time

    path = _run(sim_mmw_time, smoke_dir, "time", extra=["--repeat", "1"])
    files = os.listdir(path)
    assert any(f.startswith("mmw150-time") for f in files)
    assert any(f.startswith("mmw150-fused") for f in files)


def test_sim_mmw_oracle_z(smoke_dir):
    from sig_sdp_mmw_tpu.experiments import sim_mmw_oracle_z

    path = _run(sim_mmw_oracle_z, smoke_dir, "oraclez",
                extra=["--oracle_nit", "200"])
    files = os.listdir(path)
    assert any(f.startswith("scs-") for f in files)
    assert any(f.startswith("mmw150-") for f in files)


def test_sim_bound_ablation(smoke_dir):
    from sig_sdp_mmw_tpu.experiments import sim_bound_ablation

    path = _run(sim_bound_ablation, smoke_dir, "bounds",
                extra=["--repeat", "2", "--alg", "mmw"])
    files = os.listdir(path)
    assert any(f.startswith("g_bound_iter_list") for f in files)
    assert any(f.startswith("n_bound_time_list") for f in files)


def test_sim_online_methods(smoke_dir):
    from sig_sdp_mmw_tpu.experiments import sim_online_methods

    _run(sim_online_methods, smoke_dir, "online", extra=["--repeat", "1",
                                                         "--cells", "5"])


def test_sim_convergence(smoke_dir):
    from sig_sdp_mmw_tpu.experiments import sim_convergence

    _run(sim_convergence, smoke_dir, "conv", extra=["--repeat", "1",
                                                    "--cells", "5"])


def test_sim_all_bler_resumes(smoke_dir):
    """Re-running the sweep with the same --out skips completed items."""
    import time

    from sig_sdp_mmw_tpu.experiments import sim_all_bler

    out = str(smoke_dir / "bler_resume")
    sim_all_bler.main(["--smoke", "--platform", "cpu", "--out", out])
    t0 = time.time()
    sim_all_bler.main(["--smoke", "--platform", "cpu", "--out", out])
    assert time.time() - t0 < 5.0   # everything skipped via the checkpoint
