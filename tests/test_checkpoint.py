"""Checkpoint/restart round trip.

The reference treats restart as first-class (datfile write per output,
``src/m_output.f90:37-40``; resume via ``restart_from_file`` with
consistency checks, ``src/streamer.f90:117-161``). Here: run a 1D case to
2 ns writing checkpoints, restart from the 1 ns checkpoint, continue to
2 ns, and require the regression log of the restarted run to match the
uninterrupted one. Also covers the version / geometry mismatch errors.
"""

import os

import numpy as np
import pytest

from afivo_streamer_tpu.driver import Simulation

REF = "/root/reference/programs/standard_1d/tests"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="no reference data")


def _argv(out, extra=()):
    return [f"{REF}/test_1d.cfg", "-ndim=1",
            f"-input_data%file={REF}/td_air_siglo_swarm.txt",
            f"-output%name={out}", "-datfile%write=T",
            *extra]


def test_checkpoint_roundtrip(tmp_path):
    # uninterrupted reference run to 2 ns
    out_a = str(tmp_path / "full")
    sim_a = Simulation(argv=_argv(out_a))
    sim_a.run(end_time=2.05e-9)

    # run to ~1 ns (checkpoints written at each output)
    out_b = str(tmp_path / "part")
    sim_b = Simulation(argv=_argv(out_b))
    sim_b.run(end_time=1.05e-9)
    ckpts = sorted(p for p in os.listdir(tmp_path)
                   if p.startswith("part_") and p.endswith(".dat.npz"))
    assert ckpts, sorted(os.listdir(tmp_path))
    ckpt = str(tmp_path / ckpts[-1])

    # restart from the checkpoint and continue to 2 ns
    out_c = str(tmp_path / "rest")
    sim_c = Simulation(argv=_argv(
        out_c, extra=(f"-restart_from_file={ckpt}",)))
    d = np.load(ckpt, allow_pickle=False)
    assert sim_c.global_time == pytest.approx(
        float(d["payload_global_time"]))
    assert sim_c.it == int(d["payload_it"])
    assert sim_c.tree.highest_id == int(d["highest_id"])
    np.testing.assert_allclose(
        np.asarray(sim_c.cc[:, :sim_c.tree.highest_id]), d["cc"])
    sim_c.run(end_time=2.05e-9)

    # the restarted run's log rows after the restart must match the
    # uninterrupted run's (same tolerance as the golden comparisons)
    a = np.loadtxt(out_a + "_rtest.log", skiprows=1, ndmin=2)
    c = np.loadtxt(out_c + "_rtest.log", skiprows=1, ndmin=2)
    n = len(c)
    assert n >= 3  # at least a few post-restart outputs
    ok = np.isclose(a[-n:], c, rtol=1e-5, atol=1e-8)
    assert ok.all(), f"mismatch at {np.argwhere(~ok)[:5]}"


def test_checkpoint_mismatch_errors(tmp_path):
    out = str(tmp_path / "src")
    sim = Simulation(argv=_argv(out))
    sim.run(max_steps=12)
    ckpts = sorted(p for p in os.listdir(tmp_path)
                   if p.endswith(".dat.npz"))
    assert ckpts, "no checkpoint written"
    ckpt = str(tmp_path / ckpts[-1])

    # box-size mismatch
    with pytest.raises(ValueError, match="box size"):
        Simulation(argv=_argv(str(tmp_path / "bad1"), extra=(
            f"-restart_from_file={ckpt}", "-box_size=16")))
    # domain-length mismatch
    with pytest.raises(ValueError, match="domain_len"):
        Simulation(argv=_argv(str(tmp_path / "bad2"), extra=(
            f"-restart_from_file={ckpt}", "-domain_len=2e-2")))
    # version mismatch
    d = dict(np.load(ckpt, allow_pickle=False))
    d["payload_version"] = np.asarray(999)
    bad = str(tmp_path / "old.dat.npz")
    np.savez_compressed(bad, **d)
    with pytest.raises(ValueError, match="version"):
        Simulation(argv=_argv(str(tmp_path / "bad3"), extra=(
            f"-restart_from_file={bad}",)))
