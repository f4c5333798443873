"""The analysis-tool pipeline runs on this framework's outputs.

Runs a short 2D case that writes AMR grid npz files plus the chemistry
companion files, then exercises the npz loader (tools/gridnpz.py) and a
representative cross-section of the analysis tools the reference ships
(tools/visit_* npz equivalents, log/sensitivity parsing,
chemistry_update_reactions). Reference analog: the tools are driven
manually over Silo/log outputs (``/root/reference/tools``)."""

import glob
import os
import subprocess
import sys

import numpy as np
import pytest

REF = "/root/reference/programs/standard_2d/tests"
TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="no reference data")


@pytest.fixture(scope="module")
def short_run(tmp_path_factory):
    from afivo_streamer_tpu.driver import Simulation
    out = tmp_path_factory.mktemp("tools") / "run"
    sim = Simulation(argv=[
        f"{REF}/test_cyl.cfg", "-ndim=2",
        f"-input_data%file={REF}/td_air_siglo_swarm.txt",
        f"-output%name={out}",
        "-output%dt=1e-13"])
    sim.run(max_steps=12)
    return str(out), sim


def run_tool(name, *args):
    r = subprocess.run(
        [sys.executable, os.path.join(TOOLS, name), *map(str, args)],
        cwd=TOOLS, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, f"{name}: {r.stderr[-2000:]}"
    return r.stdout


def test_gridnpz_loader_and_reductions(short_run):
    out, sim = short_run
    sys.path.insert(0, TOOLS)
    try:
        from gridnpz import GridData
    finally:
        sys.path.remove(TOOLS)
    files = sorted(glob.glob(out + "_grid_*.npz"))
    assert files, "run wrote no grid npz"
    g = GridData(files[-1])
    assert "e" in g.data and "electric_fld" in g.data

    # integral of the electron density == the tree-sum observable
    from afivo_streamer_tpu.core import reductions as red
    total, vol = g.integrate("e")
    expect = float(red.tree_sum_cc(np.asarray(sim.cc), sim.tree,
                                   sim.i_electron))
    assert total == pytest.approx(expect, rel=1e-10)

    # domain volume: cylinder of the domain dimensions
    r_len, z_len = sim.tree.domain_len
    assert vol == pytest.approx(np.pi * r_len ** 2 * z_len, rel=1e-10)

    # the max location agrees with a direct scan
    val, loc = g.max_location("electric_fld")
    s, line = g.lineout("electric_fld", [loc[0], 0.0],
                        [loc[0], z_len], 256)
    assert np.nanmax(line) <= val * (1 + 1e-12)


def test_visit_tool_equivalents_run(short_run):
    out, sim = short_run
    f = sorted(glob.glob(out + "_grid_*.npz"))[-1]
    txt = run_tool("visit_integrate_region.py", f, "e")
    integral = float(txt.splitlines()[-1].split()[0])
    assert integral > 0

    txt = run_tool("visit_integrate_conditional.py", f, "e",
                   "-condition", "ge(electric_fld, 1e6)")
    assert float(txt.splitlines()[-1].split()[1]) > 0  # volume

    run_tool("visit_lineout.py", f, "electric_fld",
             "-r0", 0, 0, "-r1", 0, float(sim.tree.domain_len[1]),
             "-outdir", os.path.dirname(f))
    curve = glob.glob(os.path.join(os.path.dirname(f), "*.curve"))
    assert curve and len(np.loadtxt(curve[0], ndmin=2)) > 100

    files = sorted(glob.glob(out + "_grid_*.npz"))
    if len(files) >= 2:
        txt = run_tool("visit_get_head_potential.py", files[0], files[-1])
        assert "delta_phi" in txt

    run_tool("visit_get_radius_cyl.py", f,
             "-zrange", 0.8e-2, 1.1e-2, "-npoints", 5,
             "-threshold_e", 1e15,
             "-output", os.path.join(os.path.dirname(f), "r_vs_z.txt"))

    txt = run_tool("visit_integrate_volume_overTime.py",
                   out + "_grid_*.npz", "e",
                   "-output", os.path.join(os.path.dirname(f), "ivt.txt"))
    assert len(txt.splitlines()) >= 1


def test_log_and_chemistry_tools_run(short_run, tmp_path):
    out, sim = short_run
    run_tool("plot_log_xy.py", out + "_log.txt", "-y", "max(E)",
             "-o", str(tmp_path / "xy.png"))
    run_tool("plot_transport_data_summary.py", out + "_summary.txt",
             "-o", str(tmp_path / "sum.png"))
    run_tool("chemistry_visualize_rates.py", out + "_rates.txt",
             "-list_reactions")
    txt = run_tool("chemistry_visualize_rates.py", out + "_rates.txt",
                   "-soi", "e", "-savefig", str(tmp_path / "r.png"))
    assert "wrote" in txt

    # legacy rate-name rewriting round-trips through the parser table
    legacy = tmp_path / "reactions.txt"
    legacy.write_text("e + O2 -> O2-,k1_func,1e-13,0.5\n")
    run_tool("chemistry_update_reactions.py", str(legacy))
    assert "c1*(300/Te)**c2" in legacy.read_text()
    assert (tmp_path / "reactions.txt.bak").exists()


def test_sensitivity_tools_run(short_run, tmp_path):
    out, sim = short_run
    txt = run_tool("sensitivity_generate_commands.py",
                   f"{REF}/test_cyl.cfg", "-ix_range", 1, 2,
                   "-command_file", str(tmp_path / "commands.txt"))
    cmds = (tmp_path / "commands.txt").read_text().splitlines()
    assert len(cmds) == 5 and "modified_reaction_ix=2" in cmds[-1]

    # synthesize a study from the real log: base + two factor variants
    import shutil
    names = {0: [1.0], 4: [0.8, 1.2]}
    logs = []
    raw = np.loadtxt(out + "_log.txt", skiprows=1, ndmin=2)
    with open(out + "_log.txt") as f:
        header = f.readline()
    for ix, facs in names.items():
        for fac in facs:
            p = tmp_path / f"s_ix{ix:04d}_fac{fac}_log.txt"
            scaled = raw.copy()
            if ix:  # perturb observables so derivatives are non-zero
                scaled[:, 1:] *= fac
            with open(p, "w") as f:
                f.write(header)
                np.savetxt(f, scaled)
            logs.append(str(p))
    shutil.copyfile(out + "_reactions.txt",
                    tmp_path / "s_ix0000_fac1.0_reactions.txt")
    txt = run_tool("sensitivity_analyze_results.py", *logs,
                   "-y", "max(E)")
    assert "sorted by overall importance" in txt
