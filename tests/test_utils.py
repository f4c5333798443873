"""Tests for config / lookup table / geometry utilities."""

import os
import textwrap

import numpy as np
import pytest

from afivo_streamer_tpu.utils.config import CFG
from afivo_streamer_tpu.utils.lookup_table import (
    LookupTable, XSPACING_LINEAR, XSPACING_QUADRATIC)
from afivo_streamer_tpu.utils.table_data import table_from_file
from afivo_streamer_tpu.utils import geometry


def test_cfg_roundtrip(tmp_path):
    p = tmp_path / "a.cfg"
    p.write_text(textwrap.dedent("""\
        # comment
        end_time = 10.0e-9
        box_size = 8
        periodic = F
        gas%components = N2 O2
        gas%fractions = 0.8 0.2
        [photoi]
           enabled = f
        field_given_by = field -8e6
        """))
    cfg = CFG()
    cfg.read_file(str(p))
    assert cfg.add_get("end_time", 5e-9) == 10.0e-9
    assert cfg.add_get("box_size", 16) == 8
    assert cfg.add_get("periodic", [True], dynamic=True) == [False]
    assert cfg.add_get("gas%components", [], dynamic=True) == ["N2", "O2"]
    assert cfg.add_get("gas%fractions", [1.0], dynamic=True) == [0.8, 0.2]
    assert cfg.add_get("photoi%enabled", True) is False
    assert cfg.add_get("field_given_by", "undefined") == "field -8e6"
    assert cfg.add_get("missing_key", 3.5) == 3.5


def test_cfg_cli_override(tmp_path):
    p = tmp_path / "a.cfg"
    p.write_text("end_time = 1.0\n")
    cfg = CFG()
    cfg.update_from_arguments([str(p), "-end_time=2.0", "-photoi%enabled=T"])
    assert cfg.add_get("end_time", 0.0) == 2.0
    assert cfg.add_get("photoi%enabled", False) is True


def test_lookup_table_linear():
    tbl = LookupTable(0.0, 10.0, 11, 2)
    tbl.set_col(0, [0.0, 10.0], [0.0, 20.0])  # y = 2x
    x = np.array([-1.0, 0.0, 2.5, 9.99, 10.0, 15.0])
    y = tbl.get_col(0, x)
    assert np.allclose(y, [0.0, 0.0, 5.0, 19.98, 20.0, 20.0])


def test_lookup_table_irregular_input():
    tbl = LookupTable(0.0, 1.0, 101, 1)
    xs = np.array([0.0, 0.1, 0.5, 1.0])
    ys = xs**2
    tbl.set_col(0, xs, ys)
    # table interpolates the piecewise-linear interpolant of the input
    assert abs(tbl.get_col(0, 0.05) - 0.005) < 1e-12
    assert abs(tbl.get_col(0, 0.75) - (0.25 + 0.75 * 0.5) / 1.0 * 1.0
               - (-0.0)) < 1.0  # smoke


def test_lookup_table_quadratic_spacing():
    tbl = LookupTable(0.0, 100.0, 51, 1, xspacing=XSPACING_QUADRATIC)
    tbl.set_col(0, [0.0, 100.0], [0.0, 1.0])
    # between-row interpolation is linear in the index coordinate, so only
    # approximately exact for linear data (matches reference behavior)
    assert abs(tbl.get_col(0, 50.0) - 0.5) < 1e-3
    # exactly on a grid row it is exact
    assert abs(tbl.get_col(0, tbl.x[20]) - tbl.x[20] / 100.0) < 1e-12


def test_lookup_table_jnp():
    import jax.numpy as jnp
    tbl = LookupTable(0.0, 10.0, 11, 1)
    tbl.set_col(0, [0.0, 10.0], [0.0, 20.0])
    y = tbl.get_col(0, jnp.array([2.5, 11.0]))
    assert np.allclose(np.asarray(y), [5.0, 20.0])


def test_table_from_file():
    ref = "/root/reference/programs/standard_1d/tests/td_air_siglo_swarm.txt"
    if not os.path.exists(ref):
        pytest.skip("reference data not present")
    x, y = table_from_file(ref, "efield[V/m]_vs_mu[m2/Vs]")
    assert x[0] == 5.000e4 and y[0] == 1.900e-01
    assert len(x) == 40


def test_density_line_profiles():
    r = np.array([[0.0], [1.0], [2.0], [3.0]])
    v = geometry.density_line(r, [0.0], [1.0], 5.0, 5.0, 1.0, "step")
    assert np.allclose(v, [5.0, 5.0, 0.0, 0.0])
    v = geometry.density_line(r, [0.0], [1.0], 5.0, 5.0, 0.5, "smoothstep")
    assert v[0] == 5.0 and v[3] == 0.0
    # gaussian falloff from line end
    v = geometry.density_line(np.array([[2.0]]), [0.0], [1.0], 1.0, 1.0,
                              1.0, "gaussian")
    assert np.allclose(v, np.exp(-1.0))


def test_limiters():
    import jax.numpy as jnp
    from afivo_streamer_tpu.ops import limiters as lim
    a = jnp.array([1.0, 1.0, 4.0, -1.0, 0.0])
    b = jnp.array([1.0, 8.0, 1.0, 1.0, 2.0])
    k = np.asarray(lim.koren(a, b))
    # a=b=1 -> 1; a=1,b=8: aa=1 <= 0.25*8 -> 2a=2; a=4,b=1: aa=16 > 2.5*4 -> 2b=2
    assert np.allclose(k, [1.0, 2.0, 2.0, 0.0, 0.0])
    m = np.asarray(lim.mc(a, b))
    assert np.allclose(m, [1.0, 2.0, 2.0, 0.0, 0.0])
    v = np.asarray(lim.vanleer(a, b))
    assert np.allclose(v, [1.0, 16.0 / 9.0, 8.0 / 5.0, 0.0, 0.0])
