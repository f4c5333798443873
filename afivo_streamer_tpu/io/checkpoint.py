"""Full-state checkpoint / restart.

The analog of the reference's binary "datfile" (af_write_tree /
af_read_tree, ``afivo/src/m_af_output.f90:41-374``; driver payload
``streamer.f90:521-557``): the complete tree geometry, all cell- and
face-centered data, and a versioned caller payload (iteration, times, dt,
global rates), written as a compressed .npz archive. Restart restores the
exact topology and state; consistency checks mirror the reference's
(box size / variable count, ``streamer.f90:129-140``)."""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..core.tree import Tree

DATFILE_VERSION = 1


def write_checkpoint(fname: str, sim) -> None:
    t = sim.tree
    payload = dict(
        version=DATFILE_VERSION,
        it=sim.it,
        out_cnt=sim.out_cnt,
        global_time=sim.global_time,
        global_dt=sim.global_dt,
        photoi_prev_time=sim._photoi_prev_time,
        global_rates=sim.global_rates,
        global_JdotE=sim.global_JdotE,
    )
    np.savez_compressed(
        fname,
        # tree geometry
        ndim=t.ndim, nc=t.nc, coord=t.coord,
        domain_len=t.domain_len, r_base=t.r_base,
        coarse_grid_size=t.coarse_grid_size, periodic=t.periodic,
        highest_id=t.highest_id,
        lvl=t.lvl[:t.highest_id], ix=t.ix[:t.highest_id],
        parent=t.parent[:t.highest_id],
        children=t.children[:t.highest_id],
        neighbors=t.neighbors[:t.highest_id],
        in_use=t.in_use[:t.highest_id],
        removed_ids=np.asarray(t.removed_ids, np.int64),
        # state
        cc=np.asarray(sim.cc)[:, :t.highest_id],
        fc=np.asarray(sim.fc)[:, :, :t.highest_id],
        cc_names=np.asarray(sim.registry.cc_names),
        **{f"payload_{k}": v for k, v in payload.items()},
    )


def read_checkpoint(fname: str, sim) -> None:
    """Restore tree + state into an initialized simulation."""
    d = np.load(fname, allow_pickle=False)
    if int(d["payload_version"]) != DATFILE_VERSION:
        raise ValueError("Different datfile version")
    t = sim.tree
    if int(d["nc"]) != t.nc:
        raise ValueError("restart: incompatible box size")
    if len(d["cc_names"]) != len(sim.registry.cc_names):
        raise ValueError("restart: incompatible variable list")
    # geometry consistency: the checkpointed topology only makes sense on
    # the same domain (the reference's af_read_tree takes geometry from the
    # datfile; here the live tree must match what was saved)
    if int(d["ndim"]) != t.ndim:
        raise ValueError("restart: incompatible ndim")
    if str(d["coord"]) != t.coord:
        raise ValueError("restart: incompatible coordinate system")
    for key, live in (("domain_len", t.domain_len), ("r_base", t.r_base)):
        if not np.allclose(np.asarray(d[key], np.float64),
                           np.asarray(live, np.float64), rtol=1e-12):
            raise ValueError(f"restart: incompatible {key}")
    if not np.array_equal(np.asarray(d["coarse_grid_size"]),
                          np.asarray(t.coarse_grid_size)):
        raise ValueError("restart: incompatible coarse_grid_size")
    if not np.array_equal(np.asarray(d["periodic"], bool),
                          np.asarray(t.periodic, bool)):
        raise ValueError("restart: incompatible periodicity")
    n = int(d["highest_id"])
    if n > t.cap:
        # grow BEFORE setting highest_id (grow copies highest_id rows)
        t._grow(n + 64)
    t.highest_id = n
    t.lvl[:n] = d["lvl"]
    t.ix[:n] = d["ix"]
    t.parent[:n] = d["parent"]
    t.children[:n] = d["children"]
    t.neighbors[:n] = d["neighbors"]
    t.in_use[:n] = d["in_use"]
    t.removed_ids = [int(x) for x in d["removed_ids"]]
    # rebuild index maps and level lists
    t._ix_maps = []
    for b in range(n):
        if not t.in_use[b]:
            continue
        lvl = int(t.lvl[b])
        while len(t._ix_maps) < lvl:
            t._ix_maps.append(dict())
        t._ix_maps[lvl - 1][tuple(int(x) for x in t.ix[b])] = b
    t._rebuild_levels()

    cc = d["cc"]
    fc = d["fc"]
    sim._sync_capacity()
    sim.cc[:, :n] = cc
    sim.fc[:, :, :n] = fc
    sim.it = int(d["payload_it"])
    sim.out_cnt = int(d.get("payload_out_cnt", 0))
    sim.global_time = float(d["payload_global_time"])
    sim.global_dt = float(d["payload_global_dt"])
    sim._photoi_prev_time = float(d["payload_photoi_prev_time"])
    sim.global_rates = np.asarray(d["payload_global_rates"])
    sim.global_JdotE = float(d["payload_global_JdotE"])
