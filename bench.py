#!/usr/bin/env python3
"""Benchmark: the PRODUCTION compiled path on the standard_2d case.

Runs the full adaptive simulation (test_cyl: axisymmetric air streamer,
real AMR with refinement every 2 steps, adaptive dt with rejection/retry,
multigrid field solves with convergence control) through the compiled
engine (compiled%enabled: jitted units over bucketed epoch packs,
core/treepack.py) and reports STEADY-STATE microseconds per leaf-cell per
step — the BASELINE.md north star. Steady state = the median per-step
time over the run, which excludes the one-off jit compiles triggered in
the first steps and at bucket-growing refinement epochs while still
including the recurring refinement-epoch work.

Artifact-completeness rules (VERDICT round-4 item 2): the standalone
V-cycle metric (BASELINE.json; tools/poisson_bench.py) runs BEFORE the
production loop, and the device-timeline breakdown is captured DURING
the run (jax.profiler around a few steady-state steps, parsed on the
spot) — so a watchdog-terminated partial run still carries both.

vs_baseline anchors to the reference's own class of performance: the
published afivo numbers (Teunissen & Ebert CPC 2018; BASELINE.md) put a
32-thread OpenMP full streamer step at roughly 0.03-0.3 us/cell/step on
this problem class; vs_baseline reports (0.1 / us_per_cell) against the
geometric middle of that range, since the Fortran toolchain is not
available in this environment to measure directly (BASELINE.md).
"""

import json
import os
import time

import numpy as np


def _parse_trace(trace_dir, n_done):
    """Aggregate device-event time from a jax.profiler trace directory by
    the named-scope stage annotations (fluid._flux_update_body,
    driver._fused_fn). Returns {stage: ms_per_step} plus the total; the
    analog of the reference's per-phase timers (src/m_streamer.f90:181-187)
    without switching to the per-unit dispatch mode."""
    import glob
    import gzip
    files = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    if not files:
        return {"error": "no trace produced"}
    with gzip.open(max(files, key=os.path.getmtime), "rt") as fh:
        tr = json.load(fh)
    events = tr.get("traceEvents", [])
    # device pids: process_name metadata mentioning TPU/device
    dev_pids = set()
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            nm = str(ev.get("args", {}).get("name", "")).lower()
            if ("tpu" in nm or "device" in nm or "xla" in nm
                    or "axon" in nm):
                dev_pids.add(ev.get("pid"))
    tags = ("flux", "source", "field", "vcycle", "smoother", "photoi",
            "refine_prologue", "restrict", "prolong")
    buckets = {}
    total = 0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        dur = ev.get("dur", 0)  # microseconds
        total += dur
        longname = (str(ev.get("args", {})) + "/"
                    + str(ev.get("name", "")))
        key = next((t for t in tags if t in longname), "other")
        buckets[key] = buckets.get(key, 0) + dur
    if total == 0:
        return {"error": "no device events in trace"}
    out = {k: round(v / 1e3 / n_done, 2)
           for k, v in sorted(buckets.items(), key=lambda kv: -kv[1])}
    out["total_device_ms_per_step"] = round(total / 1e3 / n_done, 2)
    out["profiled_steps"] = n_done
    return out


def main():
    t_setup = time.time()
    import jax
    jax.config.update("jax_enable_x64", True)
    try:  # persistent compile cache across bench runs
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/afivo_jax_cache")
    except Exception:
        pass
    from afivo_streamer_tpu.driver import Simulation
    from afivo_streamer_tpu.core import reductions as red

    on_tpu = jax.default_backend() not in ("cpu",)

    # standalone multigrid-cycle metric FIRST (BASELINE.json: V-cycle
    # us/cell; the analog of afivo examples/poisson_benchmark.f90) so the
    # number is in the artifact even when the watchdog terminates the
    # production run (VERDICT round-4 item 2: the post-run placement made
    # it structurally dead on every partial run)
    poisson = None
    if os.environ.get("BENCH_POISSON", "1") == "1":
        try:
            import sys
            sys.path.insert(0, os.path.dirname(
                os.path.abspath(__file__)) or ".")
            t_p = time.time()
            from tools.poisson_bench import run as poisson_run
            # fmg=False: the FMG executable's cold compile roughly
            # doubles this pre-run's cost (~470 s measured round 5 with
            # both units) against the production watchdog budget; the
            # BASELINE metric only needs the V-cycle number
            poisson = poisson_run(
                fmg=os.environ.get("BENCH_FMG", "0") == "1")
            poisson["bench_wall_s"] = round(time.time() - t_p, 1)
        except Exception as e:
            poisson = {"error": str(e)[:200]}

    dtype = "float32" if on_tpu else "float64"
    ref = "/root/reference/programs/standard_2d/tests"
    # 1.2 ns covers inception + the full level-9->11 AMR growth (~550
    # adaptive steps, level-10/11 steady state from ~0.45 ns on): long
    # enough that the median is a steady-state estimate, and — unlike
    # the 2 ns horizon of rounds 1-4, which the 1500 s watchdog killed
    # every round (partial_run: true four times) — short enough that a
    # healthy-tunnel run FINISHES: round-5 measurement reached 1.286 ns
    # in 1364 s wall including setup+compile (BENCH log r5d). The
    # us/cell/step metric is intensive, so the shorter horizon changes
    # nothing about what is measured, only whether the run completes.
    end_time = float(os.environ.get("BENCH_END_TIME",
                                    "1.2e-9" if on_tpu else "0.5e-9"))
    sim = Simulation(argv=[
        f"{ref}/test_cyl.cfg", "-ndim=2",
        f"-input_data%file={ref}/td_air_siglo_swarm.txt",
        "-output%name=/tmp/bench/run",
        "-compiled%enabled=T", f"-compiled%dtype={dtype}",
        # headroom so AMR growth never changes compiled shapes: one fused
        # step unit compiles once (~minutes of remote XLA through the
        # tunnel) instead of once per synchronized bucket doubling
        "-compiled%prepad=4",
    ])
    setup_s = time.time() - t_setup

    # per-step wall clock and cell count via the per-iteration user hook;
    # the same hook drives the IN-RUN device-timeline capture: a few
    # steady-state steps (covering refinement epochs) are traced and the
    # trace parsed immediately, so the breakdown exists on partial runs
    step_wall = []
    step_cells = []
    last = [time.time()]
    prof = {"phase": "idle", "start_it": 0, "result": None,
            "dir": "/tmp/bench/profile", "n": 4,
            # default window sits in level-10 steady state, clear of the
            # post-growth background warm compile that polluted the it=61
            # window (device totals included the phantom step's execution)
            "at_it": int(os.environ.get("BENCH_PROFILE_AT", "151")),
            "on": os.environ.get("BENCH_PROFILE", "1") == "1"}

    def per_step(s, time_now):
        now = time.time()
        step_wall.append(now - last[0])
        step_cells.append(red.n_leaf_cells(s.tree))
        if prof["on"]:
            try:
                if prof["phase"] == "idle" and s.it >= prof["at_it"]:
                    jax.profiler.start_trace(prof["dir"])
                    prof["phase"] = "tracing"
                    prof["start_it"] = s.it
                elif (prof["phase"] == "tracing"
                        and s.it >= prof["start_it"] + prof["n"]):
                    jax.profiler.stop_trace()
                    prof["phase"] = "done"
                    prof["result"] = _parse_trace(prof["dir"], prof["n"])
            except Exception as e:
                prof["phase"] = "done"
                prof["result"] = {"error": str(e)[:200]}
        last[0] = time.time()

    sim.user.generic = per_step

    t0 = time.time()

    def emit(partial):
        wall = time.time() - t0
        n_steps = sim.it
        w = np.asarray(step_wall[1:])     # first entry covers startup
        c = np.asarray(step_cells[1:], float)
        # steady state: median us/cell/step over the run (a robust
        # estimator: compile spikes land in the tail of the distribution)
        us_steady = (float(np.median(w / c) * 1e6) if len(w)
                     else 1e9)            # no finished step: sentinel
        us_total = wall / max(float(np.sum(c)), 1.0) * 1e6
        baseline_us = 0.1  # module docstring (CPC-2018 class, 32T OpenMP)
        result = {
            "metric": f"standard_2d(test_cyl) PRODUCTION adaptive-AMR run "
                      f"to {end_time*1e9:.1f} ns, compiled engine, {dtype} "
                      f"[{jax.default_backend()}], steady-state",
            "value": round(us_steady, 4),
            "unit": "us/cell/step",
            "vs_baseline": round(baseline_us / us_steady, 3),
            "extra": {
                "partial_run": partial,
                "t_reached_ns": round(sim.global_time * 1e9, 3),
                "us_per_cell_incl_compiles": round(us_total, 4),
                "wall_s": round(wall, 1),
                "n_steps": n_steps,
                "cell_steps": int(np.sum(c)) if len(w) else 0,
                "final_levels": int(sim.tree.highest_lvl),
                "median_step_ms": round(float(np.median(w)) * 1e3, 1)
                if len(w) else None,
                # the axon tunnel injects multi-second stalls in degraded
                # phases; the lower percentiles estimate the framework's
                # own steady-state cost when the median is polluted
                "p25_us_per_cell": round(
                    float(np.percentile(w / c, 25)) * 1e6, 4)
                if len(w) else None,
                "p10_step_ms": round(
                    float(np.percentile(w, 10)) * 1e3, 1)
                if len(w) else None,
                "setup_s": round(setup_s, 1),
                "device_breakdown": prof["result"],
                # only buckets that apply to this run mode (compiled runs
                # attribute the fused substep to "advance"; flux/source
                # split exists on the host path only), plus the
                # unattributed remainder so the entries sum to ~wall
                "wc_breakdown": dict(
                    {k: round(v, 1) for k, v in sim.wc.items() if v > 0.0},
                    other=round(max(0.0, wall - sum(sim.wc.values())), 1)),
                # sub-phase slices INSIDE the buckets above (driver.wc2):
                # dispatch vs blocked pull, pack assembly, epoch topology
                # vs rewire vs epilogue-dispatch, warm-thread joins
                "wc_detail": {k: round(v, 1)
                              for k, v in getattr(sim, "wc2", {}).items()
                              if v > 0.05},
                "poisson_benchmark": poisson,
            },
        }
        print(json.dumps(result), flush=True)

    # a driver-imposed timeout (SIGTERM) must still yield the JSON line:
    # report the steady-state median over the steps completed so far
    import signal

    def _on_term(signum, frame):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _on_term)

    # a SIGTERM that lands while the main thread is blocked inside a
    # device dispatch/compile is deferred until the call returns — on a
    # degraded TPU tunnel that can be minutes, so the handler above may
    # never run before SIGKILL. A daemon watchdog guarantees the JSON
    # line: at the deadline it emits the partial result from whatever
    # steps completed and hard-exits. The pre-run poisson metric and the
    # in-run profile are already bound to `poisson`/`prof` by then.
    import threading

    deadline = float(os.environ.get("BENCH_WATCHDOG_S", "1500"))

    def _watchdog():
        time.sleep(max(deadline - (time.time() - t_setup), 1.0))
        emit(True)
        os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()

    partial = False
    try:
        sim.run(end_time=end_time)
    except KeyboardInterrupt:
        partial = True
    except Exception as e:  # noqa: BLE001 — tunnel RPC failures etc.
        # a mid-run device/tunnel error must still yield the JSON line
        # with the steady-state estimate over the completed steps
        import traceback
        traceback.print_exc()
        print(f"bench: run aborted by {type(e).__name__}: {e}",
              flush=True)
        partial = True
    emit(partial)


if __name__ == "__main__":
    main()
