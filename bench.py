#!/usr/bin/env python
"""Benchmark: black-oil simulation, TPU vs same-machine CPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline provenance (honest by construction):
  * The reference (`OPM/opm-simulators-legacy`) publishes NO benchmark
    numbers (BASELINE.md), and its `flow_legacy` binary cannot be built in
    this environment: `cmake /root/reference` fails at the first missing
    dependency (opm-common; the full chain needs dune-common/dune-istl/
    opm-common/opm-grid/opm-material/ewoms + Eigen + Boost, none installed,
    and the machine has no network egress to fetch them). The attempt and
    log are recorded in BASELINE.md §"flow_legacy build attempt".
  * The baseline here is therefore THIS framework's own CPU path, measured
    FRESH in the same bench run on the same machine with the same code and
    protocol (not a hardcoded number, not a foreign machine) — labeled
    `baseline` in the output with its provenance. vs_baseline =
    cpu_wall / tpu_wall (>1 means the TPU run is faster).

Phases (each in its own subprocess: isolates device/trace state; shares
the persistent compilation cache):
  spe1      TPU SPE1 e2e wall-clock, 120 report steps / 10 years (headline)
  spe1cpu   the same run on CPU (the measured baseline)
  spe9      SPE9 (data/SPE9.DATA, real corner-point deck, 26 wells):
            FULL 900-day schedule e2e wall-clock
  norne     Norne-class faulted corner-point synthetic (75.6k active,
            embedded-structured path): full schedule e2e + ms/Newton
  spe10     SPE10-like 132k-cell fused substeps: ms per Newton (scaling)
  spe10e2e  SPE10-like 132k-cell FULL 20-report-step schedule, e2e
            wall-clock with summary output on
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SPE1 = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "data", "SPE1CASE2.DATA")
SPE9 = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "data", "SPE9.DATA")


def _maybe_cpu():
    if os.environ.get("OPM_TPU_BENCH_CPU") == "1":
        import jax
        jax.config.update("jax_platforms", "cpu")


def bench_spe1(tag="spe1"):
    _maybe_cpu()
    import opm_tpu  # noqa: F401  (x64 + cache config)
    from opm_tpu.io.eclstate import load_case
    from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil

    case = load_case(SPE1)
    # warmup: compile all kernels on a copy (2 report steps)
    warm = SimulatorFullyImplicitBlackoil(case, fused=True)
    warm.run(report_step_limit=2)

    sim = SimulatorFullyImplicitBlackoil(case, fused=True)
    sim.solver = warm.solver  # reuse compiled kernels (same shapes)
    t0 = time.perf_counter()
    sim.run()
    wall = time.perf_counter() - t0
    newtons = max(sim.report.newton_iterations, 1)
    return {
        f"{tag}_wall_s": round(wall, 3),
        f"{tag}_newtons": newtons,
        f"{tag}_ms_per_newton": round(1000.0 * wall / newtons, 2),
        f"{tag}_substeps": sim.report.substeps,
        f"{tag}_failed_substeps": sim.report.failed_substeps,
    }


def bench_spe9():
    """SPE9 full 900-day schedule (the reference's SPE9 regression deck
    class): corner-point structured fast path + fused spans."""
    _maybe_cpu()
    import opm_tpu  # noqa: F401
    from opm_tpu.io.eclstate import load_case
    from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil

    case = load_case(SPE9)
    warm = SimulatorFullyImplicitBlackoil(case, fused=True)
    warm.run(report_step_limit=2)
    sim = SimulatorFullyImplicitBlackoil(case, fused=True)
    sim.solver = warm.solver
    t0 = time.perf_counter()
    sim.run()
    wall = time.perf_counter() - t0
    n = max(sim.report.newton_iterations, 1)
    return dict(
        spe9_e2e_wall_s=round(wall, 3),
        spe9_newtons=n,
        spe9_ms_per_newton=round(1000.0 * wall / n, 2),
        spe9_failed_substeps=sim.report.failed_substeps,
    )


def bench_norne():
    """Norne-class faulted corner-point synthetic (46x112x22, 75.6k active,
    stair-step faults + MULTFLT): the embedded-structured path
    (grid/grid.py _build_embedded_grid) — full schedule e2e + warm
    ms/Newton. The reference's Norne regression class
    (compareECLFiles.cmake:141-146; the real deck is licensed data)."""
    _maybe_cpu()
    import opm_tpu  # noqa: F401
    from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil
    from opm_tpu.sim.testcases import norne_like_case

    case = norne_like_case()
    warm = SimulatorFullyImplicitBlackoil(case, fused=True)
    warm.run(report_step_limit=2)
    sim = SimulatorFullyImplicitBlackoil(case, fused=True)
    sim.solver = warm.solver
    t0 = time.perf_counter()
    sim.run()
    wall = time.perf_counter() - t0
    n = max(sim.report.newton_iterations, 1)
    g = sim.grid
    return dict(
        norne_e2e_wall_s=round(wall, 3),
        norne_newtons=n,
        norne_ms_per_newton=round(1000.0 * wall / n, 2),
        norne_failed_substeps=sim.report.failed_substeps,
        norne_cells=int(g.n_real),
        norne_embedded=bool(g.active_mask is not None),
    )


def bench_spe10like_132k():
    _maybe_cpu()
    import opm_tpu  # noqa: F401
    from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil

    from opm_tpu.models.blackoil import make_well_device_arrays
    from opm_tpu.sim.init import initial_state
    from opm_tpu.sim.testcases import spe10like_case
    from opm_tpu.solver.newton import (LinearSolverProblem, NumericalIssue,
                                       SolverReport, TooManyIterations)

    case = spe10like_case(nx=60, ny=220, nz=10)
    sim = SimulatorFullyImplicitBlackoil(case)
    state = initial_state(sim.grid, sim.props, case, len(sim.well_names))
    ws = sim._pad_well_set(sim._well_set_for(sim.schedule.report_steps[0]))
    wd = make_well_device_arrays(ws, sim.grid.gravity)
    state = sim._init_well_state(state, ws, True)
    dt0 = 0.5 * 86400.0

    def try_step(s, dti):
        for _ in range(8):
            try:
                s2, rep = sim.solver.step_fused(s, dti, wd, SolverReport())
                return s2, rep, dti
            except (NumericalIssue, TooManyIterations, LinearSolverProblem):
                dti *= 0.33
        raise RuntimeError("no stable dt")

    state, rep, dt = try_step(state, dt0)     # warm-up/compile
    newtons = 0
    t0 = time.perf_counter()
    for _ in range(4):
        state, rep, dt = try_step(state, min(dt * 2, dt0))
        newtons += rep.iterations
    wall = time.perf_counter() - t0
    ms = 1000.0 * wall / max(newtons, 1)
    return dict(
        spe10_132k_ms_per_newton=round(ms, 1),
        spe10_132k_cell_newtons_per_s=round(sim.model.nc * newtons / wall),
    )


def bench_spe10_e2e():
    """Full multi-report-step SPE10-like schedule, wall-clock, with
    summary output ON (the BASELINE.md north-star protocol: e2e
    wall-clock, not warm per-Newton)."""
    _maybe_cpu()
    import tempfile

    import opm_tpu  # noqa: F401
    from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil
    from opm_tpu.sim.testcases import spe10like_case

    case = spe10like_case(nx=60, ny=220, nz=10, tsteps="20*30")
    warm = SimulatorFullyImplicitBlackoil(case, fused=True)
    warm.run(report_step_limit=2)

    sim = SimulatorFullyImplicitBlackoil(
        case, fused=True, output_dir=tempfile.mkdtemp(prefix="spe10e2e_"))
    sim.solver = warm.solver
    t0 = time.perf_counter()
    sim.run()
    wall = time.perf_counter() - t0
    newtons = max(sim.report.newton_iterations, 1)
    return dict(
        spe10_e2e_wall_s=round(wall, 3),
        spe10_e2e_days=600,
        spe10_e2e_newtons=newtons,
        spe10_e2e_ms_per_newton=round(1000.0 * wall / newtons, 1),
        spe10_e2e_cell_newtons_per_s=round(sim.model.nc * newtons / wall),
        spe10_e2e_failed_substeps=sim.report.failed_substeps,
    )


_PHASES = {
    "spe1": lambda: bench_spe1("spe1"),
    "spe1cpu": lambda: bench_spe1("spe1cpu"),
    "spe9": bench_spe9,
    "norne": bench_norne,
    "spe10": bench_spe10like_132k,
    "spe10e2e": bench_spe10_e2e,
}


def main():
    if "--phase" in sys.argv:
        phase = sys.argv[sys.argv.index("--phase") + 1]
        print(json.dumps(_PHASES[phase]()))
        return

    import subprocess

    def run_phase(name, timeout, cpu=False):
        env = dict(os.environ)
        if cpu:
            env["OPM_TPU_BENCH_CPU"] = "1"
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--phase", name],
                capture_output=True, text=True, timeout=timeout, env=env)
            lines = [ln for ln in r.stdout.splitlines()
                     if ln.startswith("{")]
            if lines:
                return json.loads(lines[-1])
            return {f"{name}_error":
                    (r.stderr.strip().splitlines() or ["no output"])[-1][:200]}
        except Exception as e:
            return {f"{name}_error": f"{type(e).__name__}: {e}"[:200]}

    out = {}
    out.update(run_phase("spe1", 2400))
    out.update(run_phase("spe1cpu", 2400, cpu=True))
    out.update(run_phase("spe9", 2400))
    # norne's 113k fused-substep program costs ~19 min to compile COLD
    # through the tunnel (~2-3 min executable reload warm)
    out.update(run_phase("norne", 3600))
    out.update(run_phase("spe10", 1800))
    out.update(run_phase("spe10e2e", 2400))

    tpu = out.get("spe1_wall_s")
    cpu = out.get("spe1cpu_wall_s")
    out["metric"] = "spe1_e2e_wall"
    out["value"] = tpu if tpu is not None else -1.0
    out["unit"] = "s"
    out["vs_baseline"] = (round(cpu / tpu, 3)
                          if tpu and cpu else 0.0)
    out["baseline"] = ("same-machine CPU run of this framework, measured "
                       "in this bench invocation (flow_legacy unbuildable "
                       "here and publishes no numbers — see BASELINE.md)")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
