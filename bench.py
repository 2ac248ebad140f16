"""Headline benchmark: sustained photon-steps/s/chip at 1e7 photons.

Workload: the BASELINE "spherical scattering transport" config — Euler
kinematics + isotropic scatter (pcoll = A*n*|dr|, angle-uniform resample,
reference statistics) + per-iteration sign measurement — on 10,000,000
photons, run through the fused multi-iteration Pallas pipeline exactly as the
engine dispatches it.

Baseline: the reference's observed isotropic-scatter throughput of
~2.0e4 photon-steps/s (10k photons on the author's OpenCL workstation,
BASELINE.md row 1). Prints ONE JSON line.

Methodology: steady-state chunk rate. One warmup chunk (includes XLA/Mosaic
compile), then R timed chunks chained back-to-back, synchronized by a
device->host copy of the final chunk's records and state slice (the axon
relay's block_until_ready can signal early; a D2H copy cannot).
"""

import json
import time

import numpy as np


def main():
    import jax

    import physicl_tpu as phys
    import physicl_tpu.newton
    import physicl_tpu.light as light
    from physicl_tpu.ops.pipeline import try_build_fused
    from physicl_tpu.state import SimState

    N = 10_000_000
    K = 1024
    REPS = 4

    sim = phys.Simulation(exit=lambda c: c.t >= 1e9, seed=0, chunk_steps=K)
    sim.add_step(0, phys.UpdateTimeStep(lambda s: np.double(0.001)))
    sim.add_step(1, physicl_tpu.newton.NewtonianKinematicsStep())
    sim.add_step(2, light.ScatterIsotropicStep(A=np.double(0.001),
                                               n=np.double(0.001)))
    sim.add_step(3, light.ScatterSignMeasureStep(None, True))
    sim.add_photons(light.generate_photon_state(N, E=1.0))

    state = SimState.from_population([], sim._pending_bulk)
    steps = sim._ordered_steps()
    for s in steps:
        s.setup(sim)
    provider = try_build_fused(sim, steps, state)
    used_fused = provider is not None
    if provider is None:
        # A fusability regression must be VISIBLE in BENCH_r*.json (as a much
        # lower, "fused": false number), not kill the benchmark.
        chunk_fn = sim._build_chunk_fn(
            steps, lambda view: sim.exit(view), K, state)

        def provider(st):
            st, done, records, valid = chunk_fn(st)
            return st, done, jax.device_get(records), valid

    # Warmup (compile + relay pipeline fill) + hard sync via D2H.
    pipelined = hasattr(provider, "dispatch")
    for _ in range(2):
        state, done, records, valid = provider(state)
    _ = np.asarray(jax.device_get(state.r[0, :8]))

    def window(state):
        """One timed window of REPS chunks; returns (rate, last records,
        final state)."""
        t0 = time.perf_counter()
        if pipelined:
            # exactly the engine's dispatch loop: keep two chunks in flight,
            # fetch the oldest's records while the others execute
            # (engine._drive_fused, fused_pipeline_depth=2)
            from collections import deque
            pending = deque()
            for _ in range(REPS):
                h = provider.dispatch(state)
                state = h.state
                pending.append(h)
                while len(pending) > 2:
                    _, _, records, n_valid, _ = provider.harvest(
                        pending.popleft())
            while pending:
                _, _, records, n_valid, _ = provider.harvest(pending.popleft())
        else:
            for _ in range(REPS):
                state, done, records, valid = provider(state)
        _ = np.asarray(jax.device_get(state.r[0, :8]))
        dt = (time.perf_counter() - t0) / REPS
        return N * K / dt, records, state

    # The dev relay intermittently stalls for tens of seconds (observed
    # 100-400 s dead windows unrelated to device work); a stall inside a
    # single timed window would misreport the chip's steady-state rate by
    # orders of magnitude. Run 3 windows and report the MEDIAN — robust to
    # one stalled window without the upward bias of best-of-N (advisor
    # finding); the raw windows and the max ride along for diagnosis.
    rates = []
    for w in range(3):
        rate, records, state = window(state)
        rates.append(rate)
    value = float(np.median(rates))
    # the records fetch is inside each timed chunk (pipelined, like the
    # engine's real per-chunk host work), so this is an honest engine rate

    # Physics sanity inline: +x share must follow 0.5+0.5*(1-pcoll)^k.
    shares = records["s3/signs"][:, 0] / np.maximum(records["s3/n"], 1)
    pcoll = 0.001 * 0.001 * float(light.c) * 0.001
    k0 = (2 + 3 * REPS - 1) * K + 1  # first iteration of the LAST chunk
    expect = 0.5 + 0.5 * (1 - pcoll) ** np.arange(k0, k0 + K)
    parity_err = float(np.abs(shares - expect).max())
    assert parity_err < 0.02, f"scatter parity broken: {parity_err}"

    baseline = 2.0e4  # BASELINE.md: reference isotropic scatter, OpenCL
    out = {
        "metric": "photon_steps_per_sec_per_chip_at_1e7_isotropic_scatter",
        "value": round(value, 1),
        "unit": "photon-steps/s",
        "vs_baseline": round(value / baseline, 1),
        "fused": used_fused,
        "max": round(max(rates), 1),
        # all three window rates, so a stall (one window orders of
        # magnitude low) is distinguishable from run-to-run spread
        "windows": [round(r, 1) for r in rates],
    }
    if used_fused:
        # hardware-utilization accounting (VERDICT r3 weak #3): position
        # the measured rate against the chip's VPU/HBM roofs via the
        # jaxpr-derived flops+bytes model (utils/roofline.py)
        from physicl_tpu.utils.roofline import roofline_report

        rep = roofline_report(provider.plan, state.capacity, value)
        out["flops_per_photon_step"] = rep["flops_per_photon_step"]
        out["vpu_util"] = rep["vpu_util"]
        out["hbm_util"] = rep["hbm_util"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
