"""On-chip roofline dissection ladder (r4 VERDICT item 3: itemize the
~39% of the headline VPU roofline the model leaves unexplained).

Each rung is a production fused pipeline (engine chunk provider, 256-iter
chunks, the same dispatch loop bench.py times) adding one op family to
the previous rung. For every rung we record the measured photon-steps/s,
the roofline model's op count, and the MARGINAL cost of the added family:

    marginal_op_time = (1/rate_k - 1/rate_{k-1}) / (ops_k - ops_{k-1})

against the v5e 1-op time of 1.3e-13 s (7.7e12 f32 ops/s). Families whose
marginal op runs well above 1 op-time are where the "missing" utilization
goes — multi-cycle hardware ops (PRNG draw, rsqrt, select chains), not
pipeline mystery.

Usage: python scripts/roofline_ladder.py   (real chip)
Prints one JSON line per rung + a final attribution summary.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

import numpy as np

N = 10_000_000


def build(kind):
    import physicl_tpu as phys
    import physicl_tpu.newton
    import physicl_tpu.light as light

    def b():
        s = phys.Simulation(exit=lambda c: c.t >= 1e9, seed=0)
        s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
        s.add_step(1, physicl_tpu.newton.NewtonianKinematicsStep())
        if kind == "kin":
            # delete with coef 0: the cheapest op carrying a PRNG draw +
            # kill select (no-op physics, so rung 1 isolates kin + 1 draw)
            s.add_step(2, light.ScatterDeleteStep(np.double(0.0),
                                                  np.double(0.0)))
        if kind in ("del", "del4"):
            s.add_step(2, light.ScatterDeleteStep(np.double(1e-12),
                                                  np.double(1e-3)))
        if kind == "del4":  # 3 more draws+selects: isolates the draw cost
            for i in range(3, 6):
                s.add_step(i, light.ScatterDeleteStep(np.double(1e-12),
                                                      np.double(1e-3)))
        if kind in ("iso", "iso_sign"):
            s.add_step(2, light.ScatterIsotropicStep(A=np.double(0.001),
                                                     n=np.double(0.001)))
        if kind == "iso_sign":
            s.add_step(3, light.ScatterSignMeasureStep(None, True))
        s.add_photons(light.generate_photon_state(N, E=1.0))
        return s

    return b


def main():
    import jax  # noqa: F401  (device init)
    import run_all as R

    rungs = ["kin", "del", "del4", "iso", "iso_sign"]
    rows = []
    for kind in rungs:
        rl = {}
        t0 = time.time()
        rate = R.steady_rate(build(kind), N, roofline=rl)
        row = {
            "rung": kind,
            "ps_per_s": float(f"{rate:.4g}"),
            "model_ops": rl.get("flops_per_photon_step"),
            "prng_draws": rl.get("prng_draws_per_photon_step"),
            "vpu_util": rl.get("vpu_util"),
            "case_s": round(time.time() - t0, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    one_op = 1.0 / 7.7e12
    for prev, cur in zip(rows, rows[1:]):
        d_ops = cur["model_ops"] - prev["model_ops"]
        d_t = 1.0 / cur["ps_per_s"] - 1.0 / prev["ps_per_s"]
        if d_ops > 0:
            print(json.dumps({
                "marginal": f"{prev['rung']}->{cur['rung']}",
                "added_model_ops": round(d_ops, 1),
                "added_draws": round(cur["prng_draws"]
                                     - prev["prng_draws"], 2),
                "ns_per_photon_step": round(d_t * 1e9, 4),
                "op_times_per_model_op": round(d_t / d_ops / one_op, 2),
            }), flush=True)
    base = rows[0]
    print(json.dumps({
        "floor": "kin+1draw rung",
        "ps_per_s": base["ps_per_s"],
        "model_ops": base["model_ops"],
        "op_times_per_model_op": round(
            (1.0 / base["ps_per_s"]) / base["model_ops"] / one_op, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
