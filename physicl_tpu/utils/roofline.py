"""Hardware-utilization accounting for fused transport kernels.

The reference ships no performance model at all (BASELINE.md: every number
is reverse-engineered from notebook wall-clocks); "matching or beating" a
machine needs a ceiling to measure against, not just a baseline. This
module derives a flops+bytes model for one fused-kernel iteration by
TRACING the kernel's own op pipeline (``ops.fused._emit_iteration`` — the
same code both the Mosaic kernel and the CPU twin execute) to a jaxpr and
counting primitive work, then positions a measured photon-steps/s rate
against the chip's VPU and HBM roofs.

The count is a *model*, documented conservative choices:

* element-wise primitives cost 1 VPU op per output element;
  divides/sqrts 4 (reciprocal-iteration expansions); true
  transcendentals (exp/log/sin/cos/...) 8 — the fused kernels avoid them
  (fast_trig polynomials), so this term is usually zero;
* hardware PRNG draws cost 4 ops per element (prng_random_bits + the
  bits->unit float conversion); the traced hash-PRNG twin is NOT counted
  (the Mosaic kernel uses the hardware generator);
* pure data movement (broadcast/reshape/slice/select-index bookkeeping)
  counts 0 — VMEM-resident relayouts overlap ALU work;
* in-VMEM table gathers (voxel media) cost 2 ops per element per segment
  via their take_along_axis/select expansion, which the jaxpr count
  captures directly on the generic form (1 gather) — an underestimate for
  multi-segment fused tables (documented in docs/performance.md).

HBM bytes per chunk are exact from the plan: the packed state crosses
HBM->VMEM once and back once per chunk (the whole point of the fused
design), plus record rows and stream planes.

Peaks (``PEAKS``) are per-chip, from public TPU v5e specs: 819 GB/s HBM
bandwidth; VPU f32 peak = 8x128 vector lanes x 4 ALUs x 1 FMA/cycle
(counted as 2 ops, matching the model's separate mul/add counting) x
~0.94 GHz ~= 7.7e12 ops/s. Unknown device kinds report utilizations as
None rather than against a guessed roof.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PEAKS", "iteration_cost", "roofline_report"]

# per-chip peaks: (vpu_f32_ops_per_s, hbm_bytes_per_s)
PEAKS = {
    # TPU v5 lite (v5e): VPU is an (8, 128) vector unit with 4 ALUs per
    # lane-slot at ~0.94 GHz; each ALU issues one FMA/cycle, counted as
    # 2 ops to match the model's separate mul/add counting =>
    # 8*128*4*2*0.94e9 ~= 7.7e12 ops/s. HBM2E: 819 GB/s (public v5e spec).
    "TPU v5 lite": (7.7e12, 819e9),
    "TPU v5e": (7.7e12, 819e9),
}

_ELEMENTWISE_1 = {
    "add", "sub", "mul", "max", "min", "and", "or", "xor", "not", "neg",
    "abs", "sign", "floor", "ceil", "round", "eq", "ne", "lt", "le", "gt",
    "ge", "select_n", "convert_element_type", "shift_left",
    "shift_right_logical", "shift_right_arithmetic", "clamp",
    "integer_pow", "is_finite", "rem", "nextafter", "population_count",
}
_EXPENSIVE_4 = {"div", "sqrt", "rsqrt"}
_TRANSCENDENTAL_8 = {"exp", "log", "log1p", "expm1", "sin", "cos", "tan",
                     "atan2", "pow", "erf", "erf_inv", "logistic", "tanh",
                     "cbrt", "asin", "acos", "atan", "sinh", "cosh"}
_FREE = {"broadcast_in_dim", "reshape", "squeeze", "transpose", "slice",
         "concatenate", "iota", "copy", "stop_gradient", "bitcast_convert_type",
         "dynamic_slice", "dynamic_update_slice", "pad", "rev",
         "expand_dims"}

_PRNG_OPS_PER_ELEMENT = 4  # prng_random_bits + bits->unit conversion


def _size(aval) -> int:
    return int(np.prod(aval.shape)) if aval.shape else 1


def _count_jaxpr(jaxpr) -> dict:
    """Walk a (closed) jaxpr counting modeled VPU ops. Control-flow
    bodies (while/scan/cond) are counted ONCE — their trip count is not
    statically recoverable — so ``uncounted_loop_bodies`` flags any such
    body: callers must treat utilizations as unreliable when it is
    nonzero (the fused iteration bodies are loop-free by design; the
    r4b on-chip runs showed loop forms are slower anyway)."""
    c = {"vpu_ops": 0.0, "transcendentals": 0.0, "gather_elems": 0.0,
         "reduce_elems": 0.0, "uncounted_loop_bodies": 0.0}
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        out_sz = max((_size(v.aval) for v in eqn.outvars), default=1)
        in_sz = max((_size(v.aval) for v in eqn.invars
                     if hasattr(v, "aval")), default=1)
        if prim in _FREE:
            continue
        if prim in _ELEMENTWISE_1:
            c["vpu_ops"] += out_sz
        elif prim in _EXPENSIVE_4:
            c["vpu_ops"] += 4 * out_sz
        elif prim in _TRANSCENDENTAL_8:
            c["vpu_ops"] += 8 * out_sz
            c["transcendentals"] += out_sz
        elif prim in ("reduce_sum", "reduce_max", "reduce_min", "reduce_and",
                      "reduce_or", "argmax", "argmin", "reduce_precision"):
            c["vpu_ops"] += in_sz
            c["reduce_elems"] += in_sz
        elif prim in ("gather", "take_along_axis", "dynamic_gather"):
            c["vpu_ops"] += 2 * out_sz
            c["gather_elems"] += out_sz
        elif prim in ("scan", "while", "cond", "custom_jvp_call",
                      "custom_vjp_call", "pjit", "closed_call",
                      "remat", "checkpoint"):
            if prim in ("scan", "while"):
                c["uncounted_loop_bodies"] += 1
            for sub in eqn.params.values():
                sub_jaxprs = []
                if hasattr(sub, "jaxpr"):
                    sub_jaxprs = [sub.jaxpr]
                elif isinstance(sub, (list, tuple)):
                    sub_jaxprs = [s.jaxpr for s in sub if hasattr(s, "jaxpr")]
                for sj in sub_jaxprs:
                    inner = _count_jaxpr(sj)
                    for k in c:
                        c[k] += inner[k]
        else:
            # unknown primitive: assume element-wise cost so the model
            # fails toward OVERstating work (never inflates utilization)
            c["vpu_ops"] += out_sz
    return c


class _CountingRng:
    """Trace stub standing in for the kernel's hardware PRNG: returns
    valid tracers at zero jaxpr cost and tallies draw elements, which are
    charged at the hardware generator's modeled rate afterwards. Mirrors
    the full ``_Rng`` surface including the ``salt`` kwarg (unused by the
    current static-unroll samplers; kept so any future salted call site
    cannot crash the model)."""

    def __init__(self):
        self.draw_elems = 0

    def bits(self, shape, salt=None):
        self.draw_elems += int(np.prod(shape))
        return jnp.zeros(shape, jnp.int32)

    def uniform(self, shape, salt=None):
        self.draw_elems += int(np.prod(shape))
        return jnp.full(shape, 0.5, jnp.float32)

    def uniform_pair(self, shape, salt=None):
        # one 32-bit draw yields both angles (plan.packed_angles)
        self.draw_elems += int(np.prod(shape))
        return (jnp.full(shape, 0.5, jnp.float32),
                jnp.full(shape, 0.5, jnp.float32))

    def _hash_bits(self, shape, salt=None):
        return self.bits(shape)


def iteration_cost(plan, capacity: int) -> dict:
    """Modeled per-iteration cost of one fused chunk iteration over the
    WHOLE population: VPU ops, transcendental count, PRNG draw elements,
    and the per-chunk HBM byte traffic."""
    from physicl_tpu.ops import fused as F

    rows = capacity // F._LANE
    nf = F._NF + len(plan.extras)
    rng = _CountingRng()
    gidx = jnp.zeros((rows, F._LANE), jnp.int32)
    emit_ref = jnp.zeros((max(1, sum(1 for op in plan.ops
                                     if op.kind == "emit")),
                          plan.chunk), jnp.int32)

    def one(fields_flat, k, dt, t0, t1, t2, t3):
        fields = list(fields_flat)
        fields, row, row_f, stream = F._emit_iteration(
            plan, k, dt, fields, rng, emit_ref, gidx, t=(t0, t1, t2, t3))
        return tuple(fields), row, row_f, tuple(stream or ())

    fields0 = tuple(jnp.zeros((rows, F._LANE), jnp.float32)
                    for _ in range(nf))
    jaxpr = jax.make_jaxpr(one)(
        fields0, jnp.int32(0), jnp.float32(1e-3), jnp.float32(0.0),
        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0))
    counts = _count_jaxpr(jaxpr.jaxpr)
    counts["vpu_ops"] += _PRNG_OPS_PER_ELEMENT * rng.draw_elems
    counts["prng_draw_elems"] = rng.draw_elems
    n = capacity
    counts["vpu_ops_per_particle"] = counts["vpu_ops"] / n

    # HBM bytes per CHUNK (state crosses once each way; records + streams)
    state_bytes = 2 * nf * capacity * 4
    rec_bytes = 2 * plan.chunk * F._MAX_REC_COLS * 4 * 2  # int + float rows
    s_every = max(1, int(plan.stream_every))
    stream_itemsize = 2 if plan.stream_dtype == "bfloat16" else 4
    stream_bytes = ((-(-plan.chunk // s_every)) * plan.n_stream
                    * capacity * stream_itemsize if plan.n_stream else 0)
    counts["hbm_bytes_per_chunk"] = state_bytes + rec_bytes + stream_bytes
    counts["chunk"] = plan.chunk
    counts["capacity"] = capacity
    return counts


def device_peaks(device=None) -> Optional[tuple]:
    """(vpu_f32_ops/s, hbm_bytes/s) for the attached chip, or None."""
    if device is None:
        try:
            device = jax.devices()[0]
        except Exception:
            return None
    kind = getattr(device, "device_kind", "")
    for key, peaks in PEAKS.items():
        if kind.startswith(key):
            return peaks
    return None


def roofline_report(plan, capacity: int, photon_steps_per_s: float,
                    device=None) -> dict:
    """Position a measured rate against the chip roofs.

    Returns ``vpu_util`` / ``hbm_util`` in [0, ~1] (None when the device
    kind has no table entry) plus the model terms, for bench.py's JSON
    and RESULTS.md."""
    cost = iteration_cost(plan, capacity)
    iters_per_s = photon_steps_per_s / capacity
    vpu_ops_per_s = cost["vpu_ops"] * iters_per_s
    hbm_bytes_per_s = (cost["hbm_bytes_per_chunk"] / cost["chunk"]
                       * iters_per_s)
    peaks = device_peaks(device)
    out = {
        "flops_per_photon_step": round(cost["vpu_ops_per_particle"], 2),
        "prng_draws_per_photon_step": round(
            cost["prng_draw_elems"] / capacity, 2),
        "model_vpu_ops_per_s": vpu_ops_per_s,
        "model_hbm_bytes_per_s": hbm_bytes_per_s,
    }
    if cost["uncounted_loop_bodies"]:
        # a lax while/scan inside the iteration body: its trip count is
        # invisible to the jaxpr walk, so the op count is a lower bound —
        # refuse to publish a utilization built on it
        out["vpu_util"] = None
        out["hbm_util"] = None
        out["uncounted_loop_bodies"] = int(cost["uncounted_loop_bodies"])
    elif peaks is not None:
        vpu_peak, hbm_peak = peaks
        out["vpu_util"] = round(vpu_ops_per_s / vpu_peak, 4)
        out["hbm_util"] = round(hbm_bytes_per_s / hbm_peak, 4)
        out["vpu_peak_ops_per_s"] = vpu_peak
        out["hbm_peak_bytes_per_s"] = hbm_peak
    else:
        out["vpu_util"] = None
        out["hbm_util"] = None
    return out
