"""On-chip probe #5: production-shaped per-row walk cost. Probe #4's
walls were dominated by a ~30 ms relay round-trip constant (2x the terms
moved walls +12%), and its static-unroll compile failures were confounded
by repeating the walk per PYTHON k-loop (sites = S * k). The real kernel
wraps iterations in lax.fori_loop with the walk appearing ONCE per body
(unroll gate clamps U=1 for big tables), so compile sites = S and the
iteration count is free.

Cases (idx evolves per iteration by LCG; exactness asserted vs NumPy):
  pk4s[S]   packed-uint8 int32 walk, static select chain of S rows inside
            the fori body, final byte extract (production codebook shape)
  f32s[64]  plain f32 walk at today's 8192-entry cap (production f32
            shape, cross-checks the known 16^3-voxel end-to-end rate)
  alu       pure ALU chain (VPU ceiling in this loop shape)

Walls target >= 200 ms so the relay constant is < 15% of the signal.
Usage: python scripts/probe_voxel_gather5.py
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256
LANE = 128
LCG_A = 1103515245
LCG_C = 12345


def _walk(tab_ref, flat, shape, n_seg, dtype=jnp.int32):
    seg_of = flat >> jnp.int32(7)
    loc = flat & jnp.int32(127)
    out = jnp.zeros(shape, dtype)
    for s in range(n_seg):
        seg = jnp.broadcast_to(tab_ref[s:s + 1, :], shape)
        got = jnp.take_along_axis(seg, loc, axis=1)
        out = jnp.where(seg_of == jnp.int32(s), got, out)
    return out


def _mk_kernel(scheme, s_tab, vmask, k_iters):
    def kernel(tab_ref, idx_ref, out_ref):
        shape = idx_ref[0].shape

        def body(_, carry):
            acc, idx = carry
            if scheme == "pk4s":
                word = _walk(tab_ref, idx >> jnp.int32(2), shape, s_tab)
                byte = (word >> ((idx & jnp.int32(3)) * jnp.int32(8))) \
                    & jnp.int32(255)
                acc = acc + byte.astype(jnp.float32)
            elif scheme == "f32s":
                w = _walk(tab_ref, idx, shape, s_tab)
                acc = acc + jax.lax.bitcast_convert_type(w, jnp.float32)
            elif scheme == "alu":
                acc = acc + (idx * idx + jnp.int32(3)).astype(jnp.float32)
            idx = (idx * jnp.int32(LCG_A) + jnp.int32(LCG_C)) \
                & jnp.int32(vmask)
            return acc, idx

        acc, _ = jax.lax.fori_loop(
            0, k_iters, body,
            (jnp.zeros(shape, jnp.float32), idx_ref[0]))
        out_ref[0] = acc

    return kernel


def _oracle(scheme, tab, idx0, vmask, k_iters):
    idx = idx0.astype(np.int64)
    acc = np.zeros(idx.shape, np.float64)
    flat_tab = np.asarray(tab).reshape(-1)
    for _ in range(k_iters):
        if scheme == "pk4s":
            word = flat_tab.astype(np.int64)[idx >> 2]
            acc += (word >> ((idx & 3) * 8)) & 255
        elif scheme == "f32s":
            acc += flat_tab.view(np.float32).astype(np.float64)[idx]
        else:
            w = (idx * idx + 3) & 0xFFFFFFFF
            w = np.where(w >= 2 ** 31, w - 2 ** 32, w)
            acc += w
        idx = (idx * LCG_A + LCG_C) & 0xFFFFFFFF
        idx = (np.where(idx >= 2 ** 31, idx - 2 ** 32, idx) & vmask)
    return acc


def run_case(scheme, s_tab, k_iters, tiles, rng):
    if scheme == "pk4s":
        words = rng.integers(0, 2 ** 32, s_tab * 128, dtype=np.uint64)
        tab = jnp.asarray(words.astype(np.uint32).view(np.int32)
                          .reshape(s_tab, 128))
        v_lookup = s_tab * 512
    else:
        tab = jnp.asarray(
            rng.random((s_tab, 128)).astype(np.float32)
            .view(np.int32))
        v_lookup = s_tab * 128
    vmask = v_lookup - 1
    idx0 = rng.integers(0, v_lookup, (tiles, TILE, LANE)).astype(np.int32)
    kernel = _mk_kernel(scheme, s_tab, vmask, k_iters)
    grid_spec = pl.GridSpec(
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, LANE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((tiles, TILE, LANE), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(tab, idx)

    idx_dev = jnp.asarray(idx0)
    t0 = time.perf_counter()
    got = np.asarray(run(tab, idx_dev))
    compile_s = time.perf_counter() - t0
    want = _oracle(scheme, tab, idx0, vmask, min(k_iters, 3))
    if k_iters <= 3:
        err = float(np.abs(got.astype(np.float64) - want).max())
        assert err == 0.0, f"{scheme} S={s_tab}: max err {err}"
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run(tab, idx_dev).block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    el = tiles * TILE * LANE
    return {"scheme": scheme, "S": s_tab, "k": k_iters, "tiles": tiles,
            "eval_per_s": float(f"{el * k_iters / dt:.4g}"),
            "terms_per_s": float(f"{el * k_iters * s_tab / dt:.4g}"),
            "wall_ms": round(dt * 1e3, 3), "compile_s": round(compile_s, 2)}


def main():
    rng = np.random.default_rng(42)
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)
    tiles = 64
    el = tiles * TILE * LANE
    cases = []
    for s in (16, 64, 128, 256, 512):
        # correctness leg (tiny k) + timing leg (wall ~250 ms at the
        # production-observed 4.5e-12 s/term; floor k at 8)
        k_time = max(8, int(0.25 / (el * s * 4.5e-12)))
        cases += [("pk4s", s, 2), ("pk4s", s, k_time)]
    cases += [("f32s", 64, 2), ("f32s", 64, 870),
              ("alu", 1, 2), ("alu", 1, 60000)]
    for scheme, s_tab, k in cases:
        try:
            res = run_case(scheme, s_tab, k, tiles, rng)
        except Exception as e:  # noqa: BLE001
            res = {"scheme": scheme, "S": s_tab, "k": k,
                   "error": repr(e)[:160]}
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
