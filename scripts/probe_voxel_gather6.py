"""On-chip probe #6: dynamic row-range walk for big voxel tables.

Probe #5 fixed the per-row walk cost at ~4.7e-12 s/element/row FLAT in S
— so a 64^3 uint8 codebook (514 rows) tops out at ~4.1e8 ps/s on a full
walk. The lever left is WALKING FEWER ROWS: per iteration, reduce the
tile's needed segment range [lo, hi] (2 reductions) and fori_loop over
just that range with a dynamic tab_ref row read. Correct for ANY
population (the range covers every lane by construction); fast whenever
a tile's photons cluster in flat-index space, which is the CT-beam
geometry the 64^3 bar is about.

Cases (all production-shaped: outer lax.fori_loop over k iterations):
  static    full static walk (probe-5 baseline), S in {64, 512}
  dynfull   fori(lo, hi+1) walk, indices UNIFORM over the table (worst
            case: range ~= full table) — measures dynamic-read overhead
  dynloc    same walk, indices CLUSTERED in a 2-row band that drifts per
            iteration (the beam case) — measures the locality win
  dyncl512  clustered at S=512 (the 64^3 shape)

Exactness asserted vs NumPy on the k=2 legs.
Usage: python scripts/probe_voxel_gather6.py
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


def _mk_kernel(scheme, s_tab, vmask, k_iters, band):
    clustered = scheme.startswith("dynloc") or scheme.startswith("dyncl")
    dyn = scheme != "static"

    def evolve(idx, k):
        nidx = (idx * jnp.int32(LCG_A) + jnp.int32(LCG_C)) \
            & jnp.int32(vmask)
        if clustered:
            # confine to a `band`-row window whose base drifts with k
            base = ((k * jnp.int32(37)) % jnp.int32(max(s_tab - band, 1))) \
                * jnp.int32(128)
            nidx = base + (nidx & jnp.int32(band * 128 - 1))
        return nidx

    def kernel(tab_ref, idx_ref, out_ref):
        shape = idx_ref[0].shape

        def body(k, carry):
            acc, idx = carry
            seg_of = idx >> jnp.int32(7)
            loc = idx & jnp.int32(127)
            if dyn:
                lo = jnp.min(seg_of)
                hi = jnp.max(seg_of)

                def row(s, a):
                    seg = jnp.broadcast_to(tab_ref[pl.ds(s, 1), :], shape)
                    got = jnp.take_along_axis(seg, loc, axis=1)
                    return jnp.where(seg_of == s, got, a)

                w = jax.lax.fori_loop(lo, hi + 1, row,
                                      jnp.zeros(shape, jnp.int32))
            else:
                w = jnp.zeros(shape, jnp.int32)
                for s in range(s_tab):
                    seg = jnp.broadcast_to(tab_ref[s:s + 1, :], shape)
                    got = jnp.take_along_axis(seg, loc, axis=1)
                    w = jnp.where(seg_of == jnp.int32(s), got, w)
            acc = acc + w.astype(jnp.float32)
            return acc, evolve(idx, k)

        acc, _ = jax.lax.fori_loop(
            0, k_iters, body,
            (jnp.zeros(shape, jnp.float32), idx_ref[0]))
        out_ref[0] = acc

    return kernel


def _oracle(scheme, tab, idx0, vmask, s_tab, band, k_iters):
    clustered = scheme.startswith("dynloc") or scheme.startswith("dyncl")
    idx = idx0.astype(np.int64)
    acc = np.zeros(idx.shape, np.float64)
    flat_tab = np.asarray(tab).reshape(-1).astype(np.int64)
    for k in range(k_iters):
        acc += flat_tab[idx]
        idx = (idx * LCG_A + LCG_C) & 0xFFFFFFFF
        idx = np.where(idx >= 2 ** 31, idx - 2 ** 32, idx) & vmask
        if clustered:
            base = ((k * 37) % max(s_tab - band, 1)) * 128
            idx = base + (idx & (band * 128 - 1))
    return acc


def run_case(scheme, s_tab, k_iters, tiles, rng, band=2):
    tab = jnp.asarray(rng.integers(0, 1000, (s_tab, 128)).astype(np.int32))
    v_lookup = s_tab * 128
    vmask = v_lookup - 1
    if scheme.startswith(("dynloc", "dyncl")):
        idx0 = rng.integers(0, band * 128, (tiles, TILE, LANE)) \
            .astype(np.int32)
    else:
        idx0 = rng.integers(0, v_lookup, (tiles, TILE, LANE)) \
            .astype(np.int32)
    kernel = _mk_kernel(scheme, s_tab, vmask, k_iters, band)
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
    if k_iters <= 3:
        want = _oracle(scheme, tab, idx0, vmask, s_tab, band, k_iters)
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
            "wall_ms": round(dt * 1e3, 3), "compile_s": round(compile_s, 2)}


def main():
    rng = np.random.default_rng(42)
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)
    tiles = 64
    cases = [
        ("static", 64, 2), ("static", 64, 870),
        ("dynfull", 64, 2), ("dynfull", 64, 870),
        ("dynloc", 64, 2), ("dynloc", 64, 8000),
        ("dynfull", 512, 2), ("dynfull", 512, 110),
        ("dyncl512", 512, 2), ("dyncl512", 512, 8000),
    ]
    for scheme, s_tab, k in cases:
        try:
            res = run_case(scheme, s_tab, k, tiles, rng)
        except Exception as e:  # noqa: BLE001
            res = {"scheme": scheme, "S": s_tab, "k": k,
                   "error": repr(e)[:160]}
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
