"""On-chip microbenchmark of in-kernel voxel-table lookup schemes (round 5).

The fused kernel's voxel-media lookup is a segmented lane-gather walk over a
(V/128, 128) VMEM table (ops/fused._vmem_table_lookup). Measured round-4: the
walk runs at ~0.13 effective VPU utilization, so 64^3 grids (2048 segments)
would land ~2e8 photon-steps/s — under the >=1e9 bar. This probe measures the
candidate replacements directly on hardware:

  base    loop + LCG index update only (overhead floor)
  f32sel  current walk: broadcast + lane gather + cmp + select chain
  f32fma  same walk, mask-multiply-accumulate (breaks the serial select dep)
  i8fma   packed int8 material ids: 4 entries/lane -> V/512 segments, then a
          one-segment id->value map (exact for grids with <=128 distinct
          values; CT phantoms always qualify)
  i4fma   packed int4 ids: 8 entries/lane -> V/1024 segments (<=16 materials)
  gather  isolated lane-gather throughput (single pre-broadcast segment)
  bcast   isolated sublane-broadcast throughput
  shiftv  isolated variable-shift + mask throughput
  e1      feasibility: take_along_axis((8,128) src, (256,128) idx, axis=0)
          (single-vreg sublane gather with multi-vreg indices)

Usage: python scripts/probe_voxel_gather.py [--quick]
Prints one JSON line per case; correctness is asserted against a NumPy oracle.
"""
import argparse
import functools
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


def _lcg(idx, vmask):
    return (idx * jnp.int32(LCG_A) + jnp.int32(LCG_C)) & jnp.int32(vmask)


def _walk_f32(tab_ref, flat, fma):
    segs = tab_ref.shape[0]
    out = jnp.zeros(flat.shape, jnp.float32)
    seg_of = flat >> jnp.int32(7)
    loc = flat & jnp.int32(127)
    for s in range(segs):
        seg = jnp.broadcast_to(tab_ref[s:s + 1, :], flat.shape)
        got = jnp.take_along_axis(seg, loc, axis=1)
        if fma:
            out = out + got * (seg_of == jnp.int32(s)).astype(jnp.float32)
        else:
            out = jnp.where(seg_of == jnp.int32(s), got, out)
    return out


def _walk_packed(tab_ref, map_ref, flat, bits):
    """Packed-id walk: `bits`-wide ids, 32/bits per int32 lane.

    Entry v lives at segment v // (128*per), lane (v % (128*per)) // per,
    sub-position v % per (per = 32 // bits). The id -> value map is a single
    128-entry lane gather (materials <= 128).
    """
    per = 32 // bits                      # ids per int32 lane
    seg_entries = 128 * per
    segs = tab_ref.shape[0]
    seg_of = flat // jnp.int32(seg_entries)
    loc = (flat % jnp.int32(seg_entries)) // jnp.int32(per)
    shift = (flat % jnp.int32(per)) * jnp.int32(bits)
    idmask = jnp.int32((1 << bits) - 1)
    mid = jnp.zeros(flat.shape, jnp.int32)
    for s in range(segs):
        seg = jnp.broadcast_to(tab_ref[s:s + 1, :], flat.shape)
        got = jnp.take_along_axis(seg, loc, axis=1)
        byte = jax.lax.shift_right_logical(got, shift) & idmask
        mid = mid + byte * (seg_of == jnp.int32(s)).astype(jnp.int32)
    mseg = jnp.broadcast_to(map_ref[0:1, :], flat.shape)
    return jnp.take_along_axis(mseg, mid, axis=1)


def _mk_kernel(scheme, vmask, k_loops):
    def kernel(tab_ref, map_ref, idx_ref, out_ref):
        idx = idx_ref[0]  # (TILE, LANE): Mosaic gathers are 2-D only
        acc = jnp.zeros(idx.shape, jnp.float32)
        for _ in range(k_loops):
            if scheme == "base":
                acc = acc + idx.astype(jnp.float32)
            elif scheme == "f32sel":
                acc = acc + _walk_f32(tab_ref, idx, fma=False)
            elif scheme == "f32fma":
                acc = acc + _walk_f32(tab_ref, idx, fma=True)
            elif scheme == "i8fma":
                acc = acc + _walk_packed(tab_ref, map_ref, idx, bits=8)
            elif scheme == "i4fma":
                acc = acc + _walk_packed(tab_ref, map_ref, idx, bits=4)
            elif scheme == "gather":
                seg = jnp.broadcast_to(tab_ref[0:1, :], idx.shape)
                acc = acc + jnp.take_along_axis(
                    seg, idx & jnp.int32(127), axis=1)
            elif scheme == "bcast":
                # broadcast a row whose position depends on idx's first
                # element is not expressible; sweep rows statically
                for s in range(min(8, tab_ref.shape[0])):
                    acc = acc + jnp.broadcast_to(
                        tab_ref[s:s + 1, :], idx.shape)
            elif scheme == "shiftv":
                sh = (idx & jnp.int32(3)) * jnp.int32(8)
                acc = acc + (jax.lax.shift_right_logical(idx, sh)
                             & jnp.int32(255)).astype(jnp.float32)
            else:
                raise ValueError(scheme)
            idx = _lcg(idx, vmask)
        out_ref[0] = acc

    return kernel


def _pack_ids(ids, bits):
    per = 32 // bits
    n = ids.size
    segs = -(-n // (128 * per))
    pad = np.zeros(segs * 128 * per, np.int64)
    pad[:n] = ids
    pad = pad.reshape(segs, 128, per)
    word = np.zeros((segs, 128), np.int64)
    for b in range(per):
        word |= pad[:, :, b] << (bits * b)
    # int64 -> int32 bit-preserving
    return jnp.asarray(word.astype(np.uint32).view(np.int32).
                       reshape(segs, 128))


def run_case(scheme, V, k_loops, tiles, repeats, rng):
    vmask = V - 1
    n_mat = 16 if scheme == "i4fma" else 128
    ids = rng.integers(0, n_mat, V)
    values = rng.random(n_mat).astype(np.float32)
    fullmap = np.zeros(128, np.float32)
    fullmap[:n_mat] = values
    tab_f32_np = values[ids]
    if scheme in ("i8fma", "i4fma"):
        tab = _pack_ids(ids, 8 if scheme == "i8fma" else 4)
    else:
        segs = V // 128
        tab = jnp.asarray(tab_f32_np.reshape(segs, 128))
    map_arr = jnp.asarray(fullmap.reshape(1, 128))

    idx0 = rng.integers(0, V, (tiles, TILE, LANE)).astype(np.int32)
    kernel = _mk_kernel(scheme, vmask, k_loops)

    grid_spec = pl.GridSpec(
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, LANE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    @jax.jit
    def run(tab, map_arr, idx):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((tiles, TILE, LANE), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(tab, map_arr, idx)

    idx_dev = jnp.asarray(idx0)
    t0 = time.perf_counter()
    out = run(tab, map_arr, idx_dev)
    out.block_until_ready()
    compile_s = time.perf_counter() - t0

    # correctness oracle on one tile
    if scheme not in ("base", "bcast", "shiftv", "gather"):
        idx = idx0[0].astype(np.int64)
        acc = np.zeros_like(idx, np.float32)
        for _ in range(k_loops):
            acc = acc + tab_f32_np[idx]
            idx = (idx * LCG_A + LCG_C) & vmask
        got = np.asarray(out[0])
        if not np.allclose(got, acc, rtol=1e-5, atol=1e-5):
            bad = np.abs(got - acc).max()
            raise AssertionError(f"{scheme} V={V}: max err {bad}")

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run(tab, map_arr, idx_dev).block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    photons = tiles * TILE * LANE
    lookups = photons * k_loops
    return {
        "scheme": scheme, "V": V, "k_loops": k_loops,
        "ns_per_lookup": dt / lookups * 1e9,
        "lookups_per_s": lookups / dt,
        "wall_ms": dt * 1e3, "compile_s": round(compile_s, 2),
    }


def probe_e1():
    """Feasibility: sublane gather, single-vreg source, multi-vreg indices."""
    def kernel(src_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(src_ref[...], idx_ref[...], axis=0)

    src = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, 8, (TILE, LANE)).astype(np.int32))
    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TILE, LANE), jnp.float32),
        )(src, idx)
        out.block_until_ready()
        expect = np.asarray(src)[np.asarray(idx), np.arange(128)[None, :]]
        ok = bool(np.allclose(np.asarray(out), expect))
        return {"scheme": "e1", "compiles": True, "correct": ok}
    except Exception as e:  # noqa: BLE001
        return {"scheme": "e1", "compiles": False,
                "error": repr(e)[:300]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    rng = np.random.default_rng(42)
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)

    print(json.dumps(probe_e1()), flush=True)

    tiles = 16 if args.quick else 32
    repeats = 3 if args.quick else 5
    cases = []
    # keep segments*K <= ~512 per kernel: larger unrolled bodies blow up
    # Mosaic compile time (the first probe run hung compiling 2048 bodies)
    for V in (4096, 32768, 262144):
        segs_f32 = V // 128
        k_f32 = max(1, 512 // segs_f32)
        cases += [("f32sel", V, k_f32), ("f32fma", V, k_f32)]
        k_i8 = max(1, 512 // (V // 512))
        cases += [("i8fma", V, k_i8)]
        k_i4 = max(1, 512 // (V // 1024))
        cases += [("i4fma", V, k_i4)]
    cases += [("base", 4096, 64), ("gather", 4096, 64),
              ("bcast", 4096, 64), ("shiftv", 4096, 64)]

    for scheme, V, k in cases:
        try:
            res = run_case(scheme, V, k, tiles, repeats, rng)
        except Exception as e:  # noqa: BLE001
            res = {"scheme": scheme, "V": V, "error":
                   str(e).split("\n")[0][:200]}
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
