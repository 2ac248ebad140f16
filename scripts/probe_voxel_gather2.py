"""On-chip probe #2: loop-form voxel-table walks (round 5).

Probe #1 (scripts/probe_voxel_gather.py) established on hardware that
STATIC-unrolled segment walks stop compiling in reasonable time well below
512 segment bodies (a 512-body kernel did not finish Mosaic compilation in
9 minutes), so 64^3 grids (2048 f32 segments) need a loop-form walk:
``lax.fori_loop`` over segments with dynamic ``tab_ref`` indexing keeps the
compile O(1) in table size. This probe measures:

  f32static   the r4 static walk at small V (baseline timing)
  f32loop     fori_loop walk, one 128-entry segment per iteration
  f32loopU8   fori_loop over segment groups, 8 statically-unrolled segments
              per iteration (keeps some software pipelining)
  i8loopU8    packed int8 material ids (4 per lane -> V/512 segments),
              fori_loop x8-unrolled + one-segment id->value map
  i4loopU8    packed int4 ids (V/1024 segments, <=16 materials)

Usage: python scripts/probe_voxel_gather2.py
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


def _lcg(idx, vmask):
    return (idx * jnp.int32(LCG_A) + jnp.int32(LCG_C)) & jnp.int32(vmask)


def _seg_term(tab_ref, s, seg_of, loc, shape):
    row = tab_ref[pl.dslice(s, 1), :]
    seg = jnp.broadcast_to(row, shape)
    got = jnp.take_along_axis(seg, loc, axis=1)
    return got * (seg_of == s).astype(jnp.float32)


def _walk_f32_static(tab_ref, flat):
    out = jnp.zeros(flat.shape, jnp.float32)
    seg_of = flat >> jnp.int32(7)
    loc = flat & jnp.int32(127)
    for s in range(tab_ref.shape[0]):
        out = out + _seg_term(tab_ref, s, seg_of, loc, flat.shape)
    return out


def _walk_f32_loop(tab_ref, flat, unroll):
    segs = tab_ref.shape[0]
    seg_of = flat >> jnp.int32(7)
    loc = flat & jnp.int32(127)

    def body(g, acc):
        for i in range(unroll):
            s = g * unroll + i
            acc = acc + _seg_term(tab_ref, s, seg_of, loc, flat.shape)
        return acc

    return jax.lax.fori_loop(0, segs // unroll, body,
                             jnp.zeros(flat.shape, jnp.float32))


def _walk_packed_loop(tab_ref, map_ref, flat, bits, unroll):
    per = 32 // bits
    seg_entries = 128 * per
    segs = tab_ref.shape[0]
    seg_of = flat // jnp.int32(seg_entries)
    loc = (flat % jnp.int32(seg_entries)) // jnp.int32(per)
    shift = (flat % jnp.int32(per)) * jnp.int32(bits)
    idmask = jnp.int32((1 << bits) - 1)

    def body(g, mid):
        for i in range(unroll):
            s = g * unroll + i
            row = tab_ref[pl.dslice(s, 1), :]
            seg = jnp.broadcast_to(row, flat.shape)
            got = jnp.take_along_axis(seg, loc, axis=1)
            byte = jax.lax.shift_right_logical(got, shift) & idmask
            mid = mid + byte * (seg_of == s).astype(jnp.int32)
        return mid

    mid = jax.lax.fori_loop(0, segs // unroll, body,
                            jnp.zeros(flat.shape, jnp.int32))
    mseg = jnp.broadcast_to(map_ref[0:1, :], flat.shape)
    return jnp.take_along_axis(mseg, mid, axis=1)


def _mk_kernel(scheme, vmask, k_loops):
    def kernel(tab_ref, map_ref, idx_ref, out_ref):
        idx = idx_ref[0]
        acc = jnp.zeros(idx.shape, jnp.float32)
        for _ in range(k_loops):
            if scheme == "f32static":
                acc = acc + _walk_f32_static(tab_ref, idx)
            elif scheme == "f32loop":
                acc = acc + _walk_f32_loop(tab_ref, idx, unroll=1)
            elif scheme == "f32loopU8":
                acc = acc + _walk_f32_loop(tab_ref, idx, unroll=8)
            elif scheme == "i8loopU8":
                acc = acc + _walk_packed_loop(tab_ref, map_ref, idx, 8, 8)
            elif scheme == "i4loopU8":
                acc = acc + _walk_packed_loop(tab_ref, map_ref, idx, 4, 8)
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
    return jnp.asarray(word.astype(np.uint32).view(np.int32)
                       .reshape(segs, 128))


def run_case(scheme, V, k_loops, tiles, repeats, rng):
    vmask = V - 1
    n_mat = 16 if scheme.startswith("i4") else 128
    ids = rng.integers(0, n_mat, V)
    values = rng.random(n_mat).astype(np.float32)
    fullmap = np.zeros(128, np.float32)
    fullmap[:n_mat] = values
    tab_f32_np = values[ids]
    if scheme.startswith("i8"):
        tab = _pack_ids(ids, 8)
    elif scheme.startswith("i4"):
        tab = _pack_ids(ids, 4)
    else:
        tab = jnp.asarray(tab_f32_np.reshape(V // 128, 128))
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

    idx = idx0[0].astype(np.int64)
    acc = np.zeros_like(idx, np.float32)
    for _ in range(k_loops):
        acc = acc + tab_f32_np[idx]
        idx = (idx * LCG_A + LCG_C) & vmask
    got = np.asarray(out[0])
    if not np.allclose(got, acc, rtol=1e-5, atol=1e-5):
        raise AssertionError(f"{scheme} V={V}: max err "
                             f"{np.abs(got - acc).max()}")

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run(tab, map_arr, idx_dev).block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    lookups = tiles * TILE * LANE * k_loops
    return {"scheme": scheme, "V": V, "k_loops": k_loops,
            "ns_per_lookup": dt / lookups * 1e9,
            "lookups_per_s": lookups / dt,
            "wall_ms": dt * 1e3, "compile_s": round(compile_s, 2)}


def main():
    rng = np.random.default_rng(42)
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)
    tiles, repeats = 16, 3
    cases = [
        ("f32static", 4096, 4),
        ("f32loop", 4096, 4), ("f32loopU8", 4096, 4),
        ("i8loopU8", 4096, 4), ("i4loopU8", 4096, 4),
        ("f32loopU8", 32768, 2), ("i8loopU8", 32768, 2),
        ("i4loopU8", 32768, 2),
        ("f32loopU8", 262144, 1), ("i8loopU8", 262144, 1),
        ("i4loopU8", 262144, 1),
    ]
    for scheme, V, k in cases:
        t_case = time.perf_counter()
        try:
            res = run_case(scheme, V, k, tiles, repeats, rng)
        except Exception as e:  # noqa: BLE001
            res = {"scheme": scheme, "V": V,
                   "error": repr(e)[:300]}
        res["case_s"] = round(time.perf_counter() - t_case, 1)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
