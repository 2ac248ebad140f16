"""On-chip probe #3: isolate WHY probe #2's walks measured ~100x slower
than the production kernel's known voxel-walk rate (r4: 16^3 fused voxel =
6.84e9 ps/s x 32 segments = 2.2e11 photon-segment-terms/s; probe #2 saw
2.5e9). Cases isolate each suspect:

  real      the production ops/fused._vmem_table_lookup verbatim (static,
            select-chain form), V=4096, K loops with evolving idx
  gatherK   ONE broadcast hoisted out, K x take_along_axis with varying loc
  gatherC   same but loc CONSTANT across loops (fully hoistable)
  maskfma   compare+fma walk with NO gather (got := row broadcast)
  noloop    K x pure arithmetic on idx (ALU floor)

Each runs at tiles in {4, 64} to split per-tile fixed overhead from
per-op cost.
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


def _real_lookup(tab_ref, flat, shape):
    # verbatim ops/fused._vmem_table_lookup
    out = jnp.zeros(shape, jnp.float32)
    seg_of = flat >> jnp.int32(7)
    loc = flat & jnp.int32(127)
    for s in range(tab_ref.shape[0]):
        seg = jnp.broadcast_to(tab_ref[s:s + 1, :], shape)
        got = jnp.take_along_axis(seg, loc, axis=1)
        out = jnp.where(seg_of == jnp.int32(s), got, out)
    return out


def _mk_kernel(scheme, vmask, k_loops):
    def kernel(tab_ref, idx_ref, out_ref):
        idx = idx_ref[0]
        shape = idx.shape
        acc = jnp.zeros(shape, jnp.float32)
        if scheme == "real":
            for _ in range(k_loops):
                acc = acc + _real_lookup(tab_ref, idx, shape)
                idx = _lcg(idx, vmask)
        elif scheme in ("gatherK", "gatherC"):
            seg = jnp.broadcast_to(tab_ref[0:1, :], shape)
            loc0 = idx & jnp.int32(127)
            for _ in range(k_loops):
                loc = loc0 if scheme == "gatherC" else (idx & jnp.int32(127))
                acc = acc + jnp.take_along_axis(seg, loc, axis=1)
                idx = _lcg(idx, vmask)
        elif scheme == "maskfma":
            seg_of = idx >> jnp.int32(7)
            for _ in range(k_loops):
                for s in range(tab_ref.shape[0]):
                    seg = jnp.broadcast_to(tab_ref[s:s + 1, :], shape)
                    acc = acc + seg * (seg_of == jnp.int32(s)).astype(
                        jnp.float32)
                idx = _lcg(idx, vmask)
                seg_of = idx >> jnp.int32(7)
        elif scheme == "noloop":
            for _ in range(k_loops):
                acc = acc + idx.astype(jnp.float32)
                idx = _lcg(idx, vmask)
        else:
            raise ValueError(scheme)
        out_ref[0] = acc

    return kernel


def run_case(scheme, V, k_loops, tiles, repeats, rng):
    vmask = V - 1
    tab = jnp.asarray(rng.random((V // 128, 128)).astype(np.float32))
    idx0 = rng.integers(0, V, (tiles, TILE, LANE)).astype(np.int32)
    kernel = _mk_kernel(scheme, vmask, k_loops)
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
    run(tab, idx_dev).block_until_ready()
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run(tab, idx_dev).block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    lookups = tiles * TILE * LANE * k_loops
    return {"scheme": scheme, "V": V, "k": k_loops, "tiles": tiles,
            "ns_per_lookup": round(dt / lookups * 1e9, 4),
            "wall_ms": round(dt * 1e3, 3), "compile_s": round(compile_s, 2)}


def main():
    rng = np.random.default_rng(42)
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)
    for scheme in ("noloop", "gatherC", "gatherK", "maskfma", "real"):
        for tiles in (4, 64):
            try:
                res = run_case(scheme, 4096, 8, tiles, 3, rng)
            except Exception as e:  # noqa: BLE001
                res = {"scheme": scheme, "tiles": tiles,
                       "error": repr(e)[:200]}
            print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
