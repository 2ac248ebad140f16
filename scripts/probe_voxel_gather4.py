"""On-chip probe #4: decide the >8192-entry voxel-table design (VERDICT r4
item 1) from measured per-segment walk cost at REAL sizes.

Probe 2 under-amortized (4 tiles, 13x fixed-overhead skew) and probe 3
under-worked (walls ~0.03-0.08 ms across schemes differing 32x in work =
dispatch-bound). This probe uses tiles=64, k-loops scaled so each timed
wall is >= ~2 ms, and an LCG-evolving index so nothing hoists.

Hypothesis under test: the production `_vmem_table_lookup` select chain is
SERIALLY dependent (gather_s -> select_s -> gather_{s+1} ...), so the walk
runs at gather latency, not gather throughput. Splitting the segment range
into W independent interleaved chains (ilp) should recover throughput.

Schemes (all asserted exact vs a NumPy oracle):
  real     production walk verbatim (serial select chain), S segments
  ilp4     same walk split into 4 independent select chains + combine
  ilp8     8 chains
  fma4     accumulate form acc += mask*got, 4 chains
  pk4      uint8 codes packed 4/lane in int32; int32 walk (ilp4) + one
           byte-extract at the end; S counts int32 segments
  fori     lax.fori_loop over 32-segment chunks, dynamic tab_ref row reads
           (pl.ds), ilp4 inside the chunk
  gonly    S gathers from ONE row with LCG-evolving loc (gather throughput
           ceiling; not a lookup, no oracle)

Usage: python scripts/probe_voxel_gather4.py [--quick]
Prints one JSON line per case: segment-terms/s is the figure of merit
(production r4 baseline: 16^3 voxel fused = 6.84e9 ps/s x 32 segments
= 2.2e11 terms/s = 11% of the 7.7e12 ops/s VPU peak at 4 ops/term).
"""
import argparse
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


def _walk_select(tab_ref, flat, shape, s_lo, s_hi, dtype=jnp.float32):
    """Production-form serial select chain over segments [s_lo, s_hi)."""
    out = jnp.zeros(shape, dtype)
    seg_of = flat >> jnp.int32(7)
    loc = flat & jnp.int32(127)
    for s in range(s_lo, s_hi):
        seg = jnp.broadcast_to(tab_ref[s:s + 1, :], shape)
        got = jnp.take_along_axis(seg, loc, axis=1)
        out = jnp.where(seg_of == jnp.int32(s), got, out)
    return out


def _walk_ilp(tab_ref, flat, shape, n_seg, w, dtype=jnp.float32):
    """W independent interleaved select chains: chain c walks segments
    c, c+w, c+2w, ... so gathers across chains have no data dependency."""
    seg_of = flat >> jnp.int32(7)
    loc = flat & jnp.int32(127)
    accs = [jnp.zeros(shape, dtype) for _ in range(w)]
    for s in range(n_seg):
        c = s % w
        seg = jnp.broadcast_to(tab_ref[s:s + 1, :], shape)
        got = jnp.take_along_axis(seg, loc, axis=1)
        accs[c] = jnp.where(seg_of == jnp.int32(s), got, accs[c])
    out = accs[0]
    for c in range(1, w):
        out = out | accs[c] if dtype == jnp.int32 else out + accs[c]
    return out


def _walk_fma(tab_ref, flat, shape, n_seg, w):
    seg_of = flat >> jnp.int32(7)
    loc = flat & jnp.int32(127)
    accs = [jnp.zeros(shape, jnp.float32) for _ in range(w)]
    for s in range(n_seg):
        c = s % w
        seg = jnp.broadcast_to(tab_ref[s:s + 1, :], shape)
        got = jnp.take_along_axis(seg, loc, axis=1)
        accs[c] = accs[c] + got * (seg_of == jnp.int32(s)).astype(
            jnp.float32)
    out = accs[0]
    for c in range(1, w):
        out = out + accs[c]
    return out


def _mk_kernel(scheme, s_tab, vmask, k_loops):
    """vmask is over the LOOKUP index domain (V entries)."""

    def kernel(tab_ref, idx_ref, out_ref):
        idx = idx_ref[0]
        shape = idx.shape
        acc = jnp.zeros(shape, jnp.float32)
        if scheme == "real":
            for _ in range(k_loops):
                acc = acc + _walk_select(tab_ref, idx, shape, 0, s_tab)
                idx = _lcg(idx, vmask)
        elif scheme in ("ilp4", "ilp8"):
            w = 4 if scheme == "ilp4" else 8
            for _ in range(k_loops):
                acc = acc + _walk_ilp(tab_ref, idx, shape, s_tab, w)
                idx = _lcg(idx, vmask)
        elif scheme == "fma4":
            for _ in range(k_loops):
                acc = acc + _walk_fma(tab_ref, idx, shape, s_tab, 4)
                idx = _lcg(idx, vmask)
        elif scheme == "pk4":
            # idx in [0, 4*V32) where V32 = s_tab*128 int32 lanes; the
            # int32 walk uses idx>>2, the byte select uses idx&3
            for _ in range(k_loops):
                word = _walk_ilp(tab_ref, idx >> jnp.int32(2), shape,
                                 s_tab, 4, dtype=jnp.int32)
                byte = (word >> ((idx & jnp.int32(3)) * jnp.int32(8))) \
                    & jnp.int32(255)
                acc = acc + byte.astype(jnp.float32)
                idx = _lcg(idx, vmask)
        elif scheme == "fori":
            n_chunks = s_tab // 32

            def body(c, carry):
                acc_i, idx_i = carry
                base = c * 32
                rows = tab_ref[pl.ds(base, 32), :]
                seg_of = idx_i >> jnp.int32(7)
                loc = idx_i & jnp.int32(127)
                accs = [jnp.zeros(shape, jnp.float32) for _ in range(4)]
                for s in range(32):
                    seg = jnp.broadcast_to(rows[s:s + 1, :], shape)
                    got = jnp.take_along_axis(seg, loc, axis=1)
                    accs[s % 4] = jnp.where(
                        seg_of == base + jnp.int32(s), got, accs[s % 4])
                return (acc_i + accs[0] + accs[1] + accs[2] + accs[3],
                        idx_i)

            for _ in range(k_loops):
                part, _ = jax.lax.fori_loop(
                    0, n_chunks, body, (jnp.zeros(shape, jnp.float32), idx))
                acc = acc + part
                idx = _lcg(idx, vmask)
        elif scheme == "gonly":
            seg = jnp.broadcast_to(tab_ref[0:1, :], shape)
            loc = idx & jnp.int32(127)
            for _ in range(k_loops * s_tab):
                acc = acc + jnp.take_along_axis(seg, loc, axis=1)
                loc = (loc * jnp.int32(37) + jnp.int32(11)) & jnp.int32(127)
        else:
            raise ValueError(scheme)
        out_ref[0] = acc

    return kernel


def _oracle(scheme, tab, idx0, vmask, s_tab, k_loops):
    """NumPy twin (int64 LCG to match int32 wraparound via masking)."""
    idx = idx0.astype(np.int64)
    acc = np.zeros(idx.shape, np.float64)
    tabf = np.asarray(tab).reshape(-1)
    for _ in range(k_loops):
        if scheme == "pk4":
            word = np.asarray(tab, np.int64).reshape(-1)[
                (idx >> 2).astype(np.int64)]
            byte = (word >> ((idx & 3) * 8)) & 255
            acc = acc + byte.astype(np.float64)
        elif scheme == "gonly":
            return None
        else:
            acc = acc + tabf[idx]
        idx = (idx * LCG_A + LCG_C) & 0xFFFFFFFF
        idx = np.where(idx >= 2 ** 31, idx - 2 ** 32, idx) & vmask
    return acc


def run_case(scheme, s_tab, k_loops, tiles, repeats, rng):
    if scheme == "pk4":
        v32 = s_tab * 128
        words = rng.integers(0, 2 ** 31, v32, dtype=np.int64)
        tab = jnp.asarray((words - (words >= 2 ** 31) * 2 ** 32)
                          .astype(np.int32).reshape(s_tab, 128))
        v_lookup = v32 * 4
    else:
        tab = jnp.asarray(
            rng.random((s_tab, 128)).astype(np.float32))
        v_lookup = s_tab * 128
    vmask = v_lookup - 1
    idx0 = rng.integers(0, v_lookup, (tiles, TILE, LANE)).astype(np.int32)
    kernel = _mk_kernel(scheme, s_tab, vmask, k_loops)
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
    want = _oracle(scheme, tab, idx0, vmask, s_tab, k_loops)
    if want is not None:
        err = float(np.abs(got.astype(np.float64) - want).max())
        assert err < 1e-3 * k_loops, f"{scheme} S={s_tab}: max err {err}"
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run(tab, idx_dev).block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    terms = tiles * TILE * LANE * k_loops * s_tab
    return {"scheme": scheme, "S": s_tab, "k": k_loops, "tiles": tiles,
            "terms_per_s": float(f"{terms / dt:.4g}"),
            "ns_per_lookup": round(dt / (tiles * TILE * LANE * k_loops)
                                   * 1e9, 4),
            "wall_ms": round(dt * 1e3, 3), "compile_s": round(compile_s, 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    rng = np.random.default_rng(42)
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)
    tiles = 64
    reps = 3 if args.quick else 5
    # (scheme, S, k): k scaled so terms ~= 2e9 per timed call
    cases = [
        ("gonly", 32, 16),          # gather throughput ceiling
        ("real", 32, 32),           # production baseline shape
        ("ilp4", 32, 32),
        ("ilp8", 32, 32),
        ("fma4", 32, 32),
        ("real", 128, 8),
        ("ilp4", 128, 8),
        ("pk4", 128, 8),            # 64^3 uint8 = 512 int32 segs; 128 = 32^3
        ("ilp4", 512, 2),           # 32^3 trilinear f16-pair per-walk scale
        ("pk4", 512, 2),            # 64^3 uint8 codes
        ("fori", 512, 2),
        ("fori", 2048, 1),          # 64^3 f32 direct
    ]
    if args.quick:
        cases = [c for c in cases if c[1] <= 512]
    for scheme, s_tab, k in cases:
        try:
            res = run_case(scheme, s_tab, k, tiles, reps, rng)
        except Exception as e:  # noqa: BLE001
            res = {"scheme": scheme, "S": s_tab, "error": repr(e)[:200]}
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
