"""Fresh-compile smoke matrix for the fused kernel (real TPU only).

The AOT compile helper enforces a 16MB scoped-vmem stack; Mosaic's unrolled
per-iteration temporaries, the VMEM field windows, and (for small outputs)
stack-promoted result tuples all count against it. build_fused_chunk sizes
tiles/unroll to fit (ops/fused.py) — this matrix drives every op family
through a REAL compile at small and large capacities to catch regressions.

Cache-busting: the axon relay caches compiles server-side keyed on the HLO,
so a constant plan that "passes" may be a cache hit hiding a fresh-compile
OOM (exactly how the tile-512 regression stayed invisible). Each run folds a
process-unique epsilon into one physics constant: the physics is unchanged
(relative size ~1e-7) but the HLO is new, so every run really compiles.
"""

import os
import time

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs real TPU hardware")

_EPS = 1.0 + (int(time.time() * 1000) % 100_000) * 1e-12


def _ops(kind):
    from physicl_tpu.ops import fused as F
    import physicl_tpu.light as light

    c = float(light.c) * _EPS
    kin = F._Op("kin")
    iso = F._Op("iso", coef=1e-6 * _EPS, c_val=c)
    if kind == "iso":
        return [kin, iso, F._Op("sign", cols=(1, 2))], 5, 0
    if kind == "varn":
        import jax.numpy as jnp

        iso_v = F._Op("iso", coef=1e-6 * _EPS, c_val=c,
                      wl_base=1.0e-3 * _EPS,
                      n_fn=lambda x, y, z: jnp.exp(-x * jnp.float32(1e-9)))
        return [kin, iso_v, F._Op("del", coef=1e-7 * _EPS),
                F._Op("cross", cols=(1,), axes=((0, 0.5 * _EPS, 2, 0, -1),))
                ], 5, 0
    if kind == "emit":
        return [F._Op("emit", emit_n=64, emit_E=2.0 * _EPS,
                      emit_r=(0.0, 0.0, 0.0), emit_v=None, c_val=c,
                      emit_sched_idx=0),
                kin,
                F._Op("absorb", bounds=((-1.0 * _EPS, 1.0), (-1e9, 1e9),
                                        (-1e9, 1e9))),
                F._Op("cross", cols=(1,), axes=((0, 0.5, 2, 0, -1),))], 5, 0
    if kind == "emit_icdf":
        import physicl_tpu.light as L

        kT = float(L.kB.value()) * 5778.0
        sampler = L.PlanckSampler(0.1 * kT * _EPS, 12 * kT, 5778.0,
                                  bins=2000)
        return [F._Op("emit", emit_n=64, emit_E=0.0, emit_E_fn=sampler.icdf,
                      emit_r=(0.0, 0.0, 0.0), emit_v=(c, 0.0, 0.0),
                      c_val=c, emit_sched_idx=0),
                kin, F._Op("del", coef=1e-5 * _EPS)], 3, 0
    if kind == "hg":
        return [kin, F._Op("hg", coef=1e-6 * _EPS, c_val=c, g=0.73),
                F._Op("sign", cols=(1, 2))], 5, 0
    if kind == "rayl":
        return [kin, F._Op("rayl", coef=1e-6 * _EPS, c_val=c),
                F._Op("sign", cols=(1, 2))], 5, 0
    if kind == "compton":
        # worst-case vmem profile of the family: KN sigma-ratio polynomial
        # + the full 12-try Kahn rejection loop + the frame rotation
        return [kin, F._Op("compton", coef=1e-6 * _EPS, c_val=c,
                           inv_mec2=1.0 / (8.187e-14 * _EPS), kn_xsec=True,
                           kn_tries=12),
                F._Op("sign", cols=(1, 2))], 5, 0
    if kind == "compton_thermal":
        # thermal Comptonization stacks the Maxwell electron draw + two
        # Lorentz boosts on the Kahn loop (unroll forced to 1)
        return [kin, F._Op("compton", coef=1e-6 * _EPS, c_val=c,
                           inv_mec2=1.0 / (8.187e-14 * _EPS), kn_xsec=True,
                           kn_tries=12, theta_e=0.02 * _EPS),
                F._Op("sign", cols=(1, 2))], 5, 0
    if kind == "trace":
        return [kin, iso, F._Op("trace", stream0=0, stream_scat=True)], 5, 4
    if kind == "trace_bf16":
        return ([kin, iso, F._Op("trace", stream0=0)], 5, 3, "bfloat16")
    if kind == "trace_strided":
        return [kin, iso, F._Op("trace", stream0=0, stream_every=4)], 5, 3
    if kind == "ecap":
        return [kin,
                F._Op("cross", cols=(1,), axes=((0, 0.5 * _EPS, 2, -1, 0),))
                ], 5, 1
    if kind == "custom":
        import jax.numpy as jnp

        def fn(p):
            return {"E": p.E * jnp.float32(0.999 * _EPS),
                    "alive": p.uniform() >= jnp.float32(0.001)}

        return [kin, F._Op("custom", custom_fn=fn), iso,
                F._Op("sign", cols=(1, 2))], 5, 0
    if kind == "reduce":
        import jax.numpy as jnp

        def moments(p):
            return {"E_total": p.E * jnp.float32(_EPS),
                    "r2": p.rx * p.rx + p.ry * p.ry + p.rz * p.rz}

        return [kin, iso,
                F._Op("reduce", custom_fn=moments,
                      reduce_outputs=("E_total", "r2"), cols=(1, 0))], 3, 0
    if kind == "fresnel":
        # refractive interface: intersection + Fresnel-coefficient
        # temporaries are rotation-scale (unroll capped at 4 with hg/rayl)
        return [kin,
                F._Op("fresnel", c_val=c,
                      iface=(2, 0.5 * _EPS, 1.0, 1.5, False)),
                F._Op("fresnel", c_val=c,
                      iface=(2, 1.0 * _EPS, 1.5, 1.0, True)),
                F._Op("sign", cols=(1, 2))], 5, 0
    if kind == "lorentz":
        # charged-particle fused path: Boris rotation temporaries (t-vector,
        # v', s2) plus spatially-varying field callables per unrolled iter
        import jax.numpy as jnp

        def b_fn(x, y, z):
            return (jnp.float32(0.0) * x, jnp.float32(0.0) * x,
                    jnp.float32(40.0 * _EPS) + jnp.float32(2.0) * x)

        return [F._Op("lorentz", qm=1.5 * _EPS, e_fn=None, b_fn=b_fn),
                kin, F._Op("sign", cols=(1, 2))], 5, 0
    if kind == "lorentz_qm":
        # per-particle q/m from a packed extras plane (16-plane state)
        from physicl_tpu.ops import fused as F2

        def e_fn(x, y, z):
            import jax.numpy as jnp

            return (jnp.float32(2.0 * _EPS) + 0.0 * x, 0.0 * x, 0.0 * x)

        return [F._Op("lorentz", qm_plane=F2._NF, e_fn=e_fn,
                      b_fn=lambda x, y, z: (0.0 * x, 0.0 * x,
                                            x * 0.0 + 30.0)),
                kin, F._Op("sign", cols=(1, 2))], 5, 0
    if kind == "mixed":
        # mixed-species plan: photon physics gated by the packed otype
        # plane + the Boris push on the charged complement — the full
        # per-particle dispatch profile in one kernel
        return [F._Op("lorentz", qm=1.5 * _EPS,
                      b_fn=lambda x, y, z: (0.0 * x, 0.0 * x,
                                            x * 0.0 + 30.0)),
                kin, iso, F._Op("del", coef=1e-7 * _EPS),
                F._Op("sign", cols=(1, 2))], 5, 0
    if kind == "implicit_capture":
        # weighted transport: deterministic weight decay + Russian roulette
        # exercises the _W plane read-modify-write in the unrolled loop
        return [kin, F._Op("del", coef=0.1 * _EPS, implicit_capture=True,
                           roulette=(1e-3, 2e-3)),
                F._Op("sign", cols=(1, 2))], 5, 0
    if kind == "phase":
        # user phase function: a 64-bin tabulated inverse CDF unrolls 64
        # mask-multiply segments per draw — the vmem-heavy tail of the
        # relative-frame scatter family (unroll capped at 4 with hg/rayl)
        import physicl_tpu.light as L

        mu = np.linspace(-1, 1, 101)
        icdf = L._tabulated_cos_icdf(mu, 1.0 + _EPS * mu ** 2, bins=64)
        return [kin, F._Op("phase", coef=1e-6 * _EPS, c_val=c,
                           custom_fn=icdf),
                F._Op("sign", cols=(1, 2))], 5, 0
    if kind == "sphere":
        # spherical geometry: shell flux tally + absorbing sphere
        R = 0.5 * _EPS
        return [kin, F._Op("scross", sphere=(0.0, 0.0, 0.0, R),
                           cols=(1, 2)),
                F._Op("sabsorb", sphere=(0.0, 0.0, 0.0, 2.0 * R)),
                F._Op("sign", cols=(3, 4))], 5, 0
    if kind == "layered":
        # light.layered_density: 8 layers of mask-multiply density terms
        # folded into the del op's n(r) — the gather-free gridded medium
        import physicl_tpu.light as L

        nfn = L.layered_density(np.linspace(0.0, 8.0, 9) * _EPS,
                                [1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 1.0, 0.5])
        return [kin, F._Op("del", coef=1e-6 * _EPS, n_fn=nfn),
                F._Op("sign", cols=(1, 2))], 5, 0
    if kind == "kstate":
        # KernelStep(elementwise=True): a SimState->SimState map traced
        # through the tile facade (stack/unstack of the 12 vector planes
        # brackets the user body)
        def drag(state, ctx):
            return state.replace(v=state.v * (1.0 - 1e-7 * _EPS),
                                 E=state.E * (1.0 - 1e-7))

        return [kin, iso, F._Op("kstate", custom_fn=drag)], 5, 0
    if kind == "extras_write":
        # ElementwiseStep(extras_write=): read-modify-write of a user aux
        # plane (dose) through the packed-writable-extras machinery
        def dosefn(p):
            return {"dose": p.extras["dose"] + p.E * (0.125 * _EPS)}

        return [kin, iso,
                F._Op("custom", custom_fn=dosefn,
                      view_extras=(("dose", F._NF, 1),),
                      extras_write=("dose",))], 5, 0
    if kind == "voxel":
        # light.voxel_density at the fused-table cap (8192 entries): the
        # 4 MB lane-replicated VMEM table + the segmented sublane-gather
        # chain (Vpad/tile_rows gathers+selects per eval, unroll capped
        # at 4) — worst case at 128-row tiles (64 segments)
        import physicl_tpu.light as L

        rng = np.random.default_rng(0)
        grid = (rng.uniform(0.5, 2.0, (32, 16, 16)) * _EPS).astype(
            np.float32)
        nfn = L.voxel_density(grid, origin=(0.0, 0.0, 0.0), spacing=1.0)
        assert getattr(nfn, "vox_spec", None) is not None
        return [kin, F._Op("del", coef=1e-6 * _EPS, n_fn=nfn),
                F._Op("sign", cols=(1, 2))], 5, 0
    if kind == "voxel_tri":
        # trilinear voxel medium: 8 corner lookups per eval (8x the
        # segmented gather chains) on a 2048-entry table
        import physicl_tpu.light as L

        rng = np.random.default_rng(1)
        grid = (rng.uniform(0.5, 2.0, (16, 16, 8)) * _EPS).astype(
            np.float32)
        nfn = L.voxel_density(grid, origin=(0.0, 0.0, 0.0), spacing=1.0,
                              interp="trilinear")
        assert getattr(nfn, "vox_spec", None) is not None
        return [kin, F._Op("del", coef=1e-6 * _EPS, n_fn=nfn),
                F._Op("sign", cols=(1, 2))], 5, 0
    if kind == "voxel_cb":
        # CT-scale packed-codebook medium (r5): 64^3 grid, 8-bit codes,
        # 512 code rows + 2 codebook rows walked per eval at unroll 1 —
        # the largest statically-unrolled gather chain in the envelope
        import physicl_tpu.light as L

        rng = np.random.default_rng(2)
        vals = (rng.uniform(0.5, 2.0, 256) * _EPS).astype(np.float32)
        grid = vals[rng.integers(0, 256, (64, 64, 64))]
        nfn = L.voxel_density(grid, origin=(0.0, 0.0, 0.0), spacing=1.0)
        assert nfn.vox_spec["kind"] == "codebook"
        return [kin, F._Op("del", coef=1e-6 * _EPS, n_fn=nfn),
                F._Op("sign", cols=(1, 2))], 5, 0
    if kind == "voxel_cb_tri":
        # trilinear codebook medium at the LIFTED 64^3 cap (r5): 8
        # per-corner dynamic range-walks over the 512-row code table +
        # 8 static codebook dequants per eval
        import physicl_tpu.light as L

        rng = np.random.default_rng(3)
        vals = (rng.uniform(0.5, 2.0, 200) * _EPS).astype(np.float32)
        grid = vals[rng.integers(0, 200, (64, 64, 64))]
        nfn = L.voxel_density(grid, origin=(0.0, 0.0, 0.0), spacing=1.0,
                              interp="trilinear")
        assert nfn.vox_spec["kind"] == "codebook"
        return [kin, F._Op("del", coef=1e-6 * _EPS, n_fn=nfn),
                F._Op("sign", cols=(1, 2))], 5, 0
    if kind == "fluorescence":
        # fluorescent re-emission: yield/angle draws + the true-isotropic
        # redirect stacked on the plain kill (unroll capped at 8)
        return [kin, F._Op("del", coef=0.1 * _EPS, c_val=c,
                           fluor=(0.7, 0.5 * _EPS, 0.8 * _EPS), cols=(0,)),
                F._Op("sign", cols=(1, 2))], 5, 0
    if kind == "stretch":
        # exponential transform: direction-cosine reweighting on the del
        # op (mu from the dr planes + two likelihood ratios per iter)
        return [kin, F._Op("del", coef=0.1 * _EPS,
                           stretch=(0.7, 1.0, 0.0, 0.0)),
                F._Op("sign", cols=(1, 2))], 5, 0
    if kind == "polarized":
        # Stokes-polarized Rayleigh: 21-plane packed state (15 core + the
        # writable stokes/pol_ref triples), the 26-step azimuth bisection
        # (rotation recurrences), frame algebra, and the polmeas reduction
        # — the largest op body in the matrix (unroll forced to 1)
        nf = 15
        return [kin, F._Op("pol", coef=1e-6 * _EPS, c_val=c,
                           pol_planes=(nf, nf + 3)),
                F._Op("polmeas", cols=(1, 0), pol_planes=(nf,),
                      reduce_outputs=("wt", "p", "V", "Q", "U"))], 2, 0
    if kind == "polarized_compton":
        # the largest op body in the matrix: Klein-Nishina Kahn loop +
        # the 26-step azimuth bisection + Fano matrix + frame rotation on
        # the 21-plane state (unroll forced to 1)
        nf = 15
        return [kin, F._Op("polc", coef=1e-6 * _EPS, c_val=c,
                           inv_mec2=1.0 / (8.187e-14 * _EPS), kn_xsec=True,
                           kn_tries=12, cols=(0,),
                           pol_planes=(nf, nf + 3)),
                F._Op("sign", cols=(1, 2))], 5, 0
    if kind == "spectrum_wide":
        # light.SpectrumMeasureStep near the 120-bin fast-path ceiling: 100
        # float record channels stress the rec_f row at fresh compile
        import jax.numpy as jnp

        edges = tuple(np.linspace(0.0, 2.0, 101) * _EPS)
        names = tuple(f"bin{i}" for i in range(100))

        def hist(p):
            return {f"bin{i}": (p.E >= jnp.float32(edges[i]))
                    & (p.E < jnp.float32(edges[i + 1]))
                    for i in range(100)}

        return [kin, iso,
                F._Op("reduce", custom_fn=hist,
                      reduce_outputs=names, cols=(1, 0))], 2, 0
    raise AssertionError(kind)


@pytest.mark.parametrize("kind", ["iso", "varn", "emit", "emit_icdf", "hg",
                                  "rayl", "compton", "compton_thermal",
                                  "trace", "trace_strided", "trace_bf16",
                                  "ecap", "custom", "reduce",
                                  "spectrum_wide", "implicit_capture",
                                  "fresnel", "lorentz", "lorentz_qm",
                                  "mixed", "stretch", "fluorescence",
                                  "phase",
                                  "sphere", "layered", "voxel", "voxel_tri",
                                  "voxel_cb", "voxel_cb_tri",
                                  "kstate", "extras_write",
                                  "polarized", "polarized_compton"])
@pytest.mark.parametrize("rows", [128, 1024, 8192])
def test_fused_kernel_fresh_compiles(kind, rows):
    """Every op family x capacity must COMPILE fresh and execute 5 real
    iterations within the scoped-vmem budget."""
    import jax.numpy as jnp
    from physicl_tpu.ops import fused as F

    cfg = _ops(kind)
    ops, n_rec, n_stream = cfg[:3]
    stream_dtype = cfg[3] if len(cfg) > 3 else "float32"
    chunk = 32  # small: compile dominates; the matrix probes fit, not perf
    stream_every = max([getattr(o, "stream_every", 1) for o in ops])
    _POL_PLANES = ("stokes:0", "stokes:1", "stokes:2",
                   "pol_ref:0", "pol_ref:1", "pol_ref:2")
    extras = {"lorentz_qm": ("qm",), "mixed": ("otype",),
              "extras_write": ("dose",),
              "polarized": _POL_PLANES,
              "polarized_compton": _POL_PLANES}.get(kind, ())
    writeback = ("dose",) if kind == "extras_write" else ()
    species = F.SPECIES_MIXED if kind == "mixed" else 1
    plan = F.FusedPlan(ops=ops, n_rec_cols=n_rec, chunk=chunk, tile_rows=256,
                       const_norm_speed=None, packed_angles=True,
                       fast_trig=True, n_stream=n_stream,
                       stream_every=stream_every if n_stream else 1,
                       stream_dtype=stream_dtype, extras=extras,
                       extras_writeback=writeback,
                       species=species)
    cap = rows * 128
    k = F.build_fused_chunk(plan, cap)
    packed = jnp.concatenate([
        jnp.zeros((6, cap), jnp.float32),                      # r, dr
        jnp.ones((1, cap), jnp.float32) * jnp.float32(3e8),    # vx
        jnp.zeros((5, cap), jnp.float32),                      # vy..dvz
        jnp.ones((3, cap), jnp.float32),                       # E, alive, w
        jnp.ones((len(extras), cap), jnp.float32) * 0.5,       # extras (qm)
    ])
    sched = np.tile(np.float32(1e-3), (5, chunk))
    sched[1] = np.cumsum(sched[0])                             # t after
    sched[2] = sched[1] - sched[0]                             # t before
    emit = np.zeros((1, chunk), np.int32)
    res = k(packed, sched, emit, 12345, 5)
    out = np.asarray(jax.device_get(res[0][:, :8]))
    assert np.isfinite(out).all()
