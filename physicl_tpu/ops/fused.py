"""Fused multi-step transport kernel (Pallas TPU) — the performance core.

This is the TPU-native replacement for the reference's per-step
gather->upload->kernel->download->scatter-back round trip
(physicl/__init__.py:602-664, physicl/light.py:164-205): a single Pallas kernel
that keeps a tile of photons resident in VMEM and advances it through K whole
simulation iterations (time update, kinematics, scattering, deletion,
measurement reductions) before touching HBM again. Photon independence
(README.md:11 of the reference) is what makes the K-iterations-per-tile
schedule legal. HBM traffic per photon-step drops by ~K and randomness comes
from the TPU hardware PRNG instead of host numpy / threefry.

Architecture parallel: where the reference's ``CLProgram.build_kernel``
assembles an OpenCL C string from step metadata (physicl/__init__.py:583-597),
``build_plan`` composes traced Python closures from the step list — same slot,
no string codegen, arbitrary user callables (e.g. variable n(r)) trace straight
into the kernel.

The fused path is an optimization with identical observable semantics; the
generic scan engine remains the fallback for step combinations it cannot prove
fusable (path tracing, energy capture, custom steps, untraceable predicates).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from physicl_tpu.state import OBJ_PHOTON, SimState, mod_floor

# Field planes in the packed (NF, C) state array.
(_RX, _RY, _RZ, _DRX, _DRY, _DRZ, _VX, _VY, _VZ, _DVX, _DVY, _DVZ, _E,
 _ALIVE, _W) = range(15)
_NF = 15

# FusedPlan.species sentinel: a mixed photon/generic population — the packed
# "otype" extras plane gates photon physics per particle in-kernel.
SPECIES_MIXED = -1

_LANE = 128
_MAX_REC_COLS = 128


def _bits_to_unit(bits):
    """uint32 bits -> uniform [0,1) float32 (top 24 bits).

    The logical shift must happen as uint32 (an int32 arithmetic shift would
    smear the sign bit), but Mosaic has no uint32->f32 cast — the shifted
    value fits in [0, 2^24), so bitcast to int32 for the float conversion.
    """
    top = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
    return top.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


class _Rng:
    """Per-iteration uniform stream.

    On TPU hardware: the per-core PRNG (seeded once per tile in the kernel
    prologue; ``pltpu.prng_random_bits`` advances it). In interpret mode
    (CPU tests) the pltpu PRNG is emulated as zeros, so we substitute a
    counter-based hash PRNG (murmur3 finalizer x2) keyed on
    (seed, iteration, static call index, element coordinates) — stateless,
    so it needs no carry through the loop.
    """

    def __init__(self, interpret: bool, seed, k):
        self.interpret = interpret
        self.seed = seed
        self.k = k
        self.idx = 0  # static per-trace call counter

    def bits(self, shape, salt=None):
        """Raw uint32 random bits. ``salt`` (a traced int32) decorrelates
        draws made at the SAME static call site across lax.fori_loop
        iterations on the hash-PRNG twin; the hardware generator is
        stateful, so it ignores the salt (each call advances the stream
        in program order, looped or unrolled alike)."""
        if not self.interpret:
            # prng_random_bits yields int32 on TPU; bitcast before shifting or
            # the arithmetic shift smears the sign bit over the mantissa.
            return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        return self._hash_bits(shape, salt)

    def uniform_pair(self, shape, salt=None):
        """Two uniforms from one 32-bit draw (16 bits each)."""
        b = self.bits(shape, salt)
        if not self.interpret:
            hi = pltpu.bitcast(b >> jnp.uint32(16), jnp.int32)
            lo = pltpu.bitcast(b & jnp.uint32(0xFFFF), jnp.int32)
        else:
            hi = (b >> jnp.uint32(16)).astype(jnp.int32)
            lo = (b & jnp.uint32(0xFFFF)).astype(jnp.int32)
        scale = jnp.float32(1.0 / (1 << 16))
        return hi.astype(jnp.float32) * scale, lo.astype(jnp.float32) * scale

    def uniform(self, shape, salt=None):
        if not self.interpret:
            return _bits_to_unit(self.bits(shape))
        h = self._hash_bits(shape, salt)
        # plain-XLA conversion (pltpu.bitcast is kernel-only)
        return (h >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(
            1.0 / (1 << 24))

    def _hash_bits(self, shape, salt=None):
        self.idx += 1
        ri = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
        ci = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
        h = (jnp.uint32(self.seed)
             ^ (self.k.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
             ^ jnp.uint32((self.idx * 0x7FEB352D) & 0xFFFFFFFF))
        if salt is not None:
            h = h ^ (jnp.asarray(salt, jnp.int32).astype(jnp.uint32)
                     * jnp.uint32(0x632BE59B))
        h = h + ri * jnp.uint32(0x85EBCA6B) + ci * jnp.uint32(0xC2B2AE35)
        for mul in (0x85EBCA6B, 0xC2B2AE35):
            h = h ^ (h >> jnp.uint32(16))
            h = h * jnp.uint32(mul)
            h = h ^ (h >> jnp.uint32(13))
        h = h ^ (h >> jnp.uint32(16))
        return h


@dataclasses.dataclass
class _Op:
    kind: str  # "kin"|"del"|"iso"|"sign"|"cross"|"emit"|"absorb"|"reflect"|"trace"
    coef: float = 0.0               # folded A*n (del/iso)
    bounds: tuple = ()              # ((lo, hi) per axis,) for absorb/reflect
    # stream planes (device-resident per-iteration per-photon outputs):
    # trace uses planes [p, p+1, p+2] for r and optionally p+3 for scatter
    # flags; cross uses one plane per measured plane for E capture
    stream0: int = -1               # first stream plane this op writes
    stream_scat: bool = False       # trace: also write dv!=0 flags
    stream_every: int = 1           # trace stride: sample every k-th iteration
    # user elementwise physics (engine.ElementwiseStep): traced straight
    # into the kernel over the tile's field planes. "reduce" ops reuse
    # custom_fn for the contribution function and list their output names
    # (declared order = float record channel order from cols[1]).
    custom_fn: Optional[Callable] = None
    after_update: bool = True  # custom op sees t after/before UpdateTimeStep
    reduce_outputs: tuple = ()
    # extras planes a custom/reduce fn declared (engine ElementwiseStep/
    # ReduceMeasureStep extras=): (name, first_plane, rows) per
    # declaration; rows == 1 exposes the plane directly, rows == 3 a
    # tuple of component planes (ParticleView.extras contract)
    view_extras: tuple = ()
    # subset of view_extras base names the custom fn may WRITE (engine
    # ElementwiseStep extras_write=): updates named here store back into
    # the packed planes; the plan lists them in extras_writeback so
    # unpack_state returns them to state.extras each chunk
    extras_write: tuple = ()
    wl_base: Optional[float] = None  # lambda^-4 folding base (iso/hg)
    n_fn: Optional[Callable] = None  # variable n(r) (iso/hg/del)
    a_fn: Optional[Callable] = None  # energy-dependent sigma(E) (del)
    implicit_capture: bool = False  # del: w *= 1-p instead of killing
    roulette: tuple = ()            # del: (w_min, w_survive) or empty
    # del: exponential transform (b, dx, dy, dz) — kill prob biased to
    # p*(1 - b*mu), mu = dr_hat . d; survivors reweight by (1-p)/(1-p')
    stretch: tuple = ()
    # del: fluorescent re-emission (Y, E_f, E_edge) — an absorbed photon
    # with E >= E_edge is re-emitted at E_f true-isotropically (speed
    # c_val) with yield probability Y instead of dying
    fluor: tuple = ()
    c_val: float = 0.0              # |v| for resampled photons (iso/hg)
    g: float = 0.0                  # Henyey-Greenstein anisotropy (hg)
    inv_mec2: float = 0.0           # 1 / (m_e c^2) in code units (compton)
    kn_xsec: bool = False           # scale pcoll by sigma_KN/sigma_T (compton)
    kn_tries: int = 12              # Kahn rejection loop bound (compton)
    theta_e: float = 0.0            # kT_e / m_e c^2 thermal electrons (compton)
    cols: tuple = ()                # record columns (measure ops)
    axes: tuple = ()                # ((axis, L, col), ...) for cross
    # fresnel: (axis, loc, n_lo, n_hi, match_speed) for the refractive
    # plane interface (light.RefractiveInterfaceStep); c_val carries c for
    # match_speed's c/n outgoing speeds
    iface: tuple = ()
    # spherical geometry (scross/sabsorb): (cx, cy, cz, R) folded scalars
    sphere: tuple = ()
    inside: bool = False  # sabsorb: kill ENTRANTS instead of leavers
    # lorentz (newton.LorentzForceStep, charged populations): species-wide
    # charge-to-mass ratio + fields. Constant 3-vector fields arrive as
    # static tuples (e_const/b_const — folded as scalars, full unroll);
    # spatially varying fields as callables over (rx, ry, rz) (e_fn/b_fn —
    # traced per iteration, counted as heavy ops). Per-particle charge/mass
    # instead reads a packed extras plane (plan.extras) at index qm_plane.
    qm: float = 0.0
    qm_plane: int = -1
    e_const: tuple = ()
    b_const: tuple = ()
    e_fn: Optional[Callable] = None
    b_fn: Optional[Callable] = None
    # sign/cross: tallies are statistical-weight sums into FLOAT record
    # channels (cols/axes then index rec_f) instead of int counts
    weighted: bool = False
    # pol/polmeas (polarization.ScatterPolarizedRayleighStep /
    # StokesMeasureStep): absolute packed-plane indices of the first Stokes
    # plane and the first pol_ref plane — (stokes0,) for polmeas (read-only)
    # or (stokes0, pol_ref0) for pol (both triples rewritten in-kernel)
    pol_planes: tuple = ()
    # emit: photons appear in slots [emit_starts[k], +n) each iteration —
    # the schedule is host-precomputed (slot allocation is contiguous from
    # the spawn mark), so in-kernel emission is one masked write per tile.
    emit_n: int = 0
    emit_E: float = 0.0             # constant emitted energy (code units)
    # sampled energies: traced inverse CDF over a uniform (e.g.
    # PlanckSampler.icdf) evaluated on hardware-PRNG draws inside the kernel
    emit_E_fn: Optional[Callable] = None
    emit_r: tuple = (0.0, 0.0, 0.0)
    emit_v: Optional[tuple] = None  # None => isotropic at c_val
    emit_sched_idx: int = 0         # which emit schedule row in dts input
    # polarized source: constant (Q, U, V) + frame row written into the
    # packed Stokes planes for emitted slots (empty = unpolarized)
    emit_stokes: tuple = ()
    emit_polref: tuple = ()


def _view_extras_of(op: _Op, f) -> dict:
    """Packed read-only extras planes -> the ``ParticleView.extras`` mapping
    a custom/reduce fn declared (engine ``extras=`` contract: one array for
    a scalar plane, a tuple of component arrays for a 3-row plane)."""
    return {name: (f[p0] if rows == 1
                   else tuple(f[p0 + i] for i in range(rows)))
            for name, p0, rows in op.view_extras}


@dataclasses.dataclass
class FusedPlan:
    """Static description of one fused chunk kernel."""

    ops: List[_Op]
    n_rec_cols: int
    chunk: int
    tile_rows: int
    interpret: bool = False
    # single-species population code the prover validated: OBJ_PHOTON for
    # photon transport (the flagship pipeline) or OBJ_GENERIC for charged /
    # massive particles (kinematics + Lorentz + boundaries + measures).
    # The kernel itself elides per-particle type dispatch either way.
    species: int = OBJ_PHOTON
    # per-particle planes packed AFTER the 15 core planes: names resolve
    # against state.extras at pack time ("qm" is the derived charge-to-mass
    # ratio q/m, 0 where m == 0; "otype" is the species code on mixed
    # plans; "name:i" is row i of a multi-row extras array, e.g. "stokes:0").
    # Ops address extras[j] as field plane _NF + j; the kernel copies them
    # through unchanged unless the base name is listed in extras_writeback.
    extras: tuple = ()
    # base names of extras whose packed planes the kernel MUTATES (e.g. the
    # "pol" op rewrites the Stokes and frame triples): unpack_state
    # reconstructs these into state.extras after every chunk so boundary
    # passes (compaction, injection, checkpoint) see the kernel's writes.
    # Everything not listed stays read-only (single source of truth: host).
    extras_writeback: tuple = ()
    # |dr| == c*dt for every particle (all photons at speed c): replaces the
    # per-photon norm (sqrt + 5 flops) with one scalar per iteration. The
    # prover enables this only after validating every particle speed.
    const_norm_speed: Optional[float] = None
    # draw theta and phi from one 32-bit sample (16 bits each, 2^-16 angular
    # granularity — far below any statistical tolerance) instead of two.
    packed_angles: bool = False
    # polynomial sin/cos on the known [0,1) range (no range reduction):
    # ~1.1e-3 absolute error, renormalized so |v| stays exact; ~2-3x kernel
    # speedup (the VPU transcendentals dominate the scatter op otherwise).
    fast_trig: bool = False
    # number of per-iteration per-photon output planes (path tracing,
    # per-photon energy capture). The kernel DMAs them from a double-buffered
    # VMEM scratch to an HBM (chunk, n, rows, 128) buffer each iteration —
    # device-resident: nothing streams to the host until the user asks.
    n_stream: int = 0
    # kernel stream stride: planes are offloaded only on iterations where
    # k % stream_every == 0, into row k // stream_every — the buffer's first
    # dim shrinks to ceil(chunk/stream_every). Set by the fusability prover
    # to the gcd of every stream op's stride (strided path tracing: k-fold
    # fewer stream bytes, so k-fold more iterations fit one dispatch).
    stream_every: int = 1
    # stream element dtype: "bfloat16" halves stream bytes (2x iterations
    # per dispatch for unstrided tracing at large N) at ~0.4% relative
    # position precision (8-bit mantissa; full f32 exponent range, so no
    # overflow and NaN death-encoding still works). Chosen by the prover
    # only when EVERY stream source opts in (TracePathMeasureStep(
    # trace_dtype="bfloat16")) and no per-photon E capture shares the
    # buffer.
    stream_dtype: str = "float32"
    # inner unroll factor: U iterations per loop body lets Mosaic software-
    # pipeline across iterations and batches the record-row read-modify-write
    # into one aligned (U, 128) access — measured +75% kernel throughput at
    # U=8 and +85% at U=32 on v5e (plateau beyond). The RNG draw order is
    # unchanged, so results are bitwise identical to U=1. Remainder
    # iterations (k_act % U) run un-unrolled.
    unroll: int = 32


def _vox_specs_of(plan: FusedPlan):
    """Ordered, id-deduplicated voxel-table specs referenced by the plan's
    field callables, plus each op's table slot (-1 = none). Both the
    builder (table inputs) and the kernel (ref rebinding) derive the slot
    mapping from this one traversal, so they can never disagree."""
    slots, specs, by_id = [], [], {}
    for op in plan.ops:
        spec = getattr(op.n_fn, "vox_spec", None)
        if spec is None:
            slots.append(-1)
            continue
        key = id(op.n_fn)
        if key not in by_id:
            by_id[key] = len(specs)
            specs.append(spec)
        slots.append(by_id[key])
    return slots, specs


# spatial walks at/above this many rows use the dynamic row-RANGE walk:
# per evaluation the tile reduces the needed row range [lo, hi] (photon
# flat indices cluster when the population has spatial locality — the
# CT-beam geometry) and fori-walks just that range. r5 probe 6 on chip:
# clustered indices walk a 512-row (64^3) table at 3.8e10 evals/s, 17x
# the full static walk, FLAT in table size; the worst case (uniform
# random indices, range ~= S) costs 6.9e-12 s/row/element vs the static
# walk's 4.5e-12 — a 1.5x regression bounded to pathological
# populations, vs an unconditional 17x win for collimated ones.
_DYN_WALK_MIN_ROWS = 16


def _vmem_table_lookup(tab_ref, flat, tile_rows, s_lo=0, n_seg=None,
                       dynamic=False):
    """``table[flat]`` for a per-photon (tile_rows, 128) int32 index plane,
    walking table rows ``[s_lo, s_lo + n_seg)``. Returns the raw int32
    words (callers bitcast f32 tables back with
    ``lax.bitcast_convert_type``; bit-exact either way).

    Mosaic lowers exactly one gather form — same-shape 2-D
    ``take_along_axis`` (``tpu.dynamic_gather``) — and on hardware its
    reach is ONE vreg along the gather dimension: sublane gathers span 8
    rows ("Multiple source vregs along gather dimension", r4 on-chip),
    lane gathers span the full 128 lanes. The table therefore rides to
    VMEM compactly as ``(ceil(V/128), 128)`` (entry v at ``[v // 128,
    v % 128]``) and the lookup walks it in 128-entry segments: one
    sublane-broadcast of the segment row + one LANE gather + one select
    per segment. ``dynamic=True`` walks only the tile's needed row range
    (see ``_DYN_WALK_MIN_ROWS``) — exact for any population since the
    range covers every lane by construction, and O(1) compile size (the
    ~2048-static-gather Mosaic envelope never binds). ``flat`` must
    already be clipped to ``[0, 128 * n_seg)``."""
    if n_seg is None:
        n_seg = tab_ref.shape[0] - s_lo
    seg_rel = flat >> jnp.int32(7)                      # // 128
    loc = flat & jnp.int32(127)                         # % 128
    if dynamic and n_seg > 1:
        lo = jnp.min(seg_rel)
        hi = jnp.max(seg_rel)
        # pallas Ref tracers still satisfy isinstance(x, jax.Array); the
        # aval (AbstractRef has .inner_aval) is the reliable discriminator
        # between the kernel's VMEM ref and the CPU tests' plain arrays
        is_ref = hasattr(jax.typeof(tab_ref), "inner_aval")

        def row_step(s, acc):
            if is_ref:
                row = tab_ref[pl.ds(s + jnp.int32(s_lo), 1), :]
            else:
                row = jax.lax.dynamic_slice_in_dim(
                    tab_ref, s + jnp.int32(s_lo), 1, axis=0)
            if row.dtype != jnp.int32:
                row = jax.lax.bitcast_convert_type(row, jnp.int32)
            seg = jnp.broadcast_to(row, flat.shape)
            got = jnp.take_along_axis(seg, loc, axis=1)
            return jnp.where(seg_rel == s, got, acc)

        return jax.lax.fori_loop(lo, hi + 1, row_step,
                                 jnp.zeros(flat.shape, jnp.int32))
    out = jnp.zeros(flat.shape, jnp.int32)
    for s in range(n_seg):
        row = tab_ref[s_lo + s:s_lo + s + 1, :]
        if row.dtype != jnp.int32:
            row = jax.lax.bitcast_convert_type(row, jnp.int32)
        seg = jnp.broadcast_to(row, flat.shape)
        got = jnp.take_along_axis(seg, loc, axis=1)
        out = jnp.where(seg_rel == jnp.int32(s), got, out)
    return out


def _codebook_geometry(spec: dict):
    """(bits, codes_per_lane, code_rows, codebook_rows) of a packed
    codebook table — the single source for the builder (_vox_table_of),
    the in-kernel binder (_bind_vox_field) and the unroll gate."""
    bits = int(spec["bits"])
    per = 32 // bits
    n = int(np.asarray(spec["codes"]).size)
    s_codes = -(-n // (per * _LANE))
    s_cb = -(-int(np.asarray(spec["codebook"]).size) // _LANE)
    return bits, per, s_codes, s_cb


def _vox_table_of(spec: dict):
    """The VMEM table of a voxel spec. ``kind == "f32"``: the flat grid
    padded to whole 128-lane rows. ``kind == "codebook"``: packed code
    rows (codes_per_lane codes per int32 word, low bits first) followed
    by the f32 codebook bitcast to int32 — one table input per spec, so
    the kernel plumbing is kind-agnostic."""
    if spec.get("kind", "f32") == "codebook":
        bits, per, s_codes, s_cb = _codebook_geometry(spec)
        codes = np.zeros(s_codes * per * _LANE, np.uint32)
        raw = np.asarray(spec["codes"], np.uint32).reshape(-1)
        codes[:raw.size] = raw
        lanes = codes.reshape(-1, per)
        words = np.zeros(lanes.shape[0], np.uint32)
        for j in range(per):
            words |= lanes[:, j] << np.uint32(bits * j)
        cb = np.zeros(s_cb * _LANE, np.float32)
        cbraw = np.asarray(spec["codebook"], np.float32).reshape(-1)
        cb[:cbraw.size] = cbraw
        return jnp.asarray(np.concatenate([
            words.view(np.int32).reshape(s_codes, _LANE),
            cb.view(np.int32).reshape(s_cb, _LANE)]))
    flat = np.asarray(spec["flat"], np.float32).reshape(-1)
    vpad = -(-flat.size // _LANE) * _LANE
    padded = np.zeros(vpad, np.float32)
    padded[:flat.size] = flat
    return jnp.asarray(padded.reshape(vpad // _LANE, _LANE))


def _vox_walk_segments(spec: dict) -> int:
    """STATICALLY-unrolled table rows per field evaluation (the Mosaic
    compile-size unit for the unroll gate; trilinear evaluates 8
    corners). Spatial walks at/above ``_DYN_WALK_MIN_ROWS`` are dynamic
    fori loops — one gather site regardless of table size."""
    if spec.get("kind", "f32") == "codebook":
        _, _, s_codes, s_cb = _codebook_geometry(spec)
        segs = (s_codes if s_codes < _DYN_WALK_MIN_ROWS else 1) + s_cb
    else:
        segs = -(-int(np.asarray(spec["flat"]).size) // _LANE)
        if segs >= _DYN_WALK_MIN_ROWS:
            segs = 1
    return segs * (8 if spec["interp"] == "trilinear" else 1)


def _bind_vox_field(spec: dict, tab_ref, tile_rows):
    """The in-kernel twin of ``light.voxel_density``'s callable: same
    index/weight arithmetic in the same order (bitwise parity with the
    generic path's direct XLA gather), with the lookup itself routed
    through :func:`_vmem_table_lookup`. Codebook tables (light.py picks
    them whenever the grid has <= 256 distinct values, or the user opts
    into ``quantize=``) look up the packed code word, extract the
    2/4/8-bit code, then dequantize through the (<= 2-row) codebook —
    exact f32 grid values, 4-16x fewer walked rows."""
    nx, ny, nz = spec["shape"]
    ox, oy, oz = spec["origin"]
    sx, sy, sz = spec["spacing"]
    outside = jnp.float32(spec["outside"])
    trilinear = spec["interp"] == "trilinear"

    if spec.get("kind", "f32") == "codebook":
        bits, per, s_codes, s_cb = _codebook_geometry(spec)
        log2per = per.bit_length() - 1
        code_mask = jnp.int32((1 << bits) - 1)
        dyn = s_codes >= _DYN_WALK_MIN_ROWS

        def lookup(flat):
            # spatial code-word walk: dynamic row range for big tables
            # (flat indices cluster with the population); the <= 2-row
            # codebook dequant stays static (code bytes are not spatial)
            word = _vmem_table_lookup(tab_ref, flat >> jnp.int32(log2per),
                                      tile_rows, 0, s_codes, dynamic=dyn)
            code = (word >> ((flat & jnp.int32(per - 1))
                             * jnp.int32(bits))) & code_mask
            got = _vmem_table_lookup(tab_ref, code, tile_rows,
                                     s_codes, s_cb)
            return jax.lax.bitcast_convert_type(got, jnp.float32)
    else:
        n_rows = -(-int(np.asarray(spec["flat"]).size) // _LANE)
        dyn = n_rows >= _DYN_WALK_MIN_ROWS

        def lookup(flat):
            return jax.lax.bitcast_convert_type(
                _vmem_table_lookup(tab_ref, flat, tile_rows, dynamic=dyn),
                jnp.float32)

    def fn(r0, r1, r2):
        fx = (r0 - jnp.float32(ox)) / jnp.float32(sx)
        fy = (r1 - jnp.float32(oy)) / jnp.float32(sy)
        fz = (r2 - jnp.float32(oz)) / jnp.float32(sz)
        if not trilinear:
            inside = ((fx >= -0.5) & (fx < nx - 0.5)
                      & (fy >= -0.5) & (fy < ny - 0.5)
                      & (fz >= -0.5) & (fz < nz - 0.5))
            ix = jnp.clip(jnp.round(fx).astype(jnp.int32), 0, nx - 1)
            iy = jnp.clip(jnp.round(fy).astype(jnp.int32), 0, ny - 1)
            iz = jnp.clip(jnp.round(fz).astype(jnp.int32), 0, nz - 1)
            flat = (ix * jnp.int32(ny) + iy) * jnp.int32(nz) + iz
            val = lookup(flat)
            return jnp.where(inside, val, outside)
        inside = ((fx >= 0) & (fx <= nx - 1) & (fy >= 0) & (fy <= ny - 1)
                  & (fz >= 0) & (fz <= nz - 1))
        x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, nx - 2)
        y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, ny - 2)
        z0 = jnp.clip(jnp.floor(fz).astype(jnp.int32), 0, nz - 2)
        tx = jnp.clip(fx - x0, 0.0, 1.0)
        ty = jnp.clip(fy - y0, 0.0, 1.0)
        tz = jnp.clip(fz - z0, 0.0, 1.0)
        val = jnp.zeros_like(tx)
        for dx_ in (0, 1):
            wx = (1.0 - tx) if dx_ == 0 else tx
            for dy_ in (0, 1):
                wy = (1.0 - ty) if dy_ == 0 else ty
                for dz_ in (0, 1):
                    wz = (1.0 - tz) if dz_ == 0 else tz
                    flat = ((x0 + dx_) * jnp.int32(ny) + (y0 + dy_)) \
                        * jnp.int32(nz) + (z0 + dz_)
                    corner = lookup(flat)
                    val = val + wx * wy * wz * corner
        return jnp.where(inside, val, outside)

    return fn


def _fast_sinpi(y):
    """sin(pi*y) for y in [-1, 1]: parabola + refinement, ~1.1e-3 abs error.

    Statistical physics only needs angle-uniform directions; a 0.06-degree
    worst-case angle error is four orders below the 10% test tolerances.
    """
    p = 4.0 * y * (1.0 - jnp.abs(y))
    return p * (jnp.float32(0.775) + jnp.float32(0.225) * jnp.abs(p))


def _wrap1(x):
    """Map x in [0, 2) (one sine period in pi-units) into [-1, 1)."""
    return x - jnp.where(x > 1.0, jnp.float32(2.0), jnp.float32(0.0))


# Chebyshev-node least-squares fit (degree 8) of log2(1 + t) on [0, 1),
# max abs error 4.9e-8 — same technique as the Planck iCDF fits. Degree 8
# (not 6 at 2.1e-6): _kn_sigma_ratio's exact branch multiplies ln b by
# (1+a)/a^3 = 12 at the a = 0.5 branch switch, and 12 x 2.1e-6 breached
# that function's 2e-5 f64-oracle pin (caught by its test).
_LOG2_MANT_COEF = (
    4.8863580577762396e-08, 1.4426867778259698, -0.7211146144034414,
    0.4783235448682019, -0.34599601243509254, 0.23923166297596724,
    -0.1345342542024613, 0.05027750737261643, -0.008874696651710342)

# degree-5 fit of 2^t on [0, 1), max rel error 1.0e-7
_EXP2_FRAC_COEF = (
    0.9999998957631349, 0.6931546200033143, 0.24014077009166834,
    0.05586328265986017, 0.008946214665550255, 0.0018951072913389714)


def _fast_log2(x):
    """``log2 x`` for positive normal f32 ``x`` with zero transcendentals:
    split ``x = m 2^e`` by exponent-field extraction (bitcast + shifts,
    all Pallas-safe), then ``e + log2 m`` with the degree-8 mantissa
    polynomial above. Uniformly accurate (abs err ~4.9e-8, exact exponent
    term) across the whole normal range — unlike a truncated series, the
    far ends (x -> 2^-126 or 2^127) lose nothing."""
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    e = (jax.lax.shift_right_logical(bits, 23) & jnp.int32(0xFF)) \
        - jnp.int32(127)
    m_bits = (bits & jnp.int32(0x007FFFFF)) | jnp.int32(127 << 23)
    t = jax.lax.bitcast_convert_type(m_bits, jnp.float32) - jnp.float32(1.0)
    p = jnp.float32(_LOG2_MANT_COEF[-1])
    for c in _LOG2_MANT_COEF[-2::-1]:
        p = p * t + jnp.float32(c)
    return e.astype(jnp.float32) + p


def _fast_exp2(x):
    """``2^x`` for f32 ``x`` in (-126, 127) with zero transcendentals:
    split ``x = n + f`` (integer floor + fraction in [0, 1)), evaluate
    ``2^f`` with the degree-5 polynomial above (1.0e-7 rel error) and
    scale by ``2^n`` through direct exponent-field construction
    (``(n + 127) << 23`` bitcast to f32 — exact)."""
    n = jnp.floor(x)
    f = x - n
    p = jnp.float32(_EXP2_FRAC_COEF[-1])
    for c in _EXP2_FRAC_COEF[-2::-1]:
        p = p * f + jnp.float32(c)
    scale_bits = jax.lax.shift_left(n.astype(jnp.int32) + jnp.int32(127),
                                    jnp.int32(23))
    return p * jax.lax.bitcast_convert_type(scale_bits, jnp.float32)


def _fast_neg2log(u):
    """``-2 ln u`` for f32 ``u`` in (0, 1] — the Box-Muller radius-squared —
    via :func:`_fast_log2`. Uniformly accurate in ln (abs err ~7e-8),
    so the Maxwell speed tail is as deep as the draw itself reaches
    (u -> 2^-32 is a 6.6-sigma electron and stays exact)."""
    return jnp.float32(-2.0 * np.log(2.0)) * _fast_log2(u)


def _fast_angles(tu, pu):
    """(sin, cos) of theta=2*pi*tu and phi=pi*pu for tu,pu in [0,1)."""
    two_tu = 2.0 * tu
    sin_t = _fast_sinpi(_wrap1(two_tu))
    cos_t = _fast_sinpi(_wrap1(two_tu + jnp.float32(0.5)))
    sin_p = _fast_sinpi(pu)
    cos_p = _fast_sinpi(_wrap1(pu + jnp.float32(0.5)))
    return sin_t, cos_t, sin_p, cos_p


def _kn_triples(rng, plan, shape, tries):
    """Draw the Klein-Nishina Kahn-loop uniforms — one layout for every
    compton variant (cold and thermal) so the samplers can never
    desynchronize. Under packed_angles the (r2, r3) pair shares one
    hardware draw (16-bit halves; acceptance tests, not tail-sensitive).

    STATIC unroll, deliberately: a lax.fori_loop form of the Kahn chain
    (draws inside the loop body) was measured 25-30% SLOWER end-to-end on
    chip (compton/thermal rows, r4b run — sequentially-dependent loop
    bodies lose Mosaic's software pipelining), and with the 64 MB
    scoped-VMEM budget the unrolled chain's ``tries x ~12`` live
    (tile, 128) planes fit comfortably."""
    triples = []
    for _ in range(tries):
        if plan.packed_angles:
            r1 = rng.uniform(shape)
            r2, r3 = rng.uniform_pair(shape)
        else:
            r1, r2, r3 = (rng.uniform(shape), rng.uniform(shape),
                          rng.uniform(shape))
        triples.append((r1, r2, r3))
    return triples


def _kn_cos_eta_fused(alpha, rng, plan, shape, tries):
    """Klein-Nishina sampler for the fused kernel: up-front unrolled
    draws + the shared unrolled Kahn math (light._kn_cos_eta)."""
    from physicl_tpu.light import _kn_cos_eta

    return _kn_cos_eta(alpha, _kn_triples(rng, plan, shape, tries),
                       jnp.float32, fast=plan.fast_trig)


def _unit_dir(f):
    """Unit velocity direction from the packed field planes."""
    inv_v = jax.lax.rsqrt(jnp.maximum(
        f[_VX] * f[_VX] + f[_VY] * f[_VY] + f[_VZ] * f[_VZ],
        jnp.float32(1e-30)))
    return f[_VX] * inv_v, f[_VY] * inv_v, f[_VZ] * inv_v


def _bisect_phi_sincos(u, a, b, iters: int = 26):
    """(sin phi, cos phi, sin 2phi, cos 2phi) of the polarized-azimuth
    inverse CDF: solve ``phi + (a/2) sin 2phi + (b/2)(1 - cos 2phi) =
    2pi u`` on [0, 2pi] by monotone bisection (the kernel twin of
    polarization._bisect_phi; resolution 2pi*2^-iters — the generic twin
    always bisects 26 deep, the fused packed-angle path stops at 17,
    matching its 16-bit draw).

    Mosaic-friendly trick: instead of evaluating sin/cos of the midpoint
    each step, carry ``(sin 2*lo, cos 2*lo)`` — the DOUBLE angle, which
    is what the CDF itself needs — and ROTATE by the static interval
    angle ``2*delta_k = pi/2^(k-1)``; the rotation coefficients are
    compile-time f32 constants, so the whole inversion is multiply-adds
    with zero in-loop transcendentals. The constant ``b/2`` term is
    folded into the target (``fv = mid + (a/2) sin2 - (b/2) cos2`` vs
    ``target - b/2``), and the k = 0 rotation (by 2pi) is the identity —
    net 9 fewer model ops per iteration than the half-angle/double-angle
    form this replaces (r5: 669 -> ~540 ops on the pol body).

    The half-angle pair is reconstructed ONCE at the end, cancellation-
    free: the larger of (|sin phi|, |cos phi|) from its well-conditioned
    half-angle sqrt (the argument is >= 1/2 on the selected branch), the
    smaller from ``sin 2phi = 2 sin phi cos phi`` (an exact division by
    the large component, sign riding along); explicit signs come from
    the carried interval endpoint, which is only consulted away from its
    own flip boundaries. f32 rotation drift over 26 composed rotations
    is ~3e-6; the pair is renormalized before extraction. ``iters`` is
    17 for packed-angle draws (the uniform has exactly 16 bits — finer
    bisection refines quantization noise; inversion error < the 9.6e-5
    draw granularity, pinned vs an f64 oracle in
    tests/test_polarization.py) and 26 for full-width draws.
    """
    two_pi = jnp.float32(2.0 * np.pi)
    half = jnp.float32(0.5)
    ha = half * a
    hb = half * b
    target = u * two_pi - hb
    lo = jnp.zeros_like(u)
    s2 = jnp.zeros_like(u)    # sin 2*lo
    c2 = jnp.ones_like(u)     # cos 2*lo
    # STATIC unroll, deliberately: a lax.fori_loop form of this chain was
    # measured 31% SLOWER end-to-end on chip (polarized row, r4b run —
    # sequentially-dependent loop bodies lose Mosaic's software
    # pipelining), and with the 64 MB scoped-VMEM budget its stack
    # footprint (~0.4M of the pol op's 17.4M) no longer matters
    for k in range(iters):
        delta = np.pi / (1 << k)
        mid = lo + jnp.float32(delta)
        if k == 0:
            s2_m, c2_m = s2, c2   # rotation by 2*delta = 2pi: identity
        else:
            sd = jnp.float32(np.sin(2.0 * delta))
            cd = jnp.float32(np.cos(2.0 * delta))
            s2_m = s2 * cd + c2 * sd
            c2_m = c2 * cd - s2 * sd
        fv = (mid + ha * s2_m) - hb * c2_m
        go_hi = fv < target
        lo = jnp.where(go_hi, mid, lo)
        s2 = jnp.where(go_hi, s2_m, s2)
        c2 = jnp.where(go_hi, c2_m, c2)
    # final midpoint: one more half-interval rotation
    delta = np.pi / (1 << iters)
    sd = jnp.float32(np.sin(2.0 * delta))
    cd = jnp.float32(np.cos(2.0 * delta))
    s2_f = s2 * cd + c2 * sd
    c2_f = c2 * cd - s2 * sd
    phi = lo + jnp.float32(delta)
    # renormalize the pair so the composed-rotation drift cannot leak into
    # the direction/Stokes algebra downstream
    inv = jax.lax.rsqrt(jnp.maximum(s2_f * s2_f + c2_f * c2_f,
                                    jnp.float32(1e-30)))
    s2_f = s2_f * inv
    c2_f = c2_f * inv
    # half-angle extraction (see docstring): cos 2phi >= 0 <=>
    # cos^2 phi >= 1/2, so the sqrt branch chosen is always the
    # well-conditioned one and the division is by a component >= 1/sqrt2
    big_c = c2_f >= 0
    cp_mag = jnp.sqrt((1.0 + c2_f) * half)
    sp_mag = jnp.sqrt((1.0 - c2_f) * half)
    pos1 = jnp.float32(1.0)
    neg1 = jnp.float32(-1.0)
    sign_c = jnp.where((phi < jnp.float32(0.5 * np.pi))
                       | (phi > jnp.float32(1.5 * np.pi)), pos1, neg1)
    sign_s = jnp.where(phi < jnp.float32(np.pi), pos1, neg1)
    cp_big = sign_c * cp_mag
    sp_big = sign_s * sp_mag
    hs2 = s2_f * half
    cos_p = jnp.where(big_c, cp_big,
                      hs2 / jnp.where(big_c, pos1, sp_big))
    sin_p = jnp.where(big_c, hs2 / jnp.where(big_c, cp_big, pos1),
                      sp_big)
    return sin_p, cos_p, s2_f, c2_f


def _emit_iteration(plan: FusedPlan, k, dt, fields, rng: "_Rng",
                    emit_starts_ref=None, gidx=None, t=None):
    """Run one simulation iteration on VMEM-resident field values.

    ``fields`` is a list of 15 (tile_rows, 128) f32 arrays; returns
    (updated fields, record row (1, 128) int32). Ops execute in the plan's
    order == step insertion order (reference semantics,
    physicl/__init__.py:514). ``emit_starts_ref[(op_idx, k)]`` gives emitter
    slot starts (-1 = inactive this iteration); ``gidx`` is each element's
    global slot index.
    """
    f = list(fields)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, _MAX_REC_COLS), 1)
    row = jnp.zeros((1, _MAX_REC_COLS), jnp.int32)
    row_f = jnp.zeros((1, _MAX_REC_COLS), jnp.float32)
    stream: List = [None] * plan.n_stream
    _nan = jnp.float32(np.nan)

    def put(row, col, val):
        return jnp.where(col_iota == col, val.astype(jnp.int32), row)

    def put_f(row_f, col, val):
        return jnp.where(col_iota == col, val.astype(jnp.float32), row_f)

    alive_b = f[_ALIVE] > 0
    shape = f[_RX].shape
    # Photon physics gate: on photon-only plans the mask is alive_b itself
    # (no per-particle dispatch — compiles away); on mixed plans the packed
    # otype plane selects the photon subset, matching the generic path's
    # `state.otype == OBJ_PHOTON` filters. Pure-generic plans never carry
    # photon ops (prover refusal). Evaluated per op because alive_b mutates
    # through the pipeline (deletes, roulette, custom kills).
    if plan.species == SPECIES_MIXED:
        is_ph = (f[_NF + plan.extras.index("otype")]
                 == jnp.float32(OBJ_PHOTON))
    else:
        is_ph = None

    def ph_alive():
        return alive_b if is_ph is None else (alive_b & is_ph)

    def dr_norm():
        if plan.const_norm_speed is not None:
            # all particles move at speed c: |dr| = c*dt, one scalar
            return jnp.float32(plan.const_norm_speed) * dt
        return jnp.sqrt(f[_DRX] ** 2 + f[_DRY] ** 2 + f[_DRZ] ** 2)

    for op in plan.ops:
        if op.kind == "kin":
            for d in range(3):
                dr = f[_VX + d] * dt
                f[_DRX + d] = dr
                f[_RX + d] = f[_RX + d] + dr
        elif op.kind == "del":
            pcoll = jnp.float32(op.coef) * dr_norm()
            if op.a_fn is not None:  # energy-dependent cross-section
                pcoll = pcoll * op.a_fn(f[_E]).astype(jnp.float32)
            if op.n_fn is not None:  # variable number density n(r)
                pcoll = pcoll * op.n_fn(f[_RX], f[_RY], f[_RZ]).astype(
                    jnp.float32)
            if op.implicit_capture:
                # survival biasing: deterministic weight decay, no draw
                sel = ph_alive()
                p = jnp.clip(pcoll, jnp.float32(0.0), jnp.float32(1.0))
                if op.cols:  # deposited energy: exact expectation w*p*E
                    row_f = put_f(row_f, op.cols[0], jnp.sum(
                        jnp.where(sel, f[_W] * p * f[_E], 0.0)))
                f[_W] = jnp.where(sel, f[_W] * (jnp.float32(1.0) - p),
                                  f[_W])
                if op.roulette:
                    w_min = jnp.float32(op.roulette[0])
                    w_sur = jnp.float32(op.roulette[1])
                    u = rng.uniform(shape)
                    low = sel & (f[_W] < w_min)
                    kill = low & (u * w_sur >= f[_W])
                    f[_W] = jnp.where(low & jnp.logical_not(kill), w_sur,
                                      f[_W])
                    alive_b = alive_b & jnp.logical_not(kill)
                    f[_ALIVE] = alive_b.astype(jnp.float32)
            elif op.stretch:
                # exponential transform: biased kill + likelihood-ratio
                # reweighting (mirrors the generic apply exactly)
                u = rng.uniform(shape)
                sel = ph_alive()
                tiny = jnp.float32(1e-30)
                b, dx, dy, dz = (jnp.float32(x) for x in op.stretch)
                mu = ((f[_DRX] * dx + f[_DRY] * dy + f[_DRZ] * dz)
                      / jnp.maximum(dr_norm(), tiny))
                one = jnp.float32(1.0)
                p_true = jnp.clip(pcoll, jnp.float32(0.0), one)
                p_bias = jnp.clip(pcoll * (one - b * mu),
                                  jnp.float32(0.0), one)
                # cap saturating biased kills (p_true < 1 must keep a
                # survivor branch or its weight is lost — see the generic
                # apply's comment; bound: 8x weight amplification)
                p_bias = jnp.where(p_true < one,
                                   jnp.minimum(p_bias,
                                               jnp.float32(7.0 / 8.0)),
                                   p_bias)
                hit = (p_bias >= u) & sel
                ratio = (one - p_true) / jnp.maximum(one - p_bias, tiny)
                f[_W] = jnp.where(sel & jnp.logical_not(hit),
                                  f[_W] * ratio, f[_W])
                if op.cols:
                    row_f = put_f(row_f, op.cols[0], jnp.sum(jnp.where(
                        hit, f[_W] * f[_E]
                        * (p_true / jnp.maximum(p_bias, tiny)), 0.0)))
                alive_b = alive_b & jnp.logical_not(hit)
                f[_ALIVE] = alive_b.astype(jnp.float32)
            elif op.fluor:
                # fluorescent re-emission: absorbed photons above the edge
                # re-emit at the line energy with yield probability Y
                # (mirrors the generic apply's branch exactly)
                u = rng.uniform(shape)
                hit = (pcoll >= u) & ph_alive()
                Y, E_f, E_edge = (jnp.float32(x) for x in op.fluor)
                y = rng.uniform(shape)
                if plan.packed_angles:
                    cu, au = rng.uniform_pair(shape)
                else:
                    cu, au = rng.uniform(shape), rng.uniform(shape)
                fluo = hit & (y < Y) & (f[_E] >= E_edge)
                killed = hit & jnp.logical_not(fluo)
                if op.cols:  # deficit for re-emitted, all of E for killed
                    row_f = put_f(row_f, op.cols[0], jnp.sum(jnp.where(
                        killed, f[_W] * f[_E], jnp.where(
                            fluo, f[_W] * (f[_E] - E_f),
                            jnp.float32(0.0)))))
                # TRUE isotropic (physical emission; cos-theta uniform —
                # not the scatter family's reference-parity convention)
                cos_t = 2.0 * cu - jnp.float32(1.0)
                sin_t = jnp.sqrt(jnp.maximum(
                    jnp.float32(1.0) - cos_t * cos_t, jnp.float32(0.0)))
                two_au = 2.0 * au
                sin_a = _fast_sinpi(_wrap1(two_au))
                cos_a = _fast_sinpi(_wrap1(two_au + jnp.float32(0.5)))
                nx, ny, nz = sin_t * cos_a, sin_t * sin_a, cos_t
                inv = jax.lax.rsqrt(jnp.maximum(
                    nx * nx + ny * ny + nz * nz, jnp.float32(1e-30)))
                cval = jnp.float32(op.c_val) * inv
                vnew = (cval * nx, cval * ny, cval * nz)
                for d in range(3):
                    old = f[_VX + d]
                    f[_VX + d] = jnp.where(fluo, vnew[d], old)
                    # dv only on re-emitted lanes: upstream scatter flags
                    # from this iteration must survive (plain del never
                    # touches dv)
                    f[_DVX + d] = jnp.where(fluo, vnew[d] - old,
                                            f[_DVX + d])
                f[_E] = jnp.where(fluo, E_f, f[_E])
                # fluorescence light is unpolarized: zero Stokes/frame
                # planes of re-emitted lanes (matches the generic apply)
                for j, name in enumerate(plan.extras):
                    if name.split(":")[0] in ("stokes", "pol_ref"):
                        f[_NF + j] = jnp.where(fluo, jnp.float32(0.0),
                                               f[_NF + j])
                alive_b = alive_b & jnp.logical_not(killed)
                f[_ALIVE] = alive_b.astype(jnp.float32)
            else:
                u = rng.uniform(shape)
                hit = (pcoll >= u) & ph_alive()
                if op.cols:  # deposited energy: killed photons dump w*E
                    row_f = put_f(row_f, op.cols[0], jnp.sum(
                        jnp.where(hit, f[_W] * f[_E], 0.0)))
                alive_b = alive_b & jnp.logical_not(hit)
                f[_ALIVE] = alive_b.astype(jnp.float32)
        elif op.kind == "iso":
            pcoll = jnp.float32(op.coef) * dr_norm()
            if op.n_fn is not None:
                pcoll = pcoll * op.n_fn(f[_RX], f[_RY], f[_RZ]).astype(
                    jnp.float32
                )
            if op.wl_base is not None:
                base = f[_E] * jnp.float32(op.wl_base)
                b2 = base * base
                pcoll = pcoll * (b2 * b2)
            u = rng.uniform(shape)
            if plan.packed_angles:
                tu, pu = rng.uniform_pair(shape)
            else:
                tu, pu = rng.uniform(shape), rng.uniform(shape)
            scatter = (pcoll >= u) & ph_alive()
            if plan.fast_trig:
                sin_t, cos_t, sin_p, cos_p = _fast_angles(tu, pu)
                # renormalize so |v| stays exactly the particle speed
                nx, ny, nz = sin_t * cos_p, sin_t * sin_p, cos_t
                inv = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz)
                cval = jnp.float32(op.c_val) * inv
                vnew = (cval * nx, cval * ny, cval * nz)
            else:
                theta = tu * jnp.float32(2 * np.pi)
                phi = pu * jnp.float32(np.pi)
                sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
                sin_p, cos_p = jnp.sin(phi), jnp.cos(phi)
                cval = jnp.float32(op.c_val)
                vnew = (cval * sin_t * cos_p, cval * sin_t * sin_p,
                        cval * cos_t)
            for d in range(3):
                old = f[_VX + d]
                f[_VX + d] = jnp.where(scatter, vnew[d], old)
                f[_DVX + d] = jnp.where(scatter, vnew[d] - old,
                                        jnp.float32(0.0))
        elif op.kind == "compton" and op.theta_e > 0.0:
            # Thermal Comptonization: Maxwell electron draw, relativistic
            # flux-weighted collision rate, exact KN in the electron frame
            # (light._ic_thermal_scatter does the boosts + rotation; the
            # Kompaneets drift <dE/E> = 4 theta_e - alpha emerges)
            from physicl_tpu.light import _ic_thermal_scatter, \
                _kn_sigma_ratio

            pcoll = jnp.float32(op.coef) * dr_norm()
            if op.n_fn is not None:
                pcoll = pcoll * op.n_fn(f[_RX], f[_RY], f[_RZ]).astype(
                    jnp.float32)
            u = rng.uniform(shape)
            pu = rng.uniform(shape)
            # Box-Muller RADIUS uniforms (u4[0], u4[2]) need full-precision
            # draws: 16-bit pair halves truncate the Maxwell speed tail at
            # 4.7 sigma (with a clamp atom at 7.4) where the generic path
            # reaches 5.8 — angles (u4[1], u4[3]) are tail-insensitive
            if plan.packed_angles:
                a1, a2 = rng.uniform_pair(shape)
                u4 = (rng.uniform(shape), a1, rng.uniform(shape), a2)
            else:
                u4 = tuple(rng.uniform(shape) for _ in range(4))
            nhat = _unit_dir(f)
            E_new, n_new, alpha1, flux, kn_ok = _ic_thermal_scatter(
                f[_E], nhat, op.inv_mec2, op.theta_e, u4,
                lambda a1: _kn_cos_eta_fused(a1, rng, plan, shape,
                                            op.kn_tries), pu,
                jnp.float32, fast_trig=plan.fast_trig)
            pcoll = pcoll * flux
            if op.kn_xsec:
                pcoll = pcoll * _kn_sigma_ratio(alpha1, jnp.float32,
                                                fast=plan.fast_trig)
            scatter = (pcoll >= u) & ph_alive() & kn_ok
            cval = jnp.float32(op.c_val)
            for d in range(3):
                old = f[_VX + d]
                f[_VX + d] = jnp.where(scatter, n_new[d] * cval, old)
                f[_DVX + d] = jnp.where(scatter, n_new[d] * cval - old,
                                        jnp.float32(0.0))
            if op.cols:  # Compton heating: net energy to electrons
                # (signed: negative when inverse Compton pumps photons)
                row_f = put_f(row_f, op.cols[0], jnp.sum(
                    jnp.where(scatter, f[_W] * (f[_E] - E_new), 0.0)))
            f[_E] = jnp.where(scatter, E_new, f[_E])
        elif op.kind in ("hg", "rayl", "compton", "phase"):
            # Anisotropic scatter: same collision model as "iso", outgoing
            # direction drawn RELATIVE to the incoming one. "hg": exact
            # Henyey-Greenstein inverse CDF (<cos theta> == g). "rayl":
            # exact Rayleigh dipole phase (3/8)(1+cos^2) via the Cardano
            # closed form (light._rayleigh_cos_theta; <cos^2 theta> == 2/5).
            # "compton": exact Klein-Nishina (Kahn/Koblinger per-photon
            # selection, light._kn_cos_eta) + the E' = E/eta recoil shift —
            # the only op that rewrites the energy plane in-flight.
            pcoll = jnp.float32(op.coef) * dr_norm()
            if op.n_fn is not None:
                pcoll = pcoll * op.n_fn(f[_RX], f[_RY], f[_RZ]).astype(
                    jnp.float32)
            if op.wl_base is not None:
                base = f[_E] * jnp.float32(op.wl_base)
                b2 = base * base
                pcoll = pcoll * (b2 * b2)
            eta = None
            if op.kind == "compton":
                from physicl_tpu.light import _kn_sigma_ratio

                alpha = f[_E] * jnp.float32(op.inv_mec2)
                if op.kn_xsec:
                    pcoll = pcoll * _kn_sigma_ratio(
                        alpha, jnp.float32, fast=plan.fast_trig)
                u = rng.uniform(shape)
                pu = rng.uniform(shape)
                cos_t, eta, kn_ok = _kn_cos_eta_fused(alpha, rng, plan,
                                                     shape, op.kn_tries)
                scatter = (pcoll >= u) & ph_alive() & kn_ok
            else:
                u = rng.uniform(shape)
                if plan.packed_angles:
                    cu, pu = rng.uniform_pair(shape)
                else:
                    cu, pu = rng.uniform(shape), rng.uniform(shape)
                scatter = (pcoll >= u) & ph_alive()
            if op.kind == "compton":
                pass  # cos_t already sampled above
            elif op.kind == "phase":
                # user inverse CDF traced into the kernel (gather-free by
                # contract: callable or the tabulated mask-multiply form)
                cos_t = jnp.clip(op.custom_fn(cu).astype(jnp.float32),
                                 jnp.float32(-1.0), jnp.float32(1.0))
            elif op.kind == "rayl":
                from physicl_tpu.light import _rayleigh_cos_theta

                cos_t = _rayleigh_cos_theta(cu, jnp.float32,
                                            fast=plan.fast_trig)
            elif abs(op.g) < 1e-7:
                cos_t = 2.0 * cu - 1.0  # exact isotropic limit
            else:
                gg = jnp.float32(op.g)
                s = (1.0 - gg * gg) / (1.0 - gg + 2.0 * gg * cu)
                cos_t = jnp.clip((1.0 + gg * gg - s * s) / (2.0 * gg),
                                 jnp.float32(-1.0), jnp.float32(1.0))
            sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t,
                                         jnp.float32(0.0)))
            if plan.fast_trig:
                two_pu = 2.0 * pu
                sin_p = _fast_sinpi(_wrap1(two_pu))
                cos_p = _fast_sinpi(_wrap1(two_pu + jnp.float32(0.5)))
                # normalize the azimuth pair: the ~1e-3 polynomial norm
                # error would otherwise leak into the POLAR angle through
                # the final renormalization (skewing cos_theta by ~1e-4 —
                # for compton that breaks the exact E'-angle relation)
                inv_p = jax.lax.rsqrt(sin_p * sin_p + cos_p * cos_p)
                sin_p = sin_p * inv_p
                cos_p = cos_p * inv_p
            else:
                phi = pu * jnp.float32(2 * np.pi)
                sin_p, cos_p = jnp.sin(phi), jnp.cos(phi)
            # unit incoming direction; branch-free orthonormal basis
            # (Duff et al. 2017), robust incl. +-z
            inv_v = jax.lax.rsqrt(jnp.maximum(
                f[_VX] * f[_VX] + f[_VY] * f[_VY] + f[_VZ] * f[_VZ],
                jnp.float32(1e-30)))
            dx, dy, dz = (f[_VX] * inv_v, f[_VY] * inv_v, f[_VZ] * inv_v)
            sign = jnp.where(dz >= 0, jnp.float32(1.0), jnp.float32(-1.0))
            a = -1.0 / (sign + dz)
            b = dx * dy * a
            e1 = (1.0 + sign * dx * dx * a, sign * b, -sign * dx)
            e2 = (b, sign + dy * dy * a, -dy)
            n_new = tuple(
                cos_t * dd + sin_t * (cos_p * uu + sin_p * ww)
                for dd, uu, ww in zip((dx, dy, dz), e1, e2))
            # renormalize so |v| stays exactly the particle speed
            inv_n = jax.lax.rsqrt(n_new[0] * n_new[0] + n_new[1] * n_new[1]
                                  + n_new[2] * n_new[2])
            cval = jnp.float32(op.c_val) * inv_n
            for d in range(3):
                old = f[_VX + d]
                f[_VX + d] = jnp.where(scatter, n_new[d] * cval, old)
                f[_DVX + d] = jnp.where(scatter, n_new[d] * cval - old,
                                        jnp.float32(0.0))
            if eta is not None:  # Compton recoil: E' = E / eta
                if op.cols:  # heating tally: w * (E - E') over scatters
                    row_f = put_f(row_f, op.cols[0], jnp.sum(jnp.where(
                        scatter, f[_W] * (f[_E] - f[_E] / eta), 0.0)))
                f[_E] = jnp.where(scatter, f[_E] / eta, f[_E])
        elif op.kind in ("pol", "polc"):
            # Stokes-polarized scatter (polarization module): "pol" is
            # Rayleigh/Thomson (dipole theta marginal, kappa = 2), "polc"
            # is Compton (Klein-Nishina theta + Fano matrix with
            # kappa = eta + 1/eta and the E' = E/eta recoil). (theta, phi)
            # are drawn from the FULL polarized intensity; the Stokes +
            # frame triples (packed extras planes, writeback) rewrite per
            # scatter. Mirrors the generic _apply_phase_matrix exactly
            # (same masks, clips, frame fallback) up to PRNG stream and
            # the bisection's in-kernel trig recurrences.
            from physicl_tpu.light import (_kn_sigma_ratio,
                                           _rayleigh_cos_theta)

            st_p, pr_p = op.pol_planes
            pcoll = jnp.float32(op.coef) * dr_norm()
            if op.n_fn is not None:
                pcoll = pcoll * op.n_fn(f[_RX], f[_RY], f[_RZ]).astype(
                    jnp.float32)
            if op.wl_base is not None:
                base = f[_E] * jnp.float32(op.wl_base)
                b2 = base * base
                pcoll = pcoll * (b2 * b2)
            eta = None
            if op.kind == "polc":
                alpha = f[_E] * jnp.float32(op.inv_mec2)
                if op.kn_xsec:
                    pcoll = pcoll * _kn_sigma_ratio(
                        alpha, jnp.float32, fast=plan.fast_trig)
                u = rng.uniform(shape)
                pu = rng.uniform(shape)
                cos_t, eta, kn_ok = _kn_cos_eta_fused(alpha, rng, plan,
                                                     shape, op.kn_tries)
                kappa = eta + 1.0 / eta
                scatter = (pcoll >= u) & ph_alive() & kn_ok
            else:
                u = rng.uniform(shape)
                if plan.packed_angles:
                    cu, pu = rng.uniform_pair(shape)
                else:
                    cu, pu = rng.uniform(shape), rng.uniform(shape)
                kappa = jnp.float32(2.0)
                scatter = (pcoll >= u) & ph_alive()

            # local right-handed frame (e1, e2, d): stored pol_ref
            # re-orthonormalized against d, fresh perpendicular where
            # degenerate (zero-filled slots / unpolarized injections)
            dx, dy, dz = _unit_dir(f)
            q = f[st_p]
            u_st = f[st_p + 1]
            v_st = f[st_p + 2]
            dot = dx * f[pr_p] + dy * f[pr_p + 1] + dz * f[pr_p + 2]
            p0 = f[pr_p] - dot * dx
            p1 = f[pr_p + 1] - dot * dy
            p2 = f[pr_p + 2] - dot * dz
            n2 = p0 * p0 + p1 * p1 + p2 * p2
            inv_n = jax.lax.rsqrt(jnp.maximum(n2, jnp.float32(1e-30)))
            # fallback: z-hat where |dz| < 0.9 else y-hat, orthonormalized
            # (generic path's _perp_candidate + _orthonormal_ref)
            use_z = jnp.abs(dz) < jnp.float32(0.9)
            cy = jnp.where(use_z, jnp.float32(0.0), jnp.float32(1.0))
            cz = jnp.where(use_z, jnp.float32(1.0), jnp.float32(0.0))
            dotc = dy * cy + dz * cz
            fb0 = -dotc * dx
            fb1 = cy - dotc * dy
            fb2 = cz - dotc * dz
            inv_fb = jax.lax.rsqrt(jnp.maximum(
                fb0 * fb0 + fb1 * fb1 + fb2 * fb2, jnp.float32(1e-30)))
            degen = n2 < jnp.float32(1e-8)  # == (norm < 1e-4) generically
            e1x = jnp.where(degen, fb0 * inv_fb, p0 * inv_n)
            e1y = jnp.where(degen, fb1 * inv_fb, p1 * inv_n)
            e1z = jnp.where(degen, fb2 * inv_fb, p2 * inv_n)
            # (e2 = d x e1 is computed after the azimuth inversion below —
            # three fewer planes live across the bisection loop)

            # theta: dipole marginal (pol, Cardano) already or KN (polc,
            # sampled above); then phi | theta from the exact conditional
            # 1 + a cos2phi + b sin2phi by recurrence bisection, with
            # r = -sin^2/(kappa - sin^2) (kappa = 2 == the dipole limit)
            if op.kind == "pol":
                cos_t = _rayleigh_cos_theta(cu, jnp.float32,
                                            fast=plan.fast_trig)
            c2 = cos_t * cos_t
            s2_ = 1.0 - c2
            r_t = -s2_ / (kappa - s2_)
            # packed angles give pu exactly 16 bits: bisecting past
            # 2pi*2^-17 refines quantization noise (polc draws a full-
            # width uniform and keeps the 26-step resolution)
            phi_iters = (17 if op.kind == "pol" and plan.packed_angles
                         else 26)
            sin_p, cos_p, sin2p, cos2p = _bisect_phi_sincos(
                pu, r_t * q, r_t * u_st, iters=phi_iters)

            # rotate Stokes into the scattering plane, apply the Fano
            # phase matrix (Thomson rows at kappa = 2), renormalize to I=1
            q_r = q * cos2p + u_st * sin2p
            u_r = u_st * cos2p - q * sin2p
            i_new = (kappa - s2_) - s2_ * q_r
            inv_i = 1.0 / jnp.maximum(i_new, jnp.float32(1e-7))
            one = jnp.float32(1.0)
            q_new = jnp.clip((-s2_ + (1.0 + c2) * q_r) * inv_i, -one, one)
            u_new = jnp.clip(2.0 * cos_t * u_r * inv_i, -one, one)
            v_new_st = jnp.clip(kappa * cos_t * v_st * inv_i, -one, one)
            # over-purity clamp near the Mueller null (generic twin does
            # the same): rescale only when f32 roundoff pushed p past 1
            pp2 = q_new * q_new + u_new * u_new + v_new_st * v_new_st
            pscale = jax.lax.rsqrt(jnp.maximum(pp2, one))
            q_new = q_new * pscale
            u_new = u_new * pscale
            v_new_st = v_new_st * pscale

            # new direction d' = cos_t d + sin_t a, frame e1' = cos_t a -
            # sin_t d (a = cos_p e1 + sin_p e2); both renormalized
            sin_t = jnp.sqrt(jnp.maximum(1.0 - c2, jnp.float32(0.0)))
            e2x = dy * e1z - dz * e1y
            e2y = dz * e1x - dx * e1z
            e2z = dx * e1y - dy * e1x
            ax_ = cos_p * e1x + sin_p * e2x
            ay_ = cos_p * e1y + sin_p * e2y
            az_ = cos_p * e1z + sin_p * e2z
            ndx = cos_t * dx + sin_t * ax_
            ndy = cos_t * dy + sin_t * ay_
            ndz = cos_t * dz + sin_t * az_
            inv_dn = jax.lax.rsqrt(jnp.maximum(
                ndx * ndx + ndy * ndy + ndz * ndz, jnp.float32(1e-30)))
            cval = jnp.float32(op.c_val) * inv_dn
            for d_i, nd in enumerate((ndx, ndy, ndz)):
                old = f[_VX + d_i]
                f[_VX + d_i] = jnp.where(scatter, nd * cval, old)
                f[_DVX + d_i] = jnp.where(scatter, nd * cval - old,
                                          jnp.float32(0.0))
            n1x = cos_t * ax_ - sin_t * dx
            n1y = cos_t * ay_ - sin_t * dy
            n1z = cos_t * az_ - sin_t * dz
            inv_e1 = jax.lax.rsqrt(jnp.maximum(
                n1x * n1x + n1y * n1y + n1z * n1z, jnp.float32(1e-30)))
            # non-scattering slots keep the RE-ORTHONORMALIZED frame (the
            # generic path stores it back every iteration, which is what
            # stops f32 frame drift from accumulating)
            f[st_p] = jnp.where(scatter, q_new, q)
            f[st_p + 1] = jnp.where(scatter, u_new, u_st)
            f[st_p + 2] = jnp.where(scatter, v_new_st, v_st)
            f[pr_p] = jnp.where(scatter, n1x * inv_e1, e1x)
            f[pr_p + 1] = jnp.where(scatter, n1y * inv_e1, e1y)
            f[pr_p + 2] = jnp.where(scatter, n1z * inv_e1, e1z)
            if eta is not None:  # polc: Compton recoil E' = E / eta
                if op.cols:  # heating tally: w * (E - E') over scatters
                    row_f = put_f(row_f, op.cols[0], jnp.sum(jnp.where(
                        scatter, f[_W] * (f[_E] - f[_E] / eta), 0.0)))
                f[_E] = jnp.where(scatter, f[_E] / eta, f[_E])
        elif op.kind == "polmeas":
            # polarization summary (polarization.StokesMeasureStep): weight,
            # degree-of-polarization, and Stokes component sums over alive
            # photons into float record channels; the host divides by the
            # weight sum to recover the generic path's means (tile sums add
            # across the grid and psum across shards)
            (st_p,) = op.pol_planes
            n_col, f0 = op.cols
            if n_col >= 0:
                row = put(row, n_col, jnp.sum(alive_b, dtype=jnp.int32))
            # ALL alive particles, matching the generic apply's state.alive
            # weighting (not photon-gated)
            wt = alive_b.astype(jnp.float32)
            if op.weighted:
                wt = wt * f[_W]
            qs, us, vs = f[st_p], f[st_p + 1], f[st_p + 2]
            pdeg = jnp.sqrt(qs * qs + us * us + vs * vs)
            row_f = put_f(row_f, f0, jnp.sum(wt))
            row_f = put_f(row_f, f0 + 1, jnp.sum(wt * pdeg))
            row_f = put_f(row_f, f0 + 2, jnp.sum(wt * vs))
            if len(op.reduce_outputs) > 3:  # local_qu: <Q>, <U>
                row_f = put_f(row_f, f0 + 3, jnp.sum(wt * qs))
                row_f = put_f(row_f, f0 + 4, jnp.sum(wt * us))
        elif op.kind == "emit":
            # inactive iterations use a far-negative start (never overlaps);
            # under shard_map starts are shifted into shard-local coordinates
            # and a window crossing a shard boundary is written piecewise
            start = emit_starts_ref[op.emit_sched_idx, k]
            mask = (gidx >= start) & (gidx < start + op.emit_n)
            if op.emit_E_fn is not None:  # in-kernel sampled energies
                E_new = op.emit_E_fn(rng.uniform(shape))
                f[_E] = jnp.where(mask, E_new, f[_E])
            else:
                f[_E] = jnp.where(mask, jnp.float32(op.emit_E), f[_E])
            for d in range(3):
                f[_RX + d] = jnp.where(mask, jnp.float32(op.emit_r[d]),
                                       f[_RX + d])
                f[_DRX + d] = jnp.where(mask, jnp.float32(0.0), f[_DRX + d])
                f[_DVX + d] = jnp.where(mask, jnp.float32(0.0), f[_DVX + d])
            if op.emit_v is not None:
                for d in range(3):
                    f[_VX + d] = jnp.where(mask, jnp.float32(op.emit_v[d]),
                                           f[_VX + d])
            else:  # isotropic directions at speed c_val
                tu, pu = rng.uniform_pair(shape)
                sin_t, cos_t, sin_p, cos_p = _fast_angles(tu, pu)
                nx, ny, nz = sin_t * cos_p, sin_t * sin_p, cos_t
                inv = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz)
                cval = jnp.float32(op.c_val) * inv
                for d, comp in enumerate((nx, ny, nz)):
                    f[_VX + d] = jnp.where(mask, cval * comp, f[_VX + d])
            # recycled slots may carry a stale roulette/capture weight
            f[_W] = jnp.where(mask, jnp.float32(1.0), f[_W])
            # ... and stale per-particle aux planes (Stokes vectors, charge
            # data): fresh photons start with zeroed extras (unpolarized,
            # degenerate frame -> fallback on first polarized scatter) —
            # except a polarized source's configured Stokes/frame rows —
            # matching the generic PhotonEmitterStep's extras reset. The
            # derived otype plane is handled below, never zeroed.
            emit_fill = {}
            if op.emit_stokes:
                for i_, base in ((0, "stokes"), (1, "pol_ref")):
                    vals = (op.emit_stokes, op.emit_polref)[i_]
                    for row in range(3):
                        emit_fill[f"{base}:{row}"] = jnp.float32(vals[row])
            for j, name in enumerate(plan.extras):
                if name != "otype":
                    f[_NF + j] = jnp.where(
                        mask, emit_fill.get(name, jnp.float32(0.0)),
                        f[_NF + j])
            if is_ph is not None and plan.species == SPECIES_MIXED:
                # emitted slots become photons in the packed otype plane so
                # same-chunk photon physics sees them immediately (the host
                # retypes state.otype from the emit schedule at harvest)
                p = _NF + plan.extras.index("otype")
                f[p] = jnp.where(mask, jnp.float32(OBJ_PHOTON), f[p])
                is_ph = f[p] == jnp.float32(OBJ_PHOTON)
            alive_b = alive_b | mask
            f[_ALIVE] = alive_b.astype(jnp.float32)
        elif op.kind == "absorb":
            # kill particles that left the box (newton.AbsorbingBoundaryStep)
            inside = None
            for d, (lo, hi) in enumerate(op.bounds):
                ok = (f[_RX + d] >= jnp.float32(lo)) & (
                    f[_RX + d] <= jnp.float32(hi))
                inside = ok if inside is None else (inside & ok)
            alive_b = alive_b & inside
            f[_ALIVE] = alive_b.astype(jnp.float32)
        elif op.kind == "periodic":
            # wrap-around box (newton.PeriodicBoundaryStep): r folds into
            # [lo, hi) by modulo; velocity and dr untouched
            for d, (lo, hi) in enumerate(op.bounds):
                lo_f = jnp.float32(lo)
                L = jnp.float32(hi) - lo_f
                f[_RX + d] = lo_f + mod_floor(f[_RX + d] - lo_f, L)
        elif op.kind == "reflect":
            # triangle-wave fold per axis (newton.ReflectingBoundaryStep):
            # handles arbitrary overshoot; odd fold parity flips the velocity
            for d, (lo, hi) in enumerate(op.bounds):
                lo_f, hi_f = jnp.float32(lo), jnp.float32(hi)
                L = hi_f - lo_f
                r0 = f[_RX + d]
                y = mod_floor(r0 - lo_f, 2 * L)
                odd = y > L
                folded = lo_f + jnp.where(odd, 2 * L - y, y)
                outside = (r0 > hi_f) | (r0 < lo_f)
                r1 = jnp.where(outside, folded, r0)
                f[_VX + d] = jnp.where(outside & odd, -f[_VX + d],
                                       f[_VX + d])
                f[_DRX + d] = r1 - (r0 - f[_DRX + d])
                f[_RX + d] = r1
        elif op.kind == "lorentz":
            # Boris pusher (newton.LorentzForceStep): half-E kick, exact
            # B rotation, half-E kick — |v| exactly conserved in pure B.
            # qm_plane >= 0 reads per-particle q/m from a packed extras
            # plane. dt is the value the GENERIC path exposes at this step's
            # position vs UpdateTimeStep (sched rows 3/4), not kinematics'.
            if t is None:
                dt_l = dt
            else:
                dt_l = t[2] if op.after_update else t[3]
            if op.qm_plane >= 0:
                h = f[op.qm_plane] * (jnp.float32(0.5) * dt_l)
            else:
                h = jnp.float32(0.5 * op.qm) * dt_l
            has_e = op.e_fn is not None or op.e_const
            if has_e:
                ef = (op.e_const if op.e_const
                      else op.e_fn(f[_RX], f[_RY], f[_RZ]))
                ev = [jnp.asarray(x, jnp.float32) * h for x in ef]
                vx = f[_VX] + ev[0]
                vy = f[_VY] + ev[1]
                vz = f[_VZ] + ev[2]
            else:
                vx, vy, vz = f[_VX], f[_VY], f[_VZ]
            if op.b_fn is not None or op.b_const:
                bf = (op.b_const if op.b_const
                      else op.b_fn(f[_RX], f[_RY], f[_RZ]))
                tx, ty, tz = (jnp.asarray(x, jnp.float32) * h for x in bf)
                vpx = vx + (vy * tz - vz * ty)
                vpy = vy + (vz * tx - vx * tz)
                vpz = vz + (vx * ty - vy * tx)
                s2 = 2.0 / (1.0 + tx * tx + ty * ty + tz * tz)
                vx = vx + s2 * (vpy * tz - vpz * ty)
                vy = vy + s2 * (vpz * tx - vpx * tz)
                vz = vz + s2 * (vpx * ty - vpy * tx)
            if has_e:
                vx, vy, vz = vx + ev[0], vy + ev[1], vz + ev[2]
            # push = alive non-photons: in mixed plans the otype plane
            # excludes photons (generic parity: photons immune, dv zeroed)
            push = (alive_b if is_ph is None
                    else alive_b & jnp.logical_not(is_ph))
            for d, vn in enumerate((vx, vy, vz)):
                new = jnp.where(push, vn, f[_VX + d])
                f[_DVX + d] = new - f[_VX + d]
                f[_VX + d] = new
        elif op.kind == "fresnel":
            # refractive plane interface (light.RefractiveInterfaceStep):
            # Fresnel-reflect or Snell-refract photons whose segment
            # [r-dr, r] crossed r[axis] == loc; the remainder of the step
            # retraces from the intersection in the outgoing direction
            ax, loc, n_lo, n_hi, match = op.iface
            loc_f = jnp.float32(loc)
            z1 = f[_RX + ax]
            z0 = z1 - f[_DRX + ax]
            side0 = z0 >= loc_f
            crossed = (side0 != (z1 >= loc_f)) & ph_alive()
            inv_speed = jax.lax.rsqrt(jnp.maximum(
                f[_VX] * f[_VX] + f[_VY] * f[_VY] + f[_VZ] * f[_VZ],
                jnp.float32(1e-30)))
            d = [f[_VX + dd] * inv_speed for dd in range(3)]
            going_up = jnp.logical_not(side0)
            nf = jnp.where(going_up, jnp.float32(n_lo), jnp.float32(n_hi))
            nt = jnp.where(going_up, jnp.float32(n_hi), jnp.float32(n_lo))
            cos_i = jnp.clip(jnp.abs(d[ax]), jnp.float32(0.0),
                             jnp.float32(1.0))
            sin2_i = jnp.float32(1.0) - cos_i * cos_i
            mu = nf / nt
            sin2_t = mu * mu * sin2_i
            tir = sin2_t > 1.0
            cos_t = jnp.sqrt(jnp.clip(jnp.float32(1.0) - sin2_t,
                                      jnp.float32(0.0), jnp.float32(1.0)))
            rs = (nf * cos_i - nt * cos_t) / (nf * cos_i + nt * cos_t)
            rp = (nf * cos_t - nt * cos_i) / (nf * cos_t + nt * cos_i)
            R = jnp.where(tir, jnp.float32(1.0),
                          jnp.clip(jnp.float32(0.5) * (rs * rs + rp * rp),
                                   jnp.float32(0.0), jnp.float32(1.0)))
            u = rng.uniform(shape)
            refl = crossed & (u < R)
            dz = z1 - z0
            s = (loc_f - z0) / jnp.where(crossed, dz, jnp.float32(1.0))
            seg = dr_norm()
            sgn = jnp.where(d[ax] >= 0, jnp.float32(1.0), jnp.float32(-1.0))
            d_tr = [mu * d[dd] for dd in range(3)]
            d_tr[ax] = sgn * cos_t
            inv_tr = jax.lax.rsqrt(jnp.maximum(
                d_tr[0] * d_tr[0] + d_tr[1] * d_tr[1] + d_tr[2] * d_tr[2],
                jnp.float32(1e-30)))
            if match:
                n_out = jnp.where(refl, nf, nt)
                speed_out = jnp.float32(op.c_val) / n_out
            else:
                speed_out = jnp.float32(1.0) / inv_speed
            rem = (jnp.float32(1.0) - s) * seg * speed_out * inv_speed
            for dd in range(3):
                d_out = jnp.where(refl,
                                  -d[dd] if dd == ax else d[dd],
                                  d_tr[dd] * inv_tr)
                r0 = f[_RX + dd] - f[_DRX + dd]
                pdd = r0 + s * f[_DRX + dd]
                r_new = pdd + d_out * rem
                f[_RX + dd] = jnp.where(crossed, r_new, f[_RX + dd])
                f[_DRX + dd] = jnp.where(crossed, r_new - r0, f[_DRX + dd])
                f[_VX + dd] = jnp.where(crossed, d_out * speed_out,
                                        f[_VX + dd])
        elif op.kind == "custom":
            # user elementwise physics (ElementwiseStep contract): the fn
            # sees this tile's planes; updates write back in place. t/dt are
            # the values the GENERIC path would expose at this step's
            # position relative to UpdateTimeStep (sched rows 1-4).
            from physicl_tpu.engine import ParticleView

            names = ParticleView._FIELDS
            plane_of = {n: i for i, n in enumerate(names)}
            view_fields = {n: (alive_b if n == "alive" else f[plane_of[n]])
                           for n in names}
            if t is None:
                t_op, dt_op = jnp.float32(0.0), dt
            else:
                t_op = t[0] if op.after_update else t[1]
                dt_op = t[2] if op.after_update else t[3]
            view = ParticleView(view_fields, t_op, dt_op,
                                lambda: rng.uniform(shape),
                                extras=_view_extras_of(op, f))
            upd = op.custom_fn(view)
            bad = set(upd) - set(names) - set(op.extras_write)
            if bad:  # same validation the generic path gives (trace time)
                raise ValueError(
                    f"ElementwiseStep returned unknown fields {bad} "
                    f"(transport fields or extras_write="
                    f"{op.extras_write} only)")
            extras_at = {nm: (p0, rows) for nm, p0, rows in op.view_extras}
            for name, val in upd.items():
                if name == "alive":
                    alive_b = alive_b & jnp.asarray(val).astype(jnp.bool_)
                    f[_ALIVE] = alive_b.astype(jnp.float32)
                elif name in extras_at:  # declared writable aux plane
                    p0, rows_n = extras_at[name]
                    if rows_n == 1:
                        f[p0] = jnp.asarray(val).astype(jnp.float32)
                    else:
                        comps = tuple(val)
                        if len(comps) != rows_n:  # trace-time, both paths
                            raise ValueError(
                                f"extras_write plane {name!r} has {rows_n} "
                                f"rows; update returned {len(comps)} "
                                "components")
                        for i_ in range(rows_n):
                            f[p0 + i_] = jnp.asarray(
                                comps[i_]).astype(jnp.float32)
                else:
                    f[plane_of[name]] = jnp.asarray(val).astype(jnp.float32)
        elif op.kind == "kstate":
            # user KernelStep(elementwise=True): a per-particle SimState ->
            # SimState map traced over this tile's planes through a facade
            # state (contract in kernels.KernelStep: `a` reads zeros; only
            # the packed transport fields write back; alive can only clear;
            # ctx use was refused at plan time). Shapes are opaque to an
            # elementwise fn, so the facade carries (3, R, 128)/(R, 128)
            # planes where the generic path carries (3, C)/(C,).
            from physicl_tpu.ops.pipeline import _KernelCtxTrip
            from physicl_tpu.state import SimState

            if t is None:
                t_op, dt_op = jnp.float32(0.0), dt
            else:
                t_op = t[0] if op.after_update else t[1]
                dt_op = t[2] if op.after_update else t[3]

            def stk(i0):
                return jnp.stack([f[i0], f[i0 + 1], f[i0 + 2]])

            if plan.species == SPECIES_MIXED:
                otype_t = f[_NF + plan.extras.index("otype")].astype(
                    jnp.int32)
            else:
                otype_t = jnp.full(shape, plan.species, jnp.int32)
            facade = SimState(
                r=stk(_RX), dr=stk(_DRX), v=stk(_VX), dv=stk(_DVX),
                a=jnp.zeros((3,) + shape, jnp.float32),
                E=f[_E], alive=alive_b, otype=otype_t, w=f[_W],
                t=t_op, dt=dt_op, key=jnp.zeros((2,), jnp.uint32))
            out = op.custom_fn(facade, _KernelCtxTrip())
            if not isinstance(out, SimState):  # trace-time, mirrors generic
                raise TypeError(
                    "KernelStep fn must return a SimState, got "
                    f"{type(out).__name__}")
            for d in range(3):
                f[_RX + d] = out.r[d].astype(jnp.float32)
                f[_DRX + d] = out.dr[d].astype(jnp.float32)
                f[_VX + d] = out.v[d].astype(jnp.float32)
                f[_DVX + d] = out.dv[d].astype(jnp.float32)
            f[_E] = out.E.astype(jnp.float32)
            f[_W] = out.w.astype(jnp.float32)
            alive_b = alive_b & out.alive.astype(jnp.bool_)
            f[_ALIVE] = alive_b.astype(jnp.float32)
        elif op.kind == "reduce":
            # user per-particle measurement (engine.ReduceMeasureStep):
            # evaluate the contributions on this tile and sum the alive ones
            # into float record channels — tile sums add across the grid
            # (and psum across shards) into the global per-iteration totals
            from physicl_tpu.engine import ParticleView

            names = ParticleView._FIELDS
            plane_of = {n: i for i, n in enumerate(names)}
            view_fields = {n: (alive_b if n == "alive" else f[plane_of[n]])
                           for n in names}
            if t is None:
                t_op, dt_op = jnp.float32(0.0), dt
            else:
                t_op = t[0] if op.after_update else t[1]
                dt_op = t[2] if op.after_update else t[3]
            view = ParticleView(view_fields, t_op, dt_op,
                                lambda: rng.uniform(shape),
                                extras=_view_extras_of(op, f))
            contrib = op.custom_fn(view)
            missing = set(op.reduce_outputs) - set(contrib)
            if missing:  # same validation as the generic path (trace time)
                raise ValueError(
                    f"ReduceMeasureStep fn did not return declared outputs "
                    f"{sorted(missing)}")
            n_col, f0 = op.cols
            if n_col >= 0:
                row = put(row, n_col, jnp.sum(alive_b, dtype=jnp.int32))
            for j, name in enumerate(op.reduce_outputs):
                val = jnp.asarray(contrib[name]).astype(jnp.float32)
                row_f = put_f(row_f, f0 + j,
                              jnp.sum(jnp.where(alive_b, val,
                                                jnp.float32(0.0))))
        elif op.kind == "trace":
            # per-photon positions at this step's position in the pipeline;
            # dead/padding slots encode as NaN (the reference row format's
            # NaN padding after death, physicl/light.py:463-483)
            for d in range(3):
                stream[op.stream0 + d] = jnp.where(alive_b, f[_RX + d], _nan)
            if op.stream_scat:  # scatter-event flags for trace_dv frequency
                scat = ((f[_DVX] != 0) | (f[_DVY] != 0)
                        | (f[_DVZ] != 0)) & alive_b
                stream[op.stream0 + 3] = scat.astype(jnp.float32)
        elif op.kind == "sign":
            n_col, sx_col = op.cols
            if n_col >= 0:
                row = put(row, n_col, jnp.sum(alive_b, dtype=jnp.int32))
            for d in range(3):
                pos = (f[_VX + d] > 0) & alive_b
                if op.weighted:  # Sigma w over positive-velocity photons
                    row_f = put_f(row_f, sx_col + d,
                                  jnp.sum(jnp.where(pos, f[_W], 0.0)))
                else:
                    row = put(row, sx_col + d, jnp.sum(pos, dtype=jnp.int32))
        elif op.kind == "sabsorb":
            # absorbing sphere (newton.AbsorbingSphereStep): kill leavers
            # (escape sphere) or entrants (central absorber, inside=True)
            cx, cy, cz, R = (jnp.float32(x) for x in op.sphere)
            dx0, dy0, dz0 = f[_RX] - cx, f[_RY] - cy, f[_RZ] - cz
            r2 = dx0 * dx0 + dy0 * dy0 + dz0 * dz0
            in_s = r2 <= R * R
            alive_b = alive_b & (jnp.logical_not(in_s) if op.inside
                                 else in_s)
            f[_ALIVE] = alive_b.astype(jnp.float32)
        elif op.kind == "scross":
            # spherical-shell flux tally (light.SphericalShellMeasureStep):
            # the plane tally's endpoint convention on |r - c| vs R
            n_col, col = op.cols
            if n_col >= 0:
                row = put(row, n_col, jnp.sum(alive_b, dtype=jnp.int32))
            cx, cy, cz, R = (jnp.float32(x) for x in op.sphere)
            dx1, dy1, dz1 = f[_RX] - cx, f[_RY] - cy, f[_RZ] - cz
            dx0 = dx1 - f[_DRX]
            dy0 = dy1 - f[_DRY]
            dz0 = dz1 - f[_DRZ]
            r1 = dx1 * dx1 + dy1 * dy1 + dz1 * dz1
            r0 = dx0 * dx0 + dy0 * dy0 + dz0 * dz0
            R2 = R * R
            crossed = (((r0 <= R2) & (R2 <= r1))
                       | ((r0 >= R2) & (R2 >= r1))) & alive_b
            if op.weighted:
                row_f = put_f(row_f, col,
                              jnp.sum(jnp.where(crossed, f[_W], 0.0)))
            else:
                row = put(row, col, jnp.sum(crossed, dtype=jnp.int32))
        elif op.kind == "cross":
            (n_col,) = op.cols
            if n_col >= 0:
                row = put(row, n_col, jnp.sum(alive_b, dtype=jnp.int32))
            for axis, L, col, e_col, ecap in op.axes:
                hi = f[_RX + axis]
                lo = hi - f[_DRX + axis]
                Lv = jnp.float32(L)
                crossed = (((lo <= Lv) & (Lv <= hi))
                           | ((lo >= Lv) & (Lv >= hi))) & alive_b
                if op.weighted:  # surface current: Sigma w over crossers
                    row_f = put_f(row_f, col,
                                  jnp.sum(jnp.where(crossed, f[_W], 0.0)))
                else:
                    row = put(row, col, jnp.sum(crossed, dtype=jnp.int32))
                if e_col >= 0:  # energy flux: sum of crossing photons' E
                    flux = f[_W] * f[_E] if op.weighted else f[_E]
                    row_f = put_f(row_f, e_col,
                                  jnp.sum(jnp.where(crossed, flux, 0.0)))
                if ecap >= 0:  # per-photon E capture (reference list mode,
                    # physicl/light.py:388-402): E where crossed, NaN else
                    stream[ecap] = jnp.where(crossed, f[_E], _nan)

    # col 0: global alive count at iteration end (predicate/trim channel)
    row = put(row, 0, jnp.sum(alive_b, dtype=jnp.int32))
    return f, row, row_f, stream


def _kernel(plan: FusedPlan, tile_rows, n_tables, ctl_ref, dts_ref, emit_ref,
            state_ref, *args):
    table_refs = args[:n_tables]
    out_ref, rec_ref, recf_ref = args[n_tables:n_tables + 3]
    rest = args[n_tables + 3:]
    stream_ref = rest[0] if plan.n_stream else None
    stream_scratch = rest[1] if plan.n_stream else None
    stream_sem = rest[2] if plan.n_stream else None
    if n_tables:
        # rebind voxel-media field callables to their VMEM table windows:
        # op.n_fn keeps the universal (r0, r1, r2) calling convention at
        # every op body, so no call site knows about tables (trace-time
        # only — the replaced plan never leaves this trace)
        slots, _ = _vox_specs_of(plan)
        ops = [op if slot < 0 else dataclasses.replace(
                   op, n_fn=_bind_vox_field(op.n_fn.vox_spec,
                                            table_refs[slot], tile_rows))
               for op, slot in zip(plan.ops, slots)]
        plan = dataclasses.replace(plan, ops=ops)
    pid = pl.program_id(0)
    # Decorrelate tiles/chunks: ctl = [seed, k_act]. Odd multiplier mixes pid.
    tile_seed = ctl_ref[0] + pid * jnp.int32(2654435761 & 0x7FFFFFFF)
    pltpu.prng_seed(tile_seed)
    k_act = ctl_ref[1]

    @pl.when(pid == 0)
    def _():
        rec_ref[:] = jnp.zeros_like(rec_ref)
        recf_ref[:] = jnp.zeros_like(recf_ref)

    fields = [state_ref[i] for i in range(_NF + len(plan.extras))]
    # global slot index of each tile element (row-major (rows, 128) layout)
    gidx = (pid * jnp.int32(tile_rows * _LANE)
            + jax.lax.broadcasted_iota(jnp.int32, (tile_rows, _LANE), 0)
            * jnp.int32(_LANE)
            + jax.lax.broadcasted_iota(jnp.int32, (tile_rows, _LANE), 1))

    def _stream_dma(m, slot):
        """DMA descriptor: VMEM scratch slot -> HBM stream row m, this tile's
        rows. Rebuilt identically for start() and the later wait()."""
        return pltpu.make_async_copy(
            stream_scratch.at[slot],
            stream_ref.at[m, :, pl.ds(pid * tile_rows, tile_rows), :],
            stream_sem.at[slot],
        )

    S_stream = max(1, int(plan.stream_every))

    def one_iter(k, fields):
        """One simulation iteration; returns (fields, int row, float row)."""
        # sched rows: [dt at kinematics, t after update, t before update,
        #              dt after update, dt before update]
        dt = dts_ref[0, k]
        t_pair = (dts_ref[1, k], dts_ref[2, k], dts_ref[3, k],
                  dts_ref[4, k])
        rng = _Rng(False, tile_seed, k)
        fields, row, row_f, stream = _emit_iteration(plan, k, dt, fields,
                                                     rng, emit_ref, gidx,
                                                     t=t_pair)
        if plan.n_stream:
            # double-buffered offload of stream row m = k // S (every
            # iteration when S == 1): reuse a scratch slot only after its
            # previous DMA (row m-2) completed
            def offload(m):
                slot = jax.lax.rem(m, 2)

                @pl.when(m >= 2)
                def _():
                    _stream_dma(m - 2, slot).wait()

                for p in range(plan.n_stream):
                    # cast per plane (bf16 stream: halves the DMA bytes)
                    stream_scratch[slot, p] = stream[p].astype(
                        stream_scratch.dtype)
                _stream_dma(m, slot).start()

            if S_stream == 1:
                offload(k)
            else:
                @pl.when(jax.lax.rem(k, jnp.int32(S_stream)) == 0)
                def _():
                    offload(k // jnp.int32(S_stream))
        return fields, row, row_f

    def body(k, fields):
        fields, row, row_f = one_iter(k, fields)
        rec_ref[pl.ds(k, 1), :] = rec_ref[pl.ds(k, 1), :] + row
        recf_ref[pl.ds(k, 1), :] = recf_ref[pl.ds(k, 1), :] + row_f
        return fields

    U = max(1, int(plan.unroll))
    if U > 1:
        # U iterations per loop body: Mosaic pipelines across them and the
        # record rows batch into one aligned (U, 128) read-modify-write.
        # Iteration order, RNG draw order, and results match U=1 exactly.
        def body_u(k8, fields):
            k0 = k8 * jnp.int32(U)
            rows_i, rows_f = [], []
            for j in range(U):
                fields, row, row_f = one_iter(k0 + j, fields)
                rows_i.append(row)
                rows_f.append(row_f)
            blk_i = jnp.concatenate(rows_i, axis=0)
            blk_f = jnp.concatenate(rows_f, axis=0)
            rec_ref[pl.ds(k0, U), :] = rec_ref[pl.ds(k0, U), :] + blk_i
            recf_ref[pl.ds(k0, U), :] = recf_ref[pl.ds(k0, U), :] + blk_f
            return fields

        fields = jax.lax.fori_loop(0, k_act // U, body_u, fields)
        fields = jax.lax.fori_loop((k_act // U) * U, k_act, body, fields)
    else:
        fields = jax.lax.fori_loop(0, k_act, body, fields)

    if plan.n_stream:  # drain in-flight stream DMAs before the kernel exits
        # last issued row: m_last = (k_act-1) // S; rows 0..m_last-2 were
        # waited in-loop when their slots were reused
        m_last = (k_act - 1) // jnp.int32(S_stream)

        @pl.when(k_act >= 1 + S_stream)  # m_last >= 1
        def _():
            _stream_dma(m_last - 1, jax.lax.rem(m_last - 1, 2)).wait()

        @pl.when(k_act >= 1)
        def _():
            _stream_dma(m_last, jax.lax.rem(m_last, 2)).wait()

    # Write EVERY plane, including untouched ones like E: Pallas TPU output
    # windows are copied back wholesale and are NOT guaranteed to be
    # initialized from the input_output_aliases'd input, so skipping a plane
    # store can corrupt it at chunk boundaries. One plane store is negligible.
    for i in range(_NF + len(plan.extras)):
        out_ref[i] = fields[i]


def _build_emulated_chunk(plan: FusedPlan, capacity: int):
    """Pure-jnp twin of the Pallas kernel for CPU/interpret environments.

    Identical physics and record layout, one logical tile, hash-PRNG
    randomness. This is also the path the multi-chip dry run exercises under
    shard_map on virtual CPU devices (interpret-mode pallas_call uses
    io_callbacks, which deadlock against device_get from the driver thread).
    """
    rows = capacity // _LANE
    nf = _NF + len(plan.extras)
    s_every = max(1, int(plan.stream_every))
    n_srows = -(-plan.chunk // s_every)  # ceil: strided stream rows
    sdtype = (jnp.bfloat16 if plan.stream_dtype == "bfloat16"
              else jnp.float32)

    @jax.jit
    def run(packed, dts, emit_starts, seed, k_act):
        dts = jnp.asarray(dts, jnp.float32)
        emit_starts = jnp.asarray(emit_starts, jnp.int32)
        seed = jnp.asarray(seed, jnp.int32)
        fields = [packed[i].reshape(rows, _LANE) for i in range(nf)]
        rec0 = jnp.zeros((plan.chunk, _MAX_REC_COLS), jnp.int32)
        recf0 = jnp.zeros((plan.chunk, _MAX_REC_COLS), jnp.float32)
        stream0 = jnp.full((n_srows, plan.n_stream, rows, _LANE), jnp.nan,
                           sdtype)
        gidx = (jax.lax.broadcasted_iota(jnp.int32, (rows, _LANE), 0)
                * jnp.int32(_LANE)
                + jax.lax.broadcasted_iota(jnp.int32, (rows, _LANE), 1))

        def body(k, carry):
            fields, rec, rec_f, stream_buf = carry
            rng = _Rng(True, seed, k)
            fields, row, row_f, stream = _emit_iteration(
                plan, k, dts[0, k], fields, rng, emit_starts, gidx,
                t=(dts[1, k], dts[2, k], dts[3, k], dts[4, k]))
            if plan.n_stream:
                m = k // s_every
                val = jnp.stack(stream).astype(sdtype)
                if s_every > 1:  # keep row m untouched off sample iterations
                    val = jnp.where(jax.lax.rem(k, s_every) == 0, val,
                                    stream_buf[m])
                stream_buf = stream_buf.at[m].set(val)
            return (fields, rec.at[k].add(row[0]),
                    rec_f.at[k].add(row_f[0]), stream_buf)

        fields, rec, rec_f, stream_buf = jax.lax.fori_loop(
            0, jnp.asarray(k_act, jnp.int32), body,
            (fields, rec0, recf0, stream0))
        out = jnp.stack([f.reshape(capacity) for f in fields])
        if plan.n_stream:
            return (out, rec, rec_f,
                    stream_buf.reshape(n_srows, plan.n_stream, capacity))
        return out, rec, rec_f

    return run


# Arrays up to this many bytes are keyed by a full content hash; larger
# ones by identity (anchored — see _freeze).  4 MB hashes in ~1 ms, and
# constants folded into kernels beyond that are a perf smell anyway.
_HASH_NBYTES_MAX = 4 << 20


def _freeze(v, anchors, depth=0):
    """Hashable snapshot of a value for cache keying. Scalars/strings by
    value; containers recursively (depth-capped); numpy arrays by content
    (raw bytes when tiny, SHA-1 up to ``_HASH_NBYTES_MAX``). Anything
    keyed by identity — device arrays (immutable, so id is a sound
    content proxy while the object is alive), huge numpy arrays,
    arbitrary objects — is appended to ``anchors``: the cache entry holds
    those references so a freed object's id can never be recycled into a
    stale hit. In-place mutation of a >4 MB numpy array is the one
    undetectable case (documented with the globals hazard in
    :func:`clear_kernel_cache`)."""
    if depth > 3:
        return type(v).__name__
    if v is None or isinstance(v, (bool, int, float, str, bytes)):
        return v
    if isinstance(v, (tuple, list)):
        return tuple(_freeze(x, anchors, depth + 1) for x in v)
    if isinstance(v, dict):
        return tuple(sorted(
            (str(k), _freeze(x, anchors, depth + 1)) for k, x in v.items()))
    if isinstance(v, np.ndarray):
        if v.size <= 256:
            return (v.dtype.str, v.shape, v.tobytes())
        if v.nbytes <= _HASH_NBYTES_MAX:
            import hashlib

            return (v.dtype.str, v.shape,
                    hashlib.sha1(np.ascontiguousarray(v).tobytes()).digest())
        anchors.append(v)
        return ("np-id", id(v), v.dtype.str, v.shape)
    anchors.append(v)
    return ("id", id(v))


def _fn_key(fn, anchors):
    """Identity key for a plan callable. Kernels get user callables folded
    in as traced constants, so the key must change whenever the values the
    callable would produce could change — not just when the function object
    does. Bound methods are keyed by (receiver class, receiver state
    snapshot, function): mutating ``sampler.T = ...`` on a reused
    PlanckSampler then misses the cache and re-traces with the new
    temperature, and a subclass overriding a helper the method calls gets
    its own entry (same inherited ``__code__``, different class). Plain
    functions are keyed by (code identity, defaults, closure-cell
    snapshot) so a closure over a changed local re-traces too. Mutated
    *globals* read inside the callable are not detectable — call
    :func:`clear_kernel_cache` after changing one (documented in
    docs/api.md). Objects keyed by id are appended to ``anchors`` (kept
    alive by the cache entry) so id recycling cannot alias keys."""
    if fn is None:
        return None
    recv = getattr(fn, "__self__", None)
    if recv is not None:
        f = getattr(fn, "__func__", fn)
        try:
            state = _freeze(vars(recv), anchors)
        except TypeError:  # __slots__ / C receivers: fall back to identity
            anchors.append(recv)
            state = id(recv)
        cls = type(recv)
        anchors.append(cls)
        code = getattr(f, "__code__", f)
        anchors.append(code)
        return (f.__qualname__, id(code), cls.__qualname__, id(cls), state)
    code = getattr(fn, "__code__", None)
    if code is None:  # builtins / partials / arbitrary callables
        anchors.append(fn)
        return id(fn)
    anchors.append(code)
    cells = tuple(_freeze(c.cell_contents, anchors)
                  for c in (fn.__closure__ or ()) if _cell_filled(c))
    return (id(code), _freeze(fn.__defaults__, anchors), cells)


def _cell_filled(cell):
    try:
        cell.cell_contents
        return True
    except ValueError:  # unfilled cell (recursive def)
        return False


def clear_kernel_cache():
    """Drop every cached compiled fused chunk.

    The cache keys user callables by a best-effort state snapshot
    (receiver attributes, closure cells); it cannot see mutations to
    module globals a callable reads. Call this after such a mutation to
    force a re-trace with the new values."""
    _chunk_cache.clear()


_OP_FN_FIELDS = frozenset({"custom_fn", "n_fn", "a_fn", "emit_E_fn",
                           "e_fn", "b_fn"})


def _plan_cache_key(plan: FusedPlan, capacity: int):
    """(structural identity of a compiled chunk, id-anchored objects).

    Derived from ``dataclasses.fields`` so a field added to ``_Op`` or
    ``FusedPlan`` is part of the key automatically — an explicit tuple here
    silently served stale kernels when a new op parameter was introduced
    (the exact hazard ADVICE r2 #1 flagged for callable state)."""
    anchors: list = []
    ops = tuple(
        tuple(_fn_key(getattr(op, f.name), anchors)
              if f.name in _OP_FN_FIELDS else getattr(op, f.name)
              for f in dataclasses.fields(op))
        for op in plan.ops)
    plan_rest = tuple(getattr(plan, f.name) for f in dataclasses.fields(plan)
                      if f.name != "ops")
    return (capacity, ops) + plan_rest, anchors


# key -> (plan, compiled runner, anchors); FIFO-bounded.  ``anchors`` pins
# every object the key references by id() so that id cannot be recycled
# by a new object while the entry is live (stale-hit hazard otherwise).
_chunk_cache: dict = {}
_CHUNK_CACHE_MAX = 64


def build_fused_chunk(plan: FusedPlan, capacity: int):
    """Compile the fused chunk: (packed_state, dts, seed, k_act) -> (state, rec).

    ``packed_state`` is (15, C) f32; rec is (chunk, 128) int32 with col 0 the
    global alive count per iteration and measure channels per the plan.

    Structurally identical (plan, capacity) pairs return the SAME jitted
    runner: repeated sims (sweeps, notebooks, tests) and same-capacity
    provider invalidations (slot recycling, mid-run edits) skip the
    re-trace + compile round trip entirely.
    """
    key, anchors = _plan_cache_key(plan, capacity)
    hit = _chunk_cache.get(key)
    if hit is not None:
        return hit[1]
    # lazily, right before the first real compile — constructing a
    # Simulation must not mutate process-global JAX config (advisor finding)
    from physicl_tpu.utils.cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    run = _build_fused_chunk_uncached(plan, capacity)
    if len(_chunk_cache) >= _CHUNK_CACHE_MAX:  # FIFO: drop the oldest
        _chunk_cache.pop(next(iter(_chunk_cache)))
    _chunk_cache[key] = (plan, run, anchors)
    return run


def _build_fused_chunk_uncached(plan: FusedPlan, capacity: int):
    if plan.interpret:
        return _build_emulated_chunk(plan, capacity)
    rows = capacity // _LANE
    nf = _NF + len(plan.extras)
    tile_rows = plan.tile_rows
    while rows % tile_rows:
        tile_rows //= 2
    n_tiles = rows // tile_rows

    # Scoped-VMEM sizing. The kernel compiles with vmem_limit_bytes=64M
    # (the 16M "limit" the r2/r3 caps were built around is a COMPILER
    # DEFAULT, not the v5e VMEM size) — the caps below keep each family's
    # Mosaic stack well inside that budget alongside the field windows,
    # scaled from the r2-r4 on-chip measurements (per-unrolled-iteration
    # temporaries are ~linear in unroll: iso U=32 ~ 12M; rotation family
    # U=8 ~ 16.6M; emit U=32 ~ 16.45M; polarized U=1 ~ 17.4M). Every tier
    # is pinned per family x capacity by the fresh-compile matrix
    # (tests/test_tpu_compile_matrix.py).
    state_out_bytes = nf * rows * _LANE * 4
    del state_out_bytes  # XLA stack-promotes small outputs (S(1)); the
    # 64M budget absorbs promotion, so capacity no longer gates unroll
    # ops that trace arbitrary-size user code per iteration (in-kernel
    # sampled-E emitters, ElementwiseStep physics) multiply the per-
    # iteration temporaries: a 32-segment Planck icdf emitter at U=32
    # measured 19.6M scoped — fits the 64M budget at U<=16
    heavy_ops = any(op.emit_E_fn is not None or op.custom_fn is not None
                    or op.e_fn is not None or op.b_fn is not None
                    for op in plan.ops)
    if tile_rows > 256 or heavy_ops:
        plan = dataclasses.replace(plan, unroll=min(plan.unroll, 16))
    vox_slots, vox_specs = _vox_specs_of(plan)
    if vox_specs:
        # voxel-media lookups unroll one lane-gather+select per walked
        # table row per unrolled iteration: the live segment temporaries
        # stack like the rotation-frame ops'. U=8 compiles (r4e matrix)
        # but measured FLAT vs 4 (6.80 vs 6.85e9) — keep the smaller
        # stack so voxel composes with other heavy ops. Big codebook
        # tables (64^3 CT grids = 514 rows) additionally clamp U so the
        # TOTAL statically-unrolled gather count stays near the r5 probe
        # envelope (~2048 static gather bodies hang the Mosaic compile)
        total_segs = sum(_vox_walk_segments(s) for s in vox_specs)
        plan = dataclasses.replace(plan, unroll=min(
            plan.unroll, 4, max(1, 1024 // max(total_segs, 1))))
    if any(op.kind == "del" and op.fluor for op in plan.ops):
        # the fluorescence branch adds ~10 live (tile, 128) temporaries
        # (yield/angle draws + the redirect) on top of the plain kill
        plan = dataclasses.replace(plan, unroll=min(plan.unroll, 8))
    if any(op.kind in ("hg", "rayl", "compton", "fresnel", "phase", "pol",
                       "polc") for op in plan.ops):
        # the relative-frame rotation (hg/rayl/compton) carries ~15 extra
        # (tile, 128) f32 temporaries per unrolled iteration: 16.6M at
        # U=8/256 rows measured on chip — inside the 64M budget; U=16
        # would not be
        plan = dataclasses.replace(plan, unroll=min(plan.unroll, 8))
    if any(op.kind == "compton" for op in plan.ops):
        # the 12-try Kahn chains + rotation + recoil algebra stack per
        # unrolled iteration: U=8 compiles (r4e matrix) but measured
        # noise-flat vs 4 (5.43 vs 5.33e9) — keep the smaller stack so
        # compton composes with other heavy ops (thermal clamps to 2)
        plan = dataclasses.replace(plan, unroll=min(plan.unroll, 4))
    if any(op.kind == "compton" and op.theta_e > 0.0 for op in plan.ops):
        # thermal Comptonization adds the electron draw + two Lorentz
        # boosts (~20 more live temporaries) per unrolled iteration
        plan = dataclasses.replace(plan, unroll=min(plan.unroll, 2))
    if any(op.kind in ("pol", "polc") for op in plan.ops):
        # the polarized frame/Mueller algebra measured 17.4M of Mosaic
        # stack at U=1 with 256-row tiles (r4); the r5 double-angle-carry
        # bisection shrank the body ~16%, which brings U=4 (~58M) inside
        # the 64M budget — fresh-compiled and measured on chip r5:
        # 6.15e9 vs 6.09e9 at U=2 (the compile matrix pins every size)
        plan = dataclasses.replace(plan, unroll=min(plan.unroll, 4))

    out_specs = [
        pl.BlockSpec((nf, tile_rows, _LANE), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((plan.chunk, _MAX_REC_COLS), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((plan.chunk, _MAX_REC_COLS), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((nf, rows, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((plan.chunk, _MAX_REC_COLS), jnp.int32),
        jax.ShapeDtypeStruct((plan.chunk, _MAX_REC_COLS), jnp.float32),
    ]
    scratch_shapes = []
    s_every = max(1, int(plan.stream_every))
    n_srows = -(-plan.chunk // s_every)  # ceil: strided stream rows
    if plan.n_stream:
        # stream buffer stays whole in HBM; tiles DMA their row stripe per
        # sampled iteration from a double-buffered VMEM scratch
        sdtype = (jnp.bfloat16 if plan.stream_dtype == "bfloat16"
                  else jnp.float32)
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(jax.ShapeDtypeStruct(
            (n_srows, plan.n_stream, rows, _LANE), sdtype))
        scratch_shapes = [
            pltpu.VMEM((2, plan.n_stream, tile_rows, _LANE), sdtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]

    # voxel-media tables in the lane-gather layout of _vmem_table_lookup:
    # f32 grids as (ceil(V/128), 128) with entry v at [v // 128, v % 128];
    # codebook grids as packed code words + the bitcast codebook rows
    tables = [_vox_table_of(spec) for spec in vox_specs]

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # ctl [seed, k_act]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sched (5, chunk): rows
            # [dt at kin, t after upd, t before upd, dt after, dt before]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # emit starts (E, chunk)
            pl.BlockSpec((nf, tile_rows, _LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            # whole voxel tables per tile (constant window: Mosaic keeps
            # the buffer resident across grid steps)
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in tables],
        ],
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )

    kernel = partial(_kernel, plan, tile_rows, len(tables))

    @jax.jit
    def run(packed, dts, emit_starts, seed, k_act):
        ctl = jnp.stack([jnp.asarray(seed, jnp.int32),
                         jnp.asarray(k_act, jnp.int32)])
        packed3 = packed.reshape(nf, rows, _LANE)
        res = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            input_output_aliases={3: 0},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                # the default scoped-VMEM budget is a 16 MB COMPILER FLAG,
                # not the v5e hardware size: raising it is the supported
                # way to run op bodies whose live temporaries exceed the
                # default stack (JAX's own flash-attention kernels set
                # 128 MB). 64 MB covers the polarized family at 256-row
                # tiles (measured 17.4 MB) with headroom for the windows
                # and DMA buffers that share physical VMEM.
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(ctl, jnp.asarray(dts, jnp.float32),
          jnp.asarray(emit_starts, jnp.int32), packed3, *tables)
        out, rec, rec_f = res[0], res[1], res[2]
        if plan.n_stream:
            stream = res[3].reshape(n_srows, plan.n_stream, capacity)
            return out.reshape(nf, capacity), rec, rec_f, stream
        return out.reshape(nf, capacity), rec, rec_f

    return run


def pack_state(state: SimState, extras: tuple = ()) -> jax.Array:
    """SimState -> packed (15 + len(extras), C) f32 (one concat; slices come
    back out). ``extras`` names resolve against ``state.extras``; the derived
    pseudo-plane ``"qm"`` packs the charge-to-mass ratio ``q / m`` (0 where
    ``m == 0`` — uncharged/unset particles are never pushed, matching
    newton.LorentzForceStep's generic-path guard); ``"name:i"`` packs row
    ``i`` of a multi-row extras array (e.g. ``"stokes:1"`` -> the U Stokes
    component plane)."""
    planes = [state.r, state.dr, state.v, state.dv,
              state.E[None].astype(jnp.float32),
              state.alive[None].astype(jnp.float32),
              state.w[None].astype(jnp.float32)]
    for name in extras:
        if name == "qm":
            q = state.extras["q"].astype(jnp.float32)
            m = state.extras["m"].astype(jnp.float32)
            safe = jnp.where(m != 0, m, jnp.ones_like(m))
            planes.append(jnp.where(m != 0, q / safe, 0.0)[None])
        elif name == "otype":  # mixed-species plans: per-particle type gate
            planes.append(state.otype.astype(jnp.float32)[None])
        elif ":" in name:      # row of a multi-row extras array
            base, idx = name.rsplit(":", 1)
            planes.append(
                state.extras[base][int(idx)].astype(jnp.float32)[None])
        else:
            planes.append(state.extras[name].astype(jnp.float32)[None])
    return jnp.concatenate(planes, axis=0)


def unpack_state(packed: jax.Array, template: SimState,
                 extras: tuple = (), writeback: tuple = ()) -> SimState:
    """Packed (NF, C) -> SimState. ``writeback`` lists extras BASE names the
    kernel mutated (FusedPlan.extras_writeback): their planes are gathered
    from the packed array (rows ordered by the ``name:i`` suffix) and
    replace the corresponding ``template.extras`` entries; all other extras
    stay host-authoritative."""
    state = template.replace(
        r=packed[_RX:_RX + 3], dr=packed[_DRX:_DRX + 3],
        v=packed[_VX:_VX + 3], dv=packed[_DVX:_DVX + 3],
        E=packed[_E].astype(template.E.dtype),
        alive=packed[_ALIVE] > 0,
        w=packed[_W].astype(template.w.dtype),
    )
    if writeback:
        new_extras = dict(template.extras)
        for base in writeback:
            rows = sorted(
                (int(n.rsplit(":", 1)[1]), j)
                for j, n in enumerate(extras) if n.startswith(base + ":"))
            tmpl = template.extras[base]
            if rows:
                new_extras[base] = jnp.stack(
                    [packed[_NF + j] for _, j in rows]).astype(tmpl.dtype)
            else:  # single-plane extras packed under the bare name
                new_extras[base] = packed[
                    _NF + extras.index(base)].astype(tmpl.dtype)
        state = state.replace(extras=new_extras)
    return state
