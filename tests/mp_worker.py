"""Multi-process worker: runs a full Simulation over a process-spanning mesh.

Launched by tests/test_multiprocess.py (and by __graft_entry__.py's
multi-process dryrun mode) as N identical processes, each owning 2 virtual
CPU devices. Usage: python mp_worker.py <process_id> <num_processes> <port>.
Prints one PASS line per check; any assertion kills the process (nonzero
exit observed by the launcher).
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import physicl_tpu as phys  # noqa: E402
import physicl_tpu.newton  # noqa: E402
import physicl_tpu.light as light  # noqa: E402
from physicl_tpu.parallel import init_distributed, make_pod_mesh  # noqa: E402

init_distributed(coordinator_address=f"localhost:{port}",
                 num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc and jax.device_count() == 2 * nproc
mesh = make_pod_mesh()
assert mesh.devices.size == 2 * nproc
print(f"[{pid}] mesh over {mesh.devices.size} devices across "
      f"{nproc} processes PASS", flush=True)

N = 2 * nproc * 16384  # one tile-aligned shard per device

# --- fused pipeline: kinematics + isotropic scatter + sign counts ---------
s = phys.Simulation(exit=lambda c: c.t >= 0.008, seed=0, mesh=mesh)
s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
s.add_step(1, phys.newton.NewtonianKinematicsStep())
s.add_step(2, light.ScatterIsotropicStep(A=np.double(0.001),
                                         n=np.double(0.001)))
sign = light.ScatterSignMeasureStep(None, True)
s.add_step(3, sign)
s.add_photons(light.generate_photon_state(N, E=1.0))
s.start(); s.join()
assert s.used_fused, "pod-mesh run must stay fused"
assert len(s.ts) == 8
ns = [int(r[1]) for r in sign.data]
assert ns == [N] * 8, ns  # psum across processes counts EVERY shard
shares = np.array([r[2] / r[1] for r in sign.data])
pcoll = 1e-6 * float(light.c) * 1e-3
expect = 0.5 + 0.5 * (1 - pcoll) ** np.arange(1, 9)
assert np.abs(shares - expect).max() < 0.02, shares
print(f"[{pid}] fused cross-process transport + psum reductions PASS",
      flush=True)

# --- generic path: absorption to extinction over the pod mesh -------------
s2 = phys.Simulation(seed=1, mesh=mesh, fuse="off")
s2.exit = lambda x: len(x.objects) == 0  # extinction-probe path
s2.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
s2.add_step(1, phys.newton.NewtonianKinematicsStep())
s2.add_step(2, light.ScatterDeleteStep(np.double(0.002), np.double(0.002)))
s2.add_photons(light.generate_photon_state(N, E=1.0))
s2.start(); s2.join()
assert len(s2.objects) == 0
print(f"[{pid}] generic sharded extinction run PASS", flush=True)

# --- SPMD divergence guard: process 0 injects mid-run, others don't -------
# A desync like this would silently corrupt physics. Consensus gating never
# applies the one-sided edit (state stays identical pod-wide), and after
# `divergence_patience` stalled boundaries the guard raises a synchronized
# RuntimeError on EVERY process.
s3 = phys.Simulation(exit=lambda c: c.t >= 1.0, seed=2, mesh=mesh,
                     chunk_steps=2, divergence_patience=20)
s3.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
s3.add_step(1, phys.newton.NewtonianKinematicsStep())
s3.add_photons(light.generate_photon_state(N, E=1.0))
s3.start()
if pid == 0:
    s3.add_photons(light.generate_photon_state(N, E=2.0))  # only process 0!
err = None
try:
    s3.join()
except RuntimeError as e:
    err = e
assert err is not None and "divergence" in str(err), repr(err)
print(f"[{pid}] SPMD divergence guard raises on all processes PASS",
      flush=True)

# --- consensus gating: identical edits issued at DIFFERENT times apply ----
# Each process injects the same photons when its own engine clock passes a
# per-process threshold (~50 boundaries apart). The old instantaneous-digest
# guard killed exactly this healthy pattern; consensus gating defers the
# early process's edit until every process has queued it, then applies it at
# the same boundary everywhere.
import warnings  # noqa: E402

s4 = phys.Simulation(exit=lambda c: c.t >= 0.5, seed=3, mesh=mesh,
                     chunk_steps=2)
s4.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
s4.add_step(1, phys.newton.NewtonianKinematicsStep())
sign4 = light.ScatterSignMeasureStep(None, True)
s4.add_step(2, sign4)
s4.add_photons(light.generate_photon_state(N, E=1.0))
with warnings.catch_warnings():
    warnings.simplefilter("error", RuntimeWarning)  # no unapplied-edit warn
    s4.start()
    threshold = 0.1 if pid == 0 else 0.2  # ~50 boundaries of stagger
    import time

    while float(s4.get_state()["t"]) < threshold:
        time.sleep(0.005)
    s4.add_photons(light.generate_photon_state(N, E=2.0))  # identical data
    s4.join()
assert len(s4.ts) == 500, len(s4.ts)
counts = np.array([int(r[1]) for r in sign4.data])
assert counts[0] == N and counts[-1] == 2 * N, (counts[0], counts[-1])
# applied at ONE boundary: the count steps N -> 2N exactly once
assert set(np.unique(counts)) == {N, 2 * N}, np.unique(counts)
print(f"[{pid}] consensus-gated staggered injection applied identically "
      f"PASS", flush=True)


# --- chunk-boundary population control over the pod mesh ------------------
# Boundary splits use a deterministic (seed, boundary-index) key stream, so
# every process applies the identical control pass in lockstep — no edit
# queue, no divergence traffic; the state is re-placed after each pass.
import jax.numpy as jnp  # noqa: E402

Kc = 8
s5 = phys.Simulation(until_t=3 * Kc * 1e-3 * 0.9999, seed=7, mesh=mesh,
                     chunk_steps=Kc, capacity=8 * N)
s5.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
s5.add_step(1, phys.newton.NewtonianKinematicsStep())
_step_len = float(light.c) * 1e-3
s5.add_step(2, light.ImportanceSplitStep(
    lambda x, y, z: 2.0 ** jnp.floor(x / (Kc * _step_len) + 0.5),
    roulette=False, at="chunk"))
s5.add_photons(light.generate_photon_state(N, E=1.0))
s5.start(); s5.join()
assert s5.used_fused, "at-chunk split pod run must stay fused"
st5 = s5.sim_state
# global pod-sharded state: reduce on device (a host fetch of
# non-addressable shards is impossible), scalars come back replicated
tot_w, tot_n = jax.jit(lambda st: (
    jnp.sum(jnp.where(st.alive, st.w, 0.0)),
    jnp.sum(st.alive.astype(jnp.int32))))(st5)
n5, w5sum = int(jax.device_get(tot_n)), float(jax.device_get(tot_w))
assert n5 == N * 2 ** 2, n5  # interior boundaries double; final suppressed
assert abs(w5sum - N) < 0.01 * N
print(f"[{pid}] chunk-boundary splitting over the pod mesh PASS",
      flush=True)

# --- pod-scale continuous source: recycling past arena exhaustion ---------
# Total emission (100 iters x 2048) is >6x the arena; the source can only
# keep emitting if slot recycling runs on the PROCESS-SPANNING mesh
# (compact_on_mesh: sharding-preserving collective compaction — every
# process takes the identical recycle decision from the replicated alive
# count + deterministic emit schedule, no guard traffic). pcoll >> 1 makes
# the trajectory EXACT: every photon dies the iteration it moves, so the
# pre-delete census must read exactly emit_n from iteration 2 on.
EMIT, K6 = 2048, 100
s6 = phys.Simulation(until_t=K6 * 1e-3 * 0.9999, seed=11, mesh=mesh,
                     capacity=16384 * nproc, chunk_steps=8)
s6.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
s6.add_step(1, light.PhotonEmitterStep(EMIT, E=2.0))
s6.add_step(2, phys.newton.NewtonianKinematicsStep())
sign6 = light.ScatterSignMeasureStep(None, True)
s6.add_step(3, sign6)   # census BEFORE the kill: counts this iter's emits
s6.add_step(4, light.ScatterDeleteStep(np.double(1.0), np.double(1.0)))
s6.add_photons(light.generate_photon_state(1024, E=1.0))
s6.start(); s6.join()
assert s6.used_fused, "pod emitter run must stay fused"
ns6 = [int(r[1]) for r in sign6.data]
assert len(ns6) == K6, len(ns6)
assert ns6[0] == 1024 + EMIT, ns6[0]
assert ns6[1:] == [EMIT] * (K6 - 1), sorted(set(ns6[1:]))
assert EMIT * K6 > 6 * (16384 * nproc)  # recycling was unavoidable
print(f"[{pid}] pod-scale continuous source recycles past arena "
      f"exhaustion, exact census PASS", flush=True)

# steady-state physics at unsaturated p: N* = emit*(1-p)/p on the pod mesh
p7 = 0.001 * 0.001 * float(light.c) * 1e-3   # ~0.2998/iter
s7 = phys.Simulation(until_t=0.060 * 0.9999, seed=12, mesh=mesh,
                     capacity=16384 * nproc, chunk_steps=8)
s7.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
s7.add_step(1, light.PhotonEmitterStep(1000, E=1.0, isotropic=True))
s7.add_step(2, phys.newton.NewtonianKinematicsStep())
s7.add_step(3, light.ScatterDeleteStep(np.double(0.001), np.double(0.001)))
sign7 = light.ScatterSignMeasureStep(None, True)
s7.add_step(4, sign7)
s7.add_photons(light.generate_photon_state(100, E=1.0))
s7.start(); s7.join()
ns7 = np.array([int(r[1]) for r in sign7.data], float)
n_star = 1000 * (1 - p7) / p7
assert abs(ns7[-10:].mean() - n_star) / n_star < 0.1, ns7[-10:]
print(f"[{pid}] pod-mesh emitter steady state N*={n_star:.0f} "
      f"(measured {ns7[-10:].mean():.0f}) PASS", flush=True)

# --- per-photon E-list capture across processes ---------------------------
# The E channel is particle-axis-sharded; the engine allgathers it per chunk
# (fetch_to_every_host) so EVERY host assembles the identical complete list.
# Distinct per-photon energies make shard loss detectable: 1 + i*2^-16 is
# f32-exact, so the list's length AND sum pin every photon of every shard.
Ne = 2 * nproc * 16384
E_tag = 1.0 + np.arange(Ne, dtype=np.float64) * 2.0 ** -16
step_len = float(light.c) * 1e-3
for fuse_mode in ("auto", "off"):
    s8 = phys.Simulation(until_t=6 * 1e-3 * 0.9999, seed=13, mesh=mesh,
                         fuse=fuse_mode)
    s8.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s8.add_step(1, phys.newton.NewtonianKinematicsStep())
    cross = light.ScatterMeasureStep(
        None, True, measure_locs=[np.array([2.5 * step_len, np.nan, np.nan])],
        measure_E=True)
    s8.add_step(2, cross)
    s8.add_photons(light.generate_photon_state(Ne, E=E_tag.astype(np.float32)))
    s8.start(); s8.join()
    if fuse_mode == "auto":
        assert s8.used_fused, "pod E-list run must stay fused"
    counts = [int(r[2]) for r in cross.data]
    assert counts == [0, 0, Ne, 0, 0, 0], counts
    Es = np.asarray(cross.data[2][3], np.float64)
    assert Es.shape == (Ne,), Es.shape
    assert abs(Es.sum() - E_tag.sum()) < 1e-6 * E_tag.sum(), (
        Es.sum(), E_tag.sum())
    print(f"[{pid}] pod-mesh per-photon E-list capture (fuse={fuse_mode}) "
          f"complete across shards PASS", flush=True)

# --- shard-local path tracing on the pod mesh ------------------------------
# Stream buffers never cross DCN: each host assembles only ITS span of the
# particle axis, rows labeled with GLOBAL slot ids, CSV suffixed .p{pid}.
# A straight-line beam with per-photon x offsets makes every recorded value
# exactly predictable, so shard placement errors cannot hide.
Nt = 2 * nproc * 16384
x0 = np.arange(Nt, dtype=np.float32)  # photon g starts at x = g
s9 = phys.Simulation(until_t=4e-3 * 0.9999, seed=17, mesh=mesh)
s9.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
s9.add_step(1, phys.newton.NewtonianKinematicsStep())
trace = light.TracePathMeasureStep("/tmp/mp_trace.csv")
s9.add_step(2, trace)
s9.add_photons(light.generate_photon_state(
    Nt, E=1.0, r=np.stack([x0, np.zeros(Nt, np.float32),
                           np.zeros(Nt, np.float32)])))
s9.start(); s9.join()
assert s9.used_fused, "pod traced run must stay fused"
ts9, pos9, alive9, _ = trace.as_arrays()
per_proc = Nt // nproc
assert trace.col0 == pid * per_proc, (trace.col0, pid * per_proc)
assert pos9.shape == (4, 3, per_proc), pos9.shape
assert alive9.all()
g = trace.col0 + np.arange(per_proc, dtype=np.float64)
for ti in range(4):
    expect_x = g + step_len * (ti + 1)
    err = np.abs(pos9[ti, 0, :].astype(np.float64) - expect_x)
    assert err.max() <= 1e-3 * step_len, (ti, err.max())
    assert np.abs(pos9[ti, 1:, :]).max() == 0.0
rows9 = trace.data
assert rows9[0][0] == "t" and len(rows9) == 1 + per_proc
assert rows9[1][0] == str(trace.col0), rows9[1][0]
assert os.path.exists(f"/tmp/mp_trace.csv.p{pid}")
print(f"[{pid}] pod-mesh shard-local path trace (cols {trace.col0}.."
      f"{trace.col0 + per_proc - 1}, global ids, .p{pid} CSV) PASS",
      flush=True)

print(f"[{pid}] ALL MULTIPROCESS CHECKS PASS", flush=True)
