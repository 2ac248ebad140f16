"""Checkpoint / resume.

The reference has no checkpointing (SURVEY.md §5: persistence is only the
CSV dump at terminate). Here the whole simulation state is a small pytree of
arrays, so snapshot/restore is a single fetch: ``save_checkpoint`` writes an
.npz with every SoA field plus clock/PRNG state and the ``sim.ts`` log;
``Simulation.restore_checkpoint`` resumes a run from it.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from physicl_tpu.state import SimState

__all__ = ["save_checkpoint", "load_checkpoint", "state_from_checkpoint"]

_FIELDS = ("r", "dr", "v", "dv", "a", "E", "alive", "otype", "w", "t", "dt",
           "key", "n_spawned", "t_comp")


def save_checkpoint(sim, path: str) -> None:
    """Snapshot a Simulation (running or finished) to ``path`` (.npz)."""
    state = sim.sim_state
    if state is None:
        state = SimState.from_population(sim._pending_objects,
                                         sim._pending_bulk, seed=sim.seed)
    with sim._state_lock:
        host = {f: np.asarray(jax.device_get(getattr(state, f)))
                for f in _FIELDS}
        for name, arr in state.extras.items():
            host[f"extra.{name}"] = np.asarray(jax.device_get(arr))
        meta = {
            "ts": list(map(float, sim.ts)),
            "seed": int(sim.seed),
            "initial_count": int(sim._initial_count),
        }
    np.savez_compressed(path, __meta__=json.dumps(meta), **host)


def load_checkpoint(path: str):
    """-> (SimState, meta dict)."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        # t_comp (Kahan clock compensation) is absent in pre-r3 checkpoints;
        # default to zero rather than failing the load
        kw = {f: jnp.asarray(z[f]) for f in _FIELDS if f in z.files}
        if "w" not in kw:  # statistical weights absent pre-weighted-transport
            kw["w"] = jnp.ones(kw["E"].shape, kw["E"].dtype)
        kw["extras"] = {
            k[len("extra."):]: jnp.asarray(z[k])
            for k in z.files if k.startswith("extra.")
        }
    return SimState(**kw), meta


def state_from_checkpoint(path: str) -> SimState:
    return load_checkpoint(path)[0]
