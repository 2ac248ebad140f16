"""On-device particle compaction (the TPU replacement for the reference's
O(n^2) host-side ``sim.remove_obj`` list mutation, physicl/light.py:203-205).

Deletion itself is just an alive-mask clear; compaction re-packs survivors to
the front of the buffer (a cumsum scatter — one fused XLA pass) so the engine
can shrink capacity and stop spending VPU lanes on dead photons in
extinction-dominated workloads.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from physicl_tpu.state import SimState, pad_capacity

__all__ = ["compact", "compact_shrink"]


@jax.jit
def compact(state: SimState) -> SimState:
    """Move alive particles to the front (stable order), dead to the back."""
    alive_i = state.alive.astype(jnp.int32)
    # destination slot for each particle: alive -> rank among alive,
    # dead -> n_alive + rank among dead (stable partition)
    n_alive = jnp.sum(alive_i)
    rank_alive = jnp.cumsum(alive_i) - alive_i
    rank_dead = jnp.cumsum(1 - alive_i) - (1 - alive_i)
    dest = jnp.where(state.alive, rank_alive, n_alive + rank_dead)

    def scatter_last(x):
        if x.ndim == 0 or x.shape[-1] != state.capacity:
            return x
        return jnp.zeros_like(x).at[..., dest].set(x)

    return state.replace(
        r=scatter_last(state.r), dr=scatter_last(state.dr),
        v=scatter_last(state.v), dv=scatter_last(state.dv),
        a=scatter_last(state.a), E=scatter_last(state.E),
        alive=scatter_last(state.alive), otype=scatter_last(state.otype),
        w=scatter_last(state.w),
        n_spawned=n_alive,  # survivors packed to front; next slot = count
        extras={k: scatter_last(v) for k, v in state.extras.items()},
    )


def compact_shrink(state: SimState, n_alive: int) -> SimState:
    """Compact, then truncate capacity to the padded survivor count.

    Host-side sizing decision (capacity is a static shape); the copy is one
    device pass. Returns the state unchanged if no shrink is possible.
    """
    new_cap = pad_capacity(max(int(n_alive), 1))
    if new_cap >= state.capacity:
        return state
    packed = compact(state)

    def cut(x):
        if x.ndim == 0 or x.shape[-1] != state.capacity:
            return x
        return x[..., :new_cap]

    return packed.replace(
        r=cut(packed.r), dr=cut(packed.dr), v=cut(packed.v),
        dv=cut(packed.dv), a=cut(packed.a), E=cut(packed.E),
        alive=cut(packed.alive), otype=cut(packed.otype),
        w=cut(packed.w),
        extras={k: cut(v) for k, v in packed.extras.items()},
    )
