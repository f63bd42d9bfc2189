"""Device-side kernel-tree operations: prior arrays and subtree proposals.

The host-side proposal path (``structures.py`` + ``inference/structure_mcmc``)
costs one host<->device round-trip per involutive move — ~30 ms of latency on
a tunneled TPU before any compute.  The heap encoding makes the *entire*
proposal computable on device instead: every slot's ancestor chain is static,
so "clear the subtree at v and regenerate it from the PCFG prior" becomes a
fixed sequence of per-slot categorical draws and mask selects.  With this,
a full rejuvenation sweep (propose -> MH accept -> HMC) — and the whole SMC
fit — compiles to one XLA program (see ``inference/device_smc.py``).

Distributionally identical to the host path: node picked uniformly among
occupied slots, subtree and its params regenerated from the prior, Hastings
correction ``log|T| - log|T'|`` (prior/proposal terms cancel; derivation in
``structures.py``).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import GPConfig
from .structures import CP, EMPTY, GE, PERIODIC, PLUS, TIMES

__all__ = [
    "ConfigArrays", "config_arrays", "ancestor_table",
    "device_prior_arrays", "device_propose", "device_propose_leaf",
    "device_propose_mixed",
]


def ancestor_table(max_nodes: int) -> np.ndarray:
    """Static (max_nodes, levels) table: row j = [j, parent(j), ..., root].

    Padded with -1.  Slot j is in the subtree rooted at v iff v appears in
    row j — a static-width comparison, no dynamic tree walk.
    """
    levels = int(math.log2(max_nodes + 1))
    out = np.full((max_nodes, levels), -1, dtype=np.int32)
    for j in range(max_nodes):
        a, k = j, 0
        while True:
            out[j, k] = a
            if a == 0:
                break
            a = (a - 1) // 2
            k += 1
    return out


class ConfigArrays(NamedTuple):
    """GPConfig lowered to device arrays — a pytree, so it flows through jit
    as traced data (one compilation serves every prior setting)."""

    leaf_logits: jnp.ndarray
    op_logits: jnp.ndarray
    wc_mu: jnp.ndarray
    wc_sigma: jnp.ndarray
    period_mu: jnp.ndarray
    period_sigma: jnp.ndarray
    gamma_mu: jnp.ndarray
    gamma_sigma: jnp.ndarray

    @classmethod
    def from_config(cls, config: GPConfig) -> "ConfigArrays":
        leaf = np.asarray(config.node_dist_leaf, dtype=np.float32)
        if config.changepoints:
            op = np.asarray(config.node_dist_cp, dtype=np.float32)
        else:
            op = np.concatenate(
                [np.asarray(config.node_dist_nocp, dtype=np.float32), [0.0]]
            )
        with np.errstate(divide="ignore"):
            leaf_logits = jnp.asarray(np.log(leaf))
            op_logits = jnp.asarray(np.log(op))
        pr = config.prior
        return cls(
            leaf_logits, op_logits,
            jnp.float32(pr["wildcard"]["mu"]), jnp.float32(pr["wildcard"]["sigma"]),
            jnp.float32(pr["period"]["mu"]), jnp.float32(pr["period"]["sigma"]),
            jnp.float32(pr["gamma"]["mu"]), jnp.float32(pr["gamma"]["sigma"]),
        )


def device_prior_arrays(types, cfg: ConfigArrays):
    """(mu, sigma, active) f32[N, 3] for a single tree's param slots.

    Device analog of ``structures.prior_arrays``: slot kinds follow the node
    type (period slot for Periodic p1, gamma slot for GE p1, wildcard
    elsewhere; combinators CP use two wildcard slots, Plus/Times none).
    """
    N = types.shape[0]
    t = types[:, None]
    # active-slot pattern per type: numbers of used slots
    # CONST:1 LINEAR:2 SE:2 GE:3 PERIODIC:3 CP:2 PLUS/TIMES/EMPTY:0
    n_slots = jnp.zeros(N, jnp.int32)
    for code, k in ((1, 1), (2, 2), (3, 2), (4, 3), (5, 3), (8, 2)):
        n_slots = jnp.where(types == code, k, n_slots)
    slot_idx = jnp.arange(3)[None, :]
    active = (slot_idx < n_slots[:, None]).astype(jnp.float32)

    mu = jnp.full((N, 3), cfg.wc_mu)
    sigma = jnp.full((N, 3), cfg.wc_sigma)
    is_period_slot = (t == PERIODIC) & (slot_idx == 1)
    is_gamma_slot = (t == GE) & (slot_idx == 1)
    mu = jnp.where(is_period_slot, cfg.period_mu, mu)
    sigma = jnp.where(is_period_slot, cfg.period_sigma, sigma)
    mu = jnp.where(is_gamma_slot, cfg.gamma_mu, mu)
    sigma = jnp.where(is_gamma_slot, cfg.gamma_sigma, sigma)
    return mu, sigma, active


def _sample_type(key, at_max_depth: bool, cfg: ConfigArrays):
    """Sample one slot's node type from the PCFG: leaf at max depth, else
    op distribution (leaf/plus/times/changepoint) with leaf expanded."""
    k_op, k_leaf = jax.random.split(key)
    leaf_code = 1 + jax.random.categorical(k_leaf, cfg.leaf_logits)
    choice = jax.random.categorical(k_op, cfg.op_logits)
    op_code = jnp.asarray([0, PLUS, TIMES, CP], jnp.int32)[choice]
    t = jnp.where(choice == 0, leaf_code, op_code)
    return jnp.where(at_max_depth, leaf_code, t).astype(jnp.int32)


def device_propose(types, params, key, cfg: ConfigArrays, anc):
    """One subtree-regeneration proposal for a single particle, on device.

    types: i32[N]; params: f32[N, 3]; anc: static ancestor table i32[N, L].
    Returns (types', params', log_hastings).
    """
    N = types.shape[0]
    levels = anc.shape[1]
    k_pick, k_types, k_params = jax.random.split(key, 3)

    occupied = (types != EMPTY)
    pick_logits = jnp.where(occupied, 0.0, -jnp.inf)
    v = jax.random.categorical(k_pick, pick_logits)

    anc_j = jnp.asarray(anc)  # (N, L)
    in_subtree = jnp.any(anc_j == v, axis=1)  # includes j == v

    # top-down regeneration: ascending slot index = parents before children
    type_keys = jax.random.split(k_types, N)
    new_types = jnp.where(in_subtree, EMPTY, types)
    for j in range(N):
        at_max = (2 * j + 1) >= N  # bottom heap level (static)
        sampled = _sample_type(type_keys[j], at_max, cfg)
        if j == 0:
            need = (v == 0)
        else:
            parent_t = new_types[(j - 1) // 2]
            parent_binary = (
                (parent_t == PLUS) | (parent_t == TIMES) | (parent_t == CP)
            )
            need = (j == v) | (in_subtree[j] & parent_binary)
        new_types = new_types.at[j].set(
            jnp.where(need, sampled, new_types[j])
        )

    # params: prior draws on regenerated slots, untouched elsewhere
    mu, sigma, active = device_prior_arrays(new_types, cfg)
    eps = jax.random.normal(k_params, params.shape, params.dtype)
    drawn = mu + sigma * eps
    regen = in_subtree[:, None] & (active > 0)
    new_params = jnp.where(regen, drawn, jnp.where(in_subtree[:, None], 0.0, params))

    n_old = jnp.sum(occupied)
    n_new = jnp.sum(new_types != EMPTY)
    log_hastings = jnp.log(n_old.astype(jnp.float32)) - jnp.log(
        n_new.astype(jnp.float32)
    )
    return new_types, new_params, log_hastings


def device_propose_leaf(types, params, key, cfg: ConfigArrays):
    """Leaf-type-swap proposal for a single particle, on device.

    Mirror of ``structures.propose_leaf_swap``: pick a leaf uniformly,
    redraw its type from ``node_dist_leaf`` and its params from the prior.
    Prior and proposal densities cancel exactly, so log_hastings = 0.
    """
    N = types.shape[0]
    k_pick, k_type, k_params = jax.random.split(key, 3)
    from .structures import CONST

    is_leaf = (types >= CONST) & (types <= PERIODIC)
    pick_logits = jnp.where(is_leaf, 0.0, -jnp.inf)
    v = jax.random.categorical(k_pick, pick_logits)
    new_leaf = (1 + jax.random.categorical(k_type, cfg.leaf_logits)).astype(
        types.dtype)
    at_v = (jnp.arange(N) == v)
    new_types = jnp.where(at_v, new_leaf, types)

    mu, sigma, active = device_prior_arrays(new_types, cfg)
    eps = jax.random.normal(k_params, params.shape, params.dtype)
    drawn = mu + sigma * eps
    regen = at_v[:, None] & (active > 0)
    new_params = jnp.where(
        regen, drawn, jnp.where(at_v[:, None], 0.0, params)
    )
    return new_types, new_params, jnp.float32(0.0)


def device_propose_mixed(types, params, key, cfg: ConfigArrays, anc,
                         p_leaf_swap: float = 0.5):
    """Random-scan mixture of the two involutive moves (one particle).

    With probability ``p_leaf_swap`` propose a leaf-type swap, else a
    subtree regeneration — a random scan over valid MH kernels keeps the
    posterior invariant, and mixing move types mixes deep trees faster
    than regeneration alone (the engine's ``mcmc_structure!`` likewise
    mixes several involutive move types).
    """
    k_choice, k_a, k_b = jax.random.split(key, 3)
    use_leaf = jax.random.uniform(k_choice) < p_leaf_swap
    t1, p1, h1 = device_propose(types, params, k_a, cfg, anc)
    t2, p2, h2 = device_propose_leaf(types, params, k_b, cfg)
    new_types = jnp.where(use_leaf, t2, t1)
    new_params = jnp.where(use_leaf, p2, p1)
    log_h = jnp.where(use_leaf, h2, h1)
    return new_types, new_params, log_h


def config_arrays(config: GPConfig) -> ConfigArrays:
    return ConfigArrays.from_config(config)
