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
    "device_propose_birth_death", "device_propose_mixed",
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
    # random-scan move mixture (regen, leaf-swap, birth-death) — carried as
    # traced data so studies/users can vary it without staling the jit cache
    move_probs: jnp.ndarray

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
            jnp.asarray(MOVE_PROBS, dtype=jnp.float32),
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


def _bottom_mask(N: int) -> np.ndarray:
    """Static bool[N]: slot sits on the bottom heap level."""
    levels = int(math.log2(N + 1))
    return np.asarray(
        [int(math.log2(j + 1)) == levels - 1 for j in range(N)], dtype=bool)


def _in_subtree_matrix(anc, N):
    """bool[N, N]: entry (j, v) — slot j lies in the subtree rooted at v."""
    return jnp.any(anc[:, :, None] == jnp.arange(N)[None, None, :], axis=1)


def _tree_log_prior_device(types, cfg: ConfigArrays, slot_mask=None):
    """Structure log-prior, slot-decomposed (device analog of
    ``structures.log_prior_structure``): a leaf above the bottom level costs
    ``log p(leaf-choice) + log p(type)``, at the bottom only the type term
    (generation is forced to a leaf there); an internal node costs its op
    probability.  ``slot_mask`` restricts to a subtree."""
    N = types.shape[0]
    bottom = jnp.asarray(_bottom_mask(N))
    is_leaf = (types >= 1) & (types <= PERIODIC)
    is_bin = (types >= PLUS) & (types <= CP)
    leaf_lp = cfg.leaf_logits[jnp.clip(types - 1, 0, 4)]
    lp = jnp.where(
        is_leaf, leaf_lp + jnp.where(bottom, 0.0, cfg.op_logits[0]), 0.0)
    lp = lp + jnp.where(
        is_bin, cfg.op_logits[jnp.clip(types - PLUS + 1, 1, 3)], 0.0)
    if slot_mask is not None:
        lp = jnp.where(slot_mask, lp, 0.0)
    return jnp.sum(lp)


def _params_log_prior_device(types, params, cfg: ConfigArrays,
                             slot_mask=None):
    """Normal log-density of the unconstrained params on active slots."""
    mu, sigma, active = device_prior_arrays(types, cfg)
    z = (params - mu) / sigma
    lp = -0.5 * z * z - jnp.log(sigma) - 0.5 * jnp.float32(
        math.log(2.0 * math.pi))
    w = active if slot_mask is None else active * slot_mask[:, None]
    return jnp.sum(w * lp)


def _relocate(types, params, ni, move):
    """Scatter slots ``j`` with ``move[j]`` to heap index ``ni[j]`` via a
    one-hot select (Mosaic/XLA-friendly: no dynamic scatter).  Returns
    (relocated_types, relocated_params, has_destination)."""
    N = types.shape[0]
    onehot = (ni[:, None] == jnp.arange(N)[None, :]) & move[:, None]
    oh = onehot.astype(params.dtype)
    rel_t = jnp.einsum("jd,j->d", oh, types.astype(params.dtype))
    rel_p = jnp.einsum("jd,jk->dk", oh, params)
    return rel_t.astype(types.dtype), rel_p, jnp.any(onehot, axis=0)


def _down_map_device(v, target_v, N):
    """new-index array for relocating the subtree at dynamic root ``v`` so it
    lands at ``target_v``; -1 outside the subtree (children follow parents,
    unrolled top-down like the regeneration loop)."""
    ni = jnp.full((N,), -1, jnp.int32)
    for j in range(N):
        if j == 0:
            val = jnp.where(v == 0, target_v, -1)
        else:
            parent = (j - 1) // 2
            b = j - (2 * parent + 1)
            pni = ni[parent]
            val = jnp.where(
                j == v, target_v, jnp.where(pni >= 0, 2 * pni + 1 + b, -1))
        ni = ni.at[j].set(val)
    return ni


def _regen_subtree(types, k_types, cfg: ConfigArrays, root, in_sub_root):
    """Regenerate the (cleared) subtree at dynamic ``root`` from the PCFG,
    top-down — the same unrolled loop as ``device_propose``'s."""
    N = types.shape[0]
    type_keys = jax.random.split(k_types, N)
    new_types = types
    for j in range(N):
        at_max = (2 * j + 1) >= N
        sampled = _sample_type(type_keys[j], at_max, cfg)
        if j == 0:
            need = (root == 0)
        else:
            parent_t = new_types[(j - 1) // 2]
            parent_binary = (
                (parent_t == PLUS) | (parent_t == TIMES) | (parent_t == CP)
            )
            need = (j == root) | (in_sub_root[j] & parent_binary)
        new_types = new_types.at[j].set(
            jnp.where(need, sampled, new_types[j]))
    return new_types


def device_propose_birth_death(types, params, key, cfg: ConfigArrays, anc):
    """Reversible birth/death dimension move, on device (one particle).

    Mirror of ``structures.propose_birth_death`` — 50/50 birth-vs-death
    coin; birth inserts an internal op above a feasible node, relocating the
    existing subtree intact (parameters preserved) and prior-sampling a
    sibling; death promotes one child of an internal node and deletes the
    other.  Hastings corrections are accounted numerically (full structure +
    param prior log-densities plus exact proposal densities); infeasible
    submoves force a reject via ``log_hastings = -inf``.
    """
    N = types.shape[0]
    LOG2 = jnp.float32(math.log(2.0))
    k_coin, k_pick, k_op, k_side, k_regen, k_params = jax.random.split(key, 6)
    anc_j = jnp.asarray(anc)
    in_sub = _in_subtree_matrix(anc_j, N)
    bottom = jnp.asarray(_bottom_mask(N))
    occupied = types != EMPTY
    is_bin = (types >= PLUS) & (types <= CP)
    bin_logp = jax.nn.log_softmax(cfg.op_logits[1:])
    iota = jnp.arange(N)

    do_birth = jax.random.bernoulli(k_coin)

    lp_t = (_tree_log_prior_device(types, cfg)
            + _params_log_prior_device(types, params, cfg))

    # ---------- birth ----------
    # feasible roots: occupied, no occupied bottom-level node in the subtree
    has_bottom = jnp.any((occupied & bottom)[:, None] & in_sub, axis=0)
    feas = occupied & ~has_bottom
    F = jnp.sum(feas)
    birth_ok = F > 0
    v = jnp.where(
        birth_ok,
        jax.random.categorical(k_pick, jnp.where(feas, 0.0, -jnp.inf)), 0)
    oi = jax.random.categorical(k_op, cfg.op_logits[1:])
    o = jnp.asarray([PLUS, TIMES, CP], jnp.int32)[oi]
    side = jax.random.bernoulli(k_side).astype(jnp.int32)
    target_v = 2 * v + 1 + side
    sib = 2 * v + 2 - side

    in_sub_v = in_sub[:, v]
    ni = _down_map_device(v, target_v, N)
    rel_t, rel_p, has_dst = _relocate(
        types, params, ni, (ni >= 0) & occupied & in_sub_v)
    bt = jnp.where(has_dst, rel_t, jnp.where(in_sub_v, EMPTY, types))
    bp = jnp.where(has_dst[:, None], rel_p,
                   jnp.where(in_sub_v[:, None], 0.0, params))
    at_v = iota == v
    bt = jnp.where(at_v, o, bt)
    in_sub_sib = in_sub[:, sib]
    bt = _regen_subtree(bt, k_regen, cfg, sib, in_sub_sib)
    mu, sigma, active = device_prior_arrays(bt, cfg)
    eps = jax.random.normal(k_params, params.shape, params.dtype)
    fresh = (in_sub_sib | at_v)[:, None]
    bp = jnp.where(fresh & (active > 0), mu + sigma * eps,
                   jnp.where(fresh, 0.0, bp))

    lp_bt = (_tree_log_prior_device(bt, cfg)
             + _params_log_prior_device(bt, bp, cfg))
    D2 = jnp.sum((bt >= PLUS) & (bt <= CP))
    b_q_fwd = (-jnp.log(F.astype(jnp.float32)) + bin_logp[oi] - LOG2
               + _tree_log_prior_device(bt, cfg, slot_mask=in_sub_sib)
               + _params_log_prior_device(bt, bp, cfg, slot_mask=in_sub_sib)
               + _params_log_prior_device(bt, bp, cfg, slot_mask=at_v))
    b_q_rev = -jnp.log(D2.astype(jnp.float32)) - LOG2
    b_log_h = jnp.where(
        birth_ok, (lp_bt - lp_t) + (b_q_rev - b_q_fwd), -jnp.inf)

    # ---------- death ----------
    D = jnp.sum(is_bin)
    death_ok = D > 0
    u = jnp.where(
        death_ok,
        jax.random.categorical(k_pick, jnp.where(is_bin, 0.0, -jnp.inf)), 0)
    c = side  # reuse the side coin (independent of the birth branch taken)
    child = 2 * u + 1 + c
    other = 2 * u + 2 - c
    in_sub_u, in_sub_child = in_sub[:, u], in_sub[:, child]
    in_sub_other = in_sub[:, other]
    ni_d = _down_map_device(child, u, N)
    rel_t, rel_p, has_dst = _relocate(
        types, params, ni_d, (ni_d >= 0) & occupied & in_sub_child)
    dt = jnp.where(has_dst, rel_t, jnp.where(in_sub_u, EMPTY, types))
    dp = jnp.where(has_dst[:, None], rel_p,
                   jnp.where(in_sub_u[:, None], 0.0, params))

    lp_dt = (_tree_log_prior_device(dt, cfg)
             + _params_log_prior_device(dt, dp, cfg))
    occ2 = dt != EMPTY
    has_bottom2 = jnp.any((occ2 & bottom)[:, None] & in_sub, axis=0)
    F2 = jnp.sum(occ2 & ~has_bottom2)
    at_u = iota == u
    oi_old = jnp.clip(types[u] - PLUS, 0, 2)
    d_q_fwd = -jnp.log(D.astype(jnp.float32)) - LOG2
    d_q_rev = (-jnp.log(F2.astype(jnp.float32)) + bin_logp[oi_old] - LOG2
               + _tree_log_prior_device(types, cfg, slot_mask=in_sub_other)
               + _params_log_prior_device(
                   types, params, cfg, slot_mask=in_sub_other)
               + _params_log_prior_device(
                   types, params, cfg, slot_mask=at_u))
    d_log_h = jnp.where(
        death_ok, (lp_dt - lp_t) + (d_q_rev - d_q_fwd), -jnp.inf)

    new_types = jnp.where(do_birth, bt, dt)
    new_params = jnp.where(do_birth, bp, dp)
    log_h = jnp.where(do_birth, b_log_h, d_log_h)
    ok = jnp.where(do_birth, birth_ok, death_ok)
    new_types = jnp.where(ok, new_types, types)
    new_params = jnp.where(ok, new_params, params)
    return new_types, new_params, log_h


# Random-scan move mixture (host ``inference/structure_mcmc.propose_batch``
# mirrors these weights): subtree regeneration / leaf-type swap /
# birth-death.  Regeneration keeps global exploration; the dimension move
# grows or prunes structure around learned subtrees without destroying
# their parameters.
MOVE_PROBS = (0.4, 0.3, 0.3)


def device_propose_mixed(types, params, key, cfg: ConfigArrays, anc):
    """Random-scan mixture of the three involutive moves (one particle).

    ``cfg.move_probs = (p_regen, p_leaf_swap, p_birth_death)`` — a random
    scan over valid MH kernels keeps the posterior invariant, and mixing
    move types mixes deep trees faster than regeneration alone (the engine's
    ``mcmc_structure!`` likewise mixes several involutive move types).
    """
    k_choice, k_a, k_b, k_c = jax.random.split(key, 4)
    r = jax.random.uniform(k_choice)
    p_regen, p_leaf = cfg.move_probs[0], cfg.move_probs[1]
    t1, p1, h1 = device_propose(types, params, k_a, cfg, anc)
    t2, p2, h2 = device_propose_leaf(types, params, k_b, cfg)
    t3, p3, h3 = device_propose_birth_death(types, params, k_c, cfg, anc)
    use_leaf = (r >= p_regen) & (r < p_regen + p_leaf)
    use_bd = r >= p_regen + p_leaf
    new_types = jnp.where(use_bd, t3, jnp.where(use_leaf, t2, t1))
    new_params = jnp.where(use_bd, p3, jnp.where(use_leaf, p2, p1))
    log_h = jnp.where(use_bd, h3, jnp.where(use_leaf, h2, h1))
    return new_types, new_params, log_h


def config_arrays(config: GPConfig) -> ConfigArrays:
    return ConfigArrays.from_config(config)
