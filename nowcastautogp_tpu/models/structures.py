"""Kernel expression trees: host-side representation, priors, and proposals.

The engine's central design (SURVEY.md §7): every particle carries a
*compositional kernel expression tree* — leaves from {Constant, Linear,
SquaredExponential, GammaExponential, Periodic}, internal nodes from
{Plus, Times, ChangePoint} (matching the structure language documented at
``/root/reference/docs/vignettes/setting-priors.jl:17-21,50-62``).  To keep XLA
shapes static while structures churn under MCMC, trees are encoded as a
fixed-size *complete binary heap*:

* ``node_types``: int32[max_nodes], heap-indexed (children of ``i`` at
  ``2i+1``/``2i+2``), with 0 = empty slot.
* ``params``: float32[max_nodes, 3] of *unconstrained* hyperparameters; the
  meaning of each slot depends on the node type (see ``ops/kernels.py``).

Structure *proposals* (subtree-regeneration involutive moves) and prior
sampling are irregular, so they run host-side in numpy; likelihood evaluation
of proposals is a batched device call (see ``inference/structure_mcmc.py``).
With subtrees regenerated from the prior at a uniformly chosen node, the MH
acceptance ratio reduces to ``LML' - LML + log|T| - log|T'|`` (structure-prior
and parameter-prior factors cancel against the proposal density).
"""

from __future__ import annotations

import numpy as np

from .config import GPConfig

__all__ = [
    "EMPTY", "CONST", "LINEAR", "SE", "GE", "PERIODIC", "PLUS", "TIMES", "CP",
    "N_PARAM_SLOTS", "LEAF_TYPES", "BINARY_TYPES",
    "sample_structure", "sample_params_for_subtree", "sample_particle",
    "log_prior_structure", "count_nodes", "param_slot_kinds", "prior_arrays",
    "subtree_slots", "propose_subtree_replace", "propose_leaf_swap",
    "structure_to_str",
]

# Node type codes. Leaf codes 1..5 match the reference's documented leaf
# indexing (Constant=1, Linear=2, SquaredExponential=3, GammaExponential=4,
# Periodic=5; docs/vignettes/setting-priors.jl:50-62).
EMPTY, CONST, LINEAR, SE, GE, PERIODIC, PLUS, TIMES, CP = range(9)

LEAF_TYPES = (CONST, LINEAR, SE, GE, PERIODIC)
BINARY_TYPES = (PLUS, TIMES, CP)
N_PARAM_SLOTS = 3

# Per node type: the prior "kind" of each unconstrained parameter slot.
# None = inactive slot; "wildcard"/"period"/"gamma" select prior entries.
_SLOT_KINDS = {
    EMPTY: (None, None, None),
    CONST: ("wildcard", None, None),           # log amplitude^2
    LINEAR: ("wildcard", "wildcard", None),    # intercept, log amplitude^2
    SE: ("wildcard", "wildcard", None),        # log lengthscale, log amplitude^2
    GE: ("wildcard", "gamma", "wildcard"),     # log lengthscale, gamma raw, log amp^2
    PERIODIC: ("wildcard", "period", "wildcard"),  # log lengthscale, log period, log amp^2
    PLUS: (None, None, None),
    TIMES: (None, None, None),
    CP: ("wildcard", "wildcard", None),        # location, log scale
}

_NAMES = ["∅", "Const", "Linear", "SE", "GammaExp", "Periodic", "+", "×", "CP"]


def _depth_of(i: int) -> int:
    return int(np.log2(i + 1))


def _levels(max_nodes: int) -> int:
    return int(np.log2(max_nodes + 1))


def param_slot_kinds(node_type: int):
    return _SLOT_KINDS[int(node_type)]


def _sample_leaf(rng: np.random.Generator, config: GPConfig) -> int:
    return LEAF_TYPES[rng.choice(5, p=np.asarray(config.node_dist_leaf))]


def _node_dist(config: GPConfig) -> np.ndarray:
    return np.asarray(config.node_dist_cp if config.changepoints else config.node_dist_nocp)


def sample_structure(
    rng: np.random.Generator, config: GPConfig, max_nodes: int | None = None,
    root: int = 0, out: np.ndarray | None = None,
) -> np.ndarray:
    """Sample a tree (or subtree rooted at ``root``) from the PCFG prior."""
    max_nodes = config.max_nodes if max_nodes is None else max_nodes
    levels = _levels(max_nodes)
    if out is None:
        out = np.zeros(max_nodes, dtype=np.int32)

    def fill(i: int):
        if _depth_of(i) == levels - 1:
            out[i] = _sample_leaf(rng, config)
            return
        dist = _node_dist(config)
        choice = rng.choice(len(dist), p=dist)
        if choice == 0:
            out[i] = _sample_leaf(rng, config)
        else:
            out[i] = (PLUS, TIMES, CP)[choice - 1]
            fill(2 * i + 1)
            fill(2 * i + 2)

    fill(root)
    return out


def log_prior_structure(node_types: np.ndarray, config: GPConfig, root: int = 0) -> float:
    """Log prior probability of the (sub)tree under the PCFG."""
    levels = _levels(node_types.shape[0])
    leaf_p = np.asarray(config.node_dist_leaf)
    dist = _node_dist(config)

    def walk(i: int) -> float:
        t = int(node_types[i])
        at_max = _depth_of(i) == levels - 1
        if t in LEAF_TYPES:
            lp = np.log(leaf_p[t - CONST]) if leaf_p[t - CONST] > 0 else -np.inf
            if not at_max:
                lp += np.log(dist[0]) if dist[0] > 0 else -np.inf
            return float(lp)
        idx = 1 + BINARY_TYPES.index(t)
        lp = np.log(dist[idx]) if dist[idx] > 0 else -np.inf
        return float(lp) + walk(2 * i + 1) + walk(2 * i + 2)

    return walk(root)


def count_nodes(node_types: np.ndarray) -> int:
    return int(np.sum(node_types != EMPTY))


def subtree_slots(node_types: np.ndarray, root: int) -> list[int]:
    """Heap indices of the subtree rooted at ``root`` (occupied slots only)."""
    n = node_types.shape[0]
    slots, stack = [], [root]
    while stack:
        i = stack.pop()
        if i >= n or node_types[i] == EMPTY:
            continue
        slots.append(i)
        if node_types[i] in BINARY_TYPES:
            stack.extend((2 * i + 1, 2 * i + 2))
    return slots


def sample_params_for_subtree(
    rng: np.random.Generator, node_types: np.ndarray, config: GPConfig,
    slots: list[int], params: np.ndarray | None = None,
) -> np.ndarray:
    """Sample unconstrained params from the prior for the given node slots."""
    if params is None:
        params = np.zeros((node_types.shape[0], N_PARAM_SLOTS), dtype=np.float32)
    for i in slots:
        kinds = _SLOT_KINDS[int(node_types[i])]
        for s, kind in enumerate(kinds):
            if kind is None:
                params[i, s] = 0.0
            else:
                pr = config.prior[kind]
                params[i, s] = rng.normal(pr["mu"], pr["sigma"])
    return params


def sample_particle(rng: np.random.Generator, config: GPConfig):
    """Sample a full particle (structure, params, log-noise) from the prior."""
    types = sample_structure(rng, config)
    params = sample_params_for_subtree(rng, types, config, subtree_slots(types, 0))
    wc = config.prior["wildcard"]
    if config.noise is None:
        # log observation-noise variance; offset low — data is standardized
        log_noise = rng.normal(wc["mu"] - 2.0, wc["sigma"])
    else:
        log_noise = np.log(float(config.noise))
    return types, params, np.float32(log_noise)


def prior_arrays(node_types_batch: np.ndarray, config: GPConfig):
    """Per-slot prior (mu, sigma, active) arrays for a batch of trees.

    ``node_types_batch``: int32[P, max_nodes].  Returns float32 arrays of shape
    [P, max_nodes, 3] used by the device-side HMC log-posterior; recomputed
    host-side after every accepted structure move (host owns the trees).
    """
    P, n = node_types_batch.shape
    mu = np.zeros((P, n, N_PARAM_SLOTS), dtype=np.float32)
    sigma = np.ones((P, n, N_PARAM_SLOTS), dtype=np.float32)
    active = np.zeros((P, n, N_PARAM_SLOTS), dtype=np.float32)
    # vectorized over the small set of node types
    for t, kinds in _SLOT_KINDS.items():
        sel = node_types_batch == t
        if not sel.any():
            continue
        for s, kind in enumerate(kinds):
            if kind is None:
                continue
            pr = config.prior[kind]
            mu[sel, s] = pr["mu"]
            sigma[sel, s] = pr["sigma"]
            active[sel, s] = 1.0
    return mu, sigma, active


def propose_subtree_replace(
    rng: np.random.Generator, node_types: np.ndarray, params: np.ndarray,
    config: GPConfig,
):
    """One involutive subtree-regeneration proposal for a single particle.

    Returns ``(new_types, new_params, log_hastings)`` where ``log_hastings`` is
    the proposal-asymmetry correction ``log|T| - log|T'|``; the caller adds the
    LML difference to form the MH acceptance logit.
    """
    occupied = np.flatnonzero(node_types != EMPTY)
    v = int(rng.choice(occupied))
    new_types = node_types.copy()
    new_params = params.copy()
    # clear old subtree
    for i in subtree_slots(node_types, v):
        new_types[i] = EMPTY
        new_params[i] = 0.0
    sample_structure(rng, config, max_nodes=node_types.shape[0], root=v, out=new_types)
    sample_params_for_subtree(
        rng, new_types, config, subtree_slots(new_types, v), new_params
    )
    log_hastings = float(np.log(count_nodes(node_types)) - np.log(count_nodes(new_types)))
    return new_types, new_params, log_hastings


def propose_leaf_swap(
    rng: np.random.Generator, node_types: np.ndarray, params: np.ndarray,
    config: GPConfig,
):
    """Leaf-type swap: resample one leaf's kernel type + params from the prior.

    Second involutive move alongside subtree regeneration (the engine's
    ``mcmc_structure!`` mixes several move types; regenerate-only samplers
    mix slowly on deep trees).  The proposal picks a leaf uniformly,
    redraws its type from ``node_dist_leaf`` and its params from their
    priors; because type and params are proposed exactly from their prior
    conditionals and the reverse move is symmetric, every prior/proposal
    term cancels and the Hastings correction is 0 (acceptance = LML ratio).
    """
    leaves = np.flatnonzero(np.isin(node_types, LEAF_TYPES))
    v = int(rng.choice(leaves))
    new_types = node_types.copy()
    new_params = params.copy()
    new_types[v] = _sample_leaf(rng, config)
    new_params[v] = 0.0
    sample_params_for_subtree(rng, new_types, config, [v], new_params)
    return new_types, new_params, 0.0


def structure_to_str(node_types: np.ndarray, root: int = 0) -> str:
    """Human-readable rendering of a tree, e.g. ``(Linear + (Periodic × GammaExp))``."""
    t = int(node_types[root])
    if t == EMPTY:
        return "∅"
    if t in LEAF_TYPES:
        return _NAMES[t]
    left = structure_to_str(node_types, 2 * root + 1)
    right = structure_to_str(node_types, 2 * root + 2)
    if t == CP:
        return f"CP({left}; {right})"
    return f"({left} {_NAMES[t]} {right})"
