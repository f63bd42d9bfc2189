"""Particle resampling (systematic / multinomial / residual) and ESS.

Fills the role of the engine's ensemble resampling
(``AutoGP.maybe_resample!``, reference call site
``/root/reference/src/forecasting.jl:138-141``; resampling inside
``fit_smc!``).  Index selection is O(P) host work on a P-vector of weights;
the actual state shuffle is a device-side gather along the particle axis so
particle state never round-trips through the host.
"""

from __future__ import annotations

import jax
import numpy as np

__all__ = ["ess", "resample_indices", "gather_particles"]


def ess(log_weights: np.ndarray) -> float:
    """Effective sample size of (unnormalized) log importance weights."""
    lw = np.asarray(log_weights, dtype=np.float64)
    lw = lw - lw.max()
    w = np.exp(lw)
    w /= w.sum()
    return float(1.0 / np.sum(w * w))


def resample_indices(
    rng: np.random.Generator, log_weights: np.ndarray, method: str = "systematic"
) -> np.ndarray:
    """Draw ancestor indices from normalized weights."""
    lw = np.asarray(log_weights, dtype=np.float64)
    lw = lw - lw.max()
    w = np.exp(lw)
    w /= w.sum()
    P = w.shape[0]
    if method == "multinomial":
        return rng.choice(P, size=P, p=w).astype(np.int32)
    if method == "residual":
        counts = np.floor(P * w).astype(np.int64)
        idx = np.repeat(np.arange(P), counts)
        n_rest = P - idx.shape[0]
        if n_rest > 0:
            resid = P * w - counts
            resid /= resid.sum()
            idx = np.concatenate([idx, rng.choice(P, size=n_rest, p=resid)])
        return idx.astype(np.int32)
    # systematic (default): stratified positions with a single uniform offset
    positions = (rng.uniform() + np.arange(P)) / P
    return np.searchsorted(np.cumsum(w), positions).clip(0, P - 1).astype(np.int32)


@jax.jit
def gather_particles(state_arrays, indices):
    """Gather every per-particle array in a pytree along axis 0."""
    return jax.tree_util.tree_map(lambda a: a[indices], state_arrays)
