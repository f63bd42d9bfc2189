"""Posterior kernel decomposition: per-particle additive component split.

The interpretability companion of ``predict_mvn``: each particle's kernel
expression tree is split at its root-level ``+`` nodes into maximal
non-additive components (a ``CP`` or ``×`` subtree stays atomic), and each
component's posterior GP is computed under the FULL model's conditioning —
``mean_c = K_c(xs, x) A^{-1} y`` and
``cov_c = K_c(xs, xs) − K_c(xs, x) A^{-1} K_c(x, xs)`` with
``A = K(x, x) + noise·I`` — so the component means sum exactly to the full
(noise-free) predictive mean.  This mirrors the role of ``AutoGP.decompose``
in the engine the reference depends on (the reference wrapper itself does
not re-export it; structure interpretability is how its vignettes discuss
fitted models).

Host-loop implementation by design: decomposition is an offline
interpretability tool, and components vary in number and shape across
particles, so there is nothing to batch.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.kernels import cov_fn as eval_cov
from ..ops.lml import DEFAULT_JITTER, masked_kernel_matrix
from .gp_model import normalized_weights
from .structures import BINARY_TYPES, EMPTY, PLUS, structure_to_str

__all__ = ["decompose"]


def _component_roots(node_types: np.ndarray) -> list[int]:
    """Heap indices of the maximal non-PLUS subtrees (root-level addends)."""
    n = node_types.shape[0]
    roots, stack = [], [0]
    while stack:
        i = stack.pop()
        if i >= n or int(node_types[i]) == EMPTY:
            continue
        if int(node_types[i]) == PLUS:
            stack.extend((2 * i + 1, 2 * i + 2))
        else:
            roots.append(i)
    return sorted(roots)


def _extract_subtree(node_types: np.ndarray, params: np.ndarray, root: int):
    """Relocate the subtree at ``root`` to heap slot 0 (own fresh buffers).

    Moving a subtree toward the root only shrinks depths, so the extracted
    tree always fits the same heap capacity.
    """
    n = node_types.shape[0]
    t2 = np.zeros_like(node_types)
    p2 = np.zeros_like(params)
    stack = [(root, 0)]
    while stack:
        s, d = stack.pop()
        if s >= n or int(node_types[s]) == EMPTY:
            continue
        t2[d] = node_types[s]
        p2[d] = params[s]
        if int(node_types[s]) in BINARY_TYPES:
            stack.append((2 * s + 1, 2 * d + 1))
            stack.append((2 * s + 2, 2 * d + 2))
    return t2, p2


def decompose(model, ds) -> list[dict]:
    """Per-particle additive decomposition of the posterior at dates ``ds``.

    Returns one dict per particle::

        {"structure": str,          # the particle's full kernel expression
         "weight": float,           # normalized importance weight
         "components": [            # one entry per root-level addend
             {"structure": str,
              "mean": (m,) float64, # on the transformed-data scale, CENTERED:
                                    # full noise-free predictive mean =
                                    # model y-mean + sum of component means
              "var":  (m,) float64} # marginal posterior variance (no
                                    # observation noise)
         ]}

    A numerically broken particle (non-PSD covariance, the state the LML
    sites map to the -1e10 sentinel) gets ``"components": []`` plus
    ``"broken": True`` instead of silent NaN means.

    Values are on the transformed-data scale like ``predict_mvn``; apply the
    model's inverse transformation downstream if original-scale components
    are wanted (note a nonlinear inverse does not preserve additivity).
    """
    xs = jnp.asarray(model._normalize_dates(ds), jnp.float32)
    x_b, y_b, m_b = model._batched_data()
    x = x_b[0]
    y = y_b[0]
    mask = m_b[0]
    types_all = np.asarray(model._host_types)
    params_all = np.asarray(model._params_d)
    log_noise = np.asarray(model._log_noise_d)

    w = normalized_weights(model)

    y_std = float(model._y_std)
    out = []
    for p in range(types_all.shape[0]):
        A = masked_kernel_matrix(
            jnp.asarray(types_all[p]), jnp.asarray(params_all[p]),
            jnp.asarray(log_noise[p]), x, mask, DEFAULT_JITTER,
        )
        L = jnp.linalg.cholesky(A)
        if not bool(jnp.all(jnp.isfinite(L))):
            # numerically broken particle (non-PSD covariance): the LML
            # sites map this state to the -1e10 sentinel; here we skip the
            # component split instead of emitting silent NaNs
            out.append({
                "structure": structure_to_str(types_all[p]),
                "weight": float(w[p]),
                "components": [],
                "broken": True,
            })
            continue
        ym = y * mask
        alpha = jax.scipy.linalg.cho_solve((L, True), ym)
        comps = []
        for r in _component_roots(types_all[p]):
            t2, p2 = _extract_subtree(types_all[p], params_all[p], r)
            Ks = eval_cov(jnp.asarray(t2), jnp.asarray(p2), x, xs)
            Ks = Ks * mask[:, None]
            Kss = eval_cov(jnp.asarray(t2), jnp.asarray(p2), xs, xs)
            mu_c = Ks.T @ alpha
            V = jax.scipy.linalg.solve_triangular(L, Ks, lower=True)
            var_c = jnp.clip(jnp.diag(Kss) - jnp.sum(V * V, axis=0), 0.0)
            comps.append({
                "structure": structure_to_str(t2),
                "mean": y_std * np.asarray(mu_c, dtype=np.float64),
                "var": (y_std ** 2) * np.asarray(var_c, dtype=np.float64),
            })
        out.append({
            "structure": structure_to_str(types_all[p]),
            "weight": float(w[p]),
            "components": comps,
        })
    return out
