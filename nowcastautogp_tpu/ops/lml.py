"""Log marginal likelihood and GP predictive posterior, masked for static shapes.

The SMC schedule grows the conditioning set step by step
(``AutoGP.fit_smc!`` semantics, ``/root/reference/src/make_and_fit_model.jl:89-91``)
and ``add_data`` extends it again at nowcast time
(``/root/reference/src/forecasting.jl:135``).  To keep one XLA compilation
across all of that, every op here takes a fixed-capacity ``(n_cap,)`` data
buffer plus a {0,1} ``mask``; masked rows/columns of the covariance are
replaced by identity rows so the Cholesky factor carries exact zeros /
ones there and the log-determinant and quadratic form reduce to the active
subset.  All ops are vmapped over the particle axis (and, at nowcast time,
a flattened scenario×particle axis).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .kernels import cov_fn as eval_cov

__all__ = [
    "masked_kernel_matrix", "gp_lml", "gp_lml_batch", "gp_lml_batched",
    "set_lml_backend", "set_megalml", "gp_predict", "gp_predict_batch",
    "sampling_cholesky", "LOG_2PI",
    "DEFAULT_JITTER",
]

LOG_2PI = 1.8378770664093453
DEFAULT_JITTER = 1e-5


def masked_kernel_matrix(node_types, params, log_noise, x, mask, jitter):
    """K(x,x) + (noise+jitter)·I on active rows; identity on masked rows."""
    K = eval_cov(node_types, params, x, x)
    mm = mask[:, None] * mask[None, :]
    noise = jnp.exp(log_noise)
    diag = mask * (noise + jitter) + (1.0 - mask)
    return K * mm + jnp.diag(diag)


def gp_lml(node_types, params, log_noise, x, y, mask, jitter=DEFAULT_JITTER):
    """Masked log marginal likelihood of one particle.

    Returns -inf-ish (large negative) when the Cholesky fails, so SMC weights
    and MCMC accepts treat numerically broken proposals as rejected — the
    engine-level analog of the reference's singular-covariance guards
    (issue #51 family, ``src/make_and_fit_model.jl:17-27``).
    """
    A = masked_kernel_matrix(node_types, params, log_noise, x, mask, jitter)
    L = jnp.linalg.cholesky(A)
    ym = y * mask
    alpha = jax.scipy.linalg.cho_solve((L, True), ym)
    quad = jnp.dot(ym, alpha)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    n_active = jnp.sum(mask)
    lml = -0.5 * (quad + logdet + n_active * LOG_2PI)
    return jnp.where(jnp.isfinite(lml), lml, -1e10)


gp_lml_impl = gp_lml
gp_lml = jax.jit(gp_lml_impl)

# ---------------------------------------------------------------------------
# Batched LML with backend dispatch.  "pallas" routes the Cholesky/solve core
# through ops/pallas_chol.py (blocked VMEM-resident factorization with an
# analytic dK = 0.5(aa^T - K^{-1}) VJP); "jnp" is the vmapped XLA path.
# "auto" = pallas iff running on TPU.  Resolved at trace time.  NOTE: the
# pallas path is a single-device program — sharded (shard_map / row-sharded
# pjit) callers in parallel/ keep the vmapped jnp implementation.
# ---------------------------------------------------------------------------

# Backend selection:
#   "mega"   — fused batched Pallas covariance (ops/pallas_megacov.py, VMEM
#              heap walk + analytic VJP) feeding XLA's batched Cholesky.
#   "pallas" — XLA covariance + the blocked Pallas Cholesky core
#              (ops/pallas_chol.py); loses to XLA chol at bench shapes.
#   "jnp"    — vmapped XLA end to end.
#   "auto"   — "mega" on TPU when shapes qualify, else "jnp".
# Default "auto": the fused covariance measured 3.8 ms fwd / 8.4 ms
# fwd+bwd at P=200, cap=192, depth 5 on the v5e vs 18.9 / ~70 ms for the
# XLA interpreter path (tools/debug_mega.py; PLAN.md round-3 log).
# Env overrides (read once at import; benchmarking/ops knobs):
#   NGP_LML_BACKEND ∈ {auto, mega, pallas, jnp}
#   NGP_CHOL_IMPL   ∈ {auto, xla, inv, panel, static, mxu}
import os as _os


def _env_choice(var: str, default: str, allowed: tuple) -> str:
    val = _os.environ.get(var, default)
    if val not in allowed:
        raise ValueError(f"{var}={val!r}; expected one of {allowed}")
    return val


_LML_BACKEND = _env_choice(
    "NGP_LML_BACKEND", "auto", ("auto", "mega", "pallas", "jnp"))

# The fused LML value+grad kernel (ops/pallas_megalml.py): under the "mega"
# backend, gradient contexts run ONE Pallas program per evaluation (cov walk
# + MXU Cholesky + analytic dK + backward walk, all VMEM-resident) instead
# of the composed megacov-fwd / XLA-chol / megacov-bwd pipeline whose
# backward re-runs the whole forward walk.  "off" restores the composed
# path (A/B + debugging knob); value-only calls are unaffected either way.
_MEGALML = _env_choice("NGP_MEGALML", "auto", ("auto", "off"))


def set_megalml(name: str) -> None:
    """Enable ("auto") or disable ("off") the fused LML value+grad kernel."""
    global _MEGALML
    assert name in ("auto", "off"), name
    _MEGALML = name


def set_lml_backend(name: str) -> None:
    """Select the LML backend: "auto", "mega", "pallas", or "jnp".

    Call before the first fit — jitted callers resolve the backend when they
    trace, so flipping it later only affects new compilations.
    """
    global _LML_BACKEND
    assert name in ("auto", "mega", "pallas", "jnp"), name
    _LML_BACKEND = name


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _resolve_backend(n_nodes: int, n: int) -> str:
    from .pallas_megacov import megacov_supported

    if _LML_BACKEND == "mega":
        return "mega" if megacov_supported(n_nodes, n) else "jnp"
    if _LML_BACKEND == "auto":
        # Covers both the single-plane region (n_pad <= 512) and the
        # tiled-plane path, both measured on the v5e: tiled n=640 fwd
        # 22.4 ms / grad 31.8 ms, n=1024 grad 52.1 ms at P=200 depth 5
        # (chained-scan; tools/microbench_mega_tiled.py) — sublinear in
        # the n^2 plane growth, while the jnp interpreter's autodiff HLO
        # at those sizes exceeds this tunnel's remote-compile body limit
        # (HTTP 413) and extrapolates to >500 ms from its 53 ms at n=192.
        return ("mega" if _on_tpu() and megacov_supported(n_nodes, n)
                else "jnp")
    return _LML_BACKEND


# Cholesky/solve implementation for the batched _lml_from_K path:
#   "xla"    — jnp.linalg.cholesky + cho_solve (While-loop expander), XLA
#              autodiff through the factorization
#   "inv"    — cholesky + batched n-RHS triangular solve against I; the
#              backward is the analytic elementwise
#              dA = c·0.5(αα^T − A^{-1}) from cached residuals (custom VJP,
#              no autodiff through the factorization)
#   "panel"  — like "inv" but the factorization is ops/chol_panel.py's
#              layout-stable 32-wide panel recursion instead of the
#              While-loop expander (falls back to "inv" when n % 32 != 0)
#   "static" — ops/chol_static.py trace-time Schur recursion (straight-line
#              batched matmuls; see its module docstring for measurements)
#   "auto"   — "inv" on TPU, "xla" elsewhere
# Measurements IN CONTEXT (composed with the fused Pallas covariance in the
# real LML value_and_grad, fresh jits, v5e, P=200 n=192 depth 5 —
# tools/microbench_inv.py):
#   xla    fwd 14.6 ms  vgrad 23.5 ms   (shipped through round 3 mid)
#   inv    fwd 14.8 ms  vgrad 18.1 ms   <- default on TPU
#   static fwd 18.1 ms  vgrad 21.4 ms   (standalone 3.6/3.9 ms (!) but the
#          slice/concat recursion forces relayout copies around the Pallas
#          custom-call boundary — loses composed even with the analytic VJP)
# The "inv" forward is the same latency as "xla" (the batched cholesky
# dominates; the n-RHS trtri + L^{-T}L^{-1} matmul ride the MXU for ~free)
# and the backward drops from ~9 ms of cholesky/solve autodiff to an outer
# product.  NOTE ``set_chol_impl`` must be called before jitted callers
# first trace — module-level jit caches (``gp_lml_batch``, the fit
# programs) do not retrace on a later flip.
_CHOL_IMPLS = ("auto", "xla", "inv", "panel", "static", "mxu")
_CHOL_IMPL = _env_choice("NGP_CHOL_IMPL", "auto", _CHOL_IMPLS)


def set_chol_impl(name: str) -> None:
    global _CHOL_IMPL
    assert name in _CHOL_IMPLS, name
    _CHOL_IMPL = name


def _resolve_chol_impl() -> str:
    if _CHOL_IMPL == "auto":
        return "inv" if _on_tpu() else "xla"
    return _CHOL_IMPL


_PREC_HI = jax.lax.Precision.HIGHEST


def _ainv_logdet_xla(A):
    """A → (A^{-1}, logdet) via the XLA While-loop expander Cholesky."""
    L = jnp.linalg.cholesky(A)
    n = A.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    Linv = jax.lax.linalg.triangular_solve(L, eye, left_side=True, lower=True)
    Ainv = jnp.einsum("pki,pkj->pij", Linv, Linv, precision=_PREC_HI)
    logdet = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    return Ainv, logdet


def _ainv_logdet_panel(A):
    """A → (A^{-1}, logdet) via the layout-stable panel forms: panel
    Cholesky + blocked panel triangular inverse — zero While-loop
    expansions anywhere in the forward."""
    from .chol_panel import cholesky_panel, tri_inv_panel

    L = cholesky_panel(A)
    Linv = tri_inv_panel(L)
    Ainv = jnp.einsum("pki,pkj->pij", Linv, Linv, precision=_PREC_HI)
    logdet = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    return Ainv, logdet


def _ainv_logdet_mxu(A):
    """A → (A^{-1}, logdet) via the fused Pallas blocked Cholesky +
    triangular inverse (``ops/chol_mxu.py``): no While-loop expansion
    anywhere — the only sequential latency is the in-kernel 32-step
    diagonal-block fori loops; all panel updates ride the MXU."""
    from .chol_mxu import tri_inv_fused

    X = tri_inv_fused(A)
    Ainv = jnp.einsum("pki,pkj->pij", X, X, precision=_PREC_HI)
    # diag(L^{-1}) = 1/diag(L) for triangular L, so logdet A = -2 Σ log diag X
    logdet = -2.0 * jnp.sum(
        jnp.log(jnp.diagonal(X, axis1=-2, axis2=-1)), axis=-1)
    return Ainv, logdet


def _make_inv_core(ainv_logdet):
    """-0.5(ym^T A^{-1} ym + logdet A) with analytic elementwise backward.

    Forward materializes A^{-1} through ``ainv_logdet``; the residuals
    (A^{-1}, α) make the backward dA = c·0.5(αα^T − A^{-1}), dym = −c·α —
    no autodiff through the latency-bound cholesky/solve expansions.
    Non-SPD inputs produce NaN exactly like the cho_solve path and are
    caught by the caller's isfinite → −1e10 guard.
    """

    @jax.custom_vjp
    def core(A, ym):
        out, _ = fwd(A, ym)
        return out

    def fwd(A, ym):
        Ainv, logdet = ainv_logdet(A)
        alpha = jnp.einsum("pij,pj->pi", Ainv, ym, precision=_PREC_HI)
        quad = jnp.einsum("pn,pn->p", ym, alpha)
        return -0.5 * (quad + logdet), (Ainv, alpha)

    def bwd(res, c):
        Ainv, alpha = res
        dA = (0.5 * c[:, None, None]) * (
            jnp.einsum("pi,pj->pij", alpha, alpha) - Ainv)
        dym = -c[:, None] * alpha
        return dA, dym

    core.defvjp(fwd, bwd)
    return core


_lml_core_inv = _make_inv_core(_ainv_logdet_xla)
_lml_core_panel = _make_inv_core(_ainv_logdet_panel)
_lml_core_mxu = _make_inv_core(_ainv_logdet_mxu)


def lml_core_from_A(A, ym):
    """Batched ``-0.5 (ym^T A^{-1} ym + logdet A)`` honoring the
    Cholesky-impl knob (``set_chol_impl`` / ``NGP_CHOL_IMPL``).

    Used by ``_lml_from_K``, i.e. every composed-path LML (the "jnp"
    fallbacks, unsupported shapes, and everything when ``NGP_MEGALML=off``).
    When the fused value+grad kernel is active, its value-only primal runs
    the kernel's own MXU factorization instead — the knob governs the
    composed paths only (flip ``NGP_MEGALML=off`` to A/B cores everywhere).
    """
    n = A.shape[-1]
    impl = _resolve_chol_impl()
    if impl == "panel" and n % 32 != 0:
        impl = "inv"
    if impl == "mxu":
        from .chol_mxu import mxu_supported

        if not mxu_supported(n):
            impl = "inv"
    if impl == "inv" and _CHOL_IMPL == "auto" and n > 512:
        # daily-cadence region: the XLA expander's column-loop latency
        # scales with n while the blocked MXU kernel's panels stay MXU
        # dots.  Measured composed with the tiled fused covariance at
        # (200, 640) on the v5e: LML fwd 67.4 -> 55.2 ms, vgrad
        # 100.1 -> 88.0 ms (tools/microbench_megalml.py --caps 640).
        from .chol_mxu import mxu_supported

        if mxu_supported(n):
            impl = "mxu"
    if impl in ("inv", "panel", "mxu"):
        core_fn = {"panel": _lml_core_panel, "inv": _lml_core_inv,
                   "mxu": _lml_core_mxu}[impl]
        return core_fn(A, ym)
    if impl == "static" and n % 8 == 0:
        from .chol_static import cho_solve_static, cholesky_static

        L = cholesky_static(A)
        alpha = cho_solve_static(L, ym)
    else:
        L = jnp.linalg.cholesky(A)
        alpha = jax.scipy.linalg.cho_solve((L, True), ym[..., None])[..., 0]
    quad = jnp.einsum("pn,pn->p", ym, alpha)
    logdet = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    return -0.5 * (quad + logdet)


def _lml_from_K(K, log_noise, y, mask, jitter):
    """Batched masked LML given raw covariance K (P, n, n)."""
    mm = mask[:, :, None] * mask[:, None, :]
    noise = jnp.exp(log_noise)
    diag = mask * (noise[:, None] + jitter) + (1.0 - mask)
    n = K.shape[-1]
    A = K * mm + diag[:, :, None] * jnp.eye(n, dtype=K.dtype)
    ym = y * mask
    n_active = jnp.sum(mask, axis=-1)
    lml = lml_core_from_A(A, ym) - 0.5 * n_active * LOG_2PI
    return jnp.where(jnp.isfinite(lml), lml, -1e10)


def _lml_mega_fused(node_types, params, log_noise, x, y, mask, jitter):
    """Masked LML through the fused LML kernel's custom VJP.

    The diag augmentation and ``y * mask`` are built here in XLA so their
    chain rules (``d diag / d log_noise = mask * noise``, ``d ym / d y =
    mask``) compose with the kernel's ``gdiag``/``-alpha`` residuals —
    ``log_noise`` gradients need no kernel-side special casing.
    ``lml_core_fused``'s primal is the fused VALUE-ONLY kernel (same
    ``_fwd_steps`` instruction sequence as the value+grad variant, so
    value and grad paths agree bit-exactly); under ``jax.grad`` the
    forward rule runs the single fused value+gradient kernel.
    """
    from .pallas_megalml import lml_core_fused

    noise = jnp.exp(log_noise)
    diagv = mask * (noise[:, None] + jitter) + (1.0 - mask)
    ym = y * mask
    core = lml_core_fused(node_types, params, diagv, mask, x, ym)
    n_active = jnp.sum(mask, axis=-1)
    lml = core - 0.5 * n_active * LOG_2PI
    return jnp.where(jnp.isfinite(lml), lml, -1e10)


def gp_lml_batched(node_types, params, log_noise, x, y, mask,
                   jitter=DEFAULT_JITTER, backend=None):
    """Natively batched masked LML: every argument carries the particle axis.

    Identical semantics to ``vmap(gp_lml_impl)`` including the ``-1e10``
    non-finite rejection guard.  ``backend`` (trace-time static) overrides
    the module-global selection — sharded multi-chip callers pass ``"jnp"``
    so a Pallas custom call never lands inside an SPMD-partitioned program.

    CONSISTENCY CONTRACT: at a given (N, n, P) shape, every value-path and
    grad-path evaluation uses the same numerical core.  The fit chain
    compares LMLs across calls (MH accept logits, SMC reweight deltas,
    values carried out of HMC), so a shape-dependent fast path that served
    value-only callers a *different* Cholesky than the grad path (the
    round-4 ``for_grad`` experiment) would inject a per-backend offset
    into every comparison.  That is why the fused dispatch is gated on
    ``megalml_fits`` (the value+grad footprint) even for value-only
    callers: where the grad variant doesn't fit, BOTH sides fall back to
    the composed path together (``megalml_fits_val`` documents which
    shapes a value-only-only caller could safely use — none exist in the
    fit chain today).
    """
    if backend is None:
        backend = _resolve_backend(node_types.shape[-1], x.shape[-1])
    elif backend == "mega":
        from .pallas_megacov import megacov_supported

        if not megacov_supported(node_types.shape[-1], x.shape[-1]):
            backend = "jnp"
    if backend == "mega":
        from .pallas_megalml import megalml_fits

        N, P, n = node_types.shape[-1], node_types.shape[0], x.shape[-1]
        if _MEGALML != "off" and megalml_fits(N, n, P):
            return _lml_mega_fused(
                node_types, params, log_noise, x, y, mask, jitter)
        from .pallas_megacov import cov_batched_fused

        K = cov_batched_fused(node_types, params, x)
        return _lml_from_K(K, log_noise, y, mask, jitter)
    if backend == "pallas":
        from .pallas_chol import lml_core

        K = jax.vmap(masked_kernel_matrix, in_axes=(0, 0, 0, 0, 0, None))(
            node_types, params, log_noise, x, mask, jitter
        )
        ym = y * mask
        n_active = jnp.sum(mask, axis=-1)
        lml = lml_core(K, ym) - 0.5 * n_active * LOG_2PI
        return jnp.where(jnp.isfinite(lml), lml, -1e10)
    if _resolve_chol_impl() != "xla":
        # honor a non-default Cholesky core on the portable backend too
        # (the interpreter covariance feeds the same batched _lml_from_K
        # the fused path uses)
        K = jax.vmap(eval_cov, in_axes=(0, 0, 0, 0))(node_types, params, x, x)
        return _lml_from_K(K, log_noise, y, mask, jitter)
    return jax.vmap(gp_lml_impl, in_axes=(0, 0, 0, 0, 0, 0, None))(
        node_types, params, log_noise, x, y, mask, jitter
    )


# jitted entry point for host callers (reweighting, nowcast batching)
gp_lml_batch = jax.jit(gp_lml_batched, static_argnames=("backend",))


# NOTE: round 4 replaced the former gp_lml_batch_sharded pjit pin — a
# >1-device mesh now routes through parallel.sharding.lml_rows_sharded
# (jax.shard_map: one single-device program per row shard, full fused
# dispatch legal inside); non-divisible panels fall back to
# gp_lml_batch(backend="jnp") on replicated rows.


def gp_predict(
    node_types, params, log_noise, x, y, mask, xs,
    jitter=DEFAULT_JITTER, include_noise=True,
):
    """Predictive posterior N(mu, cov) of one particle at test points ``xs``.

    Matches the observable semantics of ``AutoGP.predict_mvn``
    (``/root/reference/src/forecasting.jl:46``): the predictive is over
    *observations*, so the observation-noise variance is added to the
    covariance diagonal when ``include_noise``.
    """
    A = masked_kernel_matrix(node_types, params, log_noise, x, mask, jitter)
    L = jnp.linalg.cholesky(A)
    ym = y * mask
    alpha = jax.scipy.linalg.cho_solve((L, True), ym)
    Ks = eval_cov(node_types, params, x, xs) * mask[:, None]  # (n, m)
    Kss = eval_cov(node_types, params, xs, xs)  # (m, m)
    mu = Ks.T @ alpha
    V = jax.scipy.linalg.solve_triangular(L, Ks, lower=True)  # (n, m)
    cov = Kss - V.T @ V
    noise = jnp.exp(log_noise)
    extra = jnp.where(include_noise, noise, 0.0) + jitter
    cov = cov + extra * jnp.eye(xs.shape[0], dtype=cov.dtype)
    return mu, cov


gp_predict_impl = gp_predict
gp_predict_batch = jax.jit(
    jax.vmap(gp_predict_impl, in_axes=(0, 0, 0, 0, 0, 0, None, None, None))
)
# Row-varying test points: each row carries its OWN xs (the panel forecast's
# flattened series x particle rows, where every series has its own time
# normalization).  Pure-XLA body, so the row axis shards over a Mesh.
gp_predict_batch_rows = jax.jit(
    jax.vmap(gp_predict_impl, in_axes=(0, 0, 0, 0, 0, 0, 0, None, None))
)
gp_predict = jax.jit(gp_predict_impl)


def sampling_cholesky(cov):
    """Guaranteed-PSD sampling factor for (..., m, m) predictive covariances.

    Large-amplitude particles can make ``Kss - V^T V`` *indefinite* in f32
    (catastrophic cancellation: an amplitude of ~1e5 leaves ~1e-2 of noise
    on a predictive variance that is truly ~1e-3), and a plain
    ``cholesky(cov + 1e-8 I)`` then yields NaN draws for that mixture
    component.  The host mixture (``models/posterior.py``) falls back to an
    eigenvalue floor; this is the device-side equivalent — clamp negative
    eigenvalues and return ``A = V sqrt(w)`` (any square root samples the
    same Gaussian; no extra variance beyond the clamp).
    """
    c = 0.5 * (cov + jnp.swapaxes(cov, -1, -2))
    w, V = jnp.linalg.eigh(c)  # m is the small forecast horizon — cheap
    scale = jnp.maximum(1.0, jnp.max(jnp.abs(w), axis=-1, keepdims=True))
    w = jnp.maximum(w, 1e-8 * scale)
    # any square root works for sampling: A A^T = cov with A = V sqrt(w)
    return V * jnp.sqrt(w)[..., None, :]
