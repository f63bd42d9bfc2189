"""Parity tests for the fused MXU Cholesky + triangular inverse
(ops/chol_mxu.py) — interpret mode on the CPU mesh, same code path as TPU.

Mirrors the reference's engine-internal Cholesky contract (SURVEY.md §2.3):
the LML core must agree with the XLA implementation on values, gradients,
and the -1e10 non-PSD rejection guard.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nowcastautogp_tpu.ops import lml as lml_mod
from nowcastautogp_tpu.ops.chol_mxu import mxu_supported, tri_inv_fused


def _spd(P, n, seed=0, scale=2.0):
    rng = np.random.default_rng(seed)
    B = rng.standard_normal((P, n, n)).astype(np.float32)
    return B @ B.transpose(0, 2, 1) / n + scale * np.eye(n, dtype=np.float32)


class TestTriInvFused:
    @pytest.mark.parametrize("P,n", [(3, 32), (5, 64), (2, 96), (7, 160)])
    def test_matches_dense_inverse_of_cholesky(self, P, n):
        A = _spd(P, n, seed=P + n)
        X = np.asarray(tri_inv_fused(jnp.asarray(A)))
        L = np.linalg.cholesky(A)
        Xref = np.stack([np.linalg.inv(L[i]) for i in range(P)])
        err = np.max(np.abs(X - Xref)) / np.max(np.abs(Xref))
        assert err < 2e-4, err

    def test_particle_padding(self):
        # P not a multiple of the chunk: padded rows must not leak
        A = _spd(9, 32, seed=3)
        X = np.asarray(tri_inv_fused(jnp.asarray(A)))
        assert X.shape == (9, 32, 32)
        L = np.linalg.cholesky(A)
        Xref = np.stack([np.linalg.inv(L[i]) for i in range(9)])
        np.testing.assert_allclose(X, Xref, rtol=2e-3, atol=2e-4)

    def test_masked_identity_rows(self):
        # the ops/lml.py contract: padded data rows are identity rows
        n, act = 64, 40
        A = _spd(2, n, seed=5)
        mask = np.zeros(n, np.float32)
        mask[:act] = 1.0
        Am = A * mask[None, :, None] * mask[None, None, :]
        Am += np.diag(1.0 - mask)[None]
        X = np.asarray(tri_inv_fused(jnp.asarray(Am)))
        # identity block on the masked tail, exact inverse on the active part
        np.testing.assert_allclose(
            X[:, act:, act:], np.broadcast_to(np.eye(n - act),
                                              (2, n - act, n - act)),
            atol=1e-6)
        L = np.linalg.cholesky(Am[0])
        np.testing.assert_allclose(
            X[0], np.linalg.inv(L), rtol=2e-3, atol=2e-4)

    def test_unsupported_n_raises(self):
        with pytest.raises(ValueError, match="tri_inv_fused"):
            tri_inv_fused(jnp.eye(40)[None])
        assert not mxu_supported(40)
        assert not mxu_supported(1056)
        assert mxu_supported(512)
        assert mxu_supported(1024)  # daily-cadence region (auto > 512)

    def test_daily_cadence_n640(self):
        A = _spd(2, 640, seed=11)
        X = np.asarray(tri_inv_fused(jnp.asarray(A)))
        L = np.linalg.cholesky(A[1])
        np.testing.assert_allclose(X[1], np.linalg.inv(L),
                                   rtol=4e-3, atol=4e-4)

    def test_non_psd_propagates_nan_within_lane(self):
        A = _spd(3, 32, seed=7)
        A[1] = -np.eye(32, dtype=np.float32)  # non-PSD lane
        X = np.asarray(tri_inv_fused(jnp.asarray(A)))
        assert np.all(np.isnan(X[1]))
        assert np.all(np.isfinite(X[0])) and np.all(np.isfinite(X[2]))


class TestLMLParityMXU:
    def _setup(self, cap=64, active=50, P=6):
        from nowcastautogp_tpu.models.config import GPConfig
        from nowcastautogp_tpu.models.structures import sample_particle

        cfg = GPConfig(max_depth=3)
        rng = np.random.default_rng(0)
        parts = [sample_particle(rng, cfg) for _ in range(P)]
        types = jnp.asarray(np.stack([p[0] for p in parts]).astype(np.int32))
        params = jnp.asarray(
            np.stack([p[1] for p in parts]).astype(np.float32))
        log_noise = jnp.asarray(np.full(P, -2.0, np.float32))
        x = jnp.broadcast_to(
            jnp.linspace(0, 1, cap), (P, cap)).astype(jnp.float32)
        y = jnp.sin(7 * x) + 0.1 * jnp.cos(19 * x)
        mask = jnp.broadcast_to(
            (jnp.arange(cap) < active).astype(jnp.float32), (P, cap))
        return types, params, log_noise, x, y, mask

    def test_value_and_grad_parity_vs_xla(self):
        args = self._setup()
        prev = lml_mod._CHOL_IMPL
        try:
            lml_mod.set_chol_impl("xla")
            f_ref = jax.value_and_grad(
                lambda p: jnp.sum(lml_mod.gp_lml_batched(
                    args[0], p, *args[2:])))
            v_ref, g_ref = f_ref(args[1])
            lml_mod.set_chol_impl("mxu")
            f_new = jax.value_and_grad(
                lambda p: jnp.sum(lml_mod.gp_lml_batched(
                    args[0], p, *args[2:])))
            v_new, g_new = f_new(args[1])
        finally:
            lml_mod.set_chol_impl(prev)
        np.testing.assert_allclose(
            float(v_new), float(v_ref), rtol=5e-5)
        np.testing.assert_allclose(
            np.asarray(g_new), np.asarray(g_ref), rtol=2e-2, atol=2e-3)

    def test_unsupported_cap_falls_back(self):
        # cap=40 is not a 32-multiple: the mxu impl must fall back, not raise
        args = self._setup(cap=40, active=30)
        prev = lml_mod._CHOL_IMPL
        try:
            lml_mod.set_chol_impl("mxu")
            out = lml_mod.gp_lml_batched(*args)
        finally:
            lml_mod.set_chol_impl(prev)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_broken_particle_sentinel(self):
        args = list(self._setup())
        # a pathological noise makes the covariance non-PSD in f32
        ln = np.full(args[1].shape[0], -2.0, np.float32)
        params = np.array(args[1], copy=True)
        params[2] = 1e8  # blow up one particle's amplitudes
        prev = lml_mod._CHOL_IMPL
        try:
            lml_mod.set_chol_impl("mxu")
            out = np.asarray(lml_mod.gp_lml_batched(
                args[0], jnp.asarray(params), jnp.asarray(ln), *args[3:]))
        finally:
            lml_mod.set_chol_impl(prev)
        # all lanes finite-or-sentinel; no NaN escapes
        assert np.all(np.isfinite(out))
        assert np.all(out >= -1e10 - 1)
