"""Parity of the analytic-VJP inverse LML core (`set_chol_impl("inv")`).

The "inv" implementation is the TPU default (`_CHOL_IMPL = "auto"` resolves
to it on TPU): its forward materializes A^{-1} so the backward is the
closed-form dA = c·0.5(αα^T − A^{-1}) with no autodiff through the
factorization (tools/microbench_inv.py: composed LML value_and_grad
23.5 → 18.1 ms at P=200, n=192 on the v5e).  These tests pin value parity,
gradient parity against the autodiffed cho_solve path, and the −1e10
non-SPD rejection guard, on CPU where "inv" is otherwise never exercised.
"""

import numpy as np

import jax
import jax.numpy as jnp

from nowcastautogp_tpu.ops import lml as lml_mod


def _problem(P=4, n=64, act=50, seed=5):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((P, n, n)).astype(np.float32)
    K = jnp.asarray(M @ M.transpose(0, 2, 1) / n)
    y = jnp.asarray(rng.standard_normal((P, n)).astype(np.float32))
    mask = jnp.broadcast_to((jnp.arange(n) < act).astype(jnp.float32), (P, n))
    ln = jnp.asarray(rng.normal(-2, 0.2, P).astype(np.float32))
    return K, ln, y, mask


def _with_impl(name, f, *args):
    prior = lml_mod._CHOL_IMPL
    try:
        lml_mod.set_chol_impl(name)
        return f(*args)
    finally:
        lml_mod.set_chol_impl(prior)


class TestInvCoreParity:
    def test_value_matches_xla(self):
        K, ln, y, mask = _problem()
        v_xla = _with_impl("xla", lml_mod._lml_from_K, K, ln, y, mask, 1e-5)
        v_inv = _with_impl("inv", lml_mod._lml_from_K, K, ln, y, mask, 1e-5)
        np.testing.assert_allclose(np.asarray(v_xla), np.asarray(v_inv),
                                   rtol=1e-4, atol=1e-3)

    def test_grads_match_xla(self):
        K, ln, y, mask = _problem(seed=9)

        def total(impl):
            def f(K_, ln_, y_):
                return jnp.sum(_with_impl(
                    impl, lml_mod._lml_from_K, K_, ln_, y_, mask, 1e-5))
            return jax.grad(f, argnums=(0, 1, 2))(K, ln, y)

        gK1, gl1, gy1 = total("xla")
        gK2, gl2, gy2 = total("inv")
        sym = lambda g: np.asarray(g + jnp.swapaxes(g, -1, -2))  # noqa: E731
        np.testing.assert_allclose(sym(gK1), sym(gK2), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gl1), np.asarray(gl2),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gy1), np.asarray(gy2),
                                   rtol=2e-4, atol=2e-4)

    def test_non_spd_hits_sentinel_guard(self):
        K, ln, y, mask = _problem(seed=11)
        K = K.at[2].set(-jnp.eye(K.shape[-1]) * 4.0)
        v = _with_impl("inv", lml_mod._lml_from_K, K, ln, y, mask, 1e-5)
        v = np.asarray(v)
        assert v[2] <= -1e9
        finite = np.delete(v, 2)
        assert np.all(finite > -1e9) and np.all(np.isfinite(finite))

    def test_auto_resolves_by_platform(self):
        prior = lml_mod._CHOL_IMPL
        try:
            lml_mod.set_chol_impl("auto")
            want = "inv" if jax.default_backend() == "tpu" else "xla"
            assert lml_mod._resolve_chol_impl() == want
        finally:
            lml_mod.set_chol_impl(prior)
