"""Parity tests for the fused LML value+grad kernel (ops/pallas_megalml.py).

Runs through the Pallas interpreter on the CPU mesh; the TPU-compiled path
shares the same kernel code (on-chip wins measured via
tools/microbench_megalml.py, results in PLAN.md).  References are the pure
vmapped-XLA LML (``backend="jnp"``), so value AND gradient semantics —
including the masked-identity contract, the noise/y chain rules, and the
-1e10 non-finite rejection guard — are pinned against an independent
implementation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nowcastautogp_tpu.models.config import GPConfig
from nowcastautogp_tpu.models.structures import sample_particle
from nowcastautogp_tpu.ops import lml as lml_mod
from nowcastautogp_tpu.ops import pallas_megacov as mega
from nowcastautogp_tpu.ops import pallas_megalml as ml
from nowcastautogp_tpu.ops.lml import gp_lml_batched


@pytest.fixture(autouse=True)
def _interpret_mode():
    mega.set_interpret_mode(True)
    yield
    mega.set_interpret_mode(False)


def _population(P, n, depth=4, seed=0, n_active=None):
    cfg = GPConfig(max_depth=depth)
    rng = np.random.default_rng(seed)
    ts, ps = [], []
    for _ in range(P):
        t, p, _ = sample_particle(rng, cfg)
        ts.append(t), ps.append(p)
    types = jnp.asarray(np.stack(ts).astype(np.int32))
    params = jnp.asarray(np.stack(ps).astype(np.float32))
    log_noise = jnp.asarray(
        rng.normal(-2.0, 0.3, size=P).astype(np.float32))
    x = jnp.asarray(
        np.broadcast_to(np.linspace(0, 1, n), (P, n)).astype(np.float32))
    y = jnp.asarray(
        rng.normal(0.0, 1.0, size=(P, n)).astype(np.float32))
    if n_active is None:
        n_active = n
    mask = jnp.asarray(
        (np.arange(n) < n_active).astype(np.float32)[None].repeat(P, 0))
    return types, params, log_noise, x, y, mask


def _lml(backend, *args):
    return gp_lml_batched(*args, backend=backend)


def _grads(backend, types, params, log_noise, x, y, mask):
    def f(p, ln, y_):
        return jnp.sum(gp_lml_batched(
            types, p, ln, x, y_, mask, backend=backend))

    return jax.grad(f, argnums=(0, 1, 2))(params, log_noise, y)


class TestValueParity:
    def test_full_mask_n64(self):
        args = _population(5, 64)
        got = _lml("mega", *args)
        ref = _lml("jnp", *args)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-3)

    def test_partial_mask(self):
        args = _population(6, 96, n_active=71, seed=3)
        got = _lml("mega", *args)
        ref = _lml("jnp", *args)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-3)

    def test_symmetric_regions_n160(self):
        # n > 128: multi-region panels + in-kernel mirror
        args = _population(3, 160, seed=5, n_active=150)
        got = _lml("mega", *args)
        ref = _lml("jnp", *args)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-3)

    def test_vmem_guard_deep_heap_large_n(self):
        # the shared (N+3)-plane walk pool brought 63 node slots x n=512
        # inside the C=1 scratch budget (was declined with separate
        # vals/dvals pools); n > 512 stays composed-path (tiled covariance)
        assert ml.megalml_supported(31, 512)
        assert ml.megalml_supported(63, 512)
        assert ml.megalml_supported(63, 416)
        assert not ml.megalml_supported(63, 544)

    def test_unsupported_n_falls_back(self):
        # n = 72 is not a 32 multiple: still correct via the composed path
        assert not ml.megalml_supported(31, 72)
        args = _population(4, 72, seed=7)
        got = _lml("mega", *args)
        ref = _lml("jnp", *args)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-3)


class TestGradParity:
    def _check(self, args, rtol=3e-3, atol=3e-3):
        gp_m, gn_m, gy_m = _grads("mega", *args)
        gp_j, gn_j, gy_j = _grads("jnp", *args)
        np.testing.assert_allclose(gp_m, gp_j, rtol=rtol, atol=atol)
        np.testing.assert_allclose(gn_m, gn_j, rtol=rtol, atol=atol)
        np.testing.assert_allclose(gy_m, gy_j, rtol=rtol, atol=atol)

    def test_grads_n64(self):
        self._check(_population(5, 64, seed=1))

    def test_grads_partial_mask(self):
        self._check(_population(6, 96, n_active=55, seed=2))

    def test_grads_symmetric_regions_n160(self):
        self._check(_population(3, 160, n_active=144, seed=4))

    def test_grads_unsorted_chunks_match(self):
        args = _population(7, 64, seed=8)
        try:
            mega.set_sort_chunks(False)
            gp_u, gn_u, gy_u = _grads("mega", *args)
        finally:
            mega.set_sort_chunks(True)
        gp_s, gn_s, gy_s = _grads("mega", *args)
        np.testing.assert_array_equal(gp_u, gp_s)
        np.testing.assert_array_equal(gn_u, gn_s)
        np.testing.assert_array_equal(gy_u, gy_s)


class TestPotentialParity:
    def test_hmc_potential_value_and_grad(self):
        """The exact object the fit differentiates: the batched potential."""
        from nowcastautogp_tpu.inference.hmc import make_batched_potential
        from nowcastautogp_tpu.models.structures_device import (
            config_arrays, device_prior_arrays,
        )

        types, params, log_noise, x, y, mask = _population(4, 64, seed=11)
        cfg = config_arrays(GPConfig(max_depth=4))
        mu, sg, act = jax.vmap(
            device_prior_arrays, in_axes=(0, None))(types, cfg)

        outs = {}
        for backend in ("mega", "jnp"):
            pot = make_batched_potential(
                types, mu, sg, act, x, y, mask, 1e-5, -2.0, 1.0, 1.0,
                lml_backend=backend)
            (gp, gn), (U, lml) = jax.grad(
                pot, argnums=(0, 1), has_aux=True)(params, log_noise)
            outs[backend] = (gp, gn, U, lml)
        for a, b in zip(outs["mega"], outs["jnp"]):
            np.testing.assert_allclose(a, b, rtol=3e-3, atol=3e-3)


def _break_lane(types, params, lane):
    """Make ``lane`` numerically broken deterministically: a lone CONST
    leaf with log-amplitude 100 overflows to inf in f32 (exp(100) = inf),
    so K = inf, the Cholesky yields NaN, and the -1e10 guard must fire."""
    from nowcastautogp_tpu.models.structures import CONST

    types = types.at[lane].set(0)
    types = types.at[lane, 0].set(CONST)
    params = params.at[lane].set(0.0)
    params = params.at[lane, 0, 0].set(100.0)
    return types, params


class TestBrokenParticle:
    def test_non_spd_gets_sentinel_and_isolated(self):
        """A lane whose A is non-finite must hit -1e10 without touching
        neighbors in the same chunk (batch dots never mix lanes)."""
        types, params, log_noise, x, y, mask = _population(4, 64, seed=13)
        types, params = _break_lane(types, params, 2)
        got = _lml("mega", *(types, params, log_noise, x, y, mask))
        ref = _lml("jnp", *(types, params, log_noise, x, y, mask))
        assert ref[2] <= -1e9, "construction must break the reference too"
        assert got[2] <= -1e9
        healthy = [0, 1, 3]
        np.testing.assert_allclose(
            got[jnp.asarray(healthy)], ref[jnp.asarray(healthy)],
            rtol=2e-4, atol=2e-3)

    def test_broken_lane_grad_is_zeroed_by_guard(self):
        types, params, log_noise, x, y, mask = _population(4, 64, seed=13)
        types, params = _break_lane(types, params, 2)
        ref = _lml("jnp", *(types, params, log_noise, x, y, mask))
        if ref[2] > -1e9:
            pytest.skip("construction did not break the particle")

        def f(p):
            out = gp_lml_batched(
                types, p, log_noise, x, y, mask, backend="mega")
            # only healthy lanes contribute, mirroring SMC/HMC use where
            # broken lanes are rejected; their grads must not poison others
            return out[0] + out[1] + out[3]

        g = jax.grad(f)(params)
        gp_j, _, _ = _grads("jnp", types, params, log_noise, x, y, mask)
        for i in (0, 1, 3):
            np.testing.assert_allclose(
                g[i], gp_j[i], rtol=3e-3, atol=3e-3)
            assert np.isfinite(np.asarray(g[i])).all()


class TestValueOnlyPath:
    def test_chol_impl_knob_reaches_composed_mega_value_path(self):
        """With the fused kernel off, set_chol_impl must select the core on
        the 'mega' backend's composed value path (review finding: it was
        hardcoded to inv); with it on, the fused value kernel must agree."""
        args = _population(4, 64, seed=21)
        ref = _lml("jnp", *args)
        try:
            lml_mod.set_chol_impl("mxu")
            lml_mod.set_megalml("off")
            got_composed = _lml("mega", *args)
            lml_mod.set_megalml("auto")
            got_fused = _lml("mega", *args)
        finally:
            lml_mod.set_chol_impl("auto")
            lml_mod.set_megalml("auto")
        np.testing.assert_allclose(got_composed, ref, rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(got_fused, ref, rtol=2e-4, atol=2e-3)

    def test_value_path_bit_identical_to_grad_path(self):
        """The primal runs the same kernel steps as the forward rule, so
        the value is bit-identical whether or not gradients are taken."""
        types, params, log_noise, x, y, mask = _population(5, 96, seed=23)

        def f(p):
            return gp_lml_batched(
                types, p, log_noise, x, y, mask, backend="mega")

        primal = f(params)
        fwd_val, _ = jax.vjp(f, params)
        np.testing.assert_array_equal(np.asarray(primal),
                                      np.asarray(fwd_val))

    def test_primal_matches_fused_forward(self):
        """The custom-VJP primal (value path) and the fused kernel's value
        must agree — value_and_grad's value is the fwd rule's output."""
        types, params, log_noise, x, y, mask = _population(5, 96, seed=17)

        def f(p):
            return gp_lml_batched(
                types, p, log_noise, x, y, mask, backend="mega")

        primal = f(params)
        fwd_val, _ = jax.vjp(f, params)
        np.testing.assert_allclose(primal, fwd_val, rtol=2e-4, atol=2e-3)


def test_lml_core_fused_val_matches_jnp():
    """The public value-only kernel (lml_core_fused_val, gated by
    megalml_fits_val) computes the same masked LML core as the pure-XLA
    reference.  The fit chain never dispatches on it (consistency
    contract, ops/lml.py) — this pins the standalone API."""
    from nowcastautogp_tpu.ops.lml import DEFAULT_JITTER, LOG_2PI

    types, params, log_noise, x, y, mask = _population(6, 64, n_active=48)
    noise = jnp.exp(log_noise)
    diagv = mask * (noise[:, None] + DEFAULT_JITTER) + (1.0 - mask)
    ym = y * mask
    core = ml.lml_core_fused_val(types, params, diagv, mask, x, ym)
    lml = core - 0.5 * jnp.sum(mask, axis=-1) * LOG_2PI
    ref = _lml("jnp", types, params, log_noise, x, y, mask)
    np.testing.assert_allclose(np.asarray(lml), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_value_path_matches_grad_path_value_per_particle():
    """The consistency contract's mechanism (ops/lml.py): under the fused
    backend, the value-only primal and the value+grad forward rule share
    ``_fwd_steps`` instruction for instruction, so an MH logit comparing a
    fresh value against an HMC-carried value sees no cross-path offset
    beyond reduction-order ulps.  Compared PER PARTICLE (a summed scalar
    legitimately differs by an ulp between fusion contexts)."""
    import jax

    types, params, log_noise, x, y, mask = _population(8, 96, n_active=80)

    def lml_vec(p_):
        return gp_lml_batched(types, p_, log_noise, x, y, mask,
                              backend="mega")

    v_value_path = np.asarray(jax.jit(lml_vec)(params))
    # jax.vjp runs the custom_vjp FORWARD rule (the value+grad kernel)
    # and returns its per-particle primal
    v_grad_path = np.asarray(
        jax.jit(lambda p: jax.vjp(lml_vec, p)[0])(params))
    np.testing.assert_allclose(v_value_path, v_grad_path, rtol=3e-7,
                               atol=3e-4)
