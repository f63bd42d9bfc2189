"""Parity tests for the batched fused covariance mega-kernel.

Runs through the Pallas interpreter on the CPU mesh; the TPU-compiled path
shares the same kernel code (tested for wins on real hardware via
tools/microbench_lml.py, results in PLAN.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import nowcastautogp_tpu as ngp
from nowcastautogp_tpu.models.config import GPConfig
from nowcastautogp_tpu.models.structures import (
    CONST, CP, EMPTY, GE, LINEAR, PERIODIC, PLUS, SE, TIMES, sample_particle,
)
from nowcastautogp_tpu.ops import lml as lml_mod
from nowcastautogp_tpu.ops import pallas_megacov as mega
from nowcastautogp_tpu.ops.kernels import eval_cov_impl


@pytest.fixture(autouse=True)
def _interpret_mode():
    mega.set_interpret_mode(True)
    yield
    mega.set_interpret_mode(False)


def _handcrafted_particles(n_nodes=15):
    """Trees covering every node type, incl. deliberately heterogeneous mix."""
    rng = np.random.default_rng(3)
    trees = []
    # CP(TIMES(SE, PER), PLUS(LIN, GE)) — all combinators + 4 leaf types
    t = np.zeros(n_nodes, np.int32)
    t[0], t[1], t[2] = CP, TIMES, PLUS
    t[3], t[4], t[5], t[6] = SE, PERIODIC, LINEAR, GE
    trees.append(t)
    # single CONST root
    t = np.zeros(n_nodes, np.int32)
    t[0] = CONST
    trees.append(t)
    # PLUS(GE, CP(SE, CONST))
    t = np.zeros(n_nodes, np.int32)
    t[0], t[1], t[2] = PLUS, GE, CP
    t[5], t[6] = SE, CONST
    trees.append(t)
    # deep chain: TIMES(PLUS(TIMES(SE, PER), LIN), GE)
    t = np.zeros(n_nodes, np.int32)
    t[0], t[1], t[2] = TIMES, PLUS, GE
    t[3], t[4] = TIMES, LINEAR
    t[7], t[8] = SE, PERIODIC
    trees.append(t)
    types = np.stack(trees)
    params = rng.normal(0.0, 0.7, size=(len(trees), n_nodes, 3)).astype(
        np.float32)
    return jnp.asarray(types), jnp.asarray(params)


def _random_particles(P=7, depth=5, seed=0):
    cfg = GPConfig(max_depth=depth)
    rng = np.random.default_rng(seed)
    ts, ps = [], []
    for _ in range(P):
        t, p, _ = sample_particle(rng, cfg)
        ts.append(t), ps.append(p)
    return (jnp.asarray(np.stack(ts).astype(np.int32)),
            jnp.asarray(np.stack(ps).astype(np.float32)))


def _x_rows(P, n, seed=1, per_row=True):
    rng = np.random.default_rng(seed)
    base = np.linspace(0, 1, n)
    if per_row:
        rows = np.stack([
            base + 0.01 * rng.standard_normal(n) * (i % 2) for i in range(P)
        ])
    else:
        rows = np.broadcast_to(base, (P, n)).copy()
    return jnp.asarray(rows.astype(np.float32))


def _ref_cov(types, params, x):
    return jax.vmap(eval_cov_impl, in_axes=(0, 0, 0, 0))(
        types, params, x, x)


class TestForwardParity:
    def test_handcrafted_all_types(self):
        types, params = _handcrafted_particles()
        x = _x_rows(types.shape[0], 64)
        K = mega.cov_batched_fused(types, params, x)
        K_ref = _ref_cov(types, params, x)
        np.testing.assert_allclose(np.asarray(K), np.asarray(K_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_random_depth5_with_padding(self):
        # P=7 pads to the chunk size; shared x rows
        types, params = _random_particles(P=7, depth=5)
        x = _x_rows(7, 64, per_row=False)
        K = mega.cov_batched_fused(types, params, x)
        K_ref = _ref_cov(types, params, x)
        np.testing.assert_allclose(np.asarray(K), np.asarray(K_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_lane_padding_n96(self):
        # n=96 pads to 128 lanes internally; values and grads must match
        types, params = _handcrafted_particles()
        x = _x_rows(types.shape[0], 96)
        K = mega.cov_batched_fused(types, params, x)
        K_ref = _ref_cov(types, params, x)
        np.testing.assert_allclose(np.asarray(K), np.asarray(K_ref),
                                   rtol=1e-5, atol=1e-5)
        rng = np.random.default_rng(17)
        W = jnp.asarray(rng.standard_normal((4, 96, 96)).astype(np.float32))
        g1 = jax.grad(lambda p: jnp.sum(
            W * mega.cov_batched_fused(types, p, x)))(params)
        g2 = jax.grad(lambda p: jnp.sum(W * _ref_cov(types, p, x)))(params)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=2e-4, atol=2e-4)

    def test_symmetric_panels_n160(self):
        # n=160 -> n_pad=256 and TWO compute regions: (rows 0:, cols 0:128)
        # + (rows 128:, cols 128:256).  The untiled kernel evaluates only
        # the lower column panels; the full K comes from XLA reassembly and
        # the VJP folds the cotangent (tril(W + W^T, -1) + diag W) onto the
        # computed regions.  This is the fit's dominant cap-160 regime.
        types, params = _handcrafted_particles()
        x = _x_rows(types.shape[0], 160)
        assert len(mega._make_regions(160, 256)) == 2
        K = mega.cov_batched_fused(types, params, x)
        K_ref = _ref_cov(types, params, x)
        np.testing.assert_allclose(np.asarray(K), np.asarray(K_ref),
                                   rtol=1e-5, atol=1e-5)
        rng = np.random.default_rng(29)
        W = jnp.asarray(rng.standard_normal(
            (types.shape[0], 160, 160)).astype(np.float32))
        g1 = jax.grad(lambda p: jnp.sum(
            W * mega.cov_batched_fused(types, p, x)))(params)
        g2 = jax.grad(lambda p: jnp.sum(W * _ref_cov(types, p, x)))(params)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=2e-4, atol=2e-4)

    def test_unsupported_shapes_flagged(self):
        assert not mega.megacov_supported(64, 100)  # n % 8 != 0
        assert not mega.megacov_supported(64, 1024)  # heap beyond 63 nodes
        assert not mega.megacov_supported(31, 4096)  # beyond HBM plan
        assert mega.megacov_supported(31, 192)
        assert mega.megacov_supported(31, 1024)  # tiled-plane path

    def test_chunk_policy_respects_vmem(self):
        # Regression: the measured C=2 preference (untiled n >= 96) must
        # still clear the scoped-VMEM budget.  At n=416 the backward's two
        # (31, 2, 416, 512) scratch buffers are 105.7 MB > the 100 MB
        # limit — observed as a compile-time VMEM stack OOM on a real
        # n=600 daily-cadence fit (cap-416 schedule segment).
        import math as _math

        budget = mega._VMEM_LIMIT - 24 * 1024 * 1024
        for n in range(8, mega.MAX_MEGA_N + 1, 8):
            for n_nodes in (31, 63):
                for n_scratch in (1, 2):
                    c = mega._chunk_for(n, n_nodes, n_scratch)
                    if mega._tiled(n):
                        tr = tc = mega._TILE
                    else:
                        n_pad = int(_math.ceil(n / 128)) * 128
                        tr, tc, _ = mega._dest_layout(
                            n, mega._make_regions(n, n_pad))
                    assert (c == 1
                            or n_scratch * c * n_nodes * tr * tc * 4
                            <= budget), (n, n_nodes, n_scratch, c)
        # compacted scratches (region stack x 128 lanes) admit C=2 at the
        # n=416 size whose OLD rectangular footprint OOMed
        assert mega._chunk_for(416, 31, 2) == 2
        assert mega._chunk_for(160, 31, 2) == 2

    def test_dest_layout_compacts_panels(self):
        # n=160: regions (160x128) + (32x128) stack into (192, 128)
        rows, width, dests = mega._dest_layout(
            160, mega._make_regions(160, 256))
        assert (rows, width) == (192, 128)
        assert dests[0] == (slice(0, 160), slice(0, 128))
        assert dests[1] == (slice(160, 192), slice(0, 128))
        # single-region (n <= 128): dest == plane
        rows, width, dests = mega._dest_layout(
            96, mega._make_regions(96, 128))
        assert (rows, width) == (96, 128)
        assert dests == [(slice(0, 96), slice(0, 128))]


class TestTiledPlane:
    """n past the single-step VMEM plan: the (_TILE, _TILE) tiled path with
    the revisited accumulating dparams output."""

    def test_forward_parity_n520(self):
        # n=520 -> n_pad=768 = 3x3 tiles of 256, with row/col padding live
        types, params = _handcrafted_particles()
        x = _x_rows(types.shape[0], 520)
        assert mega._tiled(520)
        K = mega.cov_batched_fused(types, params, x)
        assert K.shape == (types.shape[0], 520, 520)
        K_ref = _ref_cov(types, params, x)
        np.testing.assert_allclose(np.asarray(K), np.asarray(K_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_grad_parity_n520(self):
        types, params = _handcrafted_particles()
        x = _x_rows(types.shape[0], 520)
        rng = np.random.default_rng(23)
        W = jnp.asarray(rng.standard_normal(
            (types.shape[0], 520, 520)).astype(np.float32))
        g1 = jax.grad(lambda p: jnp.sum(
            W * mega.cov_batched_fused(types, p, x)))(params)
        g2 = jax.grad(lambda p: jnp.sum(W * _ref_cov(types, p, x)))(params)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=2e-3, atol=2e-3)


class TestGradParity:
    def _grad_pair(self, types, params, x, seed=5):
        rng = np.random.default_rng(seed)
        W = jnp.asarray(rng.standard_normal(
            (types.shape[0], x.shape[1], x.shape[1])).astype(np.float32))

        def loss_mega(p):
            return jnp.sum(W * mega.cov_batched_fused(types, p, x))

        def loss_ref(p):
            return jnp.sum(W * _ref_cov(types, p, x))

        return jax.grad(loss_mega)(params), jax.grad(loss_ref)(params)

    def test_handcrafted_grads(self):
        types, params = _handcrafted_particles()
        x = _x_rows(types.shape[0], 64)
        g1, g2 = self._grad_pair(types, params, x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=2e-4, atol=2e-4)

    def test_random_grads(self):
        types, params = _random_particles(P=5, depth=4, seed=7)
        x = _x_rows(5, 64, per_row=False)
        g1, g2 = self._grad_pair(types, params, x, seed=8)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=2e-4, atol=2e-4)


class TestLmlBackendParity:
    def test_lml_and_grads_match_jnp(self):
        types, params = _random_particles(P=6, depth=4, seed=9)
        P, n = 6, 64
        x = _x_rows(P, n, per_row=False)
        rngv = np.random.default_rng(11)
        y = jnp.asarray(np.sin(6 * np.asarray(x)) +
                        0.1 * rngv.standard_normal((P, n)).astype(np.float32),
                        jnp.float32)
        mask = jnp.broadcast_to(
            (jnp.arange(n) < 50).astype(jnp.float32), (P, n))
        log_noise = jnp.asarray(rngv.normal(-2, 0.3, P).astype(np.float32))

        prior = lml_mod._LML_BACKEND
        try:
            lml_mod.set_lml_backend("mega")

            def f_mega(p, ln):
                return jnp.sum(lml_mod.gp_lml_batched(
                    types, p, ln, x, y, mask))

            v_mega = f_mega(params, log_noise)
            g_mega = jax.grad(f_mega, argnums=(0, 1))(params, log_noise)
            lml_mod.set_lml_backend("jnp")

            def f_jnp(p, ln):
                return jnp.sum(lml_mod.gp_lml_batched(
                    types, p, ln, x, y, mask))

            v_jnp = f_jnp(params, log_noise)
            g_jnp = jax.grad(f_jnp, argnums=(0, 1))(params, log_noise)
        finally:
            lml_mod.set_lml_backend(prior)

        np.testing.assert_allclose(float(v_mega), float(v_jnp), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g_mega[0]),
                                   np.asarray(g_jnp[0]),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(g_mega[1]),
                                   np.asarray(g_jnp[1]),
                                   rtol=2e-3, atol=2e-3)
