"""Golden-value tests for the device covariance interpreter and masked LML.

Parity strategy per SURVEY.md §4: the TPU kernels are checked against a plain
NumPy oracle (hand-evaluated kernel formulas, dense Cholesky on the unpadded
active subset) rather than against the Julia reference bitwise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nowcastautogp_tpu.models.config import GPConfig
from nowcastautogp_tpu.models.structures import (
    BINARY_TYPES, CONST, CP, EMPTY, GE, LINEAR, PERIODIC, PLUS, SE, TIMES,
    count_nodes, log_prior_structure, prior_arrays, propose_birth_death,
    propose_subtree_replace, sample_params_for_subtree, sample_particle,
    structure_to_str, subtree_slots,
)
from nowcastautogp_tpu.ops.kernels import eval_cov, eval_cov_batch
from nowcastautogp_tpu.ops.lml import gp_lml, gp_predict

MAX_NODES = 15


def _tree(spec):
    types = np.zeros(MAX_NODES, dtype=np.int32)
    params = np.zeros((MAX_NODES, 3), dtype=np.float32)
    for i, (t, p) in spec.items():
        types[i] = t
        params[i, : len(p)] = p
    return jnp.asarray(types), jnp.asarray(params)


def _np_se(x1, x2, log_l, log_a):
    d = x1[:, None] - x2[None, :]
    return np.exp(log_a) * np.exp(-0.5 * d**2 / np.exp(2 * log_l))


def _np_periodic(x1, x2, log_l, log_T, log_a):
    r = np.abs(x1[:, None] - x2[None, :])
    s = np.sin(np.pi * r / np.exp(log_T))
    return np.exp(log_a) * np.exp(-2 * s**2 / np.exp(2 * log_l))


def _np_linear(x1, x2, c, log_a):
    return np.exp(log_a) * np.outer(x1 - c, x2 - c)


class TestCovInterpreter:
    x1 = np.linspace(0.0, 1.0, 9)
    x2 = np.linspace(0.1, 0.9, 7)

    def test_single_se_leaf(self):
        types, params = _tree({0: (SE, [-0.5, 0.3])})
        K = np.asarray(eval_cov(types, params, jnp.asarray(self.x1), jnp.asarray(self.x2)))
        np.testing.assert_allclose(K, _np_se(self.x1, self.x2, -0.5, 0.3), rtol=1e-5, atol=1e-6)

    def test_plus_composite(self):
        types, params = _tree({
            0: (PLUS, []),
            1: (LINEAR, [0.2, -0.1]),
            2: (PERIODIC, [-0.3, np.log(0.25), 0.1]),
        })
        K = np.asarray(eval_cov(types, params, jnp.asarray(self.x1), jnp.asarray(self.x2)))
        expect = _np_linear(self.x1, self.x2, 0.2, -0.1) + _np_periodic(
            self.x1, self.x2, -0.3, np.log(0.25), 0.1
        )
        np.testing.assert_allclose(K, expect, rtol=1e-5, atol=1e-5)

    def test_times_composite(self):
        types, params = _tree({
            0: (TIMES, []),
            1: (SE, [0.0, 0.0]),
            2: (CONST, [np.log(2.0)]),
        })
        K = np.asarray(eval_cov(types, params, jnp.asarray(self.x1), jnp.asarray(self.x2)))
        np.testing.assert_allclose(K, 2.0 * _np_se(self.x1, self.x2, 0.0, 0.0), rtol=1e-5, atol=1e-6)

    def test_gamma_exp_reduces_to_exponential(self):
        # gamma raw = 0 -> gamma = 1 -> exponential kernel exp(-r/l)
        types, params = _tree({0: (GE, [-0.2, 0.0, 0.4])})
        K = np.asarray(eval_cov(types, params, jnp.asarray(self.x1), jnp.asarray(self.x2)))
        r = np.abs(self.x1[:, None] - self.x2[None, :])
        expect = np.exp(0.4) * np.exp(-r / np.exp(-0.2))
        np.testing.assert_allclose(K, expect, rtol=1e-5, atol=1e-5)

    def test_gamma_exp_diagonal_one(self):
        types, params = _tree({0: (GE, [0.0, 0.5, 0.0])})
        x = jnp.asarray(self.x1)
        K = np.asarray(eval_cov(types, params, x, x))
        np.testing.assert_allclose(np.diag(K), np.ones(len(self.x1)), rtol=1e-6)

    def test_changepoint_mixes(self):
        types, params = _tree({
            0: (CP, [0.5, np.log(0.05)]),
            1: (SE, [0.0, 0.0]),
            2: (LINEAR, [0.0, 0.0]),
        })
        x = np.linspace(0.0, 1.0, 21)
        K = np.asarray(eval_cov(types, params, jnp.asarray(x), jnp.asarray(x)))
        s = 1.0 / (1.0 + np.exp(-(x - 0.5) / 0.05))
        expect = np.outer(s, s) * _np_se(x, x, 0.0, 0.0) + np.outer(1 - s, 1 - s) * _np_linear(
            x, x, 0.0, 0.0
        )
        np.testing.assert_allclose(K, expect, rtol=1e-4, atol=1e-6)

    def test_batch_matches_single(self):
        cfg = GPConfig()
        rng = np.random.default_rng(0)
        types_l, params_l = [], []
        for _ in range(4):
            t, p, _ = sample_particle(rng, cfg)
            types_l.append(t)
            params_l.append(p)
        types = jnp.asarray(np.stack(types_l))
        params = jnp.asarray(np.stack(params_l))
        x = jnp.asarray(self.x1)
        Kb = np.asarray(eval_cov_batch(types, params, x, x))
        for i in range(4):
            Ki = np.asarray(eval_cov(types[i], params[i], x, x))
            np.testing.assert_allclose(Kb[i], Ki, rtol=1e-5, atol=1e-5)

    def test_prior_samples_psd(self):
        cfg = GPConfig()
        rng = np.random.default_rng(7)
        x = jnp.asarray(np.linspace(0, 1, 20))
        for _ in range(20):
            t, p, _ = sample_particle(rng, cfg)
            K = np.asarray(eval_cov(jnp.asarray(t), jnp.asarray(p), x, x))
            eigs = np.linalg.eigvalsh(K + 1e-6 * np.eye(20))
            assert eigs.min() > -1e-4, structure_to_str(t)


class TestMaskedLML:
    def test_matches_dense_oracle(self):
        rng = np.random.default_rng(3)
        n_cap, n = 16, 11
        x = np.linspace(0, 1, n_cap)
        y = rng.normal(size=n_cap)
        mask = (np.arange(n_cap) < n).astype(np.float64)
        types, params = _tree({0: (SE, [-0.7, 0.2])})
        log_noise = -2.0
        jitter = 1e-8
        lml = float(
            gp_lml(
                types, params, jnp.float32(log_noise), jnp.asarray(x, jnp.float32),
                jnp.asarray(y, jnp.float32), jnp.asarray(mask, jnp.float32), jitter,
            )
        )
        # numpy oracle on the unpadded active subset
        Ka = _np_se(x[:n], x[:n], -0.7, 0.2) + (np.exp(log_noise) + jitter) * np.eye(n)
        sign, logdet = np.linalg.slogdet(Ka)
        quad = y[:n] @ np.linalg.solve(Ka, y[:n])
        expect = -0.5 * (quad + logdet + n * np.log(2 * np.pi))
        assert lml == pytest.approx(expect, rel=2e-4)

    def test_mask_extension_monotone_shapes(self):
        # growing the mask changes the value but never the shapes/compilation
        types, params = _tree({0: (SE, [-0.7, 0.2])})
        x = jnp.asarray(np.linspace(0, 1, 16), jnp.float32)
        y = jnp.asarray(np.sin(np.linspace(0, 6, 16)), jnp.float32)
        f = jax.jit(gp_lml, static_argnums=())
        vals = []
        for n in (4, 9, 16):
            mask = jnp.asarray((np.arange(16) < n).astype(np.float32))
            vals.append(float(f(types, params, jnp.float32(-2.0), x, y, mask, 1e-6)))
        assert len({round(v, 4) for v in vals}) == 3  # genuinely different values

    def test_broken_kernel_rejected_not_nan(self):
        # absurd params that break the Cholesky must yield a large negative LML
        types, params = _tree({0: (LINEAR, [0.0, 80.0])})  # exp(80) amplitude
        x = jnp.asarray(np.linspace(0, 1, 8), jnp.float32)
        y = jnp.ones(8, jnp.float32)
        mask = jnp.ones(8, jnp.float32)
        val = float(gp_lml(types, params, jnp.float32(-2.0), x, y, mask, 1e-6))
        assert np.isfinite(val)
        assert val <= -1e9


class TestPredict:
    def test_predict_matches_oracle(self):
        rng = np.random.default_rng(5)
        n_cap, n, m = 16, 12, 5
        x = np.linspace(0, 1, n_cap)
        xs = np.linspace(1.05, 1.4, m)
        y = np.sin(2 * np.pi * x) + 0.1 * rng.normal(size=n_cap)
        mask = (np.arange(n_cap) < n).astype(np.float32)
        types, params = _tree({0: (SE, [-1.0, 0.0])})
        log_noise = -3.0
        jitter = 0.0
        mu, cov = gp_predict(
            types, params, jnp.float32(log_noise), jnp.asarray(x, jnp.float32),
            jnp.asarray(y, jnp.float32), jnp.asarray(mask), jnp.asarray(xs, jnp.float32),
            jitter, True,
        )
        Kxx = _np_se(x[:n], x[:n], -1.0, 0.0) + np.exp(log_noise) * np.eye(n)
        Kxs = _np_se(x[:n], xs, -1.0, 0.0)
        Kss = _np_se(xs, xs, -1.0, 0.0)
        sol = np.linalg.solve(Kxx, y[:n])
        mu_e = Kxs.T @ sol
        cov_e = Kss - Kxs.T @ np.linalg.solve(Kxx, Kxs) + np.exp(log_noise) * np.eye(m)
        np.testing.assert_allclose(np.asarray(mu), mu_e, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(cov), cov_e, rtol=1e-2, atol=1e-4)


class TestStructures:
    def test_prior_sampling_and_logprob(self):
        cfg = GPConfig()
        rng = np.random.default_rng(11)
        for _ in range(50):
            t, p, ln = sample_particle(rng, cfg)
            lp = log_prior_structure(t, cfg)
            assert np.isfinite(lp)
            assert count_nodes(t) >= 1
            # default prior: no Constant or SE leaves (zero mass)
            assert not np.any(t == CONST)
            assert not np.any(t == SE)

    def test_changepoints_disabled(self):
        cfg = GPConfig(changepoints=False)
        rng = np.random.default_rng(2)
        for _ in range(50):
            t, _, _ = sample_particle(rng, cfg)
            assert not np.any(t == CP)

    def test_subtree_replace_is_valid_tree(self):
        cfg = GPConfig()
        rng = np.random.default_rng(4)
        t, p, _ = sample_particle(rng, cfg)
        for _ in range(30):
            t2, p2, lh = propose_subtree_replace(rng, t, p, cfg)
            assert np.isfinite(lh)
            assert np.isfinite(log_prior_structure(t2, cfg))
            # binary nodes have both children; leaves have none
            for i in range(t2.shape[0]):
                if t2[i] in (PLUS, TIMES, CP):
                    assert t2[2 * i + 1] != EMPTY and t2[2 * i + 2] != EMPTY
                elif t2[i] != EMPTY and 2 * i + 2 < t2.shape[0]:
                    assert t2[2 * i + 1] == EMPTY and t2[2 * i + 2] == EMPTY
            t, p = t2, p2

    def test_prior_arrays_mask_matches_slots(self):
        cfg = GPConfig()
        rng = np.random.default_rng(9)
        t, p, _ = sample_particle(rng, cfg)
        mu, sigma, active = prior_arrays(t[None, :], cfg)
        # Periodic period slot uses the period prior
        for i in np.flatnonzero(t == PERIODIC):
            assert active[0, i, 1] == 1.0
            assert mu[0, i, 1] == pytest.approx(cfg.prior["period"]["mu"])
        for i in np.flatnonzero(t == EMPTY):
            assert np.all(active[0, i] == 0.0)


def _valid_heap(t: np.ndarray) -> bool:
    n = t.shape[0]
    if t[0] == EMPTY:
        return False
    for i in range(n):
        li, ri = 2 * i + 1, 2 * i + 2
        if t[i] in (PLUS, TIMES, CP):
            if li >= n or t[li] == EMPTY or t[ri] == EMPTY:
                return False
        elif li < n:
            if t[li] != EMPTY or t[ri] != EMPTY:
                return False
    return True


class TestBirthDeathMove:
    """The third involutive move: reversible insert/delete of an internal
    node with intact relocation of the existing subtree (parameters
    preserved) — ``structures.propose_birth_death``."""

    def test_chain_produces_valid_trees(self):
        cfg = GPConfig(max_depth=4)
        rng = np.random.default_rng(5)
        t, p, _ = sample_particle(rng, cfg)
        for _ in range(200):
            t2, p2, lh = propose_birth_death(rng, t, p, cfg)
            assert np.isfinite(lh) or lh == -np.inf
            assert _valid_heap(t2)
            if np.log(rng.random()) < lh:
                t, p = t2, p2

    def test_birth_preserves_every_existing_node(self):
        """A birth proposal relocates the chosen subtree intact: every
        (type, params) pair of the original tree survives in the proposal."""
        cfg = GPConfig(max_depth=4)
        rng = np.random.default_rng(7)
        seen_birth = 0
        t, p, _ = sample_particle(rng, cfg)
        for _ in range(300):
            t2, p2, _ = propose_birth_death(rng, t, p, cfg)
            if count_nodes(t2) > count_nodes(t):  # birth proposal
                seen_birth += 1
                old = sorted(
                    (int(t[i]), tuple(np.round(p[i], 6)))
                    for i in np.flatnonzero(t != EMPTY))
                new = sorted(
                    (int(t2[i]), tuple(np.round(p2[i], 6)))
                    for i in np.flatnonzero(t2 != EMPTY))
                # old multiset is a sub-multiset of the new one
                it = iter(new)
                assert all(any(x == y for y in it) for x in old), (old, new)
        assert seen_birth > 30

    def test_single_leaf_death_is_forced_reject(self):
        cfg = GPConfig(max_depth=3)
        rng = np.random.default_rng(3)
        t = np.zeros(cfg.max_nodes, np.int32)
        t[0] = PERIODIC
        p = sample_params_for_subtree(rng, t, cfg, [0])
        rejects = sum(
            propose_birth_death(rng, t, p, cfg)[2] == -np.inf
            for _ in range(200))
        # the death coin (~half of draws) must force-reject on a leaf-only
        # tree; births stay feasible
        assert 60 <= rejects <= 140

    def test_prior_invariance(self):
        """With a constant likelihood the MH chain driven by the move's own
        Hastings correction must preserve the PCFG prior — the sharpest
        whole-move correctness check (a sign or bookkeeping error in the
        Hastings terms drifts the node-count distribution immediately)."""
        cfg = GPConfig(max_depth=4)
        rng = np.random.default_rng(11)
        P, M = 150, 50
        counts = []
        for _ in range(P):
            t, p, _ = sample_particle(rng, cfg)
            for _ in range(M):
                t2, p2, lh = propose_birth_death(rng, t, p, cfg)
                if np.log(rng.random()) < lh:
                    t, p = t2, p2
            counts.append(count_nodes(t))
        ref = [count_nodes(sample_particle(rng, cfg)[0]) for _ in range(4000)]
        se = np.hypot(np.std(counts) / np.sqrt(P),
                      np.std(ref) / np.sqrt(len(ref)))
        z = (np.mean(counts) - np.mean(ref)) / se
        assert abs(z) < 4.0, (np.mean(counts), np.mean(ref), z)
