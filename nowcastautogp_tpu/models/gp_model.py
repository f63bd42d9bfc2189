"""GPModel: the particle ensemble over (kernel structure, hyperparameters).

TPU-native equivalent of ``AutoGP.GPModel`` as exercised by the reference
(surface inventoried in SURVEY.md §2.3; construction at
``/root/reference/src/make_and_fit_model.jl:84-87``, incremental conditioning
at ``src/forecasting.jl:135``, serialization round-trip at
``src/forecasting.jl:128,133``).

Design (SURVEY.md §7): the model is a *host object* owning

* fixed-capacity device data buffers (normalized time axis, standardized
  targets, {0,1} ingestion mask) so SMC data annealing and ``add_data`` never
  change XLA shapes (capacity grows in chunks of ``_PAD``, a rare
  recompile);
* device-resident particle state — heap-encoded trees, unconstrained
  hyperparameters, log noise, cached masked LML — everything the HMC /
  structure-move / predictive kernels consume, with a leading particle axis;
* host-side mirrors of the trees (for irregular structure proposals) and the
  log importance weights (for ESS / resampling control flow).

The time axis is normalized to [0, 1] over the *initial* window and the
targets are standardized (the engine behavior documented at
``docs/vignettes/setting-priors.jl:71-76``); data added later simply extends
beyond 1.  The ``config`` object is stored by reference — ``model.config is
config`` — preserving the passthrough contract (``test/test_gpconfig.jl:9``).
"""

from __future__ import annotations

import copy

import jax
import jax.numpy as jnp
import numpy as np

from ..inference.hmc import run_hmc
from ..inference.resample import ess, gather_particles, resample_indices
from ..inference.structure_mcmc import mcmc_structure_sweep
from ..ops.lml import DEFAULT_JITTER, gp_lml_batch, gp_predict_batch
from ..utils.dates import as_date_array, dates_to_float
from .config import GPConfig, HMCConfig
from .posterior import MvNormalMixture
from .structures import prior_arrays, sample_particle

__all__ = [
    "GPModel", "num_particles", "predict_mvn", "add_data",
    "maybe_resample", "mcmc_structure", "mcmc_parameters",
]

# Capacity granule for the fixed-shape data buffers.  32 (not 64): the
# LML core is latency-bound in XLA's While-loop Cholesky, so shaving padding
# rows off the dominant full-capacity segment is a direct win (a 150-point
# series runs its last schedule steps at cap 160 instead of 192 — measured
# ~19% off the hot-op gradient); every compute path only needs n % 8 == 0
# (Mosaic sublane), and ops/pallas_chol.py's 32-wide blocks stay aligned.
_PAD = 32
DTYPE = jnp.float32


def _pad_to(arr: np.ndarray, cap: int, fill=0.0) -> np.ndarray:
    out = np.full(cap, fill, dtype=np.float32)
    out[: arr.shape[0]] = arr
    return out


class GPModel:
    """Particle ensemble GP over a single time series."""

    def __init__(self, ds_or_dict, y=None, *, n_particles: int = 1,
                 config: GPConfig | None = None, seed: int | None = None):
        if isinstance(ds_or_dict, dict) and y is None:
            self._init_from_dict(ds_or_dict)
            return
        ds = ds_or_dict
        config = config if config is not None else GPConfig()
        self.config = config  # stored by reference (passthrough contract)
        self.ds = as_date_array(ds)
        self.y = np.asarray(list(y) if not isinstance(y, np.ndarray) else y,
                            dtype=np.float64)
        assert len(self.ds) == len(self.y), "ds and y must have equal length"
        t_raw = dates_to_float(self.ds)

        # normalization over the initial window
        self._t0 = float(t_raw.min()) if t_raw.size else 0.0
        t_span = float(t_raw.max() - t_raw.min()) if t_raw.size else 1.0
        self._t_scale = t_span if t_span > 0 else 1.0
        self._y_mean = float(self.y.mean()) if self.y.size else 0.0
        y_std = float(self.y.std()) if self.y.size else 1.0
        self._y_std = y_std if y_std > 1e-12 else 1.0

        seed_seq = np.random.SeedSequence(seed)
        self.rng = np.random.default_rng(seed_seq)
        self._key = jax.random.PRNGKey(int(seed_seq.generate_state(1)[0]))

        # particle initialization from the structure + hyperparameter prior
        P = int(n_particles)
        types_l, params_l, noise_l = [], [], []
        for _ in range(P):
            t, p, ln = sample_particle(self.rng, config)
            types_l.append(t)
            params_l.append(p)
            noise_l.append(ln)
        self._host_types = np.stack(types_l).astype(np.int32)
        self._params_d = jnp.asarray(np.stack(params_l), DTYPE)
        self._log_noise_d = jnp.asarray(np.asarray(noise_l), DTYPE)
        self._lml_d = jnp.zeros(P, DTYPE)
        self._eps_scale_d = jnp.ones(P, DTYPE)  # adaptive HMC step scales
        self.log_weight = np.zeros(P, dtype=np.float64)

        # ingestion bookkeeping: device buffers hold data in ingestion order
        self._order = np.arange(len(self.y), dtype=np.int64)
        self.n_ingested = 0
        self._push_data()

    # ------------------------------------------------------------------ data

    def _push_data(self):
        """(Re)build the fixed-capacity device buffers from host data."""
        n = len(self.y)
        cap = max(_PAD, int(np.ceil(max(n, 1) / _PAD)) * _PAD)
        t_raw = dates_to_float(self.ds)
        x_n = (t_raw - self._t0) / self._t_scale
        y_n = (self.y - self._y_mean) / self._y_std
        self._cap = cap
        self._x_d = jnp.asarray(_pad_to(x_n[self._order], cap), DTYPE)
        self._y_d = jnp.asarray(_pad_to(y_n[self._order], cap), DTYPE)

    def _mask(self, n: int | None = None) -> jnp.ndarray:
        n = self.n_ingested if n is None else n
        return jnp.asarray((np.arange(self._cap) < n).astype(np.float32))

    def _batched_data(self, n: int | None = None, bucket: bool = False):
        """Particle-batched (x, y, mask) buffers.

        ``bucket=True`` returns the smallest sufficient ``_PAD``-multiple
        capacity for the current conditioning set instead of the full
        buffer — the same capacity-bucketing rule as ``_fit_device``
        (masked LML is invariant to trailing padding, so results are
        unchanged while early-schedule rejuvenation sweeps run at a
        fraction of full-capacity cost).
        """
        P = self.num_particles
        cap = self._cap
        if bucket:
            live = self.n_ingested if n is None else n
            cap = min(cap, max(_PAD, int(np.ceil(max(live, 1) / _PAD)) * _PAD))
        x = jnp.broadcast_to(self._x_d[:cap], (P, cap))
        y = jnp.broadcast_to(self._y_d[:cap], (P, cap))
        m = jnp.broadcast_to(self._mask(n)[:cap], (P, cap))
        return x, y, m

    def _normalize_dates(self, ds) -> np.ndarray:
        return (dates_to_float(ds) - self._t0) / self._t_scale

    # ------------------------------------------------------------- properties

    @property
    def num_particles(self) -> int:
        return int(self._host_types.shape[0])

    @property
    def noise_prior(self):
        wc = self.config.prior["wildcard"]
        infer = 0.0 if self.config.noise is not None else 1.0
        return float(wc["mu"]) - 2.0, float(wc["sigma"]), infer

    def next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def structures(self) -> list[str]:
        """Human-readable kernel structures of all particles (diagnostics)."""
        from .structures import structure_to_str

        return [structure_to_str(t) for t in self._host_types]

    # ------------------------------------------------------------- inference

    def reweight_to(self, n_new: int):
        """Condition on data up to ``n_new`` ingestion slots (SMC reweight).

        Weights are multiplied by the predictive likelihood of the newly
        ingested block: ``w *= p(y_new | y_old, structure, params)``.
        """
        x, y, m = self._batched_data(n_new, bucket=True)
        lml_new = gp_lml_batch(
            jnp.asarray(self._host_types), self._params_d, self._log_noise_d,
            x, y, m, DEFAULT_JITTER,
        )
        lml_new_np = np.asarray(lml_new, dtype=np.float64)
        lml_old_np = np.asarray(self._lml_d, dtype=np.float64)
        # broken particles (LML at the -1e10 rejection sentinel) must lose
        # weight, not gain ~1e10 of it when only the old value is broken
        delta = np.where(
            (lml_old_np <= -1e9) | (lml_new_np <= -1e9), -1e10,
            lml_new_np - lml_old_np)
        self.log_weight += delta
        self._lml_d = lml_new
        self.n_ingested = n_new

    def resample(self, method: str = "systematic"):
        idx = resample_indices(self.rng, self.log_weight, method)
        state = (self._params_d, self._log_noise_d, self._lml_d,
                 self._eps_scale_d)
        (self._params_d, self._log_noise_d, self._lml_d,
         self._eps_scale_d) = gather_particles(state, jnp.asarray(idx))
        self._host_types = self._host_types[idx]
        self.log_weight = np.zeros_like(self.log_weight)
        return idx

    def rejuvenate(self, n_mcmc: int, n_hmc: int,
                   hmc_config: HMCConfig | None = None,
                   engine: str = "device"):
        """n_mcmc structure moves, each followed by n_hmc HMC trajectories.

        ``engine="device"`` runs the whole sweep as one compiled program with
        on-device subtree proposals; ``"host"`` uses the numpy proposal path
        (one device call per move).
        """
        hmc_cfg = hmc_config or HMCConfig()
        noise_mu, noise_sigma, infer = self.noise_prior
        x, y, m = self._batched_data(bucket=True)
        if engine == "device":
            from ..inference.device_smc import rejuvenation_sweep
            from .structures_device import ancestor_table, config_arrays

            types, params, log_noise, lml, acc, scale = rejuvenation_sweep(
                jnp.asarray(self._host_types), self._params_d,
                self._log_noise_d, self._lml_d, x, y, m, self.next_key(),
                config_arrays(self.config),
                jnp.asarray(ancestor_table(self.config.max_nodes)),
                n_mcmc=int(n_mcmc), n_hmc=int(n_hmc),
                n_leapfrog=hmc_cfg.n_leapfrog, step_size=hmc_cfg.step_size,
                step_jitter=hmc_cfg.step_size_jitter, jitter=DEFAULT_JITTER,
                noise_mu=noise_mu, noise_sigma=noise_sigma, infer_noise=infer,
                eps_scale=self._eps_scale_d,
            )
            self._host_types = np.asarray(types)
            self._params_d, self._log_noise_d, self._lml_d = params, log_noise, lml
            self._eps_scale_d = scale
            return float(np.asarray(acc).mean())
        (self._host_types, self._params_d, self._log_noise_d, self._lml_d,
         self._key, acc, self._eps_scale_d) = mcmc_structure_sweep(
            self.rng, self._key, self._host_types, self._params_d,
            self._log_noise_d, self._lml_d, x, y, m, self.config,
            n_mcmc, n_hmc, hmc_cfg, DEFAULT_JITTER, noise_mu, noise_sigma,
            infer, eps_scale=self._eps_scale_d,
        )
        return acc

    def hmc_only(self, n_hmc: int, hmc_config: HMCConfig | None = None):
        """Parameter-only rejuvenation (AutoGP.mcmc_parameters! semantics)."""
        hmc_cfg = hmc_config or HMCConfig()
        noise_mu, noise_sigma, infer = self.noise_prior
        x, y, m = self._batched_data(bucket=True)
        mu, sigma, active = (jnp.asarray(a) for a in
                             prior_arrays(self._host_types, self.config))
        (self._params_d, self._log_noise_d, self._lml_d, rate,
         self._eps_scale_d) = run_hmc(
            jnp.asarray(self._host_types), self._params_d, self._log_noise_d,
            mu, sigma, active, x, y, m, self.next_key(),
            n_steps=int(n_hmc), n_leapfrog=hmc_cfg.n_leapfrog,
            step_size=hmc_cfg.step_size, step_jitter=hmc_cfg.step_size_jitter,
            jitter=DEFAULT_JITTER, noise_mu=noise_mu, noise_sigma=noise_sigma,
            infer_noise=infer, eps_scale=self._eps_scale_d,
        )
        return float(np.asarray(rate).mean())

    # -------------------------------------------------------------- serialize

    def to_dict(self) -> dict:
        """Full ensemble state -> plain dict (AutoGP ``Dict(model)`` analog)."""
        return {
            "version": 1,
            "ds": self.ds,
            "y": self.y.copy(),
            "order": self._order.copy(),
            "n_ingested": int(self.n_ingested),
            "t0": self._t0, "t_scale": self._t_scale,
            "y_mean": self._y_mean, "y_std": self._y_std,
            "node_types": np.asarray(self._host_types).copy(),
            "params": np.asarray(self._params_d).copy(),
            "log_noise": np.asarray(self._log_noise_d).copy(),
            "lml": np.asarray(self._lml_d).copy(),
            "log_weight": self.log_weight.copy(),
            "hmc_eps_scale": np.asarray(self._eps_scale_d).copy(),
            "config": self.config,
            "rng_state": self.rng.bit_generator.state,
            "key": np.asarray(jax.random.key_data(self._key)).copy(),
        }

    def _init_from_dict(self, d: dict):
        self.config = d["config"]
        self.ds = d["ds"]
        self.y = np.asarray(d["y"], dtype=np.float64)
        self._order = np.asarray(d["order"], dtype=np.int64)
        self.n_ingested = int(d["n_ingested"])
        self._t0 = float(d["t0"])
        self._t_scale = float(d["t_scale"])
        self._y_mean = float(d["y_mean"])
        self._y_std = float(d["y_std"])
        self._host_types = np.asarray(d["node_types"], dtype=np.int32)
        self._params_d = jnp.asarray(d["params"], DTYPE)
        self._log_noise_d = jnp.asarray(d["log_noise"], DTYPE)
        self._lml_d = jnp.asarray(d["lml"], DTYPE)
        self.log_weight = np.asarray(d["log_weight"], dtype=np.float64)
        scale = d.get("hmc_eps_scale")
        self._eps_scale_d = (
            jnp.asarray(scale, DTYPE) if scale is not None
            else jnp.ones(self._host_types.shape[0], DTYPE)
        )
        self.rng = np.random.default_rng()
        self.rng.bit_generator.state = copy.deepcopy(d["rng_state"])
        self._key = jax.random.wrap_key_data(jnp.asarray(d["key"]))
        self._push_data()

    def clone(self) -> "GPModel":
        return GPModel(copy.deepcopy(self.to_dict()))


# ---------------------------------------------------------------- module API


def num_particles(model: GPModel) -> int:
    """Ensemble size (AutoGP.num_particles; ``src/forecasting.jl:140``)."""
    return model.num_particles


def normalized_weights(model: GPModel) -> np.ndarray:
    """Normalized importance weights of the particle ensemble (float64)."""
    lw = model.log_weight - model.log_weight.max()
    w = np.exp(lw)
    return w / w.sum()


def predict_mvn(model: GPModel, ds, *, include_noise: bool = True) -> MvNormalMixture:
    """Predictive posterior at ``ds`` as a weighted mixture over particles.

    Observable semantics of ``AutoGP.predict_mvn``
    (``src/forecasting.jl:46``); values are on the transformed-data scale.
    """
    xs = jnp.asarray(model._normalize_dates(ds), DTYPE)
    x, y, m = model._batched_data()
    mu, cov = gp_predict_batch(
        jnp.asarray(model._host_types), model._params_d, model._log_noise_d,
        x, y, m, xs, DEFAULT_JITTER, include_noise,
    )
    w = normalized_weights(model)
    mu = model._y_mean + model._y_std * np.asarray(mu, dtype=np.float64)
    cov = (model._y_std**2) * np.asarray(cov, dtype=np.float64)
    return MvNormalMixture(w, mu, cov)


def add_data(model: GPModel, ds, y) -> None:
    """Incrementally condition on new observations (SMC reweighting), the
    semantics of ``AutoGP.add_data!`` (``src/forecasting.jl:135``)."""
    ds_new = as_date_array(ds)
    y_new = np.asarray(list(y) if not isinstance(y, np.ndarray) else y,
                       dtype=np.float64)
    assert len(ds_new) == len(y_new), "ds and y must have equal length"
    if len(y_new) == 0:
        return
    n_old = len(model.y)
    if model.ds.dtype == object:
        merged = np.empty(n_old + len(ds_new), dtype=object)
        merged[:n_old] = model.ds
        merged[n_old:] = list(ds_new)
        model.ds = merged
    else:
        model.ds = np.concatenate([model.ds, ds_new.astype(model.ds.dtype)])
    model.y = np.concatenate([model.y, y_new])
    # splice the new rows into the ingestion order at position n_ingested so
    # the extended mask covers exactly the new block — appending at the end
    # would mis-weight a model that still has not-yet-ingested shuffled rows
    new_idx = np.arange(n_old, n_old + len(y_new), dtype=np.int64)
    k = model.n_ingested
    model._order = np.concatenate([model._order[:k], new_idx, model._order[k:]])
    model._push_data()
    # condition: everything previously ingested plus the new block
    model.reweight_to(k + len(y_new))


def maybe_resample(model: GPModel, threshold: float) -> bool:
    """Resample the ensemble if ESS < threshold (threshold in particle
    counts; ``AutoGP.maybe_resample!`` semantics, ``src/forecasting.jl:138``)."""
    if threshold <= 0:
        return False
    if ess(model.log_weight) < float(threshold):
        model.resample()
        return True
    return False


def mcmc_structure(model: GPModel, n_mcmc: int, n_hmc: int,
                   hmc_config: HMCConfig | None = None) -> float:
    """Structure + hyperparameter rejuvenation of all particles
    (``AutoGP.mcmc_structure!``, ``src/forecasting.jl:146``)."""
    return model.rejuvenate(int(n_mcmc), int(n_hmc), hmc_config)


def mcmc_parameters(model: GPModel, n_hmc: int,
                    hmc_config: HMCConfig | None = None) -> float:
    """HMC-only hyperparameter rejuvenation
    (``AutoGP.mcmc_parameters!``, ``src/forecasting.jl:65,148``)."""
    return model.hmc_only(int(n_hmc), hmc_config)
