"""nowcastautogp_tpu — TPU-native nowcast + GP-ensemble forecasting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
CDCgov/NowcastAutoGP *including* its AutoGP engine: SMC structure discovery
over compositional kernel expression trees, involutive-MCMC structure moves,
vmapped HMC hyperparameter chains, and the GP covariance / Cholesky /
log-marginal-likelihood / predictive-posterior core as batched device ops —
plus the reference's transformation suite, nowcast-scenario batching, and
CRPS/quantile evaluation.

Public surface (superset of the reference's exports,
``/root/reference/src/NowcastAutoGP.jl:10-12``): ``TData``, ``GPModel``,
``GPConfig``, ``create_transformed_data``, ``get_transformations``,
``make_and_fit_model``, ``forecast``, ``forecast_with_nowcasts``,
``create_nowcast_data`` — and engine-level access (``fit_smc``, ``add_data``,
``predict_mvn``, ``maybe_resample``, ``mcmc_structure``, ``mcmc_parameters``,
``num_particles``, schedules) that the reference reaches through AutoGP.
"""

from .eval.crps import (
    crps_ensemble, crps_matrix, quantile_matrix, quantile_matrix_device,
)
from .eval.acceptance import run_acceptance, synthetic_nhsn_vintage
from .eval.submission import quantile_submission, write_submission_csv
from .eval.wis import (
    FLUSIGHT_QUANTILES, coverage_matrix, interval_score, wis_ensemble,
    wis_matrix,
)
from .fitting import make_and_fit_model
from .forecasting import forecast
from .inference.schedule import linear_schedule
from .inference.smc import fit_smc
from .models.config import DEFAULT_DEPTH, GPConfig, HMCConfig
from .models.decompose import decompose
from .models.gp_model import (
    GPModel, add_data, maybe_resample, mcmc_parameters, mcmc_structure,
    num_particles, predict_mvn,
)
from .models.posterior import MvNormalMixture
from .nowcast import create_nowcast_data, forecast_with_nowcasts
from .parallel.panel import fit_panel, forecast_panel, panel_predict_mvn
from .parallel.sharding import make_mesh
from .tdata import TData, create_transformed_data
from .transforms import get_transformations
from .utils.data import VintagedData, load_vintaged_csv
from .utils.profiling import device_trace, phase_report, reset_phases
from .utils.serialize import load_model, save_model

__version__ = "0.1.0"

__all__ = [
    # reference-parity surface
    "TData", "GPModel", "GPConfig",
    "create_transformed_data", "get_transformations", "make_and_fit_model",
    "forecast", "forecast_with_nowcasts", "create_nowcast_data",
    # engine surface (reached via AutoGP.* in the reference)
    "fit_smc", "add_data", "predict_mvn", "decompose", "maybe_resample",
    "mcmc_structure", "mcmc_parameters", "num_particles", "linear_schedule",
    "HMCConfig", "MvNormalMixture", "DEFAULT_DEPTH",
    # evaluation & observability & checkpointing
    "crps_ensemble", "crps_matrix", "quantile_matrix",
    "quantile_matrix_device", "run_acceptance", "synthetic_nhsn_vintage",
    "wis_ensemble", "wis_matrix", "interval_score", "coverage_matrix",
    "FLUSIGHT_QUANTILES", "quantile_submission", "write_submission_csv",
    "phase_report", "reset_phases", "device_trace",
    "save_model", "load_model",
    # vintaged-data workflow helpers
    "VintagedData", "load_vintaged_csv",
    # multi-jurisdiction / multi-chip panel fitting & forecasting
    "fit_panel", "forecast_panel", "panel_predict_mvn", "make_mesh",
]
