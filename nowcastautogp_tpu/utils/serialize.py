"""Checkpoint / resume: persist fitted ensembles to disk.

The reference's checkpointing is in-memory ``Dict(model)`` /
``GPModel(dict)`` round-trips used for scenario isolation and fit caching
(``/root/reference/src/forecasting.jl:128,133``;
``docs/vignettes/getting-started.jl:387,419``).  Here the same dict state
(plain numpy arrays + the config dataclass) also persists to disk as an
``.npz`` archive with a JSON header — dependency-free, no pickle execution on
load.
"""

from __future__ import annotations

import io
import json

import numpy as np

from ..models.config import GPConfig
from ..models.gp_model import GPModel

__all__ = ["save_model", "load_model"]

_ARRAY_KEYS = ("y", "order", "node_types", "params", "log_noise", "lml",
               "log_weight", "hmc_eps_scale", "key")
_SCALAR_KEYS = ("version", "n_ingested", "t0", "t_scale", "y_mean", "y_std")


def save_model(model: GPModel, path: str) -> None:
    """Serialize a model (``model.to_dict()`` state) to an ``.npz`` file."""
    d = model.to_dict()
    cfg = d["config"]
    header = {
        "scalars": {k: d[k] for k in _SCALAR_KEYS},
        "config": {
            "node_dist_leaf": list(cfg.node_dist_leaf),
            "node_dist_nocp": list(cfg.node_dist_nocp),
            "node_dist_cp": list(cfg.node_dist_cp),
            "changepoints": cfg.changepoints,
            "max_depth": cfg.max_depth,
            "noise": cfg.noise,
            "prior": cfg.prior,
        },
        "rng_state": _jsonify(d["rng_state"]),
        "ds_kind": "datetime64" if getattr(d["ds"], "dtype", None) is not None
                   and d["ds"].dtype.kind == "M" else "object",
    }
    arrays = {k: np.asarray(d[k]) for k in _ARRAY_KEYS}
    # dates: store as int64 datetime64[ns] when possible, else float days
    ds = d["ds"]
    try:
        arrays["ds"] = np.asarray(ds, dtype="datetime64[ns]").astype(np.int64)
        header["ds_kind"] = "datetime64_ns"
    except Exception:
        from .dates import dates_to_float

        arrays["ds"] = dates_to_float(ds)
        header["ds_kind"] = "float_days"
    buf = io.BytesIO()
    np.savez_compressed(buf, header=np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8), **arrays)
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def load_model(path: str) -> GPModel:
    """Reconstruct a model saved with :func:`save_model`."""
    with np.load(path) as z:
        header = json.loads(bytes(z["header"]).decode())
        # hmc_eps_scale absent in pre-round-2 checkpoints: GPModel defaults
        # the missing key to ones on load
        arrays = {k: z[k] for k in _ARRAY_KEYS if k in z}
        ds_raw = z["ds"]
    cfg_h = header["config"]
    config = GPConfig(
        node_dist_leaf=cfg_h["node_dist_leaf"],
        node_dist_nocp=cfg_h["node_dist_nocp"],
        node_dist_cp=cfg_h["node_dist_cp"],
        changepoints=cfg_h["changepoints"],
        max_depth=cfg_h["max_depth"],
        noise=cfg_h["noise"],
        prior=cfg_h["prior"],
    )
    if header["ds_kind"] == "datetime64_ns":
        ds = np.asarray(ds_raw, dtype=np.int64).view("datetime64[ns]")
    else:
        ds = np.asarray(ds_raw, dtype=np.float64)
    d = dict(header["scalars"])
    d.update(arrays)
    d["ds"] = ds
    d["config"] = config
    d["rng_state"] = _unjsonify(header["rng_state"])
    return GPModel(d)


def _jsonify(obj):
    """numpy-state dicts -> JSON-safe structures."""
    if isinstance(obj, dict):
        return {k: _jsonify(v) for k, v in obj.items()}
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, np.ndarray):
        return {"__ndarray__": obj.tolist(), "dtype": str(obj.dtype)}
    return obj


def _unjsonify(obj):
    if isinstance(obj, dict):
        if "__ndarray__" in obj:
            return np.asarray(obj["__ndarray__"], dtype=obj["dtype"])
        return {k: _unjsonify(v) for k, v in obj.items()}
    return obj
