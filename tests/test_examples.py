"""Execute the vignette-parity examples end-to-end (smoke budgets).

The reference executes its vignettes at doc-build time
(``/root/reference/docs/make_vignettes.jl:11-20``, ``execute=true``), making
the canonical workflows acceptance runs; these tests give the examples the
same status so API drift breaks loudly.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.engine

_EXAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_EXAMPLES, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


class TestExamplesRun:
    def test_getting_started(self):
        scores = _load("getting_started").run(smoke=True)
        assert set(scores) == {"naive", "leave_out_last", "nowcast",
                               "nowcast_hmc"}
        assert all(np.isfinite(v) for v in scores.values())

    def test_setting_priors(self):
        summary = _load("setting_priors").run(smoke=True)
        assert set(summary) == {"default", "lin_period", "seasonal",
                                "seasonal_lin_period"}
        assert all(np.isfinite(v) for v in summary.values())

    def test_use_percentages(self):
        qs = _load("use_percentages").run(smoke=True)
        assert qs.shape[0] == 3
        assert np.all(qs >= 0) and np.all(qs <= 100)

    def test_multi_jurisdiction(self):
        scores = _load("multi_jurisdiction").run(smoke=True)
        assert len(scores) == 3
        assert all(np.isfinite(v) for v in scores.values())

    def test_acceptance_smoke(self):
        res = _load("acceptance").run(smoke=True)
        assert set(res["scores"]) == {
            "naive", "leave_out_last", "nowcast", "nowcast_hmc",
            "nowcast_forecast_hmc"}
        assert all(np.isfinite(v) for v in res["scores"].values())
        assert res["ratios"]["nowcast_hmc"] == 1.0
        # WIS companion scoring rides along on the same draws
        assert set(res["scores_wis"]) == set(res["scores"])
        assert all(np.isfinite(v) for v in res["scores_wis"].values())
        assert res["ratios_wis"]["nowcast_hmc"] == 1.0

    def test_daily_cadence(self):
        out = _load("daily_cadence").run(smoke=True)
        assert np.isfinite(out["log_crps"])
        assert 0.0 <= out["coverage90"] <= 1.0
        assert out["structures"], "fitted ensemble must report structures"

    def test_online_update(self):
        out = _load("online_update").run(smoke=True)
        assert set(out["mean_log_crps"]) == {"online", "stale"}
        assert all(np.isfinite(v) for v in out["mean_log_crps"].values())
        # conditioning on the new weeks must not be slower than refitting
        assert out["warm_update_s"] < out["initial_fit_s"]


class TestFigurePipeline:
    def test_acceptance_figure_renders(self, tmp_path):
        """The docs figure renderer stays importable and its artifact-only
        figure (no refit) renders from the committed acceptance artifact."""
        import importlib.util as ilu

        pytest.importorskip("matplotlib")
        repo = os.path.dirname(_EXAMPLES)
        spec = ilu.spec_from_file_location(
            "make_figures", os.path.join(repo, "tools", "make_figures.py"))
        mf = ilu.module_from_spec(spec)
        spec.loader.exec_module(mf)
        mf.OUT = str(tmp_path)
        mf.fig_acceptance()
        out = os.path.join(str(tmp_path), "acceptance_crps.png")
        assert os.path.exists(out) and os.path.getsize(out) > 10_000
