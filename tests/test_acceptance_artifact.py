"""Golden-artifact regression on the committed full-budget acceptance run.

ACCEPTANCE.json is produced by ``python examples/acceptance.py --full`` on
the TPU at the reference's canonical budgets (n_particles=24,
smc_data_proportion=0.1, n_mcmc=50, n_hmc=50, 2000 draws, 100 nowcast
samples; ``/root/reference/docs/vignettes/getting-started.jl:266-268,415``).
This test pins the committed artifact's structure and the reference's
qualitative CRPS ordering (``getting-started.jl:804-833``): nowcast variants
beat leave-out-last, which beats naive.
"""

import json
import os

import numpy as np

_ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "ACCEPTANCE.json")


class TestAcceptanceArtifact:
    def test_artifact_exists_and_is_canonical(self):
        with open(_ARTIFACT) as f:
            art = json.load(f)
        assert art["fit_kwargs"] == {
            "n_particles": 24, "smc_data_proportion": 0.1,
            "n_mcmc": 50, "n_hmc": 50,
        }
        assert art["n_report_dates"] >= 3
        assert set(art["scores"]) == {
            "naive", "leave_out_last", "nowcast", "nowcast_hmc",
            "nowcast_forecast_hmc"}
        assert all(np.isfinite(v) and v > 0 for v in art["scores"].values())

    def test_reference_ordering_reproduced(self):
        with open(_ARTIFACT) as f:
            art = json.load(f)
        s = art["scores"]
        best_nowcast = min(s["nowcast"], s["nowcast_hmc"],
                           s["nowcast_forecast_hmc"])
        # the vignette's headline ordering: nowcasting beats redaction beats
        # naively trusting provisional data
        assert best_nowcast < s["leave_out_last"], s
        assert best_nowcast < s["naive"], s
        # ratios are normalized to the nowcast_hmc baseline
        assert abs(art["ratios"]["nowcast_hmc"] - 1.0) < 1e-12
