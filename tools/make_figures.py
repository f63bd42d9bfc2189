"""Render the committed documentation figures (VERDICT r3 missing #3).

The reference ships a Documenter site whose vignettes execute at doc-build
and commit their plots (``/root/reference/docs/make_vignettes.jl:11-20``,
``docs/src/vignettes/*.png``); this repo's docs were text-only.  This tool
executes the same pipelines at seeded moderate budgets and renders four
figures into ``docs/figures/`` (embedded by ``docs/vignettes.md``):

1. ``getting_started_forecast.png`` — observed series, nowcast-conditioned
   forecast median + 50/90% bands, held-out truth.
2. ``acceptance_crps.png`` — the five-approach CRPS-ratio comparison from
   the committed vignette acceptance artifact (no refit).
3. ``decompose_components.png`` — additive component posteriors of the
   top-weight particle (``decompose()``).
4. ``daily_cadence_forecast.png`` — the daily-cadence fit + 28-day forecast.

Colors are the first three slots of the dataviz reference palette (blue
#2a78d6 / orange #eb6834 / aqua #1baf7a — documented as all-pairs
CVD-validated in both modes); light surface #fcfcfb; text #0b0b0b/#52514e.

Run (CPU is fine; figures are deterministic given the seeds):

    JAX_PLATFORMS=cpu python tools/make_figures.py
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.dates as mdates
import matplotlib.pyplot as plt

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "docs", "figures")

# dataviz reference palette, light mode
BLUE, ORANGE, AQUA = "#2a78d6", "#eb6834", "#1baf7a"
SURFACE, INK, INK2, GRID = "#fcfcfb", "#0b0b0b", "#52514e", "#e7e6e2"

plt.rcParams.update({
    "figure.facecolor": SURFACE, "axes.facecolor": SURFACE,
    "savefig.facecolor": SURFACE, "text.color": INK,
    "axes.labelcolor": INK2, "xtick.color": INK2, "ytick.color": INK2,
    "axes.edgecolor": GRID, "axes.grid": True, "grid.color": GRID,
    "grid.linewidth": 0.6, "axes.spines.top": False,
    "axes.spines.right": False, "font.size": 9.5,
    "axes.titlesize": 10.5, "axes.titlecolor": INK, "legend.frameon": False,
})


def _fan(ax, dates, fc, color):
    """Median line + 50%/90% bands for a (n_dates, draws) matrix."""
    q05, q25, q50, q75, q95 = np.quantile(fc, [0.05, 0.25, 0.5, 0.75, 0.95],
                                          axis=1)
    ax.fill_between(dates, q05, q95, color=color, alpha=0.15, linewidth=0)
    ax.fill_between(dates, q25, q75, color=color, alpha=0.28, linewidth=0)
    ax.plot(dates, q50, color=color, linewidth=2)
    return q50


def fig_getting_started():
    import nowcastautogp_tpu as ngp

    rng = np.random.default_rng(3)
    n_train, horizon = 120, 8
    n = n_train + 2 + horizon
    dates = [dt.date(2022, 1, 3) + dt.timedelta(weeks=i) for i in range(n)]
    t = np.arange(n)
    truth = 800 * np.exp(0.15 * np.sin(2 * np.pi * t / 52)
                         + 0.6 * np.sin(2 * np.pi * t / 26 + 1.0) - 0.004 * t)
    obs = np.maximum(truth * np.exp(0.12 * rng.standard_normal(n)), 1.0)

    fwd, inv = ngp.get_transformations("boxcox", obs[:n_train])
    data = ngp.create_transformed_data(dates[:n_train], obs[:n_train],
                                       transformation=fwd)
    model = ngp.make_and_fit_model(
        data, n_particles=8, smc_data_proportion=0.1, n_mcmc=8, n_hmc=3,
        seed=7, config=ngp.GPConfig(max_depth=4))
    nc_dates = dates[n_train:n_train + 2]
    nc_draws = obs[n_train:n_train + 2] * rng.lognormal(0.1, 0.027, (40, 2))
    ncs = ngp.create_nowcast_data(list(nc_draws), nc_dates, transformation=fwd)
    f_dates = [nc_dates[-1] + dt.timedelta(weeks=i + 1)
               for i in range(horizon)]
    fc = ngp.forecast_with_nowcasts(model, ncs, f_dates, 25,
                                    inv_transformation=inv)

    fig, ax = plt.subplots(figsize=(7.6, 3.4), dpi=150)
    ax.plot(dates[:n_train + 2], obs[:n_train + 2], color=BLUE,
            linewidth=1.6, label="reported")
    _fan(ax, f_dates, fc, ORANGE)
    ax.plot([], [], color=ORANGE, linewidth=2,
            label="nowcast-conditioned forecast (50/90%)")
    ax.plot(dates[n_train + 2:], obs[n_train + 2:], "o", color=BLUE,
            markersize=4.5, markerfacecolor=SURFACE, markeredgewidth=1.4,
            label="held-out truth")
    ax.axvline(dates[n_train + 2], color=GRID, linewidth=1)
    ax.set_title("Nowcast-conditioned GP ensemble forecast "
                 "(getting-started pipeline)")
    ax.set_ylabel("weekly count")
    ax.xaxis.set_major_formatter(mdates.DateFormatter("%b %y"))
    ax.legend(loc="upper right", fontsize=8.5)
    fig.tight_layout()
    fig.savefig(os.path.join(OUT, "getting_started_forecast.png"))
    plt.close(fig)


def fig_acceptance():
    with open(os.path.join(REPO, "ACCEPTANCE_VIGNETTE.json")) as f:
        art = json.load(f)
    ratios = art["ratios"]
    order = ["naive", "leave_out_last", "nowcast", "nowcast_hmc",
             "nowcast_forecast_hmc"]
    labels = {
        "naive": "naive (no nowcast)",
        "leave_out_last": "leave out last week",
        "nowcast": "nowcast",
        "nowcast_hmc": "nowcast + HMC refresh",
        "nowcast_forecast_hmc": "nowcast + per-draw HMC",
    }
    vals = [ratios[k] for k in order]

    fig, ax = plt.subplots(figsize=(7.0, 2.9), dpi=150)
    y = np.arange(len(order))[::-1]
    ax.barh(y, vals, height=0.58, color=BLUE)
    for yi, v in zip(y, vals):
        ax.text(v + 0.02, yi, f"{v:.2f}", va="center", color=INK2,
                fontsize=9)
    ax.axvline(1.0, color=INK2, linewidth=1, linestyle=(0, (3, 2)))
    ax.set_yticks(y, [labels[k] for k in order])
    ax.set_xlim(0, max(vals) * 1.18)
    ax.set_xlabel("mean log-scale CRPS ratio vs best (lower is better)")
    ax.set_title("Five-approach acceptance: HMC-refreshed nowcasting "
                 "beats both baselines", loc="left")
    ax.grid(axis="y", visible=False)
    fig.tight_layout()
    fig.savefig(os.path.join(OUT, "acceptance_crps.png"))
    plt.close(fig)


def fig_decompose():
    import nowcastautogp_tpu as ngp

    rng = np.random.default_rng(5)
    n = 96
    dates = [dt.date(2022, 1, 3) + dt.timedelta(weeks=i) for i in range(n)]
    t = np.arange(n)
    y = (0.7 * np.sin(2 * np.pi * t / 26.0) + 0.012 * t
         + 0.08 * rng.standard_normal(n))
    data = ngp.create_transformed_data(dates, np.exp(4 + y),
                                       transformation=np.log)
    model = ngp.make_and_fit_model(
        data, n_particles=8, smc_data_proportion=0.2, n_mcmc=10, n_hmc=3,
        seed=13, config=ngp.GPConfig(max_depth=4))
    parts = [p for p in ngp.decompose(model, dates) if p["components"]]
    best = max(parts, key=lambda p: p["weight"])
    comps = best["components"][:3]

    fig, axes = plt.subplots(1, len(comps) + 1, figsize=(9.6, 2.7), dpi=150,
                             sharex=True)
    axes[0].plot(dates, data.y - np.mean(data.y), color=INK2, linewidth=1.3)
    axes[0].set_title("data (log, centered)", fontsize=9.5)
    for ax, comp in zip(axes[1:], comps):
        m, sd = comp["mean"], np.sqrt(comp["var"])
        ax.fill_between(dates, m - 2 * sd, m + 2 * sd, color=BLUE,
                        alpha=0.18, linewidth=0)
        ax.plot(dates, m, color=BLUE, linewidth=1.8)
        title = comp["structure"]
        ax.set_title(title if len(title) <= 34 else title[:31] + "...",
                     fontsize=8.5)
    for ax in axes:
        ax.xaxis.set_major_locator(mdates.MonthLocator(interval=6))
        ax.xaxis.set_major_formatter(mdates.DateFormatter("%b %y"))
        ax.tick_params(labelsize=7.5)
    fig.suptitle("decompose(): additive component posteriors of the "
                 f"top-weight particle — {best['structure'][:60]}",
                 fontsize=10, color=INK)
    fig.tight_layout(rect=(0, 0, 1, 0.92))
    fig.savefig(os.path.join(OUT, "decompose_components.png"))
    plt.close(fig)


def fig_changepoint():
    """Per-seed CP-discovery evidence from the committed TPU study
    artifact (no refit): weighted posterior CP mass appears only when
    changepoints are enabled, at no CRPS cost."""
    with open(os.path.join(REPO, "tools",
                           "changepoint_study_results.json")) as f:
        d = json.load(f)
    rows = d["rows"]
    seeds = [r["seed"] for r in rows]
    x = np.arange(len(rows))

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(8.6, 2.9), dpi=150)
    ax1.bar(x, [r["cp_mass"] for r in rows], width=0.55, color=BLUE)
    ax1.set_xticks(x, [f"seed {s}" for s in seeds], fontsize=8)
    ax1.set_ylabel("weighted CP-node mass")
    ax1.set_title("changepoints=True discovers CP structure\n"
                  "(=False is gated to exactly 0 on every seed)",
                  fontsize=9.5, loc="left")
    ax1.grid(axis="x", visible=False)

    w = 0.32
    ax2.bar(x - w / 2, [r["cp_log_crps"] for r in rows], width=w,
            color=BLUE, label="changepoints=True")
    ax2.bar(x + w / 2, [r["nocp_log_crps"] for r in rows], width=w,
            color=ORANGE, label="changepoints=False")
    ax2.set_xticks(x, [f"seed {s}" for s in seeds], fontsize=8)
    ax2.set_ylabel("log-scale CRPS (8-wk horizon)")
    ax2.set_title("...at no forecast-accuracy cost", fontsize=9.5,
                  loc="left")
    ax2.legend(fontsize=8)
    ax2.grid(axis="x", visible=False)
    fig.suptitle("Changepoint discovery on regime-shift data "
                 "(200 particles, tools/changepoint_study.py)",
                 fontsize=10, color=INK)
    fig.tight_layout(rect=(0, 0, 1, 0.90))
    fig.savefig(os.path.join(OUT, "changepoint_discovery.png"))
    plt.close(fig)


def fig_daily():
    import nowcastautogp_tpu as ngp

    sys.path.insert(0, os.path.join(REPO, "examples"))
    from daily_cadence import simulate_daily

    n_train, horizon = 120, 14
    dates, obs = simulate_daily(n_train + horizon)
    fwd, inv = ngp.get_transformations("boxcox", obs[:n_train])
    data = ngp.create_transformed_data(dates[:n_train], obs[:n_train],
                                       transformation=fwd)
    model = ngp.make_and_fit_model(
        data, n_particles=4, smc_data_proportion=0.25, n_mcmc=3, n_hmc=3,
        seed=3)
    fc = ngp.forecast(model, dates[n_train:], 300, inv_transformation=inv)

    fig, ax = plt.subplots(figsize=(7.6, 3.2), dpi=150)
    ax.plot(dates[:n_train], obs[:n_train], color=BLUE, linewidth=1.1,
            label="reported (daily)")
    _fan(ax, dates[n_train:], fc, ORANGE)
    ax.plot([], [], color=ORANGE, linewidth=2, label="forecast (50/90%)")
    ax.plot(dates[n_train:], obs[n_train:], "o", color=BLUE, markersize=3.6,
            markerfacecolor=SURFACE, markeredgewidth=1.2,
            label="held-out truth")
    ax.set_title("Daily cadence: weekday structure discovered by the "
                 "Periodic leaf", loc="left")
    ax.set_ylabel("daily count")
    ax.xaxis.set_major_formatter(mdates.DateFormatter("%d %b"))
    ax.legend(loc="upper left", fontsize=8.5)
    fig.tight_layout()
    fig.savefig(os.path.join(OUT, "daily_cadence_forecast.png"))
    plt.close(fig)


def main():
    os.makedirs(OUT, exist_ok=True)
    from nowcastautogp_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    for fn in (fig_acceptance, fig_changepoint, fig_getting_started,
               fig_decompose, fig_daily):
        fn()
        print(f"{fn.__name__} done", flush=True)


if __name__ == "__main__":
    main()
