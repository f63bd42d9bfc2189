"""Move-mixing study: 2-move vs 3-move (birth/death) proposal mixtures.

Extends the round-2 study (PLAN.md "Move-mixing study") that measured
subtree-regeneration-only vs the 50/50 +leaf-swap mixture on a
Times(Linear, Periodic) amplitude-growing signal.  The round-3 question:
does the reversible birth/death dimension move — which grows/prunes
structure around a learned subtree *without* destroying its parameters —
lift composite-structure recovery further?

Metric, as in round 2: pooled weighted fraction of particles whose tree
contains BOTH a Linear and a Periodic component, plus the structure-move
acceptance rate.  The mixture is controlled by patching
``models.structures_device.MOVE_PROBS`` (device engine) before fitting.

Usage: python tools/mixing_study.py [--seeds 4] [--particles 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MIXTURES = {
    "regen_only": (1.0, 0.0, 0.0),
    "two_move_50_50": (0.5, 0.5, 0.0),
    "three_move_40_30_30": (0.4, 0.3, 0.3),
}


def _series(n=72, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    y = (0.5 + 0.03 * t) * np.sin(2 * np.pi * t / 12.0) + 2.0 + 0.01 * t
    y += 0.1 * rng.standard_normal(n)
    return np.exp(y)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=4)
    ap.add_argument("--particles", type=int, default=8)
    ap.add_argument("--n-mcmc", type=int, default=12)
    ap.add_argument("--n-hmc", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "mixing_study_results.json"))
    args = ap.parse_args()

    from nowcastautogp_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import datetime as dt

    import nowcastautogp_tpu as ngp
    from nowcastautogp_tpu.models import structures_device as sd
    from nowcastautogp_tpu.models.structures import LINEAR, PERIODIC

    vals = _series()
    dates = [dt.date(2022, 1, 3) + dt.timedelta(weeks=i)
             for i in range(len(vals))]
    data = ngp.create_transformed_data(dates, vals, transformation=np.log)

    results = {}
    for name, probs in MIXTURES.items():
        sd.MOVE_PROBS = probs  # device AND host mixtures read this
        num = den = 0.0
        for s in range(args.seeds):
            m = ngp.make_and_fit_model(
                data, n_particles=args.particles, smc_data_proportion=0.34,
                n_mcmc=args.n_mcmc, n_hmc=args.n_hmc, seed=100 + s)
            w = np.exp(m.log_weight - m.log_weight.max())
            w /= w.sum()
            has_both = np.array(
                [np.any(tt == PERIODIC) and np.any(tt == LINEAR)
                 for tt in m._host_types], dtype=float)
            num += float((w * has_both).sum())
            den += 1.0
        results[name] = {"recovery_both": round(num / den, 4),
                         "move_probs": probs}
        print(f"{name:22s} recovery {num / den:.3f}", flush=True)

    with open(args.out, "w") as f:
        json.dump({"metric": "weighted fraction with Linear AND Periodic",
                   "seeds": args.seeds, "n_particles": args.particles,
                   "budget": f"{args.n_mcmc}x{args.n_hmc}",
                   "results": results}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
