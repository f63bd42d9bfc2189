"""Latency-floor analysis for the reference's documented fit workloads
(VERDICT r3 item 3's "state what binds" arm).

A fit's rejuvenation work is an inherently SEQUENTIAL chain: each
structure move's accept needs the previous move's state, and each HMC
leapfrog step needs the previous gradient.  So the wall-clock floor of a
fit is

    sum over capacity segments of
        n_evals(segment) x t_eval(P, cap_segment)

where ``n_evals`` is the exact gradient-evaluation count of the engine's
accounting (``utils/flops.py``: per step with HMC, ``1 + n_mcmc x (1 +
n_hmc x n_leapfrog)`` gradient evaluations plus 1 forward) and
``t_eval`` is the MEASURED fused value+grad eval time at that (P, cap)
on this chip (chained-scan timing, tools/microbench_megalml.py
methodology, 600 iterations per program so the ~30-50 ms per-execution
tunnel overhead contributes < 0.1 ms/eval — at 20 iterations it
dominated small-shape evals and produced a "floor" 4.6x the measured
fit, which is how the overhead was diagnosed).  Two population regimes
bracket the fit: a fully-duplicated population (activity gating skips
every unused node slot — the LOWER bound ``floor_s``) and P independent
prior draws (maximally diverse — ``diverse_chain_s``); real fits sit
between because resampling concentrates structures.  No batching axis remains to hide this latency: at P = 24
or 32 the chip is mostly idle inside each eval, and the only way to go
faster is a faster eval or fewer of them.

Writes ``tools/latency_floor_results.json`` with, per config: the
per-segment eval counts and measured per-eval times (both population
regimes), the bracketing ``floor_s`` / ``diverse_chain_s``, the measured
fit median from ``canonical_study_results.json``, and
``measured_inside_bracket`` (the fit IS its sequential eval chain; an
explicit envelope statement follows from the floor alone).

Run on the TPU:   python tools/latency_floor.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

CONFIGS = {
    "24p_50x50_lf5": dict(P=24, n_mcmc=50, n_hmc=50, n_leapfrog=5,
                          proportion=0.1),
    "24p_100x20_lf5": dict(P=24, n_mcmc=100, n_hmc=20, n_leapfrog=5,
                           proportion=0.1),
    "32p_200x50_adaptive_lf5": dict(P=32, n_mcmc=200, n_hmc=50, n_leapfrog=5,
                                    proportion=1.0 / 150, adaptive=True),
    "200p_14x5_lf5": dict(P=200, n_mcmc=14, n_hmc=5, n_leapfrog=5,
                          proportion=0.1),
}
N_TRAIN = 150  # the bench/canonical series length


def _time_vgrad(P, cap, iters=600, reps=3, duplicated=False):
    """Measured per-eval seconds of the fused value+grad at (P, cap).

    ``duplicated=True`` times a fully-DUPLICATED population (every lane
    the same structure): the chunk activity gating then skips every
    unused node slot, which is the cheapest population the fit can see —
    a true per-eval LOWER bound.  ``False`` times P independent prior
    draws (maximally diverse — the upper bound).  Real fits sit between:
    resampling concentrates structures as annealing proceeds.
    """
    from jax import lax

    from nowcastautogp_tpu.models.config import GPConfig
    from nowcastautogp_tpu.models.structures import sample_particle
    from nowcastautogp_tpu.ops import lml as lml_mod

    cfg = GPConfig(max_depth=5)
    rng = np.random.default_rng(0)
    ts, ps, lns = zip(*(sample_particle(rng, cfg) for _ in range(P)))
    if duplicated:
        ts = (ts[0],) * P
        ps = (ps[0],) * P
    types = jnp.asarray(np.stack(ts).astype(np.int32))
    params = jnp.asarray(np.stack(ps).astype(np.float32))
    log_noise = jnp.asarray(np.asarray(lns, np.float32))
    x = jnp.asarray(np.broadcast_to(
        np.linspace(0, 1, cap), (P, cap)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(P, cap)).astype(np.float32))
    mask = jnp.ones((P, cap), jnp.float32)

    def lml_sum(p_):
        return jnp.sum(lml_mod.gp_lml_batched(
            types, p_, log_noise, x, y, mask))

    @jax.jit
    def chain(seed):
        def body(carry, _):
            v, g = jax.value_and_grad(lml_sum)(params * (1.0 + 1e-6 * carry))
            return jnp.tanh(v * 1e-3 + jnp.sum(g) * 1e-6), None

        c, _ = lax.scan(body, seed, None, length=iters)
        return c

    float(chain(jnp.float32(1.0)))  # compile
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chain(jnp.float32(1.0)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/tmp/ngp_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nowcastautogp_tpu.inference.schedule import linear_schedule
    from nowcastautogp_tpu.inference.smc import schedule_segments

    here = os.path.dirname(os.path.abspath(__file__))
    measured = {}
    canon_path = os.path.join(here, "canonical_study_results.json")
    if os.path.exists(canon_path):
        with open(canon_path) as f:
            measured = json.load(f)

    t_lo: dict = {}
    t_hi: dict = {}
    out = {"n_train": N_TRAIN, "configs": {}}
    for name, c in CONFIGS.items():
        prop = max(c["proportion"], 1.0 / N_TRAIN)
        schedule = linear_schedule(N_TRAIN, prop)
        cap_full = max(64, int(np.ceil(N_TRAIN / 32)) * 32)
        segs = []
        floor_lo = floor_hi = 0.0
        for cap, steps in schedule_segments(schedule, cap_full):
            key = (c["P"], cap)
            if key not in t_lo:
                t_lo[key] = _time_vgrad(*key, duplicated=True)
                t_hi[key] = _time_vgrad(*key)
                print(f"t_eval(P={key[0]}, cap={key[1]}) = "
                      f"{t_lo[key]*1e3:.2f} (dup) / "
                      f"{t_hi[key]*1e3:.2f} (diverse) ms", flush=True)
            evals = len(steps) * (
                1 + c["n_mcmc"] * (1 + c["n_hmc"] * c["n_leapfrog"]))
            floor_lo += evals * t_lo[key]
            floor_hi += evals * t_hi[key]
            segs.append({"cap": cap, "steps": len(steps), "evals": evals,
                         "t_eval_dup_ms": round(t_lo[key] * 1e3, 3),
                         "t_eval_diverse_ms": round(t_hi[key] * 1e3, 3)})
        row = {"segments": segs, "floor_s": round(floor_lo, 1),
               "diverse_chain_s": round(floor_hi, 1)}
        if c.get("adaptive"):
            # adaptive_rejuvenation: sweeps fire only when ESS < 50%, so
            # the all-steps numbers above are upper bounds.  The binding
            # quantity is the SEQUENTIAL cost of ONE sweep at full cap —
            # measured totals / per-sweep floor ~= sweeps actually fired.
            per_sweep = c["n_mcmc"] * (1 + c["n_hmc"] * c["n_leapfrog"])
            row["all_steps_numbers_are_upper_bounds"] = True
            row["per_sweep_evals"] = per_sweep
            row["per_sweep_floor_s"] = round(
                per_sweep * t_lo[(c["P"], cap_full)], 1)
        rows = measured.get(name)
        if isinstance(rows, list) and rows:
            med = float(np.median([r["fit_s"] for r in rows]))
            row["measured_median_s"] = round(med, 1)
            if not c.get("adaptive"):
                # the fit IS its sequential eval chain iff measured lands
                # inside [duplicated-pop floor, diverse-pop chain cost]
                # (10% slack on the diverse side: chain estimates carry
                # per-eval measurement noise).  Meaningless for adaptive
                # configs, whose all-steps totals are upper bounds.
                row["measured_inside_bracket"] = bool(
                    floor_lo <= med <= floor_hi * 1.1)
        row["floor_inside_60s_envelope"] = floor_lo < 60.0
        out["configs"][name] = row
        print(json.dumps({name: row}), flush=True)

    path = os.path.join(here, "latency_floor_results.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
