"""Per-phase / per-leaf-body decomposition of the fused value+grad eval.

VERDICT r4 item 2: the roofline's single 3.9x aggregate (fused eval vs a
one-transcendental-pipeline floor, ``tools/roofline_results.json``) says
per-eval headroom exists but not WHERE.  This tool attributes the fused
``lml_core_fused`` value+grad eval time to its phases (Cholesky+inverse,
backward sweep) and to each node-walk body (forward and backward GE /
Periodic / Linear / internal / ChangePoint / leaf-exp shared work), by
timing the kernel with each body compiled OUT (env-driven ablation hooks:
``NGP_MEGALML_ABLATE`` = nochol|nobwd, ``NGP_MEGA_WALK_ABLATE`` =
comma-list of fleaf,fge,fper,flin,fint,fcp,bnonempty,bge,bper,blin,bint,
bcp — see ``ops/pallas_megacov.py``/``ops/pallas_megalml.py``).

Each measurement runs in a CHILD process (the ablation env is read at
kernel build), chained-scan timed (600 iters, tunnel overhead < 0.1%).
Two population regimes as in ``tools/latency_floor.py``: fully-duplicated
(gating lower bound) and P independent prior draws (diverse upper bound).

Writes ``tools/leaf_ablation_results.json``.  Run on the TPU:

    python tools/leaf_ablation.py [--caps 160] [--P 24]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ABLATIONS = {
    "full": {},
    "nochol": {"NGP_MEGALML_ABLATE": "nochol"},
    "nobwd": {"NGP_MEGALML_ABLATE": "nobwd"},
    "fwd_ge": {"NGP_MEGA_WALK_ABLATE": "fge"},
    "fwd_per": {"NGP_MEGA_WALK_ABLATE": "fper"},
    "fwd_lin": {"NGP_MEGA_WALK_ABLATE": "flin"},
    "fwd_int": {"NGP_MEGA_WALK_ABLATE": "fint"},
    "fwd_cp": {"NGP_MEGA_WALK_ABLATE": "fcp"},
    "fwd_leafexp": {"NGP_MEGA_WALK_ABLATE": "fleaf"},
    "bwd_amp": {"NGP_MEGA_WALK_ABLATE": "bnonempty"},
    "bwd_ge": {"NGP_MEGA_WALK_ABLATE": "bge"},
    "bwd_per": {"NGP_MEGA_WALK_ABLATE": "bper"},
    "bwd_lin": {"NGP_MEGA_WALK_ABLATE": "blin"},
    "bwd_int": {"NGP_MEGA_WALK_ABLATE": "bint"},
    "bwd_cp": {"NGP_MEGA_WALK_ABLATE": "bcp"},
    # whole-walk ablations: bound the walk's total share
    "fwd_allwalk": {"NGP_MEGA_WALK_ABLATE": "fleaf,fge,fper,flin,fint,fcp"},
    "bwd_allwalk": {
        "NGP_MEGA_WALK_ABLATE": "bnonempty,bge,bper,blin,bint,bcp"},
}


def child(P: int, cap: int, pop: str, iters: int) -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ngp_jax_cache_abl")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nowcastautogp_tpu.models.config import GPConfig
    from nowcastautogp_tpu.models.structures import sample_particle
    from nowcastautogp_tpu.ops import lml as lml_mod

    cfg = GPConfig(max_depth=5)
    rng = np.random.default_rng(0)
    ts, ps, lns = zip(*(sample_particle(rng, cfg) for _ in range(P)))
    if pop == "dup":
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
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(jnp.float32(1.0)))
        best = min(best, (time.perf_counter() - t0) / iters)
    print(json.dumps({"t_eval_ms": best * 1e3}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--P", type=int, default=24)
    ap.add_argument("--caps", type=int, nargs="+", default=[160])
    ap.add_argument("--cap", type=int, default=160)
    ap.add_argument("--pop", default="diverse")
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--ablations", nargs="+", default=list(ABLATIONS))
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "leaf_ablation_results.json"))
    args = ap.parse_args()

    if args.child:
        child(args.P, args.cap, args.pop, args.iters)
        return

    results: dict = {"P": args.P, "iters": args.iters}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results.update(json.load(f))
    for cap in args.caps:
        for pop in ("diverse", "dup"):
            key = f"cap{cap}_{pop}"
            row = dict(results.get(key, {}))
            for name in args.ablations:
                env = dict(os.environ, **ABLATIONS[name])
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--child",
                     "--P", str(args.P), "--cap", str(cap), "--pop", pop,
                     "--iters", str(args.iters)],
                    env=env, capture_output=True, text=True, timeout=900)
                line = out.stdout.strip().splitlines()[-1] if out.stdout \
                    else ""
                try:
                    t = json.loads(line)["t_eval_ms"]
                except Exception:
                    print(f"{key} {name}: FAILED\n{out.stderr[-2000:]}")
                    continue
                row[name] = round(t, 4)
                print(f"{key} {name}: {t:.3f} ms", flush=True)
                results[key] = row
                with open(args.out, "w") as f:
                    json.dump(results, f, indent=1)
                    f.write("\n")
    # derived shares vs the full eval
    for key, row in list(results.items()):
        if not isinstance(row, dict) or "full" not in row:
            continue
        full = row["full"]
        results[key + "_delta_ms"] = {
            n: round(full - t, 4) for n, t in row.items() if n != "full"}
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
