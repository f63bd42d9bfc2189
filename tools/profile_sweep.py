"""Profile the real rejuvenation sweep program and aggregate device op time.

The microbench says the LML vgrad is ~16 ms at cap 160, but swapping a
2.5x-faster Cholesky core (chol_mxu) into the bench moved nothing — so the
fit program's time must live elsewhere.  This captures a jax.profiler trace
of one `rejuvenation_sweep` call at bench shapes and sums device-side op
durations by HLO category from the perfetto trace.

Usage: python tools/profile_sweep.py [--cap 160] [--p 200] [--mcmc 14]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=160)
    ap.add_argument("--active", type=int, default=150)
    ap.add_argument("--p", type=int, default=200)
    ap.add_argument("--mcmc", type=int, default=14)
    ap.add_argument("--hmc", type=int, default=5)
    ap.add_argument("--leapfrog", type=int, default=5)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--nosort", action="store_true",
                    help="disable megacov structure-sorted chunking")
    ap.add_argument("--dup", type=int, default=0,
                    help="draw particles from this many distinct structures "
                         "(0 = all distinct), the post-resample regime")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/ngp_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nowcastautogp_tpu.inference.device_smc import rejuvenation_sweep
    from nowcastautogp_tpu.models.config import GPConfig
    from nowcastautogp_tpu.models.structures import sample_particle
    from nowcastautogp_tpu.models.structures_device import (
        ancestor_table, config_arrays,
    )
    from nowcastautogp_tpu.ops.lml import gp_lml_batch

    if args.nosort:
        from nowcastautogp_tpu.ops.pallas_megacov import set_sort_chunks

        set_sort_chunks(False)

    cfg = GPConfig(max_depth=args.depth)
    ca = config_arrays(cfg)
    anc = jnp.asarray(ancestor_table(cfg.max_nodes))
    rng = np.random.default_rng(0)
    P, cap = args.p, args.cap
    if args.dup:
        base = [sample_particle(rng, cfg) for _ in range(args.dup)]
        parts = [base[i] for i in rng.integers(0, args.dup, size=P)]
    else:
        parts = [sample_particle(rng, cfg) for _ in range(P)]
    types = jnp.asarray(np.stack([p[0] for p in parts]).astype(np.int32))
    params = jnp.asarray(np.stack([p[1] for p in parts]).astype(np.float32))
    ln = jnp.asarray(np.full(P, -2.0, np.float32))
    x = jnp.broadcast_to(jnp.linspace(0, 1, cap), (P, cap)).astype(jnp.float32)
    y = jnp.sin(7 * x) + 0.1 * jnp.cos(19 * x)
    mask = jnp.broadcast_to(
        (jnp.arange(cap) < args.active).astype(jnp.float32), (P, cap))
    lml0 = gp_lml_batch(types, params, ln, x, y, mask)
    key = jax.random.PRNGKey(0)

    def run():
        out = rejuvenation_sweep(
            types, params, ln, lml0, x, y, mask, key, ca, anc,
            n_mcmc=args.mcmc, n_hmc=args.hmc, n_leapfrog=args.leapfrog,
            step_size=0.02, step_jitter=0.5)
        jax.block_until_ready(out)
        return out

    run()  # compile + warm
    import time

    t0 = time.perf_counter()
    run()
    wall = time.perf_counter() - t0
    print(f"sweep wall (warm): {wall*1e3:.0f} ms "
          f"({args.mcmc} moves x (1 + {args.hmc}x{args.leapfrog}) grads)")

    log_dir = "/tmp/ngp_profile_sweep"
    os.system(f"rm -rf {log_dir}")
    jax.profiler.start_trace(log_dir)
    run()
    jax.profiler.stop_trace()

    traces = glob.glob(
        os.path.join(log_dir, "**", "*.trace.json.gz"), recursive=True)
    if not traces:
        print("no trace captured (profiler unsupported on this platform?)")
        return
    with gzip.open(traces[0], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name" and "args" in e}
    tid_names = {(e["pid"], e["tid"]): e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "thread_name" and "args" in e}
    # per-lane totals so the nesting structure is visible
    lane_tot = collections.Counter()
    for e in events:
        if e.get("ph") != "X":
            continue
        lane = (pid_names.get(e.get("pid"), "?"),
                tid_names.get((e.get("pid"), e.get("tid")), "?"))
        lane_tot[lane] += e.get("dur", 0)
    print("== lane totals ==")
    for (p, t), dur in lane_tot.most_common(12):
        print(f"{dur/1e3:9.2f} ms   {p} / {t}")
    # EXCLUSIVE leaf-op times on the XLA Ops lanes.  Control-flow ops
    # (`while`, `conditional`, fusions containing calls) are emitted as
    # spans that COVER their body ops on the same lane, and nested scans
    # stack several levels deep — summing raw durations double-counts
    # every level (this misled round 3: "megacov = 65% of the sweep" was
    # an artifact; the chained-scan A/B showed the XLA Cholesky latency
    # dominated).  Per lane, sort spans by (start, -dur) and subtract each
    # span's direct-children total from its own duration.
    by_name = collections.Counter()
    per_lane = collections.defaultdict(list)
    for e in events:
        if e.get("ph") != "X":
            continue
        tname = tid_names.get((e.get("pid"), e.get("tid")), "")
        if "XLA Ops" not in tname:
            continue
        per_lane[(e["pid"], e["tid"])].append(e)
    dur_total = 0.0
    for lane_events in per_lane.values():
        lane_events.sort(key=lambda e: (e.get("ts", 0), -e.get("dur", 0)))
        stack = []  # (end_ts, child_total_accumulator index into rec)
        rec = []    # [name, dur, child_total]
        for e in lane_events:
            ts, dur = e.get("ts", 0), e.get("dur", 0)
            base = e.get("name", "?").split(".")[0].split("(")[0]
            while stack and ts >= stack[-1][0]:
                stack.pop()
            if stack:
                rec[stack[-1][1]][2] += dur
            rec.append([base, dur, 0.0])
            stack.append((ts + dur, len(rec) - 1))
        for base, dur, child in rec:
            excl = max(dur - child, 0.0)
            by_name[base] += excl
            dur_total += excl
    print(f"== XLA Ops exclusive total: {dur_total/1e3:.1f} ms ==")
    for name, dur in by_name.most_common(30):
        print(f"{dur/1e3:9.2f} ms  {100*dur/max(dur_total,1):5.1f}%  {name}")


if __name__ == "__main__":
    main()
