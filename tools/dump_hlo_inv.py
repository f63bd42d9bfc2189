"""Diagnose the composed chol_static penalty: HLO instruction histograms.

Lowers the composed (megacov -> A -> core) forward for the 'inv' and
'inv_st' cores and prints per-opcode instruction counts plus every copy /
transpose / bitcast with shapes, so the ~10 ms composed-only overhead of the
static recursion can be attributed.

Usage: python tools/dump_hlo_inv.py [--cap 192] [--p 200] [--grad]
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--cap", type=int, default=192)
    ap.add_argument("--p", type=int, default=200)
    ap.add_argument("--active", type=int, default=150)
    ap.add_argument("--grad", action="store_true")
    args = ap.parse_args()

    from nowcastautogp_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from nowcastautogp_tpu.models.config import GPConfig
    from nowcastautogp_tpu.models.structures import sample_particle
    from nowcastautogp_tpu.ops import lml as lml_mod
    from nowcastautogp_tpu.ops import pallas_megacov as mega
    from nowcastautogp_tpu.ops.chol_static import (
        cholesky_static, solve_lower_static)
    from tools.microbench_inv import _make_inv_core, _inv_fwd_trtri

    HI = jax.lax.Precision.HIGHEST
    cfg = GPConfig(max_depth=args.depth)
    rng = np.random.default_rng(0)
    P, cap = args.p, args.cap
    ts, ps, lns = [], [], []
    for _ in range(P):
        t, p, ln = sample_particle(rng, cfg)
        ts.append(t), ps.append(p), lns.append(ln)
    types = jnp.asarray(np.stack(ts).astype(np.int32))
    params = jnp.asarray(np.stack(ps).astype(np.float32))
    log_noise = jnp.asarray(np.asarray(lns, np.float32))
    x = jnp.broadcast_to(jnp.linspace(0, 1, cap), (P, cap)).astype(jnp.float32)
    y = jnp.sin(7 * x) + 0.1 * jnp.cos(19 * x)
    mask = jnp.broadcast_to(
        (jnp.arange(cap) < args.active).astype(jnp.float32), (P, cap))
    ym = y * mask

    def _inv_fwd_static(A):
        L = cholesky_static(A)
        n = A.shape[-1]
        eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
        Linv = solve_lower_static(L, eye)
        Ainv = jnp.einsum("pki,pkj->pij", Linv, Linv, precision=HI)
        logdet = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
        return Ainv, logdet

    cores = {
        "inv": _make_inv_core(_inv_fwd_trtri),
        "inv_st": _make_inv_core(_inv_fwd_static),
    }

    def make_lml(core):
        def lml(p_, ln_):
            K = mega.cov_batched_fused(types, p_, x)
            mm = mask[:, :, None] * mask[:, None, :]
            noise = jnp.exp(ln_)
            diag = mask * (noise[:, None] + 1e-5) + (1.0 - mask)
            A = K * mm + diag[:, :, None] * jnp.eye(cap, dtype=K.dtype)
            n_active = jnp.sum(mask, axis=-1)
            out = core(A, ym) - 0.5 * n_active * lml_mod.LOG_2PI
            return jnp.sum(jnp.where(jnp.isfinite(out), out, -1e10))
        return lml

    for name, core in cores.items():
        f = make_lml(core)
        if args.grad:
            f = jax.value_and_grad(f, argnums=(0, 1))
        compiled = jax.jit(f).lower(params, log_noise).compile()
        txt = compiled.as_text()
        # opcode histogram over the entry computation and all fusions
        ops = collections.Counter()
        big_copies = []
        for line in txt.splitlines():
            m2 = re.match(
                r"\s*(?:ROOT )?%?[\w.\-]+ = (\S+?)\s+(\w+)\(", line.strip())
            if m2:
                opcode = m2.group(2)
                ops[opcode] += 1
                if opcode in ("copy", "transpose", "bitcast",
                              "all-reduce") or "custom-call" in opcode:
                    shape = m2.group(1)
                    if "f32[" in shape:
                        dims = re.findall(r"f32\[([\d,]*)\]", shape)
                        sz = 1
                        for d in (dims[0].split(",") if dims and dims[0]
                                  else []):
                            sz *= int(d)
                        if sz >= 1 << 20:
                            big_copies.append(f"  {opcode:10s} {shape}")
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            extra = (f"  flops={ca.get('flops', 0):.3g}  "
                     f"bytes={ca.get('bytes accessed', 0):.3g}")
        except Exception:
            extra = ""
        print(f"== {name} =={extra}")
        interesting = {k: v for k, v in ops.items() if k in (
            "fusion", "copy", "transpose", "bitcast", "while", "custom-call",
            "dot", "cholesky", "triangular-solve", "dynamic-slice",
            "dynamic-update-slice", "slice", "concatenate", "pad")}
        for k in sorted(interesting):
            print(f"  {k:20s} {interesting[k]}")
        if big_copies:
            print("  -- copies/transposes >=1MiB --")
            for s in big_copies[:40]:
                print(s)
        print(f"  total instructions: {sum(ops.values())}", flush=True)


if __name__ == "__main__":
    main()
