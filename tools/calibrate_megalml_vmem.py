"""Hardware calibration of the fused-LML VMEM envelope at large n.

The daily-bench warm-up exposed a latent gap: ``megalml_fits(31, 512, 24)``
approved a value+grad launch (predicted 87.6 MB of the 90 MB slacked
budget) that Mosaic rejected with a hard VMEM OOM at compile — the
footprint model, calibrated against n=160 OOM dumps, is too optimistic at
large n.  This probe COMPILES (never executes) the fused value+grad and
value-only programs across the large-n shapes the capacity-bucketed daily
fits produce, at the chunk the policy picks and at C=1, and records
ok/OOM per shape.  The result backs the envelope cut in
``ops/pallas_megalml.py`` (``_VAG_CAL_MAX_N_MULTIC``).

Run on the TPU:   python tools/calibrate_megalml_vmem.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def probe(n, P, kind, depth=5, chunk=None):
    """Compile-only probe of one fused launch; returns 'ok' or the error."""
    import subprocess

    # each probe in a fresh subprocess: a failed remote compile can poison
    # the client session, and NGP_MEGALML_CHUNK is read at import
    env = dict(os.environ)
    if chunk:
        env["NGP_MEGALML_CHUNK"] = str(chunk)
    code = f"""
import sys; sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/ngp_jax_cache_tpu")
from nowcastautogp_tpu.models.config import GPConfig
from nowcastautogp_tpu.models.structures import sample_particle
from nowcastautogp_tpu.ops import pallas_megalml as ml
cfg = GPConfig(max_depth={depth})
rng = np.random.default_rng(0)
ts, ps, lns = zip(*(sample_particle(rng, cfg) for _ in range({P})))
types = jnp.asarray(np.stack(ts).astype(np.int32))
params = jnp.asarray(np.stack(ps).astype(np.float32))
x = jnp.asarray(np.broadcast_to(np.linspace(0, 1, {n}), ({P}, {n})).astype(np.float32))
diagv = jnp.ones(({P}, {n}), jnp.float32)
mask = jnp.ones(({P}, {n}), jnp.float32)
ym = jnp.asarray(rng.normal(size=({P}, {n})).astype(np.float32))
if {kind!r} == "vag":
    def f(p):
        c, gp, gd, al = ml._vag_call(types, p, diagv, mask, x, ym, False)
        return c
else:
    def f(p):
        return ml._val_call(types, p, diagv, mask, x, ym, False)
jax.jit(f).lower(params).compile()
print("COMPILED_OK")
"""
    try:
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=900)
        if "COMPILED_OK" in r.stdout:
            return "ok"
        tail = (r.stderr or r.stdout).strip().splitlines()
        oom = [ln for ln in tail if "memory space vmem" in ln]
        return "vmem_oom" if oom else f"error_rc{r.returncode}"
    except subprocess.TimeoutExpired:
        return "timeout"


def _model_chunk_vag(ml, n, N, P):
    """The footprint model's own chunk choice with the calibrated C=1 cap
    BYPASSED — so re-running the probe can still observe the multi-lane
    OOM class the cap guards against (the policy itself now returns 1 at
    n >= the cap, which would make the probe unfalsifiable)."""
    if P > 32:
        c = 16 if n <= 128 else 8
        while c > 1 and not ml._fits_vag(c, n, N, P):
            c //= 2
        return c
    for G in range(1, P + 1):
        c = -(-P // G)
        if c <= 32 and ml._fits_vag(c, n, N, P):
            return c
    return 1


def main() -> None:
    from nowcastautogp_tpu.ops import pallas_megalml as ml

    out = {"rows": []}
    # depth-5 heaps across the daily capacity segments, plus depth-6 at the
    # largest caps (the depth-6 envelope the policy tests pin)
    shapes = [(31, n, P) for n in (288, 352, 416, 448, 512)
              for P in (24, 200)]
    shapes += [(63, n, 24) for n in (448, 512)]
    for N, n, P in shapes:
        depth = 6 if N > 31 else 5
        for kind in ("vag", "val"):
            fits = (ml.megalml_fits if kind == "vag"
                    else ml.megalml_fits_val)(N, n, P)
            pick = (ml._chunk_for_lml if kind == "vag"
                    else ml._chunk_for_val)(n, N, P)
            row = {"N": N, "n": n, "P": P, "kind": kind,
                   "model_fits": fits, "policy_C": pick}
            if fits:
                row["compile"] = probe(n, P, kind, depth=depth, chunk=pick)
                if row["compile"] != "ok" and pick > 1:
                    row["compile_C1"] = probe(n, P, kind, depth=depth,
                                              chunk=1)
                if kind == "vag":
                    mc = _model_chunk_vag(ml, n, N, P)
                    if mc != pick:
                        row["model_C"] = mc
                        row["compile_modelC"] = probe(
                            n, P, kind, depth=depth, chunk=mc)
            out["rows"].append(row)
            print(json.dumps(row), flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "megalml_vmem_calibration.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
