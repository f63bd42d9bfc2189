"""Static-policy correctness tests for the fused-kernel VMEM machinery.

These are pure host-side unit tests (no device) over the three policy
pieces that, if wrong, produce silent numerical corruption or Mosaic OOMs
only reproducible on real TPU hardware:

* ``_dval_map`` — the shared walk-scratch plane allocation.  A collision
  between two concurrently-live planes would silently corrupt gradients,
  and only for heap shapes that exercise the reused plane; the test
  replays the exact walk liveness (``mega._node_fwd_body`` /
  ``_node_bwd_body`` read/write schedule) and asserts interval-disjoint
  plane reuse for every heap size the engine can configure.
* ``_chunk_for_lml`` / value-path chunking — chunk choices must respect
  the measured VMEM budget model at every (P, cap) combination the
  bucketed fit actually runs (a too-large C is an on-chip OOM crash).
* ``megalml_supported`` — the static support envelope must agree with the
  budget model (claiming support for an over-budget shape crashes at
  compile; under-claiming silently degrades to the composed path).
"""

import numpy as np
import pytest

from nowcastautogp_tpu.ops import pallas_megacov as mega
from nowcastautogp_tpu.ops import pallas_megalml as ml

HEAP_SIZES = [1, 3, 7, 15, 31, 63]


def _liveness_intervals(N):
    """Inclusive [start, end] backward-step liveness per walk plane.

    vals[k] lives from before backward step 0 (it was written by the
    forward walk) to its last read at backward step k (leaf-grad bodies
    read their own plane; parent reads at step (k-1)//2 happen earlier).
    dvals[j] is written during its parent's backward step (j-1)//2 (the
    root's seed happens before step 0) and last read at step j (the
    internal/CP bodies at step j also read-modify-write dvals of j's
    children, which have later intervals).
    """
    vals = {k: (0, k) for k in range(N)}
    dvals = {j: (max(0, (j - 1) // 2), j) for j in range(N)}
    return vals, dvals


@pytest.mark.parametrize("N", HEAP_SIZES)
def test_dval_map_no_live_collisions(N):
    dmap, n_pool = ml._dval_map(N)
    vals, dvals = _liveness_intervals(N)
    # plane assignment: vals[k] -> plane k, dvals[j] -> plane dmap[j]
    users = [(k, vals[k]) for k in range(N)]
    users += [(int(dmap[j]), dvals[j]) for j in range(N)]
    for step in range(N):
        live = [p for p, (a, b) in users if a <= step <= b]
        assert len(live) == len(set(live)), (
            f"N={N}: plane collision at backward step {step}: {sorted(live)}")


@pytest.mark.parametrize("N", HEAP_SIZES)
def test_dval_map_pool_bound(N):
    dmap, n_pool = ml._dval_map(N)
    # the docstring's guarantee: N + 3 planes instead of the naive 2N
    assert n_pool <= N + 3
    assert int(np.max(dmap)) < n_pool
    # peak concurrent liveness is a lower bound the pool must meet
    vals, dvals = _liveness_intervals(N)
    peak = max(
        sum(a <= s <= b for a, b in list(vals.values()) + list(dvals.values()))
        for s in range(N)
    )
    assert n_pool >= peak


# (P, n) combinations the engine actually runs: the bench/canonical fits
# (capacity-bucketed 32-granule caps at P in {24, 32, 200}) and the
# flattened nowcast-panel regime (S x P rows).
_FIT_COMBOS = [(P, n) for P in (24, 32, 200)
               for n in (32, 64, 96, 128, 160, 192, 256, 320, 416, 512)]
_PANEL_COMBOS = [(2000, 160), (1000, 192)]


@pytest.mark.parametrize("P,n", _FIT_COMBOS + _PANEL_COMBOS)
@pytest.mark.parametrize("N", [31, 63])
def test_chunk_for_lml_within_budget(P, n, N):
    if not ml.megalml_fits(N, n, P):
        pytest.skip("combo outside the fused-kernel launch envelope")
    C = ml._chunk_for_lml(n, N, P)
    assert 1 <= C <= 32
    per = ml._scratch_bytes_per_lane(n, N) + ml._blk_vmem_bytes(n, N)
    Pp = -(-P // C) * C
    assert C * per + ml._out_vmem_bytes(Pp, n, N) <= mega._VMEM_LIMIT, (
        f"C={C} at (P={P}, n={n}, N={N}) exceeds the VMEM budget model")


def test_megalml_fits_population_scaling():
    """The launch check is P-aware: staged output/operand terms scale with
    the padded population, so a depth-6 n=512 program fits at P=24 but
    must fall back to the composed path at P=200 (predicted OOM)."""
    assert ml.megalml_fits(63, 512, 24)
    assert not ml.megalml_fits(63, 512, 200)
    # the fit's dominant regimes and the flattened nowcast panel all fit
    assert ml.megalml_fits(31, 160, 200)
    assert ml.megalml_fits(31, 160, 2000)
    # (31, 512, 200) predicts 92 MB — inside the ~10 MB band where the
    # footprint model is known inexact, so the slacked gate rejects the
    # value+grad launch (ADVICE r3); the value-only variant still fits,
    # so value callers (reweight/predict) keep the fused kernel there.
    assert not ml.megalml_fits(31, 512, 200)
    assert ml.megalml_fits_val(31, 512, 200)
    # outside the static envelope it is False regardless of P
    assert not ml.megalml_fits(31, 544, 1)
    assert not ml.megalml_fits_val(31, 544, 1)


def test_fits_val_at_least_as_permissive():
    """The value-only footprint is a strict subset of the value+grad one,
    so at any shape the gates agree or only the val gate approves."""
    for N in (31, 63):
        for n in (32, 96, 160, 192, 256, 320, 416, 512):
            for P in (2, 24, 32, 200, 1000, 2000):
                if ml.megalml_fits(N, n, P):
                    assert ml.megalml_fits_val(N, n, P), (N, n, P)


@pytest.mark.parametrize("P", [2, 8, 24, 32])
@pytest.mark.parametrize("n", [96, 160])
def test_small_p_minimizes_grid_steps(P, n):
    """The small-ensemble branch trades VMEM for the fewest grid steps
    (serial latency dominates at small P) — the chosen C must achieve the
    smallest feasible grid among C <= 32."""
    N = 31
    C = ml._chunk_for_lml(n, N, P)
    per = ml._scratch_bytes_per_lane(n, N) + ml._blk_vmem_bytes(n, N)
    budget = ml._SLACKED_LIMIT

    def fits(c):
        Pp = -(-P // c) * c
        return c * per + ml._out_vmem_bytes(Pp, n, N) <= budget

    chosen_G = -(-P // C)
    feasible_G = min(
        -(-P // c) for c in range(1, min(P, 32) + 1) if fits(c))
    assert chosen_G == feasible_G


def test_megalml_supported_matches_budget_model():
    # the envelope's own examples: depth-5 and depth-6 heaps at n = 512
    # are inside (PLAN.md round-3), tiled sizes and sub-granule n are out
    assert ml.megalml_supported(31, 512)
    assert ml.megalml_supported(63, 512)
    assert not ml.megalml_supported(31, 544)   # > _MAX_LML_N
    assert not ml.megalml_supported(31, 16)    # below one chol granule
    assert not ml.megalml_supported(31, 100)   # not a 32-multiple
    assert not ml.megalml_supported(127, 160)  # heap beyond depth 6
    for N in (31, 63):
        for n in (32, 160, 256, 512):
            if ml.megalml_supported(N, n):
                assert ml._scratch_bytes_per_lane(n, N) <= (
                    mega._VMEM_LIMIT - 24 * 1024 * 1024)


def test_vag_chunk_capped_at_calibrated_ceiling():
    """Hardware calibration (tools/megalml_vmem_calibration.json): at
    n >= 352 the value+grad kernel's real footprint exceeds the model at
    multi-lane chunks (Mosaic VMEM OOM at the former policy's C=3-5),
    while C=1 compiled at every probed shape — the policy must pin C=1
    there.  The value-only variant's model held at its policy C."""
    for n in (320, 352, 416, 448, 512):
        for N in (31, 63):
            for P in (24, 200):
                assert ml._chunk_for_lml(n, N, P) == 1, (n, N, P)
    # below the calibrated ceiling the measured-optimum policy is intact
    assert ml._chunk_for_lml(160, 31, 200) == 8
    assert ml._chunk_for_lml(288, 31, 24) > 1
