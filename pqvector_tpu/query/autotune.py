"""Serving-plan autotuner: pick (mode, nprobe) for a recall target.

Productizes what bench.py does ad hoc: the searcher exposes many modes
whose recall/throughput trade differs by batch size, array shape, and —
through the tunnel — device weather. A deployment should not hand-pick;
it calibrates once against a representative query sample and serves the
measured winner.

Method (SURVEY §6 measurement discipline):
  1. Ground truth = the searcher's own exact top-k (device-exact; on a
     spilled layout still the true top-k — dedup preserves exactness).
  2. For each eligible mode: probed modes walk the nprobe grid upward
     until measured recall@k clears the target (recall is monotone in
     nprobe); full-scan modes (nprobe-free) get one recall measurement.
  3. Qualifying modes are timed with the chained ``search_loop`` (the
     honest-throughput path: per-dispatch tunnel overhead amortized over
     ``reps`` data-dependent iterations).
  4. Plans are ranked by QPS; ``autotune`` returns them all, best first.

The timer is injectable so the ranking logic is unit-testable without a
device clock.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

from ..errors import ValidationError

#: Modes the tuner considers, and whether nprobe shapes their recall.
#: "gather" is deliberately absent: it targets B=1..16 latency and has no
#: chained-loop path (search_loop raises on it), so a loop-throughput
#: ranking would mis-time it — measure it with single dispatches instead.
PROBED_MODES = ("masked", "pallas", "stream", "compact", "bincompact",
                "bincompact8")
SCAN_MODES = ("scan", "binscan", "xbin", "xbin8", "binscan8")
#: Modes excluded from the DEFAULT candidate set on real TPU hardware
#: until their Mosaic kernels are chip-validated (an invalid Pallas
#: kernel can wedge the chip for every later process — the round-1
#: lesson; same gate as bench.py's AUTO_CONTEST_MODES). Explicit
#: ``modes=(...)`` requests bypass this, as does interpret mode (CPU).
#: Flip PQVECTOR_INT8_PALLAS_VALIDATED=1 once
#: scripts/chip_session_r3n.py shows them clean on hardware.
UNVALIDATED_ON_TPU = ("binscan8", "bincompact8")


def _default_candidates():
    import os

    import jax

    if jax.default_backend() != "tpu" or os.environ.get(
        "PQVECTOR_INT8_PALLAS_VALIDATED", ""
    ).lower() not in ("", "0", "false"):
        return PROBED_MODES + SCAN_MODES
    return tuple(
        m for m in PROBED_MODES + SCAN_MODES if m not in UNVALIDATED_ON_TPU
    )


@dataclass(frozen=True)
class ServingPlan:
    """One calibrated serving configuration."""

    mode: str
    nprobe: int  # 0 for the nprobe-free scan modes
    recall: float
    qps: float
    batch: int
    k: int
    notes: str = ""


@dataclass
class AutotuneReport:
    """Ranked plans (best QPS first) + per-mode diagnostics."""

    plans: list[ServingPlan] = field(default_factory=list)
    rejected: dict[str, str] = field(default_factory=dict)

    @property
    def best(self) -> ServingPlan | None:
        return self.plans[0] if self.plans else None


def _recall_at_k(ids: np.ndarray, truth: np.ndarray) -> float:
    hits = sum(
        len(set(a.tolist()) & set(b.tolist()))
        for a, b in zip(np.asarray(ids), truth)
    )
    return hits / truth.size


def autotune(
    searcher,
    queries: np.ndarray,
    k: int = 10,
    recall_target: float = 0.95,
    nprobe_grid: tuple[int, ...] = (1, 2, 4, 8, 16, 32, 64),
    modes: tuple[str, ...] | None = None,
    reps: int = 4,
    budget_s: float = 2.0,
    timer=time.perf_counter,
) -> AutotuneReport:
    """Calibrate serving plans for ``searcher`` on ``queries``.

    ``modes=None`` considers every eligible mode. ``reps``/``budget_s``
    bound the timing loop per mode (chained reps per dispatch; wall-clock
    budget per mode). Raises ValidationError on an empty/ragged sample.
    """
    q = np.asarray(queries, np.float32)
    if q.ndim == 1:
        q = q[None, :]
    if q.ndim != 2 or not len(q):
        raise ValidationError("autotune needs a [B, d] query sample")

    truth_ids = np.asarray(searcher.exact(q, k)[1])
    report = AutotuneReport()

    candidates = modes if modes is not None else _default_candidates()
    for mode in candidates:
        try:
            plan = _tune_mode(
                searcher, mode, q, k, truth_ids, recall_target,
                nprobe_grid, reps, budget_s, timer,
            )
        except ValidationError as e:  # ineligible shape/k for this mode
            report.rejected[mode] = str(e)
            continue
        if plan is None:
            report.rejected[mode] = (
                f"recall target {recall_target} not reached"
            )
        else:
            report.plans.append(plan)
    report.plans.sort(key=lambda p: p.qps, reverse=True)
    return report


def _tune_mode(
    searcher, mode, q, k, truth_ids, recall_target, nprobe_grid,
    reps, budget_s, timer,
) -> ServingPlan | None:
    kc = searcher.index.n_clusters
    batch = len(q)
    if mode in SCAN_MODES:
        grid = (kc,)  # nprobe is ignored by the scan modes
    else:
        grid = tuple(p for p in sorted(set(nprobe_grid)) if p <= kc)
        if not grid or grid[-1] < kc:
            grid = grid + (kc,)  # always give full coverage a chance

    chosen = None
    recall = 0.0
    for nprobe in grid:
        if mode in ("bincompact", "bincompact8") and hasattr(
            searcher, "calibrate_bincompact"
        ):
            ct, _ = searcher.calibrate_bincompact(
                q, nprobe, k, esize=1 if mode == "bincompact8" else None
            )
            if not ct:
                raise ValidationError(f"{mode} ineligible for this shape")
        _, ids = searcher.search(q, k, max(nprobe, 1), mode=mode)
        recall = _recall_at_k(ids, truth_ids)
        if recall >= recall_target:
            chosen = nprobe
            break
    if chosen is None:
        return None

    # Throughput: chained loop, budget-bounded repeats.
    def run():
        _, ids = searcher.search_loop(
            q, k, max(chosen, 1), reps=reps, mode=mode
        )
        np.asarray(ids)  # materialize — proves execution through the tunnel

    run()  # warm-up/compile outside the timed window
    n = 0
    t0 = timer()
    while True:
        run()
        n += reps
        if timer() - t0 >= budget_s or n >= 8 * reps:
            break
    elapsed = max(timer() - t0, 1e-9)
    qps = n * batch / elapsed
    return ServingPlan(
        mode=mode,
        nprobe=0 if mode in SCAN_MODES else chosen,
        recall=recall,
        qps=qps,
        batch=batch,
        k=k,
        notes="nprobe-free full scan" if mode in SCAN_MODES else "",
    )
