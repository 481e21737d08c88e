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
SCAN_MODES = ("scan", "binscan", "xbin", "xbin8", "binscan8", "tilescan")
#: Modes excluded from the DEFAULT candidate set on real TPU hardware
#: until their Mosaic kernels are chip-validated (an invalid Pallas
#: kernel can wedge the chip for every later process — the round-1
#: lesson; same gate as bench.py's AUTO_CONTEST_MODES). Explicit
#: ``modes=(...)`` requests bypass this, as does interpret mode (CPU).
#: Flip PQVECTOR_INT8_PALLAS_VALIDATED=1 — or let a clean
#: scripts/chip_session_r3n.py run persist scripts/.int8_pallas_validated
#: — once the kernels are shown clean on hardware.
UNVALIDATED_ON_TPU = ("binscan8", "bincompact8")
#: Cut from the DEFAULT candidates everywhere (round-4): measured 1.0-1.4%
#: of bf16 peak on chip — XLA materializes their packed grouped-min
#: epilogue instead of fusing it (sessions J/L/r4a/r4b). Explicit
#: ``modes=(...)`` requests still serve them.
DEPRIORITIZED = ("xbin", "xbin8", "tilescan")


def _int8_validated_on_hw() -> bool:
    import os

    # Three-state: an EXPLICIT '0'/'false' closes the gate even when the
    # committed marker exists (the operator is declaring this hardware
    # unvalidated); explicit truthy opens it; unset → marker check.
    env = os.environ.get("PQVECTOR_INT8_PALLAS_VALIDATED")
    if env is not None and env != "":
        return env.lower() not in ("0", "false")
    marker = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        os.pardir, os.pardir, "scripts", ".int8_pallas_validated",
    )
    if not os.path.exists(marker):
        return False
    # The marker records the validated device; a different hardware
    # generation re-validates (mismatched Mosaic kernels can wedge it).
    try:
        with open(marker) as f:
            text = f.read()
        import jax

        return str(jax.devices()) in text
    except Exception:
        return True


def _default_candidates():
    import jax

    cands = tuple(
        m for m in PROBED_MODES + SCAN_MODES if m not in DEPRIORITIZED
    )
    if jax.default_backend() != "tpu" or _int8_validated_on_hw():
        return cands
    return tuple(m for m in cands if m not in UNVALIDATED_ON_TPU)


@dataclass(frozen=True)
class WeatherReport:
    """Result of :func:`probe_weather` — a cheap device-window health check.

    Round-3 on-chip finding (docs/PERFORMANCE.md §Round-3-continuation 1):
    degraded tunnel windows slow the ApproxTopK (PartialReduce) extraction
    ~5× while the raw matmul+min floor holds ~75% MFU, so a plan calibrated
    by :func:`autotune` in a healthy window (typically ``mode="scan"``) can
    silently lose to the fused binned-min family when the weather turns.
    ``extract_frac`` is the extraction loop's throughput as a fraction of
    the floor loop's on the SAME array in the SAME window: ~0.5 healthy,
    ~0.17 degraded (measured at B=4096, 1M×128). ``degraded`` compares it
    against the caller's threshold.
    """

    floor_qps: float  #: matmul+min chained-loop QPS (the hardware floor)
    extract_qps: float  #: matmul+ApproxTopK chained-loop QPS
    extract_frac: float  #: extract_qps / floor_qps
    degraded: bool  #: extract_frac < degraded_below
    batch: int
    k: int


def probe_weather(
    searcher,
    queries: np.ndarray,
    k: int = 10,
    *,
    reps: int = 25,
    budget_s: float = 2.0,
    degraded_below: float = 0.25,
    timer=time.perf_counter,
) -> WeatherReport:
    """Time the matmul+min floor vs the ApproxTopK extraction on the
    searcher's resident array and classify the window.

    Serving deployments run this between :func:`autotune` calibrations: if
    ``degraded`` flips while the floor holds, the window (not the code or
    the data) changed, and plans built on PartialReduce extraction
    (``mode="scan"``) should yield to the fused binned-min family
    (``binscan``/``xbin``) until the next probe clears. Costs two small
    jits + ~2×``budget_s`` of device time; both loops chain ``reps``
    data-dependent iterations per dispatch so per-dispatch tunnel overhead
    cannot masquerade as compute (CLAUDE.md timing discipline).
    """
    import functools

    import jax
    import jax.numpy as jnp

    q = np.asarray(queries, np.float32)
    if q.ndim == 1:
        q = q[None, :]
    if q.ndim != 2 or not len(q):
        raise ValidationError("probe_weather needs a [B, d] query sample")
    if k < 1:
        raise ValidationError("k must be >= 1")
    emb_dim = int(searcher.emb.shape[1])
    if q.shape[1] != emb_dim:
        raise ValidationError(
            f"query dim {q.shape[1]} != index dim {emb_dim}"
        )

    @functools.partial(jax.jit, static_argnames=("reps", "k", "extract"))
    def loop(q0, e, s, reps, k, extract):
        def step(carry, _):
            qf = (q0 + carry).astype(e.dtype)
            scores = s[None, :] - 2.0 * jnp.dot(
                qf, e.T, preferred_element_type=jnp.float32
            )
            if extract:
                vals, _ = jax.lax.approx_min_k(scores, k=k)
                out = vals[:, 0]
            else:
                out = jnp.min(scores, axis=1)
            # Chain on every query's output: depending only on out[0]
            # lets XLA slice the batch (the session-r4a DCE hole).
            return 0.0 * jnp.sum(out), out[:1]

        _, ys = jax.lax.scan(step, jnp.float32(0), None, length=reps)
        return ys[-1]

    qd = jnp.asarray(q)
    sq = searcher._pallas_emb_sq()  # finite pad (inf poisons min/ApproxTopK)

    def timed(extract: bool) -> float:
        # Warm with the SAME static reps as the timed calls: a different
        # warm value leaves the timed executable uncompiled (CLAUDE.md).
        np.asarray(loop(qd, searcher.emb, sq, reps, k, extract))
        n = 0
        t0 = timer()
        while True:
            np.asarray(loop(qd, searcher.emb, sq, reps, k, extract))
            n += reps
            if timer() - t0 >= budget_s or n >= 16 * reps:
                break
        return n * len(q) / max(timer() - t0, 1e-9)

    floor = timed(False)
    extract = timed(True)
    frac = extract / max(floor, 1e-9)
    return WeatherReport(
        floor_qps=floor,
        extract_qps=extract,
        extract_frac=frac,
        degraded=frac < degraded_below,
        batch=len(q),
        k=k,
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
