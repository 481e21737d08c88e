"""Serving-plan autotuner (query/autotune.py): recall gating, nprobe
walk, ranking, and rejection bookkeeping — all against the CPU backend
with an injected deterministic timer."""

import numpy as np
import pytest

from pqvector_tpu import IvfBuildConfig, build_ivf_index
from pqvector_tpu.errors import ValidationError
from pqvector_tpu.query.autotune import AutotuneReport, autotune
from pqvector_tpu.query.device import DeviceIvfSearcher
from pqvector_tpu.types import Embeddings


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    centers = 6.0 * rng.standard_normal((12, 16)).astype(np.float32)
    x = (centers[rng.integers(0, 12, 1500)]
         + rng.standard_normal((1500, 16))).astype(np.float32)
    index = build_ivf_index(
        Embeddings(x, 16), IvfBuildConfig(n_clusters=12, seed=0)
    )
    searcher = DeviceIvfSearcher(index, x, cluster_sorted=True)
    q = (x[rng.integers(0, 1500, 24)]
         + 0.3 * rng.standard_normal((24, 16))).astype(np.float32)
    return searcher, q


class FakeTimer:
    """Deterministic clock: each call advances a fixed step."""

    def __init__(self, step=1.0):
        self.t = 0.0
        self.step = step

    def __call__(self):
        self.t += self.step
        return self.t


def test_autotune_finds_plans(setup):
    searcher, q = setup
    report = autotune(
        searcher, q, k=5, recall_target=0.9,
        modes=("masked", "gather"), reps=2, budget_s=0.5,
        timer=FakeTimer(),
    )
    assert isinstance(report, AutotuneReport)
    assert report.best is not None
    assert {p.mode for p in report.plans} <= {"masked", "gather"}
    for p in report.plans:
        assert p.recall >= 0.9
        assert p.nprobe >= 1
        assert p.qps > 0
    # ranked best-first
    qps = [p.qps for p in report.plans]
    assert qps == sorted(qps, reverse=True)


def test_autotune_nprobe_walk_is_minimal(setup):
    """The chosen nprobe is the smallest grid value clearing the target:
    a looser target must never pick a larger nprobe."""
    searcher, q = setup
    loose = autotune(
        searcher, q, k=5, recall_target=0.5, modes=("masked",),
        reps=2, budget_s=0.5, timer=FakeTimer(),
    ).best
    tight = autotune(
        searcher, q, k=5, recall_target=0.98, modes=("masked",),
        reps=2, budget_s=0.5, timer=FakeTimer(),
    ).best
    assert loose is not None and tight is not None
    assert loose.nprobe <= tight.nprobe
    assert tight.recall >= 0.98


def test_autotune_scan_modes_are_nprobe_free(setup):
    searcher, q = setup
    report = autotune(
        searcher, q, k=5, recall_target=0.5, modes=("scan",),
        reps=2, budget_s=0.5, timer=FakeTimer(),
    )
    assert report.best is not None
    assert report.best.nprobe == 0
    assert "full scan" in report.best.notes


def test_autotune_rejects_unreachable_target(setup):
    searcher, q = setup
    report = autotune(
        searcher, q, k=5, recall_target=1.01, modes=("masked",),
        reps=2, budget_s=0.5, timer=FakeTimer(),
    )
    assert report.best is None
    assert "masked" in report.rejected


def test_autotune_rejects_ineligible_mode(setup):
    """stream mode requires k <= 128; k=200 must land in rejected with
    the ValidationError text, not crash the tuner."""
    searcher, q = setup
    report = autotune(
        searcher, q, k=200, recall_target=0.5, modes=("stream", "masked"),
        reps=2, budget_s=0.5, timer=FakeTimer(),
    )
    assert "stream" in report.rejected
    assert any(p.mode == "masked" for p in report.plans)


def test_autotune_validates_queries(setup):
    searcher, _ = setup
    with pytest.raises(ValidationError, match="query sample"):
        autotune(searcher, np.zeros((0, 16), np.float32))


def test_autotune_spilled_searcher(setup):
    """The tuner runs unchanged on a spilled layout (exact ground truth
    stays the true top-k through the dedup)."""
    _, q = setup
    # Fresh (index, x) pair — the fixture searcher's emb is padded/permuted.
    rng = np.random.default_rng(11)
    centers = 6.0 * rng.standard_normal((12, 16)).astype(np.float32)
    x = (centers[rng.integers(0, 12, 1500)]
         + rng.standard_normal((1500, 16))).astype(np.float32)
    index = build_ivf_index(
        Embeddings(x, 16), IvfBuildConfig(n_clusters=12, seed=0)
    )
    sp = DeviceIvfSearcher.with_spill(index, x, spill=0.3)
    report = autotune(
        sp, q, k=5, recall_target=0.9, modes=("masked",),
        reps=2, budget_s=0.5, timer=FakeTimer(),
    )
    assert report.best is not None and report.best.recall >= 0.9


def test_autotune_xbin8_is_scan_mode(setup):
    """xbin8 classifies as a full-scan mode: nprobe-free plan, no nprobe
    grid walk (the review found it mislabeled as probed)."""
    searcher, q = setup
    report = autotune(
        searcher, q, k=5, recall_target=0.5, modes=("xbin8",),
        reps=2, budget_s=0.5, timer=FakeTimer(),
    )
    assert report.best is not None
    assert report.best.mode == "xbin8"
    assert report.best.nprobe == 0
    assert "full scan" in report.best.notes


def test_autotune_gather_rejected_not_mistimed(setup):
    """gather has no chained-loop path; the tuner must reject it (the loop
    would otherwise silently time a different kernel)."""
    searcher, q = setup
    from pqvector_tpu.query.autotune import PROBED_MODES

    assert "gather" not in PROBED_MODES
    report = autotune(
        searcher, q, k=5, recall_target=0.5, modes=("gather",),
        reps=2, budget_s=0.5, timer=FakeTimer(),
    )
    assert report.best is None
    assert "gather" in report.rejected


def test_probe_weather_reports(setup):
    from pqvector_tpu.query.autotune import WeatherReport, probe_weather

    searcher, q = setup
    rep = probe_weather(
        searcher, q, k=5, reps=2, budget_s=0.5, timer=FakeTimer()
    )
    assert isinstance(rep, WeatherReport)
    assert rep.floor_qps > 0 and rep.extract_qps > 0
    assert rep.extract_frac == pytest.approx(
        rep.extract_qps / rep.floor_qps
    )
    assert rep.batch == len(q) and rep.k == 5
    # with the fake clock both loops time identically -> frac ~ 1.0
    assert not rep.degraded


def test_probe_weather_degraded_threshold(setup):
    from pqvector_tpu.query.autotune import probe_weather

    searcher, q = setup
    # any frac is < 2.0: forcing the threshold proves the classification
    rep = probe_weather(
        searcher, q, k=5, reps=2, budget_s=0.5, degraded_below=2.0,
        timer=FakeTimer(),
    )
    assert rep.degraded


def test_probe_weather_validates_input(setup):
    from pqvector_tpu.errors import ValidationError as VE
    from pqvector_tpu.query.autotune import probe_weather

    searcher, _ = setup
    with pytest.raises(VE):
        probe_weather(searcher, np.zeros((0, 16), np.float32))
    with pytest.raises(VE):
        probe_weather(searcher, np.zeros((4, 16), np.float32), k=0)
    with pytest.raises(VE):  # dim mismatch vs the searcher's embeddings
        probe_weather(searcher, np.zeros((4, 17), np.float32))


def test_int8_gate_env_three_state(monkeypatch):
    from pqvector_tpu.query.autotune import _int8_validated_on_hw

    # Explicit '0'/'false' closes the gate even with the committed marker.
    monkeypatch.setenv("PQVECTOR_INT8_PALLAS_VALIDATED", "0")
    assert _int8_validated_on_hw() is False
    monkeypatch.setenv("PQVECTOR_INT8_PALLAS_VALIDATED", "false")
    assert _int8_validated_on_hw() is False
    # Explicit truthy opens it regardless of marker/device.
    monkeypatch.setenv("PQVECTOR_INT8_PALLAS_VALIDATED", "1")
    assert _int8_validated_on_hw() is True


class FakeProber:
    """Injected prober: returns a report with a chosen degraded flag."""

    def __init__(self, degraded):
        self.degraded = degraded
        self.calls = 0

    def __call__(self, searcher, q, k, budget_s=1.0):
        from pqvector_tpu.query.autotune import WeatherReport

        self.calls += 1
        frac = 0.1 if self.degraded else 0.6
        return WeatherReport(
            floor_qps=100.0, extract_qps=100.0 * frac, extract_frac=frac,
            degraded=self.degraded, batch=len(q), k=k,
        )


def test_autoscan_routes_by_weather(setup):
    searcher, q = setup
    searcher._weather = None
    searcher.weather_prober = FakeProber(degraded=False)
    try:
        assert searcher.scan_route(q, k=5) == "scan"
        searcher._weather = None
        searcher.weather_prober = FakeProber(degraded=True)
        route = searcher.scan_route(q, k=5)
        assert route == ("binscan" if searcher.can_binscan(5) else "scan")
        # mode="autoscan" end-to-end: runs and returns valid results
        d, ids = searcher.search(q, k=5, nprobe=1, mode="autoscan")
        assert ids.shape == (len(q), 5)
    finally:
        searcher.weather_prober = None
        searcher._weather = None


def test_autoscan_probe_cached_by_ttl(setup):
    searcher, q = setup
    prober = FakeProber(degraded=False)
    searcher.weather_prober = prober
    searcher._weather = None
    old_ttl = searcher.weather_ttl_s
    try:
        searcher.weather_ttl_s = 1e9
        searcher.scan_route(q, k=5)
        searcher.scan_route(q, k=5)
        assert prober.calls == 1  # cached within ttl
        searcher.scan_route(q, k=5, force=True)
        assert prober.calls == 2  # force reprobes
        searcher.weather_ttl_s = 0.0
        searcher.scan_route(q, k=5)
        assert prober.calls == 3  # expired ttl reprobes
    finally:
        searcher.weather_prober = None
        searcher._weather = None
        searcher.weather_ttl_s = old_ttl


def test_autoscan_ineligible_shapes_stay_scan(setup):
    """Shapes binscan can't serve must route to scan without probing."""
    searcher, q = setup
    prober = FakeProber(degraded=True)
    searcher.weather_prober = prober
    try:
        if not searcher.can_binscan(200):
            assert searcher.scan_route(q, k=200) == "scan"
            assert prober.calls == 0
    finally:
        searcher.weather_prober = None
        searcher._weather = None


def test_autoscan_exact_paths_resolve(setup):
    """exact()/exact_loop() speak 'approx', not 'scan': autoscan must
    translate the route for the exact-path vocabulary."""
    searcher, q = setup
    searcher.weather_prober = FakeProber(degraded=False)
    searcher._weather = None
    try:
        d, ids = searcher.exact(q, k=5, mode="autoscan")
        assert ids.shape == (len(q), 5)
        d, ids = searcher.exact_loop(q, k=5, reps=2, mode="autoscan")
        assert ids.shape == (len(q), 5)
    finally:
        searcher.weather_prober = None
        searcher._weather = None
