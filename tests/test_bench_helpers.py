"""bench.py accounting helpers: roofline math, recall, peak lookup, and
the mode-membership constants (the 'xbin8 lesson': membership drift
across hand-edited tuples silently misroutes modes)."""

import importlib.util
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location("bench", "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_mode_constants_consistent(bench):
    # every scan mode the contest can pick must be in the loop set
    for m in bench.ORIG_ORDER_MODES:
        assert m in bench.LOOP_MODES
        assert m in bench.SCAN_MODES
    # approx is a scan-class (rooflined) mode but served from the default
    # searcher (masked IVF variant exists); it must still be loop-timed
    assert "approx" in bench.SCAN_MODES and "approx" in bench.LOOP_MODES
    # probed exact-selection modes are never rooflined as full scans
    for m in ("stream", "pallas", "compact", "bincompact"):
        assert m not in bench.SCAN_MODES
        assert m in bench.LOOP_MODES


def test_roofline_math(bench):
    # 100k QPS over 1M x 128 f32 at B=1000: 2*1e6*128*1e5 = 25.6 TFLOP/s;
    # HBM = 1e6*128*4 bytes * (1e5/1000) = 51.2 GB/s
    r = bench.roofline(
        1e5, 1000, 1_000_000, 128, 4, peak_flops=197e12, peak_bw=819e9
    )
    assert r["tflops"] == 25.6
    assert r["mfu"] == round(25.6e12 / 197e12, 3)
    assert r["hbm_gbps"] == 51.2
    # int8 bytes: quarter the traffic at the same QPS
    r8 = bench.roofline(
        1e5, 1000, 1_000_000, 128, 1, peak_flops=197e12, peak_bw=819e9
    )
    assert r8["hbm_gbps"] == pytest.approx(51.2 / 4)
    assert r8["tflops"] == r["tflops"]  # FLOP accounting is byte-free


def test_recall_at_k(bench):
    truth = [[1, 2, 3], [4, 5, 6]]
    got = [[1, 2, 9], [4, 5, 6]]
    assert bench.recall_at_k(truth, got) == pytest.approx(5 / 6)
    # -1 padding ignored on both sides
    assert bench.recall_at_k([[1, -1]], [[-1, 1]]) == 1.0


def test_device_peaks_env_override(bench, monkeypatch):
    monkeypatch.setenv("PQVECTOR_TPU_PEAKS", "100,500")
    flops, bw = bench.device_peaks(jax=None)
    assert flops == 100e12 and bw == 500e9


def test_int8_pallas_modes_gated_from_auto(bench, monkeypatch):
    # Post-validation (session N) semantics: the committed marker admits
    # binscan8/bincompact8 to the auto contest, but an EXPLICIT env '0'
    # must force the gate closed regardless of the marker (round-3
    # advisor medium: unvalidated-hardware safety), and explicit truthy
    # forces it open.
    import os

    monkeypatch.setenv("PQVECTOR_BENCH_INT8_PALLAS", "0")
    assert bench._int8_gate_open() is False
    monkeypatch.setenv("PQVECTOR_BENCH_INT8_PALLAS", "false")
    assert bench._int8_gate_open() is False
    monkeypatch.setenv("PQVECTOR_BENCH_INT8_PALLAS", "1")
    assert bench._int8_gate_open() is True
    monkeypatch.delenv("PQVECTOR_BENCH_INT8_PALLAS", raising=False)
    assert bench._int8_gate_open() is os.path.exists(bench._INT8_MARKER)
    # Module constant reflects the unset-env + marker state at import.
    if bench._INT8_OK:
        assert "binscan8" in bench.AUTO_CONTEST_MODES
    else:
        assert "binscan8" not in bench.AUTO_CONTEST_MODES
    for m in ("binscan8", "bincompact8"):
        assert m in bench.LOOP_MODES
    assert set(bench.AUTO_CONTEST_MODES) <= set(bench.LOOP_MODES)
