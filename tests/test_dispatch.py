"""Dispatch-policy unit tests (reference analog: CPU-flag dispatch,
src/cpu.c) — especially the transport re-probe: a wedged-then-recovered
transport must migrate back to the device tier (VERDICT r02 item 9)."""

import time

import pytest

from dav1d_tpu import dispatch


@pytest.fixture(autouse=True)
def _clean(monkeypatch):
    dispatch.use_device.cache_clear()
    # tests run on the CPU backend; force the accelerator code path
    monkeypatch.setattr(dispatch, "_platform", lambda: "tpu")
    yield
    dispatch.use_device.cache_clear()


def test_env_overrides(monkeypatch):
    monkeypatch.setenv("DAV1D_TPU_DEVICE", "0")
    assert dispatch.use_device("itx") is False
    dispatch.use_device.cache_clear()
    monkeypatch.setenv("DAV1D_TPU_DEVICE_ITX", "1")
    assert dispatch.use_device("itx") is True


def test_latency_gate(monkeypatch):
    monkeypatch.delenv("DAV1D_TPU_DEVICE", raising=False)
    dispatch._probe_cache["rt"] = (0.5, None)  # fast local chip
    assert dispatch.use_device("itx") is True
    dispatch.use_device.cache_clear()
    dispatch._probe_cache["rt"] = (35.0, None)  # tunneled chip
    assert dispatch.use_device("itx") is False


def test_failed_probe_reprobes(monkeypatch):
    """A failed probe pins the host tier only until its expiry; after
    recovery the next use_device() lands back on the device tier."""
    monkeypatch.delenv("DAV1D_TPU_DEVICE", raising=False)
    calls = []

    def fake_probe(fresh=False):
        calls.append(1)
        if len(calls) == 1:  # first probe: wedged transport
            ms, exp = float("inf"), time.monotonic() + 0.05
        else:  # transport recovered
            ms, exp = 0.4, None
        dispatch._probe_cache["rt"] = (ms, exp)
        return ms

    monkeypatch.setattr(dispatch, "device_roundtrip_ms", fake_probe)
    assert dispatch.use_device("itx") is False
    assert dispatch.use_device("itx") is False  # cached while unexpired
    assert len(calls) == 1
    time.sleep(0.06)
    assert dispatch.use_device("itx") is True  # re-probed, recovered
    assert len(calls) == 2


def test_good_probe_sticks(monkeypatch):
    monkeypatch.delenv("DAV1D_TPU_DEVICE", raising=False)
    calls = []

    def fake_probe(fresh=False):
        calls.append(1)
        dispatch._probe_cache["rt"] = (0.3, None)
        return 0.3

    monkeypatch.setattr(dispatch, "device_roundtrip_ms", fake_probe)
    for _ in range(3):
        assert dispatch.use_device("lr") is True
    assert len(calls) == 1
