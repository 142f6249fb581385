"""Respawnable device-worker executor (engine/device_worker.py).

Covers: worker-mode decode parity with the in-process path, wedge fault
injection (child stalls mid-transfer -> parent watchdog kills, respawns,
replays, decode completes at device speed), and clean interpreter teardown
(no abandoned in-runtime threads)."""

import os

import numpy as np
import pytest

import nvorbis_tpu as nv

FIX = "/root/reference/TestFiles/3test.ogg"
FIX_SMALL = "/root/reference/TestFiles/1test.ogg"


@pytest.fixture
def worker_env(monkeypatch):
    """Force worker mode (CPU backend child) with test-sized timeouts."""
    monkeypatch.setenv("NVT_FETCH_WORKER", "1")
    monkeypatch.setenv("NVT_FETCH_TIMEOUT", "30")
    monkeypatch.setenv("NVT_WORKER_COLD_EXTRA", "90")
    yield
    # never leave a wedge-injected worker behind for later tests
    from nvorbis_tpu.engine import device_worker

    if device_worker._worker is not None:
        device_worker._worker.close()
        device_worker._worker = None


def _decode_worker(raws):
    from nvorbis_tpu.parallel.batch import BatchDecoder

    bd = BatchDecoder(raws)
    return bd.decode_all()


def test_worker_mode_parity(worker_env):
    raw = open(FIX, "rb").read()
    outs = _decode_worker([raw, raw])
    ref = nv.VorbisReader(FIX, engine="oracle").read_all()
    assert len(outs) == 2
    for o in outs:
        assert o.shape == ref.shape
        assert np.max(np.abs(o - ref)) < 2e-6


@pytest.mark.slow
def test_worker_survives_wedge(worker_env, monkeypatch):
    """Child wedges mid-decode after every 2 chunks; the decode must
    complete through kill+respawn+replay, staying on the device path."""
    import nvorbis_tpu.parallel.batch as batch
    from nvorbis_tpu.engine import device_worker

    # tiny chunks over the tiny fixture: a handful of chunks, exactly one
    # mid-decode wedge, fast CPU compiles
    monkeypatch.setattr(batch, "CHUNK_FRAMES", 8)
    monkeypatch.setattr(batch, "CAP_PER_SIZE", 8)
    # watchdog must stay above a CPU-backend chunk compile (no false
    # respawns) while keeping the wedge wait test-sized
    monkeypatch.setenv("NVT_TEST_WEDGE_AFTER", "3")
    monkeypatch.setenv("NVT_FETCH_TIMEOUT", "20")
    monkeypatch.setenv("NVT_WORKER_COLD_EXTRA", "120")
    # fresh worker so the fault-injection env is picked up
    if device_worker._worker is not None:
        device_worker._worker.close()
        device_worker._worker = None

    raw = open(FIX_SMALL, "rb").read()
    with pytest.warns(RuntimeWarning, match="respawning"):
        outs = _decode_worker([raw])
    worker = device_worker._worker
    assert worker is not None and worker._total_respawns >= 1
    # consecutive-failure counter must have reset on the recovery
    assert worker._respawns == 0
    assert not worker._outstanding  # every chunk resolved

    ref = nv.VorbisReader(FIX_SMALL, engine="oracle").read_all()
    assert outs[0].shape == ref.shape
    assert np.max(np.abs(outs[0] - ref)) < 2e-6


@pytest.mark.slow
def test_worker_clean_exit_after_wedge(worker_env):
    """A process that hit a wedge must exit cleanly (the round-2 in-process
    watchdog left a thread parked in the runtime and CPython teardown
    aborted with 'FATAL: exception not rethrown')."""
    import subprocess
    import sys

    code = """
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["NVT_FETCH_WORKER"] = "1"
os.environ["NVT_TEST_WEDGE_AFTER"] = "2"
os.environ["NVT_FETCH_TIMEOUT"] = "20"
os.environ["NVT_WORKER_COLD_EXTRA"] = "120"
import warnings
import jax
jax.config.update("jax_platforms", "cpu")  # the plugin overrides env vars
import nvorbis_tpu.parallel.batch as batch
batch.CHUNK_FRAMES = 8
batch.CAP_PER_SIZE = 8
from nvorbis_tpu.parallel.batch import BatchDecoder
raw = open(%r, "rb").read()
with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    outs = BatchDecoder([raw]).decode_all()
assert outs[0].size > 0
print("OK")
""" % FIX_SMALL
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK" in proc.stdout
    assert "FATAL" not in proc.stderr
    assert "exception not rethrown" not in proc.stderr


def test_worker_mode_bulk_read_all(worker_env, monkeypatch):
    """Single-stream read_all routes through BulkDecoder; in worker mode
    its chunk programs run in the child too."""
    # keep the device path even for this short fixture
    monkeypatch.setenv("NVT_DEVICE_MIN_SECS", "0")
    r = nv.VorbisReader(FIX)
    pcm = r.read_all()
    ref = nv.VorbisReader(FIX, engine="oracle").read_all()
    assert pcm.shape == ref.shape
    assert np.max(np.abs(pcm - ref)) < 2e-6
    from nvorbis_tpu.engine import device_worker

    assert device_worker._worker is not None  # the child actually ran


def test_worker_mode_auto_detection(monkeypatch):
    from nvorbis_tpu.engine.device_worker import worker_mode_enabled

    monkeypatch.setenv("NVT_FETCH_WORKER", "0")
    assert worker_mode_enabled() is False
    monkeypatch.setenv("NVT_FETCH_WORKER", "1")
    assert worker_mode_enabled() is True
    # mesh mode always stays in-process
    assert worker_mode_enabled(mesh=object()) is False
    # pinned-to-cpu processes (tests, dryruns) stay in-process by default
    monkeypatch.delenv("NVT_FETCH_WORKER", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert worker_mode_enabled() is False


def test_worker_tables_released(worker_env):
    """Device-resident tables must not accumulate in the worker child
    across decodes: BatchDecoder drops its group key after decode_all and
    BulkDecoder drops its per-mode tables after read_all — a long-lived
    process decoding many files previously leaked both (child HBM + the
    RAM-backed spool grew forever)."""
    from nvorbis_tpu.engine import device_worker

    raw = open(FIX, "rb").read()
    _decode_worker([raw])
    worker = device_worker._worker
    assert worker is not None
    assert not worker._tables, "BatchDecoder left tables registered"

    r = nv.VorbisReader(FIX)
    out = r.read_all()
    assert len(out) > 0
    worker = device_worker._worker
    assert worker is not None
    assert not worker._tables, "BulkDecoder left tables registered"
