"""nvt_plan_window equivalence: the C++ planner must match the Python
plan_window (the semantic oracle for StreamDecoder.cs:358-363/428-451
granule pickup + end-trim) on every window it accepts — same pa/samples,
same planner state evolution — and reject (return None) whenever the
Python fast path would."""

import numpy as np
import pytest

from nvorbis_tpu import native
from nvorbis_tpu.engine.plan import StreamPlanner, plan_window
from nvorbis_tpu.ogg.fast_packets import _plan_window_native

pytestmark = pytest.mark.skipif(
    native.load() is None, reason="native library unavailable"
)

# a synthetic 2-mode setup: short 256 / long 2048 with the standard
# window-index overlap triples (start, valid, total per widx)
BLK = np.array([256, 2048], dtype=np.int64)
W_MAX = 4
OV = np.zeros((2, W_MAX, 3), dtype=np.int64)
OV[0, 0] = (64, 192, 256)          # short: one window shape
OV[1, 0] = (512, 1536, 2048)       # long-long
OV[1, 1] = (512, 1088, 1152)       # long, short next
OV[1, 2] = (64, 1536, 2048)        # short prev, long next
OV[1, 3] = (64, 1088, 1152)        # short prev, short next


def _mk_job(rng, n, eos_last, with_gran, gran_last=None):
    meta = np.zeros((n, 8), dtype=np.int32)
    meta[:, 0] = 1
    modes = rng.integers(0, 2, n)
    meta[:, 1] = modes
    meta[:, 2] = np.where(modes == 0, 0, rng.integers(0, W_MAX, n))
    meta[:, 3] = rng.integers(10, 100, n)   # bits
    meta[:, 4] = meta[:, 3] + rng.integers(0, 8, n)
    gran = np.full(n, -1, dtype=np.int64)
    has_gran = np.zeros(n, dtype=bool)
    if with_gran:
        k = int(rng.integers(0, n))
        has_gran[k] = True
        gran[k] = int(rng.integers(1000, 100000))
    if gran_last is not None:
        has_gran[n - 1] = True
        gran[n - 1] = gran_last
    eos = np.zeros(n, dtype=bool)
    eos[n - 1] = eos_last
    return {
        "n": n, "gran_arr": gran, "has_gran": has_gran, "eos": eos,
        "resync": np.zeros(n, dtype=bool),
        "ovh_bits": np.zeros(n, dtype=np.int64),
    }, meta


def _state(p):
    return (p.emitted, p.stream_pos0, p.has_position, p.prev,
            p.prev_drained, p.first, p.eos_found)


def _run_python(planner, meta, job, n):
    mode_ids = meta[:n, 1]
    widx = meta[:n, 2]
    svt = OV[mode_ids, widx]
    return plan_window(planner, svt[:, 0], svt[:, 1], svt[:, 2],
                       job["gran_arr"], job["has_gran"], job["eos"],
                       BLK[mode_ids])


@pytest.mark.parametrize("seed", range(8))
def test_fuzzed_windows_match(seed):
    rng = np.random.default_rng(seed)
    pn = StreamPlanner(0)
    pp = StreamPlanner(0)
    for w in range(12):
        n = int(rng.integers(1, 40))
        last = w == 11
        job, meta = _mk_job(
            rng, n, eos_last=last,
            with_gran=bool(rng.integers(0, 2)),
            gran_last=(int(pp.stream_pos0 + pp.emitted
                           + rng.integers(0, 500)) if last else None),
        )
        rn = _plan_window_native(pn, OV, BLK, meta, job, n)
        rp = _run_python(pp, meta, job, n)
        assert (rn is None) == (rp is None), f"window {w}"
        if rn is None:
            # both rejected: replay through add() on both planners so the
            # states keep tracking (simplest: skip the rest of this seed)
            return
        pa_n, s_n, lp_n = rn
        pa_p, s_p, lp_p = rp
        assert np.array_equal(pa_n, pa_p), f"window {w} pa"
        assert np.array_equal(s_n, s_p), f"window {w} samples"
        assert (lp_n.pos_base, lp_n.start, lp_n.valid, lp_n.total,
                lp_n.samples) == (lp_p.pos_base, lp_p.start, lp_p.valid,
                                  lp_p.total, lp_p.samples)
        assert _state(pn) == _state(pp), f"window {w} planner state"


def test_end_trim_and_pickup_window():
    """One window that both picks up position and trims at EOS (the
    1test single-chunk shape)."""
    rng = np.random.default_rng(123)
    job, meta = _mk_job(rng, 25, eos_last=True, with_gran=False)
    # granule on packet 3 (pickup) and a trimming final granule
    job["has_gran"][3] = True
    job["gran_arr"][3] = 5000
    job["has_gran"][-1] = True
    job["gran_arr"][-1] = 5000 + 731  # force diff < 0 almost surely
    pn, pp = StreamPlanner(0), StreamPlanner(0)
    rn = _plan_window_native(pn, OV, BLK, meta, job, 25)
    rp = _run_python(pp, meta, job, 25)
    assert (rn is None) == (rp is None)
    if rn is not None:
        assert np.array_equal(rn[0], rp[0])
        assert np.array_equal(rn[1], rp[1])
        assert _state(pn) == _state(pp)


def test_rejects_mid_eos_and_bad_frames():
    rng = np.random.default_rng(7)
    job, meta = _mk_job(rng, 10, eos_last=False, with_gran=True)
    job["eos"][4] = True
    pn = StreamPlanner(0)
    assert _plan_window_native(pn, OV, BLK, meta, job, 10) is None
    job2, meta2 = _mk_job(rng, 10, eos_last=False, with_gran=True)
    meta2[5, 0] = 0  # bad frame
    assert _plan_window_native(pn, OV, BLK, meta2, job2, 10) is None
    assert _state(pn) == _state(StreamPlanner(0))  # untouched on reject
