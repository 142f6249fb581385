"""plan_window (vectorized planner) parity vs the sequential StreamPlanner.add
walk it replaces (reference semantics: NVorbis/StreamDecoder.cs:417-541).

Regression anchor: the round-5 in-window pickup landed with a buffered-count
bug — pickup at packet 0 of a fresh stream used A[0] (= -vs[0], the lead-in)
where the sequential path reads self.emitted (= 0), over-trimming the EOS by
exactly vs[0] (caught by test_continuations on a single-window file; fixed in
plan.py pk_buffered)."""

import numpy as np
import pytest

from nvorbis_tpu.engine.plan import FramePlan, StreamPlanner, plan_window


def _run_sequential(planner, start, valid, total, gran, has_gran, eos,
                    blocks):
    """Drive StreamPlanner.add exactly as the engines' fallback loop does,
    returning the same (pa, samples) view plan_window produces."""
    n = len(start)
    pa = np.zeros((n, 5), dtype=np.int64)
    samples = np.zeros(n, dtype=np.int64)
    prev_plan = None
    if planner.prev is not None:
        # the engines hand the previous window's boxed carry plan so the
        # clamp can mutate it; reconstruct one from planner state
        A, s, v, t = planner.prev
        prev_plan = FramePlan(True, A, s, v, t, 0)
    for k in range(n):
        g = int(gran[k]) if has_gran[k] else None
        plan = planner.add(True, int(start[k]), int(valid[k]), int(total[k]),
                           g, bool(eos[k]), False,
                           block_size=int(blocks[k]), prev_plan=prev_plan)
        if k and prev_plan is not None:
            pa[k - 1, 4] = prev_plan.total  # clamp may have mutated it
        pa[k] = (1, plan.pos_base, plan.start, plan.valid, plan.total)
        samples[k] = plan.samples
        prev_plan = plan
    return pa, samples


def _windows(rng, n, first_gran_at, trim_by, block=2048):
    """Synthesize one spec-shaped window: uniform long blocks with the
    standard lapping triple (start=b/4, valid=3b/4, total=b — a long-only
    stream's steady state, which satisfies plan_window's no-op-clamp
    precondition), granules on some packets, EOS at the end with an
    end-trim of trim_by samples."""
    b = block
    bs = np.full(n, b, dtype=np.int64)
    start = np.full(n, b // 4, dtype=np.int64)
    valid = np.full(n, 3 * b // 4, dtype=np.int64)
    total = np.full(n, b, dtype=np.int64)
    vs = valid - start
    has_gran = np.zeros(n, dtype=bool)
    gran = np.zeros(n, dtype=np.int64)
    eos = np.zeros(n, dtype=bool)
    # cumulative consumed spans, fresh-stream convention (first = lead-in)
    A = np.empty(n, dtype=np.int64)
    A[0] = -vs[0]
    A[1:] = np.cumsum(vs[:-1]) + A[0]
    emitted = A + vs
    if first_gran_at is not None:
        for k in range(first_gran_at, n - 1, max(1, n // 3)):
            has_gran[k] = True
            gran[k] = 1000 + emitted[k]
    eos[n - 1] = True
    has_gran[n - 1] = True
    gran[n - 1] = 1000 + emitted[n - 1] - trim_by
    return start, valid, total, gran, has_gran, eos, bs.astype(np.int64)


@pytest.mark.parametrize("first_gran_at", [0, 1, 3, None])
@pytest.mark.parametrize("trim_by", [0, 5, 100])
def test_parity_fresh_stream(first_gran_at, trim_by):
    rng = np.random.default_rng(hash((first_gran_at, trim_by)) & 0xFFFF)
    w = _windows(rng, 12, first_gran_at, trim_by)
    p_v, p_s = StreamPlanner(1000), StreamPlanner(1000)
    got = plan_window(p_v, *w)
    exp_pa, exp_samples = _run_sequential(p_s, *w)
    if got is None:
        pytest.skip("vectorized path declined this window (fallback)")
    pa, samples, last = got
    np.testing.assert_array_equal(pa, exp_pa)
    np.testing.assert_array_equal(samples, exp_samples)
    assert p_v.stream_pos0 == p_s.stream_pos0
    assert p_v.has_position == p_s.has_position
    assert p_v.emitted == p_s.emitted
    assert p_v.prev == p_s.prev
    assert (last.pos_base, last.start, last.valid, last.total) == p_s.prev


def test_parity_pickup_at_zero_with_trim():
    """The exact regression shape: single window, fresh stream, granule on
    packet 0, EOS trim biting at the last packet."""
    rng = np.random.default_rng(7)
    w = _windows(rng, 8, 0, 64)
    p_v, p_s = StreamPlanner(0), StreamPlanner(0)
    got = plan_window(p_v, *w)
    exp_pa, exp_samples = _run_sequential(p_s, *w)
    assert got is not None
    pa, samples, _ = got
    np.testing.assert_array_equal(pa, exp_pa)
    np.testing.assert_array_equal(samples, exp_samples)
    assert p_v.emitted == p_s.emitted
    assert p_v.stream_pos0 == p_s.stream_pos0


def test_parity_two_windows_carry():
    """Pickup in window 1, trim in window 2 — the carry (planner.prev /
    boxed last plan) must hand the sequential state across the boundary."""
    rng = np.random.default_rng(11)
    w1 = _windows(rng, 6, 2, 0)
    # window 2: no new pickup (position known), trim at the end
    start, valid, total, gran, has_gran, eos, blocks = _windows(rng, 6, None,
                                                                0)
    p_v, p_s = StreamPlanner(0), StreamPlanner(0)
    got1 = plan_window(p_v, *w1)
    exp1_pa, _ = _run_sequential(p_s, *w1)
    assert got1 is not None
    np.testing.assert_array_equal(got1[0], exp1_pa)
    # rebase window-2 granule/trim on the carried position
    vs = valid - start
    A0 = p_s.prev[0] + (p_s.prev[2] - p_s.prev[1])
    emitted_end = A0 + int(np.sum(vs))
    gran = gran.copy()
    gran[-1] = p_s.stream_pos0 + emitted_end - 30
    has_gran = has_gran.copy()
    has_gran[-1] = True
    w2 = (start, valid, total, gran, has_gran, eos, blocks)
    got2 = plan_window(p_v, *w2)
    exp2_pa, exp2_samples = _run_sequential(p_s, *w2)
    assert got2 is not None
    pa2, samples2, _ = got2
    np.testing.assert_array_equal(pa2, exp2_pa)
    np.testing.assert_array_equal(samples2, exp2_samples)
    assert p_v.emitted == p_s.emitted
