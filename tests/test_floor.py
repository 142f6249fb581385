"""Floor1 closed-form render vs a direct transcription of the reference's
Bresenham walk (Floor1.RenderLineMulti / Apply semantics)."""

import numpy as np

from nvorbis_tpu.codec.floor import render_polyline


def _render_line_loop(x0, y0, x1, y1, out):
    # direct transcription of the integer walk semantics (Floor1.cs:316-341)
    dy = y1 - y0
    adx = x1 - x0
    ady = abs(dy)
    sy = -1 if dy < 0 else 1
    # C# integer division truncates toward zero
    b = dy // adx if dy >= 0 else -((-dy) // adx)
    x = x0
    y = y0
    err = -adx
    out[x0] = y0
    ady -= abs(b) * adx
    while x + 1 < x1:
        x += 1
        y += b
        err += ady
        if err >= 0:
            err -= adx
            y += sy
        out[x] = y


def _reference_apply(xs, ys, used, n2):
    """Scalar re-creation of Floor1.Apply's segment loop (186-217)."""
    out = np.zeros(n2 + 1024, dtype=np.int64)  # slack for overshoot safety
    lx = 0
    ly = ys[0]
    for i in range(1, len(xs)):
        if used[i]:
            hx = xs[i]
            hy = ys[i]
            if lx < n2:
                _render_line_loop(lx, ly, min(hx, n2), hy, out)
            lx, ly = hx, hy
        if lx >= n2:
            break
    if lx < n2:
        # final horizontal run (RenderLineMulti with y1 == y0)
        out[lx:n2] = ly
    return out[:n2]


def test_render_polyline_matches_reference_walk():
    rng = np.random.default_rng(1234)
    for trial in range(200):
        p = rng.integers(2, 20)
        n2 = int(rng.choice([64, 128, 1024]))
        xs = np.sort(rng.choice(np.arange(1, 4096), size=p - 2, replace=False))
        xs = np.concatenate([[0], xs, [4096]])
        xs = np.unique(xs)
        ys = rng.integers(0, 256, size=len(xs)) * int(rng.choice([1, 2, 3, 4]))
        used = rng.random(len(xs)) < 0.7
        used[0] = used[1] = True
        got = render_polyline(xs, ys, used, n2)
        want = _reference_apply(list(xs), list(ys), list(used), n2)
        np.testing.assert_array_equal(got, want)


def test_render_polyline_slope_clip_quirk():
    # a segment crossing n2 uses adx = n2 - lx but the *unclipped* hy,
    # changing the slope — exactly like the reference
    xs = np.array([0, 100, 400])
    ys = np.array([10, 20, 260])
    used = np.array([True, True, True])
    n2 = 200
    got = render_polyline(xs, ys, used, n2)
    want = _reference_apply(list(xs), list(ys), list(used), n2)
    np.testing.assert_array_equal(got, want)


def test_render_polyline_batch_matches_scalar():
    """The batched ramp-fill render must equal R scalar renders for any
    post pattern, including unused posts and segments clipped at n2."""
    import numpy as np

    from nvorbis_tpu.codec.floor import render_polyline, render_polyline_batch

    rng = np.random.default_rng(7)
    xs = np.sort(rng.choice(np.arange(0, 1100), size=14, replace=False))
    xs[0] = 0
    for n2 in (64, 512, 1024):
        ys_rows = rng.integers(0, 256, size=(17, 14))
        used_rows = rng.random((17, 14)) < 0.7
        used_rows[:, :2] = True  # root posts always used
        got = render_polyline_batch(xs, ys_rows, used_rows, n2)
        for r in range(17):
            want = render_polyline(xs, ys_rows[r], used_rows[r], n2)
            np.testing.assert_array_equal(got[r], want)
