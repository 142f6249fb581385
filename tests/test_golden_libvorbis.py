"""Independent golden-PCM parity vs libvorbisfile (the Xiph reference).

Round-1 weakness: every parity test compared the JAX plane against the
repo's own numpy oracle, so a shared semantic error would pass.  These
tests adjudicate both engines against an *independent* decoder, the way
the reference's golden-WAV methodology does (TestApp/Program.cs:12-29),
at the BASELINE ≤1e-6 bar (scaled by signal peak for synthetic streams
whose unnormalized VQ magnitudes reach ~20; float32 ULP grows with
magnitude).

Two deliberate NVorbis-parity divergences from libvorbis are pinned as
explicit tests at the bottom (floor1 clip-at-n slope, floor0 bark map
last bin) — see libvorbis_oracle module docstring.
"""

import numpy as np
import pytest

import nvorbis_tpu as nv
from nvorbis_tpu.testgen.vorbis_writer import make_simple_spec

import libvorbis_oracle as lvo

pytestmark = pytest.mark.skipif(
    not lvo.available(), reason="libvorbisfile not installed"
)

FIXTURES = ["1test", "2test", "3test", "issue6test"]

# oracle: identical scalar semantics, diffs are pure float32 rounding.
# jax: the matmul IMDCT sums in a different (equally valid) f32 order.
TOL = {"oracle": 1e-6, "jax": 2e-6}


def _decode_ours(source, engine):
    r = nv.VorbisReader(source, engine=engine)
    r.clip_samples = False  # ov_read_float returns unclipped floats
    pcm = r.read_all().reshape(-1, r.channels)
    r.dispose()
    return pcm


@pytest.mark.parametrize("engine", ["oracle", "jax"])
@pytest.mark.parametrize("name", FIXTURES)
def test_fixture_golden(fixture_dir, name, engine):
    path = str(fixture_dir / f"{name}.ogg")
    gold = lvo.decode_file(path)
    ours = _decode_ours(path, engine)
    assert ours.shape == gold.shape  # incl. issue6test's granule end-trim
    assert np.abs(gold - ours).max() <= TOL[engine]


SYNTH_SPECS = {
    # the 5 BASELINE-ish topology corners: couplings, all residue types,
    # extreme block sizes; exercises the residue channel-mask semantics
    # (codec/residue.py:7-15) against a real decoder
    "stereo-r2": dict(channels=2, residue_type=2),
    "51-r2-48k": dict(
        channels=6, sample_rate=48000, residue_type=2,
        couplings=[(0, 1), (2, 3), (4, 5)],
    ),
    "mono-r0": dict(channels=1, residue_type=0, couplings=[]),
    "stereo-r1": dict(channels=2, residue_type=1),
    "tiny-blocks": dict(channels=2, residue_type=2, block0=64, block1=512),
    "big-blocks": dict(channels=2, residue_type=2, block0=512, block1=8192),
}


@pytest.mark.slow
@pytest.mark.parametrize("engine", ["oracle", "jax"])
@pytest.mark.parametrize("label", sorted(SYNTH_SPECS))
def test_synthetic_golden(label, engine):
    blob = make_simple_spec(**SYNTH_SPECS[label]).build_stream(
        np.random.default_rng(11), 30
    )
    gold = lvo.decode_bytes(blob)
    ours = _decode_ours(blob, engine)
    assert ours.shape == gold.shape
    peak = max(1.0, float(np.abs(gold).max()))
    assert np.abs(gold - ours).max() <= TOL[engine] + 5e-7 * peak


def test_fuzzed_topologies_golden():
    """Seeded random topologies adjudicated against the real decoder.

    The first packet is pinned to the short mode: a stream *starting*
    long-then-short hits the documented start-trim divergence (see
    test_start_trim_quirk below), which would make every comparison a
    misalignment rather than a semantic check.  Real encoder streams
    always begin consistently.
    """
    rng = np.random.default_rng(1234)
    for _ in range(6):
        channels = int(rng.integers(1, 5))
        rtype = int(rng.integers(0, 3))
        b0 = 1 << int(rng.integers(6, 9))
        b1 = 1 << int(rng.integers(int(np.log2(b0)), 12))
        couplings = [(0, 1)] if channels >= 2 and rng.random() < 0.7 else []
        spec = make_simple_spec(
            channels=channels, residue_type=rtype, block0=b0, block1=b1,
            couplings=couplings, n_stages=int(rng.integers(1, 3)),
        )
        n_modes = len(spec.modes)
        schedule = [0] + [int(rng.integers(0, n_modes)) for _ in range(15)]
        blob = spec.build_stream(rng, 16, mode_schedule=schedule)
        gold = lvo.decode_bytes(blob)
        ours = _decode_ours(blob, "oracle")
        assert ours.shape == gold.shape, (channels, rtype, b0, b1)
        peak = max(1.0, float(np.abs(gold).max()))
        assert np.abs(gold - ours).max() <= 1e-6 + 5e-7 * peak, (
            channels, rtype, b0, b1,
        )


def test_channel_mask_semantics_match_libvorbis():
    """Do-not-decode channel masks (silent floors): we follow the Vorbis
    spec — masked channels transmit no residue classwords — where NVorbis
    reads classwords for every channel and zeroes later
    (Residue0.cs:134-151; documented in codec/residue.py:7-15).  libvorbis
    decodes the spec layout identically to us at ULP level, in every mask
    configuration incl. coupling no-energy propagation, which adjudicates
    the deviation against the reference Xiph decoder."""
    cases = [
        (2, [(0, 1)], 2, lambda i: (0,) if i % 3 == 0 else ()),
        (2, [(0, 1)], 2, lambda i: (0, 1) if i % 3 == 0 else ()),
        (3, [], 1, lambda i: (1,) if i % 2 == 0 else (0, 2)),
        (6, [(0, 1), (2, 3), (4, 5)], 2,
         lambda i: (2, 3) if i % 2 == 0 else ()),
    ]
    for channels, couplings, rtype, schedule in cases:
        spec = make_simple_spec(
            channels=channels, residue_type=rtype, couplings=couplings
        )
        blob = spec.build_stream(
            np.random.default_rng(17), 24, silent_schedule=schedule,
            mode_schedule=[0, 1, 0, 0, 1],
        )
        gold = lvo.decode_bytes(blob)
        ours = _decode_ours(blob, "oracle")
        assert ours.shape == gold.shape, (channels, rtype)
        peak = max(1.0, float(np.abs(gold).max()))
        assert np.abs(gold - ours).max() <= 1e-6 + 5e-7 * peak, (
            channels, rtype,
        )


# -- documented NVorbis-parity divergences ------------------------------------


def test_floor1_clip_quirk_diverges_from_libvorbis():
    """Floor posts beyond n: we match NVorbis's clamped-slope render
    (Floor1.cs:205), which genuinely differs from libvorbis floor1.c.
    The render itself is pinned against a scalar NVorbis transcription in
    test_floor.py::test_render_polyline_slope_clip_quirk; here we pin that
    the stream-level corner exists and is the ONLY divergence."""
    kw = dict(channels=2, residue_type=2, floor_range_bits=8)
    blob = make_simple_spec(**kw).build_stream(np.random.default_rng(5), 20)
    gold = lvo.decode_bytes(blob)
    ours = _decode_ours(blob, "oracle")
    assert ours.shape == gold.shape
    # the corner must actually fire (short blocks, posts past n=128)...
    assert np.abs(gold - ours).max() > 1e-3
    # ...and both engines must agree on the NVorbis behavior
    jax_pcm = _decode_ours(blob, "jax")
    peak = max(1.0, float(np.abs(ours).max()))
    assert np.abs(jax_pcm - ours).max() <= 2e-6 * peak


def test_start_trim_quirk():
    """A stream whose first two packets are long-then-short: NVorbis drops
    the first packet's entire valid region (StreamDecoder.cs:449), losing
    the (block1-block0)/4 transition surplus that libvorbis's pairwise
    granule accounting emits.  We match NVorbis; the remainder must align
    sample-exactly with libvorbis's tail.  (The schedule must end on short
    blocks: a final long packet's claimed next-short surplus is granule-
    trimmed only when the start was consistent, else the two artifacts
    cancel in length while misaligning content.)"""
    spec = make_simple_spec(channels=2, residue_type=2,
                            block0=256, block1=1024)
    blob = spec.build_stream(
        np.random.default_rng(9), 12, mode_schedule=[1, 0, 0, 0]
    )
    gold = lvo.decode_bytes(blob)
    ours = _decode_ours(blob, "oracle")
    trim = (1024 - 256) // 4
    assert len(gold) - len(ours) == trim
    peak = max(1.0, float(np.abs(gold).max()))
    assert np.abs(gold[trim:] - ours).max() <= 1e-6 + 5e-7 * peak
    # and a short-start stream has no trim at all
    blob2 = spec.build_stream(
        np.random.default_rng(9), 12, mode_schedule=[0, 0, 1, 0]
    )
    gold2 = lvo.decode_bytes(blob2)
    ours2 = _decode_ours(blob2, "oracle")
    assert ours2.shape == gold2.shape
    assert np.abs(gold2 - ours2).max() <= 1e-6 + 5e-7 * peak


def test_floor0_bark_map_quirk():
    """NVorbis leaves bark map[n-1] = 0 (Floor0.cs:73 loop bound); we match.
    With the map patched to the spec/libvorbis behavior, our whole LSP
    evaluation chain matches libvorbis at ULP level — isolating the
    divergence to exactly that deliberate quirk."""
    blob = make_simple_spec(
        channels=2, residue_type=2, floor_type=0
    ).build_stream(np.random.default_rng(7), 20)
    gold = lvo.decode_bytes(blob)

    ours = _decode_ours(blob, "oracle")
    assert ours.shape == gold.shape
    assert np.abs(gold - ours).max() > 1e-3  # quirk fires

    # the patch below mutates a parsed floor in place: isolate it from the
    # header-keyed setup cache (parsed setups are shared across readers)
    from nvorbis_tpu.codec.setup import setup_cache_clear

    setup_cache_clear()
    r = nv.VorbisReader(blob, engine="oracle")
    r.clip_samples = False
    f0 = r._stream_decoder._setup.floors[0]
    assert all(m[bs // 2 - 1] == 0 for bs, m in f0._bark_maps.items())
    for bs, m in f0._bark_maps.items():  # patch to spec behavior
        n = bs // 2
        scale = f0.bark_map_size / f0._to_bark(f0.rate / 2)
        for i in range(n):
            m[i] = min(
                f0.bark_map_size - 1,
                int(np.floor(f0._to_bark((f0.rate / 2.0) / n * i) * scale)),
            )
    patched = r.read_all().reshape(-1, r.channels)
    r.dispose()
    setup_cache_clear()  # don't leak the patched setup to later readers
    peak = max(1.0, float(np.abs(gold).max()))
    assert np.abs(gold - patched[: len(gold)]).max() <= 1e-6 + 5e-7 * peak


@pytest.mark.parametrize("name", ["3test", "issue6test"])
def test_seek_golden(fixture_dir, name):
    """Granule-exact seeks adjudicated against the independent decode:
    after ``sample_position = p`` the next window of samples must equal
    libvorbis's whole-stream PCM at content offset ``p - delta``, where
    ``delta = total_samples - len(gold)`` is the stream's granule-over-
    claim (63 on issue6test, 0 on clean files).

    NVorbis positions are *granule coordinates*: the sequential position
    jumps by +delta at the first granule pickup (StreamDecoder.cs:358-363)
    and SeekTo targets file granules as written, so on granule-shifted
    streams content sample i lives at position i+delta.  libvorbis
    instead normalizes ov_pcm_* to content coordinates.  We match the
    reference; this test pins both the mapping and the PCM against the
    independent decoder (engine-vs-engine seek tests can't catch a
    positioning semantic both engines share)."""
    path = f"{fixture_dir}/{name}.ogg"
    gold = lvo.decode_file(path)

    r = nv.VorbisReader(path, engine="oracle")
    r.clip_samples = False
    C = r.channels
    delta = r.total_samples - len(gold)
    assert delta == (63 if name == "issue6test" else 0)
    n_read = 1000
    rng = np.random.default_rng(3)
    targets = sorted(
        int(t) for t in rng.integers(delta, len(gold) - n_read, size=8)
    )
    buf = np.zeros(n_read * C, dtype=np.float32)
    for p in targets:
        r.sample_position = p
        assert r.sample_position == p
        got = 0
        while got < len(buf):
            n = r.read_samples(buffer=buf[got:])
            if n == 0:
                break
            got += n
        want = gold[p - delta : p - delta + got // C].reshape(-1)
        assert np.abs(buf[:got] - want).max() <= 1e-6, (name, p)
    r.dispose()
