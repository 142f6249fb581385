"""Seeded topology fuzz: random (but valid) codec configurations decoded
through both engines must agree.  Catches grammar/engine corner cases the
hand-picked topology tests miss; failures reproduce from the seed."""

import numpy as np
import pytest

import nvorbis_tpu as nv
from nvorbis_tpu.testgen.vorbis_writer import make_simple_spec

_BLOCKS = (64, 128, 256, 512, 1024, 2048)


def _random_config(rng):
    channels = int(rng.integers(1, 9))
    b0 = _BLOCKS[rng.integers(0, len(_BLOCKS) - 1)]
    b1 = _BLOCKS[rng.integers(_BLOCKS.index(b0), len(_BLOCKS))]
    rtype = int(rng.choice([0, 1, 2]))
    n_stages = int(rng.integers(1, 3))
    couplings = []
    if channels >= 2 and rtype == 2 and rng.random() < 0.8:
        chans = list(rng.permutation(channels))
        while len(chans) >= 2 and len(couplings) < 4:
            couplings.append((int(chans.pop()), int(chans.pop())))
    return dict(channels=channels, block0=b0, block1=b1,
                residue_type=rtype, n_stages=n_stages, couplings=couplings)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_topology_roundtrip(seed):
    rng = np.random.default_rng(1000 + seed)
    cfg = _random_config(rng)
    spec = make_simple_spec(
        channels=cfg["channels"], block0=cfg["block0"], block1=cfg["block1"],
        residue_type=cfg["residue_type"], n_stages=cfg["n_stages"],
        couplings=cfg["couplings"],
    )

    def schedule(i):
        # sprinkle silent channels on ~1/6 of frames
        if i % 6 == 3 and cfg["channels"] > 1:
            return (int(rng.integers(0, cfg["channels"])),)
        return ()

    blob = spec.build_stream(rng, 24, silent_schedule=schedule)
    o = nv.VorbisReader(blob, engine="oracle").read_all()
    j = nv.VorbisReader(blob, engine="jax").read_all()
    assert len(o) == len(j) > 0, cfg
    assert np.isfinite(o).all(), cfg
    # synthetic residue books are hotter than real encodings (|spectrum| up
    # to ~8 vs ~1), so the f32-matmul rounding floor sits a little higher
    # than the fixture-parity budget
    d = float(np.abs(o - j).max())
    assert d <= 8e-6, (cfg, d)
    # the host engine (fused C++ coupling/floor + DCT-IV) must agree too
    h = nv.VorbisReader(blob, engine="host").read_all()
    assert len(h) == len(o), cfg
    dh = float(np.abs(o - h).max())
    assert dh <= 8e-6, (cfg, dh)
