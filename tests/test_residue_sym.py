"""Residue symbol mode: the C++ symbol emission + device gather
reconstruction must reproduce the dense host-plane spectra bit-for-bit."""

import numpy as np
import pytest

import nvorbis_tpu as nv
from tests.conftest import fixture_path


def _roundtrip(blob_or_path, n_packets=None):
    from nvorbis_tpu.native import NativeUnpacker
    from nvorbis_tpu.synth.residue_sym import (
        plan_static, plan_tables_dev, reconstruct_spectrum,
    )
    import jax

    r = nv.VorbisReader(blob_or_path, engine="oracle")
    dec = r._stream_decoder
    setup = dec._setup
    native = NativeUnpacker(setup, dec._max_posts)
    assert native.sym_plans is not None, "symbol mode should be available"

    raw = []
    while True:
        p = dec._packet_provider.get_next_packet()
        if p is None:
            break
        raw.append(bytes(p.data))
        p.done()
        if n_packets and len(raw) >= n_packets:
            break

    dense_res, _, _, _, meta_d = native.unpack(raw)
    classes, ids, _, _, _, meta_s = native.unpack_sym(raw)
    np.testing.assert_array_equal(meta_d[:, :5], meta_s[:, :5])

    C = setup.channels
    # group frames by mode and reconstruct per group
    for mode_idx, mode in enumerate(setup.modes):
        rows = [i for i in range(len(raw))
                if meta_s[i, 0] == 1 and meta_s[i, 1] == mode_idx]
        if not rows:
            continue
        res = setup.residues[mode.mapping.submap_residue[0]]
        plan = native.sym_plans[id(res)]
        st = plan_static(plan, mode.block_size)
        tabs = plan_tables_dev(plan)
        n_part, chr_c = st[2], st[3]

        cls_b = classes[rows][:, :chr_c, :n_part].astype(np.int32)
        counts = meta_s[rows, 5]
        bases = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
        flat = np.concatenate(
            [ids[i, :meta_s[i, 5]] for i in rows]
            or [np.zeros(0, np.int16)]
        ).astype(np.int32)
        if flat.size == 0:
            flat = np.full(1, -1, dtype=np.int32)

        got = np.asarray(jax.jit(
            reconstruct_spectrum, static_argnames=("st", "channels")
        )(
            cls_b, flat, bases, tabs, st=st, channels=C
        ))
        n2 = mode.block_size // 2
        want = dense_res[rows][:, :, :n2]
        np.testing.assert_array_equal(got, want)
    r.dispose()


def test_sym_matches_dense_fixture_stereo():
    _roundtrip(fixture_path("3test.ogg"))


def test_sym_matches_dense_fixture_mono():
    _roundtrip(fixture_path("1test.ogg"))


def test_sym_matches_dense_synthetic_51():
    from nvorbis_tpu.testgen.vorbis_writer import make_simple_spec

    spec = make_simple_spec(channels=6, sample_rate=48000, residue_type=2,
                            couplings=[(0, 1), (2, 3), (4, 5)])
    blob = spec.build_stream(np.random.default_rng(31), 16)
    _roundtrip(blob)


def test_sym_matches_dense_residue_type0():
    from nvorbis_tpu.testgen.vorbis_writer import make_simple_spec

    spec = make_simple_spec(channels=1, residue_type=0, couplings=[])
    blob = spec.build_stream(np.random.default_rng(32), 16)
    _roundtrip(blob)


def test_sym_matches_dense_silent_channels():
    from nvorbis_tpu.testgen.vorbis_writer import make_simple_spec

    spec = make_simple_spec(channels=2, residue_type=2)

    def schedule(i):
        return (0, 1) if i % 4 == 2 else ((0,) if i % 4 == 0 else ())

    blob = spec.build_stream(np.random.default_rng(33), 20,
                             silent_schedule=schedule)
    _roundtrip(blob)


def test_sym_unavailable_multi_submap():
    from nvorbis_tpu.synth.residue_sym import plan_for_setup
    from nvorbis_tpu.testgen.vorbis_writer import (
        BookSpec, Floor1Spec, MappingSpec, ModeSpec, ResidueSpec, StreamSpec,
    )

    post_book = BookSpec(1, 256)
    classbook = BookSpec(2, 16)
    vq1 = BookSpec(4, 16, map_type=1, min_value=-2.0, delta=0.25, value_bits=5)
    books = [post_book, classbook, vq1]
    floor = Floor1Spec(post_book=post_book)
    res = ResidueSpec(1, 0, 128, 16, 4, classbook,
                      [[vq1], [None], [vq1], [None]])
    mapping = MappingSpec(couplings=[], mux=[0, 1], submaps=((0, 0), (0, 0)))
    spec = StreamSpec(2, 44100, 256, 2048, books, [floor], [res],
                      [mapping], [ModeSpec(0)])
    blob = spec.build_stream(np.random.default_rng(34), 6)
    r = nv.VorbisReader(blob, engine="oracle")
    assert plan_for_setup(r._stream_decoder._setup) is None
