"""Vorbis header parsing: identification, comments, and setup (codebooks,
floors, residues, mappings, modes).

Reference: NVorbis/StreamDecoder.cs LoadStreamHeader (179-204), LoadComments
(206-224), LoadBooks (226-289); type dispatch per NVorbis/Factory.cs.
"""

from nvorbis_tpu.errors import InvalidDataError
from nvorbis_tpu.utils.bitmath import ilog

# includes the 4-byte version field (must be 0); StreamDecoder.cs:145
_SIG_ID = b"\x01vorbis\x00\x00\x00\x00"
_SIG_COMMENT = b"\x03vorbis"
_SIG_SETUP = b"\x05vorbis"


def _check_signature(packet, sig: bytes) -> bool:
    for b in sig:
        if packet.read_bits(8) != b:
            return False
    return True


def _read_string(packet) -> str:
    length = packet.read_bits(32)
    if length == 0:
        return ""
    data = packet.read_bytes(length)
    if len(data) < length:
        raise InvalidDataError("Could not read full string!")
    return data.decode("utf-8", errors="replace")


def identify_bitstream(packet) -> str:
    """Produce a helpful error string for non-Vorbis logical streams.

    Reference: StreamDecoder.GetInvalidStreamException (70-103).
    """
    header = packet.read_bits(64)
    packet.reset()
    if header == 0x646165487375704F:
        return "Found OPUS bitstream."
    if (header & 0xFF) == 0x7F:
        return "Found FLAC bitstream."
    if header == 0x2020207865657053:
        return "Found Speex bitstream."
    if header == 0x0064616568736966:
        return "Found Skeleton metadata bitstream."
    if (header & 0xFFFFFFFFFFFF00) == 0x61726F65687400:
        return "Found Theora bitstream."
    return "Could not find Vorbis data to decode."


class IdHeader:
    __slots__ = (
        "channels",
        "sample_rate",
        "upper_bitrate",
        "nominal_bitrate",
        "lower_bitrate",
        "block0_size",
        "block1_size",
    )


def parse_id_header(packet):
    """Parse the identification header; returns IdHeader or None."""
    if not _check_signature(packet, _SIG_ID):
        return None
    hdr = IdHeader()
    hdr.channels = packet.read_bits(8)
    hdr.sample_rate = packet.read_bits(32)
    # bitrates are signed 32-bit fields
    def _s32(v):
        return v - (1 << 32) if v & (1 << 31) else v

    hdr.upper_bitrate = _s32(packet.read_bits(32))
    hdr.nominal_bitrate = _s32(packet.read_bits(32))
    hdr.lower_bitrate = _s32(packet.read_bits(32))
    hdr.block0_size = 1 << packet.read_bits(4)
    hdr.block1_size = 1 << packet.read_bits(4)
    # framing bit (1 bit, must be set per spec; reference reads 0 extra —
    # trailing framing validated implicitly)
    if hdr.nominal_bitrate == 0 and hdr.upper_bitrate > 0 and hdr.lower_bitrate > 0:
        hdr.nominal_bitrate = (hdr.upper_bitrate + hdr.lower_bitrate) // 2
    return hdr


def parse_comment_header(packet):
    """Parse the comment header; returns (vendor, [comments]) or None."""
    if not _check_signature(packet, _SIG_COMMENT):
        return None
    vendor = _read_string(packet)
    count = packet.read_bits(32)
    comments = [_read_string(packet) for _ in range(count)]
    return vendor, comments


class Setup:
    """The fully-built codec configuration for one logical stream."""

    __slots__ = (
        "channels",
        "sample_rate",
        "block0_size",
        "block1_size",
        "codebooks",
        "floors",
        "residues",
        "mappings",
        "modes",
        "mode_field_bits",
    )


# Header-keyed setup cache.  libvorbis-family encoders ship *static*
# codebook sets per quality preset, so files encoded with the same settings
# carry byte-identical setup headers; a fleet decoding many such streams
# (the 64-stream batch plane) parses the codebooks/floors/residues once.
# Setup objects are immutable after parse, so sharing is safe; clear() is
# for tests that monkeypatch a parsed component in place.
_setup_cache = {}
_SETUP_CACHE_MAX = 16


def setup_cache_clear():
    _setup_cache.clear()


def parse_setup_header_cached(packet, id_header):
    """Cached :func:`parse_setup_header`.

    Returns ``(setup, header_bits_read, header_bits_remaining)`` — the bit
    counts are replayed from the original parse so StreamStats header-bit
    accounting is identical on cache hits (the packet is not consumed).
    """
    key = (
        bytes(packet.data), id_header.channels, id_header.sample_rate,
        id_header.block0_size, id_header.block1_size,
    )
    hit = _setup_cache.get(key)
    if hit is not None:
        return hit
    stp = parse_setup_header(packet, id_header)
    if stp is None:
        return None, 0, 0
    entry = (stp, packet.bits_read, packet.bits_remaining)
    if len(_setup_cache) >= _SETUP_CACHE_MAX:
        _setup_cache.pop(next(iter(_setup_cache)))
    _setup_cache[key] = entry
    return entry


def parse_setup_header(packet, id_header):
    """Parse the setup header and build all codec components.

    Reference: StreamDecoder.LoadBooks (226-289), Factory.cs:5-59.
    Returns Setup or None if the signature does not match.
    """
    if not _check_signature(packet, _SIG_SETUP):
        return None

    setup = Setup()
    setup.channels = id_header.channels
    setup.sample_rate = id_header.sample_rate
    setup.block0_size = id_header.block0_size
    setup.block1_size = id_header.block1_size

    from nvorbis_tpu.codec import factory

    books = [
        factory.create_codebook(packet)
        for _ in range(packet.read_bits(8) + 1)
    ]
    setup.codebooks = books

    # time domain transforms: unused by Vorbis, skip 16 bits each
    times = packet.read_bits(6) + 1
    packet.skip_bits(16 * times)

    floors = [
        factory.create_floor(packet, setup.channels, setup.block0_size,
                             setup.block1_size, books)
        for _ in range(packet.read_bits(6) + 1)
    ]
    setup.floors = floors

    residues = [
        factory.create_residue(packet, setup.channels, books)
        for _ in range(packet.read_bits(6) + 1)
    ]
    setup.residues = residues

    mappings = [
        factory.create_mapping(packet, setup.channels, floors, residues)
        for _ in range(packet.read_bits(6) + 1)
    ]
    setup.mappings = mappings

    modes = [
        factory.create_mode(packet, setup.channels, setup.block0_size,
                            setup.block1_size, mappings)
        for _ in range(packet.read_bits(6) + 1)
    ]
    setup.modes = modes

    if not packet.read_bit():
        raise InvalidDataError("Book packet did not end on correct bit!")

    setup.mode_field_bits = ilog(len(modes) - 1)
    return setup
