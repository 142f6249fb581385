"""Ogg Vorbis stream (re)paginator — fixture/benchmark generation.

Builds valid Ogg pages from raw Vorbis packets: lacing, sequence numbers,
granule positions (computed with the same lapping math the decoder uses,
``NVorbis/Mode.cs:102-117``), BOS/EOS flags, and the Ogg CRC.  Used to
synthesize long-form and multi-stream fixtures from the small bundled ones
(there is no Vorbis *encoder* here — audio content is repeated, which is
bitstream-legal: audio packets only couple through the overlap-add window).
"""

import struct

from nvorbis_tpu.ogg.crc import crc32


def _build_page(packets_with_cont, serial, seq, granule, flags):
    """packets_with_cont: list of (bytes, is_final_lacing_complete)."""
    segs = bytearray()
    body = bytearray()
    for data, complete in packets_with_cont:
        body += data
        n = len(data)
        while n >= 255:
            segs.append(255)
            n -= 255
        if n > 0 or complete:
            segs.append(n)
        # when not complete and the length is an exact multiple of 255, the
        # lacing ends on 255 and the packet continues on the next page
    hdr = struct.pack(
        "<4sBBqIIIB", b"OggS", 0, flags, granule, serial, seq, 0, len(segs)
    )
    page = bytearray(hdr + bytes(segs) + bytes(body))
    crc = crc32(bytes(page))
    page[22:26] = struct.pack("<I", crc)
    return bytes(page)


def paginate(packets, granules, serial=0x6E567462, first_seq=0,
             max_packets_per_page=50, bos_pages=1):
    """Paginate ``packets`` (list of bytes) into a single logical stream.

    ``granules[i]`` is the absolute granule after packet i completes (use -1
    to put no granule mid-stream; the page granule is taken from the last
    packet completing in the page).  The first ``bos_pages`` packets are
    emitted one per page with the BOS flag on the first (Vorbis requires the
    id header alone on the first page).  Returns bytes of the whole stream.
    """
    out = bytearray()
    seq = first_seq
    i = 0
    # header pages (granule 0, like real encoders)
    for b in range(bos_pages):
        flags = 0x02 if b == 0 else 0
        out += _build_page([(packets[i], True)], serial, seq, 0, flags)
        seq += 1
        i += 1
    while i < len(packets):
        group = packets[i : i + max_packets_per_page]
        gr = granules[i + len(group) - 1]
        flags = 0x04 if i + len(group) == len(packets) else 0
        out += _build_page(
            [(p, True) for p in group], serial, seq, gr, flags
        )
        seq += 1
        i += len(group)
    return bytes(out)


def paginate_with_continuations(packets, granules, serial=0x6E567463,
                                chunk=255):
    """Paginate with every large audio packet force-split across >=3 pages
    (mid-packet page boundaries): page lacing ends on 255 to mark the
    continuation, middle pages carry granule -1 and the continuation flag —
    the layout NVorbis stitches in PacketProvider.CreatePacket (324-438) and
    validates in StreamPageReader.AddPage (58-69).

    ``chunk`` must be a multiple of 255 (lacing can only signal an
    incomplete packet at a 255 boundary).
    """
    assert chunk % 255 == 0
    out = bytearray()
    seq = 0
    for i, (pkt, gr) in enumerate(zip(packets, granules)):
        is_first = i == 0
        is_last = i == len(packets) - 1
        bos = 0x02 if is_first else 0
        eos = 0x04 if is_last else 0
        if i < 3 or len(pkt) <= chunk:
            out += _build_page([(pkt, True)], serial, seq,
                               0 if gr == -1 and i < 3 else gr, bos | eos)
            seq += 1
            continue
        # split: first page ends at a 255 boundary (incomplete), middle
        # pages are pure continuation with granule -1, the final page
        # completes the packet and carries the granule.  A rest of exactly
        # zero bytes still needs a completing page (zero lacing value).
        parts = [pkt[:chunk]]
        rest = pkt[chunk:]
        while len(rest) > chunk:
            parts.append(rest[:chunk])
            rest = rest[chunk:]
        parts.append(rest)
        out += _build_page([(parts[0], False)], serial, seq, -1, 0)
        seq += 1
        for mid in parts[1:-1]:
            out += _build_page([(mid, False)], serial, seq, -1, 0x01)
            seq += 1
        out += _build_page([(parts[-1], True)], serial, seq, gr, 0x01 | eos)
        seq += 1
    return bytes(out)


def packet_granules(overlaps):
    """Granule after each audio packet given (start, valid, total) triples.

    Matches the decoder's lapping accounting: the first packet contributes
    no samples; each later packet contributes ``valid - start``
    (``NVorbis/Mode.cs:172-176`` + StreamDecoder position math).
    """
    out = []
    e = 0
    for k, (start, valid, total) in enumerate(overlaps):
        if k > 0:
            e += valid - start
        out.append(e)
    return out


def make_chained_stream(src_path, links, out_path, repeats=1):
    """Create a chained (concatenated logical streams) Ogg file.

    Each link is a full logical stream with its own serial — the reference's
    multi-stream surface (NVorbis/VorbisReader.cs:280-305 FindNextStream /
    SwitchStreams) consumes these.  Returns (out_path, samples_per_link).
    """
    blobs = []
    samples = None
    for k in range(links):
        blob, samples = _repaginate(src_path, repeats, serial=0x1000 + k)
        blobs.append(blob)
    with open(out_path, "wb") as f:
        f.write(b"".join(blobs))
    return out_path, samples


def split_pages(blob: bytes):
    """Split a well-formed Ogg byte stream into its pages."""
    pages = []
    pos = 0
    while pos < len(blob):
        assert blob[pos : pos + 4] == b"OggS", "not at a page boundary"
        seg_count = blob[pos + 26]
        lacing = blob[pos + 27 : pos + 27 + seg_count]
        size = 27 + seg_count + sum(lacing)
        pages.append(blob[pos : pos + size])
        pos += size
    return pages


def interleave_streams(*blobs):
    """Interleave the pages of several single-stream Oggs into one
    multiplexed physical stream (grouped multiplexing: all BOS pages first,
    per the Ogg spec; distinct serials required).

    This is the *multiplexed* (concurrent) layout, as opposed to the
    *chained* layout of make_chained_stream — the reference surfaces each
    serial as its own IStreamDecoder (NVorbis/VorbisReader.cs:74-87).
    """
    paged = [split_pages(b) for b in blobs]
    out = bytearray()
    for pages in paged:  # BOS pages first
        out += pages[0]
    idx = [1] * len(paged)
    remaining = True
    while remaining:
        remaining = False
        for k, pages in enumerate(paged):
            if idx[k] < len(pages):
                out += pages[idx[k]]
                idx[k] += 1
                remaining = True
    return bytes(out)


def make_long_stream(src_path, repeats, out_path, serial=0x6E567462):
    """Create a long single-stream Ogg by repeating a fixture's audio packets.

    Returns (out_path, total_samples).
    """
    blob, total = _repaginate(src_path, repeats, serial)
    with open(out_path, "wb") as f:
        f.write(blob)
    return out_path, total


def _repaginate(src_path, repeats, serial, paginator=paginate):
    """Rebuild one logical stream; returns (blob, total_samples)."""
    import nvorbis_tpu as nv

    r = nv.VorbisReader(src_path, engine="oracle")
    dec = r._stream_decoder
    setup = dec._setup
    prov = dec._packet_provider

    header_pkts = []
    audio_pkts = []
    # walk every raw packet from the stream start (headers first)
    prov._page_index = 0
    prov._packet_index = 0
    prov._skip_packets = 0  # cancel the open's deferred header skip
    while True:
        p = prov.get_next_packet()
        if p is None:
            break
        data = bytes(p.data)
        if len(header_pkts) < 3:
            header_pkts.append(data)
        else:
            audio_pkts.append(data)
        p.done()
    r.dispose()

    # keep decodable audio packets, noting each one's block flag
    from nvorbis_tpu.ogg.packets import Packet
    from nvorbis_tpu.codec.mode import calc_overlap

    keep = []
    flags_long = []
    for data in audio_pkts:
        pk = Packet(data)
        if pk.read_bit():
            continue
        mode = setup.modes[pk.read_bits(setup.mode_field_bits)]
        if mode.get_packet_info(pk) is None:
            continue
        keep.append(data)
        flags_long.append(bool(mode.block_flag))

    all_audio = [bytearray(p) for p in keep * repeats]
    all_long = flags_long * repeats

    # rewrite each long-block packet's prev/next window flags so block-size
    # transitions stay consistent across the repeat seams (the flags are the
    # two bits after the mode number; NVorbis/Mode.cs:130-141)
    mfb = setup.mode_field_bits
    b0, b1 = setup.block0_size, setup.block1_size

    def set_bit(buf, bit, value):
        byte, off = bit >> 3, bit & 7
        if value:
            buf[byte] |= 1 << off
        else:
            buf[byte] &= ~(1 << off)

    all_overlaps = []
    for i, (buf, is_long) in enumerate(zip(all_audio, all_long)):
        if is_long:
            prev_long = all_long[i - 1] if i > 0 else True
            next_long = all_long[i + 1] if i + 1 < len(all_long) else True
            set_bit(buf, 1 + mfb, prev_long)
            set_bit(buf, 2 + mfb, next_long)
            all_overlaps.append(
                calc_overlap(b1 if prev_long else b0, b1, b1 if next_long else b0)
            )
        else:
            all_overlaps.append((0, b0 // 2, b0))

    all_audio = [bytes(b) for b in all_audio]
    granules = packet_granules(all_overlaps)

    # Vorbis: id header alone on page 1; comment+setup may share a page
    packets = header_pkts + all_audio
    pkt_granules = [-1] * len(header_pkts) + granules
    if paginator is paginate:
        blob = paginate(
            packets, pkt_granules, serial=serial, bos_pages=len(header_pkts)
        )
    else:
        blob = paginator(packets, pkt_granules, serial=serial)
    return blob, granules[-1]


def make_continuation_stream(src_path, serial=0x6E567463):
    """Repaginate a fixture with every large packet force-split across
    multiple pages (see paginate_with_continuations).  Returns
    (blob, total_samples) — total per the regenerated granules."""
    return _repaginate(src_path, 1, serial,
                       paginator=paginate_with_continuations)
