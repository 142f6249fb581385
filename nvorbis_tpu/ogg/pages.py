"""Ogg physical page framing: sync scan, CRC verify, lacing parse.

Reference behaviors mirrored from NVorbis/Ogg/PageReaderBase.cs and
NVorbis/Ogg/PageReader.cs:

- byte-wise scan for the "OggS" capture pattern, counting every skipped byte
  as 8 waste bits and flagging the eventually-found page as a resync
  (PageReaderBase.cs:227-292);
- CRC-32 verification with the checksum field zeroed (PageReaderBase.cs:33-70);
- short reads retried up to 10 zero-length reads, for network streams
  (PageReaderBase.cs:174-188);
- packet counting from the lacing table where zero-length packets are not
  counted, and a page is "continued" when its final lacing value is 255
  (PageReader.cs:27-64);
- page re-reads at a known offset skip the CRC (it was verified during the
  initial scan; PageReader.cs:160-187).
"""

import struct

from nvorbis_tpu.ogg.crc import page_crc

CAPTURE = b"OggS"

# header flags (Ogg spec)
FLAG_CONTINUES_PACKET = 0x01
FLAG_BEGINNING_OF_STREAM = 0x02
FLAG_END_OF_STREAM = 0x04

_HDR = struct.Struct("<4sBBqiiIB")  # capture, version, flags, granule, serial, seqno, crc, segcnt


class RawPage:
    """One parsed Ogg page (header + body bytes)."""

    __slots__ = (
        "buf",
        "offset",
        "is_resync",
        "_packets",
        "flags",
        "granule_pos",
        "serial",
        "seq_no",
        "seg_count",
        "packet_count",
        "is_continued",
        "overhead",
    )

    def __init__(self, buf: bytes, offset: int, is_resync: bool):
        (_, _version, flags, granule, serial, seqno, _crc, segcnt) = _HDR.unpack_from(buf, 0)
        self.buf = buf
        self.offset = offset
        self.is_resync = is_resync
        self.flags = flags
        self.granule_pos = granule
        self.serial = serial
        self.seq_no = seqno
        self.seg_count = segcnt

        # count packets per NVorbis ParsePageHeader: zero-length packets are
        # skipped; a trailing 255 lacing value marks a continued packet.
        lacing = buf[27 : 27 + segcnt]
        pkt_cnt = 0
        size = 0
        for seg in lacing:
            size += seg
            if seg < 255:
                if size > 0:
                    pkt_cnt += 1
                size = 0
        is_continued = False
        if size > 0:
            is_continued = lacing[-1] == 255
            pkt_cnt += 1
        self.packet_count = pkt_cnt
        self.is_continued = is_continued
        self.overhead = 27 + segcnt
        self._packets = None  # lazy memo of packets()

    @property
    def is_eos(self) -> bool:
        return (self.flags & FLAG_END_OF_STREAM) != 0

    @property
    def is_bos(self) -> bool:
        return (self.flags & FLAG_BEGINNING_OF_STREAM) != 0

    @property
    def is_continuation(self) -> bool:
        return (self.flags & FLAG_CONTINUES_PACKET) != 0

    def packets(self):
        """Return the page's packet payloads as a list of bytes (memoized —
        providers re-consult the same page once per packet).

        The final entry is a partial packet when ``is_continued``.
        """
        if self._packets is not None:
            return self._packets
        lacing = self.buf[27 : 27 + self.seg_count]
        base = 27 + self.seg_count
        out = []
        pos = 0
        size = 0
        for seg in lacing:
            size += seg
            if seg < 255:
                if size > 0:
                    out.append(self.buf[base + pos : base + pos + size])
                    pos += size
                size = 0
        if size > 0:
            out.append(self.buf[base + pos : base + pos + size])
        self._packets = out
        return out


def ensure_read(stream, count: int, max_tries: int = 10) -> bytes:
    """Read exactly ``count`` bytes unless the stream dies (10 empty reads).

    Reference: NVorbis/Ogg/PageReaderBase.cs:174-188.
    """
    chunks = []
    got = 0
    tries = 0
    while got < count:
        chunk = stream.read(count - got)
        if not chunk:
            tries += 1
            if tries == max_tries:
                break
            continue
        chunks.append(chunk)
        got += len(chunk)
    return b"".join(chunks)


class PageScanner:
    """Forward scanner that yields CRC-verified pages from a byte stream.

    Works identically for seekable and non-seekable sources; all waste/resync
    accounting lives here.  ``waste_bits`` counts skipped garbage;
    ``container_bits`` is credited by the caller for accepted pages.
    """

    _READ_CHUNK = 65536

    def __init__(self, stream):
        self._stream = stream
        self._buf = bytearray()
        self._buf_offset = 0  # stream offset of _buf[0]
        self._eof = False
        self.waste_bits = 0
        try:
            self._seekable = bool(stream.seekable())
        except AttributeError:
            self._seekable = False

    @property
    def position(self) -> int:
        """Stream offset of the next unscanned byte."""
        return self._buf_offset

    def _fill(self, need: int) -> bool:
        """Ensure at least ``need`` bytes are buffered; False on hard EOF."""
        if self._seekable and len(self._buf) < need and not self._eof:
            # other components (read_page_at) may have moved the stream;
            # always read from the end of our buffered window
            self._stream.seek(self._buf_offset + len(self._buf))
        while len(self._buf) < need and not self._eof:
            data = ensure_read(self._stream, max(self._READ_CHUNK, need - len(self._buf)))
            if not data:
                self._eof = True
                break
            self._buf += data
        return len(self._buf) >= need

    def _discard(self, count: int) -> None:
        del self._buf[:count]
        self._buf_offset += count

    def next_page(self):
        """Scan forward to the next valid page; returns RawPage or None."""
        is_resync = False
        while True:
            # find the capture pattern
            if not self._fill(27):
                if self._buf:
                    self.waste_bits += 8 * len(self._buf)
                    self._discard(len(self._buf))
                return None
            idx = self._buf.find(CAPTURE)
            if idx < 0:
                # keep the last 3 bytes in case the capture spans reads
                drop = len(self._buf) - 3
                self.waste_bits += 8 * drop
                is_resync = True
                self._discard(drop)
                if self._eof:
                    self.waste_bits += 8 * len(self._buf)
                    self._discard(len(self._buf))
                    return None
                continue
            if idx > 0:
                self.waste_bits += 8 * idx
                is_resync = True
                self._discard(idx)
            # have capture at buffer start; need full header
            if not self._fill(27):
                self.waste_bits += 8 * len(self._buf)
                self._discard(len(self._buf))
                return None
            seg_cnt = self._buf[26]
            hdr_len = 27 + seg_cnt
            if not self._fill(hdr_len):
                # truncated header at EOF: skip the capture byte and rescan
                self.waste_bits += 8
                is_resync = True
                self._discard(1)
                continue
            data_len = sum(self._buf[27:hdr_len])
            page_len = hdr_len + data_len
            if not self._fill(page_len):
                self.waste_bits += 8
                is_resync = True
                self._discard(1)
                continue
            page = bytes(self._buf[:page_len])
            crc_stored = int.from_bytes(page[22:26], "little")
            if page_crc(page) != crc_stored:
                # bad page (or fake sync inside packet data): advance one byte
                self.waste_bits += 8
                is_resync = True
                self._discard(1)
                continue
            offset = self._buf_offset
            self._discard(page_len)
            return RawPage(page, offset, is_resync)


def read_page_at(stream, offset: int):
    """Re-read a page at a known-good offset (no CRC; header re-verified).

    Reference: NVorbis/Ogg/PageReader.cs:160-187 + GetPackets 219-232.
    Returns RawPage or None.
    """
    stream.seek(offset)
    hdr = ensure_read(stream, 27)
    if len(hdr) < 27 or hdr[:4] != CAPTURE:
        return None
    seg_cnt = hdr[26]
    lacing = ensure_read(stream, seg_cnt)
    if len(lacing) < seg_cnt:
        return None
    data_len = sum(lacing)
    body = ensure_read(stream, data_len)
    if len(body) < data_len:
        return None
    return RawPage(hdr + lacing + body, offset, False)
