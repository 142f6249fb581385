"""Synthetic Vorbis stream builder: construct valid id/comment/setup headers
and audio packets bit-by-bit, for configurations the bundled fixtures never
exercise (Floor0, Residue0/2, >2 channels with coupling, multi-submap,
extreme block sizes).

This is the test-generation counterpart of the decode grammar in
``codec/setup.py`` / ``codec/floor.py`` / ``codec/residue.py`` (reference:
NVorbis/StreamDecoder.cs:226-289, Floor1.cs:30-184, Floor0.cs:28-150,
Residue0.cs:35-178, Mapping.cs:16-93, Mode.cs:24-67).  It emits the exact
wire format those parsers read; symbol choices are driven by a seeded RNG so
tests are reproducible.  Encoded packets round-trip through the real decoder
(oracle and device engines), giving end-to-end coverage for codec topologies
without shipping binary fixtures.
"""

from nvorbis_tpu.codec.codebook import compute_codewords
from nvorbis_tpu.utils.bitmath import ilog
from nvorbis_tpu.testgen.ogg_writer import paginate


class BitWriter:
    """LSB-first bit accumulator (the Vorbis transmission order that
    ``ogg/bitreader.py`` consumes)."""

    def __init__(self):
        self._bytes = bytearray()
        self._bucket = 0
        self._count = 0

    def write(self, value: int, bits: int):
        if bits < 0 or (bits < 64 and value >= (1 << bits)):
            raise ValueError(f"value {value} does not fit in {bits} bits")
        self._bucket |= (value & ((1 << bits) - 1)) << self._count
        self._count += bits
        while self._count >= 8:
            self._bytes.append(self._bucket & 0xFF)
            self._bucket >>= 8
            self._count -= 8

    def write_bytes(self, data: bytes):
        for b in data:
            self.write(b, 8)

    def to_bytes(self) -> bytes:
        out = bytes(self._bytes)
        if self._count:
            out += bytes([self._bucket & ((1 << self._count) - 1)])
        return out


class BookSpec:
    """A codebook the writer can both emit (header) and encode symbols with.

    ``lengths=None`` builds a complete equal-length code over ``entries``
    (entries must be a power of two); VQ fields mirror the decode grammar
    (NVorbis/Codebook.cs:222-283).
    """

    def __init__(self, dims, entries, lengths=None, map_type=0,
                 min_value=0.0, delta=1.0, value_bits=4, sequence_p=False,
                 mults=None, ordered=False, sparse=False):
        self.dims = dims
        self.entries = entries
        if lengths is None:
            L = max(1, ilog(entries - 1))
            if (1 << L) != entries:
                raise ValueError("auto lengths need power-of-two entries")
            lengths = [L] * entries
        self.lengths = lengths
        self.ordered = ordered    # emit the run-length "ordered" header form
        self.sparse = sparse      # emit per-entry used flags; length -1 = unused
        if ordered and (sparse or any(
            lengths[i] > lengths[i + 1] for i in range(len(lengths) - 1)
        )):
            raise ValueError("ordered books need non-decreasing lengths")
        codes = compute_codewords(lengths)
        if codes is None:
            raise ValueError("over-subscribed code space")
        self.codes = codes
        self.map_type = map_type
        self.min_value = min_value
        self.delta = delta
        self.value_bits = value_bits
        self.sequence_p = sequence_p
        if map_type == 1:
            count = self._lookup1_values()
        elif map_type == 2:
            count = entries * dims
        else:
            count = 0
        if mults is None and count:
            mults = [(i * 7 + 3) % (1 << value_bits) for i in range(count)]
        self.mults = mults

    def _lookup1_values(self) -> int:
        import math

        r = int(math.floor(math.exp(math.log(self.entries) / self.dims)))
        if math.floor((r + 1) ** self.dims) <= self.entries:
            r += 1
        return r

    def emit(self, bw: BitWriter):
        bw.write(0x564342, 24)
        bw.write(self.dims, 16)
        bw.write(self.entries, 24)
        if self.ordered:
            # run-length form: initial length, then counts of entries at
            # each successive length (codec/codebook.py _read_lengths)
            bw.write(1, 1)
            bw.write(self.lengths[0] - 1, 5)
            i = 0
            length = self.lengths[0]
            while i < self.entries:
                cnt = 0
                while (i + cnt < self.entries
                       and self.lengths[i + cnt] == length):
                    cnt += 1
                bw.write(cnt, ilog(self.entries - i))
                i += cnt
                length += 1
        else:
            bw.write(0, 1)
            bw.write(1 if self.sparse else 0, 1)
            for ln in self.lengths:
                if self.sparse:
                    bw.write(1 if ln > 0 else 0, 1)
                    if ln > 0:
                        bw.write(ln - 1, 5)
                else:
                    bw.write(ln - 1, 5)
        bw.write(self.map_type, 4)
        if self.map_type:
            bw.write(_float32_pack(self.min_value), 32)
            bw.write(_float32_pack(self.delta), 32)
            bw.write(self.value_bits - 1, 4)
            bw.write(1 if self.sequence_p else 0, 1)
            for m in self.mults:
                bw.write(m, self.value_bits)

    def encode(self, bw: BitWriter, entry: int):
        if self.lengths[entry] <= 0:
            raise ValueError(f"entry {entry} is unused (sparse)")
        bw.write(self.codes[entry], self.lengths[entry])

    def random_entry(self, rng) -> int:
        """A uniformly random *used* entry (sparse books skip unused)."""
        used = [i for i, ln in enumerate(self.lengths) if ln > 0]
        return used[int(rng.integers(0, len(used)))]


def _float32_pack(x: float) -> int:
    """Inverse of ``utils.bitmath.vorbis_float32`` (NVorbis/Utils.cs:45-59):
    sign(1) | exponent(10, bias 788) | mantissa(21)."""
    if x == 0.0:
        return 788 << 21  # mantissa 0 decodes to 0 regardless of exponent
    sign = 1 if x < 0 else 0
    x = abs(x)
    # decode is mantissa * 2^(E - 788): find integer mantissa + exponent
    e = 788
    m = float(x)
    while m != int(m) and e > 0:
        m *= 2.0
        e -= 1
    m = int(m)
    while m >= (1 << 21):
        if m & 1:
            raise ValueError(f"cannot represent {x} as vorbis float")
        m >>= 1
        e += 1
    if m != int(m) or e < 0 or e >= 1024:
        raise ValueError(f"cannot represent {x} as vorbis float")
    return (sign << 31) | (e << 21) | m


class Floor1Spec:
    """Floor type 1 config; ``post_books`` is one BookSpec reused for every
    subclass (class_subclasses=0 keeps the classword plumbing out of the
    test's way while still exercising the post decode loop)."""

    floor_type = 1

    def __init__(self, range_bits=8, partitions=2, class_dim=2, post_book=None):
        self.range_bits = range_bits
        self.partitions = partitions
        self.class_dim = class_dim
        self.post_book = post_book  # BookSpec with entries >= range used
        self.multiplier_code = 0    # range 256, y_bits 8
        n_posts = partitions * class_dim
        # unique X positions strictly inside (0, 1<<range_bits)
        step = ((1 << range_bits) - 2) // (n_posts + 1)
        if step < 1:
            raise ValueError("range_bits too small for post count")
        self.x_values = [(i + 1) * step + 1 for i in range(n_posts)]
        self.post_count = n_posts + 2

    def emit_config(self, bw: BitWriter, book_index: int):
        bw.write(self.partitions, 5)
        for _ in range(self.partitions):
            bw.write(0, 4)  # all partitions use class 0
        # class 0: dims, subclasses=0, one subclass book
        bw.write(self.class_dim - 1, 3)
        bw.write(0, 2)
        bw.write(book_index + 1, 8)
        bw.write(self.multiplier_code, 2)
        bw.write(self.range_bits, 4)
        for x in self.x_values:
            bw.write(x, self.range_bits)

    def encode_packet(self, bw: BitWriter, rng, silent=False):
        if silent:
            bw.write(0, 1)
            return
        bw.write(1, 1)
        y_bits = 8  # multiplier_code 0 -> range 256
        bw.write(int(rng.integers(0, 256)), y_bits)
        bw.write(int(rng.integers(0, 256)), y_bits)
        book = self.post_book
        for _ in range(self.partitions):
            for _ in range(self.class_dim):
                book.encode(bw, book.random_entry(rng))


class Floor0Spec:
    """Floor type 0 (LSP) config.  ``books`` hold VQ coefficients."""

    floor_type = 0

    def __init__(self, order=6, rate=48000, bark_map_size=64, amp_bits=6,
                 amp_ofs=100, book=None):
        self.order = order
        self.rate = rate
        self.bark_map_size = bark_map_size
        self.amp_bits = amp_bits
        self.amp_ofs = amp_ofs
        self.book = book

    def emit_config(self, bw: BitWriter, book_index: int):
        bw.write(self.order, 8)
        bw.write(self.rate, 16)
        bw.write(self.bark_map_size, 16)
        bw.write(self.amp_bits, 6)
        bw.write(self.amp_ofs, 8)
        bw.write(0, 4)  # num_books - 1
        bw.write(book_index, 8)

    def encode_packet(self, bw: BitWriter, rng, silent=False):
        if silent:
            bw.write(0, self.amp_bits)
            return
        bw.write(int(rng.integers(1, 1 << self.amp_bits)), self.amp_bits)
        # book_bits = ilog(len(books)) with one book -> 1 bit, book 0
        bw.write(0, ilog(1))
        book = self.book
        count = -(-self.order // book.dims)
        for _ in range(count):
            book.encode(bw, book.random_entry(rng))


class ResidueSpec:
    """Residue config: one classbook + per-class stage books.

    ``stage_books[cls][stage]`` is a BookSpec or None; the cascade bitmap is
    derived from it.  The encode loop mirrors the decoder's interleaved
    stage-0 classword order (NVorbis/Residue0.cs:119-178).
    """

    def __init__(self, residue_type, begin, end, partition_size,
                 classifications, classbook, stage_books):
        self.residue_type = residue_type
        self.begin = begin
        self.end = end
        self.partition_size = partition_size
        self.classifications = classifications
        self.classbook = classbook
        self.stage_books = stage_books
        self.max_stages = max(
            (len(row) for row in stage_books), default=0
        )
        self.cascade = []
        for row in stage_books:
            bits = 0
            for s, b in enumerate(row):
                if b is not None:
                    bits |= 1 << s
            self.cascade.append(bits)

    def emit_config(self, bw: BitWriter, book_index_of):
        bw.write(self.begin, 24)
        bw.write(self.end, 24)
        bw.write(self.partition_size - 1, 24)
        bw.write(self.classifications - 1, 6)
        bw.write(book_index_of(self.classbook), 8)
        for bits in self.cascade:
            low = bits & 0x7
            high = bits >> 3
            bw.write(low, 3)
            if high:
                bw.write(1, 1)
                bw.write(high, 5)
            else:
                bw.write(0, 1)
        for row in self.stage_books:
            for b in row:
                if b is not None:
                    bw.write(book_index_of(b), 8)

    def encode_packet(self, bw: BitWriter, rng, channel_count, block_size,
                      do_not_decode):
        """Mirror of Residue._decode_channels' read order."""
        if self.residue_type == 2:
            if all(do_not_decode):
                return
            half = (block_size * channel_count) // 2
            dnd = [False]
            n_ch = 1
        else:
            half = block_size // 2
            dnd = do_not_decode
            n_ch = channel_count
        end = min(self.end, half)
        n = end - self.begin
        if n <= 0 or all(dnd):
            return
        psize = self.partition_size
        partitions = n // psize
        cb = self.classbook
        cb_dims = cb.dims
        part_words = -(-partitions // cb_dims)
        active = [c for c in range(n_ch) if not dnd[c]]
        # choose classes per (channel, partition)
        classes = rng.integers(
            0, self.classifications, size=(n_ch, partitions)
        )

        for stage in range(self.max_stages):
            pi = 0
            ei = 0
            while pi < partitions:
                if stage == 0:
                    for c in active:
                        idx = 0
                        for d in range(cb_dims):
                            k = pi + d
                            cls = int(classes[c][k]) if k < partitions else 0
                            idx = idx * self.classifications + cls
                        cb.encode(bw, idx)
                d = 0
                while pi < partitions and d < cb_dims:
                    for c in active:
                        cls = int(classes[c][pi])
                        if self.cascade[cls] & (1 << stage):
                            book = self.stage_books[cls][stage]
                            if book is not None:
                                if self.residue_type == 0:
                                    steps = psize // book.dims
                                else:
                                    steps = -(-psize // book.dims)
                                for _ in range(steps):
                                    book.encode(bw, book.random_entry(rng))
                    d += 1
                    pi += 1
                ei += 1


class MappingSpec:
    def __init__(self, couplings=(), mux=None, submaps=((0, 0),)):
        """``submaps``: tuple of (floor_index, residue_index) per submap;
        ``mux``: channel -> submap (None = all zero)."""
        self.couplings = list(couplings)
        self.submaps = list(submaps)
        self.mux = mux

    def emit_config(self, bw: BitWriter, channels: int):
        if len(self.submaps) > 1:
            bw.write(1, 1)
            bw.write(len(self.submaps) - 1, 4)
        else:
            bw.write(0, 1)
        if self.couplings:
            bw.write(1, 1)
            bw.write(len(self.couplings) - 1, 8)
            bits = ilog(channels - 1)
            for mag, ang in self.couplings:
                bw.write(mag, bits)
                bw.write(ang, bits)
        else:
            bw.write(0, 1)
        bw.write(0, 2)  # reserved
        if len(self.submaps) > 1:
            mux = self.mux or [0] * channels
            for c in range(channels):
                bw.write(mux[c], 4)
        for floor_idx, residue_idx in self.submaps:
            bw.write(0, 8)  # time placeholder
            bw.write(floor_idx, 8)
            bw.write(residue_idx, 8)


class ModeSpec:
    def __init__(self, block_flag: int, mapping_index: int = 0):
        self.block_flag = block_flag
        self.mapping_index = mapping_index

    def emit_config(self, bw: BitWriter):
        bw.write(self.block_flag, 1)
        bw.write(0, 16)  # window type
        bw.write(0, 16)  # transform type
        bw.write(self.mapping_index, 8)


class StreamSpec:
    """A complete synthetic codec configuration."""

    def __init__(self, channels, sample_rate, block0, block1,
                 books, floors, residues, mappings, modes):
        self.channels = channels
        self.sample_rate = sample_rate
        self.block0 = block0
        self.block1 = block1
        self.books = books
        self.floors = floors
        self.residues = residues
        self.mappings = mappings
        self.modes = modes

    def book_index_of(self, book):
        return self.books.index(book)

    # -- headers --------------------------------------------------------------

    def id_header(self) -> bytes:
        bw = BitWriter()
        bw.write(1, 8)
        bw.write_bytes(b"vorbis")
        bw.write(0, 32)  # version
        bw.write(self.channels, 8)
        bw.write(self.sample_rate, 32)
        bw.write(0, 32)
        bw.write(0, 32)
        bw.write(0, 32)
        bw.write(ilog(self.block0 - 1), 4)
        bw.write(ilog(self.block1 - 1), 4)
        bw.write(1, 1)  # framing
        return bw.to_bytes()

    def comment_header(self, vendor=b"nvorbis_tpu testgen") -> bytes:
        bw = BitWriter()
        bw.write(3, 8)
        bw.write_bytes(b"vorbis")
        bw.write(len(vendor), 32)
        bw.write_bytes(vendor)
        bw.write(0, 32)  # no comments
        bw.write(1, 1)
        return bw.to_bytes()

    def setup_header(self) -> bytes:
        bw = BitWriter()
        bw.write(5, 8)
        bw.write_bytes(b"vorbis")
        bw.write(len(self.books) - 1, 8)
        for b in self.books:
            b.emit(bw)
        bw.write(0, 6)  # one time transform
        bw.write(0, 16)
        bw.write(len(self.floors) - 1, 6)
        for f in self.floors:
            bw.write(f.floor_type, 16)
            if f.floor_type == 1:
                f.emit_config(bw, self.book_index_of(f.post_book))
            else:
                f.emit_config(bw, self.book_index_of(f.book))
        bw.write(len(self.residues) - 1, 6)
        for r in self.residues:
            bw.write(r.residue_type, 16)
            r.emit_config(bw, self.book_index_of)
        bw.write(len(self.mappings) - 1, 6)
        for m in self.mappings:
            bw.write(0, 16)  # mapping type
            m.emit_config(bw, self.channels)
        bw.write(len(self.modes) - 1, 6)
        for m in self.modes:
            m.emit_config(bw)
        bw.write(1, 1)  # framing
        return bw.to_bytes()

    # -- audio ----------------------------------------------------------------

    def audio_packet(self, rng, mode_index, prev_flag=1, next_flag=1,
                     silent_channels=()) -> bytes:
        """Encode one audio packet with random (seeded) symbols.

        ``silent_channels``: channels whose floor transmits no energy
        (exercises the do-not-decode and coupling no-energy paths).
        """
        bw = BitWriter()
        bw.write(0, 1)  # audio packet
        bw.write(mode_index, ilog(len(self.modes) - 1))
        mode = self.modes[mode_index]
        if mode.block_flag:
            bw.write(prev_flag, 1)
            bw.write(next_flag, 1)
        mapping = self.mappings[mode.mapping_index]
        mux = mapping.mux or [0] * self.channels

        no_energy = [c in silent_channels for c in range(self.channels)]
        for c in range(self.channels):
            floor = self.floors[mapping.submaps[mux[c]][0]]
            floor.encode_packet(bw, rng, silent=no_energy[c])

        # no-energy propagation through couplings: one in-order pass, a
        # coupled pair decodes if either side has energy
        # (NVorbis/Mapping.cs:112-119; codec/frames.py does the same)
        dnd = list(no_energy)
        for mag, ang in mapping.couplings:
            if not dnd[mag] or not dnd[ang]:
                dnd[mag] = dnd[ang] = False

        block_size = self.block1 if mode.block_flag else self.block0
        for s, (floor_idx, residue_idx) in enumerate(mapping.submaps):
            residue = self.residues[residue_idx]
            ch = [c for c in range(self.channels) if mux[c] == s]
            residue.encode_packet(
                bw, rng, len(ch), block_size, [dnd[c] for c in ch]
            )
        return bw.to_bytes()

    def build_stream(self, rng, n_packets, serial=0x74657374,
                     silent_schedule=None, mode_schedule=None) -> bytes:
        """Emit a complete one-stream Ogg: headers + ``n_packets`` audio
        packets with truthful window flags and granules.

        ``mode_schedule``: explicit per-packet mode indices (list, cycled if
        shorter than ``n_packets``); default is seeded-random.  Note a stream
        whose first two packets are long-then-short hits a documented
        NVorbis/libvorbis divergence: NVorbis suppresses the first packet's
        whole valid region (StreamDecoder.cs:449 ``_prevPacketStart =
        validLen``) so the long primer's transition surplus
        ((block1-block0)/4 samples) is never emitted, while libvorbis's
        pairwise granule accounting keeps it.
        """
        if mode_schedule is not None:
            flags = [mode_schedule[i % len(mode_schedule)]
                     for i in range(n_packets)]
        else:
            flags = [int(rng.integers(0, len(self.modes)))
                     for _ in range(n_packets)]
        packets = [self.id_header(), self.comment_header(), self.setup_header()]
        granules = [-1, -1, -1]
        pos = 0
        prev_half = None
        for i, mode_index in enumerate(flags):
            mode = self.modes[mode_index]
            bs = self.block1 if mode.block_flag else self.block0
            prev_f = 1 if (i > 0 and self.modes[flags[i - 1]].block_flag) else 0
            next_f = 1 if (i + 1 < n_packets
                           and self.modes[flags[i + 1]].block_flag) else 0
            silent = ()
            if silent_schedule is not None:
                silent = silent_schedule(i)
            packets.append(
                self.audio_packet(rng, mode_index, prev_f, next_f, silent)
            )
            # granule accounting: samples contributed = (prev + cur)/4
            if prev_half is not None:
                pos += (prev_half + bs // 2) // 2
            granules.append(pos if i > 0 else 0)
            prev_half = bs // 2
        return paginate(packets, granules, serial=serial, bos_pages=3)


# -- prefab configurations ----------------------------------------------------


def make_simple_spec(channels=2, sample_rate=44100, block0=256, block1=2048,
                     residue_type=2, couplings=None, n_stages=2,
                     floor_type=1, floor_range_bits=None):
    """A reasonable single-mapping spec covering the requested topology.

    By default the floor's X range is fitted to the SHORT block (x_list
    values <= block0/2) so that every post lies inside both block sizes'
    spectra.  Posts beyond n exercise a corner where NVorbis and libvorbis
    genuinely disagree: NVorbis clamps the segment end to n *before*
    computing the Bresenham slope (Floor1.cs:205 ``Math.Min(hx, n)``) while
    libvorbis keeps the true slope and merely stops writing at n
    (floor1.c render_line).  We match NVorbis; pass ``floor_range_bits=8``
    to build streams that exercise that documented divergence.
    """
    if floor_range_bits is None:
        floor_range_bits = max(3, (block0 // 2).bit_length() - 1)
    post_book = BookSpec(1, 256)
    classbook = BookSpec(2, 16)  # 4 classifications^2 = 16 entries
    vq1 = BookSpec(4, 16, map_type=1, min_value=-2.0, delta=0.25,
                   value_bits=5)
    vq2 = BookSpec(2, 16, map_type=2, min_value=-1.0, delta=0.125,
                   value_bits=5)
    stage_books = [
        [vq1, vq2][:n_stages],
        [None, vq2][:n_stages],
        [vq1, None][:n_stages],
        [None, None][:n_stages],
    ]
    books = [post_book, classbook, vq1, vq2]
    if floor_type == 1:
        floor = Floor1Spec(range_bits=floor_range_bits, partitions=2,
                           class_dim=2, post_book=post_book)
    else:
        # Floor0 needs physically-plausible data or the LSP filter response
        # overflows to inf (as it would in the reference): fixed ascending
        # LSP roots via a single-entry cumulative (sequence_p) book, a small
        # amplitude offset to bound the resonance gain, and small residue
        # books so unclipped magnitudes stay O(10).
        f0book = BookSpec(2, 2, lengths=[1, 1], map_type=1, min_value=0.25,
                          delta=0.0625, value_bits=3, sequence_p=True,
                          mults=[4])
        books.append(f0book)
        floor = Floor0Spec(order=2, rate=sample_rate,
                           bark_map_size=max(8, block0 // 4), amp_ofs=10,
                           book=f0book)
        vq1 = BookSpec(4, 16, map_type=1, min_value=-0.015625,
                       delta=2.0 ** -8, value_bits=5)
        vq2 = BookSpec(2, 16, map_type=2, min_value=-0.015625,
                       delta=2.0 ** -8, value_bits=5)
        stage_books = [
            [vq1, vq2][:n_stages],
            [None, vq2][:n_stages],
            [vq1, None][:n_stages],
            [None, None][:n_stages],
        ]
        books = [post_book, classbook, vq1, vq2, f0book]
    n2 = block0 // 2  # keep coded range inside the SHORT block for type 0/1
    coded = (block0 * channels) // 2 if residue_type == 2 else n2
    psize = max(4, coded // 8)
    residue = ResidueSpec(
        residue_type, begin=0, end=coded, partition_size=psize,
        classifications=4, classbook=classbook, stage_books=stage_books,
    )
    if couplings is None:
        couplings = [(0, 1)] if channels >= 2 else []
    mapping = MappingSpec(couplings=couplings)
    modes = [ModeSpec(0), ModeSpec(1)] if block1 != block0 else [ModeSpec(0)]
    return StreamSpec(channels, sample_rate, block0, block1,
                      books, [floor], [residue], [mapping], modes)
