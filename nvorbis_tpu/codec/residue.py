"""Vorbis residue decode (types 0/1/2) into dense per-channel spectra.

References: NVorbis/Residue0.cs (setup 35-117, partition/classword cascade
decode 119-178, dimension-major vector write 180-201), Residue1.cs
(interleaved write), Residue2.cs (channel-interleaved single-pass).

Deviation from the reference (documented): per the Vorbis I spec (and
libvorbis/stb_vorbis), channels flagged "do not decode" are skipped when
reading classwords and vectors for residue types 0/1, and residues decode
only the channels of their submap; NVorbis reads classwords for every
channel and uses ForceNoEnergy flags instead (Residue0.cs:134-151,
Mapping.cs:122-133), which desyncs on real multi-submap or silent-channel
streams.  For single-submap streams with energy in all coupled channels —
i.e. virtually every real-world file — the two behaviors are identical.
"""

import numpy as np

from nvorbis_tpu.errors import InvalidDataError
from nvorbis_tpu.utils.bitmath import ilog


class Residue:
    def __init__(self, packet, channels, codebooks, residue_type):
        self.residue_type = residue_type
        self.channels = channels

        self.begin = packet.read_bits(24)
        self.end = packet.read_bits(24)
        self.partition_size = packet.read_bits(24) + 1
        self.classifications = packet.read_bits(6) + 1
        self.classbook = codebooks[packet.read_bits(8)]

        cascade = []
        acc = 0
        for _ in range(self.classifications):
            low_bits = packet.read_bits(3)
            if packet.read_bit():
                bits = (packet.read_bits(5) << 3) | low_bits
            else:
                bits = low_bits
            cascade.append(bits)
            acc += bin(bits).count("1")
        self.cascade = cascade

        book_nums = [packet.read_bits(8) for _ in range(acc)]
        for num in book_nums:
            if codebooks[num].map_type == 0:
                raise InvalidDataError("Residue stage books must have a lookup table")

        entries = self.classbook.entries
        dim = self.classbook.dimensions
        partvals = 1
        for _ in range(dim):
            partvals *= self.classifications
            if partvals > entries:
                raise InvalidDataError("Residue classbook dimensions overflow entries")

        self.books = []
        acc = 0
        max_stage = 0
        for j in range(self.classifications):
            stages = ilog(cascade[j])
            row = [None] * stages
            max_stage = max(max_stage, stages)
            for k in range(stages):
                if cascade[j] & (1 << k):
                    row[k] = codebooks[book_nums[acc]]
                    acc += 1
            self.books.append(row)
        self.max_stages = max_stage

        # decode_map[j] = base-`classifications` digits of j, most significant
        # first (Residue0.cs:101-114)
        decode_map = np.zeros((partvals, dim), dtype=np.int32)
        for j in range(partvals):
            val = j
            mult = partvals // self.classifications
            for k in range(dim):
                deco = val // mult
                val -= deco * mult
                mult //= self.classifications
                decode_map[j, k] = deco
        self.decode_map = decode_map

    # -- decode ---------------------------------------------------------------

    def decode(self, packet, do_not_decode, block_size, buffers):
        """Accumulate residue vectors into ``buffers`` (list of np.float32
        arrays, one per channel in this submap).  Bails gracefully on packet
        truncation, keeping partial data (Residue0.cs:146-149,164-170).
        """
        ch = len(buffers)
        if self.residue_type == 2:
            # all channels interleaved in one pass over blockSize*ch
            if all(do_not_decode):
                return
            n2 = (block_size * ch) // 2
            inter = np.zeros(n2, dtype=np.float32)
            self._decode_channels(packet, [False], n2, [inter], interleave=ch)
            if ch == 1:
                buffers[0] += inter
            else:
                for c in range(ch):
                    buffers[c] += inter[c::ch]
        else:
            self._decode_channels(packet, do_not_decode, block_size // 2, buffers,
                                  interleave=0)

    def _decode_channels(self, packet, do_not_decode, half_size, buffers, interleave):
        end = min(self.end, half_size)
        n = end - self.begin
        if n <= 0 or all(do_not_decode):
            return
        ch = len(buffers)
        psize = self.partition_size
        partitions = n // psize
        cb = self.classbook
        cb_dims = cb.dimensions
        part_words = (partitions + cb_dims - 1) // cb_dims
        cache = [[None] * part_words for _ in range(ch)]
        decode_map = self.decode_map
        cascade = self.cascade
        books = self.books
        active = [c for c in range(ch) if not do_not_decode[c]]

        for stage in range(self.max_stages):
            pi = 0
            ei = 0
            while pi < partitions:
                if stage == 0:
                    for c in active:
                        idx = cb.decode_scalar(packet)
                        if 0 <= idx < len(decode_map):
                            cache[c][ei] = decode_map[idx]
                        else:
                            return  # bad packet: bail, keep partial data
                d = 0
                while pi < partitions and d < cb_dims:
                    offset = self.begin + pi * psize
                    for c in active:
                        cls = int(cache[c][ei][d])
                        if cascade[cls] & (1 << stage):
                            book = books[cls][stage]
                            if book is not None:
                                if self._write_vectors(
                                    book, packet, buffers[c], offset, psize, interleave
                                ):
                                    return  # bad packet: bail
                    d += 1
                    pi += 1
                ei += 1

    def _write_vectors(self, book, packet, res, offset, psize, interleave):
        """Accumulate one partition's vectors; True on packet truncation."""
        dims = book.dimensions
        lookup = book.lookup
        decode = book.decode_scalar

        if self.residue_type == 0:
            # dimension-major: position = offset + dim*steps + step, with
            # steps = psize // dims truncating (Residue0.WriteVectors, 180-201)
            steps = psize // dims
            entries = np.empty(steps, dtype=np.int64)
            for i in range(steps):
                e = decode(packet)
                if e == -1:
                    return True
                entries[i] = e
            res[offset : offset + dims * steps] += lookup[entries].T.ravel()
        else:
            # types 1 and 2: contiguous within the (interleaved) vector
            # (Residue1.cs:8-26; Residue2.cs:23-47 — interleaving handled by
            # the caller's de-interleave).  The reference reads whole vectors
            # until i >= psize, overshooting when dims does not divide psize.
            steps = -(-psize // dims)
            entries = np.empty(steps, dtype=np.int64)
            got = 0
            bail = False
            for i in range(steps):
                e = decode(packet)
                if e == -1:
                    # the reference writes vector-by-vector, so a truncated
                    # packet keeps the vectors read so far (Residue1.cs:14-17)
                    bail = True
                    break
                entries[i] = e
                got += 1
            if got:
                vals = lookup[entries[:got]].ravel()
                stop = min(offset + vals.shape[0], res.shape[0])
                res[offset:stop] += vals[: stop - offset]
            if bail:
                return True
        return False
