"""Per-stream decode statistics.

Reference: NVorbis/StreamStats.cs — effective/instant bitrate, audio /
header / container / waste bit counters, packet count.
"""

import threading


class StreamStats:
    def __init__(self):
        self._lock = threading.Lock()
        self._sample_rate = 0
        self.reset_stats()

    def reset_stats(self):
        with self._lock:
            self._packet_bits = [0, 0]
            self._packet_samples = [0, 0]
            self._packet_index = 0
            self._packet_count = 0
            self._audio_bits = 0
            self._total_samples = 0
            self._header_bits = 0
            self._container_bits = 0
            self._waste_bits = 0

    def set_sample_rate(self, sample_rate: int):
        with self._lock:
            self._sample_rate = sample_rate
        self.reset_stats()

    def add_packet(self, samples: int, bits: int, waste: int, container: int):
        with self._lock:
            if samples >= 0:
                self._audio_bits += bits
                self._waste_bits += waste
                self._container_bits += container
                self._total_samples += samples
                self._packet_bits[self._packet_index] = bits + waste
                self._packet_samples[self._packet_index] = samples
                self._packet_index = (self._packet_index + 1) % 2
                self._packet_count += 1
            else:
                self._header_bits += bits
                self._waste_bits += waste
                self._container_bits += container

    def add_window(self, samples, bits, waste, container):
        """Batched :meth:`add_packet` over parallel sequences — one lock
        round-trip per decode window instead of per packet.  Equivalent to
        calling add_packet per element (all samples here are >= 0)."""
        n = len(samples)
        if n == 0:
            return
        with self._lock:
            self._audio_bits += int(sum(bits))
            self._waste_bits += int(sum(waste))
            self._container_bits += int(sum(container))
            self._total_samples += int(sum(samples))
            self._packet_count += n
            # instant bitrate tracks the last two packets
            for k in range(max(0, n - 2), n):
                self._packet_bits[self._packet_index] = bits[k] + waste[k]
                self._packet_samples[self._packet_index] = samples[k]
                self._packet_index = (self._packet_index + 1) % 2

    @property
    def effective_bit_rate(self) -> int:
        with self._lock:
            samples = self._total_samples
            bits = self._audio_bits + self._header_bits + self._container_bits + self._waste_bits
        if samples > 0:
            return int(bits / samples * self._sample_rate)
        return 0

    @property
    def instant_bit_rate(self) -> int:
        with self._lock:
            bits = sum(self._packet_bits)
            samples = sum(self._packet_samples)
        if samples > 0:
            return int(bits / samples * self._sample_rate)
        return 0

    @property
    def container_bits(self):
        return self._container_bits

    @property
    def overhead_bits(self):
        return self._header_bits

    @property
    def audio_bits(self):
        return self._audio_bits

    @property
    def waste_bits(self):
        return self._waste_bits

    @property
    def packet_count(self):
        return self._packet_count
