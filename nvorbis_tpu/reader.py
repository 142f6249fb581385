"""VorbisReader: the easy-to-use facade over the container + stream decoders.

Mirrors NVorbis/VorbisReader.cs: open a file/stream, auto-discover the first
logical stream, expose its properties, multi-stream management
(``find_next_stream`` / ``switch_streams`` / ``new_stream_callback``), seek,
and interleaved ``read_samples``.
"""

import numpy as np

from nvorbis_tpu.errors import VorbisError
from nvorbis_tpu.ogg.container import ContainerReader
from nvorbis_tpu.stream_decoder import StreamDecoder


class NewStreamEventArgs:
    """Passed to ``new_stream_callback``; set ``ignore_stream`` to reject.

    Reference: NVorbis/NewStreamEventArgs.cs.
    """

    def __init__(self, stream_decoder):
        self.stream_decoder = stream_decoder
        self.ignore_stream = False


class ParameterChangeEventArgs:
    """Legacy event payload (channel/rate change mid-stream); the current
    design surfaces a *new stream* instead, matching the reference which
    carries this type only for 0.9-era API compatibility.

    Reference: NVorbis/Contracts/ParameterChangeEventArgs.cs:8-30.
    """

    def __init__(self, channels=None, sample_rate=None):
        self.channels = channels
        self.sample_rate = sample_rate


class VorbisReader:
    def __init__(self, source, close_on_dispose: bool = True, engine: str = "auto"):
        """Open ``source`` (file path, bytes, or binary file-like)."""
        self._decoders = []
        self._engine = engine
        self.new_stream = None  # callback: NewStreamEventArgs -> None
        self._last_stream_error = None

        container = ContainerReader(source, close_on_dispose)
        container.new_stream_callback = self._process_new_stream
        if not container.try_init() or not self._decoders:
            container.new_stream_callback = None
            container.dispose()
            if self._last_stream_error is not None:
                # surface the codec-identification hint
                # (reference: StreamDecoder.cs:70-103 propagates out of the
                # VorbisReader constructor)
                raise self._last_stream_error
            raise VorbisError("Could not load the specified container!")
        self._container = container
        self._stream_decoder = self._decoders[0]

    def _process_new_stream(self, packet_provider) -> bool:
        try:
            decoder = StreamDecoder(packet_provider, engine=self._engine)
        except VorbisError as e:
            # skip non-Vorbis logical streams (more tolerant than the
            # reference, which aborts the whole container); keep the error
            # for the no-streams-found case
            self._last_stream_error = e
            return False
        decoder.clip_samples = True
        ea = NewStreamEventArgs(decoder)
        if self.new_stream is not None:
            self.new_stream(ea)
        if not ea.ignore_stream:
            self._decoders.append(decoder)
            return True
        return False

    def dispose(self):
        for d in self._decoders:
            d.dispose()
        self._decoders.clear()
        if self._container is not None:
            self._container.new_stream_callback = None
            self._container.dispose()
            self._container = None

    close = dispose

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.dispose()

    # -- streams ---------------------------------------------------------------

    @property
    def streams(self):
        return list(self._decoders)

    @property
    def stream_count(self) -> int:
        """Discovered logical stream count (0.9-era API compat;
        VorbisReader.cs:156-210)."""
        return len(self._decoders)

    @property
    def stream_index(self) -> int:
        return self._decoders.index(self._stream_decoder)

    def find_next_stream(self) -> bool:
        if self._container is None:
            return False
        return self._container.find_next_stream()

    def switch_streams(self, index: int) -> bool:
        """Switch the facade to another logical stream; True if the new
        stream's parameters differ.  Reference: VorbisReader.SwitchStreams
        (291-305)."""
        if index < 0 or index >= len(self._decoders):
            raise IndexError("stream index out of range")
        new_decoder = self._decoders[index]
        old_decoder = self._stream_decoder
        if new_decoder is old_decoder:
            return False
        new_decoder.clip_samples = old_decoder.clip_samples
        self._stream_decoder = new_decoder
        return (
            new_decoder.channels != old_decoder.channels
            or new_decoder.sample_rate != old_decoder.sample_rate
        )

    # -- obsolete 0.9-era API compat (VorbisReader.cs:156-210, 369) -------------

    @property
    def vendor(self) -> str:
        """Deprecated: use ``tags.encoder_vendor`` (VorbisReader.cs:157)."""
        return self._stream_decoder.tags.encoder_vendor

    @property
    def comments(self):
        """Deprecated: flat ``KEY=value`` list; use ``tags.all``
        (VorbisReader.cs:163)."""
        return [
            f"{key}={item}"
            for key, items in self._stream_decoder.tags.all.items()
            for item in items
        ]

    @property
    def is_parameter_change(self) -> bool:
        """Unsupported, as in the reference (VorbisReader.cs:169): parameter
        changes surface as a *new stream* instead."""
        raise NotImplementedError(
            "No longer supported. Will receive a new stream when parameters "
            "change."
        )

    def clear_parameter_change(self) -> None:
        """Unsupported, as in the reference (VorbisReader.cs:369)."""
        raise NotImplementedError("No longer needed.")

    @property
    def decoded_time(self) -> float:
        """Deprecated: use ``time_position`` (VorbisReader.cs:195-200)."""
        return self._stream_decoder.time_position

    @decoded_time.setter
    def decoded_time(self, value: float):
        self.time_position = value

    @property
    def decoded_position(self) -> int:
        """Deprecated: use ``sample_position`` (VorbisReader.cs:205-210)."""
        return self._stream_decoder.sample_position

    @decoded_position.setter
    def decoded_position(self, value: int):
        self.sample_position = value

    # -- convenience properties (first/selected stream) ---------------------------

    @property
    def channels(self) -> int:
        return self._stream_decoder.channels

    @property
    def sample_rate(self) -> int:
        return self._stream_decoder.sample_rate

    @property
    def upper_bitrate(self) -> int:
        return self._stream_decoder.upper_bitrate

    @property
    def nominal_bitrate(self) -> int:
        return self._stream_decoder.nominal_bitrate

    @property
    def lower_bitrate(self) -> int:
        return self._stream_decoder.lower_bitrate

    @property
    def tags(self):
        return self._stream_decoder.tags

    @property
    def container_overhead_bits(self) -> int:
        return self._container.container_bits if self._container else 0

    @property
    def container_waste_bits(self) -> int:
        return self._container.waste_bits if self._container else 0

    @property
    def total_time(self) -> float:
        return self._stream_decoder.total_time

    @property
    def total_samples(self) -> int:
        return self._stream_decoder.total_samples

    @property
    def time_position(self) -> float:
        return self._stream_decoder.time_position

    @time_position.setter
    def time_position(self, value: float):
        self._stream_decoder.time_position = value

    @property
    def sample_position(self) -> int:
        return self._stream_decoder.sample_position

    @sample_position.setter
    def sample_position(self, value: int):
        self._stream_decoder.sample_position = value

    @property
    def is_end_of_stream(self) -> bool:
        return self._stream_decoder.is_end_of_stream

    @property
    def clip_samples(self) -> bool:
        return self._stream_decoder.clip_samples

    @clip_samples.setter
    def clip_samples(self, value: bool):
        self._stream_decoder.clip_samples = value

    @property
    def has_clipped(self) -> bool:
        return self._stream_decoder.has_clipped

    @property
    def stream_stats(self):
        return self._stream_decoder.stats

    # -- decode ---------------------------------------------------------------

    def seek_to(self, sample_position: int) -> None:
        self._stream_decoder.seek_to(sample_position)

    def seek_to_time(self, seconds: float) -> None:
        self._stream_decoder.seek_to_time(seconds)

    def read_samples(self, buffer: np.ndarray, offset: int = 0, count: int = None) -> int:
        """Read interleaved samples; ``count`` is truncated to a whole-sample
        boundary (VorbisReader.cs:336-345).  Returns floats written."""
        if count is None:
            count = len(buffer) - offset
        count -= count % self._stream_decoder.channels
        if count > 0:
            return self._stream_decoder.read(buffer, offset, count)
        return 0

    def read_all(self, max_samples: int = None) -> np.ndarray:
        """Decode the remainder of the stream; returns interleaved float32.

        On a freshly opened jax-engine reader this takes the bulk path:
        whole-stream synthesis + overlap-add on device, one fused program per
        ~2048-frame chunk (see engine/bulk.py)."""
        if max_samples is None:
            pcm = self._stream_decoder.decode_all()
            if pcm is not None:
                return pcm
        channels = self.channels
        chunks = []
        chunk = np.zeros(65536 * channels, dtype=np.float32)
        total = 0
        while True:
            n = self.read_samples(chunk)
            if n == 0:
                break
            chunks.append(chunk[:n].copy())
            total += n
            if max_samples is not None and total >= max_samples * channels:
                break
        if not chunks:
            return np.zeros(0, dtype=np.float32)
        return np.concatenate(chunks)
