"""Formal interface layer — the contracts the reference pins in
``NVorbis/Contracts/*.cs``, expressed as ``typing.Protocol``.

These are the dependency-injection seams: any object satisfying a protocol
can replace the stock implementation (the reference exposes the same seams
as static ``Create*`` factory functions, SURVEY §1).  The concrete classes
are validated against these protocols in tests/test_contracts.py.

| Protocol          | Reference                              | Stock impl |
|-------------------|----------------------------------------|------------|
| IPacket           | Contracts/IPacket.cs:6-73              | ogg.packets.Packet |
| IPacketProvider   | Contracts/IPacketProvider.cs:13-50     | ogg.packets.PacketProvider / ForwardOnlyPacketProvider |
| IContainerReader  | Contracts/IContainerReader.cs:16-54    | ogg.container.ContainerReader |
| IStreamDecoder    | Contracts/IStreamDecoder.cs:9-105      | stream_decoder.StreamDecoder |
| IVorbisReader     | Contracts/IVorbisReader.cs:10-144      | reader.VorbisReader |
| IStreamStats      | Contracts/IStreamStats.cs:8-49         | stats.StreamStats |
| ITagData          | Contracts/ITagData.cs                  | tags.TagData |
| ISynthesisEngine  | (TPU-native seam; no reference analog) | engine.batcher.JaxPipeline, stream_decoder._OraclePipeline |
"""

from typing import Iterable, Protocol, runtime_checkable


@runtime_checkable
class IPacket(Protocol):
    """LSB-first bit reader over one logical packet
    (Contracts/IPacket.cs:6-73 / DataPacket.cs)."""

    def read_bits(self, count: int) -> int: ...
    def try_peek_bits(self, count: int): ...
    def skip_bits(self, count: int) -> None: ...
    def read_bit(self) -> bool: ...
    def reset(self) -> None: ...
    def done(self) -> None: ...
    # data attributes (not checkable at runtime by isinstance):
    #   granule_position, is_resync, is_short, is_end_of_stream,
    #   bits_read, bits_remaining, container_overhead_bits


@runtime_checkable
class IPacketProvider(Protocol):
    """Packet iterator for one logical stream
    (Contracts/IPacketProvider.cs:13-50)."""

    def get_next_packet(self): ...
    def peek_next_packet(self): ...
    def get_granule_count(self) -> int: ...
    def seek_to(self, granule_pos: int, pre_roll: int,
                get_packet_granules) -> int: ...
    # attributes: can_seek, stream_serial


@runtime_checkable
class IContainerReader(Protocol):
    """Physical container entry point
    (Contracts/IContainerReader.cs:16-54)."""

    def try_init(self) -> bool: ...
    def find_next_stream(self) -> bool: ...
    def get_streams(self) -> list: ...
    def dispose(self) -> None: ...
    # attributes: can_seek, container_bits, waste_bits, new_stream_callback


@runtime_checkable
class IStreamDecoder(Protocol):
    """Per-logical-stream Vorbis decoder
    (Contracts/IStreamDecoder.cs:9-105)."""

    def read(self, buffer, offset: int, count: int) -> int: ...
    def read_samples(self, count=None, buffer=None, offset: int = 0): ...
    def seek_to(self, sample_position: int) -> None: ...
    def dispose(self) -> None: ...
    # properties: channels, sample_rate, upper/nominal/lower_bitrate, tags,
    #   total_samples, total_time, sample_position, time_position,
    #   is_end_of_stream, clip_samples, has_clipped, stats


@runtime_checkable
class IVorbisReader(Protocol):
    """Easy-to-use facade (Contracts/IVorbisReader.cs:10-144)."""

    def read_samples(self, buffer, offset: int = 0, count=None) -> int: ...
    def seek_to(self, sample_position: int) -> None: ...
    def find_next_stream(self) -> bool: ...
    def switch_streams(self, index: int) -> bool: ...
    def dispose(self) -> None: ...
    # properties: channels, sample_rate, tags, streams, total_samples,
    #   total_time, sample_position, time_position, clip_samples,
    #   has_clipped, is_end_of_stream, stream_stats


@runtime_checkable
class IStreamStats(Protocol):
    """Per-stream observability (Contracts/IStreamStats.cs:8-49)."""

    def reset_stats(self) -> None: ...
    def add_packet(self, samples: int, bits: int, waste: int,
                   container: int) -> None: ...
    # properties: effective_bit_rate, instant_bit_rate, audio_bits,
    #   container_bits, overhead_bits, waste_bits, packet_count


@runtime_checkable
class ITagData(Protocol):
    """Vorbis comment access (Contracts/ITagData.cs)."""

    def get_tag_single(self, key: str) -> str: ...
    def get_tag_multi(self, key: str) -> Iterable: ...
    # properties: encoder_vendor, all, title, artist, album, ...


@runtime_checkable
class ISynthesisEngine(Protocol):
    """TPU-native seam: pluggable frame-batch synthesis backend consumed by
    StreamDecoder (no reference analog — NVorbis synthesizes inline)."""

    def next_result(self, need_frames=None): ...
    def reset(self) -> None: ...
