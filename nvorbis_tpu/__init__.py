"""nvorbis_tpu — a TPU-native Ogg Vorbis decode framework.

A from-scratch re-design of the capabilities of NVorbis (the fully managed C#
Ogg Vorbis decoder) for TPU hardware:

- the host plane performs the inherently sequential bit-level work (Ogg page
  framing + CRC, packet assembly, Huffman/codebook symbol decode, floor post
  unwrap, residue vector accumulation);
- the device plane (JAX/XLA) performs all frame synthesis as batched dense
  tensor programs (floor curve render, inverse channel coupling, IMDCT as an
  MXU matmul, windowing), one dispatch per frame batch, sharded across chips
  with ``jax.sharding`` for multi-stream scale-out.

Public API mirrors the semantics of NVorbis's ``VorbisReader`` /
``StreamDecoder`` (see reference ``NVorbis/VorbisReader.cs`` and
``NVorbis/StreamDecoder.cs``).
"""

from nvorbis_tpu.reader import VorbisReader
from nvorbis_tpu.stream_decoder import StreamDecoder
from nvorbis_tpu.ogg.container import ContainerReader
from nvorbis_tpu.tags import TagData
from nvorbis_tpu.stats import StreamStats
from nvorbis_tpu.errors import (
    VorbisError,
    InvalidDataError,
    SeekNotSupportedError,
    EndOfStreamError,
)

__version__ = "0.1.0"

__all__ = [
    "VorbisReader",
    "StreamDecoder",
    "ContainerReader",
    "TagData",
    "StreamStats",
    "VorbisError",
    "InvalidDataError",
    "SeekNotSupportedError",
    "EndOfStreamError",
    "__version__",
]
