"""Exception types for nvorbis_tpu.

The reference surfaces errors as ``InvalidDataException`` /
``ArgumentException`` etc. (e.g. ``NVorbis/StreamDecoder.cs:70-103`` raises a
codec-identifying ``ArgumentException`` for non-Vorbis streams).  We use a
small Python hierarchy instead.
"""


class VorbisError(Exception):
    """Base class for all nvorbis_tpu errors."""


class InvalidDataError(VorbisError):
    """The bitstream violates the Vorbis or Ogg specification."""


class InvalidStreamError(VorbisError):
    """The logical stream is not a Vorbis stream.

    Mirrors the codec-identification hints of the reference
    (``NVorbis/StreamDecoder.cs:70-103``).
    """


class SeekNotSupportedError(VorbisError):
    """Seek requested on a forward-only (non-seekable) source."""


class EndOfStreamError(VorbisError):
    """Data was requested beyond the end of the stream."""


class PreRollPacketError(VorbisError):
    """Could not read the pre-roll packet while seeking.

    Mirrors ``NVorbis/StreamDecoder.cs:609,622``.
    """
