from nvorbis_tpu.utils.bitmath import (
    ilog,
    bit_reverse,
    vorbis_float32,
    CLIP_LIMIT,
)

__all__ = ["ilog", "bit_reverse", "vorbis_float32", "CLIP_LIMIT"]
