"""Component factory: wire-type codes -> codec component constructors.

Mirrors NVorbis/Factory.cs:5-59 (floor type 0/1 dispatch 22-31, residue type
0/1/2 dispatch 48-58, mapping type 0 only 33-41) as the injection seam the
reference exposes through IFactory — tests or alternate builds can swap
constructors here without touching the setup parser.
"""

from nvorbis_tpu.errors import InvalidDataError
from nvorbis_tpu.codec.codebook import Codebook
from nvorbis_tpu.codec.floor import Floor0, Floor1
from nvorbis_tpu.codec.residue import Residue
from nvorbis_tpu.codec.mapping import Mapping
from nvorbis_tpu.codec.mode import Mode

_FLOOR_TYPES = {0: Floor0, 1: Floor1}
_RESIDUE_TYPES = (0, 1, 2)


def create_codebook(packet):
    return Codebook(packet)


def create_floor(packet, channels, block0_size, block1_size, codebooks):
    """Reads the 16-bit floor type then builds Floor0/Floor1
    (Factory.cs:22-31)."""
    floor_type = packet.read_bits(16)
    cls = _FLOOR_TYPES.get(floor_type)
    if cls is None:
        raise InvalidDataError(f"Invalid floor type {floor_type}")
    return cls(packet, channels, block0_size, block1_size, codebooks)


def create_residue(packet, channels, codebooks):
    """Reads the 16-bit residue type then builds the residue
    (Factory.cs:48-58)."""
    residue_type = packet.read_bits(16)
    if residue_type not in _RESIDUE_TYPES:
        raise InvalidDataError(f"Invalid residue type {residue_type}")
    return Residue(packet, channels, codebooks, residue_type)


def create_mapping(packet, channels, floors, residues):
    """Mapping type must be 0 (Factory.cs:33-41)."""
    mapping_type = packet.read_bits(16)
    if mapping_type != 0:
        raise InvalidDataError(f"Invalid mapping type {mapping_type}")
    return Mapping(packet, channels, floors, residues)


def create_mode(packet, channels, block0_size, block1_size, mappings):
    return Mode(packet, channels, block0_size, block1_size, mappings)
