"""parseoggvorbis_tpu — a TPU-native Ogg Vorbis decode framework.

A ground-up rebuild of the capabilities of albertz/ParseOggVorbis for TPU:

* host front-end (Python + C++ native module) for the bit-serial layers:
  Ogg framing/CRC, packet demux, setup parsing, Huffman/VQ symbol decode;
* batched JAX/XLA/Pallas device back-end for the numeric layers: floor
  synthesis, residue accumulation, channel coupling, inverse MDCT, window +
  overlap-add — over [streams, frames, channels] batches;
* the reference's debug-callback observability layer (bit-compatible binary
  dump format) so every intermediate stage diffs against patched libvorbis;
* corpus-scale batched feature extraction (RETURNN-style floor/residue
  features) with device-mesh data parallelism;
* production surfaces beyond the reference: sample-exact random access
  (ogg/seek.py) incl. batched crops and ranged feature extraction, a
  deterministic training input pipeline (data.CropLoader), a
  corruption-tolerant recovery decode (ogg/recover.py), a batching HTTP
  decode/feature server (serving.py), and bounded-memory streaming.
"""

from .runtime.decoder import OggReader, ParseCallbacks, VorbisStream  # noqa: F401
from .vorbis.header import IdHeader  # noqa: F401
from .vorbis.setup import Setup  # noqa: F401

__version__ = "0.1.0"


def ogg_vorbis_full_read(filename: str, callbacks: "ParseCallbacks" = None):
    """Decode a whole Ogg Vorbis file (C-API equivalent convenience)."""
    cb = callbacks if callbacks is not None else ParseCallbacks()
    reader = OggReader(cb)
    reader.full_read(filename)
    return reader


def ogg_vorbis_full_read_from_memory(data: bytes, callbacks: "ParseCallbacks" = None):
    cb = callbacks if callbacks is not None else ParseCallbacks()
    reader = OggReader(cb)
    reader.full_read_from_memory(data)
    return reader
