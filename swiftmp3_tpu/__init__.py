"""swiftmp3_tpu — a TPU-native MPEG-1 Layer III (MP3) encoding framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
SwiftMP3 encoder (mierau/swift-mp3): the granule DSP (polyphase filterbank,
MDCT + aliasing reduction, transient detection, psychoacoustic model,
power-law quantization with rate control, table-15 Huffman sizing) runs as
batched fixed-shape tensor programs on TPU, scaled by encoding many
independent streams per step; the variable-length bitstream (headers, side
info, bit reservoir splicing, Xing/ID3 metadata) is assembled host-side.

Public API parity with the reference:
    MP3Encoder, EncoderSession, MP3EncoderOptions, Mode, ID3Tag
plus TPU-first batch APIs in swiftmp3_tpu.parallel.
"""

from .options import ID3Tag, MP3EncoderOptions, Mode
from .encoder import EncoderSession, MP3Encoder

__version__ = "0.1.0"

__all__ = [
    "EncoderSession",
    "ID3Tag",
    "MP3Encoder",
    "MP3EncoderOptions",
    "Mode",
    "__version__",
]
