"""Zero-dependency media codecs: 24-bit uncompressed BMP and 16-bit PCM
WAV, in pure ``struct`` + numpy.

Both container formats are public, trivial, and library-free, which makes
the multimodal pipeline's decode step REAL for uncompressed payloads in
this sandbox (no PIL/soundfile/ffmpeg available): images decode to
``uint8 [H, W, 3]`` arrays, audio to ``int16`` sample arrays.  Compressed
codecs (JPEG/PNG/MP4/…) still require external libraries and raise
``NotImplementedError`` in :func:`evalidate_spark.functions.multimodal`'s
strict mode.

Format notes:

* BMP: ``BM`` header + BITMAPINFOHEADER (40 bytes), 24 bpp, BI_RGB
  (uncompressed), rows bottom-up, BGR byte order, rows padded to 4-byte
  multiples.
* WAV: ``RIFF``/``WAVE`` with a 16-byte PCM ``fmt `` chunk (mono,
  16-bit) followed by a ``data`` chunk.
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np

BMP_HEADER_SIZE = 14
DIB_HEADER_SIZE = 40


def encode_bmp(pixels: np.ndarray) -> bytes:
    """uint8 ``[H, W, 3]`` RGB → 24-bit uncompressed BMP bytes."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected [H, W, 3] RGB array")
    h, w = px.shape[:2]
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # bottom-up rows, BGR order, padded
    bgr = px[::-1, :, ::-1]
    rows = bytearray()
    zero = b"\x00" * pad
    for r in range(h):
        rows += bgr[r].tobytes() + zero
    image_size = len(rows)
    offset = BMP_HEADER_SIZE + DIB_HEADER_SIZE
    header = struct.pack("<2sIHHI", b"BM", offset + image_size, 0, 0, offset)
    dib = struct.pack(
        "<IiiHHIIiiII", DIB_HEADER_SIZE, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    return header + dib + bytes(rows)


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → uint8 ``[H, W, 3]`` RGB array."""
    if len(data) < BMP_HEADER_SIZE + DIB_HEADER_SIZE or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", data, 10)[0]
    dib_size, w, h, planes, bpp, compression = struct.unpack_from("<IiiHHI", data, 14)
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only 24-bit uncompressed BMP supported")
    flip = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    px = np.zeros((h, w, 3), dtype=np.uint8)
    for r in range(h):
        row = np.frombuffer(data, dtype=np.uint8, count=row_bytes, offset=offset + r * stride)
        px[r] = row.reshape(w, 3)
    if flip:
        px = px[::-1]
    return px[:, :, ::-1].copy()  # BGR → RGB


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbour resample via numpy index maps (no interpolation
    libraries needed; deterministic)."""
    h, w = pixels.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return pixels[ys][:, xs]


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 mono samples → PCM WAV bytes."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = rate * 2
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, byte_rate, 2, 16)
    data = struct.pack("<4sI", b"data", len(pcm)) + pcm
    riff = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE")
    return riff + fmt + data


def decode_wav(data: bytes) -> Tuple[np.ndarray, int]:
    """PCM WAV bytes → (int16 sample array, sample rate).  Walks the RIFF
    chunk list, so extra chunks (LIST/INFO) are tolerated."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if audio_fmt != 1 or bits != 16 or channels != 1:
                raise NotImplementedError("only mono 16-bit PCM supported")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size % 2)
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return samples, rate
