"""Pure-numpy media codecs for UNCOMPRESSED formats: PPM (P6), BMP
(24-bit BI_RGB), WAV (PCM16).

These are the REAL decode kernels behind functions/multimodal.py — chosen
because their wire formats are trivial enough to parse with numpy alone
(the container has no Pillow/ffmpeg; compressed formats stay stubbed and
clearly marked there). Each decoder is exact: tests encode known arrays
and assert bit-identical round-trips.

Everything here is executor-side library code (no Spark imports) — the
multimodal kernels call it inside Arrow-batched ``mapInPandas``.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# PPM (P6 binary): header "P6\n<w> <h>\n<maxval>\n" + raw RGB bytes
# ---------------------------------------------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6, maxval 255)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_ppm expects (h, w, 3)")
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_ppm(buf: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8. Handles comments and arbitrary
    whitespace in the header per the netpbm spec (maxval must be < 256)."""
    if buf[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        # skip whitespace and '#' comments
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":
            while pos < len(buf) and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval, then raw data
    w, h, maxval = fields
    if maxval >= 256:
        raise ValueError("16-bit PPM not supported")
    data = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=pos)
    return data.reshape(h, w, 3).copy()


# ---------------------------------------------------------------------------
# BMP: BITMAPFILEHEADER(14) + BITMAPINFOHEADER(40), 24-bit, BI_RGB,
# rows bottom-up, BGR order, 4-byte row padding
# ---------------------------------------------------------------------------


def encode_bmp24(arr: np.ndarray) -> bytes:
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_bmp24 expects (h, w, 3)")
    h, w, _ = a.shape
    row_bytes = (w * 3 + 3) & ~3
    pad = row_bytes - w * 3
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        body += a[y, :, ::-1].tobytes()  # RGB → BGR
        body += b"\x00" * pad
    offset = 14 + 40
    size = offset + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + bytes(body)


def decode_bmp24(buf: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (h, w, 3) uint8 RGB. Supports bottom-up
    (positive height, the common layout) and top-down (negative)."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack_from("<I", buf, 10)
    bi_size, w, h_signed = struct.unpack_from("<Iii", buf, 14)
    bitcount, compression = struct.unpack_from("<HI", buf, 28)
    if bitcount != 24 or compression != 0:
        raise ValueError("only 24-bit BI_RGB BMP supported")
    h = abs(h_signed)
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(buf, dtype=np.uint8, count=h * row_bytes, offset=offset)
    rows = rows.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:
        rows = rows[::-1]  # bottom-up → top-down
    return rows[:, :, ::-1].copy()  # BGR → RGB


# ---------------------------------------------------------------------------
# WAV: RIFF container, PCM 16-bit little-endian
# ---------------------------------------------------------------------------


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n,) or (n, channels) int16 → RIFF/WAVE PCM16."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()  # interleaved
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm16(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 → ((n, channels) int16, sample_rate). Walks the
    chunk list (ignoring LIST/INFO etc.) per the RIFF spec."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sample_rate = n_channels = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", buf, pos + 4)
        payload = buf[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, n_channels, sample_rate = struct.unpack_from("<HHI", payload, 0)
            (bits,) = struct.unpack_from("<H", payload, 14)
            if audio_fmt != 1 or bits != 16:
                raise ValueError("only PCM16 WAV supported")
        elif cid == b"data":
            data = payload
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if data is None or sample_rate is None:
        raise ValueError("missing fmt/data chunk")
    s = np.frombuffer(data, dtype="<i2")
    return s.reshape(-1, n_channels).copy(), sample_rate


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


def sniff_format(buf: bytes) -> str | None:
    """'ppm' | 'bmp' | 'wav' | None by magic bytes."""
    if buf[:2] == b"P6":
        return "ppm"
    if buf[:2] == b"BM":
        return "bmp"
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        return "wav"
    return None


def decode_image(buf: bytes) -> np.ndarray:
    """Decode any supported uncompressed image format by magic."""
    fmt = sniff_format(buf)
    if fmt == "ppm":
        return decode_ppm(buf)
    if fmt == "bmp":
        return decode_bmp24(buf)
    raise ValueError(f"unsupported image format: {buf[:4]!r}")


def resize_nearest(arr: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index maps — pure numpy, the
    deterministic baseline kernel (no interpolation ambiguity across
    libraries)."""
    h, w = arr.shape[:2]
    ys = (np.arange(target_h) * h // target_h).clip(0, h - 1)
    xs = (np.arange(target_w) * w // target_w).clip(0, w - 1)
    return arr[ys[:, None], xs[None, :]]
