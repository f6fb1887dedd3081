"""Pure-stdlib media codecs: PNG, BMP, WAV — no PIL/ffmpeg required.

The sandbox has no imaging/audio libraries and no network route to any
package index (re-verified every round in BASELINE.md), but three of the
most common container formats are decodable with nothing beyond
``struct`` + ``zlib`` + numpy:

- **PNG** (ISO/IEC 15948): 8-bit gray/gray+alpha/RGB/RGBA,
  non-interlaced — IHDR parse, zlib-inflate of IDAT, scanline filter
  reconstruction (types 0-4 incl. Paeth, per the spec §9).
- **BMP** (BITMAPINFOHEADER): 24/32-bpp uncompressed, bottom-up or
  top-down, 4-byte row padding.
- **WAV** (RIFF): PCM 16-bit fmt/data chunk walk.

These are REAL decoders — byte-exact against the public specs, tested
with hand-filtered scanlines and hand-padded rows — so the multimodal
pipeline's decode path is no longer environment-blocked for these
formats. JPEG/MP4 stay behind the deterministic stub until a real
codec library exists in the environment (the one-function seam in
operators/multimodal.py is unchanged).

Perf note: filter reconstruction for types 1/3/4 is a per-byte Python
loop (the recurrence is sequential by construction); type 0/2 rows are
vectorized. Fine for thumbnails and fixtures; a production deployment
would swap PIL/turbojpeg into the same seam for hot-path decoding.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(b: bytes) -> bool:
    return len(b) > 8 and b[:8] == PNG_SIG


def is_bmp(b: bytes) -> bool:
    return len(b) > 26 and b[:2] == b"BM"


def is_wav(b: bytes) -> bool:
    return len(b) > 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE"


def decode_png(b: bytes) -> np.ndarray:
    """PNG -> (h, w, channels) uint8 array. Supports 8-bit depth, color
    types 0/2/4/6, non-interlaced. Raises ValueError on anything else."""
    if not is_png(b):
        raise ValueError("not a PNG")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(b):
        ln, typ = struct.unpack(">I4s", b[pos : pos + 8])
        pos += 8
        data = b[pos : pos + ln]
        pos += ln + 4  # payload + CRC
        if typ == b"IHDR":
            meta = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if meta is None:
        raise ValueError("missing IHDR")
    w, h, depth, color, comp, filt, interlace = meta
    if depth != 8 or interlace != 0 or comp != 0 or color not in _PNG_CHANNELS:
        raise ValueError(
            f"unsupported PNG variant (depth={depth} color={color} "
            f"interlace={interlace})"
        )
    nch = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        f = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        if f == 0:
            pass
        elif f == 2:  # Up — vectorizable (no intra-row recurrence)
            line = bytearray(
                (np.frombuffer(bytes(line), np.uint8) + prev).astype(np.uint8)
                .tobytes()
            )
        elif f == 1:  # Sub
            for i in range(nch, stride):
                line[i] = (line[i] + line[i - nch]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                line[i] = (line[i] + ((a + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth (spec §9.4)
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                up = int(prev[i])
                c = int(prev[i - nch]) if i >= nch else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = up
                else:
                    pr = c
                line[i] = (line[i] + pr) & 0xFF
        else:
            raise ValueError(f"bad filter type {f}")
        out[y] = np.frombuffer(bytes(line), np.uint8)
        prev = out[y]
    return out.reshape(h, w, nch)


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> PNG bytes (filter 0, one IDAT)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_png expects (h, w, 3) uint8")
    h, w, _ = arr.shape
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_bmp(b: bytes) -> np.ndarray:
    """BMP -> (h, w, 3) uint8 RGB. 24/32-bpp uncompressed
    BITMAPINFOHEADER, bottom-up (h > 0) or top-down (h < 0)."""
    if not is_bmp(b):
        raise ValueError("not a BMP")
    data_off = struct.unpack("<I", b[10:14])[0]
    w, h_signed = struct.unpack("<ii", b[18:26])
    bpp = struct.unpack("<H", b[28:30])[0]
    compression = struct.unpack("<I", b[30:34])[0]
    if bpp not in (24, 32) or compression != 0 or w <= 0:
        raise ValueError(f"unsupported BMP (bpp={bpp} comp={compression})")
    flip = h_signed > 0
    h = abs(h_signed)
    nb = bpp // 8
    stride = ((w * nb + 3) // 4) * 4
    if data_off + stride * h > len(b):
        raise ValueError("truncated BMP")
    out = np.empty((h, w, 3), dtype=np.uint8)
    for y in range(h):
        row = np.frombuffer(
            b[data_off + y * stride : data_off + y * stride + w * nb],
            np.uint8,
        ).reshape(w, nb)
        out[h - 1 - y if flip else y] = row[:, [2, 1, 0]]  # BGR -> RGB
    return out


def decode_wav(b: bytes) -> dict:
    """WAV -> {sample_rate, n_channels, n_frames, duration_ms, rms}
    for PCM 16-bit (format tag 1)."""
    if not is_wav(b):
        raise ValueError("not a WAV")
    pos = 12
    fmt = None
    frames = None
    while pos + 8 <= len(b):
        cid, ln = struct.unpack("<4sI", b[pos : pos + 8])
        pos += 8
        payload = b[pos : pos + ln]
        pos += ln + (ln & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            tag, nch, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", payload[:16]
            )
            if tag != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (tag={tag} bits={bits})")
            fmt = (nch, rate)
        elif cid == b"data":
            frames = np.frombuffer(
                payload[: len(payload) // 2 * 2], dtype="<i2"
            )
    if fmt is None or frames is None:
        raise ValueError("missing fmt/data chunk")
    nch, rate = fmt
    n_frames = len(frames) // nch
    rms = float(np.sqrt(np.mean(frames.astype(np.float64) ** 2))) if len(frames) else 0.0
    return {
        "sample_rate": rate,
        "n_channels": nch,
        "n_frames": n_frames,
        "duration_ms": n_frames * 1000 // rate if rate else 0,
        "rms": round(rms, 3),
    }


def to_gray(arr: np.ndarray) -> np.ndarray:
    """(h, w, c) uint8 -> (h, w) float64 luma (ITU-R BT.601 for color;
    channel 0 for gray/gray+alpha)."""
    if arr.shape[2] >= 3:
        return (
            0.299 * arr[:, :, 0].astype(np.float64)
            + 0.587 * arr[:, :, 1].astype(np.float64)
            + 0.114 * arr[:, :, 2].astype(np.float64)
        )
    return arr[:, :, 0].astype(np.float64)


def block_mean_resize(g: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-style downscale by block means (indices partitioned with
    integer boundaries — deterministic, no float resampling kernels)."""
    h, w = g.shape[:2]
    ys = [h * i // out_h for i in range(out_h + 1)]
    xs = [w * j // out_w for j in range(out_w + 1)]
    out = np.empty((out_h, out_w) + g.shape[2:], dtype=np.float64)
    for i in range(out_h):
        for j in range(out_w):
            y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
            x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
            out[i, j] = g[y0:y1, x0:x1].mean(axis=(0, 1))
    return out


def average_phash(g: np.ndarray) -> int:
    """64-bit average hash: block-mean the luma to 8x8, set bit
    (8*i + j) when the block exceeds the 8x8 mean; masked to 63 bits so
    the value fits Spark's signed LongType."""
    small = block_mean_resize(g, 8, 8)
    mean = small.mean()
    bits = 0
    for i in range(8):
        for j in range(8):
            if small[i, j] > mean:
                bits |= 1 << (i * 8 + j)
    return bits & 0x7FFFFFFFFFFFFFFF
