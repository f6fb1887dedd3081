"""WebP-lossless (VP8L) decoder: hand-assembled bitstreams per RFC
9649, expected RGBA computed by hand — never a self-encoder. Covers
literals, LZ77 backrefs, the color cache, subtract-green, the
predictor and color transforms, bundled palettes, and container
dispatch; plus hostile-bytes termination."""

import struct
import zlib

import numpy as np

from inform_spark.operators import vp8l


class W:
    """LSB-first bit writer (the VP8L bit order)."""

    def __init__(self):
        self.bits = []

    def b(self, value, nbits):
        for i in range(nbits):
            self.bits.append((value >> i) & 1)
        return self

    def payload(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            v = 0
            for j, bit in enumerate(self.bits[i : i + 8]):
                v |= bit << j
            out.append(v)
        return bytes(out)


def _container(payload):
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _header(w, width, height):
    w.b(0x2F, 8).b(width - 1, 14).b(height - 1, 14).b(0, 1).b(0, 3)


def _simple1(w, sym):
    """One-symbol simple prefix code (zero bits consumed per decode)."""
    w.b(1, 1)          # simple
    w.b(0, 1)          # num_symbols - 1 = 0
    w.b(1, 1)          # first symbol in 8 bits
    w.b(sym, 8)


def _simple2(w, s0, s1):
    """Two-symbol simple code: s0 -> bit 0, s1 -> bit 1 (canonical
    order is by symbol value, so pass s0 < s1)."""
    assert s0 < s1
    w.b(1, 1)
    w.b(1, 1)          # num_symbols - 1 = 1
    w.b(1, 1)
    w.b(s0, 8)
    w.b(s1, 8)


def test_vp8l_literals_two_pixels():
    w = W()
    _header(w, 2, 1)
    w.b(0, 1)  # no transforms
    w.b(0, 1)  # no color cache
    w.b(0, 1)  # no meta-huffman
    _simple2(w, 10, 20)   # green
    _simple1(w, 30)       # red
    _simple1(w, 40)       # blue
    _simple1(w, 255)      # alpha
    _simple1(w, 0)        # distance
    w.b(0, 1)  # pixel 0: green 10
    w.b(1, 1)  # pixel 1: green 20
    got = vp8l.decode_webp(_container(w.payload()))
    assert got.shape == (1, 2, 4)
    assert got[0, 0].tolist() == [30, 10, 40, 255]
    assert got[0, 1].tolist() == [30, 20, 40, 255]


def test_vp8l_backref_distance_map():
    """Literal A then a length-2 backref at mapped distance (1,0) -> 1:
    three copies of A. The length symbol 257 is past the 8-bit simple
    range, so the green code uses the code-length form."""
    w = W()
    _header(w, 3, 1)
    w.b(0, 1)
    w.b(0, 1)
    w.b(0, 1)
    # green code: symbols 10 (literal) and 257 (length slot 1 -> 2),
    # both code length 1 -> canonical 10->0, 257->1
    w.b(0, 1)          # not simple
    w.b(15, 4)         # transmit all 19 CLC lengths
    clc = {s: 0 for s in range(19)}
    clc[1] = 2         # 'length 1'
    clc[17] = 2        # short zero run
    clc[18] = 1        # long zero run
    order = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
             14, 15]
    for sym in order:
        w.b(clc[sym], 3)
    # canonical CLC: 18 -> 0; 1 -> 10; 17 -> 11
    w.b(1, 1)          # max_symbol cap on
    w.b(0, 3)          # length_nbits = 2
    w.b(3, 2)          # max_symbol = 2 + 3 = 5 CLC symbols

    def clc_code(sym):
        for bit in {18: "0", 1: "10", 17: "11"}[sym]:
            w.b(int(bit), 1)

    clc_code(17); w.b(7, 3)       # 10 zeros (0..9)
    clc_code(1)                   # symbol 10: length 1
    clc_code(18); w.b(127, 7)     # 138 zeros (11..148)
    clc_code(18); w.b(97, 7)      # 108 zeros (149..256)
    clc_code(1)                   # symbol 257: length 1
    _simple1(w, 30)
    _simple1(w, 40)
    _simple1(w, 255)
    _simple1(w, 1)  # distance slot 1 -> dcode 2 -> map (1,0) -> dist 1
    w.b(0, 1)  # literal A
    w.b(1, 1)  # backref (length slot 1 = 2, no extra bits)
    got = vp8l.decode_webp(_container(w.payload()))
    assert got.shape == (1, 3, 4)
    assert (got[0] == [30, 10, 40, 255]).all()


def test_vp8l_color_cache():
    a_px = (255 << 24) | (30 << 16) | (10 << 8) | 40
    idx = ((0x1E35A7BD * a_px) & 0xFFFFFFFF) >> 30  # cache_bits=2
    w = W()
    _header(w, 3, 1)
    w.b(0, 1)
    w.b(1, 1)          # color cache present
    w.b(2, 4)          # cache_bits = 2
    w.b(0, 1)          # no meta
    # green alphabet 284: literals 10, 20 and cache symbol 280+idx,
    # all code length 2 -> canonical by symbol: 10->00, 20->01,
    # 280+idx->10. Built via the code-length code with a max_symbol
    # cap so the decoder stops after exactly the 7 CLC symbols below.
    w.b(0, 1)          # not simple
    w.b(15, 4)         # num_clc = 19 (transmit the full CLC order)
    clc = {s: 0 for s in range(19)}
    clc[2] = 2         # emit 'length 2'
    clc[17] = 2        # short zero run (3 + 3 bits)
    clc[18] = 1        # long zero run (11 + 7 bits)
    order = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
             14, 15]
    for sym in order:
        w.b(clc[sym], 3)
    # canonical CLC codes: 18 (len 1) -> 0; 2 (len 2) -> 10; 17 -> 11
    w.b(1, 1)          # use max_symbol cap
    w.b(1, 3)          # length_nbits = 2 + 2*1 = 4
    w.b(5, 4)          # max_symbol = 2 + 5 = 7 CLC symbols

    def clc_code(sym):
        for bit in {18: "0", 2: "10", 17: "11"}[sym]:
            w.b(int(bit), 1)

    clc_code(17); w.b(7, 3)            # 10 zeros (symbols 0..9)
    clc_code(2)                        # symbol 10: length 2
    clc_code(17); w.b(6, 3)            # 9 zeros (11..19)
    clc_code(2)                        # symbol 20: length 2
    n0 = 259 + idx                     # zeros 21..(280+idx-1)
    clc_code(18); w.b(127, 7)          # 138 zeros
    clc_code(18); w.b(n0 - 138 - 11, 7)  # the remaining zeros
    clc_code(2)                        # symbol 280+idx: length 2
    _simple1(w, 30)
    _simple1(w, 40)
    _simple1(w, 255)
    _simple1(w, 0)
    # pixels: A literal (00), cache hit (10), B literal (01) — prefix
    # codes are read MSB-first, one bit per append
    for bit in "00" + "10" + "01":
        w.b(int(bit), 1)
    got = vp8l.decode_webp(_container(w.payload()))
    assert got.shape == (1, 3, 4)
    assert got[0, 0].tolist() == [30, 10, 40, 255]
    assert got[0, 1].tolist() == [30, 10, 40, 255]
    assert got[0, 2].tolist() == [30, 20, 40, 255]


def test_vp8l_subtract_green():
    w = W()
    _header(w, 1, 1)
    w.b(1, 1)  # a transform
    w.b(2, 2)  # SUBTRACT_GREEN
    w.b(0, 1)  # no more transforms
    w.b(0, 1)  # no cache
    w.b(0, 1)  # no meta
    _simple1(w, 100)  # green
    _simple1(w, 10)   # red (coded)
    _simple1(w, 250)  # blue (coded)
    _simple1(w, 255)
    _simple1(w, 0)
    got = vp8l.decode_webp(_container(w.payload()))
    assert got[0, 0].tolist() == [(10 + 100) & 0xFF, 100, (250 + 100) & 0xFF, 255]


def test_vp8l_palette_bundled():
    """2-entry palette -> 8 indices packed per coded pixel; 4x1 image
    with indices [0, 1, 1, 0]."""
    w = W()
    _header(w, 4, 1)
    w.b(1, 1)
    w.b(3, 2)          # COLOR_INDEXING
    w.b(1, 8)          # n_colors - 1 = 1
    # palette image (2x1): entry0 ARGB(255,1,2,3); entry1 delta
    # (0,9,9,9) -> (255,10,11,12). No cache (sub-images read the bit).
    w.b(0, 1)
    _simple2(w, 2, 9)      # green: 2 then 9
    _simple2(w, 1, 9)      # red
    _simple2(w, 3, 9)      # blue
    _simple2(w, 0, 255)    # alpha: delta alpha 0 FIRST entry 255
    _simple1(w, 0)         # distance
    # palette pixel 0: g=2 (bit 0), r=1 (0), b=3 (0), a=255 (bit 1)
    w.b(0, 1).b(0, 1).b(0, 1).b(1, 1)
    # palette pixel 1 (delta): g=9 (1), r=9 (1), b=9 (1), a=0 (0)
    w.b(1, 1).b(1, 1).b(1, 1).b(0, 1)
    w.b(0, 1)  # no more transforms
    # main image: xsize = ceil(4/8) = 1 coded pixel
    w.b(0, 1)  # no cache
    w.b(0, 1)  # no meta
    packed = 0 | (1 << 1) | (1 << 2) | (0 << 3)  # indices 0,1,1,0
    _simple1(w, packed)  # green
    _simple1(w, 0)
    _simple1(w, 0)
    _simple1(w, 255)
    _simple1(w, 0)
    got = vp8l.decode_webp(_container(w.payload()))
    assert got.shape == (1, 4, 4)
    e0, e1 = [1, 2, 3, 255], [10, 11, 12, 255]
    assert got[0].tolist() == [e0, e1, e1, e0]


def test_vp8l_predictor_left_mode():
    w = W()
    _header(w, 2, 1)
    w.b(1, 1)
    w.b(0, 2)          # PREDICTOR
    w.b(0, 3)          # size_bits = 2 -> blocks of 4
    # transform data image 1x1: green channel = mode 1 (L)
    w.b(0, 1)          # no cache
    _simple1(w, 1)     # green = mode
    _simple1(w, 0)
    _simple1(w, 0)
    _simple1(w, 0)
    _simple1(w, 0)
    w.b(0, 1)  # no more transforms
    w.b(0, 1)  # no cache
    w.b(0, 1)  # no meta
    # residuals: pixel0 vs BLACK (0xFF000000): (a0, r50, g60, b70);
    # pixel1 vs L=A0: (0, 1, 2, 3)
    _simple2(w, 2, 60)   # green residuals
    _simple2(w, 1, 50)   # red
    _simple2(w, 3, 70)   # blue
    _simple1(w, 0)       # alpha residual 0 both
    _simple1(w, 0)
    # pixel0: g=60 (bit 1), r=50 (1), b=70 (1)
    w.b(1, 1).b(1, 1).b(1, 1)
    # pixel1: g=2 (0), r=1 (0), b=3 (0)
    w.b(0, 1).b(0, 1).b(0, 1)
    got = vp8l.decode_webp(_container(w.payload()))
    assert got[0, 0].tolist() == [50, 60, 70, 255]
    assert got[0, 1].tolist() == [51, 62, 73, 255]


def test_vp8l_color_transform():
    w = W()
    _header(w, 1, 1)
    w.b(1, 1)
    w.b(1, 2)          # COLOR transform
    w.b(0, 3)          # size_bits = 2
    # transform data 1x1: blue channel = green_to_red = 2
    w.b(0, 1)
    _simple1(w, 0)     # green (g2b = 0)
    _simple1(w, 0)     # red (r2b = 0)
    _simple1(w, 2)     # blue (g2r = 2)
    _simple1(w, 0)
    _simple1(w, 0)
    w.b(0, 1)
    w.b(0, 1)
    w.b(0, 1)
    _simple1(w, 64)    # green
    _simple1(w, 10)    # red (coded)
    _simple1(w, 20)    # blue
    _simple1(w, 255)
    _simple1(w, 0)
    got = vp8l.decode_webp(_container(w.payload()))
    # r = 10 + (2*64 >> 5) = 14; b = 20 (both multipliers 0)
    assert got[0, 0].tolist() == [14, 64, 20, 255]


def test_vp8l_lossy_rejected_and_bad_container():
    import pytest

    lossy = b"RIFF" + struct.pack("<I", 16) + b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    with pytest.raises(ValueError, match="lossy WebP"):
        vp8l.decode_webp(lossy)
    with pytest.raises(ValueError, match="not a WebP"):
        vp8l.decode_webp(b"\x00" * 32)


def test_vp8l_terminates_on_hostile_bytes():
    w = W()
    _header(w, 2, 1)
    w.b(0, 1)
    w.b(0, 1)
    w.b(0, 1)
    _simple2(w, 10, 20)
    _simple1(w, 30)
    _simple1(w, 40)
    _simple1(w, 255)
    _simple1(w, 0)
    w.b(0, 1).b(1, 1)
    valid = _container(w.payload())
    for cut in range(len(valid)):
        try:
            vp8l.decode_webp(valid[:cut])
        except Exception:
            pass
    for i in range(200):
        h = zlib.crc32(f"vp8l-{i}".encode())
        mut = bytearray(valid)
        mut[h % len(valid)] ^= 1 + (h >> 8) % 255
        try:
            vp8l.decode_webp(bytes(mut))
        except Exception:
            pass


def test_vp8l_meta_huffman_groups():
    """9x1 image with 8-pixel meta tiles: tile 0 uses group 0 (green
    10), tile 1 group 1 (green 20); the entropy image's (red<<8)|green
    pixel selects the group."""
    w = W()
    _header(w, 9, 1)
    w.b(0, 1)          # no transforms
    w.b(0, 1)          # no cache
    w.b(1, 1)          # meta-huffman present
    w.b(0, 3)          # meta_bits = 3 -> 8-pixel tiles, 2x1 entropy img
    # entropy sub-image (2x1): greens 0 and 1 (group ids), red 0
    w.b(0, 1)          # sub-image: no cache
    _simple2(w, 0, 1)  # green: group id
    _simple1(w, 0)     # red
    _simple1(w, 0)     # blue
    _simple1(w, 0)     # alpha
    _simple1(w, 0)     # distance
    w.b(0, 1)          # tile 0 -> group 0
    w.b(1, 1)          # tile 1 -> group 1
    # group 0: all singles, green 10
    _simple1(w, 10)
    _simple1(w, 30)
    _simple1(w, 40)
    _simple1(w, 255)
    _simple1(w, 0)
    # group 1: all singles, green 20
    _simple1(w, 20)
    _simple1(w, 31)
    _simple1(w, 41)
    _simple1(w, 254)
    _simple1(w, 0)
    got = vp8l.decode_webp(_container(w.payload()))
    assert got.shape == (1, 9, 4)
    for x in range(8):
        assert got[0, x].tolist() == [30, 10, 40, 255]
    assert got[0, 8].tolist() == [31, 20, 41, 254]


def test_image_features_webp_dispatch(spark):
    """Lossless WebP decodes for real through image_features; lossy VP8
    gets the stub verdict."""
    import pandas as pd

    from inform_spark.operators import multimodal as mm

    w = W()
    _header(w, 2, 1)
    w.b(0, 1)
    w.b(0, 1)
    w.b(0, 1)
    _simple2(w, 10, 20)
    _simple1(w, 30)
    _simple1(w, 40)
    _simple1(w, 255)
    _simple1(w, 0)
    w.b(0, 1).b(1, 1)
    lossless = _container(w.payload())
    lossy = (
        b"RIFF" + struct.pack("<I", 16) + b"WEBP" + b"VP8 "
        + struct.pack("<I", 4) + b"\x00" * 4
    )
    media = spark.createDataFrame(
        pd.DataFrame({
            "media_ref": ["a.webp", "b.webp"],
            "doc_id": ["1", "1"],
            "kind": ["image", "image"],
            "content": [lossless, lossy],
            "content_len": [len(lossless), len(lossy)],
            "format": ["webp", "webp"],
        }),
        schema=mm.MEDIA,
    )
    got = {r["media_ref"]: r for r in mm.image_features(media).collect()}
    assert got["a.webp"]["decode_ok"] == "ok"
    assert got["a.webp"]["width"] == 2 and got["a.webp"]["height"] == 1
    # luma of (30,10,40) and (30,20,40): .299*30+.587*g+.114*40
    want = (0.299 * 30 + 0.587 * 10 + 0.114 * 40
            + 0.299 * 30 + 0.587 * 20 + 0.114 * 40) / 2
    assert abs(got["a.webp"]["mean_luma"] - round(want, 3)) < 1e-3
    assert got["b.webp"]["decode_ok"] == "stub"
