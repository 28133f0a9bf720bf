"""Baseline TIFF decode + fixture encoder, pure stdlib+NumPy (the
public Adobe TIFF 6.0 specification) — the scanned-document corpus
format next to PNG/JPEG/WebP.

Scope: both byte orders (II/MM), stripped images, 8-bit samples,
PhotometricInterpretation 1 (grayscale BlackIsZero, widened to RGB),
2 (RGB) and 3 (palette via ColorMap), Compression 1 (none), 32773
(PackBits) and 5 (TIFF-LZW — MSB-first codes, 256=Clear/257=EOI, the
spec's EarlyChange width bump one code early), Predictor 2 (horizontal
differencing). Multi-strip images honored via RowsPerStrip. Honest
NotImplementedError: tiled images, 1/4/16-bit samples, CCITT/JPEG
compressions, planar configuration 2.

Citations: Adobe "TIFF Revision 6.0" (1992, public); the LZW variant
is §13 (note the MSB-first packing and EarlyChange — both DIFFER from
GIF's LZW, which is why operators/multimodal.py's GIF decoder is not
reused). No reference counterpart (SURVEY §2-H engine growth).
"""

from __future__ import annotations

import struct


def _unpackbits(data: bytes, expected: int) -> bytes:
    """PackBits (TIFF §9): n in [0,127] -> copy n+1 literal bytes;
    n in [-127,-1] (two's complement) -> repeat next byte 1-n times;
    -128 is a no-op."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ValueError(f"PackBits strip truncated: {len(out)} < {expected}")
    return bytes(out[:expected])


def _lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    """TIFF-LZW (§13): 9..12-bit codes packed MSB-first, Clear=256,
    EOI=257, table grows from 258, and the code width bumps when the
    NEXT entry would not fit (EarlyChange: at table size 510/1022/2046,
    one earlier than the GIF variant)."""
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    bitpos = 0
    prev: bytes | None = None
    total_bits = len(data) * 8
    while bitpos + width <= total_bits:
        # MSB-first read
        code = 0
        for _ in range(width):
            byte = data[bitpos >> 3]
            code = (code << 1) | ((byte >> (7 - (bitpos & 7))) & 1)
            bitpos += 1
        if code == 256:  # Clear
            reset()
            prev = None
            continue
        if code == 257:  # EOI
            break
        if prev is None:
            if code > 255:
                raise ValueError("TIFF-LZW: first code after clear not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"TIFF-LZW: code {code} beyond table")
        out += entry
        prev = entry
        # EarlyChange (TIFF §13 / PDF's EarlyChange=1): the decoder
        # widens at table size 2^n - 2 (510/1022/2046) — one entry
        # EARLIER than its table fill implies, because its table lags
        # the encoder's by exactly one pending entry
        if len(table) >= (1 << width) - 2 and width < 12:
            width += 1
        if len(out) >= expected:
            break
    if len(out) < expected:
        raise ValueError(f"TIFF-LZW strip truncated: {len(out)} < {expected}")
    return bytes(out[:expected])


def decode_tiff(payload: bytes):
    """TIFF payload -> (H, W, 3) uint8 RGB ndarray."""
    import numpy as np

    if payload[:4] == b"II*\x00":
        e = "<"
    elif payload[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF payload")
    (ifd_off,) = struct.unpack_from(e + "I", payload, 4)
    (n_entries,) = struct.unpack_from(e + "H", payload, ifd_off)
    tags: dict[int, list[int]] = {}
    type_size = {1: 1, 3: 2, 4: 4}
    type_fmt = {1: "B", 3: "H", 4: "I"}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(e + "HHI", payload, off)
        if typ not in type_size:
            continue  # rationals etc. (resolution tags) are irrelevant here
        total = type_size[typ] * cnt
        if total <= 4:
            vals = struct.unpack_from(e + type_fmt[typ] * cnt, payload, off + 8)
        else:
            (voff,) = struct.unpack_from(e + "I", payload, off + 8)
            vals = struct.unpack_from(e + type_fmt[typ] * cnt, payload, voff)
        tags[tag] = list(vals)

    def one(tag: int, default=None):
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise ValueError(f"TIFF missing required tag {tag}")
        return default

    w = one(256)
    h = one(257)
    comp = one(259, 1)
    photo = one(262)
    spp = one(277, 1)
    bits = tags.get(258, [8] * spp)
    rows_per_strip = one(278, h)
    predictor = one(317, 1)
    planar = one(284, 1)
    if planar != 1:
        raise NotImplementedError("planar configuration 2 not supported")
    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiled TIFF not supported")
    if comp not in (1, 4, 5, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} needs a codec library (1/4/5/32773 decode)"
        )
    if comp == 4:
        # CCITT Group 4 (T.6) bilevel — r10, closes the fax-corpus gap
        if bits != [1]:
            raise ValueError(f"G4 TIFF must be 1 bit/sample: {bits}")
        if spp != 1:
            raise ValueError("G4 TIFF must be 1 sample per pixel")
        if photo not in (0, 1):
            raise ValueError(f"G4 TIFF needs bilevel photometric: {photo}")
        if one(293, 0) != 0:  # T6Options: uncompressed-mode bit
            raise NotImplementedError("T.6 uncompressed mode not supported")
    elif any(b != 8 for b in bits):
        raise NotImplementedError(f"only 8-bit TIFF samples supported: {bits}")
    if comp != 4 and photo not in (1, 2, 3):
        raise NotImplementedError(f"TIFF photometric {photo} not supported")
    if photo == 2 and spp < 3:
        raise ValueError("RGB TIFF needs >= 3 samples per pixel")
    if photo in (1, 3) and spp != 1:
        raise ValueError("grayscale/palette TIFF must be 1 sample per pixel")

    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF missing/inconsistent strip offsets or byte counts")
    raw = bytearray()
    remaining_rows = h
    for s, (so, sc) in enumerate(zip(offsets, counts)):
        strip_rows = min(rows_per_strip, remaining_rows)
        remaining_rows -= strip_rows
        expected = strip_rows * w * spp
        body = payload[so : so + sc]
        if len(body) < sc:
            raise ValueError("TIFF strip data truncated")
        if comp == 1:
            if len(body) < expected:
                raise ValueError("TIFF uncompressed strip truncated")
            raw += body[:expected]
        elif comp == 32773:
            raw += _unpackbits(body, expected)
        elif comp == 4:
            # strips restart the all-white reference line (TIFF 6.0 §11)
            from geo_db_spark.operators.ccitt import decode_g4

            raw += decode_g4(body, w, strip_rows)
        else:
            raw += _lzw_decode_tiff(body, expected)
    if comp == 4:
        # raw holds one 0/1 sample byte per pixel; photometric 0
        # (WhiteIsZero, the fax default) images 1-bits as black
        bl = np.frombuffer(bytes(raw), np.uint8).reshape(h, w)
        black = bl == 1 if photo == 0 else bl == 0
        gray = np.where(black, 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.repeat(gray[:, :, None], 3, axis=2))
    arr = np.frombuffer(bytes(raw), np.uint8).reshape(h, w, spp)
    if predictor == 2:
        # horizontal differencing is applied per ROW per SAMPLE: undo
        # with a cumulative sum mod 256
        arr = np.cumsum(arr.astype(np.uint32), axis=1).astype(np.uint8)
    elif predictor != 1:
        raise NotImplementedError(f"TIFF predictor {predictor} not supported")
    if photo == 2:
        return np.ascontiguousarray(arr[:, :, :3])
    if photo == 1:
        return np.ascontiguousarray(np.repeat(arr, 3, axis=2))
    # palette: ColorMap is 3 * 2^bits 16-bit values, R then G then B planes
    cmap = tags.get(320)
    if not cmap or len(cmap) != 3 * 256:
        raise ValueError("palette TIFF missing a 256-entry ColorMap")
    cm = (np.array(cmap, np.uint32).reshape(3, 256) >> 8).astype(np.uint8)
    idx = arr[:, :, 0]
    out = np.stack([cm[0][idx], cm[1][idx], cm[2][idx]], axis=2)
    return np.ascontiguousarray(out)


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------


def _packbits(row: bytes) -> bytes:
    """Greedy PackBits encoder: runs >= 3 become repeats, the rest are
    literal groups (<= 128 each)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        lit_start = i
        i += run
        # cap the literal group at 128 bytes: the next increment adds at
        # most 2, so stop extending at 126 (129 would make the header
        # byte 128 — the PackBits NO-OP — and silently drop the group)
        while i < n and i - lit_start <= 126:
            run = 1
            while i + run < n and run < 128 and row[i + run] == row[i]:
                run += 1
            if run >= 3:
                break
            i += run
        out += bytes([i - lit_start - 1]) + row[lit_start:i]
    return bytes(out)


def _lzw_encode_tiff(data: bytes) -> bytes:
    """TIFF-LZW compressor twin (string-table LZW with Clear/EOI and
    the EarlyChange width rule, mirroring _lzw_decode_tiff)."""
    out_bits: list[int] = []
    width = 9
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258

    def emit(code: int):
        for b in range(width - 1, -1, -1):
            out_bits.append((code >> b) & 1)

    emit(256)  # spec: begin with a Clear
    cur = b""
    for byte in data:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        table[nxt] = next_code
        next_code += 1
        # EarlyChange: the ENCODER widens as soon as next_code would
        # not fit in width bits MINUS the one-early rule
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code == 4094:  # table nearly full: clear (spec practice)
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        cur = bytes([byte])
    if cur:
        emit(table[cur])
    emit(257)  # EOI
    out = bytearray()
    for i in range(0, len(out_bits), 8):
        byte = 0
        for j, bit in enumerate(out_bits[i : i + 8]):
            byte |= bit << (7 - j)
        out.append(byte)
    return bytes(out)


def make_tiff(
    width: int,
    height: int,
    rgb_bytes: bytes,
    compression: str = "none",
    predictor: bool = False,
    big_endian: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """Assemble a real stripped RGB TIFF from raw RGB bytes.
    ``compression``: 'none' / 'packbits' / 'lzw' / 'g4' (CCITT Group 4
    bilevel, photometric 0, 1 bit/sample — input pixels must be pure
    black/white so decode ∘ make_tiff stays the identity);
    ``predictor`` applies horizontal differencing (LZW's usual
    companion); ``rows_per_strip`` splits the image into multiple
    strips. decode ∘ make_tiff is the identity — the roundtrip-oracle
    contract."""
    import numpy as np

    if len(rgb_bytes) != width * height * 3:
        raise ValueError("rgb byte count does not match dimensions")
    if compression not in ("none", "packbits", "lzw", "g4"):
        raise ValueError(f"unknown compression {compression!r}")
    e = ">" if big_endian else "<"
    rps = rows_per_strip or height
    arr = np.frombuffer(rgb_bytes, np.uint8).reshape(height, width, 3)
    if compression == "g4":
        from geo_db_spark.operators.ccitt import encode_g4

        if predictor:
            raise ValueError("g4 has no predictor")
        if not np.isin(arr, (0, 255)).all() or (arr != arr[:, :, :1]).any():
            raise ValueError(
                "g4 needs pure black/white pixels (lossless contract)"
            )
        bil = (arr[:, :, 0] == 0).astype(np.uint8)  # photometric 0: 1=black
        strips = []
        for y0 in range(0, height, rps):
            block = bil[y0 : y0 + rps]
            strips.append(
                encode_g4(block.tobytes(), width, block.shape[0])
            )
        return _assemble_tiff(
            width, height, strips, e, rps,
            bits=[1], comp_tag=4, photo=0, spp=1, predictor=False,
        )
    if predictor:
        diffed = arr.astype(np.int16)
        diffed[:, 1:, :] = diffed[:, 1:, :] - arr[:, :-1, :].astype(np.int16)
        arr = (diffed % 256).astype(np.uint8)
    strips = []
    for y0 in range(0, height, rps):
        body = arr[y0 : y0 + rps].tobytes()
        if compression == "packbits":
            body = _packbits(body)
        elif compression == "lzw":
            body = _lzw_encode_tiff(body)
        strips.append(body)

    comp_tag = {"none": 1, "packbits": 32773, "lzw": 5}[compression]
    return _assemble_tiff(
        width, height, strips, e, rps,
        bits=[8, 8, 8], comp_tag=comp_tag, photo=2, spp=3,
        predictor=predictor,
    )


def _assemble_tiff(
    width: int,
    height: int,
    strips: list[bytes],
    e: str,
    rps: int,
    bits: list[int],
    comp_tag: int,
    photo: int,
    spp: int,
    predictor: bool,
) -> bytes:
    """Shared IFD/strip-layout assembly for make_tiff's variants."""
    n_strips = len(strips)
    entries = []  # (tag, type, count, value_or_bytes)

    # layout: header(8) + IFD + external value areas + strip data
    def entry(tag, typ, vals):
        entries.append((tag, typ, vals))

    entry(256, 3, [width])
    entry(257, 3, [height])
    entry(258, 3, bits)
    entry(259, 3, [comp_tag])
    entry(262, 3, [photo])
    entry(273, 4, [0] * n_strips)  # patched below
    entry(277, 3, [spp])
    entry(278, 3, [rps])
    entry(279, 4, [len(s) for s in strips])
    if predictor:
        entry(317, 3, [2])
    entries.sort(key=lambda t: t[0])  # spec: ascending tag order

    type_fmt = {3: "H", 4: "I"}
    type_size = {3: 2, 4: 4}
    ifd_off = 8
    ifd_len = 2 + 12 * len(entries) + 4
    ext_off = ifd_off + ifd_len
    ext = bytearray()
    ext_pos: dict[int, int] = {}
    for tag, typ, vals in entries:
        if type_size[typ] * len(vals) > 4:
            ext_pos[tag] = ext_off + len(ext)
            ext += struct.pack(e + type_fmt[typ] * len(vals), *vals)
            if len(ext) & 1:
                ext += b"\x00"
    data_off = ext_off + len(ext)
    strip_offsets = []
    pos = data_off
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s) + (len(s) & 1)

    out = bytearray()
    out += (b"MM\x00*" if e == ">" else b"II*\x00") + struct.pack(e + "I", ifd_off)
    out += struct.pack(e + "H", len(entries))
    for tag, typ, vals in entries:
        if tag == 273:
            vals = strip_offsets
        out += struct.pack(e + "HHI", tag, typ, len(vals))
        if type_size[typ] * len(vals) <= 4:
            packed = struct.pack(e + type_fmt[typ] * len(vals), *vals)
            out += packed + b"\x00" * (4 - len(packed))
        else:
            if tag == 273:
                # recompute the external slot with the real offsets
                p = ext_pos[tag] - ext_off
                ext[p : p + 4 * len(vals)] = struct.pack(
                    e + "I" * len(vals), *vals
                )
            out += struct.pack(e + "I", ext_pos[tag])
    out += struct.pack(e + "I", 0)  # no next IFD
    out += ext
    for s in strips:
        out += s + (b"\x00" if len(s) & 1 else b"")
    return bytes(out)
