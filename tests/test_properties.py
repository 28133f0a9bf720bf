"""Property-based tests (hypothesis): the Spark-side expression twins
must agree with their Python references over generated inputs, run
batch-wise through one DataFrame per property so the suite stays fast.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from geo_db_spark.functions.wiki_time import wiki_time_key, wiki_time_key_py

# -------------------------------------------------------------- helpers

_settings = settings(max_examples=12, deadline=None)


def _spark_keys(spark, rows):
    df = spark.createDataFrame([(s, tz) for s, tz in rows], ["t", "tz"])
    out = df.select(wiki_time_key(F.col("t"), F.col("tz")).alias("k")).collect()
    return [r["k"] for r in out]


# a mix of well-formed (incl. year 0, month/day 00, negative years) and
# malformed time strings
_year = st.integers(min_value=-(2**33), max_value=2**33)
_mm = st.integers(min_value=0, max_value=13)
_dd = st.integers(min_value=0, max_value=32)
_hms = st.tuples(
    st.integers(min_value=0, max_value=23),
    st.integers(min_value=0, max_value=59),
    st.integers(min_value=0, max_value=59),
)
_tz = st.integers(min_value=-720, max_value=720)


@st.composite
def _wiki_time(draw):
    y = draw(_year)
    m = draw(_mm)
    d = draw(_dd)
    h, mi, s = draw(_hms)
    sign = "-" if y < 0 else draw(st.sampled_from(["+", ""]))
    return f"{sign}{abs(y)}-{m:02d}-{d:02d}T{h:02d}:{mi:02d}:{s:02d}Z"


_malformed = st.sampled_from(
    ["", "not a time", "2024-01-01", "+2024-1-1T00:00:00Z",
     "+2024-01-01T00:00:00", "++2024-01-01T00:00:00Z"]
)


@given(st.lists(st.tuples(st.one_of(_wiki_time(), _malformed), _tz),
                min_size=1, max_size=25))
@_settings
def test_wiki_time_key_matches_python_twin(spark, rows):
    got = _spark_keys(spark, rows)
    want = [wiki_time_key_py(s, tz) for s, tz in rows]
    assert got == want


_year_i32 = st.integers(min_value=-(2**31) + 1, max_value=2**31 - 1)


@st.composite
def _wiki_time_i32(draw):
    # years beyond i32 are rejected (NULL) by design — the ORDER property
    # only makes sense over parseable keys
    y = draw(_year_i32)
    m = draw(_mm)
    d = draw(_dd)
    h, mi, s = draw(_hms)
    sign = "-" if y < 0 else draw(st.sampled_from(["+", ""]))
    return f"{sign}{abs(y)}-{m:02d}-{d:02d}T{h:02d}:{mi:02d}:{s:02d}Z"


@given(st.lists(st.tuples(_wiki_time_i32(), _tz), min_size=2, max_size=20))
@_settings
def test_wiki_time_key_order_matches_tuple_order(spark, rows):
    """The linear key must order exactly like the reference's normalized
    (year, month0, day0, h, m, s)+tz carry-chain tuples."""

    def tup(s, tz):
        body = s.lstrip("+")
        neg = body.startswith("-")
        body = body.lstrip("-")
        date, time = body.split("T")
        y, m, d = (int(x) for x in date.split("-"))
        h, mi, sec = (int(x) for x in time[:-1].split(":"))
        y = -y if neg else y
        total = (
            ((((y * 12 + max(m - 1, 0)) * 31 + max(d - 1, 0)) * 24 + h) * 60 + mi) * 60
            + sec + tz * 60
        )
        return total

    keys = _spark_keys(spark, rows)
    totals = [tup(s, tz) for s, tz in rows]
    assert all(k is not None for k in keys)
    order_a = sorted(range(len(rows)), key=lambda i: (keys[i], i))
    order_b = sorted(range(len(rows)), key=lambda i: (totals[i], i))
    assert order_a == order_b


@given(st.lists(st.text(
    alphabet=st.sampled_from("0123456789,.+- \tabz"), max_size=24),
    min_size=1, max_size=30))
@_settings
def test_parse_quantity_matches_reference_semantics(spark, amounts):
    """F5 (src/wiki_data_line.rs:507-523): strip [\\s,.+], then u64-parse
    — '1.5' -> 15 (faithful), negatives and any leftover non-digits ->
    NULL. Property-checked against a direct Python port."""
    import re

    from geo_db_spark.functions.scalars import parse_quantity

    df = spark.createDataFrame([(a,) for a in amounts], ["a"])
    got = [r["n"] for r in df.select(parse_quantity(F.col("a")).alias("n")).collect()]

    def ref(a):
        cleaned = re.sub(r"[\s,.+]+", "", a)
        if not re.fullmatch(r"\d+", cleaned):
            return None
        n = int(cleaned)
        # the Spark twin stores BIGINT: i64 overflow -> NULL
        return n if n <= 2**63 - 1 else None

    assert got == [ref(a) for a in amounts]


@given(st.lists(st.text(
    alphabet=st.sampled_from("ab \t\n.,!?xyz0123456789"), max_size=60),
    min_size=1, max_size=25))
@_settings
def test_shingles_match_python_reference(spark, texts):
    """The lookahead-regex shingler must equal the obvious tokenize-and-
    slide Python implementation (distinct 3-gram word shingles over
    normalized text)."""
    from geo_db_spark.operators.dedup import shingles

    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = [r["sh"] for r in df.select(shingles(F.col("text"), 3).alias("sh")).collect()]

    def ref(t):
        toks = " ".join(t.lower().split()).split(" ") if t.strip() else []
        out, seen = [], set()
        for i in range(len(toks) - 2):
            s = " ".join(toks[i : i + 3])
            if s not in seen:
                seen.add(s)
                out.append(s)
        return out

    assert got == [ref(t) for t in texts]


# ------------------------------------------------- CDC merge/diff algebra

_kv_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=30), st.integers(min_value=0, max_value=5)),
    min_size=0,
    max_size=25,
)


@_settings
@given(old_rows=_kv_rows, new_rows=_kv_rows)
def test_snapshot_diff_matches_dict_reference(spark, old_rows, new_rows):
    """snapshot_diff == the dict-based reference diff, for any pair of
    key-unique snapshots."""
    from geo_db_spark.operators.cdc import snapshot_diff

    old_d = dict(old_rows)  # later dup wins, both sides identically
    new_d = dict(new_rows)
    old = spark.createDataFrame(list(old_d.items()) or [(None, None)], "k int, v int").filter("k is not null")
    new = spark.createDataFrame(list(new_d.items()) or [(None, None)], "k int, v int").filter("k is not null")
    got = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()}
    want = {}
    for k in set(old_d) | set(new_d):
        if k not in old_d:
            want[k] = "insert"
        elif k not in new_d:
            want[k] = "delete"
        elif old_d[k] != new_d[k]:
            want[k] = "update"
    assert got == want


@_settings
@given(target_rows=_kv_rows, batch_rows=_kv_rows)
def test_merge_upsert_matches_dict_reference(spark, target_rows, batch_rows):
    """merge_upsert == dict.update semantics for key-unique inputs."""
    from geo_db_spark.operators.cdc import merge_upsert

    t_d = dict(target_rows)
    b_d = dict(batch_rows)
    target = spark.createDataFrame(list(t_d.items()) or [(None, None)], "k int, v int").filter("k is not null")
    batch = spark.createDataFrame(list(b_d.items()) or [(None, None)], "k int, v int").filter("k is not null")
    got = {r.k: r.v for r in merge_upsert(target, batch, ["k"]).collect()}
    want = {**t_d, **b_d}
    assert got == want


# ------------------------------------------- image decoders (pure Python)


@_settings
@given(
    w=st.integers(min_value=1, max_value=16),
    h=st.integers(min_value=1, max_value=16),
    data=st.data(),
)
def test_ppm_roundtrip_property(w, h, data):
    """make_ppm -> decode_image is the identity on the pixel bytes for
    arbitrary dimensions and payloads (the decoder is new hand-written
    parsing code — the classic fuzz target)."""
    from geo_db_spark.operators.multimodal import decode_image, make_ppm

    rgb = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3))
    )
    arr = decode_image(make_ppm(w, h, rgb))
    assert arr.shape == (h, w, 3)
    assert arr.tobytes() == rgb


@_settings
@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=9),
    top_down=st.booleans(),
    data=st.data(),
)
def test_bmp_roundtrip_property(w, h, top_down, data):
    """Hand-assembled 24-bit BMPs (both row orders, any width incl. the
    padding-heavy ones) decode to exactly the intended RGB grid."""
    import struct

    from geo_db_spark.operators.multimodal import decode_image

    px = [
        [
            tuple(data.draw(st.lists(st.integers(0, 255), min_size=3, max_size=3)))
            for _ in range(w)
        ]
        for _ in range(h)
    ]
    stride = (w * 3 + 3) & ~3

    def row(r):
        raw = b"".join(bytes((b, g, rr)) for (rr, g, b) in r)
        return raw + b"\x00" * (stride - len(raw))

    rows = px if top_down else list(reversed(px))
    pixel_data = b"".join(row(r) for r in rows)
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(pixel_data), 0, 0, offset)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0,
        len(pixel_data), 0, 0, 0, 0,
    )
    arr = decode_image(header + dib + pixel_data)
    assert arr.shape == (h, w, 3)
    assert [[tuple(p) for p in r] for r in arr] == px


@_settings
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    color_type=st.sampled_from([0, 2, 4, 6]),
    data=st.data(),
)
def test_png_roundtrip_property(w, h, color_type, data):
    """make_png -> decode_image is the identity for arbitrary dims, all
    four supported color types, and arbitrary per-scanline filter choices
    — every unfilter branch (None/Sub/Up/Average/Paeth) under fuzz, the
    r6 analog of the PPM/BMP roundtrips."""
    import numpy as np

    from geo_db_spark.operators.multimodal import decode_image, make_png

    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    raw = bytes(
        data.draw(
            st.lists(st.integers(0, 255), min_size=w * h * ch, max_size=w * h * ch)
        )
    )
    filters = data.draw(st.lists(st.integers(0, 4), min_size=h, max_size=h))
    arr = decode_image(make_png(w, h, raw, color_type=color_type, row_filters=filters))
    assert arr.shape == (h, w, 3)
    px = np.frombuffer(raw, np.uint8).reshape(h, w, ch)
    if ch == 1:
        exp = np.repeat(px, 3, axis=2)
    elif ch == 2:
        exp = np.repeat(px[:, :, :1], 3, axis=2)
    elif ch == 3:
        exp = px
    else:
        exp = px[:, :, :3]
    assert np.array_equal(arr, exp)
