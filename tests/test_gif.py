"""GIF decode (operators/multimodal.py `_make_pixel_decoder`): a REAL
test-side encoder — dynamic LZW with growing code widths plus the
fixed-width CLEAR-pumped "uncompressed" mode the driver fixtures use —
drives exact round-trip properties (GIF palette images are lossless);
interlace, local color tables, extension skipping, and malformed-stream
gates included. Mirrors the PNG/JPEG encoder-twin strategy."""

import struct

import numpy as np
import pytest

from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.multimodal import (
    _make_pixel_decoder,
    decode_media,
)

pixels = _make_pixel_decoder()


class _LsbWriter:
    """LSB-first bit packer (GIF's order — opposite of JPEG)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v, nbits):
        self.acc |= (v & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self):
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _lzw_encode(indexes, mcs, fixed_width=False):
    """GIF LZW: dynamic dictionary by default; ``fixed_width`` emits
    every index as a literal and pumps CLEAR before the table would
    force a code-width increase (the 'uncompressed GIF' trick — output
    size is then closed-form, which the driver fixtures rely on)."""
    clear = 1 << mcs
    end = clear + 1
    bw = _LsbWriter()
    code_size = mcs + 1
    bw.put(clear, code_size)
    if fixed_width:
        budget = (1 << code_size) - next_free(mcs)
        left = budget
        for v in indexes:
            if left == 0:
                bw.put(clear, code_size)
                left = budget
            bw.put(int(v), code_size)
            left -= 1
        bw.put(end, code_size)
        return bw.flush()
    table = {(c,): c for c in range(clear)}
    next_code = end + 1
    seq = ()
    for v in indexes:
        v = int(v)
        cand = seq + (v,)
        if cand in table:
            seq = cand
            continue
        bw.put(table[seq], code_size)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # grow ONE registration later than the naive ==2^size rule:
            # the decoder registers one entry behind the encoder (its
            # first post-clear read registers nothing), so the widths
            # align at next_code == 2^size + 1 — verified against the
            # decoder, which itself decodes real-world GIFs (IDLE's
            # icons) with the standard ==2^size post-registration rule
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:
            bw.put(clear, code_size)
            table = {(c,): c for c in range(clear)}
            next_code = end + 1
            code_size = mcs + 1
        seq = (v,)
    if seq:
        bw.put(table[seq], code_size)
    bw.put(end, code_size)
    return bw.flush()


def next_free(mcs):
    return (1 << mcs) + 2  # first dynamic code after CLEAR/END


def mk_gif(idx, palette, mcs=None, interlace=False, local_table=False,
           fixed_width=False, extensions=True, version=b"89a"):
    """Encode an (h, w) palette-index array as a single-frame GIF."""
    h, w = idx.shape
    palette = np.asarray(palette, np.uint8)
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    size_field = max(0, bits - 1)
    table_n = 2 << size_field
    pal_bytes = np.zeros((table_n, 3), np.uint8)
    pal_bytes[:n] = palette
    if mcs is None:
        mcs = max(2, bits)

    rows = idx
    if interlace:
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        rows = idx[order]
    data = _lzw_encode(rows.ravel(), mcs, fixed_width=fixed_width)

    out = b"GIF" + version
    gflags = (0x80 | size_field) if not local_table else 0x00
    out += struct.pack("<HHBBB", w, h, gflags, 0, 0)
    if not local_table:
        out += pal_bytes.tobytes()
    if extensions:  # a GCE and a comment block the decoder must skip
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        out += b"\x21\xfe\x05hello\x00"
    iflags = (0x40 if interlace else 0) | (
        (0x80 | size_field) if local_table else 0
    )
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, iflags)
    if local_table:
        out += pal_bytes.tobytes()
    out += bytes([mcs])
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return out


def test_gif_roundtrip_exact():
    """Palette images are LOSSLESS in GIF — decode must equal the
    palette lookup of the source indexes, byte for byte, under the
    dynamic LZW, across sizes and palette widths."""
    rng = np.random.RandomState(3)
    for h, w, n in [(1, 1, 2), (7, 13, 16), (24, 31, 256), (8, 8, 5)]:
        pal = rng.randint(0, 256, size=(n, 3), dtype=np.uint8)
        idx = rng.randint(0, n, size=(h, w)).astype(np.uint8)
        kind, got = pixels(mk_gif(idx, pal))
        assert kind == "gif" and got.shape == (h, w, 3)
        assert (got == pal[idx]).all(), (h, w, n)


def test_gif_interlace_local_table_and_87a():
    rng = np.random.RandomState(5)
    pal = rng.randint(0, 256, size=(64, 3), dtype=np.uint8)
    idx = rng.randint(0, 64, size=(17, 9)).astype(np.uint8)
    want = pal[idx]
    for kwargs in (
        {"interlace": True},
        {"local_table": True},
        {"interlace": True, "local_table": True},
        {"version": b"87a", "extensions": False},
        {"fixed_width": True},
        {"interlace": True, "fixed_width": True},
    ):
        _, got = pixels(mk_gif(idx, pal, **kwargs))
        assert (got == want).all(), kwargs


def test_gif_property_roundtrip():
    import hypothesis.strategies as st
    from hypothesis import given, settings

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 20),
        nbits=st.integers(1, 8),
        interlace=st.booleans(),
        fixed=st.booleans(),
        seed=st.integers(0, 2**31),
    )
    def check(w, h, nbits, interlace, fixed, seed):
        rng = np.random.RandomState(seed % (2**31))
        n = 1 << nbits
        pal = rng.randint(0, 256, size=(n, 3), dtype=np.uint8)
        idx = rng.randint(0, n, size=(h, w)).astype(np.uint8)
        kind, got = pixels(
            mk_gif(idx, pal, interlace=interlace, fixed_width=fixed)
        )
        assert kind == "gif"
        assert (got == pal[idx]).all()

    check()


def test_gif_long_runs_exercise_code_width_growth():
    """>= 2^9 dictionary entries force the decoder through multiple
    code-width bumps (9 -> 10 -> 11 bits) — repetitive content grows
    the dictionary fastest."""
    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    idx = (np.add.outer(np.arange(64), np.arange(64)) % 7).astype(np.uint8)
    _, got = pixels(mk_gif(idx, pal))
    assert (got == pal[idx]).all()


def test_gif_metadata_and_gates():
    pal = np.stack([np.arange(16), np.arange(16) + 1,
                    np.arange(16) + 2], axis=1).astype(np.uint8)
    idx = (np.arange(35).reshape(5, 7) % 16).astype(np.uint8)
    blob = mk_gif(idx, pal)
    meta = decode_media(blob)
    assert meta["kind"] == "gif"
    assert (meta["width"], meta["height"], meta["n_units"]) == (7, 5, 35)
    assert meta["content_sum"] == int(pal[idx].astype(np.int64).sum())
    assert meta["payload_bytes"] == len(blob)

    with pytest.raises(ValueError):
        pixels(b"GIF89a" + b"\x00" * 4)  # truncated header
    with pytest.raises(ValueError):
        pixels(blob[:20])  # truncated mid-color-table
    # header + color table + immediate trailer: no image descriptor
    gct_end = 13 + 3 * (2 << (blob[10] & 7))
    with pytest.raises(ValueError, match="no image"):
        pixels(blob[:gct_end] + b"\x3b")
    # LZW stream cut before END (drop the terminator + trailer + tail)
    with pytest.raises(ValueError):
        pixels(blob[:-6])


def test_gif_decodes_real_world_files():
    """Ground truth beyond the encoder twin: GIFs produced by REAL
    encoders (Python's bundled IDLE icons, present in most CPython
    installs) must decode with the declared dimensions — this pinned
    the LZW width-growth convention (decoder grows at next_code ==
    2^size post-registration; see _lzw_encode's +1 note)."""
    import glob
    import os

    # the running interpreter's own stdlib ships them when IDLE is
    # installed — no environment-specific paths
    root = os.path.dirname(os.__file__)
    candidates = sorted(
        glob.glob(f"{root}/**/idlelib/Icons/*.gif", recursive=True)
    )
    if not candidates:
        pytest.skip("no real-world GIFs available in this environment")
    decoded = 0
    for f in candidates[:6]:
        p = open(f, "rb").read()
        w, h = struct.unpack_from("<HH", p, 6)
        kind, px = pixels(p)
        assert kind == "gif" and px.shape == (h, w, 3), f
        decoded += 1
    assert decoded > 0


def test_gif_fixture_decodes_to_shared_grid(spark):
    """The driver-fixture triangle: synthesize_media_payloads' GIF
    slice (doc_id % 16 == 12, carved from the BMP class) decodes to
    the SAME (x + y + c + doc_id) % 256 grid every other container
    yields — mm6/mm8/mm9 stay container-agnostic — and the payload
    size obeys 795 + ceil(9*(w*h+2)/8)."""
    from pyspark.sql import functions as F

    from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.multimodal import (
        synthesize_media_payloads,
    )

    docs = spark.range(0, 256).select(F.col("id").alias("doc_id"))
    rows = (
        synthesize_media_payloads(docs)
        .filter(F.col("kind") == "gif")
        .collect()
    )
    assert len(rows) == 16  # every doc_id % 16 == 12 in [0, 256)
    for r in rows:
        d = r["doc_id"]
        assert d % 16 == 12
        w, h = d % 16 + 1, d % 8 + 1
        blob = bytes(r["payload"])
        assert len(blob) == 795 + (9 * (w * h + 2) + 7) // 8
        kind, got = pixels(blob)
        assert kind == "gif" and got.shape == (h, w, 3)
        x = np.arange(w)[None, :, None]
        y = np.arange(h)[:, None, None]
        c = np.arange(3)[None, None, :]
        want = ((x + y + c + d) % 256).astype(np.uint8)
        assert (got == want).all(), d
