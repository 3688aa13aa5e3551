"""Baseline JPEG (SOF0) decode (operators/multimodal.py
`_make_pixel_decoder`): a REAL test-side encoder (forward DCT,
quantization, zigzag run-length, canonical Huffman, byte stuffing,
optional 4:2:0/4:2:2 subsampling, DRI/RSTn restart intervals) drives
round-trip properties against the decoder; spec gates (progressive,
arithmetic, 12-bit) stay loud. Mirrors the PNG milestone's
encoder-twin strategy (tests/test_extensions.py::_mk_png)."""

import numpy as np
import pytest

from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.multimodal import (
    _make_pixel_decoder,
    decode_media,
)

pixels = _make_pixel_decoder()

# canonical zigzag order (T.81 figure A.6) — natural index per zz index
ZZ = np.array(
    [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
     12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21,
     28, 35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30,
     37, 44, 51, 58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61,
     54, 47, 55, 62, 63], np.int64,
)


def _dct_matrix():
    u = np.arange(8)
    x = np.arange(8)
    m = np.cos((2 * x[:, None] + 1) * u[None, :] * np.pi / 16) / 2.0
    m[:, 0] /= np.sqrt(2.0)
    return m


def _huffman_spec():
    """Fixed-length canonical tables (legal Huffman: all DC categories
    at 4 bits, all 256 possible AC run/size symbols at 9 bits) — the
    encoder stays simple and every symbol is encodable."""
    dc_counts = [0] * 16
    dc_counts[3] = 12  # twelve 4-bit codes
    dc_vals = list(range(12))
    # the VALID AC symbols (EOB, ZRL, (run<<4)|size for size 1..10,
    # plus the progressive EOBn symbols (r<<4)|0 for r=1..14) as 9-bit
    # codes — counts bytes cap at 255, so "every possible byte" is not
    # an option
    ac_vals = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ] + [r << 4 for r in range(1, 15)]
    ac_counts = [0] * 16
    ac_counts[8] = len(ac_vals)  # code length 9
    return (dc_counts, dc_vals), (ac_counts, ac_vals)


def _canonical_codes(counts, vals):
    codes = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[vals[vi]] = (length, code)
            code += 1
            vi += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self):
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s (spec)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0
        return bytes(self.out)

    def restart(self, seq):
        """Byte-align and emit RST(seq % 8) — T.81 E.1.4."""
        self.flush()
        self.out += bytes([0xFF, 0xD0 + (seq % 8)])


def _category(v):
    return int(abs(v)).bit_length()


def mk_jpeg(rgb, qval=1, subsampling="444", restart_interval=0,
            progressive=False):
    """Encode an (h, w, 3) RGB array (or (h, w) grayscale) as a
    baseline SOF0 JPEG with a flat quantization table of ``qval``;
    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker
    (with DC predictor reset) every that-many restart units.
    ``progressive=True`` emits SOF2 with a libjpeg-like scan script —
    DC first at Al=1, split AC bands at Al=2, then AC refinements down
    to Al=0 and a DC refinement — exercising spectral selection,
    successive approximation (incl. EOB-run correction-bit buffering,
    the jcphuff structure), and multi-scan table snapshots."""
    import struct

    gray = rgb.ndim == 2
    h, w = rgb.shape[:2]
    if gray:
        planes = {1: rgb.astype(np.float64)}
        comps = [(1, 1, 1)]
    else:
        r = rgb[:, :, 0].astype(np.float64)
        g = rgb[:, :, 1].astype(np.float64)
        b = rgb[:, :, 2].astype(np.float64)
        y = np.round(0.299 * r + 0.587 * g + 0.114 * b)
        cb = np.round(128 - 0.168736 * r - 0.331264 * g + 0.5 * b)
        cr = np.round(128 + 0.5 * r - 0.418688 * g - 0.081312 * b)
        y, cb, cr = (np.clip(p, 0, 255) for p in (y, cb, cr))
        hs, vs = {"444": (1, 1), "420": (2, 2), "422": (2, 1)}[subsampling]
        planes = {1: y, 2: cb, 3: cr}
        comps = [(1, hs, vs), (2, 1, 1), (3, 1, 1)]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    M = _dct_matrix()
    q = np.full(64, qval, np.int64)

    # per-component padded (and subsampled) planes + block coefficients
    blocks = {}
    for cid, hc, vc in comps:
        plane = planes[cid]
        if (hc, vc) != (hmax, vmax):  # chroma: box-average subsample
            fy, fx = vmax // vc, hmax // hc
            ph = -(-h // fy) * fy
            pw = -(-w // fx) * fx
            pad = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
            plane = pad.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
            plane = np.round(plane)
        th = mcuy * vc * 8
        tw = mcux * hc * 8
        plane = np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )
        bl = plane.reshape(th // 8, 8, tw // 8, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ux,ijxy,yv->ijuv", M.T, bl - 128.0, M)
        zzc = np.round(coef.reshape(th // 8, tw // 8, 64)[:, :, ZZ] / qval)
        blocks[cid] = zzc.astype(np.int64)

    (dc_counts, dc_vals), (ac_counts, ac_vals) = _huffman_spec()
    dc_codes = _canonical_codes(dc_counts, dc_vals)
    ac_codes = _canonical_codes(ac_counts, ac_vals)

    def put_dc(bw, cat, diff):
        ln, code = dc_codes[cat]
        bw.put(code, ln)
        if cat:
            v = diff if diff >= 0 else diff + (1 << cat) - 1
            bw.put(v, cat)

    def put_ac(bw, sym):
        ln, code = ac_codes[sym]
        bw.put(code, ln)

    def encode_sequential():
        bw = _BitWriter()
        pred = {cid: 0 for cid, *_ in comps}
        mcu_idx = 0
        rst_seq = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if (restart_interval and mcu_idx
                        and mcu_idx % restart_interval == 0):
                    bw.restart(rst_seq)
                    rst_seq += 1
                    pred = {cid: 0 for cid, *_ in comps}
                mcu_idx += 1
                for cid, hc, vc in comps:
                    for by in range(vc):
                        for bx in range(hc):
                            blk = blocks[cid][my * vc + by, mx * hc + bx]
                            dc = int(blk[0])
                            diff = dc - pred[cid]
                            pred[cid] = dc
                            put_dc(bw, _category(diff), diff)
                            run = 0
                            nz = np.nonzero(blk[1:])[0]
                            last_nz = int(nz[-1]) + 1 if len(nz) else 0
                            for k in range(1, last_nz + 1):
                                v = int(blk[k])
                                if v == 0:
                                    run += 1
                                    continue
                                while run > 15:
                                    put_ac(bw, 0xF0)  # ZRL
                                    run -= 16
                                s = _category(v)
                                put_ac(bw, (run << 4) | s)
                                mv = v if v >= 0 else v + (1 << s) - 1
                                bw.put(mv, s)
                                run = 0
                            if last_nz < 63:
                                put_ac(bw, 0x00)  # EOB
        return [(None, 0, 63, 0, 0, bw.flush())]

    def comp_grid(cid, hc, vc):
        cw = (w * hc + 8 * hmax - 1) // (8 * hmax)
        ch = (h * vc + 8 * vmax - 1) // (8 * vmax)
        return [(by, bx) for by in range(ch) for bx in range(cw)]

    def encode_progressive():
        """libjpeg-like scan script; the entropy emitters mirror
        jcphuff's structure (EOB-run accounting, correction-bit
        buffering attached to the pending EOB run). ``restart_interval``
        > 0 restarts every scan at that many of ITS restart units
        (MCUs for the interleaved DC scans, blocks for AC scans), with
        per-scan RST sequence numbering."""
        scans = []
        ri = restart_interval

        def dc_first(al):
            bw = _BitWriter()
            pred = {cid: 0 for cid, *_ in comps}
            unit = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if ri and unit and unit % ri == 0:
                        bw.restart(unit // ri - 1)
                        pred = {cid: 0 for cid, *_ in comps}
                    unit += 1
                    for cid, hc, vc in comps:
                        for by in range(vc):
                            for bx in range(hc):
                                dc = int(
                                    blocks[cid][my * vc + by, mx * hc + bx][0]
                                ) >> al  # arithmetic shift: point transform
                                diff = dc - pred[cid]
                                pred[cid] = dc
                                put_dc(bw, _category(diff), diff)
            scans.append((None, 0, 0, 0, al, bw.flush()))

        def dc_refine(ah, al):
            bw = _BitWriter()
            unit = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if ri and unit and unit % ri == 0:
                        bw.restart(unit // ri - 1)
                    unit += 1
                    for cid, hc, vc in comps:
                        for by in range(vc):
                            for bx in range(hc):
                                dc = int(
                                    blocks[cid][my * vc + by, mx * hc + bx][0]
                                )
                                bw.put((dc >> al) & 1, 1)
            scans.append((None, 0, 0, ah, al, bw.flush()))

        def ac_first(cid, hc, vc, ss, se, al):
            bw = _BitWriter()
            eobrun = 0

            def emit_eobrun():
                nonlocal eobrun
                if eobrun > 0:
                    nbits = eobrun.bit_length() - 1
                    put_ac(bw, nbits << 4)
                    if nbits:
                        bw.put(eobrun, nbits)
                    eobrun = 0

            for unit, (by, bx) in enumerate(comp_grid(cid, hc, vc)):
                if ri and unit and unit % ri == 0:
                    emit_eobrun()
                    bw.restart(unit // ri - 1)
                blk = blocks[cid][by, bx]
                r = 0
                for k in range(ss, se + 1):
                    v = int(blk[k])
                    t = abs(v) >> al  # point transform toward zero
                    if t == 0:
                        r += 1
                        continue
                    emit_eobrun()
                    while r > 15:
                        put_ac(bw, 0xF0)  # ZRL
                        r -= 16
                    s = t.bit_length()
                    put_ac(bw, (r << 4) | s)
                    sv = t if v >= 0 else -t
                    mv = sv if sv >= 0 else sv + (1 << s) - 1
                    bw.put(mv, s)
                    r = 0
                if r > 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        emit_eobrun()
            emit_eobrun()
            scans.append((cid, ss, se, 0, al, bw.flush()))

        def ac_refine(cid, hc, vc, ss, se, ah, al):
            bw = _BitWriter()
            eobrun = 0
            bebits: list[int] = []  # correction bits riding the EOB run

            def emit_eobrun():
                nonlocal eobrun, bebits
                if eobrun > 0:
                    nbits = eobrun.bit_length() - 1
                    put_ac(bw, nbits << 4)
                    if nbits:
                        bw.put(eobrun, nbits)
                    eobrun = 0
                    for b in bebits:
                        bw.put(b, 1)
                    bebits = []

            for unit, (by, bx) in enumerate(comp_grid(cid, hc, vc)):
                if ri and unit and unit % ri == 0:
                    emit_eobrun()
                    bw.restart(unit // ri - 1)
                blk = blocks[cid][by, bx]
                absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
                eob = 0  # index AFTER the last newly-significant coef
                for i, t in enumerate(absv):
                    if t == 1:
                        eob = i + 1
                r = 0
                br: list[int] = []  # correction bits in this block
                for i, t in enumerate(absv):
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and i < eob:
                        emit_eobrun()
                        put_ac(bw, 0xF0)  # ZRL
                        r -= 16
                        for b in br:
                            bw.put(b, 1)
                        br = []
                    if t > 1:
                        # previously-significant: one correction bit
                        br.append(t & 1)
                        continue
                    emit_eobrun()
                    put_ac(bw, (r << 4) | 1)
                    bw.put(1 if int(blk[ss + i]) >= 0 else 0, 1)
                    for b in br:
                        bw.put(b, 1)
                    br = []
                    r = 0
                if r > 0 or br:
                    eobrun += 1
                    bebits.extend(br)
                    if eobrun == 0x7FFF:
                        emit_eobrun()
            emit_eobrun()
            scans.append((cid, ss, se, ah, al, bw.flush()))

        dc_first(1)
        for cid, hc, vc in comps:
            ac_first(cid, hc, vc, 1, 5, 2)
            ac_first(cid, hc, vc, 6, 63, 2)
        for cid, hc, vc in comps:
            ac_refine(cid, hc, vc, 1, 63, 2, 1)
        dc_refine(1, 0)
        for cid, hc, vc in comps:
            ac_refine(cid, hc, vc, 1, 63, 1, 0)
        return scans

    if progressive:
        scan_list = encode_progressive()
    else:
        scan_list = encode_sequential()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0]) + q.astype(np.uint8).tobytes())
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hc, vc in comps:
        sof += bytes([cid, (hc << 4) | vc, 0])
    out += seg(0xC2 if progressive else 0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_vals))
    for scid, ss, se, ah, al, entropy in scan_list:
        members = comps if scid is None else [
            c for c in comps if c[0] == scid
        ]
        sos = bytes([len(members)])
        for cid, *_ in members:
            sos += bytes([cid, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        out += entropy
    return out + b"\xff\xd9"


def test_jpeg_gray_roundtrip_near_lossless():
    rng = np.random.RandomState(3)
    for h, w in [(8, 8), (5, 13), (24, 17), (1, 1)]:
        px = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
        kind, got = pixels(mk_jpeg(px, qval=1))
        assert kind == "jpeg" and got.shape == (h, w, 3)
        want = np.repeat(px[:, :, None], 3, axis=2).astype(np.int64)
        diff = np.abs(got.astype(np.int64) - want).max()
        assert diff <= 2, (h, w, diff)


def test_jpeg_color_444_roundtrip_near_lossless():
    rng = np.random.RandomState(7)
    for h, w in [(8, 8), (9, 22), (16, 16)]:
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        kind, got = pixels(mk_jpeg(px, qval=1))
        # q=1: DCT round-off <= ~2 + two rounded color conversions
        diff = np.abs(got.astype(np.int64) - px.astype(np.int64)).max()
        assert diff <= 6, (h, w, diff)


def test_jpeg_420_and_422_roundtrip_on_gray_content():
    """Chroma-subsampled scans: neutral-chroma content (R=G=B) loses
    nothing to subsampling, so the round-trip stays near-lossless and
    the 2x2-blocks-per-MCU + upsample path is exercised exactly."""
    rng = np.random.RandomState(11)
    for sub in ("420", "422"):
        for h, w in [(16, 16), (9, 21), (8, 24)]:
            g = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
            px = np.repeat(g[:, :, None], 3, axis=2)
            kind, got = pixels(mk_jpeg(px, qval=1, subsampling=sub))
            diff = np.abs(got.astype(np.int64) - px.astype(np.int64)).max()
            assert diff <= 3, (sub, h, w, diff)


def test_jpeg_dc_only_blocks_decode_exactly():
    """Block-constant gray content with q=8 survives the pipeline
    BIT-EXACTLY: DC = 8*(v-128)/8 quantizes without loss and the IDCT
    of a DC-only block is that constant — the invariant the mm5/mm6
    fixture oracles rely on."""
    rng = np.random.RandomState(5)
    for h, w in [(8, 8), (16, 24), (3, 11), (7, 19)]:
        bh, bw_ = -(-h // 8), -(-w // 8)
        blockvals = rng.randint(0, 256, size=(bh, bw_), dtype=np.uint8)
        g = np.repeat(np.repeat(blockvals, 8, axis=0), 8, axis=1)[:h, :w]
        px = np.repeat(g[:, :, None], 3, axis=2)
        kind, got = pixels(mk_jpeg(px, qval=8))
        assert (got == px).all(), (h, w)


def test_jpeg_quality_quantization_bites():
    """A coarse quant table must actually quantize (lossy path real):
    decode differs from the source but stays visually bounded."""
    rng = np.random.RandomState(13)
    px = rng.randint(0, 256, size=(16, 16), dtype=np.uint8)
    _, fine = pixels(mk_jpeg(px, qval=1))
    _, coarse = pixels(mk_jpeg(px, qval=32))
    want = np.repeat(px[:, :, None], 3, axis=2).astype(np.int64)
    assert np.abs(coarse.astype(np.int64) - want).max() > np.abs(
        fine.astype(np.int64) - want
    ).max()


def test_jpeg_property_roundtrip():
    import hypothesis.strategies as st
    from hypothesis import given, settings

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 20),
        h=st.integers(1, 18),
        gray=st.booleans(),
        sub=st.sampled_from(["444", "420"]),
        seed=st.integers(0, 2**31),
    )
    def check(w, h, gray, sub, seed):
        rng = np.random.RandomState(seed % (2**31))
        if gray:
            src = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
            want = np.repeat(src[:, :, None], 3, axis=2).astype(np.int64)
            blob = mk_jpeg(src, qval=1)  # gray is always 1-component
        else:
            g = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
            src = np.repeat(g[:, :, None], 3, axis=2)
            want = src.astype(np.int64)
            blob = mk_jpeg(src, qval=1, subsampling=sub)
        kind, got = pixels(blob)
        assert kind == "jpeg" and got.shape == (h, w, 3)
        assert np.abs(got.astype(np.int64) - want).max() <= 6

    check()


def test_jpeg_gates_and_metadata():
    import struct

    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    blob = mk_jpeg(px, qval=1)

    # decode_media surfaces the same pixels as metadata
    meta = decode_media(blob)
    _, raw = pixels(blob)
    assert meta["kind"] == "jpeg"
    assert (meta["width"], meta["height"]) == (8, 8)
    assert meta["n_units"] == 64
    assert meta["content_sum"] == int(raw.astype(np.int64).sum())
    assert meta["payload_bytes"] == len(blob)

    def patch_sof(marker):
        i = blob.index(b"\xff\xc0")
        return blob[:i] + bytes([0xFF, marker]) + blob[i + 2:]

    # a BASELINE stream relabeled SOF2 is malformed progressive (its
    # single 0..63 scan is no legal progressive scan) — ValueError,
    # not silent misdecode (SOF2 itself is SUPPORTED since r11:
    # test_jpeg_progressive_* below)
    with pytest.raises(ValueError):
        pixels(patch_sof(0xC2))
    with pytest.raises(NotImplementedError, match="SOF9"):
        pixels(patch_sof(0xC9))  # arithmetic

    # 12-bit precision gate
    i = blob.index(b"\xff\xc0")
    deep = blob[: i + 4] + bytes([12]) + blob[i + 5:]
    with pytest.raises(NotImplementedError, match="precision"):
        pixels(deep)

    # zero restart interval is a no-op and decodes
    i = blob.index(b"\xff\xda")
    dri0 = b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 0)
    _, ok = pixels(blob[:i] + dri0 + blob[i:])
    assert (ok == raw).all()

    # truncated entropy data -> ValueError (not silent junk)
    with pytest.raises(ValueError):
        pixels(blob[: i + 20])

    # byte stuffing is REAL: some encoded stream must contain FF00
    rng = np.random.RandomState(1)
    found = False
    for seed in range(40):
        px2 = rng.randint(0, 256, size=(16, 16), dtype=np.uint8)
        b2 = mk_jpeg(px2, qval=1)
        j = b2.index(b"\xff\xda") + 14
        if b"\xff\x00" in b2[j:-2]:
            found = True
            _, out2 = pixels(b2)  # and it decodes through the destuffer
            assert out2.shape == (16, 16, 3)
            break
    assert found, "no stuffed byte in 40 random streams — encoder suspect"


def test_jpeg_fixture_decodes_to_closed_form(spark):
    """The driver-fixture triangle: synthesize_media_payloads' JPEG
    slice (doc_id % 16 == 10) decodes through the REAL decoder to
    exactly the closed-form block grid the SQL oracles recompute —
    left MCU at Y1, right MCU at Y1+delta, constant chroma, all via
    the decoder's fixed-point YCbCr->RGB — and the payload size obeys
    the 161 + ceil((36 + 20*(n_mcu-1))/8) formula."""
    from pyspark.sql import functions as F

    from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.multimodal import (
        synthesize_media_payloads,
    )

    docs = spark.range(0, 512).select(F.col("id").alias("doc_id"))
    rows = (
        synthesize_media_payloads(docs)
        .filter(F.col("kind") == "jpeg")
        .collect()
    )
    assert len(rows) == 32  # every doc_id % 16 == 10 in [0, 512)
    for r in rows:
        d = r["doc_id"]
        assert d % 16 == 10
        w, h = d % 16 + 1, d % 8 + 1
        t = d // 16
        y1 = 192 + t % 32
        y2 = y1 + 16 + (d // 32) % 16
        cb1 = -(64 + (t * 7) % 32)
        cr1 = 64 + (t * 13) % 32
        n_mcu = -(-w // 8) * -(-h // 8)
        blob = bytes(r["payload"])
        if t % 2 == 1:  # progressive twin (SOF2, r11)
            assert b"\xff\xc2" in blob
            assert len(blob) == 195 + (33 + 17 * (n_mcu - 1) + 7) // 8
        else:
            assert b"\xff\xc0" in blob
            assert len(blob) == 161 + (36 + 20 * (n_mcu - 1) + 7) // 8

        kind, got = pixels(blob)
        assert kind == "jpeg" and got.shape == (h, w, 3)

        def rgb(y):
            return np.clip(
                np.array(
                    [
                        y + ((91881 * cr1 + 32768) >> 16),
                        y - ((22554 * cb1 + 46802 * cr1 + 32768) >> 16),
                        y + ((116130 * cb1 + 32768) >> 16),
                    ]
                ),
                0,
                255,
            )

        want = np.zeros((h, w, 3), np.int64)
        want[:, :8] = rgb(y1)
        want[:, 8:] = rgb(y2)
        assert (got.astype(np.int64) == want).all(), d


def test_jpeg_fill_bytes_before_markers():
    """r11 review: T.81 B.1.1.2 allows any number of 0xFF fill bytes
    before a marker — the walk must skip them instead of reading the
    segment length from the wrong offset."""
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    blob = mk_jpeg(px, qval=1)
    _, want = pixels(blob)

    # fill byte before the first segment (DQT) and before SOS
    filled = blob[:2] + b"\xff" + blob[2:]
    i = filled.index(b"\xff\xda")
    filled = filled[:i] + b"\xff\xff" + filled[i:]
    _, got = pixels(filled)
    assert (got == want).all()


def test_jpeg_restart_intervals():
    """r11: DRI + RSTn support — per-segment byte alignment, DC
    predictor reset at every restart, marker sequence validation.
    Restart-coded streams must decode identically to the same image
    without restarts, across intervals, subsampling, and grayscale."""
    rng = np.random.RandomState(17)
    g = rng.randint(0, 256, size=(24, 40), dtype=np.uint8)
    px = np.repeat(g[:, :, None], 3, axis=2)

    _, want = pixels(mk_jpeg(px, qval=1))
    for ri in (1, 2, 3, 7):
        _, got = pixels(mk_jpeg(px, qval=1, restart_interval=ri))
        assert (got == want).all(), ri
    # grayscale + 4:2:0 paths restart too
    _, want_g = pixels(mk_jpeg(g, qval=1))
    _, got_g = pixels(mk_jpeg(g, qval=1, restart_interval=2))
    assert (got_g == want_g).all()
    _, want_s = pixels(mk_jpeg(px, qval=1, subsampling="420"))
    _, got_s = pixels(mk_jpeg(px, qval=1, subsampling="420", restart_interval=1))
    assert (got_s == want_s).all()

    # DC predictor reset is REAL: a stream whose encoder reset but
    # whose decoder did not would mis-predict every post-restart block;
    # exactness above proves the reset happened. Now the refusals:
    blob = mk_jpeg(px, qval=1, restart_interval=2)

    # out-of-sequence RST marker -> ValueError
    i = blob.index(b"\xff\xd0")
    broken = blob[:i] + b"\xff\xd5" + blob[i + 2:]
    with pytest.raises(ValueError, match="sequence"):
        pixels(broken)

    # RST markers with no DRI declared -> ValueError
    j = blob.index(b"\xff\xdd")
    no_dri = blob[:j] + blob[j + 6:]
    with pytest.raises(ValueError, match="DRI"):
        pixels(no_dri)

    # a missing segment (truncate after the first RST) -> ValueError
    with pytest.raises(ValueError):
        pixels(blob[: i + 6] + b"\xff\xd9")


def test_jpeg_progressive_equals_baseline():
    """r11: progressive (SOF2) decode — the scan script is a LOSSLESS
    re-encoding of the same quantized coefficients, so progressive and
    baseline encodings of the same pixels must decode BIT-identically.
    Covers spectral selection, DC+AC successive approximation, EOB
    runs with buffered correction bits, 4:2:0, grayscale, and coarse
    quantization (dense EOB-run paths)."""
    rng = np.random.RandomState(23)
    cases = [
        ((8, 8), "444", 1), ((16, 16), "444", 1), ((9, 21), "444", 1),
        ((24, 17), "444", 8), ((16, 16), "420", 1), ((9, 22), "420", 8),
        ((1, 1), "444", 1), ((32, 32), "444", 32),
    ]
    for (h, w), sub, qv in cases:
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        _, base = pixels(mk_jpeg(px, qval=qv, subsampling=sub))
        kind, prog = pixels(
            mk_jpeg(px, qval=qv, subsampling=sub, progressive=True)
        )
        assert kind == "jpeg"
        assert (prog == base).all(), (h, w, sub, qv)
    # grayscale progressive
    g = rng.randint(0, 256, size=(13, 19), dtype=np.uint8)
    _, base = pixels(mk_jpeg(g, qval=1))
    _, prog = pixels(mk_jpeg(g, qval=1, progressive=True))
    assert (prog == base).all()
    # smooth content (long zero runs, ZRL + EOBn interplay)
    yy, xx = np.mgrid[0:40, 0:40]
    smooth = ((yy * 3 + xx * 2) % 256).astype(np.uint8)
    _, base = pixels(mk_jpeg(smooth, qval=4))
    _, prog = pixels(mk_jpeg(smooth, qval=4, progressive=True))
    assert (prog == base).all()


def test_jpeg_progressive_property():
    import hypothesis.strategies as st
    from hypothesis import given, settings

    @settings(max_examples=20, deadline=None)
    @given(
        w=st.integers(1, 20),
        h=st.integers(1, 18),
        gray=st.booleans(),
        sub=st.sampled_from(["444", "420"]),
        qv=st.sampled_from([1, 8]),
        seed=st.integers(0, 2**31),
    )
    def check(w, h, gray, sub, qv, seed):
        rng = np.random.RandomState(seed % (2**31))
        if gray:
            src = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
            base_blob = mk_jpeg(src, qval=qv)
            prog_blob = mk_jpeg(src, qval=qv, progressive=True)
        else:
            src = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            base_blob = mk_jpeg(src, qval=qv, subsampling=sub)
            prog_blob = mk_jpeg(src, qval=qv, subsampling=sub,
                                progressive=True)
        _, base = pixels(base_blob)
        _, prog = pixels(prog_blob)
        assert (prog == base).all()
        meta = decode_media(prog_blob)
        assert meta["kind"] == "jpeg"
        assert (meta["width"], meta["height"]) == (w, h)
        assert meta["content_sum"] == int(base.astype(np.int64).sum())

    check()


def test_jpeg_progressive_with_restarts():
    """Progressive + DRI: every scan restarts at its own unit cadence
    (MCUs for interleaved DC, blocks for AC) with per-scan RST
    numbering — must decode identically to the restart-free encoding."""
    rng = np.random.RandomState(29)
    px = rng.randint(0, 256, size=(24, 40, 3), dtype=np.uint8)
    _, want = pixels(mk_jpeg(px, qval=1, progressive=True))
    for ri in (1, 2, 5):
        _, got = pixels(
            mk_jpeg(px, qval=1, progressive=True, restart_interval=ri)
        )
        assert (got == want).all(), ri
    g = rng.randint(0, 256, size=(17, 33), dtype=np.uint8)
    _, want_g = pixels(mk_jpeg(g, qval=8, progressive=True))
    _, got_g = pixels(
        mk_jpeg(g, qval=8, progressive=True, restart_interval=3)
    )
    assert (got_g == want_g).all()


def test_jpeg_malformed_streams_gate_as_valueerror():
    """r11 review: every malformed-stream path raises the documented
    ValueError, never a raw IndexError from deep in the walk/numpy —
    trailing fill bytes, and a spectral band past the 64-coefficient
    row."""
    import struct

    # payload ending in a run of 0xFF fill bytes
    with pytest.raises(ValueError):
        pixels(b"\xff\xd8\xff\xff\xff\xff")

    # Se > 63 in a progressive SOS
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    blob = mk_jpeg(px, qval=1, progressive=True)
    i = blob.index(b"\xff\xda")
    ln = struct.unpack_from(">H", blob, i + 2)[0]
    sos = bytearray(blob[i + 4 : i + 2 + ln])
    ns = sos[0]
    sos[2 + 2 * ns] = 200  # Se
    bad = blob[: i + 4] + bytes(sos) + blob[i + 2 + ln:]
    with pytest.raises(ValueError, match="spectral"):
        pixels(bad)
