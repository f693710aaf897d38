"""Pure-Python JPEG codec pair (baseline + progressive), split out of
functions/multimodal.py in r15 (VERDICT r14 #3: multimodal.py sat at
2272/2500 lines after the r14 progressive work — this hoists the codec
core BEFORE any new media code, the catalog.py r13->r14 lesson).
multimodal.py re-exports :func:`encode_jpeg`,
:func:`encode_jpeg_progressive` and :func:`decode_jpeg` (the only names
the rest of the repo uses), so every historical import path through
``big_data_table_spark.functions.multimodal`` still works — the
theta_store / mg_store shim precedent.

This module is self-contained byte/numpy code: it imports nothing from
multimodal (no circularity; multimodal imports it at top, one
direction), and numpy stays function-local so a metadata-only query
never pays the import.

Reference parity note: the reference (jangorecki/big.data.table,
R/big.data.table.R:1-648) has no media surface — this is declared
extension surface for the 100 TB training-data pipeline (see
multimodal.py's module docstring for the Spark-side design).
"""

from __future__ import annotations

import struct

# --------------------------------------------------------------------- #
# JPEG (baseline sequential DCT) — the last algorithmic media gap
# (r12 VERDICT #7): a REAL pure-Python+numpy codec pair, so the lossy
# transform-coded image modality decodes end-to-end without PIL.
# Encoder: JFIF RGB->YCbCr, 4:4:4 (no subsampling), orthonormal 8x8
# DCT-II, Annex-K-style quantization (half-away-from-zero, the libjpeg
# convention), zigzag, DC-difference + run/size AC symbols, and
# per-image OPTIMIZED canonical Huffman tables (two-pass, like
# `cjpeg -optimize`) emitted in DHT — every symbol that occurs gets an
# equal-length canonical code with the all-ones codeword reserved, a
# valid JPEG table by construction.  Decoder: a GENERAL decoder for
# ALL THREE Huffman frame types — marker walk, 8- and 16-bit DQT,
# SOF0, SOF1 (extended sequential — the 12-bit carrier, r15) and SOF2
# (progressive spectral selection, r14), canonical DHT reconstruction
# (any valid multi-length table, not just the ones this encoder
# writes), byte-unstuffed scan decode (EOBRUN band coding in
# progressive scans), dequant, IDCT, YCbCr->RGB — so standard-table
# JPEGs from other encoders decode too.  Sampling grids: 4:4:4, 4:2:0,
# 4:2:2, and 1-component grayscale; DRI/RSTn restart intervals in all
# frame types, successive approximation (Ah/Al refinement scans, the
# libjpeg default-script shape) on both sides; 12-bit samples in the
# sequential path (encode precision=12 / decode_jpeg12 — level shift
# and chroma center at 2048, uint16-LE wire format).  Rounding is
# floor(x + 0.5) everywhere (spelled out because the closed-form
# oracle of the catalog entry reproduces it in SQL).  12-bit
# PROGRESSIVE, arithmetic coding, hierarchical and lossless modes
# raise with a clear message — honest scope, like the PNG decoder's
# 16-bit gate.
# --------------------------------------------------------------------- #

_JPEG_QY = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_JPEG_QC = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]
"""The ISO/IEC 10918-1 Annex K example quantization tables (quality 50)
— Q_Y[0,0] = 16 and the catalog entry's even-grayscale pixel model make
the DC quantization EXACT (see synth_jpeg_media)."""


def _jpeg_zigzag() -> list[int]:
    """The 64-entry zigzag permutation, GENERATED (diagonal walk with
    alternating direction) rather than transcribed — raster index of the
    k-th zigzag position."""
    order = []
    for s in range(15):
        rng = range(min(s, 7), max(0, s - 7) - 1, -1) if s % 2 == 0 else range(
            max(0, s - 7), min(s, 7) + 1
        )
        for r in rng:
            order.append(r * 8 + (s - r))
    return order


_ZIGZAG = _jpeg_zigzag()


def _dct_matrix():
    import numpy as np

    t = np.zeros((8, 8))
    for i in range(8):
        c = (1.0 / 8.0) ** 0.5 if i == 0 else 0.5
        for j in range(8):
            t[i, j] = c * np.cos((2 * j + 1) * i * np.pi / 16.0)
    return t


def _jpeg_size_cat(v: int) -> int:
    """DC/AC magnitude category: bit length of |v| (0 for 0)."""
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


class _BitWriter:
    """MSB-first bit writer with JPEG 0xFF byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill, per spec

    def restart(self, n: int) -> None:
        """Emit an RSTn marker: byte-align (stuffed padding), then the
        raw two marker bytes — markers are never stuffed."""
        self.pad_to_byte()
        self.out += bytes([0xFF, 0xD0 + (n & 7)])

    def flush(self) -> bytes:
        self.pad_to_byte()
        return bytes(self.out)


class _BitReader:
    """MSB-first bit reader over an already-unstuffed scan payload."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def take(self, nbits: int) -> int:
        while self.nbits < nbits:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG scan data")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        v = (self.acc >> (self.nbits - nbits)) & ((1 << nbits) - 1)
        self.nbits -= nbits
        self.acc &= (1 << self.nbits) - 1
        return v


def _huff_extend(bits: int, size: int) -> int:
    """Reverse the magnitude-bits mapping: DC/AC payload bits -> value."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _canonical_codes(counts: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the JPEG canonical-code procedure
    (Annex C): codes of each length assigned in symbol order, doubling
    at each length step."""
    codes = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _optimized_table(freq: dict[int, int]) -> tuple[list[int], list[int]]:
    """(counts[16], symbols) for an equal-length canonical table over
    the symbols that occur — the shortest length whose code space holds
    them all with the all-ones codeword left unused (spec F.1.4.4.1's
    reservation), which any conforming decoder accepts.  DC alphabets
    have <=12 symbols, AC <=256; >255 distinct symbols cannot happen in
    practice (EOB/ZRL always collapse runs) and raises honestly."""
    symbols = sorted(freq)
    n = len(symbols)
    if n == 0 or n > 255:
        raise ValueError(f"cannot build a single-length table for {n} symbols")
    length = 1
    while (1 << length) <= n:  # strict: reserve the all-ones code
        length += 1
    counts = [0] * 16
    counts[length - 1] = n
    return counts, symbols


def _seg(marker: int, payload: bytes) -> bytes:
    import struct

    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _rgb_to_ycbcr(rgb, center: float = 128.0):
    """JFIF color transform; ``center`` is the chroma zero point —
    2^(P-1) for precision P (T.81 level-shift convention), so the same
    matrix serves 8-bit (128) and 12-bit (2048) frames."""
    import numpy as np

    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = center - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = center + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _blockify(plane, h: int, w: int):
    """(H8, W8) padded plane -> (n_blocks, 8, 8) in MCU (row-major) order."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    return (
        plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(bh * bw, 8, 8)
    )


def encode_jpeg(
    width: int,
    height: int,
    rgb: bytes,
    subsample: bool = False,
    restart_interval: int = 0,
    grayscale: bool = False,
    precision: int = 8,
) -> bytes:
    """Encode raw interleaved RGB8 as a REAL baseline JPEG (SOF0,
    Annex-K quant tables, per-image optimized canonical Huffman tables)
    — pure Python + numpy.  ``subsample=False`` emits 4:4:4;
    ``subsample=True`` (or ``"420"``) emits 4:2:0 (Y sampling 2x2,
    chroma 2x2-mean downsampled, the MCU interleave real-world encoders
    default to); ``subsample="422"`` emits 4:2:2 (r14 — Y 2x1, chroma
    halved horizontally only, the digital-video/scanner grid).
    ``grayscale=True`` emits a 1-COMPONENT frame (r14): the luma plane
    only — one DQT, one DC/AC table pair, no chroma MCU slots — the
    shape real-world encoders produce for mode-L sources (input stays
    interleaved RGB8; the JFIF luma transform reduces it).
    ``restart_interval=N`` emits a DRI segment and an RSTn marker
    every N MCUs (byte-aligned, DC predictors reset — what makes
    real-world streams resync-able and parallel-decodable).  Two
    passes: collect DC/AC symbol counts, build the DHT tables,
    then emit the entropy-coded scan with 0xFF byte stuffing.
    Quantization is half-away-from-zero (sign * floor(|F|/q + 0.5)),
    the libjpeg convention the decoder and the catalog oracle mirror.
    ``precision=12`` (r15) emits an EXTENDED SEQUENTIAL frame (SOF1 —
    T.81 baseline is 8-bit by definition, so 12-bit rides the extended
    process real medical/scientific encoders use): input becomes
    little-endian uint16 interleaved RGB samples in [0, 4095]
    (``6 * width * height`` bytes), the level shift and chroma center
    move to 2048, and everything else — the DCT, Annex-K tables,
    optimized Huffman coding, subsampling grids, DRI/RSTn — is the
    same machinery at the wider sample width."""
    import struct

    import numpy as np

    if precision not in (8, 12):
        raise ValueError(f"unsupported sample precision {precision} (8 or 12)")
    if precision == 12:
        if len(rgb) != 6 * width * height:
            raise ValueError(
                f"expected {6 * width * height} bytes of little-endian "
                f"uint16 rgb samples, got {len(rgb)}"
            )
    elif len(rgb) != 3 * width * height:
        raise ValueError(f"expected {3 * width * height} rgb bytes, got {len(rgb)}")
    if grayscale and subsample:
        raise ValueError("grayscale has no chroma planes to subsample")
    ncomp = 1 if grayscale else 3
    if subsample in (False, None):
        samp = [(1, 1)] * ncomp
    elif subsample in (True, "420"):
        samp = [(2, 2), (1, 1), (1, 1)]
    elif subsample == "422":
        samp = [(2, 1), (1, 1), (1, 1)]
    else:
        raise ValueError(f"unsupported subsampling request {subsample!r}")
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    center = float(1 << (precision - 1))
    if precision == 12:
        img = np.frombuffer(rgb, dtype="<u2").reshape(height, width, 3)
        if img.max(initial=0) >= 4096:
            raise ValueError("12-bit samples must be < 4096")
    else:
        img = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    ycc = _rgb_to_ycbcr(img, center)
    mw, mh = 8 * hmax, 8 * vmax
    ph, pw = -(-height // mh) * mh, -(-width // mw) * mw
    padded = np.empty((ph, pw, 3))
    padded[:height, :width] = ycc
    padded[height:, :width] = ycc[height - 1 : height, :]  # edge replicate
    padded[:, width:] = padded[:, width - 1 : width]
    t = _dct_matrix()
    qt = [np.array(_JPEG_QY, dtype=np.float64).reshape(8, 8),
          np.array(_JPEG_QC, dtype=np.float64).reshape(8, 8)]
    comp_q = [0, 1, 1]
    mcus_x, mcus_y = pw // mw, ph // mh
    quantized = []  # per component: (blocks_y, blocks_x, 64) int zigzagged
    for c in range(ncomp):
        h_i, v_i = samp[c]
        fy, fx = vmax // v_i, hmax // h_i
        plane = padded[..., c]
        if fy > 1 or fx > 1:  # chroma mean-downsample
            plane = plane.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        bh, bw2 = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = _blockify(plane - center, *plane.shape)
        coefs = np.einsum("ij,njk,lk->nil", t, blocks, t)
        q = qt[comp_q[c]]
        sign = np.sign(coefs)
        qcoef = (sign * np.floor(np.abs(coefs) / q + 0.5)).astype(np.int64)
        quantized.append(qcoef.reshape(bh, bw2, 64)[:, :, _ZIGZAG])

    def scan(emit_dc, emit_ac, emit_rst=None):
        pred = [0, 0, 0]
        mcu_i = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if (
                    restart_interval
                    and mcu_i
                    and mcu_i % restart_interval == 0
                ):
                    if emit_rst is not None:
                        emit_rst((mcu_i // restart_interval - 1) & 7)
                    pred = [0, 0, 0]
                mcu_i += 1
                for c in range(ncomp):
                    h_i, v_i = samp[c]
                    for vb in range(v_i):
                        for hb in range(h_i):
                            zz = quantized[c][my * v_i + vb][mx * h_i + hb]
                            diff = int(zz[0]) - pred[c]
                            pred[c] = int(zz[0])
                            emit_dc(c, diff)
                            run = 0
                            last_nz = 0
                            for k in range(63, 0, -1):
                                if zz[k] != 0:
                                    last_nz = k
                                    break
                            for k in range(1, last_nz + 1):
                                v = int(zz[k])
                                if v == 0:
                                    run += 1
                                    continue
                                while run > 15:
                                    emit_ac(c, 0xF0, 0, 0)  # ZRL
                                    run -= 16
                                s = _jpeg_size_cat(v)
                                emit_ac(c, (run << 4) | s, v, s)
                                run = 0
                            if last_nz < 63:
                                emit_ac(c, 0x00, 0, 0)  # EOB

    dc_freq = [{}, {}]
    ac_freq = [{}, {}]

    def count_dc(c, diff):
        tbl = dc_freq[0 if c == 0 else 1]
        s = _jpeg_size_cat(diff)
        tbl[s] = tbl.get(s, 0) + 1

    def count_ac(c, sym, v, s):
        tbl = ac_freq[0 if c == 0 else 1]
        tbl[sym] = tbl.get(sym, 0) + 1

    scan(count_dc, count_ac)
    n_tabs = 1 if grayscale else 2
    dc_tabs = [_optimized_table(f) for f in dc_freq[:n_tabs]]
    ac_tabs = [_optimized_table(f) for f in ac_freq[:n_tabs]]
    dc_codes = [_canonical_codes(*tab) for tab in dc_tabs]
    ac_codes = [_canonical_codes(*tab) for tab in ac_tabs]

    w = _BitWriter()

    def emit_dc(c, diff):
        t_i = 0 if c == 0 else 1
        s = _jpeg_size_cat(diff)
        code, length = dc_codes[t_i][s]
        w.put(code, length)
        if s:
            w.put(diff if diff > 0 else diff + (1 << s) - 1, s)

    def emit_ac(c, sym, v, s):
        t_i = 0 if c == 0 else 1
        code, length = ac_codes[t_i][sym]
        w.put(code, length)
        if s:
            w.put(v if v > 0 else v + (1 << s) - 1, s)

    scan(emit_dc, emit_ac, emit_rst=w.restart)
    entropy = w.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    q_emit = ((0, _JPEG_QY),) if grayscale else ((0, _JPEG_QY), (1, _JPEG_QC))
    for tid, table in q_emit:
        out += _seg(0xFFDB, bytes([tid]) + bytes(table[i] for i in _ZIGZAG))
    sof = struct.pack(">BHHB", precision, height, width, ncomp)
    comp_ids = ((1, 0),) if grayscale else ((1, 0), (2, 1), (3, 1))
    for c, (cid, qsel) in enumerate(comp_ids):
        sof += bytes([cid, (samp[c][0] << 4) | samp[c][1], qsel])
    # T.81: baseline (SOF0) is 8-bit by definition; 12-bit samples ride
    # the extended sequential Huffman process (SOF1)
    out += _seg(0xFFC1 if precision == 12 else 0xFFC0, sof)
    dht_emit = (
        [(0, 0, dc_tabs[0]), (1, 0, ac_tabs[0])]
        if grayscale
        else [
            (0, 0, dc_tabs[0]),
            (0, 1, dc_tabs[1]),
            (1, 0, ac_tabs[0]),
            (1, 1, ac_tabs[1]),
        ]
    )
    for cls, tid, (counts, symbols) in dht_emit:
        out += _seg(
            0xFFC4, bytes([(cls << 4) | tid]) + bytes(counts) + bytes(symbols)
        )
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = (
        bytes([1, 1, 0x00, 0, 63, 0])
        if grayscale
        else bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    )
    out += _seg(0xFFDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_progressive(
    width: int,
    height: int,
    rgb: bytes,
    grayscale: bool = False,
    bands: tuple = ((1, 5), (6, 63)),
    restart_interval: int = 0,
    successive: bool = False,
) -> bytes:
    """Encode raw interleaved RGB8 as a PROGRESSIVE (SOF2) JPEG with a
    SPECTRAL-SELECTION scan script (r14): one interleaved DC scan, then
    per component one AC scan per ``bands`` entry (default the
    libjpeg-style low/high split 1-5 / 6-63) — the multi-pass shape
    real-world web encoders emit.  ``successive=True`` adds SUCCESSIVE
    APPROXIMATION: the first passes code at point transform Al=1 and a
    per-bit refinement round (DC raw-bit scan, AC correction-bit scans
    with the G.1.2.3 buffered-bits discipline) restores full precision
    — the two-dimension script libjpeg's default progressive mode
    uses.  4:4:4 (or 1-component grayscale)
    only: there the padded MCU grid equals every component's
    non-interleaved block grid, so the interleaved DC scan and the
    non-interleaved AC scans cover the same blocks by construction.
    Quantization is IDENTICAL to :func:`encode_jpeg`, and when the
    bands cover 1..63 completely the decoder reconstructs the SAME
    coefficients — so the progressive stream decodes BIT-IDENTICALLY
    to the baseline encoding of the same image — with or without
    ``successive`` (the law the r14 pins hold).  AC band scans use the
    G.1.2.2 EOBRUN coding (EOBn = r<<4 plus r raw bits, capped at
    0x7FFF); each Huffman-coded scan gets its own optimized canonical
    DHT emitted just before it (DC refinement scans carry raw bits, no
    DHT); ``restart_interval`` emits DRI + RSTn every N MCUs (DC
    scans) / blocks (AC scans), with the EOBRUN flushed before every
    restart as T.81 requires."""
    import struct

    import numpy as np

    if len(rgb) != 3 * width * height:
        raise ValueError(f"expected {3 * width * height} rgb bytes, got {len(rgb)}")
    prev_hi = 0
    for ss, se in bands:
        if not (1 <= ss <= se <= 63) or ss <= prev_hi:
            raise ValueError(f"invalid spectral bands {bands}")
        prev_hi = se
    ncomp = 1 if grayscale else 3
    img = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    ycc = _rgb_to_ycbcr(img)
    ph, pw = -(-height // 8) * 8, -(-width // 8) * 8
    padded = np.empty((ph, pw, 3))
    padded[:height, :width] = ycc
    padded[height:, :width] = ycc[height - 1 : height, :]  # edge replicate
    padded[:, width:] = padded[:, width - 1 : width]
    t = _dct_matrix()
    qtabs = [
        np.array(_JPEG_QY, dtype=np.float64).reshape(8, 8),
        np.array(_JPEG_QC, dtype=np.float64).reshape(8, 8),
    ]
    comp_q = [0, 1, 1][:ncomp]
    bh, bw = ph // 8, pw // 8
    quantized = []
    for c in range(ncomp):
        blocks = _blockify(padded[..., c] - 128.0, ph, pw)
        coefs = np.einsum("ij,njk,lk->nil", t, blocks, t)
        q = qtabs[comp_q[c]]
        qc = (np.sign(coefs) * np.floor(np.abs(coefs) / q + 0.5)).astype(np.int64)
        quantized.append(qc.reshape(bh, bw, 64)[:, :, _ZIGZAG])

    def dc_scan(emit_dc, al, emit_rst=None):
        pred = [0] * ncomp
        unit = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and unit and unit % restart_interval == 0:
                    if emit_rst is not None:
                        emit_rst((unit // restart_interval - 1) & 7)
                    pred = [0] * ncomp
                unit += 1
                for c in range(ncomp):
                    v = int(quantized[c][by, bx, 0]) >> al
                    emit_dc(c, v - pred[c])
                    pred[c] = v

    def dc_refine_scan(emit_bit, al, emit_rst=None):
        # DC refinement: one raw bit per block per component, no
        # Huffman coding at all (T.81 G.1.2.1)
        unit = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and unit and unit % restart_interval == 0:
                    if emit_rst is not None:
                        emit_rst((unit // restart_interval - 1) & 7)
                unit += 1
                for c in range(ncomp):
                    emit_bit((int(quantized[c][by, bx, 0]) >> al) & 1)

    def ac_scan(c, ss, se, al, emit_sym, emit_bits, emit_rst=None):
        eobrun = 0

        def flush():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                emit_sym(r << 4)
                emit_bits(eobrun - (1 << r), r)
                eobrun = 0

        unit = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and unit and unit % restart_interval == 0:
                    flush()  # an EOB run never crosses a restart
                    if emit_rst is not None:
                        emit_rst((unit // restart_interval - 1) & 7)
                unit += 1
                zz = quantized[c][by, bx]
                last = ss - 1
                for k in range(se, ss - 1, -1):
                    if abs(int(zz[k])) >> al:
                        last = k
                        break
                if last < ss:  # whole band zero at this precision
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush()
                    continue
                flush()
                run = 0
                for k in range(ss, last + 1):
                    v = int(zz[k])
                    m = abs(v) >> al  # point-transformed magnitude
                    if m == 0:
                        run += 1
                        continue
                    while run > 15:
                        emit_sym(0xF0)  # ZRL
                        run -= 16
                    s = _jpeg_size_cat(m)
                    emit_sym((run << 4) | s)
                    emit_bits(m if v > 0 else -m + (1 << s) - 1, s)
                    run = 0
                if last < se:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush()
        flush()

    def ac_refine_scan(c, ss, se, al, emit_sym, emit_bits, emit_rst=None):
        # T.81 G.1.2.3 / the libjpeg encode_mcu_AC_refine shape:
        # correction bits buffer behind the next emitted symbol (br
        # within a block, be across an EOB run)
        eobrun = 0
        be: list[int] = []

        def flush():
            nonlocal eobrun, be
            if eobrun:
                r = eobrun.bit_length() - 1
                emit_sym(r << 4)
                emit_bits(eobrun - (1 << r), r)
            for bit in be:
                emit_bits(bit, 1)
            eobrun = 0
            be = []

        unit = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and unit and unit % restart_interval == 0:
                    flush()
                    if emit_rst is not None:
                        emit_rst((unit // restart_interval - 1) & 7)
                unit += 1
                zz = quantized[c][by, bx]
                eob = ss - 1  # last NEWLY-significant position
                for k in range(se, ss - 1, -1):
                    if abs(int(zz[k])) >> al == 1:
                        eob = k
                        break
                r = 0
                br: list[int] = []
                for k in range(ss, se + 1):
                    t = abs(int(zz[k])) >> al
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eob:
                        flush()
                        emit_sym(0xF0)
                        r -= 16
                        for bit in br:
                            emit_bits(bit, 1)
                        br = []
                    if t > 1:  # history coefficient: one correction bit
                        br.append(t & 1)
                        continue
                    flush()  # newly significant at this precision
                    emit_sym((r << 4) | 1)
                    emit_bits(1 if int(zz[k]) > 0 else 0, 1)
                    for bit in br:
                        emit_bits(bit, 1)
                    br = []
                    r = 0
                if r > 0 or br:
                    eobrun += 1
                    be.extend(br)
                    if eobrun == 0x7FFF or len(be) > 937:
                        flush()  # the libjpeg MAX_CORR_BITS discipline
        flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    q_emit = ((0, _JPEG_QY),) if grayscale else ((0, _JPEG_QY), (1, _JPEG_QC))
    for tid, table in q_emit:
        out += _seg(0xFFDB, bytes([tid]) + bytes(table[i] for i in _ZIGZAG))
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    comp_ids = ((1, 0),) if grayscale else ((1, 0), (2, 1), (3, 1))
    for _c, (cid, qsel) in enumerate(comp_ids):
        sof += bytes([cid, 0x11, qsel])
    out += _seg(0xFFC2, sof)
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))

    # ---- scan script emission ----
    n_tabs = 1 if grayscale else 2
    al1 = 1 if successive else 0

    def write_dc_first(al):
        dc_freq: list[dict] = [{} for _ in range(n_tabs)]

        def count_dc(c, diff):
            tbl = dc_freq[0 if c == 0 else 1]
            s = _jpeg_size_cat(diff)
            tbl[s] = tbl.get(s, 0) + 1

        dc_scan(count_dc, al)
        dc_tabs = [_optimized_table(f) for f in dc_freq]
        dc_codes = [_canonical_codes(*tab) for tab in dc_tabs]
        for tid in range(n_tabs):
            counts, symbols = dc_tabs[tid]
            out.extend(
                _seg(0xFFC4, bytes([tid]) + bytes(counts) + bytes(symbols))
            )
        w = _BitWriter()

        def emit_dc(c, diff):
            t_i = 0 if c == 0 else 1
            s = _jpeg_size_cat(diff)
            code, length = dc_codes[t_i][s]
            w.put(code, length)
            if s:
                w.put(diff if diff > 0 else diff + (1 << s) - 1, s)

        sos = bytes([ncomp])
        for i, (cid, _q) in enumerate(comp_ids):
            sos += bytes([cid, (0 if i == 0 else 1) << 4])
        sos += bytes([0, 0, al])  # Ss=0, Se=0, Ah=0
        out.extend(_seg(0xFFDA, sos))
        dc_scan(emit_dc, al, emit_rst=w.restart)
        out.extend(w.flush())

    def write_dc_refine(ah, al):
        # raw bits only — no DHT emitted, tables unused (G.1.2.1)
        w = _BitWriter()
        sos = bytes([ncomp])
        for _i, (cid, _q) in enumerate(comp_ids):
            sos += bytes([cid, 0])
        sos += bytes([0, 0, (ah << 4) | al])
        out.extend(_seg(0xFFDA, sos))
        dc_refine_scan(lambda bit: w.put(bit, 1), al, emit_rst=w.restart)
        out.extend(w.flush())

    def write_ac(c, ss, se, ah, al):
        scan_fn = ac_refine_scan if ah else ac_scan
        freq: dict[int, int] = {}
        scan_fn(
            c, ss, se, al,
            lambda sym: freq.__setitem__(sym, freq.get(sym, 0) + 1),
            lambda v, n: None,
        )
        counts, symbols = _optimized_table(freq)
        ac_codes = _canonical_codes(counts, symbols)
        out.extend(_seg(0xFFC4, bytes([0x10]) + bytes(counts) + bytes(symbols)))
        w = _BitWriter()

        def emit_sym(sym):
            code, length = ac_codes[sym]
            w.put(code, length)

        def emit_bits(v, n):
            if n:
                w.put(v, n)

        out.extend(
            _seg(0xFFDA, bytes([1, comp_ids[c][0], 0x00, ss, se, (ah << 4) | al]))
        )
        scan_fn(c, ss, se, al, emit_sym, emit_bits, emit_rst=w.restart)
        out.extend(w.flush())

    write_dc_first(al1)
    for c in range(ncomp):
        for ss, se in bands:
            write_ac(c, ss, se, 0, al1)
    if successive:
        # one refinement pass per approximation bit: Ah=Al+1 chains
        # down to Al=0 (here al1=1, so exactly one refinement round)
        write_dc_refine(1, 0)
        for c in range(ncomp):
            for ss, se in bands:
                write_ac(c, ss, se, 1, 0)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _dht_decoder(counts: list[int], symbols: list[int]):
    """(code, length) -> symbol lookup for the general canonical case."""
    return {v: k for k, v in _canonical_codes(counts, symbols).items()}


def _read_huff(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.take(1)
        length += 1
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG scan")


def _unstuff_entropy(blob: bytes, start: int):
    """Unstuff entropy-coded data from ``start`` until a non-RST
    marker: (restart segments, index of the terminating 0xFF, marker
    code).  Stuffed 0xFF00 pairs collapse to 0xFF; RSTn markers split
    segments; end-of-blob without a terminator behaves as EOI (the
    lenient baseline path).  Shared by the baseline single-scan read
    and the progressive multi-scan walk (r14)."""
    segments: list[bytes] = []
    payload = bytearray()
    i = start
    while i < len(blob):
        b = blob[i]
        if b == 0xFF:
            nxt = blob[i + 1] if i + 1 < len(blob) else 0xD9
            if nxt == 0x00:
                payload.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn: segment boundary
                segments.append(bytes(payload))
                payload = bytearray()
                i += 2
                continue
            segments.append(bytes(payload))
            return segments, i, nxt
        payload.append(b)
        i += 1
    segments.append(bytes(payload))
    return segments, len(blob), 0xD9


def decode_jpeg(blob: bytes) -> tuple[int, int, bytes]:
    """The 8-BIT VIEW of :func:`_decode_jpeg_impl`, keeping the
    historical signature every caller uses → (width, height,
    rgb8_bytes).  8-bit streams pass through; 12-bit (SOF1) streams
    downshift by 4 bits (the opaque-raster view, mirroring PNG's
    RGB view) — full-precision callers use :func:`decode_jpeg12`."""
    import numpy as np

    width, height, prec, arr = _decode_jpeg_impl(blob)
    if prec == 12:
        arr = arr >> 4
    return width, height, arr.astype(np.uint8).tobytes()


def decode_jpeg12(blob: bytes) -> tuple[int, int, bytes]:
    """Full-precision decode of a 12-bit (SOF1) stream → (width,
    height, little-endian uint16 interleaved RGB samples in
    [0, 4095]) — the exact wire format :func:`encode_jpeg`
    (precision=12) consumes, so the even-gray exactness law holds at
    the full sample width.  8-bit streams raise (use
    :func:`decode_jpeg`)."""
    width, height, prec, arr = _decode_jpeg_impl(blob)
    if prec != 12:
        raise ValueError(f"{prec}-bit stream (use decode_jpeg for 8-bit)")
    return width, height, arr.astype("<u2").tobytes()


def _decode_jpeg_impl(blob: bytes) -> tuple[int, int, int, "object"]:
    """REAL lossy-image decode, pure Python + numpy: marker walk, 8- or
    16-bit DQT, SOF0/SOF1/SOF2 (baseline, extended sequential — the
    12-bit carrier, r15 — and PROGRESSIVE spectral selection, r14;
    4:4:4, 4:2:0, 4:2:2 and 1-component grayscale — the shapes
    real-world encoders emit; grayscale output is luma replicated to
    RGB so downstream consumers keep one channel shape), canonical DHT
    reconstruction (multi-length — any valid baseline table, not only
    this encoder's), byte-unstuffed Huffman scan decode (DC prediction
    + run/size AC + ZRL/EOB; progressive scans add the EOBRUN band
    coding over per-component coefficient buffers), dequantization,
    orthonormal IDCT, chroma upsample and YCbCr->RGB with floor(x+0.5)
    rounding -> (width, height, precision, rgb int array).  DRI / RSTn
    restart intervals are honored in all frame types (segment split,
    DC-predictor and EOBRUN reset, byte re-alignment); so is
    SUCCESSIVE APPROXIMATION (Ah/Al — first passes at a point
    transform, then per-bit DC/AC refinement scans, the shape
    libjpeg's default progressive script emits).  12-bit progressive
    and other sampling grids raise with the unsupported feature
    named."""
    import struct

    import numpy as np

    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG blob")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    width = height = None
    prec = 8
    comp_q: list[int] = []
    comp_samp: list[tuple[int, int]] = []
    comp_ids: list[int] = []
    scan_sel: list[tuple[int, int]] = []
    entropy = None
    restart_interval = 0
    segments: list[bytes] = []
    progressive = False
    prog_scans: list[dict] = []
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError(
                f"marker sync lost at offset {pos}: expected 0xFF before a "
                f"marker code, found 0x{blob[pos]:02X}"
            )
        # ISO 10918-1 B.1.1.2: any number of 0xFF FILL bytes may pad the
        # stream before a marker code — conforming third-party encoders
        # emit them, so skip repeats before reading the code (r13 ADVICE).
        while pos + 4 <= len(blob) and blob[pos + 1] == 0xFF:
            pos += 1
        marker = (blob[pos] << 8) | blob[pos + 1]
        if marker == 0xFFD9:
            break
        (seglen,) = struct.unpack(">H", blob[pos + 2 : pos + 4])
        data = blob[pos + 4 : pos + 2 + seglen]
        if marker == 0xFFDB:
            off = 0
            while off < len(data):
                pq, tq = data[off] >> 4, data[off] & 0xF
                if pq == 0:
                    qt[tq] = list(data[off + 1 : off + 65])
                elif pq == 1:  # 16-bit entries (legal with 12-bit frames)
                    qt[tq] = [
                        (data[off + 1 + 2 * k] << 8) | data[off + 2 + 2 * k]
                        for k in range(64)
                    ]
                else:
                    raise ValueError(f"unknown DQT element precision Pq={pq}")
                off += 1 + 64 * (pq + 1)
        elif marker in (0xFFC0, 0xFFC1, 0xFFC2):
            progressive = marker == 0xFFC2
            prec, height, width, nc = struct.unpack(">BHHB", data[:6])
            if nc not in (1, 3):
                raise ValueError("only 1- or 3-component frames supported")
            if marker == 0xFFC0 and prec != 8:
                raise ValueError(
                    "baseline (SOF0) frames are 8-bit by definition; "
                    "12-bit needs extended sequential (SOF1)"
                )
            if marker == 0xFFC1 and prec not in (8, 12):
                raise ValueError(
                    f"unsupported SOF1 precision {prec} (8 or 12)"
                )
            if marker == 0xFFC2 and prec != 8:
                raise ValueError("12-bit progressive frames not supported")
            for c in range(nc):
                cid, samp, qsel = data[6 + 3 * c : 9 + 3 * c]
                comp_ids.append(cid)
                comp_samp.append((samp >> 4, samp & 0xF))
                comp_q.append(qsel)
            if comp_samp not in (
                [(1, 1)],  # grayscale (r14)
                [(1, 1)] * 3,
                [(2, 2), (1, 1), (1, 1)],
                [(2, 1), (1, 1), (1, 1)],  # 4:2:2 (r14)
            ):
                raise ValueError(
                    f"unsupported sampling grid {comp_samp} "
                    "(4:4:4, 4:2:0, 4:2:2 and grayscale only)"
                )
        elif marker == 0xFFC3:
            raise ValueError(
                "only baseline (SOF0), extended sequential (SOF1) and "
                "progressive (SOF2) frames supported — not lossless (SOF3)"
            )
        elif marker == 0xFFC4:
            off = 0
            while off < len(data):
                cls, tid = data[off] >> 4, data[off] & 0xF
                counts = list(data[off + 1 : off + 17])
                n = sum(counts)
                symbols = list(data[off + 17 : off + 17 + n])
                huff[(cls, tid)] = _dht_decoder(counts, symbols)
                off += 17 + n
        elif marker == 0xFFDD:
            (restart_interval,) = struct.unpack(">H", data[:2])
        elif marker == 0xFFDA:
            ns = data[0]
            scomps = []
            for c in range(ns):
                cid, sel = data[1 + 2 * c], data[2 + 2 * c]
                idx = comp_ids.index(cid) if cid in comp_ids else c
                scomps.append((idx, sel >> 4, sel & 0xF))
            # entropy-coded data runs from here to the next marker;
            # unstuff and split on RSTn markers into restart segments
            segs, end, term = _unstuff_entropy(blob, pos + 2 + seglen)
            if progressive:
                # record the scan (tables SNAPSHOT at scan time — later
                # DHT segments may redefine the same table ids) and
                # resume the marker walk at the terminator
                ss, se = data[1 + 2 * ns], data[2 + 2 * ns]
                ahal = data[3 + 2 * ns]
                prog_scans.append(
                    {
                        "comps": scomps,
                        "ss": ss,
                        "se": se,
                        "ah": ahal >> 4,
                        "al": ahal & 0xF,
                        "tabs": dict(huff),
                        "ri": restart_interval,
                        "segs": segs,
                    }
                )
                pos = end
                continue
            if term != 0xD9:
                raise ValueError(f"unexpected marker 0xFF{term:02X} in scan")
            if ns != len(comp_samp):
                # r14 ADVICE: a legal BASELINE stream may split the frame
                # into per-component non-interleaved scans (ns < ncomp,
                # T.81 B.2.3).  The sequential MCU loop below assumes ONE
                # interleaved scan covering every frame component —
                # consuming a partial scan as if interleaved would produce
                # silently wrong pixels, so raise instead (the progressive
                # path above handles multi-scan scripts for SOF2).
                raise ValueError("multi-scan baseline not supported")
            scan_sel = [(0, 0)] * len(comp_samp)
            for idx, td, ta in scomps:
                scan_sel[idx] = (td, ta)
            segments = segs
            entropy = segments[0]
            break
        pos += 2 + seglen
    if progressive:
        if width is None or not prog_scans:
            raise ValueError("missing SOF0 or SOS")
        planes = _decode_progressive_planes(
            width, height, comp_samp, comp_q, qt, prog_scans
        )
        return (width, height, prec,
                _planes_to_rgb(planes, comp_samp, width, height, prec))
    if width is None or entropy is None:
        raise ValueError("missing SOF0 or SOS")
    ncomp = len(comp_samp)
    hmax = max(s[0] for s in comp_samp)
    vmax = max(s[1] for s in comp_samp)
    mw, mh = 8 * hmax, 8 * vmax
    mcus_x, mcus_y = -(-width // mw), -(-height // mh)
    if len(segments) > 1 and not restart_interval:
        raise ValueError("RSTn markers in scan but no DRI segment")
    t = _dct_matrix()
    reader = _BitReader(segments[0])
    pred = [0, 0, 0]
    seg_i = 0
    mcu_i = 0
    planes = [
        np.zeros((mcus_y * 8 * comp_samp[c][1], mcus_x * 8 * comp_samp[c][0]))
        for c in range(ncomp)
    ]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                seg_i += 1  # next restart segment: re-align, reset DC
                if seg_i >= len(segments):
                    raise ValueError("missing restart segment in scan")
                reader = _BitReader(segments[seg_i])
                pred = [0, 0, 0]
            mcu_i += 1
            for c in range(ncomp):
                h_i, v_i = comp_samp[c]
                dc_tab = huff[(0, scan_sel[c][0])]
                ac_tab = huff[(1, scan_sel[c][1])]
                for vb in range(v_i):
                    for hb in range(h_i):
                        zz = np.zeros(64, dtype=np.int64)
                        s = _read_huff(reader, dc_tab)
                        pred[c] += _huff_extend(reader.take(s), s) if s else 0
                        zz[0] = pred[c]
                        k = 1
                        while k <= 63:
                            sym = _read_huff(reader, ac_tab)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            run, size = sym >> 4, sym & 0xF
                            k += run
                            if k > 63:
                                raise ValueError("AC coefficient index overflow")
                            zz[k] = _huff_extend(reader.take(size), size)
                            k += 1
                        q = np.array(qt[comp_q[c]], dtype=np.float64)
                        coefs = np.zeros(64)
                        coefs[_ZIGZAG] = zz * q[np.arange(64)]
                        block = t.T @ coefs.reshape(8, 8) @ t
                        r0 = (my * v_i + vb) * 8
                        c0 = (mx * h_i + hb) * 8
                        planes[c][r0 : r0 + 8, c0 : c0 + 8] = block + float(
                            1 << (prec - 1)
                        )
    return (width, height, prec,
            _planes_to_rgb(planes, comp_samp, width, height, prec))


def _planes_to_rgb(planes, comp_samp, width: int, height: int, prec: int = 8):
    """Shared reconstruction tail of all frame types: nearest-neighbor
    chroma upsample to the padded luma grid, crop, YCbCr->RGB (or luma
    replication for grayscale), floor(x+0.5) rounding, clamp to the
    sample range of ``prec``.  Returns the clamped integer RGB array;
    the decode views (:func:`decode_jpeg` / :func:`decode_jpeg12`)
    pick the byte layout."""
    import numpy as np

    center = float(1 << (prec - 1))
    ncomp = len(comp_samp)
    hmax = max(s[0] for s in comp_samp)
    vmax = max(s[1] for s in comp_samp)
    for c in range(ncomp):
        fy, fx = vmax // comp_samp[c][1], hmax // comp_samp[c][0]
        if fy > 1 or fx > 1:
            planes[c] = np.repeat(np.repeat(planes[c], fy, axis=0), fx, axis=1)
    y = planes[0][:height, :width]
    if ncomp == 1:
        # grayscale frame (r14): luma replicated into RGB so every
        # downstream consumer (stats, resize) keeps its 3-channel shape
        r = g = b = y
    else:
        cb = planes[1][:height, :width]
        cr = planes[2][:height, :width]
        r = y + 1.402 * (cr - center)
        g = y - 0.344136 * (cb - center) - 0.714136 * (cr - center)
        b = y + 1.772 * (cb - center)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(rgb + 0.5), 0, (1 << prec) - 1).astype(np.int32)


def _noninterleaved_blocks(
    width: int, height: int, samp: tuple[int, int], hmax: int, vmax: int
) -> tuple[int, int]:
    """(blocks wide, blocks high) of a NON-INTERLEAVED scan for one
    component (T.81 A.1.1/A.2.2: component dims are ceil-scaled by its
    sampling factors; a non-interleaved scan covers exactly those
    blocks — NOT the MCU-padded grid an interleaved scan covers)."""
    h_i, v_i = samp
    cw = -(-width * h_i // hmax)
    ch = -(-height * v_i // vmax)
    return -(-cw // 8), -(-ch // 8)


def _ac_refine_block(reader, ac_tab, zz, ss: int, se: int, al: int, eobrun: int) -> int:
    """One block of an AC SUCCESSIVE-APPROXIMATION refinement scan
    (T.81 G.1.2.3): already-significant coefficients take one
    correction bit each as the band is walked; newly-significant ones
    arrive as (run<<4)|1 symbols whose run counts ZERO-HISTORY
    positions only, with the new value ±(1<<Al) signed by one raw bit;
    ZRL skips 16 zero-history positions (correcting the nonzero ones it
    passes); EOBn hands the REST of this block and the next
    (1<<r)+extra-1 whole blocks over to correction-bits-only
    processing.  ``zz`` is the block's zigzag coefficient view, mutated
    in place; returns the remaining EOB run."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _read_huff(reader, ac_tab)
            r, s = sym >> 4, sym & 0xF
            if s == 0:
                if r != 15:  # EOBn (includes this block)
                    eobrun = (1 << r) + (reader.take(r) if r else 0)
                    break
                newval = 0  # ZRL: 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError(
                        "invalid magnitude in AC refinement scan"
                    )
                newval = p1 if reader.take(1) else m1
            while k <= se:
                if zz[k] != 0:
                    if reader.take(1) and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                zz[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:  # EOB region: correction bits only
            if zz[k] != 0:
                if reader.take(1) and (zz[k] & p1) == 0:
                    zz[k] += p1 if zz[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_planes(
    width: int, height: int, comp_samp, comp_q, qt, scans
):
    """Decode a PROGRESSIVE (SOF2) scan sequence with SPECTRAL
    SELECTION (r14): every scan deposits its band of quantized
    coefficients into per-component buffers — DC scans run the baseline
    DC-difference chain (interleaved over the MCU grid or single-
    component over the non-interleaved grid), AC band scans are
    single-component with the G.1.2.2 EOBRUN coding (EOBn = r<<4 with r
    raw extra bits, ZRL, run/size) — then one shared dequant + IDCT
    reconstructs the planes.  Successive approximation (Ah/Al != 0)
    raises naming the feature; restart intervals reset the DC chain and
    the EOBRUN at segment boundaries, per-MCU for interleaved scans and
    per-block for non-interleaved ones (a non-interleaved MCU IS one
    data unit)."""
    import numpy as np

    ncomp = len(comp_samp)
    hmax = max(s[0] for s in comp_samp)
    vmax = max(s[1] for s in comp_samp)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    coef = [
        np.zeros(
            (mcus_y * comp_samp[c][1], mcus_x * comp_samp[c][0], 64),
            dtype=np.int64,
        )
        for c in range(ncomp)
    ]
    for sc in scans:
        ss, se, ah, al = sc["ss"], sc["se"], sc["ah"], sc["al"]
        segs, ri = sc["segs"], sc["ri"]
        if len(segs) > 1 and not ri:
            raise ValueError("RSTn markers in scan but no DRI segment")
        reader = _BitReader(segs[0])
        seg_i = 0
        unit_i = 0
        if ss == 0:  # DC scan
            if se != 0:
                raise ValueError(
                    "invalid progressive scan: DC band must be Ss=Se=0"
                )
            pred = [0] * ncomp
            if len(sc["comps"]) > 1:  # interleaved: MCU grid
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        if ri and unit_i and unit_i % ri == 0:
                            seg_i += 1
                            if seg_i >= len(segs):
                                raise ValueError(
                                    "missing restart segment in scan"
                                )
                            reader = _BitReader(segs[seg_i])
                            pred = [0] * ncomp
                        unit_i += 1
                        for c, td, _ta in sc["comps"]:
                            h_i, v_i = comp_samp[c]
                            if ah == 0:
                                dc_tab = sc["tabs"].get((0, td))
                                if dc_tab is None:
                                    raise ValueError(
                                        "missing DC Huffman table for scan"
                                    )
                            for vb in range(v_i):
                                for hb in range(h_i):
                                    r0 = my * v_i + vb
                                    c0 = mx * h_i + hb
                                    if ah == 0:  # first pass: diffs << Al
                                        s = _read_huff(reader, dc_tab)
                                        pred[c] += (
                                            _huff_extend(reader.take(s), s)
                                            if s
                                            else 0
                                        )
                                        coef[c][r0, c0, 0] = pred[c] << al
                                    elif reader.take(1):  # refinement bit
                                        coef[c][r0, c0, 0] |= 1 << al
            else:  # single component: non-interleaved block grid
                c, td, _ta = sc["comps"][0]
                dc_tab = None
                if ah == 0:
                    dc_tab = sc["tabs"].get((0, td))
                    if dc_tab is None:
                        raise ValueError("missing DC Huffman table for scan")
                bw, bh = _noninterleaved_blocks(
                    width, height, comp_samp[c], hmax, vmax
                )
                p = 0
                for by in range(bh):
                    for bx in range(bw):
                        if ri and unit_i and unit_i % ri == 0:
                            seg_i += 1
                            if seg_i >= len(segs):
                                raise ValueError(
                                    "missing restart segment in scan"
                                )
                            reader = _BitReader(segs[seg_i])
                            p = 0
                        unit_i += 1
                        if ah == 0:
                            s = _read_huff(reader, dc_tab)
                            p += _huff_extend(reader.take(s), s) if s else 0
                            coef[c][by, bx, 0] = p << al
                        elif reader.take(1):
                            coef[c][by, bx, 0] |= 1 << al
        else:  # AC band scan: single component, EOBRUN coding
            if len(sc["comps"]) != 1:
                raise ValueError(
                    "invalid progressive scan: AC bands must be "
                    "single-component"
                )
            if not 1 <= ss <= se <= 63:
                raise ValueError("invalid progressive spectral band")
            c, _td, ta = sc["comps"][0]
            ac_tab = sc["tabs"].get((1, ta))
            if ac_tab is None:
                raise ValueError("missing AC Huffman table for scan")
            bw, bh = _noninterleaved_blocks(
                width, height, comp_samp[c], hmax, vmax
            )
            eobrun = 0
            for by in range(bh):
                for bx in range(bw):
                    if ri and unit_i and unit_i % ri == 0:
                        seg_i += 1
                        if seg_i >= len(segs):
                            raise ValueError("missing restart segment in scan")
                        reader = _BitReader(segs[seg_i])
                        eobrun = 0
                    unit_i += 1
                    if ah != 0:  # refinement (G.1.2.3 correction bits)
                        eobrun = _ac_refine_block(
                            reader, ac_tab, coef[c][by, bx], ss, se, al, eobrun
                        )
                        continue
                    if eobrun:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        sym = _read_huff(reader, ac_tab)
                        r, s = sym >> 4, sym & 0xF
                        if s == 0:
                            if r == 15:  # ZRL: 16 zeros
                                k += 16
                                continue
                            # EOBn: run of (1<<r)+extra blocks ending
                            eobrun = (1 << r) - 1 + (
                                reader.take(r) if r else 0
                            )
                            break
                        k += r
                        if k > se:
                            raise ValueError("AC coefficient index overflow")
                        coef[c][by, bx, k] = (
                            _huff_extend(reader.take(s), s) << al
                        )
                        k += 1
    # shared reconstruction: dequant (zigzag-space) + IDCT, vectorized
    # over each component's whole block grid
    t = _dct_matrix()
    planes = []
    for c in range(ncomp):
        q = np.array(qt[comp_q[c]], dtype=np.float64)
        bh_, bw_ = coef[c].shape[:2]
        zz = coef[c].reshape(-1, 64).astype(np.float64)
        dez = np.zeros_like(zz)
        dez[:, _ZIGZAG] = zz * q[None, :]
        blocks = np.einsum("ji,njk,kl->nil", t, dez.reshape(-1, 8, 8), t)
        plane = (
            blocks.reshape(bh_, bw_, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh_ * 8, bw_ * 8)
        )
        planes.append(plane + 128.0)
    return planes


