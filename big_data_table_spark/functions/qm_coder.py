"""Adaptive binary arithmetic (QM) coder — r16 groundwork for
arithmetic-coded JPEG (SOF9/SOF10), landed late in r15 as a leaf
module with its own law tests and no callers yet.

The CORE is ITU-T T.81 Annex D: a 16-bit probability interval ``A``
renormalized into ``[0x8000, 0x10000)``, the more-probable symbol's
sub-interval at the BOTTOM of the range with CONDITIONAL EXCHANGE when
the estimate ``Qe`` exceeds the MPS share, and probability adaptation
on renormalization through the standard's published 113-state table
(Table D.3: ``Qe``, next-state-on-MPS, next-state-on-LPS, MPS-switch
flag — the same table JBIG and every arithmetic-JPEG codec carries;
head rows 0x5A1D/0x2586/0x1114/... are the spec's fast-attack ladder).

WIRE FRAMING DEVIATES from Annex D on purpose and says so: T.81
resolves encoder carries with a bit-stuffing protocol whose
interaction with carry-created 0xFF bytes is easy to get subtly wrong;
this module instead resolves carries through a cache byte plus a
pending-0xFF run (the classic range-coder scheme — a carry increments
the cache and turns the pending run into 0x00s), and gets marker
safety from JPEG's Huffman-layer convention: every 0xFF data byte is
followed by a stuffed 0x00, stripped symmetrically by the decoder, so
no marker can be emulated inside entropy data.  The laws in
tests/test_qm_coder.py pin exact round-trip, near-entropy compression,
and the no-bare-0xFF wire invariant.  When r16 integrates SOF9, the
frame layer is the one seam to revisit for third-party-stream parity.

Reference parity note: the reference (jangorecki/big.data.table,
R/big.data.table.R:1-648) has no media surface — this is declared
extension surface for the 100 TB training-data pipeline's multimodal
arm (functions/multimodal.py, functions/jpeg_codec.py).
"""

from __future__ import annotations

# ITU-T T.81 Table D.3 — (Qe, NMPS, NLPS, SWITCH) per state index.
QE_TABLE: tuple[tuple[int, int, int, int], ...] = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0), (0x080B, 4, 18, 0),
    (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0), (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0),
    (0x0036, 9, 30, 0), (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1), (0x3F25, 16, 36, 0),
    (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0), (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0),
    (0x0CEF, 21, 43, 0), (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0), (0x01B1, 28, 54, 0),
    (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0), (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0),
    (0x0068, 33, 62, 0), (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0), (0x2EF1, 40, 67, 0),
    (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0), (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0),
    (0x1177, 45, 73, 0), (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0), (0x04DE, 52, 50, 0),
    (0x040F, 53, 50, 0), (0x0363, 54, 51, 0), (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0),
    (0x01F8, 57, 54, 0), (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0), (0x008F, 32, 61, 0),
    (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0), (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0),
    (0x2FE8, 69, 83, 0), (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0), (0x119C, 76, 74, 0),
    (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0), (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0),
    (0x5832, 81, 80, 1), (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0), (0x2516, 71, 86, 0),
    (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0), (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0),
    (0x3824, 93, 99, 0), (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0), (0x3C3D, 100, 104, 0),
    (0x375E, 93, 99, 0), (0x5231, 102, 105, 0), (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0),
    (0x415E, 99, 103, 0), (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1), (0x5522, 109, 112, 0),
    (0x59EB, 111, 112, 1),
)
assert len(QE_TABLE) == 113


class QmContext:
    """One adaptive probability context: a Table D.3 state index plus
    the current more-probable-symbol value.  JPEG's statistical models
    allocate many of these (per DC magnitude category, per AC band);
    the coder itself is agnostic — callers pass whichever context the
    model selects for each binary decision."""

    __slots__ = ("idx", "mps")

    def __init__(self) -> None:
        self.idx = 0
        self.mps = 0


class QmEncoder:
    """Annex D interval arithmetic with range-coder carry resolution
    (module docstring).  ``encode(ctx, bit)`` per decision;
    ``flush()`` -> the byte-stuffed wire blob."""

    def __init__(self) -> None:
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self._raw = bytearray()  # carry-resolved bytes, pre-stuffing
        self._cache: int | None = None  # last byte still open to a carry
        self._ffrun = 0          # pending 0xFF bytes after the cache

    def _byteout(self) -> None:
        t = self.c >> 19
        self.c &= 0x7FFFF
        if t > 0xFF:             # carry: bump cache, pending FFs -> 00
            self._raw.append(self._cache + 1)
            self._raw.extend(b"\x00" * self._ffrun)
            self._ffrun = 0
            self._cache = t & 0xFF
        elif t == 0xFF:
            self._ffrun += 1     # hold: a later carry may consume it
        else:
            if self._cache is not None:
                self._raw.append(self._cache)
            self._raw.extend(b"\xff" * self._ffrun)
            self._ffrun = 0
            self._cache = t
        self.ct = 8

    def _renorm(self) -> None:
        while True:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def encode(self, ctx: QmContext, bit: int) -> None:
        qe, nmps, nlps, sw = QE_TABLE[ctx.idx]
        self.a -= qe
        if bit == ctx.mps:
            if self.a & 0x8000:
                return           # MPS without renormalization: no adapt
            if self.a < qe:      # conditional exchange
                self.c += self.a
                self.a = qe
            ctx.idx = nmps
        else:
            if self.a >= qe:     # no exchange: LPS takes the top part
                self.c += self.a
                self.a = qe
            if sw:
                ctx.mps ^= 1
            ctx.idx = nlps
        self._renorm()

    def flush(self) -> bytes:
        # CLEARBITS (Annex D): the value in [C, C+A) with the most
        # trailing zero bits, so the tail compresses to nothing
        t = (self.c + self.a - 1) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        self._byteout()
        self.c <<= 8
        self._byteout()
        if self._cache is not None:
            self._raw.append(self._cache)
        self._raw.extend(b"\xff" * self._ffrun)
        out = bytearray()        # marker safety: 0xFF -> 0xFF 0x00
        for b in self._raw:
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        return bytes(out)


class QmDecoder:
    """Mirror of :class:`QmEncoder`: strips the byte stuffing (a bare
    0xFF — i.e. followed by anything but 0x00 — ends the entropy data,
    exactly the Huffman scan convention), then runs the same interval
    arithmetic in reverse.  Reading past the end feeds zero bytes, the
    counterpart of the encoder's trailing-zero-optimal CLEARBITS."""

    def __init__(self, data: bytes) -> None:
        self._raw = self._unstuff(data)
        self._bp = 0
        b0 = self._next()
        b1 = self._next()
        self.c = (b0 << 24) | (b1 << 16)
        self.ct = 0
        self.a = 0x10000

    @staticmethod
    def _unstuff(data: bytes) -> bytes:
        raw = bytearray()
        i = 0
        while i < len(data):
            b = data[i]
            raw.append(b)
            i += 1
            if b == 0xFF:
                if i < len(data) and data[i] == 0x00:
                    i += 1       # stuffed zero after a data 0xFF
                else:
                    raw.pop()    # marker byte: end of entropy data
                    break
        return bytes(raw)

    def _next(self) -> int:
        if self._bp < len(self._raw):
            v = self._raw[self._bp]
            self._bp += 1
            return v
        return 0

    def _renorm(self) -> None:
        while True:
            if self.ct == 0:
                self.c += self._next() << 8
                self.ct = 8
            self.a <<= 1
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break

    def decode(self, ctx: QmContext) -> int:
        qe, nmps, nlps, sw = QE_TABLE[ctx.idx]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < self.a:
            if self.a & 0x8000:
                return ctx.mps   # MPS without renormalization
            if self.a < qe:      # conditional exchange: this was LPS
                bit = ctx.mps ^ 1
                if sw:
                    ctx.mps ^= 1
                ctx.idx = nlps
            else:
                bit = ctx.mps
                ctx.idx = nmps
        else:
            self.c -= self.a << 16
            if self.a < qe:      # exchange: the top region is MPS
                bit = ctx.mps
                ctx.idx = nmps
            else:
                bit = ctx.mps ^ 1
                if sw:
                    ctx.mps ^= 1
                ctx.idx = nlps
            self.a = qe
        self._renorm()
        return bit


def qm_encode_bits(bits: list[int], ctx_ids: list[int], n_ctx: int) -> bytes:
    """Convenience pair for tests and future integration: encode a
    decision sequence under per-decision context selection."""
    enc = QmEncoder()
    ctxs = [QmContext() for _ in range(n_ctx)]
    for cid, bit in zip(ctx_ids, bits):
        enc.encode(ctxs[cid], bit)
    return enc.flush()


def qm_decode_bits(blob: bytes, ctx_ids: list[int], n_ctx: int) -> list[int]:
    dec = QmDecoder(blob)
    ctxs = [QmContext() for _ in range(n_ctx)]
    return [dec.decode(ctxs[cid]) for cid in ctx_ids]


class QmIntBank:
    """Context bank for one signed-integer coding site, shaped like
    T.81 Annex F.1.4's decision tree (the structure the DC-difference
    and AC-coefficient models share): a zero/nonzero context, a sign
    context, one context per magnitude-category decision ("is the
    magnitude's bit length > k"), and one per mantissa-bit position.
    JPEG's full models allocate MANY banks (per DC classification
    band, per AC coefficient index) — that allocation is the r16
    integration; the tree below is the per-site machinery."""

    __slots__ = ("zero", "sign", "cat", "mant")

    def __init__(self, max_bits: int = 32) -> None:
        self.zero = QmContext()
        self.sign = QmContext()
        self.cat = [QmContext() for _ in range(max_bits)]
        self.mant = [QmContext() for _ in range(max_bits)]


def qm_encode_int(enc: QmEncoder, bank: QmIntBank, v: int) -> None:
    """Code a signed integer through ``bank``'s adaptive tree: the
    nonzero decision, the sign, then Sz = |v| - 1 as a unary-coded
    magnitude category (Annex F's X-decisions: one adaptive bit per
    doubling) followed by Sz's remaining mantissa bits, each in a
    per-position adaptive context."""
    enc.encode(bank.zero, 1 if v else 0)
    if not v:
        return
    enc.encode(bank.sign, 1 if v < 0 else 0)
    sz = abs(v) - 1
    nbits = sz.bit_length()
    if nbits >= len(bank.cat):
        raise ValueError(
            f"qm_encode_int: |v|={abs(v)} needs {nbits} magnitude bits, "
            f"bank holds {len(bank.cat)} category contexts"
        )
    for k in range(nbits):
        enc.encode(bank.cat[k], 1)       # bit length > k
    enc.encode(bank.cat[nbits], 0)       # category terminator
    for k in range(nbits - 2, -1, -1):   # mantissa below the top bit
        enc.encode(bank.mant[k], (sz >> k) & 1)


def qm_decode_int(dec: QmDecoder, bank: QmIntBank) -> int:
    if not dec.decode(bank.zero):
        return 0
    neg = dec.decode(bank.sign)
    nbits = 0
    max_bits = len(bank.cat)
    while dec.decode(bank.cat[nbits]):
        nbits += 1
        if nbits >= max_bits:
            raise ValueError(
                "qm_decode_int: corrupt magnitude category (unary run "
                f"exceeds the bank's {max_bits} contexts)"
            )
    sz = 0 if nbits == 0 else 1 << (nbits - 1)
    for k in range(nbits - 2, -1, -1):
        sz |= dec.decode(bank.mant[k]) << k
    v = sz + 1
    return -v if neg else v
