"""Laws for the QM adaptive binary arithmetic coder (r15-landed r16
groundwork — functions/qm_coder.py, no callers yet):

1. EXACT round-trip: decode(encode(bits)) == bits for every mix of
   length, skew, and context allocation — the losslessness law every
   entropy-coding stage of the JPEG arms rests on.
2. Near-entropy compression: the Table D.3 estimator must actually
   ADAPT — a skewed source compresses to within a few percent of its
   Shannon entropy (a frozen state would emit ~1 bit/bit and a broken
   exchange would corrupt long runs outright).
3. Wire marker safety: every 0xFF in the blob is followed by 0x00
   (the stuffing invariant the decoder's end-of-data detection relies
   on), and a trailing marker after the blob is NOT consumed.
4. Table sanity: the embedded Table D.3 transitions stay in range and
   the spec's published head rows are what we ship.
"""

from __future__ import annotations

import math
import random

from big_data_table_spark.functions.qm_coder import (
    QE_TABLE,
    qm_decode_bits,
    qm_encode_bits,
)


def _cases():
    rng = random.Random(7)
    for trial in range(120):
        n = rng.choice([0, 1, 5, 100, 1000, 5000])
        n_ctx = rng.choice([1, 2, 16])
        p = rng.choice([0.5, 0.9, 0.99, 0.01, 0.1])
        bits = [1 if rng.random() < p else 0 for _ in range(n)]
        ctx_ids = [rng.randrange(n_ctx) for _ in range(n)]
        yield trial, n, n_ctx, p, bits, ctx_ids


def test_qm_roundtrip_exact():
    for trial, n, n_ctx, p, bits, ctx_ids in _cases():
        blob = qm_encode_bits(bits, ctx_ids, n_ctx)
        got = qm_decode_bits(blob, ctx_ids, n_ctx)
        assert got == bits, (trial, n, n_ctx, p)


def test_qm_near_entropy():
    rng = random.Random(1)
    n = 200_000
    for p, slack in [(0.5, 1.06), (0.9, 1.06), (0.99, 1.06), (0.999, 1.10)]:
        bits = [1 if rng.random() < p else 0 for _ in range(n)]
        blob = qm_encode_bits(bits, [0] * n, 1)
        bpb = 8 * len(blob) / n
        ent = -(p * math.log2(p) + (1 - p) * math.log2(1 - p))
        assert bpb <= ent * slack + 0.001, (p, bpb, ent)


def test_qm_wire_marker_safety():
    rng = random.Random(3)
    for _ in range(60):
        n = rng.choice([50, 500, 3000])
        p = rng.choice([0.5, 0.95, 0.05])
        bits = [1 if rng.random() < p else 0 for _ in range(n)]
        blob = qm_encode_bits(bits, [0] * n, 1)
        i = 0
        while i < len(blob):
            if blob[i] == 0xFF:
                assert i + 1 < len(blob) and blob[i + 1] == 0x00, blob.hex()
                i += 2
            else:
                i += 1
        # a marker appended after the entropy data terminates the
        # decoder's byte feed instead of corrupting the tail
        got = qm_decode_bits(blob + b"\xff\xd9", [0] * n, 1)
        assert got == bits


def test_qm_int_tree_roundtrip():
    """The Annex-F-shaped signed-integer tree is exact over zeros,
    units, random magnitudes and 2^30-scale extremes, across multiple
    interleaved banks (the DC/AC allocation shape), and a skewed
    stream of small values compresses well below its raw cost."""
    from big_data_table_spark.functions.qm_coder import (
        QmDecoder,
        QmEncoder,
        QmIntBank,
        qm_decode_int,
        qm_encode_int,
    )

    rng = random.Random(11)
    vals, bank_ids = [], []
    extremes = [0, 1, -1, 2, -2, 2**30, -(2**30), 2**31 - 1, -(2**31 - 1)]
    for i in range(4000):
        if i < len(extremes):
            vals.append(extremes[i])
        elif rng.random() < 0.6:
            vals.append(rng.choice([0, 0, 1, -1, 2, -3]))
        else:
            vals.append(rng.randrange(-(2**20), 2**20))
        bank_ids.append(rng.randrange(3))
    enc = QmEncoder()
    ebanks = [QmIntBank() for _ in range(3)]
    for bid, v in zip(bank_ids, vals):
        qm_encode_int(enc, ebanks[bid], v)
    blob = enc.flush()
    dec = QmDecoder(blob)
    dbanks = [QmIntBank() for _ in range(3)]
    got = [qm_decode_int(dec, dbanks[bid]) for bid in bank_ids]
    assert got == vals
    # skewed small-value stream: far below the 4-byte raw cost
    small = [rng.choice([0, 0, 0, 1, -1]) for _ in range(20000)]
    enc2, b2 = QmEncoder(), QmIntBank()
    for v in small:
        qm_encode_int(enc2, b2, v)
    assert len(enc2.flush()) < 20000 // 2


def test_qm_int_bounds_raise_value_error():
    """Out-of-range values and corrupt magnitude categories raise a clean
    ValueError instead of indexing past the bank's 32 contexts (r16
    ADVICE): encode rejects |v| > 2^31 up front; decode bounds the unary
    category loop at the bank size, so a corrupt/garbage stream cannot
    IndexError."""
    import pytest

    from big_data_table_spark.functions.qm_coder import (
        QmDecoder,
        QmEncoder,
        QmIntBank,
        qm_decode_int,
        qm_encode_int,
    )

    enc, bank = QmEncoder(), QmIntBank()
    with pytest.raises(ValueError, match="magnitude bits"):
        qm_encode_int(enc, bank, 2**31 + 1)
    with pytest.raises(ValueError, match="magnitude bits"):
        qm_encode_int(enc, bank, -(2**31 + 1))
    # 2^31 is the largest encodable magnitude (sz = 2^31 - 1, 31 bits)
    enc2, b2 = QmEncoder(), QmIntBank()
    qm_encode_int(enc2, b2, 2**31)
    dec = QmDecoder(enc2.flush())
    assert qm_decode_int(dec, QmIntBank()) == 2**31
    # corrupt stream: hand-build one record whose unary category run
    # never terminates (zero=1, sign=1, then 1 on every cat context).
    # The encode side adapts the same fresh-bank context sequence the
    # decoder will walk, so the decoder reproduces exactly those
    # decisions — and must refuse at the bank edge, not IndexError.
    ones, ob = QmEncoder(), QmIntBank()
    ones.encode(ob.zero, 1)
    ones.encode(ob.sign, 1)
    for c in ob.cat:
        ones.encode(c, 1)
    dec2 = QmDecoder(ones.flush())
    with pytest.raises(ValueError, match="corrupt magnitude"):
        qm_decode_int(dec2, QmIntBank())


def test_qm_table_is_spec_d3():
    assert len(QE_TABLE) == 113
    for qe, nmps, nlps, sw in QE_TABLE:
        assert 0 < qe < 0x8000
        assert 0 <= nmps < 113 and 0 <= nlps < 113 and sw in (0, 1)
    # the published head rows (fast-attack ladder) and terminal state
    assert QE_TABLE[0] == (0x5A1D, 1, 1, 1)
    assert QE_TABLE[1] == (0x2586, 2, 14, 0)
    assert QE_TABLE[14] == (0x5A7F, 15, 15, 1)
    assert QE_TABLE[112] == (0x59EB, 111, 112, 1)
