"""Round-14 pins (hygiene + hardening — VERDICT r13):

1. The r14 driver-window staging invariants (VERDICT #1): _R14_FRONT =
   _R13_NEXT (15, the only entries whose newest driver evidence
   predates round 7) + the 35 stalest r7-window entries; the remaining
   15 r7-stale entries spill to _R14_NEXT.  The evidence claim itself
   is pinned against the committed CORRECTNESS artifacts.
2. The module-budget splits (VERDICT #2): catalog staging moved to
   catalog_windows.py, the theta store family to theta_store.py — both
   with re-export shims so every historical import path still works.
3. All five r13 ADVICE items: the write_store_relation cardinality
   probe runs on ``sized_on`` (not the merged relation — exactly-once
   execution pinned via accumulator); decode_jpeg tolerates 0xFF fill
   bytes before markers (ISO 10918-1 B.1.1.2) and reports sync loss
   with an offset; decode_image parses ONLY the SOF0/IHDR header for
   dims; _swap_store_root touches marker files only; the
   rollup_day_retention store path is per-invocation unique.
4. The reference's ls.str golden-shape law (VERDICT #5,
   tests-02-rscl.R:66-76): exact output line count, affine in the
   resident-dataset count.
5. bench.py's exact co-tenant CPU accounting (VERDICT #3).
"""

from __future__ import annotations

import json
import os
import pathlib
import re

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]


# ------------------------------------------------------------------ #
# 1. driver-window staging
# ------------------------------------------------------------------ #


def test_r14_window_staging():
    """Driver-window staging invariants for round 14 (VERDICT r13 #1):
    the window is EXACTLY as prescribed — _R13_NEXT (15) + the 35
    stalest r7-window entries in catalog order; the remaining 15 spill
    to _R14_NEXT, followed by the one NEW r14 entry (the r12
    precedent: new entries take their driver row next round).  CATALOG
    iteration order leads with the window."""
    from big_data_table_spark import catalog as C

    assert len(C._R14_FRONT) == len(set(C._R14_FRONT)) == 50
    assert C._R14_FRONT[:15] == C._R13_NEXT
    assert len(C._R7_STALE) == len(set(C._R7_STALE)) == 50
    assert C._R14_FRONT[15:] == C._R7_STALE[:35]
    assert C._R14_NEXT == C._R7_STALE[35:] + C._R14_NEW
    assert C._R14_NEW == ["multimodal_jpeg_progressive"]
    assert not set(C._R14_FRONT) & set(C._R14_NEXT)
    assert set(C._R14_FRONT + C._R14_NEXT) <= set(C.CATALOG)
    # (the live-head assert `list(CATALOG)[:50] == _R14_FRONT` migrated
    # to test_round15 — each round's ordering supersedes the last, so
    # only the NEWEST window owns the iteration-order pin)


def test_r14_stale_evidence_claim():
    """The staging rationale, verified against the committed driver
    artifacts: every _R7_STALE name has a green CORRECTNESS_r07 row and
    NO row in any later round (r8-r13) — they really are the stalest
    evidence; and _R13_NEXT ∪ _R7_STALE is exactly the set of entries
    whose newest driver row predates round 8."""
    from big_data_table_spark import catalog as C

    def rows(r):
        return json.loads((REPO / f"CORRECTNESS_r{r:02d}.json").read_text())

    later = set()
    for r in range(8, 14):
        later |= set(rows(r))
    r7 = rows(7)
    assert set(C._R7_STALE) == set(r7) - later
    for name in C._R7_STALE:
        assert r7[name]["hash_match"] or r7[name]["rows_match"], name
    # _R13_NEXT is the pre-r7 tail: present in r6, absent from r7+
    r6_later = later | set(r7)
    assert set(C._R13_NEXT) == set(rows(6)) - r6_later


# ------------------------------------------------------------------ #
# 2. module-budget splits keep their import paths
# ------------------------------------------------------------------ #


def test_theta_store_split_reexports():
    """The theta family moved to theta_store.py; sketches.py re-exports
    every verb (the mg_store shim precedent), and the two modules
    resolve identically regardless of import order (theta_store imports
    its sketch kernels inside functions, never at module top)."""
    import big_data_table_spark.functions.sketches as S
    import big_data_table_spark.functions.theta_store as T

    for name in (
        "theta_rollup_build",
        "theta_rollup_append_day",
        "theta_rollup_compact",
        "theta_rollup_compact_all",
        "theta_rollup_range_estimate",
        "theta_rollup_range_sql",
        "theta_rollup_grouped_build",
        "theta_rollup_grouped_range_estimate",
        "theta_rollup_grouped_range_sql",
    ):
        assert getattr(S, name) is getattr(T, name), name
    assert not re.search(
        r"^from \.sketches import|^import .*sketches",
        pathlib.Path(T.__file__).read_text(),
        re.M,
    ), "theta_store must not import sketches at module top (circularity)"


def test_catalog_windows_split_reexports():
    """The round-12+ staging lists moved to catalog_windows.py;
    catalog.py re-exports every _R* name so the law tests' historical
    import path holds."""
    from big_data_table_spark import catalog as C
    from big_data_table_spark import catalog_windows as W

    for name in ("_R5_STALE", "_R6_STALE", "_R7_STALE", "_R12_FRONT",
                 "_R13_FRONT", "_R13_NEXT", "_R14_FRONT", "_R14_NEXT"):
        assert getattr(C, name) == getattr(W, name), name


# ------------------------------------------------------------------ #
# 3. r13 ADVICE items
# ------------------------------------------------------------------ #


def test_store_relation_probe_runs_on_sized_on(spark, tmp_path):
    """r13 ADVICE (medium): the low-cardinality probe must run on the
    raw store read (``sized_on``), not the post-aggregate ``df`` —
    probing df re-ran the whole merge as an extra shuffle job per
    rewrite.  Pinned exactly-once: an accumulator inside df counts how
    many rows df's pipeline processes; the single write job accounts
    for all of them, so a probe over df would double the count."""
    from big_data_table_spark.functions.store_layout import write_store_relation

    raw_path = str(tmp_path / "raw")
    spark.range(200).selectExpr("id % 8 AS k", "id AS v").write.parquet(raw_path)
    raw = spark.read.parquet(raw_path)
    acc = spark.sparkContext.accumulator(0)

    def kernel(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    merged = raw.mapInPandas(kernel, "k bigint, v bigint")
    # target_file_bytes=1 forces n > 1, so the probe MUST run
    write_store_relation(
        merged, str(tmp_path / "dest"), "k", sized_on=raw, target_file_bytes=1
    )
    assert acc.value == 200, (
        "df executed more than once: the cardinality probe ran on the "
        "merged relation instead of sized_on"
    )
    # and the fallback law still holds: 8 distinct single-key values
    # cap the file count at 8
    files = [
        f for f in os.listdir(tmp_path / "dest") if f.endswith(".parquet")
    ]
    assert 1 <= len(files) <= 8


def test_jpeg_fill_bytes_tolerated():
    """r13 ADVICE: ISO 10918-1 B.1.1.2 allows any number of 0xFF fill
    bytes before a marker; conforming third-party baseline JPEGs use
    them.  Padded streams must decode BIT-IDENTICALLY; dims-only
    parsing must tolerate them too; and true sync loss must name the
    offset instead of 'missing SOF0 or SOS'."""
    from big_data_table_spark.functions.multimodal import (
        _jpeg_dims,
        decode_jpeg,
        encode_jpeg,
    )

    rgb = bytes((i * 7 + 13 * (i % 3)) % 256 for i in range(16 * 16 * 3))
    blob = encode_jpeg(16, 16, rgb)
    base = decode_jpeg(blob)
    for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        i = blob.index(marker)
        padded = blob[:i] + b"\xff" * 3 + blob[i:]
        assert decode_jpeg(padded) == base, marker
        assert _jpeg_dims(padded) == (16, 16, 3), marker
    bad = blob[:2] + b"\x00" + blob[3:]
    with pytest.raises(ValueError, match="marker sync lost at offset 2"):
        decode_jpeg(bad)
    with pytest.raises(ValueError, match="marker sync lost at offset 2"):
        _jpeg_dims(bad)


def test_decode_image_parses_header_only():
    """r13 ADVICE: decode_image must not pay the full entropy decode +
    IDCT for (width, height, mode).  Proof by truncation: a JPEG cut
    BEFORE its SOS (no scan data at all) still yields dims, while the
    pixel decoder rightly refuses it; a PNG cut after IHDR likewise.
    The support gates stay aligned with the pixel decoders."""
    from big_data_table_spark.functions.multimodal import (
        decode_image,
        decode_jpeg,
        decode_png,
        encode_jpeg,
        encode_png,
    )

    blob = encode_jpeg(16, 8, bytes(16 * 8 * 3))
    assert decode_image(blob) == (16, 8, "RGB")
    cut = blob.index(b"\xff\xda")
    assert decode_image(blob[:cut]) == (16, 8, "RGB")
    with pytest.raises(ValueError):
        decode_jpeg(blob[:cut])

    png = encode_png(5, 4, bytes(5 * 4 * 3))
    assert decode_image(png) == (5, 4, "RGB")
    assert decode_image(png[:33]) == (5, 4, "RGB")  # signature + IHDR only
    with pytest.raises(ValueError):
        decode_png(png[:33])

    # gates match the pixel decoders: a lossless (SOF3) frame and a
    # corrupted IHDR CRC raise from the header parse itself (SOF2
    # progressive became a SUPPORTED frame type in r14)
    lossless = blob.replace(b"\xff\xc0", b"\xff\xc3", 1)
    with pytest.raises(ValueError, match="baseline"):
        decode_image(lossless)
    bad_png = png[:29] + b"\x00\x00\x00\x00" + png[33:]
    with pytest.raises(ValueError, match="CRC"):
        decode_image(bad_png)


def test_swap_store_root_marker_files_only(tmp_path):
    """r13 ADVICE: the root-swap copy and re-merge loops must touch
    MARKER files only (dot-prefixed, not .tmp/.lock) — a future
    non-marker root-level file (_SUCCESS, a JSON sidecar) must not be
    pushed through monotone-marker write semantics."""
    from big_data_table_spark.functions import store_layout as SL

    root = tmp_path / "store"
    (root / "sub").mkdir(parents=True)
    (root / "sub" / "part-0.parquet").write_text("old")
    (root / ".retention").write_text("7")
    (root / "meta.json").write_text('{"v": 1}')
    (root / "_SUCCESS").write_text("")
    tmp_root = SL._stage_store_root(str(root))
    os.makedirs(os.path.join(tmp_root, "sub"))
    pathlib.Path(tmp_root, "sub", "part-0.parquet").write_text("new")
    SL._swap_store_root(tmp_root, str(root))
    assert (root / ".retention").read_text() == "7"  # marker carried
    assert (root / "sub" / "part-0.parquet").read_text() == "new"
    # non-marker files follow replace-the-root semantics: NOT re-merged
    assert not (root / "meta.json").exists()
    assert not (root / "_SUCCESS").exists()
    assert SL._is_marker_file(".retention")
    assert SL._is_marker_file(".compact_watermark.2024-01-05")
    assert not SL._is_marker_file("meta.json")
    assert not SL._is_marker_file(".retention.tmp")
    assert not SL._is_marker_file(".retention.lock")


def test_rollup_day_retention_store_path_unique(spark, sf_dir, monkeypatch):
    """r13 ADVICE: the lifecycle entry's mutable store path carries a
    per-invocation unique suffix, so two concurrent executions in one
    application cannot rmtree each other's store mid-append."""
    import uuid as uuid_mod

    from big_data_table_spark.catalog_r13 import rollup_day_retention_q

    seen = []
    real = uuid_mod.uuid4

    def tracking():
        u = real()
        seen.append(u.hex[:8])
        return u

    monkeypatch.setattr(uuid_mod, "uuid4", tracking)
    df = rollup_day_retention_q(spark, sf_dir)
    assert seen, "store path took no per-invocation unique suffix"
    assert df.count() > 0
    assert df.filter("NOT replay_blocked").count() == 0


def test_png_adam7_interlacing():
    """r14 depth: ADAM7 interlaced PNG, both codec sides — the
    progressive-render layout real-world web PNGs use.  Laws: (1) PNG
    is lossless, so the interlaced encoding decodes IDENTICALLY to the
    sequential one across sizes that exercise empty passes (1x1 has
    six empty passes) and partial passes; (2) each pass is its own
    filter group (the 5-type cycle restarts per pass — covered by
    filter_seed variation); (3) header-only dims accept interlaced
    blobs; (4) a corrupt interlace method still raises."""
    from big_data_table_spark.functions.multimodal import (
        decode_image,
        decode_png,
        encode_png,
    )

    for w, h in [(1, 1), (2, 2), (3, 2), (5, 4), (8, 8), (9, 5), (16, 9)]:
        px = bytes((i * 7 + 13) % 256 for i in range(3 * w * h))
        for seed in (0, 3):
            blob = encode_png(w, h, px, filter_seed=seed, interlace=True)
            assert decode_png(blob) == (w, h, px), (w, h, seed)
    blob = encode_png(16, 9, bytes(16 * 9 * 3), interlace=True)
    assert blob[28] == 1  # IHDR interlace byte really set
    assert decode_image(blob) == (16, 9, "RGB")  # header-only parse
    bad = bytearray(encode_png(4, 4, bytes(48)))
    bad[28] = 2  # unknown interlace method
    import struct
    import zlib

    (l,) = struct.unpack(">I", bytes(bad[8:12]))
    crc = zlib.crc32(bytes(bad[12 : 16 + l])) & 0xFFFFFFFF
    bad[16 + l : 20 + l] = struct.pack(">I", crc)  # re-CRC the IHDR
    with pytest.raises(ValueError, match="interlace method"):
        decode_png(bytes(bad))


def test_jpeg_progressive_arm():
    """r14 depth (VERDICT #6's named candidate): PROGRESSIVE (SOF2)
    JPEG, both codec sides — spectral selection AND successive
    approximation (the two dimensions libjpeg's default progressive
    script combines).  The load-bearing law: progressive quantizes
    IDENTICALLY to baseline, so whenever the scan script's bands cover
    1..63 completely, the progressive stream must decode
    BIT-IDENTICALLY to the baseline encoding of the same image —
    across band splits, refinement rounds, grayscale, restart
    intervals, and odd (padded/cropped) dims.  Partial coverage
    decodes as the legal low-frequency preview (different pixels, no
    error)."""
    import numpy as np

    from big_data_table_spark.functions.multimodal import (
        _jpeg_dims,
        decode_image,
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    x, y = np.arange(24), np.arange(16)
    img = np.stack(
        [
            (x[None, :] * 3 + y[:, None] * 2) % 256,
            np.broadcast_to((x[None, :] * 5 + 40) % 256, (16, 24)),
            np.broadcast_to((y[:, None] * 7 + 90) % 256, (16, 24)),
        ],
        -1,
    ).astype(np.uint8)
    rgb = img.tobytes()
    base = decode_jpeg(encode_jpeg(24, 16, rgb))

    # bit-identity across scan scripts
    prog = encode_jpeg_progressive(24, 16, rgb)
    assert decode_jpeg(prog) == base
    assert decode_jpeg(encode_jpeg_progressive(24, 16, rgb, bands=((1, 63),))) == base
    assert (
        decode_jpeg(
            encode_jpeg_progressive(
                24, 16, rgb, bands=((1, 1), (2, 9), (10, 62), (63, 63))
            )
        )
        == base
    )
    # grayscale progressive == grayscale baseline
    g = bytes(b for px in range(24 * 16) for b in ((px * 3) % 256,) * 3)
    assert decode_jpeg(encode_jpeg_progressive(24, 16, g, grayscale=True)) == (
        decode_jpeg(encode_jpeg(24, 16, g, grayscale=True))
    )
    # restart intervals: DRI emitted, EOBRUN flushed at every RST,
    # decode bit-identical
    rst = encode_jpeg_progressive(24, 16, rgb, restart_interval=2)
    assert b"\xff\xdd" in rst and decode_jpeg(rst) == base
    # odd dims pad and crop like baseline
    odd = bytes(21 * 13 * 3)
    assert decode_jpeg(encode_jpeg_progressive(21, 13, odd)) == decode_jpeg(
        encode_jpeg(21, 13, odd)
    )
    # header-only dims + fill-byte tolerance hold for SOF2 streams
    assert _jpeg_dims(prog) == (24, 16, 3)
    assert decode_image(prog) == (24, 16, "RGB")
    i = prog.index(b"\xff\xc2")
    assert decode_jpeg(prog[:i] + b"\xff" * 2 + prog[i:]) == base

    # PARTIAL coverage is the legal low-frequency preview: decodes
    # cleanly, differs from the full reconstruction (checkerboard —
    # high-frequency energy lives ABOVE the preview band; the smooth
    # gradient would be identical because its tail quantizes to zero)
    check = bytes(
        b
        for yy in range(16)
        for xx in range(24)
        for b in ((255 if (xx + yy) % 2 else 0),) * 3
    )
    full = decode_jpeg(encode_jpeg_progressive(24, 16, check))
    assert full == decode_jpeg(encode_jpeg(24, 16, check))
    preview = decode_jpeg(encode_jpeg_progressive(24, 16, check, bands=((1, 5),)))
    assert preview[:2] == (24, 16) and preview[2] != full[2]

    # SUCCESSIVE APPROXIMATION: first passes at Al=1, then the per-bit
    # DC raw-bit and AC correction-bit refinement round — still
    # bit-identical to baseline, across content shapes that exercise
    # the newly-significant / history-correction / ZRL / EOB-run arms
    rng_img = np.stack(
        [(x[None, :] * 71 + y[:, None] * 137 + c * 53) % 256 for c in range(3)],
        -1,
    ).astype(np.uint8)
    for content in (rgb, check, rng_img.tobytes()):
        sa = encode_jpeg_progressive(24, 16, content, successive=True)
        assert decode_jpeg(sa) == decode_jpeg(encode_jpeg(24, 16, content))
    assert decode_jpeg(
        encode_jpeg_progressive(24, 16, g, grayscale=True, successive=True)
    ) == decode_jpeg(encode_jpeg(24, 16, g, grayscale=True))
    assert decode_jpeg(
        encode_jpeg_progressive(24, 16, rgb, successive=True, restart_interval=2)
    ) == base

    # gates: malformed DC band named; overlapping bands rejected
    flipped = bytearray(encode_jpeg(24, 16, rgb))
    flipped[flipped.index(b"\xff\xc0") + 1] = 0xC2  # baseline scan under SOF2
    with pytest.raises(ValueError, match="DC band"):
        decode_jpeg(bytes(flipped))
    with pytest.raises(ValueError, match="invalid spectral bands"):
        encode_jpeg_progressive(24, 16, rgb, bands=((1, 10), (5, 63)))


def test_jpeg_422_arm():
    """r14 depth: the 4:2:2 sampling grid (Y 2x1, chroma halved
    horizontally — the digital-video/scanner grid).  Laws mirror the
    r13 4:2:0 pins: (1) MCU-constant even gray round-trips EXACTLY
    (one 16x8 MCU of constant gray is DC-only in every plane); (2) a
    colored gradient holds the subsampled-chroma tolerance and
    compresses smaller than 4:4:4; (3) odd widths pad and crop
    correctly (chroma pair straddles the crop edge); (4) restarted
    streams decode bit-identically; (5) header dims parse."""
    import numpy as np

    from big_data_table_spark.functions.multimodal import (
        _jpeg_dims,
        decode_jpeg,
        encode_jpeg,
    )

    # (1) exact on MCU-constant even gray (MCU = 16x8)
    vals = np.array([[2 * ((7 + 13 * mx + 31 * my) % 128) for mx in range(2)]
                     for my in range(2)])
    gray = np.repeat(np.repeat(vals, 8, axis=0), 16, axis=1).astype(np.uint8)
    rgb = np.stack([gray] * 3, -1).tobytes()
    blob = encode_jpeg(32, 16, rgb, subsample="422")
    assert decode_jpeg(blob) == (32, 16, rgb)
    # (2) gradient tolerance + fewer bits than 4:4:4
    x, y = np.arange(32), np.arange(16)
    img = np.stack(
        [
            (x[None, :] * 3 + y[:, None] * 2) % 256,
            np.broadcast_to((x[None, :] * 5 + 40) % 256, (16, 32)),
            np.broadcast_to((y[:, None] * 7 + 90) % 256, (16, 32)),
        ],
        -1,
    ).astype(np.uint8)
    b422 = encode_jpeg(32, 16, img.tobytes(), subsample="422")
    _, _, out = decode_jpeg(b422)
    dec = np.frombuffer(out, np.uint8).reshape(16, 32, 3).astype(int)
    assert np.abs(dec - img.astype(int)).max() <= 40  # the 4:2:0 budget
    assert len(b422) < len(encode_jpeg(32, 16, img.tobytes()))
    # (3) odd width pads and crops
    w2, h2, out = decode_jpeg(encode_jpeg(21, 13, bytes(21 * 13 * 3), subsample="422"))
    assert (w2, h2) == (21, 13) and out == bytes(21 * 13 * 3)
    # (4) restart intervals bit-identical
    assert decode_jpeg(
        encode_jpeg(32, 16, img.tobytes(), subsample="422", restart_interval=1)
    ) == decode_jpeg(b422)
    # (5) header-only dims see the 4:2:2 grid as 3-component
    assert _jpeg_dims(b422) == (32, 16, 3)
    with pytest.raises(ValueError, match="unsupported subsampling"):
        encode_jpeg(32, 16, img.tobytes(), subsample="411")


def test_jpeg_grayscale_arm():
    """r14 depth: the 1-COMPONENT (grayscale) baseline arm — the frame
    shape real-world encoders emit for mode-L sources.  Laws: (1)
    block-constant EVEN gray round-trips EXACTLY (the r13 DC-only
    argument, now without chroma slots at all); (2) the grayscale blob
    is smaller than the color encoding of the same gray image (no
    chroma tables, no chroma MCU slots); (3) a gradient holds the
    same tolerance budget as 4:4:4; (4) restarted streams decode
    bit-identically; (5) decode_image reports mode 'L' from the header
    alone; (6) grayscale+subsample raises."""
    from big_data_table_spark.functions.multimodal import (
        _jpeg_dims,
        decode_image,
        decode_jpeg,
        encode_jpeg,
    )

    # (1) exact round-trip on block-constant even gray
    vals = [2 * ((3 + 13 * bx + 31 * by) % 128) for by in range(2) for bx in range(3)]
    gray = bytearray()
    for by in range(2):
        for row in range(8):
            for bx in range(3):
                gray.extend([vals[by * 3 + bx]] * 8)
    rgb = bytes(b for px in gray for b in (px, px, px))
    blob = encode_jpeg(24, 16, rgb, grayscale=True)
    w, h, out = decode_jpeg(blob)
    assert (w, h) == (24, 16)
    assert out == rgb  # exact: DC-only, even gray, Q_Y[0,0]=16
    # (2) strictly smaller than the color encoding of the same image
    assert len(blob) < len(encode_jpeg(24, 16, rgb))
    # (3) smooth gradient within the 4:4:4 tolerance budget (the r13
    # pin's slope — steep enough for real AC energy, no 255->0 wraps
    # inside a block)
    grad = bytes(
        b
        for y in range(16)
        for x in range(24)
        for b in ((x * 3 + y * 2) % 256,) * 3
    )
    _, _, dec = decode_jpeg(encode_jpeg(24, 16, grad, grayscale=True))
    err = max(abs(a - b) for a, b in zip(dec, grad))
    assert err <= 20, err
    # (4) restart intervals: bit-identical to the restartless decode
    rst = encode_jpeg(24, 16, grad, grayscale=True, restart_interval=2)
    assert decode_jpeg(rst) == decode_jpeg(encode_jpeg(24, 16, grad, grayscale=True))
    assert b"\xff\xdd" in rst
    # (5) header-only mode detection
    assert _jpeg_dims(blob) == (24, 16, 1)
    assert decode_image(blob) == (24, 16, "L")
    assert decode_image(blob[: blob.index(b"\xff\xda")]) == (24, 16, "L")
    # (6) no chroma to subsample
    with pytest.raises(ValueError, match="no chroma"):
        encode_jpeg(24, 16, rgb, grayscale=True, subsample=True)


# ------------------------------------------------------------------ #
# 4. ls.str golden shape (reference tests-02-rscl.R:66-76)
# ------------------------------------------------------------------ #


def test_ls_str_print_golden_shape(spark, sf_dir):
    """The reference pins the EXACT ls.str output line count and its
    affine growth in the resident-dataset count (28 lines with one
    dataset per node, 52 after a second — a fixed-size block per
    dataset).  The Spark analogue: 1 header + 1 line per dataset,
    sorted, exact format; +1 line per registered view, restored on
    drop."""
    from big_data_table_spark.catalog import register_views
    from big_data_table_spark.sources.readers import ls_str_print, ls_tables

    register_views(spark, sf_dir)
    out = ls_str_print(spark)
    lines = out.splitlines()
    assert len(lines) == 1 + len(ls_tables(spark))  # the exact count law
    assert re.fullmatch(r"# Spark session \S+ ----", lines[0])
    for line in lines[1:]:
        assert re.fullmatch(r"[A-Za-z0-9_]+ : struct<.+>", line), line
    assert lines[1:] == sorted(lines[1:])
    n0 = len(lines)
    spark.range(3).createOrReplaceTempView("r14_ls_str_probe")
    try:
        assert len(ls_str_print(spark).splitlines()) == n0 + 1
        assert "r14_ls_str_probe : struct<id:bigint>" in ls_str_print(spark)
    finally:
        spark.catalog.dropTempView("r14_ls_str_probe")
    assert len(ls_str_print(spark).splitlines()) == n0


# ------------------------------------------------------------------ #
# 5. bench co-tenant CPU accounting
# ------------------------------------------------------------------ #


def test_bench_cotenant_cpu_accounting():
    """The artifact-grain re-run check separates co-tenant CPU from the
    bench's own: a CPU burn in OUR process tree must show up in the
    tree meter (so it is NOT counted as co-tenant load)."""
    import subprocess
    import sys as _sys

    import bench

    h0, t0 = bench._host_cpu_busy_sec(), bench._tree_cpu_sec()
    assert h0 is not None and t0 is not None
    subprocess.run(
        [_sys.executable, "-c", "x=0\nfor i in range(20_000_000): x+=i"],
        check=True,
    )
    h1, t1 = bench._host_cpu_busy_sec(), bench._tree_cpu_sec()
    tree_delta, host_delta = t1 - t0, h1 - h0
    assert tree_delta > 0.5, "child burn must land in the tree meter"
    assert host_delta >= tree_delta - 0.2, "tree can never exceed host"
