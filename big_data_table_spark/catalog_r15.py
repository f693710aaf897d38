"""Round-15 catalog builders — PNG COLOR TYPES beyond RGB8.

r14 completed the JPEG frame-type surface (baseline grids + progressive
SOF2 both script dimensions); r15 completes the PNG color-type surface
the same way: all five 8-bit layouts of spec §11.2.2 — 0 grayscale,
2 RGB, 3 palette-indexed (PLTE), 4 gray+alpha, 6 RGBA — on BOTH codec
sides, in BOTH interlace modes (the Adam7 scatter and the five scanline
filters now run at every pixel width).  PNG is lossless, so the
load-bearing law is exact round-trip of the RAW samples per color type
(alpha preserved, palette indices preserved — pinned in
tests/test_round15.py); the catalog entry proves the RGB VIEW of the
whole chain against a closed-form SQL oracle.

QuerySpec registrations live HERE (``r15_specs``, merged by
catalog_windows.py — the chunk convention).

Reference parity note: the reference (jangorecki/big.data.table,
R/big.data.table.R:1-648) has no media surface — this is declared
extension surface for the 100 TB training-data pipeline, held to the
same oracle-paired correctness bar as the forwarded reference surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog_base import register_views
from .sources.readers import Tables


def multimodal_png_color_types_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All five 8-bit PNG color types end-to-end (r15 — VERDICT r14
    #6's named depth candidate): synthetic PNGs cycling grayscale /
    RGB / palette / gray+alpha / RGBA across the corpus, odd ids Adam7
    interlaced, every filter type seeded in — decoded back through the
    real inflate + per-bpp unfilter + PLTE dereference + alpha-drop
    RGB view.  The closed-form pixel model makes every arm exact: a
    wrong left-neighbor distance in the Sub/Paeth filters, a dropped
    PLTE byte, a mis-scattered Adam7 pass, or alpha bleeding into the
    RGB view flips the channel sums and the hash.  Map-only plan:
    synth and decode are back-to-back Arrow-batched mapInPandas
    stages, zero exchanges — the 100 TB media-ETL shape."""
    from .functions.multimodal import (
        decode_png_typed_stats,
        synth_png_typed_media,
    )

    register_views(spark, sf_dir)
    docs = Tables(spark, sf_dir).documents
    return decode_png_typed_stats(synth_png_typed_media(docs))


def multimodal_png_color_types_oracle() -> str:
    from .functions.portable import DUCK, lateral_seq

    lat = lateral_seq("0", "width * height - 1", "p", DUCK)
    # the synth model (multimodal.synth_png_typed_media): sample byte j
    # is (id*11 + j*19) % 256; per color type the RGB view reads sample
    # j = bpp*p (+channel) of pixel p — palette dereferences index
    # (id*11 + p*19) % 16 through k -> (16k, 16k+5, 16k+10)
    return f"""
WITH dims AS (
  SELECT doc_id,
         CAST(4 + doc_id % 9 AS INT) AS width,
         CAST(3 + doc_id % 5 AS INT) AS height,
         CAST(CASE doc_id % 5 WHEN 0 THEN 0 WHEN 1 THEN 2 WHEN 2 THEN 3
                              WHEN 3 THEN 4 ELSE 6 END AS INT) AS color_type
  FROM documents),
px AS (SELECT doc_id, width, height, color_type, p FROM dims {lat}),
v AS (SELECT doc_id, width, height, color_type,
  CASE color_type
    WHEN 0 THEN (doc_id*11 + p*19) % 256
    WHEN 2 THEN (doc_id*11 + (3*p)*19) % 256
    WHEN 3 THEN ((doc_id*11 + p*19) % 16) * 16
    WHEN 4 THEN (doc_id*11 + (2*p)*19) % 256
    ELSE (doc_id*11 + (4*p)*19) % 256 END AS vr,
  CASE color_type
    WHEN 0 THEN (doc_id*11 + p*19) % 256
    WHEN 2 THEN (doc_id*11 + (3*p+1)*19) % 256
    WHEN 3 THEN ((doc_id*11 + p*19) % 16) * 16 + 5
    WHEN 4 THEN (doc_id*11 + (2*p)*19) % 256
    ELSE (doc_id*11 + (4*p+1)*19) % 256 END AS vg,
  CASE color_type
    WHEN 0 THEN (doc_id*11 + p*19) % 256
    WHEN 2 THEN (doc_id*11 + (3*p+2)*19) % 256
    WHEN 3 THEN ((doc_id*11 + p*19) % 16) * 16 + 10
    WHEN 4 THEN (doc_id*11 + (2*p)*19) % 256
    ELSE (doc_id*11 + (4*p+2)*19) % 256 END AS vb
FROM px)
SELECT doc_id AS media_id, color_type, width, height,
  CAST(SUM(vr) AS BIGINT) AS sum_r,
  CAST(SUM(vg) AS BIGINT) AS sum_g,
  CAST(SUM(vb) AS BIGINT) AS sum_b
FROM v GROUP BY doc_id, color_type, width, height
"""


def multimodal_jpeg12_decode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """12-BIT (SOF1 extended sequential) JPEG end-to-end (r15 — the
    longest-named in-format depth candidate, VERDICT r12-r14): T.81
    baseline is 8-bit by definition, so 12-bit samples ride the
    extended sequential Huffman process — the same DCT / Annex-K
    quantization / optimized-DHT machinery at a 2048 level shift and
    wider magnitude categories, the frame shape medical/scientific
    pipelines emit.  Decoded back at FULL precision (decode_jpeg12 —
    little-endian uint16 samples; the 8-bit view would read 16x
    smaller sums, so the oracle catches a silently downshifted path).
    The block-constant even-gray model makes the lossy chain exact at
    12 bits (the r13 argument with 128 -> 2048), so the closed-form
    oracle proves the SOF1 gate, level shift and clamp.  Map-only
    plan: synth and decode are back-to-back Arrow-batched mapInPandas
    stages, zero exchanges."""
    from .functions.multimodal import (
        decode_jpeg12_stats,
        synth_jpeg12_media,
    )

    register_views(spark, sf_dir)
    docs = Tables(spark, sf_dir).documents
    return decode_jpeg12_stats(synth_jpeg12_media(docs))


def multimodal_jpeg12_decode_oracle() -> str:
    from .functions.portable import DUCK, lateral_seq

    lat = lateral_seq("0", "(width // 8) * (height // 8) - 1", "j", DUCK)
    return f"""
WITH dims AS (
  SELECT doc_id, CAST(8 * (1 + doc_id % 3) AS INT) AS width,
         CAST(8 * (1 + doc_id % 2) AS INT) AS height
  FROM documents),
blk AS (SELECT doc_id, width, height, j FROM dims {lat}),
v AS (SELECT doc_id, width, height,
        2 * ((doc_id * 11 + (j % (width // 8)) * 17
              + (j // (width // 8)) * 29) % 2048) AS val
      FROM blk)
SELECT doc_id AS media_id, width, height,
  CAST(64 * SUM(val) AS BIGINT) AS sum_r,
  CAST(64 * SUM(val) AS BIGINT) AS sum_g,
  CAST(64 * SUM(val) AS BIGINT) AS sum_b
FROM v GROUP BY doc_id, width, height
"""


def multimodal_png16_decode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-BIT PNG end-to-end (r15 — PNG's last named depth gap, the
    in-format analogue of the 12-bit JPEG arm): synthetic depth-16
    streams cycling the four legal color types (palette is 8-bit-only
    per spec table 11.1), odd ids Adam7 interlaced, every filter type
    seeded in — decoded back through the real inflate + byte-distance
    unfilter at FULL sample precision (decode_png_samples; the RGB8
    view would read ~256x smaller sums, so the oracle catches a
    silently downshifted path).  PNG is lossless, so the closed-form
    big-endian uint16 sample model makes every arm exact: a low-byte
    truncation, an endianness swap, a wrong filter byte distance at
    bpp 2/4/6/8, or a mis-scattered Adam7 pass flips the channel sums
    and the hash.  Map-only plan: synth and decode are back-to-back
    Arrow-batched mapInPandas stages, zero exchanges — the 100 TB
    media-ETL shape."""
    from .functions.multimodal import (
        decode_png16_stats,
        synth_png16_media,
    )

    register_views(spark, sf_dir)
    docs = Tables(spark, sf_dir).documents
    return decode_png16_stats(synth_png16_media(docs))


def multimodal_png16_decode_oracle() -> str:
    from .functions.portable import DUCK, lateral_seq

    lat = lateral_seq("0", "width * height - 1", "p", DUCK)
    # the synth model (multimodal.synth_png16_media): big-endian uint16
    # sample j is (id*211 + j*4093) % 65536; the full-precision RGB
    # view reads sample j = channels*p (+channel) of pixel p, with
    # grayscale/luma replicated and alpha dropped
    return f"""
WITH dims AS (
  SELECT doc_id,
         CAST(4 + doc_id % 9 AS INT) AS width,
         CAST(3 + doc_id % 5 AS INT) AS height,
         CAST(CASE doc_id % 4 WHEN 0 THEN 0 WHEN 1 THEN 2
                              WHEN 2 THEN 4 ELSE 6 END AS INT) AS color_type
  FROM documents),
px AS (SELECT doc_id, width, height, color_type, p FROM dims {lat}),
v AS (SELECT doc_id, width, height, color_type,
  CASE color_type
    WHEN 0 THEN (doc_id*211 + p*4093) % 65536
    WHEN 2 THEN (doc_id*211 + (3*p)*4093) % 65536
    WHEN 4 THEN (doc_id*211 + (2*p)*4093) % 65536
    ELSE (doc_id*211 + (4*p)*4093) % 65536 END AS vr,
  CASE color_type
    WHEN 0 THEN (doc_id*211 + p*4093) % 65536
    WHEN 2 THEN (doc_id*211 + (3*p+1)*4093) % 65536
    WHEN 4 THEN (doc_id*211 + (2*p)*4093) % 65536
    ELSE (doc_id*211 + (4*p+1)*4093) % 65536 END AS vg,
  CASE color_type
    WHEN 0 THEN (doc_id*211 + p*4093) % 65536
    WHEN 2 THEN (doc_id*211 + (3*p+2)*4093) % 65536
    WHEN 4 THEN (doc_id*211 + (2*p)*4093) % 65536
    ELSE (doc_id*211 + (4*p+2)*4093) % 65536 END AS vb
FROM px)
SELECT doc_id AS media_id, color_type, CAST(16 AS INT) AS bit_depth,
  width, height,
  CAST(SUM(vr) AS BIGINT) AS sum_r,
  CAST(SUM(vg) AS BIGINT) AS sum_g,
  CAST(SUM(vb) AS BIGINT) AS sum_b
FROM v GROUP BY doc_id, color_type, width, height
"""


def r15_specs():
    """Round-15 QuerySpec registrations, merged into the catalog by
    catalog_windows.py (the chunk convention)."""
    from .catalog_base import QuerySpec

    return {
        "multimodal_png_color_types": QuerySpec(
            multimodal_png_color_types_q,
            multimodal_png_color_types_oracle(),
            doc="PNG color-type surface: grayscale / RGB / palette / "
            "gray+alpha / RGBA on both codec sides, both interlace "
            "modes; closed-form pixel model proves the per-bpp filter "
            "reversal, PLTE dereference, and alpha-drop RGB view.",
        ),
        "multimodal_png16_decode": QuerySpec(
            multimodal_png16_decode_q,
            multimodal_png16_decode_oracle(),
            doc="16-bit PNG codec pair at full sample precision: "
            "big-endian uint16 wire format across the four legal color "
            "types, byte-distance filters at bpp 2/4/6/8, both "
            "interlace modes; lossless round-trip makes the closed-form "
            "oracle exact and downshift/endianness bugs visible.",
        ),
        "multimodal_jpeg12_decode": QuerySpec(
            multimodal_jpeg12_decode_q,
            multimodal_jpeg12_decode_oracle(),
            doc="12-bit (SOF1 extended sequential) JPEG codec pair at "
            "full sample precision: 2048 level shift, wider magnitude "
            "categories, uint16 wire format; block-constant even-gray "
            "model keeps the lossy chain exact so the closed-form "
            "oracle proves the extended-sequential path.",
        ),
    }
