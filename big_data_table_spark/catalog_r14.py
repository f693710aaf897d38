"""Round-14 catalog builders — PROGRESSIVE (SOF2) JPEG end-to-end.

r13 closed the baseline algorithmic media gap; r14 closes the frame-
type gap real-world web images actually use: multi-scan progressive
streams with BOTH script dimensions — spectral-selection bands and
successive approximation (first passes at point transform Al=1, then
per-bit DC raw-bit and AC correction-bit refinement scans — the shape
libjpeg's default progressive mode emits).  The catalog entry proves
the whole chain against a closed-form SQL oracle: successive
approximation is LOSSLESS on the quantized coefficients, so the
block-constant even-gray model that makes the baseline chain exact
(functions/multimodal.py:synth_jpeg_media) makes the progressive chain
exact too, for ANY scan script.

QuerySpec registrations live HERE (``r14_specs``, merged by
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


def multimodal_jpeg_progressive_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROGRESSIVE (SOF2) JPEG decode end-to-end (r14 — VERDICT r13
    #6's named depth candidate): synthetic progressive JPEGs carrying
    the full two-dimension scan script — an interleaved DC first scan
    at Al=1, per-component spectral-selection AC band scans at Al=1,
    then a per-bit refinement round (DC raw-bit scan, AC
    correction-bit scans with EOBRUN carry) — decoded back through the
    general multi-scan decoder (marker walk across scans with per-scan
    DHT snapshots, coefficient accumulation, shared dequant + IDCT +
    color reconstruction).  The block-constant even-gray model makes
    the lossy pipeline exact (the r13 argument), and successive
    approximation reconstructs the quantized coefficients losslessly,
    so the closed-form oracle proves every scan stage: a dropped
    refinement bit, a mis-carried EOBRUN, or a mis-snapshotted Huffman
    table flips the decoded sums and the hash.  Map-only plan: synth
    and decode are back-to-back Arrow-batched mapInPandas stages, zero
    exchanges — the 100 TB media-ETL shape."""
    from .functions.multimodal import (
        decode_jpeg_stats,
        synth_jpeg_progressive_media,
    )

    register_views(spark, sf_dir)
    docs = Tables(spark, sf_dir).documents
    return decode_jpeg_stats(synth_jpeg_progressive_media(docs))


def multimodal_jpeg_progressive_oracle() -> str:
    from .functions.portable import DUCK, lateral_seq

    lat = lateral_seq("0", "(width // 8) * (height // 8) - 1", "j", DUCK)
    return f"""
WITH dims AS (
  SELECT doc_id, CAST(8 * (1 + doc_id % 2) AS INT) AS width,
         CAST(8 * (1 + doc_id % 3) AS INT) AS height
  FROM documents),
blk AS (SELECT doc_id, width, height, j FROM dims {lat}),
v AS (SELECT doc_id, width, height,
        2 * ((doc_id * 11 + (j % (width // 8)) * 17
              + (j // (width // 8)) * 29) % 128) AS val
      FROM blk)
SELECT doc_id AS media_id, width, height,
  CAST(64 * SUM(val) AS BIGINT) AS sum_r,
  CAST(64 * SUM(val) AS BIGINT) AS sum_g,
  CAST(64 * SUM(val) AS BIGINT) AS sum_b
FROM v GROUP BY doc_id, width, height
"""


def r14_specs():
    """Round-14 QuerySpec registrations, merged into the catalog by
    catalog_windows.py (the chunk convention)."""
    from .catalog_base import QuerySpec

    return {
        "multimodal_jpeg_progressive": QuerySpec(
            multimodal_jpeg_progressive_q,
            multimodal_jpeg_progressive_oracle(),
            doc="Progressive (SOF2) JPEG codec pair: spectral-selection "
            "bands + successive-approximation refinement scans, decoded "
            "through the general multi-scan decoder; block-constant "
            "even-gray model keeps the lossy chain exact so the "
            "closed-form oracle proves the whole scan script.",
        ),
    }
