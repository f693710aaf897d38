"""Round-12 pins.

1. The size-derived store-rewrite layout (r11 VERDICT #2): the
   corpus-cardinality compact/purge verbs (LSH digests, BM25
   postings+dl, winnow fingerprints, bitmap per-day vocabulary) no
   longer funnel through ``coalesce(1)``.  Each verb is pinned BOTH
   ways: at the default 256 MB target a fixture-scale store still
   lands as one file (every pre-existing file-count pin holds), and
   with a tiny forced target the same verb writes MULTIPLE files while
   the probe/read result stays bit-identical — the result-neutrality
   law that makes the layout free to change.
2. ``store_file_count_for``'s sizing rule itself.
"""

from __future__ import annotations

import os
import re


def _nfiles(d: str) -> int:
    return len([f for f in os.listdir(d) if f.endswith(".parquet")])


def test_store_file_count_rule(spark, sf_dir):
    """One file per target_file_bytes of the Catalyst estimate, floor 1:
    fixture-scale relations resolve to 1 at the default target, to >1
    under a tiny forced target, and the rule is monotone in size."""
    from big_data_table_spark.functions.store_layout import store_file_count_for

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    assert store_file_count_for(docs) == 1  # default 256 MB target
    small = store_file_count_for(docs, target_file_bytes=1 << 30)
    big = store_file_count_for(docs, target_file_bytes=1 << 12)
    assert small == 1 and big > 1


def test_lsh_compact_and_purge_multifile_neutral(spark, sf_dir, tmp_path):
    """lsh_index_compact / lsh_index_purge digests rewrite: forcing a
    tiny file target produces a MULTI-file digests store whose probe
    output is bit-identical — the coalesce(1) layout was never load-
    bearing (reads are DISTINCT set joins)."""
    from big_data_table_spark.catalog_base import register_views
    from big_data_table_spark.functions import dedup as DD

    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW _r12_corpus AS "
        "SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 3"
    )
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW _r12_batch AS "
        "SELECT doc_id, text FROM documents WHERE doc_id % 4 = 3"
    )
    path = str(tmp_path / "lsh12")
    DD.lsh_index_build(spark, path, "_r12_corpus")
    DD.lsh_index_append(spark, path, "_r12_corpus")  # duplicates to compact

    def rows():
        return sorted(
            (r["doc_id"], r["decision"])
            for r in DD.lsh_index_probe(spark, path, "_r12_batch").collect()
        )

    before = rows()
    DD.lsh_index_compact(spark, path, target_file_bytes=1 << 12)
    assert _nfiles(os.path.join(path, "digests")) > 1
    assert rows() == before

    doomed = spark.sql("SELECT doc_id FROM documents WHERE doc_id % 10 = 1")
    DD.lsh_index_delete(doomed, path)
    scrubbed = rows()
    DD.lsh_index_purge(spark, path, target_file_bytes=1 << 12)
    assert _nfiles(os.path.join(path, "digests")) > 1
    assert rows() == scrubbed


def test_bm25_compact_multifile_neutral(spark, sf_dir, tmp_path):
    """bm25_index_compact under a tiny file target: postings/chunk=-1
    and dl/chunk=-1 are multi-file, the top-k is bit-identical (the
    additive merge is the same sum regardless of layout), and the
    term-pruned PushedFilters read survives the tk-sorted layout."""
    from big_data_table_spark.catalog_base import register_views
    from big_data_table_spark.functions import text as TX
    from big_data_table_spark.plans import formatted_plan

    register_views(spark, sf_dir)
    path = str(tmp_path / "bm2512")
    TX.bm25_index_build(
        spark, path, "(SELECT * FROM documents WHERE doc_id % 3 != 2) _b"
    )
    TX.bm25_index_append(
        spark, path, "(SELECT * FROM documents WHERE doc_id % 3 = 2) _a", chunk=1
    )

    def rows():
        return sorted(
            (r["doc_id"], r["score"], r["n_terms_hit"])
            for r in TX.bm25_index_topk(spark, path).collect()
        )

    before = rows()
    assert TX.bm25_index_compact(spark, path, target_file_bytes=1 << 12) == 2
    assert _nfiles(os.path.join(path, "postings", "chunk=-1")) > 1
    assert _nfiles(os.path.join(path, "dl", "chunk=-1")) > 1
    assert rows() == before
    lazy = formatted_plan(TX._bm25_store_tf(spark, path))
    assert re.search(r"PushedFilters: \[In\(tk, \[[^\]]*\]", lazy), lazy[:2000]


def test_winnow_compact_multifile_neutral(spark, sf_dir, tmp_path):
    """winnow_index_compact under a tiny file target: the store becomes
    multi-file and every probe column is unchanged."""
    from big_data_table_spark.catalog_base import register_views
    from big_data_table_spark.functions import text as TX

    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW _r12_wd AS "
        "SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0"
    )
    path = str(tmp_path / "win12")
    TX.winnow_index_build(spark, path, "_r12_wd")
    TX.winnow_index_append(spark, path, "_r12_wd")  # duplicates to compact

    def rows():
        return sorted(
            tuple(r) for r in TX.winnow_index_probe(spark, path, "_r12_wd").collect()
        )

    before = rows()
    n = TX.winnow_index_compact(spark, path, target_file_bytes=1 << 12)
    assert n > 1 and _nfiles(path) == n
    assert rows() == before
    # and the default target still lands one file at fixture scale
    assert TX.winnow_index_compact(spark, path) == 1


def test_bitmap_compact_purge_multifile_neutral(spark, tmp_path):
    """bitmap_rollup_compact / purge under a tiny file target: the
    per-day chunk=-1 partition is multi-file, the daily range read is
    bit-identical (BIT_OR is associative over any file layout)."""
    from pyspark.sql import functions as F

    from big_data_table_spark.functions import bitmap_store as B

    ev = spark.createDataFrame(
        [(i % 700, "2024-01-05 10:00:00") for i in range(4000)],
        "user_id long, ts string",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    path = str(tmp_path / "bm12")
    B.bitmap_rollup_build(ev, path)
    B.bitmap_rollup_append_chunk(ev, path, 1)

    def rows():
        return sorted(
            tuple(r)
            for r in B.bitmap_rollup_range_daily(
                spark, path, "2024-01-01", "2024-01-31"
            ).collect()
        )

    before = rows()
    B.bitmap_rollup_compact(spark, path, "2024-01-05", target_file_bytes=1 << 10)
    assert _nfiles(os.path.join(path, "day=2024-01-05", "chunk=-1")) > 1
    assert rows() == before

    doomed = spark.createDataFrame([(i,) for i in range(0, 700, 7)], "user_id long")
    B.bitmap_rollup_delete(doomed, path)
    scrubbed = sorted(
        tuple(r)
        for r in B.bitmap_rollup_range_daily_scrubbed(
            spark, path, "2024-01-01", "2024-01-31"
        ).collect()
    )
    B.bitmap_rollup_purge(spark, path, target_file_bytes=1 << 10)
    assert _nfiles(os.path.join(path, "day=2024-01-05", "chunk=-1")) > 1
    assert rows() == scrubbed
