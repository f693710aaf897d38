"""Round-10 pins.

1. COVERAGE.md completeness — every catalog entry must appear in the
   coverage narrative (r9 VERDICT found 6 holes; this makes the check
   scriptable and permanent).
2. Driver-window staging invariants for the r10 window.
"""

from __future__ import annotations

import pathlib

from big_data_table_spark import catalog

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_coverage_md_mentions_every_entry():
    cov = (REPO / "COVERAGE.md").read_text()
    missing = [name for name in catalog.queries() if name not in cov]
    assert not missing, f"COVERAGE.md holes: {missing}"


def test_r10_window_staging():
    keys = list(catalog.queries())
    assert keys[:50] == catalog._R10_FRONT
    assert len(catalog._R10_FRONT) == 50
    # the 33 r9 spill-overs keep their staging order at the head of NEXT
    assert keys[50 : 50 + len(catalog._R10_NEXT)] == catalog._R10_NEXT
    # every oracle key matches a query key, 1:1
    assert set(catalog.oracle_sql()) <= set(catalog.queries())
