"""Icepack table-layer round-trip queries (SURVEY.md §2.8-2.10).

Filled in with the M2/M3 milestones: each entry creates a temp icepack
table from fixture slices, exercises a table-format capability
(append/time-travel/DML/evolution/maintenance), and returns the final
table content so the DuckDB oracle can recompute the expected state
from the original parquet.
"""

from __future__ import annotations
