"""Local driver-mimic: run every queries() entry on Spark and its
oracle on DuckDB at sf0.01, compare row count, column names, and an
order-insensitive value comparison (rows sorted by all columns,
floats compared to 1e-9 relative).

Usage: python tools/check.py [name_filter ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

from icepack.io import TABLES  # noqa: E402
from icepack.queries import all_oracles, all_queries  # noqa: E402
from icepack.session import get_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bool):
        return bool(v)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def rows_equal(a, b):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for x, y in zip(ra, rb):
            # near-exact: the driver value-hashes, so anything beyond
            # absolute 1e-6 would fail there; a LOOSE relative tolerance
            # once hid a real 0.1 drift on 1e9-magnitude sums
            if isinstance(x, float) and isinstance(y, (int, float)):
                if not math.isclose(x, float(y), rel_tol=1e-12, abs_tol=1e-6):
                    return False
            elif isinstance(y, float) and isinstance(x, (int, float)):
                if not math.isclose(float(x), y, rel_tol=1e-12, abs_tol=1e-6):
                    return False
            elif x != y:
                if str(x) != str(y):
                    return False
    return True


# DuckDB result types the driver's value-hash treats differently from
# the Spark value even when every cell is numerically identical.  An
# oracle must never produce these — cast in the SQL instead.
BANNED_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "TIMESTAMP_NS", "TIME")


def duck_col_types(con, sql: str) -> dict[str, str]:
    """Bind (don't execute) the oracle and return {col: duckdb_type}."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: r[1] for r in rows}


def spark_to_duck(dt: str) -> str | None:
    """Canonical DuckDB spelling of a Spark dtype; None = don't compare
    (complex type with no stable 1:1 mapping — banned-type scan still
    applies)."""
    dt = dt.strip().lower()
    simple = {
        "bigint": "BIGINT",
        "int": "INTEGER",
        "smallint": "SMALLINT",
        "tinyint": "TINYINT",
        "double": "DOUBLE",
        "float": "FLOAT",
        "string": "VARCHAR",
        "boolean": "BOOLEAN",
        "date": "DATE",
        "timestamp": "TIMESTAMP",
        "timestamp_ntz": "TIMESTAMP",
        "binary": "BLOB",
    }
    if dt in simple:
        return simple[dt]
    if dt.startswith("decimal(") and dt.endswith(")"):
        return "DECIMAL" + dt[7:]
    if dt.startswith("array<") and dt.endswith(">"):
        inner = spark_to_duck(dt[6:-1])
        return None if inner is None else inner + "[]"
    return None


def type_mismatches(scols_dtypes: dict[str, str], dtypes: dict[str, str]):
    """Exact Arrow-level fidelity check: banned oracle types always fail;
    mapped Spark types must match the DuckDB spelling exactly."""
    msgs = []
    for col, dty in dtypes.items():
        base = dty.split("(")[0].strip().rstrip("[]").strip()
        if base in BANNED_DUCK_TYPES:
            msgs.append(f"{col}: oracle type {dty} is driver-hash-hostile")
            continue
        sdt = scols_dtypes.get(col)
        if sdt is None:
            continue  # column-name mismatch reported separately
        want = spark_to_duck(sdt)
        if want is not None and dty.upper() != want.upper():
            msgs.append(f"{col}: spark {sdt} -> expect {want}, oracle {dty}")
    return msgs


def main() -> int:
    filters = sys.argv[1:]
    spark = get_session("check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs, oracles = all_queries(), all_oracles()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in sorted(qs.items()):
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ROWS {name}: {len(srows)} rows ({dt:.1f}s) [no oracle]")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            continue
        ok = True
        msgs = []
        if sorted(scols) != sorted(dcols):
            ok = False
            msgs.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        try:
            tmsgs = type_mismatches(
                dict(sdf.dtypes), duck_col_types(con, oracles[name])
            )
        except Exception as e:  # DESCRIBE should always bind; surface if not
            tmsgs = [f"DESCRIBE failed: {e}"]
        if tmsgs:
            ok = False
            msgs.append("types: " + "; ".join(tmsgs))
        if len(srows) != len(drows):
            ok = False
            msgs.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if ok:
            na, nb = norm_rows(scols, srows), norm_rows(dcols, drows)
            if not rows_equal(na, nb):
                ok = False
                diffs = [(x, y) for x, y in zip(na, nb) if x != y][:3]
                msgs.append(f"values differ, e.g. {diffs}")
        if ok:
            # a 0-row match is vacuous — both sides empty proves nothing
            # (an out-of-range date literal once made ice11 pass this way)
            tag = " [EMPTY — vacuous pass!]" if len(srows) == 0 else ""
            print(f"PASS {name}: {len(srows)} rows ({dt:.1f}s){tag}")
            n_pass += 1
        else:
            print(f"FAIL {name}: " + "; ".join(msgs))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
