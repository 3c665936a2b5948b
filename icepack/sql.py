"""Snowflake-dialect SQL front-end (the reference's declared surface).

Every statement form the reference docs actually write — CREATE ICEBERG
TABLE with PARTITION BY transforms (docs/01:182-205), INSERT/DELETE/
UPDATE/MERGE incl. conditional matched-DELETE (docs/08:84-141), time
travel ``AT (SNAPSHOT|TIMESTAMP|OFFSET => ...)`` (docs/05:57-72), the
ALTER maintenance verbs COMPACT DATA / EXPIRE SNAPSHOTS / REWRITE
MANIFESTS / REMOVE ORPHAN FILES (docs/10), schema-evolution ALTERs
(docs/06:20-51), properties (docs/08:108-110), ``DESCRIBE``/``SHOW``
(docs/03:163-171), and the ``table$FILES``-style metadata relations
(docs/10:127-140) — routed onto the icepack Python API, with everything
relational delegated verbatim to ``spark.sql`` (stock Catalyst).

Parsing scope is exactly the documented dialect, deliberately: the
relational grammar (SELECT, joins, CTEs, windows, ...) is Spark's own —
this module never re-implements it, it only resolves icepack table
names, time-travel clauses, and metadata relations into temp views
before delegating.  DML predicates are parsed into the ``expr`` pruning
language so SQL statements get the same manifest/file pruning as the
Python API (a SQL DELETE of one day still rewrites one day's files,
never the table).
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import maintenance
from .session import local_df
from .catalog import Catalog
from .expr import AlwaysTrue, Expr, col as ecol
from .metadata import Snapshot
from .table import CommitConflict, IceTable

# --------------------------------------------------------------------------
# predicate parser: documented WHERE subset → expr.Expr (prunable)
# --------------------------------------------------------------------------

_TOKEN = re.compile(
    r"""\s*(?:
      (?P<str>'(?:[^']|'')*')
    | (?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
    | (?P<op><=|>=|<>|!=|=|<|>)
    | (?P<lp>\()
    | (?P<rp>\))
    | (?P<comma>,)
    | (?P<word>[A-Za-z_][A-Za-z_0-9.$]*)
    )""",
    re.VERBOSE,
)


def _tokenize(s: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN.match(s, i)
        if not m:
            raise ValueError(f"cannot tokenize predicate at: {s[i:i+30]!r}")
        i = m.end()
        kind = m.lastgroup
        out.append((kind, m.group(kind)))
    out.append(("end", ""))
    return out


class _Pred:
    """Recursive-descent parser for the docs' WHERE grammar:
    comparisons, IN, BETWEEN, IS [NOT] NULL, AND/OR/NOT, parens,
    typed literals DATE '...' / TIMESTAMP '...'."""

    def __init__(self, s: str):
        self.toks = _tokenize(s)
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect_word(self, *words):
        k, v = self.next()
        if k != "word" or v.upper() not in words:
            raise ValueError(f"expected {words}, got {v!r}")
        return v.upper()

    def parse(self) -> Expr:
        e = self.or_expr()
        if self.peek()[0] != "end":
            raise ValueError(f"trailing tokens: {self.toks[self.i:]}")
        return e

    def or_expr(self) -> Expr:
        e = self.and_expr()
        while self.peek() == ("word", "OR") or (
            self.peek()[0] == "word" and self.peek()[1].upper() == "OR"
        ):
            self.next()
            e = e | self.and_expr()
        return e

    def and_expr(self) -> Expr:
        e = self.not_expr()
        while self.peek()[0] == "word" and self.peek()[1].upper() == "AND":
            self.next()
            e = e & self.not_expr()
        return e

    def not_expr(self) -> Expr:
        if self.peek()[0] == "word" and self.peek()[1].upper() == "NOT":
            self.next()
            return ~self.not_expr()
        return self.atom()

    def literal(self):
        k, v = self.next()
        if k == "str":
            return v[1:-1].replace("''", "'")
        if k == "num":
            return float(v) if ("." in v or "e" in v.lower()) else int(v)
        if k == "word":
            u = v.upper()
            if u in ("DATE", "TIMESTAMP"):  # typed literal: DATE '2024-01-01'
                k2, v2 = self.next()
                if k2 != "str":
                    raise ValueError(f"expected string after {u}")
                return v2[1:-1]
            if u == "TRUE":
                return True
            if u == "FALSE":
                return False
            if u == "NULL":
                return None
        raise ValueError(f"expected literal, got {v!r}")

    def atom(self) -> Expr:
        k, v = self.next()
        if k == "lp":
            e = self.or_expr()
            kk, _ = self.next()
            if kk != "rp":
                raise ValueError("unbalanced parens")
            return e
        if k != "word":
            raise ValueError(f"expected column, got {v!r}")
        c = ecol(v)
        k2, v2 = self.next()
        if k2 == "op":
            lit = self.literal()
            return {
                "=": c == lit, "<>": c != lit, "!=": c != lit,
                "<": c < lit, "<=": c <= lit, ">": c > lit, ">=": c >= lit,
            }[v2]
        if k2 == "word":
            u = v2.upper()
            if u == "IN":
                if self.next()[0] != "lp":
                    raise ValueError("expected ( after IN")
                vals = [self.literal()]
                while self.peek()[0] == "comma":
                    self.next()
                    vals.append(self.literal())
                if self.next()[0] != "rp":
                    raise ValueError("expected ) after IN list")
                return c.isin(*vals)
            if u == "BETWEEN":
                lo = self.literal()
                self.expect_word("AND")
                hi = self.literal()
                return (c >= lo) & (c <= hi)
            if u == "IS":
                if self.peek()[1].upper() == "NOT":
                    self.next()
                    self.expect_word("NULL")
                    return c.is_not_null()
                self.expect_word("NULL")
                return c.is_null()
        raise ValueError(f"unsupported predicate near {v2!r}")


def parse_predicate(s: str) -> Expr:
    s = s.strip().rstrip(";").strip()
    if not s:
        return AlwaysTrue()
    return _Pred(s).parse()


def _split_top_and(s: str) -> list[str]:
    """Split a WHERE clause into its top-level AND conjuncts (for
    per-table predicate routing).  Semantics-preserving by refusal:
    returns ``[s]`` whole when a top-level OR exists (splitting a
    disjunction would change meaning — precedence makes naive AND
    splits wrong there), and the AND inside BETWEEN..AND never splits."""
    out: list[str] = []
    cur: list[str] = []
    depth = 0
    pending_between = 0
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if s[j] == "'":
                    if j + 1 < n and s[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            cur.append(s[i : j + 1])
            i = j + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        m = re.match(r"[A-Za-z_][A-Za-z_0-9.$]*", s[i:])
        if m:
            w = m.group(0)
            u = w.upper()
            if depth == 0 and u == "OR":
                return [s]
            if depth == 0 and u == "BETWEEN":
                pending_between += 1
            if depth == 0 and u == "AND":
                if pending_between:
                    pending_between -= 1
                    cur.append(w)
                else:
                    out.append("".join(cur))
                    cur = []
                i += len(w)
                continue
            cur.append(w)
            i += len(w)
            continue
        cur.append(ch)
        i += 1
    out.append("".join(cur))
    return [p.strip() for p in out if p.strip()]


# --------------------------------------------------------------------------
# type & partition-spec mapping (Snowflake spellings → Spark/icepack)
# --------------------------------------------------------------------------

_TYPE_MAP = [
    (r"VARCHAR(\(\d+\))?|STRING|TEXT|CHAR(\(\d+\))?", "string"),
    # VARIANT is stored as a JSON string column, queried with the P5/F7
    # surface (get_json_object / parse_json / variant_get)
    (r"VARIANT|OBJECT|ARRAY", "string"),
    (r"NUMBER\((\d+)\s*,\s*(\d+)\)|DECIMAL\((\d+)\s*,\s*(\d+)\)|NUMERIC\((\d+)\s*,\s*(\d+)\)", "decimal"),
    (r"NUMBER|DECIMAL|NUMERIC", "decimal(38,0)"),
    (r"BIGINT|LONG", "bigint"),
    (r"SMALLINT|TINYINT|INT|INTEGER", "int"),
    (r"DOUBLE( PRECISION)?", "double"),
    (r"FLOAT4?|REAL", "float"),
    (r"BOOLEAN|BOOL", "boolean"),
    (r"TIMESTAMP_NTZ(\(\d+\))?|TIMESTAMP(\(\d+\))?|DATETIME", "timestamp_ntz"),
    (r"TIMESTAMP_TZ(\(\d+\))?|TIMESTAMP_LTZ(\(\d+\))?", "timestamp"),
    (r"DATE", "date"),
    (r"BINARY|VARBINARY", "binary"),
]


def _map_type(t: str) -> str:
    t = t.strip()
    # Structured types (docs/06-schema-evolution.md:114-136): the
    # PARAMETRIZED spellings OBJECT(f T, ...) / ARRAY(T) / MAP(K, V)
    # are real nested Iceberg types and map recursively to Spark
    # struct/array/map; the BARE spellings (OBJECT, ARRAY) stay
    # semi-structured — a JSON string column queried through the
    # VARIANT surface (P5/F7), per the _TYPE_MAP entry below.
    m = re.match(r"(?i)^OBJECT\s*\((.*)\)$", t, re.DOTALL)
    if m:
        parts = []
        for fd in _split_top(m.group(1)):
            fm = re.match(r'([A-Za-z_][\w$]*|"[^"]+")\s+(.*)', fd.strip(), re.DOTALL)
            if not fm:
                raise ValueError(f"bad OBJECT field definition: {fd!r}")
            ft = re.sub(r"\s+NOT\s+NULL\s*$", "", fm.group(2).strip(), flags=re.IGNORECASE)
            parts.append(f"{fm.group(1).strip(chr(34))}:{_map_type(ft)}")
        return "struct<" + ",".join(parts) + ">"
    m = re.match(r"(?i)^ARRAY\s*\((.*)\)$", t, re.DOTALL)
    if m:
        return f"array<{_map_type(m.group(1))}>"
    m = re.match(r"(?i)^MAP\s*\((.*)\)$", t, re.DOTALL)
    if m:
        kv = _split_top(m.group(1))
        if len(kv) != 2:
            raise ValueError(f"MAP needs exactly (key, value): {t!r}")
        return f"map<{_map_type(kv[0])},{_map_type(kv[1])}>"
    for pat, out in _TYPE_MAP:
        m = re.fullmatch(pat, t, re.IGNORECASE)
        if m:
            if out == "decimal":
                nums = [g for g in m.groups() if g and g.isdigit()]
                return f"decimal({nums[0]},{nums[1]})"
            return out
    return t.lower()  # already a Spark spelling (array<...>, map<...>)


def _split_top(s: str, sep: str = ",") -> list[str]:
    out, depth, cur = [], 0, []
    for ch in s:
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        if ch == sep and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return [p.strip() for p in out if p.strip()]


def _parse_columns(body: str) -> str:
    """``(a VARCHAR NOT NULL, b INT, ...)`` → Spark DDL string."""
    fields = []
    for coldef in _split_top(body):
        m = re.match(r'([A-Za-z_][\w$]*|"[^"]+")\s+(.*)', coldef.strip(), re.DOTALL)
        if not m:
            raise ValueError(f"bad column definition: {coldef!r}")
        name = m.group(1).strip('"')
        rest = re.sub(r"\s+NOT\s+NULL\s*$", "", m.group(2).strip(), flags=re.IGNORECASE)
        fields.append(f"{name} {_map_type(rest)}")
    return ", ".join(fields)


def _parse_partition_by(body: str) -> list[tuple[str, str]]:
    """``(DATE(start_time), service_name, BUCKET(4, id))`` →
    [(col, transform)] in icepack's transform spellings."""
    spec = []
    for item in _split_top(body):
        m = re.fullmatch(r"(?i)(DATE|DAY|MONTH|YEAR|HOUR)\s*\(\s*([\w$]+)\s*\)", item)
        if m:
            fn = m.group(1).lower()
            spec.append((m.group(2), "day" if fn == "date" else fn))
            continue
        m = re.fullmatch(r"(?i)BUCKET\s*\(\s*(\d+)\s*,\s*([\w$]+)\s*\)", item)
        if m:
            spec.append((m.group(2), f"bucket[{m.group(1)}]"))
            continue
        m = re.fullmatch(r"(?i)TRUNC(?:ATE)?\s*\(\s*(\d+)\s*,\s*([\w$]+)\s*\)", item)
        if m:
            spec.append((m.group(2), f"truncate[{m.group(1)}]"))
            continue
        m = re.fullmatch(r"[\w$]+", item)
        if m:
            spec.append((item, "identity"))
            continue
        raise ValueError(f"unsupported partition transform: {item!r}")
    return spec


# --------------------------------------------------------------------------
# the statement router
# --------------------------------------------------------------------------

_AT = re.compile(
    r"(?i)\b(FROM|JOIN)\s+([A-Za-z_][\w.$]*)(\s+(?:AS\s+)?[A-Za-z_]\w*)?"
    r"\s+AT\s*\(\s*(SNAPSHOT|TIMESTAMP|OFFSET)\s*=>\s*([^)]+?)\s*\)"
)
_BEFORE = re.compile(
    r"(?i)\b(FROM|JOIN)\s+([A-Za-z_][\w.$]*)(\s+(?:AS\s+)?[A-Za-z_]\w*)?"
    r"\s+BEFORE\s*\(\s*(STATEMENT|SNAPSHOT)\s*=>\s*([^)]+?)\s*\)"
)
_META_REL = re.compile(
    r"(?i)\b([A-Za-z_][\w.]*)"
    r"\$(SNAPSHOTS|FILES|MANIFESTS|PARTITION_STATS|PARTITIONS|HISTORY|REFS)\b"
)
#: docs/03:174-181 table functions: TABLE(INFORMATION_SCHEMA.ICEBERG_TABLE_FILES('t'))
_INFO_SCHEMA = re.compile(
    r"(?i)\bTABLE\s*\(\s*INFORMATION_SCHEMA\s*\.\s*ICEBERG_TABLE_"
    r"(SNAPSHOTS|MANIFESTS|FILES)\s*\(\s*'([^']+)'\s*\)\s*\)"
)
#: docs/09:181-194 monitoring: TABLE(INFORMATION_SCHEMA.QUERY_HISTORY())
_QUERY_HISTORY = re.compile(
    r"(?i)\bTABLE\s*\(\s*INFORMATION_SCHEMA\s*\.\s*QUERY_HISTORY\s*\(\s*\)\s*\)"
)
#: docs/11:160-166: TABLE(INFORMATION_SCHEMA.TABLES)
_IS_TABLES = re.compile(
    r"(?i)\bTABLE\s*\(\s*INFORMATION_SCHEMA\s*\.\s*TABLES\s*\)"
)
#: statements the result cache must never serve (volatile surfaces,
#: clock/random functions, time travel whose resolution can shift
#: under snapshot expiry)
_CACHE_VOLATILE = re.compile(
    r"(?i)RESULT_SCAN|QUERY_HISTORY|INFORMATION_SCHEMA|LAST_QUERY_ID"
    r"|\bAT\s*\(|\bBEFORE\s*\(|\bRAND(?:OM)?\s*\(|CURRENT_|\bNOW\s*\("
    r"|\bUUID\s*\(|\$CHANGES\b"
)
#: FROM/JOIN relation identifiers (cache safety: each must resolve) —
#: comma-separated FROM lists are captured whole and split, so an
#: unchecked temp view can't slip in via ``FROM t1, t2``
_CACHE_RELS = re.compile(
    r"(?i)\b(?:FROM|JOIN)\s+([A-Za-z_][\w.]*(?:\s*,\s*[A-Za-z_][\w.]*)*)"
)
#: retained plans are tiny (lazy), but the dict must not grow without
#: bound in a long-lived session: FIFO-evict past this many entries
_RESULT_CACHE_MAX = 256
#: CTE names declared by the statement itself
_CACHE_CTES = re.compile(r"(?i)\b([A-Za-z_]\w*)\s+AS\s*\(")

#: docs/09:97-99: TABLE(RESULT_SCAN('<query_id>' | LAST_QUERY_ID()))
_RESULT_SCAN = re.compile(
    r"(?i)\bTABLE\s*\(\s*RESULT_SCAN\s*\(\s*"
    r"(?:'([^']*)'|LAST_QUERY_ID\s*\(\s*\))\s*\)\s*\)"
)


class IceSQL:
    """``IceSQL(spark, warehouse).sql(statement)`` — the reference
    user's entry point.  SELECTs return DataFrames; DML returns the
    committed Snapshot; DDL returns the IceTable (or None)."""

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.catalog = Catalog(spark, warehouse)
        self._warehouse = warehouse
        self._viewn = 0
        #: tables linked from an external REST catalog (docs/04:77-93):
        #: resolved through the integration's CATALOG_URI, addressed by
        #: their local alias like any other table
        self._linked: dict[str, IceTable] = {}
        #: CREATE VIEW definitions, name → SQL text.  Re-resolved on
        #: every read so views track their base tables' current
        #: snapshots (session-scoped, like temp views).
        self._views: dict[str, str] = {}
        #: PERSISTENT versioned views (CREATE ICEBERG VIEW — the
        #: Iceberg view-spec trees under <warehouse>/__views__/<name>),
        #: loaded lazily so a fresh session sees views another session
        #: committed.  name → IceView handle.
        self._pviews: dict = {}
        #: USE DATABASE default namespace for unqualified names
        self._database: str | None = None
        #: active multi-statement transaction (docs/08:143-165, managed
        #: tables only): {table name -> TxnTable staging handle}; None =
        #: autocommit
        self._txn: "dict[str, object] | None" = None
        self._txn_id: str | None = None
        #: QUERY_HISTORY rows (docs/09:181-194): one per sql() call,
        #: with the pruning metrics harvested from the table handles
        #: the statement touched (the per-scan _scan_log)
        self._history: list[tuple] = []
        self._stmt_handles: list = []
        #: RESULT_SCAN surface (docs/09:97-99): query id → that
        #: statement's result DataFrame.  Plans are lazy, so a re-scan
        #: RE-EXECUTES the retained plan over the file set its views
        #: were registered on (Snowflake replays a cached result; same
        #: rows unless retention has since collected the files).
        self._results: dict[str, DataFrame] = {}
        #: BEFORE(STATEMENT => <query_id>) surface (docs/05:66-72):
        #: query id → the snapshot id that statement committed
        self._stmt_snapshots: dict[str, int] = {}
        #: cross-query RESULT CACHE (docs/01-table-format-architecture.md:163):
        #: normalized statement text → {"snapshots": {location:
        #: current-snapshot-id at store time}, "df": retained lazy plan}.
        #: A hit requires every referenced table's CURRENT snapshot to
        #: still equal the recorded one (any commit — this session or
        #: another process — changes the id and invalidates).  Only pure
        #: SELECTs whose relations all resolve to iceberg tables/views
        #: are cached; the plan is lazy and its snapshot's files are
        #: immutable, so replaying it is exactly Snowflake's 'reuse the
        #: cached result' semantics.
        self._result_cache: dict[str, dict] = {}
        #: cached catalog relation names for _cache_store (cleared with
        #: the result cache on DDL)
        self._known_rels: set | None = None
        # roll forward any multi-table COMMIT a previous process
        # crashed in the middle of (publish-intent recovery, txn.py) —
        # readers through this session then see none-or-all of it
        from .txn import recover_transactions

        recover_transactions(spark, warehouse, self.catalog.store)

    # -- helpers ------------------------------------------------------------

    def _table(self, name: str) -> IceTable:
        if self._txn is not None and name in self._txn:
            t = self._txn[name]  # read-your-writes inside BEGIN..COMMIT
        elif name in self._linked:
            t = self._linked[name].refresh()
        else:
            t = self.catalog.load_table(name)
        self._stmt_handles.append(t)  # QUERY_HISTORY pruning metrics
        return t

    def _dml_table(self, name: str) -> IceTable:
        """Resolve a DML target: inside a transaction, writes stage on
        the table's hidden branch via a TxnTable handle; linked
        (externally-cataloged) tables are autocommit only
        (docs/08-acid-transactions.md:150-165)."""
        if self._txn is None:
            return self._table(name)
        if name in self._linked:
            raise ValueError(
                "multi-statement transactions are not supported for "
                "externally-cataloged tables (autocommit only, docs/08)"
            )
        if name not in self._txn:
            from .txn import TxnTable

            self._txn[name] = TxnTable.from_table(
                self.catalog.load_table(name), f"__txn_{self._txn_id}"
            )
        return self._txn[name]

    def _fresh_view(self, df: DataFrame, hint: str) -> str:
        self._viewn += 1
        vn = f"_ice_{hint}_{self._viewn}"
        df.createOrReplaceTempView(vn)
        return vn

    def _register_tables(self, stmt: str) -> str:
        """Expose every catalog table referenced in the statement to
        spark.sql under its dotted-flattened and last-component names,
        and flatten dotted references (``bronze.events_raw`` →
        ``bronze_events_raw`` temp view) so the docs' namespaced names
        resolve.  Returns the (possibly rewritten) statement.

        SELECT-side pruning (docs/09:17-44): top-level WHERE conjuncts
        are parsed into the expr pruning language and routed to the
        table that UNAMBIGUOUSLY owns their columns, then passed to
        that table's ``toDF`` — so both the single-table partition
        predicate and the star-join's fact-side filter go through
        manifest/file pruning, exactly as DML does.  Conjuncts that
        don't parse, reference columns of several referenced tables, or
        are alias-qualified fall back to the full live file set for
        that table (correctness never depends on pruning: Spark
        re-applies the whole WHERE in full)."""
        hit = [
            name
            for name in list(self.catalog.list_tables()) + list(self._linked)
            if re.search(
                rf"(?i)\b({re.escape(name)}|{re.escape(name.replace('.', '_'))}"
                rf"|{re.escape(name.split('.')[-1])})\b",
                stmt,
            )
        ]
        handles = {name: self._table(name) for name in hit}
        preds = self._select_scan_predicates(stmt, handles)
        # v3 row lineage through SQL (VERDICT r12 task 3): a statement
        # that references the RESERVED metadata columns scans qualifying
        # tables with row_lineage=True so CDC-style queries ("rows
        # updated since sequence N", docs/12-lakehouse-patterns.md:94-104
        # re-expressed over lineage) work without the Python API.
        # Qualifying = spec-primary format.spec-version=3 and no schema
        # shadowing (a table whose schema legitimately owns a column of
        # that name keeps serving the DATA column).
        wants_lineage = re.search(
            r"(?i)\b(_row_id|_last_updated_sequence_number)\b", stmt
        )
        for name, t in handles.items():
            flat, short = name.replace(".", "_"), name.split(".")[-1]
            lineage = bool(wants_lineage) and self._serves_lineage(t)
            df = t.toDF(preds.get(name), row_lineage=lineage)
            df.createOrReplaceTempView(flat)
            if short != name:
                df.createOrReplaceTempView(short)
            if "." in name:
                stmt = re.sub(rf"(?i)\b{re.escape(name)}\b", flat, stmt)
        return stmt

    @staticmethod
    def _serves_lineage(t: IceTable) -> bool:
        """True when *t* can serve the v3 lineage metadata columns:
        spec-primary, format.spec-version=3, and the schema does not
        shadow the reserved names (shadowing tables serve their own
        data columns — the native scan's refusal is for EXPLICIT
        row_lineage=True requests, which SQL never hard-requires)."""
        from .specio import spec_format_version

        if not (t.spec_primary and spec_format_version(t.meta.properties) >= 3):
            return False
        names = {f.name for f in t.meta.schema.fields}
        return not (names & {"_row_id", "_last_updated_sequence_number"})

    def _select_scan_predicates(self, stmt: str, handles: dict) -> dict:
        """{table name -> prunable Expr} from a SELECT's top-level
        WHERE.  Applies only to subquery-free SELECTs (one SELECT
        keyword), where the single WHERE is unambiguous; each AND
        conjunct is assigned to the one referenced table whose schema
        contains ALL its columns while no other referenced table
        contains ANY of them."""
        s = stmt.strip()
        if not re.match(r"(?i)SELECT\b", s):
            return {}
        if len(re.findall(r"(?i)\bSELECT\b", s)) != 1:
            return {}  # subqueries: their WHEREs are not top-level
        m = re.search(
            r"(?is)\bWHERE\s+(.*?)(\s+(GROUP|ORDER|LIMIT|HAVING|WINDOW|QUALIFY)\b.*)?$",
            s,
        )
        if not m:
            return {}
        cols = {
            name: {f.name for f in t.meta.schema.fields}
            for name, t in handles.items()
        }
        out: dict[str, Expr] = {}
        for conj in _split_top_and(m.group(1)):
            try:
                pred = parse_predicate(conj)
            except ValueError:
                continue
            refs = pred.references()
            if any("." in r or "$" in r for r in refs):
                continue  # alias-qualified: not resolvable here
            owners = [n for n, cs in cols.items() if refs <= cs]
            touched = [n for n, cs in cols.items() if refs & cs]
            if len(owners) == 1 and touched == owners:
                out[owners[0]] = (
                    out[owners[0]] & pred if owners[0] in out else pred
                )
        return out

    def _resolve_name(self, name: str) -> str:
        """Accept dotted, flattened, or last-component table names."""
        tables = list(self.catalog.list_tables()) + list(self._linked)
        if name in tables:
            return name
        for t in tables:
            if name == t.replace(".", "_") or name == t.split(".")[-1]:
                return t
        raise ValueError(f"unknown iceberg table {name!r}")

    # -- result cache (docs/01:163) -----------------------------------------

    def _cache_lookup(self, text: str):
        """Return the retained plan when the statement text matches and
        every referenced table's CURRENT snapshot id (re-read from the
        metadata pointer, so commits from other processes count) still
        equals the one recorded at store time; else None.  Keys carry
        the active database: the same text resolves differently after
        USE DATABASE."""
        if self._txn is not None:
            return None  # inside BEGIN..COMMIT reads go to the branch
        ent = self._result_cache.get((self._database, text))
        if ent is None:
            return self._pcache_load(text)
        for loc, sid in ent["snapshots"].items():
            try:
                if IceTable.load(self.spark, loc).meta.current_snapshot_id != sid:
                    return None
            except Exception:  # noqa: BLE001 — dropped table etc.: miss
                return None
        if not ent.get("persisted"):
            # a HOT query (second run this session) earns warehouse
            # persistence: materializing here costs one execution the
            # replay was about to pay anyway, and every FUTURE session
            # over this warehouse then hits without re-scanning
            # (docs/01:163 — the warehouse result cache survives
            # sessions).  Best-effort: a failed write never fails the
            # query.
            ent["persisted"] = True
            try:
                self._pcache_write(text, ent)
            except Exception:  # noqa: BLE001
                pass
        return ent["df"]

    # -- persistent result cache (docs/01:163: survives sessions) -----------

    def _pcache_root(self) -> str | None:
        """Warehouse-scoped cache directory, local filesystems only
        (object-store warehouses keep the in-session layer)."""
        if "://" in self._warehouse:
            return None
        return os.path.join(self._warehouse, "__result_cache__")

    @staticmethod
    def _pcache_key(database, text: str) -> str:
        import hashlib

        return hashlib.sha256(f"{database}\x00{text}".encode()).hexdigest()[:32]

    def _pcache_write(self, text: str, ent: dict) -> None:
        """Materialize a cached result under the warehouse: parquet
        rows + a meta sidecar recording, per referenced table, BOTH the
        snapshot id and the metadata VERSION at store time (a column
        rename bumps the version without moving the snapshot pointer —
        snapshot-only validation would serve stale column names to a
        fresh session).  Entry publication is atomic via tmp-dir
        rename; concurrent writers lose the rename race harmlessly."""
        import time as _time
        import uuid as _uuid

        root = self._pcache_root()
        if root is None:
            return
        # session-scoped names (views, linked-catalog aliases) mean the
        # TEXT's meaning dies with this session — another session may
        # bind the same name differently (or not at all), and no table
        # version would catch it.  Keep those entries in-session only.
        sess_names = {v.lower() for v in self._views} | {
            a.lower() for a in self._linked
        }
        # persistent-view names are cross-session but their MEANING can
        # change without any table snapshot moving (a REPLACE bumps only
        # the view tree) — same staleness hazard, same exclusion
        sess_names |= {v.lower() for v in self._pview_names()}
        for group in _CACHE_RELS.findall(text):
            for ident in (i.strip().lower() for i in group.split(",")):
                if ident in sess_names:
                    return
        os.makedirs(root, exist_ok=True)
        key = self._pcache_key(self._database, text)
        final = os.path.join(root, key)
        if os.path.exists(final):
            return
        tmp = os.path.join(root, f".tmp-{_uuid.uuid4().hex}")
        ent["df"].write.parquet(os.path.join(tmp, "data"))
        meta = {
            "text": text,
            "database": self._database,
            "tables": {
                loc: {"snapshot": sid, "version": ent["versions"].get(loc)}
                for loc, sid in ent["snapshots"].items()
            },
            "created_ms": int(_time.time() * 1000),
        }
        with open(os.path.join(tmp, "meta.json"), "w") as fh:
            json.dump(meta, fh)
        try:
            os.rename(tmp, final)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)  # lost the race
        self._pcache_evict(root)

    def _pcache_load(self, text: str):
        """Serve a statement from the warehouse cache when every
        referenced table still sits at the recorded (snapshot, version)
        — re-read from the metadata pointers, so commits from ANY
        process invalidate.  Invalid entries are deleted on sight."""
        import shutil

        root = self._pcache_root()
        if root is None:
            return None
        final = os.path.join(root, self._pcache_key(self._database, text))
        mpath = os.path.join(final, "meta.json")
        if not os.path.exists(mpath):
            return None
        try:
            meta = json.load(open(mpath))
        except ValueError:
            return None
        if meta.get("text") != text or meta.get("database") != self._database:
            return None  # hash collision: never serve
        for loc, rec in meta.get("tables", {}).items():
            try:
                t = IceTable.load(self.spark, loc)
                if (
                    t.meta.current_snapshot_id != rec.get("snapshot")
                    or t._version != rec.get("version")
                ):
                    shutil.rmtree(final, ignore_errors=True)
                    return None
            except Exception:  # noqa: BLE001 — dropped table: evict
                shutil.rmtree(final, ignore_errors=True)
                return None
        df = self.spark.read.parquet(os.path.join(final, "data"))
        self._result_cache[(self._database, text)] = {
            "snapshots": {
                loc: rec.get("snapshot") for loc, rec in meta["tables"].items()
            },
            "versions": {
                loc: rec.get("version") for loc, rec in meta["tables"].items()
            },
            "df": df,
            "persisted": True,
        }
        return df

    #: persistent-entry bounds: FIFO past the cap, TTL for the rest
    _PCACHE_MAX = 64
    _PCACHE_TTL_MS = 7 * 24 * 3600 * 1000

    def _pcache_evict(self, root: str) -> None:
        import shutil
        import time as _time

        entries = []
        for name in os.listdir(root):
            if name.startswith(".tmp-"):
                continue
            mpath = os.path.join(root, name, "meta.json")
            try:
                created = json.load(open(mpath)).get("created_ms", 0)
            except (OSError, ValueError):
                created = 0
            entries.append((created, os.path.join(root, name)))
        now = int(_time.time() * 1000)
        entries.sort()
        drop = [p for c, p in entries if now - c > self._PCACHE_TTL_MS]
        drop += [p for _, p in entries[: max(0, len(entries) - self._PCACHE_MAX)]]
        for p in set(drop):
            shutil.rmtree(p, ignore_errors=True)

    def _cache_store(self, text: str, df: DataFrame, handles) -> None:
        """Cache only what is provably safe to replay: no volatile
        surfaces (RESULT_SCAN / QUERY_HISTORY / time travel / random /
        clock), every FROM/JOIN relation resolves to an iceberg
        table, view, or CTE of the statement (an unknown name could be
        a session temp view whose content changes without any snapshot
        moving), and at least one iceberg table was actually read."""
        if self._txn is not None or _CACHE_VOLATILE.search(text):
            return
        if self._known_rels is None:
            # listing the catalog per SELECT is O(tables) — cache the
            # name set; DDL clears it along with the result cache
            # (tables created by another process just aren't cached
            # against, which is safe — a missed hit, never a stale one)
            known = set()
            for t in self.catalog.list_tables():
                known |= {
                    t.lower(),
                    t.replace(".", "_").lower(),
                    t.split(".")[-1].lower(),
                }
            self._known_rels = known
        known = set(self._known_rels)
        known |= {v.lower() for v in self._views}
        known |= {a.lower() for a in self._linked}
        known |= {m.lower() for m in _CACHE_CTES.findall(text)}
        for group in _CACHE_RELS.findall(text):
            for ident in (i.strip() for i in group.split(",")):
                if ident and ident.lower() not in known:
                    return
        snaps, vers = {}, {}
        for h in handles:
            if not isinstance(h, IceTable):
                return
            snaps[h.location] = h.meta.current_snapshot_id
            vers[h.location] = h._version
        if snaps:
            while len(self._result_cache) >= _RESULT_CACHE_MAX:
                self._result_cache.pop(next(iter(self._result_cache)))
            self._result_cache[(self._database, text)] = {
                "snapshots": snaps,
                "versions": vers,
                "df": df,
            }

    # -- multi-statement transactions (D6, docs/08:143-165) -----------------

    def _txn_begin(self):
        if self._txn is not None:
            raise ValueError("transaction already in progress (no nesting)")
        import uuid as _uuid

        self._txn = {}
        self._txn_id = _uuid.uuid4().hex[:8]

    def _txn_commit(self):
        """Publish every staged table: fast-forward main to its branch
        head (one CAS per table — readers see none or all of that
        table's statements), then drop the branches.

        Multi-table atomicity (docs/08:143-165): before the first
        fast-forward, every staged table's publish precondition is
        re-validated (doomed commits abort CLEANLY with nothing
        published), then a PUBLISH INTENT is durably written — from
        that point the transaction is decided, and a crash mid-publish
        is rolled FORWARD by recover_transactions (run on IceSQL
        open), so readers see none or all tables.  Failures before the
        intent discard all staged branches as before."""
        from .txn import write_publish_intent

        if self._txn is None:
            raise ValueError("COMMIT outside a transaction")
        handles, txn_id, self._txn, self._txn_id = (
            self._txn,
            self._txn_id,
            None,
            None,
        )
        # pre-validate (refreshes each handle) — abort with zero tables
        # published rather than deciding a commit that cannot complete
        for name, h in handles.items():
            if not h.txn_can_publish():
                for h2 in handles.values():
                    try:
                        h2.txn_discard()
                    except Exception:  # noqa: BLE001 — best-effort cleanup
                        pass
                raise CommitConflict(
                    f"table {name!r} changed since the transaction staged "
                    "it; aborting COMMIT (serialization failure)"
                )
        try:
            intent = write_publish_intent(
                self.catalog.store, self.catalog.warehouse, txn_id, handles.values()
            )
        except BaseException:
            # nothing decided, nothing published: discard all staging
            for h2 in handles.values():
                try:
                    h2.txn_discard()
                except Exception:  # noqa: BLE001 — best-effort cleanup
                    pass
            raise
        applied = set()
        try:
            for name, h in handles.items():
                h.txn_apply()
                applied.add(name)
        except BaseException:
            if intent is None:
                for name, h in handles.items():
                    if name not in applied:
                        try:
                            h.txn_discard()
                        except Exception:  # noqa: BLE001 — best-effort cleanup
                            pass
            # with an intent on disk the COMMIT is decided: leave it for
            # recovery to roll the remaining tables forward
            raise
        if intent is not None:
            self.catalog.store.delete(intent)

    def _txn_rollback(self):
        if self._txn is None:
            raise ValueError("ROLLBACK outside a transaction")
        handles, self._txn, self._txn_id = self._txn, None, None
        for h in handles.values():
            h.txn_discard()

    # -- entry point --------------------------------------------------------

    def sql(self, stmt: str):
        """Execute one statement, recording a QUERY_HISTORY row with
        the pruning metrics the docs monitor (docs/09:181-194):
        partitions/files/bytes scanned vs total, harvested from the
        per-scan log of every table handle the statement touched."""
        import datetime as _dt
        import time as _time

        start = _time.time()
        text = stmt.strip().rstrip(";").strip()
        cached = self._cache_lookup(text)
        if cached is not None:
            out, handles, cache_hit = cached, [], True
        else:
            mark = len(self._stmt_handles)
            out = self._sql_inner(stmt)
            handles, self._stmt_handles[mark:] = self._stmt_handles[mark:], []
            cache_hit = False
        scans = [e for h in handles for e in getattr(h, "_scan_log", [])]
        m = re.match(r"[A-Za-z]+", text)
        qtype = (m.group(0).upper() if m else "?")
        if qtype == "WITH":
            qtype = "SELECT"
        self._history.append(
            (
                str(len(self._history) + 1),
                text,
                qtype,
                _dt.datetime.fromtimestamp(start),
                sum(e.get("partitions_scanned", 0) for e in scans) if scans else None,
                sum(e.get("partitions_total", 0) for e in scans) if scans else None,
                sum(e.get("files_scanned", 0) for e in scans) if scans else None,
                sum(e.get("files_total", 0) for e in scans) if scans else None,
                sum(e.get("bytes_scanned", 0) for e in scans) if scans else None,
                sum(e.get("bytes_total", 0) for e in scans) if scans else None,
                None,  # rows_produced: results are lazy, never forced here
                cache_hit,
            )
        )
        if qtype in ("CREATE", "ALTER", "DROP", "UNDROP", "USE"):
            # DDL can change what a statement text MEANS without moving
            # any snapshot pointer (view redefinitions, column renames —
            # a schema-evolution commit bumps the metadata version but
            # not current-snapshot-id): drop every retained result
            self._result_cache.clear()
            self._known_rels = None
        if isinstance(out, DataFrame):
            # RESULT_SCAN surface: retain the (lazy) result plan by id
            self._results[str(len(self._history))] = out
            if not cache_hit and qtype == "SELECT":
                self._cache_store(text, out, handles)
        elif isinstance(out, Snapshot):
            # BEFORE(STATEMENT) surface: remember what this DML committed
            self._stmt_snapshots[str(len(self._history))] = out.snapshot_id
        return out

    def _sql_inner(self, stmt: str):
        s = stmt.strip().rstrip(";").strip()
        u = s.upper()
        if re.match(r"(?i)^BEGIN(\s+(TRANSACTION|WORK))?$", s):
            return self._txn_begin()
        if re.match(r"(?i)^COMMIT(\s+WORK)?$", s):
            return self._txn_commit()
        if re.match(r"(?i)^ROLLBACK(\s+WORK)?$", s):
            return self._txn_rollback()
        if self._txn is not None and not re.match(
            r"(?i)^(INSERT|DELETE|UPDATE|MERGE|SELECT|WITH|SHOW|DESCRIBE)\b", s
        ):
            raise ValueError(
                "only DML and queries are allowed inside a multi-statement "
                "transaction; DDL and maintenance are autocommit "
                "(docs/08-acid-transactions.md:143-165)"
            )
        if u.startswith("CREATE") and re.match(
            r"(?i)CREATE(\s+OR\s+REPLACE)?\s+(ICEBERG\s+)?TABLE\b", s
        ):
            return self._create(s)
        if re.match(r"(?i)CREATE(\s+OR\s+REPLACE)?\s+EXTERNAL\s+VOLUME", s):
            return self._create_external_volume(s)
        if re.match(r"(?i)CREATE(\s+OR\s+REPLACE)?\s+CATALOG\s+INTEGRATION", s):
            return self._create_catalog_integration(s)
        if re.match(r"(?i)SHOW\s+EXTERNAL\s+VOLUMES", s):
            return local_df(self.spark, 
                [(v,) for v in self.catalog.list_external_volumes()], "name string"
            )
        if re.match(r"(?i)SHOW\s+CATALOG\s+INTEGRATIONS", s):
            return local_df(self.spark, 
                [(v,) for v in self.catalog.list_catalog_integrations()], "name string"
            )
        if re.match(r"(?i)SHOW\s+TASKS", s):
            # scheduler-maintained run state surfaces here (docs/10:174-183)
            rows = []
            for n in self.catalog._list_objects("tasks"):
                t = self.catalog._get_object("tasks", n)
                rows.append(
                    (
                        n,
                        t.get("state"),
                        t.get("schedule"),
                        t.get("after"),
                        t.get("last_run_ms"),
                        t.get("next_run_ms"),
                        t.get("last_error"),
                    )
                )
            return local_df(self.spark, 
                rows,
                "name string, state string, schedule string, after string,"
                " last_run_ms long, next_run_ms long, last_error string",
            )
        if re.match(r"(?i)DESCRIBE\s+EXTERNAL\s+VOLUME", s):
            v = self.catalog.get_external_volume(s.split()[-1])
            rows = [
                (f"storage_location[{i}].{k}", str(val))
                for i, loc in enumerate(v["storage_locations"])
                for k, val in loc.items()
            ]
            return local_df(self.spark, rows, "property string, value string")
        if re.match(r"(?i)DESCRIBE\s+CATALOG\s+INTEGRATION", s):
            v = self.catalog.get_catalog_integration(s.split()[-1])
            return local_df(self.spark, 
                [(k, str(val)) for k, val in v.items()], "property string, value string"
            )
        if u.startswith("INSERT"):
            return self._insert(s)
        if u.startswith("DELETE"):
            return self._delete(s)
        if u.startswith("UPDATE"):
            return self._update(s)
        if u.startswith("MERGE"):
            return self._merge(s)
        if re.match(r"(?i)ALTER\s+ICEBERG\s+TABLE", s):
            return self._alter(s)
        if re.match(r"(?i)CREATE\s+DATABASE", s):
            # docs/04:100-101: database optionally linked to a catalog
            # integration — the namespace half of catalog-linked mode
            m = re.match(
                r"(?i)CREATE\s+DATABASE\s+([\w]+)(?:\s+CATALOG\s*=\s*'([^']*)')?", s
            )
            name, integ = m.group(1), m.group(2)
            if integ:
                self.catalog.get_catalog_integration(integ)  # must exist
            return self.catalog._put_object(
                "databases", name, {"name": name, "catalog": integ}, replace=True
            )
        if re.match(r"(?i)USE\s+DATABASE", s):
            name = s.split()[-1]
            self.catalog._get_object("databases", name)  # must exist
            self._database = name
            return None
        if re.match(r"(?i)DESCRIBE\s+TABLE\b", s):
            # docs/03:168: column structure (vs DESCRIBE ICEBERG TABLE's
            # properties view)
            t = self._table(self._resolve_name(s.split()[-1]))
            return local_df(self.spark, 
                [
                    (f.name, f.type, "Y" if not f.required else "N")
                    for f in t.meta.schema.fields
                ],
                "name string, type string, nullable string",
            )
        if re.match(r"(?i)DESCRIBE\s+ICEBERG\s+TABLE", s):
            name = s.split()[-1]
            d = self._table(self._resolve_name(name)).describe()
            return local_df(self.spark, 
                [(k, str(v)) for k, v in d.items()], "property string, value string"
            )
        if re.match(r"(?i)SHOW\s+ICEBERG\s+TABLES", s):
            lm = re.search(r"(?i)\bLIKE\s+'([^']*)'", s)
            names = self.catalog.list_tables()
            if lm:
                pat = re.compile(
                    "^" + lm.group(1).replace("%", ".*").replace("_", ".") + "$",
                    re.IGNORECASE,
                )
                names = [n for n in names if pat.match(n) or pat.match(n.split(".")[-1])]
            return local_df(self.spark, [(t,) for t in names], "name string")
        if re.match(r"(?i)SHOW\s+PARAMETERS", s):
            return self._show_parameters(s)
        if re.match(
            r"(?i)CREATE(\s+OR\s+REPLACE)?\s+MATERIALIZED\s+ICEBERG\s+VIEW", s
        ):
            return self._create_materialized_view(s)
        if re.match(r"(?i)REFRESH\s+MATERIALIZED\s+VIEW\b", s):
            name = s.split()[-1]
            if not self._is_materialized(name):
                raise ValueError(f"{name} is not a materialized view")
            doc = self._refresh_mv(name)
            return local_df(self.spark, 
                [(doc["storage"], doc["refreshed-at-ms"])],
                "storage string, refreshed_at_ms long",
            )
        if re.match(r"(?i)DESCRIBE\s+MATERIALIZED\s+VIEW\b", s):
            name = s.split()[-1]
            if not self._is_materialized(name):
                raise ValueError(f"{name} is not a materialized view")
            return local_df(self.spark, 
                self._mv_freshness(name),
                "base_location string, pinned_snapshot long,"
                " current_snapshot long, fresh boolean",
            )
        if re.match(r"(?i)CREATE(\s+OR\s+REPLACE)?\s+ICEBERG\s+VIEW", s):
            return self._create_iceberg_view(s)
        if re.match(r"(?i)ALTER\s+ICEBERG\s+VIEW\s+[\w.]+\s+REPLACE\s+AS\b", s):
            m = re.match(
                r"(?i)ALTER\s+ICEBERG\s+VIEW\s+([\w.]+)\s+REPLACE\s+AS\s+(.*)",
                s,
                re.DOTALL,
            )
            # ALTER is the incremental form: schema-compat is enforced
            # (CREATE OR REPLACE is the explicit full redefinition)
            self._persistent_view(m.group(1)).replace(m.group(2).strip())
            if self._is_materialized(m.group(1)):
                # an MV stays an MV: the changed definition must
                # re-materialize or reads would serve the OLD
                # definition's data under the new contract
                self._refresh_mv(m.group(1))
            return None
        if re.match(r"(?i)DESCRIBE\s+ICEBERG\s+VIEW\b", s):
            return self._persistent_view(s.split()[-1]).versions()
        if re.match(r"(?i)CREATE(\s+OR\s+REPLACE)?\s+VIEW", s):
            return self._create_view(s)
        if re.match(r"(?i)CREATE(\s+OR\s+REPLACE)?\s+TASK", s):
            return self._create_task(s)
        if re.match(r"(?i)ALTER\s+TASK", s):
            m = re.match(r"(?i)ALTER\s+TASK\s+([\w.]+)\s+(RESUME|SUSPEND)", s)
            t = self.catalog._get_object("tasks", m.group(1))
            t["state"] = "started" if m.group(2).upper() == "RESUME" else "suspended"
            return self.catalog._put_object("tasks", m.group(1), t, replace=True)
        if re.match(r"(?i)EXECUTE\s+TASK", s):
            return self._execute_task(s.split()[-1])
        if re.match(r"(?i)UNDROP\s+ICEBERG\s+TABLE", s):
            return self.catalog.undrop_table(s.split()[-1])
        if re.match(r"(?i)DROP\s+ICEBERG\s+TABLE", s):
            m = re.match(r"(?i)DROP\s+ICEBERG\s+TABLE\s+([\w.]+)(\s+PURGE)?", s)
            return self.catalog.drop_table(
                self._resolve_name(m.group(1)), purge=bool(m.group(2))
            )
        # everything else (SELECT, WITH, ...) → resolve + delegate
        return self._select(s)

    # -- CREATE EXTERNAL VOLUME / CATALOG INTEGRATION -----------------------

    @staticmethod
    def _parse_kv(body: str) -> dict:
        """KEY = 'value' | KEY = BARE  pairs (Snowflake object DDL)."""
        # findall yields '' (not None) for the non-participating branch
        return {
            k.upper(): (q or bare)
            for k, q, bare in re.findall(
                r"(?i)\b(\w+)\s*=\s*(?:'([^']*)'|([\w.\-:/]+))", body
            )
            if k.upper() != "STORAGE_LOCATIONS"
        }

    def _create_external_volume(self, s: str):
        """docs/01:174-180 verbatim: STORAGE_LOCATIONS = ((...), ...)."""
        m = re.match(
            r"(?i)CREATE(\s+OR\s+REPLACE)?\s+EXTERNAL\s+VOLUME\s+([\w.]+)\s*(.*)",
            s,
            re.DOTALL,
        )
        replace, name, rest = bool(m.group(1)), m.group(2), m.group(3)
        lm = re.search(r"(?i)STORAGE_LOCATIONS\s*=\s*\(", rest)
        locations = []
        if lm:
            body, _ = _balanced(rest, lm.end() - 1)
            locations = [self._parse_kv(g) for g in re.findall(r"\(([^()]*)\)", body)]
        return self.catalog.create_external_volume(name, locations, replace=replace)

    def _create_catalog_integration(self, s: str):
        """docs/04:58-93 verbatim: Glue / Iceberg-REST property bags."""
        m = re.match(
            r"(?i)CREATE(\s+OR\s+REPLACE)?\s+CATALOG\s+INTEGRATION\s+([\w.]+)\s*(.*)",
            s,
            re.DOTALL,
        )
        replace, name, rest = bool(m.group(1)), m.group(2), m.group(3)
        return self.catalog.create_catalog_integration(
            name, self._parse_kv(rest), replace=replace
        )

    # -- CREATE -------------------------------------------------------------

    def _create(self, s: str):
        m = re.match(
            r"(?i)CREATE(\s+OR\s+REPLACE)?\s+(ICEBERG\s+)?TABLE(\s+IF\s+NOT\s+EXISTS)?\s+([\w.]+)\s*(.*)",
            s,
            re.DOTALL,
        )
        replace, iceberg, if_not_exists, name, rest = (
            m.group(1),
            bool(m.group(2)),
            m.group(3),
            m.group(4),
            m.group(5).strip(),
        )
        if "." not in name and self._database:
            name = f"{self._database}.{name}"  # USE DATABASE default
        # plain CREATE TABLE (docs/12:151-156 'native' hot table): same
        # table layer, marked native; CLUSTER BY → clustering property
        extra_props: dict[str, str] = {} if iceberg else {"table_type": "native"}
        cm = re.search(r"(?i)\bCLUSTER\s+BY\s*\(", rest)
        if cm:
            body, _end = _balanced(rest, cm.end() - 1)
            extra_props["cluster_by"] = ",".join(
                f"{c}:{tr}" for c, tr in _parse_partition_by(body)
            )
            rest = rest[: cm.start()] + rest[_end:]
        if self.catalog.table_exists(name):
            if if_not_exists:
                return self._table(name)
            if replace:
                self.catalog.drop_table(name, purge=True)
            else:
                raise ValueError(f"table {name!r} exists")
        partition_by = None
        pm = re.search(r"(?i)\bPARTITION\s+BY\s*\(", rest)
        if pm:
            body, _end = _balanced(rest, pm.end() - 1)
            partition_by = _parse_partition_by(body)
            rest = rest[: pm.start()] + rest[_end:]
        # CTAS?
        am = re.search(r"(?i)\bAS\s+(SELECT|WITH)\b", rest)
        if am:
            df = self._select(rest[am.start() + 2 :].strip())
            t = self.catalog.create_table(name, df.schema, partition_by=partition_by)
            if extra_props:
                t.set_properties(**extra_props)
            t.append(df)
            return t
        if not rest.startswith("("):
            # docs/04:69-72,86-93: columnless CREATE linking an externally-
            # cataloged table via CATALOG_TABLE_NAME.  Validate the named
            # objects, then stop at the documented offline seam.
            lm = re.findall(
                r"(?i)\b(CATALOG|EXTERNAL_VOLUME|CATALOG_TABLE_NAME)\s*=\s*'([^']*)'",
                rest,
            )
            link = {k.upper(): v for k, v in lm}
            if "CATALOG_TABLE_NAME" in link:
                integ = {}
                if "CATALOG" in link:
                    integ = self.catalog.get_catalog_integration(link["CATALOG"])
                if "EXTERNAL_VOLUME" in link:
                    self.catalog.get_external_volume(link["EXTERNAL_VOLUME"])
                uri = integ.get("CATALOG_URI")
                source = str(integ.get("CATALOG_SOURCE", "")).upper()
                if uri and ("REST" in source or not source):
                    # docs/04:77-93: resolve the table through the
                    # Iceberg REST protocol client (restcat.py) and
                    # address it locally under the CREATE's name
                    from .restcat import RestCatalog, RestCatalogClient

                    ref = link["CATALOG_TABLE_NAME"]
                    ns, _, tbl = ref.rpartition(".")
                    ns = ns or str(integ.get("CATALOG_NAMESPACE", "default"))
                    rc = RestCatalog(
                        self.spark,
                        self.catalog.warehouse,
                        RestCatalogClient(uri),
                        ns,
                    )
                    t = rc.load_table(tbl)
                    self._linked[name] = t
                    return t
                if "GLUE" in source:
                    # docs/04:58-76: resolve through the Glue Data
                    # Catalog protocol client (gluecat.py).  The
                    # endpoint comes from GLUE_ENDPOINT (the AWS SDK's
                    # standard endpoint override) — real AWS would add
                    # SigV4 in the client transport.
                    endpoint = integ.get("GLUE_ENDPOINT") or uri
                    if not endpoint:
                        raise NotImplementedError(
                            "GLUE integration needs GLUE_ENDPOINT (offline "
                            "loopback) or network AWS access — validated "
                            f"integration {link.get('CATALOG')!r}"
                        )
                    from .gluecat import GlueCatalog, GlueCatalogClient

                    ref = link["CATALOG_TABLE_NAME"]
                    db, _, tbl = ref.rpartition(".")
                    db = db or str(integ.get("CATALOG_NAMESPACE", "default"))
                    gc = GlueCatalog(
                        self.spark,
                        self.catalog.warehouse,
                        GlueCatalogClient(
                            endpoint,
                            catalog_id=integ.get("GLUE_CATALOG_ID"),
                        ),
                        db,
                    )
                    t = gc.load_table(tbl)
                    self._linked[name] = t
                    return t
                raise NotImplementedError(
                    "external integration needs CATALOG_URI (REST) or "
                    "GLUE_ENDPOINT (Glue) — validated integration "
                    f"{link.get('CATALOG')!r}"
                )
            raise ValueError(f"expected column list in {s[:60]!r}")
        body, end = _balanced(rest, 0)
        # trailing clauses (CATALOG=, EXTERNAL_VOLUME=, BASE_LOCATION=,
        # TBLPROPERTIES) are catalog bindings we note as properties
        props = dict(
            re.findall(r"(?i)\b(CATALOG|EXTERNAL_VOLUME|BASE_LOCATION)\s*=\s*'([^']*)'", rest[end:])
        )
        # CREATE-time TBLPROPERTIES ('k'='v', ...) — same pairs ALTER
        # SET TBLPROPERTIES accepts, applied at birth (so e.g.
        # write.delete.mode governs the table's FIRST delete too)
        tp = re.search(r"(?i)TBLPROPERTIES\s*\(", rest[end:])
        tbl_props: dict[str, str] = {}
        if tp:
            body_tp, _ = _balanced(rest[end:], tp.end() - 1)
            tbl_props = dict(re.findall(r"'([^']+)'\s*=\s*'([^']*)'", body_tp))
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(_parse_columns(body))
        t = self.catalog.create_table(name, schema, partition_by=partition_by)
        merged = {**{k.lower(): v for k, v in props.items()}, **tbl_props, **extra_props}
        if merged:
            t.set_properties(**merged)
        return t

    # -- INSERT -------------------------------------------------------------

    def _insert(self, s: str):
        m = re.match(
            r"(?i)INSERT\s+INTO\s+([\w.]+)\s*(\(([^)]*)\))?\s*(.*)", s, re.DOTALL
        )
        name, cols, rest = m.group(1), m.group(3), m.group(4).strip()
        t = self._dml_table(self._resolve_name(name))
        names = [f.name for f in t.meta.schema.fields]
        target = _split_top(cols) if cols else names
        if re.match(r"(?i)VALUES\b", rest):
            df = self.spark.sql(f"SELECT * FROM {rest} AS _v({', '.join(target)})")
        else:
            # ANSI: INSERT INTO ... SELECT maps POSITIONALLY
            df = self._select(rest)
            if len(df.columns) != len(target):
                raise ValueError(
                    f"INSERT column count mismatch: {len(df.columns)} vs {len(target)}"
                )
            df = df.toDF(*target)
        # align to schema: missing columns NULL, everything cast
        out = df.select(
            *[
                (F.col(f.name) if f.name in df.columns else F.lit(None)).cast(
                    f.spark_type()
                ).alias(f.name)
                for f in t.meta.schema.fields
            ]
        )
        return t.append(out)

    # -- DELETE / UPDATE ----------------------------------------------------

    def _dml_predicate(self, where: str):
        """Parse a DML WHERE into the pruning language, falling back to
        an opaque Spark-evaluated predicate for shapes the language
        refuses (function calls like DATEADD/CURRENT_DATE, arithmetic —
        docs/12:179-186 uses exactly these).  The fallback prunes
        nothing and proves nothing; correctness is unchanged."""
        from .expr import OpaqueSql

        try:
            return parse_predicate(where)
        except ValueError:
            return OpaqueSql(where)

    def _delete(self, s: str):
        m = re.match(r"(?i)DELETE\s+FROM\s+([\w.]+)(\s+WHERE\s+(.*))?$", s, re.DOTALL)
        t = self._dml_table(self._resolve_name(m.group(1)))
        pred = self._dml_predicate(m.group(3) or "")
        return t.delete(pred)

    def _update(self, s: str):
        m = re.match(
            r"(?i)UPDATE\s+([\w.]+)\s+SET\s+(.*?)(\s+WHERE\s+(.*))?$", s, re.DOTALL
        )
        t = self._dml_table(self._resolve_name(m.group(1)))
        assignments = {}
        for a in _split_top(m.group(2)):
            am = re.match(r"([\w$]+)\s*=\s*(.*)", a.strip(), re.DOTALL)
            assignments[am.group(1)] = F.expr(am.group(2))
        pred = self._dml_predicate(m.group(4) or "")
        return t.update(pred, assignments)

    # -- MERGE --------------------------------------------------------------

    def _merge(self, s: str):
        m = re.match(
            r"(?i)MERGE\s+INTO\s+([\w.]+)(?:\s+(?:AS\s+)?(\w+))?\s+USING\s+"
            r"(\((?:[^()]|\([^()]*\))*\)|[\w.]+)(?:\s+(?:AS\s+)?(\w+))?\s+ON\s+(.*?)"
            r"(?=\s+WHEN\s)(.*)$",
            s,
            re.DOTALL,
        )
        if not m:
            raise ValueError("unsupported MERGE form")
        tname, talias, src_sql, salias, on_sql, clauses = m.groups()
        talias, salias = talias or "t", salias or "s"
        t = self._dml_table(self._resolve_name(tname))
        if src_sql.startswith("("):
            src = self._select(src_sql[1:-1].strip())
        else:
            try:
                src = self._table(self._resolve_name(src_sql)).toDF()
            except ValueError:
                self._register_tables(src_sql)
                src = self.spark.table(src_sql)

        def rewrite(expr_sql: str) -> str:
            e = re.sub(rf"(?i)\b{talias}\.([\w$]+)", r"_t_\1", expr_sql)
            return re.sub(rf"(?i)\b{salias}\.([\w$]+)", r"_s_\1", e)

        on_keys = []
        for part in re.split(r"(?i)\s+AND\s+", on_sql.strip()):
            km = re.fullmatch(
                rf"(?i)\s*(?:{talias}\.([\w$]+)\s*=\s*{salias}\.([\w$]+)"
                rf"|{salias}\.([\w$]+)\s*=\s*{talias}\.([\w$]+))\s*",
                part,
            )
            if not km:
                raise ValueError(f"MERGE ON must be equi-join on aliases: {part!r}")
            tk = km.group(1) or km.group(4)
            sk = km.group(2) or km.group(3)
            if tk != sk:
                src = src.withColumnRenamed(sk, tk)
            on_keys.append(tk)

        kwargs: dict = {"when_not_matched_insert": False}
        for cm in re.finditer(
            r"(?i)WHEN\s+(NOT\s+)?MATCHED(?:\s+AND\s+(.*?))?\s+THEN\s+"
            r"(DELETE|UPDATE\s+SET\s+(.*?)|INSERT(?:\s*\(([^)]*)\))?\s*VALUES\s*\(((?:[^()]|\([^()]*\))*)\))"
            r"(?=\s*WHEN\s|\s*$)",
            clauses,
            re.DOTALL,
        ):
            not_matched, cond, action, set_sql, ins_cols, ins_vals = (
                cm.group(1), cm.group(2), cm.group(3).strip(), cm.group(4),
                cm.group(5), cm.group(6),
            )
            if not_matched:
                kwargs["when_not_matched_insert"] = True
                if ins_vals:
                    # docs/12:121-125 write INSERT VALUES (...) with no
                    # column list → positional against the target schema
                    names = (
                        _split_top(ins_cols)
                        if ins_cols
                        else [f.name for f in t.meta.schema.fields]
                    )
                    vals = _split_top(ins_vals)
                    for n, v in zip(names, vals):
                        v = re.sub(rf"(?i)\b{salias}\.([\w$]+)", r"\1", v)
                        if v.strip() != n:
                            src = src.withColumn(n, F.expr(v))
            elif action.upper() == "DELETE":
                if cond:
                    kwargs["when_matched_delete_condition"] = F.expr(rewrite(cond))
                else:
                    kwargs["when_matched_delete"] = True
            else:  # UPDATE SET
                if cond:
                    raise ValueError("conditional matched-UPDATE not supported")
                upd = {}
                for a in _split_top(set_sql):
                    am = re.match(rf"(?i)(?:{talias}\.)?([\w$]+)\s*=\s*(.*)", a.strip(), re.DOTALL)
                    rhs = rewrite(am.group(2))
                    # bare identifiers in the rhs default to the source side
                    rhs = re.sub(
                        r"(?<![\w.$_])([A-Za-z_][\w$]*)(?!\s*\()(?![\w.$])",
                        lambda b: f"_s_{b.group(1)}"
                        if b.group(1) in src.columns
                        else b.group(1),
                        rhs,
                    )
                    upd[am.group(1)] = F.expr(rhs)
                kwargs["when_matched_update"] = upd
        # target columns absent from the source insert as typed NULLs
        # (the docs' INSERT (id, value) VALUES (...) names a subset)
        for f in t.meta.schema.fields:
            if f.name not in src.columns:
                src = src.withColumn(f.name, F.lit(None).cast(f.spark_type()))
        return t.merge(src, on=on_keys, **kwargs)

    # -- ALTER --------------------------------------------------------------

    def _alter(self, s: str):
        m = re.match(r"(?i)ALTER\s+ICEBERG\s+TABLE\s+([\w.]+)\s+(.*)$", s, re.DOTALL)
        t = self._table(self._resolve_name(m.group(1)))
        rest = m.group(2).strip()
        u = rest.upper()
        if u.startswith("ADD COLUMN"):
            am = re.match(r"(?i)ADD\s+COLUMN\s+([\w$]+)\s+(.*?)(\s+AFTER\s+([\w$]+))?$", rest)
            return t.add_column(am.group(1), _map_type(am.group(2)), after=am.group(4))
        if u.startswith("DROP COLUMN"):
            return t.drop_column(rest.split()[-1])
        if u.startswith("RENAME COLUMN"):
            am = re.match(r"(?i)RENAME\s+COLUMN\s+([\w$]+)\s+TO\s+([\w$]+)", rest)
            return t.rename_column(am.group(1), am.group(2))
        if re.match(r"(?i)ALTER\s+COLUMN", rest):
            am = re.match(
                r"(?i)ALTER\s+COLUMN\s+([\w$]+)\s+(?:SET\s+DATA\s+)?TYPE\s+(.*)$", rest
            )
            return t.widen_column(am.group(1), _map_type(am.group(2)))
        if u.startswith("EXPORT ICEBERG METADATA"):
            # [ext] dialect verb so CREATE TASK can schedule a
            # spec-format export (iceberg_export.py) that follows
            # commits — external engines track the version hint
            from .iceberg_export import export_iceberg

            dm = re.search(r"(?i)\bTO\s+'([^']+)'", rest)
            fm = re.search(r"(?i)\bFORMAT_VERSION\s*=\s*(\d+)", rest)
            return export_iceberg(
                t,
                dest=dm.group(1) if dm else None,
                format_version=int(fm.group(1)) if fm else None,
            )
        if u.startswith("COMPACT"):  # docs write both COMPACT and COMPACT DATA
            am = re.search(r"(?i)TARGET_FILE_SIZE(?:_BYTES)?\s*=\s*(\d+)", rest)
            wm = re.search(r"(?i)\sWHERE\s+(.*)$", rest, re.DOTALL)
            return maintenance.compact(
                t,
                target_file_size=int(am.group(1)) if am else 128 * 1024 * 1024,
                where=parse_predicate(wm.group(1)) if wm else None,
            )
        if u.startswith("EXPIRE SNAPSHOTS"):
            om = re.search(r"(?i)OLDER_THAN\s*(?:=>|=)?\s*(?:TIMESTAMP\s*)?'([^']+)'", rest)
            rm = re.search(r"(?i)RETAIN[_\s]LAST\s*(?:=>|=)?\s*(\d+)", rest)
            older = None
            if om:
                import datetime as _dt

                older = int(
                    _dt.datetime.fromisoformat(om.group(1)).timestamp() * 1000
                )
            elif rm:
                # RETAIN_LAST alone means "keep only the last N now",
                # not "apply the retention-days age gate first"
                import time as _time

                older = int(_time.time() * 1000) + 1
            return maintenance.expire_snapshots(
                t, older_than_ms=older, retain_last=int(rm.group(1)) if rm else 1
            )
        if u.startswith("CONVERT TO SPEC PRIMARY"):
            # [ext] docs/11:112-120 — metadata-only migration of a
            # native table to the shared spec-file tree
            return maintenance.convert_to_spec_primary(t)
        if u.startswith("CHERRY-PICK SNAPSHOT") or u.startswith("CHERRYPICK SNAPSHOT"):
            # [ext] docs/05:169-171 — apply one branch commit onto main
            am = re.search(r"(?i)SNAPSHOT\s+(\d+)", rest)
            return t.cherry_pick(int(am.group(1)))
        if u.startswith("ANALYZE"):
            # [ext] docs/04-catalog-systems.md:45 "Automatic statistics
            # collection" made explicit: compute + persist the
            # snapshot-keyed NDV/duplication stat (icepack/stats.py)
            # for the named columns
            cm = re.search(r"(?i)COLUMNS?\s*\(([^)]*)\)", rest) or re.search(
                r"(?i)COLUMNS?\s+(.+)$", rest
            )
            if re.match(r"(?i)ANALYZE\s+PARTITIONS", rest):
                # persist the snapshot's partition-statistics file
                # (Iceberg spec "Partition Statistics"; icepack/stats.py)
                from .stats import write_partition_stats

                path = write_partition_stats(t)
                return local_df(self.spark, 
                    [(path,)], "statistics_path string"
                )
            if not cm:
                raise ValueError("ANALYZE requires COLUMNS (a, b, ...)")
            cols = [c.strip().strip('"') for c in cm.group(1).split(",") if c.strip()]
            rows = [
                (c, round(t.duplication_ratio(c, refresh=True), 4)) for c in cols
            ]
            return local_df(self.spark, 
                rows, "column string, duplication_ratio double"
            )
        if u.startswith("OPTIMIZE"):
            # one-command maintenance [ext]: run exactly what
            # table_health recommends (maintenance.optimize)
            import json as _json

            rep = maintenance.optimize(t, dry_run="DRY RUN" in u)
            return local_df(self.spark, 
                [(_json.dumps(rep["actions"]), _json.dumps(rep["health_after"]))],
                "actions string, health_after string",
            )
        if u.startswith("REWRITE MANIFESTS"):
            return maintenance.rewrite_manifests(t)
        if u.startswith("REWRITE DELETES TO DELETION VECTORS"):
            # v3 MOR consolidation [ext]: position tombstones → roaring
            # deletion vectors (maintenance.write_deletion_vectors)
            return maintenance.write_deletion_vectors(t)
        if u.startswith("REWRITE DELETES"):  # back to v2 parquet form
            return maintenance.rewrite_position_deletes(t)
        if u.startswith("REMOVE ORPHAN FILES"):
            return maintenance.remove_orphan_files(t)
        if re.match(r"(?i)SET\s+TBLPROPERTIES", rest):
            props = dict(re.findall(r"'([^']+)'\s*=\s*'([^']*)'", rest))
            return t.set_properties(**props)
        sm = re.match(r"(?i)SET\s+([\w.]+)\s*=\s*(.+)$", rest)
        if sm:
            key, val = sm.group(1), sm.group(2).strip().strip("'")
            # docs/08:108-110: the merge-on-read switch
            if key.upper() == "ENABLE_ICEBERG_MERGE_ON_READ":
                mor = "merge-on-read" if val.upper() in ("TRUE", "1") else "copy-on-write"
                return t.set_properties(
                    **{
                        "write.delete.mode": mor,
                        "write.update.mode": mor,
                        "write.merge.mode": mor,
                    }
                )
            return t.set_properties(**{key.lower(): val})
        raise ValueError(f"unsupported ALTER: {rest[:60]!r}")

    # -- SELECT (delegation with resolution) --------------------------------

    @staticmethod
    def _rewrite_variant_paths(s: str) -> str:
        """Snowflake VARIANT path extraction (docs/12:96-104):
        ``payload:a.b::TYPE`` → ``CAST(get_json_object(payload, '$.a.b')
        AS type)``; ``::MAP(K, V)`` → typed ``from_json``.  ``::`` casts
        themselves are Spark-native and left alone; string literals are
        protected from rewriting."""
        parts = re.split(r"('(?:[^']|'')*')", s)  # odd indices = literals

        def repl(m: re.Match) -> str:
            colv, path, typ = m.group(1), m.group(2), m.group(3)
            get = f"get_json_object({colv}, '$.{path}')"
            if not typ:
                return get
            mm = re.fullmatch(r"(?i)MAP\s*\(\s*(\w+)\s*,\s*(\w+)\s*\)", typ)
            if mm:
                return (
                    f"from_json({get}, 'map<{mm.group(1).lower()},{mm.group(2).lower()}>')"
                )
            return f"CAST({get} AS {typ})"

        pat = re.compile(
            r"\b([A-Za-z_]\w*):(?!:)([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)"
            r"(?:::([A-Za-z_]+(?:\(\s*\w+\s*,\s*\w+\s*\))?))?"
        )
        for i in range(0, len(parts), 2):
            parts[i] = pat.sub(repl, parts[i])
        return "".join(parts)

    def _select(self, s: str) -> DataFrame:
        s = self._rewrite_variant_paths(s)
        # 1. time-travel clauses → snapshot-pinned temp views.  The
        # WHERE-conjunct pruning ordinary SELECTs get (docs/09:17-44)
        # applies here too — the file list just comes from the PINNED
        # snapshot's manifests.  Mis-assignment is impossible for the
        # same reason as in _register_tables: a conjunct routes only
        # when exactly one referenced schema owns its columns, and a
        # column name shared across FROM items is an ambiguous
        # reference Spark rejects before any scan runs.
        tt_handles: dict = {}
        for pat in (_AT, _BEFORE):
            for m in pat.finditer(s):
                try:
                    rn = self._resolve_name(m.group(2))
                    tt_handles[rn] = self._table(rn)
                except Exception:  # not a catalog table (view, etc.)
                    pass
        tt_preds = self._select_scan_predicates(s, tt_handles) if tt_handles else {}

        def _at(m: re.Match) -> str:
            kw, name, alias, kind, val = m.groups()
            t = self._table(self._resolve_name(name))
            kind = kind.upper()
            val = val.strip().strip("'")
            val = re.sub(r"(?i)^TIMESTAMP\s*'", "", val).strip("'")
            if kind == "SNAPSHOT":
                snap = t.as_of(snapshot_id=int(val))
            elif kind == "OFFSET":  # seconds relative to now
                import time as _time

                snap = t.as_of(timestamp_ms=int((_time.time() + float(val)) * 1000))
            else:  # TIMESTAMP
                import datetime as _dt

                ts = _dt.datetime.fromisoformat(val.replace("::TIMESTAMP", ""))
                snap = t.as_of(timestamp_ms=int(ts.timestamp() * 1000))
            vn = self._fresh_view(
                t.toDF(tt_preds.get(self._resolve_name(name)), snapshot=snap), "at"
            )
            return f"{m.group(1)} {vn}{alias or ''}"

        def _before(m: re.Match) -> str:
            kw, name, alias, kind, val = m.groups()
            t = self._table(self._resolve_name(name))
            val = val.strip().strip("'")
            if kind.upper() == "STATEMENT":
                # docs/05:66-72 — the table state BEFORE query <id> ran:
                # the snapshot that statement COMMITTED, stepped back to
                # its parent (a statement that committed nothing to this
                # table has no BEFORE point — fail loudly)
                sid = self._stmt_snapshots.get(val)
                if sid is None:
                    raise ValueError(
                        f"BEFORE(STATEMENT => {val!r}): query id unknown or "
                        "committed no snapshot (retained: "
                        f"{sorted(self._stmt_snapshots)})"
                    )
                snap = t.as_of(snapshot_id=sid)
            else:
                snap = t.as_of(snapshot_id=int(val))
            parent = snap.parent_snapshot_id
            if parent is None:
                raise ValueError("BEFORE the first snapshot")
            vn = self._fresh_view(
                t.toDF(
                    tt_preds.get(self._resolve_name(name)),
                    snapshot=t.as_of(snapshot_id=parent),
                ),
                "before",
            )
            return f"{kw} {vn}{alias or ''}"

        s = _AT.sub(_at, s)
        s = _BEFORE.sub(_before, s)

        # 2. metadata relations table$FILES etc. → temp views
        def _meta(m: re.Match) -> str:
            name, rel = m.group(1), m.group(2).upper()
            t = self._table(self._resolve_name(name))
            df = {
                "SNAPSHOTS": t.snapshots,
                "FILES": t.files,
                "MANIFESTS": t.manifests,
                "PARTITIONS": t.partitions,
                "PARTITION_STATS": t.partition_stats,
                "HISTORY": t.history,
                "REFS": t.refs,
            }[rel]()
            return self._fresh_view(df, rel.lower())

        s = _META_REL.sub(_meta, s)

        def _info(m: re.Match) -> str:
            rel, name = m.group(1).upper(), m.group(2)
            t = self._table(self._resolve_name(name))
            df = {"SNAPSHOTS": t.snapshots, "MANIFESTS": t.manifests, "FILES": t.files}[rel]()
            return self._fresh_view(df, rel.lower())

        s = _INFO_SCHEMA.sub(_info, s)

        if _QUERY_HISTORY.search(s):
            s = _QUERY_HISTORY.sub(self._fresh_view(self._query_history_df(), "query_history"), s)
        if _IS_TABLES.search(s):
            s = _IS_TABLES.sub(self._fresh_view(self._tables_df(), "is_tables"), s)

        def _rscan(m: re.Match) -> str:
            qid = m.group(1) or str(len(self._history))  # LAST_QUERY_ID()
            df = self._results.get(qid)
            if df is None:
                raise ValueError(
                    f"RESULT_SCAN: no retained result for query id {qid!r} "
                    f"(retained: {sorted(self._results)})"
                )
            return self._fresh_view(df, "result_scan")

        s = _RESULT_SCAN.sub(_rscan, s)

        # SYSTEM$GET_ICEBERG_TABLE_INFORMATION('t') (docs/03:171)
        im = re.fullmatch(
            r"(?i)SELECT\s+SYSTEM\$GET_ICEBERG_TABLE_INFORMATION\s*\(\s*'([^']+)'\s*\)\s*",
            s,
        )
        if im:
            d = self._table(self._resolve_name(im.group(1))).describe()
            return local_df(self.spark, 
                [(k, str(v)) for k, v in d.items()], "property string, value string"
            )

        # SYSTEM$CLUSTERING_INFORMATION('t' [, '(c1, c2)']) (docs/07:168-173)
        cm = re.fullmatch(
            r"(?i)SELECT\s+SYSTEM\$CLUSTERING_INFORMATION\s*\(\s*'([^']+)'"
            r"\s*(?:,\s*'\(?\s*([^')]*?)\s*\)?'\s*)?\)\s*",
            s,
        )
        if cm:
            import json as _json

            from .maintenance import clustering_information

            t = self._table(self._resolve_name(cm.group(1)))
            cols = [c.strip() for c in (cm.group(2) or "").split(",") if c.strip()]
            info = clustering_information(t, cols or None)
            return local_df(self.spark, 
                [(_json.dumps(info),)], "clustering_information string"
            )

        # 3. CREATE VIEW references → re-materialize (views track their
        # base tables' CURRENT snapshots) and flatten dotted names
        for vname, vsql in list(self._views.items()):
            flat = vname.replace(".", "_")
            pat = rf"(?i)\b({re.escape(vname)}|{re.escape(flat)})\b"
            if re.search(pat, s):
                self._select(vsql).createOrReplaceTempView(flat)
                s = re.sub(pat, flat, s)
        # 3b. persistent ICEBERG VIEW references — resolved from the
        # warehouse's view trees, so a fresh session sees definitions
        # another session committed; session views (above) shadow them
        shadowed = {v.replace(".", "_") for v in self._views}
        for vname in self._pview_names():
            if vname in shadowed:
                continue
            pat = rf"(?i)\b{re.escape(vname)}\b"
            if re.search(pat, s):
                pv = self._persistent_view(vname)
                if self._is_materialized(vname):
                    # serve the MATERIALIZATION (possibly stale — that
                    # is what an on-demand MV means; DESCRIBE exposes
                    # freshness); mv.refresh-on-read=true in the view
                    # properties opts into refresh when any base moved
                    if pv.meta.get("properties", {}).get(
                        "mv.refresh-on-read"
                    ) == "true" and not all(
                        f[3] for f in self._mv_freshness(vname)
                    ):
                        self._refresh_mv(vname)
                    bt = IceTable.load(
                        self.spark, self._mv_doc(vname)["storage"]
                    )
                    # track the backing table as a resolved handle so a
                    # DOWNSTREAM materialization pins it (an MV over an
                    # MV judges freshness against the upstream's
                    # current backing snapshot)
                    self._stmt_handles.append(bt)
                    bt.toDF().createOrReplaceTempView(vname)
                else:
                    self._select(pv.sql_for()).createOrReplaceTempView(vname)

        # 4. plain icepack table names → temp views; delegate
        s = self._register_tables(s)
        return self.spark.sql(s)

    def _query_history_df(self) -> DataFrame:
        """TABLE(INFORMATION_SCHEMA.QUERY_HISTORY()) (docs/09:181-194):
        the session's statements with Iceberg pruning metrics — the
        monitoring loop the docs drive off partitions_scanned vs
        partitions_total."""
        return local_df(self.spark, 
            self._history,
            "query_id string, query_text string, query_type string,"
            " start_time timestamp, partitions_scanned long,"
            " partitions_total long, files_scanned long, files_total long,"
            " bytes_scanned long, bytes_total long, rows_produced long,"
            " cache_hit boolean",
        )

    def _tables_df(self) -> DataFrame:
        """TABLE(INFORMATION_SCHEMA.TABLES) (docs/11:160-166): catalog
        tables (plus linked external-catalog tables) with format info."""
        rows = []
        for n in self.catalog.list_tables():
            t = self.catalog.load_table(n)
            rows.append(
                (
                    n.rsplit(".", 1)[-1].upper(),
                    n,
                    "ICEBERG",
                    t.meta.format_version if hasattr(t.meta, "format_version") else 2,
                    t.location,
                )
            )
        for alias, t in self._linked.items():
            rows.append((alias.upper(), alias, "ICEBERG", 2, t.location))
        return local_df(self.spark, 
            rows,
            "table_name string, qualified_name string, table_format string,"
            " format_version int, location string",
        )

    # -- views / tasks / parameters (docs/12:169-186, docs/10:174-183,
    #    docs/05:94) ---------------------------------------------------------

    def _create_view(self, s: str):
        m = re.match(
            r"(?i)CREATE(\s+OR\s+REPLACE)?\s+VIEW\s+([\w.]+)\s+AS\s+(.*)", s, re.DOTALL
        )
        name, body = m.group(2), m.group(3).strip()
        self._select(body)  # validate eagerly (names resolve, SQL parses)
        self._views[name] = body
        return None

    # -- persistent versioned views (Iceberg view spec; icepack/views.py)

    def _pview_dir(self, name: str) -> str:
        import os as _os

        return _os.path.join(self._warehouse, "__views__", name.replace(".", "_"))

    def _pview_names(self) -> list[str]:
        import glob as _g
        import os as _os

        root = _os.path.join(self._warehouse, "__views__")
        return sorted(
            _os.path.basename(p)
            for p in _g.glob(_os.path.join(root, "*"))
            if _os.path.exists(_os.path.join(p, "metadata", "version-hint.text"))
        )

    def _persistent_view(self, name: str):
        from .views import IceView

        key = name.replace(".", "_")
        if key not in self._pviews:
            self._pviews[key] = IceView.load(
                self.spark, self._pview_dir(name), resolver=self._select
            )
        else:
            self._pviews[key].refresh()  # track cross-session replaces
        return self._pviews[key]

    # -- materialized views (docs/12-lakehouse-patterns.md:260: "Cache
    #    frequently accessed Gold tables: consider materialized views")

    def _mv_doc_path(self, name: str) -> str:
        import os as _os

        return _os.path.join(self._pview_dir(name), "metadata", "mv.json")

    def _mv_doc(self, name: str) -> dict:
        import json as _json

        with open(self._mv_doc_path(name)) as fh:
            return _json.load(fh)

    def _is_materialized(self, name: str) -> bool:
        import os as _os

        return _os.path.exists(self._mv_doc_path(name))

    def _refresh_mv(self, name: str) -> dict:
        """(Re)materialize: run the view's CURRENT definition, write a
        fresh backing Iceberg table, atomically swap the ``mv.json``
        pointer at it, and PIN the snapshot id of every base table the
        definition read — freshness is later judged by comparing pins
        against the bases' current snapshots.  Storage generations are
        removed with a ONE-GENERATION LAG: refresh N deletes generation
        N-2, never the generation the pointer just left — a concurrent
        session (or a lazily-evaluated DataFrame resolved before this
        refresh) may still be scanning N-1, and deleting files under an
        in-flight scan fails it or silently truncates its result.  A
        crash between data write and pointer swap leaves the previous
        materialization intact (stale-but-consistent, the safe
        direction)."""
        import json as _json
        import os as _os
        import shutil as _shutil
        import time as _time
        import uuid as _uuid

        pv = self._persistent_view(name)
        mark = len(self._stmt_handles)
        df = self._select(pv.sql_for())
        pins = {}
        for t in self._stmt_handles[mark:]:
            snap = t.meta.current_snapshot
            pins[t.location] = snap.snapshot_id if snap else 0
        sloc = _os.path.join(
            self._pview_dir(name), f"storage-{_uuid.uuid4().hex[:12]}"
        )
        bt = IceTable.create(self.spark, sloc, df.schema)
        bt.append(df)
        old = stale = None
        if self._is_materialized(name):
            prev_doc = self._mv_doc(name)
            old = prev_doc.get("storage")
            stale = prev_doc.get("previous-storage")
        doc = {
            "storage": sloc,
            "previous-storage": old,  # kept one refresh for live readers
            "pins": pins,
            "refreshed-at-ms": int(_time.time() * 1000),
            "view-version": pv.meta["current-version-id"],
        }
        tmp = self._mv_doc_path(name) + f".tmp{_os.getpid()}"
        with open(tmp, "w") as fh:
            _json.dump(doc, fh)
        _os.replace(tmp, self._mv_doc_path(name))  # atomic pointer swap
        if stale and stale not in (old, sloc):
            _shutil.rmtree(stale, ignore_errors=True)
        return doc

    def _mv_freshness(self, name: str) -> list[tuple]:
        """[(base location, pinned snapshot, current snapshot, fresh)]

        A pin on another MV's backing table needs one extra check: the
        backing GENERATION itself.  Refreshing the upstream swaps its
        doc at a new storage dir while the pinned old generation stays
        on disk one more refresh (the reader-safety lag), so comparing
        snapshot ids inside the pinned dir would report fresh forever —
        a superseded generation is stale by definition."""
        import json as _json
        import os as _os

        doc = self._mv_doc(name)
        out = []
        for loc, pinned in sorted(doc.get("pins", {}).items()):
            if _os.path.basename(loc).startswith("storage-"):
                owner_doc = _os.path.join(
                    _os.path.dirname(loc), "metadata", "mv.json"
                )
                try:
                    with open(owner_doc) as fh:
                        if _json.load(fh).get("storage") != loc:
                            out.append((loc, pinned, None, False))
                            continue
                except (OSError, ValueError):
                    pass  # not an MV generation after all: fall through
            try:
                cur = IceTable.load(self.spark, loc).meta.current_snapshot
                cur_id = cur.snapshot_id if cur else 0
            except FileNotFoundError:
                cur_id = None
            out.append((loc, pinned, cur_id, cur_id == pinned))
        return out

    def _create_materialized_view(self, s: str):
        """CREATE [OR REPLACE] MATERIALIZED ICEBERG VIEW <name> AS
        <select> [ext, docs/12:260]: a versioned view (same Iceberg
        view-spec tree as CREATE ICEBERG VIEW) plus a materialized
        backing table, refreshed on demand (``REFRESH MATERIALIZED
        VIEW``).  Reads serve the MATERIALIZED data — possibly stale,
        by definition of an on-demand MV; staleness is first-class via
        DESCRIBE MATERIALIZED VIEW, and the table property
        ``mv.refresh-on-read=true`` opts into auto-refresh when any
        base table moved."""
        import os as _os

        from .views import IceView

        m = re.match(
            r"(?i)CREATE(\s+OR\s+REPLACE)?\s+MATERIALIZED\s+ICEBERG\s+VIEW"
            r"\s+([\w.]+)\s+AS\s+(.*)",
            s,
            re.DOTALL,
        )
        replace, name, body = m.group(1), m.group(2), m.group(3).strip()
        loc = self._pview_dir(name)
        exists = _os.path.exists(
            _os.path.join(loc, "metadata", "version-hint.text")
        )
        if exists:
            if not replace:
                raise ValueError(f"materialized view {name} already exists")
            self._persistent_view(name).replace(body, allow_incompatible=True)
        else:
            IceView.create(
                self.spark,
                loc,
                body,
                properties={"materialized": "true"},
                resolver=self._select,
            )
            self._pviews.pop(name.replace(".", "_"), None)
        self._refresh_mv(name)
        return None

    def _create_iceberg_view(self, s: str):
        """CREATE [OR REPLACE] ICEBERG VIEW <name> AS <select>: a
        PERSISTENT versioned view (docs/12:168-172's CREATE VIEW,
        stored in the public Iceberg view-spec shape so the definition
        history survives the session and other engines can resolve
        it).  OR REPLACE on an existing view appends a version —
        history stays queryable via DESCRIBE ICEBERG VIEW /
        IceView.toDF(version_id)."""
        import os as _os

        from .views import IceView

        m = re.match(
            r"(?i)CREATE(\s+OR\s+REPLACE)?\s+ICEBERG\s+VIEW\s+([\w.]+)\s+AS\s+(.*)",
            s,
            re.DOTALL,
        )
        replace, name, body = m.group(1), m.group(2), m.group(3).strip()
        loc = self._pview_dir(name)
        exists = _os.path.exists(
            _os.path.join(loc, "metadata", "version-hint.text")
        )
        if exists:
            if not replace:
                raise ValueError(f"iceberg view {name} already exists")
            v = self._persistent_view(name)
            # OR REPLACE is the explicit full-redefinition form —
            # schema compatibility is the caller's stated intent
            v.replace(body, allow_incompatible=True)
            if self._is_materialized(name):
                # replacing with a PLAIN view demotes the MV — leaving
                # mv.json behind would keep serving the OLD
                # definition's materialization for the NEW definition
                import shutil as _shutil

                doc = self._mv_doc(name)
                _os.remove(self._mv_doc_path(name))
                _shutil.rmtree(doc.get("storage", ""), ignore_errors=True)
            return None
        IceView.create(self.spark, loc, body, resolver=self._select)
        self._pviews.pop(name.replace(".", "_"), None)
        return None

    def _create_task(self, s: str):
        """CREATE TASK ... SCHEDULE = '...' AS <body>: stored, not
        scheduled — the engine has no daemon (SURVEY §2.10 M7); EXECUTE
        TASK runs the body on demand, which is what an external
        scheduler would invoke on the CRON tick."""
        m = re.match(
            r"(?i)CREATE(\s+OR\s+REPLACE)?\s+TASK\s+([\w.]+)\s+(.*?)\bAS\b(.*)",
            s,
            re.DOTALL,
        )
        replace, name, head, body = m.groups()
        am = re.search(r"(?i)\bAFTER\s+([\w.]+)", head)
        head = re.sub(r"(?i)\bAFTER\s+[\w.]+", "", head)
        props = self._parse_kv(re.sub(r"(?i)SCHEDULE\s*=\s*'[^']*'", "", head))
        sm = re.search(r"(?i)SCHEDULE\s*=\s*'([^']*)'", head)
        if sm:  # validate the schedule at CREATE time, not first tick
            from .scheduler import Schedule

            Schedule(sm.group(1))
        task = {
            "name": name,
            "schedule": sm.group(1) if sm else None,
            "body": body.strip(),
            "state": "suspended",  # Snowflake tasks start suspended
            **({"after": am.group(1)} if am else {}),
            **{k.lower(): v for k, v in props.items()},
        }
        return self.catalog._put_object("tasks", name, task, replace=bool(replace))

    def _execute_task(self, name: str):
        task = self.catalog._get_object("tasks", name)
        body = task["body"].strip().rstrip(";")
        bm = re.match(r"(?i)^BEGIN\b(.*)\bEND$", body, re.DOTALL)
        stmts = (bm.group(1) if bm else body).split(";")
        results = [self.sql(st) for st in stmts if st.strip()]
        return results[-1] if results else None

    def _show_parameters(self, s: str):
        """SHOW PARAMETERS [LIKE 'pat'] IN TABLE t (docs/05:94)."""
        m = re.match(
            r"(?i)SHOW\s+PARAMETERS(?:\s+LIKE\s+'([^']*)')?\s+IN\s+TABLE\s+([\w.]+)", s
        )
        like, name = m.group(1), m.group(2)
        t = self._table(self._resolve_name(name))
        params = {"DATA_RETENTION_TIME_IN_DAYS": "1"}  # Snowflake default
        params.update({k.upper(): str(v) for k, v in t.meta.properties.items()})
        if like:
            pat = re.compile(
                "^" + like.replace("%", ".*").replace("_", ".") + "$", re.IGNORECASE
            )
            params = {k: v for k, v in params.items() if pat.match(k)}
        return local_df(self.spark, 
            sorted(params.items()), "key string, value string"
        )


def _balanced(s: str, start: int) -> tuple[str, int]:
    """Return (inner, end_index_after_close) for the paren group
    opening at ``start``."""
    assert s[start] == "("
    depth = 0
    for i in range(start, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return s[start + 1 : i], i + 1
    raise ValueError("unbalanced parentheses")
