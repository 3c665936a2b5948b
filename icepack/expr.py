"""Predicate expressions for scan planning.

A tiny expression language (``col("ts") >= lit(...)``, ``&``/``|``/
``~``) that can be:

1. converted to a Spark Column (the *full* filter is always re-applied
   in the DataFrame — pruning is an optimization, never a correctness
   dependency, SURVEY.md §4);
2. evaluated against a data file's min/max/null-count stats
   (phase-2 file pruning, docs/09-query-performance.md:33-44) with
   three-valued semantics: returns False only when the file provably
   contains no matching row;
3. projected through partition transforms onto partition tuples
   (phase-1 partition pruning over hidden partitioning,
   docs/09-query-performance.md:19-31 + docs/07-partitioning.md:19-40).

Unknown columns, missing stats, or non-projectable shapes always fall
back to "keep" — the planner can only ever select a superset.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------


def _norm(v):
    """Normalize literals for comparison (timestamps → datetime)."""
    if isinstance(v, str):
        try:
            return _dt.datetime.fromisoformat(v)
        except ValueError:
            return v
    return v


def _cmp_norm(a, b):
    """Compare two literals of possibly mixed date/str encodings."""
    na, nb = _norm(a), _norm(b)
    if isinstance(na, _dt.datetime) and isinstance(nb, _dt.date) and not isinstance(
        nb, _dt.datetime
    ):
        nb = _dt.datetime(nb.year, nb.month, nb.day)
    if isinstance(nb, _dt.datetime) and isinstance(na, _dt.date) and not isinstance(
        na, _dt.datetime
    ):
        na = _dt.datetime(na.year, na.month, na.day)
    return na, nb


def _isnan(v) -> bool:
    return isinstance(v, float) and v != v


def _lt(a, b):
    if _isnan(a) or _isnan(b):
        return None  # NaN bounds are garbage: unknown, never prune
    a, b = _cmp_norm(a, b)
    try:
        return a < b
    except TypeError:
        return None


def _le(a, b):
    if _isnan(a) or _isnan(b):
        return None
    a, b = _cmp_norm(a, b)
    try:
        return a <= b
    except TypeError:
        return None


def _eq(a, b):
    a, b = _cmp_norm(a, b)
    return a == b


class Expr:
    def __and__(self, other: "Expr") -> "Expr":
        return And(self, other)

    def __or__(self, other: "Expr") -> "Expr":
        return Or(self, other)

    def __invert__(self) -> "Expr":
        return self.negate()

    def negate(self) -> "Expr":
        return AlwaysTrue()  # safe fallback: unknown negation keeps everything

    # interface ------------------------------------------------------------
    def to_column(self) -> Column:
        raise NotImplementedError

    def may_match_file(self, stats: dict, record_count: int) -> bool:
        """True unless the file's stats prove no row matches."""
        return True

    def all_match_file(self, stats: dict, record_count: int) -> bool:
        """True only if the stats PROVE every row matches (the dual of
        may_match): lets DELETE drop whole files without reading them
        (partition-aligned deletes at 100 TB = metadata-only).
        Conservative default: False."""
        return False

    def references(self) -> set[str]:
        return set()


@dataclass
class AlwaysTrue(Expr):
    def to_column(self) -> Column:
        return F.lit(True)

    def all_match_file(self, stats: dict, record_count: int) -> bool:
        return True


@dataclass
class ColumnRef:
    name: str

    # comparison builders
    def __lt__(self, v) -> "Cmp":
        return Cmp(self.name, "<", v)

    def __le__(self, v) -> "Cmp":
        return Cmp(self.name, "<=", v)

    def __gt__(self, v) -> "Cmp":
        return Cmp(self.name, ">", v)

    def __ge__(self, v) -> "Cmp":
        return Cmp(self.name, ">=", v)

    def __eq__(self, v) -> "Cmp":  # type: ignore[override]
        return Cmp(self.name, "=", v)

    def __ne__(self, v) -> "Cmp":  # type: ignore[override]
        return Cmp(self.name, "!=", v)

    def isin(self, *vs) -> "In":
        return In(self.name, list(vs[0]) if len(vs) == 1 and isinstance(vs[0], (list, tuple, set)) else list(vs))

    def is_null(self) -> "IsNull":
        return IsNull(self.name)

    def is_not_null(self) -> "NotNull":
        return NotNull(self.name)


def col(name: str) -> ColumnRef:
    return ColumnRef(name)


def lit(v):
    return v


@dataclass
class Cmp(Expr):
    name: str
    op: str
    value: object

    def negate(self) -> Expr:
        flip = {"<": ">=", "<=": ">", ">": "<=", ">=": "<", "=": "!=", "!=": "="}
        return Cmp(self.name, flip[self.op], self.value)

    def to_column(self) -> Column:
        c, v = F.col(self.name), F.lit(self.value)
        return {
            "<": c < v,
            "<=": c <= v,
            ">": c > v,
            ">=": c >= v,
            "=": c == v,
            "!=": c != v,
        }[self.op]

    def references(self) -> set[str]:
        return {self.name}

    def may_match_file(self, stats: dict, record_count: int) -> bool:
        s = stats.get(self.name)
        if not s:
            return True
        lo, hi = s.get("min"), s.get("max")
        nulls = s.get("nulls", 0)
        if lo is None or hi is None:
            return True
        if nulls == record_count:
            return False  # all null: no comparison matches
        v = self.value
        if self.op == "<":
            r = _lt(lo, v)
        elif self.op == "<=":
            r = _le(lo, v)
        elif self.op == ">":
            r = _lt(v, hi)
        elif self.op == ">=":
            r = _le(v, hi)
        elif self.op == "=":
            a, b = _le(lo, v), _le(v, hi)
            r = None if a is None or b is None else (a and b)
        elif self.op == "!=":
            # prunable only if every row equals v
            if _eq(lo, hi) and _eq(lo, v) and nulls == 0:
                return False
            return True
        else:
            return True
        return True if r is None else bool(r)


    def all_match_file(self, stats: dict, record_count: int) -> bool:
        s = stats.get(self.name)
        if not s:
            return False
        lo, hi, nulls = s.get("min"), s.get("max"), s.get("nulls", 0)
        if lo is None or hi is None or nulls is None or nulls > 0:
            return False  # NULLs never satisfy a comparison
        if isinstance(lo, float) or isinstance(hi, float) or isinstance(self.value, float):
            # floating-point columns can hold NaN, and parquet bounds
            # EXCLUDE NaN (measured: [NaN, 99.0] harvests 99.0..99.0) —
            # so bounds can never PROVE every row matches: x = 99 would
            # "all-match" that file and a metadata-only DELETE would
            # drop the NaN row, which matches nothing.  may_match stays
            # float-enabled (NaN satisfies no comparison, so excluding
            # it from ranges never loses a matching row).
            return False
        v = self.value
        if self.op == "<":
            r = _lt(hi, v)
        elif self.op == "<=":
            r = _le(hi, v)
        elif self.op == ">":
            r = _lt(v, lo)
        elif self.op == ">=":
            r = _le(v, lo)
        elif self.op == "=":
            r = _eq(lo, hi) and _eq(lo, v)
        elif self.op == "!=":
            a, b = _lt(hi, v), _lt(v, lo)
            r = (a or b) if (a is not None and b is not None) else None
        else:
            return False
        return bool(r) if r is not None else False


@dataclass
class In(Expr):
    name: str
    values: list

    def to_column(self) -> Column:
        return F.col(self.name).isin(self.values)

    def references(self) -> set[str]:
        return {self.name}

    def may_match_file(self, stats: dict, record_count: int) -> bool:
        # Large numeric In lists (MERGE pruning collects up to 100k
        # keys per column) take a sorted+bisect fast path: O(log n)
        # per file instead of O(n) — a 50k-file driver-mode plan under
        # a 100k-value In is otherwise billions of Python compares.
        # Exact-same semantics as the per-value walk for the gated
        # shape (all-finite numbers both sides; _cmp_norm is identity
        # there); every other shape falls through unchanged.
        if len(self.values) >= 32:
            s = stats.get(self.name)
            if not s:
                return True
            lo, hi = s.get("min"), s.get("max")
            if lo is None or hi is None:
                return True
            if s.get("nulls", 0) == record_count:
                return False
            nums = self._sorted_nums()
            if (
                nums is not None
                and type(lo) in (int, float)
                and type(hi) in (int, float)
                and lo == lo
                and hi == hi
            ):
                import bisect

                i = bisect.bisect_left(nums, lo)
                return i < len(nums) and nums[i] <= hi
        return any(Cmp(self.name, "=", v).may_match_file(stats, record_count) for v in self.values)

    def _sorted_nums(self):
        """Sorted copy of the values when they are ALL finite ints/
        floats (bool excluded — bool compares as int but is a distinct
        literal type elsewhere); None otherwise.  Cached per instance."""
        if "_numcache" not in self.__dict__:
            ok = all(type(v) in (int, float) and v == v for v in self.values)
            self.__dict__["_numcache"] = sorted(self.values) if ok else None
        return self.__dict__["_numcache"]

    def all_match_file(self, stats: dict, record_count: int) -> bool:
        return any(
            Cmp(self.name, "=", v).all_match_file(stats, record_count) for v in self.values
        )


@dataclass
class IsNull(Expr):
    name: str

    def negate(self) -> Expr:
        return NotNull(self.name)

    def to_column(self) -> Column:
        return F.col(self.name).isNull()

    def references(self) -> set[str]:
        return {self.name}

    def may_match_file(self, stats: dict, record_count: int) -> bool:
        s = stats.get(self.name)
        if not s or s.get("nulls") is None:
            return True  # unknown null count (statistics-less column): keep
        return s["nulls"] > 0

    def all_match_file(self, stats: dict, record_count: int) -> bool:
        s = stats.get(self.name)
        return bool(s) and s.get("nulls") == record_count


@dataclass
class NotNull(Expr):
    name: str

    def negate(self) -> Expr:
        return IsNull(self.name)

    def to_column(self) -> Column:
        return F.col(self.name).isNotNull()

    def references(self) -> set[str]:
        return {self.name}

    def may_match_file(self, stats: dict, record_count: int) -> bool:
        s = stats.get(self.name)
        if not s or s.get("nulls") is None:
            return True  # unknown null count: keep
        return s["nulls"] < record_count

    def all_match_file(self, stats: dict, record_count: int) -> bool:
        s = stats.get(self.name)
        return bool(s) and s.get("nulls") == 0


@dataclass
class And(Expr):
    left: Expr
    right: Expr

    def negate(self) -> Expr:
        return Or(self.left.negate(), self.right.negate())

    def to_column(self) -> Column:
        return self.left.to_column() & self.right.to_column()

    def references(self) -> set[str]:
        return self.left.references() | self.right.references()

    def may_match_file(self, stats: dict, record_count: int) -> bool:
        return self.left.may_match_file(stats, record_count) and self.right.may_match_file(
            stats, record_count
        )

    def all_match_file(self, stats: dict, record_count: int) -> bool:
        return self.left.all_match_file(stats, record_count) and self.right.all_match_file(
            stats, record_count
        )


@dataclass
class Or(Expr):
    left: Expr
    right: Expr

    def negate(self) -> Expr:
        return And(self.left.negate(), self.right.negate())

    def to_column(self) -> Column:
        return self.left.to_column() | self.right.to_column()

    def references(self) -> set[str]:
        return self.left.references() | self.right.references()

    def may_match_file(self, stats: dict, record_count: int) -> bool:
        return self.left.may_match_file(stats, record_count) or self.right.may_match_file(
            stats, record_count
        )

    def all_match_file(self, stats: dict, record_count: int) -> bool:
        # sufficient, not necessary (a disjunction can cover a file
        # jointly without either side covering it alone) — conservative
        return self.left.all_match_file(stats, record_count) or self.right.all_match_file(
            stats, record_count
        )


# ---------------------------------------------------------------------------
# partition projection (hidden partitioning)
# ---------------------------------------------------------------------------


def project_to_partition(expr: Expr, spec, schema, spark=None) -> Expr:
    """Rewrite a predicate over natural columns into one over partition
    values (docs/07-partitioning.md:19-40).  Monotone transforms map
    range predicates to range predicates on the transformed value
    (``t`` truncates, so ``c > v`` → ``p >= t(v)`` etc.); bucket maps
    equality/IN only.  Anything non-projectable becomes AlwaysTrue
    (scan that partition — safe superset)."""
    from . import transforms as _tr

    by_source: dict[str, list] = {}
    for pf in spec.fields:
        src = schema.field_by_id(pf.source_id)
        if src is not None:
            by_source.setdefault(src.name, []).append(pf)

    def walk(e: Expr) -> Expr:
        if isinstance(e, And):
            return And(walk(e.left), walk(e.right))
        if isinstance(e, Or):
            return Or(walk(e.left), walk(e.right))
        if isinstance(e, Cmp) and e.name in by_source:
            parts: Expr | None = None
            for pf in by_source[e.name]:
                t = _tr.parse(pf.transform)
                src = schema.field_by_id(pf.source_id)
                try:
                    tv = t.apply(
                        e.value, spark, src.spark_type() if src else None
                    )
                except (TypeError, ValueError):
                    tv = None
                if tv is None:
                    continue
                if e.op in ("=",):
                    p: Expr = Cmp(pf.name, "=", tv)
                elif e.op in (">", ">=") and t.monotone:
                    p = Cmp(pf.name, ">=", tv)
                elif e.op in ("<", "<=") and t.monotone:
                    p = Cmp(pf.name, "<=", tv)
                else:
                    continue
                parts = p if parts is None else And(parts, p)
            return parts if parts is not None else AlwaysTrue()
        if isinstance(e, In) and e.name in by_source:
            parts = None
            for pf in by_source[e.name]:
                t = _tr.parse(pf.transform)
                src = schema.field_by_id(pf.source_id)
                try:
                    tvs = [
                        t.apply(v, spark, src.spark_type() if src else None)
                        for v in e.values
                    ]
                except (TypeError, ValueError):
                    continue
                if any(v is None for v in tvs):
                    continue
                p = In(pf.name, sorted(set(tvs), key=repr))
                parts = p if parts is None else And(parts, p)
            return parts if parts is not None else AlwaysTrue()
        return AlwaysTrue()

    return walk(expr)


def partition_tuple_matches(pexpr: Expr, partition: dict) -> bool:
    """Evaluate a projected predicate against a concrete partition
    tuple (treating each value as both min and max)."""
    stats = {k: {"min": v, "max": v, "nulls": 0} for k, v in partition.items()}
    return pexpr.may_match_file(stats, record_count=1)


def manifest_may_match(descriptor: dict, proj_for_spec) -> bool:
    """Phase-1 MANIFEST-LEVEL skip test: judged only from the
    manifest-list summary (docs/03:77-92, docs/09:19-31), can any entry
    of this manifest match the projected predicate?  ``proj_for_spec``
    maps spec-id → projected Expr (built lazily by the caller; None for
    an unknown spec).

    Conservative by refusal: a summary missing any skip-safety key
    (older layout), entries the ranges can't describe (unpartitioned
    files from pre-evolution specs, null partition values), or an
    unknown spec all KEEP the manifest — pruning may only ever lose
    effectiveness, never rows.  Null counts are reported as unknown so
    IsNull/NotNull projections (if a future projection emits them)
    keep the manifest too."""
    summ = descriptor.get("partition-summaries")
    if (
        not summ
        or descriptor.get("unpartitioned-files") is None
        or descriptor["unpartitioned-files"] > 0
        or descriptor.get("null-partition-values", 1) > 0
        or descriptor.get("delete-content-files", 1) > 0
        or not descriptor.get("spec-ids")
    ):
        return True
    stats = {
        k: {"min": v.get("min"), "max": v.get("max"), "nulls": None}
        for k, v in summ.items()
    }
    for sid in descriptor["spec-ids"]:
        proj = proj_for_spec(sid)
        if proj is None or proj.may_match_file(stats, 1):
            return True
    return False


@dataclass
class OpaqueSql(Expr):
    """A predicate only Spark can evaluate (function calls, arithmetic —
    shapes outside the pruning language).  Conservative everywhere:
    prunes nothing (may_match always true), proves nothing (all_match
    always false — no metadata-only deletes), routes nowhere
    (references unknown).  Correctness never depended on pruning, so
    DML over an opaque WHERE simply reads/rewrites more files."""

    sql: str

    def to_column(self) -> Column:
        return F.expr(self.sql)

    def negate(self) -> "Expr":
        return OpaqueSql(f"NOT ({self.sql})")

    def references(self) -> set[str]:
        return set()

    def may_match_file(self, stats: dict, record_count: int) -> bool:
        return True

    def all_match_file(self, stats: dict, record_count: int) -> bool:
        return False
