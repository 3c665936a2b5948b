"""Multi-statement transactions for managed tables (SURVEY.md D6,
docs/08-acid-transactions.md:143-165).

The reference distinguishes managed tables ("multi-statement
transactions supported via Snowflake") from externally-cataloged ones
("autocommit only").  This module is the managed-table mechanism,
built from the write-audit-publish machinery the table layer already
has (branch refs + fast-forward, docs/05:150-172):

- ``BEGIN`` starts a transaction in :class:`icepack.sql.IceSQL`.
- The first WRITE to each table stages a hidden branch
  ``__txn_<id>`` at the snapshot the transaction first saw; every
  subsequent statement's commits advance ONLY that branch, so
  concurrent readers of main never observe partial transaction state.
- Reads of a written table inside the transaction resolve against the
  branch head — read-your-writes — while tables the transaction never
  writes are read from main as usual.
- ``COMMIT`` fast-forwards main to each staged branch head (one atomic
  pointer CAS per table — a reader sees none or all of that table's
  staged statements) and drops the branch.  If a concurrent writer
  advanced main past the transaction's base, fast-forward refuses
  (main is no longer an ancestor) and the transaction aborts — a
  serialization failure, not silent lost updates.
- ``ROLLBACK`` drops the branches; the staged snapshots become
  unreferenced and are collected by the normal expire/orphan sweeps.

Scope notes, mirroring the reference's own caveats: atomicity is
PER TABLE (each fast-forward is one CAS); a multi-table COMMIT applies
tables sequentially, so a crash mid-COMMIT can leave a prefix of
tables published — the same partial-publish window Snowflake closes
only for fully managed tables.  DDL inside a transaction is rejected
(autocommit), and externally-cataloged (linked) tables cannot join a
transaction at all (docs/08:150-165: "autocommit only").

A table with NO snapshot yet cannot carry a branch ref (refs must
point at a snapshot), so the first staged write on an empty table
first commits an EMPTY genesis snapshot to main — visible content is
unchanged (zero rows before and after) — and branches from it.
"""

from __future__ import annotations

from .metadata import Snapshot
from .table import CommitConflict, IceTable, _scan_report


class TxnTable(IceTable):
    """A transaction's handle on one managed table: reads pinned to the
    staged branch (or the transaction's base snapshot before any write
    commits), writes redirected to the branch."""

    def __init__(self, spark, location, meta, branch: str, store=None):
        super().__init__(spark, location, meta, store=store)
        self._txn_branch = branch
        self._txn_base_sid = meta.current_snapshot_id

    @staticmethod
    def from_table(base: IceTable, branch: str) -> "TxnTable":
        t = TxnTable(base.spark, base.location, base.meta, branch, store=base.store)
        t._version = base._version  # commit CAS continues from the base
        return t

    # -- read view: branch head, else the pinned base -----------------------

    def _txn_head(self) -> Snapshot | None:
        r = self.meta.refs.get(self._txn_branch)
        if r is not None:
            return self.meta.snapshot_by_id(r["snapshot-id"])
        if self._txn_base_sid is not None:
            return self.meta.snapshot_by_id(self._txn_base_sid)
        return None

    def live_files(self, snapshot=None, content: str = "data"):
        snap = snapshot or self._txn_head()
        return [] if snap is None else super().live_files(snap, content)

    def plan_files(self, predicate=None, snapshot=None):
        snap = snapshot or self._txn_head()
        if snap is None:
            return [], _scan_report([], [])
        return super().plan_files(predicate, snap)

    def toDF(self, predicate=None, snapshot=None):
        snap = snapshot or self._txn_head()
        if snap is None:
            return self.spark.createDataFrame([], self.meta.schema.to_struct())
        return super().toDF(predicate, snap)

    # -- write seam: every commit lands on the staged branch ----------------

    def _ensure_branch(self) -> None:
        for _ in range(5):
            if self._txn_branch in self.meta.refs:
                return
            if self.meta.current_snapshot_id != self._txn_base_sid:
                raise CommitConflict(
                    f"table at {self.location} changed since the transaction "
                    "first read it; aborting (serialization failure)"
                )
            try:
                if self._txn_base_sid is None:
                    # empty table: refs need a snapshot, so stage an
                    # empty genesis on main (content unchanged: 0 rows)
                    snap = IceTable._commit_snapshot(self, "append", [])
                    self._txn_base_sid = snap.snapshot_id
                self.create_branch(self._txn_branch, self._txn_base_sid)
                return
            except CommitConflict:
                self.refresh()
        raise CommitConflict("could not stage transaction branch after retries")

    def _commit_snapshot(
        self,
        operation,
        new_entries,
        replaced_paths=None,
        max_retries: int = 5,
        branch=None,
        extra_summary=None,
    ):
        self._ensure_branch()
        return super()._commit_snapshot(
            operation,
            new_entries,
            replaced_paths,
            max_retries,
            branch or self._txn_branch,
            extra_summary,
        )

    # -- transaction outcome ------------------------------------------------

    def txn_apply(self) -> None:
        """COMMIT this table: fast-forward main to the staged branch
        head (one CAS — readers see none or all) and drop the branch.
        No-op if the transaction never wrote the table."""
        if self._txn_branch not in self.meta.refs:
            return
        for _ in range(5):
            try:
                self.fast_forward(self._txn_branch)
                break
            except CommitConflict:
                self.refresh()
        else:
            raise CommitConflict("transaction publish lost the pointer race")
        self._txn_drop_branch()

    def txn_discard(self) -> None:
        """ROLLBACK this table: drop the staged branch (staged
        snapshots become unreferenced; expire/orphan sweeps collect
        them)."""
        if self._txn_branch in self.meta.refs:
            self._txn_drop_branch()

    def _txn_drop_branch(self) -> None:
        for _ in range(5):
            try:
                self.drop_ref(self._txn_branch)
                return
            except CommitConflict:
                self.refresh()
        raise CommitConflict("could not drop transaction branch after retries")
