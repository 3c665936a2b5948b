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

Multi-table COMMIT atomicity (docs/08-acid-transactions.md:143-165):
each table's publish is one CAS, and tables apply sequentially — so a
bare crash mid-COMMIT would leave a prefix of tables published.  The
PUBLISH-INTENT record closes that window with write-ahead decide +
roll-forward recovery:

1. COMMIT first re-validates every staged table's fast-forward
   precondition (abort cleanly — nothing published — if a concurrent
   writer moved any table past the transaction's base);
2. for 2+ staged tables it then durably writes
   ``<warehouse>/_txn_intents/<txn-id>.json`` naming every (table
   location, branch, target snapshot) — the transaction is now
   DECIDED;
3. the per-table fast-forwards run; the intent is deleted only after
   ALL of them (and their branch drops) succeed.

A crash anywhere in step 3 leaves the intent on disk;
:func:`recover_transactions` (run by ``IceSQL`` on open, callable
directly) rolls the remainder FORWARD — readers see none (crash
before the intent exists: stale branches are simply discarded) or all
(intent exists: recovery completes it) of the transaction's tables.
DDL inside a transaction is rejected (autocommit), and externally-
cataloged (linked) tables cannot join a transaction at all
(docs/08:150-165: "autocommit only").

A table with NO snapshot yet cannot carry a branch ref (refs must
point at a snapshot), so the first staged write on an empty table
first commits an EMPTY genesis snapshot to main — visible content is
unchanged (zero rows before and after) — and branches from it.
"""

from __future__ import annotations

import json

from .metadata import Snapshot
from .table import CommitConflict, IceTable, _scan_report

#: warehouse-relative directory holding publish-intent records
INTENT_DIR = "_txn_intents"


class PartialPublish(RuntimeError):
    """Recovery could not roll a DECIDED transaction forward (a
    concurrent writer advanced a table past the staged branch while
    the intent was pending).  The published prefix is real; this error
    surfaces the inconsistency loudly instead of hiding it."""


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

    def toDF(self, predicate=None, snapshot=None, row_lineage: bool = False):
        snap = snapshot or self._txn_head()
        if snap is None:
            return self.spark.createDataFrame([], self.meta.schema.to_struct())
        return super().toDF(predicate, snap, row_lineage=row_lineage)

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

    def txn_can_publish(self) -> bool:
        """Re-validate the fast-forward precondition (main is the
        branch head or an ancestor of it) against FRESH metadata —
        COMMIT runs this for every staged table BEFORE writing the
        publish intent, so a doomed multi-table publish aborts cleanly
        instead of being half-decided."""
        self.refresh()
        r = self.meta.refs.get(self._txn_branch)
        if r is None:
            return True  # nothing staged for this table
        return _is_ancestor_of(self.meta, self.meta.current_snapshot_id, r["snapshot-id"])

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


# -- multi-table publish intent + recovery ----------------------------------


def _is_ancestor_of(meta, maybe_ancestor_id, head_id) -> bool:
    """True when *maybe_ancestor_id* is on *head_id*'s parent chain
    (or is None — an empty main fast-forwards to anything)."""
    if maybe_ancestor_id is None:
        return True
    walk, seen = head_id, set()
    while walk is not None and walk not in seen:
        if walk == maybe_ancestor_id:
            return True
        seen.add(walk)
        s = meta.snapshot_by_id(walk)
        walk = s.parent_snapshot_id if s else None
    return False


def write_publish_intent(store, warehouse: str, txn_id: str, handles) -> str | None:
    """Durably record the DECIDED outcome of a multi-table COMMIT
    before any table publishes.  Returns the intent path, or None when
    fewer than two tables are staged (a single CAS is already atomic —
    no intent needed)."""
    staged = [h for h in handles if h._txn_branch in h.meta.refs]
    if len(staged) < 2:
        return None
    rec = {
        "txn-id": txn_id,
        "tables": [
            {
                "location": h.location,
                "branch": h._txn_branch,
                "target-snapshot-id": h.meta.refs[h._txn_branch]["snapshot-id"],
            }
            for h in staged
        ],
    }
    d = store.join(warehouse, INTENT_DIR)
    store.mkdirs(d)
    path = store.join(d, f"{txn_id}.json")
    store.create_exclusive(path, json.dumps(rec, indent=2, sort_keys=True))
    return path


def recover_transactions(spark, warehouse: str, store=None) -> list[str]:
    """Roll every pending publish intent FORWARD: for each named table,
    fast-forward main to the recorded branch head (idempotent — a
    table already published, or published-but-branch-drop-crashed, is
    detected and skipped/cleaned), then delete the intent.  Returns
    the recovered txn ids.  Raises :class:`PartialPublish` when a
    decided transaction can no longer complete (main diverged past the
    staged branch) — loud, never silent."""
    from .storage import LOCAL

    store = store or LOCAL
    done = []
    for path in sorted(store.glob(store.join(warehouse, INTENT_DIR, "*.json"))):
        rec = json.loads(store.read_text(path))
        for tb in rec["tables"]:
            t = IceTable.load(spark, tb["location"], store=store)
            branch, target = tb["branch"], tb["target-snapshot-id"]
            for _ in range(5):
                try:
                    if branch in t.meta.refs:
                        if _is_ancestor_of(
                            t.meta, t.meta.current_snapshot_id, target
                        ):
                            t.fast_forward(branch)
                        elif not _is_ancestor_of(
                            t.meta, target, t.meta.current_snapshot_id
                        ):
                            raise PartialPublish(
                                f"txn {rec['txn-id']}: table at "
                                f"{tb['location']} diverged past staged "
                                f"snapshot {target}; cannot roll forward"
                            )
                        # target already on main (crash between apply
                        # and branch drop): just drop the branch below
                        t.drop_ref(branch)
                    elif not _is_ancestor_of(
                        t.meta, target, t.meta.current_snapshot_id
                    ):
                        raise PartialPublish(
                            f"txn {rec['txn-id']}: table at {tb['location']} "
                            f"lost staged snapshot {target} (branch gone, "
                            "not on main)"
                        )
                    break
                except CommitConflict:
                    t.refresh()
            else:
                raise CommitConflict(
                    f"recovery of txn {rec['txn-id']} lost the pointer race"
                )
        store.delete(path)
        done.append(rec["txn-id"])
    return done
