"""Fault-injecting MetadataStore wrapper for crash-consistency sweeps.

Wraps any real store and raises :class:`SimulatedCrash` on the k-th
MUTATING operation (create_exclusive / replace_text / delete) — the
process-death model for commit paths: every metadata mutation is a
point the process can die at, and the table reopened afterwards (with
a clean store) must equal the pre- or post-state, never a partial."""

from __future__ import annotations

from icepack.storage import MetadataStore


class SimulatedCrash(RuntimeError):
    pass


class CrashingStore(MetadataStore):
    def __init__(self, inner: MetadataStore, fail_after: int):
        """Allow *fail_after* mutations, crash on the next one."""
        self.inner = inner
        self.budget = fail_after
        self.mutations = 0

    def _spend(self) -> None:
        if self.mutations >= self.budget:
            raise SimulatedCrash(f"crash at mutation #{self.mutations + 1}")
        self.mutations += 1

    # mutating ops ----------------------------------------------------------
    def create_exclusive(self, path, text):
        self._spend()
        return self.inner.create_exclusive(path, text)

    def replace_text(self, path, text):
        self._spend()
        return self.inner.replace_text(path, text)

    def delete(self, path):
        self._spend()
        return self.inner.delete(path)

    def write_bytes(self, path, data):
        self._spend()
        return self.inner.write_bytes(path, data)

    # read-only / structural ops delegate untouched ------------------------
    def canonical(self, path):
        return self.inner.canonical(path)

    def join(self, *parts):
        return self.inner.join(*parts)

    def exists(self, path):
        return self.inner.exists(path)

    def read_text(self, path):
        return self.inner.read_text(path)

    def glob(self, pattern):
        return self.inner.glob(pattern)

    def mtime_ms(self, path):
        return self.inner.mtime_ms(path)

    def mkdirs(self, path):
        return self.inner.mkdirs(path)

    def read_bytes(self, path):
        return self.inner.read_bytes(path)
