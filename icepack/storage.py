"""Metadata storage seam — pluggable I/O behind table/catalog metadata.

The reference's data model assumes object storage (docs/01-table-format-
architecture.md:101-124, docs/02-parquet-data-storage.md:3-15): metadata
documents, manifests and pointers live next to the data in S3/GCS/Azure,
and the engine talks to them through a FileIO abstraction.  Spark-side
data reads/writes already work on any Hadoop FS URI; this module gives
the *metadata* layer the same property.  Every metadata read, write,
exclusive-create and sweep in ``table.py`` / ``manifest.py`` /
``maintenance.py`` / ``catalog.py`` routes through a :class:`MetadataStore`,
with :class:`LocalStore` (POSIX, the default) preserving today's exact
behavior.

Semantics each store must provide:

- ``create_exclusive(path, text)`` — atomic first-writer-wins creation,
  raising :class:`FileExistsError` on conflict.  This is the commit CAS
  (docs/08-acid-transactions.md:52-78).  Locally it is ``open(path,
  "x")`` (POSIX ``O_EXCL``); on S3 it maps to a conditional PUT
  (``If-None-Match: *``) or is replaced entirely by a catalog-side
  pointer CAS (restcat.py commits through the REST service for exactly
  this reason).
- ``replace_text(path, text)`` — atomic overwrite for the best-effort
  version hint (locally: tmp file + ``rename``; object stores: PUT is
  already atomic per-key).
- ``read_text`` / ``exists`` / ``delete`` / ``glob`` / ``mtime_ms`` —
  plain object ops used by refresh, scans and the maintenance sweeps.

Data files are NOT routed here: Spark writes them through its own
Hadoop FS layer and pyarrow reads their footers directly; at warehouse
scale both already speak object-store URIs natively.

:class:`InMemoryStore` is the non-default store proving the seam: a
table whose metadata lives in a dict while its parquet lives wherever
Spark put it — exactly the split a remote catalog + object store
deployment has (tests/test_storage.py).
"""

from __future__ import annotations

import fnmatch
import json
import os
import threading
import time
import uuid


class MetadataStore:
    """Interface for table-metadata I/O.  Paths are opaque strings the
    store interprets; ``join``/``canonical`` let non-POSIX stores keep
    their own path algebra."""

    def canonical(self, path: str) -> str:
        raise NotImplementedError

    def join(self, *parts: str) -> str:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def create_exclusive(self, path: str, text: str) -> None:
        """Atomic create; FileExistsError if the path already exists."""
        raise NotImplementedError

    def replace_text(self, path: str, text: str) -> None:
        """Atomic overwrite (readers see old or new, never partial)."""
        raise NotImplementedError

    def delete(self, path: str) -> None:
        """Remove; missing path is not an error (idempotent sweeps)."""
        raise NotImplementedError

    def glob(self, pattern: str) -> list[str]:
        raise NotImplementedError

    def mtime_ms(self, path: str) -> int:
        raise NotImplementedError

    def mkdirs(self, path: str) -> None:
        raise NotImplementedError

    # convenience wrappers shared by all stores
    def read_json(self, path: str):
        return json.loads(self.read_text(path))

    def write_json_atomic(self, path: str, obj) -> None:
        self.replace_text(path, json.dumps(obj, indent=2, sort_keys=True))

    # binary documents (spec-primary Avro manifests, specio.py).
    # Default: base64 through the text APIs, so every store — including
    # wrappers like the crash-injecting test store — works unchanged;
    # LocalStore overrides with raw bytes so external engines can open
    # the files directly.
    def write_bytes(self, path: str, data: bytes) -> None:
        import base64

        self.replace_text(path, "b64:" + base64.b64encode(data).decode())

    def read_bytes(self, path: str) -> bytes:
        import base64

        text = self.read_text(path)
        if text.startswith("b64:"):
            return base64.b64decode(text[4:])
        return text.encode("utf-8", errors="surrogateescape")


class LocalStore(MetadataStore):
    """POSIX filesystem store — the default; byte-for-byte the behavior
    the metadata layer had before the seam existed."""

    def canonical(self, path: str) -> str:
        return os.path.abspath(path)

    def join(self, *parts: str) -> str:
        return os.path.join(*parts)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def create_exclusive(self, path: str, text: str) -> None:
        with open(path, "x") as f:  # O_EXCL: creation IS the CAS
            f.write(text)

    def replace_text(self, path: str, text: str) -> None:
        tmp = f"{path}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(text)
        os.rename(tmp, path)  # atomic on POSIX

    def delete(self, path: str) -> None:
        try:
            os.remove(path)
        except FileNotFoundError:
            pass

    def glob(self, pattern: str) -> list[str]:
        import glob as _glob

        return sorted(_glob.glob(pattern))

    def mtime_ms(self, path: str) -> int:
        return int(os.path.getmtime(path) * 1000)

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def write_bytes(self, path: str, data: bytes) -> None:
        tmp = f"{path}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.rename(tmp, path)  # atomic on POSIX

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()


class InMemoryStore(MetadataStore):
    """Dict-backed store (thread-safe) — the seam's proof object and the
    shape of an object-store adapter: flat keyspace, per-key atomic PUT,
    conditional create, prefix listing.  Used with a *local* table
    location: Spark still writes parquet to disk, while every metadata
    document lives only in this store — the metadata/data split of a
    real object-store + catalog deployment."""

    def __init__(self) -> None:
        self._objects: dict[str, tuple[str, int]] = {}  # path -> (text, mtime_ms)
        self._lock = threading.Lock()

    def canonical(self, path: str) -> str:
        # keep the same canonical form as LocalStore so metadata keys
        # and Spark-side data paths agree on the table location
        return os.path.abspath(path)

    def join(self, *parts: str) -> str:
        return os.path.join(*parts)

    def exists(self, path: str) -> bool:
        with self._lock:
            return path in self._objects

    def read_text(self, path: str) -> str:
        with self._lock:
            if path not in self._objects:
                raise FileNotFoundError(path)
            return self._objects[path][0]

    def create_exclusive(self, path: str, text: str) -> None:
        with self._lock:  # compare-and-set under one lock = conditional PUT
            if path in self._objects:
                raise FileExistsError(path)
            self._objects[path] = (text, int(time.time() * 1000))

    def replace_text(self, path: str, text: str) -> None:
        with self._lock:
            self._objects[path] = (text, int(time.time() * 1000))

    def delete(self, path: str) -> None:
        with self._lock:
            self._objects.pop(path, None)

    def glob(self, pattern: str) -> list[str]:
        with self._lock:
            return sorted(p for p in self._objects if fnmatch.fnmatch(p, pattern))

    def mtime_ms(self, path: str) -> int:
        with self._lock:
            if path not in self._objects:
                raise FileNotFoundError(path)
            return self._objects[path][1]

    def mkdirs(self, path: str) -> None:
        pass  # flat keyspace: directories don't exist


#: process-wide default — every table/catalog that doesn't pass an
#: explicit store uses this one
LOCAL = LocalStore()

#: location → store bindings made by explicit-store handles, so code
#: that only holds a LOCATION STRING (SQL temp views, scheduler task
#: bodies, direct reader construction) re-resolves the same store a
#: sibling handle created the table with.  This is the PROCESS-LOCAL
#: analog of URI-scheme dispatch: with a real object store the scheme
#: in the path picks the adapter statelessly in any process; the
#: in-memory seam proof has no scheme, so the binding carries the
#: association — and therefore cannot cross process boundaries (e.g.
#: Spark 4 runs registered Python data sources in a separate Python
#: worker, where only scheme dispatch could resolve).
_BOUND: dict[str, MetadataStore] = {}


def store_for(location: str, store: MetadataStore | None = None) -> MetadataStore:
    """Resolve the store for a table location: an explicit store wins
    (and binds the location for later string-only resolutions), then a
    prior binding, then the local default.  (URI-scheme dispatch would
    slot in here when a real object-store adapter exists.)"""
    key = os.path.abspath(location)
    if store is not None:
        if store is not LOCAL and not isinstance(store, LocalStore):
            _BOUND[key] = store
        else:
            # rebinding to the local default evicts any stale mapping —
            # a table re-created at the same path after a drop must not
            # resolve a prior in-memory store
            _BOUND.pop(key, None)
        return store
    return _BOUND.get(key, LOCAL)


def unbind(location: str) -> None:
    """Evict a location→store binding (called on table drop) so
    string-only consumers don't resolve a stale store for a table
    later re-created at the same path, and the per-process registry
    doesn't grow unboundedly across create/drop cycles."""
    _BOUND.pop(os.path.abspath(location), None)
