"""Pluggable lake storage backends — the commit primitives isolated.

The lake's exactly-once protocol rests on exactly three storage
primitives (everything above them is partition-parallel Ray work):

  1. mutable-document commit  — replace a partition checkpoint /
     CONFIG / epoch log / manifest pointer atomically;
  2. immutable-object put     — publish a delta/base parquet fragment
     under a deterministic name;
  3. listing                  — enumerate committed checkpoints.

`PosixStorage` implements them the classic single-filesystem way
(fsync + atomic rename for docs, flock for the job lock) — correct on
one node or a POSIX-semantics shared filesystem.

`ObjectStoreStorage` implements them the way an S3-class object store
requires — **no rename, no flock, no in-place overwrite of mutable
state**:

  * a mutable document is an append-only chain of immutable versioned
    objects ``<key>.v0000001, <key>.v0000002, ...``; a read LISTs the
    chain and takes the highest version; a commit is a *conditional
    put* (if-none-match) of version ``last_read + 1``.  A concurrent
    writer that committed in between owns that version already, so the
    put fails and the commit surfaces ``StorageConflictError`` instead
    of silently losing the other writer's update — the version-checked
    manifest swap.  (S3 has supported If-None-Match conditional writes
    publicly since 2024; GCS has x-goods-if-generation-match; Azure has
    ETag If-Match.)
  * data objects (parquet fragments) have deterministic names AND
    deterministic content (commit_delta sorts by key before writing),
    so an idempotent re-put after a crashed attempt is a no-op —
    conditional put with "already exists == success".
  * the job lock is a *lease document* committed through the same CAS
    chain (holder token + pid); a SIGKILLed holder leaves a stale
    lease that the next acquirer steals once the holder is provably
    dead.  A real deployment would use a TTL on the lease instead of a
    pid liveness probe; the probe is the single-box emulation of it.

This sandbox has no real object store, so ``ObjectStoreStorage``
emulates one over a local directory, but the *protocol layer never
calls rename/replace/flock*: the only write primitive is
``_put_if_absent``, whose atomic-visibility guarantee (an object is
either fully present or absent — what S3 gives every PUT natively) is
emulated by staging the bytes outside the bucket namespace and
``os.link``-ing them in (link fails with EEXIST if the key exists =
if-none-match; link is atomic and is NOT a rename — the staged inode
appears under the key or nothing does).  `tests/test_storage.py`
pins this by making ``os.rename``/``os.replace`` raise for the whole
lifetime of an object-store commit.

Spill-exchange intermediates (stages/exchange.py) deliberately stay
OUTSIDE this interface: they are transient at-least-once scratch with
no commit semantics (LWW dedups re-spilled rows), and a cluster
deployment would point them at node-local disk or a plain shared
prefix — losing them costs a re-spill, never correctness.

Reference analog: the watermark text files the reference fsyncs to
local disk (/root/reference/src/application/mysql_handler.go:439-453)
are the degenerate single-writer case of primitive (1).
"""

from __future__ import annotations

import json
import os
import re
import uuid

import pyarrow.parquet as pq


class StorageConflictError(RuntimeError):
    """A version-checked document commit lost the race: another writer
    committed the next version first. Under the engine's
    single-committer-per-partition discipline this indicates a protocol
    violation (two jobs on one lake / two tasks on one partition) —
    callers should fail loudly, not retry blindly."""


#: physical name of version N of mutable document <key>
def _ver_name(base: str, n: int) -> str:
    return f"{base}.v{n:09d}"


_VER_RE = re.compile(r"^(?P<base>.+)\.v(?P<n>\d{9})$")

#: versions of a doc older than (latest - KEEP) are garbage-collected
#: after a successful commit; >1 keeps the previous version readable
#: for a concurrent reader that LISTed just before the commit
_KEEP_VERSIONS = 2


class PosixStorage:
    """Single-POSIX-filesystem backend — today's semantics, unchanged:
    docs commit by fsync + atomic rename, the job lock is flock, and
    listings are plain readdir. The on-disk layout is byte-identical to
    the pre-abstraction lake, so existing lakes reopen transparently."""

    backend = "posix"

    def __init__(self, root: str):
        self.root = root

    # All keys are '/'-relative paths under the lake root.
    def _p(self, key: str) -> str:
        return os.path.join(self.root, key)

    def ensure_layout(self, dirs=("data", "checkpoints", "manifest")) -> None:
        for d in dirs:
            os.makedirs(self._p(d), exist_ok=True)

    def layout_exists(self) -> bool:
        return os.path.isdir(self._p("checkpoints"))

    # --- mutable documents --------------------------------------------------

    def doc_read_bytes(self, key: str) -> bytes | None:
        try:
            with open(self._p(key), "rb") as f:
                return f.read()
        except FileNotFoundError:
            return None

    def doc_write_bytes(self, key: str, data: bytes) -> None:
        path = self._p(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)  # the atomic commit point

    def doc_read_json(self, key: str):
        b = self.doc_read_bytes(key)
        return None if b is None else json.loads(b)

    def doc_write_json(self, key: str, obj) -> None:
        self.doc_write_bytes(
            key, json.dumps(obj, indent=1, sort_keys=True).encode()
        )

    def doc_list(self, dirkey: str) -> list[str]:
        """Committed document basenames under a directory key (never
        in-flight *.tmp.* partials from a crash mid-write)."""
        d = self._p(dirkey)
        if not os.path.isdir(d):
            return []
        return sorted(n for n in os.listdir(d) if ".tmp." not in n)

    def doc_exists(self, key: str) -> bool:
        return os.path.exists(self._p(key))

    # --- immutable data objects (parquet fragments) -------------------------

    def obj_put_table(self, key: str, table, row_group_size=None) -> None:
        path = self._p(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        kw = {"row_group_size": row_group_size} if row_group_size else {}
        pq.write_table(table, path, **kw)

    def obj_open(self, key: str) -> pq.ParquetFile:
        return pq.ParquetFile(self._p(key))

    def obj_read_table(self, key: str, columns=None):
        return pq.read_table(self._p(key), columns=columns)

    def obj_read_schema(self, key: str):
        return pq.read_schema(self._p(key))

    def obj_exists(self, key: str) -> bool:
        return os.path.exists(self._p(key))

    def obj_delete(self, key: str) -> None:
        try:
            os.remove(self._p(key))
        except FileNotFoundError:
            pass

    def obj_list(self, dirkey: str) -> list[str]:
        """Data-object basenames under a directory key (fragments only —
        never in-flight *.tmp.* partials). Used by compaction's orphan
        sweep; an S3 backend maps this to one LIST request."""
        d = self._p(dirkey)
        if not os.path.isdir(d):
            return []
        return sorted(n for n in os.listdir(d) if ".tmp." not in n)

    # --- job lock -----------------------------------------------------------

    def job_lock(self):
        """Advisory single-writer flock on <root>/LOCK — auto-released
        by the kernel when the holder dies (crash-safe for free)."""
        import fcntl

        path = self._p("LOCK")

        class _Lock:
            def __enter__(self_l):
                self_l.f = open(path, "w")
                try:
                    fcntl.flock(self_l.f, fcntl.LOCK_EX | fcntl.LOCK_NB)
                except OSError:
                    self_l.f.close()
                    raise RuntimeError(
                        f"another job holds the lake lock {path}"
                    ) from None
                return self_l

            def __exit__(self_l, *exc):
                fcntl.flock(self_l.f, fcntl.LOCK_UN)
                self_l.f.close()

        return _Lock()

    def sweep_stale_tmp(self) -> int:
        """Unlink orphaned atomic-write temp files (crash between tmp
        write and replace). Safe under the job lock."""
        n = 0
        for dirkey in ("checkpoints", "manifest"):
            d = self._p(dirkey)
            if not os.path.isdir(d):
                continue
            for name in os.listdir(d):
                if ".tmp." in name:
                    try:
                        os.remove(os.path.join(d, name))
                        n += 1
                    except FileNotFoundError:
                        pass
        return n


class ObjectStoreStorage:
    """Object-store-semantics backend (local emulation).

    The bucket namespace is the lake root; ``<root>/.objstore/`` holds
    the staging area (outside the bucket — its presence is also the
    backend marker ``Lake`` sniffs on reopen) and is NOT enumerable as
    keys. See the module docstring for the protocol; the invariants:

      * no rename/replace/flock anywhere in the commit path;
      * mutable docs = CAS chains of immutable versioned objects;
      * data objects = idempotent deterministic puts;
      * lock = stealable lease document.
    """

    backend = "objstore"
    MARKER = ".objstore"

    def __init__(self, root: str):
        self.root = root
        self._stage = os.path.join(root, self.MARKER)
        #: version of each doc as last read/written BY THIS HANDLE —
        #: the If-Match basis for the next conditional put
        self._vseen: dict[str, int] = {}

    def _p(self, key: str) -> str:
        return os.path.join(self.root, key)

    def ensure_layout(self, dirs=("data", "checkpoints", "manifest")) -> None:
        os.makedirs(self._stage, exist_ok=True)
        for d in dirs:
            os.makedirs(self._p(d), exist_ok=True)

    def layout_exists(self) -> bool:
        return os.path.isdir(self._p("checkpoints"))

    # --- the one write primitive: conditional put ---------------------------

    def _put_if_absent(self, key: str, data: bytes) -> bool:
        """Atomic if-none-match PUT: True if this call created the key,
        False if the key already existed. Emulates S3 conditional PUT:
        stage the bytes outside the bucket, then hard-link them under
        the key — link(2) is atomic, fails with EEXIST when the key
        exists, and is not a rename (the staging inode is unchanged)."""
        os.makedirs(self._stage, exist_ok=True)
        tmp = os.path.join(self._stage, f"put-{uuid.uuid4().hex}")
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        target = self._p(key)
        os.makedirs(os.path.dirname(target), exist_ok=True)
        try:
            os.link(tmp, target)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    # --- mutable documents: versioned CAS chains -----------------------------

    def _versions(self, key: str) -> list[int]:
        d = os.path.dirname(self._p(key))
        base = os.path.basename(key)
        if not os.path.isdir(d):
            return []
        out = []
        for name in os.listdir(d):
            m = _VER_RE.match(name)
            if m and m.group("base") == base:
                out.append(int(m.group("n")))
        return sorted(out)

    def doc_read_bytes(self, key: str) -> bytes | None:
        vs = self._versions(key)
        if not vs:
            return None
        # newest-first: a GC between our LIST and GET can only remove
        # versions older than the latest, never the head we read
        self._vseen[key] = vs[-1]
        with open(self._p(_ver_name(key, vs[-1])), "rb") as f:
            return f.read()

    def doc_write_bytes(self, key: str, data: bytes) -> None:
        base = self._vseen.get(key)
        if base is None:
            vs = self._versions(key)
            base = vs[-1] if vs else 0
        nxt = base + 1
        if not self._put_if_absent(_ver_name(key, nxt), data):
            # someone else owns version base+1: our read is stale
            latest = (self._versions(key) or [nxt])[-1]
            self._vseen.pop(key, None)
            raise StorageConflictError(
                f"lost update on {key}: expected to commit v{nxt} but a "
                f"concurrent writer advanced it to v{latest} — two "
                "committers on one partition/document violates the "
                "single-owner protocol"
            )
        self._vseen[key] = nxt
        for old in self._versions(key):
            if old <= nxt - _KEEP_VERSIONS:
                try:
                    os.unlink(self._p(_ver_name(key, old)))
                except FileNotFoundError:
                    pass

    def doc_read_json(self, key: str):
        b = self.doc_read_bytes(key)
        return None if b is None else json.loads(b)

    def doc_write_json(self, key: str, obj) -> None:
        self.doc_write_bytes(
            key, json.dumps(obj, indent=1, sort_keys=True).encode()
        )

    def doc_list(self, dirkey: str) -> list[str]:
        """Logical document names under a prefix: LIST the physical
        versioned keys and strip the version suffix. One real LIST call
        per enumeration — callers that need N docs should still expect
        N GETs (the lake's checkpoint scans are O(partitions), which a
        production backend would batch into one paginated LIST)."""
        d = self._p(dirkey)
        if not os.path.isdir(d):
            return []
        names = set()
        for name in os.listdir(d):
            m = _VER_RE.match(name)
            if m:
                names.add(m.group("base"))
        return sorted(names)

    def doc_exists(self, key: str) -> bool:
        return bool(self._versions(key))

    # --- immutable data objects ----------------------------------------------

    def obj_put_table(self, key: str, table, row_group_size=None) -> None:
        """Idempotent publish: deltas/bases have deterministic names and
        deterministic content (key-sorted before write), so 'key already
        exists' after a crash-retry means the bytes are already there —
        success, not conflict."""
        import io

        kw = {"row_group_size": row_group_size} if row_group_size else {}
        buf = io.BytesIO()
        pq.write_table(table, buf, **kw)
        self._put_if_absent(key, buf.getvalue())

    def obj_open(self, key: str) -> pq.ParquetFile:
        return pq.ParquetFile(self._p(key))

    def obj_read_table(self, key: str, columns=None):
        return pq.read_table(self._p(key), columns=columns)

    def obj_read_schema(self, key: str):
        return pq.read_schema(self._p(key))

    def obj_exists(self, key: str) -> bool:
        return os.path.exists(self._p(key))

    def obj_delete(self, key: str) -> None:
        try:
            os.remove(self._p(key))
        except FileNotFoundError:
            pass

    def obj_list(self, dirkey: str) -> list[str]:
        """Data-object basenames under a directory key. Data dirs hold
        only plain-keyed immutable fragments (never versioned docs), so
        this is a raw LIST minus in-flight temp names."""
        d = self._p(dirkey)
        if not os.path.isdir(d):
            return []
        return sorted(n for n in os.listdir(d) if ".tmp." not in n)

    # --- job lock: stealable lease -------------------------------------------

    _LEASE_KEY = "LEASE"

    @staticmethod
    def _pid_start(pid) -> int | None:
        """Kernel start-time of `pid` (clock ticks since boot), or None
        if the pid doesn't exist. pid + starttime identifies a process
        uniquely across pid recycling — a recycled pid has a different
        starttime, so a dead holder can never impersonate a live one."""
        try:
            with open(f"/proc/{int(pid)}/stat", "rb") as f:
                stat = f.read()
            # field 22, counting from 1 AFTER the parenthesized comm
            # (comm may contain spaces/parens — split on the LAST ')')
            return int(stat.rsplit(b")", 1)[1].split()[19])
        except (OSError, ValueError, IndexError, TypeError):
            return None

    def job_lock(self):
        """Single-writer lease committed through the doc CAS chain.
        A live holder (same pid AND same process start-time on this
        host) blocks acquisition; a dead holder's stale lease is stolen
        — the emulation of a TTL lease on a real object store. Release
        commits a released-lease version (CAS again, so a concurrent
        steal surfaces loudly)."""
        storage = self

        class _Lease:
            def __enter__(self_l):
                cur = storage.doc_read_json(storage._LEASE_KEY)
                if cur and not cur.get("released"):
                    pid = cur.get("pid", -1)
                    start = storage._pid_start(pid)
                    alive = start is not None and start == cur.get(
                        "pid_start", start
                    )
                    if alive:
                        raise RuntimeError(
                            f"another job holds the lake lease "
                            f"{storage._p(storage._LEASE_KEY)} (pid {pid})"
                        )
                self_l.token = uuid.uuid4().hex
                try:
                    storage.doc_write_json(
                        storage._LEASE_KEY,
                        {
                            "pid": os.getpid(),
                            "pid_start": storage._pid_start(os.getpid()),
                            "token": self_l.token,
                        },
                    )
                except StorageConflictError:
                    raise RuntimeError(
                        "lost the lake lease race to a concurrent job"
                    ) from None
                return self_l

            def __exit__(self_l, *exc):
                try:
                    storage.doc_write_json(
                        storage._LEASE_KEY,
                        {"released": True, "token": self_l.token},
                    )
                except StorageConflictError:
                    pass  # lease was stolen post-mortem; nothing to free

        return _Lease()

    def sweep_stale_tmp(self) -> int:
        """Remove orphaned staging files (crash between stage and link).
        They are invisible to the bucket namespace, so this is pure
        space reclamation, never a correctness step."""
        n = 0
        if os.path.isdir(self._stage):
            for name in os.listdir(self._stage):
                try:
                    os.unlink(os.path.join(self._stage, name))
                    n += 1
                except (FileNotFoundError, IsADirectoryError):
                    pass
        return n


BACKENDS = {"posix": PosixStorage, "objstore": ObjectStoreStorage}


def sniff_backend(root: str) -> str | None:
    """Which backend an existing lake at `root` was created with, or
    None if nothing identifiable exists there yet. The objstore marker
    is its staging dir; a posix lake is identified by its plain
    CONFIG.json (never versioned)."""
    if os.path.isdir(os.path.join(root, ObjectStoreStorage.MARKER)):
        return "objstore"
    if os.path.exists(os.path.join(root, "CONFIG.json")):
        return "posix"
    return None


def make_storage(root: str, backend: str | None = None):
    """Storage handle for a lake root. backend=None sniffs an existing
    lake's layout and defaults to posix for a fresh root (back-compat:
    every pre-abstraction lake is posix)."""
    if backend is None:
        backend = sniff_backend(root) or "posix"
    try:
        return BACKENDS[backend](root)
    except KeyError:
        raise ValueError(
            f"unknown storage backend {backend!r} (have {sorted(BACKENDS)})"
        ) from None
