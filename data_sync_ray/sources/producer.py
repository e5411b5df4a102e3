"""Event-log producer — the K2/K3 producer analog.

The reference's Kafka producer publishes change events asynchronously to
the topic the consumer tails (/root/reference/src/lib/mq/kafka/
mq_producer.go:18-96; facade src/infrastructure/mq/producer.go:13-21). In
this engine the "topic" is the epoch-dir event log that ``ReplayJob.tail``
polls, so the producer appends complete epoch directories:

    produce(batch)  — buffer change-event rows (async-send analog)
    flush()         — write the buffer as the NEXT epoch dir, atomically
                      (write to a tmp dir, rename into place: a tailing
                      consumer never sees a half-written epoch)

Epoch numbering resumes from the log itself, so independent producer
processes can extend one log sequentially (like appending to a topic).
flush() holds an flock on `<events_root>/.PRODUCER_LOCK` while it
allocates the next epoch number and renames the dir into place, so
concurrent producers on a shared POSIX filesystem serialize instead of
colliding (on object stores use an external lease, like the lake lock).
"""

from __future__ import annotations

import fcntl
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from ..datamodel import list_epoch_dirs


class EventLogProducer:
    def __init__(self, events_root: str, files_per_epoch: int = 2):
        self.root = events_root
        self.files_per_epoch = files_per_epoch
        os.makedirs(events_root, exist_ok=True)
        existing = list_epoch_dirs(events_root)
        self.next_epoch = (existing[-1][0] + 1) if existing else 0
        self._buffer: list[pa.Table] = []

    def produce(self, batch: pa.Table | dict | list[dict]) -> int:
        """Buffer change-event rows; returns buffered row count."""
        if isinstance(batch, dict):
            batch = [batch]
        if isinstance(batch, list):
            batch = pa.Table.from_pylist(batch)
        if batch.num_rows:
            self._buffer.append(batch)
        return sum(t.num_rows for t in self._buffer)

    def flush(self) -> str | None:
        """Publish the buffer as the next epoch dir (atomic rename); a
        tailing ReplayJob picks it up on its next poll. Returns the epoch
        dir path, or None when the buffer is empty.

        The buffer is cleared only AFTER the rename succeeds — a failed
        flush (disk error, lost epoch race) keeps the events buffered so
        the caller can retry; the tmp dir is cleaned up on failure."""
        if not self._buffer:
            return None
        t = (
            pa.concat_tables(self._buffer, promote_options="permissive")
            if len(self._buffer) > 1
            else self._buffer[0]
        )
        tmp = os.path.join(self.root, f".tmp-{uuid.uuid4().hex[:12]}")
        try:
            os.makedirs(tmp, exist_ok=True)
            k = max(1, min(self.files_per_epoch, t.num_rows))
            step = (t.num_rows + k - 1) // k
            for j in range(k):
                chunk = t.slice(j * step, step)
                if chunk.num_rows:
                    pq.write_table(
                        chunk, os.path.join(tmp, f"part-{j:04d}.parquet")
                    )
            with open(os.path.join(self.root, ".PRODUCER_LOCK"), "w") as lf:
                fcntl.flock(lf, fcntl.LOCK_EX)
                # re-derive the epoch under the lock: another producer may
                # have published since this instance last looked
                existing = list_epoch_dirs(self.root)
                self.next_epoch = max(
                    self.next_epoch, (existing[-1][0] + 1) if existing else 0
                )
                final = os.path.join(
                    self.root, f"epoch={self.next_epoch:05d}"
                )
                os.rename(tmp, final)  # atomic publish
                fcntl.flock(lf, fcntl.LOCK_UN)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
            raise  # events remain buffered; flush() is retryable
        self._buffer = []
        self.next_epoch += 1
        return final
