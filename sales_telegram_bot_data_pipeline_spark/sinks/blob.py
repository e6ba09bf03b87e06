"""Binary blob sink (reference op 2: S3 put_object / upload_file,
s3_dynamodb_utils.py:18-19, pdf_utils.py:58).

The reference uploads one local file per call; the engine writes blobs per
partition through ``foreachPartition`` — one store client per partition, rows
streamed, nothing collected to the driver.  Writes are idempotent the way an
S3 PUT is: a key overwritten with the same bytes converges, so task retries
and job re-runs are safe.

``LocalBlobStore`` is the test double standing in for an object-store
client; swap ``put`` for a boto3 ``put_object`` on a cluster.  Each blob is
written to a temp file then atomically renamed, so a killed task never
leaves a half-written object visible (the same all-or-nothing visibility an
S3 PUT gives).

Scale: keys should carry a spreading prefix (e.g. the reference's
``pages/valid/``/``item_detected/valid/`` directories already do) so writes
fan out across store partitions; the sink itself is shuffle-free — it
consumes whatever partitioning the upstream plan produced.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame


class LocalBlobStore:
    """Directory-backed object store usable from executor tasks in local
    mode (executors share the filesystem).  Keys may contain '/'.

    Temp files stage in a dedicated ``.staging/`` subdir excluded from
    ``keys()``: a hard-killed task (SIGKILL, no ``finally``) can leak a
    temp, but it is never visible as a phantom object to listers, and the
    rename into place stays atomic (same filesystem)."""

    STAGING = ".staging"

    def __init__(self, root: str):
        self.root = root

    def put(self, key: str, content: bytes) -> None:
        path = os.path.join(self.root, key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        staging = os.path.join(self.root, self.STAGING)
        os.makedirs(staging, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=staging)
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(content)
            os.replace(tmp, path)  # atomic: no partially-visible objects
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)

    def get(self, key: str) -> bytes:
        with open(os.path.join(self.root, key), "rb") as f:
            return f.read()

    def keys(self) -> list[str]:
        out = []
        staging = os.path.join(self.root, self.STAGING)
        for dirpath, dirnames, files in os.walk(self.root):
            if dirpath == self.root and self.STAGING in dirnames:
                dirnames.remove(self.STAGING)  # in-flight temps are invisible
            for name in files:
                full = os.path.join(dirpath, name)
                out.append(os.path.relpath(full, self.root))
        return sorted(out)


def write_blobs(df: DataFrame, key_col: str, content_col: str, store_root: str) -> None:
    """foreachPartition blob writer: each row's ``content_col`` bytes are
    PUT under its ``key_col``.  Idempotent — re-running the job converges to
    the same store state (last PUT wins per key, atomic visibility)."""

    def _write_partition(rows):
        store = LocalBlobStore(store_root)
        for row in rows:
            key = row[key_col]
            content = row[content_col]
            if key is None or content is None:
                continue
            store.put(key, bytes(content))

    df.foreachPartition(_write_partition)
