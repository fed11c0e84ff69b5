"""Filesystem-portable manifest and scratch IO for the persisted-index
family (IVF / dedup / near-dup) and the EDJoin heavy-path spill.

Why this module exists (the 100 TB contract): a persisted index lives
where the cluster's storage lives — ``hdfs://``, ``s3a://``,
``abfss://`` — but a driver-local ``open()`` can only read ``file:``
paths, and a non-atomic manifest write can leave a truncated JSON that
breaks every later probe of an otherwise-healthy index.  All manifest
IO therefore goes through here:

- **Local paths** (no scheme, or ``file:``) use plain Python IO with
  true ``os.replace`` atomicity — zero py4j overhead for the common
  sandbox/test case.
- **Everything else** goes through Hadoop's ``FileSystem`` API over
  py4j from the active ``SparkSession`` (no new dependency — the same
  connectors Spark's own readers use resolve the scheme), with
  write-to-temp + ``rename`` publication: atomic on HDFS; on object
  stores the window is one small-file rename.

Reference semantics anchor: minivectordb's persistence contract
(vector_database.py:538-548) — persist/load must work wherever the
engine's storage lives, not just on the driver's local disk.

Scratch placement: the heavy-path parquet spill
(``operators/linkage.py``) must be written somewhere EVERY executor and
the driver can read back.  ``tempfile.mkdtemp`` on the driver breaks on
a real multi-node cluster (executors scatter part files across their own
local disks; the read-back cannot assemble them), so ``scratch_dir``
resolves, in order: the ``SCRATCH_ROOT`` module knob, the
``spark.minivectordb.scratchDir`` session conf, and finally a
``_minivectordb_scratch`` directory under ``spark.sql.warehouse.dir``
(shared storage on any correctly-configured cluster).
"""

from __future__ import annotations

import json
import os
import uuid
from urllib.parse import unquote, urlparse

#: override for the shared scratch root used by ``scratch_dir`` (takes
#: precedence over the ``spark.minivectordb.scratchDir`` session conf
#: and the warehouse-dir default)
SCRATCH_ROOT: str | None = None


def _local_path(path: str) -> str | None:
    """The driver-local filesystem path for ``path``, or ``None`` when
    the URI names a non-local scheme that must go through Hadoop."""
    u = urlparse(path)
    if u.scheme in ("", "file"):
        return unquote(u.path) if u.scheme == "file" else path
    if len(u.scheme) == 1:  # windows drive letter, not a URI scheme
        return path
    return None


def _active_spark():
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            "a non-local index path needs an active SparkSession "
            "(Hadoop FileSystem access goes through the JVM)"
        )
    return spark


def _hadoop(path: str, spark=None):
    """(jvm, FileSystem, Path) for ``path`` via the session's Hadoop
    configuration — the scheme resolves through the same connector
    registry Spark's own readers use."""
    spark = spark or _active_spark()
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return jvm, fs, jpath


def read_text(path: str, spark=None) -> str:
    """Read a small text file from any Hadoop-resolvable URI.  Raises
    ``FileNotFoundError`` when absent (both paths), so callers keep the
    existing ``except (OSError, ValueError)`` freshness-miss handling."""
    lp = _local_path(path)
    if lp is not None:
        with open(lp) as fh:
            return fh.read()
    jvm, fs, jpath = _hadoop(path, spark)
    if not fs.exists(jpath):
        raise FileNotFoundError(path)
    stream = fs.open(jpath)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def write_text_atomic(path: str, text: str, spark=None) -> None:
    """Write a small text file with write-to-temp + rename publication:
    a crash mid-write can never leave a truncated file at ``path``
    (ADVICE r12 — a torn manifest broke every later ``_load_*_manifest``).
    Parent directories are created if missing."""
    lp = _local_path(path)
    if lp is not None:
        d = os.path.dirname(lp) or "."
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".{os.path.basename(lp)}.tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            fh.write(text)
        os.replace(tmp, lp)
        return
    jvm, fs, jpath = _hadoop(path, spark)
    parent = jpath.getParent()
    if parent is not None and not fs.exists(parent):
        fs.mkdirs(parent)
    tmp = jvm.org.apache.hadoop.fs.Path(
        str(jpath) + f".tmp-{uuid.uuid4().hex}"
    )
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    fs.delete(jpath, False)  # HDFS rename refuses an existing target
    if not fs.rename(tmp, jpath):
        fs.delete(tmp, False)
        raise OSError(f"rename {tmp} -> {jpath} failed")


def delete(path: str, recursive: bool = False, spark=None) -> None:
    """Best-effort delete of a file or directory on any scheme."""
    lp = _local_path(path)
    if lp is not None:
        import shutil

        try:
            if recursive and os.path.isdir(lp):
                shutil.rmtree(lp, ignore_errors=True)
            elif os.path.exists(lp):
                os.remove(lp)
        except OSError:
            pass
        return
    try:
        _, fs, jpath = _hadoop(path, spark)
        fs.delete(jpath, recursive)
    except Exception:
        pass


def read_manifest(path: str, spark=None) -> dict:
    """Load an index's JSON manifest from any Hadoop-resolvable URI."""
    return json.loads(read_text(path, spark))


def write_manifest(path: str, payload: dict, spark=None) -> None:
    """Atomically publish an index's JSON manifest."""
    write_text_atomic(path, json.dumps(payload), spark)


def invalidate_fingerprint(path: str, manifest_name: str, spark=None) -> None:
    """Drop a persisted index's freshness fingerprint BEFORE an
    incremental append (ordering is the contract, ADVICE r12: invalidate
    first so a crash between steps leaves at worst a spurious rebuild —
    never a fresh-looking index that matches no single source snapshot).
    The rewrite is atomic via ``write_text_atomic``."""
    p = f"{path.rstrip('/')}/{manifest_name}"
    try:
        m = read_manifest(p, spark)
    except (OSError, ValueError):
        return
    if m.pop("fingerprint", None) is not None:
        write_manifest(p, m, spark)


def scratch_dir(spark, prefix: str) -> str:
    """A fresh scratch directory URI on SHARED storage (see module
    docstring for the resolution order).  The caller owns cleanup via
    ``delete(path, recursive=True)``."""
    root = SCRATCH_ROOT or spark.conf.get("spark.minivectordb.scratchDir", None)
    if not root:
        root = f"{spark.conf.get('spark.sql.warehouse.dir').rstrip('/')}/_minivectordb_scratch"
    return f"{root.rstrip('/')}/{prefix}{uuid.uuid4().hex}"
