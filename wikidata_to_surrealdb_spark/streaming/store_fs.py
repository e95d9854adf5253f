"""Filesystem seam for the streaming dedup index store.

The store's DATA path (parquet reads/writes, the file-source stream)
always goes through Spark, which already speaks every Hadoop
filesystem. What used to bind the store to the local disk was the
Python-side *bookkeeping*: existence probes, batch-dir deletes for
replay idempotence, compaction's list/delete/rename, the manifest
file, and mtime staging in :func:`slice_documents_table`. This module
routes exactly those operations through a two-implementation adapter
(VERDICT r13 directive 3):

- :class:`LocalFS` — plain ``os``/``shutil``, for bare paths.
- :class:`HadoopFS` — the JVM's ``org.apache.hadoop.fs.FileSystem``
  via the active session, for any scheme-qualified path
  (``hdfs://``, ``s3a://``, ``file:``, ...). All calls are
  driver-side py4j (a handful per batch/compaction — never in a hot
  per-row path), so the overhead is round-trips, not data volume.

:func:`for_path` picks the implementation from the path's scheme, so
pointing ``work_dir`` at ``hdfs://...`` is the only change a cluster
deployment needs. One semantic caveat the adapter cannot paper over:
``rename`` is atomic on HDFS and POSIX but copy-based on object
stores (S3A) — the compaction commit protocol in
``streaming/documents.py`` therefore orders operations so that every
crash window is recoverable from the intent marker rather than
relying on rename atomicity.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import SparkSession

# two-character minimum: a Windows drive letter ("C:\\tmp") must not
# route to HadoopFS as scheme "C"
_SCHEME = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]+:")


def _hidden(name: str) -> bool:
    """Spark's file index skips path components starting with ``_`` or
    ``.`` — the store's tmp/marker/manifest entries live behind this
    rule, and the bookkeeping must agree with the reader about what
    counts as data."""
    return name.startswith("_") or name.startswith(".")


class LocalFS:
    """Local-disk bookkeeping (bare, scheme-less paths)."""

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(path)

    def list_subdirs(self, root: str) -> list[str]:
        if not os.path.isdir(root):
            return []
        return sorted(
            d
            for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d))
        )

    def count_parquet(self, root: str) -> int:
        """Visible (non-hidden-component) ``*.parquet`` files under
        ``root`` — the files a recursive Spark read would actually
        scan."""
        n = 0
        for cur, dirs, files in os.walk(root):
            dirs[:] = [d for d in dirs if not _hidden(d)]
            n += sum(
                1
                for f in files
                if f.endswith(".parquet") and not _hidden(f)
            )
        return n

    def list_files(self, root: str) -> list[str]:
        out = []
        for cur, _dirs, files in os.walk(root):
            out.extend(os.path.join(cur, f) for f in files)
        return sorted(out)

    def rmtree(self, path: str) -> None:
        """Remove a directory tree OR a single file; missing is a
        no-op (idempotent — recovery and replay both re-delete)."""
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path):
            os.remove(path)

    def rename(self, src: str, dst: str) -> None:
        os.rename(src, dst)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def write_text(self, path: str, text: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(text)
        os.replace(tmp, path)

    def read_text(self, path: str) -> str:
        with open(path) as fh:
            return fh.read()

    def set_mtime(self, path: str, t: float) -> None:
        os.utime(path, (t, t))


def _fc_classes_present(jvm) -> bool:
    """POSITIVE availability check for the FileContext overwrite-rename
    classes: in py4j a class that is absent from the JVM classpath
    resolves to a ``JavaPackage`` stub instead of a ``JavaClass``, so
    we can test for presence BEFORE attempting the rename rather than
    pattern-matching exceptions after the fact (a TypeError from bad
    arguments or a py4j network error must never be mistaken for
    "class missing" and silently downgrade to the non-atomic path).

    Only a py4j NAME-resolution failure may read as "absent"
    (Py4JError minus its network subclass): a gateway/connection
    failure during the probe says nothing about the classpath, so it
    propagates instead of silently downgrading ``write_text`` to the
    delete-then-rename path — the exact misclassification this
    positive probe exists to eliminate (ADVICE r16)."""
    from py4j.protocol import Py4JError, Py4JNetworkError

    try:
        fc = jvm.org.apache.hadoop.fs.FileContext
        rename = jvm.org.apache.hadoop.fs.Options.Rename
    except Py4JNetworkError:
        raise
    except Py4JError:
        return False
    return (
        type(fc).__name__ != "JavaPackage"
        and type(rename).__name__ != "JavaPackage"
    )


def _fc_unavailable(e: Exception) -> bool:
    """True iff ``e`` means the FileContext overwrite-rename path does
    not EXIST for this scheme — the ``AbstractFileSystem`` binding is
    missing (UnsupportedFileSystemException; s3a has none). Class
    absence is detected positively by :func:`_fc_classes_present`
    before the attempt, so only the per-scheme binding gap may fall
    back to delete-then-rename here; anything else (transient RPC/IO
    failure on a store that has the binding, TypeError from bad
    arguments, py4j network errors) must propagate."""
    je = getattr(e, "java_exception", None)
    if je is None:
        return False
    try:
        name = str(je.getClass().getName())
    except Exception:
        return False
    return "UnsupportedFileSystemException" in name


class HadoopFS:
    """Hadoop ``FileSystem`` bookkeeping for scheme-qualified paths.

    Resolved once per store root (``FileSystem.get`` caches per
    scheme+authority inside the JVM); every method is a single py4j
    round-trip except the recursive parquet count, which streams a
    ``RemoteIterator``."""

    def __init__(self, spark: SparkSession, root: str):
        jvm = spark._jvm
        self._jvm = jvm
        self._gateway = spark.sparkContext._gateway
        self._conf = spark._jsc.hadoopConfiguration()
        self._fs = jvm.org.apache.hadoop.fs.FileSystem.get(
            jvm.java.net.URI.create(root),
            self._conf,
        )

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def exists(self, path: str) -> bool:
        return self._fs.exists(self._p(path))

    def is_dir(self, path: str) -> bool:
        p = self._p(path)
        return self._fs.exists(p) and self._fs.getFileStatus(p).isDirectory()

    def list_subdirs(self, root: str) -> list[str]:
        if not self.is_dir(root):
            return []
        return sorted(
            str(st.getPath().getName())
            for st in self._fs.listStatus(self._p(root))
            if st.isDirectory()
        )

    def count_parquet(self, root: str) -> int:
        if not self.is_dir(root):
            return 0
        it = self._fs.listFiles(self._p(root), True)
        n = 0
        root_uri = str(self._fs.makeQualified(self._p(root)).toUri().getPath())
        while it.hasNext():
            st = it.next()
            rel = str(st.getPath().toUri().getPath())
            if rel.startswith(root_uri):
                rel = rel[len(root_uri):].lstrip("/")
            parts = rel.split("/")
            if any(_hidden(c) for c in parts):
                continue
            if parts[-1].endswith(".parquet"):
                n += 1
        return n

    def list_files(self, root: str) -> list[str]:
        if not self.is_dir(root):
            return []
        it = self._fs.listFiles(self._p(root), True)
        out = []
        while it.hasNext():
            out.append(str(it.next().getPath().toString()))
        return sorted(out)

    def rmtree(self, path: str) -> None:
        p = self._p(path)
        if self._fs.exists(p):
            self._fs.delete(p, True)

    def rename(self, src: str, dst: str) -> None:
        if not self._fs.rename(self._p(src), self._p(dst)):
            raise OSError(f"HadoopFS rename failed: {src} -> {dst}")

    def makedirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def write_text(self, path: str, text: str) -> None:
        # write-then-rename so a crash mid-write can never leave a
        # truncated marker/manifest visible (LocalFS does the same via
        # os.replace). The replace itself prefers FileContext.rename
        # with Options.Rename.OVERWRITE — the one HDFS primitive whose
        # overwrite is a single atomic op. Plain FileSystem.rename
        # refuses to overwrite, so the fallback is delete-then-rename,
        # which on a crash between the two leaves the target MISSING
        # (not truncated); callers that need crash-safe overwrite on a
        # store without an AbstractFileSystem binding (e.g. s3a) must
        # treat a missing marker/manifest as "redo the write".
        tmp = path + "._tmp_write"
        out = self._fs.create(self._p(tmp), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        if _fc_classes_present(self._jvm):
            try:
                rename_cls = self._jvm.org.apache.hadoop.fs.Options.Rename
                opts = self._gateway.new_array(rename_cls, 1)
                opts[0] = rename_cls.OVERWRITE
                fc = (
                    self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                        self._p(path).toUri(), self._conf
                    )
                )
                fc.rename(self._p(tmp), self._p(path), opts)
                return
            except Exception as e:
                # fall back ONLY when the atomic path doesn't exist
                # for this scheme (no AbstractFileSystem binding, e.g.
                # s3a). Class absence was ruled out positively above,
                # so a transient I/O failure / TypeError / py4j error
                # on a store that HAS the binding surfaces here rather
                # than silently downgrading to the non-atomic two-step
                # replace — that would reopen the exact missing-file
                # crash window the FileContext path closes.
                if not _fc_unavailable(e):
                    raise
        if self._fs.exists(self._p(path)):
            self._fs.delete(self._p(path), False)
        if not self._fs.rename(self._p(tmp), self._p(path)):
            raise OSError(f"HadoopFS write_text rename failed: {path}")

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._p(path))
        try:
            return str(
                self._jvm.org.apache.commons.io.IOUtils.toString(
                    stream, "UTF-8"
                )
            )
        finally:
            stream.close()

    def set_mtime(self, path: str, t: float) -> None:
        # (mtime_ms, atime_ms); -1 leaves atime unchanged
        self._fs.setTimes(self._p(path), int(t * 1000), -1)


def for_path(spark: SparkSession, path: str):
    """Pick the bookkeeping implementation from the path's scheme:
    scheme-qualified -> :class:`HadoopFS`, bare -> :class:`LocalFS`."""
    if _SCHEME.match(path):
        return HadoopFS(spark, path)
    return LocalFS()


def write_staged_slice(
    fs, part, slice_dir: str, files_per_slice: int, mtime: float,
    op_name: str,
) -> None:
    """Write one replay-staging slice as EXACTLY ``files_per_slice``
    parquet files, all stamped ``mtime`` — the shared half of the
    ``slice_events_table`` / ``slice_documents_table`` contract (one
    mtime per micro-batch, file count matching the reader's
    ``maxFilesPerTrigger``). Raises if the landed file count differs
    (too few rows for the requested geometry)."""
    part = (
        part.repartition(files_per_slice)
        if files_per_slice > 1
        else part.coalesce(1)
    )
    part.write.mode("overwrite").parquet(slice_dir)
    got = fs.count_parquet(slice_dir)
    if got != files_per_slice:
        raise ValueError(
            f"{op_name}: slice at {slice_dir} wrote {got} parquet "
            f"files, expected {files_per_slice} — too few rows for "
            "the requested geometry; lower files_per_slice"
        )
    for fpath in fs.list_files(slice_dir):
        fs.set_mtime(fpath, mtime)
