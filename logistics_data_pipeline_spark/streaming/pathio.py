"""Scheme-aware path I/O for the foreachBatch sink markers/manifests.

The versioned-table sinks (``upsert_sink``, ``rollup_sink``,
``dedup_corpus_sink``) keep a tiny control file (_CURRENT / _MANIFEST)
next to their data. On a LOCAL path that file is committed with
write-temp + ``os.replace`` (POSIX-atomic). On an OBJECT-STORE path
(s3a://…) rename is the slow, non-atomic operation and single-object
PUT is the atomic one — so there the commit is one
``FileSystem.create(overwrite=true)`` call through the Hadoop
FileSystem API, which the reference's MinIO deployment
(consumer_to_minio.py:36-45) and the compiled test FS
(resources/testfs) both serve. Everything routes on the presence of a
URI scheme, so the same sink code runs against either layout.

Only CONTROL-file bytes move through here; data files always go
through Spark's own writers/committers.
"""

from __future__ import annotations

import os


def _is_uri(path: str) -> bool:
    return "://" in path


def _jfs(spark, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()), p, jvm


def read_text(spark, path: str) -> str | None:
    """Contents of a small control file, or None if absent."""
    if not _is_uri(path):
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return fh.read()
    fs, p, jvm = _jfs(spark, path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def write_text_atomic(spark, path: str, content: str) -> None:
    """Commit a small control file: POSIX rename locally, single PUT
    (create overwrite=true) on object stores — each layout's atomic
    primitive."""
    if not _is_uri(path):
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(content)
        os.replace(tmp, path)
        return
    fs, p, _ = _jfs(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def is_dir(spark, path: str) -> bool:
    if not _is_uri(path):
        return os.path.isdir(path)
    fs, p, _ = _jfs(spark, path)
    return bool(fs.exists(p) and fs.getFileStatus(p).isDirectory())


def make_dirs(spark, path: str) -> None:
    if not _is_uri(path):
        os.makedirs(path, exist_ok=True)
        return
    fs, p, _ = _jfs(spark, path)
    fs.mkdirs(p)


def join(base: str, *parts: str) -> str:
    """Path join that never mangles a URI scheme."""
    if not _is_uri(base):
        return os.path.join(base, *parts)
    return "/".join([base.rstrip("/"), *parts])
