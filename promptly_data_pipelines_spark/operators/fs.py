"""Object-store / filesystem operations (SURVEY.md §2a S8) — the
reference's MinIO adapter surface (promptly/adapters/s3.py:25-63:
upload_file, download_file, list_objects, create_bucket) re-provided
over the Hadoop FileSystem API, so the same calls work on local paths
in tests and on s3a:// / gs:// / abfs:// URIs on a cluster with the
corresponding connector on the classpath. No boto3-style client: the
engine's storage access goes through the same layer Spark's own
readers use."""

from __future__ import annotations

from pyspark.sql import SparkSession


class FileSystemOps:
    """Thin typed wrapper over org.apache.hadoop.fs.FileSystem."""

    def __init__(self, spark: SparkSession, base_uri: str = ""):
        self._spark = spark
        self._jvm = spark.sparkContext._jvm
        self._conf = spark.sparkContext._jsc.hadoopConfiguration()
        self._base = base_uri.rstrip("/")

    def _path(self, p: str):
        full = f"{self._base}/{p}" if self._base and "://" not in p else p
        return self._jvm.org.apache.hadoop.fs.Path(full)

    def _fs_path(self, p: str):
        """One Path construction per logical op: (FileSystem, Path).
        Building the Path twice (once discarded inside a _fs helper)
        doubled the py4j round trips of every method — noticeable in
        the compaction sizing walk over fragmented tables."""
        jp = self._path(p)
        return jp.getFileSystem(self._conf), jp

    def mkdirs(self, path: str) -> bool:
        """create_bucket analog (s3.py:56-63): ensure the container exists."""
        fs, jp = self._fs_path(path)
        return fs.mkdirs(jp)

    def exists(self, path: str) -> bool:
        fs, jp = self._fs_path(path)
        return fs.exists(jp)

    def list_paths(self, path: str) -> list[str]:
        """list_objects analog (s3.py:47-54)."""
        fs, jp = self._fs_path(path)
        it = fs.listStatus(jp)
        return sorted(str(s.getPath()) for s in it)

    def put_text(self, path: str, content: str) -> None:
        """upload_file analog (s3.py:25-34) for small control files
        (configs, manifests — the reference uploads a sample CSV)."""
        fs, jp = self._fs_path(path)
        out = fs.create(jp, True)
        try:
            out.write(bytearray(content.encode("utf-8")))
        finally:
            out.close()

    def get_text(self, path: str) -> str:
        """download_file analog (s3.py:36-45). Reads the RAW bytes in
        one JVM call (InputStream.readAllBytes, Java 9+) — the old
        readLine loop silently dropped trailing newlines, normalized
        CRLF, and cost one py4j round trip per line, so the
        put_text/get_text round trip wasn't byte-identical."""
        fs, jp = self._fs_path(path)
        stream = fs.open(jp)
        try:
            return bytes(stream.readAllBytes()).decode("utf-8")
        finally:
            stream.close()

    def delete(self, path: str, recursive: bool = False) -> bool:
        fs, jp = self._fs_path(path)
        return fs.delete(jp, recursive)

    def rename(self, src: str, dst: str) -> bool:
        """FileSystem.rename — atomic metadata op on HDFS/local,
        copy+delete on object stores (see maintenance.py caveats)."""
        fs, jsrc = self._fs_path(src)
        return fs.rename(jsrc, self._path(dst))

    def file_size(self, path: str) -> int:
        fs, jp = self._fs_path(path)
        return fs.getFileStatus(jp).getLen()

    def list_files_recursive(self, path: str) -> list[str]:
        """All file (non-directory) paths under ``path``, any depth —
        the compaction sizing walk, scheme-agnostic."""
        fs, jp = self._fs_path(path)
        it = fs.listFiles(jp, True)
        out = []
        while it.hasNext():
            out.append(str(it.next().getPath()))
        return sorted(out)
