package graft.util

import org.apache.hadoop.fs.{Path, RawLocalFileSystem, LocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem without per-path chmod processes.
  *
  * Hadoop's RawLocalFileSystem applies permissions by SHELLING OUT to
  * `chmod` when the native hadoop library is absent — one forked
  * process per created file and directory. On a large-heap JVM a fork
  * costs ~100 ms+, so every parquet write pays ~140 ms per file and
  * per partition directory of pure process-spawn overhead (measured:
  * a 128-dir dynamic-partition commit spent 13-18 s in chmod forks).
  * Real deployments talk to HDFS/S3 where permissions are native
  * RPCs; this class exists so LOCAL harness runs (bench, verify,
  * tests) measure the engine, not the JDK's fork path. Files get the
  * process umask's default permissions, which is what the chmod was
  * setting anyway for any sane umask.
  *
  * Wire with `spark.hadoop.fs.file.impl=graft.util.NoChmodLocalFs`.
  */
class NoChmodRawLocalFs extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = ()
}

class NoChmodLocalFs extends LocalFileSystem(new NoChmodRawLocalFs)
