package graft.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file and directory IO through the Hadoop FileSystem API, so
  * every target/sink path in the library (ordered logs, bucketed applier
  * targets, manifest-versioned txn targets) works on any configured
  * scheme — file://, hdfs://, s3a://, oss:// — with zero code change.
  * A 100 TB target lives on a distributed store; `java.io.File` paths
  * would pin the whole applier/sink layer to a single local disk.
  *
  * (The reference's remote-storage layer makes the same move once:
  * polardbx-cdc-storage routes binlog upload/download through a pluggable
  * filesystem abstraction rather than local file handles.)
  */
object HadoopIo {

  /** The active session's Hadoop conf (honors spark.hadoop.* settings —
    * credentials, endpoints), or a default conf off the classpath. */
  def conf: Configuration =
    SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  /** The conf flattened to a serializable Map, for executor-side
    * FileSystem access inside closures (Configuration itself is not
    * serializable; the default conf on an executor would miss session
    * credentials for object stores). */
  def confMap: Map[String, String] = {
    val c = conf
    val it = c.iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
    b.result()
  }

  def confFrom(m: Map[String, String]): Configuration = {
    val c = new Configuration(false)
    m.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** The path's FileSystem; for file:// the RAW local FS (no .crc
    * sidecars — a checksum sidecar next to a cursor/manifest file goes
    * stale the moment any other tool rewrites it, failing every
    * subsequent read; remote schemes keep their own integrity layers). */
  def fsOf(p: Path): FileSystem =
    p.getFileSystem(conf) match {
      case l: org.apache.hadoop.fs.LocalFileSystem => l.getRaw
      case other => other
    }

  def readString(p: Path): String = {
    val in = fsOf(p).open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Write-temp + delete + rename: atomic publication on rename-atomic
    * stores (HDFS, local); callers that read the destination concurrently
    * should retry once across the delete→rename window. */
  def writeSwap(tmp: Path, dst: Path, body: String): Unit = {
    val fs = fsOf(dst)
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst)) sys.error(s"rename $tmp -> $dst failed")
  }

  def deleteIfExists(p: Path): Unit = {
    val fs = fsOf(p)
    if (fs.exists(p)) fs.delete(p, true)
  }

  def renameOrFail(src: Path, dst: Path): Unit = {
    if (!fsOf(src).rename(src, dst)) sys.error(s"rename $src -> $dst failed")
  }
}
