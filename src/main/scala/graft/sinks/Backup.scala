package graft.sinks

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** Backup/archival sink: copy finished log directories to an archive
  * filesystem — the polardbx-cdc-backup analog (uploads finished binlog
  * files to object storage). Uses the Hadoop FileSystem API, so the
  * destination can be any configured scheme (file://, hdfs://, s3a://,
  * oss:// ...) with zero code change; locally it copies directories. */
object Backup {

  /** Copy a finished output directory into the archive, preserving the
    * directory name. Returns the number of files copied. Idempotent:
    * an existing identical archive dir is overwritten atomically-enough
    * for append-only logs (copy to temp, rename). */
  def archive(spark: SparkSession, srcDir: String, archiveRoot: String): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new Path(srcDir)
    val srcFs = src.getFileSystem(conf)
    require(srcFs.exists(src), s"source missing: $srcDir")
    val dstRoot = new Path(archiveRoot)
    val dstFs = dstRoot.getFileSystem(conf)
    dstFs.mkdirs(dstRoot)
    val tmp = new Path(dstRoot, src.getName + ".__tmp")
    val dst = new Path(dstRoot, src.getName)
    if (dstFs.exists(tmp)) dstFs.delete(tmp, true)
    FileUtil.copy(srcFs, src, dstFs, tmp, false, conf)
    if (dstFs.exists(dst)) dstFs.delete(dst, true)
    dstFs.rename(tmp, dst)
    countFiles(dstFs, dst)
  }

  private def countFiles(fs: FileSystem, p: Path): Int = {
    val it = fs.listFiles(p, true)
    var n = 0
    while (it.hasNext) { it.next(); n += 1 }
    n
  }
}
