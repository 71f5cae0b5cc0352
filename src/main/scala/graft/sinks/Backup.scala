package graft.sinks

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** Backup/archival sink: copy finished log directories to an archive
  * filesystem — the polardbx-cdc-backup analog (uploads finished binlog
  * files to object storage). Uses the Hadoop FileSystem API, so the
  * destination can be any configured scheme (file://, hdfs://, s3a://,
  * oss:// ...) with zero code change.
  *
  * The copy is a SPARK JOB — one task per file — so a multi-TB archive
  * of finished segments moves at cluster aggregate bandwidth instead of
  * funneling through a single driver thread; only the file LISTING and
  * the final rename commit run on the driver (metadata-sized). */
object Backup {

  /** Copy a finished output directory into the archive, preserving the
    * directory name. Returns the number of files copied. Idempotent:
    * an existing identical archive dir is overwritten atomically-enough
    * for append-only logs (copy to temp, rename — the distcp commit
    * shape). */
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
    dstFs.mkdirs(tmp)

    // driver work is metadata only: enumerate (relative path) pairs
    val srcUri = srcFs.makeQualified(src).toUri
    val files = {
      val it = srcFs.listFiles(src, true)
      val b = Seq.newBuilder[String]
      while (it.hasNext) {
        val st = it.next()
        b += srcUri.relativize(st.getPath.toUri).getPath
      }
      b.result()
    }

    if (files.nonEmpty) {
      // per-file copy tasks; file lists are small relative to bytes, so
      // one file per task slot keeps the largest segment from serializing
      // the whole archive behind it
      val confMap = graft.util.HadoopIo.confMap
      val srcStr = srcFs.makeQualified(src).toString
      val tmpStr = dstFs.makeQualified(tmp).toString
      val slots = math.max(1, math.min(files.size,
        spark.sparkContext.defaultParallelism))
      import spark.implicits._
      val copied = spark.createDataset(files).repartition(slots)
        .mapPartitions { rels =>
          val c = graft.util.HadoopIo.confFrom(confMap)
          val sFs = new Path(srcStr).getFileSystem(c)
          val dFs = new Path(tmpStr).getFileSystem(c)
          var n = 0L
          rels.foreach { rel =>
            val from = new Path(srcStr, rel)
            val to = new Path(tmpStr, rel)
            dFs.mkdirs(to.getParent)
            if (!FileUtil.copy(sFs, from, dFs, to, false, true, c))
              sys.error(s"archive copy failed: $from -> $to")
            n += 1
          }
          Iterator.single(n)
        }.reduce(_ + _)
      require(copied == files.size,
        s"archive copied $copied of ${files.size} files")
    }

    if (dstFs.exists(dst)) dstFs.delete(dst, true)
    if (!dstFs.rename(tmp, dst)) sys.error(s"rename $tmp -> $dst failed")
    countFiles(dstFs, dst)
  }

  private def countFiles(fs: FileSystem, p: Path): Int = {
    val it = fs.listFiles(p, true)
    var n = 0
    while (it.hasNext) { it.next(); n += 1 }
    n
  }
}
