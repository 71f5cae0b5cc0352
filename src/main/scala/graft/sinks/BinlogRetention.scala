package graft.sinks

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Backup-COUPLED retention for a live wire-log directory: local files
  * may be purged only once their archived copy exists — the reference's
  * cleaner contract, where `purgeLocal` deletes only what
  * `purgeRemote`'s upload set covers (polardbx-cdc-backup/.../clean/
  * BinlogCleaner.java:75 purgeLocal, :122 purgeRemote; ICleanerBarrier).
  * [[Backup.archive]] is the one-shot whole-directory copy; this object
  * is its LIVE sibling: incremental per-file archival that can run
  * beside the producing query, and a purge whose barrier consults the
  * archive itself — so the two passes cannot race each other into data
  * loss, whatever order or frequency they run in.
  *
  * Archive layout matches [[Backup.archive]]: `<archiveRoot>/<dirName>/
  * <file>`, any Hadoop scheme. Files land via copy-to-hidden-tmp +
  * atomic rename, so a reader of the archive never sees a partial file.
  *
  * Crash/replay interplay with the producer: a replayed CdcBinlog batch
  * deletes and rewrites its own files BYTE-IDENTICALLY (the replay
  * contract), so an archived copy taken before the replay stays valid.
  * Defense in depth for a producer that breaks that contract: the copy
  * re-verifies the local length after landing, and the purge barrier
  * requires the archived length to MATCH the local file — divergence
  * blocks the purge (loudly visible as retention not advancing) instead
  * of deleting the only good copy.
  */
object BinlogRetention {

  /** Retention orders by NAME; a dir caught mid-pad-upgrade (both
    * `binlog.NNNNNN.*` and `binlog.<12-digit>.*` present) name-sorts
    * WRONG (the wide names of early batches sort below narrow names of
    * later ones), so "finished prefix" and "purge prefix" would both
    * lie. The producing query migrates at startup; retention — a
    * separate job that does not own the dir — must refuse instead of
    * guessing. */
  private def refuseMixedPads(names: Seq[String], dir: String): Unit = {
    val narrow = names.exists(_.matches("""binlog\.\d{1,11}\..*"""))
    val wide = names.exists(_.matches("""binlog\.\d{12}\..*"""))
    require(!(narrow && wide),
      s"BinlogRetention: $dir holds MIXED batch pad widths (a pad " +
        "upgrade is in flight) — name order is unreliable; start the " +
        "producing query once to migrate, then retry retention")
  }

  /** Archive every FINISHED local file (all but the newest name — the
    * active head) that the archive does not already hold at the right
    * length. Returns the newly archived names. The copy fans out as one
    * Spark task per file (aggregate bandwidth, like [[Backup.archive]]);
    * listing and renames are driver metadata work. */
  def archiveFinished(spark: SparkSession, dir: String,
      archiveRoot: String, filePrefix: String = "binlog."): Seq[String] = {
    val src = new Path(dir)
    val srcFs = graft.util.HadoopIo.fsOf(src)
    if (!srcFs.exists(src)) return Seq.empty
    val local = srcFs.listStatus(src).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith(filePrefix))
      .map(st => (st.getPath.getName, st.getLen))
      .sortBy(_._1)
    refuseMixedPads(local.map(_._1), dir)
    if (local.size <= 1) return Seq.empty // nothing finished yet
    val finished = local.dropRight(1)
    val dstDir = new Path(archiveRoot, src.getName)
    val dstFs = dstDir.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    dstFs.mkdirs(dstDir)
    val have: Map[String, Long] = dstFs.listStatus(dstDir).toSeq
      .filter(_.isFile)
      .map(st => st.getPath.getName -> st.getLen).toMap
    val todo = finished.filter { case (n, len) =>
      !have.get(n).contains(len)
    }
    if (todo.isEmpty) return Seq.empty
    val confMap = graft.util.HadoopIo.confMap
    val srcStr = srcFs.makeQualified(src).toString
    val dstStr = dstFs.makeQualified(dstDir).toString
    import spark.implicits._
    val slots = math.max(1, math.min(todo.size,
      spark.sparkContext.defaultParallelism))
    val landed = spark.createDataset(todo).repartition(slots)
      .mapPartitions { it =>
        val c = graft.util.HadoopIo.confFrom(confMap)
        val sFs = new Path(srcStr).getFileSystem(c)
        val dFs = new Path(dstStr).getFileSystem(c)
        it.flatMap { case (name, expectLen) =>
          val from = new Path(srcStr, name)
          val tmp = new Path(dstStr, s".$name.__tmp")
          val to = new Path(dstStr, name)
          if (dFs.exists(tmp)) dFs.delete(tmp, true)
          if (!FileUtil.copy(sFs, from, dFs, tmp, false, true, c))
            sys.error(s"archive copy failed: $from -> $to")
          // the local file must not have changed under the copy (a
          // producer replay window); a moved target drops the attempt
          // — the next pass re-copies the settled bytes
          val stillSame =
            try sFs.getFileStatus(from).getLen == expectLen &&
              dFs.getFileStatus(tmp).getLen == expectLen
            catch { case _: java.io.FileNotFoundException => false }
          if (!stillSame) { dFs.delete(tmp, true); Iterator.empty }
          else {
            if (dFs.exists(to)) dFs.delete(to, false)
            if (!dFs.rename(tmp, to))
              sys.error(s"archive rename failed: $tmp -> $to")
            Iterator.single(name)
          }
        }
      }.collect().toSeq.sorted
    landed
  }

  /** [[BinlogCatalog.purgeBefore]] with the ARCHIVED-ONLY barrier: a
    * local file is purgeable only when the archive holds it at the same
    * length. The first unarchived file stops the purge (prefix-only
    * semantics keep the surviving log contiguous). Returns purged
    * names. */
  def purgeArchivedBefore(spark: SparkSession, dir: String,
      archiveRoot: String, tso: Long,
      filePrefix: String = "binlog."): Seq[String] = {
    val src = new Path(dir)
    val dstDir = new Path(archiveRoot, src.getName)
    val dstFs = dstDir.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val have: Map[String, Long] =
      if (!dstFs.exists(dstDir)) Map.empty
      else dstFs.listStatus(dstDir).toSeq.filter(_.isFile)
        .map(st => st.getPath.getName -> st.getLen).toMap
    val srcFs = graft.util.HadoopIo.fsOf(src)
    if (srcFs.exists(src))
      refuseMixedPads(srcFs.listStatus(src).toSeq
        .filter(st => st.isFile &&
          st.getPath.getName.startsWith(filePrefix))
        .map(_.getPath.getName), dir)
    BinlogCatalog.purgeBefore(spark, dir, tso, filePrefix,
      barrier = name =>
        try have.get(name)
          .contains(srcFs.getFileStatus(new Path(src, name)).getLen)
        catch { case _: java.io.FileNotFoundException => false })
  }

  /** One retention pass: archive the finished prefix, then purge what
    * the archive now covers. Safe in any interleaving with the live
    * producer — the purge consults the archive state this pass just
    * established, never an assumption. */
  def pass(spark: SparkSession, dir: String, archiveRoot: String,
      tso: Long, filePrefix: String = "binlog.")
      : (Seq[String], Seq[String]) = {
    val archived = archiveFinished(spark, dir, archiveRoot, filePrefix)
    val purged = purgeArchivedBefore(spark, dir, archiveRoot, tso,
      filePrefix)
    (archived, purged)
  }

  /** Batch decode of the FULL history across the purge boundary: the
    * archived prefix plus the live suffix, deduplicated by file name
    * (the live copy wins — it is the writer's own byte). A consumer
    * bootstrapping from scratch reads this; an auto-position consumer
    * whose cursor is past the purge point keeps using the live dir
    * alone (surviving files' cumulative PREVIOUS_GTIDS cover the purged
    * prefix). */
  def readStitched(spark: SparkSession, dir: String, archiveRoot: String,
      colNames: Map[(String, String), Seq[String]],
      filePrefix: String = "binlog."): DataFrame = {
    val src = new Path(dir)
    val srcFs = graft.util.HadoopIo.fsOf(src)
    val liveNames: Set[String] =
      if (!srcFs.exists(src)) Set.empty
      else srcFs.listStatus(src).toSeq
        .filter(st => st.isFile && st.getPath.getName.startsWith(filePrefix))
        .map(_.getPath.getName).toSet
    val archDir = new Path(archiveRoot, src.getName)
    val archFs = archDir.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val archOnly: Seq[String] =
      if (!archFs.exists(archDir)) Seq.empty
      else archFs.listStatus(archDir).toSeq
        .filter(st => st.isFile &&
          st.getPath.getName.startsWith(filePrefix) &&
          !liveNames.contains(st.getPath.getName))
        .map(_.getPath.getName)
    val live = BinlogWire.readBinlogFiles(spark, dir, colNames)
    if (archOnly.isEmpty) live
    else BinlogWire.readBinlogFiles(spark, archDir.toString, colNames)
      .filter(org.apache.spark.sql.functions.col("log_file")
        .isin(archOnly: _*))
      .unionByName(live)
  }
}
