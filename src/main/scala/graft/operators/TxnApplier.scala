package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Transaction-preserving apply: the target only ever exposes states that
  * some source transaction boundary produced.
  *
  * Reference semantics: TransactionApplier applies whole transactions in
  * commit order, each inside one target transaction, merging consecutive
  * small transactions into one target commit to amortize round-trips
  * (polardbx-cdc-rpl/.../applier/TransactionApplier.java:40-104, the
  * merge-to-accelerate loop at :50-87); SplitTransactionApplier
  * parallelizes the work INSIDE a transaction boundary by table
  * (SplitTransactionApplier.java:38-95). The mode exists for consumers
  * that audit transactional consistency — the reference's bank-transfer
  * QA asserts a constant total balance at every observable target state
  * (polardbx-cdc-transfer/.../Bank.java:90-92,175-198). A merge-applied
  * target (Appliers.applyBatchToBucketedParquet) converges to the same
  * final state but can expose half of txn A with half of txn B mid-batch.
  *
  * Spark restatement — a manifest-versioned bucketed target (the
  * version-pointer indirection every table format uses):
  *
  * {{{
  *   target/
  *     data/v00000007/__bucket=k/...   immutable parquet, written once
  *     _manifests/v00000007.manifest   bucket -> data dir, one per commit
  *     _current                        "version,lastTso" — atomic rename
  * }}}
  *
  * A commit rewrites ONLY the buckets its transactions touch (new files
  * under a fresh version dir), writes a manifest mapping every bucket to
  * its current data dir (touched -> new, untouched -> carried over), and
  * atomically renames the `_current` pointer. Readers resolve `_current`
  * once and read that manifest's files — they observe exactly one
  * committed version, never a torn mix, and in-flight commits are
  * invisible until the pointer lands. Per commit the work is
  * O(touched buckets), the write is fully parallel across buckets
  * (SplitTransactionApplier's intra-txn parallelism for free), and the
  * observable-state granularity is the transaction group — the
  * TransactionApplier contract at lake scale.
  *
  * The driver-side loop over commit groups is the semantics, not an
  * accident: transaction order IS serial (the reference's tranApply loop).
  * `txnsPerCommit` > 1 is the reference's own small-transaction merging —
  * every commit boundary is still a transaction boundary.
  */
object TxnApplier {

  /** A committed target version and the last TSO it covers. */
  final case class Commit(version: Long, lastTso: Long)

  private def manifestDir(dir: String) = new java.io.File(dir, "_manifests")
  private def currentFile(dir: String) = new java.io.File(dir, "_current")
  private def manifestFile(dir: String, v: Long) =
    new java.io.File(manifestDir(dir), f"v$v%08d.manifest")
  private def dataDir(dir: String, v: Long) =
    new java.io.File(dir, f"data/v$v%08d")

  /** The committed version pointer, or None for an un-bootstrapped dir. */
  def currentCommit(dir: String): Option[Commit] = {
    val f = currentFile(dir)
    if (!f.isFile) None
    else {
      val parts = new String(java.nio.file.Files.readAllBytes(f.toPath))
        .trim.split(",")
      Some(Commit(parts(0).toLong, parts(1).toLong))
    }
  }

  /** All committed versions, oldest first (the observable-state history —
    * each was `_current` for some interval). */
  def versions(dir: String): Seq[Long] =
    Option(manifestDir(dir).listFiles()).toSeq.flatten
      .filter(_.getName.endsWith(".manifest"))
      .map(_.getName.stripPrefix("v").stripSuffix(".manifest").toLong)
      .sorted

  private def readManifest(dir: String, v: Long): Map[Int, String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.readAllLines(manifestFile(dir, v).toPath).asScala
      .filter(_.nonEmpty).map { line =>
        val Array(b, p) = line.split("\t", 2)
        b.toInt -> p
      }.toMap
  }

  private def writeManifest(dir: String, v: Long, entries: Map[Int, String]): Unit = {
    manifestDir(dir).mkdirs()
    val body = entries.toSeq.sortBy(_._1)
      .map { case (b, p) => s"$b\t$p" }.mkString("\n")
    val tmp = new java.io.File(manifestDir(dir), s".v$v.tmp")
    java.nio.file.Files.write(tmp.toPath, body.getBytes)
    java.nio.file.Files.move(tmp.toPath, manifestFile(dir, v).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** The atomic commit point: everything before this rename is invisible
    * to readers; a crash before it leaves the previous version current
    * (orphan data files, reclaimed by vacuum). */
  private def commitPointer(dir: String, c: Commit): Unit = {
    val tmp = new java.io.File(dir, "._current.tmp")
    java.nio.file.Files.write(tmp.toPath, s"${c.version},${c.lastTso}".getBytes)
    java.nio.file.Files.move(tmp.toPath, currentFile(dir).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def listBucketDirs(d: java.io.File): Map[Int, java.io.File] =
    Option(d.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("__bucket="))
      .map(f => f.getName.stripPrefix("__bucket=").toInt -> f).toMap

  private def relativize(dir: String, f: java.io.File): String =
    new java.io.File(dir).toPath.toAbsolutePath
      .relativize(f.toPath.toAbsolutePath).toString

  /** Read one committed version (time travel over observable states). */
  def readVersion(spark: SparkSession, dir: String, v: Long): DataFrame = {
    val paths = readManifest(dir, v).values.toSeq.sorted
      .map(rel => new java.io.File(dir, rel).toString)
    if (paths.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(paths: _*)
  }

  /** Read the current committed state (what any consumer sees). */
  def readCurrent(spark: SparkSession, dir: String): DataFrame =
    currentCommit(dir) match {
      case Some(c) => readVersion(spark, dir, c.version)
      case None => sys.error(s"txn target $dir: not bootstrapped")
    }

  /** Initial full state as version 1 (the RPL full-copy handoff point).
    * `initial` must carry the same columns a change-batch row does (key,
    * seq, op, payload) — the target's row shape is the batch's. */
  def bootstrap(initial: DataFrame, keyCols: Seq[String], dir: String,
      nBuckets: Int, initialTso: Long = 0L): Unit = {
    if (currentCommit(dir).isDefined)
      sys.error(s"txn target $dir: already bootstrapped")
    val v = 1L
    val d = dataDir(dir, v)
    initial.withColumn("__bucket", Appliers.bucketOf(keyCols, nBuckets))
      .write.partitionBy("__bucket").mode(SaveMode.Overwrite)
      .parquet(d.toString)
    val entries = listBucketDirs(d)
      .map { case (b, f) => b -> relativize(dir, f) }
    writeManifest(dir, v, entries)
    commitPointer(dir, Commit(v, initialTso))
  }

  /** Apply a change batch preserving transaction atomicity: transactions
    * (grouped by `tsoCol`, the commit TSO) are applied in TSO order,
    * `txnsPerCommit` consecutive transactions per atomic target commit.
    * Exactly-once across batch replays: transactions at or below the
    * committed `lastTso` are skipped, so a foreachBatch replay after a
    * crash resumes at the first unapplied transaction — a half-applied
    * batch never doubles.
    *
    * Cost shape: the per-group final images come from ONE staged window
    * agg over the whole batch; each commit then reads and rewrites only
    * its touched buckets. The commit loop is driver-side by design
    * (transactions are ordered); its length is the batch's transaction
    * count / txnsPerCommit, bounded by the micro-batch size. */
  def applyBatch(batch: DataFrame, keyCols: Seq[String], seqCol: String,
      opCol: String, tsoCol: String, dir: String, nBuckets: Int = 64,
      txnsPerCommit: Int = 1): Seq[Commit] = {
    val spark = batch.sparkSession
    val start = currentCommit(dir)
      .getOrElse(sys.error(s"txn target $dir: bootstrap first"))
    val fresh = batch.filter(col(tsoCol) > start.lastTso)
    // distinct commit TSOs in order — bounded by the batch's txn count
    val tsos = fresh.select(col(tsoCol).cast("long").as("__tso")).distinct()
      .orderBy(col("__tso")).collect().map(_.getLong(0))
    if (tsos.isEmpty) return Seq.empty
    val groups = tsos.grouped(math.max(1, txnsPerCommit)).toVector
    import spark.implicits._
    val grpDf = groups.zipWithIndex
      .flatMap { case (g, i) => g.map(t => (t, i)) }.toDF("__gtso", "__grp")
    // ONE window agg derives every group's final images (partitioned by
    // (group, key) so a key updated in txn 2 and txn 7 keeps one image per
    // group); staged so the per-group filters below don't re-derive it
    val staging = new java.io.File(dir, "_batchstage")
    if (staging.exists())
      org.apache.commons.io.FileUtils.deleteDirectory(staging)
    try {
      val images = Staged.parquetStage(
        Appliers.mergeToFinalImages(
          fresh.join(broadcast(grpDf), col(tsoCol) === col("__gtso"))
            .drop("__gtso"),
          "__grp" +: keyCols, seqCol, opCol)
          .withColumn("__bucket", Appliers.bucketOf(keyCols, nBuckets)),
        new java.io.File(staging, "images").toString)
      val commits = Seq.newBuilder[Commit]
      groups.zipWithIndex.foreach { case (g, i) =>
        val gi = images.filter(col("__grp") === i).drop("__grp")
        commits += applyImagesAsCommit(spark, dir, gi, keyCols, nBuckets,
          lastTso = g.last)
      }
      commits.result()
    } finally {
      if (staging.exists())
        org.apache.commons.io.FileUtils.deleteDirectory(staging)
    }
  }

  /** One atomic commit: merge a group's final images into its touched
    * buckets under a fresh version dir, carry untouched buckets over in
    * the manifest, swing the pointer. */
  private def applyImagesAsCommit(spark: SparkSession, dir: String,
      images: DataFrame, keyCols: Seq[String], nBuckets: Int,
      lastTso: Long): Commit = {
    val cur = currentCommit(dir).get
    val manifest = readManifest(dir, cur.version)
    val touched = images.select("__bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    val v = cur.version + 1
    val out = dataDir(dir, v)
    val touchedPaths = touched.toSeq.sorted.flatMap(manifest.get)
      .map(rel => new java.io.File(dir, rel).toString)
    val merged =
      if (touchedPaths.nonEmpty) {
        val target = spark.read.parquet(touchedPaths: _*)
        Appliers.upsert(target, images, keyCols)
      } else {
        // all-new buckets: nothing to merge with — but keep the TARGET's
        // column set (a batch may carry extra plumbing columns like the
        // commit TSO that the stored rows must not accrete)
        val inserts = images.filter(col("effective_op") =!= "DELETE")
        manifest.values.toSeq.sorted.headOption match {
          case Some(rel) => // footer-only schema probe of any current file
            val cols = spark.read
              .parquet(new java.io.File(dir, rel).toString).columns
            inserts.select(cols.map(col).toSeq: _*)
          case None => inserts.drop("effective_op", "__bucket")
        }
      }
    merged.withColumn("__bucket", Appliers.bucketOf(keyCols, nBuckets))
      .write.partitionBy("__bucket").mode(SaveMode.Overwrite)
      .parquet(out.toString)
    // survivors discovered from the written layout — no extra job; the
    // old version's files are immutable, so there is no read-after-
    // replace hazard anywhere in this path
    val newDirs = listBucketDirs(out)
      .map { case (b, f) => b -> relativize(dir, f) }
    val entries = (manifest -- touched) ++ newDirs
    writeManifest(dir, v, entries)
    commitPointer(dir, Commit(v, lastTso))
    Commit(v, lastTso)
  }

  /** Reclaim data dirs no manifest ≥ `keepFrom` references (default: only
    * the current version's files are retained). Manifests are kept — they
    * are the observable-state history and cost O(nBuckets) text each. */
  def vacuum(dir: String, keepFrom: Option[Long] = None): Unit = {
    val cur = currentCommit(dir).map(_.version).getOrElse(return)
    val from = keepFrom.getOrElse(cur)
    val referenced = versions(dir).filter(_ >= from)
      .flatMap(v => readManifest(dir, v).values)
      .map(rel => new java.io.File(dir, rel).getCanonicalPath).toSet
    val dataRoot = new java.io.File(dir, "data")
    Option(dataRoot.listFiles()).toSeq.flatten
      .filter(_.isDirectory).foreach { vd =>
        listBucketDirs(vd).values
          .filterNot(f => referenced.contains(f.getCanonicalPath))
          .foreach(org.apache.commons.io.FileUtils.deleteDirectory)
        if (Option(vd.listFiles()).exists(_.isEmpty)) vd.delete()
      }
  }
}
