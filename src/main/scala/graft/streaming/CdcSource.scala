package graft.streaming

import java.util.{Map => JMap}

import scala.collection.immutable.SortedMap
import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.model.{ChangeEvent, GtidSet}
import graft.sources.{BinlogDumpClient, ChangeEventSource}

/** `spark.readStream.format("graft-cdc")` — the live COM_BINLOG_DUMP
  * dialogue as a FIRST-CLASS Structured Streaming source: the standing
  * replica runs as a checkpointed streaming query (Spark-managed
  * offsets, triggers, progress metrics, the streaming UI) instead of a
  * hand-rolled driver poll loop.
  *
  * Reference semantics: the standing dump dialogue every extractor
  * keeps open against its DN (canal/core/dump/MysqlConnection.java, the
  * RPC hop in task/.../extractor/RpcExtractor.java:61), re-expressed in
  * Spark's source contract rather than a thread per connection.
  *
  * **The offset IS the executed GTID set** — one set per DN, serialized
  * as JSON into Spark's offset log. That makes Spark's own
  * checkpoint/WAL the replica's position store: a kill/restart resumes
  * from the last committed batch with no sidecar files, and because a
  * GTID cursor names TRANSACTIONS, not byte addresses, the same
  * checkpoint survives source failover and log renumbering (repoint
  * host/port, keep the checkpoint).
  *
  * Per trigger, `latestOffset` runs ONE distributed job — one task per
  * DN dials, authenticates, and drains its dump bounded by
  * `maxBytesPerPoll` (txn-boundary soft cap), stages the drained
  * segment bytes under the source's checkpoint dir, and returns the
  * advanced set. `planInputPartitions` then hands each DN's staged
  * segment to a partition reader that decodes it into [[ChangeEvent]]
  * rows ([[ChangeEventSource.toChangeEvents]] — the identical envelope
  * the batch decode produces). A REPLAYED batch (crash after the offset
  * landed, before the commit) whose stage was lost re-dials with the
  * batch's START set and filters served transactions to the offset
  * range — GTID auto-position makes every offset range re-servable, so
  * exactly-once needs no source-side WAL beyond Spark's.
  *
  * Scale shape: 1000 DNs = 1000 drain tasks + 1000 decode tasks per
  * trigger; the driver touches only O(DN-count) set texts. Decode
  * stays per-segment (table-map state is segment-scoped), so no
  * cross-partition coordination exists anywhere.
  *
  * Options:
  *   - `endpoints`   "dn1@host:port,dn2@host:port" (required)
  *   - `user`, `password`   dump credentials (required)
  *   - `tables`      "db.t:c1,c2;db.t2:c3" — the TABLE_MAP name
  *                   registry (MySQL table maps carry no column names)
  *   - `registryDir` optional dir whose `_graft_registry` sidecar
  *                   (maintained by [[graft.jobs.LiveReplicaJob
  *                   .saveRegistry]] from the apply side) overrides
  *                   `tables` at decode time — the cross-batch half of
  *                   in-stream DDL name tracking
  *   - `startExecuted` "dn1=uuid:1-4;dn2=" initial sets (default empty
  *                   = bootstrap from the log head)
  *   - `maxBytesPerPoll`, `serverId`, `soTimeoutMs`, `tsoAuthority`
  */
class GraftCdcSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-cdc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChangeEvent.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GraftCdcTable(CdcConf.fromOptions(properties.asScala.toMap))
}

/** Parsed, serializable source configuration. */
private[streaming] final case class CdcConf(
    endpoints: Seq[(String, String, Int)],
    user: String, password: String,
    tables: Map[(String, String), Seq[String]],
    registryDir: Option[String],
    startExecuted: Map[String, String],
    serverId: Long, soTimeoutMs: Int, maxBytesPerPoll: Long,
    tsoFromXid: Boolean)

private[streaming] object CdcConf {
  def fromOptions(opts: Map[String, String]): CdcConf = {
    val o = opts.map { case (k, v) => k.toLowerCase -> v }
    def req(k: String): String = o.getOrElse(k.toLowerCase,
      sys.error(s"graft-cdc: missing required option '$k'"))
    val endpoints = req("endpoints").split(",").toSeq.filter(_.nonEmpty)
      .map { e =>
        val Array(dn, addr) = e.split("@", 2)
        val i = addr.lastIndexOf(':')
        require(i > 0, s"graft-cdc: endpoint '$e' is not dn@host:port")
        require(!dn.exists("\"\\,;=".contains(_)),
          s"graft-cdc: DN name '$dn' carries offset/option delimiters")
        (dn, addr.substring(0, i), addr.substring(i + 1).toInt)
      }
    val tables = o.get("tables").map(_.split(";").toSeq.filter(_.nonEmpty)
      .map { t =>
        val Array(name, cols) = t.split(":", 2)
        val d = name.indexOf('.')
        require(d > 0, s"graft-cdc: table '$name' is not db.table")
        (name.substring(0, d), name.substring(d + 1)) ->
          cols.split(",").toSeq.filter(_.nonEmpty)
      }.toMap).getOrElse(Map.empty)
    val startExecuted = o.get("startexecuted")
      .map(_.split(";").toSeq.filter(_.nonEmpty).map { s =>
        val Array(dn, set) = s.split("=", 2)
        dn -> set
      }.toMap).getOrElse(Map.empty)
    CdcConf(
      endpoints = endpoints,
      user = req("user"), password = req("password"),
      tables = tables,
      registryDir = o.get("registrydir"),
      startExecuted = startExecuted,
      serverId = o.getOrElse("serverid", "12345").toLong,
      soTimeoutMs = o.getOrElse("sotimeoutms", "30000").toInt,
      maxBytesPerPoll =
        o.getOrElse("maxbytesperpoll", Long.MaxValue.toString).toLong,
      tsoFromXid = o.getOrElse("tsoauthority", "wire") match {
        case "wire" => false
        case "xid" => true
        case other => sys.error(
          s"graft-cdc: tsoAuthority must be wire|xid, got '$other'")
      })
  }
}

private[streaming] class GraftCdcTable(conf: CdcConf)
    extends Table with SupportsRead {
  override def name(): String =
    s"graft-cdc(${conf.endpoints.map(_._1).mkString(",")})"
  override def schema(): StructType = ChangeEvent.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new ScanBuilder {
    override def build(): Scan = new Scan {
      override def readSchema(): StructType = ChangeEvent.schema
      override def description(): String = name()
      override def toMicroBatchStream(checkpointLocation: String)
          : MicroBatchStream =
        new GraftCdcMicroBatchStream(conf, checkpointLocation)
    }
  }
}

/** The per-DN executed sets, JSON-serialized into Spark's offset log.
  * Keys sort, and `GtidSet.text` is canonical (normalizing
  * constructor), so equal positions serialize identically — Spark's
  * offset equality is json equality. */
private[streaming] final case class GtidSetOffset(sets: SortedMap[String, String])
    extends Offset {
  override def json: String = {
    val m = new java.util.TreeMap[String, String]()
    sets.foreach { case (k, v) => m.put(k, v) }
    GtidSetOffset.mapper.writeValueAsString(m)
  }
}

private[streaming] object GtidSetOffset {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  def parse(json: String): GtidSetOffset = {
    val m = mapper.readValue(json, classOf[JMap[String, String]])
    GtidSetOffset(SortedMap(m.asScala.toSeq: _*))
  }
}

private[streaming] class GraftCdcMicroBatchStream(conf: CdcConf,
    checkpointLocation: String)
    extends MicroBatchStream with SupportsAdmissionControl {

  private def spark = SparkSession.active
  private val stageRoot = new Path(checkpointLocation, "graft-stage")

  /** One batch's stage directory, keyed by its END offset (content-
    * addressed: a replayed plan for the same range finds the same
    * stage; a restart that lost it falls back to a re-dump). */
  private def stageDirFor(end: GtidSetOffset): Path =
    new Path(stageRoot, java.security.MessageDigest.getInstance("MD5")
      .digest(end.json.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString)

  override def initialOffset(): Offset =
    GtidSetOffset(SortedMap(conf.endpoints.map { case (dn, _, _) =>
      dn -> conf.startExecuted.getOrElse(dn, "")
    }: _*))

  override def deserializeOffset(json: String): Offset =
    GtidSetOffset.parse(json)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "graft-cdc implements SupportsAdmissionControl: latestOffset(start, limit)")

  /** The trigger's distributed drain: one task per DN dials from the
    * start set, drains bounded bytes, stages them, and reports the
    * advanced set. Transient 1236s (rotate/promotion windows) keep the
    * DN's cursor for the next trigger; unrecoverable ones
    * ([[graft.jobs.LiveReplicaJob.fatal1236]]) fail the trigger. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startSets = start.asInstanceOf[GtidSetOffset].sets
    val eps = conf.endpoints.map { case (dn, h, p) =>
      (dn, h, p, startSets.getOrElse(dn, ""))
    }
    val (u, pw) = (conf.user, conf.password)
    val (sidv, toMs, maxB) = (conf.serverId, conf.soTimeoutMs,
      conf.maxBytesPerPoll)
    val inflight = new Path(stageRoot, "inflight").toString
    val confMap = graft.util.HadoopIo.confMap
    val polled = spark.sparkContext
      .parallelize(eps, math.max(1, eps.size))
      .map { case (dn, host, port, startText) =>
        val startSet = GtidSet.parse(startText)
        val (seg, adv) =
          try BinlogDumpClient.dumpSegmentGtidWithCursor(
            host, port, u, pw, startSet, sidv, toMs, maxB)
          catch {
            case e: BinlogDumpClient.ServerError
                if e.code == BinlogDumpClient.ErrUnknownLog &&
                  !graft.jobs.LiveReplicaJob.fatal1236(e.getMessage) =>
              (Array.emptyByteArray, startSet)
          }
        val hasData = seg.length > 4
        val staged =
          if (!hasData) ""
          else {
            val c = graft.util.HadoopIo.confFrom(confMap)
            // attempt-unique name: a retried/speculative task never
            // writes the path another attempt is writing
            val att = org.apache.spark.TaskContext.get().taskAttemptId()
            val p = new Path(s"$inflight/$dn-$att.bin")
            val fs = p.getFileSystem(c)
            val out = fs.create(p, true)
            try out.write(seg) finally out.close()
            p.toString
          }
        (dn, adv.text, staged)
      }.collect()
    val end = GtidSetOffset(startSets ++ polled.map(t => t._1 -> t._2))
    // publish the stage under its content key (the drain learned the
    // end only after draining); idempotent across replayed triggers
    val fs = graft.util.HadoopIo.fsOf(stageRoot)
    val dst = stageDirFor(end)
    fs.mkdirs(dst)
    polled.filter(_._3.nonEmpty).foreach { case (dn, _, staged) =>
      val s = new Path(staged)
      val d = new Path(dst, s"$dn.bin")
      if (fs.exists(d)) fs.delete(d, true)
      if (!fs.rename(s, d))
        sys.error(s"graft-cdc: stage publish $s -> $d failed")
    }
    end
  }

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[GtidSetOffset].sets
    val e = end.asInstanceOf[GtidSetOffset].sets
    val stage = stageDirFor(end.asInstanceOf[GtidSetOffset]).toString
    conf.endpoints.collect {
      case (dn, host, port)
          if s.getOrElse(dn, "") != e.getOrElse(dn, "") =>
        GraftCdcPartition(dn, host, port, conf.user, conf.password,
          s.getOrElse(dn, ""), e.getOrElse(dn, ""),
          s"$stage/$dn.bin", conf.tables, conf.registryDir,
          conf.serverId, conf.soTimeoutMs, conf.tsoFromXid,
          // serialized session conf: executors have no active session,
          // and a default Configuration would lose object-store
          // credentials for the stage/registry reads below
          graft.util.HadoopIo.confMap)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftCdcReaderFactory

  /** The batch at `end` is durably committed downstream — its staged
    * segments (and any earlier ones) are dead weight; a later replay
    * can only be of UNcommitted batches, whose stages survive under
    * their own keys or re-dump. */
  override def commit(end: Offset): Unit = {
    val fs = graft.util.HadoopIo.fsOf(stageRoot)
    if (fs.exists(stageRoot))
      fs.listStatus(stageRoot).foreach(s => fs.delete(s.getPath, true))
  }

  override def stop(): Unit = ()
}

private[streaming] final case class GraftCdcPartition(dn: String,
    host: String, port: Int, user: String, password: String,
    startText: String, endText: String, stagePath: String,
    tables: Map[(String, String), Seq[String]],
    registryDir: Option[String], serverId: Long, soTimeoutMs: Int,
    tsoFromXid: Boolean,
    hadoopConf: Map[String, String]) extends InputPartition

private[streaming] class GraftCdcReaderFactory
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] =
    new GraftCdcPartitionReader(
      partition.asInstanceOf[GraftCdcPartition])
}

/** Decodes one DN's segment for one offset range. Normal path: the
  * staged bytes the trigger's drain wrote (exactly the range). Replay
  * path (stage lost to a restart): re-dial with the range's START set
  * — GTID auto-position re-serves the complement — and drop framed
  * transactions beyond the range's END (data that arrived after the
  * original drain belongs to a later batch). Errors here propagate:
  * Spark retries the task, and a range the source can no longer serve
  * MUST fail the query rather than silently emit a subset. */
private[streaming] class GraftCdcPartitionReader(p: GraftCdcPartition)
    extends PartitionReader[InternalRow] {

  private lazy val rows: Iterator[InternalRow] = {
    val hconf = graft.util.HadoopIo.confFrom(p.hadoopConf)
    val path = new Path(p.stagePath)
    val fs = path.getFileSystem(hconf)
    val bytes =
      if (fs.exists(path)) {
        val in = fs.open(path)
        try {
          val len = fs.getFileStatus(path).getLen.toInt
          val b = new Array[Byte](len)
          in.readFully(0, b)
          b
        } finally in.close()
      } else {
        val seg = BinlogDumpClient.dumpSegmentGtid(p.host, p.port,
          p.user, p.password, GtidSet.parse(p.startText), p.serverId,
          p.soTimeoutMs)
        CdcSegmentFilter.keepWithin(seg, GtidSet.parse(p.endText))
      }
    val reg = p.registryDir.map { d =>
      val dst = new Path(d, "_graft_registry")
      val rfs = dst.getFileSystem(hconf)
      if (!rfs.exists(dst)) p.tables
      else {
        val in = rfs.open(dst)
        val text =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        graft.jobs.LiveReplicaJob.mergeRegistry(text, p.tables)
      }
    }.getOrElse(p.tables)
    val ser = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[ChangeEvent]()
      .createSerializer()
    ChangeEventSource.toChangeEvents(p.dn, bytes, reg, p.tsoFromXid)
      .map(ser(_))
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** Byte-level txn filter for the replay path: walk the segment's
  * frames, and from each GTID event to the next one (the wire txn
  * region — mark/BEGIN/maps/rows/commit all live between consecutive
  * GTID events) keep the region only if its (sid, gno) is inside
  * `within`. Header events before the first GTID (FDE,
  * PREVIOUS_GTIDS, a txn-framed writer's shared TABLE_MAP) always
  * keep — decode needs them. */
private[streaming] object CdcSegmentFilter {
  def keepWithin(seg: Array[Byte], within: GtidSet): Array[Byte] = {
    if (seg.length <= 4) return seg
    val out = new java.io.ByteArrayOutputStream(seg.length)
    out.write(seg, 0, 4) // magic
    var off = 4
    var keep = true
    while (off + 19 <= seg.length) {
      val tc = seg(off + 4) & 0xFF
      val len = (seg(off + 9) & 0xFF) | ((seg(off + 10) & 0xFF) << 8) |
        ((seg(off + 11) & 0xFF) << 16) | ((seg(off + 12) & 0xFF) << 24)
      if (tc == graft.sinks.BinlogWire.GtidEvent)
        keep = graft.sinks.BinlogWire
          .parseGtidBody(seg.slice(off + 19, off + len))
          .exists { case (sid, gno) => within.contains(sid, gno) }
      if (keep) out.write(seg, off, len)
      off += len
    }
    out.toByteArray
  }
}
