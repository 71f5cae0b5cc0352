package graft.model

import org.apache.spark.sql.types._

/** Virtual TSO codec — semantics of the reference's global timestamp
  * (`Transaction.generateTSO`, polardbx-cdc-task/.../extractor/log/
  * Transaction.java:553-573; VirtualTSO.java:24-58): a sortable composite
  * of 19-digit physical commit time, 19-digit transaction id and 10-digit
  * intra-commit sequence. The encoded string sorts lexicographically in
  * commit order, so it can be used directly as a range-partition /
  * ORDER BY key at any scale.
  */
final case class VirtualTso(physicalMillis: Long, txnId: Long, seq: Long)
    extends Ordered[VirtualTso] {
  require(physicalMillis >= 0 && txnId >= 0 && seq >= 0, "TSO parts must be non-negative")
  def encoded: String = f"$physicalMillis%019d$txnId%019d$seq%010d"
  override def compare(that: VirtualTso): Int = {
    val c1 = java.lang.Long.compare(physicalMillis, that.physicalMillis)
    if (c1 != 0) c1
    else {
      val c2 = java.lang.Long.compare(txnId, that.txnId)
      if (c2 != 0) c2 else java.lang.Long.compare(seq, that.seq)
    }
  }
}

object VirtualTso {
  val EncodedLength = 48
  def decode(s: String): VirtualTso = {
    require(s.length == EncodedLength, s"bad TSO literal: $s")
    VirtualTso(s.substring(0, 19).toLong, s.substring(19, 38).toLong,
      s.substring(38, 48).toLong)
  }
  /** Physical event time of a TSO, for watermarking (analog of
    * CommonUtils.getTsoPhysicalTime). */
  def physicalTimeMillis(encoded: String): Long = encoded.substring(0, 19).toLong
}

/** Logical change event — the engine-internal envelope, modeled on
  * `DBMSRowChange` (polardbx-cdc-canal/.../dbms/DefaultRowChange.java:37)
  * and `TxnToken`/`TxnItem` (polardbx-cdc-protocol/src/main/proto/
  * TxnStream.proto:95-170). Before/after images are string maps because
  * upstream schema is dynamic; typed projection happens after the as-of
  * schema join (see graft.operators.AsOfJoin).
  */
final case class ChangeEvent(
    tso: Long,
    txnId: Long,
    partitionId: String,
    traceId: String,
    op: String, // INSERT | UPDATE | DELETE | DDL | HEARTBEAT | COMMIT
    schemaName: String,
    tableName: String,
    tsoTime: java.sql.Timestamp,
    before: Map[String, String],
    after: Map[String, String],
    ddl: Option[String],
    serverId: Long)

object ChangeEvent {
  val schema: StructType = StructType(Seq(
    StructField("tso", LongType, nullable = false),
    StructField("txnId", LongType, nullable = false),
    StructField("partitionId", StringType, nullable = false),
    StructField("traceId", StringType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("schemaName", StringType, nullable = true),
    StructField("tableName", StringType, nullable = true),
    StructField("tsoTime", TimestampType, nullable = false),
    StructField("before", MapType(StringType, StringType), nullable = true),
    StructField("after", MapType(StringType, StringType), nullable = true),
    StructField("ddl", StringType, nullable = true),
    StructField("serverId", LongType, nullable = false)))
}

/** Control-plane transaction token (TxnStream.proto:95-146): metadata-only
  * handle that travels through the ordered merge path while heavy payloads
  * stay keyed by (txnId, partitionId) until sink time. */
final case class TxnToken(
    tso: Long,
    txnId: Long,
    partitionId: String,
    tokenType: String, // DML | DDL | HEARTBEAT | FORMAT_DESC
    txnSize: Long,
    schemaName: String,
    serverId: Long)
