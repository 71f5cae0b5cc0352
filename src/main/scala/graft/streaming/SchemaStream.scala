package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.SchemaCatalog
import graft.sinks.OrderedSink

/** In-stream schema evolution: a CDC stream carries BOTH row events and
  * raw DDL statements; rows must decode against the schema current at
  * their position — including a DDL that arrived earlier in the same
  * micro-batch.
  *
  * Reference semantics: MemoryTableMeta.apply consumes each DDL from the
  * log as it is encountered and subsequent row events resolve against the
  * updated repository (canal/.../tsdb/MemoryTableMeta.java:122-147;
  * PolarDbXTableMetaManager.java:103).
  *
  * Spark restatement: the DDL sub-stream is persisted to an append-only
  * DDL log (idempotent by TSO cursor — replays cannot duplicate), and
  * each micro-batch's row events resolve via the as-of join against the
  * full accumulated log. Correctness does not depend on batch boundaries:
  * resolution is by TSO interval, so a row lands on the right schema
  * version whether its DDL arrived in this batch or a previous one. The
  * DDL log is O(DDL statements) — always tiny next to the event stream —
  * so the per-batch re-fold is a broadcast-sized job. */
object SchemaStream {

  /** Start the evolving-schema resolution stream.
    *
    * Source rows: (tso, schemaName, tableName, kind, ddl, payload...) —
    * kind ∈ {"row", "ddl"}; `ddl` holds statement text for DDL rows.
    * DDL accumulates under `ddlLogDir`; resolved row events append to
    * `outDir` with their as-of `colNames`/`schemaJson`. */
  def start(spark: SparkSession, sourceDir: String, sourceSchema: StructType,
      ddlLogDir: String, outDir: String, checkpointDir: String,
      seqCol: Option[String] = None): StreamingQuery = {
    spark.readStream
      .schema(sourceSchema)
      .option("maxFilesPerTrigger", 16)
      .parquet(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, ddlLogDir, outDir, seqCol)
      }
      .start()
  }

  /** One micro-batch: persist the DDL sub-stream, then resolve the row
    * sub-stream against the accumulated log (exposed for batch replay and
    * tests).
    *
    * Row-output idempotence: appendSince's cursor contract needs a
    * PER-ROW-unique ordered key, but in the CDC model every row event of
    * a transaction shares its commit TSO — a transaction split across
    * micro-batches would have its later rows silently dropped as replays
    * of the recovered max. With `seqCol` the intra-transaction sequence
    * is packed into the key ((tso << 20) | seq — the reference's
    * VirtualTso move, Model.scala; requires seq < 2^20 and tso < 2^43);
    * without one, duplicate commit TSOs in a batch are REJECTED loudly
    * rather than half-applied. */
  def applyBatch(batch: DataFrame, ddlLogDir: String, outDir: String,
      seqCol: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    val ddl = batch.filter(col("kind") === "ddl")
      .select(col("tso"), col("schemaName"), col("ddl"))
    if (!ddl.isEmpty)
      OrderedSink.appendSince(ddl, "tso", ddlLogDir, numPartitions = 1)
    val rows = batch.filter(col("kind") === "row").drop("kind", "ddl")
    if (!rows.isEmpty) {
      val resolved =
        if (ddlLogExists(ddlLogDir))
          SchemaCatalog.resolveDdlText(rows, spark.read.parquet(ddlLogDir))
        else rows.withColumn("schemaJson", lit(null).cast("string"))
          .withColumn("colNames", lit(null).cast("string"))
      // a batch replay (checkpoint loss, or a crash after this write but
      // before the checkpoint commit) re-resolves the same rows and
      // appendSince drops everything at or below the recovered position
      seqCol match {
        case Some(sc) =>
          // cast BEFORE the shift: an IntegerType tso would wrap at 32
          // bits and corrupt the idempotence key
          val tsoL = col("tso").cast("long")
          val seqL = col(sc).cast("long")
          val keyed = resolved.withColumn("__vtso",
            // the packing is only injective for seq in [0, 2^20) and tso
            // in [0, 2^43); out of range must FAIL, not bleed into a
            // neighboring transaction's key range (which would corrupt
            // the appendSince cursor and the row order silently)
            when(seqL < 0L || seqL >= (1L << 20) ||
                 tsoL < 0L || tsoL >= (1L << 43),
              raise_error(format_string(
                "SchemaStream: (tso=%d, seq=%d) outside the vtso packing " +
                  "range (need 0 <= seq < 2^20 and 0 <= tso < 2^43)",
                tsoL, seqL)))
              .otherwise(shiftleft(tsoL, 20) + seqL))
          OrderedSink.appendSince(keyed, "__vtso", outDir, numPartitions = 4)
        case None =>
          val r = resolved.agg(count(lit(1)), countDistinct(col("tso"))).head()
          val (n, distinct) = (r.getLong(0), r.getLong(1))
          require(n == distinct,
            s"SchemaStream: $n row events share ${n - distinct} duplicate " +
              "commit TSOs; pass seqCol so the idempotence key is per-row " +
              "unique (a split transaction would otherwise lose rows)")
          OrderedSink.appendSince(resolved, "tso", outDir, numPartitions = 4)
      }
    }
  }

  private def ddlLogExists(dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    graft.util.HadoopIo.fsOf(p).exists(p)
  }
}
