package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic global shuffle + shard assignment — the export step of
  * a training-data pipeline. After curation/dedup/mixing, the corpus is
  * SHUFFLED (a sequential reader must see a decorrelated stream: no
  * source runs, no crawl-order correlation in a gradient batch) and cut
  * into SHARDS (fixed-cardinality file groups a data loader can stripe
  * over and re-export independently). Reference analog: the Binlog-X
  * hash fan-out (`transmit/relay/HashConfig.java:208-265` assigns every
  * event a stream by key hash) applied to corpus export instead of
  * change streams.
  *
  * Everything derives from ONE key, `md5(id || ':' || salt)`:
  *
  *  - engine-portable: every SQL engine speaks md5, so an external
  *    system (or the DuckDB oracle) recomputes the exact permutation;
  *  - avalanche: adjacent ids land uniformly far apart — the shuffle is
  *    as good as the hash, with zero RNG state to persist;
  *  - epochs: a different salt is a fresh, equally-deterministic
  *    permutation — "reshuffle per epoch" is a string constant;
  *  - shard = hex prefix of the key, so a shard is a CONTIGUOUS key
  *    range: global order = shard-major ++ key-minor, any single shard
  *    re-exports in isolation, and shard boundaries never move when
  *    the corpus grows (unlike ntile/row_number schemes).
  *
  * 100 TB shape: key/shard are scan-stage projections; the only wide op
  * is one hash partition by shard + in-partition sort — no global sort,
  * no skew (md5 is uniform), every shard written independently in
  * parallel.
  */
object Sharding {

  /** The permutation key: md5 hex of "id:salt". Lowercase hex in both
    * Spark and DuckDB, so lexicographic order agrees cross-engine. */
  def shuffleKey(id: Column, salt: String): Column =
    md5(concat(id.cast("string"), lit(":" + salt)))

  /** Shard = first `hexDigits` of the key → 16^hexDigits shards, each a
    * contiguous key range. Size hexDigits to the CLUSTER, not the
    * fixture: shard count bounds write parallelism (and the reader's
    * stripe width), so a 1000-executor export wants 3-4 digits
    * (4096-65536 shards), not the 16 that one digit gives. */
  def shardOf(key: Column, hexDigits: Int): Column = {
    require(hexDigits >= 1 && hexDigits <= 8,
      s"hexDigits must be in [1,8], got $hexDigits")
    substring(key, 1, hexDigits)
  }

  /** The shuffled corpus: adds (shuffle_key, shard) and arranges rows
    * shard-major, key-minor — one shuffle keyed by shard, then an
    * in-partition sort. The caller writes with `partitionBy("shard")`
    * (or uses [[writeShards]]) and each shard file comes out internally
    * key-ordered. */
  def shuffle(df: DataFrame, idCol: String, salt: String,
      hexDigits: Int = 2): DataFrame = {
    val keyed = df
      .withColumn("shuffle_key", shuffleKey(col(idCol), salt))
      .withColumn("shard", shardOf(col("shuffle_key"), hexDigits))
    keyed.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("shuffle_key"))
  }

  /** Write the shuffled corpus as `outDir/shard=<hex>/part-*.parquet`,
    * each file key-sorted. Re-running with the same salt overwrites
    * with the identical layout (deterministic end to end). */
  def writeShards(df: DataFrame, idCol: String, salt: String,
      hexDigits: Int, outDir: String): Unit =
    shuffle(df, idCol, salt, hexDigits)
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)

  /** Write a sharded export whose rows are Z-ORDERED within each shard:
    * `outDir/shard=<hex>/part-*.parquet` where every file is
    * min/max-bounded in BOTH `xCol` and `yCol` (`operators/ZOrder` —
    * the Delta Z-ORDER BY shape applied to the export). Use when the
    * export's consumers are analytical scans filtering on either
    * dimension rather than a sequential training reader ([[writeShards]]
    * keeps the decorrelated key order that loaders want; the two
    * layouts serve different consumers, same shard addressing).
    *
    * Shape: shard assignment stays the scan-stage md5 projection, and
    * the ONE wide op is a range partition on (shard, z) — shards cut
    * into z-contiguous chunks, each chunk one task, one file under its
    * shard dir — followed by the in-partition sort. No global sort, no
    * second shuffle for the layout: the z-clustering rides the write
    * the export already does; pruning on either dimension then reads
    * O(selectivity) files per shard (ShardingSpec proves the bound). */
  def writeShardsZOrdered(df: DataFrame, idCol: String, salt: String,
      hexDigits: Int, xCol: String, yCol: String, bits: Int,
      outDir: String, numParts: Int = 0): Unit = {
    val p = if (numParts > 0) numParts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    df.withColumn("shuffle_key", shuffleKey(col(idCol), salt))
      .withColumn("shard", shardOf(col("shuffle_key"), hexDigits))
      .withColumn("__z",
        graft.operators.ZOrder.zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(p, col("shard"), col("__z"))
      .sortWithinPartitions(col("shard"), col("__z"))
      .drop("__z")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
  }

  /** Per-shard manifest: row count, payload size, and the key range —
    * what a loader needs to stripe readers over shards and what an
    * auditor needs to confirm the export covered the corpus exactly
    * once (sum(n_docs) = corpus count, key ranges disjoint by
    * construction). One aggregation, no joins. */
  def shardStats(df: DataFrame, idCol: String, salt: String,
      hexDigits: Int = 2, sizeCol: Option[String] = None): DataFrame = {
    val keyed = df
      .withColumn("shuffle_key", shuffleKey(col(idCol), salt))
      .withColumn("shard", shardOf(col("shuffle_key"), hexDigits))
    val size = sizeCol.map(c => sum(col(c))).getOrElse(sum(lit(0L)))
    keyed.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        size.as("payload"),
        min(col("shuffle_key")).as("min_key"),
        max(col("shuffle_key")).as("max_key"))
  }
}
