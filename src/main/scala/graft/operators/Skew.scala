package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling: salting for hot keys.
  *
  * AQE's skew-join split handles most cases at runtime; salting is the
  * explicit tool for the pathological ones (one key = 30% of a 100 TB
  * stream — e.g. a single hot table in the change stream, one celebrity
  * user in the events table). Two shapes:
  *
  *  - salted aggregation: groupBy(key, salt) partial → groupBy(key)
  *    final. Two small shuffles instead of one skewed one; correct for
  *    any algebraic aggregate.
  *  - salted join: fact side salted, dimension side replicated once per
  *    salt — an equi-join on (key, salt) with even task sizes.
  */
object Skew {

  /** Random-but-deterministic salt in [0, buckets): derived from a
    * uniqueness column (not the hot key!), so one hot key spreads evenly
    * and re-runs are stable. */
  def saltCol(uniqueCol: Column, buckets: Int): Column =
    pmod(xxhash64(uniqueCol), lit(buckets)).cast("int")

  /** Two-phase salted aggregation of sum/count-like metrics. aggs maps
    * output name -> (partial agg col, final combine of the partial). */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], uniqueCol: Column,
      buckets: Int, partials: Seq[(String, Column)],
      finals: Seq[(String, Column)]): DataFrame = {
    val salted = df.withColumn("__salt", saltCol(uniqueCol, buckets))
    val partial = salted.groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }: _*)
    partial.groupBy(keyCols.map(col): _*)
      .agg(finals.head._2.as(finals.head._1),
        finals.tail.map { case (n, c) => c.as(n) }: _*)
  }

  /** Convenience: salted count + sum. */
  def saltedCountSum(df: DataFrame, keyCols: Seq[String], uniqueCol: Column,
      valueCol: Column, buckets: Int): DataFrame =
    saltedAgg(df, keyCols, uniqueCol, buckets,
      partials = Seq("__n" -> count(lit(1)), "__s" -> sum(valueCol)),
      finals = Seq("n" -> sum(col("__n")), "s" -> sum(col("__s"))))

  /** Salted equi-join: fact salted on a uniqueness column, dim replicated
    * once per salt bucket — turns one giant reducer into `buckets` even
    * ones. Dim amplification is buckets×, so keep dim modest or use AQE
    * skew-split instead. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      factUniqueCol: Column, buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", saltCol(factUniqueCol, buckets))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(replicatedDim, keys :+ "__salt").drop("__salt")
  }
}
