package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over token streams (Cormode & Muthukrishnan 2005):
  * a FIXED-SIZE (depth × width counters), MERGEABLE frequency summary.
  * The scale story is the size: a 100 TB corpus's exact token counts
  * are a vocabulary-sized table that must be recomputed or joined to
  * answer anything; the sketch is a few thousand rows that ship
  * anywhere, merge across shards/days by addition, and answer point
  * queries forever — the right tool for drift monitoring and
  * cross-corpus frequency comparison where ±εN error is acceptable.
  * (For exact counts the repo keeps [[CorpusStats.vocabulary]]; the
  * sketch never replaces it, it travels where the vocabulary can't.)
  *
  * Spark-first: the sketch IS an aggregation result — one shuffle of
  * (d, bucket) pairs with map-side combine, no custom UDAF, no driver
  * state. Estimates are the classic min over depth rows, computed by a
  * broadcast join against the config-sized sketch.
  *
  * Engine-portable: the row hashes are the repo's Rabin-Karp fold
  * ([[QualityModel.tokenHash]] with the row index seeding the
  * accumulator), so an external SQL engine recomputes the ENTIRE
  * sketch and every estimate bit-for-bit (q99's DuckDB oracle does).
  */
object CountMinSketch {

  val HashMod: Long = QualityModel.HashMod

  /** Row-d hash: the portable fold seeded with d+1 (seed 0 would make
    * row 0 collide with the unseeded [[QualityModel.tokenHash]]). */
  def seededTokenHash(tok: Column, d: Int): Column =
    aggregate(split(tok, ""), lit((d + 1).toLong),
      (acc, c) => pmod(acc * 31L + ascii(c).cast("long"), lit(HashMod)))

  /** The depth cells of one token: array<struct<d,bucket>>. */
  private def cells(tok: Column, depth: Int, width: Int): Column =
    array((0 until depth).map { d =>
      struct(lit(d).as("d"),
        pmod(seededTokenHash(tok, d), lit(width.toLong)).as("bucket"))
    }: _*)

  /** Build the sketch for a corpus: (d, bucket, cnt) — at most
    * depth × width rows, however large the corpus. */
  def build(docs: DataFrame, textCol: String, depth: Int,
      width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, s"depth=$depth width=$width")
    docs.select(explode(split(col(textCol), " ")).as("token"))
      .select(explode(cells(col("token"), depth, width)).as("c"))
      .groupBy(col("c.d").as("d"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Sketches merge by counter addition — the property that lets every
    * shard/day sketch independently and combine later. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("d"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point estimates for `tokens(tokenCol)`: min over the depth rows —
    * never an underestimate, over by at most εN with the usual
    * (depth, width) guarantees. The sketch side is config-sized and
    * broadcast; absent cells count 0. */
  def estimate(tokens: DataFrame, tokenCol: String, sketch: DataFrame,
      depth: Int, width: Int): DataFrame =
    tokens.select(col(tokenCol).as("token"))
      .select(col("token"),
        explode(cells(col("token"), depth, width)).as("c"))
      .join(broadcast(sketch),
        col("c.d") === sketch("d") && col("c.bucket") === sketch("bucket"),
        "left")
      .groupBy(col("token"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
}
