package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `ZOrder` — Morton interleave + the pruning effect it exists for. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zValue matches the reference interleave on random pairs") {
    val rnd = new scala.util.Random(23)
    val cases = (1 to 200).map(_ =>
      (rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val got = cases.toDF("x", "y")
      .select($"x", $"y", ZOrder.zValue($"x", $"y", 8).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == mortonRef(x, y, 8)) }
    // out-of-range values mask into range rather than corrupting bits
    val masked = Seq((300L, 5L)).toDF("x", "y")
      .select(ZOrder.zValue($"x", $"y", 8)).as[Long].head()
    assert(masked == mortonRef(300L % 256, 5L, 8))
  }

  test("z-layout bounds BOTH dimensions per file; linear layout does not") {
    // 64x64 grid, one row per cell — write 16 files in each layout and
    // compare how many files a narrow y-range predicate must touch
    // (a file must be read iff the range intersects its [min_y, max_y])
    val grid = (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    def filesTouched(df: org.apache.spark.sql.DataFrame): Long = {
      val dir = java.nio.file.Files.createTempDirectory("graft-zorder")
        .toFile.getAbsolutePath
      df.write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min($"y").as("lo"), max($"y").as("hi"))
        .filter($"lo" <= 3 && $"hi" >= 0) // the y IN [0,3] probe
        .count()
    }
    val linear = filesTouched(
      grid.repartitionByRange(16, $"x").sortWithinPartitions($"x"))
    val z = filesTouched(ZOrder.layout(grid, "x", "y", bits = 6,
      numParts = 16))
    // x-sorted files each span the full y range → every file intersects
    assert(linear == 16L, s"linear layout touched $linear")
    // z-ordered files are y-bounded → most files prune away
    assert(z <= 8L, s"z layout touched $z of 16")
  }
}
