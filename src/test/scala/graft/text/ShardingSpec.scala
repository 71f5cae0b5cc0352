package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `Sharding` — deterministic corpus shuffle + shard export. */
class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 400L).map(i => (i, s"doc-$i", 10L + i % 7))
    .toDF("id", "text", "tokens")

  test("shuffle is a complete, deterministic permutation; shard prefixes key") {
    val out = Sharding.shuffle(docs, "id", salt = "s1", hexDigits = 1)
      .select($"id", $"shuffle_key", $"shard").collect()
    assert(out.map(_.getLong(0)).toSet == (1L to 400L).toSet) // nothing lost
    out.foreach { r =>
      assert(r.getString(2) == r.getString(1).substring(0, 1))
    }
    val again = Sharding.shuffle(docs, "id", salt = "s1", hexDigits = 1)
      .select($"id", $"shuffle_key").as[(Long, String)].collect().toMap
    val first = out.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == first) // same salt, same permutation
    // a different salt is a different permutation (key maps disagree)
    val epoch2 = Sharding.shuffle(docs, "id", salt = "s2", hexDigits = 1)
      .select($"id", $"shuffle_key").as[(Long, String)].collect().toMap
    assert(first != epoch2)
  }

  test("writeShards: partitioned layout, in-file key order, full coverage") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards")
      .toFile.getAbsolutePath
    Sharding.writeShards(docs, "id", salt = "s1", hexDigits = 1, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 400L)
    assert(back.select($"id").as[Long].collect().toSet == (1L to 400L).toSet)
    // every physical file is internally key-sorted (the loader contract:
    // a shard streams in permutation order with no reader-side sort)
    val files = back.select(input_file_name().as("f"), $"shuffle_key")
      .collect().groupBy(_.getString(0))
    assert(files.nonEmpty)
    files.foreach { case (f, rows) =>
      // rows come back in file order for a single parquet file split
      val keys = spark.read.parquet(f.stripPrefix("file:"))
        .select($"shuffle_key").as[String].collect()
      assert(keys.sameElements(keys.sorted), s"unsorted shard file $f")
    }
    // partition values agree with the key prefix
    val byShard = back.select($"shard", $"shuffle_key").collect()
    byShard.foreach(r => assert(r.getString(1).startsWith(r.getString(0))))
  }

  test("shardStats: counts sum to corpus, ranges sit inside the shard") {
    val stats = Sharding.shardStats(docs, "id", salt = "s1", hexDigits = 1,
      sizeCol = Some("tokens")).collect()
    assert(stats.map(_.getLong(1)).sum == 400L)
    val totalTokens = docs.agg(sum($"tokens")).as[Long].head()
    assert(stats.map(_.getLong(2)).sum == totalTokens)
    stats.foreach { r =>
      val (shard, minK, maxK) = (r.getString(0), r.getString(3), r.getString(4))
      assert(minK.startsWith(shard) && maxK.startsWith(shard))
      assert(minK <= maxK)
    }
    // shards are disjoint contiguous ranges: sorted by shard, ranges
    // never interleave
    val sorted = stats.sortBy(_.getString(0))
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(a.getString(4) < b.getString(3))
      case _ =>
    }
  }

  test("writeShardsZOrdered: every file of the written export is bounded in BOTH dimensions") {
    // 64x64 grid with a synthetic id — a corpus whose consumers probe
    // either dimension. 1 hex digit -> 16 shards. Each shard holds a
    // RANDOM 1/16 of the grid (md5 scatter), so its rows span the full
    // (x,y) space — pruning needs enough z-chunks per shard that a
    // chunk sits inside one quadrant stripe: 256 range partitions ->
    // ~16 z-files per shard, chunk length ~2^8 of the 2^12 z-space.
    val grid = (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong * 64 + y, x.toLong, y.toLong)).toDF("id", "x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft-zshard")
      .toFile.getAbsolutePath
    Sharding.writeShardsZOrdered(grid, "id", salt = "s1", hexDigits = 1,
      xCol = "x", yCol = "y", bits = 6, outDir = dir, numParts = 256)
    val back = spark.read.parquet(dir)
    assert(back.count() == 64L * 64)
    // the operative property — two-dimensional PRUNING on the written
    // export: a narrow probe in EITHER dimension touches a minority of
    // files (an x-sorted layout passes the x probe and fails the y
    // probe with every file touched; z-chunks crossing a quadrant seam
    // can individually span wide, so the bound is on the probe's
    // touched set, not on every file)
    val stats = back
      .groupBy(input_file_name().as("f"))
      .agg(min($"x").as("xlo"), max($"x").as("xhi"),
        min($"y").as("ylo"), max($"y").as("yhi"))
      .collect()
    assert(stats.length >= 32, s"expected many files, got ${stats.length}")
    val xTouched = stats.count(r => r.getLong(1) <= 3 && r.getLong(2) >= 0)
    val yTouched = stats.count(r => r.getLong(3) <= 3 && r.getLong(4) >= 0)
    assert(xTouched * 2 <= stats.length,
      s"x-probe touched $xTouched of ${stats.length} files")
    assert(yTouched * 2 <= stats.length,
      s"y-probe touched $yTouched of ${stats.length} files")
  }
}
