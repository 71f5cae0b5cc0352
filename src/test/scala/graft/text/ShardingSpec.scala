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
}
