package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val changes = Seq(
    // (tso, txnId, db, table, op, pk)
    (1L, 10L, "app", "orders_0001", "INSERT", 1L),
    (2L, 10L, "app", "orders_0001", "UPDATE", 1L),
    (3L, 11L, "app", "users", "DELETE", 2L),
    (4L, 12L, "sys", "meta", "INSERT", 3L),
    (5L, 13L, "app", "orders_0002", "INSERT", 1L)
  ).toDF("tso", "txnId", "db", "tbl", "op", "pk")

  test("minTso drops rows below start position") {
    assert(Filters.minTso(changes, "tso", 3L).count() == 3)
  }

  test("eventAccept filters by type and denied schema") {
    val got = Filters.eventAccept(changes, "op", Seq("INSERT", "UPDATE"),
      Some("db"), Seq("sys"))
    assert(got.count() == 3)
    assert(got.filter($"db" === "sys").count() == 0)
  }

  test("replica wildcard semantics match MySQL patterns") {
    assert("app\\.orders_.*".r.findFirstIn("") == None) // sanity
    val spec = Filters.ReplicaSpec(wildDoTables = Seq("app.orders%"))
    val got = changes.filter(
      Filters.replicaPredicate(spec, $"db", $"tbl"))
    assert(got.count() == 3) // the two orders_000x inserts + update
    val ignore = Filters.ReplicaSpec(ignoreTables = Seq(("app", "users")))
    assert(changes.filter(Filters.replicaPredicate(ignore, $"db", $"tbl"))
      .count() == 4)
  }

  test("blacklist drops configured tables") {
    assert(Filters.blacklist(changes, "db", "tbl",
      Seq(("app", "users"), ("sys", "meta"))).count() == 3)
  }

  test("physicalToLogical strips physical suffixes") {
    val got = Reshape.physicalToLogical(changes, "tbl")
      .select("tbl").distinct().as[String].collect().toSet
    assert(got == Set("orders", "users", "meta"))
  }

  test("normalizeDdl strips physical suffixes from DDL text") {
    val df = Seq("CREATE TABLE orders_0001 (id INT)",
      "ALTER TABLE users ADD COLUMN x INT").toDF("ddl")
    val got = df.select(Reshape.normalizeDdl($"ddl")).as[String].collect()
    assert(got(0) == "CREATE TABLE orders (id INT)")
    assert(got(1) == "ALTER TABLE users ADD COLUMN x INT")
  }

  test("flashback inversion swaps op and images; involution on ops") {
    val df = Seq(("INSERT", Map("a" -> "old"), Map("a" -> "new")))
      .toDF("op", "before", "after")
    val inv = Reshape.flashbackInvert(df, "op", "before", "after")
    val row = inv.select("op", "before", "after").head()
    assert(row.getString(0) == "DELETE")
    assert(row.getMap[String, String](1) == Map("a" -> "new"))
    assert(row.getMap[String, String](2) == Map("a" -> "old"))
    // invert twice = identity
    val twice = Reshape.flashbackInvert(inv, "op", "before", "after")
    assert(twice.select("op").head().getString(0) == "INSERT")
  }

  test("lastImage keeps exactly the highest-seq row per key") {
    val df = Seq((1L, 1L, "a"), (1L, 3L, "c"), (1L, 2L, "b"), (2L, 1L, "x"))
      .toDF("pk", "seq", "v")
    val got = Dedup.lastImage(df, Seq("pk"), "seq")
      .select("pk", "v").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "c"), (2L, "x")))
  }

  test("exactDedup keeps deterministic representative") {
    val df = Seq(("t", 5L), ("t", 2L), ("u", 9L)).toDF("k", "id")
    val got = Dedup.exactDedup(df, Seq("k"), "id")
      .select("k", "id").as[(String, Long)].collect().toSet
    assert(got == Set(("t", 2L), ("u", 9L)))
  }

  test("txn assembly orders events by trace and drops uncommitted") {
    val events = Seq(
      (10L, "02", "UPDATE"), (10L, "01", "INSERT"), (11L, "01", "DELETE"))
      .toDF("txnId", "traceId", "op")
    val commits = Seq(10L).toDF("txnId")
    val committed = TxnAssembly.committedOnly(events, commits, "txnId")
    assert(committed.count() == 2)
    val env = TxnAssembly.assemble(committed, "txnId", "traceId", Seq("op"))
    val row = env.filter($"txnId" === 10L).head()
    val ops = row.getSeq[org.apache.spark.sql.Row](2).map(_.getString(1))
    assert(ops == Seq("INSERT", "UPDATE"))
  }

  test("fuseXa groups partitions sharing a commit tso") {
    val tokens = Seq((100L, "dn1"), (100L, "dn2"), (200L, "dn1"))
      .toDF("tso", "partitionId")
    val fused = TxnAssembly.fuseXa(tokens, "tso", "partitionId")
    assert(fused.filter($"tso" === 100L).head().getAs[Long]("n_parts") == 2)
    assert(fused.count() == 2)
  }

  test("kWayMerge produces a totally ordered stream; disorderCount agrees") {
    val s1 = Seq(1L, 4L, 7L).toDF("tso")
    val s2 = Seq(2L, 3L, 9L).toDF("tso")
    val merged = MergeSort.kWayMerge(Seq(s1, s2), Seq("tso"))
    assert(merged.as[Long].collect().toSeq == Seq(1L, 2L, 3L, 4L, 7L, 9L))
    assert(MergeSort.disorderCount(merged, "tso") == 0)
    // an unsorted frame has disorder
    assert(MergeSort.disorderCount(Seq(3L, 1L, 2L).toDF("tso"), "tso") > 0)
  }

  test("sortedRuns: each partition sorted, ranges disjoint") {
    val df = (1 to 1000).map(i => (i * 37 % 1000).toLong).toDF("tso")
    val runs = MergeSort.sortedRuns(df, 4, Seq("tso"))
    import org.apache.spark.sql.Row
    val perPart = runs.rdd.mapPartitionsWithIndex { (i, it) =>
      val v = it.map(_.getLong(0)).toSeq
      Iterator((i, v.headOption, v.lastOption, v == v.sorted))
    }.collect().sortBy(_._1)
    assert(perPart.forall(_._4), "each partition must be locally sorted")
    val bounds = perPart.flatMap(p => p._2.zip(p._3))
    bounds.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  test("checksum is order-independent and null-sensitive") {
    val a = Seq(("x", Some(1)), ("y", None)).toDF("c1", "c2")
    val b = Seq(("y", None), ("x", Some(1))).toDF("c1", "c2") // reordered
    val ca = Checksum.tableChecksum(a, Seq("c1", "c2")).head().getLong(0)
    val cb = Checksum.tableChecksum(b, Seq("c1", "c2")).head().getLong(0)
    assert(ca == cb)
    // null vs empty string must differ
    val n = Seq(("x", null.asInstanceOf[String])).toDF("c1", "c2")
    val e = Seq(("x", "")).toDF("c1", "c2")
    assert(Checksum.tableChecksum(n, Seq("c1", "c2")).head().getLong(0) !=
      Checksum.tableChecksum(e, Seq("c1", "c2")).head().getLong(0))
  }

  test("validation diff finds missing, orphan and mismatched rows") {
    val src = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val dst = Seq((1L, "a"), (3L, "CHANGED"), (4L, "d")).toDF("k", "v")
    assert(Validation.missingInDst(src, dst, Seq("k")).as[(Long, String)]
      .collect().toSet == Set((2L, "b")))
    assert(Validation.orphansInDst(src, dst, Seq("k")).as[(Long, String)]
      .collect().toSet == Set((4L, "d")))
    assert(Validation.mismatched(src, dst, Seq("k"), Seq("v"))
      .select("k").as[Long].collect().toSet == Set(3L))
    val s = Validation.diffSummary(src, dst, Seq("k"), Seq("v")).head()
    assert((s.getLong(0), s.getLong(1), s.getLong(2)) == ((1L, 1L, 1L)))
  }

  test("stream hash: deterministic, in range, markers broadcast to all") {
    val df = changes
    val seq = StreamHash.streamSeq(StreamHash.ByTable, 4, $"db", $"tbl", Nil)
    val streams = df.select(seq.as("s")).as[Int].collect()
    assert(streams.forall(s => s >= 0 && s < 4))
    // deterministic: same rows → same assignment
    assert(df.select(seq.as("s")).as[Int].collect().toSeq == streams.toSeq)
    // override pins a table to a fixed stream
    val ovr = StreamHash.streamSeqWithOverrides(StreamHash.ByTable, 4,
      $"db", $"tbl", Nil, Map("app.users" -> 2))
    val pinned = df.filter($"tbl" === "users").select(ovr.as("s"))
      .as[Int].head()
    assert(pinned == 2)
    val bcast = StreamHash.broadcastToAllStreams(df.limit(1), 4)
    assert(bcast.select("stream").as[Int].collect().sorted.toSeq == Seq(0, 1, 2, 3))
  }

  test("broadcastAsOf resolves the version current at each ts") {
    val facts = Seq(("t1", 5L), ("t1", 15L), ("t2", 5L)).toDF("tbl", "ts")
    val dim = Seq(("t1", 0L, 10L, "v1"), ("t1", 10L, 100L, "v2"),
      ("t2", 0L, 100L, "w1")).toDF("tbl", "from", "to", "schema_v")
    val got = AsOfJoin.broadcastAsOf(facts, dim, Seq("tbl"), "ts", "from", "to")
      .select("tbl", "ts", "schema_v").as[(String, Long, String)]
      .collect().toSet
    assert(got == Set(("t1", 5L, "v1"), ("t1", 15L, "v2"), ("t2", 5L, "w1")))
  }

  test("asOfJoinSorted matches broadcastAsOf semantics on shared cases") {
    val facts = Seq(("t1", 5L, "f1"), ("t1", 15L, "f2"), ("t1", 3L, "f3"))
      .toDF("tbl", "ts", "tag")
    val dim = Seq(("t1", 0L, "v1"), ("t1", 10L, "v2"))
      .toDF("tbl", "vts", "schema_v")
    val got = AsOfJoin.asOfJoinSorted(facts, dim, "tbl", "ts", "vts",
      Seq("schema_v")).select("tag", "schema_v").as[(String, String)]
      .collect().toSet
    assert(got == Set(("f1", "v1"), ("f3", "v1"), ("f2", "v2")))
  }
}
