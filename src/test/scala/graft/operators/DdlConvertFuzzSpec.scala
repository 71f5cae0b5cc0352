package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Randomized physical→logical DDL conversion: CREATE TABLE statements
  * with random column sets, random dialect clause subsets (implicit id,
  * GLOBAL/CLUSTERED/LOCAL indexes, partition clauses in several
  * spellings, table options) — the invariants:
  *  1. no sharding vocabulary survives in the logical statement;
  *  2. the logical statement evolves the decode registry to EXACTLY
  *     the physical statement's columns minus the implicit id —
  *     conversion can never change what rows decode to;
  *  3. conversion is idempotent (a logical statement passes through).
  */
class DdlConvertFuzzSpec extends AnyFunSuite {

  private val ShardingWords = Seq("dbpartition", "tbpartition",
    "tbpartitions", "dbpartitions", "broadcast", " single", "tablegroup",
    "locality", "global index", "clustered", "local key", "local index",
    "_drds_implicit_id_", "by group")

  test("random sharded CREATE TABLEs: vocabulary stripped, registry preserved, idempotent (300 cases)") {
    val rnd = new scala.util.Random(20260815L)
    (1 to 300).foreach { caseNo =>
      val nCols = 1 + rnd.nextInt(6)
      val cols = (0 until nCols).map(i => s"c$i")
      val types = cols.map(_ => Seq("INT", "bigint", "varchar(32)",
        "DECIMAL(10,2)", "datetime(3)", "TEXT")(rnd.nextInt(6)))
      val colDefs = cols.zip(types).map { case (c, t) =>
        val flags = Seq(
          if (rnd.nextBoolean()) " NOT NULL" else "",
          if (rnd.nextBoolean()) " COMMENT 'x; DBPARTITION inside'" else "")
          .mkString
        s"`$c` $t$flags"
      }
      val implicitId = rnd.nextBoolean()
      val body = scala.collection.mutable.ArrayBuffer(colDefs: _*)
      if (rnd.nextBoolean())
        body += s"KEY `k$caseNo` (`${cols(rnd.nextInt(nCols))}`)"
      if (rnd.nextBoolean())
        body += s"GLOBAL INDEX g$caseNo (`${cols.head}`) DBPARTITION BY HASH(`${cols.head}`)"
      if (rnd.nextBoolean())
        body += s"LOCAL KEY lk$caseNo (`${cols.head}`)"
      if (rnd.nextBoolean())
        body += s"CLUSTERED INDEX ci$caseNo (`${cols.head}`)"
      if (implicitId) {
        body += "_drds_implicit_id_ bigint AUTO_INCREMENT"
        body += "PRIMARY KEY (_drds_implicit_id_)"
      } else if (rnd.nextBoolean())
        body += s"PRIMARY KEY (`${cols.head}`)"
      val options = Seq(
        if (rnd.nextBoolean()) " ENGINE = InnoDB" else "",
        if (rnd.nextBoolean()) " DEFAULT CHARSET = utf8mb4" else "",
        rnd.nextInt(4) match {
          case 0 => s" DBPARTITION BY HASH(`${cols.head}`)" +
            (if (rnd.nextBoolean()) s" TBPARTITION BY YYYYMM(`${cols.last}`) TBPARTITIONS ${1 + rnd.nextInt(8)}" else "")
          case 1 => s" PARTITION BY RANGE (`${cols.head}`) " +
            "(PARTITION p0 VALUES LESS THAN (10), PARTITION p1 VALUES LESS THAN (99))"
          case 2 => if (rnd.nextBoolean()) " BROADCAST" else " SINGLE"
          case _ => ""
        },
        if (rnd.nextBoolean()) " tablegroup `tg1`" else "",
        if (rnd.nextBoolean()) " LOCALITY = 'dn=dn1'" else "")
        .mkString
      val physical =
        s"CREATE TABLE `tb$caseNo` (${body.mkString(", ")})$options"
      val logical = DdlConvert.toLogicalDdl(physical)

      // 1. sharding vocabulary gone (the COMMENT literal may keep it —
      // strip quoted strings before searching)
      val noStrings = logical.replaceAll("'[^']*'", "''").toLowerCase
      ShardingWords.foreach(w =>
        assert(!noStrings.contains(w),
          s"case $caseNo: '$w' survived:\n$physical\n→ $logical"))

      // 2. registry equivalence minus the implicit id
      val regPhysical = graft.sinks.BinlogWire.evolveRegistry(
        Map.empty, "s", physical)
      val regLogical = graft.sinks.BinlogWire.evolveRegistry(
        Map.empty, "s", logical)
      val expected = regPhysical.view.mapValues(
        _.filterNot(_ == "_drds_implicit_id_")).toMap
      assert(regLogical == expected,
        s"case $caseNo: registry diverged:\n$physical\n→ $logical")

      // 3. idempotent
      assert(DdlConvert.toLogicalDdl(logical) == logical,
        s"case $caseNo: conversion not idempotent on:\n$logical")
    }
  }
}
