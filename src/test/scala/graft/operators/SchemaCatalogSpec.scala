package graft.operators

import graft.SparkSpec

class SchemaCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ddlLog = Seq(
    (100L, "app", "t1", """{"cols":["a"]}"""),
    (200L, "app", "t1", """{"cols":["a","b"]}"""),
    (150L, "app", "t2", """{"cols":["x"]}""")
  ).toDF("tso", "schemaName", "tableName", "schemaJson")

  test("versions assigns [tso, next-tso) validity intervals per table") {
    val v = SchemaCatalog.versions(ddlLog)
      .select("tableName", "valid_from", "valid_to", "schemaJson")
      .as[(String, Long, Long, String)].collect().toSet
    assert(v == Set(
      ("t1", 100L, 200L, """{"cols":["a"]}"""),
      ("t1", 200L, Long.MaxValue, """{"cols":["a","b"]}"""),
      ("t2", 150L, Long.MaxValue, """{"cols":["x"]}""")))
  }

  test("snapshotAt rolls the catalog back to a TSO") {
    val snap = SchemaCatalog.snapshotAt(ddlLog, 180L)
      .select("tableName", "schemaJson").as[(String, String)].collect().toSet
    assert(snap == Set(("t1", """{"cols":["a"]}"""), ("t2", """{"cols":["x"]}""")))
  }

  test("consistencyDiff: faithful fold is empty; divergence is classified") {
    // authoritative snapshot agreeing with the fold at tso=180
    val agree = Seq(
      ("app", "t1", """{"cols":["a"]}"""), ("app", "t2", """{"cols":["x"]}"""))
      .toDF("schemaName", "tableName", "schemaJson")
    assert(SchemaCatalog.consistencyDiff(ddlLog, agree, 180L).isEmpty)
    // diverging snapshot: t1 drifted, t2 missing, t9 unknown to the fold
    val drift = Seq(
      ("app", "t1", """{"cols":["a","GHOST"]}"""),
      ("app", "t9", """{"cols":["z"]}"""))
      .toDF("schemaName", "tableName", "schemaJson")
    val got = SchemaCatalog.consistencyDiff(ddlLog, drift, 180L)
      .select("tableName", "status").as[(String, String)].collect().toMap
    assert(got == Map("t1" -> "mismatch", "t2" -> "missing_in_auth",
      "t9" -> "missing_in_fold"))
  }

  test("resolve attaches the schema current at each event TSO") {
    val events = Seq(
      (120L, "app", "t1"), (250L, "app", "t1"), (90L, "app", "t1"))
      .toDF("tso", "schemaName", "tableName")
    val got = SchemaCatalog.resolve(events, ddlLog)
      .select("tso", "schemaJson").as[(Long, Option[String])]
      .collect().toMap
    assert(got(120L).contains("""{"cols":["a"]}"""))
    assert(got(250L).contains("""{"cols":["a","b"]}"""))
    assert(got(90L).isEmpty) // before first DDL: unresolved
  }
}
