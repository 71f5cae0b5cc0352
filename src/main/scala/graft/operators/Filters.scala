package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event / replication filters.
  *
  * Semantics from the reference:
  *  - event-type + schema whitelist applied before any buffering
  *    (polardbx-cdc-task/.../extractor/filter/EventAcceptFilter.java:53,
  *    wired in BinlogExtractor.java:192-246);
  *  - start-position filter (task/.../extractor/filter/MinTSOFilter.java:31);
  *  - MySQL `replicate-do/ignore-*` semantics with wildcards and db rewrite
  *    (polardbx-cdc-rpl/.../filter/ReplicaFilter.java:38-278; wildcard
  *    compile RegexUtil.java:33);
  *  - table blacklists (task/.../processor/FilterBlacklistTableFilter.java).
  *
  * All filters are expressed as `Column` predicates so Catalyst pushes them
  * into the scan (parquet row-group pruning) — at 100 TB this is the
  * difference between reading the whole log and reading the slice you need.
  */
object Filters {

  /** Whitelist of event types, optional schema-level deny list. */
  def eventAccept(df: DataFrame, typeCol: String, accepted: Seq[String],
      schemaCol: Option[String] = None,
      deniedSchemas: Seq[String] = Nil): DataFrame = {
    val base = col(typeCol).isin(accepted: _*)
    val pred = schemaCol match {
      case Some(sc) if deniedSchemas.nonEmpty => base && !col(sc).isin(deniedSchemas: _*)
      case _ => base
    }
    df.filter(pred)
  }

  /** Drop everything below the start position (restart-from-checkpoint).
    * On a partitioned/sorted lake this prunes whole files via min/max stats. */
  def minTso(df: DataFrame, tsoCol: String, startTso: Long): DataFrame =
    df.filter(col(tsoCol) >= startTso)

  /** MySQL wildcard (`%`, `_`) → Java regex, as RegexUtil.java:33 does. */
  private[graft] def wildcardToRegex(pattern: String): String = {
    val sb = new StringBuilder("(?i)^")
    pattern.foreach {
      case '%' => sb.append(".*")
      case '_' => sb.append('.')
      case c if "\\.[]{}()*+-?^$|".indexOf(c) >= 0 => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    sb.append('$').toString
  }

  /** Replication object filter config — mirrors ReplicaFilter's
    * do-db / ignore-db / do-table / ignore-table / wild-do-table /
    * wild-ignore-table / rewrite-db evaluation order
    * (ReplicaFilter.java:107-134). */
  final case class ReplicaSpec(
      doDbs: Seq[String] = Nil,
      ignoreDbs: Seq[String] = Nil,
      doTables: Seq[(String, String)] = Nil,      // (db, table)
      ignoreTables: Seq[(String, String)] = Nil,
      wildDoTables: Seq[String] = Nil,            // "db.tbl%" wildcards
      wildIgnoreTables: Seq[String] = Nil,
      rewriteDbs: Map[String, String] = Map.empty)

  /** Compile a ReplicaSpec into a single Column predicate (broadcast-free:
    * the spec is driver-side config folded into the plan as literals). */
  def replicaPredicate(spec: ReplicaSpec, dbCol: Column, tableCol: Column): Column = {
    val qualified = concat_ws(".", lower(dbCol), lower(tableCol))
    def inPairs(ps: Seq[(String, String)]): Column =
      qualified.isin(ps.map { case (d, t) => s"${d.toLowerCase}.${t.toLowerCase}" }: _*)
    def wildMatch(ws: Seq[String]): Column =
      ws.map(w => qualified.rlike(wildcardToRegex(w))).reduceOption(_ || _).getOrElse(lit(false))

    val dbOk: Column =
      if (spec.doDbs.nonEmpty) lower(dbCol).isin(spec.doDbs.map(_.toLowerCase): _*)
      else if (spec.ignoreDbs.nonEmpty) !lower(dbCol).isin(spec.ignoreDbs.map(_.toLowerCase): _*)
      else lit(true)
    val tableOk: Column =
      if (spec.doTables.nonEmpty || spec.wildDoTables.nonEmpty)
        (if (spec.doTables.nonEmpty) inPairs(spec.doTables) else lit(false)) ||
          wildMatch(spec.wildDoTables)
      else lit(true)
    val notIgnored: Column =
      (if (spec.ignoreTables.nonEmpty) !inPairs(spec.ignoreTables) else lit(true)) &&
        (if (spec.wildIgnoreTables.nonEmpty) !wildMatch(spec.wildIgnoreTables) else lit(true))
    dbOk && tableOk && notIgnored
  }

  /** Apply filter + optional db rewrite (ReplicaFilter.getRewriteDb). */
  def replicaFilter(df: DataFrame, spec: ReplicaSpec,
      dbCol: String, tableCol: String): DataFrame = {
    val filtered = df.filter(replicaPredicate(spec, col(dbCol), col(tableCol)))
    if (spec.rewriteDbs.isEmpty) filtered
    else {
      val m = map(spec.rewriteDbs.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq: _*)
      filtered.withColumn(dbCol, coalesce(element_at(m, col(dbCol)), col(dbCol)))
    }
  }

  /** Blacklist of (db, table) pairs — anti-semi on literal set. */
  def blacklist(df: DataFrame, dbCol: String, tableCol: String,
      deny: Seq[(String, String)]): DataFrame =
    if (deny.isEmpty) df
    else df.filter(!concat_ws(".", col(dbCol), col(tableCol))
      .isin(deny.map { case (d, t) => s"$d.$t" }: _*))
}
