package graft.text

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `Sampling` — deterministic sampling and token-budget mixtures. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 500L)
    .map(i => (i, if (i % 3 == 0) "en" else "de", 10L + i % 17))
    .toDF("id", "lang", "tokens")

  test("hashSample is deterministic, shuffle-free, and ~fraction-sized") {
    val s1 = Sampling.hashSample(docs, "id", 0.2)
    val ids1 = s1.select($"id").as[Long].collect().toSet
    val ids2 = Sampling.hashSample(docs, "id", 0.2)
      .select($"id").as[Long].collect().toSet
    assert(ids1 == ids2)
    assert(ids1.size > 50 && ids1.size < 150) // ~100 of 500
    // smaller fraction is a strict subset: thresholds nest
    val ids3 = Sampling.hashSample(docs, "id", 0.1)
      .select($"id").as[Long].collect().toSet
    assert(ids3.subsetOf(ids1))
    // no exchange in the plan: the filter runs in the scan stage
    val plan = s1.queryExecution.executedPlan
    assert(!plan.toString.contains("Exchange"))
  }

  test("stratifiedTopK: exactly k per stratum, deterministic, group-limited") {
    val k = 7
    val out = Sampling.stratifiedTopK(docs, "lang", "id", k)
    val byLang = out.groupBy($"lang").count().as[(String, Long)]
      .collect().toMap
    assert(byLang == Map("en" -> 7L, "de" -> 7L))
    val again = Sampling.stratifiedTopK(docs, "lang", "id", k)
      .select($"id").as[Long].collect().toSet
    assert(again == out.select($"id").as[Long].collect().toSet)
    // the rank filter must become a WindowGroupLimit (partial top-k
    // below the stratum exchange), not a full per-stratum sort+filter
    val executed = out.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(executed.toString.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in:\n$executed")
  }

  test("tokenBudgetMix: budget respected, first over-budget doc admitted") {
    val budget = 100L
    val out = Sampling.tokenBudgetMix(docs, "lang", "id", "tokens", budget)
      .select($"lang", $"id", $"tokens")
      .as[(String, Long, Long)].collect()
    val byLang = out.groupBy(_._1)
    byLang.foreach { case (lang, rows) =>
      val total = rows.map(_._3).sum
      val maxDoc = rows.map(_._3).max
      // kept prefix exceeds the budget by less than one document
      assert(total < budget + maxDoc, s"$lang total=$total")
      // and the NEXT document in hash order would not have been admitted
      assert(total >= budget ||
        rows.size == docs.filter($"lang" === lang).count(), lang)
    }
    // the kept set is the hash-order PREFIX: re-deriving the order in
    // Scala must give the same selection
    val en = docs.filter($"lang" === "en")
      .select($"id", $"tokens").as[(Long, Long)].collect()
      .sortBy { case (id, _) =>
        (((id % Sampling.KeyMod) * 1103515245L + 12345L) % Sampling.KeyMod
          * 48271L % Sampling.KeyMod, id) }
    var cum = 0L
    val expectEn = en.takeWhile { case (_, t) =>
      val admit = cum < budget; cum += t; admit
    }.map(_._1).toSet
    assert(byLang("en").map(_._2).toSet == expectEn)
  }

  test("assignSplit: pure function of (id, salt) — stable under growth, proportional, md5-exact") {
    val splits = Seq("train" -> 58982, "val" -> 3277, "test" -> 3277)
    def assigned(n: Int): Map[Long, String] =
      spark.range(n).toDF("id")
        .select($"id", Sampling.assignSplit($"id", "s1", splits).as("s"))
        .as[(Long, String)].collect().toMap
    val small = assigned(500)
    val big = assigned(2000)
    // growth NEVER moves an assignment (the eval-leak property)
    assert(small.forall { case (id, s) => big(id) == s })
    // proportions track the weights (±5 points at n=2000)
    val frac = big.values.groupBy(identity).view.mapValues(
      _.size.toDouble / big.size).toMap
    assert(math.abs(frac("train") - 0.9) < 0.05, frac.toString)
    assert(math.abs(frac.getOrElse("val", 0.0) - 0.05) < 0.03)
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.05) < 0.03)
    // md5-exact: recompute a few assignments from first principles
    def ref(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:s1".getBytes("UTF-8"))
      val key = d.take(2).map(b => f"${b & 0xFF}%02x").mkString
      if (key < f"${58982}%04x") "train"
      else if (key < f"${58982 + 3277}%04x") "val" else "test"
    }
    (0L until 50L).foreach(id => assert(big(id) == ref(id), s"id $id"))
    // a different salt is a fresh assignment (epoch re-split)
    val resalted = spark.range(2000).toDF("id")
      .select($"id", Sampling.assignSplit($"id", "s2", splits).as("s"))
      .as[(Long, String)].collect().toMap
    assert(resalted != big)
    // a NULL id surfaces as a NULL split — never silently contaminates
    // the last-declared (eval) split
    val nullSplit = Seq(Some(1L), None).toDF("id")
      .select(Sampling.assignSplit($"id", "s1", splits).as("s"))
      .as[Option[String]].collect().toSet
    assert(nullSplit.contains(None) && nullSplit.flatten.nonEmpty)
    // misconfiguration fails loudly
    intercept[IllegalArgumentException] {
      Sampling.assignSplit($"id", "s1", Seq("a" -> 100))
    }
    intercept[IllegalArgumentException] {
      Sampling.assignSplit($"id", "s1",
        Seq("a" -> 32768, "a" -> 32768))
    }
  }
}
