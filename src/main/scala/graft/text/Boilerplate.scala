package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level boilerplate removal — the standard curation step that
  * strips navigation chrome, cookie banners and footers from a crawled
  * corpus: a line occurring in at least `minDocs` documents OF THE SAME
  * DOMAIN is boilerplate, and every document of that domain drops it
  * (CCNet/RefinedWeb-style line-dedup, restated Spark-first; an LLM
  * pipeline operator — no reference analog).
  *
  * Scale shape: the document-frequency pass shuffles (domain, line
  * hash, doc id) — 24 bytes per distinct line occurrence, never text.
  * The removal pass joins each document to its domain's boilerplate
  * HASH SET — one row per domain, broadcastable by construction (lines
  * above a document-frequency threshold are few; it is the corpus that
  * is big, not the boilerplate) — and filters lines with a higher-order
  * function inside the scan stage, so document text never enters a
  * shuffle at all. xxhash64 line identity: a 64-bit collision drops an
  * innocent line; at curation scale that trade is standard and the
  * threshold keeps the boilerplate set small. */
object Boilerplate {

  /** Per-domain boilerplate lines: (domainCol, line_hash, doc_freq) for
    * every line appearing in >= `minDocs` distinct documents of the
    * domain. Blank lines are never boilerplate (removing them would
    * rewrite paragraph structure, not chrome). */
  def boilerplateLines(docs: DataFrame, idCol: String, textCol: String,
      domainCol: String, minDocs: Int): DataFrame = {
    require(minDocs >= 2, "minDocs < 2 would flag every line")
    docs.select(col(domainCol), col(idCol).as("__doc"),
        explode(split(col(textCol), "\n")).as("__line"))
      .filter(trim(col("__line")) =!= "")
      .select(col(domainCol), xxhash64(col("__line")).as("line_hash"),
        col("__doc"))
      .distinct()
      .groupBy(col(domainCol), col("line_hash"))
      .agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= minDocs)
  }

  /** Rewrite `textCol` with each domain's boilerplate lines removed;
    * documents of domains with no boilerplate pass through unchanged.
    * Line order is preserved; only membership changes. */
  def removeBoilerplate(docs: DataFrame, idCol: String, textCol: String,
      domainCol: String, minDocs: Int): DataFrame = {
    val sets = boilerplateLines(docs, idCol, textCol, domainCol, minDocs)
      .groupBy(col(domainCol))
      .agg(collect_list(col("line_hash")).as("__boiler"))
    docs.join(broadcast(sets), Seq(domainCol), "left")
      .withColumn(textCol,
        when(col("__boiler").isNull, col(textCol))
          .otherwise(concat_ws("\n",
            filter(split(col(textCol), "\n"),
              l => !array_contains(col("__boiler"), xxhash64(l))))))
      .drop("__boiler")
  }
}
