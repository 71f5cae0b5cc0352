package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the retrieval/embedding prep op:
  * cut each document into chunks of `chunkTokens` whitespace tokens,
  * stepping `stride` tokens between chunk starts. stride < chunkTokens
  * gives overlapping chunks (context preserved across boundaries, the
  * RAG-ingestion default); stride = chunkTokens gives a partition.
  * The final chunk may be shorter than `chunkTokens` (documents don't
  * end on stride boundaries); every token appears in at least one
  * chunk, and no chunk is a pure suffix of its predecessor — starts
  * stop at the first chunk that reaches the document end.
  *
  * Pure scan-stage expression work — `sequence`/`slice`/`transform` +
  * one explode, no shuffle, no UDF: at 100 TB chunking adds zero wide
  * ops to whatever pipeline it feeds (the embedder, the packer, the
  * exporter). Integer-exact layout (chunk_id, start_tok, n_tokens), so
  * any SQL engine recomputes the identical chunk set.
  */
object Chunking {

  /** One row per chunk: (idCol, chunk_id, start_tok, n_tokens, chunk).
    * chunk_id is 0-based and dense per document; start_tok is the
    * 0-based token index of the chunk start; chunk is the token-joined
    * text (inter-token whitespace normalizes to single spaces). */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1: $chunkTokens")
    require(stride >= 1 && stride <= chunkTokens,
      s"stride must be in [1, chunkTokens]: $stride")
    val toks = split(col(textCol), " ")
    val n = size(toks)
    // last start = the smallest stride multiple whose chunk reaches the
    // document end: starts past it would emit chunks that are pure
    // suffixes of the previous chunk (already fully covered — duplicate
    // content inflating the set fed to embedders). Every token is still
    // covered and only the final chunk may be short.
    // NULL text must stay null so explode drops the document (an
    // .otherwise(0) would catch null n and emit a phantom null chunk);
    // null falls through both whens
    val lastStart = when(n > chunkTokens,
        (floor((n - chunkTokens + (stride - 1)) / lit(stride)) *
          stride).cast("int"))
      .when(n <= chunkTokens, lit(0))
    val chunks = transform(sequence(lit(0), lastStart, lit(stride)),
      st => struct(
        (st / stride).cast("long").as("chunk_id"),
        st.cast("long").as("start_tok"),
        least(lit(chunkTokens), n - st).cast("long").as("n_tokens"),
        array_join(slice(toks, st + 1, lit(chunkTokens)), " ").as("chunk")))
    df.select(col(idCol), explode(chunks).as("c"))
      .select(col(idCol), col("c.chunk_id"), col("c.start_tok"),
        col("c.n_tokens"), col("c.chunk"))
  }
}
