package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked retrieval over the corpus — the query side of the index family
  * ([[TrainingOps.termDocFreq]] / [[TrainingOps.invertedIndex]] /
  * [[TrainingOps.tfIdf]] build the statistics; this scores and ranks).
  * Used in a training pipeline for targeted curation: "find the documents
  * most about X" without a full-text engine next to the cluster.
  *
  * Scoring is BM25 (k1 = 1.2, b = 0.75) with one documented deviation:
  * the idf factor is the raw Robertson ratio (N − df + 0.5)/(df + 0.5)
  * WITHOUT the log. Rationale: every arithmetic op used (+, −, ×, ÷ on
  * IEEE doubles whose integer inputs are < 2^53) is exactly rounded and
  * therefore bit-identical across engines — the same contract the kNN
  * cosine oracles rely on — whereas ln() is implementation-defined in the
  * last ulp and would break hash-exact verification. The ratio is
  * monotone-decreasing in df like the log form (common terms still score
  * low, it never goes negative), rare terms just separate more sharply.
  * Per-term scores are quantized to integer micro-units BEFORE summation
  * so the document score is a sum of BIGINTs — order-independent, exactly
  * reproducible under any partitioning. */
object SearchOps {

  /** Top-k documents per query by fixed-point BM25 score.
    *
    * `queryTerms` is a tiny (qid, term) frame (terms lowercase); `docs`
    * needs (doc_id, text). Output: (qid, doc_id, score_fp, rk), rk 1..k
    * by (score_fp desc, doc_id) — deterministic total order.
    *
    * 100 TB shape: two narrow corpus passes (one for the corpus-level
    * (N, Σdl) pair, one tokenizing scan), and the only rows that ever
    * shuffle are (doc, query-term) matches — the explode's non-query
    * tokens die in a codegen'd filter before any exchange. Query terms,
    * per-term df, and the 1-row stats frame are broadcast. Top-k is a
    * per-qid WindowGroupLimit, never a global sort. A materialized
    * inverted index would replace the tokenizing scan; the score
    * arithmetic is identical either way. */
  def bm25TopK(docs: DataFrame, queryTerms: DataFrame, k: Int = 10): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val arr = split(lower(col("text")), "\\s+")
    val base = docs.select(col("doc_id"), arr.as("__arr"))
      .withColumn("dl", size(filter(col("__arr"), t => t =!= lit(""))).cast("long"))
    // 1-row corpus stats: N over ALL docs (empty docs count — they are
    // retrievable corpus members with dl = 0), Σdl over token counts
    val stats = base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val qtDistinct = queryTerms.select(col("term")).distinct()
    val tfq = base
      .select(col("doc_id"), col("dl"), explode(col("__arr")).as("term"))
      .where(col("term") =!= "")
      .join(broadcast(qtDistinct), Seq("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // per-query-term document frequency: tfq rows are unique per
    // (doc, term), so a count per term IS df — vocabulary-of-query sized
    val dfq = tfq.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tfq
      .join(broadcast(dfq), Seq("term"))
      .join(broadcast(queryTerms), Seq("term"))
      .crossJoin(broadcast(stats))
    // expression trees mirrored verbatim in the SQL oracle — do not
    // reassociate: IEEE ops are exactly rounded but not associative
    val idf = (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val tfc = (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") * col("n_docs") / col("sum_dl"))))
    val perTermFp = floor(lit(1000000.0) * idf * tfc)
    val aggScores = scored.withColumn("__s", perTermFp)
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("__s")).as("score_fp"))
    val w = Window.partitionBy(col("qid")).orderBy(col("score_fp").desc, col("doc_id"))
    aggScores.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("qid"), col("doc_id"), col("score_fp"), col("rk"))
  }
}
