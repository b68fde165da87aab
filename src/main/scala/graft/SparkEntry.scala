package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{TrainingOps, MediaOps}
import graft.testkit.{PdfBuilder, Corpus}

/** Driver contract: one `queries` entry per implemented operator family
  * (SURVEY.md §2 + the training-data ops), each with a DuckDB oracle where
  * SQL-expressible. Extraction queries carry exact VALUES oracles built from
  * the by-construction fixture expectations. */
object SparkEntry {

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  // ---------- extraction queries (kernel operator families) ----------

  private def fx(names: String*): Seq[PdfBuilder.Fixture] = {
    val all = (PdfBuilder.all :+ PdfBuilder.f16Garbage).map(f => f.name -> f).toMap
    names.map(all)
  }

  /** fixture family per extraction query — each exercises one §2 block */
  private val extractionSets: Seq[(String, Seq[PdfBuilder.Fixture])] = Seq(
    "x_pdf_classic" -> fx("f01_minimal_flate", "f14_damaged_xref"),
    "x_pdf_xrefstream" -> fx("f02_xrefstream_objstm"),
    "x_pdf_filters" -> fx("f03_filters"),
    "x_pdf_crypto" -> fx("f04_rc4", "f05_aesv2"),
    "x_pdf_fonts" -> fx("f06_widths_diff", "f07_cid_tounicode", "f12_vertical_font"),
    "x_pdf_layout" -> fx("f10_multicolumn", "f11_zero_width", "f13_tj_kerning"),
    "x_pdf_structure" -> fx("f08_xobject", "f09_rotate", "f15_annots"),
    "x_pdf_errors" -> fx("f16_garbage", "f01_minimal_flate"),
    "x_pdf_fonts2" -> fx("f17_macroman", "f18_type3", "f22_truetype", "f25_fontfile1", "f26_cjk_gbk"),
    "x_pdf_structure2" -> fx("f19_prev_chain", "f20_quote_ops", "f21_contents_array",
      "f23_lzw_tiff", "f24_inline_image"))

  private def sizeBucket(n: Int): Int = 32 - Integer.numberOfLeadingZeros(math.max(1, n - 1))

  /** Run the extraction pipeline over a one-doc-per-fixture corpus. */
  private def extractionDF(spark: SparkSession, fixtures: Seq[PdfBuilder.Fixture]): DataFrame = {
    implicit val s: SparkSession = spark
    import s.implicits._
    val docs = s.createDataset(fixtures.map(f =>
      Model.DocRow(f.name, Seq(Model.InSpan("pdf", "", f.name, 0))))).toDF()
    val media = s.createDataset(fixtures.map(f =>
      Model.MediaRow(f.name, f.bytes, sizeBucket(f.bytes.length)))).toDF()
    val refs = docs.select(explode(col("spans.media_ref")).as("media_ref")).distinct()
    val extracted = ExtractJob.extractMedia(media, refs, s.sessionState.conf.numShufflePartitions)
    ExtractJob.assembleSpans(docs, extracted.toDF())
      .select(col("doc_id"), col("order").as("ord"), col("kind"), col("text"), col("media_ref"))
  }

  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Exact VALUES oracle from the by-construction expected text. */
  private def extractionOracle(fixtures: Seq[PdfBuilder.Fixture]): String = {
    val rows = fixtures.map { f =>
      val (kind, text) =
        if (f.name == "f16_garbage") ("error", "") else ("pdf_text", f.expected)
      s"(${sqlStr(f.name)}, 0, ${sqlStr(kind)}, ${sqlStr(text)}, ${sqlStr(f.name)})"
    }
    s"SELECT * FROM (VALUES ${rows.mkString(", ")}) AS t(doc_id, ord, kind, text, media_ref)"
  }

  // ---------- contract ----------

  /** Flagship: full extraction pipeline over an interleaved corpus. */
  def entry(spark: SparkSession): DataFrame = {
    implicit val s: SparkSession = spark
    import s.implicits._
    val built = Corpus.build(nDocs = 16, heavyEvery = 8)
    val docs = s.createDataset(built.docs).toDF()
    val media = s.createDataset(built.media).toDF()
    val refs = docs.select(explode(col("spans.media_ref")).as("media_ref"))
      .where(col("media_ref") =!= "").distinct()
    ExtractJob.assembleSpans(docs,
      ExtractJob.extractMedia(media, refs, 8).toDF())
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val extraction: Seq[(String, (SparkSession, String) => DataFrame)] =
      extractionSets.map { case (name, fixtures) =>
        name -> ((s: SparkSession, _: String) => extractionDF(s, fixtures))
      }

    val relational: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "q_agg_pricing" -> ((s: SparkSession, d: String) =>
        t(s, d, "lineitem").groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(18,2)").as("sum_qty"),
            sum(col("l_extendedprice").cast("decimal(18,2)")).cast("decimal(18,2)").as("sum_price"))),

      "q_join_nation_revenue" -> ((s: SparkSession, d: String) =>
        t(s, d, "orders")
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("decimal(18,2)").as("revenue"))),

      "q_window_top_order" -> ((s: SparkSession, d: String) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, d, "orders").withColumn("rn", row_number().over(w))
          .where(col("rn") === 1).select(col("o_custkey"), col("o_orderkey"))
      }),

      "q_topk_price" -> ((s: SparkSession, d: String) =>
        t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice").cast("decimal(18,2)").as("price"))
          .orderBy(col("price").desc, col("l_orderkey"), col("l_linenumber"))
          .limit(100)),

      "q_semi_active_customers" -> ((s: SparkSession, d: String) =>
        t(s, d, "customer").join(t(s, d, "orders"),
          col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))),

      "q_anti_no_big_order" -> ((s: SparkSession, d: String) =>
        t(s, d, "customer").join(
          t(s, d, "orders").where(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))),

      "q_events_by_type" -> ((s: SparkSession, d: String) =>
        t(s, d, "events").groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"),
            sum(col("value").cast("decimal(18,3)")).cast("decimal(18,3)").as("sum_value"))))

    val training: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "q_dedup_exact" -> ((s: SparkSession, d: String) =>
        TrainingOps.dedupExact(t(s, d, "documents"))),
      "q_dedup_exact_hash" -> ((s: SparkSession, d: String) =>
        TrainingOps.dedupExactByHash(t(s, d, "documents"))),
      "q_token_count" -> ((s: SparkSession, d: String) =>
        TrainingOps.tokenCount(t(s, d, "documents"))),
      "q_quality" -> ((s: SparkSession, d: String) =>
        TrainingOps.quality(t(s, d, "documents"))),
      "q_langid" -> ((s: SparkSession, d: String) =>
        TrainingOps.langId(t(s, d, "documents"))),
      "q_fingerprint" -> ((s: SparkSession, d: String) =>
        TrainingOps.fingerprint(t(s, d, "documents"))),
      "q_minhash_lsh_pairs" -> ((s: SparkSession, d: String) =>
        TrainingOps.minhashLshPairs(t(s, d, "documents"))),
      "q_simhash" -> ((s: SparkSession, d: String) =>
        TrainingOps.simhash(t(s, d, "documents"))),
      "q_ngram_jaccard_pairs" -> ((s: SparkSession, d: String) =>
        TrainingOps.ngramJaccardPairs(t(s, d, "documents"), threshold = 0.3)),
      "q_knn_brute" -> ((s: SparkSession, d: String) => {
        val e = t(s, d, "embeddings")
        TrainingOps.knnBrute(e, e.orderBy(col("vec_id")).limit(5), k = 10)
      }),
      "q_knn_lsh" -> ((s: SparkSession, d: String) => {
        val e = t(s, d, "embeddings")
        TrainingOps.knnLsh(e, e.orderBy(col("vec_id")).limit(5), dim = 64, k = 10)
      }),
      "q_knn_ivf" -> ((s: SparkSession, d: String) => {
        val e = t(s, d, "embeddings")
        TrainingOps.knnIvf(e, e.orderBy(col("vec_id")).limit(5), dim = 64, k = 10)
      }),
      "q_token_count_bpe" -> ((s: SparkSession, d: String) =>
        TrainingOps.tokenCountBpe(t(s, d, "documents"))),
      "q_semantic_dup_pairs" -> ((s: SparkSession, d: String) =>
        TrainingOps.semanticDupPairs(t(s, d, "embeddings"), dim = 64, threshold = 0.8)),
      "q_media_features" -> ((s: SparkSession, d: String) => {
        implicit val sp: SparkSession = s
        import sp.implicits._
        val media = sp.createDataset((PdfBuilder.all :+ PdfBuilder.f16Garbage).map(f =>
          (f.name, "application/pdf", f.bytes))).toDF("media_ref", "kind", "bytes")
        MediaOps.featurize(media, dim = 16).toDF()
          .select(col("media_ref"), col("kind"), col("n_bytes"), col("width"), col("height"))
      }))

    (extraction ++ relational ++ training).toMap
  }

  def oracleSql: Map[String, String] = {
    val extraction = extractionSets.map { case (name, fixtures) =>
      name -> extractionOracle(fixtures)
    }
    val nTokens = "CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT)"
    val padded = "' ' || text || ' '"
    def hasWord(w: String) = s"POSITION(' $w ' IN $padded) > 0"
    val sql = Seq(
      "q_agg_pricing" ->
        ("SELECT l_returnflag, l_linestatus, COUNT(*) AS n, " +
          "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty, " +
          "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_price " +
          "FROM lineitem GROUP BY l_returnflag, l_linestatus"),
      "q_join_nation_revenue" ->
        ("SELECT n_name, COUNT(*) AS n_orders, " +
          "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS revenue " +
          "FROM orders JOIN customer ON o_custkey = c_custkey " +
          "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"),
      "q_window_top_order" ->
        ("SELECT o_custkey, o_orderkey FROM (SELECT o_custkey, o_orderkey, " +
          "ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn " +
          "FROM orders) t WHERE rn = 1"),
      "q_topk_price" ->
        ("SELECT l_orderkey, l_linenumber, CAST(l_extendedprice AS DECIMAL(18,2)) AS price " +
          "FROM lineitem ORDER BY price DESC, l_orderkey, l_linenumber LIMIT 100"),
      "q_semi_active_customers" ->
        "SELECT c_custkey, c_name FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
      "q_anti_no_big_order" ->
        ("SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS " +
          "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)"),
      "q_events_by_type" ->
        ("SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users, " +
          "CAST(SUM(CAST(value AS DECIMAL(18,3))) AS DECIMAL(18,3)) AS sum_value " +
          "FROM events GROUP BY event_type"),
      "q_dedup_exact" ->
        "SELECT text, MIN(doc_id) AS keep_id, COUNT(*) AS dup_count FROM documents GROUP BY text",
      "q_token_count" ->
        s"SELECT doc_id, $nTokens AS n_tokens FROM documents",
      "q_token_count_bpe" ->
        ("SELECT doc_id, CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) " +
          "AS n_bpe_tokens FROM documents"),
      "q_quality" ->
        (s"SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars, $nTokens AS n_tokens, " +
          s"CASE WHEN LENGTH(text) < 50 THEN 'short' WHEN $nTokens > 20 THEN 'long' ELSE 'ok' END AS quality_bucket " +
          "FROM documents"),
      "q_langid" ->
        (s"SELECT doc_id, CASE WHEN ${hasWord("the")} OR ${hasWord("and")} OR ${hasWord("of")} THEN 'en' " +
          s"WHEN ${hasWord("der")} OR ${hasWord("und")} OR ${hasWord("die")} THEN 'de' " +
          s"WHEN ${hasWord("el")} OR ${hasWord("la")} OR ${hasWord("los")} THEN 'es' " +
          "ELSE 'unk' END AS lang_pred FROM documents"))
    (extraction ++ sql).toMap
    // q_dedup_exact_hash / q_fingerprint / q_minhash_lsh_pairs / q_simhash /
    // q_ngram_jaccard_pairs / q_knn_* / q_semantic_dup_pairs /
    // q_media_features: hash/LSH internals aren't ANSI-SQL-expressible →
    // driver records the weaker rows-only check.
  }
}
