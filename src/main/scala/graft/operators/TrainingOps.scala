package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Large-scale training-data pipeline operators, Spark-first: every op is
  * pure Catalyst expressions (whole-stage codegen, no UDFs) unless noted.
  *
  * Scale notes per op are in each method's doc. `documents(doc_id, text)`
  * and `embeddings(vec_id, embedding: array<float>)` are the input shapes
  * (matching /root/testdata). */
object TrainingOps {

  // ---------- deduplication ----------

  /** Exact dedup: hash-aggregate on the full text. One shuffle on text;
    * partial aggregation map-side. At 100 TB prefer grouping on
    * xxhash64(text) first to avoid shuffling long strings; both variants
    * below share the same result shape. */
  def dedupExact(docs: DataFrame): DataFrame =
    docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Exact dedup at scale: shuffle 8-byte hashes, not documents. */
  def dedupExactByHash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), xxhash64(col("text")).as("h"))
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))

  private def tokensCol(text: Column): Column =
    split(lower(text), "\\s+")

  /** k-shingles (word n-grams) as an array column. */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokensCol(text)
    when(size(toks) < k, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** FNV-1a 64-bit over a string (shingle base hash). */
  @inline private def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** splitmix64 finalizer — derives the per-hash-function family member. */
  @inline private def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** MinHash signatures via a typed per-partition pass. Kept OFF the
    * Catalyst expression path on purpose: signature computation is the
    * one hot loop here, higher-order SQL lambdas run interpreted (no
    * codegen CSE — measured ~0.4 ms/doc), and crucially the typed boundary
    * (SerializeFromObject) is a hard barrier, so downstream banding can
    * never be rewritten into re-evaluating the signature per band.
    * Requires docs(doc_id: castable-to-long, text: string). */
  def minhash(docs: DataFrame, numHashes: Int = 16, shingleK: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val toks = text.toLowerCase(java.util.Locale.ROOT).split("\\s+")
          val sig = Array.fill(numHashes)(Long.MaxValue)
          val n = math.max(1, toks.length - shingleK + 1)
          val sb = new java.lang.StringBuilder(64)
          var i = 0
          while (i < n) {
            sb.setLength(0)
            var j = 0
            while (j < shingleK && i + j < toks.length) {
              if (j > 0) sb.append(' ')
              sb.append(toks(i + j))
              j += 1
            }
            val h0 = fnv64(sb.toString)
            var h = 0
            while (h < numHashes) {
              val v = mix64(h0 + h * 0x632be59bd9b4e019L)
              if (v < sig(h)) sig(h) = v
              h += 1
            }
            i += 1
          }
          (id, sig)
        }
      }.toDF("doc_id", "minhash")
  }

  /** MinHash + LSH banding: docs sharing any band bucket become candidate
    * pairs; estimated jaccard = matching-signature fraction.
    * Shuffle profile: one explode×bands → groupBy(band, bucket) — keys are
    * 16-byte, not documents; self-join happens only within buckets, which is
    * the point of LSH (no O(n²) crossjoin). Skewed mega-buckets (boilerplate
    * shingles) are capped via `maxBucket`. */
  def minhashLshPairs(docs: DataFrame, numHashes: Int = 16, bands: Int = 4,
                      shingleK: Int = 3, maxBucket: Int = 64): DataFrame = {
    val rows = numHashes / bands
    val mh = minhash(docs, numHashes, shingleK)
    // explode a LITERAL band-index sequence, not an array derived from the
    // signature: Generate plants an implicit `size(input) > 0` filter which
    // Catalyst pushes down and re-evaluates per row if the input is a
    // computed array (measured 30× slowdown before the typed barrier).
    val banded = mh
      .select(col("doc_id"), col("minhash"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .select(col("doc_id"), col("minhash"), col("band"),
        xxhash64(concat_ws(",",
          transform(slice(col("minhash"), col("band") * rows + 1, lit(rows)),
            x => x.cast("string"))), col("band")).as("bucket"))
    val buckets = banded.groupBy(col("band"), col("bucket"))
      .agg(collect_list(struct(col("doc_id"), col("minhash"))).as("members"))
      .where(size(col("members")) > 1 && size(col("members")) <= maxBucket)
    // pair expansion inside a bucket (bounded by maxBucket)
    val pairs = buckets.select(explode(expr(
      """flatten(transform(members, (a, i) ->
        |  transform(slice(members, i + 2, size(members)), b ->
        |    struct(a.doc_id as doc_a, b.doc_id as doc_b,
        |           aggregate(zip_with(a.minhash, b.minhash, (x, y) -> if(x = y, 1, 0)),
        |                     0, (acc, v) -> acc + v) as matches))))""".stripMargin)).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"), (col("p.matches") / numHashes).as("est_jaccard"))
    pairs.groupBy(col("doc_a"), col("doc_b")).agg(max(col("est_jaccard")).as("est_jaccard"))
  }

  /** SimHash (64-bit): per-token hash bit votes. Pure expressions (SQL
    * higher-order lambdas — the Scala shiftright wrapper only takes literal
    * shift counts, the SQL form takes a column). */
  def simhash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), expr(
      """aggregate(sequence(0, 63), 0L, (acc, b) ->
        |  shiftleft(acc, 1) | if(
        |    aggregate(split(lower(text), '\\s+'), 0L, (a2, t) ->
        |      a2 + if((shiftright(xxhash64(t), 63 - b) & 1) = 1, 1L, -1L)) > 0, 1L, 0L))
        |""".stripMargin).as("simhash"))

  /** Exact n-gram Jaccard verification over LSH candidate pairs: the
    * standard two-stage near-dup pipeline (candidates from LSH, exact
    * set-similarity only on candidates). */
  def ngramJaccardPairs(docs: DataFrame, shingleK: Int = 3, threshold: Double = 0.5,
                        numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val cands = minhashLshPairs(docs, numHashes, bands, shingleK)
    // exact shingle sets only for candidate docs (semi-join first): at scale
    // the candidate set is orders of magnitude smaller than the corpus
    val candIds = cands.select(col("doc_a").as("doc_id"))
      .union(cands.select(col("doc_b").as("doc_id"))).distinct()
    val sets = docs.join(candIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), array_distinct(shingles(col("text"), shingleK)).as("sh"))
    cands
      .join(sets.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), Seq("doc_a"))
      .join(sets.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  // ---------- embedding similarity ----------

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  private def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: broadcast the (small) query set against the
    * full corpus; per-corpus-row scan stays in codegen, then a top-k window
    * per query. At 100 TB this is the exact baseline you run on a sample;
    * the LSH variant below is the scale path. */
  def knnBrute(embeddings: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    val scored = embeddings.crossJoin(q)
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), cosine(col("q_emb"), col("embedding")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Deterministic random hyperplanes for sign-LSH (seeded, no RNG state). */
  private def hyperplane(bit: Int, dim: Int): Seq[Double] =
    (0 until dim).map { i =>
      val h = scala.util.hashing.MurmurHash3.productHash((42, bit, i))
      (h.toDouble / Int.MaxValue)
    }

  /** Sign-LSH bucket id for an embedding column. */
  def lshBucket(emb: Column, dim: Int, bits: Int = 8): Column = {
    (0 until bits).map { b =>
      val plane = array(hyperplane(b, dim).map(lit): _*)
      when(dot(emb, plane) > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** ANN via sign-LSH bucketing: cosine evaluated only within buckets —
    * the scale path (bucket join instead of crossjoin). Recall < 1 by
    * design; verified against knnBrute in tests. */
  def knnLsh(embeddings: DataFrame, queries: DataFrame, dim: Int, k: Int = 10, bits: Int = 6): DataFrame = {
    val e = embeddings.withColumn("bucket", lshBucket(col("embedding"), dim, bits))
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .withColumn("bucket", lshBucket(col("q_emb"), dim, bits)))
    val scored = e.join(q, Seq("bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), cosine(col("q_emb"), col("embedding")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** ANN via IVF (inverted-file index): a k-means coarse quantizer assigns
    * every vector to its nearest centroid; queries search only the
    * `nProbe` nearest cells. The standard billion-scale layout: centroids
    * are tiny and broadcast; the corpus is partitioned by cell. Seeded —
    * fully deterministic. */
  def knnIvf(embeddings: DataFrame, queries: DataFrame, dim: Int, k: Int = 10,
             nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = embeddings.sparkSession
    val train = embeddings.select(array_to_vector(col("embedding").cast("array<double>")).as("features"))
    val model = new KMeans().setK(nCells).setSeed(42L).setMaxIter(5).fit(train)
    val centroids = model.clusterCenters.map(_.toArray)
    // nearest-cell assignment as a pure expression over broadcast centroid literals
    def cellDist(emb: Column, c: Array[Double]): Column =
      aggregate(zip_with(emb, array(c.map(lit): _*), (x, y) => (x - y) * (x - y)),
        lit(0.0d), (acc, v) => acc + v)
    def nearestCells(emb: Column, n: Int): Column = {
      val scored = array(centroids.zipWithIndex.map { case (c, i) =>
        struct(cellDist(emb, c).as("d"), lit(i).as("cell"))
      }: _*)
      slice(transform(array_sort(scored), s => s.getField("cell")), lit(1), lit(n))
    }
    val e = embeddings.withColumn("cell", element_at(nearestCells(col("embedding"), 1), 1))
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .withColumn("cell", explode(nearestCells(col("q_emb"), nProbe))))
    val scored = e.join(q, Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), cosine(col("q_emb"), col("embedding")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Embedding near-duplicate pairs (semantic dedup): bucket join + cosine
    * threshold. */
  def semanticDupPairs(embeddings: DataFrame, dim: Int, threshold: Double = 0.95, bits: Int = 6): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding"))
      .withColumn("bucket", lshBucket(col("embedding"), dim, bits))
    val a = e.select(col("bucket"), col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = e.select(col("bucket"), col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    a.join(b, Seq("bucket")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("emb_a"), col("emb_b")).as("cos"))
      .where(col("cos") >= threshold)
  }

  // ---------- text analysis ----------

  /** Whitespace token count, pure expressions (matches the ANSI oracle). */
  def tokenCount(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      (length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1).cast("long").as("n_tokens"))

  /** BPE-ish regex tokenizer count: letter runs / digit runs / single
    * punctuation, the GPT-2-style pre-tokenization shape. */
  def tokenCountBpe(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
        .cast("long").as("n_bpe_tokens"))

  /** Quality signals: lengths, token counts, bucket label. */
  def quality(docs: DataFrame): DataFrame = {
    val nTokens = (length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1).cast("long")
    docs.select(col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      nTokens.as("n_tokens"),
      when(length(col("text")) < 50, lit("short"))
        .when(nTokens > 20, lit("long"))
        .otherwise(lit("ok")).as("quality_bucket"))
  }

  /** Stopword-hit language-ID heuristic (tiny n-gram/stopword model; the
    * point is the shape — a per-row codegen'd classifier). */
  def langId(docs: DataFrame): DataFrame = {
    def hit(words: Seq[String]): Column =
      words.map(w => when(locate(s" $w ", concat(lit(" "), col("text"), lit(" "))) > 0, 1).otherwise(0))
        .reduce(_ + _)
    docs.select(col("doc_id"),
      when(hit(Seq("the", "and", "of")) >= 1, lit("en"))
        .when(hit(Seq("der", "und", "die")) >= 1, lit("de"))
        .when(hit(Seq("el", "la", "los")) >= 1, lit("es"))
        .otherwise(lit("unk")).as("lang_pred"))
  }

  /** Document fingerprint: 31-polynomial rolling hash over characters,
    * computed with a higher-order aggregate (no UDF). */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      aggregate(split(col("text"), ""), lit(0L),
        (acc, ch) => pmod(acc * 31 + coalesce(ascii(ch).cast("long"), lit(0L)), lit(2147483647L)))
        .as("fingerprint"))
}
