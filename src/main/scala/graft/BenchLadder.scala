package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 scale ladder (VERDICT r5 item #8, r4 methodology): the round-5
  * multi-exchange operators measured at 1× vs 10× corpus inside ONE
  * session, back-to-back, with single-thread kernel probes bracketing
  * every measurement so a host throttle window is visible in the
  * artifact. The reported ratio is rate(10×)/rate(1×) = t1×·10/t10× —
  * ≥ 0.8 means the op's cost is linear in the corpus within 20%.
  *
  * NOT part of the frozen driver bench ([[Bench]] untouched); numbers
  * are cited in OPTIMIZATION_r06.md. Heap must be sized to the data
  * (`SPARK_DRIVER_MEM`, BASELINE.md ladder lesson). Inputs are
  * deterministic synthetic corpora written to parquet first; every
  * measurement computes from those parquet inputs through a noop sink
  * (guide §1.4).
  *
  * Usage: SPARK_DRIVER_MEM=48 sbt "runMain graft.BenchLadder [n1 [mult]]"
  * (defaults 24000, 10×). */
object BenchLadder {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ladder")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Deterministic doc corpus: ~60-word texts over a small vocab; every
    * 7th doc is a near-copy of an earlier doc (shared shingles for the
    * near-dedup ops), every 11th an exact dup (dup spans). */
  private def writeDocs(spark: SparkSession, n: Int, dir: String): Unit = {
    import spark.implicits._
    spark.range(n).as[Long].map { id =>
      val base = if (id % 7 == 3) id - 3 else if (id % 11 == 5) id - 5 else id
      val rnd = new java.util.Random(42L + base)
      val words = (0 until 60).map(_ => s"w${rnd.nextInt(5000)}")
      val tail = if (id % 7 == 3) s" extra$id" else ""
      (id, words.mkString(" ") + tail, s"s${id % 20}")
    }.toDF("doc_id", "text", "source")
      .repartition(32).write.mode("overwrite").parquet(dir)
  }

  /** Deterministic edge list: every node has out-degree 2 (no dangling —
    * pageRankFixedPoint's contract), mild in-degree skew via the mod-7
    * hub family. */
  private def writeEdges(spark: SparkSession, n: Int, dir: String): Unit = {
    import spark.implicits._
    spark.range(n).as[Long].flatMap { i =>
      Seq((i, (i * 7 + 1) % n), (i, if (i % 7 == 0) (i / 7) % n else (i * 13 + 5) % n))
    }.toDF("src", "dst").repartition(32).write.mode("overwrite").parquet(dir)
  }

  /** Deterministic URL frontier: 1 url/row over n/50 hosts. */
  private def writeUrls(spark: SparkSession, n: Int, dir: String): Unit = {
    import spark.implicits._
    val hosts = math.max(2, n / 50)
    spark.range(n).as[Long].map { i =>
      (s"https://h${i % hosts}.example.com/p/$i", s"h${i % hosts}.example.com", (i * 31 % 100).toInt)
    }.toDF("url", "host", "prio").repartition(32).write.mode("overwrite").parquet(dir)
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val n1 = args.headOption.map(_.toInt).getOrElse(24000)
    val mult = if (args.length > 1) args(1).toInt else 10
    val n10 = n1 * mult
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val base = java.nio.file.Files.createTempDirectory("graft-ladder").toString
    val s = session(cpus)

    println(s"ladder: n1=$n1 n10=$n10 heap=${Runtime.getRuntime.maxMemory() / (1 << 30)}g")
    writeDocs(s, n1, s"$base/docs1"); writeDocs(s, n10, s"$base/docs10")
    writeEdges(s, n1, s"$base/edges1"); writeEdges(s, n10, s"$base/edges10")
    writeUrls(s, n1, s"$base/urls1"); writeUrls(s, n10, s"$base/urls10")
    def docs(sz: Int) = s.read.parquet(s"$base/docs$sz")
    def edges(sz: Int) = s.read.parquet(s"$base/edges$sz")
    def urls(sz: Int) = s.read.parquet(s"$base/urls$sz")

    val probeMedia = graft.testkit.KernelBench.genMedia(250)
    graft.testkit.KernelBench.run(probeMedia.take(100), 1) // JIT settle
    def probe(): Double = graft.testkit.KernelBench.run(probeMedia, 1)

    val ops: Seq[(String, Int => DataFrame)] = Seq(
      "removeDupNgramSpans" -> (sz =>
        operators.TrainingOps.removeDupNgramSpans(docs(sz).select(col("doc_id"), col("text")))),
      "dedupNearVsPrior" -> (sz =>
        operators.TrainingOps.dedupNearVsPrior(
          docs(sz).where(col("doc_id") % 2 === 0),
          docs(sz).where(col("doc_id") % 2 === 1), threshold = 0.5)),
      "pageRankFixedPoint" -> (sz =>
        operators.GraphOps.pageRankFixedPoint(edges(sz), iterations = 3)),
      "frontierSchedule" -> (sz =>
        operators.WebOps.frontierSchedule(urls(sz), col("prio"), maxRounds = 8)))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm codegen/JIT on the small size once per op
    ops.foreach { case (_, fn) => noop(fn(1)) }
    val rows = ops.map { case (name, fn) =>
      val pB = probe()
      val t1 = time(noop(fn(1)))
      val pM = probe()
      val t10 = time(noop(fn(10)))
      val pA = probe()
      val ratio = t1 * mult / t10
      println(f"LADDER $name%-22s t1x=$t1%7.2f s  t10x=$t10%7.2f s  ratio=$ratio%.3f  probes=$pB%.0f/$pM%.0f/$pA%.0f")
      (name, t1, t10, ratio, pB, pM, pA)
    }
    println("LADDER_SUMMARY " + rows.map { case (n, _, _, r, _, _, _) => f"$n=$r%.3f" }.mkString(" "))
    s.stop()
  }
}
