package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.testkit.Corpus

/** Structured-Streaming extraction: files arriving in two waves are all
  * extracted exactly once (checkpointed restart between waves). */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("two file waves, checkpointed, exactly-once output") {
    val s = spark
    import s.implicits._
    val built = Corpus.build(nDocs = 12, heavyEvery = 1000)
    val media = s.createDataset(built.media).toDF()
    val base = java.nio.file.Files.createTempDirectory("stream-spec").toString
    val docsDir = s"$base/docs"
    val outDir = s"$base/out"
    val (wave1, wave2) = built.docs.splitAt(6)
    val schema = s.createDataset(built.docs).toDF().schema

    s.createDataset(wave1).toDF().write.mode("append").parquet(docsDir)
    val q1 = streaming.StreamingExtract.start(s, docsDir, media, outDir, schema)
    q1.awaitTermination(60000)

    s.createDataset(wave2).toDF().write.mode("append").parquet(docsDir)
    val q2 = streaming.StreamingExtract.start(s, docsDir, media, outDir, schema)
    q2.awaitTermination(60000)

    val got = s.read.parquet(s"$outDir/spans_out")
      .select("doc_id", "order", "kind", "text", "media_ref")
      .as[(String, Int, String, String, String)].collect().sorted
    val want = built.expected.map(o => (o.doc_id, o.order, o.kind, o.text, o.media_ref)).sorted.toArray
    assert(got.length == want.length, s"streaming rows ${got.length} vs ${want.length}")
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }
}
