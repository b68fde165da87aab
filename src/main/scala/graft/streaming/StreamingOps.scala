package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming operators beyond the micro-batch extraction front end:
  * watermarked event-time windowing and custom keyed state — the two
  * Structured-Streaming primitives a continuously-fed training-data
  * pipeline needs (ingest metrics per event-time window; exact dedup
  * across micro-batches without reprocessing history). */
object StreamingOps {

  case class TimedDoc(doc_id: Long, text: String, source: String, event_time: java.sql.Timestamp)

  /** Watermarked tumbling-window ingest metrics: docs and bytes per
    * (event-time window, source). The watermark bounds state: windows
    * older than it are finalized and dropped — at 100 TB/day the state
    * store holds hours, not history. */
  def windowedDocMetrics(docs: DataFrame, watermark: String = "10 minutes",
                         win: String = "1 hour"): DataFrame =
    docs.withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), win), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(length(col("text"))).as("n_chars"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("source"), col("n_docs"), col("n_chars"))

  /** Cross-batch streaming exact dedup via flatMapGroupsWithState: keyed
    * by xxhash64(text) — 8-byte keys, NOT the text itself, so the
    * checkpointed state store holds one long + one bit per distinct
    * document instead of the corpus (collision-tolerant, the same
    * trade-off as the batch hash-dedup). A key's first batch emits its
    * minimal doc_id; every later occurrence (same batch or any later
    * micro-batch) is suppressed; a restart resumes dedup exactly where it
    * left off. */
  def dedupByTextStream(docs: Dataset[TimedDoc]): Dataset[TimedDoc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(d => org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(d.text),
        org.apache.spark.sql.types.StringType, 42L))
      .flatMapGroupsWithState[Boolean, TimedDoc](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[TimedDoc], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(rows.minBy(_.doc_id))
          }
      }
  }

  /** Run the streaming dedup over a file-source directory with an
    * AvailableNow trigger; returns after the sink is complete. */
  def runDedupStream(spark: SparkSession, inDir: String, outDir: String): Unit = {
    import spark.implicits._
    val schema = org.apache.spark.sql.Encoders.product[TimedDoc].schema
    val in = spark.readStream.schema(schema).parquet(inDir).as[TimedDoc]
    val q: StreamingQuery = dedupByTextStream(in).writeStream
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", s"$outDir/deduped")
      .start()
    q.awaitTermination()
  }
}
