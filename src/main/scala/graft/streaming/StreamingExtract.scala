package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Pipeline
import graft.schema.DocRow

/** Structured Streaming wrapper (SURVEY.md §2.8/§2.10: the reference is
  * a synchronous request/response service, so no event-time semantics
  * are required — this is the continuous-ingest form of the same
  * pipeline). Because the whole extraction is a stateless map-side
  * projection (pooled OCR mapPartitions + Catalyst parse, zero
  * shuffles), it lifts to a streaming query unchanged: each micro-batch
  * is extracted exactly like a batch partition, checkpointed by the
  * engine.
  */
object StreamingExtract {

  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", StringType),
    StructField("spans", ArrayType(StructType(Seq(
      StructField("kind", StringType),
      StructField("text", StringType),
      StructField("media_ref", StringType),
      StructField("offset", IntegerType)))))))

  /** File-source streaming extraction: watch `inDir` for doc parquet
    * files, emit (doc_id, spans) per mode.
    */
  def stream(spark: SparkSession, inDir: String, mode: String): DataFrame = {
    import spark.implicits._
    val docs = spark.readStream.schema(docsSchema).parquet(inDir).as[DocRow]
    Pipeline.extract(docs, mode)
  }

  /** Per-minute extraction metrics over a stream — windowed agg +
    * watermark: counts ok / error outcomes per processing-minute window.
    */
  def metrics(spark: SparkSession, inDir: String, mode: String): DataFrame = {
    val out = stream(spark, inDir, mode)
      .withColumn("ok", exists(col("spans"), s => s("kind") === lit("value")))
      .withColumn("ts", current_timestamp())
    out.withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "1 minute"), col("ok"))
      .agg(count(lit(1)).as("n"))
  }

  /** Streaming exact dedup with CUSTOM state (`flatMapGroupsWithState`):
    * first-seen-wins per doc_id ACROSS micro-batches — a re-ingested or
    * re-crawled document is emitted exactly once for the life of the
    * checkpoint. This is the continuous form of `TextOps.dedupExact` a
    * training-data ingest needs; state per key is one boolean, so the
    * state store stays tiny no matter the corpus (at 10^12 docs the
    * keyspace itself is the cost — shard by doc_id hash range, which
    * the groupByKey shuffle already does).
    */
  def dedupStream(spark: SparkSession, inDir: String) = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    spark.readStream.schema(docsSchema).parquet(inDir).as[DocRow]
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState[Boolean, DocRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[DocRow], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); rows.take(1) }
      }
  }
}
