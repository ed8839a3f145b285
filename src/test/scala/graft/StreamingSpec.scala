package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.Corpus
import graft.streaming.StreamingExtract

/** The stateless map-only pipeline lifted to Structured Streaming:
  * batch output == streaming output over the same files.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("streaming extraction over a file source equals batch extraction") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val docs = Corpus.generate(spark, 100)
    docs.write.mode("overwrite").parquet(s"$dir/in")

    val q = StreamingExtract.stream(spark, s"$dir/in", "auto")
      .writeStream.format("memory").queryName("graft_stream_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("graft_stream_out")
      .orderBy("doc_id").as[(String, Seq[graft.schema.OutSpan])].collect().toSeq
    val batch = Pipeline.extract(docs, "auto")
      .orderBy("doc_id").as[(String, Seq[graft.schema.OutSpan])].collect().toSeq
    assert(streamed == batch)
    assert(streamed.size == 100)
  }

  test("stateful streaming dedup: first-seen-wins per doc_id across micro-batches") {
    val dir = Files.createTempDirectory("graft-sdedup").toString
    // batch 1: docs 0-59; batch 2 (arrives later): docs 40-99 — 40-59 are re-ingests
    Corpus.generate(spark, 60).write.parquet(s"$dir/in/b1")
    val q = StreamingExtract.dedupStream(spark, s"$dir/in/*")
      .writeStream.format("memory").queryName("graft_dedup_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      import spark.implicits._
      Corpus.generate(spark, 100).filter(col("doc_id") >= "doc00000040")
        .write.parquet(s"$dir/in/b2")
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("graft_dedup_out")
      .select("doc_id").as[String].collect().toSeq
    assert(ids.size == 100, s"expected 100 unique, got ${ids.size}")
    assert(ids.distinct.size == 100)
  }
}
