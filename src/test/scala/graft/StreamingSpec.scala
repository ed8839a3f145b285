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
}
