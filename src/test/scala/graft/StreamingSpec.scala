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

  test("streaming near-dup: injected dups flagged across micro-batches, state bounded") {
    val dir = Files.createTempDirectory("graft-sneardup").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 50).cache()
    // batch 1: 50 base docs (the keepers)
    docs.write.parquet(s"$dir/in/b1")
    val q = StreamingExtract.nearDupStream(spark, s"$dir/in/*")
      .writeStream.format("memory").queryName("graft_neardup_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      // batch 2: near-dups of docs 0-19 (+100000, ' zz'), re-ingest of
      // keepers 0-4, and a 200-strong identical clone set of doc 0's
      // text (+500000..) that must all resolve against ONE keeper
      val dups = docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" zz")).as("text"))
      val reingest = docs.filter(col("doc_id") < 5)
      val clones = spark.range(200).crossJoin(
          broadcast(docs.filter(col("doc_id") === 0).select(col("text"))))
        .select((col("id") + 500000).as("doc_id"), col("text"))
      dups.unionByName(reingest).unionByName(clones).write.parquet(s"$dir/in/b2")
      q.processAllAvailable()
    } finally q.stop()
    import spark.implicits._
    val pairs = spark.table("graft_neardup_out")
      .select("doc_id", "dup_of", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    val flagged = pairs.map(p => (p._1, p._2)).distinct
    // every injected near-dup resolves against its keeper
    (0L until 20L).foreach { i =>
      assert(flagged.contains((i + 100000, i)), s"missed streaming near-dup $i")
    }
    // every identical clone resolves against doc 0 at estimate 1.0
    val cloneHits = pairs.filter(_._1 >= 500000)
    assert(cloneHits.map(_._1).distinct.size == 200, "missed identical clones")
    cloneHits.foreach { case (id, of, est) =>
      assert(of == 0L && est == 1.0, s"clone $id resolved to ($of, $est)")
    }
    // re-ingested stored keepers never match THEMSELVES (self-matches
    // are dropped; organic sub-1.0 near-dup pairs among the random base
    // docs are legitimate LSH output and allowed)
    assert(!pairs.exists(p => p._1 < 50 && p._3 == 1.0),
      "a re-ingested keeper re-emitted as its own duplicate")
    pairs.foreach(p => assert(p._3 >= 0.5 && p._3 <= 1.0))
  }
}
