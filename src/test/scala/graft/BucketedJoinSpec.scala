package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.Corpus

/** Bucketing for co-located joins (round brief: "repartition()/bucketing
  * for co-located joins"): when the extraction results and a per-doc
  * metadata table are both bucketed+sorted on doc_id, their join needs
  * ZERO Exchange — at 100 TB this is the difference between a free join
  * and shuffling the whole results table.
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("doc_id-bucketed results join doc_id-bucketed metadata with zero Exchange") {
    val docs = Corpus.generate(spark, 300)

    Pipeline.extract(docs, "auto")
      .write.mode("overwrite")
      .bucketBy(8, "doc_id").sortBy("doc_id")
      .saveAsTable("g_results_bkt")
    docs.toDF().select(col("doc_id"), size(col("spans")).as("n_spans"))
      .write.mode("overwrite")
      .bucketBy(8, "doc_id").sortBy("doc_id")
      .saveAsTable("g_meta_bkt")

    val joined = spark.table("g_results_bkt")
      .join(spark.table("g_meta_bkt"), "doc_id")
    // disable broadcast so the co-location (not a broadcast) is what
    // makes the plan exchange-free — the situation at 100 TB where
    // neither side fits a broadcast
    val plan = withNoBroadcast {
      joined.queryExecution.executedPlan.toString
    }
    assert(!plan.contains("Exchange"),
      s"bucketed join should be exchange-free, got:\n${plan.take(2000)}")
    assert(joined.count() == 300)
  }

  private def withNoBroadcast[A](f: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try f finally spark.conf.set(key, old)
  }
}
