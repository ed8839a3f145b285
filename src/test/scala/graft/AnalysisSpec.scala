package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.{TextOps, VectorOps}

/** Semantic checks for the training-data ops (beyond the DuckDB oracle
  * queries): MinHash-LSH recall on injected near-dups, ANN consistency
  * vs brute force, SimHash locality, known-value Jaccard, exact dedup.
  */
class AnalysisSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val docsPath = "/root/testdata/sf0.001"
  lazy val documents = spark.read.parquet(s"$docsPath/documents.parquet").cache()

  test("minhash LSH finds every injected near-duplicate (recall 1.0 at j~0.95)") {
    val base = documents.select(col("doc_id"), col("text")).filter(col("doc_id") < 100)
    val dups = base.select((col("doc_id") + 100000).as("doc_id"),
      concat(col("text"), lit(" zz")).as("text"))
    val pairs = TextOps.minhashDupPairs(base.unionByName(dups),
      col("doc_id"), col("text"), n = 3, m = 16, bands = 4, minJaccard = 0.8)
      .as[(Long, Long, Double)].collect()
    val found = pairs.map(p => (p._1, p._2)).toSet
    (0L until 100L).foreach { i =>
      assert(found.contains((i, i + 100000)), s"missed injected dup $i")
    }
    pairs.foreach(p => assert(p._3 >= 0.8 && p._3 <= 1.0))
  }

  test("n-gram jaccard known values") {
    val df = Seq(
      ("the quick brown fox", "the quick brown fox"), // identical -> 1.0
      ("a b c d", "x y z w"),                         // disjoint  -> 0.0
      ("a b c d", "a b c e")                          // 2-grams: {ab,bc,cd} vs {ab,bc,ce} -> 2/4
    ).toDF("ta", "tb")
    val got = df.select(TextOps.jaccard(
      TextOps.shingles(col("ta"), 2), TextOps.shingles(col("tb"), 2)))
      .as[Double].collect().toSeq
    assert(got == Seq(1.0, 0.0, 0.5))
  }

  test("simhash is local: near-identical docs have small hamming distance") {
    val df = documents.filter(col("doc_id") < 50)
      .select(col("doc_id"), TextOps.simhash(col("text")).as("h1"),
        TextOps.simhash(concat(col("text"), lit(" zz"))).as("h2"),
        TextOps.simhash(reverse(col("text"))).as("h3"))
      .select(TextOps.hamming(col("h1"), col("h2")).as("near"),
        TextOps.hamming(col("h1"), col("h3")).as("far"))
      .agg(avg("near"), avg("far")).as[(Double, Double)].head()
    assert(df._1 < 8, s"near-dup hamming too high: ${df._1}")
    assert(df._2 > df._1, s"unrelated not farther: $df")
  }

  test("exact dedup keeps one row per key with deterministic keeper") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "k")
    val kept = TextOps.dedupExact(df, col("k"), col("id"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L))
  }

  test("ANN: cos scores agree with brute force; recall@3 is non-vacuous") {
    val emb = spark.read.parquet(s"$docsPath/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("embedding"))
      .cache()
    val q = emb.filter(col("vec_id") < 10)
    val bf = VectorOps.bruteForceTopK(q, emb, 3)
      .select("query_id", "neighbor_id", "cos")
      .as[(Long, Long, Double)].collect()
    val ann = VectorOps.annTopK(q, emb, 3)
      .select("query_id", "neighbor_id", "cos")
      .as[(Long, Long, Double)].collect()
    val bfCos = bf.map(r => (r._1, r._2) -> r._3).toMap
    // any pair ANN scores must carry the exact brute-force cosine
    val annOverlap = ann.filter(r => bfCos.contains((r._1, r._2)))
    annOverlap.foreach(r => assert(math.abs(bfCos((r._1, r._2)) - r._3) < 1e-12))
    val recall = annOverlap.length.toDouble / bf.length
    info(f"ANN recall@3 vs brute force: $recall%.2f (4 planes x 8 tables, random 64-dim)")
    assert(ann.nonEmpty && recall >= 0.4,
      s"multi-table LSH recall too low: $recall")
  }
}
