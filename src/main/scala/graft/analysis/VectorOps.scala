package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float/double>).
  * Dot products / norms are expression-only (`zip_with` + `aggregate`
  * HOFs). Two physical strategies:
  *  - brute-force top-k: broadcast the (small) query set against the
  *    corpus — a map-side cross product + per-query window top-k;
  *  - LSH-bucketed ANN (the 100 TB scale path): sign-of-random-
  *    hyperplane bucket per vector, co-partitioned bucket join, then
  *    exact rerank inside buckets. Hyperplanes are deterministic
  *    pseudo-random ±1 vectors derived from xxhash64(plane, dim), so no
  *    state is shipped and any executor can recompute them.
  */
object VectorOps {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0, dot(a, b) / d).otherwise(0.0)
  }

  /** Brute-force cosine top-k: every query scored against every corpus
    * vector. `queries` must be small (it is broadcast); the corpus side
    * streams map-side, then one per-query window picks the top k.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      qId: String = "vec_id", qVec: String = "embedding",
      cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val q = queries.select(col(qId).as("query_id"), col(qVec).as("q_vec"))
    val c = corpus.select(col(cId).as("neighbor_id"), col(cVec).as("c_vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** Deterministic pseudo-random ±1 hyperplane component for
    * (plane, dim) — recomputable anywhere, nothing to broadcast.
    */
  private def planeComponent(p: Column, d: Column): Column =
    when(pmod(xxhash64(p, d), lit(2)) === 0, 1.0d).otherwise(-1.0d)

  /** Sign-LSH bucket id from `nPlanes` hyperplanes (expression-only).
    * `table` offsets the plane seeds so multiple independent hash
    * tables can be derived from the same formula.
    */
  def lshBucket(vec: Column, nPlanes: Int = 8, table: Int = 0): Column = {
    val bits = (0 until nPlanes).map { p =>
      val planeId = table * nPlanes + p
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, d) => x * planeComponent(lit(planeId), d)),
        lit(0.0d), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Multi-table band keys: array of (table, bucket) structs. */
  private def lshKeys(vec: Column, nPlanes: Int, tables: Int): Column =
    array((0 until tables).map(t =>
      struct(lit(t).as("table"), lshBucket(vec, nPlanes, t).as("bucket"))): _*)

  /** ANN top-k via multi-table sign-LSH: a candidate pair only needs to
    * collide in ONE of `tables` independent k-plane tables (the
    * standard LSH recall amplifier: recall ~= 1-(1-p^k)^L), then exact
    * cosine rerank. The bucket join is co-partitioned and local — the
    * scale path when the corpus no longer fits a broadcast/cross.
    * Defaults (4 planes x 8 tables) give ~0.7 recall@3 even on
    * uniformly random vectors, much higher on clustered real data.
    */
  def annTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nPlanes: Int = 4, tables: Int = 8): DataFrame = {
    def keyed(df: DataFrame, idAs: String, vecAs: String): DataFrame =
      df.select(col("vec_id").as(idAs), col("embedding").as(vecAs))
        // explode_outer: never-empty array + avoids the inferred-filter
        // re-inline trap (see Pipeline.extractRows)
        .withColumn("bk", explode_outer(lshKeys(col(vecAs), nPlanes, tables)))
        .select(col(idAs), col(vecAs), col("bk.table"), col("bk.bucket"))
    val q = keyed(queries, "query_id", "q_vec")
    val c = keyed(corpus, "neighbor_id", "c_vec")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.join(c, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("q_vec"), col("c_vec")))
      // a pair colliding in several tables appears several times: dedupe
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(first(col("cos")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }
}
