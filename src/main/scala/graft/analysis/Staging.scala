package graft.analysis

import org.apache.spark.sql.DataFrame

/** Materialization seam for the dup-join bases (the exploded
  * (id, features, band, bucket) DataFrames that feed both sides of an
  * LSH self-join). Two encodings of the same barrier:
  *
  *  - `staging = None` (default): `.cache()` — right for jobs that fit
  *    executor storage; the BlockManager entry lives until the caller
  *    releases it (`spark.catalog.clearCache()`, as Bench does).
  *  - `staging = Some(dir)`: write/read a parquet staging table — the
  *    100 TB encoding (mirrors `Pipeline.resultsAutoIterative`'s
  *    `checkpointDir`): nothing rides executor memory, the barrier
  *    survives executor loss, a long-lived session accumulates no
  *    BlockManager storage, and the staged base is independently
  *    inspectable/resumable. Caller owns the directory's lifecycle —
  *    and must pass a DISTINCT dir per invocation: table names under
  *    the dir are fixed per operator ("minhash_base",
  *    "curate_keepers", ...), so two concurrent calls sharing a dir
  *    would overwrite each other's staging tables.
  */
private[analysis] object Staging {

  def materialize(df: DataFrame, staging: Option[String],
      name: String): DataFrame = staging match {
    case Some(dir) =>
      val path = s"$dir/$name"
      df.write.mode("overwrite").parquet(path)
      df.sparkSession.read.parquet(path)
    case None => df.cache()
  }
}
