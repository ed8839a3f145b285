package graft

import org.apache.spark.sql.SparkSession

import graft.corpus.Corpus

/** Driver-run benchmark: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and the flagship extraction pipeline on the
  * synthetic corpus; prints ONE JSON line.
  *
  * Self-evidencing (two rounds of driver artifacts were distorted by
  * the host: round 1 by leaked caches — fixed here by measuring the
  * flagship FIRST in a clean JVM and clearCache per query — round 2 by
  * a CPU-steal burst landing on the extraction timing): the JSON now
  * carries per-trial extraction times AND the /proc/stat steal share
  * observed during each trial, and keeps re-trialing while the trial
  * spread exceeds 2x (the interleaving lesson from ScalingBench). A
  * reader can judge the measurement's health from the artifact alone.
  */
object Bench {

  private def cpuTicks(): (Long, Long) = BenchUtil.cpuTicks()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // scale the extraction-bench corpus to the heap actually available
    // (a bare spark-submit gives the driver 1g; don't GC-thrash there)
    val heapGb = Runtime.getRuntime.maxMemory / (1024.0 * 1024 * 1024)
    val defaultDocs = if (heapGb < 2.5) "10000" else "50000"
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", defaultDocs).toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // absorb session/codegen warmup so the first timing isn't charged it
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    // flagship extraction throughput FIRST, in a still-clean JVM.
    // Trials carry their own steal telemetry; keep trialing while the
    // spread says the host was unstable (best-of over a noisy host
    // needs the healthy sample to exist).
    val docs = Corpus.generate(spark, benchDocs, skew = true,
      partitions = cpus.toInt * 4)
    Pipeline.extractRows(docs, "auto").count() // warm codegen/JIT
    val trials = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    while (trials.size < 3 ||
        (trials.map(_._1).max / trials.map(_._1).min > 2.0 && trials.size < 8)) {
      val (s0, t0) = cpuTicks()
      val sec = time(Pipeline.extractRows(docs, "auto").count())
      val (s1, t1) = cpuTicks()
      val stealPct =
        if (t1 > t0) 100.0 * (s1 - s0) / (t1 - t0) else 0.0
      trials += ((sec, stealPct))
    }
    val extractSec = trials.map(_._1).min
    val docsPerSec = benchDocs / extractSec

    // Query sweep, self-evidencing like the extraction trials (BENCH_r03
    // recorded 22 s for a 2 s query off a single steal-burst sample):
    // every timing carries its /proc/stat steal share, and any query
    // whose time exceeds 3x the session median — or whose trial saw
    // steal — is re-trialed (up to 3 trials, best kept), so no recorded
    // time is a single unwitnessed sample of a degraded host.
    def qTrial(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        name: String): (Double, Double) = {
      val (s0, t0) = cpuTicks()
      val sec = try time(fn(spark, sfDir).count())
      catch { case e: Throwable =>
        // record the failure (-1) but never hide it: a silently-swallowed
        // query error would poison the total and look like a fast query
        System.err.println(s"[bench] $name FAILED: $e")
        -1.0
      }
      val (s1, t1) = cpuTicks()
      // queries that cache (minhash band base, media assets) must not
      // leak BlockManager storage into later timings
      spark.catalog.clearCache()
      (sec, if (t1 > t0) 100.0 * (s1 - s0) / (t1 - t0) else 0.0)
    }
    val firstPass = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      (name, fn, qTrial(fn, name))
    }
    val okTimes = firstPass.map(_._3._1).filter(_ >= 0).sorted
    val median = if (okTimes.isEmpty) 0.0 else okTimes(okTimes.length / 2)
    val evidence = firstPass.map { case (name, fn, first) =>
      val trials = scala.collection.mutable.ArrayBuffer(first)
      def best = trials.map(_._1).filter(_ >= 0).minOption.getOrElse(-1.0)
      def flagged = best > 3 * median || trials.last._2 > 1.0
      // two agreeing trials = the query is genuinely that heavy (a
      // steal burst does not reproduce); disagreeing trials keep going
      def converged = trials.size >= 2 && {
        val ts = trials.map(_._1).filter(_ >= 0).sorted
        ts.size >= 2 && ts(1) <= ts(0) * 1.25
      }
      while (trials.size < 3 && best >= 0 && flagged && !converged) {
        trials += qTrial(fn, name)
      }
      (name, best, trials.toSeq)
    }
    val results = evidence.map { case (name, best, _) => name -> best }

    // audited skew-aware job: per-bucket wall from the audit records —
    // the round-over-round skew-regression signal (BENCH.md table).
    // Fault-isolated like the per-query timings: a failure here must not
    // discard the minutes of measurements already taken (-1 marks it)
    val auditDocs = if (heapGb < 2.5) 5000L else 20000L
    val (wallP50, wallMax) = try {
      val auditDir =
        java.nio.file.Files.createTempDirectory("graft-bench-audit").toString
      val recs = graft.io.ExtractJob.run(spark,
        Corpus.generate(spark, auditDocs, skew = true,
          partitions = cpus.toInt * 4),
        "auto", auditDir, "bench", buckets = 8)
      val walls = recs.map(_.wall_ms).sorted
      // best-effort temp cleanup (bounded size either way)
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(auditDir)).iterator()
          .asScala.toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
      } catch { case _: Exception => }
      if (walls.isEmpty) (0L, 0L) else (walls(walls.length / 2), walls.last)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] audited skew job FAILED: $e")
      (-1L, -1L)
    }

    // Locale.ROOT: a comma-decimal default locale would corrupt the JSON
    def arr(xs: Seq[Double]): String =
      xs.map(x => String.format(java.util.Locale.ROOT, "%.4f",
        java.lang.Double.valueOf(x))).mkString("[", ",", "]")
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // per-query evidence: every trial's (sec, steal_pct) — a reader can
    // judge each recorded best from the artifact alone
    val qev = evidence.map { case (name, _, ts) =>
      "\"" + name + "\":{\"trials\":" + arr(ts.map(_._1)) +
        ",\"steal_pct\":" + arr(ts.map(_._2)) + "}"
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum + extractSec
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""query_median_sec":$median,"query_evidence":$qev,""" +
      s""""extract_docs":$benchDocs,"extract_sec":$extractSec,""" +
      s""""extract_docs_per_sec":$docsPerSec,""" +
      s""""extract_trials":${arr(trials.map(_._1).toSeq)},""" +
      s""""extract_steal_pct":${arr(trials.map(_._2).toSeq)},""" +
      s""""audit_docs":$auditDocs,"audit_buckets":8,""" +
      s""""audit_bucket_wall_p50_ms":$wallP50,"audit_bucket_wall_max_ms":$wallMax,""" +
      s""""cpus":$cpus,"sf":"$sfDir"}"""
    println(json)
    // also drop the bare line next to the repo artifacts: the driver's
    // sbt-wrapped capture prefixes stdout with [info], which has broken
    // its JSON parse before (BENCH_r02.json: "parsed": null)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        "BENCH_LATEST.json")),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Exception => }
    spark.stop()
  }
}
