package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.Corpus
import graft.io.ExtractJob

/** §7.6 checkpoint/resume: kill after k buckets, re-run, assert exact
  * same results table and no duplicate audit rows.
  */
class ResumeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("kill after 3 buckets, resume completes exactly, no dup docs") {
    val docs = Corpus.generate(spark, 300).cache()
    val out = Files.createTempDirectory("graft-resume").toString
    val crashed = intercept[RuntimeException] {
      ExtractJob.run(spark, docs, "auto", out, "r1", buckets = 8,
        failAfterBuckets = 3)
    }
    assert(crashed.getMessage.contains("injected failure"))
    assert(ExtractJob.committedBuckets(out, "r1").size == 3)

    // resume: processes exactly the 5 remaining buckets
    val resumed = ExtractJob.run(spark, docs, "auto", out, "r1", buckets = 8)
    assert(resumed.size == 5)
    assert(ExtractJob.committedBuckets(out, "r1") == (0 until 8).toSet)

    // second resume is a no-op (0 already-committed partitions reprocessed)
    assert(ExtractJob.run(spark, docs, "auto", out, "r1", buckets = 8).isEmpty)

    // combined results == single-pass pipeline output, no dups
    val got = ExtractJob.readResults(spark, out)
    assert(got.count() == 300)
    assert(got.select("doc_id").distinct().count() == 300)
    val direct = Pipeline.extract(docs, "auto")
    assert(got.select("doc_id", "spans").except(direct).count() == 0)
    assert(direct.except(got.select("doc_id", "spans")).count() == 0)

    // audit metrics add up
    val audit = ExtractJob.readAudit(out, "r1")
    assert(audit.size == 8)
    assert(audit.map(_.n_docs).sum == 300)
    assert(audit.map(_.n_ok).sum +
      audit.map(_.n_ocr_failed).sum + audit.map(_.n_not_found).sum == 300)
  }

  test("audit records round-trip through real JSON (hostile run_id survives)") {
    val io = new graft.io.FormatTableIO("parquet")
    val out = Files.createTempDirectory("graft-audit-rt").toString
    // strings a regex-based parser chokes on: quotes, backslashes,
    // newlines, braces — must round-trip byte-identically (run_id also
    // names the audit directory, so it stays within path-legal bytes)
    val hostile = Seq(
      """r"1" with \"escaped\" quotes""",
      "line\nbreak\tand\ttabs",
      """back\slash & {"json": "lookalike"}""")
    hostile.zipWithIndex.foreach { case (runId, i) =>
      val rec = ExtractJob.AuditRecord(runId, i, 10L + i, 7L, 2L, 1L,
        1234L, 1755360000000L + i)
      io.commitAudit(out, rec)
      val back = io.readAudit(out, runId)
      assert(back == Seq(rec), s"round-trip mismatch for run_id <$runId>: $back")
      assert(io.committedBuckets(out, runId) == Set(i))
    }
  }

  test("job through an explicit TableIO seam, skewed corpus, skew-aware path") {
    val io = new graft.io.FormatTableIO("parquet")
    // skew=true plants ~1% oversized multi-page docs; threshold 16 routes
    // them through the page-explode path inside the audited job
    val docs = Corpus.generate(spark, 400, skew = true).cache()
    val out = Files.createTempDirectory("graft-seam").toString
    val recs = ExtractJob.run(spark, docs, "auto", out, "r1", buckets = 4,
      skewThreshold = 16, io = io)
    assert(recs.size == 4)
    assert(ExtractJob.committedBuckets(out, "r1", io) == (0 until 4).toSet)
    val got = ExtractJob.readResults(spark, out, io)
    assert(got.count() == 400)
    // skew-aware job output == plain map-only extract, byte-identical
    val direct = Pipeline.extract(docs, "auto")
    assert(got.select("doc_id", "spans").except(direct).count() == 0)
    assert(direct.except(got.select("doc_id", "spans")).count() == 0)
    assert(ExtractJob.readAudit(out, "r1", io).map(_.n_docs).sum == 400)
  }
}
