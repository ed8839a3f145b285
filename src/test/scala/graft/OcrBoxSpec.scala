package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.Corpus
import graft.media.{OcrRun, SimulatedOcr}
import graft.schema.OcrBox

/** O2: OCR token boxes (`ocr_engine.py:88-97`) are carried as
  * array<struct> through the pipeline schema — real content for the
  * audit/QC surface — while the parser (quirk Q1) never reads them.
  */
class OcrBoxSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("ocrAll carries full box structs matching the engine's output") {
    val docs = Corpus.generate(spark, 64)
    val got = Pipeline.ocrAll(docs)
      .select(col("doc_id"), col("premium_boxes"), col("optimum_boxes"))
      .as[(String, Seq[OcrBox], Seq[OcrBox])]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    // independent recomputation straight from the engine, per doc
    val expected = docs.collect().map { d =>
      d.doc_id -> (OcrRun.ocrDoc(SimulatedOcr, "premium", d.spans).boxes,
        OcrRun.ocrDoc(SimulatedOcr, "optimum", d.spans).boxes)
    }.toMap
    assert(got == expected)
    // non-vacuous: some doc actually has boxes with real fields
    val some = got.values.flatMap(_._1).headOption
    assert(some.exists(b => b.text.nonEmpty && b.width > 0 && b.conf >= 50.0))
  }

  test("Q1: the parse plan never reads box columns (pruned before OCR output)") {
    val docs = Corpus.generate(spark, 16)
    val plan = Pipeline.results(docs, "auto").queryExecution.optimizedPlan.toString
    assert(!plan.contains("premium_boxes") && !plan.contains("optimum_boxes"),
      "box columns leaked into the parse plan — ObjectSerializerPruning regressed")
  }

  test("both-empty failure rule is driven by boxes, not a stale count") {
    // blank text + nonempty boxes => premium/optimum level does NOT fail
    val box = OcrBox("x", 0, 0, 8, 14, 90.0)
    assert(OcrRun.levelResult("premium", "  ", Seq(box)).rawText.contains("  "))
    assert(OcrRun.levelResult("premium", "  ", Seq.empty).rawText.isEmpty)
    assert(OcrRun.levelResult("light", "  ", Seq(box)).rawText.isEmpty)
  }
}
