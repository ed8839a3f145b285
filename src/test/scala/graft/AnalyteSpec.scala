package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.Corpus
import graft.extract.AnalyteExtract

/** Generic lab-entity surface (north_star: analyte name, value, unit,
  * reference range, date). The cross-engine hash check lives in the
  * q43/q44 DuckDB oracles (independent Python implementation); these
  * pin the Spark-side semantics directly.
  */
class AnalyteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("TSH is an instance of the generic machinery (delegation is exact)") {
    val raws = Seq(
      "TSH 2,35 mUI/L (0,27 - 4,20)",
      "bruit\nThyréostimuline 1,1 mUI/L 027 - 494\nTSH 2,0",
      "rien", null)
    val df = raws.toDF("raw")
    val viaGeneric = df.select(AnalyteExtract.labelledCandidates(col("raw"),
      graft.extract.TshPatterns.Label, graft.extract.TshPatterns.UnitLabelled)
      .cast("string")).as[String].collect().toSeq
    val viaTsh = df.select(graft.extract.TshExtract.labelledCandidates(col("raw"))
      .cast("string")).as[String].collect().toSeq
    assert(viaGeneric == viaTsh)
  }

  test("fused AnalyteGather == HOF labelled chain, byte-identical per analyte") {
    val ocr = Pipeline.ocrAll(Corpus.generate(spark, 200)).toDF().cache()
    def ents(fused: Boolean) =
      AnalyteExtract.withEntities(ocr, "optimum_raw", "ents", fused = fused)
        .select(col("doc_id"), col("ents").cast("string").as("e"))
        .orderBy("doc_id").as[(String, String)].collect().toSeq
    assert(ents(fused = true) == ents(fused = false))
    // raw candidate arrays too (pre-best), for one analyte config
    val cfg = AnalyteExtract.Glycemia
    val both = ocr.select(
      graft.extract.AnalyteGather.of(col("optimum_raw"), cfg.label, cfg.unit)
        .cast("string").as("f"),
      AnalyteExtract.labelledCandidates(col("optimum_raw"), cfg.label, cfg.unit)
        .cast("string").as("h"))
      .as[(String, String)].collect()
    assert(both.nonEmpty && both.forall { case (f, h) => f == h })
  }

  test("single-pass MultiAnalyteGather == one AnalyteGather per config, byte-identical") {
    val ocr = Pipeline.ocrAll(Corpus.generate(spark, 200)).toDF()
    val cfgs = AnalyteExtract.Secondary
    val multi = ocr.select(graft.extract.MultiAnalyteGather
        .of(col("optimum_raw"), cfgs.map(c => (c.label, c.unit)))
        .cast("string").as("m"))
      .as[String].collect()
    val single = ocr.select(array(cfgs.map(c =>
        graft.extract.AnalyteGather.of(col("optimum_raw"), c.label, c.unit)): _*)
        .cast("string").as("s"))
      .as[String].collect()
    assert(multi.nonEmpty && multi.toSeq == single.toSeq)
    // null raw behaves like the per-analyte path: one empty array per cfg
    val nullRow = Seq(Option.empty[String]).toDF("raw")
      .select(graft.extract.MultiAnalyteGather
        .of(col("raw"), cfgs.map(c => (c.label, c.unit))).cast("string"))
      .as[String].head()
    assert(nullRow == Seq.fill(cfgs.length)("[]").mkString("[", ", ", "]"))
  }

  test("secondary analytes recover the seeded corpus values") {
    val docs = Corpus.generate(spark, 200)
    val ents = AnalyteExtract.withEntities(
        Pipeline.ocrAll(docs).toDF(), "optimum_raw", "ents")
      .select(col("doc_id"), explode_outer(col("ents")).as("e"))
      .filter(col("e").isNotNull)
      .select(col("doc_id"), col("e.analyte"), col("e.value"), col("e.unit"))
      .as[(String, String, Double, String)].collect()
    val byAnalyte = ents.groupBy(_._2).view.mapValues(_.length).toMap
    // all four secondary analytes occur (fillers are seeded templates)
    assert(Set("glycemia", "hemoglobin", "creatinine", "cholesterol")
      .subsetOf(byAnalyte.keySet), s"missing analytes: $byAnalyte")
    // values live in the seeded generator ranges
    ents.foreach {
      case (_, "glycemia", v, u) =>
        assert(v >= 0.70 && v <= 1.29 && u == "g/L", s"glycemia $v $u")
      case (_, "hemoglobin", v, u) =>
        assert(v >= 11.5 && v <= 17.4 && u == "g/dL", s"hemoglobin $v $u")
      case (_, "creatinine", v, u) =>
        assert(v == 75.0 && u == "µmol/L", s"creatinine $v $u")
      case (_, "cholesterol", v, u) =>
        assert(v == 1.9 && u == "g/L", s"cholesterol $v $u")
      case other => fail(s"unexpected analyte row: $other")
    }
  }

  test("report date: ISO from full text, null from the cropped light view") {
    val docs = Corpus.generate(spark, 100)
    val got = Pipeline.ocrAll(docs).toDF()
      .select(col("doc_id"),
        AnalyteExtract.reportDateIso(col("optimum_raw")).as("d"),
        AnalyteExtract.reportDateIso(col("light_raw")).as("ld"))
      .as[(String, Option[String], Option[String])].collect()
    // light/premium crop drops the page header -> no date from light
    assert(got.forall(_._3.isEmpty))
    val withDate = got.filter(_._2.isDefined)
    assert(withDate.length > 50) // media-bearing readable docs carry one
    withDate.foreach { case (id, Some(d), _) =>
      val i = id.stripPrefix("doc").toLong
      val Array(dd, mm, yyyy) = Corpus.reportDate(i).split("/")
      assert(d == s"$yyyy-$mm-$dd", s"$id: $d vs ${Corpus.reportDate(i)}")
    }
  }
}
