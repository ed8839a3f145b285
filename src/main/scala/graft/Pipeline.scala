package graft

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.extract.{SpanAssembly, TshExtract}
import graft.media.{OcrEnginePool, OcrRun}
import graft.schema._

/** End-to-end extraction pipeline (SURVEY.md §3.4):
  *
  *   docs scan -> mapPartitions(pooled OCR engine) -> UDF-free Catalyst
  *   parse/select/assemble projection -> spans
  *
  * The whole thing is map-only: candidates never leave their row (array
  * HOFs instead of explode+window), the fallback gate is a row-local
  * conditional instead of an anti-join, and the auto cascade is either a
  * per-row `when` chain (columnar) or a filter-carry union (iterative) —
  * zero shuffles either way, so throughput scales with partition count
  * alone (the ≥0.8 N->4N efficiency target, BASELINE.md). The only
  * shuffle in the module is the opt-in skew path's bounded reassembly.
  *
  * Expression-tree hygiene: every doc-level intermediate (candidate
  * array, best candidate, level result) is materialized as a named
  * column, so downstream references are attribute leaves instead of
  * re-inlined subtrees (CollapseProject keeps multi-referenced non-cheap
  * aliases in their own projection, so this survives optimization).
  */
object Pipeline {

  val Modes = Seq("auto", "light", "premium", "optimum")
  private val Levels = Seq("light", "premium", "optimum")

  /** Reject unknown modes up front, like the reference's `Literal` mode
    * enum (`app.py:108`) — an unvalidated string would otherwise run as
    * a phantom OCR level and quietly produce TSH_NOT_FOUND everywhere.
    */
  private def requireMode(mode: String): Unit =
    require(Modes.contains(mode),
      s"unknown mode '$mode' (expected one of ${Modes.mkString(", ")})")

  /** raw-text column named `rawCol` -> level-result struct column `out`
    * = (ok, value, unit, ref_min, ref_max, confidence, error, raw_text).
    * `reuse = Some((otherRaw, otherOut))` short-circuits the parse when
    * this level's raw text is identical to an already-parsed level's
    * (typical for premium vs optimum: they differ only for docs the
    * binarization rescue actually changes), paying one string compare
    * instead of a reparse. Helper columns (`_lab`, `_cands`, `_best`)
    * are left in place for downstream reuse; callers project them away.
    */
  /** Candidate-gather strategy: the fused native Expression
    * (TshGatherCandidates, one compiled pass per doc) is the default;
    * the pure-HOF expression chain (TshExtract.*Candidates) remains
    * selectable per-call via `fused` (a parameter, not a JVM global —
    * concurrently-running suites must not observe each other's plan
    * encoding) — the golden suite validates both and a property test
    * asserts their equality.
    */
  def withLevelResult(df: DataFrame, rawCol: String, out: String,
      reuse: Option[(String, String)] = None,
      skipWhen: Option[Column] = None,
      fused: Boolean = true): DataFrame = {
    def freshCands(d: DataFrame): (DataFrame, Column) =
      if (fused)
        (d, graft.extract.TshGatherCandidates.gather(col(rawCol)))
      else {
        val d1 = d.withColumn(s"${out}_lab",
          TshExtract.labelledCandidates(col(rawCol)))
        (d1, TshExtract.gatherCandidates(col(rawCol), col(s"${out}_lab")))
      }
    val nullCands = lit(null).cast(graft.extract.TshGatherCandidates.schema)
    val staged = reuse match {
      case Some((rRaw, rOut)) =>
        val eq = col(rawCol) <=> col(rRaw)
        val (d1, cands) = freshCands(df)
        val gated = when(eq, col(s"${rOut}_cands")).otherwise(cands)
        // CASE branches evaluate lazily: a doc already accepted by an
        // earlier cascade level never pays this level's parse — the
        // reference's early-exit cost model (`app.py:153-163`) without
        // the iterative form's persist/union machinery
        d1.withColumn(s"${out}_cands",
          skipWhen.map(s => when(s, nullCands).otherwise(gated)).getOrElse(gated))
      case None =>
        val (d1, cands) = freshCands(df)
        d1.withColumn(s"${out}_cands",
          skipWhen.map(s => when(s, nullCands).otherwise(cands)).getOrElse(cands))
    }
    staged
      .withColumn(s"${out}_best", TshExtract.best(col(s"${out}_cands")))
      .withColumn(out, TshExtract.levelResult(col(rawCol), col(s"${out}_best")))
  }

  /** OCR all three levels per doc in one pooled-engine pass (columnar
    * cascade input). One mapPartitions = one engine checkout per task.
    */
  def ocrAll(docs: Dataset[DocRow]): Dataset[DocOcrAll] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { it =>
      val eng = OcrEnginePool.engine
      it.map { d =>
        val l = OcrRun.ocrDoc(eng, "light", d.spans)
        val p = OcrRun.ocrDoc(eng, "premium", d.spans)
        val o = OcrRun.ocrDoc(eng, "optimum", d.spans)
        DocOcrAll(d.doc_id, OcrRun.firstMediaRef(d.spans),
          l.rawText, p.rawText, p.boxes, o.rawText, o.boxes)
      }
    }
  }

  /** OCR a single level (explicit modes / iterative cascade stages).
    * Carries the original spans so later cascade stages need no join
    * back to the source (filter-carry instead of the anti-join form,
    * SURVEY.md §2.4.1).
    */
  def ocrLevel(docs: Dataset[DocRow], level: String): Dataset[DocOcrOne] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { it =>
      val eng = OcrEnginePool.engine
      it.map { d =>
        val r = OcrRun.ocrDoc(eng, level, d.spans)
        DocOcrOne(d.doc_id, OcrRun.firstMediaRef(d.spans), r.rawText, r.boxes, d.spans)
      }
    }
  }

  /** (doc_id, first_media_ref, result struct `r`) for one explicit mode
    * or the columnar auto cascade.
    */
  /** All three level results staged as columns r_l / r_p / r_o; each
    * later level's parse is skipped per-row once an earlier level is
    * accepted (the skipped column degrades to a cheap placeholder the
    * cascade never reads).
    */
  private def autoStaged(docs: Dataset[DocRow],
      fused: Boolean = true): DataFrame = {
    val d1 = withLevelResult(ocrAll(docs).toDF(), "light_raw", "r_l",
      fused = fused)
    val accL = TshExtract.acceptWithRange(col("r_l"))
    val d2 = withLevelResult(d1, "premium_raw", "r_p",
      reuse = Some(("light_raw", "r_l")), skipWhen = Some(accL), fused = fused)
    val accP = TshExtract.acceptWithRange(col("r_p"))
    withLevelResult(d2, "optimum_raw", "r_o",
      reuse = Some(("premium_raw", "r_p")), skipWhen = Some(accL || accP),
      fused = fused)
  }

  /** Audit metric: which cascade level resolves each doc (`app.py`
    * acceptance order) — the realized level mix of auto mode.
    */
  def levelMix(docs: Dataset[DocRow]): DataFrame =
    autoStaged(docs)
      .withColumn("resolved_level",
        when(TshExtract.acceptWithRange(col("r_l")), "light")
          .when(TshExtract.acceptWithRange(col("r_p")), "premium")
          .when(col("r_o")("ok"), "optimum")
          .otherwise("failed"))
      .groupBy("resolved_level").agg(count(lit(1)).as("n_docs"))

  def results(docs: Dataset[DocRow], mode: String,
      fused: Boolean = true): DataFrame = {
    requireMode(mode)
    mode match {
      case "auto" =>
        autoStaged(docs, fused)
          .withColumn("r",
            TshExtract.cascadeAuto(col("r_l"), col("r_p"), col("r_o")))
          .select("doc_id", "first_media_ref", "r")
      case level =>
        withLevelResult(ocrLevel(docs, level).toDF(), "raw", "r", fused = fused)
          .select("doc_id", "first_media_ref", "r")
    }
  }

  /** Iterative auto cascade (SURVEY.md §2.4.1 option 2): run each level
    * only over still-pending docs — matches the reference's lazy
    * early-exit cost model (`app.py:153-189`), the right choice when OCR
    * dominates. Join-free: pending rows carry their spans forward, so
    * each stage is filter + map. Persisting the stage outputs bounds the
    * recomputation the two downstream consumers (accepted / pending)
    * would otherwise trigger.
    */
  /** `checkpointDir`: when set, each stage output is written to (and
    * read back from) a parquet table instead of `persist()` — the
    * 100 TB encoding, where a stage output no longer fits executor
    * storage and the lineage cut must survive executor loss; the
    * MEMORY_AND_DISK persist is the single-job default. Same plan
    * downstream either way (a test pins span equality).
    */
  def resultsAutoIterative(docs: Dataset[DocRow], persist: Boolean = true,
      checkpointDir: Option[String] = None): DataFrame = {
    import docs.sparkSession.implicits._
    val lvl = StorageLevel.MEMORY_AND_DISK

    def stage(in: Dataset[DocRow], level: String): DataFrame = {
      val s = withLevelResult(ocrLevel(in, level).toDF(), "raw", "r")
        .select(col("doc_id"), col("first_media_ref"), col("spans"), col("r"))
      checkpointDir match {
        case Some(dir) =>
          s.write.mode("overwrite").parquet(s"$dir/stage_$level")
          docs.sparkSession.read.parquet(s"$dir/stage_$level")
        case None => if (persist) s.persist(lvl) else s
      }
    }
    val s1 = stage(docs, "light")
    val pend1 = s1.filter(!TshExtract.acceptWithRange(col("r")))
      .select(col("doc_id"), col("spans")).as[DocRow]
    val s2 = stage(pend1, "premium")
    val pend2 = s2.filter(!TshExtract.acceptWithRange(col("r")))
      .select(col("doc_id"), col("spans")).as[DocRow]
    // optimum: accepted if parsed at all; otherwise the failure row keeps
    // optimum's error/raw_text (`app.py:179-196`)
    val o = col("r")
    val s3 = withLevelResult(ocrLevel(pend2, "optimum").toDF(), "raw", "r")
      .select(col("doc_id"), col("first_media_ref"),
        when(o("ok"), o).otherwise(
          struct(lit(false).as("ok"),
            lit(null).cast("double").as("value"), lit(null).cast("string").as("unit"),
            lit(null).cast("double").as("ref_min"), lit(null).cast("double").as("ref_max"),
            lit(null).cast("string").as("confidence"),
            coalesce(o("error"), lit("TSH_NOT_FOUND")).as("error"),
            o("raw_text").as("raw_text"))).as("r"))

    val sel = Seq("doc_id", "first_media_ref", "r").map(col)
    s1.filter(TshExtract.acceptWithRange(col("r"))).select(sel: _*)
      .unionByName(s2.filter(TshExtract.acceptWithRange(col("r"))).select(sel: _*))
      .unionByName(s3.select(sel: _*))
  }

  /** Final output: (doc_id, spans array<struct<kind,text,media_ref,order>>). */
  def extract(docs: Dataset[DocRow], mode: String,
      iterative: Boolean = false, fused: Boolean = true): DataFrame = {
    val res =
      if (mode == "auto" && iterative) resultsAutoIterative(docs)
      else results(docs, mode, fused)
    res.select(col("doc_id"),
      SpanAssembly.assemble(col("r"), col("first_media_ref")).as("spans"))
  }

  /** Exploded row-per-span form: (doc_id, kind, text, media_ref, order).
    * explode_outer, not explode: the span array is never empty (a marker
    * span is always emitted), and plain explode makes the optimizer
    * infer a `size(spans) > 0` Filter (InferFiltersFromGenerate) that,
    * once pushed below the projection chain, re-inlines the whole
    * assembly expression tree — a ~500k-node filter evaluated per row.
    */
  def extractRows(docs: Dataset[DocRow], mode: String,
      iterative: Boolean = false, fused: Boolean = true): DataFrame =
    extract(docs, mode, iterative, fused)
      .select(col("doc_id"), explode_outer(col("spans")).as("s"))
      .select(col("doc_id"), col("s.kind"), col("s.text"),
        col("s.media_ref"), col("s.order"))

  /** Skew-aware variant (SURVEY.md §4.8): docs whose media-span count
    * exceeds `threshold` (oversized multi-page PDFs) have their spans
    * exploded to rows, hashed across the cluster, OCR'd per page, and
    * re-assembled with one bounded groupBy — so one monster doc cannot
    * pin a task. Normal docs take the map-only path; results are
    * unioned. Only the requested mode's levels are OCR'd: an explicit
    * `light` run pays ONE ocrPage call per heavy-doc page, not three
    * (auto computes all three for its columnar cascade).
    */
  def extractSkewAware(docs: Dataset[DocRow], mode: String,
      threshold: Int = 16): DataFrame = {
    requireMode(mode)
    import docs.sparkSession.implicits._
    val spark = docs.sparkSession
    val neededLevels = if (mode == "auto") Levels else Seq(mode)
    val withCount = docs
      .withColumn("n_media", size(filter(col("spans"), s => s("kind") === lit("media"))))
    val normal = withCount.filter(col("n_media") <= threshold)
      .select(col("doc_id"), col("spans")).as[DocRow]
    val heavy = withCount.filter(col("n_media") > threshold)
      .select(col("doc_id"), col("spans")).as[DocRow]

    // one row per (doc, span), spread by (doc_id, offset)
    val perSpan = heavy.flatMap(d => d.spans.map(s =>
        (d.doc_id, s.offset, s.kind, s.media_ref, s.text)))
      .toDF("doc_id", "offset", "kind", "media_ref", "text")
      .repartition(spark.sessionState.conf.numShufflePartitions,
        col("doc_id"), col("offset"))
    val ocrd = perSpan.as[(String, Int, String, String, String)].mapPartitions { it =>
      val eng = OcrEnginePool.engine
      it.map { case (docId, off, kind, ref, text) =>
        val (texts, boxes) =
          if (kind == "media") {
            val rs = neededLevels.map(lv => eng.ocrPage(lv, ref))
            (rs.map(_._1), rs.map(_._2.length))
          } else (neededLevels.map(_ => text), neededLevels.map(_ => 0))
        (docId, off, kind, ref, texts, boxes)
      }
    }.toDF("doc_id", "offset", "kind", "media_ref", "texts", "n_boxes")

    // the one (bounded, balanced) shuffle: reassemble per-doc raw texts
    val assembled = ocrd.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("offset"), col("kind"),
        col("media_ref"), col("texts"), col("n_boxes")))).as("parts"))
      .as[(String, Seq[(Int, String, String, Seq[String], Seq[Int])])]
      .map { case (docId, parts) =>
        val firstRef = parts.collectFirst { case p if p._2 == "media" => p._3 }
          .getOrElse("")
        // heavy docs reassemble box COUNTS only (the failure rule's
        // requirement) — shuffling a 200-page doc's full box structs
        // would defeat the bounded-shuffle point; box content for QC is
        // available via ocrAll on the doc in question
        val raws = neededLevels.zipWithIndex.map { case (lv, li) =>
          val raw = parts.map(_._4(li)).mkString("\n")
          val nb = parts.map(_._5(li)).sum
          if (OcrRun.isFailed(lv, raw, nb)) null else raw
        }
        (docId, firstRef, raws)
      }.toDF("doc_id", "first_media_ref", "raws")
      .select(col("doc_id") +: col("first_media_ref") +:
        neededLevels.zipWithIndex.map { case (lv, li) =>
          col("raws")(li).as(s"${lv}_raw")
        }: _*)

    val heavyRes = mode match {
      case "auto" =>
        val d1 = withLevelResult(assembled, "light_raw", "r_l")
        val accL = TshExtract.acceptWithRange(col("r_l"))
        val d2 = withLevelResult(d1, "premium_raw", "r_p",
          reuse = Some(("light_raw", "r_l")), skipWhen = Some(accL))
        val accP = TshExtract.acceptWithRange(col("r_p"))
        val d3 = withLevelResult(d2, "optimum_raw", "r_o",
          reuse = Some(("premium_raw", "r_p")), skipWhen = Some(accL || accP))
        d3.withColumn("r",
          TshExtract.cascadeAuto(col("r_l"), col("r_p"), col("r_o")))
      case lv =>
        withLevelResult(assembled, s"${lv}_raw", "r")
    }
    val heavyOut = heavyRes.select(col("doc_id"),
      SpanAssembly.assemble(col("r"), col("first_media_ref")).as("spans"))
    extract(normal, mode).unionByName(heavyOut)
  }
}
