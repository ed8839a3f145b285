package graft.media

import graft.corpus.Corpus
import graft.schema.{LevelOcr, OcrBox}

/** Boundary to the opaque media/OCR stack (reference `ocr_engine.py`).
  *
  * A real deployment binds a Tesseract (or ML OCR) engine here; this
  * sandbox has no media libraries, so the production impl is represented
  * by [[SimulatedOcr]] — a deterministic pure function of
  * (level, media_ref) per FIXTURES.md §3. The Spark-side plumbing
  * (pooling, mapPartitions batching, failure semantics) is identical for
  * both and is what the pipeline tests exercise.
  */
trait OcrEngine extends Serializable {
  /** OCR one media payload at one level. Returns (raw page text, boxes).
    * Never throws: the reference degrades per step
    * (`ocr_engine.py:127-132,171-177,182-195,243-246`) and only the
    * caller decides whether an empty result means level failure.
    */
  def ocrPage(level: String, mediaRef: String): (String, Seq[OcrBox])
}

/** Deterministic stand-in for the Tesseract stack (FIXTURES.md §3).
  *
  * Per level (mirroring `ocr_engine.py`):
  *  - light   (`ocr_engine.py:108-146`): `preprocess_for_bio` bottom-65%
  *    crop analog (`ocr_engine.py:39`), text only, no boxes;
  *  - premium (`ocr_engine.py:153-201`): SAME `preprocess_for_bio` crop
  *    (`ocr_engine.py:171-177` calls it too — premium is light + boxes
  *    + the weaker both-empty failure rule, NOT a wider view), one box
  *    per whitespace token;
  *  - optimum (`ocr_engine.py:208-270`): full page (no crop — it
  *    upscales + binarizes instead); binarization-rescue analog sees
  *    the lines the `hard` tag hides from light/premium; for the Q2
  *    family the binarization instead corrupts the TSH digits.
  */
object SimulatedOcr extends OcrEngine {
  override def ocrPage(level: String, mediaRef: String): (String, Seq[OcrBox]) = {
    // never-throws contract: a ref this engine can't resolve behaves
    // like the reference's image-load failure (`ocr_engine.py:119-124`
    // returns None -> empty result), not a task failure — one malformed
    // row must not kill a 10^12-doc job
    val parsed =
      try Some(Corpus.parseMediaRef(mediaRef))
      catch { case _: RuntimeException => None }
    if (parsed.isEmpty) return ("", Seq.empty)
    val (i, k, carrier) = parsed.get
    val full = Corpus.pageLines(i, k, level, carrier)
    val lines = if (level == "optimum") full else Corpus.crop(full)
    val text = lines.mkString("\n")
    val boxes =
      if (level == "light") Seq.empty
      else {
        var left = 0
        text.split("\\s+").filter(_.nonEmpty).toSeq.map { tok =>
          val w = 8 * tok.length
          val b = OcrBox(tok, left, (graft.corpus.Det.h(mediaRef, tok, "top") % 900).toInt,
            w, 14, 50.0 + (graft.corpus.Det.h(mediaRef, tok, "conf") % 50).toInt)
          left += w + 8
          b
        }
      }
    (text, boxes)
  }
}

/** Per-executor engine pool (north_star: "mapPartitions over a pooled
  * parser/OCR model per executor to amortize init"). The engine handle
  * is a lazy JVM-wide singleton so every task on an executor reuses one
  * initialized engine instead of paying per-row init (the reference
  * spawns 1-5 tesseract subprocesses per document, SURVEY.md §3.1-3.2 —
  * this pool is the amortization replacing that).
  */
object OcrEnginePool {
  @volatile private var factory: () => OcrEngine = () => SimulatedOcr
  @volatile private var cached: OcrEngine = null

  /** One engine instance per executor JVM (built on first use, reused by
    * every task thereafter — the per-row-init amortization).
    */
  def engine: OcrEngine = {
    var e = cached
    if (e == null) synchronized {
      if (cached == null) cached = factory()
      e = cached
    }
    e
  }

  /** Production/test seam: swap the engine factory (next `engine` call
    * rebuilds). In cluster mode each executor JVM starts from the
    * default factory — wire a real engine via a static initializer or
    * this call in a startup hook; local/test mode shares the one JVM.
    */
  def install(f: () => OcrEngine): Unit = synchronized {
    factory = f
    cached = null
  }
}

object OcrRun {
  /** Reference level-failure semantics (`app.py:91-92` via
    * `ocr_engine.py`): light fails on blank text
    * (`ocr_engine.py:142-144`); premium/optimum fail only when text and
    * boxes are both empty (`ocr_engine.py:197-199,266-268`).
    */
  /** Level-failure predicate over (text, box count) — shared by the
    * full-box path below and the skew path's count-only reassembly.
    */
  def isFailed(level: String, rawText: String, nBoxes: Int): Boolean = {
    val blank = rawText.trim.isEmpty
    if (level == "light") blank else blank && nBoxes == 0
  }

  def levelResult(level: String, rawText: String,
      boxes: Seq[OcrBox]): LevelOcr =
    LevelOcr(if (isFailed(level, rawText, boxes.length)) None else Some(rawText),
      boxes)

  /** Assemble one document's OCR output at one level: spans in offset
    * order; text spans contribute their inline text verbatim, media
    * spans their OCR'd page text; joined with '\n'. Boxes concatenate
    * in the same span order (`ocr_engine.py` emits them in token order
    * per page).
    */
  def ocrDoc(engine: OcrEngine, level: String,
      spans: Seq[graft.schema.DocSpan]): LevelOcr = {
    val ordered = spans.sortBy(_.offset)
    val allBoxes = Seq.newBuilder[OcrBox]
    val parts = ordered.map { s =>
      if (s.kind == "media") {
        val (t, boxes) = engine.ocrPage(level, s.media_ref)
        allBoxes ++= boxes
        t
      } else s.text
    }
    levelResult(level, parts.mkString("\n"), allBoxes.result())
  }

  def firstMediaRef(spans: Seq[graft.schema.DocSpan]): String =
    spans.sortBy(_.offset).collectFirst { case s if s.kind == "media" => s.media_ref }
      .getOrElse("")
}
