package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** G6/§1.3 — encode one extraction result as the ordered output span
  * sequence `(kind, text, media_ref, order)` the invariant compares on.
  *
  * Emission order (SURVEY.md §1.3): marker, value, unit?, ref_min?,
  * ref_max?, confidence, raw_text? for ok rows; marker, error, raw_text?
  * for failures. `order` is the position within the emitted sequence.
  * Convention (fixed here and mirrored in fixtures/gen_golden.py):
  * only the raw_text span carries a media_ref — the first media span's
  * ref, "" for docs with no media.
  */
object SpanAssembly {

  private def span(kind: String, text: Column, mediaRef: Column): Column =
    struct(lit(kind).as("kind"), text.as("text"), mediaRef.as("media_ref"))

  /** r = result struct from TshExtract.runLevel/cascadeAuto;
    * returns array<struct<kind,text,media_ref,order>>.
    * Doubles are rendered with CAST(double AS STRING) == Java
    * Double.toString == Python str(float) for every magnitude this
    * domain produces (asserted by the golden suite).
    */
  def assemble(r: Column, firstMediaRef: Column): Column = {
    val noRef = lit("")
    val rawSpan = when(r("raw_text").isNotNull,
      span("raw_text", r("raw_text"), coalesce(firstMediaRef, lit(""))))
    val items = when(r("ok"),
      array(
        span("marker", lit("TSH"), noRef),
        span("value", r("value").cast("string"), noRef),
        when(r("unit").isNotNull, span("unit", r("unit"), noRef)),
        when(r("ref_min").isNotNull, span("ref_min", r("ref_min").cast("string"), noRef)),
        when(r("ref_max").isNotNull, span("ref_max", r("ref_max").cast("string"), noRef)),
        span("confidence", r("confidence"), noRef),
        rawSpan))
      .otherwise(array(
        span("marker", lit("TSH"), noRef),
        span("error", r("error"), noRef),
        rawSpan))
    val present = filter(items, s => s.isNotNull)
    transform(present, (s, i) =>
      struct(s("kind").as("kind"), s("text").as("text"),
        s("media_ref").as("media_ref"), i.cast("int").as("order")))
  }
}
