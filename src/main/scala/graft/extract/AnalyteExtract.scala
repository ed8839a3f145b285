package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TshPatterns.{Num, Range, UnitLabelled}

/** One extractable lab-report entity: a label alternation and a unit
  * alternation plug into the shared labelled-line machinery
  * (label gate -> snippet -> first number -> 25-char unit window ->
  * range-after-value -> best-by-(has_range, penalty, span_start,
  * line_no)). TSH is the reference-derived instance; the others cover
  * the north_star's generic "analyte name, value, unit, reference
  * range" surface over the same corpus.
  */
final case class AnalyteConfig(name: String, label: String, unit: String)

/** Generic analyte extraction (north_star: "regex/finite-state field
  * extraction for lab-report entities — analyte name, value, unit,
  * reference range, date"). The per-line candidate chain here is THE
  * machinery `TshExtract.labelledCandidates` runs (TSH delegates to it
  * with the reference's patterns, `parsers/tsh.py:101-124,157-161`);
  * everything stays UDF-free expression-only, so multi-analyte
  * extraction is still one map-side projection per document.
  */
object AnalyteExtract {
  import TshExtract.{adjustRefValue, best, candidate, labelPenalty, linesOf, nullIfEmpty, toFloat}

  /** E1-E6 generalized — `_extract_tsh_from_labelled_line` semantics
    * (`parsers/tsh.py:131-182,251-257`) with the label/unit patterns as
    * parameters; returns candidate structs in line order. Staged
    * `transform` chain: each stage's fields are leaf references in the
    * next, keeping the expression tree linear (see TshExtract note).
    */
  def labelledCandidates(raw: Column, labelRe: String, unitRe: String): Column = {
    val s1 = transform(linesOf(raw), (l, i) =>
      struct(l.as("line"), i.as("line_no"),
        regexp_instr(l, lit(labelRe)).as("label_pos"))) // 1-based; 0 = none
    // E1 gate (`parsers/tsh.py:252-253`): drop label-less lines NOW so
    // the expensive per-line stages below only run on candidate lines
    val s1g = filter(s1, c => c("label_pos") > 0)
    val s1l = transform(s1g, c =>
      struct(c("line"), c("line_no"), c("label_pos"),
        regexp_extract(c("line"), labelRe, 0).as("label")))
    // snippet = everything after the label (`parsers/tsh.py:142`)
    val s2 = transform(s1l, c =>
      struct(c("line_no"), c("label_pos"), c("label"),
        c("line").substr(c("label_pos") + length(c("label")),
          length(c("line"))).as("snippet")))
    val s3 = transform(s2, c =>
      struct(c("line_no"), c("label_pos"), c("label"), c("snippet"),
        get(regexp_extract_all(c("snippet"), lit(Num), lit(0)), lit(0))
          .as("first_num"), // first number after label (Q8)
        regexp_instr(c("snippet"), lit(Num)).as("num_pos"),
        size(regexp_extract_all(c("snippet"), lit(Num), lit(0))).as("n_nums")))
    val s4 = transform(s3, c =>
      struct(c("line_no"), c("label_pos"), c("label"), c("first_num"), c("n_nums"),
        c("snippet").substr(c("num_pos") + length(c("first_num")),
          length(c("snippet"))).as("after")))
    val s5 = transform(s4, c =>
      struct(c("line_no"), c("label_pos"), c("label"), c("n_nums"),
        toFloat(c("first_num")).as("value"),
        // unit searched in a 25-char window after the value (quirk Q10)
        nullIfEmpty(regexp_extract(substring(c("after"), 1, 25), unitRe, 0))
          .as("unit"),
        adjustRefValue(nullIfEmpty(regexp_extract(c("after"), Range, 1)))
          .as("ref_min"),
        adjustRefValue(nullIfEmpty(regexp_extract(c("after"), Range, 2)))
          .as("ref_max")))
    val cands = transform(s5, c =>
      when(c("label_pos") > 0 && c("n_nums") > 0 && c("value").isNotNull,
        candidate(
          when(c("ref_min").isNotNull && c("ref_max").isNotNull, 0).otherwise(1),
          labelPenalty(c("label")), c("label_pos") - 1, c("line_no"),
          c("value"), c("unit"), c("ref_min"), c("ref_max"), c("label"))))
    filter(cands, c => c.isNotNull)
  }

  // ---- standard configs over the corpus' secondary analyte lines ---------
  val Tsh = AnalyteConfig("tsh", TshPatterns.Label, UnitLabelled)
  val Glycemia = AnalyteConfig("glycemia",
    "(?iU)glyc[ée]mie", "(?iU)(?:g ?/?L|mmol/?L)")
  val Hemoglobin = AnalyteConfig("hemoglobin",
    "(?iU)h[ée]moglobine", "(?iU)g ?/?dL")
  val Creatinine = AnalyteConfig("creatinine",
    "(?iU)cr[ée]atinine", "(?iU)µ?mol/?L")
  val Cholesterol = AnalyteConfig("cholesterol",
    "(?iU)cholest[ée]rol", "(?iU)g ?/?L")
  val Secondary: Seq[AnalyteConfig] =
    Seq(Glycemia, Hemoglobin, Creatinine, Cholesterol)

  /** Adds `out` = array<struct<analyte,value,unit,ref_min,ref_max>>:
    * the best candidate per configured analyte found in `rawCol`.
    * Intermediates are materialized as named columns (`${out}_*`) so
    * multi-analyte extraction does not re-inline the candidate chains
    * (Column-tree hygiene, see Pipeline); callers project them away.
    * `fused` (default): ONE compiled [[MultiAnalyteGather]] pass per
    * document evaluates every config against a single normalize+split
    * line walk (the per-analyte [[AnalyteGather]] would re-normalize
    * the text once per analyte); the q43 oracle checks the fused output
    * against the independent Python implementation, and AnalyteSpec
    * pins fused == HOF and multi == per-analyte.
    */
  def withEntities(df: DataFrame, rawCol: String, out: String,
      cfgs: Seq[AnalyteConfig] = Secondary,
      fused: Boolean = true): DataFrame = {
    val base =
      if (fused) df.withColumn(s"${out}_all",
        MultiAnalyteGather.of(col(rawCol), cfgs.map(c => (c.label, c.unit))))
      else df
    val staged = cfgs.zipWithIndex.foldLeft(base) { case (d, (cfg, ix)) =>
      d.withColumn(s"${out}_${cfg.name}_cands",
          if (fused) get(col(s"${out}_all"), lit(ix))
          else labelledCandidates(col(rawCol), cfg.label, cfg.unit))
        .withColumn(s"${out}_${cfg.name}_best",
          best(col(s"${out}_${cfg.name}_cands")))
    }
    staged.withColumn(out, filter(array(cfgs.map { cfg =>
      val b = col(s"${out}_${cfg.name}_best")
      when(b.isNotNull, struct(lit(cfg.name).as("analyte"),
        b("value").as("value"), b("unit").as("unit"),
        b("ref_min").as("ref_min"), b("ref_max").as("ref_max")))
    }: _*), e => e.isNotNull))
  }

  /** French lab-report date `dd/MM/yyyy`, shape-validated: day 1-31,
    * month 1-12 (a looser [01]?\d month would accept 13-19 and 00 and
    * normalize them into invalid ISO strings on real text). Mirrored in
    * fixtures/gen_analyte_expected.py — change BOTH and regenerate
    * expected_dates.parquet.
    */
  val DateRe = """(?U)\b(0?[1-9]|[12]\d|3[01])/(0?[1-9]|1[0-2])/(20\d\d)\b"""

  /** First report date in the text, normalized to ISO `yyyy-MM-dd`
    * (string-level — no timezone/calendar semantics to diverge on).
    * Null when the text carries no date (e.g. light/premium crops drop
    * the page header).
    */
  def reportDateIso(raw: Column): Column =
    when(regexp_instr(coalesce(raw, lit("")), lit(DateRe)) > 0,
      concat(regexp_extract(raw, DateRe, 3), lit("-"),
        lpad(regexp_extract(raw, DateRe, 2), 2, "0"), lit("-"),
        lpad(regexp_extract(raw, DateRe, 1), 2, "0")))
}
