package graft.extract

/** Regex patterns, byte-equivalent re-expressions of the reference's
  * compiled Python patterns (`parsers/tsh.py:101-124,157-161,202-208`)
  * for Java's regex engine (what Catalyst's regexp_* functions run).
  *
  * Python `re` on `str` is full-Unicode by default: `re.IGNORECASE`
  * case-folds accented letters, and `\b`/`\s`/`\d` are Unicode-aware.
  * Java needs explicit flags for that, hence the embedded `(?iU)` /
  * `(?U)` prefixes (UNICODE_CHARACTER_CLASS implies UNICODE_CASE).
  * Python's `\v` is the single char U+000B, while Java's `\v` is a
  * vertical-whitespace *class* — so N1 spells it `\x0B` (SURVEY.md §7.7).
  */
object TshPatterns {
  /** `parsers/tsh.py:101` — base "TSH" tolerating dots/spaces. */
  val BaseTsh = """T[.\s]*S[.\s]*H"""

  /** `parsers/tsh.py:103-114` — label alternation, order is load-bearing
    * (leftmost-first drives quirk Q3: "3eme" fails the 3rd-gen alt and
    * falls through to bare `TSH\b`, making the value 3.0).
    */
  val Label: String = "(?iU)(?:" +
    BaseTsh + """\s*3(?:e|ème)\s*g[ée]n[ée]?ration?""" +
    "|" + BaseTsh + """\s*ultra\s*sensible""" +
    "|" + BaseTsh + """\s*us\b""" +
    "|" + BaseTsh + """\b""" +
    "|thyr[eé]ostimuline" +
    "|thyrotropine" +
    ")"

  /** `parsers/tsh.py:117` — number with . or , decimals. */
  val Num = """(?U)[+-]?\d+(?:[.,]\d+)?"""

  /** `parsers/tsh.py:120-124` — reference range; a bare `a` counts as a
    * separator (quirk Q4). Case-SENSITIVE like the reference (no
    * re.IGNORECASE on RANGE_RE). Groups 1=min, 2=max.
    */
  val Range =
    """(?U)([+-]?\d+(?:[.,]\d+)?)\s*(?:-|–|—|~|à|a|to|&)\s*([+-]?\d+(?:[.,]\d+)?)"""

  /** `parsers/tsh.py:157-161` — unit regex on the labelled path. */
  val UnitLabelled =
    """(?iU)(m ?UI/?L|µ ?UI/?L|u ?UI/?mL|mIU/?L|mU/?L|pUI/?mL|UI/?L|mUI|µUI|uUI)"""

  /** `parsers/tsh.py:202-208` — fallback-path unit regex; intentionally
    * omits `pUI/?mL` (quirk Q6).
    */
  val UnitFallback =
    """(?iU)(m ?UI/?L|µ ?UI/?L|u ?UI/?mL|mIU/?L|mU/?L|UI/?L|mUI|µUI|uUI)"""

  /** `parsers/tsh.py:42` — single-line whitespace run (Python `[ \t\f\v]`). */
  val WsRun = "[ \\t\\f\\x0B]+"

  /** Post-N3-cleaning float shape — exactly what NUM matches look like
    * after comma->dot, used to guard a plain cast (ANSI-safe without
    * try_cast; `_to_float` is only ever fed NUM matches in the pipeline).
    */
  val FloatShape = """(?U)^[+-]?\d+(?:\.\d+)?$"""

  val FallbackLabel = "TSH (fallback mUI)" // `parsers/tsh.py:232`
}
