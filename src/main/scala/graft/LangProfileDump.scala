package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.analysis.LangProfiles

/** Exports [[graft.analysis.LangProfiles]]' word lists (the classifier's
  * single source of truth) to `fixtures/lang_profiles.json` for the
  * Python oracle mirror (`fixtures/gen_lang_expected.py`), which
  * re-derives the trigram profiles and re-scores INDEPENDENTLY from
  * that JSON — only the word-list DATA is shared, never the scoring
  * code (same policy as the q52/q56 oracle SQL generated from
  * `TextOps.EntityDecodes`/`PiiRedactions`: edit the Scala table,
  * re-run the dump, never edit the JSON).
  *
  * No SparkSession needed — the table is a compile-time constant.
  *
  * Run: sbt "runMain graft.LangProfileDump fixtures/lang_profiles.json"
  */
object LangProfileDump {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "fixtures/lang_profiles.json"
    // words are pure letters (no quotes/backslashes/control chars) —
    // enforce that so the hand-rolled JSON below cannot emit anything
    // needing escapes
    LangProfiles.Words.foreach { case (l, ws) =>
      require((l +: ws).forall(w =>
        w.nonEmpty && w.codePoints().allMatch(Character.isLetter(_))),
        s"non-letter chars in word list for '$l' — teach this dump JSON escaping first")
    }
    val words = LangProfiles.Words.map { case (l, ws) =>
      s"""    "$l": [${ws.map(w => s""""$w"""").mkString(", ")}]"""
    }.mkString(",\n")
    val json =
      s"""{
         |  "n": ${LangProfiles.N},
         |  "languages": [${LangProfiles.Languages.map(l => s""""$l"""").mkString(", ")}],
         |  "words": {
         |$words
         |  }
         |}
         |""".stripMargin
    val p = Paths.get(out)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, json.getBytes(StandardCharsets.UTF_8))
    println(s"[lang-profile-dump] wrote ${LangProfiles.Languages.length} languages to $out")
  }
}
