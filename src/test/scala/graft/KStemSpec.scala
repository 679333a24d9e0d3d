package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.{Analyzer, KStem}

/** Krovetz-rule stemmer golden pairs (published algorithm; subset lexicon
 * documented in [[graft.analysis.KStem]]). */
class KStemSpec extends AnyFunSuite {

  private val golden = Seq(
    // plurals
    "cities" -> "city", "tables" -> "table", "churches" -> "church",
    "boxes" -> "box", "classes" -> "class", "merges" -> "merge",
    "uses" -> "use", "files" -> "file",
    // protected head words
    "species" -> "species", "series" -> "series", "news" -> "news",
    "bus" -> "bus", "status" -> "status", "analysis" -> "analysis",
    "thing" -> "thing", "during" -> "during", "string" -> "string",
    "red" -> "red", "speed" -> "speed", "hundred" -> "hundred",
    // past tense
    "tried" -> "try", "stopped" -> "stop", "used" -> "use",
    "walked" -> "walk", "merged" -> "merge", "filed" -> "file",
    "passed" -> "pass", "called" -> "call", "agreed" -> "agree",
    // present participle
    "running" -> "run", "filing" -> "file", "walking" -> "walk",
    "merging" -> "merge", "using" -> "use", "falling" -> "fall",
    "passing" -> "pass", "writing" -> "write", "storing" -> "store",
    // irregulars (direct conflation)
    "children" -> "child", "men" -> "man", "feet" -> "foot",
    "mice" -> "mouse", "indices" -> "index", "wrote" -> "write",
    "taken" -> "take", "thought" -> "think", "known" -> "know",
    // pass-through
    "spark" -> "spark", "ab" -> "ab", "x9y" -> "x9y")

  test("golden pairs") {
    golden.foreach { case (w, want) =>
      assert(KStem.stem(w) == want, s"stem($w) = ${KStem.stem(w)}, want $want")
    }
  }

  test("idempotent on its own output") {
    golden.foreach { case (w, _) =>
      val s = KStem.stem(w)
      assert(KStem.stem(s) == s, s"stem not idempotent on $s (from $w)")
    }
  }

  test("KStem tag runs the full chain (tokenize → lowercase → possessive → kstem)") {
    assert(Analyzer.analyze("The Children's Tables", Analyzer.Tag.KStem) ==
      Seq("the", "child", "table"))
    assert(Analyzer.analyzeQuery("running (files)", Analyzer.Tag.KStem) ==
      Seq("run", "file"))
  }
}
