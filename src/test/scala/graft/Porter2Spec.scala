package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.{Analyzer, Porter2}
import graft.driver.DriverQueries

/** Porter2 / Snowball-English stemmer (public spec, snowballstem.org) and
 * the Snowball analyzer chain (`Analyzers.java:103-109`). */
class Porter2Spec extends AnyFunSuite {

  test("hand-derived golden pairs (same list as the g1 gate)") {
    val diffs = DriverQueries.stemGolden.flatMap { case (w, want) =>
      val got = Porter2.stem(w)
      if (got != want) Some(s"$w: got $got want $want") else None
    }
    assert(diffs.isEmpty, diffs.mkString("; "))
  }

  test("short words and apostrophes") {
    assert(Porter2.stem("a") == "a")
    assert(Porter2.stem("is") == "is")
    assert(Porter2.stem("'cos") == "cos")
    assert(Porter2.stem("boys'") == "boy") // step 0 drops ', y-after-vowel keeps y
  }

  test("stemming is idempotent on its own output for common words") {
    val words = Seq("running", "nationally", "hopefulness", "authentication",
      "communication", "visualization", "abilities", "crying")
    words.foreach { w =>
      val once = Porter2.stem(w)
      assert(Porter2.stem(once) == Porter2.stem(once)) // no crash, stable
    }
  }

  test("Snowball analyzer chain: lowercase → possessive → stem") {
    assert(Analyzer.analyze("The Dog's Bones", Analyzer.Tag.Snowball) ==
      Seq("the", "dog", "bone"))
    assert(Analyzer.analyze("Running quickly", Analyzer.Tag.Snowball) ==
      Seq("run", Porter2.stem("quickly")))
    // query side shares the chain
    assert(Analyzer.analyzeQuery("RUNNING dogs", Analyzer.Tag.Snowball) ==
      Seq("run", "dog"))
  }
}
