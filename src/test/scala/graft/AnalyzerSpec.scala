package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.Analyzer
import graft.analysis.Analyzer.Tag

/** Tokenizer golden tests (FIXTURES.md §4; reference behavior from
 * `analysis/Analyzers.java` chains). */
class AnalyzerSpec extends AnyFunSuite {

  test("simple lowercase word-break") {
    assert(Analyzer.analyze("The quick  Brown FOX") == Seq("the", "quick", "brown", "fox"))
  }

  test("punctuation breaks tokens") {
    assert(Analyzer.analyze("hello, world! (test)") == Seq("hello", "world", "test"))
  }

  test("word-internal apostrophe is kept (UAX#29 single-quote)") {
    assert(Analyzer.analyze("don't stop") == Seq("don't", "stop"))
    assert(Analyzer.analyze("don’t") == Seq("don’t"))
  }

  test("possessive strip in NoStemPossessive") {
    assert(Analyzer.analyze("Frank's car", Tag.NoStemPossessive) == Seq("frank", "car"))
    assert(Analyzer.analyze("Frank's car", Tag.NoStem) == Seq("frank's", "car"))
  }

  test("mid-token dot kept between alphanumerics") {
    assert(Analyzer.analyze("visit example.com now") == Seq("visit", "example.com", "now"))
    assert(Analyzer.analyze("3.14 approx") == Seq("3.14", "approx"))
  }

  test("numbers with comma groupings") {
    assert(Analyzer.analyze("1,000,000 items") == Seq("1,000,000", "items"))
  }

  test("trailing/leading punctuation dropped") {
    assert(Analyzer.analyze("'quoted' end.") == Seq("quoted", "end"))
  }

  test("unicode letters") {
    assert(Analyzer.analyze("Ünïcode tërm") == Seq("ünïcode", "tërm"))
  }

  test("null / empty safe") {
    assert(Analyzer.analyze(null) == Nil)
    assert(Analyzer.analyze("") == Nil)
    assert(Analyzer.analyze("   ") == Nil)
  }

  test("query-syntax escape ports MQ09.escape:24-37 char list") {
    assert(Analyzer.escapeQuerySyntax("""a\b+c-d!e(f)g:h^i[j]k"l{m}n~o*p?q|r&s/t""")
      == "a b c d e f g h i j k l m n o p q r s t")
    assert(Analyzer.escapeQuerySyntax("obama family tree") == "obama family tree")
  }

  test("analyzeQuery preserves multiplicity") {
    assert(Analyzer.analyzeQuery("the the the") == Seq("the", "the", "the"))
  }

  test("Latin tag keeps Latin-script tokens only, kstems (Analyzers.java:126-133)") {
    assert(Analyzer.analyze("Tables мир 漢字 running", Analyzer.Tag.Latin)
      == Seq("table", "run"))
  }

  test("ASCII tag keeps Basic-Latin tokens only (Analyzers.java:135-142)") {
    assert(Analyzer.analyze("naïve files café test", Analyzer.Tag.ASCII)
      == Seq("file", "test"))
  }

  test("UAX tag preserves URLs and emails as single tokens (Analyzers.java:192-212)") {
    assert(Analyzer.analyze("See https://Example.com/a?b=1, or mail Bob@Mail.org.",
        Analyzer.Tag.UAX)
      == Seq("see", "https://example.com/a?b=1", "or", "mail", "bob@mail.org"))
    assert(Analyzer.analyze("plain words only", Analyzer.Tag.UAX)
      == Seq("plain", "words", "only"))
  }

  test("ICU tag kstems without the possessive filter (Analyzers.java:119-124)") {
    assert(Analyzer.analyze("Tables running мир", Analyzer.Tag.ICU)
      == Seq("table", "run", "мир"))
    assert(Analyzer.analyze("children", Analyzer.Tag.ICU) == Seq("child"))
    // the distinguishing behavior vs the KStem chain: no possessive strip —
    // the apostrophe token passes through kstem untouched (non-alphabetic)
    assert(Analyzer.analyze("children's", Analyzer.Tag.ICU) == Seq("children's"))
    assert(Analyzer.analyze("children's", Analyzer.Tag.KStem) == Seq("child"))
  }

  test("NoStemTurkish tag: apostrophe + turkishlowercase (Analyzers.java:176-181)") {
    import Analyzer.Tag
    // apostrophe filter drops the suffix INCLUDING the apostrophe
    assert(Analyzer.analyze("Türkiye'nin başkenti", Tag.NoStemTurkish)
      == Seq("türkiye", "başkenti"))
    // Turkish casing: İ → i, I → ı (NOT i)
    assert(Analyzer.analyze("İstanbul IRMAK", Tag.NoStemTurkish)
      == Seq("istanbul", "ırmak"))
    assert(Analyzer.analyze("DIŞİŞLERİ", Tag.NoStemTurkish) == Seq("dışişleri"))
    // I + combining dot above is consumed into i
    // (filter-level: the standard word-break splits on combining marks,
    // so the decomposed sequence only reaches the filter directly)
    assert(Analyzer.turkishLowercase("I\u0307stanbul") == "istanbul")
    assert(Analyzer.stripApostropheSuffix("o'clock'ish") == "o")
    // the standard chain folds I → i — the Turkish chain must not
    assert(Analyzer.analyze("IRMAK", Tag.NoStem) == Seq("irmak"))
    // typographic apostrophe ’ also cuts
    assert(Analyzer.analyze("Ankara’dan", Tag.NoStemTurkish) == Seq("ankara"))
  }

  test("F5 tag: Turkish chain + 5-char prefix truncate (Analyzers.java:169-174)") {
    import Analyzer.Tag
    assert(Analyzer.analyze("İstanbul'daki lale", Tag.F5) == Seq("istan", "lale"))
    assert(Analyzer.analyze("başkenti ev", Tag.F5) == Seq("başke", "ev"))
    // exactly 5 chars passes untouched
    assert(Analyzer.analyze("izmir", Tag.F5) == Seq("izmir"))
  }

  test("scriptOf edge cases (T4, Indexer.java:113-119)") {
    assert(Analyzer.scriptOf("hello") == "ascii")
    assert(Analyzer.scriptOf("héllo") == "other")  // Latin but not Basic-Latin
    assert(Analyzer.scriptOf("мир") == "Cyrillic")
    assert(Analyzer.scriptOf("ሰላም") == "other")    // Ethiopic: outside the ref's ten
    assert(Analyzer.scriptOf("") == "other")
    assert(Analyzer.scriptOf("漢字") == "Jpan")
  }
}
