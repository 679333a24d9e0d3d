package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.query.{Scoring, StockLucene}
import graft.query.StockLucene._

/** Stock-Lucene similarity grid (`Models.java:17-46,105-127`): formula
 * hand-checks at a fixed stats point, grid enumeration shape, name parser
 * round-trip, and expr≡scala bit-identity across all 130 models. */
class StockLuceneSpec extends AnyFunSuite {

  private val (tf, dl, df, cf, n, c) = (3.0, 100L, 50.0, 120.0, 1000.0, 80000.0)
  private val avgdl = c / n // 80.0

  private def log2(x: Double) = math.log(x) / math.log(2.0)

  test("grid enumerates Classic + BM25 + 105 DFR + 20 IB + 3 LM = 130 models") {
    assert(grid.size == 2 + 7 * 3 * 5 + 2 * 2 * 5 + 3)
    assert(grid.count(_.isInstanceOf[Dfr]) == 105)
    assert(grid.count(_.isInstanceOf[Ib]) == 20)
    assert(grid.map(_.name).distinct.size == grid.size, "names must be unique")
  }

  test("every grid name parses back to its model (incl. via Scoring.parse)") {
    grid.foreach { m =>
      assert(StockLucene.parse(m.name).contains(m), m.name)
      assert(Scoring.parse(m.name) == m, m.name)
    }
    assert(StockLucene.parse("nope").isEmpty)
  }

  test("normalizations: H1/H2/H3/Z/none hand values") {
    assert(N0.tfn(tf, dl, avgdl, cf, c) == tf)
    assert(H1.tfn(tf, dl, avgdl, cf, c) == tf * avgdl / dl)
    assert(H2.tfn(tf, dl, avgdl, cf, c) == tf * log2(1 + avgdl / dl))
    assert(H3.tfn(tf, dl, avgdl, cf, c)
      == (tf + 800.0 * ((cf + 1) / (c + 1))) / (dl + 800.0) * 800.0)
    assert(NZ.tfn(tf, dl, avgdl, cf, c) == tf * StrictMath.pow(avgdl / dl, 0.30))
  }

  test("basic model In: tfn*log2((N+1)/(df+0.5)) — the InL2 backbone") {
    val tfn = H2.tfn(tf, dl, avgdl, cf, c)
    assert(BIn.inf1(tfn, df, cf, n) == tfn * log2((n + 1) / (df + 0.5)))
    // composed DFR_InL2 = Laplace gain × In
    val want = (1.0 / (tfn + 1.0)) * tfn * log2((n + 1) / (df + 0.5))
    assert(Dfr(BIn, GL, H2).score(tf, dl, avgdl, 1.0, df, cf, n, c) == want)
  }

  test("basic models G, IF, Ine, P hand values at the fixed point") {
    val tfn = tf // N0
    val lambdaG = cf / (n + cf)
    assert(BG.inf1(tfn, df, cf, n)
      == log2(1 + lambdaG) + tfn * log2((1 + lambdaG) / lambdaG))
    assert(BIF.inf1(tfn, df, cf, n) == tfn * log2(1 + (n + 1) / (cf + 0.5)))
    val ne = n * (1 - StrictMath.pow((n - 1) / n, cf))
    assert(BIne.inf1(tfn, df, cf, n) == tfn * log2((n + 1) / (ne + 0.5)))
    val lam = cf / n
    val wantP = tfn * log2(tfn / lam) +
      (lam + 1.0 / (12 * tfn) - tfn) * (1 / math.log(2.0)) +
      0.5 * log2(2 * math.Pi * tfn)
    assert(math.abs(BP.inf1(tfn, df, cf, n) - wantP) < 1e-12)
  }

  test("after-effects: B and L gains") {
    val tfn = 2.5
    assert(GL.gain(tfn, df, cf) == 1.0 / 3.5)
    assert(GB.gain(tfn, df, cf) == (cf + 1) / (df * 3.5))
    assert(GNone.gain(tfn, df, cf) == 1.0)
  }

  test("IB LL and SPL with DF/TTF lambdas") {
    val tfn = H2.tfn(tf, dl, avgdl, cf, c)
    val lDF = (df + 1) / (n + 1)
    assert(Ib(DistLL, LamDF, H2).score(tf, dl, avgdl, 1.0, df, cf, n, c)
      == log2(1 + tfn / lDF))
    val lTTF = (cf + 1) / (n + 1)
    val w = tfn / (tfn + 1)
    val wantSPL = -log2((StrictMath.pow(lTTF, w) - lTTF) / (1 - lTTF))
    assert(Ib(DistSPL, LamTTF, H2).score(tf, dl, avgdl, 1.0, df, cf, n, c) == wantSPL)
    assert(!wantSPL.isNaN && !wantSPL.isInfinite)
  }

  test("SPL survives lambda > 1 (hot TTF term) and lambda ≈ 1") {
    // cf = 5000 over n = 1000 → λ ≈ 5: numerator and denominator both flip sign
    val hot = Ib(DistSPL, LamTTF, N0).score(tf, dl, avgdl, 1.0, df, 5000.0, n, c)
    assert(!hot.isNaN && !hot.isInfinite)
    // df = n → λDF = 1 exactly without smoothing; smoothed + nudge stays finite
    val one = DistSPL.score(2.0, 1.0)
    assert(!one.isNaN && !one.isInfinite)
  }

  test("Classic / stock BM25 / stock LM formulas") {
    val idfC = 1 + math.log((n + 1) / (df + 1))
    assert(Classic.score(tf, dl, avgdl, 1.0, df, cf, n, c)
      == math.sqrt(tf) * idfC * idfC / math.sqrt(dl.toDouble))
    val idfB = math.log(1 + (n - df + 0.5) / (df + 0.5))
    assert(LuceneBM25().score(tf, dl, avgdl, 1.0, df, cf, n, c)
      == idfB * tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))
    val p = (cf + 1) / (c + 1)
    assert(LuceneLMDirichlet().score(tf, dl, avgdl, 1.0, df, cf, n, c)
      == math.log(1 + tf / (2000.0 * p)) + math.log(2000.0 / (dl + 2000.0)))
    assert(LuceneLMJM(0.7).score(tf, dl, avgdl, 1.0, df, cf, n, c)
      == math.log(1 + ((1 - 0.7) * tf / dl) / (0.7 * p))) // (1−λ), not a 0.3 literal: ulp
  }

  test("MVD is the reference's shipped no-op (MVD.java:16-18)") {
    assert(Scoring.MVD.score(tf, dl, avgdl, 1.0, df, cf, n, c) == 0.0)
    assert(Scoring.parse("MVD") == Scoring.MVD)
  }

  test("grid models are finite at edge stats points") {
    // tf==dl (saturated doc), tf==cf (term exclusive to one doc), tiny doc
    val pts = Seq(
      (3.0, 100L, 50.0, 120.0), (5.0, 5L, 1.0, 5.0), (1.0, 1L, 1.0, 1.0),
      (2.0, 50L, 1000.0, 60000.0)) // hot stopword-ish term
    grid.foreach { m =>
      pts.foreach { case (tf, dl, df, cf) =>
        val s = m.score(tf, dl, avgdl, 1.0, df, cf, n, c)
        assert(!s.isNaN && !s.isInfinite, s"${m.name} at ($tf,$dl,$df,$cf) -> $s")
      }
    }
  }

  test("block-max eligibility: exactly the provably-monotone cells") {
    // DFR: linear-Inf1 basics (In/Ine/IF) x 3 gains x dl-monotone norms (not H3)
    assert(grid.collect { case m: Dfr if m.ubSafe => m }.size == 3 * 3 * 4)
    grid.collect { case m: Dfr => m }.foreach { m =>
      assert(m.ubSafe == (Set[Basic](BIn, BIne, BIF)(m.basic) && m.norm != H3), m.name)
    }
    // IB: every distribution x lambda, dl-monotone norms only
    assert(grid.collect { case m: Ib if m.ubSafe => m }.size == 2 * 2 * 4)
    grid.collect { case m: Ib => m }.foreach(m => assert(m.ubSafe == (m.norm != H3), m.name))
    // spot-check the monotonicity claim numerically on an eligible cell grid
    val pts = for (tf <- 1 to 20) yield
      Dfr(BIn, GB, H2).score(tf, 100L, avgdl, 1.0, df, cf, n, c)
    assert(pts == pts.sorted, "DFR_InB2 must be non-decreasing in tf")
    val dls = for (dl <- 10 to 200 by 10) yield
      Ib(DistSPL, LamTTF, H1).score(3.0, dl.toLong, avgdl, 1.0, df, cf, n, c)
    assert(dls == dls.sorted.reverse, "IB_SPL_TTF_1 must be non-increasing in docLen")
  }

  test("column expressions agree bit-for-bit with scala formulas across the grid") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions.{col, lit}
    val rows = Seq(
      (1.0, 10L, 2.0, 3.0), (3.0, 100L, 50.0, 120.0), (7.0, 7L, 1.0, 7.0),
      (2.0, 333L, 999.0, 5000.0), (1.0, 1L, 1.0, 1.0))
    val df0 = spark.createDataFrame(rows).toDF("tf", "docLen", "df", "cf")
    val in = Scoring.In(col("tf"), col("docLen").cast("double"),
      col("df"), col("cf"), lit(1.0d), lit(n), lit(c))
    // one select evaluating all 130 models at once — also proves the whole
    // grid can score in a single scan (the sweep plan shape)
    val cols = grid.map(m => m.expr(in).as(m.name))
    val got = df0.select(cols: _*).collect()
    rows.zipWithIndex.foreach { case ((tf, dl, df, cf), i) =>
      grid.zipWithIndex.foreach { case (m, j) =>
        val g = got(i).getDouble(j)
        val w = m.score(tf, dl, c / n, 1.0, df, cf, n, c)
        assert(java.lang.Double.doubleToLongBits(g) == java.lang.Double.doubleToLongBits(w),
          s"${m.name} at row $i: expr=$g scala=$w")
      }
    }
  }
}
