package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import Scoring.{In, Model, LOG_2_OF_E, log2, log2c}

/**
 * The stock-Lucene similarity grid the reference enumerates for its model
 * sweeps (`/root/reference/src/main/java/edu/anadolu/similarities/Models.java:17-46`
 * builds it; `:105-127` instantiates Classic + BM25 + the full
 * DFR basic×afterEffect×normalization cross product + the IB
 * distribution×lambda×normalization cross product + the LM similarities).
 *
 * Re-expressed as composable column math over the same
 * [[Scoring.In]] inputs as the reference-native zoo: each piece (TF
 * normalization, DFR basic model, after-effect gain, IB distribution,
 * IB lambda) is a small algebra with a scalar and a Column form, and the
 * grid is the cross product. Formulas follow the published
 * divergence-from-randomness framework (Amati & van Rijsbergen, TOIS 2002)
 * and the information-based family (Clinchant & Gaussier, SIGIR 2010), with
 * the constants Lucene's similarity package parameterizes them with
 * (H3 µ=800, Z z=0.30, smoothed λ=(df+1)/(N+1) / (cf+1)/(N+1)).
 *
 * Block-max eligibility ([[Scoring.Model.ubSafe]]) is granted only where
 * monotonicity (↑tf, ↓docLen) is provable: the linear-Inf1 DFR cells
 * (I(n)/I(ne)/I(F) × any gain) and all IB cells, each under the
 * dl-monotone normalizations (H1/H2/Z/none). The Poisson, divergence and
 * Bose-Einstein approximations and every H3 cell conservatively take the
 * exact path. EngineSpec pins BMW ≡ exact for every eligible cell.
 */
object StockLucene {

  private val TwoPi = 2.0 * math.Pi

  // ---------- TF normalizations (DFR "second normalization") ----------

  sealed trait Norm extends Serializable {
    def tag: String
    /** tfn non-decreasing in tf and non-increasing in docLen (H3's Dirichlet
     * form mixes dl into both numerator and denominator — not provable). */
    def dlMonotone: Boolean = true
    def tfn(tf: Double, dl: Double, avgdl: Double, cf: Double, c: Double): Double
    def expr(in: In): Column
  }

  /** tfn = tf (NoNormalization). */
  case object N0 extends Norm {
    val tag = "0"
    def tfn(tf: Double, dl: Double, avgdl: Double, cf: Double, c: Double): Double = tf
    def expr(in: In): Column = in.tf
  }

  /** H1: uniform distribution of the term across the document,
   * tfn = tf · avgdl/dl (c = 1). */
  case object H1 extends Norm {
    val tag = "1"
    def tfn(tf: Double, dl: Double, avgdl: Double, cf: Double, c: Double): Double =
      tf * avgdl / dl
    def expr(in: In): Column = in.tf * in.avgdl / in.docLen
  }

  /** H2: density-decreasing normalization, tfn = tf · log2(1 + avgdl/dl)
   * (c = 1) — identical to the reference's own L2 normalization
   * (`freq/L2.java:13`). */
  case object H2 extends Norm {
    val tag = "2"
    def tfn(tf: Double, dl: Double, avgdl: Double, cf: Double, c: Double): Double =
      tf * log2(1.0 + avgdl / dl)
    def expr(in: In): Column = in.tf * log2c(lit(1.0) + in.avgdl / in.docLen)
  }

  /** H3: Dirichlet-prior smoothed normalization with µ = 800,
   * tfn = µ · (tf + µ·(cf+1)/(C+1)) / (dl + µ). */
  case object H3 extends Norm {
    val tag = "3"
    override val dlMonotone = false
    val mu = 800.0
    def tfn(tf: Double, dl: Double, avgdl: Double, cf: Double, c: Double): Double =
      (tf + mu * ((cf + 1.0) / (c + 1.0))) / (dl + mu) * mu
    def expr(in: In): Column =
      (in.tf + lit(mu) * ((in.cf + lit(1.0)) / (in.c + lit(1.0)))) /
        (in.docLen + lit(mu)) * lit(mu)
  }

  /** Z: Pareto-Zipf normalization, tfn = tf · (avgdl/dl)^z with z = 0.30. */
  case object NZ extends Norm {
    val tag = "Z"
    val z = 0.30
    def tfn(tf: Double, dl: Double, avgdl: Double, cf: Double, c: Double): Double =
      tf * StrictMath.pow(avgdl / dl, z)
    def expr(in: In): Column = in.tf * pow(in.avgdl / in.docLen, lit(z))
  }

  val norms: Seq[Norm] = Seq(H1, H2, H3, NZ, N0)

  // ---------- DFR basic randomness models: Inf1(tfn) ----------

  sealed trait Basic extends Serializable {
    def tag: String
    /** Inf1 = k·tfn with k > 0 (no constant term): composed with any
     * after-effect gain the score is k·tfn/(tfn+1)·c — provably monotone
     * non-decreasing in tfn. Holds for the I(n)/I(ne)/I(F) family; the
     * Poisson/divergence/Bose-Einstein approximations have non-linear or
     * sign-varying terms and stay conservative. */
    def tfnLinear: Boolean = false
    /** Informative content −log2 Prob1(tfn) given corpus stats. */
    def inf1(tfn: Double, df: Double, cf: Double, n: Double): Double
    def expr(tfn: Column, in: In): Column
  }

  /** P — approximation of the binomial with the Poisson (λ = cf/N),
   * Stirling-expanded. */
  case object BP extends Basic {
    val tag = "P"
    def inf1(tfn: Double, df: Double, cf: Double, n: Double): Double = {
      val lambda = cf / n
      tfn * log2(tfn / lambda) +
        (lambda + 1.0 / (12.0 * tfn) - tfn) * LOG_2_OF_E +
        0.5 * log2(TwoPi * tfn)
    }
    def expr(tfn: Column, in: In): Column = {
      val lambda = in.cf / in.n
      tfn * log2c(tfn / lambda) +
        (lambda + lit(1.0) / (lit(12.0) * tfn) - tfn) * lit(LOG_2_OF_E) +
        lit(0.5) * log2c(lit(TwoPi) * tfn)
    }
  }

  /** D — approximation of the binomial with the divergence; F = cf + 1,
   * p = 1/(N+1), φ = tfn/F clamped below 1 so the (1−φ)·log2(1−φ) term
   * stays defined when a normalization pushes tfn to F. */
  case object BD extends Basic {
    val tag = "D"
    private val PhiMax = 1.0 - 1e-9
    def inf1(tfn: Double, df: Double, cf: Double, n: Double): Double = {
      val bigF = cf + 1.0
      val p = 1.0 / (n + 1.0)
      val phi = math.min(tfn / bigF, PhiMax)
      val d = phi * log2(phi / p) + (1.0 - phi) * log2((1.0 - phi) / (1.0 - p))
      d * bigF + 0.5 * log2(1.0 + TwoPi * tfn * (1.0 - phi))
    }
    def expr(tfn: Column, in: In): Column = {
      val bigF = in.cf + lit(1.0)
      val p = lit(1.0) / (in.n + lit(1.0))
      val phi = least(tfn / bigF, lit(PhiMax))
      val d = phi * log2c(phi / p) +
        (lit(1.0) - phi) * log2c((lit(1.0) - phi) / (lit(1.0) - p))
      d * bigF + lit(0.5) * log2c(lit(1.0) + lit(TwoPi) * tfn * (lit(1.0) - phi))
    }
  }

  /** G — geometric approximation of the Bose-Einstein,
   * λ = F/(N+F) with F = cf.
   *
   * Deliberate deviation from stock Lucene: `BasicModelG` uses
   * F = totalTermFreq + 1; this grid keeps the published DFR form F = cf
   * (consistent with the engine's other DFR cells). The cells are
   * name-compatible, not bit-faithful to Lucene here. */
  case object BG extends Basic {
    val tag = "G"
    def inf1(tfn: Double, df: Double, cf: Double, n: Double): Double = {
      val lambda = cf / (n + cf)
      log2(1.0 + lambda) + tfn * log2((1.0 + lambda) / lambda)
    }
    def expr(tfn: Column, in: In): Column = {
      val lambda = in.cf / (in.n + in.cf)
      log2c(lit(1.0) + lambda) + tfn * log2c((lit(1.0) + lambda) / lambda)
    }
  }

  /** Be — limiting form of the Bose-Einstein via Stirling's f(z,m) =
   * (m+0.5)·log2(z/m) + (z−m)·log2(z); F = cf, tfn capped just below F so
   * f's second argument stays positive.
   *
   * Deliberate deviation from stock Lucene: `BasicModelBE` uses
   * F = totalTermFreq + 1; this grid keeps the published DFR form F = cf
   * (see [[BG]]). */
  case object BBe extends Basic {
    val tag = "Be"
    private def f(z: Double, m: Double): Double =
      (m + 0.5) * log2(z / m) + (z - m) * log2(z)
    def inf1(tfn: Double, df: Double, cf: Double, n: Double): Double = {
      val t = math.min(tfn, cf - 1e-3)
      -log2(n - 1.0) - LOG_2_OF_E +
        f(n + cf - 1.0, n + cf - t - 2.0) - f(cf, cf - t)
    }
    private def fc(z: Column, m: Column): Column =
      (m + lit(0.5)) * log2c(z / m) + (z - m) * log2c(z)
    def expr(tfn: Column, in: In): Column = {
      val t = least(tfn, in.cf - lit(1e-3))
      lit(0.0) - log2c(in.n - lit(1.0)) - lit(LOG_2_OF_E) +
        fc(in.n + in.cf - lit(1.0), in.n + in.cf - t - lit(2.0)) -
        fc(in.cf, in.cf - t)
    }
  }

  /** I(n) — inverse document frequency, tfn · log2((N+1)/(df+0.5)). */
  case object BIn extends Basic {
    override val tfnLinear = true
    val tag = "In"
    def inf1(tfn: Double, df: Double, cf: Double, n: Double): Double =
      tfn * log2((n + 1.0) / (df + 0.5))
    def expr(tfn: Column, in: In): Column =
      tfn * log2c((in.n + lit(1.0)) / (in.df + lit(0.5)))
  }

  /** I(ne) — inverse expected document frequency,
   * ne = N·(1 − ((N−1)/N)^cf). */
  case object BIne extends Basic {
    override val tfnLinear = true
    val tag = "Ine"
    def inf1(tfn: Double, df: Double, cf: Double, n: Double): Double = {
      val ne = n * (1.0 - StrictMath.pow((n - 1.0) / n, cf))
      tfn * log2((n + 1.0) / (ne + 0.5))
    }
    def expr(tfn: Column, in: In): Column = {
      val ne = in.n * (lit(1.0) - pow((in.n - lit(1.0)) / in.n, in.cf))
      tfn * log2c((in.n + lit(1.0)) / (ne + lit(0.5)))
    }
  }

  /** I(F) — inverse collection frequency, tfn · log2(1 + (N+1)/(cf+0.5)). */
  case object BIF extends Basic {
    override val tfnLinear = true
    val tag = "IF"
    def inf1(tfn: Double, df: Double, cf: Double, n: Double): Double =
      tfn * log2(1.0 + (n + 1.0) / (cf + 0.5))
    def expr(tfn: Column, in: In): Column =
      tfn * log2c(lit(1.0) + (in.n + lit(1.0)) / (in.cf + lit(0.5)))
  }

  val basics: Seq[Basic] = Seq(BBe, BD, BG, BIF, BIn, BIne, BP)

  // ---------- DFR after-effects (first normalization / information gain) ----------

  sealed trait Gain extends Serializable {
    def tag: String
    def gain(tfn: Double, df: Double, cf: Double): Double
    def expr(tfn: Column, in: In): Column
  }

  /** No after-effect. */
  case object GNone extends Gain {
    val tag = ""
    def gain(tfn: Double, df: Double, cf: Double): Double = 1.0
    def expr(tfn: Column, in: In): Column = lit(1.0)
  }

  /** L — Laplace law of succession, 1/(tfn+1). */
  case object GL extends Gain {
    val tag = "L"
    def gain(tfn: Double, df: Double, cf: Double): Double = 1.0 / (tfn + 1.0)
    def expr(tfn: Column, in: In): Column = lit(1.0) / (tfn + lit(1.0))
  }

  /** B — ratio of two Bernoulli processes, (cf+1)/(df·(tfn+1)). */
  case object GB extends Gain {
    val tag = "B"
    def gain(tfn: Double, df: Double, cf: Double): Double =
      (cf + 1.0) / (df * (tfn + 1.0))
    def expr(tfn: Column, in: In): Column =
      (in.cf + lit(1.0)) / (in.df * (tfn + lit(1.0)))
  }

  val gains: Seq[Gain] = Seq(GB, GL, GNone)

  // ---------- composed DFR model ----------

  /** score = kf · gain(tfn) · Inf1(tfn), the DFR framework composition
   * Lucene's DFRSimilarity evaluates for every (basic, afterEffect,
   * normalization) cell of `Models.java:17-34`. */
  final case class Dfr(basic: Basic, g: Gain, norm: Norm) extends Model {
    val name = s"DFR_${basic.tag}${g.tag}${norm.tag}"
    /** Block-max-safe iff Inf1 is linear in tfn (gain then preserves
     * monotonicity: k·tfn/(tfn+1)) and tfn is (↑tf, ↓dl)-monotone. */
    override def ubSafe: Boolean = basic.tfnLinear && norm.dlMonotone
    def score(tf: Double, docLen: Long, avgdl: Double, kf: Double,
              df: Double, cf: Double, n: Double, c: Double): Double = {
      val tfn = norm.tfn(tf, docLen.toDouble, avgdl, cf, c)
      kf * g.gain(tfn, df, cf) * basic.inf1(tfn, df, cf, n)
    }
    def expr(in: In): Column = {
      val tfn = norm.expr(in)
      in.kf * g.expr(tfn, in) * basic.expr(tfn, in)
    }
  }

  // ---------- information-based (IB) family ----------

  sealed trait Lam extends Serializable {
    def tag: String
    def lambda(df: Double, cf: Double, n: Double): Double
    def expr(in: In): Column
  }

  /** λ = (df+1)/(N+1) — document-frequency burstiness. */
  case object LamDF extends Lam {
    val tag = "DF"
    def lambda(df: Double, cf: Double, n: Double): Double = (df + 1.0) / (n + 1.0)
    def expr(in: In): Column = (in.df + lit(1.0)) / (in.n + lit(1.0))
  }

  /** λ = (cf+1)/(N+1) — total-term-frequency burstiness (may exceed 1;
   * the distributions below stay defined away from λ = 1). */
  case object LamTTF extends Lam {
    val tag = "TTF"
    def lambda(df: Double, cf: Double, n: Double): Double = (cf + 1.0) / (n + 1.0)
    def expr(in: In): Column = (in.cf + lit(1.0)) / (in.n + lit(1.0))
  }

  val lams: Seq[Lam] = Seq(LamDF, LamTTF)

  sealed trait Dist extends Serializable {
    def tag: String
    def score(tfn: Double, lambda: Double): Double
    def expr(tfn: Column, lambda: Column): Column
  }

  /** Log-logistic: −log2(λ/(λ+tfn)) = log2(1 + tfn/λ). */
  case object DistLL extends Dist {
    val tag = "LL"
    def score(tfn: Double, lambda: Double): Double = log2(1.0 + tfn / lambda)
    def expr(tfn: Column, lambda: Column): Column = log2c(lit(1.0) + tfn / lambda)
  }

  /** Smoothed power-law: −log2((λ^(tfn/(tfn+1)) − λ)/(1 − λ)); λ nudged off
   * the λ=1 singularity. */
  case object DistSPL extends Dist {
    val tag = "SPL"
    def score(tfn: Double, lambda: Double): Double = {
      val l = if (math.abs(lambda - 1.0) < 1e-9) 1.0 + 1e-9 else lambda
      val w = tfn / (tfn + 1.0)
      -log2((StrictMath.pow(l, w) - l) / (1.0 - l))
    }
    def expr(tfn: Column, lambda: Column): Column = {
      val l = when(abs(lambda - lit(1.0)) < lit(1e-9), lit(1.0 + 1e-9))
        .otherwise(lambda)
      val w = tfn / (tfn + lit(1.0))
      lit(0.0) - log2c((pow(l, w) - l) / (lit(1.0) - l))
    }
  }

  val dists: Seq[Dist] = Seq(DistLL, DistSPL)

  /** score = kf · dist(tfn, λ), Lucene IBSimilarity's composition over
   * `Models.java:36-46` distributions × lambdas × normalizations. */
  final case class Ib(dist: Dist, lam: Lam, norm: Norm) extends Model {
    val name = s"IB_${dist.tag}_${lam.tag}_${norm.tag}"
    /** Both LL and SPL are monotone ↑ in tfn for any λ > 0, λ ≠ 1 (LL is
     * log2(1+tfn/λ); SPL's argument is monotone in w = tfn/(tfn+1) on both
     * λ < 1 and λ > 1 branches), and λ is docLen-independent — block-max
     * safe whenever the normalization is. */
    override def ubSafe: Boolean = norm.dlMonotone
    def score(tf: Double, docLen: Long, avgdl: Double, kf: Double,
              df: Double, cf: Double, n: Double, c: Double): Double =
      kf * dist.score(norm.tfn(tf, docLen.toDouble, avgdl, cf, c),
        lam.lambda(df, cf, n))
    def expr(in: In): Column =
      in.kf * dist.expr(norm.expr(in), lam.expr(in))
  }

  // ---------- classic VSM + stock BM25 + stock LM similarities ----------

  /** Lucene ClassicSimilarity (practical TF-IDF VSM): √tf · idf² · 1/√dl
   * with idf = 1 + ln((N+1)/(df+1)) — the lossless-norm variant (Lucene's
   * byte-quantized length norm is an index-size trick, not semantics). */
  case object Classic extends Model {
    val name = "Classic"
    // √tf·idf²/√dl: monotone ↑tf, ↓dl — block-max safe
    def score(tf: Double, docLen: Long, avgdl: Double, kf: Double,
              df: Double, cf: Double, n: Double, c: Double): Double = {
      val idf = 1.0 + StrictMath.log((n + 1.0) / (df + 1.0))
      kf * math.sqrt(tf) * idf * idf / math.sqrt(docLen.toDouble)
    }
    def expr(in: In): Column = {
      val idf = lit(1.0) + log((in.n + lit(1.0)) / (in.df + lit(1.0)))
      in.kf * sqrt(in.tf) * idf * idf / sqrt(in.docLen)
    }
  }

  /** Stock Lucene BM25 (k1=1.2, b=0.75): idf·tf/(tf + k1·(1−b+b·dl/avgdl))
   * with idf = ln(1 + (N−df+0.5)/(df+0.5)) — distinct from the reference's
   * own k3-bearing BM25 (`similarities/BM25.java:39-43`). */
  final case class LuceneBM25(k1: Double = 1.2, b: Double = 0.75) extends Model {
    val name = s"LuceneBM25k${k1}b$b"
    def score(tf: Double, docLen: Long, avgdl: Double, kf: Double,
              df: Double, cf: Double, n: Double, c: Double): Double = {
      val idf = StrictMath.log(1.0 + (n - df + 0.5) / (df + 0.5))
      kf * idf * tf / (tf + k1 * (1.0 - b + b * docLen / avgdl))
    }
    def expr(in: In): Column = {
      val idf = log(lit(1.0) + (in.n - in.df + lit(0.5)) / (in.df + lit(0.5)))
      in.kf * idf * in.tf / (in.tf + lit(k1) * (lit(1.0 - b) + lit(b) * in.docLen / in.avgdl))
    }
  }

  /** Stock LM Dirichlet (µ=2000, natural log, p = (cf+1)/(C+1)) — distinct
   * from the reference's log2-based DirichletLM (`DirichletLM.java:26-29`).
   * Like Lucene's LMDirichletSimilarity, a negative per-term score (long
   * doc / low tf) is clamped to 0 so matched docs never rank below
   * unmatched ones. */
  final case class LuceneLMDirichlet(mu: Double = 2000.0) extends Model {
    val name = s"LuceneLMDir$mu"
    // monotone ↑tf, ↓dl like the reference's DirichletLM (which is ubSafe);
    // the 0-clamp preserves both monotonicities
    def score(tf: Double, docLen: Long, avgdl: Double, kf: Double,
              df: Double, cf: Double, n: Double, c: Double): Double = {
      val p = (cf + 1.0) / (c + 1.0)
      val s = StrictMath.log(1.0 + tf / (mu * p)) + StrictMath.log(mu / (docLen + mu))
      kf * math.max(s, 0.0)
    }
    def expr(in: In): Column = {
      val p = (in.cf + lit(1.0)) / (in.c + lit(1.0))
      val s = log(lit(1.0) + in.tf / (lit(mu) * p)) +
        log(lit(mu) / (in.docLen + lit(mu)))
      in.kf * greatest(s, lit(0.0))
    }
  }

  /** Stock LM Jelinek-Mercer (natural log, p = (cf+1)/(C+1));
   * the grid instantiates λ = 0.1 and λ = 0.7 (`Models.java:125-126`). */
  final case class LuceneLMJM(lambda: Double) extends Model {
    val name = s"LuceneLMJM$lambda"
    def score(tf: Double, docLen: Long, avgdl: Double, kf: Double,
              df: Double, cf: Double, n: Double, c: Double): Double = {
      val p = (cf + 1.0) / (c + 1.0)
      kf * StrictMath.log(1.0 + ((1.0 - lambda) * tf / docLen) / (lambda * p))
    }
    def expr(in: In): Column = {
      val p = (in.cf + lit(1.0)) / (in.c + lit(1.0))
      in.kf * log(lit(1.0) +
        ((lit(1.0 - lambda) * in.tf / in.docLen)) / (lit(lambda) * p))
    }
  }

  // ---------- the grid ----------

  /** The full 130-model enumeration, mirroring the reference's static sims
   * list (`Models.java:105-127`): Classic, BM25, 7×3×5 DFR, 2×2×5 IB,
   * LM Dirichlet, LM Jelinek-Mercer(0.1, 0.7). */
  val grid: Seq[Model] =
    Seq(Classic, LuceneBM25()) ++
      (for (b <- basics; g <- gains; nm <- norms) yield Dfr(b, g, nm)) ++
      (for (d <- dists; l <- lams; nm <- norms) yield Ib(d, l, nm)) ++
      Seq(LuceneLMDirichlet(), LuceneLMJM(0.1), LuceneLMJM(0.7))

  private val byName: Map[String, Model] = grid.map(m => m.name -> m).toMap

  /** Grid-name parser: exact `name` round-trip for every grid member
   * (`DFR_InL2`, `IB_SPL_TTF_1`, `Classic`, …). */
  def parse(name: String): Option[Model] = byName.get(name)
}
