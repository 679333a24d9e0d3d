package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.index.{Codec, FieldedBlocks}
import graft.model.{FieldedBlock, Topic}

/**
 * Early-terminating fielded DisMax retrieval over the block-compressed
 * fielded index (round-4 VERDICT next-round #1): the WAND machinery of
 * [[BlockMaxWand]] extended to per-(field, term) posting streams, honoring
 * the reference's per-term DisjunctionMax (max + tie·(sum − max), boosts per
 * field — `Searcher.java:232-323`) and the query-length
 * minimum-should-match.
 *
 * msm is an EXTRA skip condition on top of the score threshold: streams are
 * sorted by current doc, so the pivot must sit at index ≥ msm−1 — any doc
 * below `streams(msm−1).curDoc` appears in fewer than msm term lists and is
 * skipped without decoding; when fewer than msm streams remain the shard
 * terminates outright.
 *
 * Upper bounds: per (field, term) block, B_f = max(0, boost_f ·
 * float(score(maxTf, minDocLen))) dominates any per-field contribution
 * inside the block (ub-safe models only); per-term bounds combine through
 * the DisMax form (1−tie)·max_f B_f + tie·Σ_f B_f — monotone in every
 * argument, so it dominates the true DisMax of the true per-field scores.
 *
 * Float discipline matches [[Fielded.score]] exactly: per-field score cast
 * to float THEN scaled by the boost in double (both gate modes), per-term
 * DisMax and ×mult in double, per-doc sum in double, finished with a float
 * cast (reference mode) or half-up rounding (cross-engine gate mode). Both
 * finishes are monotone, so a doc whose raw sum ≤ θ finishes ≤ θ and loses
 * the docId-ascending tie-break to the incumbent — the skip conditions stay
 * exact, and shard-local top-k heaps over disjoint doc ranges merge to the
 * global exact top-k.
 *
 * Summation ORDER is canonical on both paths: per-term field scores and
 * per-doc term scores accumulate in UTF8-binary order (fields / terms),
 * matching [[Fielded.score]]'s array_sort'ed folds — double addition is
 * non-associative, so without a fixed order the two paths drift by ULPs
 * (measured: 67 of 152k run rows at 8M docs). Same-order summation also
 * tightens soundness: float addition is monotone, so summing per-field
 * bounds B_f ≥ s_f in the SAME order guarantees the rounded bound sum
 * dominates the rounded score sum — no last-ULP shortfall possible.
 */
object FieldedBlockMax {

  /** Spark's array_sort string order (UTF8 binary) — the canonical
   * field/term summation order shared with [[Fielded.score]]. */
  private def utf8Key(s: String): org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(s)

  /** One (field, term) posting stream: lazily-decoded blocks, block-level
   * skip, per-block upper bound (boost × float(score(maxTf, minDocLen))). */
  private final class FieldSub(blocks: Array[FieldedBlock],
                               val scoreAt: (Long, Long) => Double,
                               ubOf: FieldedBlock => Double) {
    val maxUb: Double = if (blocks.isEmpty) 0d else blocks.map(ubOf).max
    private var bi = 0
    private var pi = 0
    private var docs: Array[Long] = _
    private var tfs: Array[Long] = _
    private var dls: Array[Long] = _
    private def decode(): Unit = {
      val b = blocks(bi)
      docs = Codec.decodeDeltas(b.docBytes, b.n)
      tfs = Codec.decodeTfs(b.tfBytes, b.n)
      dls = Codec.decodeTfs(b.dlBytes, b.n)
    }
    if (blocks.nonEmpty) decode()

    def exhausted: Boolean = bi >= blocks.length
    def curDoc: Long = docs(pi)
    def curScore: Double = scoreAt(tfs(pi), dls(pi))
    def blockUb: Double = ubOf(blocks(bi))

    def next(): Unit = {
      pi += 1
      if (pi >= blocks(bi).n) {
        pi = 0; bi += 1
        if (!exhausted) decode()
      }
    }

    def skipTo(target: Long): Unit = {
      if (exhausted) return
      if (blocks(bi).maxDoc < target) {
        var lo = bi + 1; var hi = blocks.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (blocks(mid).maxDoc < target) lo = mid + 1 else hi = mid
        }
        bi = lo; pi = 0
        if (exhausted) return
        decode()
      }
      while (pi < blocks(bi).n - 1 && docs(pi) < target) pi += 1
      if (docs(pi) < target) { next(); if (!exhausted) skipTo(target) }
    }
  }

  /** One query term's fielded stream: the DisMax merge of its per-field
   * substreams. curDoc = min over live substreams (a doc matches the term
   * iff ANY field contains it — that is also the msm "matched" notion). */
  private final class FieldedTermStream(subs0: Array[FieldSub],
                                        val mult: Int, tie: Double,
                                        val termKey: org.apache.spark.unsafe.types.UTF8String) {
    private var subs = subs0.filter(!_.exhausted)
    /** (1−tie)·max B + tie·Σ B over per-field global maxima, ×mult. */
    val globalUb: Double = {
      if (subs0.isEmpty) 0d
      else {
        val ubs = subs0.map(_.maxUb)
        ((1d - tie) * ubs.max + tie * ubs.sum) * mult
      }
    }
    def exhausted: Boolean = subs.isEmpty
    def curDoc: Long = {
      var d = Long.MaxValue
      var i = 0
      while (i < subs.length) { if (subs(i).curDoc < d) d = subs(i).curDoc; i += 1 }
      d
    }
    /** DisMax-combined current-block bound over substreams positioned AT d
     * (substreams past d cannot contain it), ×mult. */
    def blockUbAt(d: Long): Double = {
      var mx = 0d; var sm = 0d
      var i = 0
      while (i < subs.length) {
        if (subs(i).curDoc == d) {
          val u = subs(i).blockUb
          if (u > mx) mx = u
          sm += u
        }
        i += 1
      }
      ((1d - tie) * mx + tie * sm) * mult
    }
    /** Exact term contribution at d: (mx + tie·(sm − mx)) · mult over the
     * per-field scores of substreams positioned at d. */
    def scoreAt(d: Long): Double = {
      var mx = Double.NegativeInfinity; var sm = 0d
      var i = 0
      while (i < subs.length) {
        if (subs(i).curDoc == d) {
          val s = subs(i).curScore
          if (s > mx) mx = s
          sm += s
        }
        i += 1
      }
      (mx + tie * (sm - mx)) * mult
    }
    def advancePast(d: Long): Unit = {
      var i = 0
      while (i < subs.length) { if (subs(i).curDoc == d) subs(i).next(); i += 1 }
      subs = subs.filter(!_.exhausted)
    }
    def skipTo(target: Long): Unit = {
      var i = 0
      while (i < subs.length) { if (subs(i).curDoc < target) subs(i).skipTo(target); i += 1 }
      subs = subs.filter(!_.exhausted)
    }
  }

  private final class TopK(k: Int) {
    private val heap = new java.util.PriorityQueue[(Double, Long)](k,
      (a: (Double, Long), b: (Double, Long)) => {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(b._2, a._2)
      })
    def theta: Double = if (heap.size < k) Double.NegativeInfinity else heap.peek()._1
    def offer(score: Double, doc: Long): Unit = {
      if (heap.size < k) heap.add((score, doc))
      else if (score > heap.peek()._1) { heap.poll(); heap.add((score, doc)) }
    }
    def drain(): List[(Double, Long)] = {
      var out = List.empty[(Double, Long)]
      while (!heap.isEmpty) out = heap.poll() :: out
      out
    }
  }

  /** One shard × one query: WAND over fielded term streams with the msm
   * pivot constraint. */
  private def wand(streams0: Array[FieldedTermStream], msm: Int, k: Int,
                   finish: Double => Double): List[(Double, Long)] = {
    val topk = new TopK(k)
    var streams = streams0.filter(!_.exhausted)

    while (streams.length >= msm) {
      java.util.Arrays.sort(streams, (a: FieldedTermStream, b: FieldedTermStream) =>
        java.lang.Long.compare(a.curDoc, b.curDoc))
      val theta = topk.theta
      // pivot: smallest index i ≥ msm−1 whose Σ global-UB prefix exceeds θ
      // (docs before streams(msm−1).curDoc cannot reach msm matches)
      var acc = 0d
      var pivot = -1
      var i = 0
      while (i < streams.length && pivot < 0) {
        acc += streams(i).globalUb
        if (acc > theta && i >= msm - 1) pivot = i
        i += 1
      }
      if (pivot < 0) return topk.drain()

      val pivotDoc = streams(pivot).curDoc
      if (streams(0).curDoc == pivotDoc) {
        // aligned: all streams that can contain pivotDoc sit at it
        var blockAcc = 0d
        var j = 0
        while (j < streams.length && streams(j).curDoc == pivotDoc) {
          blockAcc += streams(j).blockUbAt(pivotDoc); j += 1
        }
        if (j >= msm && blockAcc > theta) {
          // canonical term order (mirrors Fielded.score's ordered per-doc
          // fold) — j ≤ |query terms|, so the copy+sort is trivial
          val ms = java.util.Arrays.copyOfRange(streams, 0, j)
          java.util.Arrays.sort(ms, (a: FieldedTermStream, b: FieldedTermStream) =>
            a.termKey.compareTo(b.termKey))
          var s = 0d
          var m = 0
          while (m < ms.length) { s += ms(m).scoreAt(pivotDoc); m += 1 }
          topk.offer(finish(s), pivotDoc)
        }
        var a = 0
        while (a < j) { streams(a).advancePast(pivotDoc); a += 1 }
      } else {
        var a = 0
        while (a < streams.length && streams(a).curDoc < pivotDoc) {
          streams(a).skipTo(pivotDoc); a += 1
        }
      }
      streams = streams.filter(!_.exhausted)
    }
    topk.drain()
  }

  /**
   * Distributed fielded block-max search — result ≡ [[Fielded.searchIndexed]]
   * (pinned in FieldedSpec) with every corpus-sized read a term-pruned block
   * scan and per-doc work gated by θ and msm.
   *
   * @param rounded half-up round the doc score to this many decimals and
   *   rank on the rounded value (the cross-engine gate discipline);
   *   None = reference float semantics
   */
  def search(idx: FieldedBlocks.FBIndex, topics: Seq[Topic],
             model: Scoring.Model, k: Int,
             boosts: Map[String, Double] = Fielded.DEFAULT_BOOSTS,
             tie: Double = Fielded.DEFAULT_TIE,
             tag: Analyzer.Tag = Analyzer.Tag.NoStem,
             rounded: Option[Int] = None): DataFrame = {
    require(model.ubSafe,
      s"fielded Block-Max WAND is unsound for non-monotone model ${model.name}; " +
        "use Fielded.searchIndexed")
    val spark = idx.blocks.sparkSession
    import spark.implicits._

    val decimals = rounded.getOrElse(-1)
    val finish: Double => Double =
      if (rounded.isEmpty) d => d.toFloat.toDouble
      else d => BigDecimal(d).setScale(decimals, BigDecimal.RoundingMode.HALF_UP).toDouble

    val qterms = Exact.queryTerms(topics, tag) // (qid, term, mult, nTerms)
    val termSet = qterms.map(_._2).distinct
    // bounded driver state: |fields| stat rows, ≤ |query terms|·|fields| dict rows
    val statRows: Map[String, (Long, Long)] = idx.stats
      .select("field", "fN", "fC").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val dictRows: Map[(String, String), (Long, Long)] = idx.dict
      .filter(col("term").isin(termSet: _*))
      .select("field", "term", "df", "cf").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val plan: Map[Int, Seq[(String, Int, Int)]] = qterms
      .groupBy(_._1).view
      .mapValues(ts => ts.map { case (_, term, mult, nTerms) => (term, mult, nTerms) })
      .toMap
    val bPlan = spark.sparkContext.broadcast(plan)
    val bDict = spark.sparkContext.broadcast(dictRows)
    val bStats = spark.sparkContext.broadcast(statRows)

    val candidates = idx.blocks
      .filter(col("term").isin(termSet: _*)) // parquet row-group stats prune
      .groupByKey(_.shard)
      .flatMapGroups { (_, it) =>
        val byTerm: Map[String, Map[String, Array[FieldedBlock]]] =
          it.toArray.groupBy(_.term)
            .view.mapValues(_.groupBy(_.field)
              .view.mapValues(_.sortBy(_.minDoc)).toMap).toMap
        val dict = bDict.value
        val stats = bStats.value
        bPlan.value.iterator.flatMap { case (qid, terms) =>
          val msm = Fielded.minimumShouldMatch(terms.head._3)
          val streams = terms.flatMap { case (term, mult, _) =>
            byTerm.get(term).map { byField =>
              // canonical field order — mirrors Fielded.score's ordered
              // per-term fold (UTF8 binary, same as array_sort)
              val subs = byField.toArray
                .sortWith((a, b) => utf8Key(a._1).compareTo(utf8Key(b._1)) < 0)
                .iterator.flatMap { case (field, blocks) =>
                // a field absent from boosts scores 0 but still counts for
                // msm and joins the DisMax group — mirror Fielded.score's
                // boostCol otherwise(0.0)
                val boost = boosts.getOrElse(field, 0d)
                dict.get((field, term)).map { case (df, cf) =>
                  val (fN, fC) = stats(field)
                  val avgdl = fC.toDouble / fN.toDouble
                  // float boundary BEFORE the boost scale, both gate modes
                  // (Fielded.score: boostCol * expr.cast(float).cast(double))
                  val sAt: (Long, Long) => Double = (tf, dl) =>
                    boost * model.score(tf.toDouble, dl, avgdl, 1.0,
                      df.toDouble, cf.toDouble, fN.toDouble, fC.toDouble).toFloat.toDouble
                  val ub: FieldedBlock => Double =
                    b => math.max(0d, sAt(b.maxTf, b.minDocLen))
                  new FieldSub(blocks, sAt, ub)
                }
              }.toArray
              new FieldedTermStream(subs, mult, tie, utf8Key(term))
            }
          }.toArray
          if (streams.length < msm || streams.isEmpty) Iterator.empty
          else wand(streams, msm, k, finish).iterator
            .map { case (score, doc) => (qid, doc, score) }
        }
      }
      .toDF("qid", "docIdNum", "score")

    val scoreCol = if (rounded.isEmpty) col("score").cast("float") else col("score")
    // docIdNum ascending ≡ docId-string ascending (fdocs numbering order) —
    // the window reproduces Fielded.score's (score desc, docId asc) exactly
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("docIdNum").asc)
    candidates
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .join(idx.fdocs, "docIdNum")
      .select(col("qid"), col("docId"), col("rank"), scoreCol.as("score"))
  }
}
