package graft.index

import graft.analysis.Analyzer

/**
 * Zero-allocation-per-token document inversion for the NoStem chain.
 *
 * The naive path allocates one String per token plus a boxed counter per
 * distinct term — at 10^9 documents that allocation rate makes GC ~50% of
 * task time (measured). This counter:
 *
 *  - tokenizes via [[Analyzer.foreachTokenRange]] (the same single
 *    word-break implementation as the reference API — identical tokens by
 *    construction);
 *  - hashes/compares token ranges codepoint-lowercased IN PLACE;
 *  - interns each distinct term once per task lifetime (open-addressed
 *    pool), so steady-state documents allocate nothing per token;
 *  - counts per-doc tfs in an epoch-stamped open table (no per-doc clear).
 *
 * One instance per task; not thread-safe.
 */
final class TokenCounter(initialPoolBits: Int = 12, initialDocBits: Int = 10) {

  // ---- intern pool (task lifetime) ----
  private var poolMask = (1 << initialPoolBits) - 1
  private var pool = new Array[String](poolMask + 1)
  private var poolHash = new Array[Int](poolMask + 1)
  private var poolSize = 0

  // ---- per-doc tf table (epoch-stamped; no clearing) ----
  private var docMask = (1 << initialDocBits) - 1
  private var keys = new Array[String](docMask + 1)
  private var cnts = new Array[Long](docMask + 1)
  private var stamp = new Array[Int](docMask + 1)
  private var touched = new Array[Int](docMask + 1)
  private var nTouched = 0
  private var epoch = 0

  private def hashRange(text: String, s: Int, e: Int): Int = {
    var h = 0
    var i = s
    while (i < e) {
      val cp = Character.toLowerCase(text.codePointAt(i))
      h = h * 31 + cp
      i += Character.charCount(cp)
    }
    h
  }

  private def eqRange(text: String, s: Int, e: Int, t: String): Boolean = {
    var i = s
    var j = 0
    val tn = t.length
    while (i < e && j < tn) {
      val cp = Character.toLowerCase(text.codePointAt(i))
      val tc = t.codePointAt(j)
      if (cp != tc) return false
      i += Character.charCount(cp)
      j += Character.charCount(tc)
    }
    i == e && j == tn
  }

  private def growPool(): Unit = {
    val oldPool = pool; val oldHash = poolHash
    poolMask = poolMask * 2 + 1
    pool = new Array[String](poolMask + 1)
    poolHash = new Array[Int](poolMask + 1)
    var i = 0
    while (i < oldPool.length) {
      val s = oldPool(i)
      if (s != null) {
        var slot = oldHash(i) & poolMask
        while (pool(slot) != null) slot = (slot + 1) & poolMask
        pool(slot) = s; poolHash(slot) = oldHash(i)
      }
      i += 1
    }
  }

  private def intern(text: String, s: Int, e: Int, h: Int): String = {
    var slot = h & poolMask
    while (true) {
      val cur = pool(slot)
      if (cur == null) {
        val t = Analyzer.lowercased(text, s, e)
        pool(slot) = t; poolHash(slot) = h
        poolSize += 1
        if (poolSize * 10 > (poolMask + 1) * 7) growPool()
        return t
      }
      if (poolHash(slot) == h && eqRange(text, s, e, cur)) return cur
      slot = (slot + 1) & poolMask
    }
    null // unreachable
  }

  private def growDoc(): Unit = {
    val oldKeys = keys; val oldCnts = cnts; val oldTouched = touched; val n = nTouched
    docMask = docMask * 2 + 1
    keys = new Array[String](docMask + 1)
    cnts = new Array[Long](docMask + 1)
    stamp = new Array[Int](docMask + 1)
    touched = new Array[Int](docMask + 1)
    nTouched = 0
    var i = 0
    while (i < n) {
      val oldSlot = oldTouched(i)
      addTerm(oldKeys(oldSlot), oldCnts(oldSlot))
      i += 1
    }
  }

  private def addTerm(term: String, by: Long): Unit = {
    var slot = term.hashCode & docMask
    while (true) {
      if (stamp(slot) != epoch || keys(slot) == null) {
        keys(slot) = term; cnts(slot) = by; stamp(slot) = epoch
        touched(nTouched) = slot; nTouched += 1
        if (nTouched * 10 > (docMask + 1) * 7) growDoc()
        return
      }
      if (keys(slot) eq term) { cnts(slot) += by; return }
      slot = (slot + 1) & docMask
    }
  }

  /** Invert one document: returns its docLen (analyzed token count);
   * per-term tfs then available via [[foreachTf]] until the next call. */
  def countDoc(text: String): Long = {
    epoch += 1
    nTouched = 0
    var total = 0L
    Analyzer.foreachTokenRange(text) { (s, e) =>
      total += 1
      val h = hashRange(text, s, e)
      addTerm(intern(text, s, e, h), 1L)
    }
    total
  }

  /** Iterate the current document's (interned term, tf) pairs. */
  def foreachTf(f: (String, Long) => Unit): Unit = {
    var i = 0
    while (i < nTouched) {
      val slot = touched(i)
      f(keys(slot), cnts(slot))
      i += 1
    }
  }

  def distinctTerms: Int = nTouched
}
