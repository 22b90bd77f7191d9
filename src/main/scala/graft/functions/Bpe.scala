package graft.functions

import scala.collection.mutable

/** Byte-pair encoding (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") — real subword
  * tokenization for the token-budget operators, replacing the
  * whitespace/regex token-count approximations.
  *
  * The kernel is deliberately split in two so the scale story is
  * explicit:
  *
  *   - [[train]] runs ON THE DRIVER over a bounded word-frequency
  *     table (the caller collects the top-V vocabulary from a
  *     distributed count — tokenizer training on a frequency-capped
  *     sample is the standard production shape; the merges the tail
  *     would add are exactly the merges that never fire). Work is
  *     O(V · avgWordLen · numMerges), independent of corpus size.
  *   - [[encodeCount]] / [[countTokens]] are per-row scalar kernels
  *     applied distributed via the native
  *     [[graft.expressions.BpeTokenCount]] expression — the merges
  *     table rides along as a small foldable literal (≤ a few KB).
  *
  * Determinism contract (both the oracle replay and cross-run
  * stability depend on it):
  *   - training picks the (count, pair) maximum with ties broken by
  *     lexicographically smallest pair;
  *   - merge application rewrites all non-overlapping occurrences
  *     LEFT-TO-RIGHT ("aaa" + merge (a,a) → ["aa","a"]) — the same
  *     single definition [[mergePair]] is used by training and
  *     encoding so the two cannot drift;
  *   - encoding applies the present pair with the LOWEST merge rank
  *     first (GPT-2-style priority encode).
  */
object Bpe {

  /** Rewrite all non-overlapping (a, b) adjacencies to the merged
    * symbol, scanning left to right. Shared by train + encode.
    */
  def mergePair(syms: Array[String], a: String, b: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Train `numMerges` merges over a word-frequency table. Stops early
    * when no adjacent pair occurs with weighted count ≥ 2 (merging a
    * count-1 pair memorizes a single word). Returns merges in rank
    * order as "left right" strings (symbols never contain whitespace —
    * words are whitespace-split upstream).
    */
  def train(wordFreq: Seq[(String, Long)], numMerges: Int): IndexedSeq[String] = {
    // deterministic iteration order regardless of caller's map/sort
    var seqs: Array[(Array[String], Long)] = wordFreq
      .filter(_._1.nonEmpty)
      .sortBy(_._1)
      .map { case (w, f) => (w.map(_.toString).toArray, f) }
      .toArray
    val merges = IndexedSeq.newBuilder[String]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      seqs.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // max count; ties -> lexicographically smallest pair
        val ((a, b), c) = counts.minBy { case ((x, y), n) => (-n, x, y) }
        if (c < 2) done = true
        else {
          merges += s"$a $b"
          seqs = seqs.map { case (syms, f) => (mergePair(syms, a, b), f) }
        }
      }
      m += 1
    }
    merges.result()
  }

  /** Rank lookup table from the ordered merge list ("left right" →
    * rank). Values are BOXED Integers on purpose: a primitive-Int map
    * unboxes a missing key to 0 in Scala, silently aliasing "absent"
    * with "rank 0" — the null sentinel must survive.
    */
  def buildRanks(merges: Seq[String]): java.util.HashMap[String, Integer] = {
    val ranks = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case (p, r) => ranks.put(p, Int.box(r)) }
    ranks
  }

  /** BPE token count of ONE word: start from characters, repeatedly
    * apply the present merge with the lowest rank, count the surviving
    * symbols. Empty word → 0.
    */
  def encodeCount(word: String, ranks: java.util.HashMap[String, Integer]): Int = {
    if (word.isEmpty) return 0
    var syms: Array[String] = {
      val a = new Array[String](word.length)
      var i = 0
      while (i < word.length) { a(i) = word.charAt(i).toString; i += 1 }
      a
    }
    var merging = true
    while (merging && syms.length >= 2) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i + 1 < syms.length) {
        val r: Integer = ranks.get(syms(i) + " " + syms(i + 1))
        if (r ne null) {
          val rv = r.intValue()
          if (rv < bestRank) { bestRank = rv; bestIdx = i }
        }
        i += 1
      }
      if (bestIdx < 0) merging = false
      else syms = mergePair(syms, syms(bestIdx), syms(bestIdx + 1))
    }
    syms.length
  }

  /** Word-level memo bound: vocabularies repeat heavily, so encode
    * results are cached per expression instance (per task) up to this
    * many distinct words; past the bound new words encode uncached
    * rather than growing the map.
    */
  val maxCachedWords: Int = 1 << 16

  /** BPE token count of a whole document: whitespace-split (the same
    * lower/trim/split semantics as TextFunctions.tokens and the DuckDB
    * oracle's regexp_split_to_array), each word encoded, counts
    * summed. `cache` memoizes per-word counts (see [[maxCachedWords]]).
    */
  def countTokens(text: String, ranks: java.util.HashMap[String, Integer],
                  cache: java.util.HashMap[String, Integer]): Int = {
    // TextFunctions.tokensLocal, NOT java String.trim: Java trim strips
    // every char <= 0x20 (so a word of control chars vanishes at text
    // edges), while Spark's trim — which the oracle's word table and
    // TextFunctions.tokens replicate — strips ASCII spaces only. The
    // full-text count must equal the sum of the per-word replay counts.
    val words = graft.functions.TextFunctions.tokensLocal(text)
    var total = 0
    var i = 0
    while (i < words.length) {
      val w = words(i)
      val cached: Integer = cache.get(w)
      if (cached ne null) total += cached.intValue()
      else {
        val n = encodeCount(w, ranks)
        if (cache.size < maxCachedWords) cache.put(w, Int.box(n))
        total += n
      }
      i += 1
    }
    total
  }
}
