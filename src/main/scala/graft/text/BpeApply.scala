package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftshim.SqlShims.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Vocab-scale BPE APPLICATION (r6 verdict item 2): greedy
  * merge-priority segmentation against a broadcast merge-ranks map,
  * replacing the chained-replace apply (q112's
  * [[TextAnalysis.bpePieceCount]] — |merges| codegen'd `replace`
  * expressions per word, unusable at a real 32k-merge vocabulary).
  *
  * Algorithm (Sennrich et al. ACL'16 `encode`, the shape every
  * production BPE tokenizer applies): start from the word's code-point
  * symbols; repeatedly find the adjacent pair with the LOWEST merge
  * rank present in the table and rewrite ALL its (non-overlapping,
  * left-to-right) occurrences; stop when no adjacent pair is in the
  * table. Per-word cost is O(len² · map-lookup) worst case —
  * INDEPENDENT of |merges| (the r6 "runtime flat in |merges|"
  * criterion): the table is a hash map the loop queries, never a list
  * it iterates. For a well-formed merge table (every pair's symbols
  * are single characters or outputs of lower-ranked merges — true of
  * any table BPE training can emit), this is provably equivalent to
  * applying the merges one rank at a time in order, which is what
  * BpeApplySpec fuzzes against an independent sequential reference.
  *
  * Self-pairs (a == b) are rejected at construction: their
  * simultaneous rewrite is parity-dependent and has no clean
  * relational form, so the DuckDB oracle could not replay them
  * (same restriction, same reason as [[BpeLearn]]).
  *
  * Scale shape: ONE expression per document — tokenize, segment,
  * account — no HOFs, no joins, no shuffle; 100 TB of BPE accounting
  * is exactly one scan. A per-JVM concurrent word→pieces cache
  * exploits the Zipf distribution (each distinct word segments once
  * per executor, not once per occurrence). The merge table rides into
  * codegen as a reference object (constant-folded into the generated
  * projection), exactly how a learned 32k-merge vocabulary would ship.
  */
object BpeApply {

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  /** Deterministic 1,100-entry merge table (the "≥1k merges" scale
    * fixture, reproducible in any engine from its construction): all
    * 650 distinct-letter pairs (a–z × a–z, a ≠ b) ranked by
    * md5("bm:a:b"), then 450 trigram extensions (top-150 letter pairs
    * by that same order × a–z) ranked by md5 again. Well-formed by
    * construction: every trigram merge's left symbol is produced by a
    * LOWER-ranked letter merge, so greedy-min-rank == sequential
    * rank-order application. The q131 oracle inlines the identical
    * table as a MAP literal.
    */
  lazy val mergeTable1k: Seq[(String, String)] = {
    val letters = ('a' to 'z').map(_.toString)
    val p2 = (for { a <- letters; b <- letters if a != b } yield (a, b))
      .sortBy { case (a, b) => md5hex(s"bm:$a:$b") }
    val p3 = (for { (a, b) <- p2.take(150); c <- letters }
        yield (a + b, c))
      .sortBy { case (a, b) => md5hex(s"bm:$a:$b") }
    p2 ++ p3.take(450)
  }

  /** struct(n_tokens, n_pieces, n_chars) per document under `merges`
    * (default: the 1,100-entry scale table). Characters and lengths
    * are CODE POINTS (DuckDB `length`/`substr` semantics — identical
    * to UTF-16 counts for all BMP text).
    */
  def segmentStats(text: Column,
                   merges: Seq[(String, String)] = mergeTable1k): Column =
    toColumn(BpeSegmentStats(toExpression(text), merges))

  case class BpeSegmentStats(child: Expression,
                             merges: Seq[(String, String)])
      extends UnaryExpression {
    require(merges.nonEmpty, "bpeSegmentStats: merges must be non-empty")
    require(merges.forall { case (a, b) => a != b },
      "bpeSegmentStats: self-pairs (a == b) are parity-dependent and " +
        "not relationally replayable — excluded, as in BpeLearn")
    require(merges.map(p => (p._1, p._2)).distinct.size == merges.size,
      "bpeSegmentStats: duplicate pairs would make ranks ambiguous")

    override def dataType: DataType = StructType(Seq(
      StructField("n_tokens", LongType, nullable = false),
      StructField("n_pieces", LongType, nullable = false),
      StructField("n_chars", LongType, nullable = false)))
    override def nullable: Boolean = false

    /** pair-key → rank; key = a + " " + b (symbols are
      * whitespace-split so never contain a space themselves).
      */
    @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](merges.size * 2)
      merges.zipWithIndex.foreach { case ((a, b), r) =>
        m.put(a + " " + b, Integer.valueOf(r))
      }
      m
    }
    @transient private lazy val pairByRank: Array[(String, String)] =
      merges.toArray

    /** word → piece count, shared across tasks in the executor (the
      * vocabulary is Zipf — the cache turns per-occurrence work into
      * per-distinct-word work). Bounded: stops admitting past 1M
      * entries (a real vocab is far smaller).
      */
    @transient private lazy val cache =
      new java.util.concurrent.ConcurrentHashMap[String, Integer]()

    private def segmentCount(word: String): Int = {
      val hit = cache.get(word)
      if (hit != null) return hit.intValue()
      // symbols by code point (DuckDB substr semantics)
      var syms = {
        val buf = new scala.collection.mutable.ArrayBuffer[String](
          word.length)
        var i = 0
        while (i < word.length) {
          val cp = word.codePointAt(i)
          val n = Character.charCount(cp)
          buf += word.substring(i, i + n)
          i += n
        }
        buf
      }
      var done = syms.length < 2
      while (!done) {
        var best = Int.MaxValue
        var i = 0
        while (i < syms.length - 1) {
          val r = ranks.get(syms(i) + " " + syms(i + 1))
          if (r != null && r.intValue() < best) best = r.intValue()
          i += 1
        }
        if (best == Int.MaxValue) done = true
        else {
          val (a, b) = pairByRank(best)
          val out = new scala.collection.mutable.ArrayBuffer[String](
            syms.length)
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
              out += a + b; j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out
          if (syms.length < 2) done = true
        }
      }
      if (cache.size < (1 << 20))
        cache.put(word, Integer.valueOf(syms.length))
      syms.length
    }

    /** Shared by interpreted eval and codegen: one pass over the text
      * splitting on Java-regex `\s` whitespace (the exact class
      * `TextAnalysis.tokens`' split("\\s+") matches), segmenting each
      * word, accounting tokens/pieces/code-points.
      */
    def statsOf(u: UTF8String): InternalRow = {
      val s = if (u == null) "" else u.toString
      var nTokens = 0L; var nPieces = 0L; var nChars = 0L
      var i = 0
      val n = s.length
      while (i < n) {
        val c = s.charAt(i)
        if (c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
            c == '\f' || c == '\r') { i += 1 }
        else {
          var j = i
          while (j < n && { val d = s.charAt(j)
            !(d == ' ' || d == '\t' || d == '\n' || d == '\u000B' ||
              d == '\f' || d == '\r') }) j += 1
          val w = s.substring(i, j)
          nTokens += 1L
          nChars += w.codePointCount(0, w.length).toLong
          nPieces += segmentCount(w).toLong
          i = j
        }
      }
      InternalRow(nTokens, nPieces, nChars)
    }

    override def eval(input: InternalRow): Any =
      statsOf(child.eval(input).asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bpeSegmentStats", this,
        getClass.getName)
      val childGen = child.genCode(ctx)
      val code = code"""
        ${childGen.code}
        InternalRow ${ev.value} = $ref.statsOf(
          ${childGen.isNull} ? null : ${childGen.value});
      """
      ev.copy(code = code, isNull =
        org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }
}
