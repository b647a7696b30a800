package graft.text

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftshim.SqlShims.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-trigram-profile language ID (Cavnar & Trenkle 1994,
  * "N-Gram-Based Text Categorization" — the standard pre-fastText
  * approach): cosine similarity between the document's trigram count
  * vector and fixed per-language trigram profiles.
  *
  * This replaces the r3-r5 marker-WORD vote (r5 verdict item 3): a
  * handful of function words per language identified the synthetic
  * corpus but misroutes real text the moment no marker appears as a
  * standalone word — German compounds ("schneller verstehen"), French
  * plurals ("les enfants"), anything short. Character n-grams fire on
  * EVERY substring, so inflected/compound/short text still scores.
  *
  * Engine-portability is by construction, not by luck:
  *   - profile weights are INTEGERS (rank-descending), so the dot
  *     product `Σ count·w` and both norms `Σ count²`, `Σ w²` are
  *     exact integer arithmetic in any engine, order-free;
  *   - the ONLY float math is one `dot / sqrt(n2_doc · n2_lang)`
  *     from those exact integers — IEEE multiply/sqrt/divide are
  *     correctly rounded, so both engines produce the identical
  *     double — rounded to 6 dp with [[graft.functions.PortableRound]]
  *     semantics before the argmax, the same discipline every scored
  *     query uses;
  *   - trigrams are drawn from `' ' || lower(text) || ' '` (padding
  *     marks word boundaries, e.g. `" th"` vs `"the"` vs `"he "`),
  *     counted over ALL overlapping length-3 windows; the DuckDB
  *     oracle twin is a fully relational generate_series → substr →
  *     GROUP BY → profile-VALUES join, no per-trigram replace chain.
  *   - ties: strict `>` argmax keeps the FIRST language in profile
  *     order; `und` when every score is 0 (no profile trigram hit or
  *     no trigrams at all).
  *
  * Trigram windows index UTF-16 code units on the Spark side and code
  * points in DuckDB — identical for all BMP text; astral-plane
  * corpora would need a codePoint walk (documented, not hit by any
  * oracle fixture).
  *
  * Scale shape: per-row, one lowercase allocation + one bounded count
  * map, no shuffle — langID over 100 TB is exactly one scan.
  */
object LangIdExpression {

  /** Pack a trigram's 3 UTF-16 code units into one Long (16 bits
    * each) — count-map keys without per-window String allocation.
    */
  @inline private def pack(c0: Char, c1: Char, c2: Char): Long =
    (c0.toLong << 32) | (c1.toLong << 16) | c2.toLong

  case class LangIdNgram(child: Expression,
                         profiles: Seq[(String, Seq[(String, Int)])])
      extends UnaryExpression {
    require(profiles.nonEmpty, "langId: profiles must be non-empty")
    require(profiles.forall(_._2.forall(_._1.length == 3)),
      "langId: profile n-grams must be trigrams")

    override def dataType: DataType = StringType
    override def nullable: Boolean = false

    @transient private lazy val langs: Array[UTF8String] =
      profiles.map(p => UTF8String.fromString(p._1)).toArray
    @transient private lazy val profKeys: Array[Array[Long]] =
      profiles.map(_._2.map { case (t, _) =>
        pack(t.charAt(0), t.charAt(1), t.charAt(2))
      }.toArray).toArray
    @transient private lazy val profWeights: Array[Array[Long]] =
      profiles.map(_._2.map(_._2.toLong).toArray).toArray
    @transient private lazy val profNorm2: Array[Double] =
      profiles.map(_._2.map(w => w._2.toDouble * w._2).sum).toArray
    private val und = UTF8String.fromString("und")

    /** Shared by interpreted eval and codegen (referenced via
      * `ctx.addReferenceObj`, so the count map machinery stays inside
      * the generated projection's whole-stage span).
      */
    def idOf(u: UTF8String): UTF8String = {
      val s = u.toLowerCase.toString
      val p = " " + s + " "
      val last = p.length - 3
      if (last < 0) return und
      val counts = new mutable.LongMap[Long](64)
      var i = 0
      while (i <= last) {
        val k = pack(p.charAt(i), p.charAt(i + 1), p.charAt(i + 2))
        counts.put(k, counts.getOrElse(k, 0L) + 1L)
        i += 1
      }
      var n2doc = 0L
      counts.foreachValue(v => n2doc += v * v)
      var best = 0.0
      var bestIdx = -1
      var l = 0
      while (l < profKeys.length) {
        val ks = profKeys(l); val ws = profWeights(l)
        var dot = 0L
        var j = 0
        while (j < ks.length) {
          dot += counts.getOrElse(ks(j), 0L) * ws(j)
          j += 1
        }
        if (dot > 0L) {
          val score = graft.functions.PortableRound.proundScala(
            dot.toDouble / math.sqrt(n2doc.toDouble * profNorm2(l)), 6)
          // strict > keeps the FIRST language on ties — profile order,
          // same as the oracle's CASE chain
          if (score > best) { best = score; bestIdx = l }
        }
        l += 1
      }
      if (bestIdx < 0) und else langs(bestIdx)
    }

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) und else idOf(v.asInstanceOf[UTF8String])
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("langIdNgram", this, getClass.getName)
      val childGen = child.genCode(ctx)
      val code = code"""
        ${childGen.code}
        UTF8String ${ev.value} = ${childGen.isNull}
          ? $ref.undLiteral()
          : $ref.idOf(${childGen.value});
      """
      ev.copy(code = code, isNull =
        org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
    }

    /** codegen helper for the null-text branch */
    def undLiteral(): UTF8String = und

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  def langId(text: Column,
             profiles: Seq[(String, Seq[(String, Int)])]): Column =
    toColumn(LangIdNgram(toExpression(text), profiles))
}
