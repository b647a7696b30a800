package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.SqlShims.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (Schleimer et al., SIGMOD'03) as a native
  * single-pass expression.
  *
  * The HOF composition (`transform` over grams nested inside
  * `transform` over windows) is QUADRATIC when interpreted: a lambda
  * body captures the whole upstream expression tree, so the window
  * pass re-evaluates all ~n gram md5s per window element — O(n²) md5
  * calls per document (observed: a 300-char doc costs ~100 ms+, and a
  * 5000-doc verify leg ran for 10+ minutes in one task). Higher-order
  * functions never enter codegen, so no CSE saves it. This expression
  * computes each gram hash ONCE, takes rolling window minima in
  * O(n·w), and dedups/sorts — sub-millisecond per document, same
  * result.
  *
  * Semantics are identical to the column formulation and the DuckDB
  * oracle:
  *   - normalize: `lower(trim(regexp_replace(text, '\s+', ' ')))`
  *     (all whitespace runs become single spaces first, so plain
  *     space-trim afterwards equals both engines' trim);
  *   - grams: md5 hex of every k-CODE-POINT substring (both engines
  *     index substrings by code point, not UTF-16 unit); a document
  *     shorter than k contributes `md5(whole)`;
  *   - windows: lexicographic min of each w-gram window (fewer than w
  *     grams → one global min);
  *   - output: distinct mins, ascending — ASCII hex, so byte order =
  *     lexicographic order in both engines.
  */
object WinnowingExpression {

  private val HEX = "0123456789abcdef".toCharArray

  private def md5Hex(md: java.security.MessageDigest, s: String): String = {
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  case class WinnowingFingerprints(child: Expression, k: Int, w: Int)
      extends UnaryExpression with CodegenFallback {
    require(k > 0 && w > 0,
      s"winnowing: k=$k and w=$w must be > 0")
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)

    override def nullSafeEval(input: Any): Any = {
      val raw = input.asInstanceOf[UTF8String].toString
      val norm = UTF8String.fromString(
        raw.replaceAll("\\s+", " ").trim).toLowerCase.toString
      val md = java.security.MessageDigest.getInstance("MD5")
      // code points, not chars: Spark's substr/length and DuckDB's
      // substr both count points; surrogate pairs must not split
      val cps = norm.codePoints().toArray
      val n = cps.length
      val grams: Array[String] =
        if (n >= k) Array.tabulate(n - k + 1)(i =>
          md5Hex(md, new String(cps, i, k)))
        else Array(md5Hex(md, norm))
      val mins =
        if (grams.length >= w) Array.tabulate(grams.length - w + 1) { i =>
          var m = grams(i)
          var j = i + 1
          while (j < i + w) {
            if (grams(j).compareTo(m) < 0) m = grams(j)
            j += 1
          }
          m
        }
        else Array(grams.min)
      val distinct = new java.util.TreeSet[String]()
      mins.foreach(distinct.add)
      val out = new Array[Any](distinct.size)
      var i = 0
      val it = distinct.iterator()
      while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  def winnowingFingerprints(text: Column, k: Int, w: Int): Column =
    toColumn(WinnowingFingerprints(toExpression(text), k, w))
}
