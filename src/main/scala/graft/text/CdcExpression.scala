package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.SqlShims.{toColumn, toExpression, AbstractType}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (the rsync/LBFS boundary discipline —
  * Muthitacharoen et al., "A Low-bandwidth Network File System",
  * SOSP'01) as a native single-pass expression.
  *
  * Fixed-size chunking breaks under insertion: one added word shifts
  * every later chunk boundary, so nothing downstream dedups. CDC cuts
  * where a rolling hash of the trailing `w` code points hits a
  * residue (`h mod div == 0`), so boundaries re-synchronize right
  * after an edit and all untouched chunks keep their fingerprints —
  * the primitive behind storage dedup and shift-tolerant corpus
  * chunk-level dedup (this repo's q91 dedups on FIXED token windows;
  * CDC is the edit-stable alternative).
  *
  * Portability contract (the md5-portable discipline): the hash is a
  * polynomial over Unicode CODE POINTS — `h_i = Σ cp_j · B^(i-j) mod
  * M` over the last `w` points — with B = 257, M = 1_000_000_007.
  * Both engines see the same code-point sequence (DuckDB `ord` /
  * 1-based `substr` count points, not UTF-16 units), and every
  * intermediate product fits a signed 64-bit integer
  * (cp < 2^21, B·M < 2.6e11), so the oracle reproduces each boundary
  * exactly with an O(n·w) window sum while this expression keeps the
  * true O(n) roll (subtract the outgoing point's `B^w` term). A
  * document shorter than `w` is one chunk; the tail after the last
  * cut is always emitted.
  */
object CdcExpression {

  val B = 257L
  val M = 1000000007L

  case class CdcChunks(child: Expression, w: Int, div: Long)
      extends UnaryExpression with CodegenFallback
      with ImplicitCastInputTypes {
    require(w > 0, s"cdc: window w=$w must be > 0")
    require(div > 0, s"cdc: divisor=$div must be > 0")

    // analysis-time typing (r5 advice discipline): a non-string child
    // fails analysis, not execution
    override def inputTypes: Seq[AbstractType] = Seq(StringType)

    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)

    // B^w mod M, for evicting the outgoing code point in O(1)
    private val powW: Long = {
      var p = 1L
      var i = 0
      while (i < w) { p = p * B % M; i += 1 }
      p
    }

    override def nullSafeEval(input: Any): Any = {
      val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
      val n = cps.length
      val chunks = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
      var start = 0
      var h = 0L
      var i = 0
      while (i < n) {
        h = (h * B + cps(i)) % M
        if (i >= w) h = ((h - cps(i - w) * powW) % M + M) % M
        // the window rolls CONTINUOUSLY across cuts (classic CDC):
        // a boundary is a pure function of the trailing w points, so
        // an edit re-synchronizes once w untouched points pass
        if (i >= w - 1 && h % div == 0) {
          chunks += UTF8String.fromString(
            new String(cps, start, i + 1 - start))
          start = i + 1
        }
        i += 1
      }
      if (start < n || n == 0)
        chunks += UTF8String.fromString(new String(cps, start, n - start))
      new GenericArrayData(chunks.toArray[Any])
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
    override def prettyName: String = "cdc_chunks"
  }

  def cdcChunks(text: Column, w: Int = 16, div: Long = 64L): Column =
    toColumn(CdcChunks(toExpression(text), w, div))
}
