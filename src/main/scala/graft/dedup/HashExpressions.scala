package graft.dedup

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.SqlShims.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the document-hashing hot path.
  *
  * The pure-column formulations (nested `transform`/`aggregate` HOFs)
  * are semantically right but evaluate interpreted at ~8ms/document —
  * unusable across billions of documents. These expressions compute
  * the SAME values (byte-identical md5-hex based signatures, so the
  * DuckDB oracles and any persisted signatures stay valid) in tight
  * JVM loops with a reused MessageDigest: ~100× faster.
  *
  * CodegenFallback is deliberate: the per-row work dwarfs the single
  * virtual call, and it keeps the surrounding stage codegen'd.
  */
object HashExpressions {

  private val hexChars = "0123456789abcdef".toCharArray

  private def md5Hex(md: MessageDigest, s: String): String = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  private def tokenize(text: String): Array[String] =
    text.split("\\s+").filter(_.nonEmpty)

  /** MinHash signature over word shingles: for seed i in [0, k),
    * `sig(i) = min over distinct shingles of md5(i + ":" + shingle)`
    * (lexicographic min of the lowercase hex == numeric min).
    * Shingles are `shingleSize`-grams of whitespace tokens joined by a
    * single space; documents shorter than `shingleSize` tokens
    * contribute the whole token sequence as one shingle.
    * Matches `Dedup.minhashSignature`'s column formulation exactly.
    */
  case class MinHashSignature(child: Expression, k: Int, shingleSize: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, false)

    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String].toString
      val toks = tokenize(text)
      val shingles: Iterator[String] =
        if (toks.length >= shingleSize)
          toks.sliding(shingleSize).map(_.mkString(" ")).toSet.iterator
        else Iterator.single(toks.mkString(" "))
      val md = MessageDigest.getInstance("MD5")
      val mins = new Array[String](k)
      shingles.foreach { s =>
        var i = 0
        while (i < k) {
          val h = md5Hex(md, i.toString + ":" + s)
          if (mins(i) == null || h.compareTo(mins(i)) < 0) mins(i) = h
          i += 1
        }
      }
      new GenericArrayData(
        mins.map(m => UTF8String.fromString(m): Any))
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** 64-bit SimHash as a 16-hex-char string. Per (non-distinct) token:
    * the first 16 hex chars of md5(token) give 64 bits; each bit votes
    * +1/-1; final bit j = (vote_j > 0). Matches `Dedup.simhash`'s
    * column formulation exactly.
    */
  case class SimHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType

    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String].toString
      val toks = tokenize(text)
      val md = MessageDigest.getInstance("MD5")
      val votes = new Array[Int](64)
      toks.foreach { t =>
        md.reset()
        val d = md.digest(
          t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var j = 0
        while (j < 64) {
          // bit j lives in digest byte j/8, from the high bit down —
          // identical to reading nibble hex chars left to right
          val bit = (d(j / 8) >> (7 - j % 8)) & 1
          votes(j) += (if (bit == 1) 1 else -1)
          j += 1
        }
      }
      val out = new Array[Char](16)
      var n = 0
      while (n < 16) {
        var nib = 0
        var b = 0
        while (b < 4) {
          if (votes(n * 4 + b) > 0) nib |= 1 << (3 - b)
          b += 1
        }
        out(n) = hexChars(nib)
        n += 1
      }
      UTF8String.fromString(new String(out))
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** md5 hex of each DISTINCT word shingle, in first-occurrence
    * order — one native pass (tokenize → slide → hash → dedupe)
    * replacing the interpreted `md5(explode(array_distinct(
    * shingles(...))))` chain, which dominated the contamination
    * probe's cost. Shingle semantics match `TextAnalysis.shingles` /
    * [[MinHashSignature]]: documents shorter than `shingleSize`
    * tokens contribute the whole token sequence as one shingle.
    * Downstream consumers only count/join the hashes, so element
    * order is immaterial — but first-occurrence keeps it
    * deterministic anyway.
    */
  case class DistinctShingleHashes(child: Expression, shingleSize: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, false)

    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String].toString
      val toks = tokenize(text)
      val shingles: Iterator[String] =
        if (toks.length >= shingleSize)
          toks.sliding(shingleSize).map(_.mkString(" "))
        else Iterator.single(toks.mkString(" "))
      val md = MessageDigest.getInstance("MD5")
      val seen = new java.util.LinkedHashSet[String]()
      shingles.foreach(s => seen.add(s))
      val out = new Array[Any](seen.size)
      var i = 0
      val it = seen.iterator()
      while (it.hasNext) {
        out(i) = UTF8String.fromString(md5Hex(md, it.next()))
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** md5 hex of EVERY word shingle in position order (duplicates
    * kept) — the positional sibling of [[DistinctShingleHashes]] for
    * span work: `posexplode` over the result gives the 0-based
    * shingle position the contamination-run decomposition needs.
    * Replaces the `posexplode(shingles(text))` + `md5` chain whose
    * `transform(sequence, i => slice(tokens, i, n))` HOF re-evaluates
    * the full tokenize per element (O(tokens²) per document,
    * interpreted). Shingle semantics match [[DistinctShingleHashes]]:
    * documents shorter than `shingleSize` tokens contribute the whole
    * token sequence as one shingle.
    */
  case class PositionalShingleHashes(child: Expression, shingleSize: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, false)

    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String].toString
      val toks = tokenize(text)
      val md = MessageDigest.getInstance("MD5")
      val shingles: Iterator[String] =
        if (toks.length >= shingleSize)
          toks.sliding(shingleSize).map(_.mkString(" "))
        else Iterator.single(toks.mkString(" "))
      val out = shingles
        .map(s => UTF8String.fromString(md5Hex(md, s)): Any).toArray
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  def minhashSignature(text: Column, k: Int = 16,
                       shingleSize: Int = 3): Column =
    toColumn(MinHashSignature(toExpression(text), k, shingleSize))

  def distinctShingleHashes(text: Column, shingleSize: Int = 3): Column =
    toColumn(DistinctShingleHashes(toExpression(text), shingleSize))

  def positionalShingleHashes(text: Column,
                              shingleSize: Int = 3): Column =
    toColumn(PositionalShingleHashes(toExpression(text), shingleSize))

  def simhash(text: Column): Column =
    toColumn(SimHash64(toExpression(text)))
}
