package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`)
  * is interpreted per element with closure dispatch and allocates an
  * intermediate array per row — fine for one pass over a table,
  * hopeless inside an all-pairs or bucket-join loop. These expressions
  * are tight codegen'd loops over the unsafe array data with the same
  * accumulation order as the HOF fold (elements widened to double,
  * sequential left-to-right — bit-identical to the DuckDB oracle's
  * list_sum on the engine's null-free fixed-width vectors). Edge
  * semantics differ from the HOF form BY DESIGN: null elements are
  * skipped (HOF would null the whole sum) and unequal lengths fold
  * over the shorter prefix (zip_with would null-pad) — dirty vectors
  * degrade instead of vanishing.
  *
  * Preference order per the build rules: built-ins first, then custom
  * `Expression` — this is the (b) tier; no UDF.
  */
object VectorExpressions {

  private def elemGetter(et: DataType, arr: String, i: String): String =
    et match {
      case FloatType  => s"(double) $arr.getFloat($i)"
      case DoubleType => s"$arr.getDouble($i)"
      case _ => throw new IllegalArgumentException(s"bad element type $et")
    }

  private def elemAt(et: DataType, arr: ArrayData, i: Int): Double =
    et match {
      case FloatType  => arr.getFloat(i).toDouble
      case DoubleType => arr.getDouble(i)
      case _ => throw new IllegalArgumentException(s"bad element type $et")
    }

  /** Analysis-time input check shared by the vector expressions:
    * arguments must be float/double arrays, so a misuse fails with a
    * readable AnalysisException instead of a ClassCastException at
    * codegen/execution time.
    */
  private def checkVectorInputs(fn: String,
                                inputs: Seq[Expression]): TypeCheckResult = {
    inputs.zipWithIndex.collectFirst {
      case (e, i) if !e.dataType.isInstanceOf[ArrayType] ||
          !Set[DataType](FloatType, DoubleType).contains(
            e.dataType.asInstanceOf[ArrayType].elementType) =>
        TypeCheckResult.TypeCheckFailure(
          s"$fn requires array<float>/array<double> arguments, " +
            s"argument ${i + 1} is ${e.dataType.catalogString}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  /** Σ a[i]*b[i] in double precision; null if either input is null.
    * Null array elements are treated as 0 contribution (the testdata
    * vectors carry none).
    */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      checkVectorInputs("dot_product", Seq(left, right))
    private def elemType(e: Expression): DataType =
      e.dataType.asInstanceOf[ArrayType].elementType

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val (tx, ty) = (elemType(left), elemType(right))
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) {
        if (!x.isNullAt(i) && !y.isNullAt(i))
          s += elemAt(tx, x, i) * elemAt(ty, y, i)
        i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
           |    $s += (${elemGetter(elemType(left), a, i)})
           |          * (${elemGetter(elemType(right), b, i)});
           |  }
           |}
           |${ev.value} = $s;
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** sqrt(Σ a[i]^2) in double precision; null if input is null. */
  case class L2Norm(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      checkVectorInputs("l2_norm", Seq(child))
    private def elemType: DataType =
      child.dataType.asInstanceOf[ArrayType].elementType

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      var s = 0.0
      var i = 0
      while (i < n) {
        if (!x.isNullAt(i)) {
          val v = elemAt(elemType, x, i)
          s += v * v
        }
        i += 1
      }
      math.sqrt(s)
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        val v = ctx.freshName("v")
        s"""
           |int $n = $a.numElements();
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$a.isNullAt($i)) {
           |    double $v = ${elemGetter(elemType, a, i)};
           |    $s += $v * $v;
           |  }
           |}
           |${ev.value} = java.lang.Math.sqrt($s);
           |""".stripMargin
      })

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** Sign-random-projection signature as ONE native pass: bit_p =
    * (Σ_d v[d] * plane(p, d)) >= 0 over the md5-derived constant plane
    * matrix — the same sequential left-to-right double accumulation as
    * the higher-order-function form it replaces (bit-identical, so the
    * DuckDB oracles stay valid), but a tight JVM loop instead of
    * `planes` interpreted aggregate(zip_with(...)) chains per row.
    *
    * Edge semantics mirror the HOF form: a null element nulls every
    * plane sum ⇒ all-'0' signature; an oversized vector fails loudly
    * (silent truncation would collapse >maxDim vectors into shared
    * buckets). CodegenFallback is deliberate — per-row work dwarfs the
    * virtual call and the surrounding stage stays codegen'd.
    */
  case class SrpSignature(child: Expression, planes: Int)
      extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: DataType = StringType
    override def checkInputDataTypes(): TypeCheckResult =
      checkVectorInputs("srp_signature", Seq(child))
    private def elemType: DataType =
      child.dataType.asInstanceOf[ArrayType].elementType
    private val maxDim = graft.sim.Similarity.maxSrpDim
    @transient private lazy val matrix: Array[Array[Double]] =
      Array.tabulate(planes, maxDim)(
        (p, d) => graft.sim.Similarity.planeComponent(p, d))

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n > maxDim)
        throw new IllegalStateException(
          s"srpSignature: vector dim $n exceeds maxSrpDim=$maxDim")
      val et = elemType
      var anyNull = false
      var i = 0
      while (i < n && !anyNull) {
        if (arr.isNullAt(i)) anyNull = true
        i += 1
      }
      val out = new Array[Char](planes)
      var p = 0
      while (p < planes) {
        if (anyNull) out(p) = '0'
        else {
          val row = matrix(p)
          var s = 0.0
          var d = 0
          while (d < n) {
            s += elemAt(et, arr, d) * row(d)
            d += 1
          }
          out(p) = if (s >= 0) '1' else '0'
        }
        p += 1
      }
      org.apache.spark.unsafe.types.UTF8String
        .fromString(new String(out))
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** IVF cell assignment in ONE native pass: `cell` = argmax_c
    * dot(v, centroid_c) / ||centroid_c|| (first max wins —
    * array_position semantics — and NaN orders greatest, matching
    * Spark's double ordering in array_max), `best` = the winning
    * affinity. Replaces the CreateArray-of-nlist-DotProducts
    * formulation on corpus-side hot paths: that form evaluates nlist
    * separate expressions per row and gets RE-evaluated per consumer
    * under CollapseProject, so its per-row cost grew super-linearly
    * with nlist (measured at 50k×64f: assignment 0.58 s at nlist=8 →
    * 10.3 s at nlist=80; this pass holds it flat). Same arithmetic as
    * the old form — per-centroid sequential left-to-right dot, one
    * divide by the precomputed norm, null elements skipped exactly as
    * DotProduct skips them — so every DuckDB oracle built on the
    * centroid literals stays bit-identical. CodegenFallback like
    * SrpSignature: the nlist·d loop dwarfs the virtual call.
    */
  case class CentroidAssign(child: Expression,
                            centroids: Seq[Seq[Double]])
      extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("cell", IntegerType, nullable = false),
      StructField("best", DoubleType, nullable = false)))
    override def checkInputDataTypes(): TypeCheckResult =
      checkVectorInputs("centroid_assign", Seq(child))
    private def elemType: DataType =
      child.dataType.asInstanceOf[ArrayType].elementType
    @transient private lazy val mat: Array[Array[Double]] =
      centroids.map(_.toArray).toArray
    // same norm fold as the old per-centroid `math.sqrt(Σ x²)` literal
    @transient private lazy val norms: Array[Double] =
      centroids.map(c => math.sqrt(c.map(x => x * x).sum)).toArray

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val et = elemType
      val n = arr.numElements()
      val x = new Array[Double](n)
      val isNull = new Array[Boolean](n)
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) isNull(i) = true
        else x(i) = elemAt(et, arr, i)
        i += 1
      }
      var bestCell = 0
      var best = 0.0
      var c = 0
      while (c < mat.length) {
        val row = mat(c)
        val m = math.min(n, row.length)
        var s = 0.0
        var j = 0
        while (j < m) {
          if (!isNull(j)) s += x(j) * row(j)
          j += 1
        }
        s = s / norms(c)
        if (c == 0 || java.lang.Double.compare(s, best) > 0) {
          best = s
          bestCell = c
        }
        c += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](bestCell, best))
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** PQ asymmetric distance in ONE native pass: Σ_s ||q_s −
    * cb[s][codes[s]]||² over a constant codebook — the inner loop of
    * ADC search, which runs once per (query, corpus-code) pair inside
    * a broadcast join. Accumulation is the same sequential
    * left-to-right double order as the `aggregate(zip_with(...))`
    * fold it replaces (per-subspace partial, then the subspace sums),
    * so DuckDB oracles built on the codebook literals stay valid.
    *
    * Fails LOUDLY on shape violations (wrong code count, vector dim,
    * or out-of-range code) — silent padding would quietly corrupt
    * every ranking. A null element in either array nulls the
    * distance (mirrors the HOF form). CodegenFallback like
    * SrpSignature: the per-pair loop dwarfs the virtual call.
    */
  case class AdcDistance(left: Expression, right: Expression,
                         codebooks: Seq[Seq[Seq[Double]]])
      extends BinaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult = {
      val codesOk = left.dataType match {
        case ArrayType(IntegerType, _) => true
        case _ => false
      }
      if (!codesOk)
        TypeCheckResult.TypeCheckFailure(
          s"adc_distance requires array<int> codes, got " +
            left.dataType.catalogString)
      else checkVectorInputs("adc_distance", Seq(right))
    }
    private def qElemType: DataType =
      right.dataType.asInstanceOf[ArrayType].elementType
    private val m = codebooks.length
    private val k = codebooks.head.length
    private val dsub = codebooks.head.head.length
    // flat [s][t][j] layout: one cache-friendly constant array
    @transient private lazy val flat: Array[Double] = {
      val a = new Array[Double](m * k * dsub)
      var idx = 0
      codebooks.foreach(_.foreach(_.foreach { v => a(idx) = v; idx += 1 }))
      a
    }

    override def nullSafeEval(c: Any, q: Any): Any = {
      val codes = c.asInstanceOf[ArrayData]
      val qv = q.asInstanceOf[ArrayData]
      if (codes.numElements() != m || qv.numElements() != m * dsub)
        throw new IllegalStateException(
          s"adc_distance: expected $m codes over dim ${m * dsub}, got " +
            s"${codes.numElements()} codes over dim ${qv.numElements()}")
      val et = qElemType
      var total = 0.0
      var s = 0
      while (s < m) {
        if (codes.isNullAt(s)) return null
        val code = codes.getInt(s)
        if (code < 0 || code >= k)
          throw new IllegalStateException(
            s"adc_distance: code $code out of [0, $k) at subspace $s")
        val base = (s * k + code) * dsub
        var inner = 0.0
        var j = 0
        while (j < dsub) {
          val qi = s * dsub + j
          if (qv.isNullAt(qi)) return null
          val d = elemAt(et, qv, qi) - flat(base + j)
          inner += d * d
          j += 1
        }
        total += inner
        s += 1
      }
      total
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** All m x k per-subspace PQ distances in ONE native pass:
    * dists[s][t] = round(Σ_j (v[s*dsub+j] − cb[s][t][j])², 9) — the
    * bulk-encode hot path (at scale this expression runs over every
    * corpus vector during ingestion). Same sequential accumulation and
    * the same floor(x*10^9+0.5)/10^9 rounding as the HOF + pround
    * formulation it replaces (distances are non-negative), so the
    * DuckDB oracles stay valid bit-for-bit.
    *
    * Fails LOUDLY on a dim mismatch; a null element nulls the whole
    * result. CodegenFallback — the m*k*dsub loop dwarfs the call.
    */
  case class PqDistances(child: Expression,
                         codebooks: Seq[Seq[Seq[Double]]])
      extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: DataType =
      ArrayType(ArrayType(DoubleType, containsNull = false),
        containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      checkVectorInputs("pq_distances", Seq(child))
    private def elemType: DataType =
      child.dataType.asInstanceOf[ArrayType].elementType
    private val m = codebooks.length
    private val k = codebooks.head.length
    private val dsub = codebooks.head.head.length
    @transient private lazy val flat: Array[Double] = {
      val a = new Array[Double](m * k * dsub)
      var idx = 0
      codebooks.foreach(_.foreach(_.foreach { v => a(idx) = v; idx += 1 }))
      a
    }

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      if (v.numElements() != m * dsub)
        throw new IllegalStateException(
          s"pq_distances: expected dim ${m * dsub}, got ${v.numElements()}")
      val et = elemType
      val q = new Array[Double](m * dsub)
      var i = 0
      while (i < m * dsub) {
        if (v.isNullAt(i)) return null
        q(i) = elemAt(et, v, i)
        i += 1
      }
      val rows = new Array[Any](m)
      var s = 0
      while (s < m) {
        val ds = new Array[Any](k)
        var t = 0
        while (t < k) {
          val base = (s * k + t) * dsub
          var sum = 0.0
          var j = 0
          while (j < dsub) {
            val d = q(s * dsub + j) - flat(base + j)
            sum += d * d
            j += 1
          }
          // non-negative ⇒ the floor branch of PortableRound
          ds(t) = math.floor(sum * 1e9 + 0.5) / 1e9
          t += 1
        }
        rows(s) = new org.apache.spark.sql.catalyst.util
          .GenericArrayData(ds)
        s += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  import org.apache.spark.sql.graftshim.SqlShims.{toColumn, toExpression}

  def dotProduct(a: Column, b: Column): Column =
    toColumn(DotProduct(toExpression(a), toExpression(b)))

  def l2Norm(v: Column): Column = toColumn(L2Norm(toExpression(v)))

  def srpSignature(v: Column, planes: Int): Column =
    toColumn(SrpSignature(toExpression(v), planes))

  def centroidAssign(v: Column, centroids: Seq[Array[Double]]): Column =
    toColumn(CentroidAssign(toExpression(v), centroids.map(_.toSeq)))

  def adcDistance(codes: Column, qvec: Column,
                  codebooks: Seq[Seq[Seq[Double]]]): Column =
    toColumn(AdcDistance(toExpression(codes), toExpression(qvec),
      codebooks))

  def pqDistances(vec: Column,
                  codebooks: Seq[Seq[Seq[Double]]]): Column =
    toColumn(PqDistances(toExpression(vec), codebooks))
}
