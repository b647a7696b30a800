package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.SqlShims.{toColumn, toExpression}

import graft.dedup.HashExpressions
import graft.sim.VectorExpressions

/** SQL surface for the engine's function library.
  *
  * Registers the odds/EV scalar functions (as catalyst expression
  * trees, fully codegen-able) and the native hashing/vector
  * expressions under `graft_*` names, making the whole library usable
  * from `spark.sql("...")` — the idiomatic analog of the reference's
  * importable helper module (`src/processing.py`), per SURVEY §2.10.
  *
  * Use either as a session extension:
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  * or imperatively on an existing session:
  * {{{
  *   GraftExtensions.register(spark)
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.definitions.foreach { case (name, arity, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (exprs: Seq[Expression]) => {
          require(exprs.length == arity,
            s"$name expects $arity argument(s), got ${exprs.length}")
          builder(exprs)
        }))
    }
}

object GraftExtensions {

  // Catalyst-expression builders for the scalar odds functions. These
  // mirror OddsFunctions' Column formulations (a Column built inside a
  // SQL FunctionBuilder cannot be round-tripped — its ColumnNode tree
  // stays unresolved); ExtensionsSkewSpec pins SQL/Column parity.
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.types.DoubleType

  private def d(v: Double) = Literal(v)
  private val nullD = Cast(Literal(null), DoubleType)

  private def americanToDecimalE(e: Expression): Expression =
    CaseWhen(Seq(
      (GreaterThan(e, d(0)), Add(Divide(e, d(100)), d(1))),
      (LessThanOrEqual(e, d(0)),
        Add(Divide(d(100), UnaryMinus(e)), d(1)))), nullD)

  private def decimalToAmericanE(e: Expression): Expression =
    CaseWhen(Seq(
      (Or(IsNull(e), LessThanOrEqual(e, d(1))), nullD),
      (GreaterThanOrEqual(e, d(2)),
        Round(Multiply(Subtract(e, d(1)), d(100)), Literal(2)))),
      Round(Divide(d(-100), Subtract(e, d(1))), Literal(2)))

  private def decimalizeE(e: Expression): Expression =
    CaseWhen(Seq(
      (Or(LessThanOrEqual(e, d(0)), GreaterThanOrEqual(Abs(e), d(100))),
        americanToDecimalE(e))), e)

  private def impliedProbE(e: Expression): Expression =
    CaseWhen(Seq((IsNull(e), nullD)), Divide(d(1), e))

  private def numericCoerceE(e: Expression): Expression =
    Cast(RegExpReplace(StringTrim(Cast(e, org.apache.spark.sql.types
      .StringType)), Literal("^\\+"), Literal("")), DoubleType)

  private def evE(p: Expression, dec: Expression): Expression =
    Subtract(Multiply(p, Subtract(dec, d(1))), Subtract(d(1), p))

  private def halfKellyE(p: Expression, dec: Expression): Expression = {
    val b = Subtract(dec, d(1))
    val full = CaseWhen(Seq((GreaterThan(b, d(0)),
      Divide(Subtract(Multiply(b, p), Subtract(d(1), p)), b))), d(0))
    Least(Seq(Multiply(Greatest(Seq(full, d(0))), d(0.5)), d(0.05)))
  }

  /** (name, arity, builder) for every registered function. */
  val definitions: Seq[(String, Int, Seq[Expression] => Expression)] = Seq(
    ("graft_american_to_decimal", 1, es => americanToDecimalE(es.head)),
    ("graft_decimal_to_american", 1, es => decimalToAmericanE(es.head)),
    ("graft_decimalize", 1, es => decimalizeE(es.head)),
    ("graft_implied_prob", 1, es => impliedProbE(es.head)),
    ("graft_numeric_coerce", 1, es => numericCoerceE(es.head)),
    ("graft_ev", 2, es => evE(es(0), es(1))),
    ("graft_half_kelly", 2, es => halfKellyE(es(0), es(1))),
    ("graft_minhash", 1,
      exprs => HashExpressions.MinHashSignature(exprs.head, 16, 3)),
    ("graft_simhash", 1, exprs => HashExpressions.SimHash64(exprs.head)),
    ("graft_shingle_hashes", 1,
      exprs => HashExpressions.DistinctShingleHashes(exprs.head, 3)),
    ("graft_repetition_stats", 1, exprs =>
      graft.text.RepetitionStatsExpression.RepetitionStats(exprs.head)),
    ("graft_srp_signature", 2, exprs => exprs(1) match {
      case Literal(p: Int, org.apache.spark.sql.types.IntegerType) =>
        VectorExpressions.SrpSignature(exprs(0), p)
      case other => throw new IllegalArgumentException(
        s"graft_srp_signature: planes must be an int literal, got $other")
    }),
    ("graft_dot", 2,
      exprs => VectorExpressions.DotProduct(exprs(0), exprs(1))),
    ("graft_l2norm", 1, exprs => VectorExpressions.L2Norm(exprs.head)),
    ("graft_langid", 1, exprs => graft.text.LangIdExpression.LangIdNgram(
      exprs.head, graft.text.TextAnalysis.defaultTrigramProfiles)),
    ("graft_text_stats", 1, exprs =>
      graft.text.TextStatsExpression.TextStats(
        exprs.head, graft.text.TextAnalysis.defaultStopwords)),
    ("graft_norm_text", 1, exprs =>
      graft.text.NormalizeExpression.NormText(exprs.head)),
    ("graft_topk", 3, exprs => exprs(2) match {
      case Literal(k: Int, org.apache.spark.sql.types.IntegerType) =>
        graft.functions.TopKAggregate.TopKByScore(exprs(0), exprs(1), k)
      case other => throw new IllegalArgumentException(
        s"graft_topk: k must be an int literal, got $other")
    }),
    ("graft_winnowing", 3, exprs => (exprs(1), exprs(2)) match {
      case (Literal(k: Int, org.apache.spark.sql.types.IntegerType),
            Literal(w: Int, org.apache.spark.sql.types.IntegerType)) =>
        graft.text.WinnowingExpression.WinnowingFingerprints(
          exprs(0), k, w)
      case other => throw new IllegalArgumentException(
        s"graft_winnowing: k and w must be int literals, got $other")
    }))

  /** Imperative registration on an existing session (e.g. one the
    * driver built without `spark.sql.extensions`).
    */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, arity, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name,
        (exprs: Seq[Expression]) => {
          require(exprs.length == arity,
            s"$name expects $arity argument(s), got ${exprs.length}")
          builder(exprs)
        },
        "scala_udf")
    }
}
