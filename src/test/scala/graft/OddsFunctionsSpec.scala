package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.functions.OddsFunctions._

/** X1-X5, X6-X11 scalar semantics (reference `src/processing.py`,
  * `Sports-Pipeline-V2/odds_utils.py`, `ev_calculator.py`), including
  * the reference pytest conversion oracle (`tests/test_pipeline.py:31-46`)
  * and ScalaCheck properties for the invariants it only spot-checks.
  */
class OddsFunctionsSpec extends SparkSpec {

  /** plain-scalacheck property driver (scalatestplus is not on the
    * offline classpath): evaluates the body over N sampled values */
  private def forSamples[A](gen: Gen[A], n: Int = 40)(body: A => Unit): Unit =
    Iterator.continually(gen.sample).flatten.take(n).foreach(body)
  import spark.implicits._

  private def evalDouble(in: Seq[Double], c: org.apache.spark.sql.Column)
      : Seq[Option[Double]] =
    in.toDF("x").select(c.as("y")).collect().toSeq
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))

  test("mixed-format decimalize matches the reference oracle") {
    // decimal prices unchanged; -110 -> 1 + 100/110; +120 -> 2.2
    val got = evalDouble(Seq(1.9, 2.0, -110.0, 120.0), decimalize($"x"))
    assert(got(0).contains(1.9) && got(1).contains(2.0))
    assert(approx(got(2).get, 1.0 + 100.0 / 110.0))
    assert(approx(got(3).get, 2.2))
  }

  test("american zero odds yield null (documented pandas divergence)") {
    // pandas/numpy: 100/-0.0 + 1 = -inf; Spark's Divide returns null on
    // a zero divisor (non-ANSI). Null is the saner sentinel — pinned
    // here and documented on OddsFunctions.americanToDecimal.
    val got = evalDouble(Seq(0.0), americanToDecimal($"x"))
    assert(got(0).isEmpty)
  }

  test("decimalToAmerican branch order: d<=1 null, d=2 -> +100") {
    val got = evalDouble(Seq(0.5, 1.0, 2.0, 3.5, 1.5),
      decimalToAmerican($"x"))
    assert(got(0).isEmpty && got(1).isEmpty)
    assert(got(2).contains(100.0))
    assert(got(3).contains(250.0))
    assert(got(4).contains(-200.0))
  }

  test("numericCoerce strips leading + and coerces garbage to null") {
    val df = Seq("+120", "-110", "2.05", "N/A", " 1.5 ").toDF("x")
      .select(numericCoerce($"x").as("y"))
    val got = df.collect().toSeq
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got == Seq(Some(120.0), Some(-110.0), Some(2.05), None,
      Some(1.5)))
  }

  test("property: american->decimal->american round-trips for |a|>=100") {
    // +100 and -100 both map to decimal 2.0, which X2's >= 2 branch
    // sends back to +100 — so the negative side round-trips only for
    // a < -100 (matching the reference's branch order).
    forSamples(Gen.chooseNum(101, 100000)) { a0 =>
      Seq(a0, -a0).foreach { a =>
        val dec = if (a > 0) a / 100.0 + 1.0 else 100.0 / -a + 1.0
        val back = evalDouble(Seq(dec), decimalToAmerican($"x")).head.get
        assert(math.abs(back - a) <= 0.01 + math.abs(a) * 1e-9)
      }
    }
  }

  test("property: implied prob in (0,1] for decimal > 1") {
    forSamples(Gen.chooseNum(1.0001, 10000.0)) { d =>
      val p = evalDouble(Seq(d), impliedProb($"x")).head.get
      assert(p > 0 && p <= 1)
    }
  }

  test("property: half-Kelly in [0, cap] for p in [0,1], dec > 1") {
    forSamples(Gen.zip(Gen.chooseNum(0.0, 1.0),
      Gen.chooseNum(1.0001, 100.0))) { case (p, d) =>
        val k = Seq((p, d)).toDF("p", "d")
          .select(halfKelly($"p", $"d").as("k"))
          .collect().head.getDouble(0)
        assert(k >= 0.0 && k <= 0.05 + 1e-12)
    }
  }

  test("EV / variance / adjusted EV on a known example") {
    // p = 0.5, dec = 2.2: payout 1.2, EV = 0.5*1.2 - 0.5 = 0.1
    val row = Seq((0.5, 2.2)).toDF("p", "d")
      .withColumn("ev", expectedValue($"p", $"d"))
      .withColumn("v", outcomeVariance($"p", $"d", $"ev"))
      .withColumn("adj", adjustedEv($"ev", $"v"))
      .collect().head
    assert(approx(row.getAs[Double]("ev"), 0.1))
    // var = 0.5*(1.2-0.1)^2 + 0.5*(-1-0.1)^2 = 0.5*1.21 + 0.5*1.21
    assert(approx(row.getAs[Double]("v"), 1.21))
    assert(approx(row.getAs[Double]("adj"), 0.1 - 0.5 * 1.21))
  }
}
