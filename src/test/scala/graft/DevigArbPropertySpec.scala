package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import graft.operators.{Arb, Devig}

/** ScalaCheck generator sweep over null-bearing frames for the devig
  * and grouped-argmax operators (r3 verdict item 8) — locks the
  * pandas-vs-Spark null routing of SURVEY §7.4 as properties, not just
  * fixtures:
  *   - pandas NaN arrives in the engine as NULL (the ingest coercion
  *     rule), and `sum` then skips it exactly like pandas' skipna —
  *     so per-group devig totals ignore null rows;
  *   - devig guard: a group whose total is null or <= 0 passes implied
  *     probs through UNCHANGED (never a divide-by-zero/Infinity);
  *   - null rows normalize to null, never to a number;
  *   - grouped argmax: max non-null price wins; desc ordering puts
  *     nulls LAST, so null prices only survive in all-null groups; the
  *     tiebreak is the pinned (price desc, bookmaker asc).
  * Each property is checked row-for-row against a Scala-side model
  * over ~sampled random frames.
  */
class DevigArbPropertySpec extends SparkSpec {

  private def forSamples[A](gen: Gen[A], n: Int = 12)(body: A => Unit): Unit =
    Iterator.continually(gen.sample).flatten.take(n).foreach(body)

  // a frame: (game_id, row_id, implied_prob nullable) — negatives and
  // zeros included so the total<=0 guard branch is generated, nulls
  // model pandas NaN after ingest coercion
  private val probGen: Gen[Option[Double]] = Gen.frequency(
    6 -> Gen.chooseNum(0.01, 0.99).map(Some(_)),
    1 -> Gen.const(Some(0.0)),
    1 -> Gen.chooseNum(-0.5, -0.01).map(Some(_)),
    2 -> Gen.const(None))

  private val frameGen: Gen[Seq[(String, Int, Option[Double])]] = for {
    nGroups <- Gen.chooseNum(1, 4)
    rows <- Gen.sequence[Seq[Seq[(String, Int, Option[Double])]],
      Seq[(String, Int, Option[Double])]]((0 until nGroups).map { g =>
        for {
          n <- Gen.chooseNum(1, 5)
          ps <- Gen.listOfN(n, probGen)
        } yield ps.zipWithIndex.map { case (p, i) => (s"g$g", i, p) }
      })
  } yield rows.flatten

  private val probSchema = StructType(Seq(
    StructField("game_id", StringType),
    StructField("row_id", IntegerType),
    StructField("implied_prob", DoubleType)))

  private def toDf(rows: Seq[(String, Int, Option[Double])]) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r =>
        Row(r._1, r._2, r._3.orNull)): _*),
      probSchema)

  private def outMap(df: org.apache.spark.sql.DataFrame, outCol: String)
      : Map[(String, Int), Option[Double]] =
    df.collect().map(r => (r.getString(0), r.getInt(1)) ->
      (if (r.isNullAt(r.fieldIndex(outCol))) None
       else Some(r.getDouble(r.fieldIndex(outCol))))).toMap

  test("property: proportional devig matches the null-skipping model") {
    forSamples(frameGen) { rows =>
      val got = outMap(Devig.proportional(toDf(rows)), "devig_prob")
      rows.groupBy(_._1).foreach { case (g, grp) =>
        val vals = grp.flatMap(_._3)
        val total = vals.sum
        grp.foreach { case (_, i, p) =>
          val expected =
            if (vals.isEmpty || total <= 0) p // guard: pass-through
            else p.map(_ / total)             // null stays null
          (got((g, i)), expected) match {
            case (None, None) =>
            case (Some(a), Some(b)) => assert(approx(a, b),
              s"group $g row $i: got $a expected $b (total=$total)")
            case (a, b) => fail(s"group $g row $i: got $a expected $b")
          }
        }
      }
    }
  }

  test("property: power devig sums to 1 per positive group, " +
      "passes degenerate groups through") {
    // power devig is only defined over non-negative probs (implied
    // probs); the model mirrors the two guarded normalization passes
    val nonNegFrame = frameGen.map(_.map { case (g, i, p) =>
      (g, i, p.map(math.abs)) })
    forSamples(nonNegFrame) { rows =>
      val got = outMap(Devig.power(toDf(rows)), "true_prob")
      rows.groupBy(_._1).foreach { case (g, grp) =>
        val vals = grp.flatMap(_._3)
        val total = vals.sum
        if (vals.nonEmpty && total > 0) {
          val adj = grp.map { case (_, _, p) =>
            p.map(v => math.pow(v / total, 1.0 / 1.05)) }
          val totalAdj = adj.flatten.sum
          grp.zip(adj).foreach { case ((_, i, p), a) =>
            val expected =
              if (totalAdj <= 0) p.map(_ / total) // fallback to norm
              else a.map(_ / totalAdj)
            (got((g, i)), expected) match {
              case (None, None) =>
              case (Some(x), Some(y)) => assert(approx(x, y),
                s"group $g row $i: got $x expected $y")
              case (x, y) => fail(s"group $g row $i: got $x expected $y")
            }
          }
          // the normalized group is a distribution: non-null sum ≈ 1
          val s = grp.flatMap(t => got((t._1, t._2))).sum
          if (totalAdj > 0) assert(approx(s, 1.0),
            s"group $g true_prob sums to $s, not 1")
        } else {
          // degenerate group (all-null or zero total): UNCHANGED
          // pass-through, nulls included. With total <= 0 the norm
          // pass already returns p; adj = p^(1/1.05) over zeros is 0,
          // so the second guard also falls back to norm = p.
          grp.foreach { case (_, i, p) =>
            (got((g, i)), p) match {
              case (None, None) =>
              case (Some(a), Some(b)) => assert(approx(a, b),
                s"group $g row $i: got $a expected pass-through $b")
              case (a, b) =>
                fail(s"group $g row $i: got $a expected pass-through $b")
            }
          }
        }
      }
    }
  }

  private val argmaxSchema = StructType(Seq(
    StructField("game_id", StringType),
    StructField("outcome", StringType),
    StructField("bookmaker", StringType),
    StructField("price", DoubleType)))

  private val argmaxGen: Gen[Seq[(String, String, String, Option[Double])]] =
    for {
      nGames <- Gen.chooseNum(1, 3)
      rows <- Gen.sequence[Seq[Seq[(String, String, String, Option[Double])]],
        Seq[(String, String, String, Option[Double])]](
        (for { g <- 0 until nGames; o <- Seq("home", "away") } yield for {
          // distinct bookmakers per (game, outcome): the tiebreak is
          // total only then (documented on parseMarket)
          nBooks <- Gen.chooseNum(1, 4)
          prices <- Gen.listOfN(nBooks, Gen.frequency(
            4 -> Gen.chooseNum(1.5, 3.5).map(Some(_)),
            1 -> Gen.const(None)))
          // coarsen to a 0.5 grid half the time so price TIES are
          // actually generated and the bookmaker tiebreak is exercised
          tie <- Gen.oneOf(true, false)
        } yield Seq("b1", "b2", "b3", "b4").take(nBooks).zip(prices)
          .map { case (b, p) =>
            (s"g$g", o, b,
              if (tie) p.map(v => math.rint(v * 2) / 2) else p)
          }))
    } yield rows.flatten

  test("property: grouped argmax picks max non-null price with the " +
      "pinned (price desc, bookmaker asc) tiebreak") {
    forSamples(argmaxGen) { rows =>
      val df = spark.createDataFrame(
        java.util.Arrays.asList(rows.map(r =>
          Row(r._1, r._2, r._3, r._4.orNull)): _*), argmaxSchema)
      val got = Arb.bestPrices(df).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((if (r.isNullAt(r.fieldIndex("best_price"))) None
            else Some(r.getDouble(r.fieldIndex("best_price")))),
            r.getString(r.fieldIndex("best_bookmaker")))).toMap
      rows.groupBy(t => (t._1, t._2)).foreach { case (key, grp) =>
        val nonNull = grp.filter(_._4.isDefined)
        val expected = if (nonNull.nonEmpty) {
          val maxP = nonNull.flatMap(_._4).max
          val winner = nonNull.filter(_._4.contains(maxP))
            .map(_._3).min // bookmaker asc on price ties
          (Some(maxP), winner)
        } else (None, grp.map(_._3).min) // all-null: nulls last, book asc
        assert(got(key) == expected,
          s"$key: got ${got(key)} expected $expected from $grp")
      }
    }
  }
}
