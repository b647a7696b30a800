package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.ml.regression.RandomForestRegressionModel
import graft.forecast.Models

/** RF prediction-level parity (r4 verdict item 8): q49's catalog row
  * can only oracle invariants (split counts + preds-in-range) because
  * sklearn and MLlib forests differ; this spec pins the MLlib side
  * itself to GOLDEN predictions — fixed data (sf0.001), fixed seed
  * (42), and a pinned single-partition instance order (MLlib's
  * bootstrap sampling keys off (seed, partition, position), so the
  * repartition(1) + sort makes the fit bit-reproducible). A change in
  * the feature pipeline, the split, or the RF configuration moves
  * these values; re-capture deliberately or the spec fails loudly.
  */
class RfGoldenSpec extends SparkSpec {

  test("seeded RF reproduces golden predictions bit-for-bit") {
    val wo = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val feats = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("rolling_avg",
        avg(col("value")).over(wo.rowsBetween(-4, 0)))
      .withColumn("target", lead(col("value"), 1).over(wo))
      .filter(col("target").isNotNull)
      .select(col("event_id"), col("rolling_avg"), col("target"))
    val train = feats.filter(col("event_id") % 5 === 1)
      .repartition(1).sortWithinPartitions(col("event_id"))
    val test = feats.filter(col("event_id") % 5 === 0)
    val model = Models.train(train, "random_forest",
      featureCols = Seq("rolling_avg"), labelCol = "target")

    // five golden predictions (captured 2026-08-13, Spark 4.1.2,
    // seed 42, single-partition sorted train input)
    val golden = Map(
      0L -> 33.70055114103217,
      5L -> 19.475718975403474,
      10L -> 49.71918100535183,
      15L -> 41.92779749755179,
      20L -> 41.92779749755179)
    val got = Models.predict(model, test)
      .select(col("event_id"), col("prediction"))
      .filter(col("event_id").isin(golden.keys.toSeq: _*))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == golden.keySet)
    golden.foreach { case (id, want) =>
      assert(approx(got(id), want, 1e-9),
        s"event $id: got ${got(id)}, golden $want")
    }

    // per-tree invariants: the full ensemble trained, uniform weights,
    // and every single tree's prediction honors the leaf-average bound
    val rf = model.stages(1).asInstanceOf[RandomForestRegressionModel]
    assert(rf.getNumTrees == 100)
    assert(rf.treeWeights.forall(_ == 1.0))
    val Array(lo, hi) = train
      .agg(min(col("target")), max(col("target"))).collect()
      .head.toSeq.map(_.asInstanceOf[Double]).toArray
    val probe = new org.apache.spark.ml.linalg.DenseVector(Array(25.0))
    rf.trees.foreach { t =>
      val p = t.predict(probe)
      assert(p >= lo && p <= hi,
        s"tree prediction $p outside train label range [$lo, $hi]")
    }
  }
}
