package graft

import org.apache.spark.sql.functions._

/** Bucketed-table co-located join: at 100 TB the fact⋈fact equi-join's
  * dominant cost is shuffling both sides; writing each side bucketed
  * by the join key (same bucket count) lets Spark plan the sort-merge
  * join with ZERO exchanges — every bucket pair joins locally. This
  * spec proves the engine's write path produces bucket metadata Spark
  * honors, and that the bucketed plan returns the plain join's rows.
  */
class BucketJoinSpec extends SparkSpec {

  test("bucketed tables join exchange-free and match the plain join") {
    val dir = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_buckets").toFile.getAbsolutePath
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val savedBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      li.write.mode("overwrite").option("path", s"$tmp/li")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_li_bucketed")
      o.write.mode("overwrite").option("path", s"$tmp/o")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_o_bucketed")
      // force the shuffle-join path a 100 TB fact⋈fact join would take
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bucketed = spark.table("graft_li_bucketed")
        .join(spark.table("graft_o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val p = bucketed.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p.take(2000))
      assert("(?<!Reused)(?<!Broadcast)Exchange".r.findFirstIn(p).isEmpty,
        s"bucketed join should plan no shuffle:\n${p.take(3000)}")
      val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      assert(bucketed.count() == plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBcast)
      spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_o_bucketed")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }
}
