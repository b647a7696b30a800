package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DevExplain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      println(f"TIME $label%-18s ${(System.nanoTime()-t0)/1e9}%7.2fs")
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .repartition(col("doc_id"))
    val sig = graft.dedup.Dedup.minhashSignature(col("text"), 16, 3)
    val withSig = docs.withColumn("sig", sig)
    time("warmup")(withSig.select(col("doc_id")))
    time("sig-only")(withSig.select(col("doc_id"), col("sig")))
    time("sig-only2")(withSig.select(col("doc_id"), col("sig")))
    val q24 = SparkEntry.queries("q24_minhash_sig")
    time("q24")(q24(spark, "/root/testdata/sf0.1"))
    spark.stop()
  }
}
