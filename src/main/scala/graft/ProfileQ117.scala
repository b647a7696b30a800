package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileQ117 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.multimodal.Multimodal
    val v = spark.read.parquet("/tmp/sf1_synth/embeddings.parquet")
    println("nvec=" + v.count())
    val g = math.max(53L, v.count()/100L).toInt
    val hashed = Multimodal.imageDHash(Multimodal.ppmAssetsNearDup(v, g))
    println("nhash=" + hashed.count() + " distinct=" +
      hashed.select("dhash").distinct().count())
    hashed.groupBy("dhash").count().orderBy(desc("count")).show(10, false)
    // band multiplicity
    val banded = hashed.select(col("asset_id"),
      posexplode(array((0 until 4).map(b =>
        col("dhash").substr(b*4+1, 4)): _*)).as(Seq("bi","bv")))
    banded.groupBy("bi","bv").count().orderBy(desc("count")).show(10, false)
    spark.stop()
  }
}
