package graft.sampling

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sequence packing for training-data prep: lay token
  * chunks end-to-end and split every `capacity` tokens — each chunk is
  * assigned to the training sequence holding its FIRST token
  * (seq_id = floor(tokens_before / capacity), seq_offset =
  * tokens_before % capacity).
  *
  * A single global stream would serialize the window; instead chunks
  * pack within `buckets` independent streams (bucket = doc_id %
  * buckets — portable arithmetic, no engine-private hash), ordered by
  * (doc, chunk) inside each. Scale shape: one shuffle on the bucket,
  * each bucket an independent spillable window sort sized corpus/
  * buckets; raise `buckets` with the cluster. Determinism: bucket
  * assignment and intra-bucket order are pure functions of the data,
  * so the packing is reproducible across runs, partitionings, and
  * engines.
  */
object Packing {

  def packSequences(chunks: DataFrame, capacity: Int, buckets: Int,
                    idCol: String = "doc_id",
                    idxCol: String = "chunk_idx",
                    nCol: String = "n_chunk_tokens"): DataFrame = {
    require(capacity > 0, s"packSequences: capacity=$capacity must be > 0")
    require(buckets > 0, s"packSequences: buckets=$buckets must be > 0")
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col(idCol), col(idxCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    chunks
      .withColumn("bucket", pmod(col(idCol), lit(buckets)).cast("int"))
      .withColumn("__cum", coalesce(sum(col(nCol)).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"__cum DIV $capacity"))
      .withColumn("seq_offset", (col("__cum") % capacity).cast("long"))
      .drop("__cum")
  }
}
