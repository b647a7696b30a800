package graft.model

import org.apache.spark.sql.DataFrame

/** Cache-key derivation for every fit-once artifact cache
  * (Similarity.trainedCentroids, Pq.trainedCodebooks,
  * UnigramLm.cachedInventory, MultiPattern.cachedPatterns,
  * SuffixRepeats.repeatedSpans, QueriesScale's corpus-count memo).
  *
  * r7 ADVICE item 1: keying on the 32-bit canonicalized-plan
  * `semanticHash` alone gives a ~2⁻³² silent-collision budget — far
  * weaker than the 64-bit budgets documented elsewhere in the
  * catalog, and a collision would hand one corpus another corpus's
  * trained artifact with no detection. Keys are driver-side and
  * model-sized, so the fix is free: digest the FULL canonicalized
  * plan string (md5, 128 bits) and append the semanticHash on top.
  * Canonicalization normalizes expression ids and aliases, so two
  * plan-identical frames still share a key; two different corpora
  * collide only if md5(planString) AND semanticHash both collide.
  */
object PlanKey {
  def of(df: DataFrame): String = {
    val p = df.queryExecution.analyzed.canonicalized
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = md.digest(p.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    s"$dig:${p.semanticHash()}"
  }
}
