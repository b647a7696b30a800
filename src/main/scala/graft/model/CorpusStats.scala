package graft.model

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame

/** Fit-once corpus-count memo (r7 verdict item 4): sizing decisions
  * that are corpus-DERIVED — q129's shard count, the
  * q117/q118/q122/q133 dup-group count — were recomputed as a
  * driver-side `count()` job on EVERY query construction, which at
  * 100 TB is an extra full corpus scan per run. Counts are memoized
  * by canonicalized-plan digest ([[PlanKey]], the trainedCentroids
  * discipline): the first construction pays one count job, every
  * later construction of a plan-identical frame is a map hit.
  *
  * Values are primitives (no session-bound state to evict), and an
  * entry is ~100 bytes, bounded by the number of distinct corpus
  * plans a JVM sizes against — never corpus-sized.
  *
  * Same-JVM staleness (r8 ADVICE item 3): the memo keys on the
  * canonicalized PLAN, not file contents — if the files behind a path
  * are REWRITTEN within one JVM (e.g. regenerating an sf dir between
  * runs), a later construction reads the stale count. That trade is
  * deliberate (checking file mtimes would reintroduce a filesystem
  * round-trip per construction, and every other fit-once cache in the
  * engine makes the same assumption); a harness that rewrites inputs
  * in-place must call [[clear]] between corpora — and
  * [[NgramLm.clear]], which covers the LM model/score-frame caches
  * that make the same plan-keyed assumption.
  */
object CorpusStats {
  private val cache = new ConcurrentHashMap[String, java.lang.Long]()

  /** Count jobs actually launched — the FitCacheSpec-style budget
    * counter for listener-free cache assertions.
    */
  private[graft] val countRunCount = new AtomicLong(0L)

  def cachedCount(df: DataFrame): Long =
    cache.computeIfAbsent(PlanKey.of(df), _ => {
      countRunCount.incrementAndGet()
      df.count()
    })

  /** Drop every memoized count — for harnesses that rewrite input
    * files in-place within one JVM (see class doc).
    */
  def clear(): Unit = cache.clear()
}
