package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.format.DateTimeFormatter
import java.time.{Duration, Instant, ZoneOffset}

/** S1/S2/S7 driver-side ingest loop: poll a source → TTL-cached
  * fetch with stale fallback → land the payload as a timestamped JSON
  * file that [[graft.streaming.StreamingIngest.readOddsStream]] (and
  * the batch JSON loaders) consume.
  *
  * Mirrors the reference's fetch/cache contract
  * (`Sports-Pipeline-V2/odds_utils.py:76-179`, `src/ingestion.py:32-54`):
  *   - cache key = md5 of the canonicalized (sorted) request params;
  *   - a cache file younger than the TTL is served WITHOUT fetching;
  *   - a successful fetch refreshes the cache and archives a raw copy
  *     named `<prefix>_<UTC yyyyMMdd'T'HHmmss>.json`;
  *   - a failed fetch falls back to the stale cache when one exists,
  *     and to an empty payload (`[]`) otherwise — the pipeline keeps
  *     running on the last good snapshot, it never crashes on a flaky
  *     upstream.
  *
  * The fetch itself is a pluggable `() => String` (no network in this
  * environment — production wires an HTTP client here; tests and local
  * replays wire a file read). The clock is injectable so TTL behavior
  * is testable without sleeping.
  *
  * This is deliberately DRIVER-SIDE utility code, not a Spark job: at
  * scale, one small poller process lands files; the cluster's work
  * starts at the landing directory (schema'd stream/batch reads) —
  * per-executor HTTP fetching would hammer the upstream and make
  * retries non-deterministic.
  */
object LandingIngest {

  /** Where a payload came from — surfaced so callers can log/alert on
    * stale serves the way the reference warns (`odds_utils.py:172-176`).
    */
  sealed trait Source
  case object FreshFetch extends Source
  case object FreshCache extends Source
  case object StaleCache extends Source
  case object EmptyFallback extends Source

  final case class FetchResult(payload: String, source: Source)

  /** md5 of the sorted `k=v` param serialization — one cache entry per
    * distinct logical request (`odds_utils.py:75-77`).
    */
  def cacheKey(params: Map[String, String]): String = {
    val canonical = params.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString("&")
    java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes(UTF_8))
      .map("%02x".format(_)).mkString
  }

  private def cachePath(cacheDir: Path, params: Map[String, String]): Path =
    cacheDir.resolve(s"${cacheKey(params)}.json")

  private def isFresh(p: Path, ttl: Duration, now: Instant): Boolean =
    Files.exists(p) && {
      val age = Duration.between(
        Files.getLastModifiedTime(p).toInstant, now)
      age.compareTo(ttl) < 0
    }

  private val stampFmt =
    DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss").withZone(ZoneOffset.UTC)

  /** Archive/landing filename: the UTC stamp for humans plus the
    * params hash — two param sets polled within the same second must
    * NOT collide (a shared `odds_<stamp>.json` name would silently
    * overwrite one payload with the other).
    */
  private def stampedName(prefix: String, params: Map[String, String],
                          now: Instant): String =
    s"${prefix}_${stampFmt.format(now)}_${cacheKey(params).take(8)}.json"

  /** TTL-cached fetch with stale fallback (`odds_utils.py:130-179`).
    * A fresh fetch also archives the raw payload under `rawDir`.
    *
    * Only a FAILED FETCH falls back to the stale cache / empty
    * payload; an IO failure while persisting a SUCCESSFUL fetch
    * (cache move, raw archive) propagates — silently reporting fresh
    * data as StaleCache would drop the fetched snapshot and mask a
    * broken disk.
    */
  def fetchCached(params: Map[String, String], fetch: () => String,
                  cacheDir: Path, rawDir: Path, prefix: String = "odds",
                  ttl: Duration = Duration.ofMinutes(10),
                  now: () => Instant = () => Instant.now()): FetchResult = {
    Files.createDirectories(cacheDir)
    val cp = cachePath(cacheDir, params)
    if (isFresh(cp, ttl, now()))
      return FetchResult(Files.readString(cp), FreshCache)
    val payload =
      try fetch()
      catch {
        case _: Exception if Files.exists(cp) =>
          return FetchResult(Files.readString(cp), StaleCache)
        case _: Exception =>
          return FetchResult("[]", EmptyFallback)
      }
    // write-then-move so a reader never sees a half-written cache
    val tmp = Files.createTempFile(cacheDir, ".cache", ".tmp")
    Files.writeString(tmp, payload)
    Files.move(tmp, cp, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    Files.createDirectories(rawDir)
    Files.writeString(rawDir.resolve(stampedName(prefix, params, now())),
      payload)
    FetchResult(payload, FreshFetch)
  }

  /** One poll tick: fetch (TTL-cached) and, when the payload is NEW
    * (a fresh fetch — not a cache replay, which would duplicate rows
    * downstream), land it atomically into `landingDir` for the
    * streaming/batch readers. Returns the landed path, if any.
    */
  def pollToLanding(params: Map[String, String], fetch: () => String,
                    cacheDir: Path, rawDir: Path, landingDir: Path,
                    prefix: String = "odds",
                    ttl: Duration = Duration.ofMinutes(10),
                    now: () => Instant = () => Instant.now())
      : (FetchResult, Option[Path]) = {
    val r = fetchCached(params, fetch, cacheDir, rawDir, prefix, ttl, now)
    r.source match {
      case FreshFetch =>
        Files.createDirectories(landingDir)
        val tmp = Files.createTempFile(landingDir, ".land", ".tmp")
        Files.writeString(tmp, r.payload)
        val dest = landingDir.resolve(stampedName(prefix, params, now()))
        Files.move(tmp, dest, StandardCopyOption.REPLACE_EXISTING,
          StandardCopyOption.ATOMIC_MOVE)
        (r, Some(dest))
      case _ => (r, None)
    }
  }
}
