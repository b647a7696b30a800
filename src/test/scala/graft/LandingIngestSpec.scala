package graft

import java.nio.file.{Files, Path}
import java.time.{Duration, Instant}

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.LandingIngest
import graft.sources.LandingIngest._

/** TTL cache / stale-fallback / landing semantics of the driver-side
  * ingest loop (S1/S2/S7 — `odds_utils.py:76-179`). Pure filesystem +
  * injected clock; no Spark session needed.
  */
class LandingIngestSpec extends AnyFunSuite {

  private def tmpDirs(): (Path, Path, Path) = {
    val base = Files.createTempDirectory("landing-ingest")
    (base.resolve("cache"), base.resolve("raw"), base.resolve("landing"))
  }
  private val params = Map("sport" -> "nba", "markets" -> "h2h")

  test("cache key is order-independent over params") {
    assert(LandingIngest.cacheKey(params) ==
      LandingIngest.cacheKey(Map("markets" -> "h2h", "sport" -> "nba")))
    assert(LandingIngest.cacheKey(params) !=
      LandingIngest.cacheKey(Map("sport" -> "nfl", "markets" -> "h2h")))
  }

  test("fresh cache serves without fetching; expiry refetches") {
    val (cache, raw, _) = tmpDirs()
    var calls = 0
    var t = Instant.parse("2026-01-01T00:00:00Z")
    def fetch() = { calls += 1; s"""[{"n":$calls}]""" }
    val ttl = Duration.ofMinutes(10)

    val r1 = fetchCached(params, fetch _, cache, raw, ttl = ttl,
      now = () => t)
    assert(r1.source == FreshFetch && calls == 1)

    // within TTL: served from cache, fetcher NOT called
    t = t.plusSeconds(60)
    val r2 = fetchCached(params, fetch _, cache, raw, ttl = ttl,
      now = () => t)
    assert(r2.source == FreshCache && calls == 1)
    assert(r2.payload == r1.payload)

    // past TTL: refetch (file mtime is wall-clock, so age the file)
    Files.setLastModifiedTime(
      cache.resolve(s"${LandingIngest.cacheKey(params)}.json"),
      java.nio.file.attribute.FileTime.from(t.minusSeconds(601)))
    val r3 = fetchCached(params, fetch _, cache, raw, ttl = ttl,
      now = () => t)
    assert(r3.source == FreshFetch && calls == 2)
    assert(r3.payload != r1.payload)
  }

  test("failed fetch falls back to stale cache, else empty list") {
    val (cache, raw, _) = tmpDirs()
    def boom(): String = throw new RuntimeException("api down")

    // no cache at all -> empty payload, pipeline keeps running
    val r0 = fetchCached(params, boom _, cache, raw)
    assert(r0.source == EmptyFallback && r0.payload == "[]")

    // seed a cache, age it past TTL, fail the fetch -> stale serve
    val good = fetchCached(params, () => """[{"ok":1}]""", cache, raw)
    assert(good.source == FreshFetch)
    val cp = cache.resolve(s"${LandingIngest.cacheKey(params)}.json")
    Files.setLastModifiedTime(cp,
      java.nio.file.attribute.FileTime.from(
        Instant.now().minusSeconds(3600)))
    val r1 = fetchCached(params, boom _, cache, raw)
    assert(r1.source == StaleCache && r1.payload == """[{"ok":1}]""")
  }

  test("poll lands fresh fetches once; cache replays do not re-land") {
    val (cache, raw, landing) = tmpDirs()
    var t = Instant.parse("2026-01-01T00:00:00Z")
    val (r1, p1) = pollToLanding(params, () => """[{"g":1}]""",
      cache, raw, landing, now = () => t)
    assert(r1.source == FreshFetch && p1.isDefined)
    assert(Files.readString(p1.get) == """[{"g":1}]""")

    // second tick inside the TTL: cache hit, nothing new landed
    t = t.plusSeconds(30)
    val (r2, p2) = pollToLanding(params, () => """[{"g":2}]""",
      cache, raw, landing, now = () => t)
    assert(r2.source == FreshCache && p2.isEmpty)
    assert(Files.list(landing).count() == 1)
    // raw archive kept exactly the fetched snapshots
    assert(Files.list(raw).count() == 1)
  }
}
