package graft

import graft.sources.UrlCanonicalize.{canonicalize, variants}

/** URL canonicalization golden cases (RFC 3986 §6 normalizations +
  * crawl practice) and the generator-collapse contract.
  */
class UrlSpec extends SparkSpec {

  test("case, default port, fragment, param order") {
    assert(canonicalize("HTTPS://WWW.Example.COM:443/A/B?b=2&a=1#frag")
      == ("https://www.example.com/A/B?a=1&b=2", "example.com"))
    // non-default port survives; http's default is 80, not 443
    assert(canonicalize("http://h.io:443/p")._1 == "http://h.io:443/p")
    assert(canonicalize("http://h.io:80/p")._1 == "http://h.io/p")
  }

  test("percent-escapes: unreserved decode, the rest uppercase") {
    assert(canonicalize("https://h.io/d%6Fcs%2Ffile?k=%2f")._1
      == "https://h.io/docs%2Ffile?k=%2F")
    // malformed escape passes through literally
    assert(canonicalize("https://h.io/a%zz")._1 == "https://h.io/a%zz")
  }

  test("dot segments resolve; empty path becomes /") {
    assert(canonicalize("https://h.io/a/./b/../c")._1
      == "https://h.io/a/c")
    assert(canonicalize("https://h.io/a/b/..")._1 == "https://h.io/a/")
    assert(canonicalize("https://h.io")._1 == "https://h.io/")
    assert(canonicalize("https://h.io/..")._1 == "https://h.io/")
  }

  test("tracking params drop; empty query drops; empties collapse") {
    assert(canonicalize(
      "https://h.io/p?utm_source=x&a=1&UTM_campaign=y&&b=")._1
      == "https://h.io/p?a=1&b=")
    assert(canonicalize("https://h.io/p?utm_source=x")._1
      == "https://h.io/p")
  }

  test("domain strips one leading www.; non-URLs pass through") {
    assert(canonicalize("https://www.www.h.io/")._2 == "www.h.io")
    assert(canonicalize("not a url") == ("not a url", ""))
    assert(canonicalize("mailto:x@y.z") == ("mailto:x@y.z", ""))
  }

  test("canonicalization is idempotent over goldens and variants") {
    val inputs = Seq(
      "HTTPS://WWW.Example.COM:443/A/B?b=2&a=1#frag",
      "https://h.io/d%6Fcs%2Ffile?k=%2f",
      "https://h.io/a/./b/../c",
      "https://h.io/p?utm_source=x&a=1&UTM_campaign=y&&b=",
      "https://h.io", "not a url") ++
      Seq(0L, 7L, 123L).flatMap(variants)
    inputs.foreach { u =>
      val once = canonicalize(u)._1
      assert(canonicalize(once)._1 == once,
        s"not a fixpoint: $u -> $once -> ${canonicalize(once)._1}")
    }
  }

  test("column generator mirrors the Scala reference byte-for-byte") {
    import spark.implicits._
    import graft.sources.UrlCanonicalize
    val ids = Seq(0L, 5L, 49L, 123L, 4999L)
    val got = UrlCanonicalize
      .urlVariantsFromDocs(ids.toDF("doc_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    ids.foreach { id =>
      variants(id).zipWithIndex.foreach { case (u, v) =>
        assert(got((id, v.toLong)) == u,
          s"column spelling for ($id,$v) diverged from variants()")
      }
    }
  }

  test("all three generated spellings collapse to the doc canonical") {
    Seq(0L, 5L, 49L, 123L, 4999L).foreach { id =>
      val expect = s"https://www.example${id % 50}.com/docs/$id" +
        s"?a=${id % 7}&b=${id % 11}"
      val vs = variants(id)
      assert(vs.distinct.length == 3, s"spellings must differ: $vs")
      vs.foreach { v =>
        assert(canonicalize(v)._1 == expect,
          s"variant $v -> ${canonicalize(v)._1}, expected $expect")
      }
      assert(canonicalize(vs.head)._2 == s"example${id % 50}.com")
    }
  }
}
