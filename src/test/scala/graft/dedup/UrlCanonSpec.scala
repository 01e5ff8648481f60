package graft.dedup

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The URL normalizer rule by rule — including the branches dq15's
  * planted universe doesn't reach (http:80 drop, NON-default port
  * retention, fragment-only difference, empty query). */
class UrlCanonSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("url").select(UrlCanon.canonical($"url").as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("case, www, default ports, fragments, trailing slash all fold") {
    val out = canon(
      "https://www.Example.COM/a/b",
      "HTTPS://EXAMPLE.com:443/a/b/",
      "https://example.com/a/b#frag")
    assert(out.distinct == Seq("https://example.com/a/b"), out.toString)
  }

  test("http default port 80 drops; non-default ports survive") {
    assert(canon("http://example.com:80/x") == Seq("http://example.com/x"))
    assert(canon("http://example.com:8080/x") == Seq("http://example.com:8080/x"))
    assert(canon("https://example.com:8443/x") == Seq("https://example.com:8443/x"))
    // 443 is only default for https — it must SURVIVE on http
    assert(canon("http://example.com:443/x") == Seq("http://example.com:443/x"))
  }

  test("tracking params drop, survivors sort, empty query disappears") {
    assert(canon("https://e.com/p?b=2&utm_source=x&a=1&fbclid=z&gclid=q") ==
      Seq("https://e.com/p?a=1&b=2"))
    assert(canon("https://e.com/p?utm_campaign=only") == Seq("https://e.com/p"))
    assert(canon("https://e.com/p?") == Seq("https://e.com/p"))
  }

  test("multi-slash tails reach the fixed point in one pass") {
    assert(canon("https://e.com/x//") == Seq("https://e.com/x"))
    assert(canon("https://e.com/x///") == Seq("https://e.com/x"))
    assert(canon("https://e.com//") == Seq("https://e.com"))
  }

  test("canonicalization is idempotent on generated URLs") {
    val rnd = new scala.util.Random(13)
    val schemes = Seq("http", "HTTP", "https", "HTTPS")
    val hosts = Seq("www.Example.com", "EXAMPLE.com", "a.b.example.com")
    val ports = Seq("", ":80", ":443", ":8080")
    val paths = Seq("", "/", "//", "/x", "/x/y/", "/x/y", "/x//", "/x///")
    val queries = Seq("", "?a=1", "?b=2&a=1", "?utm_source=t&a=1", "?")
    val frags = Seq("", "#f", "#sec/2")
    val urls = (1 to 200).map { _ =>
      schemes(rnd.nextInt(schemes.length)) + "://" +
        hosts(rnd.nextInt(hosts.length)) + ports(rnd.nextInt(ports.length)) +
        paths(rnd.nextInt(paths.length)) + queries(rnd.nextInt(queries.length)) +
        frags(rnd.nextInt(frags.length))
    }
    val once = canon(urls: _*)
    val twice = canon(once: _*)
    assert(once == twice, "canonical form must be a fixed point")
  }

  test("distinct resources stay distinct") {
    val out = canon(
      "https://e.com/p?page=1",
      "https://e.com/p?page=2",
      "https://e.com/q?page=1",
      "http://e.com/p?page=1")
    assert(out.distinct.length == 4, out.toString)
  }
}
