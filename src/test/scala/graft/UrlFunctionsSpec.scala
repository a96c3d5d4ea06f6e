package graft

import org.apache.spark.sql.functions._
import graft.functions.UrlFunctions._

/** NutchUtil parity fixtures — the examples from the reference's own
  * Javadoc (NutchUtil.java:44-131) plus validity edge cases
  * (NutchUtil.java:203-217).
  */
class UrlFunctionsSpec extends GraftSpec {
  private lazy val sp = spark
  import sp.implicits._

  private def one(u: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String =
    Seq(u).toDF("u").select(c(col("u"))).first().getString(0)

  test("reverseUrl matches the reference Javadoc example") {
    // NutchUtil.java:64-65: http://bar.foo.com:8983/to/index.html?a=b
    //   -> com.foo.bar:http:8983/to/index.html?a=b
    assert(one("http://bar.foo.com:8983/to/index.html?a=b", reverseUrl)
      === "com.foo.bar:http:8983/to/index.html?a=b")
    assert(one("http://example.com/x", reverseUrl) === "com.example:http/x")
    assert(one("https://a.b.c.d/p?q=1", reverseUrl) === "d.c.b.a:https/p?q=1")
  }

  test("unreverseUrl inverts reverseUrl (NutchUtil.java:104-105)") {
    val urls = Seq(
      "http://bar.foo.com:8983/to/index.html?a=b",
      "http://example.com/x",
      "https://a.b.c.d/p?q=1",
      "http://one.two.example.org:8080/deep/path/file.html?x=1")
    urls.foreach { u =>
      val rt = Seq(u).toDF("u")
        .select(unreverseUrl(reverseUrl(col("u")))).first().getString(0)
      assert(rt === u, s"roundtrip of $u")
    }
  }

  test("reverseHost is a self-inverse (NutchUtil.java:169-184)") {
    assert(one("bar.foo.com", reverseHost) === "com.foo.bar")
    assert(one("com.foo.bar", unreverseHost) === "bar.foo.com")
    assert(one("localhost", reverseHost) === "localhost")
  }

  test("getReversedHost extracts the host part (NutchUtil.java:134-143)") {
    assert(one("com.foo.bar:http:8983/to/index.html?a=b", getReversedHost) === "com.foo.bar")
    assert(one("com.example:http/x", getReversedHost) === "com.example")
  }

  test("isValidURL semantics (NutchUtil.java:203-217)") {
    val cases = Seq(
      "http://example.com/x" -> true,
      "https://a.b.c/p" -> true,
      "http://localhost/x" -> false, // host without a dot
      "example.com/x" -> false,      // no scheme
      "://nohost" -> false,
      "http://" -> false)
    cases.foreach { case (u, want) =>
      val got = Seq(u).toDF("u").select(isValidUrl(col("u"))).first().getBoolean(0)
      assert(got === want, u)
    }
  }
}
