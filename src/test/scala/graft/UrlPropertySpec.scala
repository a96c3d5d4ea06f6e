package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.UrlFunctions._

/** Property-style roundtrip over ScalaCheck-generated URLs (fixed
  * seed, deterministic): unreverseUrl(reverseUrl(u)) == u and host
  * reversal is self-inverse (NutchUtil reversibility contract,
  * NutchUtil.java:102-184).
  */
class UrlPropertySpec extends GraftSpec {
  private lazy val sp = spark
  import sp.implicits._

  private val label = Gen.choose(1, 8).flatMap(n =>
    Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val host = Gen.choose(2, 4).flatMap(n =>
    Gen.listOfN(n, label).map(_.mkString(".")))
  private val url = for {
    proto <- Gen.oneOf("http", "https")
    h <- host
    port <- Gen.oneOf(Gen.const(""), Gen.choose(1, 65535).map(":" + _))
    path <- Gen.oneOf(Gen.const(""), label.map("/" + _), label.map(l => s"/$l/$l.html"))
    query <- Gen.oneOf(Gen.const(""), label.map("?q=" + _))
  } yield s"$proto://$h$port$path$query"

  private def sample[A](g: Gen[List[A]]): List[A] =
    g.apply(Gen.Parameters.default, Seed(42L)).get

  test("unreverseUrl . reverseUrl == canonical identity over 500 generated URLs") {
    // Reference-faithful canonicalization (NutchUtil.java:93-95): a
    // query on an empty path gains a rooted '/' ("http://h?q" and
    // "http://h/?q" are the same resource to java.net.URL), so the
    // roundtrip fixpoint is the '/'-rooted form.
    val urls = sample(Gen.listOfN(500, url))
    val canon = urls.map { u =>
      val i = u.indexOf('?')
      val slashAfterHost = u.indexOf('/', u.indexOf("://") + 3)
      if (i >= 0 && (slashAfterHost < 0 || slashAfterHost > i))
        u.substring(0, i) + "/" + u.substring(i)
      else u
    }
    val bad = urls.zip(canon).toDF("u", "want")
      .select(col("want"), unreverseUrl(reverseUrl(col("u"))).as("rt"))
      .filter(col("want") =!= col("rt"))
      .collect()
    assert(bad.isEmpty, bad.take(3).mkString(", "))
    // and the canonical form is a true fixpoint
    val bad2 = canon.toDF("u")
      .select(col("u"), unreverseUrl(reverseUrl(col("u"))).as("rt"))
      .filter(col("u") =!= col("rt")).collect()
    assert(bad2.isEmpty, bad2.take(3).mkString(", "))
  }

  test("reverseHost is involutive over 500 generated hosts") {
    val hosts = sample(Gen.listOfN(500, host))
    val bad = hosts.toDF("h")
      .select(col("h"), reverseHost(reverseHost(col("h"))).as("rt"))
      .filter(col("h") =!= col("rt")).collect()
    assert(bad.isEmpty)
  }

  test("isValidUrl accepts every generated well-formed URL") {
    val urls = sample(Gen.listOfN(500, url))
    val bad = urls.toDF("u").filter(!isValidUrl(col("u"))).collect()
    assert(bad.isEmpty, bad.take(3).mkString(", "))
  }
}
