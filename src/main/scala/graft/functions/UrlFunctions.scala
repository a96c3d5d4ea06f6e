package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL utilities re-expressing the reference's NutchUtil
  * (`/root/reference/giraph-nutch/src/main/java/org/apache/giraph/ranking/LinkRank/utils/NutchUtil.java:55-217`)
  * as pure `Column` expressions over Spark built-ins — regexp_extract /
  * split / array_join all stay inside whole-stage codegen; no UDFs.
  *
  * URL model (the subset the reference's data uses — scheme://host[:port]
  * [/path][?query][#fragment], no userinfo):
  * one regex with 6 groups: protocol, host, port, path, ?query, #fragment.
  * The DuckDB oracle (graft.oracle.Sql.urlParts) uses the IDENTICAL
  * regex so both engines agree byte-for-byte.
  */
object UrlFunctions {

  /** Groups: 1 protocol, 2 host, 3 port, 4 path, 5 ?query, 6 #fragment. */
  val UrlRe: String =
    "^([a-zA-Z][a-zA-Z0-9+.\\-]*)://([^/?#:]*)(?::([0-9]+))?([^#?]*)(\\?[^#]*)?(#.*)?$"

  def urlProtocol(u: Column): Column = regexp_extract(u, UrlRe, 1)
  def urlHost(u: Column): Column = regexp_extract(u, UrlRe, 2)
  def urlPort(u: Column): Column = regexp_extract(u, UrlRe, 3)

  /** Java URL.getFile() = path + (query eh "?"+query) — NutchUtil.java:73. */
  def urlFile(u: Column): Column =
    concat(regexp_extract(u, UrlRe, 4), regexp_extract(u, UrlRe, 5))

  /** NutchUtil.isValidURL (NutchUtil.java:203-217): parseable URL whose
    * host is non-empty and contains a dot. */
  def isValidUrl(u: Column): Column =
    urlHost(u) =!= "" && urlHost(u).contains(".")

  /** "bar.foo.com" -> "com.foo.bar" (NutchUtil.reverseHost, :169-174). */
  def reverseHost(h: Column): Column =
    array_join(reverse(split(h, "\\.")), ".")

  /** Self-inverse (NutchUtil.unreverseHost, :182-184). */
  def unreverseHost(h: Column): Column = reverseHost(h)

  /** "http://bar.foo.com:8983/to/index.html?a=b" ->
    * "com.foo.bar:http:8983/to/index.html?a=b" (NutchUtil.reverseUrl,
    * :71-99, including the prepend-'/' rule for non-rooted files). */
  def reverseUrl(u: Column): Column = {
    val port = urlPort(u)
    val file = urlFile(u)
    concat(
      reverseHost(urlHost(u)), lit(":"), urlProtocol(u),
      when(port =!= "", concat(lit(":"), port)).otherwise(lit("")),
      when(file =!= "" && !file.startsWith("/"), concat(lit("/"), file))
        .otherwise(file))
  }

  /** "com.foo.bar:http:8983/x?a=b" -> "http://bar.foo.com:8983/x?a=b"
    * (NutchUtil.unreverseUrl, :111-131). */
  def unreverseUrl(r: Column): Column = {
    val pathIdx = instr(r, "/") // 1-based; 0 when no path
    val head = when(pathIdx > 0, substring_index2(r, pathIdx)).otherwise(r)
    val tail = when(pathIdx > 0, expr_substr_from(r, pathIdx)).otherwise(lit(""))
    val parts = split(head, ":") // [reversed-host, protocol, port?]
    concat(
      element_at(parts, 2), lit("://"), reverseHost(element_at(parts, 1)),
      when(size(parts) === 3, concat(lit(":"), element_at(parts, 3)))
        .otherwise(lit("")),
      tail)
  }

  /** "com.foo.bar:http:8983/x" -> "com.foo.bar" (NutchUtil.getReversedHost,
    * :141-143). */
  def getReversedHost(r: Column): Column =
    substring(r, lit(1), (instr(r, ":") - 1).cast("int"))

  // substring with a Column length / start (functions.substring takes Ints)
  private def substring_index2(c: Column, len: Column): Column =
    c.substr(lit(1), (len - 1).cast("int"))
  private def expr_substr_from(c: Column, start: Column): Column =
    c.substr(start.cast("int"), length(c))
}
