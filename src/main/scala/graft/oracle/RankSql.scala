package graft.oracle

/** Unrolled-iteration DuckDB SQL for LinkRank/TrustRank — the oracle
  * twin of graft.graph.LinkRank.run. The fixed iteration count lets us
  * unroll to a plain CTE chain (no recursive-CTE aggregation limits);
  * every arithmetic step mirrors the Spark side: same double literals,
  * same association, same A&S erf (Sql.erf), round(_, 6) at the end.
  */
object RankSql {

  /** Builds the CTE chain from a vertex/edge CTE set to a final CTE
    * named `ranked(id, score)`.
    *
    * Expects an edge CTE named `e_<name>`... — callers pass `edgeCte`,
    * the NAME of a CTE with columns (src, dst), already deduped.
    *
    * @param initExpr SQL expression over `id` giving the initial score.
    * @param trustedPred if set, TrustRank mode: SQL predicate over `id`
    *                    marking trusted vertices (must agree with
    *                    |initExpr - 1| < 1e-3).
    */
  def chain(edgeCte: String, initExpr: String, iters: Int = 9,
            damping: Double = 0.85, scale: Double = 10.0,
            trustedPred: Option[String => String] = None): String = {
    val d = damping.toString
    val oneMinusD = (1.0 - damping).toString
    val sb = new StringBuilder

    sb ++= s"""vertices AS MATERIALIZED (
  SELECT DISTINCT id FROM (SELECT src AS id FROM $edgeCte UNION ALL SELECT dst FROM $edgeCte)),
outdeg AS MATERIALIZED (SELECT src, count(*) AS od FROM $edgeCte GROUP BY src),
nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM vertices),
"""
    trustedPred.foreach { pred =>
      sb ++= s"""ntr AS (SELECT CAST(count(*) AS DOUBLE) AS nt FROM vertices WHERE ${pred("id")}),
"""
    }
    sb ++= s"""r0 AS MATERIALIZED (SELECT id, CAST(($initExpr) AS DOUBLE) AS score FROM vertices),
"""
    for (k <- 1 to iters) {
      val p = s"r${k - 1}"
      val dTerm = trustedPred match {
        case None => s"(SELECT ds FROM d$k) / nv.n"
        case Some(pred) =>
          s"(CASE WHEN ${pred("v.id")} THEN (SELECT ds FROM d$k) / (SELECT nt FROM ntr) ELSE 0.0 END)"
      }
      sb ++= s"""d$k AS (SELECT coalesce(sum(p.score), 0) AS ds FROM $p p WHERE p.id NOT IN (SELECT src FROM outdeg)),
r$k AS MATERIALIZED (
  SELECT v.id, ($oneMinusD / nv.n + $d * (coalesce(c.contrib, 0) + $dTerm)) AS score
  FROM vertices v CROSS JOIN nv
  LEFT JOIN (SELECT e.dst AS did, sum(p.score / od.od) AS contrib
             FROM $edgeCte e JOIN $p p ON e.src = p.id JOIN outdeg od ON od.src = e.src
             GROUP BY e.dst) c ON v.id = c.did),
"""
    }
    sb ++= s"""logs AS (SELECT id, ln(score) AS l FROM r$iters),
mustat AS (SELECT sum(l) / count(*) AS m FROM logs),
sgstat AS (SELECT sqrt(sum((l - (SELECT m FROM mustat)) * (l - (SELECT m FROM mustat))) / count(*)) AS s FROM logs),
sfix AS (SELECT (CASE WHEN s = 0 THEN 1e-10 ELSE s END) AS s FROM sgstat),
zz AS (SELECT id, (l - (SELECT m FROM mustat)) / ((SELECT s FROM sfix) * ${Sql.Sqrt2}) AS z FROM logs),
ranked AS (SELECT id, (0.5 * (1.0 + ${Sql.erf("z")})) * $scale AS score FROM zz)"""
    sb.toString
  }

  /** Predicate-style helper type: trustedPred maps a column ref to SQL. */
  type Pred = String => String
}
