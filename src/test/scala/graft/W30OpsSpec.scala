package graft

import org.apache.spark.sql.functions._
import graft.queries.{MlEvalQueries, RelationalQueries, StorageQueries}

/** Wave-30 operators (q180–q182): salting plan, zone-map audit, Markov
  * removal-effect attribution.
  */
class W30OpsSpec extends GraftSpec {

  test("q180 salting plan covers every key with consistent integer math") {
    val rows = RelationalQueries.q180SaltPlan(spark, sfDir).collect()
    val hist = Tables.events(spark, sfDir)
      .groupBy(col("event_type")).agg(count(lit(1))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet === hist.keySet)
    rows.foreach { r =>
      val n = hist(r.getString(0))
      val cap = RelationalQueries.SaltCap
      val factor = (n + cap - 1) / cap
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === factor)
      assert(r.getLong(3) === (n + factor - 1) / factor)
      assert(r.getBoolean(4) === (factor > 1))
      // the plan achieves its goal: per-salt load is within the cap
      assert(r.getLong(3) <= cap)
      // and splitting never over-shards: factor-1 salts would overflow
      if (factor > 1) assert(n > (factor - 1) * cap - cap, "not over-sharded")
    }
  }

  test("q181 zone maps partition the key space and bound the block contents") {
    val rows = StorageQueries.q181Zonemaps(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0) / StorageQueries.ZoneRows, r.getDouble(1)))
    val byBlock = ord.groupBy(_._1)
    assert(rows.map(_.getLong(0)).toSet === byBlock.keySet)
    rows.foreach { r =>
      val vals = byBlock(r.getLong(0)).map(_._2)
      assert(r.getLong(1) === vals.length.toLong)
      assert(math.abs(r.getDouble(2) - vals.min) < 1e-6)
      assert(math.abs(r.getDouble(3) - vals.max) < 1e-6)
      val hit = r.getDouble(3) >= StorageQueries.ZonePredLo &&
        r.getDouble(2) <= StorageQueries.ZonePredHi
      assert(r.getBoolean(4) === hit)
      // a non-hit block truly contains no qualifying row
      if (!r.getBoolean(4))
        assert(!vals.exists(v => v >= StorageQueries.ZonePredLo &&
          v <= StorageQueries.ZonePredHi))
    }
  }

  test("q182 removal effects replay a driver-built chain from raw journeys") {
    val rows = MlEvalQueries.q182MarkovAttribution(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      MlEvalQueries.MarkovChannels.sorted)
    // independent journey construction straight from the events
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    ev.groupBy(_._1).foreach { case (_, es) =>
      val ordered = es.sortBy(e => (e._2, e._3)).map(_._4)
      val pIdx = ordered.indexOf("purchase")
      val kept: Seq[String] =
        if (pIdx >= 0) ordered.take(pIdx).toSeq else ordered.toSeq
      val touches = kept.filter(_ != "purchase")
      val end = if (pIdx >= 0) "__conv__" else "__null__"
      val path = "__start__" +: touches :+ end
      path.zip(path.tail).foreach(p => trans(p) += 1L)
    }
    def solve(removed: Option[String]): Double = {
      val t = trans.toSeq.collect {
        case ((s, d), c) if !removed.contains(s) =>
          (s, if (removed.contains(d)) "__null__" else d, c)
      }
      val byS = t.groupBy(_._1)
      val outs = byS.view.mapValues(_.map(_._3).sum.toDouble).toMap
      val states = (t.map(_._1) ++ t.map(_._2)).distinct
      var p = states.map(s => s -> (if (s == "__conv__") 1.0 else 0.0)).toMap
      for (_ <- 1 to MlEvalQueries.MarkovIters)
        p = states.map { s =>
          s -> (if (s == "__conv__") 1.0 else if (s == "__null__") 0.0
          else byS.get(s).map(_.map { case (_, d, c) => c / outs(s) * p(d) }.sum)
            .getOrElse(0.0))
        }.toMap
      p.getOrElse("__start__", 0.0)
    }
    val base = solve(None)
    val effects = MlEvalQueries.MarkovChannels
      .map(c => c -> (base - solve(Some(c)))).toMap
    val tot = effects.values.sum
    rows.foreach { r =>
      val c = r.getString(0)
      assert(math.abs(r.getDouble(1) - base) < 1e-6, s"$c base")
      assert(math.abs(r.getDouble(3) - effects(c)) < 1e-6, s"$c effect")
      assert(r.getDouble(3) >= -1e-9, s"$c effect must be non-negative")
      if (tot != 0.0)
        assert(math.abs(r.getDouble(4) - effects(c) / tot) < 1e-6, s"$c share")
    }
    // shares sum to 1 when any channel carries credit
    if (tot != 0.0)
      assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-5)
  }
}
