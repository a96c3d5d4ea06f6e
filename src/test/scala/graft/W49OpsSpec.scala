package graft

import org.apache.spark.sql.functions._
import graft.queries.{MlEvalQueries, TimeseriesQueries}
import graft.text.{FeatureQueries, PipelineQueries}

/** Wave-49 operators: k-anonymity audit (q239), time-grid gap fill
  * (q241), Mann–Whitney rank-sum (q243), Theil–Sen robust trend
  * (q244), held-out Kneser–Ney bigram LM (q245), each cross-checked
  * by an independent driver-side recompute.
  */
class W49OpsSpec extends GraftSpec {

  test("q239: histogram partitions the customer table and flags the fixture's singleton mass") {
    val rows = PipelineQueries.q239KAnonymity(spark, sfDir).collect()
    val nCust = Tables.customer(spark, sfDir).count()
    assert(rows.map(_.getLong(2)).sum == nCust, "n_rows sums to the customer count")
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(0) * r.getLong(1),
        "n_rows = class_size * n_classes")
      assert((r.getInt(4) == 1) == (r.getLong(0) < PipelineQueries.KAnonK))
      assert(math.abs(r.getDouble(3) - r.getLong(2).toDouble / nCust) < 1e-5)
    }
    // the audit must surface REAL re-identification risk on the fixture
    val singletons = rows.find(_.getLong(0) == 1L).map(_.getDouble(3)).getOrElse(0.0)
    assert(singletons > 0.1,
      s"the (nation, segment, band) QI must leave a singleton mass, got $singletons")
  }

  test("q241: grid is complete, observed hours exact, gaps interpolate their brackets") {
    val rows = TimeseriesQueries.q241GapFill(spark, sfDir).collect()
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (_, rs) =>
      val hs = rs.map(_.getLong(1))
      assert(hs.max - hs.min + 1 == rs.length, "hour grid has no holes")
      assert(rs.forall(r => !r.isNullAt(3)), "every grid hour carries a value")
    }
    // interpolation recompute: every unobserved row sits on the line
    // between its bracketing observed rows (or extends a boundary)
    byType.foreach { case (_, rs) =>
      val sortedRs = rs.sortBy(_.getLong(1))
      val obsIdx = sortedRs.zipWithIndex.filter(_._1.getInt(2) == 1).map(_._2)
      sortedRs.zipWithIndex.filter(_._1.getInt(2) == 0).foreach { case (r, i) =>
        val prev = obsIdx.filter(_ < i).lastOption
        val next = obsIdx.find(_ > i)
        val expect = (prev, next) match {
          case (Some(p), Some(n)) =>
            val (pr, nr) = (sortedRs(p), sortedRs(n))
            pr.getDouble(3) + (nr.getDouble(3) - pr.getDouble(3)) *
              (r.getLong(1) - pr.getLong(1)).toDouble /
              (nr.getLong(1) - pr.getLong(1))
          case (Some(p), None) => sortedRs(p).getDouble(3)
          case (None, Some(n)) => sortedRs(n).getDouble(3)
          case _ => fail("a type with no observations cannot be in the grid")
        }
        assert(math.abs(r.getDouble(3) - expect) < 1e-5, "linear interpolation")
      }
    }
    // the operator must have real work to do on the fixture
    assert(rows.exists(_.getInt(2) == 0), "fixture must contain empty hours")
  }

  test("q243: U, z and AUC recompute from a naive driver-side ranking") {
    val r = MlEvalQueries.q243RankSum(spark, sfDir).collect().head
    val pool = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("purchase", "click"))
      .select(round(col("value"), 6).as("v"),
        (col("event_type") === "purchase").as("grp"))
      .collect().map(x => (x.getDouble(0), x.getBoolean(1)))
    // naive average ranks (1-based, ties share the mean rank)
    val sorted = pool.sortBy(_._1)
    val rank = scala.collection.mutable.Map.empty[Double, Double]
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
      rank(sorted(i)._1) = (i + 1 + j) / 2.0 // mean of ranks i+1..j
      i = j
    }
    val n1 = pool.count(_._2).toLong
    val n2 = pool.length - n1
    val r1 = pool.filter(_._2).map(p => rank(p._1)).sum
    val u1 = r1 - n1 * (n1 + 1) / 2.0
    assert(r.getLong(0) == n1 && r.getLong(1) == n2)
    assert(math.abs(r.getDouble(2) - u1) < 1e-5, "U1 recompute")
    assert(math.abs(r.getDouble(3) - u1 / (n1 * n2)) < 1e-5, "AUC = U/(n1·n2)")
    assert(r.getDouble(3) > 0.0 && r.getDouble(3) < 1.0)
    // AUC from the rank side equals the pairwise win probability
    val ties = sorted.groupBy(_._1).values.map(_.length.toLong)
      .map(t => t.toDouble * t * t - t).sum
    val sigma = math.sqrt(n1 * n2 / 12.0 *
      ((n1 + n2 + 1) - ties / ((n1 + n2) * (n1 + n2 - 1.0))))
    assert(math.abs(r.getDouble(4) - (u1 - n1 * n2 / 2.0) / sigma) < 1e-5,
      "tie-corrected z recompute")
  }

  test("q244: slope/intercept are the exact pairwise medians and the estimator resists outliers") {
    val out = TimeseriesQueries.q244TheilSen(spark, sfDir).collect().head
    val samp = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase" &&
        pmod(graft.functions.MathFunctions.hash32(
          concat(lit("ts:"), col("event_id").cast("string"))),
          lit(TimeseriesQueries.TheilSenSampleMod)) === 0)
      .select(expr("ts div 1000000000").as("x"), round(col("value"), 6).as("y"))
      .collect().map(x => (x.getLong(0), x.getDouble(1)))
    assert(out.getLong(0) == samp.length.toLong, "n_sample matches the hash sample")
    val slopes = (for {
      a <- samp; b <- samp if a._1 < b._1
    } yield (b._2 - a._2) / (b._1 - a._1).toDouble * 3600.0).sorted
    assert(out.getLong(1) == slopes.length.toLong, "n_pairs = strict x-ordered pairs")
    def medianOf(v: Array[Double]): Double = {
      val n = v.length
      if (n % 2 == 1) v(n / 2) else (v(n / 2 - 1) + v(n / 2)) / 2.0
    }
    val m = medianOf(slopes)
    assert(math.abs(out.getDouble(2) - m) < 1e-5, "median slope recompute")
    val resid = samp.map { case (x, y) => y - m / 3600.0 * x }.sorted
    assert(math.abs(out.getDouble(3) - medianOf(resid)) < 1e-5,
      "median-residual intercept recompute")
    // robustness: corrupting 25% of the sample's values by +1e6 moves
    // the OLS slope but leaves the Theil-Sen median slope bounded
    val corrupted = samp.zipWithIndex.map { case ((x, y), i) =>
      if (i % 4 == 0) (x, y + 1e6) else (x, y)
    }
    val cs = (for {
      a <- corrupted; b <- corrupted if a._1 < b._1
    } yield (b._2 - a._2) / (b._1 - a._1).toDouble * 3600.0).sorted
    val cm = medianOf(cs)
    def ols(pts: Array[(Long, Double)]): Double = {
      val n = pts.length.toDouble
      val sx = pts.map(_._1.toDouble).sum; val sy = pts.map(_._2).sum
      val sxx = pts.map(p => p._1.toDouble * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      (n * sxy - sx * sy) / (n * sxx - sx * sx) * 3600.0
    }
    val olsShift = math.abs(ols(corrupted) - ols(samp))
    assert(math.abs(cm - m) < olsShift / 10.0,
      s"Theil-Sen shift ${math.abs(cm - m)} must be far under OLS shift $olsShift")
  }

  test("q245: held-out KN NLL recomputes exactly from raw train/test counts") {
    val rows = FeatureQueries.q245KnBigram(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3) - math.exp(r.getDouble(2))) < 1e-4,
        "ppl = exp(avg_nll)")
      assert(r.getDouble(3) > 1.0, "a language model must beat certainty")
    }
    // full driver-side replay of the protocol on sf0.001
    val docs = Tables.documents(spark, sfDir)
      .select(col("lang"), col("text"),
        (pmod(graft.functions.MathFunctions.hash32(
          concat(lit("lm:"), col("doc_id"))), lit(FeatureQueries.LmTrainMod))
          < FeatureQueries.LmTrainPct).as("is_train"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    def bigrams(t: String) = {
      val w = t.split(" ", -1); w.dropRight(1).zip(w.drop(1))
    }
    val train = docs.filter(_._3).flatMap(d => bigrams(d._2))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val c1 = train.groupBy(_._1._1).map { case (w1, m) =>
      w1 -> (m.values.sum, m.size.toLong) } // (c1, n1fwd)
    val rev = train.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toLong }
    val btypes = train.size.toLong
    val v = c1.size.toLong
    val d = FeatureQueries.LmDiscount
    val test0 = docs.filterNot(_._3)
      .flatMap(dd => bigrams(dd._2).map(b => (dd._1, b)))
    val byLang = test0.groupBy(_._1)
    byLang.foreach { case (lang, pairs) =>
      val nlls = pairs.map { case (_, (w1, w2)) =>
        val pc = (rev.getOrElse(w2, 0L) + 1.0) / (btypes + v)
        val p = c1.get(w1) match {
          case None => pc
          case Some((cc1, n1fwd)) =>
            (math.max(train.getOrElse((w1, w2), 0L) - d, 0.0) +
              d * n1fwd * pc) / cc1
        }
        BigDecimal(-math.log(p)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }
      val avg = (nlls.sum / nlls.length).toDouble
      val row = rows.find(_.getString(0) == lang).get
      assert(row.getLong(1) == pairs.length.toLong, s"$lang held-out bigram count")
      assert(math.abs(row.getDouble(2) - avg) < 1e-5, s"$lang avg NLL recompute")
    }
  }
}
