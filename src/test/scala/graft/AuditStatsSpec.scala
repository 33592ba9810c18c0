package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Pins the round-9 audit/segmentation surfaces' logic on hand-built or
  * closed-form data: Benford reference constants, KS distance against a
  * brute-force computation, RFM bucket arithmetic, basket lift sanity,
  * URL canonicalization edge cases, and the k-core peel fixpoint.
  * (Hash-exactness vs DuckDB is the oracle gate's job; these specs pin
  * the parts a same-mistake-on-both-sides bug could hide.) */
class AuditStatsSpec extends AnyFunSpec with Matchers with SparkTestBase {

  import spark.implicits._

  describe("dedup_editdist (banded primary vs the brute anchor)") {
    // the r8 count-filter form survives here as the brute anchor: the
    // q-gram bound (dist <= T  =>  shared >= len-2-3T) makes the
    // count-filter-verified set EQUAL to the brute all-pairs verified
    // set, so banded-candidates + verify must be a SUBSET of it, with
    // every identical-key pair recovered deterministically (identical
    // strings share every signature band by construction)
    it("emits only true group pairs with exact counts; identical-key groups always pair") {
      val out = SparkEntry.allDefs("dedup_editdist").fn(spark, sfDir)
        .select("probe_id", "orig_id", "dist", "n_probe_dups", "n_orig_dups")
        .as[(Long, Long, Long, Long, Long)].collect()
      val docs = Tables.documents(spark, sfDir)
        .select(col("doc_id"), substring(col("text"), 1, 64).as("k"))
        .as[(Long, String)].collect()
      val probeRows = docs.filter(_._1 % 10 == 0).map { case (id, _) =>
        val pk = ("pfx" + (id * 7919 % 97) + " " + Tables.documents(spark, sfDir)
          .filter(col("doc_id") === id).select("text").as[String].head()).take(64)
        (id + 10000000L, pk)
      }
      // exact-key collapse, exactly like the surface: (key -> min id, n)
      val baseGroups = docs.groupBy(_._2).map { case (k, rs) =>
        (rs.map(_._1).min, (k, rs.length.toLong)) }
      val probeGroups = probeRows.groupBy(_._2).map { case (k, rs) =>
        (rs.map(_._1).min, (k, rs.length.toLong)) }
      def lev(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      out.foreach { case (pid, oid, dist, np, no) =>
        val (pk, pn) = probeGroups(pid)
        val (k, on) = baseGroups(oid)
        dist shouldBe lev(pk, k).toLong
        dist should be <= 14L
        np shouldBe pn
        no shouldBe on
      }
      // identical keys share every signature band by construction, so
      // a probe GROUP whose key equals an orig group's key must pair
      val outSet = out.map(t => (t._1, t._2)).toSet
      for {
        (pid, (pk, _)) <- probeGroups
        (oid, (k, _)) <- baseGroups
        if pk == k
      } outSet should contain((pid, oid))
      out.length should be > 0
    }
  }

  describe("trace_self_time") {
    it("matches an in-memory heap-tree interval computation") {
      val sp = graft.operators.SpanOps
        .spansFromEvents(Tables.events(spark, sfDir))
        .select(col("trace_id"), col("span_id"), col("service"),
          col("start_us"), col("duration_us"))
        .as[(String, Long, String, Long, Long)].collect()
      val expected = scala.collection.mutable.Map
        .empty[String, (Long, Long, Long)].withDefaultValue((0L, 0L, 0L))
      sp.groupBy(_._1).foreach { case (_, rows) =>
        val ordered = rows.sortBy(r => (r._4, r._2)) // pos = rank by (start, span)
        val n = ordered.length
        for (p <- 1 to n) {
          val (_, _, svc, st, du) = ordered(p - 1)
          val end = st + du
          val ch = Seq(2 * p, 2 * p + 1).filter(_ <= n).map(c => ordered(c - 1))
            .map(c => (c._4, c._4 + c._5))
          def ov(c: (Long, Long)) = math.max(0L, math.min(c._2, end) - math.max(c._1, st))
          val covered = ch match {
            case Seq() => 0L
            case Seq(c) => ov(c)
            case Seq(c1, c2) =>
              val inter = math.max(0L,
                math.min(math.min(c1._2, c2._2), end) -
                  math.max(math.max(c1._1, c2._1), st))
              ov(c1) + ov(c2) - inter
          }
          val (cn, ct, cs) = expected(svc)
          expected(svc) = (cn + 1, ct + du, cs + (du - covered))
        }
      }
      val got = SparkEntry.allDefs("trace_self_time").fn(spark, sfDir)
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      got shouldBe expected.toMap
      // self-time can never exceed total time
      got.values.foreach { case (_, tot, self) => self should be <= tot }
    }
  }

  describe("embed_knn_label_eval") {
    it("matches brute cell-majority voting with smallest-label tie-break") {
      val embs = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").cast("array<double>"), col("label"))
        .as[(Long, Array[Double], Int)].collect()
      val cells = bruteCells(embs.toSeq.map(e => (e._1, milliQ(e._2))))
      val labels = embs.map(e => e._1 -> e._3).toMap
      val expected = embs.flatMap { case (aid, _, la) =>
        val mates = embs.filter(e => e._1 != aid && cells(e._1) == cells(aid))
        if (mates.isEmpty) None
        else {
          val counts = mates.groupBy(_._3).map { case (l, g) => (l, g.length) }
          val best = counts.toSeq.minBy { case (l, c) => (-c, l) }._1
          Some((la.toLong, best.toLong))
        }
      }.groupBy(identity).map { case ((l, p), g) => (l, p, g.length.toLong) }
        .toSeq.sorted
      val got = SparkEntry.allDefs("embed_knn_label_eval").fn(spark, sfDir)
        .as[(Long, Long, Long)].collect().toSeq.sorted
      got shouldBe expected
      labels.size should be >= got.map(_._3).sum.toInt // drops only singletons
    }
  }

  describe("q_benford") {
    it("uses floor(1e6*log10(1+1/d)) literals") {
      val expected = (1 to 9).map(d => math.floor(1e6 * math.log10(1.0 + 1.0 / d)).toLong)
      val got = SparkEntry.allDefs("q_benford").fn(spark, sfDir)
        .orderBy("digit").select("benford_ppm").as[Long].collect().toSeq
      got shouldBe expected
    }
    it("shares sum to <= 1e6 and deviations are share - reference") {
      val rows = SparkEntry.allDefs("q_benford").fn(spark, sfDir)
        .select("share_ppm", "benford_ppm", "dev_ppm")
        .as[(Long, Long, Long)].collect()
      rows.map(_._1).sum should be <= 1000000L
      rows.foreach { case (s, b, d) => d shouldBe (s - b) }
    }
  }

  describe("q_ks_test") {
    it("matches the brute-force two-sample KS distance on the test data") {
      val li = Tables.lineitem(spark, sfDir)
        .filter(col("l_returnflag").isin("R", "A"))
        .select(col("l_returnflag").as("flag"),
          expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)").as("cents"))
        .as[(String, Long)].collect()
      val s1 = li.collect { case ("R", c) => c }.sorted
      val s2 = li.collect { case ("A", c) => c }.sorted
      val grid = (s1 ++ s2).distinct.sorted
      val dNum = grid.map { v =>
        val c1 = s1.count(_ <= v).toLong
        val c2 = s2.count(_ <= v).toLong
        math.abs(c1 * s2.length - c2 * s1.length)
      }.max
      val expected = dNum * 1000000L / (s1.length.toLong * s2.length)
      val Array((n1, n2, dPpm)) = SparkEntry.allDefs("q_ks_test").fn(spark, sfDir)
        .as[(Long, Long, Long)].collect()
      n1 shouldBe s1.length.toLong
      n2 shouldBe s2.length.toLong
      dPpm shouldBe expected
    }
  }

  describe("q_rfm") {
    it("buckets ranks into 1..5 with the exact ((r-1)*5) div n + 1 rule") {
      val df = SparkEntry.allDefs("q_rfm").fn(spark, sfDir)
      val n = df.count()
      val scores = df.select("r_score", "f_score", "m_score")
        .as[(Long, Long, Long)].collect()
      all(scores.flatMap(t => Seq(t._1, t._2, t._3))) should (be >= 1L and be <= 5L)
      // rank-based buckets are near-equal-sized: each quintile holds
      // floor(n/5) or ceil(n/5) customers
      val byBucket = scores.groupBy(_._3).view.mapValues(_.length).toMap
      byBucket.values.foreach { c =>
        c should (be >= (n / 5).toInt and be <= (n / 5 + 1).toInt)
      }
      // segment string is the concatenation of the three scores
      val segs = df.select("r_score", "f_score", "m_score", "segment")
        .as[(Long, Long, Long, String)].collect()
      segs.foreach { case (r, f, m, s) => s shouldBe s"$r$f$m" }
    }
  }

  describe("q_basket_pairs") {
    it("support and lift are the exact floor-ppm fractions") {
      val rows = SparkEntry.allDefs("q_basket_pairs").fn(spark, sfDir).collect()
      rows.length should be > 0
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct().as[(Long, Long)].collect()
      val nBaskets = li.map(_._1).distinct.length.toLong
      val itemCnt = li.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val pairCnt = li.groupBy(_._1).values
        .flatMap(b => b.map(_._2).sorted.combinations(2).map(_.toSeq))
        .toSeq.groupBy(identity).view.mapValues(_.length.toLong).toMap
      rows.foreach { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        val pc = r.getLong(2)
        pairCnt(Seq(a, b)) shouldBe pc
        r.getLong(3) shouldBe pc * 1000000L / nBaskets
        r.getLong(4) shouldBe (BigInt(pc) * nBaskets * 1000000 /
          (BigInt(itemCnt(a)) * itemCnt(b))).toLong
      }
    }
  }

  describe("dedup_url canonicalization") {
    val canon = SparkEntry.allDefs("dedup_url")

    it("canonical urls are lowercase, fragment/utm/port/www/trailing-slash free") {
      val urls = canon.fn(spark, sfDir).select("canonical_url").as[String].collect()
      urls.foreach { u =>
        u shouldBe u.toLowerCase
        u should not include "#"
        u should not include "utm_"
        u should not include ":443"
        u should not include "www."
        u should not endWith "/"
        u should startWith("https://")
      }
    }
    it("collapses the deliberate div-140 path collisions") {
      // ids k, k+20, ..., k+120 share source AND path; across host-
      // spelling noise at least one canonical url absorbs >1 raw variant
      val df = canon.fn(spark, sfDir)
      df.filter(col("n_variants") > 1).count() should be > 0L
      // keep_id is the smallest doc_id of the group: sum of keep_ids
      // equals sum of per-group min over a recomputation
      val total = df.agg(sum("n_variants")).as[Long].head()
      total shouldBe Tables.documents(spark, sfDir).count()
    }
  }

  describe("trace_shortest_path") {
    it("matches Floyd-Warshall over the extracted edge weights") {
      val rows = SparkEntry.allDefs("trace_shortest_path").fn(spark, sfDir)
        .as[(String, String, Long)].collect()
      // rebuild the edge relation exactly as the query defines it
      val sp = graft.operators.SpanOps.spansFromEvents(Tables.events(spark, sfDir))
        .select("span_id", "parent_span_id", "service", "duration_us")
      val edges = sp.as("c")
        .join(sp.as("p"), col("c.parent_span_id") === col("p.span_id"))
        .filter(col("p.service") =!= col("c.service"))
        .groupBy(col("p.service").as("src"), col("c.service").as("dst"))
        .agg(expr("sum(c.duration_us) div count(1)").as("w"))
        .as[(String, String, Long)].collect()
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      var dist = edges.map(e => (e._1, e._2) -> e._3).toMap
      // Floyd-Warshall gives true all-pairs shortest (any hop count);
      // on this graph (diameter << 8) the 3-squaring result must agree
      for (k <- nodes; i <- nodes; j <- nodes) {
        (dist.get((i, k)), dist.get((k, j))) match {
          case (Some(a), Some(b)) =>
            if (dist.get((i, j)).forall(_ > a + b)) dist += (i, j) -> (a + b)
          case _ =>
        }
      }
      rows.map(r => (r._1, r._2) -> r._3).toMap shouldBe dist
    }
  }

  describe("trace_worst_path") {
    it("matches 8 rounds of brute-force max-plus relaxation") {
      val rows = SparkEntry.allDefs("trace_worst_path").fn(spark, sfDir)
        .as[(String, String, Long)].collect()
      val edges = graft.operators.SpanOps.spansFromEvents(Tables.events(spark, sfDir))
        .select("span_id", "parent_span_id", "service", "duration_us").as("c")
        .join(graft.operators.SpanOps.spansFromEvents(Tables.events(spark, sfDir))
          .select("span_id", "parent_span_id", "service", "duration_us").as("p"),
          col("c.parent_span_id") === col("p.span_id"))
        .filter(col("p.service") =!= col("c.service"))
        .groupBy(col("p.service").as("src"), col("c.service").as("dst"))
        .agg(expr("sum(c.duration_us) div count(1)").as("w"))
        .as[(String, String, Long)].collect()
      var best = edges.map(e => (e._1, e._2) -> e._3).toMap
      (2 to 8).foreach { _ =>
        val ext = for {
          ((s1, d1), w1) <- best.toSeq
          ((s2, d2), w2) <- edges.map(e => (e._1, e._2) -> e._3)
          if d1 == s2
        } yield (s1, d2) -> (w1 + w2)
        best = (best.toSeq ++ ext).groupBy(_._1).view
          .mapValues(_.map(_._2).max).toMap
      }
      rows.map(r => (r._1, r._2) -> r._3).toMap shouldBe best
    }
  }

  describe("trace_acf") {
    it("matches the brute-force lag-k autocorrelation per service") {
      val hourly = graft.operators.SpanOps
        .spansFromEvents(Tables.events(spark, sfDir))
        .groupBy(col("service"), expr("start_us div 3600000000").as("hr"))
        .agg(count(lit(1)).as("x"))
        .as[(String, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3.toDouble)).toMap
      val got = SparkEntry.allDefs("trace_acf").fn(spark, sfDir)
        .select("service", "lag", "acf").as[(String, Long, Double)].collect()
      got.foreach { case (svc, k, acf) =>
        val xs = hourly(svc)
        val mean = xs.sum / xs.length
        val den = xs.map(v => (v - mean) * (v - mean)).sum
        val num = xs.dropRight(k.toInt).zip(xs.drop(k.toInt))
          .map { case (a, b) => (a - mean) * (b - mean) }.sum
        acf shouldBe (num / den) +- 1e-9
      }
    }
  }

  describe("q_theil") {
    it("matches the brute-force Theil-T index per nation") {
      val spend = Tables.orders(spark, sfDir)
        .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name", "o_custkey")
        .agg(sum(expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")).as("x"))
        .as[(String, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._3)).toMap
      val got = SparkEntry.allDefs("q_theil").fn(spark, sfDir)
        .select("n_name", "theil").as[(String, Double)].collect()
      got.foreach { case (nation, theil) =>
        val xs = spend(nation).map(_.toDouble)
        val s = xs.sum
        val expected = xs.map(x => x / s * math.log(x * xs.length / s)).sum
        theil shouldBe expected +- 1e-5
      }
    }
  }

  describe("q_runs_test") {
    it("matches the brute-force runs count over the daily sign sequence") {
      val daily = Tables.orders(spark, sfDir)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
        .agg(sum(expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")).as("x"))
        .as[(String, Long)].collect().sortBy(_._1)
      val n = daily.length
      val s = daily.map(v => BigInt(v._2)).sum
      val signs = daily.map(v => BigInt(v._2) * n > s)
      val runs = 1 + signs.sliding(2).count(p => p(0) != p(1))
      val Array((nDays, nAbove, nBelow, gotRuns, expMilli)) =
        SparkEntry.allDefs("q_runs_test").fn(spark, sfDir)
          .as[(Long, Long, Long, Long, Long)].collect()
      nDays shouldBe n.toLong
      nAbove shouldBe signs.count(identity).toLong
      nBelow shouldBe signs.count(!_).toLong
      gotRuns shouldBe runs.toLong
      expMilli shouldBe ((BigInt(2) * nAbove * nBelow + n) * 1000 / n).toLong
    }
  }

  describe("q_bollinger") {
    it("matches the brute-force rolling mean and population sigma") {
      val rows = SparkEntry.allDefs("q_bollinger").fn(spark, sfDir)
        .select("n_name", "day", "spend_c", "ma20", "sigma", "upper", "lower")
        .as[(String, String, Long, Double, Double, Double, Double)].collect()
      val byNation = rows.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      byNation.values.foreach { series =>
        series.zipWithIndex.foreach { case ((_, _, _, ma, sigma, up, lo), i) =>
          val frame = series.slice(math.max(0, i - 19), i + 1).map(_._3.toDouble)
          val mean = frame.sum / frame.length
          val svar = frame.map(v => (v - mean) * (v - mean)).sum / frame.length
          ma shouldBe mean +- 1e-6
          sigma shouldBe math.sqrt(svar) +- 1e-6
          up shouldBe (ma + 2 * sigma) +- 1e-9
          lo shouldBe (ma - 2 * sigma) +- 1e-9
        }
      }
    }
  }

  describe("q_abc_pareto") {
    it("matches the brute-force cumulative-share classification") {
      val rev = Tables.lineitem(spark, sfDir)
        .groupBy(col("l_partkey").as("partkey"))
        .agg(sum(expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)")).as("rev_c"))
        .as[(Long, Long)].collect()
        .sortBy { case (pk, r) => (-r, pk) }
      val total = rev.map(v => BigInt(v._2)).sum
      var cum = BigInt(0)
      val classes = rev.map { case (_, r) =>
        cum += r
        if (cum * 100 <= total * 80) "A" else if (cum * 100 <= total * 95) "B" else "C"
      }
      val expected = classes.zip(rev).groupBy(_._1).view.mapValues { g =>
        (g.length.toLong, g.map(v => BigInt(v._2._2)).sum)
      }.toMap
      val got = SparkEntry.allDefs("q_abc_pareto").fn(spark, sfDir)
        .as[(String, Long, Long, Long)].collect()
      got.map(_._1).toSeq shouldBe Seq("A", "B", "C")
      got.foreach { case (cls, nParts, clsRev, sharePpm) =>
        val (en, er) = expected(cls)
        nParts shouldBe en
        clsRev shouldBe er.toLong
        sharePpm shouldBe (er * 1000000 / total).toLong
      }
    }
  }

  describe("embed_jl_projection") {
    it("distortion concentrates around 1e6 ppm and one pair recomputes exactly") {
      val rows = SparkEntry.allDefs("embed_jl_projection").fn(spark, sfDir)
        .as[(Long, Long, Long, Long, Long)].collect()
      rows.length should be > 10
      // E[d2_proj] = 16 * d2_orig for +-1 JL entries; the mean ratio
      // over all pairs should land well inside [0.5e6, 1.5e6]
      val meanRatio = rows.map(_._5).sum / rows.length
      meanRatio should (be > 500000L and be < 1500000L)
      // exact recompute of the first pair from raw embeddings
      val (va, vb, d2o, d2p, ppm) = rows.minBy(_._1)
      val q = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT))").as("q"))
        .filter(col("vec_id").isin(va, vb))
        .as[(Long, Seq[Long])].collect().toMap
      val (qa, qb) = (q(va), q(vb))
      def sign(i: Int, j: Int): Long =
        1L - 2L * (java.lang.Long.bitCount((((i + j * 64) * 2654435761L) % 2147483648L) * 2246822519L) % 2L)
      def proj(v: Seq[Long]): Seq[Long] =
        (0 until 16).map(j => (0 until 64).map(i => sign(i, j) * v(i)).sum)
      val (ya, yb) = (proj(qa), proj(qb))
      d2o shouldBe qa.zip(qb).map { case (x, y) => (x - y) * (x - y) }.sum
      d2p shouldBe ya.zip(yb).map { case (x, y) => (x - y) * (x - y) }.sum
      ppm shouldBe (BigInt(d2p) * 1000000 / (BigInt(16) * d2o)).toLong
    }
  }

  describe("q_cramers_v") {
    it("V lands in [0,1] and squares back to chi2/(n*dof)") {
      val Array((nTot, nRows, nCols, chi2, dof, v)) =
        SparkEntry.allDefs("q_cramers_v").fn(spark, sfDir)
          .as[(Long, Long, Long, Double, Long, Double)].collect()
      dof shouldBe math.min(nRows - 1, nCols - 1)
      v should (be >= 0.0 and be <= 1.0)
      v * v shouldBe (chi2 / (nTot * dof)) +- 1e-12
    }
  }

  describe("trace_bootstrap_ci") {
    it("brackets the point mean and recomputes one replicate exactly") {
      val rows = SparkEntry.allDefs("trace_bootstrap_ci").fn(spark, sfDir)
        .as[(String, Long, Long, Long, Long)].collect()
      rows.length should be > 0
      rows.foreach { case (_, point, lo, hi, nRep) =>
        nRep shouldBe 40L
        lo should be <= hi
        // percentile-bootstrap bounds straddle the point estimate on
        // any non-degenerate sample
        lo should be <= point
        hi should be >= point
      }
      // recompute replicate r=1 for one service from the span relation
      val svc = rows.head._1
      val sp = graft.operators.SpanOps.spansFromEvents(Tables.events(spark, sfDir))
        .filter(col("service") === svc)
        .select("span_id", "duration_us").as[(Long, Long)].collect()
      def w(spanId: Long, r: Long): Long = {
        val u = ((((spanId % 1048576) + r * 1048573L) * 2654435761L) / 1024L) % 1000000L
        if (u < 367879) 0 else if (u < 735758) 1 else if (u < 919698) 2
        else if (u < 981011) 3 else if (u < 996340) 4 else if (u < 999405) 5 else 6
      }
      val reps = (1L to 40L).map { r =>
        val ws = sp.map { case (id, d) => (w(id, r), d) }
        val sw = ws.map(_._1).sum
        (ws.map { case (wt, d) => BigInt(wt) * d }.sum / sw).toLong
      }.sorted
      val got = SparkEntry.allDefs("trace_bootstrap_ci").fn(spark, sfDir)
        .filter(col("service") === svc)
        .select("boot_lo_us", "boot_hi_us").as[(Long, Long)].head()
      got._1 shouldBe reps(1)  // rank 2
      got._2 shouldBe reps(38) // rank 39
    }
  }

  describe("embed_kcenter") {
    it("matches brute-force farthest-first traversal with non-increasing radii") {
      val got = SparkEntry.allDefs("embed_kcenter").fn(spark, sfDir)
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      val vecs = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT))").as("q"))
        .as[(Long, Seq[Long])].collect().toMap
      def d2(a: Seq[Long], b: Seq[Long]): Long =
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      var picked = List(vecs.keys.min)
      val expect = scala.collection.mutable.Buffer[(Long, Long, Long)]((1L, picked.head, 0L))
      (2 to 8).foreach { r =>
        val (id, dist) = vecs.view.filterKeys(!picked.contains(_))
          .map { case (id, v) => (id, picked.map(p => d2(v, vecs(p))).min) }
          .toSeq.maxBy { case (id, d) => (d, -id) }
        expect += ((r.toLong, id, dist))
        picked = picked :+ id
      }
      got.toSeq shouldBe expect.toSeq
      // the covering-radius sequence never increases
      got.drop(2).map(_._3).zip(got.drop(1).map(_._3)).foreach {
        case (next, prev) => next should be <= prev
      }
    }
  }

  describe("q_mad_outliers") {
    it("matches brute-force discrete medians and the 5-MAD cut") {
      val vals = Tables.lineitem(spark, sfDir)
        .select(col("l_returnflag"),
          expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"))
        .as[(String, Long)].collect().groupBy(_._1)
      def discMedian(xs: Seq[Long]): Long = {
        val s = xs.sorted
        s((s.length + 1) / 2 - 1) // smallest value with cum >= n/2
      }
      val got = SparkEntry.allDefs("q_mad_outliers").fn(spark, sfDir)
        .as[(String, Long, Long, Long, Long, Long)].collect()
      got.foreach { case (flag, medC, madC, nItems, nOut, ppm) =>
        val xs = vals(flag).map(_._2).toSeq
        val med = discMedian(xs)
        val mad = discMedian(xs.map(x => math.abs(x - med)))
        medC shouldBe med
        madC shouldBe mad
        nItems shouldBe xs.length.toLong
        nOut shouldBe xs.count(x => math.abs(x - med) > 5 * mad).toLong
        ppm shouldBe nOut * 1000000 / nItems
      }
    }
  }

  describe("q_rolling_corr") {
    it("matches brute-force windowed Pearson correlation") {
      // sf0.001 has no 20-day run where both nations trade - use sf0.01
      val sfDir = "/root/testdata/sf0.01"
      val rows = SparkEntry.allDefs("q_rolling_corr").fn(spark, sfDir)
        .as[(String, Long, Long, Double)].collect().sortBy(_._1)
      rows.length should be > 0
      // rebuild the joined daily series
      val daily = Tables.orders(spark, sfDir)
        .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
        .filter(col("n_name").isin("NATION_0", "NATION_1"))
        .groupBy(col("n_name"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
        .agg(sum(expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")).as("v"))
        .as[(String, String, Long)].collect()
      val x = daily.filter(_._1 == "NATION_0").map(r => r._2 -> r._3).toMap
      val y = daily.filter(_._1 == "NATION_1").map(r => r._2 -> r._3).toMap
      val series = x.keySet.intersect(y.keySet).toSeq.sorted
        .map(d => (d, x(d).toDouble, y(d).toDouble))
      val byDay = rows.map(r => r._1 -> r._4).toMap
      series.zipWithIndex.drop(19).foreach { case ((d, _, _), i) =>
        val f = series.slice(i - 19, i + 1)
        val (xs, ys) = (f.map(_._2), f.map(_._3))
        val (mx, my) = (xs.sum / 20, ys.sum / 20)
        val num = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
        val den = math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum) *
          math.sqrt(ys.map(b => (b - my) * (b - my)).sum)
        byDay(d) shouldBe (num / den) +- 1e-9
      }
    }
  }

  describe("ann_recall_jl") {
    it("candidate recall lands far above the 10% chance floor") {
      // 500 vectors (sf0.01) make chance recall ~1%; 50 (sf0.001) too few
      val Array((hits, truth, recall)) =
        SparkEntry.allDefs("ann_recall_jl").fn(spark, "/root/testdata/sf0.01")
          .as[(Long, Long, Double)].collect()
      truth shouldBe 50L
      hits should be <= 50L
      // a random 50-of-490 candidate set keeps ~10.2% of the top-5;
      // the projection must keep far more
      recall should be > 0.4
    }
  }

  describe("q_weighted_sample") {
    it("matches the brute-force Efraimidis-Spirakis ranking and skews to weight") {
      val base = Tables.orders(spark, sfDir)
        .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("o_orderkey"),
          expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").as("spend_c"))
        .as[(String, Long, Long)].collect()
      def u(ok: Long): Long = (((ok % 1048576) * 2654435761L) / 1024) % 1000000 + 1
      val expect = base.groupBy(_._1).iterator.flatMap { case (nation, rows) =>
        rows.sortBy { case (_, ok, w) =>
          (-(math.log(u(ok).toDouble) - math.log(1000000d)) / w, ok)
        }.take(10).zipWithIndex.map { case ((_, ok, w), i) =>
          (nation, i + 1L, ok, w, u(ok))
        }
      }.toSet
      val got = SparkEntry.allDefs("q_weighted_sample").fn(spark, sfDir)
        .as[(String, Long, Long, Long, Long)].collect().toSet
      got shouldBe expect
      // probability-proportional-to-size: the sampled mean spend must
      // exceed the population mean by a clear margin
      val sampMean = got.toSeq.map(_._4).sum.toDouble / got.size
      val popMean = base.map(_._3).sum.toDouble / base.length
      sampMean should be > popMean * 1.2
    }
  }

  describe("q_lorenz") {
    it("cumulative shares are monotone and close at exactly 1e6 ppm") {
      val rows = SparkEntry.allDefs("q_lorenz").fn(spark, sfDir)
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
      rows.map(_._1) shouldBe (1L to 10L)
      // cum share monotone, below the diagonal... the LAST cum is the
      // full total: floor-ppm of S/S = exactly 1e6
      rows.map(_._5).sliding(2).foreach(p => p(0) should be <= p(1))
      rows.last._5 shouldBe 1000000L
      // Lorenz curve of an ascending ranking stays under the diagonal
      rows.dropRight(1).foreach { r => r._5 should be <= r._1 * 100000 }
    }
  }

  describe("corpus_apportion") {
    it("allocations sum exactly to the budget and differ from floors by <= 1") {
      val rows = SparkEntry.allDefs("corpus_apportion").fn(spark, sfDir)
        .as[(String, Long, Long, Long)].collect()
      rows.map(_._4).sum shouldBe 1000000L
      rows.foreach { case (_, _, fl, al) =>
        (al - fl) should (be >= 0L and be <= 1L)
      }
      // Hamilton quota property: every alloc is floor or ceil of the
      // exact quota N*c/S
      val s = rows.map(v => BigInt(v._2)).sum
      rows.foreach { case (_, c, _, al) =>
        val quotaFloor = (BigInt(c) * 1000000 / s).toLong
        al should (be >= quotaFloor and be <= quotaFloor + 1)
      }
    }
  }

  describe("q_spearman") {
    it("matches brute-force tie-aware Spearman per flag") {
      val pairs = Tables.lineitem(spark, sfDir)
        .select(col("l_returnflag"),
          expr("CAST(ROUND(l_quantity, 0) AS BIGINT)"),
          expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"))
        .as[(String, Long, Long)].collect().groupBy(_._1)
      def avgRanks(xs: Seq[Long]): Map[Long, Double] = {
        val sorted = xs.sorted.zipWithIndex.map { case (v, i) => (v, i + 1.0) }
        sorted.groupBy(_._1).view.mapValues(g => g.map(_._2).sum / g.length).toMap
      }
      val got = SparkEntry.allDefs("q_spearman").fn(spark, sfDir)
        .as[(String, Long, Double)].collect()
      got.foreach { case (flag, n, rho) =>
        val rows = pairs(flag)
        n shouldBe rows.length.toLong
        val (rq, rp) = (avgRanks(rows.map(_._2).toSeq), avgRanks(rows.map(_._3).toSeq))
        val xs = rows.map(r => rq(r._2)); val ys = rows.map(r => rp(r._3))
        val (mx, my) = (xs.sum / n, ys.sum / n)
        val num = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
        val den = math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum) *
          math.sqrt(ys.map(b => (b - my) * (b - my)).sum)
        rho shouldBe (num / den) +- 1e-9
      }
    }
  }

  describe("q_mann_whitney") {
    it("matches brute-force tie-aware U and z on the test data") {
      val rows = Tables.lineitem(spark, sfDir)
        .select(col("l_linestatus"), expr("CAST(ROUND(l_quantity, 0) AS BIGINT)"))
        .as[(String, Long)].collect()
      val all = rows.map(_._2).sorted
      val avgRank = all.zipWithIndex.map { case (v, i) => (v, i + 1.0) }
        .groupBy(_._1).view.mapValues(g => g.map(_._2).sum / g.length).toMap
      val n1 = rows.count(_._1 == "F").toLong
      val n2 = rows.length - n1
      val r1 = rows.collect { case ("F", q) => avgRank(q) }.sum
      val u1 = r1 - n1 * (n1 + 1) / 2.0
      val n = n1 + n2
      val tie3 = all.groupBy(identity).values
        .map(g => g.length.toLong).map(t => t * t * t - t).sum
      val variance = n1.toDouble * n2 *
        ((n + 1).toDouble - tie3.toDouble / (n * (n - 1))) / 12.0
      val expectedZ = (u1 - n1.toDouble * n2 / 2) / math.sqrt(variance)
      val Array((gn1, gn2, u1x2, u2x2, z)) =
        SparkEntry.allDefs("q_mann_whitney").fn(spark, sfDir)
          .as[(Long, Long, Long, Long, Double)].collect()
      gn1 shouldBe n1
      gn2 shouldBe n2
      u1x2 shouldBe math.round(2 * u1)
      (u1x2 + u2x2) shouldBe 2 * n1 * n2
      z shouldBe expectedZ +- 1e-9
    }
  }

  describe("q_kruskal_wallis") {
    it("matches brute-force tie-corrected H on the test data") {
      val rows = Tables.lineitem(spark, sfDir)
        .select(col("l_returnflag"), expr("CAST(ROUND(l_quantity, 0) AS BIGINT)"))
        .as[(String, Long)].collect()
      val all = rows.map(_._2).sorted
      val avgRank = all.zipWithIndex.map { case (v, i) => (v, i + 1.0) }
        .groupBy(_._1).view.mapValues(g => g.map(_._2).sum / g.length).toMap
      val n = rows.length.toLong
      val groups = rows.groupBy(_._1)
      val sumRjSq = groups.values.map { g =>
        val rj = g.map(r => avgRank(r._2)).sum
        rj * rj / g.length
      }.sum
      val h = 12.0 / (n * (n + 1)) * sumRjSq - 3.0 * (n + 1)
      val tie3 = all.groupBy(identity).values
        .map(g => g.length.toLong).map(t => t * t * t - t).sum
      val c = 1.0 - tie3.toDouble / (n.toDouble * n * n - n)
      val Array((gn, na, nn, nr, gh, ghTie)) =
        SparkEntry.allDefs("q_kruskal_wallis").fn(spark, sfDir)
          .as[(Long, Long, Long, Long, Double, Double)].collect()
      gn shouldBe n
      Seq(na, nn, nr).sum shouldBe n
      na shouldBe groups("A").length.toLong
      gh shouldBe h +- 1e-6
      ghTie shouldBe (h / c) +- 1e-6
    }
  }

  describe("q_kendall_tau") {
    it("matches exact brute-force pair counting per flag") {
      val rows = Tables.lineitem(spark, sfDir)
        .select(col("l_returnflag"),
          expr("CAST(ROUND(l_quantity, 0) AS BIGINT)"),
          expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) div 1000000"))
        .as[(String, Long, Long)].collect().groupBy(_._1)
      val got = SparkEntry.allDefs("q_kendall_tau").fn(spark, sfDir)
        .as[(String, Long, Long, Long, Double)].collect()
      got.foreach { case (flag, n, conc, disc, tau) =>
        val xs = rows(flag).map(r => (r._2, r._3))
        n shouldBe xs.length.toLong
        var c = 0L
        var d = 0L
        for (i <- xs.indices; j <- (i + 1) until xs.length) {
          val ((q1, b1), (q2, b2)) = (xs(i), xs(j))
          // pairs tied on either margin enter only the tie terms below
          if (q1 != q2 && b1 != b2) {
            if ((q1 < q2) == (b1 < b2)) c += 1 else d += 1
          }
        }
        conc shouldBe c
        disc shouldBe d
        val n0 = n * (n - 1) / 2
        val n1t = xs.groupBy(_._1).values.map(g => g.length.toLong)
          .map(t => t * (t - 1) / 2).sum
        val n2t = xs.groupBy(_._2).values.map(g => g.length.toLong)
          .map(t => t * (t - 1) / 2).sum
        val expected = (c - d).toDouble /
          math.sqrt((BigInt(n0 - n1t) * BigInt(n0 - n2t)).toDouble)
        tau shouldBe expected +- 1e-12
      }
    }
  }

  describe("q_anova") {
    it("matches the exact-integer sum decomposition on the test data") {
      val rows = Tables.lineitem(spark, sfDir)
        .select(col("l_returnflag"),
          expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"))
        .as[(String, Long)].collect()
      val n = rows.length.toLong
      val s = rows.map(_._2).sum
      val ss = rows.map(r => BigInt(r._2) * r._2).sum
      val groups = rows.groupBy(_._1).view
        .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
      def term(sj: Long, nj: Long) = (BigInt(sj) * sj).toDouble / nj.toDouble
      val ssb = term(groups("A")._2, groups("A")._1) +
        term(groups("N")._2, groups("N")._1) +
        term(groups("R")._2, groups("R")._1) - (BigInt(s) * s).toDouble / n
      val sst = ss.toDouble - (BigInt(s) * s).toDouble / n
      val Array((gn, na, nn, nr, gssb, gssw, f)) =
        SparkEntry.allDefs("q_anova").fn(spark, sfDir)
          .as[(Long, Long, Long, Long, Double, Double, Double)].collect()
      gn shouldBe n
      (na, nn, nr) shouldBe ((groups("A")._1, groups("N")._1, groups("R")._1))
      gssb shouldBe ssb +- math.abs(ssb) * 1e-12
      gssw shouldBe (sst - ssb) +- math.abs(sst - ssb) * 1e-12
      val expectedF = (ssb / 2.0) / ((sst - ssb) / (n - 3).toDouble)
      f shouldBe expectedF +- math.abs(expectedF) * 1e-9
    }
  }

  describe("trace_pagerank") {
    it("matches an exact-integer reference iteration on the test graph") {
      val sp = graft.operators.SpanOps
        .spansFromEvents(Tables.events(spark, sfDir))
        .select(col("span_id"), col("parent_span_id"), col("service"))
        .as[(Long, Option[Long], String)].collect()
      val svc = sp.map(r => r._1 -> r._3).toMap
      val edges = sp.flatMap { case (_, parent, child) =>
        parent.flatMap(svc.get).map(p => (p, child))
      }.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val outw = edges.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      val pPpm = edges.map { case ((u, v), w) => (u, v) -> w * 1000000L / outw(u) }
      val nodes = (edges.keys.map(_._1) ++ edges.keys.map(_._2)).toSet.toSeq.sorted
      val s = nodes.length.toLong
      var r = nodes.map(_ -> 1000000000000L / s).toMap
      for (_ <- 1 to 6) {
        val contrib = pPpm.toSeq
          .map { case ((u, v), p) => v -> r(u) * p / 1000000L }
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        val dangling = nodes.filterNot(outw.contains).map(r).sum
        r = nodes.map { v =>
          v -> ((1000000000000L / s) * 15 / 100 +
            (contrib.getOrElse(v, 0L) + dangling / s) * 85 / 100)
        }.toMap
      }
      val got = SparkEntry.allDefs("trace_pagerank").fn(spark, sfDir)
        .as[(String, Long)].collect().toMap
      got shouldBe r.map { case (k, v) => k -> v / 1000000L }
      // floor losses only: total mass stays within 1% of 1e6 ppm
      got.values.sum should be >= 990000L
      got.values.sum should be <= 1000000L
    }
  }

  describe("q_welch_ttest") {
    it("matches the brute-force unequal-variance t on the test data") {
      val rows = Tables.lineitem(spark, sfDir)
        .select(col("l_linestatus"),
          expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"))
        .as[(String, Long)].collect()
      def stats(st: String): (Long, Double, Double) = {
        val xs = rows.filter(_._1 == st).map(_._2)
        val n = xs.length.toLong
        val s = xs.map(BigInt(_)).sum
        val ss = xs.map(x => BigInt(x) * x).sum
        val mean = s.toDouble / n.toDouble
        val v = (ss.toDouble - (s * s).toDouble / n.toDouble) / (n - 1).toDouble
        (n, mean, v)
      }
      val (n1, mean1, var1) = stats("F")
      val (n2, mean2, var2) = stats("O")
      val (se1, se2) = (var1 / n1.toDouble, var2 / n2.toDouble)
      val expT = (mean1 - mean2) / math.sqrt(se1 + se2)
      val expDf = (se1 + se2) * (se1 + se2) /
        (se1 * se1 / (n1 - 1).toDouble + se2 * se2 / (n2 - 1).toDouble)
      val Array((gn1, gn2, gm1, gm2, t, df)) =
        SparkEntry.allDefs("q_welch_ttest").fn(spark, sfDir)
          .as[(Long, Long, Double, Double, Double, Double)].collect()
      (gn1, gn2) shouldBe ((n1, n2))
      gm1 shouldBe mean1 +- math.abs(mean1) * 1e-12
      gm2 shouldBe mean2 +- math.abs(mean2) * 1e-12
      t shouldBe expT +- math.abs(expT) * 1e-9
      df shouldBe expDf +- math.abs(expDf) * 1e-9
    }
  }

  describe("q_jarque_bera") {
    it("matches brute-force central moments per group") {
      val rows = Tables.lineitem(spark, sfDir)
        .select(col("l_returnflag"),
          expr("CAST(ROUND(l_quantity, 0) AS BIGINT)"))
        .as[(String, Long)].collect()
      val got = SparkEntry.allDefs("q_jarque_bera").fn(spark, sfDir)
        .as[(String, Long, Double, Double, Double)].collect()
        .map(r => r._1 -> r).toMap
      got.keySet shouldBe Set("A", "N", "R")
      for (flag <- Seq("A", "N", "R")) {
        val xs = rows.filter(_._1 == flag).map(_._2.toDouble)
        val n = xs.length.toDouble
        val mu = xs.sum / n
        def m(p: Int) = xs.map(x => math.pow(x - mu, p)).sum / n
        val skew = m(3) / math.pow(m(2), 1.5)
        val kurtEx = m(4) / (m(2) * m(2)) - 3.0
        val jb = n / 6.0 * (skew * skew + kurtEx * kurtEx / 4.0)
        val (_, gn, gs, gk, gjb) = got(flag)
        gn shouldBe xs.length.toLong
        gs shouldBe skew +- 1e-6
        gk shouldBe kurtEx +- 1e-6
        gjb shouldBe jb +- math.abs(jb) * 1e-4
      }
    }
  }

  describe("q_levene") {
    it("matches the brute-force Brown-Forsythe F over group medians") {
      val rows = Tables.lineitem(spark, sfDir)
        .select(col("l_returnflag"),
          expr("CAST(ROUND(l_quantity, 0) AS BIGINT)"))
        .as[(String, Long)].collect()
      val byFlag = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      // z = |2x - med2| per row, med2 = sum of the two central order stats
      val zs = rows.map { case (flag, x) =>
        val xs = byFlag(flag)
        val med2 = xs((xs.length - 1) / 2) + xs(xs.length / 2)
        (flag, math.abs(2 * x - med2))
      }
      val n = zs.length.toDouble
      val sz = zs.map(z => BigInt(z._2)).sum
      val szz = zs.map(z => BigInt(z._2) * z._2).sum
      val g = zs.groupBy(_._1).view
        .mapValues(v => (v.length.toLong, v.map(z => BigInt(z._2)).sum)).toMap
      def term(p: (Long, BigInt)) = (p._2 * p._2).toDouble / p._1.toDouble
      val ssb = term(g("A")) + term(g("N")) + term(g("R")) -
        (sz * sz).toDouble / n
      val sst = szz.toDouble - (sz * sz).toDouble / n
      val expF = (ssb / 2.0) / ((sst - ssb) / (n - 3.0))
      val Array((gn, gssb, gssw, f)) =
        SparkEntry.allDefs("q_levene").fn(spark, sfDir)
          .as[(Long, Double, Double, Double)].collect()
      gn shouldBe zs.length.toLong
      gssb shouldBe ssb +- math.abs(ssb) * 1e-9
      gssw shouldBe (sst - ssb) +- math.abs(sst - ssb) * 1e-9
      f shouldBe expF +- math.abs(expF) * 1e-9
    }
  }

  describe("trace_hits") {
    it("matches an exact-integer L1-normalized reference iteration") {
      val sp = graft.operators.SpanOps
        .spansFromEvents(Tables.events(spark, sfDir))
        .select(col("span_id"), col("parent_span_id"), col("service"))
        .as[(Long, Option[Long], String)].collect()
      val svc = sp.map(r => r._1 -> r._3).toMap
      val edges = sp.flatMap { case (_, parent, child) =>
        parent.flatMap(svc.get).map(p => (p, child))
      }.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val nodes = (edges.keys.map(_._1) ++ edges.keys.map(_._2)).toSet.toSeq.sorted
      val sCnt = nodes.length.toLong
      def propagate(score: Map[String, Long], inv: Boolean): Map[String, Long] = {
        val raw = edges.toSeq
          .map { case ((u, v), w) =>
            if (inv) u -> BigInt(score(v)) * w else v -> BigInt(score(u)) * w
          }
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        val tot = raw.values.sum
        nodes.map { v =>
          v -> raw.get(v).map(r => (r * BigInt(1000000000000L) / tot).toLong)
            .getOrElse(0L)
        }.toMap
      }
      var h = nodes.map(_ -> 1000000000000L / sCnt).toMap
      var a = h
      for (_ <- 1 to 4) {
        a = propagate(h, inv = false)
        h = propagate(a, inv = true)
      }
      val got = SparkEntry.allDefs("trace_hits").fn(spark, sfDir)
        .as[(String, Long, Long)].collect()
      got.map(r => r._1 -> r._2).toMap shouldBe a.map { case (k, v) => k -> v / 1000000L }
      got.map(r => r._1 -> r._3).toMap shouldBe h.map { case (k, v) => k -> v / 1000000L }
      // floor losses only: both vectors stay within 1% of 1e6 ppm
      got.map(_._2).sum should be >= 990000L
      got.map(_._2).sum should be <= 1000000L
      got.map(_._3).sum should be >= 990000L
      got.map(_._3).sum should be <= 1000000L
    }
  }

  describe("trace_attribution") {
    it("matches a brute-force journey replay on the test events") {
      val sp = graft.operators.SpanOps
        .spansFromEvents(Tables.events(spark, sfDir))
        .select(col("trace_id"), col("span_id"), col("service"),
          col("start_us"))
        .as[(String, Long, String, Long)].collect()
      val touchSet = Set("view", "click", "signup")
      val first = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      val last = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      val linear = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      val touches = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      for ((_, evs) <- sp.groupBy(_._1)) {
        var cur = Vector.empty[String]
        for (e <- evs.sortBy(x => (x._4, x._2))) {
          if (e._3 == "purchase") {
            if (cur.nonEmpty) {
              first(cur.head) += 1
              last(cur.last) += 1
              cur.foreach { c =>
                linear(c) += 1000000L / cur.size
                touches(c) += 1
              }
            }
            cur = Vector.empty
          } else if (touchSet(e._3)) cur :+= e._3
        }
        // touches after the final purchase belong to an unclosed journey
      }
      val got = SparkEntry.allDefs("trace_attribution").fn(spark, sfDir)
        .as[(String, Long, Long, Long, Long)].collect()
      got.map(r => r._1 -> r._2).toMap shouldBe first.toMap
      got.map(r => r._1 -> r._3).toMap shouldBe last.toMap
      got.map(r => r._1 -> r._4).toMap shouldBe linear.toMap
      got.map(r => r._1 -> r._5).toMap shouldBe touches.toMap
      // every closed journey hands out exactly one first and one last
      got.map(_._2).sum shouldBe got.map(_._3).sum
    }
  }

  describe("q_assoc_rules") {
    it("matches brute-force confidence/lift rule mining") {
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
        .as[(Long, Long)].collect()
      val items = li.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val nB = li.map(_._1).distinct.length.toLong
      val pairCounts = li.groupBy(_._1).values.flatMap { b =>
        val pks = b.map(_._2).distinct.sorted
        for (i <- pks.indices; j <- i + 1 until pks.length)
          yield (pks(i), pks(j))
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
        .filter(_._2 >= 3L)
      val rules = pairCounts.toSeq.flatMap { case ((a, b), po) =>
        Seq((a, b, po), (b, a, po))
      }.map { case (ante, cons, po) =>
        val conf = po * 1000000L / items(ante)
        val lift = (BigInt(po) * nB * 1000000 /
          (BigInt(items(ante)) * items(cons))).toLong
        (ante, cons, po, conf, lift)
      }.sortBy(r => (-r._4, -r._3, r._1, r._2)).take(100)
      val got = SparkEntry.allDefs("q_assoc_rules").fn(spark, sfDir)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe rules
    }
  }

  describe("text_containment") {
    it("matches brute-force directional shingle containment") {
      val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 150)
        .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      val sh = docs.map { case (id, t) =>
        val toks = t.trim.split("\\s+")
        id -> toks.sliding(3).map(_.mkString(" ")).toSet
      }.toMap
      val expected = (for {
        (a, sa) <- sh.toSeq; (b, sb) <- sh.toSeq if a != b
        i = (sa & sb).size.toLong
        ppm = i * 1000000L / sa.size if ppm >= 500000L
      } yield (a, b, ppm)).sortBy(r => (-r._3, r._1, r._2))
      val got = SparkEntry.allDefs("text_containment").fn(spark, sfDir)
        .as[(Long, Long, Long)].collect().toSeq
      got shouldBe expected
    }
  }

  describe("text_hashed_features") {
    it("matches a brute-force md5 hashing-trick audit") {
      val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 300)
        .select(col("text")).as[String].collect()
      val md = java.security.MessageDigest.getInstance("MD5")
      def bucket(tok: String): Long = {
        val hex = md.digest(tok.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8)
        java.lang.Long.parseLong(hex, 16) % 1024
      }
      val toks = docs.flatMap(_.trim.split("\\s+"))
      val expected = toks.groupBy(bucket).view
        .mapValues(ts => (ts.distinct.length.toLong, ts.length.toLong))
        .toSeq.map { case (b, (nt, nk)) => (b, nt, nk) }
        .sortBy(r => (-r._2, -r._3, r._1)).take(20)
      val got = SparkEntry.allDefs("text_hashed_features").fn(spark, sfDir)
        .as[(Long, Long, Long)].collect().toSeq
      got shouldBe expected
    }
  }

  /** In-memory replica of the r9 cell assignment behind the cell-local
    * primaries: milli-quantize, k = max(4, floor(sqrt(N)/2)), seeds = the
    * first k ids, cell = argmin exact integer d2 (ties to lowest seed). */
  private def bruteCells(
      embs: Seq[(Long, Array[Long])]): Map[Long, Long] = {
    val k = math.max(4L, math.floor(math.sqrt(embs.size.toDouble) / 2).toLong)
    val seeds = embs.filter(_._1 < k)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).foldLeft(0L)((acc, p) => acc + (p._1 - p._2) * (p._1 - p._2))
    embs.map { case (id, q) =>
      id -> seeds.map { case (sid, sq) => (d2(q, sq), sid) }.min._2
    }.toMap
  }

  private def milliQ(v: Array[Double]): Array[Long] =
    v.map(x => java.math.BigDecimal.valueOf(x * 1000)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue)

  describe("embed_triplet_mining") {
    it("matches brute-force CELL-LOCAL hard-example mining with exact tie-breaks") {
      val embs = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").cast("array<double>"),
          col("label"))
        .as[(Long, Array[Double], Int)].collect()
      val cells = bruteCells(embs.toSeq.map(e => (e._1, milliQ(e._2))))
      def round6(x: Double): Double =
        java.math.BigDecimal.valueOf(x)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
      val norms = embs.map(e =>
        e._1 -> math.sqrt(e._2.foldLeft(0.0)((acc, x) => acc + x * x))).toMap
      def score(a: Array[Double], b: Array[Double], na: Double, nb: Double) =
        round6(a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1 * p._2) / (na * nb))
      val expected = embs.flatMap { case (aid, av, al) =>
        val cands = embs
          .filter(e => e._1 != aid && cells(e._1) == cells(aid))
          .map { case (cid, cv, cl) =>
            (cid, cl == al, score(av, cv, norms(aid), norms(cid)))
          }
        val pos = cands.filter(_._2)
        val neg = cands.filterNot(_._2)
        if (pos.isEmpty || neg.isEmpty) None
        else {
          val ps = pos.map(_._3).min
          val ns = neg.map(_._3).max
          Some((aid, pos.filter(_._3 == ps).map(_._1).min,
            neg.filter(_._3 == ns).map(_._1).min, ps, ns, ns - ps))
        }
      }.sortBy(r => (-r._6, r._1)).toSeq
      val got = SparkEntry.allDefs("embed_triplet_mining").fn(spark, sfDir)
        .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
      got shouldBe expected
    }
  }

  describe("embed_lof") {
    it("matches a brute-force CELL-LOCAL integer LOF with exact floor arithmetic") {
      val embs = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .as[(Long, Array[Double])].collect()
        .map { case (id, v) => id -> milliQ(v) }
      val cells = bruteCells(embs.toSeq)
      def d2(a: Array[Long], b: Array[Long]): Long =
        a.zip(b).foldLeft(0L)((acc, p) =>
          acc + (p._1 - p._2) * (p._1 - p._2))
      val knn = embs.map { case (aid, qa) =>
        aid -> embs.filter(e => e._1 != aid && cells(e._1) == cells(aid))
          .map { case (bid, qb) => (bid, d2(qa, qb)) }
          .sortBy(p => (p._2, p._1)).take(5)
      }.toMap
      val kdist = knn.map { case (a, nn) => a -> nn.map(_._2).max }
      val ri = knn.map { case (a, nn) =>
        a -> math.max(nn.map { case (b, d) => math.max(d, kdist(b)) }.sum, 1L)
      }
      val expected = knn.map { case (a, nn) =>
        val sInv = nn.map { case (b, _) => 1000000000000000000L / ri(b) }.sum
        (a, kdist(a), ri(a),
          (BigInt(ri(a)) * sInv / BigInt(5000000000000L)).toLong)
      }.toSeq.sortBy(r => (-r._4, r._1))
      val got = SparkEntry.allDefs("embed_lof").fn(spark, sfDir)
        .as[(Long, Long, Long, Long)].collect().toSeq
      got shouldBe expected
      // inliers cluster near 1e6 ppm: the median LOF must
      val mid = got.map(_._4).sorted.apply(got.size / 2)
      mid should be >= 800000L
      mid should be <= 1500000L
    }
  }

  describe("trace_xcorr_lag") {
    it("matches a brute-force lagged Pearson argmax per service pair") {
      val sp = graft.operators.SpanOps
        .spansFromEvents(Tables.events(spark, sfDir))
        .select(col("service"), col("start_us")).as[(String, Long)].collect()
      val t0 = 1704067200000000L
      val hourUs = 3600000000L
      val hourly = sp.groupBy(e => (e._1, (e._2 - t0) / hourUs)).view
        .mapValues(_.length.toLong).toMap
      val services = sp.map(_._1).distinct.sorted
      val expected = (for {
        sx <- services; sy <- services if sx < sy
        best = (-6L to 6L).flatMap { lag =>
          val joined = hourly.toSeq.collect {
            case ((s, h), cx) if s == sx && hourly.contains((sy, h + lag)) =>
              (cx, hourly((sy, h + lag)))
          }
          val n = joined.length.toLong
          if (n < 8) None
          else {
            val (sxs, sys) = (joined.map(_._1).sum, joined.map(_._2).sum)
            val sxy = joined.map(p => p._1 * p._2).sum
            val sxx = joined.map(p => p._1 * p._1).sum
            val syy = joined.map(p => p._2 * p._2).sum
            val vx = (n * sxx - sxs * sxs).toDouble
            val vy = (n * syy - sys * sys).toDouble
            if (vx <= 0 || vy <= 0) None
            else Some((lag, n,
              (n * sxy - sxs * sys).toDouble / (math.sqrt(vx) * math.sqrt(vy))))
          }
        }.sortBy(r => (-r._3, r._1)).headOption
        b <- best
      } yield (sx, sy, b._1, b._2, b._3)).sortBy(r => (r._1, r._2))
      val got = SparkEntry.allDefs("trace_xcorr_lag").fn(spark, sfDir)
        .as[(String, String, Long, Long, Double)].collect().toSeq
      got.map(r => (r._1, r._2, r._3, r._4)) shouldBe
        expected.map(r => (r._1, r._2, r._3, r._4))
      got.zip(expected).foreach { case (g, e) =>
        g._5 shouldBe e._5 +- 1e-9
      }
    }
  }

  describe("trace_hazard") {
    it("matches brute-force Nelson-Aalen suffix/prefix sums") {
      val sp = graft.operators.SpanOps
        .spansFromEvents(Tables.events(spark, sfDir))
        .select(col("service"), col("duration_us")).as[(String, Long)].collect()
      val grid = sp.groupBy(e =>
        (e._1, java.lang.Long.toBinaryString(e._2).length.toLong)).view
        .mapValues(_.length.toLong).toMap
      val expected = grid.keys.map(_._1).toSeq.distinct.sorted.flatMap { svc =>
        val bits = grid.keys.filter(_._1 == svc).map(_._2).toSeq.sorted
        var cum = 0L
        bits.map { b =>
          val events = grid((svc, b))
          val atRisk = bits.filter(_ >= b).map(x => grid((svc, x))).sum
          val hz = events * 1000000L / atRisk
          cum += hz
          (svc, b, atRisk, events, hz, cum)
        }
      }
      val got = SparkEntry.allDefs("trace_hazard").fn(spark, sfDir)
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe expected
      // the largest bucket's at-risk set is exactly its own events
      got.groupBy(_._1).values.foreach { rows =>
        val lastRow = rows.maxBy(_._2)
        lastRow._3 shouldBe lastRow._4
        lastRow._5 shouldBe 1000000L
      }
    }
  }

  describe("trace_queue_wait") {
    it("the prefix-trick waits equal the sequential Lindley recursion") {
      val sp = graft.operators.SpanOps
        .spansFromEvents(Tables.events(spark, sfDir))
        .select(col("service"), col("span_id"), col("start_us"),
          col("duration_us"))
        .as[(String, Long, Long, Long)].collect()
      val expected = sp.groupBy(_._1).map { case (svc, evs) =>
        val sorted = evs.sortBy(e => (e._3, e._2))
        // the actual sequential recursion the query claims to equal
        var w = 0L
        var waits = Vector(0L)
        for (i <- 1 until sorted.length) {
          val arrivalGap = sorted(i)._3 - sorted(i - 1)._3
          w = math.max(0L, w + sorted(i - 1)._4 - arrivalGap)
          waits :+= w
        }
        val n = waits.length.toLong
        (svc, n, waits.max, waits.sum / n,
          waits.count(_ > 0L) * 1000000L / n)
      }.toSeq.sortBy(_._1)
      val got = SparkEntry.allDefs("trace_queue_wait").fn(spark, sfDir)
        .as[(String, Long, Long, Long, Long)].collect().toSeq
      got shouldBe expected
    }
  }

  describe("q_cohort_ltv") {
    it("matches a brute-force cohort matrix with exact cents") {
      val o = Tables.orders(spark, sfDir)
        .select(col("o_custkey"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long"),
          expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
        .as[(Long, Long, Long)].collect()
      val first = o.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      val size = first.values.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      val aged = o.groupBy(r => (first(r._1), r._2 - first(r._1))).view
        .mapValues(rs => (rs.length.toLong, rs.map(_._3).sum)).toMap
      val expected = aged.keys.toSeq.sorted.map { case (cy, age) =>
        val cum = aged.collect {
          case ((c, a), (_, rev)) if c == cy && a <= age => rev
        }.sum
        (cy, age, aged((cy, age))._1, aged((cy, age))._2, cum / size(cy))
      }
      val got = SparkEntry.allDefs("q_cohort_ltv").fn(spark, sfDir)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe expected
    }
  }

  describe("q_order_streaks") {
    it("matches brute-force longest consecutive-month runs") {
      val o = Tables.orders(spark, sfDir)
        .select(col("o_custkey"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long"))
        .as[(Long, Long)].collect()
      val best = o.groupBy(_._1).view.mapValues { rs =>
        val yms = rs.map(_._2).distinct.sorted
        var (bestLen, cur) = (1L, 1L)
        for (i <- 1 until yms.length) {
          cur = if (yms(i) == yms(i - 1) + 1) cur + 1 else 1L
          bestLen = math.max(bestLen, cur)
        }
        bestLen
      }.toMap
      val expected = best.values.groupBy(identity).view
        .mapValues(_.size.toLong).toSeq
        .map { case (len, n) => (len, n) }.sortBy(_._1)
      val got = SparkEntry.allDefs("q_order_streaks").fn(spark, sfDir)
        .as[(Long, Long)].collect().toSeq
      got shouldBe expected
    }
  }

  describe("q_wasserstein") {
    it("matches the brute-force CDF-gap integral and the KS max") {
      val rows = Tables.lineitem(spark, sfDir)
        .select(col("l_linestatus"),
          expr("CAST(ROUND(l_quantity, 0) AS BIGINT)"))
        .as[(String, Long)].collect()
      val f = rows.filter(_._1 == "F").map(_._2)
      val o = rows.filter(_._1 == "O").map(_._2)
      val grid = rows.map(_._2).distinct.sorted
      val (nf, no) = (f.length.toLong, o.length.toLong)
      var (cumF, cumO, w1, ks) = (0L, 0L, 0L, 0L)
      for (i <- grid.indices) {
        cumF += f.count(_ == grid(i))
        cumO += o.count(_ == grid(i))
        val gap = math.abs(cumF * 1000000L / nf - cumO * 1000000L / no)
        val dx = if (i + 1 < grid.length) grid(i + 1) - grid(i) else 0L
        w1 += gap * dx
        ks = math.max(ks, gap)
      }
      val Array((gn1, gn2, gw1, gks)) =
        SparkEntry.allDefs("q_wasserstein").fn(spark, sfDir)
          .as[(Long, Long, Long, Long)].collect()
      (gn1, gn2, gw1, gks) shouldBe ((nf, no, w1, ks))
    }
  }

  describe("q_prop_ztest") {
    it("matches the brute-force pooled two-proportion z") {
      val rows = Tables.lineitem(spark, sfDir)
        .select(col("l_linestatus"),
          expr("CAST(ROUND(l_quantity, 0) AS BIGINT)"))
        .as[(String, Long)].collect()
      val n1 = rows.count(_._1 == "F").toLong
      val n2 = rows.count(_._1 == "O").toLong
      val x1 = rows.count(r => r._1 == "F" && r._2 > 25).toLong
      val x2 = rows.count(r => r._1 == "O" && r._2 > 25).toLong
      val (p1, p2) = (x1.toDouble / n1, x2.toDouble / n2)
      val pp = (x1 + x2).toDouble / (n1 + n2)
      val z = (p1 - p2) /
        math.sqrt(pp * (1.0 - pp) * (1.0 / n1 + 1.0 / n2))
      val Array((gn1, gn2, gx1, gx2, gp1, gp2, gz)) =
        SparkEntry.allDefs("q_prop_ztest").fn(spark, sfDir)
          .as[(Long, Long, Long, Long, Double, Double, Double)].collect()
      (gn1, gn2, gx1, gx2) shouldBe ((n1, n2, x1, x2))
      gp1 shouldBe p1 +- 1e-15
      gp2 shouldBe p2 +- 1e-15
      gz shouldBe z +- math.abs(z) * 1e-12
    }
  }

  describe("corpus_calibration") {
    it("matches a brute-force floor-ppm reliability diagram") {
      val docs = Tables.documents(spark, sfDir)
        .select(col("text"), col("lang")).as[(String, String)].collect()
      val scored = docs.map { case (t, lang) =>
        (t.count(c => c >= 'a' && c <= 'z').toLong * 1000000L / t.length,
          if (lang == "en") 1L else 0L)
      }
      val expected = scored.groupBy(_._1 / 100000L).toSeq.map {
        case (b, rs) =>
          val n = rs.length.toLong
          val acc = rs.map(_._2).sum * 1000000L / n
          val conf = rs.map(_._1).sum / n
          (b, n, acc, conf, acc - conf)
      }.sortBy(_._1)
      val got = SparkEntry.allDefs("corpus_calibration").fn(spark, sfDir)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe expected
    }
  }

  describe("streaming_attribution") {
    it("equals the batch journey replay restricted to sealed users") {
      val sp = graft.operators.SpanOps
        .spansFromEvents(Tables.events(spark, sfDir))
        .select(col("trace_id"), col("span_id"), col("service"),
          col("start_us"))
        .as[(String, Long, String, Long)].collect()
      val globalMaxMs = sp.map(_._4).max / 1000L
      val gapMs = 60000L
      val sealed_ = sp.groupBy(_._1).collect {
        case (u, evs) if evs.map(_._4).max / 1000L + gapMs < globalMaxMs - gapMs => u
      }.toSet
      val touchSet = Set("view", "click", "signup")
      val first = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      val last = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      val linear = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      val touches = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      for ((u, evs) <- sp.groupBy(_._1) if sealed_(u)) {
        var cur = Vector.empty[String]
        for (e <- evs.sortBy(x => (x._4, x._2))) {
          if (e._3 == "purchase") {
            if (cur.nonEmpty) {
              first(cur.head) += 1; last(cur.last) += 1
              cur.foreach { c => linear(c) += 1000000L / cur.size; touches(c) += 1 }
            }
            cur = Vector.empty
          } else if (touchSet(e._3)) cur :+= e._3
        }
      }
      val got = SparkEntry.allDefs("streaming_attribution").fn(spark, sfDir)
        .as[(String, Long, Long, Long, Long)].collect()
      got.map(r => r._1 -> r._2).toMap shouldBe first.toMap
      got.map(r => r._1 -> r._3).toMap shouldBe last.toMap
      got.map(r => r._1 -> r._4).toMap shouldBe linear.toMap
      got.map(r => r._1 -> r._5).toMap shouldBe touches.toMap
    }
  }

  describe("trace_incidents") {
    it("matches brute-force overlapping-interval merging") {
      val sp = graft.operators.SpanOps
        .spansFromEvents(Tables.events(spark, sfDir))
        .filter(col("duration_us") > 100000L)
        .select(col("service"), col("span_id"), col("start_us"),
          (col("start_us") + col("duration_us")).as("end_us"))
        .as[(String, Long, Long, Long)].collect()
      val expected = sp.groupBy(_._1).map { case (svc, ivs) =>
        val sorted = ivs.sortBy(i => (i._3, i._2))
        var incidents = Vector.empty[(Long, Long, Long)] // (start, end, n)
        for (iv <- sorted) {
          incidents.lastOption match {
            case Some((s0, e0, n)) if iv._3 <= e0 =>
              incidents = incidents.init :+
                ((s0, math.max(e0, iv._4), n + 1))
            case _ => incidents :+= ((iv._3, iv._4, 1L))
          }
        }
        (svc, incidents.length.toLong,
          incidents.map(i => i._2 - i._1).max,
          incidents.map(i => i._2 - i._1).sum,
          incidents.map(_._3).max)
      }.toSeq.sortBy(_._1)
      val got = SparkEntry.allDefs("trace_incidents").fn(spark, sfDir)
        .as[(String, Long, Long, Long, Long)].collect().toSeq
      got shouldBe expected
    }
  }

  describe("trace_kmv_distinct") {
    it("matches a brute-force k-minimum-values sketch") {
      val du = graft.operators.SpanOps
        .spansFromEvents(Tables.events(spark, sfDir))
        .select(col("service"), col("trace_id")).distinct()
        .as[(String, String)].collect()
      val md = java.security.MessageDigest.getInstance("MD5")
      def h(s: String): Long = {
        val hex = md.digest(s.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8)
        java.lang.Long.parseLong(hex, 16)
      }
      val expected = du.groupBy(_._1).map { case (svc, us) =>
        val exact = us.length.toLong
        val hs = us.map(u => (h(u._2), u._2)).sortBy(identity)
        val est =
          if (hs.length < 64) exact
          else 63L * 4294967296L / hs(63)._1
        (svc, exact, est, math.abs(est - exact) * 1000000L / exact)
      }.toSeq.sortBy(_._1)
      val got = SparkEntry.allDefs("trace_kmv_distinct").fn(spark, sfDir)
        .as[(String, Long, Long, Long)].collect().toSeq
      got shouldBe expected
    }
  }

  describe("q_rolling_distinct") {
    it("matches brute-force 30-day rolling distinct counts") {
      val du = Tables.orders(spark, sfDir)
        .select(col("o_custkey"),
          datediff(col("o_orderdate"), to_date(lit("1992-01-01")))
            .cast("long"))
        .as[(Long, Long)].collect().distinct
      val mxd = du.map(_._2).max
      val expected = (du.map(_._2).min to mxd).map { d =>
        (d, du.filter(r => r._2 >= d - 29 && r._2 <= d)
          .map(_._1).distinct.length.toLong)
      }.filter(_._2 > 0)
      val got = SparkEntry.allDefs("q_rolling_distinct").fn(spark, sfDir)
        .as[(Long, Long)].collect().toSeq
      got shouldBe expected
    }
  }

  describe("text_retrieval_eval") {
    it("the discount literals are floor(1e6 / log2(rank + 1))") {
      val expected = (1 to 10).map(r =>
        math.floor(1e6 / (math.log(r + 1) / math.log(2))).toLong)
      expected shouldBe Seq(1000000L, 630929L, 500000L, 430676L, 386852L,
        356207L, 333333L, 315464L, 301029L, 289064L)
      // and the idcg table is its prefix sum
      expected.scanLeft(0L)(_ + _).drop(1) shouldBe Seq(1000000L, 1630929L,
        2130929L, 2561605L, 2948457L, 3304664L, 3637997L, 3953461L,
        4254490L, 4543554L)
    }
    it("matches a brute-force MRR/P@10/NDCG replay") {
      val docs = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("source"), col("text"))
        .as[(Long, String, String)].collect()
      def tokset(t: String) = t.trim.split("\\s+").toSet
      val disc = (1 to 10).map(r =>
        math.floor(1e6 / (math.log(r + 1) / math.log(2))).toLong)
      val qs = docs.filter(_._1 < 20)
      val cands = docs.filter(d => d._1 >= 20 && d._1 < 520)
      val expected = qs.sortBy(_._1).map { case (qid, qsrc, qt) =>
        val qtoks = tokset(qt)
        val scored = cands.map { case (cid, csrc, ct) =>
          (cid, csrc, (qtoks & tokset(ct)).size.toLong)
        }.filter(_._3 > 0)
          .sortBy(r => (-r._3, r._1)).take(10)
        val rels = scored.zipWithIndex.map { case ((_, csrc, _), i) =>
          (i + 1, if (csrc == qsrc) 1L else 0L)
        }
        val firstRel = rels.find(_._2 == 1L).map(_._1.toLong).getOrElse(0L)
        val dcg = rels.map { case (r, rel) => rel * disc(r - 1) }.sum
        val pool = cands.count(_._2 == qsrc).toLong
        val idcg = disc.take(math.min(pool, 10L).toInt).sum max 1000000L
        (qid, firstRel,
          if (firstRel == 0) 0L else 1000000L / firstRel,
          rels.map(_._2).sum * 100000L,
          dcg * 1000000L / (if (pool == 0) 1000000L else disc.take(math.min(pool, 10L).toInt).sum))
      }
      val got = SparkEntry.allDefs("text_retrieval_eval").fn(spark, sfDir)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe expected.toSeq
    }
  }

  describe("q_data_profile") {
    it("matches a brute-force per-column profile") {
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_returnflag"), col("l_linestatus"),
          expr("CAST(ROUND(l_quantity, 0) AS BIGINT)").cast("string"),
          col("l_suppkey").cast("string"))
        .as[(String, String, String, String)].collect()
      val colVals = Map(
        "returnflag" -> li.map(_._1), "linestatus" -> li.map(_._2),
        "quantity" -> li.map(_._3), "suppkey" -> li.map(_._4))
      val expected = colVals.toSeq.sortBy(_._1).map { case (c, vs) =>
        val byVal = vs.groupBy(identity).view.mapValues(_.length.toLong)
        val topCnt = byVal.values.max
        val top = byVal.filter(_._2 == topCnt).keys.max
        (c, byVal.size.toLong, 0L, vs.min, vs.max, top, topCnt)
      }
      val got = SparkEntry.allDefs("q_data_profile").fn(spark, sfDir)
        .as[(String, Long, Long, String, String, String, Long)]
        .collect().toSeq
      got shouldBe expected
    }
  }

  describe("q_integrity_audit") {
    it("proves zero orphans with the right row totals") {
      val got = SparkEntry.allDefs("q_integrity_audit").fn(spark, sfDir)
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      got.keySet shouldBe Set("lineitem_orders", "lineitem_part",
        "orders_customer", "supplier_nation")
      val nLi = Tables.lineitem(spark, sfDir).count()
      got("lineitem_orders") shouldBe ((nLi, 0L, 0L))
      got("lineitem_part") shouldBe ((nLi, 0L, 0L))
      got("orders_customer")._2 shouldBe 0L
      got("supplier_nation")._2 shouldBe 0L
    }
  }

  describe("trace_forecast_backtest") {
    it("matches a brute-force expanding-window OLS backtest") {
      val sp = graft.operators.SpanOps
        .spansFromEvents(Tables.events(spark, sfDir))
        .select(col("service"), expr(s"(start_us - 1704067200000000) div 86400000000"))
        .as[(String, Long)].collect()
      val expected = sp.groupBy(_._1).map { case (svc, evs) =>
        val daily = evs.groupBy(_._2).view.mapValues(_.length.toLong)
          .toSeq.sortBy(_._1)
        val errs = daily.indices.drop(0).flatMap { i =>
          val prior = daily.take(i)
          if (prior.length < 2) None
          else {
            val n = BigInt(prior.length)
            val sx = prior.map(p => BigInt(p._1)).sum
            val sy = prior.map(p => BigInt(p._2)).sum
            val sxy = prior.map(p => BigInt(p._1) * p._2).sum
            val sxx = prior.map(p => BigInt(p._1) * p._1).sum
            val den = n * sxx - sx * sx
            if (den <= 0) None
            else {
              val num = n * sxy - sx * sy
              val (d, c) = daily(i)
              val errScaled =
                (BigInt(c) * n * den - (sy * den + num * (n * d - sx))).abs
              Some(errScaled / (n * den))
            }
          }
        }
        (svc, errs.length.toLong, (errs.sum / errs.length).toLong,
          errs.max.toLong)
      }.toSeq.sortBy(_._1)
      val got = SparkEntry.allDefs("trace_forecast_backtest").fn(spark, sfDir)
        .as[(String, Long, Long, Long)].collect().toSeq
      got shouldBe expected
    }
  }

  describe("q_kanonymity") {
    it("matches a brute-force equivalence-class risk census") {
      val cust = Tables.customer(spark, sfDir)
        .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
          expr("CAST(ROUND(c_acctbal, 0) AS BIGINT) div 1000"))
        .as[(Long, String, Long)].collect()
      val classes = cust.groupBy(identity).values.map(_.length.toLong).toSeq
      val total = classes.sum
      val expected = Seq(2L, 5L, 10L, 20L).map { k =>
        val risky = classes.filter(_ < k)
        (k, classes.length.toLong, risky.length.toLong, risky.sum,
          risky.sum * 1000000L / total)
      }
      val got = SparkEntry.allDefs("q_kanonymity").fn(spark, sfDir)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe expected
    }
  }

  describe("trace_control_chart") {
    it("matches a brute-force X-bar/R chart with SPC(n=5) literals") {
      val sp = graft.operators.SpanOps
        .spansFromEvents(Tables.events(spark, sfDir))
        .select(col("service"), col("span_id"), col("start_us"),
          col("duration_us"))
        .as[(String, Long, Long, Long)].collect()
      val expected = sp.groupBy(_._1).flatMap { case (svc, evs) =>
        val subs = evs.sortBy(e => (e._3, e._2)).map(_._4)
          .grouped(5).filter(_.length == 5).toSeq
          .map(g => (g.sum / 5, g.max - g.min))
        if (subs.isEmpty) None
        else {
          val xbb = subs.map(_._1).sum / subs.length
          val rb = subs.map(_._2).sum / subs.length
          val (uclX, lclX, uclR) =
            (xbb + 577 * rb / 1000, xbb - 577 * rb / 1000, 2114 * rb / 1000)
          Some((svc, subs.length.toLong, xbb, rb, uclX, lclX, uclR,
            subs.count(s => s._1 > uclX || s._1 < lclX).toLong,
            subs.count(_._2 > uclR).toLong))
        }
      }.toSeq.sortBy(_._1)
      val got = SparkEntry.allDefs("trace_control_chart").fn(spark, sfDir)
        .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
        .collect().toSeq
      got shouldBe expected
    }
  }

  describe("q_gini_split") {
    it("matches a brute-force split-impurity profile") {
      val rows = Tables.lineitem(spark, sfDir)
        .select(expr("CAST(ROUND(l_quantity, 0) AS BIGINT)"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L))
        .as[(Long, Long)].collect()
      val n = BigInt(rows.length)
      val pt = BigInt(rows.map(_._2).sum)
      def gini(pos: BigInt, m: BigInt): BigInt =
        BigInt(1000000) - (pos * pos + (m - pos) * (m - pos)) * 1000000 / (m * m)
      val thresholds = rows.map(_._1).distinct.sorted
      val expected = thresholds.flatMap { t =>
        val nl = BigInt(rows.count(_._1 <= t))
        val pl = BigInt(rows.filter(_._1 <= t).map(_._2).sum)
        val (nr, pr) = (n - nl, pt - pl)
        if (nl == 0 || nr == 0) None
        else {
          val split = (nl * gini(pl, nl) + nr * gini(pr, nr)) / n
          Some((t, nl.toLong, nr.toLong, split.toLong,
            gini(pt, n).toLong, (gini(pt, n) - split).toLong))
        }
      }.toSeq
      val got = SparkEntry.allDefs("q_gini_split").fn(spark, sfDir)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe expected
      // gain is non-negative at the argmin and the profile is unimodal-ish:
      // at least one threshold must strictly beat the parent or tie
      got.map(_._6).max should be >= 0L
    }
  }

  describe("trace_canary_diff") {
    it("matches a brute-force hash-split Welch comparison") {
      val md = java.security.MessageDigest.getInstance("MD5")
      def isBase(spanId: Long): Boolean = {
        val hex = md.digest(spanId.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        hex.head < '8'
      }
      val sp = graft.operators.SpanOps
        .spansFromEvents(Tables.events(spark, sfDir))
        .select(col("service"), col("span_id"), col("duration_us"))
        .as[(String, Long, Long)].collect()
      val expected = sp.groupBy(_._1).map { case (svc, evs) =>
        val (b, c) = evs.partition(e => isBase(e._2))
        def stats(xs: Array[(String, Long, Long)]) = {
          val n = xs.length.toLong
          val s = xs.map(e => BigInt(e._3)).sum
          val ss = xs.map(e => BigInt(e._3) * e._3).sum
          (n, s, ss)
        }
        val (nb, sb, ssb) = stats(b)
        val (nc, sc, ssc) = stats(c)
        val (mb, mc) = (sb.toDouble / nb, sc.toDouble / nc)
        val se = ((ssb.toDouble - (sb * sb).toDouble / nb) / (nb - 1) / nb) +
          ((ssc.toDouble - (sc * sc).toDouble / nc) / (nc - 1) / nc)
        val t = (mc - mb) / math.sqrt(se)
        val practical = (sc * nb - sb * nc).abs * 20 > sb * nc
        (svc, nb, nc, mb, mc, t, if (math.abs(t) > 1.96) 1L else 0L,
          if (practical) 1L else 0L)
      }.toSeq.sortBy(_._1)
      val got = SparkEntry.allDefs("trace_canary_diff").fn(spark, sfDir)
        .as[(String, Long, Long, Double, Double, Double, Long, Long)]
        .collect().toSeq
      got.map(r => (r._1, r._2, r._3, r._7, r._8)) shouldBe
        expected.map(r => (r._1, r._2, r._3, r._7, r._8))
      got.zip(expected).foreach { case (g, e) =>
        g._4 shouldBe e._4 +- math.abs(e._4) * 1e-12
        g._5 shouldBe e._5 +- math.abs(e._5) * 1e-12
        g._6 shouldBe e._6 +- math.abs(e._6).max(1e-9) * 1e-9
      }
    }
  }

  describe("corpus_dedup_sweep") {
    it("is monotone in the threshold and anchored to brute jaccard") {
      val rows = SparkEntry.allDefs("corpus_dedup_sweep").fn(spark, sfDir)
        .as[(Long, Long, Long, Long)].collect().toSeq
      rows.map(_._1) shouldBe (3 to 9).map(_ * 100000L)
      // fewer pairs and fewer lost docs as the threshold rises
      rows.sliding(2).foreach { case Seq(a, b) =>
        b._2 should be <= a._2
        b._3 should be <= a._3
      }
      // anchor one threshold to a brute-force jaccard computation
      val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 150)
        .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      val sh = docs.map { case (id, t) =>
        id -> t.trim.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
      }
      val flagged = (for {
        (a, sa) <- sh; (b, sb) <- sh if a < b
        i = (sa & sb).size.toLong
        j = i * 1000000L / (sa.size + sb.size - i) if j >= 500000L
      } yield (a, b)).toSeq
      val t5 = rows.find(_._1 == 500000L).get
      t5._2 shouldBe flagged.length.toLong
      t5._3 shouldBe flagged.map(_._2).distinct.length.toLong
    }
  }

  describe("text_fertility") {
    it("matches a brute-force per-language fertility report") {
      val docs = Tables.documents(spark, sfDir)
        .select(col("lang"), col("text")).as[(String, String)].collect()
      val re = "[a-z]+|[0-9]|[^a-z0-9\\s]".r
      val expected = docs.groupBy(_._1).toSeq.map { case (lang, ds) =>
        val chars = ds.map(_._2.length.toLong).sum
        val ws = ds.map(_._2.trim.split("\\s+").length.toLong).sum
        val bpe = ds.map(d => re.findAllIn(d._2).length.toLong).sum
        (lang, ds.length.toLong, bpe * 1000000L / ws,
          bpe * 100000000L / chars)
      }.sortBy(_._1)
      val got = SparkEntry.allDefs("text_fertility").fn(spark, sfDir)
        .as[(String, Long, Long, Long)].collect().toSeq
      got shouldBe expected
    }
  }

  describe("trace_saturation_curve") {
    it("matches a brute-force concurrency sweep") {
      val sp = graft.operators.SpanOps
        .spansFromEvents(Tables.events(spark, sfDir))
        .select(col("service"), col("span_id"), col("start_us"),
          col("duration_us"))
        .as[(String, Long, Long, Long)].collect()
      val expected = sp.groupBy(_._1).toSeq.flatMap { case (svc, evs) =>
        val events = evs.flatMap(e =>
          Seq((e._3, 1L, e._2, e._4), (e._3 + e._4, -1L, e._2, 0L)))
          .sortBy(x => (x._1, x._2, x._3))
        var lvl = 0L
        val starts = events.flatMap { case (_, d, _, dur) =>
          lvl += d
          if (d == 1L) Some((java.lang.Long.toBinaryString(lvl).length.toLong,
            dur))
          else None
        }
        starts.groupBy(_._1).toSeq.map { case (bits, xs) =>
          (svc, bits, xs.length.toLong, xs.map(_._2).sum / xs.length)
        }
      }.sortBy(r => (r._1, r._2))
      val got = SparkEntry.allDefs("trace_saturation_curve").fn(spark, sfDir)
        .as[(String, Long, Long, Long)].collect().toSeq
      got shouldBe expected
    }
  }

  describe("q_two_way_anova") {
    it("matches brute-force Type-I sums and they add to SST") {
      val rows = Tables.lineitem(spark, sfDir)
        .select(col("l_returnflag"), col("l_linestatus"),
          expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"))
        .as[(String, String, Long)].collect()
      val n = rows.length.toDouble
      def tOf(xs: Array[Long]): Double =
        if (xs.isEmpty) 0.0
        else {
          val s = xs.map(BigInt(_)).sum
          (s * s).toDouble / xs.length
        }
      val all = rows.map(_._3)
      val tG = tOf(all)
      val tA = Seq("A", "N", "R")
        .map(f => tOf(rows.filter(_._1 == f).map(_._3))).sum
      val tB = Seq("F", "O")
        .map(st => tOf(rows.filter(_._2 == st).map(_._3))).sum
      val tC = (for (f <- Seq("A", "N", "R"); st <- Seq("F", "O"))
        yield tOf(rows.filter(r => r._1 == f && r._2 == st).map(_._3))).sum
      val ss = rows.map(r => BigInt(r._3) * r._3).sum.toDouble
      val (ssa, ssb, ssab, ssw) =
        (tA - tG, tB - tG, tC - tA - tB + tG, ss - tC)
      val Array((gn, ga, gb, gab, gw, share)) =
        SparkEntry.allDefs("q_two_way_anova").fn(spark, sfDir)
          .as[(Long, Double, Double, Double, Double, Double)].collect()
      gn shouldBe rows.length.toLong
      ga shouldBe ssa +- math.abs(ssa) * 1e-9
      gb shouldBe ssb +- math.abs(ssb) * 1e-9
      gab shouldBe ssab +- math.abs(ssab).max(1.0) * 1e-6
      gw shouldBe ssw +- math.abs(ssw) * 1e-9
      // the four components reassemble the total sum of squares
      val sst = ss - tG
      (ga + gb + gab + gw) shouldBe sst +- math.abs(sst) * 1e-9
      share shouldBe (gab / (ga + gb + gab + gw)) +- 1e-12
    }
  }

  describe("embed_centroid_drift") {
    it("matches a brute-force rational centroid distance") {
      val embs = Tables.embeddings(spark, sfDir)
        .select(col("label").cast("long"), col("vec_id"),
          col("embedding").cast("array<double>"))
        .as[(Long, Long, Array[Double])].collect()
        .map { case (l, id, v) =>
          (l, id % 2, v.map(x => java.math.BigDecimal.valueOf(x * 1000)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue))
        }
      val expected = embs.groupBy(_._1).toSeq.map { case (label, vs) =>
        val a = vs.filter(_._2 == 0).map(_._3)
        val b = vs.filter(_._2 == 1).map(_._3)
        val (na, nb) = (BigInt(a.length), BigInt(b.length))
        val num = (0 until 64).map { p =>
          val sa = a.map(v => BigInt(v(p))).sum
          val sb = b.map(v => BigInt(v(p))).sum
          val d = sa * nb - sb * na
          d * d
        }.sum
        (label, na.toLong, nb.toLong, (num / (na * nb * na * nb)).toLong)
      }.sortBy(_._1)
      val got = SparkEntry.allDefs("embed_centroid_drift").fn(spark, sfDir)
        .as[(Long, Long, Long, Long)].collect().toSeq
      got shouldBe expected
    }
  }

  describe("corpus_ngram_coverage") {
    it("matches brute-force held-out coverage per n") {
      val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 1000)
        .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      def grams(t: String, n: Int): Set[String] =
        t.trim.split("\\s+").sliding(n).filter(_.length == n)
          .map(_.mkString(" ")).toSet
      val expected = (1 to 3).map { n =>
        val train = docs.filter(_._1 % 2 == 0)
          .flatMap(d => grams(d._2, n)).toSet
        val test = docs.filter(_._1 % 2 == 1)
          .flatMap(d => grams(d._2, n)).toSet
        val cov = (test & train).size.toLong
        (n.toLong, test.size.toLong, cov, cov * 1000000L / test.size)
      }
      val got = SparkEntry.allDefs("corpus_ngram_coverage").fn(spark, sfDir)
        .as[(Long, Long, Long, Long)].collect().toSeq
      got shouldBe expected
      // coverage falls with n: trigram coverage can't beat unigram
      got.map(_._4).sliding(2).foreach { case Seq(a, b) => b should be <= a }
    }
  }

  describe("trace_mtbf_mttr") {
    it("matches brute-force reliability math off merged incidents") {
      val sp = graft.operators.SpanOps
        .spansFromEvents(Tables.events(spark, sfDir))
        .select(col("service"), col("span_id"), col("start_us"),
          col("duration_us"))
        .as[(String, Long, Long, Long)].collect()
      val expected = sp.groupBy(_._1).flatMap { case (svc, evs) =>
        val win = (evs.map(_._3).min,
          evs.map(e => e._3 + e._4).max)
        val ivs = evs.filter(_._4 > 100000L)
          .map(e => (e._3, e._3 + e._4, e._2)).sortBy(i => (i._1, i._3))
        if (ivs.isEmpty) None
        else {
          var merged = Vector.empty[(Long, Long)]
          for (iv <- ivs) merged.lastOption match {
            case Some((s0, e0)) if iv._1 <= e0 =>
              merged = merged.init :+ ((s0, math.max(e0, iv._2)))
            case _ => merged :+= ((iv._1, iv._2))
          }
          val down = merged.map(m => m._2 - m._1).sum
          val n = merged.length.toLong
          val w = win._2 - win._1
          Some((svc, n, down / n, (w - down) / n,
            (w - down) * 1000000L / w))
        }
      }.toSeq.sortBy(_._1)
      val got = SparkEntry.allDefs("trace_mtbf_mttr").fn(spark, sfDir)
        .as[(String, Long, Long, Long, Long)].collect().toSeq
      got shouldBe expected
    }
  }

  describe("text_kcore") {
    it("the 6-round peel reaches a true 3-core on the test corpus") {
      val core = SparkEntry.allDefs("text_kcore").fn(spark, sfDir)
        .as[(String, Long)].collect().toMap
      // fixpoint check: every surviving node keeps degree >= 3 within
      // the survivor set, i.e. one more peel round changes nothing
      core.values.foreach(_ should be >= 3L)
    }
  }
}
