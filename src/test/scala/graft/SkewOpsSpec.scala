package graft

import graft.operators.SkewOps
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

class SkewOpsSpec extends AnyFunSpec with Matchers with SparkTestBase {

  describe("saltedAggregate") {
    it("matches the unsalted aggregation on a skewed key distribution") {
      val events = Tables.events(spark, sfDir)
      // event_type is low-cardinality (5 values over all rows) — exactly
      // the shape where one reducer would take a whole key
      val salted = SkewOps.saltedAggregate(events, col("event_type"), col("event_id"), salts = 16)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val plain = events.groupBy(col("event_type").as("k"))
        .agg(count(lit(1)).as("n"), sum("event_id").as("total"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      salted shouldBe plain
    }

    it("spreads a hot key over multiple salt partitions in phase one") {
      val events = Tables.events(spark, sfDir)
      val phase1Groups = events
        .select(col("event_type").as("k"), col("event_id").as("v"))
        .withColumn("salt", pmod(monotonically_increasing_id(), lit(16)))
        .groupBy("k", "salt").count()
        .groupBy("k").count()
        .collect().map(_.getLong(1))
      // every key fanned out to >1 sub-group
      all(phase1Groups) should be > 1L
    }

    it("salted join equals the plain inner join on real data") {
      val li = Tables.lineitem(spark, sfDir)
      val urgent = Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey", "o_orderstatus")
      val salted = SkewOps.saltedJoin(li, urgent, "l_orderkey", "o_orderkey", salts = 8)
        .select("l_orderkey", "l_linenumber", "o_orderstatus").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
      val plain = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"))
        .select("l_orderkey", "l_linenumber", "o_orderstatus").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
      salted should not be empty
      salted shouldBe plain
    }

    it("salted join spreads a planted hot key across salts and keeps multiplicity") {
      import spark.implicits._
      // hot key with DIFFERING payloads — the normal hot-join shape the
      // content-hash salt spreads (bit-identical full rows collapse to
      // one salt by design; they'd co-locate under any scheme)
      val big = ((0 until 5000).map(i => ("hot", i)) ++ (0 until 100).map(i => (s"k$i", 2)))
        .toDF("bk", "bv").repartition(8)
      val small = (Seq(("hot", "H")) ++ (0 until 100).map(i => (s"k$i", "C")))
        .toDF("sk", "sv")
      val joined = SkewOps.saltedJoin(big, small, "bk", "sk", salts = 8)
      joined.count() shouldBe 5100L // every big row joins exactly once
      // phase-one spread: the hot key's rows carry every salt
      val spread = big
        .withColumn("_salt", pmod(xxhash64(col("bk"), col("bv")), lit(8L)))
        .filter(col("bk") === "hot").select("_salt").distinct().count()
      spread shouldBe 8L
    }

    it("positionSalts spreads even bit-identical duplicate hot rows") {
      import spark.implicits._
      // the degenerate case content-hash salts can't spread: the hot
      // key's rows are IDENTICAL in every column
      val big = (Seq.fill(5000)(("hot", 1)) ++ (0 until 100).map(i => (s"k$i", 2)))
        .toDF("bk", "bv").repartition(8)
      val small = (Seq(("hot", "H")) ++ (0 until 100).map(i => (s"k$i", "C")))
        .toDF("sk", "sv")
      val joined = SkewOps.saltedJoin(big, small, "bk", "sk", salts = 8, positionSalts = true)
      joined.count() shouldBe 5100L
      val spread = big.sortWithinPartitions("bk", "bv")
        .withColumn("_salt", pmod(monotonically_increasing_id(), lit(8L)))
        .filter(col("bk") === "hot").select("_salt").distinct().count()
      spread should be >= 4L
    }

    it("splits a hot key with one constant value across most salts") {
      import spark.implicits._
      // the case that defeats value-derived salting: every row of the
      // hot key carries the SAME value (constant-duration heartbeats)
      val hot = Seq.fill(10000)(("hot", 42L)).toDF("k", "v").repartition(8)
      val nSalts = hot
        .withColumn("salt", pmod(monotonically_increasing_id(), lit(16)))
        .select("salt").distinct().count()
      nSalts should be >= 8L
      // and the aggregate is still exact
      val res = SkewOps.saltedAggregate(hot, col("k"), col("v"), salts = 16)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      res.toSeq shouldBe Seq(("hot", 10000L, 420000L))
    }
  }
}
