package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // 10k fact rows, 90% on key 1 (the hot key), the rest over 2..19;
  // key 99 exists in the fact but not the dim (unmatched-fact coverage)
  private lazy val fact = spark.range(10000)
    .select(
      when(col("id") % 10 < 9, lit(1L))
        .when(col("id") % 100 === 0, lit(99L))
        .otherwise(col("id") % 18 + 2).as("k"),
      (col("id") * 7 % 1000).as("v"))
  // dim keys 0..14: 15..19 unmatched on the dim side (left/anti coverage)
  private lazy val dim = spark.range(15)
    .select(col("id").as("k"), concat(lit("d"), col("id")).as("label"))

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  test("salted join is row-identical to the plain join, all supported types") {
    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      val plain = fact.join(dim, Seq("k"), jt)
      val salted = SkewJoin.saltedJoin(fact, dim, Seq("k"), salt = 8, jt)
      assert(salted.columns.sameElements(plain.columns), s"columns drift for $jt")
      assert(canon(salted) == canon(plain), s"row drift for $jt")
    }
  }

  test("dim-duplicating join types are rejected loudly") {
    for (jt <- Seq("right", "full_outer", "cross"))
      intercept[IllegalArgumentException] {
        SkewJoin.saltedJoin(fact, dim, Seq("k"), salt = 4, jt)
      }
  }

  test("the hot key's rows spread across reducers instead of one partition") {
    // force the shuffle regimes this operator exists for: no broadcast
    // (tiny test dim would otherwise broadcast = no shuffle at all) and
    // no AQE partition coalescing (tiny partitions would re-merge)
    val bhj = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // suite default is 4 shuffle partitions — too few to see 8 salt
    // sub-keys separate; use a realistic reducer count
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
      def maxPartitionShare(df: org.apache.spark.sql.DataFrame): Double = {
        val counts = df.select(spark_partition_id().as("p"))
          .groupBy("p").count().select("count").as[Long].collect()
        counts.max.toDouble / counts.sum
      }
      val plain = maxPartitionShare(fact.join(dim, Seq("k"), "inner"))
      val salted = maxPartitionShare(
        SkewJoin.saltedJoin(fact, dim, Seq("k"), salt = 8, "inner"))
      assert(plain > 0.8,
        s"plain join lost its hot partition ($plain) — test no longer measures skew")
      assert(salted < 0.4,
        s"salted join still concentrated: max partition share $salted")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bhj)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.shuffle.partitions", parts)
    }
  }

  test("saltSkewProfile flags duplicate-heavy hot keys as degraded") {
    // hot key 1: 5000 EXACT duplicate rows (identical payload) -> the
    // content salt maps them all to one bucket; hot key 2: 5000 rows with
    // distinct payloads -> salt spreads them
    val dupHot = spark.range(5000).select(lit(1L).as("k"), lit(42L).as("v"))
    val spreadHot = spark.range(5000)
      .select(lit(2L).as("k"), (col("id") * 13 % 997).as("v"))
    val tail = spark.range(200).select((col("id") % 50 + 10).as("k"),
      col("id").as("v"))
    val prof = SkewJoin.saltSkewProfile(
        dupHot.union(spreadHot).union(tail), Seq("k"), salt = 8)
      .collect()
    val byKey = prof.groupBy(_.getAs[Long]("k"))
    // duplicate-heavy: one bucket holds everything, flagged
    val k1 = byKey(1L)
    assert(k1.length == 1 && k1.head.getAs[Double]("bucket_share") == 1.0)
    assert(k1.forall(_.getAs[Boolean]("degraded")))
    // distinct payloads: many buckets, none dominant, not flagged
    val k2 = byKey(2L)
    assert(k2.length > 4, s"expected spread over buckets, got ${k2.length}")
    assert(k2.forall(!_.getAs[Boolean]("degraded")))
    assert(k2.map(_.getAs[Double]("bucket_share")).max < 0.5)
    // shares within a key sum to ~1
    assert(math.abs(k2.map(_.getAs[Double]("bucket_share")).sum - 1.0) < 0.01)
  }
}
