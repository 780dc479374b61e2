package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** One-off stage profiler for the MinHash-LSH pipeline (dev tool). */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "graft-minhash-profile")
    val docs = graft.Tables.load(spark, dir, "documents")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[mh] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
    time("signatures")(sigs.write.format("noop").mode("overwrite").save())
    time("signatures warm")(sigs.write.format("noop").mode("overwrite").save())
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.45)
    time("full pipeline")(println("[mh] pairs = " + pairs.count()))
    time("full again")(println("[mh] pairs = " + pairs.count()))
    // stage split, warm (mirrors minhashLshPairs defaults)
    val k = 144; val bands = 48; val r = k / bands
    val sigsC = Dedup.minhashSignatures(docs, "doc_id", "text", k = k).cache()
    time("sigs cache materialize")(sigsC.count())
    val bandCols = (0 until bands).map(bnd =>
      xxhash64(concat_ws("_", slice(col("sig"), bnd * r + 1, r))))
    val banded0 = sigsC.select(col("id"), posexplode(array(bandCols: _*)))
      .select(col("id"), col("pos").as("band"), col("col").as("bucket"))
    time("banded0")(banded0.write.format("noop").mode("overwrite").save())
    val bucketSizes = banded0.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("__bsz"))
      .filter(col("__bsz") <= 100 && col("__bsz") > 1)
    time("bucketSizes")(bucketSizes.write.format("noop").mode("overwrite").save())
    val banded = banded0.join(bucketSizes, Seq("band", "bucket")).drop("__bsz")
    val a = banded.as("a"); val b = banded.as("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .dropDuplicates("id1", "id2")
    time("candidates")(println("[mh] cands = " + candidates.count()))
    val verified = candidates
      .join(sigsC.select(col("id").as("id1"), col("sig").as("sig1")), "id1")
      .join(sigsC.select(col("id").as("id2"), col("sig").as("sig2")), "id2")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig1"), col("sig2"), (x, y) => x === y), v => v))
          .cast("double") / k)
      .filter(col("est_jaccard") >= 0.45)
    time("verify")(println("[mh] verified = " + verified.count()))
    spark.stop()
  }
}
