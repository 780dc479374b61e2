package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Clusters, Dedup, Ivf, Similarity}

/** One-off stage profiler for the semantic-dedup pipeline (dev tool). */
object SemanticProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "graft-semantic-profile")
    val embs = graft.Tables.load(spark, dir, "embeddings")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[sd] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val index = time("Ivf.build (fit, random init, 8 iter)")(
      Ivf.build(embs, "vec_id", "embedding", nLists = 8, seed = 42,
        maxIter = 8, initMode = "random"))
    val cells = index.assigned.cache()
    time("assign+cache materialize")(cells.count())
    time("cell sizes")(println("[sd] dist = " +
      cells.groupBy("cell").count().orderBy(desc("count")).head(3).mkString(" ")))
    val a = cells.select(col("cell"), col("id").as("id1"), col("v").as("v1"))
    val b = cells.select(col("cell"), col("id").as("id2"), col("v").as("v2"))
    val edges = a.join(b, Seq("cell")).filter(col("id1") < col("id2"))
      .filter(Similarity.dot(col("v1"), col("v2")) >= 0.35)
      .select(col("id1"), col("id2"))
    time("edges (cell self-join + cosine)")(println("[sd] edges = " + edges.count()))
    val assigned = time("connected components")(
      Clusters.assignClusters(embs.select(col("vec_id")), "vec_id",
        edges, a = "id1", b = "id2"))
    time("components action")(println("[sd] comps = " + assigned.count()))
    val full = Dedup.semanticDedup(embs, "vec_id", "embedding",
      threshold = 0.35, nLists = 8)
    time("full semanticDedup")(println("[sd] kept = " + full.count()))
    time("full again (warm)")(println("[sd] kept = " + full.count()))
    spark.stop()
  }
}
