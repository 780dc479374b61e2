package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TextRank keyword scoring (Mihalcea & Tarau 2004) — corpus-level
  * keyword extraction as PageRank over the word co-occurrence graph:
  * tokens are vertices, an undirected edge weighted by how often two
  * words appear adjacent (the paper's window = 2), and the stationary
  * damped-propagation mass is the keyword score. Pure composition of
  * two shipped primitives — [[graft.ops.TextOps.tokens]]' adjacency
  * (the bigram recipe of [[LanguageModel]]) feeding
  * [[graft.ops.Graph.pageRank]]'s weighted propagation — so every
  * scale property is inherited: edges shuffle once keyed on src, the
  * per-iteration state is one rank table, iterations localCheckpoint.
  *
  * Vocabulary is the vertex set, so all state is vocabulary-bounded
  * (the [[LanguageModel]] premise); the corpus itself is touched once
  * to count adjacencies. Self-loops (a word adjacent to itself) are
  * dropped — they only feed rank back to the same vertex. Words with
  * no surviving edge stay dangling and keep near-teleport mass, which
  * is the correct "not a keyword" signal. */
object TextRank {

  /** (word, rank) over the whole corpus, Σ rank = 1. Tokenization is
    * [[TextOps.tokens]] on lowercased text (the LM convention). */
  def keywords(docs: DataFrame, textCol: String, iters: Int = 5,
      damping: Double = 0.85): DataFrame = {
    val w = TextOps.tokens(lower(col(textCol)))
    val pairsCol = when(size(w) < 2,
        array().cast("array<struct<a:string,b:string>>"))
      .otherwise(transform(sequence(lit(0), size(w) - 2),
        i => struct(get(w, i).as("a"), get(w, i + 1).as("b"))))
    val adj = docs.select(explode(pairsCol).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .filter(col("a") =!= col("b"))
    val edges = adj.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(adj.select(col("b").as("src"), col("a").as("dst")))
      .groupBy("src", "dst").agg(count(lit(1)).cast("double").as("w"))
    val nodes = docs.select(explode(w).as("node")).distinct()
    Graph.pageRank(edges, nodes, iters, damping, weightCol = Some("w"))
      .withColumnRenamed("node", "word")
  }
}
