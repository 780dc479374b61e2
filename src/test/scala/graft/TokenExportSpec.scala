package graft

import org.apache.spark.sql.functions._

import graft.report.TokenExport

class TokenExportSpec extends SparkSpec {
  import spark.implicits._

  private def synthDocs(n: Int) = (0 until n).map { i =>
    val ids = if (i % 17 == 3) Seq.empty[Int]
      else (0 to i % 23).map(j => i * 31 + j)
    (i.toLong, ids)
  }

  test("every document round-trips byte-exactly through its shard file") {
    val rows = synthDocs(200)
    val df = rows.toDF("doc_id", "ids")
    val dir = java.nio.file.Files.createTempDirectory("graft-tokexp").toString
    try {
      val index = TokenExport.writeShards(spark, df, "doc_id", "ids", dir,
        nShards = 4)
      val idx = index.collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[String]("file"), r.getAs[Long]("offset"),
            r.getAs[Int]("n_tokens"))).toMap
      assert(idx.size == rows.length, "index lost documents")
      for ((id, ids) <- rows) {
        val (file, off, n) = idx(id)
        assert(n == ids.length, s"token count drift for doc $id")
        assert(TokenExport.readDoc(dir, file, off, n).toSeq == ids,
          s"bytes drifted for doc $id")
      }
      // empty documents keep their index row with zero tokens
      assert(rows.filter(_._2.isEmpty)
        .forall { case (id, _) => idx(id)._3 == 0 })
      // total payload bytes = 4 x total tokens
      val binBytes = java.nio.file.Files
        .list(java.nio.file.Paths.get(dir)).toArray.toSeq
        .map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.getFileName.toString.endsWith(".bin"))
        .map(java.nio.file.Files.size).sum
      assert(binBytes == 4L * rows.map(_._2.length).sum)
    } finally graft.core.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("shard assignment and token bytes are invariant under input partitioning") {
    val rows = synthDocs(120)
    val df = rows.toDF("doc_id", "ids")
    val d1 = java.nio.file.Files.createTempDirectory("graft-tokexp-a").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft-tokexp-b").toString
    try {
      val i1 = TokenExport.writeShards(spark, df, "doc_id", "ids", d1, 4)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Int]("shard"), r.getAs[String]("file"),
            r.getAs[Long]("offset"), r.getAs[Int]("n_tokens"))).toMap
      val i2 = TokenExport.writeShards(spark, df.repartition(13), "doc_id",
          "ids", d2, 4)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Int]("shard"), r.getAs[String]("file"),
            r.getAs[Long]("offset"), r.getAs[Int]("n_tokens"))).toMap
      for ((id, ids) <- rows) {
        assert(i1(id)._1 == i2(id)._1, s"shard moved for doc $id")
        val a = TokenExport.readDoc(d1, i1(id)._2, i1(id)._3, i1(id)._4)
        val b = TokenExport.readDoc(d2, i2(id)._2, i2(id)._3, i2(id)._4)
        assert(a.toSeq == ids && b.toSeq == ids,
          s"content drifted across partitionings for doc $id")
      }
    } finally {
      graft.core.Fs.deleteRecursively(java.nio.file.Paths.get(d1))
      graft.core.Fs.deleteRecursively(java.nio.file.Paths.get(d2))
    }
  }
}
