package graft.core

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._
import scala.util.Using

/** Small filesystem helpers shared by sinks, gates, and specs. */
object Fs {

  /** Delete `dir` and everything under it, children first. `Files.walk`
    * holds open directory handles until closed, so the stream is managed
    * with `Using.resource` (the same discipline TableCatalog applies to
    * its walks). Safe on an already-missing path. */
  def deleteRecursively(dir: Path): Unit = {
    if (!Files.exists(dir)) return
    Using.resource(Files.walk(dir)) { stream =>
      stream.iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => Files.deleteIfExists(p))
    }
  }
}
