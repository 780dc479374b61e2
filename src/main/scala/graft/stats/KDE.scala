package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** T11 gaussian kernel density estimate (reference: pages/plotting.py:
  * 1117–1179, i.e. scipy.stats.gaussian_kde): scott / silverman / manual
  * bandwidth factor on the sample std, 300-point grid padded 10% beyond the
  * data range.
  *
  * Runs driver-side on the collected column — the reference ships the full
  * column to the browser for this, so bounded collection is parity; a
  * seeded sample caps driver memory at scale. (Spark's own
  * `mllib.stat.KernelDensity` evaluates distributed but fixes the
  * bandwidth; the scipy-compatible factors need n and std anyway.)
  */
object KDE {

  sealed trait Bandwidth
  case object Scott extends Bandwidth
  case object Silverman extends Bandwidth
  final case class Manual(factor: Double) extends Bandwidth

  final case class Curve(x: Array[Double], density: Array[Double], bandwidth: Double)

  val GridSize = 300
  val PadFraction = 0.10
  val MaxCollect = 100000

  def curve(
      df: DataFrame,
      column: String,
      bw: Bandwidth = Scott,
      gridSize: Int = GridSize,
      seed: Long = 42): Option[Curve] = {
    val base = df.select(col(column).cast(DoubleType).as("v")).na.drop()
    val total = base.count()
    if (total < 2) return None
    val data =
      (if (total > MaxCollect)
        base.sample(withReplacement = false, MaxCollect.toDouble / total * 1.1, seed).limit(MaxCollect)
      else base).collect().map(_.getDouble(0))

    val n = data.length
    val mean = data.sum / n
    val std = math.sqrt(data.map(x => (x - mean) * (x - mean)).sum / (n - 1))
    if (std == 0.0) return None

    // scipy factors (d=1): scott = n^(-1/5), silverman = (3n/4)^(-1/5);
    // bandwidth = factor * sample std.
    val factor = bw match {
      case Scott          => math.pow(n.toDouble, -0.2)
      case Silverman      => math.pow(3.0 * n / 4.0, -0.2)
      case Manual(f)      => f
    }
    val h = factor * std

    val lo = data.min; val hi = data.max
    val pad = (hi - lo) * PadFraction
    val x0 = lo - pad; val x1 = hi + pad
    val xs = Array.tabulate(gridSize)(i => x0 + (x1 - x0) * i / (gridSize - 1).toDouble)
    val norm = 1.0 / (n * h * math.sqrt(2 * math.Pi))
    val dens = xs.map { x =>
      var s = 0.0
      var i = 0
      while (i < n) {
        val z = (x - data(i)) / h
        s += math.exp(-0.5 * z * z)
        i += 1
      }
      s * norm
    }
    Some(Curve(xs, dens, h))
  }
}
