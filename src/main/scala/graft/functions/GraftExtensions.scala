package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark-native integration point: register graft's Catalyst expressions on
  * any session via config — no code changes in the host application:
  *
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *
  * makes `simhash64(array<long>)` and `graft_minhash64(array<string>)`
  * available to pure SQL users alongside the Column-API helpers.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash64"),
      new ExpressionInfo(classOf[MinHash64].getName, "graft_minhash64"),
      (exprs: Seq[Expression]) => MinHash64(exprs.head, 64, 42L)))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("script_counts"),
      new ExpressionInfo(classOf[ScriptCounts].getName, "script_counts"),
      (exprs: Seq[Expression]) => ScriptCounts(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("compression_ratio"),
      new ExpressionInfo(classOf[CompressionRatio].getName,
        "compression_ratio"),
      (exprs: Seq[Expression]) => CompressionRatio(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("luhn_redact_cards"),
      new ExpressionInfo(classOf[LuhnRedactCards].getName,
        "luhn_redact_cards"),
      (exprs: Seq[Expression]) => LuhnRedactCards(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (exprs: Seq[Expression]) => JaroWinkler(exprs(0), exprs(1))))
  }
}
