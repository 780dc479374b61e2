package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** L2 normalization of an `array<double>` column as ONE native expression
  * with whole-stage codegen — bit-compatible with the compositional form
  *
  * {{{
  *   val n = sqrt(aggregate(transform(v, x => x * x), lit(0.0), _ + _))
  *   when(n === 0.0, v).otherwise(transform(v, x => x / n))
  * }}}
  *
  * including its edge algebra: the squared norm is the same sequential
  * left-fold of squares (identical IEEE addition order, so DuckDB-oracle
  * hashes are unaffected), a zero norm returns the input unchanged, a NaN
  * element propagates NaN through every output element, and a NULL element
  * (which nulls the folded norm, sending the CASE into the transform-by-
  * null branch) yields the same-length all-null array.
  *
  * Why native (r18): the compositional form is interpreted (higher-order
  * functions never enter whole-stage codegen), and — far worse — the alias
  * carrying `n` gets inlined by CollapseProject/filter-pushdown into the
  * per-element division lambda, where it re-runs the whole
  * `aggregate(transform(...))` fold PER ELEMENT: O(dim²) interpreted work
  * per row. Measured on the IVF bitext x-side at sf0.1: 3.46 s of CPU for
  * 1000 rows of dim-64 vectors (~3.4 ms/row) once the optimizer had
  * duplicated the form into 16 centroid-dot expressions; this expression
  * is one O(dim) primitive loop and duplicates harmlessly. The exact
  * [[CharGramBow]]/[[DotProduct]] remedy shape.
  */
case class L2Normalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return new GenericArrayData(new Array[Any](n))
      val v = x.getDouble(i)
      s += v * v
      i += 1
    }
    val nrm = math.sqrt(s)
    if (nrm == 0.0) return x.copy()
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = x.getDouble(i) / nrm; i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val gad = classOf[GenericArrayData].getName
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val nrm = ctx.freshName("nrm")
      val out = ctx.freshName("out")
      val hasNull = ctx.freshName("hasNull")
      s"""
         |int $n = $a.numElements();
         |boolean $hasNull = false;
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $hasNull = true; break; }
         |  double ${s}_v = $a.getDouble($i);
         |  $s += ${s}_v * ${s}_v;
         |}
         |if ($hasNull) {
         |  ${ev.value} = new $gad(new Object[$n]);
         |} else {
         |  double $nrm = java.lang.Math.sqrt($s);
         |  if ($nrm == 0.0) {
         |    ${ev.value} = $a.copy();
         |  } else {
         |    double[] $out = new double[$n];
         |    for (int $j = 0; $j < $n; $j++) {
         |      $out[$j] = $a.getDouble($j) / $nrm;
         |    }
         |    ${ev.value} = new $gad($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2Normalize =
    copy(child = newChild)

  override def prettyName: String = "graft_l2norm"
}
