package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expressions for the embedding-vector hot path —
  * codegen'd (`doGenCode`), so the similarity operators stay inside
  * whole-stage codegen with zero boxing: preferable to a Scala UDF on the
  * per-pair scoring loop (SURVEY.md §7.3 preference order). Both fold
  * left-to-right in double precision, bit-identical to the DuckDB oracle's
  * list_dot_product over DOUBLE[].
  */
case class DotProductF(left: Expression, right: Expression)
  extends BinaryExpression {

  // inputs are array<float>; type enforcement stays at the call sites
  // (ExpectsInputTypes is private[sql] in Spark 4)
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0; var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_dot"
}

/** L2 norm of a float vector (sequential double fold, codegen'd). */
case class L2NormF(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0; var i = 0
    while (i < x.numElements()) {
      val v = x.getFloat(i).toDouble; acc += v * v; i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |double $acc = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $v = (double) $a.getFloat($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "graft_l2norm"
}

/** Dot product of a FLOAT vector against a DOUBLE vector — the
  * broadcast-centroid shape (q136 scores every corpus vector against
  * the per-dimension mean vector, which is exact-long-sum-derived and
  * therefore double). Same sequential left-to-right double fold as
  * [[DotProductF]] / DuckDB's list_dot_product; codegen'd. */
case class DotFloatDoubleF(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0; var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_dotfd"
}

/** Dot product of two DOUBLE vectors — the centered-embedding shape
  * (q146 subtracts the corpus-mean vector, which is exact-long-sum-
  * derived and therefore double, from every float coordinate before
  * scoring). Same sequential left-to-right fold as [[DotProductF]] /
  * DuckDB's list_dot_product over DOUBLE[]; codegen'd. */
case class DotDoubleF(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0; var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_dotdd"
}

/** Integer dot product of two int8 code vectors stored as BINARY —
  * the SQ8 stage-1 kernel (q144): each byte IS the signed quantized
  * coordinate, so the scan reads exactly 1 byte/dim (the
  * memory-bandwidth play scalar quantization exists for) and the dot
  * is exact 64-bit integer arithmetic — engine-portable by
  * construction, no rounding convention needed. Codegen'd: the
  * per-candidate loop stays inside whole-stage codegen as a primitive
  * byte[] walk. */
case class Int8DotF(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]; val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var acc = 0L; var i = 0
    while (i < n) { acc += x(i).toLong * y(i).toLong; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long) $a[$i] * (long) $b[$i];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_int8dot"
}

/** Poly-31 code-point fold mod 1e9+7 — the engine-neutral string hash
  * anchoring q61 fingerprints, q68 group-hash splits, and q108's token
  * buckets. Bit-identical to the previous HOF formulation
  * (`aggregate(transform(split(s, ""), ascii), 0, (a,c)->(a*31+c)%p)`:
  * Java's empty-pattern regex split yields CODE POINTS, and Spark's
  * ascii() is codePointAt(0) — so a code-point walk reproduces it
  * exactly, empty string included) and to the DuckDB oracle's
  * list_reduce over `regexp_extract_all(s, '(?s).')`. As a native
  * expression the fold is one allocation-free string walk — the HOF
  * chain materialized a boxed per-character array and ran interpreted
  * (HOFs are CodegenFallback) on the hottest text path in the pack. */
case class CharFoldF(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any = {
    // UTF8String cast, not toString-of-anything: a non-string argument
    // must fail LOUDLY (the DotProductF contract — ExpectsInputTypes is
    // private[sql]) rather than silently fold the INTERNAL rendering
    // (e.g. a DATE's days-since-epoch int), which the HOF formulation
    // this replaced would never have produced
    val s = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    var acc = 0L; var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val cp = ctx.freshName("cp"); val acc = ctx.freshName("acc")
      s"""
         |java.lang.String $s = $a.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $acc = ($acc * 31L + (long) $cp) % 1000000007L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "graft_charfold"
}

/** SQ8 reconstruction error of a persisted code row against its
  * full-precision vector — [max, truncating-mean] per-coordinate error
  * in once-rounded micro-units, as a 2-element LONG array. The q155
  * audit kernel: as a native expression the decode loop is one
  * allocation-free walk inside whole-stage codegen (the Int8DotF
  * pattern), where the Scala UDF it replaces deserialized a boxed
  * Seq[Float] per row. Arithmetic mirrors the oracle's list_transform
  * replay exactly: e_i = |x_i − code_i/scale|, u_i = round(e_i·10⁶),
  * max and sum div len over the CODE length. */
case class Sq8ErrF(emb: Expression, scale: Expression, code: Expression)
  extends TernaryExpression {

  override def first: Expression = emb
  override def second: Expression = scale
  override def third: Expression = code
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val e = a.asInstanceOf[ArrayData]
    val sc = b.asInstanceOf[Double]
    val cd = c.asInstanceOf[Array[Byte]]
    var maxu = 0L; var sumu = 0L; var i = 0
    while (i < cd.length) {
      val err = math.abs(e.getFloat(i).toDouble - cd(i).toDouble / sc)
      val u = math.round(err * 1e6)
      if (u > maxu) maxu = u
      sumu += u; i += 1
    }
    new GenericArrayData(Array(maxu, sumu / cd.length))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val i = ctx.freshName("i"); val u = ctx.freshName("u")
      val mx = ctx.freshName("mx"); val sm = ctx.freshName("sm")
      val err = ctx.freshName("err")
      s"""
         |long $mx = 0L; long $sm = 0L;
         |for (int $i = 0; $i < $c.length; $i++) {
         |  double $err = java.lang.Math.abs(
         |    (double) $a.getFloat($i) - (double) $c[$i] / $b);
         |  long $u = java.lang.Math.round($err * 1e6);
         |  if ($u > $mx) $mx = $u;
         |  $sm += $u;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  new long[]{$mx, $sm / $c.length});
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                 t: Expression): Expression =
    copy(emb = f, scale = s, code = t)
  override def prettyName: String = "graft_sq8err"
}

object VectorFunctions {
  val registrations: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (es => DotProductF(es(0), es(1))),
    "graft_dotfd" -> (es => DotFloatDoubleF(es(0), es(1))),
    "graft_l2norm" -> (es => L2NormF(es.head)),
    "graft_int8dot" -> (es => Int8DotF(es(0), es(1))),
    "graft_dotdd" -> (es => DotDoubleF(es(0), es(1))),
    "graft_charfold" -> (es => CharFoldF(es.head)),
    "graft_sq8err" -> (es => Sq8ErrF(es(0), es(1), es(2))))

  /** Session-scoped registration (idempotent); lets `call_function` and
    * SQL reach the expressions without SparkSessionExtensions config. */
  def register(s: SparkSession): Unit = registrations.foreach { case (name, b) =>
    s.sessionState.functionRegistry.createOrReplaceTempFunction(name, b, "built-in")
  }

  def dotF(s: SparkSession, a: Column, b: Column): Column = {
    register(s); call_function("graft_dot", a, b)
  }
  def l2normF(s: SparkSession, a: Column): Column = {
    register(s); call_function("graft_l2norm", a)
  }
}

/** Spark extension point: `--conf spark.sql.extensions=graft.functions.
  * GraftExtensions` registers the vector functions and the
  * merge-on-read distributed delete-application rule
  * ([[graft.catalog.MorDeleteJoin]]) in every session. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductF].getName, "graft_dot"),
      (es: Seq[Expression]) => DotProductF(es(0), es(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_l2norm"),
      new ExpressionInfo(classOf[L2NormF].getName, "graft_l2norm"),
      (es: Seq[Expression]) => L2NormF(es.head)))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_int8dot"),
      new ExpressionInfo(classOf[Int8DotF].getName, "graft_int8dot"),
      (es: Seq[Expression]) => Int8DotF(es(0), es(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_charfold"),
      new ExpressionInfo(classOf[CharFoldF].getName, "graft_charfold"),
      (es: Seq[Expression]) => CharFoldF(es.head)))
    e.injectOptimizerRule(_ => graft.catalog.MorDeleteJoin)
    e.injectOptimizerRule(_ => graft.catalog.ChangelogDeleteJoin)
  }
}
