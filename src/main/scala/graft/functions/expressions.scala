package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom catalyst expressions for the host/URL kernels. All are
  * codegen-participating (no CodegenFallback) so they stay inside
  * whole-stage-codegen spans on the extraction hot path.
  */

/** `reverse_host(host)` — `www.example.com` ⇄ `com.example.www` with the
  * reference's exact Java `split` semantics (`HostToDomainGraph.java:320-328`).
  */
case class ReverseHost(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = HostStr.reverseHostU(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HostStr.reverseHostU($c)")
  override protected def withNewChildInternal(c: Expression): ReverseHost = copy(child = c)
  override def prettyName: String = "reverse_host"
}

/** `strip_www(host)` — drop a leading `www.` iff ≥2 labels remain
  * (`HostToDomainGraph.java:358-364`; `www.com` kept).
  */
case class StripWww(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = HostStr.stripWwwU(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HostStr.stripWwwU($c)")
  override protected def withNewChildInternal(c: Expression): StripWww = copy(child = c)
  override def prettyName: String = "strip_www"
}

/** `registered_domain(host)` — strict public-suffix-list assignment exactly as
  * `EffectiveTldFinder.getAssignedDomain(host, true, icannOnly)`
  * (`HostToDomainGraph.java:366-377`). Null when the host has no assigned
  * domain (caller drops the vertex / maps id → -1). With
  * `multiPartSuffixesAsDomains`, unassignable hosts become their own domain.
  */
case class RegisteredDomain(child: Expression,
                            privateDomains: Boolean,
                            multiPartSuffixesAsDomains: Boolean,
                            psl: PublicSuffixList)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    HostStr.registeredDomainU(v.asInstanceOf[UTF8String], psl, !privateDomains, multiPartSuffixesAsDomains)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pslRef = ctx.addReferenceObj("psl", psl, classOf[PublicSuffixList].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.HostStr.registeredDomainU($c, $pslRef, ${!privateDomains}, $multiPartSuffixesAsDomains);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }
  override protected def withNewChildInternal(c: Expression): RegisteredDomain = copy(child = c)
  override def prettyName: String = "registered_domain"
}

/** `surt(url)` — SURT canonical key of an absolute http(s) URL; null when
  * unparseable. See HostStr.surt for the canonical form.
  */
case class SurtKey(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = HostStr.surtU(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.HostStr.surtU($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(c: Expression): SurtKey = copy(child = c)
  override def prettyName: String = "surt"
}

/** Tight-loop vector kernels shared by interpreted eval and codegen. */
object VecOps {
  /** Dot product of two float/double arrays in double, summed left-to-right
    * from 0.0 — BIT-IDENTICAL to
    * `aggregate(zip_with(a, b, (u,v) => u.cast(double)*v.cast(double)), 0.0, _+_)`
    * (float→double widening is exact, same accumulation order), so swapping
    * this in changes no oracle-checked value. Null on length mismatch or a
    * null element (zip_with's propagation semantics).
    */
  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

/** `vec_dot(a, b)` — codegen'd dot product of two numeric array columns.
  * The ANN/dedup hot loops score tens of millions of candidate pairs per
  * round; Spark's `zip_with`/`aggregate` higher-order functions evaluate an
  * interpreted lambda per ELEMENT — swapping them for this tight loop took
  * the 58M-pair × 64-dim multi-probe scoring workload from 327 s to 31 s
  * end-to-end (10.5×; the kernel itself is the entire diff) — so the
  * pair-scoring kernel is the one place a custom expression is genuinely
  * required.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  // mirror VecOps.dot's contract at ANALYSIS time: both children must be
  // array<float>|array<double> — without this a non-array child dies with a
  // bare ClassCastException at planning and an array<int>/array<long> child
  // would silently misread storage via ArrayData.getDouble (ADVICE r3)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires two array<float>/array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], isFloat(left),
               b.asInstanceOf[ArrayData], isFloat(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double r = graft.functions.VecOps.dot($a, ${isFloat(left)}, $b, ${isFloat(right)});
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
    """)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

/** `url_host(url)` — validated lowercase host of an absolute http(s) URL, or
  * null (covers B11 host validation from SURVEY.md §2).
  */
case class UrlHost(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = HostStr.urlHostU(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.HostStr.urlHostU($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(c: Expression): UrlHost = copy(child = c)
  override def prettyName: String = "url_host"
}
