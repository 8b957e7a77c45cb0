package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Codegen'd vector math over `array<float>` / `array<double>` columns.
  *
  * Spark's higher-order array expressions (`zip_with` + `aggregate`) are
  * interpreted — one boxed lambda invocation per element — which profiled
  * ~100× slower than a fused loop on 64-dim embeddings. These are native
  * Catalyst `Expression`s whose generated code is a single static call into
  * a tight primitive loop (`VectorKernels`), so they inline into whole-stage
  * codegen with zero boxing and no virtual dispatch — the preferred
  * extension point after built-ins (SURVEY.md §7.3).
  */
object VectorKernels {

  /** Null-element policy: any null element makes the whole vector result
    * NULL (SQL-consistent), rather than silently reading the slot as 0.0.
    * Parquet-sourced arrays are containsNull=true even when no element is
    * actually null, so this is a cheap prepass (bitmap check per element)
    * instead of a type-check rejection.
    */
  def anyNull(a: ArrayData): Boolean = {
    val n = a.numElements()
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return true; i += 1 }
    false
  }

  /** splitmix64 finalizer — deterministic ±1 hyperplane components. */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  @inline private def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean,
          bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += get(a, i, aFloat) * get(b, i, bFloat); i += 1 }
    acc
  }

  def l2(a: ArrayData, isFloat: Boolean): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    if (isFloat) while (i < n) {
      val v = a.getFloat(i).toDouble; acc += v * v; i += 1
    } else while (i < n) { val v = a.getDouble(i); acc += v * v; i += 1 }
    math.sqrt(acc)
  }

  /** Fused cosine: one pass computing dot and both norms. */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean,
             bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = get(a, i, aFloat)
      val y = get(b, i, bFloat)
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0.0) 0.0 else d / den
  }

  /** Argmax-cosine centroid assignment over a FLAT (k × dim) centroid
    * array with a parallel id array: returns ids(j*) where j* maximizes
    * cosine(a, cents[j]), ties to the LARGER id — bit-identical to the
    * `greatest(struct(cosine, cid))` expansion it replaces (same fused
    * per-centroid accumulation order as [[cosine]]; struct comparison
    * orders by sim then cid, so equal sims resolve to the larger cid;
    * NaN similarities order GREATEST like Spark's struct comparison —
    * `java.lang.Double.compare` below mirrors that, so a NaN-sim
    * centroid wins over every finite one and NaN ties break to the
    * larger cid). The one scoped divergence: vectors containing NULL
    * elements never reach this kernel — [[ArgmaxCosine]] returns SQL
    * NULL for them (consistent with the whole vector-expression family:
    * [[PqEncode]], i8dot, …), where the old expansion tie-broke null
    * sims to the highest cid.
    * The expansion breaks down at corpus-scale cell counts: at k≈500
    * the generated greatest() chain passes the JVM's 64 KB method limit,
    * drops out of whole-stage codegen, and assignment goes interpreted
    * (measured 68× for 32× data on d_semdedup_auto) — this kernel is the
    * same n·k flops as a tight primitive loop.
    */
  def argmaxCosine(a: ArrayData, aFloat: Boolean, cents: Array[Float],
                   ids: Array[Long], dim: Int): Long = {
    val k = ids.length
    val n = math.min(a.numElements(), dim)
    var best = Double.NegativeInfinity
    var bestId = Long.MinValue
    var j = 0
    while (j < k) {
      val off = j * dim
      var d = 0.0; var na = 0.0; var nc = 0.0
      var i = 0
      while (i < n) {
        val x = get(a, i, aFloat)
        val y = cents(off + i).toDouble
        d += x * y; na += x * x; nc += y * y
        i += 1
      }
      val den = math.sqrt(na) * math.sqrt(nc)
      val cos = if (den == 0.0) 0.0 else d / den
      // Double.compare gives the NaN-is-greatest total order Spark's
      // struct comparison uses; cmp == 0 covers NaN-vs-NaN ties (where
      // `cos == best` would be false) so those also break to larger cid.
      val cmp = java.lang.Double.compare(cos, best)
      if (cmp > 0 || (cmp == 0 && ids(j) > bestId)) {
        best = cos; bestId = ids(j)
      }
      j += 1
    }
    bestId
  }

  /** Symmetric int8 scalar quantization: code_i = floor(x_i · 127/maxabs
    * + 0.5). Pure deterministic double arithmetic (float widened first),
    * so any IEEE-754 engine reproduces the codes bit-exactly — the
    * property that lets the quantized ANN tier be oracle-verified.
    * All-zero vectors quantize to all-zero codes.
    */
  def sq8(a: ArrayData, isFloat: Boolean): ArrayData = {
    val n = a.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(if (isFloat) a.getFloat(i).toDouble else a.getDouble(i))
      if (v > m) m = v
      i += 1
    }
    val scale = if (m == 0.0) 0.0 else 127.0 / m
    val out = new Array[Int](n)
    i = 0
    while (i < n) {
      val v = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      out(i) = math.floor(v * scale + 0.5).toInt
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** Exact integer dot product of two int code vectors — order-
    * independent (integer addition is associative), hence engine-
    * independent. */
  def i8dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getInt(i).toLong * b.getInt(i); i += 1 }
    acc
  }

  /** Product-quantization encode: per subspace mi, the argmax over
    * codewords j of `2·dot(sub, cb_j) − ‖cb_j‖²` (≡ argmin L2 — the
    * `‖sub‖²` term is constant per subspace and cancels), ties → larger
    * j (`>=` under ascending j). Both accumulators run ascending-index
    * sequential double arithmetic, so DuckDB's left-associated CAST
    * chains replay the codes bit-for-bit. Flattened codebook layout:
    * `cb[((mi·ksub)+j)·sub + i]`.
    */
  def pqEncode(a: ArrayData, isFloat: Boolean, cb: Array[Float],
               m: Int, ksub: Int, sub: Int): ArrayData =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      encodeCodes(a, isFloat, cb, m, ksub, sub))

  private def encodeCodes(a: ArrayData, isFloat: Boolean, cb: Array[Float],
                          m: Int, ksub: Int, sub: Int): Array[Int] = {
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = Double.NegativeInfinity
      var bestJ = 0
      var j = 0
      while (j < ksub) {
        val base = (mi * ksub + j) * sub
        var dot = 0.0
        var nrm = 0.0
        var i = 0
        while (i < sub) {
          val x = get(a, mi * sub + i, isFloat)
          val w = cb(base + i).toDouble
          dot += x * w; nrm += w * w
          i += 1
        }
        val s = 2.0 * dot - nrm
        if (s >= best) { best = s; bestJ = j }
        j += 1
      }
      out(mi) = bestJ
      mi += 1
    }
    out
  }

  /** Fused encode-once-score-all-queries kernel: encode the corpus
    * vector ([[encodeCodes]] — the same argmin as [[pqEncode]], so codes
    * are bit-identical) and immediately score it against EVERY query's
    * flat ADC table (`tabs[qi·m·ksub ..)` laid out like [[pqTable]];
    * same left-to-right accumulation as [[pqAdc]]). One kernel call per
    * corpus row replaces the join-then-score shape whose whole-stage
    * codegen DEFERRED the encode projection into the per-pair loop —
    * the 4096-flop encode ran once per (corpus × query) pair instead of
    * once per corpus row (measured 5 µs/pair; the e_knn_pq 8×
    * scale-probe flag).
    */
  def pqScoreAll(a: ArrayData, isFloat: Boolean, cb: Array[Float],
                 m: Int, ksub: Int, sub: Int,
                 tabs: Array[Double]): ArrayData = {
    val codes = encodeCodes(a, isFloat, cb, m, ksub, sub)
    val mks = m * ksub
    val nq = tabs.length / mks
    val out = new Array[Double](nq)
    var qi = 0
    while (qi < nq) {
      val base = qi * mks
      var acc = 0.0
      var mi = 0
      while (mi < m) {
        acc += tabs(base + mi * ksub + codes(mi))
        mi += 1
      }
      out(qi) = acc
      qi += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** Per-query ADC table: entry `mi·ksub + j` = dot of the query's
    * subspace mi against codeword j, ascending-index sequential — the
    * broadcast-side half of asymmetric distance computation.
    */
  def pqTable(a: ArrayData, isFloat: Boolean, cb: Array[Float],
              m: Int, ksub: Int, sub: Int): ArrayData = {
    val out = new Array[Double](m * ksub)
    var mi = 0
    while (mi < m) {
      var j = 0
      while (j < ksub) {
        val base = (mi * ksub + j) * sub
        var dot = 0.0
        var i = 0
        while (i < sub) {
          dot += get(a, mi * sub + i, isFloat) * cb(base + i).toDouble
          i += 1
        }
        out(mi * ksub + j) = dot
        j += 1
      }
      mi += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** ADC score: Σ_mi tab[mi·ksub + codes[mi]], left-to-right — m table
    * lookups + adds per candidate, the whole point of PQ serving. */
  def pqAdc(tab: ArrayData, codes: ArrayData, ksub: Int): Double = {
    val m = codes.numElements()
    var acc = 0.0
    var mi = 0
    while (mi < m) {
      acc += tab.getDouble(mi * ksub + codes.getInt(mi))
      mi += 1
    }
    acc
  }

  /** [[pqAdc]] against a block of FLAT per-query tables (`tabs[base ..
    * base + m·ksub)` is one query's table, laid out exactly like the
    * [[pqTable]] output) — same left-to-right accumulation, so scores
    * are bit-identical to routing the table through a column. */
  def pqAdcAt(tabs: Array[Double], base: Int, codes: ArrayData,
              ksub: Int): Double = {
    val m = codes.numElements()
    var acc = 0.0
    var mi = 0
    while (mi < m) {
      acc += tabs(base + mi * ksub + codes.getInt(mi))
      mi += 1
    }
    acc
  }

  /** Random-hyperplane LSH bucket: bit p = sign of Σ_i x_i·s(i,p), with
    * s(i,p) = ±1 from splitmix64 parity — recomputable on any executor,
    * no stored planes.
    */
  def bucket(a: ArrayData, isFloat: Boolean, nPlanes: Int): Long = {
    val n = a.numElements()
    var bits = 0L
    var p = 0
    while (p < nPlanes) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val s = if ((mix((i.toLong << 16) | p.toLong) & 1L) == 0L) 1.0 else -1.0
        acc += x * s
        i += 1
      }
      if (acc >= 0.0) bits |= (1L << p)
      p += 1
    }
    bits
  }
}

trait VectorExpr { self: Expression =>
  protected def vecType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }
  protected def checkVec(es: Expression*): TypeCheckResult = {
    if (es.forall(e => vecType(e).isDefined))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${self.prettyName} expects array<float|double> arguments, got " +
        es.map(_.dataType.simpleString).mkString(", "))
  }
  protected def isFloat(e: Expression): Boolean =
    vecType(e).contains(FloatType)
}

/** dot(a, b) → double; NULL if either array has a null element. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with VectorExpr {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = checkVec(left, right)
  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]; val bb = b.asInstanceOf[ArrayData]
    if (VectorKernels.anyNull(aa) || VectorKernels.anyNull(bb)) null
    else VectorKernels.dot(aa, bb, isFloat(left), isFloat(right))
  }
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if (graft.functions.VectorKernels.anyNull($a) ||
          graft.functions.VectorKernels.anyNull($b)) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.VectorKernels.dot($a, $b,
          ${isFloat(left)}, ${isFloat(right)});
      }""")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(l, r)
}

/** cosine(a, b) → double, fused single pass; NULL on null elements. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with VectorExpr {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = checkVec(left, right)
  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]; val bb = b.asInstanceOf[ArrayData]
    if (VectorKernels.anyNull(aa) || VectorKernels.anyNull(bb)) null
    else VectorKernels.cosine(aa, bb, isFloat(left), isFloat(right))
  }
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if (graft.functions.VectorKernels.anyNull($a) ||
          graft.functions.VectorKernels.anyNull($b)) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.VectorKernels.cosine($a, $b,
          ${isFloat(left)}, ${isFloat(right)});
      }""")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(l, r)
}

/** l2norm(a) → double; NULL on null elements. */
case class L2Norm(child: Expression)
    extends UnaryExpression with VectorExpr {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = checkVec(child)
  override def nullSafeEval(a: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    if (VectorKernels.anyNull(aa)) null
    else VectorKernels.l2(aa, isFloat(child))
  }
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      if (graft.functions.VectorKernels.anyNull($a)) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.VectorKernels.l2($a, ${isFloat(child)});
      }""")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(c)
}

/** lsh_bucket(a, nPlanes) → long bucket id; NULL on null elements. */
case class HyperplaneBucket(child: Expression, nPlanes: Int)
    extends UnaryExpression with VectorExpr {
  require(nPlanes > 0 && nPlanes <= 62, "nPlanes must be in [1, 62]")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = checkVec(child)
  override def nullSafeEval(a: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    if (VectorKernels.anyNull(aa)) null
    else VectorKernels.bucket(aa, isFloat(child), nPlanes)
  }
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      if (graft.functions.VectorKernels.anyNull($a)) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.VectorKernels.bucket($a,
          ${isFloat(child)}, $nPlanes);
      }""")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(c)
}

/** sq8(a) → array<int> int8 codes; NULL on null elements. */
case class Sq8Quantize(child: Expression)
    extends UnaryExpression with VectorExpr {
  override def dataType: DataType = ArrayType(IntegerType, false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = checkVec(child)
  override def nullSafeEval(a: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    if (VectorKernels.anyNull(aa)) null
    else VectorKernels.sq8(aa, isFloat(child))
  }
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      if (graft.functions.VectorKernels.anyNull($a)) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.VectorKernels.sq8($a,
          ${isFloat(child)});
      }""")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(c)
}

/** i8_dot(codes_a, codes_b) → long exact integer dot product. */
case class Int8Dot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<int> arguments, got " +
        Seq(left, right).map(_.dataType.simpleString).mkString(", "))
  }
  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]; val bb = b.asInstanceOf[ArrayData]
    if (VectorKernels.anyNull(aa) || VectorKernels.anyNull(bb)) null
    else VectorKernels.i8dot(aa, bb)
  }
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if (graft.functions.VectorKernels.anyNull($a) ||
          graft.functions.VectorKernels.anyNull($b)) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.VectorKernels.i8dot($a, $b);
      }""")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(l, r)
}

/** vec_argmax_cosine(vec) → BIGINT id of the argmax-cosine centroid
  * (ties → larger id), centroids as LITERAL constructor data like
  * [[PqEncode]] — the greatest-over-structs expansion this replaces
  * passes the JVM 64 KB generated-method limit at corpus-scale cell
  * counts (k ≈ 500) and silently drops the stage out of codegen.
  */
case class ArgmaxCosine(child: Expression, cents: Array[Float],
                        ids: Array[Long], dim: Int)
    extends UnaryExpression with VectorExpr {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = checkVec(child)
  override def nullSafeEval(a: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    if (VectorKernels.anyNull(aa)) null
    else VectorKernels.argmaxCosine(aa, isFloat(child), cents, ids, dim)
  }
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("amccents", cents, "float[]")
    val iRef = ctx.addReferenceObj("amcids", ids, "long[]")
    nullSafeCodeGen(ctx, ev, a => s"""
      if (graft.functions.VectorKernels.anyNull($a)) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.VectorKernels.argmaxCosine($a,
          ${isFloat(child)}, $cRef, $iRef, $dim);
      }""")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  // Content-based equality — same rationale as [[PqEncode]].
  override def equals(o: Any): Boolean = o match {
    case p: ArgmaxCosine => p.child == child && p.dim == dim &&
      java.util.Arrays.equals(p.cents, cents) &&
      java.util.Arrays.equals(p.ids, ids)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    getClass, child, Int.box(dim),
    Int.box(java.util.Arrays.hashCode(cents)),
    Int.box(java.util.Arrays.hashCode(ids)))
}

/** pq_encode(vec) → array<int> of m subspace codes against LITERAL
  * codebooks (constructor data, not a child expression — codebooks are
  * metadata and ride the plan as a single reference object). A native
  * expression because the equivalent `greatest`-over-structs expansion
  * at ksub=64 grows generated code past the JVM's 64 KB method limit
  * and silently drops the whole stage out of codegen.
  */
case class PqEncode(child: Expression, cb: Array[Float], m: Int,
                    ksub: Int, sub: Int)
    extends UnaryExpression with VectorExpr {
  override def dataType: DataType = ArrayType(IntegerType, false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = checkVec(child)
  override def nullSafeEval(a: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    if (VectorKernels.anyNull(aa)) null
    else VectorKernels.pqEncode(aa, isFloat(child), cb, m, ksub, sub)
  }
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cb, "float[]")
    nullSafeCodeGen(ctx, ev, a => s"""
      if (graft.functions.VectorKernels.anyNull($a)) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.VectorKernels.pqEncode($a,
          ${isFloat(child)}, $cbRef, $m, $ksub, $sub);
      }""")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  // Content-based equality: the codebook rides as Array[Float], whose
  // case-class equals is reference identity — two semantically identical
  // expressions built from separate flat() calls would compare unequal
  // and silently defeat semanticEquals-driven reuse (CSE, exchange/
  // subquery reuse) in plans that construct the expression twice, e.g.
  // the two-stage rerank shape.
  override def equals(o: Any): Boolean = o match {
    case p: PqEncode => p.child == child && p.m == m && p.ksub == ksub &&
      p.sub == sub && java.util.Arrays.equals(p.cb, cb)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    getClass, child, Int.box(m), Int.box(ksub), Int.box(sub),
    Int.box(java.util.Arrays.hashCode(cb)))
}

/** pq_qtab(vec) → array<double> flattened m×ksub ADC dot table. */
case class PqQueryTable(child: Expression, cb: Array[Float], m: Int,
                        ksub: Int, sub: Int)
    extends UnaryExpression with VectorExpr {
  override def dataType: DataType = ArrayType(DoubleType, false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = checkVec(child)
  override def nullSafeEval(a: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    if (VectorKernels.anyNull(aa)) null
    else VectorKernels.pqTable(aa, isFloat(child), cb, m, ksub, sub)
  }
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cb, "float[]")
    nullSafeCodeGen(ctx, ev, a => s"""
      if (graft.functions.VectorKernels.anyNull($a)) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.VectorKernels.pqTable($a,
          ${isFloat(child)}, $cbRef, $m, $ksub, $sub);
      }""")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  // Content-based equality — same rationale as [[PqEncode]].
  override def equals(o: Any): Boolean = o match {
    case p: PqQueryTable => p.child == child && p.m == m &&
      p.ksub == ksub && p.sub == sub && java.util.Arrays.equals(p.cb, cb)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    getClass, child, Int.box(m), Int.box(ksub), Int.box(sub),
    Int.box(java.util.Arrays.hashCode(cb)))
}

/** pq_adc(tab, codes) → double approximate dot: m lookups + adds. */
case class PqAdcScore(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = left.dataType match {
      case ArrayType(DoubleType, _) => right.dataType match {
        case ArrayType(IntegerType, _) => true
        case _ => false
      }
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<double>, array<int>), got " +
        Seq(left, right).map(_.dataType.simpleString).mkString(", "))
  }
  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]; val bb = b.asInstanceOf[ArrayData]
    if (VectorKernels.anyNull(aa) || VectorKernels.anyNull(bb)) null
    else VectorKernels.pqAdc(aa, bb, ksub)
  }
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if (graft.functions.VectorKernels.anyNull($a) ||
          graft.functions.VectorKernels.anyNull($b)) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.VectorKernels.pqAdc($a, $b, $ksub);
      }""")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(l, r)
}

/** pq_adc_lit(codes, qidx) — ADC score against LITERAL query dot tables
  * (one flat `double[]` reference object holding every query's m×ksub
  * table, like [[PqEncode]]'s codebooks). The query tables are metadata
  * (nq × m × ksub doubles); shipping them as a JOIN COLUMN instead
  * makes every scored pair materialize the whole 4 KB table into its
  * join output row, and the corpus-wide scoring join goes
  * bandwidth-bound on table copies rather than lookups (measured
  * 5.5 µs/pair — the e_knn_pq 8× scale-probe regression). With the
  * tables literal, join rows carry (query_id, qidx) only and a score is
  * m lookups + adds. Same accumulation order as [[PqAdcScore]], so
  * scores are bit-identical.
  */
case class PqAdcLit(codes: Expression, qidx: Expression,
                    tabs: Array[Double], ksub: Int)
    extends BinaryExpression {
  override def left: Expression = codes
  override def right: Expression = qidx
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = codes.dataType.isInstanceOf[ArrayType] &&
      codes.dataType.asInstanceOf[ArrayType].elementType == IntegerType &&
      qidx.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<int>, int), got " +
        Seq(codes, qidx).map(_.dataType.simpleString).mkString(", "))
  }
  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    if (VectorKernels.anyNull(aa)) null
    else VectorKernels.pqAdcAt(tabs,
      b.asInstanceOf[Int] * (aa.numElements() * ksub), aa, ksub)
  }
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("pqtabs", tabs, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if (graft.functions.VectorKernels.anyNull($a)) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.VectorKernels.pqAdcAt($tRef,
          $b * ($a.numElements() * $ksub), $a, $ksub);
      }""")
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(codes = l, qidx = r)
  // Content-based equality — same rationale as [[PqEncode]].
  override def equals(o: Any): Boolean = o match {
    case p: PqAdcLit => p.codes == codes && p.qidx == qidx &&
      p.ksub == ksub && java.util.Arrays.equals(p.tabs, tabs)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    getClass, codes, qidx, Int.box(ksub),
    Int.box(java.util.Arrays.hashCode(tabs)))
}

/** pq_score_all(vec) → array<double> of ADC scores, one per query, from
  * a single fused kernel call: encode once, then m lookups per query
  * against the LITERAL flat table block (codebooks + tables ride the
  * plan as reference objects like [[PqEncode]]). This is the corpus-side
  * scoring shape for whole-corpus PQ serving ([[graft.similarity.Knn
  * .pqTopK]]): a map-only scan + posexplode replaces the broadcast
  * join whose codegen deferred the encode into the per-pair loop — see
  * [[VectorKernels.pqScoreAll]] for the measured pathology.
  */
case class PqScoreAll(child: Expression, cb: Array[Float], m: Int,
                      ksub: Int, sub: Int, tabs: Array[Double])
    extends UnaryExpression with VectorExpr {
  override def dataType: DataType = ArrayType(DoubleType, false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = checkVec(child)
  override def nullSafeEval(a: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    if (VectorKernels.anyNull(aa)) null
    else VectorKernels.pqScoreAll(aa, isFloat(child), cb, m, ksub, sub,
      tabs)
  }
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cb, "float[]")
    val tRef = ctx.addReferenceObj("pqtabs", tabs, "double[]")
    nullSafeCodeGen(ctx, ev, a => s"""
      if (graft.functions.VectorKernels.anyNull($a)) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.VectorKernels.pqScoreAll($a,
          ${isFloat(child)}, $cbRef, $m, $ksub, $sub, $tRef);
      }""")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  // Content-based equality — same rationale as [[PqEncode]].
  override def equals(o: Any): Boolean = o match {
    case p: PqScoreAll => p.child == child && p.m == m && p.ksub == ksub &&
      p.sub == sub && java.util.Arrays.equals(p.cb, cb) &&
      java.util.Arrays.equals(p.tabs, tabs)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    getClass, child, Int.box(m), Int.box(ksub), Int.box(sub),
    Int.box(java.util.Arrays.hashCode(cb)),
    Int.box(java.util.Arrays.hashCode(tabs)))
}

/** Column-API entry points for the vector expressions. */
object vector {
  private def ex(c: Column) = GraftColumnBridge.expression(c)
  def vec_dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(ex(a), ex(b)))
  def vec_cosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSimilarity(ex(a), ex(b)))
  def vec_l2(a: Column): Column = GraftColumnBridge.column(L2Norm(ex(a)))
  def lsh_bucket(a: Column, nPlanes: Int): Column =
    GraftColumnBridge.column(HyperplaneBucket(ex(a), nPlanes))
  def vec_sq8(a: Column): Column =
    GraftColumnBridge.column(Sq8Quantize(ex(a)))
  def vec_i8_dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(Int8Dot(ex(a), ex(b)))
  private def flat(cbs: Seq[Seq[Array[Float]]]): (Array[Float], Int, Int, Int) = {
    val m = cbs.length; val ksub = cbs.head.length
    val sub = cbs.head.head.length
    (cbs.flatten.flatten.toArray, m, ksub, sub)
  }
  def pq_encode(a: Column, cbs: Seq[Seq[Array[Float]]]): Column = {
    val (cb, m, ksub, sub) = flat(cbs)
    GraftColumnBridge.column(PqEncode(ex(a), cb, m, ksub, sub))
  }
  def pq_qtab(a: Column, cbs: Seq[Seq[Array[Float]]]): Column = {
    val (cb, m, ksub, sub) = flat(cbs)
    GraftColumnBridge.column(PqQueryTable(ex(a), cb, m, ksub, sub))
  }
  def pq_adc(tab: Column, codes: Column, ksub: Int): Column =
    GraftColumnBridge.column(PqAdcScore(ex(tab), ex(codes), ksub))
  /** ADC against literal per-query tables — see [[PqAdcLit]]. */
  def pq_adc_lit(codes: Column, qidx: Column, tabs: Array[Double],
                 ksub: Int): Column =
    GraftColumnBridge.column(PqAdcLit(ex(codes), ex(qidx), tabs, ksub))
  /** Fused encode-once-score-all-queries — see [[PqScoreAll]]. */
  def pq_score_all(a: Column, cbs: Seq[Seq[Array[Float]]],
                   tabs: Array[Double]): Column = {
    val (cb, m, ksub, sub) = flat(cbs)
    GraftColumnBridge.column(PqScoreAll(ex(a), cb, m, ksub, sub, tabs))
  }
  /** Driver-side [[VectorKernels.pqTable]] over collected query vectors:
    * one flat tabs block in query order, computed by the SAME kernel the
    * executor-side expression uses — bit-identical tables. */
  def pq_tabs_flat(qvecs: Seq[Array[Float]],
                   cbs: Seq[Seq[Array[Float]]]): Array[Double] = {
    val (cb, m, ksub, sub) = flat(cbs)
    val mks = m * ksub
    val tabs = new Array[Double](qvecs.length * mks)
    qvecs.zipWithIndex.foreach { case (v, i) =>
      val t = VectorKernels.pqTable(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v),
        isFloat = true, cb, m, ksub, sub)
      var j = 0
      while (j < mks) { tabs(i * mks + j) = t.getDouble(j); j += 1 }
    }
    tabs
  }
  /** Argmax-cosine centroid assignment (ties → larger id); centroids
    * ride the plan as one flat reference object. */
  def vec_argmax_cosine(a: Column,
                        centroids: Seq[(Long, Array[Float])]): Column = {
    require(centroids.nonEmpty, "argmax over an empty centroid set")
    val dim = centroids.head._2.length
    require(centroids.forall(_._2.length == dim),
      "ragged centroid dimensions")
    val flatC = new Array[Float](centroids.length * dim)
    centroids.zipWithIndex.foreach { case ((_, v), j) =>
      System.arraycopy(v, 0, flatC, j * dim, dim)
    }
    GraftColumnBridge.column(ArgmaxCosine(ex(a), flatC,
      centroids.map(_._1).toArray, dim))
  }
}
