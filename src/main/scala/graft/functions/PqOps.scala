package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native form of the PQ ENCODE projection
  * ([[graft.operators.Similarity.pqEncode]]'s per-subspace argmin):
  * for each of `m` subspaces, the squared L2 distance from the row's
  * subvector to each of the `k` codebook centroids, keeping the
  * first-minimum code.
  *
  * Why native: the composed form evaluates `m·k` interpreted
  * `slice`/`zip_with`/`aggregate` lambdas per corpus row — at the PQ
  * family's shape (m=4, k=8, subDim=16) that is 32 sliced subvector
  * allocations, 32 diff-array allocations and 512 interpreted
  * fold steps per row, and it dominates the corpus pass of every
  * PQ face (q87 ADC, q88 IVFADC write, q90 shortlist, and the trained
  * recall probes). This expression runs the whole argmin as one fused
  * loop in whole-stage codegen: zero allocation beyond the m-entry
  * output array.
  *
  * Values are IDENTICAL to the composed form by construction — the
  * per-centroid distance is the same left-to-right double fold
  * `Σ (x_i − c_i)²` (rounded mode then applies the same
  * `floor(d·10⁴ + 0.5) → long` finisher, Java `(long) Math.floor`
  * exactly like Spark's `floor(double).cast(long)`), and the argmin
  * keeps the FIRST minimum under the same total order
  * (`Double.compare` in raw mode — the ordering `array_min` /
  * `array_position` use), so code assignment, tie-breaks, stored
  * artifacts and every oracle stay valid. Null algebra matches the
  * composition: a subspace whose slice is incomplete (short vector)
  * or covers a null component yields a null code; a NULL VECTOR is
  * the caller's seam — the column API coalesces the expression's
  * null to the composed form's all-null code array. SimilaritySpec
  * pins equality against the composed twin, including short / null /
  * null-component vectors, in both rounded modes. */
case class PqEncodeCodes(child: Expression, cents: Seq[Double], m: Int,
    k: Int, subDim: Int, rounded: Boolean) extends UnaryExpression {

  require(cents.length == m * k * subDim,
    s"codebook must hold m*k*subDim = ${m * k * subDim} values, got ${cents.length}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def prettyName: String = "pq_encode_codes"

  @transient private lazy val centsArr: Array[Double] = cents.toArray

  override protected def nullSafeEval(input: Any): Any =
    PqEncodeCodes.compute(input.asInstanceOf[ArrayData], centsArr, m, k, subDim, rounded)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCents", centsArr, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqEncodeCodes.compute($c, $ref, $m, $k, $subDim, $rounded)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeCodes =
    copy(child = newChild)
}

object PqEncodeCodes {

  /** The m-entry code array for one vector. Codebook is flat
    * `[m][k][subDim]` row-major. */
  def compute(vec: ArrayData, cents: Array[Double], m: Int, k: Int,
      subDim: Int, rounded: Boolean): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val base = j * subDim
      // composed slice semantics: an out-of-range or null-covering
      // subspace nulls every candidate distance, hence the code
      var ok = base + subDim <= n
      var i = 0
      while (ok && i < subDim) {
        if (vec.isNullAt(base + i)) ok = false
        i += 1
      }
      if (ok) {
        var bestC = 0
        if (rounded) {
          var best = 0L
          var c = 0
          while (c < k) {
            var acc = 0.0
            val cOff = (j * k + c) * subDim
            var t = 0
            while (t < subDim) {
              val d = vec.getDouble(base + t) - cents(cOff + t)
              acc += d * d
              t += 1
            }
            // floor(acc*1e4 + 0.5) cast long — Spark's floor(double) is
            // (long) Math.floor(x), NaN → 0, ±Inf saturating, replicated
            val dl = Math.floor(acc * 10000.0 + 0.5).toLong
            if (c == 0 || dl < best) { best = dl; bestC = c }
            c += 1
          }
        } else {
          var best = 0.0
          var c = 0
          while (c < k) {
            var acc = 0.0
            val cOff = (j * k + c) * subDim
            var t = 0
            while (t < subDim) {
              val d = vec.getDouble(base + t) - cents(cOff + t)
              acc += d * d
              t += 1
            }
            // first minimum under Double.compare — the total order
            // array_min/array_position rank doubles with (NaN greatest,
            // -0.0 < 0.0), so ties and NaN distances break identically
            if (c == 0 || java.lang.Double.compare(acc, best) < 0) {
              best = acc; bestC = c
            }
            c += 1
          }
        }
        out(j) = bestC
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Native form of the ADC SCORE fold
  * ([[graft.operators.Similarity]]'s `adcScore`): sum of `m` lookup-
  * table entries `tab[j·k + codes[j]]` — one per subspace — over a
  * per-query flat m·k distance table.
  *
  * Why native: the composed `zip_with(codes, sequence(0, m−1), …)` +
  * `aggregate` pair allocates a lookup array and runs 2·m interpreted
  * lambda steps per (corpus row × query) — the inner loop of every
  * ADC probe (q87/q88/q90 and the trained recall probes). This
  * expression is one fused loop in whole-stage codegen.
  *
  * Values are IDENTICAL to the composition on its produced domain:
  * rounded mode sums longs (fold-order-free), raw mode left-folds
  * doubles in subspace order exactly like `aggregate`; a null codes
  * array, a codes length ≠ m, a null code or a null table entry each
  * yield null, matching the composition's `element_at`/fold null
  * algebra. Out-of-range or index-0 lookups — unreachable for
  * produced codes, which are always in [0, k) against an m·k table —
  * map to null where the composition's `element_at` would raise
  * under ANSI (negative indices keep element_at's from-the-end
  * reading). SimilaritySpec pins equality against the composed twin
  * in both modes. */
case class AdcLookupSum(left: Expression, right: Expression, m: Int,
    k: Int, rounded: Boolean) extends BinaryExpression {

  override def dataType: DataType = if (rounded) LongType else DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_lookup_sum"

  /** The `rounded` flag dictates how table cells are READ (getLong vs
    * getDouble on the raw ArrayData) — a mismatched element type would
    * silently reinterpret bits into garbage scores rather than fail
    * (round-15 advice). Enforce the pairing at the expression boundary:
    * rounded → array<bigint> table, raw → array<double>. */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val want: DataType = if (rounded) LongType else DoubleType
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(et, _)) if et == want =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName(rounded=$rounded) expects (array<int>, " +
          s"array<${want.simpleString}>); got (${l.simpleString}, ${r.simpleString})")
    }
  }

  override protected def nullSafeEval(codes: Any, tab: Any): Any =
    AdcLookupSum.compute(codes.asInstanceOf[ArrayData],
      tab.asInstanceOf[ArrayData], m, k, rounded)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, t) => {
      val r = ctx.freshName("adcSum")
      val (box, unbox) =
        if (rounded) ("java.lang.Long", "longValue") else ("java.lang.Double", "doubleValue")
      s"""
         |Object $r = graft.functions.AdcLookupSum.compute($c, $t, $m, $k, $rounded);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (($box) $r).$unbox(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcLookupSum =
    copy(left = newLeft, right = newRight)
}

object AdcLookupSum {

  /** Boxed Long (rounded) / Double (raw) sum, or null per the
    * composition's null algebra. */
  def compute(codes: ArrayData, tab: ArrayData, m: Int, k: Int,
      rounded: Boolean): Any = {
    // zip_with pads the shorter side with nulls, so any length ≠ m
    // nulls at least one lookup and therefore the whole fold
    if (codes.numElements() != m) return null
    val tlen = tab.numElements()
    if (rounded) {
      var acc = 0L
      var j = 0
      while (j < m) {
        if (codes.isNullAt(j)) return null
        val idx1 = j * k + codes.getInt(j) + 1 // element_at is 1-based
        val pos = if (idx1 > 0) idx1 - 1
                  else if (idx1 < 0) tlen + idx1
                  else return null
        if (pos < 0 || pos >= tlen || tab.isNullAt(pos)) return null
        acc += tab.getLong(pos)
        j += 1
      }
      java.lang.Long.valueOf(acc)
    } else {
      var acc = 0.0
      var j = 0
      while (j < m) {
        if (codes.isNullAt(j)) return null
        val idx1 = j * k + codes.getInt(j) + 1
        val pos = if (idx1 > 0) idx1 - 1
                  else if (idx1 < 0) tlen + idx1
                  else return null
        if (pos < 0 || pos >= tlen || tab.isNullAt(pos)) return null
        acc += tab.getDouble(pos)
        j += 1
      }
      java.lang.Double.valueOf(acc)
    }
  }
}

object PqOps {

  /** Column API for [[PqEncodeCodes]] — `vec` must already be
    * `array<double>`; a null vector maps to the composed form's
    * all-null code array (the expression itself is null-strict). */
  def encodeCodes(vec: Column, cents: Seq[Double], m: Int, k: Int,
      subDim: Int, rounded: Boolean): Column = {
    import org.apache.spark.sql.functions.{array, coalesce, lit}
    val native = ColumnBridge.column(PqEncodeCodes(
      ColumnBridge.expression(vec), cents, m, k, subDim, rounded))
    coalesce(native, array((0 until m).map(_ => lit(null).cast("int")): _*))
  }

  /** Column API for [[AdcLookupSum]]: rounded → long sum of 4-dp-scaled
    * table entries, raw → left-folded double sum. */
  def adcLookupSum(codes: Column, tab: Column, m: Int, k: Int,
      rounded: Boolean): Column =
    ColumnBridge.column(AdcLookupSum(
      ColumnBridge.expression(codes), ColumnBridge.expression(tab),
      m, k, rounded))
}
