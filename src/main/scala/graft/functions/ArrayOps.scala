package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}

/** Native Catalyst set-intersection size over two SORTED string arrays.
  *
  * `array_intersect` builds a hash set and materializes the intersection
  * array on every invocation — per-row allocations that dominate
  * all-pairs similarity joins (millions of calls on small arrays). This
  * expression is the engine's hot-path replacement: a zero-allocation
  * two-pointer merge count compiled into whole-stage codegen. Inputs
  * must be sorted ascending (Spark's `array_sort` / `sort_array` use
  * UTF8String binary order, which is what the merge compares with);
  * sort once per document, merge per pair. Duplicate elements are
  * counted ONCE (set semantics, same as `size(array_intersect(a, b))`):
  * after a match the merge skips past equal runs on both sides, so
  * callers need not `array_distinct` first.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    // null elements never match (SQL equality semantics) — skip them,
    // don't NPE; array_sort puts nulls last, so skipping preserves order
    while (i < na && j < nb) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val cmp = x.getUTF8String(i).binaryCompare(y.getUTF8String(j))
        if (cmp == 0) {
          c += 1
          // set semantics: skip equal runs so duplicates count once
          val v = x.getUTF8String(i)
          i += 1; j += 1
          while (i < na && !x.isNullAt(i) && x.getUTF8String(i).binaryEquals(v)) i += 1
          while (j < nb && !y.isNullAt(j) && y.getUTF8String(j).binaryEquals(v)) j += 1
        }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // Generic path: ArrayData interface + UTF8String wrappers.
      val slowMerge = ctx.addNewFunction("graftSortedIntersectSlow",
        s"""
           |private int graftSortedIntersectSlow(
           |    org.apache.spark.sql.catalyst.util.ArrayData a,
           |    org.apache.spark.sql.catalyst.util.ArrayData b) {
           |  int i = 0, j = 0, c = 0;
           |  final int na = a.numElements();
           |  final int nb = b.numElements();
           |  while (i < na && j < nb) {
           |    if (a.isNullAt(i)) { i++; }
           |    else if (b.isNullAt(j)) { j++; }
           |    else {
           |      final int cmp = a.getUTF8String(i).binaryCompare(b.getUTF8String(j));
           |      if (cmp == 0) {
           |        c++;
           |        final org.apache.spark.unsafe.types.UTF8String v = a.getUTF8String(i);
           |        i++; j++;
           |        while (i < na && !a.isNullAt(i) && a.getUTF8String(i).binaryEquals(v)) i++;
           |        while (j < nb && !b.isNullAt(j) && b.getUTF8String(j).binaryEquals(v)) j++;
           |      }
           |      else if (cmp < 0) i++;
           |      else j++;
           |    }
           |  }
           |  return c;
           |}
         """.stripMargin)
      // Fast path: both arrays Unsafe-backed (the case in every join/agg
      // pipeline — rows are UnsafeRows). getUTF8String allocates a
      // wrapper PER ELEMENT ACCESS (UTF8String.fromAddress dominated
      // the post-binaryCompare JFR profile: ~half a billion short-lived
      // objects across a pair pipeline), so this path compares the raw
      // bytes via the documented UnsafeArrayData layout instead:
      // [8B numElements][null bitset][8B offsetAndSize per element]
      // with offset relative to the array base. Binary order ==
      // unsigned-byte order, matching binaryCompare exactly.
      val fastMerge = ctx.addNewFunction("graftSortedIntersectFast",
        s"""
           |private int graftSortedIntersectFast(
           |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData a,
           |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData b) {
           |  final Object aBase = a.getBaseObject();
           |  final Object bBase = b.getBaseObject();
           |  final long aOff = a.getBaseOffset();
           |  final long bOff = b.getBaseOffset();
           |  final int na = a.numElements();
           |  final int nb = b.numElements();
           |  final long aElems = aOff + 8L + (((long) na + 63) / 64) * 8L;
           |  final long bElems = bOff + 8L + (((long) nb + 63) / 64) * 8L;
           |  int i = 0, j = 0, c = 0;
           |  long mOff = 0L; int mLen = -1; // bytes of the last match (for run skip)
           |  Object mBase = null;
           |  while (i < na && j < nb) {
           |    if (a.isNullAt(i)) { i++; continue; }
           |    if (b.isNullAt(j)) { j++; continue; }
           |    final long x = org.apache.spark.unsafe.Platform.getLong(aBase, aElems + 8L * i);
           |    final long y = org.apache.spark.unsafe.Platform.getLong(bBase, bElems + 8L * j);
           |    final long xo = aOff + (int) (x >> 32); final int xl = (int) x;
           |    final long yo = bOff + (int) (y >> 32); final int yl = (int) y;
           |    int cmp = 0;
           |    final int min = xl < yl ? xl : yl;
           |    for (int k = 0; k < min; k++) {
           |      cmp = (org.apache.spark.unsafe.Platform.getByte(aBase, xo + k) & 0xFF)
           |          - (org.apache.spark.unsafe.Platform.getByte(bBase, yo + k) & 0xFF);
           |      if (cmp != 0) break;
           |    }
           |    if (cmp == 0) cmp = xl - yl;
           |    if (cmp == 0) {
           |      c++;
           |      mBase = aBase; mOff = xo; mLen = xl;
           |      i++; j++;
           |      while (i < na && !a.isNullAt(i)) {
           |        final long e = org.apache.spark.unsafe.Platform.getLong(aBase, aElems + 8L * i);
           |        if ((int) e != mLen || !org.apache.spark.unsafe.array.ByteArrayMethods
           |            .arrayEquals(aBase, aOff + (int) (e >> 32), mBase, mOff, mLen)) break;
           |        i++;
           |      }
           |      while (j < nb && !b.isNullAt(j)) {
           |        final long e = org.apache.spark.unsafe.Platform.getLong(bBase, bElems + 8L * j);
           |        if ((int) e != mLen || !org.apache.spark.unsafe.array.ByteArrayMethods
           |            .arrayEquals(bBase, bOff + (int) (e >> 32), mBase, mOff, mLen)) break;
           |        j++;
           |      }
           |    }
           |    else if (cmp < 0) i++;
           |    else j++;
           |  }
           |  return c;
           |}
         """.stripMargin)
      s"""
         |if ($a instanceof org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    && $b instanceof org.apache.spark.sql.catalyst.expressions.UnsafeArrayData) {
         |  ${ev.value} = $fastMerge(
         |    (org.apache.spark.sql.catalyst.expressions.UnsafeArrayData) $a,
         |    (org.apache.spark.sql.catalyst.expressions.UnsafeArrayData) $b);
         |} else {
         |  ${ev.value} = $slowMerge($a, $b);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** Fused cosine similarity over two `array<double>` columns.
  *
  * The compositional form (`aggregate(zip_with(a, b, _*_), 0, _+_) /
  * (sqrt(...) * sqrt(...))`) materializes an intermediate product array
  * and re-traverses each input three times per row — per-row allocations
  * that dominate all-pairs similarity scoring. This expression computes
  * dot product and both norms in ONE loop with three scalar
  * accumulators, no intermediates, inside whole-stage codegen.
  * Accumulation order is left-to-right, matching the DuckDB oracle's
  * `list_dot_product`. Returns null if lengths differ or either norm is
  * zero.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      // a null component makes the whole similarity undefined → null
      // (matches the zip_with/aggregate composition this replaced)
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val ua = ctx.freshName("ua")
      val ub = ctx.freshName("ub")
      val aBase = ctx.freshName("aBase")
      val bBase = ctx.freshName("bBase")
      val aElems = ctx.freshName("aElems")
      val bElems = ctx.freshName("bElems")
      val uad = "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData"
      val platform = "org.apache.spark.unsafe.Platform"
      // Fast path mirrors SortedIntersectSize's: Unsafe-backed arrays
      // (every join/agg pipeline) are read straight from the documented
      // layout — getDouble through the ArrayData interface is a virtual
      // dispatch per element, ~192 of them per all-pairs cosine.
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else if ($a instanceof $uad && $b instanceof $uad) {
         |  final $uad $ua = ($uad) $a;
         |  final $uad $ub = ($uad) $b;
         |  final Object $aBase = $ua.getBaseObject();
         |  final Object $bBase = $ub.getBaseObject();
         |  final long $aElems = $ua.getBaseOffset() + 8L + ((($n + 63) / 64)) * 8L;
         |  final long $bElems = $ub.getBaseOffset() + 8L + ((($n + 63) / 64)) * 8L;
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($ua.isNullAt($i) || $ub.isNullAt($i)) { ${ev.isNull} = true; }
         |    else {
         |      final double $xv = $platform.getDouble($aBase, $aElems + 8L * $i);
         |      final double $yv = $platform.getDouble($bBase, $bElems + 8L * $i);
         |      $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    if ($na == 0.0 || $nb == 0.0) { ${ev.isNull} = true; }
         |    else { ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)); }
         |  }
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
         |    else {
         |      final double $xv = $a.getDouble($i);
         |      final double $yv = $b.getDouble($i);
         |      $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    if ($na == 0.0 || $nb == 0.0) { ${ev.isNull} = true; }
         |    else { ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)); }
         |  }
         |}
       """.stripMargin
    })

  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Fused exact squared-L2 over two int64 (micro-unit) arrays: one
  * loop, one long accumulator, no intermediate arrays — the integer
  * sibling of [[CosineSimilarity]], built for the trained-k-means
  * argmin where the zip_with/aggregate composition allocates a diff
  * array and walks it again PER CENTROID per row (k·3 walks + k allocs
  * per corpus row per Lloyd pass — measured 25 s for the ×100 training
  * face before fusing). Integer adds are fold-order-free, so the fused
  * loop is bit-identical to the composition and to DuckDB's HUGEINT
  * fold. Returns null if lengths differ or any component is null
  * (matching the composition's null algebra). Overflow is the
  * CALLER's contract: `Similarity.microQuant` bounds components to
  * √(Long.Max/4d) micro-units so no (a−b)² sum can wrap. */
case class L2MicroSquared(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "l2_micro_squared"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val ua = ctx.freshName("ua")
      val ub = ctx.freshName("ub")
      val aBase = ctx.freshName("aBase")
      val bBase = ctx.freshName("bBase")
      val aElems = ctx.freshName("aElems")
      val bElems = ctx.freshName("bElems")
      val uad = "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData"
      val platform = "org.apache.spark.unsafe.Platform"
      // Unsafe fast path: same documented layout walk as
      // CosineSimilarity/SortedIntersectSize — 8-byte header word plus
      // one null-tracking word per 64 elements, then 8-byte elements.
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else if ($a instanceof $uad && $b instanceof $uad) {
         |  final $uad $ua = ($uad) $a;
         |  final $uad $ub = ($uad) $b;
         |  final Object $aBase = $ua.getBaseObject();
         |  final Object $bBase = $ub.getBaseObject();
         |  final long $aElems = $ua.getBaseOffset() + 8L + ((($n + 63) / 64)) * 8L;
         |  final long $bElems = $ub.getBaseOffset() + 8L + ((($n + 63) / 64)) * 8L;
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($ua.isNullAt($i) || $ub.isNullAt($i)) { ${ev.isNull} = true; }
         |    else {
         |      final long $d = $platform.getLong($aBase, $aElems + 8L * $i)
         |        - $platform.getLong($bBase, $bElems + 8L * $i);
         |      $acc += $d * $d;
         |    }
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
         |    else {
         |      final long $d = $a.getLong($i) - $b.getLong($i);
         |      $acc += $d * $d;
         |    }
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2MicroSquared =
    copy(left = newLeft, right = newRight)
}

/** Fused exact int64 dot product — [[L2MicroSquared]]'s sibling (one
  * loop, one long accumulator, Unsafe fast path, same null algebra:
  * null on length mismatch or any null component). Built for the SRP
  * projection's signed sums (q153), where the zip_with/aggregate
  * composition would pay outDims product-array allocations per corpus
  * row — the pattern the k-means fusion already measured at 6× on the
  * ×100 face. Overflow is the caller's contract (SRP sums of ±1·micro
  * components are ≤ dims·maxAbs, far inside int64; general micro-unit
  * dots must bound inputs like `Similarity.microQuant` does). */
case class DotMicro(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_micro"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val ua = ctx.freshName("ua")
      val ub = ctx.freshName("ub")
      val aBase = ctx.freshName("aBase")
      val bBase = ctx.freshName("bBase")
      val aElems = ctx.freshName("aElems")
      val bElems = ctx.freshName("bElems")
      val uad = "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData"
      val platform = "org.apache.spark.unsafe.Platform"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else if ($a instanceof $uad && $b instanceof $uad) {
         |  final $uad $ua = ($uad) $a;
         |  final $uad $ub = ($uad) $b;
         |  final Object $aBase = $ua.getBaseObject();
         |  final Object $bBase = $ub.getBaseObject();
         |  final long $aElems = $ua.getBaseOffset() + 8L + ((($n + 63) / 64)) * 8L;
         |  final long $bElems = $ub.getBaseOffset() + 8L + ((($n + 63) / 64)) * 8L;
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($ua.isNullAt($i) || $ub.isNullAt($i)) { ${ev.isNull} = true; }
         |    else {
         |      $acc += $platform.getLong($aBase, $aElems + 8L * $i)
         |        * $platform.getLong($bBase, $bElems + 8L * $i);
         |    }
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
         |    else { $acc += $a.getLong($i) * $b.getLong($i); }
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotMicro =
    copy(left = newLeft, right = newRight)
}

/** First-collision test for dedup-free LSH enumeration: TRUE iff the
  * two key vectors DIFFER at every index j < `bandId` — i.e. `bandId`
  * is the first band where the docs collide, so this band (alone)
  * emits the pair. The composed column form
  * (`element_at(keysA, j+1) =!= element_at(keysB, j+1)` per band)
  * materializes a UTF8String wrapper per element access per pair; this
  * expression compares raw bytes over Unsafe-backed arrays with the
  * same layout walk as [[SortedIntersectSize]], falling back to
  * wrapper equality for generic arrays. */
case class NoEarlierCollision(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "no_earlier_collision"

  override def nullSafeEval(ka: Any, kb: Any, bid: Any): Any = {
    val a = ka.asInstanceOf[ArrayData]
    val b = kb.asInstanceOf[ArrayData]
    val upto = bid.asInstanceOf[Int]
    var j = 0
    while (j < upto) {
      if (a.getUTF8String(j).binaryEquals(b.getUTF8String(j))) return false
      j += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, bid) => {
      val fn = ctx.addNewFunction("graftNoEarlierCollision",
        s"""
           |private boolean graftNoEarlierCollision(
           |    org.apache.spark.sql.catalyst.util.ArrayData a,
           |    org.apache.spark.sql.catalyst.util.ArrayData b,
           |    int upto) {
           |  if (a instanceof org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
           |      && b instanceof org.apache.spark.sql.catalyst.expressions.UnsafeArrayData) {
           |    final org.apache.spark.sql.catalyst.expressions.UnsafeArrayData ua =
           |      (org.apache.spark.sql.catalyst.expressions.UnsafeArrayData) a;
           |    final org.apache.spark.sql.catalyst.expressions.UnsafeArrayData ub =
           |      (org.apache.spark.sql.catalyst.expressions.UnsafeArrayData) b;
           |    final Object aBase = ua.getBaseObject();
           |    final Object bBase = ub.getBaseObject();
           |    final long aOff = ua.getBaseOffset();
           |    final long bOff = ub.getBaseOffset();
           |    final long aElems = aOff + 8L + (((long) ua.numElements() + 63) / 64) * 8L;
           |    final long bElems = bOff + 8L + (((long) ub.numElements() + 63) / 64) * 8L;
           |    for (int j = 0; j < upto; j++) {
           |      final long x = org.apache.spark.unsafe.Platform.getLong(aBase, aElems + 8L * j);
           |      final long y = org.apache.spark.unsafe.Platform.getLong(bBase, bElems + 8L * j);
           |      if ((int) x == (int) y && org.apache.spark.unsafe.array.ByteArrayMethods
           |          .arrayEquals(aBase, aOff + (int) (x >> 32), bBase, bOff + (int) (y >> 32),
           |            (int) x)) {
           |        return false;
           |      }
           |    }
           |    return true;
           |  }
           |  for (int j = 0; j < upto; j++) {
           |    if (a.getUTF8String(j).binaryEquals(b.getUTF8String(j))) return false;
           |  }
           |  return true;
           |}
         """.stripMargin)
      s"${ev.value} = $fn($a, $b, $bid);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): NoEarlierCollision =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object ArrayOps {
  /** Column API for [[SortedIntersectSize]] — both inputs must be sorted. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectSize(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API for [[NoEarlierCollision]]: true iff `keysA` and
    * `keysB` differ at every index below `bandId` (0-based). */
  def noEarlierCollision(keysA: Column, keysB: Column, bandId: Column): Column =
    ColumnBridge.column(NoEarlierCollision(
      ColumnBridge.expression(keysA), ColumnBridge.expression(keysB),
      ColumnBridge.expression(bandId)))

  /** Column API for [[L2MicroSquared]] — inputs cast to array<bigint>
    * (the cast is a no-op on long arrays; on anything narrower it
    * guards the Unsafe fast path's 8-byte element stride, which would
    * otherwise read int arrays at wrong offsets silently). */
  def l2MicroSquared(a: Column, b: Column): Column =
    ColumnBridge.column(L2MicroSquared(
      ColumnBridge.expression(a.cast("array<bigint>")),
      ColumnBridge.expression(b.cast("array<bigint>"))))

  /** Column API for [[DotMicro]] — same cast guard. */
  def dotMicro(a: Column, b: Column): Column =
    ColumnBridge.column(DotMicro(
      ColumnBridge.expression(a.cast("array<bigint>")),
      ColumnBridge.expression(b.cast("array<bigint>"))))

  /** Column API for [[CosineSimilarity]] — inputs cast to array<double>. */
  def cosineSimilarity(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))

  /** Let-binding for expression trees: evaluate `value` ONCE and feed
    * it to `body` as a lambda variable. Codegen's subexpression
    * elimination does not reach inside higher-order-function lambdas,
    * so a lambda body referencing an expensive subtree (e.g.
    * `slice(split(text), i, n)` inside a shingle `transform`) re-runs
    * it per ELEMENT — a 3× slowdown measured on the shingle pipeline.
    * `transform(array(value), v => body(v))` evaluates `value` once per
    * row and binds it as a (cheap) lambda variable; `element_at(_, 1)`
    * unwraps the singleton result. */
  def bind(value: Column)(body: Column => Column): Column =
    org.apache.spark.sql.functions.element_at(
      org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.array(value), v => body(v)), 1)
}
