package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, StringType}

/** Input-type contract bridge. Spark 4 marks [[AbstractDataType]]
  * `private[sql]`, so a library expression outside the sql package
  * tree cannot even SPELL the `inputTypes` override it needs for
  * analysis-time type checking. This trait pins the one contract the
  * engine's string-input expressions (e.g.
  * [[graft.functions.CharWindowSums]]) require — a mistyped child
  * fails analysis with a proper DATATYPE_MISMATCH instead of a runtime
  * ClassCastException inside codegen. */
trait ExpectsStringInput extends ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
}

/** Binary-input twin of [[ExpectsStringInput]], for expressions that
  * consume raw payload bytes (e.g.
  * [[graft.functions.JdkAvFeatures]]). */
trait ExpectsBinaryInput extends ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
}

/** Token-array twin, for expressions that consume a tokenized document
  * (e.g. [[graft.functions.RollingHashWindows]]). */
trait ExpectsStringArrayInput extends ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.ArrayType(StringType))
}
