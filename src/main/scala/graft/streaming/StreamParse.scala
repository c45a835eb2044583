package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, MapType, StringType, StructField, StructType}

/** Lenient payload parsing for streams — capability T2 (SURVEY.md §2.8).
  *
  * Reference semantics (`pyspark/stream_stock.py:28-61`,
  * `stream_combined.py:29-69`): the message schema declares EVERY field
  * as StringType, `from_json` parses the binary payload leniently
  * (malformed JSON → null struct), and each field is then cast to its
  * real type in the projection. We preserve that
  * parse-as-string-then-coerce contract: drifted or junk values degrade
  * to nulls instead of failing the stream.
  */
object StreamParse {

  /** Parse schema: ATOMIC fields relax to StringType (the reference's
    * parse-as-string-then-coerce contract); nested struct/array/map
    * fields keep their real type — a string field cannot be cast to a
    * complex type (the all-string form failed analysis for any nested
    * target), and `from_json`'s PERMISSIVE mode already degrades a
    * malformed nested value to null on its own. */
  def lenientSchema(target: StructType): StructType =
    StructType(target.fields.map {
      case f @ StructField(_, _: StructType | _: ArrayType | _: MapType, _, _) =>
        f.copy(nullable = true)
      case f => StructField(f.name, StringType, nullable = true)
    })

  /** payload (binary or string) → typed columns per `target`, plus any
    * passthrough columns (e.g. the source's publish timestamp). */
  def parse(df: DataFrame, payloadCol: String, target: StructType,
      passthrough: Seq[String] = Seq.empty): DataFrame = {
    val parsed = df.withColumn("data",
      from_json(col(payloadCol).cast("string"), lenientSchema(target)))
    // try_cast, not cast: Spark 4 runs ANSI mode by default, where a
    // malformed value would fail the whole stream; the reference's
    // lenient contract coerces junk to null instead. Nested fields are
    // already parsed at their real type — no cast to apply.
    val projected: Seq[Column] =
      target.fields.toSeq.map {
        case f @ StructField(_, _: StructType | _: ArrayType | _: MapType, _, _) =>
          col(s"data.${f.name}").as(f.name)
        case f => col(s"data.${f.name}").try_cast(f.dataType).as(f.name)
      } ++ passthrough.map(col)
    parsed.select(projected: _*)
  }
}
