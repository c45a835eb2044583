package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

/** Schema-coerced, drift-tolerant parquet reader (capabilities S1–S4,
  * SURVEY.md §2.1).
  *
  * The reference enumerates the live folder glob through a py4j gateway
  * (`pyspark/batch_stock.py:18-27`), reads each fragment separately,
  * force-casts every column to a hand-written StructType
  * (`cast_columns_to_schema`, `pyspark/batch_stock.py:11-16`) and folds
  * the fragments with `unionByName(allowMissingColumns=True)`
  * (`pyspark/batch_stock.py:35`).
  *
  * Spark-first re-expression: the per-file union loop defeats
  * FileSourceScanExec's multi-file parallelism, so the default here is a
  * SINGLE multi-path vectorized scan (one codegen'd stage, schema/filter
  * pushdown intact); the per-file `unionByName` fold remains as the
  * fallback for structurally drifted fragment sets. At 100 TB the single
  * scan is the only viable shape — one scan node, split planning by
  * `spark.sql.files.maxPartitionBytes`, no N-way union of N scans.
  */
object SchemaReader {

  /** Hadoop glob enumeration of a path pattern — capability S2
    * (`batch_stock.py:18-27`), direct JVM call (no gateway). */
  def glob(spark: SparkSession, pattern: String): Seq[String] = {
    val path = new Path(pattern)
    val fs: FileSystem = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Option(fs.globStatus(path)).map(_.toSeq.map(_.getPath.toString)).getOrElse(Seq.empty)
  }

  /** Capability S4: cast every declared column to its declared type;
    * declared-but-absent columns materialize as typed nulls; undeclared
    * junk columns (e.g. `UNNAMED_FIELD` `ML_stock.py:80`, `wind_deg`
    * `merge_openweather.py:78`) are dropped by omission. */
  def coerce(df: DataFrame, schema: StructType): DataFrame = {
    val present = df.columns.toSet
    // try_cast: under Spark 4's default ANSI mode a malformed cell would
    // abort the job; the reference's coercion degrades it to null.
    df.select(schema.fields.map { f =>
      if (present(f.name)) col(f.name).try_cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toSeq: _*)
  }

  /** Fast path (default): one multi-path scan. Requires fragments that
    * parquet's schema merge can reconcile; the declared schema is pushed
    * into the scan so column pruning happens at the reader. */
  def read(spark: SparkSession, schema: StructType, paths: Seq[String]): DataFrame = {
    // glob() legitimately returns Seq.empty on no match; without this
    // the error is a misleading "unable to infer schema", not the real
    // empty-input condition (readTolerant already guards)
    require(paths.nonEmpty, "read: no input paths")
    coerce(spark.read.parquet(paths: _*), schema)
  }

  /** Drift-tolerant path — capability S3: per-file read + coercion +
    * `unionByName(allowMissingColumns = true)` fold
    * (`batch_stock.py:18-36`, `ML_tomtom.py:31-49`). Use only when
    * fragments disagree structurally. */
  def readTolerant(spark: SparkSession, schema: StructType, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "readTolerant: no input paths")
    val frames = paths.map(p => coerce(spark.read.parquet(p), schema))
    frames.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** CSV with the same lenient-parse-then-coerce contract as the stream
    * sources (§2.1 T2): every field reads as string (so a malformed cell
    * can't abort the scan under ANSI mode), then [[coerce]] casts to the
    * declared schema with per-cell null degradation. One multi-path
    * scan; header column names drive the by-name coercion. */
  def readCsv(spark: SparkSession, schema: StructType, paths: Seq[String],
      header: Boolean = true, delimiter: String = ","): DataFrame = {
    val raw = spark.read
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(paths: _*)
    // headerless files get positional names from the declared schema;
    // trailing undeclared columns (schema drift) are dropped BEFORE the
    // rename — toDF would throw on the arity mismatch otherwise, while
    // the documented contract drops junk columns by omission
    val named =
      if (header) raw
      else {
        val keep = raw.columns.take(schema.fields.length).toIndexedSeq
        raw.select(keep.map(col): _*)
          .toDF(schema.fieldNames.take(keep.length).toIndexedSeq: _*)
      }
    coerce(named, schema)
  }

  /** JSON-lines with the same contract: schema-as-strings scan (field
    * presence only), then declared-type coercion. Malformed lines
    * surface as all-null rows rather than failures, matching the
    * streaming payload parser's degradation. */
  def readJson(spark: SparkSession, schema: StructType, paths: Seq[String]): DataFrame = {
    // atomic fields relax to string (lenient scalar coercion); nested
    // struct/array/map fields keep their real type — a string field
    // cannot be try_cast to a complex type, so the all-string form
    // failed ANALYSIS for any nested schema (same fix as
    // streaming.StreamParse.lenientSchema; PERMISSIVE json already
    // nulls malformed nested values on its own)
    import org.apache.spark.sql.types.{ArrayType, MapType, StringType, StructField}
    val stringly = StructType(schema.fields.map {
      case f @ StructField(_, _: StructType | _: ArrayType | _: MapType, _, _) =>
        f.copy(nullable = true)
      case f => StructField(f.name, StringType)
    })
    coerce(spark.read.schema(stringly).json(paths: _*), schema)
  }

  /** ORC with the declared-schema coercion contract — same columnar
    * scan/pushdown properties as parquet (ORC is the other common
    * warehouse format the engine should ingest without conversion). */
  def readOrc(spark: SparkSession, schema: StructType, paths: Seq[String]): DataFrame =
    coerce(spark.read.orc(paths: _*), schema)
}
