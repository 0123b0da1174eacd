package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Lossless CSV round trip for the delimited-text load path (S1 dual).
  *
  * CSV has no native null, so a null must ride an in-band token
  * (`nullValue`) — and any DATA value equal to that token would be read
  * back as null, silently corrupting the row. Quoting does not help:
  * Spark's uniVocity parser applies nullValue matching to quoted fields
  * too. The only lossless encoding is an escape that removes the
  * collision by construction: on write, every string value that starts
  * with a backslash gets ONE more backslash prepended; on read, one
  * leading backslash is stripped. Written non-null values therefore
  * never equal the token `\N` (a data value `\N` becomes `\\N` on the
  * wire), the map is a bijection on the escaped class, and values not
  * starting with a backslash — the overwhelming case — travel verbatim
  * through a single codegen'd `when` per side.
  *
  * The other two non-default options losslessness needs (see the
  * s1_load_csv entry): multiLine=true on the read, so an embedded
  * newline inside a quoted field does not split the record, and the
  * SAME nullValue token on both sides, so null and empty string survive
  * as themselves.
  */
object CsvLossless {

  /** In-band null token (chosen over the empty default so empty string
    * and null stay distinguishable).
    */
  val NullToken = "\\N"

  private[sources] def escape(c: Column): Column =
    when(c.startsWith("\\"), concat(lit("\\"), c)).otherwise(c)

  private[sources] def unescape(c: Column): Column =
    when(c.startsWith("\\"), c.substr(lit(2), length(c))).otherwise(c)

  private def mapStrings(df: DataFrame, f: Column => Column): DataFrame =
    df.select(df.schema.fields.map { fld =>
      if (fld.dataType == StringType) f(col(fld.name)).as(fld.name)
      else col(fld.name)
    }.toIndexedSeq: _*)

  /** Write `df` as headers+CSV at `path` (overwrite), escaped so the
    * read side reproduces it exactly.
    */
  def write(df: DataFrame, path: String): Unit =
    mapStrings(df, escape)
      .write.mode("overwrite")
      .option("header", "true").option("nullValue", NullToken)
      .csv(path)

  /** Read a [[write]]-produced directory back with the given schema. */
  def read(spark: SparkSession, schema: StructType, path: String): DataFrame =
    mapStrings(
      spark.read.schema(schema)
        .option("header", "true").option("multiLine", "true")
        .option("nullValue", NullToken)
        .csv(path),
      unescape)
}
