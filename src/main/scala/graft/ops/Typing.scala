package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.pipeline._
import graft.schema.SchemaDoc
import graft.schema.SchemaDoc.ColumnDoc

/** Typing transform: coerce an untyped (all-string) view to a typed schema
  * driven by an external schema document — the reference's core IT
  * scenario is exactly this shape (all-string CSV written into an
  * int-typed table, with the connector coercing on write:
  * CassandraLoadSuite.scala:63 + create_table.cql:1; Arc models it as a
  * TypingTransform, SURVEY §1.3).
  *
  * Casts are per-row codegen'd expressions — no shuffle, no UDFs; at any
  * scale this is a free pass over the data. Timestamp/date columns use the
  * doc's `formatters` head when present, else Spark's ANSI-ish cast.
  */
object Typing {

  def castColumn(c: ColumnDoc): Column = {
    // Arc input-cleaning semantics before the cast (ref: per-column `trim`
    // and `nullableValues` in the metadata docs, TestUtils.scala:183-188):
    // optional whitespace trim, then sentinel strings ("", "null", ...)
    // mapped to real nulls.
    val raw = col(c.name)
    val trimmed = if (c.trim) trim(raw) else raw
    val src =
      if (c.nullableValues.nonEmpty)
        when(trimmed.isInCollection(c.nullableValues), lit(null)).otherwise(trimmed)
      else trimmed
    val dt = SchemaDoc.dataTypeOf(c)
    val castc = (dt, c.formatters.headOption) match {
      case (TimestampType, Some(fmt)) => to_timestamp(src, fmt)
      case (DateType, Some(fmt))      => to_date(src, fmt)
      case _                          => src.cast(dt)
    }
    castc.as(c.name, toMeta(c))
  }

  private def toMeta(c: ColumnDoc): Metadata =
    SchemaDoc.toStructType(Seq(c)).fields.head.metadata

  def apply(df: DataFrame, cols: Seq[ColumnDoc]): DataFrame =
    df.select(cols.map(castColumn): _*)
}

/** Pipeline stage wrapper: `{inputView, outputView, schema|schemaURI}`. */
final case class TypingTransformStage(
    name: String,
    inputView: String,
    outputView: String,
    schemaJson: String)
    extends Stage {

  override def execute()(implicit ctx: PipelineContext): Option[DataFrame] = {
    val cols = SchemaDoc.parse(schemaJson)
    detail += "inputView" -> inputView
    detail += "outputView" -> outputView
    detail += "columns" -> cols.map(_.name).mkString(",")
    val df = Typing(Views.resolve(inputView), cols)
    Views.register(df, outputView)
    Option(df)
  }
}
