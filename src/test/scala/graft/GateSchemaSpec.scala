package graft

import org.apache.spark.sql.types._

/** Automated form of the decimal-output sweep (the round-7 landmine):
  * a DECIMAL column reaching a gate output hash-mismatches against
  * the DuckDB oracle (the driver compares value hashes, and decimal
  * renderings differ engine-to-engine), which surfaced as the only
  * driver reds of round 7 and was re-checked BY HAND every round
  * since. This spec builds every registered gate's plan at sf0.001
  * (schema resolution only — no job runs for the check itself) and
  * fails the build if any output column, at any nesting depth, is a
  * DecimalType. Verify additionally records the per-gate schema
  * manifest (`output_schemas.json`) on every dump, so a driver-side
  * regression is diagnosable from the round records alone.
  */
class GateSchemaSpec extends SparkSpec {

  test("no gate output column is DECIMAL, at any nesting depth") {
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sf/documents.parquet").exists(),
      "driver testdata not present on this box")
    def hasDecimal(dt: DataType): Boolean = dt match {
      case _: DecimalType => true
      case s: StructType => s.fields.exists(f => hasDecimal(f.dataType))
      case a: ArrayType => hasDecimal(a.elementType)
      case m: MapType => hasDecimal(m.keyType) || hasDecimal(m.valueType)
      case _ => false
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        val df = fn(spark, sf)
        df.schema.fields
          .filter(f => hasDecimal(f.dataType))
          .map(f => s"$name.${f.name}: ${f.dataType.catalogString}")
      }
    assert(offenders.isEmpty,
      s"DECIMAL reached a gate output (cast to DOUBLE/BIGINT at the " +
        s"gate):\n${offenders.mkString("\n")}")
  }
}
