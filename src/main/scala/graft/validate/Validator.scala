package graft.validate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema.SalesSchema

/** Outcome of batch validation: errors as data (never thrown) plus the
  * TYPED frame. The reference's validator mutates date columns in place
  * as a side effect of checking them (/root/reference/lambda.py:103-109)
  * and downstream code depends on it (lambda.py:168-169); here that
  * contract is explicit — `typed` is the frame with dates parsed and
  * measures cast, valid iff `errors.isEmpty` (SURVEY.md §7.4 risk 2).
  */
final case class ValidationReport(typed: DataFrame, errors: Seq[String]) {
  def isValid: Boolean = errors.isEmpty
}

/** Batch-grain validation V1–V4 (/root/reference/lambda.py:81-121):
  * one failed predicate quarantines the whole file. All four checks run
  * in ONE Spark job (a single aggregate over error-indicator columns) —
  * the reference makes four passes; at 100 TB one pass matters.
  */
object Validator {

  import SalesSchema._

  /** Validate a raw (all-string or inferred) frame against the sales
    * contract. Row-grain variant below reuses the same indicators. */
  def validate(raw: DataFrame): ValidationReport = {
    // V1: required-column presence — pure driver-side schema check.
    val present = raw.columns.toSet
    val missing = requiredColumns.filterNot(present)
    val colErrors = missing.map(c => s"Missing required column: $c")

    if (missing.nonEmpty)
      return ValidationReport(raw, colErrors)

    val isStringIn: String => Boolean =
      c => raw.schema(c).dataType == StringType

    // ANSI-safe conversion: null on malformed input instead of throwing
    // (Spark 4 defaults to ANSI casts). Strict MM/dd/yyyy parse matches
    // the reference's pandas `format=` strictness.
    def converted(c: String): org.apache.spark.sql.Column =
      if (dateColumns.contains(c)) {
        if (isStringIn(c)) try_to_timestamp(col(c), lit(inputDateFormat)).cast(DateType)
        else col(c).cast(DateType)
      } else {
        val target = structType(structType.fieldIndex(c)).dataType
        col(c).try_cast(target)
      }

    // Build the typed frame: cast measures, strict-parse dates. A bad
    // cell becomes null; null-from-non-null is a violation, counted below.
    val typed = (numericColumns ++ dateColumns).foldLeft(raw) { (df, c) =>
      df.withColumn(c, converted(c))
    }

    // V2/V3 indicators: value present in raw but null after cast/parse.
    // Expressed over the RAW frame so all checks + V4 ride ONE pass.
    val badCellCounts =
      (numericColumns ++ dateColumns).map { c =>
        sum(when(converted(c).isNull && col(c).isNotNull, 1L).otherwise(0L)).as(s"bad_$c")
      }
    // V4 rides the same aggregate: distinct-key count vs row count.
    val aggCols = Seq(countDistinct(col(keyColumn)).as("n_keys")) ++ badCellCounts
    val stats = raw.agg(count(lit(1)).as("n"), aggCols: _*).collect()(0)

    val n = stats.getAs[Long]("n")
    val nKeys = stats.getAs[Long]("n_keys")

    val typeErrors = numericColumns.flatMap { c =>
      val bad = stats.getAs[Long](s"bad_$c")
      if (bad > 0) Some(s"Column $c must be numeric ($bad bad values)") else None
    }
    val dateErrors = dateColumns.flatMap { c =>
      val bad = stats.getAs[Long](s"bad_$c")
      if (bad > 0) Some(s"Column $c has invalid date format, expected $inputDateFormat ($bad bad values)")
      else None
    }
    val dupErrors =
      if (nKeys != n) Seq(s"Duplicate $keyColumn values found (${n - nKeys} duplicates)")
      else Seq.empty

    ValidationReport(typed, typeErrors ++ dateErrors ++ dupErrors)
  }

  /** Row-grain extension (not in the reference): split a raw frame into
    * (good, bad) rows instead of quarantining the whole batch. Bad =
    * any measure/date cell that fails its cast, or a duplicated key. */
  def validateRows(raw: DataFrame): (DataFrame, DataFrame) = {
    val checked = numericColumns ++ dateColumns
    // carry a raw copy of each checked column through the cast so the
    // ok-predicate stays within one frame (single resolved lineage)
    val withCopies = checked.foldLeft(raw)((df, c) => df.withColumn(s"_raw_$c", col(c)))
    val report = validate(withCopies)
    val typed = report.typed
    val cellOk = checked
      .map(c => typed(c).isNotNull || col(s"_raw_$c").isNull)
      .reduce(_ && _)
    val keyCounts = typed.groupBy(col(keyColumn)).agg(count(lit(1)).as("_kc"))
    val joined = typed.join(keyCounts, Seq(keyColumn))
    val good = joined.filter(cellOk && col("_kc") === 1)
      .drop("_kc").drop(checked.map(c => s"_raw_$c"): _*)
    val bad = joined.filter(!(cellOk && col("_kc") === 1))
      .drop("_kc").drop(checked.map(c => s"_raw_$c"): _*)
    (good, bad)
  }
}
