package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the "automated validation (Great
  * Expectations)" roadmap item the reference names but never built
  * (reference README.md:162).
  *
  * All single-table rules evaluate in ONE aggregation pass over the table
  * (each rule is a conditional-count aggregate), so a 100-rule suite costs
  * one scan; referential-integrity rules add one anti-join each. Output is a
  * (rule, violations, n_rows, pass) summary — deterministic, oracle-able.
  */
object QualityChecks {

  sealed trait Rule {
    def name: String
  }

  /** column must be non-null */
  final case class NotNull(column: String) extends Rule {
    val name = s"not_null:$column"
  }

  /** column values must fall in [lo, hi] (nulls don't violate — compose with
    * NotNull for that)
    */
  final case class InRange(column: String, lo: Double, hi: Double) extends Rule {
    val name = s"in_range:$column"
  }

  /** column must fully match the regex (nulls don't violate) */
  final case class Matches(column: String, regex: String) extends Rule {
    val name = s"matches:$column"
  }

  /** column values must come from the allowed set (nulls don't violate) */
  final case class InSet(column: String, allowed: Seq[String]) extends Rule {
    val name = s"in_set:$column"
  }

  /** key columns must be unique; violations = n_rows − n_distinct_keys */
  final case class Unique(columns: Seq[String]) extends Rule {
    val name = s"unique:${columns.mkString("+")}"
  }

  /** table must have at least `min` rows (empty-extract tripwire);
    * violations = max(0, min − n_rows)
    */
  final case class MinRows(min: Long) extends Rule {
    val name = s"min_rows:$min"
  }

  /** null fraction of the column must stay ≤ maxRatio; violations = the
    * null count when the ratio is exceeded, else 0
    */
  final case class NullRatio(column: String, maxRatio: Double) extends Rule {
    val name = s"null_ratio:$column"
  }

  private def violationCount(r: Rule): Column = r match {
    case NotNull(c) => count(when(col(c).isNull, 1))
    case InRange(c, lo, hi) =>
      count(when(col(c) < lo || col(c) > hi, 1))
    case Matches(c, re) =>
      count(when(col(c).isNotNull && !col(c).rlike(re), 1))
    case InSet(c, allowed) =>
      count(when(col(c).isNotNull && !col(c).isInCollection(allowed), 1))
    case Unique(cols) =>
      count(lit(1)) - count_distinct(struct(cols.map(col): _*))
    case MinRows(min) =>
      greatest(lit(min) - count(lit(1)), lit(0L))
    case NullRatio(c, maxRatio) =>
      when(count(when(col(c).isNull, 1)).cast("double") >
        count(lit(1)) * maxRatio, count(when(col(c).isNull, 1)))
        .otherwise(lit(0L))
  }

  /** One aggregation pass → one summary row per rule. */
  def run(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    // Duplicate names (e.g. two InRange on one column) would collide in the
    // melt map (runtime failure under mapKeyDedupPolicy=EXCEPTION).
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate rule names: ${rules.map(_.name).diff(rules.map(_.name).distinct).distinct.mkString(", ")}")
    val aggs = rules.map(r => violationCount(r).as(r.name)) :+
      count(lit(1)).as("_n_rows")
    val row = df.agg(aggs.head, aggs.tail: _*)
    // melt the single wide row into (rule, violations, n_rows, pass)
    val pairs = rules.flatMap(r =>
      Seq(lit(r.name), col(s"`${r.name}`").cast("long")))
    row.select(col("_n_rows"),
        map(pairs: _*).as("_m"))
      .select(col("_n_rows"), explode(col("_m")).as(Seq("rule", "violations")))
      .select(col("rule"), col("violations"),
        col("_n_rows").as("n_rows"),
        (col("violations") === 0).as("pass"))
  }

  /** Referential integrity: fk values (non-null) must exist in pk. Returns
    * the same summary shape.
    *
    * ONE scan of the child: a left-outer join against the distinct parent
    * keys marks each child row as matched/orphan, and n_rows + the orphan
    * count come out of a single aggregate over the joined rows. (An eager
    * `child.count()` + anti-join reads the child twice — at 100 TB that
    * doubles the cost of every referential rule. The parent distinct is
    * required for correctness, not just hygiene: duplicate parent keys
    * would fan out child rows and inflate n_rows.) Null fks never violate
    * (`=` semantics) but still count in n_rows.
    */
  def referential(child: DataFrame, fkCol: String,
      parent: DataFrame, pkCol: String): DataFrame = {
    val parentKeys = parent.select(col(pkCol).as(fkCol))
      .filter(col(fkCol).isNotNull).distinct()
      .withColumn("_pk_hit", lit(1))
    child.select(col(fkCol))
      .join(parentKeys, Seq(fkCol), "left_outer")
      .agg(
        count(lit(1)).as("n_rows"),
        count(when(col(fkCol).isNotNull && col("_pk_hit").isNull, 1))
          .as("violations"))
      .select(lit(s"ref:$fkCol->$pkCol").as("rule"),
        col("violations"), col("n_rows"),
        (col("violations") === 0).as("pass"))
  }
}
