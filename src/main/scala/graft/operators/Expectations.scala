package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * DATASET-level expectations — the suite-of-assertions layer above
 * [[Validate]]'s row-level checks (Great Expectations / dbt-test
 * shape): row-count bounds, key uniqueness, null budgets, value
 * ranges, referential integrity — each evaluated over the WHOLE frame
 * and reported as one row `(check, ok, observed)`, so a pipeline can
 * gate on `ok` or land the report beside the data as an audit
 * artifact. The reference validates fields row-by-row
 * (src/validator.py); what it cannot say is "this delivery lost 40%
 * of its rows" or "this key stopped being unique" — dataset
 * expectations are that missing layer.
 *
 * Exactness discipline: every check is INTEGER arithmetic —
 * `observed` is a row count (violations, nulls, duplicates), and the
 * null-budget threshold is BASIS POINTS compared as
 * `nulls * 10000 <= maxBp * rows` (no float division anywhere) — so
 * the whole report carries a bit-exact cross-engine oracle.
 *
 * Scale shape: all aggregate checks fold into ONE pass over the frame
 * (a single `agg` row, fanned out to report rows); each
 * [[Check.SubsetOf]] adds one anti-join against the (distinct,
 * usually broadcastable) reference keys — never a second full
 * self-scan per check.
 */
object Expectations {

  sealed trait Check { def render: String }

  /** `lo <= count(*) <= hi`; observed = the row count. */
  final case class RowCountBetween(lo: Long, hi: Long) extends Check {
    def render = s"row_count_between($lo,$hi)"
  }

  /** The column tuple is unique; observed = rows in excess of their
    * first occurrence (`count - distinct count`). */
  final case class Unique(cols: Seq[String]) extends Check {
    def render = s"unique(${cols.mkString(",")})"
  }

  /** Null budget: at most `maxBp` basis points (1/10000) of rows may
    * be null; observed = the null count. */
  final case class NullFraction(col: String, maxBp: Int) extends Check {
    def render = s"null_fraction($col,${maxBp}bp)"
  }

  /** Every non-null value in `[lo, hi]`; observed = out-of-range rows. */
  final case class InRange(col: String, lo: Long, hi: Long) extends Check {
    def render = s"in_range($col,$lo,$hi)"
  }

  /** dbt's `accepted_values`: every non-null value of `col` (compared
    * as its string rendering) is one of `values`; observed = rows
    * holding anything else. NULLs pass — budget them with
    * [[NullFraction]]. */
  final case class AcceptedValues(col: String, values: Seq[String]) extends Check {
    require(values.nonEmpty, "accepted_values: empty value list")
    def render = s"accepted_values($col,${values.mkString("|")})"
  }

  /** Referential integrity: every non-null value of `col` appears in
    * `refCol` of the reference frame; observed = orphan rows. */
  final case class SubsetOf(col: String, ref: DataFrame, refCol: String,
                            refName: String) extends Check {
    def render = s"subset_of($col,$refName.$refCol)"
  }

  /** Per-group completeness ("did every partition land whole"): each
    * PRESENT group of `groupCol` must hold at least `minRows` rows;
    * observed = violating groups. A group absent entirely is invisible
    * here — pair with [[SubsetOf]] against the expected group list to
    * catch missing groups. */
  final case class MinPerGroup(groupCol: String, minRows: Long) extends Check {
    def render = s"min_per_group($groupCol,$minRows)"
  }

  /**
   * Evaluate `checks` over `df`: one report row per check, in
   * declared order — `(check, ok, observed)` with `observed` the
   * check's violation/measure count (see each [[Check]]).
   */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "expectations: empty check list")
    require(checks.map(_.render).distinct.size == checks.size,
      "expectations: duplicate checks")
    // one measure column per aggregate check, all from ONE scan
    val aggMeasures = checks.zipWithIndex.flatMap {
      case (RowCountBetween(_, _), i) =>
        Some(count(lit(1)).as(s"m$i"))
      case (Unique(cols), i) =>
        Some((count(lit(1)) - countDistinct(cols.head, cols.tail: _*)
          - sum(when(cols.map(c => col(c).isNull).reduce(_ || _), 1L)
              .otherwise(0L))).as(s"m$i"))
      case (NullFraction(c, _), i) =>
        Some(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"m$i"))
      case (InRange(c, lo, hi), i) =>
        Some(sum(when(col(c).isNotNull && (col(c) < lit(lo) || col(c) > lit(hi)),
          1L).otherwise(0L)).as(s"m$i"))
      case (AcceptedValues(c, vs), i) =>
        Some(sum(when(col(c).isNotNull &&
          !col(c).cast("string").isin(vs: _*), 1L).otherwise(0L)).as(s"m$i"))
      case (_: SubsetOf, _) => None
      case (_: MinPerGroup, _) => None
    }
    val rowsCol = count(lit(1)).as("__rows")
    val aggRow = df.agg(rowsCol, aggMeasures: _*)

    val spark = df.sparkSession
    val frames = checks.zipWithIndex.map {
      case (chk @ RowCountBetween(lo, hi), i) =>
        aggRow.select(lit(chk.render).as("check"),
          (col(s"m$i") >= lo && col(s"m$i") <= hi).as("ok"),
          col(s"m$i").cast("long").as("observed"))
      case (chk @ Unique(_), i) =>
        aggRow.select(lit(chk.render).as("check"),
          (col(s"m$i") === 0L).as("ok"), col(s"m$i").cast("long").as("observed"))
      case (chk @ NullFraction(_, maxBp), i) =>
        aggRow.select(lit(chk.render).as("check"),
          (col(s"m$i") * 10000L <= lit(maxBp.toLong) * col("__rows")).as("ok"),
          col(s"m$i").cast("long").as("observed"))
      case (chk @ InRange(_, _, _), i) =>
        aggRow.select(lit(chk.render).as("check"),
          (col(s"m$i") === 0L).as("ok"), col(s"m$i").cast("long").as("observed"))
      case (chk @ AcceptedValues(_, _), i) =>
        aggRow.select(lit(chk.render).as("check"),
          (col(s"m$i") === 0L).as("ok"), col(s"m$i").cast("long").as("observed"))
      case (chk @ SubsetOf(c, ref, refCol, _), _) =>
        val orphans = df.filter(col(c).isNotNull)
          .join(ref.select(col(refCol).as(c)).distinct(), Seq(c), "left_anti")
          .agg(count(lit(1)).as("orphans"))
        orphans.select(lit(chk.render).as("check"),
          (col("orphans") === 0L).as("ok"),
          col("orphans").cast("long").as("observed"))
      case (chk @ MinPerGroup(g, minRows), _) =>
        df.filter(col(g).isNotNull).groupBy(col(g))
          .agg(count(lit(1)).as("__n")).filter(col("__n") < minRows)
          .agg(count(lit(1)).as("__bad"))
          .select(lit(chk.render).as("check"),
            (col("__bad") === 0L).as("ok"),
            col("__bad").cast("long").as("observed"))
    }
    frames.reduce(_ unionByName _)
  }

  /** True iff every check passes — the gate form of [[report]]. */
  def passes(df: DataFrame, checks: Seq[Check]): Boolean =
    report(df, checks).filter(!col("ok")).limit(1).count() == 0

  /** Compile a metadata check string (see [[graft.meta.ExpectSpec]]):
    * `row_count:lo-hi` | `unique:a+b` | `null_bp:col:maxBp` |
    * `range:col:lo-hi` | `min_per_group:col:minRows` |
    * `accepted_values:col:a|b|c` |
    * `subset:col:frame.refCol` — `resolve` maps a frame name to the
    * referential target. */
  def parse(spec: String, resolve: String => DataFrame): Check = {
    def range(s: String): (Long, Long) = s.split("-") match {
      case Array(lo, hi) => (lo.toLong, hi.toLong)
      case _ => throw new IllegalArgumentException(
        s"expectations: bad range '$s' in '$spec' (want lo-hi, non-negative)")
    }
    spec.split(":").toSeq match {
      case Seq("row_count", r) =>
        val (lo, hi) = range(r); RowCountBetween(lo, hi)
      case Seq("unique", cols) => Unique(cols.split("\\+").toSeq)
      case Seq("null_bp", c, bp) => NullFraction(c, bp.toInt)
      case Seq("range", c, r) =>
        val (lo, hi) = range(r); InRange(c, lo, hi)
      case Seq("min_per_group", g, minRows) => MinPerGroup(g, minRows.toLong)
      case Seq("accepted_values", c, vs) =>
        AcceptedValues(c, vs.split("\\|").toSeq)
      case Seq("subset", c, ref) => ref.split("\\.") match {
        case Array(frame, refCol) => SubsetOf(c, resolve(frame), refCol, frame)
        case _ => throw new IllegalArgumentException(
          s"expectations: bad subset target '$ref' (want frame.refCol)")
      }
      case _ => throw new IllegalArgumentException(
        s"expectations: cannot parse check '$spec'")
    }
  }
}
