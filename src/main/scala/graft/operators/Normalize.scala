package graft.operators

import graft.meta.FieldMapping
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/**
 * Field normalization: coalesce a canonical column from prioritized
 * source paths, and auto-flatten nested struct leaves
 * (reference: src/transformations.py:137-213 `normalize_fields`,
 * 69-90 `_apply_naming_convention`, 93-128 `_discover_nested_fields`).
 *
 * Spark-first: the whole normalization compiles to ONE `select`
 * projection (the reference chains `withColumn` per field, which
 * piles up Project nodes and analysis cost on wide schemas). A single
 * projection keeps the plan flat, fully codegen'd, and lets Catalyst
 * prune unread source columns down to the scan.
 */
object Normalize {

  /** Naming conventions for flattened nested paths. */
  def applyNaming(path: String, convention: String): String = convention match {
    case "keep_dot"   => path
    case "snake_case" => path.replace(".", "_")
    case "camelCase" =>
      val parts = path.split('.')
      parts.head + parts.tail.map(p => if (p.isEmpty) "" else s"${p.head.toUpper}${p.tail}").mkString
    case other =>
      throw new IllegalArgumentException(
        s"Unsupported naming convention: '$other'. Supported: snake_case, keep_dot, camelCase")
  }

  /** All nested (struct-interior) leaf paths, e.g. "driver.age". */
  def nestedLeafPaths(schema: StructType): Seq[String] = {
    def walk(st: StructType, prefix: String): Seq[String] =
      st.fields.toSeq.flatMap { f =>
        val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        f.dataType match {
          case s: StructType => walk(s, path)
          case _             => if (prefix.isEmpty) Nil else Seq(path)
        }
      }
    walk(schema, "")
  }

  /** Does a (possibly dotted) path resolve in this schema? */
  def pathExists(schema: StructType, path: String): Boolean = {
    def step(st: StructType, parts: List[String]): Boolean = parts match {
      case Nil => false
      case last :: Nil => st.fieldNames.contains(last)
      case head :: rest =>
        st.fields.find(_.name == head) match {
          case Some(StructField(_, s: StructType, _, _)) => step(s, rest)
          case _ => false
        }
    }
    step(schema, path.split('.').toList)
  }

  /**
   * Resolved plan for a normalization: target name -> source paths
   * that exist, in priority order. Explicit mappings are enhanced
   * with any nested path whose flattened name matches; nested leaves
   * without an explicit mapping get auto-generated ones.
   */
  def resolveMappings(schema: StructType, fields: Seq[FieldMapping],
                      naming: String): Seq[FieldMapping] = {
    val explicitNames = fields.map(_.name).toSet
    val nested = nestedLeafPaths(schema)
    val byFlattened: Map[String, Seq[String]] =
      nested.groupBy(applyNaming(_, naming))

    val enhanced = fields.map { fm =>
      val extra = byFlattened.getOrElse(fm.name, Nil).filterNot(fm.sources.contains)
      fm.copy(sources = fm.sources ++ extra)
    }

    val auto = nested.flatMap { path =>
      val flattened = applyNaming(path, naming)
      if (explicitNames.contains(flattened)) None
      else {
        val flatVariant = path.replace(".", "_")
        val sources = if (flatVariant != path) Seq(path, flatVariant) else Seq(path)
        Some(FieldMapping(flattened, sources))
      }
    }.distinctBy(_.name)

    (enhanced ++ auto).map { fm =>
      fm.copy(sources = fm.sources.filter(pathExists(schema, _)))
    }.filter(_.sources.nonEmpty)
  }

  /**
   * Normalize: original columns plus one canonical column per resolved
   * mapping (added or overwritten), all in a single projection.
   */
  def normalizeFields(df: DataFrame, fields: Seq[FieldMapping],
                      naming: String = "snake_case"): DataFrame = {
    val mappings = resolveMappings(df.schema, fields, naming)
    if (mappings.isEmpty) return df
    val mapped: Map[String, Column] = mappings.map { fm =>
      val cols = fm.sources.map(col)
      fm.name -> (if (cols.size > 1) coalesce(cols: _*) else cols.head).as(fm.name)
    }.toMap
    val kept = df.columns.toSeq.map(c => mapped.getOrElse(c, col(c)))
    val added = mappings.map(_.name).filterNot(df.columns.contains).map(mapped)
    df.select(kept ++ added: _*)
  }

  /** Pure flatten: every nested leaf as a top-level column. */
  def flattenStructs(df: DataFrame, naming: String = "snake_case"): DataFrame = {
    val leaves = nestedLeafPaths(df.schema)
    val flat = df.schema.fields.toSeq.collect {
      case f if !f.dataType.isInstanceOf[StructType] => col(f.name)
    }
    df.select(flat ++ leaves.map(p => col(p).as(applyNaming(p, naming))): _*)
  }
}
