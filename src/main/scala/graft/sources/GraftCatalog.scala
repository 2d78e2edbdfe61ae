package graft.sources

import graft.operators.Snapshot

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform

import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.LogStore

import java.util.{Collections, Map => JMap, Set => JSet}
import scala.jdk.CollectionConverters._

/**
 * A Spark `TableCatalog` over a directory tree of graft snapshot
 * tables — the NAME surface above the path-addressed connector:
 *
 * {{{
 *   spark.sql.catalog.graft       = graft.sources.GraftCatalog
 *   spark.sql.catalog.graft.root  = /data/graft        # the tree root
 *
 *   CREATE NAMESPACE graft.corpus
 *   CREATE TABLE graft.corpus.docs
 *     USING graft TBLPROPERTIES ('key'='doc_id','partitionCol'='source')
 *     AS SELECT * FROM staged                -- ATOMIC CTAS: v1 holds the data
 *   SELECT count(*) FROM graft.corpus.docs   -- manifest fold, zero IO
 *   INSERT INTO graft.corpus.docs ...        -- the transactional merge
 *   DROP TABLE graft.corpus.docs             -- refused while tags pin versions
 * }}}
 *
 * Layout: namespace = directory, table = directory containing a graft
 * `_log/` commit log; the catalog holds NO state of its own — the
 * table format's manifests stay the single source of truth, so the
 * same tree is addressable by path (`format("graft").load`) and by
 * name interchangeably, and a catalog rebuild is `ls`.
 *
 * CTAS is atomic via `StagingTableCatalog`: the staged write buffers
 * the (lazy) source frame and `commitStagedChanges` runs ONE
 * [[Snapshot.create]] — the table appears at v1 WITH its data under a
 * single commit lock claim; an aborted CTAS leaves nothing behind.
 * DROP TABLE refuses while tags pin versions (named refs are promises
 * to consumers — `DROP TABLE … PURGE` overrides), and refuses
 * non-graft directories outright.
 */
class GraftCatalog extends TableCatalog with StagingTableCatalog
  with SupportsNamespaces with ProcedureCatalog {

  private var catName: String = _
  private var root: String = _
  // the whole tree rides ONE store, resolved from the root's scheme —
  // a local directory keeps java.nio, `hdfs://…`/`file://…` roots go
  // through the Hadoop impl (and nested table paths inherit the
  // scheme, so Snapshot routes consistently)
  private var store: LogStore = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    val r = Option(options.get("root")).getOrElse(throw new IllegalArgumentException(
      s"graft catalog '$name': set spark.sql.catalog.$name.root=<directory>"))
    root = r.stripSuffix("/")
    store = LogStore.forPath(root)
    store.mkdirs(root)
  }

  override def name(): String = catName

  private def dirOf(parts: Seq[String]): String = {
    parts.foreach(p => require(!p.contains("/") && !p.contains("..") && p.nonEmpty,
      s"graft catalog: illegal identifier part '$p'"))
    (root +: parts).mkString("/")
  }
  private def tableDir(ident: Identifier): String =
    dirOf(ident.namespace.toSeq :+ ident.name)
  private def isTable(p: String): Boolean =
    store.isDirectory(s"$p/_log") && Snapshot.currentVersion(p) > 0

  // ------------------------------------------------------------ tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val ns = dirOf(namespace.toSeq)
    if (!store.isDirectory(ns)) throw new NoSuchNamespaceException(namespace)
    store.list(ns)
      .collect { case (n, true) if isTable(s"$ns/$n") =>
        Identifier.of(namespace, n) }
      .toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) {
      // Iceberg-style METADATA TABLES: `graft.ns.t.history` /
      // `.files` / `.tags` — the trailing name selects the view over
      // the parent table's metadata, so catalog users never need the
      // path form of the TVFs. All driver-built manifest folds (zero
      // data files), rebuilt per scan so a live session sees commits.
      val parent = dirOf(ident.namespace.toSeq)
      if (isTable(parent)) {
        val label = s"$catName.${ident.namespace.mkString(".")}.${ident.name}"
        ident.name match {
          case "history" => return new GraftFrameTable(label,
            () => graft.functions.GraftTableFunctions.historyFrame(
              SparkSession.active, parent))
          case "files" => return new GraftFrameTable(label,
            () => GraftCatalog.filesFrame(SparkSession.active, parent))
          case "partitions" => return new GraftFrameTable(label,
            () => GraftCatalog.partitionsFrame(SparkSession.active, parent))
          case "tags" => return new GraftFrameTable(label,
            () => GraftCatalog.tagsFrame(SparkSession.active, parent))
          case _ => () // fall through to the clear error
        }
      }
      throw new NoSuchTableException(ident)
    }
    val path = dir
    GraftStatsRule.install(SparkSession.active)
    new GraftTable(path, Snapshot.currentVersion(path))
  }

  /** Standard SQL time travel on catalog tables:
    * `SELECT … FROM graft.ns.t VERSION AS OF 3` (a number) or
    * `VERSION AS OF 'training-2026-08'` (a tag). The pinned table
    * refuses writes like every pinned reference. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir))
      return metadataTableAt(ident, resolveVersion(_, _, version))
    val path = dir
    val v = resolveVersion(path, ident, version)
    GraftStatsRule.install(SparkSession.active)
    new GraftTable(path, v, pinned = true)
  }

  private def resolveVersion(path: String, ident: Identifier,
                             version: String): Int = {
    val v =
      if (version.trim.matches("\\d+")) version.trim.toInt
      else {
        val tags = Snapshot.tags(path)
        tags.getOrElse(version, throw new IllegalArgumentException(
          s"graft catalog: no tag '$version' on $ident " +
            s"(tags: ${tags.keys.toSeq.sorted.mkString(",")})"))
      }
    require(v >= 1 && v <= Snapshot.currentVersion(path),
      s"graft catalog: $ident has no version $v")
    v
  }

  /** Time travel on the VERSION-ADDRESSABLE metadata views: `SELECT …
    * FROM graft.ns.t.files VERSION AS OF 3` inventories v3's live
    * files ("what did the run read, and how big was it") — history
    * spans the whole log and tags are refs, so only files/partitions
    * resolve under a pin. */
  private def metadataTableAt(ident: Identifier,
                              resolve: (String, Identifier) => Int): Table = {
    val parent = dirOf(ident.namespace.toSeq)
    if (!isTable(parent)) throw new NoSuchTableException(ident)
    val v = resolve(parent, ident)
    val label = s"$catName.${ident.namespace.mkString(".")}.${ident.name}@v$v"
    ident.name match {
      case "files" => new GraftFrameTable(label,
        () => GraftCatalog.filesFrame(SparkSession.active, parent, v))
      case "partitions" => new GraftFrameTable(label,
        () => GraftCatalog.partitionsFrame(SparkSession.active, parent, v))
      case "history" | "tags" => throw new IllegalArgumentException(
        s"graft catalog: ${ident.name} is not version-addressable — " +
          "history spans the whole log and tags are refs, not state")
      case _ => throw new NoSuchTableException(ident)
    }
  }

  /** `TIMESTAMP AS OF <instant>`: Spark hands MICROseconds since the
    * epoch; resolution rides the manifests' committed_at instants
    * ([[Snapshot.versionAtTime]] — latest version committed ≤ t). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir))
      return metadataTableAt(ident,
        (p, _) => Snapshot.versionAtTime(p, timestamp / 1000L))
    val path = dir
    val v = Snapshot.versionAtTime(path, timestamp / 1000L)
    GraftStatsRule.install(SparkSession.active)
    new GraftTable(path, v, pinned = true)
  }

  /** One PARTITIONED BY transform → its manifest spec string:
    * identity columns stay bare; the time grains (`years`/`months`/
    * `days`/`hours`), `bucket(n, c)` and `truncate(n, c)` render as
    * [[graft.operators.Snapshot.PartField]]'s hidden-partitioning
    * forms. Anything else refuses. */
  private def transformSpec(t: Transform): String = {
    def src = t.references.head.fieldNames.mkString(".")
    def arg(what: String): Int = t.arguments.collectFirst {
      case lit: org.apache.spark.sql.connector.expressions.Literal[_] =>
        lit.value.toString.toInt
    }.getOrElse(throw new IllegalArgumentException(
      s"graft catalog: $what transform without its width argument: $t"))
    // render through PartField itself — ONE grammar, shared with the
    // manifest/repartition/sink spec parsers
    t match {
      case _ if t.name == "identity" && t.references.length == 1 =>
        Snapshot.IdentityField(src).spec
      case _ if t.name == "years" && t.references.length == 1 =>
        Snapshot.YearsField(src).spec
      case _ if t.name == "months" && t.references.length == 1 =>
        Snapshot.MonthsField(src).spec
      case _ if t.name == "days" && t.references.length == 1 =>
        Snapshot.DaysField(src).spec
      case _ if t.name == "hours" && t.references.length == 1 =>
        Snapshot.HoursField(src).spec
      case _ if t.name == "bucket" && t.references.length == 1 =>
        Snapshot.BucketField(arg("bucket"), src).spec
      case _ if t.name == "truncate" && t.references.length == 1 =>
        Snapshot.TruncateField(arg("truncate"), src).spec
      case other => throw new IllegalArgumentException(
        "graft catalog: PARTITIONED BY supports identity columns, " +
          "years/months/days/hours(col), bucket(n, col) and " +
          s"truncate(n, col) — got $other")
    }
  }

  private def createSpec(schema: StructType, partitions: Array[Transform],
                         properties: JMap[String, String])
      : (Seq[String], Seq[String]) = {
    val props = properties.asScala
    // composite keys declare as a comma-separated list:
    // TBLPROPERTIES ('key' = 'tenant_id,entity_id')
    val keys = props.getOrElse("key", throw new IllegalArgumentException(
      "graft catalog: CREATE TABLE needs TBLPROPERTIES ('key'='<column>" +
        "[,<column>…]') — every graft table is keyed"))
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(keys.nonEmpty, "graft catalog: empty key list")
    val partFromTransform = partitions.toSeq.map(transformSpec)
    val parts =
      if (partFromTransform.nonEmpty) partFromTransform
      else props.get("partitionCol")
        .map(graft.operators.Snapshot.PartField.splitSpecs)
        .getOrElse(throw new IllegalArgumentException(
          "graft catalog: CREATE TABLE needs PARTITIONED BY (col, …) or " +
            "TBLPROPERTIES ('partitionCol'='<column>[,…]')"))
    val sources = parts.map(p =>
      graft.operators.Snapshot.PartField.parse(p).source)
    (keys ++ sources).foreach(c => require(schema.fieldNames.contains(c),
      s"graft catalog: declared column '$c' not in the table schema"))
    (keys, parts)
  }

  /** The INVARIANT TBLPROPERTIES (`check.<name>`, `guard.<name>`,
    * `expects`) a CREATE may declare — honored at create exactly as
    * the ALTER lifecycle honors them later, so a SHOW TBLPROPERTIES /
    * re-CREATE round-trip never silently drops a constraint. */
  private def invariantSpec(properties: JMap[String, String])
      : (Map[String, String], Map[String, String], Seq[String]) = {
    val props = properties.asScala
    val checks = props.collect {
      case (k, v) if k.startsWith("check.") => k.stripPrefix("check.") -> v
    }.toMap
    val guards = props.collect {
      case (k, v) if k.startsWith("guard.") => k.stripPrefix("guard.") -> v
    }.toMap
    val expects = props.get("expects").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
    (checks, guards, expects)
  }

  /** A `bloom.<col>` property value: `'bits,k'`, `'bits'`, or `''`
    * (library defaults). */
  private def bloomSizing(col: String, v: String): (Int, Int) =
    v.split(",").map(_.trim).filter(_.nonEmpty) match {
      case Array() => (1 << 17, 6)
      case Array(bits) => (bits.toInt, 6)
      case Array(bits, k) => (bits.toInt, k.toInt)
      case _ => throw new IllegalArgumentException(
        s"graft catalog: bloom.$col wants 'bits[,k]' (got '$v')")
    }

  /** The LAYOUT TBLPROPERTIES — the commit-layout contract the Scala
    * create has always taken (`'layout'='range|zorder'`,
    * `'fileRanges'='8'`, `'zorderKeys'='a,b'`), so a SQL-created
    * table bounds its files-per-partition from day one (the
    * unlaid-out composite table cost 12.6× in file opens at sf1 —
    * r15's measured lesson) and SHOW CREATE TABLE round-trips the
    * layout it renders. Post-create the layout changes by REWRITE
    * only: `CALL <cat>.system.relayout(…)`, never ALTER. */
  private def layoutSpec(properties: JMap[String, String])
      : (Int, String, Seq[String]) = {
    val props = properties.asScala
    val fileRanges = props.get("fileRanges").map(_.trim.toInt).getOrElse(0)
    val mode = props.get("layout").map(_.trim).getOrElse("range")
    require(mode == "range" || mode == "zorder",
      s"graft catalog: layout must be range|zorder (got '$mode')")
    val zorderKeys = props.get("zorderKeys").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    (fileRanges, mode, zorderKeys)
  }

  /** The TRACKING TBLPROPERTIES — the per-file index surface the
    * Scala API has had since it landed, now first-class in SQL:
    * `'statsCols'='a,b'` (per-file min/max range skipping beyond the
    * key), `'bloom.<col>'='bits,k'` (point-lookup bloom; sizing is
    * table-wide, so every declaration must agree), `'hll.<col>'='p'`
    * (manifest-HLL distinct estimates). Same keys work through
    * `ALTER TABLE … SET TBLPROPERTIES` later — tracking then starts
    * on each file's next rewrite (compact once to backfill). */
  private def trackingSpec(schema: StructType,
                           properties: JMap[String, String])
      : (Seq[String], Seq[String], Int, Int, Seq[String], Int) = {
    val props = properties.asScala
    val statsCols = props.get("statsCols").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    // `bloom.<col>` = value filter; `trigram.<col>` = substring index
    // (the `3g:` bloom spec — [[Snapshot.bloomSpec]]); ONE sizing
    val blooms = props.collect {
      case (k, v) if k.startsWith("bloom.") =>
        val c = k.stripPrefix("bloom.")
        val (bits, bk) = bloomSizing(c, v)
        (c, bits, bk)
      case (k, v) if k.startsWith("trigram.") =>
        val c = k.stripPrefix("trigram.")
        val (bits, bk) = bloomSizing(c, v)
        (Snapshot.TriPrefix + c, bits, bk)
    }.toSeq.sortBy(_._1)
    require(blooms.map(b => (b._2, b._3)).distinct.size <= 1,
      "graft catalog: bloom sizing is table-wide — every bloom.<col> " +
        s"property must agree (got ${blooms.map(b => s"${b._1}=(${b._2},${b._3})")
          .mkString(", ")})")
    val hlls = props.collect {
      case (k, v) if k.startsWith("hll.") =>
        val c = k.stripPrefix("hll.")
        (c, if (v.trim.isEmpty) 12 else v.trim.toInt)
    }.toSeq.sortBy(_._1)
    require(hlls.map(_._2).distinct.size <= 1,
      "graft catalog: HLL precision is table-wide — every hll.<col> " +
        s"property must agree (got ${hlls.map(h => s"${h._1}=${h._2}")
          .mkString(", ")})")
    (statsCols ++ blooms.map(b => Snapshot.bloomSpec(b._1)._2) ++
        hlls.map(_._1)).foreach(c =>
      require(schema.fieldNames.contains(c),
        s"graft catalog: tracked column '$c' not in the table schema"))
    blooms.map(_._1).filter(_.startsWith(Snapshot.TriPrefix)).foreach { spec =>
      val c = Snapshot.bloomSpec(spec)._2
      val dt = schema.fields.find(_.name == c).get.dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.StringType],
        s"graft catalog: trigram index '$c' needs a string column " +
          s"(got ${dt.simpleString})")
    }
    // the SAME type gate the ALTER face applies (setStatsColsXform) —
    // a silently-never-tracked column must refuse at CREATE too. Key
    // columns are EXEMPT, exactly as the ALTER xform exempts them:
    // createMulti always folds keys into statsCols and properties()
    // re-emits the full list, so SHOW CREATE TABLE output for a table
    // keyed by an unsupported type (e.g. a timestamp key) must
    // re-execute rather than refuse on its own key.
    val keyCols = props.get("key").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    statsCols.filterNot(keyCols.contains).foreach { c =>
      val dt = schema.fields.find(_.name == c).get.dataType
      require(Snapshot.statKind(dt).isDefined,
        s"graft catalog: stats-tracking '$c' (${dt.simpleString}) is " +
          "unsupported — numeric and string columns only")
    }
    val (bloomBits, bloomK) = blooms.headOption
      .map(b => (b._2, b._3)).getOrElse((1 << 17, 6))
    (statsCols, blooms.map(_._1), bloomBits, bloomK,
      hlls.map(_._1), hlls.headOption.map(_._2).getOrElse(12))
  }

  /** Plain CREATE TABLE (no AS SELECT): the table commits at v1 with
    * its schema and zero rows — the first INSERT is the first merge. */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: JMap[String, String]): Table = {
    val dir = tableDir(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(ident)
    val (keys, parts) = createSpec(schema, partitions, properties)
    val (checks, guards, expects) = invariantSpec(properties)
    val (stats, bloomCols, bBits, bK, hllCols, hP) =
      trackingSpec(schema, properties)
    val (fileRanges, layoutMode, zorderKeys) = layoutSpec(properties)
    store.mkdirs(dir.substring(0, dir.lastIndexOf('/')))
    val spark = SparkSession.active
    val empty = spark.createDataFrame(
      Collections.emptyList[org.apache.spark.sql.Row](), schema)
    Snapshot.createMulti(spark, dir, empty, keys = keys,
      partitionCols = parts, statsCols = stats,
      fileRanges = fileRanges, layoutMode = layoutMode,
      zorderKeys = zorderKeys,
      constraints = checks, guards = guards, expects = expects,
      bloomCols = bloomCols, bloomBits = bBits, bloomK = bK,
      hllCols = hllCols, hllP = hP)
    loadTable(ident)
  }

  /** ATOMIC CTAS: nothing lands on disk until `commitStagedChanges`
    * runs the single [[Snapshot.create]] commit. */
  override def stageCreate(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: JMap[String, String]): StagedTable = {
    val dir = tableDir(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(ident)
    val (keys, parts) = createSpec(schema, partitions, properties)
    val (checks, guards, expects) = invariantSpec(properties)
    val tracking = trackingSpec(schema, properties)
    val layout = layoutSpec(properties)
    new GraftStagedTable(ident, dir, store, schema, keys, parts,
      checks = checks, guards = guards, expects = expects,
      tracking = Some(tracking), layout = Some(layout))
  }

  /** ATOMIC `REPLACE TABLE … AS SELECT`: the staged source frame lands
    * as ONE [[Snapshot.overwrite]] commit, so the replace is a
    * VERSIONED table event — history preserved, the pre-replace state
    * stays time-travelable, tags keep their promises — rather than
    * SQL's destructive drop+create. The table CONTRACT is immutable
    * under replace: a declared key / partition column that disagrees
    * with the manifest refuses up front (a redefinition is
    * `DROP TABLE … PURGE` + `CREATE`), an absent spec inherits it, and
    * the overwrite commit itself enforces the schema match plus every
    * gate (CHECK / guards / expectations). */
  override def stageReplace(ident: Identifier, schema: StructType,
                            partitions: Array[Transform],
                            properties: JMap[String, String]): StagedTable = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val m = Snapshot.readManifest(dir, Snapshot.currentVersion(dir))
    val declaredKeys = Option(properties.get("key"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    declaredKeys.filter(_ != m.keys).foreach(k =>
      throw new IllegalArgumentException(
        s"graft catalog: REPLACE TABLE cannot change the key " +
          s"('${k.mkString(",")}' vs the table's '${m.keyLabel}') — the " +
          "contract is a table property; redefine via DROP TABLE ... " +
          "PURGE + CREATE"))
    // same transform discipline as createSpec: an inexpressible spec
    // must REFUSE, never silently drop to the inherited contract
    val declaredParts = partitions.toSeq.map(transformSpec)
    val declaredPart =
      if (declaredParts.nonEmpty) Some(declaredParts)
      else Option(properties.get("partitionCol"))
        .map(graft.operators.Snapshot.PartField.splitSpecs)
    declaredPart.filter(_ != m.partitionCols).foreach(p =>
      throw new IllegalArgumentException(
        s"graft catalog: REPLACE TABLE cannot change the partition spec " +
          s"('${p.mkString(",")}' vs the table's '${m.partitionLabel}') — " +
          "redefine via DROP TABLE ... PURGE + CREATE"))
    // tracking/layout TBLPROPERTIES under REPLACE follow the same
    // doctrine as key/partition: absent inherits, matching is
    // redundant-but-fine, DIFFERING refuses — silently ignoring a
    // declared property is worse than refusing (CREATE honors these,
    // so CREATE OR REPLACE must not behave differently by existence)
    val props = properties.asScala
    def refuse(what: String, declared: String, actual: String,
               via: String): Nothing = throw new IllegalArgumentException(
      s"graft catalog: REPLACE TABLE cannot change $what ('$declared' vs " +
        s"the table's '$actual') — $via")
    if (props.keys.exists(k => k == "statsCols" ||
        k.startsWith("bloom.") || k.startsWith("trigram.") ||
        k.startsWith("hll."))) {
      val (dStats, dBloom, dBits, dK, dHll, dP) =
        trackingSpec(schema, properties)
      if (props.contains("statsCols")) {
        val want = m.keys ++ dStats.filterNot(m.keys.contains)
        if (want.toSet != m.statsCols.toSet)
          refuse("statsCols", want.mkString(","), m.statsCols.mkString(","),
            "tracking evolves via ALTER TABLE SET TBLPROPERTIES")
      }
      // SET comparison: trackingSpec sorts declarations by column
      // name while the manifest keeps ALTER insertion order — the
      // same columns in a different order are the SAME tracking, and
      // SHOW CREATE TABLE output must re-execute
      if (dBloom.nonEmpty &&
          (dBloom.toSet != m.bloomCols.toSet ||
            dBits != m.bloomBits || dK != m.bloomK))
        refuse("bloom tracking",
          s"${dBloom.mkString(",")} ($dBits,$dK)",
          s"${m.bloomCols.mkString(",")} (${m.bloomBits},${m.bloomK})",
          "tracking evolves via ALTER TABLE SET TBLPROPERTIES")
      if (dHll.nonEmpty && (dHll.toSet != m.hllCols.toSet || dP != m.hllP))
        refuse("HLL tracking", s"${dHll.mkString(",")} (p=$dP)",
          s"${m.hllCols.mkString(",")} (p=${m.hllP})",
          "tracking evolves via ALTER TABLE SET TBLPROPERTIES")
    }
    if (props.keys.exists(Set("layout", "fileRanges", "zorderKeys"))) {
      // absent sub-properties INHERIT (the doctrine the refusal text
      // states): only what the statement actually declares is
      // compared, so REPLACE re-stating just 'fileRanges'='4' on a
      // zorder table does not read as a mode change to the default
      val (fr, mode, zk) = layoutSpec(properties)
      val declared = Snapshot.Layout(
        if (props.contains("fileRanges")) fr else m.layout.fileRanges,
        if (props.contains("layout")) mode else m.layout.mode,
        if (props.contains("zorderKeys")) zk else m.layout.zorderKeys)
      if (declared != m.layout)
        refuse("the commit layout", declared.toString, m.layout.toString,
          s"layout is a rewrite — CALL $catName.system.relayout(...)")
    }
    new GraftStagedTable(ident, dir, store, schema, m.keys, m.partitionCols,
      replace = true)
  }

  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
                                    partitions: Array[Transform],
                                    properties: JMap[String, String]): StagedTable =
    if (isTable(tableDir(ident))) stageReplace(ident, schema, partitions, properties)
    else stageCreate(ident, schema, partitions, properties)

  override def dropTable(ident: Identifier): Boolean =
    dropImpl(ident, purge = false)

  override def purgeTable(ident: Identifier): Boolean =
    dropImpl(ident, purge = true)

  private def dropImpl(ident: Identifier, purge: Boolean): Boolean = {
    val dir = tableDir(ident)
    if (!isTable(dir)) return false
    val tags = Snapshot.tags(dir)
    if (tags.nonEmpty && !purge) throw new IllegalStateException(
      s"graft catalog: table $ident has tags pinning versions " +
        s"(${tags.keys.toSeq.sorted.mkString(",")}) — named refs are " +
        "promises to consumers; untag them or DROP TABLE ... PURGE")
    store.deleteTree(dir)
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: RENAME is not supported — the directory path is " +
        "the table's identity (path readers would dangle)")

  /** SQL `ALTER TABLE … ADD COLUMN / RENAME COLUMN / DROP COLUMN /
    * ALTER COLUMN TYPE` routed onto the format's evolution commits
    * ([[Snapshot.addColumn]]/[[Snapshot.renameColumn]]/
    * [[Snapshot.dropColumn]]/[[Snapshot.widenColumn]]) — metadata-only
    * versions (zero data files rewrite; adds null-fill pre-evolution
    * files through the manifest-schema scan, renames ride the column
    * map, drops retire the physical name, type changes only the
    * proven-safe widenings), so the SQL verb stays versioned and
    * time-travelable like every other commit. Contract columns
    * (key/partition/stats/bloom/z-order/constraint-referenced) refuse,
    * as does any non-widening type change. A multi-change statement is
    * ONE commit ([[Snapshot.evolveSchemaAll]]): every change validates
    * against the accumulating manifest inside the commit lock, so the
    * statement applies whole at a single version or refuses whole —
    * never half-altered, even against a concurrent commit; the
    * combined op string records every change for the history. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val path = dir
    val spark = SparkSession.active
    def one(fieldNames: Array[String], what: String): String = {
      if (fieldNames.length != 1) throw new UnsupportedOperationException(
        s"graft catalog: $what of a NESTED field " +
          s"(${fieldNames.mkString(".")}) is not supported")
      fieldNames.head
    }
    def addSpec(ac: TableChange.AddColumn): (String, String) = {
      val name = one(ac.fieldNames, "ADD")
      if (!ac.isNullable) throw new UnsupportedOperationException(
        s"graft catalog: ADD COLUMN $name NOT NULL is not supported — " +
          "existing rows read the new column as NULL; add it nullable " +
          "and backfill by merge")
      if (ac.position != null) throw new UnsupportedOperationException(
        s"graft catalog: ADD COLUMN $name FIRST/AFTER is not supported — " +
          "new columns append (column order is not a table property here)")
      (name, ac.dataType.sql.toLowerCase)
    }
    // the whole statement is ONE evolution commit: every change
    // validates against the accumulating manifest INSIDE the commit
    // lock, so it applies whole at a single version or refuses whole
    // (a validate-first/commit-each split would leave earlier changes
    // applied when a concurrent commit invalidates a later one)
    val steps: Seq[(String, Snapshot.Manifest => Snapshot.Manifest)] =
      changes.map {
        case ac: TableChange.AddColumn =>
          val (n, t) = addSpec(ac)
          (s"add_column($n:$t)", Snapshot.addColumnXform(path, n, t)(_))
        case rc: TableChange.RenameColumn =>
          val n = one(rc.fieldNames, "RENAME")
          (s"rename_column($n->${rc.newName})",
            Snapshot.renameColumnXform(path, n, rc.newName)(_))
        case dc: TableChange.DeleteColumn =>
          val n = one(dc.fieldNames, "DROP")
          (s"drop_column($n)", Snapshot.dropColumnXform(path, n)(_))
        case ut: TableChange.UpdateColumnType =>
          val n = one(ut.fieldNames, "ALTER TYPE")
          val t = ut.newDataType.sql.toLowerCase
          (s"widen_column($n:$t)", Snapshot.widenColumnXform(path, n, t)(_))
        // the INVARIANT lifecycle as TBLPROPERTIES — each a versioned
        // metadata commit: 'check.<name>' adds a CHECK constraint
        // (proven against existing rows inside the commit) / UNSET
        // drops it; 'guard.<name>' sets/releases a table guard;
        // 'expects' replaces the commit-expectation suite
        // (';'-separated) / UNSET clears it
        case sp: TableChange.SetProperty
            if sp.property.startsWith("check.") =>
          val n = sp.property.stripPrefix("check.")
          (s"add_check($n)",
            Snapshot.addCheckXform(spark, path, n, sp.value)(_))
        case sp: TableChange.SetProperty
            if sp.property.startsWith("guard.") =>
          val n = sp.property.stripPrefix("guard.")
          (s"set_guard($n=${sp.value})",
            Snapshot.setGuardXform(path, n, sp.value)(_))
        case sp: TableChange.SetProperty if sp.property == "expects" =>
          val es = sp.value.split(";").map(_.trim).filter(_.nonEmpty).toSeq
          (s"set_expects(${es.mkString(";")})",
            Snapshot.setExpectsXform(path, es)(_))
        // the TRACKING lifecycle as TBLPROPERTIES — the SQL face of
        // setStatsCols/trackBloom/trackHll: tracking starts on each
        // file's NEXT rewrite (compact once to backfill; pruning and
        // manifest aggregates degrade conservatively until then)
        case sp: TableChange.SetProperty if sp.property == "statsCols" =>
          val cs = sp.value.split(",").map(_.trim).filter(_.nonEmpty).toSeq
          (s"set_stats_cols(${cs.mkString(",")})",
            Snapshot.setStatsColsXform(path, cs)(_))
        case sp: TableChange.SetProperty
            if sp.property.startsWith("bloom.") =>
          val c = sp.property.stripPrefix("bloom.")
          val (bits, k) = bloomSizing(c, sp.value)
          (s"track_bloom($c)", Snapshot.addBloomXform(path, c, bits, k)(_))
        case sp: TableChange.SetProperty
            if sp.property.startsWith("trigram.") =>
          val c = sp.property.stripPrefix("trigram.")
          val (bits, k) = bloomSizing(c, sp.value)
          (s"track_trigram($c)",
            Snapshot.addBloomXform(path, Snapshot.TriPrefix + c, bits, k)(_))
        case sp: TableChange.SetProperty
            if sp.property.startsWith("hll.") =>
          val c = sp.property.stripPrefix("hll.")
          val p = if (sp.value.trim.isEmpty) 12 else sp.value.trim.toInt
          (s"track_hll($c)", Snapshot.addHllXform(path, c, p)(_))
        case rp: TableChange.RemoveProperty if rp.property == "statsCols" =>
          ("set_stats_cols()", Snapshot.setStatsColsXform(path, Nil)(_))
        case rp: TableChange.RemoveProperty
            if rp.property.startsWith("bloom.") =>
          val c = rp.property.stripPrefix("bloom.")
          (s"untrack_bloom($c)", Snapshot.dropBloomXform(path, c)(_))
        case rp: TableChange.RemoveProperty
            if rp.property.startsWith("trigram.") =>
          val c = rp.property.stripPrefix("trigram.")
          (s"untrack_trigram($c)",
            Snapshot.dropBloomXform(path, Snapshot.TriPrefix + c)(_))
        case rp: TableChange.RemoveProperty
            if rp.property.startsWith("hll.") =>
          val c = rp.property.stripPrefix("hll.")
          (s"untrack_hll($c)", Snapshot.dropHllXform(path, c)(_))
        // layout is DATA PLACEMENT, not metadata: changing it means
        // rewriting files — route to the priced verb, refuse the
        // silent metadata edit
        case sp: TableChange.SetProperty
            if Set("layout", "fileRanges", "zorderKeys")(sp.property) =>
          throw new UnsupportedOperationException(
            s"graft catalog: '${sp.property}' is the commit LAYOUT — a " +
              "data rewrite, not a metadata property; use CALL " +
              s"$catName.system.relayout(...) (declared at CREATE it " +
              "bootstraps the table's layout)")
        case rp: TableChange.RemoveProperty
            if rp.property.startsWith("check.") =>
          val n = rp.property.stripPrefix("check.")
          (s"drop_check($n)", Snapshot.dropCheckXform(path, n)(_))
        case rp: TableChange.RemoveProperty
            if rp.property.startsWith("guard.") =>
          val n = rp.property.stripPrefix("guard.")
          (s"drop_guard($n)", Snapshot.dropGuardXform(path, n)(_))
        case rp: TableChange.RemoveProperty if rp.property == "expects" =>
          ("set_expects()", Snapshot.setExpectsXform(path, Nil)(_))
        case other => throw new UnsupportedOperationException(
          s"graft catalog: unsupported ALTER TABLE change " +
            s"${other.getClass.getSimpleName} — column add/rename/drop/widen " +
            "are the supported evolutions; anything else is a table " +
            "redefinition, not an evolution")
      }
    Snapshot.evolveSchemaAll(path, steps)
    loadTable(ident)
  }

  // -------------------------------------------------------- procedures

  /** `CALL <cat>.system.compact/vacuum/fsck/relayout/tag/untag/
    * rollback('ns.t', …)` — the maintenance verbs as native SQL
    * procedures (see [[GraftProcedures]]); the table argument
    * resolves through this catalog's root, refusing unknown tables
    * before any lock claim. */
  private lazy val procedures = new GraftProcedures(catName, table => {
    val parts = table.split('.').toSeq
    require(parts.nonEmpty && parts.forall(_.nonEmpty),
      s"graft catalog: bad table argument '$table' (want 'ns.t')")
    val dir = dirOf(parts)
    if (!isTable(dir)) throw new NoSuchTableException(
      Identifier.of(parts.init.toArray, parts.last))
    dir
  })

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    procedures.load(ident)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    procedures.list(namespace)

  // -------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] =
    listNamespaces(Array.empty)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val ns = dirOf(namespace.toSeq)
    if (!store.isDirectory(ns)) throw new NoSuchNamespaceException(namespace)
    store.list(ns)
      .collect { case (n, true) if !isTable(s"$ns/$n") && n != "_log" =>
        namespace :+ n }
      .toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val d = dirOf(namespace.toSeq)
    store.isDirectory(d) && !isTable(d)
  }

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
                               metadata: JMap[String, String]): Unit = {
    if (namespaceExists(namespace))
      throw new NamespaceAlreadyExistsException(namespace)
    store.mkdirs(dirOf(namespace.toSeq))
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: namespaces carry no metadata to alter")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    val d = dirOf(namespace.toSeq)
    if (!namespaceExists(namespace)) return false
    val nonEmpty = store.list(d).nonEmpty
    if (nonEmpty && !cascade)
      throw new IllegalStateException(
        s"graft catalog: namespace ${namespace.mkString(".")} is not empty")
    // CASCADE must not silently bypass the tag protection dropTable
    // enforces: a pinned version is a promise to consumers, and a
    // namespace drop is not a stronger authority than a table drop.
    // (There is no DROP NAMESPACE ... PURGE in SQL, so the override
    // is: untag, or drop the pinned tables individually with PURGE.)
    if (cascade) {
      val pinned = GraftCatalog.tablesUnder(store, d).filter(t =>
        Snapshot.tags(t).nonEmpty)
      if (pinned.nonEmpty) throw new IllegalStateException(
        s"graft catalog: namespace ${namespace.mkString(".")} holds " +
          s"table(s) with tags pinning versions (" +
          pinned.map(_.stripPrefix(d + "/")).sorted.mkString(",") +
          ") — named refs are promises to consumers; untag them or drop " +
          "those tables with DROP TABLE ... PURGE first")
    }
    store.deleteTree(d)
    true
  }
}

private[graft] object GraftCatalog {
  /** The `.files` metadata table: the CURRENT version's live file
    * inventory straight from the manifest — one row per data file
    * with its partition value, physical/logical rows, on-disk bytes
    * and deletion-vector mask size. The operational "where does my
    * storage go / which partitions fragmented / how much MoR debt is
    * outstanding" query, at O(manifest) cost. */
  def filesFrame(spark: SparkSession, path: String,
                 version: Int = 0): org.apache.spark.sql.DataFrame = {
    val m = Snapshot.readManifest(path,
      if (version > 0) version else Snapshot.currentVersion(path))
    val rows = m.partitions.toSeq.sortBy(_._1).flatMap { case (pv, fs) =>
      fs.map { f =>
        val dvRows = f.dv.map(_.rows).getOrElse(0L)
        (pv, f.path, f.rows, f.rows - dvRows, dvRows, f.bytes)
      }
    }
    import spark.implicits._
    rows.toDF("partition", "path", "rows", "logical_rows", "dv_rows", "bytes")
  }

  /** The `.partitions` metadata table: the per-partition rollup of
    * [[filesFrame]] — file counts, row/byte mass and outstanding
    * merge-on-read debt. THE fragmentation monitor: `n_files` past
    * the compact threshold or `dv_rows` piling up is the signal to
    * run [[Snapshot.compact]], read without opening a data file. */
  def partitionsFrame(spark: SparkSession, path: String,
                      version: Int = 0): org.apache.spark.sql.DataFrame = {
    val m = Snapshot.readManifest(path,
      if (version > 0) version else Snapshot.currentVersion(path))
    val rows = m.partitions.toSeq.sortBy(_._1).map { case (pv, fs) =>
      val dvRows = fs.map(_.dv.map(_.rows).getOrElse(0L)).sum
      val raw = fs.map(_.rows).sum
      (pv, fs.size, raw, raw - dvRows, dvRows, fs.map(_.bytes).sum)
    }
    import spark.implicits._
    rows.toDF("partition", "n_files", "rows", "logical_rows", "dv_rows", "bytes")
  }

  /** The `.tags` metadata table: named refs with the version each
    * pins and that version's commit instant. */
  def tagsFrame(spark: SparkSession,
                path: String): org.apache.spark.sql.DataFrame = {
    val rows = Snapshot.tags(path).toSeq.sortBy(_._1).map { case (n, v) =>
      val at = Snapshot.committedAt(path, v)
      (n, v, if (at > 0) Some(new java.sql.Timestamp(at)) else None)
    }
    import spark.implicits._
    rows.toDF("tag", "version", "committed_at")
  }

  /** Every graft table directory under `root` (recursive — tables may
    * sit in nested namespaces). Bounded driver metadata work. */
  def tablesUnder(store: LogStore, root: String): Seq[String] =
    store.list(root).collect { case (n, true) => n }.flatMap { n =>
      val c = s"$root/$n"
      if (store.isDirectory(s"$c/_log")) Seq(c)
      else if (n == "_log") Nil
      else tablesUnder(store, c)
    }
}

/** The CTAS staging handle: the V1 write bridge hands over the (lazy)
  * source DataFrame during the write phase; nothing executes or lands
  * on disk until [[commitStagedChanges]], which runs ONE
  * [[Snapshot.create]] — so the committed table's v1 holds the query
  * result and an abort is a no-op. */
private[graft] class GraftStagedTable(ident: Identifier, dir: String,
                                      store: LogStore,
                                      tableSchema: StructType,
                                      keys: Seq[String], parts: Seq[String],
                                      replace: Boolean = false,
                                      checks: Map[String, String] = Map.empty,
                                      guards: Map[String, String] = Map.empty,
                                      expects: Seq[String] = Nil,
                                      tracking: Option[(Seq[String], Seq[String],
                                        Int, Int, Seq[String], Int)] = None,
                                      layout: Option[(Int, String,
                                        Seq[String])] = None)
  extends StagedTable with SupportsWrite {

  // the declared tracking surface (statsCols/bloom/HLL TBLPROPERTIES),
  // defaulting to key-only stats like plain Scala create
  private val (stats, bloomCols, bBits, bK, hllCols, hP) =
    tracking.getOrElse((keys, Nil, 1 << 17, 6, Nil, 12))
  private val (fileRanges, layoutMode, zorderKeys) =
    layout.getOrElse((0, "range", Nil))

  @volatile private var staged: Option[org.apache.spark.sql.DataFrame] = None

  override def name(): String = ident.toString
  override def schema(): StructType = tableSchema
  override def capabilities(): JSet[TableCapability] = {
    val caps = new java.util.HashSet[TableCapability]()
    caps.add(TableCapability.V1_BATCH_WRITE) // write-only until commit
    // REPLACE TABLE AS SELECT plans as OverwriteByExpression over the
    // staged handle — the replace-ness lives in the `replace` flag,
    // the staged write just buffers either way
    caps.add(TableCapability.TRUNCATE)
    caps.add(TableCapability.OVERWRITE_BY_FILTER)
    caps
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new StagedWriteBuilder

  private class StagedWriteBuilder extends WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsOverwrite {
    override def truncate(): WriteBuilder = this
    override def overwrite(filters: Array[org.apache.spark.sql.sources.Filter])
        : WriteBuilder = this
    override def build(): Write = new V1Write {
      override def toInsertableRelation: InsertableRelation =
        new InsertableRelation {
          override def insert(data: org.apache.spark.sql.DataFrame,
                              overwrite: Boolean): Unit = {
            // buffer only — DataFrames are lazy; execution happens
            // inside the commit so CTAS is all-or-nothing
            staged = Some(data)
          }
        }
    }
  }

  /** `spark.graft.rtas.strictSchema=true` restores the pre-r15
    * schema-exact RTAS (refuse any column change) for SQL migrated
    * against the old deviation. */
  private def rtasStrict(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.rtas.strictSchema")
      .exists(_.toBoolean)

  private def sameSchema(spark: SparkSession, s: StructType): Boolean = {
    val cur = graft.sources.GraftDataSource.logicalSchema(
      dir, Snapshot.currentVersion(dir))
    cur.fields.map(f => (f.name, f.dataType.sql)).toSet ==
      s.fields.map(f => (f.name, f.dataType.sql)).toSet
  }

  override def commitStagedChanges(): Unit = staged match {
    case Some(df) if replace =>
      // REPLACE TABLE AS SELECT: one versioned commit — history
      // preserved, every gate enforced inside the commit. A frame
      // matching the table schema is the plain overwrite (column
      // mapping and tracking untouched); a DIFFERENT schema
      // REDEFINES it via the replace commit (the Delta/Iceberg RTAS
      // contract — r14's documented deviation closed), unless the
      // strict conf pins the old refusal.
      if (sameSchema(df.sparkSession, df.schema) || rtasStrict(df.sparkSession))
        Snapshot.overwrite(df.sparkSession, dir, df)
      else Snapshot.replaceTable(df.sparkSession, dir, df)
    case Some(df) =>
      store.mkdirs(dir.substring(0, dir.lastIndexOf('/')))
      Snapshot.createMulti(df.sparkSession, dir, df, keys = keys,
        partitionCols = parts, statsCols = stats,
        fileRanges = fileRanges, layoutMode = layoutMode,
        zorderKeys = zorderKeys,
        constraints = checks, guards = guards, expects = expects,
        bloomCols = bloomCols, bloomBits = bBits, bloomK = bK,
        hllCols = hllCols, hllP = hP)
    case None if replace =>
      // plain REPLACE TABLE (no AS SELECT): empty the table — the
      // truncate commit, mirroring plain CREATE's empty v1. A declared
      // column list that DISAGREES with the manifest refuses like the
      // AS SELECT path's exact-match check (silently ignoring the
      // user's columns would be worse than either honoring or
      // refusing them).
      val spark = SparkSession.active
      if (tableSchema.nonEmpty && !sameSchema(spark, tableSchema)) {
        require(!rtasStrict(spark),
          s"graft catalog: REPLACE TABLE $ident declares a column list " +
            "that differs from the table's schema and " +
            "spark.graft.rtas.strictSchema is set — evolve via ALTER " +
            "TABLE, or redefine via DROP TABLE ... PURGE + CREATE")
        // declared column list redefines the schema: the replace
        // commit with an empty frame of the NEW schema (truncate +
        // evolve as one version)
        Snapshot.replaceTable(spark, dir, spark.createDataFrame(
          Collections.emptyList[org.apache.spark.sql.Row](), tableSchema))
      } else Snapshot.truncate(spark, dir)
    case None =>
      // plain CREATE OR REPLACE on a MISSING table (no AS SELECT):
      // mirror plain CREATE's empty v1
      store.mkdirs(dir.substring(0, dir.lastIndexOf('/')))
      val spark = SparkSession.active
      val empty = spark.createDataFrame(
        Collections.emptyList[org.apache.spark.sql.Row](), tableSchema)
      Snapshot.createMulti(spark, dir, empty, keys = keys,
        partitionCols = parts, statsCols = stats,
        fileRanges = fileRanges, layoutMode = layoutMode,
        zorderKeys = zorderKeys,
        constraints = checks, guards = guards, expects = expects,
        bloomCols = bloomCols, bloomBits = bBits, bloomK = bK,
        hllCols = hllCols, hllP = hP)
  }

  override def abortStagedChanges(): Unit = () // nothing was written
}
