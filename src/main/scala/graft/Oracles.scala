package graft

/**
 * DuckDB oracle SQL for every SQL-expressible query in [[Queries]].
 * Each statement mirrors its Spark twin's arithmetic exactly:
 * decimal-exact sums cast to double, identical division order,
 * identical regexes (Java/RE2-shared constructs only), identical
 * column aliases (the driver sorts columns by name before hashing).
 * Integer-valued computed columns are BIGINT on both sides (Spark
 * side casts size()/length() to long where needed).
 */
object Oracles {

  // -- shared condition fragments (customer validation rules) ---------
  private val condName = "(c_name IS NOT NULL AND CAST(c_name AS VARCHAR) <> '')"
  private val condPattern = """(c_name IS NULL OR regexp_matches(c_name, '^Customer#\d+$'))"""
  private val condBalNotNull = "(c_acctbal IS NOT NULL)"
  private val condBalNumeric =
    "(c_acctbal IS NOT NULL AND TRY_CAST(c_acctbal AS DOUBLE) IS NOT NULL)"
  private val condBalMin =
    "(c_acctbal IS NULL OR (TRY_CAST(c_acctbal AS DOUBLE) IS NOT NULL AND TRY_CAST(c_acctbal AS DOUBLE) >= 0.0))"
  private val condSeg = "(c_mktsegment IS NOT NULL AND CAST(c_mktsegment AS VARCHAR) <> '')"
  private val condKey =
    "(c_custkey IS NOT NULL AND TRY_CAST(c_custkey AS DOUBLE) IS NOT NULL AND TRY_CAST(c_custkey AS DOUBLE) = CAST(TRY_CAST(c_custkey AS DOUBLE) AS INT))"

  private val allConds = Seq(condName, condPattern, condBalNotNull, condBalNumeric,
    condBalMin, condSeg, condKey)
  private val isValid = allConds.map(c => s"COALESCE($c, FALSE)").mkString(" AND ")

  private val errorSpecs: Seq[(String, String)] = Seq(
    condName -> "c_name:must_be_non_empty",
    condPattern -> "c_name:must_match_pattern",
    condBalNotNull -> "c_acctbal:must_not_be_null",
    condBalNumeric -> "c_acctbal:must_be_numeric",
    condBalMin -> "c_acctbal:must_be_at_least_0.0",
    condSeg -> "c_mktsegment:must_be_non_empty",
    condKey -> "c_custkey:must_be_integer")

  private val errorsExpr = errorSpecs
    .map { case (c, label) => s"CASE WHEN NOT COALESCE($c, FALSE) THEN '$label' END" }
    .mkString("concat_ws(',', ", ", ", ")")

  // -- LSH hyperplane literals (sim_lsh oracle) ------------------------
  // 8 tables × 8 bits × 64 dims of deterministic plane weights, one
  // DOUBLE[] VALUES row per (table, bit) — generated from the same
  // code the LshSignatures expression uses.
  private def lshPlanesValues: String = lshPlanesValuesUpTo(8)

  // The auto-sized variant pins planes for the FULL clamp range of
  // Similarity.autoBits (bit indices 0..19): lshPlaneComponent is a
  // pure function of (seed, table, bit, dim), so plane (t, b) is the
  // same whatever total bit count the sizing picks, and the oracle
  // just filters `b < bits` after re-deriving bits from count(*).
  private def lshPlanesValuesUpTo(maxBits: Int): String =
    (for { tb <- 0 until 8; b <- 0 until maxBits } yield {
      val arr = (0 until 64)
        .map(d => java.lang.Double.toString(
          graft.functions.VectorExprs.lshPlaneComponent(42, tb, b, d)))
        .mkString("[", ", ", "]")
      s"($tb, $b, $arr::DOUBLE[])"
    }).mkString(",\n  ")

  // Similarity.autoBits re-derived in integer SQL: q = ceil(n/32),
  // bits = ceil(log2(q)) clamped to [4, 20] — expressed as a CASE
  // chain over exact BIGINT comparisons (no libm on either engine).
  private def autoBitsSql(nExpr: String): String = {
    val cases = (4 to 19)
      .map(b => s"WHEN ($nExpr + 31) // 32 <= ${1L << b} THEN $b")
      .mkString(" ")
    s"(CASE $cases ELSE 20 END)"
  }

  // -- exact power-of-two table + canonical-double replay --------------
  // 2^k for k in [-1074, 1023] built by recursive doubling/halving —
  // every step an EXACT IEEE multiply/divide, so the table is exact in
  // any engine without libm. Feeds (a) PortableNum.canonString's SQL
  // replay (exponent via max k with 2^k <= |v|, mantissa via exact
  // power-of-two scaling, split into two factors where 52-e exceeds
  // the exponent range) and (b) the portable DDSketch bucket/estimate
  // replay. Oracles using these CTEs must open with WITH RECURSIVE.
  private val pow2Ctes: String =
    "pup AS (SELECT 0 AS k, CAST(1.0 AS DOUBLE) AS p" +
      " UNION ALL SELECT k+1, p*2 FROM pup WHERE k < 1023),\n" +
    "pdn AS (SELECT 0 AS k, CAST(1.0 AS DOUBLE) AS p" +
      " UNION ALL SELECT k-1, p/2 FROM pdn WHERE k > -1074),\n" +
    // GROUP BY, not UNION-distinct: DuckDB's recursive-CTE UNION can
    // leave the (0, 1.0) anchor row duplicated across the two branches,
    // and a duplicate k double-counts every row joining through it
    "pow2 AS (SELECT k, max(p) AS p FROM" +
      " (SELECT * FROM pup UNION ALL SELECT * FROM pdn) GROUP BY k)"

  /** (field, s) rows rendering a DOUBLE column exactly as
    * PortableNum.canonString: `{-}{m}p{e}` with m in [2^52, 2^53),
    * "0" for both zero signs, NaN/Inf literals. */
  private def canonDoubleValsSql(f: String, table: String): String =
    // NOTE: this fragment is embedded inside oracles that run their own
    // stripMargin — no line may start with whitespace + '|' (a leading
    // '||' concat would lose its first pipe), so '||' sits at line ends
    s"""SELECT '$f' AS field,
       |    CASE WHEN isnan(x.v) THEN 'NaN'
       |         WHEN x.v = 'inf'::DOUBLE THEN 'Inf'
       |         WHEN x.v = '-inf'::DOUBLE THEN '-Inf'
       |         WHEN x.v = 0 THEN '0'
       |         ELSE (CASE WHEN x.v < 0 THEN '-' ELSE '' END) ||
       |              CAST(CAST((abs(x.v) * p1.p) * p2.p AS BIGINT) AS VARCHAR) ||
       |              'p' || CAST(x.e - 52 AS VARCHAR) END AS s
       |  FROM (SELECT v, (SELECT max(k) FROM pow2 WHERE p <= abs(t.v)) AS e
       |        FROM (SELECT $f AS v FROM $table WHERE $f IS NOT NULL) t) x
       |  LEFT JOIN pow2 p1 ON p1.k =
       |    CASE WHEN 52 - x.e > 1023 THEN 1000 ELSE 52 - x.e END
       |  LEFT JOIN pow2 p2 ON p2.k =
       |    CASE WHEN 52 - x.e > 1023 THEN 52 - x.e - 1000 ELSE 0 END""".stripMargin

  /** Portable-DDSketch replay for one positive numeric column (j=6):
    * bucket k = (e+1022)·64 + ⌊(v/2^e − 1)·64⌋ (all ops IEEE-exact),
    * rank ⌈q·n⌉ against cumulative counts (zeros rank first), and the
    * exact arithmetic-midpoint decode 2^e·(1+(2·sb+1)/128). Emits
    * CTEs `<a>N/<a>Z/<a>B/<a>C/<a>S/<a>E`; read estimates from
    * `<a>E(q, est)`. Requires `pow2` and `qs(q)` CTEs in scope. */
  private def ddPortableFieldSql(f: String, a: String): String =
    s"""${a}N AS (SELECT COUNT($f) AS n FROM lineitem),
       |${a}Z AS (SELECT COUNT(CASE WHEN $f = 0 THEN 1 END) AS z FROM lineitem),
       |${a}B AS (SELECT k, COUNT(*) AS c FROM (
       |    SELECT CASE WHEN x.e < -1022 THEN 0
       |                ELSE (x.e + 1022) * 64 +
       |                  CAST(floor((x.v / pe.p - 1.0) * 64.0) AS BIGINT) END AS k
       |    FROM (SELECT v, (SELECT max(k) FROM pow2 WHERE p <= t.v) AS e
       |          FROM (SELECT $f AS v FROM lineitem
       |                WHERE $f IS NOT NULL AND $f > 0) t) x
       |    JOIN pow2 pe ON pe.k = greatest(x.e, -1022))
       |  GROUP BY k),
       |${a}C AS (SELECT k, SUM(c) OVER (ORDER BY k) AS cum FROM ${a}B),
       |${a}S AS (SELECT qs.q,
       |    CASE WHEN greatest(1, CAST(ceil(qs.q * ${a}N.n) AS BIGINT)) <= ${a}Z.z
       |         THEN NULL
       |         ELSE (SELECT min(k) FROM ${a}C
       |               WHERE cum + ${a}Z.z >=
       |                 greatest(1, CAST(ceil(qs.q * ${a}N.n) AS BIGINT))) END AS k
       |  FROM qs, ${a}N, ${a}Z),
       |${a}E AS (SELECT s.q,
       |    CASE WHEN s.k IS NULL THEN 0.0
       |         ELSE p.p * (1.0 + (2 * (s.k % 64) + 1) / 128.0) END AS est
       |  FROM ${a}S s LEFT JOIN pow2 p ON p.k = (s.k // 64) - 1022)""".stripMargin

  // -- portable-HLL replay (field_stats_approx oracle) -----------------
  // Rebuilds graft's portable HLL sketch (p=12, md5-prefix hashing —
  // HllExprs.hash52/addHash52) in pure SQL. All arithmetic is either
  // exact-integer (register sums: every 2^-r is a multiple of 2^-41
  // and the total fits 53 bits, so float accumulation is lossless on
  // both engines) or an identical IEEE op sequence, so the ESTIMATE
  // matches bit-for-bit, not approximately. The linear-counting
  // branch's m·ln(m/zeros) is pinned as a 4096-entry literal computed
  // by the same JVM libm the Spark side uses — no cross-engine log.
  private def hllRankCaseSql: String = {
    val cases = (39 to 0 by -1)
      .map(k => s"WHEN rem >= ${1L << k} THEN ${40 - k}")
      .mkString(" ")
    s"(CASE WHEN rem = 0 THEN 41 $cases END)"
  }
  private def hllLinearCountLits: String =
    (1 to 4096).map(z => Math.round(4096 * math.log(4096.0 / z)))
      .mkString("[", ", ", "]")

  // -- BPE rank-order replay (bpe_tokens oracle) -----------------------
  // Each symbol travels as chr(1)||sym||chr(2): a pair pattern can
  // neither match across symbol boundaries (chr(2)chr(1) separates
  // them and symbols contain neither sentinel) nor consume the next
  // occurrence's boundary, so replace()'s left-to-right
  // non-overlapping scan is exactly Bpe.mergePair's semantics.
  // Rank-priority encoding == sequential rank-order replay (see
  // Queries.BpePinnedMerges), so folding one replace() per merge over
  // the wrapped string reproduces BpeEncodeExpr, and the surviving
  // symbol count is just the count of chr(1) sentinels.
  private def bpeSymSql(s: String): String =
    s"chr(1)||'${s.replace("'", "''")}'||chr(2)"
  private def bpeReplaySql(inner: String): String =
    Queries.BpePinnedMerges.foldLeft(inner) { case (acc, (l, r)) =>
      s"replace($acc, ${bpeSymSql(l)}||${bpeSymSql(r)}, ${bpeSymSql(l + r)})"
    }

  // -- decimal-exact money fragments -----------------------------------
  private def sumDec(col: String, alias: String) =
    s"CAST(SUM(CAST($col AS DECIMAL(12,2))) AS DOUBLE) AS $alias"
  private val revenueExpr =
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue"

  private lazy val q3RevenueSql: String =
    s"""SELECT l_orderkey, o_orderdate, o_orderpriority, $revenueExpr
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority""".stripMargin

  // -- text fragments ---------------------------------------------------
  private val wsTokensSql =
    """CASE WHEN length(trim(text)) = 0 THEN [] ELSE regexp_split_to_array(trim(text), '\s+') END"""
  private def stopCount(words: Seq[String]) =
    s"len(list_filter($wsTokensSql, t -> t IN (${words.map(w => s"'$w'").mkString(", ")})))"
  private val langCaseSql: String = {
    val scores = TextAnalysisCols.LangProfiles.map { case (lang, words) =>
      lang -> stopCount(words)
    }
    val maxExpr = s"greatest(${scores.map(_._2).mkString(", ")})"
    val caseChain = scores.map { case (lang, e) =>
      s"WHEN $e > 0 AND $e = $maxExpr THEN '$lang'"
    }.mkString(" ")
    s"CASE $caseChain ELSE 'und' END"
  }

  /** Shared CTE chain computing exact 3-shingle Jaccard pairs at
    * j ≥ 0.8 (no leading WITH so callers can prepend/extend). */
  private val ngramPairsCtes: String =
    """tok AS (
      |  SELECT doc_id,
      |    CASE WHEN length(trim(lower(text))) = 0 THEN []
      |         ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS toks
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, array_to_string(toks[i.i : i.i + 2], ' ') AS shingle
      |  FROM tok, LATERAL unnest(range(1, len(toks) - 1)) AS i(i)
      |  WHERE len(toks) >= 3),
      |sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |jpairs AS (
      |  SELECT i.doc_a, i.doc_b, i.inter, sa.set_size AS size_a, sb.set_size AS size_b,
      |    CAST(i.inter AS DOUBLE) / (sa.set_size + sb.set_size - i.inter) AS jaccard
      |  FROM inter i
      |  JOIN sizes sa ON i.doc_a = sa.doc_id
      |  JOIN sizes sb ON i.doc_b = sb.doc_id
      |  WHERE CAST(i.inter AS DOUBLE) / (sa.set_size + sb.set_size - i.inter) >= 0.8)""".stripMargin

  /** Exact 3-shingle Jaccard pairs at j ≥ 0.8 — the ground truth the
    * prefix-filter, verified-MinHash and verified-SimHash paths must
    * all equal. */
  private val ngramJaccardPairsSql: String =
    s"""WITH $ngramPairsCtes
       |SELECT doc_a, doc_b, inter, size_a, size_b, jaccard FROM jpairs""".stripMargin

  /** Connected components over the near-dup pair graph via recursive
    * reachability closure; cluster id = min doc_id of the component.
    * Closure is exponential-free here because near-dup components are
    * tiny (the oracle runs on test corpora). */
  private val dedupClustersSql: String =
    s"""WITH RECURSIVE $ngramPairsCtes,
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM jpairs
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM jpairs),
       |walk(src, reach) AS (
       |  SELECT DISTINCT src, src FROM edges
       |  UNION
       |  SELECT w.src, e.dst FROM walk w JOIN edges e ON w.reach = e.src)
       |SELECT src AS doc_id, MIN(reach) AS cluster_id FROM walk GROUP BY src""".stripMargin

  /** Full catalog: the literal map plus aliases for queries that are
    * result-identical by construction (sim_pq_served loads persisted
    * codebooks instead of deriving them — same pinned values, same
    * oracle). */
  lazy val all: Map[String, String] = base + ("sim_pq_served" -> base("sim_pq"))

  private lazy val base: Map[String, String] = Map(

    "src_json" ->
      """SELECT event_type, COUNT(*) AS n,
        |CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin,

    "src_csv" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "src_orc" ->
      """SELECT p_brand, COUNT(*) AS n,
        |CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM part GROUP BY p_brand""".stripMargin,

    // the avro round-trip is lossless for long/double, so the oracle
    // aggregates straight from the source parquet table
    "src_avro" ->
      """SELECT s_nationkey, COUNT(*) AS n,
        |CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
        |FROM supplier GROUP BY s_nationkey""".stripMargin,

    "normalize_coalesce" ->
      """SELECT c_custkey,
        |CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END AS bal_norm
        |FROM customer""".stripMargin,

    "normalize_flatten" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS p_k
        |FROM events""".stripMargin,

    "select_columns" ->
      "SELECT p_partkey, p_name, p_retailprice FROM part",

    "drop_columns" ->
      "SELECT s_suppkey, s_name FROM supplier",

    "add_fields" ->
      "SELECT s_suppkey, s_name, 'r1' AS batch_tag FROM supplier",

    "validate_ok" ->
      s"SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer WHERE $isValid",

    "validate_ko" ->
      s"""WITH e AS (SELECT *, $errorsExpr AS errors FROM customer)
         |SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, errors
         |FROM e WHERE errors <> ''""".stripMargin,

    "validate_date_ok" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey,
        |    strftime(o_orderdate, '%Y-%m-%d') AS start_str,
        |    CASE WHEN o_orderkey % 7 = 0
        |      THEN strftime(o_orderdate - INTERVAL 10 DAY, '%Y-%m-%d')
        |      ELSE strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') END AS end_str
        |  FROM orders)
        |SELECT * FROM o
        |WHERE TRY_CAST(start_str AS DATE) IS NOT NULL
        |  AND TRY_CAST(end_str AS DATE) IS NOT NULL
        |  AND TRY_CAST(start_str AS DATE) <= TRY_CAST(end_str AS DATE)
        |  AND TRY_CAST(end_str AS DATE) >= TRY_CAST(start_str AS DATE)""".stripMargin,

    "field_stats" ->
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_orderkey").map { f =>
        s"""SELECT '$f' AS field,
           |COUNT(CASE WHEN $f IS NULL THEN 1 END) AS null_count,
           |COUNT($f) AS non_null_count,
           |COUNT(DISTINCT $f) AS distinct_count,
           |CAST(MIN($f) AS DOUBLE) AS min_num,
           |CAST(MAX($f) AS DOUBLE) AS max_num,
           |CAST(COUNT(CASE WHEN $f IS NULL THEN 1 END) AS DOUBLE) * 100.0 / COUNT(*) AS null_pct
           |FROM lineitem""".stripMargin
      }.mkString("\n UNION ALL \n"),

    // The approx branch with the PORTABLE sketch: registers rebuilt
    // from md5 prefixes (idx = top 12 bits of 52, rank = 41 - bitlen
    // of the low 40), estimate replayed with the exact op sequence of
    // HllExprs.estimate. distinct_count here is an HLL ESTIMATE that
    // both engines derive independently and must agree on exactly.
    "field_stats_approx" -> {
      // DOUBLE fields hash their exact-canonical (m, e) rendering
      // (PortableNum.canonString replayed in SQL via the pow2 table —
      // engine string renderings of doubles diverge past 1e7 and on
      // -0.0, so CAST AS VARCHAR is only portable for the rest)
      val fields = Seq("l_quantity", "l_extendedprice", "l_discount", "l_orderkey")
      val doubleFields = Set("l_quantity", "l_extendedprice", "l_discount")
      val vals = fields.map { f =>
        if (doubleFields(f)) canonDoubleValsSql(f, "lineitem")
        else s"SELECT '$f' AS field, CAST($f AS VARCHAR) AS s FROM lineitem WHERE $f IS NOT NULL"
      }.mkString("\n  UNION ALL\n  ")
      val base = fields.map { f =>
        s"""SELECT '$f' AS field,
           |  COUNT(CASE WHEN $f IS NULL THEN 1 END) AS null_count,
           |  COUNT($f) AS non_null_count,
           |  CAST(MIN($f) AS DOUBLE) AS min_num,
           |  CAST(MAX($f) AS DOUBLE) AS max_num,
           |  CAST(COUNT(CASE WHEN $f IS NULL THEN 1 END) AS DOUBLE) * 100.0 / COUNT(*) AS null_pct
           |  FROM lineitem""".stripMargin
      }.mkString("\n  UNION ALL\n  ")
      s"""WITH RECURSIVE $pow2Ctes,
         |lct AS (SELECT $hllLinearCountLits AS lc),
         |vals AS (
         |  $vals),
         |h AS (SELECT field, CAST('0x' || substr(md5(s), 1, 13) AS BIGINT) AS h52 FROM vals),
         |reg AS (
         |  SELECT field, h52 >> 40 AS idx, MAX($hllRankCaseSql) AS r
         |  FROM (SELECT field, h52, h52 & ${(1L << 40) - 1} AS rem FROM h)
         |  GROUP BY 1, 2),
         |sk AS (SELECT field,
         |        CAST(SUM(CAST(1 AS BIGINT) << (41 - r)) AS BIGINT) AS s_present,
         |        COUNT(*) AS m_present
         |       FROM reg GROUP BY 1),
         |est AS (SELECT field,
         |        (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096 * 4096 /
         |          (CAST(s_present + (4096 - m_present) * ${1L << 41} AS DOUBLE)
         |            / ${(1L << 41).toDouble}) AS e_raw,
         |        4096 - m_present AS zeros
         |       FROM sk),
         |dc AS (SELECT field,
         |        CASE WHEN e_raw <= 10240.0 AND zeros > 0 THEN lc[CAST(zeros AS INT)]
         |             ELSE CAST(ROUND(e_raw) AS BIGINT) END AS distinct_count
         |       FROM est, lct),
         |base AS (
         |  $base)
         |SELECT b.field, b.null_count, b.non_null_count,
         |  COALESCE(d.distinct_count, 0) AS distinct_count,
         |  b.min_num, b.max_num, b.null_pct
         |FROM base b LEFT JOIN dc d USING (field)""".stripMargin
    },

    // portable DDSketch quantiles: buckets, ranks, and estimates all
    // rebuilt from the raw values with exact arithmetic (pow2 table) —
    // an approximate quantile sketch with a bit-exact oracle
    "dd_quantile_portable" ->
      s"""WITH RECURSIVE $pow2Ctes,
         |qs AS (SELECT CAST(q AS DOUBLE) AS q
         |       FROM (VALUES (0.25),(0.5),(0.9),(0.99)) t(q)),
         |${ddPortableFieldSql("l_extendedprice", "fp")},
         |${ddPortableFieldSql("l_quantity", "fq")}
         |SELECT qs.q, fpE.est AS est_price, fqE.est AS est_qty
         |FROM qs JOIN fpE ON fpE.q = qs.q JOIN fqE ON fqE.q = qs.q""".stripMargin,

    "field_quantiles" ->
      Seq("l_quantity", "l_extendedprice", "l_discount").map { f =>
        s"""SELECT '$f' AS field,
           |quantile_cont(CAST($f AS DOUBLE), 0.5) AS q50,
           |quantile_cont(CAST($f AS DOUBLE), 0.9) AS q90,
           |quantile_cont(CAST($f AS DOUBLE), 0.99) AS q99
           |FROM lineitem""".stripMargin
      }.mkString("\n UNION ALL \n"),

    "field_topk" ->
      """WITH p AS (
        |  SELECT field, value FROM (
        |    SELECT 'o_orderstatus' AS field, CAST(o_orderstatus AS VARCHAR) AS value FROM orders
        |    UNION ALL
        |    SELECT 'o_orderpriority' AS field, CAST(o_orderpriority AS VARCHAR) AS value FROM orders)),
        |c AS (SELECT field, value, COUNT(*) AS n FROM p GROUP BY 1, 2),
        |r AS (SELECT *, ROW_NUMBER() OVER
        |        (PARTITION BY field ORDER BY n DESC, value ASC) AS "rank" FROM c)
        |SELECT field, value, n, "rank" FROM r WHERE "rank" <= 3""".stripMargin,

    "validation_stats" ->
      s"""WITH v AS (SELECT ($isValid) AS is_valid FROM customer)
         |SELECT COUNT(*) AS total_records,
         |COUNT(CASE WHEN is_valid THEN 1 END) AS valid_records,
         |COUNT(CASE WHEN NOT is_valid THEN 1 END) AS rejected_records,
         |CAST(COUNT(CASE WHEN is_valid THEN 1 END) AS DOUBLE) * 100.0 / COUNT(*) AS validation_pass_rate,
         |CAST(COUNT(CASE WHEN NOT is_valid THEN 1 END) AS DOUBLE) * 100.0 / COUNT(*) AS validation_fail_rate
         |FROM v""".stripMargin,

    "top_errors" ->
      errorSpecs.map { case (c, label) =>
        s"SELECT '$label' AS error, COUNT(CASE WHEN NOT COALESCE($c, FALSE) THEN 1 END) AS n FROM customer"
      }.mkString("WITH f AS (\n", "\n UNION ALL \n", "\n) SELECT error, n FROM f WHERE n > 0"),

    "dataflow_e2e" ->
      s"""SELECT c_custkey, c_name, c_mktsegment AS segment, 'motor' AS source_tag
         |FROM customer
         |WHERE COALESCE($condBalNotNull, FALSE) AND COALESCE($condBalMin, FALSE)
         |  AND COALESCE($condName, FALSE)""".stripMargin,

    "q1_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |${sumDec("l_quantity", "sum_qty")},
         |${sumDec("l_extendedprice", "sum_base_price")},
         |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
         |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
         |CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
         |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
         |COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q3_revenue" -> q3RevenueSql,

    // the pre-bucketed variant MUST produce hash-identical rows: the
    // bucketed layout is a physical-plan change only, so it shares
    // q3_revenue's oracle verbatim
    "q3_revenue_bucketed" -> q3RevenueSql,

    // salting is likewise a pure physical transformation (row-hash
    // salt on the fact side, dim replicated per salt, join on
    // (key, salt)) — hash-identical rows, same oracle
    "q3_revenue_salted" -> q3RevenueSql,

    "q5_nation_revenue" ->
      s"""SELECT n_name, $revenueExpr
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name""".stripMargin,

    "q_top_customers" ->
      """WITH ranked AS (
        |  SELECT c_nationkey, c_custkey, c_name, c_acctbal,
        |    ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
        |  FROM customer)
        |SELECT n_name, c_custkey, c_name, c_acctbal, rn
        |FROM ranked JOIN nation ON c_nationkey = n_nationkey
        |WHERE rn <= 3""".stripMargin,

    "q_no_order_customers" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin,

    // events.ts is surfaced by graft at micro-precision TIMESTAMP
    // whatever the file's physical type (NANOS-as-long with exact
    // div-1000, or native micros — see Readers.table); the oracle
    // casts to plain (micro) TIMESTAMP to match.
    "q_events_hourly" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type, COUNT(*) AS n,
        |CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_events_props" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k, COUNT(*) AS n,
        |CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1""".stripMargin,

    "q_event_pivot" ->
      """SELECT user_id,
        |COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases,
        |COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS views,
        |COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
        |COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signups,
        |COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS errors,
        |CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS purchase_value
        |FROM events GROUP BY user_id""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    // hourly resample with gap filling: dense hour axis per type via
    // generate_series, zero-filled left join
    "q_resample" ->
      """WITH ev AS (SELECT event_type, date_trunc('hour', ts) AS h FROM events),
        |c AS (SELECT event_type, h, COUNT(*) AS n FROM ev GROUP BY 1, 2),
        |b AS (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM ev GROUP BY 1),
        |ax AS (SELECT event_type,
        |         unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b)
        |SELECT ax.event_type, CAST(ax.h AS VARCHAR) AS hour,
        |  COALESCE(c.n, 0) AS n
        |FROM ax LEFT JOIN c ON ax.event_type = c.event_type AND ax.h = c.h""".stripMargin,

    "q_ntile" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |NTILE(4) OVER w AS bal_quartile,
        |CAST(FLOOR(PERCENT_RANK() OVER w * 1000) AS BIGINT) AS pr_millis
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)""".stripMargin,

    "q_set_ops" ->
      """WITH rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
        |urgent AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
        |           WHERE o_orderpriority = '1-URGENT')
        |SELECT c_custkey, 'rich_and_urgent' AS category FROM (SELECT * FROM rich INTERSECT SELECT * FROM urgent)
        |UNION ALL
        |SELECT c_custkey, 'rich_only' FROM (SELECT * FROM rich EXCEPT SELECT * FROM urgent)
        |UNION ALL
        |SELECT c_custkey, 'urgent_only' FROM (SELECT * FROM urgent EXCEPT SELECT * FROM rich)""".stripMargin,

    // rolling z-score anomalies: trailing frame excludes the current
    // row; stats + z rounded 6dp (sliding-frame stddev ulps)
    "q_anomaly" ->
      """SELECT user_id, event_id,
        |  CAST(COUNT(*) OVER wnd AS BIGINT) AS n_hist,
        |  ROUND(AVG(value) OVER wnd, 6) AS hist_mean,
        |  ROUND(STDDEV_SAMP(value) OVER wnd, 6) AS hist_std,
        |  CASE WHEN COUNT(*) OVER wnd >= 5 AND STDDEV_SAMP(value) OVER wnd > 0
        |    THEN ROUND((value - AVG(value) OVER wnd) / (STDDEV_SAMP(value) OVER wnd), 6)
        |  END AS z,
        |  COALESCE(ABS(CASE WHEN COUNT(*) OVER wnd >= 5 AND STDDEV_SAMP(value) OVER wnd > 0
        |    THEN ROUND((value - AVG(value) OVER wnd) / (STDDEV_SAMP(value) OVER wnd), 6)
        |  END) > 3.0, false) AS is_anomaly
        |FROM events
        |WINDOW wnd AS (PARTITION BY user_id ORDER BY event_id
        |               ROWS BETWEEN 9 PRECEDING AND 1 PRECEDING)""".stripMargin,

    // native session_window semantics: exclusive end — an event at
    // exactly prev + gap opens a NEW session (>=, not >)
    "q_sessions_sw" ->
      """WITH x AS (
        |  SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |y AS (
        |  SELECT user_id, ts,
        |    CASE WHEN prev_ts IS NULL OR ts >= prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
        |  FROM x),
        |z AS (
        |  SELECT user_id, ts,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM y)
        |SELECT user_id,
        |  MIN(ts) AS sess_start,
        |  MAX(ts) + INTERVAL 30 MINUTE AS sess_end,
        |  COUNT(*) AS sess_events
        |FROM z GROUP BY user_id, sess_id""".stripMargin,

    "q_sessions" ->
      """WITH x AS (
        |  SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |y AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
        |  FROM x),
        |z AS (
        |  SELECT user_id,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM y),
        |g AS (SELECT user_id, sess_id, COUNT(*) AS sess_events FROM z GROUP BY user_id, sess_id)
        |SELECT user_id, COUNT(*) AS n_sessions,
        |CAST(SUM(sess_events) AS BIGINT) AS n_events,
        |MAX(sess_events) AS max_session_events
        |FROM g GROUP BY user_id""".stripMargin,

    // DuckDB has native ASOF JOIN — the perfect oracle for graft's
    // union+window implementation.
    "q_asof_order" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
        |                       ORDER BY o_orderkey DESC) AS rn
        |  FROM orders),
        |rr AS (SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM r WHERE rn = 1)
        |SELECT e.event_id, e.user_id, rr.o_orderkey, rr.o_totalprice
        |FROM events e
        |ASOF LEFT JOIN rr
        |  ON e.user_id = rr.o_custkey AND e.ts >= rr.o_orderdate""".stripMargin,

    "q_range_join" ->
      """WITH w AS (
        |  SELECT o_orderkey, o_custkey,
        |    TIMESTAMP '2024-01-01' + (o_orderkey % 28) * INTERVAL 1 DAY AS start_ts
        |  FROM orders)
        |SELECT o_orderkey, COUNT(*) AS n_events,
        |CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events e
        |JOIN w ON e.user_id = w.o_custkey
        |  AND e.ts >= w.start_ts
        |  AND e.ts < w.start_ts + INTERVAL 3 DAY
        |GROUP BY o_orderkey""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS fp, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY text""".stripMargin,

    // 3-shingle Jaccard pairs; mirrors Dedup.ngramJaccard exactly
    // (distinct shingles, shared-shingle join, count-based intersection).
    "dedup_ngram_jaccard" -> ngramJaccardPairsSql,

    // SimHash-blocked + exact-Jaccard-verified — same ground truth;
    // a hash-exact match certifies blocking recall 1 on this corpus
    "dedup_simhash" -> ngramJaccardPairsSql,

    // connected components over the near-dup graph (min-id labels)
    "dedup_clusters" -> dedupClustersSql,

    // incremental maintenance ≡ full recompute, as a hash check: the
    // labels folded from yesterday's clusters + the batch-touching
    // pair delta must equal the full-corpus closure verbatim
    "dedup_clusters_incremental" -> dedupClustersSql,

    // top repeated 8-token spans: winners picked by (count desc, md5
    // asc) — md5 so the selection replays here — then recounted with
    // their text and distinct-document counts
    "top_spans" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN []
        |         ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
        |  FROM documents),
        |spans AS (
        |  SELECT doc_id, s.s
        |  FROM (SELECT doc_id,
        |          list_transform(generate_series(1, len(toks) - 7),
        |            i -> array_to_string(toks[i : i + 7], ' ')) AS sp
        |        FROM tok WHERE len(toks) >= 8),
        |  LATERAL unnest(sp) AS s(s)),
        |counts AS (SELECT md5(s) AS h, COUNT(*) AS n_inst FROM spans GROUP BY 1),
        |top AS (SELECT h FROM counts ORDER BY n_inst DESC, h LIMIT 20)
        |SELECT s AS span, COUNT(*) AS n_inst, COUNT(DISTINCT doc_id) AS n_docs
        |FROM spans WHERE md5(s) IN (SELECT h FROM top)
        |GROUP BY s""".stripMargin,

    // keep-best selection over the same component closure: survivors
    // = everything minus per-cluster rank>1 by (length desc, id asc)
    "dedup_keep_best" ->
      s"""WITH RECURSIVE $ngramPairsCtes,
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM jpairs
         |  UNION ALL
         |  SELECT doc_b AS src, doc_a AS dst FROM jpairs),
         |walk(src, reach) AS (
         |  SELECT DISTINCT src, src FROM edges
         |  UNION
         |  SELECT w.src, e.dst FROM walk w JOIN edges e ON w.reach = e.src),
         |cl AS (SELECT src AS doc_id, MIN(reach) AS cluster_id FROM walk GROUP BY src),
         |ranked AS (
         |  SELECT d.doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY cl.cluster_id
         |      ORDER BY length(d.text) DESC, d.doc_id ASC) AS rk
         |  FROM documents d JOIN cl USING (doc_id)),
         |dropped AS (SELECT doc_id FROM ranked WHERE rk > 1)
         |SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
         |FROM documents
         |WHERE doc_id NOT IN (SELECT doc_id FROM dropped)""".stripMargin,

    // incremental dedup: all pairs touching the doc_id%10=0 batch
    "dedup_incremental" ->
      s"""WITH $ngramPairsCtes
         |SELECT doc_a, doc_b, inter, size_a, size_b, jaccard FROM jpairs
         |WHERE doc_a % 10 = 0 OR doc_b % 10 = 0""".stripMargin,

    // Dedup.minhashLshVerified rescores LSH candidates against the
    // TRUE shingle sets, so its output is the exact-Jaccard pair set
    // (candidate miss probability ~8e-8 per pair at j=0.8 with
    // 32 hashes × 16 bands) — same oracle as the prefix-filter join.
    "dedup_minhash" -> ngramJaccardPairsSql,

    // incremental SimHash: the full exact pair set restricted to
    // batch-touching rows — identical restriction to dedup_incremental
    "dedup_simhash_incremental" ->
      s"""WITH $ngramPairsCtes
         |SELECT doc_a, doc_b, inter, size_a, size_b, jaccard FROM jpairs
         |WHERE doc_a % 10 = 0 OR doc_b % 10 = 0""".stripMargin,

    // DuckDB's list_dot_product / list_sum fold doubles left-to-right,
    // exactly like graft's aggregate(zip_with(...)) kernels — verified
    // bit-for-bit — so the embedding ops get full hash oracles.
    "dedup_embedding" ->
      """WITH w AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM w)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos_sim
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4""".stripMargin,

    // incremental ≡ full, embedding member: the full exact pair set
    // restricted to rows touching the %20 batch — what
    // cosineDupPairsIncremental computes at |corpus|·|batch| cost
    "dedup_embedding_incremental" ->
      """WITH w AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM w)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  CASE WHEN a.nrm * b.nrm = 0 THEN 0.0
        |       ELSE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) END AS cos_sim
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE (CASE WHEN a.nrm * b.nrm = 0 THEN 0.0
        |            ELSE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) END) >= 0.4
        |  AND (a.vec_id % 20 = 0 OR b.vec_id % 20 = 0)""".stripMargin,

    // cross-frame embedding near-dup vs the vec_id%20 subset
    "sim_cross" ->
      """WITH w AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM w)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos_sim
        |FROM n a, n b
        |WHERE b.vec_id % 20 = 0
        |  AND list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4""".stripMargin,

    // scale path of sim_cross: LSH-bucketed candidates on BOTH sides
    // (same plane literals as sim_lsh), exact rescoring. Self-matches
    // (b is a subset of a) are kept, like the brute variant.
    "sim_cross_lsh" ->
      s"""WITH planes(t, b, p) AS (VALUES
        |  $lshPlanesValues),
        |w AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM w),
        |sig AS (
        |  SELECT n.vec_id, pl.t,
        |    CAST(SUM(CASE WHEN list_dot_product(n.v, pl.p) >= 0
        |                  THEN (CAST(1 AS BIGINT) << pl.b) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM n, planes pl GROUP BY n.vec_id, pl.t),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
        |  FROM sig a JOIN sig c ON a.t = c.t AND a.bucket = c.bucket
        |  WHERE c.vec_id % 20 = 0),
        |sc AS (
        |  SELECT cand.id_a, cand.id_b,
        |    CASE WHEN qa.nrm * qc.nrm = 0 THEN 0.0
        |         ELSE list_dot_product(qa.v, qc.v) / (qa.nrm * qc.nrm) END AS cos_sim
        |  FROM cand JOIN n qa ON qa.vec_id = cand.id_a
        |            JOIN n qc ON qc.vec_id = cand.id_b)
        |SELECT id_a, id_b, cos_sim FROM sc WHERE cos_sim >= 0.4""".stripMargin,

    // int8 quantization arithmetic replayed exactly: same IEEE op
    // sequence (abs/max fold, /127, HALF_UP round — DuckDB and Spark
    // both round halves away from zero — clamp, multiply, max) over
    // exact doubles, so max_abs_err must match to the last bit
    "emb_quantize" ->
      """WITH w AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (SELECT vec_id, v,
        |        COALESCE(list_aggregate(list_transform(v, x -> abs(x)), 'max'), 0.0)
        |          / 127.0 AS q_scale
        |      FROM w)
        |SELECT vec_id, q_scale,
        |  COALESCE(list_aggregate(list_transform(v, x ->
        |    abs((CASE WHEN q_scale = 0.0 THEN 0.0
        |         ELSE least(greatest(round(x / q_scale), -127.0), 127.0) END)
        |      * q_scale - x)), 'max'), 0.0) AS max_abs_err
        |FROM s""".stripMargin,

    "sim_topk" ->
      """WITH w AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM w),
        |p AS (
        |  SELECT q.vec_id AS id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos_sim
        |  FROM n q JOIN n c ON q.vec_id <> c.vec_id),
        |r AS (SELECT *, ROW_NUMBER() OVER
        |        (PARTITION BY id ORDER BY cos_sim DESC, neighbor_id ASC) AS "rank"
        |      FROM p)
        |SELECT id, neighbor_id, cos_sim, "rank" FROM r WHERE "rank" <= 10""".stripMargin,

    // Full ANN oracles: the LSH oracle replicates graft's
    // random-hyperplane bucketing exactly — plane weights come from
    // the same deterministic generator the Catalyst expression uses
    // (VectorExprs.lshPlaneComponent, single source of truth),
    // embedded here as SQL literals (Double.toString round-trips
    // bit-exactly through DuckDB's correctly-rounded parser), and
    // list_dot_product folds left-to-right like VecDot — so
    // signatures, buckets, candidate pairs and rescored ranks are
    // bit-identical across engines.
    "sim_lsh" ->
      s"""WITH planes(t, b, p) AS (VALUES
        |  $lshPlanesValues),
        |w AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM w),
        |sig AS (
        |  SELECT n.vec_id, pl.t,
        |    CAST(SUM(CASE WHEN list_dot_product(n.v, pl.p) >= 0
        |                  THEN (CAST(1 AS BIGINT) << pl.b) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM n, planes pl GROUP BY n.vec_id, pl.t),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS id, c.vec_id AS neighbor_id
        |  FROM sig a JOIN sig c ON a.t = c.t AND a.bucket = c.bucket
        |   AND a.vec_id <> c.vec_id),
        |sc AS (
        |  SELECT cand.id, cand.neighbor_id,
        |    CASE WHEN qa.nrm * qc.nrm = 0 THEN 0.0
        |         ELSE list_dot_product(qa.v, qc.v) / (qa.nrm * qc.nrm) END AS cos_sim
        |  FROM cand JOIN n qa ON qa.vec_id = cand.id
        |            JOIN n qc ON qc.vec_id = cand.neighbor_id),
        |r AS (SELECT *, ROW_NUMBER() OVER
        |        (PARTITION BY id ORDER BY cos_sim DESC, neighbor_id ASC) AS "rank" FROM sc)
        |SELECT id, neighbor_id, cos_sim, "rank" FROM r WHERE "rank" <= 10""".stripMargin,

    // Occupancy-sized LSH: same pipeline as sim_lsh, but the plane
    // count is re-derived from count(*) exactly as
    // Similarity.autoBits does (integer ceil-log2 of ceil(n/32),
    // clamped to [4,20]; Scale.estimatedRows reads every footer for
    // dirs up to 64 files, so its n equals COUNT(*) exactly on the
    // gate data) and the pinned plane table carries the full clamp
    // range, filtered to `b < bits`.
    "sim_lsh_auto" ->
      s"""WITH planes(t, b, p) AS (VALUES
        |  ${lshPlanesValuesUpTo(20)}),
        |bits AS (SELECT ${autoBitsSql("COUNT(*)")} AS nb FROM embeddings),
        |w AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM w),
        |sig AS (
        |  SELECT n.vec_id, pl.t,
        |    CAST(SUM(CASE WHEN list_dot_product(n.v, pl.p) >= 0
        |                  THEN (CAST(1 AS BIGINT) << pl.b) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM n, planes pl WHERE pl.b < (SELECT nb FROM bits)
        |  GROUP BY n.vec_id, pl.t),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS id, c.vec_id AS neighbor_id
        |  FROM sig a JOIN sig c ON a.t = c.t AND a.bucket = c.bucket
        |   AND a.vec_id <> c.vec_id),
        |sc AS (
        |  SELECT cand.id, cand.neighbor_id,
        |    CASE WHEN qa.nrm * qc.nrm = 0 THEN 0.0
        |         ELSE list_dot_product(qa.v, qc.v) / (qa.nrm * qc.nrm) END AS cos_sim
        |  FROM cand JOIN n qa ON qa.vec_id = cand.id
        |            JOIN n qc ON qc.vec_id = cand.neighbor_id),
        |r AS (SELECT *, ROW_NUMBER() OVER
        |        (PARTITION BY id ORDER BY cos_sim DESC, neighbor_id ASC) AS "rank" FROM sc)
        |SELECT id, neighbor_id, cos_sim, "rank" FROM r WHERE "rank" <= 10""".stripMargin,

    // The IVF oracle rebuilds the catalog query's pinned codebook
    // from the parquet (32 lowest-id vectors, inv-multiply
    // normalization — the exact arithmetic NearestCentroids uses),
    // then replicates assignment (ordered Σdiff² fold), 4-cell
    // probing, and exact cosine rescoring.
    "sim_ivf" ->
      """WITH w AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, list_sum(list_transform(v, x -> x*x)) AS ss FROM w),
        |u AS (SELECT vec_id, v, sqrt(ss) AS nrm,
        |        CASE WHEN ss > 0 THEN list_transform(v, x -> x * (1.0/sqrt(ss)))
        |             ELSE v END AS uv
        |      FROM n),
        |cent AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
        |         CASE WHEN ss > 0 THEN list_transform(v, x -> x * (1.0/sqrt(ss)))
        |              ELSE v END AS c
        |  FROM (SELECT vec_id, v, list_sum(list_transform(v, x -> x*x)) AS ss
        |        FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |              WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 32))),
        |asg AS (
        |  SELECT u.vec_id, cent.cid,
        |    list_sum(list_transform(generate_series(1, len(u.uv)),
        |      i -> (u.uv[i] - cent.c[i]) * (u.uv[i] - cent.c[i]))) AS d2
        |  FROM u, cent),
        |pr AS (SELECT vec_id, cid, ROW_NUMBER() OVER
        |         (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS p FROM asg),
        |cand AS (
        |  SELECT q.vec_id AS id, d.vec_id AS neighbor_id
        |  FROM pr q JOIN pr d ON q.cid = d.cid AND d.p = 1 AND q.p <= 4
        |   AND q.vec_id <> d.vec_id),
        |sc AS (
        |  SELECT cand.id, cand.neighbor_id,
        |    CASE WHEN qa.nrm * qc.nrm = 0 THEN 0.0
        |         ELSE list_dot_product(qa.v, qc.v) / (qa.nrm * qc.nrm) END AS cos_sim
        |  FROM cand JOIN u qa ON qa.vec_id = cand.id
        |            JOIN u qc ON qc.vec_id = cand.neighbor_id),
        |r AS (SELECT *, ROW_NUMBER() OVER
        |        (PARTITION BY id ORDER BY cos_sim DESC, neighbor_id ASC) AS "rank" FROM sc)
        |SELECT id, neighbor_id, cos_sim, "rank" FROM r WHERE "rank" <= 10""".stripMargin,

    // Cross-frame IVF search: sim_ivf's pinned-codebook construction
    // with the query side restricted to the query batch (vec_id % 20)
    // and NO self-exclusion — a query present in the corpus ranks
    // itself first at cos 1.0 (the membership signal).
    "sim_search" ->
      """WITH w AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, list_sum(list_transform(v, x -> x*x)) AS ss FROM w),
        |u AS (SELECT vec_id, v, sqrt(ss) AS nrm,
        |        CASE WHEN ss > 0 THEN list_transform(v, x -> x * (1.0/sqrt(ss)))
        |             ELSE v END AS uv
        |      FROM n),
        |cent AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
        |         CASE WHEN ss > 0 THEN list_transform(v, x -> x * (1.0/sqrt(ss)))
        |              ELSE v END AS c
        |  FROM (SELECT vec_id, v, list_sum(list_transform(v, x -> x*x)) AS ss
        |        FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |              WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 32))),
        |asg AS (
        |  SELECT u.vec_id, cent.cid,
        |    list_sum(list_transform(generate_series(1, len(u.uv)),
        |      i -> (u.uv[i] - cent.c[i]) * (u.uv[i] - cent.c[i]))) AS d2
        |  FROM u, cent),
        |pr AS (SELECT vec_id, cid, ROW_NUMBER() OVER
        |         (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS p FROM asg),
        |cand AS (
        |  SELECT q.vec_id AS id, d.vec_id AS neighbor_id
        |  FROM pr q JOIN pr d ON q.cid = d.cid AND d.p = 1 AND q.p <= 4
        |  WHERE q.vec_id % 20 = 0),
        |sc AS (
        |  SELECT cand.id, cand.neighbor_id,
        |    CASE WHEN qa.nrm * qc.nrm = 0 THEN 0.0
        |         ELSE list_dot_product(qa.v, qc.v) / (qa.nrm * qc.nrm) END AS cos_sim
        |  FROM cand JOIN u qa ON qa.vec_id = cand.id
        |            JOIN u qc ON qc.vec_id = cand.neighbor_id),
        |r AS (SELECT *, ROW_NUMBER() OVER
        |        (PARTITION BY id ORDER BY cos_sim DESC, neighbor_id ASC) AS "rank" FROM sc)
        |SELECT id, neighbor_id, cos_sim, "rank" FROM r WHERE "rank" <= 10""".stripMargin,

    // FILTERED ANN: identical replay to sim_search, with the corpus
    // side pre-filtered to vec_id%3==1 — pre-filter semantics means
    // the restriction applies at the candidate join (assignment is
    // per-row and unchanged), exactly like running the unfiltered
    // search on the restricted corpus.
    "sim_filtered" ->
      """WITH w AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, list_sum(list_transform(v, x -> x*x)) AS ss FROM w),
        |u AS (SELECT vec_id, v, sqrt(ss) AS nrm,
        |        CASE WHEN ss > 0 THEN list_transform(v, x -> x * (1.0/sqrt(ss)))
        |             ELSE v END AS uv
        |      FROM n),
        |cent AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
        |         CASE WHEN ss > 0 THEN list_transform(v, x -> x * (1.0/sqrt(ss)))
        |              ELSE v END AS c
        |  FROM (SELECT vec_id, v, list_sum(list_transform(v, x -> x*x)) AS ss
        |        FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |              WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 32))),
        |asg AS (
        |  SELECT u.vec_id, cent.cid,
        |    list_sum(list_transform(generate_series(1, len(u.uv)),
        |      i -> (u.uv[i] - cent.c[i]) * (u.uv[i] - cent.c[i]))) AS d2
        |  FROM u, cent),
        |pr AS (SELECT vec_id, cid, ROW_NUMBER() OVER
        |         (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS p FROM asg),
        |cand AS (
        |  SELECT q.vec_id AS id, d.vec_id AS neighbor_id
        |  FROM pr q JOIN pr d ON q.cid = d.cid AND d.p = 1 AND q.p <= 4
        |  WHERE q.vec_id % 20 = 0 AND d.vec_id % 3 = 1),
        |sc AS (
        |  SELECT cand.id, cand.neighbor_id,
        |    CASE WHEN qa.nrm * qc.nrm = 0 THEN 0.0
        |         ELSE list_dot_product(qa.v, qc.v) / (qa.nrm * qc.nrm) END AS cos_sim
        |  FROM cand JOIN u qa ON qa.vec_id = cand.id
        |            JOIN u qc ON qc.vec_id = cand.neighbor_id),
        |r AS (SELECT *, ROW_NUMBER() OVER
        |        (PARTITION BY id ORDER BY cos_sim DESC, neighbor_id ASC) AS "rank" FROM sc)
        |SELECT id, neighbor_id, cos_sim, "rank" FROM r WHERE "rank" <= 10""".stripMargin,

    // Versioned vector index served from the snapshot table: the
    // corpus side is embeddings AFTER the v2 refresh (vec_id%17==3
    // re-embedded to the negated vector — negation commutes with the
    // float→double widening bit-for-bit — %19==4 retired, nulls never
    // indexed); queries are the original %20 batch; the codebook stays
    // the ORIGINAL anchor set. Same assignment/probe/rescore replay as
    // sim_search — hash equality proves the snapshot merge maintained
    // the index exactly and manifest-pruned serving changes nothing.
    "sim_index_snapshot" ->
      """WITH wc AS (
        |  SELECT vec_id,
        |    CASE WHEN vec_id % 17 = 3
        |         THEN list_transform(embedding::DOUBLE[], x -> -x)
        |         ELSE embedding::DOUBLE[] END AS v
        |  FROM embeddings
        |  WHERE embedding IS NOT NULL AND vec_id % 19 <> 4),
        |uc AS (SELECT vec_id, v, sqrt(ss) AS nrm,
        |        CASE WHEN ss > 0 THEN list_transform(v, x -> x * (1.0/sqrt(ss)))
        |             ELSE v END AS uv
        |      FROM (SELECT vec_id, v,
        |              list_sum(list_transform(v, x -> x*x)) AS ss FROM wc)),
        |wq AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |       WHERE vec_id % 20 = 0),
        |uq AS (SELECT vec_id, v, sqrt(ss) AS nrm,
        |        CASE WHEN ss > 0 THEN list_transform(v, x -> x * (1.0/sqrt(ss)))
        |             ELSE v END AS uv
        |      FROM (SELECT vec_id, v,
        |              list_sum(list_transform(v, x -> x*x)) AS ss FROM wq)),
        |cent AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
        |         CASE WHEN ss > 0 THEN list_transform(v, x -> x * (1.0/sqrt(ss)))
        |              ELSE v END AS c
        |  FROM (SELECT vec_id, v, list_sum(list_transform(v, x -> x*x)) AS ss
        |        FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |              WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 32))),
        |prc AS (
        |  SELECT vec_id, cid, ROW_NUMBER() OVER
        |    (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS p
        |  FROM (SELECT uc.vec_id, cent.cid,
        |          list_sum(list_transform(generate_series(1, len(uc.uv)),
        |            i -> (uc.uv[i] - cent.c[i]) * (uc.uv[i] - cent.c[i]))) AS d2
        |        FROM uc, cent)),
        |prq AS (
        |  SELECT vec_id, cid, ROW_NUMBER() OVER
        |    (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS p
        |  FROM (SELECT uq.vec_id, cent.cid,
        |          list_sum(list_transform(generate_series(1, len(uq.uv)),
        |            i -> (uq.uv[i] - cent.c[i]) * (uq.uv[i] - cent.c[i]))) AS d2
        |        FROM uq, cent)),
        |cand AS (
        |  SELECT q.vec_id AS id, d.vec_id AS neighbor_id
        |  FROM prq q JOIN prc d ON q.cid = d.cid AND d.p = 1 AND q.p <= 4),
        |sc AS (
        |  SELECT cand.id, cand.neighbor_id,
        |    CASE WHEN qa.nrm * qc.nrm = 0 THEN 0.0
        |         ELSE list_dot_product(qa.v, qc.v) / (qa.nrm * qc.nrm) END AS cos_sim
        |  FROM cand JOIN uq qa ON qa.vec_id = cand.id
        |            JOIN uc qc ON qc.vec_id = cand.neighbor_id),
        |r AS (SELECT *, ROW_NUMBER() OVER
        |        (PARTITION BY id ORDER BY cos_sim DESC, neighbor_id ASC) AS "rank" FROM sc)
        |SELECT id, neighbor_id, cos_sim, "rank" FROM r WHERE "rank" <= 10""".stripMargin,

    // FILTERED serving from the versioned index tip: the same
    // post-refresh replay with the candidate side restricted to the
    // stored shard='0' attribute (even vec_id) — pre-filter semantics
    // puts the restriction at the candidate join.
    "sim_index_filtered" ->
      """WITH wc AS (
        |  SELECT vec_id,
        |    CASE WHEN vec_id % 17 = 3
        |         THEN list_transform(embedding::DOUBLE[], x -> -x)
        |         ELSE embedding::DOUBLE[] END AS v
        |  FROM embeddings
        |  WHERE embedding IS NOT NULL AND vec_id % 19 <> 4),
        |uc AS (SELECT vec_id, v, sqrt(ss) AS nrm,
        |        CASE WHEN ss > 0 THEN list_transform(v, x -> x * (1.0/sqrt(ss)))
        |             ELSE v END AS uv
        |      FROM (SELECT vec_id, v,
        |              list_sum(list_transform(v, x -> x*x)) AS ss FROM wc)),
        |wq AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |       WHERE vec_id % 20 = 0),
        |uq AS (SELECT vec_id, v, sqrt(ss) AS nrm,
        |        CASE WHEN ss > 0 THEN list_transform(v, x -> x * (1.0/sqrt(ss)))
        |             ELSE v END AS uv
        |      FROM (SELECT vec_id, v,
        |              list_sum(list_transform(v, x -> x*x)) AS ss FROM wq)),
        |cent AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
        |         CASE WHEN ss > 0 THEN list_transform(v, x -> x * (1.0/sqrt(ss)))
        |              ELSE v END AS c
        |  FROM (SELECT vec_id, v, list_sum(list_transform(v, x -> x*x)) AS ss
        |        FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |              WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 32))),
        |prc AS (
        |  SELECT vec_id, cid, ROW_NUMBER() OVER
        |    (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS p
        |  FROM (SELECT uc.vec_id, cent.cid,
        |          list_sum(list_transform(generate_series(1, len(uc.uv)),
        |            i -> (uc.uv[i] - cent.c[i]) * (uc.uv[i] - cent.c[i]))) AS d2
        |        FROM uc, cent)),
        |prq AS (
        |  SELECT vec_id, cid, ROW_NUMBER() OVER
        |    (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS p
        |  FROM (SELECT uq.vec_id, cent.cid,
        |          list_sum(list_transform(generate_series(1, len(uq.uv)),
        |            i -> (uq.uv[i] - cent.c[i]) * (uq.uv[i] - cent.c[i]))) AS d2
        |        FROM uq, cent)),
        |cand AS (
        |  SELECT q.vec_id AS id, d.vec_id AS neighbor_id
        |  FROM prq q JOIN prc d ON q.cid = d.cid AND d.p = 1 AND q.p <= 4
        |  WHERE d.vec_id % 2 = 0),
        |sc AS (
        |  SELECT cand.id, cand.neighbor_id,
        |    CASE WHEN qa.nrm * qc.nrm = 0 THEN 0.0
        |         ELSE list_dot_product(qa.v, qc.v) / (qa.nrm * qc.nrm) END AS cos_sim
        |  FROM cand JOIN uq qa ON qa.vec_id = cand.id
        |            JOIN uc qc ON qc.vec_id = cand.neighbor_id),
        |r AS (SELECT *, ROW_NUMBER() OVER
        |        (PARTITION BY id ORDER BY cos_sim DESC, neighbor_id ASC) AS "rank" FROM sc)
        |SELECT id, neighbor_id, cos_sim, "rank" FROM r WHERE "rank" <= 10""".stripMargin,

    // INT8-store IVF serving: sim_ivf's serve path with the DATA side
    // replaced by int8 reconstruction — quantize (emb_quantize's
    // round/clamp arithmetic), reconstruct q·q_scale, then the
    // identical assignment/probe/rescore pipeline. The codebook stays
    // derived from the ORIGINAL fp32 vectors (train-on-fp32,
    // serve-from-int8 — the production shape).
    "sim_ivf_int8" ->
      """WITH q0 AS (SELECT vec_id, embedding::DOUBLE[] AS v0 FROM embeddings
        |            WHERE embedding IS NOT NULL),
        |qs AS (SELECT vec_id, v0,
        |         COALESCE(list_aggregate(list_transform(v0, x -> abs(x)), 'max'), 0.0)
        |           / 127.0 AS q_scale
        |       FROM q0),
        |w AS (SELECT vec_id, list_transform(v0, x ->
        |        (CASE WHEN q_scale = 0.0 THEN 0.0
        |              ELSE least(greatest(round(x / q_scale), -127.0), 127.0) END)
        |          * q_scale) AS v
        |      FROM qs),
        |n AS (SELECT vec_id, v, list_sum(list_transform(v, x -> x*x)) AS ss FROM w),
        |u AS (SELECT vec_id, v, sqrt(ss) AS nrm,
        |        CASE WHEN ss > 0 THEN list_transform(v, x -> x * (1.0/sqrt(ss)))
        |             ELSE v END AS uv
        |      FROM n),
        |cent AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
        |         CASE WHEN ss > 0 THEN list_transform(v, x -> x * (1.0/sqrt(ss)))
        |              ELSE v END AS c
        |  FROM (SELECT vec_id, v, list_sum(list_transform(v, x -> x*x)) AS ss
        |        FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |              WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 32))),
        |asg AS (
        |  SELECT u.vec_id, cent.cid,
        |    list_sum(list_transform(generate_series(1, len(u.uv)),
        |      i -> (u.uv[i] - cent.c[i]) * (u.uv[i] - cent.c[i]))) AS d2
        |  FROM u, cent),
        |pr AS (SELECT vec_id, cid, ROW_NUMBER() OVER
        |         (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS p FROM asg),
        |cand AS (
        |  SELECT q.vec_id AS id, d.vec_id AS neighbor_id
        |  FROM pr q JOIN pr d ON q.cid = d.cid AND d.p = 1 AND q.p <= 4
        |   AND q.vec_id <> d.vec_id),
        |sc AS (
        |  SELECT cand.id, cand.neighbor_id,
        |    CASE WHEN qa.nrm * qc.nrm = 0 THEN 0.0
        |         ELSE list_dot_product(qa.v, qc.v) / (qa.nrm * qc.nrm) END AS cos_sim
        |  FROM cand JOIN u qa ON qa.vec_id = cand.id
        |            JOIN u qc ON qc.vec_id = cand.neighbor_id),
        |r AS (SELECT *, ROW_NUMBER() OVER
        |        (PARTITION BY id ORDER BY cos_sim DESC, neighbor_id ASC) AS "rank" FROM sc)
        |SELECT id, neighbor_id, cos_sim, "rank" FROM r WHERE "rank" <= 10""".stripMargin,

    // IVF-PQ: the sim_ivf skeleton (pinned 32-anchor coarse cells,
    // 4-cell probe) plus product quantization — a pinned 16-anchor
    // codebook cut into 8 subspaces; per-subspace argmin encoding
    // (ordered Σdiff² folds, ties → lowest pid), decode to the
    // reconstructed vector, and flat-fold ADC distance — each step
    // the exact arithmetic of PqEncode/PqDecode/VecSqDist.
    "sim_pq" ->
      """WITH w AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, list_sum(list_transform(v, x -> x*x)) AS ss FROM w),
        |u AS (SELECT vec_id, v,
        |        CASE WHEN ss > 0 THEN list_transform(v, x -> x * (1.0/sqrt(ss)))
        |             ELSE v END AS uv
        |      FROM n),
        |cent AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
        |         CASE WHEN ss > 0 THEN list_transform(v, x -> x * (1.0/sqrt(ss)))
        |              ELSE v END AS c
        |  FROM (SELECT vec_id, v, list_sum(list_transform(v, x -> x*x)) AS ss
        |        FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |              WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 32))),
        |panch AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS pid,
        |         CASE WHEN ss > 0 THEN list_transform(v, x -> x * (1.0/sqrt(ss)))
        |              ELSE v END AS c
        |  FROM (SELECT vec_id, v, list_sum(list_transform(v, x -> x*x)) AS ss
        |        FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |              WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 16))),
        |asg AS (
        |  SELECT u.vec_id, cent.cid,
        |    list_sum(list_transform(generate_series(1, len(u.uv)),
        |      i -> (u.uv[i] - cent.c[i]) * (u.uv[i] - cent.c[i]))) AS d2
        |  FROM u, cent),
        |pr AS (SELECT vec_id, cid, ROW_NUMBER() OVER
        |         (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS p FROM asg),
        |enc0 AS (
        |  SELECT u.vec_id, sp.s, panch.pid,
        |    list_sum(list_transform(generate_series(1, 8),
        |      j -> (u.uv[sp.s*8 + j] - panch.c[sp.s*8 + j])
        |         * (u.uv[sp.s*8 + j] - panch.c[sp.s*8 + j]))) AS d2
        |  FROM u, generate_series(0, 7) AS sp(s), panch),
        |enc1 AS (SELECT vec_id, s, pid, ROW_NUMBER() OVER
        |           (PARTITION BY vec_id, s ORDER BY d2 ASC, pid ASC) AS rn FROM enc0),
        |codes AS (SELECT vec_id, list(pid ORDER BY s) AS code
        |          FROM enc1 WHERE rn = 1 GROUP BY vec_id),
        |rv AS (
        |  SELECT codes.vec_id,
        |    list_transform(generate_series(1, 64),
        |      i -> cbl.cb[codes.code[((i-1)//8)+1] + 1][i]) AS rv
        |  FROM codes, (SELECT list(c ORDER BY pid) AS cb FROM panch) cbl),
        |cand AS (
        |  SELECT q.vec_id AS id, d.vec_id AS neighbor_id
        |  FROM pr q JOIN pr d ON q.cid = d.cid AND d.p = 1 AND q.p <= 4
        |   AND q.vec_id <> d.vec_id),
        |adc AS (
        |  SELECT cand.id, cand.neighbor_id,
        |    list_sum(list_transform(generate_series(1, 64),
        |      i -> (qu.uv[i] - rv.rv[i]) * (qu.uv[i] - rv.rv[i]))) AS adc_dist
        |  FROM cand JOIN u qu ON qu.vec_id = cand.id
        |            JOIN rv ON rv.vec_id = cand.neighbor_id),
        |r AS (SELECT *, ROW_NUMBER() OVER
        |        (PARTITION BY id ORDER BY adc_dist ASC, neighbor_id ASC) AS "rank" FROM adc)
        |SELECT id, neighbor_id, adc_dist, "rank" FROM r WHERE "rank" <= 10""".stripMargin,

    // SemDeDup: same pinned codebook + assignment as sim_ivf; a row
    // is dropped when a strictly-lower-id same-cell neighbor sits at
    // cosine >= 0.4.
    "semdedup" ->
      """WITH w AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, list_sum(list_transform(v, x -> x*x)) AS ss FROM w),
        |u AS (SELECT vec_id, v, sqrt(ss) AS nrm,
        |        CASE WHEN ss > 0 THEN list_transform(v, x -> x * (1.0/sqrt(ss)))
        |             ELSE v END AS uv
        |      FROM n),
        |cent AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
        |         CASE WHEN ss > 0 THEN list_transform(v, x -> x * (1.0/sqrt(ss)))
        |              ELSE v END AS c
        |  FROM (SELECT vec_id, v, list_sum(list_transform(v, x -> x*x)) AS ss
        |        FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |              WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 32))),
        |asg AS (
        |  SELECT u.vec_id, cent.cid,
        |    list_sum(list_transform(generate_series(1, len(u.uv)),
        |      i -> (u.uv[i] - cent.c[i]) * (u.uv[i] - cent.c[i]))) AS d2
        |  FROM u, cent),
        |cell AS (SELECT vec_id, cid AS cell FROM
        |           (SELECT vec_id, cid, ROW_NUMBER() OVER
        |              (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS p FROM asg)
        |         WHERE p = 1),
        |dropped AS (
        |  SELECT DISTINCT a.vec_id AS id
        |  FROM cell a JOIN cell b ON a.cell = b.cell AND a.vec_id > b.vec_id
        |  JOIN u ua ON ua.vec_id = a.vec_id
        |  JOIN u ub ON ub.vec_id = b.vec_id
        |  WHERE (CASE WHEN ua.nrm * ub.nrm = 0 THEN 0.0
        |              ELSE list_dot_product(ua.v, ub.v) / (ua.nrm * ub.nrm) END) >= 0.4)
        |SELECT c.vec_id AS id, c.cell, (d.id IS NULL) AS kept
        |FROM cell c LEFT JOIN dropped d ON d.id = c.vec_id""".stripMargin,

    // duplicate 5-gram coverage: positional n-gram instances vs the
    // >=2-doc n-gram set (word-string n-grams mirror the Spark side's
    // concat_ws(' ', slice(toks, i, 5)) instance-for-instance)
    "dup_ngram_coverage" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(lower(text))) = 0 THEN []
        |         ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS toks
        |  FROM documents),
        |base AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) >= 5
        |         THEN list_transform(generate_series(1, len(toks) - 4),
        |                i -> array_to_string(toks[i : i + 4], ' '))
        |         ELSE [] END AS ngrams
        |  FROM tok),
        |inst AS (SELECT doc_id, s.s FROM base, LATERAL unnest(ngrams) AS s(s)),
        |dfreq AS (SELECT s FROM (SELECT DISTINCT doc_id, s FROM inst)
        |          GROUP BY s HAVING COUNT(*) >= 2),
        |dup AS (SELECT doc_id, COUNT(*) AS n_dup FROM inst JOIN dfreq USING (s)
        |        GROUP BY doc_id)
        |SELECT b.doc_id, CAST(len(b.ngrams) AS BIGINT) AS n_ngrams,
        |  CAST(COALESCE(d.n_dup, 0) AS BIGINT) AS n_dup,
        |  CASE WHEN len(b.ngrams) = 0 THEN 0.0
        |       ELSE CAST(COALESCE(d.n_dup, 0) AS DOUBLE) / len(b.ngrams) END AS dup_frac
        |FROM base b LEFT JOIN dup d USING (doc_id)""".stripMargin,

    // lexical familiarity: instance-weighted mean token df + OOV rate
    // vs the corpus' own vocabulary (OOV = token df < 3)
    "text_familiarity" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(lower(text))) = 0 THEN []
        |         ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS toks
        |  FROM documents),
        |inst AS (SELECT doc_id, t.t AS token FROM tok, LATERAL unnest(toks) AS t(t)),
        |dfreq AS (SELECT token, COUNT(*) AS doc_freq
        |          FROM (SELECT DISTINCT doc_id, token FROM inst) GROUP BY token),
        |agg AS (SELECT doc_id, COUNT(*) AS n_tokens,
        |               CAST(SUM(doc_freq) AS BIGINT) AS sum_df,
        |               CAST(SUM(CASE WHEN doc_freq < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
        |        FROM inst JOIN dfreq USING (token) GROUP BY doc_id)
        |SELECT t.doc_id, CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
        |  CASE WHEN COALESCE(a.n_tokens, 0) = 0 THEN 0.0
        |       ELSE CAST(a.sum_df AS DOUBLE) / a.n_tokens END AS mean_df,
        |  CASE WHEN COALESCE(a.n_tokens, 0) = 0 THEN 0.0
        |       ELSE CAST(a.n_oov AS DOUBLE) / a.n_tokens END AS oov_frac
        |FROM tok t LEFT JOIN agg a USING (doc_id)""".stripMargin,

    // Stubbed codec is md5-derived, so the multimodal metadata path
    // has a full oracle despite the fake decode.
    "multimodal_meta" ->
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  'raw' AS fmt,
        |  CAST(n_chars % 640 + 1 AS INT) AS width,
        |  CAST(n_chars % 480 + 1 AS INT) AS height,
        |  md5(text) AS fp
        |FROM documents""".stripMargin,

    // resize replay: image rows re-encode via the deterministic stub
    // (md5hex(payload) || ':64x48' as bytes — 38 ASCII chars), with
    // dims/byte-count/fingerprint recomputed; non-images untouched
    "multimodal_resize" ->
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CASE WHEN doc_id % 3 = 0 THEN 64
        |       ELSE CAST(n_chars % 640 + 1 AS INT) END AS width,
        |  CASE WHEN doc_id % 3 = 0 THEN 48
        |       ELSE CAST(n_chars % 480 + 1 AS INT) END AS height,
        |  CASE WHEN doc_id % 3 = 0 THEN CAST(38 AS BIGINT)
        |       ELSE CAST(octet_length(encode(text)) AS BIGINT) END AS n_bytes,
        |  CASE WHEN doc_id % 3 = 0 THEN md5(md5(text) || ':64x48')
        |       ELSE md5(text) END AS fp
        |FROM documents""".stripMargin,

    // frame-sampling fan-out replay: videos (doc_id%3==2) yield
    // ceil(duration/1000) frames (duration = n_chars*10 from the
    // synthetic metadata), chunk = max(1, byte_len div n), last chunk
    // truncated — the executor-side fan-out arithmetic as SQL
    // REAL javax.sound audio loop: the constant-amplitude WAV each doc
    // encodes decodes back to duration = samples/8 ms exactly and
    // per-window RMS = the 16-bit-quantized amplitude, so the whole
    // encode→decode→feature path is integer-replayable — rms_q =
    // round(rms·32768) ≡ round(amp·32767), first and last window alike
    "multimodal_audio" ->
      """SELECT doc_id, 'wav' AS fmt, 8000 AS sample_rate, 1 AS channels,
        |  (n_chars % 100) + 2 AS duration_ms,
        |  CAST(ROUND((((doc_id % 9) + 1) / 10.0) * 32767) AS BIGINT) AS rms_q_first,
        |  CAST(ROUND((((doc_id % 9) + 1) / 10.0) * 32767) AS BIGINT) AS rms_q_last
        |FROM documents WHERE doc_id % 5 = 0""".stripMargin,

    // REAL MJPEG-AVI video loop: every rendered solid-gray frame
    // (level ((doc_id+i)%8)·32) survives the JPEG roundtrip within
    // ≪ half a 32-level grid step, the RIFF header reports
    // width/height/frame-count exactly, and duration is
    // n_frames·250 ms at 4 fps — so the whole render→encode→decode
    // path is integer-replayable: luma_q = round(luma·255/32) ≡
    // (doc_id+i) % 8, first and last frame alike
    "multimodal_video" ->
      """SELECT doc_id, 'avi/mjpg' AS fmt, 48 AS width, 32 AS height,
        |  CAST((n_chars % 5) + 2 AS INTEGER) AS n_frames,
        |  CAST(((n_chars % 5) + 2) * 250 AS BIGINT) AS duration_ms,
        |  CAST(doc_id % 8 AS BIGINT) AS luma_q_first,
        |  CAST((doc_id + (n_chars % 5) + 1) % 8 AS BIGINT) AS luma_q_last
        |FROM documents WHERE doc_id % 7 = 0""".stripMargin,

    "multimodal_frames" ->
      """WITH v AS (
        |  SELECT doc_id, octet_length(encode(text)) AS len,
        |    GREATEST(1, CAST(ceil((n_chars * 10) / 1000.0) AS BIGINT)) AS n
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (
        |  SELECT doc_id, len, n, GREATEST(1, len // n) AS chunk, t.i
        |  FROM v, LATERAL unnest(generate_series(0, n - 1)) AS t(i))
        |SELECT doc_id AS media_id, CAST(i AS INT) AS frame_idx,
        |  CAST(i * 1000 AS BIGINT) AS ts_ms,
        |  CAST(LEAST(LEAST(i * chunk, len) + chunk, len)
        |    - LEAST(i * chunk, len) AS BIGINT) AS n_bytes
        |FROM f""".stripMargin,

    "text_tokens" ->
      s"""SELECT doc_id,
         |CAST(len($wsTokensSql) AS BIGINT) AS n_ws_tokens,
         |CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,
         |CAST(length(text) AS BIGINT) AS n_chars_len
         |FROM documents""".stripMargin,

    "text_quality" ->
      s"""WITH q AS (
         |  SELECT doc_id,
         |    CAST(len($wsTokensSql) AS BIGINT) AS n_tokens,
         |    CAST(${stopCount(TextAnalysisCols.EnStop)} AS BIGINT) AS n_stop,
         |    CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct,
         |    length(text) AS n_chars
         |  FROM documents)
         |SELECT doc_id, n_tokens, n_stop, n_punct,
         |  CASE WHEN n_tokens = 0 THEN 0.0 ELSE CAST(n_stop AS DOUBLE) / n_tokens END AS stop_ratio,
         |  CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(n_punct AS DOUBLE) / n_chars END AS punct_ratio,
         |  (CASE WHEN n_tokens = 0 THEN 0.0 ELSE CAST(n_stop AS DOUBLE) / n_tokens END) * 0.5
         |    + (1.0 - CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(n_punct AS DOUBLE) / n_chars END) * 0.5 AS quality_score
         |FROM q""".stripMargin,

    // BPE encode with the pinned merge table: words = whitespace
    // tokens of the lowercased text (Java trim vs space-only trim
    // nets out: the extra empty tokens encode to zero symbols),
    // initial symbols = code points ('.' in RE2 = one code point,
    // matching codePointSymbols), then one replace() per merge in
    // rank order over sentinel-wrapped strings (bpeReplaySql).
    // ASSUMES control-char-free text: \x01/\x02 collide with the
    // sentinels, and \x0B splits under Java \s but not RE2 \s —
    // documents containing [\x00-\x08\x0B] would diverge the two
    // engines (not present in the corpus; pre-strip both sides if
    // ingesting such data)
    "bpe_tokens" ->
      s"""SELECT doc_id,
         |  CAST(COALESCE(list_sum(list_transform(
         |    list_transform(regexp_split_to_array(trim(lower(text)), '\\s+'),
         |      w -> ${bpeReplaySql(
                "array_to_string(list_transform(regexp_extract_all(w, '.')," +
                  " c -> chr(1)||c||chr(2)), '')")}),
         |    s -> length(s) - length(replace(s, chr(1), '')))), 0) AS BIGINT)
         |    AS n_subwords
         |FROM documents""".stripMargin,

    // exact substring dedup: repeated 8-token windows, canonical =
    // min (doc_id, pos); md5 of the space-joined window matches the
    // native kernel byte-for-byte; positions 0-based on both engines
    "dedup_substrings" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN []
        |         ELSE regexp_split_to_array(trim(text), '\s+') END AS t
        |  FROM documents),
        |win AS (
        |  SELECT doc_id, r.i - 1 AS p,
        |    md5(array_to_string(list_slice(t, r.i, r.i + 7), ' ')) AS h
        |  FROM toks, LATERAL unnest(range(1, len(t) - 8 + 2)) AS r(i)),
        |marked AS (
        |  SELECT doc_id, p,
        |    COUNT(*) OVER (PARTITION BY h) AS n,
        |    ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, p) AS rn
        |  FROM win),
        |covered AS (
        |  SELECT DISTINCT doc_id, p + r.j AS cp
        |  FROM marked, LATERAL unnest(range(0, 8)) AS r(j)
        |  WHERE n > 1 AND rn > 1),
        |tokens AS (
        |  SELECT doc_id, r.i - 1 AS pos, t[r.i] AS tok
        |  FROM toks, LATERAL unnest(range(1, len(t) + 1)) AS r(i)),
        |kept AS (
        |  SELECT tk.doc_id, string_agg(tk.tok, ' ' ORDER BY tk.pos) AS text_dedup
        |  FROM tokens tk
        |  LEFT JOIN covered c ON c.doc_id = tk.doc_id AND c.cp = tk.pos
        |  WHERE c.cp IS NULL
        |  GROUP BY tk.doc_id),
        |cov_n AS (SELECT doc_id, COUNT(*) AS n_removed FROM covered GROUP BY 1)
        |SELECT t.doc_id,
        |  CAST(len(t.t) AS INT) AS n_tokens,
        |  CAST(COALESCE(cn.n_removed, 0) AS INT) AS n_removed,
        |  COALESCE(k.text_dedup, '') AS text_dedup
        |FROM toks t
        |LEFT JOIN cov_n cn ON cn.doc_id = t.doc_id
        |LEFT JOIN kept k ON k.doc_id = t.doc_id""".stripMargin,

    // composed v4: entropy gate -> corpus-LM ppl gate -> A-ES sample
    // (composes the text_entropy, lm_perplexity and sample_weighted
    // oracles; gates compare the same 6dp-rounded values both engines
    // compute)
    "pipeline_docs_v4" ->
      """WITH c AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
        |f AS (SELECT doc_id, ch, COUNT(*) AS cnt FROM c GROUP BY 1, 2),
        |t AS (SELECT doc_id, SUM(cnt) AS n, COUNT(*) AS dst FROM f GROUP BY 1),
        |ent AS (
        |  SELECT f.doc_id,
        |    ROUND(0.0 - SUM((CAST(f.cnt AS DOUBLE) / t.n) * LOG2(CAST(f.cnt AS DOUBLE) / t.n)), 6) AS char_entropy,
        |    ROUND((0.0 - SUM((CAST(f.cnt AS DOUBLE) / t.n) * LOG2(CAST(f.cnt AS DOUBLE) / t.n))) / LOG2(CAST(MAX(t.dst) AS DOUBLE)), 6) AS entropy_ratio
        |  FROM f JOIN t USING (doc_id) GROUP BY f.doc_id),
        |gated AS (
        |  SELECT d.doc_id, d.source, d.n_chars, e.char_entropy
        |  FROM documents d JOIN ent e USING (doc_id)
        |  WHERE e.entropy_ratio >= 0.87),
        |toks AS (
        |  SELECT doc_id,
        |    CASE WHEN text IS NULL OR length(trim(lower(text))) = 0 THEN []
        |         ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS t
        |  FROM documents),
        |uni AS (
        |  SELECT w, COUNT(*) AS cnt
        |  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1),
        |v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM uni),
        |pairs AS (
        |  SELECT doc_id, t[r.i] AS w1, t[r.i + 1] AS w2
        |  FROM toks, LATERAL unnest(range(1, len(t))) AS r(i)),
        |big AS (
        |  SELECT w1, w2, COUNT(*) AS cnt FROM pairs
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |sc AS (
        |  SELECT p.doc_id,
        |    LN((COALESCE(b.cnt, 0) + 0.5) / (COALESCE(u.cnt, 0) + 0.5 * v.v)) AS lp
        |  FROM pairs p
        |  LEFT JOIN big b ON b.w1 = p.w1 AND b.w2 = p.w2
        |  LEFT JOIN uni u ON u.w = p.w1
        |  CROSS JOIN v),
        |ppl AS (
        |  SELECT doc_id,
        |    ROUND(POW(2.0, (0.0 - SUM(lp)) / (COUNT(*) * LN(2.0))), 6) AS ppl
        |  FROM sc GROUP BY 1),
        |kept AS (
        |  SELECT g.doc_id, g.source, g.n_chars, g.char_entropy, p.ppl
        |  FROM gated g JOIN ppl p USING (doc_id)
        |  WHERE p.ppl <= 31.0)
        |SELECT doc_id, source, n_chars, char_entropy, ppl FROM (
        |  SELECT *,
        |    POW((CAST('0x' || substr(md5('v4' || CAST(doc_id AS VARCHAR)), 1, 13) AS BIGINT) + 1.0)
        |        / POW(16.0, 13.0), 1.0 / n_chars) AS k
        |  FROM kept)
        |ORDER BY k DESC, doc_id LIMIT 100""".stripMargin,

    // CCNet-shaped bigram-LM scoring: add-0.5 smoothing, V = distinct
    // unigrams, bigram model pruned at cnt>=2; LN/POW rounded 6dp on
    // both engines (summation-order ulps)
    "lm_perplexity" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CASE WHEN text IS NULL OR length(trim(lower(text))) = 0 THEN []
        |         ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS t
        |  FROM documents),
        |uni AS (
        |  SELECT w, COUNT(*) AS cnt
        |  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1),
        |v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM uni),
        |pairs AS (
        |  SELECT doc_id, t[r.i] AS w1, t[r.i + 1] AS w2
        |  FROM toks, LATERAL unnest(range(1, len(t))) AS r(i)),
        |big AS (
        |  SELECT w1, w2, COUNT(*) AS cnt FROM pairs
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |sc AS (
        |  SELECT p.doc_id,
        |    LN((COALESCE(b.cnt, 0) + 0.5) / (COALESCE(u.cnt, 0) + 0.5 * v.v)) AS lp
        |  FROM pairs p
        |  LEFT JOIN big b ON b.w1 = p.w1 AND b.w2 = p.w2
        |  LEFT JOIN uni u ON u.w = p.w1
        |  CROSS JOIN v)
        |SELECT doc_id,
        |  COUNT(*) AS n_bigrams,
        |  ROUND((0.0 - SUM(lp)) / (COUNT(*) * LN(2.0)), 6) AS bits_per_token,
        |  ROUND(POW(2.0, (0.0 - SUM(lp)) / (COUNT(*) * LN(2.0))), 6) AS ppl
        |FROM sc GROUP BY 1""".stripMargin,

    // char entropy: exact counts, one LOG2 per distinct char; both
    // sides round half-away at 6dp so summation-order ulps can't
    // break the hash; 0.0 - SUM(...) keeps the single-char case +0.0
    "text_entropy" ->
      """WITH c AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
        |f AS (SELECT doc_id, ch, COUNT(*) AS cnt FROM c GROUP BY 1, 2),
        |t AS (SELECT doc_id, SUM(cnt) AS n, COUNT(*) AS dst FROM f GROUP BY 1)
        |SELECT f.doc_id,
        |  CAST(MAX(t.n) AS INT) AS n_codepoints,
        |  CAST(MAX(t.dst) AS INT) AS n_distinct_chars,
        |  ROUND(0.0 - SUM((CAST(f.cnt AS DOUBLE) / t.n) * LOG2(CAST(f.cnt AS DOUBLE) / t.n)), 6) AS char_entropy,
        |  ROUND(CASE WHEN MAX(t.dst) > 1
        |    THEN (0.0 - SUM((CAST(f.cnt AS DOUBLE) / t.n) * LOG2(CAST(f.cnt AS DOUBLE) / t.n))) / LOG2(CAST(MAX(t.dst) AS DOUBLE))
        |    ELSE 0.0 END, 6) AS entropy_ratio
        |FROM f JOIN t USING (doc_id)
        |GROUP BY f.doc_id""".stripMargin,

    "split_assign" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 100 AS bucket
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    CASE WHEN bucket < 80 THEN 'train'
        |         WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
        |  FROM b)
        |SELECT split, COUNT(*) AS n, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        |FROM s GROUP BY split""".stripMargin,

    "text_repetition" -> {
      val lowToks =
        """CASE WHEN length(trim(lower(text))) = 0 THEN [] ELSE regexp_split_to_array(trim(lower(text)), '\s+') END"""
      s"""SELECT doc_id,
         |CAST(len($lowToks) AS BIGINT) AS n_tokens,
         |CAST(len(list_distinct($lowToks)) AS BIGINT) AS n_distinct_tokens,
         |CASE WHEN len($lowToks) = 0 THEN 0.0
         |     ELSE 1.0 - CAST(len(list_distinct($lowToks)) AS DOUBLE) / len($lowToks) END
         |  AS repetition_ratio
         |FROM documents""".stripMargin
    },

    "text_langid" ->
      s"SELECT doc_id, $langCaseSql AS lang_pred FROM documents",

    // the composed training-data-prep pipeline: language filter →
    // quality filter → exact dedup (min id) → ngram near-dup removal
    "pipeline_docs" ->
      s"""WITH q AS (
         |  SELECT doc_id, text,
         |    CAST(len($wsTokensSql) AS BIGINT) AS n_tokens,
         |    CAST(${stopCount(TextAnalysisCols.EnStop)} AS BIGINT) AS n_stop,
         |    CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct,
         |    length(text) AS n_chars,
         |    $langCaseSql AS lang_pred
         |  FROM documents),
         |scored AS (
         |  SELECT *,
         |    (CASE WHEN n_tokens = 0 THEN 0.0 ELSE CAST(n_stop AS DOUBLE) / n_tokens END) * 0.5
         |      + (1.0 - CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(n_punct AS DOUBLE) / n_chars END) * 0.5 AS quality_score
         |  FROM q),
         |f AS (SELECT * FROM scored WHERE lang_pred = 'en' AND quality_score >= 0.51),
         |keep AS (SELECT MIN(doc_id) AS doc_id FROM f GROUP BY text),
         |kept AS (SELECT f.* FROM f JOIN keep USING (doc_id)),
         |tok AS (
         |  SELECT doc_id,
         |    CASE WHEN length(trim(lower(text))) = 0 THEN []
         |         ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS toks
         |  FROM kept),
         |sh AS (
         |  SELECT DISTINCT doc_id, array_to_string(toks[i.i : i.i + 2], ' ') AS shingle
         |  FROM tok, LATERAL unnest(range(1, len(toks) - 1)) AS i(i)
         |  WHERE len(toks) >= 3),
         |sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |dup AS (
         |  SELECT DISTINCT i.doc_b AS doc_id
         |  FROM inter i
         |  JOIN sizes sa ON i.doc_a = sa.doc_id
         |  JOIN sizes sb ON i.doc_b = sb.doc_id
         |  WHERE CAST(i.inter AS DOUBLE) / (sa.set_size + sb.set_size - i.inter) >= 0.8)
         |SELECT doc_id, lang_pred, quality_score, n_tokens FROM kept
         |WHERE doc_id NOT IN (SELECT doc_id FROM dup)""".stripMargin,

    // round-3 flagship: filter → exact dedup → CLUSTER-canonical
    // near-dedup (recursive closure) → hash split → sequence packing
    "pipeline_docs_v2" ->
      s"""WITH RECURSIVE q AS (
         |  SELECT doc_id, text,
         |    CAST(len($wsTokensSql) AS BIGINT) AS n_tokens,
         |    CAST(${stopCount(TextAnalysisCols.EnStop)} AS BIGINT) AS n_stop,
         |    CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct,
         |    length(text) AS n_chars,
         |    $langCaseSql AS lang_pred
         |  FROM documents),
         |scored AS (
         |  SELECT *,
         |    (CASE WHEN n_tokens = 0 THEN 0.0 ELSE CAST(n_stop AS DOUBLE) / n_tokens END) * 0.5
         |      + (1.0 - CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(n_punct AS DOUBLE) / n_chars END) * 0.5 AS quality_score
         |  FROM q),
         |f AS (SELECT * FROM scored WHERE lang_pred = 'en' AND quality_score >= 0.51),
         |keep AS (SELECT MIN(doc_id) AS doc_id FROM f GROUP BY text),
         |kept AS (SELECT f.* FROM f JOIN keep USING (doc_id)),
         |tok AS (
         |  SELECT doc_id,
         |    CASE WHEN length(trim(lower(text))) = 0 THEN []
         |         ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS toks
         |  FROM kept),
         |sh AS (
         |  SELECT DISTINCT doc_id, array_to_string(toks[i.i : i.i + 2], ' ') AS shingle
         |  FROM tok, LATERAL unnest(range(1, len(toks) - 1)) AS i(i)
         |  WHERE len(toks) >= 3),
         |sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |jp AS (
         |  SELECT i.doc_a, i.doc_b
         |  FROM inter i
         |  JOIN sizes sa ON i.doc_a = sa.doc_id
         |  JOIN sizes sb ON i.doc_b = sb.doc_id
         |  WHERE CAST(i.inter AS DOUBLE) / (sa.set_size + sb.set_size - i.inter) >= 0.8),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM jp
         |  UNION ALL SELECT doc_b, doc_a FROM jp),
         |walk(src, reach) AS (
         |  SELECT DISTINCT src, src FROM edges
         |  UNION
         |  SELECT w.src, e.dst FROM walk w JOIN edges e ON w.reach = e.src),
         |noncanon AS (
         |  SELECT src AS doc_id FROM walk GROUP BY src HAVING MIN(reach) <> src),
         |ded AS (
         |  SELECT doc_id, n_tokens FROM kept
         |  WHERE doc_id NOT IN (SELECT doc_id FROM noncanon)),
         |sp AS (
         |  SELECT doc_id, n_tokens,
         |    CASE WHEN bucket < 80 THEN 'train'
         |         WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
         |  FROM (SELECT *,
         |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 100 AS bucket
         |    FROM ded)),
         |c AS (
         |  SELECT split, doc_id, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY split ORDER BY doc_id) AS cum
         |  FROM sp)
         |SELECT split, CAST(FLOOR((cum - n_tokens) / 2048) AS BIGINT) AS seq_id,
         |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
         |FROM c GROUP BY 1, 2""".stripMargin,

    "text_fingerprint" -> {
      val lowTokens =
        """CASE WHEN length(trim(lower(text))) = 0 THEN [] ELSE regexp_split_to_array(trim(lower(text)), '\s+') END"""
      s"""SELECT doc_id, md5(text) AS fp_exact,
         |md5(array_to_string(list_sort($lowTokens), ' ')) AS fp_norm
         |FROM documents""".stripMargin
    },

    // deterministic stratified sampling: md5-bucket filter at 1/10000
    // resolution, per-language fractions (en 0.5, und 0.25, else 1.0)
    "sample_stratified" ->
      s"""WITH l AS (
         |  SELECT doc_id, $langCaseSql AS lang_pred,
         |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 10000 AS bucket
         |  FROM documents)
         |SELECT doc_id, lang_pred FROM l
         |WHERE bucket < (CASE WHEN lang_pred = 'en' THEN 0.5
         |                     WHEN lang_pred = 'und' THEN 0.25
         |                     ELSE 1.0 END) * 10000""".stripMargin,

    // token-budget sequence packing: exclusive running token sum per
    // hash shard, sequence id = floor(cumsum_before / 2048)
    "pack_sequences" ->
      s"""WITH d AS (
         |  SELECT doc_id, CAST(len($wsTokensSql) AS BIGINT) AS n_tokens,
         |    (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 100) % 8 AS shard
         |  FROM documents),
         |c AS (
         |  SELECT shard, doc_id, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
         |  FROM d)
         |SELECT shard, CAST(FLOOR((cum - n_tokens) / 2048) AS BIGINT) AS seq_id,
         |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
         |FROM c GROUP BY 1, 2""".stripMargin,

    // PII redaction over synthetically decorated text: same regexes
    // (Java/RE2-shared subset), same replace order (email, ip, phone)
    "text_redact" -> {
      val decorated =
        """text || ' contact user' || CAST(doc_id AS VARCHAR) ||
          |'@example.com or +1 555 010 ' || CAST(doc_id AS VARCHAR) ||
          |' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'""".stripMargin
      val email = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
      val ip = """\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"""
      val phone = """\+?[0-9][0-9()\- ]{6,}[0-9]"""
      s"""WITH d AS (SELECT doc_id, $decorated AS t FROM documents),
         |r AS (SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(t,
         |    '$email', '<PII>', 'g'),
         |    '$ip', '<PII>', 'g'),
         |    '$phone', '<PII>', 'g') AS redacted
         |  FROM d)
         |SELECT doc_id, redacted,
         |  CAST((length(redacted) - length(replace(redacted, '<PII>', ''))) / 5 AS BIGINT) AS n_pii
         |FROM r""".stripMargin
    },

    // context-window chunking: 500-char windows, step 400, >= 1 chunk
    "text_chunks" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |    GREATEST(CAST(CEIL((length(text) - 100) / 400.0) AS BIGINT), 1) AS n
        |  FROM documents)
        |SELECT doc_id, i.i AS chunk_id,
        |  substr(text, CAST(i.i * 400 + 1 AS INT), 500) AS chunk_text
        |FROM d, LATERAL unnest(range(0, n)) AS i(i)""".stripMargin,

    // vocabulary by document frequency over lowercased ws tokens
    "vocab_df" ->
      """WITH tk AS (
        |  SELECT DISTINCT doc_id, t.t AS token
        |  FROM (SELECT doc_id,
        |          CASE WHEN length(trim(lower(text))) = 0 THEN []
        |               ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS toks
        |        FROM documents), LATERAL unnest(toks) AS t(t))
        |SELECT token, COUNT(*) AS doc_freq FROM tk
        |GROUP BY token HAVING COUNT(*) >= 3""".stripMargin,

    // BM25 (rational log-free idf; k1=1.2, b=0.75): contributions
    // mirror the Spark arithmetic parenthesis-for-parenthesis; the
    // per-doc score folds term-ordered contributions left-to-right
    // (list_dot_product with ones ≡ Spark aggregate() fold)
    "search_bm25" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(lower(text))) = 0 THEN []
        |         ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS toks
        |  FROM documents),
        |base AS (SELECT doc_id, len(toks) AS dl, toks FROM tok),
        |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
        |                 CAST(SUM(dl) AS DOUBLE) AS sum_dl FROM base),
        |hits AS (
        |  SELECT doc_id, dl, term,
        |    CAST(len(list_filter(toks, x -> x = term)) AS DOUBLE) AS tf
        |  FROM base, (SELECT unnest(['spark', 'hash', 'window']) AS term) q
        |  WHERE len(list_filter(toks, x -> x = term)) > 0),
        |dfs AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM hits GROUP BY term),
        |contrib AS (
        |  SELECT h.doc_id, h.term,
        |    (((s.n_docs - d.df + 0.5) / (d.df + 0.5)) *
        |      ((h.tf * (1.2 + 1.0)) /
        |        (h.tf + 1.2 * ((1.0 - 0.75) + 0.75 * (h.dl / (s.sum_dl / s.n_docs)))))) AS c
        |  FROM hits h JOIN dfs d USING (term), stats s),
        |scored AS (
        |  SELECT doc_id,
        |    list_dot_product(list(c ORDER BY term),
        |                     list_transform(list(c ORDER BY term), x -> 1.0)) AS score
        |  FROM contrib GROUP BY doc_id),
        |top AS (SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT 20)
        |SELECT doc_id, score,
        |  CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
        |FROM top""".stripMargin,

    // SCD2 attribute history: same two-window construction — changes
    // filtered by null-safe lag inequality, then lead/row_number over
    // the filtered runs, event_id breaking ts ties
    "q_scd2" ->
      """WITH b AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |c AS (SELECT * FROM b WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
        |SELECT user_id, event_type,
        |  ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS version
        |FROM c""".stripMargin,

    // incremental SCD2 apply: the oracle IS the one-shot recompute —
    // hash equality proves delta maintenance == full rebuild
    "q_scd2_apply" ->
      """WITH b AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |c AS (SELECT * FROM b WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
        |SELECT user_id, event_type,
        |  ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS version
        |FROM c""".stripMargin,

    // PageRank: unrolled 5-iteration fixed-point replay — integer
    // floor division (// on non-negatives ≡ Spark's div) and exact
    // integer sums, so every node's rank matches bit-for-bit
    "q_pagerank" -> {
      def iter(prev: String, cur: String) =
        s"""$cur AS (
           |  SELECT n.node, 150000 + (85 * COALESCE(s.t, 0)) // 100 AS r
           |  FROM n LEFT JOIN (
           |    SELECT e.dst AS node, sum($prev.r // deg.d) AS t
           |    FROM e JOIN $prev ON e.src = $prev.node
           |           JOIN deg ON deg.src = e.src
           |    GROUP BY e.dst) s ON n.node = s.node)"""
      """WITH p AS (
        |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT src, dst FROM p UNION SELECT dst, src FROM p),
        |deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
        |n AS (SELECT DISTINCT src AS node FROM e),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM n),
        |""".stripMargin +
        (0 until 5).map(i => iter(s"r$i", s"r${i + 1}").stripMargin)
          .mkString(",\n") +
        "\nSELECT node, CAST(r5.r AS BIGINT) AS \"rank\" FROM r5"
    },

    // dataset expectations over orders: each check replayed as integer
    // arithmetic (counts; the null budget in basis points) — the
    // report, including the deliberately failing uniqueness check, is
    // bit-exact
    "expectations_report" ->
      """WITH m AS (
        |  SELECT count(*) AS n,
        |    count(o_orderkey) - count(DISTINCT o_orderkey) AS dup_ok,
        |    count(o_custkey) - count(DISTINCT o_custkey) AS dup_ck,
        |    CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nul_pr,
        |    CAST(sum(CASE WHEN o_custkey IS NOT NULL
        |                   AND (o_custkey < 1 OR o_custkey > 100000000)
        |             THEN 1 ELSE 0 END) AS BIGINT) AS oor
        |  FROM orders),
        |orph AS (
        |  SELECT count(*) AS orphans FROM orders
        |  WHERE o_custkey IS NOT NULL
        |    AND o_custkey NOT IN (SELECT c_custkey FROM customer)),
        |gb AS (
        |  SELECT count(*) AS g_bad FROM (
        |    SELECT o_orderstatus FROM orders WHERE o_orderstatus IS NOT NULL
        |    GROUP BY 1 HAVING count(*) < 5))
        |SELECT 'row_count_between(1,10000000)' AS "check",
        |  n BETWEEN 1 AND 10000000 AS ok, n AS observed FROM m
        |UNION ALL SELECT 'unique(o_orderkey)', dup_ok = 0, dup_ok FROM m
        |UNION ALL SELECT 'unique(o_custkey)', dup_ck = 0, dup_ck FROM m
        |UNION ALL SELECT 'null_fraction(o_orderpriority,0bp)',
        |  nul_pr * 10000 <= 0 * n, nul_pr FROM m
        |UNION ALL SELECT 'in_range(o_custkey,1,100000000)', oor = 0, oor FROM m
        |UNION ALL SELECT 'min_per_group(o_orderstatus,5)', g_bad = 0, g_bad FROM gb
        |UNION ALL SELECT 'subset_of(o_custkey,customer.c_custkey)',
        |  orphans = 0, orphans FROM orph""".stripMargin,

    // hybrid search: replay the bm25 oracle (lexical top-20 + ranks),
    // the sim_topk cosine kernel restricted to query vec_id=7 (vector
    // top-20), then reciprocal-rank fusion 1/(60+rank) summed lexical
    // first — integer-rational doubles, bit-identical cross-engine
    "search_hybrid" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(lower(text))) = 0 THEN []
        |         ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS toks
        |  FROM documents),
        |base AS (SELECT doc_id, len(toks) AS dl, toks FROM tok),
        |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
        |                 CAST(SUM(dl) AS DOUBLE) AS sum_dl FROM base),
        |hits AS (
        |  SELECT doc_id, dl, term,
        |    CAST(len(list_filter(toks, x -> x = term)) AS DOUBLE) AS tf
        |  FROM base, (SELECT unnest(['spark', 'hash', 'window']) AS term) q
        |  WHERE len(list_filter(toks, x -> x = term)) > 0),
        |dfs AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM hits GROUP BY term),
        |contrib AS (
        |  SELECT h.doc_id, h.term,
        |    (((s.n_docs - d.df + 0.5) / (d.df + 0.5)) *
        |      ((h.tf * (1.2 + 1.0)) /
        |        (h.tf + 1.2 * ((1.0 - 0.75) + 0.75 * (h.dl / (s.sum_dl / s.n_docs)))))) AS c
        |  FROM hits h JOIN dfs d USING (term), stats s),
        |lscored AS (
        |  SELECT doc_id,
        |    list_dot_product(list(c ORDER BY term),
        |                     list_transform(list(c ORDER BY term), x -> 1.0)) AS score
        |  FROM contrib GROUP BY doc_id),
        |ltop AS (SELECT doc_id, score FROM lscored ORDER BY score DESC, doc_id LIMIT 20),
        |lex AS (SELECT doc_id,
        |          CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank_lex
        |        FROM ltop),
        |w AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM w),
        |p AS (
        |  SELECT c.vec_id AS doc_id,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos_sim
        |  FROM (SELECT * FROM n WHERE vec_id = 7) q
        |  JOIN n c ON c.vec_id <> 7),
        |vtop AS (SELECT doc_id, cos_sim FROM p ORDER BY cos_sim DESC, doc_id LIMIT 20),
        |vr AS (SELECT doc_id,
        |         CAST(ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id) AS INT) AS rank_vec
        |       FROM vtop),
        |f AS (
        |  SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id, rank_lex, rank_vec,
        |    COALESCE(1.0 / (60.0 + rank_lex), 0.0) +
        |    COALESCE(1.0 / (60.0 + rank_vec), 0.0) AS rrf
        |  FROM lex l FULL OUTER JOIN vr v ON l.doc_id = v.doc_id),
        |t10 AS (SELECT * FROM f ORDER BY rrf DESC, doc_id LIMIT 10)
        |SELECT doc_id, rank_lex, rank_vec, rrf,
        |  CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS INT) AS rank
        |FROM t10""".stripMargin,

    // sqrt-temperature mix over lang: keep fraction sqrt(n_min/n_s),
    // decided by the shared md5 hash bucket (exact division +
    // IEEE-correctly-rounded sqrt = bit-identical cross-engine)
    "mix_sqrt" ->
      """WITH c AS (SELECT lang AS st, CAST(COUNT(*) AS DOUBLE) AS n
        |           FROM documents GROUP BY lang),
        |m AS (SELECT MIN(n) AS n_min FROM c)
        |SELECT d.doc_id, d.lang FROM documents d JOIN c ON d.lang = c.st, m
        |WHERE COALESCE(CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 10000, 0)
        |      < sqrt(m.n_min / c.n) * 10000""".stripMargin,

    // per-label embedding centroids: fixed-point accumulation
    // (floor(v*1e7) as BIGINT — exact commutative sums), exact
    // division back; FLOOR because engines disagree on float->int
    // casts but not on floor
    "emb_centroids" ->
      """WITH e AS (
        |  SELECT label, i.i - 1 AS pos, embedding[i.i] AS v
        |  FROM embeddings, LATERAL unnest(range(1, len(embedding) + 1)) AS i(i)),
        |a AS (
        |  SELECT label, pos, COUNT(*) AS n,
        |    CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 10000000.0) AS BIGINT)) AS BIGINT) AS s
        |  FROM e GROUP BY 1, 2)
        |SELECT label, pos, CAST(s AS DOUBLE) / n / 10000000.0 AS centroid, n
        |FROM a""".stripMargin,

    // n-gram contamination: fraction of each doc's distinct 8-gram
    // shingles present in the doc_id%97 benchmark subset (string
    // shingles ≡ Spark's collision-free shingle hashes)
    "contamination" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(lower(text))) = 0 THEN []
        |         ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(toks[i.i : i.i + 7], ' ') AS s
        |  FROM tok, LATERAL unnest(range(1, len(toks) - 6)) AS i(i)
        |  WHERE len(toks) >= 8),
        |t AS (SELECT doc_id, COUNT(*) AS n_ngrams FROM sh GROUP BY doc_id),
        |b AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
        |h AS (SELECT doc_id, COUNT(*) AS n_contaminated
        |      FROM sh JOIN b USING (s) GROUP BY doc_id)
        |SELECT t.doc_id, CAST(t.n_ngrams AS BIGINT) AS n_ngrams,
        |  CAST(COALESCE(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
        |  CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE) / t.n_ngrams AS contamination
        |FROM t LEFT JOIN h USING (doc_id)""".stripMargin,

    // equi-width histogram of event values over [0, 500), 25 buckets;
    // edges/buckets use only IEEE-exact ops + floor
    "event_histogram" ->
      """WITH v AS (
        |  SELECT CAST(value AS DOUBLE) AS x FROM events
        |  WHERE CAST(value AS DOUBLE) >= 0.0 AND CAST(value AS DOUBLE) < 500.0),
        |bk AS (
        |  SELECT LEAST(24, CAST(FLOOR((x - 0.0) / ((500.0 - 0.0) / 25)) AS INT)) AS bucket
        |  FROM v)
        |SELECT bucket,
        |  0.0 + bucket * ((500.0 - 0.0) / 25) AS lo_edge,
        |  0.0 + (bucket + 1) * ((500.0 - 0.0) / 25) AS hi_edge,
        |  COUNT(*) AS cnt
        |FROM bk GROUP BY bucket""".stripMargin,

    // per-source boilerplate line removal: same decoration, line df
    // per (source, line) counted over DISTINCT docs, ordered rebuild
    "strip_boilerplate" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    text || chr(10) || 'AD: subscribe now!' ||
        |    (CASE WHEN doc_id % 2 = 0 THEN chr(10) || 'promo code ' || source ELSE '' END) ||
        |    chr(10) || '(c) ' || source || ' newsletter' AS t
        |  FROM documents),
        |l AS (
        |  SELECT doc_id, source, i.i - 1 AS p, parts[i.i] AS line
        |  FROM (SELECT doc_id, source, string_split(t, chr(10)) AS parts FROM d),
        |       LATERAL unnest(range(1, len(parts) + 1)) AS i(i)),
        |f AS (SELECT source, line FROM l
        |      GROUP BY source, line HAVING COUNT(DISTINCT doc_id) >= 10),
        |k AS (SELECT l.doc_id, l.source, l.p, l.line, f.line IS NULL AS keep
        |      FROM l LEFT JOIN f ON l.source = f.source AND l.line = f.line)
        |SELECT doc_id, source,
        |  COALESCE(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY p), '') AS text_clean,
        |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
        |FROM k GROUP BY doc_id, source""".stripMargin,

    // corpus-wide paragraph dedup: canonical = first (doc_id, pos)
    // occurrence; singletons always kept, rebuild position-ordered
    "dedup_paragraph" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    text ||
        |    (CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'a widely shared paragraph' ELSE '' END) ||
        |    (CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'repeat me' || chr(10) || 'repeat me' ELSE '' END) AS t
        |  FROM documents),
        |l AS (
        |  SELECT doc_id, i.i - 1 AS p, parts[i.i] AS para
        |  FROM (SELECT doc_id, string_split(t, chr(10)) AS parts FROM d),
        |       LATERAL unnest(range(1, len(parts) + 1)) AS i(i)),
        |r AS (
        |  SELECT doc_id, p, para,
        |    ROW_NUMBER() OVER (PARTITION BY para ORDER BY doc_id, p) AS rn,
        |    COUNT(*) OVER (PARTITION BY para) AS cnt
        |  FROM l),
        |k AS (SELECT doc_id, p, para, (cnt = 1 OR rn = 1) AS keep FROM r)
        |SELECT doc_id,
        |  COALESCE(string_agg(CASE WHEN keep THEN para END, chr(10) ORDER BY p), '') AS text_clean,
        |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
        |FROM k GROUP BY doc_id""".stripMargin,

    // Gopher-rule quality features: exact integer counts, one double
    // division per ratio, keep flag from the published thresholds
    "text_gopher" ->
      """WITH base AS (
        |  SELECT doc_id, text AS t,
        |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(text), '\s+') END AS words,
        |    CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS lwords,
        |    string_split(text, chr(10)) AS lines
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, t,
        |    CAST(len(words) AS BIGINT) AS n_words,
        |    CAST(len(lines) AS BIGINT) AS n_lines,
        |    CAST(COALESCE(list_sum(list_transform(words, x -> len(x))), 0) AS BIGINT) AS sum_len,
        |    CAST(len(list_filter(words, x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS n_alpha,
        |    CAST((CASE WHEN list_contains(lwords, 'the') THEN 1 ELSE 0 END) +
        |         (CASE WHEN list_contains(lwords, 'be') THEN 1 ELSE 0 END) +
        |         (CASE WHEN list_contains(lwords, 'to') THEN 1 ELSE 0 END) +
        |         (CASE WHEN list_contains(lwords, 'of') THEN 1 ELSE 0 END) +
        |         (CASE WHEN list_contains(lwords, 'and') THEN 1 ELSE 0 END) +
        |         (CASE WHEN list_contains(lwords, 'that') THEN 1 ELSE 0 END) +
        |         (CASE WHEN list_contains(lwords, 'have') THEN 1 ELSE 0 END) +
        |         (CASE WHEN list_contains(lwords, 'with') THEN 1 ELSE 0 END) AS BIGINT) AS n_stopwords,
        |    CAST(len(list_filter(lines, l -> starts_with(l, '- ') OR starts_with(l, '* ')
        |         OR starts_with(l, '• '))) AS BIGINT) AS n_bullet,
        |    CAST(len(list_filter(lines, l -> ends_with(l, '...') OR ends_with(l, '…'))) AS BIGINT) AS n_ell,
        |    CAST((len(t) - len(replace(t, '#', ''))) +
        |         (len(t) - len(replace(t, '…', ''))) AS BIGINT) AS n_sym
        |  FROM base),
        |g AS (
        |  SELECT doc_id, n_words, n_stopwords,
        |    CASE WHEN n_words = 0 THEN 0.0 ELSE CAST(sum_len AS DOUBLE) / n_words END AS mean_word_len,
        |    CASE WHEN n_words = 0 THEN 0.0 ELSE CAST(n_alpha AS DOUBLE) / n_words END AS frac_alpha_words,
        |    CAST(n_bullet AS DOUBLE) / n_lines AS frac_lines_bullet,
        |    CAST(n_ell AS DOUBLE) / n_lines AS frac_lines_ellipsis,
        |    CASE WHEN n_words = 0 THEN 0.0 ELSE CAST(n_sym AS DOUBLE) / n_words END AS symbol_ratio
        |  FROM f)
        |SELECT doc_id, n_words, mean_word_len, frac_alpha_words, n_stopwords,
        |  frac_lines_bullet, frac_lines_ellipsis, symbol_ratio,
        |  (n_words >= 50 AND n_words <= 100000 AND
        |   mean_word_len >= 3.0 AND mean_word_len <= 10.0 AND
        |   frac_lines_bullet < 0.9 AND frac_lines_ellipsis < 0.3 AND
        |   frac_alpha_words > 0.8 AND n_stopwords >= 2 AND
        |   symbol_ratio < 0.1) AS gopher_keep
        |FROM g""".stripMargin,

    // Gopher repetition rules: dup-line fraction/chars + top-bigram
    // share over the same 4-line decoration, count ties break to the
    // lexicographically larger bigram (ORDER BY cnt DESC, bigram DESC)
    "text_gopher_rep" ->
      """WITH d AS (
        |  SELECT doc_id, concat_ws(chr(10),
        |    substr(text, 1, 50),
        |    substr(text, 51, 50),
        |    CASE WHEN doc_id % 2 = 0 THEN substr(text, 1, 50) ELSE substr(text, 101, 50) END,
        |    substr(text, 151, 30)) AS t
        |  FROM documents),
        |l AS (SELECT doc_id, t, string_split(t, chr(10)) AS lines FROM d),
        |lineagg AS (
        |  SELECT doc_id, line, COUNT(*) AS cnt, len(line) AS ln
        |  FROM (SELECT doc_id, unnest(lines) AS line FROM l)
        |  GROUP BY doc_id, line),
        |linestats AS (
        |  SELECT doc_id,
        |    CAST(SUM(cnt) AS BIGINT) AS n_lines,
        |    CAST(COUNT(*) AS BIGINT) AS n_distinct,
        |    CAST(SUM((cnt - 1) * ln) AS BIGINT) AS dup_chars
        |  FROM lineagg GROUP BY doc_id),
        |w AS (SELECT doc_id,
        |        CASE WHEN trim(lower(t)) = '' THEN CAST([] AS VARCHAR[])
        |             ELSE string_split_regex(trim(lower(t)), '\s+') END AS words
        |      FROM l),
        |b AS (SELECT doc_id,
        |        CASE WHEN len(words) < 2 THEN CAST([] AS VARCHAR[])
        |             ELSE list_transform(range(1, len(words)), i -> words[i] || ' ' || words[i + 1]) END AS bigrams
        |      FROM w),
        |bc AS (SELECT doc_id, bigram, COUNT(*) AS cnt
        |       FROM (SELECT doc_id, unnest(bigrams) AS bigram FROM b)
        |       GROUP BY doc_id, bigram),
        |topb AS (SELECT doc_id, bigram, cnt FROM (
        |    SELECT doc_id, bigram, cnt,
        |      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, bigram DESC) AS rn
        |    FROM bc) WHERE rn = 1),
        |g AS (
        |  SELECT l.doc_id, s.n_lines,
        |    CAST(s.n_lines - s.n_distinct AS DOUBLE) / s.n_lines AS frac_dup_lines,
        |    CASE WHEN len(l.t) = 0 THEN 0.0
        |         ELSE CAST(s.dup_chars AS DOUBLE) / len(l.t) END AS frac_chars_dup_lines,
        |    COALESCE(tb.bigram, '') AS top_bigram,
        |    CAST(COALESCE(tb.cnt, 0) AS BIGINT) AS top_bigram_count,
        |    CASE WHEN len(l.t) = 0 OR tb.bigram IS NULL THEN 0.0
        |         ELSE CAST(tb.cnt * len(tb.bigram) AS DOUBLE) / len(l.t) END AS top_bigram_char_frac
        |  FROM l JOIN linestats s USING (doc_id)
        |  LEFT JOIN topb tb ON l.doc_id = tb.doc_id)
        |SELECT doc_id, n_lines, frac_dup_lines, frac_chars_dup_lines,
        |  top_bigram, top_bigram_count, top_bigram_char_frac,
        |  (frac_dup_lines < 0.3 AND frac_chars_dup_lines < 0.2 AND
        |   top_bigram_char_frac < 0.18) AS rep_keep
        |FROM g""".stripMargin,

    // C4 line filtering: same decoration, per-line keep rules,
    // doc-level lorem-ipsum/brace drop, position-ordered rebuild
    "c4_clean" ->
      """WITH d AS (
        |  SELECT doc_id, concat_ws(chr(10),
        |    substr(text, 1, 40),
        |    'The doc says ' || substr(text, 1, 20) || '.',
        |    'Short one.',
        |    'Is this a question?',
        |    CASE WHEN doc_id % 5 = 0 THEN 'Please enable javascript and accept our cookie.' END,
        |    CASE WHEN doc_id % 11 = 0 THEN 'filler lorem ipsum line' END,
        |    CASE WHEN doc_id % 13 = 0 THEN 'code { block' END) AS t
        |  FROM documents),
        |ok AS (SELECT * FROM d
        |       WHERE NOT contains(lower(t), 'lorem ipsum') AND NOT contains(t, '{')),
        |l AS (
        |  SELECT doc_id, i.i - 1 AS p, parts[i.i] AS line
        |  FROM (SELECT doc_id, string_split(t, chr(10)) AS parts FROM ok),
        |       LATERAL unnest(range(1, len(parts) + 1)) AS i(i)),
        |k AS (
        |  SELECT doc_id, p, line,
        |    ((ends_with(trim(line), '.') OR ends_with(trim(line), '!') OR
        |      ends_with(trim(line), '?') OR ends_with(trim(line), '"')) AND
        |     len(CASE WHEN trim(line) = '' THEN CAST([] AS VARCHAR[])
        |              ELSE string_split_regex(trim(line), '\s+') END) >= 3 AND
        |     NOT contains(lower(line), 'javascript') AND
        |     NOT contains(lower(line), 'cookie')) AS keep
        |  FROM l)
        |SELECT * FROM (
        |  SELECT doc_id,
        |    COALESCE(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY p), '') AS text_clean,
        |    CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |    CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
        |  FROM k GROUP BY doc_id) WHERE n_kept > 0""".stripMargin,

    // per-source cap: hash-order row_number, keep rank <= 10
    // cluster-balanced mix: nearest-pinned-centroid assignment (the
    // semdedup cent/asg CTEs verbatim — same first-32 normalized
    // codebook, same lowest-index tie-break) + the md5-order cap
    "mix_clusters" ->
      """WITH w AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |           WHERE embedding IS NOT NULL),
        |n AS (SELECT vec_id, v, list_sum(list_transform(v, x -> x*x)) AS ss FROM w),
        |u AS (SELECT vec_id,
        |        CASE WHEN ss > 0 THEN list_transform(v, x -> x * (1.0/sqrt(ss)))
        |             ELSE v END AS uv
        |      FROM n),
        |cent AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
        |         CASE WHEN ss > 0 THEN list_transform(v, x -> x * (1.0/sqrt(ss)))
        |              ELSE v END AS c
        |  FROM (SELECT vec_id, v, list_sum(list_transform(v, x -> x*x)) AS ss
        |        FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |              WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 32))),
        |asg AS (
        |  SELECT u.vec_id, cent.cid,
        |    list_sum(list_transform(generate_series(1, len(u.uv)),
        |      i -> (u.uv[i] - cent.c[i]) * (u.uv[i] - cent.c[i]))) AS d2
        |  FROM u, cent),
        |cell AS (SELECT vec_id, cid AS cell FROM
        |           (SELECT vec_id, cid, ROW_NUMBER() OVER
        |              (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS p FROM asg)
        |         WHERE p = 1),
        |ranked AS (
        |  SELECT vec_id AS id, cell,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY cell
        |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT)
        |      AS cell_rank
        |  FROM cell)
        |SELECT id, cell, cell_rank FROM ranked WHERE cell_rank <= 12""".stripMargin,

    "cap_per_source" ->
      """SELECT doc_id, source, grp_rank FROM (
        |  SELECT doc_id, source,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS grp_rank
        |  FROM documents) WHERE grp_rank <= 10""".stripMargin,

    // per-source exact median gate on n_chars (quantile_cont ==
    // Spark percentile, shared interpolation formula)
    "quality_gate" ->
      """WITH thr AS (
        |  SELECT source AS g, quantile_cont(n_chars, 0.5) AS threshold
        |  FROM documents GROUP BY source)
        |SELECT doc_id, source, n_chars, threshold
        |FROM documents JOIN thr ON source = g
        |WHERE CAST(n_chars AS DOUBLE) >= threshold""".stripMargin,

    // epoch upsampling: weight = doc_id % 4 (zero drops the row)
    "upsample_epochs" ->
      """SELECT d.doc_id, CAST(i.epoch AS BIGINT) AS epoch
        |FROM documents d,
        |     LATERAL unnest(range(1, (d.doc_id % 4) + 1)) AS i(epoch)""".stripMargin,

    // A-ES weighted sample: top-120 by u^(1/w), u from 13 md5 hex
    // chars (52 bits — exactly representable in a double on both
    // engines)
    "sample_weighted" ->
      """SELECT doc_id, source, n_chars FROM (
        |  SELECT doc_id, source, n_chars,
        |    POW((CAST('0x' || substr(md5('wsample' || CAST(doc_id AS VARCHAR)), 1, 13) AS BIGINT) + 1.0)
        |        / POW(16.0, 13.0), 1.0 / n_chars) AS k
        |  FROM documents)
        |ORDER BY k DESC, doc_id LIMIT 120""".stripMargin,

    // per-group A-ES: top-8 per source by u^(1/w)
    "sample_weighted_group" ->
      """SELECT doc_id, source, n_chars, CAST(r AS INT) AS sample_rank FROM (
        |  SELECT doc_id, source, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY
        |      POW((CAST('0x' || substr(md5('wsg' || CAST(doc_id AS VARCHAR)), 1, 13) AS BIGINT) + 1.0)
        |          / POW(16.0, 13.0), 1.0 / n_chars) DESC, doc_id) AS r
        |  FROM documents)
        |WHERE r <= 8""".stripMargin,

    // exact-N sample: first 100 of the seeded permutation
    "sample_exact_n" ->
      """SELECT * FROM (
        |  SELECT doc_id, source,
        |    CAST(ROW_NUMBER() OVER (
        |      ORDER BY md5('sampleN' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS order_id
        |  FROM documents) WHERE order_id <= 100""".stripMargin,

    // CCNet normalization: lower → ctl→space → (punct→space) →
    // ws-collapse → trim; [[:punct:]] == Java \p{Punct} (ASCII set)
    "text_normalize" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    '  MIXED Case!!' || chr(9) || text || '  trailing,,  punct... ' || chr(10) AS t
        |  FROM documents),
        |s1 AS (SELECT doc_id,
        |         regexp_replace(lower(t), '[\x00-\x1f\x7f]', ' ', 'g') AS a
        |       FROM m)
        |SELECT doc_id,
        |  trim(regexp_replace(a, '\s+', ' ', 'g')) AS text_norm,
        |  trim(regexp_replace(regexp_replace(a, '[[:punct:]]', ' ', 'g'), '\s+', ' ', 'g')) AS text_norm_nopunct
        |FROM s1""".stripMargin,

    // sentence chunking: sentinel rewrite after [.!?] + split;
    // RE2 \1 backref == Java $1
    "text_sentences" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    substr(text, 1, 30) || '. ' || substr(text, 31, 30) || '! ' ||
        |    substr(text, 61, 30) || '? ' || substr(text, 91, 20) AS t
        |  FROM documents),
        |m AS (SELECT doc_id,
        |        string_split(regexp_replace(t, '([.!?]) ', '\1' || chr(1), 'g'), chr(1)) AS parts
        |      FROM d)
        |SELECT doc_id, CAST(i.i - 1 AS INT) AS sent_id, parts[i.i] AS sentence
        |FROM m, LATERAL unnest(range(1, len(parts) + 1)) AS i(i)""".stripMargin,

    // seeded global order: exact rank of md5('s42' || id)
    // export sharding: shard = (rank-1) div 64 over the same seeded
    // permutation as shuffle_order; manifest per shard
    "export_shards" ->
      """WITH r AS (
        |  SELECT doc_id,
        |    CAST(ROW_NUMBER() OVER (
        |      ORDER BY md5('s42' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS order_id
        |  FROM documents)
        |SELECT CAST((order_id - 1) // 64 AS BIGINT) AS shard_id,
        |  COUNT(*) AS n_docs,
        |  MIN(order_id) AS first_order, MAX(order_id) AS last_order
        |FROM r GROUP BY 1""".stripMargin,

    "shuffle_order" ->
      """SELECT doc_id,
        |  CAST(ROW_NUMBER() OVER (
        |    ORDER BY md5('s42' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS order_id
        |FROM documents""".stripMargin,

    // FineWeb-shaped pipeline v3: boilerplate strip → per-source
    // length-median gate → exact dedup → cap 15/source → hash split
    // → seeded global order (composes the proven per-stage oracles)
    "pipeline_docs_v3" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    text || chr(10) || 'AD: subscribe now!' ||
        |    (CASE WHEN doc_id % 2 = 0 THEN chr(10) || 'promo code ' || source ELSE '' END) ||
        |    chr(10) || '(c) ' || source || ' newsletter' AS t
        |  FROM documents),
        |l AS (
        |  SELECT doc_id, source, i.i - 1 AS p, parts[i.i] AS line
        |  FROM (SELECT doc_id, source, string_split(t, chr(10)) AS parts FROM d),
        |       LATERAL unnest(range(1, len(parts) + 1)) AS i(i)),
        |f AS (SELECT source, line FROM l
        |      GROUP BY source, line HAVING COUNT(DISTINCT doc_id) >= 10),
        |k AS (SELECT l.doc_id, l.source, l.p, l.line, f.line IS NULL AS keep
        |      FROM l LEFT JOIN f ON l.source = f.source AND l.line = f.line),
        |sb AS (SELECT doc_id, source,
        |         COALESCE(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY p), '') AS text_clean
        |       FROM k GROUP BY doc_id, source),
        |sb2 AS (SELECT doc_id, source, text_clean,
        |          CAST(len(text_clean) AS BIGINT) AS len_clean
        |        FROM sb),
        |thr AS (SELECT source, quantile_cont(len_clean, 0.5) AS threshold
        |        FROM sb2 GROUP BY source),
        |g AS (SELECT sb2.* FROM sb2 JOIN thr ON sb2.source = thr.source
        |      WHERE CAST(len_clean AS DOUBLE) >= threshold),
        |dd AS (SELECT doc_id, source, text_clean, len_clean FROM (
        |         SELECT g.*, MIN(doc_id) OVER (PARTITION BY text_clean) AS cmin FROM g)
        |       WHERE doc_id = cmin),
        |cap AS (SELECT * FROM (
        |         SELECT dd.*, CAST(ROW_NUMBER() OVER (PARTITION BY source
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS grp_rank
        |         FROM dd)
        |        WHERE grp_rank <= 15),
        |sp AS (SELECT *,
        |         CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |              ELSE 'test' END AS split
        |       FROM (SELECT cap.*,
        |               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 100 AS b
        |             FROM cap))
        |SELECT doc_id, source, len_clean, grp_rank, split,
        |  CAST(ROW_NUMBER() OVER (
        |    ORDER BY md5('v3' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS order_id
        |FROM sp""".stripMargin,

    // Tukey fences per event type: quantile_cont == Spark percentile,
    // IEEE-exact fence arithmetic
    "iqr_outliers" ->
      """WITH q AS (
        |  SELECT event_type AS g,
        |    quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3
        |  FROM events GROUP BY event_type),
        |f AS (SELECT g, q1 - 1.5 * (q3 - q1) AS fence_lo,
        |             q3 + 1.5 * (q3 - q1) AS fence_hi FROM q)
        |SELECT event_id, event_type, value, fence_lo, fence_hi,
        |  (CAST(value AS DOUBLE) < fence_lo OR CAST(value AS DOUBLE) > fence_hi) AS is_outlier
        |FROM events JOIN f ON event_type = f.g""".stripMargin,

    // duplicate-mass diagnostic: every 4th doc shares a template
    "dup_rate_by_source" ->
      """WITH d AS (
        |  SELECT source,
        |    CASE WHEN doc_id % 4 = 0 THEN 'tmpl-' || source ELSE text END AS c
        |  FROM documents)
        |SELECT source AS grp,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COUNT(DISTINCT c) AS BIGINT) AS n_distinct,
        |  1.0 - CAST(COUNT(DISTINCT c) AS DOUBLE) / COUNT(*) AS dup_ratio
        |FROM d GROUP BY source""".stripMargin,

    // per-source token budget: inclusive hash-order running sum
    "token_budget" ->
      """SELECT * FROM (
        |  SELECT doc_id, source, n_chars,
        |    CAST(SUM(n_chars) OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS tok_cumsum
        |  FROM documents) WHERE tok_cumsum <= 3000""".stripMargin,

    // join-key skew diagnostic: top-20 heaviest user_ids with share
    "skew_keys" ->
      """WITH c AS (SELECT user_id AS key, COUNT(*) AS cnt FROM events GROUP BY user_id),
        |t AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM c),
        |top AS (SELECT key, cnt FROM c ORDER BY cnt DESC, key LIMIT 20)
        |SELECT key, cnt, CAST(cnt AS DOUBLE) / total AS share,
        |  CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS INT) AS rank
        |FROM top, t""".stripMargin,

    // the portable-CMS twin: rebuild the 5x2048 counter matrix from
    // md5-prefix double hashing ((h1 + i*h2) % width — all < 2^56,
    // exact BIGINT on both engines), then rank keys by the MIN of
    // their row counters. distinct_count-style: the ESTIMATES must
    // match exactly, not approximately.
    "skew_keys_approx" ->
      """WITH v AS (SELECT CAST(user_id AS VARCHAR) AS s FROM events
        |           WHERE user_id IS NOT NULL),
        |h AS (SELECT s, CAST('0x' || substr(md5(s), 1, 13) AS BIGINT) AS h1,
        |             CAST('0x' || substr(md5(s), 14, 13) AS BIGINT) AS h2 FROM v),
        |occ AS (SELECT t.i, (h1 + t.i * h2) % 2048 AS b, COUNT(*) AS c
        |        FROM h CROSS JOIN range(5) t(i) GROUP BY 1, 2),
        |keys AS (SELECT DISTINCT s, h1, h2 FROM h),
        |est AS (SELECT k.s AS key, MIN(o.c) AS est_n
        |        FROM keys k CROSS JOIN range(5) t(i)
        |        JOIN occ o ON o.i = t.i AND o.b = (k.h1 + t.i * k.h2) % 2048
        |        GROUP BY 1)
        |SELECT key, CAST(est_n AS BIGINT) AS est_n FROM est
        |ORDER BY est_n DESC, key LIMIT 20""".stripMargin,

    // benchmark decontamination: anti join on the normalized (sorted
    // lowercased token) fingerprint against the doc_id%97 subset
    "decontaminate" -> decontaminateOracle,
    // the bloom prefilter is result-identical to the exact operator
    // by construction (no false negatives + exact rescore) — same oracle
    "decontaminate_bloom" -> decontaminateOracle,

    // hashed linear quality classifier: md5-prefix bucket (the shared
    // hashBucket formula, over the raw token) → synthetic pretrained
    // integer weights w(b) = (b·2654435761) mod 1997 − 998, bias 3;
    // integer sums are order-free so the logit is cross-engine exact
    "quality_classifier" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(lower(text))) = 0 THEN []
        |         ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    CAST(3 + COALESCE(list_sum(list_transform(toks, t ->
        |      ((CAST(('0x' || substr(md5(t), 1, 6)) AS BIGINT) % 4096)
        |        * 2654435761) % 1997 - 998)), 0) AS BIGINT) AS logit
        |  FROM d)
        |SELECT doc_id, logit, logit > 0 AS keep FROM s""".stripMargin,

    // Unicode script profile over decorated text (snippet list and
    // \x{…} class patterns shared verbatim with the Column tree)
    "text_script" -> textScriptOracle,

    // Aho-Corasick blocklist screen: the automaton's distinct-match
    // count has exactly `contains` substring semantics per term
    "text_blocklist" -> {
      val terms = Queries.BlocklistTerms.map(t => s"'$t'").mkString("[", ", ", "]")
      s"""SELECT doc_id,
         |  CAST(len(list_filter($terms, t -> contains(text, t))) AS BIGINT) AS n_blocked,
         |  len(list_filter($terms, t -> contains(text, t))) = 0 AS keep
         |FROM documents""".stripMargin
    },

    // blocked fuzzy join: 16-char-prefix blocking, classic-DP
    // levenshtein (identical in both engines, integer-exact)
    "fuzzy_names" ->
      """WITH c AS (SELECT c_custkey AS id, c_name AS key,
        |             substr(c_name, 1, 16) AS blk FROM customer)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(levenshtein(a.key, b.key) AS INT) AS dist
        |FROM c a JOIN c b ON a.blk = b.blk AND a.id < b.id
        |WHERE levenshtein(a.key, b.key) <= 1""".stripMargin,

    // multi-pass blocking: prefix-16 ∪ suffix-4 passes, deduped —
    // full single-substitution recall on the 18-char name domain
    "fuzzy_names_multi" ->
      """WITH c1 AS (SELECT c_custkey AS id, c_name AS key,
        |              substr(c_name, 1, 16) AS blk FROM customer),
        |c2 AS (SELECT c_custkey AS id, c_name AS key,
        |         substr(c_name, -4, 4) AS blk FROM customer),
        |p AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    CAST(levenshtein(a.key, b.key) AS INT) AS dist
        |  FROM c1 a JOIN c1 b ON a.blk = b.blk AND a.id < b.id
        |  WHERE levenshtein(a.key, b.key) <= 1
        |  UNION ALL
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    CAST(levenshtein(a.key, b.key) AS INT) AS dist
        |  FROM c2 a JOIN c2 b ON a.blk = b.blk AND a.id < b.id
        |  WHERE levenshtein(a.key, b.key) <= 1)
        |SELECT DISTINCT id_a, id_b, dist FROM p""".stripMargin,

    // Jaro-Winkler mode: graft's native kernel pins DuckDB's exact
    // semantics (empty->0, window = max/2-1, boost only above 0.7);
    // sim rounded 6dp on both engines
    "fuzzy_names_jw" ->
      """WITH c AS (SELECT c_custkey AS id, c_name AS key,
        |             substr(c_name, 1, 16) AS blk FROM customer)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  ROUND(jaro_winkler_similarity(a.key, b.key), 6) AS sim
        |FROM c a JOIN c b ON a.blk = b.blk AND a.id < b.id
        |WHERE ROUND(jaro_winkler_similarity(a.key, b.key), 6) >= 0.98""".stripMargin,

    // gate audit: every pipelineDocs gate as a flag + first failure
    "q_gate_audit" -> {
      val blockTerms = Queries.BlocklistTerms.map(t => s"'$t'").mkString("[", ", ", "]")
      val lowTokens =
        """CASE WHEN length(trim(lower(text))) = 0 THEN [] ELSE regexp_split_to_array(trim(lower(text)), '\s+') END"""
      val qscore =
        s"""(CASE WHEN len($wsTokensSql) = 0 THEN 0.0
           |  ELSE CAST(${stopCount(TextAnalysisCols.EnStop)} AS DOUBLE) / len($wsTokensSql) END) * 0.5
           |+ (1.0 - CASE WHEN length(text) = 0 THEN 0.0
           |  ELSE CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text) END) * 0.5""".stripMargin
      s"""WITH flags AS (
         |  SELECT doc_id,
         |    ($langCaseSql) = 'en' AS lang_ok,
         |    ($qscore) >= 0.51 AS quality_ok,
         |    len(list_filter($blockTerms, t -> contains(text, t))) = 0 AS blocklist_ok,
         |    ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1 AS dup_canonical,
         |    md5(array_to_string(list_sort($lowTokens), ' ')) AS f
         |  FROM documents),
         |bench AS (
         |  SELECT DISTINCT md5(array_to_string(list_sort($lowTokens), ' ')) AS f
         |  FROM documents WHERE doc_id % 97 = 0)
         |SELECT doc_id, lang_ok, quality_ok, blocklist_ok, dup_canonical,
         |  bench.f IS NULL AS decon_ok,
         |  (lang_ok AND quality_ok AND blocklist_ok AND dup_canonical
         |    AND bench.f IS NULL) AS keep,
         |  CASE WHEN NOT lang_ok THEN 'lang'
         |       WHEN NOT quality_ok THEN 'quality'
         |       WHEN NOT blocklist_ok THEN 'blocklist'
         |       WHEN NOT dup_canonical THEN 'duplicate'
         |       WHEN bench.f IS NOT NULL THEN 'contaminated'
         |       ELSE '' END AS first_failed
         |FROM flags LEFT JOIN bench ON flags.f = bench.f""".stripMargin
    },

    // ordered funnel: first view, first later click, first later
    // purchase — ordering by the integer event id
    // event-transition bigrams: same per-user lag in event_id order
    // (integer-exact, tie-free), same global pair count
    "q_event_bigrams" ->
      """WITH s AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS e1
        |  FROM events)
        |SELECT e1, event_type AS e2, COUNT(*) AS n
        |FROM s WHERE e1 IS NOT NULL GROUP BY e1, e2""".stripMargin,

    "q_funnel" ->
      """WITH ev AS (SELECT * FROM events WHERE event_id % 29 = 0),
        |s1 AS (SELECT user_id, min(event_id) AS e0 FROM ev
        |            WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.event_id) AS e1 FROM ev e
        |       JOIN s1 ON e.user_id = s1.user_id AND e.event_id > s1.e0
        |       WHERE e.event_type = 'click' GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.event_id) AS e2 FROM ev e
        |       JOIN s2 ON e.user_id = s2.user_id AND e.event_id > s2.e1
        |       WHERE e.event_type = 'purchase' GROUP BY e.user_id),
        |u AS (SELECT DISTINCT user_id FROM ev)
        |SELECT CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
        |                 WHEN s2.user_id IS NOT NULL THEN 2
        |                 WHEN s1.user_id IS NOT NULL THEN 1
        |                 ELSE 0 END AS INT) AS stage,
        |  COUNT(*) AS n_users
        |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |       LEFT JOIN s3 USING (user_id)
        |GROUP BY 1""".stripMargin,

    // weekly signup-cohort retention (date_trunc week = Monday in
    // both engines; offsets are exact integer day-diffs / 7)
    "q_cohort" ->
      """WITH c AS (SELECT user_id, date_trunc('week', min(ts)) AS cw
        |           FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events)
        |SELECT CAST(c.cw AS DATE) AS cohort_week,
        |  CAST(FLOOR(datediff('day', c.cw, a.aw) / 7.0) AS INT) AS week_offset,
        |  COUNT(*) AS n_active
        |FROM c JOIN a USING (user_id)
        |WHERE a.aw >= c.cw
        |GROUP BY 1, 2""".stripMargin,

    // rolling 3-row window per user: order-free / integer aggregates
    // only, so sliding-frame evaluation order cannot skew doubles
    "q_rolling" ->
      """SELECT user_id, event_id,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS roll_cnt,
        |  CAST(SUM(CAST(FLOOR(value) AS BIGINT)) OVER w AS BIGINT) AS roll_sum,
        |  MIN(value) OVER w AS roll_min,
        |  MAX(value) OVER w AS roll_max
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin,

    // corpus version delta: full outer join on id, md5 content compare
    "corpus_delta" ->
      """WITH neu AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 1 THEN text || ' [rev2]' ELSE text END AS text
        |  FROM documents WHERE doc_id % 17 <> 3
        |  UNION ALL
        |  SELECT doc_id + 10000000 AS doc_id,
        |    'new page ' || CAST(doc_id AS VARCHAR) AS text
        |  FROM documents WHERE doc_id % 19 = 2),
        |o AS (SELECT doc_id, md5(text) AS old_hash FROM documents),
        |n AS (SELECT doc_id, md5(text) AS new_hash FROM neu)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN old_hash IS NULL THEN 'added'
        |       WHEN new_hash IS NULL THEN 'removed'
        |       WHEN old_hash = new_hash THEN 'unchanged'
        |       ELSE 'updated' END AS status,
        |  old_hash, new_hash
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""".stripMargin,

    // keyed copy-on-write merge: the oracle states the merged END
    // STATE relationally (deletes filtered, revisions applied in
    // place, moved docs carrying their new partition value) — hash
    // equality against the physically-merged table proves the
    // partition-level rewrite ≡ a full rewrite
    "corpus_merge" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 0 THEN text || ' [v2]' ELSE text END AS text,
        |  lang,
        |  CASE WHEN doc_id % 7 = 0 AND doc_id % 3 = 0 THEN 'src_new'
        |       ELSE source END AS source,
        |  CASE WHEN doc_id % 7 = 0 THEN n_chars + 5 ELSE n_chars END AS n_chars
        |FROM documents
        |WHERE doc_id % 13 <> 0""".stripMargin,

    // versioned snapshot table, read AS OF v2: the oracle replays only
    // the FIRST change set (identical to corpus_merge's end state) —
    // hash equality proves the v3 commit is invisible to the v2 read
    // and the manifest serves the exact historical file set
    // relayout is a pure physical transformation: the post-relayout
    // tip replays as create+merge+MoR-delete relationally — hash
    // equality proves the z-order rewrite (and the dv materialization
    // riding it) moves bytes, never rows
    "snapshot_relayout" ->
      """WITH s1 AS (
        |  SELECT doc_id, text, lang, source,
        |    CASE WHEN doc_id % 6 = 0 AND doc_id % 19 <> 0
        |         THEN n_chars + 11 ELSE n_chars END AS n_chars
        |  FROM documents WHERE doc_id % 19 <> 0)
        |SELECT doc_id, text, lang, source, n_chars
        |FROM s1 WHERE doc_id NOT BETWEEN 200 AND 260""".stripMargin,

    // the SQL TVF surface reads the SAME v2 state as
    // snapshot_timetravel — identical replay, so hash equality proves
    // the analysis-time TVF plan ≡ the DataFrame-API time travel
    "snapshot_sql_tvf" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 0 THEN text || ' [v2]' ELSE text END AS text,
        |  lang,
        |  CASE WHEN doc_id % 7 = 0 AND doc_id % 3 = 0 THEN 'src_new'
        |       ELSE source END AS source,
        |  CASE WHEN doc_id % 7 = 0 THEN n_chars + 5 ELSE n_chars END AS n_chars
        |FROM documents
        |WHERE doc_id % 13 <> 0""".stripMargin,

    "snapshot_timetravel" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 0 THEN text || ' [v2]' ELSE text END AS text,
        |  lang,
        |  CASE WHEN doc_id % 7 = 0 AND doc_id % 3 = 0 THEN 'src_new'
        |       ELSE source END AS source,
        |  CASE WHEN doc_id % 7 = 0 THEN n_chars + 5 ELSE n_chars END AS n_chars
        |FROM documents
        |WHERE doc_id % 13 <> 0""".stripMargin,

    // the history TVF's LOGICAL columns: the oracle rebuilds each
    // retained version's row count from the known commit sequence
    // (v1 create ← documents, v2/v3 merges, v4 copy-on-write delete,
    // v5 update [count-preserving], v6/v7 merge-on-read deletes
    // [logical rows shrink via deletion vectors while data files are
    // untouched]) — hash equality proves the manifest-only fold
    // reports the exact logical history, MoR versions included
    "snapshot_history_tvf" ->
      """WITH s1 AS (SELECT doc_id FROM documents WHERE doc_id % 13 <> 0),
        |s2 AS (SELECT doc_id FROM s1 WHERE doc_id % 23 <> 7),
        |s3 AS (SELECT doc_id FROM s2 WHERE doc_id NOT BETWEEN 150 AND 199),
        |s6 AS (SELECT doc_id FROM s3 WHERE doc_id NOT BETWEEN 400 AND 449),
        |s7 AS (SELECT doc_id FROM s3 WHERE doc_id NOT BETWEEN 400 AND 480)
        |SELECT CAST(version AS INTEGER) AS version, op,
        |       CAST(parent AS INTEGER) AS parent, n_rows
        |FROM (
        |  SELECT 1 AS version, 'create' AS op, 0 AS parent,
        |         (SELECT count(*) FROM documents) AS n_rows
        |  UNION ALL SELECT 2, 'merge', 1, (SELECT count(*) FROM s1)
        |  UNION ALL SELECT 3, 'merge', 2, (SELECT count(*) FROM s2)
        |  UNION ALL SELECT 4, 'delete', 3, (SELECT count(*) FROM s3)
        |  UNION ALL SELECT 5, 'update', 4, (SELECT count(*) FROM s3)
        |  UNION ALL SELECT 6, 'delete-mor', 5, (SELECT count(*) FROM s6)
        |  UNION ALL SELECT 7, 'delete-mor', 6, (SELECT count(*) FROM s7)
        |)""".stripMargin,

    // the change-feed TVF resolved by TAG (tag rev-2 pins v2): the
    // query nets the feed per full row (+1 added / −1 removed), so
    // rows a rewrite carried unchanged cancel and the surviving net
    // IS the logical v1→v2 diff, rebuilt here relationally — hash
    // equality proves the file-identity change set is algebraically
    // exact (the property incremental consumers depend on)
    "snapshot_changes_tag" ->
      """WITH v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' [v2]' ELSE text END AS text,
        |    lang,
        |    CASE WHEN doc_id % 7 = 0 AND doc_id % 3 = 0 THEN 'src_new'
        |         ELSE source END AS source,
        |    CASE WHEN doc_id % 7 = 0 THEN n_chars + 5 ELSE n_chars END AS n_chars
        |  FROM documents WHERE doc_id % 13 <> 0),
        |signed AS (
        |  SELECT doc_id, text, lang, source, n_chars, 1 AS n FROM v2
        |  UNION ALL
        |  SELECT doc_id, text, lang, source, n_chars, -1 FROM documents)
        |SELECT doc_id, text, lang, source, n_chars,
        |       CAST(sum(n) AS BIGINT) AS net
        |FROM signed
        |GROUP BY doc_id, text, lang, source, n_chars
        |HAVING sum(n) <> 0""".stripMargin,

    // stats-pruned range read of the snapshot LATEST (v3): replay both
    // change sets, then the range predicate — hash equality proves the
    // manifest's min/max file pruning is an IO optimization only
    "snapshot_pruned" ->
      """WITH s1 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' [v2]' ELSE text END AS text,
        |    lang,
        |    CASE WHEN doc_id % 7 = 0 AND doc_id % 3 = 0 THEN 'src_new'
        |         ELSE source END AS source,
        |    CASE WHEN doc_id % 7 = 0 THEN n_chars + 5 ELSE n_chars END AS n_chars
        |  FROM documents WHERE doc_id % 13 <> 0)
        |SELECT doc_id,
        |  CASE WHEN doc_id % 11 = 5 THEN text || ' [v3]' ELSE text END AS text,
        |  lang, source,
        |  CASE WHEN doc_id % 11 = 5 THEN n_chars + 7 ELSE n_chars END AS n_chars
        |FROM s1
        |WHERE doc_id % 23 <> 7 AND doc_id BETWEEN 100 AND 299""".stripMargin,

    // DSv2 catalog read of the same pinned-v3 state + range predicate
    // as snapshot_pruned: the Spark side goes CREATE TABLE … USING
    // graft OPTIONS (versionAsOf '3') → SQL WHERE (pushdown → manifest
    // file skipping); the oracle replays both change sets + the
    // filter, so hash equality proves connector ≡ Scala API ≡ oracle
    // DSv2 catalog WRITE: one SQL INSERT re-delivers every %9==4 doc
    // with revised text/chars; on a keyed table INSERT is the merge
    // commit (upsert), so the oracle replays the upsert relationally
    // — hash equality proves SQL INSERT ≡ the transactional Scala
    // merge, key semantics included
    "snapshot_dsv2_write" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 9 = 4 THEN text || ' [ins]' ELSE text END AS text,
        |  lang, source,
        |  CASE WHEN doc_id % 9 = 4 THEN n_chars + 9 ELSE n_chars END AS n_chars
        |FROM documents""".stripMargin,

    // DSv2 catalog DELETE: one SQL range delete + one equality delete
    // through SupportsDelete → the predicate-DML commits; the oracle
    // replays both — hash equality proves SQL DELETE ≡ Scala DML
    "snapshot_dsv2_delete" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents
        |WHERE doc_id NOT BETWEEN 150 AND 199 AND doc_id <> 301""".stripMargin,

    // DSv2 catalog UPDATE: one SQL range (BETWEEN) update + one
    // equality update through the analysis-time DML routing → the
    // pruned copy-on-write commits; the oracle replays both — hash
    // equality proves SQL UPDATE ≡ the transactional Scala DML
    "snapshot_dsv2_update" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id = 42 THEN text || ' [u]' ELSE text END AS text,
        |  CASE WHEN doc_id BETWEEN 300 AND 349 THEN 'xx' ELSE lang END AS lang,
        |  source,
        |  CASE WHEN doc_id BETWEEN 300 AND 349 THEN n_chars + 1000
        |       ELSE n_chars END AS n_chars
        |FROM documents""".stripMargin,

    // GROUPED aggregate pushdown: GROUP BY the partition column rides
    // the per-partition manifest fold (one row per partition value,
    // zero data files); the oracle replays the pinned-v3 state and
    // groups relationally — hash equality proves the grouped fold
    // computes the exact per-partition aggregate
    "snapshot_dsv2_agg_group" ->
      """WITH s1 AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 7 = 0 THEN n_chars + 5 ELSE n_chars END AS n_chars
        |  FROM (SELECT doc_id,
        |          CASE WHEN doc_id % 7 = 0 AND doc_id % 3 = 0 THEN 'src_new'
        |               ELSE source END AS source, n_chars
        |        FROM documents)
        |  WHERE doc_id % 13 <> 0),
        |s2 AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 11 = 5 THEN n_chars + 7 ELSE n_chars END AS n_chars
        |  FROM s1 WHERE doc_id % 23 <> 7)
        |SELECT source, count(*) AS n_rows,
        |  count(doc_id) AS n_doc_id, min(doc_id) AS min_doc_id,
        |  max(doc_id) AS max_doc_id,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_n_chars
        |FROM s2 GROUP BY source""".stripMargin,

    // PARTITION-FILTERED aggregate pushdown: count/min/max/sum under
    // `WHERE source IN (…)` rides the manifest fold restricted to the
    // matching partition entries (zero data-file IO — spec-proven by
    // deleting the files); the oracle replays the pinned-v3 state,
    // filters and aggregates relationally — hash equality proves the
    // restricted fold IS the filter, exactly
    "snapshot_dsv2_agg_where" ->
      """WITH s1 AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 7 = 0 THEN n_chars + 5 ELSE n_chars END AS n_chars
        |  FROM (SELECT doc_id,
        |          CASE WHEN doc_id % 7 = 0 AND doc_id % 3 = 0 THEN 'src_new'
        |               ELSE source END AS source, n_chars
        |        FROM documents)
        |  WHERE doc_id % 13 <> 0),
        |s2 AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 11 = 5 THEN n_chars + 7 ELSE n_chars END AS n_chars
        |  FROM s1 WHERE doc_id % 23 <> 7)
        |SELECT count(*) AS n_rows,
        |  count(doc_id) AS n_doc_id, min(doc_id) AS min_doc_id,
        |  max(doc_id) AS max_doc_id,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_n_chars
        |FROM s2 WHERE source IN ('src3', 'src7')""".stripMargin,

    // RANGE-filtered aggregate pushdown: BETWEEN on the partition
    // column restricts the same manifest fold to the keys inside the
    // range (string ordering here — DuckDB's binary collation and the
    // fold's lexicographic compare agree); the oracle replays the
    // pinned-v3 state under the identical BETWEEN
    "snapshot_dsv2_agg_range" ->
      """WITH s1 AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 7 = 0 THEN n_chars + 5 ELSE n_chars END AS n_chars
        |  FROM (SELECT doc_id,
        |          CASE WHEN doc_id % 7 = 0 AND doc_id % 3 = 0 THEN 'src_new'
        |               ELSE source END AS source, n_chars
        |        FROM documents)
        |  WHERE doc_id % 13 <> 0),
        |s2 AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 11 = 5 THEN n_chars + 7 ELSE n_chars END AS n_chars
        |  FROM s1 WHERE doc_id % 23 <> 7)
        |SELECT count(*) AS n_rows,
        |  count(doc_id) AS n_doc_id, min(doc_id) AS min_doc_id,
        |  max(doc_id) AS max_doc_id,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_n_chars
        |FROM s2 WHERE source BETWEEN 'src2' AND 'src5'""".stripMargin,

    // TABLE CATALOG lifecycle by NAME (graft_cat.ns.docs): atomic
    // CTAS (v1 = the data) + a keyed range UPDATE through the name;
    // the oracle replays both relationally — hash equality proves the
    // catalog surface drives the same transactional engine
    "snapshot_catalog" ->
      """SELECT doc_id, text, lang, source,
        |  CASE WHEN doc_id BETWEEN 200 AND 249 THEN n_chars + 11
        |       ELSE n_chars END AS n_chars
        |FROM documents""".stripMargin,

    // standard SQL time travel on the catalog table: VERSION AS OF 1
    // pins the pre-update CTAS state, so the oracle is the documents
    // table verbatim — hash equality proves the pinned read is exact
    // while the tip (snapshot_catalog above) carries the update
    "snapshot_catalog_asof" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents",

    // DSv2 catalog MERGE: the canonical keyed upsert (UPDATE SET * /
    // INSERT *) routed onto one transactional merge commit; the
    // oracle replays matched-updates ∪ new-key inserts relationally —
    // hash equality proves SQL MERGE ≡ the Scala merge commit
    "snapshot_dsv2_merge" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 9 = 4 THEN text || ' [m]' ELSE text END AS text,
        |  lang, source,
        |  CASE WHEN doc_id % 9 = 4 THEN n_chars + 3 ELSE n_chars END AS n_chars
        |FROM documents
        |UNION ALL
        |SELECT doc_id + 1000000 AS doc_id, text || ' [new]' AS text,
        |  lang, source, n_chars
        |FROM documents WHERE doc_id % 17 = 3""".stripMargin,

    // DSv2 MERGE, full action surface: conditioned matched DELETE
    // ahead of a PARTIAL target-referencing UPDATE (first-match-wins
    // cascade), conditioned partial-column INSERT (null-padded), and a
    // conditioned NOT MATCHED BY SOURCE DELETE — replayed branch by
    // branch: matched rows (doc_id%7=2) delete when 2*n_chars > 900
    // else update n_chars += 2*n_chars and tag the text (lang/source
    // carried from the target row); unmatched target rows in
    // [100,140] delete; new keys insert when n_chars <= 300 with
    // NULL text/lang
    "snapshot_dsv2_merge_cond" ->
      """WITH m AS (SELECT doc_id, 2 * n_chars AS nc FROM documents
        |           WHERE doc_id % 7 = 2)
        |SELECT d.doc_id,
        |  CASE WHEN m.doc_id IS NOT NULL THEN d.text || ' [c]'
        |       ELSE d.text END AS text,
        |  d.lang, d.source,
        |  CASE WHEN m.doc_id IS NOT NULL THEN d.n_chars + m.nc
        |       ELSE d.n_chars END AS n_chars
        |FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id
        |WHERE NOT (m.doc_id IS NOT NULL AND m.nc > 900)
        |  AND NOT (m.doc_id IS NULL AND d.doc_id BETWEEN 100 AND 140)
        |UNION ALL
        |SELECT doc_id + 2000000 AS doc_id, CAST(NULL AS VARCHAR) AS text,
        |  CAST(NULL AS VARCHAR) AS lang, source, n_chars
        |FROM documents WHERE doc_id % 13 = 5 AND n_chars <= 300""".stripMargin,

    // DSv2 MERGE with a COMPOUND ON (key equality AND t.source =
    // s.src2): matched pairs satisfy BOTH conjuncts (even doc_id%5=1
    // rows, whose src2 is the real source) and update; key-equal pairs
    // whose extra conjunct fails (odd doc_id%5=1 rows, src2='srcX')
    // are NOT matched, so the source row INSERTS — replacing the
    // key's existing row (the keyed format's upsert contract) with
    // null-padded text/lang and partition srcX; genuinely new keys
    // (+3000000) insert alongside
    "snapshot_dsv2_merge_on" ->
      """WITH m AS (
        |  SELECT doc_id, 3 * n_chars AS nc,
        |    CASE WHEN doc_id % 2 = 0 THEN source ELSE 'srcX' END AS src2
        |  FROM documents WHERE doc_id % 5 = 1
        |  UNION ALL
        |  SELECT doc_id + 3000000 AS doc_id, n_chars AS nc, source AS src2
        |  FROM documents WHERE doc_id % 19 = 2),
        |matched AS (
        |  SELECT d.doc_id, d.text || ' [on]' AS text, d.lang, d.source,
        |    d.n_chars + m.nc AS n_chars
        |  FROM documents d JOIN m ON d.doc_id = m.doc_id AND d.source = m.src2),
        |ins AS (
        |  SELECT m.doc_id, CAST(NULL AS VARCHAR) AS text,
        |    CAST(NULL AS VARCHAR) AS lang, m.src2 AS source, m.nc AS n_chars
        |  FROM m LEFT JOIN documents d
        |    ON d.doc_id = m.doc_id AND d.source = m.src2
        |  WHERE d.doc_id IS NULL)
        |SELECT doc_id, text, lang, source, n_chars FROM matched
        |UNION ALL
        |SELECT doc_id, text, lang, source, n_chars FROM ins
        |UNION ALL
        |SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
        |FROM documents d
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM matched)
        |  AND d.doc_id NOT IN (SELECT doc_id FROM ins)""".stripMargin,

    // COMPOSITE-KEY MERGE on a (source, lang)-partitioned table: the
    // relational replay of an upsert keyed on (lang, doc_id) — source
    // rows whose composite key exists update (doc_id%9=4, same lang);
    // rows re-delivering a KNOWN doc_id under a NEW lang (doc_id%17=3,
    // lang||'x') are NEW composite keys and must COEXIST with the
    // originals — a doc_id-only key would have replaced them
    "snapshot_multikey" ->
      """WITH m AS (
        |  SELECT doc_id, text || ' [mk]' AS text, lang, source,
        |    n_chars + 7 AS n_chars
        |  FROM documents WHERE doc_id % 9 = 4
        |  UNION ALL
        |  SELECT doc_id, text || ' [alt]' AS text, lang || 'x' AS lang,
        |    source, n_chars
        |  FROM documents WHERE doc_id % 17 = 3)
        |SELECT doc_id, text, lang, source, n_chars FROM m
        |UNION ALL
        |SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
        |FROM documents d
        |WHERE NOT EXISTS (SELECT 1 FROM m
        |  WHERE m.doc_id = d.doc_id AND m.lang = d.lang)""".stripMargin,

    // partition-spec evolution: the respec moved bytes, never rows —
    // the post-respec lang point-read equals the bare filter
    "snapshot_repartition" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents WHERE lang = 'fr'""".stripMargin,

    // days(ts) hidden partitioning: the result is the bare range
    // filter — pruning to the matching days' files must never change
    // semantics
    "snapshot_days_prune" ->
      """SELECT event_id, ts, user_id, event_type, value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-13 00:00:00'""".stripMargin,

    // SQL-declared tracking: the bloom point lookup on the
    // SQL-created table is the bare equality filter — bloom file
    // skipping is IO-only
    "snapshot_sql_tracking" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents WHERE n_chars = 500""".stripMargin,

    // prefix-range pruning: the bare LIKE 'src1%' — per-file string
    // min/max spans under the lexicographic compare are IO-only
    "snapshot_prefix" ->
      """SELECT doc_id, source, n_chars
        |FROM documents WHERE source LIKE 'src1%'""".stripMargin,

    // trigram substring index: the bare LIKE '%needle%' union —
    // per-file 3-gram filter pruning is IO-only (a kept file's rows
    // still pass the exact contains filter)
    "snapshot_substring" ->
      """SELECT needle, doc_id, n_chars FROM (
        |  SELECT 'vector join vector' AS needle, doc_id, n_chars
        |    FROM documents WHERE text LIKE '%vector join vector%'
        |  UNION ALL
        |  SELECT 'merge slow join' AS needle, doc_id, n_chars
        |    FROM documents WHERE text LIKE '%merge slow join%'
        |  UNION ALL
        |  SELECT 'the the' AS needle, doc_id, n_chars
        |    FROM documents WHERE text LIKE '%the the%')""".stripMargin,

    // hours(ts) hidden partitioning: the bare intra-day range filter
    // (the window sits inside the table's first-week slice, so the
    // slice predicate is subsumed) — hour pruning is IO-only
    "snapshot_hours_prune" ->
      """SELECT event_id, ts, user_id, event_type, value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-03 06:00:00'
        |  AND ts < TIMESTAMP '2024-01-03 18:00:00'""".stripMargin,

    // bucket(8, doc_id) hidden partitioning: the bare IN filter (the
    // absent key 999999 matches nothing) — the bucket-mapped prune is
    // IO-only
    "snapshot_bucket_prune" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents WHERE doc_id IN (7, 42, 103, 999999)""".stripMargin,

    // IN-list DELETE/UPDATE through the connector: three statements
    // replayed relationally — the IN delete (with an absent key), the
    // IN update, and an IN AND-ed with a range (only 202/203 pass)
    "snapshot_dsv2_dml_in" ->
      """SELECT doc_id, text,
        |  CASE WHEN doc_id IN (202, 203) THEN 'zz' ELSE lang END AS lang,
        |  source,
        |  CASE WHEN doc_id IN (55, 66, 77) THEN n_chars + 500
        |       ELSE n_chars END AS n_chars
        |FROM documents
        |WHERE doc_id NOT IN (11, 22, 33, 44, 1234567)""".stripMargin,

    // HALF-OPEN / STRICT bound DELETE/UPDATE: the retention sweep
    // (>= 400 deletes), an inclusive-below update (< 100) and a
    // strict-low/inclusive-high window (380 < id <= 390) replayed
    "snapshot_dsv2_dml_open" ->
      """SELECT doc_id, text,
        |  CASE WHEN doc_id > 380 AND doc_id <= 390 THEN 'yy'
        |       ELSE lang END AS lang,
        |  source,
        |  CASE WHEN doc_id < 100 THEN n_chars + 50
        |       ELSE n_chars END AS n_chars
        |FROM documents
        |WHERE NOT (doc_id >= 400)""".stripMargin,

    // DSv2 INSERT OVERWRITE: one transactional replace commit — the
    // SELECT's result IS the table afterward (old state time-travelable)
    "snapshot_dsv2_overwrite" ->
      """SELECT doc_id, text || ' [ow]' AS text, lang, source,
        |  n_chars + 10 AS n_chars
        |FROM documents WHERE doc_id % 3 = 0""".stripMargin,

    // PARTITION-SCOPED overwrite: exactly src3 is the transformed
    // re-delivery; every other partition carries forward untouched
    "snapshot_dsv2_overwrite_part" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
        |WHERE source <> 'src3'
        |UNION ALL
        |SELECT doc_id, text || ' [p]' AS text, lang, source,
        |  n_chars * 2 AS n_chars
        |FROM documents WHERE source = 'src3' AND doc_id % 2 = 0""".stripMargin,

    "snapshot_dsv2" ->
      """WITH s1 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' [v2]' ELSE text END AS text,
        |    lang,
        |    CASE WHEN doc_id % 7 = 0 AND doc_id % 3 = 0 THEN 'src_new'
        |         ELSE source END AS source,
        |    CASE WHEN doc_id % 7 = 0 THEN n_chars + 5 ELSE n_chars END AS n_chars
        |  FROM documents WHERE doc_id % 13 <> 0)
        |SELECT doc_id,
        |  CASE WHEN doc_id % 11 = 5 THEN text || ' [v3]' ELSE text END AS text,
        |  lang, source,
        |  CASE WHEN doc_id % 11 = 5 THEN n_chars + 7 ELSE n_chars END AS n_chars
        |FROM s1
        |WHERE doc_id % 23 <> 7 AND doc_id BETWEEN 100 AND 299""".stripMargin,

    // DSv2 AGGREGATE PUSHDOWN: plain-SQL count/min/max/sum over the
    // pinned-v3 catalog table folds the manifest stats (zero data-file
    // IO — spec-proven by deleting the files); the oracle replays both
    // merge change sets relationally and aggregates, so hash equality
    // proves the SQL fast path is the exact aggregate (snapshot_agg's
    // projection minus the HLL distinct, which SQL count(DISTINCT)
    // deliberately does NOT push — estimates must be asked for)
    "snapshot_dsv2_agg" ->
      """WITH s1 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN n_chars + 5 ELSE n_chars END AS n_chars
        |  FROM documents WHERE doc_id % 13 <> 0),
        |s2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 5 THEN n_chars + 7 ELSE n_chars END AS n_chars
        |  FROM s1 WHERE doc_id % 23 <> 7)
        |SELECT count(*) AS n_rows,
        |  count(doc_id) AS n_doc_id, min(doc_id) AS min_doc_id,
        |  max(doc_id) AS max_doc_id,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
        |  count(n_chars) AS n_n_chars, min(n_chars) AS min_n_chars,
        |  max(n_chars) AS max_n_chars,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_n_chars
        |FROM s2""".stripMargin,

    // point lookups over the snapshot v3 state: replay both change
    // sets, then `doc_id IN (5,13,14)` — 13 was deleted in v2 and
    // must be absent; hash equality proves bloom/stats eq-pruning is
    // an IO optimization only
    "snapshot_point" ->
      """WITH s1 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' [v2]' ELSE text END AS text,
        |    lang,
        |    CASE WHEN doc_id % 7 = 0 AND doc_id % 3 = 0 THEN 'src_new'
        |         ELSE source END AS source,
        |    CASE WHEN doc_id % 7 = 0 THEN n_chars + 5 ELSE n_chars END AS n_chars
        |  FROM documents WHERE doc_id % 13 <> 0)
        |SELECT doc_id,
        |  CASE WHEN doc_id % 11 = 5 THEN text || ' [v3]' ELSE text END AS text,
        |  lang, source,
        |  CASE WHEN doc_id % 11 = 5 THEN n_chars + 7 ELSE n_chars END AS n_chars
        |FROM s1
        |WHERE doc_id % 23 <> 7 AND doc_id IN (5, 13, 14)""".stripMargin,

    // predicate DML end state (v5): replay both merge change sets,
    // then the v4 range DELETE and the v5 range UPDATE relationally —
    // hash equality proves the file-granularity pruned rewrite is
    // exactly SQL DELETE/UPDATE semantics
    "snapshot_dml" ->
      """WITH s1 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' [v2]' ELSE text END AS text,
        |    lang,
        |    CASE WHEN doc_id % 7 = 0 AND doc_id % 3 = 0 THEN 'src_new'
        |         ELSE source END AS source,
        |    CASE WHEN doc_id % 7 = 0 THEN n_chars + 5 ELSE n_chars END AS n_chars
        |  FROM documents WHERE doc_id % 13 <> 0),
        |s2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 5 THEN text || ' [v3]' ELSE text END AS text,
        |    lang, source,
        |    CASE WHEN doc_id % 11 = 5 THEN n_chars + 7 ELSE n_chars END AS n_chars
        |  FROM s1 WHERE doc_id % 23 <> 7),
        |s3 AS (
        |  SELECT * FROM s2 WHERE doc_id NOT BETWEEN 150 AND 199)
        |SELECT doc_id, text,
        |  CASE WHEN doc_id BETWEEN 300 AND 349 THEN 'xx' ELSE lang END AS lang,
        |  source,
        |  CASE WHEN doc_id BETWEEN 300 AND 349 THEN n_chars + 1000
        |       ELSE n_chars END AS n_chars
        |FROM s3""".stripMargin,

    // non-additive schema evolution end state: replay rename (alias),
    // drop (omission), the merge under the mapping, widen (cast) and
    // the re-adding merge relationally — hash equality proves old
    // bytes serve under new logical names, int/bigint file vintages
    // read as one type, and the re-added `lang` NEVER resurrects the
    // dropped bytes (null everywhere except the second merge's rows)
    "snapshot_evolution" ->
      """WITH base AS (
        |  SELECT doc_id, text, source, n_chars,
        |         CAST(n_chars % 1000 AS INTEGER) AS n_small
        |  FROM documents),
        |u1 AS (
        |  SELECT doc_id, text || ' [evo]' AS body, source,
        |         n_chars + 3 AS n_chars, n_small + 1 AS n_small
        |  FROM base WHERE doc_id % 9 = 0 AND doc_id % 17 <> 0),
        |s1 AS (
        |  SELECT doc_id, body, source, n_chars, n_small FROM u1
        |  UNION ALL
        |  SELECT doc_id, text AS body, source, n_chars, n_small FROM base
        |  WHERE doc_id % 17 <> 0 AND doc_id % 9 <> 0),
        |u2 AS (
        |  SELECT doc_id, body || ' [v4]' AS body, source, n_chars,
        |         CAST(n_small AS BIGINT) + 5000000000 AS n_small,
        |         'readd' AS lang
        |  FROM s1 WHERE doc_id % 10 = 1)
        |SELECT doc_id, body, source, n_chars,
        |       CAST(n_small AS BIGINT) AS n_small,
        |       CAST(NULL AS VARCHAR) AS lang
        |FROM s1 WHERE doc_id % 10 <> 1
        |UNION ALL
        |SELECT doc_id, body, source, n_chars, n_small, lang FROM u2""".stripMargin,

    // evolution + full-table compaction (retired-column purge): the
    // compact commit is a PURE PHYSICAL rewrite — rows materialize
    // under the current column mapping and the dropped column's bytes
    // leave the data files — so the oracle is the snapshot_evolution
    // replay verbatim; hash equality proves the purge moved bytes,
    // never rows
    "snapshot_evolution_compact" ->
      """WITH base AS (
        |  SELECT doc_id, text, source, n_chars,
        |         CAST(n_chars % 1000 AS INTEGER) AS n_small
        |  FROM documents),
        |u1 AS (
        |  SELECT doc_id, text || ' [evo]' AS body, source,
        |         n_chars + 3 AS n_chars, n_small + 1 AS n_small
        |  FROM base WHERE doc_id % 9 = 0 AND doc_id % 17 <> 0),
        |s1 AS (
        |  SELECT doc_id, body, source, n_chars, n_small FROM u1
        |  UNION ALL
        |  SELECT doc_id, text AS body, source, n_chars, n_small FROM base
        |  WHERE doc_id % 17 <> 0 AND doc_id % 9 <> 0),
        |u2 AS (
        |  SELECT doc_id, body || ' [v4]' AS body, source, n_chars,
        |         CAST(n_small AS BIGINT) + 5000000000 AS n_small,
        |         'readd' AS lang
        |  FROM s1 WHERE doc_id % 10 = 1)
        |SELECT doc_id, body, source, n_chars,
        |       CAST(n_small AS BIGINT) AS n_small,
        |       CAST(NULL AS VARCHAR) AS lang
        |FROM s1 WHERE doc_id % 10 <> 1
        |UNION ALL
        |SELECT doc_id, body, source, n_chars, n_small, lang FROM u2""".stripMargin,

    // merge-on-read delete end state (v7): replay both merge change
    // sets, the v4/v5 copy-on-write DML AND the v6/v7 deletion-vector
    // deletes (doc_id 400-449 ∪ 430-480 = 400-480) relationally —
    // hash equality proves the position-mask read path is exactly SQL
    // DELETE, cumulative across overlapping vectors
    "snapshot_mor" ->
      """WITH s1 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' [v2]' ELSE text END AS text,
        |    lang,
        |    CASE WHEN doc_id % 7 = 0 AND doc_id % 3 = 0 THEN 'src_new'
        |         ELSE source END AS source,
        |    CASE WHEN doc_id % 7 = 0 THEN n_chars + 5 ELSE n_chars END AS n_chars
        |  FROM documents WHERE doc_id % 13 <> 0),
        |s2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 5 THEN text || ' [v3]' ELSE text END AS text,
        |    lang, source,
        |    CASE WHEN doc_id % 11 = 5 THEN n_chars + 7 ELSE n_chars END AS n_chars
        |  FROM s1 WHERE doc_id % 23 <> 7),
        |s3 AS (
        |  SELECT * FROM s2 WHERE doc_id NOT BETWEEN 150 AND 199)
        |SELECT doc_id, text,
        |  CASE WHEN doc_id BETWEEN 300 AND 349 THEN 'xx' ELSE lang END AS lang,
        |  source,
        |  CASE WHEN doc_id BETWEEN 300 AND 349 THEN n_chars + 1000
        |       ELSE n_chars END AS n_chars
        |FROM s3
        |WHERE doc_id NOT BETWEEN 400 AND 480""".stripMargin,

    // manifest-only aggregate over the snapshot v3 state: replay both
    // merge change sets and aggregate the rebuilt state one-shot —
    // hash equality proves the driver-side fold of per-file
    // rows/nulls/min/max/sum stats is the exact global aggregate, and
    // the nd_doc_id replay (portable md5-prefix HLL registers rebuilt
    // from the state, same estimator as field_stats_approx) proves the
    // per-file sketch UNION is bit-identical to a whole-table sketch
    // (graft opened ZERO data files to answer any of it)
    "snapshot_agg" ->
      s"""WITH RECURSIVE $pow2Ctes,
        |lct AS (SELECT $hllLinearCountLits AS lc),
        |s1 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN n_chars + 5 ELSE n_chars END AS n_chars
        |  FROM documents WHERE doc_id % 13 <> 0),
        |s2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 5 THEN n_chars + 7 ELSE n_chars END AS n_chars
        |  FROM s1 WHERE doc_id % 23 <> 7),
        |h AS (SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13) AS BIGINT) AS h52
        |      FROM s2 WHERE doc_id IS NOT NULL),
        |reg AS (
        |  SELECT h52 >> 40 AS idx, MAX($hllRankCaseSql) AS r
        |  FROM (SELECT h52, h52 & ${(1L << 40) - 1} AS rem FROM h)
        |  GROUP BY 1),
        |sk AS (SELECT CAST(SUM(CAST(1 AS BIGINT) << (41 - r)) AS BIGINT) AS s_present,
        |              COUNT(*) AS m_present FROM reg),
        |est AS (SELECT (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096 * 4096 /
        |          (CAST(s_present + (4096 - m_present) * ${1L << 41} AS DOUBLE)
        |            / ${(1L << 41).toDouble}) AS e_raw,
        |        4096 - m_present AS zeros
        |       FROM sk),
        |dc AS (SELECT CASE WHEN e_raw <= 10240.0 AND zeros > 0 THEN lc[CAST(zeros AS INT)]
        |            ELSE CAST(ROUND(e_raw) AS BIGINT) END AS nd
        |       FROM est, lct)
        |SELECT count(*) AS n_rows,
        |  count(doc_id) AS n_doc_id, min(doc_id) AS min_doc_id,
        |  max(doc_id) AS max_doc_id,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
        |  count(n_chars) AS n_n_chars, min(n_chars) AS min_n_chars,
        |  max(n_chars) AS max_n_chars,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_n_chars,
        |  (SELECT nd FROM dc) AS nd_doc_id
        |FROM s2""".stripMargin,

    // HYBRID manifest aggregate at the tip (v7, deletion vectors
    // live): replay ALL five DML waves on (doc_id, n_chars), then the
    // same aggregate + portable-HLL replay as snapshot_agg — hash
    // equality proves the clean-files-folded / dirty-files-scanned
    // split is seamless
    "snapshot_agg_mor" ->
      s"""WITH RECURSIVE $pow2Ctes,
        |lct AS (SELECT $hllLinearCountLits AS lc),
        |s1 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN n_chars + 5 ELSE n_chars END AS n_chars
        |  FROM documents WHERE doc_id % 13 <> 0),
        |s2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 5 THEN n_chars + 7 ELSE n_chars END AS n_chars
        |  FROM s1 WHERE doc_id % 23 <> 7),
        |s3 AS (SELECT * FROM s2 WHERE doc_id NOT BETWEEN 150 AND 199),
        |s4 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id BETWEEN 300 AND 349 THEN n_chars + 1000
        |         ELSE n_chars END AS n_chars
        |  FROM s3),
        |st AS (SELECT * FROM s4 WHERE doc_id NOT BETWEEN 400 AND 480),
        |h AS (SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13) AS BIGINT) AS h52
        |      FROM st WHERE doc_id IS NOT NULL),
        |reg AS (
        |  SELECT h52 >> 40 AS idx, MAX($hllRankCaseSql) AS r
        |  FROM (SELECT h52, h52 & ${(1L << 40) - 1} AS rem FROM h)
        |  GROUP BY 1),
        |sk AS (SELECT CAST(SUM(CAST(1 AS BIGINT) << (41 - r)) AS BIGINT) AS s_present,
        |              COUNT(*) AS m_present FROM reg),
        |est AS (SELECT (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096 * 4096 /
        |          (CAST(s_present + (4096 - m_present) * ${1L << 41} AS DOUBLE)
        |            / ${(1L << 41).toDouble}) AS e_raw,
        |        4096 - m_present AS zeros
        |       FROM sk),
        |dc AS (SELECT CASE WHEN e_raw <= 10240.0 AND zeros > 0 THEN lc[CAST(zeros AS INT)]
        |            ELSE CAST(ROUND(e_raw) AS BIGINT) END AS nd
        |       FROM est, lct)
        |SELECT count(*) AS n_rows,
        |  count(doc_id) AS n_doc_id, min(doc_id) AS min_doc_id,
        |  max(doc_id) AS max_doc_id,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
        |  count(n_chars) AS n_n_chars, min(n_chars) AS min_n_chars,
        |  max(n_chars) AS max_n_chars,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_n_chars,
        |  (SELECT nd FROM dc) AS nd_doc_id
        |FROM st""".stripMargin,

    // change feed between snapshot versions v2 and v3: rebuild both
    // committed states relationally, then the same md5 full-outer
    // delta as corpus_delta — removed = the %23 deletions, updated =
    // the %11 revisions, everything else unchanged (no adds in the
    // v3 change set)
    "snapshot_delta" ->
      """WITH s1 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' [v2]' ELSE text END AS text
        |  FROM documents WHERE doc_id % 13 <> 0),
        |s2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 5 THEN text || ' [v3]' ELSE text END AS text
        |  FROM s1 WHERE doc_id % 23 <> 7),
        |o AS (SELECT doc_id, md5(text) AS old_hash FROM s1),
        |n AS (SELECT doc_id, md5(text) AS new_hash FROM s2)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN old_hash IS NULL THEN 'added'
        |       WHEN new_hash IS NULL THEN 'removed'
        |       WHEN old_hash = new_hash THEN 'unchanged'
        |       ELSE 'updated' END AS status,
        |  old_hash, new_hash
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""".stripMargin,

    // incremental aggregate maintenance: the oracle aggregates the
    // merged end state ONE-SHOT (same change set as corpus_merge);
    // hash equality against the delta-maintained table proves
    // maintenance ≡ full recompute — the sums accumulate as
    // decimal(38,6) on both engines (order-free exactness), then the
    // final projection casts to DOUBLE like every other monetary
    // entry (exact: integer char-count sums ≪ 2^53)
    "agg_maintain" ->
      """WITH m AS (
        |  SELECT CASE WHEN doc_id % 7 = 0 AND doc_id % 13 <> 0 AND doc_id % 3 = 0
        |              THEN 'src_new' ELSE source END AS source,
        |         CASE WHEN doc_id % 7 = 0 AND doc_id % 13 <> 0
        |              THEN n_chars + 5 ELSE n_chars END AS n_chars
        |  FROM documents WHERE doc_id % 13 <> 0)
        |SELECT source, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(n_chars AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_n_chars
        |FROM m GROUP BY source""".stripMargin)

  /** Script-profile oracle, generated from the same ScriptClasses /
    * ScriptSnippets constants the Spark query uses — one source of
    * truth for patterns and snippet order. */
  private lazy val textScriptOracle: String = {
    val snippets = Queries.ScriptSnippets.map(s => s"'$s'").mkString("[", ", ", "]")
    val classes = TextAnalysisCols.ScriptClasses
    val countCols = classes.map { case (n, cls) =>
      s"CAST(length(t) - length(regexp_replace(t, '$cls', '', 'g')) AS BIGINT) AS n_$n"
    }.mkString(",\n    ")
    val names = classes.map(_._1)
    val m = names.map(n => s"n_$n").mkString("GREATEST(", ", ", ")")
    val mainCase = names.map(n =>
      s"WHEN n_$n > 0 AND n_$n = $m THEN '$n'").mkString("CASE ", " ", " ELSE 'none' END")
    s"""WITH d AS (
       |  SELECT doc_id,
       |    text || ($snippets)[CAST(doc_id % 5 + 1 AS INT)] AS t
       |  FROM documents),
       |c AS (
       |  SELECT doc_id,
       |    $countCols,
       |    CAST(length(regexp_replace(t, '\\s', '', 'g')) AS BIGINT) AS n_nonspace
       |  FROM d)
       |SELECT doc_id, ${names.map(n => s"n_$n").mkString(", ")}, n_nonspace,
       |  $mainCase AS main_script,
       |  CASE WHEN ($mainCase) = 'none' THEN 0.0
       |       ELSE CAST($m AS DOUBLE) / CAST(n_nonspace AS DOUBLE) END AS main_frac
       |FROM c""".stripMargin
  }

  private lazy val decontaminateOracle: String = {
    val lowTokens =
      """CASE WHEN length(trim(lower(text))) = 0 THEN [] ELSE regexp_split_to_array(trim(lower(text)), '\s+') END"""
    s"""WITH fp AS (
       |  SELECT doc_id, md5(array_to_string(list_sort($lowTokens), ' ')) AS f
       |  FROM documents)
       |SELECT d.doc_id FROM fp d
       |WHERE d.f NOT IN (SELECT f FROM fp WHERE doc_id % 97 = 0)""".stripMargin
  }
}
