package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.graftbridge.DatasetBridge

import graft.plans.SkylineSqlParser

/** The full graft SQL surface for one statement: Spark's own grammar
  * plus the `SKYLINE OF` / `SKYCUBE OF` clause
  * ([[graft.plans.SkylineSqlParser]]) plus DML routing on registered
  * commit-log views ([[GraftDml]]). Sessions built with
  * [[graft.plans.GraftExtensions]] get this through plain
  * `spark.sql(...)`; host-owned sessions call [[GraftSql.sql]]. */
class GraftSqlParser(delegate: ParserInterface)
    extends SkylineSqlParser(delegate) {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftMaintenance.intercept(sqlText)
      .getOrElse(GraftDml.rewrite(super.parsePlan(sqlText)))
}

/** Maintenance + DDL verbs — the operational statements a lakehouse
  * SQL user expects beside DML (the Delta verb surface, routed to this
  * log's operators):
  *
  *   OPTIMIZE <view>                      file compaction + manifest fold
  *   OPTIMIZE <view> ZORDER BY (<c1>, <c2>, …)
  *                                        multi-dimensional re-cluster:
  *                                        one rewrite commit lands the
  *                                        z-ordered layout, zone maps
  *                                        tighten on every dim (r16)
  *   VACUUM <view> RETAIN <n> VERSIONS    retire history past n versions
  *   VACUUM <view> RETAIN <n> VERSIONS DRY RUN
  *                                        the file count the real verb
  *                                        would retire; deletes nothing
  *                                        (r16)
  *   RESTORE TABLE <view> TO VERSION AS OF <n>
  *                                        roll the head back to version
  *                                        n by reference (r16)
  *   COPY INTO <view> FROM '<dir>'        idempotent bulk ingest: load
  *                                        the landing dir's parquet
  *                                        files exactly once, re-run
  *                                        safe; drift/CHECK-gated
  *                                        ([[graft.sources.CopyInto]],
  *                                        r16)
  *   SHOW CREATE TABLE <view>             the statements that recreate
  *                                        the declared surface (r16)
  *   DESCRIBE DIFF <view> FROM <v1> TO <v2> KEY (k, …)
  *                                        snapshot diff: keys added/
  *                                        removed/changed between two
  *                                        versions, any verb history
  *                                        (r16)
  *   TRUNCATE TABLE <view>                one commit to a zero-row
  *                                        schema-bearing state; history
  *                                        stays time-travelable (r16)
  *   DESCRIBE HISTORY <view>              one row per retained version
  *   DESCRIBE DETAIL <view>               the head manifest's card
  *   ALTER TABLE <view> ADD CONSTRAINT <name> CHECK (<expr>)
  *                                        extend the persisted CHECK set
  *                                        (live rows validated first)
  *   ALTER TABLE <view> DROP CONSTRAINT <name>
  *                                        retire one check (the last one
  *                                        clears the set)
  *
  * SQL DDL (VERDICT r14 directive #2), active only when the session
  * has a graft warehouse configured
  * (`SET spark.graft.warehouse = <root>`):
  *
  *   CREATE TABLE <name> AS <select>      CTAS → commit-log table under
  *                                        <warehouse>/<name>, zone maps
  *                                        on every eligible column,
  *                                        registered (view + rules +
  *                                        DML router) and cataloged
  *   CREATE TABLE <name> CLUSTER BY (<col>) AS <select>
  *                                        CTAS onto the range-clustered
  *                                        layout (one file per bucket
  *                                        value run) — the layout point
  *                                        probes and REPLACE WHERE are
  *                                        built for (r16)
  *   INSERT INTO <t> REPLACE WHERE <col> = <lit> <select>
  *   INSERT INTO <t> REPLACE WHERE <col> BETWEEN <lo> AND <hi> <select>
  *                                        atomic RESTATEMENT (Delta's
  *                                        replaceWhere): one commit
  *                                        swaps exactly the files in
  *                                        the range for the SELECT's
  *                                        rows; straddling files,
  *                                        escaping rows, CHECK
  *                                        violations and schema drift
  *                                        all refuse loudly (r16)
  *   CREATE TABLE <name> FROM PARQUET '<dir>'
  *                                        ZERO-COPY adoption of an
  *                                        existing parquet directory
  *                                        (CONVERT TO DELTA's shape):
  *                                        the dir becomes the table
  *                                        root — stats-pass cost, no
  *                                        byte moves; hive-partitioned
  *                                        layouts refuse loudly (r16)
  *   CREATE TABLE <name> (<col type, …>)  empty table with a declared
  *                                        schema (r16 — the ingest-
  *                                        lands-later pattern): one
  *                                        zero-row stats-bearing commit,
  *                                        registered + cataloged, ready
  *                                        for INSERT / streaming ingest
  *   DROP TABLE <name>                    unregister + drop the catalog
  *                                        entry (data + history stay on
  *                                        disk — external-table
  *                                        semantics; VACUUM first to
  *                                        retire bytes)
  *   RESTORE CATALOG                      one-call session bootstrap:
  *                                        every cataloged table gets its
  *                                        pinned view, the rule pair,
  *                                        DML routing, and every
  *                                        persisted MV's rewrite rule
  *   CREATE MATERIALIZED VIEW <n> AS      build the summary table under
  *     SELECT <group cols, count(*) AS c, <warehouse>/<n>, persist the
  *       sum/min/max(m) AS a, …>          MvDef in the catalog, attach
  *     FROM <table> [WHERE p] GROUP BY …  the transparent rewrite rule
  *                                        (freshness-gated; r16)
  *   REFRESH MATERIALIZED VIEW <n>        incremental fold of the base
  *                                        versions committed since the
  *                                        last refresh (never a rescan)
  *   DROP MATERIALIZED VIEW <n>           retire the MvDef + this
  *                                        session's rule; summary data
  *                                        stays (external semantics)
  *
  * Qualified names (r16): every verb target accepts
  * `<alias>.<name>`, `<schema>.<table>` (a schema namespace in the
  * session warehouse — catalog key `schema.table`, data under
  * `<wh>/<schema>/<table>`), and `<alias>.<schema>.<table>`; a bound
  * alias always wins over a schema reading of the same two-part
  * name. `SHOW SCHEMAS [IN <alias>]` lists the schema prefixes.
  *
  * Statements naming an UNREGISTERED table — or any CREATE/DROP when
  * neither a graft warehouse nor a named alias is configured — fall
  * through to Spark's own grammar untouched (`DESCRIBE history` stays
  * a describe of a table named history; `CREATE TABLE ... AS` without
  * the conf stays a Spark catalog CTAS). */
private[sql] object GraftMaintenance {

  import org.apache.spark.sql.SparkSession
  import graft.sources.{Catalog, CommitLog, Constraints, MvIncremental,
    TableInfo}

  /** Session conf key naming the graft warehouse root — the DDL gate. */
  val WarehouseKey = "spark.graft.warehouse"

  private val Optimize =
    "(?is)^\\s*OPTIMIZE\\s+(\\w+(?:\\.\\w+){0,2})\\s*;?\\s*$".r
  private val OptimizeZ =
    ("(?is)^\\s*OPTIMIZE\\s+(\\w+(?:\\.\\w+){0,2})\\s+ZORDER\\s+BY\\s*" +
      "\\(\\s*(\\w+(?:\\s*,\\s*\\w+)+)\\s*\\)\\s*;?\\s*$").r
  private val RestoreTable =
    ("(?is)^\\s*RESTORE\\s+TABLE\\s+(\\w+(?:\\.\\w+){0,2})\\s+TO\\s+" +
      "VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*$").r
  private val Copy =
    ("(?is)^\\s*COPY\\s+INTO\\s+(\\w+(?:\\.\\w+){0,2})\\s+FROM\\s+" +
      "'([^']+)'\\s*;?\\s*$").r
  private val ShowCreate =
    "(?is)^\\s*SHOW\\s+CREATE\\s+TABLE\\s+(\\w+(?:\\.\\w+){0,2})\\s*;?\\s*$".r
  private val Diff =
    ("(?is)^\\s*DESCRIBE\\s+DIFF\\s+(\\w+(?:\\.\\w+){0,2})\\s+FROM\\s+(\\d+)" +
      "\\s+TO\\s+(\\d+)\\s+KEY\\s*\\(\\s*(\\w+(?:\\s*,\\s*\\w+)*)\\s*\\)" +
      "\\s*;?\\s*$").r
  private val Truncate =
    "(?is)^\\s*TRUNCATE\\s+TABLE\\s+(\\w+(?:\\.\\w+){0,2})\\s*;?\\s*$".r
  private val Vacuum =
    ("(?is)^\\s*VACUUM\\s+(\\w+(?:\\.\\w+){0,2})\\s+RETAIN\\s+(\\d+)" +
      "\\s+VERSIONS(\\s+DRY\\s+RUN)?\\s*;?\\s*$").r
  private val History =
    "(?is)^\\s*DESCRIBE\\s+HISTORY\\s+(\\w+(?:\\.\\w+){0,2})\\s*;?\\s*$".r
  private val Detail =
    "(?is)^\\s*DESCRIBE\\s+DETAIL\\s+(\\w+(?:\\.\\w+){0,2})\\s*;?\\s*$".r
  private val ShowTables =
    "(?is)^\\s*SHOW\\s+TABLES\\s+IN\\s+(\\w+(?:\\.\\w+)?)\\s*;?\\s*$".r
  private val ShowSchemas =
    "(?is)^\\s*SHOW\\s+SCHEMAS(?:\\s+IN\\s+(\\w+))?\\s*;?\\s*$".r
  private val Create =
    ("(?is)^\\s*CREATE\\s+TABLE\\s+(\\w+(?:\\.\\w+){0,2})" +
      "(?:\\s+CLUSTER\\s+BY\\s*\\(\\s*(\\w+)\\s*\\))?" +
      "\\s+AS\\s+(.+?)\\s*;?\\s*$").r
  private val ReplaceWhere =
    ("(?is)^\\s*INSERT\\s+INTO\\s+(\\w+(?:\\.\\w+){0,2})\\s+REPLACE\\s+WHERE\\s+" +
      "(\\w+)\\s*(?:=\\s*('[^']*'|-?\\d+)|BETWEEN\\s+('[^']*'|-?\\d+)" +
      "\\s+AND\\s+('[^']*'|-?\\d+))\\s+(SELECT\\s.+?)\\s*;?\\s*$").r
  private val CreateSchema =
    "(?is)^\\s*CREATE\\s+TABLE\\s+(\\w+(?:\\.\\w+){0,2})\\s*\\((.+)\\)\\s*;?\\s*$".r
  private val AdoptTable =
    ("(?is)^\\s*CREATE\\s+TABLE\\s+(\\w+(?:\\.\\w+){0,2})\\s+FROM\\s+" +
      "PARQUET\\s+'([^']+)'\\s*;?\\s*$").r
  private val Drop = "(?is)^\\s*DROP\\s+TABLE\\s+(\\w+(?:\\.\\w+){0,2})\\s*;?\\s*$".r
  private val Restore = "(?is)^\\s*RESTORE\\s+CATALOG\\s*;?\\s*$".r
  private val AddCheck =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+(\\w+(?:\\.\\w+){0,2})\\s+ADD\\s+CONSTRAINT" +
      "\\s+(\\w+)\\s+CHECK\\s*\\((.*)\\)\\s*;?\\s*$").r
  private val DropCheck =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+(\\w+(?:\\.\\w+){0,2})\\s+DROP\\s+CONSTRAINT" +
      "\\s+(\\w+)\\s*;?\\s*$").r
  private val CreateMv =
    ("(?is)^\\s*CREATE\\s+MATERIALIZED\\s+VIEW\\s+(\\w+)\\s+AS\\s+" +
      "SELECT\\s+(.+?)\\s+FROM\\s+(\\w+(?:\\.\\w+){0,2})" +
      "(?:\\s+WHERE\\s+(.+?))?\\s+GROUP\\s+BY\\s+(.+?)\\s*;?\\s*$").r
  private val DropMv =
    "(?is)^\\s*DROP\\s+MATERIALIZED\\s+VIEW\\s+(\\w+)\\s*;?\\s*$".r
  private val RefreshMv =
    "(?is)^\\s*REFRESH\\s+MATERIALIZED\\s+VIEW\\s+(\\w+)\\s*;?\\s*$".r
  private val ShowMvs =
    "(?is)^\\s*SHOW\\s+MATERIALIZED\\s+VIEWS(?:\\s+IN\\s+(\\w+))?\\s*;?\\s*$".r

  private def warehouse: Option[String] =
    SparkSession.getActiveSession
      .flatMap(_.conf.getOption(WarehouseKey)).filter(_.nonEmpty)

  private def lc(name: String) = name.toLowerCase(java.util.Locale.ROOT)

  /** Resolve a (possibly two-part) verb target: a bare name through
    * the session registry, `<alias>.<name>` through the persisted
    * catalog (the DML rule, r14 #6, applied to the maintenance
    * verbs). */
  private def resolveTarget(name: String): Option[String] =
    if (name.contains('.'))
      GraftDml.catalogResolve(name.split("\\.").toSeq)
    else GraftTables.lookupActive(name)

  /** Run-time re-resolution in the EXECUTING session (ADVICE r15):
    * a maintenance plan parsed under one session must not retire
    * files or mutate the CHECK set of a table the executing session
    * never registered — the [[GraftDmlCommand]] discipline, applied
    * to the maintenance verbs. */
  private[sql] def reResolve(s: SparkSession, name: String)
      : Option[String] =
    if (name.contains('.'))
      GraftDml.catalogResolve(s, name.split("\\.").toSeq)
    else GraftTables.lookup(s, name)

  /** Resolve a CREATE/DROP TABLE name to (warehouse root, catalog
    * key) at RUN time in the executing session (r16 — qualified DDL
    * names). One part: the session warehouse, key = name. Two parts
    * `a.b`: a BOUND alias `a` wins (create `b` in that warehouse, the
    * read-path precedence); otherwise `a` is a SCHEMA in the session
    * warehouse, key = `a.b`. Three parts `alias.schema.table`: the
    * alias must be bound. Keys keep their dots in the catalog; the
    * table root nests (`<wh>/<schema>/<table>`). */
  private def ddlTarget(s: SparkSession, name: String, verb: String)
      : (String, String) = {
    def aliasRoot(a: String): Option[String] =
      s.conf.getOption(s"spark.graft.catalog.$a").filter(_.nonEmpty)
    lc(name).split("\\.").toSeq match {
      case Seq(t) => (requireWarehouse(s, verb), t)
      case Seq(a, t) => aliasRoot(a) match {
        case Some(wh) => (wh, t)
        case None => (requireWarehouse(s, verb), s"$a.$t")
      }
      case Seq(a, sch, t) => (aliasRoot(a).getOrElse(
        throw new IllegalArgumentException(
          s"$verb $name needs SET spark.graft.catalog.$a = <root> " +
            "in this session")), s"$sch.$t")
      case _ => throw new IllegalArgumentException(
        s"unsupported table name '$name'")
    }
  }

  private def rootOf(wh: String, key: String): String =
    s"$wh/${key.replace('.', '/')}"

  /** CTAS: run the SELECT, land ONE stats-bearing commit under
    * <warehouse>/<name>, register + catalog. Eligible zone-map columns
    * (integral/date/timestamp/string) are statted so the fresh table
    * is prunable from its first SELECT. `CLUSTER BY (<col>)` (r16)
    * lands the range-clustered layout instead — one file set bucketed
    * by the column via [[CommitLog.replaceClustered]], the layout
    * REPLACE WHERE and point probes are built for; the bucket rides
    * only in directory names, so readers see the select's columns
    * unchanged. Cardinality caveat, stated: the layout is one
    * directory per DISTINCT cluster value (the Hive-partition shape —
    * right for date/month/category columns; a near-unique key
    * explodes the namespace — use `OPTIMIZE … ZORDER BY` for
    * high-cardinality clustering). Resolution happens at RUN time in
    * the EXECUTING session — the command captures only names. */
  private def runCreate(s: SparkSession, name: String,
      cluster: Option[String], select: String): Long = {
    val (wh, key) = ddlTarget(s, name, "CREATE TABLE")
    require(!Catalog.entries(s, wh).contains(key),
      s"table '$name' already exists in the catalog at $wh — " +
        "DROP TABLE it first")
    val table = rootOf(wh, key)
    require(CommitLog.currentVersion(s, table).isEmpty,
      s"$table already holds a commit log — DROP TABLE leaves data in " +
        "place; choose another name or vacuum the directory")
    val df = s.sql(select)
    import org.apache.spark.sql.types._
    val eligible = df.schema.fields.collect {
      case f if Seq(ByteType, ShortType, IntegerType, LongType, DateType,
        TimestampType, StringType).contains(f.dataType) => f.name
    }.toSeq
    val v = cluster match {
      case Some(c) =>
        require(eligible.contains(c),
          s"CLUSTER BY column '$c' must be a selected integral/date/" +
            "timestamp/string column")
        CommitLog.replaceClustered(s,
          df.withColumn("__bk", org.apache.spark.sql.functions.col(c)),
          table, "__bk", c +: eligible.filterNot(_ == c))
      case None =>
        if (eligible.nonEmpty) CommitLog.appendWithStats(s, df, table, eligible)
        else CommitLog.append(s, df, table)
    }
    GraftTables.register(s, table, key)
    Catalog.register(s, wh, key, table)
    v
  }

  /** Zero-copy adoption ([[CommitLog.adoptParquet]]): the existing
    * directory BECOMES the table root — no byte moves; registered and
    * cataloged under the resolved name like any CTAS. */
  private def runAdopt(s: SparkSession, name: String, dir: String): Long = {
    val (wh, key) = ddlTarget(s, name, "CREATE TABLE")
    require(!Catalog.entries(s, wh).contains(key),
      s"table '$name' already exists in the catalog at $wh — " +
        "DROP TABLE it first")
    val v = CommitLog.adoptParquet(s, dir)
    GraftTables.register(s, dir, key)
    Catalog.register(s, wh, key, dir)
    v
  }

  /** One REPLACE WHERE bound: a quoted string or an integer. */
  private def boundOf(l: String): Either[String, Long] =
    if (l.startsWith("'")) Left(l.substring(1, l.length - 1))
    else Right(l.toLong)

  private def runReplaceWhere(s: SparkSession, table: String,
      colName: String, lo: String, hi: String, select: String): Long = {
    val df = GraftSql.sql(s, select)
    val bounds = (boundOf(lo), boundOf(hi)) match {
      case (Left(l), Left(h)) => Left((l, h))
      case (Right(l), Right(h)) => Right((l, h))
      case _ => throw new IllegalArgumentException(
        "REPLACE WHERE bounds must be both strings or both integers")
    }
    Constraints.checkedReplaceWhere(s, df, table, colName, bounds) match {
      case Right(v) => v
      case Left(bad) => throw new IllegalArgumentException(
        "REPLACE WHERE batch violates CHECK constraints: " +
          bad.map { case (n, c) => s"$n ($c rows)" }.mkString(", "))
    }
  }

  private def runDrop(s: SparkSession, name: String): Long = {
    val (wh, key) = ddlTarget(s, name, "DROP TABLE")
    val table = Catalog.entries(s, wh).getOrElse(key,
      throw new IllegalArgumentException(
        s"table '$name' is not in the catalog at $wh"))
    GraftTables.unregister(s, table, key)
    Catalog.drop(s, wh, key)
  }

  /** Parse-time engagement test for DROP TABLE: does the name resolve
    * to a cataloged entry under the session's warehouse or a bound
    * alias? (A Spark-catalog DROP keeps Spark's own surface.) */
  private def dropResolves(name: String): Boolean =
    SparkSession.getActiveSession.exists { s =>
      try {
        val (wh, key) = ddlTarget(s, name, "DROP TABLE")
        Catalog.entries(s, wh).contains(key)
      } catch { case _: IllegalArgumentException => false }
    }

  private def requireWarehouse(s: SparkSession, verb: String): String =
    s.conf.getOption(WarehouseKey).filter(_.nonEmpty).getOrElse(
      throw new IllegalArgumentException(
        s"$verb needs SET $WarehouseKey = <root> in this session"))

  /** Parse-time CREATE engagement: the session opted into a graft
    * warehouse, OR the name's first part is a bound warehouse alias
    * (`CREATE TABLE wh1.web.docs …` needs only the alias conf). */
  private def ddlEngages(name: String): Boolean =
    warehouse.isDefined || (name.contains('.') &&
      SparkSession.getActiveSession.exists(s =>
        s.conf.getOption(
          s"spark.graft.catalog.${lc(name.split("\\.")(0))}")
          .exists(_.nonEmpty)))

  /** SHOW TABLES IN <alias> (whole catalog), `<alias>.<schema>`
    * (one schema of a bound alias), or `<schema>` (a schema of the
    * session warehouse — only when that schema has entries, so an
    * unbound bare name keeps Spark's own surface). */
  private def showTables(target: String): Option[LogicalPlan] =
    SparkSession.getActiveSession.flatMap { s =>
      def aliasRoot(a: String): Option[String] =
        s.conf.getOption(s"spark.graft.catalog.$a").filter(_.nonEmpty)
      val listing: Option[(String, Option[String])] =
        lc(target).split("\\.").toSeq match {
          case Seq(a) => aliasRoot(a).map(wh => (wh, None))
            .orElse(s.conf.getOption(WarehouseKey).filter(_.nonEmpty)
              .filter(wh => Catalog.entries(s, wh).keys
                .exists(_.startsWith(a + ".")))
              .map(wh => (wh, Some(a))))
          case Seq(a, sch) => aliasRoot(a).map(wh => (wh, Some(sch)))
          case _ => None
        }
      listing.map { case (wh, schOpt) =>
        import s.implicits._
        Catalog.entries(s, wh).toSeq
          .filter { case (n, _) =>
            schOpt.forall(sc => n.startsWith(sc + ".")) }
          .sorted
          .toDF("name", "root").queryExecution.logical
      }
    }

  /** CREATE TABLE with an EXPLICIT SCHEMA and no rows (VERDICT r15
    * directive #4 — the ingest-lands-later pattern): land ONE
    * zero-row commit carrying the declared schema (a single empty
    * parquet file, so every later read — including the pinned view —
    * resolves the schema from data files like any other version),
    * with zone-map stats declared on every eligible column so the
    * table prunes from its first INSERT on. Registered + cataloged
    * exactly like CTAS. */
  private def runCreateSchema(s: SparkSession, name: String,
      colsDdl: String): Long = {
    val (wh, key) = ddlTarget(s, name, "CREATE TABLE")
    require(!Catalog.entries(s, wh).contains(key),
      s"table '$name' already exists in the catalog at $wh — " +
        "DROP TABLE it first")
    val table = rootOf(wh, key)
    require(CommitLog.currentVersion(s, table).isEmpty,
      s"$table already holds a commit log — choose another name or " +
        "vacuum the directory")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(colsDdl)
    // one partition, zero rows: the write must emit a real (empty)
    // parquet file so the schema is durable in data, not only in SQL
    val df = s.createDataFrame(
      s.sparkContext.parallelize(Seq.empty[org.apache.spark.sql.Row], 1),
      schema)
    import org.apache.spark.sql.types._
    val eligible = schema.fields.collect {
      case f if Seq(ByteType, ShortType, IntegerType, LongType, DateType,
        TimestampType, StringType).contains(f.dataType) => f.name
    }.toSeq
    val v =
      if (eligible.nonEmpty) CommitLog.appendWithStats(s, df, table, eligible)
      else CommitLog.append(s, df, table)
    GraftTables.register(s, table, key)
    Catalog.register(s, wh, key, table)
    v
  }

  // ---- MATERIALIZED VIEW DDL (VERDICT r15 directive #2) ------------
  //
  // The one verb that was still Scala-only in an otherwise
  // SQL-complete lakehouse lifecycle. The grammar is exactly the
  // rewrite rule's contract — SELECT <group cols + count(*)/sum/min/
  // max aliases> FROM <registered or cataloged log table> [WHERE
  // <pred>] GROUP BY <group cols> — so anything CREATE accepts, the
  // MvRewrite/MvIncremental pair can serve and refresh. Anything
  // else refuses loudly at parse of the select list, never lands a
  // summary the rule would decline.

  private final case class MvSelect(
      groupCols: Seq[String], cntCol: String,
      sums: Map[String, String], mins: Map[String, String],
      maxes: Map[String, String])

  private val ItemCount = "(?is)^count\\(\\s*\\*\\s*\\)\\s+AS\\s+(\\w+)$".r
  private val ItemAgg = "(?is)^(sum|min|max)\\((\\w+)\\)\\s+AS\\s+(\\w+)$".r
  private val ItemBare = "(?s)^(\\w+)$".r

  private def parseMvSelect(selectList: String, groupBy: String)
      : MvSelect = {
    val items = selectList.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val groupCols = groupBy.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    var cnt = Option.empty[String]
    var sums = Map.empty[String, String]
    var mins = Map.empty[String, String]
    var maxes = Map.empty[String, String]
    var bare = Seq.empty[String]
    items.foreach {
      case ItemCount(alias) =>
        require(cnt.isEmpty, "exactly one count(*) AS <alias> is required")
        cnt = Some(alias)
      case ItemAgg(fn, m, alias) => fn.toLowerCase(java.util.Locale.ROOT) match {
        case "sum" => sums += (m -> alias)
        case "min" => mins += (m -> alias)
        case "max" => maxes += (m -> alias)
      }
      case ItemBare(c) => bare = bare :+ c
      case other => throw new IllegalArgumentException(
        s"unsupported MV select item '$other' — use group columns, " +
          "count(*) AS <a>, and sum/min/max(<col>) AS <a>")
    }
    require(bare.sorted == groupCols.sorted,
      s"MV select columns ${bare.mkString(",")} must equal GROUP BY " +
        s"${groupCols.mkString(",")}")
    MvSelect(groupCols,
      cnt.getOrElse(throw new IllegalArgumentException(
        "an MV needs count(*) AS <alias> (partial counts re-merge " +
          "rollups and drive incremental refresh)")),
      sums, mins, maxes)
  }

  private def attachMv(s: SparkSession, mv: graft.plans.MvDef): Unit = {
    val have = s.experimental.extraOptimizations.collect {
      case r: graft.plans.MvRewrite => r.mv
    }.toSet
    if (!have.contains(mv))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ new graft.plans.MvRewrite(s, mv)
  }

  private def runCreateMv(s: SparkSession, name: String,
      selectList: String, baseName: String, whereOpt: Option[String],
      groupBy: String): Long = {
    val wh = requireWarehouse(s, "CREATE MATERIALIZED VIEW")
    val key = lc(name)
    val summ = s"$wh/$key"
    require(!Catalog.entries(s, wh).contains(key),
      s"'$name' already names a table in the catalog at $wh")
    require(!Catalog.mvDefs(s, wh).exists(_.summaryPath == summ),
      s"materialized view '$name' already exists at $wh — DROP it first")
    val base = reResolve(s, baseName).getOrElse(
      throw new IllegalArgumentException(
        s"MV base '$baseName' is not a registered or cataloged table"))
    val sel = parseMvSelect(selectList, groupBy)
    val pred = whereOpt.map(_.trim).getOrElse("")
    MvIncremental.refresh(s, base, summ, key, sel.groupCols, sel.cntCol,
      sel.sums, sel.mins, sel.maxes, predicateSql = pred)
    val mv = graft.plans.MvDef(base, summ, sel.groupCols, sel.cntCol,
      sel.sums, sel.mins, sel.maxes, logTables = true, feedTag = key,
      predicateSql = pred)
    val v = Catalog.registerMv(s, wh, mv)
    attachMv(s, mv)
    v
  }

  private def mvByName(s: SparkSession, wh: String, name: String)
      : graft.plans.MvDef =
    Catalog.mvDefs(s, wh).find(_.summaryPath == s"$wh/${lc(name)}")
      .getOrElse(throw new IllegalArgumentException(
        s"no materialized view '$name' in the catalog at $wh"))

  private def runDropMv(s: SparkSession, name: String): Long = {
    val wh = requireWarehouse(s, "DROP MATERIALIZED VIEW")
    val mv = mvByName(s, wh, name)
    // retire the definition + this session's rule; the summary table
    // and its history stay on disk (external-table semantics, the
    // DROP TABLE discipline)
    val v = Catalog.dropMv(s, wh, mv.summaryPath)
    s.experimental.extraOptimizations =
      s.experimental.extraOptimizations.filter {
        case r: graft.plans.MvRewrite => r.mv != mv
        case _ => true
      }
    v
  }

  private def runRefreshMv(s: SparkSession, name: String): Long = {
    val wh = requireWarehouse(s, "REFRESH MATERIALIZED VIEW")
    val mv = mvByName(s, wh, name)
    MvIncremental.refresh(s, mv.basePath, mv.summaryPath, mv.feedTag,
      mv.groupCols, mv.cntCol, mv.sumCols, mv.minCols, mv.maxCols,
      predicateSql = mv.predicateSql) match {
      case Some((_, to)) => to
      case None => 0L // already fresh — idempotent, not an error
    }
  }

  def intercept(sql: String): Option[LogicalPlan] = sql match {
    case Optimize(view) => resolveTarget(view).map { table =>
      GraftMaintenanceCommand("optimize", s => {
        // file compaction (range-clustered when the table has a stats
        // column) + a manifest fold, then re-pin the view (two-part
        // targets have no session view to re-pin — the catalog owns
        // their binding)
        val v = CommitLog.compactTable(s, table,
          targetRecordsPerFile = 1000000L)
        CommitLog.compactManifests(s, table)
        if (!view.contains('.')) GraftTables.register(s, table, view)
        v
      }, view, table)
    }
    // multi-dimensional re-clustering (r16 — Delta's OPTIMIZE ZORDER
    // BY): one rewrite commit lands the z-ordered layout; file size
    // honors `SET spark.graft.zorder.targetRecords` (default 1M rows)
    case OptimizeZ(view, colsStr) => resolveTarget(view).map { table =>
      GraftMaintenanceCommand("optimize_zorder", s => {
        val dims = colsStr.split(",").map(_.trim).toSeq
        val target = s.conf.getOption("spark.graft.zorder.targetRecords")
          .map(_.toLong).getOrElse(1000000L)
        val v = CommitLog.zorderTable(s, table, dims,
          targetRecordsPerFile = target)
        CommitLog.compactManifests(s, table)
        if (!view.contains('.')) GraftTables.register(s, table, view)
        v
      }, view, table)
    }
    case Vacuum(view, n, dry) => resolveTarget(view).map { table =>
      if (dry != null)
        // DRY RUN: the file count the real verb WOULD retire — same
        // computation, zero deletes, no command (safe from any session)
        GraftMaintenanceCommand("vacuum_dry_run", s =>
          CommitLog.vacuumPlan(s, table, keepVersions = n.toInt)
            ._3.size.toLong)
      else GraftMaintenanceCommand("vacuum", s =>
        CommitLog.vacuumUnreferenced(s, table, keepVersions = n.toInt)
          .toLong, view, table)
    }
    // table-level rollback (r16 — Delta's RESTORE TABLE): re-list the
    // target version's files by reference as the new head; vacuumed
    // targets refuse (the restore would publish dead references)
    case RestoreTable(view, ver) => resolveTarget(view).map { table =>
      GraftMaintenanceCommand("restore_table", s => {
        val v = CommitLog.restore(s, table, ver.toLong)
        if (!view.contains('.')) GraftTables.register(s, table, view)
        v
      }, view, table)
    }
    // idempotent bulk ingest (r16 — Delta's COPY INTO): load every
    // parquet file under the landing dir exactly once; the value is
    // the number of files loaded THIS run (0 = already caught up)
    case Copy(view, srcDir) => resolveTarget(view).map { table =>
      GraftMaintenanceCommand("copy_into", s => {
        val (nFiles, _) = graft.sources.CopyInto.copyInto(s, table, srcDir)
        if (!view.contains('.')) GraftTables.register(s, table, view)
        nFiles
      }, view, table)
    }
    // SNAPSHOT DIFF between two versions (r16): keys added / removed
    // / changed regardless of which verbs produced the history (a
    // change feed cannot flow state-changing rewrites; a snapshot
    // diff always can). Payloads compare via one hash over every
    // non-key column; O(two snapshots), one shuffle on the keys.
    case Diff(view, v1, v2, keys) => resolveTarget(view).map { table =>
      val s = SparkSession.active
      val keyCols = keys.split(",").map(_.trim).toSeq
      val oldS = CommitLog.readVersion(s, table, v1.toLong)
      val newS = CommitLog.readVersion(s, table, v2.toLong)
      val compare = newS.columns.toSeq.filterNot(keyCols.contains)
      graft.operators.TableDiff.diff(oldS, newS, keyCols, compare)
        .queryExecution.logical
    }
    // DDL round-trip discovery (r16): render the statements that
    // recreate the table's declared surface — columns from the head
    // schema, one ALTER per persisted CHECK — deterministically
    case ShowCreate(view) => resolveTarget(view).map { table =>
      val s = SparkSession.active
      val cols = CommitLog.read(s, table).schema.fields
        .map(f => s"${f.name} ${f.dataType.sql}").mkString(", ")
      val checks = Constraints.checks(s, table).sortBy(_.name)
        .map(c => s"ALTER TABLE $view ADD CONSTRAINT ${c.name} " +
          s"CHECK (${c.expr})")
      val ddl = (s"CREATE TABLE $view ($cols)" +: checks).mkString(";\n")
      import s.implicits._
      Seq((view, ddl)).toDF("name", "ddl").queryExecution.logical
    }
    // TRUNCATE (r16): one commit swaps the live set for a single
    // zero-row schema-bearing file — the table reads empty, keeps its
    // schema, stats declaration and CHECK set, and every prior
    // version stays time-travelable (DELETE-all semantics without
    // the view drop)
    case Truncate(view) => resolveTarget(view).map { table =>
      GraftMaintenanceCommand("truncate", s => {
        val schema = CommitLog.read(s, table).schema
        val empty = s.createDataFrame(
          s.sparkContext.parallelize(
            Seq.empty[org.apache.spark.sql.Row], 1), schema)
        val v = Constraints.checkedReplace(s, empty, table) match {
          case Right(ver) => ver
          case Left(bad) => throw new IllegalStateException(
            s"truncate audit failed impossibly: $bad")
        }
        if (!view.contains('.')) GraftTables.register(s, table, view)
        v
      }, view, table)
    }
    case History(view) => resolveTarget(view).map { table =>
      TableInfo.history(SparkSession.active, table)
        .queryExecution.logical
    }
    case Detail(view) => resolveTarget(view).map { table =>
      TableInfo.describe(SparkSession.active, table)
        .queryExecution.logical
    }
    // catalog discovery: SHOW TABLES IN <alias> lists the persisted
    // catalog bound to the alias (one row per name, with its root);
    // `IN <alias>.<schema>` / `IN <schema>` (session warehouse)
    // restrict to one schema's entries (r16). Unbound names keep
    // Spark's own SHOW TABLES surface
    case ShowTables(target) => showTables(target)
    // schema discovery (r16): the distinct schema prefixes of the
    // dotted catalog keys in the session warehouse (or a bound
    // alias's); conf-less sessions keep Spark's error surface
    case ShowSchemas(alias) if {
      val s = SparkSession.getActiveSession
      if (alias == null) s.exists(x =>
        x.conf.getOption(WarehouseKey).exists(_.nonEmpty))
      else s.exists(x =>
        x.conf.getOption(s"spark.graft.catalog.${lc(alias)}")
          .exists(_.nonEmpty))
    } => {
      val s = SparkSession.active
      val wh =
        if (alias == null) s.conf.get(WarehouseKey)
        else s.conf.get(s"spark.graft.catalog.${lc(alias)}")
      import s.implicits._
      Some(Catalog.entries(s, wh).keys.toSeq.filter(_.contains('.'))
        .map(_.split("\\.")(0)).distinct.sorted
        .toDF("schema").queryExecution.logical)
    }
    // constraint DDL on registered views OR `<alias>.<name>` catalog
    // targets (r16 — the r14 #6 two-part rule now covers EVERY verb)
    // — the Delta ALTER TABLE verbs, routed to the persisted CHECK
    // set (a set the live rows already violate refuses; UPDATE/MERGE/
    // INSERT images are audited against it from the next statement on)
    case AddCheck(view, name, exprStr) =>
      resolveTarget(view).map { table =>
        GraftMaintenanceCommand("add_constraint", s => {
          import graft.sources.Constraints
          val cs = Constraints.checks(s, table)
          require(!cs.exists(_.name.equalsIgnoreCase(name)),
            s"constraint '$name' already exists at $table — DROP it first")
          Constraints.setChecks(s, table,
            cs :+ Constraints.Check(name, exprStr.trim))
        }, view, table)
      }
    case DropCheck(view, name) =>
      resolveTarget(view).map { table =>
        GraftMaintenanceCommand("drop_constraint", s => {
          import graft.sources.Constraints
          val cs = Constraints.checks(s, table)
          require(cs.exists(_.name.equalsIgnoreCase(name)),
            s"no constraint named '$name' at $table " +
              s"(have: ${cs.map(_.name).mkString(", ")})")
          val rest = cs.filterNot(_.name.equalsIgnoreCase(name))
          if (rest.isEmpty) Constraints.clearChecks(s, table)
          else Constraints.setChecks(s, table, rest)
        }, view, table)
      }
    // DDL only engages when the session opted into a graft warehouse;
    // DROP additionally requires the name to be cataloged there, so a
    // Spark-catalog DROP keeps Spark's own surface
    case CreateMv(name, selectList, baseName, where, groupBy)
        if warehouse.isDefined =>
      Some(GraftMaintenanceCommand("create_mv", s =>
        runCreateMv(s, name, selectList, baseName,
          Option(where), groupBy)))
    case DropMv(name) if warehouse.isDefined =>
      Some(GraftMaintenanceCommand("drop_mv", s => runDropMv(s, name)))
    case RefreshMv(name) if warehouse.isDefined =>
      Some(GraftMaintenanceCommand("refresh_mv", s => runRefreshMv(s, name)))
    // MV discovery, the SHOW TABLES sibling: the session warehouse's
    // MvDefs, or a bound alias's (`IN <alias>`); an unbound alias /
    // conf-less session falls through to Spark's error surface
    case ShowMvs(alias) if {
      val s = SparkSession.getActiveSession
      if (alias == null) s.exists(x =>
        x.conf.getOption(WarehouseKey).exists(_.nonEmpty))
      else s.exists(x =>
        x.conf.getOption(s"spark.graft.catalog.${lc(alias)}")
          .exists(_.nonEmpty))
    } => {
      val s = SparkSession.active
      val wh =
        if (alias == null) s.conf.get(WarehouseKey)
        else s.conf.get(s"spark.graft.catalog.${lc(alias)}")
      import s.implicits._
      Some(Catalog.mvDefs(s, wh)
        .map(d => (d.summaryPath.split('/').last, d.basePath, d.summaryPath))
        .sortBy(_._1)
        .toDF("name", "base", "summary").queryExecution.logical)
    }
    // the RESTATEMENT verb (r16 — Delta's partial overwrite, SQL
    // form): swap exactly one range of a clustered table for the
    // SELECT's rows, atomically, with the CHECK audit + drift gate;
    // unresolvable targets keep Spark's surface (which has no such
    // clause — the refusal stays loud either way)
    case ReplaceWhere(view, colName, eqL, loL, hiL, select) =>
      resolveTarget(view).map { table =>
        val lo = if (eqL != null) eqL else loL
        val hi = if (eqL != null) eqL else hiL
        GraftMaintenanceCommand("replace_where", s => {
          val v = runReplaceWhere(s, table, colName, lo, hi, select)
          // advance the session view's version pin past the swap
          // (multi-part targets read the catalog head — nothing to pin)
          if (!view.contains('.')) GraftTables.register(s, table, view)
          v
        }, view, table)
      }
    // zero-copy adoption of an existing parquet dir (r16 — the
    // CONVERT TO DELTA shape): the dir becomes the table root
    case AdoptTable(name, dirPath) if ddlEngages(name) =>
      Some(GraftMaintenanceCommand("adopt",
        s => runAdopt(s, name, dirPath)))
    case Create(name, cluster, select) if ddlEngages(name) =>
      Some(GraftMaintenanceCommand("create",
        s => runCreate(s, name, Option(cluster), select)))
    case CreateSchema(name, colsDdl) if ddlEngages(name) =>
      Some(GraftMaintenanceCommand("create",
        s => runCreateSchema(s, name, colsDdl)))
    case Drop(name) if dropResolves(name) =>
      Some(GraftMaintenanceCommand("drop", s => runDrop(s, name)))
    case Restore() if warehouse.isDefined =>
      Some(GraftMaintenanceCommand("restore", s =>
        Catalog.restore(s, s.conf.get(WarehouseKey)).size.toLong))
    case _ => None
  }
}

/** Eager maintenance statement: (verb, value) — the committed version
  * for OPTIMIZE, the retired-file count for VACUUM. When the verb
  * targeted a named table (`view` non-empty), the binding is
  * RE-VERIFIED in the EXECUTING session before the body runs (ADVICE
  * r15, mirroring [[GraftDmlCommand]]): a plan parsed under one
  * session must not retire files or mutate the CHECK set of a table
  * the executing session never registered. */
case class GraftMaintenanceCommand(verb: String,
    body: org.apache.spark.sql.SparkSession => Long,
    view: String = "", table: String = "")
  extends org.apache.spark.sql.execution.command.LeafRunnableCommand {

  override val output
      : Seq[org.apache.spark.sql.catalyst.expressions.AttributeReference] =
    Seq(
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "verb", org.apache.spark.sql.types.StringType, nullable = false)(),
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "value", org.apache.spark.sql.types.LongType, nullable = false)())

  override def run(sparkSession: org.apache.spark.sql.SparkSession)
      : Seq[org.apache.spark.sql.Row] = {
    if (view.nonEmpty) {
      val again = GraftMaintenance.reResolve(sparkSession, view)
      require(again.contains(table),
        s"'$view' does not resolve to $table in the executing session " +
          s"(got ${again.getOrElse("nothing")}) — maintenance verbs run " +
          "only against the executing session's own registrations")
    }
    Seq(org.apache.spark.sql.Row(verb, body(sparkSession)))
  }
}

object GraftSql {

  /** Run one SQL statement with the graft surface on an already-built
    * session (the [[SkylineSql.sql]] pattern — skyline strategy/rule
    * registered idempotently; DML executes eagerly, exactly as it
    * would through `spark.sql` on an extensions-built session). */
  def sql(spark: SparkSession, sqlText: String): DataFrame = {
    SkylineSql.register(spark)
    // pin the ACTIVE session for the parse: DML routing consults the
    // session-scoped registry through SparkSession.active (the same
    // session extensions-built parsing runs under via withActive), so
    // a statement parsed for `spark` must never resolve against a
    // different thread-active session's registrations
    val prev = SparkSession.getActiveSession
    SparkSession.setActiveSession(spark)
    try {
      val parser = new GraftSqlParser(spark.sessionState.sqlParser)
      DatasetBridge.ofRows(spark, parser.parsePlan(sqlText))
    } finally {
      prev match {
        case Some(p) => SparkSession.setActiveSession(p)
        case None => SparkSession.clearActiveSession()
      }
    }
  }
}
