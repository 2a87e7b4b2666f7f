package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession, SaveMode}
import org.apache.spark.sql.functions._
import graft.connect.ParquetConnector
import graft.ops._
import graft.pipeline._

/** Driver-contract queries covering the reference-parity operator surface
  * (SURVEY §2.1 rows 1–19 + the §2.2 delegated-SQL surface). Each query
  * exercises the REAL pipeline stages (Extract/SqlTransform/Load/Execute/
  * Typing/Parser/Runner), not ad-hoc reads, and every output is ordered by
  * a unique key and column-aliased identically to its DuckDB oracle.
  *
  * Money aggregates are summed in exact DECIMAL then surfaced as DOUBLE:
  * a distributed double sum is partition-order dependent and would break
  * the hash-match contract.
  */
object ParityQueries {

  type Q = (SparkSession, String) => DataFrame

  private def ctx(spark: SparkSession) = PipelineContext(spark)

  /** Extract a table through the connector into a view named
    * `<prefix>_<table>`, with optional repartitioning/persist.
    */
  private def extract(spark: SparkSession, dir: String, table: String,
      prefix: String, numPartitions: Option[Int] = None,
      partitionBy: Seq[String] = Nil, persist: Boolean = false): DataFrame = {
    implicit val c: PipelineContext = ctx(spark)
    ExtractStage(s"${prefix}_extract", new ParquetConnector(dir), table,
      s"${prefix}_$table", numPartitions, partitionBy, persist).run().get
  }

  val queries: Map[String, Q] = Map(
    "extract_lineitem" -> { (spark, dir) =>
      extract(spark, dir, "lineitem", "q_ex")
        .orderBy("l_orderkey", "l_linenumber")
    },

    "sqltransform_agg" -> { (spark, dir) =>
      implicit val c: PipelineContext = ctx(spark)
      extract(spark, dir, "lineitem", "q_agg")
      SqlTransformStage("agg", sql = """
        SELECT l_returnflag, l_linestatus,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
          COUNT(*) AS count_order
        FROM q_agg_lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""",
        outputView = "q_agg_out").run().get
    },

    "join_agg" -> { (spark, dir) =>
      // DataFrame-API surface: 3-way join with explicitly broadcast dims.
      val li = extract(spark, dir, "lineitem", "q_join")
      val o = extract(spark, dir, "orders", "q_join")
      val cu = extract(spark, dir, "customer", "q_join")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(cu), o("o_custkey") === cu("c_custkey"))
        .groupBy(cu("c_mktsegment").as("mktsegment"))
        .agg(
          countDistinct(o("o_orderkey")).as("n_orders"),
          sum(li("l_extendedprice").cast("decimal(18,2)")
            * (lit(1) - li("l_discount")).cast("decimal(18,2)"))
            .cast("double").as("revenue"))
        .orderBy("mktsegment")
    },

    "window_topn" -> { (spark, dir) =>
      implicit val c: PipelineContext = ctx(spark)
      extract(spark, dir, "orders", "q_win")
      SqlTransformStage("win", sql = """
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
            CAST(row_number() OVER (
              PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
          FROM q_win_orders)
        WHERE rn <= 3
        ORDER BY o_custkey, rn""",
        outputView = "q_win_out").run().get
    },

    "repartition_rr" -> { (spark, dir) =>
      extract(spark, dir, "lineitem", "q_rr", numPartitions = Some(8))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    "repartition_hash" -> { (spark, dir) =>
      extract(spark, dir, "lineitem", "q_rh",
          numPartitions = Some(8), partitionBy = Seq("l_returnflag"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    "persist_extract" -> { (spark, dir) =>
      implicit val c: PipelineContext = ctx(spark)
      extract(spark, dir, "part", "q_pe", persist = true)
      SqlTransformStage("pe", sql = """
        SELECT p_brand, COUNT(*) AS n,
          CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM q_pe_part GROUP BY p_brand ORDER BY p_brand""",
        outputView = "q_pe_out").run().get
    },

    "load_roundtrip" -> { (spark, dir) =>
      implicit val c: PipelineContext = ctx(spark)
      val tmp = Files.createTempDirectory("graft_load").toString
      extract(spark, dir, "nation", "q_lr")
      LoadStage("lr_load", new ParquetConnector(tmp), "q_lr_nation",
        "nation_copy", SaveMode.Overwrite,
        options = Map("confirm.truncate" -> "true")).run()
      ExtractStage("lr_back", new ParquetConnector(tmp), "nation_copy",
        "q_lr_back").run().get.orderBy("n_nationkey")
    },

    "save_modes" -> { (spark, dir) =>
      implicit val c: PipelineContext = ctx(spark)
      val tmp = Files.createTempDirectory("graft_modes").toString
      val conn = new ParquetConnector(tmp)
      extract(spark, dir, "nation", "q_sm")
      // Append twice, then Ignore (no-op on existing data): result = 2x.
      LoadStage("sm1", conn, "q_sm_nation", "n2", SaveMode.Append).run()
      LoadStage("sm2", conn, "q_sm_nation", "n2", SaveMode.Append).run()
      LoadStage("sm3", conn, "q_sm_nation", "n2", SaveMode.Ignore).run()
      ExtractStage("sm_back", conn, "n2", "q_sm_back").run().get
        .orderBy("n_nationkey", "n_name")
    },

    "execute_ddl" -> { (spark, dir) =>
      implicit val c: PipelineContext = ctx(spark)
      extract(spark, dir, "supplier", "q_ddl")
      ExecuteStage("ddl", new ParquetConnector(dir), sql = """
        CREATE OR REPLACE TEMPORARY VIEW q_ddl_out AS
        SELECT s_suppkey, upper(s_name) AS s_name_up
        FROM q_ddl_supplier WHERE s_acctbal > ${minbal}""",
        sqlParams = Map("minbal" -> "1000.0")).run()
      spark.table("q_ddl_out").orderBy("s_suppkey")
    },

    "sqlparams_inject" -> { (spark, dir) =>
      implicit val c: PipelineContext = ctx(spark)
      extract(spark, dir, "customer", "q_sp")
      // ${segment} supplied; ${minbal=0.0} exercises the default-value form.
      SqlTransformStage("sp", sql = """
        SELECT c_custkey, c_acctbal FROM q_sp_customer
        WHERE c_mktsegment = '${segment}' AND c_acctbal >= ${minbal=0.0}
        ORDER BY c_custkey""",
        outputView = "q_sp_out",
        sqlParams = Map("segment" -> "BUILDING")).run().get
    },

    "streaming_guard" -> { (spark, dir) =>
      // In streaming mode the batch-only source yields an empty frame
      // (ref: CassandraExtract.scala:92-94).
      implicit val c: PipelineContext = PipelineContext(spark, isStreaming = true)
      val df = ExtractStage("sg", new ParquetConnector(dir), "lineitem",
        "q_sg_lineitem").run().get
      spark.range(1).select(lit(df.count()).as("rows_when_streaming"))
    },

    "typing_cast" -> { (spark, dir) =>
      implicit val c: PipelineContext = ctx(spark)
      extract(spark, dir, "customer", "q_ty")
      // All-string view (the reference's CSV-shaped input), re-typed by an
      // external schema document (SURVEY §1.2-1.3).
      SqlTransformStage("ty_str", sql = """
        SELECT CAST(c_custkey AS STRING) AS c_custkey,
               c_name,
               CAST(c_nationkey AS STRING) AS c_nationkey,
               CAST(c_acctbal AS STRING) AS c_acctbal
        FROM q_ty_customer""",
        outputView = "q_ty_strings").run()
      TypingTransformStage("ty", "q_ty_strings", "q_ty_typed", schemaJson = """
        [{"name":"c_custkey","type":"long","nullable":false,
          "metadata":{"private":false,"securityLevel":0}},
         {"name":"c_name","type":"string","nullable":true},
         {"name":"c_nationkey","type":"integer","nullable":false},
         {"name":"c_acctbal","type":"double","nullable":true}]""")
        .run().get.orderBy("c_custkey")
    },

    "csv_roundtrip" -> { (spark, dir) =>
      // Delimited connector: parquet -> CSV (all-string on read) -> typed
      // again via the schema-doc transform — the reference IT input shape.
      implicit val c: PipelineContext = ctx(spark)
      val tmp = Files.createTempDirectory("graft_csv").toString
      val csv = new graft.connect.DelimitedConnector(tmp)
      extract(spark, dir, "nation", "q_csv")
      LoadStage("csv_out", csv, "q_csv_nation", "nation", SaveMode.Overwrite,
        options = Map("confirm.truncate" -> "true")).run()
      ExtractStage("csv_in", csv, "nation", "q_csv_back").run()
      TypingTransformStage("csv_type", "q_csv_back", "q_csv_typed", schemaJson = """
        [{"name":"n_nationkey","type":"integer","nullable":false},
         {"name":"n_name","type":"string"},
         {"name":"n_regionkey","type":"integer"}]""").run().get
        .orderBy("n_nationkey")
    },

    "json_roundtrip" -> { (spark, dir) =>
      // JSON-lines connector: parquet -> JSON -> inferred back (numbers
      // come back as BIGINT, which IS the oracle's integer width).
      implicit val c: PipelineContext = ctx(spark)
      val tmp = Files.createTempDirectory("graft_json").toString
      val js = new graft.connect.JsonConnector(tmp)
      extract(spark, dir, "nation", "q_json")
      LoadStage("json_out", js, "q_json_nation", "nation", SaveMode.Overwrite,
        options = Map("confirm.truncate" -> "true")).run()
      ExtractStage("json_in", js, "nation", "q_json_back").run()
      spark.table("q_json_back")
        .select(col("n_nationkey").cast("long"), col("n_name"),
          col("n_regionkey").cast("long"))
        .orderBy("n_nationkey")
    },

    "orc_roundtrip" -> { (spark, dir) =>
      // ORC connector: types survive the round-trip exactly, so the
      // read-back compares against the source table with no casts.
      implicit val c: PipelineContext = ctx(spark)
      val tmp = Files.createTempDirectory("graft_orc").toString
      val orc = new graft.connect.OrcConnector(tmp)
      extract(spark, dir, "nation", "q_orc")
      LoadStage("orc_out", orc, "q_orc_nation", "nation", SaveMode.Overwrite,
        options = Map("confirm.truncate" -> "true")).run()
      ExtractStage("orc_in", orc, "nation", "q_orc_back").run()
      spark.table("q_orc_back").orderBy("n_nationkey")
    },

    "schema_merge" -> { (spark, dir) =>
      // Parquet schema evolution through the connector: batch 1 writes
      // (n_nationkey, n_name); batch 2 APPENDS with two new columns.
      // mergeSchema=true reconciles the read to the superset schema,
      // null-padding batch-1 rows — the lakehouse answer to additive
      // schema change with no table rewrite.
      implicit val c: PipelineContext = ctx(spark)
      val tmp = Files.createTempDirectory("graft_smerge").toString
      val conn = new ParquetConnector(tmp)
      extract(spark, dir, "nation", "q_sm")
      Views.register(
        spark.table("q_sm_nation").select("n_nationkey", "n_name"), "q_sm_v1")
      Views.register(
        spark.table("q_sm_nation").select(col("n_nationkey"), col("n_name"),
          col("n_regionkey"), lit(2L).as("ingest_v")), "q_sm_v2")
      LoadStage("sm1", conn, "q_sm_v1", "evolved", SaveMode.Overwrite,
        options = Map("confirm.truncate" -> "true")).run()
      LoadStage("sm2", conn, "q_sm_v2", "evolved", SaveMode.Append).run()
      ExtractStage("sm_back", conn, "evolved", "q_sm_back",
        options = Map("mergeSchema" -> "true")).run().get
        .select("n_nationkey", "n_name", "n_regionkey", "ingest_v")
        .orderBy(col("n_nationkey"), col("ingest_v").asc_nulls_first)
    },

    "compact_files" -> { (spark, dir) =>
      // 32 sliver files rewritten into ceil(bytes/1MiB) outputs; the
      // compacted copy must carry the source rows bit-for-bit (the
      // oracle reads the ORIGINAL table). MaintenanceSpec asserts the
      // file-count drop; the gate asserts content identity.
      val tmp = Files.createTempDirectory("graft_compact").toString
      spark.read.parquet(s"$dir/orders.parquet").repartition(32)
        .write.parquet(s"$tmp/small")
      val (back, _) = Maintenance.compact(spark, s"$tmp/small",
        s"$tmp/compacted", targetBytes = 1L << 20)
      back.orderBy("o_orderkey")
    },

    "rollup_agg" -> { (spark, dir) =>
      implicit val c: PipelineContext = ctx(spark)
      extract(spark, dir, "lineitem", "q_ru")
      SqlTransformStage("ru", sql = """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM q_ru_lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST""",
        outputView = "q_ru_out").run().get
    },

    "set_ops" -> { (spark, dir) =>
      implicit val c: PipelineContext = ctx(spark)
      extract(spark, dir, "orders", "q_so")
      extract(spark, dir, "customer", "q_so")
      SqlTransformStage("so", sql = """
        SELECT c_custkey FROM q_so_customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT o_custkey AS c_custkey FROM q_so_orders WHERE o_totalprice > 100000
        ORDER BY c_custkey""",
        outputView = "q_so_out").run().get
    },

    "anti_join" -> { (spark, dir) =>
      // parts never ordered: left-anti against lineitem part keys
      val p = extract(spark, dir, "part", "q_aj")
      val li = extract(spark, dir, "lineitem", "q_aj")
      p.join(li, p("p_partkey") === li("l_partkey"), "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    },

    "load_partitioned" -> { (spark, dir) =>
      // disk-partitioned sink layout: nation written as
      // nation.parquet/n_regionkey=<v>/ directories, read back through
      // partition-column inference
      implicit val c: PipelineContext = ctx(spark)
      val tmp = Files.createTempDirectory("graft_dpart").toString
      val conn = new ParquetConnector(tmp)
      extract(spark, dir, "nation", "q_dp")
      LoadStage("dp_load", conn, "q_dp_nation", "nation", SaveMode.Overwrite,
        options = Map("confirm.truncate" -> "true",
          "disk.partitionBy" -> "n_regionkey")).run()
      ExtractStage("dp_back", conn, "nation", "q_dp_back").run().get
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    },

    "bucketed_join" -> { (spark, dir) =>
      // Co-located join: both sides written bucketBy(8) on the join key —
      // the sort-merge join then needs NO exchange on either side
      // (asserted by BucketedSpec); the gate checks the result equals the
      // plain join the oracle runs on the original tables.
      implicit val c: PipelineContext = ctx(spark)
      val tmp = Files.createTempDirectory("graft_bkt").toString
      val conn = new ParquetConnector(tmp)
      // bucket only the join/agg columns: a bucketed layout is built FOR
      // a workload, and writing pruned projections is itself the pattern
      // (the write cost is per-column; the join needs 2+2 of 11+6)
      Views.register(extract(spark, dir, "lineitem", "q_bk")
        .select("l_orderkey", "l_quantity"), "q_bk_li_slim")
      Views.register(extract(spark, dir, "orders", "q_bk")
        .select("o_orderkey", "o_orderstatus"), "q_bk_ord_slim")
      LoadStage("bk_l", conn, "q_bk_li_slim", "li", SaveMode.Overwrite,
        options = Map("confirm.truncate" -> "true",
          "bucket.by" -> "l_orderkey", "bucket.n" -> "8")).run()
      LoadStage("bk_o", conn, "q_bk_ord_slim", "ord", SaveMode.Overwrite,
        options = Map("confirm.truncate" -> "true",
          "bucket.by" -> "o_orderkey", "bucket.n" -> "8")).run()
      val li = ExtractStage("bk_rl", conn, "li", "q_bk_li",
        options = Map("bucket.table" -> "true")).run().get
      val ord = ExtractStage("bk_ro", conn, "ord", "q_bk_ord",
        options = Map("bucket.table" -> "true")).run().get
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy("o_orderstatus")
    },

    "quantiles" -> { (spark, dir) =>
      implicit val c: PipelineContext = ctx(spark)
      extract(spark, dir, "lineitem", "q_qt")
      // exact percentiles: interpolated (percentile) and discrete
      // (percentile_disc) agree across engines — unlike approx sketches
      SqlTransformStage("qt", sql = """
        SELECT l_returnflag,
          round(percentile(l_extendedprice, 0.5), 6) AS p50_cont,
          percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS p50_disc,
          round(percentile(l_extendedprice, 0.95), 6) AS p95_cont
        FROM q_qt_lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
        outputView = "q_qt_out").run().get
    },

    "events_pivot" -> { (spark, dir) =>
      // DataFrame pivot API with an explicit (deterministic) column list;
      // explicit-schema read, so no session conf mutation (Tables.events)
      val ev = Tables.eventsRaw(spark, dir)
      val types = Seq("click", "error", "purchase", "signup", "view")
      val piv = ev.select((col("user_id") % 10).as("user_mod"), col("event_type"))
        .groupBy("user_mod").pivot("event_type", types).count()
      piv.select(col("user_mod") +:
          types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy("user_mod")
    },

    "pipeline_guards" -> { (spark, dir) =>
      // The three §2.1 behaviors previously covered only by scalatest,
      // surfaced as one driver-gated batch query: (1) Load SKIPS a
      // streaming view (ref: CassandraLoad.scala:108-109), (2) Execute
      // resolves statement text from a file: URI with ${param} injection
      // (ref: CassandraExecute.scala:31-32), (3) a failing stage throws
      // DetailException carrying the stage's structured detail map
      // (ref: CassandraExtract.scala:100-104). Each check lands as a
      // boolean row; the oracle is the all-true table.
      implicit val c: PipelineContext = ctx(spark)
      import spark.implicits._
      val tmp = Files.createTempDirectory("graft_guards").toString
      val conn = new ParquetConnector(tmp)
      // (1) batch-only sink: a streaming view must be skipped, not
      // written and not crashed on
      Views.register(spark.readStream.format("rate").load(), "pg_stream")
      LoadStage("pg_load", conn, "pg_stream", "pg_tbl", SaveMode.Overwrite,
        options = Map("confirm.truncate" -> "true")).run()
      val loadSkipped = !new java.io.File(s"$tmp/pg_tbl").exists()
      // (2) statement-from-URI + ${param} injection through the Execute
      // stage (the file: scheme; http(s) adds headers, ConfigSpec covers
      // its error paths)
      val f = Files.createTempFile("pg_stmt", ".sql")
      Files.writeString(f,
        "CREATE OR REPLACE TEMPORARY VIEW pg_uri_out AS " +
          "SELECT CAST(${n} AS BIGINT) AS answer")
      val stmt = Statements.fromUri("file:" + f)
      ExecuteStage("pg_exec", conn, stmt,
        sqlParams = Map("n" -> "42")).run()
      val uriOk = spark.table("pg_uri_out")
        .collect().map(_.getLong(0)).toSeq == Seq(42L)
      // (3) DetailException: message names the stage, detail map carries
      // the version stamp and the error text
      val detailOk =
        try {
          SqlTransformStage("pg_boom",
            sql = "SELECT * FROM pg_no_such_view_xyz",
            outputView = "pg_never").run()
          false
        } catch {
          case e: DetailException =>
            e.getMessage.contains("pg_boom") &&
              e.detail.contains("version") && e.detail.contains("error")
        }
      Seq(("detail_exception", detailOk),
          ("load_streaming_guard", loadSkipped),
          ("uri_statement", uriOk))
        .toDF("guard", "ok").orderBy("guard")
    },

    "pipeline_e2e" -> { (spark, dir) =>
      // Full declarative path: HOCON config -> Parser -> Runner, mirroring
      // the reference IT round-trip (CassandraLoadSuite.scala:66-139):
      // execute DDL -> transform -> load -> extract back. The config is
      // native HOCON (the reference is HOCON-first): unquoted keys,
      // comments, and a `${base.table}` substitution shared by the Load
      // and the Extract; `$${minsize}` stays quoted so it reaches the
      // SqlParams injector, not the HOCON resolver.
      implicit val c: PipelineContext = ctx(spark)
      val tmp = Files.createTempDirectory("graft_e2e").toString
      val conf = s"""
        base { table = part_filtered }  // shared via substitution below
        stages = [
          { type = Execute, name = mkview
            sql = "CREATE OR REPLACE TEMPORARY VIEW p13_src AS SELECT * FROM parquet.`$dir/part.parquet`"
            environments = [test] }
          { type = SqlTransform, name = filter
            sql = "SELECT p_partkey, p_name, p_brand, p_size FROM p13_src WHERE p_size >= $${minsize}"
            sqlParams { minsize = "10" }
            outputView = p13_filtered }
          { type = SqlTransform, name = skipped_in_test
            sql = "SELECT 1 AS should_not_run"
            outputView = p13_never
            environments = [production] }
          { type = Load, name = sink, connection = tmp
            inputView = p13_filtered, table = $${base.table}
            saveMode = Overwrite, params { "confirm.truncate" = "true" }
            numPartitions = 2 }
          { type = Extract, name = back, connection = tmp
            table = $${base.table}, outputView = p13_back }
        ]"""
      val connectors = Map(
        "default" -> new ParquetConnector(dir),
        "tmp" -> new ParquetConnector(tmp))
      Parser.parse(conf, connectors) match {
        case Left(errs) => throw new IllegalArgumentException(errs.mkString("; "))
        case Right(pipeline) => Runner.run(pipeline).get.orderBy("p_partkey")
      }
    }
  )

  val oracles: Map[String, String] = Map(
    "extract_lineitem" ->
      "SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber",

    "sqltransform_agg" -> """
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
        COUNT(*) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "join_agg" -> """
      SELECT c.c_mktsegment AS mktsegment,
        COUNT(DISTINCT o.o_orderkey) AS n_orders,
        CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment ORDER BY mktsegment""",

    "window_topn" -> """
      SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          CAST(row_number() OVER (
            PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        FROM orders)
      WHERE rn <= 3 ORDER BY o_custkey, rn""",

    "repartition_rr" ->
      "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",

    "repartition_hash" ->
      "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",

    "persist_extract" -> """
      SELECT p_brand, COUNT(*) AS n,
        CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM part GROUP BY p_brand ORDER BY p_brand""",

    "load_roundtrip" ->
      "SELECT * FROM nation ORDER BY n_nationkey",

    "save_modes" -> """
      SELECT * FROM (
        SELECT * FROM nation UNION ALL SELECT * FROM nation)
      ORDER BY n_nationkey, n_name""",

    "execute_ddl" -> """
      SELECT s_suppkey, upper(s_name) AS s_name_up
      FROM supplier WHERE s_acctbal > 1000.0 ORDER BY s_suppkey""",

    "sqlparams_inject" -> """
      SELECT c_custkey, c_acctbal FROM customer
      WHERE c_mktsegment = 'BUILDING' AND c_acctbal >= 0.0
      ORDER BY c_custkey""",

    "streaming_guard" ->
      "SELECT CAST(0 AS BIGINT) AS rows_when_streaming",

    "typing_cast" -> """
      SELECT c_custkey, c_name, c_nationkey, c_acctbal
      FROM customer ORDER BY c_custkey""",

    "pipeline_e2e" -> """
      SELECT p_partkey, p_name, p_brand, p_size
      FROM part WHERE p_size >= 10 ORDER BY p_partkey""",

    // pipeline_guards asserts three boolean behaviors in-engine; the
    // oracle is the all-true table those checks must produce.
    "pipeline_guards" -> """
      SELECT * FROM (
        SELECT 'detail_exception' AS guard, true AS ok
        UNION ALL SELECT 'load_streaming_guard', true
        UNION ALL SELECT 'uri_statement', true)
      ORDER BY guard""",

    "csv_roundtrip" -> """
      SELECT n_nationkey, n_name, n_regionkey
      FROM nation ORDER BY n_nationkey""",

    "json_roundtrip" -> """
      SELECT n_nationkey::BIGINT AS n_nationkey, n_name,
        n_regionkey::BIGINT AS n_regionkey
      FROM nation ORDER BY n_nationkey""",

    "orc_roundtrip" -> """
      SELECT * FROM nation ORDER BY n_nationkey""",

    // Batch-1 rows null-pad the columns only batch 2 carries; Spark's
    // ascending sort is NULLS FIRST, DuckDB's is NULLS LAST — pinned
    // explicitly.
    "schema_merge" -> """
      SELECT n_nationkey, n_name, NULL::INTEGER AS n_regionkey,
        NULL::BIGINT AS ingest_v FROM nation
      UNION ALL
      SELECT n_nationkey, n_name, n_regionkey, 2::BIGINT FROM nation
      ORDER BY n_nationkey, ingest_v NULLS FIRST""",

    "compact_files" -> """
      SELECT * FROM orders ORDER BY o_orderkey""",

    "rollup_agg" -> """
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST""",

    "set_ops" -> """
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000
      ORDER BY c_custkey""",

    "anti_join" -> """
      SELECT p_partkey, p_name FROM part
      WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)
      ORDER BY p_partkey""",

    "load_partitioned" -> """
      SELECT n_nationkey, n_name, n_regionkey
      FROM nation ORDER BY n_nationkey""",

    // The bucketed layout must not change a single row: the oracle is the
    // plain join over the ORIGINAL tables.
    "bucketed_join" -> """
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "quantiles" -> """
      SELECT l_returnflag,
        round(quantile_cont(l_extendedprice, 0.5), 6) AS p50_cont,
        quantile_disc(l_extendedprice, 0.5) AS p50_disc,
        round(quantile_cont(l_extendedprice, 0.95), 6) AS p95_cont
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "events_pivot" -> """
      SELECT user_id % 10 AS user_mod,
        COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
      FROM events GROUP BY user_mod ORDER BY user_mod"""
  )
}
