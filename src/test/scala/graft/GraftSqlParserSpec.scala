package graft

class GraftSqlParserSpec extends SparkTestBase {

  private def rw(sql: String): Option[String] =
    GraftSqlParser.rewrite(spark, spark.sessionState.sqlParser, sql)

  test("ordinary statements are never rewritten (first-keyword gate)") {
    val untouched = Seq(
      "SELECT 1",
      "SELECT * FROM vacuum", // table NAMED vacuum, statement head SELECT
      "WITH optimize AS (SELECT 1) SELECT * FROM optimize",
      "INSERT INTO t VALUES (1)",
      "CREATE TABLE t (x INT)",
      "DESCRIBE TABLE t",
      "DESC t",
      "DESCRIBE EXTENDED db.t",
      "UPDATE t SET x = 1",
      "MERGE INTO t USING s ON t.k = s.k WHEN MATCHED THEN DELETE")
    untouched.foreach(s => assert(rw(s).isEmpty, s))
  }

  test("maintenance statements rewrite to the CALL/metadata forms") {
    spark.conf.set("spark.sql.catalog.pcat", "graft.sources.HubCatalog")
    spark.conf.set("spark.sql.catalog.pcat.base", tmpDir("pcat"))
    try {
      assert(rw("OPTIMIZE pcat.default.t").contains(
        "CALL pcat.system.optimize(`table` => 'default.t')"))
      assert(rw("OPTIMIZE pcat.default.t WHERE k = 7").contains(
        "CALL pcat.system.optimize(`table` => 'default.t', " +
          "where => 'k = 7')"))
      assert(rw("OPTIMIZE pcat.t ZORDER BY (a, b)").contains(
        "CALL pcat.system.zorder(`table` => 't', col_a => 'a', " +
          "col_b => 'b')"))
      assert(rw("VACUUM pcat.t RETAIN 24 HOURS DRY RUN").contains(
        "CALL pcat.system.vacuum(`table` => 't', " +
          "retain_ms => 86400000L, dry_run => true)"))
      assert(rw("RESTORE TABLE pcat.t TO VERSION AS OF 3").contains(
        "CALL pcat.system.restore(`table` => 't', version => 3)"))
      assert(rw("RESTORE pcat.t TO TIMESTAMP AS OF '2026-01-01'").contains(
        "CALL pcat.system.restore(`table` => 't', " +
          "timestamp => '2026-01-01')"))
      assert(rw("CONVERT TO HUB pcat.t").contains(
        "CALL pcat.system.convert(`table` => 't')"))
      assert(rw("CONVERT TO HUB pcat.t PARTITIONED BY (ingest_date)")
        .contains("CALL pcat.system.convert_partitioned(`table` => 't', " +
          "cols => 'ingest_date')"))
      assert(rw("CONVERT TO HUB pcat.t PARTITIONED BY (`a``b`, c)")
        .contains("CALL pcat.system.convert_partitioned(`table` => 't', " +
          "cols => 'a`b,c')"))
      // bare identifiers with '$' (legal in the Part charset) must not be
      // routed through Spark's identifier parser, which rejects them
      assert(rw("OPTIMIZE pcat.t ZORDER BY (a$b, c)").contains(
        "CALL pcat.system.zorder(`table` => 't', " +
          "col_a => 'a$b', col_b => 'c')"))
      // a backticked name CONTAINING a comma cannot survive the
      // comma-joined cols channel — refused loudly, never mis-split
      val commaName = intercept[Exception](
        rw("CONVERT TO HUB pcat.t PARTITIONED BY (`a,b`)"))
      assert(commaName.getMessage.contains("','"), commaName.getMessage)
      assert(rw("DESCRIBE HISTORY pcat.default.t").contains(
        "SELECT * FROM pcat.default.`t$history` ORDER BY version DESC"))
      assert(rw("DESCRIBE DETAIL pcat.default.t").contains(
        "SELECT * FROM pcat.default.`t$detail`"))
      // a leading part that is NOT a registered catalog resolves in the
      // session's current catalog (spark_catalog here)
      assert(rw("OPTIMIZE default.t").contains(
        "CALL spark_catalog.system.optimize(`table` => 'default.t')"))
      // backquoted/special identifiers survive the rewrite re-quoted
      spark.conf.set("spark.sql.catalog.my-cat", "graft.sources.HubCatalog")
      try {
        assert(rw("OPTIMIZE `my-cat`.default.t").contains(
          "CALL `my-cat`.system.optimize(`table` => 'default.t')"))
        assert(rw("DESCRIBE HISTORY `my db`.t").contains(
          "SELECT * FROM `my db`.`t$history` ORDER BY version DESC"))
      } finally spark.conf.unset("spark.sql.catalog.my-cat")
      // embedded quotes in rewritten literals DOUBLE (the one escape
      // Spark's lexer honors in both escapedStringLiterals modes)
      assert(rw("OPTIMIZE pcat.t WHERE name = 'O''Brien'").contains(
        "CALL pcat.system.optimize(`table` => 't', " +
          "where => 'name = ''O''''Brien''')"))
      assert(rw("RESTORE pcat.t TO TIMESTAMP AS OF '2026-01-01'")
        .forall(!_.contains("\\")))
      // doubled backticks in ZORDER column names unescape via the
      // delegate's identifier parser (literal a`b reaches the procedure)
      assert(rw("OPTIMIZE pcat.t ZORDER BY (`a``b`, c)").contains(
        "CALL pcat.system.zorder(`table` => 't', col_a => 'a`b', " +
          "col_b => 'c')"))
    } finally {
      spark.conf.unset("spark.sql.catalog.pcat")
      spark.conf.unset("spark.sql.catalog.pcat.base")
    }
  }
}
