package graft.tools

import graft.model._
import graft.table._
import org.apache.spark.sql.{Row, SparkSession}

/**
 * End-to-end demo of the ingestion engine through its public API:
 * create table -> JSON ingest -> upsert/delete -> streaming txn ->
 * crash recovery -> compaction -> SQL over the live view.
 *
 * Run: sbt "runMain graft.tools.Demo"
 */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val wh = java.nio.file.Files.createTempDirectory("graft-demo").toString
    val catalog = GraftCatalog(spark, wh)

    // the reference README's own example table (README.md:136-153)
    val schema = SchemaDsl.struct(
      "id" -> "int32", "name" -> "string", "email" -> "string",
      "age" -> "int32", "created_at" -> "date32")
    val users = catalog.createTable("users", schema, Identity.Keys(Seq("id")),
      TableConfig(memSliceSize = 4)) // tiny slice to force real flushes

    // 1. REST-shaped JSON ingest (S3)
    val jsonRows = Seq(
      """{"id":1,"name":"alice","email":"a@x.com","age":30,"created_at":"2024-01-01"}""",
      """{"id":2,"name":"bob","email":"b@x.com","age":25,"created_at":"2024-02-01"}""",
      """{"id":3,"name":"carol","email":"c@x.com","age":41,"created_at":"2024-03-01"}""",
      """{"id":4,"name":"dave","email":"d@x.com","age":35,"created_at":"2024-04-01"}""",
      """{"id":5,"name":"erin","email":"e@x.com","age":28,"created_at":"2024-05-01"}""")
    users.insertAll(jsonRows.map(JsonIngest.parse(schema, _)), startLsn = 1)
    println(s"[1] inserted 5 rows; commitLsn=${users.commitLsn} flushLsn=${users.flushLsn}")
    println(s"    data files: ${users.currentManifest.dataFiles.map(e => s"${e.path}(${e.rows}r)").mkString(", ")}")

    // 2. upsert (update flushed row) + delete
    users.upsertAll(Seq(JsonIngest.parse(schema,
      """{"id":2,"name":"bob2","email":"b2@x.com","age":26,"created_at":"2024-02-01"}""")), 10)
    users.apply(Seq(Delete(Seq(3), 20), Commit(21)))
    println(s"[2] upserted id=2, deleted id=3; DV'd rows=${users.currentManifest.dataFiles.map(_.deletes).sum}")

    // 3. streaming transaction: one committed, one aborted after staged flush
    users.apply(Seq(
      Append(JsonIngest.parse(schema, """{"id":100,"name":"xact-keep","email":"k@x.com","age":50,"created_at":"2024-06-01"}"""), 30, Some(7L)),
      Append(JsonIngest.parse(schema, """{"id":200,"name":"xact-drop1","email":"d@x.com","age":51,"created_at":"2024-06-01"}"""), 31, Some(8L)),
      Append(JsonIngest.parse(schema, """{"id":201,"name":"xact-drop2","email":"d@x.com","age":52,"created_at":"2024-06-01"}"""), 32, Some(8L)),
      Append(JsonIngest.parse(schema, """{"id":202,"name":"xact-drop3","email":"d@x.com","age":53,"created_at":"2024-06-01"}"""), 33, Some(8L)),
      Append(JsonIngest.parse(schema, """{"id":203,"name":"xact-drop4","email":"d@x.com","age":54,"created_at":"2024-06-01"}"""), 34, Some(8L)),
      Commit(40, Some(7L)),
      StreamAbort(8L)))
    println(s"[3] streaming txn: xact 7 committed, xact 8 aborted (had staged flush)")

    // 4. crash recovery: reopen from disk (manifest + WAL replay)
    val reopened = GraftTable.open(spark, s"$wh/users", Identity.Keys(Seq("id")),
      TableConfig(memSliceSize = 4))
    println(s"[4] reopened: commitLsn=${reopened.commitLsn} rows=${reopened.read().count()}")

    // 5. LSN-gated read + SQL over the live view
    val df = reopened.read(Some(40))
    df.createOrReplaceTempView("users")
    println("[5] SELECT id, name, age FROM users ORDER BY id")
    spark.sql("SELECT id, name, age FROM users ORDER BY id").show()

    // 6. compaction (force full maintenance); the pre-compaction view
    // keeps working (snapshot isolation), then vacuum reclaims files
    val filesBefore = reopened.currentManifest.dataFiles.size
    reopened.optimize()
    val m = reopened.currentManifest
    println(s"[6] optimize: $filesBefore files -> ${m.dataFiles.size}; deletes now=${m.dataFiles.map(_.deletes).sum}")
    println("    pre-compaction snapshot still readable:")
    spark.sql("SELECT count(*) AS n, sum(age) AS sum_age FROM users WHERE age > 25").show()
    reopened.read().createOrReplaceTempView("users")
    println("    post-compaction view:")
    spark.sql("SELECT count(*) AS n, sum(age) AS sum_age FROM users WHERE age > 25").show()
    println(s"    vacuum reclaimed ${reopened.vacuum()} unreferenced files")

    // 7. read gating beyond commit LSN must fail
    try { reopened.read(Some(10000)); println("[7] ERROR: gate did not trip") }
    catch { case e: IllegalStateException => println(s"[7] read gate OK: ${e.getMessage}") }

    // 8. Avro-ingested table (S5): declared schema + JSON-encoded datums
    val avroSchema =
      """{"type":"record","name":"Click","fields":[
        |  {"name":"cid","type":"long"},
        |  {"name":"page","type":["null","string"]}]}""".stripMargin
    val clicks = catalog.createTable("clicks",
      graft.sources.AvroIngest.schemaToStruct(avroSchema), Identity.None)
    import scala.jdk.CollectionConverters._
    val payloads = spark.createDataFrame(Seq(
      Row("""{"cid":1,"page":{"string":"/home"}}"""),
      Row("""{"cid":2,"page":null}""")).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("p",
          org.apache.spark.sql.types.StringType))))
    graft.sources.AvroIngest.ingest(clicks, payloads, "p", avroSchema, 1)
    println(s"[8] avro ingest: ${clicks.read().count()} rows (1 null union branch)")

    // 9. protobuf row ingest (S4): MoonlinkRow wire messages round-trip
    val pbRows = spark.createDataFrame(Seq(
      Row(graft.sources.ProtoIngest.encodeRow(Row(3L, "/cart"), clicks.schema)),
      Row(graft.sources.ProtoIngest.encodeRow(Row(4L, null), clicks.schema))).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("pb",
          org.apache.spark.sql.types.BinaryType))))
    graft.sources.ProtoIngest.ingest(clicks, pbRows, "pb", startLsn = 10)
    println(s"[9] protobuf ingest: table now ${clicks.read().count()} rows")

    // 10. initial copy (S2): new table adopts a snapshot, catch-up
    // replays only events above the boundary
    val copied = catalog.createTable("users_copy", schema, Identity.Keys(Seq("id")))
    val ic = new graft.streaming.InitialCopy(copied, boundaryLsn = 40)
    ic.onEvents(spark.createDataFrame(Seq(
      Row("u", 35L, null, 1, "stale", "s@x.com", 99, null), // <= boundary: dropped
      Row("d", 50L, null, 2, null, null, null, null)).asJava,
      org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("_op",
          org.apache.spark.sql.types.StringType) +:
        org.apache.spark.sql.types.StructField("_lsn",
          org.apache.spark.sql.types.LongType) +:
        org.apache.spark.sql.types.StructField("_xact",
          org.apache.spark.sql.types.LongType) +: schema.fields.toSeq)))
    ic.finish(reopened.read())
    println(s"[10] initial copy: ${copied.read().count()} rows after boundary " +
      s"drop + catch-up delete (source had ${reopened.read().count()})")

    // 11. the SQL surface: register the warehouse as a V2 catalog and
    // drive the full verb set — DDL, INSERT, UPDATE, MERGE, DELETE,
    // time travel and the $history metadata table — in plain SQL
    spark.conf.set("spark.sql.catalog.demo",
      classOf[graft.sources.GraftCatalogPlugin].getName)
    spark.conf.set("spark.sql.catalog.demo.warehouse", wh)
    spark.sql("CREATE TABLE demo.graft.kv (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id')")
    val kv = GraftTable.open(spark, s"$wh/kv", Identity.Keys(Seq("id")))
    kv.upsertAll(Seq(Row(1L, 10L), Row(2L, 20L), Row(3L, 30L)), startLsn = 1)
    kv.flush(); kv.publish()
    spark.sql("UPDATE demo.graft.kv SET v = v * 100 WHERE id >= 2")
    spark.sql("""MERGE INTO demo.graft.kv t
                |USING (SELECT * FROM VALUES (3L, -1L), (4L, 40L) AS s(id, v)) s
                |ON t.id = s.id
                |WHEN MATCHED AND s.v < 0 THEN DELETE
                |WHEN MATCHED THEN UPDATE SET t.v = s.v
                |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
                |""".stripMargin)
    spark.sql("DELETE FROM demo.graft.kv WHERE v > 1000")
    val sqlState = spark.sql("SELECT id, v FROM demo.graft.kv ORDER BY id")
      .collect().map(r => s"${r.getLong(0)}->${r.getLong(1)}").mkString(", ")
    val nVersions = spark.sql("SELECT count(*) FROM demo.graft.`kv$history`")
      .head().getLong(0)
    println(s"[11] SQL verbs: UPDATE+MERGE+DELETE left {$sqlState} " +
      s"across $nVersions manifest versions (kv$$history)")

    // 12. interop + point probe: export the table as Iceberg v3 and a
    // Delta log, read both back through the INDEPENDENT spec parsers,
    // and show the bucketed-index point lookup planning a bounded scan
    kv.mergeIndexes()
    val ice = spark.sql(
      "CALL demo.system.iceberg_sync('graft', 'kv')").head()
    val iceRows = graft.format.iceberg.IcebergSync
      .readDataFrame(spark, ice.getString(0)).count()
    spark.sql("CALL demo.system.delta_sync('graft', 'kv')").collect()
    val deltaRows = graft.format.delta.DeltaLog
      .readDataFrame(spark, s"$wh/kv").count()
    val probed = spark.read.format("graft").load(s"$wh/kv")
      .where(org.apache.spark.sql.functions.col("id") === 1L)
      .collect().map(r => s"${r.getLong(0)}->${r.getLong(1)}").mkString
    println(s"[12] interop: iceberg snapshot reads $iceRows rows, delta " +
      s"log reads $deltaRows rows via spec parsers; point probe {$probed} " +
      "through the bucketed key index")

    // 13. storage-partitioned join: bucket-compact kv and a second
    // co-keyed table onto the same layout, then join them through the
    // SQL catalog with zero exchanges (the DSv2 co-located join)
    spark.sql("CREATE TABLE demo.graft.kw (id BIGINT, w BIGINT) " +
      "TBLPROPERTIES ('keys'='id')")
    val kw = GraftTable.open(spark, s"$wh/kw", Identity.Keys(Seq("id")))
    kw.upsertAll(Seq(Row(1L, 7L), Row(4L, 9L)), startLsn = 1)
    kw.flush(); kw.publish()
    spark.sql("CALL demo.system.optimize(db => 'graft', tbl => 'kv', " +
      "bucket_by => 4)")
    spark.sql("CALL demo.system.optimize(db => 'graft', tbl => 'kw', " +
      "bucket_by => 4)")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val spj = spark.sql("SELECT a.id, a.v, b.w FROM demo.graft.kv a " +
      "JOIN demo.graft.kw b ON a.id = b.id ORDER BY a.id")
    val spjRows = spj.collect().map(r =>
      s"${r.getLong(0)}->(${r.getLong(1)},${r.getLong(2)})").mkString(", ")
    val nExchanges = "Exchange hashpartitioning".r
      .findAllIn(spj.queryExecution.executedPlan.toString()).size
    println(s"[13] storage-partitioned join: {$spjRows} with " +
      s"$nExchanges hash exchanges (co-bucketed layout, bucket_by=4)")

    graft.format.Fio.delete(wh)
    spark.stop()
  }
}
