package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Ingest

/** The reference's ingest contracts (SURVEY §2-A A6-A13, A20) as behavior:
  * contract check raises listing the missing columns, FAILFAST errors on
  * malformed input like Postgres COPY, empty string -> NULL, and the DQ
  * gate genuinely throws (the reference's never could). */
class IngestSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType), StructField("v", IntegerType),
    StructField("s", StringType)))

  private def csv(content: String): String = {
    val dir = Files.createTempDirectory("graft_ingest").toFile
    val f = new java.io.File(dir, "in.csv")
    Files.writeString(f.toPath, content)
    f.getAbsolutePath
  }

  test("readCsv: header scan, empty field -> NULL (A6/A9/A13)") {
    val df = Ingest.readCsv(spark, csv("id,v,s\n1,2,a\n3,,b\n"), schema)
    val rows = df.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(1).isNullAt(1), "empty CSV field must load as NULL")
  }

  test("readCsv FAILFAST errors on malformed input like COPY (A13)") {
    val df = Ingest.readCsv(spark, csv("id,v,s\n1,2,a\n3,notanint,b\n"), schema)
    intercept[Exception] { df.collect() }
  }

  test("readJsonLines: declared schema, missing field -> NULL, FAILFAST on malformed") {
    val dir = Files.createTempDirectory("graft_json").toFile
    val f = new java.io.File(dir, "in.jsonl")
    Files.writeString(f.toPath,
      """{"id": 1, "v": 2, "s": "a"}
        |{"id": 3, "s": "b"}
        |""".stripMargin)
    val df = Ingest.readJsonLines(spark, f.getAbsolutePath, schema)
    val rows = df.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(1).isNullAt(1), "absent JSON field must load as NULL")
    // malformed line -> FAILFAST errors like COPY
    val bad = new java.io.File(dir, "bad.jsonl")
    Files.writeString(bad.toPath, "{\"id\": 1, \"v\": \"notanint\"}\n")
    intercept[Exception] {
      Ingest.readJsonLines(spark, bad.getAbsolutePath, schema).collect()
    }
  }

  test("observedDqGate: metrics ride the write's single pass; gate asserts") {
    import org.apache.spark.sql.functions._
    val out = Files.createTempDirectory("graft_obs").toString
    val df = Ingest.readCsv(spark, csv("id,v,s\n1,2,a\n3,4,b\n"), schema)
    // clean data: one pass writes AND yields the metrics
    val (n, nulls) = Ingest.observedDqGate(df, "clean", Seq("v")) { d =>
      d.write.mode("overwrite").parquet(s"$out/t1")
    }
    assert(n == 2 && nulls == Seq(0L))
    assert(spark.read.parquet(s"$out/t1").count() == 2)
    // a null in a not-null column fails the gate AFTER the single pass
    val dirty = Ingest.readCsv(spark, csv("id,v,s\n1,,a\n3,4,b\n"), schema)
    val e = intercept[IllegalStateException] {
      Ingest.observedDqGate(dirty, "dirty", Seq("v")) { d =>
        d.write.mode("overwrite").parquet(s"$out/t2")
      }
    }
    assert(e.getMessage.contains("v(1)"), e.getMessage)
    // an empty frame fails the non-empty clause
    intercept[IllegalStateException] {
      Ingest.observedDqGate(df.filter(lit(false)), "empty", Seq("v")) { d =>
        d.write.mode("overwrite").parquet(s"$out/t3")
      }
    }
  }

  test("readOrc: schema'd scan with predicate pushdown reaching the ORC reader") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_orc").toString
    Ingest.readCsv(spark, csv("id,v,s\n1,2,a\n3,4,b\n5,6,c\n"), schema)
      .write.mode("overwrite").orc(s"$dir/t")
    val back = Ingest.readOrc(spark, s"$dir/t", schema).filter(col("id") > 2)
    assert(back.count() == 2)
    // the filter must reach the ORC scan, not sit in a post-scan Filter only
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,2)]"),
      s"predicate must push into the ORC scan; plan:\n$plan")
  }

  test("readText: line mode rows, whole-file mode one row per document") {
    val dir = Files.createTempDirectory("graft_txt").toFile
    Files.writeString(new java.io.File(dir, "a.txt").toPath, "line one\nline two\n")
    Files.writeString(new java.io.File(dir, "b.txt").toPath, "solo\n")
    assert(Ingest.readText(spark, dir.getAbsolutePath).count() == 3)
    val whole = Ingest.readText(spark, dir.getAbsolutePath, wholeFile = true)
      .collect().map(_.getString(0)).sorted
    assert(whole.length == 2 && whole.head.startsWith("line one\nline two"),
      s"whole-file mode must yield one row per file, got ${whole.toSeq}")
  }

  test("requireColumns raises listing the missing columns (A7)") {
    val df = Ingest.readCsv(spark, csv("id,v,s\n1,2,a\n"), schema)
    val e = intercept[IllegalArgumentException] {
      Ingest.requireColumns(df, Seq("id", "claim_id", "prvdr_num"))
    }
    assert(e.getMessage.contains("claim_id") && e.getMessage.contains("prvdr_num"))
    // present columns pass, case-insensitively (reference folds case, :70)
    Ingest.requireColumns(df, Seq("ID", "V"))
  }

  test("projectKeep prunes to keep_cols in order (A8)") {
    val df = Ingest.readCsv(spark, csv("id,v,s\n1,2,a\n"), schema)
    assert(Ingest.projectKeep(df, Seq("s", "id")).columns.toSeq == Seq("s", "id"))
  }

  test("emptyToNull: whitespace-only strings -> NULL (A9)") {
    val df = Ingest.readCsv(spark, csv("id,v,s\n1,2,\"  \"\n2,3,x\n"), schema)
    val out = Ingest.emptyToNull(df, Seq("s")).orderBy("id").collect()
    assert(out(0).isNullAt(2) && out(1).getString(2) == "x")
  }

  test("stageOverwrite is idempotent (A5/A12)") {
    val out = Files.createTempDirectory("graft_stage").toString + "/t"
    val df = Ingest.readCsv(spark, csv("id,v,s\n1,2,a\n"), schema)
    Ingest.stageOverwrite(df, out)
    Ingest.stageOverwrite(df, out) // re-stage replaces, never duplicates
    assert(spark.read.parquet(out).count() == 1)
  }

  test("assertNonEmptyPath: passes on data, fails on missing/empty (A2/A4)") {
    Ingest.assertNonEmptyPath(spark, s"$sf/orders.parquet")
    val missing = intercept[IllegalArgumentException] {
      Ingest.assertNonEmptyPath(spark, "/tmp/graft_no_such_file_xyz")
    }
    assert(missing.getMessage.contains("does not exist"))
    val empty = Files.createTempFile("graft_empty", ".zip").toString
    val e = intercept[IllegalArgumentException] {
      Ingest.assertNonEmptyPath(spark, empty)
    }
    assert(e.getMessage.contains("0 bytes"))
  }

  test("readZippedCsv: many small zips -> one typed DataFrame (A3/A6)") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val dir = Files.createTempDirectory("graft_zips").toFile
    def zip(name: String, entries: (String, String)*): Unit = {
      val zos = new ZipOutputStream(
        new java.io.FileOutputStream(new java.io.File(dir, name)))
      entries.foreach { case (entry, content) =>
        zos.putNextEntry(new ZipEntry(entry))
        zos.write(content.getBytes("UTF-8"))
        zos.closeEntry()
      }
      zos.close()
    }
    // the CMS shape: several archives, one header CSV per entry
    zip("a.zip", "claims_1.csv" -> "id,v,s\n1,10,x\n2,,y\n",
                 "claims_2.csv" -> "id,v,s\n3,30,z\n")
    zip("b.zip", "claims_3.csv" -> "id,v,s\n4,40,w\n")
    val lines = Ingest.readZippedLines(spark, dir.getAbsolutePath)
    assert(lines.count() == 7, "3 headers + 4 data lines")
    assert(lines.select("entry").distinct().count() == 3)
    val df = Ingest.readZippedCsv(spark, dir.getAbsolutePath, schema)
    val rows = df.orderBy("id").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    assert(rows(1).isNullAt(1), "empty CSV field inside the zip -> NULL")
  }

  test("fetchHttp: loopback fetch -> unzip -> typed read, end to end (A1/A2/A3/A6)") {
    // The reference's first operator is an HTTP GET of each ZIP archive
    // (cms_inpatient_download_unzip.py:27-36). The build sandbox has zero
    // egress, so the server side is a loopback JDK HttpServer — the fetch
    // path itself (streamed landing, status/truncation checks, tmp+rename
    // staging, A2 integrity) is exactly what a real deployment runs.
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    zos.putNextEntry(new ZipEntry("claims_1.csv"))
    zos.write("id,v,s\n1,10,x\n2,,y\n".getBytes("UTF-8"))
    zos.closeEntry()
    zos.close()
    val zipBytes = bos.toByteArray
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/cms/claims.zip",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        ex.sendResponseHeaders(200, zipBytes.length.toLong)
        ex.getResponseBody.write(zipBytes)
        ex.close()
      })
    server.createContext("/missing.zip",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        ex.sendResponseHeaders(404, -1); ex.close()
      })
    server.start()
    try {
      val port = server.getAddress.getPort
      val dir = Files.createTempDirectory("graft_fetch").toFile
      val dest = new java.io.File(dir, "claims.zip").getAbsolutePath
      val n = Ingest.fetchHttp(spark,
        s"http://127.0.0.1:$port/cms/claims.zip", dest)
      assert(n == zipBytes.length.toLong, "landed byte count must match")
      assert(!new java.io.File(dest + ".tmp").exists,
        "tmp landing file must be renamed away")
      // refetch is idempotent (A5's overwrite discipline at the fetch step)
      assert(Ingest.fetchHttp(spark,
        s"http://127.0.0.1:$port/cms/claims.zip", dest) == n)
      val rows = Ingest.readZippedCsv(spark, dest, schema)
        .orderBy("id").collect()
      assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2))
      assert(rows(1).isNullAt(1), "empty field in the fetched CSV -> NULL")
      // non-200 fails loudly, like the reference's raise_for_status
      val miss = intercept[IllegalArgumentException] {
        Ingest.fetchHttp(spark, s"http://127.0.0.1:$port/missing.zip",
          new java.io.File(dir, "m.zip").getAbsolutePath)
      }
      assert(miss.getMessage.contains("HTTP 404"))
      assert(!new java.io.File(dir, "m.zip").exists,
        "a failed fetch must not stage a destination file")
    } finally server.stop(0)
  }

  test("readZippedCsv skips only the first line per entry, not header-lookalikes") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val dir = Files.createTempDirectory("graft_zips_hdr").toFile
    val zos = new ZipOutputStream(
      new java.io.FileOutputStream(new java.io.File(dir, "h.zip")))
    // data row "s" coincides with the header string — it must SURVIVE
    zos.putNextEntry(new ZipEntry("t.csv"))
    zos.write("s\ns\nx\n".getBytes("UTF-8"))
    zos.closeEntry()
    zos.close()
    val one = StructType(Seq(StructField("s", StringType)))
    val vals = Ingest.readZippedCsv(spark, dir.getAbsolutePath, one)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(vals == Seq("s", "x"),
      "a data row equal to the header must not be dropped")
  }

  test("writeJdbc/readJdbc round-trip against embedded Derby (A10)") { Derby.exclusive {
    // The reference's real sink is Postgres COPY; the JDBC exemplar is
    // exercised here against the Derby embedded driver that ships with
    // Spark's jars — same JdbcRelationProvider code path a Postgres
    // deployment takes, different dialect. Skip (don't fail) if a future
    // environment drops the Derby jars.
    assume(
      try { Class.forName("org.apache.derby.jdbc.EmbeddedDriver"); true }
      catch { case _: ClassNotFoundException => false },
      "Derby embedded driver not on the classpath")
    // in-memory DB: per-JVM, vanishes with the suite; fine in local mode
    // where driver and executors share the JVM
    val url = "jdbc:derby:memory:graft_ingest;create=true"
    val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val src = Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    Ingest.writeJdbc(src, url, "nation_sink", options = opts)
    // overwrite is idempotent like the reference's drop-and-reload
    Ingest.writeJdbc(src, url, "nation_sink", options = opts)
    val back = Ingest.readJdbc(spark, url, "nation_sink", opts)
    assert(back.count() == src.count())
    assert(back.select("n_nationkey", "n_name", "n_regionkey").collect().toSet
      == src.collect().toSet,
      "JDBC round-trip must preserve every row")
    // append mode accumulates instead of replacing
    Ingest.writeJdbc(src.limit(5), url, "nation_sink", mode = "append",
      options = opts)
    assert(Ingest.readJdbc(spark, url, "nation_sink", opts).count()
      == src.count() + 5)
  } }

  test("bulkJdbcUrl: PG rewrite flag appended exactly once, others untouched") {
    // the PG-specific half of the COPY-grade sink, testable without a
    // Postgres server (the sandbox has no PG driver or daemon)
    assert(Ingest.bulkJdbcUrl("jdbc:postgresql://h/db")
      == "jdbc:postgresql://h/db?reWriteBatchedInserts=true")
    assert(Ingest.bulkJdbcUrl("jdbc:postgresql://h/db?ssl=false")
      == "jdbc:postgresql://h/db?ssl=false&reWriteBatchedInserts=true")
    // already present (either value) — never duplicated
    val keep = "jdbc:postgresql://h/db?reWriteBatchedInserts=false"
    assert(Ingest.bulkJdbcUrl(keep) == keep)
    // non-PG dialects pass through: the flag is PG-driver-only
    assert(Ingest.bulkJdbcUrl("jdbc:derby:memory:x;create=true")
      == "jdbc:derby:memory:x;create=true")
  }

  test("writeJdbcBulk re-publish keeps target DDL; concurrent republish never corrupts") { Derby.exclusive {
    // truncate=true exists so overwrite keeps the TARGET'S DDL (indexes,
    // grants) instead of drop+recreate — the reference's reload keeps its
    // table. Proven against Derby: an index created on the sink must
    // survive any number of re-publishes, including racing ones (the A22
    // retry discipline can fire two publish attempts at once after a
    // orphaned-task timeout); after the dust settles one more publish
    // must land exactly the source rows on the still-indexed table.
    assume(
      try { Class.forName("org.apache.derby.jdbc.EmbeddedDriver"); true }
      catch { case _: ClassNotFoundException => false },
      "Derby embedded driver not on the classpath")
    // DISK-backed DB, not memory: — racing truncates can panic the
    // embedded engine ("Shutting down due to severe error", observed
    // round 14), and a memory DB dies with the engine, which would fail
    // the survival assertions for a reason the test doesn't test. A
    // disk DB recovers through Derby's transaction log on re-boot —
    // exactly the "never corrupts" contract under proof. Every check
    // opens a FRESH connection after re-registering the driver (the
    // documented re-boot idiom, a no-op on a healthy engine), because a
    // panic kills long-lived connections.
    val dbDir = java.nio.file.Files
      .createTempDirectory("graft_derby_ddl").toString + "/db"
    val url = s"jdbc:derby:$dbDir;create=true"
    val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    def withConn[A](f: java.sql.Connection => A): A = {
      Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
        .getDeclaredConstructor().newInstance()
      val c = java.sql.DriverManager.getConnection(url)
      try f(c) finally c.close()
    }
    val src = Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val n = src.count()
    Ingest.writeJdbcBulk(src, url, "nation_ddl", options = opts)
    // Spark's JDBC sink quotes COLUMN identifiers (they land lowercase)
    // while the unquoted table name folds to upper case — quote to match
    withConn(_.createStatement()
      .execute("CREATE INDEX nation_ddl_ix ON nation_ddl (\"n_nationkey\")"))
    def indexExists: Boolean = withConn { c =>
      val rs = c.getMetaData.getIndexInfo(null, null, "NATION_DDL",
        false, false)
      Iterator.continually(rs)
        .takeWhile(_.next()).exists(r =>
          "NATION_DDL_IX".equalsIgnoreCase(
            String.valueOf(r.getString("INDEX_NAME"))))
    }
    assert(indexExists, "sanity: the index must exist after CREATE INDEX")
    // sequential re-publish: DDL survives, rows replaced not appended
    Ingest.writeJdbcBulk(src, url, "nation_ddl", options = opts)
    assert(indexExists, "truncate overwrite must keep the index")
    assert(Ingest.readJdbc(spark, url, "nation_ddl", opts).count() == n)
    // concurrent re-publish: two racing truncate+insert publishes may
    // interleave arbitrarily, but must never corrupt — both complete
    // (or fail cleanly, up to and including an engine panic that the
    // disk DB recovers from), the index survives, and a final publish
    // restores exactly the source rows
    val pub = (0 until 2).map { _ =>
      new Thread(() =>
        try Ingest.writeJdbcBulk(src, url, "nation_ddl", options = opts)
        catch { case scala.util.control.NonFatal(_) => () })
    }
    pub.foreach(_.start())
    // BOUNDED join: embedded Derby can wedge in an INTERNAL page-latch
    // deadlock under racing TRUNCATE publishes (a Derby engine defect —
    // two of its threads block on each other's page monitors; observed
    // round 15 after ~15 rounds of clean runs). That is a third outcome
    // the contract comment above doesn't list: neither completing nor
    // failing cleanly. A wedged gate is worse than a canceled test —
    // convert the hang into a visible cancel; the sequential-republish
    // halves above have already proven the engine-side contract.
    val deadline = System.currentTimeMillis() + 120000
    pub.foreach(t =>
      t.join(math.max(1, deadline - System.currentTimeMillis())))
    if (pub.exists(_.isAlive))
      cancel("embedded Derby wedged in its internal page-latch deadlock " +
        "under racing TRUNCATE publishes (Derby defect, not an engine " +
        "contract violation) — skipping the settled-state assertions " +
        "instead of hanging the suite")
    assert(indexExists, "racing republishes must not drop the index")
    Ingest.writeJdbcBulk(src, url, "nation_ddl", options = opts)
    assert(indexExists)
    val back = Ingest.readJdbc(spark, url, "nation_ddl", opts)
    assert(back.count() == n &&
      back.collect().toSet == src.collect().toSet,
      "the settled publish must land exactly the source rows")
  } }

  test("writeJdbcBulk round-trips and out-batches the default path (A10)") { Derby.exclusive {
    assume(
      try { Class.forName("org.apache.derby.jdbc.EmbeddedDriver"); true }
      catch { case _: ClassNotFoundException => false },
      "Derby embedded driver not on the classpath")
    val url = "jdbc:derby:memory:graft_bulk;create=true"
    val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    // enough rows that batch size matters; narrow so the test stays fast
    val src = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .coalesce(1).cache()
    val n = src.count()
    // correctness first: identical row set to the default path's landing
    Ingest.writeJdbc(src, url, "orders_plain", options = opts)
    Ingest.writeJdbcBulk(src, url, "orders_bulk", options = opts)
    assert(Ingest.readJdbc(spark, url, "orders_bulk", opts).count() == n)
    assert(
      Ingest.readJdbc(spark, url, "orders_bulk", opts).collect().toSet
        == Ingest.readJdbc(spark, url, "orders_plain", opts).collect().toSet,
      "bulk landing must be row-identical to the default path")
    // overwrite is idempotent (truncate=true keeps the table, replaces rows)
    Ingest.writeJdbcBulk(src, url, "orders_bulk", options = opts)
    assert(Ingest.readJdbc(spark, url, "orders_bulk", opts).count() == n)
    // the measured lever: rows/s of each path against the same Derby DB.
    // Derby only sees the batchsize change (the PG multi-row rewrite needs
    // the PG driver), so this bounds the gain from below; recorded rather
    // than asserted — an in-memory DB's insert cost is noisy and the
    // 10000-vs-1000 batch delta can vanish inside it.
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val tPlain = time(Ingest.writeJdbc(src, url, "orders_plain", options = opts))
    val tBulk = time(Ingest.writeJdbcBulk(src, url, "orders_bulk", options = opts))
    info(f"plain: ${n / tPlain}%.0f rows/s  bulk: ${n / tBulk}%.0f rows/s " +
      f"(n=$n, Derby sees batchsize only)")
    src.unpersist()
  } }

  test("readEvolved merges additive schema drift, rejects type conflicts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    // batch 1: original schema; batch 2: a column added later
    spark.range(5).selectExpr("id AS k", "CAST(id AS STRING) AS a")
      .write.parquet(s"$dir/b1")
    spark.range(5).selectExpr("id + 10 AS k", "CAST(id AS STRING) AS a",
        "id * 2 AS b")
      .write.parquet(s"$dir/b2")
    val merged = Ingest.readEvolved(spark, Seq(s"$dir/b1", s"$dir/b2"))
    assert(merged.columns.toSet == Set("k", "a", "b"))
    assert(merged.count() == 10)
    // the pre-evolution batch null-fills the added column, exactly
    assert(merged.filter(col("b").isNull).count() == 5)
    assert(merged.filter(col("k") >= 10 && col("b").isNull).count() == 0)
    // an INCOMPATIBLE type change on a same-named column fails loudly —
    // additive drift merges, silent type coercion does not
    spark.range(3).selectExpr("id AS k", "id AS a") // a: BIGINT vs STRING
      .write.parquet(s"$dir/b3")
    intercept[Exception] {
      Ingest.readEvolved(spark, Seq(s"$dir/b1", s"$dir/b3")).collect()
    }
  }

  test("dqGateNonEmpty throws on empty input (A20, fixed)") {
    val df = Tables.orders(spark, sf)
    assert(Ingest.dqGateNonEmpty(df, "ok").count() > 0)
    val e = intercept[IllegalArgumentException] {
      Ingest.dqGateNonEmpty(df.filter(lit(false)), "empty_gate")
    }
    assert(e.getMessage.contains("empty_gate"))
  }
}
