package graft

import org.apache.spark.sql.functions._

import graft.ops.Snapshot
import graft.ops.Snapshot.{BloomSketch, FileEntry, Manifest}

/** The manifest's three on-disk layouts — full text, `V`-headed DELTA
  * (commit metadata ∝ what changed), `GMB1` binary checkpoint (the
  * at-scale full layout) — and the policy that picks between them:
  * deltas publish between checkpoints and resolve through the parent
  * chain, expiry never strands a retained chain, and every field
  * round-trips every layout. */
class ManifestFormatSpec extends SparkSpec {

  private def freshDir(): String =
    spark.conf.get("spark.sql.warehouse.dir") + "/graft_mf_" +
      java.util.UUID.randomUUID().toString.take(8)

  /** Local path of a table dir that may be spelled as a file: URI. */
  private def local(dir: String): String = dir.stripPrefix("file:")

  private def headOf(dir: String, v: Int): String = {
    val b = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(local(dir), "_manifests", f"v$v%05d"))
    new String(b, 0, math.min(b.length, 4), "UTF-8")
  }

  /** A manifest exercising EVERY field the formats carry — wide enough
    * (8 files, a stat per file) that a small change passes the
    * delta-must-shrink heuristic, and PATH-SORTED like every real
    * publisher's file list (the canonical order delta resolution
    * reproduces). */
  private def richManifest(v: Int): Manifest = {
    // mixed row-count stamps: the absolute-path entry stays UNKNOWN
    // (−1, the adopted/legacy shape) while local files carry counts —
    // round-trips must preserve both (round 16). kNulls likewise mixed
    // (round 17): even files carry a null-count stamp, odd files stay
    // unknown — all three layouts must preserve the distinction
    val files = FileEntry("/abs/elsewhere/part-9.parquet", 701L, 800L) +:
      (0 until 7).toVector.map(i =>
        FileEntry(s"data/c1_aa/part-$i.parquet",
          i * 100L + 1, i * 100L + 100, rows = i * 10L + 5,
          kNulls = if (i % 2 == 0) i.toLong else -1L))
    val bloom = {
      val bits = new Array[Long](4)
      BloomSketch.add(bits, 256, 2, 42L)
      BloomSketch(256, 2, bits)
    }
    Manifest(v, "k", files, note = "job:rich", ts = 1723700000000L + v,
      blooms = Map((files(1).path, "k") -> bloom),
      checks = Seq(("nonneg", "k >= 0")),
      addedCols = Seq(("score", "BIGINT")),
      colStats = files.map(f => (f.path, "k2") -> (f.min / 2, f.max / 2))
        .toMap,
      strStats = Map((files(2).path, "tag") -> ("a\tlow", "z high")),
      dvs = Map(files(0).path -> Array(3L, 7L, 1000L)),
      renames = Seq(("phys_v", "v")),
      droppedCols = Seq("old_col"),
      basePath = "/lake/base",
      genCols = Seq(("band", "BIGINT", "k % 8")),
      schemaJson = """{"type":"struct","fields":[]}""")
  }

  test("binary checkpoint round-trips every manifest field") {
    val dir = freshDir()
    spark.conf.set(Snapshot.BinaryMinFilesKey, "1")
    try Snapshot.publishManifestForTest(spark, dir, richManifest(1))
    finally spark.conf.unset(Snapshot.BinaryMinFilesKey)
    assert(headOf(dir, 1) == "GMB3", "8 files >= minFiles=1 must go binary")
    Snapshot.clearManifestCache()
    val got = Snapshot.manifest(spark, dir, 1)
    assert(Snapshot.sameState(got, richManifest(1)),
      s"binary round-trip diverged: $got")
  }

  test("full text still round-trips every manifest field") {
    val dir = freshDir()
    Snapshot.publishManifestForTest(spark, dir, richManifest(1))
    assert(headOf(dir, 1).startsWith("v\t"),
      "8 files < default binaryMinFiles stays text")
    Snapshot.clearManifestCache()
    assert(Snapshot.sameState(Snapshot.manifest(spark, dir, 1),
      richManifest(1)))
  }

  test("delta publish carries changes only and resolves exactly") {
    val dir = freshDir()
    val m1 = richManifest(1)
    Snapshot.publishManifestForTest(spark, dir, m1)
    // v2: drop the bloom-carrying file (its sidecars go implicitly),
    // add one with fresh stats, grow a DV, touch the small state — a
    // delta-shaped change whose result list stays path-sorted
    val added = FileEntry("data/c2_bb/part-0.parquet", 801L, 900L)
    val m2 = m1.copy(version = 2, note = "job:delta", ts = m1.ts + 10,
      files = m1.files.patch(1, Nil, 1) :+ added,
      colStats = m1.colStats + ((added.path, "k2") -> (120L, 180L)),
      dvs = Map(m1.files(0).path -> Array(3L, 7L, 1000L, 2000L)),
      checks = m1.checks :+ (("pos", "k > 0")))
    Snapshot.publishManifestForTest(spark, dir, m2)
    assert(headOf(dir, 2).startsWith("V\t"), "v2 must publish as a delta")
    Snapshot.clearManifestCache()
    val got = Snapshot.manifest(spark, dir, 2)
    // normalized expectation: the removed file's bloom and colStats
    // dropped; the k2 upsert and grown DV carry
    val want = m2.copy(blooms = Map.empty,
      colStats = m2.colStats - ((m1.files(1).path, "k2")))
    assert(Snapshot.sameState(got, want), s"delta resolution diverged: $got")
    // and v1 still reads as itself
    assert(Snapshot.sameState(Snapshot.manifest(spark, dir, 1), m1))
  }

  test("checkpoint interval bounds the chain; expiry snaps to its root") {
    import spark.implicits._
    val dir = freshDir()
    (1 to 12).foreach { i =>
      val cur = Snapshot.currentVersion(spark, dir)
      val carried =
        if (cur == 0) Nil else Snapshot.manifest(spark, dir, cur).files
      Snapshot.commit(Seq((i.toLong, s"v$i")).toDF("k", "v"),
        dir, cur, "k", carried, nFiles = 1)
    }
    // v1 full (no parent), v2..v9 deltas, v10 a checkpoint, v11+ deltas
    assert(headOf(dir, 1).startsWith("v\t"))
    (2 to 9).foreach(v => assert(headOf(dir, v).startsWith("V\t"), s"v$v"))
    assert(headOf(dir, 10).startsWith("v\t"), "v10 = checkpointEvery full")
    assert(headOf(dir, 11).startsWith("V\t"))
    // resolution through the chain: any version reads its own state
    assert(Snapshot.read(spark, dir, 7).count() == 7)
    assert(Snapshot.read(spark, dir, 12).count() == 12)
    // expire keep=2: retained 11..12 resolve through the v10 checkpoint,
    // so the floor snaps there — v10 survives, 1..9 go
    val dead = Snapshot.expireVersions(spark, dir, keep = 2,
      vacuumGraceMs = Long.MaxValue)
    assert(dead == (1 to 9), s"expired $dead")
    assert(Snapshot.versions(spark, dir) == Seq(10, 11, 12))
    assert(Snapshot.read(spark, dir, 11).count() == 11,
      "retained deltas must still resolve after expiry")
  }

  test("a rewritten base invalidates dependent cached resolutions") {
    import spark.implicits._
    val dir = freshDir()
    Snapshot.commit((1L to 8L).map(k => (k, k)).toDF("k", "v"),
      dir, 0, "k", nFiles = 2)
    Snapshot.commit(Seq((9L, 9L)).toDF("k", "v"), dir, 1, "k",
      carried = Snapshot.manifest(spark, dir, 1).files, nFiles = 1)
    assert(headOf(dir, 2).startsWith("V\t"))
    assert(Snapshot.manifest(spark, dir, 2).files.size == 3)
    val before = Snapshot.manifestParses.get()
    Snapshot.manifest(spark, dir, 2)
    assert(Snapshot.manifestParses.get() == before, "warm chain hit")
    // out-of-band rewrite of the BASE (test surgery): the child's cached
    // resolution must not survive it
    val p1 = java.nio.file.Paths.get(local(dir), "_manifests", "v00001")
    java.nio.file.Files.write(p1,
      (new String(java.nio.file.Files.readAllBytes(p1), "UTF-8") + "\n")
        .getBytes("UTF-8"))
    java.nio.file.Files.deleteIfExists(p1.resolveSibling(".v00001.crc"))
    val m2 = Snapshot.manifest(spark, dir, 2)
    assert(m2.files.size == 3, "re-resolved child still correct")
    assert(Snapshot.manifestParses.get() > before,
      "a changed base must force a fresh resolution of the child")
  }

  test("q165: registered chain query pins formats, head and mid-chain") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q165_manifest_chain")(spark, sf)
      .select($"phase", $"n", $"n_delta").collect()
    assert(out.forall(_.getLong(2) == 10L),
      "12 commits under checkpointEvery=10 must publish exactly 10 deltas")
    val byPhase = out.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).sum).toMap
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val total = orders.count()
    val b7 = orders.filter(expr("o_orderkey % 12 < 7")).count()
    assert(byPhase("cur") == total, s"head resolution: $byPhase vs $total")
    assert(byPhase("v07") == b7, s"mid-chain v7: $byPhase vs $b7")
  }

  test("a legacy GMB1 checkpoint still parses: rows unknown, fields intact") {
    // hand-rolled GMB1 byte stream (the round-15 layout: file records
    // carry NO row count) — the reader must branch on the magic's
    // revision byte and fill rows = −1, never misread the next field
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    def vlong(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0L) {
        dos.writeByte(((v & 0x7f) | 0x80).toInt); v >>>= 7
      }
      dos.writeByte(v.toInt)
    }
    def zz(v: Long): Unit = vlong((v << 1) ^ (v >> 63))
    def str(s: String): Unit = {
      val b = s.getBytes("UTF-8"); vlong(b.length.toLong); dos.write(b)
    }
    dos.write("GMB1".getBytes("UTF-8"))
    vlong(1L); str("k"); str("legacy"); vlong(1723700000123L)
    vlong(2L)                                   // files
    str("data/c1_aa/part-0.parquet"); zz(1L); zz(100L)
    str("data/c1_aa/part-1.parquet"); zz(101L); zz(200L)
    vlong(0L)                                   // column dictionary
    vlong(0L); vlong(0L); vlong(0L); vlong(0L)  // colStats/strStats/blooms/dvs
    vlong(0L); vlong(0L); vlong(0L); vlong(0L)  // checks/addedCols/renames/dropped
    str("")                                     // basePath
    vlong(0L)                                   // genCols
    str("")                                     // schemaJson
    val dir = freshDir()
    val mdir = java.nio.file.Paths.get(local(dir), "_manifests")
    java.nio.file.Files.createDirectories(mdir)
    java.nio.file.Files.write(mdir.resolve("v00001"), out.toByteArray)
    Snapshot.clearManifestCache()
    val m = Snapshot.manifest(spark, dir, 1)
    assert(m.version == 1 && m.statsCol == "k" && m.note == "legacy")
    assert(m.files.map(f => (f.path, f.min, f.max, f.rows)) == Seq(
      ("data/c1_aa/part-0.parquet", 1L, 100L, -1L),
      ("data/c1_aa/part-1.parquet", 101L, 200L, -1L)))
    // unknown rows are honest: the metadata count refuses, not zeroes
    assert(Snapshot.rowCountMeta(spark, dir, 1).isEmpty)
  }

  test("a round-16 GMB2 checkpoint still parses: rows kept, kNulls unknown") {
    // GMB2 file records carry the row count but predate the
    // clustering-key null count — the revision branch must fill
    // kNulls = −1 and keep every subsequent field aligned
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    def vlong(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0L) {
        dos.writeByte(((v & 0x7f) | 0x80).toInt); v >>>= 7
      }
      dos.writeByte(v.toInt)
    }
    def zz(v: Long): Unit = vlong((v << 1) ^ (v >> 63))
    def str(s: String): Unit = {
      val b = s.getBytes("UTF-8"); vlong(b.length.toLong); dos.write(b)
    }
    dos.write("GMB2".getBytes("UTF-8"))
    vlong(1L); str("k"); str("r16"); vlong(1723700000456L)
    vlong(1L)                                   // files
    str("data/c1_aa/part-0.parquet"); zz(1L); zz(100L); zz(42L)
    vlong(0L)                                   // column dictionary
    vlong(0L); vlong(0L); vlong(0L); vlong(0L)  // colStats/strStats/blooms/dvs
    vlong(0L); vlong(0L); vlong(0L); vlong(0L)  // checks/addedCols/renames/dropped
    str("")                                     // basePath
    vlong(0L)                                   // genCols
    str("")                                     // schemaJson
    val dir = freshDir()
    val mdir = java.nio.file.Paths.get(local(dir), "_manifests")
    java.nio.file.Files.createDirectories(mdir)
    java.nio.file.Files.write(mdir.resolve("v00001"), out.toByteArray)
    Snapshot.clearManifestCache()
    val m = Snapshot.manifest(spark, dir, 1)
    assert(m.files.map(f => (f.path, f.min, f.max, f.rows, f.kNulls)) ==
      Seq(("data/c1_aa/part-0.parquet", 1L, 100L, 42L, -1L)))
    // rows known → the metadata count still serves from a GMB2 file
    assert(Snapshot.rowCountMeta(spark, dir, 1).contains(42L))
  }

  test("a same-length same-mtime manifest rewrite misses the cache " +
    "once the fingerprint window closes") {
    import spark.implicits._
    val dir = freshDir()
    Snapshot.commit(Seq((1L, "a")).toDF("k", "v"), dir, 0, "k",
      nFiles = 1, note = "mark_AAAA")
    val p = java.nio.file.Paths.get(local(dir), "_manifests", "v00001")
    val mtime = java.nio.file.Files.getLastModifiedTime(p)
    assert(Snapshot.manifest(spark, dir, 1).note == "mark_AAAA")
    // out-of-band SAME-LENGTH rewrite, mtime forged back — the exact
    // state the (path, mtime, length) key cannot distinguish
    val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    java.nio.file.Files.write(p,
      txt.replace("mark_AAAA", "mark_BBBB").getBytes("UTF-8"))
    java.nio.file.Files.deleteIfExists(p.resolveSibling(".v00001.crc"))
    java.nio.file.Files.setLastModifiedTime(p, mtime)
    val old = Snapshot.mtimeGranularityMs
    try {
      Snapshot.mtimeGranularityMs = 0L // close the window immediately
      val before = Snapshot.manifestParses.get()
      val m = Snapshot.manifest(spark, dir, 1)
      assert(m.note == "mark_BBBB",
        "the fingerprint must force a re-parse, not serve stale state")
      assert(Snapshot.manifestParses.get() > before, "expected a miss")
      // and once re-verified, warm hits stay free (no further preads
      // needed for correctness — the flag pins for life)
      val again = Snapshot.manifestParses.get()
      assert(Snapshot.manifest(spark, dir, 1).note == "mark_BBBB")
      assert(Snapshot.manifestParses.get() == again, "warm hit")
    } finally Snapshot.mtimeGranularityMs = old
  }

  test("at-scale binary parse builds column-sharded sidecars that " +
    "behave as plain maps") {
    // ≥100k sidecar entries trigger the parallel column-sharded build
    // (ShardedStats); everything downstream must be unable to tell —
    // equality with the flat original, per-key lookups, O(changed)
    // updates, iteration — because delta application and the specs
    // all treat sidecars as ordinary immutable Maps
    val files = (0 until 30000).toVector.map(i =>
      FileEntry(f"data/c1_s/part-$i%06d.parquet",
        i * 10L, i * 10L + 9, rows = 3L, kNulls = 0L))
    val flat = (for (f <- files; c <- Seq("a", "b", "c", "d"))
      yield (f.path, c) -> (f.min + c.length, f.max + c.length)).toMap
    val m0 = Manifest(1, "k", files, note = "sharded", ts = 1L,
      colStats = flat)
    val dir = freshDir()
    spark.conf.set(Snapshot.BinaryMinFilesKey, "1")
    try Snapshot.publishManifestForTest(spark, dir, m0)
    finally spark.conf.unset(Snapshot.BinaryMinFilesKey)
    assert(headOf(dir, 1) == "GMB3")
    Snapshot.clearManifestCache()
    val m = Snapshot.manifest(spark, dir, 1)
    assert(m.colStats.isInstanceOf[Snapshot.ShardedStats[_]],
      s"expected the sharded build, got ${m.colStats.getClass}")
    assert(m.colStats.size == flat.size)
    assert(m.colStats == flat && flat == m.colStats,
      "Map equality must hold in both directions")
    val k = (files(12345).path, "c")
    assert(m.colStats.get(k).contains(flat(k)))
    assert(m.colStats.get((files(1).path, "zz")).isEmpty)
    // O(changed) algebra: updated / removed / ++ / -- keep contents
    val up = m.colStats.updated(k, (-1L, -2L))
    assert(up.size == flat.size && up(k) == ((-1L, -2L)))
    val newKey = ("data/other.parquet", "a")
    assert((m.colStats + (newKey -> ((5L, 6L)))).size == flat.size + 1)
    val rm = m.colStats - k
    assert(rm.size == flat.size - 1 && !rm.contains(k))
    assert((m.colStats - (("nope", "a"))).size == flat.size)
    assert(sameStateVia(m0, m), "full round-trip equality")
  }

  private def sameStateVia(a: Manifest, b: Manifest): Boolean = {
    // sameState is the writer's deep comparison; reuse it
    val mth = Snapshot.sameState(a.copy(ts = b.ts), b)
    mth
  }

  test("checkpointEvery=1 forces full manifests everywhere") {
    import spark.implicits._
    val dir = freshDir()
    spark.conf.set(Snapshot.CheckpointEveryKey, "1")
    try {
      (1 to 3).foreach { i =>
        val cur = Snapshot.currentVersion(spark, dir)
        val carried =
          if (cur == 0) Nil else Snapshot.manifest(spark, dir, cur).files
        Snapshot.commit(Seq((i.toLong, s"v$i")).toDF("k", "v"),
          dir, cur, "k", carried, nFiles = 1)
      }
    } finally spark.conf.unset(Snapshot.CheckpointEveryKey)
    (1 to 3).foreach(v =>
      assert(headOf(dir, v).startsWith("v\t"), s"v$v must be full"))
    assert(Snapshot.read(spark, dir, 3).count() == 3)
  }
}
