package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Tenancy

/** Tenant layout: the per-tenant read must be directory-pruned (the
  * partition filter reaches the scan) and row-identical to a direct
  * filter over the source.
  */
class TenancySpec extends SparkSpecBase {

  test("tenantView: partition-pruned, row-identical to the source filter") {
    val dir = fixtureDir(evs = (0 until 100).map(i =>
      ev(i, i * 100L, user = i % 10, typ = s"t${i % 3}",
        value = i.toDouble)))
    val path = Files.createTempDirectory("graft-tenant").toString + "/log"
    Tenancy.writeTenantLayout(spark, dir, path)
    // one directory per occupied shard (10 users -> shards 0..9)
    val dirs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs === (0 until 10).map(s => s"tenant_shard=$s").toSet)
    // the view returns exactly the user's rows
    val view = Tenancy.tenantView(spark, path, userId = 7L)
    val expected = spark.read.parquet(s"$dir/events.parquet")
      .filter(col("user_id") === 7L)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(rows(view.select("event_id", "ts", "user_id", "event_type",
      "value", "props")) === rows(expected))
    // and the shard predicate is a PARTITION filter (directory pruning),
    // with the user predicate pushed to the parquet scan
    val plan = view.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(tenant_shard"),
      plan)
    assert(plan.contains("PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)"),
      plan)
  }

  test("tenant_usage: per-shard rollup with the noisy-neighbor argmax") {
    import graft.operators.Tenancy
    // shard 1: users 1 (3 events) and 17 (1 event); shard 2: user 2 (2)
    val evs = Seq(
      ev(0, 0, 1, "click", 1.0), ev(1, 10, 1, "click", 2.0),
      ev(2, 20, 1, "view", 3.0), ev(3, 30, 17, "click", 4.0),
      ev(4, 40, 2, "click", 5.5), ev(5, 50, 2, "view", 0.5))
    val dir = fixtureDir(evs = evs)
    val out = rows(Tenancy.tenantUsage(spark, dir))
    assert(out === Set(
      Seq(1, 2L, 4L, 10.0, 1L, 0.75),
      Seq(2, 1L, 2L, 6.0, 2L, 1.0)))
  }

  test("forget_user: per-table purge counts with the order->lineitem cascade") {
    import spark.implicits._
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    // ForgetMod = 50: user/custkey 50 purges, 1 stays
    val dir = fixtureDir(evs = Seq(
      ev(1, 10, 50, "click"), ev(2, 20, 1, "view")))
    Seq((50L, 0L, "A", 1.0), (1L, 0L, "A", 1.0))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .write.parquet(s"$dir/customer.parquet")
    Seq((1L, 50L, 10.0), (2L, 1L, 20.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    // order 1 (purged customer) carries two lines, order 2 one line
    Seq((1L, 1.0), (1L, 2.0), (2L, 3.0))
      .toDF("l_orderkey", "l_quantity")
      .write.parquet(s"$dir/lineitem.parquet")
    assert(rows(Tenancy.forgetUser(spark, dir)) === Set(
      Seq("events", 2L, 1L, 0.5),
      Seq("customer", 2L, 1L, 0.5),
      Seq("orders", 2L, 1L, 0.5),
      Seq("lineitem", 3L, 2L, r4(2.0 / 3))))
  }

  test("applyErasure: erased tenant reads 0 rows, untouched partitions " +
      "byte-identical, manifest reconciles, emptied shard dir deleted") {
    // users 0..9 -> shards 0..9; user 0 matches the ForgetMod=50 rule
    import spark.implicits._
    val dir = fixtureDir(evs = (0 until 100).map(i =>
      ev(i, i * 100L, user = i % 10, typ = s"t${i % 3}",
        value = i.toDouble)))
    // minimal star tables so the manifest's other rows price cleanly
    Seq((1L, 0L, "A", 1.0))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .write.parquet(s"$dir/customer.parquet")
    Seq((1L, 1L, 10.0)).toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    Seq((1L, 1.0)).toDF("l_orderkey", "l_quantity")
      .write.parquet(s"$dir/lineitem.parquet")
    val path = Files.createTempDirectory("graft-erase").toString + "/log"
    Tenancy.writeTenantLayout(spark, dir, path)
    def fileStats(shard: Int): Set[(String, Long, Long)] = {
      val d = new java.io.File(s"$path/tenant_shard=$shard")
      if (!d.exists()) Set.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length(), f.lastModified())).toSet
    }
    val before = (0 until 10).map(s => s -> fileStats(s)).toMap
    val rowsBefore = spark.read.parquet(path).count()
    // the manifest prices the erasure; the batch derives from the same rule
    val manifest = Tenancy.forgetUser(spark, dir)
      .filter(col("table_name") === "events").head
    val nPurge = manifest.getLong(2)
    assert(nPurge === 10L) // user 0's events
    val batch = Tenancy.erasureBatch(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    assert(batch === Seq(0L))
    Tenancy.applyErasure(spark, path, batch)
    // the erased tenant reads zero rows; the manifest reconciles exactly
    assert(Tenancy.tenantView(spark, path, userId = 0L).count() === 0L)
    val rowsAfter = spark.read.parquet(path).count()
    assert(rowsBefore - rowsAfter === nPurge)
    // untouched shards: the same parquet files, byte- and mtime-identical
    (1 until 10).foreach { s =>
      assert(fileStats(s) === before(s), s"shard $s was touched")
    }
    assert(fileStats(0) !== before(0), "erased shard must be rewritten")
    // surviving users are row-identical to the pre-erasure view
    val survivor = Tenancy.tenantView(spark, path, userId = 7L)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val expected = spark.read.parquet(s"$dir/events.parquet")
      .filter(col("user_id") === 7L)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(rows(survivor) === rows(expected))
    // erasing EVERY user of a shard deletes its directory outright
    // (dynamic overwrite writes nothing for an emptied partition)
    Tenancy.applyErasure(spark, path, Seq(3L))
    assert(!new java.io.File(s"$path/tenant_shard=3").exists())
    assert(Tenancy.tenantView(spark, path, userId = 7L).count() === 10L)
  }

  test("compactArtifacts: erased ids leave every persisted artifact, " +
      "untouched files stay byte-identical, store_coverage reconciles " +
      "to zero debt") {
    import graft.operators.{Curation, Dedup, Similarity, Tenancy}
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // docs 0=3 and 8=9 are identical-text dup groups (identical shingle
    // sets ALWAYS band-collide, so both verified pairs are guaranteed);
    // 5 and 7 are unique; vec 1 sits in every vector artifact. Erase
    // set = {1, 3, 5}: a pair member, a hash canonical, a vector.
    val tA = "alpha beta gamma delta epsilon zeta"
    val tD = "red green blue cyan magenta yellow"
    val dir = fixtureDir(
      docs = Seq(doc(0, tA), doc(3, tA),
        doc(5, "one two three four five six"),
        doc(7, "quick brown fox jumps over dog"),
        doc(8, tD), doc(9, tD)),
      embs = Seq(Emb(0, vec(1.0), 0), Emb(1, vec(0.5, 0.5), 0),
        Emb(2, vec(0.0, 1.0), 1)))
    // build the artifact population: coverage stores + pair set + graph
    assert(rows(Curation.storeCoverage(spark, dir))
      .forall(r => r(3) == 0L && r(4) == 0L), "pre: coverage green")
    assert(rows(Dedup.dedupPairs(spark, dir)
      .select(col("id_a"), col("id_b"))) ===
      Set(Seq[Any](0L, 3L), Seq[Any](8L, 9L)))
    Similarity.knnGraph(spark, dir).count()
    Similarity.pqIndex(spark, dir).codes.count()
    Similarity.denseTruth(spark, dir).count()
    // snapshot every artifact file that does NOT contain an erased id
    def files(p: String): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(p))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> ((f.length, f.lastModified))).toMap
    }
    val bandPath = Dedup.bandStorePath(dir)
    val untouchedBefore = files(bandPath).filter { case (p, _) =>
      // a band-store file is untouched iff it holds no erased doc row
      spark.read.parquet(p).filter(col("doc_id").isin(1L, 3L, 5L))
        .isEmpty
    }
    // the caller erases the SOURCE tables first (docs 3 & 5, vec 1) ...
    Seq(doc(0, tA), doc(7, "quick brown fox jumps over dog"),
      doc(8, tD), doc(9, tD)).toDF()
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq(Emb(0, vec(1.0), 0), Emb(2, vec(0.0, 1.0), 1)).toDF()
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // ... then clears the derived debt
    Tenancy.compactArtifacts(spark, dir, Seq(1L, 3L, 5L))
    // no artifact row carries an erased id anywhere
    val del = Seq(1L, 3L, 5L)
    assert(spark.read.parquet(bandPath)
      .filter(col("doc_id").isin(del: _*)).isEmpty)
    assert(spark.read.parquet(Dedup.hashStorePath(dir))
      .filter(col("canonical").isin(del: _*)).isEmpty)
    assert(spark.read.parquet(Similarity.bqCodesPath(dir))
      .filter(col("vec_id").isin(del: _*)).isEmpty)
    assert(spark.read
      .parquet(s"${Similarity.ivfFlatIndexPath(dir)}/lists")
      .filter(col("vec_id").isin(del: _*)).isEmpty)
    assert(spark.read.parquet(s"${Similarity.pqIndexPath(dir)}/codes")
      .filter(col("vec_id").isin(del: _*)).isEmpty)
    assert(spark.read.parquet(Similarity.knnGraphPath(dir))
      .filter(col("src").isin(del: _*) || col("dst").isin(del: _*))
      .isEmpty)
    assert(spark.read.parquet(Similarity.denseTruthPath(dir))
      .filter(col("q_id").isin(del: _*) ||
        col("neighbor_id").isin(del: _*)).isEmpty)
    // the erased pair is gone; the unrelated pair SURVIVES compaction
    assert(rows(spark.read.parquet(Dedup.pairsIndexPath(dir))
      .select(col("id_a"), col("id_b"))) === Set(Seq[Any](8L, 9L)))
    // untouched band-store files byte-identical (never rewritten)
    val after = files(bandPath)
    untouchedBefore.foreach { case (p, meta) =>
      assert(after.get(p) === Some(meta), s"$p must not be rewritten")
    }
    // the standing audit reads ZERO erasure debt on every artifact
    assert(rows(Curation.storeCoverage(spark, dir))
      .forall(r => r(3) == 0L && r(4) == 0L),
      "post-erasure coverage must read n_missing=0, n_extra=0")
  }

  test("dp_release: hand-computed Laplace draw; release = count + " +
      "rounded noise") {
    val d = fixtureDir(docs = Seq(
      doc(1, "a", source = "sA"), doc(2, "b", source = "sA"),
      doc(3, "c", source = "sA"), doc(4, "d", source = "sB")))
    def noiseOf(src: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$src:${Tenancy.DpSeed}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(md.substring(0, 8), 16)
      val u = (h.toDouble + 0.5) / 4294967296.0
      val c = u - 0.5
      val raw = if (c >= 0) -math.log(1.0 - 2.0 * c)
        else math.log(1.0 + 2.0 * c)
      math.floor(raw / Tenancy.DpEpsilon * 1e6 + 0.5) / 1e6
    }
    val exp = Seq(("sA", 3L), ("sB", 1L)).map { case (s, n) =>
      val nz = noiseOf(s)
      val rel = n + math.floor(nz + 0.5).toLong
      Seq[Any](s, n, nz, rel, math.abs(rel - n))
    }.toSet
    assert(rows(Tenancy.dpRelease(spark, d)) === exp)
  }

  test("k_anonymity: hand-built equivalence classes across the k grid") {
    import spark.implicits._
    val dir = fixtureDir(evs = Seq(ev(1, 10, 1, "click")))
    // class A = (nation 0, seg A, bucket 0) x3; class B = (1, B, bucket 1) x1
    Seq((1L, 0L, "A", 100.0), (2L, 0L, "A", 200.0), (3L, 0L, "A", 300.0),
      (4L, 1L, "B", 1500.0))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .write.parquet(s"$dir/customer.parquet")
    val out = rows(Tenancy.kAnonymity(spark, dir))
    assert(out === Set(
      Seq(2, 2L, 1L, 1L, 0.75),   // only class B (size 1) below k=2
      Seq(3, 2L, 1L, 1L, 0.75),   // class A (size 3) still >= 3
      Seq(5, 2L, 2L, 4L, 0.0),    // both classes below 5
      Seq(10, 2L, 2L, 4L, 0.0),
      Seq(25, 2L, 2L, 4L, 0.0)))
  }

  test("l_diversity: a homogeneous class trips every l; the mixed " +
      "class survives l = 3") {
    import spark.implicits._
    val dir = fixtureDir(evs = Seq(ev(1, 10, 1, "click")))
    // class (0, bucket 0): segments A,A -> l=1, 2 rows;
    // class (1, bucket 0): segments A,B,C -> l=3, 3 rows
    Seq((1L, 0L, "A", 100.0), (2L, 0L, "A", 200.0),
      (3L, 1L, "A", 100.0), (4L, 1L, "B", 200.0), (5L, 1L, "C", 300.0))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .write.parquet(s"$dir/customer.parquet")
    assert(rows(Tenancy.lDiversity(spark, dir)) === Set(
      Seq(2, 2L, 1L, 2L, 0.6),
      Seq(3, 2L, 1L, 2L, 0.6),   // l=3 class meets l_req=3 exactly
      Seq(5, 2L, 2L, 5L, 0.0)))
  }

  test("t_closeness: hand total-variation distances across the t grid; " +
      "the l-diverse class still violates tight t") {
    import spark.implicits._
    val dir = fixtureDir(evs = Seq(ev(1, 10, 1, "click")))
    // class (0,b0): {A:2} -> d = |2*5-3*2|+|0-1*2|+|0-1*2| / (2*2*5) = 0.4
    // class (1,b0): {A,B,C} -> (|5-9|+|5-3|+|5-3|) / (2*3*5) = 4/15 ~ 0.267
    // NOTE: the second class passes l=3 diversity yet violates t <= 0.2 —
    // exactly the skewness gap t-closeness exists to close
    Seq((1L, 0L, "A", 100.0), (2L, 0L, "A", 200.0),
      (3L, 1L, "A", 100.0), (4L, 1L, "B", 200.0), (5L, 1L, "C", 300.0))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .write.parquet(s"$dir/customer.parquet")
    assert(rows(Tenancy.tCloseness(spark, dir)) === Set(
      Seq(0.1, 2L, 2L, 5L, 0.0),
      Seq(0.2, 2L, 2L, 5L, 0.0),
      Seq(0.3, 2L, 1L, 2L, 0.6))) // 0.267 <= 0.3: the mixed class passes
  }
}
