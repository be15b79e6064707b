package graft

import graft.operators.CommitLogTableFormat
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** CommitLogTableFormat: snapshot isolation under injected crashes.
  * The pipeline-semantics coverage lives in the bound full suites
  * (EvoPipelineCommitLogSpec / PipedriveZendeskCommitLogSpec); this
  * spec drives the commit protocol's internal steps directly to model
  * a writer dying at each point. */
class CommitLogFormatSpec extends SparkSpec {
  import spark.implicits._

  private def fsRoot(path: String) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def snap(path: String): Set[(Long, String)] =
    CommitLogTableFormat.read(spark, path).get
      .select("k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("upsert commits are versioned and read back merged") {
    val path = tmpDir("cl") + "/t"
    val v1 = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "ver")
    CommitLogTableFormat.upsert(spark, v1, path, Seq("k"), "ver")
    assert(snap(path) == Set((1L, "a"), (2L, "b")))
    val v2 = Seq((2L, "b2", 2L), (3L, "c", 2L)).toDF("k", "v", "ver")
    CommitLogTableFormat.upsert(spark, v2, path, Seq("k"), "ver")
    assert(snap(path) == Set((1L, "a"), (2L, "b2"), (3L, "c")))
    val (f, root) = fsRoot(path)
    assert(CommitLogTableFormat.currentVersion(f, root).contains(2L))
  }

  test("crash after data write, before manifest: readers see old snapshot") {
    val path = tmpDir("cl") + "/t"
    CommitLogTableFormat.fullRefresh(spark,
      Seq((1L, "old")).toDF("k", "v"), path)
    val (f, root) = fsRoot(path)
    // the writer dies here: version-2 data files fully written, no
    // manifest rename
    val orphaned = CommitLogTableFormat.writeDataFiles(spark,
      Seq((1L, "new"), (2L, "new")).toDF("k", "v"), root, 2L)
    assert(orphaned.nonEmpty)
    assert(snap(path) == Set((1L, "old")), "uncommitted data leaked")
    assert(CommitLogTableFormat.currentVersion(f, root).contains(1L))
    // recovery is just re-running the write: a fresh commit (v2 again,
    // new uuid dir) lands atomically
    CommitLogTableFormat.fullRefresh(spark,
      Seq((1L, "new"), (2L, "new")).toDF("k", "v"), path)
    assert(snap(path) == Set((1L, "new"), (2L, "new")))
  }

  test("crash mid-manifest (abandoned tmp) is invisible to readers") {
    val path = tmpDir("cl") + "/t"
    CommitLogTableFormat.fullRefresh(spark,
      Seq((1L, "old")).toDF("k", "v"), path)
    val (f, root) = fsRoot(path)
    // a half-written manifest temp the dying writer never renamed
    val tmp = new Path(new Path(root, "_log"), ".tmp-deadwriter")
    val out = f.create(tmp, false)
    out.write("version=2\ndata/v2-bogus/part-0.parquet\n".getBytes)
    out.close()
    assert(CommitLogTableFormat.currentVersion(f, root).contains(1L))
    assert(snap(path) == Set((1L, "old")))
  }

  test("a lost commit race throws instead of silently dropping") {
    val path = tmpDir("cl") + "/t"
    CommitLogTableFormat.fullRefresh(spark,
      Seq((1L, "a")).toDF("k", "v"), path)
    val (f, root) = fsRoot(path)
    val files = CommitLogTableFormat.writeDataFiles(spark,
      Seq((1L, "b")).toDF("k", "v"), root, 2L)
    CommitLogTableFormat.commitManifest(spark, root, 2L, files)
    // a second writer that also computed version 2 must fail loudly
    intercept[java.io.IOException] {
      CommitLogTableFormat.commitManifest(spark, root, 2L, files)
    }
    assert(snap(path) == Set((1L, "b")))
  }

  test("multi-partition replace is all-or-nothing by construction") {
    val path = tmpDir("cl") + "/t"
    CommitLogTableFormat.fullRefresh(spark,
      Seq((1L, "a", "p1"), (2L, "b", "p2"), (3L, "c", "p3"))
        .toDF("k", "v", "part"), path)
    // replacing p1+p2 is ONE commit: no reader can observe p1 replaced
    // but p2 not (the swap emulation's mixed mid-state cannot exist —
    // visibility is a single manifest rename)
    CommitLogTableFormat.replacePartitions(spark,
      Seq((10L, "x", "p1"), (20L, "y", "p2")).toDF("k", "v", "part"),
      path, "part")
    assert(snap(path) == Set((10L, "x"), (20L, "y"), (3L, "c")))
    val (f, root) = fsRoot(path)
    assert(CommitLogTableFormat.currentVersion(f, root).contains(2L))
  }

  test("vacuum drops unreferenced files, latest snapshot intact") {
    val path = tmpDir("cl") + "/t"
    CommitLogTableFormat.fullRefresh(spark,
      Seq((1L, "a")).toDF("k", "v"), path)
    CommitLogTableFormat.fullRefresh(spark,
      Seq((1L, "b")).toDF("k", "v"), path)
    val (f, root) = fsRoot(path)
    // plus an orphan from a crashed writer
    CommitLogTableFormat.writeDataFiles(spark,
      Seq((9L, "z")).toDF("k", "v"), root, 3L)
    CommitLogTableFormat.vacuum(spark, path)
    assert(snap(path) == Set((1L, "b")))
    val dataDirs = f.listStatus(new Path(root, "data")).toSeq
    assert(dataDirs.size == 1, s"vacuum left ${dataDirs.size} data dirs")
    val manifests = f.listStatus(new Path(root, "_log")).toSeq
      .map(_.getPath.getName).filter(_.endsWith(".json"))
    assert(manifests == Seq("00000000000000000002.json"))
  }

  test("time travel: every committed version reads back until vacuum") {
    val path = tmpDir("cl") + "/t"
    CommitLogTableFormat.fullRefresh(spark,
      Seq((1L, "a")).toDF("k", "v"), path)
    CommitLogTableFormat.fullRefresh(spark,
      Seq((1L, "a2")).toDF("k", "v"), path)
    CommitLogTableFormat.fullRefresh(spark,
      Seq((2L, "c")).toDF("k", "v"), path)
    assert(CommitLogTableFormat.versions(spark, path) == Seq(1L, 2L, 3L))
    def at(v: Long) = CommitLogTableFormat.readAt(spark, path, v).get
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSet
    assert(at(1L) == Set((1L, "a")))
    assert(at(2L) == Set((1L, "a2")))
    assert(at(3L) == Set((2L, "c")))
    assert(CommitLogTableFormat.readAt(spark, path, 9L).isEmpty)
    CommitLogTableFormat.vacuum(spark, path)
    // history reclaimed; the current snapshot is unaffected
    assert(CommitLogTableFormat.versions(spark, path) == Seq(3L))
    assert(CommitLogTableFormat.readAt(spark, path, 2L).isEmpty)
    assert(at(3L) == Set((2L, "c")) && snap(path) == Set((2L, "c")))
  }

  test("vacuum retention window: retained versions export, older raise typed") {
    val path = tmpDir("cl") + "/t"
    val out = tmpDir("cl-export")
    for (i <- 1 to 4)
      CommitLogTableFormat.fullRefresh(spark,
        Seq((i.toLong, s"v$i")).toDF("k", "v"), path)
    // keepLast=2: versions 3 and 4 survive, 1 and 2 reclaim
    CommitLogTableFormat.vacuum(spark, path, keepLast = 2)
    assert(CommitLogTableFormat.versions(spark, path) == Seq(3L, 4L))
    // a retained NON-latest version still reads AND exports whole
    assert(CommitLogTableFormat.readAt(spark, path, 3L).get
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((3L, "v3")))
    CommitLogTableFormat.exportSnapshot(spark, path, 3L, s"$out/v3")
    assert(spark.read.parquet(s"$out/v3")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v")))
      .toSet == Set((3L, "v3")))
    // a vacuumed version reads as None and exports with the TYPED
    // error — not a missing-file crash
    assert(CommitLogTableFormat.readAt(spark, path, 2L).isEmpty)
    intercept[graft.operators.SnapshotNotFoundException] {
      CommitLogTableFormat.exportSnapshot(spark, path, 2L, s"$out/v2")
    }
    // a second vacuum at keepLast=1 narrows the window further
    CommitLogTableFormat.vacuum(spark, path)
    assert(CommitLogTableFormat.versions(spark, path) == Seq(4L))
    intercept[graft.operators.SnapshotNotFoundException] {
      CommitLogTableFormat.exportSnapshot(spark, path, 3L, s"$out/v3b")
    }
    assert(snap(path) == Set((4L, "v4")))
  }

  test("two concurrent upserts both land (optimistic retry)") {
    // Both writers start from the same base version; the loser of the
    // commit race must re-read the winner's snapshot, recompute its
    // merge, and commit on top — neither writer's rows may be lost,
    // and the versions must serialize as base+1, base+2.
    val path = tmpDir("cl") + "/t"
    CommitLogTableFormat.upsert(spark,
      Seq((1L, "base", 1L)).toDF("k", "v", "ver"), path, Seq("k"), "ver")
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val futures = Seq(
        Seq((2L, "fromA", 2L)).toDF("k", "v", "ver"),
        Seq((3L, "fromB", 2L)).toDF("k", "v", "ver")).map { src =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            barrier.await() // maximize the race window
            CommitLogTableFormat.upsert(spark, src, path, Seq("k"), "ver")
          }
        })
      }
      futures.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    assert(snap(path) == Set((1L, "base"), (2L, "fromA"), (3L, "fromB")),
      "a concurrent upsert was lost")
    // linearizable history: each committed version is a superset of
    // the previous one's keys (upserts only add here)
    val vs = CommitLogTableFormat.versions(spark, path)
    assert(vs == Seq(1L, 2L, 3L), s"versions not serialized: $vs")
    val keysAt = vs.map(v => CommitLogTableFormat.readAt(spark, path, v)
      .get.select("k").collect().map(_.getLong(0)).toSet)
    keysAt.sliding(2).foreach { case Seq(prev, next) =>
      assert(prev.subsetOf(next), s"snapshot went backwards: $keysAt")
    }
  }

  test("a deterministic lost race retries against the winner's snapshot") {
    // Interleave by hand through the private protocol: writer A and B
    // both observe v1; B commits v2 first; A's commit of v2 conflicts.
    val path = tmpDir("cl") + "/t"
    val (f, root) = fsRoot(path)
    CommitLogTableFormat.fullRefresh(spark,
      Seq((1L, "base")).toDF("k", "v"), path)
    val filesB = CommitLogTableFormat.writeDataFiles(spark,
      Seq((1L, "base"), (2L, "fromB")).toDF("k", "v"), root, 2L)
    val filesA = CommitLogTableFormat.writeDataFiles(spark,
      Seq((1L, "base"), (3L, "fromA")).toDF("k", "v"), root, 2L)
    CommitLogTableFormat.commitManifest(spark, root, 2L, filesB)
    intercept[graft.operators.CommitConflictException] {
      CommitLogTableFormat.commitManifest(spark, root, 2L, filesA)
    }
    // A's retry: re-read v2, recompute, commit v3 — the public upsert
    // path does exactly this loop internally
    CommitLogTableFormat.upsert(spark,
      Seq((3L, "fromA", 2L)).toDF("k", "v", "ver"), path, Seq("k"), "ver")
    assert(snap(path) == Set((1L, "base"), (2L, "fromB"), (3L, "fromA")))
    assert(CommitLogTableFormat.currentVersion(f, root).contains(3L))
  }

  test("vacuum ignores stray non-numeric json in _log") {
    val path = tmpDir("cl") + "/t"
    CommitLogTableFormat.fullRefresh(spark,
      Seq((1L, "a")).toDF("k", "v"), path)
    CommitLogTableFormat.fullRefresh(spark,
      Seq((1L, "b")).toDF("k", "v"), path)
    val (f, root) = fsRoot(path)
    val stray = new Path(new Path(root, "_log"), "notes.json")
    val out = f.create(stray, false)
    out.write("not a manifest".getBytes)
    out.close()
    CommitLogTableFormat.vacuum(spark, path) // must not throw
    assert(snap(path) == Set((1L, "b")))
    assert(f.exists(stray), "vacuum deleted a file it does not own")
  }

  test("exportSnapshot: plain parquet readable externally, per version") {
    val path = tmpDir("cl") + "/t"
    CommitLogTableFormat.upsert(spark,
      Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "ver"),
      path, Seq("k"), "ver")
    CommitLogTableFormat.upsert(spark,
      Seq((2L, "b2", 2L), (3L, "c", 2L)).toDF("k", "v", "ver"),
      path, Seq("k"), "ver")
    val out = tmpDir("cl-export")
    CommitLogTableFormat.exportSnapshot(spark, path, 1L, s"$out/v1")
    CommitLogTableFormat.exportSnapshot(spark, path, 2L, s"$out/v2")
    def plain(dir: String) = spark.read.parquet(dir)
      .select("k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(plain(s"$out/v1") == Set((1L, "a"), (2L, "b")))
    assert(plain(s"$out/v2") == Set((1L, "a"), (2L, "b2"), (3L, "c")))
    // the exported tree is manifest-free plain parquet: no _log dir
    val (f, _) = fsRoot(out)
    assert(!f.exists(new Path(s"$out/v1/_log")))
    intercept[graft.operators.SnapshotNotFoundException] {
      CommitLogTableFormat.exportSnapshot(spark, path, 9L, s"$out/v9")
    }
  }

  test("empty snapshot commits keep the schema readable") {
    val path = tmpDir("cl") + "/t"
    val empty = Seq((1L, "a")).toDF("k", "v").filter(col("k") < 0)
    CommitLogTableFormat.fullRefresh(spark, empty, path)
    val back = CommitLogTableFormat.read(spark, path).get
    assert(back.columns.toSeq == Seq("k", "v"))
    assert(back.count() == 0)
  }

  test("schema evolution: upsert and insertIgnore widen; narrow batches preserve") {
    import spark.implicits._
    val path = tmpDir("cl-evolve") + "/t"
    CommitLogTableFormat.upsert(spark,
      Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "ver"),
      path, Seq("k"), "ver")
    // upsert carrying a NEW column w and MISSING v: table widens,
    // the narrow batch preserves v for its key instead of nulling it
    CommitLogTableFormat.upsert(spark,
      Seq((2L, 2L, 9.5)).toDF("k", "ver", "w"), path, Seq("k"), "ver")
    val afterUpsert = CommitLogTableFormat.read(spark, path).get
    assert(afterUpsert.columns.toSet === Set("k", "v", "ver", "w"))
    val rows = afterUpsert.collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("v"),
        Option(r.getAs[Any]("w")))).toSet
    assert(rows === Set((1L, "a", None), (2L, "b", Some(9.5))))

    // insertIgnore: another new column, narrow source (no v, no w);
    // existing key 2 stays untouched, new key 3 inserts with NULLs
    CommitLogTableFormat.insertIgnore(spark,
      Seq((3L, 3L, true), (2L, 3L, true)).toDF("k", "ver", "flag"),
      path, Seq("k"))
    val got = CommitLogTableFormat.read(spark, path).get
    assert(got.columns.toSet === Set("k", "v", "ver", "w", "flag"))
    val all = got.collect().map(r => (r.getAs[Long]("k"),
      r.getAs[String]("v"), Option(r.getAs[Any]("w")),
      Option(r.getAs[Any]("flag")))).toSet
    assert(all === Set(
      (1L, "a", None, None),
      (2L, "b", Some(9.5), None), // existing key: insertIgnore no-op
      (3L, null, None, Some(true))))
  }

  test("applyCdc: inserts, updates, deletes, stale ops, in-changeset order") {
    import spark.implicits._
    val path = tmpDir("cl-cdc") + "/t"
    CommitLogTableFormat.fullRefresh(spark,
      Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L), (4L, "d", 1L))
        .toDF("k", "v", "ver"), path)
    val changes = Seq(
      (1L, "—", "D", 2L),  // delete wins (newer than target)
      (2L, "b2", "U", 2L), // plain update
      (2L, "—", "D", 0L),  // stale delete, loses to the U inside the set
      (3L, "—", "D", 0L),  // stale delete vs target: ignored
      (5L, "e", "I", 2L),  // brand-new key
      (6L, "—", "D", 2L),  // delete of an absent key: no-op
      (7L, "x", "U", 1L),  // delete-then-reinsert: the later op wins
      (7L, "—", "D", 0L)
    ).toDF("k", "v", "op", "ver")
    CommitLogTableFormat.applyCdc(spark, changes, path,
      Seq("k"), "op", "ver")
    val got = CommitLogTableFormat.read(spark, path).get
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got === Set((2L, "b2", 2L), (3L, "c", 1L), (4L, "d", 1L),
      (5L, "e", 2L), (7L, "x", 1L)))
    // replaying the SAME changeset is a no-op (stale-change rule)
    CommitLogTableFormat.applyCdc(spark, changes, path,
      Seq("k"), "op", "ver")
    val again = CommitLogTableFormat.read(spark, path).get
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(again === got)
  }

  test("readAsOf: timestamp time travel resolves the latest version " +
    "committed at or before T; before-genesis is None; ties include") {
    import spark.implicits._
    val path = tmpDir("cl-asof") + "/t"
    def snap(xs: Int*) = xs.toDF("k")
    CommitLogTableFormat.fullRefresh(spark, snap(1), path)
    CommitLogTableFormat.fullRefresh(spark, snap(1, 2), path)
    CommitLogTableFormat.fullRefresh(spark, snap(1, 2, 3), path)
    val hist = CommitLogTableFormat.versionHistory(spark, path)
    assert(hist.map(_._1) == Seq(1L, 2L, 3L))
    assert(hist.map(_._2) == hist.map(_._2).sorted,
      "commit timestamps must be non-decreasing with version")
    def rowsAsOf(ts: Long) =
      CommitLogTableFormat.readAsOf(spark, path, ts).map(_.count())
    val Seq((_, t1), (_, t2), (_, t3)) = hist
    assert(rowsAsOf(t1 - 1).isEmpty, "before genesis → None")
    assert(rowsAsOf(t1) === Some(1L)) // tie includes
    assert(rowsAsOf(t3) === Some(3L))
    assert(rowsAsOf(Long.MaxValue) === Some(3L))
    // a mid-history instant resolves to its floor version (only
    // checkable when the FS clock separates the commits)
    if (t2 > t1) assert(rowsAsOf(t2 - 1) === Some(1L))
    if (t3 > t2) assert(rowsAsOf(t3 - 1) === Some(2L))
  }

  test("versionHistory monotonizes out-of-order manifest mtimes " +
    "(writer clock skew): readAsOf never surfaces a later version " +
    "at an instant before an earlier one") {
    import spark.implicits._
    val path = tmpDir("cl-skew") + "/t"
    def snap(xs: Int*) = xs.toDF("k")
    CommitLogTableFormat.fullRefresh(spark, snap(1), path)
    CommitLogTableFormat.fullRefresh(spark, snap(1, 2), path)
    CommitLogTableFormat.fullRefresh(spark, snap(1, 2, 3), path)
    // simulate a skewed writer with PINNED mtimes: v1 @ T, v2 @ T+10s,
    // v3 @ T-60s (object-store mtime semantics / clock drift). The raw
    // listing would let readAsOf(T) surface v3 — a version that did
    // not exist at T.
    val base = System.currentTimeMillis()
    def pin(v: Long, ts: Long): Unit =
      java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(path, "_log", f"$v%020d.json"),
        java.nio.file.attribute.FileTime.fromMillis(ts))
    pin(1L, base); pin(2L, base + 10000); pin(3L, base - 60000)
    val hist = CommitLogTableFormat.versionHistory(spark, path)
    assert(hist.map(_._1) == Seq(1L, 2L, 3L))
    assert(hist.map(_._2) == Seq(base, base + 10000, base + 10000),
      "running-max monotonization over the raw mtimes")
    // an instant in [T, T+10s) resolves to its true floor v1, not the
    // skewed v3; at T+10s the tie surfaces the LATEST version, v3
    assert(CommitLogTableFormat.readAsOf(spark, path, base)
      .map(_.count()) === Some(1L))
    assert(CommitLogTableFormat.readAsOf(spark, path, base + 10000)
      .map(_.count()) === Some(3L))
    assert(CommitLogTableFormat.readAsOf(spark, path, base - 1).isEmpty)
  }

  test("applyCdc: a NULL op fails fast instead of silently dropping " +
    "the row (r7 advice) and leaves the table unchanged") {
    import spark.implicits._
    val path = tmpDir("cl-cdc-nullop") + "/t"
    CommitLogTableFormat.fullRefresh(spark,
      Seq((1L, "a", 1L)).toDF("k", "v", "ver"), path)
    val bad = Seq((1L, "a2", Some("U"), 2L),
      (2L, "b", Option.empty[String], 2L)).toDF("k", "v", "op", "ver")
    val e = intercept[Exception] {
      CommitLogTableFormat.applyCdc(spark, bad, path, Seq("k"), "op", "ver")
    }
    // raise_error fires executor-side; the driver sees it wrapped —
    // find the message anywhere in the cause chain
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(msgs.contains("NULL 'op'"), msgs)
    val got = CommitLogTableFormat.read(spark, path).get
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got === Set((1L, "a", 1L)), "failed batch must not commit")
  }

  test("diffSnapshots: multiset delta between versions, typed misses") {
    import spark.implicits._
    val path = tmpDir("cl-diff") + "/t"
    CommitLogTableFormat.fullRefresh(spark, Seq(1, 1, 2, 3).toDF("k"), path)
    CommitLogTableFormat.fullRefresh(spark, Seq(1, 2, 2, 4).toDF("k"), path)
    val got = CommitLogTableFormat.diffSnapshots(spark, path, 1L, 2L)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    // v1 {1x2, 2, 3} -> v2 {1, 2x2, 4}: +2 +4, -1 -3 (multiset!)
    assert(got === Map((2, "added") -> 1, (4, "added") -> 1,
      (1, "removed") -> 1, (3, "removed") -> 1))
    intercept[graft.operators.SnapshotNotFoundException] {
      CommitLogTableFormat.diffSnapshots(spark, path, 1L, 99L).count()
    }
  }

  test("changeFeed: per-commit events, not a net diff; genesis boundary") {
    val path = tmpDir("cl") + "/t"
    def refresh(rows: (Long, String)*) = CommitLogTableFormat.fullRefresh(
      spark, rows.toDF("k", "v"), path)
    refresh((1L, "a"), (2L, "b"))            // v1
    refresh((1L, "a"), (2L, "b"), (3L, "c")) // v2: +3
    refresh((1L, "a"), (2L, "b"))            // v3: -3
    def events(from: Long, to: Long) =
      CommitLogTableFormat.changeFeed(spark, path, from, to)
        .select("k", "change", "commit_version").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // row 3 added in v2 and removed in v3: nets to NOTHING in a
    // snapshot diff, but is two events in the feed
    assert(events(1L, 3L) ===
      Set((3L, "added", 2L), (3L, "removed", 3L)))
    assert(CommitLogTableFormat.diffSnapshots(spark, path, 1L, 3L)
      .count() === 0L)
    // genesis: fromVersion 0 surfaces v1 as all-added
    assert(events(0L, 1L) === Set((1L, "added", 1L), (2L, "added", 1L)))
    intercept[IllegalArgumentException] {
      CommitLogTableFormat.changeFeed(spark, path, 2L, 2L)
    }
  }

  test("tailChangeFeed: resumes from checkpoint, replay is a no-op") {
    val path = tmpDir("cl") + "/t"
    val cp = tmpDir("cl-cp") + "/tail.ckpt"
    def refresh(rows: (Long, String)*) = CommitLogTableFormat.fullRefresh(
      spark, rows.toDF("k", "v"), path)
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Set[(Long, String)])]()
    def proc(df: org.apache.spark.sql.DataFrame, v: Long): Unit =
      seen += v -> df.select("k", "change").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    // nothing committed yet: caught up, no checkpoint written
    assert(CommitLogTableFormat.tailChangeFeed(spark, path, cp)(proc) == 0)
    refresh((1L, "a"))            // v1
    refresh((1L, "a"), (2L, "b")) // v2
    assert(CommitLogTableFormat.tailChangeFeed(spark, path, cp)(proc) == 2)
    assert(seen.toSeq === Seq(
      1L -> Set((1L, "added")), 2L -> Set((2L, "added"))))
    // caught up: nothing reprocessed
    assert(CommitLogTableFormat.tailChangeFeed(spark, path, cp)(proc) == 0)
    assert(seen.size == 2)
    // new commit: exactly the delta arrives
    refresh((2L, "b")) // v3: -1
    assert(CommitLogTableFormat.tailChangeFeed(spark, path, cp)(proc) == 1)
    assert(seen.last === 3L -> Set((1L, "removed")))
    // a processor crash BEFORE checkpoint replays that version
    refresh((2L, "b"), (4L, "d")) // v4
    intercept[RuntimeException] {
      CommitLogTableFormat.tailChangeFeed(spark, path, cp) {
        (_, _) => throw new RuntimeException("boom")
      }
    }
    assert(CommitLogTableFormat.tailChangeFeed(spark, path, cp)(proc) == 1)
    assert(seen.last === 4L -> Set((4L, "added")))
  }
}
