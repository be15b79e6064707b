package graft

import graft.operators.{Sample, TarShards}
import org.apache.spark.sql.functions._

/** WebDataset-style tar sharding: strict-ustar conformance proven
  * against the REAL GNU tar binary, byte arithmetic, determinism. */
class TarShardsSpec extends SparkSpec {
  import spark.implicits._

  private def run(cmd: String*): String = {
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    assert(p.waitFor() == 0, s"${cmd.mkString(" ")} failed:\n$out")
    out
  }

  test("write: GNU tar lists and extracts our shards byte-for-byte") {
    // payload sizes probe the 512-block boundaries: empty, sub-block,
    // exactly one block, one-over
    val payloads = Map(
      1L -> "a" * 10, 2L -> "", 3L -> "b" * 512, 4L -> "c" * 513,
      5L -> "hello shard world", 6L -> "d" * 100, 7L -> "e" * 1024)
    val entries = payloads.toSeq.flatMap { case (id, text) =>
      Seq((id, f"$id%08d.txt", text.getBytes("UTF-8")),
        (id, f"$id%08d.json", s"""{"id":$id}""".getBytes("UTF-8")))
    }.toDF("doc_id", "name", "data")
    val dir = tmpDir("tar-shards")
    val stats = TarShards.write(entries, "doc_id", dir, nShards = 2)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap

    // expected shard of each id via the same public arithmetic
    val shardOf = payloads.keys.toSeq.toDF("doc_id")
      .select(col("doc_id"), TarShards.shardOf(col("doc_id"), 2).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(shardOf.values.toSet == Set(0, 1), "want both shards hit")

    for (s <- Seq(0, 1)) {
      val f = s"$dir/shard-0000$s.tar"
      // 1) REAL tar lists exactly the expected names, sorted
      val listed = run("tar", "-tf", f).split("\n").filter(_.nonEmpty).toSeq
      val expected = payloads.keys.toSeq.filter(shardOf(_) == s)
        .flatMap(id => Seq(f"$id%08d.json", f"$id%08d.txt")).sorted
      assert(listed == expected, s"shard $s listing")
      assert(stats(s)._1 == expected.size.toLong)

      // 2) REAL tar extracts payloads byte-for-byte
      for (id <- payloads.keys if shardOf(id) == s) {
        assert(run("tar", "-xOf", f, f"$id%08d.txt") == payloads(id))
        assert(run("tar", "-xOf", f, f"$id%08d.json") == s"""{"id":$id}""")
      }

      // 3) on-disk size == the stats row == the documented arithmetic
      val onDisk = new java.io.File(f).length()
      val sizes = payloads.toSeq.filter(p => shardOf(p._1) == s)
        .flatMap { case (id, t) => Seq(t.getBytes("UTF-8").length.toLong,
          s"""{"id":$id}""".getBytes("UTF-8").length.toLong) }
      assert(onDisk == stats(s)._2 && onDisk == TarShards.shardBytes(sizes))
    }

    // 4) deterministic: a second write round-trips byte-identical
    val dir2 = tmpDir("tar-shards-2")
    TarShards.write(entries.repartition(5), "doc_id", dir2, nShards = 2)
      .collect()
    for (s <- Seq(0, 1)) {
      val a = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/shard-0000$s.tar"))
      val b = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir2/shard-0000$s.tar"))
      assert(java.util.Arrays.equals(a, b), s"shard $s not deterministic")
    }
  }

  test("read: distributed round trip, GNU-tar input, corruption fails loudly") {
    val payloads = (1L to 6L).map(id => id -> s"payload-$id-${"x" * id.toInt * 100}").toMap
    val entries = payloads.toSeq.map { case (id, t) =>
      (id, f"$id%08d.txt", t.getBytes("UTF-8"))
    }.toDF("doc_id", "name", "data")
    val dir = tmpDir("tar-read")
    TarShards.write(entries, "doc_id", dir, nShards = 2)

    // our reader returns exactly what went in, with the shard id
    val back = TarShards.read(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1),
        new String(r.getAs[Array[Byte]](2), "UTF-8")))
    assert(back.length == 6)
    back.foreach { case (shard, name, text) =>
      val id = name.stripSuffix(".txt").toLong
      assert(text == payloads(id))
      assert(shard >= 0 && shard < 2)
    }

    // the reader accepts archives GNU TAR wrote, not just ours
    val gdir = tmpDir("tar-gnu")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$gdir/a.txt"), "written by gnu tar")
    run("tar", "--format=ustar", "-cf", s"$gdir/shard-00000.tar",
      "-C", gdir, "a.txt")
    val fromGnu = TarShards.read(spark, gdir).collect()
    assert(fromGnu.length == 1 &&
      new String(fromGnu.head.getAs[Array[Byte]]("data"), "UTF-8")
        == "written by gnu tar")

    // a flipped byte in a header fails the checksum loudly
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    bytes(0) = (bytes(0) ^ 0x01).toByte
    val cdir = tmpDir("tar-corrupt")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$cdir/shard-00000.tar"), bytes)
    intercept[org.apache.spark.SparkException] {
      TarShards.read(spark, cdir).collect()
    }
  }

  test("ustarHeader: checksum self-validates, fields octal") {
    val h = TarShards.ustarHeader("x.txt", 1234L, 0L)
    assert(h.length == 512)
    // magic at 257: "ustar" NUL "00"
    assert(new String(h, 257, 5, "US-ASCII") == "ustar" && h(262) == 0)
    assert(new String(h, 263, 2, "US-ASCII") == "00")
    // recompute checksum with the field as spaces
    val copy = h.clone()
    for (i <- 148 until 156) copy(i) = ' '
    val sum = copy.map(_ & 0xff).sum
    val stored = Integer.parseInt(
      new String(h, 148, 6, "US-ASCII"), 8)
    assert(stored == sum)
    // size field parses back
    assert(java.lang.Long.parseLong(
      new String(h, 124, 11, "US-ASCII"), 8) == 1234L)
  }
}
