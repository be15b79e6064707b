package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WebDataset-style tar sharding — the standard container format for
  * large-scale (multimodal) training corpora: a corpus becomes N tar
  * archives ("shards"), each holding the samples' entries as plain
  * files (`<key>.txt`, `<key>.json`, `<key>.png`, ...) so a training
  * loader streams one shard sequentially per worker. This writer
  * emits strict POSIX ustar (magic `ustar\0`, version `00`, octal
  * size/mtime/checksum fields, 512-byte blocks, two zero end blocks)
  * — GNU tar lists and extracts the output byte-for-byte
  * (spec-proven by shelling out to the real `tar`), and the t84 gate
  * pins the shard assignment + exact on-disk byte arithmetic
  * cross-engine (header + ceil(size/512) data blocks per entry +
  * 1024 end padding).
  *
  * Scale shape: shard = salted-md5 bucket of the sample key mod
  * `nShards` — deterministic and partitioning-independent, the same
  * decision arithmetic as every sampler here. Rows repartition BY
  * SHARD and sort within partitions, so each task streams its
  * shards' entries through one open file at a time — no shard is
  * ever collected to the driver, and memory per task is one entry's
  * bytes. A shard is the unit of sequential I/O (size it by choosing
  * nShards ≈ corpus_bytes / 500 MB, the WebDataset convention).
  */
object TarShards {

  /** Deterministic shard id for a sample key (salted md5 bucket —
    * [[Sample.hashBucket]]'s arithmetic, mirrored by the t84 oracle). */
  def shardOf(id: Column, nShards: Int,
      salt: String = "graft-shard"): Column =
    Sample.hashBucket(id, salt) % nShards

  /** One strict-ustar header block (512 bytes). `name` must fit the
    * classic 100-byte field — training-sample keys do; no GNU
    * long-name extensions are emitted. */
  private[graft] def ustarHeader(name: String, size: Long,
      mtime: Long): Array[Byte] = {
    require(name.getBytes("UTF-8").length <= 100, s"name too long: $name")
    require(size >= 0 && mtime >= 0)
    val h = new Array[Byte](512)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes("US-ASCII")
      System.arraycopy(b, 0, h, off, b.length)
    }
    def octal(off: Int, width: Int, v: Long): Unit =
      // width-1 digits; the field's last byte stays the array's NUL
      put(off, ("%0" + (width - 1) + "o").format(v))
    put(0, name)
    octal(100, 8, 420) // mode 0644
    octal(108, 8, 0) // uid
    octal(116, 8, 0) // gid
    octal(124, 12, size)
    octal(136, 12, mtime)
    put(148, "        ") // checksum field counts as spaces
    h(156) = '0' // typeflag: regular file
    put(257, "ustar") // POSIX magic "ustar" NUL (h(262) stays 0)...
    put(263, "00") // ...then version "00"
    // uname/gname left empty (valid); no devmajor/devminor
    var sum = 0L
    var i = 0
    while (i < 512) { sum += h(i) & 0xff; i += 1 }
    put(148, "%06o".format(sum)) // 6 digits, NUL (stays 0), space
    h(155) = ' '.toByte
    h
  }

  /** Entry bytes: header + data padded to the 512 boundary. */
  private def entryBytes(name: String, data: Array[Byte],
      mtime: Long): Array[Byte] = {
    val pad = (512 - data.length % 512) % 512
    val out = new Array[Byte](512 + data.length + pad)
    System.arraycopy(ustarHeader(name, data.length.toLong, mtime), 0, out, 0, 512)
    System.arraycopy(data, 0, out, 512, data.length)
    out
  }

  /** The exact byte size [[write]] produces for a shard holding
    * entries of the given data sizes — the arithmetic the t84 oracle
    * rederives: 512-byte header + ceil(size/512) data blocks per
    * entry, plus the two zero end blocks. */
  def shardBytes(entrySizes: Seq[Long]): Long =
    entrySizes.map(s => 512L + ((s + 511) / 512) * 512).sum + 1024L

  /** Read tar shards back into (shard, name, data) rows — the
    * training-loader side of [[write]], and a reader for ANY
    * ustar-conformant archive (GNU tar output included): whole shard
    * files load through Spark's binaryFile source (a shard is the
    * sequential-I/O unit, so whole-file is the right granularity),
    * and each task walks the 512-byte headers — name, octal size,
    * checksum VERIFIED (a flipped byte fails loudly rather than
    * yielding garbage entries), data + padding skipped, stop at the
    * zero end block. Non-regular-file entries (directories, links,
    * PAX headers) are skipped, not errors. */
  def read(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$dir/shard-*.tar")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val shard = "shard-(\\d+)\\.tar$".r.findFirstMatchIn(path)
          .map(_.group(1).toInt).getOrElse(-1)
        parseUstar(bytes, path).map { case (name, data) =>
          (shard, name, data)
        }
      }
      .toDF("shard", "name", "data")
  }

  /** Walk one ustar archive; returns (name, data) for regular-file
    * entries. Package-visible for specs. */
  private[graft] def parseUstar(bytes: Array[Byte],
      label: String): Iterator[(String, Array[Byte])] = {
    val out = Iterator.unfold(0) { off =>
      if (off + 512 > bytes.length) None
      else if (bytes(off) == 0) None // zero end block
      else {
        def str(o: Int, len: Int): String = {
          var end = o
          while (end < o + len && bytes(end) != 0) end += 1
          new String(bytes, o, end - o, "UTF-8")
        }
        def octal(o: Int, len: Int): Long = {
          val s = str(o, len).trim
          if (s.isEmpty) 0L else java.lang.Long.parseLong(s, 8)
        }
        var sum = 0L
        var i = 0
        while (i < 512) {
          sum += (if (i >= 148 && i < 156) ' '.toLong
            else bytes(off + i) & 0xff)
          i += 1
        }
        require(octal(off + 148, 8) == sum,
          s"ustar checksum mismatch at offset $off in $label")
        val name = str(off, 100)
        val size = octal(off + 124, 12)
        val typ = bytes(off + 156)
        val dataEnd = off + 512 + size.toInt
        require(dataEnd <= bytes.length,
          s"truncated entry '$name' in $label")
        val next = off + 512 + (((size + 511) / 512) * 512).toInt
        val entry =
          if (typ == '0' || typ == 0)
            Some((name,
              java.util.Arrays.copyOfRange(bytes, off + 512, dataEnd)))
          else None // dirs/links/PAX metadata: skip
        Some((entry, next))
      }
    }
    out.flatten
  }

  /** Write `entries` — (name, payload) rows keyed by `idCol` for
    * shard assignment — as `shard-NNNNN.tar` files under `dir`.
    * Columns: idCol (numeric key), `name` (string, the in-archive
    * file name), `data` (binary). Entries repartition by shard and
    * sort by (shard, name) so every archive's content — and its
    * bytes — is a pure function of the input set; `mtime` is pinned
    * (default 0) for the same reason. Returns one row per shard:
    * (shard, n_entries, n_bytes), computed from what was actually
    * written. */
  def write(entries: DataFrame, idCol: String, dir: String,
      nShards: Int, salt: String = "graft-shard",
      mtime: Long = 0L): DataFrame = {
    require(nShards > 0)
    val spark = entries.sparkSession
    import spark.implicits._
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // job-level overwrite happens HERE, once, on the driver: prior
    // shards and stray tmps are cleared so the task-level commit can
    // be a pure rename (see close()) — without this, a stale shard
    // from an earlier job would survive a refused rename silently
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val dfs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (dfs.exists(dirPath))
      dfs.listStatus(dirPath).foreach { st =>
        val nm = st.getPath.getName
        if (nm.startsWith("shard-") && nm.contains(".tar"))
          dfs.delete(st.getPath, false)
      }
    val withShard = entries
      .withColumn("__shard", shardOf(col(idCol), nShards, salt).cast("int"))
      .select(col("__shard"), col("name"), col("data"))
      .repartition(nShards, col("__shard"))
      .sortWithinPartitions(col("__shard"), col("name"))
    // write-to-temp + rename commit: a speculative or zombie task
    // attempt racing a retry must never interleave bytes into the
    // final shard file. Attempts write an attempt-scoped .tmp and
    // rename on completion — both attempts produce IDENTICAL bytes
    // (the input sort makes shard content deterministic), so
    // whichever rename lands last leaves a complete, correct file.
    val written = withShard
      .as[(Int, String, Array[Byte])]
      .mapPartitions { it =>
        val ctx = org.apache.spark.TaskContext.get()
        val attempt =
          if (ctx == null) "local" else ctx.taskAttemptId().toString
        val done = scala.collection.mutable.ArrayBuffer
          .empty[(Int, Long, Long)]
        var cur = -1
        var out: java.io.OutputStream = null
        var n = 0L
        var bytes = 0L
        def finalPath(shard: Int) =
          new org.apache.hadoop.fs.Path(dir, f"shard-$shard%05d.tar")
        def tmpPath(shard: Int) = new org.apache.hadoop.fs.Path(
          dir, f"shard-$shard%05d.tar.$attempt.tmp")
        def close(): Unit = if (out != null) {
          out.write(new Array[Byte](1024)) // two zero end blocks
          out.close()
          val fs = finalPath(cur).getFileSystem(hconf.value)
          // commit = ONE rename, never delete-then-rename: a zombie
          // attempt that deleted the winner's file and died before its
          // own rename would lose the shard AFTER the job reported
          // success. Attempts produce identical bytes, so if the
          // rename fails because another attempt already committed
          // (HDFS rename-refuses-existing), OUR tmp is simply
          // discarded; on local/POSIX filesystems rename atomically
          // replaces the identical file, which is equally correct.
          if (!fs.rename(tmpPath(cur), finalPath(cur))) {
            require(fs.exists(finalPath(cur)),
              s"commit rename failed for shard $cur with no winner")
            fs.delete(tmpPath(cur), false)
          }
          done += ((cur, n, bytes + 1024L))
          out = null
        }
        it.foreach { case (shard, name, data) =>
          if (shard != cur) {
            close()
            cur = shard
            n = 0L
            bytes = 0L
            val p = tmpPath(shard)
            out = p.getFileSystem(hconf.value).create(p, true)
          }
          val e = entryBytes(name, data, mtime)
          out.write(e)
          n += 1
          bytes += e.length
        }
        close()
        done.iterator
      }
      .collect() // bounded: one row per shard
    spark.createDataset(written.toSeq)
      .toDF("shard", "n_entries", "n_bytes")
  }
}
