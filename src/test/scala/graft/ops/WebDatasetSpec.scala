package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

class WebDatasetSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"wds_$tag").toString

  private def sample(n: Int): Seq[(String, Array[Byte], Array[Byte])] =
    (0 until n).map { i =>
      (f"$i%06d",
        s"text payload $i".getBytes(UTF_8),
        s"""{"id":$i}""".getBytes(UTF_8))
    }

  private def readAll(dir: String): Seq[(String, Seq[(String, Array[Byte])])] =
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tar"))
      .sortBy(_.getName).toSeq.map { f =>
        val in = Files.newInputStream(f.toPath)
        try f.getName -> WebDataset.readMembers(in).toVector
        finally in.close()
      }

  test("shards round-trip byte-identically through the tar codec") {
    val dir = tmpDir("rt")
    val df = sample(7).toDF("key", "txt", "json").coalesce(1)
    val manifest = WebDataset.writeShards(df, "key",
      Seq("txt" -> "txt", "json" -> "json"), dir, samplesPerShard = 100)
    assert(manifest.count() == 1)
    val members = readAll(dir).flatMap(_._2)
    // one sample = two consecutive members in the declared ext order
    assert(members.map(_._1) == sample(7).flatMap(s =>
      Seq(s"${s._1}.txt", s"${s._1}.json")))
    sample(7).foreach { case (k, txt, json) =>
      assert(members.find(_._1 == s"$k.txt").get._2.sameElements(txt))
      assert(members.find(_._1 == s"$k.json").get._2.sameElements(json))
    }
  }

  test("samplesPerShard rolls shards; manifest counts bytes and samples") {
    val dir = tmpDir("roll")
    val df = sample(5).toDF("key", "txt", "json").coalesce(1)
    val manifest = WebDataset.writeShards(df, "key",
      Seq("txt" -> "txt", "json" -> "json"), dir, samplesPerShard = 2)
      .collect().sortBy(_.getString(0))
    assert(manifest.map(_.getLong(1)).toSeq == Seq(2L, 2L, 1L))
    manifest.foreach { r =>
      val onDisk = Files.size(Paths.get(new java.net.URI(
        "file://" + r.getString(0).stripPrefix("file:"))))
      assert(onDisk == r.getLong(2),
        s"manifest n_bytes ${r.getLong(2)} != file size $onDisk")
    }
    // samples never straddle shards: each shard holds whole pairs
    readAll(dir).foreach { case (_, ms) =>
      assert(ms.length % 2 == 0 || ms.map(_._1).distinct.length == ms.length)
      ms.grouped(2).foreach { pair =>
        if (pair.length == 2)
          assert(pair(0)._1.stripSuffix(".txt") ==
            pair(1)._1.stripSuffix(".json"))
      }
    }
  }

  test("equal inputs export byte-identical shards (pinned metadata)") {
    val d1 = tmpDir("det1"); val d2 = tmpDir("det2")
    val df = sample(6).toDF("key", "txt", "json").coalesce(2)
    WebDataset.writeShards(df, "key", Seq("txt" -> "txt", "json" -> "json"),
      d1, samplesPerShard = 4)
    WebDataset.writeShards(df, "key", Seq("txt" -> "txt", "json" -> "json"),
      d2, samplesPerShard = 4)
    val f1 = new java.io.File(d1).listFiles().sortBy(_.getName)
    val f2 = new java.io.File(d2).listFiles().sortBy(_.getName)
    assert(f1.map(_.getName).sameElements(f2.map(_.getName)))
    f1.zip(f2).foreach { case (a, b) =>
      assert(Files.readAllBytes(a.toPath)
        .sameElements(Files.readAllBytes(b.toPath)),
        s"${a.getName} differs between identical exports")
    }
  }

  test("tar members parse with a standard system reader") {
    // the ustar framing must be consumable by any independent reader —
    // java.util.zip has no tar, so cross-check against `tar -tf` when
    // the binary exists (skip silently in minimal containers)
    val dir = tmpDir("sys")
    val df = sample(3).toDF("key", "txt", "json").coalesce(1)
    WebDataset.writeShards(df, "key", Seq("txt" -> "txt", "json" -> "json"),
      dir, samplesPerShard = 100)
    val shard = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).head
    val tarBin = Seq("/usr/bin/tar", "/bin/tar").find(p =>
      new java.io.File(p).canExecute)
    tarBin.foreach { tar =>
      val proc = new ProcessBuilder(tar, "-tf", shard.getAbsolutePath)
        .redirectErrorStream(true).start()
      val listed = scala.io.Source.fromInputStream(proc.getInputStream)
        .getLines().toVector
      assert(proc.waitFor() == 0, s"tar -tf failed: $listed")
      assert(listed == sample(3).flatMap(s =>
        Seq(s"${s._1}.txt", s"${s._1}.json")).toVector, listed)
      // and the payload bytes survive a real extraction
      val xdir = tmpDir("sysx")
      val xproc = new ProcessBuilder(tar, "-xf", shard.getAbsolutePath,
        "-C", xdir).redirectErrorStream(true).start()
      assert(xproc.waitFor() == 0, "tar -xf failed")
      sample(3).foreach { case (k, txt, json) =>
        assert(Files.readAllBytes(Paths.get(xdir, s"$k.txt"))
          .sameElements(txt), s"$k.txt bytes differ after GNU tar extract")
        assert(Files.readAllBytes(Paths.get(xdir, s"$k.json"))
          .sameElements(json), s"$k.json bytes differ after GNU tar extract")
      }
    }
  }

  test("corrupted header checksum is detected, not silently decoded") {
    val dir = tmpDir("bad")
    val df = sample(1).toDF("key", "txt", "json").coalesce(1)
    WebDataset.writeShards(df, "key", Seq("txt" -> "txt", "json" -> "json"),
      dir, samplesPerShard = 10)
    val shard = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).head
    val bytes = Files.readAllBytes(shard.toPath)
    bytes(0) = (bytes(0) ^ 0x7f).toByte // flip a name byte, checksum stale
    val in = new java.io.ByteArrayInputStream(bytes)
    intercept[IllegalArgumentException] {
      WebDataset.readMembers(in).toVector
    }
  }

  test("property: arbitrary members round-trip through the tar codec") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val member = for {
      name <- Gen.chooseNum(1, 90).flatMap(n =>
        Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
      size <- Gen.frequency(3 -> Gen.chooseNum(0, 64),
        2 -> Gen.chooseNum(65, 600), 1 -> Gen.oneOf(511, 512, 513, 1024))
      data <- Gen.listOfN(size, Gen.chooseNum(-128, 127).map(_.toByte))
    } yield (name, data.toArray)
    val prop = Prop.forAll(Gen.chooseNum(0, 8).flatMap(Gen.listOfN(_, member))) {
      ms =>
        val bos = new java.io.ByteArrayOutputStream()
        ms.foreach { case (n, d) => WebDataset.writeMember(bos, n, d) }
        WebDataset.writeTrailer(bos)
        val back = WebDataset.readMembers(
          new java.io.ByteArrayInputStream(bos.toByteArray)).toVector
        back.length == ms.length && back.zip(ms).forall {
          case ((n1, d1), (n2, d2)) => n1 == n2 && d1.sameElements(d2)
        }
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(200).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("null members and oversized names are rejected up front") {
    val dir = tmpDir("reject")
    intercept[Exception] {
      WebDataset.writeShards(
        Seq(("k", null: Array[Byte])).toDF("key", "txt").coalesce(1),
        "key", Seq("txt" -> "txt"), dir).collect()
    }
    intercept[Exception] {
      WebDataset.writeShards(
        Seq(("k" * 120, Array[Byte](1))).toDF("key", "txt").coalesce(1),
        "key", Seq("txt" -> "txt"), dir).collect()
    }
  }
}
