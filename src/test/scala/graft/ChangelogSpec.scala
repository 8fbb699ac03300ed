package graft

import graft.operators.Changelog

class ChangelogSpec extends SparkSpec {
  import spark.implicits._

  test("merge: latest seq wins, D removes, I adds, untouched passes through") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (2L, "b1", "U", 1L),
      (2L, "b2", "U", 2L), // later seq wins
      (3L, "-", "D", 1L),  // delete
      (4L, "d", "I", 1L)   // insert
    ).toDF("k", "v", "op", "seq")
    val out = rows(Changelog.merge(base, changes, "k").orderBy("k"))
      .map(r => (r.getLong(0), r.getString(1)))
    out shouldBe Seq((1L, "a"), (2L, "b2"), (4L, "d"))
  }

  test("merge: a delete overridden by a later insert resurrects the key") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq(
      (1L, "-", "D", 1L),
      (1L, "a2", "I", 2L) // re-insert after delete: latest wins
    ).toDF("k", "v", "op", "seq")
    rows(Changelog.merge(base, changes, "k")).map(r => (r.getLong(0), r.getString(1))) shouldBe
      Seq((1L, "a2"))
  }

  test("merge: an update that sets a value to null wins (null is not skipped)") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq((1L, Option.empty[String], "U", 1L)).toDF("k", "v", "op", "seq")
    rows(Changelog.merge(base, changes, "k")).map(r => (r.getLong(0), Option(r.getString(1)))) shouldBe
      Seq((1L, None))
  }

  test("scd2: versions chain [seq, next-seq), D closes without opening, open end is current") {
    val changes = Seq(
      (1L, "v1", "I", 1L), // [1,3) — closed by the seq-3 update
      (1L, "v2", "U", 3L), // [3,5) — closed by the delete
      (1L, "-", "D", 5L),  // closes v2, opens nothing
      (2L, "w1", "I", 2L)  // [2,∞) current
    ).toDF("k", "v", "op", "seq")
    val out = rows(Changelog.scd2(changes, "k").orderBy("k", "valid_from"))
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), Option(r.get(3)), r.getBoolean(4)))
    out shouldBe Seq(
      (1L, "v1", 1L, Some(3L), false),
      (1L, "v2", 3L, Some(5L), false),
      (2L, "w1", 2L, None, true))
  }

  test("streaming replay: ordered tier batches fold to the one-shot merge result") {
    // cross-batch per-key ordering is the point: key 1 is deleted in tier 0
    // and re-inserted in tier 1 — unordered replay would lose the resurrect
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val tier0 = Seq((1L, "-", "D", 1L), (2L, "b1", "U", 1L)).toDF("k", "v", "op", "seq")
    val tier1 = Seq((1L, "a2", "I", 2L)).toDF("k", "v", "op", "seq")
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_spec").toFile
    try {
      graft.streaming.Streaming.landOrdered(dir, Seq(tier0, tier1))
      val out = rows(graft.streaming.Streaming.cdcApply(spark, dir.toString, base, "k")
        .orderBy("k")).map(r => (r.getLong(0), r.getString(1)))
      out shouldBe Seq((1L, "a2"), (2L, "b1"), (3L, "c"))
      // and it equals the one-shot batch merge of the union
      val oneShot = rows(Changelog.merge(base, tier0.unionByName(tier1), "k").orderBy("k"))
        .map(r => (r.getLong(0), r.getString(1)))
      out shouldBe oneShot
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("diff: classifies added/removed/updated, omits unchanged, null-safe values") {
    val before = Seq((1L, Option("a")), (2L, Option("b")), (3L, Option("c")),
      (4L, Option.empty[String])).toDF("k", "v")
    val after = Seq((1L, Option("a")), // unchanged — omitted
      (2L, Option("b2")),              // updated
      (4L, Option("d")),               // null -> value: updated (null-safe)
      (5L, Option("e"))                // added
    ).toDF("k", "v")                   // 3 removed
    val out = rows(Changelog.diff(before, after, "k").orderBy("k"))
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)), Option(r.getString(3))))
    out shouldBe Seq(
      (2L, "updated", Some("b"), Some("b2")),
      (3L, "removed", Some("c"), None),
      (4L, "updated", None, Some("d")),
      (5L, "added", None, Some("e")))
  }

  test("property: merge equals scd2's current versions plus untouched base keys") {
    // random changelogs over a small key space: the snapshot a merge
    // produces must equal {current scd2 versions} ∪ {base keys never changed}
    val rnd = new scala.util.Random(11)
    (1 to 3).foreach { round =>
      val base = (1L to 20L).map(k => (k, s"b$k")).toDF("k", "v")
      val changes = (1 to 40).map { i =>
        val k = rnd.nextInt(25).toLong + 1 // keys 21-25 are insert-only
        val op = rnd.nextInt(3) match {
          case 0 => "I"; case 1 => "U"; case 2 => "D"
        }
        (k, s"c$i", op, i.toLong) // seq = i: unique, monotone
      }.toDF("k", "v", "op", "seq")
      val merged = rows(Changelog.merge(base, changes, "k").orderBy("k"))
        .map(r => (r.getLong(0), r.getString(1)))
      val current = rows(Changelog.scd2(changes, "k").filter($"is_current").orderBy("k"))
        .map(r => (r.getLong(0), r.getString(1)))
      val changedKeys = current.map(_._1).toSet ++
        rows(changes.select("k").distinct()).map(_.getLong(0)).toSet
      val untouched = (1L to 20L).filterNot(changedKeys).map(k => (k, s"b$k"))
      merged shouldBe (current ++ untouched).sortBy(_._1)
    }
  }

  test("property: merge agrees with a scalar reference fold over random changelogs") {
    val rnd = new scala.util.Random(23)
    (1 to 3).foreach { _ =>
      val base = (1L to 15L).map(k => (k, s"b$k"))
      val changes = (1 to 30).map { i =>
        (rnd.nextInt(20).toLong + 1, s"c$i",
          Seq("I", "U", "D")(rnd.nextInt(3)), i.toLong)
      }
      // reference model: latest change per key wins over the base value
      val latest = changes.groupBy(_._1).view.mapValues(_.maxBy(_._4)).toMap
      val expected = (base.map(_._1) ++ changes.map(_._1)).distinct.sorted.flatMap { k =>
        latest.get(k) match {
          case Some((_, v, op, _)) => if (op == "D") None else Some((k, v))
          case None => base.find(_._1 == k).map(b => (k, b._2))
        }
      }
      val got = rows(Changelog.merge(base.toDF("k", "v"),
          changes.toDF("k", "v", "op", "seq"), "k").orderBy("k"))
        .map(r => (r.getLong(0), r.getString(1)))
      got shouldBe expected
    }
  }

  test("merge with empty changes is identity") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val changes = Seq.empty[(Long, String, String, Long)].toDF("k", "v", "op", "seq")
    rows(Changelog.merge(base, changes, "k").orderBy("k")).map(_.getLong(0)) shouldBe Seq(1L, 2L)
  }
}
