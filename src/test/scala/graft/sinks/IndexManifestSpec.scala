package graft.sinks

import java.nio.file.Files

import graft.SparkSpec

/** The versioned-manifest commit protocol: newest-parseable-wins reads,
  * create-if-absent CAS commits that MERGE on conflict (the
  * append-vs-compaction window), and retention-based vacuum. */
class IndexManifestSpec extends SparkSpec {

  private def fs = new org.apache.hadoop.fs.Path("/").getFileSystem(
    spark.sessionState.newHadoopConf())

  private def scratch(): String =
    Files.createTempDirectory("graft-manifest-").toString

  test("commitMerge assigns monotonic versions and latest wins") {
    val root = scratch()
    assert(IndexManifest.latest(fs, root).isEmpty)
    val s1 = IndexManifest.commitMerge(fs, root)(_ =>
      IndexSnapshot(0L, Map("t" -> Seq("base")), Seq.empty))
    assert(s1.version == 1L)
    val s2 = IndexManifest.commitMerge(fs, root) { cur =>
      val c = cur.get
      c.copy(tables = Map("t" -> (c.segs("t") :+ "delta_a")),
        applied = c.applied :+ "a")
    }
    assert(s2.version == 2L)
    assert(IndexManifest.latest(fs, root).get ==
      IndexSnapshot(2L, Map("t" -> Seq("base", "delta_a")), Seq("a")))
  }

  test("a lost CAS slot re-runs the merge against the winner: a " +
      "compaction commit carries a concurrently appended segment") {
    val root = scratch()
    IndexManifest.commitMerge(fs, root)(_ =>
      IndexSnapshot(0L, Map("t" -> Seq("base", "delta_a")), Seq("a")))
    // the compactor resolved THIS snapshot and folded base+delta_a...
    val folded = Set("base", "delta_a")
    // ...but an append lands first (winning version 2)
    IndexManifest.commitMerge(fs, root) { cur =>
      val c = cur.get
      c.copy(tables = Map("t" -> (c.segs("t") :+ "delta_b")),
        applied = c.applied :+ "b")
    }
    // simulate the compactor's raced commit: its FIRST merge attempt
    // runs against a stale read (we steal its slot mid-flight by
    // pre-creating version 3, forcing one conflict loop)
    var attempts = 0
    val committed = IndexManifest.commitMerge(fs, root) { cur =>
      attempts += 1
      if (attempts == 1) {
        // steal the slot the first attempt will try (current + 1)
        val v = cur.get.version + 1
        val out = fs.create(new org.apache.hadoop.fs.Path(root,
          f"manifest_v$v%012d.json"), false)
        out.write(IndexManifest.latest(fs, root).get match {
          case s => render(s.copy(version = v,
            tables = Map("t" -> (s.segs("t") :+ "delta_c")),
            applied = s.applied :+ "c"))
        })
        out.close()
      }
      val c = cur.get
      c.copy(tables = Map("t" ->
        ("compacted" +: c.segs("t").filterNot(folded.contains))))
    }
    assert(attempts == 2, "first slot must have been lost")
    // the final snapshot holds the compacted segment AND every
    // concurrently appended one, and the full applied record
    assert(committed.segs("t").toSet == Set("compacted", "delta_b",
      "delta_c"))
    assert(committed.applied.toSet == Set("a", "b", "c"))
  }

  // re-render a snapshot the way the protocol does (private there) —
  // good enough for the slot-stealing fake: field order irrelevant
  private def render(s: IndexSnapshot): Array[Byte] = {
    val tables = s.tables.toSeq.sortBy(_._1).map { case (t, segs) =>
      s""""$t": [${segs.map(x => s""""$x"""").mkString(", ")}]"""
    }.mkString(", ")
    val applied = s.applied.map(x => s""""$x"""").mkString(", ")
    s"""{"version": ${s.version}, "tables": {$tables},
       | "applied": [$applied]}""".stripMargin.getBytes("UTF-8")
  }

  test("liveLegVersions fails hard on an unreadable RETAINED pin " +
      "(deleter semantics: absent = vacuumed, skip; exists-but-" +
      "unreadable = may still name live versions, abort)") {
    val pinRoot = scratch()
    PipelinePin.commit(fs, pinRoot, Map("t" -> 1L))
    PipelinePin.commit(fs, pinRoot, Map("t" -> 2L))
    PipelinePin.commit(fs, pinRoot, Map("t" -> 3L))
    // absent middle pin (vacuumed / CAS slot never won) → skipped
    fs.delete(new org.apache.hadoop.fs.Path(pinRoot,
      "manifest_v000000000002.json"), false)
    assert(PipelinePin.liveLegVersions(fs, pinRoot, "t") ==
      Set(1L, 3L))
    // torn/unreadable middle pin → the vacuum that would consume this
    // keep-set must abort, not reclaim versions the pin may name
    val torn = fs.create(new org.apache.hadoop.fs.Path(pinRoot,
      "manifest_v000000000002.json"), false)
    torn.write("""{"version": 2, "tab""".getBytes("UTF-8"))
    torn.close()
    val ex = intercept[IllegalStateException](
      PipelinePin.liveLegVersions(fs, pinRoot, "t"))
    assert(ex.getMessage.contains("cannot be read"))
  }

  test("liveLegVersions fails hard on an unreadable NEWEST pin — the " +
      "scan bound is the newest version FILE, not the newest " +
      "parseable pin (latest() silently falls back past a torn " +
      "newest manifest, which would shrink the keep-set on the pin " +
      "most likely to name live versions)") {
    val pinRoot = scratch()
    PipelinePin.commit(fs, pinRoot, Map("t" -> 1L))
    PipelinePin.commit(fs, pinRoot, Map("t" -> 2L))
    val torn = fs.create(new org.apache.hadoop.fs.Path(pinRoot,
      "manifest_v000000000003.json"), false)
    torn.write("""{"version": 3, "tab""".getBytes("UTF-8"))
    torn.close()
    val ex = intercept[IllegalStateException](
      PipelinePin.liveLegVersions(fs, pinRoot, "t"))
    assert(ex.getMessage.contains("pin v3"),
      s"the torn NEWEST pin must abort the scan (got: ${ex.getMessage})")
  }

  test("a torn newest manifest falls back one version") {
    val root = scratch()
    IndexManifest.commitMerge(fs, root)(_ =>
      IndexSnapshot(0L, Map("t" -> Seq("base")), Seq.empty))
    val torn = fs.create(new org.apache.hadoop.fs.Path(root,
      "manifest_v000000000002.json"), false)
    torn.write("""{"version": 2, "tab""".getBytes("UTF-8"))
    torn.close()
    assert(IndexManifest.latest(fs, root).get.version == 1L)
  }

  test("vacuum keeps segments referenced by the newest K manifests " +
      "and drops the rest") {
    val root = scratch()
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/t/base"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/t/delta_a"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/t/compacted"))
    IndexManifest.commitMerge(fs, root)(_ =>
      IndexSnapshot(0L, Map("t" -> Seq("base")), Seq.empty))
    IndexManifest.commitMerge(fs, root)(c => c.get.copy(
      tables = Map("t" -> Seq("base", "delta_a")), applied = Seq("a")))
    IndexManifest.commitMerge(fs, root)(c => c.get.copy(
      tables = Map("t" -> Seq("compacted"))))
    IndexManifest.vacuum(fs, root, keepVersions = 1,
      Map("t" -> s"$root/t"))
    val segs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/t"))
      .map(_.getPath.getName).toSet
    assert(segs == Set("compacted"))
    val manifests = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).filter(_.startsWith("manifest_")).toSeq
    assert(manifests == Seq("manifest_v000000000003.json"))
    assert(IndexManifest.latest(fs, root).get.segs("t") ==
      Seq("compacted"))
  }

  test("pin-aware vacuum (x224): pinnedVersions extend the keep " +
      "window; liveLegVersions reads the whole retained pin history; " +
      "pins-then-legs vacuum order releases the version") {
    val root = scratch()
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/t/base"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/t/delta_a"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/t/compacted"))
    IndexManifest.commitMerge(fs, root)(_ =>
      IndexSnapshot(0L, Map("t" -> Seq("base")), Seq.empty))
    IndexManifest.commitMerge(fs, root)(c => c.get.copy(
      tables = Map("t" -> Seq("base", "delta_a")), applied = Seq("a")))
    IndexManifest.commitMerge(fs, root)(c => c.get.copy(
      tables = Map("t" -> Seq("compacted"))))
    // a pin history naming v1 (old) and v3 (current) of this leg
    val pinRoot = scratch()
    PipelinePin.commit(fs, pinRoot, Map("t" -> 1L, "other" -> 1L))
    PipelinePin.commit(fs, pinRoot, Map("t" -> 3L, "other" -> 2L))
    assert(PipelinePin.liveLegVersions(fs, pinRoot, "t") ==
      Set(1L, 3L))
    assert(PipelinePin.liveLegVersions(fs, pinRoot, "other") ==
      Set(1L, 2L))
    assert(PipelinePin.liveLegVersions(fs, pinRoot, "absent").isEmpty)
    // keepVersions=1 would drop v1/v2 — the pin on v1 keeps it (and
    // its base segment); the unpinned v2 goes
    IndexManifest.vacuum(fs, root, keepVersions = 1,
      Map("t" -> s"$root/t"),
      pinnedVersions =
        PipelinePin.liveLegVersions(fs, pinRoot, "t"))
    val segs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/t"))
      .map(_.getPath.getName).toSet
    assert(segs == Set("base", "compacted"),
      s"pinned v1's base segment must survive (got $segs)")
    assert(IndexManifest.at(fs, root, 1L).isDefined,
      "pinned manifest v1 must survive")
    assert(IndexManifest.at(fs, root, 2L).isEmpty,
      "unpinned v2 must be vacuumed")
    // the order contract: vacuum pins first, THEN the leg releases v1
    PipelinePin.vacuum(fs, pinRoot, keepVersions = 1)
    assert(PipelinePin.liveLegVersions(fs, pinRoot, "t") == Set(3L))
    IndexManifest.vacuum(fs, root, keepVersions = 1,
      Map("t" -> s"$root/t"),
      pinnedVersions =
        PipelinePin.liveLegVersions(fs, pinRoot, "t"))
    val segs2 = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/t"))
      .map(_.getPath.getName).toSet
    assert(segs2 == Set("compacted"))
    assert(IndexManifest.at(fs, root, 1L).isEmpty)
  }

  test("a crashed writer's torn manifest does not brick later " +
      "commits: the next commit claims the slot PAST the corpse") {
    val root = scratch()
    IndexManifest.commitMerge(fs, root)(_ =>
      IndexSnapshot(0L, Map("t" -> Seq("base")), Seq.empty))
    // a writer crashed mid-write of v2: the slot is occupied by an
    // unparseable file forever
    val torn = fs.create(new org.apache.hadoop.fs.Path(root,
      "manifest_v000000000002.json"), false)
    torn.write("""{"version": 2, "tab""".getBytes("UTF-8"))
    torn.close()
    // a latest-parseable+1 slot computation would collide with the
    // corpse on every CAS attempt; the commit must land at v3
    val s = IndexManifest.commitMerge(fs, root) { cur =>
      val c = cur.get
      c.copy(tables = Map("t" -> (c.segs("t") :+ "delta_a")),
        applied = c.applied :+ "a")
    }
    assert(s.version == 3L)
    assert(IndexManifest.latest(fs, root).get ==
      IndexSnapshot(3L, Map("t" -> Seq("base", "delta_a")), Seq("a")))
    // the torn slot stays torn: time travel to it errors as not-found
    assert(IndexManifest.at(fs, root, 2L).isEmpty)
  }

  test("vacuum ABORTS when a kept manifest is unreadable — a torn " +
      "in-flight commit must never make live segments look " +
      "unreferenced") {
    val root = scratch()
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/t/base"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/t/delta_a"))
    IndexManifest.commitMerge(fs, root)(_ =>
      IndexSnapshot(0L, Map("t" -> Seq("base")), Seq.empty))
    IndexManifest.commitMerge(fs, root)(c => c.get.copy(
      tables = Map("t" -> Seq("base", "delta_a")), applied = Seq("a")))
    // a torn newest manifest INSIDE the kept window (e.g. a concurrent
    // commit mid-write): only delta_b would be referenced by it, but
    // vacuum cannot know — it must refuse to delete anything
    val torn = fs.create(new org.apache.hadoop.fs.Path(root,
      "manifest_v000000000003.json"), false)
    torn.write("""{"version": 3, "tab""".getBytes("UTF-8"))
    torn.close()
    intercept[IllegalStateException](IndexManifest.vacuum(fs, root,
      keepVersions = 2, Map("t" -> s"$root/t")))
    // nothing was deleted — segments AND superseded manifests intact
    val segs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/t"))
      .map(_.getPath.getName).toSet
    assert(segs == Set("base", "delta_a"))
    val manifests = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).filter(_.startsWith("manifest_")).toSet
    assert(manifests.size == 3)
    // readers still fall back past the torn version (read-side
    // tolerance is unchanged)
    assert(IndexManifest.latest(fs, root).get.version == 2L)
  }

  test("PipelinePin: commits are whole pairs, a mid-dual-append read " +
      "returns the previous coherent pair, and a torn pin fails " +
      "loudly") {
    val root = scratch()
    assert(PipelinePin.latest(fs, root).isEmpty)
    val p1 = PipelinePin.commit(fs, root, Map("bm25" -> 1L, "ivf" -> 1L))
    assert(p1.version == 1L && p1("bm25") == 1L && p1("ivf") == 1L)
    // the mid-dual-append window: the bm25 index has advanced to v2
    // but no new pin is committed yet — a reader resolving the pin
    // still gets the (1, 1) pair, never a (2, 1) mix
    assert(PipelinePin.latest(fs, root).get == p1)
    val p2 = PipelinePin.commit(fs, root, Map("bm25" -> 2L, "ivf" -> 2L))
    assert(p2.version == 2L)
    assert(PipelinePin.latest(fs, root).get.indexVersions ==
      Map("bm25" -> 2L, "ivf" -> 2L))
    // whole-pipeline time travel: pin 1 still resolves the old pair
    assert(PipelinePin.at(fs, root, 1L).get.indexVersions ==
      Map("bm25" -> 1L, "ivf" -> 1L))
    // a missing leg is an error, not a default
    intercept[IllegalArgumentException](p2("pq"))
    // a torn pin FILE (crashed writer) is skipped by the reader —
    // fall back to the newest parseable pair, IndexManifest semantics
    val torn = fs.create(new org.apache.hadoop.fs.Path(root,
      "manifest_v000000000003.json"), false)
    torn.write("""{"version": 3, "tab""".getBytes("UTF-8"))
    torn.close()
    assert(PipelinePin.latest(fs, root).get.version == 2L)
    // a PARSEABLE pin whose leg is not a single numeric version is
    // torn content — serving a guessed pair is forbidden
    val bad = fs.create(new org.apache.hadoop.fs.Path(root,
      "manifest_v000000000004.json"), false)
    bad.write(
      """{"version": 4, "tables": {"bm25": ["1", "2"], "ivf": ["1"]},
         "applied": []}""".getBytes("UTF-8"))
    bad.close()
    intercept[IllegalArgumentException](PipelinePin.latest(fs, root))
  }

  test("PipelinePin.vacuum keeps the newest K pins; vacuumed versions " +
      "stop resolving, the newest still serves") {
    val root = scratch()
    (1 to 3).foreach(i =>
      PipelinePin.commit(fs, root, Map("bm25" -> i.toLong,
        "ivf" -> i.toLong)))
    PipelinePin.vacuum(fs, root, keepVersions = 2)
    assert(PipelinePin.at(fs, root, 1L).isEmpty)
    assert(PipelinePin.at(fs, root, 2L).get("bm25") == 2L)
    assert(PipelinePin.latest(fs, root).get.version == 3L)
  }

  test("a frozen root (_READONLY) refuses every commit but keeps " +
      "serving reads") {
    val root = scratch()
    IndexManifest.commitMerge(fs, root)(_ =>
      IndexSnapshot(0L, Map("t" -> Seq("base")), Seq("base")))
    IndexManifest.markReadOnly(fs, root)
    IndexManifest.markReadOnly(fs, root) // idempotent
    // every mutation path funnels through commitMerge — one refusal
    // covers append/delete/compact/retrain/pin alike
    val e = intercept[IllegalStateException](
      IndexManifest.commitMerge(fs, root)(_ =>
        IndexSnapshot(0L, Map("t" -> Seq("base", "delta_a")),
          Seq("base", "a"))))
    assert(e.getMessage.contains("_READONLY"))
    // reads are unaffected
    assert(IndexManifest.latest(fs, root).get.segs("t") == Seq("base"))
    // thaw: removing the marker re-enables commits
    fs.delete(new org.apache.hadoop.fs.Path(root,
      IndexManifest.ReadOnlyMarker), false)
    assert(IndexManifest.commitMerge(fs, root)(_ =>
      IndexSnapshot(0L, Map("t" -> Seq("base", "delta_a")),
        Seq("base", "a"))).version == 2L)
  }
}
