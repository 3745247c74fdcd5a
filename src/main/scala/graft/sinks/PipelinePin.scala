package graft.sinks

import org.apache.hadoop.fs.FileSystem

/** One atomically-committed PAIR (or tuple) of index versions — the
  * pipeline-level snapshot for retrieval stacks that serve from
  * SEVERAL independently-versioned indexes at once (the hybrid
  * lexical+vector shape): each member index already has its own
  * [[IndexManifest]] giving per-index snapshot isolation, but two legs
  * resolved INDEPENDENTLY can mix freshness — a dual append that has
  * landed in the BM25 index but not yet in the IVF index serves a
  * lexical list of the new corpus fused with a vector list of the old
  * one. A pin closes that window: one JSON manifest naming each leg's
  * version, committed with [[IndexManifest]]'s CAS protocol, read as
  * one file — a reader sees the OLD pair or the NEW pair, never a torn
  * mix. Writers (the dual CDC applier) commit the pin only after every
  * leg's own commit has landed.
  *
  * Time travel composes: pin version N names leg versions that each
  * leg's retention keeps servable, so `at(root, N)` replays the whole
  * pipeline's state, not one index's. Storage reuses the
  * [[IndexSnapshot]] shape (leg name → single-element version list),
  * so the pin directory is just another manifest directory —
  * `latest`/`at`/CAS/vacuum semantics come for free. */
object PipelinePin {

  /** A resolved pin: `indexVersions(leg)` is the manifest version the
    * serve must pass as `asOfVersion` to that leg's index. */
  case class Pin(version: Long, indexVersions: Map[String, Long]) {
    def apply(leg: String): Long = indexVersions.getOrElse(leg,
      throw new IllegalArgumentException(
        s"pin v$version carries no leg '$leg' " +
          s"(legs: ${indexVersions.keys.toSeq.sorted.mkString(", ")})"))
  }

  private def toSnapshot(p: Pin): IndexSnapshot =
    IndexSnapshot(p.version,
      p.indexVersions.map { case (leg, v) => leg -> Seq(v.toString) },
      Seq.empty)

  /** A pin whose leg maps to anything but ONE parseable version is
    * torn/corrupt — fail loudly, never serve a guessed pair. */
  private def fromSnapshot(s: IndexSnapshot): Pin =
    Pin(s.version, s.tables.map { case (leg, vs) =>
      require(vs.length == 1,
        s"torn pipeline pin v${s.version}: leg '$leg' carries " +
          s"${vs.length} versions (${vs.mkString(", ")})")
      leg -> vs.head.toLongOption.getOrElse(
        throw new IllegalArgumentException(
          s"torn pipeline pin v${s.version}: leg '$leg' version " +
            s"'${vs.head}' is not a number"))
    })

  /** Commit a new pin naming `indexVersions` as the served pair. The
    * pin REPLACES the previous one wholesale (a pin is a complete
    * statement of the pipeline's snapshot, not a delta), so the CAS
    * merge ignores the incumbent; concurrent committers still
    * serialize through the version slots. */
  def commit(fs: FileSystem, root: String,
      indexVersions: Map[String, Long]): Pin = {
    require(indexVersions.nonEmpty, "a pin must name at least one leg")
    fromSnapshot(IndexManifest.commitMerge(fs, root)(_ =>
      toSnapshot(Pin(0L, indexVersions))))
  }

  /** The newest parseable pin, or None for a directory with no pins. */
  def latest(fs: FileSystem, root: String): Option[Pin] =
    IndexManifest.latest(fs, root).map(fromSnapshot)

  /** A specific pin version — whole-pipeline time travel. */
  def at(fs: FileSystem, root: String, version: Long): Option[Pin] =
    IndexManifest.at(fs, root, version).map(fromSnapshot)

  /** Retention for the pin directory: drop all but the newest
    * `keepVersions` pins (pure manifest files — a pin references no
    * segment data of its own). Size it to match the member indexes'
    * own retention: a pin older than a leg's vacuumed versions names
    * an unservable pair anyway. */
  def vacuum(fs: FileSystem, root: String, keepVersions: Int): Unit =
    IndexManifest.vacuum(fs, root, keepVersions, Map.empty)

  /** Every version of `leg` named by any RETAINED pin — the keep-set
    * a pin-aware index vacuum must honor (x224): however old, a leg
    * version a live pin still names must survive the leg's own
    * retention until the PIN is vacuumed first (vacuum order: pins,
    * then legs). This feeds a DELETER, so it fails hard on every
    * ambiguous read: a pin version whose file is ABSENT was vacuumed
    * (or its CAS slot was never won) and is safely skipped, but a pin
    * file that EXISTS and doesn't parse — torn commit or transient FS
    * read failure, indistinguishable from here — throws, aborting the
    * caller's vacuum rather than letting it reclaim a version that
    * pin may still name (the kept-manifest abort in
    * [[IndexManifest.vacuum]]); likewise a parseable pin with torn
    * CONTENT throws.
    *
    * The scan's upper bound is the newest version FILE present
    * ([[IndexManifest.newestVersionFile]] — commitMerge's slot rule),
    * NOT the newest parseable pin: `latest` silently skips an
    * unreadable newest manifest and falls back one version, so a torn
    * write (or transient read failure) of the NEWEST pin — the one
    * most likely to name live leg versions — would silently shrink the
    * keep-set. Bounding by the file makes that pin hit the same
    * exists-but-unreadable abort as any other. */
  def liveLegVersions(fs: FileSystem, root: String, leg: String)
      : Set[Long] =
    IndexManifest.newestVersionFile(fs, root) match {
      case None => Set.empty
      case Some(newestFile) =>
        (1L to newestFile).flatMap { v =>
          at(fs, root, v) match {
            case Some(pin) => pin.indexVersions.get(leg)
            case None =>
              if (IndexManifest.versionFileExists(fs, root, v))
                throw new IllegalStateException(
                  s"pin v$v at $root exists but cannot be read — " +
                    "refusing to vacuum past it (it may still name " +
                    "live leg versions); repair or vacuum the pin " +
                    "directory first")
              None
          }
        }.toSet
    }
}
