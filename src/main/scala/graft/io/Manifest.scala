package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned file manifests — snapshot-isolated READS for the
  * rename-swap write family ([[Sinks.upsertPartitioned]],
  * [[graft.ops.Compaction.compactPartitioned]],
  * [[graft.ops.Layout.rewriteInPlace]] and the index relayouts built
  * on it).
  *
  * The swap protocols made WRITERS crash-atomic (stage → txn marker →
  * rename swap, roll-forward repair), but a reader listing directories
  * mid-swap could still observe a partition directory vanished between
  * the two renames — plain parquet has no snapshot isolation. This
  * closes that hole the way production table formats do, with a
  * version-pointer read path:
  *
  *  - every completed swap-family write COMMITS a manifest: the
  *    root-relative list of the table's data files (+ lengths), written
  *    to `_graft_manifest/v{N}.list` via write-tmp-then-RENAME — one
  *    atomic metadata op is the commit point, so a reader listing the
  *    manifest dir sees version N fully or not at all;
  *  - readers resolve a COMMITTED file list ([[read]]/[[readVersion]])
  *    instead of listing data directories: the files named by the
  *    resolved manifest are located at their committed paths or — the
  *    mid-swap window — in the swap's deterministic hidden trash
  *    sibling (`.{dir}.graft-{upsert,compact}-old` beside a partition,
  *    `.{table}.graft-relayout-old` beside the table root). The swap
  *    family RETAINS those trash siblings until the next maintenance
  *    pass (its repair/recovery sweeps them), so the previous snapshot
  *    stays readable through the entire swap, not just between the two
  *    renames;
  *  - a manifest whose files were vacuumed (retention has passed) is
  *    refused LOUDLY with the version that no longer resolves — a
  *    stale reader gets an error naming the fix (re-resolve latest),
  *    never a silently partial table.
  *
  * Scale: commit cost is one recursive driver-side listing (the same
  * metadata walk compaction already does) + one small file write;
  * resolution cost is one `listStatus` per manifest directory-group
  * (batched — never a per-file RPC). The manifest itself stays small:
  * file COUNT, not bytes, and a compacted 100-TB table is sized by
  * `targetBytes` precisely so that count stays low. Manifests older
  * than [[KeepVersions]] commits are vacuumed with the same rename-is-
  * commit discipline. Single writer per table assumed, as everywhere
  * in this family.
  *
  * Partition columns: the common (all-live) case reads through Spark's
  * normal partition discovery (`basePath` + explicit file paths), so
  * types and values are identical to a plain directory read. Files
  * resolved through a trash sibling lose that discovery (hidden dirs
  * do not parse as `col=value`), so their partition values are
  * re-attached from the manifest's relative path and CAST to the
  * live side's discovered types — when every partition of the snapshot
  * is mid-swap at once (no live side), they surface as strings.
  */
object Manifest {

  val DirName = "_graft_manifest"

  /** Committed snapshots retained; older manifests are vacuumed at
    * commit. Retention of the superseded DATA files is governed by the
    * writers' trash sweep (next maintenance pass), not by this count.
    */
  val KeepVersions = 10

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def nameOf(v: Long) = f"v$v%012d.list"
  private val NameRe = "^v(\\d{12})\\.list$".r

  /** Dropping a manifest from retention leaves a TOMBSTONE
    * (`v{N}.list.vacuumed` — rename, same atomic metadata op as
    * commit) instead of deleting it: a reader re-deriving the dropped
    * version must get the named vacuumed refusal, not the
    * indistinguishable-from-a-typo "no manifest". Tombstones are
    * excluded from [[versions]] by the name pattern and cost one
    * empty-file-sized entry each, bounded by total commits ever made.
    */
  private def tombstoneOf(v: Long) = nameOf(v) + ".vacuumed"

  private def dropManifest(fs: FileSystem, md: Path, v: Long): Unit = {
    val src = new Path(md, nameOf(v))
    if (fs.exists(src)) {
      val dst = new Path(md, tombstoneOf(v))
      if (fs.exists(dst)) fs.delete(src, false)
      else if (!fs.rename(src, dst)) fs.delete(src, false)
    }
  }

  /** The manifest directory, resolved live or — the window inside a
    * [[graft.ops.Layout.rewriteInPlace]] swap where the whole root
    * (history included) sits in the relayout trash — from the trash
    * sibling. None when neither exists.
    */
  private def resolveManifestDir(fs: FileSystem, root: Path): Option[Path] = {
    val live = new Path(root, DirName)
    if (fs.exists(live)) Some(live)
    else {
      val inTrash = new Path(
        new Path(root.getParent, s".${root.getName}.graft-relayout-old"),
        DirName)
      if (fs.exists(inTrash)) Some(inTrash) else None
    }
  }

  /** Committed versions, ascending (empty when no manifest yet). */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    resolveManifestDir(fs, root).map { md =>
      fs.listStatus(md).toSeq.flatMap(s => s.getPath.getName match {
        case NameRe(d) => Some(d.toLong)
        case _ => None
      }).sorted
    }.getOrElse(Seq.empty)
  }

  def latestVersion(spark: SparkSession, path: String): Option[Long] =
    versions(spark, path).lastOption

  /** Root-relative (dir, name, len, mtime) of every VISIBLE data file
    * — dot/underscore names (trash, stage, markers, the manifest dir
    * itself, _SUCCESS) are excluded at every level. Modification time
    * is part of the file's committed identity: (name, length) alone
    * would serve a same-named same-sized rewrite silently (rename
    * preserves mtime, so a trash-resolved file keeps the identity it
    * was committed with).
    */
  private def dataFiles(fs: FileSystem,
                        root: Path): Seq[(String, String, Long, Long)] = {
    val rootUri = fs.makeQualified(root).toUri
    def visible(n: String) = !n.startsWith(".") && !n.startsWith("_")
    def walk(dir: Path): Seq[(String, String, Long, Long)] =
      fs.listStatus(dir).toSeq.filter(s => visible(s.getPath.getName))
        .flatMap { s =>
          if (s.isDirectory) walk(s.getPath)
          else {
            val rel = rootUri
              .relativize(fs.makeQualified(s.getPath.getParent).toUri)
              .getPath.stripSuffix("/")
            Seq((rel, s.getPath.getName, s.getLen, s.getModificationTime))
          }
        }
    walk(root)
  }

  /** Snapshot the table's CURRENT committed file set as version
    * latest+1. Called by the swap-family writers after their mutation
    * completes; callable standalone to checkpoint a table mutated by
    * plain appends. Returns the committed version.
    *
    * Body format: `#ptype\t<col>\t<DataType json>` header lines (the
    * partition columns' DISCOVERED types, persisted so a snapshot
    * resolved entirely from trash re-attaches partition values with
    * the committed types instead of silently degrading to strings),
    * then one `len\tmtime\trelpath` line per data file.
    */
  def commit(spark: SparkSession, path: String): Long = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    require(fs.exists(root), s"Manifest.commit: no table at $path")
    val md = new Path(root, DirName)
    fs.mkdirs(md)
    val v = latestVersion(spark, path).getOrElse(0L) + 1
    val files = dataFiles(fs, root).sortBy { case (d, n, _, _) => (d, n) }
    // partition columns appear as col=value path segments; their
    // READ-SIDE types come from Spark's partition discovery (one
    // footer+listing read), recorded so every later resolution of this
    // snapshot types them identically, live side present or not
    val partCols = files.flatMap(_._1.split('/'))
      .filter(_.contains("=")).map(_.split("=", 2)(0)).distinct
    val header =
      if (partCols.isEmpty) Seq.empty[String]
      else {
        val schema = spark.read.parquet(path).schema
        partCols.flatMap(c => schema.fields.find(_.name == c)
          .map(f => s"#ptype\t$c\t${f.dataType.json}"))
      }
    val body = (header ++ files.map { case (d, n, l, t) =>
      s"$l\t$t\t${if (d.isEmpty) n else s"$d/$n"}"
    }).mkString("\n")
    val tmp = new Path(md, nameOf(v) + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    require(fs.rename(tmp, new Path(md, nameOf(v))),
      s"Manifest.commit: rename to ${nameOf(v)} failed")
    versions(spark, path).dropRight(KeepVersions)
      .foreach(old => dropManifest(fs, md, old))
    v
  }

  /** The latest committed snapshot as a DataFrame. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val v = latestVersion(spark, path).getOrElse(
      throw new IllegalStateException(
        s"Manifest.read: no committed manifest under $path — run a " +
          "swap-family write or Manifest.commit first"))
    readVersion(spark, path, v)
  }

  /** Snapshot `version` as a DataFrame: exactly the manifest's files,
    * resolved at their committed paths or in the swap family's hidden
    * trash siblings (the mid-swap / retained-previous-version window).
    * Throws IllegalStateException when a listed file is found nowhere
    * (or with a different length) — the snapshot has been vacuumed.
    */
  def readVersion(spark: SparkSession, path: String, version: Long): DataFrame = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val mdOpt = resolveManifestDir(fs, root)
    val mf = mdOpt.map(new Path(_, nameOf(version))).filter(fs.exists)
      .getOrElse {
        // dropped-by-retention leaves a tombstone: refuse BY NAME so a
        // stale pin re-derived after a vacuum learns the fix
        // (re-resolve latest) instead of "no manifest"
        if (mdOpt.exists(d => fs.exists(new Path(d, tombstoneOf(version)))))
          throw new IllegalStateException(
            s"Manifest.readVersion: snapshot v$version of $path was " +
              "vacuumed by a retention pass — re-resolve the latest " +
              "version (Manifest.read)")
        throw new IllegalArgumentException(
          s"Manifest.readVersion: no manifest v$version under $path")
      }
    val in = fs.open(mf)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toList finally in.close()
    // `#ptype` headers: the partition columns' committed types
    val ptypes: Map[String, org.apache.spark.sql.types.DataType] =
      lines.filter(_.startsWith("#ptype\t")).map { l =>
        val Array(_, c, j) = l.split("\t", 3)
        c -> org.apache.spark.sql.types.DataType.fromJson(j)
      }.toMap
    // entry identity is (path, length, mtime); pre-mtime manifests
    // (two fields) fall back to length-only matching
    val entries = lines.filterNot(_.startsWith("#")).map { line =>
      val parts = line.split("\t", 3)
      val (len, mtime, rel) =
        if (parts.length == 3) (parts(0).toLong, parts(1).toLong, parts(2))
        else (parts(0).toLong, -1L, parts(1))
      val i = rel.lastIndexOf('/')
      (if (i < 0) "" else rel.substring(0, i),
        if (i < 0) rel else rel.substring(i + 1), len, mtime)
    }
    if (entries.isEmpty)
      throw new IllegalStateException(
        s"Manifest.readVersion: snapshot v$version of $path is empty")

    // one listing per (relDir, candidate location): batched metadata
    // calls, never a per-file exists() RPC
    def listing(dir: Path): Map[String, (Long, Long)] =
      try fs.listStatus(dir).filter(_.isFile)
        .map(s => s.getPath.getName -> (s.getLen, s.getModificationTime)).toMap
      catch { case _: java.io.FileNotFoundException => Map.empty }
    def matches(listed: Option[(Long, Long)], len: Long, mtime: Long): Boolean =
      listed.exists { case (l, t) => l == len && (mtime < 0 || t == mtime) }

    val rootTrash = new Path(root.getParent,
      s".${root.getName}.graft-relayout-old")
    val live = scala.collection.mutable.ArrayBuffer.empty[Path]
    val fallback =
      scala.collection.mutable.LinkedHashMap.empty[String, Vector[Path]]
    entries.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (relDir, group) =>
      val liveDir = if (relDir.isEmpty) root else new Path(root, relDir)
      val liveLs = listing(liveDir)
      // trash candidates for this directory-group, lazily listed once
      val leafName = relDir.split('/').last
      val leafParent = liveDir.getParent
      lazy val trashDirs = (
        (if (relDir.isEmpty) Seq.empty[Path]
         else Seq(new Path(leafParent, s".$leafName.graft-upsert-old"),
           new Path(leafParent, s".$leafName.graft-compact-old"),
           new Path(leafParent, s".$leafName.graft-retention-old"))) :+
          (if (relDir.isEmpty) rootTrash else new Path(rootTrash, relDir))
        ).map(d => d -> listing(d))
      group.foreach { case (_, name, len, mtime) =>
        if (matches(liveLs.get(name), len, mtime)) live += new Path(liveDir, name)
        else trashDirs.find(t => matches(t._2.get(name), len, mtime)) match {
          case Some((d, _)) =>
            fallback(relDir) = fallback.getOrElse(relDir, Vector.empty) :+
              new Path(d, name)
          case None => throw new IllegalStateException(
            s"Manifest.readVersion: snapshot v$version of $path is no " +
              s"longer readable — '$relDir/$name' was vacuumed by a later " +
              "maintenance pass; re-resolve the latest version")
        }
      }
    }

    val liveDf = if (live.isEmpty) None
      else Some(spark.read.option("basePath", root.toString)
        .parquet(live.map(_.toString).toSeq: _*))
    // committed types first (every post-r9 manifest carries them), the
    // live side's discovery for older manifests — so a snapshot whose
    // every partition is mid-swap still types its partition columns
    // exactly as the same version resolved a moment earlier
    val partType = (c: String) => ptypes.get(c).orElse(liveDf
      .flatMap(df => df.schema.fields.find(_.name == c).map(_.dataType)))
    val trashDfs = fallback.toSeq.map { case (relDir, paths) =>
      val base = spark.read.parquet(paths.map(_.toString): _*)
      // re-attach partition values from the manifest's relative path
      // (hidden trash dirs do not parse as col=value); Hive-escaped
      // values are URL-decoded, the Hive null sentinel maps to NULL
      relDir.split('/').filter(_.nonEmpty).foldLeft(base) { (df, seg) =>
        val Array(k, raw) = seg.split("=", 2)
        // %XX-only unescape: URLDecoder would corrupt a literal '+'
        // in a partition value into a space (Hive never writes '+')
        val v = HivePath.percentDecode(raw)
        val lit0 = if (v == "__HIVE_DEFAULT_PARTITION__") lit(null) else lit(v)
        df.withColumn(k, partType(k).map(lit0.cast).getOrElse(lit0))
      }
    }
    (liveDf.toSeq ++ trashDfs).reduce(_.unionByName(_))
  }

  /** EXPLICIT retention maintenance — the scheduled `VACUUM` a
    * production table runs, replacing the implicit "next write's
    * repair pass sweeps the trash" with a safety-checked reclaim:
    *
    *  1. refuses to run over crash state (an uncommitted stage, a txn
    *     marker, a half-finished relayout) — recovery belongs to the
    *     writers' repair passes, which know their own protocols;
    *  2. drops manifests older than the newest `retainVersions`
    *     (rename-committed files, plain deletes);
    *  3. sweeps the swap family's trash siblings, deleting ONLY files
    *     referenced by no retained manifest — a file any retained
    *     snapshot still names is kept wherever it lives, so every
    *     retained version remains fully readable after the sweep
    *     (pinned in ManifestSpec), and readers pinned to a DROPPED
    *     version get [[readVersion]]'s loud vacuumed refusal, never a
    *     silently partial table.
    *
    * Live data files are never touched — vacuum reclaims history, not
    * the table. Driver-side metadata walk only (the same listing scale
    * as commit). Single writer per table assumed, as everywhere in
    * this family. Returns (manifests dropped, trash files deleted,
    * trash files retained).
    *
    * OPEN pinned readers: vacuum has no reader registry, so a
    * [[readVersion]] plan held open across a vacuum is governed by its
    * version — a RETAINED pin reads exactly through the sweep; a
    * DROPPED pin fails loudly at execution (its reclaimed files are
    * missing and `ignoreMissingFiles` stays false), never silently
    * partial, and re-resolving it gets the named vacuumed refusal.
    * A consumer that must outlive retention (e.g. an index-maintenance
    * job holding a corpus snapshot) either materializes the snapshot
    * first or sizes `retainVersions` past its window. Pinned in
    * ManifestSpec ("vacuum vs an OPEN pinned reader").
    */
  def vacuum(spark: SparkSession, path: String,
             retainVersions: Int = KeepVersions): (Int, Int, Int) = {
    require(retainVersions >= 1,
      s"Manifest.vacuum: retainVersions must be >= 1, got $retainVersions")
    val root = new Path(path)
    val fs = fsOf(spark, root)
    require(fs.exists(root), s"Manifest.vacuum: no table at $path")
    // 1. crash state is the writers' to repair, not vacuum's to bury
    val crashMarkers = Seq(
      new Path(root, ".graft-upsert-txn"),
      new Path(root, ".graft-upsert-stage"),
      new Path(root.getParent, s".${root.getName}.graft-relayout-tmp"))
    crashMarkers.find(fs.exists).foreach(m => throw new IllegalStateException(
      s"Manifest.vacuum: crash state present at $m — run the owning " +
        "writer's repair (repairPartitionedUpsert / restoreIfCrashed) " +
        "before vacuuming"))
    def findSuffixed(dir: Path, suffix: String): Seq[Path] = {
      val here = try fs.listStatus(dir).toSeq
        catch { case _: java.io.FileNotFoundException => Seq.empty }
      here.filter(_.isDirectory).flatMap { s =>
        val n = s.getPath.getName
        if (n.startsWith(".") && n.endsWith(suffix)) Seq(s.getPath)
        else if (!n.startsWith(".") && !n.startsWith("_"))
          findSuffixed(s.getPath, suffix)
        else Seq.empty
      }
    }
    Seq(".graft-compact-tmp").foreach { suffix =>
      findSuffixed(root, suffix).headOption.foreach(m =>
        throw new IllegalStateException(
          s"Manifest.vacuum: crash state present at $m — run the owning " +
            "writer's repair before vacuuming"))
    }
    // 2. drop manifests beyond retention
    val vs = versions(spark, path)
    val dropped = vs.dropRight(retainVersions)
    val md = resolveManifestDir(fs, root)
    dropped.foreach(v => md.foreach(d => dropManifest(fs, d, v)))
    // 3. the retained snapshots' referenced set: (relDir, name) →
    //    accepted (len, mtime) identities
    val retained = versions(spark, path)
    val referenced: Set[(String, String, Long, Long)] = retained.flatMap { v =>
      val mf = md.map(new Path(_, nameOf(v))).filter(fs.exists)
      mf.toSeq.flatMap { p =>
        val in = fs.open(p)
        val ls = try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().filter(l => l.nonEmpty && !l.startsWith("#")).toList
          finally in.close()
        ls.map { line =>
          val parts = line.split("\t", 3)
          val (len, mtime, rel) =
            if (parts.length == 3) (parts(0).toLong, parts(1).toLong, parts(2))
            else (parts(0).toLong, -1L, parts(1))
          val i = rel.lastIndexOf('/')
          (if (i < 0) "" else rel.substring(0, i),
            if (i < 0) rel else rel.substring(i + 1), len, mtime)
        }
      }
    }.toSet
    def isReferenced(relDir: String, name: String, len: Long,
                     mtime: Long): Boolean =
      referenced.contains((relDir, name, len, mtime)) ||
        referenced.contains((relDir, name, len, -1L)) // legacy entries
    // sweep one trash dir whose contents logically belong at relDir
    var deleted = 0
    var kept = 0
    def sweep(trash: Path, relDir: String): Unit = {
      val st = try fs.listStatus(trash).toSeq
        catch { case _: java.io.FileNotFoundException => return }
      st.foreach { s =>
        if (s.isDirectory)
          sweep(s.getPath,
            if (relDir.isEmpty) s.getPath.getName
            else s"$relDir/${s.getPath.getName}")
        else if (isReferenced(relDir, s.getPath.getName, s.getLen,
            s.getModificationTime)) kept += 1
        else { fs.delete(s.getPath, false); deleted += 1 }
      }
      if (fs.listStatus(trash).isEmpty) fs.delete(trash, true)
    }
    Seq(".graft-upsert-old", ".graft-compact-old",
        ".graft-retention-old").foreach { suffix =>
      findSuffixed(root, suffix).foreach { t =>
        val logicalLeaf = t.getName.stripPrefix(".").stripSuffix(suffix)
        val rel = fs.makeQualified(root).toUri
          .relativize(fs.makeQualified(t.getParent).toUri)
          .getPath.stripSuffix("/")
        sweep(t, if (rel.isEmpty) logicalLeaf else s"$rel/$logicalLeaf")
      }
    }
    val rootTrash = new Path(root.getParent,
      s".${root.getName}.graft-relayout-old")
    if (fs.exists(rootTrash)) {
      // the relayout trash holds a whole former ROOT — its manifest
      // history subdir is metadata, not data; files under visible
      // subdirs resolve at their in-root relative paths
      fs.listStatus(rootTrash).toSeq.foreach { s =>
        val n = s.getPath.getName
        if (n == DirName) () // shared history, never swept here
        else if (s.isDirectory) sweep(s.getPath, n)
        else if (isReferenced("", n, s.getLen, s.getModificationTime)) kept += 1
        else { fs.delete(s.getPath, false); deleted += 1 }
      }
      if (fs.listStatus(rootTrash).isEmpty) fs.delete(rootTrash, true)
    }
    (dropped.size, deleted, kept)
  }
}
