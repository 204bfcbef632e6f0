package graft.ops

/** Per-round slot commit protocol shared by the incremental index
  * maintainers ([[IncrementalLsh]], [[IncrementalAnn]]).
  *
  * An incremental index is a set of parallel append-only parquet tables
  * under one directory, each holding one `r<k>` subdirectory per ingest
  * round. A round is COMMITTED only when every table's slot carries the
  * `_SUCCESS` marker the Hadoop commit protocol writes after all task
  * files are finalized — bare directory existence is not commit
  * evidence (a crash DURING a write leaves the subdir present but
  * partial, e.g. only `_temporary`). Readers take only rounds committed
  * in ALL tables; a retried append lands in the first uncommitted slot
  * with overwrite semantics, so a death between or during the writes is
  * invisible: never served half, never duplicated.
  *
  * A second, coarser layer bounds the SLOT count: tables live inside a
  * generation directory `g<j>`, and [[compactTables]] folds all
  * complete rounds into `g<j+1>/…/r0` (marker-committed, old
  * generation serves until the marker lands) — the same LSM fold the
  * crawl's seen state performs, without which a per-ingest-round index
  * accumulates parquet directories forever.
  */
private[graft] object RoundSlots {

  /** Committed round indices under `dir` (slots `r0`, `r1`, ...,
    * `_SUCCESS`-gated). A name must be `r` + at least one digit — a
    * bare "r" is junk, not a slot. Delegates to [[committedIdxs]] —
    * the ONE marker-gated scan — so a fix there reaches this listing
    * too (this was a byte-identical copy before).
    */
  def roundIdxs(dir: String): Set[Int] =
    committedIdxs(dir, "r", "_SUCCESS").toSet

  /** Rounds committed in EVERY one of `dirs`, ascending. */
  def completeRounds(dirs: Seq[String]): Seq[Int] =
    dirs.map(roundIdxs).reduceLeft(_ intersect _).toSeq.sorted

  // ------------------------------------------------------------------
  // generations: the compaction layer over round slots
  // ------------------------------------------------------------------
  //
  // Without compaction an incremental index accumulates one r<k> slot
  // per ingest round FOREVER — at 100 TB cadence that is thousands of
  // parquet directories whose listing/footer overhead grows per round
  // (the data volume is the same; the file count is not). The fix
  // mirrors the crawl's seen-state LSM fold and IvfIndex's epochs: all
  // complete rounds fold into slot r0 of a NEW generation directory
  // `g<j+1>`, committed by a marker file written LAST — readers resolve
  // the highest committed generation per call, so the switch is atomic
  // and a compaction that dies mid-write leaves the old generation
  // fully serving (the dangling g<j+1> is overwritten on retry).
  private val CommitMarker = "_COMMITTED"

  /** Committed indices of `prefix`-numbered children of `dir` (dirs
    * `<prefix>0`, `<prefix>1`, ...), gated on `marker` — a path
    * RELATIVE to each child whose existence is the commit evidence.
    * One implementation of the marker-gated listing shared by the
    * generation layer (`g<j>` / `_COMMITTED`) and IvfIndex's epochs
    * (`e<j>` / `centroids/_SUCCESS`), so a fix to either scan cannot
    * silently miss the other.
    */
  def committedIdxs(dir: String, prefix: String, marker: String): Seq[Int] = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(p)) Seq.empty
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      val s = java.nio.file.Files.list(p)
      try s.forEach { c =>
        val n = c.getFileName.toString
        if (n.startsWith(prefix) && n.length > prefix.length
            && n.drop(prefix.length).forall(_.isDigit)
            && java.nio.file.Files.exists(c.resolve(marker)))
          out += n.drop(prefix.length).toInt
      } finally s.close()
      out.toSeq.sorted
    }
  }

  /** Delete `prefix`-numbered children of `dir` with index below
    * `keepFrom`, committed or not (a superseded or dangling write).
    * The shared reverse-walk delete of the GC paths.
    */
  def gcBelow(dir: String, prefix: String, keepFrom: Int): Unit = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(p)) return
    val olds = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
    val ls = java.nio.file.Files.list(p)
    try ls.forEach { c =>
      val n = c.getFileName.toString
      if (n.startsWith(prefix) && n.length > prefix.length
          && n.drop(prefix.length).forall(_.isDigit)
          && n.drop(prefix.length).toInt < keepFrom)
        olds += c
    } finally ls.close()
    olds.foreach { root =>
      val s = java.nio.file.Files.walk(root)
      try {
        s.sorted(java.util.Comparator.reverseOrder())
          .forEach(q => java.nio.file.Files.deleteIfExists(q))
      } finally s.close()
    }
  }

  /** Committed generation indices under `indexDir` (dirs `g0`, `g1`,
    * ..., gated on the marker file written after every table fold).
    */
  def genIdxs(indexDir: String): Seq[Int] =
    committedIdxs(indexDir, "g", CommitMarker)

  /** Active (highest committed) generation, or 0 when the index is
    * empty/fresh — generation 0 needs no marker: an empty index serves
    * empty reads, and its first round append makes it real.
    */
  def activeGen(indexDir: String): Int = genIdxs(indexDir).lastOption.getOrElse(0)

  def genDir(indexDir: String, j: Int): String = s"$indexDir/g$j"

  /** Commit generation `j`: marker written LAST, atomically via create
    * (all table folds must already be on disk with their `_SUCCESS`).
    */
  def commitGen(indexDir: String, j: Int): Unit = {
    val d = java.nio.file.Paths.get(genDir(indexDir, j))
    java.nio.file.Files.createDirectories(d)
    try java.nio.file.Files.createFile(d.resolve(CommitMarker))
    catch { case _: java.nio.file.FileAlreadyExistsException => () }
  }

  /** Fold every complete round of the active generation's `tables` into
    * slot r0 of generation j+1 and commit it (marker last). No-op below
    * 2 complete rounds. Returns whether a fold happened. The fold is
    * the LSM move: data volume unchanged, slot/file count reset to 1 —
    * without it a per-ingest-round index accumulates directories
    * forever and pays growing listing/footer overhead per read.
    */
  def compactTables(spark: org.apache.spark.sql.SparkSession,
                    indexDir: String, tables: Seq[String]): Boolean = {
    val j = activeGen(indexDir)
    val rounds = completeRounds(tables.map(t => s"${genDir(indexDir, j)}/$t"))
    if (rounds.size <= 1) false
    else {
      tables.foreach { t =>
        spark.read.parquet(rounds.map(k => s"${genDir(indexDir, j)}/$t/r$k"): _*)
          .write.mode("overwrite")
          .parquet(s"${genDir(indexDir, j + 1)}/$t/r0")
      }
      commitGen(indexDir, j + 1)
      true
    }
  }

  /** Delete generations below the active one (safe once no reader holds
    * an open scan over them — callers schedule this between rounds).
    * Deletes ANY g<i> below the active, committed or not — generation 0
    * never carries a marker (activeGen defaults to it), and an
    * uncommitted g<i> below the active is a dead dangling write.
    */
  def gcOldGenerations(indexDir: String): Unit =
    gcBelow(indexDir, "g", activeGen(indexDir))
}
