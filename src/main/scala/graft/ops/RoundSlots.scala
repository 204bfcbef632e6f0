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
  */
private[graft] object RoundSlots {

  /** Committed round indices under `dir` (slots `r0`, `r1`, ...,
    * `_SUCCESS`-gated). A name must be `r` + at least one digit — a
    * bare "r" is junk, not a slot.
    */
  def roundIdxs(dir: String): Set[Int] = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(p)) Set.empty
    else {
      val out = scala.collection.mutable.Set.empty[Int]
      val s = java.nio.file.Files.list(p)
      try s.forEach { c =>
        val n = c.getFileName.toString
        if (n.startsWith("r") && n.length > 1 && n.drop(1).forall(_.isDigit)
            && java.nio.file.Files.exists(c.resolve("_SUCCESS")))
          out += n.drop(1).toInt
      } finally s.close()
      out.toSet
    }
  }

  /** Rounds committed in EVERY one of `dirs`, ascending. */
  def completeRounds(dirs: Seq[String]): Seq[Int] =
    dirs.map(roundIdxs).reduceLeft(_ intersect _).toSeq.sorted
}
