package graft.sched

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.canon.UrlCanon
import graft.fetch.{Fetcher, SimulatedFetcher}
import graft.model._
import graft.parse.HtmlSpans
import graft.polite.Robots
import graft.seen.{BloomFilter, CuckooFilter}
import graft.store.Snapshots
import graft.synthweb.{SyntheticWeb, WebConfig}

/** Crawl configuration. Defaults are sandbox-scale; every knob is
  * size-parametric so the same code runs a 10^10-URL frontier (bigger
  * bloom, more buckets/salts, higher budgets) without code changes.
  */
final case class CrawlConfig(
    web: WebConfig = WebConfig(),
    outDir: String,
    maxRounds: Int = 64,
    maxAttempts: Int = 3, // retry-unless-404 cap (olx_c226/main.go:188-193)
    salts: Int = 8, // hot-host spread factor for phase-A selection
    nBuckets: Int = 32, // host-hash buckets for filter shards + lineage
    hostCapacity: Double = 8.0, // politeness token bucket capacity
    hostRefill: Double = 8.0, // tokens refilled per scheduling round
    bloomBits: Int = 1 << 21,
    bloomHashes: Int = 5,
    compactEvery: Int = 8, // seen-delta compaction cadence
    simulateLatency: Boolean = false
)

final case class RoundResult(round: Int, selected: Long, fetchedOk: Long,
                             newUrls: Long, frontierLeft: Long, done: Boolean)

/** The Spark-native crawl frontier + fetch scheduler (BASELINE.json
  * north rule). One scheduling round:
  *
  * {{{
  * frontier ──robots gate──▶ eligible ──+budget join──▶
  *   phase A: groupByKey(host_hash, salt).flatMapGroups(bounded top-k)
  *   phase B: groupByKey(host).flatMapGroups(token bucket, final top-k, seq)
  * ──repartition (round-robin)──▶ fetch (mapPartitions, Fetcher)
  * ──▶ parse (HtmlSpans) ─▶ docs / robots / links
  * links ─▶ canonicalize ─▶ reduce by url_hash ─▶ bloom tier ─▶ cuckoo tier
  *       ─▶ exact anti-join vs seen ─▶ exclusion vs frontier+selected
  * commit: frontier', seen Δ, docs, metrics, host_state', robots',
  *         fetch_log, filter shards, bloom — one atomic manifest
  * }}}
  *
  * Determinism: selection order is fully defined by
  * (priority, discovery_time, url_hash) per host and the token-bucket
  * budget, so a parallel run equals the sequential oracle
  * ([[graft.oracle.CrawlOracle]]) on fetch log, seen set and docs.
  *
  * Scale design notes (the parts that survive 1000×):
  *   - phase A bounds memory per task to O(budget) via a bounded heap and
  *     spreads a hot host over `salts` groups (the reference's measured
  *     ~17× facet skew, olx_c226/main.go:20, is the motivating case);
  *     phase B sees ≤ salts×budget rows per host.
  *   - the seen set is never collected: bloom (no shuffle) and sharded
  *     cuckoo tiers discard definite-new candidates cheaply; only
  *     possible-positives reach the exact anti-join (shuffle on the
  *     small survivor set).
  *   - all state tables round-trip through parquet each round, which
  *     truncates lineage (no ever-growing DAG) and is the checkpoint.
  */
final class CrawlScheduler(spark: SparkSession, cfg: CrawlConfig) {
  import spark.implicits._
  import CrawlScheduler._

  private val snaps = new Snapshots(cfg.outDir)

  private def readT[T: Encoder](path: String): Dataset[T] =
    spark.read.schema(implicitly[Encoder[T]].schema).parquet(path).as[T]

  private def readTMulti[T: Encoder](paths: Seq[String]): Dataset[T] =
    if (paths.isEmpty) spark.emptyDataset[T]
    else spark.read.schema(implicitly[Encoder[T]].schema).parquet(paths: _*).as[T]

  // ------------------------------------------------------------------
  // round 0: seed
  // ------------------------------------------------------------------
  def init(): Unit = {
    val seeds = cfg.web.seedUrls.zipWithIndex.map { case (u, i) =>
      Fetcher.entryOf(u, SyntheticWeb.priorityOf(u), i.toLong, 0, 0, cfg.salts)
    }
    val robotsSeeds = seeds.map(_.host).distinct.zipWithIndex.map { case (h, i) =>
      Fetcher.entryOf(s"https://$h/robots.txt", 0, i.toLong, 0, 0, cfg.salts)
    }
    val frontier = (robotsSeeds ++ seeds).distinctBy(_.url_hash)
    val hosts = frontier.map(_.host).distinct
    val hostState = hosts.map(h =>
      HostState(h, UrlCanon.hostHash(h), 0.0, cfg.hostCapacity, cfg.hostRefill))

    frontier.toDS().write.mode("overwrite").parquet(snaps.tablePath(0, "frontier"))
    hostState.toDS().write.mode("overwrite").parquet(snaps.tablePath(0, "host_state"))
    spark.emptyDataset[RobotsRule].write.mode("overwrite").parquet(snaps.tablePath(0, "robots"))
    spark.emptyDataset[SeenEntry].write.mode("overwrite").parquet(snaps.tablePath(0, "seen_delta"))
    snaps.writeBloom(0, new BloomFilter(cfg.bloomBits, cfg.bloomHashes).serialize())
    snaps.writeManifest(Snapshots.Manifest(
      round = 0, parentRound = -1,
      tables = Map(
        "frontier" -> snaps.tablePath(0, "frontier"),
        "host_state" -> snaps.tablePath(0, "host_state"),
        "robots" -> snaps.tablePath(0, "robots")),
      seenDeltaRounds = Seq(0), seenFullRound = -1, buckets = Nil,
      counters = Map("frontier" -> frontier.size.toLong), done = false))
  }

  // ------------------------------------------------------------------
  // one scheduling round
  // ------------------------------------------------------------------
  def runRound(r: Int): RoundResult = {
    val nb = cfg.nBuckets
    val m = snaps.readManifest(r - 1)
    val frontier = readT[FrontierEntry](m.tables("frontier"))
    val robots = readT[RobotsRule](m.tables("robots"))
    val hostState = readT[HostState](m.tables("host_state"))
    val seen = readTMulti[SeenEntry](snaps.seenPaths(m))
    val bloomBc = spark.sparkContext.broadcast(snaps.readBloom(r - 1))
    val filtersBc = spark.sparkContext.broadcast(
      m.buckets.flatMap(b => snaps.readFilter(r - 1, b).map(b -> _)).toMap)

    // -- robots gate ---------------------------------------------------
    val gatedDf = frontier
      .join(robots.withColumnRenamed("host", "r_host"),
            frontier("host") === col("r_host"), "left")
      .withColumn("robots_known", col("r_host").isNotNull)
      .withColumn("path", regexp_replace(col("url"), "^[^:/]+://[^/]*", ""))
      .withColumn(
        "robots_allowed",
        coalesce(not(exists(col("disallow_prefixes"),
                            p => startswith(col("path"), p))), lit(true)))
    val gated = gatedDf.persist(StorageLevel.MEMORY_AND_DISK)
    val blockedCnt = gated
      .filter(col("robots_known") && !col("robots_allowed") && col("priority") =!= 0)
      .count()
    val eligible = gated
      .filter((col("robots_known") && col("robots_allowed")) || col("priority") === 0)
      .select(frontier.columns.map(col): _*).as[FrontierEntry]
    val held = gated
      .filter(!col("robots_known") && col("priority") =!= 0)
      .select(frontier.columns.map(col): _*).as[FrontierEntry]

    // -- politeness budgets (token bucket per host) ---------------------
    val budgets = hostState
      .withColumn("avail", least(col("capacity"), col("tokens") + col("refill_per_round")))
      .select(col("host").as("b_host"), floor(col("avail")).cast("int").as("budget"))
    val withBudget = eligible
      .join(budgets, eligible("host") === col("b_host"), "left")
      .select(struct(frontier.columns.map(col): _*).as("e"),
              coalesce(col("budget"), lit(0)).as("budget"))
      .as[WithBudget]

    // -- phase A: salted pre-selection (bounded heap per (host,salt)) ---
    val phaseA = withBudget
      .groupByKey(x => (x.e.host_hash, x.e.salt))
      .flatMapGroups { (_: (Long, Int), it0: Iterator[WithBudget]) =>
        val it = it0.buffered
        val budget = if (it.hasNext) it.head.budget else 0
        topK(it.map(_.e), budget).map(e => WithBudget(e, budget))
      }

    // -- phase B: per-host token bucket + final deterministic order -----
    val selected = phaseA
      .groupByKey(_.e.host)
      .flatMapGroups { (_: String, it0: Iterator[WithBudget]) =>
        val all = it0.toVector
        val budget = if (all.isEmpty) 0 else all.head.budget
        all.map(_.e).sorted(entryOrd).take(budget).zipWithIndex
          .map { case (e, i) => SelectedE(e, i) }.iterator
      }
      .persist(StorageLevel.MEMORY_AND_DISK)

    // -- fetch (round-robin repartition: politeness already enforced) ---
    val par = spark.sparkContext.defaultParallelism
    val web = cfg.web
    val simLat = cfg.simulateLatency
    val fetched = selected
      .repartition(par)
      .mapPartitions { it =>
        val f = SimulatedFetcher(web, simLat)
        it.map(s => (f.fetch(s.e), s.seq))
      }
      .persist(StorageLevel.MEMORY_AND_DISK)

    // -- parse 200s into the interleaved span model ----------------------
    val pageOuts = fetched
      .filter(_._1.status == 200)
      .mapPartitions { it =>
        it.map { case (fr, seq) =>
          val kind = SyntheticWeb.kindOf(fr.url)
          if (kind == "robots") {
            val rule = Robots.parse(fr.host, fr.body)
            PageOut(fr.url, fr.url_hash, fr.host, UrlCanon.hostHash(fr.host),
                    fr.status, seq, fr.attempt, kind, Nil, Nil,
                    rule.disallow_prefixes)
          } else {
            val p = HtmlSpans.parse(fr.url, fr.body)
            PageOut(fr.url, fr.url_hash, fr.host, UrlCanon.hostHash(fr.host),
                    fr.status, seq, fr.attempt, kind, p.spans, p.links, Nil)
          }
        }
      }
      .persist(StorageLevel.MEMORY_AND_DISK)

    val docs = pageOuts.filter(_.kind != "robots")
      .map(p => Doc(p.url_hash, p.url, p.host, r, p.spans))

    // robots rules learned this round (404 robots => allow-all rule)
    val newRobots = pageOuts.filter(_.kind == "robots")
      .map(p => RobotsRule(p.host, p.robots_prefixes))
      .union(fetched.filter(t => t._1.status == 404 &&
               SyntheticWeb.kindOf(t._1.url) == "robots")
        .map(t => RobotsRule(t._1.host, Nil)))
    val robotsAll = robots.union(newRobots).dropDuplicates("host")

    // -- retries & seen delta -------------------------------------------
    val maxAtt = cfg.maxAttempts
    val salts = cfg.salts
    val retries = fetched
      .filter(t => t._1.status != 200 && t._1.status != 404 && t._1.attempt + 1 <= maxAtt)
      .map { case (fr, _) =>
        FrontierEntry(fr.url, fr.url_hash, fr.host, UrlCanon.hostHash(fr.host),
                      UrlCanon.saltOf(fr.url_hash, salts), fr.priority,
                      fr.discovery_time, fr.attempt + 1, r)
      }
    val seenDelta = fetched
      .filter(t => t._1.status == 200 || t._1.status == 404 ||
        (t._1.status != 200 && t._1.status != 404 && t._1.attempt + 1 > maxAtt))
      .map { case (fr, _) =>
        val st = if (fr.status == 200 || fr.status == 404) fr.status else 599
        SeenEntry(fr.url_hash, UrlCanon.hostHash(fr.host), st, r)
      }
      .persist(StorageLevel.MEMORY_AND_DISK)

    // -- new candidates from discovered links ---------------------------
    val candRaw = pageOuts.flatMap { p =>
      p.links.zipWithIndex.map { case (u, i) =>
        val canon = UrlCanon.canonicalize(u)
        Fetcher.entryOf(canon, SyntheticWeb.priorityOf(canon),
                        r.toLong * 1000000L + i, 0, r, salts)
      }
    }
    // one row per url_hash, deterministic min by (priority, discovery_time)
    val candDedup = candRaw
      .groupByKey(_.url_hash)
      .reduceGroups((a, b) => if (entryOrd.lteq(a, b)) a else b)
      .map(_._2)

    // tier 1: broadcast bloom — misses are definitely new
    val nBuckets = cfg.nBuckets
    val tiered = candDedup.mapPartitions { it =>
      val bf = bloomBc.value.map(BloomFilter.deserialize)
      it.map(c => (c, bf.exists(_.mightContain(c.url_hash))))
    }
    val defNew = tiered.filter(!_._2).map(_._1)
    // tier 2: sharded cuckoo — shuffle only possible-positives
    val maybe = tiered.filter(_._2).map(_._1)
    val cuckooChecked = maybe
      .groupByKey(c => bucketOf(c.host_hash, nb))
      .flatMapGroups { (b: Int, it: Iterator[FrontierEntry]) =>
        val cf = filtersBc.value.get(b).map(CuckooFilter.deserialize)
        it.map(c => (c, cf.forall(_.mightContain(c.url_hash))))
      }
    val cuckooNew = cuckooChecked.filter(!_._2).map(_._1)
    // tier 3: exact reconciliation against the persisted seen table
    val stillMaybe = cuckooChecked.filter(_._2).map(_._1)
    val exactNew = stillMaybe
      .join(seen.select(col("url_hash").as("s_hash")),
            col("url_hash") === col("s_hash"), "left_anti")
      .as[FrontierEntry]
    val candSeenFree = defNew.union(cuckooNew).union(exactNew)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // robots.txt entries for newly-discovered hosts
    val knownRobotsHosts = robotsAll.select(col("host")).distinct()
    val newHosts = candSeenFree.select(col("host")).distinct()
      .join(knownRobotsHosts.withColumnRenamed("host", "k_host"),
            col("host") === col("k_host"), "left_anti")
      .as[String].collect().sorted
    val robotsCand = newHosts.zipWithIndex.map { case (h, i) =>
      Fetcher.entryOf(s"https://$h/robots.txt", 0, r.toLong * 1000000L + i, 0, r, salts)
    }.toSeq
    val robotsCandDs = robotsCand.toDS()
      .join(seen.select(col("url_hash").as("s_hash")),
            col("url_hash") === col("s_hash"), "left_anti").as[FrontierEntry]

    // exclusion: not already in the remaining frontier, not fetched now
    val remainingFrontier = held.union(
      eligible.join(selected.select(col("e.url_hash").as("sel_hash")),
                    col("url_hash") === col("sel_hash"), "left_anti")
        .as[FrontierEntry])
    val newCand = candSeenFree.union(robotsCandDs)
      .join(remainingFrontier.select(col("url_hash").as("f_hash")),
            col("url_hash") === col("f_hash"), "left_anti").as[FrontierEntry]
      .join(selected.select(col("e.url_hash").as("sel_hash")),
            col("url_hash") === col("sel_hash"), "left_anti").as[FrontierEntry]

    val newFrontier = remainingFrontier.union(retries).union(newCand)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // -- host state update ----------------------------------------------
    val selCounts = selected.groupBy(col("e.host").as("c_host")).count()
    val hostStateUpd = hostState
      .join(selCounts, col("host") === col("c_host"), "left")
      .withColumn("tokens",
        least(col("capacity"), col("tokens") + col("refill_per_round"))
          - coalesce(col("count"), lit(0)).cast("double"))
      .select(col("host"), col("host_hash"), col("tokens"), col("capacity"),
              col("refill_per_round")).as[HostState]
    val capD = cfg.hostCapacity
    val refD = cfg.hostRefill
    val newHostRows = newFrontier.map(_.host).distinct()
      .join(hostState.select(col("host").as("h_host")),
            col("value") === col("h_host"), "left_anti")
      .as[String]
      .map(h => HostState(h, UrlCanon.hostHash(h), 0.0, capD, refD))
    val hostStateAll = hostStateUpd.union(newHostRows)

    // -- fetch log --------------------------------------------------------
    val fetchLog = fetched.map { case (fr, seq) =>
      FetchLogEntry(r, fr.host, UrlCanon.hostHash(fr.host), seq, fr.url,
                    fr.url_hash, fr.status)
    }

    // -- metrics per host bucket (per-partition lineage) ------------------
    val metrics = fetched
      .map { case (fr, _) => (bucketOf(UrlCanon.hostHash(fr.host), nb), fr.status) }
      .toDF("bucket", "status")
      .groupBy("bucket")
      .agg(count(lit(1)).as("selected"),
           sum(when(col("status") === 200, 1L).otherwise(0L)).as("fetched_ok"),
           sum(when(col("status") === 404, 1L).otherwise(0L)).as("fetched_404"),
           sum(when(col("status") =!= 200 && col("status") =!= 404, 1L)
             .otherwise(0L)).as("fetched_retryable"))

    // -- commit ----------------------------------------------------------
    docs.write.mode("overwrite").parquet(snaps.tablePath(r, "docs"))
    seenDelta.toDF().write.mode("overwrite").parquet(snaps.tablePath(r, "seen_delta"))
    newFrontier.write.mode("overwrite").parquet(snaps.tablePath(r, "frontier"))
    robotsAll.write.mode("overwrite").parquet(snaps.tablePath(r, "robots"))
    hostStateAll.write.mode("overwrite").parquet(snaps.tablePath(r, "host_state"))
    fetchLog.toDF().write.mode("overwrite").parquet(snaps.tablePath(r, "fetch_log"))
    metrics.withColumn("round", lit(r)).write.mode("overwrite")
      .parquet(snaps.tablePath(r, "metrics"))

    // filter shards: incremental insert; overflowed buckets rebuilt from
    // the exact seen table (rare; scales as O(delta) normally)
    val updates = seenDelta
      .groupByKey(s => bucketOf(s.host_hash, nb))
      .mapGroups { (b: Int, it: Iterator[SeenEntry]) =>
        val cf = filtersBc.value.get(b).map(CuckooFilter.deserialize)
          .getOrElse(CuckooFilter.sized(4096))
        var ok = true
        it.foreach(s => ok &= cf.put(s.url_hash))
        (b, cf.serialize(), ok)
      }.collect()
    val failedBuckets = updates.filter(!_._3).map(_._1).toSet
    val rebuilt: Map[Int, Array[Byte]] =
      if (failedBuckets.isEmpty) Map.empty
      else {
        val seenAll = readTMulti[SeenEntry](
          snaps.seenPaths(m) :+ snaps.tablePath(r, "seen_delta"))
        seenAll.filter(s => failedBuckets.contains(bucketOf(s.host_hash, nb)))
          .groupByKey(s => bucketOf(s.host_hash, nb))
          .mapGroups { (b: Int, it: Iterator[SeenEntry]) =>
            val hashes = it.map(_.url_hash).toArray
            val cf = CuckooFilter.sized(hashes.length.toLong * 2)
            hashes.foreach(cf.put)
            (b, cf.serialize())
          }.collect().toMap
      }
    val prevBuckets = m.buckets.toSet
    val touched = updates.map(u => u._1 -> rebuilt.getOrElse(u._1, u._2)).toMap
    // carry forward untouched shards (hard-link-free: rewrite pointer via copy)
    val allBuckets = (prevBuckets ++ touched.keySet).toSeq.sorted
    allBuckets.foreach { b =>
      val bytes = touched.getOrElse(b, snaps.readFilter(r - 1, b).get)
      snaps.writeFilter(r, b, bytes)
    }
    // bloom: merge this round's delta into the previous snapshot
    val bloomDelta = seenDelta.map(_.url_hash)
      .select(BloomFilter.agg(cfg.bloomBits, cfg.bloomHashes).toColumn)
      .head()
    val bloomPrev = snaps.readBloom(r - 1).map(BloomFilter.deserialize)
      .getOrElse(new BloomFilter(cfg.bloomBits, cfg.bloomHashes))
    snaps.writeBloom(r, bloomPrev.merge(BloomFilter.deserialize(bloomDelta)).serialize())

    // seen compaction
    val deltaRounds = m.seenDeltaRounds :+ r
    val (seenFullRound, seenDeltaRounds) =
      if (deltaRounds.size >= cfg.compactEvery) {
        val all = readTMulti[SeenEntry](snaps.seenPaths(m) :+ snaps.tablePath(r, "seen_delta"))
        all.write.mode("overwrite").parquet(snaps.tablePath(r, "seen_full"))
        (r, Seq.empty[Int])
      } else (m.seenFullRound, deltaRounds)

    val selectedCnt = selected.count()
    val okCnt = pageOuts.count()
    val newCnt = newCand.count()
    val frontierLeft = newFrontier.count()
    val spansCnt =
      docs.select(coalesce(sum(size(col("spans"))), lit(0L))).as[Long].head()

    snaps.writeManifest(Snapshots.Manifest(
      round = r, parentRound = r - 1,
      tables = Map(
        "frontier" -> snaps.tablePath(r, "frontier"),
        "host_state" -> snaps.tablePath(r, "host_state"),
        "robots" -> snaps.tablePath(r, "robots")),
      seenDeltaRounds = seenDeltaRounds, seenFullRound = seenFullRound,
      buckets = allBuckets,
      counters = Map(
        "selected" -> selectedCnt, "fetched_ok" -> okCnt,
        "robots_blocked" -> blockedCnt, "new_urls" -> newCnt,
        "frontier" -> frontierLeft, "spans" -> spansCnt),
      done = frontierLeft == 0))

    Seq(gated, selected, fetched, pageOuts, seenDelta, candSeenFree, newFrontier)
      .foreach(_.unpersist(false))
    bloomBc.destroy(); filtersBc.destroy()

    RoundResult(r, selectedCnt, okCnt, newCnt, frontierLeft, frontierLeft == 0)
  }

  /** Run from scratch (or resume if a manifest exists) until the frontier
    * drains or maxRounds. Returns the last round executed.
    */
  def run(): Int = {
    val start = snaps.latestRound match {
      case Some(rr) if !snaps.readManifest(rr).done => rr + 1
      case Some(rr)                                 => return rr
      case None                                     => init(); 1
    }
    var r = start
    var done = false
    while (!done && r <= cfg.maxRounds) {
      val res = runRound(r)
      done = res.done
      r += 1
    }
    r - 1
  }
}

object CrawlScheduler {
  final case class WithBudget(e: FrontierEntry, budget: Int)
  final case class SelectedE(e: FrontierEntry, seq: Int)
  final case class PageOut(url: String, url_hash: String, host: String,
                           host_hash: Long, status: Int, seq: Int,
                           attempt: Int, kind: String, spans: Seq[Span],
                           links: Seq[String], robots_prefixes: Seq[String])

  val entryOrd: Ordering[FrontierEntry] =
    Ordering.by((e: FrontierEntry) => (e.priority, e.discovery_time, e.url_hash))

  def bucketOf(hostHash: Long, nBuckets: Int): Int =
    (((hostHash % nBuckets) + nBuckets) % nBuckets).toInt

  /** Bounded top-k: O(n log k) time, O(k) memory — a hot host's phase-A
    * group never materializes in task memory.
    */
  def topK(it: Iterator[FrontierEntry], k: Int): Iterator[FrontierEntry] = {
    if (k <= 0) return Iterator.empty
    val heap = mutable.PriorityQueue.empty[FrontierEntry](entryOrd) // max at head
    it.foreach { e =>
      if (heap.size < k) heap.enqueue(e)
      else if (entryOrd.lt(e, heap.head)) { heap.dequeue(); heap.enqueue(e) }
    }
    heap.dequeueAll.reverseIterator
  }
}
