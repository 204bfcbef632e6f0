package graft.sched

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoder, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.canon.UrlCanon
import graft.fetch.{Fetcher, FetcherFactory, SimulatedFetcherFactory}
import graft.model._
import graft.parse.HtmlSpans
import graft.polite.Robots
import graft.seen.{BloomFilter, CuckooFilter, SeenIndex}
import graft.store.{FrontierStore, Snapshots}
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
    frontierBuckets: Int = 32, // url-hash buckets for frontier storage
    hostCapacity: Double = 8.0, // politeness token bucket capacity
    hostRefill: Double = 8.0, // tokens refilled per scheduling round
    bloomBits: Int = 1 << 21, // TOTAL bloom bits (sharded across buckets)
    bloomHashes: Int = 5,
    compactEvery: Int = 8, // LSM cadence (seen delta window + index/frontier segment merge)
    simulateLatency: Boolean = false,
    // opt-in rank-informed frontier priority: round k's cumulative link
    // graph feeds round k+1's sort key (deterministic integer PageRank —
    // see the candRanked step); off by default (discovery-order crawl)
    rankPriority: Boolean = false,
    rankIters: Int = 4, // damped PR iterations per round when enabled
    // transport plug point (ST4): the default crawls the deterministic
    // synthetic web in-process; HttpFetcherFactory swaps in real HTTP
    // against a loopback SynthWebServer gateway — same fetch log
    // bit-for-bit (RealTransportSpec)
    fetcher: FetcherFactory = SimulatedFetcherFactory,
    // broadcast the per-HOST dimension tables (robots rules, politeness
    // budgets, per-round selection counts) into the frontier-sized
    // joins while the manifest's host count stays below this bound —
    // host tables are O(hosts), frontier/candidate tables are O(URLs),
    // and hosts ~ URLs/10^3 on the web, so up to ~10^6 hosts the rule
    // table is an executor-cache-sized build side and every gate join
    // stays map-side. Above the bound (or when a resumed manifest
    // predates the counter) the joins fall back to shuffles — the
    // results are identical either way, only the exchange count moves.
    hostBroadcastMax: Long = 1000000L
) {
  /** Per-bucket bloom shard size; constant across rounds so shards stay
    * mergeable/incrementable.
    */
  def bloomShardBits: Int = math.max(1 << 14, bloomBits / nBuckets)
}

final case class RoundResult(round: Int, selected: Long, fetchedOk: Long,
                             newUrls: Long, frontierLeft: Long, done: Boolean)

/** The Spark-native crawl frontier + fetch scheduler (BASELINE.json
  * north rule). One scheduling round:
  *
  * {{{
  * frontier ──robots gate──▶ eligible ──+budget join──▶
  *   phase A: groupByKey(host_hash, salt).flatMapGroups(bounded top-k)
  *   phase B: groupByKey(host).flatMapGroups(token bucket, final top-k, seq)
  * ──repartition (round-robin)──▶ fetch+parse (one mapPartitions:
  *   Fetcher, then HtmlSpans/Robots on the body IN the fetch task —
  *   raw HTML never persists) ─▶ docs / robots / links
  * links ─▶ canonicalize ─▶ reduce by url_hash ─▶ bloom-shard tier
  *       ─▶ one bucket-keyed pass: cuckoo-shard tier ─▶ exact
  *          per-bucket seen-index LSM segments (SeenIndex — the
  *          10^10-row seen table never shuffles)
  * frontier update: delta rows (fetched/blocked/selected hashes,
  *          retries, surviving candidates) ─▶ one task per touched
  *          url_hash bucket ─▶ exact exclusion + bucket-file rewrite
  * commit: frontier bucket files, seen Δ, docs, metrics, host_state',
  *         robots', fetch_log, filter shards — one atomic manifest
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
  *   - the seen set is never collected: per-bucket bloom shards (checked
  *     map-side, no shuffle, loaded lazily per executor from the
  *     snapshot store via [[FilterShardCache]]) and sharded cuckoo
  *     filters discard definite-new candidates cheaply; only
  *     possible-positives reach the exact per-bucket seen index, loaded
  *     the same way — the seen TABLE itself is storage-only state (it
  *     feeds compaction, rebuilds and audits) and never crosses a
  *     shuffle during a round. Shards are keyed
  *     by host_hash bucket — at 10^10 URLs no filter bytes ever move
  *     through the driver or a whole-map broadcast: each task reads
  *     exactly the bucket shards it touches, and shard maintenance
  *     writes each updated bucket's files from the executor that owns
  *     the group. Untouched buckets stay referenced at their
  *     last-written round in the manifest (no copy-forward).
  *   - driver-side fixed cost per round is capped: all per-round
  *     counters ride as `Observation` metrics on the commit writes
  *     (zero extra jobs); the independent commit writes of one round
  *     run as concurrent Spark jobs so the round's fixed cost is the
  *     longest single write, not the sum. Fat rounds amortize the
  *     remaining constant — the same argument that makes round
  *     scheduling viable on a 1000-executor cluster.
  *   - a round whose frontier holds no robots.txt entries (tracked in
  *     the manifest counters) skips the robots-prefetch sub-step's jobs
  *     entirely — in steady state only discovery rounds pay it.
  *   - all state tables round-trip through storage each round, which
  *     truncates lineage (no ever-growing DAG) and is the checkpoint.
  *   - the frontier is hash-bucketed by url_hash into binary LSM
  *     segment stacks ([[graft.store.FrontierStore]], manifest-tracked
  *     like the seen-index segments). Candidate exclusion is NOT a
  *     join: removals (fetched/blocked/selected hashes) and additions
  *     (retries, tier-surviving candidates) shuffle — delta-sized rows
  *     only — to one update task per touched bucket, which streams its
  *     bucket's merged segment view, applies the delta with exact set
  *     semantics, and appends ONE delta segment (entries + tombstones);
  *     segments compact to a full base on the compactEvery cadence.
  *     The frontier itself never crosses a shuffle, and the per-round
  *     WRITE is O(|delta|) records, not O(touched-bucket size): at a
  *     10^10-entry frontier a drain-phase round writes only the
  *     handful of records its deltas produce.
  *   - the seen table is a two-level parquet LSM: per-round deltas fold
  *     into a level-1 run every `compactEvery` rounds (O(window delta)),
  *     runs fold into the seen_full base only every compactEvery² rounds
  *     (amortized O(|seen|/compactEvery²) per round), deduplicating by
  *     url_hash (latest round wins) so revocation rounds cannot leave
  *     duplicate rows. The per-bucket exact indexes are LSM too: each
  *     round appends a delta-only segment; segments merge on the same
  *     cadence — per-round index maintenance writes O(|delta|) bytes,
  *     not O(|seen|).
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

    // frontier: per-bucket binary files (driver-side here — seed lists
    // are small by definition; per-round updates are executor-side)
    val byFb = frontier.groupBy(e => fbucketOf(e.url_hash, cfg.frontierBuckets))
    byFb.foreach { case (fb, es) =>
      FrontierStore.write(cfg.outDir, 0, fb, es.toArray)
    }
    hostState.toDS().write.mode("overwrite").parquet(snaps.tablePath(0, "host_state"))
    spark.emptyDataset[RobotsRule].write.mode("overwrite").parquet(snaps.tablePath(0, "robots"))
    spark.emptyDataset[SeenEntry].write.mode("overwrite").parquet(snaps.tablePath(0, "seen_delta"))
    snaps.writeManifest(Snapshots.Manifest(
      round = 0, parentRound = -1,
      tables = Map(
        "host_state" -> snaps.tablePath(0, "host_state"),
        "robots" -> snaps.tablePath(0, "robots")),
      seenDeltaRounds = Seq(0), seenRunRounds = Nil, seenFullRound = -1,
      filterRounds = Map.empty, seenIndexSegs = Map.empty,
      frontierSegs = byFb.keys.map(_ -> Seq(0)).toMap,
      frontierCounts = byFb.map { case (fb, es) => fb -> es.size.toLong },
      frontierPri0 = byFb.map { case (fb, es) =>
        fb -> es.count(_.priority == 0).toLong },
      counters = Map(
        "frontier" -> frontier.size.toLong,
        "frontier_pri0" -> frontier.count(_.priority == 0).toLong,
        "hosts" -> hostState.size.toLong,
        "cfg_n_buckets" -> cfg.nBuckets.toLong,
        "cfg_frontier_buckets" -> cfg.frontierBuckets.toLong),
      done = false))
  }

  /** Structural-config guard: the bucket counts are baked into every
    * shard/index/frontier file's key space — resuming a checkpoint with
    * different values would route deltas to the wrong buckets (silent
    * dedup loss and frontier corruption). Fail fast instead.
    */
  private def requireStructuralConfig(m: Snapshots.Manifest): Unit = {
    def chk(key: String, want: Long): Unit =
      m.counters.get(key).foreach { have =>
        if (have != want)
          throw new IllegalStateException(
            s"checkpoint was written with $key=$have but this config has " +
              s"$want — bucket layouts are incompatible; resume with the " +
              "original value")
      }
    chk("cfg_n_buckets", cfg.nBuckets.toLong)
    chk("cfg_frontier_buckets", cfg.frontierBuckets.toLong)
  }

  // ------------------------------------------------------------------
  // one scheduling round
  // ------------------------------------------------------------------
  def runRound(r: Int): RoundResult = {
    val nb = cfg.nBuckets
    val nFb = cfg.frontierBuckets
    val m = snaps.readManifest(r - 1)
    requireStructuralConfig(m)
    // state-table write parallelism: sized from last round's row counts
    // (manifest lineage), NOT from core count — a 32-core session must
    // not write 32 tiny files per round and re-read them as 32 tasks,
    // nor funnel a fat round's docs through one task. ~4k rows/file
    // (docs rows carry span arrays, so this is ~10-20 MB files).
    val statePar = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      m.counters.getOrElse("frontier", 64L) / 4096L + 1L)).toInt
    val root = cfg.outDir
    // frontier: distributed read of the per-bucket binary files the
    // manifest references (one flatMap per bucket, executor-side,
    // fail-closed — see FrontierStore). Persisted for the duration of
    // the round (it has two consumers: the robots prefetch and the
    // gate): executors keep their slice in memory or local disk instead
    // of re-deserializing every bucket from shared storage, then drop
    // it at commit — the frontier still never lives past its round.
    val frontierSegs = m.frontierSegs
    val frontier: Dataset[FrontierEntry] = spark
      .createDataset(spark.sparkContext.parallelize(
        frontierSegs.toSeq.sortBy(_._1),
        math.min(frontierSegs.size.max(1),
                 spark.sparkContext.defaultParallelism)))
      .flatMap { case (fb, segs) =>
        // streamed k-way newest-wins merge of the bucket's LSM segment
        // stack, O(#segments) buffered heads
        FrontierStore.iterateMergedRequired(root, fb, segs)
      }
      .persist(StorageLevel.MEMORY_AND_DISK)
    val robots = readT[RobotsRule](m.tables("robots"))
    val hostState = readT[HostState](m.tables("host_state"))
    // per-host dimension tables ride map-side while the host count is
    // provably small (see CrawlConfig.hostBroadcastMax); an absent
    // counter (pre-counter checkpoint) conservatively keeps shuffles
    val bcastHosts = m.counters.get("hosts").exists(_ <= cfg.hostBroadcastMax)
    def hostDim(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      if (bcastHosts) broadcast(df) else df
    // shard locations: bucket -> round whose files are current. Tasks
    // read exactly the bucket shards they touch from the snapshot store;
    // no filter bytes move through the driver or a broadcast.
    val filterRounds = m.filterRounds

    // -- robots prefetch sub-step ----------------------------------------
    // priority-0 (robots.txt) entries are fetched unconditionally at the
    // start of the round: a host becomes crawlable the same round it is
    // discovered, and robots fetches are budget-exempt (at most one tiny
    // fetch per host — standard crawler practice). They log at seq 0;
    // budgeted fetches start at seq 1. Rounds whose frontier provably
    // holds no priority-0 entries (manifest counter) skip the sub-step's
    // jobs entirely — a pure no-op elision, identical results.
    val par = spark.sparkContext.defaultParallelism
    val web = cfg.web
    val simLat = cfg.simulateLatency
    val mkFetcher = cfg.fetcher // small factory in the closure, not a client
    val maxAtt = cfg.maxAttempts
    val hasPri0 = !m.counters.get("frontier_pri0").contains(0L)
    // fetch stages are FUSED with parsing: the page body is turned into
    // spans/links (content) or disallow prefixes (robots.txt) inside
    // the same task that fetched it, and only the slim FetchOut row is
    // ever persisted. Raw HTML never enters a round cache — at a 10^7-
    // page round the body cache alone exceeded executor storage and
    // pushed the round into spill I/O (measured: ~1.9x per-page cost at
    // 9M pages vs 1M before this fusion).
    val robotsFetchedOpt =
      if (!hasPri0) None
      else Some(frontier.filter(col("priority") === 0).as[FrontierEntry]
        .repartition(par)
        .mapPartitions { it =>
          val f = mkFetcher.create(web, simLat)
          it.map { e =>
            val fr = f.fetch(e)
            val pre =
              if (fr.status == 200) Robots.parse(fr.host, fr.body).disallow_prefixes
              else Nil
            FetchOut(fr.url, fr.url_hash, fr.host, UrlCanon.hostHash(fr.host),
                     fr.status, 0, fr.attempt, fr.priority, fr.discovery_time,
                     "robots", Nil, Nil, pre)
          }
        }
        .persist(StorageLevel.MEMORY_AND_DISK))
    val rest =
      if (hasPri0) frontier.filter(col("priority") =!= 0).as[FrontierEntry]
      else frontier

    // rules learned from this round's robots fetches: 200 => parsed
    // (inline in the fetch task); 404 or retry-exhausted => allow-all
    // (colly's permissive default)
    val robotsAll = (robotsFetchedOpt match {
      case None => robots
      case Some(robotsFetched) =>
        val newRobots = robotsFetched.mapPartitions { it =>
          it.flatMap { o =>
            if (o.status == 200)
              Iterator.single(RobotsRule(o.host, o.robots_prefixes))
            else if (o.status == 404 || o.attempt + 1 > maxAtt)
              Iterator.single(RobotsRule(o.host, Nil))
            else Iterator.empty
          }
        }
        // first-fetch-wins, DETERMINISTICALLY: a host already holding a
        // rule keeps it (the sequential oracle's `if (!robots.contains)`
        // update). dropDuplicates("host") here would keep an arbitrary
        // row whenever a re-fetched robots.txt (revoke-reseed) collides
        // with the stored rule — partition-order nondeterminism on the
        // one table that gates every fetch. Refreshing a stale rule is
        // an administrative revocation concern, not a crawl-round one.
        robots.union(
          newRobots.join(robots.select(col("host").as("o_host")),
                         newRobots("host") === col("o_host"), "left_anti")
            .as[RobotsRule])
    }).persist(StorageLevel.MEMORY_AND_DISK)

    // -- robots gate (non-robots frontier, with this round's rules) ------
    val gatedDf = rest
      .join(hostDim(robotsAll.withColumnRenamed("host", "r_host")),
            rest("host") === col("r_host"), "left")
      .withColumn("robots_known", col("r_host").isNotNull)
      .withColumn("path", regexp_replace(col("url"), "^[^:/]+://[^/]*", ""))
      .withColumn(
        "robots_allowed",
        coalesce(not(exists(col("disallow_prefixes"),
                            p => startswith(col("path"), p))), lit(true)))
    val gated = gatedDf.persist(StorageLevel.MEMORY_AND_DISK)
    // (blocked count is derived algebraically from the write-side
    // Observation metrics below — no standalone job)
    val eligible = gated
      .filter(col("robots_known") && col("robots_allowed"))
      .select(frontier.columns.map(col): _*).as[FrontierEntry]
    // robots-disallowed rows leave the frontier this round (and their
    // hashes must stay OUT of the candidate-exclusion membership set, so
    // a re-discovered blocked URL re-enters — same semantics as the old
    // anti-join against the post-gate remaining frontier)
    val blockedHashes = gated
      .filter(col("robots_known") && !col("robots_allowed"))
      .select(col("url_hash")).as[String]

    // -- politeness budgets (token bucket per host) ---------------------
    val budgets = hostState
      .withColumn("avail", least(col("capacity"), col("tokens") + col("refill_per_round")))
      .select(col("host").as("b_host"), floor(col("avail")).cast("int").as("budget"))
    val withBudget = eligible
      .join(hostDim(budgets), eligible("host") === col("b_host"), "left")
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
          .map { case (e, i) => SelectedE(e, i + 1) }.iterator
      }
      .persist(StorageLevel.MEMORY_AND_DISK)

    // -- fetch+parse (round-robin repartition: politeness already
    // enforced; the body is parsed to spans/links in the fetch task and
    // dropped — see the fusion note at the robots prefetch) -------------
    val mainFetched = selected
      .repartition(par)
      .mapPartitions { it =>
        val f = mkFetcher.create(web, simLat)
        it.map { s =>
          val fr = f.fetch(s.e)
          val hh = UrlCanon.hostHash(fr.host)
          if (fr.status == 200) {
            val p = HtmlSpans.parse(fr.url, fr.body)
            FetchOut(fr.url, fr.url_hash, fr.host, hh, fr.status, s.seq,
                     fr.attempt, fr.priority, fr.discovery_time,
                     SyntheticWeb.kindOf(fr.url), p.spans, p.links, Nil)
          } else
            FetchOut(fr.url, fr.url_hash, fr.host, hh, fr.status, s.seq,
                     fr.attempt, fr.priority, fr.discovery_time,
                     SyntheticWeb.kindOf(fr.url), Nil, Nil, Nil)
        }
      }
      .persist(StorageLevel.MEMORY_AND_DISK)
    val fetched = robotsFetchedOpt.map(_.union(mainFetched)).getOrElse(mainFetched)

    // parsed 200s (a filter view of the one persisted fetch output — no
    // second span-holding cache)
    val pageOuts = mainFetched.filter(_.status == 200)

    val docs = pageOuts.map(p => Doc(p.url_hash, p.url, p.host, r, p.spans))

    // -- retries & seen delta -------------------------------------------
    val salts = cfg.salts
    val retries = fetched
      .filter(o => o.status != 200 && o.status != 404 && o.attempt + 1 <= maxAtt)
      .map { o =>
        FrontierEntry(o.url, o.url_hash, o.host, o.host_hash,
                      UrlCanon.saltOf(o.url_hash, salts), o.priority,
                      o.discovery_time, o.attempt + 1, r)
      }
    val seenDelta = fetched
      .filter(o => o.status == 200 || o.status == 404 ||
        (o.status != 200 && o.status != 404 && o.attempt + 1 > maxAtt))
      .map { o =>
        val st = if (o.status == 200 || o.status == 404) o.status else 599
        SeenEntry(o.url_hash, o.host_hash, st, r)
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

    // -- opt-in rank-informed priority (north-rule stretch): the link
    // graph accumulated through THIS round feeds the priority stamp of
    // the candidates it discovered, i.e. round k's ranks order round
    // k+1's selection. Edges are skinny (60-bit nid pairs), persisted
    // one slot per round (overwrite => a replayed round is idempotent,
    // same contract as the other per-round state), and the rank is
    // integer fixed-point PageRank — bit-equal to the sequential
    // oracle's recomputation at any parallelism, so crawl parity is
    // preserved by determinism, not by luck. Restamping AFTER candDedup
    // is exact: duplicates of one url_hash share the class and the dst
    // node, hence the stamped priority. Cost when enabled: one PR pass
    // per round over the cumulative edge set (O(edges) per iteration;
    // a 100 TB deployment would re-rank on a cadence instead — same
    // dial as the IVF retrainEvery).
    val candRanked: Dataset[FrontierEntry] =
      if (!cfg.rankPriority) candDedup
      else {
        val edgesDir = s"${cfg.outDir}/rank_edges"
        pageOuts.flatMap { p =>
          val src = nidOf(p.url_hash)
          p.links.map { u =>
            (src, nidOf(UrlCanon.urlHash(UrlCanon.canonicalize(u))))
          }
        }.toDF("src", "dst")
          .write.mode("overwrite").parquet(s"$edgesDir/r$r")
        // rank_edges slots are written by runRound ONLY: a revoke()
        // commit advances the round counter without one, and an
        // all-empty round writes a part-file-less dir that defeats
        // schema inference — so resume reads the slots that exist,
        // with the schema stated (a missing slot holds zero edges by
        // construction: no fetches happened in that round)
        val fs = new org.apache.hadoop.fs.Path(edgesDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val slotPaths = (1 to r)
          .map(j => s"$edgesDir/r$j")
          .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
        val all =
          if (slotPaths.isEmpty)
            spark.range(0).select(col("id").as("src"), col("id").as("dst"))
          else
            spark.read
              .schema("src BIGINT, dst BIGINT")
              .parquet(slotPaths: _*)
        val ranks =
          if (all.isEmpty)
            spark.range(0).select(col("id").as("node"), col("id").as("rank"))
          else graft.ops.PageRank.ranks(all, cfg.rankIters)
        // max-relative bucket (rankedPriority): integer max over the
        // rank table — one driver-scale scalar, exact at any parallelism
        val maxRank = ranks.agg(max(col("rank"))).head() match {
          case row if row.isNullAt(0) => 0L
          case row                    => row.getLong(0)
        }
        candDedup.toDF()
          .withColumn("nid",
            conv(substring(col("url_hash"), 1, 15), 16, 10).cast("long"))
          .join(ranks.withColumnRenamed("node", "nid"), Seq("nid"), "left")
          // long floor division end to end — no floating point in the
          // ordering path; exactly rankedPriority's arithmetic
          .withColumn("priority",
            (if (maxRank <= 0L) (col("priority") * 4096 + lit(4095)).cast("int")
             else (col("priority") * lit(4096L) +
               expr(s"(($maxRank" + s"L - coalesce(rank, 0L)) * 4095L) div " +
                    s"$maxRank" + "L")).cast("int")))
          .select(col("url"), col("url_hash"), col("host"), col("host_hash"),
                  col("salt"), col("priority"), col("discovery_time"),
                  col("attempt"), col("round"))
          .as[FrontierEntry]
      }

    // three-tier seen check, applied to content candidates AND the
    // robots.txt entries of newly-discovered hosts. tier 1: bloom shard
    // of the candidate's bucket, checked MAP-SIDE (no shuffle): a miss
    // is definitely new; a missing shard => maybe (exact tier resolves).
    // Shards load lazily per executor (FilterShardCache) from the
    // snapshot store — only buckets this task actually touches. tiers
    // 2+3 in ONE bucket-keyed pass: possible-positives shuffle once;
    // the group task loads its bucket's cuckoo shard (probabilistic
    // reject) and — only if a candidate survives it — the bucket's
    // EXACT seen-index LSM segments, probed newest-first. The persisted
    // 10^10-row seen table never moves through a shuffle (the robots
    // URLs used to anti-join against it — an O(|seen|) exchange hiding
    // in every discovery round — now route through the same tiers).
    val shardBits = cfg.bloomShardBits
    val bloomK = cfg.bloomHashes
    val seenIdxSegs = m.seenIndexSegs
    val tieredCaches = mutable.ArrayBuffer.empty[Dataset[(FrontierEntry, Boolean)]]
    def seenFree(cands: Dataset[FrontierEntry]): Dataset[FrontierEntry] = {
      val tiered = cands.mapPartitions { it =>
        // task-local memo: one validated cache lookup per bucket per task
        val local = mutable.Map.empty[Int, Option[BloomFilter]]
        it.map { c =>
          val b = bucketOf(c.host_hash, nb)
          val bf = local.getOrElseUpdate(
            b, filterRounds.get(b).flatMap(fr => FilterShardCache.bloom(root, fr, b)))
          (c, bf.forall(_.mightContain(c.url_hash)))
        }
        // persisted: defNew and exactNew below are two subtrees over this
        // dataset — uncached, each would re-run the whole candidate
        // pipeline (flatMap + dedup shuffle + bloom probes) once more
      }.persist(StorageLevel.MEMORY_AND_DISK)
      tieredCaches += tiered
      val defNew = tiered.filter(!_._2).map(_._1)
      val exactNew = tiered.filter(_._2).map(_._1)
        .groupByKey(c => bucketOf(c.host_hash, nb))
        .flatMapGroups { (b: Int, it: Iterator[FrontierEntry]) =>
          // cuckoo read stays lenient: an unreadable shard only demotes
          // to the exact tier (correct, slower) — never drops dedup
          val cf = filterRounds.get(b)
            .flatMap(fr => Snapshots.readBytesAt(Snapshots.filterPathAt(root, fr, b)))
            .map(CuckooFilter.deserialize)
          // manifest-absent bucket = never had a seen entry (empty IS
          // exact); manifest-present-but-unreadable segment = FAIL the
          // round (requiredBytesAt) — defaulting to empty would
          // reclassify seen URLs as new, permanent dedup loss
          lazy val segs = seenIdxSegs.getOrElse(b, Nil).reverse
            .map(ir => SeenIndex.deserialize(
              Snapshots.requiredBytesAt(Snapshots.seenIndexPathAt(root, ir, b))))
          it.filter(c =>
            !cf.forall(_.mightContain(c.url_hash)) ||
              !segs.exists(_.contains(c.url_hash)))
        }
      defNew.union(exactNew)
    }
    val candSeenFree = seenFree(candRanked).persist(StorageLevel.MEMORY_AND_DISK)

    // robots.txt entries for newly-discovered hosts (distributed; the
    // constant discovery_time r*1e6 is tie-broken by url_hash)
    val robotsCand = seenFree(
      candSeenFree.select(col("host")).distinct()
        .join(hostDim(robotsAll.select(col("host").as("k_host"))),
              col("host") === col("k_host"), "left_anti")
        .as[String]
        .map(h => Fetcher.entryOf(s"https://$h/robots.txt", 0,
                                  r.toLong * 1000000L, 0, r, salts)))
    val candAll = candSeenFree.union(robotsCand)

    // -- frontier delta (the bucketed update replaces the old exclusion
    // anti-joins AND the full-frontier rewrite; see the class doc) -----
    // ops: 1 = remove fetched robots row, 2 = remove blocked row,
    //      3 = remove selected row (its hash STAYS in the exclusion
    //      membership set — a re-discovered just-fetched URL must not
    //      re-enter), 4 = add retry (forced), 5 = add candidate (only
    //      if its hash is unknown to the updated membership set)
    val updPri0 = robotsFetchedOpt match {
      case Some(rf) =>
        rf.map { o => FUpd(fbucketOf(o.url_hash, nFb), 1, o.url_hash, None) }
      case None => spark.emptyDataset[FUpd]
    }
    val frontierUpd = updPri0
      .union(blockedHashes.map(h => FUpd(fbucketOf(h, nFb), 2, h, None)))
      .union(selected.map(s => FUpd(fbucketOf(s.e.url_hash, nFb), 3, s.e.url_hash, None)))
      .union(retries.map(e => FUpd(fbucketOf(e.url_hash, nFb), 4, e.url_hash, Some(e))))
      .union(candAll.map(e => FUpd(fbucketOf(e.url_hash, nFb), 5, e.url_hash, Some(e))))

    // -- host state update ----------------------------------------------
    val selCounts = selected.groupBy(col("e.host").as("c_host")).count()
    val hostStateUpd = hostState
      .join(hostDim(selCounts), col("host") === col("c_host"), "left")
      .withColumn("tokens",
        least(col("capacity"), col("tokens") + col("refill_per_round"))
          - coalesce(col("count"), lit(0)).cast("double"))
      .select(col("host"), col("host_hash"), col("tokens"), col("capacity"),
              col("refill_per_round")).as[HostState]
    val capD = cfg.hostCapacity
    val refD = cfg.hostRefill
    // new hosts come from the candidate set: every candidate REJECTED by
    // the bucket update collided with a frontier/retry row of the same
    // URL, whose host is in host_state already — and robotsCand hosts
    // are candSeenFree hosts by construction — so hosts(candSeenFree)
    // minus host_state equals the accepted entries' new hosts exactly,
    // with no dependency on the update pass's output (and no second
    // evaluation of the robots-candidate pipeline)
    val newHostRows = candSeenFree.map(_.host).distinct()
      .join(hostDim(hostState.select(col("host").as("h_host"))),
            col("value") === col("h_host"), "left_anti")
      .as[String]
      .map(h => HostState(h, UrlCanon.hostHash(h), 0.0, capD, refD))
    val hostStateAll = hostStateUpd.union(newHostRows)

    // -- fetch log --------------------------------------------------------
    val fetchLog = fetched.map { o =>
      FetchLogEntry(r, o.host, o.host_hash, o.seq, o.url, o.url_hash, o.status)
    }

    // -- commit (per-round counters ride the writes as Observations) -----
    // fetch_log first: it materializes the fetch caches and its metrics
    // gate the conditional writes below. The remaining commit writes are
    // all independent of each other, so they run as CONCURRENT Spark
    // jobs — the round's fixed commit cost is the longest single write,
    // not the sum of six sequential job launches.
    val obsLog = Observation()
    spark.sparkContext.setJobDescription(s"crawl r$r: fetch+log")
    fetchLog.toDF()
      .observe(obsLog,
               count(lit(1)).as("n"),
               coalesce(sum(when(col("status") === 200, 1L).otherwise(0L)), lit(0L))
                 .as("ok"),
               coalesce(sum(when(col("status") === 404, 1L).otherwise(0L)), lit(0L))
                 .as("n404"),
               coalesce(sum(when(col("seq") === 0, 1L).otherwise(0L)), lit(0L))
                 .as("n_robots"),
               coalesce(sum(when(col("seq") > 0 && col("status") === 200, 1L)
                 .otherwise(0L)), lit(0L)).as("ok_main"))
      .coalesce(statePar)
      .write.mode("overwrite").parquet(snaps.tablePath(r, "fetch_log"))
    def obsL(o: Observation, k: String): Long = o.get(k).asInstanceOf[Long]
    val okMain = obsL(obsLog, "ok_main")
    val nRobots = obsL(obsLog, "n_robots")

    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext = commitEc

    val obsDocs = Observation()
    val docsF = Future {
      spark.sparkContext.setJobDescription(s"crawl r$r: docs write")
      if (okMain > 0)
        docs.toDF()
          .observe(obsDocs, count(lit(1)).as("n"),
                   coalesce(sum(size(col("spans"))), lit(0L)).as("spans"))
          .coalesce(statePar)
          .write.mode("overwrite").parquet(snaps.tablePath(r, "docs"))
    }
    val obsSeen = Observation()
    val seenF = Future {
      spark.sparkContext.setJobDescription(s"crawl r$r: seen write")
      seenDelta.toDF()
        .observe(obsSeen,
                 coalesce(sum(when(col("status") === 599, 1L).otherwise(0L)), lit(0L))
                   .as("exhausted"))
        .coalesce(statePar)
        .write.mode("overwrite").parquet(snaps.tablePath(r, "seen_delta"))
    }
    // frontier bucket update: ONE group task per TOUCHED bucket streams
    // the bucket's merged LSM segment stack through a sorted merge
    // against the round's delta and appends ONE new segment
    // executor-side (atomic rename => retry-safe; segment bytes are a
    // pure function of the delta => speculative duplicates are
    // idempotent). Normally the segment holds only the round's DELTA —
    // entry records for retries/accepted candidates, tombstones for
    // removals — so write cost is O(delta); once the bucket's stack
    // reaches compactEvery segments the task writes the full surviving
    // set instead (a compacted base, resetting the stack). Task memory
    // is O(this bucket's DELTA) — removal hash sets plus sorted
    // retry/candidate buffers; the bucket's STATE only ever streams, so
    // bucket size is bounded by disk, not executor heap. Only
    // nFb-bounded stat rows reach the driver.
    //
    // Exact set semantics per distinct url_hash (see FUpd op table):
    //   output  = retry | (old if !remBoth && !selected) | first-accepted
    //             candidate — mutually exclusive by construction
    //   E-membership (candidate exclusion) = retry present, or old
    //             present && !remBoth (selected rows STAY members)
    // Delta-segment records realizing it: retry => ENTRY (replaces old);
    // old removed with an accepted candidate => ENTRY(candidate)
    // (replacement, no tombstone needed); old removed otherwise =>
    // TOMBSTONE; old surviving untouched => no record; accepted
    // candidate on an absent hash => ENTRY.
    val fCompactEvery = cfg.compactEvery
    val frontF = Future {
      spark.sparkContext.setJobDescription(s"crawl r$r: frontier update")
      frontierUpd
        .groupByKey(_.fb)
        .mapGroups { (fb: Int, it: Iterator[FUpd]) =>
          val remBoth = mutable.HashSet.empty[String]
          val selSet = mutable.HashSet.empty[String]
          val retriesB = mutable.ArrayBuffer.empty[FrontierEntry]
          val candsB = mutable.ArrayBuffer.empty[FrontierEntry]
          var nBlockedRemoved = 0L
          it.foreach { u =>
            u.op match {
              case 1 => remBoth += u.hash
              case 2 => remBoth += u.hash; nBlockedRemoved += 1
              case 3 => selSet += u.hash
              case 4 => retriesB += u.e.get
              case _ => candsB += u.e.get
            }
          }
          // candidate sort (url_hash, then selection order) makes the
          // per-hash winner the entryOrd-minimum — deterministic
          val retIt = retriesB.sortInPlace()(Ordering.by((e: FrontierEntry) =>
            e.url_hash)).iterator.buffered
          val candIt = candsB.sortInPlace()(Ordering.by((e: FrontierEntry) =>
            (e.url_hash, e.priority, e.discovery_time))).iterator.buffered
          val segRounds = frontierSegs.getOrElse(fb, Nil)
          val oldIt = FrontierStore.iterateMergedRequired(root, fb, segRounds)
            .buffered
          val compact = segRounds.size + 1 >= fCompactEvery
          val w = FrontierStore.writer(root, r, fb)
          var n = 0L
          var nNew = 0L
          var nPri0 = 0L
          // logical survivor (counts always; bytes only when compacting)
          def emit(e: FrontierEntry, delta: Boolean): Unit = {
            if (compact || delta) w.add(e)
            n += 1; if (e.priority == 0) nPri0 += 1
          }
          while (oldIt.hasNext || retIt.hasNext || candIt.hasNext) {
            var h: String = null
            if (oldIt.hasNext) h = oldIt.head.url_hash
            if (retIt.hasNext && (h == null || retIt.head.url_hash < h))
              h = retIt.head.url_hash
            if (candIt.hasNext && (h == null || candIt.head.url_hash < h))
              h = candIt.head.url_hash
            var retryE: FrontierEntry = null
            while (retIt.hasNext && retIt.head.url_hash == h) {
              val e = retIt.next()
              if (retryE == null) retryE = e // retries are hash-unique; defensive
            }
            var oldE: FrontierEntry = null
            while (oldIt.hasNext && oldIt.head.url_hash == h)
              oldE = oldIt.next() // merged view is hash-unique
            var candE: FrontierEntry = null
            while (candIt.hasNext && candIt.head.url_hash == h) {
              val c = candIt.next()
              if (candE == null) candE = c
            }
            if (retryE != null) emit(retryE, delta = true)
            else if (oldE != null) {
              if (remBoth.contains(h)) {
                // old removed; its hash is NOT an exclusion member, so a
                // re-discovered candidate re-enters (replaces old)
                if (candE != null) { emit(candE, delta = true); nNew += 1 }
                else if (!compact) w.drop(h)
              } else if (selSet.contains(h)) {
                // removed from the frontier but an exclusion member this
                // round (candidates stay excluded); future exclusion is
                // the seen index's job
                if (!compact) w.drop(h)
              } else emit(oldE, delta = false) // untouched survivor
            } else if (candE != null) { emit(candE, delta = true); nNew += 1 }
          }
          w.close()
          FrontierStat(fb, n, nNew, retriesB.size.toLong, nPri0,
                       nBlockedRemoved, compacted = compact)
        }
        .collect()
    }
    // robots table only changes on rounds that fetched robots.txt
    val robotsF = Future {
      spark.sparkContext.setJobDescription(s"crawl r$r: robots write")
      if (nRobots > 0) {
        robotsAll.coalesce(statePar)
          .write.mode("overwrite").parquet(snaps.tablePath(r, "robots"))
        snaps.tablePath(r, "robots")
      } else m.tables("robots")
    }
    val obsHost = Observation()
    val hostF = Future {
      spark.sparkContext.setJobDescription(s"crawl r$r: host_state write")
      hostStateAll.toDF()
        .observe(obsHost, count(lit(1)).as("n"))
        .coalesce(statePar)
        .write.mode("overwrite").parquet(snaps.tablePath(r, "host_state"))
    }

    // filter shards: ONE distributed pass updates cuckoo + bloom shards,
    // each group task writing ITS OWN bucket's files to the snapshot
    // store (shared storage on a real cluster; atomic per-file rename
    // makes task retries safe). Only (bucket, ok) booleans reach the
    // driver. Overflowed cuckoos are rebuilt from the exact seen table
    // (rare); a bucket whose rebuild also overflows is omitted from the
    // manifest so readers fall back to the conservative maybe-seen path.
    val filtersF = Future {
      spark.sparkContext.setJobDescription(s"crawl r$r: filter shards")
      val idxMergeEvery = cfg.compactEvery
      val updates = seenDelta
        .groupByKey(s => bucketOf(s.host_hash, nb))
        .mapGroups { (b: Int, it: Iterator[SeenEntry]) =>
          val segRounds = seenIdxSegs.getOrElse(b, Nil)
          // all reads here are manifest-referenced => fail-closed: an
          // unreadable segment/shard means lost storage, and rebuilding
          // filters or indexes from empty state silently loses dedup
          def segsOf: Seq[SeenIndex] = segRounds.map(ir =>
            SeenIndex.deserialize(
              Snapshots.requiredBytesAt(Snapshots.seenIndexPathAt(root, ir, b))))
          var ok = true
          val (cf, bf) = filterRounds.get(b) match {
            case Some(fr) =>
              (CuckooFilter.deserialize(
                 Snapshots.requiredBytesAt(Snapshots.filterPathAt(root, fr, b))),
               BloomFilter.deserialize(
                 Snapshots.requiredBytesAt(Snapshots.bloomShardPathAt(root, fr, b))))
            case None =>
              // a bucket WITH history (index segments exist) but WITHOUT
              // filter shards (dropped after a cuckoo overflow) must NOT
              // be recreated from empty filters — a bloom missing old
              // hashes would later classify seen URLs as definitely-new.
              // Reseed both filters from the exact index instead.
              val prior = SeenIndex.merged(segsOf)
              val cf0 = CuckooFilter.sized(math.max(4096L, prior.size.toLong * 2))
              val bf0 = new BloomFilter(shardBits, bloomK)
              prior.hexIterator.foreach { h =>
                ok &= cf0.put(h)
                bf0.put(h)
              }
              (cf0, bf0)
          }
          val deltaHashes = mutable.ArrayBuffer.empty[String]
          it.foreach { s =>
            ok &= cf.put(s.url_hash)
            bf.put(s.url_hash)
            deltaHashes += s.url_hash
          }
          Snapshots.writeBytesAt(Snapshots.bloomShardPathAt(root, r, b), bf.serialize())
          if (ok)
            Snapshots.writeBytesAt(Snapshots.filterPathAt(root, r, b), cf.serialize())
          // the exact per-bucket index updates UNCONDITIONALLY (tier 3
          // correctness does not ride on cuckoo occupancy). LSM: the
          // common round writes a DELTA-ONLY segment — O(|delta|) bytes,
          // not O(|seen|); segments fold into one on the compactEvery
          // cadence (the only round that rewrites the bucket's index).
          val newSegs =
            if (segRounds.size + 1 >= idxMergeEvery) {
              val merged = SeenIndex.merged(segsOf :+ SeenIndex.fromHex(deltaHashes))
              Snapshots.writeBytesAt(Snapshots.seenIndexPathAt(root, r, b),
                                     merged.serialize())
              Seq(r)
            } else {
              Snapshots.writeBytesAt(Snapshots.seenIndexPathAt(root, r, b),
                                     SeenIndex.fromHex(deltaHashes).serialize())
              segRounds :+ r
            }
          (b, ok, newSegs)
        }.collect()
      val failedBuckets = updates.filter(!_._2).map(_._1).toSet
      val rebuiltOk: Map[Int, Boolean] =
        if (failedBuckets.isEmpty) Map.empty
        else readTMulti[SeenEntry](snaps.seenPaths(m)).union(seenDelta)
          .filter(s => failedBuckets.contains(bucketOf(s.host_hash, nb)))
          .groupByKey(s => bucketOf(s.host_hash, nb))
          .mapGroups { (b: Int, it: Iterator[SeenEntry]) =>
            val hashes = it.map(_.url_hash).toArray.distinct
            val cf = CuckooFilter.sized(hashes.length.toLong * 2)
            var ok = true
            hashes.foreach(h => ok &= cf.put(h))
            if (ok)
              Snapshots.writeBytesAt(Snapshots.filterPathAt(root, r, b), cf.serialize())
            (b, ok)
          }.collect().toMap
      val touchedOk = updates
        .map(u => u._1 -> (u._2 || rebuiltOk.getOrElse(u._1, false))).toMap
      // untouched buckets keep referencing their last-written round's
      // files (no copy-forward); touched-and-ok move to round r; failed
      // buckets drop out (conservative: bloom maybe, cuckoo maybe)
      val newFilterRounds = (filterRounds -- touchedOk.keys) ++
        touchedOk.collect { case (b, true) => b -> r }
      val newSeenIndexSegs = seenIdxSegs ++ updates.map(u => u._1 -> u._3)
      (newFilterRounds, newSeenIndexSegs)
    }

    Await.result(docsF, Duration.Inf)
    Await.result(seenF, Duration.Inf)
    val frontierStats = Await.result(frontF, Duration.Inf)
    Await.result(hostF, Duration.Inf)
    val robotsPath = Await.result(robotsF, Duration.Inf)
    val (newFilterRounds, newSeenIndexSegs) = Await.result(filtersF, Duration.Inf)

    // seen-table LSM compaction: deltas fold into a level-1 run every
    // compactEvery rounds (reads only the window's deltas — O(window),
    // not O(|seen|)); runs fold into the seen_full base only when
    // compactEvery runs have accumulated, deduplicating by url_hash
    // (latest round wins) so revocation re-fetches cannot leave
    // duplicate rows in the table.
    val deltaRounds = m.seenDeltaRounds :+ r
    spark.sparkContext.setJobDescription(s"crawl r$r: seen compaction")
    val (seenFullRound, seenRunRounds, seenDeltaRounds) =
      if (deltaRounds.size >= cfg.compactEvery) {
        if (m.seenRunRounds.size + 1 >= cfg.compactEvery) {
          val basePaths =
            if (m.seenFullRound >= 0) Seq(snaps.tablePath(m.seenFullRound, "seen_full"))
            else Nil
          val allPaths = basePaths ++
            m.seenRunRounds.map(snaps.tablePath(_, "seen_run")) ++
            deltaRounds.map(snaps.tablePath(_, "seen_delta"))
          readTMulti[SeenEntry](allPaths)
            .groupByKey(_.url_hash)
            .reduceGroups((a, b) => if (newerSeen(a, b)) a else b)
            .map(_._2)
            .write.mode("overwrite").parquet(snaps.tablePath(r, "seen_full"))
          (r, Seq.empty[Int], Seq.empty[Int])
        } else {
          readTMulti[SeenEntry](deltaRounds.map(snaps.tablePath(_, "seen_delta")))
            .coalesce(statePar)
            .write.mode("overwrite").parquet(snaps.tablePath(r, "seen_run"))
          (m.seenFullRound, m.seenRunRounds :+ r, Seq.empty[Int])
        }
      } else (m.seenFullRound, m.seenRunRounds, deltaRounds)

    val selectedCnt = obsL(obsLog, "n")
    val okCnt = obsL(obsLog, "ok")
    val spansCnt = if (okMain > 0) obsL(obsDocs, "spans") else 0L
    val docsCnt = if (okMain > 0) obsL(obsDocs, "n") else 0L
    // frontier counters: touched buckets from this round's stats,
    // untouched buckets carried from the manifest — totals never
    // require reading untouched buckets. A touched bucket either
    // appends this round's delta segment to its stack or (on the
    // compactEvery cadence) resets the stack to the compacted base.
    val newFrontierSegs = frontierSegs ++ frontierStats.map(s =>
      s.fb -> (if (s.compacted) Seq(r)
               else frontierSegs.getOrElse(s.fb, Nil) :+ r))
    val newFrontierCounts = m.frontierCounts ++ frontierStats.map(s => s.fb -> s.n)
    val newFrontierPri0 = m.frontierPri0 ++ frontierStats.map(s => s.fb -> s.n_pri0)
    val frontierLeft = newFrontierCounts.values.sum
    val newCnt = frontierStats.map(_.n_new).sum
    val blockedCnt = frontierStats.map(_.n_blocked).sum

    snaps.writeManifest(Snapshots.Manifest(
      round = r, parentRound = r - 1,
      tables = Map(
        "host_state" -> snaps.tablePath(r, "host_state"),
        "robots" -> robotsPath),
      seenDeltaRounds = seenDeltaRounds, seenRunRounds = seenRunRounds,
      seenFullRound = seenFullRound,
      filterRounds = newFilterRounds, seenIndexSegs = newSeenIndexSegs,
      frontierSegs = newFrontierSegs,
      frontierCounts = newFrontierCounts, frontierPri0 = newFrontierPri0,
      counters = Map(
        "selected" -> selectedCnt, "fetched_ok" -> okCnt,
        "robots_blocked" -> blockedCnt, "new_urls" -> newCnt,
        "frontier" -> frontierLeft,
        "frontier_pri0" -> newFrontierPri0.values.sum,
        "spans" -> spansCnt, "docs" -> docsCnt,
        "hosts" -> obsL(obsHost, "n"),
        "cfg_n_buckets" -> cfg.nBuckets.toLong,
        "cfg_frontier_buckets" -> cfg.frontierBuckets.toLong),
      done = frontierLeft == 0))

    (Seq(frontier, gated, selected, mainFetched, seenDelta,
         candSeenFree, robotsAll) ++ robotsFetchedOpt)
      .foreach(_.unpersist(false))
    tieredCaches.foreach(_.unpersist(false))

    RoundResult(r, selectedCnt, okCnt, newCnt, frontierLeft, frontierLeft == 0)
  }

  /** Administrative revocation — the scenario cuckoo deletability exists
    * for (CuckooFilter.scala:18-19): a host relaxes its robots rules or
    * content is invalidated, and previously-seen URLs must become
    * re-crawlable. Removes `urls` from the exact seen table AND from
    * their buckets' cuckoo shards, so a re-discovered link short-circuits
    * tier 2 as definitely-new (the bloom tier cannot delete; its stale
    * positives just route through the cuckoo check). Optionally reseeds
    * crawl entry points (e.g. the listing pages that link the revoked
    * URLs). Commits a new snapshot round; `run()` resumes from it.
    *
    * Driver-side O(|urls|) by design: revocations are administrative-
    * scale (a robots change affects one host), unlike per-round shard
    * maintenance, which stays executor-side. Known trade: deleting a
    * fingerprint another URL collides with (same 16-bit fp + bucket)
    * can cause one spurious re-fetch of that URL — a liveness cost;
    * the exact seen table stays authoritative for dedup exactness.
    */
  def revoke(urls: Seq[String], reseed: Seq[String] = Nil): Int = {
    import spark.implicits._
    val latest = snaps.latestRound.getOrElse(
      throw new IllegalStateException("no crawl to revoke from"))
    val m = snaps.readManifest(latest)
    requireStructuralConfig(m)
    val r = latest + 1
    val nb = cfg.nBuckets
    val root = cfg.outDir
    val revoked: Seq[(String, Long)] = urls.map { u =>
      val canon = UrlCanon.canonicalize(u)
      (UrlCanon.urlHash(canon), UrlCanon.hostHash(UrlCanon.hostOf(canon)))
    }
    val revokedHashes = revoked.map(_._1).toSet

    // 1. exact seen table: compact minus the revoked rows, deduped by
    // url_hash (latest round wins) — restores the unique-hash invariant
    // immediately even if a prior revoke+reseed left duplicate rows
    val seen = readTMulti[SeenEntry](snaps.seenPaths(m))
    seen.filter(!col("url_hash").isin(revokedHashes.toSeq: _*)).as[SeenEntry]
      .groupByKey(_.url_hash)
      .reduceGroups((a, b) => if (newerSeen(a, b)) a else b)
      .map(_._2)
      .write.mode("overwrite").parquet(snaps.tablePath(r, "seen_full"))

    // 2. cuckoo shards of affected buckets: delete fingerprints, write at
    // r; the bucket's bloom shard rides forward so the manifest's single
    // (bucket -> round) reference stays consistent for both tiers.
    // Fail-closed reads: these files are manifest-referenced, and
    // advancing the bucket's round pointer without having written the
    // files would manufacture a dangling reference that fails every
    // subsequent round at the wrong spot.
    val byBucket = revoked.groupBy(t => bucketOf(t._2, nb))
    val updatedBuckets = byBucket.flatMap {
      case (b, hs) =>
        m.filterRounds.get(b).map { fr =>
          val cf = CuckooFilter.deserialize(
            Snapshots.requiredBytesAt(Snapshots.filterPathAt(root, fr, b)))
          hs.foreach { case (h, _) => cf.remove(h) }
          Snapshots.writeBytesAt(Snapshots.filterPathAt(root, r, b), cf.serialize())
          Snapshots.writeBytesAt(
            Snapshots.bloomShardPathAt(root, r, b),
            Snapshots.requiredBytesAt(Snapshots.bloomShardPathAt(root, fr, b)))
          b -> r
        }
    }
    // 2b. the exact per-bucket seen indexes drop the revoked hashes too
    // (tier 3 must agree with the rewritten seen table): LSM segments
    // merge-minus-revoked into a single segment at r
    val updatedIdxBuckets = byBucket.flatMap {
      case (b, hs) =>
        val segRounds = m.seenIndexSegs.getOrElse(b, Nil)
        if (segRounds.isEmpty) None
        else {
          val segs = segRounds.map(ir => SeenIndex.deserialize(
            Snapshots.requiredBytesAt(Snapshots.seenIndexPathAt(root, ir, b))))
          val idx = SeenIndex.merged(segs, hs.map(_._1))
          Snapshots.writeBytesAt(Snapshots.seenIndexPathAt(root, r, b),
                                 idx.serialize())
          Some(b -> Seq(r))
        }
    }

    // 3. frontier: insert reseed entry points into their buckets
    // (driver-side loops — administrative scale, like the rest of
    // revoke). Existing frontier rows WIN over a colliding reseed
    // (deterministic precedence — a pending retry keeps its attempt
    // count); distinctBy url_hash because two reseed URLs can
    // canonicalize to the same entry (same guard as init()). Untouched
    // buckets carry forward by manifest reference.
    // A reseed onto a never-seen host must also seed that host's
    // robots.txt (exactly as init() does for seed hosts): the robots
    // gate holds robots-unknown entries in the frontier, and nothing
    // else ever enqueues a robots fetch for a frontier-resident row —
    // without this, the crawl would spin selecting nothing until
    // maxRounds. Known hosts (any host_state row) resolved their rules
    // when first discovered, or have a pri-0 entry already pending.
    val hostState = readT[HostState](m.tables("host_state"))
    val reseedHostsOrdered = reseed
      .map(u => UrlCanon.hostOf(UrlCanon.canonicalize(u))).distinct
    val knownReseedHosts =
      if (reseedHostsOrdered.isEmpty) Set.empty[String]
      else hostState.filter(col("host").isin(reseedHostsOrdered: _*))
        .select("host").as[String].collect().toSet
    val robotsSeedUrls = reseedHostsOrdered.filterNot(knownReseedHosts)
      .map(h => s"https://$h/robots.txt")
    val reseedEntries = (robotsSeedUrls ++ reseed).zipWithIndex.map {
      case (u, i) =>
        Fetcher.entryOf(u, SyntheticWeb.priorityOf(u),
                        r.toLong * 1000000L + i, 0, r, cfg.salts)
    }.distinctBy(_.url_hash)
    var frontierSegs = m.frontierSegs
    var frontierCounts = m.frontierCounts
    var frontierPri0 = m.frontierPri0
    val acceptedReseeds = scala.collection.mutable.ArrayBuffer.empty[FrontierEntry]
    reseedEntries.groupBy(e => fbucketOf(e.url_hash, cfg.frontierBuckets))
      .foreach { case (fb, es) =>
        val old = FrontierStore.readMergedRequired(
          root, fb, frontierSegs.getOrElse(fb, Nil))
        val have = old.iterator.map(_.url_hash).toSet
        val add = es.filterNot(e => have(e.url_hash))
        if (add.nonEmpty) {
          // revoke is administrative-scale: write a compacted full
          // segment, resetting the bucket's stack
          val out = old ++ add
          FrontierStore.write(root, r, fb, out)
          frontierSegs += fb -> Seq(r)
          frontierCounts += fb -> out.length.toLong
          frontierPri0 += fb -> out.count(_.priority == 0).toLong
          acceptedReseeds ++= add
        }
      }
    val frontierCnt = frontierCounts.values.sum
    val pri0Cnt = frontierPri0.values.sum

    // 4. host state rows for any new reseed hosts (hostState read above)
    val capD = cfg.hostCapacity
    val refD = cfg.hostRefill
    val newHosts = acceptedReseeds.map(_.host).distinct.toSeq.toDS()
      .join(hostState.select(col("host").as("h_host")),
            col("value") === col("h_host"), "left_anti")
      .as[String]
      .map(h => HostState(h, UrlCanon.hostHash(h), 0.0, capD, refD))
    hostState.union(newHosts)
      .write.mode("overwrite").parquet(snaps.tablePath(r, "host_state"))

    snaps.writeManifest(Snapshots.Manifest(
      round = r, parentRound = latest,
      tables = Map(
        "host_state" -> snaps.tablePath(r, "host_state"),
        "robots" -> m.tables("robots")),
      seenDeltaRounds = Nil, seenRunRounds = Nil, seenFullRound = r,
      filterRounds = m.filterRounds ++ updatedBuckets,
      seenIndexSegs = m.seenIndexSegs ++ updatedIdxBuckets,
      frontierSegs = frontierSegs,
      frontierCounts = frontierCounts, frontierPri0 = frontierPri0,
      counters = Map("frontier" -> frontierCnt, "frontier_pri0" -> pri0Cnt,
                     "revoked" -> revokedHashes.size.toLong,
                     "cfg_n_buckets" -> cfg.nBuckets.toLong,
                     "cfg_frontier_buckets" -> cfg.frontierBuckets.toLong),
      done = frontierCnt == 0))
    r
  }

  /** Run from scratch (or resume if a manifest exists) until the frontier
    * drains or `maxRounds` rounds have executed IN THIS CALL. The budget
    * is per-invocation, not an absolute round ceiling: a resume after
    * `revoke()` near round maxRounds still gets a full budget to crawl
    * the reseeded frontier (an absolute ceiling would return immediately,
    * silently, with the reseeds uncrawled). Returns the last round
    * executed.
    */
  def run(): Int = {
    val start = snaps.latestRound match {
      case Some(rr) if !snaps.readManifest(rr).done => rr + 1
      case Some(rr)                                 => return rr
      case None                                     => init(); 1
    }
    var r = start
    var done = false
    while (!done && r - start < cfg.maxRounds) {
      val res = runRound(r)
      done = res.done
      r += 1
    }
    r - 1
  }
}

object CrawlScheduler {
  /** Thread pool for concurrent commit-write jobs (daemon threads: the
    * pool must never pin a JVM shutdown). Spark supports concurrent
    * job submission from multiple threads of one session.
    */
  lazy val commitEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newCachedThreadPool(r0 => {
        val t = new Thread(r0, "graft-commit")
        t.setDaemon(true)
        t
      }))

  final case class WithBudget(e: FrontierEntry, budget: Int)
  final case class SelectedE(e: FrontierEntry, seq: Int)

  /** One frontier-delta row (the ONLY thing that shuffles in the
    * frontier-update path — delta-scale, never state-scale). See the
    * op table at the construction site in runRound.
    */
  final case class FUpd(fb: Int, op: Int, hash: String,
                        e: Option[FrontierEntry])
  final case class FrontierStat(fb: Int, n: Long, n_new: Long, n_retry: Long,
                                n_pri0: Long, n_blocked: Long,
                                compacted: Boolean)

  /** Frontier storage bucket of a url_hash (first 60 bits of the hex
    * sha-256, mod nFb) — independent of the host-hash filter buckets.
    */
  def fbucketOf(urlHashHex: String, nFb: Int): Int =
    (java.lang.Long.parseLong(urlHashHex.substring(0, 15), 16) % nFb).toInt

  /** Latest-wins order for seen-table dedup at full compaction. */
  def newerSeen(a: SeenEntry, b: SeenEntry): Boolean =
    if (a.first_round != b.first_round) a.first_round > b.first_round
    else a.status <= b.status
  /** Slim fused fetch+parse output — the only thing a round persists
    * per fetched URL. The raw body is parsed into `spans`/`links`
    * (content pages) or `robots_prefixes` (robots.txt) INSIDE the fetch
    * task and never cached: at 10^7-page rounds the body cache alone
    * exceeded executor storage and turned the round I/O-bound.
    */
  final case class FetchOut(url: String, url_hash: String, host: String,
                            host_hash: Long, status: Int, seq: Int,
                            attempt: Int, priority: Int, discovery_time: Long,
                            kind: String, spans: Seq[Span],
                            links: Seq[String], robots_prefixes: Seq[String])

  val entryOrd: Ordering[FrontierEntry] =
    Ordering.by((e: FrontierEntry) => (e.priority, e.discovery_time, e.url_hash))

  /** 60-bit numeric node id for the link graph: the first 15 hex chars
    * of the sha-256 url_hash (same order-preserving surrogate as
    * [[graft.SparkEntry.trainingShard]]'s corpus-scale path).
    */
  def nidOf(urlHashHex: String): Long =
    java.lang.Long.parseLong(urlHashHex.substring(0, 15), 16)

  /** Rank-informed priority stamp (when `CrawlConfig.rankPriority`):
    * class * 4096 + bucket, bucket = ((maxRank - rank) * 4095) div
    * maxRank — the node's fixed-point PageRank relative to the graph's
    * maximum, floored into 4096 levels (higher rank => smaller bucket
    * => selected earlier WITHIN its class; listing-before-detail class
    * dominance preserved; robots stay priority 0). Max-relative, so
    * the bucket is invariant to graph size (absolute ranks scale as
    * 1/n); pure long arithmetic (max and floor division are exact and
    * order-independent), so the distributed stamp and the sequential
    * oracle's agree bit-for-bit at any parallelism.
    */
  def rankedPriority(classPriority: Int, rank: Long, maxRank: Long): Int =
    if (maxRank <= 0L) classPriority * 4096 + 4095
    else (classPriority * 4096L + ((maxRank - rank) * 4095L) / maxRank).toInt

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
