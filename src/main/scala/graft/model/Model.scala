package graft.model

/** Core data model of the graft crawl/analytics engine.
  *
  * The canonical document shape is the interleaved text+media span model:
  * one row per document, `spans` ordered by `offset`, each span either a
  * text run (kind="text", media_ref="") or a media/link reference
  * (kind in {image, video, link}, text = anchor/alt text or "").
  *
  * Field names are deliberately snake_case so the parquet/Dataset schema
  * matches the canonical column names exactly
  * (doc_id, spans.kind, spans.text, spans.media_ref, spans.offset).
  *
  * Behavioral reference: the flat `[]string` rows of jarcn/qiyee-colly
  * (e.g. apna/main.go:56,84-87) generalized to nested spans.
  */
final case class Span(
    kind: String, // "text" | "image" | "video" | "link"
    text: String, // trimHtml-normalized text ("" for pure media)
    media_ref: String, // media/link URL ("" for text spans)
    offset: Int // 0-based position in document order
)

final case class Doc(
    doc_id: String, // sha-256 hex of canonical URL
    url: String,
    host: String,
    round: Int,
    spans: Seq[Span]
)

/** One entry of the partitioned crawl frontier.
  *
  * Priority queue key per BASELINE north rule: (host_hash, priority,
  * discovery_time), with url_hash as the deterministic tiebreak so a
  * parallel run and the sequential oracle order identically.
  *
  * Reference analogue: colly's internal visit queue fed by c.Visit
  * (indeed/main.go:66-70, olx_c226/main.go:180-184).
  */
final case class FrontierEntry(
    url: String, // canonical URL
    url_hash: String, // sha-256 hex of canonical URL
    host: String,
    host_hash: Long,
    salt: Int, // url-derived salt: spreads a hot host over partitions
    priority: Int, // 0 = robots.txt, 1 = listing, 2 = detail (lower = first)
    discovery_time: Long, // logical time: round*1e6 + in-page link index
    attempt: Int, // retry counter (olx_c226/main.go:188-193 semantics)
    round: Int // round the entry was (re)enqueued
)

/** Result of one (simulated or real) fetch. */
final case class FetchResult(
    url: String,
    url_hash: String,
    host: String,
    status: Int, // 200 | 404 | 503
    body: String,
    latency_ms: Int,
    attempt: Int,
    priority: Int,
    discovery_time: Long
)

/** A row of the exact URL-seen table. A URL is "seen" once its fetch has
  * resolved: 200 (document stored) or 404 (tombstone). Retryable errors do
  * NOT mark seen until max attempts (then tombstoned as exhausted).
  */
final case class SeenEntry(
    url_hash: String,
    host_hash: Long,
    status: Int,
    first_round: Int
)

/** Per-host politeness state: a token bucket refilled each scheduling
  * round. Reference analogue: fixed sleeps (indeed/main.go:69,121)
  * generalized to capacity/refill per host.
  */
final case class HostState(
    host: String,
    host_hash: Long,
    tokens: Double,
    capacity: Double,
    refill_per_round: Double
)

/** Parsed robots.txt rules for one host (temoto/robotstxt analogue,
  * reference go.mod:19). Empty prefixes = everything allowed.
  */
final case class RobotsRule(host: String, disallow_prefixes: Seq[String])

/** Per-round, per-host-bucket lineage metrics, persisted with each
  * checkpoint manifest (north rule: per-partition lineage).
  */
final case class RoundMetrics(
    round: Int,
    bucket: Int, // host_hash bucket (stable across repartitioning)
    selected: Long,
    fetched_ok: Long,
    fetched_404: Long,
    fetched_retryable: Long,
    robots_blocked: Long,
    docs_parsed: Long,
    new_urls: Long,
    spans_emitted: Long
)

/** One line of the canonical fetch log used for ordering parity with the
  * sequential oracle: sorted by (round, host_hash, seq) it must match the
  * oracle exactly.
  */
final case class FetchLogEntry(
    round: Int,
    host: String,
    host_hash: Long,
    seq: Int, // selection rank within (round, host)
    url: String,
    url_hash: String,
    status: Int
)
