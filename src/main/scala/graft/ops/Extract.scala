package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Catalyst implementations of the reference's extraction/normalization
  * operator inventory (SURVEY.md §2.3/§2.9) — each a pure, codegen'd
  * column chain. File:line cites point at the behavioral source in
  * /root/reference (studied, not copied).
  */
object Extract {

  /** F2 `unixToTime` (kitalulus/store.go:67-71): unix-ms string/long →
    * timestamp (the reference divides by 1000 and truncates to seconds).
    */
  def unix_ms_to_ts(c: Column): Column =
    timestamp_seconds((c.cast("long") / 1000).cast("long"))

  /** F3 slug→URL construction (olx_c226/main.go:176-179):
    * lower(title), spaces→'-', concat base + slug + "-iid-" + id.
    */
  def slug_url(base: String, title: Column, id: Column): Column =
    concat(lit(base), regexp_replace(lower(title), " ", "-"),
           lit("-iid-"), id.cast("string"))

  /** F4 id-from-URL (olx_c226/main.go:90): substring after last '-'. */
  def id_from_url(url: Column): Column = substring_index(url, "-", -1)

  /** P4 regex window-state projection (indeed/main.go:28,72-95):
    * capture the JSON blob after `window._initialData=`.
    */
  def window_initial_data(page: Column): Column =
    regexp_extract(page, "window\\._initialData=(\\{.*?\\});", 1)

  /** P6 id-from-attribute (jobstreet/main.go:24,50-57): regex capture
    * `jobstreet-id-job-(\d+)` then take split element 3.
    */
  def jobstreet_id(attr: Column): Column =
    element_at(split(regexp_extract(attr, "(jobstreet-id-job-\\d+)", 1), "-"), 4)

  /** F7 `window.__APP` state repair (olx_c226/main.go:111-115): strip
    * assignment prefix and trailing semicolons, quote the four known
    * bare keys so the blob parses as JSON. Brittle string surgery by
    * design — mirrors the reference quirk exactly; fixture-tested.
    */
  def repair_window_app(raw: Column): Column = {
    val stripped =
      regexp_replace(regexp_replace(raw, "^\\s*window\\.__APP\\s*=\\s*", ""), ";\\s*$", "")
    Seq("props", "states", "config", "translations").foldLeft(stripped) { (c, k) =>
      regexp_replace(c, s"(?<=[,\\{])$k:", s""""$k":""")
    }
  }

  /** P1-family gjson path projection: get_json_object with `$.`-rooted
    * paths (apna/main.go:58-86 / jobstreet/main.go:137-169 semantics,
    * including array-index paths like `$.arr[0].name`).
    */
  def json_get(doc: Column, path: String): Column = get_json_object(doc, path)

  /** W1 forward-fill (loker/main.go:37-49): last non-null over document
    * order — expressed as a window; callers supply the window spec
    * (partition/order) because it is data-dependent.
    */
  def forward_fill(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    last(c, ignoreNulls = true).over(w)

  /** ST5 deterministic UA rotation (apna/main.go:48-49 analogue):
    * hash(url) % table picks the identity — replayable, unlike the
    * reference's RNG.
    */
  def ua_pick(url: Column, uas: Seq[String]): Column =
    element_at(array(uas.map(lit(_)): _*),
               (pmod(xxhash64(url), lit(uas.size)) + 1).cast("int"))
}
