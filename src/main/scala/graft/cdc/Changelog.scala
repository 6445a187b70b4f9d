package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ArgMaxStrAgg.arg_max_str

/** CDC changelog model and operators.
  *
  * Re-expresses the reference's change-data-capture surface
  * (mapr-db-cdc-sample: `FtsAndGeoServiceJSONWithCDC.java`,
  * `FtsAndGeoServiceBinaryWithCDC.java`) Spark-first. A changelog is a
  * DataFrame of typed change records:
  *
  * {{{
  *   doc_id     string   document key  (ChangeDataRecord.getId)
  *   seq        long     change sequence, total order per doc
  *   ts_us      long     event time, epoch microseconds
  *   op         string   RECORD_INSERT | RECORD_UPDATE | RECORD_DELETE
  *                       (ChangeDataRecordType)
  *   field_path string   changed field ("" = whole-document insert,
  *                       mirroring the empty FieldPath on inserts —
  *                       FtsAndGeoServiceJSONWithCDC.java:124-148)
  *   payload    string   new value, JSON-encoded (ChangeNode value)
  *   amount     double   numeric change metric
  * }}}
  *
  * The synthetic `events` table acts as the changelog source; the
  * mapping is deterministic so a SQL oracle can reproduce it exactly.
  * All operators are plain Catalyst plans: filters push to the scan,
  * window ops shuffle once on doc_id, aggregations are partial-agg
  * friendly. At 100 TB the changelog would arrive partitioned by
  * doc_id (stream shards); nothing here assumes a single partition.
  */
object Changelog {

  val Insert = "RECORD_INSERT"
  val Update = "RECORD_UPDATE"
  val Delete = "RECORD_DELETE"

  /** events → typed change records. Narrow projection: the scan reads
    * only the six source columns; the CASE maps are codegen'd.
    */
  def fromEvents(events: DataFrame): DataFrame =
    events.select(
      concat(lit("user"), col("user_id").cast("string")).as("doc_id"),
      col("event_id").as("seq"),
      unix_micros(col("ts")).as("ts_us"),
      when(col("event_type") === "signup", Insert)
        .when(col("event_type") === "error", Delete)
        .otherwise(Update).as("op"),
      when(col("event_type") === "click", "firstName")
        .when(col("event_type") === "view", "lastName")
        .when(col("event_type") === "purchase", "address")
        .otherwise("").as("field_path"),
      col("props").as("payload"),
      col("value").as("amount"))

  /** Reference FTS routing (FtsAndGeoServiceJSONWithCDC.java:95-188):
    * whole-doc inserts, name-field updates, and delete tombstones are
    * published to the fts_service topic. Pure filter — pushes down.
    */
  def ftsRoute(changelog: DataFrame): DataFrame =
    changelog.filter(
      col("op") === Delete || col("op") === Insert ||
        col("field_path").isin("firstName", "lastName"))
      .select(col("doc_id").as("_id"), col("seq"), col("op").as("operation"),
        lit("json").as("type"), col("field_path"), col("payload"))

  /** Reference geo routing (address changes only; deletes are not
    * forwarded to the geo service — java:109-161,179-186).
    */
  def geoRoute(changelog: DataFrame): DataFrame =
    changelog.filter(
      (col("op") === Insert || col("field_path") === "address") &&
        col("op") =!= Delete)
      .select(col("doc_id").as("_id"), col("seq"), col("op").as("operation"),
        col("payload").as("address"))

  /** Binary-table variant (FtsAndGeoServiceBinaryWithCDC.java): field
    * paths carry the column family (`default.firstName`), values are
    * bytes decoded back to strings (Bytes.toString equivalent). Only
    * the two watched columns are routed — plus delete tombstones,
    * which the reference forwards with no fields (java:deleteDocument).
    */
  def binaryRoute(changelog: DataFrame): DataFrame =
    changelog
      .filter(col("field_path").isin("firstName", "lastName") ||
        col("op") === Delete)
      .select(
        col("doc_id").as("_id"), col("seq"),
        col("op").as("operation"), lit("binary").as("type"),
        when(col("op") === Delete, lit(null).cast("string"))
          .otherwise(concat(lit("default."), col("field_path"))).as("field_path"),
        // bytes round-trip: payload → UTF-8 bytes (ChangeNode.getBinary)
        // → string (Bytes.toString)
        when(col("op") === Delete, lit(null).cast("string"))
          .otherwise(decode(encode(col("payload"), "UTF-8"), "UTF-8")).as("value"))

  /** FTS messages in the reference's wire format
    * (FtsAndGeoServiceJSONWithCDC.java:99-207): deletes are bare
    * `{"_id","operation"}` tombstones; whole-doc inserts carry a
    * `fields_to_index` object with every watched name field
    * (java:126-147); updates carry only the changed field, keyed by
    * its path (java:149-161). One conditional JSON projection —
    * stateless, streaming-safe.
    */
  def ftsMessages(changelog: DataFrame): DataFrame =
    ftsRoute(changelog).select(col("_id"), col("seq"),
      when(col("operation") === Delete,
        to_json(struct(col("_id"), col("operation"))))
        .when(col("operation") === Insert,
          to_json(struct(col("_id"), col("operation"), col("type"),
            map(lit("firstName"), col("payload"),
              lit("lastName"), col("payload")).as("fields_to_index"))))
        .otherwise(to_json(struct(col("_id"), col("operation"), col("type"),
          map(col("field_path"), col("payload")).as("fields_to_index"))))
        .as("message"))

  /** Geo messages in the reference's wire format
    * (FtsAndGeoServiceJSONWithCDC.java:109-114,179-186):
    * `{"_id","operation","address":...}` for inserts and address
    * updates; deletes are never forwarded to the geo service.
    */
  def geoMessages(changelog: DataFrame): DataFrame =
    geoRoute(changelog).select(col("_id"), col("seq"),
      to_json(struct(col("_id"), col("operation"),
        col("address"))).as("message"))

  /** GEO SAVE-BACK ROUND TRIP — the reference's second service loop
    * closed end to end (README.md:28-29: the geo service takes each
    * routed address, gets "the latitude and longitude from the
    * address and save[s] it back into the MapR-DB document"): every
    * [[geoRoute]]d message is geocoded and its coordinates re-enter
    * the changelog as first-class field writes, and the output is
    * the REBUILT enriched document ([[rebuildDocs]] over the merged
    * log) — address-bearing docs now carry `latitude`/`longitude`
    * fields.
    *
    * The geocoder is a DETERMINISTIC STUB (the mm-decode discipline,
    * Multimodal.scala:138 — no geocoding service exists in the test
    * container, so the lookup is a fake behind a real seam):
    * micro-degree coordinates derived from the address digest,
    * `md5(address)` nibbles scaled into [-90e6, 90e6] / [-180e6,
    * 180e6] — engine-portable (the sample_shards strpos replay) and
    * stable under re-delivery, so the save-back stays idempotent.
    *
    * Seq interleaving: original records ride `3·seq`, the latitude
    * write `3·seq + 1`, the longitude write `3·seq + 2` — each
    * coordinate write gets its OWN slot (a shared slot ties doc-level
    * LWW between the two coordinate rows, which argmax breaks
    * nondeterministically), the geocode of op s beats everything up
    * to s, and a delete at s' > s (`3s' > 3s+2`) still tombstones
    * the doc; no seq ties exist, so LWW is total-order deterministic
    * on both engines. (`3·seq` would wrap past seq ≈ 3.07e18 —
    * beyond any event-id space this engine meets, and a runtime
    * guard raise_errors rather than silently diverging from the
    * HUGEINT-widened oracle.) One extra
    * projection + union before the same fieldState aggregation —
    * the save-back costs no additional shuffle over the rebuild it
    * feeds.
    */
  def geoSaveback(changelog: DataFrame): DataFrame =
    rebuildDocs(geoSavebackLog(changelog))

  /** The merged save-back LOG itself — original records at `3·seq`
    * plus the geocode field writes at `3·seq + 1` / `3·seq + 2` —
    * shared by the
    * batch rebuild ([[geoSaveback]]) and the STREAMING compaction
    * path: every expression here is a stateless projection, so the
    * same transform enriches a live changelog stream feeding
    * [[graft.streaming.StateTable.compactionSink]] (StateTableSpec
    * pins stream-materialized ≡ batch-replayed by digest).
    * `ts_us`/`amount` ride through when present so the output stays
    * a full ChangeRecord feed; an enrichment write inherits its
    * triggering record's timestamp.
    */
  def geoSavebackLog(changelog: DataFrame): DataFrame = {
    val extras = Seq("ts_us", "amount").filter(changelog.columns.contains)
    // runtime guard on the tripling bound: Spark's non-ANSI long
    // arithmetic WRAPS seq·3 silently past seq ≈ 3.07e18 while the
    // oracle widens through HUGEINT — a silent-divergence failure
    // mode, so out-of-band seqs fail loudly instead (the
    // nearDupKeepersBest doc_id-packing discipline); negatives are
    // rejected too, since slot interleaving assumes the positive
    // quadrant
    val seqOk = when(
      col("seq") >= 0L && col("seq") <= lit(Long.MaxValue / 3 - 1),
      col("seq"))
      .otherwise(raise_error(concat(
        lit("geoSavebackLog: seq outside triplable [0, 2^63/3): "),
        col("seq").cast("string"))))
    val guarded = changelog.withColumn("seq", seqOk)
    val geo = guarded.filter(
      (col("op") === Insert || col("field_path") === "address") &&
        col("op") =!= Delete)
    val lat = expr("CAST(conv(substring(md5(payload), 1, 6), 16, 10) " +
      "AS BIGINT) * 180000001 div 16777216 - 90000000")
    val lon = expr("CAST(conv(substring(md5(payload), 7, 6), 16, 10) " +
      "AS BIGINT) * 360000001 div 16777216 - 180000000")
    val enrich = geo.select(
      col("doc_id") +: col("seq").as("s0") +: lit(Update).as("op") +:
        explode(array(
          struct(lit(1L).as("slot"), lit("latitude").as("f"),
            lat.cast("string").as("v")),
          struct(lit(2L).as("slot"), lit("longitude").as("f"),
            lon.cast("string").as("v")))).as("w") +: extras.map(col): _*)
      .select(col("doc_id") +:
        (col("s0") * 3 + col("w.slot")).as("seq") +: col("op") +:
        col("w.f").as("field_path") +: col("w.v").as("payload") +:
        extras.map(col): _*)
    val base = guarded.select(
      col("doc_id") +: (col("seq") * 3).as("seq") +: col("op") +:
        col("field_path") +: col("payload") +: extras.map(col): _*)
    base.unionByName(enrich)
  }

  /** FUZZY NAME SEARCH over the routed FTS index — the reference's
    * fts_service topic exists to feed a downstream search service
    * doing "soundex, fuzzy search" on the name fields (README.md:27);
    * this materializes that service's core query: which indexed name
    * TERMS are within Levenshtein ≤ k of each other, with each
    * term's posting size. The index is the ftsMessages wire
    * semantics replayed to its live state (insert writes the payload
    * into BOTH name fields, an update only its field, a winning
    * delete tombstone drops the doc's postings), then fuzzy matching
    * runs on the term DICTIONARY — distinct values, not postings —
    * so ten thousand docs sharing one name cost one dictionary row,
    * never 10⁸ pairs. The pair join rides [[graft.dedup.Dedup
    * .editDistance]]'s Ed-Join kernel per field (rarity-ordered
    * constant-length gram prefixes + length band + banded
    * `levenshtein(a,b,k)` verify — never dictionary²), which is what
    * keeps a 100 TB-scale name dictionary joinable. The phonetic
    * (soundex) half of the same README promise is [[ftsPhonetic]] —
    * an engine-portable hand-rolled key, since Spark's builtin
    * `soundex` has no DuckDB twin.
    */
  /** The live FTS term DICTIONARY — the ftsMessages wire semantics
    * replayed to per-(doc, field) LWW state (insert writes both name
    * fields, an update only its field, a winning delete tombstone
    * drops the doc's postings), aggregated to distinct (field, term)
    * rows with posting sizes. Shared by BOTH downstream search
    * services of README.md:27 ([[ftsFuzzy]] edit-distance,
    * [[ftsPhonetic]] soundex): matching always runs on the
    * dictionary, never the postings — 10⁴ docs sharing a name cost
    * one row. Materialized because every consumer reads it at least
    * twice (pair sides + posting joins).
    */
  def ftsTermDictionary(changelog: DataFrame): DataFrame = {
    val routed = ftsRoute(changelog)
    // each routed message's index writes: deletes wipe both fields
    // (null sentinel), inserts set both, updates set their field
    val writes = routed.select(col("_id"), col("seq"),
        explode(
          when(col("operation") === Insert or col("operation") === Delete,
            array(lit("firstName"), lit("lastName")))
            .otherwise(array(col("field_path")))).as("f"),
        when(col("operation") === Delete, lit(null).cast("string"))
          .otherwise(col("payload")).as("v"))
    // live index: last writer per (doc, field); arg_max_str keeps a
    // null at the winning seq (the tombstone), filtered after
    val idx = writes.groupBy("_id", "f")
      .agg(arg_max_str(col("v"), col("seq")).as("term"))
      .filter(col("term").isNotNull)
    graft.ops.Rounds.materialize(
      idx.groupBy(col("f"), col("term"))
        .agg(count(lit(1)).as("n_docs")))
  }

  def ftsFuzzy(changelog: DataFrame, k: Int = 2): DataFrame = {
    val terms = ftsTermDictionary(changelog)
    // ONE Ed-Join pass over field-PREFIXED terms instead of one per
    // field (halves the pipeline's fixed materialization cost): an
    // identical prefix contributes zero edits, so a same-field
    // pair's distance is EXACTLY the term distance; a cross-field
    // candidate can survive banded verification (term content can
    // absorb prefix differences: "firstName\u0001Q" vs
    // "lastName\u0001meQ" is 5 edits), so pairs are kept by an
    // explicit same-field filter, never by an assumed prefix bound.
    // SOH separates field from term (the digestOfState discipline:
    // boundaries cannot collide; payloads are JSON text, no control
    // bytes).
    val sep = "\u0001"
    val tagged = terms
      .select(concat(col("f"), lit(sep), col("term")).as("doc_id"))
      .withColumn("text", col("doc_id"))
    val pairs = graft.dedup.Dedup.editDistance(tagged, k, q = 2)
      .filter(substring_index(col("doc_a"), sep, 1) ===
        substring_index(col("doc_b"), sep, 1))
      .select(
        substring_index(col("doc_a"), sep, 1).as("field_path"),
        substring_index(col("doc_a"), sep, -1).as("name_a"),
        substring_index(col("doc_b"), sep, -1).as("name_b"),
        col("dist"))
    val na = terms.select(col("f").as("field_path"),
      col("term").as("name_a"), col("n_docs").as("n_docs_a"))
    val nb = terms.select(col("f").as("field_path"),
      col("term").as("name_b"), col("n_docs").as("n_docs_b"))
    pairs.join(na.hint("shuffle_hash"), Seq("field_path", "name_a"))
      .join(nb.hint("shuffle_hash"), Seq("field_path", "name_b"))
      .select(col("field_path"), col("name_a"), col("name_b"),
        col("dist"), col("n_docs_a"), col("n_docs_b"))
  }

  /** AMERICAN SOUNDEX of a term, hand-rolled from the 4 classic
    * rules so BOTH engines replay the identical construction
    * (Spark's builtin `soundex` has no DuckDB twin — the r14 reason
    * phonetic matching stayed un-shipped): (1) letters only,
    * uppercased, first letter kept; (2) H/W are TRANSPARENT — same
    * consonant codes across them collapse — so they are deleted from
    * the tail before coding (a leading H/W survives as the key's
    * letter); (3) consonants map to their code digit, vowels to the
    * run-breaking '0' (same codes across a vowel are kept BOTH);
    * (4) runs of one digit collapse (7 explicit `dd+` regexes —
    * DuckDB's RE2 has no pattern backreferences), the first coded
    * char (the first letter's own slot, already merged with any
    * same-code successors) drops, zeros strip, and the first 3
    * digits pad to `L###`. Null for letterless terms. Verified
    * against the classic published values (Robert→R163,
    * Ashcraft→A261, Tymczak→T522, Pfister→P236, Honeyman→H555).
    */
  private[graft] def soundexKey(term: Column): Column = {
    val letters = upper(regexp_replace(term, "[^A-Za-z]", ""))
    val first = substring(letters, 1, 1)
    val coded = translate(
      concat(first, translate(letters.substr(lit(2), length(letters)),
        "HW", "")),
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "01230120022455012623010202")
    val collapsed = (0 to 6).map(_.toString).foldLeft(coded)((c, d) =>
      regexp_replace(c, d + d + "+", d))
    val digits = translate(
      collapsed.substr(lit(2), length(collapsed)), "0", "")
    when(length(letters) === 0, lit(null).cast("string"))
      .otherwise(concat(first, rpad(substring(digits, 1, 3), 3, "0")))
  }

  /** PHONETIC NAME SEARCH over the routed FTS index — the soundex
    * half of README.md:27's "soundex, fuzzy search" service promise
    * ([[ftsFuzzy]] is the other half): all DICTIONARY term pairs
    * sharing a [[soundexKey]] within the same field, with posting
    * sizes — "Smith" finds "Smyth" at zero edit-distance budget.
    * The equi-join on (field, key) IS the phonetic index: bucket
    * sizes are bounded by homophone-family size (soundex has ~9k
    * possible keys and real name distributions spread them), the
    * dictionary is distinct values so postings never pair, and the
    * whole pipeline is the one LWW index replay + a hash join —
    * nothing corpus-scale shuffles beyond the shared dictionary
    * build.
    */
  def ftsPhonetic(changelog: DataFrame): DataFrame = {
    val keyed = ftsTermDictionary(changelog)
      .select(col("f").as("field_path"), soundexKey(col("term")).as("soundex_key"),
        col("term"), col("n_docs"))
      .filter(col("soundex_key").isNotNull)
    val a = keyed.select(col("field_path"), col("soundex_key"),
      col("term").as("name_a"), col("n_docs").as("n_docs_a"))
    val b = keyed.select(col("field_path"), col("soundex_key"),
      col("term").as("name_b"), col("n_docs").as("n_docs_b"))
    a.join(b.hint("shuffle_hash"), Seq("field_path", "soundex_key"))
      .filter(col("name_b") > col("name_a"))
      .select(col("field_path"), col("soundex_key"), col("name_a"),
        col("name_b"), col("n_docs_a"), col("n_docs_b"))
  }

  /** Last-writer-wins materialization of current per-document state:
    * the "save it back into MapR-DB" half of the reference's loop.
    * Docs whose latest record is a tombstone are dropped.
    *
    * `arg_max_str(x, seq)` aggregation (mutable-buffer argmax →
    * ObjectHashAggregate; the built-in `max_by` falls back to
    * SortAggregate and sorts every partition), not a sort-window:
    * partial
    * aggregates combine map-side, so the single doc_id shuffle moves
    * one row per document — the CDC-compaction shape that survives
    * a 100 TB changelog (a window would sort the whole history).
    */
  def latestState(changelog: DataFrame): DataFrame =
    liveState(compactState(changelog))

  /** Weighted LWW compaction: each input row carries `__w`, the
    * number of raw changes it already stands for (1 for a raw record,
    * its accumulated count for a compacted row), so change counts
    * survive re-compaction.
    */
  private def compactWeighted(cl: DataFrame): DataFrame =
    cl.groupBy("doc_id")
      .agg(max("seq").as("last_seq"),
        arg_max_str(col("op"), col("seq")).as("last_op"),
        arg_max_str(col("field_path"), col("seq")).as("last_field"),
        arg_max_str(col("payload"), col("seq")).as("last_payload"),
        sum(col("__w")).as("n_changes"))

  /** Compacted per-doc state INCLUDING tombstones — the mergeable
    * snapshot format. Deleted docs stay as tombstone rows: a later
    * [[mergeState]] needs the tombstone's seq to beat stale updates,
    * and the running change count to stay replay-accurate. This is
    * what a 100 TB deployment persists between delta merges (the
    * reference's "save it back into the DB" loop, README.md:24-28,
    * as an associative operator instead of point writes).
    */
  def compactState(changelog: DataFrame): DataFrame =
    compactWeighted(changelog.withColumn("__w", lit(1L)))

  private def asWeighted(state: DataFrame): DataFrame =
    state.select(col("doc_id"), col("last_seq").as("seq"),
      col("last_op").as("op"), col("last_field").as("field_path"),
      col("last_payload").as("payload"), col("n_changes").as("__w"))

  /** Incremental view maintenance: fold a changelog delta into a
    * compacted base snapshot. Associative and replay-equivalent by
    * construction — `merge(compact(a), b) == compact(a ∪ b)` — so
    * state at 100 TB is maintained by merging bounded deltas, never
    * by replaying history. The base re-enters as weighted
    * pseudo-changes; one hash aggregation on doc_id does the rest.
    */
  def mergeState(base: DataFrame, delta: DataFrame): DataFrame =
    compactWeighted(
      asWeighted(base).unionByName(
        delta.select(col("doc_id"), col("seq"), col("op"),
          col("field_path"), col("payload"))
          .withColumn("__w", lit(1L))))

  /** Merge two compacted states (compaction is a monoid: snapshots
    * merge with snapshots, not just with raw deltas — what a
    * tree-shaped 1000-executor compaction of many partial snapshots
    * relies on).
    */
  def mergeCompacted(a: DataFrame, b: DataFrame): DataFrame =
    compactWeighted(asWeighted(a).unionByName(asWeighted(b)))

  /** Drop tombstones from a compacted state: the queryable view. */
  def liveState(state: DataFrame): DataFrame =
    state.filter(col("last_op") =!= Delete)

  /** Compact-merge demo plan: split the changelog at its seq
    * midpoint (computed in-plan, broadcast like a scalar subquery),
    * compact BOTH halves in one scan — grouping on (doc_id, half)
    * costs the same shuffle as one compaction — then merge the two
    * compacted snapshots. Must equal [[latestState]] of the full log
    * (its oracle). The shape a real deployment runs every
    * micro-batch, and at backfill time: partial snapshots merging
    * pairwise into the final state.
    */
  def compactMergeDemo(changelog: DataFrame): DataFrame = {
    val bound = changelog.agg(expr("max(seq) div 2").as("__split"))
    val halves = changelog.join(broadcast(bound))
      .withColumn("__half", (col("seq") <= col("__split")).cast("int"))
      .withColumn("__w", lit(1L))
      .groupBy("doc_id", "__half")
      .agg(max("seq").as("last_seq"),
        arg_max_str(col("op"), col("seq")).as("last_op"),
        arg_max_str(col("field_path"), col("seq")).as("last_field"),
        arg_max_str(col("payload"), col("seq")).as("last_payload"),
        sum(col("__w")).as("n_changes"))
    liveState(mergeCompacted(
      halves.filter(col("__half") === 1).drop("__half"),
      halves.filter(col("__half") === 0).drop("__half")))
  }

  /** Field-level last-writer-wins: latest value per (doc_id,
    * field_path), for documents still alive (latest op ≠ delete).
    *
    * Single changelog scan: one (doc_id, field_path) partial
    * aggregation compacts the history map-side; doc-level liveness
    * is then derived FROM that compact state (the doc's overall
    * latest op is the op of its latest field row — seq is a total
    * order per doc, and "" rows carry inserts/deletes), so the raw
    * changelog is never read or shuffled twice. Everything after the
    * first aggregation operates on ~|docs|·|fields| rows.
    */
  def fieldState(changelog: DataFrame): DataFrame = {
    val perField = changelog
      .groupBy("doc_id", "field_path")
      .agg(max("seq").as("as_of_seq"),
        arg_max_str(col("payload"), col("seq")).as("value"),
        arg_max_str(col("op"), col("seq")).as("f_op"))
    // liveness via a window over the compact frame (not a second
    // changelog aggregation — a filter pushed through one branch of a
    // self-join would fork the plan and scan the changelog twice):
    // the doc's overall latest op is the op of its latest field row,
    // "" rows carrying inserts/deletes
    val w = Window.partitionBy("doc_id")
    perField
      .withColumn("last_op", max_by(col("f_op"), col("as_of_seq")).over(w))
      .filter(col("last_op") =!= Delete && col("field_path") =!= "")
      .select(col("doc_id"), col("field_path"), col("value"), col("as_of_seq"))
  }

  /** Rebuild the "enriched document" from field-level state — the
    * reference's consumer assembles the current doc from ChangeNodes
    * and writes it back (README.md:24-28); here it's a deterministic
    * JSON render of [[fieldState]]: fields sorted by path, serialized
    * as an ordered array of {f, v} entries (stable across engines and
    * partitionings, unlike map key order).
    */
  def rebuildDocs(changelog: DataFrame): DataFrame =
    fieldState(changelog)
      .groupBy("doc_id")
      .agg(max("as_of_seq").as("as_of_seq"),
        count(lit(1)).as("n_fields"),
        to_json(array_sort(collect_list(
          struct(col("field_path").as("f"), col("value").as("v")))))
          .as("doc_json"))

  /** Type-2 history: each field change gets a validity interval
    * [seq, next change's seq); the current version is open-ended.
    */
  def scd2(changelog: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id", "field_path").orderBy(col("seq"))
    changelog
      .filter(col("field_path") =!= "")
      .select(col("doc_id"), col("field_path"), col("payload").as("value"),
        col("seq").as("valid_from"),
        lead(col("seq"), 1).over(w).as("valid_to"),
        (lead(col("seq"), 1).over(w).isNull).as("is_current"))
  }

  /** IDEMPOTENT-INGEST audit for an AT-LEAST-ONCE delivery feed: the
    * reference consumer polls Kafka with enable.auto.commit
    * (FtsAndGeoServiceJSONWithCDC.java:59 — a crash between poll and
    * commit REPLAYS records), so every downstream materialization
    * must treat (doc_id, seq) as its idempotency key. Per doc:
    * distinct changes vs raw deliveries and the duplicate ppm — the
    * measured redelivery pressure that sizes a dedup state TTL.
    *
    * Two-level map-side-combined aggregate: the (doc, seq)
    * multiplicity frame first (the idempotency-key view itself),
    * then the per-doc rollup on it — ONE shuffle on the key the
    * stream is already sharded by; the duplicate product widens
    * through DECIMAL(38,0) (the repo ppm rule).
    */
  def redeliveryAudit(deliveries: DataFrame): DataFrame =
    deliveries.groupBy("doc_id", "seq")
      .agg(count(lit(1)).as("m"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_changes"), sum("m").as("n_deliveries"))
      .withColumn("n_dupes", col("n_deliveries") - col("n_changes"))
      .withColumn("dup_ppm", expr(
        "CAST(CAST(n_deliveries - n_changes AS DECIMAL(38,0)) * 1000000 " +
          "div n_deliveries AS BIGINT)"))

  /** Deterministic MALFORMED-FEED generator for the DLQ audit — the
    * three corruption classes a JSON changelog consumer actually
    * meets, injected by seq (first matching rule wins) so any engine
    * replays the identical feed, exactly like [[redeliveryAudit]]'s
    * replayed duplicates:
    *  - `seq % 13 == 0`: payload truncated mid-object (the partial
    *    write / cut-off poll buffer);
    *  - `seq % 17 == 0`: the required key renamed away (producer
    *    schema drift);
    *  - `seq % 19 == 0`: the numeric value arrives as a string (a
    *    type regression upstream).
    */
  def corruptFeed(changelog: DataFrame): DataFrame =
    changelog.withColumn("payload",
      when(col("seq") % 13 === 0,
        expr("substring(payload, 1, length(payload) - 1)"))
        .when(col("seq") % 17 === 0,
          regexp_replace(col("payload"), "\"k\"", "\"v\""))
        .when(col("seq") % 19 === 0, lit("{\"k\": \"x\"}"))
        .otherwise(col("payload")))

  /** DEAD-LETTER ROUTING — classify every record's payload BEFORE it
    * reaches a parser: the ingestion-robustness operator the
    * reference consumer lacks (FtsAndGeoServiceJSONWithCDC.java:120
    * feeds ChangeNode values straight into outbound message JSON —
    * one malformed record throws inside the poll loop and stalls the
    * partition; here it is ROUTED with a reason, never thrown). The
    * cascade names the FIRST failing check: `not_json` (the payload
    * does not parse) → `missing_key` (parses, required key absent) →
    * `bad_type` (key present, value not an integer) → `ok`. Every
    * probe is engine-portable — a whole-document JSON-path test, a
    * key-path test, an anchored integer regex — so the DuckDB oracle
    * replays the exact cascade; and every probe is a scalar
    * projection, so the route is a pushdown-friendly narrow map with
    * no shuffle at any corpus size.
    */
  def dlqRoute(changelog: DataFrame): DataFrame = {
    val kVal = get_json_object(col("payload"), "$.k")
    changelog.withColumn("reason",
      when(get_json_object(col("payload"), "$").isNull, "not_json")
        .when(kVal.isNull, "missing_key")
        .when(!kVal.rlike("^-?[0-9]+$"), "bad_type")
        .otherwise("ok"))
  }

  /** The DLQ rollup an ingestion operator pages on: per reason, how
    * many records, how many distinct documents, and the seq range —
    * one map-side-combined aggregate over [[dlqRoute]]'s projection
    * (`n_docs` is the only exact-distinct term; it shuffles once on
    * `reason`, a ≤4-row key space).
    */
  def dlqAudit(changelog: DataFrame): DataFrame =
    dlqRoute(changelog)
      .groupBy("reason")
      .agg(count(lit(1)).as("n"),
        countDistinct("doc_id").as("n_docs"),
        min("seq").as("min_seq"),
        max("seq").as("max_seq"))

  /** ORDER-INDEPENDENT state digest — the anti-entropy check between
    * a changelog-rebuilt materialization and the source of truth
    * (the reference's README "save back into the DB" loop has
    * exactly this verification gap: did consumer-side state converge
    * to the table?): per surviving op class, row count plus a
    * COMMUTATIVE checksum — the sum of each row's 60-bit md5 prefix
    * over its canonical SOH-joined (\u0001) (doc_id, seq, field, payload)
    * encoding, taken mod 2⁶² so both engines land in int64. Addition
    * commutes: shards and replicas digest independently and only the
    * totals compare — no sort, no row shipping, ONE aggregate over
    * the state frame; any single-row difference moves the sum. The
    * accumulation runs in DECIMAL(38,0) (HUGEINT oracle-side) so
    * 60-bit terms never wrap before the modulus.
    */
  def stateDigest(changelog: DataFrame): DataFrame =
    digestOfState(latestState(changelog))

  /** The digest over an ALREADY-MATERIALIZED live-state frame
    * ((doc_id, last_seq, last_op, last_field, last_payload) columns)
    * — ONE definition shared by [[stateDigest]] (full changelog
    * replay) and [[graft.streaming.StateTable.digest]] (the
    * streaming materialization), so the two paths' digests are
    * comparable BY CONSTRUCTION: equal state => equal digest rows.
    */
  def digestOfState(state: DataFrame): DataFrame =
    state
      .select(col("last_op"),
        // SOH-joined so field boundaries can never collide
        // (("ab","c") vs ("a","bc")); every column is non-null in
        // the live state (concat_ws would silently SKIP a null)
        conv(substring(md5(concat_ws("\u0001", col("doc_id"),
          col("last_seq"), col("last_field"), col("last_payload"))),
          1, 15), 16, 10).cast("decimal(38,0)").as("h"))
      .groupBy("last_op")
      .agg(count(lit(1)).as("n_docs"), sum("h").as("hs"))
      .select(col("last_op"), col("n_docs"),
        expr("CAST(hs % 4611686018427387904 AS BIGINT)").as("digest"))

  /** Topic-PARTITION skew audit — the consumer-parallelism sizing
    * read for the changelog's transport (the reference consumes a
    * partitioned stream; one hot partition caps the whole pipeline's
    * throughput at a single consumer's rate no matter how wide the
    * group is, and a partition dominated by ONE document serializes
    * its compaction/LWW path behind a single key): documents hash to
    * `partitions` buckets by an ENGINE-PORTABLE md5-nibble hash (the
    * sample_shards discipline — both engines derive the identical
    * placement, so the audit is the placement a deployment would
    * actually get from key-hash partitioning), and per partition the
    * report carries message count, distinct-document count, the
    * partition's share of all traffic, and the HOT-DOC share (the
    * largest single document's fraction of the partition — ppm,
    * DECIMAL-widened). Two map-side-combined aggregations; only
    * (partition, doc_id) rows ever shuffle, and the final join reads
    * a localCheckpoint'd |partitions|-row frame, never a second
    * corpus pass.
    */
  def partitionSkew(changelog: DataFrame, partitions: Int = 8): DataFrame = {
    require(partitions > 0, s"partitions ($partitions) must be positive")
    val part = expr(
      s"CAST(conv(substring(md5(doc_id), 1, 4), 16, 10) AS BIGINT) % $partitions")
    val perPart = changelog
      .select(part.as("partition"), col("doc_id"))
      .groupBy("partition", "doc_id").agg(count(lit(1)).as("n"))
      .groupBy("partition")
      .agg(sum("n").as("n_msgs"), count(lit(1)).as("n_docs"),
        max("n").as("max_doc_msgs"))
      .localCheckpoint()
    perPart
      .crossJoin(broadcast(perPart.agg(sum("n_msgs").as("total"))))
      .select(col("partition"), col("n_msgs"), col("n_docs"),
        expr("CAST(CAST(n_msgs AS DECIMAL(38,0)) * 1000000 div total " +
          "AS BIGINT)").as("share_ppm"),
        expr("CAST(CAST(max_doc_msgs AS DECIMAL(38,0)) * 1000000 " +
          "div n_msgs AS BIGINT)").as("hot_doc_ppm"))
  }

  /** Changelog audit: operation counts + amount totals per op type. */
  def opCounts(changelog: DataFrame): DataFrame =
    changelog.groupBy("op")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("doc_id")).as("n_docs"),
        round(sum(col("amount")), 2).as("total_amount"))

  /** Schema-drift audit: payload JSON key histogram per operation —
    * which fields actually appear in the wire payloads, per op type.
    * The detector that catches a producer quietly adding/renaming a
    * field. One explode of the (small) key arrays; aggregation is
    * partial map-side.
    */
  def schemaKeys(changelog: DataFrame): DataFrame =
    changelog
      .select(col("op"), explode(json_object_keys(col("payload"))).as("key"))
      .groupBy("op", "key")
      .agg(count(lit(1)).as("n"))

  /** Event-time cadence + disorder audit per document: change count,
    * activity span, and how often a change arrives (by seq) with an
    * event time EARLIER than something already seen — with the worst
    * lag. The late counters are the measurement that sizes the
    * streaming side's watermark (`withWatermark` too small drops
    * exactly those rows). One window pass per doc partition.
    */
  def disorderAudit(changelog: DataFrame): DataFrame = {
    val seen = Window.partitionBy("doc_id").orderBy("seq")
      .rowsBetween(Window.unboundedPreceding, -1)
    changelog
      .withColumn("max_prior_ts", max(col("ts_us")).over(seen))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_changes"),
        (max(col("ts_us")) - min(col("ts_us"))).as("span_us"),
        count(when(col("ts_us") < col("max_prior_ts"), 1)).as("n_late"),
        coalesce(max(when(col("ts_us") < col("max_prior_ts"),
          col("max_prior_ts") - col("ts_us"))), lit(0L)).as("max_lag_us"))
      .filter(col("n_changes") > 1)
  }

  /** WATERMARK SIZING from the measured disorder — [[disorderAudit]]
    * reports per-doc lateness; this turns the corpus-wide lateness
    * DISTRIBUTION into the streaming knob itself: exact p50/p95/p99
    * of every late event's lag (how far behind the doc's
    * high-water mark it arrived), selected by the shared
    * [[graft.ops.RankSelect]] engine — no global sort, ranks in
    * exact integer basis points (`(n−1)·bp div 10000`, replayable
    * with zero fp anywhere) — plus the recommended watermark
    * `p99 div 1s + 1` in whole seconds: the allowance that admits
    * 99% of observed stragglers, with the max lag alongside so the
    * operator can see what the last 1% would cost. One window pass
    * to the per-row lags, one RankSelect over the single-group lag
    * column, one model-sized assembly row out.
    */
  def watermarkPlan(changelog: DataFrame, bins: Int = 256): DataFrame = {
    val seen = Window.partitionBy("doc_id").orderBy("seq")
      .rowsBetween(Window.unboundedPreceding, -1)
    // group by OP CLASS: inserts/updates/deletes often ride different
    // producer paths (a tombstone sweep batches differently than a
    // hot-field update), so their lateness profiles differ — and the
    // stream's watermark is the max over the per-op recommendations
    val lags = changelog
      .withColumn("max_prior_ts", max(col("ts_us")).over(seen))
      .filter(col("ts_us") < col("max_prior_ts"))
      .select(col("op").as("g"),
        (col("max_prior_ts") - col("ts_us")).as("v"))
    val tot = changelog.groupBy(col("op").as("g"))
      .agg(count(lit(1)).as("n_events"))
    val (sel, bounds) = graft.ops.RankSelect.at(lags, bins,
      graft.ops.RankSelect.intBin(bins), bounds =>
        bounds
          .select(col("g"), col("n"),
            explode(array(lit(5000L), lit(9500L), lit(9900L))).as("q_bp"))
          .select(col("g"), col("q_bp"),
            expr("(n - 1) * q_bp div 10000").as("r")))
    val stats = sel.groupBy("g").agg(
      max(when(col("q_bp") === 5000L, col("v"))).as("p50_lag_us"),
      max(when(col("q_bp") === 9500L, col("v"))).as("p95_lag_us"),
      max(when(col("q_bp") === 9900L, col("v"))).as("p99_lag_us"))
      .join(broadcast(bounds.select(col("g"), col("hi").as("max_lag_us"),
        col("n").as("n_late"))), Seq("g"))
    // an in-order op class has NO late rows: its stats side is empty,
    // and the plan must still answer (zero lateness, the 1-second
    // floor watermark) instead of dropping the row
    tot.join(broadcast(stats), Seq("g"), "left")
      .withColumn("p99c", coalesce(col("p99_lag_us"), lit(0L)))
      .select(col("g").as("op"), col("n_events"),
        coalesce(col("n_late"), lit(0L)).as("n_late"),
        round(coalesce(col("n_late"), lit(0L)).cast("double") /
          col("n_events"), 6).as("late_share"),
        coalesce(col("p50_lag_us"), lit(0L)).as("p50_lag_us"),
        coalesce(col("p95_lag_us"), lit(0L)).as("p95_lag_us"),
        coalesce(col("p99_lag_us"), lit(0L)).as("p99_lag_us"),
        coalesce(col("max_lag_us"), lit(0L)).as("max_lag_us"),
        expr("p99c div 1000000 + 1").as("wm_rec_sec"))
  }

  /** Hot-field detection: change frequency per field path. */
  def fieldFreq(changelog: DataFrame): DataFrame =
    changelog.filter(col("field_path") =!= "")
      .groupBy("field_path")
      .agg(count(lit(1)).as("n_changes"),
        countDistinct(col("doc_id")).as("n_docs"),
        round(avg(col("amount")), 4).as("avg_amount"))

  /** Batch dimension enrichment: change volume per customer segment —
    * the changelog joined to the customer dimension on the embedded
    * user key (batch twin of the streaming `CdcStreams.enrich`).
    * Left join: changes without a profile are kept and reported
    * under a null segment, because CDC audits must not drop rows.
    */
  def enrichBySegment(changelog: DataFrame, customer: DataFrame): DataFrame =
    changelog
      // extract digits explicitly: a doc_id that isn't 'user<digits>'
      // yields a null key (joins nothing, lands in the null segment)
      // on BOTH engines, instead of leaning on cast-garbage semantics
      .withColumn("user_key",
        when(col("doc_id").rlike("^user[0-9]+$"),
          substring(col("doc_id"), 5, Int.MaxValue).cast("long")))
      .join(customer.select(col("c_custkey"), col("c_mktsegment")),
        col("user_key") === col("c_custkey"), "left")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_changes"),
        countDistinct(col("doc_id")).as("n_docs"),
        round(sum(col("amount")), 2).as("total_amount"))

  /** Point-in-time state: the document table as it stood at sequence
    * `asOfSeq` — time travel over the changelog, by construction
    * (replay is a filter; every historical state is derivable).
    */
  def stateAsOf(changelog: DataFrame, asOfSeq: Long): DataFrame =
    latestState(changelog.filter(col("seq") <= asOfSeq))

  /** Snapshot diff: which documents differ between the LWW states at
    * sequence points `seqA < seqB` — ADDED (live only at B), REMOVED
    * (tombstoned in between), or CHANGED (live in both, new writes in
    * between), with the per-doc change count over (A, B].
    *
    * ONE scan and ONE doc_id shuffle for BOTH snapshots: the A-state
    * rides the same aggregation as the B-state via conditional
    * ordinals (`arg_max_str(op, CASE WHEN seq <= A THEN seq END)` —
    * the mutable-buffer argmax ignores null ordinals), instead of
    * materializing two states and joining them. The diff output is
    * bounded by the number of touched docs, never the changelog.
    */
  def snapshotDiff(changelog: DataFrame, seqA: Long, seqB: Long): DataFrame = {
    require(seqA < seqB, "need seqA < seqB")
    changelog.filter(col("seq") <= seqB)
      .groupBy("doc_id")
      .agg(
        max(when(col("seq") <= seqA, col("seq"))).as("seq_a"),
        arg_max_str(col("op"), when(col("seq") <= seqA, col("seq"))).as("op_a"),
        max(col("seq")).as("seq_b"),
        arg_max_str(col("op"), col("seq")).as("op_b"),
        sum(when(col("seq") > seqA, 1L).otherwise(0L)).as("n_between"))
      .withColumn("live_a", col("op_a").isNotNull && col("op_a") =!= "RECORD_DELETE")
      .withColumn("live_b", col("op_b") =!= "RECORD_DELETE")
      .filter(col("live_a") =!= col("live_b") ||
        (col("live_a") && col("live_b") && col("seq_a") =!= col("seq_b")))
      .select(col("doc_id"),
        when(!col("live_a"), "ADDED").when(!col("live_b"), "REMOVED")
          .otherwise("CHANGED").as("change"),
        col("seq_a"), col("seq_b"), col("n_between"))
  }

  /** Tumbling-window change rates: ops per (hour, op type) — the
    * batch twin of the streaming watermarked windowed counts in
    * [[graft.streaming.CdcStreams]]. Window start emitted as epoch
    * micros (raw-time convention shared with the oracle).
    */
  def windowCounts(changelog: DataFrame): DataFrame =
    changelog
      .groupBy(
        unix_micros(date_trunc("hour", timestamp_micros(col("ts_us"))))
          .as("window_start_us"),
        col("op"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("doc_id")).as("n_docs"))

  /** Tombstone-GC audit: [[compactState]] retains every tombstone
    * forever — correctly, because a merge needs the tombstone's seq
    * to beat stale late updates — but once the ingestion watermark
    * has passed a tombstone's seq, no older update can still arrive
    * and the row is pure garbage. This is the report a horizon
    * compaction runs first: docs by status (live / tombstone still
    * inside the horizon / tombstone eligible for GC) with change
    * mass and seq ranges. The horizon here is the integer midpoint
    * of the observed seq range (a deployment passes its real
    * ingestion watermark); the compare is integer-exact. One
    * compaction aggregate + a broadcast single-row horizon — no
    * second corpus pass.
    */
  def tombstoneGc(changelog: DataFrame): DataFrame = {
    val horizon = changelog.agg(
      expr("(min(seq) + max(seq)) div 2").as("h"))
    compactState(changelog)
      .crossJoin(broadcast(horizon))
      .select(
        when(col("last_op") =!= "RECORD_DELETE", "live")
          .when(col("last_seq") <= col("h"), "tombstone_gc_eligible")
          .otherwise("tombstone_retained").as("status"),
        col("n_changes"), col("last_seq"))
      .groupBy("status")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_changes").as("n_changes"),
        min("last_seq").as("oldest_seq"),
        max("last_seq").as("newest_seq"))
  }

  /** SEQUENCE-CONTINUITY audit — the lost-message detector a
    * changelog consumer runs: a topic that should carry every `seq`
    * in its span is scanned for the seqs that never arrived, and the
    * holes report as a GAP-LENGTH HISTOGRAM (gap_len, n_gaps,
    * missing_seqs) — single dropped records read differently from a
    * bulk hole (an offset reset, a dead producer epoch), and the
    * histogram keeps the output bounded where a raw missing-range
    * list could be half the span.
    *
    * No global sort: seqs band by `seq div B` (width from the
    * observed span over a broadcast bounds row — monotone, so band
    * order is seq order), in-band neighbor gaps come from a lead
    * window per band (per-task work = one band), and cross-band gaps
    * from the ≤ `bands` summary frame joined to its next PRESENT
    * band (a broadcast inequality self-join — empty bands between
    * two present ones are part of the hole, not a lost join row).
    * Exact integers end to end.
    */
  def seqGaps(changelog: DataFrame, bands: Int = 64): DataFrame = {
    require(bands > 0, s"bands ($bands) must be positive")
    val s = changelog.select(col("seq"))
    val bounds = s.agg(min("seq").as("s0"), max("seq").as("s1"))
    // NOT materialized: the in-band window and the band summary each
    // re-derive it from the column-pruned seq scan — two cheap scans
    // beat writing a corpus-sized checkpoint whose only job is to be
    // read twice (the bounds broadcast is shared between the
    // subtrees by exchange reuse)
    val banded = s.crossJoin(broadcast(bounds))
      .withColumn("bw", expr(s"(s1 - s0) div $bands + 1"))
      .withColumn("band", expr("(seq - s0) div bw"))
    val inBand = banded
      .withColumn("nxt", lead(col("seq"), 1)
        .over(Window.partitionBy("band").orderBy("seq")))
      .filter(col("nxt") - col("seq") > 1)
      .select((col("nxt") - col("seq") - 1).as("gap_len"))
    val summary = banded.groupBy("band")
      .agg(min("seq").as("bmin"), max("seq").as("bmax"))
      .localCheckpoint() // both sides of the next-present-band join
    val crossBand = summary.as("a")
      .join(broadcast(summary.select(col("band").as("nb"),
        col("bmin").as("nmin"))), col("nb") > col("band"), "left")
      .groupBy(col("band"), col("bmax"))
      .agg(min("nmin").as("next_min"))
      .filter(col("next_min") - col("bmax") > 1)
      .select((col("next_min") - col("bmax") - 1).as("gap_len"))
    inBand.unionByName(crossBand)
      .groupBy("gap_len")
      .agg(count(lit(1)).as("n_gaps"),
        sum("gap_len").as("missing_seqs"))
  }

  /** HOT-DOCUMENT audit — the k most-changed documents per operation
    * class, with their change count and latest seq: the skew report
    * an operator reads before sizing state stores and compactions (a
    * handful of hot keys dominates update volume in every real CDC
    * feed — see [[graft.ops.Relational.skewProfile]] for the
    * key-distribution side of the same story).
    *
    * Deliberately written as the PLAIN row_number-filter idiom: the
    * [[graft.plans.RewriteRankFilterToTopK]] optimizer rule moves it
    * onto the bounded-heap [[graft.plans.TopKPerKey]] path, so per-op
    * work is a k-heap per input partition, never a per-op sort — the
    * committed plan snapshot pins the rewrite firing on exactly this
    * user-shaped query.
    */
  def hotDocs(changelog: DataFrame, k: Int = 5): DataFrame = {
    val counts = changelog.groupBy("op", "doc_id")
      .agg(count(lit(1)).as("n_changes"), max("seq").as("last_seq"))
    val w = Window.partitionBy("op")
      .orderBy(col("n_changes").desc, col("doc_id"))
    counts.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }
}
