package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExprs
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.synthweb.SyntheticWeb.mix64

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language identification, document
  * fingerprinting. Everything here is either a pure Catalyst column
  * chain (codegen'd, shuffle-free, pushdown-friendly) or a custom
  * codegen'd expression — no Scala UDFs in hot paths.
  */
object TextOps {

  /** Whitespace token count (0 for blank). */
  def token_count(c: Column): Column =
    when(length(trim(c)) === 0, lit(0))
      .otherwise(size(split(trim(c), "\\s+")))

  /** BPE-ish subword token count: alphabetic runs, digit runs and single
    * punctuation marks each count as one token — a cheap, deterministic
    * stand-in for a real tokenizer's token count at corpus scale.
    */
  def subword_count(c: Column): Column =
    size(filter(
      split(lower(c),
            "(?<=[^a-z0-9])|(?=[^a-z0-9])|(?<=[a-z])(?=[0-9])|(?<=[0-9])(?=[a-z])"),
      x => trim(x) =!= ""))

  /** Lowercased word array (alpha-num runs), empty strings removed —
    * shared tokenization for jaccard/minhash/stopword features.
    * Codegen'd one-pass expression; output is exactly
    * `filter(split(lower(c), "[^a-z0-9]+"), x => x =!= "")`, which
    * evaluated as an interpreted higher-order function plus a regex
    * pass and measurably dominated every tokenizing operator
    * ([[Words.split]] documents the equivalence argument).
    */
  def words(c: Column): Column =
    GraftExprs.toColumn(WordsExpression(GraftExprs.toExpr(c)))

  /** Punctuation character ratio, rounded to 4 decimals. */
  def punct_ratio(c: Column): Column =
    round(
      (length(c) - length(regexp_replace(c, "[\\p{Punct}]", ""))).cast("double")
        / greatest(length(c), lit(1)).cast("double"),
      4)

  /** Fraction of words that are English stopwords (tiny fixed list),
    * rounded to 4 decimals.
    */
  def stopword_ratio(c: Column): Column = {
    val stops = Seq("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")
    val ws = words(c)
    round(
      size(filter(ws, w => w.isin(stops.map(lit(_)): _*))).cast("double")
        / greatest(size(ws), lit(1)).cast("double"),
      4)
  }

  /** Mean word length, rounded to 4 decimals. */
  def mean_word_len(c: Column): Column = {
    val ws = words(c)
    round(
      aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double")
        / greatest(size(ws), lit(1)).cast("double"),
      4)
  }

  /** Composite document quality score in [0,1] (heuristics in the spirit
    * of C4/Gopher quality filters, public recipes): length band, low
    * punctuation noise, some-but-not-all stopwords, sane word length.
    */
  def quality_score(c: Column): Column = {
    val lenScore = least(length(c).cast("double") / lit(500.0), lit(1.0))
    val punctScore = greatest(lit(1.0) - punct_ratio(c) * 5.0, lit(0.0))
    val stopScore = least(stopword_ratio(c) * 5.0, lit(1.0))
    val wlen = mean_word_len(c)
    val wlenScore = when(wlen.between(3.0, 10.0), lit(1.0)).otherwise(lit(0.5))
    round(lenScore * 0.3 + punctScore * 0.3 + stopScore * 0.2 + wlenScore * 0.2, 4)
  }

  /** Language identification — codegen'd custom expression wrapping the
    * deterministic n-gram/stopword heuristic [[LangId.detect]].
    */
  def lang_id(c: Column): Column =
    GraftExprs.toColumn(LangIdExpression(GraftExprs.toExpr(c)))

  /** 64-bit rolling polynomial fingerprint of normalized text —
    * codegen'd custom expression (content-defined, order-sensitive:
    * unlike a set hash, detects reordered plagiarism-style edits).
    */
  def fingerprint64(c: Column): Column =
    GraftExprs.toColumn(Fingerprint64Expression(GraftExprs.toExpr(c)))

  /** sha-256-based content fingerprint over whitespace-normalized,
    * lowercased text — the SQL-expressible exact-dedup key (same
    * normalization is expressible in DuckDB for the oracle).
    */
  def content_key(c: Column): Column =
    sha2(regexp_replace(lower(trim(c)), "\\s+", " "), 256)

  /** Email pattern shared by the redaction + count ops. Alternation-free
    * so Java (Spark) and RE2 (DuckDB oracle) regex dialects agree on
    * every match.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Intl-prefixed phone pattern (+CC-XXX-XXXX style). */
  val PhoneRe = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}"

  /** PII scrub for training corpora: replace every email / phone match
    * with a typed placeholder token. Codegen'd `regexp_replace` chain —
    * row-local, shuffle-free, global replacement.
    */
  def redact_pii(c: Column): Column =
    regexp_replace(regexp_replace(c, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")

  /** Match counts for redaction audit columns. */
  def pii_email_count(c: Column): Column = regexp_count(c, lit(EmailRe))
  def pii_phone_count(c: Column): Column = regexp_count(c, lit(PhoneRe))

  /** Duplicate word-n-gram fraction — the Gopher-style intra-document
    * repetition signal (`1 - distinct_ngrams / total_ngrams`, 0 when the
    * text has fewer than n words). Boilerplate-heavy and looping pages
    * score high; natural prose scores near 0.
    */
  def dup_ngram_fraction(c: Column, n: Int): Column = {
    val total = greatest(size(words(c)) - (n - 1), lit(0)).cast("double")
    val distinctN = size(Dedup.shingles(c, n)).cast("double")
    when(total > 0, round(lit(1.0) - distinctN / total, 4)).otherwise(lit(0.0))
  }
}

/** One-pass tokenizer backing [[TextOps.words]]: Unicode-lowercase the
  * string (the same `UTF8String.toLowerCase` the `lower()` expression
  * calls), then emit maximal runs of ASCII `[a-z0-9]` BYTES. Byte
  * scanning is exact against the former
  * `filter(split(lower(c), "[^a-z0-9]+"), _ != "")` formulation: every
  * non-ASCII character encodes only bytes >= 0x80 in UTF-8, so it can
  * never sit inside an `[a-z0-9]` run, and the regex split's
  * leading/trailing empty strings are exactly the runs this scan never
  * emits. Shared by the expression and tests.
  */
object Words extends Serializable {
  def split(s: UTF8String): ArrayData = {
    val lower = s.toLowerCase
    val bytes = lower.getBytes
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    val n = bytes.length
    while (i < n) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        val start = i
        i += 1
        while (i < n && {
                 val c = bytes(i)
                 (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
               }) i += 1
        out.add(UTF8String.fromBytes(bytes, start, i - start))
      } else i += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size()))
      .asInstanceOf[Array[Any]])
  }
}

case class WordsExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any =
    Words.split(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.Words.split($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Deterministic language-ID heuristic: CJK codepoint fraction decides
  * zh; otherwise per-language marker-stopword hit counts decide among
  * en/de/es/fr (ties broken in that fixed order); "und" when nothing
  * matches. Pure function — shared by the expression and tests.
  */
object LangId extends Serializable {
  private val markers: Seq[(String, Set[String])] = Seq(
    "en" -> Set("the", "and", "of", "is", "to", "in", "that", "it", "with", "for"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "von"),
    "es" -> Set("el", "la", "los", "las", "que", "es", "en", "un", "una", "por"),
    "fr" -> Set("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que")
  )

  def detect(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    var cjk = 0
    var total = 0
    text.codePoints().forEach { cp =>
      if (!Character.isWhitespace(cp)) {
        total += 1
        if ((cp >= 0x4e00 && cp <= 0x9fff) || (cp >= 0x3400 && cp <= 0x4dbf)) cjk += 1
      }
    }
    if (total > 0 && cjk.toDouble / total > 0.2) return "zh"
    val ws = text.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty)
    if (ws.isEmpty) return "und"
    var best = "und"
    var bestHits = 0
    markers.foreach { case (lang, set) =>
      val hits = ws.count(set.contains)
      if (hits > bestHits) { best = lang; bestHits = hits }
    }
    best
  }
}

case class LangIdExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(LangId.detect(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.ops.LangId.detect($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** FNV-1a-style 64-bit rolling hash over the whitespace-normalized,
  * lowercased text (pure function shared with tests).
  */
object Fingerprint64 extends Serializable {
  def apply(text: String): Long = {
    if (text == null) return 0L
    val s = text.toLowerCase.trim.replaceAll("\\s+", " ")
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }
}

case class Fingerprint64Expression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      Fingerprint64(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.Fingerprint64.apply($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
