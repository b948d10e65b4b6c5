package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Auto-mapping suggestion engine — the reference's stated differentiator
  * (`/root/reference/README.md:12` "human-in-the-loop normalization",
  * `README.md:40` "Auto-mapping suggests a canonical (silver) schema"):
  * given an INFERRED bronze schema (SchemaRegistry output) and the
  * canonical model, propose a reviewable, confidence-scored MappingSpec —
  * per canonical column the best source path, the cast, a confidence, and
  * the runners-up — plus the two honesty reports (canonical columns left
  * unfilled, bronze leaves mapped to nothing). A human approves; the
  * accepted spec persists as a durable sidecar the pipeline loads like any
  * other catalog artifact. Nothing auto-applies below the confidence
  * floor, and an AMBIGUOUS winner (runner-up within 0.9×) refuses
  * auto-apply until a human resolves it.
  *
  * Matching is linguistic + type-based in the Cupid/COMA tradition
  * (schema-matching literature): identifier tokenization (camelCase /
  * snake_case / path segments), token alignment with adjacent-token fusion
  * ("host"+"name" ↔ "hostname"), prefix and edit-distance token
  * similarity, low-weight qualifier tokens, a generic-token rule (a target
  * whose distinguishing token is unmatched scores zero — `natural_id`
  * must not map to a bare `id`), and a castability factor.
  *
  * Scale: pure DRIVER-SIDE metadata work, O(|bronze leaves| × |canonical
  * columns|) over token lists — schema-sized, never data-sized. At 100 TB
  * the suggestion step costs the same as at 1 MB; the one data-touching
  * step stays where it always was (the normalization scan itself).
  */
object AutoMapper {

  /** Auto-apply floor: suggestions below it are reported, never applied. */
  val DefaultFloor = 0.5

  /** A runner-up within this ratio of the winner makes the suggestion
    * AMBIGUOUS — auto-apply refuses until a human accepts or edits.
    */
  val AmbiguityRatio = 0.9

  /** Canonical columns the ENGINE generates (uid, source literal, audit
    * timestamp, raw payload) — never mapping targets.
    */
  val EngineOwned: Set[String] =
    Set("asset_uid", "source_system", "ingest_ts", "raw_json")

  /** Low-information qualifier tokens (weight 0.3): the canonical model's
    * entity self-reference and role prefixes. `asset_name` should match a
    * source's `hostName` on the strength of "name", not demand an "asset"
    * token the source never carries.
    */
  val DefaultQualifiers: Set[String] = Set("primary", "asset")

  /** Generic tokens that cannot DISTINGUISH a target on their own: a
    * target carrying a non-generic token (e.g. `natural` in `natural_id`)
    * refuses every candidate that matches only the generic part — a bare
    * source `id` is claimed by the source-namespaced id column, not by
    * every `*_id` in the model.
    */
  val DefaultGeneric: Set[String] =
    Set("id", "name", "ip", "key", "value", "type", "ts", "time", "date",
      "uid")

  private val QualifierWeight = 0.3
  private val FusionPenalty = 0.95

  /** One scored candidate source path for a target. */
  final case class Candidate(path: Seq[String], sourceType: DataType,
      confidence: Double) {
    def dotted: String = path.mkString(".")
  }

  /** The winning candidate for one canonical target plus its runners-up
    * (confidence-ordered). Ambiguity is relative, not absolute: a 0.95
    * winner over a 0.93 runner-up is a coin flip no matter how high both
    * scores are.
    */
  final case class Suggestion(target: String, targetType: DataType,
      best: Candidate, runnersUp: Seq[Candidate]) {
    def ambiguous: Boolean = runnersUp.headOption
      .exists(_.confidence >= AmbiguityRatio * best.confidence)
  }

  /** The reviewable proposal: confident suggestions, the unfilled /
    * unmapped honesty reports, and a suggested uid triple when the mapped
    * targets support one.
    */
  final case class Proposal(sourceName: String,
      bronze: StructType,
      suggestions: Seq[Suggestion],
      unfilled: Seq[String],
      unmappedSource: Seq[(Seq[String], DataType)],
      uid: Option[UidSpec],
      floor: Double,
      canonical: StructType = CanonicalSchema.schema) {

    def ambiguousTargets: Seq[String] =
      suggestions.filter(_.ambiguous).map(_.target)

    /** The proposal as a frame for human review (also the report a
      * notebook/BI user reads before approving).
      */
    def report(spark: SparkSession): DataFrame = {
      import spark.implicits._
      val rows = suggestions.map { s =>
        (s.target, s.best.dotted, s.best.sourceType.sql,
          s.targetType.sql,
          math.rint(s.best.confidence * 1000) / 1000.0, s.ambiguous,
          s.runnersUp.headOption.map(_.dotted).getOrElse(""),
          s.runnersUp.headOption
            .map(c => math.rint(c.confidence * 1000) / 1000.0)
            .getOrElse(0.0))
      }
      rows.toDF("target", "source_path", "source_type", "target_type",
        "confidence", "ambiguous", "runner_up", "runner_up_confidence")
    }

    /** The mapping the confident, unambiguous suggestions build — every
      * expression cast to the target's canonical type (a no-op when types
      * already agree), so the normalized frame is canonical by
      * construction.
      */
    def mapping(acceptAmbiguous: Set[String] = Set.empty)
        : Map[String, Column] =
      suggestions
        .filter(s => !s.ambiguous || acceptAmbiguous.contains(s.target))
        .map(s => s.target -> pathCol(s.best.path).cast(s.targetType))
        .toMap

    /** Auto-apply: build a runnable [[SourceSpec]] from the proposal.
      * REFUSES when any confident suggestion is ambiguous (a human must
      * accept the winner via `acceptAmbiguous` or edit the spec) and when
      * no uid triple could be suggested and none is supplied — a silently
      * wrong surrogate key poisons every downstream dedup.
      */
    def toSourceSpec(uidOverride: Option[UidSpec] = None,
        acceptAmbiguous: Set[String] = Set.empty,
        jsonOptions: Map[String, String] = SourceSpec.JsonOptions)
        : SourceSpec = {
      val amb = ambiguousTargets.filterNot(acceptAmbiguous)
      require(amb.isEmpty,
        s"refusing to auto-apply mapping for '$sourceName': ambiguous " +
          s"suggestions for ${amb.mkString(", ")} — review the " +
          "runners-up in report() and pass acceptAmbiguous (or hand-edit " +
          "the spec)")
      val u = uidOverride.orElse(uid).getOrElse(
        throw new IllegalArgumentException(
          s"refusing to auto-apply mapping for '$sourceName': no uid " +
            "triple could be suggested from the mapped targets " +
            "(hostname-ish / ip-ish / id-ish); supply uidOverride — a " +
            "wrong surrogate key would poison every downstream dedup"))
      val schema =
        if (bronze.fieldNames.contains(CanonicalSchema.CorruptCol)) bronze
        else StructType(
          StructField(CanonicalSchema.CorruptCol, StringType) +:
            bronze.fields)
      SourceSpec(sourceName, schema, mapping(acceptAmbiguous), u,
        jsonOptions, canonical)
    }
  }

  /** Propose a mapping from a bronze schema into the canonical model.
    *
    * @param sourceName  the source system name; its tokens are stripped
    *                    from target names (the `rapid7_id` column is
    *                    namespaced BY this source, so for it the match is
    *                    on `id`) and targets namespaced by a DIFFERENT
    *                    system score zero via the generic-token rule.
    */
  def suggest(sourceName: String, bronze: StructType,
      canonical: StructType = CanonicalSchema.schema,
      engineOwned: Set[String] = EngineOwned,
      qualifiers: Set[String] = DefaultQualifiers,
      generic: Set[String] = DefaultGeneric,
      floor: Double = DefaultFloor): Proposal = {
    val srcToks = tokens(sourceName).toSet
    val srcLeaves = leaves(bronze)
    val targets = canonical.fields.toSeq
      .filterNot(f => engineOwned.contains(f.name))
    val scored: Seq[(StructField, Seq[Candidate])] = targets.map { t =>
      val tToksAll = tokens(t.name)
      val tToks = {
        val stripped = tToksAll.filterNot(srcToks)
        if (stripped.nonEmpty) stripped else tToksAll
      }
      val cands = srcLeaves.flatMap { case (path, dt) =>
        val c = confidence(tToks, path.flatMap(tokens), t.dataType, dt,
          qualifiers, generic)
        if (c > 0) Some(Candidate(path, dt, c)) else None
      }.sortBy(c => (-c.confidence, c.dotted))
      t -> cands
    }
    val suggestions = scored.collect {
      case (t, best +: rest) if best.confidence >= floor =>
        Suggestion(t.name, t.dataType, best, rest.take(3))
    }
    val mappedPaths = suggestions.map(_.best.path).toSet
    val unfilled = targets.map(_.name)
      .filterNot(suggestions.map(_.target).toSet)
    val unmapped = srcLeaves.filterNot(l => mappedPaths.contains(l._1))
    Proposal(sourceName, bronze, suggestions, unfilled, unmapped,
      suggestUid(sourceName, suggestions), floor, canonical)
  }

  /** Suggest the uid triple from the CONFIDENT, unambiguous targets:
    * hostname-ish (a `hostname`/`host` token), ip-ish (an `ip` token),
    * id-ish (the source-namespaced `<source>_id` if mapped, else an `id`
    * token) — highest confidence wins each slot. None when any slot has
    * no candidate: a guessed uid is worse than a refused one.
    */
  private def suggestUid(sourceName: String,
      suggestions: Seq[Suggestion]): Option[UidSpec] = {
    val usable = suggestions.filterNot(_.ambiguous)
      .sortBy(-_.best.confidence)
    def slot(p: String => Boolean): Option[String] =
      usable.find(s => tokens(s.target).exists(p)).map(_.target)
    val host = slot(t => t == "hostname" || t == "host")
    val ip = slot(_ == "ip")
    val id = usable.find(_.target == s"${sourceName}_id").map(_.target)
      .orElse(slot(_ == "id"))
    for (h <- host; i <- ip; d <- id) yield UidSpec(h, i, d)
  }

  // ---------------------------------------------------------------- score

  /** Confidence of mapping source tokens onto target tokens: greedy
    * best-first alignment of token units (singles + adjacent-pair
    * fusions), Dice-style weighted overlap, a target-coverage factor, the
    * generic-token distinguishing rule, and a castability factor.
    */
  private[engine] def confidence(tToks: Seq[String], sToks: Seq[String],
      tType: DataType, sType: DataType,
      qualifiers: Set[String] = DefaultQualifiers,
      generic: Set[String] = DefaultGeneric): Double = {
    val tf = typeFactor(sType, tType)
    if (tf == 0.0 || tToks.isEmpty || sToks.isEmpty) return 0.0
    def w(tok: String): Double =
      if (qualifiers.contains(tok)) QualifierWeight else 1.0
    // units: (covered indices, text, weight)
    def singles(ts: Seq[String]): Seq[(Set[Int], String, Double)] =
      ts.zipWithIndex.map { case (t, i) => (Set(i), t, w(t)) }
    def fusions(ts: Seq[String]): Seq[(Set[Int], String, Double)] =
      ts.zip(ts.tail).zipWithIndex.map { case ((a, b), i) =>
        (Set(i, i + 1), a + b, w(a) + w(b)) }
    val sA = singles(tToks); val fA = fusions(tToks)
    val sB = singles(sToks); val fB = fusions(sToks)
    // fusion units pair ONLY on exact concatenation ("host"+"name" ↔
    // "hostname") and never fusion↔fusion (two exact single matches
    // already cover that, and a fuzzy fused match would let a generic
    // token swallow its neighbor — "vuln" must not consume
    // "vulnerabilities"+"total" and block the exact total↔total pair)
    val pairs =
      (for { a <- sA; b <- sB; s = tokSim(a._2, b._2); if s > 0 }
        yield (a, b, s)) ++
      (for { a <- sA; b <- fB; if a._2 == b._2 }
        yield (a, b, FusionPenalty)) ++
      (for { a <- fA; b <- sB; if a._2 == b._2 }
        yield (a, b, FusionPenalty))
    // greedy best-first, deterministic tiebreak
    val ordered = pairs.sortBy { case (a, b, sim) =>
      (-sim * (a._3 + b._3), a._2, b._2) }
    var usedA = Set.empty[Int]
    var usedB = Set.empty[Int]
    var contrib = 0.0
    var matchedA = 0.0
    var matchedAIdx = Set.empty[Int]
    ordered.foreach { case (a, b, sim) =>
      if (a._1.intersect(usedA).isEmpty && b._1.intersect(usedB).isEmpty) {
        usedA ++= a._1; usedB ++= b._1
        contrib += sim * (a._3 + b._3)
        matchedA += sim * a._3
        matchedAIdx ++= a._1
      }
    }
    val wA = tToks.map(w).sum
    val wB = sToks.map(w).sum
    if (contrib == 0.0) return 0.0
    // distinguishing rule: a target with non-qualifier, non-generic
    // tokens needs at least one of THEM matched
    val distinguishing = tToks.zipWithIndex.collect {
      case (t, i) if !qualifiers.contains(t) && !generic.contains(t) => i
    }
    if (distinguishing.nonEmpty &&
      distinguishing.forall(i => !matchedAIdx.contains(i))) return 0.0
    val score = contrib / (wA + wB)
    val coverageA = math.min(1.0, matchedA / wA)
    score * (0.7 + 0.3 * coverageA) * tf
  }

  /** Token-pair similarity: exact 1.0, 3+-char prefix 0.85, else edit
    * ratio when ≥ 0.8.
    */
  private def tokSim(a: String, b: String): Double =
    if (a == b) 1.0
    else if (a.length >= 3 && b.length >= 3 &&
      (a.startsWith(b) || b.startsWith(a))) 0.85
    else {
      val r = 1.0 - lev(a, b).toDouble / math.max(a.length, b.length)
      if (r >= 0.8) r else 0.0
    }

  private def lev(a: String, b: String): Int = {
    val prev = new Array[Int](b.length + 1)
    val cur = new Array[Int](b.length + 1)
    for (j <- 0 to b.length) prev(j) = j
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length)
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
          prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      Array.copy(cur, 0, prev, 0, b.length + 1)
    }
    prev(b.length)
  }

  /** Exact type → 1.0; atomic-castable → 0.97 (ties break toward the
    * exact-typed candidate); complex↔atomic or uncastable → 0.
    */
  private def typeFactor(src: DataType, tgt: DataType): Double = {
    def atomic(dt: DataType): Boolean = dt match {
      case _: StructType | _: ArrayType | _: MapType | NullType => false
      case _ => true
    }
    if (src == tgt) 1.0
    else if (atomic(src) && atomic(tgt) &&
      org.apache.spark.sql.catalyst.expressions.Cast.canCast(src, tgt))
      0.97
    else 0.0
  }

  // ------------------------------------------------------------- plumbing

  /** Identifier tokenization: split on `_ - . $` and camelCase
    * boundaries, lowercase; digits stay attached to their word
    * ("rapid7" is ONE token).
    */
  private[engine] def tokens(name: String): Seq[String] =
    name.replace("`", "").replace("$", "")
      .split("[_\\-.\\s]+").toSeq.filter(_.nonEmpty)
      .flatMap { p =>
        p.replaceAll("([a-z0-9])([A-Z])", "$1 $2")
          .replaceAll("([A-Z]+)([A-Z][a-z])", "$1 $2")
          .split(" ").toSeq
      }
      .map(_.toLowerCase).filter(_.nonEmpty)

  /** Flatten a bronze schema to leaf paths. Structs recurse; arrays and
    * maps stay opaque leaves (no canonical target is collection-typed —
    * they land in the unmapped report). The corrupt-capture column is
    * engine plumbing, not data.
    */
  private[engine] def leaves(schema: StructType,
      prefix: Seq[String] = Nil): Seq[(Seq[String], DataType)] =
    schema.fields.toSeq
      .filterNot(f =>
        prefix.isEmpty && f.name == CanonicalSchema.CorruptCol)
      .flatMap { f =>
        f.dataType match {
          case s: StructType => leaves(s, prefix :+ f.name)
          case other => Seq((prefix :+ f.name, other))
        }
      }

  private def quoteSeg(seg: String): String =
    if (seg.matches("[A-Za-z0-9_]+")) seg else s"`$seg`"

  private[engine] def pathCol(path: Seq[String]): Column =
    col(path.map(quoteSeg).mkString("."))

  // ---------------------------------------------------------- persistence

  /** Persist the full proposal (confidences, runners-up, reports) as the
    * human-review artifact — `mapping_proposal` beside the topic's schema
    * artifact, same atomic create-if-absent protocol as every sidecar.
    */
  def persistProposal(spark: SparkSession, dir: String,
      p: Proposal): Unit =
    publish(spark, s"$dir/mapping_proposal", proposalJson(p))

  /** The approval step: validate (same gates as [[Proposal.toSourceSpec]])
    * and persist the ACCEPTED spec as `mapping_spec` — source name, bronze
    * schema, per-column (target, path, cast), uid triple. What the
    * pipeline loads from here on; re-approval of a changed proposal
    * publishes over the old spec explicitly (delete + publish), never
    * silently.
    */
  def approve(spark: SparkSession, dir: String, p: Proposal,
      uidOverride: Option[UidSpec] = None,
      acceptAmbiguous: Set[String] = Set.empty): SourceSpec = {
    val spec = p.toSourceSpec(uidOverride, acceptAmbiguous)
    val u = uidOverride.orElse(p.uid).get
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("source", p.sourceName)
    root.put("schemaJson", p.bronze.json)
    // the canonical model the proposal targeted — a widened canonical
    // (governed-evolution rollout) must survive the sidecar round-trip
    // or a fresh session would normalize into the OLD width
    root.put("canonicalJson", p.canonical.json)
    val uidN = root.putObject("uid")
    uidN.put("hostname", u.hostnameCol)
    uidN.put("ipish", u.ipishCol)
    uidN.put("id", u.idCol)
    val cols = root.putArray("columns")
    p.suggestions
      .filter(s => !s.ambiguous || acceptAmbiguous.contains(s.target))
      .sortBy(_.target)
      .foreach { s =>
        val c = cols.addObject()
        c.put("target", s.target)
        val pn = c.putArray("path")
        s.best.path.foreach(pn.add)
        c.put("type", s.targetType.sql)
      }
    publish(spark, s"$dir/mapping_spec",
      mapper.writeValueAsString(root))
    spec
  }

  /** Load the approved spec from its sidecar — the pipeline's (and a
    * FRESH session's) runnable artifact.
    */
  def loadApproved(spark: SparkSession, dir: String): Option[SourceSpec] = {
    val text = readText(spark, s"$dir/mapping_spec").getOrElse {
      return None
    }
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(text)
    val bronze = DataType.fromJson(root.get("schemaJson").asText())
      .asInstanceOf[StructType]
    val schema =
      if (bronze.fieldNames.contains(CanonicalSchema.CorruptCol)) bronze
      else StructType(
        StructField(CanonicalSchema.CorruptCol, StringType) +:
          bronze.fields)
    val colsN = root.get("columns")
    val mapping = (0 until colsN.size()).map { i =>
      val c = colsN.get(i)
      val pn = c.get("path")
      val path = (0 until pn.size()).map(pn.get(_).asText())
      val dt = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseDataType(c.get("type").asText())
      c.get("target").asText() -> pathCol(path).cast(dt)
    }.toMap
    val uidN = root.get("uid")
    val canonical = Option(root.get("canonicalJson"))
      .map(n => DataType.fromJson(n.asText()).asInstanceOf[StructType])
      .getOrElse(CanonicalSchema.schema) // pre-r14 sidecars
    Some(SourceSpec(root.get("source").asText(), schema, mapping,
      UidSpec(uidN.get("hostname").asText(), uidN.get("ipish").asText(),
        uidN.get("id").asText()),
      canonical = canonical))
  }

  private def proposalJson(p: Proposal): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("source", p.sourceName)
    root.put("floor", p.floor)
    val sugg = root.putArray("suggestions")
    p.suggestions.sortBy(_.target).foreach { s =>
      val n = sugg.addObject()
      n.put("target", s.target)
      n.put("path", s.best.dotted)
      n.put("confidence", math.rint(s.best.confidence * 1000) / 1000.0)
      n.put("ambiguous", s.ambiguous)
      val ru = n.putArray("runnersUp")
      s.runnersUp.foreach { c =>
        val r = ru.addObject()
        r.put("path", c.dotted)
        r.put("confidence", math.rint(c.confidence * 1000) / 1000.0)
      }
    }
    val unf = root.putArray("unfilled")
    p.unfilled.foreach(unf.add)
    val unm = root.putArray("unmappedSource")
    p.unmappedSource.foreach { case (path, dt) =>
      val n = unm.addObject()
      n.put("path", path.mkString("."))
      n.put("type", dt.sql)
    }
    p.uid.foreach { u =>
      val n = root.putObject("uid")
      n.put("hostname", u.hostnameCol)
      n.put("ipish", u.ipishCol)
      n.put("id", u.idCol)
    }
    mapper.writeValueAsString(root)
  }

  // sidecar I/O rides the shared AtomicCreate helpers (a re-approval
  // is a deliberate replace — same contract as a view redefinition)
  private def publish(spark: SparkSession, path: String,
      text: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(path)
    AtomicCreate.replacePublish(
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration), hp,
      text.getBytes("UTF-8"))
  }

  private def readText(spark: SparkSession,
      path: String): Option[String] = {
    val hp = new org.apache.hadoop.fs.Path(path)
    AtomicCreate.readString(
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration), hp)
  }
}
