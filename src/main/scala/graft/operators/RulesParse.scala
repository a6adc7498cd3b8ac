package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.MinHash

/** Hierarchical-document parsing and assembly — the reference's
  * rulesCleaning tier re-expressed as Spark transforms.
  *
  * The reference ingests its rules corpus by (a) parsing raw
  * "NUMBER text" lines into structured entries with derived
  * hierarchy columns (reference: rulesCleaning/
  * parse_rules_both_versions.py:34-147 — rule number split, trailing
  * period strip, main-rule vs subrule classification by letter
  * suffix, parent/section derivation, section-name lookup; the
  * per-rule embed_text is the same assembly db/ingest_rules.py:13-33
  * create_rule_embedding_text feeds the embedder — rule number,
  * type, section, parent, text — and the whole parse+embed+assemble
  * sequencing is db/ingest_all.py's pipeline), (b)
  * assembling a "combined" corpus where every subrule is nested
  * under its main rule in `(main, sub, letter)` order with a
  * rendered Subrules block (same file, :149-235
  * create_combined_rules / create_embedding_text_combined), and (c)
  * extracting rule/section cross-references out of free text with
  * case-insensitive regexes (reference: rulesCleaning/
  * glossary_parser.py:55-68 _extract_rule_references — the array
  * that feeds the GIN-indexed `related_rules` column,
  * db/init.sql:134).
  *
  * The testdata carries no rules file, so each document is first
  * rendered INTO a deterministic rule-shaped line (number derived
  * from content via the shared 60-bit md5 hash, identical on both
  * engines — the same trick as q_related_expand's content-derived
  * FK array); everything downstream of that render is the
  * reference's parse/assemble/extract semantics and is what the
  * oracle hash pins.
  *
  * Scale design: the parse and the reference extraction are
  * map-only single scans (zero exchanges, plan-asserted in
  * RulesParseSpec) — at 100 TB they are embarrassingly parallel.
  * The combined assembly shuffles each rule line exactly once on
  * its uniformly-distributed parent key (hash-agg with map-side
  * partials), dedups main rows by key, and joins the two group-level
  * sides (bounded by the rule-number space, broadcastable); output
  * volume is O(corpus) because document assembly is a reshaping op,
  * not a reduction.
  */
object RulesParse extends graft.QueryGroup {

  /** Sections 1..9 (the reference's section_names table).
    * `private[graft]` (like Dedup.IncrMod) so specs re-derive from
    * THESE values — a constant change moves query and test together. */
  private[graft] val NumSections = 9
  /** Sub-numbers per section main rule: "100.0".."100.24". */
  private[graft] val GroupsPerSec = 25
  /** 0 → main rule; 1..3 → subrule letter a/b/c. */
  private[graft] val LetterMod = 4
  /** Modulus for the bare / dotted reference-number offsets. */
  private[graft] val RefOffMod = 20
  /** ~1/[[NoRefMod]] of rendered definitions carry no references. */
  private[graft] val NoRefMod = 8

  // ---- shared deterministic derivation (Spark side) ----

  private def h(tag: String): Column =
    MinHash.hash60(concat(lit(tag), col("doc_id")))

  private def sec: Column = pmod(h("sec:"), lit(NumSections)) + 1
  private def grp: Column = pmod(h("grp:"), lit(GroupsPerSec))
  private def ltr: Column = pmod(h("ltr:"), lit(LetterMod))

  private def letter(c: Column): Column =
    when(c === 1, "a").when(c === 2, "b").otherwise("c")

  /** Render each doc as a raw rules-file line: main rules
    * "100.1. Text" (trailing period), subrules "100.1a Text" — the
    * exact format parse_rules_both_versions.py:52-64 splits.
    * `groupsPerSec` widens the rule-number space for scale smokes
    * (the oracle rows always use [[GroupsPerSec]]). */
  private[graft] def ruleLinesOver(docs: DataFrame,
      groupsPerSec: Int = GroupsPerSec): DataFrame =
    docs
      .select(col("doc_id"), sec.as("sec"),
        pmod(h("grp:"), lit(groupsPerSec)).as("grp"), ltr.as("ltr"),
        substring(col("text"), 1, 40).as("body"))
      .select(col("doc_id"),
        concat((col("sec") * 100).cast("string"), lit("."),
          col("grp").cast("string"),
          when(col("ltr") === 0, lit(". "))
            .otherwise(concat(letter(col("ltr")), lit(" "))),
          col("body")).as("line"))

  private def ruleLines(s: SparkSession, dir: String): DataFrame =
    ruleLinesOver(Tables.documents(s, dir))

  private val SectionCase: Column => Column = n =>
    when(n === "1", "Game Concepts").when(n === "2", "Parts of a Card")
      .when(n === "3", "Card Types").when(n === "4", "Zones")
      .when(n === "5", "Turn Structure")
      .when(n === "6", "Spells, Abilities, and Effects")
      .when(n === "7", "Additional Rules").when(n === "8", "Multiplayer Rules")
      .when(n === "9", "Casual Variants").otherwise("Unknown")

  /** Parse lines back into structured entries (the individual-rules
    * version, parse_rules_both_versions.py:121-147): split on the
    * first space, strip the trailing period, classify main/sub by
    * letter suffix, derive parent rule + section, render the
    * per-rule embedding text (:210-219). */
  private def parsed(s: SparkSession, dir: String): DataFrame =
    parsedOver(ruleLines(s, dir))

  private[graft] def parsedOver(lines: DataFrame): DataFrame = {
    val subrule = col("rule_number").rlike("[a-z]$")
    lines
      .select(col("doc_id"),
        regexp_replace(regexp_extract(col("line"), "^([^ ]+) ", 1),
          "\\.$", "").as("rule_number"),
        regexp_extract(col("line"), "(?s)^[^ ]+ (.*)$", 1).as("rule_text"))
      .select(col("doc_id"), col("rule_number"), col("rule_text"),
        when(subrule, "subrule").otherwise("main_rule").as("rule_type"),
        when(subrule, regexp_replace(col("rule_number"), "[a-z]+$", ""))
          .otherwise(lit(null).cast("string")).as("parent_rule"),
        regexp_extract(col("rule_number"), "^(\\d+)", 1).as("section_parent"))
      .withColumn("section_number", substring(col("section_parent"), 1, 1))
      .withColumn("section_name", SectionCase(col("section_number")))
  }

  /** q_rule_hierarchy — the individual-rules parse, one map-only
    * scan. */
  def ruleHierarchy(s: SparkSession, dir: String): DataFrame =
    parsed(s, dir)
      .select(col("doc_id"), col("rule_number"), col("rule_type"),
        col("parent_rule"), col("section_parent"), col("section_number"),
        col("section_name"), col("rule_text"),
        concat(lit("Rule "), col("rule_number"),
          lit("\nType: "), col("rule_type"),
          lit("\nSection: "), col("section_name"),
          lit("\nParent: "), coalesce(col("parent_rule"), lit("None")),
          lit("\nText: "), col("rule_text")).as("embed_text"))
      .orderBy(col("doc_id").asc)

  /** q_rule_combined — subrules nested under their main rule in
    * `(main, sub, letter)` order (the reference's _sort_key),
    * rendered as the combined embedding text. Main-number collisions
    * (possible in the synthetic render, not the real file) resolve
    * deterministically to the lowest doc_id, mirroring dict-insert
    * semantics made order-free; subrule groups whose main rule never
    * appears are dropped, exactly as :188-192 attaches only to
    * existing parents. */
  /** The assembly core over a parsed-lines frame: dedup mains by
    * key, fold subrules ordered inside the agg buffer, left-join and
    * render. Whole groups in → whole combined rows out, so the same
    * core serves the full rebuild and the affected-group refresh. */
  private[graft] def assembled(p: DataFrame): DataFrame = {
    val mains = p.filter(col("rule_type") === "main_rule")
      .groupBy(col("rule_number"))
      .agg(min_by(col("rule_text"), col("doc_id")).as("main_text"),
        min(col("doc_id")).as("main_doc"),
        min(col("section_name")).as("section_name"))
    val subs = p.filter(col("rule_type") === "subrule")
      .groupBy(col("parent_rule"))
      .agg(count(lit(1)).as("n_subrules"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("rule_number"), col("doc_id"),
              concat(col("rule_number"), lit(": "), col("rule_text"))
                .as("sub_line")))),
            x => x.getField("sub_line")),
          "\n").as("sub_block"))
    mains.join(subs, mains("rule_number") === subs("parent_rule"), "left")
      .select(col("rule_number"), col("section_name"), col("main_doc"),
        coalesce(col("n_subrules"), lit(0L)).as("n_subrules"),
        concat(lit("Rule "), col("rule_number"),
          lit("\nSection: "), col("section_name"),
          lit("\nText: "), col("main_text"),
          when(col("sub_block").isNotNull,
            concat(lit("\nSubrules:\n"), col("sub_block")))
            .otherwise(lit(""))).as("combined_text"))
  }

  private def sortKeyOrder(df: DataFrame): DataFrame =
    df.orderBy(split(col("rule_number"), "\\.").getItem(0).cast("int").asc,
      split(col("rule_number"), "\\.").getItem(1).cast("int").asc)

  def ruleCombined(s: SparkSession, dir: String): DataFrame =
    sortKeyOrder(assembled(parsed(s, dir)))

  /** q_rule_incremental — incremental maintenance of the combined
    * corpus (the 4th member of the O(batch)-refresh family next to
    * q_dedup_incremental / q_ann_incremental / q_text_incremental:
    * every derived table a deployment materializes refreshes without
    * a rebuild). Ids divisible by [[Dedup.IncrMod]] form the ingest
    * batch; a batch line invalidates exactly its parent group, so
    * the refresh re-assembles ONLY affected groups: the corpus is
    * key-filtered by a broadcast semi-join BELOW both grouping
    * aggregations (plan-asserted in RulesParseSpec), making the
    * refresh shuffle O(affected groups' lines) — corpus-size
    * independent for a bounded batch. The oracle recomputes the same
    * groups from the full corpus, so the hash match proves
    * refresh ≡ rebuild; n_batch_docs audits why each group is in
    * the refresh. */
  def ruleIncremental(s: SparkSession, dir: String): DataFrame = {
    val p = parsed(s, dir)
    val key = coalesce(col("parent_rule"), col("rule_number"))
    val batchCounts = p
      .where(pmod(col("doc_id"), lit(Dedup.IncrMod)) === 0)
      .groupBy(key.as("pk")).agg(count(lit(1)).as("n_batch_docs"))
    val affected = p.join(broadcast(batchCounts.select(col("pk"))),
      key === col("pk"), "left_semi")
    sortKeyOrder(
      assembled(affected)
        .join(broadcast(batchCounts), col("rule_number") === col("pk"))
        .select(col("rule_number"), col("section_name"), col("main_doc"),
          col("n_subrules"), col("n_batch_docs"), col("combined_text")))
  }

  // ---- glossary reference extraction ----

  /** Rendered cross-reference mentions: "rule 104", "rule 603.3",
    * "rule 704.5b", "section 4" — one of each form per doc (one
    * repeated, one capitalized, the section clause conditional, and
    * ~1/8 of docs carry no references at all), so the extraction
    * exercises dedup, case-insensitivity, and the empty path. */
  private def definition: Column = {
    val r1 = ((pmod(h("r1:"), lit(NumSections)) + 1) * 100 +
      pmod(h("r1b:"), lit(RefOffMod))).cast("string")
    val r2 = concat(((pmod(h("r2:"), lit(NumSections)) + 1) * 100 +
      pmod(h("r2b:"), lit(RefOffMod))).cast("string"),
      lit("."), pmod(h("r2c:"), lit(10)).cast("string"))
    val r3 = concat(((pmod(h("r3:"), lit(NumSections)) + 1) * 100 +
      pmod(h("r3b:"), lit(RefOffMod))).cast("string"),
      lit("."), pmod(h("r3c:"), lit(10)).cast("string"),
      letter(pmod(h("r3l:"), lit(3)) + 1))
    val s1 = (pmod(h("s1:"), lit(NumSections)) + 1).cast("string")
    val refBlock = concat(lit(" (see Rule "), r1,
      lit(" and rule "), r2, lit(". Compare rule "), r3,
      when(pmod(h("hasS:"), lit(2)) === 1,
        concat(lit("; see also section "), s1)).otherwise(lit("")),
      lit(" and rule "), r2, lit(")"))
    concat(substring(col("text"), 1, 50),
      when(pmod(h("has:"), lit(NoRefMod)) === 0, lit("")).otherwise(refBlock))
  }

  private val RulePat = "(?i)rule\\s+(\\d+(?:\\.\\d+[a-z]*)?)"
  private val SectPat = "(?i)section\\s+(\\d+)"

  /** q_glossary_refs — _extract_rule_references over each rendered
    * definition: both regex families, set-union, sorted — the
    * `related_rules` array the reference GIN-indexes. Map-only.
    * The sorted ref set is emitted comma-joined as a STRING (not a
    * raw array): the driver's pandas comparator cannot sort array
    * cells, and the join is lossless for these dot/digit/letter
    * ref tokens (no token contains a comma). */
  def glossaryRefs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), definition.as("definition"))
      .select(col("doc_id"),
        array_sort(array_distinct(concat(
          regexp_extract_all(col("definition"), lit(RulePat), lit(1)),
          regexp_extract_all(col("definition"), lit(SectPat), lit(1)))))
          .as("refs"))
      .select(col("doc_id"),
        array_join(col("refs"), ",").as("related_rules"),
        size(col("refs")).as("n_refs"))
      .orderBy(col("doc_id").asc)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rule_hierarchy" -> ((s, d) => ruleHierarchy(s, d)),
    "q_rule_combined" -> ((s, d) => ruleCombined(s, d)),
    "q_rule_incremental" -> ((s, d) => ruleIncremental(s, d)),
    "q_glossary_refs" -> ((s, d) => glossaryRefs(s, d)),
  )

  // ---- DuckDB twins of the derivation ----

  private def hSql(tag: String): String =
    MinHash.hash60Sql(s"'$tag' || doc_id")

  private def letterSql(e: String): String =
    s"CASE $e WHEN 1 THEN 'a' WHEN 2 THEN 'b' ELSE 'c' END"

  /** Shared CTE chain: render lines, parse, derive hierarchy — the
    * oracle twin of [[ruleLines]] + [[parsed]]. */
  private val parsedCtes: String =
    s"""d AS (SELECT doc_id, ${hSql("sec:")} % $NumSections + 1 AS sec,
       |             ${hSql("grp:")} % $GroupsPerSec AS grp,
       |             ${hSql("ltr:")} % $LetterMod AS ltr,
       |             substr(text, 1, 40) AS body FROM documents),
       |raw AS (SELECT doc_id,
       |               CAST(sec * 100 AS VARCHAR) || '.' ||
       |               CAST(grp AS VARCHAR) ||
       |               CASE WHEN ltr = 0 THEN '. '
       |                    ELSE ${letterSql("ltr")} || ' ' END ||
       |               body AS line FROM d),
       |p AS (SELECT doc_id,
       |             regexp_replace(regexp_extract(line, '^([^ ]+) ', 1),
       |                            '\\.$$', '') AS rule_number,
       |             regexp_extract(line, '(?s)^[^ ]+ (.*)$$', 1)
       |               AS rule_text FROM raw),
       |e AS (SELECT *,
       |             CASE WHEN regexp_matches(rule_number, '[a-z]$$')
       |                  THEN 'subrule' ELSE 'main_rule' END AS rule_type,
       |             CASE WHEN regexp_matches(rule_number, '[a-z]$$')
       |                  THEN regexp_replace(rule_number, '[a-z]+$$', '')
       |                  END AS parent_rule,
       |             regexp_extract(rule_number, '^(\\d+)', 1)
       |               AS section_parent FROM p),
       |g AS (SELECT *, substr(section_parent, 1, 1) AS section_number,
       |             CASE substr(section_parent, 1, 1)
       |               WHEN '1' THEN 'Game Concepts'
       |               WHEN '2' THEN 'Parts of a Card'
       |               WHEN '3' THEN 'Card Types'
       |               WHEN '4' THEN 'Zones'
       |               WHEN '5' THEN 'Turn Structure'
       |               WHEN '6' THEN 'Spells, Abilities, and Effects'
       |               WHEN '7' THEN 'Additional Rules'
       |               WHEN '8' THEN 'Multiplayer Rules'
       |               WHEN '9' THEN 'Casual Variants'
       |               ELSE 'Unknown' END AS section_name FROM e)""".stripMargin

  /** The oracle twin of [[assembled]]: main dedup + ordered subrule
    * fold + rendered combined text — shared by the rebuild and the
    * incremental oracle so the two can't drift. */
  private val assemblyCtes: String =
    s"""m AS (SELECT rule_number, arg_min(rule_text, doc_id) AS main_text,
       |             min(doc_id) AS main_doc,
       |             min(section_name) AS section_name
       |      FROM g WHERE rule_type = 'main_rule' GROUP BY rule_number),
       |sa AS (SELECT parent_rule, count(*) AS n_subrules,
       |              string_agg(rule_number || ': ' || rule_text, chr(10)
       |                ORDER BY rule_number, doc_id) AS sub_block
       |       FROM g WHERE rule_type = 'subrule' GROUP BY parent_rule)""".stripMargin

  private val combinedTextSql: String =
    """'Rule ' || m.rule_number || chr(10) ||
      |       'Section: ' || m.section_name || chr(10) ||
      |       'Text: ' || m.main_text ||
      |       CASE WHEN sa.sub_block IS NOT NULL
      |            THEN chr(10) || 'Subrules:' || chr(10) || sa.sub_block
      |            ELSE '' END AS combined_text""".stripMargin

  private val sortKeySql: String =
    """ORDER BY CAST(split_part(m.rule_number, '.', 1) AS INT),
      |         CAST(split_part(m.rule_number, '.', 2) AS INT)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_rule_hierarchy" ->
      s"""WITH $parsedCtes
         |SELECT doc_id, rule_number, rule_type, parent_rule,
         |       section_parent, section_number, section_name, rule_text,
         |       'Rule ' || rule_number || chr(10) ||
         |       'Type: ' || rule_type || chr(10) ||
         |       'Section: ' || section_name || chr(10) ||
         |       'Parent: ' || coalesce(parent_rule, 'None') || chr(10) ||
         |       'Text: ' || rule_text AS embed_text
         |FROM g ORDER BY doc_id""".stripMargin,
    "q_rule_combined" ->
      s"""WITH $parsedCtes,
         |$assemblyCtes
         |SELECT m.rule_number, m.section_name, m.main_doc,
         |       coalesce(sa.n_subrules, 0) AS n_subrules,
         |       $combinedTextSql
         |FROM m LEFT JOIN sa ON sa.parent_rule = m.rule_number
         |$sortKeySql""".stripMargin,
    "q_rule_incremental" ->
      s"""WITH $parsedCtes,
         |bc AS (SELECT coalesce(parent_rule, rule_number) AS pk,
         |              count(*) AS n_batch_docs
         |       FROM g WHERE doc_id % ${Dedup.IncrMod} = 0 GROUP BY 1),
         |$assemblyCtes
         |SELECT m.rule_number, m.section_name, m.main_doc,
         |       coalesce(sa.n_subrules, 0) AS n_subrules, bc.n_batch_docs,
         |       $combinedTextSql
         |FROM m JOIN bc ON bc.pk = m.rule_number
         |       LEFT JOIN sa ON sa.parent_rule = m.rule_number
         |$sortKeySql""".stripMargin,
    "q_glossary_refs" -> {
      val r1 = s"CAST((${hSql("r1:")} % $NumSections + 1) * 100 + " +
        s"${hSql("r1b:")} % $RefOffMod AS VARCHAR)"
      val r2 = s"CAST((${hSql("r2:")} % $NumSections + 1) * 100 + " +
        s"${hSql("r2b:")} % $RefOffMod AS VARCHAR) || '.' || " +
        s"CAST(${hSql("r2c:")} % 10 AS VARCHAR)"
      val r3 = s"CAST((${hSql("r3:")} % $NumSections + 1) * 100 + " +
        s"${hSql("r3b:")} % $RefOffMod AS VARCHAR) || '.' || " +
        s"CAST(${hSql("r3c:")} % 10 AS VARCHAR) || " +
        letterSql(s"${hSql("r3l:")} % 3 + 1")
      val s1 = s"CAST(${hSql("s1:")} % $NumSections + 1 AS VARCHAR)"
      s"""WITH defs AS (
         |  SELECT doc_id, substr(text, 1, 50) ||
         |    CASE WHEN ${hSql("has:")} % $NoRefMod = 0 THEN ''
         |         ELSE ' (see Rule ' || $r1 || ' and rule ' || $r2 ||
         |              '. Compare rule ' || $r3 ||
         |              CASE WHEN ${hSql("hasS:")} % 2 = 1
         |                   THEN '; see also section ' || $s1
         |                   ELSE '' END ||
         |              ' and rule ' || $r2 || ')' END AS definition
         |  FROM documents),
         |x AS (SELECT doc_id, list_sort(list_distinct(
         |        regexp_extract_all(definition, '$RulePat', 1) ||
         |        regexp_extract_all(definition, '$SectPat', 1)))
         |        AS refs FROM defs)
         |SELECT doc_id,
         |       coalesce(array_to_string(refs, ','), '') AS related_rules,
         |       CAST(len(refs) AS INT) AS n_refs
         |FROM x ORDER BY doc_id""".stripMargin
    },
  )
}
