package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Public-Suffix-List-backed registrable domains — the correct grain for
  * domain blocklists and per-site aggregation. The 2-label heuristic
  * ([[TextAnalysis.registrableDomain]]) is wrong for every ccSLD
  * ("bbc.co.uk" → "co.uk"); the PSL (publicsuffix.org — public,
  * Mozilla-maintained data) is how real pipelines resolve it.
  *
  * Algorithm (the published PSL spec): split the host into labels; an
  * EXCEPTION rule ("!www.ck") that suffix-matches wins outright and makes
  * the public suffix one label shorter than the rule; otherwise the
  * longest matching rule wins, where a WILDCARD rule ("*.ck") matches any
  * single label in the '*' position; with no match the default rule "*"
  * applies (the last label is the public suffix). The registrable domain
  * is the public suffix plus ONE preceding label — empty when the host IS
  * a public suffix.
  *
  * Spark shape: the rule set compiles into the PLAN as `isInCollection`
  * literals over the candidate label-suffixes — Catalyst turns them into
  * InSet hash probes inside WholeStageCodegen, the same
  * "broadcast-lookup-as-plan-literal" shape as the quality-model weights.
  * Zero joins, zero shuffles, scan speed at 100 TB. The full PSL is
  * ~15 k rules ≈ a few hundred KB of plan literals — fine for a lookup
  * that changes monthly; a deployment that prefers data-plane updates can
  * instead broadcast-join the exploded suffix candidates against a rule
  * table (same semantics, one broadcast).
  *
  * [[SnapshotRules]] is a SUBSET snapshot of the real list (gTLDs, the
  * common ccSLD families, the canonical wildcard/exception pair, and a
  * few private-section entries) — enough to pin the algorithm and the
  * fixture queries; production loads the full published file through the
  * same [[PslRules.parse]].
  */
object Psl {

  /** PSL-format snapshot (subset; see object scaladoc). Comment lines and
    * section markers use the real file's syntax so `parse` is exercised
    * on the format it will see in production.
    */
  val SnapshotRules: Seq[String] = Seq(
    "// ===BEGIN ICANN DOMAINS===",
    "com", "org", "net", "edu", "gov", "mil", "int", "io", "co",
    "// uk",
    "uk", "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk",
    "nhs.uk", "org.uk", "plc.uk", "sch.uk",
    "// au",
    "au", "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au",
    "org.au",
    "// nz",
    "nz", "ac.nz", "co.nz", "govt.nz", "net.nz", "org.nz",
    "// jp",
    "jp", "ac.jp", "ad.jp", "co.jp", "go.jp", "ne.jp", "or.jp",
    "// br",
    "br", "com.br", "gov.br", "net.br", "org.br",
    "// in",
    "in", "ac.in", "co.in", "gov.in", "net.in", "org.in",
    "// cn",
    "cn", "com.cn", "edu.cn", "gov.cn", "net.cn", "org.cn",
    "de", "fr", "it", "nl", "es", "se", "ch", "at", "be", "dk", "no",
    "fi", "pl", "us",
    "// ck : wildcard + exception (the spec's canonical pair)",
    "*.ck",
    "!www.ck",
    "// bd : wildcard-only ccTLD",
    "*.bd",
    "// ===BEGIN PRIVATE DOMAINS===",
    "blogspot.com", "github.io", "gitlab.io", "herokuapp.com",
    "s3.amazonaws.com")

  /** A parsed rule set, grouped by label count for the suffix-candidate
    * probes. `wildcard` stores the suffix AFTER the "*." (rule "*.ck" →
    * "ck"), keyed by ITS label count.
    */
  final case class PslRules(
      exact: Map[Int, Seq[String]],
      wildcard: Map[Int, Seq[String]],
      exceptions: Map[Int, Seq[String]]) {
    val maxK: Int =
      (exact.keys ++ wildcard.keys.map(_ + 1) ++ exceptions.keys ++ Seq(1)).max
  }

  object PslRules {
    def parse(lines: Seq[String]): PslRules = {
      val rules = lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//"))
      def labels(s: String): Int = s.count(_ == '.') + 1
      val (exc, rest) = rules.partition(_.startsWith("!"))
      val (wild, exact) = rest.partition(_.startsWith("*."))
      PslRules(
        exact.groupBy(labels),
        wild.map(_.stripPrefix("*.")).groupBy(labels),
        exc.map(_.stripPrefix("!")).groupBy(labels))
    }
    lazy val snapshot: PslRules = parse(SnapshotRules)
  }

  /** Registrable domain under a PSL rule set — codegen'd Column logic
    * only (split + slice + InSet probes in a when-chain, largest suffix
    * first), no UDF, no join. Empty string when the host is itself a
    * public suffix (or empty). Hosts are expected lowercase
    * ([[TextAnalysis.urlHost]] lowercases).
    */
  def registrableDomain(host: Column,
      rules: PslRules = PslRules.snapshot): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    def suffix(k: Int): Column =
      array_join(slice(labels, -k, k), ".")
    // default rule "*": the last label is always a public suffix
    val base: Column = lit(1)
    // longest matching exact/wildcard rule, built ascending so the
    // largest k lands outermost in the when-chain
    val ruled = (2 to rules.maxK).foldLeft(base) { (acc, k) =>
      val ex = rules.exact.get(k)
        .map(s => suffix(k).isInCollection(s)).getOrElse(lit(false))
      val wc = rules.wildcard.get(k - 1)
        .map(s => suffix(k - 1).isInCollection(s)).getOrElse(lit(false))
      when(n >= k && (ex || wc), lit(k)).otherwise(acc)
    }
    // exceptions beat every rule; public suffix is one label shorter
    val psLen = rules.exceptions.toSeq.sortBy(_._1).foldLeft(ruled) {
      case (acc, (k, s)) =>
        when(n >= k && suffix(k).isInCollection(s), lit(k - 1)).otherwise(acc)
    }
    when(n > psLen && length(host) > 0,
      array_join(slice(labels, (psLen + 1) * -1, psLen + 1), "."))
      .otherwise(lit(""))
  }

  /** The DuckDB replay of [[registrableDomain]] over a host expression —
    * generated from the SAME rule set so both engines probe identical
    * literals. `hostExpr` must be a column/expression name valid in the
    * caller's FROM scope; emits a scalar CASE expression (compute psLen
    * in a CTE first via [[psLenSql]]).
    */
  def psLenSql(hostExpr: String,
      rules: PslRules = PslRules.snapshot): String = {
    def suf(k: Int): String =
      s"array_to_string(list_slice(string_split($hostExpr, '.'), " +
        s"len(string_split($hostExpr, '.')) - ${k - 1}, " +
        s"len(string_split($hostExpr, '.'))), '.')"
    def inList(ss: Seq[String]): String =
      ss.map(s => s"'$s'").mkString("(", ", ", ")")
    val n = s"len(string_split($hostExpr, '.'))"
    val excBranches = rules.exceptions.toSeq.sortBy(-_._1).map { case (k, s) =>
      s"WHEN $n >= $k AND ${suf(k)} IN ${inList(s)} THEN ${k - 1}"
    }
    val ruleBranches = (rules.maxK to 2 by -1).flatMap { k =>
      val ex = rules.exact.get(k).map(s => s"${suf(k)} IN ${inList(s)}")
      val wc = rules.wildcard.get(k - 1)
        .map(s => s"${suf(k - 1)} IN ${inList(s)}")
      val cond = (ex.toSeq ++ wc.toSeq).mkString(" OR ")
      if (cond.isEmpty) None
      else Some(s"WHEN $n >= $k AND ($cond) THEN $k")
    }
    s"CASE ${(excBranches ++ ruleBranches).mkString(" ")} ELSE 1 END"
  }

  /** Registrable-domain SQL given a precomputed psLen column. */
  def regDomainSql(hostExpr: String, psLenExpr: String): String = {
    val n = s"len(string_split($hostExpr, '.'))"
    s"""CASE WHEN $n > $psLenExpr AND length($hostExpr) > 0
       |  THEN array_to_string(list_slice(string_split($hostExpr, '.'),
       |    $n - $psLenExpr, $n), '.')
       |  ELSE '' END""".stripMargin
  }
}
