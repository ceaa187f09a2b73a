package graft.ingest

/** robots.txt evaluation (RFC 9309, the Robots Exclusion Protocol) —
  * the gate every crawl pipeline applies before fetching; URL-frontier
  * filtering at corpus scale is a map-side lookup against a parsed rule
  * set. Semantics per the RFC (and Google's reference parser):
  *
  *  - groups of `User-agent` lines followed by `Allow`/`Disallow` rules;
  *    the group matched is the LONGEST user-agent token that is a
  *    case-insensitive prefix of the product token, falling back to `*`
  *  - rule matching: the rule with the LONGEST matched pattern wins;
  *    on a length tie, `Allow` wins; no match = allowed
  *  - `*` matches any char sequence, `$` anchors the pattern end;
  *    patterns are otherwise literal prefixes
  *  - empty `Disallow:` = allow everything; unknown directives ignored
  */
object RobotsTxt {

  final case class Rule(allow: Boolean, pattern: String)
  final case class RuleSet(groups: Map[String, Seq[Rule]]) {

    /** is `path` fetchable for `agent`? */
    def allowed(agent: String, path: String): Boolean = {
      val a = agent.toLowerCase
      val group = groups.keys.filter(ua => ua != "*" && a.startsWith(ua))
        .toSeq.sortBy(-_.length).headOption
        .orElse(if (groups.contains("*")) Some("*") else None)
      group.map(groups).fold(true) { rules =>
        val hits = rules.filter(r => matchesPath(r.pattern, path))
          .map(r => (r.pattern.length, r.allow))
        if (hits.isEmpty) true
        else hits.maxBy { case (len, allow) => (len, allow) }._2
      }
    }
  }

  /** does `pattern` match `path`? Literal prefix with `*` wildcards and
    * an optional terminal `$` anchor — translated to a quoted regex so
    * path metacharacters can never misfire */
  private[ingest] def matchesPath(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val body = if (anchored) pattern.dropRight(1) else pattern
    val re = body.split("\\*", -1).map(java.util.regex.Pattern.quote)
      .mkString(".*") + (if (anchored) "" else ".*")
    path.matches(re)
  }

  def parse(content: String): RuleSet = {
    val groups = scala.collection.mutable.Map.empty[String, Vector[Rule]]
    var currentAgents: Seq[String] = Seq.empty
    var inRules = false
    content.linesIterator.foreach { raw =>
      val line = raw.split("#", 2)(0).trim
      if (line.nonEmpty) line.split(":", 2) match {
        case Array(k, v) =>
          val key = k.trim.toLowerCase
          val value = v.trim
          key match {
            case "user-agent" =>
              // consecutive user-agent lines share the following rules
              if (inRules) { currentAgents = Seq.empty; inRules = false }
              currentAgents = currentAgents :+ value.toLowerCase
              currentAgents.foreach(a => groups.getOrElseUpdate(a, Vector.empty))
            case "allow" | "disallow" if currentAgents.nonEmpty =>
              inRules = true
              // empty Disallow = allow all (no rule); empty Allow ignored
              if (value.nonEmpty) {
                val rule = Rule(key == "allow", value)
                currentAgents.foreach(a => groups(a) = groups(a) :+ rule)
              }
            case _ => () // crawl-delay, sitemap, unknown: ignored
          }
        case _ => ()
      }
    }
    RuleSet(groups.toMap)
  }
}
