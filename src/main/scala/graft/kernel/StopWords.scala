package graft.kernel

/** English stop-word set for T13 (StopWordRemovalModule).
  *
  * The reference imports spaCy's English STOP_WORDS
  * (reference: src/CorpusAid.py:95, used at :376-382). spaCy is not available
  * on the JVM, so the set is vendored here: the well-known 312 base words of
  * the public spaCy `spacy/lang/en/stop_words.py` list plus the contraction
  * suffixes spaCy appends in both straight- and curly-apostrophe forms.
  * Matching is on `token.toLowerCase` exactly as the reference does
  * (src/CorpusAid.py:382). Any residual divergence from a given spaCy release
  * is a documented spec decision (SURVEY.md §7.4 item 3): golden labels are
  * generated from THIS set.
  */
object StopWords {

  private val base: Array[String] =
    ("""a about above across after afterwards again against all almost alone along
already also although always am among amongst amount an and another any anyhow
anyone anything anyway anywhere are around as at back be became because become
becomes becoming been before beforehand behind being below beside besides
between beyond both bottom but by ca call can cannot could did do does doing
done down due during each eight either eleven else elsewhere empty enough even
ever every everyone everything everywhere except few fifteen fifty first five
for former formerly forty four from front full further get give go had has have
he hence her here hereafter hereby herein hereupon hers herself him himself his
how however hundred i if in indeed into is it its itself just keep last latter
latterly least less made make many may me meanwhile might mine more moreover
most mostly move much must my myself name namely neither never nevertheless
next nine no nobody none noone nor not nothing now nowhere of off often on once
one only onto or other others otherwise our ours ourselves out over own part
per perhaps please put quite rather re really regarding same say see seem
seemed seeming seems serious several she should show side since six sixty so
some somehow someone something sometime sometimes somewhere still such take ten
than that the their them themselves then thence there thereafter thereby
therefore therein thereupon these they third this those though three through
throughout thru thus to together too top toward towards twelve twenty two under
unless until up upon us used using various very via was we well were what
whatever when whence whenever where whereafter whereas whereby wherein
whereupon wherever whether which while whither who whoever whole whom whose why
will with within without would yet you your yours yourself yourselves"""
      .split("\\s+").filter(_.nonEmpty))

  private val contractions: Array[String] = {
    val stems = Array("'d", "'ll", "'m", "'re", "'s", "'ve", "n't")
    stems ++ stems.map(_.replace('\'', '’'))
  }

  /** The full set (lower-cased). */
  val set: Set[String] = (base ++ contractions).toSet

  /** Membership test used by the kernel — input must already be lower-cased. */
  @inline def contains(lowerToken: String): Boolean = set.contains(lowerToken)
}
