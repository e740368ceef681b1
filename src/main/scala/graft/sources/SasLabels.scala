package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

/** SAS `proc format` value-label vocabularies.
  *
  * The reference bundles every code→label vocabulary its immigration data
  * uses as one SAS format file (I94_SAS_Labels_Descriptions.SAS: countries
  * `i94cntyl` :9, ports `$i94prtl` :302, travel modes `i94model` :972,
  * states `i94addrl` :981) but its ETL never parses it — only a
  * hand-exported country CSV reaches etl.py (:381). This parser reads ALL
  * the blocks, so a user gets the port/state/mode vocabularies the
  * reference ships but leaves on the floor.
  *
  * Grammar actually exercised by the file (all handled):
  *  - `value <name>` opens a block; a leading `$` (character format, e.g.
  *    `$i94prtl`) is stripped from the exposed name;
  *  - entries are `<key> = <label>` where either side is a bare word/number
  *    or a single-quoted string; `''` inside quotes escapes one quote
  *    (`'INT''L FALLS, MN'` :509); quoted strings may span commas;
  *  - `;` closes the block; SAS block comments (slash-star .. star-slash)
  *    can appear anywhere outside quotes;
  *  - keys and labels are whitespace-padded in-file (`'ALCAN, AK      '`)
  *    — both sides are trimmed, because the padding is SAS fixed-width
  *    cosmetics, not data.
  *
  * Scale note: a format file is configuration, not data. It is parsed on
  * the driver (the whole file is ~1 100 lines) and its vocabularies enter
  * plans as broadcast dimensions for lookup joins — never a shuffled side.
  */
object SasLabels {

  /** Every `value` block in the file: format name (sans `$`) →
    * (key, label) pairs in file order, both trimmed.
    */
  def parse(text: String): Map[String, Seq[(String, String)]] = {
    val toks = tokenize(text)
    val out = collection.mutable.LinkedHashMap.empty[String, Vector[(String, String)]]
    var i = 0
    while (i < toks.length) {
      toks(i) match {
        case Word(w) if w.equalsIgnoreCase("value") && i + 1 < toks.length =>
          val name = toks(i + 1) match {
            case Word(n)   => n.stripPrefix("$")
            case Quoted(n) => n.stripPrefix("$")
            case t => throw new IllegalArgumentException(s"format name expected after 'value', got $t")
          }
          i += 2
          val entries = Vector.newBuilder[(String, String)]
          var open = true
          while (open && i < toks.length) {
            toks(i) match {
              case Semi => open = false; i += 1
              case k @ (Word(_) | Quoted(_))
                if i + 2 < toks.length && toks(i + 1) == Eq =>
                val key = k match { case Word(s) => s; case Quoted(s) => s; case _ => "" }
                val label = toks(i + 2) match {
                  case Word(s)   => s
                  case Quoted(s) => s
                  case t => throw new IllegalArgumentException(s"label expected for key '$key', got $t")
                }
                entries += ((key.trim, label.trim))
                i += 3
              case t => throw new IllegalArgumentException(s"unexpected token in block '$name': $t")
            }
          }
          out(name) = entries.result()
        case _ => i += 1 // prose between blocks (libname, proc format, run)
      }
    }
    out.toMap
  }

  def parseFile(path: String): Map[String, Seq[(String, String)]] =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))

  /** One vocabulary as a broadcast-hinted (code, label) DataFrame — the
    * shape a lookup join wants (the dimension side never shuffles).
    */
  def vocab(spark: SparkSession, path: String, format: String): DataFrame = {
    val entries = parseFile(path).getOrElse(format,
      throw new IllegalArgumentException(
        s"no 'value $format' block in $path (have: ${parseFile(path).keys.mkString(", ")})"))
    import spark.implicits._
    broadcast(entries.toDF("code", "label"))
  }

  /** I94VISA categories — documented only as a comment in the reference
    * file (:1046-1051), never a `value` block; transcribed as the
    * vocabulary it is.
    */
  val visaCategories: Seq[(Long, String)] =
    Seq(1L -> "Business", 2L -> "Pleasure", 3L -> "Student")

  // --- tokenizer ---------------------------------------------------------

  private sealed trait Tok
  private case class Word(s: String) extends Tok
  private case class Quoted(s: String) extends Tok
  private case object Eq extends Tok
  private case object Semi extends Tok

  private def tokenize(text: String): Vector[Tok] = {
    val toks = Vector.newBuilder[Tok]
    val n = text.length
    var i = 0
    while (i < n) {
      val c = text(i)
      if (c == '/' && i + 1 < n && text(i + 1) == '*') {
        val end = text.indexOf("*/", i + 2)
        i = if (end < 0) n else end + 2
      } else if (c == '\'') {
        val sb = new StringBuilder
        i += 1
        var open = true
        while (open) {
          if (i >= n) throw new IllegalArgumentException("unterminated quoted string")
          else if (text(i) == '\'' && i + 1 < n && text(i + 1) == '\'') { sb += '\''; i += 2 }
          else if (text(i) == '\'') { i += 1; open = false }
          else { sb += text(i); i += 1 }
        }
        toks += Quoted(sb.toString)
      } else if (c == '=') { toks += Eq; i += 1 }
      else if (c == ';') { toks += Semi; i += 1 }
      else if (c.isWhitespace) i += 1
      else {
        val start = i
        while (i < n && !text(i).isWhitespace && !"=;'".contains(text(i))
          && !(text(i) == '/' && i + 1 < n && text(i + 1) == '*')) i += 1
        toks += Word(text.substring(start, i))
      }
    }
    toks.result()
  }
}
