package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.{DataFormatException, Inflater}

/** Minimal real PDF text extraction in pure JVM code (no external library
  * ships in this environment; the JDK's Inflater covers FlateDecode, the
  * filter virtually all text PDFs use). Mirrors the reference's
  * per-page PdfReader extraction loop (nlp_data_tagging.py:37-47) at the
  * whole-document level.
  *
  * Scope — the simple-PDF subset, by design:
  *   - streams are located by scanning for `stream`/`endstream` keywords
  *     (no xref table walk), and decoded when their object dictionary
  *     names /FlateDecode (or carries no filter);
  *   - text is pulled from content-stream operators: `Tj`, `'`, `"`
  *     (literal and hex strings) and `TJ` arrays, with PDF escape and
  *     octal sequences decoded; Td, TD, T-star, Tm, BT and ET break lines;
  *   - single-byte strings read as Latin-1 by default; when the document
  *     declares `/WinAnsiEncoding` (or `/MacRomanEncoding`) the
  *     high-byte range is remapped through the JDK's windows-1252 /
  *     x-MacRoman charset tables (WinAnsi differs from Latin-1 exactly
  *     on 0x80-0x9F — the curly quotes/dashes/€ block real-world PDFs
  *     actually use; MacRoman across 0x80-0xFF). Font `/Differences`
  *     arrays overlay the base table (glyph names resolved through an
  *     embedded AGL subset + the uniXXXX forms; unknown names keep the
  *     base reading). Encoding routing is PER FONT: each `/Font`
  *     resource entry resolves its own `/Encoding` (direct name, inline
  *     dict, or indirect object) and the content walker switches tables
  *     on `Tf`, so conflicting per-font `/Differences` decode
  *     independently — the PyPDF2 resource-walk granularity. The
  *     document-wide merge survives as the DEFAULT (strings before any
  *     `Tf`, fonts with no declaration), with WinAnsi
  *     winning a mixed declaration (the common case; 0x00-0x7F agrees
  *     everywhere) and the encoding name only honored in `/Encoding` /
  *     `/BaseEncoding` position, never as loose text; resource names
  *     merge across pages (per-page `/Resources` scoping is the
  *     remaining residue). Hex strings additionally
  *     try the document's ToUnicode CMap (bfchar/bfrange blocks, merged
  *     document-wide) and use it when every code unit maps — the common
  *     CID/Identity-H case; CMap-mapped text is already Unicode and is
  *     never remapped. Per-font CMap routing, encrypted files and
  *     object streams (/ObjStm) remain out of scope and simply yield
  *     whatever simple text the file also contains.
  *
  * Everything here is per-document CPU work on an opaque binary payload —
  * exactly the category the engine isolates from Catalyst (compare
  * MultimodalOps): parsing happens inside one narrow map over the
  * binaryFile scan, never in an expression the optimizer must reason
  * about.
  */
object PdfText {

  /** Extracted text, or None when the payload is not a PDF. A PDF with no
    * extractable simple text yields Some("").
    *
    * Two passes over the document's decoded streams: pass 1 collects
    * ToUnicode CMaps (`beginbfchar`/`beginbfrange` blocks — the mapping
    * table every CID/Identity-H PDF that WANTS its text extractable
    * ships, and the one PyPDF2 consults for composite fonts); pass 2
    * walks the content streams, decoding hex show-strings through the
    * merged CMap when every code unit maps (the common CID case writes
    * CID text as hex strings), falling back to the single-byte reading
    * otherwise. Per-font CMap routing (mixed simple + composite fonts in
    * one document) stays out of scope — it needs the object-graph
    * resource walk; the all-units-map gate keeps the fallback lossless
    * for simple-font hex strings.
    */
  def extract(pdf: Array[Byte]): Option[String] = {
    if (pdf == null || pdf.length < 4 ||
      !(pdf(0) == '%' && pdf(1) == 'P' && pdf(2) == 'D' && pdf(3) == 'F'))
      return None
    // Latin-1 view: one char per byte, lossless round-trip for scanning
    val s = new String(pdf, ISO_8859_1)
    val decoded = Vector.newBuilder[String]
    var idx = s.indexOf("stream")
    while (idx >= 0) {
      if (idx >= 3 && s.regionMatches(idx - 3, "end", 0, 3)) {
        // the "stream" inside "endstream" — not a keyword
        idx = s.indexOf("stream", idx + 1)
      } else {
        var ds = idx + "stream".length
        if (ds < s.length && s.charAt(ds) == '\r') ds += 1
        if (ds < s.length && s.charAt(ds) == '\n') ds += 1
        val e = s.indexOf("endstream", ds)
        if (e < 0) idx = -1
        else {
          val dictStart = math.max(s.lastIndexOf("obj", idx), 0)
          val dict = s.substring(dictStart, idx)
          // trailing EOL before "endstream" belongs to the keyword
          var de = e
          if (de > ds && s.charAt(de - 1) == '\n') de -= 1
          if (de > ds && s.charAt(de - 1) == '\r') de -= 1
          val raw = java.util.Arrays.copyOfRange(pdf, ds, de)
          val data =
            if (dict.contains("/FlateDecode")) inflate(raw)
            else if (dict.contains("/Filter")) None // unsupported filter
            else Some(raw)
          data.map(new String(_, ISO_8859_1)).foreach(decoded += _)
          idx = s.indexOf("stream", e + "endstream".length)
        }
      }
    }
    val streams = decoded.result()
    // defensive: extract() was total before the CMap pass existed; a
    // malformed CMap must degrade to "no mapping", never fail the scan
    // task (extractPdfText has no catch of its own)
    val cmap =
      try mergeCmaps(streams.filter(c =>
        c.contains("beginbfchar") || c.contains("beginbfrange")))
      catch { case scala.util.control.NonFatal(_) => None }
    // document-wide predefined-encoding detection: font dicts live in the
    // raw object text (or in decoded streams); WinAnsi wins a mixed
    // declaration (scaladoc above). The name must appear in ENCODING
    // POSITION — `/Encoding /WinAnsiEncoding` or `/BaseEncoding
    // /WinAnsiEncoding` — not anywhere in the byte soup: the literal
    // text "/WinAnsiEncoding" inside a shown string or comment must not
    // flip the whole document's byte remap (r13 ADVICE).
    // two legal shapes: the direct name (`/Encoding /WinAnsiEncoding`,
    // `/BaseEncoding /WinAnsiEncoding`) and the indirect name OBJECT
    // (`/Encoding 12 0 R` + `12 0 obj /WinAnsiEncoding endobj`) — the
    // object form matches on its `obj`-framed definition, which a shown
    // string cannot fake without writing a whole object header
    val declares = (name: String) => {
      // the indirect form requires the FULL `N G obj` header (r14
      // ADVICE: a bare `obj /Name endobj` alternative could be faked by
      // the literal text of a shown string; a numbered header cannot
      // without writing a whole object)
      val re = ("/(?:Base)?Encoding\\s*/" + name +
        "|\\d+\\s+\\d+\\s+obj\\s*/" + name + "\\s*endobj").r
      re.findFirstIn(s).isDefined ||
        streams.exists(c => re.findFirstIn(c).isDefined)
    }
    val baseEnc =
      if (declares("WinAnsiEncoding")) winAnsiTable
      else if (declares("MacRomanEncoding")) macRomanTable
      else None
    // font /Differences overlays, merged document-wide like the CMaps
    // (per-font routing needs the resource walk — same declared
    // granularity), and honored only in DICT context (inside an
    // `/Encoding <<...>>` dict or an object's own dict) — the same
    // loose-text hardening as the encoding-name detection: the literal
    // text "/Differences [ 65 /eacute ]" inside a shown string must not
    // remap the document. Applied over the base table (Latin-1 identity
    // when no base encoding is declared); names outside the embedded AGL
    // subset keep their base reading — a lossless degrade, same as an
    // unmapped CMap code. Defensive try like the CMap pass: a malformed
    // array must degrade to "no overlay", never fail the scan task.
    val diffs =
      try (s +: streams).map(differencesInDicts).reduce(_ ++ _)
      catch { case scala.util.control.NonFatal(_) => Map.empty[Int, Char] }
    val enc =
      if (diffs.isEmpty) baseEnc
      else {
        val tbl = baseEnc.getOrElse(Array.tabulate(256)(_.toChar)).clone()
        diffs.foreach { case (code, ch) => tbl(code) = ch }
        Some(tbl)
      }
    // PER-FONT encoding routing (the PyPDF2 resource-walk granularity,
    // nlp_data_tagging.py:37-47): each /Font resource entry resolves its
    // OWN /Encoding (direct name, inline dict, or indirect object) into
    // a byte table, and the content walker switches tables on `Tf` — so
    // two fonts with CONFLICTING /Differences no longer corrupt each
    // other's text. Strings shown before any Tf, and fonts that declare
    // no encoding of their own, use the document-wide default above —
    // which also keeps single-font documents bit-identical to the
    // pre-routing behavior. Residue, documented: resource NAMES are
    // merged across pages (per-page /Resources scoping would need the
    // page-tree walk), and ToUnicode CMaps stay document-merged.
    // Defensive try like the other parses: a malformed object graph
    // degrades to document-wide routing, never fails the scan task.
    val fontEncs: Map[String, Array[Char]] =
      try {
        val objs = parseObjects(s)
        fontResources(s, streams, objs).flatMap { case (n, fd) =>
          fontEncoding(fd, objs, baseEnc).map(n -> _)
        }
      } catch {
        case scala.util.control.NonFatal(_) => Map.empty[String, Array[Char]]
      }
    val out = new StringBuilder
    streams.filter(_.contains("BT"))
      .foreach(appendContentText(_, out, cmap, enc, fontEncs))
    Some(out.toString.trim)
  }

  /** Object number → body text (between the `N G obj` header and its
    * `endobj`) for every numbered object in the file — the light
    * object-graph index the per-font encoding walk resolves `N G R`
    * references through. Bodies may include raw stream bytes; the
    * consumers only regex/scan them, so binary content is inert. The
    * LAST definition of a number wins (incremental-update files append
    * redefinitions, and later-wins is the PDF update rule).
    */
  private[sources] def parseObjects(s: String): Map[Int, String] = {
    val out = Map.newBuilder[Int, String]
    "(\\d+)\\s+\\d+\\s+obj\\b".r.findAllMatchIn(s).foreach { m =>
      val e = s.indexOf("endobj", m.end)
      if (e >= 0) out += m.group(1).toInt -> s.substring(m.end, e)
    }
    out.result()
  }

  /** Resource-name → font-dict text, merged across every `/Font`
    * resource dictionary in the document (raw object text and decoded
    * streams): both the inline form (`/Font << /F1 <<…>> /F2 7 0 R >>`)
    * and the indirect form (`/Font 5 0 R`). Entries may be inline dicts
    * or `N G R` references resolved through `objs`. Later definitions
    * win a name collision — the document-wide merge convention (per-page
    * scoping is the declared residue).
    */
  private[sources] def fontResources(s: String, streams: Seq[String],
                                     objs: Map[Int, String]): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val refRe = "^(\\d+)\\s+\\d+\\s+R".r
    def parseFontDict(dict: String): Unit = {
      var i = 0
      while (i < dict.length) {
        if (dict.charAt(i) == '/') {
          val st = i + 1
          var j = st
          while (j < dict.length && !isDelim(dict.charAt(j))) j += 1
          val name = dict.substring(st, j)
          var k = j
          while (k < dict.length && dict.charAt(k).isWhitespace) k += 1
          if (k + 1 < dict.length && dict.charAt(k) == '<' &&
              dict.charAt(k + 1) == '<') {
            val end = math.min(skipDict(dict, k), dict.length)
            if (name.nonEmpty) out(name) = dict.substring(k, end)
            i = end
          } else refRe.findPrefixMatchOf(dict.substring(k)) match {
            case Some(m) =>
              if (name.nonEmpty)
                objs.get(m.group(1).toInt).foreach(out(name) = _)
              i = k + m.end
            case None => i = j
          }
        } else i += 1
      }
    }
    (s +: streams).foreach { t =>
      "/Font\\s*<<".r.findAllMatchIn(t).foreach { m =>
        val open = t.indexOf("<<", m.start)
        if (open >= 0) {
          val end = math.min(skipDict(t, open), t.length)
          // entries only — strip the outer << >> so the first entry name
          // isn't skipped as part of the dict-open token
          if (end - open > 4) parseFontDict(t.substring(open + 2, end - 2))
        }
      }
      "/Font\\s+(\\d+)\\s+\\d+\\s+R".r.findAllMatchIn(t).foreach { m =>
        objs.get(m.group(1).toInt).foreach(parseFontDict)
      }
    }
    out.toMap
  }

  /** One font dict's own byte table: its `/Encoding` value (a direct
    * predefined-encoding name, an inline Encoding dict, or an indirect
    * object holding either) resolved to base table + `/Differences`
    * overlay. `docBase` supplies the base when the font carries
    * differences but no base encoding of its own — the rule that keeps
    * single-font documents identical to the document-wide path. None =
    * the font declares nothing usable, so the caller's document-wide
    * default applies.
    */
  private[sources] def fontEncoding(fontDict: String, objs: Map[Int, String],
                                    docBase: Option[Array[Char]]): Option[Array[Char]] = {
    val encVal: Option[String] =
      "/Encoding(?![0-9A-Za-z])".r.findFirstMatchIn(fontDict).flatMap { m =>
        var k = m.end
        while (k < fontDict.length && fontDict.charAt(k).isWhitespace) k += 1
        if (k >= fontDict.length) None
        else if (fontDict.charAt(k) == '/') {
          var j = k + 1
          while (j < fontDict.length && !isDelim(fontDict.charAt(j))) j += 1
          Some(fontDict.substring(k, j))
        } else if (k + 1 < fontDict.length && fontDict.charAt(k) == '<' &&
            fontDict.charAt(k + 1) == '<')
          Some(fontDict.substring(k,
            math.min(skipDict(fontDict, k), fontDict.length)))
        else
          "^(\\d+)\\s+\\d+\\s+R".r.findPrefixMatchOf(fontDict.substring(k))
            .flatMap(r => objs.get(r.group(1).toInt)).map(_.trim)
      }
    encVal.flatMap { v =>
      val baseName =
        if (v.startsWith("/")) Some(v.drop(1).takeWhile(!isDelim(_)))
        else "/BaseEncoding\\s*/([0-9A-Za-z]+)".r
          .findFirstMatchIn(v).map(_.group(1))
      val baseTbl = baseName match {
        case Some("WinAnsiEncoding") => winAnsiTable
        case Some("MacRomanEncoding") => macRomanTable
        case _ => None
      }
      val diffs = if (v.contains("/Differences")) parseDifferences(v)
                  else Map.empty[Int, Char]
      if (diffs.isEmpty) baseTbl
      else {
        val tbl = baseTbl.orElse(docBase)
          .getOrElse(Array.tabulate(256)(_.toChar)).clone()
        diffs.foreach { case (code, ch) => tbl(code) = ch }
        Some(tbl)
      }
    }
  }

  /** 256-entry byte→char table from a JDK charset; bytes the charset
    * leaves undefined (windows-1252 has five) keep their Latin-1
    * identity rather than becoming U+FFFD. None when the charset is
    * absent from this JVM — extraction then stays on Latin-1 instead of
    * failing.
    */
  private def byteTable(charsetName: String): Option[Array[Char]] =
    try {
      val cs = java.nio.charset.Charset.forName(charsetName)
      val arr = new Array[Char](256)
      var b = 0
      while (b < 256) {
        val decoded = new String(Array(b.toByte), cs)
        arr(b) =
          if (decoded.length == 1 && decoded.charAt(0) != '�')
            decoded.charAt(0)
          else b.toChar
        b += 1
      }
      Some(arr)
    } catch { case scala.util.control.NonFatal(_) => None }

  private lazy val winAnsiTable: Option[Array[Char]] =
    byteTable("windows-1252")
  private lazy val macRomanTable: Option[Array[Char]] =
    byteTable("x-MacRoman")

  /** [[parseDifferences]] restricted to DICT context: only `/Differences`
    * arrays inside an `/Encoding <<...>>` dictionary (the inline form) or
    * inside an object's own `N G obj <<...>>` dictionary (the indirect
    * Encoding-dict form) are honored — a `/Differences` appearing as
    * shown TEXT in a content stream is outside both and ignored, the
    * same loose-text hardening the encoding-name detection applies. A
    * forged object header inside a string remains out of scope, the
    * documented residue of document-wide (non-resource-walk) granularity.
    */
  private[sources] def differencesInDicts(t: String): Map[Int, Char] = {
    val out = Map.newBuilder[Int, Char]
    def scanFrom(pattern: scala.util.matching.Regex): Unit =
      pattern.findAllMatchIn(t).foreach { m =>
        val open = t.indexOf("<<", m.start)
        if (open >= 0) {
          val end = math.min(skipDict(t, open), t.length)
          val dict = t.substring(open, end)
          if (dict.contains("/Differences")) out ++= parseDifferences(dict)
        }
      }
    scanFrom("/Encoding\\s*<<".r)
    scanFrom("\\d+\\s+\\d+\\s+obj\\s*<<".r)
    out.result()
  }

  /** Every `/Differences [ code /name code /name ... ]` array in `t`,
    * resolved to code → char through [[glyphChar]]: an integer element
    * sets the current code, each following name maps code++ (the PDF
    * spec's Encoding-dict rule). Codes outside 0-255 and names outside
    * the glyph subset are skipped (they keep the base-encoding reading).
    * Later arrays win a merge conflict — the document-wide-merge
    * convention the CMap pass already uses.
    */
  private[sources] def parseDifferences(t: String): Map[Int, Char] = {
    val out = Map.newBuilder[Int, Char]
    var from = t.indexOf("/Differences")
    while (from >= 0) {
      val open = t.indexOf('[', from)
      // only an immediate array (whitespace between) is the dict entry
      if (open >= 0 && t.substring(from + "/Differences".length, open)
          .forall(_.isWhitespace)) {
        var i = open + 1
        var code = -1
        var done = false
        while (i < t.length && !done) {
          val c = t.charAt(i)
          if (c == ']') done = true
          else if (c.isDigit) {
            var v = 0
            while (i < t.length && t.charAt(i).isDigit) {
              v = v * 10 + (t.charAt(i) - '0'); i += 1
            }
            code = v
            i -= 1 // outer i += 1 below
          } else if (c == '/') {
            i += 1
            val st = i
            while (i < t.length && !isDelim(t.charAt(i))) i += 1
            if (code >= 0 && code < 256)
              glyphChar(t.substring(st, i)).foreach(ch => out += code -> ch)
            if (code >= 0) code += 1
            i -= 1
          }
          i += 1
        }
      }
      from = t.indexOf("/Differences", from + 1)
    }
    out.result()
  }

  /** Glyph name → char: the `uniXXXX`/`uXXXX` forms, single-character
    * names (letters/digits name themselves in the AGL), and an embedded
    * subset of the Adobe Glyph List covering ASCII punctuation, the
    * WinAnsi/Latin-1 repertoire and the common typographic set — the
    * names real Type1 /Differences arrays overwhelmingly use. Unknown
    * names → None (callers keep the base-encoding byte).
    */
  private[sources] def glyphChar(name: String): Option[Char] =
    if (name.length == 1 && name.charAt(0).isLetterOrDigit)
      Some(name.charAt(0))
    else if ((name.startsWith("uni") && name.length == 7) ||
      (name.startsWith("u") && (name.length == 5 || name.length == 7))) {
      val hex = if (name.startsWith("uni")) name.substring(3)
                else name.substring(1)
      // a u-prefixed name whose tail is NOT hex (e.g. `uring` for ů)
      // falls through to the AGL table instead of being shadowed by the
      // failed parse (r14 ADVICE) — the hex reading wins only when it
      // actually parses, per the AGL's own uXXXX rule
      (try {
        val v = Integer.parseInt(hex, 16)
        if (v >= 0 && v <= 0xFFFF) Some(v.toChar) else None
      } catch { case _: NumberFormatException => None })
        .orElse(aglSubset.get(name))
    } else aglSubset.get(name)

  private lazy val aglSubset: Map[String, Char] = Map(
    // ASCII punctuation and symbols
    "space" -> ' ', "exclam" -> '!', "quotedbl" -> '"',
    "numbersign" -> '#', "dollar" -> '$', "percent" -> '%',
    "ampersand" -> '&', "quotesingle" -> '\'', "parenleft" -> '(',
    "parenright" -> ')', "asterisk" -> '*', "plus" -> '+',
    "comma" -> ',', "hyphen" -> '-', "period" -> '.', "slash" -> '/',
    "zero" -> '0', "one" -> '1', "two" -> '2', "three" -> '3',
    "four" -> '4', "five" -> '5', "six" -> '6', "seven" -> '7',
    "eight" -> '8', "nine" -> '9', "colon" -> ':', "semicolon" -> ';',
    "less" -> '<', "equal" -> '=', "greater" -> '>', "question" -> '?',
    "at" -> '@', "bracketleft" -> '[', "backslash" -> '\\',
    "bracketright" -> ']', "asciicircum" -> '^', "underscore" -> '_',
    "grave" -> '`', "braceleft" -> '{', "bar" -> '|', "braceright" -> '}',
    "asciitilde" -> '~',
    // typographic set (the WinAnsi 0x80-0x9F block and friends)
    "quoteleft" -> '‘', "quoteright" -> '’',
    "quotedblleft" -> '“', "quotedblright" -> '”',
    "quotesinglbase" -> '‚', "quotedblbase" -> '„',
    "endash" -> '–', "emdash" -> '—', "bullet" -> '•',
    "dagger" -> '†', "daggerdbl" -> '‡',
    "ellipsis" -> '…', "perthousand" -> '‰',
    "guilsinglleft" -> '‹', "guilsinglright" -> '›',
    "florin" -> 'ƒ', "fraction" -> '⁄', "Euro" -> '€',
    "trademark" -> '™', "minus" -> '−',
    "fi" -> 'ﬁ', "fl" -> 'ﬂ',
    "circumflex" -> 'ˆ', "caron" -> 'ˇ', "breve" -> '˘',
    "dotaccent" -> '˙', "ring" -> '˚', "ogonek" -> '˛',
    "tilde" -> '˜', "hungarumlaut" -> '˝',
    "OE" -> 'Œ', "oe" -> 'œ', "Scaron" -> 'Š',
    "scaron" -> 'š', "Ydieresis" -> 'Ÿ', "Zcaron" -> 'Ž',
    "zcaron" -> 'ž', "dotlessi" -> 'ı',
    // Latin-1 supplement (0xA0-0xFF), by AGL name
    "exclamdown" -> '¡', "cent" -> '¢', "sterling" -> '£',
    "currency" -> '¤', "yen" -> '¥', "brokenbar" -> '¦',
    "section" -> '§', "dieresis" -> '¨', "copyright" -> '©',
    "ordfeminine" -> 'ª', "guillemotleft" -> '«',
    "logicalnot" -> '¬', "registered" -> '®', "macron" -> '¯',
    "degree" -> '°', "plusminus" -> '±', "twosuperior" -> '²',
    "threesuperior" -> '³', "acute" -> '´', "mu" -> 'µ',
    "paragraph" -> '¶', "periodcentered" -> '·',
    "cedilla" -> '¸', "onesuperior" -> '¹',
    "ordmasculine" -> 'º', "guillemotright" -> '»',
    "onequarter" -> '¼', "onehalf" -> '½',
    "threequarters" -> '¾', "questiondown" -> '¿',
    "Agrave" -> 'À', "Aacute" -> 'Á', "Acircumflex" -> 'Â',
    "Atilde" -> 'Ã', "Adieresis" -> 'Ä', "Aring" -> 'Å',
    "AE" -> 'Æ', "Ccedilla" -> 'Ç', "Egrave" -> 'È',
    "Eacute" -> 'É', "Ecircumflex" -> 'Ê', "Edieresis" -> 'Ë',
    "Igrave" -> 'Ì', "Iacute" -> 'Í', "Icircumflex" -> 'Î',
    "Idieresis" -> 'Ï', "Eth" -> 'Ð', "Ntilde" -> 'Ñ',
    "Ograve" -> 'Ò', "Oacute" -> 'Ó', "Ocircumflex" -> 'Ô',
    "Otilde" -> 'Õ', "Odieresis" -> 'Ö', "multiply" -> '×',
    "Oslash" -> 'Ø', "Ugrave" -> 'Ù', "Uacute" -> 'Ú',
    "Ucircumflex" -> 'Û', "Udieresis" -> 'Ü', "Yacute" -> 'Ý',
    "Thorn" -> 'Þ', "germandbls" -> 'ß',
    "agrave" -> 'à', "aacute" -> 'á', "acircumflex" -> 'â',
    "atilde" -> 'ã', "adieresis" -> 'ä', "aring" -> 'å',
    "ae" -> 'æ', "ccedilla" -> 'ç', "egrave" -> 'è',
    "eacute" -> 'é', "ecircumflex" -> 'ê', "edieresis" -> 'ë',
    "igrave" -> 'ì', "iacute" -> 'í', "icircumflex" -> 'î',
    "idieresis" -> 'ï', "eth" -> 'ð', "ntilde" -> 'ñ',
    "ograve" -> 'ò', "oacute" -> 'ó', "ocircumflex" -> 'ô',
    "otilde" -> 'õ', "odieresis" -> 'ö', "divide" -> '÷',
    "oslash" -> 'ø', "ugrave" -> 'ù', "uacute" -> 'ú',
    "ucircumflex" -> 'û', "udieresis" -> 'ü', "yacute" -> 'ý',
    "thorn" -> 'þ', "ydieresis" -> 'ÿ')

  /** Bounded hex-code parse: CMap codes wider than 4 bytes (or past
    * Int.MaxValue) are skipped, not crashed on — real UCS-4 codespaces
    * carry up-to-8-digit tokens that overflowed the original
    * Integer.parseInt (r12 review fix).
    */
  private def hexCode(d: String): Option[Int] =
    if (d.isEmpty || d.length > 8) None
    else {
      val v = java.lang.Long.parseLong(d, 16)
      if (v <= Int.MaxValue) Some(v.toInt) else None
    }

  /** Widest bfrange a single entry may expand to; wider (usually
    * corrupt) ranges are skipped so one adversarial PDF cannot
    * materialize a multi-million-entry map per stream — skipped codes
    * just fall back to the single-byte reading (lossless contract).
    */
  private val MaxBfRangeSpan = 65535

  /** A merged ToUnicode mapping: code byte width + code → text. */
  private[sources] case class ToUnicode(codeBytes: Int, map: Map[Int, String])

  private def mergeCmaps(cmaps: Seq[String]): Option[ToUnicode] =
    if (cmaps.isEmpty) None
    else {
      val parsed = cmaps.map(parseCmap)
      // one code width per document in the common case; mixed widths
      // would need per-font routing, so take the widest (Identity-H = 2)
      Some(ToUnicode(parsed.map(_.codeBytes).max,
        parsed.map(_.map).reduce(_ ++ _)))
    }

  /** Parses one CMap stream's bfchar/bfrange blocks. Code width comes
    * from the first codespacerange bound's digit count (default 2 bytes,
    * the Identity-H width).
    */
  private[sources] def parseCmap(cs: String): ToUnicode = {
    val hexTok = "<([0-9a-fA-F]+)>".r
    def utf16(hex: String): String = {
      val padded = if (hex.length % 4 == 0) hex else hex.reverse.padTo(
        (hex.length + 3) / 4 * 4, '0').reverse.toString
      val bytes = padded.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
      new String(bytes, java.nio.charset.StandardCharsets.UTF_16BE)
    }
    val codeBytes = {
      val cr = cs.indexOf("begincodespacerange")
      if (cr < 0) 2
      else hexTok.findFirstMatchIn(cs.substring(cr))
        .map(m => math.min(4, math.max(1, m.group(1).length / 2)))
        .getOrElse(2)
    }
    val map = Map.newBuilder[Int, String]
    def block(begin: String, end: String)(body: String => Unit): Unit = {
      var i = cs.indexOf(begin)
      while (i >= 0) {
        val e = cs.indexOf(end, i)
        if (e < 0) { i = -1 }
        else { body(cs.substring(i + begin.length, e))
          i = cs.indexOf(begin, e) }
      }
    }
    block("beginbfchar", "endbfchar") { b =>
      hexTok.findAllMatchIn(b).map(_.group(1)).grouped(2).foreach {
        case Seq(src, dst) => hexCode(src).foreach(map += _ -> utf16(dst))
        case _ => ()
      }
    }
    block("beginbfrange", "endbfrange") { b =>
      // two forms: `<lo> <hi> <dstStart>` and `<lo> <hi> [<d0> <d1> ...]`
      val toks = tokenizeRange(b)
      var j = 0
      while (j < toks.length) {
        toks(j) match {
          case RangeTok.Hex(lo) if j + 2 < toks.length =>
            (hexCode(lo), toks(j + 1), toks(j + 2)) match {
              case (Some(l), RangeTok.Hex(hi), RangeTok.Hex(dst))
                  if hexCode(hi).exists(h =>
                    h >= l && h - l <= MaxBfRangeSpan) =>
                val h = hexCode(hi).get
                val base = utf16(dst)
                var c = l
                while (c <= h) {
                  val t = if (base.isEmpty) "" else
                    base.dropRight(1) + (base.last + (c - l)).toChar
                  map += c -> t
                  c += 1
                }
                j += 3
              case (Some(l), RangeTok.Hex(hi), RangeTok.Arr(ds))
                  if hexCode(hi).exists(h =>
                    h >= l && h - l <= MaxBfRangeSpan) =>
                val h = hexCode(hi).get
                var c = l
                var k = 0
                while (c <= h && k < ds.length) {
                  map += c -> utf16(ds(k)); c += 1; k += 1
                }
                j += 3
              case (_, _: RangeTok.Hex, _) => j += 3 // skipped entry
              case _ => j += 1
            }
          case _ => j += 1
        }
      }
    }
    ToUnicode(codeBytes, map.result())
  }

  private[sources] sealed trait RangeTok
  private[sources] object RangeTok {
    case class Hex(digits: String) extends RangeTok
    case class Arr(items: Seq[String]) extends RangeTok
  }

  /** bfrange body → hex / array-of-hex tokens. */
  private def tokenizeRange(b: String): Vector[RangeTok] = {
    val out = Vector.newBuilder[RangeTok]
    val hexTok = "<([0-9a-fA-F]+)>".r
    var i = 0
    while (i < b.length) {
      b.charAt(i) match {
        case '[' =>
          val e = b.indexOf(']', i)
          val end = if (e < 0) b.length else e
          out += RangeTok.Arr(
            hexTok.findAllMatchIn(b.substring(i, end)).map(_.group(1)).toSeq)
          i = end + 1
        case '<' =>
          hexTok.findPrefixMatchOf(b.substring(i)) match {
            case Some(m) => out += RangeTok.Hex(m.group(1)); i += m.end
            case None => i += 1
          }
        case _ => i += 1
      }
    }
    out.result()
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val bos = new ByteArrayOutputStream(math.max(64, data.length * 4))
      val buf = new Array[Byte](8192)
      var n = inf.inflate(buf)
      while (n > 0) {
        bos.write(buf, 0, n)
        n = inf.inflate(buf)
      }
      // a truncated stream yields its decoded prefix rather than nothing
      Some(bos.toByteArray)
    } catch {
      case _: DataFormatException => None
    } finally inf.end()
  }

  /** Walks a decoded content stream and appends shown text to `out`.
    * `fontEncs` routes the byte table per font: a `Tf` operator switches
    * the current table to the named font's (falling back to the
    * document-wide `enc` for fonts with no declaration of their own),
    * so conflicting per-font `/Differences` decode independently.
    */
  private def appendContentText(cs: String, out: StringBuilder,
                                cmap: Option[ToUnicode] = None,
                                enc: Option[Array[Char]] = None,
                                fontEncs: Map[String, Array[Char]] = Map.empty): Unit = {
    val pending = new StringBuilder // operand strings since the last operator
    // graphics state, per stream: the active byte table (document-wide
    // until the first Tf) and the last name token seen (Tf's operand)
    var cur: Option[Array[Char]] = enc
    var lastName: String = null
    def newline(): Unit =
      if (out.nonEmpty && out.last != '\n') out += '\n'
    def show(): Unit = { out ++= pending; pending.clear() }
    // byte-decoded text (literal strings, single-byte hex fallback) maps
    // through the active encoding table; CMap-mapped hex text is
    // already Unicode and bypasses this (parseHex applies the table only
    // on its fallback path)
    def appendMapped(tmp: StringBuilder): Unit = cur match {
      case Some(tbl) =>
        tmp.foreach(ch => pending += (if (ch < 256) tbl(ch) else ch))
      case None => pending ++= tmp
    }
    var i = 0
    val n = cs.length
    while (i < n) {
      val c = cs.charAt(i)
      c match {
        case '(' =>
          val tmp = new StringBuilder
          i = parseLiteral(cs, i, tmp)
          appendMapped(tmp)
        case '<' if i + 1 < n && cs.charAt(i + 1) == '<' =>
          i = skipDict(cs, i)
        case '<' =>
          i = parseHex(cs, i, pending, cmap, cur)
        case '%' =>
          while (i < n && cs.charAt(i) != '\n' && cs.charAt(i) != '\r') i += 1
        case '/' =>
          i += 1
          val st = i
          while (i < n && !isDelim(cs.charAt(i))) i += 1
          lastName = cs.substring(st, i)
        case c0 if c0.isLetter || c0 == '\'' || c0 == '"' || c0 == '*' =>
          val start = i
          while (i < n && { val ch = cs.charAt(i)
            ch.isLetterOrDigit || ch == '\'' || ch == '"' || ch == '*' }) i += 1
          cs.substring(start, i) match {
            case "Tj" | "TJ" => show()
            case "'" | "\"" => newline(); show()
            case "Td" | "TD" | "T*" | "Tm" | "BT" | "ET" =>
              pending.clear(); newline()
            case "Tf" =>
              pending.clear()
              cur = Option(lastName).flatMap(fontEncs.get).orElse(enc)
            case _ => pending.clear()
          }
        case _ =>
          i += 1 // numbers, whitespace, array brackets
      }
    }
  }

  private def isDelim(c: Char): Boolean =
    c.isWhitespace || "()<>[]{}/%".indexOf(c) >= 0

  /** `(...)` literal string with nesting and escapes; returns the index
    * just past the closing paren.
    */
  private def parseLiteral(cs: String, start: Int, sb: StringBuilder): Int = {
    var i = start + 1
    var depth = 1
    val n = cs.length
    while (i < n && depth > 0) {
      val c = cs.charAt(i)
      if (c == '\\' && i + 1 < n) {
        cs.charAt(i + 1) match {
          case 'n' => sb += '\n'; i += 2
          case 'r' => sb += '\r'; i += 2
          case 't' => sb += '\t'; i += 2
          case 'b' => sb += '\b'; i += 2
          case 'f' => sb += '\f'; i += 2
          case '(' => sb += '('; i += 2
          case ')' => sb += ')'; i += 2
          case '\\' => sb += '\\'; i += 2
          case '\r' => i += 2; if (i < n && cs.charAt(i) == '\n') i += 1
          case '\n' => i += 2 // line continuation
          case d if d >= '0' && d <= '7' =>
            var v = 0; var k = 0; i += 1
            while (k < 3 && i < n && cs.charAt(i) >= '0' && cs.charAt(i) <= '7') {
              v = v * 8 + (cs.charAt(i) - '0'); i += 1; k += 1
            }
            sb += v.toChar
          case other => sb += other; i += 2
        }
      } else if (c == '(') { depth += 1; sb += c; i += 1 }
      else if (c == ')') { depth -= 1; if (depth > 0) sb += c; i += 1 }
      else { sb += c; i += 1 }
    }
    i
  }

  /** `<48656c6c6f>` hex string; odd digit counts get a trailing zero.
    * With a ToUnicode CMap present, the string is first read as CID
    * codes (codeBytes-wide units) — the common CID case writes its text
    * as hex strings — and the mapped text is used when EVERY unit maps;
    * otherwise (a simple-font hex string, or unmapped codes) the
    * single-byte reading applies unchanged.
    */
  private def parseHex(cs: String, start: Int, sb: StringBuilder,
                       cmap: Option[ToUnicode] = None,
                       enc: Option[Array[Char]] = None): Int = {
    var i = start + 1
    val digits = new StringBuilder
    val n = cs.length
    while (i < n && cs.charAt(i) != '>') {
      val c = cs.charAt(i)
      if (Character.digit(c, 16) >= 0) digits += c
      i += 1
    }
    if (digits.length % 2 == 1) digits += '0'
    val mapped = cmap.flatMap { tu =>
      val w = tu.codeBytes * 2
      if (digits.isEmpty || digits.length % w != 0) None
      else {
        // hexCode (not parseInt): a 4-byte code above 0x7FFFFFFF must
        // fall back to the single-byte reading, never throw
        val codes = digits.toString.grouped(w).map(hexCode).toSeq
        if (codes.forall(c => c.exists(tu.map.contains)))
          Some(codes.map(c => tu.map(c.get)).mkString)
        else None
      }
    }
    mapped match {
      case Some(t) => sb ++= t
      case None =>
        var j = 0
        while (j < digits.length) {
          val b = Integer.parseInt(digits.substring(j, j + 2), 16)
          sb += enc.map(_(b)).getOrElse(b.toChar)
          j += 2
        }
    }
    i + 1
  }

  /** Skips a `<< ... >>` dictionary (nesting-aware), e.g. inline-image
    * parameter dicts inside content streams.
    */
  private def skipDict(cs: String, start: Int): Int = {
    var i = start + 2
    var depth = 1
    val n = cs.length
    while (i < n && depth > 0) {
      if (i + 1 < n && cs.charAt(i) == '<' && cs.charAt(i + 1) == '<') {
        depth += 1; i += 2
      } else if (i + 1 < n && cs.charAt(i) == '>' && cs.charAt(i + 1) == '>') {
        depth -= 1; i += 2
      } else i += 1
    }
    i
  }
}
