package graft.kernel

/** Adobe Glyph List subset — the public name↔Unicode mapping that
  * `/Encoding /Differences` arrays speak (PDF 32000-1 §9.6.6.3 delegates
  * glyph-name semantics to the AGL; reference ingest path:
  * smart_extract.py:64-97 via PyMuPDF, which carries the full list).
  *
  * Two directions: [[charOf]] resolves a Differences glyph name while
  * parsing; [[nameOf]] picks a canonical name while the synthetic writer
  * serializes. The algorithmic `uniXXXX` form (AGL specification §3) round-
  * trips any BMP char the table doesn't carry, so coverage gaps cannot lose
  * text — they just produce less idiomatic names.
  */
private[kernel] object Glyphs {

  private val named: Vector[(String, Char)] = Vector(
    // ASCII punctuation + digits (AGL names)
    "space" -> ' ', "exclam" -> '!', "quotedbl" -> '"', "numbersign" -> '#',
    "dollar" -> '$', "percent" -> '%', "ampersand" -> '&', "quotesingle" -> '\'',
    "parenleft" -> '(', "parenright" -> ')', "asterisk" -> '*', "plus" -> '+',
    "comma" -> ',', "hyphen" -> '-', "period" -> '.', "slash" -> '/',
    "zero" -> '0', "one" -> '1', "two" -> '2', "three" -> '3', "four" -> '4',
    "five" -> '5', "six" -> '6', "seven" -> '7', "eight" -> '8', "nine" -> '9',
    "colon" -> ':', "semicolon" -> ';', "less" -> '<', "equal" -> '=',
    "greater" -> '>', "question" -> '?', "at" -> '@',
    "bracketleft" -> '[', "backslash" -> '\\', "bracketright" -> ']',
    "asciicircum" -> '^', "underscore" -> '_', "grave" -> '`',
    "braceleft" -> '{', "bar" -> '|', "braceright" -> '}', "asciitilde" -> '~',
    // cp1252 0x80-0x9F specials
    "Euro" -> '€', "quotesinglbase" -> '‚', "florin" -> 'ƒ',
    "quotedblbase" -> '„', "ellipsis" -> '…', "dagger" -> '†',
    "daggerdbl" -> '‡', "circumflex" -> 'ˆ', "perthousand" -> '‰',
    "Scaron" -> 'Š', "guilsinglleft" -> '‹', "OE" -> 'Œ',
    "Zcaron" -> 'Ž', "quoteleft" -> '‘', "quoteright" -> '’',
    "quotedblleft" -> '“', "quotedblright" -> '”', "bullet" -> '•',
    "endash" -> '–', "emdash" -> '—', "tilde" -> '˜',
    "trademark" -> '™', "scaron" -> 'š', "guilsinglright" -> '›',
    "oe" -> 'œ', "zcaron" -> 'ž', "Ydieresis" -> 'Ÿ',
    // latin-1 supplement
    "exclamdown" -> '¡', "cent" -> '¢', "sterling" -> '£',
    "currency" -> '¤', "yen" -> '¥', "brokenbar" -> '¦',
    "section" -> '§', "dieresis" -> '¨', "copyright" -> '©',
    "ordfeminine" -> 'ª', "guillemotleft" -> '«',
    "logicalnot" -> '¬', "registered" -> '®', "macron" -> '¯',
    "degree" -> '°', "plusminus" -> '±', "acute" -> '´',
    "mu" -> 'µ', "paragraph" -> '¶', "periodcentered" -> '·',
    "cedilla" -> '¸', "ordmasculine" -> 'º',
    "guillemotright" -> '»', "onequarter" -> '¼',
    "onehalf" -> '½', "threequarters" -> '¾',
    "questiondown" -> '¿',
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
    "thorn" -> 'þ', "ydieresis" -> 'ÿ') ++
    // letters name themselves in the AGL
    (('A' to 'Z') ++ ('a' to 'z')).map(c => c.toString -> c)

  private val byName: Map[String, Char] = named.toMap
  private val byChar: Map[Char, String] =
    named.foldLeft(Map.empty[Char, String]) { case (m, (n, c)) =>
      if (m.contains(c)) m else m.updated(c, n)
    }

  private val UniPat = java.util.regex.Pattern.compile("uni([0-9A-Fa-f]{4})")

  /** Differences glyph name → char; `uniXXXX` handled algorithmically;
    * unknown names (e.g. subset-private `gNN`) → None, the caller keeps the
    * base encoding for that code. */
  def charOf(name: String): Option[Char] =
    byName.get(name).orElse {
      val m = UniPat.matcher(name)
      if (m.matches()) Some(Integer.parseInt(m.group(1), 16).toChar) else None
    }

  /** Canonical glyph name for the synthetic writer; AGL `uniXXXX` for chars
    * outside the table. */
  def nameOf(c: Char): String = byChar.getOrElse(c, f"uni${c.toInt}%04X")
}
