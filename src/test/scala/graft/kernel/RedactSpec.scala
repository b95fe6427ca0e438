package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

class RedactSpec extends AnyFunSuite {

  test("prices, dates and account lines redact with counts") {
    val r = Redact("pay $12.34 or $5.00 by 3/14/2025 re account 12345 end")
    assert(r.text == "pay [PRICE] or [PRICE] by [DATE] re [ACCT] end")
    assert(r.nPrice == 2 && r.nDate == 1 && r.nAcct == 1)
  }

  test("boundaries: embedded digits do not over-match") {
    // 7-digit run is not a 4-6 digit account; 1999/12/31 is not M/D/YYYY
    val r = Redact("account 1234567 on 1999/12/31 price $1.2 x")
    assert(r.nAcct == 0 && r.nPrice == 0)
    // 1999/12/31 — "99/12/3199"? the \b forms: 1999/12/31 has 4-digit year
    // FIRST, so \d{1,2}/\d{1,2}/\d{4} cannot match it
    assert(r.nDate == 0)
    assert(r.text == "account 1234567 on 1999/12/31 price $1.2 x")
  }

  test("no matches returns the text unchanged, all counts zero") {
    val r = Redact("plain words only")
    assert(r.text == "plain words only" && r.nPrice + r.nDate + r.nAcct == 0)
  }

  test("replacement order is price, then date, then acct (shared contract)") {
    assert(Redact.Rules.map(_._1) == Seq("price", "date", "acct"))
  }

  test("corpus extracted text actually exercises every rule") {
    var (p, d, a) = (0, 0, 0)
    for (i <- 0L until 200L) {
      val pg = Corpus.page(i)
      val ex = Extractor.extract(pg.url, pg.html, pg.text, pg.lang)
      val r = Redact(ex.extractedText)
      p += r.nPrice; d += r.nDate; a += r.nAcct
    }
    assert(p > 0 && d > 0 && a > 0, s"rules unexercised: price=$p date=$d acct=$a")
  }
}
