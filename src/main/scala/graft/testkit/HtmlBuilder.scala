package graft.testkit

import graft.testkit.PdfBuilder.Fixture

/** Deterministic HTML fixtures for the main-content leg of the interleaved
  * kernel (north rule: "HTML boilerplate strip ... DOM heuristics"). Each
  * fixture's `expected` is the main-content text the classifier must keep,
  * frozen by construction — the same contract as the PDF fixture matrix.
  * The reference engine is PDF-only, so these exercise published heuristics
  * (Boilerpipe link density, structural drop lists), not a reference path. */
object HtmlBuilder {

  /** h01: full page shape — head/title/nav/footer stripped as structural
    * boilerplate; heading + prose paragraphs (one with an inline link) kept. */
  def h01Article: Fixture = {
    val html =
      """<!DOCTYPE html>
        |<html><head><title>Site &mdash; Title</title><meta charset="utf-8"><style>body{color:red}</style></head>
        |<body>
        |<nav><a href="/">Home</a> <a href="/about">About</a></nav>
        |<article>
        |<h1>Deterministic Pipelines</h1>
        |<p>Spark extracts the main content of every interleaved document in a single forward pass over the markup.</p>
        |<p>Link density separates navigation chrome from prose, as the <a href="#">Boilerpipe</a> paper showed for news pages.</p>
        |</article>
        |<footer>&copy; 2026 Example Corp &mdash; <a href="/tos">Terms</a></footer>
        |</body></html>
        |""".stripMargin
    val expected =
      "Deterministic Pipelines\n" +
      "Spark extracts the main content of every interleaved document in a single forward pass over the markup.\n" +
      "Link density separates navigation chrome from prose, as the Boilerpipe paper showed for news pages.\n"
    Fixture("h01_article", html.getBytes("UTF-8"), expected)
  }

  /** h02: pure density classification outside any drop context — a link
    * menu (short, anchor-dominated) and a link farm (long, density > 0.5)
    * drop; prose with an inline link and a short link-free sentence keep;
    * a 2-word button label drops. */
  def h02Density: Fixture = {
    val html =
      """<html><body>
        |<div><a href="/a">Products</a> <a href="/b">Pricing</a> <a href="/c">Support</a></div>
        |<p>The quick service benchmark shows that partition-local extraction scales linearly with cores when payloads are salted by <a href="/size">size bucket</a> before the shuffle.</p>
        |<p>Throughput matters most.</p>
        |<p>Buy now</p>
        |<p>See <a href="/1">one</a> <a href="/2">two</a> <a href="/3">three</a> <a href="/4">four</a> <a href="/5">five</a> <a href="/6">six</a> <a href="/7">seven</a> <a href="/8">eight</a> <a href="/9">nine</a> <a href="/10">ten</a></p>
        |</body></html>
        |""".stripMargin
    val expected =
      "The quick service benchmark shows that partition-local extraction scales linearly with cores when payloads are salted by size bucket before the shuffle.\n" +
      "Throughput matters most.\n"
    Fixture("h02_density", html.getBytes("UTF-8"), expected)
  }

  /** h03: markup robustness — named/numeric/hex entities, unknown entity
    * passthrough, NBSP + whitespace collapsing, raw-text script skip,
    * `<br>` block segmentation, a stray `<`, a malformed `<br / >`, and an
    * implied `<p>` close before a `<div>`. */
  def h03Markup: Fixture = {
    val html =
      """<html><body><p>Fish &amp; chips &lt;tags&gt; cost &#8364;7 &#x263A; today&hellip; ok</p>
        |<script>var x = "<p>not content</p>";</script>
        |<p>Unknown &bogus; entity stays, nbsp&nbsp;collapses  into one space.</p>
        |<p>line one<br>line two<br / >line three is longer here</p>
        |<p>stray < bracket survives as text in this sentence
        |<div>implied paragraph close before this div block works fine</div>
        |</body></html>
        |""".stripMargin
    val expected =
      "Fish & chips <tags> cost €7 ☺ today… ok\n" +
      "Unknown &bogus; entity stays, nbsp collapses into one space.\n" +
      "line three is longer here\n" +
      "stray < bracket survives as text in this sentence\n" +
      "implied paragraph close before this div block works fine\n"
    Fixture("h03_markup", html.getBytes("UTF-8"), expected)
  }

  /** h04: block segmentation through lists, tables and definition lists
    * with implied end tags (`<li>`/`<td>`/`<tr>`/`<dt>`/`<dd>` never
    * explicitly closed). */
  def h04Structure: Fixture = {
    val html =
      """<html><body>
        |<h2>Result Tables</h2>
        |<ul><li>first bullet row with enough words<li>second bullet row also has words</ul>
        |<table><tr><td>cell alpha has four words<td>cell beta has four words too<tr><td>row two cell gamma words</table>
        |<dl><dt>term with three words<dd>definition carries at least four words</dl>
        |</body></html>
        |""".stripMargin
    val expected =
      "Result Tables\n" +
      "first bullet row with enough words\n" +
      "second bullet row also has words\n" +
      "cell alpha has four words\n" +
      "cell beta has four words too\n" +
      "row two cell gamma words\n" +
      "term with three words\n" +
      "definition carries at least four words\n"
    Fixture("h04_structure", html.getBytes("UTF-8"), expected)
  }

  /** h05: in-content image references — `<img>` inside `figure`/`nav`
    * drop contexts is excluded; the caption drops with its figure. */
  def h05Images: Fixture = {
    val html =
      """<html><body>
        |<p>An illustrated article paragraph references <a href="/fig">figures</a> and keeps reading naturally for long enough.</p>
        |<img src="hero.png" alt="hero">
        |<figure><img src="figure1.png"><figcaption>tiny caption</figcaption></figure>
        |<nav><img src="navlogo.png"></nav>
        |<p>Closing prose paragraph long enough to survive the density classifier easily.</p>
        |</body></html>
        |""".stripMargin
    val expected =
      "An illustrated article paragraph references figures and keeps reading naturally for long enough.\n" +
      "Closing prose paragraph long enough to survive the density classifier easily.\n"
    Fixture("h05_images", html.getBytes("UTF-8"), expected)
  }

  /** Expected in-content image refs of h05 (appearance order). */
  val h05ExpectedImages: Seq[String] = Seq("hero.png")

  /** Expected in-content link hrefs (appearance order; nav/footer links
    * are drop-context boilerplate and excluded by construction). */
  val h01ExpectedLinks: Seq[String] = Seq("#")
  val h02ExpectedLinks: Seq[String] = Seq("/a", "/b", "/c", "/size",
    "/1", "/2", "/3", "/4", "/5", "/6", "/7", "/8", "/9", "/10")
  val h05ExpectedLinks: Seq[String] = Seq("/fig")

  /** Expected visible anchor texts, aligned index-for-index with the
    * `*ExpectedLinks` above (entity-decoded, collapsed, trimmed). */
  val h01ExpectedAnchorTexts: Seq[String] = Seq("Boilerpipe")
  val h02ExpectedAnchorTexts: Seq[String] = Seq("Products", "Pricing",
    "Support", "size bucket", "one", "two", "three", "four", "five", "six",
    "seven", "eight", "nine", "ten")
  val h05ExpectedAnchorTexts: Seq[String] = Seq("figures")

  /** h06: ISO-8859-1 page declaring its charset in a meta http-equiv tag
    * (the HTML5 prescan path) — every accented char is a single high byte
    * that UTF-8 decoding would mangle into U+FFFD. */
  def h06Latin1: Fixture = {
    val html =
      """<html><head><meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1"><title>Caf&eacute; du Coin</title><meta name="description" content="Le petit caf&eacute; &mdash; menu &amp; horaires"></head>
        |<body><article><h1>Résumé détaillé</h1>
        |<p>Le café est déjà prêt et la journée commence à peine pour nous tous ici.</p>
        |</article></body></html>
        |""".stripMargin
    val expected =
      "Résumé détaillé\n" +
      "Le café est déjà prêt et la journée commence à peine pour nous tous ici.\n"
    Fixture("h06_latin1", html.getBytes("ISO-8859-1"), expected)
  }

  /** h07: UTF-16LE page with BOM (no meta declaration — the BOM decides). */
  def h07Utf16: Fixture = {
    val html =
      """<html><head><title>Unicode</title></head><body><article><h1>Οδηγός Σπαρκ</h1>
        |<p>Η εξαγωγή κειμένου δουλεύει σωστά ακόμη και με δεκαέξι δυαδικά ψηφία ανά χαρακτήρα εδώ.</p>
        |</article></body></html>
        |""".stripMargin
    val expected =
      "Οδηγός Σπαρκ\n" +
      "Η εξαγωγή κειμένου δουλεύει σωστά ακόμη και με δεκαέξι δυαδικά ψηφία ανά χαρακτήρα εδώ.\n"
    val bom = Array[Byte](0xff.toByte, 0xfe.toByte)
    Fixture("h07_utf16", bom ++ html.getBytes("UTF-16LE"), expected)
  }

  def all: Seq[Fixture] =
    Seq(h01Article, h02Density, h03Markup, h04Structure, h05Images, h06Latin1, h07Utf16)
}
