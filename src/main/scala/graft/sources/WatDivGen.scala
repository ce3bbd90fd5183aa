package graft.sources

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Deterministic WatDiv-schema slice generator (SURVEY §2 / VERDICT r2
  * "What's missing" #5; reference harness:
  * crux-bench/src/crux/bench/watdiv_crux.clj:29-40 ingests
  * `watdiv.10M.nt` via rdf/submit-ntriples and validates per-query
  * result counts at watdiv_crux.clj:88-115).
  *
  * The reference fetches the corpus and the stress-100 SPARQL files from
  * S3 at bench time — neither ships in the repo — so this generator
  * re-creates a small slice of the PUBLIC WatDiv schema (WSDBM; Aluç,
  * Hartig, Özsu, Daudjee, "Diversified Stress Testing of RDF Data
  * Management Systems", ISWC 2014): Users/Products/Retailers/Offers/
  * Reviews/Cities/Countries/Websites/Genres with the published
  * wsdbm/sorg/gr/gn/rev predicates. A fixed LCG makes the output
  * byte-stable across JVMs; the file is generated once and committed so
  * the DuckDB oracle can parse the identical bytes
  * ([[graft.queries.WatDivQueries]] mirrors [[LubmQueries]]' approach).
  *
  * Numeric literals that queries compare (price, rating) are emitted
  * zero-padded fixed-width so lexicographic string comparison matches
  * numeric order on both the Spark and DuckDB sides.
  */
object WatDivGen {
  val defaultPath = "data/watdiv/watdiv-slice.nt"

  private val wsdbm = "http://db.uwaterloo.ca/~galuc/wsdbm/"
  private val sorg  = "http://schema.org/"
  private val gr    = "http://purl.org/goodrelations/"
  private val gn    = "http://www.geonames.org/ontology#"
  private val rev   = "http://purl.org/stuff/rev#"
  private val foaf  = "http://xmlns.com/foaf/"
  private val rdfT  = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

  final class Lcg(var s: Long) {
    def nextInt(bound: Int): Int = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (((s >>> 33) % bound).toInt + bound) % bound
    }
  }

  val nUsers = 1000; val nProducts = 250; val nReviews = 400
  val nOffers = 300; val nRetailers = 12; val nCities = 25
  val nCountries = 10; val nWebsites = 20; val nGenres = 15

  def triples(): Seq[String] = {
    val rnd = new Lcg(42L)
    val out = Seq.newBuilder[String]
    def iri(ns: String, ln: String) = s"<$ns$ln>"
    def t(s: String, p: String, o: String): Unit = out += s"$s $p $o ."
    def lit(v: String) = "\"" + v + "\""

    for (i <- 0 until nCities)
      t(iri(wsdbm, s"City$i"), iri(gn, "parentCountry"),
        iri(wsdbm, s"Country${rnd.nextInt(nCountries)}"))

    for (i <- 0 until nProducts) {
      val p = iri(wsdbm, s"Product$i")
      t(p, s"<$rdfT>", iri(wsdbm, s"ProductCategory${rnd.nextInt(10)}"))
      t(p, iri(sorg, "caption"), lit(s"caption-of-product-$i"))
      t(p, iri(wsdbm, "hasGenre"), iri(wsdbm, s"Genre${rnd.nextInt(nGenres)}"))
      if (rnd.nextInt(3) > 0)
        t(p, iri(sorg, "contentRating"), lit(s"rating-${rnd.nextInt(4)}"))
    }

    for (i <- 0 until nReviews) {
      val r = iri(wsdbm, s"Review$i")
      t(iri(wsdbm, s"Product${rnd.nextInt(nProducts)}"),
        iri(rev, "hasReview"), r)
      t(r, iri(rev, "reviewer"), iri(wsdbm, s"User${rnd.nextInt(nUsers)}"))
      t(r, iri(rev, "rating"), lit((1 + rnd.nextInt(5)).toString))
      t(r, iri(rev, "totalVotes"), lit(f"${rnd.nextInt(100)}%03d"))
    }

    for (i <- 0 until nOffers) {
      val o = iri(wsdbm, s"Offer$i")
      t(iri(wsdbm, s"Retailer${rnd.nextInt(nRetailers)}"),
        iri(gr, "offers"), o)
      t(o, iri(gr, "includes"), iri(wsdbm, s"Product${rnd.nextInt(nProducts)}"))
      t(o, iri(gr, "price"), lit(f"${100 + rnd.nextInt(9900)}%05d"))
      t(o, iri(gr, "validThrough"),
        lit(f"2026-${1 + rnd.nextInt(12)}%02d-${1 + rnd.nextInt(28)}%02d"))
      t(o, iri(sorg, "eligibleRegion"),
        iri(wsdbm, s"Country${rnd.nextInt(nCountries)}"))
    }

    for (i <- 0 until nWebsites) {
      val w = iri(wsdbm, s"Website$i")
      t(w, iri(sorg, "url"), lit(s"http://example.org/site$i"))
      t(w, iri(wsdbm, "hits"), lit(f"${rnd.nextInt(100000)}%06d"))
    }

    for (i <- 0 until nUsers) {
      val u = iri(wsdbm, s"User$i")
      t(u, s"<$rdfT>", iri(wsdbm, s"Role${rnd.nextInt(3)}"))
      t(u, iri(sorg, "nationality"), iri(wsdbm, s"Country${rnd.nextInt(nCountries)}"))
      t(u, iri(wsdbm, "livesIn"), iri(wsdbm, s"City${rnd.nextInt(nCities)}"))
      t(u, iri(wsdbm, "gender"), lit(if (rnd.nextInt(2) == 0) "male" else "female"))
      t(u, iri(sorg, "age"), lit(f"${18 + rnd.nextInt(60)}%02d"))
      t(u, iri(foaf, "givenName"), lit(s"name$i"))
      for (_ <- 0 until rnd.nextInt(6))
        t(u, iri(wsdbm, "follows"), iri(wsdbm, s"User${rnd.nextInt(nUsers)}"))
      for (_ <- 0 until rnd.nextInt(5))
        t(u, iri(wsdbm, "likes"), iri(wsdbm, s"Product${rnd.nextInt(nProducts)}"))
      for (_ <- 0 until rnd.nextInt(6))
        t(u, iri(wsdbm, "friendOf"), iri(wsdbm, s"User${rnd.nextInt(nUsers)}"))
      if (rnd.nextInt(3) > 0)
        t(u, iri(wsdbm, "subscribes"), iri(wsdbm, s"Website${rnd.nextInt(nWebsites)}"))
    }
    out.result()
  }

  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else defaultPath
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    val ts = triples()
    Files.write(p, ts.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    println(s"wrote ${ts.size} triples to $path")
  }
}
