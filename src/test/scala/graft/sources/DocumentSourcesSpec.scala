package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Round-trip tests for the source/sink surface (SURVEY.md §2.1). */
class DocumentSourcesSpec extends SparkSpec {
  import sqlImplicits._

  private lazy val tmp = Files.createTempDirectory("graft-sources").toString

  test("binaryFile scan carries lineage and payload") {
    val dir = s"$tmp/bin"
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(s"$dir/a.bin"), Array[Byte](1, 2, 3))
    Files.write(Paths.get(s"$dir/b.bin"), Array[Byte](4, 5))
    val df = DocumentSources.readBinaryDocs(spark, s"$dir/*.bin")
    assert(df.count() == 2)
    assert(df.columns.toSet == Set("path", "modificationTime", "length", "content"))
    assert(df.agg(sum("length")).head().getLong(0) == 5L)
  }

  // -- minimal spec-shaped PDF builder for the extraction tests -----------
  private def buildPdf(streams: Seq[(String, Boolean)],
                       extraObjs: Seq[String] = Nil): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit =
      bos.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    val contentRefs = streams.indices.map(i => s"${4 + i} 0 R").mkString(" ")
    w(s"3 0 obj << /Type /Page /Parent 2 0 R /Contents [$contentRefs] >> endobj\n")
    streams.zipWithIndex.foreach { case ((content, compress), i) =>
      val raw = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val data = if (!compress) raw else {
        val d = new java.util.zip.Deflater()
        d.setInput(raw); d.finish()
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](256)
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
        d.end(); out.toByteArray
      }
      val filter = if (compress) " /Filter /FlateDecode" else ""
      w(s"${4 + i} 0 obj << /Length ${data.length}$filter >> stream\n")
      bos.write(data)
      w("\nendstream endobj\n")
    }
    extraObjs.zipWithIndex.foreach { case (obj, i) =>
      w(s"${100 + i} 0 obj $obj endobj\n")
    }
    w("trailer << /Root 1 0 R >>\n%%EOF\n")
    bos.toByteArray
  }

  test("PDF extraction decodes FlateDecode content streams and text operators") {
    val pdf = buildPdf(Seq(
      ("BT /F1 12 Tf 72 720 Td (Hello, PDF world!) Tj ET", false),
      ("BT [ (Sec) -20 (ond) 5 ( page) ] TJ T* (line \\(two\\)) Tj <21> Tj ET",
        true)))
    val notPdf = "plain bytes".getBytes
    val df = Seq((1L, pdf), (2L, notPdf)).toDF("id", "content")
      .select(col("id"), DocumentSources.extractPdfText(col("content")).as("text"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getString(1) ==
      "Hello, PDF world!\nSecond page\nline (two)!")
    assert(rows(1).isNullAt(1))
    // S3 guard drops the failed extraction
    assert(DocumentSources.dropFailedExtractions(df).count() == 1)
  }

  test("readPdfDocs composes scan, extraction and the null guard") {
    val dir = s"$tmp/pdf"
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(s"$dir/ok.pdf"),
      buildPdf(Seq(("BT (from disk) Tj ET", true))))
    Files.write(Paths.get(s"$dir/broken.pdf"), "not a pdf at all".getBytes)
    val docs = DocumentSources.readPdfDocs(spark, s"$dir/*.pdf").collect()
    assert(docs.length == 1)
    assert(docs.head.getString(0).endsWith("ok.pdf"))
    assert(docs.head.getString(1) == "from disk")
  }

  test("PDF extraction maps CID hex strings through the ToUnicode CMap") {
    // an Identity-H-style page: the font's ToUnicode CMap ships as its
    // own (compressed) stream; the content stream shows 2-byte CID codes
    // as hex strings. bfchar maps single codes, bfrange covers both the
    // increment form and the array form.
    val cmap = """/CIDInit /ProcSet findresource begin
      begincmap
      1 begincodespacerange
      <0000> <FFFF>
      endcodespacerange
      2 beginbfchar
      <0003> <0020>
      <0044> <0044>
      endbfchar
      2 beginbfrange
      <0010> <0015> <0061>
      <0020> <0021> [<00480069> <0021>]
      endbfrange
      endcmap"""
    // codes: 0044("D") 0010("a") 0011("b") 0003(" ") 0020("Hi") 0021("!")
    val content = "BT /F1 12 Tf <00440010 0011> Tj <0003> Tj " +
      "[<0020> <0021>] TJ ET"
    val pdf = buildPdf(Seq((content, false), (cmap, true)))
    assert(PdfText.extract(pdf).contains("Dab Hi!"))
    // the SAME content without the CMap falls back to single-byte chars
    // (garbage NULs trimmed away by the caller's cleaning, but crucially
    // no crash and no partial mapping)
    val noCmap = PdfText.extract(buildPdf(Seq((content, false))))
    assert(noCmap.isDefined && !noCmap.get.contains("Dab"))
    // simple-font hex strings in a CMAP-CARRYING doc stay single-byte
    // when any unit fails to map (the all-units gate)
    val mixed = buildPdf(Seq(
      ("BT <48656c6c6f> Tj ET", false), (cmap, true)))
    assert(PdfText.extract(mixed).contains("Hello"))
  }

  test("CMap hardening: oversized codes and corrupt-wide ranges skip, never crash") {
    // a UCS-4 codespace with an above-Int.MaxValue bfchar code, a
    // bfrange wider than the expansion cap, and a valid 2-byte entry —
    // the valid entry must still map while the bad ones fall back
    val cmap = """begincmap
      1 begincodespacerange
      <00000000> <FFFFFFFF>
      endcodespacerange
      2 beginbfchar
      <FFFFFFF0> <0041>
      <00000044> <0044>
      endbfchar
      1 beginbfrange
      <00000000> <00FFFFFF> <0061>
      endbfrange
      endcmap"""
    val content = "BT <00000044> Tj <FFFFFFF0> Tj ET"
    val pdf = buildPdf(Seq((content, false), (cmap, true)))
    val out = PdfText.extract(pdf)
    assert(out.isDefined, "hardened CMap path must not throw")
    // the valid 4-byte code maps; the oversized one forces that hex
    // string back to the single-byte reading (all-units gate)
    assert(out.get.contains("D"))
    assert(!out.get.contains("a"), "capped bfrange must not have expanded")
  }

  test("PdfText handles octal escapes, hex padding and non-PDF payloads") {
    // octal \101 = 'A'; \t escape; odd-length hex <4120> = "A "
    assert(PdfText.extract(buildPdf(Seq(("BT (oct \\101\\tz) Tj <4120> Tj ET", false))))
      .contains("oct A\tzA"))
    assert(PdfText.extract("random".getBytes).isEmpty)
    assert(PdfText.extract(null).isEmpty)
    // a stream with an unsupported filter is skipped, yielding empty text
    val lzw = new String(buildPdf(Seq(("BT (x) Tj ET", false))),
      java.nio.charset.StandardCharsets.ISO_8859_1)
      .replace("/Length", "/Filter /LZWDecode /Length")
    assert(PdfText.extract(lzw.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      .contains(""))
  }

  test("PdfText remaps the high-byte range under a declared WinAnsiEncoding") {
    val font = "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      "/Encoding /WinAnsiEncoding >>"
    // 0xE9 agrees with Latin-1 (é); 0x93/0x94 are the curly quotes and
    // 0x80 the euro sign ONLY under windows-1252; 0x81 is undefined in
    // windows-1252 and must keep its byte identity
    val content = "BT (caf\\351 \\223q\\224 \\200 \\201) Tj <93> Tj ET"
    val win = PdfText.extract(buildPdf(Seq((content, false)), Seq(font)))
    assert(win.contains("café “q” € “"),
      s"got $win")
    // same bytes with NO declared encoding: Latin-1 reading (C1 controls)
    val plain = PdfText.extract(buildPdf(Seq((content, false))))
    assert(plain.contains("café q  "),
      s"got $plain")
  }

  test("PdfText remaps under MacRomanEncoding; WinAnsi wins a mixed doc") {
    val mac = "<< /Type /Font /Encoding /MacRomanEncoding >>"
    // MacRoman 0x8E = é, 0xA5 = • (bullet)
    val content = "BT (caf\\216 \\245) Tj ET"
    val out = PdfText.extract(buildPdf(Seq((content, false)), Seq(mac)))
    assert(out.contains("café •"), s"got $out")
    // mixed declarations: WinAnsi wins (0x93 reads as the curly quote)
    val both = PdfText.extract(buildPdf(Seq(("BT (\\223) Tj ET", false)),
      Seq(mac, "<< /Type /Font /Encoding /WinAnsiEncoding >>")))
    assert(both.contains("“"), s"got $both")
  }

  test("PdfText honors the encoding name only in /Encoding position, not " +
      "as loose text") {
    // the literal text "/WinAnsiEncoding" inside a shown string must NOT
    // flip the document-wide remap (r13 ADVICE): 0x93 stays the Latin-1
    // C1 control, not the curly quote
    val content = "BT (mentions /WinAnsiEncoding here \\223) Tj ET"
    val out = PdfText.extract(buildPdf(Seq((content, false))))
    assert(out.exists(t => t.contains('\u0093') && !t.contains('“')),
      s"got $out")
    // /BaseEncoding position (inside an Encoding dict) DOES count
    val font = "<< /Type /Font /Encoding << /Type /Encoding " +
      "/BaseEncoding /WinAnsiEncoding >> >>"
    val based = PdfText.extract(
      buildPdf(Seq(("BT (\\223) Tj ET", false)), Seq(font)))
    assert(based.contains("“"), s"got $based")
  }

  test("PdfText applies font /Differences arrays over the base encoding") {
    // remap 0x41 ('A') -> eacute, 0x42 -> quotedblleft, then the
    // implicit code++ maps 0x43 -> uni20AC (euro); 0x44 stays 'D'
    val font = "<< /Type /Font /Encoding << /Type /Encoding " +
      "/BaseEncoding /WinAnsiEncoding " +
      "/Differences [ 65 /eacute /quotedblleft /uni20AC 200 /unknownglyph ] >> >>"
    val out = PdfText.extract(
      buildPdf(Seq(("BT (ABCD \\310) Tj ET", false)), Seq(font)))
    assert(out.contains("é“€D È"), s"got $out")
    // without a base encoding the overlay applies over Latin-1 identity
    val bare = "<< /Type /Font /Encoding << /Type /Encoding " +
      "/Differences [ 66 /bullet ] >> >>"
    val out2 = PdfText.extract(
      buildPdf(Seq(("BT (AB) Tj ET", false)), Seq(bare)))
    assert(out2.contains("A•"), s"got $out2")
    // a malformed array degrades to no overlay, never fails the scan
    val broken = "<< /Encoding << /Differences [ 65 /eacute >> >>"
    val out3 = PdfText.extract(
      buildPdf(Seq(("BT (A) Tj ET", false)), Seq(broken)))
    assert(out3.isDefined)
    // the literal text "/Differences [...]" inside a SHOWN STRING is not
    // dict context and must not remap (the same loose-text hardening as
    // the encoding-name detection)
    val loose = PdfText.extract(buildPdf(
      Seq(("BT (the /Differences [ 65 /eacute ] rule, A) Tj ET", false))))
    assert(loose.exists(t => t.contains("rule, A") && !t.contains("é")),
      s"got $loose")
  }

  test("per-font routing: two fonts with CONFLICTING /Differences both " +
      "decode correctly") {
    // F1 maps 0x41 -> eacute, F2 maps the SAME code 0x41 -> bullet; the
    // pre-routing document-wide merge could only honor one of them. The
    // page declares both under /Resources /Font; the content stream
    // switches fonts with Tf between the two shows.
    val resources = "<< /Font << " +
      "/F1 << /Type /Font /Encoding << /Type /Encoding " +
      "/Differences [ 65 /eacute ] >> >> " +
      "/F2 << /Type /Font /Encoding << /Type /Encoding " +
      "/Differences [ 65 /bullet ] >> >> >> >>"
    val content = "BT /F1 12 Tf (A) Tj /F2 12 Tf (A) Tj ET"
    val out = PdfText.extract(
      buildPdf(Seq((content, false)), Seq(resources)))
    assert(out.contains("é•"), s"got $out")
    // the same two fonts via INDIRECT references: /F1 110 0 R whose
    // object body carries the font dict, /Encoding also indirect
    val indirectRes = "<< /Font << /F1 110 0 R /F2 111 0 R >> >>"
    val extra = Seq(
      indirectRes, // 100 0 obj
      "<< /Type /Encoding /Differences [ 66 /Euro ] >>") // 101 0 obj
    val pdf = {
      // append the font objects at numbers the builder doesn't use
      val base = new String(
        buildPdf(Seq(("BT /F1 9 Tf (B) Tj /F2 9 Tf (B) Tj ET", false)), extra),
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val fonts = "110 0 obj << /Type /Font /Encoding 101 0 R >> endobj\n" +
        "111 0 obj << /Type /Font /Encoding << " +
        "/Differences [ 66 /emdash ] >> >> endobj\n"
      (base + fonts).getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    }
    val out2 = PdfText.extract(pdf)
    assert(out2.contains("€—"), s"got $out2")
  }

  test("per-font routing: a font's own base encoding routes, and strings " +
      "before any Tf keep the document-wide default") {
    // F1 is WinAnsi, F2 declares nothing: 0x93 reads as the curly quote
    // under F1, and under F2 falls back to the document default — which
    // IS WinAnsi here because the document-wide detection still sees the
    // declaration (regression: single-font docs are bit-identical)
    val res = "<< /Font << " +
      "/F1 << /Type /Font /Encoding /WinAnsiEncoding >> " +
      "/F2 << /Type /Font >> >> >>"
    val out = PdfText.extract(buildPdf(
      Seq(("BT (\\223) Tj /F1 12 Tf (\\223) Tj /F2 12 Tf (\\223) Tj ET",
        false)), Seq(res)))
    assert(out.contains("“\n“\n“") || out.exists(_.count(_ == '“') == 3),
      s"got $out")
    // an unknown font name in Tf also falls back to the default
    val out2 = PdfText.extract(buildPdf(
      Seq(("BT /Zz 12 Tf (\\223) Tj ET", false)),
      Seq("<< /Type /Font /Encoding /WinAnsiEncoding >>")))
    assert(out2.contains("“"), s"got $out2")
  }

  test("glyphChar resolves AGL names, uniXXXX forms, and single chars") {
    assert(PdfText.glyphChar("eacute").contains('é'))
    assert(PdfText.glyphChar("Euro").contains('€'))
    assert(PdfText.glyphChar("uni201C").contains('“'))
    assert(PdfText.glyphChar("u0041").contains('A'))
    assert(PdfText.glyphChar("A").contains('A'))
    assert(PdfText.glyphChar("seven").contains('7'))
    assert(PdfText.glyphChar("nosuchglyph").isEmpty)
    assert(PdfText.glyphChar("uniZZZZ").isEmpty)
  }

  test("PdfText never remaps CMap-mapped hex text under a declared encoding") {
    // the CMap maps code 0x01 to U+0093 — a code point the WinAnsi table
    // would rewrite to U+201C if the mapped text were (wrongly) fed back
    // through the byte remap
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |1 begincodespacerange <00> <FF> endcodespacerange
        |1 beginbfchar
        |<01> <0093>
        |endbfchar
        |endcmap""".stripMargin
    val font = "<< /Type /Font /Encoding /WinAnsiEncoding >>"
    val out = PdfText.extract(
      buildPdf(Seq(("BT <01> Tj ET", false), (cmap, true)), Seq(font)))
    assert(out.contains(""), s"got $out")
  }

  test("whole-text reader + CSV round trip") {
    val dir = s"$tmp/txt"
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(s"$dir/d1.txt"), "hello world")
    val docs = DocumentSources.readWholeTextDocs(spark, s"$dir/*.txt")
    assert(docs.select("text").head().getString(0) == "hello world")

    val out = s"$tmp/csv"
    DocumentSources.writeCsv(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), out)
    val back = DocumentSources.readCsv(spark, out, "id LONG, v STRING")
    assert(back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
  }

  test("bucketed tables join without an exchange on the bucket key") {
    import org.apache.spark.sql.functions.col
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = Paths.get(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), t)
      if (Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(Files.deleteIfExists(_))
      }
    }
    DocumentSources.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    DocumentSources.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 4)
    // disable broadcast so the shuffle-join path is exercised (on these
    // tiny tables the planner would otherwise broadcast and skip buckets)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan) // no shuffle
      assert(joined.count() == orders.join(lineitem, "o_orderkey").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("Avro container round-trip preserves primitives, nulls, unicode, " +
      "and double bit patterns") {
    val df = Seq(
      (1L, Option("hello, \"quoted\"\nline\ttab"), 1.5, true),
      (2L, Option.empty[String], -0.0, false),
      (3L, Option("ünïcødé ✓ ”smart”"), math.Pi, true))
      .toDF("id", "s", "d", "b")
    val path = s"$tmp/avro_rt"
    AvroIo.write(df, path)
    val back = AvroIo.read(spark, path, df.schema)
    assert(back.orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
    // container files on disk, one per non-empty partition
    assert(Files.list(Paths.get(path)).iterator().hasNext)
  }

  test("Avro read resolves fields by name, independent of column order") {
    val df = Seq((7L, "x", 2.5)).toDF("id", "s", "d")
    val path = s"$tmp/avro_reorder"
    AvroIo.write(df, path)
    val back = AvroIo.read(spark, path,
      org.apache.spark.sql.types.StructType.fromDDL(
        "d DOUBLE, id BIGINT, s STRING"))
    val r = back.head()
    assert(r.getDouble(0) == 2.5 && r.getLong(1) == 7L && r.getString(2) == "x")
  }

  test("AvroIo rejects non-primitive columns loudly") {
    val df = Seq((1L, Seq("a"))).toDF("id", "arr")
    intercept[IllegalArgumentException] { AvroIo.schemaJson(df.schema) }
  }

  test("partitioned parquet sink creates partition directories for pruning") {
    val out = s"$tmp/part"
    DocumentSources.writePartitioned(
      Seq((1L, "en", "x"), (2L, "de", "y")).toDF("id", "lang", "v"),
      out, Seq("lang"))
    assert(Files.exists(Paths.get(s"$out/lang=en")))
    val pruned = spark.read.parquet(out).where(col("lang") === "en")
    assert(pruned.count() == 1)
    // the filter must prune PARTITIONS at the scan (directory-level skip),
    // not survive as a post-scan row filter
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "lang")),
      scan.partitionFilters.toString)
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .map(_.files.size).sum == 1)
  }
}
