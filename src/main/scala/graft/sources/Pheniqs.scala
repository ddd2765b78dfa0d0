package graft.sources

/** Pheniqs demultiplex-config generation: the JSON job description the
  * pheniqs demultiplexer consumes, derived from the qiime mapping file.
  *
  * Reference: `mmeds/util.py:1051-1111` (`make_pheniqs_config`) — the
  * last data-shaped transform in the reference's `util.py`. The output
  * is golden-pinned BYTE-FOR-BYTE against the reference implementation
  * run on its own dual-barcode fixture, including the reference's
  * literal whitespace quirks (the run of spaces its Python
  * line-continuations leave inside string literals) — a consumer diffing
  * configs between engines sees zero drift.
  *
  * Driver-side string work by design: configs are KB-sized control
  * files; the DATA path (the fastq demultiplex itself) is the
  * distributed operator in [[Fastq]].
  */
object Pheniqs {

  /** Build the pheniqs `output.json` content for dual-barcode demux.
    *
    * `mappingLines` are the raw lines of a qiime mapping TSV — either
    * the 2-header `#SampleID`/`#q2:types` form or the plain 1-header
    * form, auto-detected exactly like the reference's KeyError fallback
    * (`util.py:1078-1084`). Sample names and barcodes come from the
    * `#SampleID`, `BarcodeSequence` and `BarcodeSequenceR` columns;
    * each sample contributes one codec entry, and reads route to
    * `<oDirectory>/<sample>_S1_L001_R{1,2}_001.fastq.gz` with
    * unmatched reads in `undetermined_*`. */
  def makePheniqsConfig(readsForward: String, readsReverse: String,
      barcodesForward: String, barcodesReverse: String,
      mappingLines: Seq[String], oDirectory: String,
      testing: Boolean = false): String = {
    val rows = mappingLines.filter(_.nonEmpty)
      .map(_.split("\t", -1).toIndexedSeq)
    require(rows.nonEmpty, "empty mapping file")
    val header = rows.head
    val twoHeader = rows.lengthCompare(1) > 0 &&
      rows(1).headOption.contains("#q2:types")
    val data = if (twoHeader) rows.drop(2) else rows.drop(1)
    def idx(name: String): Int = {
      val i = header.indexOf(name)
      require(i >= 0, s"mapping file lacks column $name")
      i
    }
    val (iId, iB1, iB2) =
      (idx("#SampleID"), idx("BarcodeSequence"), idx("BarcodeSequenceR"))

    val sb = new StringBuilder
    sb.append("{\n\t\"input\": [\n\t\t\"").append(readsForward)
      .append("\",\n\t\t\"").append(barcodesForward)
      .append("\",\n\t\t\"").append(barcodesReverse)
      .append("\",\n\t\t\"").append(readsReverse)
      .append("\"\n\t],\n\t\"output\": [ \"")
    // the reference's testing branch glues oDirectory to the filename
    // through a 20-space run (a line-continuation artifact its own
    // tests consume) — reproduced verbatim
    if (testing)
      sb.append(oDirectory).append(" " * 20).append("/output_all.fastq\" ],")
    else sb.append("output_all.fastq\" ],")
    sb.append("\n\t\"template\": {\n\t\t\"transform\": {\n\t\t\t\"comment\": " +
      "\"This global transform directive specifies the     segments that " +
      "will be written to output as the biological sequences of interest, " +
      "this represents all of R1 and R2.\"")
    sb.append(",\n\t\t\t\"token\": [ \"0::\", \"3::\" ]\n\t\t}\n\t},\n\t" +
      "\"sample\": {\n\t\t\"transform\": {\n\t\t\t\"token\": " +
      "[ \"1::8\", \"2::8\" ]\n\t\t},\n\t\t\"algorithm\": \"pamld\"," +
      "\n\t\t\"confidence threshold\": 0.95,\n\t\t" +
      "\"noise\": 0.05,\n\t\t\"codec\": {\n")
    data.zipWithIndex.foreach { case (row, i) =>
      val (name, b1, b2) = (row(iId), row(iB1), row(iB2))
      sb.append("\t\t\t\"@").append(name).append("\": {\n\t\t\t\t\"LB\": \"")
        .append(name).append("\",\n\t\t\t\t\"barcode\": [ \"").append(b1)
        .append("\", \"").append(b2).append("\" ],\n\t\t\t\t\"output\": [" +
          "        \n\t\t\t\t\t\"")
        .append(oDirectory).append("/").append(name)
        .append("_S1_L001_R1_001.fastq.gz\",\n\t\t\t\t\t\"")
        .append(oDirectory).append("/").append(name)
        .append("_S1_L001_R2_001.fastq.gz\"\n\t\t\t\t]\n\t\t\t}")
      sb.append(if (i == data.length - 1) "\n" else ",\n")
    }
    sb.append("\t\t},\n\t\t\"undetermined\": {\n\t\t\t\"output\": [\n" +
      "\t\t\t\t        \"").append(oDirectory)
      .append("/undetermined_S1_L001_R1_001.fastq.gz\",\n\t\t\t\t        \"")
      .append(oDirectory)
      .append("/undetermined_S1_L001_R2_001.fastq.gz\"\n\t\t\t]\n\t\t}\n\t}\n}")
    sb.toString
  }
}
