"""PDF text extraction (pdftext.py) + ingestion (reference
ingest.rs:79-156 IndexPdfFile / IngestPdf)."""

import zlib

import seekstorm_tpu as st
from seekstorm_tpu.pdftext import extract_text


def make_pdf(lines, title=None, compress=True, creation="D:20240301120000"):
    """Build a small valid PDF: one page, Helvetica, optional Flate
    content stream, optional Info dict."""
    content = b"BT /F1 12 Tf 72 720 Td " + b" ".join(
        b"(%s) Tj 0 -14 Td" % line.encode("latin-1") for line in lines
    ) + b" ET"
    if compress:
        data = zlib.compress(content)
        stream_dict = b"<< /Length %d /Filter /FlateDecode >>" % len(data)
    else:
        data = content
        stream_dict = b"<< /Length %d >>" % len(data)

    objs = []
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    objs.append(
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"
    )
    objs.append(stream_dict + b"\nstream\n" + data + b"\nendstream")
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    if title is not None:
        objs.append(b"<< /Title (%s) /CreationDate (%s) >>"
                    % (title.encode("latin-1"), creation.encode()))

    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, o in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    trailer = b"<< /Size %d /Root 1 0 R" % (len(objs) + 1)
    if title is not None:
        trailer += b" /Info %d 0 R" % len(objs)
    trailer += b" >>"
    out += b"trailer\n" + trailer + b"\nstartxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(out)


def test_extract_text_flate_with_info():
    pdf = make_pdf(["Hello TPU search engine", "second line of text"],
                   title="My Report")
    text, meta = extract_text(pdf)
    assert "Hello TPU search engine" in text
    assert "second line of text" in text
    assert meta["title"] == "My Report"
    assert meta["creation_date"] == "2024-03-01"


def test_extract_text_uncompressed_title_heuristic():
    pdf = make_pdf(["First Line Title", "body words here"], title=None,
                   compress=False)
    text, meta = extract_text(pdf)
    assert "body words here" in text
    assert meta["title"] == "First Line Title"


def test_extract_tj_array_and_escapes():
    content = (rb"BT /F1 10 Tf [(spl) -20 (it ar) 5 (ray)] TJ "
               rb"0 -14 Td (par\(en\) and \101BC) Tj ET")
    data = zlib.compress(content)
    pdf = make_pdf(["x"])  # template, then replace the stream object
    pdf = pdf  # build manually instead
    # simpler: direct one-off document
    head = (b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
            b"\nendobj\n"
            b"4 0 obj\n<< /Length " + str(len(data)).encode()
            + b" /Filter /FlateDecode >>\nstream\n")
    doc = (head + data + b"\nendstream\nendobj\n"
           b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n")
    text, _ = extract_text(doc)
    assert "split array" in text.replace("\n", " ")
    assert "par(en) and ABC" in text


def test_ingest_pdf_roundtrip(tmp_path):
    pdf = make_pdf(["quantum flibbertigibbet retrieval"], title="Qdoc")
    p = tmp_path / "doc.pdf"
    p.write_bytes(pdf)
    schema = [
        st.SchemaField("title", st.FieldType.Text, stored=True, indexed=True),
        st.SchemaField("body", st.FieldType.Text, stored=True, indexed=True),
    ]
    idx = st.create_index(tmp_path / "ix", schema, shard_count=1)
    from seekstorm_tpu.ingest import ingest_file

    assert ingest_file(idx, p) == 1
    idx.commit()
    rs = idx.search(st.SearchRequest(query="flibbertigibbet",
                                     fields=["title", "body"]))
    assert rs.result_count == 1
    assert rs.results[0].doc["title"] == "Qdoc"


def test_lz4_docstore_roundtrip(tmp_path):
    """Lz4 doc compression is real (in-repo C++ block codec) — no silent
    zlib fallback (reference doc_store.rs:80-103)."""
    from seekstorm_tpu.docstore import resolve_codec
    from seekstorm_tpu.schema import DocumentCompression

    assert resolve_codec(DocumentCompression.Lz4) == DocumentCompression.Lz4

    schema = [st.SchemaField("body", st.FieldType.Text, stored=True,
                             indexed=True)]
    meta = st.IndexMeta(doc_compression=DocumentCompression.Lz4)
    idx = st.create_index(tmp_path / "ix", schema, meta=meta, shard_count=1)
    docs = [{"body": f"document number {i} with repeated repeated text"}
            for i in range(50)]
    idx.index_documents(docs)
    idx.commit()
    got = idx.get_document(0)
    assert got["body"].startswith("document number 0")
    idx2 = st.open_index(tmp_path / "ix")
    assert idx2.get_document(49 * 1)["body"].startswith("document number")
