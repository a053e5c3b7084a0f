"""Unstructured-document parser (sources/unstructured.py): golden record
shape vs the reference's unstructured_parser.py semantics — content /
document_key / _ab_source_file_parse_error per FILE, errors captured not
fatal, strict mode fails the read; plus the markdown-strip projection and
the docs-dir front door of jobs/curate_job.py."""

from __future__ import annotations

import io
import json
import zipfile

import pytest

from airbyte_spark.functions.markdown import strip_markdown, strip_markdown_sql
from airbyte_spark.sources.unstructured import (
    ParseError,
    detect_filetype,
    documents_as_corpus,
    html_to_markdown,
    parse_file,
    read_documents,
)


def _fixture_dir(tmp_path) -> str:
    d = tmp_path / "docs"
    d.mkdir()
    (d / "readme.md").write_text("# Hello\n\nworld *x*")
    (d / "notes.txt").write_text("plain text doc with words")
    (d / "page.html").write_text(
        "<html><head><style>p{}</style><title>T</title></head><body>"
        "<h2>Head</h2><p>Para <b>one</b>.</p><ul><li>a</li><li>b</li></ul>"
        "<pre>x = 1</pre><script>evil()</script></body></html>"
    )
    (d / "doc.pdf").write_bytes(b"%PDF-1.4 fake body")
    (d / "bad.txt").write_bytes(b"\xff\xfe\x00not utf8")
    (d / "img.png").write_bytes(b"\x89PNG\r\n\x1a\n0000")
    return str(d)


def test_read_documents_record_shape_and_error_capture(spark, tmp_path):
    df = read_documents(spark, _fixture_dir(tmp_path))
    assert df.columns == ["content", "document_key", "_ab_source_file_parse_error"]
    rows = {r["document_key"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert len(rows) == 6  # one record per file, error files included

    # markdown / txt pass through verbatim (reference _read_file md/txt arm)
    assert rows["readme.md"]["content"] == "# Hello\n\nworld *x*"
    assert rows["notes.txt"]["content"] == "plain text doc with words"
    for ok in ("readme.md", "notes.txt", "page.html"):
        assert rows[ok]["_ab_source_file_parse_error"] is None

    # html → markdown with the reference element mapping; script/style dropped
    html_md = rows["page.html"]["content"]
    assert "## Head" in html_md and "- a" in html_md and "```\nx = 1\n```" in html_md
    assert "evil" not in html_md and "T" not in html_md.split("\n")[0]

    # per-file failures -> error-captured records, content null
    for bad, frag in [
        ("doc.pdf", "codec not available"),
        ("bad.txt", "invalid utf-8"),
        ("img.png", "not supported"),
    ]:
        assert rows[bad]["content"] is None
        assert frag in rows[bad]["_ab_source_file_parse_error"]

    # corpus view: parse errors excluded, (doc_id, text) shape
    corpus = documents_as_corpus(df)
    assert corpus.columns == ["doc_id", "text"]
    assert corpus.count() == 3


def test_read_documents_strict_mode_raises(spark, tmp_path):
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as ei:
        read_documents(
            spark, _fixture_dir(tmp_path), skip_unprocessable_files=False
        ).collect()
    assert "ParseError" in str(ei.value) or isinstance(ei.value, Py4JJavaError)


def test_detect_filetype_name_then_content():
    assert detect_filetype("a/b.md", b"x") == "md"
    assert detect_filetype("a/b.HTML".lower(), b"") == "html"
    assert detect_filetype("noext", b"%PDF-1.7 ...") == "pdf"
    assert detect_filetype("noext", b"<!DOCTYPE html><html>") == "html"
    assert detect_filetype("noext", b"hello world") == "txt"
    assert detect_filetype("noext", b"\x89PNG\r\n\x1a\n") is None
    # OOXML container sniff dispatches on payload directory
    for payload, expect in [("word/document.xml", "docx"), ("ppt/slides/s1.xml", "pptx")]:
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr(payload, "<x/>")
        assert detect_filetype("noext", buf.getvalue()) == expect


def test_parse_file_unsupported_message_matches_reference_style():
    with pytest.raises(ParseError) as ei:
        parse_file("x.png", b"\x89PNG\r\n\x1a\n")
    assert "is not supported. Supported file types are" in str(ei.value)


def test_html_to_markdown_element_mapping():
    md = html_to_markdown(
        "<h1>Top</h1><h3>Sub</h3><p>text <i>em</i></p><ol><li>one</li></ol>"
    )
    assert md.split("\n\n") == ["# Top", "### Sub", "text em", "- one"]


def test_strip_markdown_spark_duckdb_parity(spark):
    import duckdb

    md = (
        "# Title\n\nSome **bold** and *ital* with `code`, a [link](http://x) "
        "and ![img](p.png).\n\n```\nfence\n```\n\n- item\n\n> quote\n\n\n\nend"
    )
    got = (
        spark.createDataFrame([(md,)], "text string")
        .select(strip_markdown("text").alias("t"))
        .collect()[0]["t"]
    )
    want = duckdb.sql(
        f"select {strip_markdown_sql('text')} as t from (select ? as text)", params=[md]
    ).fetchone()[0]
    assert got == want
    assert "**" not in got and "](" not in got and "#" not in got and "fence" not in got


def test_curate_job_from_docs_dir(spark, tmp_path, capsys):
    src = _fixture_dir(tmp_path)
    out = str(tmp_path / "curated")
    from jobs.curate_job import main as curate_main

    rc = curate_main(
        ["--input", src, "--input-format", "docs-dir", "--output", out,
         "--jaccard-pct", "0", "--min-words", "2", "--max-dup-ngram-pct", "100"]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["parse_errors"] == 3
    assert report["input_docs"] == 3
    cur = spark.read.parquet(out)
    texts = {r["text"] for r in cur.select("text").collect()}
    # markdown syntax stripped before curation
    assert not any("#" in t or "<" in t for t in texts)


def test_incremental_document_sync_new_and_modified_only(spark, tmp_path):
    """FileHistoryCursor over a documents directory: sync 2 reads only the
    new file and the modified file; unchanged files never re-parse; state
    round-trips through plain dicts (checkpoint-carriable)."""
    import os
    import time

    from airbyte_spark.sources.unstructured import UnstructuredSource

    d = tmp_path / "docs"
    d.mkdir()
    (d / "a.md").write_text("# A")
    (d / "b.txt").write_text("bee")
    src = UnstructuredSource(spark, str(d))

    df, state = src.incremental(None)
    keys = {r["document_key"].rsplit("/", 1)[-1] for r in df.collect()}
    assert keys == {"a.md", "b.txt"}

    # nothing changed -> nothing to sync
    df2, state2 = src.incremental(state)
    assert df2 is None and state2["history"] == state["history"]

    # one new file + one modified file (mtime strictly newer)
    (d / "c.html").write_text("<h1>C</h1>")
    time.sleep(0.02)
    (d / "a.md").write_text("# A v2")
    future = time.time() + 2
    os.utime(d / "a.md", (future, future))
    df3, state3 = src.incremental(state)
    keys3 = {r["document_key"].rsplit("/", 1)[-1]: r["content"] for r in df3.collect()}
    assert set(keys3) == {"a.md", "c.html"}
    assert keys3["a.md"] == "# A v2" and keys3["c.html"] == "# C"

    # kill/resume at slice granularity: two files per slice of one —
    # committing only slice 1's state resumes at slice 2 exactly
    (d / "d.txt").write_text("dee")
    (d / "e.txt").write_text("eee")
    slices = list(src.incremental_slices(state3, files_per_slice=1))
    assert len(slices) == 2
    _df, files1, mid_state = slices[0]
    resumed = list(src.incremental_slices(mid_state, files_per_slice=1))
    assert len(resumed) == 1
    assert resumed[0][1][0].uri != files1[0].uri  # the uncommitted file
