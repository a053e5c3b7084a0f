"""Unstructured-document file parsing: files → markdown text records.

Reference parity (rosecape/airbyte `airbyte-cdk/python/airbyte_cdk/sources/
file_based/file_types/unstructured_parser.py:1-357`):

- record shape per FILE: ``{content: <markdown or null>, document_key:
  <file uri>, _ab_source_file_parse_error: <message or null>}`` — parse
  errors are captured per file, never fatal, when
  ``skip_unprocessable_files`` is set (`parse_records`, lines 120-150);
  otherwise the first bad file fails the sync.
- file-type detection: name first, content sniff second
  (`_get_filetype`, lines 297-325).
- markdown and plain text pass through decoded verbatim (`_read_file`,
  lines 159-163); structured formats partition into elements rendered as
  markdown — Title → ``#``*depth, ListItem → ``- ``, Formula → fenced code,
  anything else its text, blocks joined by blank lines
  (`_render_markdown`/`_convert_to_markdown`, lines 331-344).
- unsupported types get the "File type X is not supported" message
  (`_get_file_type_error_message`, lines 327-330).

Spark-first execution: ONE ``binaryFile`` scan over the directory (Spark
lists and splits by file; content arrives as a binary column), then a
single Arrow-batched ``mapInPandas`` that runs the pure-python parsers —
parallel BY FILE, exactly how the reference's per-file parser scales, and
the only shape possible: document parsing is a whole-file operation. No
per-row Python outside the one codec UDF; downstream everything is
DataFrame ops.

Sandbox honesty: markdown / plain-text / HTML parse for real (stdlib
only). PDF / DOCX / PPTX need a codec library (`unstructured`, not in
this container) — when it is importable we call it, otherwise those files
produce an explicitly-labeled parse-error record (the same degraded mode
the reference has when its partitioners are missing, `_read_file_locally`
lines 264-268). The detection, plumbing, record shape and error policy are
real and tested either way.
"""

from __future__ import annotations

import html.parser
import io
import re
import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

DOCUMENT_SCHEMA = StructType(
    [
        StructField("content", StringType(), True),
        StructField("document_key", StringType(), False),
        StructField("_ab_source_file_parse_error", StringType(), True),
    ]
)

#: extension → filetype (name-based detection, tried first like the
#: reference's detect_filetype(filename=...))
_EXT_TYPES = {
    ".md": "md",
    ".markdown": "md",
    ".txt": "txt",
    ".text": "txt",
    ".html": "html",
    ".htm": "html",
    ".pdf": "pdf",
    ".docx": "docx",
    ".pptx": "pptx",
}

SUPPORTED_TYPES = ("md", "txt", "html", "pdf", "docx", "pptx")

#: extensions the directory listing treats as document data files
DOCUMENT_EXTS = tuple(_EXT_TYPES)


class ParseError(ValueError):
    """A per-file parse failure (reference RecordParseError analog)."""


def detect_filetype(uri: str, head: bytes) -> str | None:
    """Name-first, content-sniff-second file-type detection
    (unstructured_parser.py:297-325 semantics, magic-byte edition)."""
    name = uri.lower()
    for ext, ftype in _EXT_TYPES.items():
        if name.endswith(ext):
            return ftype
    if head.startswith(b"%PDF"):
        return "pdf"
    if head.startswith(b"PK\x03\x04"):
        # OOXML container: dispatch on the archive's payload directory
        try:
            with zipfile.ZipFile(io.BytesIO(head)) as zf:
                names = set(zf.namelist())
        except Exception:  # noqa: BLE001 — truncated/other zip: unknown
            return None
        if any(n.startswith("word/") for n in names):
            return "docx"
        if any(n.startswith("ppt/") for n in names):
            return "pptx"
        return None
    sniff = head[:1024].lstrip().lower()
    if sniff.startswith((b"<!doctype html", b"<html")):
        return "html"
    try:
        head.decode("utf-8")
    except UnicodeDecodeError:
        return None
    return "txt"


def _unsupported_message(ftype: str | None) -> str:
    supported = ", ".join(SUPPORTED_TYPES)
    return f"File type {ftype} is not supported. Supported file types are {supported}"


class _HtmlToMarkdown(html.parser.HTMLParser):
    """HTML → markdown blocks with the reference's element mapping
    (unstructured_parser.py:336-344): headings → '#'*depth, list items →
    '- ', pre/code blocks → fenced, everything else its text."""

    _HEADINGS = {f"h{i}": i for i in range(1, 7)}
    _SKIP = {"script", "style", "head", "title"}

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[str] = []
        self._buf: list[str] = []
        self._mode = ""  # '', '#'*n, '-', '```'
        self._skip_depth = 0

    def _flush(self) -> None:
        text = re.sub(r"\s+", " ", "".join(self._buf)).strip()
        self._buf = []
        mode, self._mode = self._mode, ""
        if not text:
            return
        if mode.startswith("#"):
            self.blocks.append(f"{mode} {text}")
        elif mode == "-":
            self.blocks.append(f"- {text}")
        elif mode == "```":
            self.blocks.append(f"```\n{text}\n```")
        else:
            self.blocks.append(text)

    def handle_starttag(self, tag, attrs):
        if tag in self._SKIP:
            self._skip_depth += 1
            return
        if tag in self._HEADINGS:
            self._flush()
            self._mode = "#" * self._HEADINGS[tag]
        elif tag == "li":
            self._flush()
            self._mode = "-"
        elif tag == "pre":
            self._flush()
            self._mode = "```"
        elif tag in ("p", "div", "br", "tr", "table", "ul", "ol", "blockquote"):
            self._flush()

    def handle_endtag(self, tag):
        if tag in self._SKIP:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag in self._HEADINGS or tag in ("li", "pre", "p", "div", "tr"):
            self._flush()

    def handle_data(self, data):
        if not self._skip_depth:
            self._buf.append(data)

    def render(self) -> str:
        self._flush()
        return "\n\n".join(self.blocks)


def html_to_markdown(raw: str) -> str:
    parser = _HtmlToMarkdown()
    parser.feed(raw)
    parser.close()
    return parser.render()


def _parse_codec(content: bytes, ftype: str, uri: str) -> str:
    """PDF/DOCX/PPTX via the `unstructured` partitioners when importable
    (unstructured_parser.py:252-268); honest error otherwise — this
    sandbox has no codec library, so these files yield parse-error
    records, never fake text."""
    try:
        if ftype == "pdf":
            from unstructured.partition.pdf import partition_pdf as part
        elif ftype == "docx":
            from unstructured.partition.docx import partition_docx as part
        else:
            from unstructured.partition.pptx import partition_pptx as part
    except ImportError:
        raise ParseError(
            f"{ftype} codec not available in this environment "
            f"(install `unstructured` to parse {uri})"
        ) from None
    try:
        elements = [el.to_dict() for el in part(file=io.BytesIO(content))]
    except Exception as e:  # noqa: BLE001 — corrupt file = parse error
        raise ParseError(f"error partitioning {uri}: {e}") from e
    return _render_elements(elements)


def _render_elements(elements: list[dict]) -> str:
    """Element dicts → markdown (unstructured_parser.py:331-344)."""
    out = []
    for el in elements:
        text = el.get("text") or ""
        etype = el.get("type")
        if etype == "Title":
            depth = (el.get("metadata") or {}).get("category_depth") or 1
            out.append(f"{'#' * depth} {text}")
        elif etype == "ListItem":
            out.append(f"- {text}")
        elif etype == "Formula":
            out.append(f"```\n{text}\n```")
        else:
            out.append(str(text))
    return "\n\n".join(out)


def parse_file(uri: str, content: bytes) -> str:
    """One file's bytes → markdown string; raises ParseError on any
    per-file problem (unsupported type, bad encoding, missing codec)."""
    ftype = detect_filetype(uri, content)
    if ftype not in SUPPORTED_TYPES:
        raise ParseError(_unsupported_message(ftype))
    if ftype in ("md", "txt", "html"):
        try:
            decoded = content.decode("utf-8")
        except UnicodeDecodeError as e:
            raise ParseError(f"invalid utf-8 in {uri}: {e}") from e
        return html_to_markdown(decoded) if ftype == "html" else decoded
    return _parse_codec(content, ftype, uri)


def read_documents(
    spark: SparkSession,
    path: str,
    skip_unprocessable_files: bool = True,
    path_glob: str | None = None,
) -> DataFrame:
    """Directory of document files → DataFrame(content, document_key,
    _ab_source_file_parse_error), one row per file.

    The scan is Spark's ``binaryFile`` source (file listing, scheduling and
    splitting all native; one task per file group); parsing is one
    Arrow-batched mapInPandas — the unavoidable whole-file codec boundary,
    and the ONLY Python on the path. With ``skip_unprocessable_files``
    (reference default posture for this parser) a bad file becomes an
    error-captured record; without it, the first bad file fails the read —
    exactly `parse_records` (unstructured_parser.py:120-150).
    """
    reader = spark.read.format("binaryFile")
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    files = reader.load(path).select("path", "content")

    def parse(batches):
        import pandas as pd

        for b in batches:
            rows = []
            for uri, content in zip(b["path"], b["content"]):
                raw = bytes(content)
                try:
                    rows.append((parse_file(uri, raw), uri, None))
                except ParseError as e:
                    if not skip_unprocessable_files:
                        raise
                    rows.append((None, uri, str(e)))
            yield pd.DataFrame(
                rows, columns=["content", "document_key", "_ab_source_file_parse_error"]
            )

    return files.mapInPandas(parse, schema=DOCUMENT_SCHEMA)


class UnstructuredSource:
    """Incremental document-directory sync: the same per-file history
    cursor as the tabular file formats (`files.FileHistoryCursor`,
    reference `default_file_based_cursor.py:15-132`) over document files —
    sync N+1 parses only NEW or MODIFIED files, in (mtime, uri) order,
    resumable per slice. The natural feed for a continuously-curated
    corpus: each slice lands as (content, document_key, parse_error)
    records keyed by file uri, which the downstream exact-dedup /
    LWW-by-key stages absorb on at-least-once replays."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        skip_unprocessable_files: bool = True,
    ):
        self.spark = spark
        self.path = path
        self.skip_unprocessable_files = skip_unprocessable_files

    def list_files(self):
        """Driver-side (uri, mtime) listing of document files — metadata
        only, same discipline as FileSource.list_files."""
        import os
        from datetime import datetime

        from airbyte_spark.sources.files import RemoteFile, _TS_FMT

        out = []
        for root, _dirs, names in os.walk(self.path):
            for n in names:
                if n.startswith((".", "_")) or not n.lower().endswith(DOCUMENT_EXTS):
                    continue
                p = os.path.join(root, n)
                ts = datetime.utcfromtimestamp(os.stat(p).st_mtime).strftime(_TS_FMT)
                out.append(RemoteFile(last_modified=ts, uri=p))
        return sorted(out)

    def read_files(self, uris: list[str]) -> DataFrame:
        """Parse an explicit file list (the incremental path): binaryFile
        over the selected uris, one parsed record per file."""
        files = (
            self.spark.read.format("binaryFile")
            .load(uris)
            .select("path", "content")
        )
        skip = self.skip_unprocessable_files  # closure must not capture self

        def parse(batches):
            import pandas as pd

            for b in batches:
                rows = []
                for uri, content in zip(b["path"], b["content"]):
                    try:
                        rows.append((parse_file(uri, bytes(content)), uri, None))
                    except ParseError as e:
                        if not skip:
                            raise
                        rows.append((None, uri, str(e)))
                yield pd.DataFrame(
                    rows,
                    columns=["content", "document_key", "_ab_source_file_parse_error"],
                )

        return files.mapInPandas(parse, schema=DOCUMENT_SCHEMA)

    def incremental_slices(self, state: dict | None = None, files_per_slice: int = 1000):
        """Resumable incremental sync: yields (df, files, new_state) per
        slice of <= files_per_slice new/changed files — commit new_state
        AFTER durably writing the slice (FileSource.incremental_slices
        contract; a kill mid-sync resumes at the first uncommitted slice)."""
        from airbyte_spark.sources.files import FileHistoryCursor

        cur = FileHistoryCursor(state)
        todo = cur.files_to_sync(self.list_files())
        for i in range(0, len(todo), files_per_slice):
            chunk = todo[i : i + files_per_slice]
            df = self.read_files([f.uri for f in chunk])
            for f in chunk:
                cur.add_file(f)
            yield df, chunk, cur.get_state()

    def incremental(self, state: dict | None = None):
        """One-shot incremental read: (df-or-None, new_state)."""
        from airbyte_spark.sources.files import FileHistoryCursor

        df, new_state = None, dict(state or FileHistoryCursor(None).get_state())
        for d, _files, st in self.incremental_slices(state, files_per_slice=1 << 30):
            df, new_state = d, st
        return df, new_state


def documents_as_corpus(parsed: DataFrame) -> DataFrame:
    """Parsed records → the (doc_id, text) shape the §2.9b curation
    operators consume; error records are excluded (count them upstream —
    `jobs/curate_job.py` reports the drop)."""
    return (
        parsed.filter(parsed["content"].isNotNull())
        .select(
            parsed["document_key"].alias("doc_id"),
            parsed["content"].alias("text"),
        )
    )
