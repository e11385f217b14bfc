"""Real (minimal) PDF text extraction with zero external dependencies —
the pdfminer-style reading-order recovery of the north rule, implemented
over stdlib ``zlib``/``re`` for the subset a generator without external
libs can produce and verify:

- content streams stored raw or FlateDecode-compressed;
- text via ``Tj`` (literal strings) and ``TJ`` (arrays of literals);
- positioning via ``Td`` / ``TD`` (relative moves) and ``Tm`` (absolute
  text matrix), one ``BT``/``ET`` block per run;
- literal-string escapes ``\\(`` ``\\)`` ``\\\\`` (the ones the paired
  writer emits).

Unsupported constructs (CMaps/Type0 fonts, encryption, cross-reference
streams, inline images) make ``extract_pdf_real`` raise ValueError, and
``core.extraction.extract_document`` falls back to the honest
``pdf_stub`` marker — nothing unsupported is silently half-parsed.

Reading order: collect (x, y, text) per show-text op, stable-sort by
(-y, x) — PDF user space is y-up, so descending y is top-to-bottom.
Spans are byte offsets of each text payload within the concatenated
DECODED content streams (deterministic; the compressed container has no
meaningful character offsets).

``build_simple_pdf`` is the deterministic fixture writer: a real
single-page PDF (header, catalog/pages/page/font objects, Flate-encoded
content stream, xref table, trailer) that external readers can open —
so the extractor is exercised against genuinely encoded files, like the
PNG/WAV codecs in core/media.py.
"""
from __future__ import annotations

import re
import zlib

# tempered match: params = the INNERMOST dict directly preceding the
# stream keyword (cannot span across objects or contain nested dicts) —
# a stream whose dict nests another dict (/DecodeParms …) simply doesn't
# match, and the count cross-check below turns that into a loud refusal
_STREAM_RE = re.compile(rb"<<((?:(?!<<|>>).)*)>>\s*stream\r?\n(.*?)endstream", re.DOTALL)
_TEXT_OP_RE = re.compile(
    r"""
    (?P<num1>-?[\d.]+)\s+(?P<num2>-?[\d.]+)\s+(?P<mv>Td|TD)
  | (?P<tm>(-?[\d.]+\s+){6})Tm
  | \((?P<tj>(?:\\.|[^\\()])*)\)\s*Tj
  | \[(?P<tja>(?:\((?:\\.|[^\\()])*\)|[^\]])*)\]\s*TJ
  | (?P<bt>BT)
  | (?P<et>ET)
    """,
    re.VERBOSE | re.DOTALL,
)
_LIT_RE = re.compile(r"\(((?:\\.|[^\\()])*)\)")

_UNESCAPE = {"\\(": "(", "\\)": ")", "\\\\": "\\"}


def _unescape(s: str) -> str:
    return re.sub(r"\\[()\\]", lambda m: _UNESCAPE[m.group(0)], s)


def _escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")


def extract_pdf_real(pdf_bytes: bytes) -> tuple[str, list[tuple[int, int]]]:
    """(text, spans) from a simple PDF. Raises ValueError on anything the
    minimal subset does not cover (the caller stubs those honestly)."""
    if not pdf_bytes.startswith(b"%PDF"):
        raise ValueError("not a PDF")
    matches = list(_STREAM_RE.finditer(pdf_bytes))
    # STRUCTURAL view: stream payloads blanked out, so marker checks
    # below can never false-positive on compressed bytes that happen to
    # contain '/XRef' etc. (r3 review — ~1e-6 per MB of Flate data)
    structural = bytearray(pdf_bytes)
    for m in matches:
        structural[m.start(2) : m.end(2)] = b"\x00" * (m.end(2) - m.start(2))
    structural = bytes(structural)
    if b"/Encrypt" in structural:
        raise ValueError("encrypted PDF not supported")
    # cross-reference STREAMS (PDF 1.5+: a /Type /XRef stream object in
    # place of the xref table, usually alongside /ObjStm object streams)
    # would match the generic stream regex and leak decompressed binary
    # xref rows into the text content — refuse loudly instead (VERDICT r2
    # item 8; the caller's pdf_stub fallback stays honest)
    if b"/XRef" in structural or b"/ObjStm" in structural:
        raise ValueError("cross-reference/object streams not supported")
    if len(matches) != structural.count(b"endstream"):
        # some stream's dict didn't parse as a flat innermost dict
        # (nested /DecodeParms etc.) — refuse rather than half-parse
        raise ValueError("unsupported stream dictionary shape")
    streams: list[bytes] = []
    for m in matches:
        params, data = m.group(1), m.group(2)
        # slice by the authoritative /Length — EOL-guessing before
        # 'endstream' corrupts compressed data whose last bytes happen to
        # be \n or \r
        if re.search(rb"/Length\s+\d+\s+\d+\s+R", params):
            raise ValueError("indirect /Length not supported")
        lm = re.search(rb"/Length\s+(\d+)", params)
        if not lm:
            raise ValueError("stream without /Length")
        data = data[: int(lm.group(1))]
        fm = re.search(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)", params)
        if fm:
            # /Filter may be a single name OR an array (a decode CHAIN,
            # applied in order). The subset supports exactly one link:
            # FlateDecode — given as a bare name or a one-element array.
            # Any chain or other filter refuses loudly; substring matching
            # alone would mis-decode e.g. [/ASCIIHexDecode /FlateDecode].
            names = re.findall(rb"/([A-Za-z0-9]+)", fm.group(1))
            if names == [b"FlateDecode"]:
                try:
                    data = zlib.decompress(data)
                except zlib.error as e:
                    raise ValueError(f"bad Flate stream: {e}") from None
            else:
                chain = b",".join(names).decode("ascii", "replace")
                raise ValueError(f"unsupported stream filter chain [{chain}]")
        elif b"/Filter" in params:
            raise ValueError("unparseable /Filter value")
        if b"/Image" in params or b"/XObject" in params:
            continue
        streams.append(data)
    if not streams:
        raise ValueError("no content streams")
    if b"/Type0" in structural or b"/CMap" in structural:
        raise ValueError("composite fonts not supported")

    content = b"\n".join(streams).decode("utf-8", errors="replace")
    # constructs the minimal subset does NOT cover must fail loudly (the
    # caller stubs honestly) instead of yielding silently wrong text:
    if re.search(r"<[0-9A-Fa-f\s]*>\s*(Tj|TJ)", content) or re.search(
        r"\[[^\]]*<[0-9A-Fa-f\s]*>[^\]]*\]\s*TJ", content
    ):
        raise ValueError("hex strings not supported")
    for lm in _LIT_RE.finditer(content):
        # tokenize pairwise (an escaped backslash consumes BOTH chars) —
        # the whole literal must be composed of supported tokens
        if not re.match(r"(?:\\[()\\]|[^\\])*\Z", lm.group(1)):
            raise ValueError("unsupported literal-string escape")
    items: list[tuple[float, float, str, int, int]] = []
    x = y = 0.0
    for m in _TEXT_OP_RE.finditer(content):
        if m.group("bt"):
            x = y = 0.0
        elif m.group("mv"):
            x += float(m.group("num1"))
            y += float(m.group("num2"))
        elif m.group("tm"):
            nums = m.group("tm").split()
            x, y = float(nums[4]), float(nums[5])
        elif m.group("tj") is not None:
            items.append((y, x, _unescape(m.group("tj")), m.start("tj"), m.end("tj")))
        elif m.group("tja") is not None:
            base = m.start("tja")
            parts = []
            s0 = e0 = None
            for lm in _LIT_RE.finditer(m.group("tja")):
                parts.append(_unescape(lm.group(1)))
                if s0 is None:
                    s0 = base + lm.start(1)
                e0 = base + lm.end(1)
            if parts:
                items.append((y, x, "".join(parts), s0, e0))
    # reading order: top-to-bottom (descending y), then left-to-right
    items.sort(key=lambda t: (-t[0], t[1]))
    text = "\n".join(t[2] for t in items)
    spans = [(s, e) for _, _, _, s, e in items]
    return text, spans


def build_simple_pdf(lines: list[tuple[float, float, str]], compress: bool = True) -> bytes:
    """A real single-page PDF placing each (x, y, text) line with an
    absolute Tm — deterministic bytes for fixtures and tests."""
    ops = ["BT", "/F1 12 Tf"]
    for x, y, text in lines:
        ops.append(f"1 0 0 1 {x:g} {y:g} Tm ({_escape(text)}) Tj")
    ops.append("ET")
    content = "\n".join(ops).encode()
    filt = b""
    if compress:
        content = zlib.compress(content, 9)
        filt = b" /Filter /FlateDecode"

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        b"<< /Length " + str(len(content)).encode() + filt + b" >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\nstartxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)
