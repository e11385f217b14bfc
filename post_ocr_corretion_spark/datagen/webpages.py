"""Deterministic synthetic Common-Crawl-style pages over the driver's
``documents`` table.

Every function is a pure function of (doc_id, text): regeneration at any
scale or in any process yields identical bytes — that is what makes the
per-url byte-identity gate meaningful. RNG = ``random.Random(doc_id-based
int seed)`` (platform-stable), never global state.

Page mix (pinned):
- ~1/16 of pages are fake-PDF (``%PDF-FAKE`` layout lines, shuffled,
  reading order recoverable by (y, x) sort);
- the rest are HTML: header/nav link farm + main content <p> blocks
  holding the OCR-noised document text + sidebar link farm + short footer
  (boilerplate the extractor must strip);
- hosts are skewed: half of all urls land on one host
  (``h0.example.com``) to exercise salting/AQE-skew handling at scale.

OCR noise mirrors the reference's operation distribution
(substitution/deletion/insertion = 0.7/0.15/0.15,
correctionSentences.py:17-21), applied per word with WORD_NOISE_P.
"""
from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

SEED = 12062022  # reference main.py:8
WORD_NOISE_P = 0.18
OP_CUMULATIVE = ((0.7, "substitution"), (0.85, "deletion"), (1.0, "insertion"))
CONFUSABLES = "0o1l5s8b6ecrnmuvij"
EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _rng(doc_id: int, salt: int) -> random.Random:
    return random.Random(SEED * 1_000_003 + doc_id * 7919 + salt)


def ocr_noise_word(word: str, rng: random.Random) -> str:
    if rng.random() >= WORD_NOISE_P or len(word) < 3:
        return word
    u = rng.random()
    op = next(name for cum, name in OP_CUMULATIVE if u < cum)
    pos = rng.randrange(len(word))
    ch = CONFUSABLES[rng.randrange(len(CONFUSABLES))]
    if op == "substitution":
        return word[:pos] + ch + word[pos + 1 :]
    if op == "deletion":
        return word[:pos] + word[pos + 1 :]
    return word[:pos] + ch + word[pos:]


def ocr_noise_text(text: str, doc_id: int) -> str:
    rng = _rng(doc_id, 1)
    return " ".join(ocr_noise_word(w, rng) for w in text.split(" "))


def host_for(doc_id: int) -> str:
    """Skewed host distribution: even doc_ids → one heavy host."""
    if doc_id % 2 == 0:
        return "h0.example.com"
    return f"h{1 + doc_id % 31}.example.com"


def url_for(doc_id: int) -> str:
    suffix = ".pdf" if doc_id % 16 == 7 else ".html"
    return f"https://{host_for(doc_id)}/crawl/p{doc_id}{suffix}"


def warc_ts_for(doc_id: int) -> datetime:
    return EPOCH + timedelta(seconds=doc_id * 37 % 31_536_000)


def _paragraphs(text: str, words_per_par: int = 15) -> list[str]:
    words = text.split(" ")
    return [" ".join(words[i : i + words_per_par]) for i in range(0, len(words), words_per_par)]


def render_html(doc_id: int, noisy_text: str) -> bytes:
    rng = _rng(doc_id, 2)
    nav_links = "".join(
        f'<li><a href="/cat/{rng.randrange(100)}">category {rng.randrange(100)} pages</a></li>'
        for _ in range(6)
    )
    sidebar = "".join(
        f'<a href="/rel/{rng.randrange(1000)}">related article number {rng.randrange(1000)} read more here</a> '
        for _ in range(8)
    )
    paragraphs = "".join(f"<p>{p}</p>" for p in _paragraphs(noisy_text))
    page = (
        "<html><head><title>page</title><script>var x=1;</script>"
        "<style>.m{color:red}</style></head><body>"
        f"<header><h1>Site {host_for(doc_id)}</h1></header>"
        f"<nav><ul>{nav_links}</ul></nav>"
        f'<div id="main">{paragraphs}</div>'
        f'<div class="sidebar">{sidebar}</div>'
        "<footer>copyright</footer></body></html>"
    )
    return page.encode("utf-8")


def render_pdf_fake(doc_id: int, noisy_text: str) -> bytes:
    """Fake-PDF page: layout lines '<y> <x> <text>' in shuffled order; the
    extractor must recover (y, x) reading order."""
    rng = _rng(doc_id, 3)
    pars = _paragraphs(noisy_text, 10)
    lines = [(i * 10, 5, p) for i, p in enumerate(pars)]
    rng.shuffle(lines)
    body = "\n".join(f"{y} {x} {t}" for y, x, t in lines)
    return f"%PDF-FAKE 1.0\n{body}\n".encode("utf-8")


def render_pdf_real(doc_id: int, noisy_text: str) -> bytes:
    """A REAL single-page PDF (core/pdf.py writer: Flate content stream,
    xref, Tm-positioned text) — paragraphs placed top-down in shuffled
    emission order; the extractor recovers reading order by position."""
    rng = _rng(doc_id, 4)
    pars = _paragraphs(noisy_text, 10)
    lines = [(72.0, 720.0 - 18.0 * i, p) for i, p in enumerate(pars)]
    rng.shuffle(lines)
    from ..core.pdf import build_simple_pdf

    return build_simple_pdf(lines)


def make_page(doc_id: int, text: str, lang: str) -> dict:
    """One north-rule row: (url, warc_ts, html, text, lang). Half the
    .pdf pages are REAL PDFs (doc_id % 32 == 7), half stay the fake
    layout format — both are parsed for real by core extraction."""
    noisy = ocr_noise_text(text, doc_id)
    url = url_for(doc_id)
    if url.endswith(".pdf"):
        html = render_pdf_real(doc_id, noisy) if doc_id % 32 == 7 else render_pdf_fake(doc_id, noisy)
    else:
        html = render_html(doc_id, noisy)
    return {
        "url": url,
        "warc_ts": warc_ts_for(doc_id),
        "html": html,
        "text": text,  # ground truth (reference 'solution' column analog)
        "lang": lang,
    }
