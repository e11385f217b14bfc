"""Fast-path HTML block scanner — same blocks as the stdlib
``html.parser`` extractor at 2.7× its parse speed.

Measured honestly (PLANS.md "Flagship CPU profile"): the block-parse
stage alone runs 154 → 58 ms over the sf0.01 html corpus (2.7×), which
nets ≈1.16× on the whole single-core extract+correct path — a cProfile
view exaggerates the stdlib parser's share to ~56% because its many
tiny event-callbacks each pay profiler overhead; the wall-clock A/B is
the number that counts. The scanner drives ONE compiled-regex search
per tag (C speed) instead of a Python character state machine, and
reproduces ``_BlockExtractor``'s block stream EXACTLY — same (norm,
start, end, total, link_chars) tuples, same offsets — for a VERIFIED
subset of HTML. Anything outside the subset (comments, processing
instructions, doctypes, character references, case-variant CDATA
closers, malformed or unterminated tags, exotic attribute quoting)
returns ``None`` and the caller falls back to the stdlib parser, so the
fast path can never silently diverge: it either matches byte-for-byte
or declines.

The parity contract is enforced three ways (tests/test_fasthtml.py):
corpus-wide equality of both paths on every generated page, an
adversarial construct table (each either matches stdlib exactly or
returns None), and a hypothesis property test over random tag soup.
"""
from __future__ import annotations

import re

from html.parser import HTMLParser

# ONE well-formed tag — end form or start form with simple attrs (quoted
# values may contain '>' but not '<'); anything the pattern skips is
# re-checked segment-side and declines the document
_TAG = re.compile(
    r"""<(?:
        (/)([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>                  # end tag
      | ([a-zA-Z][-.a-zA-Z0-9:_]*)                         # start tag name
        ((?:\s+[a-zA-Z_:][-.a-zA-Z0-9:_]*                  #   attrs
           (?:\s*=\s*(?:"[^"<]*"|'[^'<]*'|[^\s"'=<>`]+))?)*)
        \s*(/?)>
    )""",
    re.X,
)

_CDATA_ELEMS = ("script", "style")  # html.parser.CDATA_CONTENT_ELEMENTS

# stdlib set_cdata_mode ends CDATA on r'</\s*{name}\s*>' (re.I) — the
# fast path must search with the SAME pattern, then require the match
# to be the exact lowercase '</name>' form (anything looser declines):
# a plain find('</name') would sail past '</ name>' and diverge.
_CDATA_CLOSER = {
    name: re.compile(rf"</\s*{name}\s*>", re.I) for name in _CDATA_ELEMS
}


def _segment_ok(seg: str) -> bool:
    """A text segment is safe iff every '<' in it is the literal-data
    case (next char present and not tag-opening) — a tag-like '<' here
    means the master pattern skipped malformed markup whose stdlib
    recovery could differ, a trailing '<' hits stdlib buffering, and
    any '&' means charref conversion: decline all three."""
    if "&" in seg:
        return False
    k = seg.find("<")
    while k != -1:
        if k + 1 >= len(seg):
            return False
        c = seg[k + 1]
        if c.isalpha() or c in "/!?":
            return False
        k = seg.find("<", k + 1)
    return True


def scan_blocks(raw: str, prune_tags: frozenset, block_tags: frozenset):
    """Block stream of ``raw`` — list of (norm, start, end, total,
    link_chars) identical to ``_BlockExtractor`` — or ``None`` when the
    document leaves the verified subset.

    One compiled-regex search per tag; text between tags is handled as
    one chunk per gap (stdlib may split a gap at literal '<'s, but block
    assembly only consumes the concatenation, first offset and last end,
    which are identical either way)."""
    blocks: list[tuple[str, int, int, int, int]] = []
    chunks: list[tuple[str, int]] = []
    link_chars = 0
    prune_depth = 0
    link_depth = 0

    def flush():
        nonlocal link_chars
        if chunks:
            joined = "".join(c for c, _ in chunks)
            norm = " ".join(joined.split())
            if norm:
                start = chunks[0][1]
                end = chunks[-1][1] + len(chunks[-1][0])
                blocks.append((norm, start, end, len(joined), link_chars))
            chunks.clear()  # in place: the loop's bound .append stays valid
            link_chars = 0

    n = len(raw)
    pos = 0
    search = _TAG.search
    append = chunks.append
    while True:
        m = search(raw, pos)
        s = m.start() if m else n
        if s > pos and not prune_depth:
            seg = raw[pos:s]
            if not _segment_ok(seg):
                return None
            append((seg, pos))
            if link_depth:
                link_chars += len(seg)
        elif s > pos:
            # pruned text still needs the malformed-markup check: a
            # comment/PI in a pruned region could hide structure tags
            if not _segment_ok(raw[pos:s]):
                return None
        if m is None:
            break
        end_slash, end_name, name, _attrs, self_slash = m.group(1, 2, 3, 4, 5)
        if end_slash:
            name = end_name.lower()
            if name in prune_tags:
                prune_depth = max(0, prune_depth - 1)
            elif name in block_tags:
                flush()
            elif name == "a":
                link_depth = max(0, link_depth - 1)
            pos = m.end()
            continue
        name = name.lower()
        if name in prune_tags:
            prune_depth += 1
        elif name in block_tags:
            flush()
        elif name == "a":
            link_depth += 1
        pos = m.end()
        if self_slash:
            # handle_startendtag default = start + end (no cdata mode)
            if name in prune_tags:
                prune_depth = max(0, prune_depth - 1)
            elif name in block_tags:
                flush()
            elif name == "a":
                link_depth = max(0, link_depth - 1)
        elif name in _CDATA_ELEMS:
            closer = f"</{name}>"
            cm = _CDATA_CLOSER[name].search(raw, pos)
            if cm is None or raw[cm.start() : cm.start() + len(closer)] != closer:
                return None  # unterminated / non-canonical closer — decline
            cpos = cm.start()
            # CDATA content: raw data, no charref conversion (pruned
            # here — script/style are PRUNE_TAGS — but keep the contract)
            if cpos > pos and prune_depth == 0:
                seg = raw[pos:cpos]
                append((seg, pos))
                if link_depth:
                    link_chars += len(seg)
            if name in prune_tags:
                prune_depth = max(0, prune_depth - 1)
            elif name in block_tags:
                flush()
            pos = cpos + len(closer)
    flush()
    return blocks


def blocks_stdlib(raw: str, extractor_cls: type[HTMLParser]):
    """The stdlib path, shared by the fallback and the parity tests."""
    parser = extractor_cls(raw)
    parser.feed(raw)
    parser.close()
    parser._flush()
    return parser.blocks
