"""Minimal pure-Python PDF text extraction (pdfminer-style layout parse,
restricted to the uncompressed text-object subset our fixtures emit).

The reference delegates layout analysis to PaddleOCR's native pipeline
(/root/reference/ocr/paddle_extractor.py:21-25); here the equivalent for
binary '%PDF-' payloads is a scan of BT..ET text objects: each
``x y Td (string) Tj`` (or ``[..] TJ``) show-text operation becomes one
positioned block. PDF user space has y increasing upward, so reading
order uses y' = PAGE_H - y.

Real-world PDFs with compressed streams are out of scope for v1 (no
zlib-deflated content streams in fixtures); the interface is the same
block stream as html_blocks, so a fuller parser slots in transparently.
"""

from __future__ import annotations

import re

from .html_blocks import Block
from .scoring import block_score

PAGE_H = 800.0

_BT_ET = re.compile(rb"BT(.*?)ET", re.DOTALL)
_TD = re.compile(rb"(-?[\d.]+)\s+(-?[\d.]+)\s+(Td|TD)")
_TM = re.compile(
    rb"(-?[\d.]+)\s+(-?[\d.]+)\s+(-?[\d.]+)\s+(-?[\d.]+)\s+(-?[\d.]+)\s+(-?[\d.]+)\s+Tm"
)
_TL = re.compile(rb"(-?[\d.]+)\s+TL")
_TSTAR = re.compile(rb"T\*")
_TJ_STR = re.compile(rb"\(((?:\\.|[^\\()])*)\)\s*Tj")
_TJ_ARR = re.compile(rb"\[((?:\\.|[^\]])*)\]\s*TJ")
_ARR_STR = re.compile(rb"\(((?:\\.|[^\\()])*)\)")
_LAYOUT = re.compile(rb"%layout:(\w+)")

_ESCAPES = {
    b"\\n": b"\n", b"\\r": b"\r", b"\\t": b"\t", b"\\b": b"\b",
    b"\\f": b"\f", b"\\(": b"(", b"\\)": b")", b"\\\\": b"\\",
}


def _unescape(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        if raw[i : i + 1] == b"\\" and i + 1 < len(raw):
            two = raw[i : i + 2]
            if two in _ESCAPES:
                out += _ESCAPES[two]
                i += 2
                continue
            # Octal escape \ddd
            m = re.match(rb"\\([0-7]{1,3})", raw[i:])
            if m:
                out.append(int(m.group(1), 8) & 0xFF)
                i += 1 + len(m.group(1))
                continue
            out += raw[i + 1 : i + 2]
            i += 2
        else:
            out += raw[i : i + 1]
            i += 1
    return out.decode("latin-1")


def parse_pdf_blocks(payload: bytes) -> tuple[list[Block], str]:
    """Parse a %PDF- payload into blocks. Returns (blocks, layout); layout
    comes from a '%layout:<name>' comment (generator-controlled dispatch
    axis), defaulting to 'article'."""
    m = _LAYOUT.search(payload)
    layout = m.group(1).decode("ascii") if m else "article"
    if layout not in ("article", "listing"):
        layout = "article"

    shows: list[tuple[float, float, str]] = []  # (x, y_down, text)
    for obj in _BT_ET.finditer(payload):
        body = obj.group(1)
        # Text-positioning state per PDF 1.7 §9.4.2: the line matrix is
        # identity at BT; Td/TD translate RELATIVE to the current line
        # start; Tm sets it absolutely (e,f components); TL sets the
        # leading used by T* (move to next line). Fixtures emit a single
        # Td from the BT origin, for which relative == absolute.
        x, y = 0.0, 0.0
        leading = 0.0
        events: list[tuple[int, str, object]] = []
        for mt in _TD.finditer(body):
            events.append(
                (mt.start(), "td",
                 (float(mt.group(1)), float(mt.group(2)), mt.group(3) == b"TD"))
            )
        for mm in _TM.finditer(body):
            events.append(
                (mm.start(), "tm", (float(mm.group(5)), float(mm.group(6))))
            )
        for ml in _TL.finditer(body):
            events.append((ml.start(), "tl", float(ml.group(1))))
        for ms in _TSTAR.finditer(body):
            events.append((ms.start(), "tstar", None))
        for ms in _TJ_STR.finditer(body):
            events.append((ms.start(), "tj", _unescape(ms.group(1))))
        for ma in _TJ_ARR.finditer(body):
            parts = [_unescape(s.group(1)) for s in _ARR_STR.finditer(ma.group(1))]
            events.append((ma.start(), "tj", "".join(parts)))
        events.sort(key=lambda e: e[0])
        for _, kind, val in events:
            if kind == "td":
                tx, ty, sets_leading = val
                x += tx
                y += ty
                if sets_leading:  # TD also sets leading = -ty
                    leading = -ty
            elif kind == "tm":
                x, y = val
            elif kind == "tl":
                leading = val
            elif kind == "tstar":
                y -= leading
            else:
                shows.append((x, PAGE_H - y, str(val)))

    blocks: list[Block] = []
    offset = 0
    idx = 0
    for x, y_down, raw_text in shows:
        text = " ".join(raw_text.split())
        if not text:
            continue
        n = len(text)
        blocks.append(
            Block(
                idx=idx,
                tag_path="pdf>bt",
                text=text,
                depth=2,
                char_offset=offset,
                n_chars=n,
                link_density=0.0,
                score=block_score(text, 0.0),
                x=x,
                y=y_down,
                boiler=False,
            )
        )
        offset += n + 1
        idx += 1
    return blocks, layout


def is_pdf(payload: bytes) -> bool:
    return payload[:5] == b"%PDF-"
