"""Minimal PDF structure metadata (pure stdlib, public ISO 32000 subset).

Encoder builds a spec-shaped single-xref PDF: header ``%PDF-1.x``, a
Catalog object, a Pages tree, N Page objects, an xref table with correct
byte offsets, and the ``startxref`` / ``%%EOF`` trailer.  The decoder
walks the REAL structure — reads the trailer's startxref pointer, parses
the xref table entry count, and counts ``/Type /Page`` objects — rather
than grepping, so a wrong offset or truncated xref fails loudly.

Rounds out the document modality next to the image/audio/video kernels
(SURVEY §2.12: opaque payload + typed metadata).  Only bytes/str ops.
"""

from __future__ import annotations


def is_pdf(b: bytes) -> bool:
    return len(b) >= 8 and b[:5] == b"%PDF-"


def encode_pdf_minimal(n_pages: int, minor: int = 4) -> bytes:
    """Header + catalog + pages tree + ``n_pages`` empty pages + xref."""
    if not (1 <= n_pages <= 1000 and 0 <= minor <= 7):
        raise ValueError("bad page count or version")
    objects: list[bytes] = []
    kids = " ".join(f"{3 + i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for _ in range(n_pages):
        objects.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] >>"
        )
    out = bytearray(f"%PDF-1.{minor}\n".encode())
    offsets = []
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    n = len(objects) + 1
    out += f"xref\n0 {n}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def decode_pdf_meta(data: bytes) -> dict:
    """Walk trailer → xref → objects; returns version, object count,
    page count, xref offset."""
    if not is_pdf(data):
        raise ValueError("not a PDF payload")
    try:
        minor = int(data[5:8].split(b".")[1].split()[0])
    except (IndexError, ValueError) as exc:
        raise ValueError("bad PDF version header") from exc
    tail = data.rfind(b"startxref")
    if tail < 0 or b"%%EOF" not in data[tail:]:
        raise ValueError("missing startxref/%%EOF trailer")
    xref_at = int(data[tail:].split()[1])
    if not data[xref_at:].startswith(b"xref"):
        raise ValueError("startxref does not point at an xref table")
    xref_head = data[xref_at:].split(b"\n", 2)
    first, count = (int(x) for x in xref_head[1].split())
    # verify each in-use entry's offset actually starts an object
    pos = xref_at + len(xref_head[0]) + 1 + len(xref_head[1]) + 1
    n_pages = 0
    for i in range(count):
        entry = data[pos + 20 * i : pos + 20 * (i + 1)]
        off, _gen, kind = entry[:10], entry[11:16], entry[17:18]
        if kind == b"n":
            o = int(off)
            if not data[o : o + 12].split(b" ")[0].isdigit():
                raise ValueError(f"xref entry {first + i} is dangling")
            body_end = data.find(b"endobj", o)
            # the trailing space distinguishes /Page from /Pages
            if b"/Type /Page " in data[o:body_end]:
                n_pages += 1
    return {
        "version_minor": minor,
        "n_objects": count - 1,  # entry 0 is the free-list head
        "n_pages": n_pages,
        "xref_at": xref_at,
    }
