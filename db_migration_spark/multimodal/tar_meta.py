"""TAR (ustar) member scanning with a hand-rolled header parser.

POSIX ustar: 512-byte headers — name (100), mode/uid/gid (octal), size
(12, octal), mtime (12, octal), checksum (8, octal, computed with the
checksum field itself blanked to spaces), typeflag, magic ``ustar``.
Member data follows, padded to 512; two zero blocks end the archive.

The checksum recomputation is the integrity detail this parser exists
for (stdlib tarfile hides it); encoding uses stdlib ``tarfile`` so the
parse is tested against an independent writer.  SURVEY §2.12 archive
tier next to the ZIP scan.
"""

from __future__ import annotations


def is_tar(b: bytes) -> bool:
    return len(b) >= 512 and b[257:262] == b"ustar"


def _octal(field: bytes) -> int:
    s = field.split(b"\x00")[0].strip()
    return int(s or b"0", 8)


def scan_tar_members(data: bytes) -> list[dict]:
    """Walk headers → [{name, size, mtime, typeflag}]; raises on a
    checksum mismatch or truncated member."""
    out = []
    pos = 0
    while pos + 512 <= len(data):
        hdr = data[pos : pos + 512]
        if hdr == b"\x00" * 512:
            break
        stored = _octal(hdr[148:156])
        blanked = hdr[:148] + b" " * 8 + hdr[156:]
        if sum(blanked) != stored:
            raise ValueError(f"tar header checksum mismatch at {pos}")
        size = _octal(hdr[124:136])
        if pos + 512 + size > len(data):
            raise ValueError("truncated tar member")
        out.append(
            {
                "name": hdr[:100].split(b"\x00")[0].decode(),
                "size": size,
                "mtime": _octal(hdr[136:148]),
                "typeflag": chr(hdr[156]) if hdr[156] else "0",
            }
        )
        pos += 512 + ((size + 511) // 512) * 512
    return out
