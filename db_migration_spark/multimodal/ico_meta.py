"""ICO/CUR icon-directory metadata (pure stdlib, public ICONDIR format).

ICONDIR: u16 reserved=0, u16 type (1=ICO, 2=CUR), u16 count; then per
image an ICONDIRENTRY: u8 width (0 means 256), u8 height (0 means 256),
u8 palette count, u8 reserved, u16 planes/hotspot-x, u16 bpp/hotspot-y,
u32 payload size, u32 payload offset.  Sibling of webp_meta/tiff_meta;
SURVEY §2.12 metadata tier.
"""

from __future__ import annotations

import struct


def is_ico(b: bytes) -> bool:
    return (
        len(b) >= 6
        and b[0:2] == b"\x00\x00"
        and b[2:4] in (b"\x01\x00", b"\x02\x00")
    )


def encode_ico_header(images: list[tuple[int, int, int]]) -> bytes:
    """Minimal ICONDIR + entries for (width, height, bpp) triples;
    width/height up to 256 (stored 0), offsets laid out contiguously."""
    out = bytearray(struct.pack("<HHH", 0, 1, len(images)))
    offset = 6 + 16 * len(images)
    for w, h, bpp in images:
        if not (1 <= w <= 256 and 1 <= h <= 256):
            raise ValueError("ICO dimensions are 1..256")
        size = w * h * max(bpp // 8, 1)
        out += struct.pack(
            "<BBBBHHII",
            w % 256,
            h % 256,
            0,
            0,
            1,
            bpp,
            size,
            offset,
        )
        offset += size
    return bytes(out)


def decode_ico_meta(data: bytes) -> list[dict]:
    """Parse the directory → one dict per image (the 0-means-256
    decode included)."""
    if not is_ico(data):
        raise ValueError("not an ICO payload")
    (count,) = struct.unpack("<H", data[4:6])
    out = []
    for i in range(count):
        o = 6 + 16 * i
        w, h, pal, _res, planes, bpp, size, offset = struct.unpack(
            "<BBBBHHII", data[o : o + 16]
        )
        out.append(
            {
                "width": w or 256,
                "height": h or 256,
                "bpp": bpp,
                "size": size,
                "offset": offset,
            }
        )
    return out
