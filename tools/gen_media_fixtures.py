#!/usr/bin/env python3
"""One-time generator for the committed binary media fixtures.

fixtures/media/      — opaque printable-ASCII payloads (an LCG over
    33..126), the real-bytes input of the llm_multimodal_binary gate:
    simultaneously a valid binaryFile payload for Spark and valid UTF-8
    for DuckDB's read_text.
fixtures/media_png/  — REAL PNG images (hand-rolled encoder: zlib +
    CRC chunks, no imaging library needed) plus manifest.csv recording
    each image's true width/height/format/solid RGB color. The
    llm_multimodal_meta / llm_multimodal_resize oracles join the
    decoded output against this manifest, so the gate checks genuine
    ImageIO decode results, not stub arithmetic. Solid-color pixels
    make resize output exactly predictable under ANY interpolation.

Deterministic: re-running reproduces identical files.
"""
import os
import struct
import zlib

BASE = os.path.join(os.path.dirname(__file__), "..", "fixtures")
OUT = os.path.join(BASE, "media")
OUT_PNG = os.path.join(BASE, "media_png")
N_FILES = 24
N_PNG = 12


def content(i: int) -> bytes:
    length = 64 + (i * i * 37) % 1800
    s = (i * 2654435761) % (1 << 32)
    out = bytearray()
    for _ in range(length):
        s = (s * 1103515245 + 12345) % (1 << 31)
        out.append(33 + (s % 94))  # printable ASCII, no whitespace
    return bytes(out)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def solid_png(w: int, h: int, rgb: tuple) -> bytes:
    """8-bit truecolor PNG, one solid color, filter 0 every scanline."""
    raw = b"".join(b"\x00" + bytes(rgb) * w for _ in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 9)) + _chunk(b"IEND", b""))


def png_spec(i: int):
    w = 16 + (i * 13) % 113
    h = 16 + (i * 29) % 97
    s = (i * 48271 + 11) % (1 << 31)
    rgb = (s % 256, (s // 256) % 256, (s // 65536) % 256)
    return w, h, rgb


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for i in range(N_FILES):
        path = os.path.join(OUT, f"media_{i:03d}.bin")
        with open(path, "wb") as f:
            f.write(content(i))
    print(f"wrote {N_FILES} fixtures to {os.path.abspath(OUT)}")

    os.makedirs(OUT_PNG, exist_ok=True)
    lines = ["media_id,width,height,format,r,g,b"]
    for i in range(N_PNG):
        w, h, rgb = png_spec(i)
        with open(os.path.join(OUT_PNG, f"img_{i:03d}.png"), "wb") as f:
            f.write(solid_png(w, h, rgb))
        lines.append(f"{i},{w},{h},png,{rgb[0]},{rgb[1]},{rgb[2]}")
    with open(os.path.join(OUT_PNG, "manifest.csv"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {N_PNG} PNGs + manifest to {os.path.abspath(OUT_PNG)}")


if __name__ == "__main__":
    main()
