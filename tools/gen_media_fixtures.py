#!/usr/bin/env python3
"""One-time generator for the committed binary media fixtures under
fixtures/media/ (the real-bytes input of the llm_multimodal_binary
gate). Deterministic: an LCG over printable ASCII (33..126), so the
bytes are simultaneously a valid binaryFile payload for Spark and valid
UTF-8 for DuckDB's read_text. Re-running reproduces identical files.
"""
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "media")
N_FILES = 24


def content(i: int) -> bytes:
    length = 64 + (i * i * 37) % 1800
    s = (i * 2654435761) % (1 << 32)
    out = bytearray()
    for _ in range(length):
        s = (s * 1103515245 + 12345) % (1 << 31)
        out.append(33 + (s % 94))  # printable ASCII, no whitespace
    return bytes(out)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for i in range(N_FILES):
        path = os.path.join(OUT, f"media_{i:03d}.bin")
        with open(path, "wb") as f:
            f.write(content(i))
    print(f"wrote {N_FILES} fixtures to {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
