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
fixtures/media_wav/  — REAL RIFF/WAVE PCM files (hand-rolled 44-byte
    header + 16-bit little-endian samples) plus manifest.csv with each
    clip's true sample_rate/channels/frame count AND integer-exact
    signal features (peak, sum of squares, zero crossings, 200 ms trim
    prefix stats). The llm_audio_meta / llm_audio_trim oracles join the
    javax.sound.sampled decode output against this manifest — genuine
    audio codec results, all integer arithmetic, no float tolerance.
    Samples are square-wave ±18000 plus LCG noise ±12000, so |v| ≥ 6000:
    no zero samples, sign (and thus zero-crossing count) is unambiguous.

fixtures/media_y4m/  — REAL YUV4MPEG2 (Y4M) video clips: the plain-text
    stream header (W/H/F/I/A/C params), per-frame FRAME markers (some
    with X params, exercising the parser), and raw planar YUV payloads
    across 4:2:0 / 4:2:2 / 4:4:4 / mono colorspaces. manifest.csv holds
    each clip's true geometry/rate/colorspace/frame count and blob
    checksum; manifest_frames.csv holds, for every 5th frame, the
    frame's byte length, integer-exact Y-plane sum, and md5 of the RAW
    FRAME BYTES. The llm_video_meta / llm_multimodal_frames oracles join
    the engine's Y4M decode output against these — genuine frame bytes
    out of a genuine (hand-rolled, uncompressed) video container, no
    stub arithmetic.

Deterministic: re-running reproduces identical files.
"""
import hashlib
import os
import struct
import zlib

BASE = os.path.join(os.path.dirname(__file__), "..", "fixtures")
OUT = os.path.join(BASE, "media")
OUT_PNG = os.path.join(BASE, "media_png")
N_FILES = 24
N_PNG = 12
OUT_WAV = os.path.join(BASE, "media_wav")
N_WAV = 12
TRIM_MS = 200


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


def wav_spec(i: int):
    rates = [8000, 11025, 16000, 22050]
    sample_rate = rates[i % 4]
    channels = 1 + (i % 2)
    n_frames = 400 + (i * i * 131) % 3600
    return sample_rate, channels, n_frames


def wav_samples(i: int, channels: int, n_frames: int):
    """Interleaved int16 samples: ±18000 square wave (period 100 samples)
    plus LCG noise in ±12000 — every sample's magnitude is ≥ 6000, so the
    sign sequence (zero-crossing count) is exact and unambiguous."""
    s = (i * 1234567891) % (1 << 31)
    out = []
    for k in range(n_frames * channels):
        s = (s * 1103515245 + 12345) % (1 << 31)
        noise = (s % 24001) - 12000
        square = 18000 if ((k // 50) % 2 == 0) else -18000
        out.append(square + noise)
    return out


def wav_bytes(sample_rate: int, channels: int, samples) -> bytes:
    """Canonical 44-byte RIFF/WAVE header + 16-bit LE PCM payload."""
    data = b"".join(struct.pack("<h", v) for v in samples)
    block_align = channels * 2
    byte_rate = sample_rate * block_align
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, sample_rate,
                                   byte_rate, block_align, 16)
           + b"data" + struct.pack("<I", len(data)))
    return hdr + data


def wav_features(samples, channels: int):
    """Integer-exact features the Scala decoder must reproduce from the
    bytes alone: peak |v|, Σv² (BIGINT-safe), per-channel sign-change
    count summed over channels."""
    peak = max(abs(v) for v in samples)
    sumsq = sum(v * v for v in samples)
    zc = 0
    for c in range(channels):
        chan = samples[c::channels]
        zc += sum(1 for a, b in zip(chan, chan[1:]) if (a < 0) != (b < 0))
    return peak, sumsq, zc


OUT_Y4M = os.path.join(BASE, "media_y4m")
N_Y4M = 10
FRAME_EVERY = 5


def y4m_spec(i: int):
    """(width, height, colorspace, (fps_num, fps_den), n_frames)."""
    return [
        (8, 8, "C420jpeg", (25, 1), 7),
        (16, 8, "C420", (30000, 1001), 12),
        (12, 6, "C420mpeg2", (24, 1), 9),
        (32, 16, "C444", (30, 1), 6),
        (8, 6, "Cmono", (15, 1), 21),
        (24, 12, "C420jpeg", (50, 1), 16),
        (6, 4, "C444", (10, 1), 27),
        (16, 16, "Cmono", (12, 1), 11),
        (20, 10, "C420", (60, 1), 8),
        (10, 8, "C422", (25, 2), 14),
    ][i % 10]


def y4m_plane_sizes(w: int, h: int, cs: str):
    if cs.startswith("C420"):
        return [w * h, (w // 2) * (h // 2), (w // 2) * (h // 2)]
    if cs.startswith("C422"):
        return [w * h, (w // 2) * h, (w // 2) * h]
    if cs.startswith("C444"):
        return [w * h, w * h, w * h]
    if cs.startswith("Cmono"):
        return [w * h]
    raise ValueError(cs)


def y4m_frame(i: int, fidx: int, n_bytes: int) -> bytes:
    s = (i * 987654321 + fidx * 2654435761 + 17) % (1 << 32)
    out = bytearray()
    for _ in range(n_bytes):
        s = (s * 1103515245 + 12345) % (1 << 31)
        out.append(s % 256)
    return bytes(out)


OUT_MP4 = os.path.join(BASE, "media_mp4")
N_MP4 = 10

OUT_PH = os.path.join(BASE, "media_phash")


def phash_specs():
    """(media_id, split_cell, v_left, v_right) — 72x64 gray PNGs, a
    vertical brightness step at an 8px cell boundary. Groups A-D share a
    split with brightness-SHIFTED members (dHash-identical: uniform
    shifts preserve every cell comparison); singletons use other splits
    (16 differing bits apart) plus one flat blank (8 bits from any
    split). All pairwise dHash distances are therefore exactly 0, 8 or
    16 — the near-dup gate at distance <= 3 selects exactly the
    groups."""
    specs = []
    mid = 0
    for g, split in enumerate([2, 4, 6, 8]):
        for delta in (0, 8, -8):
            specs.append((mid, split, 96 + delta, 160 + delta))
            mid += 1
    for split in (1, 5, 7):
        specs.append((mid, split, 64, 200)); mid += 1
    specs.append((mid, 0, 128, 128))  # flat blank: dhash 0
    return specs


def phash_png(split_cell: int, v_left: int, v_right: int) -> bytes:
    """72x64 truecolor PNG: gray v_left for x < split_cell*8, else
    v_right (r=g=b=v so integer luma == v exactly)."""
    w, h = 72, 64
    rows = []
    for _ in range(h):
        row = bytearray(b"\x00")
        for x in range(w):
            v = v_left if x < split_cell * 8 else v_right
            row += bytes((v, v, v))
        rows.append(bytes(row))
    raw = b"".join(rows)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 9)) + _chunk(b"IEND", b""))


def phash_dhash(split_cell: int, v_left: int, v_right: int) -> int:
    """The EXACT integer dHash the Scala decoder must reproduce: luma =
    (299r+587g+114b)//1000 per pixel, 8x8-average-pooled to a 9x8 grid,
    bit (r*8+c) set iff cell[r][c] < cell[r][c+1]; signed 64-bit."""
    cells = [[(v_left if c < split_cell else v_right) for c in range(9)]
             for _ in range(8)]
    d = 0
    for r in range(8):
        for c in range(8):
            if cells[r][c] < cells[r][c + 1]:
                d |= 1 << (r * 8 + c)
    return d - (1 << 64) if d >= (1 << 63) else d


def mp4_spec(i: int):
    """(major_brand, timescale, duration, mvhd_version, video_wh,
    has_audio, mdat_form) — mdat_form: 'plain' | 'large' (64-bit
    largesize) | 'tail' (size==0, extends to EOF)."""
    return [
        ("isom", 600, 3600, 0, (320, 240), False, "plain"),
        ("mp42", 1000, 12345, 0, (640, 360), True, "plain"),
        ("isom", 90000, 900900, 1, (1280, 720), True, "large"),
        ("M4V ", 600, 7200, 0, (176, 144), False, "tail"),
        ("mp42", 48000, 96000, 1, (1920, 1080), True, "plain"),
        ("isom", 1000, 1, 0, (32, 32), False, "plain"),
        ("avc1", 600, 61440, 0, (854, 480), True, "plain"),
        ("isom", 90000, 4503599, 1, (426, 240), False, "large"),
        ("mp42", 1000, 86400000, 1, (3840, 2160), True, "tail"),
        ("isom", 600, 599, 0, (120, 90), False, "plain"),
    ][i % 10]


def _box(typ: bytes, payload: bytes, form: str = "plain") -> bytes:
    if form == "large":
        return struct.pack(">I", 1) + typ + struct.pack(">Q", 16 + len(payload)) + payload
    if form == "tail":  # size 0 = to end of file; must be the last box
        return struct.pack(">I", 0) + typ + payload
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _fullbox(typ: bytes, version: int, payload: bytes) -> bytes:
    return _box(typ, struct.pack(">B", version) + b"\x00\x00\x00" + payload)


def _mvhd(version: int, timescale: int, duration: int) -> bytes:
    times = struct.pack(">QQIQ" if version else ">IIII",
                        7, 11, timescale, duration)
    rest = (struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
            + b"\x00" * 10
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + b"\x00" * 24 + struct.pack(">I", 99))
    return _fullbox(b"mvhd", version, times + rest)


def _tkhd(track_id: int, duration: int, w: int, h: int) -> bytes:
    payload = (struct.pack(">IIII", 7, 11, track_id, 0)
               + struct.pack(">I", duration) + b"\x00" * 8
               + struct.pack(">HHHH", 0, 0, 0x0100 if w == 0 else 0, 0)
               + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
               + struct.pack(">II", w << 16, h << 16))
    return _fullbox(b"tkhd", 0, payload)


def _hdlr(handler: bytes, name: bytes) -> bytes:
    return _fullbox(b"hdlr", 0,
                    struct.pack(">I", 0) + handler + b"\x00" * 12 + name + b"\x00")


def _trak(track_id: int, duration: int, w: int, h: int, handler: bytes) -> bytes:
    mdia = _box(b"mdia", _hdlr(handler, b"graft"))
    return _box(b"trak", _tkhd(track_id, duration, w, h) + mdia)


def mp4_bytes(i: int) -> bytes:
    brand, timescale, duration, ver, (w, h), has_audio, mdat_form = mp4_spec(i)
    ftyp = _box(b"ftyp", brand.encode("ascii") + struct.pack(">I", 512)
                + b"isom" + b"mp41")
    traks = _trak(1, duration, w, h, b"vide")
    if has_audio:
        traks += _trak(2, duration, 0, 0, b"soun")
    moov = _box(b"moov", _mvhd(ver, timescale, duration) + traks)
    # deterministic opaque payload; a 'free' box exercises skip logic
    s = (i * 76543217 + 5) % (1 << 31)
    payload = bytearray()
    for _ in range(64 + (i * i * 53) % 900):
        s = (s * 1103515245 + 12345) % (1 << 31)
        payload.append(s % 256)
    free = _box(b"free", b"\x00" * (4 + i % 9))
    mdat = _box(b"mdat", bytes(payload), mdat_form)
    return ftyp + free + moov + mdat


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

    os.makedirs(OUT_WAV, exist_ok=True)
    wlines = ["media_id,sample_rate,channels,bits,n_frames,peak_abs,sumsq,"
              "zero_cross,trim_frames,trim_sumsq"]
    for i in range(N_WAV):
        sample_rate, channels, n_frames = wav_spec(i)
        samples = wav_samples(i, channels, n_frames)
        with open(os.path.join(OUT_WAV, f"clip_{i:03d}.wav"), "wb") as f:
            f.write(wav_bytes(sample_rate, channels, samples))
        peak, sumsq, zc = wav_features(samples, channels)
        trim_frames = min(n_frames, sample_rate * TRIM_MS // 1000)
        trim_sumsq = sum(v * v for v in samples[:trim_frames * channels])
        wlines.append(f"{i},{sample_rate},{channels},16,{n_frames},{peak},"
                      f"{sumsq},{zc},{trim_frames},{trim_sumsq}")
    with open(os.path.join(OUT_WAV, "manifest.csv"), "w") as f:
        f.write("\n".join(wlines) + "\n")
    print(f"wrote {N_WAV} WAVs + manifest to {os.path.abspath(OUT_WAV)}")

    os.makedirs(OUT_Y4M, exist_ok=True)
    clines = ["media_id,width,height,fps_num,fps_den,colorspace,frame_count,"
              "byte_len,checksum"]
    flines = ["media_id,frame_idx,width,height,frame_len,y_sum,frame_checksum"]
    for i in range(N_Y4M):
        w, h, cs, (fn, fd), n_frames = y4m_spec(i)
        sizes = y4m_plane_sizes(w, h, cs)
        frame_len = sum(sizes)
        body = bytearray(f"YUV4MPEG2 W{w} H{h} F{fn}:{fd} Ip A1:1 {cs}\n"
                         .encode("ascii"))
        for fidx in range(n_frames):
            # every third frame header carries an X param — parsers must
            # take the frame length from the STREAM header, not assume
            # a fixed 6-byte FRAME marker
            marker = b"FRAME\n" if (i + fidx) % 3 else b"FRAME Xgraft\n"
            data = y4m_frame(i, fidx, frame_len)
            body += marker + data
            if fidx % FRAME_EVERY == 0:
                y_sum = sum(data[: sizes[0]])
                flines.append(f"{i},{fidx},{w},{h},{frame_len},{y_sum},"
                              f"{hashlib.md5(data).hexdigest()}")
        blob = bytes(body)
        with open(os.path.join(OUT_Y4M, f"clip_{i:03d}.y4m"), "wb") as f:
            f.write(blob)
        clines.append(f"{i},{w},{h},{fn},{fd},{cs},{n_frames},{len(blob)},"
                      f"{hashlib.md5(blob).hexdigest()}")
    with open(os.path.join(OUT_Y4M, "manifest.csv"), "w") as f:
        f.write("\n".join(clines) + "\n")
    with open(os.path.join(OUT_Y4M, "manifest_frames.csv"), "w") as f:
        f.write("\n".join(flines) + "\n")
    print(f"wrote {N_Y4M} Y4Ms + manifests to {os.path.abspath(OUT_Y4M)}")

    os.makedirs(OUT_MP4, exist_ok=True)
    mlines = ["media_id,byte_len,checksum,major_brand,timescale,duration,"
              "duration_ms,n_tracks,n_video,n_audio,width,height"]
    for i in range(N_MP4):
        brand, timescale, duration, _, (w, h), has_audio, _ = mp4_spec(i)
        blob = mp4_bytes(i)
        with open(os.path.join(OUT_MP4, f"vid_{i:03d}.mp4"), "wb") as f:
            f.write(blob)
        n_tracks = 2 if has_audio else 1
        duration_ms = duration * 1000 // timescale
        mlines.append(f"{i},{len(blob)},{hashlib.md5(blob).hexdigest()},"
                      f"{brand.strip()},{timescale},{duration},{duration_ms},"
                      f"{n_tracks},1,{1 if has_audio else 0},{w},{h}")
    with open(os.path.join(OUT_MP4, "manifest.csv"), "w") as f:
        f.write("\n".join(mlines) + "\n")
    print(f"wrote {N_MP4} MP4s + manifest to {os.path.abspath(OUT_MP4)}")

    os.makedirs(OUT_PH, exist_ok=True)
    plines = ["media_id,width,height,split_cell,v_left,v_right,dhash"]
    for mid, split, vl, vr in phash_specs():
        with open(os.path.join(OUT_PH, f"img_{mid:03d}.png"), "wb") as f:
            f.write(phash_png(split, vl, vr))
        plines.append(f"{mid},72,64,{split},{vl},{vr},{phash_dhash(split, vl, vr)}")
    with open(os.path.join(OUT_PH, "manifest.csv"), "w") as f:
        f.write("\n".join(plines) + "\n")
    print(f"wrote {len(phash_specs())} phash PNGs + manifest to {os.path.abspath(OUT_PH)}")


if __name__ == "__main__":
    main()
