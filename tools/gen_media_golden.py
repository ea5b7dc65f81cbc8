#!/usr/bin/env python3
"""Dev-time golden generator for the q22 media-metadata oracle.

Independent (non-JVM) decoders for the three codec-free container formats
the media corpus uses — BMP (BITMAPFILEHEADER/BITMAPINFOHEADER, 24-bpp
uncompressed), WAV (RIFF chunk walk, 16-bit PCM) and Y4M (YUV4MPEG2 ASCII
header + FRAME-delimited 4:2:0 planes) — implemented here from the public
byte-layout specs with the struct module, no shared code with
`multimodal/Media.scala`. The output parquet pins per-media metadata; the
q22 oracle aggregates it and must match Spark's distributed decode exactly.

Field semantics mirror Media.MediaMeta: image width/height px (nFrames=1,
payloadBytes=3*w*h), audio width=sampleRate height=nSamples (nFrames=0,
payloadBytes=data-chunk bytes), video width/height px + frame count
(payloadBytes=nFrames*w*h*3/2).

Usage (after `sbt "Test/runMain graft.GoldenMedia"` dumps the bytes):
  python3 tools/gen_media_golden.py [bytes_parquet] [out_parquet]
"""
import struct
import sys

import duckdb

BYTES = (sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_media_bytes.parquet")
OUT = (sys.argv[2] if len(sys.argv) > 2
       else "src/test/resources/golden/media_meta_sf001.parquet")


def decode_bmp(b: bytes):
    if len(b) < 54:
        return None
    data_offset, = struct.unpack_from("<I", b, 10)
    bi_size, w, h_raw = struct.unpack_from("<Iii", b, 14)
    bpp, = struct.unpack_from("<H", b, 28)
    compression, = struct.unpack_from("<I", b, 30)
    h = abs(h_raw)
    if bi_size < 40 or w <= 0 or h == 0 or bpp != 24 or compression != 0:
        return None
    row_size = (3 * w + 3) // 4 * 4
    if data_offset < 54 or data_offset > len(b) or len(b) - data_offset < row_size * h:
        return None
    return ("image", w, h, 1, 3 * w * h)


def decode_wav(b: bytes):
    if len(b) < 12 or b[8:12] != b"WAVE":
        return None
    off, rate, block_align, fmt_ok, data_len = 12, 0, 0, False, -1
    while off + 8 <= len(b) and (not fmt_ok or data_len < 0):
        cid = b[off:off + 4]
        size, = struct.unpack_from("<I", b, off + 4)
        if off + 8 + size > len(b):
            return None
        if cid == b"fmt " and size >= 16:
            audio_format, channels = struct.unpack_from("<HH", b, off + 8)
            rate, = struct.unpack_from("<I", b, off + 12)
            block_align, = struct.unpack_from("<H", b, off + 20)
            bits_per_sample, = struct.unpack_from("<H", b, off + 22)
            # features() assumes 16-bit mono — decode validity must match
            fmt_ok = (audio_format == 1 and channels == 1
                      and bits_per_sample == 16 and rate > 0 and block_align > 0)
            if not fmt_ok:
                return None
        elif cid == b"data":
            data_len = size
        off += 8 + size + (size & 1)  # RIFF word alignment
    if not fmt_ok or data_len < 0:
        return None
    return ("audio", rate, data_len // block_align, 0, data_len)


def decode_y4m(b: bytes):
    eol = b.find(b"\n")
    if eol < 0 or eol > 256:
        return None
    toks = b[:eol].decode("ascii", errors="replace").split(" ")
    w = h = 0
    for tok in toks[1:]:
        try:
            if tok.startswith("W"):
                w = int(tok[1:])
            elif tok.startswith("H"):
                h = int(tok[1:])
        except ValueError:
            return None
    if w <= 0 or h <= 0 or w % 2 or h % 2:
        return None
    frame_size = w * h * 3 // 2
    off, n_frames = eol + 1, 0
    while off < len(b):
        if b[off:off + 5] != b"FRAME":
            return None
        nl = b.find(b"\n", off + 5)
        if nl < 0 or len(b) - (nl + 1) < frame_size:
            return None
        n_frames += 1
        off = nl + 1 + frame_size
    if n_frames == 0:
        return None
    return ("video", w, h, n_frames, n_frames * frame_size)


def decode(b: bytes):
    if b is None or len(b) < 12:
        return None
    if b[:2] == b"BM":
        return decode_bmp(b)
    if b[:4] == b"RIFF":
        return decode_wav(b)
    if b[:9] == b"YUV4MPEG2":
        return decode_y4m(b)
    return None


def main():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT media_id, kind, content FROM read_parquet('{BYTES}') ORDER BY media_id"
    ).fetchall()
    assert len(rows) == 300, f"expected the 300-row sf0.01 corpus, got {len(rows)}"
    out = []
    for media_id, declared_kind, content in rows:
        meta = decode(bytes(content))
        assert meta is not None, f"media_id={media_id} failed independent decode"
        kind, width, height, n_frames, payload = meta
        assert kind == declared_kind, (
            f"media_id={media_id}: decoded {kind} != declared {declared_kind}")
        out.append((media_id, kind, width, height, n_frames, payload))

    con.execute("""
        CREATE TABLE golden (
            media_id BIGINT, kind VARCHAR, width INTEGER, height INTEGER,
            nFrames INTEGER, payloadBytes INTEGER)
    """)
    con.executemany("INSERT INTO golden VALUES (?, ?, ?, ?, ?, ?)", out)
    con.execute(f"COPY golden TO '{OUT}' (FORMAT PARQUET)")
    kinds = con.execute(
        "SELECT kind, count(*) FROM golden GROUP BY kind ORDER BY kind").fetchall()
    print(f"wrote {len(out)} golden media rows to {OUT}; kinds: {kinds}")


if __name__ == "__main__":
    main()
