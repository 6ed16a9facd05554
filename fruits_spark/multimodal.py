"""Multimodal binary columns: a deterministic frame container + decode.

Media payloads (image / audio / video) travel through the engine as
opaque ``binary`` columns with typed metadata.  This module defines two
containers through the same ``mapInPandas`` decode seam:

* **FRB1** — the deterministic synthetic frame container (video
  stand-in; PIL / torchvision / ffmpeg are not available in this
  environment, so the codec is synthetic while the plumbing — schema,
  partitioning, UDF signature, batch shape, header validation,
  per-frame feature reduction — is real and tested end-to-end).
* **RIFF/WAVE PCM16** — a REAL public audio format: the synthesizer
  emits canonical 44-byte-header WAV files readable by any standard
  WAV reader (pinned against the stdlib ``wave`` module), and
  :func:`decode_wav` parses the RIFF structure with pure numpy.
  A production build swaps/extends the chunk parser the same way it
  would swap :func:`_synth_payload` for a compressed codec.

FRB1 layout (all uint8):
    byte 0      magic 0x46 ('F')
    byte 1      n_frames
    byte 2      width
    byte 3      height
    bytes 4...  n_frames * width * height pixel bytes, frame-major

Synthetic pixel value (integer-exact, shared with the DuckDB oracle):
    pixel(doc, f, p) = ((doc_id + 1) * 31 + f * 7 + p * 3) % 251

Scale note: both kernels are ``mapInPandas`` over Arrow batches — no
shuffle, no per-row Python call overhead beyond the batch loop, and the
decode emits one fixed-width row per document, so the downstream ISS /
rollup stages see exactly the shape they see for token sequences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

FRB1_MAGIC = 0x46


def _synth_payload(doc_id: int, n_frames: int, width: int, height: int):
    import numpy as np

    p = np.arange(width * height, dtype=np.int64)
    frames = [
        ((doc_id + 1) * 31 + f * 7 + p * 3) % 251 for f in range(n_frames)
    ]
    return np.concatenate(frames).astype(np.uint8)


def synth_frame_blobs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic FRB1 blobs per document: n_frames = doc_id%7+2,
    width = doc_id%5+2, height = doc_id%3+2 (the datagen side of the
    multimodal path)."""
    import pandas as pd

    schema = f"{id_col} long, blob binary"

    def enc(batches):
        import numpy as np

        for pdf in batches:
            blobs = []
            for d in pdf[id_col].astype("int64"):
                d = int(d)
                nf, w, h = d % 7 + 2, d % 5 + 2, d % 3 + 2
                header = np.array([FRB1_MAGIC, nf, w, h], dtype=np.uint8)
                blobs.append(
                    np.concatenate([header, _synth_payload(d, nf, w, h)])
                    .tobytes()
                )
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype("int64"), "blob": blobs}
            )

    return docs.select(id_col).mapInPandas(enc, schema)


def _decode_frames_slow(pdf, id_col, np, pd):
    """Per-blob FRB1 decode — the degenerate-shape fallback (zero-area
    frames) of the batched path in :func:`decode_frames`."""
    rows = {
        id_col: pdf[id_col].astype("int64"),
        "n_frames": [], "width": [], "height": [],
        "n_bytes": [], "frame_sums": [],
    }
    for b in pdf["blob"]:
        arr = np.frombuffer(bytes(b), dtype=np.uint8)
        if len(arr) < 4 or arr[0] != FRB1_MAGIC:
            raise ValueError("not an FRB1 blob")
        nf, w, h = int(arr[1]), int(arr[2]), int(arr[3])
        if nf < 1 or len(arr) != 4 + nf * w * h:
            raise ValueError("FRB1 payload length mismatch")
        frames = arr[4:].astype(np.int64).reshape(nf, w * h)
        rows["n_frames"].append(nf)
        rows["width"].append(w)
        rows["height"].append(h)
        rows["n_bytes"].append(len(arr))
        rows["frame_sums"].append(frames.sum(axis=1).astype(np.int32))
    return pd.DataFrame(rows)


def decode_frames(blobs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Parse FRB1 blobs: header -> typed metadata, payload -> per-frame
    pixel sums (the 'feature extract' step of a media pipeline).  Emits
    one row per doc: (doc_id, n_frames, width, height, n_bytes,
    frame_sums array<int>) — frame_sums is a time series ready for the
    ISS kernels.  Raises on a bad magic byte (corrupt blob)."""
    import pandas as pd

    schema = (
        f"{id_col} long, n_frames int, width int, height int, "
        "n_bytes int, frame_sums array<int>"
    )

    def dec(batches):
        import numpy as np

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            # batched decode (round-3): ONE np.frombuffer over the
            # concatenated blobs + a single add.reduceat for every
            # frame sum in the batch, instead of a per-blob Python
            # loop — the per-row interpreter overhead dominated media
            # throughput for small frames
            bufs = [bytes(b) for b in pdf["blob"]]
            lens = np.fromiter(
                (len(b) for b in bufs), dtype=np.int64, count=n
            )
            if (lens < 4).any():
                raise ValueError("not an FRB1 blob")
            arr = np.frombuffer(b"".join(bufs), dtype=np.uint8)
            starts = np.concatenate(([0], np.cumsum(lens[:-1])))
            if (arr[starts] != FRB1_MAGIC).any():
                raise ValueError("not an FRB1 blob")
            nf = arr[starts + 1].astype(np.int64)
            w = arr[starts + 2].astype(np.int64)
            h = arr[starts + 3].astype(np.int64)
            if (nf < 1).any() or (lens != 4 + nf * w * h).any():
                raise ValueError("FRB1 payload length mismatch")
            total_frames = int(nf.sum())
            fsize = w * h
            if (fsize < 1).any():
                # zero-area frames make a frame start collide with the
                # next blob's header (reduceat would sum foreign bytes)
                # — take the simple per-blob path for this batch; the
                # sums of empty frames are zero, matching the pre-batch
                # decode
                yield _decode_frames_slow(pdf, id_col, np, pd)
                continue
            cum_nf = np.cumsum(nf)
            within = np.arange(total_frames) - np.repeat(cum_nf - nf, nf)
            fstarts = (
                np.repeat(starts + 4, nf) + within * np.repeat(fsize, nf)
            )
            # reduceat boundaries: per doc [header_start, frame starts...]
            # — the 4-byte header segment separates doc payloads and is
            # discarded afterwards
            bounds = np.empty(n + total_frames, dtype=np.int64)
            is_frame = np.ones(n + total_frames, dtype=bool)
            hpos = np.arange(n) + np.concatenate(([0], cum_nf[:-1]))
            is_frame[hpos] = False
            bounds[hpos] = starts
            bounds[is_frame] = fstarts
            sums = np.add.reduceat(arr.astype(np.int64), bounds)
            frame_sums = np.split(
                sums[is_frame].astype(np.int32), cum_nf[:-1]
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "n_frames": nf.astype(np.int32),
                    "width": w.astype(np.int32),
                    "height": h.astype(np.int32),
                    "n_bytes": lens.astype(np.int32),
                    "frame_sums": frame_sums,
                }
            )

    return blobs.mapInPandas(dec, schema)


def sample_frames(decoded: DataFrame, stride: int) -> DataFrame:
    """Frame-sampling (the video keyframe-every-k op): keep every
    ``stride``-th frame's features from a :func:`decode_frames` output.
    Pure JVM array projection — no second decode pass, no Python, no
    shuffle; at corpus scale this runs inside the same stage as the
    decode."""
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    sampled = F.expr(
        f"transform(sequence(0, n_frames - 1, {stride}), "
        "i -> frame_sums[i])"
    )
    return (
        decoded.withColumn("frame_sums", sampled)
        .withColumn("n_frames", F.size("frame_sums"))
    )


def resize_frames(
    blobs: DataFrame, out_w: int, out_h: int, id_col: str = "doc_id"
) -> DataFrame:
    """Nearest-neighbor resize of every FRB1 frame to ``out_w x out_h``
    (the media feature-extract downscale step), emitting the resized
    per-frame pixel sums: one row per doc
    ``(doc_id, n_frames, width=out_w, height=out_h, frame_sums)``.

    Batched like :func:`decode_frames`: the per-blob nearest-neighbor
    offset table is computed vectorized from the header dims
    (``src = floor(y2*h/out_h)*w + floor(x2*w/out_w)``), then ONE fancy
    gather + row-sum per Arrow batch covers every (frame, output-pixel)
    of every blob.  Integer-exact, so the DuckDB oracle replays it from
    the pixel formula."""
    import pandas as pd

    if out_w < 1 or out_h < 1:
        raise ValueError("resize dims must be >= 1")
    schema = (
        f"{id_col} long, n_frames int, width int, height int, "
        "frame_sums array<int>"
    )

    def dec(batches):
        import numpy as np

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            bufs = [bytes(b) for b in pdf["blob"]]
            lens = np.fromiter(
                (len(b) for b in bufs), dtype=np.int64, count=n
            )
            if (lens < 4).any():
                raise ValueError("not an FRB1 blob")
            arr = np.frombuffer(b"".join(bufs), dtype=np.uint8)
            starts = np.concatenate(([0], np.cumsum(lens[:-1])))
            if (arr[starts] != FRB1_MAGIC).any():
                raise ValueError("not an FRB1 blob")
            nf = arr[starts + 1].astype(np.int64)
            w = arr[starts + 2].astype(np.int64)
            h = arr[starts + 3].astype(np.int64)
            if (nf < 1).any() or (lens != 4 + nf * w * h).any():
                raise ValueError("FRB1 payload length mismatch")
            if (w < 1).any() or (h < 1).any():
                raise ValueError("cannot resize zero-area frames")
            # per-blob nearest-neighbor offsets (n, out_h*out_w)
            y2 = np.arange(out_h)
            x2 = np.arange(out_w)
            src_y = (y2[None, :] * h[:, None]) // out_h     # (n, out_h)
            src_x = (x2[None, :] * w[:, None]) // out_w     # (n, out_w)
            O = (
                src_y[:, :, None] * w[:, None, None]
                + src_x[:, None, :]
            ).reshape(n, out_h * out_w)
            total_frames = int(nf.sum())
            cum_nf = np.cumsum(nf)
            within = np.arange(total_frames) - np.repeat(cum_nf - nf, nf)
            fstarts = (
                np.repeat(starts + 4, nf) + within * np.repeat(w * h, nf)
            )
            idx = fstarts[:, None] + np.repeat(O, nf, axis=0)
            sums = arr[idx].astype(np.int64).sum(axis=1)
            frame_sums = np.split(sums.astype(np.int32), cum_nf[:-1])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "n_frames": nf.astype(np.int32),
                    "width": np.full(n, out_w, dtype=np.int32),
                    "height": np.full(n, out_h, dtype=np.int32),
                    "frame_sums": frame_sums,
                }
            )

    return blobs.mapInPandas(dec, schema)


# ---------------------------------------------------------------------------
# WAV — a real public uncompressed container through the same seam
# ---------------------------------------------------------------------------

WAV_SAMPLE_RATE = 8000

#: deterministic PCM16 sample formula shared with the DuckDB oracle:
#: sample(doc, i) = ((doc_id + 1) * 17 + i * 13) % 65536 - 32768


def wav_blob(pcm, sample_rate: int = WAV_SAMPLE_RATE) -> bytes:
    """Canonical 44-byte-header RIFF/WAVE PCM16-mono file for an int16
    sample array — THE production header writer (synth_wav_blobs and
    the fuzz suite both build through here)."""
    import struct

    import numpy as np

    data = np.asarray(pcm).astype("<i2").tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH",
            16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        )
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def synth_wav_blobs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Standard RIFF/WAVE PCM16-mono files per document (canonical
    44-byte header + little-endian int16 samples) — a REAL public
    format, byte-compatible with any WAV reader, proving the binary-
    column seam beyond the synthetic FRB1 container.  n_samples =
    doc_id % 50 + 20; samples follow the integer formula above."""
    import pandas as pd

    schema = f"{id_col} long, blob binary"

    def enc(batches):
        import numpy as np

        for pdf in batches:
            blobs = []
            for d in pdf[id_col].astype("int64"):
                d = int(d)
                ns = d % 50 + 20
                i = np.arange(ns, dtype=np.int64)
                pcm = ((d + 1) * 17 + i * 13) % 65536 - 32768
                blobs.append(wav_blob(pcm))
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype("int64"), "blob": blobs}
            )

    return docs.select(id_col).mapInPandas(enc, schema)


def _hdr_matrix(arr, starts, width):
    """(n, width) byte matrix of each blob's leading ``width`` bytes —
    ONE fancy gather; all header-field validation then runs as
    vectorized column arithmetic instead of per-blob struct.unpack."""
    import numpy as np

    return arr[starts[:, None] + np.arange(width)]


def _le(H, o, nbytes):
    """Little-endian unsigned int from header columns [o, o+nbytes)."""
    import numpy as np

    v = np.zeros(len(H), dtype=np.int64)
    for k in range(nbytes):
        v |= H[:, o + k].astype(np.int64) << (8 * k)
    return v


def _tag_ok(H, o, tag: bytes):
    import numpy as np

    want = np.frombuffer(tag, dtype=np.uint8)
    return bool((H[:, o:o + len(tag)] == want).all())


def decode_wav(blobs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Parse RIFF/WAVE PCM16 blobs: validate the RIFF/WAVE/fmt/data
    structure, extract typed metadata (sample_rate, bits) and the int16
    sample series — the audio analogue of :func:`decode_frames`, ready
    for the ISS kernels.  Rejects non-PCM16-mono or malformed
    containers.

    Batched like FRB1 (round 4): one ``np.frombuffer`` over the
    concatenated blobs, one (n, 44) header-byte gather with vectorized
    field checks, and ONE int16 reinterpretation of the whole buffer —
    per-blob sample series are zero-copy views into it (every accepted
    blob is even-length: 44-byte header + 2-byte samples, so all starts
    are 2-aligned)."""
    import pandas as pd

    schema = (
        f"{id_col} long, n_samples int, sample_rate int, bits int, "
        "n_bytes int, samples array<int>"
    )

    def dec(batches):
        import numpy as np

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            bufs = [bytes(b) for b in pdf["blob"]]
            lens = np.fromiter(
                (len(b) for b in bufs), dtype=np.int64, count=n
            )
            if (lens < 44).any():
                raise ValueError("not a RIFF/WAVE blob")
            arr = np.frombuffer(b"".join(bufs), dtype=np.uint8)
            starts = np.concatenate(([0], np.cumsum(lens[:-1])))
            H = _hdr_matrix(arr, starts, 44)
            if not (_tag_ok(H, 0, b"RIFF") and _tag_ok(H, 8, b"WAVE")):
                raise ValueError("not a RIFF/WAVE blob")
            if not _tag_ok(H, 12, b"fmt "):
                raise ValueError("missing fmt chunk")
            fmt_len = _le(H, 16, 4)
            audio_fmt = _le(H, 20, 2)
            n_ch = _le(H, 22, 2)
            sr = _le(H, 24, 4)
            bits = _le(H, 34, 2)
            if (
                (fmt_len != 16).any() or (audio_fmt != 1).any()
                or (n_ch != 1).any() or (bits != 16).any()
            ):
                raise ValueError("only PCM16 mono supported")
            if not _tag_ok(H, 36, b"data"):
                raise ValueError("missing data chunk")
            data_len = _le(H, 40, 4)
            if (lens != 44 + data_len).any() or (data_len % 2).any():
                raise ValueError("WAV data length mismatch")
            # all blobs even-length -> all starts 2-aligned: reinterpret
            # the whole concat buffer once; header int16s are skipped by
            # the per-blob sample ranges
            pcm32 = np.frombuffer(arr, dtype="<i2").astype(np.int32)
            s_start = (starts + 44) >> 1
            s_end = (starts + lens) >> 1
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "n_samples": (data_len // 2).astype(np.int32),
                    "sample_rate": sr.astype(np.int32),
                    "bits": bits.astype(np.int32),
                    "n_bytes": lens.astype(np.int32),
                    "samples": [
                        pcm32[a:b] for a, b in zip(s_start, s_end)
                    ],
                }
            )

    return blobs.mapInPandas(dec, schema)


# ---------------------------------------------------------------------------
# BMP (Windows bitmap, 24-bit BI_RGB) — second REAL public format
# ---------------------------------------------------------------------------

#: deterministic pixel formula shared by synth + tests:
#: channel value(doc, y, x, c) = ((doc_id + 1) * 29 + y * 11 + x * 5 + c) % 256
#: with (y, x) in TOP-DOWN order (the BMP file stores rows bottom-up).


def bmp_blob(pixels) -> bytes:
    """Canonical BITMAPFILEHEADER + BITMAPINFOHEADER 24-bit BI_RGB file
    for a top-down ``(h, w, 3)`` uint8 RGB array — rows written
    bottom-up with 4-byte padding, channels as BGR, exactly as any
    standard viewer expects."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row_size = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = rows.tobytes()
    return (
        b"BM"
        + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                      2835, 2835, 0, 0)
        + data
    )


def synth_bmp_blobs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Standard 24-bit BMP files per document (width = doc_id % 5 + 2,
    height = doc_id % 4 + 2 — widths include every row-padding case
    since 3*w mod 4 cycles).  Pixels follow the integer formula above."""
    import pandas as pd

    schema = f"{id_col} long, blob binary"

    def enc(batches):
        import numpy as np

        for pdf in batches:
            blobs = []
            for d in pdf[id_col].astype("int64"):
                d = int(d)
                w, h = d % 5 + 2, d % 4 + 2
                y, x, c = np.ogrid[0:h, 0:w, 0:3]
                px = ((d + 1) * 29 + y * 11 + x * 5 + c) % 256
                blobs.append(bmp_blob(px.astype(np.uint8)))
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype("int64"), "blob": blobs}
            )

    return docs.select(id_col).mapInPandas(enc, schema)


def decode_bmp(blobs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Parse 24-bit BI_RGB BMP blobs: validate both headers, strip the
    per-row padding, undo the bottom-up row order and BGR channel
    order, and emit typed metadata plus the per-row luminance-sum
    series (top-down) ready for the ISS kernels.  Rejects compressed,
    non-24-bit or size-inconsistent containers."""
    import pandas as pd

    schema = (
        f"{id_col} long, width int, height int, n_bytes int, "
        "pixel_sum long, row_sums array<long>"
    )

    def dec(batches):
        import numpy as np

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            # batched like FRB1 (round 4): one frombuffer over the
            # concatenated blobs, one (n, 54) header gather with
            # vectorized field checks, then per-row luminance sums for
            # the WHOLE batch via a single add.reduceat — padding bytes
            # are zeroed in place first so each reduceat segment can
            # span its row incl. pad, and each blob's header bytes form
            # a discard segment (same marking trick as decode_frames)
            bufs = [bytes(b) for b in pdf["blob"]]
            lens = np.fromiter(
                (len(b) for b in bufs), dtype=np.int64, count=n
            )
            if (lens < 54).any():
                raise ValueError("not a BMP blob")
            arr = np.frombuffer(b"".join(bufs), dtype=np.uint8)
            starts = np.concatenate(([0], np.cumsum(lens[:-1])))
            H = _hdr_matrix(arr, starts, 54)
            if not _tag_ok(H, 0, b"BM"):
                raise ValueError("not a BMP blob")
            size = _le(H, 2, 4)
            off = _le(H, 10, 4)
            bi = _le(H, 14, 4)
            w = _le(H, 18, 4)
            h = _le(H, 22, 4)
            planes = _le(H, 26, 2)
            bpp = _le(H, 28, 2)
            comp = _le(H, 30, 4)
            # width/height are signed i32 in the spec
            w = np.where(w >= 2**31, w - 2**32, w)
            h = np.where(h >= 2**31, h - 2**32, h)
            if (
                (bi != 40).any() or (planes != 1).any()
                or (bpp != 24).any() or (comp != 0).any()
            ):
                raise ValueError("only uncompressed 24-bit supported")
            if (h <= 0).any() or (w <= 0).any():
                raise ValueError("top-down or empty BMP unsupported")
            row_size = (w * 3 + 3) & ~np.int64(3)
            if (size != lens).any() or (off + h * row_size != lens).any():
                raise ValueError("BMP size mismatch")
            total_rows = int(h.sum())
            cum_h = np.cumsum(h)
            within = np.arange(total_rows) - np.repeat(cum_h - h, h)
            row_starts = (
                np.repeat(starts + off, h) + within * np.repeat(row_size, h)
            )
            a64 = arr.astype(np.int64)
            # zero the 0-3 padding bytes at each row's tail so the row
            # segment (which spans through the pad) sums pixels only
            w_row = np.repeat(w, h)
            pad_row = np.repeat(row_size - 3 * w, h)
            for k in range(3):
                sel = pad_row > k
                if sel.any():
                    a64[row_starts[sel] + 3 * w_row[sel] + k] = 0
            bounds = np.empty(n + total_rows, dtype=np.int64)
            is_row = np.ones(n + total_rows, dtype=bool)
            hpos = np.arange(n) + np.concatenate(([0], cum_h[:-1]))
            is_row[hpos] = False
            bounds[hpos] = starts
            bounds[is_row] = row_starts
            sums = np.add.reduceat(a64, bounds)
            flat = sums[is_row]  # per-row sums in FILE (bottom-up) order
            pixel_sum = np.add.reduceat(
                flat, np.concatenate(([0], cum_h[:-1]))
            )
            splits = np.split(flat, cum_h[:-1])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "width": w.astype(np.int32),
                    "height": h.astype(np.int32),
                    "n_bytes": lens.astype(np.int32),
                    "pixel_sum": pixel_sum,
                    "row_sums": [s[::-1] for s in splits],  # top-down
                }
            )

    return blobs.mapInPandas(dec, schema)
