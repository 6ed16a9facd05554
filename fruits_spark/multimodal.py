"""Multimodal binary columns: a deterministic frame container + decode.

Media payloads (image / audio / video) travel through the engine as
opaque ``binary`` columns with typed metadata.  This module defines the
deterministic FRB1 container used by the synthetic corpus and the
Arrow-batched decode path — the *plumbing* (schema, partitioning, UDF
signature, batch shape, header validation, per-frame feature reduction)
is real and tested end-to-end; only the media codec itself is synthetic
(PIL / torchvision / ffmpeg are not available in this environment — a
production build swaps :func:`_synth_payload` for a real decoder inside
the same ``mapInPandas`` kernel).

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

from pyspark.sql import DataFrame

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
                if len(arr) != 4 + nf * w * h:
                    raise ValueError("FRB1 payload length mismatch")
                frames = arr[4:].astype(np.int64).reshape(nf, w * h)
                rows["n_frames"].append(nf)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_bytes"].append(len(arr))
                rows["frame_sums"].append(
                    frames.sum(axis=1).astype(np.int32)
                )
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(dec, schema)
