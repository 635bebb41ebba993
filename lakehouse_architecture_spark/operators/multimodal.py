"""Multimodal (binary) column operators — Arrow-batched Spark plumbing.

Design: media (image/audio/video) ride as opaque ``binary`` payload columns
with typed metadata alongside, processed by ``mapInPandas`` so each task
streams Arrow record batches through a vectorized Python function — the
idiomatic Spark shape for non-relational per-blob work (batch-at-a-time, no
per-row serde, partition-parallel at any scale).

The actual codecs (PIL/ffmpeg/torchaudio) are NOT available in this
environment, so the decode step is stubbed two ways:

* :func:`decode_binary_meta` — a real, deterministic byte-level "decode"
  (length / head / tail / checksum) proving the full plumbing end-to-end;
  it is oracle-checkable (queries/textops.py q_multimodal_meta).
* :func:`decode_image_stub` — the shape of a real image decoder (schema,
  batching, error channel) that raises ``NotImplementedError`` at the
  decode call site, clearly marked for swapping in a codec.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

META_SCHEMA_SUFFIX = (
    "n_bytes bigint, head_byte int, tail_byte int, byte_sum_mod int"
)

IMAGE_SCHEMA_SUFFIX = "width int, height int, channels int, decode_error string"


def _schema_with(df: DataFrame, payload_col: str, suffix: str) -> tuple[list[str], str]:
    """(passthrough columns, output DDL): every operator here drops the
    payload and appends its own columns — one implementation so a fix
    (quoting, null semantics) lands everywhere at once."""
    passthrough = [c for c in df.columns if c != payload_col]
    ddl = ", ".join(
        [f"{c} {df.schema[c].dataType.simpleString()}" for c in passthrough]
        + [suffix]
    )
    return passthrough, ddl


def decode_binary_meta(df: DataFrame, payload_col: str) -> DataFrame:
    """Byte-level metadata for a binary payload column, via mapInPandas.

    Output: input columns (minus payload) + n_bytes/head_byte/tail_byte/
    byte_sum_mod. Pure function of the bytes → deterministic and
    oracle-checkable; the pattern (schema contract, batch iterator, payload
    dropped from output to keep shuffles lean) is exactly what a real image
    resize / audio feature job uses.
    """
    passthrough, out_schema = _schema_with(df, payload_col, META_SCHEMA_SUFFIX)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payload = pdf[payload_col]
            out = pdf[passthrough].copy()
            # NULL payload -> NULL (octet_length semantics); empty -> 0
            out["n_bytes"] = payload.map(
                lambda b: len(b) if b is not None else None
            ).astype("Int64")
            out["head_byte"] = payload.map(lambda b: b[0] if b else None).astype("Int32")
            out["tail_byte"] = payload.map(lambda b: b[-1] if b else None).astype("Int32")
            out["byte_sum_mod"] = payload.map(
                lambda b: int(sum(b) % 256) if b else None
            ).astype("Int32")
            yield out

    return df.mapInPandas(batches, schema=out_schema)


def sample_frames(
    df: DataFrame,
    payload_col: str,
    frame_bytes: int = 64,
    every_k: int = 2,
) -> DataFrame:
    """Video-style frame sampling: one output row per sampled frame.

    Treats the payload as a sequence of fixed-size ``frame_bytes`` frames
    and keeps every ``every_k``-th one — the row-EXPANDING mapInPandas
    shape (1 blob → N frames) a real video pipeline uses, with the frame
    payload replaced by deterministic byte stats so the op is
    oracle-checkable. Output: passthrough + frame_index/frame_offset/
    frame_len/frame_head. Partition-parallel; the payload never crosses a
    shuffle (stats are computed in the same task that read the blob).
    """
    passthrough, out_schema = _schema_with(
        df, payload_col,
        "frame_index int, frame_offset bigint, frame_len int, frame_head int",
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rec in pdf.to_dict("records"):
                blob = rec[payload_col] or b""
                base = {c: rec[c] for c in passthrough}
                n_frames = (len(blob) + frame_bytes - 1) // frame_bytes
                for fi in range(0, n_frames, every_k):
                    off = fi * frame_bytes
                    chunk = blob[off : off + frame_bytes]
                    rows.append(
                        {
                            **base,
                            "frame_index": fi,
                            "frame_offset": off,
                            "frame_len": len(chunk),
                            "frame_head": chunk[0],
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=passthrough
                + ["frame_index", "frame_offset", "frame_len", "frame_head"],
            )

    return df.mapInPandas(batches, schema=out_schema)


def resize_image_fake(
    df: DataFrame, payload_col: str, target_w: int = 32, target_h: int = 32
) -> DataFrame:
    """Image-resize plumbing with a deterministic fake decoder.

    The "decode" derives source dimensions from the bytes (head/tail mod
    64 + 1) instead of parsing a real codec — clearly marked; swap
    ``_fake_decode`` for PIL in deployment. Everything around it is the
    real resize job shape: schema contract, Arrow batches, per-row scale
    factors, payload pruned from the output.
    """
    passthrough, out_schema = _schema_with(
        df, payload_col,
        "src_w int, src_h int, out_w int, out_h int, scale_x double, scale_y double",
    )

    def _fake_decode(blob: bytes) -> tuple[int, int]:
        # FAKE decoder (no codec in this environment): dims from byte stats.
        return 1 + blob[0] % 64, 1 + blob[-1] % 64

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for blob in pdf[payload_col]:
                if not blob:
                    rows.append((None, None, None, None, None, None))
                    continue
                w, h = _fake_decode(blob)
                rows.append(
                    (w, h, target_w, target_h,
                     round(target_w / w, 6), round(target_h / h, 6))
                )
            meta = pd.DataFrame(
                rows, columns=["src_w", "src_h", "out_w", "out_h", "scale_x", "scale_y"]
            )
            out = pdf[passthrough].reset_index(drop=True)
            yield pd.concat([out, meta], axis=1)

    return df.mapInPandas(batches, schema=out_schema)


def audio_features_fake(
    df: DataFrame, payload_col: str, n_windows: int = 8
) -> DataFrame:
    """Audio feature-extract plumbing: fixed-length per-window feature
    vector (``array<double>``) per blob.

    The feature is a deterministic fake — mean byte value per one of
    ``n_windows`` equal windows (a real job computes RMS energy / MFCCs
    over PCM samples; swap ``_window_energy``). The Spark-side contract is
    the real one: array column output, batch iterator, payload pruned.
    """
    passthrough, out_schema = _schema_with(df, payload_col, "features array<double>")

    def _window_energy(blob: bytes) -> list[float]:
        # FAKE feature (no audio codec here): mean byte value per window.
        if not blob:
            return [0.0] * n_windows
        w = max(1, len(blob) // n_windows)
        feats = []
        for i in range(n_windows):
            chunk = blob[i * w : (i + 1) * w] if i < n_windows - 1 else blob[i * w :]
            feats.append(round(sum(chunk) / len(chunk), 6) if chunk else 0.0)
        return feats

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf[passthrough].copy()
            out["features"] = pdf[payload_col].map(
                lambda b: _window_energy(b) if b is not None else None
            )
            yield out

    return df.mapInPandas(batches, schema=out_schema)


def decode_image_stub(df: DataFrame, payload_col: str) -> DataFrame:
    """Image-decode plumbing with the decoder stubbed out.

    Schema contract, Arrow batching, per-row error capture, and payload
    pruning are all real; the pixel decode raises ``NotImplementedError``
    (captured into ``decode_error`` so one bad blob cannot fail a 100 TB
    job). Swap ``_decode_one`` for PIL/torchvision in a real deployment.
    """
    passthrough, out_schema = _schema_with(df, payload_col, IMAGE_SCHEMA_SUFFIX)

    def _decode_one(blob: bytes) -> tuple[int, int, int]:
        # STUB: no image codec in this environment.
        raise NotImplementedError("image decode requires PIL/libjpeg — not installed")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for blob in pdf[payload_col]:
                try:
                    w, h, c = _decode_one(blob)
                    rows.append((w, h, c, None))
                except Exception as e:  # noqa: BLE001 — the per-row error
                    # channel is the contract: a real decoder raises
                    # UnidentifiedImageError/OSError on corrupt blobs, and
                    # one bad blob must not fail a 100 TB job
                    rows.append((None, None, None, str(e)))
            meta = pd.DataFrame(
                rows, columns=["width", "height", "channels", "decode_error"]
            )
            out = pdf[passthrough].reset_index(drop=True)
            yield pd.concat([out, meta], axis=1)

    return df.mapInPandas(batches, schema=out_schema)


def perceptual_hash_fake(df: DataFrame, payload_col: str) -> DataFrame:
    """dHash perceptual fingerprint with a deterministic fake decoder.

    Real dHash: downscale to an 8x9 grayscale grid, emit one bit per
    horizontal gradient (g[r][c] > g[r][c+1]); near-identical images flip
    few bits. The FAKE "downscale" here strides 72 evenly-spaced bytes
    from the payload (no codec in this environment — swap ``_fake_grid``
    for a PIL resize in deployment); everything else — the Arrow batch
    shape, the 60-bit fingerprint domain (matching the SimHash bit ops),
    and the downstream banded pairing — is the production path. Compose
    with ``operators/dedup.banded_hamming_pairs`` for sub-quadratic
    near-duplicate detection over the fingerprints.
    """
    passthrough, out_schema = _schema_with(df, payload_col, "phash long")

    def _fake_grid(blob: bytes) -> list[int]:
        # FAKE 8x9 grid: evenly strided byte samples stand in for pixels
        n = len(blob)
        return [blob[(i * n) // 72] for i in range(72)]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashes = []
            for blob in pdf[payload_col]:
                if not blob:
                    hashes.append(None)
                    continue
                g = _fake_grid(blob)
                h = 0
                for r in range(8):
                    for c in range(8):
                        bit = r * 8 + c
                        if bit >= 60:  # stay in the 60-bit bitops domain
                            break
                        if g[r * 9 + c] > g[r * 9 + c + 1]:
                            h |= 1 << bit
                hashes.append(h)
            out = pdf[passthrough].reset_index(drop=True)
            out["phash"] = pd.Series(hashes, dtype="Int64")
            yield out

    return df.mapInPandas(batches, schema=out_schema)
