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


def decode_binary_meta(df: DataFrame, payload_col: str) -> DataFrame:
    """Byte-level metadata for a binary payload column, via mapInPandas.

    Output: input columns (minus payload) + n_bytes/head_byte/tail_byte/
    byte_sum_mod. Pure function of the bytes → deterministic and
    oracle-checkable; the pattern (schema contract, batch iterator, payload
    dropped from output to keep shuffles lean) is exactly what a real image
    resize / audio feature job uses.
    """
    passthrough = [c for c in df.columns if c != payload_col]
    out_schema = ", ".join(
        [f"{c} {df.schema[c].dataType.simpleString()}" for c in passthrough]
        + [META_SCHEMA_SUFFIX]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payload = pdf[payload_col]
            out = pdf[passthrough].copy()
            out["n_bytes"] = payload.map(lambda b: len(b) if b is not None else 0).astype("int64")
            out["head_byte"] = payload.map(lambda b: b[0] if b else None).astype("Int32")
            out["tail_byte"] = payload.map(lambda b: b[-1] if b else None).astype("Int32")
            out["byte_sum_mod"] = payload.map(
                lambda b: int(sum(b) % 256) if b else None
            ).astype("Int32")
            yield out

    return df.mapInPandas(batches, schema=out_schema)


def decode_image_stub(df: DataFrame, payload_col: str) -> DataFrame:
    """Image-decode plumbing with the decoder stubbed out.

    Schema contract, Arrow batching, per-row error capture, and payload
    pruning are all real; the pixel decode raises ``NotImplementedError``
    (captured into ``decode_error`` so one bad blob cannot fail a 100 TB
    job). Swap ``_decode_one`` for PIL/torchvision in a real deployment.
    """
    passthrough = [c for c in df.columns if c != payload_col]
    out_schema = ", ".join(
        [f"{c} {df.schema[c].dataType.simpleString()}" for c in passthrough]
        + [IMAGE_SCHEMA_SUFFIX]
    )

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
                except NotImplementedError as e:
                    rows.append((None, None, None, str(e)))
            meta = pd.DataFrame(
                rows, columns=["width", "height", "channels", "decode_error"]
            )
            out = pdf[passthrough].reset_index(drop=True)
            yield pd.concat([out, meta], axis=1)

    return df.mapInPandas(batches, schema=out_schema)
