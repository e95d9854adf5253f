"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference's only multimodal surface is `CommonsMedia(String)` asset
references (tables.rs / ClaimValueData) — a *pointer* to media, never the
bytes. A training-data pipeline needs the bytes: this module treats
image/audio/video as opaque ``binary`` columns with typed metadata and
implements decode / feature-extract / frame-sample as Arrow-batched
``mapInPandas`` operators.

The real codec libraries (Pillow, torchaudio, av) are NOT in this
container, so the decode step is pluggable: ``decoder="fake"`` is a
deterministic byte-statistics decoder (fully tested, oracle-checkable);
``decoder="png"`` / ``decoder="jpeg"`` are REAL decodes via the in-repo
from-spec codecs (``functions/png.py``, ``functions/jpeg.py``);
``decoder="pil"`` raises ``NotImplementedError`` unless the lib
imports. The Spark-side plumbing — schema, batch iteration, fan-out row
counts, partitioning — is identical for both, which is the part that has
to be right at 100 TB:

- mapInPandas streams Arrow record batches: the full binary column never
  materializes on the driver, and per-batch memory is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``;
- payload bytes stay in the executor process; only extracted features
  (tiny) cross the shuffle boundary afterwards;
- frame sampling fans out 1 -> n_frames rows inside the iterator without
  ever holding more than one input batch of payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_hash", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("byte_sum", T.LongType(), True),
        T.StructField("byte_min", T.IntegerType(), True),
        T.StructField("byte_max", T.IntegerType(), True),
        T.StructField("content_hash", T.StringType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame_hash", T.StringType(), True),
        T.StructField("frame_bytes", T.LongType(), True),
    ]
)

# decoder="png" emits real image features (decoded-pixel statistics),
# so it has its own schema: pixel stats, not payload-byte stats.
IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("bit_depth", T.IntegerType(), True),
        T.StructField("pixel_bytes", T.LongType(), True),
        T.StructField("pixel_sum", T.LongType(), True),
        T.StructField("pixel_min", T.IntegerType(), True),
        T.StructField("pixel_max", T.IntegerType(), True),
        T.StructField("pixel_hash", T.StringType(), True),
    ]
)

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_hash", T.StringType(), True),
    ]
)


_EXT_MIME = {
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "png": "image/png",
    "gif": "image/gif",
    "svg": "image/svg+xml",
    "tif": "image/tiff",
    "tiff": "image/tiff",
    "webp": "image/webp",
    "ogg": "audio/ogg",
    "oga": "audio/ogg",
    "opus": "audio/opus",
    "mp3": "audio/mpeg",
    "flac": "audio/flac",
    "wav": "audio/wav",
    "ogv": "video/ogg",
    "webm": "video/webm",
    "mp4": "video/mp4",
    "pdf": "application/pdf",
    "djvu": "image/vnd.djvu",
    "stl": "model/stl",
}


def commons_assets(claims: DataFrame) -> DataFrame:
    """Bridge the reference's media surface to the asset table: every
    CommonsMedia claim value (`ClaimValueData::CommonsMedia(String)`,
    reference tables.rs:18-21 / README.md:110-118 — a bare Commons file
    name) becomes an asset-reference row with the owning entity, the
    claim property, a typed mime guess from the extension, and the
    canonical Commons URL (the Special:FilePath redirect). Download +
    `decode_features` completes the multimodal pipeline; here the payload
    stays a pointer, exactly as in the reference.
    """
    exploded = claims.select(
        F.col("id").alias("claims_id"),
        F.explode("claims").alias("c"),
    ).where(F.col("c.value.kind") == "CommonsMedia")
    fname = F.col("c.value.commons_media")
    ext = F.lower(F.regexp_extract(fname, r"\.([A-Za-z0-9]+)$", 1))
    mime_map = F.create_map(
        *[F.lit(x) for kv in _EXT_MIME.items() for x in kv]
    )
    return exploded.select(
        "claims_id",
        F.col("c.id").alias("property_id"),
        fname.alias("file_name"),
        F.coalesce(
            F.element_at(mime_map, ext), F.lit("application/octet-stream")
        ).alias("mime"),
        F.concat(
            F.lit("https://commons.wikimedia.org/wiki/Special:FilePath/"),
            F.regexp_replace(fname, " ", "_"),
        ).alias("url"),
    )


def documents_as_assets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Stand-in asset table: encode each document's text as its binary
    payload (the container has no real media files). All JVM-side — the
    binary column is born on the executors, never on the driver."""
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.lit("application/octet-stream").alias("mime"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(F.col(text_col)).alias("content_hash"),
    )


def documents_as_png_assets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", width: int = 32
) -> DataFrame:
    """Asset table whose payloads are REAL PNGs: each document's UTF-8
    bytes become the gray pixels of a ``width``-wide image (zero-padded
    to fill the last row), encoded with the in-repo from-spec codec.
    Deterministic — same text, same bytes — so downstream decode rows
    are stable across runs/engines. Arrow-batched mapInPandas; payloads
    are born on the executors."""

    load_png = _make_png_loader(_PKG_ROOT)

    def run(batches: Iterator) -> Iterator:
        import hashlib as _hl

        import pandas as pd

        encode_png = load_png().encode_png

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                raw = (text or "").encode("utf-8")
                height = max(1, (len(raw) + width - 1) // width)
                px = raw.ljust(width * height, b"\x00")
                buf = encode_png(px, width, height, 1)
                rows.append(
                    {
                        "asset_id": int(doc_id),
                        "mime": "image/png",
                        "payload": buf,
                        "n_bytes": len(buf),
                        "content_hash": _hl.md5(buf).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in ASSET_SCHEMA.fields]
            )

    from wikidata_to_surrealdb_spark.functions import respread

    return respread(docs.select(id_col, text_col)).mapInPandas(
        run, schema=ASSET_SCHEMA
    )


def documents_as_jpeg_assets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 32,
    quality: int = 90,
    progressive: bool = False,
) -> DataFrame:
    """JPEG twin of :func:`documents_as_png_assets`: each document's
    UTF-8 bytes become the gray pixels of a ``width``-wide image
    (zero-padded to fill the last row), encoded with the in-repo
    from-spec baseline JPEG codec. Deterministic — same text, same
    bytes — and the header dimensions are an exact function of the text
    length, which is what the metadata oracle checks.

    JPEG stores dimensions as u16, so a document longer than
    ``width * 65535`` UTF-8 bytes cannot be represented at this width;
    such payloads are deterministically TRUNCATED to the representable
    prefix (rather than NULL-flagged or task-killed) so every document
    still yields exactly one asset row.

    ``progressive=True`` encodes SOF2 progressive streams (spectral
    selection + successive approximation) — the encoding real Commons
    thumbnails predominantly use — so the decode operators downstream
    exercise the multi-scan path on corpus-shaped data."""

    load_jpeg = _make_jpeg_loader(_PKG_ROOT)

    def run(batches: Iterator) -> Iterator:
        import hashlib as _hl

        import pandas as pd

        _jpeg = load_jpeg()
        encode_jpeg = (
            _jpeg.encode_jpeg_progressive if progressive else _jpeg.encode_jpeg
        )

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                raw = (text or "").encode("utf-8")[: width * 65535]
                height = max(1, (len(raw) + width - 1) // width)
                px = raw.ljust(width * height, b"\x00")
                buf = encode_jpeg(px, width, height, 1, quality)
                rows.append(
                    {
                        "asset_id": int(doc_id),
                        "mime": "image/jpeg",
                        "payload": buf,
                        "n_bytes": len(buf),
                        "content_hash": _hl.md5(buf).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in ASSET_SCHEMA.fields]
            )

    from wikidata_to_surrealdb_spark.functions import respread

    return respread(docs.select(id_col, text_col)).mapInPandas(
        run, schema=ASSET_SCHEMA
    )


def jpeg_meta(assets: DataFrame) -> DataFrame:
    """Header-only JPEG metadata per asset (dimensions, component count,
    precision, progressive flag) — a marker-segment parse with NO entropy
    decode, so it is cheap (bytes scanned ~ header size) and EXACT:
    unlike decoded pixels, these fields are deterministic for any
    conforming encoder, which makes this the oracle-checkable JPEG row.
    Corrupt/non-JPEG payloads yield NULL metadata instead of failing the
    task."""

    load_jpeg = _make_jpeg_loader(_PKG_ROOT)

    def run(batches: Iterator) -> Iterator:
        import struct as _struct

        import pandas as pd

        jpeg = load_jpeg()
        JpegError, jpeg_dimensions = jpeg.JpegError, jpeg.jpeg_dimensions

        for pdf in batches:
            rows = []
            for asset_id, buf in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    d = jpeg_dimensions(bytes(buf) if buf is not None else b"")
                    rows.append(
                        {
                            "asset_id": asset_id,
                            "width": d["width"],
                            "height": d["height"],
                            "components": d["components"],
                            "precision": d["precision"],
                            "progressive": d["progressive"],
                        }
                    )
                except (JpegError, ValueError, IndexError, _struct.error):
                    # belt-and-braces: the codec contract is JpegError-only,
                    # but a corrupt asset must NULL-flag, never kill the task
                    rows.append({"asset_id": asset_id})
            yield pd.DataFrame(
                rows, columns=[f.name for f in JPEG_META_SCHEMA.fields]
            )

    from wikidata_to_surrealdb_spark.functions import respread

    return respread(assets).mapInPandas(run, schema=JPEG_META_SCHEMA)


def _fake_decode(buf: bytes) -> dict:
    """Deterministic byte-statistics 'decode' — the test/oracle path."""
    return {
        "n_bytes": len(buf),
        "byte_sum": sum(buf),
        "byte_min": min(buf) if buf else None,
        "byte_max": max(buf) if buf else None,
        "content_hash": hashlib.md5(buf).hexdigest(),
    }


def _make_pil_row():
    """Factory for the native-codec (Pillow) decode closure — an
    IMAGE_FEATURE_SCHEMA row per payload. Defined inside a factory so
    cloudpickle ships it BY VALUE: a module-level function would pickle
    by reference and require this package on the executor import path
    (it isn't, when the driver runs from another directory — the same
    rule as :func:`_make_png_loader`).

    The closure raises ImportError when Pillow is absent (callers
    choose whether that gates — decoder='pil' — or falls back to the
    from-spec codec — 'png_auto'/'jpeg_auto'). Only 8-bit L/LA/RGB/RGBA
    rasters are emitted: for those, ``Image.tobytes()`` is the same
    unfiltered scanline byte string the from-spec PNG decoder produces,
    so pixel_hash is BIT-IDENTICAL across the two paths (PNG is
    lossless). Anything else (16-bit, palette, exotic modes) raises
    ValueError so the per-asset fallback handles it — correctness never
    depends on Pillow's mode conversions. JPEG pixel values are
    codec-specific by spec (T.81 permits IDCT variation): the goldens
    pin the from-spec path, and geometry fields agree on any codec."""

    def pil_row(buf: bytes) -> dict:
        import hashlib as _hl
        import io as _io

        from PIL import Image  # raises ImportError when absent

        modes = {"L": 1, "LA": 2, "RGB": 3, "RGBA": 4}
        with Image.open(_io.BytesIO(buf)) as im:
            im.load()
            if im.mode not in modes:
                raise ValueError(f"mode {im.mode!r} not bit-stable via Pillow")
            px = im.tobytes()
            return {
                "asset_id": None,  # caller fills
                "width": im.width,
                "height": im.height,
                "channels": modes[im.mode],
                "bit_depth": 8,
                "pixel_bytes": len(px),
                "pixel_sum": sum(px),
                "pixel_min": min(px) if px else None,
                "pixel_max": max(px) if px else None,
                "pixel_hash": _hl.md5(px).hexdigest(),
            }

    return pil_row


_DECODERS = {
    "fake": _fake_decode,
    "png": None,
    "jpeg": None,
    "png_auto": None,
    "jpeg_auto": None,
    "pil": None,
}

# header-only JPEG metadata (no entropy decode): exact and cheap, so it
# is oracle-checkable even though decoded JPEG pixels are not
JPEG_META_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("components", T.IntegerType(), True),
        T.StructField("precision", T.IntegerType(), True),
        T.StructField("progressive", T.BooleanType(), True),
    ]
)

# Repo root containing the package, captured on the DRIVER. Executor
# python workers don't inherit driver sys.path edits; on a real cluster
# the package arrives via --py-files, and in local / shared-fs mode this
# path makes the in-worker import work no matter the driver's cwd.
_PKG_ROOT = __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.dirname(__file__))
)


def _make_png_loader(pkg_root: str):
    """Build the in-worker png-module loader ONCE: the returned closure is
    defined inside a function, so cloudpickle ships it BY VALUE (a
    module-level helper would pickle by reference and re-create the very
    import problem it solves)."""

    def load():
        try:
            from wikidata_to_surrealdb_spark.functions import png as _png
        except ModuleNotFoundError:
            import sys as _sys

            _sys.path.insert(0, pkg_root)
            from wikidata_to_surrealdb_spark.functions import png as _png
        return _png

    return load


def _make_jpeg_loader(pkg_root: str):
    """JPEG twin of :func:`_make_png_loader` (same ship-by-value rule)."""

    def load():
        try:
            from wikidata_to_surrealdb_spark.functions import jpeg as _jpeg
        except ModuleNotFoundError:
            import sys as _sys

            _sys.path.insert(0, pkg_root)
            from wikidata_to_surrealdb_spark.functions import jpeg as _jpeg
        return _jpeg

    return load


def decode_features(
    assets: DataFrame, decoder: str = "fake", batch_hint: int | None = None
) -> DataFrame:
    """payload -> per-asset feature row via Arrow-batched mapInPandas.

    The iterator-of-batches form keeps peak memory at one Arrow batch of
    payloads per task regardless of partition size; output rows are 1:1
    with input rows, so no skew is introduced.

    Decoders:
    - ``"fake"`` — deterministic byte statistics over the raw payload
      (oracle-checkable; schema :data:`FEATURE_SCHEMA`);
    - ``"png"`` — REAL decode via the in-repo from-spec PNG reader
      (:mod:`..functions.png`, stdlib zlib only); emits decoded-pixel
      statistics (schema :data:`IMAGE_FEATURE_SCHEMA`). Assets whose
      payload is not a valid PNG yield a row with NULL image fields and
      NULL pixel_hash rather than failing the task — at 100 TB a corrupt
      file must not kill the job;
    - ``"pil"`` — gated on Pillow, absent from this container.

    The fake-decode closure is defined *inside* this function on purpose:
    cloudpickle then ships it by value, so executors need neither this
    package on their PYTHONPATH nor a matching working directory. The
    png path imports :mod:`..functions.png` inside the worker, so it
    needs the package shipped (``--py-files`` zip) — standard practice
    for a real cluster deployment.
    """
    if decoder not in _DECODERS:
        raise ValueError(f"unknown decoder {decoder!r}; one of {sorted(_DECODERS)}")

    if decoder in ("png", "jpeg", "png_auto", "jpeg_auto", "pil"):
        fmt = "jpeg" if decoder.startswith("jpeg") else "png"
        native_first = decoder in ("png_auto", "jpeg_auto", "pil")
        spec_fallback = decoder != "pil"
        load_png = _make_png_loader(_PKG_ROOT)
        load_jpeg = _make_jpeg_loader(_PKG_ROOT)
        pil_row = _make_pil_row()

        def run_img(batches: Iterator) -> Iterator:
            import hashlib as _hl
            import struct as _struct
            from zlib import error as zlib_error

            import pandas as pd

            if fmt == "jpeg":
                mod = load_jpeg()
                spec_decode, spec_errors = mod.decode_jpeg, (
                    mod.JpegError, ValueError, IndexError, _struct.error,
                )
            else:
                mod = load_png()
                spec_decode, spec_errors = mod.decode_png, (
                    mod.PngError, zlib_error, ValueError, IndexError,
                    _struct.error,
                )

            have_pil = False
            if native_first:
                try:
                    import PIL  # noqa: F401

                    have_pil = True
                except ImportError:
                    if not spec_fallback:
                        raise NotImplementedError(
                            "decoder='pil' requires Pillow, which is not "
                            "installed; use 'png'/'jpeg' (from-spec codecs) "
                            "or 'png_auto'/'jpeg_auto' (native when "
                            "available, from-spec otherwise)"
                        ) from None

            def spec_row(asset_id, buf):
                img = spec_decode(buf)
                px = img["pixels"]
                return {
                    "asset_id": asset_id,
                    "width": img["width"],
                    "height": img["height"],
                    "channels": img["channels"],
                    "bit_depth": img["bit_depth"],
                    "pixel_bytes": len(px),
                    "pixel_sum": sum(px),
                    "pixel_min": min(px) if px else None,
                    "pixel_max": max(px) if px else None,
                    "pixel_hash": _hl.md5(px).hexdigest(),
                }

            for pdf in batches:
                rows = []
                for asset_id, buf in zip(pdf["asset_id"], pdf["payload"]):
                    buf = bytes(buf) if buf is not None else b""
                    row = None
                    if have_pil:
                        # native fast path; per-asset fallback keeps
                        # exotic modes (16-bit, palette) on the
                        # from-spec codec instead of trusting Pillow's
                        # mode conversions
                        try:
                            row = {**pil_row(buf), "asset_id": asset_id}
                        except Exception:
                            row = None
                    if row is None:
                        try:
                            row = spec_row(asset_id, buf)
                        except spec_errors:
                            row = {"asset_id": asset_id}
                    rows.append(row)
                yield pd.DataFrame(
                    rows,
                    columns=[f.name for f in IMAGE_FEATURE_SCHEMA.fields],
                )

        from wikidata_to_surrealdb_spark.functions import respread

        return respread(assets).mapInPandas(run_img, schema=IMAGE_FEATURE_SCHEMA)

    if decoder == "fake":

        def decode(buf: bytes) -> dict:
            import hashlib as _hl

            return {
                "n_bytes": len(buf),
                "byte_sum": sum(buf),
                "byte_min": min(buf) if buf else None,
                "byte_max": max(buf) if buf else None,
                "content_hash": _hl.md5(buf).hexdigest(),
            }

    else:

        def decode(buf: bytes) -> dict:
            raise NotImplementedError(
                "real image decode requires a codec lib (e.g. Pillow) not "
                "installed in this environment; use decoder='fake'"
            )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        # a NULL payload yields a NULL feature row (asset_id kept), the
        # same degrade rule as a corrupt file — and what a SQL oracle
        # computes when every byte expression sees NULL
        null_feats = {
            "n_bytes": None,
            "byte_sum": None,
            "byte_min": None,
            "byte_max": None,
            "content_hash": None,
        }
        for pdf in batches:
            feats = [
                decode(bytes(b)) if b is not None else dict(null_feats)
                for b in pdf["payload"]
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "asset_id", pdf["asset_id"].values)
            yield out

    from wikidata_to_surrealdb_spark.functions import respread

    return respread(assets).mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(
    assets: DataFrame,
    frame_bytes: int = 64,
    stride: int = 4,
) -> DataFrame:
    """Sample every ``stride``-th fixed-size frame from each payload —
    the video-frame-sampling shape (1 row -> n_frames rows), done inside
    the Arrow iterator so the fan-out never buffers a whole partition.

    A real video pipeline swaps the byte-slicing for a container demuxer;
    the Spark contract (schema, ordering, fan-out) is unchanged.
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, hashes, sizes = [], [], [], []
            for asset_id, buf in zip(pdf["asset_id"], pdf["payload"]):
                if buf is None:
                    continue  # NULL payload -> no frames (oracle rule)
                buf = bytes(buf)
                n_frames = (len(buf) + frame_bytes - 1) // frame_bytes
                for k in range(0, n_frames, stride):
                    chunk = buf[k * frame_bytes : (k + 1) * frame_bytes]
                    ids.append(asset_id)
                    idxs.append(k)
                    hashes.append(hashlib.md5(chunk).hexdigest())
                    sizes.append(len(chunk))
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "frame_idx": idxs,
                    "frame_hash": hashes,
                    "frame_bytes": sizes,
                }
            )

    from wikidata_to_surrealdb_spark.functions import respread

    return respread(assets).mapInPandas(run, schema=FRAME_SCHEMA)


def resize_images(
    assets: DataFrame, width: int, height: int, codec: str = "png"
) -> DataFrame:
    """Real image resize: decode PNG payload -> nearest-neighbour resize
    -> re-encode PNG, per asset, inside Arrow-batched ``mapInPandas``
    (bytes in, bytes out; payloads never touch the driver).

    ``codec="png"`` / ``codec="jpeg"`` use the in-repo from-spec codecs
    (the nearest-neighbour resampler is shared — it operates on raw
    8-bit samples, not on any container format); ``codec="pil"`` stays
    gated on Pillow (absent from this container). Corrupt or wrong-
    format payloads pass through with a NULL payload (job survives bad
    files — mandatory at 100 TB). Output schema matches the asset table
    (:data:`RESIZED_SCHEMA`) so resized assets pipe straight back into
    :func:`decode_features` / :func:`frame_sample`.
    """
    if codec == "pil":
        # gate on driver-side availability: the resample itself is the
        # shared nearest-neighbour kernel either way, so 'pil' buys
        # nothing unless the native decoder exists
        try:
            import PIL  # noqa: F401
        except ImportError:
            raise NotImplementedError(
                "codec='pil' requires Pillow, which is not installed; "
                "use codec='png' or 'jpeg' (from-spec codecs)"
            ) from None
        codec = "png"  # decode via native path falls back per-asset
    if codec not in ("png", "jpeg"):
        raise ValueError(
            f"unknown codec {codec!r}; one of ['png', 'jpeg', 'pil']"
        )
    if width <= 0 or height <= 0:
        raise ValueError("target dimensions must be positive")

    load_png = _make_png_loader(_PKG_ROOT)
    load_jpeg = _make_jpeg_loader(_PKG_ROOT)
    use_jpeg = codec == "jpeg"

    def run(batches: Iterator) -> Iterator:
        import hashlib as _hl
        import struct as _struct
        from zlib import error as zlib_error

        import pandas as pd

        png = load_png()
        resize_nearest = png.resize_nearest
        if use_jpeg:
            jpeg = load_jpeg()
            errors = (jpeg.JpegError, ValueError, IndexError, _struct.error)
            dec, enc, mime = jpeg.decode_jpeg, jpeg.encode_jpeg, "image/jpeg"
        else:
            errors = (png.PngError, zlib_error, ValueError, IndexError, _struct.error)
            dec, enc, mime = png.decode_png, png.encode_png, "image/png"

        for pdf in batches:
            rows = []
            for asset_id, buf in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    img = dec(bytes(buf) if buf is not None else b"")
                    px = resize_nearest(
                        img["pixels"],
                        img["width"],
                        img["height"],
                        img["channels"],
                        width,
                        height,
                    )
                    out = enc(px, width, height, img["channels"])
                    rows.append(
                        {
                            "asset_id": asset_id,
                            "mime": mime,
                            "payload": out,
                            "n_bytes": len(out),
                            "content_hash": _hl.md5(out).hexdigest(),
                        }
                    )
                except errors:
                    rows.append({"asset_id": asset_id, "mime": None})
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    from wikidata_to_surrealdb_spark.functions import respread

    return respread(assets).mapInPandas(run, schema=RESIZED_SCHEMA)


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sum_sq", T.LongType(), True),
        T.StructField("peak", T.IntegerType(), True),
        T.StructField("zero_crossings", T.LongType(), True),
    ]
)


def documents_as_pcm_assets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Audio twin of :func:`documents_as_png_assets`: each document's
    UTF-8 bytes become a little-endian signed 16-bit PCM payload (the
    last odd byte dropped — PCM frames are whole samples). Deterministic,
    so the feature extraction downstream is exactly recomputable from
    the document text — the same oracle trick the image family uses."""

    def run(batches: Iterator) -> Iterator:
        import hashlib as _hl

        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                raw = (text or "").encode("utf-8")
                buf = raw[: len(raw) - (len(raw) % 2)]
                rows.append(
                    {
                        "asset_id": int(doc_id),
                        "mime": "audio/L16",
                        "payload": buf,
                        "n_bytes": len(buf),
                        "content_hash": _hl.md5(buf).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in ASSET_SCHEMA.fields]
            )

    from wikidata_to_surrealdb_spark.functions import respread

    return respread(docs.select(id_col, text_col)).mapInPandas(
        run, schema=ASSET_SCHEMA
    )


def audio_features(
    assets: DataFrame, sample_rate: int = 16000
) -> DataFrame:
    """PCM (s16le) feature extraction per asset: sample count, duration,
    EXACT integer energy (sum of squared samples — rms is
    sqrt(sum_sq/n), left to consumers so no float crosses the engine
    boundary), peak |amplitude|, and zero crossings (strict sign flips,
    zeros break runs). Arrow-batched ``mapInPandas``, numpy-vectorized
    inside the worker — the same executor-side-bytes contract as the
    image decoders: payloads never visit the driver, a corrupt (odd
    length is impossible by construction, but empty) payload yields
    zeros rather than a task failure.

    Scale: pure map, no shuffle; per-batch memory is one Arrow batch of
    payloads; all outputs are exact integers, so the DuckDB oracle
    recomputes them from the document bytes bit for bit."""
    if sample_rate <= 0:
        raise ValueError("sample_rate must be positive")

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for asset_id, buf in zip(pdf["asset_id"], pdf["payload"]):
                s = np.frombuffer(
                    bytes(buf) if buf is not None else b"", dtype="<i2"
                ).astype(np.int64)
                n = len(s)
                if n:
                    sum_sq = int(np.sum(s * s))
                    peak = int(np.max(np.abs(s)))
                    zc = int(np.sum((s[:-1] * s[1:]) < 0)) if n > 1 else 0
                else:
                    sum_sq, peak, zc = 0, 0, 0
                rows.append(
                    {
                        "asset_id": asset_id,
                        "n_samples": n,
                        "duration_ms": n * 1000 // sample_rate,
                        "sum_sq": sum_sq,
                        "peak": peak,
                        "zero_crossings": zc,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURE_SCHEMA.fields]
            )

    from wikidata_to_surrealdb_spark.functions import respread

    return respread(assets).mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("c0", T.IntegerType(), True),
        T.StructField("c1", T.IntegerType(), True),
        T.StructField("c2", T.IntegerType(), True),
        T.StructField("c3", T.IntegerType(), True),
        T.StructField("ahash", T.StringType(), True),
    ]
)


def perceptual_ahash(assets: DataFrame) -> DataFrame:
    """64-bit average-hash (aHash) per image asset — the classic
    perceptual fingerprint for NEAR-duplicate images (exact dedup on
    content_hash misses any re-encode/resize/noise; aHash survives
    them): decode, nearest-neighbour-sample an 8x8 grid with
    pixel-centre mapping, threshold each sample against the grid mean,
    pack the 64 bits. Returned both as a 16-hex-char string and as four
    16-bit integer chunks ``c0..c3`` — the chunks are the LSH band keys
    for :func:`ahash_neardup_pairs`.

    All integer math (the threshold is ``64*p > sum``, no division), so
    an oracle can recompute the hash straight from the source bytes.
    Multi-channel images grayscale by the rounded channel mean. Corrupt
    payloads yield NULL hash columns (the job survives bad files).
    Arrow-batched ``mapInPandas``; per-asset cost is the decode plus 64
    samples, independent of image size."""

    load_png = _make_png_loader(_PKG_ROOT)

    def run(batches: Iterator) -> Iterator:
        import struct as _struct
        from zlib import error as zlib_error

        import pandas as pd

        png = load_png()
        errors = (png.PngError, zlib_error, ValueError, IndexError, _struct.error)

        for pdf in batches:
            rows = []
            for asset_id, buf in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    img = png.decode_png(bytes(buf))
                    w, h, ch = img["width"], img["height"], img["channels"]
                    px = img["pixels"]
                    p = []
                    for y in range(8):
                        sy = min(h - 1, ((2 * y + 1) * h) // 16)
                        for x in range(8):
                            sx = min(w - 1, ((2 * x + 1) * w) // 16)
                            base = (sy * w + sx) * ch
                            v = sum(px[base + c] for c in range(ch))
                            p.append((v + ch // 2) // ch)
                    s = sum(p)
                    bits = [1 if 64 * v > s else 0 for v in p]
                    cs = []
                    for cidx in range(4):
                        v = 0
                        for j in range(16):
                            v = (v << 1) | bits[cidx * 16 + j]
                        cs.append(v)
                    rows.append(
                        {
                            "asset_id": int(asset_id),
                            "c0": cs[0],
                            "c1": cs[1],
                            "c2": cs[2],
                            "c3": cs[3],
                            "ahash": "".join(f"{c:04x}" for c in cs),
                        }
                    )
                except errors:
                    rows.append({"asset_id": int(asset_id)})
            yield pd.DataFrame(
                rows, columns=[f.name for f in AHASH_SCHEMA.fields]
            )

    from wikidata_to_surrealdb_spark.functions import respread

    return respread(assets).mapInPandas(run, schema=AHASH_SCHEMA)


def ahash_neardup_pairs(
    hashes: DataFrame, max_hamming: int = 6
) -> DataFrame:
    """Near-duplicate image pairs from aHash fingerprints: LSH-band the
    64-bit hash into its four 16-bit chunks (a pair with Hamming
    distance <= 3 is GUARANTEED to agree on at least one chunk by
    pigeonhole; larger distances are found with partial, documented
    recall — the standard banding trade), bucket-join on (band, chunk),
    emit candidate pairs array-locally per bucket, then verify exact
    Hamming distance with ``bit_count(xor)`` inside codegen. One
    band-keyed exchange + one pair dedup; bucket sizes are bounded by
    chunk cardinality (65536 values per band) so the pair explosion
    never sees a full-corpus key. Returns ``(id_a, id_b, hamming)``.
    """
    banded = hashes.where(F.col("ahash").isNotNull()).select(
        F.struct("asset_id", "c0", "c1", "c2", "c3").alias("_h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), F.col(f"c{b}").alias("chunk")
                    )
                    for b in range(4)
                ]
            )
        ).alias("_b"),
    )
    buckets = (
        banded.groupBy("_b.band", "_b.chunk")
        .agg(F.array_sort(F.collect_list("_h")).alias("_hs"))
        .where(F.size("_hs") > 1)
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(_hs, (a, i) -> "
                "transform(slice(_hs, i + 2, size(_hs)), "
                "b -> struct(a AS a, b AS b))))"
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    ham = sum(
        F.bit_count(
            F.col(f"a.c{i}").bitwiseXOR(F.col(f"b.c{i}")).cast("long")
        )
        for i in range(4)
    )
    return (
        pairs.dropDuplicates(["a", "b"])
        .select(
            F.col("a.asset_id").alias("id_a"),
            F.col("b.asset_id").alias("id_b"),
            ham.cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= int(max_hamming))
    )


def audio_resample_features(
    assets: DataFrame, factor: int = 2, sample_rate: int = 16000
) -> DataFrame:
    """Integer-exact PCM downsampling + feature extraction: decimate an
    s16le signal by ``factor`` with a boxcar (block-mean) low-pass —
    each output sample is the round-half-up integer mean of one
    ``factor``-sample block (``(sum + factor//2) // factor``, numpy
    FLOOR division — DuckDB's ``//`` truncates toward zero, so the
    oracle emulates floor with a sign CASE; the two only differ on
    negative odd block sums, i.e. payloads with bytes >= 0x80; partial
    tail blocks are dropped so frames stay whole) — then the same exact
    integer features as :func:`audio_features` over the resampled
    signal, with ``duration_ms`` at the NEW rate ``sample_rate /
    factor``. The whole path is integer arithmetic, so the oracle
    recomputes decimation and features straight from the source bytes.

    Scale: pure map (Arrow-batched ``mapInPandas``, numpy-vectorized
    reshape+mean per payload), no shuffle, payloads never visit the
    driver."""
    if factor < 1:
        raise ValueError("factor must be >= 1")
    if sample_rate <= 0 or sample_rate % factor:
        raise ValueError("sample_rate must be positive and divisible by factor")
    f = int(factor)
    out_rate = sample_rate // f

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for asset_id, buf in zip(pdf["asset_id"], pdf["payload"]):
                s = np.frombuffer(
                    bytes(buf) if buf is not None else b"", dtype="<i2"
                ).astype(np.int64)
                m = len(s) // f
                r = (
                    (s[: m * f].reshape(m, f).sum(axis=1) + f // 2) // f
                    if m
                    else np.empty(0, dtype=np.int64)
                )
                if m:
                    sum_sq = int(np.sum(r * r))
                    peak = int(np.max(np.abs(r)))
                    zc = int(np.sum((r[:-1] * r[1:]) < 0)) if m > 1 else 0
                else:
                    sum_sq, peak, zc = 0, 0, 0
                rows.append(
                    {
                        "asset_id": asset_id,
                        "n_samples": m,
                        "duration_ms": m * 1000 // out_rate,
                        "sum_sq": sum_sq,
                        "peak": peak,
                        "zero_crossings": zc,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f_.name for f_ in AUDIO_FEATURE_SCHEMA.fields]
            )

    from wikidata_to_surrealdb_spark.functions import respread

    return respread(assets).mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)
