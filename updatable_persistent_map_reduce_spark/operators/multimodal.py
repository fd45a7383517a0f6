"""Tier B — multimodal column plumbing.

Images/audio/video at 100 TB are opaque ``binary`` columns with typed
metadata structs; decode / feature-extract / resize / frame-sample run
as Arrow-batched Python over ``mapInPandas`` (the libs live on the
executors, never the driver). This container ships no image/audio
codecs, so the decode kernel here is a clearly-marked deterministic
fake over real bytes — everything Spark-side (binary column, metadata
struct, Arrow batch shape, UDF signature, partitioning) is the real
production plumbing and is oracle-checked.

Scale notes: binary payloads dominate row size — keep
``spark.sql.files.maxPartitionBytes`` at/below default so a partition
of blobs fits executor memory; metadata-only queries must prune the
binary column (columnar parquet reads skip it entirely); decode is a
per-partition map (no shuffle) and the Arrow batch size
(``spark.sql.execution.arrow.maxRecordsPerBatch``) bounds peak memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import Catalog, spread
from . import register


try:  # codec probe: PIL is optional in this container
    import PIL.Image  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False


def decode_image(payload: bytes) -> "object":
    """Real image decode. Routes through PIL when the environment has
    it; raises otherwise (this container ships no codecs — the
    deterministic fake kernels below exercise identical Spark
    plumbing and are what the REGISTERED queries use, so the oracle
    result never depends on which libraries happen to be installed).
    """
    if HAS_PIL:
        import io

        from PIL import Image

        return Image.open(io.BytesIO(payload))
    raise NotImplementedError(
        "image/audio codecs are not installed in this environment; "
        "use the deterministic fake kernel (q_mm_features) which "
        "exercises identical Spark plumbing"
    )


def _real_resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """PRODUCTION resize kernel (requires PIL): decode the binary
    payload, aspect-preserving fit to 224x224, checksum the resampled
    RGB buffer. Same signature / Arrow batch shape / output schema as
    :func:`_fake_resize_batch`, so ``mm_resize_real`` is a drop-in for
    the registered query's plan; covered by a skip-marked pytest that
    activates the moment the environment gains codecs."""
    for pdf in batches:
        target_w, target_h, scales, sums = [], [], [], []
        for payload in pdf["payload"]:
            img = decode_image(bytes(payload)).convert("RGB")
            w, h = img.size
            scale = min(224.0 / w, 224.0 / h, 1.0)
            tw, th = max(int(w * scale), 1), max(int(h * scale), 1)
            resized = img.resize((tw, th))
            target_w.append(tw)
            target_h.append(th)
            scales.append(round(scale, 6))
            sums.append(sum(resized.tobytes()) % 65536)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "target_w": pd.Series(target_w, dtype="int32"),
                "target_h": pd.Series(target_h, dtype="int32"),
                "scale": pd.Series(scales, dtype="float64"),
                "resampled_sum": pd.Series(sums, dtype="int32"),
            }
        )


def mm_resize_real(images: DataFrame) -> DataFrame:
    """Real-decode resize over a (doc_id, payload) DataFrame of actual
    encoded images — the production twin of q_mm_resize's plan (same
    mapInPandas shape, PIL kernel instead of the deterministic fake).
    """
    if not HAS_PIL:
        raise NotImplementedError("PIL not available in this environment")
    return images.mapInPandas(
        _real_resize_batch,
        schema=(
            "doc_id long, target_w int, target_h int, scale double, "
            "resampled_sum int"
        ),
    )


def _fake_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake 'decode + feature extract' over real bytes:
    byte length, first byte, checksum of the first 16 bytes. Stands in
    for decode_image(); identical Arrow-batch shape and signature."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": pdf["width"],
                "height": pdf["height"],
                "n_bytes": payloads.map(len).astype("int32"),
                "first_byte": payloads.map(
                    lambda b: b[0] if len(b) else -1
                ).astype("int32"),
                "checksum16": payloads.map(
                    lambda b: sum(b[:16]) % 256
                ).astype("int32"),
            }
        )


@register(
    "q_mm_features",
    oracle=(
        "SELECT doc_id, "
        "CAST((doc_id * 37) % 640 + 1 AS INTEGER) AS width, "
        "CAST((doc_id * 13) % 480 + 1 AS INTEGER) AS height, "
        "CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes, "
        "CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_byte, "
        "CAST(list_reduce(list_prepend(0, list_transform("
        "list_filter(string_split(substr(text, 1, 16), ''), c -> c <> ''), "
        "c -> ascii(c))), (a, c) -> a + c) % 256 AS INTEGER) AS checksum16 "
        "FROM documents"
    ),
    doc="Multimodal pipeline plumbing: binary payload column + typed "
    "metadata struct -> Arrow-batched mapInPandas 'decode' kernel "
    "(deterministic fake; see decode_image stub) -> per-item features. "
    "Pure per-partition map after a width-spread of the narrow test scan.",
)
def q_mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(Catalog(spark, sf_dir).documents)
    with_payload = d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        ((F.col("doc_id") * 37) % 640 + 1).cast("int").alias("width"),
        ((F.col("doc_id") * 13) % 480 + 1).cast("int").alias("height"),
    )
    return with_payload.mapInPandas(
        _fake_decode_batch,
        schema=(
            "doc_id long, width int, height int, n_bytes int, "
            "first_byte int, checksum16 int"
        ),
    )


# Bilinear resize target: the long side fits _RESIZE_T (downscale
# only, aspect preserved). Kept small so the closed-form oracle stays
# cheap while the resample arithmetic is fully real.
_RESIZE_T = 8


def _synth_image2d_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Deterministic fake 2D grayscale image producer: w x h row-major
    REAL bytes with pixel(x, y) = (doc_id*7 + x*31 + y*17 + 3xy) % 256
    — stands in for decoding .png/.jpg blobs; the resize kernel sees
    only the bytes + dimensions."""
    for pdf in batches:
        payloads = []
        for did, w, h in zip(pdf["doc_id"], pdf["width"], pdf["height"]):
            did, w, h = int(did), int(w), int(h)
            payloads.append(
                bytes(
                    (did * 7 + x * 31 + y * 17 + 3 * x * y) % 256
                    for y in range(h)
                    for x in range(w)
                )
            )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": pdf["width"],
                "height": pdf["height"],
                "payload": payloads,
            }
        )


def _bilinear_resize_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """REAL bilinear resample over real bytes, pure numpy (no PIL):
    aspect-fit so the long side becomes _RESIZE_T (integer dims:
    tw = max(1, w*T // max(w,h)), downscale only), then half-pixel-
    center sampling in EXACT fixed point — source position for output
    x is ((2x+1)*w - tw) / (2*tw), split into x0 = floor and the
    fractional numerator fx over denominator 2*tw, and the 4-corner
    blend is computed on integer numerators with one final floor
    division by (2*tw)(2*th). No float enters, so the oracle can
    recompute every output pixel bit-for-bit from doc_id. With codecs
    installed the same arithmetic runs after a real decode
    (mm_resize_real keeps the PIL path)."""
    import numpy as np

    for pdf in batches:
        sums, wsums, tws, ths = [], [], [], []
        for b, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
            w, h = int(w), int(h)
            m = max(w, h)
            if m <= _RESIZE_T:
                tw, th = w, h
            else:
                tw = max(1, (w * _RESIZE_T) // m)
                th = max(1, (h * _RESIZE_T) // m)
            dx, dy = 2 * tw, 2 * th
            img = (
                np.frombuffer(bytes(b), dtype=np.uint8)
                .reshape(h, w)
                .astype(np.int64)
            )
            xs = np.arange(tw, dtype=np.int64)
            pxn = (2 * xs + 1) * w - tw
            x0, fx = pxn // dx, pxn % dx
            x1 = np.minimum(x0 + 1, w - 1)
            ys = np.arange(th, dtype=np.int64)
            pyn = (2 * ys + 1) * h - th
            y0, fy = pyn // dy, pyn % dy
            y1 = np.minimum(y0 + 1, h - 1)
            out = (
                img[np.ix_(y0, x0)] * (dx - fx)[None, :] * (dy - fy)[:, None]
                + img[np.ix_(y0, x1)] * fx[None, :] * (dy - fy)[:, None]
                + img[np.ix_(y1, x0)] * (dx - fx)[None, :] * fy[:, None]
                + img[np.ix_(y1, x1)] * fx[None, :] * fy[:, None]
            ) // (dx * dy)
            flat = out.ravel()  # row-major == oracle's y-then-x flatten
            tws.append(tw)
            ths.append(th)
            sums.append(int(flat.sum()))
            wsums.append(int((flat * (np.arange(flat.size) + 1)).sum()))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "src_w": pdf["width"].astype("int32"),
                "src_h": pdf["height"].astype("int32"),
                "target_w": pd.Series(tws, dtype="int32"),
                "target_h": pd.Series(ths, dtype="int32"),
                "px_sum": pd.Series(sums, dtype="int64"),
                "px_wsum": pd.Series(wsums, dtype="int64"),
            }
        )


def _resize_oracle() -> str:
    """Closed-form DuckDB recompute of the bilinear kernel: the same
    integer fixed-point sampling, inlined (SQL lambdas can't bind
    intermediates, so x0/fx/y0/fy appear as substituted expressions)."""
    x0 = "(((2*x+1)*w - tw) // (2*tw))"
    fx = "(((2*x+1)*w - tw) % (2*tw))"
    x1 = f"least({x0} + 1, w - 1)"
    y0 = "(((2*y+1)*h - th) // (2*th))"
    fy = "(((2*y+1)*h - th) % (2*th))"
    y1 = f"least({y0} + 1, h - 1)"

    def P(a: str, b: str) -> str:
        return f"((doc_id*7 + {a}*31 + {b}*17 + 3*{a}*{b}) % 256)"

    px = (
        f"(({P(x0, y0)} * (2*tw - {fx}) * (2*th - {fy}) "
        f"+ {P(x1, y0)} * {fx} * (2*th - {fy}) "
        f"+ {P(x0, y1)} * (2*tw - {fx}) * {fy} "
        f"+ {P(x1, y1)} * {fx} * {fy}) // (2*tw * 2*th))"
    )
    return (
        "WITH ws AS (SELECT doc_id, (doc_id*37) % 13 + 4 AS w, "
        "(doc_id*13) % 11 + 3 AS h FROM documents), "
        "dims AS (SELECT doc_id, w, h, "
        f"CASE WHEN greatest(w, h) <= {_RESIZE_T} THEN w ELSE "
        f"greatest(w * {_RESIZE_T} // greatest(w, h), 1) END AS tw, "
        f"CASE WHEN greatest(w, h) <= {_RESIZE_T} THEN h ELSE "
        f"greatest(h * {_RESIZE_T} // greatest(w, h), 1) END AS th "
        "FROM ws), "
        "px AS (SELECT doc_id, w, h, tw, th, "
        "flatten(list_transform(range(0, th), y -> "
        f"list_transform(range(0, tw), x -> {px}))) AS o FROM dims) "
        "SELECT doc_id, CAST(w AS INTEGER) AS src_w, "
        "CAST(h AS INTEGER) AS src_h, CAST(tw AS INTEGER) AS target_w, "
        "CAST(th AS INTEGER) AS target_h, "
        "CAST(list_sum(o) AS BIGINT) AS px_sum, "
        "CAST(list_sum(list_transform(range(1, len(o) + 1), "
        "i -> o[i] * i)) AS BIGINT) AS px_wsum FROM px"
    )


@register(
    "q_mm_resize",
    oracle=_resize_oracle(),
    doc="Multimodal IMAGE RESIZE attested end-to-end through real "
    "bytes (r8 — the r7 stand-in checksum kernel replaced by actual "
    "resample arithmetic, the audio-features recipe applied to "
    "images): a deterministic 2D grayscale producer packs w x h "
    "row-major pixel bytes, and a SEPARATE pure-numpy kernel decodes "
    "them and performs a REAL bilinear aspect-fit resize — half-pixel-"
    "center source mapping in exact integer fixed point (positions as "
    "numerator/denominator pairs, 4-corner blend on integer "
    "numerators, one final floor division), so every output pixel is "
    "bit-exactly recomputable and the oracle checks a position-"
    "weighted checksum of the full resampled buffer, not just "
    "dimensions. Plan: two chained Arrow-batched mapInPandas stages, "
    "per-partition map, no shuffle — at 100 TB identical shape with "
    "real .jpg blobs, a codec decode, and 224x224 targets "
    "(mm_resize_real keeps the PIL swap-in).",
)
def q_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(Catalog(spark, sf_dir).documents.select("doc_id"))
    meta = d.select(
        "doc_id",
        ((F.col("doc_id") * 37) % 13 + 4).cast("int").alias("width"),
        ((F.col("doc_id") * 13) % 11 + 3).cast("int").alias("height"),
    )
    imgs = meta.mapInPandas(
        _synth_image2d_batch,
        schema="doc_id long, width int, height int, payload binary",
    )
    return imgs.mapInPandas(
        _bilinear_resize_batch,
        schema=(
            "doc_id long, src_w int, src_h int, target_w int, "
            "target_h int, px_sum bigint, px_wsum bigint"
        ),
    )


def _fake_frame_sample_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Deterministic fake video frame sampler: one output row per
    sampled frame (every 2 seconds of synthetic duration) — the 1->N
    emission shape of real frame extraction (ffmpeg/torchvision swap
    into this kernel)."""
    rows_doc, rows_idx, rows_ts, rows_fp = [], [], [], []
    for pdf in batches:
        for doc_id, payload, duration in zip(
            pdf["doc_id"], pdf["payload"], pdf["duration_s"]
        ):
            for k, t in enumerate(range(0, int(duration), 2)):
                rows_doc.append(doc_id)
                rows_idx.append(k)
                rows_ts.append(float(t))
                off = (k * 7) % max(len(payload), 1)
                rows_fp.append(
                    payload[off] if len(payload) else -1
                )
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(rows_doc, dtype="int64"),
                "frame_idx": pd.Series(rows_idx, dtype="int32"),
                "frame_ts_s": pd.Series(rows_ts, dtype="float64"),
                "frame_fingerprint": pd.Series(rows_fp, dtype="int32"),
            }
        )
        rows_doc, rows_idx, rows_ts, rows_fp = [], [], [], []


@register(
    "q_mm_frame_sample",
    oracle=(
        "WITH v AS (SELECT doc_id, text AS payload, "
        "(doc_id % 19) + 2 AS duration_s FROM documents) "
        "SELECT doc_id, CAST(k AS INTEGER) AS frame_idx, "
        "CAST(k * 2 AS DOUBLE) AS frame_ts_s, "
        "CAST(ascii(substr(payload, CAST((k * 7) % length(payload) "
        "AS INTEGER) + 1, 1)) AS INTEGER) AS frame_fingerprint "
        "FROM (SELECT doc_id, payload, unnest(range(0, "
        "CAST(ceil(duration_s / 2.0) AS BIGINT))) AS k FROM v)"
    ),
    doc="Multimodal frame sampling plumbing: 1->N emission per video "
    "(a frame row every 2s of synthetic duration) from an Arrow-batched "
    "kernel — the flat-map shape of real ffmpeg frame extraction. Frame "
    "rows carry (index, timestamp, fingerprint); downstream dedup/"
    "similarity treat them like any other corpus row.",
)
def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(Catalog(spark, sf_dir).documents)
    vids = d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        ((F.col("doc_id") % 19) + 2).cast("long").alias("duration_s"),
    )
    return vids.mapInPandas(
        _fake_frame_sample_batch,
        schema=(
            "doc_id long, frame_idx int, frame_ts_s double, "
            "frame_fingerprint int"
        ),
    )


# --------------------------------------------------------------------------
# ViT-style patch extraction — the vision-training tokenizer.

_PATCH = 4  # patch side; crop-to-multiple convention (partial rows/cols drop)


def _patchify_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Patch-grid kernel over real bytes: numpy-decode the w x h
    grayscale image, crop to the patch-size multiple (the standard
    ViT convention), and emit one row per patch with its integer sum
    and position-weighted sum (1 -> N emission, all-integer so the
    oracle recomputes every patch exactly). With real codecs the
    decode line changes and the reshape stays."""
    import numpy as np

    doc, pys, pxs, sums, wsums = [], [], [], [], []
    w8 = np.arange(_PATCH * _PATCH, dtype=np.int64) + 1
    for pdf in batches:
        for did, w, h, b in zip(
            pdf["doc_id"], pdf["width"], pdf["height"], pdf["payload"]
        ):
            w, h = int(w), int(h)
            nx, ny = w // _PATCH, h // _PATCH
            if nx == 0 or ny == 0:
                continue
            img = (
                np.frombuffer(bytes(b), dtype=np.uint8)
                .reshape(h, w)
                .astype(np.int64)
            )
            p = (
                img[: ny * _PATCH, : nx * _PATCH]
                .reshape(ny, _PATCH, nx, _PATCH)
                .transpose(0, 2, 1, 3)
                .reshape(ny, nx, _PATCH * _PATCH)
            )
            for py in range(ny):
                for px in range(nx):
                    doc.append(int(did))
                    pys.append(py)
                    pxs.append(px)
                    sums.append(int(p[py, px].sum()))
                    wsums.append(int((p[py, px] * w8).sum()))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(doc, dtype="int64"),
                "py": pd.Series(pys, dtype="int32"),
                "px": pd.Series(pxs, dtype="int32"),
                "px_sum": pd.Series(sums, dtype="int64"),
                "px_wsum": pd.Series(wsums, dtype="int64"),
            }
        )
        doc, pys, pxs, sums, wsums = [], [], [], [], []


@register(
    "q_mm_patchify",
    oracle=(
        "WITH ws AS (SELECT doc_id, (doc_id*37) % 13 + 4 AS w, "
        "(doc_id*13) % 11 + 3 AS h FROM documents), "
        f"g AS (SELECT doc_id, w, h, w // {_PATCH} AS nx, h // {_PATCH} AS ny "
        "FROM ws), "
        "p AS (SELECT doc_id, k2 // nx AS py, k2 % nx AS px FROM ("
        "SELECT doc_id, nx, unnest(range(0, nx * ny)) AS k2 FROM g "
        "WHERE nx > 0 AND ny > 0)) "
        "SELECT doc_id, CAST(py AS INTEGER) AS py, "
        "CAST(px AS INTEGER) AS px, "
        f"CAST(list_sum(list_transform(range(0, {_PATCH * _PATCH}), k -> "
        f"(doc_id*7 + (px*{_PATCH} + k % {_PATCH})*31 "
        f"+ (py*{_PATCH} + k // {_PATCH})*17 "
        f"+ 3*(px*{_PATCH} + k % {_PATCH})*(py*{_PATCH} + k // {_PATCH})) "
        "% 256)) AS BIGINT) AS px_sum, "
        f"CAST(list_sum(list_transform(range(0, {_PATCH * _PATCH}), k -> "
        f"((doc_id*7 + (px*{_PATCH} + k % {_PATCH})*31 "
        f"+ (py*{_PATCH} + k // {_PATCH})*17 "
        f"+ 3*(px*{_PATCH} + k % {_PATCH})*(py*{_PATCH} + k // {_PATCH})) "
        "% 256) * (k + 1))) AS BIGINT) AS px_wsum "
        "FROM p"
    ),
    doc="ViT-STYLE PATCH EXTRACTION through real bytes (r8 — the "
    "vision-training tokenizer step that pairs with q_mm_resize's "
    "resample: resize, then patchify, then embed): the same 2D "
    "grayscale byte images, cropped to the patch-size multiple (the "
    "standard ViT convention — partial edge rows/columns drop), "
    "emitted as one row per 4x4 patch with integer sum and "
    "position-weighted sum (1 -> N, like frame sampling). The oracle "
    "recomputes every patch closed-form from doc_id — row-major "
    "within-patch weighting pins the exact pixel-to-patch layout, "
    "not just totals — so a green row proves the reshape/transpose "
    "patch walk bit-for-bit. Plan: two chained Arrow-batched "
    "mapInPandas stages, per-partition map, no shuffle; at 100 TB "
    "identical shape with decoded RGB planes and 16x16 patches.",
)
def q_mm_patchify(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(Catalog(spark, sf_dir).documents.select("doc_id"))
    meta = d.select(
        "doc_id",
        ((F.col("doc_id") * 37) % 13 + 4).cast("int").alias("width"),
        ((F.col("doc_id") * 13) % 11 + 3).cast("int").alias("height"),
    )
    imgs = meta.mapInPandas(
        _synth_image2d_batch,
        schema="doc_id long, width int, height int, payload binary",
    )
    return imgs.mapInPandas(
        _patchify_batch,
        schema="doc_id long, py int, px int, px_sum bigint, px_wsum bigint",
    )


# --------------------------------------------------------------------------
# video scene-cut detection — shot-boundary plumbing over real bytes.

_SC_FRAME_B = 16   # bytes per synthetic frame
_SC_SCENE_LEN = 4  # frames per scene in the synthetic videos


def _synth_video_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Deterministic fake video producer: n_frames frames of
    _SC_FRAME_B bytes each, pixel j of frame k =
    (doc_id*7 + scene*53 + j*3) % 256 with scene = k // _SC_SCENE_LEN
    — frames are identical WITHIN a scene and jump at scene
    boundaries, the structure shot-boundary detection exists to find.
    Packed as real bytes; the detector sees only those."""
    for pdf in batches:
        payloads = []
        for did, nf in zip(pdf["doc_id"], pdf["n_frames"]):
            did, nf = int(did), int(nf)
            payloads.append(
                bytes(
                    (did * 7 + (k // _SC_SCENE_LEN) * 53 + j * 3) % 256
                    for k in range(nf)
                    for j in range(_SC_FRAME_B)
                )
            )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_frames": pdf["n_frames"],
                "payload": payloads,
            }
        )


def _scene_cut_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Shot-boundary detector over real bytes: numpy-decode the frame
    stack, per-frame integer luminance (byte sum), emit one row per
    frame whose luminance differs from its predecessor (1 -> N
    emission, like frame sampling). Integer math end to end so the
    oracle recomputes every cut and delta exactly; with real codecs
    the luminance line becomes a decoded-plane mean, same shape."""
    import numpy as np

    doc, cut, delta = [], [], []
    for pdf in batches:
        for did, nf, b in zip(
            pdf["doc_id"], pdf["n_frames"], pdf["payload"]
        ):
            x = (
                np.frombuffer(bytes(b), dtype=np.uint8)
                .reshape(int(nf), _SC_FRAME_B)
                .astype(np.int64)
            )
            luma = x.sum(axis=1)
            d = np.abs(np.diff(luma))
            for k in np.nonzero(d)[0]:
                doc.append(int(did))
                cut.append(int(k) + 1)
                delta.append(int(d[k]))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(doc, dtype="int64"),
                "cut_frame": pd.Series(cut, dtype="int32"),
                "delta": pd.Series(delta, dtype="int64"),
            }
        )
        doc, cut, delta = [], [], []


@register(
    "q_mm_scene_cut",
    oracle=(
        "WITH v AS (SELECT doc_id, (doc_id % 13) + 4 AS nf FROM documents), "
        "f AS (SELECT doc_id, unnest(range(1, nf)) AS k FROM v), "
        "l AS (SELECT doc_id, k, "
        f"CAST(list_sum(list_transform(range(0, {_SC_FRAME_B}), j -> "
        f"(doc_id*7 + (k // {_SC_SCENE_LEN}) * 53 + j*3) % 256)) AS BIGINT) "
        "AS luma, "
        f"CAST(list_sum(list_transform(range(0, {_SC_FRAME_B}), j -> "
        f"(doc_id*7 + ((k-1) // {_SC_SCENE_LEN}) * 53 + j*3) % 256)) AS BIGINT) "
        "AS prev FROM f) "
        "SELECT doc_id, CAST(k AS INTEGER) AS cut_frame, "
        "CAST(abs(luma - prev) AS BIGINT) AS delta "
        "FROM l WHERE luma <> prev"
    ),
    doc="VIDEO SCENE-CUT detection attested end-to-end through real "
    "bytes (shot-boundary detection — the segmentation step a video "
    "curation pipeline runs before frame sampling): a deterministic "
    "producer packs frame stacks as actual bytes with planted scene "
    "boundaries every 4 frames, and a SEPARATE numpy kernel decodes "
    "the stack, computes per-frame integer luminance, and emits one "
    "row per luminance discontinuity (1 -> N emission). The oracle "
    "recomputes every cut frame and delta in closed form from "
    "doc_id, so a green row proves the bytes -> frame-stack -> "
    "diff-threshold path exactly. Plan: two chained Arrow-batched "
    "mapInPandas stages, per-partition map, no shuffle — with real "
    "codecs the luminance line becomes a decoded-plane mean and the "
    "threshold a tuned constant, same shape at 100 TB.",
)
def q_mm_scene_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(Catalog(spark, sf_dir).documents.select("doc_id"))
    meta = d.select(
        "doc_id", ((F.col("doc_id") % 13) + 4).cast("int").alias("n_frames")
    )
    vids = meta.mapInPandas(
        _synth_video_batch,
        schema="doc_id long, n_frames int, payload binary",
    )
    return vids.mapInPandas(
        _scene_cut_batch,
        schema="doc_id long, cut_frame int, delta bigint",
    )


_AUDIO_N = 1024  # PCM samples per synthetic clip


def _synth_pcm_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake 'audio file' producer: an 8-bit unsigned PCM
    sawtooth synthesized from doc_id (sample_i = (doc_id*31 + i*7) %
    256), packed as REAL bytes — stands in for reading .wav/.flac
    blobs, exactly as decode_image's fake stands in for codecs. The
    downstream feature kernel sees only the bytes."""
    for pdf in batches:
        payloads = [
            bytes((int(did) * 31 + i * 7) % 256 for i in range(_AUDIO_N))
            for did in pdf["doc_id"]
        ]
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def _audio_features_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Audio feature kernel over real bytes: numpy-decode unsigned PCM
    to centered int samples, then integer energy, peak amplitude and
    zero-crossing count per clip — the vectorized per-clip features an
    audio curation pipeline gates on (silence/clipping/noise checks).
    Integer math end to end so the oracle can recompute it exactly."""
    import numpy as np

    for pdf in batches:
        ns, energy, peak, zc = [], [], [], []
        for b in pdf["payload"]:
            x = np.frombuffer(bytes(b), dtype=np.uint8).astype(np.int64) - 128
            ns.append(len(x))
            energy.append(int((x * x).sum()))
            peak.append(int(np.abs(x).max()) if len(x) else 0)
            zc.append(int(((x[:-1] * x[1:]) < 0).sum()) if len(x) > 1 else 0)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_samples": pd.Series(ns, dtype="int32"),
                "energy": pd.Series(energy, dtype="int64"),
                "peak": pd.Series(peak, dtype="int32"),
                "zero_crossings": pd.Series(zc, dtype="int32"),
            }
        )


@register(
    "q_mm_audio_features",
    oracle=(
        "SELECT doc_id, "
        f"CAST({_AUDIO_N} AS INTEGER) AS n_samples, "
        f"CAST(list_sum(list_transform(range(0, {_AUDIO_N}), i -> "
        "((doc_id*31 + i*7) % 256 - 128) * ((doc_id*31 + i*7) % 256 - 128)"
        ")) AS BIGINT) AS energy, "
        f"CAST(list_max(list_transform(range(0, {_AUDIO_N}), i -> "
        "abs((doc_id*31 + i*7) % 256 - 128))) AS INTEGER) AS peak, "
        f"CAST(len(list_filter(range(1, {_AUDIO_N}), i -> "
        "((doc_id*31 + (i-1)*7) % 256 - 128) * "
        "((doc_id*31 + i*7) % 256 - 128) < 0)) AS INTEGER) "
        "AS zero_crossings "
        "FROM documents"
    ),
    doc="AUDIO feature extraction attested end-to-end through a real "
    "binary decode path: a deterministic synthetic PCM producer packs "
    "each clip as actual bytes (the codec stand-in, like "
    "q_mm_features' image fake), and a SEPARATE numpy kernel decodes "
    "those bytes and computes integer energy / peak amplitude / "
    "zero-crossing count — the silence/clipping/noise gates an audio "
    "curation pipeline runs. The oracle recomputes the features in "
    "closed form from doc_id, so a green row proves the Spark side's "
    "bytes->numpy->features path exactly (all-integer math; no float "
    "drift possible). Plan: two chained Arrow-batched mapInPandas "
    "stages, per-partition map only, no shuffle — at 100 TB this is "
    "the same single-pass scan shape with real .wav blobs and a real "
    "codec in the second kernel.",
)
def q_mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(Catalog(spark, sf_dir).documents.select("doc_id"))
    clips = d.mapInPandas(_synth_pcm_batch, schema="doc_id long, payload binary")
    return clips.mapInPandas(
        _audio_features_batch,
        schema=(
            "doc_id long, n_samples int, energy bigint, peak int, "
            "zero_crossings int"
        ),
    )


_IMG_PX = 32       # pixels per synthetic grayscale "image"
_PHASH_D = 2       # max differing bits for a near-dup pair
# 3 bands over 32 bits: by pigeonhole a pair within hamming 2 agrees
# on >= 1 whole band (same lossless geometry as q_dedup_hamming)
_PHASH_BANDS = [(0, 11), (11, 11), (22, 10)]


def _synth_image_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake image producer with PLANTED near-duplicates:
    doc_id's image derives from base = doc_id // 2, so every even/odd
    pair shares an image except one brightness-shifted pixel — the
    re-encoded/slightly-edited duplicate an image-dedup pass exists to
    catch. Packed as real bytes; the hash kernel sees only those."""
    for pdf in batches:
        payloads = []
        for did in pdf["doc_id"]:
            b = int(did) // 2
            px = [
                (b * (2 * i + 3) + (b * b % 251) * i + i * i * 3) % 256
                for i in range(_IMG_PX)
            ]
            if int(did) % 2 == 1:
                px[0] = (px[0] + 96) % 256
            payloads.append(bytes(px))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def _ahash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Average-hash kernel over real image bytes: decode to numpy
    grayscale, bit i = (pixel_i * N > sum) — the integer form of
    'pixel above mean', so the oracle can recompute it exactly — and
    pack the 32 bits into a long. With real codecs the decode line is
    PIL + resize to 8x8 + grayscale; the hash math is identical."""
    import numpy as np

    for pdf in batches:
        hashes = []
        for bts in pdf["payload"]:
            x = np.frombuffer(bytes(bts), dtype=np.uint8).astype(np.int64)
            bits = (x * len(x)) > x.sum()
            hashes.append(int((bits << np.arange(len(x))).sum()))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "ahash": pd.Series(hashes, dtype="int64"),
            }
        )


@register(
    "q_mm_image_phash_dedup",
    oracle=(
        "WITH base AS (SELECT doc_id, (doc_id - doc_id % 2) // 2 AS b, "
        "doc_id % 2 AS odd FROM documents), "
        f"px AS (SELECT doc_id, list_transform(range(0, {_IMG_PX}), i -> "
        "CASE WHEN i = 0 AND odd = 1 THEN ((b*3) % 256 + 96) % 256 "
        "ELSE (b*(2*i+3) + (b*b % 251)*i + i*i*3) % 256 END) AS ps "
        "FROM base), "
        "t AS (SELECT doc_id, ps, list_sum(ps) AS total FROM px), "
        "h AS (SELECT doc_id, CAST(list_sum(list_transform("
        f"range(0, {_IMG_PX}), i -> CASE WHEN ps[i+1] * {_IMG_PX} > total "
        "THEN CAST(1 AS BIGINT) << i ELSE 0 END)) AS BIGINT) AS ah FROM t) "
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "CAST(bit_count(xor(a.ah, b.ah)) AS INTEGER) AS hamming "
        "FROM h a JOIN h b ON a.doc_id < b.doc_id "
        f"WHERE bit_count(xor(a.ah, b.ah)) <= {_PHASH_D}"
    ),
    doc="IMAGE near-duplicate detection via perceptual hash, end to "
    "end through real bytes: a synthetic producer plants brightness-"
    "shifted duplicate pairs (base image = doc_id//2, odd docs get "
    "one edited pixel — the re-encode/resize duplicates image dedup "
    "exists to catch), an average-hash kernel decodes the BYTES and "
    "packs 32 'pixel above mean' bits (integer form: pixel*N > sum, "
    "so both engines agree exactly), and qualifying pairs (hamming "
    f"<= {_PHASH_D}) are found with the same pigeonhole-lossless "
    "3-band equi-join as q_dedup_hamming — shuffle keys are (band, "
    "value) buckets, NEVER all-pairs; at 100 TB the lever is hash "
    "width (64/256-bit pHash, wider bands), same geometry. The "
    "oracle recomputes hashes in closed form and takes the true "
    "O(n^2) join, so a green row proves both the bytes->hash kernel "
    "and the banded join's lossless recall. Completes the dedup "
    "modality matrix: text exact/near/substring, embedding, URL, "
    "and now images.",
)
def q_mm_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(Catalog(spark, sf_dir).documents.select("doc_id"))
    clips = d.mapInPandas(
        _synth_image_batch, schema="doc_id long, payload binary"
    )
    hashes = clips.mapInPandas(_ahash_batch, schema="doc_id long, ahash long")
    bands = hashes.select(
        "doc_id",
        "ahash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("ahash", lo)
                        .bitwiseAND((1 << width) - 1)
                        .alias("val"),
                    )
                    for i, (lo, width) in enumerate(_PHASH_BANDS)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", "ahash", F.col("bv.band"), F.col("bv.val"))
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("ahash").alias("h_a"),
        "band", "val",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("ahash").alias("h_b"),
        "band", "val",
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    out = (
        a.join(b, ["band", "val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(hamming <= _PHASH_D)
        .select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
    )
    # non-degeneracy: the pass must actually catch planted twins —
    # an empty result matching an empty oracle would attest nothing
    twins = out.filter(
        F.floor(F.col("doc_a") / 2) == F.floor(F.col("doc_b") / 2)
    ).count()
    if twins == 0:
        raise RuntimeError(
            "image near-dup pass found zero planted twin pairs — the "
            "synth planting or the hash/banding kernel regressed, so "
            "this query would be attesting an empty join"
        )
    return out


# ---------------------------------------------------------------------------
# blur detection — variance-of-Laplacian image quality gating.

_BLUR_T = 50_000  # sharpness floor on n*var = lap_var_num / n^2


def _blur_detect_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Variance-of-Laplacian sharpness kernel over real image bytes:
    numpy-decode the grayscale plane, convolve the 4-neighbor
    Laplacian over interior pixels, and emit EXACT integers — n,
    sum(L), and the variance NUMERATOR n*sum(L^2) - sum(L)^2 (integer
    cross-multiplication instead of a float variance, so the oracle
    hash-matches) plus the thresholded sharpness flag. The standard
    low-cost blur gate an image curation pipeline runs before
    training (OpenCV's cv2.Laplacian().var() heuristic, integerized)."""
    import numpy as np

    for pdf in batches:
        n_l, s_l, v_l, sharp = [], [], [], []
        for b, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
            px = (
                np.frombuffer(bytes(b), dtype=np.uint8)
                .reshape(int(h), int(w))
                .astype(np.int64)
            )
            lap = (
                4 * px[1:-1, 1:-1]
                - px[1:-1, :-2]
                - px[1:-1, 2:]
                - px[:-2, 1:-1]
                - px[2:, 1:-1]
            )
            n = int(lap.size)
            s = int(lap.sum())
            var_num = n * int((lap * lap).sum()) - s * s
            n_l.append(n)
            s_l.append(s)
            v_l.append(var_num)
            sharp.append(var_num >= _BLUR_T * n * n)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_lap": pd.Series(n_l, dtype="int32"),
                "lap_sum": pd.Series(s_l, dtype="int64"),
                "lap_var_num": pd.Series(v_l, dtype="int64"),
                "is_sharp": pd.Series(sharp, dtype="bool"),
            }
        )


def _blur_pixel_sql(dx: int, dy: int) -> str:
    x = "x" if dx == 0 else f"(x{dx:+d})"
    y = "y" if dy == 0 else f"(y{dy:+d})"
    return f"((doc_id*7 + {x}*31 + {y}*17 + 3*{x}*{y}) % 256)"


@register(
    "q_mm_blur_detect",
    oracle=(
        "WITH m AS (SELECT doc_id, (doc_id*37) % 13 + 4 AS w, "
        "(doc_id*13) % 11 + 3 AS h FROM documents), "
        "gx AS (SELECT doc_id, w, h, unnest(range(1, w - 1)) AS x FROM m), "
        "g AS (SELECT doc_id, x, unnest(range(1, h - 1)) AS y FROM gx), "
        "p AS (SELECT doc_id, "
        f"4*{_blur_pixel_sql(0, 0)} - {_blur_pixel_sql(-1, 0)} - "
        f"{_blur_pixel_sql(1, 0)} - {_blur_pixel_sql(0, -1)} - "
        f"{_blur_pixel_sql(0, 1)} AS lap FROM g) "
        "SELECT doc_id, CAST(count(*) AS INTEGER) AS n_lap, "
        "CAST(sum(lap) AS BIGINT) AS lap_sum, "
        "CAST(count(*)*sum(lap*lap) - sum(lap)*sum(lap) AS BIGINT) "
        "AS lap_var_num, "
        "CAST(count(*)*sum(lap*lap) - sum(lap)*sum(lap) >= "
        f"{_BLUR_T}*count(*)*count(*) AS BOOLEAN) AS is_sharp "
        "FROM p GROUP BY doc_id"
    ),
    doc="IMAGE BLUR DETECTION attested end-to-end through real bytes — "
    "the variance-of-Laplacian sharpness gate (OpenCV's "
    "cv2.Laplacian().var() heuristic) every image curation pipeline "
    "runs before training: the shared deterministic image producer "
    "packs w x h grayscale planes as actual bytes, a SEPARATE numpy "
    "kernel convolves the 4-neighbor Laplacian over interior pixels, "
    "and the decision is EXACT integer arithmetic — variance as the "
    "numerator n*sum(L^2) - sum(L)^2 compared against threshold*n^2 "
    "by cross-multiplication, never a float division — so the DuckDB "
    "oracle recomputes every pixel, Laplacian, and flag in closed "
    "form from doc_id. Plan: two chained Arrow mapInPandas stages, "
    "per-partition map, no shuffle; with real codecs the decode line "
    "swaps in and the kernel is unchanged — the same 100 TB blob-"
    "processing shape as q_mm_resize/q_mm_scene_cut.",
)
def q_mm_blur_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(Catalog(spark, sf_dir).documents.select("doc_id"))
    meta = d.select(
        "doc_id",
        ((F.col("doc_id") * 37) % 13 + 4).cast("int").alias("width"),
        ((F.col("doc_id") * 13) % 11 + 3).cast("int").alias("height"),
    )
    imgs = meta.mapInPandas(
        _synth_image2d_batch,
        schema="doc_id long, width int, height int, payload binary",
    )
    return imgs.mapInPandas(
        _blur_detect_batch,
        schema=(
            "doc_id long, n_lap int, lap_sum bigint, "
            "lap_var_num bigint, is_sharp boolean"
        ),
    )
